package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** LLM transform (classify / generate over a text column).
  *
  * Reference: seatunnel-transforms-v2 .../nlpmodel/llm/LLMTransform.java:44
  * — builds a prompt per row batch and calls a remote LLM endpoint
  * (OpenAI/Kimi/Microsoft/custom), writing the model output to a column.
  *
  * Graft keeps the production shape — a provider SPI invoked over row
  * batches inside `mapPartitions` (one client per partition, batched
  * requests) — and ships a deterministic offline provider, since no
  * endpoint is reachable from this sandbox. STUB: `RuleProvider` stands in
  * for the network call; implement `LlmProvider` against a real API to go
  * online.
  */
object LlmOp {

  /** Provider SPI: complete a batch of prompts. Implementations should be
    * constructed inside the partition (serializable config, lazy client).
    */
  trait LlmProvider extends Serializable {
    def complete(prompts: Seq[String]): Seq[String]
  }

  /** Deterministic offline provider: keyword-vote "classification" so specs
    * and oracles are stable. Stands in for a remote model.
    */
  final case class RuleProvider(labels: Seq[String]) extends LlmProvider {
    override def complete(prompts: Seq[String]): Seq[String] =
      prompts.map { p =>
        if (p == null || labels.isEmpty) null
        else {
          val votes = labels.map(l => l -> l.r.findAllIn(p.toLowerCase).size)
          val (best, n) = votes.maxBy { case (l, c) => (c, l) }
          if (n > 0) best else labels.head
        }
      }
  }

  /** Deterministic offline provider for label-less configs (the reference
    * e2e LLM jobs assert only that a model answered): md5-parity
    * "true"/"false", so the answer is stable, non-null, and castable to
    * the reference's `output_data_type = boolean` variant.
    */
  case object DigestProvider extends LlmProvider {
    override def complete(prompts: Seq[String]): Seq[String] =
      prompts.map { p =>
        if (p == null) null
        else {
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(p.getBytes("UTF-8"))
          if ((d(0) & 1) == 0) "true" else "false"
        }
      }
  }

  /** Append `outputField` = provider(promptTemplate + srcField), batching
    * `batchSize` rows per provider call (mirrors the reference's
    * inference_batch_size).
    */
  def transform(
      df: DataFrame,
      srcField: String,
      outputField: String,
      provider: LlmProvider,
      promptTemplate: String = "",
      batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outputField, StringType))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(srcField)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val prompts = batch.map(r => promptTemplate + Option(r.get(idx)).map(_.toString).orNull)
        val outs = provider.complete(prompts)
        batch.lazyZip(outs).map { (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }
  }
}
