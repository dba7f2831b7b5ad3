package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text → embedding-vector transform.
  *
  * Reference: seatunnel-transforms-v2
  * .../nlpmodel/embedding/EmbeddingTransform.java:47 — batches rows and
  * calls a remote embedding API (OpenAI/Doubao/Qianfan/custom), writing a
  * vector column per configured field.
  *
  * Remote model endpoints are unreachable in this sandbox, so Graft ships
  * the same plumbing (batching, vector column schema Array[Float],
  * configurable dimension) with a deterministic local model: a
  * hashing-trick bag-of-words embedder (feature hashing, signed buckets,
  * L2-normalized). It is a real, scale-correct embedder (used by e.g.
  * Vowpal Wabbit-style systems), fully distributed and deterministic —
  * swap `embedText` for an RPC in production.
  */
object EmbeddingOp {

  /** Deterministic hashing-trick embedding of one string. */
  def embedText(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      var i = 0
      val tokens = text.toLowerCase.split("\\W+")
      while (i < tokens.length) {
        val t = tokens(i)
        if (t.nonEmpty) {
          val h = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
          val idx = math.floorMod(h, dim)
          val sign = if ((h >>> 31) == 0) 1.0f else -1.0f
          v(idx) += sign
        }
        i += 1
      }
      var norm = 0.0
      i = 0
      while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
      if (norm > 0) {
        val inv = (1.0 / math.sqrt(norm)).toFloat
        i = 0
        while (i < dim) { v(i) *= inv; i += 1 }
      }
    }
    v
  }

  private def embedUdf(dim: Int) = udf((s: String) => embedText(s, dim))

  /** Add `outputField` = embedding(srcField). One narrow projection; the
    * UDF is the only non-codegen step (as the remote call would be).
    */
  def embed(df: DataFrame, srcField: String, outputField: String, dim: Int = 64): DataFrame =
    df.withColumn(outputField, embedUdf(dim)(col(srcField)))

  /** Provider-batched variant — the reference EmbeddingTransform shape:
    * `single_vectorized_input_number` rows per provider call inside
    * `mapPartitions` (one client per executor, no driver funnel). Used
    * with [[NlpHttp.EmbeddingProvider]] for the real remote path.
    */
  def embedWithProvider(df: DataFrame, srcField: String, outputField: String,
      provider: NlpHttp.EmbeddingProvider, batchSize: Int = 16): DataFrame = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
    val outSchema = StructType(df.schema.fields :+
      StructField(outputField, ArrayType(FloatType, containsNull = false)))
    implicit val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val idx = df.schema.fieldIndex(srcField)
    df.mapPartitions { rows =>
      rows.grouped(math.max(1, batchSize)).flatMap { batch =>
        val texts = batch.map(r => Option(r.get(idx)).map(_.toString).orNull)
        val vecs = provider.embed(texts)
        batch.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v) }
      }
    }
  }

  /** Cosine similarity between two Array[Float] vector columns, computed
    * with codegen'd higher-order functions (no UDF).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }
}
