package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines (SURVEY §2.6): group
  * documents into fixed token-budget bins ("sequences") so downstream
  * training consumes dense, uniformly-sized samples instead of one padded
  * sample per document.
  *
  * Scale design: optimal bin packing is inherently sequential, so the
  * distributed form is the standard per-partition approximation — hash
  * docs across partitions, sort each partition by descending token count,
  * then first-fit-decreasing WITHIN the partition (the classic 11/9·OPT
  * bound applies per partition). Bins never cross partitions: the whole
  * op is one exchange + one local sort + one `mapPartitions`, no driver
  * state, and partition memory holds only (bin -> remaining budget)
  * accumulators, not document content. Deterministic for a fixed
  * `numPartitions` (hash partitioning + total per-partition sort order).
  */
object Packing {

  /** Pack (id, tokens) rows into bins of at most `budget` tokens.
    * Documents longer than the budget get a single-doc oversized bin
    * (flagged, for downstream truncation/splitting). Returns one row per
    * bin: (seq_id, doc_ids, n_docs, total_tokens, fill, oversized).
    *
    * @param idCol     integral document id column
    * @param tokensCol integral token-count column (see
    *                  [[TextAnalysis.tokenCounts]])
    */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String, budget: Int,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "packing budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val prepared = df
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("toks"))
      .repartition(parts, col("id"))
      .sortWithinPartitions(col("toks").desc, col("id"))

    prepared.mapPartitions { it: Iterator[Row] =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      // open bins: (remaining, ids, total); first-fit over the open list.
      // Descending input means later docs only shrink, so every bin stays
      // a candidate — the list is bounded by bins-per-partition.
      val bins = scala.collection.mutable.ArrayBuffer
        .empty[(Long, scala.collection.mutable.ArrayBuffer[Long], Long)]
      val oversized = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      it.foreach { r =>
        val id = r.getLong(0); val t = r.getLong(1)
        if (t > budget) oversized += ((id, t))
        else {
          val slot = bins.indexWhere(_._1 >= t)
          if (slot >= 0) {
            val (rem, ids, tot) = bins(slot)
            ids += id
            bins(slot) = (rem - t, ids, tot + t)
          } else bins += ((budget - t, scala.collection.mutable.ArrayBuffer(id), t))
        }
      }
      val packed = bins.iterator.zipWithIndex.map { case ((_, ids, tot), i) =>
        (s"p${pid}_b$i", ids.toSeq, ids.length, tot, tot.toDouble / budget, false)
      }
      val solo = oversized.iterator.zipWithIndex.map { case ((id, t), i) =>
        (s"p${pid}_o$i", Seq(id), 1, t, t.toDouble / budget, true)
      }
      packed ++ solo
    }.toDF("seq_id", "doc_ids", "n_docs", "total_tokens", "fill", "oversized")
  }
}
