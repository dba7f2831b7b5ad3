package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy: every doc exactly once, no bin over budget, oversized flagged") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 500L).map(i => (i, 1 + rnd.nextInt(300))) :+ (1000L, 900)
    val df = docs.toDF("doc_id", "toks")
    val out = Packing.packGreedy(df, "doc_id", "toks", budget = 512, numPartitions = 4)
    val rows = out.collect()

    // partition of the id space: every doc in exactly one bin
    val packedIds = rows.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids"))
    assert(packedIds.length == docs.length)
    assert(packedIds.toSet == docs.map(_._1).toSet)
    // budget respected for all regular bins; totals consistent
    rows.foreach { r =>
      val ids = r.getAs[scala.collection.Seq[Long]]("doc_ids")
      val tot = r.getAs[Long]("total_tokens")
      assert(tot == ids.map(i => docs.find(_._1 == i).get._2.toLong).sum)
      if (!r.getAs[Boolean]("oversized")) assert(tot <= 512)
      else assert(ids.length == 1 && tot > 512)
    }
    assert(rows.count(_.getAs[Boolean]("oversized")) == 1)
    // FFD on uniform token counts should pack densely
    val regular = rows.filter(!_.getAs[Boolean]("oversized"))
    val fill = regular.map(_.getAs[Long]("total_tokens")).sum.toDouble / (regular.length * 512)
    assert(fill > 0.8, s"fill factor $fill too low for FFD")
  }

  test("packGreedy is deterministic for a fixed partition count") {
    val df = (1L to 200L).map(i => (i, (i % 97 + 1).toInt)).toDF("doc_id", "toks")
    def run() = Packing.packGreedy(df, "doc_id", "toks", budget = 128, numPartitions = 8)
      .orderBy("seq_id").collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Long]]("doc_ids").toSeq).toSeq
    assert(run() == run())
  }
}
