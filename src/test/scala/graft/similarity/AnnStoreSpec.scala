package graft.similarity

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

class AnnStoreSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"annstore_$tag").toString

  test("store probe (all cells) equals ivfTopK recompute AND exact brute force") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.where(col("vec_id") < 4)
    val dir = tmpDir("equiv")
    val idx = AnnStore.write(emb, "vec_id", "embedding", dir, nLists = 8, seed = 42)

    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).sortBy(t => (t._1, t._3))

    val fromStore = key(AnnStore.probe(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8).collect())
    val recomputed = key(Similarity.ivfTopK(emb, q, "vec_id", "embedding",
      k = 5, nLists = 8, nProbe = 8, index = Some(idx)).collect())
    val exact = key(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5).collect())
    assert(fromStore.toSeq == recomputed.toSeq, "store == recompute with the same quantizer")
    assert(fromStore.toSeq == exact.toSeq, "all-cells probe == exact top-k")
  }

  test("probe prunes the corpus scan to the probed cell partitions") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("prune")
    AnnStore.write(emb, "vec_id", "embedding", dir, nLists = 8, seed = 42)
    // partitioned layout on disk: one cell=N dir per inverted list
    val cellDirs = new java.io.File(s"$dir/corpus.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "corpus must be written cell-partitioned")
    // a 1-probe plan carries a partition filter on `cell`, so the scan
    // reads only that cell's files (static pruning via the isin literal)
    val q = emb.where(col("vec_id") < 1)
    val plan = AnnStore.probe(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probe plan must prune on the cell partition column:\n$plan")
    // pruned probe still ranks: self is always in the probed (nearest) cell
    val out = AnnStore.probe(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 1)
      .collect().filter(_.getInt(2) == 1)
    assert(out.length == 1 && out.head.getLong(0) == out.head.getLong(1),
      "rank-1 of a self-query is self (self shares its own cell)")
  }

  test("append assigns with STORED centroids; probe sees old + new rows") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val delta = emb.where(col("vec_id") % 10 === 0)
    val dir = tmpDir("append")
    AnnStore.write(base, "vec_id", "embedding", dir, nLists = 8, seed = 42)
    AnnStore.append(delta, "vec_id", "embedding", dir)
    val stored = spark.read.parquet(s"$dir/corpus.parquet")
    assert(stored.count() == emb.count(), "append adds exactly the delta rows")
    // the quantizer must be the STORED one: a probe over the appended
    // store (all cells) still equals exact brute force over base+delta
    val q = emb.where(col("vec_id") < 3)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3))
    val fromStore = key(AnnStore.probe(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8).collect())
    val exact = key(Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 5).collect())
    assert(fromStore.toSeq == exact.toSeq, "appended store == exact over the full corpus")
  }

  test("IVFPQ store probe (all cells) equals adcTopK recompute") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.where(col("vec_id") < 4)
    val dir = tmpDir("pq_equiv")
    val cb = PqIndex.closedForm(dim = 64, subspaces = 8, k = 16)
    AnnStore.writePq(emb, "vec_id", "embedding", dir, cb, nLists = 8, seed = 42)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).sortBy(t => (t._1, t._3))
    val fromStore = key(AnnStore.probePq(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8).collect())
    val recomputed = key(PqIndex.adcTopK(emb, q, "vec_id", "embedding", cb, k = 5).collect())
    assert(fromStore.toSeq == recomputed.toSeq,
      "all-cells probe of the stored codes == plain ADC over the raw corpus")
  }

  test("IVFPQ store persists codes, not vectors, and probe prunes on cell") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("pq_prune")
    val cb = PqIndex.closedForm(dim = 64, subspaces = 8, k = 16)
    AnnStore.writePq(emb, "vec_id", "embedding", dir, cb, nLists = 8, seed = 42)
    val stored = spark.read.parquet(s"$dir/codes.parquet")
    assert(stored.columns.sorted.toSeq == Seq("cell", "code", "id"),
      "the store holds (id, code, cell) — no raw vector column")
    val cellDirs = new java.io.File(s"$dir/codes.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "codes must be written cell-partitioned")
    val q = emb.where(col("vec_id") < 1)
    val plan = AnnStore.probePq(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"probePq plan must prune on the cell partition column:\n$plan")
  }

  test("appendPq encodes with STORED centroids+codebooks; probe sees old + new") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val delta = emb.where(col("vec_id") % 10 === 0)
    val dir = tmpDir("pq_append")
    val cb = PqIndex.closedForm(dim = 64, subspaces = 8, k = 16)
    AnnStore.writePq(base, "vec_id", "embedding", dir, cb, nLists = 8, seed = 42)
    AnnStore.appendPq(delta, "vec_id", "embedding", dir)
    assert(spark.read.parquet(s"$dir/codes.parquet").count() == emb.count(),
      "appendPq adds exactly the delta rows")
    val q = emb.where(col("vec_id") < 3)
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).sortBy(t => (t._1, t._3))
    val fromStore = key(AnnStore.probePq(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 8).collect())
    val recomputed = key(PqIndex.adcTopK(emb, q, "vec_id", "embedding", cb, k = 5).collect())
    assert(fromStore.toSeq == recomputed.toSeq,
      "appended store == ADC over the full corpus (stored quantizers, no retrain)")
  }

  test("readCodebooks round-trips the codebooks as exact doubles") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("pq_roundtrip")
    val cb = PqIndex.build(emb, "embedding", dim = 64, subspaces = 4, k = 8, seed = 5)
    AnnStore.writePq(emb, "vec_id", "embedding", dir, cb, nLists = 4, seed = 5)
    val read = AnnStore.readCodebooks(spark, dir)
    assert(read.subspaces == cb.subspaces && read.k == cb.k && read.subDim == cb.subDim)
    assert(read.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq,
      "parquet doubles are bit-exact, so probe-time ADC tables == encode geometry")
  }

  test("readIndex round-trips centroids as exact doubles") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("roundtrip")
    val written = AnnStore.write(emb, "vec_id", "embedding", dir, nLists = 4, seed = 7)
    val read = AnnStore.readIndex(spark, dir)
    assert(read.nLists == written.nLists)
    assert(read.centroids.map(_.toSeq).toSeq == written.centroids.map(_.toSeq).toSeq,
      "parquet doubles are bit-exact, so probe-time assignment == build-time")
  }
}
