package graft.similarity

import graft.{SparkSpec, Tables}

class IvfIndexSpec extends SparkSpec {

  test("localKMeans is deterministic and separates well-separated clusters") {
    val rnd = new scala.util.Random(7)
    // two tight blobs around (0,0) and (10,10)
    val pts = Array.tabulate(200) { i =>
      val base = if (i % 2 == 0) 0.0 else 10.0
      Array(base + rnd.nextGaussian() * 0.1, base + rnd.nextGaussian() * 0.1)
    }
    val c1 = IvfIndex.localKMeans(pts, 2, 15, seed = 42)
    val c2 = IvfIndex.localKMeans(pts, 2, 15, seed = 42)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "same seed, same centers")
    val sorted = c1.sortBy(_.head)
    assert(math.abs(sorted(0)(0)) < 1.0 && math.abs(sorted(1)(0) - 10.0) < 1.0)
  }

  test("localKMeans caps k at the number of points and survives duplicates") {
    val pts = Array.fill(3)(Array(1.0, 2.0))
    val cs = IvfIndex.localKMeans(pts, 8, 5, seed = 1)
    assert(cs.length == 3)
    assert(cs.forall(c => c.sameElements(Array(1.0, 2.0))))
  }

  test("build trains on a bounded sample and is reusable across ivfTopK calls") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.build(emb, "embedding", nLists = 8, sampleSize = 256, seed = 42)
    assert(idx.nLists == 8)
    assert(idx.centroids.forall(_.length == 64))
    import org.apache.spark.sql.functions.col
    val q = emb.where(col("vec_id") < 3)
    val out = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
      nLists = 8, nProbe = 8, index = Some(idx)).collect()
    // nProbe == nLists probes every cell => exact: rank-1 must be self
    val self = out.filter(_.getAs[Int]("rnk") == 1)
    assert(self.length == 3)
    self.foreach(r => assert(r.getAs[Long]("q_id") == r.getAs[Long]("n_id")))
  }
}
