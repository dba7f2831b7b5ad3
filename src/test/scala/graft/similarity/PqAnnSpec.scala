package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  /** Exact L2^2 top-k (the metric PQ approximates), computed inline. */
  private def exactTopK(k: Int): Map[Long, Seq[Long]] = {
    val vd = col("embedding").cast("array<double>")
    val c = emb.select(col("vec_id").as("n_id"), vd.as("nv"))
    val q = emb.where(col("vec_id") < 5).select(col("vec_id").as("q_id"), vd.as("qv"))
    c.crossJoin(q)
      .withColumn("d2", aggregate(zip_with(col("qv"), col("nv"),
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, x) => acc + x))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2").asc, col("n_id"))))
      .where(col("rnk") <= k)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (g, rs) => g -> rs.map(_.getLong(1)).toSeq }
  }

  test("a vector assembled from centroids encodes to those codes and self-matches at dist2 ~ 0") {
    val cb = PqIndex.closedForm(dim = 16, subspaces = 4, k = 8, seed = 7)
    val picks = Seq(3, 0, 5, 7)
    val vec = picks.zipWithIndex.flatMap { case (j, m) =>
      cb.centroids(m)(j).map(_.toFloat)
    }
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val code = PqIndex.encode(df, "vec_id", "embedding", cb)
      .select("code").as[Seq[Int]].collect()(0)
    assert(code === picks)
    val hit = PqIndex.adcTopK(df, df, "vec_id", "embedding", cb, k = 1).collect()(0)
    assert(hit.getAs[Long]("n_id") === 1L && hit.getAs[Double]("dist2") < 1e-9)
  }

  test("codes are within [0, k) and encode is deterministic under repartition") {
    val cb = PqIndex.closedForm(dim = 64, subspaces = 8, k = 16)
    val a = PqIndex.encode(emb, "vec_id", "embedding", cb)
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(a.forall(_._2.forall(c => c >= 0 && c < 16)))
    val b = PqIndex.encode(emb.repartition(7), "vec_id", "embedding", cb)
      .orderBy("vec_id").as[(Long, Seq[Int])].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("trained codebooks: high recall on clustered data, lower quantization error than closed-form") {
    // PQ learns the data's structure — on isotropic random vectors (the
    // synthetic embeddings table) distances concentrate and ANY 8-byte
    // code scrambles top-10, so recall is spec'd on CLUSTERED vectors,
    // the regime embedding corpora live in and quantizers exist for
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10, 64)(rnd.nextGaussian().toFloat)
    val pts = (0L until 300L).map { i =>
      val c = centers((i % 10).toInt)
      (i, c.map(x => x + rnd.nextGaussian().toFloat * 0.15f).toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val trained = PqIndex.build(df, "embedding", dim = 64, subspaces = 8, k = 16, seed = 5)
    val closed = PqIndex.closedForm(dim = 64)
    // 8-byte codes resolve CLUSTERS, not the epsilon-orderings inside one
    // (that is the quantization tradeoff, and re-ranking the shortlist
    // with exact vectors is the standard second stage) — so the quality
    // gate is cluster precision: every PQ top-10 neighbor of a query must
    // come from the query's own cluster (vec_id % 10)
    val got = PqIndex.adcTopK(df, df.where(col("vec_id") < 5),
        "vec_id", "embedding", trained, k = 10)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val precision = got.count { case (qid, nid) => nid % 10 == qid % 10 }
      .toDouble / got.length
    assert(precision >= 0.9, s"trained PQ cluster precision too low: $precision")
    // training minimizes subspace quantization error: mean self-distance
    // under the trained codebooks must beat the distribution-blind ones
    def meanSelfDist(cb: PqCodebooks): Double =
      PqIndex.adcTopK(df, df, "vec_id", "embedding", cb, k = 1000000)
        .where(col("q_id") === col("n_id"))
        .agg(avg("dist2")).collect()(0).getDouble(0)
    assert(meanSelfDist(trained) < meanSelfDist(closed))
  }

  test("ivfPqTopK: all-cells probe equals plain ADC; pruned probes keep useful recall") {
    val cb = PqIndex.closedForm(dim = 64)
    val ivf = IvfIndex.build(emb, "embedding", nLists = 8)
    val q = emb.where(col("vec_id") < 5)
    val full = PqIndex.adcTopK(emb, q, "vec_id", "embedding", cb, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val all = PqIndex.ivfPqTopK(emb, q, "vec_id", "embedding", cb, ivf,
        nProbe = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(all === full, "probing every cell must equal plain ADC")
    val pruned = PqIndex.ivfPqTopK(emb, q, "vec_id", "embedding", cb, ivf,
        nProbe = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = full.count { case (a, b, _) => pruned((a, b)) }.toDouble / full.size
    assert(recall >= 0.3, s"nProbe=3/8 recall collapsed: $recall")
  }

  test("residual IVFPQ: trained residual codebooks beat raw-vector PQ quantization error") {
    // clustered data (the regime IVFPQ exists for): the coarse quantizer
    // explains the clusters, so residuals have far less variance and the
    // same code budget resolves finer structure
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(8, 64)(rnd.nextGaussian().toFloat * 2f)
    val pts = (0L until 240L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => x + rnd.nextGaussian().toFloat * 0.2f).toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    val ivf = IvfIndex.build(df, "embedding", nLists = 8, seed = 3)
    val raw = PqIndex.build(df, "embedding", dim = 64, subspaces = 8, k = 16, seed = 5)
    val res = PqIndex.buildResidual(df, "embedding", dim = 64, ivf,
      subspaces = 8, k = 16, seed = 5)
    def meanSelf(top: org.apache.spark.sql.DataFrame): Double =
      top.where(col("q_id") === col("n_id"))
        .agg(avg("dist2")).collect()(0).getDouble(0)
    val rawErr = meanSelf(PqIndex.adcTopK(df, df, "vec_id", "embedding", raw, k = 1000000))
    val resErr = meanSelf(PqIndex.ivfPqResidualTopK(df, df, "vec_id", "embedding",
      res, ivf, nProbe = 8, k = 1000000))
    assert(resErr < rawErr,
      s"residual encoding must cut quantization error: residual $resErr vs raw $rawErr")
    // and it stays deterministic under repartition
    val a = PqIndex.encodeResidual(df, "vec_id", "embedding", res, ivf)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val b = PqIndex.encodeResidual(df.repartition(7), "vec_id", "embedding", res, ivf)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("WindowGroupLimit prunes to per-query top-k on the executors") {
    val cb = PqIndex.closedForm(dim = 64)
    val plan = PqIndex.adcTopK(emb, emb.where(col("vec_id") < 5),
      "vec_id", "embedding", cb, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
