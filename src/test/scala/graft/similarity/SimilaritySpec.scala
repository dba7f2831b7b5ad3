package graft.similarity

import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("bruteForceTopK: rank 1 is self with cosine ~1, k rows per query") {
    val out = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 5).collect()
    assert(out.length == 15)
    val self = out.filter(_.getAs[Int]("rnk") == 1)
    self.foreach { r =>
      assert(r.getAs[Long]("q_id") == r.getAs[Long]("n_id"))
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
    // ranks strictly ordered by cosine within each query
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivfTopK achieves reasonable recall vs brute force") {
    val q = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 10, nLists = 8, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // self is always in the probed cell
    (0L until 10L).foreach(q0 => assert(ivf.contains((q0, q0))))
  }

  test("ivfTopK centroid assignment is a native expression, no ScalaUDF in the plan") {
    val q = emb.where(col("vec_id") < 3)
    val plan = Similarity.ivfTopK(emb, q, "vec_id", "embedding", k = 5,
      nLists = 8, nProbe = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan.take(2000))
    assert(plan.contains("nearest_centroids"), plan.take(2000))
  }

  test("lshTopK achieves reasonable recall vs brute force") {
    val q = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val lsh = Similarity.lshTopK(emb, q, "vec_id", "embedding", dim = 64, k = 10,
      sigBits = 16, bandBits = 2) // 8 bands of 2 bits -> high recall
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
    // self must always be found (identical signature)
    (0L until 10L).foreach(q0 => assert(lsh.contains((q0, q0))))
  }

  test("int8TopK: quantized scores track exact cosine with high recall") {
    val q = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val i8 = Similarity.int8TopK(emb, q, "vec_id", "embedding", k = 10)
    val pairs = i8.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = bf.intersect(pairs).size.toDouble / bf.size
    assert(recall >= 0.9, s"int8 recall too low: $recall")
    // self-match scores stay ~1 after dequantization
    val selfScores = i8.where(col("q_id") === col("n_id"))
      .collect().map(_.getAs[Double]("cosine"))
    assert(selfScores.nonEmpty && selfScores.forall(s => math.abs(s - 1.0) < 0.02))
  }

  test("hardNegatives excludes the query's own label, keeps top-k order") {
    val q = emb.where(col("vec_id") < 3)
    val out = Similarity.hardNegatives(emb, q, "vec_id", "embedding", "label", k = 5)
      .collect()
    assert(out.length == 15)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(labels(r.getAs[Long]("n_id")) != labels(r.getAs[Long]("q_id")),
        s"same-label negative leaked: $r")
    }
    // a hard negative is never ranked above what brute force finds among
    // different-label vectors: spot-check monotone cosine within query
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val cos = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("quantizeInt8 codes are within int8 range and scale reconstructs") {
    val out = Similarity.quantizeInt8(emb.limit(50), "embedding").collect()
    out.foreach { r =>
      val codes = r.getAs[scala.collection.Seq[Byte]]("embedding_q")
      val scale = r.getAs[Double]("embedding_scale")
      val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(codes.forall(c => c >= -127 && c <= 127))
      // max reconstruction error is half a quantization step
      orig.zip(codes).foreach { case (o, c) =>
        assert(math.abs(o - c * scale) <= scale / 2 + 1e-9)
      }
    }
  }
}
