package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for embeddingNearDupPairs' sliceFactor (VERDICT r13
  * #7): the within-bucket self-join's key domain is only numBands·2^bandBits
  * (512 at the defaults), so at 100× scale a near-cap bucket's quadratic
  * pair grid lands on ONE task however wide the cluster; the r13 fix
  * replicates each bucket across `sliceFactor` deterministic slices.
  * This main times the operator at a given sfDir and slice factor AND
  * reports per-stage task-width stats (tasks, max/median task ms, and
  * tasks_near_max = tasks within 2× of the MAX task duration) for the
  * stages with the largest max task — the skew evidence: at sliceFactor=1
  * the pair-grid stage's max task dwarfs its median; at 32 the same work
  * spreads.
  *
  * Usage: runMain graft.SlicePoint <sfDir> <sliceFactor> [reps] [sliceRows] [skewClones]
  * skewClones > 0 unions the corpus with that many exact clones of one
  * vector (fresh ids) — a planted near-cap bucket whose pair grid IS the
  * single-task hazard the slicing exists for.
  * Prints one JSON line: {"metric":"slice_point",...}
  */
object SlicePoint {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sliceFactor = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val sliceRows = args.lift(3).map(_.toInt).getOrElse(2048)
    val skewClones = args.lift(4).map(_.toInt).getOrElse(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE > cpus emulates the wide-cluster shape (reducers
    // >> the 512-key band domain) where the single-task pair-grid hazard
    // actually manifests — at 32 reducers each holds ~16 keys and the
    // stall hides behind neighbors
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.datetime.java8API.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (stageId, taskMillis) — a queue because task-end events arrive on
    // listener threads concurrently with the query
    val taskDurations = new ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskDurations.add((t.stageId, t.taskInfo.duration))
    })

    val base = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val emb =
      if (skewClones <= 0) base
      else {
        // planted skew: exact clones share the clone-source's signature,
        // so they all land in ITS buckets — one bucket of ~skewClones
        // members whose pair grid lands on one task unless sliced
        val src = base.where(col("vec_id") === 0).select(col("embedding"))
        base.unionByName(
          src.crossJoin(spark.range(1, skewClones + 1).toDF("i"))
            .select((col("i") + 10000000L).as("vec_id"), col("embedding")))
      }
    def run(): Long = {
      val pairs = graft.dedup.Dedup.embeddingNearDupPairs(
        emb, "vec_id", "embedding", dim = 64, threshold = 0.9,
        sliceFactor = sliceFactor, sliceRows = sliceRows).count()
      GraftCaches.releaseAll(spark, blocking = true)
      pairs
    }

    // Task-end events arrive on Spark's ASYNC listener bus: without a
    // drain, clearing just before the final rep can leave the previous
    // rep's late events in the stats, and the final rep's tail may not
    // have landed when the queue is read (ADVICE r14). The bus has no
    // public drain hook, so wait a fixed 2 s — run() has already returned
    // (its count() action completed), so only already-emitted events are
    // in flight; 2 s is orders of magnitude beyond bus latency and sits
    // OUTSIDE both timed regions.
    def drainListenerBus(): Unit = Thread.sleep(2000)

    val warmPairs = run() // codegen + JIT outside the timed region
    val walls = (1 to reps).map { i =>
      System.gc()
      if (i == reps) { // stage stats from the last rep only
        drainListenerBus()
        taskDurations.clear()
      }
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    drainListenerBus() // let the final rep's tail events land before reading
    import scala.jdk.CollectionConverters._
    val byStage = taskDurations.asScala.toSeq.groupBy(_._1)
      .map { case (sid, ds) => (sid, ds.map(_._2).sorted) }
    val top = byStage.toSeq.sortBy(-_._2.last).take(3).map { case (sid, ds) =>
      val med = ds(ds.length / 2)
      val busy = ds.count(_ * 2 >= ds.last) // tasks within 2x of the max
      f"""{"stage":$sid,"tasks":${ds.length},"max_ms":${ds.last},""" +
        f""""median_ms":$med,"sum_ms":${ds.sum},"tasks_near_max":$busy}"""
    }.mkString("[", ",", "]")
    val sortedWalls = walls.sorted
    println(f"""{"metric":"slice_point","dir":"$dir","slice_factor":$sliceFactor,""" +
      f""""pairs":$warmPairs,"median_sec":${sortedWalls(sortedWalls.length / 2)}%.3f,""" +
      f""""min_sec":${sortedWalls.head}%.3f,"reps":$reps,"top_stages":$top}""")
    spark.stop()
  }
}
