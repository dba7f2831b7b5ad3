package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling and split assignment for
  * training-data pipelines (SURVEY §2.6).
  *
  * `Dataset.sample` draws differently under every repartition and Spark
  * version — useless for reproducible corpus subsets or train/valid/test
  * membership that must survive reprocessing. The standard fix is
  * HASH-based sampling: a row's fate depends only on (key, salt), via the
  * first 8 hex chars of md5 compared lexicographically against a fraction
  * threshold (hex-string order == numeric order). Pure codegen'd Columns,
  * shuffle-free, identical across engines (DuckDB/Spark md5 agree), and
  * per-key stable: resampling with a larger fraction yields a superset.
  */
object Sampling {

  /** Map a fraction in [0,1] to its 8-hex-digit threshold. A full
    * fraction maps to "g" — lexicographically above every 8-hex bucket —
    * so `bucket < threshold` keeps ALL keys: the strict compare against
    * "ffffffff" would deterministically drop any key whose md5 bucket is
    * exactly that value (~2^-32 per key, but a guaranteed loss at corpus
    * scale), violating the fraction-1.0 "keeps everything" contract.
    */
  private[graft] def fractionToHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    if (fraction >= 1.0) "g"
    else f"${math.round(fraction * 0xffffffffL)}%08x"
  }

  /** The 8-hex-char bucket of a key (lowercase, uniform over keys). */
  def hashBucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** Keep a deterministic `fraction` of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "graft"): DataFrame =
    if (fraction >= 1.0) df
    else df.where(hashBucket(col(keyCol), salt) < lit(fractionToHex(fraction)))

  /** Data-mixture re-weighting: keep a per-group deterministic fraction
    * (e.g. up-weight books, down-weight common-crawl when composing a
    * training mix). Same md5-threshold scheme as [[hashSample]], so the
    * kept set is stable under reprocessing and a larger fraction yields a
    * superset per group. Groups absent from `fractions` keep
    * `defaultFraction`. Pure codegen'd predicate — pushes to the scan.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, groupCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val h = hashBucket(col(keyCol), salt)
    val thr = fractions.foldLeft(lit(fractionToHex(defaultFraction)): Column) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(fractionToHex(f))).otherwise(acc)
    }
    df.where(h < thr)
  }

  /** Keep EXACTLY `k` rows per group (all rows when a group is smaller) —
    * the quota form of [[stratifiedSample]]: mixture recipes are often
    * stated as "n documents per source", which no fraction can hit
    * exactly when group sizes drift between snapshots. Rows rank by
    * (md5 bucket, key) inside each group, so the chosen set is
    * deterministic, engine-independent, stable under repartitioning, and
    * MONOTONE: raising k only adds rows, never swaps them.
    *
    * Scale shape: rank-filter windows compile to WindowGroupLimit
    * (plan-asserted in the spec) — each map task keeps only its local
    * top-k per group before the exchange, so the shuffle carries
    * O(k * groups * tasks) rows, not the corpus.
    */
  def sampleKPerGroup(df: DataFrame, keyCol: String, groupCol: String, k: Int,
      salt: String = "graft"): DataFrame = {
    require(k >= 0, s"sampleKPerGroup: k must be >= 0, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }

  /** Assign every row to a named split by cumulative hash ranges, e.g.
    * Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1). Weights must sum
    * to ~1; the last split absorbs rounding so every row lands somewhere.
    * Adds `outCol` with the split name.
    */
  def assignSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      salt: String = "graft", outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), "bad split weights")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val h = hashBucket(col(keyCol), salt)
    val cums = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    // last split is the unconditional otherwise — rounding can't orphan rows
    val assigned = splits.init.zip(cums.init).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, ((name, _), cum)) =>
        when(h < lit(fractionToHex(cum)), name).otherwise(acc)
      }
    df.withColumn(outCol, assigned)
  }
}
