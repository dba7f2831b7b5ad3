package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension builder: turn a row-kind changelog
  * (the model behind the CDC family — `RowKindOps`, `CdcCapture`,
  * `StreamingOps.applyCdcBatch`) into a versioned dimension table, one row
  * per (key, version) with a validity interval. `applyCdcBatch` answers
  * "what does the table look like NOW"; this answers "what did it look
  * like at any ord" — the warehouse history side of the same changelog.
  *
  * Semantics, per key ordered by `ordCol`:
  *   - every +I/+U change OPENS a version at its ord;
  *   - the NEXT change of any kind (update or delete) CLOSES it — the open
  *     version's `valid_to` is that change's ord, half-open [from, to);
  *   - -D closes the previous version and emits no row of its own;
  *   - -U before-images are dropped up front (they duplicate the state the
  *     previous +I/+U already opened and would otherwise close it early);
  *   - `valid_to` NULL marks the current version.
  *
  * Spark-first shape: ONE hash exchange on the key + ONE in-partition sort
  * feeding a `lead` window — cost identical to the as-of join's carry pass
  * regardless of how many versions a key has. No self-join, no per-key
  * iteration; at 100 TB the changelog shuffles once.
  *
  * `ordCol` must be unique per key (CDC offsets / CL_SEQ are); ties make
  * the close order arbitrary, as in any sort-based history builder.
  */
object Scd2 {

  def fromChangelog(changes: DataFrame, keys: Seq[String], ordCol: String,
      kindCol: String = RowKindOps.RowKindCol,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      isCurrent: String = "is_current"): DataFrame = {
    require(keys.nonEmpty, "scd2: at least one key column")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ordCol))
    changes
      .where(col(kindCol) =!= "-U")
      .withColumn(validTo, lead(col(ordCol), 1).over(w))
      .where(col(kindCol) =!= "-D")
      .withColumn(validFrom, col(ordCol))
      .withColumn(isCurrent, col(validTo).isNull)
      .drop(kindCol, ordCol)
  }
}
