package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.functions.NanOps._

/** Grouped scans — the Spark-native `groupby_scan` (reference
  * core.py:2718-2901, Scan registry aggregations.py:709-737).
  *
  * The reference implements scans as a Blelloch prefix scan over chunks:
  * a blockwise scan kernel, a per-chunk per-group carry reduction, and a
  * binary op that folds the carry into the next chunk
  * (reference aggregations.py:653-706, core.py:2948-2992). In Spark that
  * entire topology *is* `WindowExec`: one shuffle to co-locate each group,
  * an in-partition sort by position, and an incremental running frame —
  * so each scan compiles to a single window expression.
  *
  * Positional contract: the caller supplies the ordering columns (arrays
  * are intrinsically ordered, DataFrames are not — SURVEY §7.4). Ties in
  * the ordering would make results nondeterministic; pass a tie-breaking
  * unique column last.
  */
object GroupByScan {

  val scanNames: Seq[String] = Seq(
    "cumsum", "nancumsum", "cumprod", "nancumprod",
    "ffill", "bfill", "cumcount", "cummax", "cummin")

  /** Appends output column `as` = scan of `value` within each `by` group
    * ordered by `orderBy`. All other columns pass through (a scan is
    * shape-preserving, one output row per input row).
    *
    * @param exactScale as in [[Agg.exactScale]]: run the running sum over
    *                   decimal(18,scale) for order-independent exactness.
    */
  def scan(
      df: DataFrame,
      value: String,
      by: Seq[String],
      func: String,
      orderBy: Seq[Column],
      as: String,
      exactScale: Option[Int] = None): DataFrame = {
    val dt = df.schema(value).dataType
    val v  = col(value)
    val vn = nanToNull(v, dt)

    val fwd: WindowSpec = Window
      .partitionBy(by.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd: WindowSpec = Window
      .partitionBy(by.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // the cast must wrap the *windowed* expression, not the bare aggregate
    def sumE(c: Column, w: WindowSpec): Column = exactScale match {
      case Some(s) =>
        sum(c.cast(org.apache.spark.sql.types.DecimalType(18, s))).over(w).cast("double")
      case None => sum(c).over(w)
    }

    val expr = func match {
      // nancumsum: NaN contributes 0 but the scan keeps running
      // (reference aggregations.py:711; np.nancumsum semantics).
      case "nancumsum"  => coalesce(sumE(vn, fwd), lit(0).cast("double"))
      // plain cumsum propagates NaN from first occurrence (numpy); the
      // reference wanted but could not ship it (aggregations.py:709-710) —
      // capability-parity bonus here.
      case "cumsum"     => sumE(v, fwd)
      case "cumprod"    => product(v).over(fwd)
      case "nancumprod" => coalesce(product(vn).over(fwd), lit(1).cast("double"))
      // ffill/bfill (reference aggregations.py:716-735, kernel
      // aggregate_flox.py:254-277): last/first valid value at/before/after
      // the current row. Leading (trailing) gaps stay missing.
      case "ffill" => last(vn, ignoreNulls = true).over(fwd)
      case "bfill" => first(vn, ignoreNulls = true).over(bwd)
      // extras beyond the reference registry:
      case "cumcount" => count(vn).over(fwd)
      case "cummax"   => max(vn).over(fwd)
      case "cummin"   => min(vn).over(fwd)
      case other => throw new IllegalArgumentException(s"unknown scan: $other")
    }
    df.withColumn(as, expr)
  }
}
