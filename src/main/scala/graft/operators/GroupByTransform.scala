package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Row-preserving grouped TRANSFORMS — the pandas `groupby().rank()` /
  * `shift()` / `diff()` family, completing the engine's
  * reduce-scan-transform triangle (reductions collapse groups, scans
  * accumulate along an order, transforms map each row against its
  * group's context). All are single-window operators: one shuffle by
  * group, the [[GroupByScan]] scan topology — no join-back, no second
  * pass.
  */
object GroupByTransform {

  /** Supported [[rankBy]] methods (pandas `groupby().rank(method=)`):
    * average (default), min, max, dense. ("first" needs the caller's
    * total order to break ties — use a [[shiftBy]]-style explicit order
    * with row_number directly; it is deliberately not offered here
    * because without a total order it is non-deterministic.) */
  val rankMethods: Set[String] = Set("average", "min", "max", "dense")

  /** pandas `groupby().rank()`: appends `as` = the rank of `valueCol`
    * within its `by` group. NaN/NULL values get a NULL rank and do not
    * consume ranks (pandas `na_option="keep"`): invalid values sort
    * LAST in the ranking window, so the valid rows' ranks are unaffected
    * and the invalid rows' ranks are masked out. `pct=true` divides by
    * the group's VALID count (pandas pct contract). Ties share a rank
    * per `method` — deterministic without any total order. */
  def rankBy(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      as: String = "rank",
      method: String = "average",
      ascending: Boolean = true,
      pct: Boolean = false): DataFrame = {
    require(by.nonEmpty, "rankBy needs at least one grouping column")
    require(rankMethods(method),
      s"rankBy method must be one of ${rankMethods.mkString("/")} (got $method)")
    require(!df.columns.contains(as),
      s"rankBy output column $as already exists in the input; pick another name or drop it first")
    val dt = df.schema(valueCol).dataType
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), dt)
    val ord = if (ascending) vn.asc_nulls_last else vn.desc_nulls_last
    val w = Window.partitionBy(by.map(col): _*).orderBy(ord)
    val grp = Window.partitionBy(by.map(col): _*)
    // ties: min = SQL rank(); max = min + peers - 1; average = their
    // midpoint; dense = dense_rank(). Peer count = a CURRENT ROW..CURRENT
    // ROW range frame over the SAME ordered window (peer-bounded, so it
    // counts the tie class) — same exchange and sort, no extra shuffle.
    val peers = count(vn).over(w.rangeBetween(Window.currentRow, Window.currentRow))
    val minR = rank().over(w).cast(DoubleType)
    val raw: Column = method match {
      case "min"     => minR
      case "max"     => minR + peers - lit(1)
      case "average" => minR + (peers - lit(1)) / lit(2.0)
      case "dense"   => dense_rank().over(w).cast(DoubleType)
    }
    val nValid = count(vn).over(grp).cast(DoubleType)
    val ranked = if (pct) raw / nValid else raw
    df.withColumn(as, when(vn.isNotNull, ranked))
  }

  /** pandas `groupby().shift(periods)`: appends `as` = `valueCol` from
    * `periods` rows earlier (negative = later) within the group under
    * the caller-supplied TOTAL order — same determinism contract as the
    * positional reductions and [[Rolling.rollingRows]] (SURVEY §7.4).
    * Rows shifted in from beyond the group boundary are NULL. Values
    * move as-is: NaN stays NaN (shift is positional, not NaN-skipping).
    */
  def shiftBy(
      df: DataFrame,
      by: Seq[String],
      order: Seq[Column],
      valueCol: String,
      periods: Int = 1,
      as: String = "shifted"): DataFrame = {
    require(by.nonEmpty, "shiftBy needs at least one grouping column")
    require(order.nonEmpty, "shiftBy needs an explicit total order")
    require(periods != 0, "shiftBy needs periods != 0 (0 is the identity)")
    require(!df.columns.contains(as),
      s"shiftBy output column $as already exists in the input; pick another name or drop it first")
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
    val shifted =
      if (periods > 0) lag(col(valueCol), periods).over(w)
      else lead(col(valueCol), -periods).over(w)
    df.withColumn(as, shifted)
  }

  /** pandas `groupby().pct_change()`: fractional change from the
    * `periods`-shifted value, `v / shifted - 1` — one window, the
    * [[shiftBy]] contract. NULL where the shift runs off the group
    * boundary; NaN propagates (positional semantics). A zero shifted
    * value yields IEEE ±Infinity/NaN, like pandas — pick a strictly
    * signed column or pre-filter zeros if that matters downstream. */
  def pctChangeBy(
      df: DataFrame,
      by: Seq[String],
      order: Seq[Column],
      valueCol: String,
      periods: Int = 1,
      as: String = "pct_change"): DataFrame = {
    require(by.nonEmpty, "pctChangeBy needs at least one grouping column")
    require(order.nonEmpty, "pctChangeBy needs an explicit total order")
    require(periods != 0, "pctChangeBy needs periods != 0 (0 is the zero column)")
    require(!df.columns.contains(as),
      s"pctChangeBy output column $as already exists in the input; pick another name or drop it first")
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
    val shifted =
      if (periods > 0) lag(col(valueCol), periods).over(w)
      else lead(col(valueCol), -periods).over(w)
    df.withColumn(as, col(valueCol).cast(DoubleType) / shifted.cast(DoubleType) - lit(1.0))
  }

  /** pandas `interpolate(method="time", limit_area="inside")` per group:
    * linear time-weighted interpolation of missing values (NULL or NaN)
    * between their nearest valid neighbors. Valid rows keep their value;
    * interior gaps get `prev + (next - prev) * (t - t_prev) / (t_next -
    * t_prev)` on the micros axis; LEADING and TRAILING missing runs stay
    * NULL (no extrapolation — compose with [[GroupByScan]] ffill/bfill
    * for edge fills). The irregular-series sibling of
    * [[Resample.interpolateGrid]], which interpolates a declared regular
    * grid instead.
    *
    * Plan shape: one shuffle by group, ONE in-partition sort (both
    * neighbor fills share the `(tsCol, tieBreak)` order; the backward
    * frame ends at 1 PRECEDING, the forward starts at 1 FOLLOWING), four
    * running ignore-null fills in the same WindowExec — the scan topology,
    * O(1) state per row, no join, no group-sized buffers.
    *
    * If a gap's bounding valid observations share one timestamp (t_next ==
    * t_prev, only possible with duplicate timestamps), the backward value
    * wins — guarded on both engines, so no division by zero. `tieBreak`
    * must make the order total for deterministic results (SURVEY §7.4).
    *
    * @param tsCol TimestampType column (the time axis)
    * @param as    appended DoubleType output column
    */
  def interpolateTime(
      df: DataFrame,
      by: Seq[String],
      tsCol: String,
      valueCol: String,
      as: String = "interp",
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(by.nonEmpty, "interpolateTime needs at least one grouping column")
    require(!df.columns.contains(as),
      s"interpolateTime output column $as already exists in the input; pick another name or drop it first")
    require(df.schema(tsCol).dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"interpolateTime needs a TimestampType time axis (got ${df.schema(tsCol).dataType} for $tsCol)")
    val dt = df.schema(valueCol).dataType
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), dt).cast(DoubleType)
    val tm = unix_micros(col(tsCol)).cast(DoubleType)
    val ord  = (col(tsCol) +: tieBreak).map(_.asc)
    val base = Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
    val wp = base.rowsBetween(Window.unboundedPreceding, -1)
    val wn = base.rowsBetween(1, Window.unboundedFollowing)
    // value and time travel under the SAME validity guard, so each side's
    // (v, t) pair comes from one observation
    val pv = last(when(vn.isNotNull, vn), ignoreNulls = true).over(wp)
    val pt = last(when(vn.isNotNull, tm), ignoreNulls = true).over(wp)
    val nv = first(when(vn.isNotNull, vn), ignoreNulls = true).over(wn)
    val nt = first(when(vn.isNotNull, tm), ignoreNulls = true).over(wn)
    val interp = when(nt === pt, pv)
      .otherwise(pv + (nv - pv) * (tm - pt) / (nt - pt))
    df.withColumn(as, when(vn.isNotNull, vn).otherwise(interp))
  }

  /** pandas `groupby().diff(periods)`: `valueCol` minus its
    * `periods`-shifted value — one window, the [[shiftBy]] contract.
    * NULL where the shift runs off the group boundary; NaN propagates
    * through the subtraction (positional semantics, like shift). */
  def diffBy(
      df: DataFrame,
      by: Seq[String],
      order: Seq[Column],
      valueCol: String,
      periods: Int = 1,
      as: String = "diff"): DataFrame = {
    require(by.nonEmpty, "diffBy needs at least one grouping column")
    require(order.nonEmpty, "diffBy needs an explicit total order")
    require(periods != 0, "diffBy needs periods != 0 (0 is the zero column)")
    require(!df.columns.contains(as),
      s"diffBy output column $as already exists in the input; pick another name or drop it first")
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
    val shifted =
      if (periods > 0) lag(col(valueCol), periods).over(w)
      else lead(col(valueCol), -periods).over(w)
    df.withColumn(as, col(valueCol) - shifted)
  }
}
