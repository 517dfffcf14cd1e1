package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row with the single most recent right row
  * at or before (optionally strictly before) its time, per key — the
  * canonical "operator Spark lacks" (the brief's example for custom-plan
  * work), built here by composition (preference (a)): no custom SparkPlan
  * needed because the union-then-ordered-fill formulation maps exactly
  * onto WindowExec.
  *
  * All three pandas `merge_asof` directions ship: [[asofJoin]] (backward,
  * the default), [[asofJoinForward]] (earliest right row at-or-after /
  * strictly after), and [[asofJoinNearest]] (closer of the two, backward
  * winning ties) — each the same one-Exchange union-and-fill topology.
  *
  * Plan shape: union the two inputs tagged by side, shuffle once by key,
  * sort by (time, side), and forward-fill the right-side payload struct —
  * one Exchange + one in-partition sort, identical cost to a grouped scan
  * (§2.2), with none of the range-join candidate blowup of the naive
  * `l JOIN r ON key AND rts <= lts` + row_number formulation (which
  * materializes every (left, earlier-right) pair before pruning: at 100 TB
  * that intermediate is quadratic in rows-per-key; this one is linear).
  * Skewed keys inherit the same mitigation as scans (chunk + carry).
  *
  * The right payload travels as one struct, so all its fields come
  * atomically from the same matched row. Ties on (key, rightTime) are
  * resolved toward the later union order — require unique (key,
  * rightTime) on the right for deterministic results (matching DuckDB's
  * ASOF JOIN contract used as the oracle).
  */
object AsOfJoin {

  /** @param keys        join key column names, present in both inputs
    * @param leftTime    left event-time column name
    * @param rightTime   right event-time column name (may differ)
    * @param rightValues right payload columns to attach, renamed via
    *                    `rightPrefix` in the output
    * @param strict      true: match rightTime <  leftTime;
    *                    false: match rightTime <= leftTime
    * @param tolerance   optional max allowed (leftTime - rightTime), as a
    *                    literal comparable to the time difference (an
    *                    INTERVAL for timestamps, a number for numerics);
    *                    staler matches null out
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "r_",
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val unioned = taggedUnion(left, right, keys, leftTime, rightTime, rightValues, rightPrefix)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(sideOrder(strict).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rvf", last(col("__rv"), ignoreNulls = true).over(w))
    finish(filled, rightValues, rightPrefix, tolerance)
  }

  /** Skew-safe as-of join: same semantics as [[asofJoin]], with the
    * ordered forward fill routed through
    * [[graft.operators.GroupByScan.scanChunked]]'s Blelloch chunk-carry
    * topology. [[asofJoin]] shuffles each whole key to one task — a
    * pathological key (one user with 10^10 events) serializes on it; here
    * `chunk(timeCol)` (NON-DECREASING in time, e.g.
    * `t => date_trunc("day", t)`) splits the fill into parallel per-chunk
    * scans plus a tiny per-key carry pass. Bitwise-identical results
    * (pinned by AsOfJoinSpec). */
  def asofJoinChunked(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      chunk: Column => Column,
      rightPrefix: String = "r_",
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val unioned = taggedUnion(left, right, keys, leftTime, rightTime, rightValues, rightPrefix)
    val filled = GroupByScan.scanChunked(unioned, "__rv", keys, "ffill",
      sideOrder(strict), chunk(col("__t")), "__rvf")
    finish(filled, rightValues, rightPrefix, tolerance)
  }

  /** Forward as-of join (pandas `merge_asof(direction="forward")`): match
    * each left row with the EARLIEST right row at-or-after (`strict=false`)
    * or strictly after (`strict=true`) its time, per key. The exact mirror
    * of [[asofJoin]]: same tagged union, same single Exchange, with the
    * ordered fill running backward (`first` over the current-to-following
    * frame instead of `last` over the preceding one). `tolerance` bounds
    * (rightTime - leftTime) instead.
    *
    * Ties on (key, rightTime) resolve toward the EARLIER union order;
    * require unique (key, rightTime) on the right for determinism, as in
    * [[asofJoin]]. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "r_",
      strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val unioned = taggedUnion(left, right, keys, leftTime, rightTime, rightValues, rightPrefix)
    // mirror of sideOrder: inclusive -> left sorts before equal-time right
    // rows (so the forward frame sees them); strict -> right first (so the
    // current-row-anchored frame excludes them)
    val ord = Seq(col("__t"), if (strict) col("__isL") else lit(1) - col("__isL"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ord.map(_.asc): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned.withColumn("__rvf", first(col("__rv"), ignoreNulls = true).over(w))
    val matched = tolerance match {
      case None      => col("__rvf")
      case Some(tol) => when(col("__rvf").getField("__rt") - col("__t") <= tol, col("__rvf"))
    }
    attach(filled.withColumn("__rvf", matched), rightValues, rightPrefix)
  }

  /** Nearest as-of join (pandas `merge_asof(direction="nearest")`): match
    * each left row with whichever right row is closest in time, either
    * side, inclusive; EQUAL distances (including equal-time matches,
    * distance zero) resolve to the backward candidate. One tagged union,
    * one Exchange, ONE in-partition sort: both fills share the backward
    * side order (right before left at equal times), under which the
    * forward frame cannot see equal-time right rows — harmless, because an
    * equal-time match has distance zero and the backward side already owns
    * it by the tie rule. `tolerance` bounds the absolute distance on both
    * sides independently (a side beyond tolerance drops out; the other may
    * still match). */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String = "r_",
      tolerance: Option[Column] = None): DataFrame = {
    val unioned = taggedUnion(left, right, keys, leftTime, rightTime, rightValues, rightPrefix)
    val ord = sideOrder(strict = false).map(_.asc)
    val base = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("__rvb", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__rvn", first(col("__rv"), ignoreNulls = true).over(wf))
    val db = col("__t") - col("__rvb").getField("__rt")
    val df_ = col("__rvn").getField("__rt") - col("__t")
    val bOk = tolerance.fold(col("__rvb").isNotNull)(t => col("__rvb").isNotNull && db <= t)
    val fOk = tolerance.fold(col("__rvn").isNotNull)(t => col("__rvn").isNotNull && df_ <= t)
    val chosen = when(bOk && fOk, when(db <= df_, col("__rvb")).otherwise(col("__rvn")))
      .when(bOk, col("__rvb"))
      .when(fOk, col("__rvn"))
    attach(filled.withColumn("__rvf", chosen).drop("__rvb", "__rvn"),
      rightValues, rightPrefix)
  }

  /** Union the two inputs tagged by side, with the right payload packed
    * into one atomic struct. Ordering by [[sideOrder]] then puts right
    * rows before (<=) or after (<) left rows at equal times, so the
    * running fill sees exactly the legal matches. */
  private def taggedUnion(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      rightValues: Seq[String],
      rightPrefix: String): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(rightValues.nonEmpty, "need at least one right payload column")
    // The plan uses internal working columns and attaches outputs as
    // rightPrefix+col; a left input already carrying one of those names
    // would be silently overwritten — corrupt results, not an error. Fail
    // fast instead. (__chunk/__carry/__prev belong to scanChunked, which
    // the chunked variant delegates to — reserved here for both variants
    // so the contract doesn't depend on which fill topology runs.)
    val reserved = Seq("__t", "__isL", "__rv", "__rvf", "__rvb", "__rvn",
      "__chunk", "__carry", "__prev", "__jk")
    val outputs  = rightValues.map(rightPrefix + _)
    val clashes  = left.columns.toSeq.intersect(reserved ++ outputs) ++
      right.columns.toSeq.intersect(reserved)
    require(clashes.isEmpty,
      s"asofJoin reserved/output column name collision: ${clashes.mkString(", ")} " +
        s"(rename the input columns or pick a different rightPrefix)")

    val payload = struct(col(rightTime).as("__rt") +: rightValues.map(col): _*)
    val r = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__isL") :+ payload.as("__rv"): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isL", lit(1))
    l.unionByName(r, allowMissingColumns = true)
  }

  /** Ordering expressions (all plain ascending columns, so they can live
    * inside an ordering struct as well as a window ORDER BY): time, then
    * the side — right-before-left for <= matches, left-before-right for
    * strict < matches. */
  private def sideOrder(strict: Boolean): Seq[Column] =
    Seq(col("__t"), if (strict) lit(1) - col("__isL") else col("__isL"))

  /** Tolerance aging + payload attachment from the filled struct. */
  private def finish(
      filled: DataFrame,
      rightValues: Seq[String],
      rightPrefix: String,
      tolerance: Option[Column]): DataFrame = {
    val matched = tolerance match {
      case None      => col("__rvf")
      case Some(tol) => when(col("__t") - col("__rvf").getField("__rt") <= tol, col("__rvf"))
    }
    attach(filled.withColumn("__rvf", matched), rightValues, rightPrefix)
  }

  /** Keep left rows, unpack the chosen `__rvf` payload struct into
    * prefixed output columns, drop the working columns. */
  private def attach(
      filled: DataFrame,
      rightValues: Seq[String],
      rightPrefix: String): DataFrame = {
    val out = filled.where(col("__isL") === 1)
    val attached = rightValues.foldLeft(out)(
      (d, c) => d.withColumn(rightPrefix + c, col("__rvf").getField(c)))
    attached.drop("__t", "__isL", "__rv", "__rvf")
  }
}
