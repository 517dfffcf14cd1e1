package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Time-range rolling aggregations: for every row, aggregate the rows of
  * the same group whose timestamp falls in `[t - window, t]` (inclusive
  * both ends — the trailing-window convention SQL RANGE framing uses).
  * The pandas/xarray `rolling("1h")` analog, and the batch twin of the
  * streaming windowed aggregations in [[graft.streaming.StreamingOps]].
  *
  * Plan shape: one shuffle by group + one spilling external sort per
  * partition (WindowExec with a RANGE frame) — the same scan-shaped
  * topology as [[GroupByScan]]; rows stream through the frame with an
  * O(window-rows) sliding buffer. Ordering is by the timestamp alone
  * (RANGE frames require a single ordering expression); rows with EQUAL
  * timestamps are frame *peers* — every aggregate sees all of them
  * together, so results are deterministic even when the sort is not
  * unique. Sums ride the exact decimal engine by default so results are
  * order-independent (the [[Agg.exactScale]] rationale).
  */
object Rolling {

  /** Supported rolling funcs: frame-capable builtins. (Positional and
    * sketch funcs from the full registry don't support RANGE frames.)
    * var/std use the same 3-term power-sum decomposition as the grouped
    * [[Agg]] variance — two frame sums + a count, finalized in one IEEE
    * expression — with `ddof` from the rolling call (pandas
    * `rolling().var(ddof=)`, default 1); frames with <= ddof valid values
    * yield NULL. skew/kurt extend the decomposition one order higher:
    * population (biased, scipy g1/g2 Fisher) skewness / excess kurtosis
    * from raw double frame power sums — the SAME convention as the
    * grouped registry's skew/kurt (NOT pandas' bias-adjusted
    * `rolling().skew()`; multiply by the n-dependent adjustment factor
    * downstream for that). Constant frames (m2 == 0) yield NULL, like
    * the grouped form; the double-sum numeric contract is the grouped
    * momentStat one (exact for low-scale values with |x|^4 * n < 2^53). */
  val funcs: Set[String] = Set("count", "sum", "mean", "min", "max", "var", "std",
    "skew", "kurt", "median")

  /** "median" and "quantile:<q>" (e.g. "quantile:0.9") buffer the frame's
    * valid values per row (`collect_list` + `sort_array` inside the same
    * WindowExec — no extra shuffle) and interpolate exactly like the
    * grouped quantile registry: h = (n-1)q, lower + (h - floor h) * (upper
    * - lower) — DuckDB/numpy `quantile_cont` semantics, NULL on empty
    * frames. Unlike the O(1)-state power-sum funcs this materializes
    * O(frame) doubles per output row, so it is for BOUNDED frames (an hour
    * of events per user, a 100-row window); for group-wide quantiles use
    * [[Quantiles]], whose chunked/selection forms never build a per-group
    * array. */
  private val QuantilePat = """^quantile:(\d*\.?\d+)$""".r

  private def quantileQ(f: String): Option[Double] = f match {
    case "median"        => Some(0.5)
    case QuantilePat(qs) =>
      val q = qs.toDouble
      require(q >= 0.0 && q <= 1.0, s"rolling quantile q must be in [0, 1] (got $q)")
      Some(q)
    case _ => None
  }

  private def supported(f: String): Boolean = funcs(f) || quantileQ(f).isDefined

  /** Appends one rolling-aggregate column per (func, as) pair.
    *
    * @param tsCol    TimestampType column; the frame is micros-exact
    * @param window   trailing window length, e.g. "1 hour" (any Spark
    *                 CalendarInterval string without months — months have
    *                 no fixed micros length)
    * @param valueCol aggregated column; NaN/NULL values are skipped
    *                 (nan* semantics), like the scan funcs
    * @param exactScale decimal scale for sum/mean exactness (None = raw
    *                 double speed)
    */
  def rollingTime(
      df: DataFrame,
      by: Seq[String],
      tsCol: String,
      window: String,
      valueCol: String,
      aggs: Seq[(String, String)],
      exactScale: Option[Int] = Some(2),
      ddof: Int = 1): DataFrame = {
    require(aggs.nonEmpty, "need at least one rolling aggregation")
    require(ddof >= 0, s"ddof must be >= 0 (got $ddof)")
    val bad = aggs.map(_._1).filterNot(supported)
    require(bad.isEmpty,
      s"unsupported rolling funcs: ${bad.mkString(", ")} (supported: ${funcs.mkString(", ")}, quantile:<q>)")
    require(!df.columns.contains("__rts"),
      "rollingTime reserves column name __rts; rename it in the input")

    val micros = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(window))
    require(micros.months == 0, s"window '$window' has months — no fixed micros length")
    val span = micros.days * 86400000000L + micros.microseconds
    require(span > 0, s"window '$window' must be positive")

    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__rts"))
      .rangeBetween(-span, 0)
    val withTs = df.withColumn("__rts", unix_micros(col(tsCol)))
    applyAggs(withTs, valueCol, aggs, exactScale, w, ddof).drop("__rts")
  }

  /** Row-count rolling window: each row aggregates itself and the
    * `window - 1` preceding rows under the caller-supplied total order
    * (pandas `rolling(n)`). Unlike [[rollingTime]]'s RANGE frame, a ROWS
    * frame is only deterministic when `order` is a total order per group —
    * same contract as the positional reductions (SURVEY §7.4). */
  def rollingRows(
      df: DataFrame,
      by: Seq[String],
      order: Seq[Column],
      window: Int,
      valueCol: String,
      aggs: Seq[(String, String)],
      exactScale: Option[Int] = Some(2),
      ddof: Int = 1): DataFrame = {
    require(window >= 1, s"window must be >= 1 rows (got $window)")
    require(order.nonEmpty, "rollingRows needs an explicit total order")
    require(aggs.nonEmpty, "need at least one rolling aggregation")
    require(ddof >= 0, s"ddof must be >= 0 (got $ddof)")
    val bad = aggs.map(_._1).filterNot(supported)
    require(bad.isEmpty,
      s"unsupported rolling funcs: ${bad.mkString(", ")} (supported: ${funcs.mkString(", ")}, quantile:<q>)")
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(window - 1).toLong, 0)
    applyAggs(df, valueCol, aggs, exactScale, w, ddof)
  }

  private def applyAggs(
      df: DataFrame,
      valueCol: String,
      aggs: Seq[(String, String)],
      exactScale: Option[Int],
      w: org.apache.spark.sql.expressions.WindowSpec,
      ddof: Int = 1): DataFrame = {
    // an output name that replaces an input column (or repeats) would
    // silently corrupt later aggregates re-resolving against it
    val outNames = aggs.map(_._2)
    val clashes = outNames.intersect(df.columns.toSeq)
    require(clashes.isEmpty,
      s"rolling output columns collide with input: ${clashes.mkString(", ")}")
    require(outNames.distinct.size == outNames.size,
      s"duplicate rolling output names: ${outNames.diff(outNames.distinct).mkString(", ")}")
    val dt = df.schema(valueCol).dataType
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), dt)
    def sumE: Column = exactScale match {
      case Some(s) => sum(vn.cast(DecimalType(18, s))).over(w).cast(DoubleType)
      case None    => sum(vn).over(w)
    }
    // exact decimal sum of squares: the (18,s) x (18,s) product is decimal
    // (37,2s) and its frame sum decimal(38,2s) — still exact for 2-decimal
    // data; cast to double once, in the finalize
    def sumSqE: Column = exactScale match {
      case Some(s) =>
        val dv = vn.cast(DecimalType(18, s))
        sum(dv * dv).over(w).cast(DoubleType)
      case None => sum(vn * vn).over(w)
    }
    def varE: Column = {
      val n = count(vn).over(w).cast(DoubleType)
      // clamp: the IEEE finalize can round to a tiny negative for
      // (near-)constant frames; pandas rolling().std() returns 0.0 there,
      // and DuckDB's sqrt() ERRORS on negatives — clamp on both sides
      // (oracle replays greatest(..., 0.0) under the same count guard)
      when(n > ddof,
        greatest((sumSqE - sumE * sumE / n) / (n - lit(ddof.toDouble)), lit(0.0)))
    }
    // one fixed IEEE finalize over raw double frame power sums, mirroring
    // the grouped Aggregations.momentStat expression term for term so an
    // oracle replays it byte-identically
    def momentE(kurt: Boolean): Column = {
      val c  = vn.cast(DoubleType)
      val n  = count(c).over(w).cast(DoubleType)
      val s1 = sum(c).over(w); val s2 = sum(c * c).over(w)
      val s3 = sum(c * c * c).over(w)
      val m  = s1 / n
      val m2 = s2 / n - m * m
      val stat =
        if (!kurt) {
          val m3 = s3 / n - lit(3) * m * (s2 / n) + lit(2) * m * m * m
          m3 / sqrt(m2 * m2 * m2)
        } else {
          val s4 = sum(c * c * c * c).over(w)
          val m4 = s4 / n - lit(4) * m * (s3 / n) + lit(6) * m * m * (s2 / n) -
            lit(3) * m * m * m * m
          m4 / (m2 * m2) - lit(3)
        }
      when(m2 > 0, stat)
    }
    aggs.foldLeft(df) { case (d, (f, as)) =>
      quantileQ(f) match {
        case Some(q) =>
          // materialize the sorted frame array ONCE in a working column so
          // the four interpolation references share one collect_list (a
          // single shared expression is not guaranteed to dedupe across
          // window-expression extraction)
          val tmp = s"__wq_$as"
          require(!d.columns.contains(tmp),
            s"rolling quantile reserves working column $tmp; rename it in the input")
          val n  = size(col(tmp))
          val h  = (n.cast(DoubleType) - lit(1.0)) * lit(q)
          val lo = floor(h)
          val vlo = element_at(col(tmp), lo.cast("int") + 1)
          val vhi = element_at(col(tmp), ceil(h).cast("int") + 1)
          d.withColumn(tmp, sort_array(collect_list(vn.cast(DoubleType)).over(w)))
            .withColumn(as, when(n > 0, vlo + (h - lo) * (vhi - vlo)))
            .drop(tmp)
        case None => d.withColumn(as, f match {
          case "count" => count(vn).over(w)
          case "sum"   => sumE
          case "mean"  => sumE.cast(DoubleType) / count(vn).over(w)
          case "min"   => min(vn).over(w)
          case "max"   => max(vn).over(w)
          case "var"   => varE
          case "std"   => sqrt(varE)
          case "skew"  => momentE(kurt = false)
          case "kurt"  => momentE(kurt = true)
        })
      }
    }
  }
}
