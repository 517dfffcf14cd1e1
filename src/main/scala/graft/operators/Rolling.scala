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

  /** Rolling covariance / correlation / OLS slope between two columns
    * over the same trailing TIME frame as [[rollingTime]] — the pandas
    * `rolling().cov(other)/corr(other)` pair plus the rolling-trend
    * slope (regress x on y; pass y = epoch seconds for "how fast is x
    * moving per second over the last hour", the windowed twin of
    * [[FeatureScaling]]'s grouped OLS).
    *
    * Pairwise-complete semantics (the pandas convention): only rows
    * where BOTH values are valid (non-NULL, non-NaN) contribute; a row
    * with one side missing still RECEIVES a result from its frame's
    * complete pairs. cov uses `ddof` (sample, default 1; NULL when the
    * frame has <= ddof complete pairs); corr is ddof-invariant and NULL
    * when either marginal variance is 0 (constant frame); slope = cov /
    * var(y), NULL when var(y) = 0.
    *
    * Numeric contract mirrors [[rollingTime]]'s var: per-column exact
    * decimal frame sums (scaleX/scaleY; products stay exact decimals —
    * (18,sx)×(18,sy) → (37,sx+sy) summed at (38,sx+sy)), cast to double
    * once, then ONE fixed IEEE finalize an oracle replays term for term.
    * None = raw double sums (faster, order-sensitive). Both columns are
    * CENTERED at their per-group (pair-masked) minimum before the sums —
    * cov/corr/slope are shift-invariant, and without centering an
    * epoch-seconds y column loses ~8 significant digits to cancellation
    * (syy ~ 1e20 vs frame variance ~ 1e6: the sums agree to the ulp but
    * the subtraction keeps only noise). The centering min is one extra
    * unbounded frame in the SAME WindowExec (no extra shuffle or sort)
    * and is replayed by the oracle, so parity is still bit-exact.
    * Decimal overflow contract: |shifted x·y| · frame-rows must fit
    * 38-(sx+sy) integer digits — a group spanning ~11 days of
    * epoch-seconds at scale 6 against 2-decimal values leaves 10^22
    * headroom, comfortable at any frame size. */
  def covCorrTime(
      df: DataFrame,
      by: Seq[String],
      tsCol: String,
      window: String,
      xCol: String,
      yCol: String,
      asCov: String = "rolling_cov",
      asCorr: String = "rolling_corr",
      asSlope: Option[String] = None,
      scaleX: Option[Int] = Some(2),
      scaleY: Option[Int] = Some(2),
      ddof: Int = 1): DataFrame = {
    require(ddof >= 0, s"ddof must be >= 0 (got $ddof)")
    require(!df.columns.contains("__rts"),
      "covCorrTime reserves column name __rts; rename it in the input")
    val micros = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(window))
    require(micros.months == 0, s"window '$window' has months — no fixed micros length")
    val span = micros.days * 86400000000L + micros.microseconds
    require(span > 0, s"window '$window' must be positive")
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__rts"))
      .rangeBetween(-span, 0)
    val wg = Window.partitionBy(by.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("__rts", unix_micros(col(tsCol)))
      .transform(applyCovCorr(_, xCol, yCol, asCov, asCorr, asSlope,
        scaleX, scaleY, w, wg, ddof))
      .drop("__rts")
  }

  /** [[covCorrTime]] over a ROWS frame (self + `window - 1` preceding
    * under the caller's total order) — the [[rollingRows]] twin. */
  def covCorrRows(
      df: DataFrame,
      by: Seq[String],
      order: Seq[Column],
      window: Int,
      xCol: String,
      yCol: String,
      asCov: String = "rolling_cov",
      asCorr: String = "rolling_corr",
      asSlope: Option[String] = None,
      scaleX: Option[Int] = Some(2),
      scaleY: Option[Int] = Some(2),
      ddof: Int = 1): DataFrame = {
    require(window >= 1, s"window must be >= 1 rows (got $window)")
    require(order.nonEmpty, "covCorrRows needs an explicit total order")
    require(ddof >= 0, s"ddof must be >= 0 (got $ddof)")
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(window - 1).toLong, 0)
    val wg = Window.partitionBy(by.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    applyCovCorr(df, xCol, yCol, asCov, asCorr, asSlope, scaleX, scaleY, w, wg, ddof)
  }

  /** RUNNING (expanding-frame) approximate quantile — the unbounded-frame
    * complement of the exact `"median"`/`"quantile:<q>"` rolling funcs,
    * whose O(frame) per-row buffer is documented for bounded frames only.
    * Spark's own GK sketch (`percentile_approx`, a mergeable
    * TypedImperativeAggregate) runs as a window aggregate over `ROWS
    * UNBOUNDED PRECEDING`: the expanding frame never removes rows, so
    * WindowExec feeds each row to the sketch exactly once — O(rows)
    * updates with O(accuracy) state per group, any group size.
    *
    * Contract: the returned value is an actual element of the frame whose
    * RANK is within `n / accuracy` of the target rank (the GK guarantee;
    * accuracy = 1/epsilon). NaN/NULL values are skipped (nan* semantics);
    * all-invalid frames yield NULL. Needs a caller-supplied total order
    * (ROWS frame — same determinism contract as [[rollingRows]]); the
    * sketch's internal structure is insertion-order-sensitive but the
    * rank guarantee holds under any order, so only the guarantee (not the
    * exact returned element) is stable across repartitioning — pin
    * downstream logic to the epsilon band, not the value. */
  def runningQuantileApprox(
      df: DataFrame,
      by: Seq[String],
      order: Seq[Column],
      valueCol: String,
      q: Double,
      accuracy: Int = 10000,
      as: String = "running_quantile"): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"quantile q must be in [0, 1] (got $q)")
    require(accuracy >= 1, s"accuracy must be >= 1 (got $accuracy)")
    require(order.nonEmpty, "runningQuantileApprox needs an explicit total order")
    require(!df.columns.contains(as),
      s"output column $as collides with input; rename one")
    val w = Window.partitionBy(by.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), df.schema(valueCol).dataType)
    df.withColumn(as, percentile_approx(vn, lit(q), lit(accuracy)).over(w))
  }

  private def applyCovCorr(
      df: DataFrame,
      xCol: String,
      yCol: String,
      asCov: String,
      asCorr: String,
      asSlope: Option[String],
      scaleX: Option[Int],
      scaleY: Option[Int],
      w: org.apache.spark.sql.expressions.WindowSpec,
      wGroup: org.apache.spark.sql.expressions.WindowSpec,
      ddof: Int): DataFrame = {
    val outNames = Seq(asCov, asCorr) ++ asSlope
    val clashes = outNames.intersect(df.columns.toSeq)
    require(clashes.isEmpty,
      s"cov/corr output columns collide with input: ${clashes.mkString(", ")}")
    require(outNames.distinct.size == outNames.size,
      s"duplicate cov/corr output names: ${outNames.mkString(", ")}")
    val work = Seq("__cc_x", "__cc_y")
    require(work.forall(!df.columns.contains(_)),
      s"cov/corr reserves working columns ${work.mkString(", ")}; rename them in the input")
    val vx0 = graft.functions.NanOps.nanToNull(col(xCol), df.schema(xCol).dataType)
    val vy0 = graft.functions.NanOps.nanToNull(col(yCol), df.schema(yCol).dataType)
    // pairwise-complete mask: a pair contributes only when both sides valid
    val xm = when(vx0.isNotNull && vy0.isNotNull, vx0)
    val ym = when(vx0.isNotNull && vy0.isNotNull, vy0)
    def dec(c: Column, s: Option[Int]): Column =
      s.map(sc => c.cast(DecimalType(18, sc))).getOrElse(c.cast(DoubleType))
    def recenter(c: Column, s: Option[Int]): Column = {
      // shift-invariant centering at the per-group masked min (scaladoc);
      // the (18,s)-(18,s) difference widens to (19,s) — cast back down,
      // exact because the shifted span is group-sized
      val d = c - min(c).over(wGroup)
      s.map(sc => d.cast(DecimalType(18, sc))).getOrElse(d)
    }
    // materialize the centered values once: the centering min is an
    // unbounded frame in the same WindowExec (same partitioning), and a
    // working column guarantees the five frame sums share it
    val centered = df
      .withColumn("__cc_x", recenter(dec(xm, scaleX), scaleX))
      .withColumn("__cc_y", recenter(dec(ym, scaleY), scaleY))
    val (dx, dy) = (col("__cc_x"), col("__cc_y"))
    def fsum(c: Column): Column = sum(c).over(w).cast(DoubleType)
    val n   = count(dx).over(w).cast(DoubleType)
    val sx  = fsum(dx);      val sy  = fsum(dy)
    val sxx = fsum(dx * dx); val syy = fsum(dy * dy)
    val sxy = fsum(dx * dy)
    // one IEEE finalize over the frame sums (cov can be legitimately
    // negative — no clamp; the corr/slope variance terms clamp at 0 via
    // the > 0 guards)
    val cxy = sxy - sx * sy / n
    val m2x = sxx - sx * sx / n
    val m2y = syy - sy * sy / n
    val out = centered
      .withColumn(asCov, when(n > ddof, cxy / (n - lit(ddof.toDouble))))
      .withColumn(asCorr, when(n > 1 && m2x > 0 && m2y > 0, cxy / sqrt(m2x * m2y)))
    asSlope.fold(out)(s => out.withColumn(s, when(n > 1 && m2y > 0, cxy / m2y)))
      .drop(work: _*)
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
