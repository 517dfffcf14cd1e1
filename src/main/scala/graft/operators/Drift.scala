package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift and calibration MONITORING — the gates a
  * production corpus pipeline runs day-over-day (is today's crawl
  * distributed like yesterday's? is the quality classifier still
  * calibrated?) before any downstream decision acts on the batch.
  * Everything here follows the exact-decimal evaluation conventions of
  * [[FeatureScaling.aucScore]]: integer counts, round(x, 12) /
  * quantized-ln(6dp) term grids, exact decimal sums — so two engines
  * agree bit for bit and a drift alert can never be FP noise.
  *
  * All three statistics are ONE or two hash aggregations over bins /
  * distinct values — nothing document-sized moves, and nothing here
  * needs the corpus sorted. */
object Drift {

  /** Quantized natural log: round(ln x, 6) as decimal(12,6) — the
    * [[TextAnalysis]] idf convention (documented accepted risk: a raw
    * ln within an ulp of a rounding boundary). */
  private def lnQ(x: Column): Column =
    round(log(x), 6).cast(DecimalType(12, 6))

  /** Population Stability Index between a BASE and a CURRENT slice
    * over a caller-provided integer bin expression (a uniform-width
    * bucket, a [[Binning]] label...): per-bin rows (bin, n_base,
    * n_cur, psi_term) with PSI = sum(psi_term). Laplace(+1) smoothing
    * keeps every term defined on bins one side never hit — the
    * standard scorecard-monitoring recipe (PSI < 0.1 stable, > 0.25
    * action); the smoothed probabilities use the bin count of the
    * UNION so both sides share one denominator shift.
    *
    * Exactness: p = round(c'/t', 12) on the decimal grid, the log
    * ratio is a difference of quantized integer lns, and the product
    * rounds once more to the 12dp grid — every step either exact
    * decimal arithmetic or a fixed-IEEE-shape round, so the oracle
    * replays it bit for bit. Plan: two count aggregations + one
    * full-outer bin join + one one-row totals broadcast. */
  def psi(
      base: DataFrame,
      current: DataFrame,
      binCol: Column): DataFrame =
    psiFromCounts(binCounts(base, binCol), binCounts(current, binCol))

  /** The (bin, n) histogram [[psi]]/[[jsd]] compare — exposed because
    * the histogram IS the mergeable monitoring state: integer counts
    * sum associatively, so a streaming monitor rolls batches into one
    * histogram and compares against a FROZEN base without ever
    * rescanning rows ([[graft.streaming.StreamingOps.driftIngest]]). */
  def binCounts(df: DataFrame, binCol: Column): DataFrame =
    df.select(binCol.as("bin")).groupBy("bin")
      .agg(count(lit(1)).as("n"))

  /** [[psi]] over precomputed (bin, n) count tables. */
  def psiFromCounts(baseCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val ca = baseCounts.select(col("bin"), col("n").as("__na"))
    val cb = curCounts.select(col("bin"), col("n").as("__nb"))
    val joined = ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("__na"), lit(0L)).as("n_base"),
        coalesce(col("__nb"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__ta"),
      sum(col("n_cur")).as("__tb"), count(lit(1)).as("__k"))
    val pA = round((col("n_base") + 1).cast("double") /
      (col("__ta") + col("__k")), 12).cast(DecimalType(14, 12))
    val pB = round((col("n_cur") + 1).cast("double") /
      (col("__tb") + col("__k")), 12).cast(DecimalType(14, 12))
    val lnA = lnQ(col("n_base") + 1) - lnQ(col("__ta") + col("__k"))
    val lnB = lnQ(col("n_cur") + 1) - lnQ(col("__tb") + col("__k"))
    joined.crossJoin(broadcast(totals)) // one-row totals
      // fixed IEEE shape: both factors are exact decimal grid points,
      // cast to double (correctly rounded, engine-independent),
      // multiplied once, rounded once — the apScore term convention
      .withColumn("psi_term",
        round((pA - pB).cast("double") * (lnA - lnB).cast("double"), 12))
      .select(col("bin"), col("n_base"), col("n_cur"), col("psi_term"))
  }

  /** Grouped PSI — [[psi]] per key (per-language / per-source drift,
    * the [[FeatureScaling.aucScoreBy]] twin): drift usually hits ONE
    * domain first, and a corpus-wide PSI dilutes it k ways. Same
    * smoothing and term grids, with the totals (and the bin-count
    * shift) computed PER GROUP through one aggregation + one group
    * join instead of the one-row broadcast. Groups present in only one
    * slice still emit rows (full-outer on the group+bin key; their
    * other side smooths from zero). */
  def psiBy(
      base: DataFrame,
      current: DataFrame,
      binCol: Column,
      by: Seq[String]): DataFrame = {
    require(by.nonEmpty, "psiBy needs >= 1 group column (use psi)")
    val keys = by.map(col)
    val ca = base.select(keys :+ binCol.as("bin"): _*)
      .groupBy(keys :+ col("bin"): _*).agg(count(lit(1)).as("__na"))
    val cb = current.select(keys :+ binCol.as("bin"): _*)
      .groupBy(keys :+ col("bin"): _*).agg(count(lit(1)).as("__nb"))
    val joined = ca.join(cb, by :+ "bin", "full_outer")
      .select(keys :+ col("bin") :+
        coalesce(col("__na"), lit(0L)).as("n_base") :+
        coalesce(col("__nb"), lit(0L)).as("n_cur"): _*)
    val totals = joined.groupBy(keys: _*)
      .agg(sum(col("n_base")).as("__ta"), sum(col("n_cur")).as("__tb"),
        count(lit(1)).as("__k"))
    val pA = round((col("n_base") + 1).cast("double") /
      (col("__ta") + col("__k")), 12).cast(DecimalType(14, 12))
    val pB = round((col("n_cur") + 1).cast("double") /
      (col("__tb") + col("__k")), 12).cast(DecimalType(14, 12))
    val lnA = lnQ(col("n_base") + 1) - lnQ(col("__ta") + col("__k"))
    val lnB = lnQ(col("n_cur") + 1) - lnQ(col("__tb") + col("__k"))
    joined.join(totals, by)
      .withColumn("psi_term",
        round((pA - pB).cast("double") * (lnA - lnB).cast("double"), 12))
      .select(keys :+ col("bin") :+ col("n_base") :+ col("n_cur") :+
        col("psi_term"): _*)
  }

  /** Grouped KS — [[ksDistance]] per key: the cumulative window
    * partitions by the group columns, so the distinct-value sort
    * parallelizes across groups and `maxDistinct` bounds the per-GROUP
    * cardinality (checked as the max over groups, the
    * [[FeatureScaling.aucScoreBy]] fail-fast). Output one row
    * (by..., n_a, n_b, ks) per group present in EITHER slice; a group
    * absent from one side has an empty CDF there, so ks = 1 whenever
    * the present side is non-empty. */
  def ksDistanceBy(
      a: DataFrame,
      b: DataFrame,
      valueCol: Column,
      by: Seq[String],
      maxDistinct: Long = 1L << 22): DataFrame = {
    require(by.nonEmpty, "ksDistanceBy needs >= 1 group column (use ksDistance)")
    val keys = by.map(col)
    val va = a.select(keys :+ valueCol.as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(keys :+ col("__v"): _*).agg(count(lit(1)).as("__ca"))
    val vb = b.select(keys :+ valueCol.as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(keys :+ col("__v"): _*).agg(count(lit(1)).as("__cb"))
    val joined = va.join(vb, by :+ "__v", "full_outer")
      .select(keys :+ col("__v") :+
        coalesce(col("__ca"), lit(0L)).as("__ca") :+
        coalesce(col("__cb"), lit(0L)).as("__cb"): _*)
    if (maxDistinct > 0) {
      val nd = joined.groupBy(keys: _*).agg(count(lit(1)).as("__nd"))
        .agg(max(col("__nd"))).head()
      val worst = if (nd.isNullAt(0)) 0L else nd.getLong(0)
      require(worst <= maxDistinct,
        s"ksDistanceBy's per-group window sorts per-group distinct values:" +
          s" worst group has $worst > maxDistinct=$maxDistinct — quantize" +
          " the value (round(v, 6)) or raise the bound deliberately")
    }
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = joined
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
    val totals = joined.groupBy(keys: _*)
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    cum.join(totals, by)
      .select(keys :+ col("__ta").as("n_a") :+ col("__tb").as("n_b") :+
        abs(when(col("__ta") > 0,
              round(col("__cuma").cast("double") / col("__ta"), 12))
              .otherwise(lit(0.0)).cast(DecimalType(14, 12))
          - when(col("__tb") > 0,
              round(col("__cumb").cast("double") / col("__tb"), 12))
              .otherwise(lit(0.0)).cast(DecimalType(14, 12))).as("__d"): _*)
      .groupBy(keys.map(k => k) :+ col("n_a") :+ col("n_b"): _*)
      .agg(max(col("__d")).cast("double").as("ks"))
  }

  /** Exact two-sample Kolmogorov-Smirnov distance between slice A and
    * slice B of `valueCol`: one row (n_a, n_b, ks) with
    * ks = max over distinct values of |cdfA − cdfB| on the round(,12)
    * grid. The cumulative window runs over DISTINCT values only, with
    * the [[FeatureScaling.aucScore]] fail-fast: a raw continuous
    * double would make it a single-task sort, so `maxDistinct` trips
    * unless the caller quantizes deliberately. */
  def ksDistance(
      a: DataFrame,
      b: DataFrame,
      valueCol: Column,
      maxDistinct: Long = 1L << 22): DataFrame = {
    val va = a.select(valueCol.as("__v")).where(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__ca"))
    val vb = b.select(valueCol.as("__v")).where(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__cb"))
    val joined = va.join(vb, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    if (maxDistinct > 0) {
      val nd = joined.count()
      require(nd <= maxDistinct,
        s"ksDistance's distinct-value window is global: $nd distinct" +
          s" values > maxDistinct=$maxDistinct — quantize the value" +
          " (round(v, 6)) or raise the bound deliberately")
    }
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = joined
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
    val totals = joined.agg(sum(col("__ca")).as("__ta"),
      sum(col("__cb")).as("__tb"))
    // the >0 guard of ksDistanceBy (ADVICE r9): an EMPTY side has cdf 0
    // everywhere, so ks = 1 against any non-empty side — without it the
    // division by 0 would bubble a NULL ks
    cum.crossJoin(broadcast(totals))
      .select(col("__ta").as("n_a"), col("__tb").as("n_b"),
        abs(when(col("__ta") > 0,
              round(col("__cuma").cast("double") / col("__ta"), 12))
              .otherwise(lit(0.0)).cast(DecimalType(14, 12))
          - when(col("__tb") > 0,
              round(col("__cumb").cast("double") / col("__tb"), 12))
              .otherwise(lit(0.0)).cast(DecimalType(14, 12))).as("__d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__d")).cast("double").as("ks"))
  }

  /** Exact 1-D Wasserstein-1 (earth-mover) distance between slice A
    * and slice B of `valueCol`: one row (n_a, n_b, w1) with
    * W1 = Σ_i |cdfA(v_i) − cdfB(v_i)| · (v_{i+1} − v_i) over sorted
    * distinct values — the integral the KS max ignores: a small shift
    * of a LOT of mass moves W1 but barely moves KS, and vice versa;
    * monitoring wants both. Same distinct-value machinery and
    * fail-fast as [[ksDistance]]; each term quantizes to the
    * round(,12) grid and the terms sum as exact decimals (the apScore
    * order-independence convention), so the statistic is engine-exact.
    * Unit: `valueCol`'s (W1 of distributions shifted by c is c —
    * pinned in DriftSpec). */
  def wasserstein1(
      a: DataFrame,
      b: DataFrame,
      valueCol: Column,
      maxDistinct: Long = 1L << 22): DataFrame = {
    val va = a.select(valueCol.as("__v")).where(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__ca"))
    val vb = b.select(valueCol.as("__v")).where(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__cb"))
    val joined = va.join(vb, Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // guard + totals in ONE pass (VERDICT r10 #8): the cardinality
    // fail-fast rides the totals aggregate as a count column and the
    // collected totals re-enter the plan as LITERALS — one driver
    // action fewer per monitoring tick, and the final plan loses the
    // totals subplan + its broadcast join entirely (DriftSpec pins
    // one-job construction and the join-free shape)
    val w = Window.orderBy(col("__v"))
    val cumW = w.rowsBetween(Window.unboundedPreceding, 0)
    val cum0 = joined
      .withColumn("__cuma", sum(col("__ca")).over(cumW))
      .withColumn("__cumb", sum(col("__cb")).over(cumW))
      .withColumn("__gap", lead(col("__v"), 1).over(w) - col("__v"))
    val cum =
      if (maxDistinct > 0) {
        val t = joined.agg(sum(col("__ca")).as("__ta"),
          sum(col("__cb")).as("__tb"), count(lit(1)).as("__nd")).head()
        require(t.getLong(2) <= maxDistinct,
          s"wasserstein1's distinct-value window is global: ${t.getLong(2)} distinct" +
            s" values > maxDistinct=$maxDistinct — quantize the value" +
            " (round(v, 6)) or raise the bound deliberately")
        cum0.withColumn("__ta",
            lit(if (t.isNullAt(0)) 0L else t.getLong(0)))
          .withColumn("__tb",
            lit(if (t.isNullAt(1)) 0L else t.getLong(1)))
      } else cum0.crossJoin(broadcast(
        joined.agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))))
    // empty-side guard (the ksDistance convention, ADVICE r9): an empty
    // side's cdf is 0 everywhere, so w1 degenerates to the present
    // side's mean-vs-min mass — never a NULL from a 0 divide
    val dcdf = abs(
      when(col("__ta") > 0,
          round(col("__cuma").cast("double") / col("__ta"), 12))
        .otherwise(lit(0.0)).cast(DecimalType(14, 12))
      - when(col("__tb") > 0,
          round(col("__cumb").cast("double") / col("__tb"), 12))
        .otherwise(lit(0.0)).cast(DecimalType(14, 12)))
    // the last value closes no interval: its term is 0 (NOT a dropped
    // row — a single-distinct-value union must still yield the
    // (n_a, n_b, 0.0) row, ADVICE r9)
    cum
      .select(col("__ta").as("n_a"), col("__tb").as("n_b"),
        when(col("__gap").isNotNull,
            round(dcdf.cast("double") * col("__gap").cast("double"), 12))
          .otherwise(lit(0)).cast(DecimalType(38, 12)).as("__t"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("__t")).cast("double").as("w1"))
  }

  /** Grouped W1 — [[wasserstein1]] per key (the [[ksDistanceBy]] twin):
    * per-source drift in the value's own units. The cumulative and
    * lead windows partition by the group columns, `maxDistinct` bounds
    * the per-GROUP distinct cardinality, and the empty-side /
    * single-value guards match the ungrouped form (a group absent from
    * one slice integrates the present side's cdf; a one-value group
    * emits (by..., n_a, n_b, 0.0)). */
  def wasserstein1By(
      a: DataFrame,
      b: DataFrame,
      valueCol: Column,
      by: Seq[String],
      maxDistinct: Long = 1L << 22): DataFrame = {
    require(by.nonEmpty, "wasserstein1By needs >= 1 group column (use wasserstein1)")
    val keys = by.map(col)
    val va = a.select(keys :+ valueCol.as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(keys :+ col("__v"): _*).agg(count(lit(1)).as("__ca"))
    val vb = b.select(keys :+ valueCol.as("__v"): _*)
      .where(col("__v").isNotNull)
      .groupBy(keys :+ col("__v"): _*).agg(count(lit(1)).as("__cb"))
    val joined = va.join(vb, by :+ "__v", "full_outer")
      .select(keys :+ col("__v") :+
        coalesce(col("__ca"), lit(0L)).as("__ca") :+
        coalesce(col("__cb"), lit(0L)).as("__cb"): _*)
    if (maxDistinct > 0) {
      val nd = joined.groupBy(keys: _*).agg(count(lit(1)).as("__nd"))
        .agg(max(col("__nd"))).head()
      val worst = if (nd.isNullAt(0)) 0L else nd.getLong(0)
      require(worst <= maxDistinct,
        s"wasserstein1By's per-group window sorts per-group distinct values:" +
          s" worst group has $worst > maxDistinct=$maxDistinct — quantize" +
          " the value (round(v, 6)) or raise the bound deliberately")
    }
    val w = Window.partitionBy(keys: _*).orderBy(col("__v"))
    val cumW = w.rowsBetween(Window.unboundedPreceding, 0)
    val cum = joined
      .withColumn("__cuma", sum(col("__ca")).over(cumW))
      .withColumn("__cumb", sum(col("__cb")).over(cumW))
      .withColumn("__gap", lead(col("__v"), 1).over(w) - col("__v"))
    val totals = joined.groupBy(keys: _*)
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    val dcdf = abs(
      when(col("__ta") > 0,
          round(col("__cuma").cast("double") / col("__ta"), 12))
        .otherwise(lit(0.0)).cast(DecimalType(14, 12))
      - when(col("__tb") > 0,
          round(col("__cumb").cast("double") / col("__tb"), 12))
        .otherwise(lit(0.0)).cast(DecimalType(14, 12)))
    cum.join(totals, by)
      .select(keys :+ col("__ta").as("n_a") :+ col("__tb").as("n_b") :+
        when(col("__gap").isNotNull,
            round(dcdf.cast("double") * col("__gap").cast("double"), 12))
          .otherwise(lit(0)).cast(DecimalType(38, 12)).as("__t"): _*)
      .groupBy(keys.map(k => k) :+ col("n_a") :+ col("n_b"): _*)
      .agg(sum(col("__t")).cast("double").as("w1"))
  }

  /** Jensen-Shannon divergence between a BASE and a CURRENT slice over
    * a caller-provided bin expression (tokens, buckets...): per-bin
    * rows (bin, n_base, n_cur, jsd_term) with JSD = sum(jsd_term) ∈
    * [0, ln 2] — the symmetric, always-finite drift statistic data
    * cards report where PSI's scorecard bands don't apply. Same
    * Laplace(+1) smoothing as [[psi]]. Exactness: with
    * pX = cX'/tX' and m = (pA+pB)/2, the log ratios reduce to integer
    * arguments — ln(pA/m) = ln(2·cA'·tB') − ln(cA'·tB' + cB'·tA') —
    * so both lns ride the quantized-integer grid and each term is one
    * fixed-IEEE product rounded to the 12dp grid. */
  def jsd(
      base: DataFrame,
      current: DataFrame,
      binCol: Column): DataFrame = {
    val ca = base.select(binCol.as("bin")).groupBy("bin")
      .agg(count(lit(1)).as("__na"))
    val cb = current.select(binCol.as("bin")).groupBy("bin")
      .agg(count(lit(1)).as("__nb"))
    val joined = ca.join(cb, Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("__na"), lit(0L)).as("n_base"),
        coalesce(col("__nb"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__ta"),
      sum(col("n_cur")).as("__tb"), count(lit(1)).as("__k"))
    val cA = col("n_base") + 1; val cB = col("n_cur") + 1
    val tA = col("__ta") + col("__k"); val tB = col("__tb") + col("__k")
    // products ride decimals: long counts at 10B-doc scale would push
    // cA·tB past 2^63 (silent wraparound — the r9 aucScore ADVICE class)
    def d(c: Column): Column = c.cast(DecimalType(19, 0))
    val mix = d(cA) * d(tB) + d(cB) * d(tA)
    val pA = round(cA.cast("double") / tA, 12).cast(DecimalType(14, 12))
    val pB = round(cB.cast("double") / tB, 12).cast(DecimalType(14, 12))
    val lnRA = lnQ(d(cA) * d(tB) * lit(2)) - lnQ(mix)
    val lnRB = lnQ(d(cB) * d(tA) * lit(2)) - lnQ(mix)
    joined.crossJoin(broadcast(totals))
      .withColumn("jsd_term",
        round(lit(0.5) * (pA.cast("double") * lnRA.cast("double")
          + pB.cast("double") * lnRB.cast("double")), 12))
      .select(col("bin"), col("n_base"), col("n_cur"), col("jsd_term"))
  }

  /** Grouped JSD — [[jsd]] per key (the [[psiBy]] twin): the data-card
    * drift statistic per source/language. Same smoothing and quantized
    * grids; per-group totals (and the bin-count shift) through one
    * aggregation + one group join. Output (by..., bin, n_base, n_cur,
    * jsd_term), JSD per group = sum(jsd_term) over its bins. */
  def jsdBy(
      base: DataFrame,
      current: DataFrame,
      binCol: Column,
      by: Seq[String]): DataFrame = {
    require(by.nonEmpty, "jsdBy needs >= 1 group column (use jsd)")
    val keys = by.map(col)
    val ca = base.select(keys :+ binCol.as("bin"): _*)
      .groupBy(keys :+ col("bin"): _*).agg(count(lit(1)).as("__na"))
    val cb = current.select(keys :+ binCol.as("bin"): _*)
      .groupBy(keys :+ col("bin"): _*).agg(count(lit(1)).as("__nb"))
    val joined = ca.join(cb, by :+ "bin", "full_outer")
      .select(keys :+ col("bin") :+
        coalesce(col("__na"), lit(0L)).as("n_base") :+
        coalesce(col("__nb"), lit(0L)).as("n_cur"): _*)
    val totals = joined.groupBy(keys: _*)
      .agg(sum(col("n_base")).as("__ta"), sum(col("n_cur")).as("__tb"),
        count(lit(1)).as("__k"))
    val cA = col("n_base") + 1; val cB = col("n_cur") + 1
    val tA = col("__ta") + col("__k"); val tB = col("__tb") + col("__k")
    def d(c: Column): Column = c.cast(DecimalType(19, 0))
    val mix = d(cA) * d(tB) + d(cB) * d(tA)
    val pA = round(cA.cast("double") / tA, 12).cast(DecimalType(14, 12))
    val pB = round(cB.cast("double") / tB, 12).cast(DecimalType(14, 12))
    val lnRA = lnQ(d(cA) * d(tB) * lit(2)) - lnQ(mix)
    val lnRB = lnQ(d(cB) * d(tA) * lit(2)) - lnQ(mix)
    joined.join(totals, by)
      .withColumn("jsd_term",
        round(lit(0.5) * (pA.cast("double") * lnRA.cast("double")
          + pB.cast("double") * lnRB.cast("double")), 12))
      .select(keys :+ col("bin") :+ col("n_base") :+ col("n_cur") :+
        col("jsd_term"): _*)
  }

  /** Reliability-diagram bins for a [0,1] prediction against a boolean
    * label: (bin, n, avg_pred, frac_pos) per occupied decile-style bin
    * (bin = floor(pred·nBins) clamped to nBins−1). A calibrated
    * classifier has avg_pred ≈ frac_pos per bin — the drift gate for a
    * quality model scoring today's crawl. ONE hash aggregation; preds
    * ride the 6dp decimal grid so the per-bin means are exact sums
    * with one final rounded division each. */
  def calibrationBins(
      df: DataFrame,
      pred: Column,
      label: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2 (got $nBins)")
    val p = round(pred, 6).cast(DecimalType(18, 6))
    val y = label.cast("boolean")
    df.where(pred.isNotNull && label.isNotNull)
      .select(least(floor(p * nBins).cast("long"), lit(nBins - 1L)).as("bin"),
        p.as("__p"), y.cast("long").as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(sum(col("__p")).cast("double") / count(lit(1)), 12).as("avg_pred"),
        round(sum(col("__y")).cast("double") / count(lit(1)), 12).as("frac_pos"))
  }

  /** Grouped reliability bins — [[calibrationBins]] per key: the
    * per-source calibration check (a classifier can be calibrated
    * corpus-wide while badly off on one domain). ONE hash aggregation
    * on (by..., bin). */
  def calibrationBinsBy(
      df: DataFrame,
      pred: Column,
      label: Column,
      by: Seq[String],
      nBins: Int = 10): DataFrame = {
    require(by.nonEmpty, "calibrationBinsBy needs >= 1 group column (use calibrationBins)")
    require(nBins >= 2, s"nBins must be >= 2 (got $nBins)")
    val keys = by.map(col)
    val p = round(pred, 6).cast(DecimalType(18, 6))
    val y = label.cast("boolean")
    df.where(pred.isNotNull && label.isNotNull)
      .select(keys :+
        least(floor(p * nBins).cast("long"), lit(nBins - 1L)).as("bin") :+
        p.as("__p") :+ y.cast("long").as("__y"): _*)
      .groupBy(keys :+ col("bin"): _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col("__p")).cast("double") / count(lit(1)), 12).as("avg_pred"),
        round(sum(col("__y")).cast("double") / count(lit(1)), 12).as("frac_pos"))
  }

  /** Brier score (mean squared error of a [0,1] prediction against the
    * boolean outcome): one row (n, brier). Terms square on the exact
    * decimal grid — (p − y) as decimal(12,6), squared to
    * decimal(25,12), summed exactly — with ONE final rounded division;
    * the composite calibration gate next to [[calibrationBins]]. */
  def brierScore(df: DataFrame, pred: Column, label: Column): DataFrame = {
    val p = round(pred, 6).cast(DecimalType(12, 6))
    val e = (p - label.cast("boolean").cast("int").cast(DecimalType(12, 6)))
      .cast(DecimalType(12, 6))
    df.where(pred.isNotNull && label.isNotNull)
      .select((e * e).cast(DecimalType(25, 12)).as("__sq"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__sq")).cast("double") / count(lit(1)), 12).as("brier"))
  }

  /** The MERGEABLE calibration state: per-bin (bin, n, sum_p, sum_y,
    * sum_sq) — integer counts and exact decimal sums, so states merge
    * associatively ([[mergeCalibrationStates]]) and batch boundaries
    * are invisible (the [[binCounts]] argument): both the reliability
    * bins ([[calibrationFromState]]) and the Brier score
    * ([[brierFromState]]) finalize from the SAME state, which is the
    * monitoring table a streaming ingest maintains
    * ([[graft.streaming.StreamingOps.calibIngest]]). Sum types are
    * pinned wide (38,6)/(38,12) so merged states keep one schema. */
  def calibrationState(
      df: DataFrame,
      pred: Column,
      label: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2 (got $nBins)")
    val p = round(pred, 6).cast(DecimalType(18, 6))
    val y = label.cast("boolean")
    val e = (round(pred, 6).cast(DecimalType(12, 6))
      - y.cast("int").cast(DecimalType(12, 6))).cast(DecimalType(12, 6))
    df.where(pred.isNotNull && label.isNotNull)
      .select(least(floor(p * nBins).cast("long"), lit(nBins - 1L)).as("bin"),
        p.as("__p"), y.cast("long").as("__y"),
        (e * e).cast(DecimalType(25, 12)).as("__sq"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("__p")).cast(DecimalType(38, 6)).as("sum_p"),
        sum(col("__y")).as("sum_y"),
        sum(col("__sq")).cast(DecimalType(38, 12)).as("sum_sq"))
  }

  /** Merge two calibration states — exact integer/decimal sums per bin,
    * order- and grouping-independent. */
  def mergeCalibrationStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bin")
      .agg(sum(col("n")).as("n"),
        sum(col("sum_p")).cast(DecimalType(38, 6)).as("sum_p"),
        sum(col("sum_y")).as("sum_y"),
        sum(col("sum_sq")).cast(DecimalType(38, 12)).as("sum_sq"))

  /** [[calibrationBins]]' rows from a [[calibrationState]] — identical
    * finalize arithmetic (exact decimal totals, ONE rounded division
    * each), so state-then-finalize ≡ the one-shot form (DriftSpec). */
  def calibrationFromState(state: DataFrame): DataFrame =
    state.select(col("bin"), col("n"),
      round(col("sum_p").cast("double") / col("n"), 12).as("avg_pred"),
      round(col("sum_y").cast("double") / col("n"), 12).as("frac_pos"))

  /** [[brierScore]]'s row from a [[calibrationState]]: the per-bin
    * squared-error sums total exactly (decimal, order-independent). */
  def brierFromState(state: DataFrame): DataFrame =
    state.agg(sum(col("n")).as("n"),
      round(sum(col("sum_sq")).cast("double") /
        sum(col("n")), 12).as("brier"))

  /** Grouped Brier — [[brierScore]] per key: one row (by..., n, brier)
    * per group, same exact-decimal term grid, ONE hash aggregation. */
  def brierScoreBy(
      df: DataFrame,
      pred: Column,
      label: Column,
      by: Seq[String]): DataFrame = {
    require(by.nonEmpty, "brierScoreBy needs >= 1 group column (use brierScore)")
    val keys = by.map(col)
    val p = round(pred, 6).cast(DecimalType(12, 6))
    val e = (p - label.cast("boolean").cast("int").cast(DecimalType(12, 6)))
      .cast(DecimalType(12, 6))
    df.where(pred.isNotNull && label.isNotNull)
      .select(keys :+ (e * e).cast(DecimalType(25, 12)).as("__sq"): _*)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        round(sum(col("__sq")).cast("double") / count(lit(1)), 12).as("brier"))
  }
}
