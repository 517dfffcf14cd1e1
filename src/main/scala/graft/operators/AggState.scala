package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Mergeable aggregate STATE tables — incremental rollup maintenance,
  * the lambda/kappa-architecture pattern a 100 TB pipeline runs daily:
  * aggregate each new partition (day, hour, source shard) ONCE into a
  * compact state table, then answer corpus-wide queries by merging
  * states — never rescanning history. The reference's chunk/combine/
  * finalize decomposition (aggregations.py:337-368) IS this shape; here
  * the intermediate is reified as a first-class DataFrame the user can
  * persist, ship, and re-merge, instead of living only inside one
  * job's shuffle.
  *
  * State schema per group: `n_rows` (all rows), `n_valid` (non-NULL,
  * non-NaN), `s1`/`s2` (exact decimal power sums at the caller's
  * `scale` — fixed decimal(38,·) types so state -> merge -> merge
  * round-trips schema-stably), `mn`/`mx` doubles. Merging is sum/min/
  * max — associative, commutative, any grouping of partitions gives
  * bit-identical state because decimal sums are exact. [[finalize]]
  * then applies the SAME clamped IEEE finalize as the grouped registry
  * ([[Aggregations]] variance decomposition), so
  * finalize(merge(states)) == the direct reduction over the union,
  * bit for bit — the q_agg_state oracle and AggStateSpec pin exactly
  * that invariant.
  *
  * Numeric contract: values must fit decimal(18, scale) (the exact
  * engine's domain); NaN counts as missing (NULL semantics, the
  * [[graft.functions.NanOps]] layer). Empty-group states never arise
  * (hash aggregation emits only observed groups); a group whose rows
  * are all invalid carries n_valid = 0 and NULL sums/extrema, and
  * merges correctly (sum ignores NULL, min/max ignore NULL).
  */
object AggState {

  private val S1P = 38 // fixed precision so re-merged schemas are stable

  /** Build the per-group state table of `df` grouped by `keys` —
    * typically keys = the analysis dimensions PLUS the ingestion
    * partition (day, batch id), so states merge along the partition
    * axis later. One map-side-combined hash aggregation. */
  def state(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      scale: Int): DataFrame = {
    require(keys.nonEmpty, "aggState needs at least one grouping key")
    require(scale >= 0 && scale <= 9, s"scale must be in [0,9] (got $scale)")
    val dt = df.schema(valueCol).dataType
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), dt)
    val d  = vn.cast(DecimalType(18, scale))
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      count(vn).as("n_valid"),
      sum(d).cast(DecimalType(S1P, scale)).as("s1"),
      sum(d * d).cast(DecimalType(S1P, 2 * scale)).as("s2"),
      min(vn.cast(DoubleType)).as("mn"),
      max(vn.cast(DoubleType)).as("mx"))
  }

  /** Merge states down to `keys` (a subset of the state's grouping —
    * e.g. drop the day column to collapse the partition axis). Exact
    * and associative: merging day-states into month-states into a
    * total equals merging everything at once. */
  def merge(states: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeAggState needs at least one grouping key")
    val s1t = states.schema("s1").dataType
    val s2t = states.schema("s2").dataType
    states.groupBy(keys.map(col): _*).agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_valid")).as("n_valid"),
      sum(col("s1")).cast(s1t).as("s1"),
      sum(col("s2")).cast(s2t).as("s2"),
      min(col("mn")).as("mn"),
      max(col("mx")).as("mx"))
  }

  /** Distinct-count STATE: one DataSketches HLL sketch per group over
    * `valueCol` — the mergeable form of count-distinct, completing the
    * incremental-rollup story for the statistic that plain power sums
    * cannot carry (daily uniques -> monthly uniques without rescan).
    * `lgConfigK` sizes accuracy (~1.04/sqrt(2^lgK) relative error;
    * 12 ≈ 1.6%). */
  def stateDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lgConfigK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "stateDistinct needs at least one grouping key")
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("nd_sketch"))
  }

  /** Merge distinct-count states down to `keys` — register-wise max,
    * associative. Estimator caveat (DataSketches semantics): a MERGED
    * sketch reports the composite estimator while a sketch fed
    * directly reports the more accurate HIP estimator, so at HLL-mode
    * cardinalities the merged estimate differs from the direct one by
    * a fraction of the error bound (both stay inside it — pinned as
    * band booleans by q_distinct_state); below the sparse/set
    * threshold the representations coincide and the estimates are
    * identical (AggStateSpec pins that exactly). */
  def mergeDistinct(states: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "mergeDistinct needs at least one grouping key")
    states.groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("nd_sketch"), lit(true)).as("nd_sketch"))
  }

  /** Append the cardinality estimate of a distinct-count state. */
  def estimateDistinct(states: DataFrame, as: String = "nd_estimate"): DataFrame =
    states.withColumn(as, hll_sketch_estimate(col("nd_sketch")))

  /** EXACT-quantile STATE: the (keys, value, cnt) DISTINCT-VALUE
    * histogram of `valueCol` — the mergeable form of the memory-safe
    * exact quantile ([[Quantiles.exactQuantile]]), completing the
    * incremental-rollup family for order statistics, which power sums
    * cannot carry at all and sketches only approximate. NULL/NaN rows
    * drop (nanquantile semantics). State size is bounded by DISTINCT
    * values per group — the contract the exact-quantile engine already
    * rides (decimal/integer-grid columns stay bounded at 100 TB; a raw
    * continuous double is the wrong input for BOTH forms — quantize to
    * the decimal grid first, the qcut/tf-idf convention). */
  def stateQuantile(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "stateQuantile needs at least one grouping key")
    Quantiles.countsState(df, keys, valueCol)
  }

  /** Merge quantile states down to `keys` — ONE hash aggregation
    * re-summing counts per (keys, value). Exact, associative,
    * commutative (integer sums), so every merge tree yields the
    * identical histogram — unlike the HLL states there is no
    * band-associativity caveat here. */
  def mergeQuantile(states: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeQuantile needs at least one grouping key")
    states.groupBy(keys.map(col) :+ col(valueCol): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Finalize a quantile state into per-group quantiles —
    * [[Quantiles.exactQuantile]]'s ranking and Percentile-exact
    * interpolation over the histogram, so
    * finalizeQuantile(mergeQuantile(day states)) equals exactQuantile
    * over the raw union BIT FOR BIT (AggStateSpec and the
    * q_quantile_state oracle both pin it) — history never rescans. */
  def finalizeQuantile(states: DataFrame, keys: Seq[String], valueCol: String,
      qs: Seq[Double], as: String = "q"): DataFrame =
    Quantiles.quantileOfCounts(states, keys, valueCol, qs, as)

  /** WEIGHTED-quantile STATE — the importance-weighted twin of
    * [[stateQuantile]] ([[graft.operators.TextAnalysis]] DSIR weights,
    * mixture sampling rates, rolled daily): (keys, value, w) with w =
    * the exact decimal(18,6)-grid weight sum per distinct value.
    * Merge re-sums exactly (associative — every merge tree identical);
    * finalize runs [[Quantiles.weightedQuantile]]'s inverted-CDF
    * selection on the decimal grid over the histogram, equal to the
    * direct weighted quantile over the raw union bit for bit
    * (AggStateSpec + the q_weighted_quantile_state oracle pin it). */
  def stateQuantileWeighted(df: DataFrame, keys: Seq[String],
      valueCol: String, weightCol: String): DataFrame = {
    require(keys.nonEmpty, "stateQuantileWeighted needs at least one grouping key")
    Quantiles.weightedCountsState(df, keys, valueCol, weightCol)
  }

  /** Merge weighted-quantile states down to `keys` — one hash agg
    * re-summing the exact decimal weights per (keys, value). */
  def mergeQuantileWeighted(states: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    require(keys.nonEmpty, "mergeQuantileWeighted needs at least one grouping key")
    states.groupBy(keys.map(col) :+ col(valueCol): _*)
      .agg(sum(col("w")).cast(DecimalType(38, 6)).as("w"))
  }

  /** Finalize a weighted-quantile state — the exact-decimal
    * inverted-CDF selection per group; `qs` = (quantile on the 1e-6
    * grid, output column) pairs, the [[Quantiles.weightedQuantile]]
    * contract. */
  def finalizeQuantileWeighted(states: DataFrame, keys: Seq[String],
      valueCol: String, qs: Seq[(Double, String)]): DataFrame =
    Quantiles.weightedQuantileOfCounts(states, keys, valueCol, qs)

  /** Finalize a state table into the registry statistics: count, mean,
    * var, std (ddof-adjusted, clamped — the [[Aggregations]] variance
    * decomposition verbatim), min, max. A pure projection: states are
    * already one row per group. */
  def finalize(states: DataFrame, ddof: Int = 0): DataFrame = {
    require(ddof >= 0, s"ddof must be >= 0 (got $ddof)")
    val n = col("n_valid").cast(DoubleType)
    val s1 = col("s1").cast(DoubleType)
    val s2 = col("s2").cast(DoubleType)
    val variance = when(col("n_valid") > ddof,
      greatest((s2 - s1 * s1 / n) / (n - lit(ddof.toDouble)), lit(0.0)))
    states
      .withColumn("mean", when(col("n_valid") > 0, s1 / n))
      .withColumn("var", variance)
      .withColumn("std", sqrt(variance))
      .drop("s1", "s2")
  }
}
