package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NanOps

/** Memory-safe EXACT quantiles — the scale path for the one reduction
  * whose registry form has an executor-memory bound.
  *
  * `Agg("quantile"...)` compiles to Spark's `Percentile`, an
  * ObjectHashAggregate buffering a value->count map PER GROUP in executor
  * memory: exact and fast until one group's distinct-value count blows the
  * heap (a continuous column with billions of rows per group — the 100 TB
  * failure mode; the reference dodges it by being blockwise-only,
  * aggregations.py:532-533). This operator computes the identical
  * linear-interpolation quantiles as composed relational plans with no
  * unbounded in-memory structure:
  *
  *   1. (keys, value) -> count: ordinary two-phase hash aggregation — the
  *      shuffle carries one row per DISTINCT value per group;
  *   2. per-key running count over the value-sorted distinct table: a
  *      window whose sort is a spilling external sort (WindowExec), not a
  *      map in the agg buffer;
  *   3. the two covering values per requested q are picked by rank-range
  *      predicates and one final tiny per-key aggregation applies the
  *      interpolation lower + (upper-lower)*frac (Percentile's formula).
  *
  * Trade-offs, stated plainly: memory is bounded (spill-safe) but a
  * single group's distinct values still sort within one task — a skewed
  * continuous column costs wall-clock (not OOM). `approxquantile` remains
  * the bounded-TIME option; this is the bounded-MEMORY exact one.
  *
  * Missing-value semantics: NaN/NULL values are skipped (the nan* form).
  * Groups with no valid values are absent from the output (compose with
  * an expected-groups reindex to fill them). Matches
  * `Agg("nanquantile")` bit-for-bit on every input (QuantilesSpec).
  */
object Quantiles {

  /** @param qs        quantiles in [0,1]; one output column per q when a
    *                   single q is given (named `as`), else an array column
    *                   like the registry's vector-q form
    * @param propagate  numpy plain-variant semantics: any NaN in a group
    *                   makes the group's result NaN (matches
    *                   `Agg("quantile")` bit-for-bit; default matches
    *                   `Agg("nanquantile")`). Propagating groups — and
    *                   all-NULL groups — stay present in the output, like
    *                   the registry's groupBy.
    */
  def exactQuantile(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      qs: Seq[Double],
      as: String = "q",
      propagate: Boolean = false): DataFrame = {
    require(by.nonEmpty, "need at least one grouping column")
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q >= 0.0 && q <= 1.0), s"quantiles must be in [0,1]: $qs")
    val dt      = df.schema(valueCol).dataType
    val keyCols = by.map(col)
    val v       = col(valueCol)

    // Propagate keeps one NULL-valued row per group (all its NaN/NULL
    // originals collapsed, __cnt = 0) so the group survives with its NaN
    // count (0 for non-float dtypes, which cannot hold a NaN — the group
    // still stays present, with a NULL result); it sorts first in the
    // window and never covers a rank.
    val counts =
      if (propagate)
        df.groupBy(keyCols :+ NanOps.nanToNull(v, dt).as(valueCol): _*)
          .agg(count(when(NanOps.isValid(v, dt), 1)).as("__cnt"),
               (if (NanOps.isFloaty(dt)) count(when(isnan(v), 1)) else lit(0L))
                 .as("__nan"))
      else
        df.where(NanOps.isValid(v, dt))
          .groupBy(keyCols :+ v: _*)
          .agg(count(lit(1)).as("__cnt"), lit(0L).as("__nan"))
    val byVal = Window.partitionBy(keyCols: _*).orderBy(v)
    val total = Window.partitionBy(keyCols: _*)
    val t = counts
      .withColumn("__cum", sum("__cnt").over(
        byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__cnt").over(total))
      .withColumn("__prev", col("__cum") - col("__cnt"))

    // Percentile's rank: pos = q*(n-1) zero-based; the values covering
    // floor(pos) and ceil(pos) interpolate. A value row covers ranks
    // [__prev, __cum) — the predicates select exactly the two (or one)
    // covering rows; min() collapses the single selected value per side.
    val aggExprs = qs.zipWithIndex.flatMap { case (q, i) =>
      val pos = (col("__n") - 1).cast("double") * q
      Seq(
        min(when(col("__prev") <= floor(pos) && floor(pos) < col("__cum"), v)).as(s"__vlo$i"),
        min(when(col("__prev") <= ceil(pos) && ceil(pos) < col("__cum"), v)).as(s"__vhi$i"))
    } ++ Seq(max(col("__n")).as("__n"), max(col("__nan")).as("__nan"))
    val picked = t.groupBy(keyCols: _*).agg(aggExprs.head, aggExprs.tail: _*)

    // Percentile's exact FP order (Percentile.getPercentile): the weighted
    // two-sided form, NOT lo + (hi-lo)*frac — they differ by an ulp.
    def interp(i: Int, q: Double): Column = {
      val pos = (col("__n") - 1).cast("double") * q
      val lo  = col(s"__vlo$i").cast("double")
      val hi  = col(s"__vhi$i").cast("double")
      val x = when(floor(pos) === ceil(pos), lo)
        .otherwise((ceil(pos) - pos) * lo + (pos - floor(pos)) * hi)
      if (propagate) when(col("__nan") > 0, lit(Double.NaN)).otherwise(x) else x
    }
    // A group with zero valid values and zero NaNs (all-NULL; propagate
    // mode only) is NULL, matching Percentile-over-empty in the registry.
    val empty = col("__n") === 0 && col("__nan") === 0
    val result =
      if (qs.size == 1) when(empty, lit(null).cast("double"))
        .otherwise(interp(0, qs.head)).as(as)
      else when(empty, lit(null).cast("array<double>"))
        .otherwise(array(qs.zipWithIndex.map { case (q, i) => interp(i, q) }: _*)).as(as)
    picked.select(keyCols :+ result: _*)
  }
}
