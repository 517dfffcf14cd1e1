package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group-by-intervals: the reference's `isbin=True` / `pd.IntervalIndex`
  * path (reference core.py:803-823, _convert_expected_groups_to_index
  * core.py:2087-2107). Values are assigned a 0-based bin index against a
  * sorted edge list; out-of-range values get NULL (the -1 code,
  * reference factorize_ via np.digitize) and are dropped by
  * [[GroupByReduce.reduce]]'s missing-label rule. Empty bins survive in the
  * output via the expected-groups reindex, exactly like the reference
  * (tests/test_core.py:898-942).
  */
object Binning {

  /** 0-based bin index for arbitrary (small) edge lists, honoring interval
    * closedness. `closedRight`: bin i = (e_i, e_{i+1}]; else [e_i, e_{i+1}).
    * Compiles to a when-chain — O(#bins) per row but fully codegen'd; for
    * large uniform edge grids prefer [[binIndexUniform]]. */
  def binIndex(v: Column, edges: Seq[Any], closedRight: Boolean = true): Column = {
    require(edges.size >= 2, "need at least two bin edges")
    val conds = edges.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      val c =
        if (closedRight) v > lit(lo) && v <= lit(hi)
        else v >= lit(lo) && v < lit(hi)
      (c, i)
    }.toSeq
    conds.tail
      .foldLeft(when(conds.head._1, lit(0))) { case (acc, (c, i)) => acc.when(c, lit(i)) }
      .otherwise(lit(null).cast(IntegerType))
  }

  /** O(1)-per-row bin index for uniform numeric edges lo, lo+w, ..., hi —
    * the shape that matters at 100 TB (e.g. histogramming a measurement).
    * Equivalent to SQL width_bucket minus the under/overflow buckets. */
  def binIndexUniform(v: Column, lo: Double, hi: Double, nBins: Int, closedRight: Boolean = true): Column = {
    val w   = (hi - lo) / nBins
    val raw =
      if (closedRight) ceil((v - lit(lo)) / lit(w)).cast(IntegerType) - 1
      else floor((v - lit(lo)) / lit(w)).cast(IntegerType)
    val inRange =
      if (closedRight) v > lit(lo) && v <= lit(hi)
      else v >= lit(lo) && v < lit(hi)
    when(inRange, greatest(least(raw, lit(nBins - 1)), lit(0)))
      .otherwise(lit(null).cast(IntegerType))
  }

  /** Expected-groups DataFrame for a binned key: one row per bin with its
    * index and [lo, hi) / (lo, hi] bounds, for reindex + labeling. */
  def binsDf(spark: SparkSession, name: String, edges: Seq[Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = edges.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      org.apache.spark.sql.Row(i, lo, hi)
    }.toSeq.asJava
    spark.createDataFrame(rows, StructType(Seq(
      StructField(name, IntegerType),
      StructField(s"${name}_lo", DoubleType),
      StructField(s"${name}_hi", DoubleType))))
  }
}
