package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation (ROLLUP / CUBE / GROUPING SETS) — the
  * subtotal lattice OLAP engines expose and the reference's users get
  * from stacking groupbys. One Spark job computes every subtotal level.
  *
  * Plan shape: Catalyst rewrites all three to Expand + partial-agg +
  * ONE hash-shuffle + final-agg. Expand multiplies rows by the number
  * of grouping sets BEFORE the shuffle, but partial aggregation runs
  * after it map-side, so the shuffled volume is (#sets × #groups) — the
  * size of the ANSWER, not #sets × the input. At 100 TB that's the same
  * wire cost as running the k groupbys separately, with one scan
  * instead of k. `grouping_id()` disambiguates subtotal rows from data
  * rows whose key is genuinely NULL (bit i set = column i rolled up).
  */
object MultiDim {

  private def gid(keys: Seq[String]): Column =
    grouping_id(keys.map(col): _*).as("gid")

  /** ROLLUP: hierarchical subtotals (a,b), (a), () — prefix levels. */
  def rollupAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.rollup(keys.map(col): _*).agg(gid(keys), aggs: _*)

  /** CUBE: subtotals for every key subset (2^k grouping sets). */
  def cubeAgg(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.cube(keys.map(col): _*).agg(gid(keys), aggs: _*)

  /** Arbitrary GROUPING SETS: `sets` lists the kept columns of each set
    * (subsets of `keys`); rolled-up columns come back NULL with their
    * `gid` bit set, exactly as in ANSI SQL. */
  def groupingSetsAgg(
      df: DataFrame,
      keys: Seq[String],
      sets: Seq[Seq[String]],
      aggs: Seq[Column]): DataFrame =
    df.groupingSets(sets.map(_.map(col)), keys.map(col): _*)
      .agg(gid(keys), aggs: _*)
}
