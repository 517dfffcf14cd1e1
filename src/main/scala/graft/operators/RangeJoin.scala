package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band / range joins without the cartesian. A naive
  * `a.join(b, a("v") between (b("lo"), b("hi")))` has no equality key,
  * so Catalyst falls back to BroadcastNestedLoopJoin — O(|a|·|b|)
  * predicate evaluations, the classic Spark range-join trap.
  *
  * The fix is the standard bucketization: quantize the value domain
  * into fixed-width cells; a point lands in exactly one cell, an
  * interval replicates to every cell it touches; an EQUALITY join on
  * the cell id produces candidates and the exact predicate filters
  * them. Work becomes O(|a| + |b|·avgSpan + candidates) with a plain
  * hash shuffle — the same plan shape as every other bucketed join in
  * this library (LSH bands, SimHash chunks, IVF cells).
  *
  * Pick `bucketWidth` ≈ the typical interval length: each interval
  * then replicates to ~2 cells, and a candidate cell pairs a point
  * with only the intervals overlapping its neighborhood. Too-small
  * widths inflate interval replication; too-large widths inflate
  * false candidates. Both failure modes degrade smoothly.
  */
object RangeJoin {

  /** Inner-join of `points` rows to every `intervals` row whose
    * `[loCol, hiCol]` contains the point's `pCol` (closed ends).
    * Output carries all columns of both inputs (caller disambiguates
    * names). NULL values/ends never match. Intervals must satisfy
    * lo <= hi; rows violating it simply match nothing. */
  def pointInterval(
      points: DataFrame,
      pCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0 (got $bucketWidth)")
    val clash = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(clash.isEmpty,
      s"pointInterval output carries both sides' columns; rename ${clash.mkString(", ")}")
    def cell(c: Column): Column = floor(c / bucketWidth).cast("long")
    val p = points.withColumn("__cell", cell(col(pCol)))
    // sequence() is inclusive on both ends; an interval spanning k
    // cells emits k rows of (cell, interval-cols)
    val iv = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn("__cell", explode(sequence(cell(col(loCol)), cell(col(hiCol)))))
    // a point matches an interval in exactly ONE cell (its own), so the
    // equality join introduces no duplicate pairs — no distinct needed
    p.join(iv, Seq("__cell"))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Distance self-join summary: for each row, the count / min / max of
    * OTHER rows' values within `eps` of its own (|v_b − v_a| <= eps).
    * Rows with no neighbor are absent (inner-join semantics, matching
    * the plain SQL formulation). Composition of [[pointInterval]] with
    * bucketWidth = 2·eps (every interval spans ≤ 2 cells). */
  def neighborStats(
      df: DataFrame,
      idCol: String,
      valCol: String,
      eps: Double): DataFrame = {
    require(eps > 0, s"eps must be > 0 (got $eps)")
    val points = df.select(col(idCol).as("__p_id"), col(valCol).as("__p_v"))
    val iv = df.select(col(idCol).as("__i_id"),
      (col(valCol) - eps).as("__lo"), (col(valCol) + eps).as("__hi"))
    pointInterval(points, "__p_v", iv, "__lo", "__hi", bucketWidth = 2 * eps)
      .where(col("__p_id") =!= col("__i_id"))
      .groupBy(col("__i_id").as(idCol))
      .agg(count(lit(1)).as("n_near"),
        min(col("__p_v")).as("min_near"), max(col("__p_v")).as("max_near"))
  }
}
