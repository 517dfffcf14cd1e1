package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over a keyed event
  * stream — the product-analytics layer a curation pipeline runs on its
  * interaction logs (which sessions convert, which cohorts persist)
  * before deciding what to keep.
  *
  * Both operators are single-exchange by design. Funnel step times are
  * stacked unbounded `min(when(...))` window columns over the SAME
  * `partitionBy(key)` — step i's condition reads step i-1's column, and
  * because every window shares one partitioning (no ordering needed for
  * an unbounded frame) Catalyst plans ONE Exchange followed by a chain
  * of Window operators. No joins, no driver iteration; at 100 TB this
  * is exactly a hash shuffle on the user key and k linear passes per
  * partition. Retention is the same shuffle (cohort = per-key min over
  * the unbounded frame) followed by a distinct + count aggregation.
  */
object Funnel {

  /** Per-key earliest completion time of each funnel step, columns
    * `t0..t{k-1}`. Step 0 is the key's earliest `steps(0)` event; step i
    * (i>0) is the earliest `steps(i)` event STRICTLY AFTER `t{i-1}`.
    * A NULL `t{i}` means the key never completed step i (and, by the
    * strictly-after rule, neither did any later step).
    *
    * Output has one row per key (the window columns are per-key
    * constants; duplicates are collapsed). Reference analog: the
    * sequence-match funnels of event-analytics engines, re-expressed as
    * stacked Catalyst Window operators instead of a per-user UDAF.
    */
  def stepTimes(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(keyCol))
    val withTimes = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val eligible =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t${i - 1}")
      acc.withColumn(s"t$i", min(when(eligible, col(tsCol))).over(w))
    }
    withTimes
      .select(col(keyCol) +: steps.indices.map(i => col(s"t$i")): _*)
      .distinct()
  }

  /** Funnel summary: one row per step with the step's event type, the
    * number of keys that reached it, and the conversion rate from the
    * previous step (NULL for step 0; 6-decimal rounded). `step` is
    * 0-based. The per-step rows come from unpivoting ONE single-row
    * aggregate — no second pass over the data.
    */
  def funnelCounts(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val times = stepTimes(df, keyCol, tsCol, typeCol, steps)
    val counts = times.agg(
      count(col("t0")).as("n0"),
      steps.indices.drop(1).map(i => count(col(s"t$i")).as(s"n$i")): _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i.toLong).as("step"),
        lit(step).as("event_type"),
        col(s"n$i").as("users"),
        (if (i == 0) lit(null).cast("double")
         else round(col(s"n$i").cast("double") / col(s"n${i - 1}"), 6))
          .as("conversion"))
    }
    counts
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.users"), col("r.conversion"))
  }

  /** Classic cohort-retention triangle: cohort = the key's first-seen
    * day, offset = whole days between the cohort day and an active day,
    * `n_users` = distinct keys from that cohort active at that offset.
    * Offset 0 always contains the full cohort. One exchange for the
    * per-key cohort (unbounded window min), then a distinct + count
    * aggregation — both on key-derived columns, so AQE coalesces them.
    */
  def retention(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    df.withColumn("cohort", to_date(min(col(tsCol)).over(w)))
      .select(col(keyCol).as("k"), col("cohort"), to_date(col(tsCol)).as("day"))
      .distinct()
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).cast("long").as("offset"))
      .agg(countDistinct(col("k")).as("n_users"))
  }
}
