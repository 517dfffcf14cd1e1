package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: rows of a keyed event stream are grouped
  * into sessions whenever the gap to the previous event exceeds
  * `gapSeconds`. The standard composition — lag → new-session flag →
  * running sum as session index — one shuffle by key, one in-partition
  * sort, same cost envelope as a grouped scan (SURVEY §2.2); the
  * streaming analog is `session_window` in Structured Streaming.
  *
  * A training-data pipeline uses this to stitch event/interaction logs
  * into conversation-shaped documents before text processing.
  */
object Sessionize {

  /** Appends `session` (0-based per-key session index) to every row. */
  def withSessionId(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val gap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(byKey))
    val isNew = when(gap.isNull || gap > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session",
      sum(isNew).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
  }

  /** One row per session: start/end, event count, sum of a value column. */
  def sessions(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      valueCol: String): DataFrame =
    withSessionId(df, keys, tsCol, gapSeconds)
      .groupBy(keys.map(col) :+ col("session"): _*)
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Session rollup via Spark's native `session_window` — the streaming-
    * capable form: the identical expression runs under `readStream` with a
    * watermark (state evicted per closed session), which the lag-based
    * [[sessions]] cannot. Same inclusive gap boundary as [[sessions]]
    * (windows merge when next_start <= prev_end, so a gap of exactly the
    * duration stays one session — pinned by SessionWindowSpec); the one
    * difference is `session_end` = last-event + gap (the window end), not
    * the last event time. Output: keys, session_start, session_end,
    * n_events, sum_value (exact decimal sum). */
  def sessionWindowRollup(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gap: String,
      valueCol: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap).as("__sw") +: keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(keys.map(col) ++ Seq(
        col("__sw.start").as("session_start"),
        col("__sw.end").as("session_end"),
        col("n_events"), col("sum_value")): _*)
}
