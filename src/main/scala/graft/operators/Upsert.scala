package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed latest-wins merge — the CDC-apply / SCD-type-1 "MERGE INTO"
  * step of an incremental pipeline, as a plain deterministic operator:
  * given the current table and a batch of keyed updates with a version
  * column, keep exactly one row per key — the one with the highest
  * (version, side, tie-break) — where side prefers the update batch on
  * version ties. Completes the ingestion story next to
  * [[Dedup.dedupIncremental]] (content-level) and [[AggState]]
  * (aggregate-level).
  *
  * Mechanics: union the two sides with a side tag and reduce per key
  * with ONE `max(struct(version, side, tieBreak, payload...))` hash
  * aggregation — struct comparison is lexicographic over ALL fields,
  * so the winner is total-order deterministic even if a caller's
  * (version, tieBreak) repeats (payload then decides, stably). No
  * join, no window sort. Map-side combine keeps the shuffle at one
  * surviving candidate per key per partition.
  *
  * At 100 TB the cost is the base-side shuffle on `keys`; store the
  * base bucketed by `keys` ([[Layout.writeBucketed]]) and only the
  * (much smaller) update batch shuffles — the same layout contract as
  * repeated grouped reductions.
  *
  * Contract: both sides share the same schema; `versionCol` and
  * `tieBreak` name columns present in it; NULL versions sort lowest
  * (Spark struct ordering places NULL first in `max`), so a NULL
  * version never beats a real one.
  */
object Upsert {

  def upsertLatest(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(base.columns.toSeq == updates.columns.toSeq,
      s"base and updates must share one schema (got ${base.columns.toSeq} vs ${updates.columns.toSeq})")
    require((versionCol +: tieBreak).forall(base.columns.contains),
      s"version/tie-break columns must exist in the schema")
    require(!base.columns.contains("__side"),
      "upsertLatest reserves column name __side; rename it in the input")
    val tagged = base.withColumn("__side", lit(0))
      .unionByName(updates.withColumn("__side", lit(1)))
    latestByOrder(tagged, keys,
      col(versionCol) +: col("__side") +: tieBreak.map(col))
      .drop("__side")
  }

  /** The winner kernel: one row per key — the max of
    * `struct(order..., payload...)` (payload = every input column, so
    * the comparison is total and the survivor deterministic under any
    * partitioning). Works unchanged under `readStream` with a
    * complete/update-mode sink: per-key state is ONE struct, the
    * bounded-state shape the streamability boundary allows
    * ([[graft.streaming.StreamingOps]] uses it for the live
    * CDC-apply table). */
  def latestByOrder(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "latestByOrder needs at least one key column")
    require(order.nonEmpty, "latestByOrder needs at least one order column")
    val payload = df.columns.toSeq
    // ordering fields aliased so they can repeat inside the payload tail
    val ordered = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } ++
      payload.map(col)
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(ordered: _*)).as("__w"))
      .select(payload.map(c => col(s"__w.$c").as(c)): _*)
  }
}
