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

  /** SCD-TYPE-2 history build: collapse a keyed CHANGELOG
    * (keys, version, payload) into validity intervals — one row per
    * (key, consecutive-distinct payload run): (keys, payload,
    * valid_from, valid_to), half-open [from, to), valid_to NULL for
    * the current row. A version that re-states the previous payload
    * opens NO new interval (null-safe struct comparison, so NULL
    * payload fields compare equal — the run-collapse rule every
    * warehouse SCD2 loader implements).
    *
    * Plan: ONE shuffle by key feeding two same-order window passes
    * (change-point lag filter, then interval lead) — the exchange is
    * shared. Contract: (keys, version) unique, versions non-NULL;
    * duplicate versions would make the run order ill-defined.
    *
    * At 100 TB: the changelog shuffles by key once; day-partitioned
    * arrivals should prefer [[scd2Upsert]], which touches only the
    * OPEN slice of history per batch. */
  def scd2Intervals(
      changelog: DataFrame,
      keys: Seq[String],
      versionCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && payloadCols.nonEmpty,
      "scd2Intervals needs keys and payload columns")
    val pay = struct(payloadCols.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(versionCol))
    val changes = changelog
      .withColumn("__prev", lag(pay, 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> pay))
      .withColumn("valid_from", col(versionCol))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("valid_from"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select((keys ++ payloadCols).map(col) :+ col("valid_from") :+ col("valid_to"): _*)
  }

  /** SCD-TYPE-2 incremental MERGE: roll a history table (the
    * [[scd2Intervals]] shape) forward with one update batch at version
    * T — close open rows whose payload changed (valid_to = T), open new
    * rows for changed/new keys (valid_from = T), keep everything else.
    * Keys absent from the batch are UNCHANGED (CDC batches are
    * partial; a full-snapshot delete pass is [[graft.operators.Validate.snapshotDiff]]'s
    * job). Day-by-day rolls are EQUIVALENT to one [[scd2Intervals]]
    * over the full changelog — the rolled == from-scratch invariant
    * (UpsertSpec + the q_scd2_rolling oracle pin it), including the
    * run-collapse rule: a batch re-stating the open payload changes
    * nothing.
    *
    * Plan: closed history passes through untouched; ONE full-outer
    * key join between the OPEN slice and the batch, then a single
    * projection explodes each joined row into its 1-2 output rows —
    * the join is never re-executed per case. At scale the open slice
    * is the small working set (≤ one row per live key) and the batch
    * is a day; neither is history-sized. A long daily loop should
    * persist (or localCheckpoint) each rolled history before the next
    * roll — the NearDupIndex/quantileStateIngest corpus-state
    * convention — so lineage stays one day deep; at rest, keep closed
    * and open slices as separate partitions and this operator's
    * closed-slice pass-through becomes a no-op read. Contract: one row
    * per key in the batch; batch version T must exceed every open
    * valid_from. */
  def scd2Upsert(
      history: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      versionCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && payloadCols.nonEmpty,
      "scd2Upsert needs keys and payload columns")
    val outCols = (keys ++ payloadCols).map(col) :+ col("valid_from") :+ col("valid_to")
    val closed = history.where(col("valid_to").isNotNull).select(outCols: _*)
    val open = history.where(col("valid_to").isNull)
      .select((keys ++ payloadCols).map(col) :+ col("valid_from") :+
        lit(true).as("__hasOpen"): _*)
    val b = batch.select(keys.map(col) ++
      payloadCols.map(c => col(c).as(s"__b_$c")) :+
      col(versionCol).as("__bver") :+ lit(true).as("__hasBatch"): _*)
    val j = open.join(b, keys, "full_outer")
    val oPay = struct(payloadCols.map(col): _*)
    val bPay = struct(payloadCols.map(c => col(s"__b_$c").as(c)): _*)
    val hasOpen = col("__hasOpen") <=> lit(true)
    val hasBatch = col("__hasBatch") <=> lit(true)
    val differs = !(oPay <=> bPay)
    val keepOrClose = when(hasOpen,
      struct(oPay.as("p"), col("valid_from").as("f"),
        when(hasBatch && differs, col("__bver"))
          .otherwise(lit(null).cast(j.schema("valid_from").dataType)).as("t")))
    val openNew = when(hasBatch && (!hasOpen || differs),
      struct(bPay.as("p"), col("__bver").as("f"),
        lit(null).cast(j.schema("valid_from").dataType).as("t")))
    val rolled = j
      .select(keys.map(col) :+ explode(array(keepOrClose, openNew)).as("__r"): _*)
      .where(col("__r").isNotNull)
      .select(keys.map(col) ++
        payloadCols.map(c => col(s"__r.p.$c").as(c)) :+
        col("__r.f").as("valid_from") :+ col("__r.t").as("valid_to"): _*)
    closed.unionByName(rolled)
  }

  /** Point-in-time read of an SCD2 history ([[scd2Intervals]] shape):
    * the dimension snapshot valid AT version/time `asOf` — one
    * codegen filter over the half-open intervals, ≤ one row per key
    * by construction. */
  def scd2SnapshotAt(history: DataFrame, asOf: Column): DataFrame =
    history.where(col("valid_from") <= asOf &&
      (col("valid_to").isNull || asOf < col("valid_to")))

  /** Fact-to-SCD2 dimension join: each fact row joins the dimension
    * row that was valid AT the fact's own `asOfCol` — the
    * point-in-time join every warehouse fact table runs against its
    * type-2 dimensions. ONE equality join on the keys with the
    * interval predicate as a post-join filter (per-key history is a
    * handful of rows, so this is join-selectivity, not a range-join
    * blowup); facts whose version predates the key's first interval —
    * or whose key has no history — drop (inner semantics). Output:
    * every fact column plus the dimension payload and its
    * valid_from/valid_to. At 100 TB the shuffle is the fact side's
    * key exchange; bucket both at rest and it disappears (the
    * writeBucketed contract). */
  def scd2JoinAsOf(
      facts: DataFrame,
      history: DataFrame,
      keys: Seq[String],
      asOfCol: String): DataFrame = {
    require(keys.nonEmpty, "scd2JoinAsOf needs at least one key column")
    require(facts.columns.contains(asOfCol),
      s"asOf column $asOfCol must exist in the fact side")
    val f = facts.as("__f")
    val h = history.as("__h")
    val asOf = col(s"__f.$asOfCol")
    val cond = keys.map(k => col(s"__f.$k") === col(s"__h.$k")).reduce(_ && _) &&
      col("__h.valid_from") <= asOf &&
      (col("__h.valid_to").isNull || asOf < col("__h.valid_to"))
    f.join(h, cond).select(col("__f.*") +:
      history.columns.filterNot(keys.contains).map(c => col(s"__h.$c")): _*)
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
