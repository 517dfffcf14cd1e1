package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning + subword tokenization —
  * the tokenizer-training step of an LLM data pipeline (Sennrich,
  * Haddow & Birch, ACL 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"; beyond the reference's surface, SURVEY §2.9).
  *
  * Scale shape: the corpus is scanned ONCE into a (word, freq) table —
  * every subsequent iteration is a hash aggregation plus a codegen
  * `replace` projection over that VOCAB-sized table, never the corpus.
  * Each iteration collects exactly one row (the argmax pair — the
  * kmeans/qcut bounded-collect convention) and localCheckpoints the
  * vocab frame so lineage stays one round deep (the
  * dupClustersConverged rule). Production BPE at 32-64k merges would
  * additionally maintain pair-count DELTAS between iterations instead
  * of re-aggregating (only words containing the merged pair change);
  * this form re-aggregates — exact, simple, and each iteration is
  * embarrassingly parallel — with the driver loop fail-fast bounded.
  *
  * Determinism/oracle parity: pair counts are exact integer sums; the
  * argmax tie-breaks by the pair string ascending (binary collation on
  * a space-free-symbol alphabet — identical in Spark and DuckDB); and
  * merge application uses `replace`'s left-to-right non-overlapping
  * scan, which both engines share ("a a a a" + merge (a,a) → "aa aa",
  * the Sennrich convention). Symbol sequences ride a single string —
  * single-space padding, DOUBLE-space separator — so the replace
  * pattern " l  r " can only match at symbol boundaries (" a  bc "
  * never matches " a  b ") while the pad/separator spaces it consumes
  * are restored by the replacement " lr ".
  */
object Bpe {

  final case class Merge(iter: Long, left_sym: String, right_sym: String, cnt: Long)

  /** Max driver-loop iterations — one bounded 1-row collect each. */
  val MaxMerges = 64

  /** A word as its padded symbol string: " c1  c2  ...  cn ". */
  private def padSym(w: Column): Column =
    concat(lit(" "),
      array_join(
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
        "  "),
      lit(" "))

  private def pat(m: Merge): String = s" ${m.left_sym}  ${m.right_sym} "
  private def rep(m: Merge): String = s" ${m.left_sym}${m.right_sym} "

  /** The ONE corpus-sized scan: whitespace words → (sym, f). */
  private def symFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .select(padSym(col("w")).as("sym"), col("f"))

  /** Learn `merges` BPE merge rules over the corpus' word-frequency
    * table. Per iteration: adjacent-pair counts (one hash agg over the
    * vocab), argmax by (count desc, pair asc), then one codegen
    * `replace` scan applies the winner. Stops early if no pair remains
    * (every word fully merged). Returns the rules in application
    * order. */
  def bpeLearn(df: DataFrame, textCol: String, merges: Int): Seq[Merge] = {
    require(merges >= 1 && merges <= MaxMerges,
      s"merges must be in [1, $MaxMerges] (got $merges) — the driver loop runs one job per merge")
    var w = symFreq(df, textCol).localCheckpoint()
    val out = ArrayBuffer.empty[Merge]
    var i = 1
    var done = false
    while (i <= merges && !done) {
      val arr = split(trim(col("sym")), "  ")
      val best = w
        .select(explode(zip_with(
            slice(arr, lit(1), size(arr) - 1),
            slice(arr, lit(2), size(arr) - 1),
            (a, b) => concat(a, lit(" "), b))).as("pair"),
          col("f"))
        .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val lr = best(0).getString(0).split(" ", 2)
        val m = Merge(i.toLong, lr(0), lr(1), best(0).getLong(1))
        out += m
        w = w.withColumn("sym",
            call_function("replace", col("sym"), lit(pat(m)), lit(rep(m))))
          .localCheckpoint()
        i += 1
      }
    }
    out.toSeq
  }

  /** Learned rules as a DataFrame — (iter, left_sym, right_sym, cnt);
    * the persistable index-at-rest form (train once, save, reload for
    * [[bpeTokenize]]). */
  def mergesDf(spark: org.apache.spark.sql.SparkSession, rules: Seq[Merge]): DataFrame =
    spark.createDataFrame(rules)
      .select(col("iter"), col("left_sym"), col("right_sym"), col("cnt"))

  /** Reload persisted rules ([[mergesDf]] written to parquet — the
    * index-at-rest round trip): a bounded collect (≤ [[MaxMerges]]
    * rows, fail-fast), re-ordered by `iter` since application order IS
    * the tokenizer. */
  def mergesFrom(df: DataFrame): Seq[Merge] = {
    val rows = df.select(col("iter").cast("long"), col("left_sym"),
        col("right_sym"), col("cnt").cast("long"))
      .limit(MaxMerges + 1).collect()
    require(rows.length <= MaxMerges,
      s"merge-rule table exceeds $MaxMerges rows — not a bpeLearn output")
    rows.map(r => Merge(r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.iter).toSeq
  }

  /** Subword tokens of `text` under learned merge rules, as a pure
    * Column expression (whole-stage codegen, zero shuffle): each word
    * folds through the literal replace chain in rule order, then
    * splits back on the double-space separator. */
  def bpeTokenize(text: Column, merges: Seq[Merge]): Column = {
    require(merges.nonEmpty && merges.size <= MaxMerges,
      s"need 1..$MaxMerges merge rules (got ${merges.size})")
    val applied = (w: Column) =>
      merges.foldLeft(padSym(w))((acc, m) =>
        call_function("replace", acc, lit(pat(m)), lit(rep(m))))
    flatten(transform(
      filter(split(text, " "), w => length(w) > 0),
      w => split(trim(applied(w)), "  ")))
  }

  /** Per-document subword token counts — the sizing pass a packing /
    * batch-budget stage runs after tokenizer training. */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.select(col(idCol),
      size(bpeTokenize(col(textCol), merges)).cast("long").as("n_tokens"))
}
