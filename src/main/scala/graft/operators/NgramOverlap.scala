package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram overlap operators — the "hard" decontamination and
  * inter-document duplication statistics of LLM-training-data curation
  * (additions beyond the reference's surface, like [[Dedup]]; the GPT-3 /
  * PaLM data papers describe exactly this shape: drop or flag any training
  * document sharing an exact word n-gram with an evaluation document).
  *
  * [[Dedup.crossNearDupPairs]] is the FUZZY decontamination path
  * (MinHash-LSH candidates + Jaccard verify); this operator is the exact
  * complement: membership of individual n-grams, no similarity threshold,
  * recall 1 by construction. Both are expression-level, no UDFs.
  *
  * Scale design (100 TB):
  *   - [[contaminatedDocs]] joins the train side's exploded grams against
  *     the (much smaller) eval gram set — broadcast when the caller knows
  *     the eval side is small (the standard decontamination shape), so the
  *     train corpus is never shuffled at all; the probe key is the 8-byte
  *     gram fingerprint with a residual string-equality check, so a hash
  *     collision can never produce a false hit;
  *   - [[duplicateGramStats]] is big-to-big: it shuffles only the 16-byte
  *     fingerprint PAIR (two independent char folds over different prime
  *     moduli ~2^30 — joint space ~2^60, so cross-string collisions are
  *     negligible at any corpus size, same argument as
  *     [[Dedup.contentKey]]'s 128 bits), never gram strings. Both folds
  *     are plain modular arithmetic, so a SQL oracle replays them exactly
  *     (unlike xxhash64).
  */
object NgramOverlap {

  /** (id, g) exploded distinct-gram table — the one-pass native gram
    * builder [[Dedup.shinglesFast]], with the same short-document
    * fallback as [[Dedup.shingles]] (docs shorter than n words contribute
    * one whole-document gram, so no document is invisible to the
    * check; NULL-text rows produce no grams). */
  private def gramTable(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), explode(Dedup.shinglesFast(col(textCol), n)).as("g"))
  }

  /** Training documents sharing at least one exact word n-gram with any
    * evaluation document: (train id, n_hit_grams = how many of the doc's
    * distinct grams appear anywhere in the eval set). Downstream either
    * drops flagged docs (GPT-3 style) or thresholds on the hit count.
    *
    * @param broadcastEval pin the eval gram set broadcast — opt-in like
    *   [[Dedup.crossNearDupPairs]]' broadcastRight (ADVICE r3): the caller
    *   knows the eval side is small; with the hint the train side is
    *   probed in place and never shuffled.
    */
  def contaminatedDocs(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      broadcastEval: Boolean = false): DataFrame = {
    // native codegen fold for the per-gram hash on the (big) train side —
    // identical values to the HOF fingerprint (TextMultiModalSpec pin)
    graft.expressions.GraftFunctions.register(train.sparkSession)
    val t = gramTable(train, idCol, textCol, n)
      .select(col("id"), col("g"), TextAnalysis.fingerprintFast(col("g")).as("__f"))
    val e0 = gramTable(eval_, idCol, textCol, n)
      .select(col("g").as("__eg")).distinct()
      .select(col("__eg"), TextAnalysis.fingerprintFast(col("__eg")).as("__f"))
    val e = if (broadcastEval) broadcast(e0) else e0
    // probe on the 8-byte fingerprint, verify on the string: collisions
    // cost a failed comparison, never a false positive
    t.join(e, t("__f") === e("__f") && t("g") === e("__eg"))
      .groupBy(t("id").as(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Per-document corpus-wide duplication profile: of the document's
    * `n_grams` distinct word n-grams, `n_dup_grams` appear in at least one
    * OTHER document. A high dup fraction marks boilerplate/templated text
    * ("Deduplicating Training Data Makes Language Models Better" measures
    * exactly this family of statistics).
    *
    * Plan: explode grams -> fingerprint pair -> gram-frequency hash
    * aggregation (how many docs contain each gram) -> join back by the
    * pair -> per-doc count. Three shuffles, all of 16-byte keys + counts;
    * document text never moves.
    */
  def duplicateGramStats(
      df: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val g = df
      .select(col(idCol).as("id"), explode(Dedup.shinglesFast(col(textCol), n)).as("g"))
      .select(col("id"),
        TextAnalysis.fingerprintFast(col("g")).as("__f1"),
        TextAnalysis.fingerprint2Fast(col("g")).as("__f2"))
    // per-doc grams are distinct, so count(*) = number of docs with the gram
    val freq = g.groupBy("__f1", "__f2").agg(count(lit(1)).as("__ndocs"))
    g.join(freq, Seq("__f1", "__f2"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("__ndocs") > 1, 1)).as("n_dup_grams"))
  }
}
