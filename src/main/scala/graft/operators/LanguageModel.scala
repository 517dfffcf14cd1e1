package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Held-out n-gram language-model scoring with interpolated Kneser-Ney
  * smoothing — the CCNet-style perplexity quality filter in its REAL
  * deployment shape (Wenzek et al., LREC 2020 fit a KenLM model on a
  * clean reference corpus and score the crawl with it; Kneser & Ney,
  * ICASSP 1995; Chen & Goodman 1998 §2.7 for the interpolated form).
  * [[TextAnalysis.unigramLogLoss]]/[[TextAnalysis.bigramLogLoss]] fit
  * on the scored corpus itself, which a contaminated crawl can game —
  * this operator fits on a TRAIN frame and scores a SEPARATE frame, so
  * unseen words and unseen contexts are first-class (absolute
  * discounting + continuation counts + a uniform out-of-vocabulary
  * floor keep every probability strictly positive).
  *
  * Model (bigram, discount D, training vocabulary of size V0,
  * V = V0 + 1 with one OOV slot):
  *
  *   p1(w)    = (max(N1+(·w) − D, 0) + D·T/V) / B
  *   p(w|v)   = (max(c(vw) − D, 0) + D·N1+(v·)·p1(w)) / c(v·)   if c(v·)>0
  *            = p1(w)                                            otherwise
  *
  * with B = distinct bigram types, T = distinct continuation words
  * N1+(·w)>0, N1+(v·)/N1+(·w) the left/right continuation type counts
  * and c(v·) the count of transitions whose history is v. Both rows of
  * the definition sum to 1 over the V-word vocabulary (each vocab word
  * carries a D·T/(B·V) share of the unigram mass — the Chen-Goodman
  * interpolated-KN normalization with a uniform base distribution).
  *
  * Determinism/oracle parity: every probability is ONE fixed-shape IEEE
  * expression over exact integer counts (counts cast to double, D an
  * exactly-representable literal), ln-quantized ([[TextAnalysis.lnQ]])
  * and summed as exact decimals with one IEEE finalize — the
  * [[TextAnalysis.bigramLogLoss]] convention; [[knBigramLogLossSql]]
  * mirrors the expression token for token.
  *
  * Plan shape (the 100 TB story): the train corpus collapses into three
  * vocabulary-sized count tables (bigram types, left-context stats,
  * right-continuation stats) — hash aggregations, map-side combined;
  * the scalar statistics (B, T, V) ride a one-row broadcast; score-side
  * transition rows probe the count tables via LEFT joins on token keys.
  * Document text never shuffles past its explode; no driver state holds
  * data-sized anything (the one fail-fast probe is `limit(1)`-bounded).
  */
object LanguageModel {

  import TextAnalysis.{tokens, lnQ}

  /** (id, left, right) transition rows of every ≥2-token document —
    * adjacent-token structs via one array transform (no self-join). */
  private def transitions(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
      .where(size(col("__w")) >= 2)
      .select(col("__id"), explode(transform(
        sequence(lit(0), size(col("__w")) - 2),
        i => struct(element_at(col("__w"), i + 1).as("p"),
          element_at(col("__w"), i + 2).as("c")))).as("__t"))
      .select(col("__id"), col("__t.p").as("__p"), col("__t.c").as("__c"))

  /** Score every ≥2-transition document of `score` under an
    * interpolated-KN bigram model fit on `train`. Returns
    * (idCol, n_trans, kn_loss) with kn_loss the per-transition
    * cross-entropy in nats — high = implausible under the reference
    * corpus (the CCNet "keep the low-perplexity tail" signal). Docs of
    * `score` with <2 tokens or NULL text are absent (the
    * [[TextAnalysis.bigramLogLoss]] convention). `train` must contain
    * at least one transition (fail-fast — a bigram model needs a
    * bigram). */
  def knBigramLogLoss(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      d: Double = 0.75): DataFrame = {
    val (cb, lt, rt, totals) = fitTables(train, textCol, d)
    scoreTables(cb, lt, rt, totals, score, idCol, textCol, d)
  }

  /** A FITTED KN bigram model as index state at rest: the three
    * vocabulary-sized count tables plus the one-row scalars,
    * MATERIALIZED (localCheckpoint), so a monitoring stream (or any
    * number of scoring passes) probes frozen tables instead of
    * re-deriving the fit per use — the AnnIndex/NearDupIndex
    * train-once convention. */
  final case class KnBigramModel(cb: DataFrame, lt: DataFrame, rt: DataFrame,
      totals: DataFrame, d: Double)

  /** Fit the model once, eagerly. Same algebra, fail-fast, and
    * downstream hashes as [[knBigramLogLoss]]'s inline fit. */
  def knBigramFit(train: DataFrame, textCol: String, d: Double = 0.75): KnBigramModel = {
    val (cb, lt, rt, totals) = fitTables(train, textCol, d)
    KnBigramModel(cb.localCheckpoint(), lt.localCheckpoint(),
      rt.localCheckpoint(), broadcast(totals.localCheckpoint()), d)
  }

  /** Score a frame under a fitted model — stateless (one pass over
    * `score`, probing the model's frozen tables). */
  def knBigramScoreWith(model: KnBigramModel, score: DataFrame,
      idCol: String, textCol: String): DataFrame =
    scoreTables(model.cb, model.lt, model.rt, model.totals,
      score, idCol, textCol, model.d)

  object KnBigramModel {
    /** Persist a fitted model under `dir` (cb/lt/rt/totals/meta parquet
      * subdirectories) — the index-at-rest form. A model held across
      * queries MUST ride this (the ndIndexCache convention): a cached
      * localCheckpointed frame dies the moment any session-state
      * isolation unpersists RDDs (the Bench isolate() audit —
      * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on re-run), a directory
      * doesn't. */
    def write(model: KnBigramModel, dir: String): Unit = {
      model.cb.write.mode("overwrite").parquet(s"$dir/cb")
      model.lt.write.mode("overwrite").parquet(s"$dir/lt")
      model.rt.write.mode("overwrite").parquet(s"$dir/rt")
      model.totals.write.mode("overwrite").parquet(s"$dir/totals")
      val spark = model.cb.sparkSession
      spark.createDataFrame(Seq(Tuple1(model.d))).toDF("d")
        .write.mode("overwrite").parquet(s"$dir/meta")
    }

    /** Reload a persisted model: plain parquet-backed frames, freely
      * re-readable across cache/RDD lifecycle events. */
    def read(spark: org.apache.spark.sql.SparkSession, dir: String): KnBigramModel = {
      val d = spark.read.parquet(s"$dir/meta").head().getDouble(0)
      KnBigramModel(spark.read.parquet(s"$dir/cb"),
        spark.read.parquet(s"$dir/lt"),
        spark.read.parquet(s"$dir/rt"),
        spark.read.parquet(s"$dir/totals"), d)
    }
  }

  /** The fit: bigram types, left-context stats, right-continuation
    * types, and the (B, T, V) one-row scalars, as LAZY frames (the
    * one-plan fused shape [[knBigramLogLoss]] ships; [[knBigramFit]]
    * materializes them). */
  private def fitTables(train: DataFrame, textCol: String, d: Double)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    // id slot unused by the fit (pruned by Catalyst after the groupBy)
    val tr = transitions(train, textCol, textCol)
    val cb = tr.groupBy(col("__p").as("__bp"), col("__c").as("__bc"))
      .agg(count(lit(1)).as("__cb"))
    require(cb.limit(1).count() == 1L,
      "knBigramLogLoss: train corpus has no transitions (every doc <2 tokens)" +
        " — a bigram model needs at least one bigram")
    // left-context stats: history count c(v·) and continuation types N1+(v·)
    val lt = cb.groupBy(col("__bp").as("__lp"))
      .agg(sum(col("__cb")).as("__cl"), count(lit(1)).as("__tl"))
    // right-continuation types N1+(·w)
    val rt = cb.groupBy(col("__bc").as("__rc")).agg(count(lit(1)).as("__tr"))
    // scalar statistics: B bigram types, T continuation words, V = vocab+1
    val bt = cb.agg(count(lit(1)).as("__b"), count_distinct(col("__bc")).as("__t"))
    val vc = train.select(explode(tokens(col(textCol))).as("__u"))
      .agg((count_distinct(col("__u")) + lit(1L)).as("__v"))
    (cb, lt, rt, bt.crossJoin(vc))
  }

  /** The scoring algebra over fitted tables — shared by the fused
    * one-plan form and the fit-once/score-many paths. */
  private def scoreTables(cb: DataFrame, lt: DataFrame, rt: DataFrame,
      totals: DataFrame, score: DataFrame, idCol: String, textCol: String,
      d: Double): DataFrame = {
    val sc = transitions(score, idCol, textCol)
    val joined = sc
      .join(cb, col("__p") === col("__bp") && col("__c") === col("__bc"), "left")
      .join(lt, col("__p") === col("__lp"), "left")
      .join(rt, col("__c") === col("__rc"), "left")
      .crossJoin(broadcast(totals))
    val p1 = (greatest(coalesce(col("__tr"), lit(0L)).cast("double") - lit(d), lit(0.0))
      + lit(d) * col("__t").cast("double") / col("__v").cast("double")) /
      col("__b").cast("double")
    val pc = when(col("__cl").isNull, p1).otherwise(
      (greatest(coalesce(col("__cb"), lit(0L)).cast("double") - lit(d), lit(0.0))
        + lit(d) * col("__tl").cast("double") * p1) / col("__cl").cast("double"))
    joined
      .select(col("__id"), lnQ(pc).as("__lp"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn("kn_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** (id, group, left, right) transition rows — [[transitions]] with
    * the group key carried. */
  private def transitionsBy(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
        tokens(col(textCol)).as("__w"))
      .where(size(col("__w")) >= 2)
      .select(col("__id"), col("__g"), explode(transform(
        sequence(lit(0), size(col("__w")) - 2),
        i => struct(element_at(col("__w"), i + 1).as("p"),
          element_at(col("__w"), i + 2).as("c")))).as("__t"))
      .select(col("__id"), col("__g"), col("__t.p").as("__p"), col("__t.c").as("__c"))

  /** Grouped twin of [[knBigramLogLoss]]: fit ONE independent KN model
    * PER GROUP (per language, per source, …) on `train`, score each
    * `score` document under ITS group's model. Returns
    * (groupCol, idCol, n_trans, kn_loss). Score documents whose group
    * has no train transitions are ABSENT (no model exists — the
    * grouped-drift per-group contract), as are <2-token/NULL docs and
    * NULL-group rows on either side (a group key of NULL names no
    * model). Every count table and the (B, T, V) scalars carry the
    * group key, so the whole fit+score is hash-partitioned by group —
    * groups parallelize, no driver loop, no per-group job. */
  def knBigramLogLossBy(
      train: DataFrame,
      score: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    // id slot unused by the fit (the fitTables convention): pass textCol
    // so the TRAIN frame never needs the score-side id column
    val tr = transitionsBy(train, groupCol, textCol, textCol)
      .where(col("__g").isNotNull)
    val cb = tr.groupBy(col("__g").as("__bg"), col("__p").as("__bp"),
        col("__c").as("__bc"))
      .agg(count(lit(1)).as("__cb"))
    val lt = cb.groupBy(col("__bg").as("__lg"), col("__bp").as("__lp"))
      .agg(sum(col("__cb")).as("__cl"), count(lit(1)).as("__tl"))
    val rt = cb.groupBy(col("__bg").as("__rg"), col("__bc").as("__rc"))
      .agg(count(lit(1)).as("__tr"))
    val bt = cb.groupBy(col("__bg").as("__tg"))
      .agg(count(lit(1)).as("__b"), count_distinct(col("__bc")).as("__t"))
    val vc = train.select(col(groupCol).as("__vg"),
        explode(tokens(col(textCol))).as("__u"))
      .where(col("__vg").isNotNull)
      .groupBy(col("__vg"))
      .agg((count_distinct(col("__u")) + lit(1L)).as("__v"))
    val totals = bt.join(vc, col("__tg") === col("__vg"))

    val sc = transitionsBy(score, groupCol, idCol, textCol)
      .where(col("__g").isNotNull)
    val joined = sc
      // groups without a train model drop here (inner join on totals)
      .join(totals, col("__g") === col("__tg"))
      .join(cb, col("__g") === col("__bg") && col("__p") === col("__bp")
        && col("__c") === col("__bc"), "left")
      .join(lt, col("__g") === col("__lg") && col("__p") === col("__lp"), "left")
      .join(rt, col("__g") === col("__rg") && col("__c") === col("__rc"), "left")
    val p1 = (greatest(coalesce(col("__tr"), lit(0L)).cast("double") - lit(d), lit(0.0))
      + lit(d) * col("__t").cast("double") / col("__v").cast("double")) /
      col("__b").cast("double")
    val pc = when(col("__cl").isNull, p1).otherwise(
      (greatest(coalesce(col("__cb"), lit(0L)).cast("double") - lit(d), lit(0.0))
        + lit(d) * col("__tl").cast("double") * p1) / col("__cl").cast("double"))
    joined
      .select(col("__g"), col("__id"), lnQ(pc).as("__lp"))
      .groupBy(col("__g").as(groupCol), col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn("kn_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** DuckDB twin of [[knBigramLogLossBy]] — the [[knBigramLogLossSql]]
    * algebra with the group key threaded through every table. */
  def knBigramLogLossBySql(groupExpr: String, idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, d: Double = 0.75): String = {
    val p1 = ("(greatest(coalesce(rt.tr, 0)::DOUBLE - " + d + ", 0.0)"
      + s" + $d * tot.t::DOUBLE / tot.v::DOUBLE) / tot.b::DOUBLE")
    (s"WITH trd AS (SELECT $groupExpr AS g, string_split($textExpr, ' ') AS w"
      + s" FROM $trainFrom WHERE $textExpr IS NOT NULL AND $groupExpr IS NOT NULL),"
      + " trt AS (SELECT g, unnest([w[i] for i in range(1, len(w))]) AS p,"
      + " unnest([w[i+1] for i in range(1, len(w))]) AS c FROM trd WHERE len(w) >= 2),"
      + " cb AS (SELECT g, p, c, count(*)::BIGINT AS cb FROM trt GROUP BY 1, 2, 3),"
      + " lt AS (SELECT g, p, sum(cb)::BIGINT AS cl, count(*)::BIGINT AS tl FROM cb GROUP BY 1, 2),"
      + " rt AS (SELECT g, c, count(*)::BIGINT AS tr FROM cb GROUP BY 1, 2),"
      + " bt AS (SELECT g, count(*)::BIGINT AS b, count(DISTINCT c)::BIGINT AS t FROM cb GROUP BY 1),"
      + " vc AS (SELECT g, (count(DISTINCT u) + 1)::BIGINT AS v FROM"
      + " (SELECT g, unnest(w) AS u FROM trd) GROUP BY 1),"
      + " tot AS (SELECT bt.g, bt.b, bt.t, vc.v FROM bt JOIN vc ON bt.g = vc.g),"
      + s" scd AS (SELECT $groupExpr AS g, $idExpr AS id, string_split($textExpr, ' ') AS w"
      + s" FROM $scoreFrom WHERE $textExpr IS NOT NULL AND $groupExpr IS NOT NULL),"
      + " sct AS (SELECT g, id, unnest([w[i] for i in range(1, len(w))]) AS p,"
      + " unnest([w[i+1] for i in range(1, len(w))]) AS c FROM scd WHERE len(w) >= 2),"
      + " pr AS (SELECT sct.g, sct.id,"
      + s" CASE WHEN lt.cl IS NULL THEN $p1"
      + s" ELSE (greatest(coalesce(cb.cb, 0)::DOUBLE - $d, 0.0)"
      + s" + $d * lt.tl::DOUBLE * $p1) / lt.cl::DOUBLE END AS p"
      + " FROM sct JOIN tot ON sct.g = tot.g"
      + " LEFT JOIN cb ON sct.g = cb.g AND sct.p = cb.p AND sct.c = cb.c"
      + " LEFT JOIN lt ON sct.g = lt.g AND sct.p = lt.p"
      + " LEFT JOIN rt ON sct.g = rt.g AND sct.c = rt.c),"
      + " sc AS (SELECT g, id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT g AS $groupExpr, id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + " -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS kn_loss"
      + " FROM sc GROUP BY 1, 2 ORDER BY 1, 2")
  }

  /** (id, u, v, w) trigram rows of every ≥3-token document. */
  private def transitions3(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
      .where(size(col("__w")) >= 3)
      .select(col("__id"), explode(transform(
        sequence(lit(0), size(col("__w")) - 3),
        i => struct(element_at(col("__w"), i + 1).as("u"),
          element_at(col("__w"), i + 2).as("v"),
          element_at(col("__w"), i + 3).as("w")))).as("__t"))
      .select(col("__id"), col("__t.u").as("__u"), col("__t.v").as("__v"),
        col("__t.w").as("__tw"))

  /** TRIGRAM interpolated Kneser-Ney — [[knBigramLogLoss]] at the
    * n-gram depth production perplexity filters actually run (CCNet
    * ships a 5-gram KenLM; the trigram shows the full Chen-Goodman
    * recursion, which higher orders repeat mechanically):
    *
    *   p3(w|uv) = (max(c(uvw)−D,0) + D·N1+(uv·)·p2(w|v)) / c(uv·)
    *   p2(w|v)  = (max(N1+(·vw)−D,0) + D·N1+(v·)·p1(w)) / N1+(·v·)
    *   p1(w)    = (max(N1+(··w)−D,0) + D·T/V) / B
    *
    * with every lower level built from the level ABOVE's TYPE table
    * (the Kneser-Ney continuation-count construction): N1+(·vw) counts
    * distinct u with c(uvw)>0; N1+(··w) counts distinct v in the
    * (v,w) projection; B = |distinct (v,w)|, T = |distinct w| there,
    * V = train unigram vocab + 1. Unseen (u,v) context backs off to
    * p2, unseen v to p1, unseen w to the uniform floor — every
    * probability strictly positive. Score docs need ≥3 tokens
    * (n_trans = n−2); shorter/NULL docs are absent.
    *
    * Same determinism scheme and plan shape as the bigram form: exact
    * integer count tables (hash aggs, map-side combined), one-row
    * broadcast scalars, score trigrams LEFT-joining five tables on
    * token keys, quantized-ln exact decimal sums. */
  def knTrigramLogLoss(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    val tr = transitions3(train, textCol, textCol)
    val c3 = tr.groupBy(col("__u").as("__3u"), col("__v").as("__3v"),
        col("__tw").as("__3w"))
      .agg(count(lit(1)).as("__c3"))
    require(c3.limit(1).count() == 1L,
      "knTrigramLogLoss: train corpus has no trigrams (every doc <3 tokens)")
    val l3 = c3.groupBy(col("__3u").as("__lu"), col("__3v").as("__lv"))
      .agg(sum(col("__c3")).as("__c3ctx"), count(lit(1)).as("__t3"))
    // continuation level: the (v,w) projection of the trigram TYPE table
    val c2 = c3.groupBy(col("__3v").as("__2v"), col("__3w").as("__2w"))
      .agg(count(lit(1)).as("__c2"))
    val l2 = c2.groupBy(col("__2v").as("__mv"))
      .agg(sum(col("__c2")).as("__c2ctx"), count(lit(1)).as("__t2"))
    val c1 = c2.groupBy(col("__2w").as("__1w")).agg(count(lit(1)).as("__c1"))
    val bt = c2.agg(count(lit(1)).as("__b"), count_distinct(col("__2w")).as("__t"))
    val vc = train.select(explode(tokens(col(textCol))).as("__uni"))
      .agg((count_distinct(col("__uni")) + lit(1L)).as("__vv"))
    val totals = bt.crossJoin(vc)

    val sc = transitions3(score, idCol, textCol)
    val joined = sc
      .join(c3, col("__u") === col("__3u") && col("__v") === col("__3v")
        && col("__tw") === col("__3w"), "left")
      .join(l3, col("__u") === col("__lu") && col("__v") === col("__lv"), "left")
      .join(c2, col("__v") === col("__2v") && col("__tw") === col("__2w"), "left")
      .join(l2, col("__v") === col("__mv"), "left")
      .join(c1, col("__tw") === col("__1w"), "left")
      .crossJoin(broadcast(totals))
    val p1 = (greatest(coalesce(col("__c1"), lit(0L)).cast("double") - lit(d), lit(0.0))
      + lit(d) * col("__t").cast("double") / col("__vv").cast("double")) /
      col("__b").cast("double")
    val p2 = when(col("__c2ctx").isNull, p1).otherwise(
      (greatest(coalesce(col("__c2"), lit(0L)).cast("double") - lit(d), lit(0.0))
        + lit(d) * col("__t2").cast("double") * p1) / col("__c2ctx").cast("double"))
    val p3 = when(col("__c3ctx").isNull, p2).otherwise(
      (greatest(coalesce(col("__c3"), lit(0L)).cast("double") - lit(d), lit(0.0))
        + lit(d) * col("__t3").cast("double") * p2) / col("__c3ctx").cast("double"))
    joined
      .select(col("__id"), lnQ(p3).as("__lp"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn("kn3_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** DuckDB twin of [[knTrigramLogLoss]] — the same five count tables
    * and the three-level probability expression, token for token. */
  def knTrigramLogLossSql(idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, d: Double = 0.75): String = {
    val p1 = ("(greatest(coalesce(c1.c1, 0)::DOUBLE - " + d + ", 0.0)"
      + s" + $d * tot.t::DOUBLE / tot.v::DOUBLE) / tot.b::DOUBLE")
    val p2 = (s"CASE WHEN l2.c2ctx IS NULL THEN $p1"
      + s" ELSE (greatest(coalesce(c2.c2, 0)::DOUBLE - $d, 0.0)"
      + s" + $d * l2.t2::DOUBLE * $p1) / l2.c2ctx::DOUBLE END")
    (s"WITH trd AS (SELECT string_split($textExpr, ' ') AS w FROM $trainFrom"
      + s" WHERE $textExpr IS NOT NULL),"
      + " trt AS (SELECT unnest([w[i] for i in range(1, len(w) - 1)]) AS u,"
      + " unnest([w[i+1] for i in range(1, len(w) - 1)]) AS v,"
      + " unnest([w[i+2] for i in range(1, len(w) - 1)]) AS tw"
      + " FROM trd WHERE len(w) >= 3),"
      + " c3 AS (SELECT u, v, tw, count(*)::BIGINT AS c3 FROM trt GROUP BY 1, 2, 3),"
      + " l3 AS (SELECT u, v, sum(c3)::BIGINT AS c3ctx, count(*)::BIGINT AS t3"
      + " FROM c3 GROUP BY 1, 2),"
      + " c2 AS (SELECT v, tw, count(*)::BIGINT AS c2 FROM c3 GROUP BY 1, 2),"
      + " l2 AS (SELECT v, sum(c2)::BIGINT AS c2ctx, count(*)::BIGINT AS t2"
      + " FROM c2 GROUP BY 1),"
      + " c1 AS (SELECT tw, count(*)::BIGINT AS c1 FROM c2 GROUP BY 1),"
      + " tot AS (SELECT count(*)::BIGINT AS b, count(DISTINCT tw)::BIGINT AS t,"
      + " (SELECT count(DISTINCT uni) + 1 FROM (SELECT unnest(w) AS uni FROM trd))::BIGINT AS v"
      + " FROM c2),"
      + s" scd AS (SELECT $idExpr AS id, string_split($textExpr, ' ') AS w FROM $scoreFrom"
      + s" WHERE $textExpr IS NOT NULL),"
      + " sct AS (SELECT id, unnest([w[i] for i in range(1, len(w) - 1)]) AS u,"
      + " unnest([w[i+1] for i in range(1, len(w) - 1)]) AS v,"
      + " unnest([w[i+2] for i in range(1, len(w) - 1)]) AS tw"
      + " FROM scd WHERE len(w) >= 3),"
      + " pr AS (SELECT sct.id,"
      + s" CASE WHEN l3.c3ctx IS NULL THEN $p2"
      + s" ELSE (greatest(coalesce(c3.c3, 0)::DOUBLE - $d, 0.0)"
      + s" + $d * l3.t3::DOUBLE * ($p2)) / l3.c3ctx::DOUBLE END AS p"
      + " FROM sct LEFT JOIN c3 ON sct.u = c3.u AND sct.v = c3.v AND sct.tw = c3.tw"
      + " LEFT JOIN l3 ON sct.u = l3.u AND sct.v = l3.v"
      + " LEFT JOIN c2 ON sct.v = c2.v AND sct.tw = c2.tw"
      + " LEFT JOIN l2 ON sct.v = l2.v"
      + " LEFT JOIN c1 ON sct.tw = c1.tw CROSS JOIN tot),"
      + " sc AS (SELECT id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + " -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS kn3_loss"
      + " FROM sc GROUP BY 1 ORDER BY 1")
  }

  /** DuckDB twin of [[knBigramLogLoss]] — same discount literal, same
    * count tables, same fixed-shape probability expression, same
    * quantized-ln decimal sum. `trainFrom`/`scoreFrom` are FROM-clause
    * bodies (table name or parenthesized subquery). */
  def knBigramLogLossSql(idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, d: Double = 0.75): String = {
    val p1 = ("(greatest(coalesce(rt.tr, 0)::DOUBLE - " + d + ", 0.0)"
      + s" + $d * tot.t::DOUBLE / tot.v::DOUBLE) / tot.b::DOUBLE")
    (s"WITH trd AS (SELECT string_split($textExpr, ' ') AS w FROM $trainFrom"
      + s" WHERE $textExpr IS NOT NULL),"
      + " trt AS (SELECT unnest([w[i] for i in range(1, len(w))]) AS p,"
      + " unnest([w[i+1] for i in range(1, len(w))]) AS c FROM trd WHERE len(w) >= 2),"
      + " cb AS (SELECT p, c, count(*)::BIGINT AS cb FROM trt GROUP BY 1, 2),"
      + " lt AS (SELECT p, sum(cb)::BIGINT AS cl, count(*)::BIGINT AS tl FROM cb GROUP BY 1),"
      + " rt AS (SELECT c, count(*)::BIGINT AS tr FROM cb GROUP BY 1),"
      + " tot AS (SELECT count(*)::BIGINT AS b, count(DISTINCT c)::BIGINT AS t,"
      + " (SELECT count(DISTINCT u) + 1 FROM (SELECT unnest(w) AS u FROM trd))::BIGINT AS v"
      + " FROM cb),"
      + s" scd AS (SELECT $idExpr AS id, string_split($textExpr, ' ') AS w FROM $scoreFrom"
      + s" WHERE $textExpr IS NOT NULL),"
      + " sct AS (SELECT id, unnest([w[i] for i in range(1, len(w))]) AS p,"
      + " unnest([w[i+1] for i in range(1, len(w))]) AS c FROM scd WHERE len(w) >= 2),"
      + " pr AS (SELECT sct.id,"
      + s" CASE WHEN lt.cl IS NULL THEN $p1"
      + s" ELSE (greatest(coalesce(cb.cb, 0)::DOUBLE - $d, 0.0)"
      + s" + $d * lt.tl::DOUBLE * $p1) / lt.cl::DOUBLE END AS p"
      + " FROM sct LEFT JOIN cb ON sct.p = cb.p AND sct.c = cb.c"
      + " LEFT JOIN lt ON sct.p = lt.p LEFT JOIN rt ON sct.c = rt.c CROSS JOIN tot),"
      + " sc AS (SELECT id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + " -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS kn_loss"
      + " FROM sc GROUP BY 1 ORDER BY 1")
  }

  /** (id, __g1..__gn) order-n gram rows of every ≥n-token document. */
  private def transitionsN(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("__id"), tokens(col(textCol)).as("__w"))
      .where(size(col("__w")) >= n)
      .select(col("__id"), explode(transform(
        sequence(lit(0), size(col("__w")) - n),
        i => struct((1 to n).map(j =>
          element_at(col("__w"), i + j).as(s"g$j")): _*))).as("__t"))
      .select(col("__id") +: (1 to n).map(j =>
        col(s"__t.g$j").as(s"__g$j")): _*)

  /** ORDER-N interpolated Kneser-Ney — [[knTrigramLogLoss]]'s recursion
    * generalized to arbitrary depth (VERDICT r11 #2: CCNet ships a
    * 5-gram KenLM; `knNgramLogLoss(..., order = 5)` is that depth).
    * The Chen-Goodman tower, every lower level built from the level
    * ABOVE's TYPE table (the continuation-count construction — level
    * k−1's table counts distinct leftmost extensions of level k's
    * types):
    *
    *   p_k(w|h_k) = (max(c_k(h_k w)−D,0) + D·N1+(h_k ·)·p_{k−1}) / c_k(h_k ·)
    *                for k = order..2, backing off to p_{k−1} on an
    *                unseen level-k context
    *   p1(w)      = (max(N1+(··w)−D,0) + D·T/V) / B
    *
    * with B/T taken from the LEVEL-2 type table and V = train unigram
    * vocab + 1 — exactly the bigram/trigram forms at order 2/3
    * (LanguageModelSpec pins both equalities row for row). Score docs
    * need ≥order tokens (n_trans = n−order+1); shorter/NULL docs are
    * absent. Output column `kn{order}_loss`.
    *
    * Plan shape unchanged by depth: 2·order−1 vocabulary-bounded count
    * tables (hash aggs, map-side combined, each derived from the one
    * above — the whole tower is ONE pass over train transitions plus
    * type-table-sized regroups), one-row broadcast scalars, score rows
    * LEFT-joining the tables on token keys. Depth adds joins against
    * strictly SHRINKING tables, never another corpus scan. */
  def knNgramLogLoss(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      order: Int,
      d: Double = 0.75): DataFrame = {
    require(order >= 2, s"knNgramLogLoss needs order >= 2 (got $order)")
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    val n = order
    val tr = transitionsN(train, textCol, textCol, n)
    // level-n raw counts; level k's keys are the LAST k gram positions
    val top = tr
      .groupBy((1 to n).map(j => col(s"__g$j").as(s"__c${n}k$j")): _*)
      .agg(count(lit(1)).as(s"__cnt$n"))
    require(top.limit(1).count() == 1L,
      s"knNgramLogLoss: train corpus has no $n-grams (every doc <$n tokens)")
    val vc = train.select(explode(tokens(col(textCol))).as("__uni"))
      .agg((count_distinct(col("__uni")) + lit(1L)).as("__vv"))
    knNgramScoreFrom(top, vc, score, idCol, textCol, n, d)
  }

  /** The KN tower + scoring from the level-n raw count table and the
    * one-row V scalar — shared by [[knNgramLogLoss]] (from-scratch fit)
    * and [[knNgramLogLossFromState]] (merged daily state): every lower
    * level derives from the level above, so the top table IS the
    * sufficient statistic. */
  private def knNgramScoreFrom(
      topCounts: DataFrame,
      vc: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      d: Double): DataFrame = {
    var cks = Map(n -> topCounts)
    var lks = Map.empty[Int, DataFrame]
    for (k <- n to 2 by -1) {
      lks += k -> cks(k)
        .groupBy((1 until k).map(j => col(s"__c${k}k$j").as(s"__l${k}k$j")): _*)
        .agg(sum(col(s"__cnt$k")).as(s"__ctx$k"), count(lit(1)).as(s"__t$k"))
      if (k > 2)
        // continuation types: distinct leftmost extensions of level k
        cks += (k - 1) -> cks(k)
          .groupBy((2 to k).map(j =>
            col(s"__c${k}k$j").as(s"__c${k - 1}k${j - 1}")): _*)
          .agg(count(lit(1)).as(s"__cnt${k - 1}"))
    }
    val c1 = cks(2).groupBy(col("__c2k2").as("__c1k1"))
      .agg(count(lit(1)).as("__cnt1"))
    val bt = cks(2).agg(count(lit(1)).as("__b"),
      count_distinct(col("__c2k2")).as("__t"))
    val totals = bt.crossJoin(vc)

    val sc = transitionsN(score, idCol, textCol, n)
    // score gram j aligns with level-k key j at offset n-k
    var joined = sc
    for (k <- n to 2 by -1) {
      joined = joined
        .join(cks(k), (1 to k).map(j =>
          col(s"__g${n - k + j}") === col(s"__c${k}k$j")).reduce(_ && _), "left")
        .join(lks(k), (1 until k).map(j =>
          col(s"__g${n - k + j}") === col(s"__l${k}k$j")).reduce(_ && _), "left")
    }
    joined = joined
      .join(c1, col(s"__g$n") === col("__c1k1"), "left")
      .crossJoin(broadcast(totals))
    var p = (greatest(coalesce(col("__cnt1"), lit(0L)).cast("double") - lit(d),
      lit(0.0)) + lit(d) * col("__t").cast("double") / col("__vv").cast("double")) /
      col("__b").cast("double")
    // LINEAR-TREE backoff: the naive when(null, p).otherwise(..p..)
    // embeds p TWICE per level — 2^(order-1) copies of the unigram
    // subtree, and Catalyst planning of the duplicated tree cost more
    // than the query's data at order 5 (BENCH_NOTES r12 receipt). The
    // (A + B·p)/C form references p ONCE per level and is BIT-IDENTICAL:
    // the null-context branch sets A=0, B=1, C=1, and adding +0.0,
    // multiplying by 1.0, and dividing by 1.0 are exact IEEE identities
    // on a strictly positive p; the non-null branch keeps the original
    // grouping ((d·t)·p — lit(d)*col(t)*p was already left-associated).
    for (k <- 2 to n) {
      val ctxNull = col(s"__ctx$k").isNull
      val a = when(ctxNull, lit(0.0)).otherwise(
        greatest(coalesce(col(s"__cnt$k"), lit(0L)).cast("double") - lit(d),
          lit(0.0)))
      val b = when(ctxNull, lit(1.0)).otherwise(
        lit(d) * col(s"__t$k").cast("double"))
      val c = when(ctxNull, lit(1.0)).otherwise(col(s"__ctx$k").cast("double"))
      p = (a + b * p) / c
    }
    joined
      .select(col("__id"), lnQ(p).as("__lp"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn(s"kn${n}_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** DuckDB twin of [[knNgramLogLoss]] — the tower generated at the same
    * depth, token for token (nested CASE backoff, type tables derived
    * level from level). */
  def knNgramLogLossSql(idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, order: Int,
      d: Double = 0.75): String = {
    require(order >= 2, s"knNgramLogLossSql needs order >= 2 (got $order)")
    val n = order
    def gramSelect = (1 to n).map(j =>
      s"unnest([w[i+${j - 1}] for i in range(1, len(w) - ${n - 2})]) AS g$j")
      .mkString(", ")
    val levelCtes = (n to 2 by -1).flatMap { k =>
      val ck =
        if (k == n)
          (s"c$n AS (SELECT " + (1 to n).map(j => s"g$j AS k$j").mkString(", ")
            + s", count(*)::BIGINT AS cnt FROM trt GROUP BY "
            + (1 to n).mkString(", ") + ")")
        else
          (s"c$k AS (SELECT " + (2 to k + 1).map(j => s"k$j AS k${j - 1}")
            .mkString(", ") + s", count(*)::BIGINT AS cnt FROM c${k + 1}"
            + " GROUP BY " + (1 to k).mkString(", ") + ")")
      val lk = (s"l$k AS (SELECT " + (1 until k).map(j => s"k$j").mkString(", ")
        + s", sum(cnt)::BIGINT AS ctx, count(*)::BIGINT AS t FROM c$k GROUP BY "
        + (1 until k).mkString(", ") + ")")
      Seq(ck, lk)
    }
    val c1 = "c1 AS (SELECT k2 AS k1, count(*)::BIGINT AS cnt FROM c2 GROUP BY 1)"
    val tot = ("tot AS (SELECT count(*)::BIGINT AS b,"
      + " count(DISTINCT k2)::BIGINT AS t,"
      + " (SELECT count(DISTINCT u) + 1 FROM (SELECT unnest(w) AS u FROM trd))::BIGINT AS v"
      + " FROM c2)")
    val joins = (n to 2 by -1).map { k =>
      val onC = (1 to k).map(j => s"sct.g${n - k + j} = c$k.k$j").mkString(" AND ")
      val onL = (1 until k).map(j => s"sct.g${n - k + j} = l$k.k$j").mkString(" AND ")
      s" LEFT JOIN c$k ON $onC LEFT JOIN l$k ON $onL"
    }.mkString("") + s" LEFT JOIN c1 ON sct.g$n = c1.k1 CROSS JOIN tot"
    var p = (s"(greatest(coalesce(c1.cnt, 0)::DOUBLE - $d, 0.0)"
      + s" + $d * tot.t::DOUBLE / tot.v::DOUBLE) / tot.b::DOUBLE")
    // linear-tree backoff — the (A + B·p)/C form of the Spark side,
    // token for token (see knNgramLogLoss: bit-identical to the nested
    // CASE, one p reference per level)
    for (k <- 2 to n)
      p = (s"((CASE WHEN l$k.ctx IS NULL THEN 0.0"
        + s" ELSE greatest(coalesce(c$k.cnt, 0)::DOUBLE - $d, 0.0) END"
        + s" + CASE WHEN l$k.ctx IS NULL THEN 1.0"
        + s" ELSE $d * l$k.t::DOUBLE END * ($p))"
        + s" / CASE WHEN l$k.ctx IS NULL THEN 1.0 ELSE l$k.ctx::DOUBLE END)")
    (s"WITH trd AS (SELECT string_split($textExpr, ' ') AS w FROM $trainFrom"
      + s" WHERE $textExpr IS NOT NULL),"
      + s" trt AS (SELECT $gramSelect FROM trd WHERE len(w) >= $n),"
      + levelCtes.mkString(" ", ", ", ",")
      + s" $c1, $tot,"
      + s" scd AS (SELECT $idExpr AS id, string_split($textExpr, ' ') AS w"
      + s" FROM $scoreFrom WHERE $textExpr IS NOT NULL),"
      + s" sct AS (SELECT id, $gramSelect FROM scd WHERE len(w) >= $n),"
      + s" pr AS (SELECT sct.id, $p AS p FROM sct$joins),"
      + " sc AS (SELECT id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + s" -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS kn${n}_loss"
      + " FROM sc GROUP BY 1 ORDER BY 1")
  }

  /** Grouped twin of [[knNgramLogLoss]] (r13, completing the grouped
    * matrix: bigram KN ([[knBigramLogLossBy]]) and order-N SB
    * ([[sbNgramLogLossBy]]) both had per-group forms; CCNet's actual
    * deployment is a per-language 5-gram KN): one independent
    * Chen-Goodman tower PER GROUP, every level's count/type table and
    * the (B, T, V) scalars carrying the group key — one
    * hash-partitioned plan, no driver loop. Score docs whose group has
    * no train n-grams are ABSENT (no model — the inner join on the
    * per-group totals), as are <order-token/NULL docs and NULL-group
    * rows. Output (groupCol, idCol, n_trans, kn{order}_loss). */
  def knNgramLogLossBy(
      train: DataFrame,
      score: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      order: Int,
      d: Double = 0.75): DataFrame = {
    require(order >= 2, s"knNgramLogLossBy needs order >= 2 (got $order)")
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    val n = order
    val tr = transitionsNBy(train, groupCol, textCol, textCol, n)
    var cks = Map.empty[Int, DataFrame]
    var lks = Map.empty[Int, DataFrame]
    cks += n -> tr
      .groupBy(col("__g").as(s"__cg$n") +:
        (1 to n).map(j => col(s"__g$j").as(s"__c${n}k$j")): _*)
      .agg(count(lit(1)).as(s"__cnt$n"))
    for (k <- n to 2 by -1) {
      lks += k -> cks(k)
        .groupBy(col(s"__cg$k").as(s"__lg$k") +:
          (1 until k).map(j => col(s"__c${k}k$j").as(s"__l${k}k$j")): _*)
        .agg(sum(col(s"__cnt$k")).as(s"__ctx$k"), count(lit(1)).as(s"__t$k"))
      if (k > 2)
        cks += (k - 1) -> cks(k)
          .groupBy(col(s"__cg$k").as(s"__cg${k - 1}") +:
            (2 to k).map(j =>
              col(s"__c${k}k$j").as(s"__c${k - 1}k${j - 1}")): _*)
          .agg(count(lit(1)).as(s"__cnt${k - 1}"))
    }
    val c1 = cks(2).groupBy(col("__cg2").as("__cg1"),
        col("__c2k2").as("__c1k1"))
      .agg(count(lit(1)).as("__cnt1"))
    val bt = cks(2).groupBy(col("__cg2").as("__tg"))
      .agg(count(lit(1)).as("__b"), count_distinct(col("__c2k2")).as("__t"))
    val vc = train.select(col(groupCol).as("__vg"),
        explode(tokens(col(textCol))).as("__uni"))
      .where(col("__vg").isNotNull)
      .groupBy(col("__vg"))
      .agg((count_distinct(col("__uni")) + lit(1L)).as("__vv"))
    val totals = bt.join(vc, col("__tg") === col("__vg"))

    val sc = transitionsNBy(score, groupCol, idCol, textCol, n)
    var joined = sc
      // groups without a train model drop here (inner join on totals)
      .join(totals, col("__g") === col("__tg"))
    for (k <- n to 2 by -1) {
      joined = joined
        .join(cks(k), (col("__g") === col(s"__cg$k")) +: (1 to k).map(j =>
          col(s"__g${n - k + j}") === col(s"__c${k}k$j")) reduce (_ && _), "left")
        .join(lks(k), (col("__g") === col(s"__lg$k")) +: (1 until k).map(j =>
          col(s"__g${n - k + j}") === col(s"__l${k}k$j")) reduce (_ && _), "left")
    }
    joined = joined
      .join(c1, col("__g") === col("__cg1")
        && col(s"__g$n") === col("__c1k1"), "left")
    var p = (greatest(coalesce(col("__cnt1"), lit(0L)).cast("double") - lit(d),
      lit(0.0)) + lit(d) * col("__t").cast("double") / col("__vv").cast("double")) /
      col("__b").cast("double")
    // the knNgramLogLoss linear-tree backoff, token for token
    for (k <- 2 to n) {
      val ctxNull = col(s"__ctx$k").isNull
      val a = when(ctxNull, lit(0.0)).otherwise(
        greatest(coalesce(col(s"__cnt$k"), lit(0L)).cast("double") - lit(d),
          lit(0.0)))
      val b = when(ctxNull, lit(1.0)).otherwise(
        lit(d) * col(s"__t$k").cast("double"))
      val c = when(ctxNull, lit(1.0)).otherwise(col(s"__ctx$k").cast("double"))
      p = (a + b * p) / c
    }
    joined
      .select(col("__g"), col("__id"), lnQ(p).as("__lp"))
      .groupBy(col("__g").as(groupCol), col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn(s"kn${n}_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** DuckDB twin of [[knNgramLogLossBy]] — [[knNgramLogLossSql]] with
    * the group key threaded through every table. */
  def knNgramLogLossBySql(groupExpr: String, idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, order: Int,
      d: Double = 0.75): String = {
    require(order >= 2, s"knNgramLogLossBySql needs order >= 2 (got $order)")
    val n = order
    def gramSelect = (1 to n).map(j =>
      s"unnest([w[i+${j - 1}] for i in range(1, len(w) - ${n - 2})]) AS g$j")
      .mkString(", ")
    val levelCtes = (n to 2 by -1).flatMap { k =>
      val ck =
        if (k == n)
          (s"c$n AS (SELECT g, " + (1 to n).map(j => s"g$j AS k$j").mkString(", ")
            + s", count(*)::BIGINT AS cnt FROM trt GROUP BY "
            + (1 to n + 1).mkString(", ") + ")")
        else
          (s"c$k AS (SELECT g, " + (2 to k + 1).map(j => s"k$j AS k${j - 1}")
            .mkString(", ") + s", count(*)::BIGINT AS cnt FROM c${k + 1}"
            + " GROUP BY " + (1 to k + 1).mkString(", ") + ")")
      val lk = (s"l$k AS (SELECT g, " + (1 until k).map(j => s"k$j").mkString(", ")
        + s", sum(cnt)::BIGINT AS ctx, count(*)::BIGINT AS t FROM c$k GROUP BY "
        + (1 to k).mkString(", ") + ")")
      Seq(ck, lk)
    }
    val c1 = ("c1 AS (SELECT g, k2 AS k1, count(*)::BIGINT AS cnt FROM c2"
      + " GROUP BY 1, 2)")
    val tot = ("tot AS (SELECT b.g, b.b, b.t, v.v FROM"
      + " (SELECT g, count(*)::BIGINT AS b, count(DISTINCT k2)::BIGINT AS t"
      + " FROM c2 GROUP BY 1) b JOIN"
      + " (SELECT g, (count(DISTINCT u) + 1)::BIGINT AS v FROM"
      + " (SELECT g, unnest(w) AS u FROM trd) GROUP BY 1) v ON b.g = v.g)")
    val joins = (n to 2 by -1).map { k =>
      val onC = (s"sct.g = c$k.g AND "
        + (1 to k).map(j => s"sct.g${n - k + j} = c$k.k$j").mkString(" AND "))
      val onL = (s"sct.g = l$k.g AND "
        + (1 until k).map(j => s"sct.g${n - k + j} = l$k.k$j").mkString(" AND "))
      s" LEFT JOIN c$k ON $onC LEFT JOIN l$k ON $onL"
    }.mkString("") + (s" LEFT JOIN c1 ON sct.g = c1.g AND sct.g$n = c1.k1"
      + " JOIN tot ON sct.g = tot.g")
    var p = (s"(greatest(coalesce(c1.cnt, 0)::DOUBLE - $d, 0.0)"
      + s" + $d * tot.t::DOUBLE / tot.v::DOUBLE) / tot.b::DOUBLE")
    for (k <- 2 to n)
      p = (s"((CASE WHEN l$k.ctx IS NULL THEN 0.0"
        + s" ELSE greatest(coalesce(c$k.cnt, 0)::DOUBLE - $d, 0.0) END"
        + s" + CASE WHEN l$k.ctx IS NULL THEN 1.0"
        + s" ELSE $d * l$k.t::DOUBLE END * ($p))"
        + s" / CASE WHEN l$k.ctx IS NULL THEN 1.0 ELSE l$k.ctx::DOUBLE END)")
    (s"WITH trd AS (SELECT $groupExpr AS g, string_split($textExpr, ' ') AS w"
      + s" FROM $trainFrom WHERE $textExpr IS NOT NULL AND $groupExpr IS NOT NULL),"
      + s" trt AS (SELECT g, $gramSelect FROM trd WHERE len(w) >= $n),"
      + levelCtes.mkString(" ", ", ", ",")
      + s" $c1, $tot,"
      + s" scd AS (SELECT $groupExpr AS g, $idExpr AS id,"
      + s" string_split($textExpr, ' ') AS w"
      + s" FROM $scoreFrom WHERE $textExpr IS NOT NULL AND $groupExpr IS NOT NULL),"
      + s" sct AS (SELECT g, id, $gramSelect FROM scd WHERE len(w) >= $n),"
      + s" pr AS (SELECT sct.g, sct.id, $p AS p FROM sct$joins),"
      + " sc AS (SELECT g, id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT g AS $groupExpr, id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + s" -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS kn${n}_loss"
      + " FROM sc GROUP BY 1, 2 ORDER BY 1, 2")
  }

  /** MERGEABLE ORDER-N KN model state (VERDICT r12 #4, generalizing
    * [[KnBigramState]]): the ONLY corpus-sized derivations in
    * [[knNgramLogLoss]] are the level-n raw gram counts and the unigram
    * counts — exact integer sums, associative/commutative — and EVERY
    * lower level of the Chen-Goodman tower is a type-table regroup of
    * the level above, so (n-gram, cnt) + (unigram, cnt) is the complete
    * sufficient statistic at any depth. A daily pipeline folds each
    * day's text once, merges by union+regroup, and finalize ≡
    * from-scratch fit on the union EXACTLY (q_kn5_state shares
    * q_kn5_loss's oracle SQL verbatim). */
  final case class KnNgramState(order: Int, grams: DataFrame, unigrams: DataFrame)

  /** Fold a train frame ONCE into its order-n mergeable state: exact
    * (g1..gn, cnt) gram counts and (u, cnt) unigram counts. */
  def knNgramState(train: DataFrame, textCol: String, order: Int): KnNgramState = {
    require(order >= 2, s"knNgramState needs order >= 2 (got $order)")
    KnNgramState(order,
      transitionsN(train, textCol, textCol, order)
        .groupBy((1 to order).map(j => col(s"__g$j")): _*)
        .agg(count(lit(1)).as("__cnt")),
      train.select(explode(tokens(col(textCol))).as("__u"))
        .groupBy(col("__u")).agg(count(lit(1)).as("__ucnt")))
  }

  /** Merge two order-n states: per-table union + regroup — the
    * integer-sum fold, order-invariant by associativity. */
  def mergeKnNgramStates(a: KnNgramState, b: KnNgramState): KnNgramState = {
    require(a.order == b.order,
      s"cannot merge KN states of different orders (${a.order} vs ${b.order})")
    KnNgramState(a.order,
      a.grams.unionByName(b.grams)
        .groupBy((1 to a.order).map(j => col(s"__g$j")): _*)
        .agg(sum(col("__cnt")).as("__cnt")),
      a.unigrams.unionByName(b.unigrams)
        .groupBy(col("__u")).agg(sum(col("__ucnt")).as("__ucnt")))
  }

  /** Score under a merged state — re-derives the whole tower from the
    * state's top table ([[knNgramScoreFrom]], the same code path the
    * from-scratch fit runs), bit-identical to [[knNgramLogLoss]] on the
    * concatenated corpus. */
  def knNgramLogLossFromState(
      state: KnNgramState,
      score: DataFrame,
      idCol: String,
      textCol: String,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    val n = state.order
    // localCheckpoint the merged tables before deriving the tower — the
    // knBigramFromState convention: every tower level re-reads the top
    // table, so an un-materialized merge tree would re-execute the whole
    // state union per level (measured: 55 shuffles vs the from-scratch
    // fit's 27 in the q_kn5_state plan before this)
    val top = state.grams.select(
      (1 to n).map(j => col(s"__g$j").as(s"__c${n}k$j"))
        :+ col("__cnt").as(s"__cnt$n"): _*)
      .localCheckpoint()
    require(top.limit(1).count() == 1L,
      s"knNgramLogLossFromState: state holds no $n-grams")
    val vc = state.unigrams.agg((count(lit(1)) + lit(1L)).as("__vv"))
      .localCheckpoint()
    knNgramScoreFrom(top, vc, score, idCol, textCol, n, d)
  }

  /** Persist/reload the order-n state (the [[writeKnState]] at-rest
    * shape + an `order` meta row so a reload cannot silently mis-depth). */
  def writeKnNgramState(state: KnNgramState, dir: String): Unit = {
    val s = state.grams.sparkSession
    import s.implicits._
    state.grams.write.mode("overwrite").parquet(s"$dir/grams")
    state.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    Seq(state.order).toDF("order").write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readKnNgramState(spark: org.apache.spark.sql.SparkSession,
      dir: String): KnNgramState =
    KnNgramState(
      spark.read.parquet(s"$dir/meta").head().getInt(0),
      spark.read.parquet(s"$dir/grams"),
      spark.read.parquet(s"$dir/unigrams"))

  /** MERGEABLE KN-bigram model state (VERDICT r11 #3) — the
    * [[graft.operators.AggState]] pattern applied to the fit: the ONLY
    * corpus-sized derivations in [[knBigramFit]] are the raw bigram
    * count table c(vw) and the unigram vocabulary, and both are exact
    * integer counts — associative/commutative under summation — so a
    * daily pipeline keeps (bigram, cnt) + (unigram, cnt) at rest, folds
    * each day's increment in with ONE union+regroup of
    * vocabulary-bounded tables (the day's text is scanned once, on its
    * day), and [[knBigramFromState]] re-derives the type tables
    * (lt/rt/B/T/V are TYPE counts over the merged bigram table —
    * type-table-sized regroups, no corpus rescans). finalize ≡
    * from-scratch fit on the union is exact, not approximate
    * (q_kn_state shares q_kn_loss's oracle SQL; merge-order invariance
    * and roll parity pinned in LanguageModelSpec/StreamingSpec). */
  final case class KnBigramState(bigrams: DataFrame, unigrams: DataFrame)

  /** Fold a train frame ONCE into its mergeable state: exact
    * (p, c, cnt) bigram counts and (u, cnt) unigram counts. */
  def knBigramState(train: DataFrame, textCol: String): KnBigramState = {
    val tr = transitions(train, textCol, textCol)
    KnBigramState(
      tr.groupBy(col("__p"), col("__c")).agg(count(lit(1)).as("__cnt")),
      train.select(explode(tokens(col(textCol))).as("__u"))
        .groupBy(col("__u")).agg(count(lit(1)).as("__ucnt")))
  }

  /** Merge two states: union + regroup of the two count tables — the
    * integer-sum fold, order-invariant by associativity. */
  def mergeKnStates(a: KnBigramState, b: KnBigramState): KnBigramState =
    KnBigramState(
      a.bigrams.unionByName(b.bigrams)
        .groupBy(col("__p"), col("__c")).agg(sum(col("__cnt")).as("__cnt")),
      a.unigrams.unionByName(b.unigrams)
        .groupBy(col("__u")).agg(sum(col("__ucnt")).as("__ucnt")))

  /** Finalize a state into a scoring-ready [[KnBigramModel]]: re-derive
    * the type tables from the merged bigram counts — bit-identical to
    * [[knBigramFit]] on the concatenated corpus, because every fit
    * table is a deterministic function of the raw counts. */
  def knBigramFromState(state: KnBigramState, d: Double = 0.75): KnBigramModel = {
    require(d > 0 && d < 1, s"discount d must be in (0,1) (got $d)")
    val cb = state.bigrams.select(col("__p").as("__bp"), col("__c").as("__bc"),
      col("__cnt").as("__cb"))
    require(cb.limit(1).count() == 1L,
      "knBigramFromState: state holds no bigrams — a bigram model needs" +
        " at least one bigram")
    val lt = cb.groupBy(col("__bp").as("__lp"))
      .agg(sum(col("__cb")).as("__cl"), count(lit(1)).as("__tl"))
    val rt = cb.groupBy(col("__bc").as("__rc")).agg(count(lit(1)).as("__tr"))
    val bt = cb.agg(count(lit(1)).as("__b"), count_distinct(col("__bc")).as("__t"))
    val vc = state.unigrams.agg((count(lit(1)) + lit(1L)).as("__v"))
    KnBigramModel(cb.localCheckpoint(), lt.localCheckpoint(),
      rt.localCheckpoint(),
      broadcast(bt.crossJoin(vc).localCheckpoint()), d)
  }

  /** Persist/reload the mergeable state (the AggState-at-rest shape):
    * two parquet tables under `dir` — the daily loop reads, merges the
    * day's [[knBigramState]], rewrites. */
  def writeKnState(state: KnBigramState, dir: String): Unit = {
    state.bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
    state.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
  }

  def readKnState(spark: org.apache.spark.sql.SparkSession,
      dir: String): KnBigramState =
    KnBigramState(spark.read.parquet(s"$dir/bigrams"),
      spark.read.parquet(s"$dir/unigrams"))

  /** STUPID BACKOFF n-gram scoring (Brants, Popat, Xu, Och & Dean,
    * "Large Language Models in Machine Translation", EMNLP 2007 §4) —
    * the smoothing web-scale LMs actually ship when Kneser-Ney's
    * continuation-count tables are too expensive to build at corpus
    * size. No discounting, no normalization — seen n-grams score by
    * raw relative frequency, unseen ones back off with a fixed penalty:
    *
    *   S_k(w|h) = c_k(hw) / c_k(h·)    if c_k(hw) > 0
    *            = α · S_{k−1}(w|h')    otherwise        (α = 0.4, Brants §4)
    *   S_1(w)   = c_1(w) / N           if c_1(w) > 0
    *            = 1 / N                otherwise (OOV floor: one unseen
    *                                   token-occurrence of mass; Brants
    *                                   leave OOV to the consumer — this
    *                                   floor keeps every score strictly
    *                                   positive, the kn-family contract)
    *
    * S is a SCORE, not a probability (it does not sum to 1 — Brants §4
    * note "not normalized"); `sb{order}_loss` = −mean ln S is therefore
    * a ranking signal comparable only under the same model, which is
    * exactly how the perplexity-filter deployment uses it.
    *
    * KN-family contrast (why both exist): [[knNgramLogLoss]] needs the
    * continuation TYPE tables (distinct-count regroups per level);
    * stupid backoff needs only RAW count tables — each level is one
    * hash agg, map-side combined, and the whole fit is mergeable by
    * integer summation (the [[KnBigramState]] pattern applies verbatim
    * to every level's table). Note the levels are NOT derivable from
    * the top table alone: a doc with k ≤ len < order tokens contributes
    * level-k grams but no order-grams (and every doc's last positions
    * contribute short grams only), so each level aggregates its own
    * explode of the same token arrays — `order` passes over the text
    * column at fit time, each a projection-only scan; a fit-once
    * deployment persists the count tables (the [[KnBigramModel]]
    * at-rest convention) and never rescans.
    *
    * Score docs need ≥order tokens (n_trans = n−order+1); shorter/NULL
    * docs are absent. Determinism: every score is one fixed-shape IEEE
    * expression over exact integer counts, ln-quantized and summed as
    * exact decimals ([[TextAnalysis.lnQ]]); backoff builds as the
    * LINEAR tree (A + B·S)/1 with exact identity branches (B=0 kills
    * the unused lower level exactly; A=0 passes α·S through exactly) —
    * one S reference per level, the knNgramLogLoss planning fix.
    * [[sbNgramLogLossSql]] mirrors it token for token. */
  def sbNgramLogLoss(
      train: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      order: Int,
      alpha: Double = 0.4): DataFrame = {
    require(order >= 2, s"sbNgramLogLoss needs order >= 2 (got $order)")
    require(alpha > 0 && alpha < 1, s"backoff alpha must be in (0,1) (got $alpha)")
    val n = order
    // level-k RAW counts, each from its own explode of the train text
    // (levels are not marginals of the top table — see Scaladoc)
    val cks = (2 to n).map { k =>
      k -> transitionsN(train, textCol, textCol, k)
        .groupBy((1 to k).map(j => col(s"__g$j").as(s"__s${k}k$j")): _*)
        .agg(count(lit(1)).as(s"__scnt$k"))
    }.toMap
    require(cks(n).limit(1).count() == 1L,
      s"sbNgramLogLoss: train corpus has no $n-grams (every doc <$n tokens)")
    val c1 = train.select(explode(tokens(col(textCol))).as("__s1k1"))
      .groupBy(col("__s1k1")).agg(count(lit(1)).as("__scnt1"))
    sbNgramScoreFrom(cks, c1, score, idCol, textCol, n, alpha)
  }

  /** SB scoring from the per-level raw count tables + unigram counts —
    * shared by [[sbNgramLogLoss]] (from-scratch fit) and
    * [[sbNgramLogLossFromState]] (merged daily state): context sums and
    * the N total are regroups/aggregates of the state tables. */
  private def sbNgramScoreFrom(
      cks: Map[Int, DataFrame],
      c1: DataFrame,
      score: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      alpha: Double): DataFrame = {
    // level-k context sums c_k(h·) — a regroup of the level table
    val lks = (2 to n).map { k =>
      k -> cks(k)
        .groupBy((1 until k).map(j => col(s"__s${k}k$j").as(s"__x${k}k$j")): _*)
        .agg(sum(col(s"__scnt$k")).as(s"__sctx$k"))
    }.toMap
    val totals = c1.agg(sum(col("__scnt1")).as("__nn"))

    val sc = transitionsN(score, idCol, textCol, n)
    var joined = sc
    for (k <- n to 2 by -1) {
      joined = joined
        .join(cks(k), (1 to k).map(j =>
          col(s"__g${n - k + j}") === col(s"__s${k}k$j")).reduce(_ && _), "left")
        .join(lks(k), (1 until k).map(j =>
          col(s"__g${n - k + j}") === col(s"__x${k}k$j")).reduce(_ && _), "left")
    }
    joined = joined
      .join(c1, col(s"__g$n") === col("__s1k1"), "left")
      .crossJoin(broadcast(totals))
    var sS = coalesce(col("__scnt1"), lit(1L)).cast("double") /
      col("__nn").cast("double")
    for (k <- 2 to n) {
      val seen = col(s"__scnt$k").isNotNull
      val a = when(seen, col(s"__scnt$k").cast("double") /
        col(s"__sctx$k").cast("double")).otherwise(lit(0.0))
      val b = when(seen, lit(0.0)).otherwise(lit(alpha))
      sS = a + b * sS
    }
    joined
      .select(col("__id"), lnQ(sS).as("__lp"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn(s"sb${n}_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** (id, group, g1..gn) order-n gram rows — [[transitionsN]] with the
    * group key carried; NULL-group rows drop (a NULL key names no
    * model, the [[transitionsBy]] contract). */
  private def transitionsNBy(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("__id"), col(groupCol).as("__g"),
        tokens(col(textCol)).as("__w"))
      .where(col("__g").isNotNull && size(col("__w")) >= n)
      .select(col("__id"), col("__g"), explode(transform(
        sequence(lit(0), size(col("__w")) - n),
        i => struct((1 to n).map(j =>
          element_at(col("__w"), i + j).as(s"g$j")): _*))).as("__t"))
      .select(col("__id") +: col("__g") +: (1 to n).map(j =>
        col(s"__t.g$j").as(s"__g$j")): _*)

  /** Grouped twin of [[sbNgramLogLoss]] (VERDICT r12 stretch #8 — the
    * CCNet per-language composition for the SB scorer): fit ONE
    * independent stupid-backoff model PER GROUP on `train`, score each
    * `score` document under ITS group's model. Every level's count
    * table, the context sums, and the unigram total N carry the group
    * key, so the whole fit+score is hash-partitioned by group — groups
    * parallelize, no driver loop (the [[knBigramLogLossBy]] shape).
    *
    * Group membership contract: score docs whose group has NO train
    * TOKENS are ABSENT (no model — the inner join on the per-group N
    * total); a group with tokens but no level-k grams scores through
    * backoff (α per unseen level down to the unigram/OOV floor), which
    * is exactly SB's semantics — unlike KN there is no fit table whose
    * absence is an error. <order-token / NULL docs and NULL-group rows
    * are absent as always. Output (groupCol, idCol, n_trans,
    * sb{order}_loss). */
  def sbNgramLogLossBy(
      train: DataFrame,
      score: DataFrame,
      groupCol: String,
      idCol: String,
      textCol: String,
      order: Int,
      alpha: Double = 0.4): DataFrame = {
    require(order >= 2, s"sbNgramLogLossBy needs order >= 2 (got $order)")
    require(alpha > 0 && alpha < 1, s"backoff alpha must be in (0,1) (got $alpha)")
    val n = order
    val cks = (2 to n).map { k =>
      k -> transitionsNBy(train, groupCol, textCol, textCol, k)
        .groupBy(col("__g").as(s"__sg$k") +:
          (1 to k).map(j => col(s"__g$j").as(s"__s${k}k$j")): _*)
        .agg(count(lit(1)).as(s"__scnt$k"))
    }.toMap
    val lks = (2 to n).map { k =>
      k -> cks(k)
        .groupBy(col(s"__sg$k").as(s"__xg$k") +:
          (1 until k).map(j => col(s"__s${k}k$j").as(s"__x${k}k$j")): _*)
        .agg(sum(col(s"__scnt$k")).as(s"__sctx$k"))
    }.toMap
    val c1 = train.select(col(groupCol).as("__ug"),
        explode(tokens(col(textCol))).as("__s1k1"))
      .where(col("__ug").isNotNull)
      .groupBy(col("__ug"), col("__s1k1"))
      .agg(count(lit(1)).as("__scnt1"))
    val totals = c1.groupBy(col("__ug").as("__tg"))
      .agg(sum(col("__scnt1")).as("__nn"))

    val sc = transitionsNBy(score, groupCol, idCol, textCol, n)
    var joined = sc
      // groups without train tokens drop here (inner join on totals)
      .join(totals, col("__g") === col("__tg"))
    for (k <- n to 2 by -1) {
      joined = joined
        .join(cks(k), (col("__g") === col(s"__sg$k")) +: (1 to k).map(j =>
          col(s"__g${n - k + j}") === col(s"__s${k}k$j")) reduce (_ && _), "left")
        .join(lks(k), (col("__g") === col(s"__xg$k")) +: (1 until k).map(j =>
          col(s"__g${n - k + j}") === col(s"__x${k}k$j")) reduce (_ && _), "left")
    }
    joined = joined
      .join(c1, col("__g") === col("__ug") && col(s"__g$n") === col("__s1k1"),
        "left")
    var sS = coalesce(col("__scnt1"), lit(1L)).cast("double") /
      col("__nn").cast("double")
    for (k <- 2 to n) {
      val seen = col(s"__scnt$k").isNotNull
      val a = when(seen, col(s"__scnt$k").cast("double") /
        col(s"__sctx$k").cast("double")).otherwise(lit(0.0))
      val b = when(seen, lit(0.0)).otherwise(lit(alpha))
      sS = a + b * sS
    }
    joined
      .select(col("__g"), col("__id"), lnQ(sS).as("__lp"))
      .groupBy(col("__g").as(groupCol), col("__id").as(idCol))
      .agg(count(lit(1)).as("n_trans"), sum(col("__lp")).as("__s"))
      .withColumn(s"sb${n}_loss",
        -(col("__s").cast("double")) / col("n_trans").cast("double"))
      .drop("__s")
  }

  /** DuckDB twin of [[sbNgramLogLossBy]] — [[sbNgramLogLossSql]] with
    * the group key threaded through every table. */
  def sbNgramLogLossBySql(groupExpr: String, idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, order: Int,
      alpha: Double = 0.4): String = {
    require(order >= 2, s"sbNgramLogLossBySql needs order >= 2 (got $order)")
    val n = order
    def gramSelect(k: Int) = (1 to k).map(j =>
      s"unnest([w[i+${j - 1}] for i in range(1, len(w) - ${k - 2})]) AS g$j")
      .mkString(", ")
    val levelCtes = (2 to n).flatMap { k =>
      val tk = (s"trt$k AS (SELECT g, ${gramSelect(k)} FROM trd"
        + s" WHERE len(w) >= $k)")
      val sk = (s"s$k AS (SELECT g, " + (1 to k).map(j => s"g$j AS k$j")
        .mkString(", ")
        + s", count(*)::BIGINT AS cnt FROM trt$k GROUP BY "
        + (1 to k + 1).mkString(", ") + ")")
      val xk = (s"x$k AS (SELECT g, " + (1 until k).map(j => s"k$j").mkString(", ")
        + s", sum(cnt)::BIGINT AS ctx FROM s$k GROUP BY "
        + (1 to k).mkString(", ") + ")")
      Seq(tk, sk, xk)
    }
    val s1 = ("s1 AS (SELECT g, u AS k1, count(*)::BIGINT AS cnt FROM"
      + " (SELECT g, unnest(w) AS u FROM trd) GROUP BY 1, 2)")
    val tot = "tot AS (SELECT g, sum(cnt)::BIGINT AS n FROM s1 GROUP BY 1)"
    val joins = (n to 2 by -1).map { k =>
      val onS = (s"sct.g = s$k.g AND "
        + (1 to k).map(j => s"sct.g${n - k + j} = s$k.k$j").mkString(" AND "))
      val onX = (s"sct.g = x$k.g AND "
        + (1 until k).map(j => s"sct.g${n - k + j} = x$k.k$j").mkString(" AND "))
      s" LEFT JOIN s$k ON $onS LEFT JOIN x$k ON $onX"
    }.mkString("") + (s" LEFT JOIN s1 ON sct.g = s1.g AND sct.g$n = s1.k1"
      + " JOIN tot ON sct.g = tot.g")
    var p = "coalesce(s1.cnt, 1)::DOUBLE / tot.n::DOUBLE"
    for (k <- 2 to n)
      p = (s"(CASE WHEN s$k.cnt IS NULL THEN 0.0"
        + s" ELSE s$k.cnt::DOUBLE / x$k.ctx::DOUBLE END"
        + s" + CASE WHEN s$k.cnt IS NULL THEN $alpha ELSE 0.0 END * ($p))")
    (s"WITH trd AS (SELECT $groupExpr AS g, string_split($textExpr, ' ') AS w"
      + s" FROM $trainFrom WHERE $textExpr IS NOT NULL AND $groupExpr IS NOT NULL),"
      + levelCtes.mkString(" ", ", ", ",")
      + s" $s1, $tot,"
      + s" scd AS (SELECT $groupExpr AS g, $idExpr AS id,"
      + s" string_split($textExpr, ' ') AS w"
      + s" FROM $scoreFrom WHERE $textExpr IS NOT NULL AND $groupExpr IS NOT NULL),"
      + s" sct AS (SELECT g, id, ${gramSelect(n)} FROM scd WHERE len(w) >= $n),"
      + s" pr AS (SELECT sct.g, sct.id, $p AS p FROM sct$joins),"
      + " sc AS (SELECT g, id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT g AS $groupExpr, id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + s" -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS sb${n}_loss"
      + " FROM sc GROUP BY 1, 2 ORDER BY 1, 2")
  }

  /** MERGEABLE STUPID-BACKOFF model state (VERDICT r12 #4): SB's whole
    * fit is raw count tables — level-k gram counts (k = 2..order, each
    * from its own explode: levels are NOT marginals of the top table,
    * see [[sbNgramLogLoss]]) plus unigram counts — every one an exact
    * integer sum, so the [[KnNgramState]] merge pattern applies
    * verbatim per level. finalize ≡ from-scratch fit exactly
    * (q_sb5_state shares q_sb5_loss's oracle SQL). */
  final case class SbNgramState(order: Int, levels: Map[Int, DataFrame],
      unigrams: DataFrame)

  /** Fold a train frame ONCE (per level) into its mergeable SB state:
    * (g1..gk, cnt) for each k = 2..order plus (u, cnt) unigrams. */
  def sbNgramState(train: DataFrame, textCol: String, order: Int): SbNgramState = {
    require(order >= 2, s"sbNgramState needs order >= 2 (got $order)")
    SbNgramState(order,
      (2 to order).map { k =>
        k -> transitionsN(train, textCol, textCol, k)
          .groupBy((1 to k).map(j => col(s"__g$j")): _*)
          .agg(count(lit(1)).as("__cnt"))
      }.toMap,
      train.select(explode(tokens(col(textCol))).as("__u"))
        .groupBy(col("__u")).agg(count(lit(1)).as("__ucnt")))
  }

  /** Merge two SB states: per-level union + regroup. */
  def mergeSbNgramStates(a: SbNgramState, b: SbNgramState): SbNgramState = {
    require(a.order == b.order,
      s"cannot merge SB states of different orders (${a.order} vs ${b.order})")
    SbNgramState(a.order,
      (2 to a.order).map { k =>
        k -> a.levels(k).unionByName(b.levels(k))
          .groupBy((1 to k).map(j => col(s"__g$j")): _*)
          .agg(sum(col("__cnt")).as("__cnt"))
      }.toMap,
      a.unigrams.unionByName(b.unigrams)
        .groupBy(col("__u")).agg(sum(col("__ucnt")).as("__ucnt")))
  }

  /** Score under a merged SB state — the same scoring path as the
    * from-scratch fit over the state's renamed tables, bit-identical to
    * [[sbNgramLogLoss]] on the concatenated corpus. */
  def sbNgramLogLossFromState(
      state: SbNgramState,
      score: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"backoff alpha must be in (0,1) (got $alpha)")
    val n = state.order
    // localCheckpoint each merged level (the knNgramLogLossFromState
    // rationale): the context-sum regroup re-reads every level table
    val cks = (2 to n).map { k =>
      k -> state.levels(k).select(
        (1 to k).map(j => col(s"__g$j").as(s"__s${k}k$j"))
          :+ col("__cnt").as(s"__scnt$k"): _*)
        .localCheckpoint()
    }.toMap
    require(cks(n).limit(1).count() == 1L,
      s"sbNgramLogLossFromState: state holds no $n-grams")
    val c1 = state.unigrams.select(col("__u").as("__s1k1"),
      col("__ucnt").as("__scnt1"))
      .localCheckpoint()
    sbNgramScoreFrom(cks, c1, score, idCol, textCol, n, alpha)
  }

  /** Persist/reload the SB state: one parquet table per level plus the
    * order meta row. */
  def writeSbNgramState(state: SbNgramState, dir: String): Unit = {
    val s = state.unigrams.sparkSession
    import s.implicits._
    (2 to state.order).foreach(k =>
      state.levels(k).write.mode("overwrite").parquet(s"$dir/level$k"))
    state.unigrams.write.mode("overwrite").parquet(s"$dir/unigrams")
    Seq(state.order).toDF("order").write.mode("overwrite").parquet(s"$dir/meta")
  }

  def readSbNgramState(spark: org.apache.spark.sql.SparkSession,
      dir: String): SbNgramState = {
    val order = spark.read.parquet(s"$dir/meta").head().getInt(0)
    SbNgramState(order,
      (2 to order).map(k => k -> spark.read.parquet(s"$dir/level$k")).toMap,
      spark.read.parquet(s"$dir/unigrams"))
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al., LREC
    * 2020 §4.4) — the step AFTER the LM score: within each group
    * (CCNet: per language), rank documents by perplexity and cut the
    * ranking into three equal parts; "head" (most fluent third) feeds
    * high-quality training mixes, "tail" is dropped or down-weighted.
    * Composes with any scorer (the tokenizer-slot convention): pass the
    * frame [[knBigramLogLoss]] / [[knNgramLogLoss]] / [[sbNgramLogLoss]]
    * returned, joined with its group column.
    *
    * Exact rank arithmetic, not approximate percentiles: rn =
    * row_number over (group, ORDER BY loss, id), cnt = group size,
    * bucket = head iff 3·rn ≤ cnt, middle iff 3·rn ≤ 2·cnt, else tail —
    * all integer comparisons, deterministic under loss ties (id breaks
    * them). Output = input columns + `bucket`.
    *
    * Scale shape: the window partitions by group and sorts SCORE rows —
    * (group, id, loss) scalars, never document text (the text never
    * survives past its scorer's explode), so a 100 TB corpus buckets by
    * sorting ~16-byte pairs; one shuffle by group. Groups are
    * CCNet-coarse (languages/sources), so per-group sort is the
    * documented cost — a giant single group degrades to one sorted
    * partition of scalar pairs, the same bound as any exact ranking. */
  def perplexityBuckets(scored: DataFrame, groupCol: String, idCol: String,
      lossCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(lossCol), col(idCol))
    val wc = Window.partitionBy(col(groupCol))
    scored
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .withColumn("bucket",
        when(col("__rn") * 3 <= col("__cnt"), lit("head"))
          .when(col("__rn") * 3 <= col("__cnt") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__rn", "__cnt")
  }

  /** DuckDB twin of [[sbNgramLogLoss]] — per-level raw count tables
    * from their own unnests, the same linear backoff expression token
    * for token. */
  def sbNgramLogLossSql(idExpr: String, textExpr: String,
      trainFrom: String, scoreFrom: String, order: Int,
      alpha: Double = 0.4): String = {
    require(order >= 2, s"sbNgramLogLossSql needs order >= 2 (got $order)")
    val n = order
    def gramSelect(k: Int) = (1 to k).map(j =>
      s"unnest([w[i+${j - 1}] for i in range(1, len(w) - ${k - 2})]) AS g$j")
      .mkString(", ")
    val levelCtes = (2 to n).flatMap { k =>
      val tk = s"trt$k AS (SELECT ${gramSelect(k)} FROM trd WHERE len(w) >= $k)"
      val sk = (s"s$k AS (SELECT " + (1 to k).map(j => s"g$j AS k$j").mkString(", ")
        + s", count(*)::BIGINT AS cnt FROM trt$k GROUP BY "
        + (1 to k).mkString(", ") + ")")
      val xk = (s"x$k AS (SELECT " + (1 until k).map(j => s"k$j").mkString(", ")
        + s", sum(cnt)::BIGINT AS ctx FROM s$k GROUP BY "
        + (1 until k).mkString(", ") + ")")
      Seq(tk, sk, xk)
    }
    val s1 = ("s1 AS (SELECT u AS k1, count(*)::BIGINT AS cnt FROM"
      + " (SELECT unnest(w) AS u FROM trd) GROUP BY 1)")
    val tot = "tot AS (SELECT sum(cnt)::BIGINT AS n FROM s1)"
    val joins = (n to 2 by -1).map { k =>
      val onS = (1 to k).map(j => s"sct.g${n - k + j} = s$k.k$j").mkString(" AND ")
      val onX = (1 until k).map(j => s"sct.g${n - k + j} = x$k.k$j").mkString(" AND ")
      s" LEFT JOIN s$k ON $onS LEFT JOIN x$k ON $onX"
    }.mkString("") + s" LEFT JOIN s1 ON sct.g$n = s1.k1 CROSS JOIN tot"
    var p = "coalesce(s1.cnt, 1)::DOUBLE / tot.n::DOUBLE"
    for (k <- 2 to n)
      p = (s"(CASE WHEN s$k.cnt IS NULL THEN 0.0"
        + s" ELSE s$k.cnt::DOUBLE / x$k.ctx::DOUBLE END"
        + s" + CASE WHEN s$k.cnt IS NULL THEN $alpha ELSE 0.0 END * ($p))")
    (s"WITH trd AS (SELECT string_split($textExpr, ' ') AS w FROM $trainFrom"
      + s" WHERE $textExpr IS NOT NULL),"
      + levelCtes.mkString(" ", ", ", ",")
      + s" $s1, $tot,"
      + s" scd AS (SELECT $idExpr AS id, string_split($textExpr, ' ') AS w"
      + s" FROM $scoreFrom WHERE $textExpr IS NOT NULL),"
      + s" sct AS (SELECT id, ${gramSelect(n)} FROM scd WHERE len(w) >= $n),"
      + s" pr AS (SELECT sct.id, $p AS p FROM sct$joins),"
      + " sc AS (SELECT id, round(ln(p), 6)::DECIMAL(18,6) AS lp FROM pr)"
      + s" SELECT id AS $idExpr, count(*)::BIGINT AS n_trans,"
      + s" -(sum(lp)::DOUBLE) / count(*)::DOUBLE AS sb${n}_loss"
      + " FROM sc GROUP BY 1 ORDER BY 1")
  }
}
