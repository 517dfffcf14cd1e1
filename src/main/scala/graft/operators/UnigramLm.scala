package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (the SentencePiece inference family
  * — Kudo, ACL 2018 "Subword Regularization" §3; unigram pieces with a
  * Viterbi decode), completing the tokenizer trio next to [[Bpe]]
  * (merge-by-frequency) and [[WordPiece]] (merge-by-likelihood-ratio):
  * here the vocabulary is SCORED, not merged — every piece carries a
  * unigram cost −ln p(piece), and a word's tokenization is the
  * segmentation minimizing total cost (Viterbi over the piece lattice),
  * not a greedy scan.
  *
  * Vocabulary seeding follows SentencePiece's practice of harvesting
  * frequent substrings (the ESA seed, Kudo §3.2, simplified to a
  * bounded-length substring count): every substring of length ≤
  * `maxPieceLen` of the (word, freq) statistic is a candidate; ALL
  * single characters are kept (full coverage — the lattice always has
  * a path), plus the top `maxMulti` longer pieces by (freq desc, piece
  * asc). Piece costs are the QUANTIZED integers
  * round(−ln(freq/total), 6)·10⁶ — exact longs, so Viterbi compares
  * and sums are pure integer arithmetic and the DuckDB replay is
  * bit-exact (the lnQ convention, one documented ulp risk at the
  * rounding boundary). EM refinement is deliberately out of scope:
  * the seed statistic is already deterministic and replayable; a
  * soft-EM fit is float-iterative and belongs offline.
  *
  * Scale shape: ONE corpus scan into the bounded (word, freq)
  * statistic ([[Bpe.bpeLearnDelta]]'s contract, maxVocab fail-fast);
  * candidate harvesting + selection run in driver memory over it;
  * segmentation is a row-local `mapPartitions` pass (zero shuffle)
  * with the piece-cost map as per-partition state.
  *
  * CODEPOINT-CORRECT (VERDICT r12 #1): the substring harvest, both
  * Viterbi DPs, and every piece-length bound index by CODEPOINT via
  * [[Codepoints]] — surrogate pairs (emoji, astral CJK) are one
  * character, matching the DuckDB replay's codepoint `substr`/`len`
  * (q_unigram_segment_astral pins it end to end). Same convention in
  * [[Bpe]] and [[WordPiece]]. */
object UnigramLm {

  final case class Piece(piece: String, freq: Long, cost_micro: Long)

  /** A fitted model: selected pieces (sorted by piece, UTF-8), the
    * normalization total, the seed's piece-length bound, and the cost
    * charged to a word with NO lattice path (a character never seen in
    * training): one pseudo-token at cost −ln(1/(total+1)) — strictly
    * costlier than any real piece, the SentencePiece UNK convention. */
  final case class UlmModel(pieces: Seq[Piece], totalFreq: Long, maxPieceLen: Int) {
    lazy val costs: Map[String, Long] = pieces.map(p => p.piece -> p.cost_micro).toMap
    lazy val unkCostMicro: Long = costMicro(1.0 / (totalFreq.toDouble + 1.0))
  }

  /** Quantized integer cost: round(−ln(p), 6)·10⁶ as an exact long —
    * decimal quantization BEFORE the integer scale, so Spark and DuckDB
    * land on the same grid point. */
  private[graft] def costMicro(p: Double): Long =
    (BigDecimal(-math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      * BigDecimal(1000000)).toLongExact

  /** UTF-8 unsigned byte order (Spark UTF8String / DuckDB collation) —
    * [[Bpe.utf8Compare]], the tokenizer family's shared order. */
  private def utf8Compare(a: String, b: String): Int = Bpe.utf8Compare(a, b)

  /** Fit a unigram-LM piece vocabulary over the corpus' word-frequency
    * statistic. All single characters are selected unconditionally;
    * longer candidates need `freq >= minFreq` and rank in the top
    * `maxMulti` by (freq desc, piece asc). An empty corpus yields an
    * empty model (segmenting under it charges every word the UNK
    * cost). */
  def unigramLmLearn(
      df: DataFrame,
      textCol: String,
      maxPieceLen: Int = 6,
      minFreq: Long = 2L,
      maxMulti: Int = 512,
      maxVocab: Int = 1 << 20): UlmModel = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1 (got $maxPieceLen)")
    require(minFreq >= 1 && maxMulti >= 0, "minFreq >= 1, maxMulti >= 0")
    val wf = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val rows = wf.limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"distinct-word vocabulary exceeds maxVocab=$maxVocab — the candidate" +
        " harvest is driver-memory over this statistic by design")
    val cand = mutable.HashMap.empty[String, Long]
    rows.foreach { r =>
      val w = r.getString(0)
      val f = r.getLong(1)
      val offs = Codepoints.offsets(w)
      val n = offs.length - 1
      var i = 0
      while (i < n) {
        var l = 1
        val lim = math.min(maxPieceLen, n - i)
        while (l <= lim) {
          val p = w.substring(offs(i), offs(i + l))
          cand(p) = cand.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val chars = cand.iterator.filter(p => Codepoints.count(p._1) == 1).toSeq
    val multi = cand.iterator
      .filter { case (p, f) => Codepoints.count(p) >= 2 && f >= minFreq }.toSeq
      .sortWith { case ((p1, f1), (p2, f2)) =>
        if (f1 != f2) f1 > f2 else utf8Compare(p1, p2) < 0
      }
      .take(maxMulti)
    val sel = chars ++ multi
    val total = sel.iterator.map(_._2).sum
    val pieces = sel
      .map { case (p, f) => Piece(p, f, costMicro(f.toDouble / total.toDouble)) }
      .sortWith((a, b) => utf8Compare(a.piece, b.piece) < 0)
    UlmModel(pieces, total, maxPieceLen)
  }

  /** Fitted pieces as a DataFrame — the persistable at-rest form.
    * [[modelFrom]] reconstructs the model completely: `totalFreq` is
    * the freq sum and `maxPieceLen` the longest piece, both derivable
    * from the rows. */
  def piecesDf(spark: org.apache.spark.sql.SparkSession, m: UlmModel): DataFrame =
    spark.createDataFrame(m.pieces)
      .select(col("piece"), col("freq"), col("cost_micro"))

  /** Max rows a reloaded piece table may hold. */
  val MaxPieceRows = 1 << 20

  /** Reload a persisted [[piecesDf]] — a bounded fail-fast collect;
    * the round trip is exact ([[UnigramLmSpec]] pins segment-identical
    * behavior incl. the UNK cost, which re-derives from the freq
    * sum). */
  def modelFrom(df: DataFrame): UlmModel = {
    val rows = df.select(col("piece"), col("freq").cast("long"),
        col("cost_micro").cast("long"))
      .limit(MaxPieceRows + 1).collect()
    require(rows.length <= MaxPieceRows,
      s"piece table exceeds $MaxPieceRows rows — not a unigramLmLearn piecesDf")
    val pieces = rows.map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2)))
      .sortWith((a, b) => utf8Compare(a.piece, b.piece) < 0).toSeq
    val total = pieces.iterator.map(_.freq).sum
    val maxLen = if (pieces.isEmpty) 1
      else pieces.iterator.map(p => Codepoints.count(p.piece)).max
    UlmModel(pieces, total, maxLen)
  }

  /** Viterbi-segment ONE word: (n_pieces, total cost_micro) of the
    * minimum-cost segmentation, ties broken by FEWER pieces (both
    * statistics are the lexicographic DP minimum, so the result is
    * unique even when paths tie). No lattice path → (1, unkCost). */
  private[graft] def viterbiWord(w: String, costs: collection.Map[String, Long],
      maxPieceLen: Int, unkCost: Long): (Long, Long) = {
    val offs = Codepoints.offsets(w)
    val n = offs.length - 1
    val bc = Array.fill(n + 1)(Long.MaxValue)
    val bn = Array.fill(n + 1)(Long.MaxValue)
    bc(0) = 0L
    bn(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (bc(j) != Long.MaxValue) {
          costs.get(w.substring(offs(j), offs(i))) match {
            case Some(c) =>
              val nc = bc(j) + c
              val nn = bn(j) + 1L
              if (nc < bc(i) || (nc == bc(i) && nn < bn(i))) {
                bc(i) = nc; bn(i) = nn
              }
            case None =>
          }
        }
        j += 1
      }
      i += 1
    }
    if (bc(n) == Long.MaxValue) (1L, unkCost) else (bn(n), bc(n))
  }

  /** One deterministic vocabulary-PRUNING round — the SentencePiece
    * trainer's step the seed was missing (Kudo §3.2 step 3, VERDICT
    * r11 #8), in the house EM-free form: SentencePiece prunes pieces
    * whose removal least hurts corpus likelihood; under the integer
    * Viterbi objective a multi-char piece that lies on NO
    * lexicographic-minimum segmentation of ANY corpus word has zero
    * expected count — removing it cannot change any optimal
    * segmentation — so those are exactly the pieces one pruning round
    * drops. Single characters always survive (full coverage: every
    * corpus word keeps a lattice path). Survivor costs renormalize
    * over the surviving harvest frequencies (the [[unigramLmLearn]]
    * cost formula on the pruned set), and the UNK cost re-derives from
    * the new total — so the pruned model is a complete [[UlmModel]],
    * not a filtered view.
    *
    * "Lies on SOME optimal segmentation" is decided exactly, without
    * enumerating paths: forward and backward lexicographic-min
    * (cost, n) DP over each distinct word, then piece (j, i) is on an
    * optimum iff fwd(j) + piece + bwd(i) equals the word's optimum in
    * BOTH components (additivity + lex-minimality make the pair test
    * sound and complete; UnigramLmSpec pins it against brute path
    * enumeration). The DuckDB replay packs (cost, n) into the
    * [[graft.LlmQueries]] single-integer key, identical below 16
    * pieces per word (asserted at query build). Driver cost: the same
    * bounded distinct-word statistic as the learner (maxVocab
    * fail-fast), two O(len·maxPieceLen) DPs per word. */
  def unigramLmPrune(
      df: DataFrame,
      textCol: String,
      model: UlmModel,
      maxVocab: Int = 1 << 20): UlmModel = {
    val rows = df.select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"distinct-word vocabulary exceeds maxVocab=$maxVocab — the pruning" +
        " pass is driver-memory over this statistic by design")
    val costs = model.costs
    val maxLen = model.maxPieceLen
    val used = mutable.HashSet.empty[String]
    val None_ = Long.MaxValue
    rows.foreach { r =>
      val w = r.getString(0)
      val offs = Codepoints.offsets(w)
      val n = offs.length - 1
      val fc = Array.fill(n + 1)(None_)
      val fn = Array.fill(n + 1)(None_)
      fc(0) = 0L; fn(0) = 0L
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          if (fc(j) != None_) costs.get(w.substring(offs(j), offs(i))).foreach { c =>
            val nc = fc(j) + c
            val nn = fn(j) + 1L
            if (nc < fc(i) || (nc == fc(i) && nn < fn(i))) { fc(i) = nc; fn(i) = nn }
          }
          j += 1
        }
        i += 1
      }
      if (fc(n) != None_) { // uncovered words use no piece at all
        val bc = Array.fill(n + 1)(None_)
        val bn = Array.fill(n + 1)(None_)
        bc(n) = 0L; bn(n) = 0L
        var j = n - 1
        while (j >= 0) {
          var k = j + 1
          val lim = math.min(n, j + maxLen)
          while (k <= lim) {
            if (bc(k) != None_) costs.get(w.substring(offs(j), offs(k))).foreach { c =>
              val nc = bc(k) + c
              val nn = bn(k) + 1L
              if (nc < bc(j) || (nc == bc(j) && nn < bn(j))) { bc(j) = nc; bn(j) = nn }
            }
            k += 1
          }
          j -= 1
        }
        j = 0
        while (j < n) {
          var k = j + 1
          val lim = math.min(n, j + maxLen)
          while (k <= lim) {
            if (fc(j) != None_ && bc(k) != None_) {
              val p = w.substring(offs(j), offs(k))
              if (!used.contains(p)) costs.get(p).foreach { c =>
                if (fc(j) + c + bc(k) == fc(n) && fn(j) + 1L + bn(k) == fn(n))
                  used += p
              }
            }
            k += 1
          }
          j += 1
        }
      }
    }
    val survivors = model.pieces
      .filter(p => Codepoints.count(p.piece) == 1 || used(p.piece))
    val total = survivors.iterator.map(_.freq).sum
    val pieces = survivors
      .map(p => Piece(p.piece, p.freq, costMicro(p.freq.toDouble / total.toDouble)))
      .sortWith((a, b) => utf8Compare(a.piece, b.piece) < 0)
    UlmModel(pieces, total, model.maxPieceLen)
  }

  /** Per-document Viterbi statistics under the fitted model:
    * (idCol, n_tokens, cost_micro) — token count and total quantized
    * cost (the corpus-compression quality signal: cost/token is the
    * unigram-LM bits-per-token analog). NULL text → NULL counts, the
    * [[WordPiece.wordpieceTokenCounts]] contract; one row-local
    * `mapPartitions` pass, zero shuffle. */
  def segmentCosts(df: DataFrame, idCol: String, textCol: String,
      model: UlmModel): DataFrame = {
    val costs = model.costs
    val maxLen = model.maxPieceLen
    val unk = model.unkCostMicro
    val out = df.select(col(idCol), col(textCol).as("__text"))
    val schema = org.apache.spark.sql.types.StructType(out.schema.fields.init)
      .add("n_tokens", org.apache.spark.sql.types.LongType)
      .add("cost_micro", org.apache.spark.sql.types.LongType)
    out.mapPartitions { rows =>
      // per-partition distinct-word memo ([[Bpe.MemoCap]] rationale):
      // the Viterbi DP runs once per distinct word
      val memo = new java.util.HashMap[String, (Long, Long)]()
      rows.map { r =>
        val t = r.getString(1)
        if (t == null) org.apache.spark.sql.Row(r.get(0), null, null)
        else {
          var n = 0L
          var c = 0L
          t.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
            var hit = memo.get(w)
            if (hit == null) {
              hit = viterbiWord(w, costs, maxLen, unk)
              if (memo.size < Bpe.MemoCap) memo.put(w, hit)
            }
            n += hit._1
            c += hit._2
          }
          org.apache.spark.sql.Row(r.get(0), n, c)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
