package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLm

/** Unigram-LM segmentation: vocabulary-seed pins (chars always kept,
  * multi-piece top-K by freq), exact Viterbi semantics (min cost beats
  * greedy, fewer-pieces tie-break, UNK fallback), and per-doc sums. */
class UnigramLmSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("unigramLmLearn: chars unconditional, multi top-K by (freq desc, piece asc), exact costs") {
    // "abab" x3, "abc" x2: candidates incl. ab(3*2+2=8), ba(3), bc(2), abc(2)...
    val df = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val m = UnigramLm.unigramLmLearn(df, "text", maxPieceLen = 3,
      minFreq = 2, maxMulti = 2)
    val byPiece = m.pieces.map(p => p.piece -> p).toMap
    // chars kept regardless of freq; c appears twice
    assert(Set("a", "b", "c").subsetOf(byPiece.keySet))
    // top-2 multi: ab freq 8, then aba/bab/ba tie at 3 -> aba wins (piece asc)
    assert(byPiece.keySet == Set("a", "b", "c", "ab", "aba"))
    assert(byPiece("ab").freq == 8L && byPiece("aba").freq == 3L)
    // exact quantized cost replay
    val total = m.pieces.map(_.freq).sum
    m.pieces.foreach { p =>
      val want = (BigDecimal(-math.log(p.freq.toDouble / total.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000)).toLongExact
      assert(p.cost_micro == want, p.piece)
    }
    // pieces sorted by piece ascending
    assert(m.pieces.map(_.piece) == m.pieces.map(_.piece).sorted)
  }

  test("viterbiWord: min-cost beats greedy; fewer-pieces tie-break; UNK fallback") {
    // greedy longest-first would take "ab" + unreachable; Viterbi finds a+bc
    val costs = Map[String, Long]("a" -> 10L, "b" -> 10L, "c" -> 10L,
      "ab" -> 5L, "bc" -> 3L)
    assert(UnigramLm.viterbiWord("abc", costs, 2, 99L) == ((2L, 13L))) // a+bc
    // exact cost tie (abz=15 vs ab+z=15): fewer pieces wins
    assert(UnigramLm.viterbiWord("abz", costs ++ Map("z" -> 10L, "abz" -> 15L),
      3, 99L) == ((1L, 15L)))
    // unreachable char -> one UNK pseudo-token at the model's unk cost
    assert(UnigramLm.viterbiWord("axb", costs, 2, 99L) == ((1L, 99L)))
    assert(UnigramLm.viterbiWord("", costs, 2, 99L) == ((0L, 0L)))
  }

  test("segmentCosts: per-doc sums; NULL text -> NULL; empty text -> zero") {
    val train = Seq((1L, "abab abc")).toDF("id", "text")
    val m = UnigramLm.unigramLmLearn(train, "text", maxPieceLen = 3,
      minFreq = 1, maxMulti = 8)
    val docs = Seq((1L, "ab ab"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "qq")).toDF("doc_id", "text")
    val got = UnigramLm.segmentCosts(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getLong(2)))).toMap
    val (n1, c1) = UnigramLm.viterbiWord("ab", m.costs, m.maxPieceLen, m.unkCostMicro)
    assert(got(1L) == ((2 * n1, 2 * c1)))
    assert(got(2L) == ((0L, 0L)))
    assert(got(3L) == null)
    // q unseen -> each word one UNK at unk cost, strictly costlier than any piece
    assert(got(4L) == ((1L, m.unkCostMicro)))
    assert(m.pieces.forall(_.cost_micro < m.unkCostMicro))
  }

  test("piecesDf/modelFrom round trip: identical pieces, total, unk cost, segmentation") {
    val train = Seq((1L, "abab abc bc")).toDF("id", "text")
    val m = UnigramLm.unigramLmLearn(train, "text", maxPieceLen = 3,
      minFreq = 1, maxMulti = 8)
    val r = UnigramLm.modelFrom(UnigramLm.piecesDf(spark, m))
    assert(r.pieces == m.pieces && r.totalFreq == m.totalFreq)
    assert(r.unkCostMicro == m.unkCostMicro)
    val docs = Seq((1L, "ab qq abc")).toDF("doc_id", "text")
    val a = UnigramLm.segmentCosts(docs, "doc_id", "text", m).collect().toSeq.map(_.toSeq)
    val b = UnigramLm.segmentCosts(docs, "doc_id", "text", r).collect().toSeq.map(_.toSeq)
    assert(a == b)
    // maxPieceLen re-derives as the longest piece: segmentation can
    // never need a longer window than any piece it could match
    assert(r.maxPieceLen == m.pieces.map(_.piece.length).max)
  }

  test("unigramLmPrune: used-set == brute path enumeration; chars survive; costs renormalize; decode preserved") {
    val df = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc") ++ Seq.fill(2)("ddd"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val m = UnigramLm.unigramLmLearn(df, "text", maxPieceLen = 3,
      minFreq = 2, maxMulti = 8)
    val pruned = UnigramLm.unigramLmPrune(df, "text", m)
    // brute: enumerate ALL segmentations of each distinct word over the
    // seed vocab, find the lex-min (cost, n) set, collect pieces on any
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(m.maxPieceLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (m.costs.contains(p)) segs(w.substring(l)).map(p +: _) else Seq.empty
      }
    val bruteUsed = Seq("abab", "abc", "ddd").flatMap { w =>
      val all = segs(w).map(s => (s.map(m.costs).sum, s.size.toLong, s))
      val opt = all.map(x => (x._1, x._2)).min
      all.filter(x => (x._1, x._2) == opt).flatMap(_._3)
    }.toSet
    val expected = m.pieces.map(_.piece)
      .filter(p => p.length == 1 || bruteUsed(p)).toSet
    assert(pruned.pieces.map(_.piece).toSet == expected,
      s"pruned ${pruned.pieces.map(_.piece)} != brute $expected")
    // a dead multi-piece exists in this fixture (the seed holds more
    // multi candidates than any optimal decode uses)
    assert(pruned.pieces.size < m.pieces.size, "fixture must actually prune")
    assert(Set("a", "b", "c", "d").subsetOf(pruned.pieces.map(_.piece).toSet))
    // costs renormalize over the surviving harvest freqs; UNK re-derives
    val total = pruned.pieces.map(_.freq).sum
    assert(pruned.totalFreq == total)
    pruned.pieces.foreach { p =>
      val want = (BigDecimal(-math.log(p.freq.toDouble / total.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000)).toLongExact
      assert(p.cost_micro == want, p.piece)
    }
    // coverage preserved: every corpus word still decodes without UNK,
    // and (with costs shifted by a constant renormalization offset per
    // piece) the same corpus still segments into the same piece counts
    val before = UnigramLm.segmentCosts(df, "id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val after = UnigramLm.segmentCosts(df, "id", "text", pruned)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.values.forall(_ > 0L))
    assert(before == after, "pruning dead pieces must not change token counts here")
  }

  test("unigramLmLearn: empty corpus -> empty model; segmenting charges UNK") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val m = UnigramLm.unigramLmLearn(empty, "text")
    assert(m.pieces.isEmpty && m.totalFreq == 0L)
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = UnigramLm.segmentCosts(docs, "doc_id", "text", m).collect()
    assert(got.head.getLong(1) == 1L && got.head.getLong(2) == m.unkCostMicro)
  }

  test("codepoint-correct astral text: harvest pieces are codepoint substrings; Viterbi steps codepoints (VERDICT r12 #1)") {
    // 😀/𠀀 are surrogate pairs: the substring harvest must never emit a
    // lone surrogate half, the single-char class must contain the WHOLE
    // codepoint, and piece-length bounds count codepoints.
    val df = (Seq.fill(5)("😀x😀") ++ Seq.fill(3)("𠀀𠀀"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val m = UnigramLm.unigramLmLearn(df, "text", maxPieceLen = 3,
      minFreq = 2, maxMulti = 10)
    val pieces = m.pieces.map(_.piece).toSet
    // chars: 😀 (freq 10), x (5), 𠀀 (6); multi substrings of length 2-3
    assert(pieces == Set("😀", "x", "𠀀", "😀x", "x😀", "😀x😀", "𠀀𠀀"))
    m.pieces.foreach { p =>
      // piece boundaries are codepoint boundaries — no lone surrogates
      assert(p.piece.codePoints().toArray.forall(Character.isValidCodePoint),
        p.piece)
      assert(!Character.isLowSurrogate(p.piece.charAt(0))
        && !Character.isHighSurrogate(p.piece.charAt(p.piece.length - 1)),
        s"lone surrogate boundary: ${p.piece}")
    }
    // maxPieceLen counted in codepoints: 😀x😀 (3 codepoints, 6 UTF-16
    // units) harvested; model.maxPieceLen derives back as 3
    assert(m.maxPieceLen == 3)
    // Viterbi decodes the whole astral word as ONE piece (min cost: the
    // full-word piece is cheaper than any 2+-piece path since every
    // piece cost is positive)
    val (n, c) = UnigramLm.viterbiWord("😀x😀", m.costs, m.maxPieceLen,
      m.unkCostMicro)
    assert(n == 1L && c == m.costs("😀x😀"))
    // pruning on the astral corpus keeps chars + used pieces only, all
    // well-formed; decode is preserved
    val pruned = UnigramLm.unigramLmPrune(df, "text", m)
    assert(pruned.pieces.map(_.piece).toSet.subsetOf(pieces))
    assert(Set("😀", "x", "𠀀").subsetOf(pruned.pieces.map(_.piece).toSet))
    val (pn, _) = UnigramLm.viterbiWord("😀x😀", pruned.costs,
      pruned.maxPieceLen, pruned.unkCostMicro)
    assert(pn == 1L)
  }
}
