package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WordPiece

/** WordPiece training + tokenization: a from-scratch naive replay of
  * the likelihood-ratio merge loop (recount everything each round —
  * independent of the operator's delta maintenance), the score-beats-
  * count ordering pin that separates WordPiece from BPE, BERT's
  * greedy-longest-match semantics incl. `[UNK]` collapse, and the
  * fail-fast contracts. */
class WordPieceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Naive reference trainer: re-derive symbol+pair counts from the
    * full segmentation every round; argmax by exact BigInt rational
    * (score desc, pair-string asc). */
  private def naiveLearn(corpus: Seq[(String, Long)], merges: Int)
      : Seq[(String, String, Long, Long, Long)] = {
    var segs: Seq[(Array[String], Long)] = corpus.map { case (w, f) =>
      (w.toCharArray.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else "##" + c }, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long, Long)]
    var done = false
    while (out.size < merges && !done) {
      val sym = scala.collection.mutable.HashMap.empty[String, Long]
      val pair = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (s, f) =>
        s.foreach(t => sym(t) = sym.getOrElse(t, 0L) + f)
        s.zip(s.tail).foreach(p => pair(p) = pair.getOrElse(p, 0L) + f)
      }
      if (pair.isEmpty) done = true
      else {
        // exact argmax by BigInt cross-multiplication (score desc,
        // pair-string asc) — independent of the operator's prefilter
        var bk: ((String, String), Long) = null
        pair.foreach { case e @ ((l, r), c) =>
          if (bk == null) bk = e
          else {
            val cmp = (BigInt(c) * BigInt(sym(bk._1._1)) * BigInt(sym(bk._1._2)))
              .compare(BigInt(bk._2) * BigInt(sym(l)) * BigInt(sym(r)))
            if (cmp > 0 || (cmp == 0 &&
                (l + " " + r) < (bk._1._1 + " " + bk._1._2))) bk = e
          }
        }
        val ((l, r), c) = bk
        out += ((l, r, c, sym(l), sym(r)))
        val merged = l + r.substring(2)
        segs = segs.map { case (s, f) =>
          val b = Array.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += merged; i += 2 }
            else { b += s(i); i += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.toSeq
  }

  test("wordpieceLearn: delta-maintained loop == naive full-recount replay to exhaustion") {
    val corpus = Seq(("abab", 7L), ("abc", 4L), ("bc", 9L), ("cab", 2L), ("a", 5L))
    val df = corpus.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val model = WordPiece.wordpieceLearn(df, "text", merges = 100)
    val want = naiveLearn(corpus, 100)
    assert(model.rules.size == want.size)
    model.rules.zip(want).foreach { case (g, (l, r, c, cl, cr)) =>
      assert((g.left_sym, g.right_sym, g.cnt, g.cnt_left, g.cnt_right)
        == ((l, r, c, cl, cr)), s"iter ${g.iter}")
    }
    // exhaustion: every word collapsed to one symbol -> rules cover all
    assert(model.rules.nonEmpty)
  }

  test("wordpieceLearn: likelihood ratio picks rare-but-exclusive over frequent pair") {
    // (a,##b) count 10 but score 10/(10*10)=0.1; (c,##d) count 2,
    // score 2/(2*2)=0.5 -> WordPiece merges cd first, BPE would merge ab
    val df = (Seq.fill(10)("ab") ++ Seq.fill(2)("cd"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val model = WordPiece.wordpieceLearn(df, "text", merges = 1)
    val m = model.rules.head
    assert((m.left_sym, m.right_sym) == (("c", "##d")))
    assert((m.cnt, m.cnt_left, m.cnt_right) == ((2L, 2L, 2L)))
  }

  test("tokenizeWordWp: greedy longest match, ## continuations, [UNK] collapse") {
    val vocab = Set("un", "una", "##ffa", "##ble", "##b", "##l", "##e",
      "u", "##n", "##a", "##f")
    def tok(w: String) = WordPiece.tokenizeWordWp(w, vocab, 4).toSeq
    // longest FIRST match wins even when it forces shorter continuations
    assert(tok("unaffable") == Seq("una", "##ffa", "##ble"))
    // greedy is not optimal-cover: "unaf" takes "una" then "##f"
    assert(tok("unaf") == Seq("una", "##f"))
    // missing char anywhere collapses the WHOLE word
    assert(tok("unazble") == Seq("[UNK]"))
    assert(tok("zed") == Seq("[UNK]"))
  }

  test("wordpieceTokens Column + wordpieceTokenCounts agree; NULL text -> NULL counts") {
    graft.expressions.GraftFunctions.register(spark)
    val train = Seq((1L, "abab abc bc")).toDF("id", "text")
    val model = WordPiece.wordpieceLearn(train, "text", merges = 100)
    val docs = Seq((1L, "abab bc xq"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val viaCol = docs.select($"doc_id",
      WordPiece.wordpieceTokens($"text", model).as("t")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(viaCol(3L) == null)
    assert(viaCol(2L) == Seq.empty)
    // 'x'/'q' absent from training -> [UNK] per word
    assert(viaCol(1L).count(_ == "[UNK]") == 1)
    val counts = WordPiece.wordpieceTokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getLong(2)))).toMap
    assert(counts(3L) == null)
    assert(counts(2L) == ((0L, 0L)))
    assert(counts(1L) == ((viaCol(1L).size.toLong, 1L)))
  }

  test("vocabDf/vocabFrom round trip tokenizes identically") {
    val train = Seq((1L, "abab abc bc cab")).toDF("id", "text")
    val m = WordPiece.wordpieceLearn(train, "text", merges = 100)
    val reloaded = WordPiece.vocabFrom(WordPiece.vocabDf(spark, m))
    assert(reloaded.vocab.toSet == m.vocab.toSet)
    val docs = Seq((1L, "abab xq bc"), (2L, "cab abc")).toDF("doc_id", "text")
    val a = WordPiece.wordpieceTokenCounts(docs, "doc_id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = WordPiece.wordpieceTokenCounts(docs, "doc_id", "text", reloaded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("wordpieceLearn: '#' in corpus fails fast; empty corpus yields no pairs") {
    val bad = Seq((1L, "a#b")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      WordPiece.wordpieceLearn(bad, "text", merges = 1)
    }
    assert(e.getMessage.contains("#"))
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val m = WordPiece.wordpieceLearn(empty, "text", merges = 5)
    assert(m.rules.isEmpty && m.baseSyms.isEmpty)
  }

  test("codepoint-correct astral text: learner splits codepoints, greedy matcher steps codepoints (VERDICT r12 #1)") {
    // 😀 (U+1F600) and 𠀀 (U+20000) are surrogate PAIRS — 2 UTF-16 code
    // units each. Base symbols must be whole codepoints; the greedy
    // matcher's position/length arithmetic must consume codepoints.
    val df = (Seq.fill(4)("😀x😀") ++ Seq.fill(2)("𠀀y") ++ Seq.fill(3)("x😀"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val model = WordPiece.wordpieceLearn(df, "text", merges = 100)
    // base symbol alphabet: exactly the word-initial + continuation
    // CODEPOINTS of the corpus, never a lone surrogate half
    assert(model.baseSyms.toSet ==
      Set("😀", "x", "𠀀", "##x", "##😀", "##y"))
    // exhaustion merges every word to one symbol; vocab holds the words
    assert(Set("😀x😀", "𠀀y", "x😀").subsetOf(model.vocab.toSet))
    // greedy matcher on a hand vocab: longest-codepoint match first
    val vocab = Set[String]("😀", "##x😀", "##x", "##😀")
    assert(WordPiece.tokenizeWordWp("😀x😀", vocab, 2).toSeq
      == Seq("😀", "##x😀"))
    // unseen astral char collapses the word — never a partial-surrogate match
    assert(WordPiece.tokenizeWordWp("😀🚀", vocab, 2).toSeq
      == Seq(WordPiece.Unk))
    // token counts through the learned model: every trained word = 1
    // piece after exhaustion, unseen astral word = 1 UNK
    val docs = Seq((1L, "😀x😀 𠀀y"), (2L, "🚀🚀")).toDF("doc_id", "text")
    val got = WordPiece.wordpieceTokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 0L), (2L, 1L, 1L)))
  }
}
