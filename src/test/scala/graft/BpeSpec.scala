package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("bpeLearn: the Sennrich hand example — merge order, counts, and merged-symbol reuse") {
    // low x3, lower x2, newest x1: pair counts by hand —
    //   (l,o)=5 ties (o,w)=5, 'l o' < 'o w' -> merge 1 = (l,o,5)
    //   then (lo,w)=5 -> merge 2; then (e,r)=2 ties (low,e)=2,
    //   'e r' < 'low e' -> merge 3 = (e,r,2); then (low,er)=2
    val df = corpus("low low low lower lower newest")
    val m = Bpe.bpeLearn(df, "text", merges = 4)
    assert(m.map(x => (x.iter, x.left_sym, x.right_sym, x.cnt)) == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L),
      (4L, "low", "er", 2L)))
  }

  test("bpeLearn: left-to-right non-overlapping merge application (the Sennrich convention)") {
    // 'aaaa' + merge (a,a) must become (aa, aa) — NOT (aa, a, a) — and
    // 'aaa' becomes (aa, a); round 2's top pair proves the application
    val df = corpus("aaaa aaa")
    val m = Bpe.bpeLearn(df, "text", merges = 2)
    assert(m(0).left_sym == "a" && m(0).right_sym == "a" && m(0).cnt == 5L)
    // after the merge: aaaa -> (aa, aa), aaa -> (aa, a):
    // pairs (aa,aa)=1 and (aa,a)=1 tie; 'aa a' < 'aa aa'
    assert((m(1).left_sym, m(1).right_sym, m(1).cnt) == ("aa", "a", 1L))
  }

  test("bpeTokenize: symbol-boundary safety — a merged symbol never false-matches a prefix") {
    // merges [(b,c), (a,b)] on 'abc': after (b,c) the word is (a, bc);
    // the (a,b) pattern must NOT match inside ' a  bc '
    val ms = Seq(Bpe.Merge(1, "b", "c", 1), Bpe.Merge(2, "a", "b", 1))
    val toks = corpus("abc ab cab")
      .select(Bpe.bpeTokenize(col("text"), ms).as("t"))
      .head().getSeq[String](0)
    assert(toks == Seq("a", "bc", "ab", "c", "ab"),
      s"boundary violation: got $toks")
  }

  test("bpeTokenCounts: counts match tokenize sizes; single-char and unmerged words") {
    val ms = Seq(Bpe.Merge(1, "e", "r", 1), Bpe.Merge(2, "m", "er", 1))
    val df = corpus("the merger a", "mere er")
    val got = Bpe.bpeTokenCounts(df, "doc_id", "text", ms)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the->(t,h,e)=3, merger->(mer,g,er)=3, a->1 : 7
    // mere->(m,e,r,e)->(m,er,e)->(mer,e)=2, er->(er)=1 : 3
    assert(got.toSeq == Seq((0L, 7L), (1L, 3L)))
  }

  test("bpeLearn: early stop when fully merged; fail-fast bounds") {
    // single repeated word 'ab': merge 1 = (a,b); afterwards no pairs
    // remain anywhere -> learn stops early instead of erroring
    val df = corpus("ab ab ab")
    val m = Bpe.bpeLearn(df, "text", merges = 5)
    assert(m.map(x => (x.left_sym, x.right_sym, x.cnt)) == Seq(("a", "b", 3L)))
    intercept[IllegalArgumentException] { Bpe.bpeLearn(df, "text", 0) }
    intercept[IllegalArgumentException] { Bpe.bpeLearn(df, "text", Bpe.MaxMerges + 1) }
    intercept[IllegalArgumentException] { Bpe.bpeTokenize(col("text"), Seq.empty) }
  }

  test("bpeLearnDelta == bpeLearn through full vocabulary exhaustion (delta == reagg, the scanChunked convention)") {
    // a letter-diverse fixture whose exhaustion takes >100 merges, so
    // the delta paths (pair create/destroy, count decrement, stale-heap
    // discard, tie-breaks) all exercise against the re-aggregating form
    val abc = "abcdefghij"
    val texts = (0 until 60).map { i =>
      val w = (0 until 5 + i % 3).map(j => abc((i * 7 + j * 3) % abc.length)).mkString
      Seq.fill(1 + i % 4)(w).mkString(" ")
    }
    val df = corpus(texts: _*)
    val reagg = Bpe.bpeLearn(df, "text", merges = Bpe.MaxMerges)
    val delta = Bpe.bpeLearnDelta(df, "text", merges = Bpe.MaxMerges)
    assert(reagg.size > 30 && reagg.size < Bpe.MaxMerges,
      s"fixture should exhaust mid-run, got ${reagg.size} merges")
    assert(delta == reagg,
      s"delta diverged from reagg at ${delta.zip(reagg).indexWhere(p => p._1 != p._2)}")
  }

  test("bpeLearnDelta == bpeLearn on the real documents table") {
    val docs = TestSpark.table("0.001", "documents")
    val reagg = Bpe.bpeLearn(docs, "text", merges = 24)
    val delta = Bpe.bpeLearnDelta(docs, "text", merges = 24)
    assert(delta == reagg)
  }

  test("bpeTokenCountsDeep == bpeTokenCounts (sequential-pass semantics == the replace chain)") {
    val docs = TestSpark.table("0.001", "documents")
    val rules = Bpe.bpeLearnDelta(docs, "text", merges = 40)
    val chain = Bpe.bpeTokenCounts(docs, "doc_id", "text", rules)
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    val deep = Bpe.bpeTokenCountsDeep(docs, "doc_id", "text", rules)
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(deep == chain)
    // rule-order independence of the INPUT SEQ (application order comes
    // from iter) + the boundary-safety fixture from the chain pin
    val ms = Seq(Bpe.Merge(2, "a", "b", 1), Bpe.Merge(1, "b", "c", 1))
    val got = Bpe.bpeTokenCountsDeep(corpus("abc ab cab"), "doc_id", "text", ms)
      .head().getLong(1)
    assert(got == 5L) // (a, bc), (ab), (c, ab) — b,c merges first
    // NULL text yields NULL (the size(NULL)/chain contract)
    val withNull = Seq((0L, "ab"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val nn = Bpe.bpeTokenCountsDeep(withNull, "doc_id", "text", ms)
      .orderBy("doc_id").collect()
    assert(nn(0).getLong(1) == 1L && nn(1).isNullAt(1)) // 'ab' merges by rule (a,b)
  }

  test("bpeTokenCountsDeep == chain on duplicate-output merges (sequential-pass semantics, ADVICE r10)") {
    // Adversarial chain where plain min-rank greedy DIVERGES from the
    // sequential replace chain: "wxy" is producible two ways —
    // (w,x)+(wx,y) at ranks 2-3 and (x,y)+(w,xy) at ranks 1,5 — and the
    // consumer (wxy,z) sits at rank 4 BETWEEN them. On "wxyz" the chain
    // runs: (x,y) -> [w, xy, z]; ranks 2-4 are no-ops ((w,x) gone, no
    // "wxy" yet); (w,xy) -> [wxy, z]. Rank 4's pass is OVER when "wxy"
    // finally forms, so the chain stops at 2 tokens; greedy would fire
    // the already-passed rank 4 and collapse to 1. The deep tokenizer
    // must match the chain.
    val ms = Seq(
      Bpe.Merge(1, "x", "y", 1), Bpe.Merge(2, "w", "x", 1),
      Bpe.Merge(3, "wx", "y", 1), Bpe.Merge(4, "wxy", "z", 1),
      Bpe.Merge(5, "w", "xy", 1))
    val docs = corpus("wxyz")
    val chainToks = docs.select(Bpe.bpeTokenize(col("text"), ms))
      .head().getSeq[String](0)
    assert(chainToks == Seq("wxy", "z"), s"chain fixture drifted: $chainToks")
    val deep = Bpe.bpeTokenCountsDeep(docs, "doc_id", "text", ms)
      .head().getLong(1)
    assert(deep == 2L, s"deep tokenizer must follow the chain (got $deep tokens)")
    // duplicate (left,right) PAIR at two ranks: each rank gets its own
    // pass ("abab" -> (a,b)@1 merges both, so @4's pass is a no-op; but
    // on "aabb" nothing fires until... (a,b)@1 merges the middle ->
    // [a, ab, b] and stays — 3 tokens in chain AND deep)
    val dup = Seq(
      Bpe.Merge(1, "a", "b", 1), Bpe.Merge(2, "ab", "ab", 1),
      Bpe.Merge(3, "c", "d", 1), Bpe.Merge(4, "a", "b", 1))
    for (w <- Seq("abab", "aabb", "ababab")) {
      val d = corpus(w)
      val want = d.select(size(Bpe.bpeTokenize(col("text"), dup)).cast("long"))
        .head().getLong(0)
      val got = Bpe.bpeTokenCountsDeep(d, "doc_id", "text", dup)
        .head().getLong(1)
      assert(got == want, s"dup-pair chain parity on '$w': deep=$got chain=$want")
    }
  }

  test("bpeDeepTokens Column == bpeTokenize token for token (learned chain + adversarial list)") {
    graft.expressions.GraftFunctions.register(spark)
    val docs = TestSpark.table("0.001", "documents")
    val rules = Bpe.bpeLearnDelta(docs, "text", merges = 40)
    val both = docs.select(col("doc_id"),
        Bpe.bpeTokenize(col("text"), rules).as("chain"),
        Bpe.bpeDeepTokens(col("text"), rules).as("deep"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: chain != deep") }
    // the duplicate-output adversarial chain (the sequential-pass case
    // plain greedy gets wrong) — Column form must match the chain too
    val ms = Seq(
      Bpe.Merge(1, "x", "y", 1), Bpe.Merge(2, "w", "x", 1),
      Bpe.Merge(3, "wx", "y", 1), Bpe.Merge(4, "wxy", "z", 1),
      Bpe.Merge(5, "w", "xy", 1))
    val adv = corpus("wxyz wxy xyz")
      .select(Bpe.bpeDeepTokens(col("text"), ms).as("t")).head().getSeq[String](0)
    assert(adv == Seq("wxy", "z", "wxy", "xy", "z"), s"got $adv")
    // NULL text -> NULL array; empty/whitespace-only -> empty array
    val nn = Seq((0L, "ab"), (1L, null.asInstanceOf[String]), (2L, "  "))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.bpeDeepTokens(col("text"), ms).as("t"))
      .orderBy("doc_id").collect()
    assert(nn(0).getSeq[String](1) == Seq("a", "b"))
    assert(nn(1).isNullAt(1))
    assert(nn(2).getSeq[String](1).isEmpty)
    // deepRetokenize slots into the Column => Column tokenizer surface
    val rt = Bpe.deepRetokenize(ms)(lit("wxyz"))
    assert(corpus("x").select(rt).head().getString(0) == "wxy z")
  }

  test("bpeLearnDelta: minFreq prunes the noise tail; maxVocab fail-fast; cap bounds") {
    // 'aa' x2 survives minFreq=2, singleton 'bb'/'cc' drop out
    val df = corpus("aa aa bb cc")
    val m = Bpe.bpeLearnDelta(df, "text", merges = 5, minFreq = 2L)
    assert(m.map(x => (x.left_sym, x.right_sym, x.cnt)) == Seq(("a", "a", 2L)))
    val e = intercept[IllegalArgumentException] {
      Bpe.bpeLearnDelta(df, "text", merges = 5, maxVocab = 2)
    }
    assert(e.getMessage.contains("maxVocab"))
    intercept[IllegalArgumentException] { Bpe.bpeLearnDelta(df, "text", 0) }
    intercept[IllegalArgumentException] {
      Bpe.bpeLearnDelta(df, "text", Bpe.MaxMergesDelta + 1)
    }
  }

  test("tokenizer at rest: mergesDf -> parquet -> mergesFrom round-trips the exact rules") {
    val df = corpus("low low low lower lower newest")
    val learned = Bpe.bpeLearn(df, "text", merges = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    Bpe.mergesDf(spark, learned).write.mode("overwrite").parquet(dir)
    // shuffle the stored order — application order must come from iter
    val loaded = Bpe.mergesFrom(spark.read.parquet(dir).orderBy(col("left_sym")))
    assert(loaded == learned)
    val a = df.select(Bpe.bpeTokenize(col("text"), learned)).head().getSeq[String](0)
    val b = df.select(Bpe.bpeTokenize(col("text"), loaded)).head().getSeq[String](0)
    assert(a == b)
  }

  test("bpeLearn: determinism under repartitioning (exact integer counts, total-order argmax)") {
    val texts = (0 until 50).map(i => s"alpha beta gamma delta w${i % 7}")
    val a = Bpe.bpeLearn(corpus(texts: _*), "text", 6)
    val b = Bpe.bpeLearn(corpus(texts: _*).repartition(13), "text", 6)
    assert(a == b)
  }

  test("codepoint-correct astral text: delta == reagg Column form; deep == chain (VERDICT r12 #1)") {
    // surrogate-pair corpus: emoji (U+1F600, U+1F680), CJK ext B
    // (U+20000), math alpha (U+1D6C2) — each 2 UTF-16 code units. The
    // Column form (bpeLearn) is codepoint-based through Spark's
    // UTF8String substr; the Scala loops (bpeLearnDelta/tokenizeWord)
    // must land on the SAME symbols, never a lone surrogate.
    def wellFormed(s: String): Boolean = {
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c)) {
          if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
            return false
          i += 2
        } else if (Character.isLowSurrogate(c)) return false
        else i += 1
      }
      true
    }
    val texts = Seq(
      "😀x😀 x😀 𠀀ab",
      "😀x😀 𠀀ab ab😀",
      "x😀 𝛂𝛂 𝛂𝛂x")
    val df = corpus(texts: _*)
    val reagg = Bpe.bpeLearn(df, "text", merges = 12)
    val delta = Bpe.bpeLearnDelta(df, "text", merges = 12)
    assert(reagg.nonEmpty)
    assert(delta == reagg,
      s"astral divergence at ${delta.zip(reagg).indexWhere(p => p._1 != p._2)}")
    delta.foreach { m =>
      assert(wellFormed(m.left_sym) && wellFormed(m.right_sym),
        s"lone surrogate in learned symbol: $m")
    }
    // the imperative per-word tokenizer == the codegen replace chain
    val chain = Bpe.bpeTokenCounts(df, "doc_id", "text", delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val deep = Bpe.bpeTokenCountsDeep(df, "doc_id", "text", delta)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(deep == chain, "deep tokenizer diverged from chain on astral text")
  }
}
