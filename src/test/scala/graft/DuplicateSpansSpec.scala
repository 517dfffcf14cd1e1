package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramOverlap

/** ExactSubstr-style duplicated spans (r5): windows of L tokens occurring
  * >= minCount times corpus-wide merge into maximal spans; removal cuts
  * every covered token. Pinned against a sequential brute force.
  */
class DuplicateSpansSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val L = 3

  /** Sequential reference: count every L-window's occurrences, mark
    * covered token positions, merge into spans. */
  private def brute(rows: Seq[(Long, String)]): Map[Long, Seq[(Long, Long)]] = {
    val wins = rows.flatMap { case (id, t) =>
      val w = t.split(" ")
      if (w.length < L) Nil
      else (0 to w.length - L).map(i => (id, i, w.slice(i, i + L).mkString(" ")))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    wins.filter(x => counts(x._3) >= 2)
      .groupBy(_._1).view.mapValues { xs =>
        val ps = xs.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- ps) {
          if (spans.nonEmpty && p <= spans.last._1 + spans.last._2) {
            val (s0, len0) = spans.last
            spans(spans.size - 1) = (s0, math.max(len0, p + L - s0))
          } else spans += ((p.toLong, L.toLong))
        }
        spans.toSeq
      }.toMap
  }

  private val docs = Seq(
    (1L, "a b c d e f g"),          // "c d e" dup with doc 2
    (2L, "x y c d e z w"),
    (3L, "p q r"),                  // unique
    (4L, "m m m m m m"),            // self-repeating: within-doc dup counts
    (5L, "a b c d e f g"),          // exact dup of doc 1: whole doc covered
    (6L, "uu"),                     // shorter than L: never spans
    (7L, "k1 k2 a b c d e f g k3")  // contains doc 1 as a substring
  )

  test("duplicateSpans == sequential brute force (merge, within-doc repeats, full-doc cover)") {
    val got = NgramOverlap.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", windowTokens = L)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val want = brute(docs).view.mapValues(_.sortBy(_._1)).toMap.filter(_._2.nonEmpty)
    assert(got == want, s"got=$got\nwant=$want")
    // structural expectations: docs 1/5/7 share "a b c d e f g" -> fully
    // covered span in 1 and 5, embedded span in 7; doc 3 and 6 spanless
    assert(got(1L) == Seq((0L, 7L)) && got(5L) == Seq((0L, 7L)))
    assert(got(7L) == Seq((2L, 7L)))
    assert(!got.contains(3L) && !got.contains(6L))
    assert(got(4L) == Seq((0L, 6L))) // m*6: within-doc repeated windows
  }

  test("removeDuplicateSpans cuts exactly the covered tokens; no-span and NULL docs pass through") {
    val withNull = docs :+ (8L, null.asInstanceOf[String])
    val got = NgramOverlap.removeDuplicateSpans(withNull.toDF("doc_id", "text"),
        "doc_id", "text", windowTokens = L)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "" && got(5L) == "")            // fully duplicated
    assert(got(7L) == "k1 k2 k3")                     // embedded span cut
    assert(got(2L) == "x y z w")                      // "c d e" cut
    assert(got(3L) == "p q r" && got(6L) == "uu")     // untouched
    assert(got(4L) == "")
    assert(got(8L) == null)
  }

  test("determinism under repartitioning; minCount raises the bar") {
    val d = docs.toDF("doc_id", "text")
    val a = NgramOverlap.duplicateSpans(d, "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = NgramOverlap.duplicateSpans(d.repartition(7), "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // minCount=4 keeps only windows occurring >= 4 times: "c d e"
    // (docs 1, 2, 5, 7) and doc 4's self-repeating "m m m" (4 windows);
    // the 3-occurrence "a b c d e f g" tiling no longer covers docs 1/5/7
    // wholly, so total covered mass strictly drops
    val strict = NgramOverlap.duplicateSpans(d, "doc_id", "text", L, minCount = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def mass(s: Set[(Long, Long, Long)]) = s.toSeq.map(_._3).sum
    assert(strict.nonEmpty && mass(strict) < mass(a),
      s"covered mass must shrink: strict=$strict vs all=$a")
    assert(strict == Set((1L, 2L, 3L), (2L, 2L, 3L), (5L, 2L, 3L), (7L, 4L, 3L),
      (4L, 0L, 6L)))
  }

  test("retokenized spans find duplicates the whitespace family misses; positions are regex-token-space") {
    // docs 1 and 2 share the 13-token REGEX stream
    // [w 1 w 2 w 3 , w 4 w 5 w 6]: doc1 glues "w3,w4" into one
    // whitespace token, doc2 spaces the comma out — so whitespace
    // windows never match, regex windows all do
    val d = Seq(
      (1L, "w1 w2 w3,w4 w5 w6"),
      (2L, "z w1 w2 w3 , w4 w5 w6"),
      (3L, "q r s t u v")).toDF("doc_id", "text")
    assert(NgramOverlap.duplicateSpans(d, "doc_id", "text", windowTokens = 5).count() == 0)
    val bpe = NgramOverlap.duplicateSpans(d, "doc_id", "text", windowTokens = 5,
        tokenizer = NgramOverlap.retokenize())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc1's whole 13-token stream is covered; doc2's copy starts after
    // the leading "z" — offsets count regex tokens, not whitespace words
    assert(bpe == Set((1L, 0L, 13L), (2L, 1L, 13L)), s"got $bpe")
    // removal in tokenizer space: doc1 empties, doc2 keeps "z", doc3's
    // single-space text round-trips unchanged
    val clean = NgramOverlap.removeDuplicateSpans(d, "doc_id", "text",
        windowTokens = 5, tokenizer = NgramOverlap.retokenize())
      .select("doc_id", "clean_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(clean == Map(1L -> "", 2L -> "z", 3L -> "q r s t u v"), s"got $clean")
  }

  test("empty input and reserved-name guard") {
    val e = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(NgramOverlap.duplicateSpans(e, "doc_id", "text", L).count() == 0)
    assert(NgramOverlap.removeDuplicateSpans(e, "doc_id", "text", L).count() == 0)
    intercept[IllegalArgumentException] {
      NgramOverlap.duplicateSpans(
        docs.toDF("span_start", "text"), "span_start", "text", L)
    }
  }

  /** Sequential cross-corpus reference: a train window is contaminated iff
    * its text equals ANY eval window; merge covered positions as in brute. */
  private def bruteCross(
      train: Seq[(Long, String)], eval_ : Seq[(Long, String)]): Map[Long, Seq[(Long, Long)]] = {
    def wins(rows: Seq[(Long, String)]) = rows.flatMap { case (id, t) =>
      val w = t.split(" ")
      if (w.length < L) Nil
      else (0 to w.length - L).map(i => (id, i, w.slice(i, i + L).mkString(" ")))
    }
    val evalSet = wins(eval_).map(_._3).toSet
    wins(train).filter(x => evalSet(x._3))
      .groupBy(_._1).view.mapValues { xs =>
        val ps = xs.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        for (p <- ps) {
          if (spans.nonEmpty && p <= spans.last._1 + spans.last._2) {
            val (s0, len0) = spans.last
            spans(spans.size - 1) = (s0, math.max(len0, p + L - s0))
          } else spans += ((p.toLong, L.toLong))
        }
        spans.toSeq
      }.toMap
  }

  private val evalDocs = Seq(
    (100L, "c d e f q"),    // shares "c d e"/"d e f" with train docs 1/5/7
    (101L, "m m m"),        // matches doc 4's self-repeats
    (102L, "zz"))           // shorter than L: contributes no windows

  test("contaminatedSpans == cross-corpus brute force; within-train dups alone never flag") {
    val got = NgramOverlap.contaminatedSpans(
        docs.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"),
        "doc_id", "text", windowTokens = L, broadcastEval = true)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val want = bruteCross(docs, evalDocs).view.mapValues(_.sortBy(_._1)).toMap
      .filter(_._2.nonEmpty)
    assert(got == want, s"got=$got\nwant=$want")
    // "c d e f" tiles in docs 1/5 (pos 2..5) and 7 (pos 4..7); doc 2 only
    // contains "c d e" (pos 2); doc 4 matched by the eval self-repeats.
    // Doc 1 == doc 5 exactly, but that WITHIN-train duplication does not
    // flag anything beyond the eval overlap — unlike duplicateSpans.
    assert(got(1L) == Seq((2L, 4L)) && got(5L) == Seq((2L, 4L)))
    assert(got(2L) == Seq((2L, 3L)))
    assert(got(4L) == Seq((0L, 6L)))
    assert(got(7L) == Seq((4L, 4L)))
    assert(!got.contains(3L) && !got.contains(6L))
    // broadcast off: identical result
    val noBc = NgramOverlap.contaminatedSpans(
        docs.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"),
        "doc_id", "text", windowTokens = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(noBc == got.toSeq.flatMap { case (id, ss) => ss.map(s => (id, s._1, s._2)) }.toSet)
  }

  test("removeContaminatedSpans cuts the eval-overlapping tokens; empty eval is a no-op") {
    val withNull = docs :+ (8L, null.asInstanceOf[String])
    val got = NgramOverlap.removeContaminatedSpans(
        withNull.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"),
        "doc_id", "text", windowTokens = L)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a b g" && got(5L) == "a b g") // "c d e f" cut
    assert(got(2L) == "x y z w")                     // "c d e" cut
    assert(got(4L) == "")                            // fully contaminated
    assert(got(7L) == "k1 k2 a b g k3")
    assert(got(3L) == "p q r" && got(6L) == "uu")    // untouched
    assert(got(8L) == null)
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noop = NgramOverlap.removeContaminatedSpans(
        docs.toDF("doc_id", "text"), emptyEval, "doc_id", "text", L)
      .select("doc_id", "clean_text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(docs.forall { case (id, t) => noop(id) == t })
  }
}
