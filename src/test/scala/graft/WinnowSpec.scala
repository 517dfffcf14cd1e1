package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramOverlap

/** Winnowing fingerprints (Schleimer et al. SIGMOD'03): the guarantee
  * (any shared run of >= windowTokens + winnowWindow - 1 tokens shares
  * a fingerprint), the density dial, and the cross-set overlap. */
class WinnowSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // a 7-token run ("the five boxing wizards jump very quickly") planted
  // into two different contexts: k=4, w=4 => guarantee length 4+4-1=7
  private val shared = "the five boxing wizards jump very quickly"
  private val docs = Seq(
    (1L, s"alpha beta gamma $shared delta epsilon"),
    (2L, s"one two $shared three four five six"),
    (3L, "completely unrelated text with no overlap at all whatsoever"),
    (4L, "tiny"),                     // < windowTokens tokens
    (5L, null.asInstanceOf[String])
  ).toDF("id", "text")

  private def fps(w: Int) =
    NgramOverlap.winnowFingerprints(docs, "id", "text",
      windowTokens = 4, winnowWindow = w)

  test("the winnowing guarantee: a 7-token shared run shares >= 1 fingerprint") {
    val f = fps(4).as[(Long, Long)].collect()
    val a = f.filter(_._1 == 1L).map(_._2).toSet
    val b = f.filter(_._1 == 2L).map(_._2).toSet
    assert((a & b).nonEmpty)
  }

  test("disjoint documents share no fingerprints") {
    val f = fps(4).as[(Long, Long)].collect()
    val a = f.filter(_._1 == 1L).map(_._2).toSet
    val c = f.filter(_._1 == 3L).map(_._2).toSet
    assert((a & c).isEmpty)
  }

  test("winnowWindow=1 keeps every distinct window hash; larger w only prunes") {
    val all = fps(1).as[(Long, Long)].collect().toSet
    val w4 = fps(4).as[(Long, Long)].collect().toSet
    assert(w4.subsetOf(all))
    assert(w4.size < all.size) // density actually drops on these docs
    // w=1 equals the distinct per-doc window-hash sets: doc 3 has
    // 9 tokens => 6 windows, all distinct grams here
    assert(all.count(_._1 == 3L) == 6)
  }

  test("short and NULL docs contribute nothing") {
    val f = fps(4).as[(Long, Long)].collect()
    assert(!f.exists(r => r._1 == 4L || r._1 == 5L))
  }

  test("winnowOverlap surfaces the planted pair and nothing else") {
    val train = docs.where(col("id") === 1L || col("id") === 3L)
    val ev = docs.where(col("id") === 2L)
    val got = NgramOverlap.winnowOverlap(train, ev, "id", "text",
        windowTokens = 4, winnowWindow = 4, minShared = 1L)
      .select("id_train", "id_eval", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    assert(got.head._3 >= 1L)
    // raising minShared above the pair's count empties the result
    val none = NgramOverlap.winnowOverlap(train, ev, "id", "text",
      windowTokens = 4, winnowWindow = 4, minShared = got.head._3 + 1)
    assert(none.count() == 0)
  }
}
