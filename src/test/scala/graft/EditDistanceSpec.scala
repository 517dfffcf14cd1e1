package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Sampling}

/** FastSS edit-distance pairs: candidates must have recall 1 (the
  * deletion-neighborhood theorem), so pairs == brute-force all-pairs
  * levenshtein — plus the keep-first dedup form and the leakage-free
  * k-fold assignment that rides the same cluster labels. */
class EditDistanceSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // strings engineered to cover equal / substitution / insertion /
  // deletion / transposition (dist 2 under plain Levenshtein) / far
  private val rows = Seq(
    (1L, "hello world"), (2L, "hello world"),   // equal
    (3L, "hello worlb"),                        // substitution of 1
    (4L, "hello worlds"),                       // insertion
    (5L, "hello worl"),                         // deletion
    (6L, "hello wrold"),                        // transposition = dist 2
    (7L, "completely different"), (8L, ""),     // far + empty
    (9L, "a"), (10L, "b"),                      // dist 1 tiny
    (11L, null.asInstanceOf[String])            // null key
  ).toDF("id", "k")

  private def brute(maxDist: Int): Set[(Long, Long, Long)] =
    rows.where(col("k").isNotNull).as("a")
      .join(rows.where(col("k").isNotNull).as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.k"), col("b.k")).cast("long").as("d"))
      .where(col("d") <= maxDist)
      .as[(Long, Long, Long)].collect().toSet

  test("pairs == brute force at maxDist=1") {
    val got = Dedup.editDistancePairs(rows, "id", col("k"), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(1))
    assert(got.nonEmpty)
  }

  test("pairs == brute force at maxDist=2 (covers transpositions)") {
    val got = Dedup.editDistancePairs(rows, "id", col("k"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute(2))
    // the transposition pair is dist 2 — present at d=2, absent at d=1
    assert(got.exists(p => p._1 == 1L && p._2 == 6L && p._3 == 2L))
    assert(!brute(1).exists(p => p._2 == 6L))
  }

  test("null keys are absent; empty-string key participates") {
    val got = Dedup.editDistancePairs(rows, "id", col("k"), maxDist = 1)
      .as[(Long, Long, Long)].collect()
    assert(!got.exists(p => p._1 == 11L || p._2 == 11L))
    // "" vs "a" and "" vs "b" are dist 1
    assert(got.count(p => p._2 == 8L || p._1 == 8L) >= 2)
  }

  test("maxKeyLen guard fail-fasts on an over-long key") {
    val long = Seq((1L, "x" * 100)).toDF("id", "k")
    val e = intercept[Exception] {
      Dedup.editDistancePairs(long, "id", col("k"), maxDist = 1, maxKeyLen = 64)
        .collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).mkString
    assert(chain.contains("maxKeyLen"))
  }

  test("keep-first dedup drops exactly the larger-id members of pairs") {
    val kept = Dedup.editDistanceDedup(rows, "id", col("k"), maxDist = 1)
      .select("id").as[Long].collect().toSet
    val droppable = brute(1).map(_._2)
    assert(kept == rows.select("id").as[Long].collect().toSet -- droppable)
    // null-key row survives (never a pair member)
    assert(kept.contains(11L))
  }

  test("maxBucketSize cap only prunes; capped result is a subset") {
    val all = Dedup.editDistancePairs(rows, "id", col("k"), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    val capped = Dedup.editDistancePairs(rows, "id", col("k"), maxDist = 1,
        maxBucketSize = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(all))
  }

  // ---- clusterKFold ----

  private val labels = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L),   // one 3-member cluster
    (5L, 5L), (6L, 5L)              // one 2-member cluster
  ).toDF("id", "cluster_id")

  private val docs = (1L to 8L).map(i => (i, s"doc$i")).toDF("doc_id", "t")

  test("clusterKFold: cluster members share a fold; folds are in [0,k)") {
    val f = Dedup.clusterKFold(docs, "doc_id", labels, k = 3, salt = 11)
      .select("doc_id", "rep_id", "fold")
      .as[(Long, Long, Long)].collect().toMap2
    assert(f(1L)._2 == f(2L)._2 && f(2L)._2 == f(3L)._2)
    assert(f(5L)._2 == f(6L)._2)
    assert(f.values.forall(v => v._2 >= 0 && v._2 < 3))
    // singletons represent themselves
    assert(f(4L)._1 == 4L && f(7L)._1 == 7L)
  }

  test("clusterKFold matches the direct bucket-mod rule") {
    val f = Dedup.clusterKFold(docs, "doc_id", labels, k = 5, salt = 7)
      .select("rep_id", "fold").as[(Long, Long)].collect()
    val direct = docs.select(col("doc_id"))
      .withColumn("b", Sampling.bucket(col("doc_id").cast("long"), 7) % 5)
      .as[(Long, Long)].collect().toMap
    f.foreach { case (rep, fold) => assert(fold == direct(rep), s"rep $rep") }
  }

  // (helper kept at the bottom so the tests read top-down)
  private implicit class MapOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
