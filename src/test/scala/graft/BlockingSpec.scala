package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Blocking

/** Sorted-neighborhood blocking: the chunked global rank must equal the
  * single-window row_number bit for bit, and the candidate set must be
  * EXACTLY the rank-gap < window pairs. */
class BlockingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, "apple"), (2L, "apply"), (3L, "banana"), (4L, "band"),
    (5L, "bandit"), (6L, "candle"), (7L, "apple"), // duplicate key
    (8L, "zebra"), (9L, ""), (10L, null.asInstanceOf[String])
  ).toDF("id", "k")

  private val nonNull = rows.where(col("k").isNotNull)

  test("chunked globalRank == single-window row_number, for several chunkings") {
    val want = nonNull
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
      .select("id", "rn").as[(Long, Int)].collect().toMap
    for (chunk <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        k => substring(k, 1, 1),
        k => substring(k, 1, 2),
        _ => lit(0))) {
      val got = Blocking.globalRank(nonNull, Seq(col("k"), col("id")),
          chunk(col("k")))
        .select("id", "rn").as[(Long, Long)].collect().toMap
      assert(got.view.mapValues(_.toInt).toMap == want, s"chunking $chunk")
    }
  }

  test("candidates are exactly the rank-gap < window pairs; nulls absent") {
    val w = 3
    val rn = nonNull
      .withColumn("rn", row_number().over(Window.orderBy(col("k"), col("id"))))
      .select("id", "rn").as[(Long, Int)].collect().toMap
    val want = (for {
      (a, ra) <- rn; (b, rb) <- rn
      if rb > ra && rb - ra < w
    } yield (a, b, (rb - ra).toLong)).toSet
    val got = Blocking.sortedNeighborhoodPairs(rows, "id", col("k"), w)
      .select("id_a", "id_b", "gap").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(!got.exists(p => p._1 == 10L || p._2 == 10L))
    // exact candidate volume: n(w-1) - w(w-1)/2
    val n = rn.size
    assert(got.size == n * (w - 1) - w * (w - 1) / 2)
  }

  test("duplicate keys are window-adjacent (the dedup case cannot be missed)") {
    val got = Blocking.sortedNeighborhoodPairs(rows, "id", col("k"), 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 7L))) // the two "apple" rows
  }

  test("multi-pass union: normalized, distinct, and a superset of each pass") {
    val keys = Seq(col("k"), reverse(col("k")))
    val multi = Blocking.multiPassPairs(rows, "id", keys, window = 3)
      .as[(Long, Long)].collect().toSet
    for (k <- keys) {
      val pass = Blocking.sortedNeighborhoodPairs(rows, "id", k, 3)
        .select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")))
        .as[(Long, Long)].collect().toSet
      assert(pass.subsetOf(multi))
    }
    assert(multi.forall(p => p._1 < p._2))
    // the reversed pass must contribute pairs the forward pass misses:
    // "band"/"bandit" sort adjacent forward; "apple"/"apply" adjacent
    // both ways; but e.g. keys ending alike meet only reversed — just
    // pin the union is strictly larger than the forward pass here
    val fwd = Blocking.sortedNeighborhoodPairs(rows, "id", col("k"), 3)
      .select(least(col("id_a"), col("id_b")), greatest(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toSet
    assert(multi.size > fwd.size)
  }

  test("reserved-name guard trips") {
    val bad = Seq((1L, "x", 0L)).toDF("id", "k", "rn")
    intercept[IllegalArgumentException] {
      Blocking.globalRank(bad, Seq(col("k")), lit(0))
    }
  }
}
