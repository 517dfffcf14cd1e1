package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Upsert

class UpsertSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 5L), (2L, "b", 5L), (3L, "c", 5L)
  ).toDF("k", "v", "ver")

  test("upsertLatest: version wins, side breaks version ties, batch collapses, inserts pass") {
    val ups = Seq(
      (1L, "a2", 6L),  // newer -> replaces
      (2L, "b2", 4L),  // OLDER than base -> base keeps (latest-wins, not blind apply)
      (3L, "c2", 5L),  // same version -> update side wins
      (4L, "d", 1L),   // new key -> insert
      (4L, "d2", 2L),  // second update for the same new key -> latest
      (1L, "a3", 6L)   // same key+version twice in the batch -> payload
                       // tail decides deterministically (max lexicographic)
    ).toDF("k", "v", "ver")
    val got = Upsert.upsertLatest(base, ups, Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ("a3", 6L), // ties on (ver, side), "a3" > "a2" in the payload tail
      2L -> ("b", 5L),
      3L -> ("c2", 5L),
      4L -> ("d2", 2L)))
    // determinism under partitioning
    val got7 = Upsert.upsertLatest(base.repartition(7), ups.repartition(5), Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got7 == got)
  }

  test("upsertLatest: NULL version never beats a real one; tie-break column honored") {
    val ups = Seq((1L, "x", Option.empty[Long]), (2L, "y", Some(9L)))
      .toDF("k", "v", "ver")
    val b = Seq((1L, "keep", Option(5L)), (2L, "old", Option(5L))).toDF("k", "v", "ver")
    val got = Upsert.upsertLatest(b, ups, Seq("k"), "ver")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "keep", 2L -> "y"))
    // explicit tie-break: same key/ver/side, tb decides
    val b2 = Seq((1L, "p", 1L, 0L)).toDF("k", "v", "ver", "tb")
    val u2 = Seq((1L, "q", 1L, 2L), (1L, "r", 1L, 1L)).toDF("k", "v", "ver", "tb")
    val w = Upsert.upsertLatest(b2, u2, Seq("k"), "ver", tieBreak = Seq("tb"))
      .collect().map(r => (r.getString(1), r.getLong(3))).toSeq
    assert(w == Seq(("q", 2L)))
    intercept[IllegalArgumentException] {
      Upsert.upsertLatest(b2, u2.drop("tb"), Seq("k"), "ver")
    }
  }
}
