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

  test("scd2Intervals: run-collapse, NULL payload equality, half-open intervals") {
    val log = Seq(
      (1L, Some("x"), 0L), (1L, Some("x"), 1L), (1L, Some("y"), 2L), // re-state at v1 collapses
      (2L, None, 0L), (2L, None, 1L), (2L, Some("z"), 2L),           // NULL == NULL collapses
      (3L, Some("q"), 5L)                                            // single row -> open interval
    ).toDF("k", "v", "ver")
    val got = Upsert.scd2Intervals(log, Seq("k"), "ver", Seq("v"))
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, Some("x"), 0L, Some(2L)), (1L, Some("y"), 2L, None),
      (2L, None, 0L, Some(2L)), (2L, Some("z"), 2L, None),
      (3L, Some("q"), 5L, None)))
  }

  test("scd2Upsert: day-by-day roll == scd2Intervals from scratch; absent keys untouched") {
    // day 0: keys 1-3; day 1: 1 changes, 2 re-states (must NOT open an
    // interval), 4 is new; day 2: 1 changes back, 4 changes, 3 absent
    val days = Seq(
      Seq((1L, Some("a"), 0L), (2L, Some("b"), 0L), (3L, Some("c"), 0L)),
      Seq((1L, Some("a2"), 1L), (2L, Some("b"), 1L), (4L, Some("d"), 1L)),
      Seq((1L, Some("a"), 2L), (4L, Some("d2"), 2L)))
      .map(_.toDF("k", "v", "ver"))
    val scratch = Upsert.scd2Intervals(days.reduce(_ unionByName _),
      Seq("k"), "ver", Seq("v"))
    val rolled = days.tail.foldLeft(
      Upsert.scd2Intervals(days.head, Seq("k"), "ver", Seq("v")))(
      (h, b) => Upsert.scd2Upsert(h, b, Seq("k"), "ver", Seq("v")))
    val cols = Seq("k", "v", "valid_from", "valid_to")
    assert(rolled.select(cols.map(col): _*).orderBy("k", "valid_from").collect().toSeq
      == scratch.select(cols.map(col): _*).orderBy("k", "valid_from").collect().toSeq,
      "incremental SCD2 must equal the from-scratch interval build")
    // spot facts: key 2 has ONE open interval (re-state collapsed);
    // key 3 untouched open; key 1 has three intervals
    val byK = rolled.orderBy("k", "valid_from").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byK == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("scd2SnapshotAt == latest-changelog-at-t; scd2JoinAsOf covers each fact's own version") {
    val days = Seq(
      Seq((1L, "a", 0L), (2L, "b", 0L)),
      Seq((1L, "a2", 1L), (3L, "c", 1L)),
      Seq((1L, "a3", 2L)))
      .map(_.toDF("k", "v", "ver"))
    val log = days.reduce(_ unionByName _)
    val hist = Upsert.scd2Intervals(log, Seq("k"), "ver", Seq("v"))
    // point-in-time snapshot == SCD1 latest over the changelog prefix
    for (t <- 0L to 2L) {
      val snap = Upsert.scd2SnapshotAt(hist, lit(t))
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = Upsert.latestByOrder(log.where(col("ver") <= t), Seq("k"), Seq(col("ver")))
        .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(snap == want, s"t=$t: $snap != $want")
    }
    // facts: version 3 (past the last change) reads the open row;
    // key 3 at version 0 predates its history -> drops (inner)
    val facts = Seq((1L, 0L), (1L, 1L), (1L, 3L), (2L, 2L), (3L, 0L)).toDF("k", "fver")
    val j = Upsert.scd2JoinAsOf(facts, hist, Seq("k"), "fver")
      .select("k", "fver", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(j == Set((1L, 0L, "a"), (1L, 1L, "a2"), (1L, 3L, "a3"), (2L, 2L, "b")))
  }
}
