package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Funnel, MultiDim}

class FunnelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // u1 completes the whole funnel in order; u2 views BEFORE signing up
  // (its view must not count) and never purchases; u3 purchases before
  // any signup (nothing past step 0 counts); u4 never signs up.
  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "signup"),
    (1L, ts("2024-01-01 11:00:00"), "view"),
    (1L, ts("2024-01-02 09:00:00"), "purchase"),
    (2L, ts("2024-01-01 08:00:00"), "view"),
    (2L, ts("2024-01-01 09:00:00"), "signup"),
    (2L, ts("2024-01-03 09:00:00"), "view"),
    (3L, ts("2024-01-01 10:00:00"), "purchase"),
    (3L, ts("2024-01-01 11:00:00"), "signup"),
    (4L, ts("2024-01-05 10:00:00"), "view")
  ).toDF("user_id", "ts", "event_type")

  private val steps = Seq("signup", "view", "purchase")

  test("stepTimes enforces strict ordering between steps") {
    val r = Funnel.stepTimes(events, "user_id", "ts", "event_type", steps)
      .collect().map(x => x.getLong(0) ->
        (x.getTimestamp(1), x.getTimestamp(2), x.getTimestamp(3))).toMap
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(r(1L) == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), ts("2024-01-02 09:00:00"))))
    // u2: pre-signup view ignored, later view counts, no purchase
    assert(r(2L) == ((ts("2024-01-01 09:00:00"), ts("2024-01-03 09:00:00"), null)))
    // u3: purchase precedes signup -> only step 0
    assert(r(3L) == ((ts("2024-01-01 11:00:00"), null, null)))
    assert(r(4L) == ((null, null, null)))
  }

  test("funnelCounts reports reach and per-step conversion") {
    val r = Funnel.funnelCounts(events, "user_id", "ts", "event_type", steps)
      .orderBy("step").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(r == Seq(
      (0L, "signup", 3L, None),
      (1L, "view", 2L, Some(0.666667)),
      (2L, "purchase", 1L, Some(0.5))))
  }

  test("stepTimes plans a single exchange for the stacked windows") {
    val plan = Funnel.stepTimes(events, "user_id", "ts", "event_type", steps)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // one shuffle for the shared user_id windows + one for distinct
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$plan")
  }

  test("retention builds the cohort triangle with offset 0 = full cohort") {
    val r = Funnel.retention(events, "user_id", "ts")
      .collect().map(x => (x.getDate(0).toString, x.getLong(1)) -> x.getLong(2)).toMap
    // cohorts: 2024-01-01 {u1,u2,u3}, 2024-01-05 {u4}
    assert(r(("2024-01-01", 0L)) == 3L)
    assert(r(("2024-01-01", 1L)) == 1L) // u1 active on day+1
    assert(r(("2024-01-01", 2L)) == 1L) // u2 active on day+2
    assert(r(("2024-01-05", 0L)) == 1L)
    assert(r.size == 4)
  }

  test("rollup emits all prefix levels with grouping ids") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L)).toDF("k1", "k2", "v")
    val r = MultiDim.rollupAgg(df, Seq("k1", "k2"), Seq(sum($"v").as("s")))
      .collect().map(x => (Option(x.getString(0)), Option(x.getString(1)),
        x.getLong(2), x.getLong(3))).toSet
    assert(r == Set(
      (Some("a"), Some("x"), 0L, 1L), (Some("a"), Some("y"), 0L, 2L),
      (Some("b"), Some("x"), 0L, 4L),
      (Some("a"), None, 1L, 3L), (Some("b"), None, 1L, 4L),
      (None, None, 3L, 7L)))
  }

  test("groupingSets computes exactly the requested sets") {
    val df = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 4L)).toDF("k1", "k2", "v")
    val r = MultiDim.groupingSetsAgg(df, Seq("k1", "k2"),
        Seq(Seq("k1"), Seq("k2")), Seq(sum($"v").as("s")))
      .collect().map(x => (Option(x.getString(0)), Option(x.getString(1)),
        x.getLong(2), x.getLong(3))).toSet
    assert(r == Set(
      (Some("a"), None, 1L, 3L), (Some("b"), None, 1L, 4L),
      (None, Some("x"), 2L, 5L), (None, Some("y"), 2L, 2L)))
  }
}
