package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sessionize

class SessionWindowSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000)

  test("sessionWindowRollup: inclusive gap boundary like sessions; end = last + gap") {
    // gaps: 10s (merge), exactly 60s (merges too: next_start <= prev_end),
    // 61s (splits)
    val df = Seq(("u", ts(0), 1.0), ("u", ts(10), 2.0), ("u", ts(70), 4.0), ("u", ts(131), 8.0))
      .toDF("user_id", "ts", "value")
    val sw = Sessionize.sessionWindowRollup(df, Seq("user_id"), "ts", "60 seconds", "value")
      .orderBy("session_start").collect()
    assert(sw.length == 2, s"expected the 61s gap (only) to split: ${sw.mkString(";")}")
    assert(sw(0).getAs[Long]("n_events") == 3 && sw(0).getAs[Double]("sum_value") == 7.0)
    assert(sw(0).getAs[java.sql.Timestamp]("session_start") == ts(0))
    assert(sw(0).getAs[java.sql.Timestamp]("session_end") == ts(130)) // last(70) + 60
    // boundary parity with the lag-based form (its session_end is the
    // last event instead)
    val lagBased = Sessionize.sessions(df, Seq("user_id"), "ts", 60, "value")
      .orderBy("session").collect()
    assert(lagBased.length == 2)
    assert(lagBased(0).getAs[Long]("n_events") == 3)
  }
}

class SessionizeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap splits sessions; boundary gap == gapSeconds stays in session") {
    val d = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1.0),
      ("u1", ts("2024-01-01 00:10:00"), 2.0), // gap 600s = gap -> same session
      ("u1", ts("2024-01-01 00:20:01"), 3.0), // gap 601s > 600 -> new session
      ("u1", ts("2024-01-01 00:25:00"), 4.0),
      ("u2", ts("2024-01-01 00:00:00"), 5.0)  // other key independent
    ).toDF("user_id", "t", "v")
    val r = Sessionize.withSessionId(d, Seq("user_id"), "t", gapSeconds = 600)
      .collect().map(x => (x.getString(0), x.getTimestamp(1)) -> x.getLong(3)).toMap
    assert(r(("u1", ts("2024-01-01 00:00:00"))) == 0L)
    assert(r(("u1", ts("2024-01-01 00:10:00"))) == 0L)
    assert(r(("u1", ts("2024-01-01 00:20:01"))) == 1L)
    assert(r(("u1", ts("2024-01-01 00:25:00"))) == 1L)
    assert(r(("u2", ts("2024-01-01 00:00:00"))) == 0L)
  }

  test("sessions() aggregates bounds and counts per session") {
    val d = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 1.5),
      ("u1", ts("2024-01-01 00:01:00"), 2.5),
      ("u1", ts("2024-01-01 02:00:00"), 4.0)
    ).toDF("user_id", "t", "v")
    val r = Sessionize.sessions(d, Seq("user_id"), "t", 600, "v")
      .collect().map(x => x.getLong(1) -> (x.getTimestamp(2), x.getTimestamp(3), x.getLong(4), x.getDouble(5))).toMap
    assert(r(0L) == ((ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00"), 2L, 4.0)))
    assert(r(1L) == ((ts("2024-01-01 02:00:00"), ts("2024-01-01 02:00:00"), 1L, 4.0)))
  }
}
