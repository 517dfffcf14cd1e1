package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Validate

class ValidateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("report: NULL predicate is a violation; one row per check; single-pass") {
    val df = Seq(
      (Some(5.0), "x"), (Some(60.0), "y"), (None, "z"), (Some(10.0), null)
    ).toDF("q", "s")
    val r = Validate.report(df, Seq(
      "q_range" -> col("q").between(1, 50),   // 60 violates, NULL violates
      "s_not_null" -> col("s").isNotNull))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map("q_range" -> ((4L, 2L)), "s_not_null" -> ((4L, 1L))))
    // all check sums ride ONE aggregate: a single scan of the input
    val plan = Validate.report(df, Seq("a" -> col("q").isNotNull,
      "b" -> col("s").isNotNull)).queryExecution.executedPlan.toString
    assert("(LocalTableScan|Scan ExistingRDD|FileScan)".r.findAllIn(plan).length == 1, plan)
    intercept[IllegalArgumentException] {
      Validate.report(df, Seq("dup" -> lit(true), "dup" -> lit(false)))
    }
  }

  test("profile: per-column nulls/ndv/extrema in one scan, mixed types stringified") {
    val df = Seq(
      (Some(3L), "b", Some(2.5)), (Some(1L), "a", None),
      (None: Option[Long], "b", Some(7.5))
    ).toDF("x", "s", "v")
    val r = Validate.profile(df, Seq("x", "s", "v"))
      .collect().map(p => p.getString(0) ->
        ((p.getLong(1), p.getLong(2), p.getLong(3), p.getString(4), p.getString(5)))).toMap
    assert(r("x") == ((3L, 1L, 2L, "1", "3")))
    assert(r("s") == ((3L, 0L, 2L, "a", "b")))
    assert(r("v") == ((3L, 1L, 2L, "2.5", "7.5")))
    val plan = Validate.profile(df, Seq("x", "s")).queryExecution.executedPlan.toString
    assert("(LocalTableScan|Scan ExistingRDD|FileScan)".r.findAllIn(plan).length == 1, plan)
  }

  test("snapshotDiff: added/removed/changed/unchanged; null-safe compare") {
    val o = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d"))).toDF("k", "v")
    val n = Seq((1L, Some("a")),                    // unchanged
      (2L, Some("B")),                              // changed
      (3L, None: Option[String]),                   // NULL == NULL -> unchanged
      (5L, Some("e"))).toDF("k", "v")               // added; 4 removed
    val r = Validate.snapshotDiff(o, n, Seq("k"), Seq("v")).head()
    assert(r.toSeq == Seq(4L, 4L, 1L, 1L, 1L, 2L),
      s"(n_old, n_new, n_added, n_removed, n_changed, n_unchanged) got ${r.toSeq}")
    // NULL vs value counts as changed
    val r2 = Validate.snapshotDiff(o, n.withColumn("v",
        when(col("k") === 3L, lit("now-set")).otherwise(col("v"))),
      Seq("k"), Seq("v")).head()
    assert(r2.getLong(4) == 2L && r2.getLong(5) == 1L)
  }

  test("duplicateKeys and orphans summaries") {
    val child = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"), (Some(3L), "d"),
      (None: Option[Long], "e")
    ).toDF("fk", "v")
    val dup = Validate.duplicateKeys(child, Seq("fk")).head()
    assert((dup.getLong(0), dup.getLong(1), dup.getLong(2)) == ((4L, 1L, 2L)))
    val parent = Seq(1L, 2L).toDF("pk")
    val o = Validate.orphans(child, parent, "fk", "pk").head()
    // key 3 (1 row) + NULL key (1 row) are orphans
    assert((o.getLong(0), o.getLong(1)) == ((5L, 2L)))
  }
}
