package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("pointInterval matches the naive range predicate exactly") {
    val points = Seq((1L, 0.1), (2L, 5.0), (3L, 9.99), (4L, -3.2), (5L, 100.0))
      .toDF("p_id", "v")
    val intervals = Seq((10L, 0.0, 1.0), (11L, 4.0, 10.0), (12L, -5.0, -1.0),
        (13L, 9.99, 9.99), (14L, 50.0, 20.0)) // lo > hi: matches nothing
      .toDF("i_id", "lo", "hi")
    for (width <- Seq(0.5, 1.0, 7.0)) {
      val got = RangeJoin.pointInterval(points, "v", intervals, "lo", "hi", width)
        .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 11L), (3L, 11L), (3L, 13L), (4L, 12L)),
        s"width $width")
    }
  }

  test("pointInterval never emits duplicate pairs for multi-cell intervals") {
    val points = Seq((1L, 2.0)).toDF("p_id", "v")
    val intervals = Seq((10L, 0.0, 100.0)).toDF("i_id", "lo", "hi") // spans many cells
    val got = RangeJoin.pointInterval(points, "v", intervals, "lo", "hi", 1.0).count()
    assert(got == 1L)
  }

  test("neighborStats equals the brute-force distance self-join") {
    val df = (1L to 60L).map(i => (i, (i * 37 % 100) / 7.0)).toDF("id", "v")
    val eps = 0.5
    val brute = df.as("a").join(df.as("b"),
        col("b.v") >= col("a.v") - eps && col("b.v") <= col("a.v") + eps
          && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id"))
      .agg(count(lit(1)).as("n_near"), min(col("b.v")).as("min_near"),
        max(col("b.v")).as("max_near"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = RangeJoin.neighborStats(df, "id", "v", eps)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == brute)
  }

  test("the bucketed plan has no nested-loop or cartesian join") {
    val df = (1L to 20L).map(i => (i, i / 3.0)).toDF("id", "v")
    val plan = RangeJoin.neighborStats(df, "id", "v", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected pure equality joins, plan:\n$plan")
  }
}
