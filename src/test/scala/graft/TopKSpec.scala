package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, GroupByReduce}

/** Bounded grouped top-k (TopKByScore) must equal the row_number-window
  * idiom it replaces, under any partitioning, while planning as a hash
  * aggregation (k-bounded shuffle) instead of a window (full shuffle+sort). */
class TopKSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(42L)
  private def data = (0 until 600).map { i =>
    val v = rnd.nextInt(6) match {
      case 0 => Double.NaN
      case 1 => rnd.nextInt(5).toDouble // score ties across rows
      case _ => rnd.nextDouble() * 100
    }
    (i % 7, v, i.toLong)
  }

  private def topkAgg(df: DataFrame, k: Int): Map[Int, Seq[(Double, Long)]] =
    GroupByReduce.reduce(df, Seq("g"), Seq(Agg("topk", "v", "top", k = k)),
      pos = Some(col("id")))
      .select(col("g"), col("top"))
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getDouble(0), s.getLong(1)))
      }.toMap

  private def topkWindow(df: DataFrame, k: Int): Map[Int, Seq[(Double, Long)]] = {
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    df.where(col("v").isNotNull && !isnan(col("v")))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .groupBy("g").agg(collect_list(struct(col("rk"), col("v"), col("id"))).as("t"))
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .sortBy(_.getInt(0)).map(s => (s.getDouble(1), s.getLong(2)))
      }.toMap
  }

  test("topk equals the row_number window idiom (ties, NaN, any partitioning)") {
    val df = data.toDF("g", "v", "id")
    for (parts <- Seq(1, 8); k <- Seq(1, 5, 23)) {
      val d = df.repartition(parts)
      assert(topkAgg(d, k) == topkWindow(d, k), s"parts=$parts k=$k")
    }
  }

  test("k larger than the group returns all valid rows, best first") {
    val df = Seq((0, 3.0, 10L), (0, 7.0, 11L), (0, Double.NaN, 12L)).toDF("g", "v", "id")
    assert(topkAgg(df, 100) == Map(0 -> Seq((7.0, 11L), (3.0, 10L))))
  }

  test("all-invalid group yields NULL top array") {
    val df = Seq((0, Double.NaN, 1L), (1, 2.0, 2L)).toDF("g", "v", "id")
    val rows = GroupByReduce.reduce(df, Seq("g"),
      Seq(Agg("topk", "v", "top", k = 3)), pos = Some(col("id")))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(rows == Map(0 -> true, 1 -> false))
  }

  test("equal scores break ties toward the smaller id deterministically") {
    val df = (0 until 50).map(i => (0, 5.0, i.toLong)).toDF("g", "v", "id")
    assert(topkAgg(df.repartition(8), 3) ==
      Map(0 -> Seq((5.0, 0L), (5.0, 1L), (5.0, 2L))))
  }

  test("bottomk equals the ascending window idiom (negation round-trips scores)") {
    val df = data.toDF("g", "v", "id").repartition(5)
    val got = GroupByReduce.reduce(df, Seq("g"),
      Seq(Agg("bottomk", "v", "bot", k = 4)), pos = Some(col("id")))
      .select(col("g"), col("bot"))
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getDouble(0), s.getLong(1)))
      }.toMap
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val want = df.where(col("v").isNotNull && !isnan(col("v")))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
      .groupBy("g").agg(collect_list(struct(col("rk"), col("v"), col("id"))).as("t"))
      .collect().map { r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .sortBy(_.getInt(0)).map(s => (s.getDouble(1), s.getLong(2)))
      }.toMap
    assert(got == want)
  }

  test("topKRows returns the original top-k rows per group via broadcast semi-join") {
    val df = data.toDF("g", "v", "id").repartition(6)
    val got = GroupByReduce.topKRows(df, Seq("g"), "v", 4, col("id"))
      .select("id").as[Long].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val want = df.where(col("v").isNotNull && !isnan(col("v")))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
      .select("id").as[Long].collect().toSet
    assert(got == want)
    val small = GroupByReduce.topKRows(df, Seq("g"), "v", 2, col("id"), largest = false)
      .select("id").as[Long].collect().toSet
    val wantSmall = df.where(col("v").isNotNull && !isnan(col("v")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)))
      .where(col("rk") <= 2).select("id").as[Long].collect().toSet
    assert(small == wantSmall)
    val p = GroupByReduce.topKRows(df, Seq("g"), "v", 4, col("id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi join-back:\n$p")
  }

  test("topk/bottomk accept integer/long/float32 value columns (cast like numeric-view funcs)") {
    val df = Seq((0, 3, 10L), (0, 9, 11L), (0, 5, 12L)).toDF("g", "v", "id")
    def ids(func: String) = GroupByReduce.reduce(df, Seq("g"),
      Seq(Agg(func, "v", "top", k = 2)), pos = Some(col("id")))
      .select(col("top").getField("id")).as[Seq[Long]].head()
    assert(ids("topk") == Seq(11L, 12L))
    assert(ids("bottomk") == Seq(10L, 12L))
    val f32 = Seq((0, 3.5f, 1L), (0, 9.5f, 2L)).toDF("g", "v", "id")
    assert(GroupByReduce.reduce(f32, Seq("g"),
      Seq(Agg("topk", "v", "top", k = 1)), pos = Some(col("id")))
      .select(col("top").getField("score")).as[Seq[Double]].head() == Seq(9.5))
  }

  test("heap buffers grow with the data, not the requested k (ADVICE r4)") {
    // A huge k over small groups must not eagerly pin k*16 bytes per
    // (partition, group) buffer: capacity grows geometrically up to k.
    val h = new graft.expressions.TopKHeap(1 << 20)
    assert(h.scores.length == 16, "fresh buffer must start small")
    (0 until 100).foreach(i => h.offer(i.toDouble, i.toLong))
    assert(h.size == 100 && h.scores.length < 300,
      s"capacity ${h.scores.length} should track data (100 rows), not k")
    val best = h.sortedBestFirst()
    assert(best.take(3).toSeq == Seq((99.0, 99L), (98.0, 98L), (97.0, 97L)))
    // growth never exceeds k, and a tiny k still caps correctly
    val h2 = new graft.expressions.TopKHeap(3)
    (0 until 50).foreach(i => h2.offer(i.toDouble, i.toLong))
    assert(h2.size == 3 && h2.scores.length == 3)
    assert(h2.sortedBestFirst().toSeq == Seq((49.0, 49L), (48.0, 48L), (47.0, 47L)))
    // end-to-end: a giant k behaves like "all rows, sorted"
    val df = Seq((0, 1.0, 1L), (0, 5.0, 2L), (1, 2.0, 3L)).toDF("g", "v", "id")
    val r = GroupByReduce.reduce(df, Seq("g"),
      Seq(Agg("topk", "v", "top", k = 1 << 20)), pos = Some(col("id")))
      .select(col("g"), col("top").getField("id").as("ids"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(r(0) == Seq(2L, 1L) && r(1) == Seq(3L))
  }

  test("plan: hash aggregation with partial/final split, no Window") {
    val df = data.toDF("g", "v", "id")
    val p = GroupByReduce.reduce(df, Seq("g"),
      Seq(Agg("topk", "v", "top", k = 5)), pos = Some(col("id")), sort = false)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window leaked into the top-k plan:\n$p")
    assert(p.contains("partial_graft_topk") || p.contains("graft_topk"),
      s"expected the typed aggregate:\n$p")
  }
}
