package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, AggState, GroupByReduce}

/** Mergeable aggregate states: finalize(merge(state-per-partition)) must
  * equal the direct grouped reduction bit-for-bit, for any grouping of
  * the partition axis (associativity), including NULL/NaN rows and
  * all-invalid groups. */
class AggStateSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    // (key, day, value) — day is the ingestion partition axis
    ("a", 1, Some(10.5)), ("a", 1, Some(11.25)), ("a", 2, Some(9.0)),
    ("a", 3, None), ("a", 3, Some(Double.NaN)),
    ("b", 1, Some(100.0)), ("b", 2, Some(100.0)),
    ("c", 1, None), ("c", 2, Some(Double.NaN)) // all-invalid group
  ).toDF("k", "day", "v")

  test("finalize(merge(per-day states)) == direct reduction, bit for bit") {
    val daily = AggState.state(fixture, Seq("k", "day"), "v", scale = 2)
    val got = AggState.finalize(AggState.merge(daily, Seq("k")), ddof = 1)
      .select("k", "n_rows", "n_valid", "mean", "var", "std", "mn", "mx")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

    val direct = GroupByReduce.reduce(fixture, Seq("k"),
      Seq(Agg("nanmean", "v", "mean", exactScale = Some(2)),
        Agg("nanvar", "v", "var", ddof = 1, exactScale = Some(2)),
        Agg("nanstd", "v", "std", ddof = 1, exactScale = Some(2)),
        Agg("nanmin", "v", "mn"), Agg("nanmax", "v", "mx")), sort = false)
      .collect().map(r => r.getString(0) ->
        Seq(r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))).toMap

    for (k <- Seq("a", "b", "c")) {
      val (mean, vr, sd, mn, mx) = (got(k)(2), got(k)(3), got(k)(4), got(k)(5), got(k)(6))
      assert(Seq(mean, vr, sd, mn, mx) == direct(k), s"key $k: $got vs $direct")
    }
    assert(got("a").take(2) == Seq(5L, 3L)) // n_rows counts all, n_valid skips NULL+NaN
    assert(got("c")(1) == 0L && got("c")(2) == null && got("c")(5) == null)
    // b: constant group -> var exactly 0 (clamp), std 0
    assert(got("b")(3) == 0.0 && got("b")(4) == 0.0)
  }

  test("distinct-count states: merged estimate == direct estimate == exact at small cardinality") {
    val rows = (1 to 500).map(i => (i % 3, i % 7, (i % 40).toLong))
      .toDF("k", "day", "v")
    val merged = AggState.estimateDistinct(AggState.mergeDistinct(
        AggState.stateDistinct(rows, Seq("k", "day"), "v"), Seq("k")))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val direct = AggState.estimateDistinct(
        AggState.stateDistinct(rows, Seq("k"), "v"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(merged == direct, "register-wise max must equal the one-shot sketch")
    // HLL is exact far below 2^lgK: 40 distinct values estimate exactly
    val exact = rows.groupBy("k").agg(countDistinct(col("v")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == exact)
  }

  test("merge is associative: day-merge-then-total == merge-all-at-once") {
    val daily = AggState.state(fixture, Seq("k", "day"), "v", scale = 2)
    // route A: collapse days pairwise (1,2 -> stage) then fold in 3
    val stage = AggState.merge(daily.where(col("day") <= 2), Seq("k"))
      .unionByName(daily.where(col("day") === 3).drop("day"))
    val a = AggState.finalize(AggState.merge(stage, Seq("k")), ddof = 1)
    val b = AggState.finalize(AggState.merge(daily, Seq("k")), ddof = 1)
    val cols = a.columns.sorted.map(col)
    assert(a.select(cols: _*).orderBy("k").collect().toSeq ==
      b.select(cols: _*).orderBy("k").collect().toSeq)
    // schema is stable across re-merges (fixed decimal types)
    assert(AggState.merge(stage, Seq("k")).schema ==
      AggState.merge(daily, Seq("k")).schema)
  }

  test("quantile state: finalize(merge(per-day histograms)) == exactQuantile direct, bit for bit") {
    import graft.operators.Quantiles
    // ties across days (10.5 on days 1 and 2), NULL/NaN drops, an
    // all-invalid group that must vanish entirely (nanquantile drops it)
    val df = Seq(
      ("a", 1, Some(10.5)), ("a", 1, Some(11.25)), ("a", 2, Some(10.5)),
      ("a", 2, Some(9.0)), ("a", 3, None), ("a", 3, Some(Double.NaN)),
      ("b", 1, Some(100.0)), ("b", 2, Some(100.0)), ("b", 3, Some(1.0)),
      ("c", 1, None), ("c", 2, Some(Double.NaN))
    ).toDF("k", "day", "v")
    val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val daily = AggState.stateQuantile(df, Seq("k", "day"), "v")
    val got = AggState.finalizeQuantile(
      AggState.mergeQuantile(daily, Seq("k"), "v"), Seq("k"), "v", qs, as = "q")
    val want = Quantiles.exactQuantile(df, Seq("k"), "v", qs, as = "q")
    assert(got.orderBy("k").collect().toSeq == want.orderBy("k").collect().toSeq,
      "state path must be bit-identical to the direct exact quantile")
    // every merge tree yields the identical histogram (integer sums)
    val stage = AggState.mergeQuantile(daily.where(col("day") <= 2), Seq("k"), "v")
      .unionByName(daily.where(col("day") === 3).drop("day"))
    val a = AggState.finalizeQuantile(
      AggState.mergeQuantile(stage, Seq("k"), "v"), Seq("k"), "v", qs, as = "q")
    assert(a.orderBy("k").collect().toSeq == got.orderBy("k").collect().toSeq)
    // finalize also accepts an UNMERGED union of states (re-aggregates)
    val c = AggState.finalizeQuantile(daily.drop("day"), Seq("k"), "v", qs, as = "q")
    assert(c.orderBy("k").collect().toSeq == got.orderBy("k").collect().toSeq)
    // state size is the distinct-value count, not the row count
    assert(daily.where(col("k") === "a" && col("day") === 2).count() == 2)
    assert(AggState.mergeQuantile(daily, Seq("k"), "v")
      .where(col("k") === "a").count() == 3) // {9.0, 10.5, 11.25}
  }

  test("weighted quantile state: finalize(merge(per-day weight histograms)) == weightedQuantile direct") {
    import graft.operators.Quantiles
    val df = Seq(
      ("a", 1, 10.5, 2.0), ("a", 1, 11.25, 1.0), ("a", 2, 10.5, 3.0),
      ("a", 2, 9.0, 0.0),                       // zero weight takes no part
      ("a", 3, Double.NaN, 5.0),                // NaN value takes no part
      ("b", 1, 100.0, 1.5), ("b", 2, 100.0, 2.5), ("b", 3, 1.0, 4.0)
    ).toDF("k", "day", "v", "w")
    val qs = Seq(0.25 -> "w25", 0.5 -> "w50", 1.0 -> "w100")
    val daily = AggState.stateQuantileWeighted(df, Seq("k", "day"), "v", "w")
    val got = AggState.finalizeQuantileWeighted(
      AggState.mergeQuantileWeighted(daily, Seq("k"), "v"), Seq("k"), "v", qs)
    val want = Quantiles.weightedQuantile(df, Seq("k"), "v", "w", qs)
    assert(got.orderBy("k").collect().toSeq == want.orderBy("k").collect().toSeq,
      "weighted state path must equal the direct weighted quantile")
    // merge-tree invariance (exact decimal weight sums)
    val stage = AggState.mergeQuantileWeighted(daily.where(col("day") <= 2), Seq("k"), "v")
      .unionByName(daily.where(col("day") === 3).drop("day"))
    val b2 = AggState.finalizeQuantileWeighted(
      AggState.mergeQuantileWeighted(stage, Seq("k"), "v"), Seq("k"), "v", qs)
    assert(b2.orderBy("k").collect().toSeq == got.orderBy("k").collect().toSeq)
    // ties across days collapse to ONE weighted row
    assert(AggState.mergeQuantileWeighted(daily, Seq("k"), "v")
      .where(col("k") === "b").count() == 2) // {100.0 (w=4.0), 1.0}
  }
}
