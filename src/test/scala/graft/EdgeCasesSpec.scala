package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, Binning, GroupByReduce}

/** Edge cases the reference pins explicitly: all-NaN groups
  * (tests/test_core.py:819-844), empty expected bins (:1191), NaN/NULL
  * group labels dropped (core.py:2691-2702), min_count boundaries
  * (core.py:2539-2557), plus engine-specific regressions (mode-join group
  * drop, empty-aggs validation, uniform-bin edges).
  */
class EdgeCasesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("all-NaN group: nan* reductions yield NULL, count yields 0") {
    val d = Seq((0, Double.NaN), (0, Double.NaN), (1, 2.0), (1, 4.0))
      .toDF("label", "v")
    val r = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("nanmean", "v", "m"), Agg("count", "v", "c"), Agg("nanmin", "v", "mn")))
      .collect().map(x => x.getInt(0) -> (x.get(1), x.get(2), x.get(3))).toMap
    assert(r(0) == ((null, 0L, null)))
    assert(r(1) == ((3.0, 2L, 2.0)))
  }

  test("min_count defaults to 1 under expected+fill (ref core.py:2539-2557)") {
    val d = Seq(("A", Double.NaN), ("A", Double.NaN), ("C", 5.0)).toDF("k", "v")
    // without a declared domain: numpy identity (nansum of all-NaN -> 0)
    val plain = GroupByReduce.reduce(d, Seq("k"), Seq(Agg("nansum", "v", "s")))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(plain("A") == 0.0 && plain("C") == 5.0)
    // with expected+fill: the all-NaN observed group A fills like the
    // never-observed B (flox promotes min_count to 1)
    val expected = GroupByReduce.expectedDf(spark, "k", Seq("A", "B", "C"))
    val filled = GroupByReduce.reduce(d, Seq("k"),
      Seq(Agg("nansum", "v", "s", fill = Some(-1.0))), expected = Some(expected))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(filled == Map("A" -> -1.0, "B" -> -1.0, "C" -> 5.0), s"got $filled")
    // an explicit minCount still wins over the default
    val explicit = GroupByReduce.reduce(d, Seq("k"),
      Seq(Agg("count", "v", "c", minCount = 2, fill = Some(-7L))), expected = Some(expected))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(explicit == Map("A" -> -7L, "B" -> -7L, "C" -> -7L), s"got $explicit")
  }

  test("NaN group label is dropped (factorize -1 code, core.py:800-801)") {
    val d = Seq((1.0, 10.0), (Double.NaN, 20.0), (2.0, 30.0), (Double.NaN, 40.0))
      .toDF("key", "v")
    val r = GroupByReduce.reduce(d, Seq("key"), Seq(Agg("nansum", "v", "s")))
    assert(r.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 2.0))
  }

  test("NULL group label is dropped; keepNullKeys retains it") {
    val d = Seq((Some("a"), 1.0), (None, 2.0), (Some("b"), 3.0), (None, 4.0))
      .toDF("key", "v")
    val dropped = GroupByReduce.reduce(d, Seq("key"), Seq(Agg("nansum", "v", "s")))
    assert(dropped.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    val kept = GroupByReduce.reduce(d, Seq("key"), Seq(Agg("nansum", "v", "s")),
      keepNullKeys = true)
    assert(kept.count() == 3)
    assert(kept.filter(col("key").isNull).head().getDouble(1) == 6.0)
  }

  test("expected groups: never-observed group appears with fill_value; without fill stays NULL") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("c", 5.0)).toDF("key", "v")
    val expected = GroupByReduce.expectedDf(spark, "key", Seq("a", "b", "c"))
    val r = GroupByReduce.reduce(d, Seq("key"),
      Seq(Agg("nansum", "v", "s", fill = Some(0.0)), Agg("count", "v", "c")),
      expected = Some(expected))
      .collect().map(x => x.getString(0) -> (x.get(1), x.get(2))).toMap
    assert(r("a") == ((3.0, 2L)))
    assert(r("b") == ((0.0, null))) // filled vs unfilled side by side
    assert(r("c") == ((5.0, 1L)))
  }

  test("min_count: exactly k valid passes, k-1 masks to NULL") {
    val d = Seq((0, 1.0), (0, 2.0), (0, Double.NaN), (1, 5.0)).toDF("label", "v")
    val r = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("nansum", "v", "s", minCount = 2)))
      .collect().map(x => x.getInt(0) -> x.get(1)).toMap
    assert(r(0) == 3.0) // 2 valid >= 2
    assert(r(1) == null) // 1 valid < 2
  }

  test("nanmode alongside another agg keeps all-invalid groups (left-join regression)") {
    val d = Seq((0, Double.NaN), (0, Double.NaN), (1, 7.0), (1, 7.0), (1, 3.0))
      .toDF("label", "v")
    val r = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("count", "v", "c"), Agg("nanmode", "v", "m")))
      .collect().map(x => x.getInt(0) -> (x.get(1), x.get(2))).toMap
    assert(r(0) == ((0L, null)), "all-NaN group must survive with NULL mode")
    assert(r(1) == ((3L, 7.0)))
  }

  test("empty aggs / empty expected labels fail fast with clear messages") {
    val d = Seq((0, 1.0)).toDF("label", "v")
    val e1 = intercept[IllegalArgumentException] {
      GroupByReduce.reduce(d, Seq("label"), Nil)
    }
    assert(e1.getMessage.contains("at least one aggregation"))
    val e2 = intercept[IllegalArgumentException] {
      GroupByReduce.expectedDf(spark, "k", Nil)
    }
    assert(e2.getMessage.contains("non-empty"))
  }

  test("positional func without pos column fails fast") {
    val d = Seq((0, 1.0)).toDF("label", "v")
    val e = intercept[Exception] {
      GroupByReduce.reduce(d, Seq("label"), Seq(Agg("first", "v", "f"))).collect()
    }
    assert(e.getMessage.contains("position column"))
  }

  test("binIndex: interior-edge values honor closedness; out-of-range drops to NULL") {
    val edges = Seq(0.0, 10.0, 20.0)
    val d = Seq(0.0, 5.0, 10.0, 15.0, 20.0, 25.0).toDF("v")
    val right = d.select(Binning.binIndex(col("v"), edges, closedRight = true).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(right == Seq(null, 0, 0, 1, 1, null)) // (0,10], (10,20]
    val left = d.select(Binning.binIndex(col("v"), edges, closedRight = false).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(left == Seq(0, 0, 1, 1, null, null)) // [0,10), [10,20)
  }

  test("binIndexUniform agrees with binIndex on every edge and interior value") {
    val edges = (0 to 10).map(_ * 7.0)
    val vals = (0 to 70).map(_.toDouble) ++ Seq(-1.0, 70.5, 3.5, 6.999, 7.0001)
    val d = vals.toDF("v")
    for (closedRight <- Seq(true, false)) {
      val both = d.select(
        Binning.binIndex(col("v"), edges, closedRight).as("a"),
        Binning.binIndexUniform(col("v"), 0.0, 70.0, 10, closedRight).as("b"))
        .collect()
      for (r <- both)
        assert(r.get(0) == r.get(1), s"closedRight=$closedRight: ${r.get(0)} vs ${r.get(1)}")
    }
  }

  test("qcut: equal-frequency bins, searchsorted-right parity, NaN/NULL -> NULL bin") {
    val rnd = new scala.util.Random(7L)
    val vals = (0 until 800).map(_ => rnd.nextDouble() * 1000)
    val rows = vals.map(Option(_)) ++ Seq(None, Some(Double.NaN))
    val d = rows.toDF("v").repartition(5)
    val binned = Binning.qcut(d, "v", 4, "b")
    val got = binned.groupBy("b").count()
      .collect().map(r => (if (r.isNullAt(0)) null else r.getInt(0)) -> r.getLong(1)).toMap
    // brute-force expectation: same interpolated quantile edges, rounded
    // to 6, searchsorted-right
    val sorted = vals.sorted
    def q(p: Double): Double = {
      val pos = p * (sorted.size - 1)
      val (lo, hi) = (sorted(pos.floor.toInt), sorted(pos.ceil.toInt))
      val x = if (pos.floor == pos.ceil) lo
        else (pos.ceil - pos) * lo + (pos - pos.floor) * hi
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val edges = Seq(q(0.25), q(0.5), q(0.75))
    val want = vals.groupBy(v => edges.count(v >= _)).map { case (b, vs) => b -> vs.size.toLong }
    val wantAny: Map[Any, Long] =
      want.map { case (k, n) => (k: Any) -> n }.toMap + ((null: Any) -> 2L)
    assert(got == wantAny, s"got $got want $wantAny")
    // near-equal occupancy on continuous data
    val occ = want.values.toSeq
    assert(occ.max - occ.min <= 2, s"bins not equal-frequency: $want")
    // the sketch-edge scale path: edges are dataset values (exact rank,
    // no interpolation below accuracy), so occupancy can shift by the
    // edge row itself — still equal-frequency to within a row per edge
    val approx = Binning.qcut(d, "v", 4, "b", exact = false).groupBy("b").count()
      .collect().collect { case r if !r.isNullAt(0) => r.getLong(1) }
    assert(approx.size == 4 && approx.forall(n => math.abs(n - 200) <= 1),
      s"sketch-path bins not equal-frequency: ${approx.toSeq}")
    // all-invalid column: every row survives with a NULL bin on BOTH paths
    // (regression: the exact path's empty edge frame must not annihilate)
    val allBad = Seq(Option.empty[Double], Some(Double.NaN), None).toDF("v")
    for (ex <- Seq(true, false)) {
      val r = Binning.qcut(allBad, "v", 4, "b", exact = ex)
      assert(r.count() == 3 && r.where(col("b").isNull).count() == 3,
        s"exact=$ex lost rows on an all-invalid column")
    }
    // reserved-name guard covers the internal edge-derivation names too
    intercept[IllegalArgumentException] {
      Binning.qcut(allBad.withColumnRenamed("v", "__g"), "__g", 4, "b")
    }
  }

  test("qcutBy: per-group quartiles; all-invalid group gets NULL bins") {
    val rnd = new scala.util.Random(11L)
    val rows = (0 until 400).map(i => (s"g${i % 2}", Option(rnd.nextDouble() * (i % 2 + 1) * 100))) ++
      Seq(("g2", None), ("g2", Some(Double.NaN)))
    val d = rows.toDF("k", "v").repartition(4)
    val binned = Binning.qcutBy(d, Seq("k"), "v", 4, "b")
    val occ = binned.where(col("b").isNotNull).groupBy("k", "b").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // per-group quartiles: each group's 200 rows split 50/50/50/50
    for (g <- Seq("g0", "g1"); b <- 0 until 4)
      assert(math.abs(occ((g, b)) - 50L) <= 1, s"$g bin $b: ${occ.get((g, b))}")
    // all-invalid group: rows retained, bins NULL
    val g2 = binned.where(col("k") === "g2")
    assert(g2.count() == 2 && g2.where(col("b").isNull).count() == 2)
  }

  test("qcutBy: NULL-keyed rows bin against their own group's edges (ADVICE r4)") {
    // The join-back was null-unsafe on the grouping columns: edges were
    // computed for the NULL-keyed group (struct-keyed quantiles) but could
    // never be applied — every NULL-keyed row got a NULL bin. Struct-keyed
    // join-back makes the NULL key a group like any other.
    val rows = (0 until 80).map { i =>
      val k: Option[String] = if (i % 2 == 0) Some("g") else None
      (k, i.toDouble)
    }
    val d = rows.toDF("k", "v").repartition(3)
    val binned = Binning.qcutBy(d, Seq("k"), "v", 4, "b")
    val nullKeyed = binned.where(col("k").isNull)
    assert(nullKeyed.where(col("b").isNull).count() == 0,
      "NULL-keyed rows must receive bins from their own edges")
    // the NULL group's 40 odd values split into 4 bins of ~10
    val occ = nullKeyed.groupBy("b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for (b <- 0 until 4)
      assert(math.abs(occ(b) - 10L) <= 1, s"NULL-group bin $b: ${occ.get(b)}")
  }

  test("qcutByEdges + qcutByWithEdges == qcutBy (literalized grouped index-build path)") {
    val rnd = new scala.util.Random(23L)
    val rows = (0 until 300).map { i =>
      val k: Option[String] = i % 3 match {
        case 0 => Some("g0"); case 1 => Some("g1"); case 2 => None
      }
      (k, Option(rnd.nextDouble() * 100))
    } ++ Seq((Some("g9"), None), (Some("g9"), Some(Double.NaN))) // all-invalid group
    val d = rows.toDF("k", "v").repartition(5)
    // stringified triples: boxed NaN compares numerically (NaN != NaN)
    // under Scala's Any ==, which would flag identical results
    def dump(df: org.apache.spark.sql.DataFrame): Seq[(String, String, String)] =
      df.collect().map(r => (String.valueOf(r.getAs[Any]("k")),
        String.valueOf(r.getAs[Any]("v")), String.valueOf(r.getAs[Any]("b"))))
        .toSeq.sortBy(x => (x._1, x._2))
    val viaJoin = dump(Binning.qcutBy(d, Seq("k"), "v", 4, "b"))
    val edges = Binning.qcutByEdges(d, Seq("k"), "v", 4, maxGroups = 8)
    // bounded build: one entry per group WITH valid values (g9 absent)
    assert(edges.size == 3 && edges.forall(_._2.size == 3))
    assert(edges.exists(_._1 == Seq(null)), "NULL group key must carry its own edges")
    val viaLit = dump(Binning.qcutByWithEdges(d, Seq("k"), "v", edges, "b"))
    assert(viaLit == viaJoin)
    // maxGroups is a fail-fast bound, not a silent cap
    intercept[IllegalArgumentException] {
      Binning.qcutByEdges(d, Seq("k"), "v", 4, maxGroups = 2)
    }
    intercept[IllegalArgumentException] {
      Binning.qcutByWithEdges(d, Seq("k"), "v", edges, "v") // existing name
    }
  }

  test("unstack: declared pivot domain, absent-cell fill, NULL pivot labels dropped") {
    val d = Seq(
      ("g1", "a", Option(1.0)), ("g1", "a", Option(2.0)), ("g1", "b", Option(5.0)),
      ("g2", "b", Option(7.0)),
      ("g2", null.asInstanceOf[String], Option(99.0)), // NULL pivot label drops
      ("g1", "a", Option(Double.NaN))                  // NaN value skipped by nansum
    ).toDF("k", "p", "v")
    val w = GroupByReduce.unstack(d, Seq("k"), "p", Seq("a", "b", "zz"),
      Seq(Agg("count", "v", "n", fill = Some(0L)),
        Agg("nansum", "v", "s", fill = Some(0.0))))
      .collect().map(r => r.getString(0) ->
        (1 until 7).map(i => r.get(i)).toList).toMap
    // columns: a_n, a_s, b_n, b_s, zz_n, zz_s (registry count skips NaN)
    assert(w("g1") == List(2L, 3.0, 1L, 5.0, 0L, 0.0), s"g1: ${w("g1")}")
    assert(w("g2") == List(0L, 0.0, 1L, 7.0, 0L, 0.0), s"g2: ${w("g2")}")
    intercept[IllegalArgumentException] {
      GroupByReduce.unstack(d, Seq("k"), "p", Nil, Seq(Agg("count", "v", "n")))
    }
  }

  test("datetime binning drops out-of-range and respects left-closed edges") {
    val ts = Seq("2000-01-01 00:00:00", "2000-06-15 12:00:00", "2001-01-01 00:00:00",
      "2001-12-31 23:59:59", "2002-01-01 00:00:00")
      .map(java.sql.Timestamp.valueOf)
    val edges = Seq("2000-01-01 00:00:00", "2001-01-01 00:00:00", "2002-01-01 00:00:00")
      .map(java.sql.Timestamp.valueOf)
    val d = ts.toDF("t")
    val b = d.select(Binning.binIndex(col("t"), edges, closedRight = false).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
    assert(b == Seq(0, 0, 1, 1, null))
  }

  test("string values: count/first/last/mode/countdistinct work dtype-preserving") {
    val d = Seq((0, "b", 1L), (0, "a", 2L), (0, "a", 3L), (1, "z", 4L), (1, "y", 5L))
      .toDF("label", "v", "pos")
    val r = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("count", "v", "c"), Agg("first", "v", "f"), Agg("last", "v", "l"),
        Agg("mode", "v", "m"), Agg("countdistinct", "v", "nd")),
      pos = Some(col("pos")))
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getString(2), x.getString(3), x.getString(4), x.getLong(5))).toMap
    assert(r(0) == ((3L, "b", "a", "a", 2L)))
    assert(r(1) == ((2L, "z", "y", "y", 2L))) // mode tie -> smallest ("y" < "z")
  }

  test("timestamp values: min/max/first/last work natively") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = Seq((0, ts("2024-01-02 00:00:00"), 1L), (0, ts("2024-01-01 00:00:00"), 2L))
      .toDF("label", "v", "pos")
    val r = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("nanmin", "v", "mn"), Agg("nanmax", "v", "mx"),
        Agg("first", "v", "f"), Agg("last", "v", "l")),
      pos = Some(col("pos"))).head()
    assert(r.getTimestamp(1) == ts("2024-01-01 00:00:00"))
    assert(r.getTimestamp(2) == ts("2024-01-02 00:00:00"))
    assert(r.getTimestamp(3) == ts("2024-01-02 00:00:00")) // first by pos
    assert(r.getTimestamp(4) == ts("2024-01-01 00:00:00"))
  }

  test("countdistinct is exact; approxcountdistinct agrees at low cardinality") {
    val d = (0 until 500).map(i => (i % 3, (i % 40).toDouble)).toDF("label", "v")
    val r = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("countdistinct", "v", "nd"), Agg("approxcountdistinct", "v", "nda")))
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2))).toMap
    for (l <- 0 until 3) {
      assert(r(l)._1 == 40L)
      assert(r(l)._2 == 40L, "HLL++ should be exact below its dense threshold")
    }
  }

  test("countdistinct skips NaN like other nan-aware reductions") {
    val d = Seq((0, 1.0), (0, 1.0), (0, Double.NaN), (0, 2.0)).toDF("label", "v")
    val r = GroupByReduce.reduce(d, Seq("label"), Seq(Agg("countdistinct", "v", "nd")))
      .head().getLong(1)
    assert(r == 2L)
  }

  test("reindex join stays a broadcast join (no shuffle of the expected side)") {
    val d = Seq(("a", 1.0), ("b", 2.0)).toDF("key", "v")
    val expected = GroupByReduce.expectedDf(spark, "key", Seq("a", "b", "c"))
    val plan = GroupByReduce.reduce(d, Seq("key"),
      Seq(Agg("nansum", "v", "s", fill = Some(0.0))), expected = Some(expected))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast reindex join in plan:\n$plan")
  }
}
