package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, GroupByReduce}

/** The reference's exhaustive func matrix (tests/test_core.py:215-362) on
  * the canonical fixture labels [0,0,2,2,2,1,1,2,2,1,1,0]
  * (tests/test_core.py:52-55): every registry reduction vs the
  * [[BruteForce]] per-group oracle, on clean values and on a NaN-bearing
  * variant.
  */
class ReductionMatrixSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val labels = Seq(0, 0, 2, 2, 2, 1, 1, 2, 2, 1, 1, 0)
  private val clean  = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0)
  // NaN placement: group 0 partially NaN, group 1 one NaN, group 2 clean
  private val dirty  = Seq(Double.NaN, 2.0, 3.0, 4.0, 5.0, Double.NaN, 7.0, 8.0, 9.0, 10.0, 11.0, Double.NaN)

  private def df(values: Seq[Double]) =
    labels.zip(values).zipWithIndex
      .map { case ((l, v), i) => (l, v, i.toLong) }
      .toDF("label", "v", "pos")
      .repartition(3) // exercise partial/final aggregation

  private def run(values: Seq[Double], a: Agg): Map[Int, Any] =
    GroupByReduce.reduce(df(values), Seq("label"), Seq(a), pos = Some(col("pos")))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap

  private def expect(values: Seq[Double], func: String, ddof: Int = 0, q: Double = 0.5): Map[Int, Option[Any]] =
    labels.distinct.sorted.map { l =>
      val vp = labels.zipWithIndex.collect { case (`l`, i) => (values(i), i.toLong) }
      l -> BruteForce.reduce(func, vp.map(_._1), vp.map(_._2), ddof, q)
    }.toMap

  private def same(got: Any, want: Option[Any]): Boolean = (got, want) match {
    case (null, None)                 => true
    case (null, _) | (_, None)        => false
    case (g: Double, Some(w: Double)) =>
      (g.isNaN && w.isNaN) || g == w || math.abs(g - w) <= 1e-9 * math.max(1.0, math.abs(w))
    case (g: Long, Some(w: Long))     => g == w
    case (g, Some(w))                 => g == w
  }

  private def check(values: Seq[Double], func: String, ddof: Int = 0, q: Seq[Double] = Nil): Unit = {
    val a   = Agg(func, "v", "r", ddof = ddof, q = q)
    val got = run(values, a)
    val want = expect(values, func, ddof, if (q.nonEmpty) q.head else 0.5)
    for (l <- labels.distinct.sorted)
      assert(same(got(l), want(l)), s"$func label=$l: got ${got(l)}, want ${want(l)}")
  }

  private val simple = Seq("count", "sum", "nansum", "prod", "nanprod", "mean", "nanmean",
    "var", "nanvar", "std", "nanstd", "min", "nanmin", "max", "nanmax",
    "first", "last", "nanfirst", "nanlast",
    "argmin", "argmax", "nanargmin", "nanargmax",
    "median", "nanmedian")

  for (f <- simple) {
    test(s"$f matches brute force (clean)") { check(clean, f) }
    test(s"$f matches brute force (NaN variant)") { check(dirty, f) }
  }

  test("var/std honor ddof=1 (clean + NaN)") {
    check(clean, "nanvar", ddof = 1); check(dirty, "nanvar", ddof = 1)
    check(clean, "nanstd", ddof = 1); check(dirty, "nanstd", ddof = 1)
  }

  test("quantile single q matches interpolation (clean + NaN)") {
    check(clean, "quantile", q = Seq(0.25)); check(dirty, "nanquantile", q = Seq(0.25))
  }

  test("vector q returns one array slot per q (flox's new leading dim)") {
    val r = GroupByReduce.reduce(df(clean), Seq("label"),
      Seq(Agg("nanquantile", "v", "qs", q = Seq(0.25, 0.75))))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (l <- Seq(0, 1, 2)) {
      val vp = labels.zipWithIndex.collect { case (`l`, i) => (clean(i), i.toLong) }
      val w25 = BruteForce.reduce("nanquantile", vp.map(_._1), vp.map(_._2), q = 0.25).get
      val w75 = BruteForce.reduce("nanquantile", vp.map(_._1), vp.map(_._2), q = 0.75).get
      assert(math.abs(r(l)(0) - w25.asInstanceOf[Double]) < 1e-9)
      assert(math.abs(r(l)(1) - w75.asInstanceOf[Double]) < 1e-9)
    }
  }

  test("mode picks most frequent, smallest on ties; nanmode skips NaN") {
    val vals = Seq(2.0, 2.0, 5.0, 5.0, 4.0, 1.0, 1.0, 4.0, 3.0, 9.0, 9.0, 2.0)
    check(vals, "mode")
    check(dirty, "nanmode")
  }

  test("plain mode propagates NaN (scipy nan_policy='propagate'); ties never won by NULL") {
    // group 0 and 1 contain NaN -> NaN; group 2 clean; within group 1 the
    // NaN count (2) ties the 7.0 count in the nanmode variant
    val vals = Seq(Double.NaN, 2.0, 3.0, 3.0, 5.0, Double.NaN, 7.0, 3.0, 5.0, 7.0, Double.NaN, 2.0)
    check(vals, "mode")
    check(vals, "nanmode")
  }

  test("any/all on a boolean predicate column") {
    val d = labels.zip(clean).toDF("label", "v").withColumn("b", col("v") > 5.0)
    val got = GroupByReduce.reduce(d, Seq("label"),
      Seq(Agg("any", "b", "any_b"), Agg("all", "b", "all_b")))
      .collect().map(r => r.getInt(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    val want = labels.distinct.sorted.map { l =>
      val bs = labels.zipWithIndex.collect { case (`l`, i) => clean(i) > 5.0 }
      l -> (bs.exists(identity), bs.forall(identity))
    }.toMap
    assert(got == want)
  }

  test("multi-agg computes every func in one pass with identical results") {
    val aggs = Seq(Agg("count", "v", "c"), Agg("nansum", "v", "s"),
      Agg("nanmean", "v", "m"), Agg("nanmin", "v", "mn"), Agg("nanmax", "v", "mx"))
    val multi = GroupByReduce.reduce(df(dirty), Seq("label"), aggs, pos = Some(col("pos")))
      .collect().map(r => r.getInt(0) -> Seq(r.get(1), r.get(2), r.get(3), r.get(4), r.get(5))).toMap
    for ((a, idx) <- aggs.zipWithIndex) {
      val solo = run(dirty, a.copy(as = "r"))
      for (l <- Seq(0, 1, 2))
        assert(multi(l)(idx) == solo(l), s"multi-agg ${a.func} diverges for label $l")
    }
  }
}
