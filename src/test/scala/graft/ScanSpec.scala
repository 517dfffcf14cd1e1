package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GroupByScan

/** Grouped scans vs a hand-rolled per-group prefix oracle (the reference's
  * scan-vs-bruteforce property, tests/test_properties.py:183-227), plus
  * the ffill/bfill reversal metamorphic inverse (:230-249).
  */
class ScanSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val labels = Seq(0, 0, 2, 2, 2, 1, 1, 2, 2, 1, 1, 0)
  private val dirty  = Seq(Double.NaN, 2.0, 3.0, Double.NaN, 5.0, Double.NaN, 7.0, 8.0, Double.NaN, 10.0, 11.0, 12.0)

  private def df = labels.zip(dirty).zipWithIndex
    .map { case ((l, v), i) => (l, v, i.toLong) }
    .toDF("label", "v", "pos").repartition(3)

  private def run(func: String): Map[Long, Any] =
    GroupByScan.scan(df, "v", Seq("label"), func, Seq(col("pos")), "r")
      .collect().map(r => r.getLong(2) -> r.get(3)).toMap

  private def perGroup[A](f: Seq[(Double, Long)] => Seq[(Long, A)]): Map[Long, A] =
    labels.distinct.flatMap { l =>
      f(labels.zipWithIndex.collect { case (`l`, i) => (dirty(i), i.toLong) })
    }.toMap

  private def sameNum(g: Any, w: Option[Double]): Boolean = (g, w) match {
    case (null, None) => true
    case (g: Double, Some(w)) => (g.isNaN && w.isNaN) || math.abs(g - w) < 1e-9
    case _ => false
  }

  test("nancumsum: NaN contributes zero, scan keeps running") {
    val want = perGroup { g =>
      var acc = 0.0
      g.map { case (v, p) => if (!v.isNaN) acc += v; p -> acc }
    }
    val got = run("nancumsum")
    for ((p, w) <- want) assert(got(p) == w, s"pos=$p")
  }

  test("cumsum: NaN poisons from first occurrence (numpy cumsum)") {
    val want = perGroup { g =>
      var acc = 0.0
      g.map { case (v, p) => acc += v; p -> acc }
    }
    val got = run("cumsum")
    for ((p, w) <- want) assert(sameNum(got(p), Some(w)), s"pos=$p got ${got(p)} want $w")
  }

  test("cumcount counts valid values so far") {
    val want = perGroup { g =>
      var n = 0L
      g.map { case (v, p) => if (!v.isNaN) n += 1; p -> n }
    }
    assert(run("cumcount") == want)
  }

  test("ffill carries last valid; leading gap stays missing") {
    val want = perGroup { g =>
      var last: Option[Double] = None
      g.map { case (v, p) => if (!v.isNaN) last = Some(v); p -> last }
    }
    val got = run("ffill")
    for ((p, w) <- want) assert(sameNum(got(p), w), s"pos=$p got ${got(p)} want $w")
  }

  test("bfill is ffill under reversal (metamorphic inverse)") {
    val want = perGroup { g =>
      var next: Option[Double] = None
      g.reverse.map { case (v, p) => if (!v.isNaN) next = Some(v); p -> next }
    }
    val got = run("bfill")
    for ((p, w) <- want) assert(sameNum(got(p), w), s"pos=$p got ${got(p)} want $w")
  }

  test("ffill/bfill limit: fills only gaps within limit rows (pandas limit=)") {
    // one group, explicit gap lengths: v=[1, N, N, N, 5, N, 7]
    val d = Seq(1.0, Double.NaN, Double.NaN, Double.NaN, 5.0, Double.NaN, 7.0)
      .zipWithIndex.map { case (v, i) => (0, v, i.toLong) }
      .toDF("label", "v", "pos").repartition(2)
    def run(func: String, limit: Int): Seq[Any] =
      GroupByScan.scan(d, "v", Seq("label"), func, Seq(col("pos")), "r", limit = limit)
        .orderBy("pos").collect().map(_.get(3)).toSeq
    // limit=2: pos1,2 fill from pos0; pos3 is 3 rows past pos0 -> missing
    assert(run("ffill", 2) == Seq(1.0, 1.0, 1.0, null, 5.0, 5.0, 7.0))
    // limit=1: only pos1 fills
    assert(run("ffill", 1) == Seq(1.0, 1.0, null, null, 5.0, 5.0, 7.0))
    // bfill limit=1: pos3 fills from pos4; pos1,2 are 3,2 rows before pos4
    assert(run("bfill", 1) == Seq(1.0, null, null, 5.0, 5.0, 7.0, 7.0))
    // limit=0 = unbounded (existing semantics)
    assert(run("ffill", 0) == Seq(1.0, 1.0, 1.0, 1.0, 5.0, 5.0, 7.0))
    intercept[IllegalArgumentException] {
      GroupByScan.scan(d, "v", Seq("label"), "cumsum", Seq(col("pos")), "r", limit = 2)
    }
  }

  test("nancummax/nancummin track running extrema over valid values") {
    val wantMax = perGroup { g =>
      var m: Option[Double] = None
      g.map { case (v, p) => if (!v.isNaN) m = Some(m.fold(v)(math.max(_, v))); p -> m }
    }
    val got = run("nancummax")
    for ((p, w) <- wantMax) assert(sameNum(got(p), w), s"nancummax pos=$p")
    val wantMin = perGroup { g =>
      var m: Option[Double] = None
      g.map { case (v, p) => if (!v.isNaN) m = Some(m.fold(v)(math.min(_, v))); p -> m }
    }
    val gotMin = run("nancummin")
    for ((p, w) <- wantMin) assert(sameNum(gotMin(p), w), s"nancummin pos=$p")
  }

  test("plain cummax/cummin propagate NaN from first occurrence (numpy)") {
    for (func <- Seq("cummax", "cummin")) {
      val want = perGroup { g =>
        var m: Option[Double] = None
        var poisoned = false
        g.map { case (v, p) =>
          if (v.isNaN) poisoned = true
          else m = Some(m.fold(v)(x => if (func == "cummax") math.max(x, v) else math.min(x, v)))
          p -> (if (poisoned) Some(Double.NaN) else m)
        }
      }
      val got = run(func)
      for ((p, w) <- want) assert(sameNum(got(p), w), s"$func pos=$p got ${got(p)} want $w")
    }
  }

  test("nancumprod multiplies valid values, identity 1 before first valid") {
    val want = perGroup { g =>
      var acc = 1.0
      g.map { case (v, p) => if (!v.isNaN) acc *= v; p -> acc }
    }
    val got = run("nancumprod")
    for ((p, w) <- want) assert(sameNum(got(p), Some(w)), s"pos=$p got ${got(p)} want $w")
  }

  test("scan result is identical on 1 vs 4 partitions") {
    for (func <- Seq("nancumsum", "ffill", "bfill", "cumcount")) {
      val one  = GroupByScan.scan(df.coalesce(1), "v", Seq("label"), func, Seq(col("pos")), "r")
        .select("pos", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
      val many = GroupByScan.scan(df.repartition(4), "v", Seq("label"), func, Seq(col("pos")), "r")
        .select("pos", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
      assert(one == many, s"partition-dependent scan: $func")
    }
  }
}
