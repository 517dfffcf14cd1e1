package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GroupByScan
import graft.operators.GroupByScan.CustomScan

/** User-defined scans (VERDICT r4 item 4 — the reference's public `Scan`
  * dataclass, aggregations.py:577-598, exported `__init__.py:6`): a
  * CustomScan spec must ride both the single-window scan and the Blelloch
  * chunk-carry scanChunked, producing identical results — the same
  * equivalence the built-ins are pinned to in ScanChunkedSpec.
  */
class CustomScanSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def df = {
    val rows = (0 until 200).map { i =>
      val key = if (i % 5 == 0) i % 3 else 0
      (key, ((i * 13) % 10 - 4).toDouble, i.toLong)
    }
    rows.toDF("label", "v", "pos").repartition(4)
  }

  private val sumsq = CustomScan(
    window = (v, w) => sum(v * v).over(w),
    carry = v => sum(v * v),
    carryFold = (c, w) => sum(c).over(w),
    combine = (l, p) => l + coalesce(p, lit(0.0)))

  // non-additive custom: running min — carries fold with min, and
  // combine's least() ignores the NULL first-chunk carry
  private val runMin = CustomScan(
    window = (v, w) => min(v).over(w),
    carry = v => min(v),
    carryFold = (c, w) => min(c).over(w),
    combine = (l, p) => least(l, p))

  test("custom sum-of-squares: scanChunked == scan") {
    val plain = GroupByScan.scan(df, "v", Seq("label"), "custom",
      Seq(col("pos")), "r", custom = Some(sumsq))
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chunked = GroupByScan.scanChunked(df, "v", Seq("label"), "custom",
      Seq(col("pos")), floor(col("pos") / 16), "r", custom = Some(sumsq))
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain == chunked)
    // and the window itself is the running sum of squares
    val byPos = df.collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._3)
    val expect = byPos.map { case (k, _, p) =>
      p -> byPos.filter(t => t._1 == k && t._3 <= p).map(t => t._2 * t._2).sum
    }.toMap
    assert(plain.keys.forall(k => math.abs(plain(k) - expect(k)) < 1e-9))
  }

  test("custom running min: scanChunked == scan == builtin cummin") {
    val plain = GroupByScan.scan(df, "v", Seq("label"), "custom",
      Seq(col("pos")), "r", custom = Some(runMin))
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chunked = GroupByScan.scanChunked(df, "v", Seq("label"), "custom",
      Seq(col("pos")), floor(col("pos") / 16), "r", custom = Some(runMin))
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val builtin = GroupByScan.scan(df, "v", Seq("label"), "cummin",
      Seq(col("pos")), "r")
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain == chunked && plain == builtin)
  }

  test("func=custom and the CustomScan spec must come together") {
    intercept[IllegalArgumentException] {
      GroupByScan.scan(df, "v", Seq("label"), "custom", Seq(col("pos")), "r")
    }
    intercept[IllegalArgumentException] {
      GroupByScan.scan(df, "v", Seq("label"), "cumsum", Seq(col("pos")), "r",
        custom = Some(sumsq))
    }
    intercept[IllegalArgumentException] {
      GroupByScan.scanChunked(df, "v", Seq("label"), "custom",
        Seq(col("pos")), floor(col("pos") / 16), "r")
    }
  }
}
