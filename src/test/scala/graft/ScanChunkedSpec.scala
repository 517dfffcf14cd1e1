package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GroupByScan

/** scanChunked (Blelloch chunk-carry scan) must equal the single-window
  * scan for every supported func — the reference's numpy-vs-dask scan
  * equivalence (tests/test_properties.py:183-227) for the skew-safe path.
  */
class ScanChunkedSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val funcs = Seq("cumsum", "nancumsum", "cumprod", "nancumprod",
    "cumcount", "cummax", "cummin", "nancummax", "nancummin", "ffill")

  // skewed: key 0 holds 80% of rows; NaNs sprinkled; whole chunks of
  // NaN-only data exercise the null-carry path
  private def df = {
    val rows = (0 until 200).map { i =>
      val key = if (i % 5 == 0) i % 3 else 0
      val v =
        if (i % 7 == 0 || (i / 4) % 9 == 3) Double.NaN
        else ((i * 13) % 10 - 4).toDouble
      (key, v, i.toLong)
    }
    rows.toDF("label", "v", "pos").repartition(4)
  }

  for (f <- funcs)
    test(s"scanChunked == scan for $f") {
      val plain = GroupByScan.scan(df, "v", Seq("label"), f, Seq(col("pos")), "r")
        .select("pos", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
      val chunked = GroupByScan.scanChunked(df, "v", Seq("label"), f,
        Seq(col("pos")), floor(col("pos") / 16), "r")
        .select("pos", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
      val diffs = plain.keys.filter { k =>
        (plain(k), chunked(k)) match {
          case (a: Double, b: Double) => !(a.isNaN && b.isNaN) && a != b
          case (a, b)                 => a != b
        }
      }
      assert(diffs.isEmpty,
        s"$f diverges at pos ${diffs.take(5).toSeq}: ${diffs.take(5).map(k => (plain(k), chunked(k))).toSeq}")
    }

  test("scanChunked honors exactScale on the carry path") {
    val d = (0 until 100).map(i => (i % 2, 0.01 + (i % 7) * 1.1, i.toLong))
      .toDF("label", "v", "pos").repartition(4)
    val plain = GroupByScan.scan(d, "v", Seq("label"), "nancumsum",
      Seq(col("pos")), "r", exactScale = Some(2))
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chunked = GroupByScan.scanChunked(d, "v", Seq("label"), "nancumsum",
      Seq(col("pos")), floor(col("pos") / 8), "r", exactScale = Some(2))
      .select("pos", "r").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain == chunked) // decimal-exact: bitwise equal despite regrouped additions
  }
}
