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

  test("NULL keys and NULL chunks survive the carry join (ADVICE r4)") {
    // The phase-3 carry join was a bare multi-column equi-join — null-
    // UNSAFE, silently dropping NULL-keyed groups (and NULL-chunk rows)
    // that the single-window scan keeps.
    val d = (0 until 60).map { i =>
      val key: Option[Int] = if (i % 3 == 0) None else Some(i % 2)
      (key, (i % 7).toDouble, i.toLong)
    }.toDF("label", "v", "pos").repartition(4)
    // chunk NULL for the earliest rows: nulls-first ordering makes a NULL
    // chunk the leading chunk of each group, as chunk(NULL time) would be
    val chunk = when(col("pos") < 10, lit(null)).otherwise(floor(col("pos") / 16))
    for (f <- Seq("cumsum", "ffill", "cummax", "cumcount")) {
      val plain = GroupByScan.scan(d, "v", Seq("label"), f, Seq(col("pos")), "r")
        .select("pos", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
      val chunked = GroupByScan.scanChunked(d, "v", Seq("label"), f,
        Seq(col("pos")), chunk, "r")
        .select("pos", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
      assert(chunked.size == plain.size, s"$f: chunked dropped rows")
      assert(chunked == plain, s"$f diverges on NULL keys/chunks")
    }
  }

  test("integer-valued cumsum keeps the integer dtype of the window form") {
    val d = (0 until 50).map(i => (i % 3, (i % 7).toLong, i.toLong))
      .toDF("label", "v", "pos").repartition(4)
    val plain = GroupByScan.scan(d, "v", Seq("label"), "cumsum", Seq(col("pos")), "r")
    val chunked = GroupByScan.scanChunked(d, "v", Seq("label"), "cumsum",
      Seq(col("pos")), floor(col("pos") / 16), "r")
    assert(plain.schema("r").dataType == chunked.schema("r").dataType,
      s"dtype drift: ${plain.schema("r").dataType} vs ${chunked.schema("r").dataType}")
    val p = plain.select("pos", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = chunked.select("pos", "r").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p == c)
  }

  test("scanChunked rejects reserved working-column names") {
    val d = Seq((1, 1.0, 0L)).toDF("label", "v", "__chunk")
    val e = intercept[IllegalArgumentException] {
      GroupByScan.scanChunked(d, "v", Seq("label"), "cumsum",
        Seq(col("__chunk")), lit(0), "r")
    }
    assert(e.getMessage.contains("__chunk"))
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
