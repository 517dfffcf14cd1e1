package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, GroupByReduce}

/** Dtype-parity pins vs the reference's promotion rules
  * (reference xrdtypes.py:153-209, core.py:2442-2443, 2506-2520):
  *
  * | input      | func      | engine output                | reference       |
  * |------------|-----------|------------------------------|-----------------|
  * | byte/short | sum       | long (promoted)              | int64 (same)    |
  * | byte/short | mean      | double                       | float64 (same)  |
  * | float32    | sum/mean  | double — DIVERGES            | float32 kept    |
  * | float32    | min/max   | float32 (preserved)          | float32 (same)  |
  * | bool       | sum       | long count-true (viewed int) | int cast (same) |
  * | bool       | mean      | double fraction-true         | same            |
  * | bool       | any/all   | bool (native)                | bool (same)     |
  * | timestamp  | mean      | timestamp (micros view+back) | datetime (same) |
  * | timestamp  | min/max   | timestamp (native)           | same            |
  * | timestamp  | var       | double, micros^2 units       | timedelta64^2   |
  *
  * The one deliberate divergence: float32 sums/means widen to double
  * (Spark's sum/avg always compute in double; flox keeps float32 per
  * xrdtypes.py:161-167). Widening is the *safer* direction — documented
  * here and in the [[graft.operators.Aggregations]] scaladoc rather than
  * simulated by a lossy downcast.
  */
class DtypeParitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def out(df: org.apache.spark.sql.DataFrame, a: Agg): (DataType, Map[Int, Any]) = {
    val r = GroupByReduce.reduce(df, Seq("g"), Seq(a), pos = Some(col("pos")))
    (r.schema(a.as).dataType, r.collect().map(x => x.getInt(0) -> x.get(1)).toMap)
  }

  test("skew/kurt: bool rides the int view; long and timestamp compute in double (no int64 wrap)") {
    // bool: skew of the 0/1 view
    val bdf = Seq((0, true, 1L), (0, true, 2L), (0, false, 3L), (0, true, 4L))
      .toDF("g", "v", "pos")
    val (bt, bv) = out(bdf, Agg("nanskew", "v", "r"))
    assert(bt == DoubleType)
    val xs = Seq(1.0, 1.0, 0.0, 1.0)
    val n = 4.0; val m = xs.sum / n
    val m2 = xs.map(x => x * x).sum / n - m * m
    val m3 = xs.map(x => x * x * x).sum / n - 3 * m * (xs.map(x => x * x).sum / n) + 2 * m * m * m
    assert(bv(0) == m3 / math.sqrt(m2 * m2 * m2))
    // long values past the int64^4 wrap point: double power sums, finite
    val ldf = Seq((0, 100000L, 1L), (0, 200000L, 2L), (0, 400000L, 3L))
      .toDF("g", "v", "pos")
    val (lt, lv) = out(ldf, Agg("nankurt", "v", "r"))
    assert(lt == DoubleType)
    assert(!lv(0).asInstanceOf[Double].isNaN && !lv(0).asInstanceOf[Double].isInfinite)
    // timestamp: micros view, dimensionless result, finite
    val ts = Seq(1700000000000L, 1700000500000L, 1700003000000L).zipWithIndex
      .map { case (t, i) => (0, new Timestamp(t), i.toLong) }
    val tdf = ts.toDF("g", "v", "pos")
    val (tt, tv) = out(tdf, Agg("nanskew", "v", "r"))
    assert(tt == DoubleType)
    assert(!tv(0).asInstanceOf[Double].isNaN && !tv(0).asInstanceOf[Double].isInfinite)
  }

  test("byte/short sums promote to long; means widen to double (numpy small-int promotion)") {
    val df = Seq((0, 100, 1L), (0, 100, 2L), (1, 27, 3L))
      .toDF("g", "v", "pos")
      .select(col("g"), col("v").cast(ByteType).as("v"), col("pos"))
    val (sumT, sums) = out(df, Agg("nansum", "v", "r"))
    assert(sumT == LongType)
    assert(sums == Map(0 -> 200L, 1 -> 27L)) // 200 overflows byte: promotion is load-bearing
    val (meanT, means) = out(df, Agg("nanmean", "v", "r"))
    assert(meanT == DoubleType && means(0) == 100.0)

    val dfs = Seq((0, 30000, 1L), (0, 30000, 2L)).toDF("g", "v", "pos")
      .select(col("g"), col("v").cast(ShortType).as("v"), col("pos"))
    val (st, sv) = out(dfs, Agg("nansum", "v", "r"))
    assert(st == LongType && sv(0) == 60000L)
  }

  test("float32: min/max/first preserve float32; sum/mean widen to double (documented divergence)") {
    val df = Seq((0, 1.5f, 1L), (0, 2.5f, 2L), (1, -3.25f, 3L)).toDF("g", "v", "pos")
    val (minT, mins) = out(df, Agg("nanmin", "v", "r"))
    assert(minT == FloatType && mins == Map(0 -> 1.5f, 1 -> -3.25f))
    val (firstT, _) = out(df, Agg("nanfirst", "v", "r"))
    assert(firstT == FloatType)
    val (sumT, sums) = out(df, Agg("nansum", "v", "r"))
    assert(sumT == DoubleType && sums(0) == 4.0) // flox would keep float32; we widen
    val (meanT, means) = out(df, Agg("nanmean", "v", "r"))
    assert(meanT == DoubleType && means(0) == 2.0)
  }

  test("float32 NaN semantics: nan* skips, plain propagates, at float32 type") {
    val df = Seq((0, Float.NaN, 1L), (0, 2.0f, 2L)).toDF("g", "v", "pos")
    val (t, skip) = out(df, Agg("nanmin", "v", "r"))
    assert(t == FloatType && skip(0) == 2.0f)
    val (tp, prop) = out(df, Agg("min", "v", "r"))
    assert(tp == FloatType && prop(0).asInstanceOf[Float].isNaN)
  }

  test("bool arithmetic reductions run on the int view (reference core.py:2442-2443)") {
    val df = Seq((0, true, 1L), (0, true, 2L), (0, false, 3L), (1, false, 4L))
      .toDF("g", "v", "pos")
    val (sumT, sums) = out(df, Agg("sum", "v", "r"))
    assert(sumT == LongType && sums == Map(0 -> 2L, 1 -> 0L)) // count-true
    val (meanT, means) = out(df, Agg("mean", "v", "r"))
    assert(meanT == DoubleType && means(0) == 2.0 / 3 && means(1) == 0.0)
    val (varT, vars) = out(df, Agg("nanvar", "v", "r"))
    assert(varT == DoubleType && math.abs(vars(0).asInstanceOf[Double] - 2.0 / 9) < 1e-15)
    // native bool paths unaffected
    val (anyT, anys) = out(df, Agg("any", "v", "r"))
    assert(anyT == BooleanType && anys == Map(0 -> true, 1 -> false))
    val (minT, mins) = out(df, Agg("nanmin", "v", "r"))
    assert(minT == BooleanType && mins == Map(0 -> false, 1 -> false))
  }

  test("timestamp mean/median via micros view, cast back; min native; var in micros^2") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (0, ts("2024-01-01 00:00:00"), 1L), (0, ts("2024-01-03 00:00:00"), 2L),
      (1, ts("2024-06-01 12:00:00"), 3L))
      .toDF("g", "v", "pos")
    val (meanT, means) = out(df, Agg("nanmean", "v", "r"))
    assert(meanT == TimestampType)
    assert(means(0) == ts("2024-01-02 00:00:00") && means(1) == ts("2024-06-01 12:00:00"))
    val (medT, meds) = out(df, Agg("nanmedian", "v", "r"))
    assert(medT == TimestampType && meds(0) == ts("2024-01-02 00:00:00"))
    val (minT, mins) = out(df, Agg("nanmin", "v", "r"))
    assert(minT == TimestampType && mins(0) == ts("2024-01-01 00:00:00"))
    val (varT, vars) = out(df, Agg("nanvar", "v", "r"))
    val dayUs = 86400e6 // pop var of +-1 day; tolerance: the sumsq-sum^2/n
    // cancellation at 1e30 magnitude leaves ~1e-16 relative double noise
    assert(varT == DoubleType &&
      math.abs(vars(0).asInstanceOf[Double] - dayUs * dayUs) < 1e-6 * dayUs * dayUs)
    // null skipping: mean over a null-bearing group uses valid rows only
    val dfn = df.withColumn("v", when(col("pos") === 2L, lit(null).cast(TimestampType)).otherwise(col("v")))
    val (_, m2) = out(dfn, Agg("nanmean", "v", "r"))
    assert(m2(0) == ts("2024-01-01 00:00:00"))
  }

  test("timestamp sum stays rejected (meaningless for absolute times)") {
    val df = Seq((0, Timestamp.valueOf("2024-01-01 00:00:00"), 1L)).toDF("g", "v", "pos")
    intercept[Exception] {
      GroupByReduce.reduce(df, Seq("g"), Seq(Agg("nansum", "v", "r"))).collect()
    }
  }
}
