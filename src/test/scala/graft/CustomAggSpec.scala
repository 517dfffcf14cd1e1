package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, GroupByReduce}

/** The custom-aggregation surface (reference core.py:2560,
  * tests/test_core.py:1462-1500): expression-built customs compose with
  * registry aggs, minCount and expected-groups; a typed Aggregator wraps
  * in via functions.udaf for imperative chunk/combine/finalize state.
  */
class CustomAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0)
  ).toDF("label", "v").repartition(3)

  test("expression custom agg (sum of squares) alongside a registry agg") {
    val r = GroupByReduce.reduce(df, Seq("label"), Seq(
      Agg.custom("sumsq", "v")(v => sum(v * v)),
      Agg("count", "v", "n")))
      .collect().map(x => x.getInt(0) -> (x.getDouble(1), x.getLong(2))).toMap
    assert(r == Map(0 -> ((14.0, 3L)), 1 -> ((41.0, 2L))))
  }

  test("custom agg composes with minCount masking") {
    val r = GroupByReduce.reduce(df, Seq("label"), Seq(
      Agg.custom("sumsq", "v")(v => sum(v * v)).copy(minCount = 3)))
      .collect().map(x => x.getInt(0) -> x.get(1)).toMap
    assert(r(0) == 14.0)
    assert(r(1) == null) // 2 valid < 3
  }

  test("custom agg composes with expected-groups reindex + fill") {
    val expected = GroupByReduce.expectedDf(spark, "label", Seq(0, 1, 2))
    val r = GroupByReduce.reduce(df, Seq("label"), Seq(
      Agg.custom("sumsq", "v")(v => sum(v * v)).copy(fill = Some(0.0))),
      expected = Some(expected))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r == Map(0 -> 14.0, 1 -> 41.0, 2 -> 0.0))
  }

  test("typed Aggregator (geometric mean) via functions.udaf — the class-based custom path") {
    object GeoMean extends Aggregator[Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)                                  // chunk init
      def reduce(b: (Double, Long), x: Double): (Double, Long) = (b._1 + math.log(x), b._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =     // combine
        (a._1 + b._1, a._2 + b._2)
      def finish(b: (Double, Long)): Double = math.exp(b._1 / b._2)         // finalize
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    val geo = udaf(GeoMean)
    val r = GroupByReduce.reduce(df, Seq("label"), Seq(
      Agg.custom("gm", "v")(v => geo(v))))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(0) - math.pow(6.0, 1.0 / 3)) < 1e-9)
    assert(math.abs(r(1) - math.sqrt(20.0)) < 1e-9)
  }
}
