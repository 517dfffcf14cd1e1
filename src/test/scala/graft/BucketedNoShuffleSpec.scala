package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Agg, GroupByReduce}

/** The `rechunk_for_blockwise` analog (reference core.py:634-664): when
  * the source is bucketed by the group key, the grouped reduction needs no
  * shuffle at all — Spark's bucketing metadata satisfies the aggregate's
  * required distribution, so the Exchange disappears from the plan. The
  * reference rechunks dask arrays so chunk boundaries align with group
  * boundaries for exactly this blockwise effect; in Spark it is a storage
  * layout decision (bucketBy at write time), not a runtime operator.
  */
class BucketedNoShuffleSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("groupBy on the bucketing key aggregates with zero Exchange") {
    val table = "graft_bucketed_lineitem"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.operators.Layout.writeBucketed(
      TestSpark.table("0.001", "lineitem").select("l_returnflag", "l_quantity"),
      table, Seq("l_returnflag"), buckets = 4)

    val bucketed = spark.table(table)
    val reduced = GroupByReduce.reduce(bucketed, Seq("l_returnflag"),
      Seq(Agg("nansum", "l_quantity", "s"), Agg("count", "l_quantity", "n")),
      sort = false)
    val plan = reduced.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"),
      s"bucketed groupBy should not shuffle; plan:\n$plan")

    // and the numbers still match the unbucketed run
    val viaBuckets = reduced.collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    val viaShuffle = GroupByReduce.reduce(
      TestSpark.table("0.001", "lineitem"), Seq("l_returnflag"),
      Seq(Agg("nansum", "l_quantity", "s"), Agg("count", "l_quantity", "n")),
      sort = false).collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(viaBuckets == viaShuffle)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("repartitionByKeys: a chain of grouped ops on the same keys shuffles once") {
    import graft.operators.Layout
    val pre = Layout.repartitionByKeys(
      TestSpark.table("0.001", "lineitem").select("l_returnflag", "l_quantity"),
      Seq("l_returnflag"))
    val reduced = GroupByReduce.reduce(pre, Seq("l_returnflag"),
      Seq(Agg("nansum", "l_quantity", "s")), sort = false)
    val p = reduced.queryExecution.executedPlan.toString
    // exactly the explicit repartition exchange; the aggregate adds none
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected only the up-front exchange:\n$p")
  }
}
