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

  test("zValue interleaves quantized cells bit by bit and clamps out-of-range") {
    import graft.operators.Layout
    // bits=3, 2 dims, [0,8) each -> cell == the value itself; dim 0 at
    // even output bits, dim 1 at odd
    val df = Seq((5.0, 3.0), (0.0, 0.0), (7.0, 7.0), (-4.0, 99.0))
      .toDF("a", "b")
    val z = df.select(Layout.zValue(
        Seq((col("a"), 0.0, 8.0), (col("b"), 0.0, 8.0)), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=5 (101), b=3 (011): z bits a0<<0|b0<<1|a1<<2|b1<<3|a2<<4|b2<<5
    //   = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert(z(0) == 27L)
    assert(z(1) == 0L)
    assert(z(2) == 63L)                 // all six bits set
    assert(z(3) == (2L + 8L + 32L))     // clamps to a=0, b=7 -> odd bits
  }

  test("writeShards: one file per shard dir, content-keyed assignment, re-run-stable order") {
    import graft.operators.{Layout, Sampling}
    val docs = (0 until 300).map(i => (i.toLong, s"doc body number ${i % 211} tail $i"))
      .toDF("id", "text")
    val key = Sampling.textKey(col("text"))
    def writeOnce(): (String, Map[Int, Seq[Long]]) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
      Layout.writeShards(docs, dir, key, shards = 4, tieBreak = Seq(col("id")), salt = 3)
      val perShard = (0 until 4).map { sh =>
        val d = new java.io.File(s"$dir/shard=$sh")
        val files = Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $sh: ${files.length} files")
        // read the single file directly: row order inside it is the contract
        sh -> spark.read.parquet(files.head.getPath)
          .select("id").collect().map(_.getLong(0)).toSeq
      }.toMap
      (dir, perShard)
    }
    val (_, a) = writeOnce()
    val (_, b) = writeOnce()
    assert(a == b, "shard contents or order changed across identical re-runs")
    // membership matches the declared assignment rule
    val expect = docs.withColumn("sh", Sampling.bucket(key, 3) % 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2).toInt).toMap
    for ((sh, ids) <- a; id <- ids) assert(expect(id) == sh)
    assert(a.values.map(_.size).sum == 300)
  }

  test("zorderBy clusters tiles into small dimension rectangles") {
    import graft.operators.Layout
    // 32x32 grid of (x, y) points; 8-bit z over [0,32) quantizes each
    // dim to 8 cells of 4 values
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toDouble, y.toDouble))
      .toDF("x", "y")
    val tiles = Layout.zorderBy(grid,
        Seq(("x", 0.0, 32.0), ("y", 0.0, 32.0)), bits = 8, partitions = 4)
      .groupBy(shiftright(col("__z"), 12).as("tile"))
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
    // each 2^12 z-span is a 2-cell x 2-cell quad = an 8x8 value square;
    // without z-ordering a contiguous span would cover a full row stripe
    tiles.foreach { t =>
      assert(t.getDouble(2) - t.getDouble(1) <= 7.0, s"x range too wide: $t")
      assert(t.getDouble(4) - t.getDouble(3) <= 7.0, s"y range too wide: $t")
    }
    assert(tiles.length == 16)
  }

  test("saltedJoin equals the plain join for inner/left at any multiplicity") {
    import graft.operators.Layout
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // fact: hot key 1 (5 rows), key 2 (2 rows), key 9 unmatched
      val fact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
        (2L, 20L), (2L, 21L), (9L, 90L)).toDF("k", "rid")
      // dim: key 1 has TWO rows (multiplicity), key 2 one, key 7 unmatched
      val dim = Seq((1L, "a"), (1L, "b"), (2L, "c"), (7L, "z")).toDF("k", "v")
      for (jt <- Seq("inner", "left")) {
        val salted = Layout.saltedJoin(fact, dim, "k", col("rid"), salts = 4, jt)
          .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted
        val plain = fact.join(dim, Seq("k"), jt)
          .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted
        assert(salted.toSeq == plain.toSeq, s"joinType=$jt")
      }
      // the physical join really runs on (key, salt) via shuffled hash
      val plan = Layout.saltedJoin(fact, dim, "k", col("rid"), salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"), s"expected shuffled-hash:\n$plan")
      assert(plan.contains("__salt"), s"join keys must include the salt:\n$plan")
      intercept[IllegalArgumentException] {
        Layout.saltedJoin(fact, dim, "k", col("rid"), salts = 1)
      }
      intercept[IllegalArgumentException] {
        Layout.saltedJoin(fact, dim, "k", col("rid"), salts = 4, "full")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
