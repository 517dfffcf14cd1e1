package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val cap = 64L
  private def docs = {
    val rnd = new scala.util.Random(20260812L)
    (0 until 300).map { i =>
      (s"g${i % 3}", i.toLong, 1L + rnd.nextInt(40))
    }.toDF("g", "id", "toks").repartition(5)
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "id", "seq", "seq_offset", "n_splits")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("packSequences matches the sequential brute-force chunking") {
    val got = collectAssign(Packing.packSequences(
      docs, Seq("g"), Seq(col("id")), "toks", cap))
    val rows = docs.select("g", "id", "toks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      var acc = 0L
      rs.sortBy(_._2).toSeq.map { case (_, id, t) =>
        val start = acc; acc += t
        (g, id) -> ((start / cap, start % cap, (start + t - 1) / cap - start / cap))
      }
    }.toMap
    assert(got == want)
  }

  test("invariants: offset < capacity; n_splits = 0 iff the doc fits its sequence") {
    val p = Packing.packSequences(docs, Seq("g"), Seq(col("id")), "toks", cap)
    assert(p.where(col("seq_offset") < 0 || col("seq_offset") >= cap).count() == 0)
    assert(p.where((col("seq_offset") + col("toks") <= cap) =!= (col("n_splits") === 0)).count() == 0)
    // per group: total tokens == last doc's start + its tokens (no gaps)
    val tot = p.groupBy("g").agg(
      sum("toks").as("t"),
      max(col("seq") * cap + col("seq_offset") + col("toks")).as("endAt"))
    assert(tot.where(col("t") =!= col("endAt")).count() == 0)
  }

  test("chunked packing is identical to the window form (skew-safe path)") {
    val plain = collectAssign(Packing.packSequences(
      docs, Seq("g"), Seq(col("id")), "toks", cap))
    val chunked = collectAssign(Packing.packSequencesChunked(
      docs, Seq("g"), Seq(col("id")), "toks", cap, chunk = floor(col("id") / 50)))
    assert(chunked == plain)
  }

  test("deterministic under repartitioning; output columns are long-typed") {
    val a = collectAssign(Packing.packSequences(docs, Seq("g"), Seq(col("id")), "toks", cap))
    val b = collectAssign(Packing.packSequences(
      docs.repartition(17), Seq("g"), Seq(col("id")), "toks", cap))
    assert(a == b)
    val schema = Packing.packSequences(docs, Seq("g"), Seq(col("id")), "toks", cap).schema
    for (c <- Seq("seq", "seq_offset", "n_splits"))
      assert(schema(c).dataType == org.apache.spark.sql.types.LongType, c)
  }

  test("a document larger than capacity straddles multiple sequences") {
    val d = Seq(("g", 1L, 10L), ("g", 2L, 200L), ("g", 3L, 5L))
      .toDF("g", "id", "toks")
    val got = collectAssign(Packing.packSequences(d, Seq("g"), Seq(col("id")), "toks", cap))
    assert(got(("g", 1L)) == ((0L, 0L, 0L)))
    // doc 2 starts at 10, ends at 209: crosses floor(209/64)=3 - 0 = 3 edges
    assert(got(("g", 2L)) == ((0L, 10L, 3L)))
    // doc 3 starts at 210: seq 3, offset 210-192=18
    assert(got(("g", 3L)) == ((3L, 18L, 0L)))
  }

  test("a 0-token (or NULL-token) document fails fast instead of reporting n_splits = -1") {
    // doc 2 has 0 tokens and lands exactly on the capacity boundary —
    // the silent-corruption case the guard exists for (r4 VERDICT)
    val zero = Seq(("g", 1L, cap), ("g", 2L, 0L), ("g", 3L, 5L))
      .toDF("g", "id", "toks")
    val e = intercept[Exception] {
      Packing.packSequences(zero, Seq("g"), Seq(col("id")), "toks", cap).collect()
    }
    assert(e.getMessage.contains("must be > 0"), e.getMessage)
    val nul = Seq(("g", 1L, Some(10L)), ("g", 2L, None))
      .toDF("g", "id", "toks")
    val e2 = intercept[Exception] {
      Packing.packSequences(nul, Seq("g"), Seq(col("id")), "toks", cap).collect()
    }
    assert(e2.getMessage.contains("must be > 0"), e2.getMessage)
  }
}
