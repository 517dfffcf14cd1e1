package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  graft.expressions.GraftFunctions.register(spark)

  private val n = 4000
  private def docs = (0 until n).map { i =>
    (i.toLong, s"doc $i body ${(i * 7919) % 1000}", s"s${i % 4}")
  }.toDF("id", "text", "source")

  test("bucket stays in [0, M) and scatters consecutive ids") {
    val b = docs.select(Sampling.bucket(Sampling.idKey(col("id")), 0).as("u"))
    val mm = b.agg(min("u"), max("u")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < Sampling.M)
    // quadratic scatter: consecutive ids must not land in one arithmetic
    // progression (an affine map would): successive gaps take many values
    val gaps = b.limit(100).collect().map(_.getLong(0))
      .sliding(2).map(p => p(1) - p(0)).toSet
    assert(gaps.size > 50, s"expected scattered gaps, got ${gaps.size} distinct")
  }

  test("hashSample: deterministic under repartitioning, rate within binomial bounds") {
    val a = Sampling.hashSample(docs, Sampling.idKey(col("id")), 0.25, salt = 7)
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(13), Sampling.idKey(col("id")), 0.25, salt = 7)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample must be a pure function of (key, rate, salt)")
    // 5 sigma around n*rate
    val sd = math.sqrt(n * 0.25 * 0.75)
    assert(math.abs(a.size - n * 0.25) < 5 * sd, s"kept ${a.size} of $n at rate 0.25")
    // rate edges
    assert(Sampling.hashSample(docs, Sampling.idKey(col("id")), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, Sampling.idKey(col("id")), 1.0).count() == n)
  }

  test("different salts draw (near-)independent samples") {
    val a = Sampling.hashSample(docs, Sampling.idKey(col("id")), 0.5, salt = 1)
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, Sampling.idKey(col("id")), 0.5, salt = 2)
      .select("id").as[Long].collect().toSet
    val overlap = a.intersect(b).size.toDouble
    // independent draws overlap at rate^2 = 0.25: allow 5 sigma
    val exp = n * 0.25
    assert(math.abs(overlap - exp) < 5 * math.sqrt(n * 0.25 * 0.75),
      s"overlap $overlap vs expected ~$exp")
  }

  test("assignSplit: exhaustive + disjoint at total weight 1; proportions hold") {
    val split = Sampling.assignSplit(docs, Sampling.textKey(col("text")),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 2)
    assert(split.where(col("split").isNull).count() == 0,
      "weights summing to 1 must assign every row")
    val byName = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(math.abs(byName("train") - 0.8 * n) < 5 * math.sqrt(n * 0.8 * 0.2))
    assert(math.abs(byName("val") - 0.1 * n) < 5 * math.sqrt(n * 0.1 * 0.9))
    // determinism under repartitioning
    val again = Sampling.assignSplit(docs.repartition(11), Sampling.textKey(col("text")),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 2)
      .select("id", "split").as[(Long, String)].collect().toMap
    val first = split.select("id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("assignSplit: content-keyed -> duplicate text co-locates; partial weights leave NULL") {
    val dup = Seq((1L, "same body"), (2L, "same body"), (3L, "other body"))
      .toDF("id", "text")
    val s = Sampling.assignSplit(dup, Sampling.textKey(col("text")),
      Seq("a" -> 0.5, "b" -> 0.5), salt = 5)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(s(1L) == s(2L), "identical content must land in one split")
    val partial = Sampling.assignSplit(docs, Sampling.idKey(col("id")),
      Seq("keep" -> 0.3), salt = 0)
    val kept = partial.where(col("split") === "keep").count()
    val nulls = partial.where(col("split").isNull).count()
    assert(kept + nulls == n)
    assert(math.abs(kept - 0.3 * n) < 5 * math.sqrt(n * 0.3 * 0.7))
  }

  test("sampleToMixture: binding source kept whole, others downsampled to ratio") {
    // a: 1000 rows, b: 400, c: 100; target 2:1:1 -> binding is c
    // (ratios 500/400/100), so keep all of c, a at 2*100/(2*1000)... i.e.
    // rate_s = t_s*n_m/(t_m*n_s): a -> 200/1000, b -> 100/400
    val rows = (0 until 1000).map(i => (i.toLong, s"a text $i", "a")) ++
      (0 until 400).map(i => (2000L + i, s"b text $i", "b")) ++
      (0 until 100).map(i => (3000L + i, s"c text $i", "c"))
    val df = rows.toDF("id", "text", "source").repartition(7)
    val kept = Sampling.sampleToMixture(df, "source",
      Seq("a" -> 2L, "b" -> 1L, "c" -> 1L), Sampling.idKey(col("id")), salt = 9)
    val bys = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys("c") == 100L, "binding source must be kept in full")
    assert(math.abs(bys("a") - 200.0) < 5 * math.sqrt(200.0 * 0.8), s"a kept ${bys("a")}")
    assert(math.abs(bys("b") - 100.0) < 5 * math.sqrt(100.0 * 0.75), s"b kept ${bys("b")}")
    // deterministic under repartitioning
    val again = Sampling.sampleToMixture(df.repartition(3), "source",
      Seq("a" -> 2L, "b" -> 1L, "c" -> 1L), Sampling.idKey(col("id")), salt = 9)
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("upsampleToMixture: whole copies exact, fractional share in band, drops, partition-invariant") {
    val docs = (1 to 600).map(i => (s"src${i % 3}", i.toLong, s"text body $i"))
      .toDF("source", "doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.upsampleToMixture(d, "source",
        Seq("src0" -> 2500000L, "src1" -> 1000000L, "src2" -> 0L),
        Sampling.textKey(col("text")), salt = 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val rows = run(docs)
    // src1 rate 1.0: every row exactly once, copy_idx 0
    assert(rows.filter(_._1 == "src1").map(_._2).sorted.toSeq ==
      (1 to 600).filter(_ % 3 == 1).map(_.toLong).sorted.toSeq)
    // src2 rate 0 and unlisted sources: absent
    assert(!rows.exists(_._1 == "src2"))
    // src0 rate 2.5: each doc 2 or 3 copies; overall mean ~2.5
    val bySrc0 = rows.filter(_._1 == "src0").groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc0.values.forall(n => n == 2 || n == 3))
    val mean = bySrc0.values.sum.toDouble / bySrc0.size
    assert(mean > 2.3 && mean < 2.7, s"fractional share off: mean copies $mean")
    // copy_idx is 0..k-1 per doc
    val idx = rows.filter(_._1 == "src0").groupBy(_._2)
      .view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(idx.values.forall(s => s == (0L until s.length).toSeq))
    assert(run(docs.repartition(13)).sorted.toSeq == rows.sorted.toSeq)
  }

  test("sampleToMixture: untargeted sources drop; missing target source empties the result") {
    val df = Seq((1L, "x", "a"), (2L, "y", "a"), (3L, "z", "b"))
      .toDF("id", "text", "source")
    val kept = Sampling.sampleToMixture(df, "source", Seq("a" -> 1L),
      Sampling.idKey(col("id")), salt = 0)
    assert(kept.select("source").distinct().as[String].collect().toSeq == Seq("a"))
    assert(kept.count() == 2, "sole targeted source is binding -> kept whole")
    val infeasible = Sampling.sampleToMixture(df, "source",
      Seq("a" -> 1L, "missing" -> 1L), Sampling.idKey(col("id")), salt = 0)
    assert(infeasible.count() == 0,
      "a target source with no rows makes the mixture infeasible (K=0)")
  }

  test("weightedSampleK: exact k per group, weight bias, zero/NULL weights out, partition-invariant") {
    import spark.implicits._
    val df = (0L until 400L).map { i =>
      val w: java.lang.Double =
        if (i % 97 == 0) null
        else if (i % 13 == 0) 0.0
        else if (i < 200L) 1000.0 else 0.01 // group g0 heavy first half, g1 same shape
      (i, if (i % 2 == 0) "g0" else "g1", w)
    }.toDF("id", "grp", "w")
    def sel(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSampleK(d, Seq("grp"), k = 15,
        Sampling.idKey(col("id")), col("w"), col("id"), salt = 3)
    val got = sel(df).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // exactly k per group
    assert(got.count(_._2 == "g0") == 15 && got.count(_._2 == "g1") == 15)
    // NULL and zero weights never sample
    assert(got.forall { case (i, _) => i % 97 != 0 && i % 13 != 0 })
    // weight bias: heavy rows (w=1000, ids < 200) dominate picks — with a
    // 100000x weight ratio the chance of even ONE light row in a 15-pick
    // sample is ~1%; allow 2 as deterministic slack for this fixed salt
    assert(got.count(_._1 >= 200L) <= 2,
      s"light rows over-selected: ${got.filter(_._1 >= 200L)}")
    // keyed-hash determinism: same result from any partitioning
    assert(sel(df.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == got)
    // k > eligible group size: min(k, eligible) rows, no padding
    val tiny = Seq((1L, "x", 5.0), (2L, "x", 1.0)).toDF("id", "grp", "w")
    assert(Sampling.weightedSampleK(tiny, Seq("grp"), k = 10,
      Sampling.idKey(col("id")), col("w"), col("id")).count() == 2)
  }

  test("tokenBudgetSample: self-capping, budget bands, unlisted sources drop") {
    // a: 100 docs x 10 tokens = 1000; b: 400 x 10 = 4000; c unlisted
    val rows = (1L to 100L).map(i => (i, "a", 10L)) ++
      (101L to 500L).map(i => (i, "b", 10L)) ++
      (501L to 520L).map(i => (i, "c", 10L))
    val df = rows.toDF("id", "src", "toks")
    // budget 2000 split 1:1 -> a's share 1000 >= inventory (keep ALL),
    // b samples toward 1000 of its 4000
    val kept = Sampling.tokenBudgetSample(df, "src", "toks", budget = 2000L,
      weights = Seq("a" -> 1L, "b" -> 1L), key = Sampling.idKey(col("id")),
      salt = 4)
    val bySrc = kept.groupBy("src").agg(sum("toks").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") == 1000L)                    // self-capped: everything
    assert(!bySrc.contains("c"))                   // unlisted drops
    val b = bySrc("b").toDouble                    // Bernoulli(0.25) x 400
    assert(b > 1000 * 0.5 && b < 1000 * 1.6, s"b kept $b")
    // deterministic: same call, same rows
    val again = Sampling.tokenBudgetSample(df.repartition(7), "src", "toks",
      2000L, Seq("a" -> 1L, "b" -> 1L), Sampling.idKey(col("id")), salt = 4)
    assert(again.select("id").as[Long].collect().sorted.toSeq ==
      kept.select("id").as[Long].collect().sorted.toSeq)
    // the keep rule replayed by hand for source b
    val expectB = df.where(col("src") === "b")
      .withColumn("u", Sampling.bucket(Sampling.idKey(col("id")), 4))
      .where(col("u") * lit(4000L) * lit(2L) <
        lit(Sampling.M) * lit(2000L) * lit(1L))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept.where(col("src") === "b")
      .select("id").as[Long].collect().sorted.toSeq == expectB)
    // NULL token rows are absent
    val withNull = Seq((1L, "a", Some(10L)), (2L, "a", None)).toDF("id", "src", "toks")
    assert(Sampling.tokenBudgetSample(withNull, "src", "toks", 1000L,
      Seq("a" -> 1L), Sampling.idKey(col("id"))).count() == 1)
  }
}
