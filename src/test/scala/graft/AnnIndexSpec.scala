package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Persisted IVFADC index ([[Similarity.AnnIndex]]): the parquet
  * round-trip, the append ≡ rebuild and delete ≡ never-present
  * maintenance invariants, and compaction's lineage truncation. */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val dim = 8
  private val m = 2

  // deterministic synthetic vectors: two loose clusters + noise dims
  private def vec(i: Long): Seq[Float] = {
    val base = if (i % 2 == 0) 1.0f else -1.0f
    (0 until dim).map(j => base * (1.0f + 0.01f * ((i * 7 + j * 3) % 5)))
  }
  private val corpus = (10L to 49L).map(i => (i, vec(i))).toDF("id", "emb")
  private val queries = (0L to 3L).map(i => (i, vec(i))).toDF("id", "emb")

  private val cents = corpus.orderBy("id").limit(4)
    .select(Similarity.quantize(col("emb")))
    .collect().map(r => r.getSeq[Long](0): Seq[Long])
  private val books = Similarity.pqFit(corpus, "id", "emb", dim, m, k = 4, iters = 2)

  private def idx = Similarity.buildAnnIndex(corpus, "id", "emb", dim, m, cents, books)

  private def probe(i: Similarity.AnnIndex): Seq[(Long, Long, Long, Long)] =
    Similarity.annTopK(i, queries, "emb", nprobe = 2, topK = 5)
      .select(col("qid").cast("long"), col("rank"), col("id").cast("long"),
        col("adc").cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("write/read round-trip preserves quantizers, meta, codes, and the probe") {
    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    idx.write(dir)
    val rt = Similarity.AnnIndex.read(spark, dir)
    assert(rt.dim == dim && rt.m == m && rt.idCol == "id" && !rt.residual)
    assert(rt.centroids.toSeq == cents.toSeq)
    assert(rt.codebooks.map(_.toSeq) == books.map(_.toSeq))
    assert(rt.codes.collect().map(_.toString).sorted.toSeq ==
      idx.codes.collect().map(_.toString).sorted.toSeq)
    assert(probe(rt) == probe(idx))
  }

  test("append ≡ from-scratch encode of the union, row for row") {
    val day1 = corpus.where(col("id") < 30)
    val day2 = corpus.where(col("id") >= 30)
    val rolled = Similarity.appendToAnnIndex(
      Similarity.buildAnnIndex(day1, "id", "emb", dim, m, cents, books),
      day2, "emb")
    assert(rolled.codes.collect().map(_.toString).sorted.toSeq ==
      idx.codes.collect().map(_.toString).sorted.toSeq)
    assert(probe(rolled) == probe(idx))
  }

  test("removed-then-probed ≡ never-present (frozen quantizers)") {
    val removed = Similarity.removeFromAnnIndex(idx,
      corpus.where(col("id") % 5 === 0).select("id"))
    val never = Similarity.buildAnnIndex(corpus.where(col("id") % 5 =!= 0),
      "id", "emb", dim, m, cents, books)
    assert(removed.codes.collect().map(_.toString).sorted.toSeq ==
      never.codes.collect().map(_.toString).sorted.toSeq)
    assert(probe(removed) == probe(never))
    // and removed ids really are gone from the ranking
    val ids = probe(removed).map(_._3).toSet
    assert(ids.forall(_ % 5 != 0))
  }

  test("removing absent ids is a no-op") {
    val noop = Similarity.removeFromAnnIndex(idx,
      Seq(999L, 1000L).toDF("id"))
    assert(probe(noop) == probe(idx))
  }

  test("compaction: same answer, lineage truncated to a scan") {
    val dir = java.nio.file.Files.createTempDirectory("annidx_c").toString
    val removed = Similarity.removeFromAnnIndex(idx,
      corpus.where(col("id") % 5 === 0).select("id"))
    val compacted = Similarity.compactAnnIndex(removed, dir)
    assert(probe(compacted) == probe(removed))
    // the anti-join is gone: the compacted codes plan is join-free
    assert(!compacted.codes.queryExecution.optimizedPlan.toString.contains("Join"))
    assert(removed.codes.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("residual-mode index round-trips with its flag and books") {
    val rbooks = Similarity.pqFitResidual(corpus, "id", "emb", dim, m, cents,
      k = 4, iters = 2)
    val ridx = Similarity.buildAnnIndex(corpus, "id", "emb", dim, m, cents,
      rbooks, residual = true)
    val dir = java.nio.file.Files.createTempDirectory("annidx_r").toString
    ridx.write(dir)
    val rt = Similarity.AnnIndex.read(spark, dir)
    assert(rt.residual)
    val got = Similarity.annTopK(rt, queries, "emb", nprobe = 2, topK = 5)
      .collect().map(_.toString).sorted.toSeq
    val want = Similarity.annTopK(ridx, queries, "emb", nprobe = 2, topK = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("Sq8Index: write/read round-trip preserves cells, bounds, codes, probe") {
    val sqBounds = Similarity.sq8FitResidual(corpus, "id", "emb", dim, cents)
    val sidx = Similarity.buildSq8Index(corpus, "id", "emb", dim, cents, sqBounds)
    val dir = java.nio.file.Files.createTempDirectory("sq8idx").toString
    sidx.write(dir)
    val rt = Similarity.Sq8Index.read(spark, dir)
    assert(rt.dim == dim && rt.idCol == "id")
    assert(rt.centroids.toSeq == cents.toSeq)
    assert(rt.bounds == sqBounds)
    assert(rt.codes.collect().map(_.toString).sorted.toSeq ==
      sidx.codes.collect().map(_.toString).sorted.toSeq)
    def probeS(i: Similarity.Sq8Index) =
      i.topK(queries, "emb", nprobe = 2, k = 5)
        .collect().map(_.toString).sorted.toSeq
    assert(probeS(rt) == probeS(sidx))
    // append ≡ from-scratch union encode (pure per-row function of the
    // frozen quantizers): union of encodes == encode of union
    val extra = (50L to 59L).map(i0 => (i0, vec(i0))).toDF("id", "emb")
    val apart = sidx.codes.unionByName(
      Similarity.ivfSq8Encode(extra, "id", "emb", dim, cents, sqBounds))
    val whole = Similarity.ivfSq8Encode(corpus.unionByName(extra),
      "id", "emb", dim, cents, sqBounds)
    assert(apart.collect().map(_.toString).sorted.toSeq ==
      whole.collect().map(_.toString).sorted.toSeq)
  }

  test("Sq8Index: delete + compaction ≡ never-present; absent-id no-op (VERDICT r12 missing #1)") {
    val sqBounds = Similarity.sq8FitResidual(corpus, "id", "emb", dim, cents)
    val sidx = Similarity.buildSq8Index(corpus, "id", "emb", dim, cents, sqBounds)
    import spark.implicits._
    val dropIds = corpus.where(col("id") % 5 === 0).select("id")
    val removed = Similarity.removeFromSq8Index(sidx, dropIds)
    // appendToSq8Index rolls forward through the frozen quantizers
    val extra = (70L to 74L).map(i0 => (i0, vec(i0))).toDF("id", "emb")
    val rolled = Similarity.appendToSq8Index(removed, extra, "emb")
    val dir = java.nio.file.Files.createTempDirectory("sq8idx-del").toString
    val compacted = Similarity.compactSq8Index(rolled, dir)
    // == from-scratch index over survivors ∪ appended batch
    val scratch = Similarity.buildSq8Index(
      corpus.where(col("id") % 5 =!= 0).unionByName(extra),
      "id", "emb", dim, cents, sqBounds)
    def probeS(i: Similarity.Sq8Index) =
      i.topK(queries, "emb", nprobe = 2, k = 5)
        .collect().map(_.toString).sorted.toSeq
    assert(probeS(compacted) == probeS(scratch))
    assert(compacted.codes.collect().map(_.toString).sorted.toSeq ==
      scratch.codes.collect().map(_.toString).sorted.toSeq)
    // deleting ids the index never held changes nothing
    val noop = Similarity.removeFromSq8Index(sidx,
      Seq(999L, 1000L).toDF("id"))
    assert(noop.codes.collect().map(_.toString).sorted.toSeq ==
      sidx.codes.collect().map(_.toString).sorted.toSeq)
  }
}
