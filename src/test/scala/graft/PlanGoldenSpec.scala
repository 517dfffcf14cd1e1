package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** Per-query PLAN-SHAPE regression pins (r6 verdict #10): the golden
  * file records, for every SparkEntry query, the shuffle / sort /
  * broadcast / product-join counts of its pre-execution physical plan at
  * sf0.001. A refactor that adds a shuffle (or drops a broadcast, or
  * falls back to a nested-loop join) now fails a SPEC instead of waiting
  * for a bench eyeball. PlanAuditSpec keeps the deeper per-operator
  * assertions (pushdown strings, codegen spans); this file is the wide
  * safety net.
  *
  * Counts come from the INITIAL (pre-AQE-execution) plan — deterministic
  * for fixed confs and data, no jobs run beyond what the query builders
  * themselves execute eagerly (sizing counts, k-means fits, the
  * streaming replays — the same work DriverContractSpec already does).
  * Driver-materialized queries (the streaming rows, the bloom probe)
  * pin as plan-free LocalTableScans — stable, which is what matters.
  *
  * The shared-session CACHE is cleared before each query: a persisted
  * stage left by another suite (or a prior query in this loop) collapses
  * downstream lineage into an InMemoryTableScan, making counts depend on
  * suite order. Clearing pins each query's STANDALONE plan — the shape a
  * fresh cluster run would execute.
  *
  * Regenerate after an INTENDED plan change:
  *   GRAFT_PLAN_GOLDEN_UPDATE=1 sbt "testOnly graft.PlanGoldenSpec"
  * then review the diff like code: every changed line must be explained
  * by the change you meant to make.
  */
class PlanGoldenSpec extends AnyFunSuite {

  private val GoldenPath = "src/test/resources/plan_golden.tsv"

  private case class Shape(shuffles: Int, sorts: Int, broadcasts: Int, products: Int) {
    def tsv: String = s"$shuffles\t$sorts\t$broadcasts\t$products"
  }

  private def shapeOf(p: String): Shape = Shape(
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r.findAllIn(p).length,
    """(?m)^\s*(\+-|:-)?\s*\*?\(?\d*\)?\s*Sort\s\[""".r.findAllIn(p).length,
    "BroadcastExchange".r.findAllIn(p).length,
    "(CartesianProduct|BroadcastNestedLoopJoin)".r.findAllIn(p).length)

  test("every query's plan shape matches the golden file (shuffles/sorts/broadcasts/products)") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val actual = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      spark.sharedState.cacheManager.clearCache()
      val df = q(spark, dir)
      name -> shapeOf(df.queryExecution.executedPlan.toString)
    }
    spark.sharedState.cacheManager.clearCache()
    val lines = actual.map { case (n, s) => s"$n\t${s.tsv}" }
    if (sys.env.get("GRAFT_PLAN_GOLDEN_UPDATE").contains("1")) {
      Files.write(Paths.get(GoldenPath),
        (lines :+ "").mkString("\n").getBytes("UTF-8"))
      fail(s"golden regenerated at $GoldenPath — review the diff and commit; " +
        "unset GRAFT_PLAN_GOLDEN_UPDATE to compare")
    }
    assert(Files.exists(Paths.get(GoldenPath)),
      s"no golden file at $GoldenPath — run with GRAFT_PLAN_GOLDEN_UPDATE=1 to create it")
    val golden = Files.readAllLines(Paths.get(GoldenPath)).asScala
      .filter(_.nonEmpty).map { l =>
        val Array(n, sh, so, b, pr) = l.split("\t")
        n -> Shape(sh.toInt, so.toInt, b.toInt, pr.toInt)
      }.toMap
    val diffs = actual.flatMap { case (n, s) =>
      golden.get(n) match {
        case None => Some(s"$n: NEW query, not in golden (regenerate)")
        case Some(g) if g != s =>
          Some(s"$n: golden ${g.tsv} != actual ${s.tsv} (shuffles/sorts/broadcasts/products)")
        case _ => None
      }
    } ++ (golden.keySet -- actual.map(_._1).toSet).toSeq.sorted
      .map(n => s"$n: in golden but no longer in SparkEntry.queries (regenerate)")
    assert(diffs.isEmpty,
      ("plan shapes drifted — an added Exchange/Sort or a dropped Broadcast is a " +
        "scale regression unless intended; if intended, regenerate with " +
        "GRAFT_PLAN_GOLDEN_UPDATE=1 and review:\n") + diffs.mkString("\n"))
  }
}
