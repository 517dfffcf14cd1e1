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

  // Counts by TREE TRAVERSAL, not plan-string regex (r9): toString
  // reprints an InMemoryRelation's cached plan at every reference and
  // echoes both the Final and Initial plan of executed AQE subtrees, so
  // string counts inflate with print artifacts (q_dedup_incr_bloom
  // "gained" 30 phantom exchanges when its sketch moved behind a scalar
  // subquery). Here each operator counts ONCE: cached plans dedup by
  // relation identity, subquery plans are walked (they hold real
  // exchanges, e.g. the Bloom sketch aggregate), Reused* nodes don't
  // recurse, and an AdaptiveSparkPlanExec contributes its CURRENT plan
  // only.
  private def flatOps(
      p: org.apache.spark.sql.execution.SparkPlan,
      seenCached: scala.collection.mutable.Set[Any])
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution._
    val extra: Seq[SparkPlan] = p match {
      case a: adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: adaptive.QueryStageExec => Seq(q.plan)
      case _: exchange.ReusedExchangeExec => Nil
      case _: ReusedSubqueryExec => Nil
      case i: columnar.InMemoryTableScanExec =>
        // each scan gets a fresh InMemoryRelation instance; the shared
        // CachedRDDBuilder is the identity of the cache entry
        val key = i.relation.cacheBuilder
        if (!seenCached.add(key)) Nil else Seq(i.relation.cachedPlan)
      case _ => Nil
    }
    // identical subqueries replicated by pushdown (e.g. a bloom-sketch
    // scalar subquery inferred onto both sides of a join) share one
    // runtime shuffle stage via the AQE stage cache — count the
    // canonical plan once, like ReusedSubqueryExec would
    val subqueries = p.expressions.flatMap(_.collect {
      case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
        pe.plan
    }).collect { case sp: SparkPlan => sp }
      .filter { sp =>
        seenCached.add(sp.canonicalized)
      }
    p +: (p.children ++ extra ++ subqueries).flatMap(flatOps(_, seenCached))
  }

  private def shapeOf(df: org.apache.spark.sql.DataFrame): Shape = {
    import org.apache.spark.sql.execution._
    val ops = flatOps(df.queryExecution.executedPlan,
      scala.collection.mutable.Set.empty[Any])
    Shape(
      ops.count(_.isInstanceOf[exchange.ShuffleExchangeLike]),
      ops.count(_.isInstanceOf[SortExec]),
      ops.count(_.isInstanceOf[exchange.BroadcastExchangeLike]),
      ops.count(o => o.isInstanceOf[joins.CartesianProductExec]
        || o.isInstanceOf[joins.BroadcastNestedLoopJoinExec]))
  }

  test("every query's plan shape matches the golden file (shuffles/sorts/broadcasts/products)") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val actual = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, q) =>
      spark.sharedState.cacheManager.clearCache()
      val df = q(spark, dir)
      name -> shapeOf(df)
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
