package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // left: (key, t, tag) / right: (key, t, price, qty)
  private def left = Seq(
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
    ("b", 15L, "l4"), ("c", 5L, "l5")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    ("a", 10L, 1.0, 100L), ("a", 25L, 2.0, 200L),
    ("b", 15L, 3.0, 300L), ("b", 14L, 4.0, 400L)
  ).toDF("k", "rt", "price", "qty")

  private def run(strict: Boolean, tol: Option[Long] = None) =
    AsOfJoin.asofJoin(left, right, Seq("k"), "t", "rt",
      Seq("price", "qty"), strict = strict, tolerance = tol.map(lit(_)))
      .collect().map(r => r.getString(2) -> (r.get(3), r.get(4))).toMap

  test("non-strict matches at-or-before; payload fields stay atomic") {
    val r = run(strict = false)
    assert(r("l1") == ((1.0, 100L)))   // equal time matches
    assert(r("l2") == ((1.0, 100L)))   // 25 is in the future
    assert(r("l3") == ((2.0, 200L)))   // latest of {10, 25}
    assert(r("l4") == ((3.0, 300L)))   // 15 beats 14; price+qty from same row
    assert(r("l5") == ((null, null)))  // key with no right rows
  }

  test("strict excludes equal-time right rows") {
    val r = run(strict = true)
    assert(r("l1") == ((null, null))) // only candidate was at t=10, equal
    assert(r("l4") == ((4.0, 400L)))  // 15 excluded, falls back to 14
  }

  test("tolerance nulls out stale matches") {
    val r = run(strict = false, tol = Some(6L))
    assert(r("l2") == ((null, null))) // age 20-10=10 exceeds 6
    assert(r("l1") == ((1.0, 100L)))  // age 0
  }

  test("tolerance boundary: age == tolerance is kept") {
    val r = run(strict = false, tol = Some(10L))
    assert(r("l2") == ((1.0, 100L)))  // age exactly 10
    assert(r("l3") == ((2.0, 200L)))  // age 5
  }

  test("randomized: matches a brute-force scan for both strict modes") {
    val rnd = new scala.util.Random(20260812L)
    val keys = Seq("a", "b", "c")
    // distinct times per (key, side) to satisfy the uniqueness contract
    val lRows = Seq.tabulate(120)(i => (keys(rnd.nextInt(3)), i * 3L + rnd.nextInt(2), s"L$i"))
    val rRows = Seq.tabulate(80)(i => (keys(rnd.nextInt(3)), i * 5L + rnd.nextInt(3), i.toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // dedupe (key, rt)
    val l = lRows.toDF("k", "t", "tag")
    val r = rRows.toDF("k", "rt", "price")
    for (strict <- Seq(true, false)) {
      val got = AsOfJoin.asofJoin(l, r, Seq("k"), "t", "rt", Seq("price"), strict = strict)
        .collect().map(x => x.getString(2) -> x.get(3)).toMap
      val want = lRows.map { case (k, t, tag) =>
        val cands = rRows.filter(rr => rr._1 == k && (if (strict) rr._2 < t else rr._2 <= t))
        tag -> (if (cands.isEmpty) null else cands.maxBy(_._2)._3)
      }.toMap
      assert(got == want, s"strict=$strict diverges from brute force")
    }
  }

  test("asofJoinChunked equals asofJoin for all modes (Blelloch fill topology)") {
    val rnd = new scala.util.Random(424242L)
    val keys = Seq("a", "b")
    val lRows = Seq.tabulate(150)(i => (keys(rnd.nextInt(2)), i * 3L + rnd.nextInt(2), s"L$i"))
    val rRows = Seq.tabulate(90)(i => (keys(rnd.nextInt(2)), i * 5L + rnd.nextInt(3), i.toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val l = lRows.toDF("k", "t", "tag").repartition(7)
    val r = rRows.toDF("k", "rt", "price").repartition(5)
    for (strict <- Seq(true, false); tol <- Seq(None, Some(25L))) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("tag", "r_price").collect().map(x => x.getString(0) -> x.get(1)).toMap
      val plain = rows(AsOfJoin.asofJoin(l, r, Seq("k"), "t", "rt", Seq("price"),
        strict = strict, tolerance = tol.map(lit(_))))
      val chunked = rows(AsOfJoin.asofJoinChunked(l, r, Seq("k"), "t", "rt", Seq("price"),
        chunk = t => floor(t / 40L), strict = strict, tolerance = tol.map(lit(_))))
      assert(chunked == plain, s"strict=$strict tol=$tol: chunked fill diverges")
    }
  }

  test("NULL keys and NULL times survive the chunked fill (ADVICE r4)") {
    // The chunked fill's carry join was null-unsafe: left rows with a NULL
    // key, or a NULL time (chunk(NULL) -> NULL __chunk), were silently
    // dropped while the window form kept them. Pin the equality on both.
    val l = Seq(
      (Option("a"), Option(10L), "l1"), (Option("a"), Option(30L), "l2"),
      (None: Option[String], Option(12L), "l3"),   // NULL key
      (Option("a"), None: Option[Long], "l4"),     // NULL time
      (None: Option[String], None: Option[Long], "l5")
    ).toDF("k", "t", "tag").repartition(3)
    val r = Seq(
      (Option("a"), Option(5L), 1.0), (Option("a"), Option(25L), 2.0),
      (None: Option[String], Option(10L), 9.0)     // NULL-key right row
    ).toDF("k", "rt", "price").repartition(2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("tag", "r_price").collect().map(x => x.getString(0) -> x.get(1)).toMap
    val plain = rows(AsOfJoin.asofJoin(l, r, Seq("k"), "t", "rt", Seq("price")))
    val chunked = rows(AsOfJoin.asofJoinChunked(l, r, Seq("k"), "t", "rt",
      Seq("price"), chunk = t => floor(t / 20L)))
    assert(plain.keySet == Set("l1", "l2", "l3", "l4", "l5"),
      "window form must keep every left row")
    assert(chunked == plain, "chunked fill diverges on NULL keys/times")
    // NULL-key group matches its own right rows, like any other group
    assert(plain("l3") == 9.0)
  }

  private def runForward(strict: Boolean, tol: Option[Long] = None) =
    AsOfJoin.asofJoinForward(left, right, Seq("k"), "t", "rt",
      Seq("price", "qty"), strict = strict, tolerance = tol.map(lit(_)))
      .collect().map(r => r.getString(2) -> (r.get(3), r.get(4))).toMap

  test("forward non-strict matches at-or-after; earliest wins") {
    val r = runForward(strict = false)
    assert(r("l1") == ((1.0, 100L)))   // equal time matches
    assert(r("l2") == ((2.0, 200L)))   // earliest of {25}
    assert(r("l3") == ((null, null)))  // nothing at-or-after 30
    assert(r("l4") == ((3.0, 300L)))   // 15 beats nothing later; 14 is past
    assert(r("l5") == ((null, null)))
  }

  test("forward strict excludes equal-time right rows") {
    val r = runForward(strict = true)
    assert(r("l1") == ((2.0, 200L)))   // 10 excluded, next is 25
    assert(r("l4") == ((null, null)))  // only candidates are at/before 15
  }

  test("forward tolerance bounds (rightTime - leftTime)") {
    assert(runForward(strict = false, tol = Some(5L))("l2") == ((2.0, 200L)))  // 25-20=5 kept
    assert(runForward(strict = false, tol = Some(4L))("l2") == ((null, null))) // 5 > 4 aged out
  }

  test("nearest picks the closer side; backward wins ties; tolerance per side") {
    // d: left at 20, right at 10 and 30 -> exact tie -> backward (10)
    val l = Seq(("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 30L, "l3"),
      ("c", 5L, "l5"), ("d", 20L, "l6")).toDF("k", "t", "tag")
    val r = Seq(("a", 10L, 1.0), ("a", 25L, 2.0),
      ("d", 10L, 7.0), ("d", 30L, 8.0)).toDF("k", "rt", "price")
    def run(tol: Option[Long]) =
      AsOfJoin.asofJoinNearest(l, r, Seq("k"), "t", "rt", Seq("price"),
        tolerance = tol.map(lit(_)))
        .collect().map(x => x.getString(2) -> x.get(3)).toMap
    val got = run(None)
    assert(got("l1") == 1.0)  // distance 0, backward owns equal-time
    assert(got("l2") == 2.0)  // back d=10 vs fwd d=5 -> forward
    assert(got("l3") == 2.0)  // only backward exists (25)
    assert(got("l5") == null) // keyless
    assert(got("l6") == 7.0)  // exact tie 10 vs 10 -> backward
    // tolerance drops each side independently: l2's forward (d=5) survives
    // tol=5 while backward (d=10) ages out; tol=4 kills both
    assert(run(Some(5L))("l2") == 2.0)
    assert(run(Some(4L))("l2") == null)
  }

  test("nearest == brute force on randomized data") {
    val rnd = new scala.util.Random(43)
    val keys = Seq("a", "b", "c")
    val lRows = Seq.tabulate(120)(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(200).toLong, s"t$i"))
    // unique (k, rt): the determinism contract
    val rRows = Seq.tabulate(60)(_ =>
      (keys(rnd.nextInt(3)), rnd.nextInt(200).toLong, rnd.nextInt(100).toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val l = lRows.toDF("k", "t", "tag").repartition(7)
    val r = rRows.toDF("k", "rt", "price").repartition(5)
    val got = AsOfJoin.asofJoinNearest(l, r, Seq("k"), "t", "rt", Seq("price"))
      .select("tag", "r_price").collect().map(x => x.getString(0) -> x.get(1)).toMap
    val byKey = rRows.groupBy(_._1)
    for ((k, t, tag) <- lRows) {
      val cands = byKey.getOrElse(k, Seq.empty)
      val want =
        if (cands.isEmpty) null
        else {
          // min distance; ties -> the backward candidate (rt <= t wins)
          val best = cands.minBy(c => (math.abs(c._2 - t), if (c._2 <= t) 0 else 1))
          java.lang.Double.valueOf(best._3)
        }
      assert(got(tag) == want, s"key=$k t=$t: got ${got(tag)} want $want")
    }
  }
}
