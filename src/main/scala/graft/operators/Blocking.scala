package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo, "The merge/purge
  * problem for large databases", SIGMOD'95 — the classic record-linkage
  * blocking strategy): sort the corpus by a blocking key and compare
  * only rows within a fixed-size sliding WINDOW of the sort order.
  * Complements the hash-family blockers (MinHash/SimHash/FastSS): the
  * window catches near-sorted neighbors — typo'd prefixes, serial ids,
  * near-equal timestamps — with candidate count n·(window−1) regardless
  * of key skew.
  *
  * The scale problem is the GLOBAL rank: a naive
  * `row_number() OVER (ORDER BY key)` is a single-task sort of the
  * corpus. [[globalRank]] is the chunk-carry form (the
  * [[GroupByScan.scanChunked]] Blelloch shape): rows rank LOCALLY
  * within a chunk (one partitioned window), chunk COUNTS reduce to a
  * tiny per-chunk table whose exclusive prefix-sum is the chunk's rank
  * offset (one window over ~distinct-chunk rows), and the offset joins
  * back by chunk equality (broadcast). The chunk expression must be a
  * NON-DECREASING function of the sort key (a prefix, a truncated
  * range, a date bucket) so that (chunk, key) order IS key order —
  * that contract is the caller's, pinned by BlockingSpec's
  * chunked == single-window equality. */
object Blocking {

  /** Global dense 1-based row rank by (`chunkCol`, `keyCols`...) —
    * bit-identical to `row_number() OVER (ORDER BY keyCols)` whenever
    * `chunkCol` is a non-decreasing function of the key order (and
    * `keyCols` includes a tiebreaker making the order total). No
    * corpus-sized single-task sort: one chunk-partitioned window + one
    * tiny carry table + one broadcast join-back. Reserves `__chk`,
    * `__lrn`, `__off`. */
  def globalRank(
      df: DataFrame,
      keyCols: Seq[Column],
      chunkCol: Column,
      as: String = "rn"): DataFrame = {
    val reserved = Seq("__chk", "__lrn", "__off")
    val clashes = df.columns.toSeq.intersect(reserved :+ as)
    require(clashes.isEmpty,
      s"globalRank reserves ${(reserved :+ as).mkString("/")}; rename ${clashes.mkString(", ")} in the input")
    val in = df.withColumn("__chk", chunkCol)
    val local = Window.partitionBy(col("__chk")).orderBy(keyCols: _*)
    val ranked = in.withColumn("__lrn", row_number().over(local))
    // exclusive prefix of chunk sizes: the carry table is
    // distinct-chunk-sized — the scanChunked "tiny per-group chunk
    // sequence" contract — so its single-task window is bounded state
    val prevWin = Window.orderBy(col("__chk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = in.groupBy(col("__chk")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(prevWin), lit(0L)))
      .select(col("__chk"), col("__off"))
    ranked.join(broadcast(offsets), Seq("__chk"))
      .withColumn(as, (col("__off") + col("__lrn")).cast("long"))
      .drop("__chk", "__lrn", "__off")
  }

  /** Sorted-neighborhood candidate PAIRS: (id_a, id_b, key_a, key_b,
    * gap) for every pair within `window` positions of each other in
    * (key, id) sort order (0 < gap = rn_b − rn_a < window, id order by
    * rank). NULL keys are absent (the [[Dedup.dedupIncremental]]
    * convention). Callers verify with their exact predicate
    * (levenshtein, jaccard, field comparisons) — blocking has recall
    * < 1 BY DESIGN (only sort-adjacent pairs meet; the merge/purge
    * multi-pass answer is to union passes over different keys).
    *
    * Scale shape: candidates come from ONE equality join on the rank
    * bucket rn div window (each left row probes its own and the next
    * bucket — a pair within `window` spans at most adjacent buckets,
    * and exactly one arm matches, so no dedup pass); the join moves
    * (rn, id, key) rows only. Candidate volume is exactly
    * n·(window−1) − (window·(window−1))/2 pairs pre-filter, skew-free
    * regardless of key distribution — the property hash blocking
    * cannot offer under boilerplate keys. */
  /** MULTI-PASS merge/purge (the Hernández-Stolfo full recipe): union
    * the sorted-neighborhood candidates of several independent blocking
    * keys — a true match missed by one sort order (a typo in the
    * leading character buries a pair hundreds of positions apart) is
    * usually adjacent under another (a reversed key, a different
    * field). Output is id-NORMALIZED distinct (id_a < id_b) candidate
    * pairs; callers join their fields back for the exact verify. Each
    * pass is one [[sortedNeighborhoodPairs]] plan; the union moves id
    * pairs only. */
  def multiPassPairs(
      df: DataFrame,
      idCol: String,
      keys: Seq[Column],
      window: Int,
      chunkOf: Column => Column = k => substring(k, 1, 1)): DataFrame = {
    require(keys.nonEmpty, "multiPassPairs needs at least one blocking key")
    keys.map(k =>
        sortedNeighborhoodPairs(df, idCol, k, window, chunkOf)
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b")))
      .reduce(_ unionByName _)
      .distinct()
  }

  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      keyCol: Column,
      window: Int,
      chunkOf: Column => Column = k => substring(k, 1, 1)): DataFrame = {
    require(window >= 2, s"window must be >= 2 (got $window)")
    val keyed = df.select(col(idCol).as("id"), keyCol.as("__k"))
      .where(col("__k").isNotNull)
    val ranked = globalRank(keyed, Seq(col("__k"), col("id")),
      chunkOf(col("__k")), as = "__rn")
    val withB = ranked.withColumn("__b", expr(s"(__rn - 1) div $window"))
    val probe = withB.select(col("id"), col("__k"), col("__rn"),
      explode(array(col("__b"), col("__b") + 1)).as("__b"))
    probe.as("a")
      .join(withB.as("b"), col("a.__b") === col("b.__b")
        && col("b.__rn") > col("a.__rn")
        && col("b.__rn") - col("a.__rn") < window)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.__k").as("key_a"), col("b.__k").as("key_b"),
        (col("b.__rn") - col("a.__rn")).as("gap"))
  }
}
