package graft.operators

import org.apache.spark.sql.DataFrame

/** Storage-layout operators — the `rechunk_for_blockwise` analog
  * (reference core.py:634-664, optimal-chunk solver core.py:221-252).
  *
  * The reference rechunks dask arrays so chunk boundaries align with
  * group boundaries, making the grouped reduction embarrassingly parallel
  * (no cross-chunk combine). In Spark that is a *storage* decision, not a
  * runtime operator: write the table bucketed (and sorted) by the group
  * keys, and every later `groupBy` on those keys satisfies its required
  * distribution from the bucketing metadata — the Exchange disappears
  * from the plan (asserted by BucketedNoShuffleSpec), turning repeated
  * reductions over a 100 TB fact table into shuffle-free scans.
  *
  * The `rechunk_for_cohorts` sibling (core.py:540-631) is deliberately
  * not built: it exists to avoid dask's all-to-one concatenation, a
  * problem Spark's hash shuffle does not have (SURVEY §2.3/§4).
  */
object Layout {

  /** Write `df` as a bucketed, in-bucket-sorted table on the group keys.
    * One shuffle now buys zero shuffles for every subsequent grouped
    * reduction on `keys` (and sort-merge-join co-location against tables
    * bucketed the same way). Size `buckets` ≈ data volume / healthy
    * partition size (e.g. 100 TB / 256 MB ≈ 400k — cap by cluster task
    * budget). Requires a metastore-backed catalog (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty, "need at least one bucketing key")
    require(buckets > 0, "buckets must be positive")
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** In-session analog: pre-partition a DataFrame by the group keys so a
    * *chain* of grouped operations on the same keys reuses one up-front
    * exchange (Catalyst elides the later ones — the partitioning already
    * satisfies their required distribution). Use when several reductions/
    * scans over the same keys run in one job and the table is not worth
    * persisting bucketed. */
  def repartitionByKeys(df: DataFrame, keys: Seq[String], partitions: Int = 0): DataFrame = {
    require(keys.nonEmpty, "need at least one key")
    val cols = keys.map(org.apache.spark.sql.functions.col)
    if (partitions > 0) df.repartition(partitions, cols: _*) else df.repartition(cols: _*)
  }
}
