package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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

  /** Z-order (Morton) value for multi-dimensional data layout: each
    * dimension is quantized to `bits` levels over its caller-declared
    * `[lo, hi)` range (out-of-range values clamp to the edge cells),
    * then the cell bits are interleaved — bit i of dimension j lands at
    * output bit `i·k + j`. Rows sorted by this value cluster
    * multi-dimensionally: any file span covers a small hyper-rectangle
    * of the dimension space, so min/max file statistics prune scans
    * with predicates on ANY dimension subset — the Delta/Iceberg
    * OPTIMIZE ZORDER idea, as a plain deterministic expression.
    *
    * Declared bounds (the [[Binning]] uniform-bins convention) keep the
    * mapping free of any data-dependent fitting pass — no sampling job,
    * identical across incremental writes, and replayable by the oracle.
    * All arithmetic is codegen'd (`floor`, shifts, masks on longs).
    */
  def zValue(dims: Seq[(Column, Double, Double)], bits: Int): Column = {
    import org.apache.spark.sql.functions._
    val k = dims.size
    require(k >= 1, "zValue needs at least one dimension")
    require(bits >= 1 && bits * k <= 62,
      s"bits*dims must fit a positive long (got $bits*$k)")
    val top = (1L << bits) - 1
    val cells = dims.map { case (c, lo, hi) =>
      require(hi > lo, s"zValue bounds must satisfy lo < hi (got [$lo, $hi))")
      least(lit(top), greatest(lit(0L),
        floor((c - lo) / (hi - lo) * (1L << bits)).cast("long")))
    }
    val terms = for {
      j <- cells.indices
      i <- 0 until bits
    } yield shiftleft(shiftright(cells(j), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Range-partition + in-partition sort by [[zValue]]: ONE range
    * exchange produces the write-ready multi-dimensionally clustered
    * layout. `partitions` sizes the output files (≈ volume / target
    * file size at scale). Appends the z value as `zCol` for inspection;
    * drop it before writing if undesired. */
  def zorderBy(
      df: DataFrame,
      dims: Seq[(String, Double, Double)],
      bits: Int,
      partitions: Int = 0,
      zCol: String = "__z"): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(!df.columns.contains(zCol),
      s"zorderBy appends $zCol; rename it in the input or pass another zCol")
    val withZ = df.withColumn(zCol,
      zValue(dims.map { case (n, lo, hi) => (col(n), lo, hi) }, bits))
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col(zCol))
      else withZ.repartitionByRange(col(zCol))
    parted.sortWithinPartitions(col(zCol))
  }

  /** Skew-safe equi-join by key salting — the standard remedy when ONE
    * join key is hot enough that its shuffle partition exceeds an
    * executor (a few-domain fact table joining a dimension too big to
    * broadcast; AQE's skew-join split handles sort-merge spills, but
    * salting caps the partition size at the SOURCE and also covers the
    * shuffled-hash path).
    *
    * Mechanics: every fact row gets a deterministic salt in [0, salts)
    * from `spreadKey` (a per-row identity column — NOT the join key,
    * which would map a hot key to one salt again); the dimension side
    * replicates each row `salts` times (explode over a literal
    * sequence); the join runs on (key, salt), so a hot key's rows
    * spread over `salts` reducers, each holding a full dim copy for
    * that key. Each fact row still meets each matching dim row exactly
    * once (its own salt's replica), so the result EQUALS the plain
    * equi-join for any join multiplicity — the oracle checks that
    * equality. Inner/left semantics preserved ("right"/"full" would
    * duplicate dim-side non-matches per salt — rejected).
    *
    * Cost model: dim side pays x`salts` replication (size `salts` from
    * the hot key's row count / healthy-partition budget; 8-32 is
    * typical); fact side pays nothing extra. The dim hint pins the
    * shuffled-hash path — building the per-partition hash table over
    * the replicated dim, streaming the big fact side, no sort. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      spreadKey: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    require(salts >= 2, s"salts must be >= 2 (got $salts); 1 is a plain join")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins (got $joinType)")
    val clash = (fact.columns ++ dim.columns).filter(Set("__salt", "__dsalt"))
    require(clash.isEmpty,
      s"saltedJoin reserves __salt/__dsalt; rename ${clash.mkString(", ")} in the input")
    // NULL spreadKey would make bucket() NULL and __salt === __dsalt
    // never true — silently dropping that fact row's match (ADVICE r7);
    // coalescing to salt 0 keeps the plain-equi-join equality contract
    // for NULL spread keys (they all land on one salt, which is exactly
    // the plain join's behavior for that row — no spreading, no loss)
    val saltedFact = fact.withColumn("__salt",
      coalesce(Sampling.bucket(spreadKey, salt = 0) % salts, lit(0L)))
    val saltedDim = dim
      .withColumn("__dsalt", explode(sequence(lit(0L), lit(salts - 1L))))
      .hint("shuffle_hash")
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) && col("__salt") === col("__dsalt"),
        joinType)
      .drop("__salt", "__dsalt").drop(saltedDim(key))
  }

  /** Deterministic training-shard assignment: appends `as` = the row's
    * shard in [0, shards), from the [[Sampling.bucket]] quadratic
    * scatter of `key` — so the assignment is content-keyed (a re-run,
    * a backfill, or another engine lands every row in the same shard),
    * SQL-replayable ([[Sampling.bucketSql]] + `% shards`), and
    * approximately uniform regardless of key distribution. Keyed by
    * [[Sampling.textKey]] this also fixes the within-shard ORDER:
    * sort by (`as`, a second-salt bucket, tiebreak) and the corpus is
    * globally shuffled for training yet byte-reproducible. */
  def shardAssign(
      df: DataFrame,
      key: Column,
      shards: Int,
      salt: Int = 0,
      as: String = "shard"): DataFrame = {
    require(shards > 0, s"shards must be positive (got $shards)")
    require(!df.columns.contains(as),
      s"shardAssign appends $as; rename it in the input or pass another name")
    df.withColumn(as, Sampling.bucket(key, salt) % shards)
  }

  /** Physical shard writer: [[shardAssign]] + one task per shard + a
    * deterministic within-shard order (second-salt scatter of the same
    * key, `tieBreak` breaking scatter collisions) → a directory per
    * shard, ONE parquet file each, byte-stable across re-runs. The
    * repartition hashes the shard id, so a task may carry a few shard
    * directories; each directory still receives exactly one file.
    * At 100 TB size `shards` ≈ volume / target file size and drop the
    * one-file-per-shard expectation by repartitioning on (shard,
    * scatter-range) instead. */
  def writeShards(
      df: DataFrame,
      outDir: String,
      key: Column,
      shards: Int,
      tieBreak: Seq[Column],
      salt: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val assigned = shardAssign(df, key, shards, salt)
      .withColumn("__ord", Sampling.bucket(key, salt + 1))
    assigned
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard") +: col("__ord") +: tieBreak: _*)
      .drop("__ord")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
  }
}
