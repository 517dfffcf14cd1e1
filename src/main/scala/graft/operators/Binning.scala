package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group-by-intervals: the reference's `isbin=True` / `pd.IntervalIndex`
  * path (reference core.py:803-823, _convert_expected_groups_to_index
  * core.py:2087-2107). Values are assigned a 0-based bin index against a
  * sorted edge list; out-of-range values get NULL (the -1 code,
  * reference factorize_ via np.digitize) and are dropped by
  * [[GroupByReduce.reduce]]'s missing-label rule. Empty bins survive in the
  * output via the expected-groups reindex, exactly like the reference
  * (tests/test_core.py:898-942).
  */
object Binning {

  /** 0-based bin index for arbitrary (small) edge lists, honoring interval
    * closedness. `closedRight`: bin i = (e_i, e_{i+1}]; else [e_i, e_{i+1}).
    * Compiles to a when-chain — O(#bins) per row but fully codegen'd; for
    * large uniform edge grids prefer [[binIndexUniform]]. */
  def binIndex(v: Column, edges: Seq[Any], closedRight: Boolean = true): Column = {
    require(edges.size >= 2, "need at least two bin edges")
    val conds = edges.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      val c =
        if (closedRight) v > lit(lo) && v <= lit(hi)
        else v >= lit(lo) && v < lit(hi)
      (c, i)
    }.toSeq
    conds.tail
      .foldLeft(when(conds.head._1, lit(0))) { case (acc, (c, i)) => acc.when(c, lit(i)) }
      .otherwise(lit(null).cast(IntegerType))
  }

  /** O(1)-per-row bin index for uniform numeric edges lo, lo+w, ..., hi —
    * the shape that matters at 100 TB (e.g. histogramming a measurement).
    * Equivalent to SQL width_bucket minus the under/overflow buckets. */
  def binIndexUniform(v: Column, lo: Double, hi: Double, nBins: Int, closedRight: Boolean = true): Column = {
    val w   = (hi - lo) / nBins
    val raw =
      if (closedRight) ceil((v - lit(lo)) / lit(w)).cast(IntegerType) - 1
      else floor((v - lit(lo)) / lit(w)).cast(IntegerType)
    val inRange =
      if (closedRight) v > lit(lo) && v <= lit(hi)
      else v >= lit(lo) && v < lit(hi)
    when(inRange, greatest(least(raw, lit(nBins - 1)), lit(0)))
      .otherwise(lit(null).cast(IntegerType))
  }

  /** Expected-groups DataFrame for a binned key: one row per bin with its
    * index and [lo, hi) / (lo, hi] bounds, for reindex + labeling. */
  def binsDf(spark: SparkSession, name: String, edges: Seq[Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = edges.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      org.apache.spark.sql.Row(i, lo, hi)
    }.toSeq.asJava
    spark.createDataFrame(rows, StructType(Seq(
      StructField(name, IntegerType),
      StructField(s"${name}_lo", DoubleType),
      StructField(s"${name}_hi", DoubleType))))
  }

  /** Equal-frequency binning (pandas `qcut` analog): appends `as` = the
    * 0-based quantile-bin index of `valueCol`, nBins bins with cut points
    * at the j/nBins exact quantiles.
    *
    * Composition: the interior edges come from
    * [[Quantiles.exactQuantileSelect]] over a constant group — the
    * memory-safe exact plan, so deriving edges from a 100 TB column
    * cannot OOM — materialized once as <= nBins-1 literal doubles (a
    * BOUNDED driver action: size is a caller parameter, never data-sized;
    * see the inline note) and applied per row as bin = #{edges <= v}
    * (left-closed cut points, ties to the upper bin, matching
    * searchsorted-right). Edges are rounded to `edgeScale` decimals so
    * the cut points are reproducible across engines (the
    * coarser-than-FP-drift / finer-than-data-resolution rule from the
    * oracle-parity notes); rows with NULL/NaN values get a NULL bin
    * (the missing-label code, dropped by reduce like any bin overflow).
    *
    * With heavy duplicate values, bins are as unequal as the data forces
    * (same as pandas `qcut` with `duplicates="drop"` collapsing): a value
    * straddling a cut lands wholly in one bin.
    */
  /** @param exact edge derivation. true (default): the memory-safe exact
    *              quantile plan in its SELECTION form
    *              ([[Quantiles.exactQuantileSelect]]) — bit-reproducible,
    *              oracle-replayable, and only the value-range chunks
    *              containing a cut rank are ever sorted (≈ 2·nBins of
    *              `chunks`), each in its own task. false:
    *              `approx_percentile` sketch edges — mergeable,
    *              single-pass; deterministic only up to sketch accuracy
    *              (cut points can shift by a rank error of n/accuracy
    *              across runs/partitionings). */
  /** @param chunks value-range chunks for the exact edge ranking (passed
    *               to [[Quantiles.exactQuantileSelect]]): more chunks =
    *               smaller sorted fraction, same result. */
  def qcut(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      as: String,
      edgeScale: Int = 6,
      exact: Boolean = true,
      accuracy: Int = Aggregations.SketchAccuracy,
      chunks: Int = 32): DataFrame =
    qcutWithEdges(df, valueCol,
      qcutEdges(df, valueCol, nBins, edgeScale, exact, accuracy, chunks), as)

  /** The edge-derivation half of [[qcut]] — the INDEX-BUILD step. Returns
    * the <= nBins-1 interior cut points, or None when the column has no
    * valid values at all.
    *
    * This is a driver-side action, but a BOUNDED one: the result size is
    * nBins-1 doubles — a caller parameter, independent of data volume
    * (the IVF-centroid literalization contract). The data-sized work (the
    * exact edge ranking) stays distributed. Derive once per corpus and
    * reuse across [[qcutWithEdges]] calls — the edge job then runs once
    * instead of riding every consumer of the binned plan. */
  def qcutEdges(
      df: DataFrame,
      valueCol: String,
      nBins: Int,
      edgeScale: Int = 6,
      exact: Boolean = true,
      accuracy: Int = Aggregations.SketchAccuracy,
      chunks: Int = 32): Option[Seq[Double]] = {
    require(nBins >= 2, s"qcut needs nBins >= 2 (got $nBins)")
    val reserved = Seq("__qcut_edges", "__g", "__qs")
    val clashes  = (df.columns.toSeq :+ valueCol).intersect(reserved)
    require(clashes.isEmpty,
      s"qcut reserves column names ${reserved.mkString("/")}; rename ${clashes.distinct.mkString(", ")} in the input")
    // the Trusted quantile path skips the __-prefix guard (qcut's own __g
    // group is an internal); re-assert it for the CALLER's value column so
    // a __-named input fails with the clear message, not an opaque
    // ambiguous-reference error
    require(!valueCol.startsWith("__"),
      s"quantile operators reserve the __ column-name prefix for internals; rename $valueCol in the input")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val edgesDf =
      if (exact) {
        // dedup=false: a qcut column is near-unique continuous data, so
        // the distinct-value shuffle would carry ~every row; raw-row
        // ranking shuffles only partial aggregates + covering chunks
        val quantiles = Quantiles.exactQuantileSelectTrusted(
          df.select(col(valueCol)).withColumn("__g", lit(1)),
          Seq("__g"), valueCol, qs, as = "__qs", chunks = chunks, dedup = false)
        val edgeArr = if (qs.size == 1) array(col("__qs")) else col("__qs")
        quantiles.select(transform(edgeArr, e => round(e, edgeScale)).as("__qcut_edges"))
      } else {
        val vn = graft.functions.NanOps.nanToNull(col(valueCol),
          df.schema(valueCol).dataType)
        df.agg(approx_percentile(vn.cast("double"),
            array(qs.map(lit): _*), lit(accuracy)).as("__qs"))
          .select(transform(col("__qs"), e => round(e, edgeScale)).as("__qcut_edges"))
      }
    edgesDf.collect().headOption.flatMap(r => Option(r.getSeq[Double](0)))
  }

  /** The binning half of [[qcut]]: one codegen'd pass with the cut points
    * baked in as a literal array — zero joins, zero extra jobs. `None`
    * edges (no valid values) bin every row NULL, matching [[qcut]]'s
    * NULL/NaN-bin semantics. */
  def qcutWithEdges(
      df: DataFrame,
      valueCol: String,
      edges: Option[Seq[Double]],
      as: String): DataFrame = {
    require(!df.columns.contains(as),
      s"qcut output column $as already exists in the input; pick another name or drop it first")
    graft.expressions.GraftFunctions.register(df.sparkSession) // binByEdges
    val v = col(valueCol)
    val dt = df.schema(valueCol).dataType
    edges match {
      case Some(e) => df.withColumn(as, binByEdges(v, dt, typedlit(e)))
      case None    => df.withColumn(as, lit(null).cast(IntegerType))
    }
  }

  /** Per-GROUP equal-frequency binning: like [[qcut]], but the cut points
    * are each group's own quantiles — the stratification shape
    * ("quality quartile within language") a curation pipeline puts before
    * per-stratum sampling. Edges come from the grouped
    * [[Quantiles.exactQuantileSelect]] (one row of interior edges per
    * group, null-safe struct keys) and join back on the grouping columns —
    * a broadcast-sized table whenever the group count is; rows with
    * NULL/NaN values, or in groups with no valid values, get a NULL bin.
    */
  /** @param dedup as in [[Quantiles.exactQuantileSelect]]: false (the
    *              default, like [[qcut]]) ranks raw rows — no full-data
    *              shuffle, right for near-unique continuous value columns;
    *              true collapses duplicate values first — right for
    *              tie-heavy columns (integer scores), where a covering
    *              chunk could otherwise hold most of a group's rows. */
  def qcutBy(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      nBins: Int,
      as: String,
      edgeScale: Int = 6,
      chunks: Int = 32,
      dedup: Boolean = false): DataFrame = {
    require(nBins >= 2, s"qcutBy needs nBins >= 2 (got $nBins)")
    require(by.nonEmpty, "qcutBy needs at least one grouping column")
    require(!df.columns.contains(as),
      s"qcutBy output column $as already exists in the input; pick another name or drop it first")
    graft.expressions.GraftFunctions.register(df.sparkSession) // binByEdges
    val reserved = Seq("__qcut_edges", "__qs", "__qk")
    val clashes  = (df.columns.toSeq :+ valueCol).intersect(reserved)
    require(clashes.isEmpty,
      s"qcutBy reserves column names ${reserved.mkString("/")}; rename ${clashes.distinct.mkString(", ")} in the input")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val quantiles = Quantiles.exactQuantileSelect(
      df.select((by :+ valueCol).map(col): _*), by, valueCol, qs,
      as = "__qs", chunks = chunks, dedup = dedup)
    val edgeArr = if (qs.size == 1) array(col("__qs")) else col("__qs")
    // The join-back rides a struct key: a bare multi-column equi-join is
    // null-UNSAFE on the grouping columns, so NULL-keyed rows would get
    // NULL bins even though the struct-keyed edge derivation computed
    // edges for their group. Struct equality treats null fields as equal,
    // so NULL-keyed groups bin against their own edges — consistent with
    // the engine's keepNullKeys grouping semantics.
    val edges = quantiles.select(
      struct(by.map(col): _*).as("__qk") +:
        transform(edgeArr, e => round(e, edgeScale)).as("__qcut_edges") +: Nil: _*)
    val v  = col(valueCol)
    val dt = df.schema(valueCol).dataType
    // left join keeps rows of groups absent from the edge table (all-
    // invalid groups) with a NULL edge array -> NULL bin
    df.withColumn("__qk", struct(by.map(col): _*))
      .join(edges, Seq("__qk"), "left")
      .withColumn(as, binByEdges(v, dt))
      .drop("__qcut_edges", "__qk")
  }

  /** The edge-derivation half of [[qcutBy]] LITERALIZED — the grouped
    * INDEX-BUILD step, mirroring [[qcutEdges]]'s contract: a bounded
    * driver-side result of at most `maxGroups` x (nBins-1) doubles, where
    * `maxGroups` is a CALLER parameter (the IVF-centroid literalization
    * contract — never data-sized; more groups than maxGroups fails fast
    * instead of silently collecting). The data-sized edge ranking stays
    * distributed. Build once per corpus and reuse across
    * [[qcutByWithEdges]] calls: the composed per-group edge plan then
    * runs (and is PLANNED — measured ~1 s of constant Catalyst work per
    * run at any data size) once instead of riding every consumer.
    * Returns (group key values in `by` order, interior cut points); a
    * group absent from the result (all-invalid values) bins NULL. */
  def qcutByEdges(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      nBins: Int,
      maxGroups: Int,
      edgeScale: Int = 6,
      chunks: Int = 32,
      dedup: Boolean = false): Seq[(Seq[Any], Seq[Double])] = {
    require(nBins >= 2, s"qcutByEdges needs nBins >= 2 (got $nBins)")
    require(by.nonEmpty, "qcutByEdges needs at least one grouping column")
    require(maxGroups >= 1, s"qcutByEdges needs maxGroups >= 1 (got $maxGroups)")
    val reserved = Seq("__qcut_edges", "__qs", "__qk")
    val clashes  = (df.columns.toSeq :+ valueCol).intersect(reserved)
    require(clashes.isEmpty,
      s"qcutByEdges reserves column names ${reserved.mkString("/")}; rename ${clashes.distinct.mkString(", ")} in the input")
    val qs = (1 until nBins).map(_.toDouble / nBins)
    val quantiles = Quantiles.exactQuantileSelect(
      df.select((by :+ valueCol).map(col): _*), by, valueCol, qs,
      as = "__qs", chunks = chunks, dedup = dedup)
    val edgeArr = if (qs.size == 1) array(col("__qs")) else col("__qs")
    val rows = quantiles.select(
      struct(by.map(col): _*).as("__qk") +:
        transform(edgeArr, e => round(e, edgeScale)).as("__qcut_edges") +: Nil: _*)
      .limit(maxGroups + 1).collect()
    require(rows.length <= maxGroups,
      s"qcutByEdges found more than maxGroups=$maxGroups groups; raise maxGroups or use the distributed qcutBy")
    rows.toSeq.map(r => (r.getStruct(0).toSeq, r.getSeq[Double](1)))
  }

  /** The binning half for literalized grouped edges: one codegen'd pass
    * with a per-group when-chain of literal edge arrays — zero joins,
    * zero extra jobs (the [[qcutWithEdges]] shape, per group). Group keys
    * match null-safely, so NULL-keyed groups bin against their own edges
    * (the [[qcutBy]] struct-key contract); rows in groups absent from
    * `edges`, or with NULL/NaN values, get a NULL bin. The when-chain is
    * linear in |edges| per row — right for the bounded-group regime this
    * path is for (maxGroups ~ tens); unbounded group counts should use
    * the distributed [[qcutBy]] join. */
  def qcutByWithEdges(
      df: DataFrame,
      by: Seq[String],
      valueCol: String,
      edges: Seq[(Seq[Any], Seq[Double])],
      as: String): DataFrame = {
    require(by.nonEmpty, "qcutByWithEdges needs at least one grouping column")
    require(!df.columns.contains(as),
      s"qcutBy output column $as already exists in the input; pick another name or drop it first")
    require(edges.forall(_._1.length == by.length),
      s"each edge key must have ${by.length} values (one per grouping column)")
    graft.expressions.GraftFunctions.register(df.sparkSession) // binByEdges
    val v  = col(valueCol)
    val dt = df.schema(valueCol).dataType
    def keyMatch(key: Seq[Any]): Column =
      by.zip(key).map { case (c, k) => col(c) <=> lit(k) }.reduce(_ && _)
    val edgeCol = edges.foldRight(lit(null).cast("array<double>")) {
      case ((k, es), acc) => when(keyMatch(k), typedlit(es)).otherwise(acc)
    }
    df.withColumn(as, binByEdges(v, dt, edgeCol))
  }

  /** searchsorted-right over an edge-array column (qcut: a literal array;
    * qcutBy: the joined per-group `__qcut_edges`); NULL/NaN value or NULL
    * edges -> NULL bin. Native codegen expression
    * ([[graft.expressions.SearchSortedRight]]) — the `aggregate` HOF it
    * replaces was CodegenFallback, interpreted once per binned row
    * (measured ~60% of q_qcut's wall at sf0.1, the WordNgrams lesson
    * again). Callers register [[graft.expressions.GraftFunctions]]. */
  private def binByEdges(v: Column, dt: DataType,
      edgeArr: Column = col("__qcut_edges")): Column =
    when(graft.functions.NanOps.isValid(v, dt),
      call_function(graft.expressions.GraftFunctions.SearchSorted,
        edgeArr, v.cast("double")))
      .otherwise(lit(null).cast(IntegerType))
}
