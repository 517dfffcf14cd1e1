package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: embeddings as `array<float>` and opaque
  * media as `binary` with typed metadata — LLM-pipeline additions beyond
  * the reference (BASELINE.json north_star; SURVEY §2.8).
  *
  * Embedding reductions ride the same grouped-reduction machinery as the
  * scalar engine: vectors are exploded to (group, dim, value) rows, reduced
  * with ordinary hash aggregation, and the quantization trick from
  * [[Similarity]] keeps the sums exact. At 100 TB the explode multiplies
  * rows by dim — still shuffle-bounded by (groups x dim) after the map-side
  * combine; a TypedImperativeAggregate vector-sum buffer is the documented
  * upgrade path if the dim factor ever dominates (it shrinks the *map-side*
  * row count, the shuffled bytes are the same).
  *
  * Media decode (image/audio codecs) does NOT belong in this layer: the
  * container has no codec libraries, so [[fakeDecodeBrightness]] is a
  * clearly-marked deterministic stand-in. What IS real: the binary payload
  * schema, expression-level header parsing (substring on binary + cast),
  * frame sampling, and the partitioning/aggregation plumbing around them —
  * swap the stub for a real codec UDF without touching the plan shape.
  */
object MultiModal {

  /** Per-group elementwise mean of an embedding column, long format:
    * (group..., pos, emb_mean). Exact: quantized longs are summed (exact,
    * order-free) and divided once. */
  def embedMean(df: DataFrame, by: Seq[String], embCol: String): DataFrame = {
    val keyCols = by.map(col)
    df.select(keyCols :+ posexplode(Similarity.quantize(col(embCol))).as(Seq("pos", "vq")): _*)
      .groupBy(keyCols :+ col("pos"): _*)
      .agg((sum(col("vq")).cast("double") / (lit(Similarity.Quant) * count(lit(1))))
        .as("emb_mean"))
  }

  /** [[embedMean]] via the [[graft.expressions.VectorSumLong]] typed
    * imperative aggregate instead of posexplode: one long-array buffer
    * per group on the map side (input-cardinality rows, not rows x dim),
    * shuffle carries one buffer per (partition, group). Identical exact
    * results (pinned by TextMultiModalSpec); prefer it when dim is large
    * relative to rows-per-partition-per-group. */
  def embedMeanAgg(df: DataFrame, by: Seq[String], embCol: String): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val keyCols = by.map(col)
    df.select(keyCols :+ Similarity.quantize(col(embCol)).as("__q"): _*)
      .groupBy(keyCols: _*)
      .agg(call_function(graft.expressions.GraftFunctions.VecSum, col("__q")).as("__vs"),
        count(lit(1)).as("__n"))
      .select(keyCols :+ posexplode(transform(col("__vs"),
        x => x.cast("double") / (lit(Similarity.Quant) * col("__n")))).as(Seq("pos", "emb_mean")): _*)
  }

  /** Per-group L2-norm statistics from exact integer squared norms:
    * count, RMS norm (sqrt of mean squared norm) and max norm. */
  def embedNormStats(df: DataFrame, by: Seq[String], embCol: String): DataFrame = {
    graft.expressions.GraftFunctions.register(df.sparkSession)
    val keyCols = by.map(col)
    df.select(keyCols :+ Similarity.dotQ(
        Similarity.quantize(col(embCol)), Similarity.quantize(col(embCol))).as("nsq"): _*)
      .groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n"),
        // nsq itself fits a long, but a group's SUM of ~1e15 squared norms
        // wraps past 2^63 around 10^4-10^7 rows — sum in decimal(38,0)
        // (exact, order-free) and cast once
        (sqrt(sum(col("nsq").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double") / count(lit(1))) / Similarity.Quant).as("rms_norm"),
        (sqrt(max(col("nsq")).cast("double")) / Similarity.Quant).as("max_norm"))
  }

  // ---- opaque-binary media plumbing ------------------------------------

  /** Deterministic fake media payload: 'IMG1' magic + zero-padded 4-char
    * decimal width and height + the body bytes. Stands in for real image
    * bytes so the parse/aggregate plumbing is exercised end to end. */
  def fakePayload(id: Column, body: Column): Column =
    encode(concat(
      lit("IMG1"),
      lpad((pmod(id, lit(64)) * 16 + 8).cast("string"), 4, "0"),
      lpad((pmod(id, lit(48)) * 16 + 8).cast("string"), 4, "0"),
      body), "UTF-8")

  /** Parse the typed metadata out of a binary payload — expression-level
    * (substring works on binary; decode turns header slices into strings).
    * Real formats swap the offsets/casts, not the plan. */
  def parseMeta(bin: Column): Column = struct(
    decode(substring(bin, 1, 4), "UTF-8").as("magic"),
    decode(substring(bin, 5, 4), "UTF-8").cast("int").as("width"),
    decode(substring(bin, 9, 4), "UTF-8").cast("int").as("height"),
    (octet_length(bin) - 12).as("body_bytes"))

  /** Sampled frame indices 0, stride, 2*stride, ... < nFrames — the
    * video-frame-sampling shape as a pure expression. */
  def frameSample(nFrames: Column, stride: Int): Column =
    sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))

  /** Resize planning as metadata arithmetic: target dimensions that fit
    * `maxDim` preserving aspect ratio (integer floor; never upscales).
    * The pixel resampling itself belongs to the stubbed codec layer —
    * this computes the plan-side contract (output shapes, scale factor)
    * that the pipeline partitions and budgets by. */
  def resizeMeta(meta: Column, maxDim: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = least(lit(1.0), lit(maxDim) / greatest(w, h).cast("double"))
    struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      scale.as("scale"))
  }

  /** STUB: media decode. The real implementation would decode the payload
    * with a codec library (not present in this container) and return e.g.
    * mean luma. This deterministic stand-in keeps the column types and
    * plan shape identical: brightness = (width * height) mod 256. */
  def fakeDecodeBrightness(meta: Column): Column =
    pmod(meta.getField("width") * meta.getField("height"), lit(256))

  /** STUB decode function for [[decodePartitioned]]: deterministic mean
    * of the body bytes (unsigned). A real pipeline replaces this closure
    * with the codec call — nothing else changes. */
  val stubDecode: Array[Byte] => Double = bytes => {
    val body = bytes.drop(12) // past the IMG1 header
    if (body.isEmpty) 0.0 else body.map(b => (b & 0xff).toLong).sum.toDouble / body.length
  }

  /** The per-partition decode slot — the one operator in this engine that
    * is genuinely imperative (native codec calls on raw bytes), so it uses
    * the brief's last-resort escape hatch, `mapPartitions`, with the batch
    * contract made explicit: `decode` may capture per-partition state
    * (codec context, scratch buffers) initialized once per `Iterator`, the
    * way a Pandas-UDF `mapInPandas` amortizes per-batch setup. Appends
    * `outCol: double` to the schema; everything upstream/downstream stays
    * expression-level, so swapping [[stubDecode]] for a real codec changes
    * no plan shape. Runs after pruning/filtering (decode last — it is
    * always the most expensive stage at 100 TB). */
  def decodePartitioned(
      df: DataFrame,
      binCol: String,
      outCol: String,
      decode: Array[Byte] => Double = stubDecode): DataFrame = {
    val schema = df.schema.add(outCol, org.apache.spark.sql.types.DoubleType)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      // per-partition init would go here (codec context); the stub needs none
      rows.map(r => org.apache.spark.sql.Row.fromSeq(
        r.toSeq :+ decode(r.getAs[Array[Byte]](idx))))
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
