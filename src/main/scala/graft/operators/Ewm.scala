package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exponentially-weighted mean — pandas `ewm(alpha).mean()` (adjust=true,
  * ignore_na=false) as a DISTRIBUTED grouped transform: no sequential
  * per-group recurrence anywhere, so one giant group parallelizes across
  * its chunks like every scan in this engine (the decayed twin of
  * [[GroupByScan.scanChunked]]'s Blelloch carry).
  *
  * Semantics (pandas adjust=true): with beta = 1 - alpha and p the row's
  * 0-based position in its group under `orderCols`,
  *
  *   ewm_t = sum over valid j<=t of beta^(p_t-p_j) * x_j
  *         / sum over valid j<=t of beta^(p_t-p_j)
  *
  * NaN/NULL values contribute to NEITHER sum but still advance the decay
  * clock (ignore_na=false), and their rows receive the carried mean of
  * prior observations — exactly pandas. Rows before the first valid
  * observation get NULL.
  *
  * Distribution scheme — the direct formula overflows (beta^-p grows
  * unboundedly) and the recurrence y_t = x_t + beta*y_{t-1} is serial, so
  * the group is cut into fixed chunks of C rows with C sized to a ~250
  * decimal-digit decay budget (beta^-(C-1) <= 1e250):
  *
  *   1. within-chunk: running scaled sums s_t = sum x_j*beta^(-q_j) over
  *      the chunk prefix (q = position in chunk); the in-chunk partial is
  *      beta^q_t * s_t — one window over (group, chunk);
  *   2. chunk carries: chunk b's contribution decayed to the next chunk
  *      boundary is A_b = beta^C * s_total_b; the carry into chunk c,
  *      Carry_c = sum_{b<c} gamma^(c-1-b) A_b with gamma = beta^C, is the
  *      SAME ewm shape one level up, so the same scaled-cumsum trick runs
  *      over chunk summary rows grouped into superchunks of K chunks
  *      (K exhausting the same 250-digit budget against gamma);
  *   3. superchunk carries: with the budgets exhausted, a superchunk's
  *      decay factor is <= 1e-250, so only the two preceding superchunks
  *      can contribute above 1e-500 — and 1e-500 underflows to exactly 0
  *      in IEEE double, so the lag-1 + lag-2 truncation is not an
  *      approximation at double precision.
  *
  * The plan is scan-shaped: one shuffle of the rows by group (all row
  * windows share it), plus two metadata-sized aggregations (one summary
  * row per chunk / superchunk, i.e. 1/C / 1/(C*K) of the data) whose
  * results join back by (group, chunk) — the scanChunked topology one
  * level deeper. Magnitude contract: |x| below ~1e40 keeps every scaled
  * intermediate under the double overflow line (the budget leaves ~50
  * digits of headroom).
  *
  * Determinism: all inputs to each window sum are plain doubles; sums run
  * in frame order, so results are identical across partitionings (spec-
  * pinned). An oracle replays the mathematically-equal direct formula;
  * the two associations drift only in the last ulps, absorbed by the
  * driver row's 1e-6 rounding (the rolling-moment convention).
  *
  * Horizon divergence from pandas: observations older than the ~250-digit
  * decay budget (e.g. ~830 rows at alpha=0.5, ~575k rows at alpha=0.001)
  * carry exactly-0 weight here, so a row whose ENTIRE valid lookback sits
  * beyond the horizon reports NULL where pandas' renormalized recurrence
  * would still carry the stale mean — a value that is pure decayed noise
  * at those distances. Rows with any in-horizon observation agree.
  */
object Ewm {

  /** Appends `as` = the exponentially-weighted mean of `valueCol` within
    * each `by` group ordered by `orderCols`. `maxChunk` caps the chunk
    * size (the decay budget may cap it lower); it exists for tests —
    * results are chunking-invariant. */
  def ewmMean(
      df: DataFrame,
      by: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      alpha: Double,
      as: String = "ewm",
      maxChunk: Int = 1024): DataFrame = {
    require(by.nonEmpty, "ewmMean needs at least one grouping column")
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1) (got $alpha)")
    require(maxChunk >= 2, s"maxChunk must be >= 2 (got $maxChunk)")
    require(!df.columns.contains(as),
      s"ewmMean output column $as already exists in the input; pick another name or drop it first")
    val reserved = Seq("__p", "__c", "__q", "__xs", "__ws", "__sn", "__sd",
      "__tn", "__td", "__an", "__ad", "__sc", "__r", "__gin", "__cinn", "__cind",
      "__enf", "__edf", "__en1", "__ed1", "__en2", "__ed2", "__cn", "__cd")
    val clashes = df.columns.toSeq.intersect(reserved)
    require(clashes.isEmpty,
      s"ewmMean reserves the __-prefixed working names; rename ${clashes.mkString(", ")} in the input")

    val beta = 1.0 - alpha
    val digitsPerRow = -math.log10(beta)
    // chunk size: beta^-(C-1) stays within ~1e250 (x-magnitude headroom)
    val c = math.max(2, math.min(maxChunk, (250.0 / digitsPerRow).toInt + 1))
    val gamma = math.pow(beta, c)
    // superchunk size: gamma^-(K-1) under the same budget
    val k = math.max(1, (250.0 / (c * digitsPerRow)).toInt + 1)

    val dt = df.schema(valueCol).dataType
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), dt).cast(DoubleType)
    val byCols = by.map(col)

    val wOrd = Window.partitionBy(byCols: _*).orderBy(orderCols: _*)
    val base = df
      .withColumn("__p", row_number().over(wOrd).cast("long") - 1)
      .withColumn("__c", expr(s"__p div $c"))
      .withColumn("__q", col("__p") % c)
      .withColumn("__xs", when(vn.isNotNull, vn * pow(lit(beta), -col("__q")))
        .otherwise(lit(0.0)))
      .withColumn("__ws", when(vn.isNotNull, pow(lit(beta), -col("__q")))
        .otherwise(lit(0.0)))
    val wChunkRun = Window.partitionBy(byCols :+ col("__c"): _*)
      .orderBy(col("__q")).rowsBetween(Window.unboundedPreceding, 0)
    val wChunkAll = Window.partitionBy(byCols :+ col("__c"): _*)
    val rows = base
      .withColumn("__sn", sum(col("__xs")).over(wChunkRun))
      .withColumn("__sd", sum(col("__ws")).over(wChunkRun))
      .withColumn("__tn", sum(col("__xs")).over(wChunkAll))
      .withColumn("__td", sum(col("__ws")).over(wChunkAll))

    // one summary row per (group, chunk); __tn/__td are chunk constants
    val chunks = rows
      .groupBy(byCols :+ col("__c"): _*)
      .agg(max(col("__tn")).as("__tn"), max(col("__td")).as("__td"))
      .withColumn("__an", lit(gamma) * col("__tn"))
      .withColumn("__ad", lit(gamma) * col("__td"))
      .withColumn("__sc", expr(s"__c div $k"))
      .withColumn("__r", col("__c") % k)
      .withColumn("__gin", pow(lit(gamma), -col("__r")))
    val wScRun = Window.partitionBy(byCols :+ col("__sc"): _*)
      .orderBy(col("__r")).rowsBetween(Window.unboundedPreceding, -1)
    val wScAll = Window.partitionBy(byCols :+ col("__sc"): _*)
    val chunks2 = chunks
      // within-superchunk carry: gamma^(r-1) * sum_{b'<r} A_b*gamma^(-b')
      // (empty frame -> 0; the huge gamma^-1 at r=0 multiplies that 0)
      .withColumn("__cinn", coalesce(
        pow(lit(gamma), col("__r") - 1) * sum(col("__an") * col("__gin")).over(wScRun),
        lit(0.0)))
      .withColumn("__cind", coalesce(
        pow(lit(gamma), col("__r") - 1) * sum(col("__ad") * col("__gin")).over(wScRun),
        lit(0.0)))
      .withColumn("__enf", sum(col("__an") * col("__gin")).over(wScAll))
      .withColumn("__edf", sum(col("__ad") * col("__gin")).over(wScAll))

    // one summary row per (group, superchunk): E = value decayed to the
    // superchunk's last chunk boundary; lag-1/lag-2 feed the next ones
    val wSc = Window.partitionBy(byCols: _*).orderBy(col("__sc"))
    val scs = chunks2
      .groupBy(byCols :+ col("__sc"): _*)
      .agg(max(col("__enf")).as("__enf"), max(col("__edf")).as("__edf"))
      .withColumn("__en", pow(lit(gamma), k - 1) * col("__enf"))
      .withColumn("__ed", pow(lit(gamma), k - 1) * col("__edf"))
      .select(byCols ++ Seq(col("__sc"),
        lag(col("__en"), 1).over(wSc).as("__en1"),
        lag(col("__ed"), 1).over(wSc).as("__ed1"),
        lag(col("__en"), 2).over(wSc).as("__en2"),
        lag(col("__ed"), 2).over(wSc).as("__ed2")): _*)

    val gK = math.pow(gamma, k) // underflows to 0 harmlessly when spent
    val carries = chunks2
      .join(scs, by :+ "__sc", "left")
      .withColumn("__cn", col("__cinn") + pow(lit(gamma), col("__r")) *
        (coalesce(col("__en1"), lit(0.0)) + lit(gK) * coalesce(col("__en2"), lit(0.0))))
      .withColumn("__cd", col("__cind") + pow(lit(gamma), col("__r")) *
        (coalesce(col("__ed1"), lit(0.0)) + lit(gK) * coalesce(col("__ed2"), lit(0.0))))
      .select(byCols ++ Seq(col("__c"), col("__cn"), col("__cd")): _*)

    // row value = beta^q*(sn + carry) / beta^q*(sd + carry): the beta^q
    // factors cancel, so they are never materialized — the ratio of the
    // chunk-start-scaled sums is the mean directly (and dodges their
    // underflow at large q)
    rows
      .join(carries, by :+ "__c", "left")
      .withColumn(as, when(col("__sd") + col("__cd") > 0,
        (col("__sn") + col("__cn")) / (col("__sd") + col("__cd"))))
      .drop("__p", "__c", "__q", "__xs", "__ws", "__sn", "__sd", "__tn", "__td",
        "__cn", "__cd")
  }
}
