package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Regular-grid time resampling with gap filling — the
  * xarray/pandas `resample("6h").mean().interpolate()` /
  * `.ffill()` shape: bin observations onto an epoch-aligned grid,
  * densify each group's grid between its first and last OBSERVED cell,
  * and fill empty cells from the surrounding observations.
  *
  * Plan shape: one hash aggregation (the datetime-binned reduction,
  * map-side combined), a per-group span aggregation whose explode
  * generates the grid rows, a (group, cell) equi-join of grid against
  * the binned table, and ONE ordered window per group for the fill —
  * the scan topology end to end. Nothing is driver-side; grid length is
  * data-derived per group but generated distributively by `sequence()`.
  */
object Resample {

  /** Supported fill methods: `ffill` (step-function hold of the last
    * observed cell) and `linear` (time-weighted interpolation between
    * the surrounding observed cells — xarray `interpolate_na`). */
  val methods: Set[String] = Set("ffill", "linear")

  /** Resample `valueCol` onto a `stepSeconds` grid per `by` group:
    * one output row per grid cell between the group's first and last
    * cell WITH valid observations, holding the cell's NaN-skipping mean
    * (decimal-exact sums) where observed and the `method` fill where
    * not. Cells whose observations are all NaN/NULL count as EMPTY
    * (they are filled, not averaged). Grid cells are epoch-aligned
    * (`floor(ts / step) * step`, the `date_trunc` convention). Output:
    * (by..., tsCol = cell start timestamp, `as` = value,
    * `<as>_observed` = whether the cell had valid observations).
    *
    * Grid-size bound: each group's grid is generated as ONE `sequence()`
    * array before exploding, so a group's cell count must fit an array —
    * span/step beyond ~10^8 cells (e.g. a decade at 1-second steps)
    * risks a single huge array per group. Pick a step proportionate to
    * the span, or pre-split the group (year column in `by`) — the same
    * skew reasoning as the chunked scans. Groups with NO valid
    * observations have no grid and are absent from the output. */
  def interpolateGrid(
      df: DataFrame,
      by: Seq[String],
      tsCol: String,
      stepSeconds: Long,
      valueCol: String,
      method: String = "linear",
      exactScale: Int = 2,
      as: String = "value"): DataFrame = {
    require(by.nonEmpty, "interpolateGrid needs at least one grouping column")
    require(stepSeconds > 0, s"stepSeconds must be > 0 (got $stepSeconds)")
    require(methods(method),
      s"interpolateGrid method must be one of ${methods.mkString("/")} (got $method)")
    val reserved = Seq("__gts", "__v", "__lo", "__hi", "__pv", "__nv")
    val clashes = df.columns.toSeq.intersect(reserved)
    require(clashes.isEmpty,
      s"interpolateGrid reserves ${reserved.mkString("/")}; rename ${clashes.mkString(", ")} in the input")
    // no input-collision guard on `as`: the output frame is rebuilt from
    // the binned aggregates (input columns other than by/ts never reach
    // it), so an input column named `as` cannot be corrupted — only the
    // by/ts/reserved names matter
    require(!(by :+ tsCol).contains(as) && !as.startsWith("__"),
      s"interpolateGrid output column $as collides with a grouping/ts/reserved name")

    val stepMicros = stepSeconds * 1000000L
    val dt = df.schema(valueCol).dataType
    val vn = graft.functions.NanOps.nanToNull(col(valueCol), dt)
    // epoch alignment in exact INTEGER arithmetic (Column./ is double
    // division — an FP quotient could mis-floor an observation sitting
    // exactly on a cell boundary): floor(t/step)*step == t - t mod step
    // for the positive epoch range
    val um = unix_micros(col(tsCol))
    val cell = um - pmod(um, lit(stepMicros))
    // NaN-skipping decimal-exact cell mean (the registry nanmean shape);
    // all-invalid cells -> NULL mean == empty
    val binned = df
      .groupBy((by.map(col) :+ cell.as("__gts")): _*)
      .agg((sum(vn.cast(DecimalType(18, exactScale))).cast(DoubleType) /
        count(vn)).as("__v"))
    // span over OBSERVED cells only: the grid's ends always carry values,
    // so ffill never runs off the start and linear always has both
    // neighbors for interior gaps
    val spans = binned.where(col("__v").isNotNull)
      .groupBy(by.map(col): _*)
      .agg(min("__gts").as("__lo"), max("__gts").as("__hi"))
    val grid = spans.select((by.map(col) :+
      explode(sequence(col("__lo"), col("__hi"), lit(stepMicros))).as("__gts")): _*)
    val joined = grid.join(binned, by :+ "__gts", "left")
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__gts"))
    val obs = when(col("__v").isNotNull, struct(col("__gts"), col("__v")))
    val filled = method match {
      case "ffill" =>
        joined.withColumn(as, last(col("__v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      case "linear" =>
        val pv = last(obs, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        val nv = first(obs, ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        joined
          .withColumn("__pv", pv).withColumn("__nv", nv)
          .withColumn(as,
            when(col("__v").isNotNull, col("__v"))
              .otherwise(col("__pv.__v") +
                (col("__nv.__v") - col("__pv.__v")) *
                  (col("__gts") - col("__pv.__gts")).cast(DoubleType) /
                  (col("__nv.__gts") - col("__pv.__gts")).cast(DoubleType)))
          .drop("__pv", "__nv")
    }
    filled
      .withColumn(s"${as}_observed", col("__v").isNotNull)
      .withColumn(tsCol, timestamp_micros(col("__gts")))
      .select((by.map(col) :+ col(tsCol) :+ col(as) :+ col(s"${as}_observed")): _*)
  }
}
