package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation checks — the validation gate a pipeline
  * runs before a training job consumes a new partition (the
  * Deequ/Great-Expectations niche, as plain deterministic operators):
  * declarative row-level constraints, key-uniqueness, and referential
  * integrity, each reduced to violation COUNTS a driver can alert on.
  *
  * SQL constraint semantics: a row VIOLATES a check unless the
  * predicate is literally TRUE — a NULL predicate (NULL operand in a
  * comparison) is a violation, not a pass, so "value between 1 and 50"
  * catches NULLs without a separate not-null clause (add one anyway
  * when you want the two counted apart).
  *
  * Scale shape: [[report]] evaluates ALL row checks in ONE map-side
  * combined aggregation over a single scan (one violation-sum per
  * check), then explodes the 1-row result into (check, n_rows,
  * n_violations) rows — bounded by the check count. [[duplicateKeys]]
  * is one hash count per key; [[orphans]] is one left-anti join
  * (broadcast when the parent's key projection fits). Nothing
  * data-sized reaches the driver.
  */
object Validate {

  /** One row per check: (check, n_rows, n_violations). */
  def report(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    require(checks.map(_._1).distinct.size == checks.size,
      "check names must be unique")
    val sums = checks.zipWithIndex.map { case ((_, pred), j) =>
      // coalesce: an empty input has ZERO violations, not NULL ones
      coalesce(sum(when(pred <=> lit(true), 0L).otherwise(1L)), lit(0L)).as(s"__c$j")
    }
    val one = df.agg(count(lit(1)).as("__n"), sums: _*)
    val rows = checks.zipWithIndex.map { case ((name, _), j) =>
      struct(lit(name).as("check"), col("__n").as("n_rows"),
        col(s"__c$j").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.check"), col("__r.n_rows"), col("__r.n_violations"))
  }

  /** Key-uniqueness summary: (n_keys, n_dup_keys, n_dup_rows) — how
    * many distinct keys exist, how many occur more than once, and how
    * many rows sit inside those duplicated keys. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "duplicateKeys needs at least one key column")
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(when(col("__c") > 1, 1L).otherwise(0L)), lit(0L)).as("n_dup_keys"),
        coalesce(sum(when(col("__c") > 1, col("__c")).otherwise(0L)), lit(0L)).as("n_dup_rows"))
  }

  /** Per-column profiling report — the ANALYZE-style statistics pass a
    * pipeline (or a cost-based optimizer) wants per new partition: for
    * every requested column, (column, n_rows, n_null, n_distinct,
    * min_str, max_str), extrema rendered as strings so one report
    * covers mixed types. ALL columns profile in ONE aggregation over a
    * single scan (count/ndv/min/max are each map-side combined);
    * exact ndv by design — swap in approx_count_distinct at
    * trillion-row scale if the vocabulary itself is huge (noted, not
    * defaulted: profiling feeds decisions, exactness is worth one
    * shuffle of distinct values per column). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.zipWithIndex.flatMap { case (c, j) =>
      Seq(
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn$j"),
        count_distinct(col(c)).as(s"__nd$j"),
        min(col(c)).cast("string").as(s"__mn$j"),
        max(col(c)).cast("string").as(s"__mx$j"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.zipWithIndex.map { case (c, j) =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn$j").as("n_null"), col(s"__nd$j").as("n_distinct"),
        col(s"__mn$j").as("min_str"), col(s"__mx$j").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Snapshot diff — what changed between two versions of a keyed
    * table (yesterday's corpus vs today's): ONE full-outer join on the
    * keys plus one aggregation, reporting (n_old, n_new, n_added,
    * n_removed, n_changed, n_unchanged). A row counts as CHANGED when
    * any of `compareCols` differs under null-safe comparison (NULL vs
    * value = changed, NULL vs NULL = equal). Keys are assumed unique
    * per side — run [[duplicateKeys]] first when in doubt (duplicate
    * keys would multiply join rows and overstate every count).
    *
    * At 100 TB this is the audit step between [[graft.operators
    * .Upsert.upsertLatest]] applications: both sides shuffle once on
    * the keys (zero times if stored bucketed), and only counts come
    * back. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs at least one compare column")
    val o = oldDf.select((keys ++ compareCols).map(c => col(c).as(s"__o_$c")) :+
      lit(1).as("__in_old"): _*)
    val n = newDf.select((keys ++ compareCols).map(c => col(c).as(s"__n_$c")) :+
      lit(1).as("__in_new"): _*)
    val cond = keys.map(k => col(s"__o_$k") === col(s"__n_$k")).reduce(_ && _)
    val changed = compareCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduce(_ || _)
    o.join(n, cond, "full_outer").agg(
      coalesce(sum(col("__in_old")), lit(0)).cast("long").as("n_old"),
      coalesce(sum(col("__in_new")), lit(0)).cast("long").as("n_new"),
      coalesce(sum(when(col("__in_old").isNull, 1L)), lit(0L)).as("n_added"),
      coalesce(sum(when(col("__in_new").isNull, 1L)), lit(0L)).as("n_removed"),
      coalesce(sum(when(col("__in_old").isNotNull && col("__in_new").isNotNull
        && changed, 1L)), lit(0L)).as("n_changed"),
      coalesce(sum(when(col("__in_old").isNotNull && col("__in_new").isNotNull
        && !changed, 1L)), lit(0L)).as("n_unchanged"))
  }

  /** Referential-integrity summary: (n_child_rows, n_orphans) — child
    * rows whose `childKey` has no match in the parent's `parentKey`.
    * NULL child keys count as orphans (they reference nothing). */
  def orphans(
      child: DataFrame,
      parent: DataFrame,
      childKey: String,
      parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    val o = child.join(p, col(childKey) === col("__pk"), "left_anti")
    child.agg(count(lit(1)).as("n_child_rows"))
      .crossJoin(broadcast(o.agg(count(lit(1)).as("n_orphans"))))
  }
}
