package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NaN <-> NULL normalization layer.
  *
  * The reference engine (flox) treats float NaN as *the* missing value
  * (reference xrutils.py:162-187): `nan*` aggregations skip NaN, plain
  * aggregations propagate it (reference aggregate_npg.py:58-87). Spark's
  * missing value is NULL, and NaN is an ordinary float that sorts *above*
  * +Infinity. This object is the single place where the two conventions are
  * bridged:
  *
  *   - `nan*` variants: normalize NaN -> NULL first, then use Spark's
  *     null-skipping aggregates (free partial/final decomposition).
  *   - plain variants: aggregate over the normalized column too (so NaN can
  *     never be mistaken for a large float by min/max), then re-apply NaN to
  *     the whole group with [[propagateNaN]] if any input value was NaN.
  *
  * All helpers are pure Column expressions: they stay inside whole-stage
  * codegen and add no UDF/serialization cost, which is what makes this safe
  * to run over 100 TB inputs.
  */
object NanOps {

  /** True iff the type can physically hold an IEEE NaN. */
  def isFloaty(dt: DataType): Boolean = dt == DoubleType || dt == FloatType

  /** NaN -> NULL ("nan*" pre-normalization). Non-float types pass through
    * unchanged (there is nothing to normalize, and `isnan` would not
    * resolve on e.g. timestamps). */
  def nanToNull(c: Column, dt: DataType): Column =
    if (isFloaty(dt)) when(isnan(c), lit(null).cast(dt)).otherwise(c) else c

  /** Group-level NaN propagation patch: if any value in the group was NaN
    * the result is NaN (numpy plain-variant semantics, reference
    * aggregate_npg.py:58-87). `agg` must already be computed over the
    * NaN-normalized column. */
  def propagateNaN(agg: Column, v: Column, dt: DataType): Column =
    if (isFloaty(dt))
      when(coalesce(bool_or(isnan(v)), lit(false)), lit(Double.NaN).cast(dt match {
        case FloatType => FloatType
        case _         => DoubleType
      })).otherwise(agg)
    else agg

  /** valid = non-null and non-NaN (negation of flox xrutils.isnull). */
  def isValid(c: Column, dt: DataType): Column =
    if (isFloaty(dt)) c.isNotNull && !isnan(c) else c.isNotNull

  /** Negative-zero normalization: `-0.0 + 0.0 == +0.0` per IEEE 754, and
    * `x + 0.0 == x` for every other double (NaN, ±Inf, NULL included). The
    * driver's correctness hash is representation-sensitive, so a finalizer
    * that can land on `-0.0` (centered moments, diffs, slopes) must pass
    * through this before being compared against the [[graft.OracleNorm]]-
    * normalized DuckDB oracle. Spark's `round()` already normalizes the
    * zero sign (BigDecimal-based); use this for unrounded finalizers. */
  def noNegZero(c: Column): Column = c + lit(0.0)
}
