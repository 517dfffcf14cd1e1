package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** All k Householder reflections of an OPQ rotation chain applied in ONE
  * expression evaluation per row (VERDICT r11 #7) — the fused form of
  * [[graft.operators.Similarity.householderRotateAll]]'s k-step
  * materialize-per-step loop.
  *
  * Why this exists: each chain step built from `zip_with`/`transform`
  * higher-order functions is CodegenFallback, and interpreted eval
  * re-evaluates the INPUT expression once per output element — chaining
  * k steps lazily multiplies work by ~dim^(k-1) per row, which
  * householderRotateAll cured with a localCheckpoint barrier per step
  * (k materializations of the full frame at encode time). Here the k
  * steps run in-loop over one primitive double array, so the chain costs
  * ONE pass and ONE materialization regardless of k.
  *
  * Bit parity with the step-by-step chain (SimilaritySpec pins fused ==
  * chain == materialized): every step re-quantizes to the 1e-6 grid and
  * mirrors the Column algebra token for token —
  * `q = round(x·1e6, 0)` (BigDecimal HALF_UP, Spark's Round-on-double),
  * exact long dot `2·(q·u)` cast to double over `uu` as double, per
  * component `round(q − r2·u, 0) / 1e6`, `uu == 0` the identity — so
  * the intermediate values equal the materialized per-step columns
  * exactly.
  *
  * Reflections ride as ONE packed literal (steps `;`-separated, each
  * `uu|u1,u2,...` — [[graft.operators.Similarity.packReflections]]),
  * parsed once per executor into `@transient lazy` state — the
  * [[BpeDeepTokenize]] convention. NULL input → NULL; input may be
  * `array<float>` (raw embeddings) or `array<double>` (a prior step's
  * grid output). */
case class HouseholderChainRotate(child: Expression, packedRefl: String)
    extends UnaryExpression with CodegenFallback {

  require(packedRefl.nonEmpty, "need at least one reflection")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_householder_chain"

  @transient private lazy val refl: Array[(Array[Long], Long)] =
    packedRefl.split(';').map { s =>
      val Array(uu, us) = s.split('|')
      (us.split(',').map(_.toLong), uu.toLong)
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"$prettyName needs array<float> or array<double> input (got $t)")
  }

  /** Spark's Round(double, 0): BigDecimal HALF_UP (away from zero). */
  private def rnd0(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val vals = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vals(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var t = 0
    while (t < refl.length) {
      val (uq, uu) = refl(t)
      if (uu != 0L) {
        require(uq.length == dim,
          s"reflection ${t + 1} has dim ${uq.length}, vector has $dim")
        // quantize: round(x·1e6, 0) cast long — exact on the grid
        val q = new Array[Long](dim)
        var j = 0
        while (j < dim) { q(j) = rnd0(vals(j) * 1e6).toLong; j += 1 }
        var dot = 0L
        j = 0
        while (j < dim) { dot += q(j) * uq(j); j += 1 } // LongDotProduct algebra
        val r2 = (2L * dot).toDouble / uu.toDouble
        j = 0
        while (j < dim) {
          vals(j) = rnd0(q(j).toDouble - r2 * uq(j).toDouble) / 1e6
          j += 1
        }
      } // uu == 0: identity — vals pass through (already double)
      t += 1
    }
    new GenericArrayData(vals)
  }

  override protected def withNewChildInternal(newChild: Expression): HouseholderChainRotate =
    copy(child = newChild)
}
