package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** Unicode NFC canonical normalization as a native Catalyst expression —
  * the canonicalization step [[graft.operators.TextAnalysis.normalizeText]]
  * deliberately excludes (Spark ships no normalizer expression): composed
  * and decomposed encodings of the same abstract character (é as U+00E9
  * vs e + U+0301) are DIFFERENT byte strings to every fingerprint/dedup
  * operator, so a corpus mixing encoders leaks duplicate identities
  * through exact dedup. NFC (Unicode Standard Annex #15) maps both to the
  * canonical composed form.
  *
  * `java.text.Normalizer` implements the same Unicode normalization the
  * oracle's `nfc_normalize` does (both follow UAX #15 — NfcSpec pins
  * composed≡decomposed round trips and the oracle replay pins the whole
  * dedup), so the operation is exactly replayable, unlike locale-bearing
  * collation tricks. Fast path: `Normalizer.isNormalized` is O(n) and
  * almost always true on real corpora (ASCII is trivially NFC), so
  * already-normalized rows skip the normalization COPY — they still pay
  * the one UTF8String→String decode (`toString` below) that the JDK
  * Normalizer API forces.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $a.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |  ? $a
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
