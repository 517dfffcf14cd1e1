package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword tokens of a text column under a PRODUCTION-size BPE rule
  * chain, as a scalar Catalyst expression — the Column form of
  * [[graft.operators.Bpe.bpeTokenCountsDeep]]'s per-word sequential-pass
  * tokenizer, so 32–64k-rule vocabularies compose anywhere a
  * `Column => Column` tokenizer slot exists (duplicateSpans, packing
  * sizers, gram tables). The replace-chain form
  * ([[graft.operators.Bpe.bpeTokenize]]) is one codegen expression per
  * rule — capped at 512 by construction and hopeless at production
  * vocab; this expression holds the whole rule set as ONE packed
  * literal and walks each word imperatively.
  *
  * CodegenFallback by design: the per-word merge loop is inherently
  * imperative (the documented mapPartitions-slot trade, here in scalar
  * position); the expression stays row-local with zero shuffle, and the
  * rank map is `@transient lazy` per-executor state parsed once from
  * the packed literal.
  *
  * Semantics — EXACTLY [[graft.operators.Bpe.bpeTokenize]]: split on
  * single spaces, drop empty words, tokenize each word by the
  * sequential-pass chain ([[graft.operators.Bpe.tokenizeWord]]),
  * concatenate; NULL text → NULL. Rules arrive packed as
  * left + U+0000 + right, rules joined by U+0001
  * ([[graft.operators.Bpe.packRules]]) — symbols come from
  * whitespace-split document words, which cannot contain control
  * separators (packRules fails fast if they somehow do). */
case class BpeDeepTokenize(child: Expression, packedRules: String)
    extends UnaryExpression with CodegenFallback {

  require(packedRules.nonEmpty, "need at least one merge rule")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_deep"

  @transient private lazy val pairs: IndexedSeq[(String, String)] =
    packedRules.split(graft.operators.Bpe.RuleSep).toIndexedSeq.map { r =>
      val i = r.indexOf(graft.operators.Bpe.FieldSep)
      require(i >= 0, s"malformed packed rule: $r")
      (r.substring(0, i), r.substring(i + 1))
    }
  @transient private lazy val ranks: Map[(String, String), Array[Int]] =
    graft.operators.Bpe.rankMap(pairs)

  // per-executor memo: tokenization is a pure function of (word, rules)
  // and corpora are Zipfian, so most word OCCURRENCES are repeats of a
  // small distinct set — the merge loop runs once per distinct word
  // (bounded; insertion stops at the cap — r13 receipt: the
  // dup_spans_bpe_deep bench row 4.37 s → see BENCH_NOTES)
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ")
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        var toks = memo.get(words(i))
        if (toks == null) {
          toks = graft.operators.Bpe.tokenizeWord(words(i), ranks, pairs)
            .map(UTF8String.fromString)
          if (memo.size < graft.operators.Bpe.MemoCap) memo.put(words(i), toks)
        }
        var j = 0
        while (j < toks.length) { out += toks(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDeepTokenize =
    copy(child = newChild)
}
