package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Word n-gram array in ONE pass over the string — the native twin of the
  * HOF shingle builder ([[graft.operators.Dedup.shingles]]), bit-identical
  * by construction (pinned in CurationSpec):
  *
  *   - tokens = split on every single space, keeping empty tokens
  *     (Spark `split(text, " ", -1)` semantics);
  *   - length >= n: the n-grams joined with one space, first-occurrence
  *     distinct when `distinct`;
  *   - shorter: one whole-text gram (so no document is invisible).
  *
  * Why native: the HOF form (`transform(sequence(...), i ->
  * concat_ws(element_at(split(text)...) x n))`) inlines `split(text)`
  * into every element_at — and because HOFs are CodegenFallback, the
  * interpreted path re-splits the whole text for every element of every
  * gram: O(words x n) full splits per row. This expression tokenizes
  * once: O(len + grams). Measured on the sf0.1 documents corpus it cuts
  * the gram-explode stage of q_dupgrams from ~10 s to well under a
  * second (BENCH_NOTES r4).
  *
  * CodegenFallback is deliberate: evaluation is one call per row doing
  * plain Java string work (no per-element lambda machinery), and the
  * surrounding explode/aggregate pipeline stays codegen'd — generating
  * an inline array-builder loop would buy little.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n >= 1, s"n must be >= 1 (got $n)")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // split on every single space, KEEPING trailing empties (limit -1)
    val toks = s.split(" ", -1)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    } else {
      val nGrams = toks.length - n + 1
      val out = new java.util.ArrayList[Any](nGrams)
      val seen = if (distinct) new java.util.HashSet[String](nGrams * 2) else null
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < nGrams) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        val g = sb.toString
        if (seen == null || seen.add(g)) out.add(UTF8String.fromString(g))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}
