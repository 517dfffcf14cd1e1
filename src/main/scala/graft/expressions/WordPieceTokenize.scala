package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokens of a text column under a learned vocabulary, as a
  * scalar Catalyst expression — the Column form of
  * [[graft.operators.WordPiece.tokenizeWordWp]]'s greedy
  * longest-match-first tokenizer (BERT WordPieceTokenizer: word-initial
  * entries match bare, continuations match under their `##` prefix, a
  * position with no match collapses the whole word to `[UNK]`).
  *
  * Same design as [[BpeDeepTokenize]]: the vocabulary rides as ONE
  * packed literal (entries joined by U+0001 —
  * [[graft.operators.WordPiece.packVocab]] fails fast on separator
  * collisions), parsed once per executor into `@transient lazy` state;
  * CodegenFallback because the per-word match loop is imperative; the
  * expression stays row-local with zero shuffle. Split on single
  * spaces, drop empty words, concatenate per-word tokens; NULL text →
  * NULL. */
case class WordPieceTokenize(child: Expression, packedVocab: String)
    extends UnaryExpression with CodegenFallback {

  require(packedVocab.nonEmpty, "need a non-empty vocabulary")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"

  @transient private lazy val vocab: Set[String] =
    packedVocab.split(graft.operators.WordPiece.VocabSep).toSet
  // piece lengths in CODEPOINTS — the greedy matcher's unit (the
  // operators.WordPiece.wordpieceTokenCounts convention)
  @transient private lazy val maxTok: Int = vocab.iterator
    .map(v => graft.operators.Codepoints.count(
      if (v.startsWith("##")) v.substring(2) else v)).max

  // per-executor distinct-word memo — the [[BpeDeepTokenize]] Zipfian
  // rationale (greedy match is pure in (word, vocab))
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
          toks = graft.operators.WordPiece.tokenizeWordWp(words(i), vocab, maxTok)
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

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokenize =
    copy(child = newChild)
}
