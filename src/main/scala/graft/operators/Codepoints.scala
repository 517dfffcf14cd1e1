package graft.operators

/** Codepoint-indexed views of Java strings — the tokenizer family's
  * shared unit convention (VERDICT r12 #1). Java `String` indexes
  * UTF-16 code units, so `substring`/`charAt` loops split surrogate
  * pairs on astral text (emoji, CJK extension B); Spark's SQL string
  * functions ([[org.apache.spark.unsafe.types.UTF8String]]) and
  * DuckDB's `len`/`substr` both count CODEPOINTS. Every driver- or
  * executor-side imperative loop in [[Bpe]]/[[WordPiece]]/[[UnigramLm]]
  * steps through these helpers so the Scala side lands on exactly the
  * units the DuckDB oracle replays.
  *
  * The offset array is the cheap form: `offsets(s)(k)` is the UTF-16
  * index where codepoint `k` starts (length n+1, last entry
  * `s.length`), so the codepoint slice [j, i) is
  * `s.substring(offs(j), offs(i))` — original content, no per-slice
  * re-scan, O(n) once per word. For pure-BMP strings the array is the
  * identity and slices degenerate to the former code-unit behavior. */
private[graft] object Codepoints {

  /** UTF-16 offsets of each codepoint boundary; length = count + 1. */
  def offsets(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val offs = new Array[Int](n + 1)
    var i = 0
    var k = 0
    while (k < n) {
      offs(k) = i
      i = s.offsetByCodePoints(i, 1)
      k += 1
    }
    offs(n) = s.length
    offs
  }

  /** Number of codepoints in `s` (what DuckDB's `len` returns). */
  def count(s: String): Int = s.codePointCount(0, s.length)

  /** The string split into one-codepoint strings (surrogate pairs stay
    * paired) — the symbol alphabet of the BPE/WordPiece learners. */
  def split(s: String): Array[String] = {
    val offs = offsets(s)
    val out = new Array[String](offs.length - 1)
    var k = 0
    while (k < out.length) {
      out(k) = s.substring(offs(k), offs(k + 1))
      k += 1
    }
    out
  }
}
