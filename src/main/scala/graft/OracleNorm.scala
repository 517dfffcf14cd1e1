package graft

/** Driver-oracle SQL post-processing.
  *
  * The driver's correctness gate hashes cell *representations*, so a DuckDB
  * oracle cell of `-0.0` mismatches a Spark cell of `0.0` even though the
  * values compare equal. Spark's `round()` (BigDecimal-based) always returns
  * `+0.0` for anything that rounds to zero, while DuckDB's `round()`
  * preserves the IEEE sign of a tiny negative input (`round(-1e-9, 6)` →
  * `-0.0`). Near-symmetric statistics (centered moments, diffs, slopes,
  * z-scores) legitimately land within one ulp of zero, and the two engines'
  * summation orders can put them on opposite sides — so any rounded driver
  * column that can reach zero from below is a latent hash-flake
  * (CORRECTNESS_r06: q_rolling_1h, 188 cells differing only in zero sign).
  *
  * Fix, applied uniformly instead of per-column: rewrite every `round(...)`
  * call in the assembled oracle SQL to `(round(...) + 0.0)`. IEEE 754
  * guarantees `-0.0 + 0.0 == +0.0` and `x + 0.0 == x` for every other
  * double (including NaN and ±Inf), and SQL `NULL + 0.0` stays NULL, so the
  * rewrite is value-identical everywhere and only normalizes the zero sign.
  * All driver tables carry DOUBLE measures (TESTDATA.md), so `round` sites
  * are double-typed; the few that re-cast (`::DECIMAL`, `CAST(... AS
  * BIGINT)`) wrap the addition inside the cast and are unaffected.
  *
  * The Spark side needs no counterpart rewrite (its `round` already
  * normalizes), but [[functions.NanOps.noNegZero]] exists for non-`round`
  * finalizers, and DriverContractSpec pins the whole contract empirically:
  * no query output may contain a negative-zero float/double.
  */
object OracleNorm {

  /** Rewrites every `round( ... )` call in `sql` to `(round( ... ) + 0.0)`.
    *
    * Textual, but exact: matches `round` on word boundaries only, tracks
    * paren depth to find each call's closing paren (nested calls are each
    * wrapped), and skips single-quoted SQL string literals (with `''`
    * escapes) so a quoted `round(` or `)` cannot desync the scan.
    */
  def noNegZeroRounds(sql: String): String = {
    val sb = new StringBuilder(sql.length + 64)
    var depth = 0
    // paren depths (post-increment) of `round(` calls currently open
    var wrapped = List.empty[Int]
    var i = 0
    val n = sql.length
    def isWord(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        // copy the string literal verbatim, honouring '' escapes
        sb.append(c); i += 1
        var closed = false
        while (i < n && !closed) {
          sb.append(sql.charAt(i))
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { sb.append('\''); i += 1 }
            else closed = true
          }
          i += 1
        }
      } else if ((c == 'r' || c == 'R') && i + 6 <= n &&
          sql.regionMatches(true, i, "round(", 0, 6) &&
          (i == 0 || !isWord(sql.charAt(i - 1)))) {
        sb.append('(').append(sql.substring(i, i + 6))
        depth += 1
        wrapped = depth :: wrapped
        i += 6
      } else if (c == '(') {
        depth += 1; sb.append(c); i += 1
      } else if (c == ')') {
        if (wrapped.nonEmpty && wrapped.head == depth) {
          sb.append(") + 0.0)")
          wrapped = wrapped.tail
        } else sb.append(c)
        depth -= 1; i += 1
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString
  }
}
