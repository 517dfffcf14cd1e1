package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — regex-pattern scanning over text columns
  * (LLM-pipeline addition; every production curation pipeline scrubs
  * phone numbers / emails / IPs before training).
  *
  * Pure per-row expressions (`regexp_count` / `regexp_replace` are
  * codegen'd): zero shuffle, embarrassingly parallel — the 100 TB cost is
  * exactly one streamed pass over the text. Patterns are restricted to the
  * regex subset shared by Java's engine and RE2-style engines (character
  * classes, bounded repetition, alternation — no backreferences or
  * lookaround), so an oracle replays them verbatim and the operator runs
  * identically on engines that compile regex to DFAs.
  */
object Pii {

  /** North-American-style phone (the TPC-H c_phone shape NN-NNN-NNN-NNNN
    * included via the optional TRAILING `(-[0-9]{4})?` group).
    *
    * Oracle-interpolation constraint: these pattern constants are
    * interpolated raw into single-quoted DuckDB SQL by the q_pii oracle
    * (CurationQueries) — safe for the character-class/repetition subset
    * used here, but a future pattern containing a single quote or
    * backslash must be escaped there first (or the oracle builder grown
    * an escaping helper) or the oracle breaks silently. */
  val Phone = "[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?"

  /** Email addresses. */
  val Email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"

  /** Dotted-quad IPv4. */
  val Ipv4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** Default pattern set, applied in order. ORDER MATTERS for redaction:
    * email runs before phone so a digit-dash local part ("12-345-678@x.io")
    * is consumed as one email match — phone-first would redact the local
    * part and orphan the "@x.io" tail outside any pattern. Counts
    * ([[piiCounts]]) are computed per pattern on the ORIGINAL text, so an
    * overlapping span can legitimately count under two patterns. */
  val Default: Seq[(String, String)] =
    Seq("email" -> Email, "phone" -> Phone, "ip" -> Ipv4)

  /** Per-pattern match counts: one (name, count Column) per pattern. */
  def piiCounts(text: Column, patterns: Seq[(String, String)] = Default): Seq[(String, Column)] =
    patterns.map { case (name, p) => name -> regexp_count(text, lit(p)) }

  /** Text with every match of every pattern replaced by `token`. */
  def redact(text: Column, patterns: Seq[(String, String)] = Default,
      token: String = "[PII]"): Column =
    patterns.foldLeft(text) { case (c, (_, p)) => regexp_replace(c, p, token) }

  /** Scan a text column: appends `<name>_hits` per pattern plus
    * `<as>` = the redacted text. */
  def scan(df: DataFrame, textCol: String, patterns: Seq[(String, String)] = Default,
      as: String = "redacted", token: String = "[PII]"): DataFrame = {
    val clashes = df.columns.toSeq.intersect(patterns.map(_._1 + "_hits") :+ as)
    require(clashes.isEmpty,
      s"Pii.scan output columns collide with input: ${clashes.mkString(", ")}")
    val withCounts = piiCounts(col(textCol), patterns).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(s"${name}_hits", c.cast("long"))
    }
    withCounts.withColumn(as, redact(col(textCol), patterns, token))
  }
}
