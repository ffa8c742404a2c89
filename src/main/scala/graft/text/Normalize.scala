package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text normalization + PII-style redaction for corpus
  * cleaning — the first pass of every LLM data pipeline (lowercase,
  * de-punctuate, collapse whitespace; mask emails / URLs / long digit
  * runs before anything downstream sees them).
  *
  * Engine-parity rules (each helper has a DuckDB SQL mirror, and the
  * catalog entry hash-checks both over thousands of strings):
  *   - regex subset: character classes, alternation, bounded repeats
  *     only — no lookaround, no backreferences, nothing where Java
  *     regex (Spark) and RE2 (DuckDB) diverge;
  *   - no `\s` / `\d` shorthands: Java's `\s` includes vertical tab,
  *     RE2's does not — whitespace is always the explicit class
  *     `[ \t\n\r]`; digits are `[0-9]`;
  *   - literal dots are `[.]`, not `\.` — avoids double-escaping
  *     differences between Scala strings and SQL string literals.
  *
  * Every function is a composition of codegen'd builtins (lower /
  * regexp_replace / trim) — no UDF anywhere, so normalization rides
  * whole-stage codegen at scan speed.
  *
  * No counterpart in the reference (no text processing at all); part of
  * graft's LLM-pipeline extension surface.
  */
object Normalize {

  /** Whitespace as an explicit cross-engine class. */
  final val Ws = "[ \\t\\n\\r]"
  /** Anything to strip in `cleaned`: not lowercase-alnum, not whitespace. */
  final val NonAlnum = "[^a-z0-9 \\t\\n\\r]"
  final val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  final val UrlRe = "https?://[^ ]+"
  final val LongNumRe = "[0-9]{7,}"

  /** Canonical form: lowercase, punctuation → space, whitespace runs
    * collapsed, trimmed. Idempotent. */
  def cleaned(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), NonAlnum, " "), s"$Ws+", " "))

  def cleanedSql(t: String): String =
    s"trim(regexp_replace(regexp_replace(lower($t), '$NonAlnum', ' ', 'g'), " +
      s"'$Ws+', ' ', 'g'))"

  /** PII-style masking: emails, then URLs, then 7+-digit runs (ids,
    * phones). Order matters — an email or URL may contain digit runs;
    * masking it first keeps one placeholder per entity. */
  def redacted(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      LongNumRe, "<NUM>")

  def redactedSql(t: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($t, " +
      s"'$EmailRe', '<EMAIL>', 'g'), '$UrlRe', '<URL>', 'g'), " +
      s"'$LongNumRe', '<NUM>', 'g')"
}
