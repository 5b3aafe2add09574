package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrubbing stage every production training-data
  * pipeline runs before text leaves the ingest boundary: structured
  * identifiers (emails, phone numbers, IP addresses) are replaced with
  * typed placeholder tokens so downstream dedup/packing see stable text
  * and the model never memorizes the raw identifier.
  *
  * Contract: rules apply IN DECLARATION ORDER, each on the output of the
  * previous one, so text a rule consumed is never re-matched by a later
  * rule (an IPv4-shaped fragment inside an email is spent when the email
  * is replaced) and placeholder tokens are digit-free by construction so
  * no rule can match inside another's output. Per-rule match counts use
  * the same sequential semantics: rule i counts matches in the text
  * after rules < i applied — counts therefore sum to exactly the number
  * of replacements performed.
  *
  * Patterns stay inside the Java-regex ∩ RE2 common subset (character
  * classes, bounded repeats, ASCII \b — no backrefs, no lookaround) so
  * the DuckDB oracle replays them byte-identically. Pure scan-stage
  * column expressions: no shuffle, no UDF, fully codegen'd.
  */
object Redaction {

  final case class Rule(name: String, pattern: String, token: String)

  /** Redaction rules, in application order. */
  val Rules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    Rule("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"))

  /** Text after the first `i` rules have been applied. */
  private def afterRules(text: Column, i: Int): Column =
    Rules.take(i).foldLeft(text)((c, r) => regexp_replace(c, r.pattern, r.token))

  /** Fully redacted text (all rules, in order). */
  def redact(text: Column): Column = afterRules(text, Rules.length)

  /** (rule name, match count) columns under the sequential contract. */
  def matchCounts(text: Column): Seq[(String, Column)] =
    Rules.zipWithIndex.map { case (r, i) =>
      r.name -> regexp_count(afterRules(text, i), lit(r.pattern)).cast("long")
    }
}
