package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII redaction for webtext training corpora — the scrub step published
 * pipelines (ROOTS, RefinedWeb) run between extraction and tokenization.
 * The reference uploads extracted text verbatim
 * (/root/reference/src/uploader.py); a corpus pipeline adds this pass.
 *
 * Three detector families, each a single regex that parses identically
 * under java.util.regex (Spark) and RE2 (DuckDB oracle) — no lookaround,
 * no backreferences, ASCII classes only:
 *   - email:  [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
 *   - ipv4:   \b(digits 1-3 '.'){3} digits 1-3 \b
 *   - phone:  '+' 7..15 digits (international form; deliberately narrow —
 *     bare national numbers collide with ordinary integers)
 *
 * Redaction replaces matches with <EMAIL>/<IP>/<PHONE> tokens, email
 * first: a "+digits" run inside an email local part ("a+12345678@x.io")
 * must redact as part of the email, never as a phone number. An
 * IP-shaped domain ("user@192.168.0.1") is not an email (the pattern
 * requires an alphabetic TLD) — its IP redacts on its own.
 *
 * Counts are per family AS REDACTED: n_emails over the original text,
 * n_ips over the email-redacted text, n_phones over the email+IP-redacted
 * text — each count equals the number of replacements that family's pass
 * actually performed (a "+digits" run inside an email local part is never
 * double-counted as a phone).
 *
 * Documented deviation: PhoneRe matches greedily with no trailing-digit
 * guard (RE2, the oracle engine, has no lookahead), so a digit run longer
 * than 15 — not a valid E.164 number — redacts its first 15 digits and
 * leaves the tail in place.
 *
 * Scale: pure codegen regexp built-ins in the scan projection — no
 * shuffle, no UDF.
 */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\+[0-9]{7,15}"

  /** Redacted text: emails, then IPv4s, then phone numbers. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document scrub report: redacted text + per-family counts of the
    * replacements each pass performed (each family counted on the text
    * the PREVIOUS family already redacted — see object scaladoc), so
    * n_emails + n_ips + n_phones equals the total redactions in
    * clean_text. The intermediate redaction stages are staged as columns
    * so each regex pass runs once. */
  def scrub(df: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), col(textCol).as("t0"))
      .withColumn("t1", regexp_replace(col("t0"), EmailRe, "<EMAIL>"))
      .withColumn("t2", regexp_replace(col("t1"), Ipv4Re, "<IP>"))
      .select(col(idCol),
        regexp_replace(col("t2"), PhoneRe, "<PHONE>").as("clean_text"),
        size(regexp_extract_all(col("t0"), lit(EmailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("t1"), lit(Ipv4Re), lit(0)))
          .as("n_ips"),
        size(regexp_extract_all(col("t2"), lit(PhoneRe), lit(0)))
          .as("n_phones"))
}
