package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace emails, North-American phone
  * numbers, and IPv4 addresses with typed placeholder tokens and count the
  * redactions per document (the audit column a compliance pipeline keeps).
  * Beyond-reference extension (SURVEY.md §7.1.9).
  *
  * Shape: three chained `regexp_replace` projections plus count columns —
  * pure codegen'd row-local work, shuffle-free, scales with input splits.
  *
  * Pattern notes (deliberately conservative so Java regex and RE2-based
  * engines agree): no `\b` word boundaries (Java's is Unicode-aware, RE2's
  * is ASCII — they diverge around CJK), no backreferences, explicit
  * character classes only. Recall/precision tuning (obfuscated emails,
  * international formats) layers more patterns on the same shape.
  */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private def countMatches(text: Column, re: String): Column =
    coalesce(size(regexp_extract_all(text, lit(re), lit(0))), lit(0)).cast("long")

  /** Redacted text plus per-kind counts. Order matters: emails first (an
    * email's domain may contain digit runs), then IPs, then phones — each
    * later pattern sees the earlier placeholders, never the raw PII. */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val afterEmail = regexp_replace(t0, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val afterPhone = regexp_replace(afterIp, PhoneRe, "<PHONE>")
    df.withColumn("n_emails", countMatches(t0, EmailRe))
      .withColumn("n_ips", countMatches(afterEmail, Ipv4Re))
      .withColumn("n_phones", countMatches(afterIp, PhoneRe))
      .withColumn("redacted", afterPhone)
  }

  /** Deterministic PII-bearing fixture text derived from (id, text): the
    * synthetic-fixture pattern (see Multimodal.syntheticMediaRecords) —
    * the fixture corpus contains no punctuation, so redaction over raw
    * `documents` would be vacuous. Every formula below is plain string
    * concat + integer arithmetic, reproducible verbatim in the SQL oracle,
    * so the oracle checks real redaction work, not trivia: one email per
    * doc, a phone for id % 3 == 0, an IP for id % 4 == 0. */
  def withSyntheticPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val email = concat(lit(" user"), id, lit("@example"), (id % 7), lit(".com"))
    val phone = when(id % 3 === 0,
      concat(lit(" 555-01"), (id % 10),
        lit("-"), lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit(""))
    val ip = when(id % 4 === 0,
      concat(lit(" 10."), (id % 256), lit("."), ((id * 31) % 256), lit("."),
        (id % 100))).otherwise(lit(""))
    df.withColumn("pii_text",
      concat(substring(col(textCol), 1, 40), email, phone, ip))
  }
}
