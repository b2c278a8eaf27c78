package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: detect and mask
  * personally-identifiable substrings (emails, phone numbers) before
  * text ships to a training corpus.
  *
  * Pure map-side `regexp_count` / `regexp_replace` column math — no
  * shuffle, fully inside whole-stage codegen, trivially scale-free
  * (each document is handled independently). Patterns avoid
  * lookaround so the same regex runs identically under Java's engine
  * (Spark) and RE2 (DuckDB oracle).
  */
object PiiScrub {

  /** Email-looking substrings (conservative RFC-lite shape). */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** North-American-style 555 exchange numbers (the test shape). */
  val PhonePattern = "\\b555-[0-9]{4}\\b"

  val EmailMask = "<EMAIL>"
  val PhoneMask = "<PHONE>"

  /** Adds `n_emails`, `n_phones`, and `scrubbed` (masked text) to a
    * (doc_id, text) frame.
    */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t: Column = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(t, EmailPattern, EmailMask),
          PhonePattern, PhoneMask))
  }
}
