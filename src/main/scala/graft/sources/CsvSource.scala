package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-explicit CSV source with the same quarantine contract as
  * [[EventLogSource]]: explicit schema (no inference pass over the
  * input), PERMISSIVE parse, malformed lines captured in
  * `_corrupt_record` and split off without a second read.
  *
  * CSV at scale is line-splittable (parallel scan like JSONL), but
  * quoted newlines break naive splitting — `multiLine` stays off and
  * writers must quote-escape instead; that keeps every input split
  * independently parseable, which is what makes a 100 TB CSV scan
  * embarrassingly parallel.
  */
object CsvSource {

  /** `schema` must NOT already contain `_corrupt_record`; it is
    * appended here so callers keep their domain schema clean.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Streaming twin: identical schema + options over `readStream`. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.readStream
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Well-formed rows (corrupt column dropped). Pass a cached read
    * when also consuming [[corrupt]] — same caveat as
    * EventLogSource: a scan whose only referenced column is the
    * corrupt-record column is rejected by Spark.
    */
  def clean(rows: DataFrame): DataFrame =
    rows.filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  /** Raw text of every malformed line (the quarantine sink). */
  def corrupt(rows: DataFrame): DataFrame =
    rows.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
}
