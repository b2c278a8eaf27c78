package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-explicit JSON-lines event source (batch + streaming twin).
  *
  * An explicit schema is non-negotiable at scale: schema inference
  * runs a full extra pass over the input before the real job starts —
  * on a 100 TB event log that doubles the scan. Malformed lines land
  * in `_corrupt_record` (PERMISSIVE mode) instead of failing the job;
  * [[clean]]/[[corrupt]] split them so a pipeline can quarantine bad
  * input without a second read.
  *
  * The streaming variant is the same schema + `readStream` — the
  * batch/stream parity the rest of the engine follows.
  */
object EventLogSource {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt_record", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  def readStream(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Well-formed rows only (corrupt column dropped). As with
    * [[corrupt]], pass a CACHED read: on a raw scan, a fully-pruned
    * consumer (e.g. `clean(read(...)).count()`) leaves
    * `_corrupt_record` as the only referenced scan column, which
    * Spark rejects outright.
    */
  def clean(events: DataFrame): DataFrame =
    events.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")

  /** The quarantine stream: raw text of every malformed line.
    * Spark refuses a query whose only referenced scan column is the
    * corrupt-record column ([UNSUPPORTED_FEATURE.QUERY_ONLY_
    * CORRUPT_RECORD_COLUMN]) — pass a CACHED read when splitting one
    * scan into clean + corrupt consumers, which is what a quarantine
    * pipeline does anyway (one pass over the log, two sinks).
    */
  def corrupt(events: DataFrame): DataFrame =
    events.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw"))
}
