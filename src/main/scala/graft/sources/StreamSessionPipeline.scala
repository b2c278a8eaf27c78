package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** STATEFUL continuous analytics as a deployable job: gap-based
  * sessionization ([[EventStream.sessionize]] — the q18 semantics)
  * over a parquet event directory, into an append-only session
  * parquet sink.
  *
  * The point this job proves beyond [[StreamCuratePipeline]]'s
  * stateless gates: the session STATE (open sessions per user, the
  * event-time watermark) lives in the checkpoint and SURVIVES
  * restarts — with `Trigger.AvailableNow`, each scheduled run drains
  * the new files, closes whatever sessions the advancing watermark
  * proves finished, and carries still-open sessions to the next run.
  * A session spanning two runs is emitted exactly once, by the run
  * whose data closes it (spec-checked in EventStreamSpec). State is
  * bounded by the watermark: users idle past it time out and emit.
  */
object StreamSessionPipeline {

  /** Drain new event files through sessionization; blocks until this
    * increment is processed.
    *
    * `schema`: pass explicitly for scheduled deployments; the default
    * probes `inDir`, and an empty/missing input directory is treated
    * as a no-op increment rather than a failure (see
    * [[StreamCuratePipeline.run]]).
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, gapMicros: Long = 1800L * 1000000L,
      watermark: String = "1 hour",
      schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    import spark.implicits._
    val sch = schema.orElse(SourceSchemas.probe(spark, inDir)) match {
      case Some(s) => s
      case None => return // nothing upstream yet: no-op increment
    }
    val events = spark.readStream.schema(sch).parquet(inDir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.Event]
    val sessions = EventStream.sessionize(spark, events, gapMicros,
      watermark)
    val q = sessions.toDF().writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StreamSessionPipeline <inDir> <outDir> <checkpointDir>")
    val spark = graft.GraftSession.local()
    try run(spark, args(0), args(1), args(2))
    finally spark.stop()
  }
}
