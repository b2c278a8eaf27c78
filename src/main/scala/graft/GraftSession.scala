package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory for the graft engine.
  *
  * Local mode mirrors the cluster posture: AQE on (runtime re-plan,
  * skew-join splitting, coalesced shuffle reads), shuffle parallelism
  * sized to the machine instead of Spark's default 200, UTC session
  * time zone for oracle parity, and the graft extensions (native
  * `cosine_sim` expression) registered.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) — read as nano-epoch
      // longs (Tables.events converts to micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The testdata timestamps are written without isAdjustedToUTC;
      // Spark 4 would infer TIMESTAMP_NTZ, which breaks epoch
      // arithmetic (`unix_micros`) and diverges from DuckDB's naive
      // reading. With a UTC session zone, plain TIMESTAMP is
      // value-identical to the oracle's naive timestamps.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  /** Default local session: core count from SPARK_GRAFT_CPUS (driver
    * contract) falling back to all cores.
    */
  def local(): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
