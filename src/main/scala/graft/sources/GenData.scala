package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-table generator for scale testing beyond
  * the driver-provided SFs (TESTDATA.md stops at sf0.1; the 100-TB
  * design claims deserve at least one empirical 10× step).
  *
  * Faithful to the driver corpus: same 10 tables, same schemas (key
  * types, VARCHAR enums, TIMESTAMP day-granularity order/ship dates,
  * FLOAT[] unit embeddings), same distributions measured off sf0.1 —
  * 31-word document vocabulary, uniform 10..100 words/doc, ~0.16%
  * exact-dup documents, lang mix en 41% / zh 15% / es 15% / fr 15% /
  * de 14%, exponential(mean 50) event values, ~4 lineitems/order via
  * independent uniform order keys. Only the seed differs, which is
  * fine: every scale check compares Spark vs DuckDB on the SAME
  * generated files, not against driver-generated data.
  *
  * Generation is itself Spark-native and distributed: `spark.range`
  * partitions the id space, every column is a codegen'd expression on
  * deterministic `xxhash64(id, salt)` draws (no RNG state, no driver
  * loop), so the generator would produce identical data on a
  * 1000-executor cluster — and generating a 100-TB corpus is the same
  * job with a bigger range.
  */
object GenData {

  /** Uniform [0,1) from hashed columns — deterministic, codegen'd. */
  private def u(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(1000000000L)) / 1e9

  private def pick(arr: Seq[String], cols: Column*): Column = {
    val a = array(arr.map(lit): _*)
    element_at(a, (pmod(xxhash64(cols: _*), lit(arr.size.toLong)) + 1).cast("int"))
  }

  /** Row counts at sf=1.0 (10× the driver's sf0.1). */
  private def n(base: Long, sf: Double): Long = math.max(1L, (base * sf).toLong)

  val vocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  def region(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(0 -> "AFRICA", 1 -> "AMERICA", 2 -> "ASIA", 3 -> "EUROPE",
      4 -> "MIDDLE EAST").toDF("r_regionkey", "r_name")
  }

  def nation(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
  }

  def customer(spark: SparkSession, sf: Double): DataFrame =
    spark.range(n(150000, sf)).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(xxhash64(col("id"), lit("cnat")), lit(25L)).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u(col("id"), lit("cbal")) * 11000.0, 2).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
        col("id"), lit("cseg")).as("c_mktsegment"))

  def supplier(spark: SparkSession, sf: Double): DataFrame =
    spark.range(n(10000, sf)).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(col("id"), lit("snat")), lit(25L)).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u(col("id"), lit("sbal")) * 11000.0, 2).as("s_acctbal"))

  def part(spark: SparkSession, sf: Double): DataFrame =
    spark.range(n(200000, sf)).select(
      col("id").as("p_partkey"),
      concat(
        pick(Seq("large", "hot", "blue", "old", "new", "dim", "red", "tiny"),
          col("id"), lit("padj")), lit(" "),
        pick(Seq("ring", "bolt", "plate", "cog", "tube", "rod", "cap", "disk"),
          col("id"), lit("pnoun"))).as("p_name"),
      format_string("Brand#%d",
        pmod(xxhash64(col("id"), lit("pbrand")), lit(25L)) + 1).as("p_brand"),
      pick(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"),
        col("id"), lit("ptype")).as("p_type"),
      (pmod(xxhash64(col("id"), lit("psize")), lit(50L)) + 1).cast("int").as("p_size"),
      (lit(900.0) + pmod(col("id"), lit(1000L)) / 10.0).as("p_retailprice"))

  def orders(spark: SparkSession, sf: Double): DataFrame = {
    val nCust = n(150000, sf)
    spark.range(n(1500000, sf)).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit("ocust")), lit(nCust)).as("o_custkey"),
      pick(Seq("F", "O", "P"), col("id"), lit("ostat")).as("o_orderstatus"),
      round(lit(1000.0) + u(col("id"), lit("oprice")) * 499000.0, 2).as("o_totalprice"),
      date_add(to_date(lit("1995-01-01")),
        pmod(xxhash64(col("id"), lit("odate")), lit(2405L)).cast("int"))
        .cast("timestamp").as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        col("id"), lit("oprio")).as("o_orderpriority"))
  }

  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    val (nOrd, nPart, nSupp) = (n(1500000, sf), n(200000, sf), n(10000, sf))
    spark.range(n(6000000, sf)).select(
      pmod(xxhash64(col("id"), lit("lord")), lit(nOrd)).as("l_orderkey"),
      pmod(xxhash64(col("id"), lit("lpart")), lit(nPart)).as("l_partkey"),
      pmod(xxhash64(col("id"), lit("lsupp")), lit(nSupp)).as("l_suppkey"),
      (pmod(xxhash64(col("id"), lit("lline")), lit(7L)) + 1).cast("int").as("l_linenumber"),
      (pmod(xxhash64(col("id"), lit("lqty")), lit(50L)) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u(col("id"), lit("lprice")) * 104100.0, 2).as("l_extendedprice"),
      round(u(col("id"), lit("ldisc")) * 0.1, 2).as("l_discount"),
      round(u(col("id"), lit("ltax")) * 0.08, 2).as("l_tax"),
      pick(Seq("A", "N", "R"), col("id"), lit("lrf")).as("l_returnflag"),
      pick(Seq("F", "O"), col("id"), lit("lls")).as("l_linestatus"),
      date_add(to_date(lit("1995-01-02")),
        pmod(xxhash64(col("id"), lit("lship")), lit(2499L)).cast("int"))
        .cast("timestamp").as("l_shipdate"))
  }

  def events(spark: SparkSession, sf: Double): DataFrame = {
    val nUsers = n(15000, sf)
    // 2024-01-01T00:00:00Z in microseconds; 30-day window.
    val startMicros = 1704067200000000L
    val spanMicros = 30L * 86400L * 1000000L
    spark.range(n(1000000, sf)).select(
      col("id").as("event_id"),
      timestamp_micros((lit(startMicros) +
        (u(col("id"), lit("ets")) * spanMicros.toDouble).cast("long"))).as("ts"),
      pmod(xxhash64(col("id"), lit("euser")), lit(nUsers)).as("user_id"),
      pick(Seq("click", "error", "purchase", "signup", "view"),
        col("id"), lit("etype")).as("event_type"),
      // Exponential(mean 50): matches sf0.1's avg 49.9 / max ~560.
      round(lit(-50.0) * log(lit(1.0) - u(col("id"), lit("eval"))), 2).as("value"),
      format_string("{\"k\": %d}",
        pmod(xxhash64(col("id"), lit("ek")), lit(100L))).as("props"))
  }

  def documents(spark: SparkSession, sf: Double): DataFrame = {
    val vocabArr = array(vocab.map(lit): _*)
    // ~0.16% of docs (1/625, like sf0.1's 8/5000) replicate an
    // earlier doc's text exactly, so exact/near-dup operators have
    // planted positives at every scale.
    val isDup = pmod(xxhash64(col("id"), lit("ddup")), lit(625L)) === 0 &&
      col("id") >= 1000
    val seed = when(isDup,
      pmod(xxhash64(col("id"), lit("dseed")), lit(1000L))).otherwise(col("id"))
    val nWords = (pmod(xxhash64(seed, lit("dnw")), lit(91L)) + 10).cast("int")
    val text = array_join(
      transform(sequence(lit(1), nWords), i =>
        element_at(vocabArr,
          (pmod(xxhash64(seed, i.cast("long"), lit("dw")), lit(vocab.size.toLong))
            + 1).cast("int"))), " ")
    val lu = u(col("id"), lit("dlang"))
    spark.range(n(50000, sf)).select(
      col("id").as("doc_id"),
      text.as("text"),
      when(lu < 0.41, "en").when(lu < 0.56, "zh").when(lu < 0.71, "es")
        .when(lu < 0.86, "fr").otherwise("de").as("lang"),
      concat(lit("src"),
        pmod(xxhash64(col("id"), lit("dsrc")), lit(20L))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def embeddings(spark: SparkSession, sf: Double): DataFrame = {
    // Box-Muller gaussian per (id, dim) from two hash draws, then
    // L2-normalize — unit vectors like the driver corpus.
    val gauss = transform(sequence(lit(0), lit(63)), j => {
      val u1 = greatest(u(col("id"), j.cast("long"), lit("g1")), lit(1e-12))
      val u2 = u(col("id"), j.cast("long"), lit("g2"))
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    })
    spark.range(n(20000, sf))
      .select(col("id").as("vec_id"), gauss.as("_g"),
        pmod(xxhash64(col("id"), lit("elab")), lit(10L)).cast("int").as("label"))
      .withColumn("_norm",
        sqrt(aggregate(col("_g"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"),
        transform(col("_g"), x => x / col("_norm"))
          .cast("array<float>").as("embedding"),
        col("label"))
  }

  def all(spark: SparkSession, sf: Double): Seq[(String, DataFrame)] = Seq(
    "region" -> region(spark),
    "nation" -> nation(spark),
    "customer" -> customer(spark, sf),
    "supplier" -> supplier(spark, sf),
    "part" -> part(spark, sf),
    "orders" -> orders(spark, sf),
    "lineitem" -> lineitem(spark, sf),
    "events" -> events(spark, sf),
    "documents" -> documents(spark, sf),
    "embeddings" -> embeddings(spark, sf))

  /** Writes each table as a SINGLE parquet file `<outDir>/<name>.parquet`
    * (matching the driver layout, which both Tables and the DuckDB
    * oracle read; parquet row groups keep single files splittable for
    * the scan side). Usage: GenData <sf> <outDir>.
    */
  def main(args: Array[String]): Unit = {
    val sf = args(0).toDouble
    val outDir = args(1)
    val spark = graft.GraftSession.local()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for ((name, df) <- all(spark, sf)) {
      val tmp = s"$outDir/_gen_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $name"))
      val dest = java.nio.file.Paths.get(s"$outDir/$name.parquet")
      java.nio.file.Files.deleteIfExists(dest)
      java.nio.file.Files.move(part.toPath, dest)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      println(s"[gen] $name -> $dest")
    }
    spark.stop()
  }
}
