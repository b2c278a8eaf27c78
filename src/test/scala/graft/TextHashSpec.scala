package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Pins the TextHash spec to known values (cross-checked against the
  * DuckDB oracle fragments during development) so any drift in the
  * Spark expression strings breaks loudly.
  */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  test("token char hash matches the pinned cross-engine values") {
    val df = Seq(("the scan", 0L)).toDF("text", "id")
      .select(expr(TextHash.sparkTokenHashes("text")).as("th"))
    assert(df.as[Seq[Long]].head() == Seq(114801L, 3524221L))
  }

  test("doc fingerprint is stable and bounded by P") {
    val df = Seq("The  Quick brown fox", "the  quick brown fox")
      .toDF("text")
      .select(expr(TextHash.sparkDocFingerprint("text")).as("f"))
    val fps = df.as[Long].collect()
    assert(fps(0) == fps(1), "normalization: case-insensitive")
    assert(fps.forall(f => f >= 0 && f < TextHash.P))
  }

  test("minhash signature has NumPerms entries, band sigs Bands") {
    val df = Seq("a b c d e f g h i j").toDF("text")
      .select(expr(TextHash.sparkTokenHashes("text")).as("th"))
      .select(expr(TextHash.sparkShingles("th")).as("sh"))
      .select(expr(TextHash.sparkMinHash("sh")).as("mh"))
      .select(col("mh"), expr(TextHash.sparkBandSigs("mh")).as("bands"))
    val (mh, bands) = df.as[(Seq[Long], Seq[Long])].head()
    assert(mh.size == TextHash.NumPerms)
    assert(bands.size == TextHash.Bands)
    assert(mh.forall(m => m >= 0 && m < TextHash.P))
  }

  test("simhash is a 30-bit value, identical for identical text") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "delta eps zeta")
      .toDF("text")
      .select(expr(TextHash.sparkTokenHashes("text")).as("th"))
      .select(expr(TextHash.sparkSimHash("th")).as("f"))
    val fs = df.as[Long].collect()
    assert(fs(0) == fs(1))
    assert(fs(0) != fs(2))
    assert(fs.forall(f => f >= 0 && f < (1L << TextHash.SimBits)))
  }
}
