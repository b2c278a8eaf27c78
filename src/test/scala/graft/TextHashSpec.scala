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

  test("simhash is a 64-bit value, identical for identical text") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "delta eps zeta")
      .toDF("text")
      .select(expr(TextHash.sparkTokenHashes("text")).as("th"))
      .select(expr(TextHash.sparkSimHash("th")).as("f"))
    val fs = df.as[Long].collect()
    assert(fs(0) == fs(1))
    assert(fs(0) != fs(2))
    // High half must carry real bits (the widened fingerprint is not
    // the old 30-bit value zero-extended).
    assert(fs.exists(f => (f >>> 32) != 0L))
  }
}

/** The compiled kernels must equal the HOF formulation of the spec
  * value-for-value (the oracle SQL is generated from the HOF spec).
  */
class TextHashKernelSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextHashExprs._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h i j k l m",
    "short",
    "Mixed CASE text With   spacing").toDF("text")
  private val th = expr(TextHash.sparkTokenHashes("text"))
  private val thK = token_hashes(expr(TextHash.sparkTokens("text")))

  test("token_hashes kernel == HOF spec") {
    assert(docs.filter(expr(TextHash.sparkTokenHashes("text")) =!=
      token_hashes(expr(TextHash.sparkTokens("text")))).count() == 0)
  }

  test("shingle/minhash/band/simhash kernels == HOF spec") {
    // MinHash/bands are only defined for docs with >= 3 tokens (the
    // operators filter shorter docs; the oracle drops them) — compare
    // on that domain.
    val both = docs
      .select(th.as("th"), thK.as("thk"))
      .filter(size(col("th")) >= 3)
      .select(col("th"), col("thk"),
        expr(TextHash.sparkShingles("th")).as("sh"),
        shingle_set(col("thk")).as("shk"))
      .select(col("*"),
        expr(TextHash.sparkMinHash("sh")).as("mh"),
        minhash_sig(col("shk")).as("mhk"),
        expr(TextHash.sparkSimHash("th")).as("f"),
        simhash(col("thk")).as("fk"))
      .select(col("*"),
        expr(TextHash.sparkBandSigs("mh")).as("b"),
        band_sigs(col("mhk")).as("bk"))
    assert(both.filter(
      col("sh") =!= col("shk") || col("mh") =!= col("mhk") ||
        col("f") =!= col("fk") || col("b") =!= col("bk")).count() == 0)
  }

  test("string_poly_hash == HOF doc fingerprint") {
    assert(docs.filter(
      expr(TextHash.sparkDocFingerprint("text")) =!=
        string_poly_hash(lower(trim(col("text"))))).count() == 0)
  }
}
