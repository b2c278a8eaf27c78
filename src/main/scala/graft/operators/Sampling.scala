package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs.string_poly_hash

/** Deterministic sampling for corpus curation: downsample
  * over-represented strata (language, source domain) at per-stratum
  * rates, reproducibly — the same doc survives every run, on every
  * engine, regardless of partitioning.
  *
  * The sample decision is a pure function of the row key (the shared
  * polynomial hash of the id's decimal string, bucketed mod
  * [[Buckets]]), so this is a map-side filter: no shuffle, no RNG
  * state, pushdown-friendly, and trivially parallel at any scale.
  * (`df.sample()` by contrast is partition-order-dependent and not
  * reproducible across engines.)
  */
object Sampling {

  val Buckets = 10000

  /** Knuth multiplicative mixer: the raw polynomial hash of a decimal
    * id string is near-LINEAR in the id (consecutive ids hash to
    * consecutive values), so bucketing it directly selects contiguous
    * id ranges. Multiplying by 2654435761 (⌊2³²/φ⌋) and wrapping to
    * 32 bits equidistributes consecutive inputs. The product is
    * < 2⁶² (hash < P ≈ 2³⁰), so it stays exact in any engine's
    * 64-bit integers — no overflow-wrap divergence.
    */
  val Mixer = 2654435761L
  val MixMod = 4294967296L // 2^32

  /** The full 32-bit Knuth-mixed key hash — the shared scrambling
    * primitive: [[hashBucket]] reduces it mod [[Buckets]] for
    * sampling, [[shuffleOrder]] sorts by it, and
    * `ParquetSink.writeTokenShards` assigns shards off it. ONE
    * definition so shard assignment and training order can never
    * silently desynchronize (the DuckDB oracles mirror this exact
    * expression).
    */
  def mixedKey(key: Column): Column =
    string_poly_hash(key.cast("string")) * Mixer % MixMod

  /** Hash bucket in [0, Buckets) for a key column. */
  def hashBucket(key: Column): Column =
    mixedKey(key) % Buckets

  /** Deterministic global training-order shuffle (d65) — the last
    * step before shard export: a trainer must not see the corpus in
    * crawl/source order (adjacent documents correlate — same site,
    * same day, same template), and `rand()`/`shuffle()` orders are
    * partition-, retry- and engine-unstable. The order key is the
    * full 32-bit Knuth-mixed id hash ([[hashBucket]]'s exact recipe
    * WITHOUT the bucket reduction — 10 000 buckets would give only
    * 10 000 distinct sort keys and leave id order inside each), tied
    * by id — a pure function of the row SET, identical across runs,
    * partitionings and engines, so the "random" order is
    * reproducible and oracle-checkable. The sort is Spark's
    * range-partitioned exchange (sampled split points, each task
    * sorts its range — the pr_rank_sort class, never a single-task
    * global sort).
    */
  def shuffleOrder(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shuffle_key", mixedKey(col(idCol)))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Keep each row with its stratum's rate (fraction in [0,1]);
    * strata not in `rates` keep `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(
      lit(math.floor(defaultRate * Buckets).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum,
          lit(math.floor(rate * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Per-stratum quantile estimates from the k rows with the
    * smallest mixed id hash — a deterministic uniform sample whose
    * selection is order-independent and MERGEABLE (the bottom-k of a
    * union is the bottom-k of the per-side bottom-ks), so one
    * definition serves batch and streaming unchanged (d38 and
    * [[graft.streaming.DocStream.sampleQuantiles]]). The sample rides
    * the bounded-heap `top_k_by_score` partial aggregate (score =
    * −hash): one stratum-key exchange, O(k) state per group; the
    * percentile is a POSITIONAL pick (index ⌈q·n⌉ of the sorted
    * sample) — exact on the sample, never a row-linear buffer.
    *
    * @param df (strataCol, idCol, valueCol); idCol long, valueCol long
    * @return per stratum: n_docs, n_sample, p10/p50/p90 of valueCol
    */
  def hashSampleQuantiles(df: DataFrame, strataCol: String, idCol: String,
      valueCol: String, k: Int = 256,
      outSuffix: String = "v"): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val h = col(idCol) * Mixer % MixMod
    def pick(q: Double) =
      element_at(col("v"), ceil(lit(q) * size(col("v"))).cast("int"))
    df.groupBy(strataCol)
      .agg(count(lit(1)).as("n_docs"),
        top_k_by_score(negate(h.cast("double")), col(idCol),
          col(valueCol), k).as("smp"))
      .select(col(strataCol), col("n_docs"),
        array_sort(expr("transform(smp, x -> x.tag)")).as("v"))
      .select(col(strataCol), col("n_docs"),
        size(col("v")).cast("long").as("n_sample"),
        pick(0.1).as("p10_" + outSuffix), pick(0.5).as("p50_" + outSuffix),
        pick(0.9).as("p90_" + outSuffix))
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis-Spirakis A-ES, log form): each row's selection key
    * is ln(u)/w with u = (mixed hash + 1)/2³² ∈ (0, 1] derived from
    * the row id through the overflow-safe poly hash ([[hashBucket]]'s
    * exact recipe: the hash is bounded by P < 2³⁰, so id·Mixer can
    * never wrap Long and silently drop 64-bit ids — e.g. xxhash64
    * doc ids — out of the race) — no RNG state anywhere, so the
    * sample is a pure
    * function of the (id, weight) set: identical across runs,
    * partitionings and engines, and the inclusion law is the A-ES
    * one (P ∝ w in the exponential-race sense). The quality-weighted
    * corpus downsampling step of a training-data recipe — where
    * [[stratifiedSample]] takes a RATE per stratum, this takes the
    * k best draws of a weighted race.
    *
    * Scale shape: key computation is map-side column math; the
    * k-largest selection is a TakeOrdered (per-partition top-k +
    * k-row merge), never a global sort.
    *
    * @param df rows with a numeric id column and a positive weight
    *   column (non-positive-weight rows are excluded — they can't
    *   race)
    * @return the k selected rows (original columns), highest key
    *   first tie-broken by id
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val u = ((string_poly_hash(col(idCol).cast("string"))
      * Mixer % MixMod) + 1).cast("double") / lit(MixMod.toDouble)
    df.filter(col(weightCol) > 0)
      .withColumn("_key", log(u) / col(weightCol))
      .orderBy(col("_key").desc, col(idCol))
      .limit(k)
      .drop("_key")
  }

  /** Training-mix construction: replicate each row by its stratum's
    * WEIGHT, fractional weights included — weight 2.5 gives every row
    * 2 copies plus a 3rd for the deterministic hash-selected half,
    * weight 0.5 downsamples (0 or 1 copies). This is the "source X at
    * 2.5 epochs" mixing step of a pretraining data recipe, with the
    * same reproducibility contract as [[stratifiedSample]]: the copy
    * count is a pure function of the row key, so the mixture is
    * identical across runs, engines and partitionings.
    *
    * Weights decompose in SCALA to (whole, fractional-buckets)
    * INTEGER literals baked into the plan, so no float arithmetic can
    * diverge between engines. Output carries a 0-based `copy` index
    * (an epoch tag downstream shuffles can salt by); rows with 0
    * copies disappear.
    */
  def mixtureRepeat(df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    def split(w: Double): (Long, Long) = {
      require(w >= 0, s"mixture weight must be >= 0, got $w")
      val base = math.floor(w).toLong
      (base, math.floor((w - base) * Buckets).toLong)
    }
    val (db, dfrac) = split(defaultWeight)
    val base = weights.foldLeft(lit(db)) { case (acc, (s, w)) =>
      when(col(strataCol) === s, lit(split(w)._1)).otherwise(acc)
    }
    val frac = weights.foldLeft(lit(dfrac)) { case (acc, (s, w)) =>
      when(col(strataCol) === s, lit(split(w)._2)).otherwise(acc)
    }
    df.withColumn("_n",
        base + when(hashBucket(col(keyCol)) < frac, 1L).otherwise(0L))
      .filter(col("_n") > 0)
      .withColumn("copy", explode(expr("sequence(0, _n - 1)")))
      .drop("_n")
      .withColumn("copy", col("copy").cast("long"))
  }
}
