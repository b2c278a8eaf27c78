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

  /** Hash bucket in [0, Buckets) for a key column. */
  def hashBucket(key: Column): Column =
    string_poly_hash(key.cast("string")) * Mixer % MixMod % Buckets

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
}
