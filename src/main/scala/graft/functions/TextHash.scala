package graft.functions

/** The engine's shared deterministic text-hash spec.
  *
  * Everything in the dedup/fingerprint family (exact dedup keys,
  * 3-gram shingles, MinHash permutations, SimHash bit derivation,
  * whole-document fingerprints) is defined here ONCE, as integral
  * arithmetic mod P = 1e9+7 over 64-bit values, and emitted twice:
  * as Spark SQL expression strings (pure higher-order
  * `transform`/`aggregate` functions — codegen'd, map-side, no UDF)
  * and as the equivalent DuckDB SQL fragments for the oracle. Both
  * engines therefore compute bit-identical signatures; there is no
  * murmur/xxhash cross-engine divergence to paper over.
  *
  * All intermediates stay < 2^63: hashes are < P ≈ 1e9, multipliers
  * < 1e9, so products are ≤ ~1e18 < Long.MaxValue.
  */
object TextHash {

  /** Modulus for all polynomial hashes. */
  val P = 1000000007L

  /** Knuth multiplicative constants for SimHash bit derivation: the
    * fingerprint's low 32 bits mix with `SimMult`, the high 32 with
    * `SimMult2` — both products stay < 2^62 for token hashes < P, so
    * the derivation is exact signed-64-bit on every engine (a single
    * 64-bit multiplier would overflow and wrap engine-dependently).
    */
  val SimMult = 2654435761L
  val SimMult2 = 2246822519L
  val Mod32 = 4294967296L // 2^32

  /** SimHash width (bits) and its band layout for the pigeonhole
    * pair-generation join: ham ≤ `SimBands - 1` ⇒ the pair agrees
    * exactly on ≥ 1 of the `SimBands` bit-bands. 64 bits in 4 bands
    * of 16 give 65,536 bucket values per band, so band buckets keep
    * pruning at corpus scale (the earlier 30-bit / 10-bit-band layout
    * had only 1,024 values per band — each bucket held ~n/1024 docs
    * and the band self-join degenerated at billions of documents).
    */
  val SimBits = 64
  val SimBands = 4
  val SimBandBits: Int = SimBits / SimBands

  /** MinHash: 16 permutations h_j(x) = (A(j)·x + B(j)) mod P, banded
    * 4×4 for LSH. Constants are fixed arbitrary odd/any values < 1e9.
    */
  val PermA: Seq[Long] = Seq(
    347712783L, 161973071L, 423938501L, 698935573L,
    51847157L, 77777869L, 881836555L, 575398923L,
    101071365L, 392655487L, 625763865L, 62275871L,
    976787303L, 544854975L, 230530421L, 40260663L)
  val PermB: Seq[Long] = Seq(
    92285142L, 465623510L, 449008934L, 75006691L,
    258409929L, 97402358L, 591682483L, 455824009L,
    63469421L, 887825707L, 607151283L, 132931336L,
    239701014L, 677129422L, 673701293L, 625988156L)
  val NumPerms: Int = PermA.size
  val Bands = 4
  val RowsPerBand: Int = NumPerms / Bands

  /** Random-hyperplane LSH for embeddings: 64 sign-of-dot planes in
    * 8 bands of 8 bits — 256 bucket values per band (the earlier
    * 16-plane / 4-bit-band layout had 16, so each band bucket held
    * ~n/16 of the corpus and the candidate self-join degenerated
    * toward O(n²/16) at scale). Plane p's ±1 pattern derives from
    * (PermA, PermB) parity with a per-16-plane-block offset, so all
    * 64 plane constants come from the same 16 published pairs.
    */
  val EmbedPlanes = 64
  val EmbedBands = 8
  val EmbedBandBits: Int = EmbedPlanes / EmbedBands

  /** Corpus-count threshold at which the embedding-LSH band layout
    * widens from 8×8 to 4×16 bits (Similarity.embedNearDupPairs —
    * the standard size-adaptive LSH tuning: expected collision
    * pairs grow ~bands·n²/2^width, so the width must grow with n).
    * Sits above every correctness SF's corpus (≤ ~2,200 rows, which
    * keep the max-recall 8-bit layout bit-for-bit) and below the
    * sf1.0 scale corpus (22,000 rows, where 8-bit banding measured
    * 15.7× wall-time on 10× data in the round-12 record).
    */
  val EmbedBandWidenN = 10000L

  /** Second widening threshold: at or above this corpus count the
    * embedding-LSH signature grows a SECOND 64-plane word (planes
    * 64-127, same block-offset derivation) and the band layout moves
    * to 4×32 bits across the 128-bit signature — collision mass per
    * band drops another 2^16× while a cosine ≥ 0.99 pair (~0-4
    * flipped bits of 128) keeps a clean band GUARANTEED up to 3
    * flips (pigeonhole over 4 bands) and with high probability at 4+
    * (all four landing in distinct bands is the only loss case —
    * the wide tier trades the small-corpus tiers' hard recall
    * guarantee for pruning, as every production LSH width step
    * does). 16-bit slices of one word stop pruning around
    * n ~ 10⁷ (expected bucket size n/65536 ⇒ ~10¹⁰ candidate pairs);
    * the threshold sits a decade below that knee. The second word's
    * kernel cost is paid ONLY on the wide tier (a lazy CASE branch),
    * so every smaller corpus keeps the one-word signature
    * bit-for-bit.
    */
  val EmbedBandWiden2N = 1000000L
  private val EmbedBlockOffset = 536870923L
  def embedPlaneA(p: Int): Long = PermA(p % NumPerms)
  def embedPlaneB(p: Int): Long =
    (PermB(p % NumPerms) + (p / NumPerms) * EmbedBlockOffset) % P

  // ---------------------------------------------------------------
  // Spark SQL expression-string builders (for functions.expr)
  // ---------------------------------------------------------------

  /** Whitespace tokens of the lower-cased, trimmed text column. */
  def sparkTokens(c: String): String =
    s"split(lower(trim($c)), '\\\\s+')"

  /** Polynomial char hash of one token-valued lambda variable. */
  private def sparkCharHash(tok: String): String =
    s"aggregate(split($tok, ''), CAST(0 AS BIGINT), " +
      s"(h, ch) -> (h * 31 + ascii(ch)) % $P)"

  /** array<bigint> of per-token hashes (with multiplicity). */
  def sparkTokenHashes(c: String): String =
    s"transform(${sparkTokens(c)}, t -> ${sparkCharHash("t")})"

  /** Distinct 3-gram shingle hashes from a token-hash array column
    * `th` (0-based Spark array indexing). Guarded for < 3 tokens:
    * `sequence(0, n)` runs DESCENDING for negative n, so the
    * unguarded transform would index out of bounds.
    */
  def sparkShingles(th: String): String =
    s"CASE WHEN size($th) >= 3 THEN " +
      s"array_distinct(transform(sequence(0, size($th) - 3), " +
      s"i -> ((($th[i] * 31 + $th[i+1]) % $P) * 31 + $th[i+2]) % $P)) " +
      s"ELSE CAST(array() AS array<bigint>) END"

  /** array<bigint>(16) MinHash signature from a distinct-shingle
    * array column `sh`. Pure map-side HOF — no shuffle, no UDF.
    */
  def sparkMinHash(sh: String): String = {
    val aLit = PermA.mkString("array(", "L, ", "L)")
    val bLit = PermB.mkString("array(", "L, ", "L)")
    s"transform(sequence(0, ${NumPerms - 1}), " +
      s"j -> array_min(transform($sh, " +
      s"s -> (element_at($aLit, j + 1) * s + element_at($bLit, j + 1)) % $P)))"
  }

  /** array<bigint>(4) of LSH band signatures from a MinHash array
    * column `mh`: fold of the band's 4 values,
    * ((((m0·31+m1) mod P)·31+m2)·31+m3) mod P.
    */
  def sparkBandSigs(mh: String): String =
    s"transform(sequence(0, ${Bands - 1}), b -> " +
      s"(((($mh[b*$RowsPerBand] * 31 + $mh[b*$RowsPerBand+1]) % $P) * 31 " +
      s"+ $mh[b*$RowsPerBand+2]) * 31 + $mh[b*$RowsPerBand+3]) % $P)"

  /** 64-bit SimHash fingerprint from a token-hash array column `th`
    * (multiplicity-weighted bit votes; tie → 0 bit). Bits 0-31 come
    * from (t·SimMult) mod 2³², bits 32-63 from (t·SimMult2) mod 2³².
    * Bit 63 makes the fingerprint negative as a signed long — fine:
    * both engines' shifts are arithmetic and band extraction masks,
    * so the two's-complement bit pattern is all that matters.
    */
  def sparkSimHash(th: String): String =
    s"aggregate(transform(sequence(0, ${SimBits - 1}), b -> " +
      s"CASE WHEN aggregate($th, CAST(0 AS BIGINT), (acc, t) -> acc + " +
      s"CASE WHEN (shiftright(CASE WHEN b < 32 THEN (t * $SimMult) % $Mod32 " +
      s"ELSE (t * $SimMult2) % $Mod32 END, b % 32) & 1) = 1 " +
      s"THEN 1 ELSE -1 END) > 0 THEN shiftleft(CAST(1 AS BIGINT), b) " +
      s"ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (acc, x) -> acc + x)"

  /** Whole-document fingerprint: polynomial char hash of the full
    * normalized text.
    */
  def sparkDocFingerprint(c: String): String =
    sparkCharHash(s"lower(trim($c))")

  // ---------------------------------------------------------------
  // DuckDB fragment builders (oracle side; 1-based list indexing)
  // ---------------------------------------------------------------

  def duckTokens(c: String): String =
    raw"regexp_split_to_array(lower(trim($c)), '\s+')"

  /** Public mirror of the char-fold string hash (`string_poly_hash`)
    * for oracle SQL over arbitrary expressions (g8's node hashing).
    */
  def duckStringHash(expr: String): String = duckCharHash(expr)

  private def duckCharHash(tok: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($tok, ''), " +
      s"c2 -> CAST(ascii(c2) AS BIGINT))), (h, c2) -> (h * 31 + c2) % $P)"

  def duckTokenHashes(c: String): String =
    s"list_transform(${duckTokens(c)}, t -> ${duckCharHash("t")})"

  /** CTE body producing (doc_id, th) token-hash lists per document.
    * `sfx` renames the whole CTE chain (toks/sh/mh/bands → toksD/…)
    * so one query can run the pipeline over two sources (the
    * incremental delta-vs-corpus dedup); `from` is the source
    * relation (a table name or a parenthesized subquery).
    */
  def duckToksCte: String = duckToksCte("documents", "")
  def duckToksCte(from: String, sfx: String): String =
    s"""toks$sfx AS (
       |  SELECT doc_id, ${duckTokenHashes("text")} AS th
       |  FROM $from
       |)""".stripMargin

  /** CTE producing distinct (doc_id, s) shingle-hash rows. */
  def duckShinglesCte: String = duckShinglesCte("")
  def duckShinglesCte(sfx: String): String =
    s"""sh$sfx AS (
       |  SELECT DISTINCT doc_id,
       |    (((th[i] * 31 + th[i+1]) % $P) * 31 + th[i+2]) % $P AS s
       |  FROM toks$sfx, unnest(range(1, len(th) - 1)) AS u(i)
       |  WHERE len(th) >= 3
       |)""".stripMargin

  def duckMinHashCte: String = duckMinHashCte("")
  def duckMinHashCte(sfx: String): String = {
    val aLit = PermA.mkString("[", ", ", "]")
    val bLit = PermB.mkString("[", ", ", "]")
    s"""mh$sfx AS (
       |  SELECT doc_id, j AS perm,
       |    min(($aLit[j+1] * s + $bLit[j+1]) % $P) AS m
       |  FROM sh$sfx, unnest(range(0, $NumPerms)) AS u(j)
       |  GROUP BY doc_id, j
       |)""".stripMargin
  }

  def duckBandsCte: String = duckBandsCte("")
  def duckBandsCte(sfx: String): String =
    s"""bands$sfx AS (
       |  SELECT doc_id, perm // $RowsPerBand AS band,
       |    ((((min(CASE WHEN perm % $RowsPerBand = 0 THEN m END) * 31
       |       + min(CASE WHEN perm % $RowsPerBand = 1 THEN m END)) % $P) * 31
       |       + min(CASE WHEN perm % $RowsPerBand = 2 THEN m END)) * 31
       |       + min(CASE WHEN perm % $RowsPerBand = 3 THEN m END)) % $P AS sig
       |  FROM mh$sfx GROUP BY doc_id, band
       |)""".stripMargin

  /** CTE producing (doc_id, f) 64-bit SimHash fingerprints. DuckDB
    * raises on `1::BIGINT << 63`, so bit 63's value is the
    * Long.MinValue literal; the partial sums of bits 0-62 stay below
    * 2^63 and adding the negative bit-63 term lands back in range, so
    * the fold reproduces the two's-complement pattern exactly.
    */
  def duckSimHashCte: String =
    s"""bits AS (
       |  SELECT doc_id, b,
       |    CASE WHEN sum(CASE WHEN ((CASE WHEN b < 32
       |                    THEN (th * $SimMult) % $Mod32
       |                    ELSE (th * $SimMult2) % $Mod32 END) >> (b % 32)) & 1 = 1
       |                       THEN 1 ELSE -1 END) > 0
       |         THEN CASE WHEN b = 63 THEN CAST(${Long.MinValue} AS BIGINT)
       |              ELSE (CAST(1 AS BIGINT) << b) END
       |         ELSE 0 END AS bitval
       |  FROM (SELECT doc_id, unnest(th) AS th FROM toks),
       |       unnest(range(0, $SimBits)) AS u(b)
       |  GROUP BY doc_id, b
       |),
       |fp AS (
       |  SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS f FROM bits GROUP BY doc_id
       |)""".stripMargin

  def duckDocFingerprint(c: String): String =
    duckCharHash(s"lower(trim($c))")

  /** Sequential-fold cosine similarity between two DOUBLE[] columns —
    * the exact operation order of graft.functions.CosineSimilarity
    * (per-element double products, left-to-right sum, dot/(√nx·√ny))
    * so Spark and DuckDB agree bit-for-bit.
    */
  def duckCosine(a: String, b: String, dims: Int): String = {
    def fold(products: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(1, ${dims + 1}), i -> $products)), (acc, x) -> acc + x)"
    s"(${fold(s"$a[i] * $b[i]")} / " +
      s"(sqrt(${fold(s"$a[i] * $a[i]")}) * sqrt(${fold(s"$b[i] * $b[i]")})))"
  }

  /** DuckDB twin of TextHashKernels.embedSimHash: 64-bit sign-of-dot
    * signature over the deterministic ±1 hyperplanes derived from
    * (PermA, PermB) parity — same left-to-right double fold, so the
    * signature (and therefore every LSH band) matches Spark
    * bit-for-bit. Bit 63's value interpolates as the Long.MinValue
    * literal (DuckDB has no 1<<63); it is added LAST, so every
    * partial sum stays in signed-64 range.
    */
  def duckEmbedSimHash(e: String, dims: Int): String =
    duckEmbedSimHash(e, dims, word = 0)

  /** `word` selects the 64-plane block (0 → planes 0-63, 1 → planes
    * 64-127): the oracle twin of TextHashKernels.embedSimHash2.
    */
  def duckEmbedSimHash(e: String, dims: Int, word: Int): String = {
    val bits = (0 until EmbedPlanes).map { j =>
      val p = word * EmbedPlanes + j
      val a = embedPlaneA(p)
      val b = embedPlaneB(p)
      val dot = s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(range(1, ${dims + 1}), i -> " +
        s"(CASE WHEN (($a * i + $b) % $P) % 2 = 0 " +
        s"THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) * $e[i])), " +
        s"(acc, x) -> acc + x)"
      s"(CASE WHEN $dot >= 0 THEN CAST(${1L << j} AS BIGINT) " +
        s"ELSE CAST(0 AS BIGINT) END)"
    }
    bits.mkString("(", " + ", ")")
  }
}
