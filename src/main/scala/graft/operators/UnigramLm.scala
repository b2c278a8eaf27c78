package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Unigram-LM tokenizer TRAINING (the SentencePiece vocabulary,
  * Kudo 2018) — the other half of the tokenizer-learning story next
  * to [[BpeTrain]]: BPE composes a vocabulary bottom-up by fusing
  * frequent pairs; unigram-LM starts from an over-complete seed and
  * PRUNES it top-down by likelihood loss, keeping the pieces the
  * corpus actually uses under its own best segmentations.
  *
  * Deterministic bounded form (every stochastic/iterate-to-converge
  * choice in the paper replaced by a fixed rule, so the DuckDB
  * oracle mirrors bit-for-bit):
  *
  *   1. SEED: every substring of length ≤ `maxPieceLen` of the
  *      distinct-word table, counted over all its occurrence
  *      positions weighted by word frequency; log-probs are
  *      e6-floored `ln(c/total)` (the g5 integer-ln protocol — no
  *      float ever aggregated).
  *   2. E-STEP (×2): each word's maximum-likelihood segmentation by
  *      EXHAUSTIVE enumeration — a word of length L has 2^(L-1)
  *      cut masks, L capped at `maxWordLen` (= 12 ⇒ ≤ 2048 masks,
  *      the documented SentencePiece-style long-token cap) — with
  *      the total order (score DESC, piece count ASC, joined-pieces
  *      string ASC) as the deterministic Viterbi tie rule; piece
  *      usage re-counted from the winning segmentations, zero-usage
  *      multi-char pieces dropped (EM's natural kill), single chars
  *      floored at count 1 (segmentation totality: every word must
  *      stay segmentable).
  *   3. PRUNE by likelihood LOSS (the paper's §3.2 step, its
  *      alternative-segmentation form): for each multi-char piece x,
  *      loss(x) = usage(x) · (logp(x) − altscore(x)) where altscore
  *      is x's own best ≥2-piece segmentation under the current
  *      vocabulary (a proper-substring enumeration, so x can never
  *      pay for itself); keep the top ⌈n/2⌉ by (loss DESC, piece
  *      ASC), drop the rest.
  *   4. FINAL E-step over the pruned vocabulary re-normalizes and
  *      re-counts — the emitted table is what a segmenter loads.
  *
  * Scale shape: everything runs over the DISTINCT-word table with
  * counts (Zipf-bounded — the [[BpeTrain]] discipline; the corpus is
  * touched once for word counts). The mask fan-out is a map-side
  * bounded explode (≤ 2048 × maxWordLen rows per distinct word);
  * piece scoring is an equi-join on the piece key against the
  * (target-vocabulary-sized, broadcastable) piece table; the argmax
  * is one partial aggregate per word (min over a struct — no window
  * over the mask space); usage counts are one partial-agg exchange
  * on the piece key. The per-round piece tables are bounded and
  * lineage-cut, so the 4 chained rounds keep a flat plan.
  */
object UnigramLm {

  /** (piece, c) seed substring counts over (w, n) distinct words:
    * every occurrence position of every substring of length ≤
    * `maxPieceLen`, weighted by the word's corpus count.
    */
  def seedPieces(words: DataFrame, maxPieceLen: Int = 4): DataFrame =
    words
      .select(col("w"), col("n"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  st -> transform(
           |    sequence(1, least($maxPieceLen, length(w) - st + 1)),
           |    l -> substring(w, st, l))))"""
          .stripMargin.replaceAll("\n\\s*", " "))).as("piece"))
      .groupBy("piece").agg(sum("n").as("c"))

  /** e6-floored log-probs from (piece, c) counts: floor(ln(c/Σc)·1e6)
    * as BIGINT — both engines compute the identical IEEE double
    * before the single floor.
    */
  def logpTable(counts: DataFrame): DataFrame =
    counts
      .crossJoin(broadcast(counts.agg(sum(col("c")).as("tot"))))
      .select(col("piece"), expr(
        "CAST(floor(ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) " +
          "* CAST(1000000 AS DOUBLE)) AS BIGINT)").as("logp_e6"))

  /** All-mask segmentation enumeration of `words` (w[, n]) scored
    * against `pieces` (piece, logp_e6): one row per (word, mask)
    * whose every piece is in the vocabulary, carrying the BIGINT
    * score sum, the piece count and the space-joined segmentation
    * string. `minPieces` = 2 is the prune step's proper-substring
    * restriction.
    */
  def scoredSegs(words: DataFrame, pieces: DataFrame,
      minPieces: Int = 1): DataFrame = {
    import graft.functions.SegEnumAll.seg_enum
    // Mask enumeration runs in the compiled [[SegEnumAll]] kernel
    // (round-16): the previous chain paid an interpreted `sequence`
    // explode plus `filter`/`transform`/`substring`/`array_join`
    // higher-order dispatches per (word, mask) row. Same rows: the
    // kernel doc pins cut/substring/join parity, and the cut set ↔
    // segstr bijection (spaces mark exactly the cut positions) makes
    // (w, segstr) the same aggregation key the (w, mask) pair was.
    val segs = words
      .select(col("w"), explode(seg_enum(col("w"), minPieces)).as("m"))
      .select(col("w"), col("m.np").as("np"),
        col("m.segstr").as("segstr"), col("m.ps").as("ps"))
    segs
      .select(col("w"), col("np"), col("segstr"),
        explode(col("ps")).as("piece"))
      .join(pieces.select(col("piece"), col("logp_e6")), Seq("piece"))
      .groupBy("w", "np", "segstr")
      .agg(count(lit(1)).as("nf"), sum("logp_e6").as("score"))
      .filter(col("nf") === col("np"))
      .select("w", "np", "segstr", "score")
  }

  /** Per-word winning segmentation under the deterministic total
    * order (score DESC, piece count ASC, segstr ASC).
    */
  def bestSegs(words: DataFrame, pieces: DataFrame): DataFrame =
    scoredSegs(words, pieces)
      .groupBy("w")
      .agg(min(struct((-col("score")).as("ns"), col("np"),
        col("segstr"))).as("b"))
      .select(col("w"), col("b.segstr").as("segstr"))

  /** Piece usage counts over the winning segmentations, weighted by
    * word frequency.
    */
  def usage(words: DataFrame, pieces: DataFrame): DataFrame =
    bestSegs(words, pieces)
      .join(words.select(col("w"), col("n")), "w")
      .select(col("n"), explode(split(col("segstr"), " ")).as("piece"))
      .groupBy("piece").agg(sum("n").as("c"))

  /** The M-step count table: multi-char pieces keep their usage
    * (zero-usage ones DROP); single chars are floored at 1 so every
    * word stays segmentable. `chars` = the seed's single-char rows.
    */
  private def mStepCounts(use: DataFrame, chars: DataFrame): DataFrame =
    chars.select(col("piece"))
      .join(use, Seq("piece"), "left")
      .select(col("piece"), greatest(coalesce(col("c"), lit(0L)),
        lit(1L)).as("c"))
      .union(use.filter(length(col("piece")) > 1))

  /** Full training run over a (w, n) distinct-word table.
    * @return (piece, n_used, logp_e6) — the final vocabulary,
    *   usage-counted and normalized over itself.
    */
  def train(words0: DataFrame, maxPieceLen: Int = 4,
      maxWordLen: Int = 12): DataFrame = {
    val words = words0.filter(length(col("w")) <= maxWordLen)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try trainOnPrepared(words, maxPieceLen)
    finally words.unpersist()
  }

  /** [[train]] over an ALREADY length-capped (and ideally persisted)
    * word table — the form a caller that also segments with the
    * result uses (d84 feeds the same table to [[bestSegs]]; without
    * this split the corpus would tokenize twice). Safe to release
    * `words` on return: every frame the result depends on is an
    * eager lineage cut taken here.
    */
  def trainOnPrepared(words: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    import graft.operators.Checkpointing.CutOps
    val seed = seedPieces(words, maxPieceLen).lineageCut
    val chars = seed.filter(length(col("piece")) === 1).lineageCut
    // EM round 1: seed probs → usage → re-counted vocabulary.
    val p0 = logpTable(seed)
    val u1 = usage(words, p0).lineageCut
    val p1 = logpTable(mStepCounts(u1, chars))
    // EM round 2.
    val u2 = usage(words, p1).lineageCut
    val c2 = mStepCounts(u2, chars).lineageCut
    val p2 = logpTable(c2).lineageCut
    // Likelihood-loss prune of the multi-char pieces: alt = the
    // piece's own best ≥2-piece segmentation (proper substrings
    // only, so the candidate can't pay for itself).
    val multi = p2.filter(length(col("piece")) > 1)
    val alt = scoredSegs(multi.select(col("piece").as("w")), p2,
        minPieces = 2)
      .groupBy("w")
      .agg(min(struct((-col("score")).as("ns"), col("np"),
        col("segstr"))).as("b"))
      .select(col("w").as("piece"), (-col("b.ns")).as("alt_score"))
    val nMulti = multi.count()
    val keepK = (nMulti + 1) / 2
    val kept = multi
      .join(c2.select(col("piece"), col("c").as("u")), "piece")
      .join(alt, "piece")
      .select(col("piece"),
        (col("u") * (col("logp_e6") - col("alt_score"))).as("loss"))
      .orderBy(col("loss").desc, col("piece"))
      .limit(keepK.toInt)
      .select("piece")
    // Final vocabulary: chars ∪ kept, counts renormalized, one last
    // E-step for the emitted usage numbers.
    val c3 = c2.join(chars.select("piece").union(kept), Seq("piece"),
      "left_semi").lineageCut
    val p3 = logpTable(c3)
    val u3 = usage(words, p3).lineageCut
    val c4 = mStepCounts(u3, chars)
    logpTable(c4)
      .join(u3.select(col("piece"), col("c").as("n_used")), Seq("piece"),
        "left")
      .select(col("piece"),
        coalesce(col("n_used"), lit(0L)).as("n_used"), col("logp_e6"))
  }
}
