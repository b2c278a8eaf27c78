package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.functions.TextHashExprs.string_poly_hash

/** Text-analysis operators: language ID, quality scoring, token
  * counting, document fingerprinting. All pure `functions._` column
  * math / higher-order functions — fully map-side (the only shuffles
  * are callers' final aggregations), inside whole-stage codegen.
  */
object TextAnalysis {

  /** Function words whose presence marks English-like text. */
  val EnStopwords: Seq[String] = Seq("the", "a")

  /** Per-doc language-ID heuristic: the ratio of function-word tokens.
    * predicted = 'en' when the stopword ratio ≥ `minRatio`, else
    * 'und' (undetermined).
    */
  def langId(docs: DataFrame, minRatio: Double = 0.02): DataFrame = {
    val inSet = EnStopwords.map(w => s"t = '$w'").mkString(" OR ")
    docs
      .withColumn("_toks", expr(TextHash.sparkTokens("text")))
      .withColumn("_hits",
        expr(s"size(filter(_toks, t -> $inSet))").cast("double"))
      .withColumn("stop_ratio", col("_hits") / size(col("_toks")))
      .withColumn("predicted",
        when(col("stop_ratio") >= minRatio, "en").otherwise("und"))
      .drop("_toks", "_hits")
  }

  /** Per-doc quality metrics and a composite score in [0, 1]:
    * type-token ratio, length saturation (n_tokens / 100 capped at
    * 1), and non-stopword density, weighted 0.4 / 0.3 / 0.3.
    */
  def quality(docs: DataFrame): DataFrame = {
    val scored = langId(docs)
    scored
      .withColumn("_toks", expr(TextHash.sparkTokens("text")))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("ttr",
        size(array_distinct(col("_toks"))).cast("double") / col("n_tokens"))
      .withColumn("len_sat",
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)))
      .withColumn("quality_score",
        lit(0.4) * col("ttr") + lit(0.3) * col("len_sat") +
          lit(0.3) * (lit(1.0) - col("stop_ratio")))
      .drop("_toks")
  }

  /** Whitespace and regex ("BPE-ish": letter runs / digit runs /
    * single punctuation) token counts per document.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(s"size(${TextHash.sparkTokens("text")})").cast("long")
        .as("ws_tokens"),
      expr("regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]')")
        .cast("long").as("bpe_tokens"))

  /** 64-bit-safe polynomial rolling-hash fingerprint of the full
    * normalized text (TextHash spec).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      string_poly_hash(lower(trim(col("text")))).as("fingerprint"))

  /** Per-document TF-IDF top-`k` terms — keyword extraction over the
    * corpus. tf = term count within the doc; idf = ln(N / df) with df
    * the number of documents containing the term (derived from the
    * already-deduplicated tf table — no second corpus scan). Scores
    * ship e6-scaled per the §5 protocol and ranking uses the SCALED
    * integer, so both engines rank identical values (ln is the one
    * operation the oracle cannot mirror bit-for-bit; at e6 precision
    * a libm ulp never moves the integer off a boundary in practice).
    *
    * Scale shape: tf is one (doc_id, token) exchange with map-side
    * partial counts; df a vocabulary-sized aggregate of tf; the
    * tf ⋈ df join broadcasts the vocabulary side (AQE). Per-doc top-k
    * is a bounded collect per GROUP (state = the doc's own vocabulary,
    * never corpus-wide) sorted and sliced in one aggregation — no
    * global window sort.
    *
    * @param nDocs corpus document count (the driver-scalar handoff,
    *   as in the reference's phase-1 count)
    */
  def tfidfTopTerms(docs: DataFrame, nDocs: Long, k: Int): DataFrame = {
    val tk = docs.select(col("doc_id"),
      explode(expr(TextHash.sparkTokens("text"))).as("token"))
    val tf = tk.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfq, "token")
      .select(col("doc_id"), col("token"),
        floor(col("tf") * log(lit(nDocs.toDouble) / col("df")) * 1000000
          + 0.5).cast("long").as("score_e6"))
    // (score DESC, token ASC) via ascending sort of (-score, token).
    val top = scored.groupBy("doc_id")
      .agg(slice(transform(
        array_sort(collect_list(struct(
          (-col("score_e6")).as("neg"), col("token")))),
        s => struct((-s.getField("neg")).as("score_e6"),
          s.getField("token").as("token"))), 1, k).as("top"))
    top.select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.token").as("token"), col("s.score_e6").as("score_e6"))
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene
    * `(N - df + 0.5)/(df + 0.5) + 1` idf variant, always ≥ 0): top-`k`
    * corpus documents per probe query — the retrieval primitive a
    * training pipeline uses for data selection ("find the docs most
    * like this benchmark/task") and retrieval-based decontamination.
    *
    * Parity protocol: each TERM's contribution is e6-scaled to an
    * integer BEFORE the per-(query, doc) sum — an integer sum is
    * partition/order-independent, whereas a double sum over terms
    * could straddle a rounding boundary between engines (the d17
    * per-term-scaling trick extended to a summed score).
    *
    * Scale shape: tf is the one (doc_id, token) exchange; df and
    * doc-length derive from tf (vocabulary/doc-sized aggregates); the
    * probe terms BROADCAST into the postings join, so only postings
    * of query terms flow; per-query ranking is the bounded-heap
    * `top_k_by_score` partial aggregate — never a corpus-wide window
    * sort. At 100 TB the postings join is the inverted-index probe.
    *
    * @param queryTerms (query_id LONG, token) — distinct probe terms
    * @param nDocs corpus document count (driver-scalar handoff)
    * @param avgdl mean document length in tokens (driver scalar)
    */
  def bm25TopK(docs: DataFrame, queryTerms: DataFrame, nDocs: Long,
      avgdl: Double, k: Int, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val tk = docs.select(col("doc_id"),
      explode(expr(TextHash.sparkTokens("text"))).as("token"))
    val tf = tk.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = log(((lit(nDocs) - col("df")).cast("double") + lit(0.5))
      / (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfc = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double")
          / lit(avgdl)))
    val contrib = tf.join(broadcast(queryTerms), "token")
      .join(dfq, "token").join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"),
        floor(idf * tfc * 1000000 + lit(0.5)).cast("long").as("c"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum("c").as("score_e6"))
    scored.groupBy("query_id")
      .agg(top_k_by_score(col("score_e6").cast("double"), col("doc_id"),
        lit(0L), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.cand_id").as("doc_id"),
        col("t.sim").cast("long").as("score_e6"))
  }

  /** LM fluency scoring against a SUPPLIED (token, logprob) model
    * table — the external-LM plug point (SURVEY.md §2 d19): the
    * operator's contract is only the two-column table, so a KenLM
    * dump, BPE-unit logprobs, or d19's corpus-derived unigram
    * stand-in all drive the identical plan with zero operator
    * changes. The LM is vocabulary-sized → broadcast into the join;
    * scoring is then map-side per token plus one partial-aggregated
    * exchange on doc_id.
    *
    * @param docTokens (doc_id, token) — one row per token occurrence
    *   (the tokenizer plug point: any tokenization that yields this
    *   shape works)
    * @param lm (token, logprob) — logprob DOUBLE, one row per token
    * @param oovLogprob score for tokens absent from `lm`; None drops
    *   them (d19's corpus-built LM covers every token by
    *   construction; a real LM wants Some(penalty))
    * @return (doc_id, n_tokens, logprob_e6) mean token log-prob,
    *   e6-scaled per the §5 parity protocol
    */
  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): positional k-gram hashes,
    * then each sliding window of `w` consecutive grams selects its
    * RIGHTMOST MINIMAL hash; the selected (position, hash) pairs are
    * the fingerprint set. The winnowing guarantee: any shared token
    * run of ≥ w + k − 1 tokens between two documents yields at least
    * one shared fingerprint HASH, while an edit perturbs only the
    * ≤ w windows that see it — the local-robustness whole-document
    * hashing (d8) lacks and shingle sets (d2) pay O(grams) to get.
    *
    * Selection is one map-side higher-order fold per window over a
    * packed key — hash·w + (w−1−offset), so the integer min IS "min
    * hash, rightmost tie" — decoded in the aggregate's finish lambda
    * to the collision-free fingerprint id pos·P + hash. No shuffle,
    * no UDF; the card (gram count, fingerprint count, mod-P checksum
    * binding the set) aggregates map-side per document.
    */
  def winnowing(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    val P = TextHash.P
    winnowed(docs, k, w)
      .select(col("doc_id"),
        size(col("_gh")).cast("long").as("n_grams"),
        size(col("_fp")).cast("long").as("n_fp"),
        expr(s"aggregate(_fp, CAST(0 AS BIGINT), (a, x) -> (a + x) % $P)")
          .as("fp_sum"))
  }

  /** Exploded fingerprint rows (doc_id, pos, hash) — the join key
    * for winnowing-based overlap detection and the spec's guarantee
    * checks; `hash` is the fingerprint id mod P, `pos` its 0-based
    * gram position.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 3,
      w: Int = 4): DataFrame = {
    val P = TextHash.P
    winnowed(docs, k, w)
      .select(col("doc_id"), explode(col("_fp")).as("fp"))
      .select(col("doc_id"), expr(s"fp div ${P}L").as("pos"),
        (col("fp") % P).as("hash"))
  }

  /** [[winnowingFingerprints]]' hash stream with CARRIED columns —
    * the streaming-twin form (stream twins watermark on a carried
    * ingest timestamp and ride the doc's shingle set through the
    * candidate join): one row per selected fingerprint HASH, all
    * input columns except `text` preserved. Same selection kernel,
    * so batch and stream share one definition of the fingerprint.
    */
  def winnowingFingerprintHashes(docs: DataFrame, k: Int = 3,
      w: Int = 4): DataFrame = {
    val P = TextHash.P
    winnowed(docs, k, w)
      .withColumn("_f", explode(col("_fp")))
      .withColumn("hash", col("_f") % P)
      .drop("_gh", "_fp", "_f", "text")
  }

  private def winnowed(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 2, s"need k >= 1, w >= 2; got k=$k w=$w")
    import graft.functions.TextHashExprs.{ngram_hashes_pos, token_hashes}
    val P = TextHash.P
    // The whole selection is wrapped in `transform(array(_gh), g ->
    // …)[1]` so the gram array binds ONCE as a lambda variable: the
    // optimizer substitutes plain column references when a
    // projection collapses into the consumer (winnowingFingerprints'
    // explode), and `_gh` appears four times here — two of them
    // INSIDE per-window lambdas, where an inlined ngram expression
    // re-evaluates per (window × fold step), turning the selection
    // quadratic in grams (measured 36 s vs 3 s at sf0.1). Lambda
    // variables cannot be substituted into, so the binding is a
    // collapse-proof fence with identical values.
    val fpExpr =
      s"""element_at(transform(array(_gh), g ->
         |CASE WHEN size(g) >= $w THEN array_distinct(
         |  transform(sequence(0, size(g) - $w), i ->
         |    aggregate(sequence(i, i + ${w - 1}),
         |      CAST(NULL AS BIGINT),
         |      (best, j) -> CASE WHEN best IS NULL
         |          OR element_at(g, CAST(j + 1 AS INT)) * $w
         |             + (i + ${w - 1} - j) < best
         |        THEN element_at(g, CAST(j + 1 AS INT)) * $w
         |             + (i + ${w - 1} - j)
         |        ELSE best END,
         |      p -> (i + ${w - 1} - p % $w) * ${P}L + p div $w)))
         |ELSE CAST(array() AS array<bigint>) END), 1)""".stripMargin
    docs
      .withColumn("_gh", ngram_hashes_pos(
        token_hashes(expr(TextHash.sparkTokens("text"))), k))
      .withColumn("_fp", expr(fpExpr))
  }

  /** Interpolated Kneser-Ney bigram model from observed (prev, w)
    * pair rows (Kneser & Ney 1995; Chen & Goodman 1999's interpolated
    * form) — the standard n-gram smoothing a curation LM wants over
    * d37's Jelinek-Mercer mix: mass freed by absolute-discounting
    * each seen bigram is redistributed by CONTINUATION probability
    * (how many distinct contexts a word follows — "francisco" is
    * frequent but follows only "san", so its continuation mass is
    * tiny), fixing exactly the burstiness unigram interpolation gets
    * wrong.
    *
    *   P(w|v) = (c(v,w) − D)/c(v) + (D·N₁₊(v·)/c(v)) · N₁₊(·w)/T
    *
    * with D = `discount`, N₁₊(v·) = distinct continuations of v,
    * N₁₊(·w) = distinct contexts of w, T = distinct bigram types.
    * Scoring covers observed bigrams (c ≥ 1 > D), so every term is
    * positive and the ln() is total.
    *
    * Scale shape: one exchange on the pair key builds c₂; both
    * per-context statistics (c(v), N₁₊(v·)) come out of ONE partial
    * agg over c₂; N₁₊(·w) is a second bounded agg; T is a one-row
    * scalar handoff. Everything downstream is vocabulary²-bounded,
    * independent of corpus size.
    *
    * @param pairs (prev, w) — one row per bigram OCCURRENCE
    * @return (token, logprob) with token = "prev w" — feeds
    *   [[lmScore]] unchanged (the d19/d30/d37 plug point)
    */
  def kneserNeyBigramLm(pairs: DataFrame,
      discount: Double = 0.75): DataFrame = {
    val c2 = pairs.groupBy("prev", "w").agg(count(lit(1)).as("c2"))
    val byPrev = c2.groupBy("prev")
      .agg(sum("c2").as("c1"), count(lit(1)).as("nf"))
    val byW = c2.groupBy("w").agg(count(lit(1)).as("nb"))
    val tTypes = c2.count() // one-row scalar handoff (d37's n pattern)
    c2.join(byPrev, "prev").join(byW, "w")
      .select(concat(col("prev"), lit(" "), col("w")).as("token"),
        log((col("c2").cast("double") - lit(discount))
            / col("c1").cast("double")
          + ((lit(discount) * col("nf").cast("double"))
            / col("c1").cast("double"))
            * (col("nb").cast("double") / lit(tTypes.toDouble)))
          .as("logprob"))
  }

  def lmScore(docTokens: DataFrame, lm: DataFrame,
      oovLogprob: Option[Double] = None): DataFrame = {
    val scored = oovLogprob match {
      case None => docTokens.join(broadcast(lm), "token")
      case Some(lp) => docTokens.join(broadcast(lm), Seq("token"), "left")
        .withColumn("logprob", coalesce(col("logprob"), lit(lp)))
    }
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        floor(avg(col("logprob")) * 1000000 + 0.5).cast("long")
          .as("logprob_e6"))
  }

  /** Context-window chunking: split each document into `chunkTokens`-
    * token windows starting every `stride` tokens (stride < chunk ⇒
    * overlap, the continuity trick training pipelines use so no
    * boundary context is lost). The final window may be short. Pure
    * map-side HOF math — one row explodes to its chunks, no shuffle;
    * each chunk carries its token count and the shared-spec
    * fingerprint (the join key for downstream chunk-level dedup).
    */
  def chunk(docs: DataFrame, chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens, got $stride / $chunkTokens")
    docs
      .withColumn("_toks", expr(TextHash.sparkTokens("text")))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, (size(_toks) - 1) div $stride), " +
            s"i -> array_join(slice(_toks, i * $stride + 1, $chunkTokens)," +
            " ' '))")).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(split(col("chunk"), " ")).cast("long").as("n_chunk_tokens"),
        string_poly_hash(col("chunk")).as("chunk_fp"))
  }

  /** Sequence packing — the training-prep step complementary to
    * [[chunk]]: chunking SPLITS long documents, packing CONCATENATES
    * short ones into fixed `seqTokens`-token training sequences
    * (GPT-style concat-and-split: a document may straddle a sequence
    * boundary and continue in the next). Each document gets its
    * position in the packed stream: which sequence it starts in and
    * at what token offset.
    *
    * Scale shape: a single global concatenation order would funnel
    * the corpus through one task, so the stream is SHARDED by the
    * deterministic Sampling hash (`shards` of them, sized to the
    * cluster) and packing runs independently per shard: one window
    * per shard computing a running token sum in (doc_id) order —
    * state is a single counter per shard, the shuffle is one
    * exchange on the shard key. All arithmetic is integer, so both
    * engines compute identical placements.
    *
    * @param shards concurrent packing streams; pick a divisor of
    *   [[Sampling.Buckets]] (10000) for exactly uniform shard sizes
    *   — a non-divisor skews shard populations by at most
    *   1/Buckets per shard
    * @return (doc_id, shard, n_tokens, seq_id, offset) — seq_id is
    *   the shard-local sequence the doc STARTS in, offset its token
    *   position there
    */
  /** Shard count for [[packSequences]] sized to the corpus: enough
    * shards that each packs ~`targetSeqsPerShard` sequences, never
    * fewer than one. Callers that know total corpus tokens (one
    * count aggregate — a bounded driver scalar, same class as
    * KMeans' centroid handoff) should use this instead of a
    * constant: a constant under-shards at 100x (each shard's window
    * funnels corpus/shards tokens through one task) and over-shards
    * tiny corpora.
    */
  def shardsFor(totalTokens: Long, seqTokens: Int,
      targetSeqsPerShard: Long): Int = {
    require(totalTokens >= 0 && seqTokens > 0 && targetSeqsPerShard > 0,
      s"bad shardsFor($totalTokens, $seqTokens, $targetSeqsPerShard)")
    math.max(1L, math.ceil(
      totalTokens.toDouble / (seqTokens.toDouble * targetSeqsPerShard))
      .toLong).toInt
  }

  /** Per-doc token counts — the ONE tokenization pass the packing
    * family shares: callers that need both a corpus total (for
    * [[shardsFor]]) and a packing run lineage-cut THIS frame once
    * and feed the `Counted` variants, so the corpus is scanned and
    * tokenized once per evaluation instead of once per consumer
    * (the round-11 verdict's d72 double-scan; PlanShapeSpec pins
    * the single-scan shape).
    */
  def countedTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(s"size(${TextHash.sparkTokens("text")})").cast("long")
        .as("n_tokens"))

  def packSequences(docs: DataFrame, seqTokens: Int,
      shards: Int): DataFrame =
    packSequencesCounted(countedTokens(docs), seqTokens, shards)

  /** [[packSequences]] over a precomputed (doc_id, n_tokens) frame
    * ([[countedTokens]]).
    */
  def packSequencesCounted(counted: DataFrame, seqTokens: Int,
      shards: Int): DataFrame = {
    require(seqTokens > 0 && shards > 0,
      s"need seqTokens > 0 and shards > 0, got $seqTokens / $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    counted
      .select(col("doc_id"),
        (Sampling.hashBucket(col("doc_id")) % shards).as("shard"),
        col("n_tokens"))
      .withColumn("start", coalesce(sum("n_tokens").over(w), lit(0L)))
      // `div` is INTEGER floor division — Column `/` is double
      // division + cast, which silently loses exactness once a
      // shard's cumulative token count exceeds 2^53.
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start div $seqTokens").as("seq_id"),
        (col("start") % seqTokens).as("offset"))
  }

  /** First-fit-decreasing BIN packing within each shard — the
    * padding-minimizing sibling of [[packSequences]]: where that
    * operator streams tokens contiguously (docs may straddle
    * sequence boundaries), this one places each doc WHOLE into the
    * first already-open sequence with room (docs longer than
    * `seqTokens` are capped to one full sequence), opening a new
    * sequence when none fits. Sorting each shard's docs by
    * (length DESC, doc_id) first is the classic FFD guarantee
    * (≤ 11/9·OPT + 1 bins) — and what closes the d56 padding-waste
    * loop: a spec pins utilization(FFD) ≥ utilization(first-fit in
    * hash order) on a planted corpus.
    *
    * Fully deterministic: the shard is the [[Sampling]] hash, the
    * order is (len_eff DESC, doc_id), and first-fit always takes the
    * LOWEST-indexed open sequence — so placements oracle-check
    * exactly against a recursive SQL mirror.
    *
    * Scale shape: one exchange on the shard key; the fold is ONE
    * higher-order `aggregate` per shard whose state is the open-
    * sequence fill array + the placement list — bounded by the
    * shard's TARGET size (shards scale with the corpus via
    * [[shardsFor]], each holding ~targetSeqsPerShard sequences), so
    * per-group state never grows with corpus size. No window over
    * doc rows, no driver loop.
    *
    * @return (doc_id, shard, n_tokens, seq_id, offset) — seq_id the
    *   shard-local sequence the doc was placed in, offset its token
    *   position there; len capped at `seqTokens` for placement
    */
  def packSequencesFfd(docs: DataFrame, seqTokens: Int,
      shards: Int): DataFrame =
    packSequencesFfdCounted(countedTokens(docs), seqTokens, shards)

  /** [[packSequencesFfd]] over a precomputed (doc_id, n_tokens)
    * frame ([[countedTokens]]).
    */
  def packSequencesFfdCounted(counted: DataFrame, seqTokens: Int,
      shards: Int): DataFrame = {
    require(seqTokens > 0 && shards > 0,
      s"need seqTokens > 0 and shards > 0, got $seqTokens / $shards")
    val cap = seqTokens.toLong
    val base = counted.select(col("doc_id"),
      (Sampling.hashBucket(col("doc_id")) % shards).as("shard"),
      col("n_tokens"))
      .withColumn("l", least(col("n_tokens"), lit(cap)))
    // Per-shard docs in FFD order: sort_array ascending on
    // (cap − len, doc_id) = length DESC, doc_id ASC. The first-fit
    // index is array_min over (eligible index | null) — the lowest
    // open sequence with room — and the whole placement pass is one
    // fold with (fills, placements) state.
    val folded = base
      .groupBy("shard")
      .agg(sort_array(collect_list(struct(
        (lit(cap) - col("l")).as("k"), col("doc_id").as("doc_id"),
        col("l").as("l"), col("n_tokens").as("n_tokens")))).as("ds"))
      .withColumn("placed", expr(
        // The first-fit index (array_min over eligible slots) is
        // bound ONCE per document via a transform over a one-element
        // array — SQL lambdas have no `let`, and inlining it at each
        // of its four use sites would re-scan the fill array 4x per
        // doc (the DuckDB mirror binds it once via LATERAL).
        s"""aggregate(
           |  ds,
           |  named_struct(
           |    'used', cast(array() as array<bigint>),
           |    'out', cast(array() as
           |      array<struct<doc_id: bigint, n_tokens: bigint,
           |                   seq: bigint, off: bigint>>)),
           |  (acc, x) -> get(transform(
           |    array(array_min(transform(acc.used,
           |      (u, i) -> if(u + x.l <= $cap, i, cast(null as int))))),
           |    fi -> named_struct(
           |      'used',
           |      if(fi is null,
           |        concat(acc.used, array(x.l)),
           |        transform(acc.used, (u, i) -> if(i = fi, u + x.l, u))),
           |      'out',
           |      concat(acc.out, array(named_struct(
           |        'doc_id', x.doc_id,
           |        'n_tokens', x.n_tokens,
           |        'seq', cast(coalesce(fi, size(acc.used)) as bigint),
           |        'off', coalesce(get(acc.used, fi), 0L)))))), 0),
           |  acc -> acc.out)""".stripMargin))
      .select(col("shard"), explode(col("placed")).as("p"))
    folded.select(col("p.doc_id").as("doc_id"), col("shard"),
      col("p.n_tokens").as("n_tokens"), col("p.seq").as("seq_id"),
      col("p.off").as("offset"))
  }

  /** Intra-document repetition metrics (the Gopher-style "fraction of
    * duplicated n-grams" quality signal): every rolling `n`-token
    * window of the doc, counted once vs. distinct. A document shorter
    * than `n` tokens is one window. Pure per-row higher-order-function
    * math — no shuffle, no join; repetition inside a doc never needs
    * to see another doc.
    */
  def repetition(docs: DataFrame, n: Int = 8): DataFrame =
    docs
      .withColumn("_toks", expr(TextHash.sparkTokens("text")))
      .withColumn("_wins", expr(
        s"transform(sequence(1, greatest(size(_toks) - ${n - 1}, 1)), " +
          s"i -> array_join(slice(_toks, i, $n), ' '))"))
      .select(col("doc_id"),
        size(col("_wins")).cast("long").as("n_windows"),
        (size(col("_wins")) - size(array_distinct(col("_wins"))))
          .cast("long").as("n_dup_windows"))
      .withColumn("rep_ratio_e4",
        floor(col("n_dup_windows").cast("double") / col("n_windows")
          * 10000 + 0.5).cast("long"))

  /** Gopher-style composite heuristic rule filter (Rae et al. 2021,
    * §A1.1 adapted to the whitespace tokenizer): per document, one
    * bit per rule plus the conjunction —
    *   r_wc   : token count in [`minTokens`, `maxTokens`]
    *   r_mwl  : mean word length in [3, 10] characters
    *   r_stop : at least `minStopHits` function-word tokens
    *   r_ttr  : type-token ratio ≥ 0.2 (repetition guard)
    * Keeping the per-rule bits (not just the conjunction) is what a
    * curation pipeline audits: which rule fires how often per source.
    *
    * All per-row higher-order-function math inside whole-stage
    * codegen — no shuffle, no join; at 100 TB this is a pure map over
    * the corpus scan. Ratio comparisons are exact small-int divisions
    * (chars/n, distinct/n) — both engines produce the identical
    * double, so the rule boundaries are parity-safe.
    */
  def gopherRules(docs: DataFrame, minTokens: Long = 50,
      maxTokens: Long = 100000, minStopHits: Long = 2): DataFrame = {
    val inSet = EnStopwords.map(w => s"t = '$w'").mkString(" OR ")
    docs
      .withColumn("_toks", expr(TextHash.sparkTokens("text")))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("_chars", expr(
        "aggregate(_toks, CAST(0 AS BIGINT), (acc, t) -> acc + length(t))"))
      .withColumn("mwl", col("_chars").cast("double") / col("n_tokens"))
      .withColumn("_stop_hits",
        expr(s"size(filter(_toks, t -> $inSet))").cast("long"))
      .withColumn("_ttr",
        size(array_distinct(col("_toks"))).cast("double") / col("n_tokens"))
      .withColumn("r_wc",
        col("n_tokens").between(minTokens, maxTokens).cast("long"))
      .withColumn("r_mwl",
        (col("mwl") >= 3.0 && col("mwl") <= 10.0).cast("long"))
      .withColumn("r_stop", (col("_stop_hits") >= minStopHits).cast("long"))
      .withColumn("r_ttr", (col("_ttr") >= 0.2).cast("long"))
      .withColumn("pass",
        (col("r_wc") * col("r_mwl") * col("r_stop") * col("r_ttr"))
          .cast("long"))
      .drop("_toks", "_chars", "_stop_hits", "_ttr")
  }
}
