package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosine_sim
import graft.functions.TextHashExprs.embed_simhash
import graft.multimodal.Multimodal
import graft.operators.{Dedup, KMeans, PiiScrub, Sampling, Sessionize, Similarity, SkewTools, TextAnalysis}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("embed_simhash: scale-invariant; negation complements the bits") {
    // Power-of-two components: no ±1-weighted dot can be exactly 0,
    // so sign bits are well-defined and -v must complement all 64.
    val v = Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0)
    val sigs = Seq((1L, v), (2L, v.map(_ * 2.0)), (3L, v.map(-_)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), embed_simhash(col("embedding")))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(3L) == ~sigs(1L))
  }

  test("dupSpans localizes shared and repeated token spans, merged maximal") {
    // w1..w20 are unique filler; docs 1 and 2 share a 10-token run
    // (A..J) at different offsets; doc 3 repeats its own 8-token run
    // (K..R) twice back-to-back — the within-doc duplication case.
    val shared = ('A' to 'J').map(c => s"tok$c").mkString(" ") // 10 toks
    val rep = ('K' to 'R').map(c => s"tok$c").mkString(" ")    // 8 toks
    val docs = Seq(
      (1L, (1 to 6).map("u" + _).mkString(" ") + " " + shared),
      (2L, shared + " " + (7 to 12).map("u" + _).mkString(" ")),
      (3L, rep + " " + rep),
      (4L, (13 to 24).map("u" + _).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.dupSpans(docs, n = 8, minOccurrences = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: shared run at tokens [6, 15]; doc 2: at [0, 9];
    // doc 3: the 8-gram KLMNOPQR occurs at pos 0 and 8 → hits at
    // 0 and 8 merge (adjacent intervals) into [0, 15]; doc 4: none.
    assert(got == Set((1L, 6L, 15L, 10L), (2L, 0L, 9L, 10L),
      (3L, 0L, 15L, 16L)))
  }

  test("exciseSpans keeps the globally first occurrence, cuts the rest") {
    // Same corpus as the dupSpans test. Keep-first = min (doc_id,
    // pos) per duplicated 8-gram: doc 1's copy of the shared A..J
    // run wins (doc 1 emits NO row — nothing excised from it), doc 2
    // loses its copy at [0, 9]; doc 3's back-to-back K..R repeat
    // keeps the first period and cuts the second ([8, 15] — interior
    // rotated grams occur once and contribute no hits).
    val shared = ('A' to 'J').map(c => s"tok$c").mkString(" ")
    val rep = ('K' to 'R').map(c => s"tok$c").mkString(" ")
    val docs = Seq(
      (1L, (1 to 6).map("u" + _).mkString(" ") + " " + shared),
      (2L, shared + " " + (7 to 12).map("u" + _).mkString(" ")),
      (3L, rep + " " + rep),
      (4L, (13 to 24).map("u" + _).mkString(" "))).toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Dedup.exciseSpans(docs, n = 8)
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (2L, 16L, 10L, 1L, md5hex((7 to 12).map("u" + _).mkString(" "))),
      (3L, 16L, 8L, 1L,
        md5hex(('k' to 'r').map(c => s"tok$c").mkString(" ")))))
  }

  test("exciseSpans fuzz: matches a brute-force reference on random corpora") {
    // Property check of the whole keep-first/merge/rebuild chain
    // against an independent O(n·grams) in-memory reference. A tiny
    // alphabet forces dense gram collisions (within AND across
    // docs); n = 3 keeps spans short so merges and overlaps exercise
    // every branch. Fixed seed — failures reproduce.
    val rnd = new scala.util.Random(0xD49)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val n = 3
    for (round <- 1 to 5) {
      val corpus = (0 until 12).map { id =>
        val len = 3 + rnd.nextInt(15)
        (id.toLong, Seq.fill(len)("w" + rnd.nextInt(4)).mkString(" "))
      }
      // Reference: hash grams exactly like the kernel spec (token
      // strings suffice — collisions of the real hash are content
      // collisions at this alphabet), keep min (doc, pos), merge.
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val occ = scala.collection.mutable.Map
        .empty[Seq[String], List[(Long, Int)]]
      for ((id, tk) <- toks; p <- 0 to tk.length - n)
        occ(tk.slice(p, p + n)) =
          (id, p) :: occ.getOrElse(tk.slice(p, p + n), Nil)
      val hits = occ.values.filter(_.size >= 2).flatMap { os =>
        val keep = os.minBy { case (id, p) => (id, p) }
        os.filterNot(_ == keep)
      }.toSeq
      val want = hits.groupBy(_._1).map { case (id, hs) =>
        val tk = toks.toMap.apply(id)
        val removed = hs.flatMap { case (_, p) => p until p + n }.toSet
        val spans = {
          // count merged runs over sorted hit starts (gap > n splits)
          val ps = hs.map(_._2).distinct.sorted
          ps.foldLeft((0, Int.MinValue / 2)) { case ((c, prev), p) =>
            if (p - prev > n) (c + 1, p) else (c, p)
          }._1
        }
        val kept = tk.zipWithIndex.collect {
          case (t, i) if !removed.contains(i) => t }
        (id, tk.length.toLong, removed.size.toLong, spans.toLong,
          md5hex(kept.mkString(" ")))
      }.toSet
      val got = Dedup.exciseSpans(
          corpus.toDF("doc_id", "text"), n = n)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      // ~100 grams over a 64-value space: dups are guaranteed, so
      // the property is never checked vacuously.
      assert(want.nonEmpty, s"round $round produced no duplicates")
      assert(got == want, s"round $round: $got != $want")
    }
  }

  test("MIPS: norm-augmented cosine ranking equals the exact dot ranking") {
    import graft.operators.Similarity
    // Vectors with deliberately VARIED norms (0.5×–3×): cosine and
    // inner-product orders genuinely disagree here, so agreement
    // between the augmented path and dotTopK is the reduction
    // working, not cosine accidentally sufficing.
    val rnd = new scala.util.Random(0x3195)
    val emb = (0L until 30L).map { i =>
      val scale = 0.5 + (i % 6) * 0.5
      (i, Array.fill(8)(rnd.nextGaussian() * scale))
    }.toDF("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 4)
    val want = Similarity.dotTopK(emb, qs, k = 5)
      .select("query_id", "rank", "cand_id")
      .as[(Long, Long, Long)].collect().toSet
    val got = Similarity.mipsViaAugmentation(emb, qs, k = 5)
      .select(col("query_id"), col("rank").cast("long"), col("cand_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // And the orders really differ from plain cosine for ≥ 1 query —
    // the test would be vacuous on norm-free data.
    val cos = Similarity.bruteForceTopK(emb, qs, k = 5)
      .select(col("query_id"), col("rank").cast("long"), col("cand_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(cos != want, "cosine and MIPS orders coincide — weak data")
  }

  test("LogReg learns a linearly separable toy set to 100% accuracy") {
    import graft.operators.LogReg
    // y = 1 iff v > 0, margin 2 — separable; 40 points.
    val pts = ((1 to 20).map(i => (i.toLong, 1.0 + i * 0.1, 1.0)) ++
      (1 to 20).map(i => (100L + i, -1.0 - i * 0.1, 0.0)))
      .toDF("id", "v", "y")
    val f = LogReg.standardizeE6(pts, Seq("v")).withColumn("x0", lit(1.0))
    val cols = Seq("x0", "v_std")
    val w = LogReg.train(f, cols, "y", rounds = 8, lrNum = 32L)
    val scored = LogReg.score(f, cols, w)
    assert(scored.filter(col("pred") =!= col("y").cast("int")).count() == 0)
    // Standardization: exact-integer mean of v_std quantizations is ~0
    // and the learned slope weight is positive (v drives y).
    assert(w(1) > 0)
  }

  test("BpeTrain learns composed merges from weighted pair counts") {
    import graft.operators.BpeTrain
    // "aaab"×3, "ab"×2: round 1 counts (a,a)=6 > (a,b)=5 → aa;
    // round 2 (a,b)=5 > (aa,a)=3 → ab; round 3 fuses the fused
    // symbols (aa,ab)=3 → aaab — multi-level composition.
    val vocab = Seq(("aaab", 3L), ("ab", 2L)).toDF("tok", "n")
    val got = BpeTrain.learnMerges(vocab, rounds = 3)
      .map(m => (m.mergeRank, m.lhs, m.rhs, m.merged, m.nOcc))
    assert(got == Seq((1, "a", "a", "aa", 6L), (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("salted aggregation equals direct groupBy on skewed keys") {
    // Integer-valued doubles: sums are exact under any grouping order,
    // so the two plans must agree bit-for-bit.
    val rows = (1 to 500).map(i => ("hot", i.toLong, i.toDouble)) ++
      Seq(("a", 501L, 1.0), ("b", 502L, 2.0), ("b", 503L, 3.0))
    val df = rows.toDF("k", "id", "v").repartition(5)
    val got = SkewTools
      .saltedSumCount(df, "k", "v", salts = 8, saltByCols = Seq("id"))
      .as[(String, Long, Double)].collect().toSet
    val want = df.groupBy("k")
      .agg(count(lit(1)).cast("long").as("n"), sum("v").as("sum"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
  }

  test("winnowing fingerprints: reference parity and the shared-run guarantee") {
    val P = graft.functions.TextHash.P
    // Plain-Scala reference: token char-hash → positional 3-gram
    // hashes → per 4-window rightmost minimal → distinct (pos, h).
    def ref(text: String): Set[(Long, Long)] = {
      val th = text.trim.toLowerCase.split("\\s+").toSeq
        .map(_.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % P))
      val gh = th.sliding(3).filter(_.size == 3).toIndexedSeq
        .map(g => g.foldLeft(0L)((h, x) => (h * 31 + x) % P))
      (0 to gh.size - 4).map { i =>
        // min hash; tie -> rightmost position
        val j = (i until i + 4).minBy(j2 => (gh(j2), -(j2)))
        (j.toLong, gh(j))
      }.toSet
    }
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "pack my box with five dozen brown fox jumps over the " +
        "lazy jugs now"),
      (3L, "aa aa aa aa aa aa aa aa")) // all-equal grams: tie path
      .toDF("doc_id", "text")
    val got = operators.TextAnalysis.winnowingFingerprints(docs)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(r => (r._2, r._3)).toSet
      }
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> ("pack my box with five dozen brown fox jumps over the " +
        "lazy jugs now"),
      3L -> "aa aa aa aa aa aa aa aa")
    for ((id, t) <- texts) assert(got(id) == ref(t), s"doc $id")
    // Guarantee: docs 1 and 2 share the 6-token run "brown fox jumps
    // over the lazy" (≥ w + k − 1 = 6), so they MUST share a
    // fingerprint HASH.
    val h1 = got(1L).map(_._2); val h2 = got(2L).map(_._2)
    assert((h1 & h2).nonEmpty)
    // Card consistency: n_fp/fp_sum bind the same sets.
    val card = operators.TextAnalysis.winnowing(docs)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    for ((id, fps) <- got) {
      val fpIds = fps.map { case (pos, h) => pos * P + h }
      assert(card(id)._1 == fpIds.size.toLong, s"doc $id n_fp")
      assert(card(id)._2 ==
        fpIds.toSeq.sorted.foldLeft(0L)((a, x) => (a + x) % P),
        s"doc $id fp_sum")
    }
  }

  test("Kneser-Ney bigram LM matches hand-computed probabilities") {
    // Corpus bigrams: (a,b)×2, (b,a), (b,c).
    //   c(a)=2 N1+(a·)=1; c(b)=2 N1+(b·)=2; T=3 types
    //   N1+(·b)=1, N1+(·a)=1, N1+(·c)=1; D=0.75
    //   P(b|a) = (2−.75)/2 + (.75·1/2)(1/3) = 0.75
    //   P(a|b) = (1−.75)/2 + (.75·2/2)(1/3) = 0.375 = P(c|b)
    val pairs = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"))
      .toDF("prev", "w")
    val got = TextAnalysis.kneserNeyBigramLm(pairs)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a b") - math.log(0.75)) < 1e-12)
    assert(math.abs(got("b a") - math.log(0.375)) < 1e-12)
    assert(math.abs(got("b c") - math.log(0.375)) < 1e-12)
    assert(got.size == 3)
  }

  test("skyline frontier equals brute-force dominance on random data") {
    // Deterministic pseudo-random points with repeated x values and
    // y ties (so both strictness branches and the same-x rule fire),
    // bucketed coarsely enough that the pre-prune crosses bucket
    // boundaries. Reference = O(n²) dominance scan.
    val pts = (1 to 300).map { i =>
      val g = "g" + (i % 3)
      val x = (i * 7919) % 40          // day number, many collisions
      val y = ((i * 104729) % 50).toDouble
      (g, i.toLong, x, y, x / 10)      // bucket = decade of x
    }
    val df = pts.toDF("grp", "id", "x", "y", "bkt")
    val got = operators.Skyline
      .frontier2d(df, "grp", "x", "y", "bkt")
      .select("grp", "id").as[(String, Long)].collect().toSet
    val want = pts.filter { case (g, _, x, y, _) =>
      !pts.exists { case (g2, _, x2, y2, _) =>
        g2 == g && x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map { case (g, id, _, _, _) => (g, id) }.toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("salted join equals the plain join on a hot key") {
    // 400 of 403 big-side rows share one key — the skew shape.
    val big = ((1 to 400).map(i => ("hot", i.toLong)) ++
      Seq(("a", 401L), ("b", 402L), ("c", 403L))).toDF("k", "id")
      .repartition(5)
    val small = Seq(("hot", "H"), ("a", "A"), ("x", "X")).toDF("k", "tag")
    val got = SkewTools.saltedJoin(big, small, "k", salts = 8,
      saltByCols = Seq("id"))
      .select("k", "id", "tag").as[(String, Long, String)].collect()
    val want = big.join(small, Seq("k"))
      .select("k", "id", "tag").as[(String, Long, String)].collect()
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(got.length == 401) // 400 hot matches + ("a",401,"A")
  }

  test("embed near-dup LSH finds the planted near-parallel pair only") {
    val base = (1 to 8).map(_.toDouble)
    val near = base.zipWithIndex.map { case (x, i) => x * (1 + i * 1e-4) }
    val other = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val df = Seq((1L, base), (2L, near), (3L, other))
      .toDF("vec_id", "embedding")
    val got = Similarity.embedNearDupPairs(df, minCos = 0.99)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("nearDupPairsAuto routes by shingle-vocabulary saturation") {
    // Non-saturated (diverse vocabulary, mean df ~1): the router
    // must take the exact inverted-index path bit-for-bit — the
    // regime every correctness SF is in, and what the d54 oracle
    // mirrors.
    val diverse = (1 to 20).map(i => (i.toLong,
      s"alpha$i beta$i gamma$i delta$i eps$i zeta$i")) ++
      Seq((21L, "shared one two three four five six seven"),
        (22L, "shared one two three four five six eight"))
    val dd = diverse.toDF("doc_id", "text")
    val auto = Dedup.nearDupPairsAuto(dd, minJaccard = 0.5)
      .as[(Long, Long, Long)].collect().toSet
    val direct = Dedup.ngramJaccardPairs(dd, minJaccard = 0.5)
      .as[(Long, Long, Long)].collect().toSet
    assert(auto == direct)
    assert(auto.exists { case (a, b, _) => (a, b) == (21L, 22L) })

    // Saturated (3-word soup, every shingle's df far over the cap):
    // the direct path's df-cap excludes EVERY shingle from candidate
    // generation — zero pairs, the silent-quadratic/zero-recall
    // regime — while the df-independent LSH path still pairs the
    // identical docs. The router finding them proves it switched.
    val soup = (1 to 30).map(i => (i.toLong, "a b c a b c a b"))
    val sd = soup.toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(sd, minJaccard = 0.9,
      maxShingleDf = 4).isEmpty)
    val routed = Dedup.nearDupPairsAuto(sd, minJaccard = 0.9,
      maxShingleDf = 4)
    assert(routed.count() == 30L * 29 / 2)
    // The routed variant EMITS the decision (round-15 advice): a
    // constant route column naming the recall regime, one value per
    // corpus — 'direct' below saturation, 'lsh' at it.
    assert(Dedup.nearDupPairsAutoRouted(dd, minJaccard = 0.5)
      .select("route").distinct().as[String].collect().toSeq ==
      Seq("direct"))
    assert(Dedup.nearDupPairsAutoRouted(sd, minJaccard = 0.9,
      maxShingleDf = 4)
      .select("route").distinct().as[String].collect().toSeq ==
      Seq("lsh"))
    spark.catalog.clearCache() // both pair paths are caller-releases
  }

  test("embed near-dup LSH widens bands past the corpus threshold") {
    // Above EmbedBandWidenN rows the band layout switches 8×8 →
    // 4×16 bits (the round-12 sf1.0 scale fix). A planted positive
    // per-dim rescale keeps every sign bit, so the pair still
    // collides in EVERY band at the wide width — recall survives the
    // widening — while the 12k filler rows (deterministic ±1-ish
    // soup at mutual cosine ≪ 0.99) verify nothing else surfaces.
    val n = (graft.functions.TextHash.EmbedBandWidenN + 2000).toInt
    val filler = (10 to n).map { i =>
      (i.toLong, (0 until 8).map(d =>
        math.sin(i * 37.0 + d * 101.0) + 1e-3 * d).toSeq)
    }
    val base = (1 to 8).map(_.toDouble)
    val near = base.zipWithIndex.map { case (x, i) => x * (1 + i * 1e-4) }
    val df = (Seq((1L, base), (2L, near.toSeq)) ++ filler)
      .toDF("vec_id", "embedding")
    val got = Similarity.embedNearDupPairs(df, minCos = 0.999999)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(got.forall { case (a, b) => a == 1L && b == 2L || a >= 10L })
  }

  test("embed near-dup LSH: two-word 4×32 tier keeps the verified pair set") {
    // Past EmbedBandWiden2N the signature grows a second 64-plane
    // word and bands become 4×32 across the 128 bits. The output is
    // cosine-VERIFIED pairs, so tier choice may only lose recall —
    // never add rows. Forcing each tier on the same fixture and
    // pinning set-equality against the exact brute-force pair set
    // proves the wide tier loses nothing (planted near-dups flip
    // ~0 sign bits, so every band stays clean).
    val base = (1 to 8).map(_.toDouble)
    val fixture = (1 to 40).map { i =>
      (i.toLong, (0 until 8).map(d =>
        math.sin(i * 37.0 + d * 101.0) + 1e-3 * d).toSeq)
    } ++ Seq((101L, base), (102L,
      base.zipWithIndex.map { case (x, i) => x * (1 + i * 1e-4) }))
    val df = fixture.toDF("vec_id", "embedding")
    def run(widenAt: Long, widen2At: Long) =
      Similarity.embedNearDupPairs(df, minCos = 0.99, widenAt, widen2At)
        .select("va", "vb", "cos_e6")
        .as[(Long, Long, Long)].collect().toSet
    val narrow = run(widenAt = 1000, widen2At = 100000) // 8×8 tier
    val wide16 = run(widenAt = 1, widen2At = 100000)    // 4×16 tier
    val wide32 = run(widenAt = 1, widen2At = 1)         // 4×32 two-word
    assert(narrow.exists { case (a, b, _) => (a, b) == (101L, 102L) })
    assert(wide16 == narrow)
    assert(wide32 == narrow)
    // The second word is a DIFFERENT 64-plane projection (planes
    // 64-127): a same-sign fixture vector must not share it with
    // word 0 in general.
    import graft.functions.TextHashExprs.{embed_simhash, embed_simhash2}
    val words = df.select(embed_simhash(col("embedding")).as("s1"),
      embed_simhash2(col("embedding")).as("s2"))
    assert(words.filter(col("s1") =!= col("s2")).count() > 0)
    spark.catalog.clearCache() // embedNearDupPairs is caller-releases
  }

  test("embed near-dup LSH: 4×32 tier measured on scattered sign-bit flips") {
    // The round-13 advice gap: the two-word tier test only planted
    // ~0-flip near-dups, so the documented probabilistic tail (a
    // ≥ minCos pair whose flips land in all four bands is dropped)
    // was never measured. Here a deterministic perturbation search
    // finds real multi-bit-flip pairs and pins BOTH sides of the
    // band law: ≥ 1 clean band ⇒ the pair survives; all four bands
    // dirty ⇒ the pair drops (the recall tail, now visible).
    import graft.functions.TextHashExprs.{embed_simhash, embed_simhash2}
    val base = (1 to 8).map(_.toDouble)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    // One kernel pass computes both signature words for every
    // perturbation candidate; bands are the operator's exact 4×32
    // layout (sig lo/hi, sig2 lo/hi).
    val perts = (1 to 120).map { t =>
      val eps = t * 0.02
      (t.toLong, base.updated(2, base(2) - eps)
        .updated(5, base(5) + 0.7 * eps))
    }
    val sigRows = (perts :+ (0L, base))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), embed_simhash(col("embedding")).as("s1"),
        embed_simhash2(col("embedding")).as("s2"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def bands(s: (Long, Long)): Seq[Long] = Seq(
      s._1 & 0xFFFFFFFFL, (s._1 >>> 32) & 0xFFFFFFFFL,
      s._2 & 0xFFFFFFFFL, (s._2 >>> 32) & 0xFFFFFFFFL)
    val b0 = bands(sigRows(0L))
    def flips(t: Long): Int = {
      val (s1, s2) = sigRows(t)
      val (r1, r2) = sigRows(0L)
      java.lang.Long.bitCount(s1 ^ r1) + java.lang.Long.bitCount(s2 ^ r2)
    }
    def cleanBands(t: Long): Int =
      bands(sigRows(t)).zip(b0).count { case (x, y) => x == y }
    def eligible(t: Long): Boolean = cos(base, perts(t.toInt - 1)._2) >= 0.99
    val survivor = perts.map(_._1).find(t =>
      eligible(t) && flips(t) >= 2 && cleanBands(t) >= 1)
    val dropped = perts.map(_._1).find(t =>
      eligible(t) && flips(t) >= 4 && cleanBands(t) == 0)
    assert(survivor.nonEmpty,
      "search found no ≥2-flip pair with a clean band — widen the range")
    def run(ids: Seq[Long]) = Similarity.embedNearDupPairs(
        (Seq((0L, base)) ++ ids.map(t => (t, perts(t.toInt - 1)._2)))
          .toDF("vec_id", "embedding"),
        minCos = 0.99, widenAt = 1, widen2At = 1)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    assert(run(Seq(survivor.get)) == Set((0L, survivor.get)),
      s"pair with ${flips(survivor.get)} flips and " +
        s"${cleanBands(survivor.get)} clean bands must survive 4×32")
    // The tail, measured: a ≥ minCos pair whose flips dirty all four
    // bands IS dropped by candidate generation — the documented
    // probabilistic recall loss, pinned instead of hand-waved.
    dropped.foreach { t =>
      assert(run(Seq(t)).isEmpty,
        s"all-bands-dirty pair (${flips(t)} flips) must drop")
    }
    spark.catalog.clearCache() // embedNearDupPairs is caller-releases
  }

  test("decontaminate matches whole-token runs only, skips self-matches") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta iota"), // probe src
      (2L, "x alpha beta gamma delta eps zeta eta theta y"),  // aligned hit
      (3L, "xalpha beta gamma delta eps zeta eta theta"), // mid-token: miss
      (4L, "alpha beta gamma delta eps zeta eta"),        // 7 tokens: miss
      (5L, "completely unrelated words here and more of them too"))
      .toDF("doc_id", "norm")
    val probes = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta")).toDF(
      "probe_src", "probe")
    val got = operators.Decontaminate.matches(corpus, probes, n = 8)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 1L)))

    // A malformed (too-short) probe must match nothing, not throw
    // (ANSI element_at on its empty gram array would).
    val short = Seq((9L, "alpha beta")).toDF("probe_src", "probe")
    assert(operators.Decontaminate.matches(corpus, short, n = 8)
      .count() == 0)
  }

  test("randomized decontaminate: equals brute-force aligned containment") {
    val rnd = new scala.util.Random(19L)
    val vocab = (1 to 12).map(i => s"w$i")
    def randDoc(len: Int) =
      (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 1 to 4) {
      val corpus = (1L to 40L).map(id => (id, randDoc(6 + rnd.nextInt(10))))
      // Probes: 4-token windows lifted from random docs (small vocab
      // makes cross-doc hits likely).
      val probes = (1 to 6).map { i =>
        val (src, text) = corpus(rnd.nextInt(corpus.size))
        val toks = text.split(" ")
        val at = rnd.nextInt(math.max(1, toks.length - 3))
        (src, toks.slice(at, at + 4).mkString(" "))
      }.distinct
      val got = operators.Decontaminate.matches(
          corpus.toDF("doc_id", "norm"), probes.toDF("probe_src", "probe"),
          n = 4)
        .as[(Long, Long)].collect().toSet
      val want = (for {
        (id, norm) <- corpus
        (src, probe) <- probes
        if id != src && s" $norm ".contains(s" $probe ")
      } yield (id, src)).toSet
      assert(got == want, s"round $round")
    }
  }

  test("randomized line dedup: equals brute-force document reassembly") {
    val rnd = new scala.util.Random(23L)
    val lines = (1 to 8).map(i => s"line $i")
    for (round <- 1 to 4) {
      val docs = (1L to 25L).map { id =>
        (id, (1 to 1 + rnd.nextInt(5))
          .map(_ => lines(rnd.nextInt(lines.size))).mkString("\n"))
      }
      val cap = 1 + rnd.nextInt(4)
      val got = Dedup.lineDedup(docs.toDF("doc_id", "text"), cap)
        .select("doc_id", "n_lines", "n_kept")
        .as[(Long, Long, Long)].collect().toSet
      val df = docs.flatMap { case (id, t) =>
        t.split("\n", -1).map(l => (id, l.toLowerCase.trim))
      }.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
      val want = docs.flatMap { case (id, t) =>
        val all = t.split("\n", -1)
        val kept = all.filter(l => df(l.toLowerCase.trim) <= cap)
        if (kept.isEmpty) None
        else Some((id, all.length.toLong, kept.length.toLong))
      }.toSet
      assert(got == want, s"round $round cap=$cap")
    }
  }

  test("sessionize splits on gaps > threshold") {
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(50)), // gap 40 min -> new session
      (2L, ts(5))).toDF("user_id", "ts")
    val got = Sessionize(events, "user_id", "ts", gapMicros = 1800L * 1000000L)
      .select("user_id", "session_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(1L) == Seq(1L, 1L, 2L))
    assert(got(2L) == Seq(1L))
  }

  test("exact dedup keeps min doc_id per duplicate group") {
    val docs = Seq((5L, "Hello World"), (2L, "hello  world!"),
      (9L, "  hello world  "), (7L, "unique")).toDF("doc_id", "text")
    val got = Dedup.exactDupGroups(docs).as[(Long, Long)].collect().toSet
    // "hello world" (5, 9) normalize equal; "hello  world!" differs.
    assert(got == Set((5L, 2L)))
  }

  test("minhash LSH finds a heavily-overlapping pair") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val far = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, minJaccard = 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("incremental dedup finds delta-vs-corpus matches only") {
    val corpus = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (2L, (100 to 140).map(i => s"w$i").mkString(" ")),
      (3L, (200 to 240).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val delta = Seq(
      // near-copy of corpus doc 1 (one token changed)
      (11L, ((1 to 39).map(i => s"tok$i") :+ "tokX").mkString(" ")),
      // genuinely new
      (12L, (300 to 340).map(i => s"q$i").mkString(" ")),
      // near-copies of EACH OTHER but of nothing in the corpus:
      // the delta-vs-corpus join must NOT pair delta docs together
      (13L, (400 to 440).map(i => s"p$i").mkString(" ")),
      (14L, (400 to 440).map(i => s"p$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.minhashLshAgainst(delta, corpus, minJaccard = 0.5)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == Set((11L, 1L)))
  }

  test("simhash pair generation equals brute force on a small corpus") {
    val docs = (1L to 30L).map(i =>
      (i, (0 to 20).map(j => s"w${(i * 7 + j) % 25}").mkString(" ")))
      .toDF("doc_id", "text")
    val viaBands = Dedup.simhashPairs(docs, maxHamming = 2)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val fps = Dedup.simhashFingerprints(docs).as[(Long, Long)].collect()
    val brute = (for {
      (da, fa) <- fps; (db, fb) <- fps
      if da < db && java.lang.Long.bitCount(fa ^ fb) <= 2
    } yield (da, db)).toSet
    assert(viaBands == brute)
  }

  test("line dedup drops boilerplate lines, reassembles the rest in order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha\nfooter text"),
      (2L, "cookie banner\nunique beta\nfooter text"),
      (3L, "Cookie Banner \nunique gamma\nfooter text"),
      (4L, "cookie banner")).toDF("doc_id", "text")
    // normalized 'cookie banner' df=4 and 'footer text' df=3 exceed
    // the cap (2) -> dropped; unique body lines kept; doc 4 was all
    // boilerplate and disappears.
    val got = Dedup.lineDedup(docs, maxLineDocFreq = 2)
      .select("doc_id", "n_lines", "n_kept", "kept_md5")
      .as[(Long, Long, Long, String)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSet ==
      Set((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 1L)))
    assert(got.map(_._4).distinct.length == 3) // distinct kept bodies
  }

  test("tfidf ranks rare terms above common ones, scaled-integer order") {
    val docs = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple")).toDF("doc_id", "text")
    // df: apple 3 (idf ln(1)=0), banana 1, cherry 1.
    val got = TextAnalysis.tfidfTopTerms(docs, nDocs = 3, k = 2)
      .select("doc_id", "rank", "token").as[(Long, Long, String)]
      .collect().toSet
    assert(got == Set(
      (1L, 1L, "banana"), (1L, 2L, "apple"),
      (2L, 1L, "cherry"), (2L, 2L, "apple"),
      (3L, 1L, "apple")))
  }

  test("heavy hitters sketch: guaranteed recall, bounded undercount") {
    import graft.functions.HeavyHittersSketch.heavy_hitters
    val k = 8
    // 3 planted heavy items (2000 each) in a 6000-item tail spread
    // over 400 distinct values: N = 12000, bound N/(k+1) ≈ 1333.
    val rnd = new scala.util.Random(3L)
    val items = (Seq.fill(2000)("hot1") ++ Seq.fill(2000)("hot2") ++
      Seq.fill(2000)("hot3") ++
      Seq.fill(6000)(s"tail${rnd.nextInt(400)}"))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 32)) {
      val sketch = items.toDF("token").repartition(parts)
        .agg(heavy_hitters(col("token"), k).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.lower_bound"))
        .as[(String, Long)].collect().toMap
      assert(sketch.size <= k)
      val bound = items.size / (k + 1)
      for (hot <- Seq("hot1", "hot2", "hot3")) {
        assert(sketch.contains(hot), s"$hot missing at parts=$parts")
        assert(sketch(hot) <= truth(hot), s"$hot overcounted")
        assert(truth(hot) - sketch(hot) <= bound,
          s"$hot undercount ${truth(hot) - sketch(hot)} > $bound")
      }
    }
  }

  test("language ID and quality score") {
    val docs = Seq((1L, "the cat sat on a mat"), (2L, "wort wort wort wort"))
      .toDF("doc_id", "text")
    val lang = TextAnalysis.langId(docs)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    assert(lang(1L) == "en" && lang(2L) == "und")
    val q = TextAnalysis.quality(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    assert(q.values.forall(s => s >= 0.0 && s <= 1.0))
    // Repetitive doc 2 has lower TTR -> lower score despite no stopwords.
    assert(q(1L) > 0.5)
  }

  test("chunking: overlapping windows cover every token, short tail kept") {
    val docs = Seq((1L, (1 to 50).map(i => s"t$i").mkString(" ")),
      (2L, "tiny doc")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, chunkTokens = 32, stride = 24)
      .select("doc_id", "chunk_idx", "n_chunk_tokens")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // 50 tokens: chunks at 0 (32 tokens), 24 (26 tokens), 48 (2).
    assert(got == Seq((1L, 0L, 32L), (1L, 1L, 26L), (1L, 2L, 2L),
      (2L, 0L, 2L)))
  }

  test("token counts: whitespace vs BPE-ish") {
    val docs = Seq((1L, "Hello, world! abc123")).toDF("doc_id", "text")
    val (ws, bpe) = TextAnalysis.tokenCounts(docs)
      .select("ws_tokens", "bpe_tokens").as[(Long, Long)].head()
    assert(ws == 3)
    // hello , world ! abc 123 -> 6
    assert(bpe == 6)
  }

  test("cosine_sim: native expression and SQL registration") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val sims = df.select(cosine_sim(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(sims(0) - 1.0) < 1e-15)
    assert(math.abs(sims(1)) < 1e-15)
    assert(math.abs(sims(2) - 1.0) < 1e-15)
    // SQL path through GraftExtensions:
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT cosine_sim(a, b) FROM vecs")
      .as[Double].collect()
    assert(viaSql.zip(sims).forall { case (x, y) => x == y })
  }

  test("brute-force top-k ranks by similarity then id") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), 2)
      .select("rank", "cand_id").as[(Int, Long)].collect().toSeq.sorted
    assert(got == Seq((1, 3L), (2, 1L))) // exact match first, then closest
  }

  test("kmeans separates planted clusters; assignment is true argmax") {
    // Two tight cones around orthogonal axes, small last-dim jitter.
    def mk(base: Seq[Double], i: Int) =
      base.updated(3, 0.01 * (i % 5 + 1))
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.0)
    val rows = (0 until 10).map(i => (i.toLong, mk(a, i))) ++
      (10 until 20).map(i => (i.toLong, mk(b, i)))
    val emb = rows.toDF("vec_id", "embedding")
    val cent = KMeans.train(emb, k = 2, iters = 3)
    val cvecs = cent.as[(Long, Seq[Double])].collect().toMap
    assert(cvecs.size == 2)
    val assigned = KMeans.assign(emb, cent)
      .as[(Long, Long)].collect().toMap
    // Assignment must be the exact cosine argmax against the learned
    // centroids (tie -> lowest cell), independent of partitioning.
    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) * math.sqrt(y.map(q => q * q).sum))
    }
    for ((id, v) <- rows) {
      val best = cvecs.toSeq
        .map { case (c, cv) => (cos(v, cv), c) }
        .sortBy { case (s, c) => (-s, c) }.head._2
      assert(assigned(id) == best, s"vec $id")
    }
    // The planted structure is linearly separable and k-means with 2
    // cells lands on it: each cone is one cell.
    assert((0L until 10L).map(assigned).toSet.size == 1)
    assert((10L until 20L).map(assigned).toSet.size == 1)
    assert(assigned(0L) != assigned(10L))
    // Determinism across partitionings.
    val again = KMeans.assign(emb.repartition(7),
      KMeans.train(emb.repartition(5), k = 2, iters = 3))
      .as[(Long, Long)].collect().toMap
    assert(again == assigned)
  }

  test("seedsPlusPlus: farthest-point greedy, hand-checked on 3 cones") {
    // Three orthogonal cones; anchors at ids 0/10/20. Seed 1 is the
    // smallest id; seeds 2 and 3 must land in the OTHER two cones
    // (farthest-point spreads across clusters where hash seeding
    // can't promise to).
    def mk(base: Seq[Double], i: Int) =
      base.updated(3, 0.01 * (i % 5 + 1))
    val axes = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    val rows = for {
      (ax, g) <- axes.zipWithIndex
      i <- 0 until 10
    } yield ((g * 10 + i).toLong, mk(ax, i))
    val emb = rows.toDF("vec_id", "embedding")
    val seeds = KMeans.seedsPlusPlus(emb, k = 3)
      .select("step", "vec_id", "dist_e6")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(seeds(0) == ((1, 0L, 0L)))
    // One seed per cone, order-independent of which cone goes second.
    val cones = seeds.map(_._2 / 10).toSet
    assert(cones == Set(0L, 1L, 2L))
    // Later picks can only be nearer to the chosen set: greedy
    // farthest-point distances are non-increasing.
    assert(seeds(1)._3 >= seeds(2)._3)
    // Near-orthogonal cones: both later picks are far (dist ≈ 1e6).
    assert(seeds(1)._3 > 900000L && seeds(2)._3 > 900000L)
    // Determinism across partitionings.
    val again = KMeans.seedsPlusPlus(emb.repartition(7), k = 3)
      .select("step", "vec_id", "dist_e6")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == seeds.toSeq)
  }

  test("SQL registration: sketch aggregates usable from spark.sql") {
    Seq((1L, "a"), (2L, "b"), (2L, "b"), (7L, "a"), (5L, "c"))
      .toDF("h", "item").createOrReplaceTempView("sk_sql_t")
    val kmv = spark.sql(
        "SELECT kmv_sketch(h, 3) AS s FROM sk_sql_t")
      .select(explode(col("s"))).as[Long].collect().toSeq
    assert(kmv == Seq(1L, 2L, 5L)) // 3 smallest DISTINCT
    val hh = spark.sql(
        "SELECT heavy_hitters(item, 8) AS s FROM sk_sql_t")
      .select(explode(col("s")).as("e"))
      .select("e.item", "e.lower_bound")
      .as[(String, Long)].collect().toSet
    assert(hh == Set(("a", 2L), ("b", 2L), ("c", 1L)))
  }

  test("kmv sketch keeps the k smallest distinct values, any partitioning") {
    import graft.functions.KmvSketch.kmv_sketch
    val values = (1L to 500L).map(_ * 7919L % 10007L) // dups included
    val want = values.distinct.sorted.take(16)
    for (parts <- Seq(1, 7)) {
      val got = values.toDF("h").repartition(parts)
        .agg(kmv_sketch(col("h"), 16).as("kmv"))
        .select(explode(col("kmv")).as("v"))
        .as[Long].collect().toSeq
      assert(got == want, s"parts=$parts")
    }
  }

  test("weighted sample: deterministic A-ES race, weights steer selection") {
    import graft.operators.Sampling
    val rows = (1L to 200L).map(i =>
      (i, if (i == 5L) 1000000000L else 10L)) // one giant weight
    def run(parts: Int): Seq[Long] =
      Sampling.weightedSample(
          rows.toDF("doc_id", "w").repartition(parts), "doc_id", "w", 20)
        .select("doc_id").as[Long].collect().toSeq.sorted
    val a = run(1)
    assert(a == run(7), "selection is partitioning-independent")
    assert(a.contains(5L), "the dominant weight wins a slot")
    assert(a.length == 20)
    // non-positive weights are excluded from the race entirely
    val withZero = (rows :+ ((201L, 0L)) :+ ((202L, -3L)))
      .toDF("doc_id", "w")
    val sel = Sampling.weightedSample(withZero, "doc_id", "w", 300)
      .select("doc_id").as[Long].collect().toSet
    assert(!sel.contains(201L) && !sel.contains(202L))
    assert(sel.size == 200)
  }

  test("hll sketch: registers match plain-Scala ref, any partitioning/dups") {
    import graft.functions.HllSketch.hll_sketch
    val values = (1L to 500L).map(_ * 2654435761L % 4294967296L)
    // plain-Scala register reference (the HllSketch scaladoc contract)
    val want = {
      val regs = new Array[Int](64)
      for (h <- values) {
        val j = (h >>> 26).toInt
        val w = h & ((1L << 26) - 1)
        val rho = if (w == 0L) 27
          else 27 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      regs.toSeq
    }
    // duplicates must not move any register; nor may partitioning
    for (parts <- Seq(1, 7)) {
      val got = (values ++ values.take(200)).toDF("h").repartition(parts)
        .agg(hll_sketch(col("h"), 6).as("regs"))
        .select(explode(col("regs")).as("r"))
        .as[Int].collect().toSeq
      assert(got == want, s"parts=$parts")
    }
    // SQL registration path agrees
    values.toDF("h").createOrReplaceTempView("hll_sql_t")
    val viaSql = spark.sql("SELECT hll_sketch(h, 6) AS s FROM hll_sql_t")
      .select(explode(col("s"))).as[Int].collect().toSeq
    assert(viaSql == want)
  }

  test("sequence packing: gapless shard-local placement, straddles kept") {
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 7 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, seqTokens = 10, shards = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 40)
    for ((_, shard, _, seqId, off) <- got)
      assert(shard >= 0 && shard < 3 && off >= 0 && off < 10 && seqId >= 0)
    // Gapless concat stream per shard: every doc starts exactly where
    // the previous one (in doc_id order) ended.
    for ((_, rows) <- got.groupBy(_._2)) {
      var expectStart = 0L
      for ((_, _, n, seqId, off) <- rows.sortBy(_._1)) {
        assert(seqId * 10 + off == expectStart)
        expectStart += n
      }
    }
    // Deterministic across partitionings (pure hash + window).
    val again = TextAnalysis.packSequences(docs.repartition(7), 10, 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("FFD packing: valid non-straddling placements, beats hash-order first-fit") {
    val cap = 10
    val docs = (1L to 40L).map(i =>
      (i, (1 to (i % 7 + 1).toInt).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequencesFfd(docs, seqTokens = cap,
        shards = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 40)
    // Every placement fits whole: offset + len <= cap, and per-shard
    // sequence fills never exceed cap.
    val fills = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, shard, n, seqId, off) <- got) {
      val l = math.min(n, cap.toLong)
      assert(off >= 0 && off + l <= cap, s"doc straddles: off=$off l=$l")
      fills((shard, seqId)) = fills.getOrElse((shard, seqId), 0L) + l
    }
    assert(fills.values.forall(_ <= cap))
    // First-fit property: each doc's offset equals the fill of its
    // sequence among docs placed BEFORE it in (len DESC, doc_id)
    // order — replay the fold on the driver and compare exactly.
    for ((shard, rows) <- got.groupBy(_._2)) {
      val ordered = rows.sortBy(r => (-math.min(r._3, cap.toLong), r._1))
      val used = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, _, n, seqId, off) <- ordered) {
        val l = math.min(n, cap.toLong)
        val fi = used.indexWhere(_ + l <= cap)
        if (fi < 0) {
          assert(seqId == used.length && off == 0L)
          used += l
        } else {
          assert(seqId == fi && off == used(fi))
          used(fi) += l
        }
      }
    }
    // FFD uses no more sequences than first-fit in hash (doc_id)
    // order — the d25-style arrival order — on every shard.
    for ((shard, rows) <- got.groupBy(_._2)) {
      val ffdSeqs = rows.map(_._4).distinct.length
      val arrival = rows.sortBy(_._1)
      val used = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((_, _, n, _, _) <- arrival) {
        val l = math.min(n, cap.toLong)
        val fi = used.indexWhere(_ + l <= cap)
        if (fi < 0) used += l else used(fi) += l
      }
      assert(ffdSeqs <= used.length,
        s"shard $shard: FFD used $ffdSeqs seqs vs first-fit ${used.length}")
    }
    // Deterministic across partitionings (pure hash + fold).
    val again = TextAnalysis.packSequencesFfd(docs.repartition(7),
        cap, 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("ExactPercentile matches the built-in percentile bit-for-bit") {
    // The scale-safe cumulative pick must reproduce Catalyst's
    // Percentile interpolation EXACTLY — including both of its
    // no-interpolation shortcuts (integer position; equal adjacent
    // values) — on ties, singleton groups, and uneven group sizes.
    val rows = Seq(
      ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 10.0),
      ("a", 11.5), ("a", 13.25),
      ("b", 5.0),                       // singleton group
      ("c", 3.0), ("c", 3.0), ("c", 3.0), ("c", 7.0),
      ("d", -2.5), ("d", 0.0), ("d", 4.0), ("d", 4.0), ("d", 9.0),
      ("d", 9.0), ("d", 9.0), ("d", 100.0))
    val df = rows.toDF("g", "v")
    for (p <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val builtin = df.groupBy("g")
        .agg(expr(s"percentile(v, $p)").as("want"))
        .as[(String, Double)].collect().toMap
      val got = graft.operators.ExactPercentile
        .grouped(df, Seq("g"), "v", Seq("got" -> p))
        .select(col("g"), col("got"))
        .as[(String, Double)].collect().toMap
      assert(got.keySet == builtin.keySet)
      for ((g, want) <- builtin)
        assert(java.lang.Double.doubleToLongBits(got(g)) ==
          java.lang.Double.doubleToLongBits(want),
          s"p=$p g=$g: got ${got(g)}, built-in $want")
    }
    // Long values (the d24 shape) widen to double identically.
    val dl = Seq(("x", 1L), ("x", 2L), ("x", 4L), ("x", 8L), ("y", 3L))
      .toDF("g", "v")
    val wantL = dl.groupBy("g").agg(expr("percentile(v, 0.1)").as("w"))
      .as[(String, Double)].collect().toMap
    val gotL = graft.operators.ExactPercentile
      .grouped(dl, Seq("g"), "v", Seq("w" -> 0.1))
      .select(col("g"), col("w")).as[(String, Double)].collect().toMap
    assert(gotL == wantL)
    // All-NULL groups: the built-in KEEPS the group with a NULL
    // percentile; the scale-safe plan must not silently drop it.
    val dn = Seq(("p", Some(1.0)), ("p", Some(3.0)),
      ("q", None), ("q", None)).toDF("g", "v")
    val gotN = graft.operators.ExactPercentile
      .grouped(dn, Seq("g"), "v", Seq("m" -> 0.5))
      .select("g", "m", "n")
      .as[(String, Option[Double], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotN("p") == ((Some(2.0), 2L)))
    assert(gotN("q") == ((None, 0L)), "all-NULL group must survive")
  }

  test("nearest-centroid kernel: float inputs, ties to lowest cell") {
    import graft.functions.NearestCentroidCell.nearest_centroid
    // Float corpus (the raw embeddings table type) against double
    // centroids — the kernel must widen exactly like CosineSimilarity.
    // Cells 5 and 9 are the same direction at a power-of-2 scale, so
    // their cosines are BIT-identical for every query (numerator and
    // denominator both scale by exactly 2): a guaranteed tie that
    // must resolve to the lowest cell.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // ties 5/9 at cos 1 -> 5
      (1L, Array(0.0f, 2.0f)),   // cell 7 wins at cos 1
      (2L, Array(1.0f, 1.0f)))   // three-way tie at 1/sqrt(2) -> 5
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (9L, Array(4.0, 0.0)),     // deliberately unsorted input order
      (5L, Array(2.0, 0.0)),
      (7L, Array(0.0, 1.0)))
    val got = emb.select(col("vec_id"),
        nearest_centroid(col("embedding"), cents).as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 5L, 1L -> 7L, 2L -> 5L))
  }

  test("nearest-centroid kernel: all-NaN cosines keep the first cell") {
    import graft.functions.NearestCentroidCell.nearest_centroid
    // A zero-norm embedding makes every cosine 0/0 = NaN. Catalyst's
    // nanSafeCompareDoubles treats NaN == NaN, so the GreaterThan fold
    // this kernel replaces never updates the argmax — the FIRST
    // (lowest) cell must win, matching the oracle's (cos DESC, cell
    // ASC) rule. A zero centroid triggers the same NaN on one cell
    // only; NaN ranks above every real cosine in Spark's ordering, so
    // that cell must win for a normal embedding.
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)),   // zero-norm query: all cosines NaN -> cell 3
      (1L, Array(1.0f, 0.0f)))   // real query: NaN cell 8 outranks cos 1 -> 8
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (3L, Array(1.0, 0.0)),
      (8L, Array(0.0, 0.0)),     // zero centroid: cosine NaN for everyone
      (5L, Array(0.0, 1.0)))
    val got = emb.select(col("vec_id"),
        nearest_centroid(col("embedding"), cents).as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 8L))
  }

  test("nearest-cells kernel: probe order, ties, and short tables") {
    import graft.functions.NearestCentroidCell.nearest_cells
    // Same tie construction as the nearest-centroid test: cells 5/9
    // are one direction at a power-of-2 scale (bit-identical cosine
    // for every query), so the probe list must keep 5 BEFORE 9 —
    // ties resolve ascending WITHIN the order, not just at rank 1.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // cos: 5=1, 9=1, 7=0 -> [5, 9]
      (1L, Array(0.0f, 2.0f)),   // cos: 7=1, 5=0, 9=0 -> [7, 5]
      (2L, Array(1.0f, 1.0f)))   // three-way tie -> [5, 7] (asc)
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (9L, Array(4.0, 0.0)),     // deliberately unsorted input order
      (5L, Array(2.0, 0.0)),
      (7L, Array(0.0, 1.0)))
    val got = emb.select(col("vec_id"),
        nearest_cells(col("embedding"), cents, 2).as("cs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(0L -> Seq(5L, 9L), 1L -> Seq(7L, 5L),
      2L -> Seq(5L, 7L)))
    // nprobe beyond the table returns ALL cells, in probe order —
    // the slice(array_sort(..), 1, nprobe) behavior it replaces.
    val all = emb.filter(col("vec_id") === 1L)
      .select(nearest_cells(col("embedding"), cents, 10).as("cs"))
      .as[Seq[Long]].collect().head
    assert(all == Seq(7L, 5L, 9L))
  }

  test("nearest-cells kernel: NaN cosines rank first (oracle order)") {
    import graft.functions.NearestCentroidCell.nearest_cells
    // Spark SQL / DuckDB both rank NaN above every real value in a
    // DESC order; the kernel's gtSparkSql comparison must agree (the
    // array_sort formulation this kernel replaced ranked NaN last —
    // the one corner where it diverged from the oracle).
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)),   // zero-norm: ALL NaN tie -> cells asc [3, 5]
      (1L, Array(1.0f, 0.0f)))   // NaN cell 8 outranks cos 1 -> [8, 3]
      .toDF("vec_id", "embedding")
    val cents = Seq(
      (3L, Array(1.0, 0.0)),
      (8L, Array(0.0, 0.0)),     // zero centroid: cosine NaN for everyone
      (5L, Array(0.0, 1.0)))
    val got = emb.select(col("vec_id"),
        nearest_cells(col("embedding"), cents, 2).as("cs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(0L -> Seq(3L, 5L), 1L -> Seq(8L, 3L)))
  }

  test("nearest-cells-routed kernel: hierarchy, masking, global ties") {
    import graft.functions.NearestCentroidCell.nearest_cells_routed
    // Two coarse groups on the axes; fine cells 2/4 under coarse 0
    // (x-ish), 6/8 under coarse 1 (y-ish). cprobe=1 masks the other
    // group's fine cells even when one of them would be globally
    // 2nd-nearest — the documented hierarchy approximation.
    val coarse = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
    val fine = Seq(
      (2L, Array(1.0, 0.0)), (4L, Array(0.9, 0.1)),
      (6L, Array(0.0, 1.0)), (8L, Array(0.1, 0.9)))
    val owner = Map(2L -> 0L, 4L -> 0L, 6L -> 1L, 8L -> 1L)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // coarse 0 -> fine [2, 4]
      (1L, Array(0.0f, 1.0f)),   // coarse 1 -> fine [6, 8]
      (2L, Array(0.6f, 0.8f)))   // nearest coarse 1 -> [8, 6], NOT 4
      .toDF("vec_id", "embedding")
    val got = emb.select(col("vec_id"),
        nearest_cells_routed(col("embedding"), coarse, fine, owner,
          cprobe = 1, nprobe = 2).as("cs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got == Map(0L -> Seq(2L, 4L), 1L -> Seq(6L, 8L),
      2L -> Seq(8L, 6L)))
    // cprobe=2 unmasks everything: the fine ranking must then be the
    // GLOBAL (cos DESC, cell ASC) order across both groups — for
    // vec 2, fine 8 (cos .85) then 4 (cos .75... beaten by 6? cos .8)
    val got2 = emb.filter(col("vec_id") === 2L)
      .select(nearest_cells_routed(col("embedding"), coarse, fine, owner,
        cprobe = 2, nprobe = 4).as("cs"))
      .as[Seq[Long]].collect().head
    // cosines for (0.6, 0.8): f2=0.6, f4≈0.6844, f6=0.8, f8≈0.8616
    assert(got2 == Seq(8L, 6L, 4L, 2L))
    // Exact ties across DIFFERENT groups resolve to the lower fine
    // cell: for the diagonal query, 4=(0.9,0.1) and 8=(0.1,0.9) are
    // mirror images (bit-identical cosine ≈ .781, the global best)
    // and 2/6 tie behind them at cos(45°) — so the full order is
    // [4, 8, 2, 6], each tie breaking to the lower cell.
    val diag = Seq((9L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val gotTie = diag.select(nearest_cells_routed(col("embedding"),
        coarse, fine, owner, cprobe = 2, nprobe = 4).as("cs"))
      .as[Seq[Long]].collect().head
    assert(gotTie == Seq(4L, 8L, 2L, 6L))
  }

  test("knnGraphRouted degenerates to knnGraphProbed under one coarse group") {
    // With every fine cell in a single selected coarse group the
    // two-level route scores exactly the full fine table — the
    // routed graph must equal the flat probed graph edge-for-edge.
    // 40 vectors / perCell=5 -> 8 fine cells, and cprobe = #coarse
    // forces all groups selected, which is the same degeneration.
    val rnd = new scala.util.Random(23L)
    val rows = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val emb = rows.toDF("vec_id", "embedding")
    val tc = Similarity.trainedCells(emb, perCell = 5)
    val routed = Similarity.knnGraphRouted(tc, "cell", k = 4,
        cprobe = 100, nprobe = 2, coarseIters = 2)
      .collect().toSet
    val flat = Similarity.knnGraphProbed(tc, "cell", k = 4, nprobe = 2)
      .collect().toSet
    assert(routed == flat,
      "cprobe >= ncoarse must reproduce flat probed routing exactly")
  }

  test("routed-kNN recall tracks flat routing within the hierarchy price") {
    // e55's contract, pinned against the flat route on real data:
    // two-level routing may lose fine cells whose coarse group was
    // not selected, but the measured price is a few hits of 30
    // (flat 0.533 vs routed 0.467 recall@3 at sf0.001; 0.567 vs
    // 0.43-0.50 at the larger SFs) — pin that the gap stays bounded
    // (≤ 6 hits of 30) so a routing regression (e.g. a broken mask)
    // cannot hide behind the documented approximation.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, qs, k = 3)
      .select(col("query_id"), col("cand_id"))
    val tc = Similarity.trainedCells(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def hits(g: org.apache.spark.sql.DataFrame): Long =
      g.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("nbr_id").as("cand_id"))
        .join(exact, Seq("query_id", "cand_id")).count()
    val flatHits = hits(
      Similarity.knnGraphProbed(tc, "cell", k = 3, nprobe = 2))
    val routedHits = hits(Similarity.knnGraphRouted(tc, "cell", k = 3,
      cprobe = 2, nprobe = 2, coarseIters = 2))
    tc.unpersist()
    assert(flatHits >= 14, s"flat routing recall collapsed: $flatHits/30")
    assert(routedHits >= flatHits - 6,
      s"two-level routing lost more than the documented hierarchy " +
        s"price: routed $routedHits vs flat $flatHits of 30")
  }

  test("knnGraphProbed: kernel routing matches the array_sort formulation") {
    // Parity pin for the round-16 routing swap: the compiled
    // NearestCellsProbed route must reproduce the previous
    // broadcast + transform + array_sort probe stage edge-for-edge
    // on a trained substrate (real float embeddings, trained cells).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val tc = Similarity.trainedCells(emb)
    val got = Similarity.knnGraphProbed(tc, "cell", k = 4, nprobe = 2)
    val centArr = Similarity.centroidVectors(tc, "cell")
      .agg(array_sort(collect_list(struct(col("label"), col("cvec"))))
        .as("cents"))
    val oldProbes = tc
      .select(col("vec_id"), col("embedding").as("ea"))
      .crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("ea"),
        explode(slice(array_sort(transform(col("cents"), c =>
          struct((-cosine_sim(col("ea"), c.getField("cvec"))).as("neg"),
            c.getField("label").as("label")))), 1, 2)).as("p"))
      .select(col("vec_id"), col("ea"), col("p.label").as("label"))
    val cand = tc.select(col("cell").as("label"),
      col("vec_id").as("nbr_id"), col("embedding").as("eb"))
    val want = oldProbes.join(cand, Seq("label"))
      .filter(col("vec_id") =!= col("nbr_id"))
      .withColumn("sim", cosine_sim(col("ea"), col("eb")))
      .groupBy("vec_id")
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("sim"), col("nbr_id"), lit(0L), 4).as("tk"))
      .select(col("vec_id"), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("vec_id"), (col("pos") + 1).as("rank"),
        col("s.cand_id").as("nbr_id"), round(col("s.sim"), 6).as("sim"))
    assert(got.collect().toSet == want.collect().toSet)
  }

  test("convergence-driven kmeans reaches the fixed-round fixpoint") {
    // On cleanly separated cones Lloyd stabilizes in a few rounds:
    // residual-driven training must land on the same centroids as a
    // generous fixed-round run (both from the same deterministic
    // seeds). Centroids round per iteration, so "equal" is exact.
    def mk(base: Seq[Double], i: Int) = base.updated(3, 0.01 * (i % 5 + 1))
    val a = Seq(1.0, 0.0, 0.0, 0.0)
    val b = Seq(0.0, 1.0, 0.0, 0.0)
    val rows = (0 until 10).map(i => (i.toLong, mk(a, i))) ++
      (10 until 20).map(i => (i.toLong, mk(b, i)))
    val emb = rows.toDF("vec_id", "embedding")
    val conv = KMeans.trainUntilConverged(emb, k = 2, tol = 0.0)
      .as[(Long, Seq[Double])].collect().toMap
    val fixed = KMeans.train(emb, k = 2, iters = 12)
      .as[(Long, Seq[Double])].collect().toMap
    assert(conv == fixed)
  }

  test("beam walk until stable matches a generous fixed-round walk") {
    // The kept beam improves monotonically (each round's pool
    // includes the previous beam), so the stability-driven walk must
    // land on exactly the fixed-round result once rounds are
    // generous — the KMeans.trainUntilConverged contract for the
    // graph-ANN walk. Deterministic synthetic corpus: two loose
    // clusters, so the walk has real hops to make.
    val emb = (0 until 24).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.1f * (i % 5), 0.0f, 0.2f)
                 else Array(0.0f, 0.2f, 1.0f, 0.1f * (i % 7))
      (i.toLong, i % 2, base)
    }.toDF("vec_id", "label", "embedding")
    val g = Similarity.knnGraphProbed(emb, "label", k = 3, nprobe = 2)
      .select(col("vec_id"), col("nbr_id"))
    val med = Similarity.cellMedoids(emb, "label")
    val qs = emb.filter(col("vec_id") < 2)
    val stable = Similarity
      .graphBeamSearchUntilStable(emb, qs, g, med, beamWidth = 4)
      .as[(Long, Long, Long, Double)].collect().toSet
    val fixed = Similarity
      .graphBeamSearch(emb, qs, g, med, beamWidth = 4, rounds = 12)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(stable == fixed)
    assert(stable.nonEmpty)
  }

  test("filtered beam walk: only eligible candidates, full beam, matches post-hoc on reachables") {
    // Same two-cluster corpus as the stability test; the predicate
    // keeps even vec_ids only.
    val emb = (0 until 24).map { i =>
      val base = if (i % 2 == 0) Array(1.0f, 0.1f * (i % 5), 0.0f, 0.2f)
                 else Array(0.0f, 0.2f, 1.0f, 0.1f * (i % 7))
      (i.toLong, i % 2, base)
    }.toDF("vec_id", "label", "embedding")
    val g = Similarity.knnGraphProbed(emb, "label", k = 3, nprobe = 2)
      .select(col("vec_id"), col("nbr_id"))
    val med = Similarity.cellMedoids(emb, "label")
    val qs = emb.filter(col("vec_id") < 2)
    val pred = col("vec_id") % 2 === 0
    val got = Similarity.graphBeamSearchFiltered(emb, qs, g, med,
        beamWidth = 4, rounds = 6, candidatePred = pred)
      .as[(Long, Long, Long, Double)].collect()
    // Every returned candidate is eligible, and each query gets a
    // FULL beam of eligible candidates (11 evens excl. self exist).
    assert(got.forall(_._3 % 2 == 0))
    assert(got.groupBy(_._1).values.forall(_.length == 4))
    // An always-true predicate reduces exactly to the unfiltered
    // walk — the filter changes WHICH rows score, never how.
    val allTrue = Similarity.graphBeamSearchFiltered(emb, qs, g, med,
        beamWidth = 4, rounds = 6, candidatePred = lit(true))
      .as[(Long, Long, Long, Double)].collect().toSet
    val plain = Similarity.graphBeamSearch(emb, qs, g, med,
        beamWidth = 4, rounds = 6)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(allTrue == plain)
  }

  test("navigable graph: reverse edges, degree cap, alpha prune") {
    // Hand-checkable line corpus: vectors along two directions where
    // the α rule provably fires. a=(1,0), b=(0.99,0.14)-ish (near a),
    // c=(0,1): from a's view, b covers nothing about c (cos(b,c)
    // small), but two near-duplicates of b cover EACH OTHER, so the
    // second is pruned.
    val emb = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.99f, 0.141f, 0.0f, 0.0f)),
      (2L, 0, Array(0.99f, 0.140f, 0.0f, 0.0f)),
      (3L, 0, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    // directed kNN: node 0 points at 1, 2, 3 (its sim order); others
    // point only at 0 — reverse edges must give them each other back.
    val knn = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (2L, 0L), (3L, 0L)).toDF("vec_id", "nbr_id")
    val nav = Similarity.navigableGraph(emb, knn, alpha100 = 120,
        maxDegree = 2, maxCandidates = 32)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // node 0's candidates in sim order: 2 (cos≈.99015 — the smaller
    // second component is CLOSER to (1,0)), 1 (cos≈.99001), 3
    // (cos 0). 2 is kept; 1 is pruned (cos(1,2)≈1 ⇒ kept 2 covers
    // 1: 120·(1e6−1e6) ≤ 100·(1e6−990001)); 3 is kept — the α-prune
    // keeps the DIVERSE direction, where a blind top-2 cap would
    // have kept near-duplicate 1 and dropped 3.
    assert(nav(0L) == Seq(2L, 3L))
    assert(nav.values.forall(_.size <= 2))
    // symmetrization: node 3's only candidate is its backlink to 0
    // (the reverse of 0→3), which must survive.
    assert(nav(3L) == Seq(0L))
  }

  test("built navigable graph beats the raw kNN walk at equal degree") {
    // The e30-vs-e26 claim on the round-14 TRAINED substrate, pinned
    // at sf0.01: recall@4 of the beam walk over the e28 build ≥ the
    // same walk over the raw k=16 kNN graph (measured 0.90 vs 0.825
    // here; 0.725 vs 0.675 at sf0.1 — the build's reverse edges add
    // navigability the raw graph lacks, at the same max out-degree).
    // At sf0.001 the relationship INVERTS (0.90 vs 0.95): 500
    // vectors over 8 trained cells make the raw probed graph nearly
    // complete, so the α-prune can only remove useful edges — the
    // small-corpus regime the e43 scaladoc documents. The pin there
    // is a floor, not dominance.
    def avgRecall(key: String, d: String): Double = {
      val rows = SparkEntry.queries(key)(spark, d)
        .select(col("recall_e4")).as[Long].collect()
      rows.sum.toDouble / rows.length
    }
    val d01 = "/root/testdata/sf0.01"
    val raw = avgRecall("e26_graph_recall", d01)
    val built = avgRecall("e30_nav_recall", d01)
    assert(built >= raw,
      s"built-graph walk recall $built fell below raw-kNN walk $raw")
    val builtTiny = avgRecall("e30_nav_recall", "/root/testdata/sf0.001")
    assert(builtTiny >= 8500.0,
      s"sf0.001 built-graph recall floor: $builtTiny")
  }

  test("navigable attach: backlinks make new vectors walk-reachable") {
    // The FreshDiskANN insert contract: attach the delta WITHOUT
    // rebuilding the base graph; 'fwd' rows are the new nodes'
    // pruned adjacency, every fwd edge carries its 'back' twin, and
    // walking base-graph ∪ attach-edges reaches the new node — the
    // backlink is what makes that possible (the base graph alone
    // cannot point at a node it has never seen).
    val mk = (i: Int) =>
      if (i % 2 == 0) Array(1.0f, 0.1f * (i % 5), 0.0f, 0.2f)
      else Array(0.0f, 0.2f, 1.0f, 0.1f * (i % 7))
    val base = (0 until 20).map(i => (i.toLong, i % 2, mk(i)))
      .toDF("vec_id", "label", "embedding")
    val delta = (20 until 26).map(i => (i.toLong, i % 2, mk(i)))
      .toDF("vec_id", "label", "embedding")
    val att = Similarity.navigableAttach(base, delta, "label",
      maxDegree = 4, maxCandidates = 8)
    val rows = att.as[(Long, String, Option[Long], Long, Long)]
      .collect()
    val fwd = rows.filter(_._2 == "fwd")
    val back = rows.filter(_._2 == "back").map(r => (r._4, r._1)).toSet
    assert(fwd.nonEmpty)
    assert(fwd.groupBy(_._1).values.forall(_.length <= 4))
    assert(fwd.forall(r => back.contains((r._1, r._4))),
      "every fwd edge must carry its backlink twin")
    assert(fwd.forall(r => r._1 >= 20 && r._4 < 20),
      "fwd edges go new -> base only")
    // Union graph: base build + attach edges (both directions).
    val baseNav = Similarity.navigableGraph(base,
        Similarity.knnGraphProbed(base, "label", k = 4, nprobe = 2)
          .select(col("vec_id"), col("nbr_id")),
        maxDegree = 4, maxCandidates = 8)
      .select(col("vec_id"), col("nbr_id"))
    val union = baseNav.union(att.select(col("vec_id"), col("nbr_id")))
    // Probe AT an attached vector's position (fresh id so the walk
    // does not self-exclude it): it must land in the beam.
    val probe = Seq((99L, mk(21))).toDF("vec_id", "embedding")
    val all = base.union(delta)
    val found = Similarity.graphBeamSearch(all, probe, union,
        Similarity.cellMedoids(base, "label"), beamWidth = 6,
        rounds = 4)
      .select("cand_id").as[Long].collect().toSet
    assert(found.contains(21L),
      s"attached vector unreachable through the union graph: $found")
  }

  test("centroids average each dimension per cluster") {
    val emb = Seq(
      (0L, 0, Array(1.0f, 3.0f)), (1L, 0, Array(3.0f, 5.0f)),
      (2L, 1, Array(2.0f, 2.0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroids(emb, "label")
      .as[(Int, Int, Double)].collect().toSet
    assert(got == Set((0, 0, 2.0), (0, 1, 4.0), (1, 0, 2.0), (1, 1, 2.0)))
  }

  test("bpe kernel: greedy rank-ordered merges, multi-level composition") {
    import graft.functions.Bpe.bpe_units
    val df = Seq((1L, "the thinking mother esses understanding x.y,"))
      .toDF("doc_id", "text")
    val got = df.select(bpe_units(split(lower(col("text")), "\\s+"))
      .as("u")).as[Seq[String]].head
    // Hand-computed greedy apply of BpeKernels.Merges: (t,h)→th then
    // (th,e)→the composes; "esses" pins the left-to-right overlap
    // rule ((e,s) twice, never the middle s); punctuation passes
    // through as single code points.
    assert(got == Seq("the", "th", "in", "k", "ing", "m", "o", "the",
      "r", "es", "s", "es", "u", "n", "d", "er", "st", "and", "ing",
      "x", ".", "y", ","))
  }

  test("image header parse: marker walk, standalone markers, garbage") {
    import graft.multimodal.Multimodal.parseImageHeader
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // Minimal PNG: 640x480, depth 8, truecolor (3 components).
    val png = hx("89504E470D0A1A0A0000000D49484452" +
      "00000280000001E0" + "0802" + "00000000000000")
    assert(parseImageHeader(png) == Some(("png", 640L, 480L, 8L, 3L)))
    // JPEG whose walk must skip APP0, a COM, AND a standalone RST2
    // marker (no length field) before hitting SOF0: 31x5, 1 comp.
    val jpg = hx("FFD8" + "FFE000104A46494600010100000100010000" +
      "FFFE0004ABCD" + "FFD2" + "FFC0000B08" + "0005" + "001F" +
      "01" + "012200")
    assert(parseImageHeader(jpg) == Some(("jpeg", 31L, 5L, 8L, 1L)))
    // Truncated mid-walk, bad signature, bad IHDR type: all None.
    assert(parseImageHeader(jpg.take(8)).isEmpty)
    assert(parseImageHeader(hx("0011223344556677889900")).isEmpty)
    assert(parseImageHeader(hx("89504E470D0A1A0A0000000D49484453" +
      "00000280000001E0" + "0802" + "00000000000000")).isEmpty)
    assert(parseImageHeader(Array.empty[Byte]).isEmpty)
  }

  test("multimodal frame sampling covers the payload exactly") {
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.mediaTable(docs), nFrames = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    // windows of 2 bytes, last frame takes the remainder
    assert(frames.map(_.frame.length).toSeq == Seq(2, 2, 2, 4))
    assert(frames.flatMap(f => f.frame).map(_.toChar).mkString == "abcdefghij")
  }

  test("multimodal resize: fixed-width nearest-neighbor byte stride") {
    val docs = Seq((1L, "abcdefghijkl"), (2L, "")).toDF("doc_id", "text")
    val got = Multimodal.resize(spark, Multimodal.mediaTable(docs), width = 8)
      .collect().sortBy(_.idx)
    // 12 bytes -> positions floor(i*12/8) = 0,1,3,4,6,7,9,10
    assert(got.map(_.doc_id).distinct.toSeq == Seq(1L)) // empty emits none
    assert(got.map(_.byte_val.toChar).mkString == "abdeghjk")
  }

  test("multimodal stub: histogram normalized over payload bytes") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaTable(docs))
      .collect()
    assert(feats.length == 1)
    val f = feats(0)
    assert(f.n_bytes == 4)
    assert(math.abs(f.feature.sum - 1.0) < 1e-12)
    // 'a' = 97 -> bin 97/16 = 6 holds all mass.
    assert(f.feature(6) == 1.0)
  }

  test("pii scrub masks every email and phone, counts them") {
    val docs = Seq(
      (1L, "write a.b-c@mail.example.com or x@y.io today"),
      (2L, "call 555-1234 then 555-987 (too short) and 555-4321"),
      (3L, "clean text, no pii")).toDF("doc_id", "text")
    val got = PiiScrub.scrub(docs)
      .select("doc_id", "n_emails", "n_phones", "scrubbed")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2L, 0L, "write <EMAIL> or <EMAIL> today")))
    // 555-987 must NOT match (\b555-[0-9]{4}\b needs 4 digits exactly)
    assert(got(1)._2 == 0L && got(1)._3 == 2L)
    assert(got(1)._4 == "call <PHONE> then 555-987 (too short) and <PHONE>")
    assert(got(2) == ((3L, 0L, 0L, "clean text, no pii")))
  }

  test("repetition: self-concatenated doc repeats, distinct doc doesn't") {
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words),                 // 20 distinct tokens, no dup 8-grams
      (2L, s"$words $words"),      // doubled: every window reappears
      (3L, "tiny doc")).toDF("doc_id", "text") // < 8 tokens: one window
    val got = TextAnalysis.repetition(docs, n = 8)
      .select("doc_id", "n_windows", "n_dup_windows")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 13L, 0L)))
    // 40 tokens -> 33 windows; windows 1..13 equal windows 21..33
    // (offset 20 = one full copy), so 13 duplicates.
    assert(got(1) == ((2L, 33L, 13L)))
    assert(got(2) == ((3L, 1L, 0L)))
  }

  test("stratified sample: deterministic, per-stratum rates, no shuffle") {
    val docs = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    def run() = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 1.0)
      .as[(Long, String)].collect().toSet
    val s1 = run()
    assert(s1 == run()) // identical membership on re-run
    val byLang = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLang("de") == 200) // rate 1.0 keeps every de doc
    // en rate 0.25 over 200 docs: hash-bucketed, so roughly 50
    assert(byLang("en") > 25 && byLang("en") < 75)
    // repartitioning must not change the sample (pure row function)
    val s2 = Sampling.stratifiedSample(docs.repartition(7), "doc_id",
      "lang", Map("en" -> 0.25), defaultRate = 1.0)
      .as[(Long, String)].collect().toSet
    assert(s2 == s1)
  }

  test("mixture repeat: fractional epochs, deterministic, key-pure") {
    val docs = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "web" else "code")).toDF("doc_id", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureRepeat(df, "doc_id", "source",
        Map("web" -> 2.5, "code" -> 0.25), defaultWeight = 1.0)
        .as[(Long, String, Long)].collect().toSeq.sorted
    val out = run(docs)
    val byDoc = out.groupBy(_._1).view.mapValues(_.size).toMap
    // web docs get 2 or 3 copies; code docs 0 or 1.
    assert(byDoc.view.filterKeys(_ % 2 == 0).values
      .forall(n => n == 2 || n == 3))
    assert(byDoc.view.filterKeys(_ % 2 == 1).values.forall(_ == 1))
    val webCopies = out.count(_._2 == "web")
    val codeDocs = byDoc.count(_._1 % 2 == 1)
    assert(webCopies > 400 && webCopies < 600) // ~2.5 × 200
    assert(codeDocs > 25 && codeDocs < 75)     // ~0.25 × 200
    // copy indices are dense 0..n-1 per doc
    assert(out.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).sorted == (0L until rows.size.toLong) })
    // partitioning-invariant
    assert(run(docs.repartition(7)) == out)
  }

  test("hyperplane LSH finds every planted near-identical pair") {
    // d10's recall contract on its actual workload: a perturbed copy
    // (per-dim 1 + i·1e-4, cosine ≈ 0.9999+) agrees with its source
    // on (almost) all 64 sign bits, so SOME 8-bit band must collide
    // and the exact-cosine verify keeps the pair. Miss = the banding
    // or signature broke, not bad luck.
    val rnd = new scala.util.Random(7L)
    val base = (0L until 60L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian())))
    val pert = base.filter(_._1 % 5 == 0).map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, j) => x * (1 + j * 1e-4) })
    }
    val emb = (base ++ pert).toDF("vec_id", "embedding")
    val got = Similarity.embedNearDupPairs(emb, minCos = 0.99)
      .select("va", "vb").as[(Long, Long)].collect().toSet
    val planted = base.filter(_._1 % 5 == 0)
      .map { case (i, _) => (i, i + 1000L) }.toSet
    assert(planted.subsetOf(got),
      s"missed planted pairs: ${planted -- got}")
  }

  test("multi-probe knn graph: recall vs brute force on learned cells") {
    // A corpus with real cell boundaries: 4 loose clusters in 8 dims
    // (deterministic seeded noise), cells LEARNED by e7's k-means —
    // the exact setup where single-cell e6 silently loses neighbors
    // for boundary vectors and e9's second probe wins them back.
    val rnd = new scala.util.Random(42L)
    val anchors = Seq(
      Seq(1.0, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.3, 0.0),
      Seq(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.3))
    val rows = (0 until 120).map { i =>
      val a = anchors(i % 4)
      (i.toLong, a.map(_ + rnd.nextGaussian() * 0.35))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val cent = KMeans.train(emb, k = 4, iters = 3)
    val withCell = KMeans.withCells(emb, cent)

    val k = 5
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "nbr_id").as[(Long, Long)].collect().toSet
    // Ground truth: every vector's true top-k over the whole corpus.
    val truth = pairs(Similarity.bruteForceTopK(emb, emb, k)
      .select(col("query_id").as("vec_id"), col("cand_id").as("nbr_id")))
    val single = pairs(Similarity.knnGraph(withCell, "cell", k))
    val probed = pairs(Similarity.knnGraphProbed(withCell, "cell", k,
      nprobe = 2))

    def recall(got: Set[(Long, Long)]) =
      (truth & got).size.toDouble / truth.size
    // The second probe must strictly help on this boundary-heavy
    // corpus and clear the 0.95 floor the operator is sold on;
    // single-cell e6 demonstrably loses neighbors here.
    assert(recall(single) < 1.0, "corpus has no cell boundaries - " +
      "recall comparison is vacuous")
    assert(recall(probed) > recall(single),
      s"probed ${recall(probed)} vs single ${recall(single)}")
    assert(recall(probed) >= 0.95, s"recall@$k = ${recall(probed)}")
    // Every probed result is a real (self-excluded) pair with rank
    // within k, and per-vector ranks are dense from 1.
    val full = Similarity.knnGraphProbed(withCell, "cell", k, nprobe = 2)
      .select("vec_id", "rank", "nbr_id").as[(Long, Int, Long)]
      .collect()
    assert(full.forall(r => r._1 != r._3 && r._2 >= 1 && r._2 <= k))
    assert(full.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == (1 to rs.length) })
  }

  test("randomized: probed knn graph is exact within its probe set") {
    // Recall (how good the probe choice is) is measured elsewhere;
    // this pins EXACTNESS: given the top-2 cells the operator probes,
    // its neighbors must be precisely the brute-force top-k within
    // those cells' members — no candidate lost or invented.
    val rnd = new scala.util.Random(99L)
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(6)(rnd.nextGaussian()), i % 5)
    }
    val emb = rows.map { case (id, v, c) => (id, v, c) }
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnGraphProbed(emb, "label", k = 4, nprobe = 2)
      .select("vec_id", "rank", "nbr_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    def cos(x: Seq[Double], y: Seq[Double]) = {
      val d = x.zip(y).map { case (p, q) => p * q }.sum
      d / (math.sqrt(x.map(p => p * p).sum) *
        math.sqrt(y.map(q => q * q).sum))
    }
    // Rounded per-cell centroids, exactly as centroidVectors builds.
    val cents = rows.groupBy(_._3).view.mapValues { vs =>
      val dims = vs.head._2.indices
      dims.map(j => BigDecimal(vs.map(_._2(j)).sum / vs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    for ((id, v, _) <- rows) {
      val probed = cents.toSeq
        .map { case (c, cv) => (-cos(v, cv), c) }.sorted.take(2)
        .map(_._2).toSet
      val want = rows
        .filter(r => r._1 != id && probed.contains(r._3))
        .map(r => (-cos(v, r._2), r._1)).sorted.take(4).map(_._2)
      assert(got.getOrElse(id, Seq.empty) == want, s"vec $id")
    }
  }

  test("lmScore: external (token, logprob) table is the contract") {
    // A hand-written LM — the KenLM/BPE plug point: the operator must
    // score with EXACTLY these numbers, never recompute its own.
    val toks = Seq((1L, "a"), (1L, "b"), (1L, "a"),
      (2L, "b"), (2L, "unseen")).toDF("doc_id", "token")
    val lm = Seq(("a", -1.0), ("b", -2.0)).toDF("token", "logprob")
    val strict = TextAnalysis.lmScore(toks, lm)
      .as[(Long, Long, Long)].collect().toSet
    // None: OOV tokens drop — doc 2 keeps only "b".
    assert(strict == Set((1L, 3L, math.floor(-4.0 / 3 * 1e6 + 0.5).toLong),
      (2L, 1L, -2000000L)))
    val oov = TextAnalysis.lmScore(toks, lm, oovLogprob = Some(-10.0))
      .as[(Long, Long, Long)].collect().toSet
    // Some(-10): OOV scores as -10 and counts — doc 2 = (-2 + -10)/2.
    assert(oov == Set((1L, 3L, math.floor(-4.0 / 3 * 1e6 + 0.5).toLong),
      (2L, 2L, -6000000L)))
  }

  test("knn graph ranks in-cluster neighbors only, (sim desc, id asc)") {
    val e = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(1.0f, 0.1f)),
      (2L, 0, Array(0.0f, 1.0f)), (3L, 1, Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.knnGraph(e, "label", k = 2)
      .select("vec_id", "rank", "nbr_id")
      .as[(Long, Int, Long)].collect().toSet
    // vec 3 is alone in its cluster: no rows; vec 0's best is 1 (cos
    // ~0.995) then 2 (cos 0); cross-cluster 3 never appears.
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 0L) == Set((0L, 1, 1L), (0L, 2, 2L)))
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._3)) ==
      Set((1, 1L), (2, 0L)))
  }

  test("bloom semi join: exact semantics regardless of fpp") {
    import graft.operators.BloomPrune
    val big = (1L to 200L).map(i => (i, s"row$i")).toDF("k", "v")
    val small = Seq(7L, 7L, 42L, 99L, 999L).toDF("k") // dup + miss keys
    // Absurdly high fpp: nearly every row passes the prune, so the
    // verify join must do all the work — result still exact, and
    // duplicate build keys must not duplicate output rows.
    for (fpp <- Seq(0.9, 0.01)) {
      val got = BloomPrune.semiJoin(big, small, "k",
        expectedItems = 10L, fpp = fpp)
        .select("k").as[Long].collect().sorted.toSeq
      assert(got == Seq(7L, 42L, 99L), s"fpp=$fpp")
    }
  }

  test("bqQuantize packs sign bits MSB-first in two halves; bqTopK ranks by agreement") {
    val full = (1L << 32) - 1 // all 32 bits of a half set
    val vecs = Seq(
      (1L, Seq.fill(64)(1.0f)),                      // hi=full, lo=full
      (2L, Seq(-1.0f) ++ Seq.fill(63)(1.0f)),        // first dim → MSB off
      (3L, Seq.fill(64)(-1.0f)),                     // all off
      (4L, Seq.fill(32)(1.0f) ++ Seq.fill(32)(0.0f)) // zero is NOT > 0
    ).toDF("vec_id", "embedding")
    val codes = Similarity.bqQuantize(vecs)
      .select("vec_id", "hi", "lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(codes(1L) == (full, full))
    assert(codes(2L) == (full - (1L << 31), full)) // dim 1 = bit 31 of hi
    assert(codes(3L) == (0L, 0L))
    assert(codes(4L) == (full, 0L))
    // From query 1: cand 2 agrees on 63 bits, cand 4 on 32, cand 3 on 0.
    val tk = Similarity.bqTopK(vecs, vecs.filter(col("vec_id") === 1L), k = 3)
      .select("rank", "cand_id", "agree")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(tk == Seq((1L, 2L, 63L), (2L, 4L, 32L), (3L, 3L, 0L)))
  }

  test("mmrRerank demotes redundant hits that plain top-k keeps") {
    // q along dim 0; a and its near-copy a2 are the two most relevant,
    // b is diverse at rel ~0.45. Plain top-2 = {a, a2}. The greedy
    // trade: a2 wins iff λ·(rel_a2−rel_b) > (1−λ)·(div_a2−div_b) —
    // here div(a2,a) ≈ 0.99995 vs div(b,a) ≈ 0.491, so b overtakes
    // exactly below λ ≈ 0.48: λ=0.4 must swap in b, λ=0.7 must keep
    // a2 (diversity-aware ≠ relevance-blind).
    def v(x: Double, y: Double): Seq[Double] =
      Seq(x, y) ++ Seq.fill(62)(0.0)
    val emb = Seq(
      (0L, v(1.0, 0.0)),        // query
      (1L, v(1.0, 0.05)),       // a: rel ~0.999
      (2L, v(1.0, 0.06)),       // a2: rel ~0.998, near-dup of a
      (3L, v(0.5, 1.0))         // b: rel ~0.447, diverse
    ).toDF("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") === 0L)
    val plain = Similarity.bruteForceTopK(emb, qs, k = 2)
      .select("rank", "cand_id").as[(Long, Long)].collect().toSet
    assert(plain == Set((1L, 1L), (2L, 2L)))
    val mmr = Similarity.mmrRerank(emb, qs, k = 2, poolK = 3,
      lambda10 = 4)
      .select("rank", "cand_id").as[(Long, Long)].collect().toSet
    assert(mmr == Set((1L, 1L), (2L, 3L)))
    val keep = Similarity.mmrRerank(emb, qs, k = 2, poolK = 3,
      lambda10 = 7)
      .select("rank", "cand_id").as[(Long, Long)].collect().toSet
    assert(keep == plain)
    // λ=1.0 degenerates to pure relevance = the plain ranking.
    val rel = Similarity.mmrRerank(emb, qs, k = 2, poolK = 3,
      lambda10 = 10)
      .select("rank", "cand_id").as[(Long, Long)].collect().toSet
    assert(rel == plain)
  }

  test("skipGramPairs counts within-window co-occurrences per walk") {
    import graft.graph.Walks
    // w1 = a b c a; w2 = a b. Window 2, ordered pairs, counted across
    // walks: a→b from (a@0,b@1), (a@3,b@1) and w2 = 3; a@0 vs a@3 is
    // 3 steps apart — outside the window, so a→a never appears.
    val walks = Seq(
      ("w1", 0L, "a"), ("w1", 1L, "b"), ("w1", 2L, "c"), ("w1", 3L, "a"),
      ("w2", 0L, "a"), ("w2", 1L, "b")).toDF("walk_id", "step", "node")
    val got = Walks.skipGramPairs(walks, window = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      ("a", "b") -> 3L, ("a", "c") -> 2L, ("b", "a") -> 3L,
      ("b", "c") -> 1L, ("c", "a") -> 2L, ("c", "b") -> 1L))
  }

  test("shotCuts: changed-pixel fraction drives the cut flag exactly") {
    import graft.multimodal.Gif
    // 8×8 canvas. Frame 1 repaints a 4×4 rect (16/64 = 25% ≥ 20% →
    // cut); frame 2 repaints ONE pixel (1/64 < 20% → no cut). Every
    // palette index maps to a distinct color triple, and overlay
    // indices shift by +1, so every overlaid pixel genuinely changes.
    val palette = Array.tabulate(3 * 16) { i =>
      ((i / 3) * 15 + (i % 3) * 5).toByte
    }
    val base = Gif.FrameSpec(0, 0, 8, 8,
      Array.tabulate(64)(i => (i % 8).toByte), disposal = 1)
    val f1 = Gif.FrameSpec(2, 2, 4, 4,
      Array.tabulate(16) { i =>
        val y = 2 + i / 4; val x = 2 + i % 4
        (((y * 8 + x) % 8) + 1).toByte // base index + 1 at every pixel
      }, disposal = 1)
    val f2 = Gif.FrameSpec(0, 0, 1, 1, Array[Byte](15), disposal = 1)
    val payload = Gif.encodeAnimated(8, 8, 4, palette, Seq(base, f1, f2))
    val media = Seq(
      Multimodal.MediaRow(9L, "image/gif", payload.length.toLong, payload))
      .toDF()
    val got = Multimodal.shotCuts(spark, media).collect()
      .map(r => r.frame_idx -> r).toMap
    assert(got.size == 2)
    assert(got(1L).changed_px == 16L && got(1L).is_cut)
    assert(got(2L).changed_px == 1L && !got(2L).is_cut)
    assert(got(1L).diff_total > 0L && got(2L).diff_total > 0L)
  }

  test("kll sketch: lossless below cap — exact multiset, repartition-invariant") {
    import graft.functions.KllSketch.kll_sketch
    // 300 values with duplicates, below cap=512: level 0 holds the
    // full multiset, so the sketch IS the sorted (v, w=1) list and
    // is a pure function of the input SET — identical across any
    // partitioning (the merge-associativity / shuffle-order
    // invariance pin for the lossless regime).
    val vals = (0 until 300).map(i => ((i * 7919) % 100).toLong)
    def sk(parts: Int): Seq[(Long, Long)] =
      vals.toDF("v").repartition(parts)
        .agg(kll_sketch(col("v"), 512).as("sk"))
        .select(explode(col("sk")).as("t"))
        .select(col("t.v"), col("t.w"))
        .as[(Long, Long)].collect().toSeq
    val one = sk(1)
    assert(one == vals.sorted.map(v => (v, 1L)))
    assert(sk(4) == one && sk(16) == one)
  }

  test("kll sketch: compaction preserves mass exactly, bounds rank error") {
    // Direct buffer drive (the aggregate's exact code path for
    // update/merge): a 2000-item permutation through caps 32/64/128.
    // Empirical grid measured at authoring time (deterministic
    // schedule, so these are stable): maxRankErr/n = 0.030 / 0.016 /
    // 0.007 sequential, 0.042 / 0.0245 / 0.0105 under a 4-way merge.
    // Asserted with headroom; tightening cap must tighten error.
    val n = 2000
    val vals = (0 until n).map(i => ((i * 1237) % n).toLong)
    def maxErr(items: Seq[(Long, Long)]): Double = {
      assert(items.map(_._2).sum == n.toLong) // exact mass, always
      (5 until 100 by 5).map { qn =>
        val target = (qn * n + 99) / 100
        var cw = 0L
        val est = items.find { case (_, w) =>
          cw += w; cw >= target
        }.get._1
        math.abs((est + 1) - qn * n / 100.0) // values are 0..n-1 distinct
      }.max
    }
    def seqErr(cap: Int): Double = {
      val b = new graft.functions.KllSketch.Buffer(cap)
      vals.foreach(b.add)
      maxErr(b.items.sortBy(t => (t._1, t._2)))
    }
    def mergeErr(cap: Int): Double = {
      val bufs = (0 until 4).map { k =>
        val b = new graft.functions.KllSketch.Buffer(cap)
        vals.zipWithIndex.filter(_._2 % 4 == k).map(_._1).foreach(b.add)
        b
      }
      val m = bufs.reduceLeft { (a, o) => a.mergeIn(o); a }
      maxErr(m.items.sortBy(t => (t._1, t._2)))
    }
    val se = Seq(32, 64, 128).map(seqErr)
    assert(se(0) <= 0.05 * n && se(1) <= 0.03 * n && se(2) <= 0.015 * n,
      s"sequential errors $se")
    assert(se(2) < se(1) && se(1) < se(0), s"error must shrink with cap: $se")
    val me = Seq(32, 64, 128).map(mergeErr)
    assert(me(0) <= 0.06 * n && me(1) <= 0.04 * n && me(2) <= 0.02 * n,
      s"merged errors $me")
  }

  test("hierarchical descent escapes the entry cluster where the flat walk cannot") {
    // Four well-separated clusters (centers 6·e_c, hash noise ±0.5
    // per dim — numpy-simulated before implementation, the walk
    // discipline): the level-0 probed-kNN/navigable graph keeps ONLY
    // in-cluster edges (own-cluster cosine ≈ 1 ≫ cross ≈ 0), so a
    // flat walk seeded in cluster 0 STRUCTURALLY cannot reach any
    // other cluster. The sparse upper levels force long-range edges
    // (a member's nearest FELLOW MEMBERS span clusters once the
    // sample is thin), so the descent routes across — the regime the
    // hierarchy exists for (e47 measures the near-uniform corpus
    // where it is break-even).
    val MIX = BigInt(2654435761L)
    val MOD = BigInt(2).pow(32)
    val rows = (0 until 200).map { i =>
      val c = i / 50
      val h = (BigInt(i + 1) * MIX) % MOD
      val e = Array.tabulate(64) { dd =>
        val noise =
          ((h * (dd + 3) * MIX) % MOD).toDouble / MOD.toDouble - 0.5
        val center = if (dd == c) 6.0 else 0.0
        (center + noise).toFloat
      }
      (i.toLong, e, c.toLong)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val lg = Similarity.hierarchicalNavGraph(emb, "label",
      maxLevel = 2, k0 = 8, kUpper = 4)
    val cluster = udf((id: Long) => id / 50)
    // Structural premise: no level-0 edge crosses clusters...
    val g0 = lg.filter(col("level") === 0)
    assert(g0.filter(cluster(col("vec_id")) =!= cluster(col("nbr_id")))
      .count() == 0L)
    // ...but the sparse upper levels DO cross.
    assert(lg.filter(col("level") >= 1)
      .filter(cluster(col("vec_id")) =!= cluster(col("nbr_id")))
      .count() > 0L)
    val qs = emb.filter(col("vec_id") % 50 === 7)
    val ent = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("cand_id"))
    val exact = Similarity.bruteForceTopK(emb, qs, k = 4)
      .select(col("query_id"), col("cand_id"))
    def crossHits(walk: org.apache.spark.sql.DataFrame): Long =
      walk.filter(col("rank") <= 4 && col("query_id") >= 50)
        .select("query_id", "cand_id")
        .join(exact, Seq("query_id", "cand_id")).count()
    val flat = Similarity.graphBeamSearch(emb, qs,
      g0.select("vec_id", "nbr_id"), ent, beamWidth = 8, rounds = 2)
    val hier = Similarity.hierarchicalBeamSearch(emb, qs, lg, ent,
      maxLevel = 2, upperWidth = 2, upperRounds = 1, beamWidth = 8,
      rounds = 1)
    assert(crossHits(flat) == 0L,
      "flat walk cannot reach outside the entry cluster")
    assert(crossHits(hier) > 0L,
      "descent must route across via the upper layers")
  }

  test("hierarchical attach: planted delta walk-reachable, dominates rebuild") {
    // Same 4-cluster geometry as the descent test. Delta = four
    // level-2 members (ids ≡ 0 mod 16 — hierLevel is id mod 4^l
    // since the Mixer is ≡ 1 mod 16) spread across clusters plus two
    // level-0-only ids; attach them to the base build and verify the
    // FreshDiskANN contract level-wise, then search probes planted
    // AT each delta vector's position through attach-union and full
    // rebuild — both must return the delta vector at rank 1 (attach
    // loses nothing the rebuild would have).
    val MIX = BigInt(2654435761L)
    val MOD = BigInt(2).pow(32)
    val rows = (0 until 200).map { i =>
      val c = i / 50
      val h = (BigInt(i + 1) * MIX) % MOD
      val e = Array.tabulate(64) { dd =>
        val noise =
          ((h * (dd + 3) * MIX) % MOD).toDouble / MOD.toDouble - 0.5
        val center = if (dd == c) 6.0 else 0.0
        (center + noise).toFloat
      }
      (i.toLong, e, c.toLong)
    }
    val all = rows.toDF("vec_id", "embedding", "label")
    val deltaIds = Seq(16L, 48L, 112L, 176L, 7L, 55L)
    val base = all.filter(!col("vec_id").isin(deltaIds: _*))
    val delta = all.filter(col("vec_id").isin(deltaIds: _*))
    val att = Similarity.hierarchicalAttach(base, delta, "label",
      maxLevel = 2, maxDegree = 4, maxCandidates = 8, kUpper = 4)
    val rowsAtt = att
      .as[(Long, Long, String, Option[Long], Long, Long)].collect()
    val fwd = rowsAtt.filter(_._3 == "fwd")
    val back = rowsAtt.filter(_._3 == "back")
      .map(r => (r._1, r._5, r._2)).toSet
    assert(fwd.nonEmpty && fwd.exists(_._1 == 2L),
      "upper-level fwd rows must exist for the level-2 delta members")
    // fwd: delta -> base members of that level only; back twins.
    assert(fwd.forall(r => deltaIds.contains(r._2)))
    assert(fwd.forall(r => !deltaIds.contains(r._5)))
    assert(fwd.forall(r => r._5 % BigInt(4).pow(r._1.toInt).toLong == 0
      || r._1 == 0L), "upper fwd edges must target level members")
    assert(fwd.forall(r => back.contains((r._1, r._2, r._5))),
      "every fwd edge carries its level's backlink twin")
    // Attach-union vs rebuild search parity on planted probes.
    val baseHier = Similarity.hierarchicalNavGraph(base, "label",
      maxLevel = 2, k0 = 8, kUpper = 4)
    val unionG = baseHier.select("level", "vec_id", "nbr_id")
      .unionByName(att.select(col("level"), col("vec_id"),
        col("nbr_id")))
    val rebuilt = Similarity.hierarchicalNavGraph(all, "label",
      maxLevel = 2, k0 = 8, kUpper = 4)
      .select("level", "vec_id", "nbr_id")
    val probes = delta.select((col("vec_id") + 1000L).as("vec_id"),
      col("embedding"))
    val ent = base.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("cand_id"))
    def top1(lg: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.hierarchicalBeamSearch(all, probes, lg, ent,
          maxLevel = 2, upperWidth = 4, upperRounds = 2,
          beamWidth = 8, rounds = 3)
        .filter(col("rank") === 1)
        .select("query_id", "cand_id").as[(Long, Long)]
        .collect().toMap
    val viaAttach = top1(unionG)
    val viaRebuild = top1(rebuilt)
    // The attach contract: every planted delta is walk-reachable at
    // rank 1 through base-build ∪ attach edges. (The REBUILD at this
    // budget legitimately misses the cross-cluster deltas — the
    // descent is approximate and the attach path's un-pruned
    // backlinks add extra long-range entry edges — so the pin is
    // attach ⊇ rebuild, not equality.)
    for (id <- deltaIds)
      assert(viaAttach.get(id + 1000L).contains(id),
        s"attach-union walk missed delta $id: $viaAttach")
    for (id <- deltaIds if viaRebuild.get(id + 1000L).contains(id))
      assert(viaAttach.get(id + 1000L).contains(id),
        s"attach lost delta $id that the rebuild finds")
  }

  test("merge applyChangelog: I/U/D precedence, latest-wins, idempotent") {
    import graft.operators.Merge
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "s")
    // Key 1: update then delete (latest D wins → gone).
    // Key 2: delete then update (latest U wins → new values).
    // Key 3: untouched (base row survives).
    // Key 4: insert of a new key.
    // Key 5: delete of an unknown key (no-op).
    val chg = Seq(
      (1L, 1L, "U", 11L, "a2"), (1L, 2L, "D", 0L, "x"),
      (2L, 1L, "D", 0L, "x"), (2L, 2L, "U", 22L, "b2"),
      (4L, 1L, "I", 40L, "d"),
      (5L, 1L, "D", 0L, "x")).toDF("k", "seq", "op", "v", "s")
    def apply(b: org.apache.spark.sql.DataFrame) =
      Merge.applyChangelog(b, chg, keyCol = "k",
        seqCols = Seq(col("seq")), opCol = "op",
        valueCols = Seq("v", "s"))
    val once = apply(base)
    assert(once.as[(Long, Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((2L, 22L, "b2"), (3L, 30L, "c"), (4L, 40L, "d")))
    // Idempotence: re-applying the SAME changelog to the merged
    // snapshot changes nothing (the second apply upserts identical
    // values and re-deletes already-absent keys).
    val twice = apply(once)
    assert(twice.as[(Long, Long, String)].collect().sortBy(_._1).toSeq ==
      once.as[(Long, Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("merge applyChangelog composes with SCD-2: snapshots chain through applies") {
    import graft.operators.Merge
    // Two CDC days applied in sequence reach the same snapshot as
    // one combined batch with a day-major sequence — the replay
    // property that lets a warehouse rebuild from any checkpoint.
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "s")
    val day1 = Seq((1L, 1L, "U", 11L, "a1"), (3L, 1L, "I", 30L, "c"))
      .toDF("k", "seq", "op", "v", "s")
    val day2 = Seq((2L, 1L, "D", 0L, "x"), (3L, 1L, "U", 31L, "c2"))
      .toDF("k", "seq", "op", "v", "s")
    def ap(b: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, seq: Seq[
          org.apache.spark.sql.Column] = Seq(col("seq"))) =
      Merge.applyChangelog(b, c, "k", seq, "op", Seq("v", "s"))
    val chained = ap(ap(base, day1), day2)
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val combined = ap(base,
      day1.withColumn("day", lit(1)).union(day2.withColumn("day", lit(2))),
      Seq(col("day"), col("seq")))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(chained == combined)
    assert(chained == Seq((1L, 11L, "a1"), (3L, 31L, "c2")))
  }

  test("trainedCells: nlist tracks corpus size, columns survive, bounded cells") {
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 120).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()), s"s${i % 3}")
    }
    val emb = rows.toDF("vec_id", "embedding", "source")
    // perCell = 10 over 120 rows → k = 12 trained cells; every vector
    // assigned, extra columns intact, embedding widened to double.
    val tc = Similarity.trainedCells(emb, perCell = 10)
    assert(tc.columns.toSet == Set("vec_id", "embedding", "source",
      "cell"))
    assert(tc.count() == 120L)
    val sizes = tc.groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.size <= 12 && sizes.size >= 2,
      s"nlist = ⌈120/10⌉ = 12 trained cells (minus empties): $sizes")
    // The floor: a tiny corpus still trains max(8, …) = 8 seeds.
    val tiny = Similarity.trainedCells(emb.limit(20), perCell = 250)
    assert(tiny.select("cell").distinct().count() <= 8L)
  }

  test("trained substrate: probed knn graph clears the recall floor label-free") {
    // The e25-family contract after the round-14 substrate swap: the
    // walk-family graph builds on trainedCells (nlist ∝ n), never on
    // ground-truth labels — recall vs brute force must still clear
    // the same floor the learned-cell fixture pins, with NO label
    // column consulted.
    val rnd = new scala.util.Random(42L)
    val anchors = Seq(
      Seq(1.0, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.3, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.7, 0.0),
      Seq(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.7))
    val rows = (0 until 120).map { i =>
      val a = anchors(i % 4)
      (i.toLong, a.map(_ + rnd.nextGaussian() * 0.35))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val tc = Similarity.trainedCells(emb, perCell = 30)
    val truth = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select(col("query_id").as("vec_id"), col("cand_id").as("nbr_id"))
      .as[(Long, Long)].collect().toSet
    val probed = Similarity.knnGraphProbed(tc, "cell", k = 5,
        nprobe = 2)
      .select("vec_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (truth & probed).size.toDouble / truth.size
    assert(recall >= 0.9, s"trained-cell recall@5 = $recall")
    // Medoids over the same cells: one entry per non-empty cell.
    val med = Similarity.cellMedoids(tc, "cell").count()
    assert(med == tc.select("cell").distinct().count())
  }

  test("hierarchical trained build: per-level cells, nested members, long-range uppers") {
    // The separated-cluster geometry of the descent test, but cells
    // TRAINED per level (hierarchicalNavGraphTrained) instead of
    // ground-truth labels: upper levels must still cross clusters
    // (the long-range edges per-level re-training preserves — the
    // reason levels re-train instead of reusing corpus cells).
    val MIX = BigInt(2654435761L)
    val MOD = BigInt(2).pow(32)
    val rows = (0 until 200).map { i =>
      val c = i / 50
      val h = (BigInt(i + 1) * MIX) % MOD
      val e = Array.tabulate(64) { dd =>
        val noise =
          ((h * (dd + 3) * MIX) % MOD).toDouble / MOD.toDouble - 0.5
        val center = if (dd == c) 6.0 else 0.0
        (center + noise).toFloat
      }
      (i.toLong, e)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val lg = Similarity.hierarchicalNavGraphTrained(emb, maxLevel = 2,
      k0 = 8, kUpper = 4, perCell = 25)
    val cluster = udf((id: Long) => id / 50)
    // Level membership is the hierLevel hash rule at every level.
    for (l <- 1 to 2) {
      val mod = 1L << (2 * l)
      val bad = lg.filter(col("level") === l)
        .filter(col("vec_id") * 2654435761L % 4294967296L % mod =!= 0)
      assert(bad.count() == 0L, s"non-member rows at level $l")
    }
    // Level 0 keeps in-cluster edges only (cross cosine ≈ 0)…
    assert(lg.filter(col("level") === 0)
      .filter(cluster(col("vec_id")) =!= cluster(col("nbr_id")))
      .count() == 0L)
    // …and the thin upper levels still cross clusters.
    assert(lg.filter(col("level") >= 1)
      .filter(cluster(col("vec_id")) =!= cluster(col("nbr_id")))
      .count() > 0L)
    // Trained attach keeps the FreshDiskANN shape: fwd from delta
    // only, every fwd edge's backlink twin present.
    val deltaIds = Seq(16L, 48L, 7L)
    val base = emb.filter(!col("vec_id").isin(deltaIds: _*))
    val delta = emb.filter(col("vec_id").isin(deltaIds: _*))
    val att = Similarity.hierarchicalAttachTrained(base, delta,
      maxLevel = 2, maxDegree = 4, maxCandidates = 8, kUpper = 4,
      perCell = 25)
    val rowsAtt = att
      .as[(Long, Long, String, Option[Long], Long, Long)].collect()
    val fwd = rowsAtt.filter(_._3 == "fwd")
    val back = rowsAtt.filter(_._3 == "back")
      .map(r => (r._1, r._5, r._2)).toSet
    assert(fwd.nonEmpty && fwd.forall(r => deltaIds.contains(r._2)))
    assert(fwd.forall(r => back.contains((r._1, r._2, r._5))))
  }

  test("prefix-filtered jaccard equals brute force ∩ the df-cap law") {
    // The round-14 candidate rewrite (Chaudhuri/Bayardo/ppjoin prefix
    // filtering) must be OUTPUT-IDENTICAL to the round-2 inverted
    // index: {all pairs with J ≥ t} ∩ {pairs sharing ≥1 rare
    // shingle}. Truth computed by brute force over the shingle sets
    // — every pair scored, the df-cap law applied literally — on a
    // templated corpus with planted near-dups, at both a high and a
    // low threshold and under a tight cap that actually drops pairs.
    val vocab = (1 to 30).map("w" + _)
    val docs = (1 to 48).map { i =>
      val base = (0 until 14).map(j => vocab((i % 4 + j * 2) % 30))
      val txt =
        (if (i % 5 == 0) base.updated(13, "q" + i) else base)
          .mkString(" ")
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs)
      .as[(Long, Seq[Long])].collect().toMap
    val dfm = sets.values.flatten
      .groupBy(identity).view.mapValues(_.size).toMap
    def truth(t: Double, cap: Int): Set[(Long, Long, Long)] = {
      val ids = sets.keys.toSeq.sorted
      (for {
        a <- ids; b <- ids if a < b
        sa = sets(a).toSet; sb = sets(b).toSet
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t && (sa & sb).exists(s => dfm(s) <= cap)
      } yield (a, b,
        math.floor(j * 1000000 + 0.5).toLong)).toSet
    }
    for ((t, cap) <- Seq((0.8, 100), (0.5, 100), (0.8, 3))) {
      val got = Dedup.ngramJaccardPairs(docs, minJaccard = t,
          maxShingleDf = cap)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == truth(t, cap),
        s"t=$t cap=$cap: ${got.size} vs truth ${truth(t, cap).size}")
    }
    // The tight cap must actually exercise the law: pairs exist at
    // cap 100 and cap 3 drops at least one of them (template-shingle
    // df ≈ 11-12 here sits between the caps).
    assert(truth(0.8, 100).nonEmpty &&
      truth(0.8, 3) != truth(0.8, 100),
      s"cap law unexercised: ${truth(0.8, 3).size} vs " +
        s"${truth(0.8, 100).size}")
    spark.catalog.clearCache()
  }

  test("winnowingPairs: ≥6-token shared runs guaranteed, recall ≥ d2 there") {
    // The winnowing guarantee (Schleimer et al.): any shared token
    // run of length ≥ w + k − 1 = 6 selects at least one shared
    // fingerprint — so candidate generation cannot miss a long-run
    // pair that d2's full inverted index finds. Fixture: a near-dup
    // pair (long shared run, high Jaccard), a pair sharing EXACTLY
    // one 6-token run amid unique filler (the guarantee's boundary),
    // and unrelated noise.
    val run6 = "alpha beta gamma delta eps zeta" // exactly 6 tokens
    val docs = Seq(
      // 12 tokens, last differs: 10 shingles, 9 shared → J = 9/11 ≈
      // 0.818 — clears the 0.8 bar with the shared 11-token run.
      (1L, "one two three four five six seven eight nine ten eleven twelve"),
      (2L, "one two three four five six seven eight nine ten eleven zzz"),
      (3L, (1 to 8).map("u" + _).mkString(" ") + " " + run6),
      (4L, run6 + " " + (9 to 16).map("u" + _).mkString(" ")),
      (5L, (17 to 28).map("u" + _).mkString(" "))).toDF("doc_id", "text")
    // High bar: the near-identical pair (1,2) — d2 and d82 agree
    // exactly (same verify stage, both candidate paths find it).
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("da", "db", "jaccard_e6")
        .as[(Long, Long, Long)].collect().toSet
    val d82hi = pairs(Dedup.winnowingPairs(docs, minJaccard = 0.8))
    val d2hi = pairs(Dedup.ngramJaccardPairs(docs, minJaccard = 0.8))
    assert(d82hi == d2hi && d82hi.exists(p => (p._1, p._2) == (1L, 2L)))
    // Low bar: the boundary pair (3,4) shares only the 6-token run
    // (4 of each doc's 12 shingles; J = 4/20 = 0.2) — the guarantee
    // says winnowing candidates must include it, and verification
    // must agree with d2 to the e6 digit.
    val d82lo = pairs(Dedup.winnowingPairs(docs, minJaccard = 0.15))
    val d2lo = pairs(Dedup.ngramJaccardPairs(docs, minJaccard = 0.15))
    assert(d82lo == d2lo, s"winnowing $d82lo vs d2 $d2lo")
    assert(d82lo.exists(p => (p._1, p._2) == (3L, 4L)))
    spark.catalog.clearCache() // shingle sets are caller-releases
  }

  test("nav health card: attach-heavier histories degrade debt monotonically") {
    // The e51 rebuild-trigger contract: with a fixed base build, a
    // SUPERSET attach history can only add backlink debt and
    // degree-cap overflow — the card must surface that monotonically
    // (this is what makes it usable as a compaction trigger).
    val rnd = new scala.util.Random(5L)
    val rows = (0 until 150).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian()))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 3 === 0)
    val d1 = emb.filter(col("vec_id") % 3 === 1)
    val d2 = emb.filter(col("vec_id") % 3 =!= 0) // d1 ⊂ d2
    val tcb = Similarity.trainedCells(base, perCell = 20)
    val built = Similarity.navigableGraph(base,
        Similarity.knnGraphProbed(tcb, "cell", k = 4, nprobe = 2)
          .select(col("vec_id"), col("nbr_id")),
        maxDegree = 4, maxCandidates = 8)
    def card(delta: org.apache.spark.sql.DataFrame) =
      Similarity.navAttachHealth(base, built,
          Similarity.navigableAttach(tcb, delta, "cell",
            maxDegree = 4, maxCandidates = 8), maxDegree = 4)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    val c1 = card(d1)
    val c2 = card(d2)
    // Schema: n_base_nodes, n_built_edges, n_attach_fwd,
    // n_backlink_debt, overflow_nodes, overflow_excess,
    // reciprocity_built_e6, reciprocity_after_e6.
    assert(c1._1 == c2._1 && c1._2 == c2._2 && c1._7 == c2._7,
      "base-side stats must not depend on the delta")
    assert(c1._4 > 0L, "attach must create backlink debt")
    assert(c2._3 > c1._3 && c2._4 > c1._4,
      s"superset delta must add fwd edges and debt: $c1 vs $c2")
    assert(c2._5 >= c1._5 && c2._6 >= c1._6,
      s"overflow must be monotone in the attach history: $c1 vs $c2")
    assert(c2._6 > 0L, "the heavy history must overflow the cap")
    spark.catalog.clearCache()
  }

  test("nav compaction pays the debt: caps degrees, zeroes the card, keeps reach") {
    // e52's three contracts on the MAINTENANCE fixture the operator
    // exists for — deltas are perturbed copies of base nodes (new
    // versions of existing documents), so every delta is its host's
    // rank-1 merged candidate, which RobustPrune keeps
    // unconditionally: (a) every node's out-degree ≤ maxDegree after
    // compaction, (b) walk-reachability from the entry set is
    // preserved (every node reachable over built ∪ attach edges
    // stays reachable over the compacted graph — the ±δ twin design
    // keeps the two deltas of one host farther from EACH OTHER than
    // from the host, so neither α-dominates the other), (c) the e51
    // health card over (compacted, empty attach) reads zero debt and
    // zero overflow — the card's rebuild trigger disarms.
    val rnd = new scala.util.Random(7L)
    val anchors = (0 until 25).map(_ => Seq.fill(8)(rnd.nextGaussian()))
    val dirs = (0 until 25).map(_ => Seq.fill(8)(rnd.nextGaussian()))
    val rows = (0 until 25).flatMap { i =>
      val a = anchors(i); val u = dirs(i)
      Seq((3L * i, a),
        (3L * i + 1, a.zip(u).map { case (x, y) => x + 0.05 * y }),
        (3L * i + 2, a.zip(u).map { case (x, y) => x - 0.05 * y }))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 3 === 0)
    val delta = emb.filter(col("vec_id") % 3 =!= 0)
    val tcb = Similarity.trainedCells(base, perCell = 10)
    val built = Similarity.navigableGraph(base,
        Similarity.knnGraphProbed(tcb, "cell", k = 4, nprobe = 2)
          .select(col("vec_id"), col("nbr_id")),
        maxDegree = 4, maxCandidates = 8)
    val att = Similarity.navigableAttach(tcb, delta, "cell",
      maxDegree = 4, maxCandidates = 8)
    val preHealth = Similarity.navAttachHealth(base, built, att,
        maxDegree = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(preHealth._6 > 0L, "fixture must overflow before compaction")
    val compacted = Similarity.navCompact(emb, built, att,
      maxDegree = 4, maxCandidates = 8)
    // (a) degree cap — every list, base and delta alike.
    val maxDeg = compacted.groupBy("vec_id").count()
      .agg(max("count")).as[Long].head()
    assert(maxDeg <= 4L, s"compacted degree $maxDeg exceeds the cap")
    // Untouched base nodes (no appends) keep their built rows
    // bit-for-bit.
    val appendedIds = att.filter(col("kind") === "back")
      .select("vec_id").as[Long].collect().toSet
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "rank", "nbr_id", "sim_e6")
        .as[(Long, Long, Long, Long)].collect()
        .filterNot(r => appendedIds(r._1)).toSet
    assert(rowsOf(compacted.filter(col("vec_id") % 3 === 0)) ==
      rowsOf(built), "untouched lists must pass through unchanged")
    // (b) reachability preserved: BFS from the cell medoids (the
    // walk's entry set) over built ∪ attach edges vs the compacted
    // graph — on this fixture the re-prune loses no reachable node.
    val entries = Similarity.cellMedoids(tcb, "cell")
      .select("cand_id").as[Long].collect().toSet
    def reach(edges: Set[(Long, Long)]): Set[Long] = {
      val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var seen = entries
      var frontier = entries
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(seen)
        seen ++= next
        frontier = next
      }
      seen
    }
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "nbr_id").as[(Long, Long)].collect().toSet
    val before = reach(edgeSet(built.select("vec_id", "nbr_id")
      .union(att.select("vec_id", "nbr_id"))))
    val after = reach(edgeSet(compacted))
    assert(before.subsetOf(after),
      s"compaction lost reachability of ${before.diff(after)}")
    // (c) the card over the consolidated graph with an empty attach
    // history: zero debt, zero overflow.
    val post = Similarity.navAttachHealth(emb, compacted,
        att.limit(0), maxDegree = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(post._4 == 0L && post._5 == 0L && post._6 == 0L,
      s"card must read zero debt/overflow after compaction: $post")
    spark.catalog.clearCache()
  }

  test("nav delete reconnects through tombstones: absence, cap, reach") {
    // e53's contracts on the maintenance fixture: build over the
    // full anchor+twin corpus, tombstone the +δ twins (ids ≡ 1 mod
    // 3), then pin (a) deleted ids absent in BOTH directions, (b)
    // degrees ≤ cap, (c) survivors reachable before stay reachable
    // after (the bridge-through-deleted rule preserves the walk
    // paths that routed through a tombstone), (d) survivors with no
    // deleted neighbor pass through bit-for-bit.
    val rnd = new scala.util.Random(7L)
    val anchors = (0 until 25).map(_ => Seq.fill(8)(rnd.nextGaussian()))
    val dirs = (0 until 25).map(_ => Seq.fill(8)(rnd.nextGaussian()))
    val rows = (0 until 25).flatMap { i =>
      val a = anchors(i); val u = dirs(i)
      Seq((3L * i, a),
        (3L * i + 1, a.zip(u).map { case (x, y) => x + 0.05 * y }),
        (3L * i + 2, a.zip(u).map { case (x, y) => x - 0.05 * y }))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val tc = Similarity.trainedCells(emb, perCell = 10)
    val built = Similarity.navigableGraph(emb,
        Similarity.knnGraphProbed(tc, "cell", k = 4, nprobe = 2)
          .select(col("vec_id"), col("nbr_id")),
        maxDegree = 4, maxCandidates = 8)
    val delIds = (0 until 25).map(i => 3L * i + 1).toSet
    val deleted = emb.filter(col("vec_id") % 3 === 1).select("vec_id")
    val after = Similarity.navDelete(emb, built, deleted,
      maxDegree = 4, maxCandidates = 8)
    val afterRows = after
      .as[(Long, Long, Long, Long)].collect()
    // (a) absence in both directions.
    assert(!afterRows.exists(r => delIds(r._1) || delIds(r._3)),
      "tombstoned ids must vanish as both source and target")
    // (b) degree cap.
    val degs = afterRows.groupBy(_._1).map(_._2.length)
    assert(degs.max <= 4, s"degree ${degs.max} exceeds the cap")
    // (d) untouched pass-through: survivors whose built list had no
    // deleted neighbor keep identical rows.
    val builtRows = built.as[(Long, Long, Long, Long)].collect()
    val touched = builtRows.filter(r => delIds(r._3)).map(_._1).toSet
    def untouchedOf(rs: Array[(Long, Long, Long, Long)]) =
      rs.filter(r => !delIds(r._1) && !touched(r._1)).toSet
    assert(untouchedOf(afterRows) == untouchedOf(builtRows),
      "untouched survivors must keep their built lists")
    // (c) reachability: from the surviving medoids, every survivor
    // reachable over the built graph stays reachable after delete.
    val entries = Similarity.cellMedoids(tc, "cell")
      .select("cand_id").as[Long].collect().toSet.diff(delIds)
    def reach(edges: Set[(Long, Long)]): Set[Long] = {
      val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var seen = entries
      var frontier = entries
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(seen)
        seen ++= next
        frontier = next
      }
      seen
    }
    val beforeReach = reach(builtRows.map(r => (r._1, r._3)).toSet)
      .diff(delIds)
    val afterReach = reach(afterRows.map(r => (r._1, r._3)).toSet)
    assert(beforeReach.subsetOf(afterReach),
      s"delete lost survivors ${beforeReach.diff(afterReach)}")
    spark.catalog.clearCache()
  }

  test("nav delete fails loudly when emb misses a graph node") {
    // The coverage contract (round-15 advice): an emb input that
    // lacks a surviving graph node must raise, not silently drop
    // the node's edges. Drop one survivor's embedding and expect
    // the raise_error guard to fire with the documented message.
    val rnd = new scala.util.Random(11L)
    val rows = (0L until 30L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val emb = rows.toDF("vec_id", "embedding")
    val tc = Similarity.trainedCells(emb, perCell = 10)
    val built = Similarity.navigableGraph(emb,
        Similarity.knnGraphProbed(tc, "cell", k = 4, nprobe = 2)
          .select(col("vec_id"), col("nbr_id")),
        maxDegree = 4, maxCandidates = 8)
    val deleted = emb.filter(col("vec_id") % 7 === 1).select("vec_id")
    val holey = emb.filter(col("vec_id") =!= 0L)
    val ex = intercept[Exception] {
      Similarity.navDelete(holey, built, deleted,
        maxDegree = 4, maxCandidates = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("missing from emb")),
      s"expected the coverage guard, got: ${messages(ex).headOption}")
    spark.catalog.clearCache()
  }

  test("unigram-LM trainer: hand-traced prune sequence and totality") {
    // d83 on a corpus small enough to run the EM by hand:
    //   words = abab×50, ab×30, zq×2.
    // Seed counts (substring occurrences × word freq): a=130, b=130,
    // ab=130, ba/aba/bab/abab=50, z=q=zq=2, total 594. E1 winners:
    // [abab] (-2.47 beats [ab ab] -3.04), [ab], [zq] — so u1 keeps
    // only {abab:50, ab:30, zq:2}, chars floor at 1 (total 86). E2
    // reproduces u1. Prune (keep ⌈3/2⌉ = 2 of 3 multi pieces) by
    // loss = usage·(logp − best ≥2-piece alternative):
    //   ab   30·(ln(30/86) − 2·ln(1/86)) ≈ 235.7  (kept)
    //   abab 50·(ln(50/86) − 2·ln(30/86)) ≈  78.2 (kept)
    //   zq    2·(ln(2/86) − 2·ln(1/86)) ≈  10.3  (PRUNED)
    // Final E-step: abab→[abab], ab→[ab], zq→[z q], so the emitted
    // vocabulary is exactly {a,b,z,q,ab,abab} with n_used
    // 0/0/2/2/30/50 — and Σ n_used·len(piece) = 264 = Σ n·len(word)
    // (totality: every word is covered exactly by its winning
    // segmentation).
    val words = Seq(("abab", 50L), ("ab", 30L), ("zq", 2L))
      .toDF("w", "n")
    val out = graft.operators.UnigramLm.train(words)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq ==
      Seq("a", "ab", "abab", "b", "q", "z"),
      s"final vocabulary mismatch: ${out.toSeq}")
    val used = out.map(r => r._1 -> r._2).toMap
    assert(used == Map("a" -> 0L, "b" -> 0L, "z" -> 2L, "q" -> 2L,
      "ab" -> 30L, "abab" -> 50L), s"usage mismatch: $used")
    assert(out.map(r => r._2 * r._1.length).sum == 264L,
      "winning segmentations must cover the corpus exactly")
    // logp parity with the documented formula: final counts are
    // chars a/b at floor 1, z/q at 2, ab 30, abab 50 (total 86).
    val lp = out.map(r => r._1 -> r._3).toMap
    def e6(c: Long) = math.floor(math.log(c.toDouble / 86.0) * 1e6).toLong
    assert(lp("abab") == e6(50) && lp("ab") == e6(30) &&
      lp("z") == e6(2) && lp("a") == e6(1), s"logp mismatch: $lp")
  }
}
