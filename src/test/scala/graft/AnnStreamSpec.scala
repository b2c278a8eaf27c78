package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.KMeans
import graft.streaming.AnnStream

object AnnStreamSpec {
  case class Vec(vec_id: Long, ingest_ts: Timestamp,
      embedding: Seq[Double])
}

/** Online ANN against a static learned index: the compiled
  * nearest-centroid kernel and the bounded-heap top-k aggregate
  * running under Structured Streaming, parity-checked against the
  * identical plan on a static frame (ONE definition, both engines —
  * the jsonTypeCounts pattern).
  */
class AnnStreamSpec extends SparkSpec {
  import spark.implicits._
  import AnnStreamSpec.Vec

  test("streaming probe equals the batch plan; kernel assigns map-side") {
    // Three tight cones; cells learned by the e7 trainer.
    val rnd = new scala.util.Random(3L)
    val anchors = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
      Seq(0.0, 0.0, 1.0))
    val corpus = (0 until 30).map { i =>
      (i.toLong, anchors(i % 3).map(_ + rnd.nextGaussian() * 0.05))
    }
    val emb = corpus.toDF("vec_id", "embedding")
    val cent = KMeans.train(emb, k = 3, iters = 2)
    val index = KMeans.withCells(emb, cent)

    val qs = Seq(
      Vec(1000L, new Timestamp(600000L), Seq(0.9, 0.1, 0.0)),
      Vec(1001L, new Timestamp(660000L), Seq(0.0, 0.05, 1.1)))

    // The SAME definition on a static frame is the expected result.
    val want = AnnStream.probeTopK(qs.toDF(), index, cent, k = 3)
      .select(col("query_id"), col("rank").cast("long"), col("cand_id"),
        col("sim"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(want.size == 6) // 2 queries × top-3

    val stream = MemoryStream[Vec](spark)
    val q = AnnStream.probeTopK(stream.toDF(), index, cent, k = 3)
      .writeStream.format("memory").queryName("ann_t")
      .outputMode("complete").start()
    try {
      stream.addData(qs: _*)
      q.processAllAvailable()
      val got = spark.table("ann_t")
        .select(col("query_id"), col("rank").cast("long"), col("cand_id"),
          col("sim"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == want)
      // Each query's neighbors come from its own cone (vec_id % 3
      // matches the anchor the query sits on).
      val byQuery = got.groupBy(_._1)
      assert(byQuery(1000L).forall(_._3 % 3 == 0))
      assert(byQuery(1001L).forall(_._3 % 3 == 2))
    } finally q.stop()
  }

  test("streaming PQ encode equals batch codes, stateless map-side") {
    // 4-dim vectors, M = 2 subspaces x 2 dims; codebooks trained by
    // the same KMeans on the corpus slices (e11's storage step).
    val rnd = new scala.util.Random(7L)
    val anchors = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val corpus = (0 until 24).map { i =>
      (i.toLong, (anchors(i % 2) ++ anchors((i / 2) % 2))
        .map(_ + rnd.nextGaussian() * 0.05))
    }
    val emb = corpus.toDF("vec_id", "embedding")
    val books = (0 until 2).map { m =>
      KMeans.train(emb.select(col("vec_id"),
          expr(s"slice(embedding, ${m * 2 + 1}, 2)").as("embedding")),
          k = 2, iters = 2)
        .select(col("cell").cast("long"), col("cvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    }
    val want = AnnStream.pqEncode(emb, books, subDims = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(want.size == 24 && want.forall(r => r._2 < 2 && r._3 < 2))

    val rows = corpus.map { case (id, e) =>
      Vec(id, new Timestamp(600000L + id * 1000), e) }
    val stream = MemoryStream[Vec](spark)
    val q = AnnStream.pqEncode(stream.toDF(), books, subDims = 2)
      .writeStream.format("memory").queryName("pq_t")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("pq_t")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want)
      // Codes separate the planted subspace clusters: vectors
      // sharing a subspace anchor share that subspace's code.
      val byCode0 = got.groupBy(_._2).values.map(_.map(_._1 % 2).toSet)
      assert(byCode0.forall(_.size == 1))
    } finally q.stop()
  }

  test("parity: streaming sq8Encode equals the batch quantization") {
    // Scale invariance is the SQ8 contract: vec 2 = 2 × vec 1 must
    // produce identical codes; the max-|v| component must hit ±127.
    val corpus = Seq(
      (1L, Array(1.0, -2.0, 4.0, 0.5)),
      (2L, Array(2.0, -4.0, 8.0, 1.0)),
      (3L, Array(-3.0, 0.0, 1.5, 3.0)))
    val emb = corpus.toDF("vec_id", "embedding")
    val want = graft.operators.Similarity.sq8Quantize(emb)
      .as[(Long, Seq[Long], Long)].collect().toMap2
    assert(want(1L)._1 == Seq(32L, -63L, 127L, 16L)) // round-half-up
    assert(want(1L) == want(2L))
    assert(want(3L)._1.map(math.abs).max == 127L)

    val rows = corpus.map { case (id, e) =>
      Vec(id, new Timestamp(600000L + id * 1000), e) }
    val stream = MemoryStream[Vec](spark)
    val q = AnnStream.sq8Encode(stream.toDF())
      .select("vec_id", "q", "sq")
      .writeStream.format("memory").queryName("sq8_t")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("sq8_t")
        .as[(Long, Seq[Long], Long)].collect().toMap2
      assert(got == want)
    } finally q.stop()
  }

  test("parity: streaming bqEncode equals the batch sign packing") {
    // 4 dims of each half carry the signal; zero is NOT > 0 (the
    // documented bq contract), so vec 3's zeros pack as 0-bits.
    val corpus = Seq(
      (1L, Array.fill(64)(1.0)),
      (2L, Array.fill(32)(-1.0) ++ Array.fill(32)(2.0)),
      (3L, Array.fill(64)(0.0)))
    val emb = corpus.toDF("vec_id", "embedding")
    val want = graft.operators.Similarity.bqQuantize(emb)
      .select("vec_id", "hi", "lo")
      .as[(Long, Long, Long)].collect().toSet
    val full = (1L << 32) - 1
    assert(want == Set((1L, full, full), (2L, 0L, full), (3L, 0L, 0L)))

    val rows = corpus.map { case (id, e) =>
      Vec(id, new Timestamp(600000L + id * 1000), e) }
    val stream = MemoryStream[Vec](spark)
    val q = AnnStream.bqEncode(stream.toDF())
      .select("vec_id", "hi", "lo")
      .writeStream.format("memory").queryName("bq_t")
      .outputMode("append").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("bq_t")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  private implicit class ToMap2(rows: Array[(Long, Seq[Long], Long)]) {
    def toMap2: Map[Long, (Seq[Long], Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
