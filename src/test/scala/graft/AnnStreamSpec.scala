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
}
