package graft

import org.apache.spark.sql.functions._

import graft.functions.AlphaPruneKept.alpha_prune

/** Kernel-equivalence pin for the compiled RobustPrune
  * ([[graft.functions.AlphaPruneKept]]) against the interpreted
  * `array_sort` + `aggregate`/`exists`/`zip_with` higher-order chain
  * it replaced in Similarity.alphaPrune (round-16 optimization) — the
  * TextHashKernelSpec discipline: the kernel must reproduce the HOF's
  * output bit-for-bit on a dense deterministic corpus, including the
  * greedy keep ORDER, the e6 fixed-point domination rule, and the
  * degree cap.
  */
class AlphaPruneSpec extends SparkSpec {
  import spark.implicits._

  private def hofKept(maxDegree: Int, alpha100: Long) = expr(
    s"""aggregate(
       |  array_sort(transform(cands, c -> struct(-c.se AS ns, c.nbr,
       |    c.se, c.nrm, c.e))),
       |  cast(array() as array<struct<ns:bigint,nbr:bigint,
       |    se:bigint,nrm:double,e:array<double>>>),
       |  (acc, c) -> if(size(acc) < $maxDegree and not exists(acc,
       |      b -> $alpha100 * (1000000 - floor(
       |        aggregate(zip_with(b.e, c.e, (x, y) -> x * y),
       |          cast(0 as double), (s, v) -> s + v)
       |        / (b.nrm * c.nrm) * 1000000.0d + 0.5d))
       |      <= 100 * (1000000 - c.se)),
       |    array_append(acc, c), acc))""".stripMargin
      .replaceAll("\n\\s*", " "))

  test("alpha_prune kernel == interpreted HOF chain, incl. order") {
    // Deterministic clustered-ish 8-dim vectors: integer-grid
    // coordinates so cosines land on ties often enough to exercise
    // the (se DESC, nbr ASC) order and the domination boundary.
    val dims = 8
    def vec(i: Long): Seq[Double] =
      (0 until dims).map(d => ((i * 31 + d * 17) % 7 + 1).toDouble)
    def nrm(v: Seq[Double]): Double =
      math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))
    def cosE6(a: Seq[Double], b: Seq[Double]): Long = {
      var s = 0.0; var j = 0
      while (j < dims) { s += a(j) * b(j); j += 1 }
      Math.floor(s / (nrm(a) * nrm(b)) * 1000000.0 + 0.5).toLong
    }
    // 40 nodes; each node's candidate list = 24 other nodes picked
    // deterministically, scored on the e6 grid (exactly the shape
    // alphaPrune's collect_list produces).
    val rows = for {
      v <- 0L until 40L
      c <- 1 to 24
      n = (v + c * 7) % 40 if n != v
    } yield (v, n, cosE6(vec(v), vec(n)), nrm(vec(n)), vec(n))
    val cands = rows.toDF("vec_id", "nbr", "se", "nrm", "e")
      .groupBy("vec_id")
      .agg(collect_list(struct(col("nbr"), col("se"), col("nrm"),
        col("e"))).as("cands"))
    for ((alpha, deg) <- Seq((120L, 4), (120L, 16), (100L, 8), (200L, 2))) {
      val got = cands
        .select(col("vec_id"),
          alpha_prune(col("cands"), alpha, deg).as("kept"))
        .select(col("vec_id"),
          expr("transform(kept, s -> struct(s.nbr, s.se))").as("k"))
        .as[(Long, Seq[(Long, Long)])].collect().toMap
      val want = cands
        .select(col("vec_id"), hofKept(deg, alpha).as("kept"))
        .select(col("vec_id"),
          expr("transform(kept, s -> struct(s.nbr, s.se))").as("k"))
        .as[(Long, Seq[(Long, Long)])].collect().toMap
      assert(got.keySet == want.keySet, s"alpha=$alpha deg=$deg")
      for ((k, w) <- want)
        assert(got(k) == w, s"node $k alpha=$alpha deg=$deg: " +
          s"kernel ${got(k)} vs HOF $w")
      assert(want.values.exists(_.nonEmpty))
      // the cap binds somewhere at deg=2 so the test isn't vacuous
      if (deg == 2) assert(want.values.exists(_.size == 2))
    }
  }
}
