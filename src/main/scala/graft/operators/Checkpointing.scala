package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cuts for the iterative operators (PageRank, connected
  * components, BFS, k-means, the curation funnel): every cut site
  * routes through [[cut]], which picks the materialization mode from
  * one session-level switch.
  *
  *   - Default (`graft.checkpoint.reliable` unset/false):
  *     `localCheckpoint(eager = true)` — blocks live in executor
  *     block managers, zero filesystem traffic. The right call on
  *     local[32] and on clusters where a lost executor is acceptable
  *     grounds to re-run the job: losing an executor loses its
  *     blocks, and the TRUNCATED lineage cannot recompute them.
  *   - Reliable (`spark.conf.set("graft.checkpoint.reliable", true)`
  *     plus `sparkContext.setCheckpointDir(dir)` — HDFS/object-store
  *     in production): `checkpoint(eager = true)` writes each cut to
  *     the checkpoint directory, so executor loss is recoverable at
  *     the cost of a write+read round trip per cut. Measured locally
  *     (sf0.001, tmpfs-backed dir): ~1.4× the localCheckpoint wall
  *     time for the 10-iteration PageRank chain — the price is the
  *     serialize-to-file, and it buys cluster fault tolerance.
  *
  * One knob rather than per-operator parameters so a deployment
  * flips EVERY iterative path at once — a cluster job that needs
  * fault-tolerant PageRank needs the same for the funnel gates
  * feeding it. Results are bit-identical either way (spec-checked in
  * CheckpointingSpec): the mode changes where blocks live, never the
  * plan.
  */
object Checkpointing {

  val ReliableKey = "graft.checkpoint.reliable"

  /** Test-only plan capture: with `graft.debug.capturePlans` set
    * true on the session, every frame passed through [[cut]] records
    * its OPTIMIZED logical plan here before materializing. Eager
    * per-round cuts make iterative operators' round plans invisible
    * to the returned frame's `.explain` (it reads a checkpoint
    * scan); this hook is how PlanShapeSpec pins invariants INSIDE
    * the rounds — e.g. that a filtered walk's predicate sits below
    * the per-round ranking window. Off (the default) it costs one
    * conf lookup per cut.
    */
  val CaptureKey = "graft.debug.capturePlans"
  val capturedPlans =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Chained form: `df.lineageCut` ≡ `Checkpointing.cut(df)`. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def lineageCut: DataFrame = Checkpointing.cut(df)
  }

  /** Materialize `df` eagerly and truncate its lineage, in the
    * session-selected mode.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // Bounded at 256: a capture flag left on across a long session
    // must not grow a JVM-global queue without limit (tests clear()
    // before use, so the bound never bites a real pin).
    if (spark.conf.getOption(CaptureKey).exists(_.toBoolean) &&
        capturedPlans.size < 256)
      capturedPlans.add(df.queryExecution.optimizedPlan.toString)
    val reliable =
      spark.conf.getOption(ReliableKey).exists(_.toBoolean)
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableKey=true requires sparkContext.setCheckpointDir " +
          "(an HDFS/object-store path on a cluster)")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }
}
