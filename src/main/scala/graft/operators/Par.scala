package graft.operators

/** Driver-side job overlap (optimization guide §2.6): Spark happily
  * runs several jobs at once inside one application — actions are
  * only sequential because driver code calls them sequentially.
  * Independent eager build steps (per-subspace PQ codebook trains,
  * per-level hierarchical cell trains) submit from a small pool so
  * one step's straggler tail back-fills with the next step's tasks
  * instead of idling the executors. Results are positionally ordered
  * (Future.sequence), so composition order — and therefore every
  * result — is identical to the sequential form.
  */
object Par {

  def inParallel[A](tasks: Seq[() => A]): Seq[A] = {
    if (tasks.sizeIs <= 1) return tasks.map(_())
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(tasks.size, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(tasks.map(t => Future(t()))),
      Duration.Inf)
    finally pool.shutdown()
  }
}
