package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run one named query at sf0.001 and show 5 rows, or dump
  * its formatted physical plan for the explain audit.
  *
  * Usage: runMain graft.Dbg <query_name> [explain] [sfDir]
  */
object Dbg {
  def main(args: Array[String]): Unit = {
    // GraftSession carries the parquet timestamp configs (nanosAsLong,
    // inferTimestampNTZ=false, UTC zone) — an ad-hoc builder here once
    // diverged and made Dbg reject queries Verify runs fine.
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.001")
    try {
      val df = SparkEntry.queries(args(0))(spark, sfDir)
      if (args.lift(1).contains("explain")) df.explain("formatted")
      else df.show(5)
    }
    catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
