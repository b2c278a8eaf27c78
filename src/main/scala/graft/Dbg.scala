package graft
import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001").show(5)
    catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
