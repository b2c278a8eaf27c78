package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Schema probing for the batch-incremental streaming jobs.
  *
  * A `readStream.parquet` source needs a schema up front; probing the
  * input directory is convenient for interactive use but fails hard
  * when the directory is empty or does not exist yet — which is the
  * EXPECTED state on the first scheduled run of an incremental job
  * whose upstream producer has not dropped files. The jobs therefore
  * treat an unprobeable input as "no increment yet" and exit cleanly;
  * deployments that must not depend on probe timing pass the schema
  * explicitly.
  */
object SourceSchemas {

  /** The parquet schema under `dir`, or None if the directory is
    * missing, empty, or holds no readable parquet footers.
    */
  def probe(spark: SparkSession, dir: String): Option[StructType] =
    try Some(spark.read.parquet(dir).schema)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage != null &&
            (e.getMessage.contains("Path does not exist") ||
              e.getMessage.contains("Unable to infer schema") ||
              e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("UNABLE_TO_INFER_SCHEMA")) =>
        None
    }
}
