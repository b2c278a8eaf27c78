package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed per-partition in batches.
  *
  * The Spark-side shape is real and tested — binary column + metadata
  * struct, a typed `Dataset[MediaRow]`, `mapPartitions` batch
  * processing with an iterator (never materializing a partition), and
  * a fixed-width feature-vector output schema. The DECODE step is a
  * deterministic stand-in (this container has no image/audio codecs):
  * a 16-bin byte histogram normalized by payload length, which is the
  * exact plumbing contract a real `decode → feature-extract` UDF
  * would slot into.
  *
  * At 100 TB the payload column dominates I/O: the plan projects only
  * (id, meta.n_bytes, payload), partition sizing comes from
  * `spark.sql.files.maxPartitionBytes`, and nothing here shuffles —
  * feature extraction is embarrassingly parallel over row batches.
  */
object Multimodal {

  val HistogramBins = 16

  case class MediaRow(doc_id: Long, format: String, n_bytes: Long,
      payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      feature: Array[Double])

  /** Fabricate a deterministic media table from `documents`: the
    * UTF-8 bytes of `text` stand in for an encoded media payload,
    * with typed metadata columns.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("fake/raw").as("format"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling stand-in: split the payload into `nFrames` evenly
    * spaced byte windows (a real video decoder would emit decoded
    * frames here; the iterator-in/iterator-out partition shape and
    * the one-row-to-many explode are the actual plumbing a frame
    * sampler needs). Frames of empty payloads are empty.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, nFrames: Int)
      : Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val len = r.payload.length
        val w = math.max(1, len / nFrames)
        (0 until nFrames).iterator.map { i =>
          val from = math.min(i * w, len)
          val until = if (i == nFrames - 1) len else math.min(from + w, len)
          Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }

  case class Thumb(doc_id: Long, idx: Int, byte_val: Int)

  /** Resize stand-in: nearest-neighbor downsample of the payload to a
    * fixed `width` bytes (out[i] = payload[⌊i·n/width⌋] — the stride
    * arithmetic an image thumbnailer runs per axis, in 1-D). Empty
    * payloads emit nothing. Same iterator-per-partition shape as the
    * other decode steps; output is fixed-size regardless of input
    * size, which is what makes a downstream feature store's row
    * width predictable.
    */
  def resize(spark: SparkSession, media: DataFrame, width: Int)
      : Dataset[Thumb] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        if (n == 0) Iterator.empty
        else (0 until width).iterator.map { i =>
          Thumb(r.doc_id, i, r.payload((i.toLong * n / width).toInt) & 0xFF)
        }
      }
    }
  }

  /** Deterministic stand-in for media decode + feature extraction:
    * normalized 16-bin histogram over payload bytes. Runs
    * per-partition over an iterator — the batch shape (not
    * one-object-at-a-time glue) a vectorized decoder needs.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val hist = new Array[Double](HistogramBins)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xFF) / (256 / HistogramBins)) += 1.0
          i += 1
        }
        val n = math.max(1, r.payload.length).toDouble
        var b = 0
        while (b < HistogramBins) { hist(b) /= n; b += 1 }
        MediaFeatures(r.doc_id, r.format, r.n_bytes, hist)
      }
    }
  }
}
