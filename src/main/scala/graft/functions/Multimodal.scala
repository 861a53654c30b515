package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * Spark-side plumbing is real: schema, batch-wise per-partition transforms
  * (the Scala analogue of `mapInPandas` — `mapPartitions` over an Iterator,
  * amortizing per-batch model/codec setup), partitioning, and
  * metadata extraction via native expressions. The codec itself (JPEG
  * decode, audio resample, video frame-sample) is STUBBED with a
  * deterministic fake — the decode libraries are not in this container —
  * clearly marked below; swapping in a real codec changes only the body of
  * `decodeStub`.
  */
object Multimodal {

  /** Typed metadata extracted without decoding: byte length, digest, magic
    * bytes — pure expressions, pushdown-friendly. */
  def binaryMetadata(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(binCol)).as("n_bytes"),
      md5(col(binCol)).as("digest"),
      hex(substring(col(binCol), 1, 4)).as("magic")
    )

  final case class DecodedMedia(id: Long, width: Int, height: Int, frames: Int, checksum: Long)

  /** STUB decode: deterministic fake standing in for the real codec.
    * Real implementation would decode `bytes` (e.g. via javax.imageio /
    * ffmpeg bindings); the Spark plumbing — per-partition batching, typed
    * output schema, no driver round-trips — is the part under test. */
  private def decodeStub(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val checksum = bytes.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    DecodedMedia(
      id = id,
      width = 16 + (math.abs(checksum) % 1024).toInt,
      height = 16 + (math.abs(checksum >> 10) % 1024).toInt,
      frames = 1 + (math.abs(checksum >> 20) % 120).toInt, // fake frame count
      checksum = checksum
    )
  }

  /** Batch decode: mapPartitions so a real codec would be initialized once
    * per partition (the `mapInPandas` batch shape), not once per row. */
  def decode(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** "Resize"/feature-extract stage over decoded media — placeholder
    * arithmetic with the real pipeline shape (narrow, no shuffle). */
  def thumbnailPlan(decoded: Dataset[DecodedMedia], maxDim: Int): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      (m.id, (m.width * scale).toInt.max(1), (m.height * scale).toInt.max(1))
    }.toDF("id", "thumb_w", "thumb_h")
  }

  /** Frame sampling over decoded video: every `everyK`-th frame index per
    * media item (the row-per-frame shape a real frame extractor feeds into
    * the vision encoder). Expression-only — `sequence` builds the index
    * array, no decode round-trip; swapping the stub for a real codec keeps
    * this stage unchanged. Narrow (no shuffle): frames explode in place. */
  def frameSamplePlan(decoded: Dataset[DecodedMedia], everyK: Int): DataFrame =
    decoded.toDF()
      .select(col("id"), col("frames"),
        sequence(lit(0), col("frames") - 1, lit(everyK)).as("frame_idx"))
}
