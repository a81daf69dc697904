package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` payloads with a
  * typed metadata struct, processed in per-partition batches.
  *
  * The decode step is a clearly-marked deterministic STUB (the real
  * image/audio codecs are not in this container); everything around it —
  * the schema, the binary encoding, the mapPartitions batch shape, the
  * feature output schema — is the real plumbing a production decoder
  * would drop into. At scale this is the same pattern as the external
  * tool pipes: per-partition batch processing amortizing decoder init,
  * with binary payloads never touching the driver.
  */
object Multimodal {

  /** One decoded media item: the stub "decodes" the payload into its
    * bytes (a real implementation would return pixel/sample buffers).
    */
  final case class Decoded(bytes: Array[Byte])

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. Swap for a real decoder in production.
    */
  def decodeStub(payload: Array[Byte]): Decoded = Decoded(payload)

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
                                 mean_byte: Double, n_frames: Int)

  private val FrameBytes = 256 // stub frame-sampling granularity

  /** Attach a binary payload (utf-8 of the text — deterministic, so the
    * oracle can recompute digests) + typed metadata struct.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("fake/rgb8").as("format"),
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height")).as("meta"))

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int,
                         frame_md5: String)

  /** Frame sampling over the binary payload: chunk into [[FrameBytes]]
    * "frames", keep every `every`-th, emit per-frame digests — the
    * video-frame-sampling plumbing (a real implementation would seek
    * keyframes in the container; the chunk/sample/batch shape is what
    * survives the swap). One narrow flatMap, no shuffle; payload bytes
    * never leave the executor.
    */
  def sampleFrames(media: DataFrame, every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { records =>
        val md = java.security.MessageDigest.getInstance("MD5")
        records.flatMap { r =>
          val d = decodeStub(r.payload).bytes
          val nFrames = math.ceil(d.length.toDouble / FrameBytes).toInt
          (0 until nFrames by every).iterator.map { fi =>
            val start = fi * FrameBytes
            val end = math.min(start + FrameBytes, d.length)
            val digest = md.digest(java.util.Arrays.copyOfRange(d, start, end))
            Frame(r.doc_id, fi, end - start,
              digest.map(b => f"$b%02x").mkString)
          }
        }
      }
  }

  /** Per-partition batch decode + feature extraction (byte stats and a
    * frame count from the stub's FrameBytes granularity) — the Scala
    * analog of a mapInPandas batch UDF.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRecord]
      .mapPartitions { records =>
        // decoder init would happen once per partition, here
        records.map { r =>
          val d = decodeStub(r.payload)
          val n = d.bytes.length
          var s = 0L
          var i = 0
          while (i < n) { s += (d.bytes(i) & 0xff); i += 1 }
          MediaFeatures(
            doc_id = r.doc_id,
            n_bytes = n,
            mean_byte = if (n == 0) 0.0 else s.toDouble / n,
            n_frames = math.ceil(n.toDouble / FrameBytes).toInt)
        }
      }
  }
}
