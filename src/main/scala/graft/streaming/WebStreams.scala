package graft.streaming

import graft.io.Warc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Streaming twin of the WEB-CRAWL ingest path — the batch/stream
  * parity contract the events (q86-q88), documents (q88), and FASTQ
  * (q116) paths carry, for WARC: crawl archives land as files (a
  * fetcher's output bucket, a Common-Crawl snapshot sync) and flow
  * through the IDENTICAL record parse the batch reader uses
  * ([[Warc.parseFile]] — one code path, no drift).
  *
  * Source shape: `binaryFile` file-stream — files are the atomic
  * micro-batch unit, so a WARC record (or a gzip member) can never
  * straddle a batch boundary. Crawls shard into many ~1 GiB files
  * (Warc.scala's scale contract), which is exactly the unit this
  * source parallelizes over.
  */
object WebStreams {

  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Streaming WARC records from a directory of `.warc(.gz)` files —
    * the batch reader's exact output schema (file, recordId, warcType,
    * targetUri, date, httpStatus, httpContentType, body).
    */
  def readWarcStream(spark: SparkSession, path: String,
                     glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .schema(BinaryFileSchema)
      .load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => Warc.parseFile(p, bytes) }
      .toDF("file", "recordId", "warcType", "targetUri", "date",
        "httpStatus", "httpContentType", "body")
  }
}
