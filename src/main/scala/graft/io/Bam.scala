package graft.io

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, GZIPInputStream}

/** BAM binary source/sink (SURVEY.md S2/K5 completion; reference reads
  * real `.bam` via hadoop-bam at SQLQueryBAM.java:63-66 and writes with a
  * broadcast header at HDFSWriter.java:62-107).
  *
  * Implemented from the PUBLIC SAM v1 specification only (§4: BGZF
  * framing, §4.2: alignment record layout) — no htsjdk/hadoop-bam:
  *  - BGZF is a series of standards-conformant gzip members (each with a
  *    BC extra subfield carrying the block size), so DECODING rides on
  *    `GZIPInputStream`, which consumes concatenated members natively;
  *  - ENCODING emits real BGZF: ≤64 KiB deflate blocks with the BC
  *    subfield plus the fixed 28-byte EOF sentinel block, so external
  *    spec-compliant tools can read what we write.
  *
  * Parallelism model: one task per file ([[read]] uses the binaryFile
  * source), matching [[Fastq.read]] — BAM corpora arrive as many
  * per-sample files. [[write]] emits one BAM per partition with the
  * header replicated into each file — exactly the reference's
  * KeyIgnoringBAMOutputFormat header-broadcast design, minus the
  * driver-side header mutation. A splittable single-huge-file reader
  * would chunk on BGZF block magics; out of scope while whole-file
  * parallelism covers the corpus layout.
  */
object Bam {

  private val SeqCode = "=ACMGRSVTWYHKDBN"
  private val CigarOps = "MIDNSHP=X"

  /** Fixed BGZF end-of-file sentinel block (SAM spec §4.1.2). */
  private val BgzfEof: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00).map(_.toByte)

  // ---------- read ----------

  /** Read BAM files into the same typed alignment shape as
    * [[SamText.read]] (readName, flag, referenceName, start, mapq, cigar,
    * bases, quality + derived length/flag-bit columns), so the two
    * sources are drop-in interchangeable.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bam").load(path)
      .select("content").as[Array[Byte]]
    val rows = raw.flatMap(parseBam)
      .toDF("readName", "flag", "referenceName", "start", "mapq", "cigar",
        "bases", "quality")
    rows
      .withColumn("length", length(col("bases")))
      .withColumn("readUnmapped", SamText.flagBit(col("flag"), 4))
      .withColumn("duplicateRead", SamText.flagBit(col("flag"), 1024))
      .withColumn("firstOfPair", SamText.flagBit(col("flag"), 64))
      .withColumn("secondOfPair", SamText.flagBit(col("flag"), 128))
  }

  /** Decode one whole BAM file (BGZF → uncompressed BAM → records).
    * Exposed for spec-fixture tests.
    */
  private[graft] def parseBam(bam: Array[Byte])
      : Iterator[(String, Int, String, Int, Int, String, String, String)] = {
    val data = new GZIPInputStream(new ByteArrayInputStream(bam)).readAllBytes()
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, 0, 3, US_ASCII) == "BAM" && magic(3) == 1,
      "not a BAM file (bad magic)")
    val lText = bb.getInt
    bb.position(bb.position() + lText) // SAM-text header (schema is binary)
    val nRef = bb.getInt
    val refs = (0 until nRef).map { _ =>
      val lName = bb.getInt
      val nameBytes = new Array[Byte](lName)
      bb.get(nameBytes)
      bb.getInt // l_ref (sequence length, unused here)
      new String(nameBytes, 0, lName - 1, US_ASCII) // strip NUL
    }

    new Iterator[(String, Int, String, Int, Int, String, String, String)] {
      override def hasNext: Boolean = bb.remaining() >= 4
      override def next(): (String, Int, String, Int, Int, String, String, String) = {
        val blockSize = bb.getInt
        val end = bb.position() + blockSize
        val refID = bb.getInt
        val pos = bb.getInt // 0-based; -1 when unmapped
        val lReadName = bb.get() & 0xff
        val mapq = bb.get() & 0xff
        bb.getShort // bin (index hint, unused)
        val nCigar = bb.getShort & 0xffff
        val flag = bb.getShort & 0xffff
        val lSeq = bb.getInt
        bb.getInt; bb.getInt; bb.getInt // next_refID, next_pos, tlen
        val nameBytes = new Array[Byte](lReadName)
        bb.get(nameBytes)
        val name = new String(nameBytes, 0, lReadName - 1, US_ASCII)
        val cigar =
          if (nCigar == 0) "*"
          else (0 until nCigar).map { _ =>
            val v = bb.getInt
            s"${v >>> 4}${CigarOps(v & 0xf)}"
          }.mkString
        val seqBytes = new Array[Byte]((lSeq + 1) / 2)
        bb.get(seqBytes)
        val bases =
          if (lSeq == 0) "*"
          else {
            val sb = new StringBuilder(lSeq)
            var i = 0
            while (i < lSeq) {
              val b = seqBytes(i / 2) & 0xff
              sb.append(SeqCode(if (i % 2 == 0) b >>> 4 else b & 0xf))
              i += 1
            }
            sb.toString
          }
        val qualBytes = new Array[Byte](lSeq)
        bb.get(qualBytes)
        val quality =
          if (lSeq == 0 || (qualBytes(0) & 0xff) == 0xff) "*"
          else {
            val sb = new StringBuilder(lSeq)
            qualBytes.foreach(q => sb.append((q + 33).toChar))
            sb.toString
          }
        bb.position(end) // skip optional tags
        val refName = if (refID < 0 || refID >= refs.length) "*" else refs(refID)
        (name, flag, refName, pos + 1, mapq, cigar, bases, quality)
      }
    }
  }

  // ---------- write ----------

  /** Write a BAM file per partition, header (refs) replicated into each —
    * the broadcast-header pattern (HDFSWriter.java:247-315). Expects the
    * SAM-text sink's columns: readName, flag, referenceName, start, mapq,
    * cigar, bases, quality. `refs` = (name, length) per reference
    * sequence; records whose referenceName is absent write refID -1.
    */
  def write(df: DataFrame, path: String, refs: Seq[(String, Int)] = Nil): Unit = {
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) fs.delete(hPath, true)
    fs.mkdirs(hPath)
    val refsBc = spark.sparkContext.broadcast(refs)
    val confBc = spark.sparkContext.broadcast(
      new ConfCarrier(spark.sparkContext.hadoopConfiguration))

    df.select(col("readName"), col("flag").cast("int"),
        coalesce(col("referenceName"), lit("*")).as("referenceName"),
        coalesce(col("start").cast("int"), lit(0)).as("start"),
        coalesce(col("mapq").cast("int"), lit(0)).as("mapq"),
        coalesce(col("cigar"), lit("*")).as("cigar"),
        col("bases"), col("quality"))
      .foreachPartition { (rows: java.util.Iterator[org.apache.spark.sql.Row]) =>
        val part = TaskContext.getPartitionId()
        val localRefs = refsBc.value
        val out = new java.io.ByteArrayOutputStream()
        // header payload
        val headerText = ("@HD\tVN:1.6\n" +
          localRefs.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString).getBytes(US_ASCII)
        val head = ByteBuffer.allocate(12 + headerText.length +
          localRefs.map(r => 8 + r._1.length + 1).sum).order(ByteOrder.LITTLE_ENDIAN)
        head.put("BAM".getBytes(US_ASCII)).put(1.toByte)
        head.putInt(headerText.length)
        head.put(headerText)
        head.putInt(localRefs.length)
        localRefs.foreach { case (n, l) =>
          val nb = n.getBytes(US_ASCII)
          head.putInt(nb.length + 1)
          head.put(nb).put(0.toByte)
          head.putInt(l)
        }
        out.write(bgzfBlock(head.array(), 0, head.array().length))
        // Records are a BYTE stream chunked into ≤60 KiB uncompressed
        // BGZF payloads INDEPENDENT of record boundaries (BAM records may
        // legally span blocks, spec §4.1) — a single long-read record can
        // exceed any per-record batch, and BSIZE is uint16, so flushing on
        // record boundaries could overflow a block. 60 KiB + worst-case
        // deflate expansion + 26 bytes framing stays safely under 65536.
        val chunk = 60 * 1024
        val batch = new java.io.ByteArrayOutputStream()
        def drain(force: Boolean): Unit =
          if (batch.size() >= chunk || (force && batch.size() > 0)) {
            val bytes = batch.toByteArray
            var off = 0
            while (bytes.length - off >= chunk) {
              out.write(bgzfBlock(bytes, off, chunk)); off += chunk
            }
            if (force && bytes.length > off) {
              out.write(bgzfBlock(bytes, off, bytes.length - off)); off = bytes.length
            }
            batch.reset()
            if (off < bytes.length) batch.write(bytes, off, bytes.length - off)
          }
        rows.forEachRemaining { r =>
          batch.write(encodeRecord(localRefs, r.getString(0), r.getInt(1),
            r.getString(2), r.getInt(3), r.getInt(4), r.getString(5),
            r.getString(6), r.getString(7)))
          drain(force = false)
        }
        drain(force = true)
        out.write(BgzfEof)

        val filePath = new org.apache.hadoop.fs.Path(path, f"part-$part%05d.bam")
        // executor-side FS resolved from the SESSION's hadoop conf (not a
        // bare `new Configuration()`, which would drop defaultFS/credential
        // settings and only ever write to the local FS)
        val fsw = filePath.getFileSystem(confBc.value.toConf)
        val stream = fsw.create(filePath, true)
        try stream.write(out.toByteArray) finally stream.close()
      }
  }

  /** Serializable carrier for the driver's hadoopConfiguration (the
    * Hadoop `Configuration` class itself is not `Serializable`).
    */
  private class ConfCarrier(@transient conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private val entries: Array[(String, String)] = {
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    def toConf: org.apache.hadoop.conf.Configuration = {
      val c = new org.apache.hadoop.conf.Configuration(false)
      entries.foreach { case (k, v) => c.set(k, v) }
      c
    }
  }

  /** One gzip member with the BGZF BC extra subfield (spec §4.1.1). */
  private def bgzfBlock(payload: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(payload, off, len)
    deflater.finish()
    val cdata = new Array[Byte](len + 64)
    var n = 0
    while (!deflater.finished()) n += deflater.deflate(cdata, n, cdata.length - n)
    deflater.end()
    val crc = new CRC32()
    crc.update(payload, off, len)
    val total = n + 26 // 12 hdr + 6 extra + cdata + 4 crc + 4 isize
    // BSIZE is uint16 (= total - 1): the spec's hard 64 KiB block bound.
    // Callers keep uncompressed payloads ≤ 60 KiB so this cannot trip.
    require(total <= 65536,
      s"BGZF block overflow: $total bytes compressed (payload len=$len)")
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x1f.toByte).put(0x8b.toByte).put(8.toByte).put(4.toByte) // FEXTRA
    buf.putInt(0) // mtime
    buf.put(0.toByte).put(0xff.toByte) // xfl, os=unknown
    buf.putShort(6.toShort) // xlen
    buf.put('B'.toByte).put('C'.toByte).putShort(2.toShort)
    buf.putShort((total - 1).toShort) // BSIZE (total block size - 1)
    buf.put(cdata, 0, n)
    buf.putInt(crc.getValue.toInt)
    buf.putInt(len)
    buf.array()
  }

  private def encodeRecord(refs: Seq[(String, Int)], name: String, flag: Int,
                           refName: String, start: Int, mapq: Int, cigar: String,
                           bases: String, quality: String): Array[Byte] = {
    val refID = refs.indexWhere(_._1 == refName) // -1 for "*"/unknown
    val nameBytes = name.getBytes(US_ASCII)
    val cigarOps: Seq[Int] =
      if (cigar == null || cigar == "*") Seq.empty
      else "(\\d+)([MIDNSHP=X])".r.findAllMatchIn(cigar)
        .map(m => (m.group(1).toInt << 4) | CigarOps.indexOf(m.group(2).charAt(0)))
        .toSeq
    val seq = if (bases == null || bases == "*") "" else bases
    val lSeq = seq.length
    // Catch length desync BEFORE allocating: a short quality would leave
    // the tail as phred-0 zeros (corrupt but parseable), a long one would
    // throw BufferOverflow mid-write and leave a partial file behind.
    require(quality == null || quality == "*" || quality.length == lSeq,
      s"quality length ${if (quality == null) -1 else quality.length} != " +
        s"sequence length $lSeq for read '$name'")
    val size = 32 + nameBytes.length + 1 + 4 * cigarOps.length + (lSeq + 1) / 2 + lSeq
    val bb = ByteBuffer.allocate(4 + size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(size)
    bb.putInt(refID)
    bb.putInt(start - 1) // SAM 1-based → BAM 0-based (0 → -1 unmapped)
    bb.put((nameBytes.length + 1).toByte)
    bb.put(mapq.toByte)
    bb.putShort(0.toShort) // bin (index hint; not needed without a BAI)
    bb.putShort(cigarOps.length.toShort)
    bb.putShort(flag.toShort)
    bb.putInt(lSeq)
    bb.putInt(-1) // next_refID
    bb.putInt(-1) // next_pos
    bb.putInt(0) // tlen
    bb.put(nameBytes).put(0.toByte)
    cigarOps.foreach(v => bb.putInt(v))
    def nib(c: Char): Int = SeqCode.indexOf(Character.toUpperCase(c)) match {
      case -1 => 15 // unknown base → N
      case v => v
    }
    var i = 0
    while (i < lSeq) {
      val hi = nib(seq.charAt(i))
      val lo = if (i + 1 >= lSeq) 0 else nib(seq.charAt(i + 1))
      bb.put(((hi << 4) | lo).toByte)
      i += 2
    }
    if (quality == null || quality == "*") (0 until lSeq).foreach(_ => bb.put(0xff.toByte))
    else quality.foreach(q => bb.put((q - 33).toByte))
    bb.array()
  }
}
