package graft.io

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container interchange — the row-oriented sibling of the
  * parquet/ORC round trips (q78/q137/q145): the bus format Kafka
  * pipelines and schema registries speak. Spark ships no built-in
  * `avro` source (it lives in the external spark-avro module), so this
  * sits on the PUBLIC Avro Java API (avro + avro-mapred, both on the
  * Spark classpath) with the repo's established per-partition
  * file-sink / file-per-task scan shape:
  *
  *  - write: one container file per partition, each carrying the
  *    record schema in its header (self-describing — a reader needs no
  *    side channel), blocks delimited by sync markers;
  *  - read: schema resolved once from the first container's header at
  *    the driver, then one task per file iterating records through
  *    [[FsInput]] (the Hadoop `SeekableInput` bridge), so the scan
  *    distributes file-wise exactly like [[WholeFiles]].
  *
  * Type surface: Avro primitives (boolean/int/long/float/double/
  * string/bytes), `[null, T]` unions (⇔ nullable columns), and arrays
  * of those — the columns a corpus/embedding table actually ships.
  * Logical types (decimal, timestamp) and maps/nested records are out
  * of scope and rejected loudly rather than mis-round-tripped.
  *
  * Scale shape: the writer is a narrow per-partition pass (no shuffle,
  * payloads never at the driver); the reader parallelizes over files —
  * at 100 TB the file count, not a single stream, is the unit of
  * parallelism, matching how Avro landing zones are laid out (many
  * topic-partition dumps).
  */
object Avro {

  // ---- schema mapping --------------------------------------------

  private def toAvroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, containsNull) =>
      Schema.createArray(
        if (containsNull) nullable(toAvroType(et)) else toAvroType(et))
    case other =>
      throw new IllegalArgumentException(
        s"Avro sink does not support Spark type ${other.catalogString}")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(
      Schema.create(Schema.Type.NULL), s))

  private[graft] def toAvroSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType)
      new Schema.Field(f.name,
        if (f.nullable) nullable(base) else base,
        null, null.asInstanceOf[AnyRef])
    }
    Schema.createRecord("row", null, "graft.avro", false,
      java.util.Arrays.asList(fields: _*))
  }

  private def fromAvroType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size == 2,
        s"only [null, T] unions are supported, got $s")
      (fromAvroType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = fromAvroType(s.getElementType)
      (ArrayType(et, en), false)
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  private[graft] def toStructType(record: Schema): StructType = {
    require(record.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${record.getType}")
    StructType(record.getFields.asScala.toSeq.map { f =>
      val (dt, n) = fromAvroType(f.schema())
      StructField(f.name(), dt, n)
    })
  }

  // ---- value conversion ------------------------------------------

  /** Spark value → Avro datum (writer side). */
  private def toDatum(v: Any): AnyRef = v match {
    case null => null
    case s: String => s
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] => seq.map(toDatum).asJava
    case other => other.asInstanceOf[AnyRef] // boxed primitives
  }

  /** Avro datum → Spark value (reader side). Utf8 and ByteBuffer are
    * Avro's internal carriers for string/bytes.
    */
  private def fromDatum(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case l: java.util.List[_] => l.asScala.toSeq.map(fromDatum)
    case other => other
  }

  // ---- sink / source ---------------------------------------------

  /** Write `df` as Avro object-container files, one per partition,
    * deflate-compressed. Narrow: no shuffle, each task streams its own
    * partition.
    */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) fs.delete(hPath, true)
    fs.mkdirs(hPath)
    val confBc = spark.sparkContext.broadcast(
      new HadoopConfCarrier(spark.sparkContext.hadoopConfiguration))
    val schemaJson = toAvroSchema(df.schema).toString
    val n = df.schema.size
    df.foreachPartition { (rows: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val filePath = new org.apache.hadoop.fs.Path(path,
        f"part-${TaskContext.getPartitionId()}%05d.avro")
      val fsw = filePath.getFileSystem(confBc.value.toConf)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      val out = fsw.create(filePath, true)
      try {
        writer.create(schema, out) // takes ownership of `out`
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < n) { rec.put(i, toDatum(r.get(i))); i += 1 }
          writer.append(rec)
        }
      } finally writer.close()
    }
  }

  /** Read a directory of Avro container files as a DataFrame: schema
    * from the first file's self-describing header, one task per file.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val files = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no .avro files under $path")
    val headerReader = new DataFileReader[GenericRecord](
      new FsInput(new org.apache.hadoop.fs.Path(files.head), conf),
      new GenericDatumReader[GenericRecord]())
    val avroSchema = try headerReader.getSchema finally headerReader.close()
    val structType = toStructType(avroSchema)
    val schemaJson = avroSchema.toString
    val nFields = structType.size
    val confBc = spark.sparkContext.broadcast(new HadoopConfCarrier(conf))
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { file =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new org.apache.hadoop.fs.Path(file), confBc.value.toConf),
          new GenericDatumReader[GenericRecord](schema))
        // a limit/take that stops pulling mid-file would otherwise leak
        // the open stream until executor GC — close on task completion
        // regardless of how far the iterator got
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
          _ => try reader.close() catch { case _: Throwable => () }
        })
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            val h = !closed && reader.hasNext
            if (!h && !closed) { reader.close(); closed = true }
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq((0 until nFields).map(i => fromDatum(rec.get(i))))
          }
        }
      }
    spark.createDataFrame(rows, structType)
  }
}
