package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming windowed aggregation, fed the sf0.001 events parquet as
  * a file stream, must reproduce the batch q40 result exactly.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming windowedCounts matches the batch tumbling-window result") {
    val dir = "/root/testdata/sf0.001"
    // File streams need a directory to watch — stage the table in one.
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStreams.readEventStream(spark, streamDir.toString)
    val agg = EventStreams.windowedCounts(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not terminate")

    val streamed = spark.table("win_counts")
      .select("win", "event_type", "n", "total")
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Events.queries("q40_tumbling_window")(spark, dir)
      .select(col("win"), col("event_type"), col("n"), col("total"))
      .collect().map(_.toSeq).toSet
    val onlyStream = streamed -- batch
    val onlyBatch = batch -- streamed
    assert(onlyStream.isEmpty && onlyBatch.isEmpty,
      s"onlyStream=${onlyStream.take(5)} onlyBatch=${onlyBatch.take(5)} " +
        s"sizes=${streamed.size}/${batch.size}")
  }

  test("dedupStream drops duplicate event ids within the watermark") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    // duplicate the events file → every event_id arrives twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      streamDir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      streamDir.resolve("b.parquet"))
    val stream = EventStreams.readEventStream(spark, streamDir.toString)
    val deduped = EventStreams.dedupStream(stream, "event_id")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not terminate")
    val n = spark.table("dedup_stream").count()
    val expected = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    assert(n == expected, s"deduped $n vs source $expected")
  }

  test("curateStream applies the batch quality/lang gates and dedups online") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // plant an exact duplicate of doc 0 under a new id
    val dup = docs.filter(col("doc_id") === 0L)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val staged = docs.unionAll(dup)
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val dir = java.nio.file.Files.createTempDirectory("graft_doc_stream").toString
    staged.coalesce(1).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(staged.schema).parquet(dir)
    val curated = graft.streaming.DocStreams.curateStream(stream, "ts")
    val q = curated.writeStream
      .outputMode("append").format("memory")
      .queryName("curate_stream").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate")
    val kept = spark.table("curate_stream")
      .select("doc_id").as[Long].collect().toSet

    // batch twin of the same gates: one keeper per fingerprint group
    val gated = staged
      .filter(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.3)
      .filter(graft.functions.TextFunctions.langId(col("text")) === "en")
    val batchKeepers = gated
      .groupBy(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("doc_id")).select("doc_id").as[Long].collect().toSet
    // within one micro-batch "first seen" is arrival-order, so compare
    // group COUNTS plus the planted-dup collapse, not exact keeper ids
    assert(kept.size == batchKeepers.size, s"${kept.size} vs ${batchKeepers.size}")
    assert(!(kept.contains(0L) && kept.contains(100000L)), "dup not collapsed")
  }

  test("scrubStream matches the batch scrub+redact composition and holds NO state") {
    import spark.implicits._
    val patterns = Seq("spark", "join", "stream")
    val docs = Seq(
      (1L, "a spark job with a stream inside and user@mail.example.com"),
      (2L, "call 555-123-4321 to join the sparkstream team"),
      (3L, "nothing to scrub here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_scrub_stream").toString
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.DocStreams
      .scrubStream(spark.readStream.schema(docs.schema).parquet(dir), patterns)
      .writeStream.outputMode("append").format("memory")
      .queryName("scrub_stream").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not terminate")
    // stateless by construction: no state-store operators in the plan
    assert(q.lastProgress.stateOperators.isEmpty,
      "scrubStream must not allocate streaming state")
    val got = spark.table("scrub_stream").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    // batch twin: the identical operator composition over a batch frame
    val batch = graft.streaming.DocStreams.scrubStream(docs, patterns)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getString(5)))).toMap
    assert(got == batch)
    // spot-check the audit row: doc 1 scrubs 2 spans and redacts 1 email
    assert(got(1L)._1 == 2 && got(1L)._3 == 1)
    // doc 2: "join" inside "sparkstream"? — 'spark'+'stream' adjoin into
    // ONE covered run after 'join' matched separately; phone redacted
    assert(got(2L)._4 == 1)
  }

  test("stateful sessionizer closes sessions on gap within a batch") {
    import spark.implicits._
    val base = 1700000000000L
    val events = Seq(
      (1L, new java.sql.Timestamp(base), 1.0),
      (1L, new java.sql.Timestamp(base + 60 * 1000), 2.0), // same session
      (1L, new java.sql.Timestamp(base + 45 * 60 * 1000), 3.0), // gap > 30min → new session
      (2L, new java.sql.Timestamp(base), 5.0)
    ).toDF("user_id", "ts", "value")

    // Feed through a memory stream so flatMapGroupsWithState runs for real.
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)](
      spark, 1)
    ms.addData(events.collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2))).toSeq: _*)
    val streamDf = ms.toDF()
      .select(col("_1").as("user_id"),
        (col("_2") / 1000).cast("timestamp").as("ts"),
        col("_3").as("value"))
    val sessions = EventStreams.sessionize(spark, streamDf)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Within the batch, user 1's first session (2 events) closed when the
    // 45-minute-later event arrived; open sessions are still in state.
    val closed = spark.table("sessions").collect()
    assert(closed.length == 1)
    assert(closed(0).getAs[Long]("user_id") == 1L)
    assert(closed(0).getAs[Long]("n_events") == 2L)
    assert(closed(0).getAs[Double]("total") == 3.0)
  }

  test("sessionizer closes sessions on event-time gaps across batches") {
    import spark.implicits._
    val base = 1700000000000L
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)](
      spark, 2)
    val streamDf = ms.toDF()
      .select(col("_1").as("user_id"),
        (col("_2") / 1000).cast("timestamp").as("ts"),
        col("_3").as("value"))
    val sessions = EventStreams.sessionize(spark, streamDf)
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_et")
      .start()
    // Batch 1: one 2-event session for user 7, still open at batch end.
    ms.addData((7L, base, 1.0), (7L, base + 60 * 1000, 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_et").count() == 0)
    // Batch 2: a 3-hours-later event (user 8) advances the watermark far
    // past user 7's last+gap → the EventTimeTimeout closes the session
    // even though user 7 never spoke again.
    ms.addData((8L, base + 3 * 3600 * 1000L, 5.0))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions_et")
      .filter(col("user_id") === 7L).collect()
    assert(closed.length == 1)
    assert(closed(0).getAs[Long]("n_events") == 2L)
    assert(closed(0).getAs[Double]("total") == 3.0)
  }

  test("streaming FASTQ ingestion equals the batch reader (full schema)") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    // hostile quality lines ('@'/'+' leads) + multi-file input: the
    // per-file parse must match the batch reader on every column
    val recs = (0 until 120).map { i =>
      val n = 8 + rng.nextInt(30)
      val seq = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString
      val qual = (if (i % 3 == 0) "@" else "+") +
        Array.fill(n - 1)(('!' + 1 + rng.nextInt(40)).toChar).mkString
      (s"M9:$i:FC:2:11:$i:${i * 3} ${1 + i % 2}:N:0:GG", seq, qual)
    }.toDF("key", "sequence", "quality").repartition(3)
    val base = java.nio.file.Files.createTempDirectory("graft_fq_stream").toString
    graft.io.Fastq.write(recs, s"$base/in")
    val stream = graft.streaming.GenomicStreams.readFastqStream(spark, s"$base/in")
    val q = stream.writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.schema(stream.schema).parquet(s"$base/out")
      .collect().map(_.toSeq).toSet
    val want = graft.io.Fastq.read(spark, s"$base/in")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.size == 120)
  }

  test("streaming WARC ingestion equals the batch reader (full schema)") {
    import spark.implicits._
    val recs = (0 until 40).map { i =>
      (s"http://t.example/$i", "2020-01-01T00:00:00Z", "text/html",
        s"<p>doc $i</p>".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.toDF("uri", "date", "contentType", "body").repartition(3)
    val base = java.nio.file.Files.createTempDirectory("graft_warc_stream").toString
    graft.io.Warc.write(recs, s"$base/in")
    val stream = graft.streaming.WebStreams.readWarcStream(spark, s"$base/in")
    val q = stream.writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def key(r: org.apache.spark.sql.Row): Seq[Any] =
      r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }
    val got = spark.read.schema(stream.schema).parquet(s"$base/out")
      .collect().map(key).toSet
    val want = graft.io.Warc.read(spark, s"$base/in")
      .collect().map(key).toSet
    assert(got == want)
    // 40 responses + 3 warcinfo leaders (one per written file)
    assert(got.size == 43)
  }

  test("transformWithState timers: idle users flag when the watermark passes") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_idle").toString
    val in = s"$base/in"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      def ts(plusSec: Long) = new java.sql.Timestamp(
        t0.getTime + plusSec * 1000L)
      // file 1: real traffic; file 2: a far-future sentinel that
      // advances the watermark past every idle horizon
      Seq((1L, t0), (1L, ts(60)), (2L, t0)).toDF("user_id", "ts")
        .coalesce(1).write.mode("append").parquet(in)
      Seq((999L, ts(3600))).toDF("user_id", "ts")
        .coalesce(1).write.mode("append").parquet(in)
      val src = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(in)
      val out = graft.streaming.EventStreams
        .idleUsers(spark, src, "ts", idleMs = 10 * 60 * 1000L,
          watermark = "0 seconds").toDF()
      val q = out.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val flags = spark.read.parquet(s"$base/out")
        .as[(Long, Long)].collect().toMap
      // user 1 idles from its LAST event (t0+60s); user 2 from t0; the
      // sentinel user's own timer never fires (watermark stops there)
      assert(flags === Map(1L -> ts(60).getTime, 2L -> t0.getTime),
        s"got $flags")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState: running counts survive a query restart (RocksDB)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_tws").toString
    val in = s"$base/in"
    val out = s"$base/out"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      def drain(): Unit = {
        val src = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType))))
          .parquet(in)
        val q = graft.streaming.EventStreams.runningCounts(spark, src).toDF()
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      Seq(1L, 1L, 2L).toDF("user_id").coalesce(1)
        .write.mode("append").parquet(in)
      drain()
      // second batch arrives AFTER the first query stopped: the running
      // count must resume from RocksDB-checkpointed state, not restart
      Seq(1L).toDF("user_id").coalesce(1)
        .write.mode("append").parquet(in)
      drain()
      val finalCounts = spark.read.parquet(out)
        .groupBy("user_id").agg(max("n_events").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(finalCounts === Map(1L -> 3L, 2L -> 1L), s"got $finalCounts")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
