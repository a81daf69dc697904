package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-kernel micro-bench: native codegen expressions vs the HOF
  * forms they replaced, on synthetic 1M-row tables ("measure, don't
  * guess" — the WSCG-fusion claims in NativeExpressions.scala get
  * numbers here). Prints one JSON line; recorded in BASELINE.md.
  */
object BenchScalars {

  /** The 30 most common mojibake victims (Latin-1 letters + Windows
    * punctuation) — the replace-tower comparator repairs exactly
    * these; the native kernel needs no table at all.
    */
  private val MojChars: Seq[Char] = Seq(
    0xe4, 0xe9, 0xe8, 0xfc, 0xf6, 0xf1, 0xf3, 0xe1, 0xe7, 0xea,
    0xed, 0xfa, 0xe0, 0xe2, 0xee, 0xf4, 0xfb, 0xc4, 0xd6, 0xdc,
    0x2019, 0x2018, 0x201c, 0x201d, 0x2013, 0x2014, 0x20ac, 0x2026,
    0xab, 0xbb).map(_.toChar)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_SCALAR_ROWS", "1000000").toLong
    // parquet-backed inputs (literal ranges constant-fold; scans don't)
    val txtDir = "/tmp/graft_scalar_bench/text"
    val qualDir = "/tmp/graft_scalar_bench/qual"
    if (!new java.io.File(txtDir + "/_SUCCESS").exists()) {
      spark.range(n).select(
        concat_ws(" ",
          (0 until 30).map(i => concat(lit(s"w$i"), pmod(col("id") + i, lit(1000)))): _*)
          .as("text"))
        .write.mode("overwrite").parquet(txtDir)
      spark.range(n).select(
        rpad(concat(lit("II"), pmod(col("id"), lit(40)) + 33), 100, "I").as("q"))
        .write.mode("overwrite").parquet(qualDir)
    }
    val text = spark.read.parquet(txtDir)
    val qual = spark.read.parquet(qualDir)
    // 64-dim vectors + a pre-packed code pair per row for the binary
    // quantization / Hamming kernels
    val vecDir = "/tmp/graft_scalar_bench/vec"
    if (!new java.io.File(vecDir + "/_SUCCESS").exists()) {
      spark.range(n).select(
        transform(sequence(lit(1), lit(64)),
          i => (pmod(col("id") * i, lit(997)) - 498).cast("double")).as("e"))
        .write.mode("overwrite").parquet(vecDir)
    }
    val vec = spark.read.parquet(vecDir)
    // 8-field JSON metadata bags for the variant parse-once probe
    val jsonDir = "/tmp/graft_scalar_bench/json"
    if (!new java.io.File(jsonDir + "/_SUCCESS").exists()) {
      spark.range(n).select(
        concat(lit("{"),
          concat_ws(",", (0 until 8).map(i =>
            concat(lit(s""""f$i":"""), pmod(col("id") * (i + 1), lit(9973)))): _*),
          lit("}")).as("j"))
        .write.mode("overwrite").parquet(jsonDir)
    }
    val js = spark.read.parquet(jsonDir)
    graft.plans.NativeFunctions.register(spark)
    val codes = vec.select(
      call_function("binary_quantize_native", col("e")).as("x"),
      call_function("binary_quantize_native",
        transform(col("e"), v => -v)).as("y"))
      .localCheckpoint()

    def timed(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val first = once(); math.min(first, once())
    }
    import graft.functions.{DnaFunctions, TextFunctions}
    def htmlOf(t: org.apache.spark.sql.Column) = concat(
      lit("<html><head><title>T</title><style>p{color:red}</style></head>" +
        "<body><script>var x = 1 < 2;</script><p>"),
      t, lit("</p><!-- c --></body></html>"))
    def urlOf(t: org.apache.spark.sql.Column) = concat(
      lit("HTTP://Corpus.EXAMPLE:80/p/"), xxhash64(t),
      lit("?utm_source=feed&b=2&a=1#frag"))
    // 100 literal patterns over the fixture's vocab shape (wN + number);
    // roughly a third actually occur
    val blockPats = (0 until 100).map(i => s"w${i % 30}${(i * 37) % 1000}")
    val results = Seq(
      "tokens_native" -> timed(
        text.select(sum(size(TextFunctions.tokens(col("text"))))).collect()),
      "tokens_hof" -> timed(
        text.select(sum(size(TextFunctions.tokensHof(col("text"))))).collect()),
      "avg_quality_native" -> timed(
        qual.select(sum(DnaFunctions.avgQualityCol(col("q")))).collect()),
      "avg_quality_hof" -> timed(
        qual.select(sum(DnaFunctions.avgQualityHof(col("q")))).collect()),
      "low_qual_native" -> timed(
        qual.select(sum(DnaFunctions.lowQualityCountCol(col("q"), 40))).collect()),
      "low_qual_hof" -> timed(
        qual.select(sum(DnaFunctions.lowQualityCountHof(col("q"), 40))).collect()),
      "binary_quantize_native" -> timed(
        vec.select(sum(element_at(
          call_function("binary_quantize_native", col("e")), 1))).collect()),
      "binary_quantize_hof" -> timed(
        vec.select(sum(element_at(
          transform(
            sequence(lit(0), floor((size(col("e")) + 31) / 32).cast("int") - 1),
            b => aggregate(
              sequence(lit(0), least(lit(31), size(col("e")) - b * 32 - 1)),
              lit(0L),
              (acc, j) => acc +
                when(col("e").getItem(b * 32 + j) >= 0,
                  call_function("shiftleft", lit(1L), j)).otherwise(0L))),
          1))).collect()),
      "hamming_native" -> timed(
        codes.select(sum(
          call_function("hamming_native", col("x"), col("y")))).collect()),
      "hamming_hof" -> timed(
        codes.select(sum(aggregate(
          zip_with(col("x"), col("y"), (a, b) => bit_count(a.bitwiseXOR(b))),
          lit(0), (acc, d) => acc + d))).collect()),
      // html_to_text: one native scan per document vs the regexp_replace
      // tower a SQL user would write (7 compiled-regex traversals +
      // entity decodes; approximate semantics — throughput comparator,
      // not an equality twin)
      "html_to_text_native" -> timed(
        text.select(sum(length(call_function("html_to_text_native",
          htmlOf(col("text")))))).collect()),
      "html_to_text_regex" -> timed {
        val h = htmlOf(col("text"))
        val r1 = regexp_replace(h, "(?is)<script[^>]*>.*?</script>", " ")
        val r2 = regexp_replace(r1, "(?is)<style[^>]*>.*?</style>", " ")
        val r3 = regexp_replace(r2, "(?s)<!--.*?-->", "")
        val r4 = regexp_replace(r3,
          "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|title)[^>]*>", "\n")
        val r5 = regexp_replace(r4, "<[^>]*>", " ")
        val r6 = regexp_replace(regexp_replace(regexp_replace(r5,
          "&amp;", "&"), "&lt;", "<"), "&gt;", ">")
        val r7 = trim(regexp_replace(r6, "[ \t\r]+", " "))
        text.select(sum(length(r7))).collect()
      },
      // canonicalize_url: native parse vs the partial regex pipeline
      // (fragment + tracking-param strip + lowercase; cannot sort
      // params — regex alone cannot express full canonicalization)
      "canonicalize_url_native" -> timed(
        text.select(sum(length(call_function("canonicalize_url_native",
          urlOf(col("text")))))).collect()),
      "canonicalize_url_regex" -> timed {
        val u = urlOf(col("text"))
        val r1 = regexp_replace(u, "#.*$", "")
        val r2 = regexp_replace(r1, "(?i)[?&](utm_[^&#]*|fbclid=[^&#]*)", "?")
        text.select(sum(length(lower(r2)))).collect()
      },
      // fix_encoding: the one-pass native repair (encode-check-decode)
      // vs the digraph replace tower a SQL user would write (30
      // literal mojibake→char replacements — approximate semantics: it
      // never validates UTF-8, misses rare sequences, and cannot
      // handle double-encoding without a second tower)
      "fix_encoding_native" -> timed {
        val moj = concat(col("text"),
          lit(" " + graft.plans.NativeText.mojibake(MojChars.mkString)))
        text.select(sum(length(
          call_function("fix_encoding_native", moj)))).collect()
      },
      "fix_encoding_regex_tower" -> timed {
        val moj = concat(col("text"),
          lit(" " + graft.plans.NativeText.mojibake(MojChars.mkString)))
        val repaired = MojChars.foldLeft(moj) { (c, ch) =>
          replace(c, lit(graft.plans.NativeText.mojibake(ch.toString)),
            lit(ch.toString))
        }
        text.select(sum(length(repaired))).collect()
      },
      // blocklist sweep, K=100 literal patterns: one Aho-Corasick pass
      // (mapPartitions, broadcast automaton) vs one alternation regex —
      // the regex is already the GENEROUS comparator (the naive form is
      // K separate scans), and the automaton's per-document cost is
      // K-independent while the alternation NFA degrades with K
      "blocklist_automaton" -> timed {
        val withId = text.withColumn("id", monotonically_increasing_id())
        graft.operators.Blocklist.hits(withId, "id", "text", blockPats)
          .agg(sum("n_hits")).collect()
      },
      "blocklist_regex_alt" -> timed(
        text.select(sum(regexp_count(col("text"),
          lit(blockPats.mkString("(", "|", ")"))))).collect()),
      // Gopher repetition tagger: the one-pass mapPartitions form
      // (q130's operator — per-doc hash maps, zero shuffle) vs the
      // relational composition a SQL user would write (line explode +
      // bigram window + gaps-and-islands runs: three shuffled branches
      // re-joined on doc_id)
      "repetition_tagger_onepass" -> timed {
        val withId = text.withColumn("doc_id", monotonically_increasing_id())
        graft.operators.Corpus.repetitionSignals(withId)
          .agg(sum("top_bigram_count"), sum("max_token_run")).collect()
      },
      // variant parse-once/extract-many (q140's doctrine) vs
      // get_json_object, which re-parses the JSON string per extraction:
      // 4 typed reads from an 8-field metadata bag. The two-step select
      // keeps the parse single (CollapseProject won't inline an alias
      // referenced 4 times).
      "variant_parse_once_x4" -> timed(
        js.select(parse_json(col("j")).as("v"))
          .select((0 until 4).map(i =>
            variant_get(col("v"), s"$$.f$i", "long").as(s"x$i")): _*)
          .select(sum(col("x0") + col("x1") + col("x2") + col("x3")))
          .collect()),
      "get_json_object_x4" -> timed(
        js.select((0 until 4).map(i =>
          get_json_object(col("j"), s"$$.f$i").cast("long").as(s"x$i")): _*)
          .select(sum(col("x0") + col("x1") + col("x2") + col("x3")))
          .collect()),
      // winnowing fingerprints: the zero-shuffle mapPartitions kernel
      // vs the relational twin (gram explode + partitionBy-id window +
      // distinct = two corpus-sized exchanges). 100k docs × ~170 grams
      // — the relational side materializes ~17M gram rows twice.
      "winnowing_kernel" -> timed {
        val d = text.limit(100000).repartition(32)
          .withColumn("doc_id", monotonically_increasing_id())
          .localCheckpoint()
        graft.operators.Dedup.winnowingFingerprints(d, "doc_id", "text")
          .agg(sum("n_fp"), sum("fp_sum")).collect()
      },
      "winnowing_relational" -> timed {
        val d = text.limit(100000).repartition(32)
          .withColumn("doc_id", monotonically_increasing_id())
          .localCheckpoint()
        graft.operators.Dedup.winnowingFingerprints(d, "doc_id", "text",
            kernel = false)
          .agg(sum("n_fp"), sum("fp_sum")).collect()
      },
      "repetition_tagger_relational" -> timed {
        import org.apache.spark.sql.expressions.Window
        val d = text.withColumn("doc_id", monotonically_increasing_id())
        val lines = d.select(col("doc_id"),
            explode(split(col("text"), "\n", -1)).as("line"))
          .groupBy("doc_id", "line")
          .agg(count(lit(1)).as("c"), first(length(col("line"))).as("len"))
          .groupBy("doc_id")
          .agg(sum("c").as("total_lines"), sum(col("c") - 1).as("dup_lines"),
            sum(col("c") * col("len")).as("total_line_chars"),
            sum((col("c") - 1) * col("len")).as("dup_line_chars"))
        val tw = d.select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.tokens(col("text")))
            .as(Seq("i", "w")))
        val seqW = Window.partitionBy("doc_id").orderBy("i")
        val bg = tw.withColumn("w2", lead(col("w"), 1).over(seqW))
          .filter(col("w2").isNotNull)
          .groupBy("doc_id", "w", "w2").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(max("c").as("top_bigram_count"),
            sum("c").as("n_bigrams"))
        val runs = tw.withColumn("g",
            col("i") - row_number().over(
              Window.partitionBy("doc_id", "w").orderBy("i")))
          .groupBy("doc_id", "w", "g").agg(count(lit(1)).as("runlen"))
          .groupBy("doc_id").agg(max("runlen").as("max_token_run"))
        lines.join(bg, Seq("doc_id"), "left").join(runs, Seq("doc_id"), "left")
          .agg(sum("top_bigram_count"), sum("max_token_run")).collect()
      })
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scalar_kernels","unit":"sec","rows":$n,"queries":$qs}""")
    spark.stop()
  }
}
