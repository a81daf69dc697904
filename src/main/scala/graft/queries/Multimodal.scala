package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries (north-star surface): media as opaque
  * `binary` payloads + typed metadata struct, with a REAL pure-JVM
  * decode step (graft.operators.Multimodal.Png — chunk walk, CRC
  * verification, inflate, row unfiltering; cross-validated against
  * javax.imageio in MultimodalSpec).
  *
  * Fixture rule (shared with the oracle): each document renders to a
  * valid 8-bit grayscale PNG whose pixels are the text's UTF-8 bytes
  * '.'-padded to 64-wide rows. The queries then DECODE those payloads
  * and emit parsed headers / pixel digests / pixel statistics — values
  * the DuckDB oracle recomputes arithmetically from the text, so both
  * the encoder and the decoder are under hash test: a misread IHDR, a
  * bad CRC, or a mis-unfiltered row breaks the match.
  */
object Multimodal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // REAL header parse + decoded-pixel digest: every field below comes
    // out of the PNG decoder, not the construction metadata.
    "q60_media_meta" -> { (s, d) =>
      val media = graft.operators.Multimodal.asMedia(Tables.documents(s, d))
      graft.operators.Multimodal.parseMeta(media)
        .select(col("doc_id"),
          lit("image/png").as("format"),
          col("width"), col("height"),
          col("bit_depth"), col("color_type"),
          col("n_pixels"), col("pixel_md5"))
    },

    // Batch decode + feature extraction over the binary column
    // (mapPartitions — the Scala analog of mapInPandas batch
    // processing). Both engines PLANT a non-ASCII tail (2- and 3-byte
    // UTF-8 chars): the pixel buffer is RAW UTF-8 BYTES plus padding,
    // and the oracle reconstructs the byte sum from code points — byte
    // semantics under multi-byte input is verified end to end THROUGH
    // the PNG round-trip.
    "q61_media_features" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" é☃€"),
            (col("doc_id") % 10).cast("string")).as("text"))
      val media = graft.operators.Multimodal.asMedia(docs)
      graft.operators.Multimodal.extractFeatures(media)
        .select(col("doc_id"),
          col("n_pixels"),
          round(col("mean_pixel"), 4).as("mean_pixel"),
          col("n_frames"))
    },

    // JSONL round-trip: documents → newline-delimited JSON → read back —
    // the interchange format corpus pipelines actually ship. The hash
    // oracle proves values survive the serialization untouched.
    "q78_jsonl_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/jsonl"
      Tables.documents(s, d)
        .select("doc_id", "text", "n_chars")
        .write.mode("overwrite").json(dir)
      s.read.json(dir)
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(col("text")).as("text_md5"),
          col("n_chars").cast("int").as("n_chars"))
    },

    // ORC round-trip (q137): the second columnar interchange format
    // Spark ships natively (predicate pushdown, column pruning, zlib
    // striping — the warehouse-exchange sibling of parquet). Same
    // doctrine as q78: write, read back, hash the values through the
    // format.
    "q137_orc_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/orc"
      Tables.documents(s, d)
        .select("doc_id", "text", "n_chars", "lang")
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .filter(col("n_chars") > 100) // pushed into the ORC scan
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("n_chars"), col("lang"))
    },

    // Corrupt-record ingestion (q159): real crawls ship malformed
    // lines, and FAILFAST-on-everything loses the batch. PERMISSIVE
    // mode with an explicit _corrupt_record column quarantines bad
    // lines as rows instead of killing the job — every 10th document
    // is staged as truncated JSON; good rows must survive intact and
    // bad rows must land in quarantine with NULL fields, never
    // silently vanish. (Explicit schema as always: inference over a
    // corrupt corpus is both a second scan and a coin flip.)
    "q159_corrupt_jsonl" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/cjsonl"
      Tables.documents(s, d)
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("text"), col("n_chars")))
            .as("line"))
        // deterministic corruption: ids ending in 0 truncate mid-JSON
        // (every full object is far longer than 20 chars, so the prefix
        // is always malformed)
        .select(when(col("doc_id") % 10 === 0, substring(col("line"), 1, 20))
          .otherwise(col("line")).as("value"))
        .write.mode("overwrite").text(dir)
      s.read
        .schema("doc_id LONG, text STRING, n_chars LONG, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(dir)
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("n_chars"),
          col("_corrupt_record").isNotNull.as("quarantined"))
    },

    // CSV round-trip (q145): the third interchange format — RFC-4180
    // quoting (quoteAll + '"' escape, so embedded commas and quotes
    // double-quote correctly), explicit read schema (inference is a
    // scale anti-pattern: it costs an extra full scan and can flip
    // types between batches). The hash oracle proves values survive
    // the text encoding untouched.
    "q145_csv_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/csv"
      Tables.documents(s, d)
        .select("doc_id", "text", "lang", "n_chars")
        .write.mode("overwrite")
        .option("header", "true").option("quoteAll", "true")
        .option("escape", "\"")
        .csv(dir)
      s.read
        .option("header", "true").option("escape", "\"")
        .schema("doc_id LONG, text STRING, lang STRING, n_chars LONG")
        .csv(dir)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("n_chars"))
    },

    // Avro round-trip (q224): the row-oriented interchange format —
    // the Kafka/schema-registry bus format — through the repo's own
    // container codec (Spark ships no built-in avro source; io.Avro
    // sits on the public Avro Java API). Write one container per
    // partition with an embedded schema, read back file-parallel, and
    // additionally round-trip the embeddings table so [null,T] unions
    // AND float arrays go under the hash (array semantics proven
    // element-exact by the avg_dim0 aggregate).
    "q224_avro_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/avro"
      graft.io.Avro.write(Tables.documents(s, d)
        .select("doc_id", "text", "lang", "n_chars"), s"$dir/docs")
      graft.io.Avro.write(Tables.embeddings(s, d)
        .select("vec_id", "embedding"), s"$dir/emb")
      val emb = graft.io.Avro.read(s, s"$dir/emb")
        .select((round(avg(element_at(col("embedding"), 1)), 6) + lit(0.0))
          .as("avg_dim0"))
      graft.io.Avro.read(s, s"$dir/docs")
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("n_chars"))
        .crossJoin(broadcast(emb))
    },

    // NPY shard round-trip (q337, r12): the embedding interchange
    // format training/ANN pipelines ship — each partition writes an
    // ids.npy + vec.npy pair (int64 / float32, real NumPy v1.0
    // headers), read back one task per pair with headers validated.
    // float32 source ⇒ the round trip is bit-exact; the oracle
    // recomputes each vector's dimension-ordered sum from the source
    // table, so a byte-order slip, a header off-by-one, or a
    // pair-mismatch breaks the hash.
    "q337_npy_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/npy"
      graft.io.Npy.write(
        Tables.embeddings(s, d).select("vec_id", "embedding"),
        "vec_id", "embedding", dir)
      graft.io.Npy.read(s, dir)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          (round(aggregate(col("embedding"), lit(0.0),
            (a, x) => a + x.cast("double")), 6) + lit(0.0)).as("vec_sum"))
    },

    // SafeTensors shard round-trip (q385, r15): the training-stack
    // interchange format (u64-LE header length + JSON header + aligned
    // tensor buffer). Ids and embeddings travel as two tensors per
    // shard; the reader re-validates dtype/shape/offset contiguity, so
    // a header slip, an offset overlap, or a byte-order mistake breaks
    // the hash. float32 source ⇒ bit-exact round trip; same oracle
    // shape as q337 (dimension-ordered fold from the source table).
    "q385_safetensors_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/safetensors"
      graft.io.SafeTensors.write(
        Tables.embeddings(s, d).select("vec_id", "embedding"),
        "vec_id", "embedding", dir)
      graft.io.SafeTensors.read(s, dir)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          (round(aggregate(col("embedding"), lit(0.0),
            (a, x) => a + x.cast("double")), 6) + lit(0.0)).as("vec_sum"))
    },

    // PDF text extraction (q386, r15): the document-modality codec
    // story — every document rendered through OUR classic-PDF writer
    // (6 words/line, 4 lines/page; show style doc_id%3 across
    // Tj/TJ-with-kerns/quote-hex, FlateDecode on even ids), then
    // extracted back by the real parser: xref walk, object grammar,
    // page tree, content-stream text machine, WinAnsi decode. The
    // oracle replays the layout arithmetically — a kern-rule slip, a
    // filter bug, or a page-tree walk error breaks the hash.
    "q386_pdf_extract" -> { (s, d) =>
      graft.operators.Pdf.extractTexts(
        graft.operators.Pdf.asPdfMedia(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_pages"),
          md5(col("text")).as("text_md5"))
    },

    // MARKDOWN TEXT EXTRACTION (q397, r15): the dominant markup of
    // code-hosting corpora — every document rendered as markdown by a
    // fixed layout rule (6-word lines; heading/bullet/quote/ordered by
    // line stride; bold/em/code-span/link by global word stride; every
    // ASCII punct backslash-escaped; ids%4==0 carry a fenced code
    // block) and extracted back through the block+inline walk. Code
    // fences route to their own channel and never touch the text; the
    // oracle replays the 6-word layout arithmetically, so any marker
    // or escape slip breaks the hash.
    "q397_markdown_extract" -> { (s, d) =>
      graft.operators.Markdown.extractTexts(
        graft.operators.Markdown.asMarkdownDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_lines"), col("n_code_blocks"),
          md5(col("text")).as("text_md5"))
    },

    // HILBERT CLUSTERING VALUE (q412, r15): the locality-preserving
    // sibling of the shipped Z-order — unit-step linearization means
    // tighter per-file bounding boxes and better two-dimensional
    // min/max pruning (HilbertSpec measures Z losing on bbox area;
    // every Hilbert file of a full grid is a perfect square). The
    // Column form is the xy2d loop UNROLLED into codegen'd bitwise
    // arithmetic; the oracle replays the SAME loop as a recursive CTE.
    "q412_hilbert_value" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        (col("doc_id") % 256).cast("long").as("x"),
        ((col("doc_id") * 7) % 256).cast("long").as("y"))
        .withColumn("h_val",
          graft.operators.Hilbert.hilbertValue(8, col("x"), col("y")))
    },

    // LICENSE HEADER SCAN (q410, r15): the code-corpus legal gate —
    // headers planted by id stride (an SPDX tag CONTRADICTING an MIT
    // phrase proves tag precedence; each fingerprint family; a bare
    // stratum yields null/untrainable), scanned by the codegen'd
    // regexp/contains chain. The oracle replays the stratum table.
    "q410_license_scan" -> { (s, d) =>
      val m6 = pmod(col("doc_id"), lit(6))
      val header =
        when(m6 === 0, lit("// SPDX-License-Identifier: GPL-2.0-only\n" +
          "/* Permission is hereby granted, free of charge */\n"))
          .when(m6 === 1,
            lit("/* Permission is hereby granted, free of charge */\n"))
          .when(m6 === 2,
            lit("/* Licensed under the Apache License, Version 2.0 */\n"))
          .when(m6 === 3,
            lit("/* terms of the GNU General Public License apply */\n"))
          .when(m6 === 4, lit(
            "/* Redistribution and use in source and binary forms */\n"))
          .otherwise(lit(""))
      val src = Tables.documents(s, d).select(col("doc_id"),
        concat(header, coalesce(col("text"), lit(""))).as("text"))
      graft.operators.Code.licenseScan(src, "text")
        .select(col("doc_id"), col("license"), col("permissive"))
    },

    // SOURCE-SHAPE QUALITY SIGNALS (q411, r15): the StarCoder file
    // filters — documents laid out as 7-word source lines (a 1200-char
    // minified line appended on ids%5==0), then max/avg line length
    // and alphabetic-fraction metrics with the keep verdict, all
    // integer arithmetic both engines replay identically.
    "q411_source_signals" -> { (s, d) =>
      val ws = split(coalesce(col("text"), lit("")), " ", -1)
      val nl = ceil(size(ws) / lit(7.0)).cast("int")
      val baseLines = transform(sequence(lit(1), nl), i =>
        array_join(slice(ws, (i - lit(1)) * 7 + 1, lit(7)), " "))
      val lines = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(baseLines, array(repeat(lit("z"), 1200))))
        .otherwise(baseLines)
      val src = Tables.documents(s, d).select(col("doc_id"),
        array_join(lines, "\n").as("text"))
      graft.operators.Code.sourceSignals(src, "text")
        .select(col("doc_id"), col("n_lines"), col("max_line_len"),
          col("avg_line_milli"), col("alpha_ppm"), col("kept"))
    },

    // MIME EMAIL EXTRACTION (q409, r15): mail archives as a corpus
    // source — every document rendered as a multipart/alternative EML
    // (folded headers, preamble/epilogue, quoted-printable text/plain
    // + base64 text/html) and extracted back through the RFC 5322/2045
    // walk: header unfolding, boundary split, both transfer decodings.
    // The bodies must round-trip byte-exactly, so the oracle hashes
    // the source text for BOTH alternative parts.
    "q409_mime_extract" -> { (s, d) =>
      graft.operators.Mime.extractEmails(
        graft.operators.Mime.asEmailDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("subject"), col("from"),
          col("n_parts"), col("plain_md5"), col("html_md5"))
    },

    // OGG/VORBIS CONTAINER METADATA (q408, r15): the audio-corpus
    // container (RFC 3533 pages + Vorbis I headers) — every document
    // rendered as a real Ogg stream (BOS ident header, a comment
    // packet that ALWAYS spans lacing segments via a 300-byte pad,
    // rising granules, EOS) and read back by the page walk: per-page
    // CRC (non-reflected 0x04C11DB7) verified, lacing reassembly,
    // ident + VorbisComment parse. Every field id/word-count
    // arithmetic the oracle replays.
    "q408_ogg_metadata" -> { (s, d) =>
      graft.operators.Ogg.extractMeta(
        graft.operators.Ogg.asOggDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("serial"), col("channels"),
          col("sample_rate"), col("vendor"), col("n_comments"),
          col("comments_md5"), col("last_granule"), col("n_pages"))
    },

    // AVRO WIRE ROUND TRIP (q405, r15): the q224 avro-jar round trip
    // re-proved at the BYTE level — documents through OUR from-scratch
    // container writer/parser (Obj\1 magic, metadata map, zigzag
    // varints, per-block sync verification, raw-deflate blocks), no
    // avro jar anywhere on the path. AvroWireSpec cross-validates both
    // directions against the jar; here the oracle pins values.
    "q405_avro_wire" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/avrowire"
      graft.io.AvroWire.writeDocs(
        Tables.documents(s, d).select("doc_id", "text"), dir)
      graft.io.AvroWire.readDocs(s, dir)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          length(col("text")).as("n_chars"))
    },

    // PARQUET FOOTER INSPECTOR (q404, r15): metadata-only file triage
    // — documents written bucket-partitioned (doc_id%4, one file per
    // bucket), then every footer read back by OUR from-scratch Thrift
    // compact-protocol walker (PAR1 magic + footer length, zigzag
    // varints, unknown fields skipped): num_rows, row-group count, and
    // the doc_id column's min/max STATISTICS, never a data page. The
    // oracle recomputes all of it relationally, so the footer grammar
    // and Spark's statistics writer are cross-checked against DuckDB.
    "q404_parquet_footer" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/pqfooter"
      Tables.documents(s, d)
        .withColumn("bucket", (col("doc_id") % 4).cast("int"))
        .repartition(8, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(dir)
      graft.io.ParquetFooter.scanDir(s, dir, "doc_id")
        .withColumn("bucket",
          regexp_extract(col("file"), "bucket=(\\d+)", 1).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("int").as("n_files"),
          sum("num_rows").as("num_rows"),
          sum("n_row_groups").cast("int").as("n_row_groups"),
          min("min_stat").as("min_doc"),
          max("max_stat").as("max_doc"))
    },

    // MP4 / ISO-BMFF METADATA (q403, r15): the video-corpus container
    // — every document rendered as a structurally valid MP4 (ftyp +
    // full moov tree + accounting-exact mdat; one frame per word, all
    // header fields id-derived) and read back by the real box walk:
    // nested containers, leaf parses for mvhd/tkhd/mdhd/hdlr/stts/
    // stsz, unknown boxes skipped by size, mdat-vs-stsz accounting and
    // stts-vs-mdhd duration cross-checked. The oracle replays every
    // field arithmetically — a box-walk slip breaks a column.
    "q403_mp4_metadata" -> { (s, d) =>
      graft.operators.Mp4.extractMeta(
        graft.operators.Mp4.asVideoDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("brand"), col("timescale"),
          col("n_frames"), col("duration_ms"), col("width"),
          col("height"), col("lang"), col("sample_bytes"))
    },

    // TFRECORD ROUND TRIP (q402, r15): the TensorFlow training-data
    // interchange format — u64-LE length + masked-CRC32C framing (both
    // checksums verified per record on read) around tf.train.Example
    // protobufs (hand-built wire format: varints, length-delimited
    // fields, packed numeric lists, unknown-field skipping). float32
    // source ⇒ bit-exact round trip; same fold oracle as q337/q385 —
    // the container must be value-transparent.
    "q402_tfrecord_roundtrip" -> { (s, d) =>
      val dir = s"/tmp/graft_io/${new java.io.File(d).getName}/tfrecord"
      graft.io.TfRecord.write(
        Tables.embeddings(s, d).select("vec_id", "embedding"),
        "vec_id", "embedding", dir)
      graft.io.TfRecord.read(s, dir)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          (round(aggregate(col("embedding"), lit(0.0),
            (a, x) => a + x.cast("double")), 6) + lit(0.0)).as("vec_sum"))
    },

    // CHAT-TEMPLATE ROUND TRIP (q401, r15): the SFT data-prep step —
    // every document rendered as a ChatML conversation (6-word
    // messages alternating user/assistant from user; ids%5==0 carry a
    // system turn with id-derived content) and parsed back by the
    // fully DECLARATIVE reader (split + higher-order functions +
    // substring_index arithmetic, malformed segments raise). The two
    // role channels are the loss-mask split; the oracle replays the
    // message layout arithmetically, so a delimiter slip or a role
    // mis-assignment breaks a channel hash.
    "q401_chat_template" -> { (s, d) =>
      graft.operators.Chat.parseChatML(
        graft.operators.Chat.asChatDocs(Tables.documents(s, d)))
        .select(col("doc_id"), col("n_msgs"), col("n_system"),
          md5(col("user_text")).as("user_md5"),
          md5(col("asst_text")).as("asst_md5"))
    },

    // LATEX EXTRACTION (q400, r15): the arXiv source format — every
    // document rendered by a fixed layout rule (10-word paragraphs;
    // section/itemize/size-group by line stride; bold/emph/tt by word
    // stride; inline math, footnotes and cites attached to stride
    // words with index-derived content; TeX specials escaped) and
    // extracted back through the command-dispatch walk. Math routes to
    // its own channel whose content the oracle REGENERATES from the
    // stride arithmetic, so both hashes pin the whole grammar: a
    // dropped escape, a mis-skipped argument, or a math-capture slip
    // breaks one of them.
    "q400_latex_extract" -> { (s, d) =>
      graft.operators.Latex.extractTexts(
        graft.operators.Latex.asLatexDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_lines"), col("n_math"),
          col("n_footnotes"),
          md5(col("text")).as("text_md5"),
          md5(col("math")).as("math_md5"))
    },

    // WIKITEXT EXTRACTION (q399, r15): the markup of the most-used
    // pretraining corpus (Wikipedia dumps ship wikitext, not HTML) —
    // every document rendered by a fixed layout rule (8-word lines;
    // heading/bullet/indent/numbered by line stride; bold/italic/
    // internal-link/external-link by word stride; refs, comments and
    // templates attached to stride words with id-derived content;
    // metacharacter words nowiki-wrapped; ids%4==0 carry a table
    // block) and extracted back through the structure removers + line
    // walk + apostrophe-run inline pass. Refs and tables are counted
    // by arithmetic the oracle replays, so a removal slip or a toggle
    // slip breaks the hash.
    "q399_wikitext_extract" -> { (s, d) =>
      graft.operators.Wikitext.extractTexts(
        graft.operators.Wikitext.asWikitextDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_lines"), col("n_tables"),
          col("n_refs"), md5(col("text")).as("text_md5"))
    },

    // NOTEBOOK (ipynb) TEXT EXTRACTION (q398, r15): the container of
    // code corpora — every document rendered as an nbformat-4 notebook
    // (5-word source lines, 2 lines per cell, cells alternating
    // markdown/code starting with markdown) and extracted back by a
    // fully DECLARATIVE plan: from_json with the nbformat schema +
    // higher-order filter/transform/array_join, no hand parser on the
    // read side. Prose and code surface as separate channels; the
    // oracle replays the line/cell layout arithmetically, so an escape
    // slip in the writer or a channel-split slip in the reader breaks
    // either hash.
    "q398_notebook_extract" -> { (s, d) =>
      graft.operators.Notebook.extractCells(
        graft.operators.Notebook.asNotebookDocs(Tables.documents(s, d)))
        .select(col("doc_id"), col("nbformat"), col("n_cells"),
          col("n_code_cells"),
          md5(col("md_text")).as("md_md5"),
          md5(col("code_text")).as("code_md5"))
    },

    // RTF TEXT EXTRACTION (q396, r15): the legacy rich-text source
    // that rounds out the document suite (PDF/DOCX/EPUB/RTF) — every
    // document rendered as a real RTF stream (font-table + ignorable
    // destinations, bold groups on every 4th word, stride-driven
    // \'hh hex escapes, \uN? for non-ASCII) and extracted back by the
    // full tokenizer: group-scoped \uc state, destination skipping,
    // unknown-control-word forward-compat rule. The oracle replays
    // the 7-words-per-paragraph layout arithmetically, so an escape
    // or group-state slip breaks the hash.
    "q396_rtf_extract" -> { (s, d) =>
      graft.operators.Rtf.extractTexts(
        graft.operators.Rtf.asRtfMedia(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_paragraphs"),
          md5(col("text")).as("text_md5"))
    },

    // EPUB TEXT EXTRACTION (q395, r15): books — every document packed
    // as a real OCF container (stored mimetype, container.xml →
    // rootfile → OPF manifest + spine, XHTML chapters) and extracted
    // back in SPINE order through the engine's own html_to_text rules.
    // The oracle replays the 5-words-per-line / 2-lines-per-chapter
    // layout arithmetically.
    "q395_epub_extract" -> { (s, d) =>
      graft.operators.Epub.extractTexts(
        graft.operators.Epub.asEpubMedia(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_chapters"),
          md5(col("text")).as("text_md5"))
    },

    // DOCUMENT-INGESTION FLAGSHIP (q394, r15 — the document-modality
    // q380): a MIXED corpus — even ids rendered as PDFs (both
    // structural families), odd ids as DOCX packages — where ids%3==0
    // carry planted mojibake INSIDE the document (the crawled-file
    // reality). The pipeline extracts per container, repairs encoding
    // with fix_encoding_native, and emits token counts + text digests:
    // container transparency, the repair rule, and token preservation
    // across both formats all under ONE hash.
    "q394_document_ingest" -> { (s, d) =>
      import s.implicits._
      val umlaut = new String(Array(0xe4), 0, 1)
      val injected = s"d${umlaut}t$umlaut"
      val prepared = Tables.documents(s, d)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val clean =
            if (id % 3 == 0) text.replace("data", injected) else text
          val corrupted =
            if (id % 3 == 0) graft.plans.NativeText.mojibake(clean)
            else clean
          (id, corrupted)
        }.toDF("doc_id", "text")
      val pdfText = graft.operators.Pdf.extractTexts(
          graft.operators.Pdf.asPdfMedia(
            prepared.filter(col("doc_id") % 2 === 0))).toDF()
        .select(col("doc_id"), lit("pdf").as("format"),
          col("n_pages").as("n_units"), col("text"))
      val docxText = graft.operators.Docx.extractTexts(
          graft.operators.Docx.asDocxMedia(
            prepared.filter(col("doc_id") % 2 === 1))).toDF()
        .select(col("doc_id"), lit("docx").as("format"),
          col("n_paragraphs").as("n_units"), col("text"))
      pdfText.unionByName(docxText)
        .select(col("doc_id"), col("format"), col("n_units"),
          col("text").as("raw"),
          graft.functions.TextFunctions.fixEncoding(col("text"))
            .as("fixed"))
        .select(col("doc_id"), col("format"), col("n_units"),
          when(col("fixed") =!= col("raw"), 1).otherwise(0)
            .as("was_repaired"),
          graft.functions.TextFunctions.tokenCount(col("fixed"))
            .as("n_tokens"),
          md5(col("fixed")).as("text_md5"))
    },

    // DOCX TEXT EXTRACTION (q393, r15): the office-document source
    // next to PDF — every document rendered as a real OPC ZIP package
    // (ECMA-376) whose WordprocessingML splits each 9-word paragraph
    // into 3-word runs with xml:space="preserve" space carriers, then
    // extracted back by the ZIP walk + tag walk + entity decode. The
    // oracle replays the paragraph layout arithmetically.
    "q393_docx_extract" -> { (s, d) =>
      graft.operators.Docx.extractTexts(
        graft.operators.Docx.asDocxMedia(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_paragraphs"),
          md5(col("text")).as("text_md5"))
    },

    // WEBP-LOSSLESS ROUND TRIP (q391, r15): the last common web image
    // format — VP8L spatial coding (canonical prefix codes in both
    // transmitted forms, LZ77 distance-1 runs, degenerate 0-bit trees)
    // through our own encoder and back. Same 64-wide color rule as the
    // PNG family plus the alpha rule on every row, so the oracle
    // replays pixels arithmetically; transforms/cache/meta/2D-map
    // refuse loudly (WebpSpec) and the byte layout is pinned against
    // an independent spec derivation.
    "q391_webp_roundtrip" -> { (s, d) =>
      graft.operators.Webp.parseWebpMeta(
        graft.operators.Webp.asWebpMedia(Tables.documents(s, d))).toDF()
    },

    // FLAC ROUND TRIP (q390, r15): the lossless-audio analog of the
    // PNG path — text-rule samples (plus a planted constant tail on
    // doc_id%5==0 so CONSTANT subframes occur; VERBATIM forced on
    // doc_id%7==0, best-FIXED-order Rice frames otherwise) encoded
    // through our own FLAC writer and decoded back with CRC-8/CRC-16/
    // STREAMINFO-MD5 all verified. Rice residuals are integer-exact,
    // so the oracle replays the sample values arithmetically; the
    // aggregates (sum, sum of squares, peak, frame count) pin the
    // round trip end to end.
    "q390_flac_roundtrip" -> { (s, d) =>
      graft.operators.Audio.flacRoundtrip(Tables.documents(s, d)).toDF()
    },

    // CROSS-MODAL JOINT DEDUP (q389, r15 — q348's extension): one
    // keeper per component of the UNION of image-pHash pairs and
    // caption-MinHash pairs. The fixture plants both signals so the
    // closure crosses modalities: every even doc gets an image twin at
    // +100000 (one-char pixel mutation, q351's plant — pairs by IMAGE
    // only, its caption is unrelated), every %3 doc a caption twin at
    // +200000 (caption + ' extra' — pairs by CAPTION only, its image
    // is the reversed text). For doc_id%6==0 all three must land in
    // ONE cluster keyed by the original — transitive across
    // modalities. The oracle replays the pHash block chain, the LSH
    // funnel, and reachability (recursive CTE) from scratch.
    "q389_joint_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val originals = docs.select(col("doc_id"),
        col("text").as("img_text"),
        array_join(slice(split(col("text"), " "), 1, 8), " ").as("caption"))
      val imgTwins = docs.filter(col("doc_id") % 2 === 0).select(
        (col("doc_id") + 100000).as("doc_id"),
        concat(substring(col("text"), 1, 99), lit("Z"),
          substring(col("text"), 101, 1000000)).as("img_text"),
        concat(lit("img copy "),
          (col("doc_id") + 100000).cast("string")).as("caption"))
      val capTwins = docs.filter(col("doc_id") % 3 === 0).select(
        (col("doc_id") + 200000).as("doc_id"),
        reverse(col("text")).as("img_text"),
        concat(array_join(slice(split(col("text"), " "), 1, 8), " "),
          lit(" extra")).as("caption"))
      val corpus = originals.unionByName(imgTwins).unionByName(capTwins)
        .localCheckpoint()
      val media = graft.operators.Jpeg.asColorJpegMedia(
        corpus.select(col("doc_id"), col("img_text").as("text")))
      graft.operators.Multimodal.crossModalDedup(
        media, corpus, "doc_id", "caption")
    },

    // Schema evolution (q148): two corpus snapshots written at
    // different schema versions — v2 adds a `quality` column — read
    // back as ONE table via mergeSchema. The old snapshot's rows
    // surface the new column as NULL; nothing is rewritten (the
    // 100 TB property: adding a column must not touch existing files).
    // The oracle recomputes the merged view relationally.
    "q148_schema_evolution" -> { (s, d) =>
      val base = s"/tmp/graft_io/${new java.io.File(d).getName}/schevo"
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$base/v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("n_chars").as("quality"))
        .write.mode("overwrite").parquet(s"$base/v2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/v1", s"$base/v2")
        .select(col("doc_id"), md5(col("text")).as("text_md5"), col("quality"))
    },

    // Frame sampling: every 3rd 256-byte "frame" of the DECODED pixel
    // buffer, with a per-frame digest the oracle recomputes from the
    // padded-text rule (ASCII fixture ⇒ byte slices == char slices).
    "q65_frame_sample" -> { (s, d) =>
      val media = graft.operators.Multimodal.asMedia(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Multimodal.sampleFrames(media, every = 3)
        .select("doc_id", "frame_idx", "n_bytes", "frame_md5")
    },

    // AUDIO modality (REAL decode, r6): text renders to a valid mono
    // PCM16 WAV (sample rule: byte*257 - 16384), the feature pass
    // DECODES the RIFF stream and emits duration / energy / zero-
    // crossing / peak stats plus a decimate-by-4 re-encode→re-decode
    // round trip. Integer aggregates are exact; rms is one sqrt over
    // the same exact integer on both engines. The oracle recomputes
    // every sample arithmetically, so encoder AND decoder are under
    // the hash: a misread fmt chunk, a byte-order slip, or a bad pad
    // skip breaks the match.
    "q129_audio_features" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.extractFeatures(media, every = 4)
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          col("duration_ms"), col("sum_sq"),
          round(col("rms"), 4).as("rms"),
          col("zero_crossings"), col("peak"), col("dec_n"), col("dec_sum"))
    },

    // Image RESIZE through the codec, twice (r7): decode → nearest-
    // neighbor ÷2 → re-encode (32-wide rows, dimensions the fixture
    // rule never produces) → re-decode → digest + exact pixel sum. The
    // oracle re-derives every sampled pixel arithmetically from the
    // padded-text rule, so a stride slip, a mis-encoded IHDR, or a bad
    // row filter on EITHER codec pass breaks the hash.
    "q143_image_resize" -> { (s, d) =>
      val media = graft.operators.Multimodal.asMedia(Tables.documents(s, d))
      graft.operators.Multimodal.resizeNearest(media, factor = 2)
        .select("doc_id", "out_width", "out_height", "out_n_pixels",
          "out_md5", "out_sum")
    },

    // Perceptual image dedup (q185): aHash over DECODED pixels, Manku
    // block-index pairs within Hamming 3. The fixture plants a
    // one-character pixel mutation (id + 100000 copies), so most
    // planted pairs land at small nonzero distance; the oracle is the
    // ALL-PAIRS replay from the pixel rule, so the block join's
    // completeness AND the decode→hash path are both under the hash.
    "q185_image_neardup" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val mut = docs.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(substring(col("text"), 1, 99), lit("Z"),
            substring(col("text"), 101, 1000000)).as("text"))
      val media = graft.operators.Multimodal.asMedia(docs.unionByName(mut))
      graft.operators.Multimodal.imageNearDupPairs(media, radius = 3)
    },

    // ViT patchification (q211): the decoded image cut into a 4x4
    // non-overlapping grid (full patches only), exact pixel sum +
    // digest per patch — the vision-transformer token-ization step.
    // The oracle re-derives every patch byte from the padded-text rule.
    "q211_image_patches" -> { (s, d) =>
      val media = graft.operators.Multimodal.asMedia(Tables.documents(s, d))
      graft.operators.Multimodal.imagePatches(media, size = 4).toDF()
    },

    // Audio frame energies (q212): 64-sample non-overlapping windows
    // over the DECODED PCM (trailing partial frame kept) with exact
    // integer energy and peak — the VAD/segmentation primitive.
    "q212_audio_frames" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.frameEnergies(media, frameLen = 64).toDF()
    },

    // Full baseline JPEG decode (q326, r12 — closes the one modality
    // short of real decode): the fixture plants one UNIFORM 8×8 block
    // per text byte, so the LOSSY pipeline (real FDCT → flat quant →
    // Huffman → full Huffman/dequant/IDCT decode) is bit-exact and the
    // oracle replays every decoded pixel arithmetically. JpegSpec
    // cross-validates both codec directions against javax.imageio.
    "q326_jpeg_decode" -> { (s, d) =>
      val media = graft.operators.Jpeg.asJpegMedia(Tables.documents(s, d))
      graft.operators.Jpeg.parseMeta(media)
        .select(col("doc_id"), lit("image/jpeg").as("format"),
          col("width"), col("height"), col("n_pixels"),
          col("pixel_md5"), col("pixel_sum"))
    },

    // Full COLOR baseline JPEG decode (q339, r13 — closes the r12
    // verdict's top gap: real web images are YCbCr, not grayscale):
    // the fixture plants block-uniform Y AND block-uniform subsampled
    // chroma (each chroma block keyed to its 2×2 luma group's top-left
    // byte), so the whole 4:2:0 pipeline — downsampled encode,
    // interleaved MCU scan, 4-table Huffman, decode, replicate
    // upsample, JFIF YCbCr→RGB — is bit-exact and the oracle replays
    // every block's RGB triple arithmetically. JpegSpec cross-validates
    // color both directions against javax.imageio.
    "q339_jpeg_color" -> { (s, d) =>
      val media = graft.operators.Jpeg.asColorJpegMedia(Tables.documents(s, d))
      graft.operators.Jpeg.parseColorMeta(media)
        .select(col("doc_id"), lit("image/jpeg").as("format"),
          col("width"), col("height"), col("channels"),
          col("n_pixels"), col("rgb_md5"), col("rgb_sum"))
    },

    // PROGRESSIVE JPEG decode (q345, r13): the same planted color
    // fixture through the SOF2 5-scan spectral script (DC first at
    // Al=1, DC refinement, per-component AC first with EOB runs) —
    // the scans carry every quantized coefficient exactly, so the
    // decode is bit-identical to q339's baseline stream and the
    // oracle is SHARED verbatim: hash equality proves the whole
    // progressive path (scan accumulation, refinement bit, EOBRUN,
    // final dequant+IDCT). JpegSpec cross-validates against
    // javax.imageio's progressive writer both directions.
    "q345_jpeg_progressive" -> { (s, d) =>
      val media = graft.operators.Jpeg.asProgressiveJpegMedia(
        Tables.documents(s, d))
      graft.operators.Jpeg.parseColorMeta(media)
        .select(col("doc_id"), lit("image/jpeg").as("format"),
          col("width"), col("height"), col("channels"),
          col("n_pixels"), col("rgb_md5"), col("rgb_sum"))
    },

    // COLOR PNG decode (q350, r14 — closes the r13 verdict's top gap:
    // real web PNGs are truecolor/palette/RGBA, not grayscale). The
    // fixture cycles the three storage types by doc_id mod 3 —
    // truecolor (IHDR type 2), palette+PLTE (type 3), RGBA (type 6) —
    // all encoding the SAME per-byte color rule (R=b, G=255−b,
    // B=(b+85)%256; A=255−(b%32) for RGBA, else opaque), so one
    // arithmetic oracle replay covers every storage path: the parsed
    // colour type, the storage channel count, the decoded-RGB hex
    // digest, and the exact RGB + alpha sums are all under the hash.
    // MultimodalSpec cross-validates all three types against
    // javax.imageio in both directions.
    "q350_png_color" -> { (s, d) =>
      val media = graft.operators.Multimodal.asColorMedia(Tables.documents(s, d))
      graft.operators.Multimodal.parseColorMeta(media)
        .select(col("doc_id"), lit("image/png").as("format"),
          col("width"), col("height"), col("color_type"), col("channels"),
          col("n_pixels"), col("rgb_md5"), col("rgb_sum"), col("alpha_sum"))
    },

    // INTERLACED PNG decode (q359, r14): the same color rule stored
    // Adam7-interlaced (truecolor) — the progressive-download layout
    // real web PNGs still ship. The decoder unfilters each of the
    // seven sub-images independently and scatters them into place;
    // hash equality with the arithmetic replay proves pass geometry,
    // per-pass filtering, and the scatter are all exact.
    "q359_png_interlaced" -> { (s, d) =>
      val media = graft.operators.Multimodal.asInterlacedMedia(
        Tables.documents(s, d))
      graft.operators.Multimodal.parseColorMeta(media)
        .select(col("doc_id"), lit("image/png").as("format"),
          col("width"), col("height"), col("color_type"), col("channels"),
          col("n_pixels"), col("rgb_md5"), col("rgb_sum"), col("alpha_sum"))
    },

    // GIF decode (q361, r14): the THIRD real web-image container. The
    // fixture stores the pixelsOf index bytes under the shared 256-entry
    // color-rule palette (GCT entry i = colorOf(i)), odd doc_ids
    // INTERLACED (the 4-pass GIF row shuffle), so one arithmetic replay
    // proves the LZW decompressor (variable-width LSB-first codes,
    // CLEAR/EOI, KwKwK), the sub-block reassembly, the palette→RGB
    // mapping, AND the de-interlace scatter. GifSpec cross-validates
    // both directions against javax.imageio's GIF reader and writer.
    "q361_gif_decode" -> { (s, d) =>
      val media = graft.operators.Gif.asGifMedia(Tables.documents(s, d))
      graft.operators.Gif.parseGifMeta(media)
        .select(col("doc_id"), lit("image/gif").as("format"),
          col("width"), col("height"), col("n_frames"), col("interlaced"),
          col("n_pixels"), col("rgb_md5"), col("rgb_sum"))
    },

    // ANIMATED GIF frame sampling (q362, r14): the video-frame-sample
    // contract over a real multi-frame container — decode once, stride-2
    // keep, per-frame GCE delay + palette-resolved RGB digest. Frame f's
    // indices are (byte + 17f) mod 256, so the oracle replays every kept
    // frame exactly; a wrong frame boundary, a delay misparse, or a
    // dictionary carry-over between frames breaks the hash.
    "q362_gif_frames" -> { (s, d) =>
      val media = graft.operators.Gif.asAnimatedGifMedia(Tables.documents(s, d))
      graft.operators.Gif.sampleGifFrames(media, stride = 2)
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          col("delay_cs"), col("rgb_md5"), col("rgb_sum"))
    },

    // EXIF PARSE + ORIENTATION NORMALIZATION (q363, r14): the metadata
    // layer real web JPEGs carry. The fixture splices an APP1 Exif/TIFF
    // segment (byte order II/MM by doc parity, out-of-line ASCII and
    // RATIONAL values, an Exif sub-IFD) into the q339 color payloads
    // with orientation 1 + doc_id%8; the engine parses the TIFF walk,
    // decodes, and applies the canonical upright transform BEFORE
    // hashing — the auto-rotate step pixel dedup needs. The oracle
    // replays the tag arithmetic AND the block-permutation per
    // orientation, so a wrong transform direction, a bad IFD offset, or
    // an endianness slip all break the hash. rgb_sum is transform-
    // invariant by construction (a digest mismatch with equal sums
    // isolates a permutation bug from a decode bug).
    "q363_exif_orient" -> { (s, d) =>
      val media = graft.operators.Exif.asExifJpegMedia(Tables.documents(s, d))
      graft.operators.Exif.orientNormalized(media)
        .select(col("doc_id"), col("orientation"), col("make"), col("model"),
          col("date_time"), col("xres_num"), col("pixel_x"), col("pixel_y"),
          col("out_width"), col("out_height"), col("rgb_md5"), col("rgb_sum"))
    },

    // GPS METADATA SCRUB (q384, r14): the geo-PII pass every public
    // image corpus needs — even doc_ids carry a GPS sub-IFD (lat/lon
    // in microdegrees); the engine records the coordinates (the audit
    // trail), strips the block by canonical APP1 rebuild, and proves
    // on the SCRUBBED bytes that GPS is gone, the camera tags and
    // orientation survive, and the decoded pixels are bit-identical
    // (the q339 digest).
    "q384_gps_scrub" -> { (s, d) =>
      val media = graft.operators.Exif.asGpsJpegMedia(Tables.documents(s, d))
      graft.operators.Exif.gpsScrub(media)
        .select(col("doc_id"), col("had_gps"), col("lat_udeg"),
          col("lon_udeg"), col("gps_after"), col("orientation"),
          col("rgb_md5"), col("rgb_sum"))
    },

    // PNG eXIf ORIENTATION (q383, r14): PNG has carried Exif since the
    // 1.2 extension's standardized eXIf chunk (raw TIFF, no JPEG
    // prefix) — this is q363's contract on the PNG container: parse
    // the chunk (CRC verified), decode any of the three storage types,
    // apply the upright transform, digest. PNG pixels are PER-PIXEL
    // (not block-uniform), so the oracle replays a true pixel
    // permutation of the q350 color chain.
    "q383_png_exif_orient" -> { (s, d) =>
      val media = graft.operators.Exif.asExifPngMedia(Tables.documents(s, d))
      graft.operators.Exif.orientNormalizedPng(media)
        .select(col("doc_id"), col("orientation"), col("out_width"),
          col("out_height"), col("rgb_md5"), col("rgb_sum"))
    },

    // DCT PERCEPTUAL HASH dedup (q351, r14): pHash over decoded COLOR
    // JPEG payloads — Rec.601 integer luma, 32×32 nearest downsample,
    // scaled-INTEGER separable DCT (the 8×32 cos basis is computed
    // once and interpolated into the oracle as literals, so both
    // engines produce identical longs — no float near the median
    // threshold), bit k = coef k > lower-median, 4×16-bit Manku
    // blocks, pigeonhole pair join within Hamming ≤ 3. The fixture
    // plants a one-character mutation (id + 100000 copies), and the
    // oracle is the ALL-PAIRS replay from the color block rule, so
    // the block join's completeness AND the decode→luma→DCT path are
    // both under the hash.
    "q351_phash_neardup" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val mut = docs.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(substring(col("text"), 1, 99), lit("Z"),
            substring(col("text"), 101, 1000000)).as("text"))
      val media = graft.operators.Jpeg.asColorJpegMedia(docs.unionByName(mut))
      graft.operators.Multimodal.pHashNearDupPairs(media, radius = 3)
    },

    // IMAGE-TEXT PAIR EXTRACTION (q346, r13 — the CLIP-data flagship,
    // q240 ∘ q339): every document renders a gallery page whose <img>
    // tags reference OTHER documents' color-JPEG payloads by
    // arithmetic rule (absolute and protocol-relative src shapes, one
    // alt-less image, a data-src decoy that must NOT extract);
    // extractImageRefs pulls (src, alt) per tag, resolves + canonical-
    // izes the URL, and the refs join the decoded-image table on the
    // canonical URL — alt caption next to real decoded RGB digest,
    // the LAION pair-construction step end to end under one hash.
    "q346_image_text_pairs" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val pages = docs.select(col("doc_id")).crossJoin(broadcast(n)).select(
        col("doc_id"),
        concat(lit("http://corpus.example/s"), pmod(col("doc_id"), lit(5)),
          lit("/p"), col("doc_id"), lit(".html")).as("url"),
        concat(
          lit("<html><body><p>gallery "), col("doc_id"), lit("</p>"),
          concat_ws("", transform(
            sequence(lit(1), (lit(1) + pmod(col("doc_id"), lit(3))).cast("int")),
            j => concat(lit("<img class='g' src=\"http://img.example/i"),
              ((col("doc_id") * 31 + j * 7) % col("n")).cast("string"),
              lit(".jpg\" alt=\"pic "), col("doc_id"), lit(" "),
              j.cast("string"), lit("\">")))),
          lit("<img src='//img.example/i"), pmod(col("doc_id"), lit(89)),
          lit(".jpg'>"),
          lit("<img data-src='http://img.example/i0.jpg' alt='decoy'>"),
          lit("</body></html>")).as("html"))
      val refs = graft.operators.Web.extractImageRefs(
        pages, "doc_id", "html", "url")
        .select(col("doc_id").as("page_id"), col("img_url"), col("alt"))
      val meta = graft.operators.Jpeg.parseColorMeta(
        graft.operators.Jpeg.asColorJpegMedia(docs))
        .select(concat(lit("http://img.example/i"), col("doc_id"),
          lit(".jpg")).as("img_url"),
          col("width"), col("height"), col("rgb_md5"))
      refs.join(meta, "img_url")
        .select(col("page_id"), col("img_url"), col("alt"),
          col("width"), col("height"), col("rgb_md5"))
    },

    // CLIP-pair CURATION (q348, r13): content-level dedup of the q346
    // pairs — every image is published under TWO urls (i<id> and the
    // CDN-mirror m<id>, same payload), pages reference a mix of both
    // families, and pairs sharing the DECODED-RGB digest collapse to
    // one keeper chosen by caption richness (alt length desc, then
    // alt, page, url — a total order). The window partitions by the
    // content digest (per-image groups — scale-safe); the oracle
    // replays refs, the color-decode digest, the rank, and the
    // group rollup.
    "q348_pair_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val pages = docs.select(col("doc_id")).crossJoin(broadcast(n)).select(
        col("doc_id"),
        concat(lit("http://corpus.example/s"), pmod(col("doc_id"), lit(5)),
          lit("/p"), col("doc_id"), lit(".html")).as("url"),
        concat(
          lit("<html><body>"),
          concat_ws("", transform(
            sequence(lit(1), (lit(1) + pmod(col("doc_id"), lit(3))).cast("int")),
            j => concat(lit("<img src=\"http://img.example/i"),
              ((col("doc_id") * 31 + j * 7) % col("n")).cast("string"),
              lit(".jpg\" alt=\"pic "), col("doc_id"), lit(" "),
              j.cast("string"), lit("\">")))),
          lit("<img src='//img.example/m"), pmod(col("doc_id"), lit(89)),
          lit(".jpg'>"),
          lit("</body></html>")).as("html"))
      val refs = graft.operators.Web.extractImageRefs(
        pages, "doc_id", "html", "url")
        .select(col("doc_id").as("page_id"), col("img_url"), col("alt"))
      val meta0 = graft.operators.Jpeg.parseColorMeta(
        graft.operators.Jpeg.asColorJpegMedia(docs))
        .select(col("doc_id"), col("rgb_md5"))
      val meta = meta0.select(concat(lit("http://img.example/i"),
          col("doc_id"), lit(".jpg")).as("img_url"), col("rgb_md5"))
        .unionAll(meta0.select(concat(lit("http://img.example/m"),
          col("doc_id"), lit(".jpg")).as("img_url"), col("rgb_md5")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("rgb_md5")
        .orderBy(length(col("alt")).desc, col("alt").asc,
          col("page_id").asc, col("img_url").asc)
      refs.join(meta, "img_url")
        .withColumn("rn", row_number().over(w))
        .groupBy("rgb_md5")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("img_url")).as("n_urls"),
          max(when(col("rn") === 1, col("page_id"))).as("keeper_page"),
          max(when(col("rn") === 1, col("alt"))).as("keeper_alt"))
    },

    // AUDIO RESAMPLE (q356, r14 — the r13 verdict's audio gap, half 1):
    // rational 3/2 upsample (16 kHz → 24 kHz) by linear interpolation
    // with EXACT integer phase arithmetic (floor division at scale L,
    // identical on both engines), THROUGH the codec twice — decode,
    // resample, re-encode at 24 kHz, re-decode, exact integer sums of
    // the second decode. The oracle replays every interpolated sample
    // from the text rule.
    "q356_audio_resample" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.resample(media, l = 3, m = 2).toDF()
    },

    // MEL-BAND ENERGIES (q357, half 2): Goertzel-style correlation
    // energies per 64-sample frame of the RESAMPLED stream against 8
    // mel-spaced bands on the integer lattice — the scaled-integer
    // cos/sin tables are computed once in Scala and interpolated into
    // the oracle as literals (the pHash doctrine), and every energy is
    // an exact int64, so the whole spectral path is under the hash.
    "q357_audio_mel" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.resampleMelEnergies(media, l = 3, m = 2).toDF()
    },

    // TIFF decode (q368, r14): the FOURTH real image container —
    // scanned-document corpora ship TIFF. The fixture stores the shared
    // color rule as RGB strips (RowsPerStrip 8) cycling the three
    // baseline compressions by doc_id mod 3 — none, PackBits RLE, and
    // the MSB-first LZW variant with EARLY CHANGE (one code earlier
    // than GIF's width switch) — so one arithmetic replay proves the
    // IFD walk, strip reassembly, and all three codecs. TiffSpec
    // cross-validates both directions against the JDK's javax.imageio
    // TIFF plugin.
    "q368_tiff_decode" -> { (s, d) =>
      val media = graft.operators.Tiff.asTiffMedia(Tables.documents(s, d))
      graft.operators.Tiff.parseTiffMeta(media)
        .select(col("doc_id"), lit("image/tiff").as("format"),
          col("width"), col("height"), col("channels"), col("compression"),
          col("n_pixels"), col("rgb_md5"), col("rgb_sum"))
    },

    // BMP decode (q371, r14): the FIFTH image container — 24-bit
    // BI_RGB with bottom-up rows, BGR byte order, and 4-byte row
    // padding, the exact inversions a decoder most easily gets wrong.
    // 64·3 = 192 is 4-aligned, so the oracle hash would NOT catch a
    // padding bug on this width; BmpSpec covers padded widths and
    // top-down rows against javax.imageio both directions.
    "q371_bmp_decode" -> { (s, d) =>
      val media = graft.operators.Tiff.asBmpMedia(Tables.documents(s, d))
      graft.operators.Tiff.parseBmpMeta(media)
        .select(col("doc_id"), lit("image/bmp").as("format"),
          col("width"), col("height"), col("n_pixels"),
          col("rgb_md5"), col("rgb_sum"))
    },

    // CLIP PREPROCESS (q367, r14): decode → fixed-point BILINEAR
    // resize to 32×32 → center-crop 24×24 → digest, the image half of
    // a CLIP-style training-input pipeline with the resampling kernel
    // on the integer lattice (half-pixel convention, 8-bit weights,
    // >>16 blend). The source images are 8×8-block-uniform, so every
    // crop pixel blends up to four NEIGHBORING block colors — the
    // oracle replays each blend from the block rule, and a wrong
    // weight, a flipped axis, or an off-by-one crop offset breaks the
    // hash.
    "q367_clip_preprocess" -> { (s, d) =>
      val media = graft.operators.Jpeg.asColorJpegMedia(Tables.documents(s, d))
      graft.operators.Multimodal.clipPreprocess(media, size = 32, crop = 24)
        .toDF()
    },

    // CEPSTRAL COEFFICIENTS (q364, r14): the MFCC shape — q357's mel
    // filterbank, then an integer log (ilog16: 16·bitlen + the 4 bits
    // after the leading one — the PMI/DSIR doctrine applied to the log
    // fold) and a scaled-integer DCT-II over the 8 bands, keeping 4
    // coefficients per frame. Exact int64 end to end; the oracle
    // replays the whole filterbank→log→DCT chain with bin()/shifts.
    "q364_audio_cepstra" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.resampleCepstra(media, l = 3, m = 2).toDF()
    },

    // G.711 COMPANDING (q365, r14): µ-law AND A-law per the public
    // G.711 reference arithmetic (BIAS 0x84/CLIP µ-law; 13-bit A-law
    // with the 0x55 toggle) — the telephony codecs speech corpora ship
    // in. Code-byte digests and reconstruction-level sums are both
    // under the hash; the oracle replays the companders bit for bit.
    "q365_g711_compand" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.g711Compand(media).toDF()
    },

    // ORIENTATION-NORMALIZED pHASH DEDUP (q373, r14 — q363 ∘ q351,
    // the composition that PROVES why auto-rotate must precede pixel
    // dedup): every doc gets a twin at id+200000 storing the SAME
    // upright content physically rotated 90° CCW with Exif orientation
    // 6 (4:4:4 block-uniform planes, exactly representable). The
    // engine parses Exif, decodes, uprights, THEN pHashes and
    // band-joins — the planted twins land at Hamming 0; without the
    // normalization the stored pixels differ and the pairs vanish.
    "q373_oriented_phash" -> { (s, d) =>
      val media = graft.operators.Exif.asOrientedPairMedia(
        Tables.documents(s, d))
      graft.operators.Exif.orientedPHashPairs(media, radius = 2)
    },

    // WEBDATASET INGEST (q372, r14): the tar-shard layout multimodal
    // training data actually ships in — per sample, adjacent members
    // <id>.jpg + <id>.txt inside POSIX tar shards. The fixture PACKS
    // shards in-task (8 tars via pmod sharding), then the query runs
    // the real ingest: expandArchives → extension split → color-JPEG
    // decode → caption join by sample id. Shard packing, the ustar
    // reader, the codec, and the pairing are all under one hash.
    "q372_webdataset" -> { (s, d) =>
      import s.implicits._
      val dir = Fixtures.fresh(
        s"/tmp/graft_io/${new java.io.File(d).getName}/wds")
      new java.io.File(dir).mkdirs()
      graft.operators.Jpeg.asColorJpegMedia(Tables.documents(s, d))
        .select(col("doc_id"), col("payload"))
        .repartition(8, pmod(col("doc_id"), lit(8)))
        .as[(Long, Array[Byte])]
        .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
          val entries = it.flatMap { case (id, p) =>
            Seq((s"$id.jpg", p),
              (s"$id.txt",
                s"cap $id".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          }.toVector
          if (entries.nonEmpty) {
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val fo = new java.io.FileOutputStream(
              new java.io.File(dir, f"shard-$pid%03d.tar"))
            try fo.write(graft.io.WholeFiles.tarBytes(entries))
            finally fo.close()
          }
        }
      val parsed = graft.io.WholeFiles.expandArchives(s, dir)
        .select(regexp_extract(col("entry"), "(\\d+)\\.(jpg|txt)$", 1)
          .cast("long").as("doc_id"),
          regexp_extract(col("entry"), "\\.(jpg|txt)$", 1).as("ext"),
          col("content"))
      val metas = graft.operators.Jpeg.parseColorMeta(
        parsed.filter(col("ext") === "jpg")
          .select(col("doc_id"), col("content").as("payload")))
      val caps = parsed.filter(col("ext") === "txt")
        .select(col("doc_id"), col("content").cast("string").as("caption"))
      metas.join(caps, "doc_id")
        .select(col("doc_id"), col("caption"), col("width"), col("height"),
          col("rgb_md5"), col("rgb_sum"))
    },

    // SRT SUBTITLE ROUND-TRIP (q376, r14): cues by arithmetic rule →
    // canonical SRT text (renderSrt: zero-padded HH:MM:SS,mmm stamps)
    // → parseCues back — the caption-side grammar of a video-text
    // pipeline, serializer AND parser under the hash.
    "q376_srt_roundtrip" -> { (s, d) =>
      import s.implicits._
      val srt = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val cues = (0 to (id % 4).toInt).map { i =>
            graft.operators.Subtitles.Cue(id, i,
              10000L * i + (id % 7) * 10,
              10000L * i + (id % 7) * 10 + 900 + (i % 3) * 50,
              s"cue $id $i")
          }
          (id, graft.operators.Subtitles.renderSrt(cues))
        }.toDF("doc_id", "srt")
      graft.operators.Subtitles.parseCues(srt).toDF()
    },

    // FRAME–CAPTION ALIGNMENT (q377, r14 — q362 ∘ q376): the video-text
    // pairing step on real containers. Frame time spans come from the
    // DECODED GCE delays (cumulative window sum — a delay misparse
    // shifts every span); cues go through the SRT render+parse loop;
    // the interval join pairs them per document. Frame content digests
    // ride along, so decode, timing, grammar, and the overlap join are
    // all under one hash.
    "q377_frame_captions" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val frames = graft.operators.Gif.sampleGifFrames(
        graft.operators.Gif.asAnimatedGifMedia(docs), stride = 1).toDF()
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
      val fr = frames.withColumn("f_start_ms",
          (coalesce(sum(col("delay_cs")).over(w), lit(0)) * 10).cast("long"))
        .withColumn("f_end_ms",
          col("f_start_ms") + col("delay_cs").cast("long") * 10)
      val srt = docs.select(col("doc_id")).as[Long].map { id =>
        val cues = (0 to (id % 4).toInt).map { i =>
          graft.operators.Subtitles.Cue(id, i, 150L * i, 150L * i + 250,
            s"cap $id $i")
        }
        (id, graft.operators.Subtitles.renderSrt(cues))
      }.toDF("doc_id", "srt")
      val cues = graft.operators.Subtitles.parseCues(srt).toDF()
      graft.operators.Subtitles.alignFramesToCues(fr, cues)
    },

    // MULTIMODAL CURATION PIPELINE (q380, r14 flagship composition —
    // q373 ∘ q367): the image half of a CLIP-data curation pass, end
    // to end on verified pieces. The oriented-pair corpus (every doc +
    // its rotated Exif-6 twin) goes through orientation-normalized
    // pHash; EXACT-hash dedup groups each twin with its original
    // (keeper = min doc_id = the upright original, n_copies counts the
    // collapse); keepers then pay the CLIP preprocess (bilinear 32×32 +
    // center-crop 24×24) and emit the crop digest. A wrong upright
    // transform, hash, group, keeper rule, or resample weight all
    // break one hash.
    "q380_multimodal_pipeline" -> { (s, d) =>
      // DURABLE pin (r14 verdict watch item): the fixture feeds both
      // the hash pass and the keeper join, and at preemptible-100×
      // scale a composition-point pin must survive executor loss —
      // Staging.pin's snapshot tier, not executor-lifetime blocks.
      val base = Fixtures.fresh(
        s"/tmp/graft_io/${new java.io.File(d).getName}/q380_stage")
      val media = graft.operators.Staging.pin(
        graft.operators.Exif.asOrientedPairMedia(Tables.documents(s, d)),
        Some(base), "media")
      val hs = graft.operators.Exif.orientedPHash(media).toDF()
      val groups = hs.groupBy("b0", "b1", "b2", "b3")
        .agg(min(col("doc_id")).as("doc_id"),
          count(lit(1)).cast("long").as("n_copies"))
      val keepers = groups.join(media, "doc_id")
        .select(col("doc_id"), col("n_copies"), col("payload"))
      graft.operators.Multimodal.clipPreprocess(
          keepers.select("doc_id", "payload"), size = 32, crop = 24)
        .toDF()
        .join(keepers.select("doc_id", "n_copies"), "doc_id")
        .select(col("doc_id"), col("n_copies"), col("out_w"), col("out_h"),
          col("rgb_md5"), col("rgb_sum"))
    },

    // ID3v2 + MPEG FRAME-HEADER METADATA (q379, r14): the container
    // metadata layer MP3 corpora carry — the EXIF analog for audio.
    // Tag text (syncsafe size, ISO-8859-1 text frames), the bitrate/
    // sample-rate tables, and the REAL frame walk (sizes from the
    // header arithmetic, 1152 samples per Layer III frame) are all
    // under the hash; the PCM stays opaque by design.
    "q379_mp3_meta" -> { (s, d) =>
      graft.operators.Audio.parseMp3Meta(
        graft.operators.Audio.asMp3Media(Tables.documents(s, d))).toDF()
    },

    // STREAMING G.711 TRANSCODE (q381, r14): the online half of the
    // telephony-ingest path — WAV payloads land as files, Structured
    // Streaming tails them, and the SAME g711Compand mapPartitions
    // pass (stateless) emits per-clip code digests exactly-once into a
    // parquet sink; the sink must equal the batch rows bit for bit
    // (the q360/q375 ingest-parity doctrine on the audio family).
    "q381_g711_stream" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val base = Fixtures.fresh(
        s"/tmp/graft_io/${new java.io.File(d).getName}/g711_stream")
      graft.operators.Audio.asAudio(
          Tables.documents(s, d).filter(length(col("text")) > 0))
        .select("doc_id", "payload")
        .write.mode("overwrite").parquet(s"$base/in")
      val in = s.readStream.schema("doc_id LONG, payload BINARY")
        .parquet(s"$base/in")
      val coded = graft.operators.Audio.g711Compand(in).toDF()
      val q = coded.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.schema(coded.schema).parquet(s"$base/out")
    },

    // STEREO DOWNMIX (q378, r14): the channel-normalization step —
    // stereo WAV (left = the sample rule, right = the NEXT character's
    // sample, so a channel swap or de-interleave bug changes the mix),
    // m = ⌊(L+R)/2⌋ via floorDiv (negative sums round like the
    // oracle's floor() over exact doubles), re-encoded mono THROUGH
    // the codec and re-decoded — stereo parse, interleave order, the
    // mix arithmetic, and the mono encode all under the hash.
    "q378_stereo_downmix" -> { (s, d) =>
      graft.operators.Audio.downmixStereo(
        graft.operators.Audio.asStereoAudio(
          Tables.documents(s, d).filter(length(col("text")) > 0))).toDF()
    },

    // VAD SEGMENTATION (q374, r14): energy-gated voice-activity cuts —
    // the per-utterance segmentation step before any speech-model
    // processing. The fixture plants near-silence runs ('@' → sample
    // 64, frame energy ≈ 2.6e5 vs ≈ 7.9e9 for text) inside and after
    // the clip, so every doc splits into multiple maximal active runs;
    // the oracle replays frame energies and reconstructs the runs with
    // the gaps-and-islands window idiom.
    "q374_vad_segments" -> { (s, d) =>
      val docs = Tables.documents(s, d).filter(length(col("text")) > 0)
        .select(col("doc_id"), concat(
          substring(col("text"), 1, 100), lit("@" * 128),
          substring(col("text"), 101, 1000000), lit("@" * 64),
          lit("FINAL LOUD TAIL OF THE CLIP 999")).as("text"))
      graft.operators.Audio.vadSegments(
        graft.operators.Audio.asAudio(docs), frameLen = 64,
        threshold = 2000000000L).toDF()
    },

    // IMA ADPCM (q370, r14): the 4-bit adaptive-delta audio codec,
    // block-independent by construction (header carries the predictor,
    // step index resets per 65-sample block — the seek property a
    // distributed reader needs). The oracle replays the adaptive
    // quantizer as a 64-level recursive CTE over (doc, block) with the
    // 89-entry step table as literals — code bytes (headers + packed
    // nibbles) AND the reconstruction recurrence under one hash.
    "q370_adpcm" -> { (s, d) =>
      val media = graft.operators.Audio.asAudio(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Audio.adpcmRoundtrip(media).toDF()
    },

    // STREAMING pHash extraction (q360, r14): the perceptual-hash pass
    // of an online image-ingest pipeline — color-JPEG payloads land as
    // files, Structured Streaming tails them, and the SAME pHash
    // mapPartitions pass (stateless, so no watermark) emits the
    // 4×16-bit blocks exactly-once into a parquet sink. The oracle is
    // the q351 block chain over the plain corpus: batch decode→DCT→
    // median bits and the streaming run pin to one hash (the q116/q122
    // ingest-parity doctrine extended to the multimodal family).
    "q360_phash_stream" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val base = Fixtures.fresh(
        s"/tmp/graft_io/${new java.io.File(d).getName}/phash_stream")
      graft.operators.Jpeg.asColorJpegMedia(Tables.documents(s, d))
        .select("doc_id", "payload")
        .write.mode("overwrite").parquet(s"$base/in")
      val in = s.readStream.schema("doc_id LONG, payload BINARY")
        .parquet(s"$base/in")
      val hashed = graft.operators.Multimodal.pHash(in).toDF()
      val q = hashed.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.schema(hashed.schema).parquet(s"$base/out")
    },

    // REAL video-container frame sampling (q189): 3 complete PNGs per
    // payload (frame f = pixels rotated left by f), structural chunk
    // walk to find frame boundaries, real decode of every 2nd frame,
    // digest over DECODED pixels — boundaries, codec, and sampling all
    // under the oracle hash (frames 0 and 2).
    "q189_video_frames" -> { (s, d) =>
      val video = graft.operators.Multimodal.asVideo(
        Tables.documents(s, d), nFrames = 3)
      graft.operators.Multimodal.sampleVideoFrames(video, every = 2)
        .toDF()
    }
  )

  // pixel rule in SQL (ASCII text): 64-wide rows, '.'-padded
  private val plenSql =
    "CAST(greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1) * 64 AS INTEGER)"

  /** q185's oracle: the aHash arithmetic replayed from the pixel rule
    * over the mutated corpus, then the ALL-PAIRS Hamming shortcut —
    * agreement hash-proves the engine's decode→hash path and the block
    * join's completeness at radius ≤ 3. Generated: 64 sample terms,
    * the integer mean compare (p·64 > Σp), four 16-bit block sums.
    */
  private def aHashOracle: String = {
    def pTerm(i: Int, j: Int) =
      s"ascii(substr(pix, CAST((($i * h) // 8) * 64 + ${8 * j + 1} AS INTEGER), 1))"
    val pCols = (for { i <- 0 until 8; j <- 0 until 8 } yield
      s"${pTerm(i, j)} AS p${i * 8 + j}").mkString(", ")
    val sumExpr = (0 until 64).map(k => s"p$k").mkString(" + ")
    def blockExpr(k: Int) = (0 until 16).map { o =>
      val idx = 16 * k + o
      s"(CASE WHEN p$idx * 64 > s64 THEN ${1 << o} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id,
                 substr(text, 1, 99) || 'Z' || substr(text, 101) AS text
          FROM documents WHERE doc_id % 2 = 0),
        px AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix,
                 CAST(greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1)
                   AS INTEGER) AS h
               FROM corpus),
        ps AS (SELECT doc_id, $pCols FROM px),
        ss AS (SELECT *, $sumExpr AS s64 FROM ps),
        hh AS (SELECT doc_id,
                 ${blockExpr(0)} AS b0, ${blockExpr(1)} AS b1,
                 ${blockExpr(2)} AS b2, ${blockExpr(3)} AS b3 FROM ss),
        pp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                   AS INTEGER) AS hamming
               FROM hh a JOIN hh b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pp WHERE hamming <= 3"""
  }

  /** q211's oracle: every patch byte re-derived from the padded-text
    * pixel rule — 4 row substrings concatenated per patch, ascii sums
    * for the exact pixel total, md5 over the same bytes (ASCII fixture
    * ⇒ byte slices == char slices).
    */
  private def patchOracle: String = {
    val rowTerms = (0 until 4).map(ri =>
      s"substr(pix, CAST((pr * 4 + $ri) * 64 + pc * 4 + 1 AS INTEGER), 4)")
      .mkString(" || ")
    s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix,
             CAST($plenSql / 64 AS BIGINT) AS h
           FROM documents),
        g AS (SELECT doc_id, pix,
                unnest(generate_series(0, h // 4 - 1)) AS pr
              FROM p WHERE h >= 4),
        gc AS (SELECT doc_id, pix, pr,
                 unnest(generate_series(0, 15)) AS pc
               FROM g),
        pb AS (SELECT doc_id, CAST(pr AS INTEGER) AS patch_row,
                 CAST(pc AS INTEGER) AS patch_col,
                 ($rowTerms) AS bytes
               FROM gc)
        SELECT doc_id, patch_row, patch_col,
             CAST(list_sum(list_transform(generate_series(1, 16),
               i -> ascii(substr(bytes, CAST(i AS INTEGER), 1)))) AS BIGINT)
               AS pix_sum,
             md5(bytes) AS patch_md5
        FROM pb"""
  }

  /** q326's oracle: the block-planted JPEG pixel rule replayed — text
    * bytes '.'-padded to 8-byte groups, each byte an 8×8 uniform
    * block, 8 blocks per pixel row. Per block-row the pixel row is
    * each of its 8 chars repeated 8×, and the 8 identical rows of a
    * block-row collapse to repeat(rowstr, 8); md5 over the assembled
    * string equals md5 over the decoded pixels (ASCII fixture), and
    * the pixel sum is 64× the byte sum.
    */
  private def jpegOracle: String = {
    val rowTerms = (0 until 8).map(j =>
      s"repeat(substr(bt, CAST(br * 8 + ${j + 1} AS INTEGER), 1), 8)")
      .mkString(" || ")
    s"""WITH p AS (SELECT doc_id,
             rpad(text, CAST(greatest(CAST(ceil(length(text) / 8.0) AS BIGINT),
               1) * 8 AS INTEGER), '.') AS bt
           FROM documents),
        b AS (SELECT doc_id, bt,
                unnest(generate_series(0, length(bt) // 8 - 1)) AS br
              FROM p),
        rs AS (SELECT doc_id, br, ($rowTerms) AS rowstr FROM b),
        fs AS (SELECT doc_id, string_agg(repeat(rowstr, 8), '' ORDER BY br)
                 AS pix
               FROM rs GROUP BY doc_id),
        sm AS (SELECT doc_id,
                 64 * list_sum(list_transform(split(bt, ''), c -> ascii(c)))
                   AS psum
               FROM p)
        SELECT fs.doc_id, 'image/jpeg' AS format, 64 AS width,
             CAST(length(pix) / 64 AS INTEGER) AS height,
             CAST(length(pix) AS INTEGER) AS n_pixels,
             md5(pix) AS pixel_md5,
             CAST(psum AS BIGINT) AS pixel_sum
        FROM fs JOIN sm USING (doc_id)"""
  }

  /** q339's oracle: the COLOR block rule replayed — per luma block
    * (br, bc) the decoded RGB triple is constant: y = the block's
    * byte, (cb, cr) derived from its 2×2 group's top-left byte, then
    * the exact JFIF equations with floor(x+0.5) rounding (DuckDB and
    * the engine compute the same IEEE doubles in the same order, so
    * the rounded ints agree exactly — the half-up form because DuckDB
    * round() is half-away-from-zero while Java Math.round is floor
    * (x+0.5)). The hash is md5 over the lowercase-hex dump of the
    * interleaved RGB bytes (values >127 would be multi-byte UTF-8 in a
    * DuckDB string; hex text is ASCII on both sides). Per block-row
    * the hex row is 8 blocks × (6 hex chars × 8 pixels); the 8
    * identical pixel rows collapse to repeat(rowhex, 8).
    */
  /** The q339 CTE chain alone (ends at `img`: doc_id, hexpix,
    * blocksum) — shared with q346, whose pair join needs per-image
    * width/height/digest mid-query, and (via `src`) with q351, which
    * replays the chain over a mutated corpus.
    */
  private def jpegColorCtes(src: String = "documents"): String = {
    def clamp(e: String) = s"LEAST(255, GREATEST(0, CAST(floor($e) AS INTEGER)))"
    val rExpr = clamp("yv + 1.402*(crv - 128) + 0.5")
    val gExpr = clamp("yv - 0.344136*(cbv - 128) - 0.714136*(crv - 128) + 0.5")
    val bExpr = clamp("yv + 1.772*(cbv - 128) + 0.5")
    def hx(c: String) = s"lpad(lower(to_hex($c)), 2, '0')"
    s"""p AS (SELECT doc_id,
             rpad(text, CAST(greatest(CAST(ceil(length(text) / 16.0) AS BIGINT),
               1) * 16 AS INTEGER), '.') AS bt
           FROM $src),
        blk AS (SELECT doc_id, bt,
                  unnest(generate_series(0, length(bt) // 8 - 1)) AS br
                FROM p),
        cell AS (SELECT doc_id, bt, br,
                   unnest(generate_series(0, 7)) AS bc
                 FROM blk),
        ycc AS (SELECT doc_id, br, bc,
                  ascii(substr(bt, CAST(br * 8 + bc + 1 AS INTEGER), 1)) AS yv,
                  255 - ascii(substr(bt,
                    CAST((br // 2) * 16 + (bc // 2) * 2 + 1 AS INTEGER), 1))
                    AS cbv,
                  (ascii(substr(bt,
                    CAST((br // 2) * 16 + (bc // 2) * 2 + 1 AS INTEGER), 1))
                    + 85) % 256 AS crv
                FROM cell),
        rgb AS (SELECT doc_id, br, bc,
                  $rExpr AS rr, $gExpr AS gg, $bExpr AS bb
                FROM ycc),
        bh AS (SELECT doc_id, br, bc,
                 repeat(${hx("rr")} || ${hx("gg")} || ${hx("bb")}, 8) AS hex8,
                 CAST(rr + gg + bb AS BIGINT) AS psum
               FROM rgb),
        rw AS (SELECT doc_id, br,
                 string_agg(hex8, '' ORDER BY bc) AS rowhex,
                 SUM(psum) AS rowsum
               FROM bh GROUP BY doc_id, br),
        img AS (SELECT doc_id,
                  string_agg(repeat(rowhex, 8), '' ORDER BY br) AS hexpix,
                  SUM(rowsum) AS blocksum
                FROM rw GROUP BY doc_id)"""
  }

  private def jpegColorOracle: String =
    s"""WITH ${jpegColorCtes()}
        SELECT doc_id, 'image/jpeg' AS format, 64 AS width,
             CAST(length(hexpix) / (6 * 64) AS INTEGER) AS height,
             3 AS channels,
             CAST(length(hexpix) / 6 AS INTEGER) AS n_pixels,
             md5(hexpix) AS rgb_md5,
             CAST(blocksum * 64 AS BIGINT) AS rgb_sum
        FROM img"""

  /** q346's oracle: the planted pair arithmetic (two resolvable img
    * shapes per page family; the data-src decoy must not survive)
    * joined to the q339 color-decode chain by image id — pairs AND
    * decoded digests under one hash.
    */
  private def imageTextPairsOracle: String =
    s"""WITH ${jpegColorCtes()},
        meta AS (SELECT doc_id,
                   CAST(length(hexpix) / (6 * 64) AS INTEGER) AS height,
                   md5(hexpix) AS rgb_md5
                 FROM img),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        refs AS (
          SELECT d.doc_id AS page_id,
                 (d.doc_id * 31 + j.j * 7) % nn.n AS img_id,
                 'pic ' || CAST(d.doc_id AS VARCHAR) || ' ' ||
                   CAST(j.j AS VARCHAR) AS alt
          FROM documents d, nn, (VALUES (1), (2), (3)) AS j(j)
          WHERE j.j <= 1 + d.doc_id % 3
          UNION ALL
          SELECT doc_id, doc_id % 89, '' FROM documents)
        SELECT r.page_id,
             'http://img.example/i' || CAST(r.img_id AS VARCHAR) || '.jpg'
               AS img_url,
             r.alt,
             64 AS width, m.height, m.rgb_md5
        FROM refs r JOIN meta m ON m.doc_id = r.img_id"""

  /** q350's oracle: the color rule replayed per pixel position — hex
    * triple per byte of the padded-text rule, exact RGB and alpha sums,
    * storage type/channels from the doc_id mod 3 cycle. Identical
    * decoded RGB across the three storage types is the point: one
    * replay proves truecolor, palette, and RGBA decode agree.
    */
  private def pngColorOracle(
      typeSql: String =
        "CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 6 END",
      chanSql: String =
        "CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 4 END",
      alphaSql: String =
        "CASE WHEN doc_id % 3 = 2 THEN 255 - (v % 32) ELSE 255 END")
      : String =
    s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
           FROM documents),
        ix AS (SELECT doc_id, pix,
                 unnest(generate_series(1, length(pix))) AS i
               FROM p),
        bv AS (SELECT doc_id, i,
                 ascii(substr(pix, CAST(i AS INTEGER), 1)) AS v
               FROM ix),
        hx AS (SELECT doc_id, i,
                 lpad(lower(to_hex(v)), 2, '0') ||
                 lpad(lower(to_hex(255 - v)), 2, '0') ||
                 lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3,
                 v + (255 - v) + (v + 85) % 256 AS s3,
                 $alphaSql AS av
               FROM bv),
        img AS (SELECT doc_id, string_agg(h3, '' ORDER BY i) AS hexpix,
                  SUM(s3) AS rgbsum, SUM(av) AS asum, count(*) AS n
                FROM hx GROUP BY doc_id)
        SELECT doc_id, 'image/png' AS format, 64 AS width,
             CAST(n // 64 AS INTEGER) AS height,
             CAST($typeSql AS INTEGER) AS color_type,
             CAST($chanSql AS INTEGER) AS channels,
             CAST(n AS INTEGER) AS n_pixels, md5(hexpix) AS rgb_md5,
             CAST(rgbsum AS BIGINT) AS rgb_sum,
             CAST(asum AS BIGINT) AS alpha_sum
        FROM img"""

  /** q351's oracle: the color block rule → integer luma → 32×32
    * downsample → scaled-integer DCT → lower-median bits → 4×16-bit
    * blocks, then the ALL-PAIRS Hamming shortcut (the q185 doctrine:
    * agreement proves the engine's Manku block join is complete at
    * radius ≤ 3 AND the decode→luma→DCT path is exact). The DCT basis
    * literals come from the same Scala table the engine uses.
    */
  /** The pHash CTE chain (color block rule → luma → 32×32 → integer
    * DCT → median bits → 4×16-bit blocks), ending at `blocks`
    * (doc_id, b0..b3) — over whatever `corpus` CTE precedes it.
    * Shared by q351 (pair search) and q360 (streaming parity).
    */
  private def pHashBlockCtes: String = pHashBlockCtesOver("corpus")

  /** [[pHashBlockCtes]] over an arbitrary (doc_id, text) CTE — q389
    * hashes a corpus whose image text differs from its caption text.
    */
  private def pHashBlockCtesOver(src: String): String = {
    val ctValues = (for { u <- 0 until 8; k <- 0 until 32 } yield
      s"($u,$k,${graft.operators.Multimodal.PHashCos(u)(k)})").mkString(", ")
    s"""${jpegColorCtes(src)},
        lum AS (SELECT doc_id, br, bc,
                  (77 * rr + 150 * gg + 29 * bb) // 256 AS lv
                FROM rgb),
        hh AS (SELECT doc_id, CAST(8 * (max(br) + 1) AS BIGINT) AS h
               FROM lum GROUP BY doc_id),
        grid AS (SELECT doc_id, h,
                   unnest(generate_series(0, 31)) AS r
                 FROM hh),
        grid2 AS (SELECT doc_id, h, r,
                    unnest(generate_series(0, 31)) AS c
                  FROM grid),
        l32 AS (SELECT g.doc_id, g.r, g.c, lum.lv
                FROM grid2 g JOIN lum
                  ON lum.doc_id = g.doc_id
                 AND lum.br = ((g.r * g.h) // 32) // 8
                 AND lum.bc = g.c // 4),
        ct(u, k, cv) AS (VALUES $ctValues),
        m1 AS (SELECT l.doc_id, ct.u, l.c,
                 SUM(CAST(ct.cv AS BIGINT) * l.lv) AS m
               FROM l32 l JOIN ct ON ct.k = l.r
               GROUP BY 1, 2, 3),
        f AS (SELECT m1.doc_id, m1.u * 8 + ct.u AS kk,
                CAST(SUM(m1.m * ct.cv) AS BIGINT) AS fv
              FROM m1 JOIN ct ON ct.k = m1.c
              GROUP BY 1, 2),
        md AS (SELECT doc_id, fv AS med FROM (
                 SELECT doc_id, fv, row_number() OVER (
                   PARTITION BY doc_id ORDER BY fv ASC, kk ASC) AS rn
                 FROM f) WHERE rn = 32),
        bits AS (SELECT f.doc_id, f.kk,
                   CASE WHEN f.fv > md.med THEN 1 ELSE 0 END AS b
                 FROM f JOIN md USING (doc_id)),
        blocks AS (SELECT doc_id,
            CAST(SUM(CASE WHEN kk // 16 = 0 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b0,
            CAST(SUM(CASE WHEN kk // 16 = 1 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b1,
            CAST(SUM(CASE WHEN kk // 16 = 2 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b2,
            CAST(SUM(CASE WHEN kk // 16 = 3 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b3
          FROM bits GROUP BY doc_id)"""
  }

  private def pHashOracle: String =
    s"""WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 100000 AS doc_id,
                 substr(text, 1, 99) || 'Z' || substr(text, 101) AS text
          FROM documents WHERE doc_id % 2 = 0),
        $pHashBlockCtes,
        pp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                   AS INTEGER) AS hamming
               FROM blocks a JOIN blocks b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pp WHERE hamming <= 3"""

  /** q360's oracle: the pHash block chain over the plain documents —
    * the streaming extraction must land exactly these rows.
    */
  private def pHashStreamOracle: String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
        $pHashBlockCtes
        SELECT doc_id, b0, b1, b2, b3 FROM blocks"""

  /** The q356/q357 resampled-stream CTE chain (ends at `vals`:
    * doc_id, n = input length, i = output index, v = resampled
    * sample): the 257·b − 16384 sample rule at k = ⌊2i/3⌋ and
    * k+1 (last-sample hold), floor-divided interpolation at scale 3 —
    * the engine's Math.floorDiv as SQL floor() over an exact double.
    */
  private def resampleCtes: String = {
    def samp(pos: String) =
      s"(257 * ascii(substr(text, CAST(($pos) + 1 AS INTEGER), 1)) - 16384)"
    s"""d AS (SELECT doc_id, text, length(text) AS n FROM documents
           WHERE length(text) > 0),
        o AS (SELECT doc_id, text, n,
                unnest(generate_series(0, ((n - 1) * 3) // 2)) AS i
              FROM d),
        vals AS (SELECT doc_id, n, i,
              CAST(floor((${samp("(i * 2) // 3")} * (3 - (i * 2) % 3)
                + ${samp("least((i * 2) // 3 + 1, n - 1)")} * ((i * 2) % 3))
                / 3.0) AS BIGINT) AS v
            FROM o)"""
  }

  private def audioResampleOracle: String =
    s"""WITH $resampleCtes,
        agg AS (SELECT doc_id, max(n) AS n, count(*) AS out_n,
                  SUM(v) AS s1, SUM(v * v) AS s2
                FROM vals GROUP BY doc_id)
        SELECT doc_id, CAST(n AS INTEGER) AS in_n,
             CAST(out_n AS INTEGER) AS out_n, 24000 AS out_rate,
             CAST(s1 AS BIGINT) AS out_sum, CAST(s2 AS BIGINT) AS out_sumsq
        FROM agg"""

  /** q357's oracle: the resampled stream framed at 64, correlated
    * against the SAME scaled-integer mel tables the engine computed
    * (interpolated below as 512 literal rows), energy = c² + s².
    */
  private def audioMelOracle: String = {
    val (cosT, sinT) = graft.operators.Audio.melTables(24000)
    val ctValues = (for { k <- 0 until 8; j <- 0 until 64 } yield
      s"($k,$j,${cosT(k)(j)},${sinT(k)(j)})").mkString(", ")
    s"""WITH $resampleCtes,
        ct(band, j, cv, sv) AS (VALUES $ctValues),
        fr AS (SELECT doc_id, i // 64 AS frame_idx, i % 64 AS j, v
               FROM vals),
        corr AS (SELECT f.doc_id, f.frame_idx, ct.band,
                   SUM(f.v * ct.cv) AS c, SUM(f.v * ct.sv) AS s
                 FROM fr f JOIN ct ON ct.j = f.j
                 GROUP BY 1, 2, 3)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             CAST(band AS INTEGER) AS band,
             CAST(c * c + s * s AS BIGINT) AS energy
        FROM corr"""
  }

  /** q364's oracle: the q357 chain extended by the integer-log and the
    * scaled-integer DCT-II (32 literal basis rows from the SAME Scala
    * table the engine uses). bin(e) gives the bitlen; the 4 fractional
    * bits come from pure shifts, so no float exists anywhere.
    */
  private def audioCepstraOracle: String = {
    val (cosT, sinT) = graft.operators.Audio.melTables(24000)
    val ctValues = (for { k <- 0 until 8; j <- 0 until 64 } yield
      s"($k,$j,${cosT(k)(j)},${sinT(k)(j)})").mkString(", ")
    val dtValues = (for { q <- 0 until graft.operators.Audio.CepCoefs
                          k <- 0 until 8 } yield
      s"($q,$k,${graft.operators.Audio.CepDct(q)(k)})").mkString(", ")
    s"""WITH $resampleCtes,
        ct(band, j, cv, sv) AS (VALUES $ctValues),
        dt(q, band, dv) AS (VALUES $dtValues),
        fr AS (SELECT doc_id, i // 64 AS frame_idx, i % 64 AS j, v
               FROM vals),
        corr AS (SELECT f.doc_id, f.frame_idx, ct.band,
                   SUM(f.v * ct.cv) AS c, SUM(f.v * ct.sv) AS s
                 FROM fr f JOIN ct ON ct.j = f.j
                 GROUP BY 1, 2, 3),
        en AS (SELECT doc_id, frame_idx, band,
                 CAST(c * c + s * s AS BIGINT) AS e
               FROM corr),
        lg AS (SELECT doc_id, frame_idx, band,
                 CASE WHEN e <= 0 THEN 0
                      ELSE length(bin(e)) * 16 +
                        (CASE WHEN length(bin(e)) >= 5
                              THEN e >> (length(bin(e)) - 5)
                              ELSE e << (5 - length(bin(e))) END) - 16
                 END AS lv
               FROM en),
        cep AS (SELECT l.doc_id, l.frame_idx, d.q,
                  SUM(d.dv * l.lv) AS cc
                FROM lg l JOIN dt d ON d.band = l.band
                GROUP BY 1, 2, 3)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             CAST(SUM(CASE WHEN q = 0 THEN cc END) AS BIGINT) AS c0,
             CAST(SUM(CASE WHEN q = 1 THEN cc END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN q = 2 THEN cc END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN q = 3 THEN cc END) AS BIGINT) AS c3
        FROM cep GROUP BY doc_id, frame_idx"""
  }

  /** q365's oracle: both G.711 companders replayed bit for bit on the
    * RAW sample rule (no resample) — µ-law via bias/bitlen/mantissa
    * shifts, A-law via the 13-bit fold, segment bitlen, and the 0x55
    * toggle (xor). Code hex streams digest in sample order; decode
    * levels sum exactly. Negative folds use nonnegative operands only,
    * so DuckDB's truncating // agrees with the engine's shifts.
    */
  private def g711Oracle: String =
    s"""WITH s AS (SELECT doc_id, length(text) AS n, text FROM documents
           WHERE length(text) > 0),
        ix AS (SELECT doc_id, n, unnest(generate_series(1, n)) AS i, text
               FROM s),
        v AS (SELECT doc_id, n, i,
                257 * ascii(substr(text, CAST(i AS INTEGER), 1)) - 16384 AS x
              FROM ix),
        uq AS (SELECT doc_id, n, i,
                 CASE WHEN x < 0 THEN 128 ELSE 0 END AS usign,
                 least(abs(x), 32635) + 132 AS ux,
                 CASE WHEN x >= 0 THEN 213 ELSE 85 END AS amask,
                 least(CASE WHEN x >= 0 THEN x // 8
                            ELSE (-x - 1) // 8 END, 4095) AS am
               FROM v),
        cd AS (SELECT doc_id, n, i,
                 255 - (usign + (length(bin(ux)) - 8) * 16 +
                   ((ux >> (length(bin(ux)) - 5)) & 15)) AS ucode,
                 xor(CASE WHEN am = 0 THEN 0
                          ELSE greatest(0, length(bin(am)) - 5) END * 16 +
                     (CASE WHEN am < 64 THEN (am >> 1) & 15
                           ELSE (am >> greatest(0, length(bin(am)) - 5))
                             & 15 END),
                   amask) AS acode
               FROM uq),
        dec AS (SELECT doc_id, n, i, ucode, acode,
                  CASE WHEN ((255 - ucode) & 128) != 0
                       THEN 132 - ((((255 - ucode) & 15) * 8 + 132)
                         << (((255 - ucode) >> 4) & 7))
                       ELSE ((((255 - ucode) & 15) * 8 + 132)
                         << (((255 - ucode) >> 4) & 7)) - 132
                  END AS udec,
                  CASE WHEN (xor(acode, 85) & 128) != 0 THEN 1 ELSE -1 END *
                  (CASE WHEN ((xor(acode, 85) >> 4) & 7) = 0
                        THEN (xor(acode, 85) & 15) * 16 + 8
                        WHEN ((xor(acode, 85) >> 4) & 7) = 1
                        THEN (xor(acode, 85) & 15) * 16 + 264
                        ELSE ((xor(acode, 85) & 15) * 16 + 264)
                          << (((xor(acode, 85) >> 4) & 7) - 1)
                   END) AS adec
                FROM cd)
        SELECT doc_id, CAST(max(n) AS INTEGER) AS n_samples,
             md5(string_agg(lpad(lower(to_hex(ucode)), 2, '0'), ''
               ORDER BY i)) AS ulaw_md5,
             CAST(SUM(udec) AS BIGINT) AS ulaw_dec_sum,
             md5(string_agg(lpad(lower(to_hex(acode)), 2, '0'), ''
               ORDER BY i)) AS alaw_md5,
             CAST(SUM(adec) AS BIGINT) AS alaw_dec_sum
        FROM dec GROUP BY doc_id"""

  /** q367's oracle: the bilinear blend replayed per crop pixel from
    * the block rule. fx is always ≥ 0 here (crop starts at column 4);
    * fy can be −96 at R=1's first row, so the floor division uses the
    * +256 shift to stay on nonnegative operands (DuckDB // truncates).
    * wx is identically 128 at this geometry; wy varies with R.
    */
  private def clipPreprocessOracle: String =
    s"""WITH ${jpegColorCtes()},
        dims AS (SELECT doc_id, length(bt) // 8 AS R FROM p),
        gy AS (SELECT doc_id, R, unnest(generate_series(4, 27)) AS ry
               FROM dims),
        g AS (SELECT doc_id, R, ry, unnest(generate_series(4, 27)) AS rx
              FROM gy),
        pos AS (SELECT doc_id, R, ry, rx,
                  (2 * ry + 1) * 32 * R - 128 AS fy,
                  (2 * rx + 1) * 256 - 128 AS fx
                FROM g),
        nb AS (SELECT doc_id, R, ry, rx,
                 ((fy + 256) // 256) - 1 AS y0, fy - (((fy + 256) // 256) - 1)
                   * 256 AS wy,
                 fx // 256 AS x0, fx - (fx // 256) * 256 AS wx
               FROM pos),
        cl AS (SELECT doc_id, ry, rx, wy, wx,
                 greatest(0, least(y0, 8 * R - 1)) AS y0c,
                 greatest(0, least(y0 + 1, 8 * R - 1)) AS y1c,
                 least(x0, 63) AS x0c, least(x0 + 1, 63) AS x1c
               FROM nb),
        px AS (SELECT c.doc_id, c.ry, c.rx,
                 ((256 - c.wx) * (256 - c.wy) * b00.rr
                  + c.wx * (256 - c.wy) * b10.rr
                  + (256 - c.wx) * c.wy * b01.rr
                  + c.wx * c.wy * b11.rr) // 65536 AS vr,
                 ((256 - c.wx) * (256 - c.wy) * b00.gg
                  + c.wx * (256 - c.wy) * b10.gg
                  + (256 - c.wx) * c.wy * b01.gg
                  + c.wx * c.wy * b11.gg) // 65536 AS vg,
                 ((256 - c.wx) * (256 - c.wy) * b00.bb
                  + c.wx * (256 - c.wy) * b10.bb
                  + (256 - c.wx) * c.wy * b01.bb
                  + c.wx * c.wy * b11.bb) // 65536 AS vb
               FROM cl c
               JOIN rgb b00 ON b00.doc_id = c.doc_id
                 AND b00.br = c.y0c // 8 AND b00.bc = c.x0c // 8
               JOIN rgb b10 ON b10.doc_id = c.doc_id
                 AND b10.br = c.y0c // 8 AND b10.bc = c.x1c // 8
               JOIN rgb b01 ON b01.doc_id = c.doc_id
                 AND b01.br = c.y1c // 8 AND b01.bc = c.x0c // 8
               JOIN rgb b11 ON b11.doc_id = c.doc_id
                 AND b11.br = c.y1c // 8 AND b11.bc = c.x1c // 8),
        hx2 AS (SELECT doc_id, ry, rx,
                  lpad(lower(to_hex(vr)), 2, '0') ||
                  lpad(lower(to_hex(vg)), 2, '0') ||
                  lpad(lower(to_hex(vb)), 2, '0') AS h3,
                  vr + vg + vb AS s3
                FROM px),
        img3 AS (SELECT doc_id,
                   string_agg(h3, '' ORDER BY ry, rx) AS hexpix,
                   SUM(s3) AS total
                 FROM hx2 GROUP BY doc_id)
        SELECT d.doc_id, 64 AS src_w, CAST(8 * d.R AS INTEGER) AS src_h,
             24 AS out_w, 24 AS out_h, md5(i.hexpix) AS rgb_md5,
             CAST(i.total AS BIGINT) AS rgb_sum
        FROM dims d JOIN img3 i ON i.doc_id = d.doc_id"""

  /** q370's oracle: the IMA quantizer recurrence as a recursive CTE —
    * state (pred, idx) advances one nibble per level, ≤ 64 levels, all
    * (doc, block) pairs in lockstep; the step table is 89 literal rows
    * and every operand stays a nonnegative-division integer. DuckDB's
    * lateral column aliases keep each stage readable.
    */
  private def adpcmOracle: String = {
    val stepVals = graft.operators.Audio.ImaAdpcm.StepTable.zipWithIndex
      .map { case (v, i) => s"($i,$v)" }.mkString(", ")
    s"""WITH RECURSIVE d AS (SELECT doc_id, length(text) AS n, text
             FROM documents WHERE length(text) > 0),
        ix AS (SELECT doc_id, n,
                 unnest(generate_series(0, n - 1)) AS i, text
               FROM d),
        smp AS (SELECT doc_id, CAST(i // 65 AS INTEGER) AS blk,
                  CAST(i % 65 AS INTEGER) AS j,
                  257 * ascii(substr(text, CAST(i + 1 AS INTEGER), 1))
                    - 16384 AS v
                FROM ix),
        stp(idx, st) AS (VALUES $stepVals),
        rec AS (
          SELECT doc_id, blk, 0 AS j, v AS pred, 0 AS idx,
               CAST(NULL AS INTEGER) AS nib
          FROM smp WHERE j = 0
          UNION ALL
          SELECT r.doc_id, r.blk, r.j + 1,
               CAST(greatest(-32768, least(32767,
                 r.pred + CASE WHEN sign8 = 8 THEN -dq ELSE dq END))
                 AS INTEGER) AS pred,
               CAST(greatest(0, least(88, r.idx +
                 CASE WHEN delta < 4 THEN -1 ELSE (delta - 3) * 2 END))
                 AS INTEGER) AS idx,
               CAST(sign8 + delta AS INTEGER) AS nib
          FROM (
            SELECT r0.*, s.v AS sv, t.st,
                 CASE WHEN s.v - r0.pred < 0 THEN 8 ELSE 0 END AS sign8,
                 abs(s.v - r0.pred) AS ad,
                 CASE WHEN abs(s.v - r0.pred) >= t.st THEN 1 ELSE 0 END
                   AS b4,
                 ad - b4 * t.st AS r1,
                 CASE WHEN ad - b4 * t.st >= t.st // 2 THEN 1 ELSE 0 END
                   AS b2,
                 r1 - b2 * (t.st // 2) AS r2,
                 CASE WHEN r1 - b2 * (t.st // 2) >= t.st // 4
                   THEN 1 ELSE 0 END AS b1,
                 4 * b4 + 2 * b2 + b1 AS delta,
                 t.st // 8 + b4 * t.st + b2 * (t.st // 2)
                   + b1 * (t.st // 4) AS dq
            FROM rec r0
            JOIN smp s ON s.doc_id = r0.doc_id AND s.blk = r0.blk
              AND s.j = r0.j + 1
            JOIN stp t ON t.idx = r0.idx
          ) r
        ),
        db AS (SELECT doc_id, blk, (j - 1) // 2 AS k,
                 SUM(CASE WHEN (j - 1) % 2 = 0 THEN nib
                     ELSE 16 * nib END) AS byte
               FROM rec WHERE j >= 1 GROUP BY 1, 2, 3),
        dhex AS (SELECT doc_id, blk,
                   string_agg(lpad(lower(to_hex(byte)), 2, '0'), ''
                     ORDER BY k) AS datahex
                 FROM db GROUP BY 1, 2),
        hdr AS (SELECT doc_id, blk,
                  (pred + 65536) % 65536 AS m
                FROM rec WHERE j = 0),
        blkhex AS (SELECT h.doc_id, h.blk,
                     lpad(lower(to_hex(h.m % 256)), 2, '0') ||
                     lpad(lower(to_hex(h.m // 256)), 2, '0') || '0000' ||
                     coalesce(x.datahex, '') AS bh
                   FROM hdr h LEFT JOIN dhex x
                     ON x.doc_id = h.doc_id AND x.blk = h.blk),
        agg AS (SELECT doc_id,
                  md5(string_agg(bh, '' ORDER BY blk)) AS adpcm_md5,
                  count(*) AS nb
                FROM blkhex GROUP BY doc_id),
        recon AS (SELECT doc_id, SUM(CAST(pred AS BIGINT)) AS s1,
                    SUM(CAST(pred AS BIGINT) * pred) AS s2, count(*) AS ns
                  FROM rec GROUP BY doc_id)
        SELECT a.doc_id, CAST(r.ns AS INTEGER) AS n_samples,
             CAST(a.nb AS INTEGER) AS n_blocks, a.adpcm_md5,
             CAST(r.s1 AS BIGINT) AS dec_sum, CAST(r.s2 AS BIGINT) AS dec_sumsq
        FROM agg a JOIN recon r ON r.doc_id = a.doc_id"""
  }

  /** q373's oracle: the UPRIGHT image's pHash chain (per-block 4:4:4
    * chroma rule — yv = b, cbv = 255−b, crv = (b+85)%256 — through the
    * JFIF equations, luma, 32×32 grid, integer DCT, median bits), with
    * the twin ids carrying the SAME blocks by the normalization
    * contract, then the all-pairs Hamming shortcut. A wrong upright
    * transform in the engine breaks the twin rows' hash equality.
    */
  /** The oriented-fixture CTE chain shared by q373 and q380: the
    * UPRIGHT image's per-block 4:4:4 chroma rule (yv = b, cbv = 255−b,
    * crv = (b+85)%256) through the JFIF equations (`rgbq`), luma,
    * 32×32 grid, integer DCT, median bits → `blocks0`
    * (doc_id, b0..b3), plus `p` (doc_id, bt) and `rgbq` for reuse.
    */
  private def orientedCtes: String = {
    def clamp(e: String) = s"LEAST(255, GREATEST(0, CAST(floor($e) AS INTEGER)))"
    val rExpr = clamp("yv + 1.402*(crv - 128) + 0.5")
    val gExpr = clamp("yv - 0.344136*(cbv - 128) - 0.714136*(crv - 128) + 0.5")
    val bExpr = clamp("yv + 1.772*(cbv - 128) + 0.5")
    val ctValues = (for { u <- 0 until 8; k <- 0 until 32 } yield
      s"($u,$k,${graft.operators.Multimodal.PHashCos(u)(k)})").mkString(", ")
    s"""p AS (SELECT doc_id,
             rpad(text, CAST(greatest(CAST(ceil(length(text) / 16.0)
               AS BIGINT), 1) * 16 AS INTEGER), '.') AS bt
           FROM documents),
        blk AS (SELECT doc_id, bt,
                  unnest(generate_series(0, length(bt) // 8 - 1)) AS br
                FROM p),
        cell AS (SELECT doc_id, bt, br,
                   unnest(generate_series(0, 7)) AS bc
                 FROM blk),
        ycc AS (SELECT doc_id, br, bc,
                  ascii(substr(bt, CAST(br * 8 + bc + 1 AS INTEGER), 1)) AS yv,
                  255 - ascii(substr(bt, CAST(br * 8 + bc + 1 AS INTEGER), 1))
                    AS cbv,
                  (ascii(substr(bt, CAST(br * 8 + bc + 1 AS INTEGER), 1))
                    + 85) % 256 AS crv
                FROM cell),
        rgbq AS (SELECT doc_id, br, bc,
                   $rExpr AS rr, $gExpr AS gg, $bExpr AS bb
                 FROM ycc),
        lum AS (SELECT doc_id, br, bc,
                  (77 * rr + 150 * gg + 29 * bb) // 256 AS lv
                FROM rgbq),
        hh AS (SELECT doc_id, CAST(8 * (max(br) + 1) AS BIGINT) AS h
               FROM lum GROUP BY doc_id),
        grid AS (SELECT doc_id, h,
                   unnest(generate_series(0, 31)) AS r
                 FROM hh),
        grid2 AS (SELECT doc_id, h, r,
                    unnest(generate_series(0, 31)) AS c
                  FROM grid),
        l32 AS (SELECT g.doc_id, g.r, g.c, lum.lv
                FROM grid2 g JOIN lum
                  ON lum.doc_id = g.doc_id
                 AND lum.br = ((g.r * g.h) // 32) // 8
                 AND lum.bc = g.c // 4),
        ct(u, k, cv) AS (VALUES $ctValues),
        m1 AS (SELECT l.doc_id, ct.u, l.c,
                 SUM(CAST(ct.cv AS BIGINT) * l.lv) AS m
               FROM l32 l JOIN ct ON ct.k = l.r
               GROUP BY 1, 2, 3),
        f AS (SELECT m1.doc_id, m1.u * 8 + ct.u AS kk,
                CAST(SUM(m1.m * ct.cv) AS BIGINT) AS fv
              FROM m1 JOIN ct ON ct.k = m1.c
              GROUP BY 1, 2),
        md AS (SELECT doc_id, fv AS med FROM (
                 SELECT doc_id, fv, row_number() OVER (
                   PARTITION BY doc_id ORDER BY fv ASC, kk ASC) AS rn
                 FROM f) WHERE rn = 32),
        bits AS (SELECT f.doc_id, f.kk,
                   CASE WHEN f.fv > md.med THEN 1 ELSE 0 END AS b
                 FROM f JOIN md USING (doc_id)),
        blocks0 AS (SELECT doc_id,
            CAST(SUM(CASE WHEN kk // 16 = 0 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b0,
            CAST(SUM(CASE WHEN kk // 16 = 1 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b1,
            CAST(SUM(CASE WHEN kk // 16 = 2 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b2,
            CAST(SUM(CASE WHEN kk // 16 = 3 THEN b << (kk % 16)
              ELSE 0 END) AS INTEGER) AS b3
          FROM bits GROUP BY doc_id)"""
  }

  /** q373's oracle: the UPRIGHT image's pHash chain, with the twin ids
    * carrying the SAME blocks by the normalization contract, then the
    * all-pairs Hamming shortcut. A wrong upright transform in the
    * engine breaks the twin rows' hash equality.
    */
  private def orientedPHashOracle: String =
    s"""WITH $orientedCtes,
        blocks AS (SELECT doc_id, b0, b1, b2, b3 FROM blocks0
                   UNION ALL
                   SELECT doc_id + 200000, b0, b1, b2, b3 FROM blocks0),
        pp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                   AS INTEGER) AS hamming
               FROM blocks a JOIN blocks b ON a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, hamming FROM pp WHERE hamming <= 2"""

  /** q380's oracle: exact-hash groups over the twin-extended corpus
    * (keeper = min doc_id = the upright original; n_copies counts the
    * collapse, 2 per group barring cross-doc 64-bit collisions), then
    * the bilinear 32×32 + 24×24-crop chain over the keeper's per-block
    * color rule — the q367 replay with `rgbq` swapped in.
    */
  private def multimodalPipelineOracle: String =
    s"""WITH $orientedCtes,
        corpus2 AS (SELECT doc_id, b0, b1, b2, b3 FROM blocks0
                    UNION ALL
                    SELECT doc_id + 200000, b0, b1, b2, b3 FROM blocks0),
        grp AS (SELECT min(doc_id) AS doc_id,
                  CAST(count(*) AS BIGINT) AS n_copies
                FROM corpus2 GROUP BY b0, b1, b2, b3),
        dims AS (SELECT doc_id, length(bt) // 8 AS R FROM p),
        gy AS (SELECT doc_id, R, unnest(generate_series(4, 27)) AS ry
               FROM dims),
        g AS (SELECT doc_id, R, ry, unnest(generate_series(4, 27)) AS rx
              FROM gy),
        pos AS (SELECT doc_id, R, ry, rx,
                  (2 * ry + 1) * 32 * R - 128 AS fy,
                  (2 * rx + 1) * 256 - 128 AS fx
                FROM g),
        nb AS (SELECT doc_id, R, ry, rx,
                 ((fy + 256) // 256) - 1 AS y0, fy - (((fy + 256) // 256) - 1)
                   * 256 AS wy,
                 fx // 256 AS x0, fx - (fx // 256) * 256 AS wx
               FROM pos),
        cl AS (SELECT doc_id, ry, rx, wy, wx,
                 greatest(0, least(y0, 8 * R - 1)) AS y0c,
                 greatest(0, least(y0 + 1, 8 * R - 1)) AS y1c,
                 least(x0, 63) AS x0c, least(x0 + 1, 63) AS x1c
               FROM nb),
        px AS (SELECT c.doc_id, c.ry, c.rx,
                 ((256 - c.wx) * (256 - c.wy) * b00.rr
                  + c.wx * (256 - c.wy) * b10.rr
                  + (256 - c.wx) * c.wy * b01.rr
                  + c.wx * c.wy * b11.rr) // 65536 AS vr,
                 ((256 - c.wx) * (256 - c.wy) * b00.gg
                  + c.wx * (256 - c.wy) * b10.gg
                  + (256 - c.wx) * c.wy * b01.gg
                  + c.wx * c.wy * b11.gg) // 65536 AS vg,
                 ((256 - c.wx) * (256 - c.wy) * b00.bb
                  + c.wx * (256 - c.wy) * b10.bb
                  + (256 - c.wx) * c.wy * b01.bb
                  + c.wx * c.wy * b11.bb) // 65536 AS vb
               FROM cl c
               JOIN rgbq b00 ON b00.doc_id = c.doc_id
                 AND b00.br = c.y0c // 8 AND b00.bc = c.x0c // 8
               JOIN rgbq b10 ON b10.doc_id = c.doc_id
                 AND b10.br = c.y0c // 8 AND b10.bc = c.x1c // 8
               JOIN rgbq b01 ON b01.doc_id = c.doc_id
                 AND b01.br = c.y1c // 8 AND b01.bc = c.x0c // 8
               JOIN rgbq b11 ON b11.doc_id = c.doc_id
                 AND b11.br = c.y1c // 8 AND b11.bc = c.x1c // 8),
        hx2 AS (SELECT doc_id, ry, rx,
                  lpad(lower(to_hex(vr)), 2, '0') ||
                  lpad(lower(to_hex(vg)), 2, '0') ||
                  lpad(lower(to_hex(vb)), 2, '0') AS h3,
                  vr + vg + vb AS s3
                FROM px),
        img3 AS (SELECT doc_id,
                   string_agg(h3, '' ORDER BY ry, rx) AS hexpix,
                   SUM(s3) AS total
                 FROM hx2 GROUP BY doc_id)
        SELECT gr.doc_id, gr.n_copies, 24 AS out_w, 24 AS out_h,
             md5(i.hexpix) AS rgb_md5, CAST(i.total AS BIGINT) AS rgb_sum
        FROM grp gr JOIN img3 i ON i.doc_id = gr.doc_id"""


  val oracles: Map[String, String] = Map(
    "q370_adpcm" -> adpcmOracle,
    "q373_oriented_phash" -> orientedPHashOracle,
    "q380_multimodal_pipeline" -> multimodalPipelineOracle,
    // q379: the tag/bitrate/frame-count rule regenerated; the bitrate
    // table is interpolated from the SAME Scala array the engine uses.
    "q379_mp3_meta" -> {
      val br = graft.operators.Audio.Id3.BitrateKbps.zipWithIndex
        .filter(_._2 >= 1).map { case (v, i) => s"($i,$v)" }.mkString(", ")
      s"""WITH br(idx, kbps) AS (VALUES $br),
          sr(idx, rate) AS (VALUES (0,44100), (1,48000), (2,32000)),
          d AS (SELECT doc_id,
                  CAST(1 + doc_id % 14 AS INTEGER) AS bidx,
                  CAST(doc_id % 3 AS INTEGER) AS sidx,
                  CAST(1 + doc_id % 5 AS INTEGER) AS nf
                FROM documents)
          SELECT d.doc_id,
               'Title ' || CAST(d.doc_id AS VARCHAR) AS title,
               'Artist ' || CAST(d.doc_id % 10 AS VARCHAR) AS artist,
               'Album ' || CAST(d.doc_id % 5 AS VARCHAR) AS album,
               CAST(d.doc_id % 20 + 1 AS INTEGER) AS track,
               CAST(br.kbps AS INTEGER) AS bitrate_kbps,
               CAST(sr.rate AS INTEGER) AS sample_rate,
               d.nf AS n_frames,
               CAST(d.nf * 1152 AS BIGINT) AS total_samples
          FROM d JOIN br ON br.idx = d.bidx JOIN sr ON sr.idx = d.sidx"""
    },

    // q378: L/R from the character rule, floor((l+r)/2.0) = the
    // engine's floorDiv on negative sums, exact integer aggregates.
    "q378_stereo_downmix" ->
      """WITH s AS (SELECT doc_id, length(text) AS n, text FROM documents
           WHERE length(text) > 0),
         ix AS (SELECT doc_id, n, unnest(generate_series(1, n)) AS i, text
                FROM s),
         v AS (SELECT doc_id, n,
                 257 * ascii(substr(text, CAST(i AS INTEGER), 1)) - 16384
                   AS l,
                 257 * ascii(substr(text, CAST(least(i + 1, n) AS INTEGER),
                   1)) - 16384 AS r
               FROM ix),
         m AS (SELECT doc_id, n,
                 CAST(floor((l + r) / 2.0) AS BIGINT) AS mv
               FROM v)
         SELECT doc_id, CAST(max(n) AS INTEGER) AS n_samples,
              CAST(SUM(mv) AS BIGINT) AS mix_sum,
              CAST(SUM(mv * mv) AS BIGINT) AS mix_sumsq,
              CAST(max(abs(mv)) AS INTEGER) AS mix_peak
         FROM m GROUP BY doc_id""",

    // q376: the cue rule regenerated arithmetically — render+parse must
    // land exactly on it.
    "q376_srt_roundtrip" ->
      """WITH c AS (SELECT doc_id,
             unnest(generate_series(0, CAST(doc_id % 4 AS INTEGER))) AS i
           FROM documents)
         SELECT doc_id, CAST(i AS INTEGER) AS cue_idx,
              CAST(10000 * i + (doc_id % 7) * 10 AS BIGINT) AS start_ms,
              CAST(10000 * i + (doc_id % 7) * 10 + 900 + (i % 3) * 50
                AS BIGINT) AS end_ms,
              'cue ' || CAST(doc_id AS VARCHAR) || ' ' ||
                CAST(i AS VARCHAR) AS caption
         FROM c""",

    // q377: frame spans from the delay rule (cumulative 100·(f+1) ms),
    // per-frame digest from the q362 chain, cue rule regenerated, and
    // the interval-overlap join replayed.
    "q377_frame_captions" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
             FROM documents),
          fr AS (SELECT doc_id, pix,
                   unnest(generate_series(0, CAST(doc_id % 4 AS INTEGER)))
                     AS f
                 FROM p),
          ix AS (SELECT doc_id, pix, f,
                   unnest(generate_series(1, length(pix))) AS i
                 FROM fr),
          bv AS (SELECT doc_id, f, i,
                   (ascii(substr(pix, CAST(i AS INTEGER), 1)) + 17 * f) % 256
                     AS v
                 FROM ix),
          hx2 AS (SELECT doc_id, f, i,
                   lpad(lower(to_hex(v)), 2, '0') ||
                   lpad(lower(to_hex(255 - v)), 2, '0') ||
                   lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3
                 FROM bv),
          fd AS (SELECT doc_id, f,
                   md5(string_agg(h3, '' ORDER BY i)) AS rgb_md5,
                   CAST(100 * f * (f + 1) // 2 AS BIGINT) AS f_start_ms,
                   CAST(100 * f * (f + 1) // 2 + 100 * (f + 1) AS BIGINT)
                     AS f_end_ms
                 FROM hx2 GROUP BY doc_id, f),
          cu AS (SELECT doc_id,
                   unnest(generate_series(0, CAST(doc_id % 4 AS INTEGER)))
                     AS ci
                 FROM documents),
          cues AS (SELECT doc_id, ci,
                     CAST(150 * ci AS BIGINT) AS start_ms,
                     CAST(150 * ci + 250 AS BIGINT) AS end_ms,
                     'cap ' || CAST(doc_id AS VARCHAR) || ' ' ||
                       CAST(ci AS VARCHAR) AS caption
                   FROM cu)
          SELECT f.doc_id, CAST(f.f AS INTEGER) AS frame_idx,
               CAST(c.ci AS INTEGER) AS cue_idx,
               f.f_start_ms, f.f_end_ms, c.caption, f.rgb_md5
          FROM fd f JOIN cues c ON c.doc_id = f.doc_id
           AND f.f_start_ms < c.end_ms AND c.start_ms < f.f_end_ms""",

    // q374: frame energies from the planted-silence fixture, active
    // gate at the threshold, maximal runs via gaps-and-islands
    // (grp = frame − row_number over active frames).
    "q374_vad_segments" ->
      """WITH s AS (SELECT doc_id,
             substr(text, 1, 100) || repeat('@', 128) || substr(text, 101)
               || repeat('@', 64) || 'FINAL LOUD TAIL OF THE CLIP 999' AS t
           FROM documents WHERE length(text) > 0),
         ix AS (SELECT doc_id, unnest(generate_series(1, length(t))) AS i, t
                FROM s),
         v AS (SELECT doc_id, CAST((i - 1) // 64 AS INTEGER) AS f,
                 257 * ascii(substr(t, CAST(i AS INTEGER), 1)) - 16384 AS smp
               FROM ix),
         fe AS (SELECT doc_id, f,
                  SUM(CAST(smp AS BIGINT) * smp) AS e,
                  max(abs(smp)) AS pk
                FROM v GROUP BY 1, 2),
         act AS (SELECT doc_id, f, e, pk,
                   f - row_number() OVER (PARTITION BY doc_id ORDER BY f)
                     AS grp
                 FROM fe WHERE e >= 2000000000),
         seg AS (SELECT doc_id, grp, min(f) AS start_frame,
                   count(*) AS n_frames, SUM(e) AS energy_sum,
                   max(pk) AS peak
                 FROM act GROUP BY 1, 2)
         SELECT doc_id,
              CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY start_frame) - 1 AS INTEGER) AS seg_idx,
              CAST(start_frame AS INTEGER) AS start_frame,
              CAST(n_frames AS INTEGER) AS n_frames,
              CAST(energy_sum AS BIGINT) AS energy_sum,
              CAST(peak AS INTEGER) AS peak
         FROM seg""",
    // q372: the q339 decode chain + the arithmetic caption — pairing
    // through the tar shards must land exactly on this.
    "q372_webdataset" ->
      s"""WITH ${jpegColorCtes()}
          SELECT doc_id, 'cap ' || CAST(doc_id AS VARCHAR) AS caption,
               64 AS width,
               CAST(length(hexpix) / (6 * 64) AS INTEGER) AS height,
               md5(hexpix) AS rgb_md5,
               CAST(blocksum * 64 AS BIGINT) AS rgb_sum
          FROM img""",
    // q371: the color-rule replay with BMP framing — the stored stream
    // is bottom-up BGR, but the DECODED output is row-major RGB, so the
    // oracle is the same per-byte chain as the sibling containers.
    "q371_bmp_decode" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
             FROM documents),
          ix AS (SELECT doc_id, pix,
                   unnest(generate_series(1, length(pix))) AS i
                 FROM p),
          bv AS (SELECT doc_id, i,
                   ascii(substr(pix, CAST(i AS INTEGER), 1)) AS v
                 FROM ix),
          hx AS (SELECT doc_id, i,
                   lpad(lower(to_hex(v)), 2, '0') ||
                   lpad(lower(to_hex(255 - v)), 2, '0') ||
                   lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3,
                   v + (255 - v) + (v + 85) % 256 AS s3
                 FROM bv),
          img AS (SELECT doc_id, string_agg(h3, '' ORDER BY i) AS hexpix,
                    SUM(s3) AS rgbsum, count(*) AS n
                  FROM hx GROUP BY doc_id)
          SELECT doc_id, 'image/bmp' AS format, 64 AS width,
               CAST(n // 64 AS INTEGER) AS height,
               CAST(n AS INTEGER) AS n_pixels, md5(hexpix) AS rgb_md5,
               CAST(rgbsum AS BIGINT) AS rgb_sum
          FROM img""",
    // q368: the q350 color-rule replay with TIFF framing — the decoded
    // RGB is storage-independent, so hash equality across the three
    // compression variants proves all three codecs at once.
    "q368_tiff_decode" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
             FROM documents),
          ix AS (SELECT doc_id, pix,
                   unnest(generate_series(1, length(pix))) AS i
                 FROM p),
          bv AS (SELECT doc_id, i,
                   ascii(substr(pix, CAST(i AS INTEGER), 1)) AS v
                 FROM ix),
          hx AS (SELECT doc_id, i,
                   lpad(lower(to_hex(v)), 2, '0') ||
                   lpad(lower(to_hex(255 - v)), 2, '0') ||
                   lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3,
                   v + (255 - v) + (v + 85) % 256 AS s3
                 FROM bv),
          img AS (SELECT doc_id, string_agg(h3, '' ORDER BY i) AS hexpix,
                    SUM(s3) AS rgbsum, count(*) AS n
                  FROM hx GROUP BY doc_id)
          SELECT doc_id, 'image/tiff' AS format, 64 AS width,
               CAST(n // 64 AS INTEGER) AS height, 3 AS channels,
               CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 32773
                    ELSE 5 END AS INTEGER) AS compression,
               CAST(n AS INTEGER) AS n_pixels, md5(hexpix) AS rgb_md5,
               CAST(rgbsum AS BIGINT) AS rgb_sum
          FROM img""",
    "q367_clip_preprocess" -> clipPreprocessOracle,
    "q364_audio_cepstra" -> audioCepstraOracle,
    "q365_g711_compand" -> g711Oracle,
    // q381: the streaming transcode must land exactly the batch rows —
    // the oracle IS q365's.
    "q381_g711_stream" -> g711Oracle,
    "q211_image_patches" -> patchOracle,
    "q350_png_color" -> pngColorOracle(),
    // q359: interlaced storage decodes to the SAME RGB — the oracle is
    // q350's replay with the fixed truecolor/opaque columns; hash
    // equality proves the Adam7 deinterlace exact.
    "q359_png_interlaced" -> pngColorOracle("2", "3", "255"),
    // q361: palette storage means decoded RGB = colorOf(text byte) —
    // the q350 replay with GIF framing columns; interlace changes only
    // the STORED row order, so hash equality proves the scatter exact.
    "q361_gif_decode" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
             FROM documents),
          ix AS (SELECT doc_id, pix,
                   unnest(generate_series(1, length(pix))) AS i
                 FROM p),
          bv AS (SELECT doc_id, i,
                   ascii(substr(pix, CAST(i AS INTEGER), 1)) AS v
                 FROM ix),
          hx AS (SELECT doc_id, i,
                   lpad(lower(to_hex(v)), 2, '0') ||
                   lpad(lower(to_hex(255 - v)), 2, '0') ||
                   lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3,
                   v + (255 - v) + (v + 85) % 256 AS s3
                 FROM bv),
          img AS (SELECT doc_id, string_agg(h3, '' ORDER BY i) AS hexpix,
                    SUM(s3) AS rgbsum, count(*) AS n
                  FROM hx GROUP BY doc_id)
          SELECT doc_id, 'image/gif' AS format, 64 AS width,
               CAST(n // 64 AS INTEGER) AS height, 1 AS n_frames,
               CAST(doc_id % 2 AS INTEGER) AS interlaced,
               CAST(n AS INTEGER) AS n_pixels, md5(hexpix) AS rgb_md5,
               CAST(rgbsum AS BIGINT) AS rgb_sum
          FROM img""",

    // q362: frame f's index byte is (text byte + 17f) mod 256; the
    // stride-2 keep and the 10(f+1) cs delays are replayed per frame.
    "q362_gif_frames" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
             FROM documents),
          fr AS (SELECT doc_id, pix,
                   unnest(generate_series(0, CAST(doc_id % 4 AS INTEGER))) AS f
                 FROM p),
          keep AS (SELECT * FROM fr WHERE f % 2 = 0),
          ix AS (SELECT doc_id, pix, f,
                   unnest(generate_series(1, length(pix))) AS i
                 FROM keep),
          bv AS (SELECT doc_id, f, i,
                   (ascii(substr(pix, CAST(i AS INTEGER), 1)) + 17 * f) % 256
                     AS v
                 FROM ix),
          hx AS (SELECT doc_id, f, i,
                   lpad(lower(to_hex(v)), 2, '0') ||
                   lpad(lower(to_hex(255 - v)), 2, '0') ||
                   lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3,
                   v + (255 - v) + (v + 85) % 256 AS s3
                 FROM bv)
          SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
               CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
               CAST(10 * (f + 1) AS INTEGER) AS delay_cs,
               md5(string_agg(h3, '' ORDER BY i)) AS rgb_md5,
               CAST(SUM(s3) AS BIGINT) AS rgb_sum
          FROM hx GROUP BY doc_id, f""",

    // q363: tag arithmetic + the orientation block permutation over the
    // q339 color chain. Blocks are 8×8-uniform, so each of the 8
    // canonical transforms is a pure BLOCK-GRID remap (nr,nc)→(sbr,sbc);
    // the source grid is R block-rows × 8 block-cols.
    "q363_exif_orient" ->
      s"""WITH ${jpegColorCtes()},
          hx6 AS (SELECT doc_id, br, bc,
                    lpad(lower(to_hex(rr)), 2, '0') ||
                    lpad(lower(to_hex(gg)), 2, '0') ||
                    lpad(lower(to_hex(bb)), 2, '0') AS h6,
                    CAST(rr + gg + bb AS BIGINT) AS s3
                  FROM rgb),
          dims AS (SELECT doc_id, length(bt) // 8 AS R,
                     CAST(1 + doc_id % 8 AS INTEGER) AS o
                   FROM p),
          grid AS (SELECT doc_id, R, o,
                     unnest(generate_series(0,
                       CAST(CASE WHEN o < 5 THEN R - 1 ELSE 7 END
                         AS INTEGER))) AS nr
                   FROM dims),
          grid2 AS (SELECT doc_id, R, o, nr,
                      unnest(generate_series(0,
                        CAST(CASE WHEN o < 5 THEN 7 ELSE R - 1 END
                          AS INTEGER))) AS nc
                    FROM grid),
          map AS (SELECT doc_id, R, o, nr, nc,
                    CASE o WHEN 1 THEN nr WHEN 2 THEN nr
                           WHEN 3 THEN R - 1 - nr WHEN 4 THEN R - 1 - nr
                           WHEN 5 THEN nc WHEN 6 THEN R - 1 - nc
                           WHEN 7 THEN R - 1 - nc ELSE nc END AS sbr,
                    CASE o WHEN 1 THEN nc WHEN 2 THEN 7 - nc
                           WHEN 3 THEN 7 - nc WHEN 4 THEN nc
                           WHEN 5 THEN nr WHEN 6 THEN nr
                           WHEN 7 THEN 7 - nr ELSE 7 - nr END AS sbc
                  FROM grid2),
          rw2 AS (SELECT m.doc_id, m.nr,
                    string_agg(repeat(h.h6, 8), '' ORDER BY m.nc) AS rh,
                    SUM(h.s3) * 8 AS rsum
                  FROM map m JOIN hx6 h
                    ON h.doc_id = m.doc_id AND h.br = m.sbr AND h.bc = m.sbc
                  GROUP BY 1, 2),
          img2 AS (SELECT doc_id,
                     string_agg(repeat(rh, 8), '' ORDER BY nr) AS hexpix,
                     SUM(rsum) * 8 AS total
                   FROM rw2 GROUP BY doc_id)
          SELECT d.doc_id, d.o AS orientation,
               'Cam' || CAST(d.doc_id % 3 AS VARCHAR) AS make,
               'M-' || CAST(d.doc_id % 5 AS VARCHAR) AS model,
               '2026:08:' || lpad(CAST(1 + d.doc_id % 9 AS VARCHAR), 2, '0')
                 || ' 00:00:00' AS date_time,
               CAST(72 + (d.doc_id % 4) * 10 AS BIGINT) AS xres_num,
               CAST(64 AS BIGINT) AS pixel_x,
               CAST(8 * d.R AS BIGINT) AS pixel_y,
               CAST(CASE WHEN d.o < 5 THEN 64 ELSE 8 * d.R END AS INTEGER)
                 AS out_width,
               CAST(CASE WHEN d.o < 5 THEN 8 * d.R ELSE 64 END AS INTEGER)
                 AS out_height,
               md5(i.hexpix) AS rgb_md5,
               CAST(i.total AS BIGINT) AS rgb_sum
          FROM dims d JOIN img2 i ON i.doc_id = d.doc_id""",

    // q384: coordinates and flags by the parity rule; the scrubbed
    // payload's pixels must still land exactly on the q339 chain.
    "q384_gps_scrub" ->
      s"""WITH ${jpegColorCtes()}
          SELECT doc_id,
               CAST(CASE doc_id % 2 WHEN 0 THEN 1 ELSE 0 END AS INTEGER)
                 AS had_gps,
               CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 90000000
                    ELSE -1 END AS BIGINT) AS lat_udeg,
               CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 180000000
                    ELSE -1 END AS BIGINT) AS lon_udeg,
               0 AS gps_after,
               CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
               md5(hexpix) AS rgb_md5,
               CAST(blocksum * 64 AS BIGINT) AS rgb_sum
          FROM img""",

    // q383: the q350 color chain under a PER-PIXEL orientation
    // permutation — upright position (ux, uy) pulls the stored byte at
    // the inverse-mapped index, hex chain ordered by (uy, ux); the sum
    // is permutation-invariant.
    "q383_png_exif_orient" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix,
             CAST(1 + doc_id % 8 AS INTEGER) AS o
           FROM documents),
          d AS (SELECT doc_id, pix, o, length(pix) // 64 AS H FROM p),
          oy AS (SELECT doc_id, pix, o, H,
                   unnest(generate_series(0,
                     CAST(CASE WHEN o < 5 THEN H - 1 ELSE 63 END
                       AS INTEGER))) AS uy
                 FROM d),
          ox AS (SELECT doc_id, pix, o, H, uy,
                   unnest(generate_series(0,
                     CAST(CASE WHEN o < 5 THEN 63 ELSE H - 1 END
                       AS INTEGER))) AS ux
                 FROM oy),
          mp AS (SELECT doc_id, pix, o, H, uy, ux,
                   CASE o WHEN 1 THEN ux WHEN 2 THEN 63 - ux
                          WHEN 3 THEN 63 - ux WHEN 4 THEN ux
                          WHEN 5 THEN uy WHEN 6 THEN uy
                          WHEN 7 THEN 63 - uy ELSE 63 - uy END AS sx,
                   CASE o WHEN 1 THEN uy WHEN 2 THEN uy
                          WHEN 3 THEN H - 1 - uy WHEN 4 THEN H - 1 - uy
                          WHEN 5 THEN ux WHEN 6 THEN H - 1 - ux
                          WHEN 7 THEN H - 1 - ux ELSE ux END AS sy
                 FROM ox),
          hx3 AS (SELECT doc_id, uy, ux,
                    ascii(substr(pix, CAST(sy * 64 + sx + 1 AS INTEGER), 1))
                      AS v
                  FROM mp),
          img4 AS (SELECT doc_id,
                     string_agg(
                       lpad(lower(to_hex(v)), 2, '0') ||
                       lpad(lower(to_hex(255 - v)), 2, '0') ||
                       lpad(lower(to_hex((v + 85) % 256)), 2, '0'),
                       '' ORDER BY uy, ux) AS hexpix,
                     SUM(v + (255 - v) + (v + 85) % 256) AS rgbsum
                   FROM hx3 GROUP BY doc_id)
          SELECT d.doc_id, d.o AS orientation,
               CAST(CASE WHEN d.o < 5 THEN 64 ELSE d.H END AS INTEGER)
                 AS out_width,
               CAST(CASE WHEN d.o < 5 THEN d.H ELSE 64 END AS INTEGER)
                 AS out_height,
               md5(i.hexpix) AS rgb_md5, CAST(i.rgbsum AS BIGINT) AS rgb_sum
          FROM d JOIN img4 i ON i.doc_id = d.doc_id""",

    "q351_phash_neardup" -> pHashOracle,
    "q360_phash_stream" -> pHashStreamOracle,
    "q356_audio_resample" -> audioResampleOracle,
    "q357_audio_mel" -> audioMelOracle,
    "q326_jpeg_decode" -> jpegOracle,
    "q339_jpeg_color" -> jpegColorOracle,
    // q345: the progressive scan script reconstructs the SAME quantized
    // coefficients as the baseline stream, so the RGB oracle is q339's
    // verbatim — hash equality IS the progressive-correctness proof.
    "q345_jpeg_progressive" -> jpegColorOracle,
    "q346_image_text_pairs" -> imageTextPairsOracle,
    // q348: refs (both URL families) → decode digest → per-digest rank
    // → rollup, replayed end to end.
    "q348_pair_dedup" ->
      s"""WITH ${jpegColorCtes()},
          meta AS (SELECT doc_id, md5(hexpix) AS rgb_md5 FROM img),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
          refs AS (
            SELECT d.doc_id AS page_id,
                   (d.doc_id * 31 + j.j * 7) % nn.n AS img_id,
                   'i' AS fam,
                   'pic ' || CAST(d.doc_id AS VARCHAR) || ' ' ||
                     CAST(j.j AS VARCHAR) AS alt
            FROM documents d, nn, (VALUES (1), (2), (3)) AS j(j)
            WHERE j.j <= 1 + d.doc_id % 3
            UNION ALL
            SELECT doc_id, doc_id % 89, 'm', '' FROM documents),
          pairs AS (SELECT r.page_id,
                      'http://img.example/' || r.fam ||
                        CAST(r.img_id AS VARCHAR) || '.jpg' AS img_url,
                      r.alt, m.rgb_md5
                    FROM refs r JOIN meta m ON m.doc_id = r.img_id),
          rk AS (SELECT *, row_number() OVER (
                   PARTITION BY rgb_md5
                   ORDER BY length(alt) DESC, alt ASC, page_id ASC,
                            img_url ASC) AS rn
                 FROM pairs)
          SELECT rgb_md5, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT img_url) AS BIGINT) AS n_urls,
               max(CASE WHEN rn = 1 THEN page_id END) AS keeper_page,
               max(CASE WHEN rn = 1 THEN alt END) AS keeper_alt
          FROM rk GROUP BY 1""",

    // q212: the sample rule replayed, frames by integer division of the
    // 0-based sample index, exact integer energy/peak per frame.
    "q212_audio_frames" ->
      """WITH s AS (SELECT doc_id, unnest(generate_series(1, length(text))) AS i,
               text
             FROM documents WHERE length(text) > 0),
         v AS (SELECT doc_id,
                 CAST((i - 1) // 64 AS INTEGER) AS frame_idx,
                 ascii(substr(text, CAST(i AS INTEGER), 1)) * 257 - 16384
                   AS smp
               FROM s)
         SELECT doc_id, frame_idx,
              CAST(count(*) AS INTEGER) AS n_samples,
              CAST(sum(CAST(smp AS BIGINT) * smp) AS BIGINT) AS energy,
              CAST(max(abs(smp)) AS INTEGER) AS peak
         FROM v GROUP BY 1, 2""",
    "q60_media_meta" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix FROM documents)
         SELECT doc_id,
              'image/png' AS format,
              64 AS width,
              CAST(length(pix) / 64 AS INTEGER) AS height,
              8 AS bit_depth,
              0 AS color_type,
              CAST(length(pix) AS INTEGER) AS n_pixels,
              md5(pix) AS pixel_md5
         FROM p""",
    "q78_jsonl_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5,
              CAST(n_chars AS INTEGER) AS n_chars
         FROM documents""",
    "q137_orc_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, n_chars, lang
         FROM documents WHERE n_chars > 100""",
    "q145_csv_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, lang, n_chars
         FROM documents""",
    // q159: good rows survive intact; every planted-bad row lands in
    // quarantine with NULL fields — none silently vanish.
    "q159_corrupt_jsonl" ->
      """SELECT doc_id, md5(text) AS text_md5, n_chars,
              false AS quarantined
         FROM documents WHERE doc_id % 10 != 0
         UNION ALL
         SELECT CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
              CAST(NULL AS BIGINT), true
         FROM documents WHERE doc_id % 10 = 0""",
    // q337: dimension-ordered left fold with double accumulation — the
    // engine's aggregate() order exactly.
    "q337_npy_roundtrip" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
              round(list_reduce(list_transform(embedding,
                x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 6) + 0.0
                AS vec_sum
         FROM embeddings""",
    // q385: same fold as q337 — the safetensors container must be
    // value-transparent.
    "q385_safetensors_roundtrip" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
              round(list_reduce(list_transform(embedding,
                x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 6) + 0.0
                AS vec_sum
         FROM embeddings""",
    // q397: 6-word lines joined by newlines; fenced blocks counted but
    // excluded — markdown decorations must be text-transparent.
    "q397_markdown_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 6.0) AS BIGINT) AS nl FROM w)
         SELECT doc_id,
              CAST(nl AS INTEGER) AS n_lines,
              CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
                AS n_code_blocks,
              md5(array_to_string(list_transform(range(1, nl + 1),
                i -> array_to_string(ws[(i-1)*6+1 : least(i*6, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM l""",

    // q412: the rot-and-reflect loop as a recursive CTE — 8 levels of
    // (rx, ry, flip, swap) per point, terminal rows at s = 0.
    "q412_hilbert_value" ->
      """WITH RECURSIVE pts AS (
              SELECT doc_id, CAST(doc_id % 256 AS BIGINT) AS x,
                     CAST((doc_id * 7) % 256 AS BIGINT) AS y
                FROM documents),
            h AS (
              SELECT doc_id, x, y, CAST(0 AS BIGINT) AS d,
                     CAST(128 AS BIGINT) AS s
                FROM pts
              UNION ALL
              SELECT doc_id,
                   CASE WHEN (y & s) = 0 THEN
                     CASE WHEN (x & s) > 0 THEN s - 1 - y ELSE y END
                   ELSE x END,
                   CASE WHEN (y & s) = 0 THEN
                     CASE WHEN (x & s) > 0 THEN s - 1 - x ELSE x END
                   ELSE y END,
                   d + s * s * xor(
                     CASE WHEN (x & s) > 0 THEN 3 ELSE 0 END,
                     CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END),
                   s // 2
                FROM h WHERE s >= 1)
         SELECT p.doc_id, p.x, p.y, h.d AS h_val
           FROM pts p JOIN h ON h.doc_id = p.doc_id AND h.s = 0""",

    // q410: the stratum table IS the expected output — SPDX beats the
    // planted contradicting phrase, each family maps to its id.
    "q410_license_scan" ->
      """SELECT doc_id,
              CASE CAST(doc_id % 6 AS INTEGER)
                WHEN 0 THEN 'GPL-2.0-only'
                WHEN 1 THEN 'MIT'
                WHEN 2 THEN 'Apache-2.0'
                WHEN 3 THEN 'GPL-3.0-only'
                WHEN 4 THEN 'BSD-3-Clause'
                ELSE NULL END AS license,
              CAST(doc_id % 6 AS INTEGER) IN (1, 2, 4) AS permissive
         FROM documents""",

    // q411: the 7-word line layout + appended minified line, then the
    // same integer metric arithmetic — thresholds replayed, not
    // hard-coded verdicts.
    "q411_source_signals" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 7.0) AS BIGINT) AS nl FROM w),
            t AS (SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN
                       list_append(list_transform(range(1, nl + 1),
                         i -> array_to_string(
                           ws[(i-1)*7+1 : least(i*7, len(ws))], ' ')),
                         repeat('z', 1200))
                     ELSE
                       list_transform(range(1, nl + 1),
                         i -> array_to_string(
                           ws[(i-1)*7+1 : least(i*7, len(ws))], ' '))
                     END AS ls
                  FROM l),
            m AS (SELECT doc_id, ls,
                     CAST(len(ls) AS BIGINT) AS n,
                     CAST(list_max(list_transform(ls, x -> length(x)))
                       AS BIGINT) AS mx,
                     CAST(list_sum(list_transform(ls, x -> length(x)))
                       AS BIGINT) AS total,
                     array_to_string(ls, chr(10)) AS whole
                  FROM t),
            v AS (SELECT doc_id, n, mx,
                     total * 1000 // n AS avg_milli,
                     CASE WHEN length(whole) > 0 THEN
                       CAST(length(regexp_replace(whole,
                         '[^A-Za-z]', '', 'g')) AS BIGINT)
                         * 1000000 // length(whole)
                     ELSE 0 END AS alpha_ppm
                  FROM m)
         SELECT doc_id,
              CAST(n AS INTEGER) AS n_lines,
              CAST(mx AS INTEGER) AS max_line_len,
              avg_milli AS avg_line_milli,
              alpha_ppm,
              (mx <= 1000 AND avg_milli <= 100000
                AND alpha_ppm >= 250000) AS kept
         FROM v""",

    // q409: envelope fields from id arithmetic; the quoted-printable
    // and base64 paths must both be byte-transparent on the text.
    "q409_mime_extract" ->
      """SELECT doc_id,
              'doc ' || doc_id AS subject,
              'writer-' || (doc_id % 7) || '@example.com' AS "from",
              2 AS n_parts,
              md5(text) AS plain_md5,
              md5('<p>' || text || '</p>') AS html_md5
         FROM documents""",

    // q408: pages/granules from the 16-word grouping, tags from id
    // arithmetic — the page walk and both Vorbis headers must be
    // metadata-transparent.
    "q408_ogg_metadata" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id,
                     greatest(1, CAST(ceil(len(ws) / 16.0) AS BIGINT))
                       AS ap FROM w)
         SELECT doc_id,
              CAST(doc_id AS INTEGER) AS serial,
              CAST(1 + doc_id % 2 AS INTEGER) AS channels,
              CAST(8000 * (1 + doc_id % 5) AS INTEGER) AS sample_rate,
              'graft-0.1' AS vendor,
              4 AS n_comments,
              md5('TITLE=doc ' || doc_id || chr(10) ||
                  'ARTIST=writer ' || (doc_id % 7) || chr(10) ||
                  'LANGUAGE=' ||
                  CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'eng'
                    WHEN 1 THEN 'und' WHEN 2 THEN 'fra'
                    ELSE 'deu' END || chr(10) ||
                  'PAD=' || repeat('x', 300)) AS comments_md5,
              CAST(ap * 1024 AS BIGINT) AS last_granule,
              CAST(2 + ap AS INTEGER) AS n_pages
         FROM l""",

    // q405: the wire container must be value-transparent.
    "q405_avro_wire" ->
      """SELECT doc_id, md5(text) AS text_md5,
              CAST(length(text) AS INTEGER) AS n_chars
         FROM documents""",

    // q404: the footer fields are exactly the relational aggregates of
    // the bucketed write — one file and one row group per bucket at
    // this scale, stats = true min/max.
    "q404_parquet_footer" ->
      """SELECT CAST(doc_id % 4 AS INTEGER) AS bucket,
              1 AS n_files,
              count(*) AS num_rows,
              1 AS n_row_groups,
              min(doc_id) AS min_doc,
              max(doc_id) AS max_doc
         FROM documents GROUP BY 1""",

    // q403: every container field regenerated from the id/word-count
    // arithmetic — frames = words, duration = frames*delta at the id's
    // timescale, sizes from the shared per-sample rule.
    "q403_mp4_metadata" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS nf,
                     24 + doc_id % 7 AS delta,
                     600 + (doc_id % 3) * 300 AS ts FROM w)
         SELECT doc_id,
              'isom' AS brand,
              CAST(ts AS INTEGER) AS timescale,
              CAST(nf AS INTEGER) AS n_frames,
              CAST(nf * delta * 1000 // ts AS BIGINT) AS duration_ms,
              CAST(160 + (doc_id % 5) * 32 AS INTEGER) AS width,
              CAST(120 + (doc_id % 4) * 24 AS INTEGER) AS height,
              CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'eng'
                   WHEN 1 THEN 'und' WHEN 2 THEN 'fra'
                   ELSE 'deu' END AS lang,
              CAST(coalesce(list_sum(list_transform(range(0, nf),
                i -> 64 + (i * 7) % 128)), 0) AS BIGINT) AS sample_bytes
         FROM l""",

    // q402: same fold as q337/q385 — the TFRecord container must be
    // value-transparent.
    "q402_tfrecord_roundtrip" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
              round(list_reduce(list_transform(embedding,
                x -> CAST(x AS DOUBLE)), (a, b) -> a + b), 6) + 0.0
                AS vec_sum
         FROM embeddings""",

    // q401: 6-word messages, roles alternating user/assistant from
    // user, a system turn on the id rule — each channel is its
    // messages joined by newlines, so the template serialization and
    // the declarative parse must both be content-transparent.
    "q401_chat_template" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 6.0) AS BIGINT) AS nm FROM w),
            t AS (SELECT doc_id, nm,
                     list_transform(range(1, nm + 1),
                       i -> array_to_string(
                         ws[(i-1)*6+1 : least(i*6, len(ws))], ' ')) AS ms
                  FROM l)
         SELECT doc_id,
              CAST(nm + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END
                AS INTEGER) AS n_msgs,
              CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INTEGER)
                AS n_system,
              md5(coalesce(array_to_string(list_transform(
                list_filter(range(1, nm + 1), i -> (i-1) % 2 = 0),
                i -> ms[i]), chr(10)), '')) AS user_md5,
              md5(coalesce(array_to_string(list_transform(
                list_filter(range(1, nm + 1), i -> (i-1) % 2 = 1),
                i -> ms[i]), chr(10)), '')) AS asst_md5
         FROM t""",

    // q400: 10-word paragraphs joined by newlines; the math channel is
    // regenerated from the word-stride rule (j%9==4 → x_{j}+1) plus
    // the id-rule display equation — decorations, attachments, and the
    // whole TeX escape grammar must be text-transparent.
    "q400_latex_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws, len(ws) AS nw,
                     CAST(ceil(len(ws) / 10.0) AS BIGINT) AS nl FROM w),
            m AS (SELECT doc_id, ws, nw, nl,
                     CASE WHEN doc_id % 3 = 0 THEN
                       list_append(list_transform(
                         list_filter(range(1, nw + 1), i -> (i-1) % 9 = 4),
                         i -> 'x_{' || (i-1) || '}+1'), 'E = m c^2')
                     ELSE
                       list_transform(
                         list_filter(range(1, nw + 1), i -> (i-1) % 9 = 4),
                         i -> 'x_{' || (i-1) || '}+1')
                     END AS maths
                  FROM l)
         SELECT doc_id,
              CAST(nl AS INTEGER) AS n_lines,
              CAST(len(maths) AS INTEGER) AS n_math,
              CAST(CASE WHEN nw > 6 THEN (nw - 7) // 10 + 1
                   ELSE 0 END AS INTEGER) AS n_footnotes,
              md5(array_to_string(list_transform(range(1, nl + 1),
                i -> array_to_string(ws[(i-1)*10+1 : least(i*10, nw)],
                  ' ')), chr(10))) AS text_md5,
              md5(coalesce(array_to_string(maths, chr(10)), ''))
                AS math_md5
         FROM m""",

    // q399: 8-word lines joined by newlines; the ref count replays the
    // word-stride rule (global index j%10==6), tables the id rule —
    // every decoration and structure must be text-transparent.
    "q399_wikitext_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 8.0) AS BIGINT) AS nl FROM w)
         SELECT doc_id,
              CAST(nl AS INTEGER) AS n_lines,
              CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER)
                AS n_tables,
              CAST(CASE WHEN len(ws) > 6 THEN (len(ws) - 7) // 10 + 1
                   ELSE 0 END AS INTEGER) AS n_refs,
              md5(array_to_string(list_transform(range(1, nl + 1),
                i -> array_to_string(ws[(i-1)*8+1 : least(i*8, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM l""",

    // q398: 5-word lines, cells of 2, alternating markdown/code from
    // markdown — each channel is its lines joined by newlines, so the
    // notebook JSON (writer) and the from_json walk (reader) are both
    // text-transparent under the two channel hashes.
    "q398_notebook_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 5.0) AS BIGINT) AS nl FROM w),
            t AS (SELECT doc_id, nl,
                     list_transform(range(1, nl + 1),
                       i -> array_to_string(
                         ws[(i-1)*5+1 : least(i*5, len(ws))], ' ')) AS ls
                  FROM l)
         SELECT doc_id,
              4 AS nbformat,
              CAST(ceil(nl / 2.0) AS INTEGER) AS n_cells,
              CAST(floor(ceil(nl / 2.0) / 2) AS INTEGER) AS n_code_cells,
              md5(coalesce(array_to_string(list_transform(
                list_filter(range(1, nl + 1), i -> ((i-1) // 2) % 2 = 0),
                i -> ls[i]), chr(10)), '')) AS md_md5,
              md5(coalesce(array_to_string(list_transform(
                list_filter(range(1, nl + 1), i -> ((i-1) // 2) % 2 = 1),
                i -> ls[i]), chr(10)), '')) AS code_md5
         FROM t""",

    // q396: 7-word paragraphs joined by newlines — the RTF escape and
    // group machinery must be text-transparent.
    "q396_rtf_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 7.0) AS BIGINT) AS np FROM w)
         SELECT doc_id,
              CAST(np AS INTEGER) AS n_paragraphs,
              md5(array_to_string(list_transform(range(1, np + 1),
                i -> array_to_string(ws[(i-1)*7+1 : least(i*7, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM l""",

    // q395: 5-word lines, chapters of 2 — chapter joins are also line
    // joins, so the hash is over all lines joined by newlines.
    "q395_epub_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 5.0) AS BIGINT) AS nl FROM w)
         SELECT doc_id,
              CAST(ceil(nl / 2.0) AS INTEGER) AS n_chapters,
              md5(array_to_string(list_transform(range(1, nl + 1),
                i -> array_to_string(ws[(i-1)*5+1 : least(i*5, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM l""",

    // q394: per-format layout reconstruction over the CLEAN text (the
    // repair must exactly undo the planted corruption), token counts
    // preserved through both containers.
    "q394_document_ingest" ->
      """WITH c AS (SELECT doc_id, text,
              CASE WHEN doc_id % 3 = 0
                   THEN replace(text, 'data',
                        'd' || chr(228) || 't' || chr(228))
                   ELSE text END AS clean
            FROM documents),
          w AS (SELECT doc_id, text, string_split(clean, ' ') AS ws,
                   CASE WHEN doc_id % 2 = 0 THEN 6 ELSE 9 END AS k
               FROM c),
          t AS (SELECT doc_id, text, ws, k,
                   CAST(ceil(len(ws) * 1.0 / k) AS BIGINT) AS ng
               FROM w)
         SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'docx' END
                AS format,
              CAST(CASE WHEN doc_id % 2 = 0 THEN ceil(ng / 4.0)
                   ELSE ng END AS INTEGER) AS n_units,
              CASE WHEN doc_id % 3 = 0 AND contains(text, 'data')
                   THEN 1 ELSE 0 END AS was_repaired,
              CAST(len(ws) AS INTEGER) AS n_tokens,
              md5(array_to_string(list_transform(range(1, ng + 1),
                i -> array_to_string(ws[(i-1)*k+1 : least(i*k, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM t""",

    // q393: 9-word paragraphs joined by newlines — the OPC container
    // and the run/space/entity machinery must be text-transparent.
    "q393_docx_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 9.0) AS BIGINT) AS np FROM w)
         SELECT doc_id,
              CAST(np AS INTEGER) AS n_paragraphs,
              md5(array_to_string(list_transform(range(1, np + 1),
                i -> array_to_string(ws[(i-1)*9+1 : least(i*9, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM l""",

    // q391: the q350 color chain with the alpha rule on every row —
    // the WebP container must be pixel-transparent.
    "q391_webp_roundtrip" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
           FROM documents),
          ix AS (SELECT doc_id, pix,
                   unnest(generate_series(1, length(pix))) AS i
               FROM p),
          bv AS (SELECT doc_id, i,
                   ascii(substr(pix, CAST(i AS INTEGER), 1)) AS v
               FROM ix),
          hx AS (SELECT doc_id, i,
                   lpad(lower(to_hex(v)), 2, '0') ||
                   lpad(lower(to_hex(255 - v)), 2, '0') ||
                   lpad(lower(to_hex((v + 85) % 256)), 2, '0') AS h3,
                   v + (255 - v) + (v + 85) % 256 AS s3,
                   255 - (v % 32) AS av
               FROM bv),
          img AS (SELECT doc_id, string_agg(h3, '' ORDER BY i) AS hexpix,
                   SUM(s3) AS rgbsum, SUM(av) AS asum, count(*) AS n
                FROM hx GROUP BY doc_id)
         SELECT doc_id, 'image/webp' AS format, 64 AS width,
              CAST(n // 64 AS INTEGER) AS height,
              CAST(n AS INTEGER) AS n_pixels, md5(hexpix) AS rgb_md5,
              CAST(rgbsum AS BIGINT) AS rgb_sum,
              CAST(asum AS BIGINT) AS alpha_sum
         FROM img""",

    // q390: the q129 sample rule + the planted constant tail; frames
    // of 256 ⇒ n_frames = ceil(n/256). All aggregates exact integers.
    "q390_flac_roundtrip" ->
      """WITH v AS (
           SELECT doc_id,
                ascii(substr(text, CAST(i AS INTEGER), 1)) * 257 - 16384
                  AS smp
           FROM (SELECT doc_id, text,
                    unnest(generate_series(1, length(text))) AS i
               FROM documents WHERE length(text) > 0)
           UNION ALL
           SELECT doc_id,
                CAST((doc_id % 120) * 257 - 16384 AS INTEGER) AS smp
           FROM documents CROSS JOIN range(300)
           WHERE doc_id % 5 = 0),
          a AS (SELECT doc_id, count(*) AS n,
                 sum(CAST(smp AS BIGINT)) AS ssum,
                 sum(CAST(smp AS BIGINT) * smp) AS ssq,
                 max(abs(smp)) AS pk
              FROM v GROUP BY doc_id)
         SELECT doc_id, CAST(n AS INTEGER) AS n_samples,
              CAST(ceil(n / 256.0) AS INTEGER) AS n_frames,
              CAST(ssum AS BIGINT) AS sample_sum,
              CAST(ssq AS BIGINT) AS sum_sq,
              CAST(pk AS INTEGER) AS peak
         FROM a""",

    // q389: corpus (3 families) → pHash block chain over img_text →
    // all-pairs Hamming ≤ 3; caption LSH funnel (shared sigCtesFor) →
    // Jaccard ≥ 0.5; union → recursive-CTE reachability → min-label
    // clusters. Both candidate generators AND the cross-modal closure
    // replay from scratch.
    "q389_joint_dedup" -> {
      s"""WITH RECURSIVE corpus AS (
            SELECT doc_id, text AS img_text,
                 array_to_string((string_split(text, ' '))[1:8], ' ')
                   AS caption
            FROM documents
            UNION ALL
            SELECT doc_id + 100000,
                 substr(text, 1, 99) || 'Z' || substr(text, 101),
                 'img copy ' || (doc_id + 100000)
            FROM documents WHERE doc_id % 2 = 0
            UNION ALL
            SELECT doc_id + 200000, reverse(text),
                 array_to_string((string_split(text, ' '))[1:8], ' ')
                   || ' extra'
            FROM documents WHERE doc_id % 3 = 0),
          icorpus AS (SELECT doc_id, img_text AS text FROM corpus),
          ${pHashBlockCtesOver("icorpus")},
          imgpairs AS (
            SELECT a.doc_id AS da, b.doc_id AS db
            FROM blocks a JOIN blocks b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                  bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                  <= 3),
          capcorpus AS (SELECT doc_id, caption AS text FROM corpus),
          ${LlmText.sigCtesFor("capcorpus", "cap")},
          capcand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM capbands a JOIN capbands b
                 ON a.band = b.band AND a.bkey = b.bkey
                AND a.doc_id < b.doc_id),
          capj AS (SELECT da, db,
                 len(list_filter(sa.shs, x -> list_contains(sb.shs, x)))
                   * 1.0 AS inter,
                 len(sa.shs) + len(sb.shs) AS tot
               FROM capcand JOIN caps2 sa ON da = sa.doc_id
                 JOIN caps2 sb ON db = sb.doc_id),
          cappairs AS (SELECT da, db FROM capj
                 WHERE round(inter / (tot - inter), 4) >= 0.5),
          allp AS (SELECT da, db FROM imgpairs
                 UNION SELECT da, db FROM cappairs),
          edges AS (SELECT da AS u, db AS v FROM allp
                 UNION SELECT db, da FROM allp),
          nodes AS (SELECT DISTINCT u FROM edges),
          reach(u, v) AS (SELECT u, u FROM nodes
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
          cl AS (SELECT u AS doc_id, min(v) AS cluster_id
               FROM reach GROUP BY u)
         SELECT c.doc_id,
              coalesce(cl.cluster_id, c.doc_id) AS cluster_id,
              CASE WHEN coalesce(cl.cluster_id, c.doc_id) = c.doc_id
                   THEN 1 ELSE 0 END AS is_keeper
         FROM corpus c LEFT JOIN cl ON c.doc_id = cl.doc_id"""
    },

    // q386: the 6-words-per-line / 4-lines-per-page layout replayed
    // arithmetically; text = all lines joined with \n (page breaks are
    // also line breaks), so the hash pins the extraction end to end.
    "q386_pdf_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id, ws,
                     CAST(ceil(len(ws) / 6.0) AS BIGINT) AS nlines FROM w)
         SELECT doc_id,
              CAST(ceil(nlines / 4.0) AS INTEGER) AS n_pages,
              md5(array_to_string(list_transform(range(1, nlines + 1),
                i -> array_to_string(ws[(i-1)*6+1 : least(i*6, len(ws))],
                  ' ')), chr(10))) AS text_md5
         FROM l""",
    "q148_schema_evolution" ->
      """SELECT doc_id, md5(text) AS text_md5,
              CASE WHEN doc_id % 2 = 1 THEN n_chars END AS quality
         FROM documents""",
    // q224: documents hashed through the Avro container, the embedding
    // array's first-dimension mean broadcast onto every row (float
    // arrays under the hash without array-typed result columns).
    "q224_avro_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5, lang, n_chars,
              (SELECT round(avg(CAST(embedding[1] AS DOUBLE)), 6) + 0.0
               FROM embeddings) AS avg_dim0
         FROM documents""",
    "q65_frame_sample" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
           FROM documents WHERE length(text) > 0),
         f AS (SELECT doc_id, pix,
                  unnest(generate_series(0, CAST(ceil(length(pix) / 256.0) AS BIGINT) - 1)) AS fi
           FROM p)
         SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
                CAST(length(substr(pix, CAST(fi * 256 + 1 AS INTEGER), 256)) AS INTEGER) AS n_bytes,
                md5(substr(pix, CAST(fi * 256 + 1 AS INTEGER), 256)) AS frame_md5
         FROM f WHERE fi % 3 = 0""",
    // Audio oracle: replay the sample rule per character (ASCII fixture
    // ⇒ bytes == chars), aggregate with exact integer arithmetic, and
    // count sign changes with a lag window. i is 1-based here; the
    // engine decimates 0-based indices 0,4,8,... ⇒ i % 4 = 1.
    "q129_audio_features" ->
      """WITH s AS (SELECT doc_id, unnest(generate_series(1, length(text))) AS i, text
           FROM documents WHERE length(text) > 0),
         v AS (SELECT doc_id, i,
                  ascii(substr(text, CAST(i AS INTEGER), 1)) * 257 - 16384 AS smp
           FROM s),
         a AS (SELECT doc_id,
                  count(*) AS n,
                  sum(CAST(smp AS BIGINT) * smp) AS sum_sq,
                  max(abs(smp)) AS peak,
                  sum(CASE WHEN i % 4 = 1 THEN CAST(smp AS BIGINT) ELSE 0 END) AS dec_sum,
                  count(CASE WHEN i % 4 = 1 THEN 1 END) AS dec_n
           FROM v GROUP BY doc_id),
         z AS (SELECT doc_id, count(*) AS zc FROM (
                  SELECT doc_id, smp,
                         lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                  FROM v)
               WHERE prev IS NOT NULL AND smp * prev < 0
               GROUP BY doc_id)
         SELECT a.doc_id,
              CAST(16000 AS INTEGER) AS sample_rate,
              CAST(a.n AS INTEGER) AS n_samples,
              a.n / 16.0 AS duration_ms,
              CAST(a.sum_sq AS BIGINT) AS sum_sq,
              round(sqrt(CAST(a.sum_sq AS DOUBLE) / a.n), 4) AS rms,
              CAST(coalesce(z.zc, 0) AS INTEGER) AS zero_crossings,
              CAST(a.peak AS INTEGER) AS peak,
              CAST(a.dec_n AS INTEGER) AS dec_n,
              CAST(a.dec_sum AS BIGINT) AS dec_sum
         FROM a LEFT JOIN z USING (doc_id)""",
    // Resize oracle: replay the ÷2 nearest-neighbor sampling over the
    // padded-text pixel rule (ASCII fixture ⇒ byte == char). Sampled
    // rows r = 0,2,…,h-1 and cols c = 0,2,…,62 reassemble in row-major
    // order; md5 of that string equals md5 of the decoded pixel bytes,
    // and the pixel sum is exact integer arithmetic on both engines.
    "q143_image_resize" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix FROM documents),
         rr AS (SELECT doc_id, pix,
                  unnest(generate_series(0, CAST(length(pix)/64 AS BIGINT) - 1, 2)) AS r
           FROM p),
         cc AS (SELECT doc_id, pix, r, unnest(generate_series(0, 62, 2)) AS c
           FROM rr),
         s AS (SELECT doc_id,
                  string_agg(substr(pix, CAST(r*64 + c + 1 AS INTEGER), 1),
                             '' ORDER BY r, c) AS rs,
                  sum(ascii(substr(pix, CAST(r*64 + c + 1 AS INTEGER), 1))) AS psum
           FROM cc GROUP BY doc_id)
         SELECT doc_id,
              32 AS out_width,
              CAST(length(rs)/32 AS INTEGER) AS out_height,
              CAST(length(rs) AS INTEGER) AS out_n_pixels,
              md5(rs) AS out_md5,
              CAST(psum AS BIGINT) AS out_sum
         FROM s""",

    "q185_image_neardup" -> aHashOracle,

    // q189: frame f = pixel string rotated left by f; sampled frames 0
    // and 2 of 3. md5 over the rotated ASCII string equals md5 over
    // the decoded pixel bytes (ASCII fixture).
    "q189_video_frames" ->
      s"""WITH p AS (SELECT doc_id, rpad(text, $plenSql, '.') AS pix
                     FROM documents),
          f AS (SELECT doc_id, pix, unnest([0, 2]) AS fi FROM p)
          SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
                 64 AS width,
                 CAST(length(pix) / 64 AS INTEGER) AS height,
                 md5(substr(pix, fi + 1) || substr(pix, 1, fi)) AS frame_md5
          FROM f""",

    // BYTE-true oracle THROUGH the codec: the engine sums decoded
    // pixels (raw UTF-8 bytes + 0x2e padding), so the oracle
    // reconstructs each character's UTF-8 byte sum from its code point
    // (1/2/3/4-byte encodings) plus 46 per pad byte — with the planted
    // multi-byte tail this fails loudly if either side silently mixes
    // chars and bytes anywhere in the encode→decode pipeline.
    "q61_media_features" ->
      """WITH t AS (SELECT doc_id, text || ' é☃€' || (doc_id % 10) AS text FROM documents),
         m AS (SELECT doc_id,
                  octet_length(encode(text)) AS nb,
                  greatest(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT), 1) * 64 AS np,
                  list_sum(list_transform(split(text, ''), c ->
                    CASE WHEN unicode(c) < 128 THEN unicode(c)
                         WHEN unicode(c) < 2048 THEN 320 + unicode(c) // 64 + unicode(c) % 64
                         WHEN unicode(c) < 65536 THEN 480 + unicode(c) // 4096 + (unicode(c) // 64) % 64 + unicode(c) % 64
                         ELSE 624 + unicode(c) // 262144 + (unicode(c) // 4096) % 64 + (unicode(c) // 64) % 64 + unicode(c) % 64 END)) AS bytesum
           FROM t)
         SELECT doc_id,
              CAST(np AS INTEGER) AS n_pixels,
              round(CAST(bytesum + 46 * (np - nb) AS DOUBLE) / np, 4) AS mean_pixel,
              CAST(ceil(np / 256.0) AS INTEGER) AS n_frames
         FROM m"""
  )
}
