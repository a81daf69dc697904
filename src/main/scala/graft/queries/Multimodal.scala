package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries (north-star surface): media as opaque
  * `binary` payloads + typed metadata struct, with the decode step
  * STUBBED deterministically (no image/audio libs in this container —
  * the Spark-side plumbing: schema, binary encoding, per-partition
  * batch decode, feature schema — is real and oracle-tested).
  *
  * The fake payload is the utf-8 encoding of the document text, so the
  * DuckDB oracle can independently verify every derived value.
  */
object Multimodal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + metadata struct construction, verified on byte
    // length and payload digest.
    "q60_media_meta" -> { (s, d) =>
      graft.operators.Multimodal.asMedia(Tables.documents(s, d))
        .select(col("doc_id"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
    },

    // Stubbed decode + feature extraction over the binary column in
    // per-partition batches (mapPartitions — the Scala analog of
    // mapInPandas batch processing). Features recomputable from text.
    // Both engines PLANT a non-ASCII tail (2- and 3-byte UTF-8 chars):
    // the engine sums RAW UTF-8 BYTES, and the oracle reconstructs the
    // same byte sum from code points — byte semantics under multi-byte
    // input is verified, not an ASCII-only assumption.
    "q61_media_features" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          concat(col("text"), lit(" é☃€"),
            (col("doc_id") % 10).cast("string")).as("text"))
      val media = graft.operators.Multimodal.asMedia(docs)
      graft.operators.Multimodal.extractFeatures(media)
        .select(col("doc_id"),
          col("n_bytes"),
          round(col("mean_byte"), 4).as("mean_byte"),
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

    // Frame sampling: every 3rd 256-byte "frame" of the payload, with a
    // per-frame digest the oracle recomputes from the text (payload =
    // utf-8 of ASCII text, so byte slices == character slices).
    "q65_frame_sample" -> { (s, d) =>
      val media = graft.operators.Multimodal.asMedia(
        Tables.documents(s, d).filter(length(col("text")) > 0))
      graft.operators.Multimodal.sampleFrames(media, every = 3)
        .select("doc_id", "frame_idx", "n_bytes", "frame_md5")
    }
  )

  val oracles: Map[String, String] = Map(
    "q60_media_meta" ->
      """SELECT doc_id,
              'fake/rgb8' AS format,
              CAST(n_chars % 64 + 1 AS INTEGER) AS width,
              CAST(n_chars % 48 + 1 AS INTEGER) AS height,
              CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
              md5(text) AS payload_md5
         FROM documents""",
    "q78_jsonl_roundtrip" ->
      """SELECT doc_id, md5(text) AS text_md5,
              CAST(n_chars AS INTEGER) AS n_chars
         FROM documents""",
    "q65_frame_sample" ->
      """WITH f AS (SELECT doc_id, text,
                  unnest(generate_series(0, CAST(ceil(length(text) / 256.0) AS BIGINT) - 1)) AS fi
           FROM documents WHERE length(text) > 0)
         SELECT doc_id, CAST(fi AS INTEGER) AS frame_idx,
                CAST(length(substr(text, CAST(fi * 256 + 1 AS INTEGER), 256)) AS INTEGER) AS n_bytes,
                md5(substr(text, CAST(fi * 256 + 1 AS INTEGER), 256)) AS frame_md5
         FROM f WHERE fi % 3 = 0""",
    // BYTE-true oracle: the engine sums raw UTF-8 bytes, so the oracle
    // reconstructs each character's UTF-8 byte sum from its code point
    // (1/2/3/4-byte encodings) — with the planted multi-byte tail this
    // fails loudly if either side silently mixes chars and bytes.
    "q61_media_features" ->
      """WITH t AS (SELECT doc_id, text || ' é☃€' || (doc_id % 10) AS text FROM documents)
         SELECT doc_id,
              CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
              round(CAST(list_sum(list_transform(split(text, ''), c ->
                  CASE WHEN unicode(c) < 128 THEN unicode(c)
                       WHEN unicode(c) < 2048 THEN 320 + unicode(c) // 64 + unicode(c) % 64
                       WHEN unicode(c) < 65536 THEN 480 + unicode(c) // 4096 + (unicode(c) // 64) % 64 + unicode(c) % 64
                       ELSE 624 + unicode(c) // 262144 + (unicode(c) // 4096) % 64 + (unicode(c) // 64) % 64 + unicode(c) % 64 END)) AS DOUBLE)
                    / greatest(octet_length(encode(text)), 1), 4) AS mean_byte,
              CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER) AS n_frames
         FROM t"""
  )
}
