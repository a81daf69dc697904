package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** Audio modality support: WAV payloads as opaque `binary` columns,
  * decoded by a REAL pure-JVM RIFF/PCM parser — the audio counterpart
  * of [[Multimodal.Png]]. Same doctrine as the image path: binary
  * payloads are built and decoded on executors in per-partition
  * batches, never touch the driver, and every value the queries emit
  * comes OUT OF THE DECODER, so the DuckDB oracle (which recomputes
  * the expected samples arithmetically from the shared fixture rule)
  * has both the encoder and the decoder under hash test.
  *
  * Reference scope: the reference engine has no audio surface; this is
  * part of the LLM-training-data extension (multimodal columns), where
  * audio arrives as WAV/FLAC blobs and the pipeline needs duration /
  * loudness / silence statistics for curation. The WAV container
  * (RIFF chunks, fmt + data) is the real format; features below (RMS
  * energy via an exact integer sum of squares, zero-crossing count,
  * peak amplitude) are the standard curation signals.
  */
object Audio {

  /** Minimal-but-real WAV codec: PCM 16-bit little-endian, mono. The
    * DECODER walks the RIFF chunk list (tolerating ancillary chunks
    * like LIST/INFO, honoring the spec's even-byte chunk padding),
    * validates the declared sizes, and requires the fmt contract it
    * supports — anything malformed fails loudly rather than yielding
    * garbage samples.
    */
  object Wav {
    final case class Pcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
                         samples: Array[Short])

    /** Encode mono PCM16 samples as a canonical WAV byte stream:
      * RIFF header, 16-byte fmt chunk, data chunk (LE int16).
      */
    def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16)               // PCM fmt chunk size
      bb.putShort(1)              // audio format: PCM
      bb.putShort(1)              // channels: mono
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * 2)   // byte rate = rate * channels * 2
      bb.putShort(2)              // block align
      bb.putShort(16)             // bits per sample
      bb.put("data".getBytes("US-ASCII"))
      bb.putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    /** Decode a WAV byte stream: validates RIFF/WAVE magic, walks the
      * chunk list (skipping ancillary chunks, honoring the even-byte
      * pad after odd-sized chunks), reads the fmt contract, and
      * materializes the PCM16 samples. Throws on truncation, missing
      * fmt/data, or an unsupported format.
      */
    def decode(wav: Array[Byte]): Pcm = {
      require(wav.length >= 12, "truncated WAV header")
      val bb = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
      val riff = new Array[Byte](4); bb.get(riff)
      require(new String(riff, "US-ASCII") == "RIFF", "not a RIFF stream")
      val declared = bb.getInt
      require(declared >= 4 && declared <= wav.length - 8,
        s"RIFF size $declared inconsistent with ${wav.length} bytes")
      val wave = new Array[Byte](4); bb.get(wave)
      require(new String(wave, "US-ASCII") == "WAVE", "not a WAVE form")
      var sampleRate, channels, bits = -1
      var haveFmt = false
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && samples == null) {
        val tagB = new Array[Byte](4); bb.get(tagB)
        val tag = new String(tagB, "US-ASCII")
        val len = bb.getInt
        require(len >= 0 && bb.remaining() >= len, s"truncated '$tag' chunk")
        tag match {
          case "fmt " =>
            require(len >= 16, s"fmt chunk too short ($len)")
            val fmtStart = bb.position()
            val audioFormat = bb.getShort & 0xffff
            channels = bb.getShort & 0xffff
            sampleRate = bb.getInt
            bb.getInt            // byte rate
            bb.getShort          // block align
            bits = bb.getShort & 0xffff
            require(audioFormat == 1 && channels == 1 && bits == 16,
              s"unsupported WAV format: fmt=$audioFormat ch=$channels bits=$bits" +
                " (this decoder handles PCM16 mono)")
            bb.position(fmtStart + len + (len & 1)) // skip extension + pad
            haveFmt = true
          case "data" =>
            require(haveFmt, "WAV data chunk before fmt")
            require(len % 2 == 0, s"odd PCM16 data length $len")
            val out = new Array[Short](len / 2)
            var i = 0
            while (i < out.length) { out(i) = bb.getShort; i += 1 }
            samples = out
          case _ => // ancillary chunk (LIST, fact, ...): skip + pad byte
            bb.position(bb.position() + len + (len & 1))
        }
      }
      require(samples != null, "WAV missing data chunk")
      Pcm(sampleRate, channels, bits, samples)
    }
  }

  /** Deterministic sample rule shared with the DuckDB oracle: sample i
    * is `byte_i * 257 - 16384` where byte_i is the i-th UTF-8 byte of
    * the text (ASCII fixture ⇒ bytes == characters for the oracle).
    * The affine map puts space (32) well below zero and letters (>=
    * 64) above it, so word boundaries produce sign changes — the
    * zero-crossing count is a real signal, and 257·b can never hit
    * exactly 16384, so sign(0) ambiguity cannot arise.
    */
  private[graft] val SampleRate = 16000
  private[graft] def samplesOf(text: String): Array[Short] = {
    val tb = text.getBytes("UTF-8")
    val s = new Array[Short](tb.length)
    var i = 0
    while (i < tb.length) { s(i) = ((tb(i) & 0xff) * 257 - 16384).toShort; i += 1 }
    s
  }

  final case class AudioMedia(doc_id: Long, payload: Array[Byte],
                              format: String, sample_rate: Int, n_samples: Int)

  /** Attach a REAL audio payload: each document's text renders to a
    * valid mono PCM16 WAV via [[samplesOf]]. One narrow mapPartitions
    * pass; payloads are built and stay on the executors.
    */
  def asAudio(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val s = samplesOf(text)
          AudioMedia(id, Wav.encodePcm16(SampleRate, s), "audio/wav",
            SampleRate, s.length)
        }
      }
      .select(col("doc_id"), col("payload"),
        struct(col("format"), col("sample_rate"), col("n_samples")).as("meta"))
  }

  final case class AudioRecord(doc_id: Long, payload: Array[Byte])
  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
                                 n_samples: Int, duration_ms: Double,
                                 sum_sq: Long, rms: Double,
                                 zero_crossings: Int, peak: Int,
                                 dec_n: Int, dec_sum: Long)

  /** REAL decode pass + curation features, one narrow mapPartitions
    * (the batch-UDF shape — codec state amortizes per partition, no
    * shuffle). Every output is derived from DECODED samples:
    *
    *   - `sum_sq` / `peak` / `dec_sum` are EXACT integer aggregates, so
    *     the cross-engine compare has no float-ordering hazard;
    *   - `rms` = sqrt(sum_sq / n) — both engines take the same exact
    *     integer into one sqrt, so the double is bit-identical;
    *   - `duration_ms` = n / 16.0 at 16 kHz (exact in binary);
    *   - `zero_crossings` counts sign changes between adjacent samples;
    *   - `dec_*` comes from a decimate-by-`every` RE-ENCODE → RE-DECODE
    *     round trip, putting the encoder under test a second time on
    *     lengths the text rule never produces.
    */
  def extractFeatures(media: DataFrame, every: Int = 4): Dataset[AudioFeatures] = {
    require(every > 0, s"bad decimation factor $every")
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        records.map { r =>
          val pcm = Wav.decode(r.payload)
          val s = pcm.samples
          var sumSq = 0L
          var zc = 0
          var peak = 0
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            sumSq += v.toLong * v
            val a = math.abs(v)
            if (a > peak) peak = a
            if (i > 0 && (v ^ s(i - 1).toInt) < 0) zc += 1
            i += 1
          }
          // decimate, re-encode, re-decode: the second codec round trip
          val dec = Array.tabulate[Short]((s.length + every - 1) / every)(j => s(j * every))
          val dec2 = Wav.decode(Wav.encodePcm16(pcm.sampleRate, dec)).samples
          var decSum = 0L
          var j = 0
          while (j < dec2.length) { decSum += dec2(j); j += 1 }
          AudioFeatures(
            doc_id = r.doc_id,
            sample_rate = pcm.sampleRate,
            n_samples = s.length,
            duration_ms = s.length * 1000.0 / pcm.sampleRate,
            sum_sq = sumSq,
            rms = if (s.length == 0) 0.0 else math.sqrt(sumSq.toDouble / s.length),
            zero_crossings = zc,
            peak = peak,
            dec_n = dec2.length,
            dec_sum = decSum)
        }
      }
  }

  final case class AudioFrame(doc_id: Long, frame_idx: Int, n_samples: Int,
                              energy: Long, peak: Int)

  /** Frame-level energy analysis over the DECODED stream: the PCM cut
    * into non-overlapping `frameLen`-sample windows (the trailing
    * partial frame kept with its true length), each emitting exact
    * integer energy Σs² and peak |s| — the voice-activity-detection /
    * segmentation primitive every audio curation pipeline runs before
    * anything model-shaped. One narrow mapPartitions pass; output fans
    * out ceil(n/frameLen) skinny rows per clip.
    */
  def frameEnergies(media: DataFrame, frameLen: Int): Dataset[AudioFrame] = {
    require(frameLen > 0, s"bad frame length $frameLen")
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        records.flatMap { r =>
          val s = Wav.decode(r.payload).samples
          val nFrames = (s.length + frameLen - 1) / frameLen
          (0 until nFrames).iterator.map { fi =>
            val start = fi * frameLen
            val end = math.min(start + frameLen, s.length)
            var e = 0L
            var peak = 0
            var i = start
            while (i < end) {
              val v = s(i).toInt
              e += v.toLong * v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            AudioFrame(r.doc_id, fi, end - start, e, peak)
          }
        }
      }
  }
}
