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
    def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] =
      encodePcm16N(sampleRate, 1, samples)

    /** Encode interleaved PCM16 at 1 or 2 channels (stereo frames are
      * L,R pairs per the RIFF spec).
      */
    def encodePcm16N(sampleRate: Int, channels: Int,
                     interleaved: Array[Short]): Array[Byte] = {
      require(sampleRate > 0, s"bad sample rate $sampleRate")
      require(channels == 1 || channels == 2, s"channels $channels")
      require(interleaved.length % channels == 0,
        s"${interleaved.length} samples not a multiple of $channels channels")
      val dataLen = interleaved.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16)                          // PCM fmt chunk size
      bb.putShort(1)                         // audio format: PCM
      bb.putShort(channels.toShort)
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2)   // byte rate
      bb.putShort((channels * 2).toShort)    // block align
      bb.putShort(16)                        // bits per sample
      bb.put("data".getBytes("US-ASCII"))
      bb.putInt(dataLen)
      var i = 0
      while (i < interleaved.length) { bb.putShort(interleaved(i)); i += 1 }
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
            require(audioFormat == 1 && (channels == 1 || channels == 2) &&
              bits == 16,
              s"unsupported WAV format: fmt=$audioFormat ch=$channels bits=$bits" +
                " (this decoder handles PCM16 mono/stereo)")
            bb.position(fmtStart + len + (len & 1)) // skip extension + pad
            haveFmt = true
          case "data" =>
            require(haveFmt, "WAV data chunk before fmt")
            require(len % (2 * channels) == 0,
              s"PCM16 data length $len not a whole number of" +
                s" $channels-channel frames")
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

    /** Decode and REQUIRE mono — the guard every single-stream
      * operator uses, so a stereo payload reaching a mono analysis
      * fails loudly instead of silently treating interleaved L/R as
      * one stream (stereo decode itself is supported; route stereo
      * through [[Audio.downmixStereo]] first).
      */
    def decodeMono(wav: Array[Byte]): Pcm = {
      val pcm = decode(wav)
      require(pcm.channels == 1,
        s"expected mono PCM, got ${pcm.channels} channels" +
          " (downmix stereo first)")
      pcm
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
    Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
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
          val pcm = Wav.decodeMono(r.payload)
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

  /** Rational L/M resampling core — linear interpolation with EXACT
    * integer phase arithmetic (the published polyphase contract at
    * its simplest kernel): output sample n sits at input position
    * n·M/L, i.e. between input samples k = ⌊nM/L⌋ and k+1 with phase
    * p = nM mod L, and takes value ⌊(s[k]·(L−p) + s[k+1]·p) / L⌋
    * (floor division — Math.floorDiv here, floor() in the oracle, so
    * negative samples round identically; the last sample holds for
    * the k+1 = len edge). No float enters until nothing is left to
    * compute, so both engines derive identical int16 streams.
    * Output length: ⌊(len−1)·L/M⌋ + 1 (positions through the last
    * input sample).
    */
  private[graft] def resampleSamples(s: Array[Short], l: Int,
                                     m: Int): Array[Short] = {
    if (s.isEmpty) return Array.emptyShortArray
    val nOut = ((s.length - 1).toLong * l / m).toInt + 1
    val out = new Array[Short](nOut)
    var n = 0
    while (n < nOut) {
      val t = n.toLong * m
      val k = (t / l).toInt
      val p = (t % l).toInt
      val sk = s(k).toInt
      val sk1 = s(math.min(k + 1, s.length - 1)).toInt
      out(n) = Math.floorDiv(sk * (l - p) + sk1 * p, l).toShort
      n += 1
    }
    out
  }

  final case class Resampled(doc_id: Long, in_n: Int, out_n: Int,
                             out_rate: Int, out_sum: Long, out_sumsq: Long)

  /** Resample every clip to rate·L/M THROUGH the codec twice: decode
    * the WAV, [[resampleSamples]], RE-ENCODE at the new rate,
    * RE-DECODE, and emit exact integer aggregates of the second
    * decode — the speech-curation normalization step (corpora arrive
    * at mixed rates; training wants one), with the encoder under test
    * on lengths and rates the fixture rule never produces. One narrow
    * mapPartitions pass; payloads never at the driver.
    */
  def resample(media: DataFrame, l: Int, m: Int): Dataset[Resampled] = {
    require(l >= 1 && l <= 16 && m >= 1 && m <= 16, s"bad ratio $l/$m")
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        records.map { r =>
          val pcm = Wav.decodeMono(r.payload)
          require(pcm.sampleRate.toLong * l % m == 0,
            s"rate ${pcm.sampleRate}·$l/$m is not integral")
          val outRate = (pcm.sampleRate.toLong * l / m).toInt
          val out = Wav.decode(Wav.encodePcm16(outRate,
            resampleSamples(pcm.samples, l, m))).samples
          var s1 = 0L
          var s2 = 0L
          var i = 0
          while (i < out.length) {
            val v = out(i).toLong
            s1 += v; s2 += v * v
            i += 1
          }
          Resampled(r.doc_id, pcm.samples.length, out.length, outRate, s1, s2)
        }
      }
  }

  private[graft] val MelBands = 8
  private[graft] val MelFrame = 64
  private[graft] val MelScale = 256

  /** Integer cycles-per-frame for [[MelBands]] mel-spaced center
    * frequencies between 300 Hz and 0.45·sr: mel(f) = 2595·log10(1 +
    * f/700), centers evenly spaced in mel, each quantized to a whole
    * number of cycles per [[MelFrame]]-sample window so the cos/sin
    * correlation tables are PERIODIC (64 entries per band) and the
    * whole filterbank stays on the integer lattice.
    */
  private[graft] def melCycles(sr: Int): Array[Int] = {
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def imel(v: Double) = 700.0 * (math.pow(10.0, v / 2595.0) - 1.0)
    val lo = mel(300.0)
    val hi = mel(sr * 0.45)
    Array.tabulate(MelBands) { k =>
      val f = imel(lo + (hi - lo) * (k + 1) / (MelBands + 1.0))
      math.max(1, math.round(f * MelFrame / sr).toInt)
    }
  }

  /** The scaled-integer correlation tables shared with the oracle
    * (the pHash doctrine): COS[k][j] = round(cos(2π·cyc_k·j/64)·256),
    * SIN likewise — float cos evaluated ONCE here, literal ints
    * interpolated into the oracle SQL, so no cross-engine rounding
    * drift exists anywhere in the energy path.
    */
  private[graft] def melTables(sr: Int): (Array[Array[Int]], Array[Array[Int]]) = {
    val cyc = melCycles(sr)
    val c = Array.tabulate(MelBands, MelFrame)((k, j) =>
      math.round(math.cos(2 * math.Pi * cyc(k) * j / MelFrame)
        * MelScale).toInt)
    val s = Array.tabulate(MelBands, MelFrame)((k, j) =>
      math.round(math.sin(2 * math.Pi * cyc(k) * j / MelFrame)
        * MelScale).toInt)
    (c, s)
  }

  final case class MelBandEnergy(doc_id: Long, frame_idx: Int, band: Int,
                                 energy: Long)

  /** Mel-band spectral energies over the RESAMPLED stream — the
    * speech-curation feature beyond time-domain stats (the r13
    * verdict's audio gap): per 64-sample frame and per mel-spaced
    * band k, the Goertzel-style correlation energy c² + s² with
    * c = Σⱼ out[j]·COS[k][j], s = Σⱼ out[j]·SIN[k][j] over the
    * frame's samples (trailing partial frame sums fewer terms). All
    * EXACT int64 by construction (|c| ≤ 64·32767·256 < 2³⁰, energy
    * < 2⁶⁰), so the oracle replays every energy to the last bit. One
    * narrow flatMap; ~8 skinny rows per frame.
    */
  def resampleMelEnergies(media: DataFrame, l: Int,
                          m: Int): Dataset[MelBandEnergy] = {
    require(l >= 1 && l <= 16 && m >= 1 && m <= 16, s"bad ratio $l/$m")
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        var tabsFor = -1
        var cosT: Array[Array[Int]] = null
        var sinT: Array[Array[Int]] = null
        records.flatMap { r =>
          val pcm = Wav.decodeMono(r.payload)
          require(pcm.sampleRate.toLong * l % m == 0,
            s"rate ${pcm.sampleRate}·$l/$m is not integral")
          val outRate = (pcm.sampleRate.toLong * l / m).toInt
          if (tabsFor != outRate) {
            val (c, s) = melTables(outRate)
            cosT = c; sinT = s; tabsFor = outRate
          }
          val out = resampleSamples(pcm.samples, l, m)
          val nFrames = (out.length + MelFrame - 1) / MelFrame
          (0 until nFrames).iterator.flatMap { fi =>
            val start = fi * MelFrame
            val end = math.min(start + MelFrame, out.length)
            (0 until MelBands).iterator.map { k =>
              var c = 0L
              var s = 0L
              var i = start
              while (i < end) {
                val v = out(i).toLong
                c += v * cosT(k)(i - start)
                s += v * sinT(k)(i - start)
                i += 1
              }
              MelBandEnergy(r.doc_id, fi, k, c * c + s * s)
            }
          }
        }
      }
  }

  private[graft] val CepCoefs = 4

  /** Scaled-integer DCT-II basis over the [[MelBands]] log-energies
    * (the MFCC step): DCT[q][k] = round(cos(π·q·(2k+1)/16)·256) —
    * computed once here, interpolated into the oracle as literals
    * (the pHash doctrine), so the cepstral path has no float anywhere.
    */
  private[graft] lazy val CepDct: Array[Array[Int]] =
    Array.tabulate(CepCoefs, MelBands)((q, k) =>
      math.round(math.cos(math.Pi * q * (2 * k + 1) / (2.0 * MelBands))
        * MelScale).toInt)

  /** Integer log with 4 fractional bits — the deterministic stand-in
    * for the MFCC log step (the PMI/DSIR doctrine: pin the fold to an
    * integer definition both engines replay exactly): for E ≥ 1,
    * ilog16(E) = 16·bitlen(E) + (E normalized to [16,32)) − 16 —
    * i.e. 16·(⌊log2 E⌋ + 1) plus the 4 bits after the leading one.
    * Monotonic, 0 ↔ E=0, and pure shifts in both engines.
    */
  private[graft] def ilog16(e: Long): Long =
    if (e <= 0L) 0L
    else {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(e)
      val x = if (bl >= 5) e >> (bl - 5) else e << (5 - bl) // ∈ [16,32)
      bl.toLong * 16 + (x - 16)
    }

  final case class Cepstra(doc_id: Long, frame_idx: Int,
                           c0: Long, c1: Long, c2: Long, c3: Long)

  /** Cepstral coefficients over the resampled stream — the MFCC shape
    * (filterbank → log → DCT) with every stage on the integer lattice:
    * the q357 mel energies, [[ilog16]] instead of float log, and the
    * scaled-integer [[CepDct]] basis, keeping the first [[CepCoefs]]
    * coefficients per frame. Exact int64 end to end, so the oracle
    * replays every coefficient to the last bit.
    */
  def resampleCepstra(media: DataFrame, l: Int, m: Int): Dataset[Cepstra] = {
    require(l >= 1 && l <= 16 && m >= 1 && m <= 16, s"bad ratio $l/$m")
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        var tabsFor = -1
        var cosT: Array[Array[Int]] = null
        var sinT: Array[Array[Int]] = null
        records.flatMap { r =>
          val pcm = Wav.decodeMono(r.payload)
          require(pcm.sampleRate.toLong * l % m == 0,
            s"rate ${pcm.sampleRate}·$l/$m is not integral")
          val outRate = (pcm.sampleRate.toLong * l / m).toInt
          if (tabsFor != outRate) {
            val (c, s) = melTables(outRate)
            cosT = c; sinT = s; tabsFor = outRate
          }
          val out = resampleSamples(pcm.samples, l, m)
          val nFrames = (out.length + MelFrame - 1) / MelFrame
          (0 until nFrames).iterator.map { fi =>
            val start = fi * MelFrame
            val end = math.min(start + MelFrame, out.length)
            val lv = new Array[Long](MelBands)
            var k = 0
            while (k < MelBands) {
              var c = 0L
              var s = 0L
              var i = start
              while (i < end) {
                val v = out(i).toLong
                c += v * cosT(k)(i - start)
                s += v * sinT(k)(i - start)
                i += 1
              }
              lv(k) = ilog16(c * c + s * s)
              k += 1
            }
            val cc = new Array[Long](CepCoefs)
            var q = 0
            while (q < CepCoefs) {
              var acc = 0L
              k = 0
              while (k < MelBands) { acc += CepDct(q)(k) * lv(k); k += 1 }
              cc(q) = acc
              q += 1
            }
            Cepstra(r.doc_id, fi, cc(0), cc(1), cc(2), cc(3))
          }
        }
      }
  }

  /** G.711 µ-law / A-law — the telephony companding codecs speech
    * corpora arrive in. Integer bit-exact per the public G.711
    * reference implementation (Sun g711.c lineage: BIAS 0x84 / CLIP
    * 32635 µ-law; 13-bit A-law with the 0x55 toggle), so the DuckDB
    * oracle replays both the code bytes and the reconstruction levels
    * with shifts and bin() arithmetic. G711Spec pins roundtrip error
    * bounds, quantization idempotence, code monotonicity, and the
    * spec's landmark values.
    */
  /** FLAC codec — the lossless audio analog of the PNG path, common in
    * speech corpora. Implements the published FLAC bitstream (xiph
    * spec / RFC 9639) for the integer-exact subset: "fLaC" marker +
    * STREAMINFO (incl. the unencoded-PCM MD5, which the decoder
    * VERIFIES — a built-in end-to-end check), fixed-blocking frames
    * with CONSTANT / VERBATIM / FIXED-predictor (orders 0–4) subframes,
    * Rice-coded residuals (both 4-bit and 5-bit parameter methods on
    * read; partition order 0 on write), UTF-8-style coded frame
    * numbers, CRC-8 header and CRC-16 frame checksums (verified).
    * Mono 16-bit only; LPC subframes, wasted bits, multi-channel
    * assignments, and unknown block-size/sample-rate codes REFUSE
    * loudly — this decoder never guesses.
    *
    * No external FLAC tool exists in this container; cross-validation
    * is via AudioSpec's byte-pinned frame (CRC constants generated
    * independently from the polynomial definitions) plus the MD5
    * self-check the format itself carries.
    */
  object Flac {

    private final class BitWriter {
      val out = new java.io.ByteArrayOutputStream()
      private var cur = 0
      private var nb = 0
      def bit(b: Int): Unit = {
        cur = (cur << 1) | (b & 1)
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
      }
      def bits(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
      }
      def aligned: Boolean = nb == 0
      def bytes: Array[Byte] = {
        require(nb == 0, "unaligned bit stream")
        out.toByteArray
      }
    }

    private final class BitReader(bytes: Array[Byte], start: Int) {
      var p: Int = start // bit position
      def bits(n: Int): Long = {
        var v = 0L
        var i = 0
        while (i < n) {
          require(p < bytes.length * 8, "truncated FLAC bit stream")
          v = (v << 1) | ((bytes(p >> 3) >> (7 - (p & 7))) & 1)
          p += 1
          i += 1
        }
        v
      }
      def unary(): Int = {
        var q = 0
        while (bits(1) == 0L) {
          q += 1
          require(q < (1 << 24), "runaway unary code (corrupt Rice stream)")
        }
        q
      }
      def align(): Unit = p = (p + 7) & ~7
      def bytePos: Int = { require((p & 7) == 0, "not byte aligned"); p >> 3 }
    }

    /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the FLAC frame
      * header checksum.
      */
    private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        crc ^= bytes(i) & 0xff
        var b = 0
        while (b < 8) {
          crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
                else (crc << 1) & 0xff
          b += 1
        }
        i += 1
      }
      crc
    }

    /** CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
      * whole-frame checksum.
      */
    private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
      var crc = 0
      var i = from
      while (i < until) {
        crc ^= (bytes(i) & 0xff) << 8
        var b = 0
        while (b < 8) {
          crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
                else (crc << 1) & 0xffff
          b += 1
        }
        i += 1
      }
      crc
    }

    /** UTF-8-style coded number (the frame-number encoding). */
    private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
      require(v >= 0 && v < (1L << 31), s"coded number $v out of range")
      if (v < 0x80) w.bits(v, 8)
      else {
        // count payload bits → continuation byte count
        var nBytes = 2
        while (v >= (1L << (nBytes * 5 + 1)) && nBytes < 6) nBytes += 1
        // leading byte: nBytes ones, a zero, then the high payload bits
        var i = 0
        while (i < nBytes) { w.bit(1); i += 1 }
        w.bit(0)
        val payloadBits = 7 - nBytes + 1 - 1 // bits in the lead byte
        w.bits(v >>> (6 * (nBytes - 1)), payloadBits)
        var k = nBytes - 2
        while (k >= 0) {
          w.bits(2L, 2) // 10 continuation marker
          w.bits((v >>> (6 * k)) & 0x3f, 6)
          k -= 1
        }
      }
    }

    private def readCodedNumber(r: BitReader): Long = {
      val first = r.bits(8).toInt
      if ((first & 0x80) == 0) first.toLong
      else {
        var nBytes = 0
        var mask = 0x80
        while ((first & mask) != 0) { nBytes += 1; mask >>= 1 }
        require(nBytes >= 2 && nBytes <= 7, s"bad coded-number lead $first")
        var v = (first & (0xff >> (nBytes + 1))).toLong
        var i = 1
        while (i < nBytes) {
          val cont = r.bits(8).toInt
          require((cont & 0xc0) == 0x80, "bad coded-number continuation")
          v = (v << 6) | (cont & 0x3f)
          i += 1
        }
        v
      }
    }

    /** Fixed-predictor residuals of order `o` over `s[from until to]`
      * (the published order-0..4 difference polynomials).
      */
    private def fixedResidual(s: Array[Int], from: Int, to: Int,
                              o: Int): Array[Long] = {
      val out = new Array[Long](to - from - o)
      var i = from + o
      while (i < to) {
        val r: Long = o match {
          case 0 => s(i)
          case 1 => s(i).toLong - s(i - 1)
          case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
          case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
          case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) -
            4L * s(i - 3) + s(i - 4)
        }
        out(i - from - o) = r
        i += 1
      }
      out
    }

    private def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1
    private def unzigzag(u: Long): Long =
      if ((u & 1) == 0) u >>> 1 else -((u >>> 1) + 1)

    /** Smallest total-bits Rice parameter for a residual block (ties →
      * smaller k; deterministic).
      */
    private def bestRiceParam(res: Array[Long]): Int = {
      var bestK = 0
      var bestBits = Long.MaxValue
      var k = 0
      while (k < 15) {
        var bits = 0L
        var i = 0
        while (i < res.length) {
          bits += (zigzag(res(i)) >>> k) + 1 + k
          i += 1
        }
        if (bits < bestBits) { bestBits = bits; bestK = k }
        k += 1
      }
      bestK
    }

    /** Encode mono PCM16 as a FLAC stream. Subframe choice per block:
      * CONSTANT when all samples agree; VERBATIM when `forceVerbatim`;
      * else the FIXED order (0–4) with the smallest total |residual|.
      */
    def encode(sampleRate: Int, samples: Array[Short], blockSize: Int = 4096,
               forceVerbatim: Boolean = false): Array[Byte] = {
      require(sampleRate > 0 && sampleRate < (1 << 20), s"rate $sampleRate")
      require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
      require(samples.nonEmpty, "empty sample stream")
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("US-ASCII"))
      // STREAMINFO (last-metadata flag set, type 0, length 34)
      val si = new BitWriter
      si.bits(1, 1); si.bits(0, 7); si.bits(34, 24)
      si.bits(blockSize.toLong, 16) // min block size
      si.bits(blockSize.toLong, 16) // max block size
      si.bits(0, 24); si.bits(0, 24) // frame sizes unknown
      si.bits(sampleRate.toLong, 20)
      si.bits(0, 3) // channels - 1
      si.bits(15, 5) // bits per sample - 1
      si.bits(samples.length.toLong, 36)
      val md = java.security.MessageDigest.getInstance("MD5")
      val pcmBytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcmBytes(i * 2) = (samples(i) & 0xff).toByte
        pcmBytes(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      si.bytes.foreach(b => out.write(b & 0xff))
      out.write(md.digest(pcmBytes), 0, 16)

      val sInt = samples.map(_.toInt)
      var frameNo = 0L
      var pos = 0
      while (pos < samples.length) {
        val n = math.min(blockSize, samples.length - pos)
        val w = new BitWriter
        w.bits(0x3ffe, 14) // sync
        w.bits(0, 1) // reserved
        w.bits(0, 1) // fixed blocking
        w.bits(7, 4) // block size: 16-bit value - 1 at header end
        w.bits(0, 4) // sample rate: from STREAMINFO
        w.bits(0, 4) // channel assignment: mono
        w.bits(4, 3) // sample size: 16 bits
        w.bits(0, 1) // reserved
        writeCodedNumber(w, frameNo)
        w.bits(n.toLong - 1, 16)
        val headerBytes = w.out.toByteArray
        require(w.aligned, "frame header must be byte aligned")
        w.bits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)

        // subframe header: padding 0, 6-bit type, wasted-bits 0
        val allEqual = {
          var eq = true
          var j = pos + 1
          while (eq && j < pos + n) { eq = sInt(j) == sInt(pos); j += 1 }
          eq
        }
        if (allEqual) {
          w.bits(0, 1); w.bits(0, 6); w.bits(0, 1)
          w.bits(sInt(pos).toLong & 0xffff, 16)
        } else if (forceVerbatim) {
          w.bits(0, 1); w.bits(1, 6); w.bits(0, 1)
          var j = pos
          while (j < pos + n) { w.bits(sInt(j).toLong & 0xffff, 16); j += 1 }
        } else {
          val maxOrder = math.min(4, n - 1)
          val order = (0 to maxOrder).minBy { o =>
            fixedResidual(sInt, pos, pos + n, o).map(r => math.abs(r)).sum
          }
          w.bits(0, 1); w.bits(8L + order, 6); w.bits(0, 1)
          var j = pos
          while (j < pos + order) { w.bits(sInt(j).toLong & 0xffff, 16); j += 1 }
          val res = fixedResidual(sInt, pos, pos + n, order)
          val k = bestRiceParam(res)
          w.bits(0, 2) // residual method: 4-bit Rice
          w.bits(0, 4) // partition order 0
          w.bits(k.toLong, 4)
          var ri = 0
          while (ri < res.length) {
            val u = zigzag(res(ri))
            val q = (u >>> k).toInt
            var qq = 0
            while (qq < q) { w.bit(0); qq += 1 }
            w.bit(1)
            w.bits(u & ((1L << k) - 1), k)
            ri += 1
          }
        }
        // byte-align with zeros, then CRC-16 of the whole frame
        while (!w.aligned) w.bit(0)
        val frameBytes = w.out.toByteArray
        w.bits(crc16(frameBytes, 0, frameBytes.length).toLong, 16)
        val full = w.bytes
        out.write(full, 0, full.length)
        frameNo += 1
        pos += n
      }
      out.toByteArray
    }

    final case class Decoded(sampleRate: Int, nFrames: Int,
                             samples: Array[Short])

    /** Decode a FLAC stream within this codec's subset; every checksum
      * (CRC-8, CRC-16, STREAMINFO MD5, total-sample count) is VERIFIED
      * — corruption and out-of-scope features fail loudly.
      */
    def decode(flac: Array[Byte]): Decoded = {
      require(flac.length > 42 &&
        new String(flac, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
      val r = new BitReader(flac, 32)
      // metadata blocks: STREAMINFO first (spec), skip others
      var last = false
      var sampleRate = -1
      var totalSamples = -1L
      var declaredMd5: Array[Byte] = null
      var first = true
      while (!last) {
        last = r.bits(1) == 1
        val typ = r.bits(7).toInt
        val len = r.bits(24).toInt
        if (first) {
          require(typ == 0, s"first metadata block type $typ, expected STREAMINFO")
          require(len == 34, s"STREAMINFO length $len")
          r.bits(16); r.bits(16); r.bits(24); r.bits(24)
          sampleRate = r.bits(20).toInt
          val channels = r.bits(3).toInt + 1
          require(channels == 1, s"$channels channels out of scope (mono only)")
          val bps = r.bits(5).toInt + 1
          require(bps == 16, s"$bps bits/sample out of scope")
          totalSamples = r.bits(36)
          declaredMd5 = new Array[Byte](16)
          var i = 0
          while (i < 16) { declaredMd5(i) = r.bits(8).toByte; i += 1 }
          first = false
        } else {
          var sk = 0
          while (sk < len) { r.bits(8); sk += 1 } // skip block body
        }
      }
      require(!first, "no STREAMINFO block")
      val outSamples = new Array[Short](
        { require(totalSamples <= Int.MaxValue / 2, "stream too large"); totalSamples.toInt })
      var written = 0
      var nFrames = 0
      while (r.p < flac.length * 8) {
        val frameStart = r.bytePos
        require(r.bits(14) == 0x3ffe, "lost frame sync")
        require(r.bits(1) == 0, "reserved bit set")
        r.bits(1) // blocking strategy
        val bsCode = r.bits(4).toInt
        val srCode = r.bits(4).toInt
        val chan = r.bits(4).toInt
        val ssCode = r.bits(3).toInt
        require(r.bits(1) == 0, "reserved bit set")
        require(chan == 0, s"channel assignment $chan out of scope (mono)")
        require(ssCode == 4, s"sample-size code $ssCode out of scope (16-bit)")
        readCodedNumber(r)
        val blockSize = bsCode match {
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.bits(8).toInt + 1
          case 7 => r.bits(16).toInt + 1
          case c if c >= 8 => 256 << (c - 8)
          case c => throw new IllegalArgumentException(s"block-size code $c")
        }
        srCode match {
          case 0 => // from STREAMINFO
          case 12 => r.bits(8)
          case 13 | 14 => r.bits(16)
          case c if c >= 1 && c <= 11 => // table codes: no extra bits
          case c => throw new IllegalArgumentException(s"sample-rate code $c")
        }
        val headerEnd = r.bytePos
        val declaredCrc8 = r.bits(8).toInt
        require(crc8(flac, frameStart, headerEnd) == declaredCrc8,
          "frame header CRC-8 mismatch")
        // subframe
        require(r.bits(1) == 0, "subframe padding bit set")
        val sfType = r.bits(6).toInt
        require(r.bits(1) == 0, "wasted bits out of scope")
        val block = new Array[Int](blockSize)
        def s16(v: Long): Int = (v.toInt << 16) >> 16
        sfType match {
          case 0 =>
            val v = s16(r.bits(16))
            java.util.Arrays.fill(block, v)
          case 1 =>
            var j = 0
            while (j < blockSize) { block(j) = s16(r.bits(16)); j += 1 }
          case t if t >= 8 && t <= 12 =>
            val order = t - 8
            require(order <= blockSize, "fixed order exceeds block")
            var j = 0
            while (j < order) { block(j) = s16(r.bits(16)); j += 1 }
            val method = r.bits(2).toInt
            require(method == 0 || method == 1,
              s"residual method $method out of scope")
            val pOrder = r.bits(4).toInt
            val nPartitions = 1 << pOrder
            require(blockSize % nPartitions == 0,
              "partition order does not divide block size")
            val pBits = if (method == 0) 4 else 5
            val escape = (1 << pBits) - 1
            var part = 0
            var idx = order
            while (part < nPartitions) {
              val count =
                if (pOrder == 0) blockSize - order
                else if (part == 0) blockSize / nPartitions - order
                else blockSize / nPartitions
              val k = r.bits(pBits).toInt
              if (k == escape) {
                val rawBits = r.bits(5).toInt
                var c = 0
                while (c < count) {
                  val raw = r.bits(rawBits)
                  block(idx) = restoreFixed(block, idx, order,
                    (raw << (64 - rawBits)) >> (64 - rawBits))
                  idx += 1; c += 1
                }
              } else {
                var c = 0
                while (c < count) {
                  val q = r.unary().toLong
                  val rem = r.bits(k)
                  val res = unzigzag((q << k) | rem)
                  block(idx) = restoreFixed(block, idx, order, res)
                  idx += 1; c += 1
                }
              }
              part += 1
            }
          case t =>
            throw new IllegalArgumentException(
              s"subframe type $t out of scope (LPC not supported)")
        }
        r.align()
        val frameEnd = r.bytePos
        val declaredCrc16 = (r.bits(16)).toInt
        require(crc16(flac, frameStart, frameEnd) == declaredCrc16,
          "frame CRC-16 mismatch")
        require(written + blockSize <= outSamples.length,
          "more samples than STREAMINFO declared")
        var j = 0
        while (j < blockSize) {
          outSamples(written + j) = block(j).toShort
          j += 1
        }
        written += blockSize
        nFrames += 1
      }
      require(written == outSamples.length,
        s"decoded $written of ${outSamples.length} declared samples")
      // the format's own end-to-end check: MD5 of the unencoded PCM
      val md = java.security.MessageDigest.getInstance("MD5")
      val pcmBytes = new Array[Byte](outSamples.length * 2)
      var k = 0
      while (k < outSamples.length) {
        pcmBytes(k * 2) = (outSamples(k) & 0xff).toByte
        pcmBytes(k * 2 + 1) = ((outSamples(k) >> 8) & 0xff).toByte
        k += 1
      }
      require(java.util.Arrays.equals(md.digest(pcmBytes), declaredMd5),
        "STREAMINFO MD5 mismatch — decoded PCM differs from encoded PCM")
      Decoded(sampleRate, nFrames, outSamples)
    }

    /** Reverse a fixed predictor: sample = residual + prediction from
      * the already-restored neighbors.
      */
    private def restoreFixed(block: Array[Int], idx: Int, order: Int,
                             res: Long): Int = {
      val v: Long = order match {
        case 0 => res
        case 1 => res + block(idx - 1)
        case 2 => res + 2L * block(idx - 1) - block(idx - 2)
        case 3 => res + 3L * block(idx - 1) - 3L * block(idx - 2) +
          block(idx - 3)
        case _ => res + 4L * block(idx - 1) - 6L * block(idx - 2) +
          4L * block(idx - 3) - block(idx - 4)
      }
      require(v >= Short.MinValue && v <= Short.MaxValue,
        s"restored sample $v outside 16-bit range (corrupt stream)")
      v.toInt
    }
  }

  final case class FlacRoundtrip(doc_id: Long, n_samples: Int, n_frames: Int,
                                 sample_sum: Long, sum_sq: Long, peak: Int)

  /** FLAC round-trip features: per document, samples by the text rule
    * (plus a planted constant tail on doc_id%5==0 so CONSTANT subframes
    * occur), encoded through [[Flac.encode]] (VERBATIM forced on
    * doc_id%7==0, FIXED otherwise), decoded back with every checksum
    * verified, and reduced to exact integer aggregates the oracle
    * replays from the rule. One narrow mapPartitions pass.
    */
  def flacRoundtrip(docs: DataFrame, blockSize: Int = 256): Dataset[FlacRoundtrip] = {
    import docs.sparkSession.implicits._
    Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val base = samplesOf(text)
          // tail value stays on the byte lattice (<=127·257−16384), so
          // the oracle's integer arithmetic never sees a 16-bit wrap
          val tail: Array[Short] =
            if (id % 5 == 0)
              Array.fill(300)(((id % 120) * 257 - 16384).toShort)
            else Array.emptyShortArray
          val s = base ++ tail
          // an empty-text doc with no tail has nothing to encode — emit
          // no row, exactly as the oracle's length(text) > 0 gate does
          if (s.isEmpty) None else Some {
          val payload = Flac.encode(SampleRate, s, blockSize,
            forceVerbatim = id % 7 == 0)
          val dec = Flac.decode(payload)
          require(java.util.Arrays.equals(dec.samples, s),
            s"doc $id: FLAC round trip not bit-exact")
          var sum = 0L
          var sumSq = 0L
          var peak = 0
          var i = 0
          while (i < dec.samples.length) {
            val v = dec.samples(i).toInt
            sum += v
            sumSq += v.toLong * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          FlacRoundtrip(id, dec.samples.length, dec.nFrames, sum, sumSq, peak)
          }
        }
      }
  }

  object G711 {
    private val UBias = 0x84
    private val UClip = 32635

    def ulawEncode(x0: Int): Int = {
      val sign = if (x0 < 0) 0x80 else 0
      var x = if (x0 < 0) -x0 else x0
      if (x > UClip) x = UClip
      x += UBias
      val exp = (31 - Integer.numberOfLeadingZeros(x)) - 7 // bitlen-8
      val mant = (x >> (exp + 3)) & 0x0f
      255 - (sign | (exp << 4) | mant)
    }

    def ulawDecode(code: Int): Int = {
      val u = 255 - (code & 0xff)
      var t = ((u & 0x0f) << 3) + UBias
      t <<= (u >> 4) & 7
      if ((u & 0x80) != 0) UBias - t else t - UBias
    }

    def alawEncode(x0: Int): Int = {
      val mask = if (x0 >= 0) 0xd5 else 0x55
      // 16→13 bit arithmetic shift, then the reference's -p-1 fold for
      // negatives == (|x|-1)//8 — nonnegative operands only, so the
      // oracle's truncating // agrees
      val m0 = if (x0 >= 0) x0 >> 3 else (-x0 - 1) >> 3
      val m = if (m0 > 0xfff) 0xfff else m0
      val seg = math.max(0, (32 - Integer.numberOfLeadingZeros(m)) - 5)
      val aval =
        if (seg < 2) (seg << 4) | ((m >> 1) & 0x0f)
        else (seg << 4) | ((m >> seg) & 0x0f)
      aval ^ mask
    }

    def alawDecode(code: Int): Int = {
      val a = (code & 0xff) ^ 0x55
      var t = (a & 0x0f) << 4
      val seg = (a >> 4) & 7
      if (seg == 0) t += 8
      else if (seg == 1) t += 0x108
      else { t += 0x108; t <<= seg - 1 }
      if ((a & 0x80) != 0) t else -t
    }
  }

  final case class Companded(doc_id: Long, n_samples: Int,
                             ulaw_md5: String, ulaw_dec_sum: Long,
                             alaw_md5: String, alaw_dec_sum: Long)

  /** Compand every clip through BOTH G.711 laws: decode the WAV,
    * encode each sample to µ-law and A-law code bytes (digested as
    * lowercase hex), decode back, and sum the reconstruction levels —
    * the telephony-ingest normalization step, with codes AND
    * reconstruction under one hash. One narrow mapPartitions pass.
    */
  def g711Compand(media: DataFrame): Dataset[Companded] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        val hex = "0123456789abcdef".toCharArray
        records.map { r =>
          val s = Wav.decodeMono(r.payload).samples
          val ub = new java.lang.StringBuilder(s.length * 2)
          val ab = new java.lang.StringBuilder(s.length * 2)
          var us = 0L
          var as = 0L
          var i = 0
          while (i < s.length) {
            val x = s(i).toInt
            val uc = G711.ulawEncode(x)
            val ac = G711.alawEncode(x)
            ub.append(hex(uc >> 4)).append(hex(uc & 0xf))
            ab.append(hex(ac >> 4)).append(hex(ac & 0xf))
            us += G711.ulawDecode(uc)
            as += G711.alawDecode(ac)
            i += 1
          }
          def md5(sb: java.lang.StringBuilder): String =
            java.security.MessageDigest.getInstance("MD5")
              .digest(sb.toString.getBytes("US-ASCII"))
              .map(b => f"$b%02x").mkString
          Companded(r.doc_id, s.length, md5(ub), us, md5(ab), as)
        }
      }
  }

  /** IMA ADPCM (DVI4/WAV flavor) — the 4-bit adaptive-delta codec
    * telephony and game audio shipped for decades: 4:1 compression
    * with a per-block header that makes every block INDEPENDENTLY
    * decodable (the seek property a distributed reader needs — a
    * 100-TB audio corpus splits on block boundaries with no cross-task
    * state). Standard step/index tables per the public IMA spec;
    * blocks are 65 samples (2-byte predictor LE + step index + reserved
    * + 32 packed-nibble bytes, low nibble first), and the step index
    * RESETS to 0 at each block header, so blocks are also
    * arithmetically independent — the property the DuckDB oracle's
    * 64-level recursion replays.
    */
  object ImaAdpcm {
    private[graft] val StepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

    private[graft] val BlockSamples = 65 // 1 header + 64 nibbles

    private def clampPred(v: Int): Int =
      if (v > 32767) 32767 else if (v < -32768) -32768 else v

    /** One encode/decode step from (pred, idx) on `sample`: returns
      * (nibble, newPred, newIdx). The quantize and the reconstruction
      * are the SAME arithmetic on both sides — the encoder embeds the
      * decoder (standard IMA).
      */
    private[graft] def step(pred: Int, idx: Int,
                            sample: Int): (Int, Int, Int) = {
      val st = StepTable(idx)
      val diff = sample - pred
      val sign = if (diff < 0) 8 else 0
      var ad = if (diff < 0) -diff else diff
      var delta = 0
      if (ad >= st) { delta = 4; ad -= st }
      if (ad >= (st >> 1)) { delta |= 2; ad -= st >> 1 }
      if (ad >= (st >> 2)) delta |= 1
      var dq = st >> 3
      if ((delta & 4) != 0) dq += st
      if ((delta & 2) != 0) dq += st >> 1
      if ((delta & 1) != 0) dq += st >> 2
      val newPred = clampPred(if (sign != 0) pred - dq else pred + dq)
      val idxDelta = if (delta < 4) -1 else (delta - 3) * 2
      val newIdx = math.max(0, math.min(88, idx + idxDelta))
      (sign | delta, newPred, newIdx)
    }

    /** Encode PCM16 samples into independent 65-sample blocks: header
      * = raw first sample (int16 LE) + step index 0 + reserved 0, then
      * 32 bytes of packed nibbles (low first; a short tail block packs
      * ceil(k/2) bytes with a zero pad nibble).
      */
    def encode(samples: Array[Short]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var b0 = 0
      while (b0 < samples.length) {
        val n = math.min(BlockSamples, samples.length - b0)
        val s0 = samples(b0).toInt
        out.write(s0 & 0xff); out.write((s0 >> 8) & 0xff)
        out.write(0); out.write(0) // step index 0, reserved
        var pred = s0
        var idx = 0
        var j = 1
        while (j < n) {
          val (nib1, p1, i1) = step(pred, idx, samples(b0 + j).toInt)
          pred = p1; idx = i1
          var byte = nib1
          if (j + 1 < n) {
            val (nib2, p2, i2) = step(pred, idx, samples(b0 + j + 1).toInt)
            pred = p2; idx = i2
            byte |= nib2 << 4
          }
          out.write(byte)
          j += 2
        }
        b0 += n
      }
      out.toByteArray
    }

    /** Decode `nSamples` back out of the block stream. Throws on
      * truncation — a corrupt payload must fail loudly.
      */
    def decode(bytes: Array[Byte], nSamples: Int): Array[Short] = {
      val out = new Array[Short](nSamples)
      var o = 0
      var p = 0
      while (o < nSamples) {
        val n = math.min(BlockSamples, nSamples - o)
        val dataBytes = (n - 1 + 1) / 2
        require(p + 4 + dataBytes <= bytes.length, "truncated ADPCM block")
        var pred = ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)).toShort
          .toInt
        var idx = bytes(p + 2) & 0xff
        require(idx <= 88, s"ADPCM step index $idx out of range")
        p += 4
        out(o) = pred.toShort
        var j = 1
        while (j < n) {
          val byte = bytes(p + (j - 1) / 2) & 0xff
          val nib = if ((j - 1) % 2 == 0) byte & 0x0f else byte >> 4
          val st = StepTable(idx)
          var dq = st >> 3
          if ((nib & 4) != 0) dq += st
          if ((nib & 2) != 0) dq += st >> 1
          if ((nib & 1) != 0) dq += st >> 2
          pred = clampPred(if ((nib & 8) != 0) pred - dq else pred + dq)
          val delta = nib & 7
          idx = math.max(0, math.min(88,
            idx + (if (delta < 4) -1 else (delta - 3) * 2)))
          out(o + j) = pred.toShort
          j += 1
        }
        p += dataBytes
        o += n
      }
      out
    }
  }

  final case class Adpcm(doc_id: Long, n_samples: Int, n_blocks: Int,
                         adpcm_md5: String, dec_sum: Long, dec_sumsq: Long)

  /** Compress every clip through IMA ADPCM and decode it back: emits
    * the code-stream digest plus exact integer aggregates of the
    * reconstruction — codec bytes AND the adaptive-quantizer recurrence
    * both under one hash. One narrow mapPartitions pass.
    */
  def adpcmRoundtrip(media: DataFrame): Dataset[Adpcm] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        val hex = "0123456789abcdef".toCharArray
        records.map { r =>
          val s = Wav.decodeMono(r.payload).samples
          val code = ImaAdpcm.encode(s)
          val back = ImaAdpcm.decode(code, s.length)
          val sb = new java.lang.StringBuilder(code.length * 2)
          code.foreach { b =>
            sb.append(hex((b >> 4) & 0xf)).append(hex(b & 0xf))
          }
          var s1 = 0L
          var s2 = 0L
          back.foreach { v => s1 += v; s2 += v.toLong * v }
          Adpcm(r.doc_id, s.length,
            (s.length + ImaAdpcm.BlockSamples - 1) / ImaAdpcm.BlockSamples,
            java.security.MessageDigest.getInstance("MD5")
              .digest(sb.toString.getBytes("US-ASCII"))
              .map(b => f"$b%02x").mkString,
            s1, s2)
        }
      }
  }

  /** ID3v2.3 tag + MPEG-1 Layer III frame-header metadata — the
    * container metadata layer MP3 corpora carry (the audio analog of
    * [[Exif]]): a curation pipeline reads title/artist/track from the
    * tag and derives duration from the frame walk WITHOUT decoding any
    * audio. Writer + parser per the public ID3v2.3 layout (syncsafe
    * 28-bit tag size, 4-char frame ids, ISO-8859-1 text frames) and
    * the MPEG audio frame header (sync, version/layer bits, bitrate
    * and sample-rate tables, padding bit; 1152 samples per Layer III
    * frame). The audio payload itself stays opaque — the frame walk
    * is real, the PCM is out of scope by design (the stubbed-decode
    * doctrine for formats whose codecs are beyond a metadata pass).
    */
  object Id3 {
    private[graft] val BitrateKbps = // MPEG-1 Layer III, indices 1..14
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private[graft] val SampleRates = Array(44100, 48000, 32000)

    private def syncsafe(v: Int): Array[Byte] = Array(
      ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)

    final case class Tag(title: String, artist: String, album: String,
                         track: Int)

    /** Build an ID3v2.3 tag followed by `nFrames` MPEG-1 Layer III
      * frames (header real, body opaque zeros).
      */
    def build(tag: Tag, bitrateIdx: Int, sampleRateIdx: Int,
              nFrames: Int): Array[Byte] = {
      require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bitrate idx $bitrateIdx")
      require(sampleRateIdx >= 0 && sampleRateIdx <= 2, s"rate idx $sampleRateIdx")
      def textFrame(id: String, text: String): Array[Byte] = {
        val body = 0.toByte +: text.getBytes("ISO-8859-1") // encoding 0
        val out = new java.io.ByteArrayOutputStream()
        out.write(id.getBytes("US-ASCII"))
        val n = body.length
        out.write((n >> 24) & 0xff); out.write((n >> 16) & 0xff)
        out.write((n >> 8) & 0xff); out.write(n & 0xff)
        out.write(0); out.write(0) // frame flags
        out.write(body, 0, body.length)
        out.toByteArray
      }
      val frames = textFrame("TIT2", tag.title) ++
        textFrame("TPE1", tag.artist) ++ textFrame("TALB", tag.album) ++
        textFrame("TRCK", tag.track.toString)
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("US-ASCII"))
      out.write(3); out.write(0) // v2.3.0
      out.write(0)               // flags
      out.write(syncsafe(frames.length))
      out.write(frames, 0, frames.length)
      // MPEG-1 Layer III frames: 0xFF 0xFB (sync, MPEG1, L3, no CRC)
      val br = BitrateKbps(bitrateIdx) * 1000
      val sr = SampleRates(sampleRateIdx)
      val frameLen = 144 * br / sr // padding bit 0
      (0 until nFrames).foreach { _ =>
        val f = new Array[Byte](frameLen)
        f(0) = 0xff.toByte
        f(1) = 0xfb.toByte
        f(2) = ((bitrateIdx << 4) | (sampleRateIdx << 2)).toByte
        f(3) = 0
        out.write(f)
      }
      out.toByteArray
    }

    final case class Meta(title: String, artist: String, album: String,
                          track: Int, bitrate_kbps: Int, sample_rate: Int,
                          n_frames: Int, total_samples: Long)

    /** Parse the ID3v2 tag and walk every MPEG frame header. Throws on
      * malformed tags, bad sync, reserved bitrate/rate indices, or a
      * truncated final frame.
      */
    def parse(bytes: Array[Byte]): Meta = {
      require(bytes.length >= 10 && bytes(0) == 'I'.toByte &&
        bytes(1) == 'D'.toByte && bytes(2) == '3'.toByte, "no ID3v2 tag")
      require((bytes(3) & 0xff) == 3, s"ID3v2.${bytes(3)} unsupported")
      val tagSize = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      require(10 + tagSize <= bytes.length, "truncated ID3v2 tag")
      var p = 10
      var title = ""; var artist = ""; var album = ""; var track = 0
      while (p + 10 <= 10 + tagSize &&
        bytes(p) != 0) { // zero byte = padding area
        val id = new String(bytes, p, 4, "US-ASCII")
        val n = ((bytes(p + 4) & 0xff) << 24) | ((bytes(p + 5) & 0xff) << 16) |
          ((bytes(p + 6) & 0xff) << 8) | (bytes(p + 7) & 0xff)
        require(n >= 0 && p + 10 + n <= 10 + tagSize,
          s"ID3 frame $id overruns the tag")
        if (id.startsWith("T") && n >= 1) {
          require(bytes(p + 10) == 0, s"$id: only ISO-8859-1 text supported")
          val text = new String(bytes, p + 11, n - 1, "ISO-8859-1")
          id match {
            case "TIT2" => title = text
            case "TPE1" => artist = text
            case "TALB" => album = text
            case "TRCK" => track = text.toInt
            case _ => // other text frame: skip
          }
        }
        p += 10 + n
      }
      // frame walk
      p = 10 + tagSize
      var nFrames = 0
      var bitrate = -1
      var sr = -1
      while (p < bytes.length) {
        require(p + 4 <= bytes.length, "truncated MPEG frame header")
        require((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0,
          f"bad MPEG sync at $p: ${bytes(p)}%02x${bytes(p + 1)}%02x")
        require((bytes(p + 1) & 0xff) == 0xfb,
          "only MPEG-1 Layer III without CRC in scope")
        val bIdx = (bytes(p + 2) & 0xf0) >> 4
        val sIdx = (bytes(p + 2) & 0x0c) >> 2
        require(bIdx >= 1 && bIdx <= 14, s"reserved bitrate index $bIdx")
        require(sIdx <= 2, s"reserved sample-rate index $sIdx")
        val pad = (bytes(p + 2) & 0x02) >> 1
        val thisBr = BitrateKbps(bIdx)
        val thisSr = SampleRates(sIdx)
        require(bitrate < 0 || (bitrate == thisBr && sr == thisSr),
          "VBR / mid-stream format change out of scope")
        bitrate = thisBr; sr = thisSr
        val frameLen = 144 * (thisBr * 1000) / thisSr + pad
        require(p + frameLen <= bytes.length, s"truncated MPEG frame at $p")
        p += frameLen
        nFrames += 1
      }
      require(nFrames > 0, "no MPEG frames after the tag")
      Meta(title, artist, album, track, bitrate, sr, nFrames,
        nFrames.toLong * 1152)
    }
  }

  /** Attach ID3v2-tagged MP3 payloads by arithmetic rule and parse
    * them back — tag text, bitrate/rate tables, and the frame walk all
    * under the hash.
    */
  def asMp3Media(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    Parallelism.ensure(docs)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val tag = Id3.Tag(s"Title $id", s"Artist ${id % 10}",
            s"Album ${id % 5}", (id % 20).toInt + 1)
          val payload = Id3.build(tag,
            bitrateIdx = (1 + id % 14).toInt,
            sampleRateIdx = (id % 3).toInt,
            nFrames = (1 + id % 5).toInt)
          Multimodal.MediaRecord(id, payload)
        }
      }
      .toDF("doc_id", "payload")
  }

  final case class Mp3Meta(doc_id: Long, title: String, artist: String,
                           album: String, track: Int, bitrate_kbps: Int,
                           sample_rate: Int, n_frames: Int,
                           total_samples: Long)

  def parseMp3Meta(media: DataFrame): Dataset[Mp3Meta] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        records.map { r =>
          val m = Id3.parse(r.payload)
          Mp3Meta(r.doc_id, m.title, m.artist, m.album, m.track,
            m.bitrate_kbps, m.sample_rate, m.n_frames, m.total_samples)
        }
      }
  }

  /** Attach a STEREO WAV payload per document: the left channel is the
    * q212 sample rule, the right channel is the NEXT character's sample
    * (last character held) — both SQL-replayable, and distinct enough
    * that a channel-swap or de-interleave bug changes the mix.
    */
  def asStereoAudio(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val l = samplesOf(text)
          val inter = new Array[Short](l.length * 2)
          var i = 0
          while (i < l.length) {
            inter(2 * i) = l(i)
            inter(2 * i + 1) = l(math.min(i + 1, l.length - 1))
            i += 1
          }
          AudioMedia(id, Wav.encodePcm16N(SampleRate, 2, inter),
            "audio/wav", SampleRate, l.length)
        }
      }
      .select(col("doc_id"), col("payload"),
        struct(col("format"), col("sample_rate"), col("n_samples")).as("meta"))
  }

  final case class Downmixed(doc_id: Long, n_samples: Int, mix_sum: Long,
                             mix_sumsq: Long, mix_peak: Int)

  /** Downmix stereo to mono — the rate/channel normalization step a
    * speech corpus needs before training: de-interleave, m = ⌊(L+R)/2⌋
    * (floorDiv, so the oracle's floor() over exact doubles agrees on
    * negative sums), re-encode mono THROUGH the codec, re-decode, and
    * emit exact integer aggregates of the second decode.
    */
  def downmixStereo(media: DataFrame): Dataset[Downmixed] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        records.map { r =>
          val pcm = Wav.decode(r.payload)
          require(pcm.channels == 2,
            s"downmixStereo needs stereo input, got ${pcm.channels}")
          val n = pcm.samples.length / 2
          val mono = new Array[Short](n)
          var i = 0
          while (i < n) {
            mono(i) = Math.floorDiv(
              pcm.samples(2 * i) + pcm.samples(2 * i + 1), 2).toShort
            i += 1
          }
          val back = Wav.decode(
            Wav.encodePcm16N(pcm.sampleRate, 1, mono)).samples
          var s1 = 0L
          var s2 = 0L
          var peak = 0
          back.foreach { v =>
            s1 += v; s2 += v.toLong * v
            val a = math.abs(v.toInt)
            if (a > peak) peak = a
          }
          Downmixed(r.doc_id, back.length, s1, s2, peak)
        }
      }
  }

  final case class VadSegment(doc_id: Long, seg_idx: Int, start_frame: Int,
                              n_frames: Int, energy_sum: Long, peak: Int)

  /** Energy-gated voice-activity segmentation — the cut step before
    * any per-utterance processing in a speech-curation pipeline: frame
    * the PCM at `frameLen`, mark frames with Σs² ≥ `threshold` active,
    * and emit each MAXIMAL RUN of active frames as a segment with its
    * start, length, exact energy sum, and peak. Pure integer
    * thresholding (no float spectral gate), so the oracle replays the
    * frame energies and reconstructs the runs with window functions.
    * One narrow mapPartitions pass; segments are per-clip local.
    */
  def vadSegments(media: DataFrame, frameLen: Int,
                  threshold: Long): Dataset[VadSegment] = {
    require(frameLen > 0 && threshold >= 0, s"bad $frameLen/$threshold")
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[AudioRecord]
      .mapPartitions { records =>
        records.flatMap { r =>
          val s = Wav.decodeMono(r.payload).samples
          val nFrames = (s.length + frameLen - 1) / frameLen
          val out = Vector.newBuilder[VadSegment]
          var segIdx = 0
          var segStart = -1
          var segEnergy = 0L
          var segPeak = 0
          var fi = 0
          while (fi <= nFrames) {
            var active = false
            var e = 0L
            var peak = 0
            if (fi < nFrames) {
              val start = fi * frameLen
              val end = math.min(start + frameLen, s.length)
              var i = start
              while (i < end) {
                val v = s(i).toInt
                e += v.toLong * v
                val a = math.abs(v)
                if (a > peak) peak = a
                i += 1
              }
              active = e >= threshold
            }
            if (active) {
              if (segStart < 0) { segStart = fi; segEnergy = 0L; segPeak = 0 }
              segEnergy += e
              if (peak > segPeak) segPeak = peak
            } else if (segStart >= 0) {
              out += VadSegment(r.doc_id, segIdx, segStart, fi - segStart,
                segEnergy, segPeak)
              segIdx += 1
              segStart = -1
            }
            fi += 1
          }
          out.result()
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
          val s = Wav.decodeMono(r.payload).samples
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
