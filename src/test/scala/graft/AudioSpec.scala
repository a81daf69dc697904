package graft

import graft.operators.Audio
import graft.operators.Audio.Wav
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** The WAV codec under independent test — same doctrine as
  * MultimodalSpec's PNG coverage: the decoder must read files the JDK's
  * OWN javax.sound encoder wrote (and vice versa), not just our
  * encoder's output, so a self-consistently-wrong codec cannot pass.
  */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def shorts(xs: Int*): Array[Short] = xs.map(_.toShort).toArray

  test("WAV encode → decode round-trips samples, rate, and format fields") {
    val rng = new scala.util.Random(29)
    for (n <- Seq(0, 1, 7, 1024)) {
      val s = Array.fill(n)((rng.nextInt(65536) - 32768).toShort)
      val pcm = Wav.decode(Wav.encodePcm16(16000, s))
      assert(pcm.sampleRate == 16000 && pcm.channels == 1 && pcm.bitsPerSample == 16)
      assert(java.util.Arrays.equals(pcm.samples, s), s"n=$n")
    }
  }

  test("decoder reads the JDK AudioSystem encoder's WAVs") {
    val rng = new scala.util.Random(31)
    val s = Array.fill(777)((rng.nextInt(65536) - 32768).toShort)
    val bytes = new Array[Byte](s.length * 2)
    var i = 0
    while (i < s.length) { // little-endian int16, as the fmt below declares
      bytes(2 * i) = (s(i) & 0xff).toByte
      bytes(2 * i + 1) = ((s(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(22050f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt, s.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    val pcm = Wav.decode(out.toByteArray)
    assert(pcm.sampleRate == 22050)
    assert(java.util.Arrays.equals(pcm.samples, s), "JDK-encoded WAV decoded wrong")
  }

  test("JDK AudioSystem parses our encoder's output") {
    val s = shorts(100, -200, 300, -32768, 32767)
    val ais = AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(Wav.encodePcm16(8000, s)))
    val f = ais.getFormat
    assert(f.getSampleRate == 8000f && f.getChannels == 1 &&
      f.getSampleSizeInBits == 16 && !f.isBigEndian)
    assert(ais.getFrameLength == s.length.toLong)
  }

  test("decoder skips ancillary chunks and honors odd-length padding") {
    val s = shorts(1, -2, 3)
    val canonical = Wav.encodePcm16(16000, s)
    // splice a 3-byte LIST chunk (odd → 1 pad byte) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = canonical.take(fmtEnd) ++ extra ++ canonical.drop(fmtEnd)
    // patch the RIFF size for the inserted bytes (LE int at offset 4)
    val riffLen = (spliced.length - 8)
    spliced(4) = (riffLen & 0xff).toByte
    spliced(5) = ((riffLen >> 8) & 0xff).toByte
    spliced(6) = ((riffLen >> 16) & 0xff).toByte
    spliced(7) = ((riffLen >> 24) & 0xff).toByte
    val pcm = Wav.decode(spliced)
    assert(java.util.Arrays.equals(pcm.samples, s))
  }

  test("truncated, non-RIFF, and unsupported-format streams fail loudly") {
    val good = Wav.encodePcm16(16000, shorts(5, 6))
    assertThrows[IllegalArgumentException](Wav.decode(good.take(30)))
    assertThrows[IllegalArgumentException](Wav.decode("not a wav at all".getBytes))
    // stereo became supported in r14; 3 channels stays out of scope
    val multi = good.clone() // channels lives at offset 22 (LE short)
    multi(22) = 3
    assertThrows[IllegalArgumentException](Wav.decode(multi))
  }

  test("sample rule: sign structure makes word boundaries zero crossings") {
    val s = Audio.samplesOf("ab cd")
    // letters (>=64) map positive, space (32) negative
    assert(s(0) > 0 && s(1) > 0 && s(2) < 0 && s(3) > 0 && s(4) > 0)
    assert(Audio.samplesOf("").isEmpty)
  }

  test("extractFeatures matches a hand computation through the codec") {
    import spark.implicits._
    val docs = Seq((1L, "ab a"), (2L, "x")).toDF("doc_id", "text")
    val feats = Audio.extractFeatures(Audio.asAudio(docs), every = 4)
      .collect().map(f => f.doc_id -> f).toMap

    // doc 1: bytes 97 98 32 97 → samples 8545 8802 -8160 8545
    val f1 = feats(1L)
    assert(f1.sample_rate == 16000 && f1.n_samples == 4)
    assert(f1.duration_ms == 4 * 1000.0 / 16000)
    val expSq = List(8545, 8802, -8160, 8545).map(v => v.toLong * v).sum
    assert(f1.sum_sq == expSq)
    assert(f1.rms == math.sqrt(expSq.toDouble / 4))
    assert(f1.zero_crossings == 2) // + + − + → two sign changes
    assert(f1.peak == 8802)
    assert(f1.dec_n == 1 && f1.dec_sum == 8545L) // decimation keeps index 0

    val f2 = feats(2L) // byte 120 → sample 126*... = 120*257-16384 = 14456
    assert(f2.n_samples == 1 && f2.zero_crossings == 0 && f2.peak == 14456)
    assert(f2.dec_n == 1 && f2.dec_sum == 14456L)
  }

  test("resampleSamples: exact integer interpolation, both directions") {
    // 3/2 upsample of a ramp: positions 0, 2/3, 4/3, 2, ... — hand
    // values with floor division on negatives
    val s = Array[Short](-300, 0, 300, 600)
    val up = Audio.resampleSamples(s, 3, 2)
    // nOut = (3*3)/2 + 1 = 5; phases p = (2n mod 3): 0,2,1,0,2
    assert(up.toSeq == Seq[Short](
      -300, // n=0: k=0 p=0
      Math.floorDiv(-300 * 1 + 0 * 2, 3).toShort, // n=1: k=0 p=2 → -100
      Math.floorDiv(0 * 2 + 300 * 1, 3).toShort, // n=2: k=1 p=1 → 100
      300, // n=3: k=2 p=0
      Math.floorDiv(300 * 1 + 600 * 2, 3).toShort)) // n=4: k=2 p=2 → 500
    // downsample 1/2 keeps every other sample
    assert(Audio.resampleSamples(s, 1, 2).toSeq == Seq[Short](-300, 300))
    // degenerate single sample holds
    assert(Audio.resampleSamples(Array[Short](42), 3, 2).toSeq == Seq[Short](42))
    assert(Audio.resampleSamples(Array.emptyShortArray, 3, 2).isEmpty)
  }

  test("resample through the codec matches a direct hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "resample me please")).toDF("doc_id", "text")
    val r = Audio.resample(Audio.asAudio(docs), 3, 2).collect().head
    val direct = Audio.resampleSamples(Audio.samplesOf("resample me please"), 3, 2)
    assert(r.in_n == 18 && r.out_n == direct.length && r.out_rate == 24000)
    assert(r.out_sum == direct.map(_.toLong).sum)
    assert(r.out_sumsq == direct.map(v => v.toLong * v).sum)
  }

  test("mel-band energies match the direct Goertzel computation") {
    import spark.implicits._
    val text = "mel band energies over the resampled pcm stream exercise frames"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Audio.resampleMelEnergies(Audio.asAudio(docs), 3, 2)
      .collect().map(e => (e.frame_idx, e.band) -> e.energy).toMap
    val out = Audio.resampleSamples(Audio.samplesOf(text), 3, 2)
    val (cosT, sinT) = Audio.melTables(24000)
    val nFrames = (out.length + 63) / 64
    assert(rows.size == nFrames * 8)
    for (fi <- 0 until nFrames; k <- 0 until 8) {
      val start = fi * 64
      val end = math.min(start + 64, out.length)
      var c = 0L; var s = 0L
      for (i <- start until end) {
        c += out(i).toLong * cosT(k)(i - start)
        s += out(i).toLong * sinT(k)(i - start)
      }
      assert(rows((fi, k)) == c * c + s * s, s"frame $fi band $k")
    }
    // the band lattice is mel-monotone: cycle counts strictly ordered
    val cyc = Audio.melCycles(24000)
    assert(cyc.toSeq == cyc.sorted.toSeq && cyc.head >= 1 && cyc.last <= 31)
  }

  test("asAudio payloads carry typed metadata and decode to the rule") {
    import spark.implicits._
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val row = Audio.asAudio(docs).select("doc_id", "payload", "meta.format",
      "meta.sample_rate", "meta.n_samples").head()
    assert(row.getLong(0) == 7L && row.getString(2) == "audio/wav")
    assert(row.getInt(3) == 16000 && row.getInt(4) == 11)
    val pcm = Wav.decode(row.getAs[Array[Byte]](1))
    assert(java.util.Arrays.equals(pcm.samples, Audio.samplesOf("hello world")))
  }

  test("vadSegments: maximal active runs with exact stats") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.operators.Audio
    // '@' -> sample 64 (near-silence); 'Z' -> sample 6746 (loud).
    // 64-char frames: [loud][silent][loud][silent tail]
    val text = "Z" * 64 + "@" * 128 + "Z" * 64 + "@" * 32
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val segs = Audio.vadSegments(Audio.asAudio(docs), frameLen = 64,
      threshold = 1000000L).collect().sortBy(_.seg_idx)
    assert(segs.length == 2, s"expected 2 segments, got ${segs.toSeq}")
    assert(segs(0).start_frame == 0 && segs(0).n_frames == 1)
    assert(segs(1).start_frame == 3 && segs(1).n_frames == 1)
    val loudE = 64L * 6746L * 6746L
    assert(segs(0).energy_sum == loudE && segs(1).energy_sum == loudE)
    assert(segs(0).peak == 6746)
    // an all-silent clip yields no segments
    val none = Audio.vadSegments(
      Audio.asAudio(Seq((2L, "@" * 100)).toDF("doc_id", "text")),
      64, 1000000L).collect()
    assert(none.isEmpty)
  }

  test("stereo WAV: JDK parses ours; downmix matches a hand computation") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.operators.Audio
    // JDK cross-validation of the stereo encode
    val inter = Array[Short](100, -200, 300, -400, 32767, -32768)
    val wav = Audio.Wav.encodePcm16N(16000, 2, inter)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getChannels == 2)
    assert(ais.getFormat.getSampleRate == 16000f)
    val pcm = Audio.Wav.decode(wav)
    assert(pcm.channels == 2 && pcm.samples.toSeq == inter.toSeq)
    // downmix floors toward negative infinity on odd negative sums
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    val row = Audio.downmixStereo(Audio.asStereoAudio(docs)).collect().head
    val a = 97 * 257 - 16384; val b = 98 * 257 - 16384
    val m0 = Math.floorDiv(a + b, 2); val m1 = Math.floorDiv(b + b, 2)
    assert(row.n_samples == 2)
    assert(row.mix_sum == m0.toLong + m1)
    assert(row.mix_peak == math.max(math.abs(m0), math.abs(m1)))
  }

  test("Id3: tag+frame roundtrip, malformed and out-of-scope fail loudly") {
    import graft.operators.Audio.Id3
    val tag = Id3.Tag("A Song", "Some Artist", "The Album", 7)
    val payload = Id3.build(tag, bitrateIdx = 9, sampleRateIdx = 0,
      nFrames = 3)
    val m = Id3.parse(payload)
    assert(m.title == "A Song" && m.artist == "Some Artist" &&
      m.album == "The Album" && m.track == 7)
    assert(m.bitrate_kbps == 128 && m.sample_rate == 44100)
    assert(m.n_frames == 3 && m.total_samples == 3 * 1152L)
    // truncated final frame
    intercept[IllegalArgumentException](Id3.parse(payload.dropRight(1)))
    // no tag
    intercept[IllegalArgumentException](Id3.parse("MP3?".getBytes))
    // reserved bitrate index in a frame header
    val bad = payload.clone()
    // find the first frame sync and zero its bitrate nibble
    val sync = payload.indices.find(k => (payload(k) & 0xff) == 0xff &&
      k + 1 < payload.length && (payload(k + 1) & 0xff) == 0xfb).get
    bad(sync + 2) = (bad(sync + 2) & 0x0f).toByte // bitrate idx 0 = reserved
    intercept[IllegalArgumentException](Id3.parse(bad))
    // VBR (mid-stream bitrate change) refused
    val two = Id3.build(tag, 9, 0, 2)
    val second = two.length - (144 * 128000 / 44100)
    val vbr = two.clone()
    vbr(second + 2) = ((10 << 4) | 0).toByte // frame 2 at 160 kbps
    intercept[IllegalArgumentException](Id3.parse(vbr))
  }

  test("FLAC: byte-pinned constant frame against independent CRC constants") {
    import Audio.Flac
    // 4 equal samples → one CONSTANT frame. Expected frame bytes were
    // generated OUTSIDE the codec (python loops over the published
    // CRC-8 0x07 / CRC-16 0x8005 polynomial definitions), so encoder
    // and pins cannot share a bug.
    val flac = Flac.encode(16000, Array[Short](5, 5, 5, 5), blockSize = 16)
    // layout: fLaC(4) + streaminfo header(4) + body(34) = 42, frame after
    assert(flac.length == 42 + 13)
    val frame = flac.slice(42, 55).map(_ & 0xff)
    assert(frame.toSeq == Seq(0xff, 0xf8, 0x70, 0x08, 0x00, 0x00, 0x03,
      0x13, 0x00, 0x00, 0x05, 0x8e, 0xeb), frame.map(b => f"$b%02x").toSeq)
    // STREAMINFO carries the true MD5 of the unencoded PCM
    val md5Hex = flac.slice(26, 42).map(b => f"${b & 0xff}%02x").mkString
    assert(md5Hex == "7f199e1363c4b754eb03cf4d0ba8d343")
    val dec = Flac.decode(flac)
    assert(dec.sampleRate == 16000 && dec.nFrames == 1)
    assert(dec.samples.toSeq == Seq[Short](5, 5, 5, 5))
  }

  test("FLAC: round trips exactly across styles, lengths, and extremes") {
    import Audio.Flac
    val rng = new scala.util.Random(42)
    val cases = Seq(
      Array.fill(1000)((rng.nextInt(65536) - 32768).toShort), // random
      Array.tabulate(700)(i => (i * 13 % 3000 - 1500).toShort), // ramps
      Array.fill(512)(123.toShort), // all constant, multiple frames
      Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1), // extremes
      Array.tabulate(257)(i => (math.sin(i / 5.0) * 8000).toShort))
    for (s <- cases; verbatim <- Seq(false, true)) {
      val enc = Flac.encode(16000, s, blockSize = 256,
        forceVerbatim = verbatim)
      val dec = Flac.decode(enc)
      assert(dec.samples.toSeq == s.toSeq, s"len ${s.length} vb=$verbatim")
      assert(dec.nFrames == (s.length + 255) / 256)
      // fixed-predictor frames beat verbatim on the smooth signals
      if (!verbatim && s.length == 257)
        assert(enc.length < Flac.encode(16000, s, 256,
          forceVerbatim = true).length, "FIXED should compress the sine")
    }
  }

  test("FLAC: corruption and out-of-scope features fail loudly") {
    import Audio.Flac
    val s = Array.tabulate(300)(i => (i * 7 - 1000).toShort)
    val good = Flac.encode(16000, s, blockSize = 256)
    // flip a residual byte: CRC-16 (or the MD5/range check) must catch it
    val bad = good.clone()
    bad(good.length - 5) = (bad(good.length - 5) ^ 0x40).toByte
    intercept[Exception](Flac.decode(bad))
    // LPC subframe type (32..63) refuses by name: patch the constant
    // fixture's subframe header byte (offset 50, value 0x00) to type 32
    val cflac = Flac.encode(16000, Array[Short](5, 5, 5, 5), 16)
    val lpc = cflac.clone()
    lpc(50) = 0x40.toByte
    val e = intercept[IllegalArgumentException](Flac.decode(lpc))
    assert(e.getMessage.contains("LPC"))
    // truncation
    intercept[IllegalArgumentException](Flac.decode(good.take(60)))
    // not FLAC at all
    intercept[IllegalArgumentException](
      Flac.decode("RIFFdata".getBytes("US-ASCII")))
    // a wrong STREAMINFO MD5 fails the end-to-end check
    val badMd5 = cflac.clone()
    badMd5(30) = (badMd5(30) ^ 0x01).toByte
    val e2 = intercept[IllegalArgumentException](Flac.decode(badMd5))
    assert(e2.getMessage.contains("MD5"))
  }

  test("flacRoundtrip: distributed op matches directly computed aggregates") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((5L, "hello flac"), (7L, "verbatim doc body"),
      (9L, "plain fixed one")).toDF("doc_id", "text")
    val got = Audio.flacRoundtrip(docs).collect()
      .map(r => r.doc_id -> r).toMap
    // doc 5: %5==0 → 300-sample constant tail; %7!=0 → fixed frames
    val base5 = Audio.samplesOf("hello flac")
    assert(got(5L).n_samples == base5.length + 300)
    assert(got(5L).n_frames == (base5.length + 300 + 255) / 256)
    val tail5 = (5 % 120) * 257 - 16384
    assert(got(5L).sample_sum ==
      base5.map(_.toLong).sum + 300L * tail5)
    // doc 7: verbatim-forced, no tail
    val base7 = Audio.samplesOf("verbatim doc body")
    assert(got(7L).n_samples == base7.length && got(7L).n_frames == 1)
    assert(got(7L).sum_sq == base7.map(v => v.toLong * v).sum)
    assert(got(9L).peak == Audio.samplesOf("plain fixed one")
      .map(v => math.abs(v.toInt)).max)
  }
}
