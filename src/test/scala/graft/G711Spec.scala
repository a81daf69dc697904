package graft

import graft.operators.Audio
import graft.operators.Audio.G711
import org.scalatest.funsuite.AnyFunSuite

/** G.711 companders and the integer cepstral path: JDK javax.sound
  * cross-validation (both laws, full 16-bit sweep), quantization laws,
  * ilog16 properties, and the distributed cepstra against a local
  * recomputation from the mel energies.
  */
class G711Spec extends AnyFunSuite {

  private def jdkCodes(samples: Array[Short],
                       enc: javax.sound.sampled.AudioFormat.Encoding): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val src = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      16000f, 16, 1, 2, 16000f, false)
    val dst = new AudioFormat(enc, 16000f, 8, 1, 1, 16000f, false)
    assert(AudioSystem.isConversionSupported(dst, src))
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), src, samples.length.toLong)
    AudioSystem.getAudioInputStream(dst, in).readAllBytes()
  }

  // The JDK codec reproduces Sun's historical 16-bit WRAPAROUND quirks
  // outside these ranges (+BIAS overflow maps +32636..+32767 to 0xFF and
  // -32768..-32636 to negative-zero codes; the A-law negative fold
  // |x|-8 underflows for x in -7..-1, mapping -1 to -248). Our encoder
  // follows the g711.c reference arithmetic (clip at 32635; -x-1 13-bit
  // fold), so the cross-validation sweeps the ranges where the two
  // conventions provably coincide and pins the divergent edges with
  // g711.c landmarks in the laws test below.
  private def sweep(lo: Int, hi: Int): Array[Short] = {
    val b = Array.newBuilder[Short]
    var v = lo
    while (v <= hi) { b += v.toShort; v += 97 }
    b += hi.toShort
    b.result()
  }

  test("ulaw encode matches the JDK's ULAW converter on [-32635, 32635]") {
    val s0 = sweep(-32635, 32635)
    val jdk = jdkCodes(s0, javax.sound.sampled.AudioFormat.Encoding.ULAW)
    s0.zipWithIndex.foreach { case (s, i) =>
      assert(G711.ulawEncode(s.toInt) == (jdk(i) & 0xff),
        s"ulaw($s): ours=${G711.ulawEncode(s.toInt)} jdk=${jdk(i) & 0xff}")
    }
  }

  test("alaw encode matches the JDK's ALAW converter on [0, 32767]") {
    val s0 = sweep(0, 32767)
    val jdk = jdkCodes(s0, javax.sound.sampled.AudioFormat.Encoding.ALAW)
    s0.zipWithIndex.foreach { case (s, i) =>
      assert(G711.alawEncode(s.toInt) == (jdk(i) & 0xff),
        s"alaw($s): ours=${G711.alawEncode(s.toInt)} jdk=${jdk(i) & 0xff}")
    }
  }

  test("quantization laws: idempotence, sign symmetry, error bounds") {
    var v = -32768
    while (v <= 32767) {
      val uq = G711.ulawDecode(G711.ulawEncode(v))
      val aq = G711.alawDecode(G711.alawEncode(v))
      // idempotence: re-encoding a reconstruction level is a fixed point
      assert(G711.ulawDecode(G711.ulawEncode(uq)) == uq, s"ulaw idem $v")
      assert(G711.alawDecode(G711.alawEncode(aq)) == aq, s"alaw idem $v")
      // error bounds: segment width / 2 (µ-law worst at top segment:
      // step 1024 → |err| ≤ 512 inside the clip range; A-law step 256
      // at 13 bits → ≤ 128... both plus clip loss at the extremes)
      if (math.abs(v) <= 32635)
        assert(math.abs(uq - v) <= 512, s"ulaw err $v -> $uq")
      else assert(math.abs(uq - v) <= 644, s"ulaw clip err $v -> $uq")
      assert(math.abs(aq - v) <= 520, s"alaw err $v -> $aq")
      v += 13
    }
    // landmark values (G.711 tables / g711.c)
    assert(G711.ulawEncode(0) == 0xff && G711.ulawDecode(0xff) == 0)
    assert(G711.ulawDecode(0x7f) == 0)
    assert(G711.alawEncode(0) == 0xd5 && G711.alawDecode(0xd5) == 8)
    // g711.c edges where the JDK's wraparound quirks diverge: the
    // reference clips, never wraps
    assert(G711.ulawEncode(32767) == 0x80 && G711.ulawEncode(32636) == 0x80)
    assert(G711.ulawEncode(-32768) == 0x00 && G711.ulawEncode(-32636) == 0x00)
    assert(G711.alawEncode(-1) == 0x55)   // smallest negative -> level -8
    assert(G711.alawDecode(G711.alawEncode(-1)) == -8)
    // code monotonicity within the positive µ-law half: decode of
    // descending codes 0xFF..0x80 is nondecreasing
    val levels = (0x80 to 0xff).reverse.map(G711.ulawDecode)
    assert(levels == levels.sorted, "ulaw positive levels not monotonic")
  }

  test("ilog16: zero, exactness at powers of two, monotonic") {
    assert(Audio.ilog16(0L) == 0L)
    assert(Audio.ilog16(1L) == 16L)     // bitlen 1, x=16
    assert(Audio.ilog16(2L) == 32L)
    assert(Audio.ilog16(3L) == 40L)     // bitlen 2, x=24 -> 32+8
    assert(Audio.ilog16(1L << 40) == 41L * 16)
    var prev = -1L
    for (e <- Seq(0L, 1L, 2L, 3L, 5L, 16L, 17L, 31L, 32L, 1000L, 12345678L,
      (1L << 59) + 7)) {
      val l = Audio.ilog16(e)
      assert(l >= prev, s"ilog16 not monotonic at $e")
      prev = l
    }
  }

  test("resampleCepstra agrees with mel energies → ilog16 → CepDct") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((1L, "cepstra need a reasonably long text " * 4),
      (2L, "x")).toDF("doc_id", "text")
    val media = Audio.asAudio(docs)
    val mel = Audio.resampleMelEnergies(media, 3, 2).collect()
      .groupBy(r => (r.doc_id, r.frame_idx))
    val cep = Audio.resampleCepstra(media, 3, 2).collect()
    assert(cep.nonEmpty)
    cep.foreach { c =>
      val bands = mel((c.doc_id, c.frame_idx)).sortBy(_.band)
        .map(b => Audio.ilog16(b.energy))
      val expect = (0 until Audio.CepCoefs).map { q =>
        (0 until 8).map(k => Audio.CepDct(q)(k) * bands(k)).sum
      }
      assert(Seq(c.c0, c.c1, c.c2, c.c3) == expect,
        s"cepstra mismatch at (${c.doc_id}, ${c.frame_idx})")
    }
  }

  test("g711Compand: distributed digests match a local replay") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((7L, "telephony band")).toDF("doc_id", "text")
    val row = Audio.g711Compand(Audio.asAudio(docs)).collect().head
    val samples = Audio.samplesOf("telephony band")
    val uhex = samples.map(s => f"${G711.ulawEncode(s.toInt)}%02x").mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(row.ulaw_md5 ==
      md.digest(uhex.getBytes("US-ASCII")).map(b => f"$b%02x").mkString)
    assert(row.ulaw_dec_sum ==
      samples.map(s => G711.ulawDecode(G711.ulawEncode(s.toInt)).toLong).sum)
    assert(row.alaw_dec_sum ==
      samples.map(s => G711.alawDecode(G711.alawEncode(s.toInt)).toLong).sum)
    assert(row.n_samples == samples.length)
  }

  test("ImaAdpcm: roundtrip tracks the signal within step-table bounds") {
    import graft.operators.Audio.ImaAdpcm
    val r = new scala.util.Random(3)
    // a smooth-ish signal the adaptive quantizer can track
    val smooth = Array.tabulate[Short](700)(i =>
      (8000 * math.sin(i / 25.0) + r.nextInt(200) - 100).toShort)
    val back = ImaAdpcm.decode(ImaAdpcm.encode(smooth), smooth.length)
    assert(back.length == smooth.length)
    // block headers are raw: sample 0 of each 65-block is EXACT
    (0 until smooth.length by 65).foreach(i => assert(back(i) == smooth(i)))
    // tracking error: after the per-block cold start (index resets to
    // 0), the quantizer locks on; bound the mean absolute error
    val mae = smooth.indices.map(i => math.abs(back(i) - smooth(i))).sum /
      smooth.length.toDouble
    assert(mae < 900, s"mean abs error $mae too large")
  }

  test("ImaAdpcm: blocks decode independently (the seek property)") {
    import graft.operators.Audio.ImaAdpcm
    val r = new scala.util.Random(9)
    val s = Array.fill[Short](65 * 3 + 17)((r.nextInt(65536) - 32768).toShort)
    val code = ImaAdpcm.encode(s)
    val full = ImaAdpcm.decode(code, s.length)
    // decoding only the second block's bytes yields the same 65 samples
    val blockBytes = 4 + 32
    val second = ImaAdpcm.decode(
      java.util.Arrays.copyOfRange(code, blockBytes, 2 * blockBytes), 65)
    assert(second.toSeq == full.slice(65, 130).toSeq)
    // truncation fails loudly
    intercept[IllegalArgumentException](
      ImaAdpcm.decode(code.dropRight(1), s.length))
  }

  test("adpcmRoundtrip: distributed digests match a local replay") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.operators.Audio.ImaAdpcm
    val docs = Seq((11L, "adaptive delta pulse code modulation check"))
      .toDF("doc_id", "text")
    val row = Audio.adpcmRoundtrip(Audio.asAudio(docs)).collect().head
    val samples = Audio.samplesOf("adaptive delta pulse code modulation check")
    val code = ImaAdpcm.encode(samples)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexs = code.map(b => f"${b & 0xff}%02x").mkString
    assert(row.adpcm_md5 ==
      md.digest(hexs.getBytes("US-ASCII")).map(b => f"$b%02x").mkString)
    val back = ImaAdpcm.decode(code, samples.length)
    assert(row.dec_sum == back.map(_.toLong).sum)
    assert(row.n_samples == samples.length)
    assert(row.n_blocks == (samples.length + 64) / 65)
  }
}
