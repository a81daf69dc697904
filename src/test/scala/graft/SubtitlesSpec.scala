package graft

import graft.operators.Subtitles
import org.scalatest.funsuite.AnyFunSuite

/** SRT grammar: render/parse roundtrip, \r\n and multi-line cue text,
  * hour-scale stamps, and loud failures on malformed input.
  */
class SubtitlesSpec extends AnyFunSuite {

  test("render → parse roundtrip, including hour-scale stamps") {
    val cues = Vector(
      Subtitles.Cue(0, 0, 0L, 900L, "first cue"),
      Subtitles.Cue(0, 1, 61001L, 62500L, "a minute in"),
      Subtitles.Cue(0, 2, 3600999L, 3700000L, "an hour in"))
    val back = Subtitles.parseSrt(Subtitles.renderSrt(cues))
    assert(back == cues)
  }

  test("CRLF line endings and multi-line cue text") {
    val srt = "1\r\n00:00:00,000 --> 00:00:01,000\r\nline one\r\nline two\r\n" +
      "\r\n2\r\n00:00:02,000 --> 00:00:03,500\r\nsecond\r\n"
    val cues = Subtitles.parseSrt(srt)
    assert(cues.length == 2)
    assert(cues(0).caption == "line one line two")
    assert(cues(1).start_ms == 2000L && cues(1).end_ms == 3500L)
  }

  test("malformed SRT fails loudly") {
    intercept[IllegalArgumentException](
      Subtitles.parseSrt("1\nnot a timing line\ntext\n"))
    intercept[IllegalArgumentException]( // out-of-order index
      Subtitles.parseSrt("2\n00:00:00,000 --> 00:00:01,000\nx\n"))
    intercept[IllegalArgumentException]( // end before start
      Subtitles.parseSrt("1\n00:00:05,000 --> 00:00:01,000\nx\n"))
    intercept[IllegalArgumentException]( // truncated before timing
      Subtitles.parseSrt("1"))
    intercept[IllegalArgumentException]( // 100h exceeds 2-digit hours
      Subtitles.renderSrt(Seq(
        Subtitles.Cue(0, 0, 100L * 3600000L, 100L * 3600000L + 1, "x"))))
  }

  test("alignFramesToCues: interval semantics, per-document locality") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val frames = Seq(
      (1L, 0, 0L, 100L, "f0"),
      (1L, 1, 100L, 300L, "f1"),
      (2L, 0, 0L, 100L, "g0")
    ).toDF("doc_id", "frame_idx", "f_start_ms", "f_end_ms", "rgb_md5")
    val cues = Seq(
      (1L, 0, 50L, 120L, "overlaps both"),
      (1L, 1, 100L, 101L, "only f1"),  // touches f0's END: half-open, no pair
      (2L, 0, 150L, 200L, "no frame")
    ).toDF("doc_id", "cue_idx", "start_ms", "end_ms", "caption")
    val out = Subtitles.alignFramesToCues(frames, cues).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(out == Set((1L, 0, 0), (1L, 1, 0), (1L, 1, 1)))
  }
}
