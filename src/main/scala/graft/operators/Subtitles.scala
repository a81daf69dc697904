package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SubRip (.srt) subtitle parsing and time alignment — the caption
  * side of a video-text training pipeline: cues parsed from the
  * public SRT grammar (index line, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
  * timing line, text lines, blank-line separators), then
  * interval-aligned to sampled frames by timestamp overlap. Together
  * with [[Gif.sampleGifFrames]] (whose GCE delays give each frame a
  * real time span) this is the frame↔caption pairing step, end to end
  * on real containers.
  */
object Subtitles {

  final case class Cue(doc_id: Long, cue_idx: Int, start_ms: Long,
                       end_ms: Long, caption: String)

  private val Timing =
    """(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})""".r

  private def ms(h: String, m: String, s: String, mm: String): Long =
    h.toLong * 3600000L + m.toLong * 60000L + s.toLong * 1000L + mm.toLong

  /** Parse one SRT document into cues. Tolerates \r\n, multi-line cue
    * text (joined with a single space), and a missing trailing blank
    * line; throws on malformed timing lines or out-of-order indices —
    * a corrupt subtitle file must fail loudly.
    */
  def parseSrt(srt: String): Vector[Cue] = parseSrt(0L, srt)

  def parseSrt(docId: Long, srt: String): Vector[Cue] = {
    val lines = srt.replace("\r\n", "\n").split("\n", -1)
    val out = Vector.newBuilder[Cue]
    var i = 0
    var expectIdx = 1
    while (i < lines.length) {
      if (lines(i).trim.isEmpty) i += 1
      else {
        val idx = try lines(i).trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"SRT cue index expected at line $i, got '${lines(i)}'")
        }
        require(idx == expectIdx,
          s"SRT cue index $idx out of order (expected $expectIdx)")
        require(i + 1 < lines.length, "SRT truncated before timing line")
        val (s0, e0) = lines(i + 1).trim match {
          case Timing(h1, m1, s1, x1, h2, m2, s2, x2) =>
            (ms(h1, m1, s1, x1), ms(h2, m2, s2, x2))
          case other => throw new IllegalArgumentException(
            s"bad SRT timing line '$other'")
        }
        require(e0 > s0, s"SRT cue $idx ends ($e0) before it starts ($s0)")
        var j = i + 2
        val text = new StringBuilder
        while (j < lines.length && lines(j).trim.nonEmpty) {
          if (text.nonEmpty) text.append(' ')
          text.append(lines(j).trim)
          j += 1
        }
        out += Cue(docId, expectIdx - 1, s0, e0, text.toString)
        expectIdx += 1
        i = j
      }
    }
    out.result()
  }

  /** Render cues back to canonical SRT text (the write side). Stamps
    * are the grammar's fixed two-digit hour field, so cues at or past
    * 100 hours are refused rather than rendered unparseable by the
    * paired [[parseSrt]].
    */
  def renderSrt(cues: Seq[Cue]): String = {
    def stamp(t: Long): String = {
      require(t >= 0 && t < 100L * 3600000L,
        s"SRT timestamp $t ms outside the 2-digit-hour grammar")
      f"${t / 3600000}%02d:${t / 60000 % 60}%02d:${t / 1000 % 60}%02d,${t % 1000}%03d"
    }
    cues.zipWithIndex.map { case (c, i) =>
      s"${i + 1}\n${stamp(c.start_ms)} --> ${stamp(c.end_ms)}\n${c.caption}\n"
    }.mkString("\n")
  }

  /** Parse a corpus of SRT documents (idCol, srtCol) into cue rows —
    * one narrow mapPartitions pass.
    */
  def parseCues(docs: DataFrame, idCol: String = "doc_id",
                srtCol: String = "srt"): Dataset[Cue] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), coalesce(col(srtCol), lit("")))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, srt) => parseSrt(id, srt) })
  }

  /** Align sampled frames to cues by TIME OVERLAP: a frame spanning
    * [f_start, f_end) pairs with every cue whose [start, end) interval
    * intersects it. Frames and cues are both per-document local, so
    * the join is an equi join on doc_id with an interval residual —
    * never a cartesian across documents.
    */
  def alignFramesToCues(frames: DataFrame, cues: DataFrame): DataFrame =
    frames.join(cues, Seq("doc_id"))
      .filter(col("f_start_ms") < col("end_ms") &&
        col("start_ms") < col("f_end_ms"))
      .select(col("doc_id"), col("frame_idx"), col("cue_idx"),
        col("f_start_ms"), col("f_end_ms"), col("caption"),
        col("rgb_md5"))
}
