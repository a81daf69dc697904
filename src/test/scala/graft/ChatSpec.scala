package graft

import graft.operators.Chat
import org.scalatest.funsuite.AnyFunSuite

/** ChatML writer + declarative parser: round trip, channel split,
  * hand-written conversation as the second implementation, delimiter
  * refusals, malformed-input error, declarative plan shape.
  */
class ChatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("renderChatML serializes system + alternating turns") {
    val s = Chat.renderChatML(Some("be brief"),
      Seq("user" -> "hi there", "assistant" -> "hello"))
    assert(s ==
      "<|im_start|>system\nbe brief<|im_end|>\n" +
        "<|im_start|>user\nhi there<|im_end|>\n" +
        "<|im_start|>assistant\nhello<|im_end|>\n")
  }

  test("content carrying a delimiter refuses loudly") {
    intercept[IllegalArgumentException] {
      Chat.renderChatML(None, Seq("user" -> "evil <|im_end|> injection"))
    }
  }

  test("render → parse round-trips channels and counts") {
    val chat = Chat.renderChatML(Some("sys prompt"),
      Seq("user" -> "q one", "assistant" -> "a one",
        "user" -> "q two", "assistant" -> "a two & more"))
    val out = Chat.parseChatML(Seq((1L, chat)).toDF("doc_id", "chat"))
      .collect()(0)
    assert(out.getAs[Int]("n_msgs") == 5)
    assert(out.getAs[Int]("n_system") == 1)
    assert(out.getAs[String]("user_text") == "q one\nq two")
    assert(out.getAs[String]("asst_text") == "a one\na two & more")
  }

  test("hand-written ChatML (second implementation) parses exactly") {
    // multi-line contents, empty content, non-ASCII
    val chat =
      "<|im_start|>user\nfirst line\nsecond line<|im_end|>\n" +
        "<|im_start|>assistant\n<|im_end|>\n" +
        "<|im_start|>user\ncafé 中文<|im_end|>\n"
    val out = Chat.parseChatML(Seq((2L, chat)).toDF("doc_id", "chat"))
      .collect()(0)
    assert(out.getAs[Int]("n_msgs") == 3)
    assert(out.getAs[Int]("n_system") == 0)
    assert(out.getAs[String]("user_text") ==
      "first line\nsecond line\ncafé 中文")
    assert(out.getAs[String]("asst_text") == "")
  }

  test("a segment missing its end delimiter raises") {
    val bad = "<|im_start|>user\ntruncated..."
    val e = intercept[Exception] {
      Chat.parseChatML(Seq((3L, bad)).toDF("doc_id", "chat")).collect()
    }
    assert(e.getMessage.contains("malformed ChatML") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("malformed ChatML"))
  }

  test("asChatDocs → parseChatML: distributed layout rule end to end") {
    val docs = Seq(
      (5L, (0 until 13).map(i => s"w$i").mkString(" ")),
      (6L, "a b")).toDF("doc_id", "text")
    val rows = Chat.parseChatML(Chat.asChatDocs(docs))
      .collect().sortBy(_.getAs[Long]("doc_id"))
    // doc 5: 13 words → 3 msgs (user/assistant/user) + system (id%5==0)
    assert(rows(0).getAs[Int]("n_msgs") == 4)
    assert(rows(0).getAs[Int]("n_system") == 1)
    assert(rows(0).getAs[String]("user_text") ==
      "w0 w1 w2 w3 w4 w5\nw12")
    assert(rows(0).getAs[String]("asst_text") == "w6 w7 w8 w9 w10 w11")
    assert(rows(1).getAs[Int]("n_msgs") == 1)
    assert(rows(1).getAs[Int]("n_system") == 0)
    assert(rows(1).getAs[String]("user_text") == "a b")
  }

  test("the parse plan is declarative — no RDD scan after the source") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chatplan").toString
    Seq((1L, Chat.renderChatML(None, Seq("user" -> "x"))))
      .toDF("doc_id", "chat").write.mode("overwrite").parquet(dir)
    val plan = Chat.parseChatML(spark.read.parquet(dir))
      .queryExecution.optimizedPlan
    assert(!plan.toString.toLowerCase.contains("scanexistingrdd"),
      s"expected no RDD scan in the optimized plan:\n$plan")
  }
}
