package graft

import graft.operators.PublicSuffix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Public-suffix algorithm vectors (the publicsuffix.org test-file
  * cases for the rule kinds we model), default-rule behavior,
  * suffix-only hosts, and the broadcast plan shape.
  */
class PublicSuffixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val rules = PublicSuffix.ruleTable(spark,
    Seq("com", "uk", "co.uk", "github.io", "*.ck", "!www.ck", "jp",
      "ac.jp"))

  private def reg(hosts: String*): Map[String, String] = {
    val df = hosts.toDF("host")
    PublicSuffix.registrableDomains(df, "host", rules)
      .collect()
      .map(r => r.getAs[String]("host") -> r.getAs[String]("reg_domain"))
      .toMap
  }

  test("normal rules: longest match wins") {
    val m = reg("example.com", "a.b.example.com", "example.co.uk",
      "deep.example.co.uk", "site.ac.jp")
    assert(m("example.com") == "example.com")
    assert(m("a.b.example.com") == "example.com")
    assert(m("example.co.uk") == "example.co.uk") // co.uk beats uk
    assert(m("deep.example.co.uk") == "example.co.uk")
    assert(m("site.ac.jp") == "site.ac.jp")
  }

  test("private-registry rules split sibling owners") {
    val m = reg("alice.github.io", "x.alice.github.io", "bob.github.io")
    assert(m("alice.github.io") == "alice.github.io")
    assert(m("x.alice.github.io") == "alice.github.io")
    assert(m("bob.github.io") == "bob.github.io")
  }

  test("wildcard and exception rules (the PSL *.ck cases)") {
    val m = reg("foo.ck", "a.foo.ck", "b.a.foo.ck", "www.ck", "w.www.ck")
    assert(m("foo.ck") == null) // foo.ck IS a public suffix under *.ck
    assert(m("a.foo.ck") == "a.foo.ck")
    assert(m("b.a.foo.ck") == "a.foo.ck")
    assert(m("www.ck") == "www.ck") // the exception rule
    assert(m("w.www.ck") == "www.ck")
  }

  test("default rule * for unlisted suffixes; bare suffixes are null") {
    val m = reg("example.zz", "a.example.zz", "zz", "com", "co.uk",
      "localhost")
    assert(m("example.zz") == "example.zz")
    assert(m("a.example.zz") == "example.zz")
    assert(m("zz") == null)
    assert(m("com") == null)
    assert(m("co.uk") == null)
    assert(m("localhost") == null)
  }

  test("case-insensitive; original rows and columns survive the join") {
    val df = Seq((1L, "A.Example.COM", "x"), (2L, "b.example.com", "y"))
      .toDF("id", "host", "payload")
    val out = PublicSuffix.registrableDomains(df, "host", rules)
      .collect().sortBy(_.getAs[Long]("id"))
    assert(out(0).getAs[String]("reg_domain") == "example.com")
    assert(out(0).getAs[String]("payload") == "x")
    assert(out(1).getAs[String]("reg_domain") == "example.com")
  }

  test("the rules join broadcasts; no cartesian anywhere") {
    val df = Seq("a.example.com").toDF("host")
    val plan = PublicSuffix.registrableDomains(df, "host", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin") == false)
    assert(!plan.toLowerCase.contains("cartesian"),
      s"cartesian in plan:\n$plan")
  }

  test("malformed rules refuse loudly") {
    intercept[IllegalArgumentException] {
      PublicSuffix.ruleTable(spark, Seq("bad rule"))
    }
    intercept[IllegalArgumentException] {
      PublicSuffix.ruleTable(spark, Seq(""))
    }
  }
}
