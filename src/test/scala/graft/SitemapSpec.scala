package graft

import graft.operators.Sitemap
import org.scalatest.funsuite.AnyFunSuite

/** Sitemap protocol walk: render/parse round trip, a hand-written
  * real-world urlset with namespace extensions as the second
  * implementation, sitemapindex, entity decode, refusal sweep.
  */
class SitemapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("renderUrlset → parse round-trips all four fields") {
    val entries = (0 until 5).map(i => Sitemap.entryFor(42L, i))
    Sitemap.parse(Sitemap.renderUrlset(entries)) match {
      case Sitemap.UrlSet(back) => assert(back == entries)
      case other => fail(s"unexpected $other")
    }
  }

  test("hand-written urlset with extensions and entities parses exactly") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        |        xmlns:image="http://www.google.com/schemas/sitemap-image/1.1">
        |  <url>
        |    <loc>https://ex.com/a?x=1&amp;y=2</loc>
        |    <image:image>
        |      <image:loc>https://ex.com/img.jpg</image:loc>
        |    </image:image>
        |    <lastmod>2023-11-05</lastmod>
        |  </url>
        |  <url>
        |    <priority>0.8</priority>
        |    <loc>https://ex.com/b&apos;s</loc>
        |  </url>
        |</urlset>
        |""".stripMargin
    Sitemap.parse(xml) match {
      case Sitemap.UrlSet(entries) =>
        assert(entries.size == 2)
        assert(entries(0).loc == "https://ex.com/a?x=1&y=2")
        assert(entries(0).lastmod == "2023-11-05")
        assert(entries(0).changefreq == "")
        assert(entries(1).loc == "https://ex.com/b's")
        assert(entries(1).priority == "0.8")
      case other => fail(s"unexpected $other")
    }
  }

  test("sitemapindex parses child locations in order") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://ex.com/s1.xml</loc>
        |    <lastmod>2024-01-01</lastmod></sitemap>
        |  <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemap.parse(xml) ==
      Sitemap.SitemapIndex(Seq("https://ex.com/s1.xml",
        "https://ex.com/s2.xml")))
  }

  test("malformed documents refuse loudly") {
    intercept[IllegalArgumentException] {
      Sitemap.parse("<rss><channel/></rss>")
    }
    intercept[IllegalArgumentException] {
      Sitemap.parse("<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>")
    } // no <loc>
    intercept[IllegalArgumentException] {
      Sitemap.parse("<urlset><url><loc>x</loc>")
    } // truncated
    intercept[IllegalArgumentException] {
      Sitemap.parse("<urlset><item/></urlset>")
    }
    intercept[IllegalArgumentException] {
      Sitemap.unescapeXml("bad &unknown; entity")
    }
  }

  test("asSitemapDocs → extractEntries: fixture rule end to end") {
    val docs = Seq((10L, "a b c d e f g h i"), (11L, "q"))
      .toDF("doc_id", "text")
    val out = Sitemap.extractEntries(Sitemap.asSitemapDocs(docs))
      .collect().sortBy(_.doc_id)
    assert(out(0).n_urls == 3) // 9 words / 4 per url
    assert(out(1).n_urls == 1)
    // lastmod arithmetic: day (10+i)%365 from 2024-01-01
    assert(out(0).lastmod_min == "2024-01-11")
    assert(out(0).lastmod_max == "2024-01-13")
    // priority: (0+1+2)%10 each *100 → 0+100+200
    assert(out(0).priority_milli == 300L)
    val locs = (0 until 3).map(i => s"https://w10.example.com/p$i")
      .mkString("\n")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(locs.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(0).locs_md5 == md)
  }
}
