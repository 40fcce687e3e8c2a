package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("url-functions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(UrlFunctions.canonicalizeUrl(col("u"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("canonicalization rules") {
    // scheme+host lowercase; default port stripped per scheme
    assert(canon("HTTP://WWW.Example.COM:80/a") === Seq("http://www.example.com/a"))
    assert(canon("https://Site.org:443/a") === Seq("https://site.org/a"))
    // :80 on https and odd ports are NOT default — kept
    assert(canon("https://site.org:80/a") === Seq("https://site.org:80/a"))
    assert(canon("http://site.org:8080/a") === Seq("http://site.org:8080/a"))
    // fragment dropped; empty path -> "/"
    assert(canon("http://a.b#frag") === Seq("http://a.b/"))
    assert(canon("http://a.b/x#frag") === Seq("http://a.b/x"))
    // query params sorted; bare "?" dropped
    assert(canon("http://a.b/x?z=1&a=2&m=3") === Seq("http://a.b/x?a=2&m=3&z=1"))
    assert(canon("http://a.b/x?") === Seq("http://a.b/x"))
    // query survives with fragment stripped after it
    assert(canon("http://a.b/x?b=2&a=1#sec") === Seq("http://a.b/x?a=1&b=2"))
    // userinfo is case-sensitive (RFC 3986) and preserved; host still folds
    assert(canon("http://User:Pw@Host.Com:80/x") === Seq("http://User:Pw@host.com/x"))
    // non-authority strings pass through untouched
    assert(canon("not a url", "mailto:x@y.z") === Seq("not a url", "mailto:x@y.z"))
  }

  test("urlKey collapses equivalent spellings, separates distinct pages") {
    import spark.implicits._
    val keys = Seq(
      "HTTP://Example.COM:80/page?b=2&a=1#top",
      "http://example.com/page?a=1&b=2",
      "http://example.com/other").toDF("u")
      .select(UrlFunctions.urlKey(col("u"))).collect().map(_.getLong(0)).toSeq
    assert(keys(0) === keys(1))
    assert(keys(0) !== keys(2))
  }

  test("stays in codegen: no UDF in the plan") {
    import spark.implicits._
    val plan = Seq("http://a.b/x").toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }
}
