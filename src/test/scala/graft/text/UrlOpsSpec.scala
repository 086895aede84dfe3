package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def e(host: String): Option[String] = {
    val r = Seq(host).toDF("h")
      .select(UrlOps.etld1(col("h")).as("d")).collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("eTLD+1: multi-label ccTLD suffixes (co.uk class) pinned") {
    assert(e("www.example.co.uk") === Some("example.co.uk"))
    assert(e("example.co.uk") === Some("example.co.uk"))
    assert(e("deep.sub.x.org.uk") === Some("x.org.uk"))
    // single-label suffix: one label past the TLD
    assert(e("a.b.example.com") === Some("example.com"))
    assert(e("example.com") === Some("example.com"))
    // unknown TLD treated as single-label suffix
    assert(e("foo.xyz123") === Some("foo.xyz123"))
  }

  test("eTLD+1: private registries and bare-suffix hosts") {
    // github.io is a PRIVATE suffix: every user site is its own domain
    assert(e("user.github.io") === Some("user.github.io"))
    assert(e("cdn.user.github.io") === Some("user.github.io"))
    // a bare suffix has no registrable domain
    assert(e("github.io") === None)
    assert(e("co.uk") === None)
    assert(e("com") === None)
    assert(e("localhost") === None)
  }

  test("host(): scheme/userinfo/port/path stripped, case folded") {
    val r = Seq("https://User@WWW.Example.CO.UK:8443/p?q=1#frag")
      .toDF("u").select(UrlOps.host(col("u")).as("h")).collect().head
    assert(r.getString(0) === "www.example.co.uk")
    val plain = Seq("http://Example.COM/doc/3").toDF("u")
      .select(UrlOps.host(col("u")).as("h")).collect().head
    assert(plain.getString(0) === "example.com")
  }

  test("derivation is one narrow projection — no shuffle") {
    val df = spark.range(100)
      .select(concat(lit("https://w"), col("id"), lit(".example.co.uk/p"))
        .as("u"))
      .select(UrlOps.etld1(UrlOps.host(col("u"))).as("d"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(df.distinct().collect().map(_.getString(0)).toSeq ===
      Seq("example.co.uk"))
  }
}
