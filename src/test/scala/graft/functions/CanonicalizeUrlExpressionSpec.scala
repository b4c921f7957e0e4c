package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class CanonicalizeUrlExpressionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val messy = Seq(
    "HTTP://Host0.TEST:80/a/../%70/7#x",
    "https://h.test:443/x?b=2&a=1",
    "http://h.test",
    "http://host3.test/./p/9")

  test("native expression equals the pure-Scala canonicalizer (codegen path)") {
    import spark.implicits._
    val got = messy.toDF("u")
      .select($"u", CanonicalizeUrl.canonicalize_url($"u").as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    messy.foreach(u => assert(got(u) === CanonicalUrl.canonicalize(u)))
  }

  test("null-safe and SQL-registrable") {
    import spark.implicits._
    CanonicalizeUrl.register(spark)
    val viaSql = spark.sql(
      "SELECT canonicalize_url('HTTP://H.TEST:80/a/../b#f') AS c, " +
        "canonicalize_url(CAST(NULL AS STRING)) AS n")
      .collect().head
    assert(viaSql.getString(0) === "http://h.test/b")
    assert(viaSql.isNullAt(1))
    // interpreted (non-codegen) path via eval on a literal-typed frame
    val one = Seq(Tuple1("HTTP://H.TEST/x/../y")).toDF("u")
      .select(CanonicalizeUrl.canonicalize_url($"u")).head.getString(0)
    assert(one === "http://h.test/y")
  }

  test("rejects non-string input at analysis time") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(CanonicalizeUrl.canonicalize_url($"i")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
