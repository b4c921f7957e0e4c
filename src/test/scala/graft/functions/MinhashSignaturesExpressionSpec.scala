package graft.functions

import graft.operators.TextOps

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MinhashSignaturesExpressionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one two three",            // exactly k tokens
    "one two",                  // fewer than k -> whole text is the shingle
    "single",                   //
    "",                         // empty: whole (empty) text is the shingle
    "a  b   c d",               // multi-space runs drop empty tokens
    " leading and trailing ",   //
    "repeat repeat repeat repeat repeat",
    "scan merge join filter sort window stream batch query")

  test("expression == composed TextOps Column pipeline, slot for slot") {
    import spark.implicits._
    val df = docs.zipWithIndex.map(_.swap).toDF("id", "text")
    val viaOps = df
      .withColumn("ts", TextOps.tokens($"text"))
      .withColumn("sh", TextOps.shingles($"ts", $"text", 3))
      .select($"id" +: (0 until 8).map(i => TextOps.minhash($"sh", i).as(s"o$i")): _*)
    val viaExpr = df.select(
      $"id" +: (0 until 8).map(i =>
        element_at(MinhashSignatures.minhash_signatures($"text", 8, 3), i + 1)
          .as(s"e$i")): _*)
    val o = viaOps.collect().map(r => r.getInt(0) -> (1 to 8).map(r.getString)).toMap
    val e = viaExpr.collect().map(r => r.getInt(0) -> (1 to 8).map(r.getString)).toMap
    docs.indices.foreach(i => assert(e(i) === o(i), s"doc $i: '${docs(i)}'"))
  }

  test("md5 slot semantics match Spark's own md5 function") {
    import spark.implicits._
    // a <k-token doc has exactly one shingle (the raw text), so slot i must
    // equal md5('i|' + text) verbatim
    val r = Seq(Tuple1("two tokens")).toDF("text")
      .select(
        MinhashSignatures.minhash_signatures($"text", 8, 3).as("mhs"),
        md5(concat(lit("0|"), $"text")).as("m0"),
        md5(concat(lit("7|"), $"text")).as("m7"))
      .head
    val arr = r.getSeq[String](0)
    assert(arr.size === 8)
    assert(arr(0) === r.getString(1))
    assert(arr(7) === r.getString(2))
  }

  test("null-safe, SQL-registrable, non-string rejected") {
    import spark.implicits._
    MinhashSignatures.register(spark)
    val viaSql = spark.sql(
      "SELECT size(minhash_signatures('a b c d')) AS n, " +
        "minhash_signatures(CAST(NULL AS STRING)) AS nn").head
    assert(viaSql.getInt(0) === 8)
    assert(viaSql.isNullAt(1))
    val err = intercept[Exception] {
      Seq(1).toDF("i").select(MinhashSignatures.minhash_signatures($"i")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("plan quality: signature projection stays inside whole-stage codegen") {
    import spark.implicits._
    val df = spark.range(100)
      .select($"id", concat(lit("tok"), $"id", lit(" a b c d")).as("text"))
      .select($"id", MinhashSignatures.minhash_signatures($"text").as("mhs"))
    // `*(n)` prefixes mark WholeStageCodegen spans in the compact plan form
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
    assert(df.count() === 100)
  }
}
