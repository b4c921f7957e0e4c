package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class XxHash64Spec extends AnyFunSuite {

  test("known vector: empty input, seed 0") {
    assert(XxHash64.hash(Array.emptyByteArray, 0L) === 0xEF46DB3751D8E999L)
  }

  test("matches Spark's built-in xxhash64 (seed 42) on strings") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq("", "a", "abc", "http://host0.test/p/1",
      "x" * 31, "y" * 32, "z" * 33, "w" * 100,
      "unicode ✓ κόσμε 世界", "0123456789abcdef" * 8) ++
      (0 until 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(80)).mkString)
    val rows = samples.toDF("s").select($"s", xxhash64($"s").as("h")).collect()
    rows.foreach { r =>
      assert(XxHash64.hashString(r.getString(0)) === r.getLong(1),
        s"mismatch for '${r.getString(0)}'")
    }
  }
}
