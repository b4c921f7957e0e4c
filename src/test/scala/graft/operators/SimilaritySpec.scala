package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case contract of [[Similarity.cosine]] (the one-pass UDF must keep
  * the old composed-Column semantics): null arrays propagate NULL, ragged
  * lengths yield NULL, equal-length values match the strict left-to-right
  * double fold bit-for-bit.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("cosine: null input array -> NULL, ragged lengths -> NULL") {
    import spark.implicits._
    val df = Seq(
      ("both", Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      ("nullA", None, Some(Seq(3.0f, 4.0f))),
      ("nullB", Some(Seq(1.0f, 2.0f)), None),
      ("ragged", Some(Seq(1.0f, 2.0f, 5.0f)), Some(Seq(3.0f, 4.0f)))
    ).toDF("k", "a", "b")
      .withColumn("cos", Similarity.cosine($"a", $"b"))
    val rows = df.select($"k", $"cos").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows("nullA").isEmpty, "null left array must yield NULL")
    assert(rows("nullB").isEmpty, "null right array must yield NULL")
    assert(rows("ragged").isEmpty, "ragged lengths must yield NULL")
    assert(rows("both").nonEmpty)
  }

  test("cosine == the composed zip_with/aggregate fold, bit-for-bit") {
    import spark.implicits._
    val vecs = (0 until 16).map { i =>
      (i.toLong, (0 until 64).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 3.0f))
    }
    val df = vecs.toDF("id", "v")
    val pairs = df.crossJoin(df.select($"id".as("id2"), $"v".as("v2")))
      .filter($"id" < $"id2")
    val composed = Similarity.dot($"v", $"v2") /
      (Similarity.norm($"v") * Similarity.norm($"v2"))
    val diffs = pairs
      .withColumn("c1", Similarity.cosine($"v", $"v2"))
      .withColumn("c2", composed)
      .filter($"c1" =!= $"c2")
      .count()
    assert(diffs === 0L, "one-pass UDF diverged from the composed fold")
  }
}
