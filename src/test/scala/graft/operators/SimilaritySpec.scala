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

  test("cosine: a null ELEMENT anywhere -> NULL (matches the zip_with form, " +
    "which poisons the double fold through the padded null)") {
    import spark.implicits._
    val df = Seq(
      ("clean", Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](3.0f, 4.0f)),
      ("nullElemA", Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](3.0f, 4.0f)),
      ("nullElemB", Seq[java.lang.Float](1.0f, 2.0f), Seq[java.lang.Float](null, 4.0f))
    ).toDF("k", "a", "b")
      .withColumn("cos", Similarity.cosine($"a", $"b"))
      .withColumn("composed",
        Similarity.dot($"a", $"b") / (Similarity.norm($"a") * Similarity.norm($"b")))
    val rows = df.collect().map(r => r.getString(0) ->
      (r.isNullAt(3), r.isNullAt(4))).toMap
    assert(rows("nullElemA") === ((true, true)), "null element must yield NULL in both forms")
    assert(rows("nullElemB") === ((true, true)), "null element must yield NULL in both forms")
    assert(rows("clean") === ((false, false)))
  }

  test("IVF Lloyd pre-merge level (engages above the partition threshold): " +
    "bit-deterministic run-to-run, numerically equal to the flat merge") {
    import spark.implicits._
    val emb = (0 until 200).map { i =>
      (i.toLong, (0 until IvfIndex.Dim).map(j => (((i * 37 + j * 11) % 17) - 8).toFloat / 4.0f))
    }.toDF("vec_id", "embedding").repartition(8).cache()
    emb.count()
    val flat = IvfIndex.train(emb, nlist = 4, lloydIters = 3)
    // force the pre-merge level (threshold 0) with 4 groups of ~2 partitions
    val pre1 = IvfIndex.train(emb, 4, 3, preMergeAbove = 0, groupWidth = 2)
    val pre2 = IvfIndex.train(emb, 4, 3, preMergeAbove = 0, groupWidth = 2)
    assert(pre1.map(_.toSeq).toSeq === pre2.map(_.toSeq).toSeq,
      "pre-merged training is not bit-deterministic")
    // the grouped summation topology may round differently than the flat
    // merge, but only at summation-order noise level — far inside the 6dp
    // rounding of the oracle gate
    val maxDiff = flat.zip(pre1).map { case (a, b) =>
      a.zip(b).map { case (x, y) => math.abs(x - y) }.max
    }.max
    assert(maxDiff < 1e-9, s"pre-merge diverged from flat merge by $maxDiff")
    emb.unpersist()
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
