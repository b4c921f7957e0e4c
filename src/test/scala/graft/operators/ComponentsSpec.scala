package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of [[Components.connectedComponents]] (the fuzzy-dedup grouping
  * step) and [[Similarity.semanticDedup]] (SemDeDup cluster-bounded dedup):
  * explicit fixtures with hand-computed answers, partitioning invariance,
  * the loud-failure bounds.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("connectedComponents: transitive closure over an explicit fixture") {
    import spark.implicits._
    // {1,2,3} chained (1-2, 2-3: 1 and 3 never directly compared), {10,11},
    // a self-loop (20-20), and a duplicate edge (30-31 twice, reversed once)
    val edges = Seq(
      (2L, 1L), (2L, 3L), (10L, 11L), (20L, 20L), (30L, 31L), (31L, 30L)
    ).toDF("id_a", "id_b")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got === expected)
  }

  test("connectedComponents: edgesDistinct=true (dedup shuffle skipped) is " +
    "value-identical to the default path on a single-orientation " +
    "duplicate-free edge list — the LSH candidate-pair invariant") {
    import spark.implicits._
    // distinct pairs, a < b, one orientation each (nearDupPairsLsh shape):
    // chain {1,2,3}, pair {10,11}, triangle {20,21,22}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val dflt = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val fast = Components.connectedComponents(edges, edgesDistinct = true)
      .as[(Long, Long)].collect().toMap
    assert(fast === dflt)
    assert(fast === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 11L -> 10L))
  }

  test("connectedComponents: EMPTY edge list converges immediately to an " +
    "empty labeling (the null label-sum edge of the monotone convergence " +
    "test)") {
    import spark.implicits._
    val got = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(got.count() === 0L)
  }

  test("connectedComponents: long path needs diameter rounds; result " +
    "invariant across input partitioning") {
    import spark.implicits._
    // path 0-1-2-...-12 (diameter 12) plus a disjoint triangle {100,101,102}
    val path = (0L until 12L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (102L, 100L))
    val edges = (path ++ tri).toDF("id_a", "id_b")
    val expected = ((0L to 12L).map(_ -> 0L) ++ Seq(100L, 101L, 102L).map(_ -> 100L)).toMap
    for (parts <- Seq(1, 7)) {
      val got = Components.connectedComponents(edges.repartition(parts))
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"wrong labeling at $parts input partitions")
    }
  }

  test("connectedComponents: maxIters exceeded fails loudly, never returns " +
    "a half-converged labeling") {
    import spark.implicits._
    val path = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Components.connectedComponents(path, maxIters = 2)
    }
    assert(ex.getMessage.contains("no fixpoint"))
  }

  test("semanticDedup: explicit fixture matches the hand-derived dup set; " +
    "keep rule is earliest-id-wins") {
    import spark.implicits._
    // Two well-separated directions in R^4; within each, near-parallel
    // vectors (cosine ~1) plus one orthogonal outlier per cluster.
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rows = Seq(
      (1L, v(1, 0, 0, 0)),        // cluster A exemplar (smallest id)
      (2L, v(0.99, 0.01, 0, 0)),  // dup of 1
      (3L, v(0.98, -0.02, 0, 0)), // dup of 1
      (4L, v(0, 0, 0.97, 0.01)),  // cluster B exemplar
      (5L, v(0, 0, 0.99, -0.03)), // dup of 4
      (6L, v(0, 0.95, 0, 0)),     // near A centroid-wise, orthogonal to 1..3 -> kept
      (7L, v(0, 0, 0, 0.96))      // near B centroid-wise, orthogonal to 4,5 -> kept
    ).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0))
    val got = Similarity.semanticDedup(rows, centroids, threshold = 0.9)
      .select($"vec_id", $"dup_of").as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 1L, 3L -> 1L, 5L -> 4L))
  }

  test("semanticDedup: maxCluster guard fails fast on a too-coarse quantizer") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(rows, Array(Array(1.0, 0.0)),
        threshold = 0.9, maxCluster = Some(5L))
    }
    assert(ex.getMessage.contains("O(cluster"))
  }
}
