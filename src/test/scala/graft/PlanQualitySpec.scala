package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the declarative plans must actually get the
  * optimizations the scale design assumes — filters reaching the parquet
  * scan, column pruning, broadcast joins for small dims, no accidental
  * cartesian products. (`explain` output is the contract surface here.)
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filter pushdown: segment predicate reaches the customer parquet scan") {
    val plan = planOf("q_anti_join")
    assert(plan.contains("PushedFilters"), "no pushed filters section in scan")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter not pushed to parquet:\n$plan")
  }

  test("column pruning: token count reads only (doc_id, text)") {
    val plan = planOf("q_token_count")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"documents scan not pruned to 2 columns:\n$plan")
  }

  test("broadcast joins: small dims broadcast in the join+agg pipeline") {
    val plan = planOf("q_join_agg")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("anti/semi joins planned as joins, not subquery re-evaluation") {
    assert(planOf("q_anti_join").contains("LeftAnti"))
    assert(planOf("q_semi_join").contains("LeftSemi"))
  }

  test("sort+limit compiles to TakeOrderedAndProject (top-k, no full sort)") {
    val plan = planOf("q_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"), s"full sort instead of top-k:\n$plan")
  }

  test("whole-stage codegen present in the scalar-heavy text queries") {
    // note: projections built on higher-order functions (filter/transform
    // with lambdas) are CodegenFallback by Spark design — the surrounding
    // stages (scan, aggregation) must still be generated ("*(n)" marker)
    for (q <- Seq("q_token_count", "q_quality", "q_minhash_sig", "q_url_canonicalize")) {
      val plan = planOf(q)
      assert(plan.contains("*("), s"$q has no whole-stage-codegen stage at all:\n$plan")
    }
  }

  test("native canonicalize_url expression appears in the plan (no UDF wrapper)") {
    val plan = planOf("q_url_canonicalize")
    assert(plan.contains("canonicalize_url"), s"expression not inlined:\n$plan")
    assert(!plan.contains("UDF("), s"UDF wrapper leaked into plan:\n$plan")
  }

  test("cosine top-k broadcasts the query side, not the corpus") {
    val plan = planOf("q_ann_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
  }

  test("approximate ANN + near-dup are KEY equijoins, never cartesian") {
    for (q <- Seq("q_ann_lsh", "q_ann_ivf", "q_ann_ivf_trained",
      "q_embedding_neardup_lsh")) {
      val plan = planOf(q)
      assert(!plan.contains("CartesianProduct"),
        s"$q degenerated to a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to a nested-loop join:\n$plan")
      assert(plan.contains("bucket") || plan.contains("cid"),
        s"$q does not join on the bucket/list key:\n$plan")
    }
  }

  test("passage dedup carries no window on the passage key (hot-passage de-skew, r6)") {
    val plan = planOf("q_passage_dedup")
    assert(!plan.contains("Window"),
      s"q_passage_dedup regained a window (hot-key skew risk):\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_count") ||
      plan.contains("HashAggregate"),
      s"q_passage_dedup lost its partial-aggregatable shape:\n$plan")
  }

  test("first-occurrence dedup is a hash agg, not a sorted window (r6)") {
    val plan = planOf("q_first_dedup")
    assert(!plan.contains("Window"),
      s"q_first_dedup regained a sort window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"q_first_dedup is not an aggregate:\n$plan")
  }

  test("simhash is per-row: no exchange in the plan (r6)") {
    val plan = planOf("q_simhash")
    assert(!plan.contains("Exchange"),
      s"q_simhash shuffles again (explode+groupBy shape came back):\n$plan")
  }

  test("jaccard joins candidate pairs to shingle SETS (no exploded-shingle blowup)") {
    val plan = planOf("q_jaccard")
    assert(plan.contains("array_intersect"),
      s"jaccard no longer per-pair set intersection:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
