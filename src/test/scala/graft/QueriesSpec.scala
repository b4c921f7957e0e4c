package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic checks for the driver-contract query surface at
  * sf0.001. Cross-engine value equality is the driver's DuckDB gate; here
  * we assert executability, non-emptiness and key invariants.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query has an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("q_ann_lsh", "q_ann_ivf"), // approximate by design
      s"queries without oracle SQL: $noOracle")
    val danglingOracle = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(danglingOracle.isEmpty)
  }

  test("all queries execute at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns a non-empty crawl trace") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet === Set("wave", "seq", "host", "canonical_url"))
  }

  test("topk per group: never more than 3 per user, rn dense from 1") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_topk_per_group")(spark, dir)
      .select($"user_id", $"rn").as[(Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= 3, s"user $u has ${rs.length} rows")
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length.toLong))
    }
  }

  test("anti ∪ semi == all orders; anti ∩ semi == ∅") {
    val anti = SparkEntry.queries("q_anti_join")(spark, dir)
    val semi = SparkEntry.queries("q_semi_join")(spark, dir)
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(anti.count() + semi.count() === total)
    assert(anti.intersect(semi).count() === 0)
  }

  test("lsh candidate pairs are a superset-quality proxy: jaccard computed for each") {
    val pairs = SparkEntry.queries("q_lsh_pairs")(spark, dir).count()
    val jac = SparkEntry.queries("q_jaccard")(spark, dir).count()
    assert(pairs === jac, "every LSH candidate pair must get a jaccard score")
  }

  test("ann exact topk: 5 neighbors per query, cosine within [-1, 1], descending") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_ann_topk")(spark, dir)
      .select($"query_id", $"cos", $"rank").as[(Long, Double, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size === 8)
    byQ.foreach { case (_, rs) =>
      assert(rs.length === 5)
      assert(rs.forall(r => r._2 >= -1.0001 && r._2 <= 1.0001))
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._2).sliding(2).forall(p => p.head >= p.last - 1e-9))
    }
  }

  test("ann lsh: returns candidates and respects k; recall vs exact is nonzero") {
    import spark.implicits._
    val exact = SparkEntry.queries("q_ann_topk")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SparkEntry.queries("q_ann_lsh")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty, "LSH ANN returned nothing — buckets too selective")
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.0, "LSH found none of the true top-k")
  }

  test("ann ivf: returns k neighbors per query with decent recall vs exact") {
    import spark.implicits._
    val exact = SparkEntry.queries("q_ann_topk")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SparkEntry.queries("q_ann_ivf")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.2, s"IVF recall $recall too low for nprobe=4/nlist=16")
  }

  test("simhash: near-identical token multisets collide, disjoint ones differ") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (2L, "alpha bravo charlie delta echo foxtrot golf hotel"), // identical
      (3L, "zulu yankee xray whiskey victor uniform tango sierra")
    ).toDF("doc_id", "text")
    val toks = df.select($"doc_id", explode(graft.operators.TextOps.tokens($"text")).as("t"))
    val sums = graft.operators.TextOps.simhashBitSums($"t")
    val sig = toks.groupBy($"doc_id").agg(sums.head, sums.tail: _*)
      .select($"doc_id", graft.operators.TextOps.simhashFromSums(
        (0 until 16).map(j => col(s"s$j"))).as("sh"))
      .as[(Long, String)].collect().toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }
}
