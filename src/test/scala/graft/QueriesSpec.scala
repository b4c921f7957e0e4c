package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + semantic checks for the driver-contract query surface at
  * sf0.001. Cross-engine value equality is the driver's DuckDB gate; here
  * we assert executability, non-emptiness and key invariants.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("EVERY query has an oracle (the approximate ANN paths are md5-derived " +
    "and deterministic, so the oracle re-derives their buckets/lists)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
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

  test("ivf index: Lloyd-trained centroids beat-or-match seed recall and persist") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = SparkEntry.queries("q_ann_topk")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val trained = graft.operators.IvfIndex.train(emb, nlist = 16, lloydIters = 2)
    val ivf = graft.operators.Similarity
      .ivfTopK(emb, col("vec_id") < 8, k = 5, centroids = trained, nprobe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.2, s"trained-IVF recall $recall too low for nprobe=4/nlist=16")
    // persisted index round-trips exactly (build once, reuse per query)
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    graft.operators.IvfIndex.save(spark, path, trained)
    val loaded = graft.operators.IvfIndex.load(spark, path)
    assert(loaded.length === trained.length)
    trained.zip(loaded).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // trainOrLoad returns the SAME persisted index without retraining
    val again = graft.operators.IvfIndex.trainOrLoad(emb, 16, 2, path)
    trained.zip(again).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("q_ann_ivf_trained: Lloyd-trained driver-gate path is deterministic, " +
    "k per query, nonzero recall vs exact (value equality is the DuckDB gate)") {
    import spark.implicits._
    def rows() = SparkEntry.queries("q_ann_ivf_trained")(spark, dir)
      .select($"query_id", $"neighbor_id", $"cos", $"rank")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq
    val a = rows()
    assert(a === rows(), "trained-IVF query not deterministic across reruns")
    val byQ = a.groupBy(_._1)
    assert(byQ.size === 8 && byQ.values.forall(_.size === 5))
    val exact = SparkEntry.queries("q_ann_topk")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val overlap = a.map(r => (r._1, r._2)).toSet intersect exact
    assert(overlap.nonEmpty, "trained index found none of the true top-k")
  }

  test("ivf training is bit-deterministic: retrain == retrain (pid-ordered merge)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = graft.operators.IvfIndex.train(emb, nlist = 16, lloydIters = 2)
    val b = graft.operators.IvfIndex.train(emb, nlist = 16, lloydIters = 2)
    a.zip(b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x, y), "retraining produced different bits")
    }
  }

  test("ivf training: one-pass partial-sum means == naive driver-side Lloyd pass") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val seeds = graft.operators.Similarity.seedCentroids(emb, 8)
    val one = graft.operators.IvfIndex.train(emb, nlist = 8, lloydIters = 1)
    // naive: collect all vectors, assign, average — same ties/ordering rules
    val all = emb.select($"embedding").as[Seq[Float]].collect()
      .map(graft.operators.Similarity.toD)
    val byC = all.groupBy(v => graft.operators.Similarity.nearest(v, seeds))
    (0 until 8).foreach { c =>
      val expected = byC.get(c) match {
        case Some(vs) => Array.tabulate(64)(j => vs.map(_(j)).sum / vs.length)
        case None     => seeds(c)
      }
      one(c).zip(expected).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"centroid $c diverges: $a vs $b")
      }
    }
  }

  test("near-dup LSH variant: subset of exact all-pairs above threshold") {
    import spark.implicits._
    val lsh = SparkEntry.queries("q_embedding_neardup_lsh")(spark, dir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // unblocked exact ground truth (test-only, tiny sf)
    val exact = graft.operators.Similarity
      .nearDupPairs(emb.withColumn("label", org.apache.spark.sql.functions.lit(0)), 0.30)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "LSH near-dup found nothing")
    assert(lsh.subsetOf(exact), "LSH near-dup must never invent a pair")
  }

  test("nearDupPairs maxBlock guard fails fast on a too-coarse blocking key") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("label", lit(0)) // one giant block
    val err = intercept[IllegalArgumentException] {
      graft.operators.Similarity.nearDupPairs(emb, 0.30, maxBlock = Some(10L)).count()
    }
    assert(err.getMessage.contains("block"))
  }

  test("ANN maxQueries guards fail fast on an over-broad isQuery (r6)") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val broad = lit(true) // every row a query = corpus-sized broadcast/fan-out
    for (run <- Seq(
      () => graft.operators.Similarity
        .cosineTopK(emb, broad, k = 2, maxQueries = Some(4L)).count(),
      () => graft.operators.Similarity
        .lshTopK(emb, broad, k = 2, maxQueries = Some(4L)).count(),
      () => graft.operators.Similarity.ivfTopK(emb, broad, k = 2,
        centroids = graft.operators.Similarity.seedCentroids(emb, nlist = 4),
        maxQueries = Some(4L)).count())) {
      val err = intercept[IllegalArgumentException](run())
      assert(err.getMessage.contains("isQuery"))
    }
    // bounded predicate passes under the same cap
    assert(graft.operators.Similarity
      .cosineTopK(emb, col("vec_id") < 3, k = 2, maxQueries = Some(4L))
      .count() > 0)
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
