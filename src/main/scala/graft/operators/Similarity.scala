package graft.operators

import graft.functions.MinhashSignatures.md5Hex

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / vector-similarity operators over an
  * embedding column (`array<float>`), per the training-data-pipeline brief:
  * brute-force cosine top-k as the exactness baseline, a
  * random-hyperplane-LSH bucketed variant and an IVF (inverted-file)
  * coarse quantizer as the 100-TB scale paths.
  *
  * All arithmetic is promoted to double and folded STRICTLY left-to-right
  * (functions.aggregate), so the oracle (DuckDB list lambdas, same order)
  * produces bit-identical doubles before the final rounding. The LSH
  * hyperplanes and the IVF seed quantizer are derived from md5 (not
  * xxhash64) for the same reason: the oracle re-derives the exact same
  * buckets/lists in SQL, making both approximate paths hash-checkable.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with EXACTLY the fold the oracle uses: promote to double,
    * accumulate dot and both square-norms in one ascending-index pass,
    * then dot / (sqrt(na) * sqrt(nb)). Implemented as a typed UDF rather
    * than composed zip_with/aggregate Columns: the higher-order-function
    * trees are CodegenFallback and interpret a closure per element, ~an
    * order of magnitude more per-row overhead than this one JIT'd loop on
    * every ANN/near-dup hot path — while the IEEE operation sequence (and
    * therefore every output bit) is identical, which the DuckDB hash gate
    * re-proves. [[dot]]/[[norm]] remain the Column-composed spelling.
    */
  def cosine(a: Column, b: Column): Column = cosineUdf(a, b)

  /** Null-safe like the previous zip_with/aggregate Column form: a null
    * array propagates NULL, ragged lengths yield NULL (zip_with pads the
    * shorter side with null elements, which poisons the double fold to
    * null), and a null ELEMENT anywhere also yields NULL (the boxed-Float
    * signature makes element nulls observable; a primitive Seq[Float]
    * signature would NPE on unboxing instead) — a UDF that silently
    * truncated or zero-filled would change semantics for external callers.
    */
  private val cosineUdf = udf { (a: Seq[java.lang.Float], b: Seq[java.lang.Float]) =>
    if (a == null || b == null || a.length != b.length) None
    else {
      val n = a.length
      var i = 0
      var d = 0.0
      var na = 0.0
      var nb = 0.0
      var nullElem = false
      while (i < n && !nullElem) {
        val bx = a(i)
        val by = b(i)
        if ((bx eq null) || (by eq null)) nullElem = true
        else {
          val x = bx.toDouble
          val y = by.toDouble
          d += x * y
          na += x * x
          nb += y * y
        }
        i += 1
      }
      if (nullElem) None
      else Some(d / (math.sqrt(na) * math.sqrt(nb)))
    }
  }

  /** Vector norm precomputed ONCE PER ROW for the pairwise paths: the
    * per-pair cosine then folds only the dot product, cutting the flops
    * per candidate pair ~3x (r6 optimization; guide §1.2 "per-task work").
    * BIT-IDENTICAL to [[cosineUdf]]: the square-sum accumulates in the
    * same ascending-index order in its own accumulator (independent of the
    * interleaved dot in the one-pass form — IEEE addition per accumulator
    * sees the identical operand sequence), and the final expression
    * d / (nrm_a * nrm_b) is exactly d / (sqrt(na) * sqrt(nb)). The oracle
    * (DuckDB) computes norms per row in its `n` CTE the same way, so the
    * hash gate re-proves the parity. Null semantics preserved: null array
    * or null element -> null norm -> null cosine; ragged lengths -> null.
    */
  private val normUdf = udf { (a: Seq[java.lang.Float]) =>
    if (a == null) None
    else {
      var i = 0
      var na = 0.0
      var nullElem = false
      while (i < a.length && !nullElem) {
        val bx = a(i)
        if (bx eq null) nullElem = true
        else { val x = bx.toDouble; na += x * x }
        i += 1
      }
      if (nullElem) None else Some(math.sqrt(na))
    }
  }

  private[graft] def norm1(a: Column): Column = normUdf(a)

  /** PRIMITIVE-ARRAY pair kernel: `Array[Float]` deserializes as one
    * unboxed copy per call where `Seq[java.lang.Float]` boxes all 64
    * elements (measured 5x on the 200k-pair bench stage — the boxing, not
    * the flops, dominated the fused form). A primitive signature cannot
    * observe null ELEMENTS (the converter would NPE before the body runs),
    * so [[withNrm]] nulls out the whole array whenever its norm is null
    * (null array OR null element) — the kernel then sees a null array and
    * returns None, preserving the null-in -> null-out contract end to end.
    */
  private val cosinePreUdf = udf {
    (a: Array[Float], b: Array[Float],
     na: java.lang.Double, nb: java.lang.Double) =>
      if (a == null || b == null || na == null || nb == null ||
          a.length != b.length) None
      else {
        var i = 0
        var d = 0.0
        while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
        Some(d / (na * nb))
      }
  }

  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    cosinePreUdf(a, b, na, nb)

  /** Adds the once-per-row `nrm` column and replaces `embedding` with NULL
    * when the norm is null, so every downstream pair kernel can take
    * primitive arrays (see [[cosinePreUdf]]). Valid rows are untouched.
    */
  private def withNrm(df: DataFrame): DataFrame =
    df.withColumn("nrm", normUdf(col("embedding")))
      .withColumn("embedding", when(col("nrm").isNotNull, col("embedding")))

  /** Fail-fast cardinality guard for the broadcast-query ANN paths (the
    * [[nearDupPairs]] `maxBlock` / [[semanticDedup]] `maxCluster` mirror):
    * an over-broad `isQuery` would silently build a corpus-sized broadcast
    * (cosineTopK) or a corpus x corpus candidate join (lshTopK/ivfTopK).
    */
  private def requireQueryBound(op: String, emb: DataFrame, isQuery: Column,
                                maxQueries: Option[Long]): Unit =
    maxQueries.foreach { cap =>
      val nq = emb.filter(isQuery).count()
      require(nq <= cap,
        s"$op: isQuery selects $nq rows > cap $cap — the query side is " +
          "broadcast/fanned out per probe; narrow the predicate or raise the cap")
    }

  /** Exact cosine top-k: for each query vector (filtered by `isQuery`),
    * the k nearest other vectors. One broadcast of the (small) query side;
    * the big side streams — no shuffle of the full embedding table.
    * Output: (query_id, neighbor_id, cos, rank).
    */
  def cosineTopK(emb: DataFrame, isQuery: Column, k: Int,
                 maxQueries: Option[Long] = None): DataFrame = {
    requireQueryBound("cosineTopK", emb, isQuery, maxQueries)
    val embN = withNrm(emb.select(col("vec_id"), col("embedding")))
    val queries = embN.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val pairs = embN.select(col("vec_id").as("neighbor_id"), col("embedding"), col("nrm"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosinePre(col("q_emb"), col("embedding"),
        col("q_nrm"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic ±1 random hyperplanes, derived from md5 so the DuckDB
    * oracle re-derives the identical family in SQL (first hex digit of
    * md5("hp|table|bit|dim") < '8' → +1). `table` selects an independent
    * family for multi-table LSH.
    */
  def hyperplanes(table: Int, nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (h, j) =>
      if (md5Hex(s"hp|$table|$h|$j").charAt(0) < '8') 1.0 else -1.0
    }

  /** Sign-bit LSH bucket key: bit h = (emb · hyperplane_h >= 0). Vectors in
    * the same bucket are near-duplicate candidates; at scale the bucket key
    * is the shuffle key, so candidate generation never does the n² compare.
    */
  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val planeCol = array(p.map(lit): _*)
      when(dot(emb, planeCol) >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** All (vec_id, embedding, bucket) rows across `nTables` sign-bit LSH
    * tables — bucket = "t|bits". One UDF closure over the plane matrix
    * (as Column expressions this would be nTables*bits*dim literal nodes,
    * bloating analysis far beyond the work itself). Dot products fold in
    * ascending dim order (double), matching the oracle's list_sum.
    */
  private def lshExplode(emb: DataFrame, nTables: Int, bitsPerTable: Int,
                         dim: Int): DataFrame = {
    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(nTables)(t => hyperplanes(t, bitsPerTable, dim))
    val bucketsUdf = udf { (e: Seq[Float]) =>
      val v = e.toArray
      (0 until nTables).map { t =>
        val sb = new StringBuilder(s"$t|")
        planes(t).foreach { p =>
          var s = 0.0
          var j = 0
          while (j < v.length && j < p.length) { s += v(j) * p(j); j += 1 }
          sb.append(if (s >= 0) '1' else '0')
        }
        sb.toString
      }
    }
    emb.select(col("vec_id"), col("embedding"),
      explode(bucketsUdf(col("embedding"))).as("bucket"))
  }

  /** Multi-table LSH ANN (standard construction: L independent tables of
    * b sign bits; a pair is a candidate if it collides in ANY table). The
    * bucket key is the join/shuffle key, so candidate generation is a
    * key-equijoin, never the n² cross — the 100-TB scale path. Recall < 1
    * by design; [[cosineTopK]] is the exactness baseline — but the output
    * itself is DETERMINISTIC and oracle-checkable (md5-derived planes).
    * Output shape matches cosineTopK.
    */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int,
              nTables: Int = 4, bitsPerTable: Int = 8,
              maxQueries: Option[Long] = None): DataFrame = {
    requireQueryBound("lshTopK", emb, isQuery, maxQueries)
    // r6 shape (guide §8): the bucket self-join carries IDS ONLY — the
    // 64-float embeddings never ride the collision shuffle — and the
    // distinct collapses multi-table collisions BEFORE the cosine, so each
    // candidate pair pays exactly one dot product (was: one per colliding
    // table, then max() over identical values).
    val exploded = lshExplode(emb, nTables, bitsPerTable, dim = 64)
    val qb = exploded.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("bucket"))
    val cand = exploded.select(col("vec_id").as("neighbor_id"), col("bucket"))
      .join(qb, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id")).distinct()
    val embN = withNrm(emb.select(col("vec_id"), col("embedding")))
    val scored = cand
      .join(embN.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm")), "query_id")
      .join(embN.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm")), "neighbor_id")
      .withColumn("cos", cosinePre(col("q_emb"), col("n_emb"),
        col("q_nrm"), col("n_nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  private[graft] def toD(a: Seq[Float]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i).toDouble; i += 1 }
    out
  }

  /** Squared L2, fixed ascending-dim fold (oracle-parity order). */
  private[graft] def sqDist(v: Array[Double], c: Array[Double]): Double = {
    var d = 0.0
    var j = 0
    while (j < v.length) { val x = v(j) - c(j); d += x * x; j += 1 }
    d
  }

  /** Argmin centroid, ties to the LOWEST cid (== ORDER BY d, cid LIMIT 1). */
  private[graft] def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val d = sqDist(v, cents(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic oracle-rederivable coarse quantizer: the `nlist` vectors
    * with the smallest (md5(vec_id), vec_id) become centroids 0..nlist-1 in
    * that order. One tiny collect (nlist × dim doubles). The trained
    * (Lloyd-refined) quantizer lives in [[IvfIndex]]; this seeding is the
    * SQL-expressible baseline the driver gate checks.
    */
  def seedCentroids(emb: DataFrame, nlist: Int): Array[Array[Double]] = {
    import emb.sparkSession.implicits._
    emb.select($"vec_id", $"embedding")
      .withColumn("__h", md5($"vec_id".cast("string")))
      .orderBy($"__h", $"vec_id").limit(nlist)
      .select($"embedding").as[Seq[Float]].collect().map(toD)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: centroids
    * partition the corpus into nlist inverted lists; a query probes only
    * its nprobe nearest lists, so the search is a key-equijoin on list id
    * (shuffle ∝ probed lists, never the n² compare). The quantizer is an
    * argument: [[seedCentroids]] for the deterministic oracle-checkable
    * form, [[IvfIndex.train]] for the Lloyd-refined reusable index.
    * Output shape matches cosineTopK.
    */
  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int,
              centroids: Array[Array[Double]], nprobe: Int = 4,
              maxQueries: Option[Long] = None): DataFrame = {
    requireQueryBound("ivfTopK", emb, isQuery, maxQueries)
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(centroids)
    val assignU = udf((e: Seq[Float]) => nearest(toD(e), cb.value))
    val probeU = udf((e: Seq[Float]) => {
      val v = toD(e)
      cb.value.indices
        .map(c => (c, sqDist(v, cb.value(c))))
        .sortBy(_._2).take(nprobe).map(_._1) // stable sort: ties keep low cid
    })
    val lists = withNrm(emb.select($"vec_id".as("neighbor_id"), $"embedding")
      .withColumn("cid", assignU($"embedding")))
    val queries = withNrm(emb.filter(isQuery).select($"vec_id", $"embedding"))
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        $"nrm".as("q_nrm"), explode(probeU($"embedding")).as("cid"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    lists.join(queries, "cid")
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("cos", cosinePre($"q_emb", $"embedding", $"q_nrm", $"nrm"))
      .groupBy($"query_id", $"neighbor_id").agg(max($"cos").as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", round($"cos", 6).as("cos"), $"rank")
  }

  /** Blocked near-duplicate pairs: same-label blocking (the label is the
    * generic stand-in for any cheap blocking key), cosine above threshold.
    * EXACT within a block, O(block²) across it — the exactness baseline.
    * At scale use [[nearDupPairsLsh]], or pass `maxBlock` to fail fast if
    * the blocking key is too coarse for the quadratic to be safe.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double,
                   maxBlock: Option[Long] = None): DataFrame = {
    maxBlock.foreach { cap =>
      val biggest = emb.groupBy(col("label")).count()
        .agg(max(col("count"))).head.getLong(0)
      require(biggest <= cap,
        s"nearDupPairs: largest block has $biggest rows > cap $cap — " +
          "O(block²) unsafe; use nearDupPairsLsh or a finer blocking key")
    }
    val embN = withNrm(emb.select(col("vec_id"), col("embedding"), col("label")))
    val a = embN.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"), col("label"))
    val b = embN.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
      col("nrm").as("nrm_b"), col("label"))
    a.join(b, "label")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosinePre(col("emb_a"), col("emb_b"),
        col("nrm_a"), col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus with a coarse quantizer, then compare ONLY within
    * each cluster and mark members whose cosine to another member reaches
    * `threshold` as semantic duplicates. The cluster key is the shuffle key
    * and bounds the quadratic — k is chosen so clusters stay small, which
    * is the paper's own scale argument; `maxCluster` fails fast if the
    * quantizer is too coarse for that to hold.
    *
    * Keep rule (deterministic, matching the repo's first-wins conventions):
    * members are ordered by vec_id within a cluster; a member is a DUP if
    * any EARLIER member is within `threshold`, and `dup_of` is the smallest
    * such id. Output: one row per duplicate — (cid, vec_id, dup_of); rows
    * absent from the output are the kept exemplars. With [[seedCentroids]]
    * the whole operator is oracle-rederivable in SQL; pass
    * [[IvfIndex.train]] centroids for the Lloyd-refined production form.
    */
  def semanticDedup(emb: DataFrame, centroids: Array[Array[Double]],
                    threshold: Double, maxCluster: Option[Long] = None): DataFrame = {
    val spark = emb.sparkSession
    val cb = spark.sparkContext.broadcast(centroids)
    val assignU = udf((e: Seq[Float]) => nearest(toD(e), cb.value))
    val assigned = emb.select(col("vec_id"), col("embedding"))
      .withColumn("cid", assignU(col("embedding")).cast("long"))
    maxCluster.foreach { cap =>
      val biggest = assigned.groupBy(col("cid")).count()
        .agg(max(col("count"))).head.getLong(0)
      require(biggest <= cap,
        s"semanticDedup: largest cluster has $biggest rows > cap $cap — " +
          "O(cluster²) unsafe; raise nlist on the quantizer")
    }
    val assignedN = withNrm(assigned)
    val a = assignedN.select(col("cid"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = assignedN.select(col("cid"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, "cid")
      .filter(col("id_a") < col("id_b"))
      .filter(cosinePre(col("emb_a"), col("emb_b"),
        col("nrm_a"), col("nrm_b")) >= threshold)
      .groupBy(col("cid"), col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("dup_of"))
      .select(col("cid"), col("vec_id"), col("dup_of"))
  }

  /** Scale-safe near-duplicate pairs: candidates come from LSH bucket
    * collisions (ANY of nTables sign-bit tables), so the shuffle key is the
    * bucket and no block ever goes quadratic in the full corpus. Recall < 1
    * vs [[nearDupPairs]] by design, but the output is deterministic and
    * oracle-checkable (md5-derived planes). Output: (id_a, id_b, cos).
    */
  def nearDupPairsLsh(emb: DataFrame, threshold: Double,
                      nTables: Int = 4, bitsPerTable: Int = 8): DataFrame = {
    // r6 shape (guide §8): ids only through the bucket self-join, distinct
    // pairs BEFORE the cosine — multi-table collisions used to pay one
    // cosine per table and collapse via max() over identical values; now
    // each candidate pair pays exactly one dot product and the heavy
    // embedding arrays move once, keyed by id, not per collision.
    val exploded = lshExplode(emb, nTables, bitsPerTable, dim = 64)
      .select(col("vec_id"), col("bucket"))
    val cand = exploded.select(col("vec_id").as("id_a"), col("bucket"))
      .join(exploded.select(col("vec_id").as("id_b"), col("bucket")), "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val embN = withNrm(emb.select(col("vec_id"), col("embedding")))
    cand
      .join(embN.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(embN.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("nrm").as("nrm_b")), "id_b")
      .withColumn("cos", cosinePre(col("emb_a"), col("emb_b"),
        col("nrm_a"), col("nrm_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
