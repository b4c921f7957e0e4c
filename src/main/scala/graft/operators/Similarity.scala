package graft.operators

import graft.util.XxHash64

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / vector-similarity operators over an
  * embedding column (`array<float>`), per the training-data-pipeline brief:
  * brute-force cosine top-k as the exactness baseline, a
  * random-hyperplane-LSH bucketed variant as the 100-TB scale path.
  *
  * All arithmetic is promoted to double and folded STRICTLY left-to-right
  * (functions.aggregate), so the oracle (DuckDB list lambdas, same order)
  * produces bit-identical doubles before the final rounding.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each query vector (filtered by `isQuery`),
    * the k nearest other vectors. One broadcast of the (small) query side;
    * the big side streams — no shuffle of the full embedding table.
    * Output: (query_id, neighbor_id, cos, rank).
    */
  def cosineTopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val queries = emb.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val pairs = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Deterministic ±1 random hyperplanes (seeded, shared across runs).
    * `table` selects an independent family for multi-table LSH.
    */
  def hyperplanes(table: Int, nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (h, j) =>
      if ((XxHash64.hashString(s"hp|$table|$h|$j") & 1L) == 0L) 1.0 else -1.0
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

  /** Multi-table LSH ANN (standard construction: L independent tables of
    * b sign bits; a pair is a candidate if it collides in ANY table). The
    * bucket key is the join/shuffle key, so candidate generation is a
    * key-equijoin, never the n² cross — the 100-TB scale path. Recall < 1
    * by design; [[cosineTopK]] is the exactness baseline. Output shape
    * matches cosineTopK.
    */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int,
              nTables: Int = 4, bitsPerTable: Int = 8): DataFrame = {
    val dim = 64
    // bucket keys via a closure over the precomputed plane matrix — as
    // Column expressions this is nTables*bits*dim literal nodes, which
    // bloats analysis/codegen far beyond the work itself
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
    val exploded = emb
      .select(col("vec_id"), col("embedding"),
        explode(bucketsUdf(col("embedding"))).as("bucket"))
    val queries = exploded.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val candPairs = exploded
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("bucket"))
      .join(queries, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      // a pair colliding in several tables appears several times: collapse
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    candPairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path: k-means
    * centroids partition the corpus into nlist inverted lists; a query
    * probes only its nprobe nearest lists, so the search is a key-equijoin
    * on list id (shuffle ∝ probed lists, never the n² compare). Training
    * is deterministic: seed centroids by xxhash64 order, a fixed number of
    * Lloyd iterations via per-dimension averages. Approximate (recall < 1);
    * [[cosineTopK]] is the exactness baseline. Output shape matches it.
    */
  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int,
              nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dim = 64

    def toD(a: Seq[Float]): Array[Double] = a.map(_.toDouble).toArray
    def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cents.length) {
        var d = 0.0; var j = 0
        val ct = cents(c)
        while (j < v.length) { val x = v(j) - ct(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    // deterministic seeding: the nlist vectors with smallest xxhash64(vec_id)
    var centroids: Array[Array[Double]] = emb
      .select($"vec_id", $"embedding")
      .withColumn("__h", xxhash64($"vec_id"))
      .orderBy($"__h", $"vec_id").limit(nlist)
      .select($"embedding").as[Seq[Float]].collect().map(toD)

    // Lloyd: assign (broadcast centroids) -> per-dimension mean per list
    for (_ <- 1 to lloydIters) {
      val cb = spark.sparkContext.broadcast(centroids)
      val assignU = udf((e: Seq[Float]) => nearest(toD(e), cb.value))
      val means = emb
        .withColumn("cid", assignU($"embedding"))
        .select($"cid", posexplode($"embedding").as(Seq("pos", "x")))
        .groupBy($"cid", $"pos").agg(avg($"x").as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
    }

    val cb = spark.sparkContext.broadcast(centroids)
    val assignU = udf((e: Seq[Float]) => nearest(toD(e), cb.value))
    val probeU = udf((e: Seq[Float]) => {
      val v = toD(e)
      cb.value.indices
        .map(c => {
          var d = 0.0; var j = 0
          while (j < v.length) { val x = v(j) - cb.value(c)(j); d += x * x; j += 1 }
          (c, d)
        })
        .sortBy(_._2).take(nprobe).map(_._1)
    })
    val lists = emb.select($"vec_id".as("neighbor_id"), $"embedding")
      .withColumn("cid", assignU($"embedding"))
    val queries = emb.filter(isQuery)
      .select($"vec_id".as("query_id"), $"embedding".as("q_emb"),
        explode(probeU($"embedding")).as("cid"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    lists.join(queries, "cid")
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("cos", cosine($"q_emb", $"embedding"))
      .groupBy($"query_id", $"neighbor_id").agg(max($"cos").as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", round($"cos", 6).as("cos"), $"rank")
  }

  /** Blocked near-duplicate pairs: same-label blocking (the label is the
    * generic stand-in for any cheap blocking key), cosine above threshold.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("label"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("label"))
    a.join(b, "label")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("label"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
