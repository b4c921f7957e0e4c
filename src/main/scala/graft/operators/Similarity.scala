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
