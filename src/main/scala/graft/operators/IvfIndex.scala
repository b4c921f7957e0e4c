package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reusable IVF coarse-quantizer index: Lloyd-refined k-means centroids,
  * trained in one job per iteration over a cached projection and PERSISTED
  * (tiny parquet of nlist rows), so the index builds once and every query
  * against the corpus reuses it — an index is corpus state, not per-query
  * work.
  *
  * Each Lloyd pass assigns every vector to its nearest centroid INSIDE a
  * mapPartitions and accumulates per-centroid vector sums + counts in one
  * flat double buffer per PARTITION (map-side combine: the cluster never
  * shuffles n×dim rows), then the tiny (partition_id, buffer) rows are
  * merged on the driver in ASCENDING partition order. Double addition is
  * non-associative, so the fixed merge order makes retraining
  * BIT-DETERMINISTIC for a given input file layout — an arbitrary-order
  * partial-buffer merge (the previous udaf form) could yield bitwise-
  * different centroids run to run. Determinism: md5-ordered seeding
  * ([[Similarity.seedCentroids]]) + fixed iteration count (empty lists keep
  * their previous centroid) + pid-ordered merge.
  *
  * DRIVER-MERGE BOUND (DESIGN.md §IVF): the per-iteration collect moves
  * one `nlist × (Dim+1) × 8`-byte buffer per non-empty partition — ~8 KB
  * at nlist=16/Dim=64, ~2 MB at nlist=4096 — so the flat driver merge is
  * fine to ~10^4 partitions (≲ tens of GB/iter at the extreme, typically
  * far less; a 100-TB corpus trains its quantizer on a SAMPLE, not the
  * full table, so partition counts stay modest). Past
  * [[preMergePartitions]] one deterministic PRE-MERGE level engages:
  * partials group by `pid / G` (fixed [[preMergeGroup]]), each group
  * reduces in ascending-pid order DISTRIBUTED, then the ≤numParts/G group
  * sums merge ascending on the driver — a fixed summation topology
  * (function of partition count alone, never task timing), therefore
  * still bit-deterministic run-to-run, at the cost of bits differing from
  * the flat-merge spelling (the oracle gate rounds to 6dp, and the
  * threshold keeps the flat path exact at test scale).
  */
object IvfIndex {
  val Dim = 64

  /** Above this many input partitions the per-iteration merge inserts the
    * distributed pre-merge level (see object doc).
    */
  val preMergePartitions: Int = 1 << 12
  /** Pre-merge group width: partials with `pid / G` equal reduce together
    * distributed; the driver merges only the group sums.
    */
  val preMergeGroup: Int = 1 << 10

  /** Lloyd k-means: seed deterministically, then `lloydIters` one-job
    * refinement passes over a cached (embedding-only) projection.
    * `preMergeAbove` is a test seam defaulting to [[preMergePartitions]].
    */
  def train(emb: DataFrame, nlist: Int, lloydIters: Int,
            preMergeAbove: Int = preMergePartitions,
            groupWidth: Int = preMergeGroup): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var centroids = Similarity.seedCentroids(emb, nlist)
    if (lloydIters == 0) return centroids
    val width = Dim + 1
    val proj = emb.select($"embedding").as[Seq[Float]].cache()
    val numParts = proj.rdd.getNumPartitions
    try {
      for (_ <- 1 to lloydIters) {
        val cents = centroids
        // one job: per-partition partial sums (nlist × (dim+1) doubles each)
        val partialsDs = proj.mapPartitions { it =>
          val buf = new Array[Double](cents.length * width)
          var any = false
          it.foreach { e =>
            any = true
            val v = Similarity.toD(e)
            val off = Similarity.nearest(v, cents) * width
            var j = 0
            while (j < Dim && j < v.length) { buf(off + j) += v(j); j += 1 }
            buf(off + Dim) += 1.0
          }
          if (any)
            Iterator.single((org.apache.spark.TaskContext.getPartitionId(), buf))
          else Iterator.empty
        }
        val partials: Array[(Int, Array[Double])] =
          if (numParts <= preMergeAbove) partialsDs.collect()
          else {
            // distributed pre-merge: ascending-pid reduce per pid/G group,
            // then only the group sums reach the driver. Secondary sort
            // (repartition by group, sort by (group, pid) within the
            // reduce partition) delivers each group's buffers contiguous
            // and pid-ascending, so the fold STREAMS — one incoming buffer
            // + one accumulator resident, never the whole group (G buffers
            // ≈ G × nlist × (Dim+1) × 8 B would OOM a task at the scale
            // this level exists for). Summation order is identical to the
            // materialize-and-sort spelling: bit-deterministic.
            val g = math.max(1, groupWidth)
            val bufLen = cents.length * width
            val sc = spark.sparkContext
            val nGroups = numParts / g + 1
            val hp = new org.apache.spark.HashPartitioner(
              math.max(1, math.min(nGroups, sc.defaultParallelism)))
            val byGroup = new org.apache.spark.Partitioner {
              def numPartitions: Int = hp.numPartitions
              def getPartition(key: Any): Int =
                hp.getPartition(key.asInstanceOf[(Int, Int)]._1)
            }
            partialsDs.rdd
              .map { case (pid, b) => ((pid / g, pid), b) }
              .repartitionAndSortWithinPartitions(byGroup)
              .mapPartitions { it =>
                val base = it.buffered
                new Iterator[(Int, Array[Double])] {
                  def hasNext: Boolean = base.hasNext
                  def next(): (Int, Array[Double]) = {
                    val grp = base.head._1._1
                    val acc = new Array[Double](bufLen)
                    while (base.hasNext && base.head._1._1 == grp) {
                      val b = base.next()._2
                      var i = 0
                      while (i < acc.length) { acc(i) += b(i); i += 1 }
                    }
                    (grp, acc)
                  }
                }
              }.collect()
          }
        // ascending-key merge: deterministic rounding regardless of task
        // completion order (buffers are tiny — ~nlist·dim doubles each)
        val sums = new Array[Double](cents.length * width)
        partials.sortBy(_._1).foreach { case (_, b) =>
          var i = 0
          while (i < sums.length) { sums(i) += b(i); i += 1 }
        }
        centroids = Array.tabulate(cents.length) { c =>
          val off = c * width
          val n = sums(off + Dim)
          if (n == 0.0) cents(c) // empty list keeps its centroid
          else Array.tabulate(Dim)(j => sums(off + j) / n)
        }
      }
      centroids
    } finally proj.unpersist()
  }

  /** Persist centroids as a tiny parquet (cid, vector). */
  def save(spark: SparkSession, path: String, centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq
      .toDF("cid", "vector").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(path).orderBy($"cid")
      .select($"vector").as[Seq[Double]].collect().map(_.toArray)
  }

  /** Build-once semantics: load the persisted index if present, else train
    * and persist it.
    */
  def trainOrLoad(emb: DataFrame, nlist: Int, lloydIters: Int,
                  path: String): Array[Array[Double]] = {
    val spark = emb.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) load(spark, path)
    else {
      val c = train(emb, nlist, lloydIters)
      save(spark, path, c)
      c
    }
  }
}
