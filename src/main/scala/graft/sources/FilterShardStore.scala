package graft.sources

import graft.operators.{BloomShard, CuckooFilter, UrlSeenFilter}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy per-task seen-filter shard distribution — the 10^10-scale leg of
  * BASELINE.json's north_star ("two-level Bloom sharding so membership
  * tests never shuffle the full seen-set") that a single driver broadcast
  * cannot carry: at 10^10 URLs the merged filter is ~12 GB (DESIGN.md),
  * far past sane broadcast size. Here the filter NEVER exists as one
  * object anywhere:
  *
  *  - shard files live in shared storage next to the snapshot store
  *    (`<root>/base-v<k>/shard-<i>.bin`, `<root>/delta-w<wave>/shard-<i>.bin`),
  *    written DISTRIBUTED (each task builds + writes the shards its
  *    partition holds; temp-file + rename so retries/speculation are safe);
  *  - probe tasks lazily load ONLY the shards their rows touch, through a
  *    per-executor generation-keyed cache ([[FilterShardStore.probe]]);
  *    probe rows are repartitioned by shard first, so a task touches ~1
  *    shard and the executor working set is its task's shards, not the set;
  *  - per-wave deltas accumulate; a DISTRIBUTED compaction (one task per
  *    shard) merges base+deltas into a new base generation once the delta
  *    chain passes a threshold, bounding per-probe file count.
  *
  * Bloom shard merge is bitwise OR (order-free, so lazy-merged content is
  * bit-identical to the broadcast path); cuckoo merge is fingerprint
  * reinsertion (membership-equivalent; the engine's exact anti-join makes
  * FP-set differences invisible in output — CrawlEquivalenceSpec asserts
  * bit-equal crawls in this mode).
  *
  * All IO goes through the Hadoop FileSystem API, so the same code runs on
  * file:// (sandbox), HDFS or S3A.
  */
final class FilterShardStore(
    val root: String,
    val numShards: Int,
    val kind: String, // "bloom" | "cuckoo"
    val bloomBytes: Int,
    val bloomHashes: Int,
    val cuckooBuckets: Int,
    /** the SESSION'S Hadoop configuration, serialized to executors — S3A
      * credentials / fs.* settings survive; defaults to a bare conf for
      * driver-only local-fs use (tests).
      */
    val hconf: graft.util.SerializableHadoopConf =
      new graft.util.SerializableHadoopConf(new Configuration()))
    extends Serializable {
  require(kind == "bloom" || kind == "cuckoo", s"unsupported filter kind '$kind'")

  def baseDir(v: Int): String = s"$root/base-v$v"
  def deltaDir(wave: Int): String = s"$root/delta-w$wave"
  private def shardFile(dir: String, shard: Int): String = s"$dir/shard-$shard.bin"

  private def fs(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), hconf.value)

  /** Attempt-unique tmp suffix: thread ids collide ACROSS executor JVMs
    * (retried/speculative attempts on shared storage could interleave writes
    * into one tmp path and publish a corrupt shard) — use the cluster-unique
    * task attempt id, falling back to a UUID off-task (driver-side tests).
    */
  private def attemptTag(): String = Option(org.apache.spark.TaskContext.get())
    .map(tc => s"a${tc.taskAttemptId()}")
    .getOrElse("u" + java.util.UUID.randomUUID().toString.take(8))

  private[sources] def writeFile(dir: String, shard: Int, bytes: Array[Byte]): Unit = {
    val f = fs(dir)
    val tmp = new Path(s"$dir/.tmp-shard-$shard-${attemptTag()}")
    val dst = new Path(shardFile(dir, shard))
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    f.delete(dst, false) // rename-overwrite portability (raw local fs)
    if (!f.rename(tmp, dst)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"rename failed for $dst")
    }
  }

  private def readFile(path: String): Option[Array[Byte]] = {
    val f = fs(path)
    val p = new Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val len = f.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(buf)
        Some(buf)
      } finally in.close()
    }
  }

  private def buildBytes(urls: Iterator[String]): Array[Byte] = kind match {
    case "bloom" =>
      val buf = new Array[Byte](bloomBytes)
      urls.foreach(u => BloomShard.setBits(buf, bloomHashes, u))
      buf
    case _ =>
      val f = new CuckooFilter(cuckooBuckets)
      urls.foreach(f.insert)
      f.serialize()
  }

  private def mergeBytes(base: Option[Array[Byte]],
                         deltas: Seq[Array[Byte]]): Option[Array[Byte]] = kind match {
    case "bloom" =>
      val all = base.toSeq ++ deltas
      if (all.isEmpty) None
      else Some(all.reduce { (a, b) =>
        val out = new Array[Byte](a.length)
        var i = 0
        while (i < a.length) { out(i) = (a(i) | b(i)).toByte; i += 1 }
        out
      })
    case _ =>
      val all = base.toSeq ++ deltas
      if (all.isEmpty) None
      else {
        val f = CuckooFilter.deserialize(all.head)
        all.tail.foreach(d => f.mergeFrom(CuckooFilter.deserialize(d)))
        Some(f.serialize())
      }
  }

  private def filterOf(bytes: Array[Byte]): UrlSeenFilter = kind match {
    case "bloom" => new BloomShard(bytes, bloomHashes)
    case _       => CuckooFilter.deserialize(bytes)
  }

  /** Merged filter bytes for one shard at a generation (base OR deltas). */
  private[sources] def mergedBytes(gen: FilterGen, shard: Int): Option[Array[Byte]] = {
    val base = readFile(shardFile(baseDir(gen.baseVersion), shard))
    val deltas = gen.deltaWaves.flatMap(w => readFile(shardFile(deltaDir(w), shard)))
    mergeBytes(base, deltas)
  }

  /** DISTRIBUTED shard-file write: repartition by shard, each task streams
    * its (sorted) rows shard-by-shard, builds the filter bytes and writes
    * one file per shard it holds. The driver touches zero filter bytes.
    * `df` needs columns (canonical_url, shard).
    */
  def writeShardFiles(df: DataFrame, dir: String): Unit = {
    val store = this
    df.select(col("canonical_url").cast("string"), col("shard").cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        var curShard = -1
        val urls = scala.collection.mutable.ArrayBuffer.empty[String]
        def flush(): Unit = if (curShard >= 0 && urls.nonEmpty) {
          store.writeFile(dir, curShard, store.buildBytes(urls.iterator))
          urls.clear()
        }
        rows.foreach { r =>
          val s = r.getInt(1)
          if (s != curShard) { flush(); curShard = s }
          urls += r.getString(0)
        }
        flush()
      }
  }

  /** DISTRIBUTED compaction: one task per shard merges base-v<k> + all
    * delta files into base-v<k+1>. Old generations are NOT deleted here —
    * a cache-evicted probe of the in-flight wave may still re-read them;
    * [[cleanupBelow]] reclaims them once the run moves past the generation.
    */
  def compact(spark: SparkSession, gen: FilterGen): FilterGen = {
    val store = this
    val newV = gen.baseVersion + 1
    val g = gen
    spark.range(numShards).repartition(numShards)
      .foreachPartition { (it: Iterator[java.lang.Long]) =>
        it.foreach { s =>
          val shard = s.toInt
          store.mergedBytes(g, shard)
            .foreach(b => store.writeFile(store.baseDir(newV), shard, b))
        }
      }
    FilterGen(newV, Vector.empty)
  }

  /** Delete base generations below `keepVersion` and all delta dirs whose
    * wave is not in `liveWaves`. Call only when no probe can reference them.
    */
  def cleanupBelow(keepVersion: Int, liveWaves: Set[Int]): Unit = {
    val f = fs(root)
    val rp = new Path(root)
    if (!f.exists(rp)) return
    f.listStatus(rp).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("base-v")) {
        val v = name.stripPrefix("base-v").toInt
        if (v < keepVersion) f.delete(st.getPath, true)
      } else if (name.startsWith("delta-w")) {
        val w = name.stripPrefix("delta-w").toInt
        if (!liveWaves.contains(w)) f.delete(st.getPath, true)
      }
    }
  }

  /** Next unused base version under this root (fresh rebuilds on resume). */
  def nextBaseVersion(): Int = {
    val f = fs(root)
    val rp = new Path(root)
    if (!f.exists(rp)) 0
    else {
      val vs = f.listStatus(rp).map(_.getPath.getName)
        .filter(_.startsWith("base-v")).map(_.stripPrefix("base-v").toInt)
      if (vs.isEmpty) 0 else vs.max + 1
    }
  }
}

/** A filter generation: which base + which delta waves compose the current
  * seen-filter. Probe cache entries are keyed by this, so a generation bump
  * atomically invalidates stale executor-side filters.
  */
case class FilterGen(baseVersion: Int, deltaWaves: Vector[Int]) {
  def key: String = s"v$baseVersion|${deltaWaves.mkString(",")}"
}

object FilterShardStore {
  /** Executor-local shard cache: (root, shard) -> (generation key, filter).
    * A task's rows are shard-aligned by the probe repartition, so an
    * executor holds the few shards its tasks touch — never the whole set.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (String, UrlSeenFilter)]

  /** Shard-file loads performed by this JVM — test/observability hook. */
  val shardLoads = new java.util.concurrent.atomic.AtomicLong

  /** Largest number of distinct shards ever resident for one root. */
  def residentShards(root: String): Int = {
    var n = 0
    cache.forEach((k, _) => if (k._1 == root) n += 1)
    n
  }

  def probe(store: FilterShardStore, gen: FilterGen,
            url: String, hostHash: Long): Boolean = {
    val shard = java.lang.Math.floorMod(hostHash, store.numShards.toLong).toInt
    val k = (store.root, shard)
    var e = cache.get(k)
    if (e == null || e._1 != gen.key) {
      val filt = store.mergedBytes(gen, shard) match {
        case Some(b) =>
          shardLoads.incrementAndGet()
          store.filterOf(b)
        case None => EmptyFilter // shard has no seen rows yet
      }
      e = (gen.key, filt)
      cache.put(k, e)
    }
    e._2.mightContain(url)
  }

  private object EmptyFilter extends UrlSeenFilter {
    override def mightContain(url: String): Boolean = false
    override def approxBits: Long = 0L
  }
}
