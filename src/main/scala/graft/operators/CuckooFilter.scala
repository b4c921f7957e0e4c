package graft.operators

import graft.util.XxHash64

import java.nio.charset.StandardCharsets

/** Cuckoo filter (public construction, Fan et al. 2014, "Cuckoo Filter:
  * Practically Better Than Bloom"): the deletion-safe URL-seen variant
  * demanded by BASELINE.json north_star ("cuckoo-filter fallback for
  * deletion-safe dedup" — re-crawl / expiry scenarios where seen entries
  * must be removable, which a bloom filter cannot do).
  *
  *  - 16-bit fingerprints, 4 slots per bucket, partial-key cuckoo hashing:
  *    i2 = i1 XOR hash(fingerprint), so either bucket is derivable from the
  *    other plus the stored fingerprint.
  *  - bounded eviction chain (maxKicks) with a small overflow stash so
  *    inserts never silently fail below ~0.95 load.
  *  - DETERMINISTIC eviction (slot = kicks % 4, no RNG) — same insert
  *    sequence always yields the same table, keeping engine runs replayable.
  *
  * Same no-false-negative contract as the bloom: `mightContain == false`
  * means definitely not present (for items actually inserted and not
  * deleted). Deletes must only be issued for inserted items (standard
  * cuckoo-filter caveat).
  */
final class CuckooFilter(val numBucketsPow2: Int, maxKicks: Int = 500)
    extends UrlSeenFilter {
  require((numBucketsPow2 & (numBucketsPow2 - 1)) == 0 && numBucketsPow2 > 0,
    "numBuckets must be a power of two")

  private val SlotsPerBucket = 4
  private val StashBound = 64
  private val table = new Array[Short](numBucketsPow2 * SlotsPerBucket)
  private val stash = scala.collection.mutable.ArrayBuffer.empty[(Int, Short)]
  private var count = 0L
  // inserts that landed in the stash PAST its bound — an undersized or
  // host-hash-skewed shard degrades the probe to O(stash); surface it
  // (warn once + counter) instead of a silent latency cliff.
  private var overflows = 0L
  private var warned = false

  @inline private def mask: Int = numBucketsPow2 - 1

  private def fingerprint(s: String): Short = {
    val h = XxHash64.hash(s.getBytes(StandardCharsets.UTF_8), 0x0F17E5EEDL)
    val fp = (h & 0xFFFF).toInt
    (if (fp == 0) 1 else fp).toShort // 0 marks an empty slot
  }

  private def bucket1(s: String): Int =
    (XxHash64.hash(s.getBytes(StandardCharsets.UTF_8), 0xB0C4E7L) & mask).toInt

  private def altBucket(i: Int, fp: Short): Int =
    (i ^ XxHash64.hash(Array((fp & 0xFF).toByte, ((fp >> 8) & 0xFF).toByte), 0xA17FL).toInt) & mask

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b * SlotsPerBucket + s) == 0) {
        table(b * SlotsPerBucket + s) = fp
        return true
      }
      s += 1
    }
    false
  }

  private def bucketContains(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b * SlotsPerBucket + s) == fp) return true
      s += 1
    }
    false
  }

  private def removeFrom(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(b * SlotsPerBucket + s) == fp) {
        table(b * SlotsPerBucket + s) = 0
        return true
      }
      s += 1
    }
    false
  }

  /** Insert; returns false only if the filter is catastrophically full
    * (eviction chain exhausted AND stash over its bound).
    */
  def insert(s: String): Boolean = {
    val fp = fingerprint(s)
    insertFp(bucket1(s), fp)
  }

  /** Insert a raw (bucket, fingerprint) pair — the partial-key property
    * makes this sufficient to MERGE two filters (a stored pair fully
    * determines both candidate buckets), which is what the distributed
    * Aggregator build path uses.
    */
  def insertFp(i1: Int, fp: Short): Boolean = {
    val i2 = altBucket(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) { count += 1; return true }
    // deterministic eviction chain
    var b = i1
    var f = fp
    var kicks = 0
    while (kicks < maxKicks) {
      val slot = b * SlotsPerBucket + (kicks % SlotsPerBucket)
      val evicted = table(slot)
      table(slot) = f
      f = evicted
      b = altBucket(b, f)
      if (tryInsertAt(b, f)) { count += 1; return true }
      kicks += 1
    }
    stash += ((b, f))
    count += 1
    if (stash.size > StashBound) {
      overflows += 1
      if (!warned) {
        warned = true
        System.err.println(f"[cuckoo] WARN stash overflow: size=${stash.size} " +
          f"buckets=$numBucketsPow2 load=$loadFactor%.3f — shard undersized or " +
          "host-hash skewed; probes degrade to O(stash). Raise bloomItemsPerShard.")
      }
    }
    stash.size <= StashBound
  }

  /** Inserts past the stash bound (see StashBound) — 0 on a well-sized shard. */
  def stashOverflows: Long = overflows
  def stashSize: Int = stash.size

  /** Merge another filter of the SAME geometry into this one. */
  def mergeFrom(o: CuckooFilter): CuckooFilter = {
    require(o.numBucketsPow2 == numBucketsPow2, "incompatible cuckoo geometry")
    var i = 0
    while (i < o.table.length) {
      val fp = o.table(i)
      if (fp != 0) insertFp(i / SlotsPerBucket, fp)
      i += 1
    }
    o.stash.foreach { case (b, fp) => insertFp(b, fp) }
    this
  }

  override def mightContain(s: String): Boolean = {
    val fp = fingerprint(s)
    val i1 = bucket1(s)
    val i2 = altBucket(i1, fp)
    bucketContains(i1, fp) || bucketContains(i2, fp) ||
      stash.exists(e => e._2 == fp && (e._1 == i1 || e._1 == i2))
  }

  /** Delete one copy of s's fingerprint. Only call for items actually
    * inserted (deleting a never-inserted item can evict a colliding one —
    * inherent to the structure).
    */
  def delete(s: String): Boolean = {
    val fp = fingerprint(s)
    val i1 = bucket1(s)
    val i2 = altBucket(i1, fp)
    val removed = removeFrom(i1, fp) || removeFrom(i2, fp) || {
      val idx = stash.indexWhere(e => e._2 == fp && (e._1 == i1 || e._1 == i2))
      if (idx >= 0) { stash.remove(idx); true } else false
    }
    if (removed) count -= 1
    removed
  }

  def size: Long = count
  def loadFactor: Double = count.toDouble / (numBucketsPow2.toLong * SlotsPerBucket)
  override def approxBits: Long = count

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + table.length * 2 + 4 + stash.size * 6)
    bb.putInt(numBucketsPow2)
    bb.putInt(maxKicks)
    table.foreach(bb.putShort)
    bb.putInt(stash.size)
    stash.foreach { case (b, f) => bb.putInt(b); bb.putShort(f) }
    bb.array()
  }
}

object CuckooFilter {
  /** Capacity-sized: next power of two covering n items at ~0.9 load. */
  def sized(expectedItems: Long): CuckooFilter = {
    val bucketsNeeded = math.max(1L, math.ceil(expectedItems / (4 * 0.9)).toLong)
    var p = 1
    while (p < bucketsNeeded) p <<= 1
    new CuckooFilter(p)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    val mk = bb.getInt
    val f = new CuckooFilter(nb, mk)
    var i = 0
    while (i < nb * 4) { f.tableSet(i, bb.getShort); i += 1 }
    val ns = bb.getInt
    i = 0
    while (i < ns) { f.stashAdd(bb.getInt, bb.getShort); i += 1 }
    f.recount()
    f
  }

  // deserialization hooks
  private implicit final class Access(private val f: CuckooFilter) extends AnyVal {
    def tableSet(i: Int, v: Short): Unit = f.table(i) = v
    def stashAdd(b: Int, fp: Short): Unit = f.stash += ((b, fp))
    def recount(): Unit = {
      var c = 0L
      f.table.foreach(v => if (v != 0) c += 1)
      f.count = c + f.stash.size
    }
  }
}

/** Probe-side abstraction shared by the bloom and cuckoo seen-filters:
  * `false` = definitely not seen (no false negatives for live items).
  */
trait ShardedSeenFilter extends Serializable {
  def mightContain(url: String, hostHash: Long): Boolean
}

/** Two-level host-hash–sharded cuckoo filter — the deletion-safe seen-set
  * variant (recrawl/expiry: a bloom cannot forget; a cuckoo can). Same
  * shard/broadcast harness as [[ShardedBloom]].
  */
final class ShardedCuckoo(val shards: Array[CuckooFilter]) extends ShardedSeenFilter {
  def numShards: Int = shards.length
  def shardOf(hostHash: Long): Int =
    java.lang.Math.floorMod(hostHash, numShards.toLong).toInt
  override def mightContain(url: String, hostHash: Long): Boolean =
    shards(shardOf(hostHash)).mightContain(url)
  def insert(url: String, hostHash: Long): Unit = shards(shardOf(hostHash)).insert(url)
  /** Deletion-safe expiry — only for URLs actually inserted. */
  def delete(url: String, hostHash: Long): Boolean = shards(shardOf(hostHash)).delete(url)
  def mergeShardBytes(shardIdx: Int, bytes: Array[Byte]): Unit =
    shards(shardIdx).mergeFrom(CuckooFilter.deserialize(bytes))
  def copyOf(): ShardedCuckoo =
    new ShardedCuckoo(shards.map(s => CuckooFilter.deserialize(s.serialize())))
  /** Total stash-bound overflows across shards — mis-sizing diagnostic. */
  def stashOverflows: Long = shards.map(_.stashOverflows).sum
}

object ShardedCuckoo {
  def sized(numShards: Int, expectedItemsPerShard: Long): ShardedCuckoo =
    new ShardedCuckoo(Array.fill(numShards)(CuckooFilter.sized(expectedItemsPerShard)))
}

/** Spark Aggregator building one cuckoo shard from a column of URLs:
  * object buffer during partial aggregation (TypedImperativeAggregate
  * under `udaf`), serialized only across the shuffle; merge is
  * fingerprint-level reinsertion (partial-key property).
  */
final class CuckooBuildAggregator(numBucketsPow2: Int)
    extends org.apache.spark.sql.expressions.Aggregator[String, CuckooFilter, Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: CuckooFilter = new CuckooFilter(numBucketsPow2)
  override def reduce(buf: CuckooFilter, url: String): CuckooFilter = {
    buf.insert(url); buf
  }
  override def merge(a: CuckooFilter, b: CuckooFilter): CuckooFilter = a.mergeFrom(b)
  override def finish(r: CuckooFilter): Array[Byte] = r.serialize()
  override def bufferEncoder: Encoder[CuckooFilter] = Encoders.kryo[CuckooFilter]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Degenerate filter: answers "maybe" for everything, so every candidate
  * takes the exact anti-join path (seenFilter = "none").
  */
object AlwaysMaybe extends ShardedSeenFilter {
  override def mightContain(url: String, hostHash: Long): Boolean = true
}
