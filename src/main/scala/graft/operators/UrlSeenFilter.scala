package graft.operators

import graft.util.XxHash64

import java.nio.charset.StandardCharsets

/** Approximate membership filter over the URL-seen set.
  *
  * Contract (SURVEY.md §2.4): `mightContain == false` means DEFINITELY not
  * seen (no false negatives ever); `true` means maybe — such rows go through
  * the exact anti-join. The filter is an optimization that must never change
  * the answer.
  */
trait UrlSeenFilter extends Serializable {
  def mightContain(url: String): Boolean
  /** Number of probes answered "maybe" that exact check refutes — test hook. */
  def approxBits: Long
}

/** Plain bloom filter over strings: double hashing g_i = h1 + i*h2 (public
  * Kirsch–Mitzenmacher construction) over xxhash64 with two seeds.
  * Bit array is a Array[Byte] so it can double as a Spark Aggregator buffer
  * and a broadcast payload.
  */
final class BloomShard(val bits: Array[Byte], val numHashes: Int) extends UrlSeenFilter {
  private def numBits: Long = bits.length.toLong * 8L

  def insert(s: String): Unit = BloomShard.setBits(bits, numHashes, s)

  override def mightContain(s: String): Boolean = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val h1 = XxHash64.hash(b, BloomShard.Seed1)
    val h2 = XxHash64.hash(b, BloomShard.Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      if ((bits((bit >>> 3).toInt) & (1 << (bit & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Bitwise OR merge — merge(a,b) ≡ insert-all (property-tested). */
  def merge(o: BloomShard): BloomShard = {
    require(o.bits.length == bits.length && o.numHashes == numHashes, "incompatible shards")
    val out = new Array[Byte](bits.length)
    var i = 0
    while (i < bits.length) { out(i) = (bits(i) | o.bits(i)).toByte; i += 1 }
    new BloomShard(out, numHashes)
  }

  override def approxBits: Long = {
    var c = 0L
    bits.foreach(b => c += java.lang.Integer.bitCount(b & 0xFF))
    c
  }
}

object BloomShard {
  val Seed1 = 0x51ED270BL
  val Seed2 = 0x9D2C5680L

  def empty(numBytes: Int, numHashes: Int): BloomShard =
    new BloomShard(new Array[Byte](numBytes), numHashes)

  /** Size a shard for n items at target false-positive rate. */
  def sized(expectedItems: Long, fpp: Double): BloomShard = {
    val n = math.max(expectedItems, 1L)
    val bitsNeeded = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bytes = math.max(8L, (bitsNeeded + 7) / 8).toInt
    val k = math.max(1, math.round(bitsNeeded.toDouble / n * math.log(2)).toInt)
    empty(bytes, k)
  }

  /** Set the k bits for s in a raw byte buffer (shared with the Spark
    * Aggregator build path so executor-built shards merge bit-identically
    * with driver-built ones).
    */
  def setBits(buf: Array[Byte], numHashes: Int, s: String): Unit = {
    val numBits = buf.length.toLong * 8L
    val b = s.getBytes(StandardCharsets.UTF_8)
    val h1 = XxHash64.hash(b, Seed1)
    val h2 = XxHash64.hash(b, Seed2)
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      buf((bit >>> 3).toInt) = (buf((bit >>> 3).toInt) | (1 << (bit & 7).toInt)).toByte
      i += 1
    }
  }
}

/** Two-level host-hash–sharded bloom (BASELINE.json north_star: "two-level
  * Bloom sharding so membership tests never shuffle the full seen-set").
  * Level 1: shard index = floorMod(host_hash, numShards) — all URLs of a
  * host land in one shard, so a probe touches exactly one shard and the
  * shard build groups by a key the frontier is already organized around.
  * Level 2: per-shard bloom bit array. The whole structure is broadcast;
  * probes are executor-local. At 10^10 URLs the same layout holds with
  * shards loaded lazily per task from the snapshot store instead of one
  * whole-set broadcast.
  */
final class ShardedBloom(val shards: Array[BloomShard]) extends ShardedSeenFilter {
  def numShards: Int = shards.length

  def shardOf(hostHash: Long): Int = java.lang.Math.floorMod(hostHash, numShards.toLong).toInt

  override def mightContain(url: String, hostHash: Long): Boolean =
    shards(shardOf(hostHash)).mightContain(url)

  def insert(url: String, hostHash: Long): Unit =
    shards(shardOf(hostHash)).insert(url)

  /** Merge per-shard byte buffers built on executors into this filter. */
  def mergeShardBytes(shardIdx: Int, bytes: Array[Byte]): Unit = {
    val cur = shards(shardIdx)
    require(bytes.length == cur.bits.length, s"shard $shardIdx size mismatch")
    var i = 0
    while (i < bytes.length) { cur.bits(i) = (cur.bits(i) | bytes(i)).toByte; i += 1 }
  }

  def copyOf(): ShardedBloom =
    new ShardedBloom(shards.map(s => new BloomShard(s.bits.clone(), s.numHashes)))
}

object ShardedBloom {
  def sized(numShards: Int, expectedItemsPerShard: Long, fpp: Double): ShardedBloom =
    new ShardedBloom(Array.fill(numShards)(BloomShard.sized(expectedItemsPerShard, fpp)))
}

/** Spark Aggregator building one bloom shard's byte buffer from a column of
  * URLs — the "broadcast-merged Bloom" build path: partial aggregation on
  * executors (map-side combine), byte-OR merge, final tiny per-shard rows
  * collected to the driver and OR-merged into the broadcast filter. The
  * full URL set never moves to the driver, only S bit arrays.
  */
final class BloomBuildAggregator(numBytes: Int, numHashes: Int)
    extends org.apache.spark.sql.expressions.Aggregator[String, Array[Byte], Array[Byte]] {
  import org.apache.spark.sql.{Encoder, Encoders}
  override def zero: Array[Byte] = new Array[Byte](numBytes)
  override def reduce(buf: Array[Byte], url: String): Array[Byte] = {
    BloomShard.setBits(buf, numHashes, url)
    buf
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
