package graft.util

import java.nio.charset.StandardCharsets

/** Pure-Scala xxHash64 (public algorithm, https://github.com/Cyan4973/xxHash
  * spec). Implemented from the published spec so the Spark-free sequential
  * oracle ([[graft.crawl.RefCrawler]]) and the distributed engine share one
  * deterministic hash. For string inputs with the default seed (42) this
  * matches Spark's built-in `xxhash64` column function, which hashes the
  * UTF-8 bytes — property-tested in XxHash64Spec.
  */
object XxHash64 {
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  /** Seed shared by the whole engine (matches Spark's xxhash64 default). */
  final val DefaultSeed = 42L

  @inline private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) |
      ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  @inline private def round(acc: Long, input: Long): Long =
    rotl(acc + input * P2, 31) * P1

  @inline private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4

  def hash(bytes: Array[Byte], seed: Long): Long = hash(bytes, 0, bytes.length, seed)

  def hash(b: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var i = off
    val end = off + len
    var h: Long = 0L
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 32
      while (i <= limit) {
        v1 = round(v1, readLong(b, i))
        v2 = round(v2, readLong(b, i + 8))
        v3 = round(v3, readLong(b, i + 16))
        v4 = round(v4, readLong(b, i + 24))
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= end) {
      h ^= round(0L, readLong(b, i))
      h = rotl(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h ^= readInt(b, i) * P1
      h = rotl(h, 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h ^= (b(i) & 0xFFL) * P5
      h = rotl(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  /** Hash of a string's UTF-8 bytes with the engine seed. Equal to Spark's
    * `xxhash64(col)` for StringType columns.
    */
  def hashString(s: String): Long =
    hash(s.getBytes(StandardCharsets.UTF_8), DefaultSeed)

  def hashString(s: String, seed: Long): Long =
    hash(s.getBytes(StandardCharsets.UTF_8), seed)
}
