package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.util.XxHash64

class FilterSpec extends AnyFunSuite {

  private def urls(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"http://host${i % 32}.test/$tag/$i")

  test("bloom: no false negatives, ever") {
    val b = BloomShard.sized(10000, 0.01)
    val in = urls(10000, "in")
    in.foreach(b.insert)
    in.foreach(u => assert(b.mightContain(u), s"false negative: $u"))
  }

  test("bloom: false-positive rate within 2x nominal") {
    val b = BloomShard.sized(10000, 0.01)
    urls(10000, "in").foreach(b.insert)
    val probes = urls(20000, "out")
    val fp = probes.count(b.mightContain)
    assert(fp.toDouble / probes.size <= 0.02, s"fp rate ${fp.toDouble / probes.size}")
  }

  test("bloom: merge(a,b) == insert-all") {
    val a = BloomShard.sized(1000, 0.01)
    val b = BloomShard.sized(1000, 0.01)
    val all = BloomShard.sized(1000, 0.01)
    val ua = urls(500, "a")
    val ub = urls(500, "b")
    ua.foreach(a.insert); ub.foreach(b.insert)
    (ua ++ ub).foreach(all.insert)
    assert(a.merge(b).bits.toSeq === all.bits.toSeq)
  }

  test("sharded bloom: probe touches only the host's shard; tiny-forced-FP keeps no-FN") {
    val sb = ShardedBloom.sized(numShards = 8, expectedItemsPerShard = 4, fpp = 0.5)
    val in = urls(2000, "x")
    in.foreach(u => sb.insert(u, XxHash64.hashString(u.split('/')(2))))
    in.foreach(u => assert(sb.mightContain(u, XxHash64.hashString(u.split('/')(2)))))
  }

  test("bloom aggregator build on Spark == driver-built, bit for bit") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val shard = BloomShard.sized(5000, 0.01)
    val in = urls(5000, "agg")
    in.foreach(shard.insert)
    val agg = udaf(new BloomBuildAggregator(shard.bits.length, shard.numHashes))
    val built = in.toDF("url").repartition(7)
      .agg(agg($"url")).as[Array[Byte]].head()
    assert(built.toSeq === shard.bits.toSeq)
  }

  test("cuckoo: contains after insert, not-contains after delete") {
    val f = CuckooFilter.sized(20000)
    val in = urls(20000, "c")
    in.foreach(u => assert(f.insert(u)))
    in.foreach(u => assert(f.mightContain(u), s"false negative: $u"))
    val deleted = in.take(5000)
    deleted.foreach(u => assert(f.delete(u), s"delete failed: $u"))
    in.drop(5000).foreach(u => assert(f.mightContain(u), s"lost item after deletes: $u"))
    // deleted items: mostly gone (fp collisions allowed, must be rare)
    val ghost = deleted.count(f.mightContain)
    assert(ghost.toDouble / deleted.size < 0.05, s"ghost rate $ghost/5000")
  }

  test("cuckoo: high load insert succeeds and fp rate sane") {
    val f = new CuckooFilter(4096) // capacity 16384
    val n = (16384 * 0.9).toInt
    val in = urls(n, "load")
    in.foreach(u => assert(f.insert(u), s"insert failed at load ${f.loadFactor}"))
    assert(f.loadFactor > 0.85)
    val out = urls(20000, "probe")
    val fp = out.count(f.mightContain)
    assert(fp.toDouble / out.size < 0.05, s"fp rate ${fp.toDouble / out.size}")
  }

  test("cuckoo: serialize/deserialize round-trip preserves membership") {
    val f = CuckooFilter.sized(1000)
    val in = urls(900, "ser")
    in.foreach(f.insert)
    val g = CuckooFilter.deserialize(f.serialize())
    assert(g.size === f.size)
    in.foreach(u => assert(g.mightContain(u)))
  }

  test("cuckoo: deterministic across identical insert sequences") {
    val a = CuckooFilter.sized(5000)
    val b = CuckooFilter.sized(5000)
    val in = urls(4000, "det")
    in.foreach(a.insert); in.foreach(b.insert)
    assert(a.serialize().toSeq === b.serialize().toSeq)
  }

  test("cuckoo: undersized shard SURFACES stash overflow (counter, not silent)") {
    val f = new CuckooFilter(64) // capacity 256 — grossly undersized
    val in = urls(2000, "over")
    in.foreach(f.insert)
    assert(f.stashOverflows > 0, "overflow past the stash bound must be counted")
    assert(f.stashSize > 64)
    // membership correctness survives the overflow — only the probe cost degrades
    in.foreach(u => assert(f.mightContain(u), s"false negative under overflow: $u"))
    // a well-sized filter never overflows
    val ok = CuckooFilter.sized(2000)
    in.foreach(ok.insert)
    assert(ok.stashOverflows === 0L)
  }
}
