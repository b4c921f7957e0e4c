package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class FilterShardStoreSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def urls(n: Int, tag: String): Seq[(String, Long)] =
    (0 until n).map { i =>
      val host = s"host${i % 8}.test"
      (s"http://$host/$tag/$i", graft.util.XxHash64.hashString(host))
    }

  private def mkStore(kind: String): FilterShardStore = {
    val root = java.nio.file.Files.createTempDirectory("fss").toString + "/filters"
    val bloomProto = graft.operators.BloomShard.sized(4096, 0.01)
    val cuckooProto = graft.operators.CuckooFilter.sized(4096)
    new FilterShardStore(root, numShards = 4, kind,
      bloomProto.bits.length, bloomProto.numHashes, cuckooProto.numBucketsPow2)
  }

  private def df(rows: Seq[(String, Long)], nsh: Int) = {
    import spark.implicits._
    rows.toDF("canonical_url", "host_hash")
      .withColumn("shard", pmod($"host_hash", lit(nsh.toLong)).cast("int"))
  }

  for (kind <- Seq("bloom", "cuckoo")) {
    test(s"$kind: distributed write -> lazy probe has NO false negatives") {
      val ss = mkStore(kind)
      val in = urls(2000, "base")
      ss.writeShardFiles(df(in, ss.numShards), ss.baseDir(0))
      val gen = FilterGen(0, Vector.empty)
      in.foreach { case (u, hh) =>
        assert(FilterShardStore.probe(ss, gen, u, hh), s"false negative: $u")
      }
      // FP rate sane on never-inserted urls
      val out = urls(4000, "other")
      val fp = out.count { case (u, hh) => FilterShardStore.probe(ss, gen, u, hh) }
      assert(fp.toDouble / out.size < 0.05, s"fp rate ${fp.toDouble / out.size}")
    }

    test(s"$kind: deltas merge on probe; compaction preserves membership exactly") {
      val ss = mkStore(kind)
      val base = urls(1000, "b")
      val d1 = urls(500, "d1")
      val d2 = urls(500, "d2")
      ss.writeShardFiles(df(base, ss.numShards), ss.baseDir(0))
      ss.writeShardFiles(df(d1, ss.numShards), ss.deltaDir(1))
      ss.writeShardFiles(df(d2, ss.numShards), ss.deltaDir(2))
      val gen = FilterGen(0, Vector(1, 2))
      (base ++ d1 ++ d2).foreach { case (u, hh) =>
        assert(FilterShardStore.probe(ss, gen, u, hh), s"false negative pre-compact: $u")
      }
      val gen2 = ss.compact(spark, gen)
      assert(gen2.baseVersion === 1 && gen2.deltaWaves.isEmpty)
      (base ++ d1 ++ d2).foreach { case (u, hh) =>
        assert(FilterShardStore.probe(ss, gen2, u, hh), s"false negative post-compact: $u")
      }
    }
  }

  test("generation bump invalidates the executor cache (stale filters never answer)") {
    val ss = mkStore("bloom")
    val base = urls(100, "b")
    val extra = urls(100, "x")
    ss.writeShardFiles(df(base, ss.numShards), ss.baseDir(0))
    val gen0 = FilterGen(0, Vector.empty)
    // prime the cache: the extra urls are (almost surely) not present
    val missBefore = extra.count { case (u, hh) => !FilterShardStore.probe(ss, gen0, u, hh) }
    assert(missBefore > 90)
    // new delta + new generation: the SAME cache must now see the extras
    ss.writeShardFiles(df(extra, ss.numShards), ss.deltaDir(1))
    val gen1 = FilterGen(0, Vector(1))
    extra.foreach { case (u, hh) =>
      assert(FilterShardStore.probe(ss, gen1, u, hh),
        s"stale cached filter served after generation bump: $u")
    }
  }

  test("cleanupBelow removes superseded generations, keeps the live one") {
    val ss = mkStore("bloom")
    val in = urls(200, "b")
    ss.writeShardFiles(df(in, ss.numShards), ss.baseDir(0))
    ss.writeShardFiles(df(urls(50, "d"), ss.numShards), ss.deltaDir(1))
    val gen1 = ss.compact(spark, FilterGen(0, Vector(1)))
    assert(ss.nextBaseVersion() === 2)
    ss.cleanupBelow(gen1.baseVersion, Set.empty)
    val root = new java.io.File(ss.root)
    val names = root.listFiles().map(_.getName).toSet
    assert(!names.contains("base-v0") && !names.contains("delta-w1"), names.toString)
    assert(names.contains("base-v1"))
    // live generation still answers
    in.foreach { case (u, hh) => assert(FilterShardStore.probe(ss, gen1, u, hh)) }
  }

  test("empty shard (no seen rows) answers definitely-not-seen") {
    val ss = mkStore("bloom")
    // write only shard of host0 urls; probe a url whose shard has no file
    import spark.implicits._
    val one = Seq(("http://host0.test/x", graft.util.XxHash64.hashString("host0.test")))
      .toDF("canonical_url", "host_hash")
      .withColumn("shard", pmod($"host_hash", lit(ss.numShards.toLong)).cast("int"))
    ss.writeShardFiles(one, ss.baseDir(0))
    val gen = FilterGen(0, Vector.empty)
    val shardOfHost0 = java.lang.Math.floorMod(
      graft.util.XxHash64.hashString("host0.test"), ss.numShards.toLong).toInt
    val otherHost = (1 until 8).map(i => s"host$i.test").find { h =>
      java.lang.Math.floorMod(graft.util.XxHash64.hashString(h),
        ss.numShards.toLong).toInt != shardOfHost0
    }.get
    assert(!FilterShardStore.probe(ss, gen,
      s"http://$otherHost/y", graft.util.XxHash64.hashString(otherHost)))
  }
}
