package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def tmpRoot(): String =
    Files.createTempDirectory("snapstore").toString

  test("commit / read / append / replace / time-travel") {
    import spark.implicits._
    val store = new SnapshotStore(tmpRoot(), spark)
    assert(store.currentVersion.isEmpty)

    val v0 = store.beginCommit()
      .append("log", Seq((1, "a"), (2, "b")).toDF("id", "v"))
      .replace("state", Seq((1, "pending")).toDF("id", "status"))
      .summary("wave" -> "0")
      .commit()
    assert(v0 === 0L)
    assert(store.read("log").count() === 2)
    assert(store.read("state").count() === 1)

    val v1 = store.beginCommit()
      .append("log", Seq((3, "c")).toDF("id", "v"))
      .replace("state", Seq((2, "pending"), (3, "pending")).toDF("id", "status"))
      .summary("wave" -> "1")
      .commit()
    assert(v1 === 1L)
    // current: append accumulated, replace swapped
    assert(store.read("log").count() === 3)
    assert(store.read("state").as[(Int, String)].collect().map(_._1).sorted.toSeq === Seq(2, 3))
    // time travel to v0
    assert(store.read("log", Some(0L)).count() === 2)
    assert(store.read("state", Some(0L)).as[(Int, String)].head()._1 === 1)
    // lineage: per-partition file lists via the write-once sidecars,
    // cumulative across appends and time-travelable
    val m = store.manifest(1L)
    assert(m.parent === 0L)
    val filesV1 = store.files("log")
    assert(filesV1.nonEmpty && filesV1.forall(_.endsWith(".parquet")))
    assert(store.files("log", Some(0L)).size < filesV1.size,
      "append must add lineage files")
    assert(m.summary("wave") === "1")
  }

  test("manifests stay FLAT: no file lists re-embedded per commit; lineage " +
    "complete via sidecars after many appends") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    val n = 25
    (0 until n).foreach { i =>
      store.beginCommit()
        .append("log", Seq((i, s"v$i")).toDF("id", "v"))
        .summary("wave" -> i.toString).commit()
    }
    // the manifest never embeds parquet file names — only dir pointers
    val last = Files.readString(Paths.get(root, s"manifests/v${n - 1}.json"))
    assert(!last.contains(".parquet"),
      "manifest re-embeds data file names — sidecar indirection broken")
    // manifest growth per commit is one dir pointer, not a file list:
    // byte growth across the last 10 commits stays ~constant per commit
    val sizes = (n - 10 until n)
      .map(v => Files.size(Paths.get(root, s"manifests/v$v.json")))
    val deltas = sizes.sliding(2).map(s => s(1) - s(0)).toSeq
    assert(deltas.forall(d => d >= 0 && d < 200),
      s"manifest growth per commit not flat: $deltas")
    // lineage still complete: one file set per append, all readable
    val lineage = store.files("log")
    assert(lineage.size >= n, s"lineage incomplete: ${lineage.size} < $n")
    assert(store.read("log").count() === n.toLong)
    // compaction collapses the dir list (long-crawl manifest hygiene)
    store.compact("log")
    assert(store.currentManifest.get.tables("log").dataDirs.size === 1)
    assert(store.read("log").count() === n.toLong)
  }

  test("empty tables read back with schema") {
    import spark.implicits._
    val store = new SnapshotStore(tmpRoot(), spark)
    val empty = Seq.empty[(Int, String)].toDF("id", "v")
    store.beginCommit().replace("t", empty).commit()
    val back = store.read("t")
    assert(back.count() === 0)
    assert(back.schema.fieldNames.toSeq === Seq("id", "v"))
  }

  test("rollbackTo: a roll-FORWARD snapshot restoring the target's tables " +
    "and summary; undone versions stay time-travelable, the chain stays " +
    "monotonic (next commit claims normally), and expireSnapshots reclaims " +
    "the undone versions' unshared dirs while keeping shared ones") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((1, "a")).toDF("id", "v"))
      .replace("state", Seq(1).toDF("id")).summary("wave" -> "0").commit()
    store.beginCommit().append("log", Seq((2, "b")).toDF("id", "v"))
      .replace("state", Seq(2).toDF("id")).summary("wave" -> "1").commit()
    store.beginCommit().append("log", Seq((3, "c")).toDF("id", "v"))
      .replace("state", Seq(3).toDF("id")).summary("wave" -> "2").commit()

    val v3 = store.rollbackTo(0L)
    assert(v3 === 3L)
    // reads == v0 content; no data was copied (shared dirs)
    assert(store.read("log").as[(Int, String)].collect().toSeq === Seq((1, "a")))
    assert(store.read("state").as[Int].head() === 1)
    assert(store.currentManifest.get.summary("wave") === "0")
    assert(store.currentManifest.get.summary("rolled_back_to") === "0")
    assert(store.manifest(3L).tables("log").dataDirs ===
      store.manifest(0L).tables("log").dataDirs)
    // undone versions still time-travel until expired
    assert(store.read("log", Some(2L)).count() === 3)
    // the chain continues normally past the rollback
    val v4 = store.beginCommit().append("log", Seq((9, "z")).toDF("id", "v")).commit()
    assert(v4 === 4L)
    assert(store.read("log").count() === 2) // v0's row + the new one
    // GC: keeping v3..v4 drops the undone appends' dirs but keeps v0's
    // (shared by the rollback manifest)
    val removed = store.expireSnapshots(keepLast = 2)
    assert(removed.exists(_.contains("data/log/v1")), "undone v1 append not reclaimed")
    assert(removed.exists(_.contains("data/log/v2")), "undone v2 append not reclaimed")
    assert(store.read("log").count() === 2, "shared dirs must survive GC")
    // bounds
    assertThrows[IllegalArgumentException](store.rollbackTo(99L))
    assertThrows[Exception](new SnapshotStore(tmpRoot(), spark).rollbackTo(0L))
  }

  test("optimistic concurrency: a commit whose parent is no longer CURRENT " +
    "fails WITHOUT clobbering the winner's data") {
    import spark.implicits._
    val store = new SnapshotStore(tmpRoot(), spark)
    store.beginCommit().append("log", Seq((0, "base")).toDF("id", "v")).commit()
    val winner = store.beginCommit().append("log", Seq((1, "win")).toDF("id", "v"))
    val loser = store.beginCommit().append("log", Seq((2, "lose")).toDF("id", "v"))
    assert(winner.commit() === 1L)
    intercept[ConcurrentCommitException] { loser.commit() }
    // the winner's state is fully intact — the loser wrote nothing
    assert(store.currentVersion === Some(1L))
    assert(store.read("log").as[(Int, String)].collect().map(_._1).sorted.toSeq
      === Seq(0, 1))
  }

  test("INTERLEAVED commits from the same parent: the loser writes AFTER " +
    "the winner's data writes but before its publish — winner's published " +
    "data is untouched (commit-unique dirs), loser's dirs are GC-able orphans") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((0, "base")).toDF("id", "v")).commit()
    val winner = store.beginCommit().append("log", Seq((1, "win")).toDF("id", "v"))
    val loser = store.beginCommit().append("log", Seq((2, "lose")).toDF("id", "v"))
    // the exact clobber interleaving: winner writes, THEN the loser writes
    // (both target version 1 — without uuid-tagged dirs the loser would
    // mode(overwrite) the winner's just-written files here), then the
    // winner publishes and the loser fails its parent check
    winner.writeAll()
    loser.writeAll()
    assert(winner.publish() === 1L)
    intercept[ConcurrentCommitException] { loser.publish() }
    // the published manifest points ONLY at the winner's own data
    assert(store.currentVersion === Some(1L))
    assert(store.read("log").as[(Int, String)].collect().sorted.toSeq
      === Seq((0, "base"), (1, "win")))
    // the loser's dirs exist as orphans ... and expireSnapshots reclaims
    // exactly them (nothing the retained manifests reference)
    val logDirs = Files.list(Paths.get(root, "data/log"))
    val nDirs = try logDirs.count() finally logDirs.close()
    assert(nDirs === 3, s"expected base+winner+loser dirs, got $nDirs")
    val removed = store.expireSnapshots(keepLast = 2)
    assert(removed.size === 1 && removed.head.startsWith("data/log/v1-"),
      s"orphan not reclaimed: $removed")
    assert(store.read("log").as[(Int, String)].collect().sorted.toSeq
      === Seq((0, "base"), (1, "win")))
  }

  test("CAS claim: a racing committer that passed the parent check BEFORE " +
    "the winner swapped CURRENT still loses at the manifest create-if-absent " +
    "claim — and cannot truncate the winner's manifest or move CURRENT") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((0, "base")).toDF("id", "v")).commit()
    val winner = store.beginCommit().append("log", Seq((1, "win")).toDF("id", "v"))
    val loser = store.beginCommit().append("log", Seq((2, "lose")).toDF("id", "v"))
    winner.writeAll()
    loser.writeAll()
    assert(winner.publish() === 1L)
    val winnerManifest = Files.readString(Paths.get(root, "manifests/v1.json"))
    // reproduce the old TOCTOU window deterministically: the loser's parent
    // check runs while CURRENT still reads the shared parent (simulated by
    // reverting the pointer), so only the CAS claim can stop it now
    Files.writeString(Paths.get(root, "CURRENT"), "0")
    intercept[ConcurrentCommitException] { loser.publish() }
    // the loser made NO metadata mutation: the claimed manifest is intact
    // (CREATE_NEW cannot truncate) and CURRENT is exactly as it found it
    assert(Files.readString(Paths.get(root, "manifests/v1.json")) === winnerManifest)
    assert(Files.readString(Paths.get(root, "CURRENT")) === "0")
    Files.writeString(Paths.get(root, "CURRENT"), "1") // restore
    assert(store.read("log").as[(Int, String)].collect().sorted.toSeq
      === Seq((0, "base"), (1, "win")))
  }

  test("expireSnapshots never touches dirs ABOVE CURRENT — the in-flight " +
    "window between writeAll and publish") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((0, "base")).toDF("id", "v")).commit()
    // a commit mid-flight: data written, not yet published
    val inflight = store.beginCommit().append("log", Seq((1, "next")).toDF("id", "v"))
    inflight.writeAll()
    val removed = store.expireSnapshots(keepLast = 1)
    assert(removed.isEmpty, s"GC deleted an in-flight commit's data: $removed")
    // the commit still publishes onto intact data
    assert(inflight.publish() === 1L)
    assert(store.read("log").as[(Int, String)].collect().sorted.toSeq
      === Seq((0, "base"), (1, "next")))
  }

  test("THREADED multi-committer race: real threads appending through the " +
    "CAS + commitWithRetries loop — every row lands exactly once, the " +
    "version chain is contiguous, orphan dirs GC away cleanly") {
    import spark.implicits._
    val store = new SnapshotStore(tmpRoot(), spark)
    store.beginCommit().append("log", Seq((-1, "base")).toDF("id", "v")).commit()
    val nThreads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val futs = (0 until nThreads).map { t =>
      Future {
        (0 until perThread).foreach { k =>
          val id = t * perThread + k
          // append is state-independent, so re-queuing the same row per
          // attempt is the documented correct use of the retry loop
          store.commitWithRetries(maxAttempts = 256) {
            _.append("log", Seq((id, s"t$t-$k")).toDF("id", "v"))
          }
        }
      }
    }
    try Await.result(Future.sequence(futs), Duration.Inf)
    finally pool.shutdown()
    val total = nThreads * perThread
    // the CAS linearized the racers: one version per commit, no gaps, each
    // manifest's parent is its predecessor
    assert(store.currentVersion === Some(total.toLong))
    (1L to total).foreach(v => assert(store.manifest(v).parent === v - 1))
    // no lost or duplicated appends
    assert(store.read("log").as[(Int, String)].collect().map(_._1).sorted.toSeq
      === (-1 until total).toSeq)
    // losers' commit-unique dirs are unreferenced orphans; reclaiming them
    // leaves the published content intact
    store.expireSnapshots(keepLast = 1)
    assert(store.read("log").count() === (total + 1).toLong)
  }

  test("commitWithRetries rethrows the last conflict once attempts are " +
    "exhausted (a permanently blocked version must not loop forever)") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((1, "a")).toDF("id", "v")).commit()
    // orphan claim on v1 (a crashed claimer) blocks every attempt
    val m0 = Files.readString(Paths.get(root, "manifests/v0.json"))
    Files.writeString(Paths.get(root, "manifests/v1.json"),
      m0.replace("\"version\" : 0", "\"version\" : 1"))
    var builds = 0
    intercept[ConcurrentCommitException] {
      store.commitWithRetries(maxAttempts = 3) { c =>
        builds += 1
        c.append("log", Seq((2, "b")).toDF("id", "v"))
      }
    }
    assert(builds === 3, "must re-build (re-read-and-reapply) once per attempt")
  }

  test("atomicity: unswapped manifest is invisible; reopened store resumes " +
    "at CURRENT; the orphaned claim blocks its version until removed (CAS " +
    "semantics — a live slow claimer is indistinguishable from a dead one)") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((1, "a")).toDF("id", "v")).commit()
    // simulate a crash after manifest claim but before pointer swap:
    // hand-write an orphan v1 manifest; CURRENT still points at v0
    val m0 = Files.readString(Paths.get(root, "manifests/v0.json"))
    Files.writeString(Paths.get(root, "manifests/v1.json"), m0.replace("\"version\" : 0", "\"version\" : 1"))
    val reopened = new SnapshotStore(root, spark)
    assert(reopened.currentVersion === Some(0L))
    assert(reopened.read("log").count() === 1)
    // the claim is honored: a new commit must NOT silently overwrite it
    // (it could belong to a live committer one instruction from its swap)
    intercept[ConcurrentCommitException] {
      reopened.beginCommit().append("log", Seq((2, "b")).toDF("id", "v")).commit()
    }
    // recovery is TTL-leased: within the lease the claim is honored (the
    // claimer may be alive), so nothing is removed and the version stays
    // blocked
    assert(reopened.recoverOrphanClaims(olderThanMs = 3600_000L) === Nil)
    intercept[ConcurrentCommitException] {
      reopened.beginCommit().append("log", Seq((3, "c")).toDF("id", "v")).commit()
    }
    // past the lease the orphan claim is reclaimed — published manifests
    // (<= CURRENT) are never touched — and the blocked version commits
    assert(reopened.recoverOrphanClaims(olderThanMs = 0L) === Seq(1L))
    assert(Files.exists(Paths.get(root, "manifests/v0.json")))
    val v = reopened.beginCommit().append("log", Seq((2, "b")).toDF("id", "v")).commit()
    assert(v === 1L)
    assert(reopened.read("log").count() === 2)
  }
}
