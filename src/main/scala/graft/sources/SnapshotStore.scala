package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Iceberg-SEMANTICS snapshot table store over Parquet + JSON manifests.
  *
  * BASELINE.json north_rule demands "Iceberg tables ... resumable from
  * checkpoint with per-partition lineage + metrics", but no Iceberg runtime
  * exists in this sandbox (stock Spark 4.1.2 jars only — SURVEY.md §7.3).
  * This layer implements the semantics Iceberg provides, API-shaped so a
  * real catalog can replace it:
  *
  *  - data files are immutable Parquet directories, written once;
  *  - a snapshot = JSON manifest listing, per logical table, the data dirs
  *    composing that version plus a summary map of metrics; per-partition
  *    file lineage lives in write-once `_lineage.json` sidecars inside each
  *    data dir (manifest-file indirection — manifests stay flat no matter
  *    how many commits accumulate);
  *  - commit = write data, write manifest vN.json, then ATOMICALLY swap the
  *    CURRENT pointer (tmp file + ATOMIC_MOVE) — readers see old or new,
  *    never a partial state;
  *  - time-travel = read any retained manifest version;
  *  - resume = open the CURRENT manifest and continue.
  *
  * Table modes per commit: `replace` (new version's dirs only — e.g. the
  * pending frontier, copy-on-write) and `append` (parent dirs + new dir —
  * e.g. seen/docs/trace/metrics logs). At 10^10-URL scale the pending
  * frontier would move to merge-on-read deltas with periodic compaction;
  * the manifest format already carries the per-version dir lists needed.
  *
  * Layout:
  * {{{
  *   root/
  *     data/<table>/v<version>-<tag>/part-*.parquet   // tag: commit-unique
  *     manifests/v<version>.json
  *     CURRENT                       // contains the version number
  * }}}
  */
/** One logical table's state within a manifest: schema and the data dirs
  * composing the table at this version. The individual data files of each
  * dir (per-partition lineage) live in a WRITE-ONCE sidecar
  * `<dir>/_lineage.json` written with the data — Iceberg's manifest-file
  * indirection: embedding every file of every table version in every
  * manifest made the cumulative manifest bytes quadratic in commits
  * (each commit re-serialized all prior file lists); with the sidecar a
  * file list is written exactly once and manifests carry only dir
  * pointers. Read back via [[SnapshotStore.files]].
  */
case class TableState(schemaDdl: String, dataDirs: List[String])

case class Manifest(
    version: Long,
    parent: Long, // -1 = none
    summary: Map[String, String],
    tables: Map[String, TableState])

/** Thrown when another commit won this commit's snapshot version (Iceberg's
  * CommitFailedException analog): the commit's base state is stale —
  * re-read and re-apply. Detection is a true per-version CAS: the manifest
  * file is the claim token, written CREATE_NEW in [[SnapshotStore.Commit
  * publish]], so a same-parent racer loses atomically at the claim before
  * any CURRENT mutation (the early parent checks only short-circuit
  * obviously stale commits cheaply). Data dirs are COMMIT-UNIQUE
  * (uuid-tagged), so even commits that interleave mid-write can never
  * clobber each other's data: the loser's dirs are unreferenced orphans
  * reclaimed by [[SnapshotStore.expireSnapshots]]. A claimer that crashes
  * before its CURRENT swap leaves an orphan claim blocking its version —
  * recovered by [[SnapshotStore.recoverOrphanClaims]].
  */
class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

final class SnapshotStore(val root: String, spark: SparkSession) {
  private implicit val fmts: Formats = DefaultFormats

  private def rootPath: Path = Paths.get(root)
  private def manifestPath(v: Long): Path = rootPath.resolve(s"manifests/v$v.json")
  private def currentPath: Path = rootPath.resolve("CURRENT")

  def currentVersion: Option[Long] =
    if (Files.exists(currentPath))
      Some(new String(Files.readAllBytes(currentPath), StandardCharsets.UTF_8).trim.toLong)
    else None

  def manifest(v: Long): Manifest = {
    val json = new String(Files.readAllBytes(manifestPath(v)), StandardCharsets.UTF_8)
    JsonMethods.parse(json).extract[Manifest]
  }

  def currentManifest: Option[Manifest] = currentVersion.map(manifest)

  /** Per-partition lineage of a table at a version: the data files of each
    * composing dir, read from the write-once `_lineage.json` sidecars (in
    * dir order, file order within a dir as written).
    */
  def files(table: String, version: Option[Long] = None): List[String] = {
    val m = version.map(manifest).orElse(currentManifest)
      .getOrElse(throw new IllegalStateException(s"no snapshot at $root"))
    val st = m.tables.getOrElse(table,
      throw new IllegalArgumentException(s"unknown table '$table' in v${m.version}"))
    st.dataDirs.flatMap { d =>
      val p = rootPath.resolve(d).resolve("_lineage.json")
      if (!Files.exists(p)) Nil
      else JsonMethods.parse(new String(Files.readAllBytes(p),
        StandardCharsets.UTF_8)).extract[List[String]].map(f => s"$d/$f")
    }
  }

  /** Read a logical table at a version (default: current). Empty table
    * (no data files yet) reads as an empty DataFrame with the recorded
    * schema.
    */
  def read(table: String, version: Option[Long] = None): DataFrame = {
    val m = version.map(manifest).orElse(currentManifest)
      .getOrElse(throw new IllegalStateException(s"no snapshot at $root"))
    val st = m.tables.getOrElse(table,
      throw new IllegalArgumentException(s"unknown table '$table' in v${m.version}"))
    val schema = StructType.fromDDL(st.schemaDdl)
    val dirsWithData = st.dataDirs.map(d => rootPath.resolve(d)).filter { p =>
      Files.isDirectory(p) && {
        val s = Files.list(p)
        try s.anyMatch(f => f.toString.endsWith(".parquet"))
        finally s.close()
      }
    }
    if (dirsWithData.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(dirsWithData.map(_.toString): _*)
  }

  def beginCommit(): Commit = new Commit()

  /** Iceberg-style optimistic-concurrency retry loop (the catalog's
    * commit-retry around CommitFailedException): run `build` against a
    * FRESH [[Commit]] — bound to the then-CURRENT parent — and commit;
    * on [[ConcurrentCommitException]] re-read and re-apply, up to
    * `maxAttempts` total attempts, then rethrow the last conflict.
    * `build` must derive its writes from state as of the commit it is
    * given (re-reading via [[read]] as needed): a pure append can queue
    * the same rows every attempt, but a read-modify-write (e.g. a COW
    * `replace` derived from the current table) must re-derive inside
    * `build`, NOT capture a DataFrame from before the loop.
    */
  def commitWithRetries(maxAttempts: Int = 5)(build: Commit => Commit): Long = {
    require(maxAttempts >= 1, "need at least one attempt")
    var last: ConcurrentCommitException = null
    var attempt = 0
    while (attempt < maxAttempts) {
      try return build(beginCommit()).commit()
      catch { case e: ConcurrentCommitException => last = e }
      attempt += 1
    }
    throw last
  }

  /** Compact an append-accumulated table: rewrite its current content as a
    * single data dir in a new snapshot version (Iceberg's rewrite-data-
    * files action). Older versions still read the original files
    * (time-travel unaffected); new reads touch one dir.
    */
  def compact(table: String): Long = {
    val current = read(table)
    val cur = currentManifest.get
    val passthrough = cur.summary.map { case (k, v) => k -> v }.toSeq
    beginCommit()
      .replace(table, current)
      .summary(passthrough: _*)
      .summary("compacted" -> table)
      .commit()
  }

  /** Roll the store back to `version` (Iceberg's rollback-to-snapshot):
    * publish a NEW snapshot whose tables and summary are exactly that
    * manifest's. Expressed as a roll-FORWARD commit — pointing CURRENT
    * backwards would wedge the next commit's CAS claim against the undone
    * versions' already-existing manifest files, and deleting those would
    * destroy time-travel; instead the chain stays monotonic, the undone
    * versions stay readable until [[expireSnapshots]] ages them out, and
    * their unshared data dirs become ordinary GC orphans. No data is
    * written or copied — the new manifest shares the target's dirs. A
    * crawl [[graft.crawl.CrawlDriver.resume]] after a rollback continues
    * from the rolled-back wave (the summary carries the wave counters).
    * Returns the new version.
    */
  def rollbackTo(version: Long): Long = {
    val cur = currentVersion.getOrElse(
      throw new IllegalStateException(s"no snapshot at $root"))
    require(version <= cur, s"cannot roll back to v$version: CURRENT is v$cur")
    val target = manifest(version) // throws if expired/unknown
    beginCommit()
      .restore(target.tables)
      .summary(target.summary.toSeq: _*)
      .summary("rolled_back_to" -> version.toString)
      .commit()
  }

  /** Normalize a schema for storage: nullability is a property of the data
    * in a given write, not of the logical table — appends from differently
    * derived plans must unify.
    */
  private def ddlOf(schema: StructType): String =
    StructType(schema.fields.map(_.copy(nullable = true))).toDDL

  /** Version number encoded in a data-dir name (`v<N>` or `v<N>-<tag>`);
    * None for unrecognized names (never deleted).
    */
  private def dirVersion(name: String): Option[Long] = {
    if (!name.startsWith("v")) return None
    val core = name.indexOf('-') match {
      case -1 => name.substring(1)
      case i  => name.substring(1, i)
    }
    if (core.nonEmpty && core.forall(_.isDigit)) Some(core.toLong) else None
  }

  /** Expire old snapshots (Iceberg's expire_snapshots): keep the last
    * `keepLast` versions, delete older manifests and any data dir no
    * retained manifest references (e.g. superseded COW rewrites of the
    * pending frontier, or the orphaned dirs of a commit that lost the
    * publish race). Dirs whose encoded version is ABOVE CURRENT are never
    * touched: they belong to a commit that may be mid-flight between
    * writeAll and publish — deleting them would let the commit publish a
    * manifest over vanished data. (A crashed commit's above-CURRENT dirs
    * become reclaimable as soon as any later commit publishes that
    * version.) Returns the deleted paths.
    */
  def expireSnapshots(keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val cur = currentVersion.getOrElse(return Nil)
    val keepFrom = math.max(0L, cur - keepLast + 1)
    val referenced: Set[String] = (keepFrom to cur)
      .map(manifest)
      .flatMap(_.tables.values.flatMap(_.dataDirs)).toSet
    val removed = Seq.newBuilder[String]
    // unreferenced data dirs
    val dataRoot = rootPath.resolve("data")
    if (Files.isDirectory(dataRoot)) {
      val tables = Files.list(dataRoot)
      try {
        import scala.jdk.CollectionConverters._
        tables.iterator().asScala.filter(Files.isDirectory(_)).foreach { tdir =>
          val vs = Files.list(tdir)
          try {
            vs.iterator().asScala.foreach { vdir =>
              val rel = s"data/${tdir.getFileName}/${vdir.getFileName}"
              val v = dirVersion(vdir.getFileName.toString)
              if (!referenced.contains(rel) && v.exists(_ <= cur)) {
                val walk = Files.walk(vdir)
                try walk.sorted(java.util.Comparator.reverseOrder())
                  .forEach(p => Files.deleteIfExists(p))
                finally walk.close()
                removed += rel
              }
            }
          } finally vs.close()
        }
      } finally tables.close()
    }
    // expired manifests
    (0L until keepFrom).foreach { v =>
      if (Files.deleteIfExists(manifestPath(v))) removed += s"manifests/v$v.json"
    }
    removed.result()
  }

  /** Recover from a committer that CRASHED between its manifest CAS claim
    * and the CURRENT swap ([[Commit.publish]]'s documented window): the
    * orphaned above-CURRENT manifest blocks that version's claim forever.
    * Deletes every manifest whose version is ABOVE CURRENT and whose file
    * is at least `olderThanMs` old. The TTL is the caller's liveness
    * lease — a live slow claimer is indistinguishable from a dead one by
    * inspection, so the caller asserts no healthy committer spends that
    * long between claim and swap (in [[Commit.publish]] the swap follows
    * the claim by milliseconds; minutes is conservative). This is the same
    * recovery a real Iceberg catalog gets from its pointer-CAS + retry
    * loop's lock timeout. The crashed commit's data dirs need no handling
    * here: they become reclaimable by [[expireSnapshots]] as soon as a
    * later commit publishes that version. Returns the versions whose
    * claims were removed, ascending.
    */
  def recoverOrphanClaims(olderThanMs: Long): Seq[Long] = {
    val mdir = rootPath.resolve("manifests")
    if (!Files.isDirectory(mdir)) return Nil
    val cur = currentVersion.getOrElse(-1L)
    val cutoff = System.currentTimeMillis() - olderThanMs
    import scala.jdk.CollectionConverters._
    val listing = Files.list(mdir)
    val orphans =
      try listing.iterator().asScala.flatMap { p =>
        val n = p.getFileName.toString
        val core =
          if (n.startsWith("v") && n.endsWith(".json"))
            n.substring(1, n.length - 5)
          else ""
        if (core.nonEmpty && core.forall(_.isDigit)) Some((core.toLong, p))
        else None
      }.filter { case (v, p) =>
        v > cur && Files.getLastModifiedTime(p).toMillis <= cutoff
      }.toList
      finally listing.close()
    orphans.sortBy(_._1).flatMap { case (v, p) =>
      // re-check at the delete: if the claimer swapped CURRENT to (or past)
      // v in the meantime, the manifest is published state — leave it
      if (currentVersion.getOrElse(-1L) < v && Files.deleteIfExists(p)) Some(v)
      else None
    }
  }

  /** Builder for one atomic multi-table commit. Data writes are deferred to
    * commit() and run as CONCURRENT Spark jobs (independent tables, FIFO
    * scheduler overlaps their stages), then the manifest is written and the
    * CURRENT pointer swapped atomically — data-before-metadata ordering
    * exactly as an Iceberg commit.
    */
  final class Commit {
    private val newVersion: Long = currentVersion.map(_ + 1).getOrElse(0L)
    private val parentManifest: Option[Manifest] = currentManifest
    private var tables: Map[String, TableState] =
      parentManifest.map(_.tables).getOrElse(Map.empty)
    private var summaryMap: Map[String, String] = Map.empty
    private var queued: List[(String, DataFrame, Boolean)] = Nil // (table, df, isAppend)
    /** Commit-unique data-dir suffix: two commits racing from the same
      * parent target the SAME version number, and without the tag the loser
      * would mode("overwrite") the very dirs the winner just published
      * (detection is check-then-write, not CAS — the loser only fails at
      * the swap check, after the clobber). With the tag each commit writes
      * to dirs no other commit can name; a loser's dirs are orphans that
      * [[expireSnapshots]] garbage-collects (no retained manifest
      * references them).
      */
    private val tag: String = java.util.UUID.randomUUID().toString.take(8)

    private def writeData(table: String, df: DataFrame): String = {
      val rel = s"data/$table/v$newVersion-$tag"
      val abs = rootPath.resolve(rel)
      df.write.mode("overwrite").parquet(abs.toString)
      val files =
        if (Files.isDirectory(abs)) {
          val s = Files.list(abs)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.map(_.getFileName.toString)
              .filter(_.endsWith(".parquet")).toList.sorted
          } finally s.close()
        } else Nil
      // write-once per-dir lineage sidecar (underscore-prefixed: invisible
      // to the parquet reader) — manifests carry only the dir pointer
      if (Files.isDirectory(abs))
        Files.write(abs.resolve("_lineage.json"),
          Serialization.write(files).getBytes(StandardCharsets.UTF_8))
      rel
    }

    /** Replace the table's content with df (copy-on-write). */
    def replace(table: String, df: DataFrame): Commit = {
      queued ::= ((table, df, false))
      this
    }

    /** Append df to the table (log-structured; no rewrite of prior data). */
    def append(table: String, df: DataFrame): Commit = {
      val prev = tables.get(table)
      prev.foreach { p =>
        require(p.schemaDdl == ddlOf(df.schema),
          s"append schema mismatch for '$table': ${p.schemaDdl} vs ${ddlOf(df.schema)}")
      }
      queued ::= ((table, df, true))
      this
    }

    /** Declare an empty table (schema only) if absent — lets wave 0 commit
      * tables that gain data later.
      */
    def declare(table: String, schema: StructType): Commit = {
      if (!tables.contains(table))
        tables += table -> TableState(ddlOf(schema), Nil)
      this
    }

    /** Replace the whole table map with an earlier manifest's (the
      * [[SnapshotStore.rollbackTo]] primitive): shares those dirs, writes
      * no data. Package-private — general callers go through rollbackTo.
      */
    private[sources] def restore(t: Map[String, TableState]): Commit = {
      tables = t
      this
    }

    def summary(kv: (String, String)*): Commit = {
      summaryMap ++= kv
      this
    }

    private def checkParentCurrent(): Unit = {
      val now = currentVersion
      val expect = parentManifest.map(_.version)
      if (now != expect)
        throw new ConcurrentCommitException(
          s"commit based on ${expect.getOrElse("none")} but CURRENT is " +
            s"${now.getOrElse("none")} — another commit published first")
    }

    /** Phase 1 (package-private seam for the interleaved-commit test):
      * write all queued table data as concurrent Spark jobs into this
      * commit's uuid-tagged dirs. The leading parent check only avoids
      * wasted writes when obviously stale — dirs being commit-unique is
      * what guarantees an interleaved loser can never clobber a winner's
      * data.
      */
    private[sources] def writeAll(): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      checkParentCurrent()
      val writes = queued.reverse.map { case (table, df, isAppend) =>
        Future((table, isAppend, ddlOf(df.schema), writeData(table, df)))
      }
      Await.result(Future.sequence(writes), Duration.Inf).foreach {
        case (table, isAppend, ddl, dir) =>
          val prev = tables.get(table).filter(_ => isAppend)
          tables += table -> TableState(
            ddl,
            prev.map(_.dataDirs).getOrElse(Nil) :+ dir)
      }
    }

    /** Phase 2: CAS-claim the version, then atomic CURRENT swap. The
      * manifest file itself is the compare-and-swap token: it is written
      * CREATE_NEW (atomic create-if-absent on POSIX and HDFS-like stores),
      * so exactly ONE committer per version number can ever publish —
      * a racing committer from the same parent loses AT THE CLAIM with
      * [[ConcurrentCommitException]], before any CURRENT mutation, and its
      * commit-unique data dirs are GC orphans. This closes the old
      * check-then-write TOCTOU where two same-parent committers could both
      * pass the parent check and last-writer-win the swap. Caveat
      * (documented, matching the single-committer wave loop): a committer
      * that CRASHES between claim and swap leaves an orphaned
      * `v<N>.json` that blocks version N — recovery is deleting the
      * unreferenced manifest (its version is above CURRENT, so nothing
      * reads it; real Iceberg resolves the same window via its catalog's
      * atomic pointer CAS + retry loop).
      */
    private[sources] def publish(): Long = {
      Files.createDirectories(rootPath.resolve("manifests"))
      checkParentCurrent() // cheap early-out for obviously stale commits
      val m = Manifest(newVersion, parentManifest.map(_.version).getOrElse(-1L),
        summaryMap, tables)
      val json = Serialization.writePretty(m)
      try
        Files.write(manifestPath(newVersion), json.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentCommitException(
            s"version $newVersion already claimed — another commit from " +
              s"parent ${parentManifest.map(_.version).getOrElse(-1L)} published first")
      }
      val tmp = rootPath.resolve(s"CURRENT.tmp.$newVersion")
      Files.write(tmp, newVersion.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, currentPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      newVersion
    }

    /** Write all queued table data (concurrently), then manifest, then
      * atomically swap CURRENT. Returns the version.
      */
    def commit(): Long = {
      writeAll()
      publish()
    }
  }
}
