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
    // manifest carries lineage: files listed per table
    val m = store.manifest(1L)
    assert(m.parent === 0L)
    assert(m.tables("log").files.nonEmpty)
    assert(m.summary("wave") === "1")
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

  test("atomicity: unswapped manifest is invisible; reopened store resumes at CURRENT") {
    import spark.implicits._
    val root = tmpRoot()
    val store = new SnapshotStore(root, spark)
    store.beginCommit().append("log", Seq((1, "a")).toDF("id", "v")).commit()
    // simulate a crash after manifest write but before pointer swap:
    // hand-write an orphan v1 manifest; CURRENT still points at v0
    val m0 = Files.readString(Paths.get(root, "manifests/v0.json"))
    Files.writeString(Paths.get(root, "manifests/v1.json"), m0.replace("\"version\" : 0", "\"version\" : 1"))
    val reopened = new SnapshotStore(root, spark)
    assert(reopened.currentVersion === Some(0L))
    assert(reopened.read("log").count() === 1)
    // next commit from the reopened store wins over the orphan
    val v = reopened.beginCommit().append("log", Seq((2, "b")).toDF("id", "v")).commit()
    assert(v === 1L)
    assert(reopened.read("log").count() === 2)
  }
}
