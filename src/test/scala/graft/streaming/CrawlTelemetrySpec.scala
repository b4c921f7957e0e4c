package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class CrawlTelemetrySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import CrawlTelemetry._

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  test("windowed per-host rates over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FetchEvent]
    val q = hostRates(input.toDF()).writeStream
      .format("memory").queryName("rates").outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        FetchEvent(ts(1), "a.test", 100, ok = true),
        FetchEvent(ts(2), "a.test", 200, ok = false),
        FetchEvent(ts(3), "b.test", 50, ok = true))
      q.processAllAvailable()
      input.addData(FetchEvent(ts(4), "a.test", 300, ok = true))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT host, sum(fetches) f, sum(bytes) b, sum(ok_count) ok FROM rates GROUP BY host")
        .as[(String, Long, Long, Long)].collect()
        .map { case (h, a, b, c) => h -> ((a, b, c)) }.toMap
      assert(rows("a.test") === ((3L, 600L, 2L)))
      assert(rows("b.test") === ((1L, 50L, 1L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: session closes on event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FetchEvent]
    val q = hostSessions(input.toDS(), gapSeconds = 30L).writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append())
      .start()
    try {
      // a burst for host a (t=1..3), nothing for 30+s of event time
      input.addData(
        FetchEvent(ts(1), "a.test", 100, ok = true),
        FetchEvent(ts(2), "a.test", 200, ok = true),
        FetchEvent(ts(3), "a.test", 50, ok = true))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "session must stay open")
      // an event far in the future advances the watermark past a's timeout
      input.addData(FetchEvent(ts(500), "b.test", 1, ok = true))
      q.processAllAvailable()
      input.addData(FetchEvent(ts(501), "b.test", 1, ok = true))
      q.processAllAvailable()
      val sess = spark.table("sessions").as[HostSession].collect()
      assert(sess.length === 1, s"expected exactly a's closed session: ${sess.toSeq}")
      val a = sess.head
      assert(a.host === "a.test" && a.fetches === 3L && a.bytes === 350L)
      assert(a.start === ts(1) && a.end === ts(3))
    } finally q.stop()
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[FetchEvent]
      val q = hostTotals(input.toDS()).writeStream
        .format("memory").queryName("rocks_totals").outputMode(OutputMode.Update())
        .start()
      try {
        input.addData(FetchEvent(ts(1), "a.test", 1, ok = true))
        q.processAllAvailable()
        input.addData(FetchEvent(ts(2), "a.test", 1, ok = true))
        q.processAllAvailable()
        import org.apache.spark.sql.functions._
        val last = spark.table("rocks_totals").groupBy($"_1").agg(max($"_2").as("t"))
          .as[(String, Long)].collect().toMap
        assert(last("a.test") === 2L, "state must persist across batches in RocksDB")
        // the running query's state store really is RocksDB
        assert(q.lastProgress.stateOperators.nonEmpty)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("stateful running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FetchEvent]
    val q = hostTotals(input.toDS()).writeStream
      .format("memory").queryName("totals").outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(FetchEvent(ts(1), "a.test", 1, ok = true),
        FetchEvent(ts(2), "a.test", 1, ok = true))
      q.processAllAvailable()
      input.addData(FetchEvent(ts(3), "a.test", 1, ok = true),
        FetchEvent(ts(4), "b.test", 1, ok = true))
      q.processAllAvailable()
      import org.apache.spark.sql.functions._
      val last = spark.table("totals").groupBy($"_1").agg(max($"_2").as("t"))
        .as[(String, Long)].collect().toMap
      assert(last("a.test") === 3L)
      assert(last("b.test") === 1L)
    } finally q.stop()
  }
}
