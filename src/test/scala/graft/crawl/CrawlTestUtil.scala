package graft.crawl

import org.scalatest.Assertions._

/** Shared oracle-equivalence assertion. ONE definition so every suite pins
  * the FULL [[CrawlResult]] contract — when the contract grows a field, add
  * it here and every EQ suite asserts it (three private copies previously
  * diverged: the oldest silently omitted `errors`).
  */
object CrawlTestUtil {
  def assertEqualResults(oracle: CrawlResult, engine: CrawlResult): Unit = {
    assert(engine.trace === oracle.trace, "crawl ordering (trace) differs")
    assert(engine.seen === oracle.seen, "URL-seen set differs")
    assert(engine.docs.map(_.doc_id) === oracle.docs.map(_.doc_id),
      "doc set/order differs")
    engine.docs.zip(oracle.docs).foreach { case (e, o) =>
      // field-by-field: a span mismatch names the doc, index and field
      assert(e.spans.size === o.spans.size, s"span count differs for ${e.doc_id}")
      e.spans.zip(o.spans).zipWithIndex.foreach { case ((es, os), i) =>
        assert((es.kind, es.text, es.media_ref, es.offset) ===
          (os.kind, os.text, os.media_ref, os.offset),
          s"span $i of ${e.doc_id} differs")
      }
    }
    assert(engine.errors === oracle.errors, "errors table differs")
    assert(engine.redirects === oracle.redirects, "redirects table differs")
    assert(engine.duplicates === oracle.duplicates, "duplicates table differs")
  }
}
