package graft.tools

import org.apache.spark.sql.DataFrame

/** Helpers shared by the `graft.tools` probes (one definition — probe
  * copies of these had started to diverge once before, see
  * CrawlTestUtil's history).
  */
object ProbeUtil {
  /** Order-independent CONTENT digest of a table: sum of per-row xxhash64
    * over every column — fully distributed, nothing collected; distinct
    * contents with equal counts cannot pass it. Per-row hashes sum as
    * decimal(38,0): a raw long sum overflows (ANSI ARITHMETIC_OVERFLOW)
    * almost surely past ~10^6 uniform hashes.
    */
  def contentHash(df: DataFrame): String = {
    import org.apache.spark.sql.functions._
    df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*)
        .cast("decimal(38,0)").as("h"))
      .agg(coalesce(sum(col("h")), lit(0).cast("decimal(38,0)")))
      .head().getDecimal(0).toPlainString
  }
}
