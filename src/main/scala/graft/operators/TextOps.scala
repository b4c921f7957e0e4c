package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis + text-dedup building blocks for the training-data
  * pipeline (driver brief: dedup, language-ID, quality scoring, token
  * counting, fingerprinting). Everything here is pure Column expressions —
  * whole-stage-codegen-friendly, no UDFs — and each op has a DuckDB-SQL
  * twin in [[graft.SparkEntry.oracleSql]].
  *
  * Hash parity note: md5 (not xxhash64) is the cross-engine fingerprint
  * primitive because the oracle (DuckDB) has md5 but not xxhash64; both
  * engines hash the identical UTF-8 bytes.
  */
object TextOps {

  /** Whitespace tokens, empty strings dropped (split/strip parity with
    * DuckDB's string_split + list_filter).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Word k-grams joined by single spaces; a document shorter than k tokens
    * contributes its whole text as one shingle (keeps minhash total).
    */
  def shingles(ts: Column, text: Column, k: Int): Column = {
    require(k >= 2 && k <= 5, "supported shingle widths: 2..5")
    val grams = transform(
      sequence(lit(1), size(ts) - (k - 1)),
      j => concat_ws(" ", (0 until k).map(o => element_at(ts, j + lit(o))): _*))
    when(size(ts) >= k, grams).otherwise(array(text))
  }

  /** MinHash signature column i (of H): lexicographic min over shingles of
    * md5(i || "|" || shingle) — string-min keeps the oracle portable (no
    * 64-bit hash in DuckDB).
    */
  def minhash(shingleCol: Column, i: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$i|"), s))))

  /** 16-bit SimHash as a bit string: bit j is set iff the majority of
    * tokens have md5 hex digit j >= '8'. Collapses near-identical token
    * multisets to the same signature.
    */
  def simhashBitSums(token: Column): Seq[Column] =
    (0 until 16).map { j =>
      sum(when(substring(md5(token), j + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$j")
    }

  def simhashFromSums(sums: Seq[Column]): Column =
    concat(sums.map(s => when(s > 0, "1").otherwise("0")).map(c => c.cast("string")): _*)

  /** Marker-set language/category scoring: number of marker words present
    * (as whole tokens) in the lowercased text.
    */
  def markerScore(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map(m => when(locate(s" $m ", padded) > 0, 1).otherwise(0))
      .reduce(_ + _)
  }

  /** Deterministic argmax over labeled scores (first label wins ties, in
    * the given order).
    */
  def argmaxLabel(scored: Seq[(String, Column)]): Column = {
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit(scored.last._1)) { case ((label, score), els) =>
      when(score === best, lit(label)).otherwise(els)
    }
  }
}
