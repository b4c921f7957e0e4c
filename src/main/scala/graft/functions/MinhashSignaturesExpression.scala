package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature vector as ONE native Catalyst expression: tokenizes,
  * builds word k-gram shingles, and takes, for each of `numHashes` hash
  * slots i, the lexicographic minimum of md5("i|" + shingle) — all in a
  * single pass over the document.
  *
  * Semantics are EXACTLY the composed Column pipeline it replaces
  * ([[graft.operators.TextOps.tokens]] / `shingles` / `minhash`), which is
  * also the DuckDB oracle's definition:
  *  - tokens: split on single spaces, empty strings dropped;
  *  - shingles: k consecutive tokens joined by one space; a document with
  *    fewer than k tokens contributes its whole raw text as one shingle;
  *  - slot i: min over shingles of lowercase-hex md5 of UTF-8("i|" ++ s).
  *
  * md5 (not xxhash64) keeps the cross-engine oracle valid (CLAUDE.md hash
  * parity note). The composed-Column form is higher-order-function lambdas
  * (CodegenFallback) and, at 8 slots, a plan tree the optimizer chews
  * seconds on; this expression is codegen'd via one static call and its
  * plan is a single node (VERDICT r1 "What's wrong" #2).
  */
case class MinhashSignatures(child: Expression, numHashes: Int, k: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 64, "numHashes in 1..64")
  require(k >= 2 && k <= 5, "supported shingle widths: 2..5")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signatures expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signatures"

  override def nullSafeEval(input: Any): Any =
    MinhashSignatures.compute(input.asInstanceOf[UTF8String].toString, numHashes, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSignatures.compute($c.toString(), $numHashes, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatures =
    copy(child = newChild)
}

object MinhashSignatures {
  private val md5Tl = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Lowercase-hex md5 of UTF-8 bytes — the cross-engine (DuckDB-parity)
    * hash primitive, shared with the ANN hyperplane derivation.
    */
  private[graft] def md5Hex(s: String): String = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HexDigits(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Single-pass tokenize -> shingle -> per-slot min(md5). */
  def compute(text: String, numHashes: Int, k: Int): ArrayData = {
    // tokens: split on ' ' (single space), drop empties — identical to
    // filter(split(text, " "), t => t != "")
    val toks = new scala.collection.mutable.ArrayBuffer[String](16)
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) toks += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    val mins = new Array[String](numHashes)
    def consume(shingle: String): Unit = {
      var h = 0
      while (h < numHashes) {
        val hex = md5Hex(h.toString + "|" + shingle)
        if (mins(h) == null || hex.compareTo(mins(h)) < 0) mins(h) = hex
        h += 1
      }
    }
    if (toks.length >= k) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= toks.length - k) {
        sb.setLength(0)
        var o = 0
        while (o < k) {
          if (o > 0) sb.append(' ')
          sb.append(toks(j + o))
          o += 1
        }
        consume(sb.toString)
        j += 1
      }
    } else {
      // fewer than k tokens: the whole RAW text is the single shingle
      consume(text)
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  /** Column entry point: array of `numHashes` md5-hex minima. */
  def minhash_signatures(c: Column, numHashes: Int = 8, k: Int = 3): Column =
    SqlShim.column(MinhashSignatures(SqlShim.expression(c), numHashes, k))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signatures", exprs => MinhashSignatures(exprs.head, 8, 3), "built-in")
}
