package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.SqlShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (public scheme: Schleimer, Wilkerson,
  * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003) over a Karp–Rabin ROLLING hash of character k-grams:
  * each k-gram hash is derived from the previous in O(1); each window of
  * w consecutive gram hashes contributes its minimum; the fingerprint set
  * is the sorted distinct minima. Two documents sharing any sufficiently
  * long substring share a fingerprint — the classic near-dup/plagiarism
  * primitive.
  *
  * Arithmetic is exact integer mod 1e9+7 so the DuckDB oracle (direct
  * per-gram sums) reproduces it bit-for-bit for ASCII text. Implemented as
  * a native Catalyst expression (codegen via static call).
  */
case class RollingFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprint.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  val B = 257L
  val M = 1000000007L

  /** Karp–Rabin gram hashes (rolling O(1) update) + winnowing minima,
    * sorted distinct. Shorter-than-k text hashes as one whole-text gram.
    */
  def compute(s: String, k: Int, w: Int): ArrayData = {
    val n = s.length
    val kk = math.min(k, math.max(n, 1))
    // precomputed B^i mod M
    val pow = new Array[Long](kk)
    pow(0) = 1L
    var i = 1
    while (i < kk) { pow(i) = pow(i - 1) * B % M; i += 1 }
    val grams = math.max(n - kk + 1, if (n == 0) 0 else 1)
    if (grams == 0) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](grams)
    // first gram: direct sum
    var acc = 0L
    i = 0
    while (i < kk) { acc = (acc + s.charAt(i).toLong * pow(kk - 1 - i)) % M; i += 1 }
    h(0) = acc
    // rolling update
    var j = 1
    while (j < grams) {
      acc = java.lang.Math.floorMod(acc - s.charAt(j - 1).toLong * pow(kk - 1) % M, M)
      acc = (acc * B + s.charAt(j + kk - 1).toLong) % M
      h(j) = acc
      j += 1
    }
    // winnow: min of each window of w gram hashes
    val windows = math.max(grams - w + 1, 1)
    val mins = scala.collection.mutable.SortedSet.empty[Long]
    j = 0
    while (j < windows) {
      var m = Long.MaxValue
      var t = j
      val end = math.min(j + w, grams)
      while (t < end) { if (h(t) < m) m = h(t); t += 1 }
      mins += m
      j += 1
    }
    new GenericArrayData(mins.toArray)
  }

  /** Column entry point with the default geometry (k=8 chars, w=4). */
  def rolling_fingerprint(c: Column, k: Int = 8, w: Int = 4): Column =
    SqlShim.column(RollingFingerprint(SqlShim.expression(c), k, w))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint", exprs => RollingFingerprint(exprs.head, 8, 4), "built-in")
}
