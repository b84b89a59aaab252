package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass MinHash signature as a native Catalyst expression.
 *
 * Why a custom Expression instead of composing built-ins: the built-in
 * formulations either (a) materialize the shingle array per row and run H
 * interpreted higher-order-function passes over it, or (b) explode
 * shingles to rows and aggregate — which SHUFFLES the exploded gram
 * stream (k× the input bytes; at 100 TB that is the whole job's cost).
 * This expression computes all H minhashes in a single tight loop over
 * the normalized text, map-side, allocation-free per shingle — the
 * signature computation rides inside WholeStageCodegen via a static call
 * (preference order (b) of the build rules: custom Expression before
 * custom physical operator).
 *
 * Semantics (mirrored exactly by the DuckDB oracle, see
 * OracleFragments.minhashPermExpr):
 *   norm   = lower(trim(ws-collapse(text)))
 *   grams  = k-char sliding windows of norm (short text → one gram)
 *   x(g)   = first 4 bytes of md5(g) as unsigned 32-bit
 *   mh_i   = min over grams of (A_i * x + B_i) mod P,  P = 4294967311
 * A_i/B_i < 2^30 so A*x + B < 2^62: no 64-bit overflow in either engine.
 */
case class MinHashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs a string input, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignature.compute(input.asInstanceOf[UTF8String].toString, shingleK, numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinHashSignature.compute($c.toString(), $shingleK, $numHashes));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Modulus: smallest prime > 2^32. */
  val P: Long = 4294967311L

  /** Deterministic permutation params, single source of truth for both
    * the expression and the generated oracle SQL. Odd A, both < 2^30. */
  def paramA(i: Int): Long = ((2654435761L * (i + 1) + 0x9E3779B9L) % (1L << 30)) | 1L
  def paramB(i: Int): Long = (40503L * (i + 1) * 69069L + 12345L) % (1L << 30)

  /** Whitespace-collapse + trim + lower — must match
    * TextFunctions.normalizeText and the oracle's regexp_replace. */
  def normalize(text: String): String =
    text.replaceAll("\\s+", " ").trim.toLowerCase(Locale.ROOT)

  def compute(text: String, k: Int, h: Int): Array[Long] = {
    val norm = normalize(text)
    val md = MessageDigest.getInstance("MD5")
    val as = Array.tabulate(h)(paramA)
    val bs = Array.tabulate(h)(paramB)
    val mins = Array.fill(h)(Long.MaxValue)
    val n = math.max(norm.length - k + 1, 1)
    var i = 0
    while (i < n) {
      val g = norm.substring(i, math.min(i + k, norm.length))
      val d = md.digest(g.getBytes(StandardCharsets.UTF_8))
      md.reset()
      val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < h) {
        val v = (as(j) * x + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  /** Column API. */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    org.apache.spark.sql.GraftExpr.column(
      MinHashSignature(org.apache.spark.sql.GraftExpr.expression(text), k, numHashes))
}

/**
 * Rolling-hash (winnowing-style) document fingerprint: the minimum md5
 * over all k-char shingles of the normalized text, as lowercase hex —
 * value-identical to `min(md5(gram))` over exploded shingles, but one
 * map-side pass with no explode and no shuffle. Hex strings compare like
 * the underlying digests (hex is byte-order monotonic), so the min is
 * taken on raw digests and converted once.
 */
case class MinShingleMd5(child: Expression, shingleK: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_shingle_md5 needs a string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "min_shingle_md5"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      MinShingleMd5.compute(input.asInstanceOf[UTF8String].toString, shingleK))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.MinShingleMd5.compute($c.toString(), $shingleK));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}

object MinShingleMd5 {
  def compute(text: String, k: Int): String = {
    val norm = MinHashSignature.normalize(text)
    val md = MessageDigest.getInstance("MD5")
    val n = math.max(norm.length - k + 1, 1)
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      val g = norm.substring(i, math.min(i + k, norm.length))
      val d = md.digest(g.getBytes(StandardCharsets.UTF_8))
      md.reset()
      if (min == null || unsignedLess(d, min)) min = d
      i += 1
    }
    min.map(b => f"${b & 0xff}%02x").mkString
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def minShingleMd5(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftExpr.column(
      MinShingleMd5(org.apache.spark.sql.GraftExpr.expression(text), k))
}
