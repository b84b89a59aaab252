package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SimHash fingerprint as a native expression: per whitespace token of the
 * normalized text take a 64-bit token hash, then for each of `bits`
 * positions sum ±1 across tokens and keep the sign bit. One pass per
 * row; the built-in formulation unrolls into `bits` interpreted
 * array-aggregate lambdas (~10× slower, re-tokenizing per bit).
 *
 * Two token-hash families (same strategy as TextFunctions: xxhash for
 * speed, md5 for cross-engine reproducibility):
 *  - `md5Family = false`: xxhash64 (seed 42, via XxHash64Function —
 *    values identical to the built-in composition). Production default.
 *  - `md5Family = true`: first 4 md5 bytes as unsigned 32-bit (the same
 *    token hash the MinHash oracle uses) — bit-for-bit reproducible in
 *    DuckDB, so the whole fingerprint is oracle-checkable. Requires
 *    bits ≤ 32.
 */
case class SimHash64(child: Expression, bits: Int, md5Family: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"simhash needs a string input, got ${child.dataType}")
    else if (md5Family && bits > 32)
      TypeCheckResult.TypeCheckFailure(
        s"simhash md5 family provides 32 hash bits, got bits=$bits")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString, bits, md5Family)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c.toString(), $bits, $md5Family);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(text: String, bits: Int, md5Family: Boolean): Long = {
    val toks = MinHashSignature.normalize(text).split(' ')
    val md = if (md5Family) java.security.MessageDigest.getInstance("MD5") else null
    val acc = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      val h =
        if (md5Family) {
          val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          md.reset()
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        } else XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def simhash64(text: Column, bits: Int = 32, md5Family: Boolean = false): Column =
    org.apache.spark.sql.GraftExpr.column(
      SimHash64(org.apache.spark.sql.GraftExpr.expression(text), bits, md5Family))
}
