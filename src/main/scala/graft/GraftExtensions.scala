package graft

import graft.functions.MinHashSignature
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions: expose graft's native expressions to SQL users.
 *
 *   spark.sql.extensions=graft.GraftExtensions          (config), or
 *   GraftExtensions.register(spark)                     (programmatic)
 *
 * After registration: `SELECT minhash_signature(text, 5, 8) FROM docs`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      GraftExtensions.minhashInfo,
      GraftExtensions.minhashBuilder))
}

object GraftExtensions {
  private[graft] val minhashInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, "minhash_signature")

  private[graft] val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      "minhash_signature(text, shingleK, numHashes) takes 3 arguments")
    MinHashSignature(
      exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].intValue())
  }

  /** Register on an existing session (tests / REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature", minhashBuilder, "scala_udf")
}
