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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      GraftExtensions.minhashInfo,
      GraftExtensions.minhashBuilder))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      GraftExtensions.cosineInfo,
      GraftExtensions.cosineBuilder))
    e.injectFunction((
      new FunctionIdentifier("simhash"),
      GraftExtensions.simhashInfo,
      GraftExtensions.simhashBuilder))
  }
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

  private[graft] val cosineInfo = new ExpressionInfo(
    classOf[graft.functions.CosineSim].getName, "cosine_sim")

  private[graft] val cosineBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "cosine_sim(a, b) takes 2 array arguments")
    graft.functions.CosineSim(exprs.head, exprs(1))
  }

  private[graft] val simhashInfo = new ExpressionInfo(
    classOf[graft.functions.SimHash64].getName, "simhash")

  private[graft] val simhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2 || exprs.length == 3,
      "simhash(text, bits[, use_md5_family]) takes 2 or 3 arguments")
    graft.functions.SimHash64(exprs.head,
      exprs(1).eval().asInstanceOf[Number].intValue(),
      if (exprs.length == 3) exprs(2).eval().asInstanceOf[Boolean] else false)
  }

  /** Register on an existing session (tests / REPL). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature", minhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", cosineBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("simhash", simhashBuilder, "scala_udf")
  }
}
