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
    e.injectFunction((
      new FunctionIdentifier("min_shingle_md5"),
      GraftExtensions.minShingleInfo,
      GraftExtensions.minShingleBuilder))
    e.injectFunction((
      new FunctionIdentifier("array_intersect_size"),
      GraftExtensions.intersectSizeInfo,
      GraftExtensions.intersectSizeBuilder))
    // the custom-operator stack: plans graft.plans.AsOfJoinPlan nodes
    // (config-based twin of NativeAsOf.ensureStrategy)
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** Evaluate a constant argument at plan time: non-foldable or NULL
    * arguments fail as proper AnalysisExceptions naming the parameter
    * (instead of a raw NPE/ClassCastException from eval()). */
  private def constArg(
      exprs: Seq[Expression], i: Int, fn: String, param: String, tpe: String): Any = {
    val e = exprs(i)
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException("NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`",
          "paramType" -> ("\"" + tpe + "\"")))
    val v = e.eval()
    if (v == null)
      throw new org.apache.spark.sql.AnalysisException("INVALID_PARAMETER_VALUE.NULL",
        Map("parameter" -> s"`$param`", "functionName" -> s"`$fn`"))
    v
  }

  private def constInt(exprs: Seq[Expression], i: Int, fn: String, param: String): Int =
    constArg(exprs, i, fn, param, "INT").asInstanceOf[Number].intValue()

  private def constBool(exprs: Seq[Expression], i: Int, fn: String, param: String): Boolean =
    constArg(exprs, i, fn, param, "BOOLEAN").asInstanceOf[Boolean]

  private[graft] val minhashInfo = new ExpressionInfo(
    classOf[MinHashSignature].getName, "minhash_signature")

  private[graft] val minhashBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3,
      "minhash_signature(text, shingleK, numHashes) takes 3 arguments")
    MinHashSignature(
      exprs.head,
      constInt(exprs, 1, "minhash_signature", "shingleK"),
      constInt(exprs, 2, "minhash_signature", "numHashes"))
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
      constInt(exprs, 1, "simhash", "bits"),
      if (exprs.length == 3) constBool(exprs, 2, "simhash", "use_md5_family") else false)
  }

  private[graft] val minShingleInfo = new ExpressionInfo(
    classOf[graft.functions.MinShingleMd5].getName, "min_shingle_md5")

  private[graft] val minShingleBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "min_shingle_md5(text, shingleK) takes 2 arguments")
    graft.functions.MinShingleMd5(exprs.head,
      constInt(exprs, 1, "min_shingle_md5", "shingleK"))
  }

  private[graft] val intersectSizeInfo = new ExpressionInfo(
    classOf[graft.functions.ArrayIntersectSize].getName, "array_intersect_size")

  private[graft] val intersectSizeBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "array_intersect_size(a, b) takes 2 array arguments")
    graft.functions.ArrayIntersectSize(exprs.head, exprs(1))
  }

  /** Register on an existing session (tests / REPL). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_signature", minhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", cosineBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("simhash", simhashBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("min_shingle_md5", minShingleBuilder, "scala_udf")
    reg.createOrReplaceTempFunction("array_intersect_size", intersectSizeBuilder, "scala_udf")
  }
}
