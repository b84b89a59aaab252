package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanApi, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native as-of join — the full custom-operator stack (logical node →
 * planner strategy → physical operator) for the one relational shape
 * the built-in operators cannot express as a single pass:
 * "for each left row, the latest right row with right.ts <= left.ts
 * within the same key".
 *
 * [[graft.operators.AsOfJoin]] is the composition rendition (union +
 * one window pass — preference (a) of the build rules) and remains the
 * default; THIS operator is preference (c): a first-class
 * `LogicalPlan` node planned by an injected [[SparkStrategy]] into a
 * sort-merge [[SparkPlan]] whose per-partition merge is a single
 * O(|left| + |right|) forward scan with O(1) state — no union row
 * blow-up, no window buffering, and the right side's payload columns
 * never ride through a window frame.
 *
 * Scale shape: `requiredChildDistribution` asks Catalyst for the same
 * co-partitioning a SortMergeJoin gets (EnsureRequirements inserts the
 * hash exchanges and per-partition sorts; AQE coalesces both sides
 * consistently), so the operator inherits every shuffle optimization
 * the built-in joins enjoy. Output preserves the left side's
 * partitioning and ordering, so a downstream per-key window reuses the
 * exchange.
 *
 * Semantics (inclusive backward as-of, mirroring DuckDB's
 * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`):
 *  - every left row survives; the attached value is NULL when no right
 *    row qualifies;
 *  - NULL keys/timestamps never match (on either side);
 *  - among right rows tied on (key, ts) the merge keeps the last in
 *    sort order — callers wanting determinism under ties pre-aggregate
 *    the right side to unique (key, ts), like the gated query does.
 */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    asofOuts: Seq[AttributeReference],
    forward: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ asofOuts

  // asofOuts are GENERATED here, not forwarded from a child — declaring
  // them keeps CheckAnalysis' missing-attribute audit happy (the
  // Generate/ScriptTransformation convention)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOuts)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Registered via
  * `spark.experimental.extraStrategies` ([[NativeAsOf.ensureStrategy]])
  * or `GraftExtensions`. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.leftTs, p.rightKey, p.rightTs,
        p.rightValues, p.asofOuts, p.forward) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    asofOuts: Seq[AttributeReference],
    forward: Boolean = false)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOuts

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofOuts)

  // the SortMergeJoin ask: co-partition both sides on the key and sort
  // each partition by (key, ts) — EnsureRequirements supplies the
  // exchanges/sorts only where the child plans don't already satisfy it
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through in order: downstream keyed ops reuse both
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference[Expression](leftKey, lOut)
    val lTsB = BindReferences.bindReference[Expression](leftTs, lOut)
    val keyCmp = AsOfJoinExec.cmpFn(leftKey.dataType)
    val tsCmp = AsOfJoinExec.cmpFn(leftTs.dataType)
    // the right side binds nullable even when its columns are
    // non-nullable at the source: the miss path substitutes an all-null
    // row, and BindReferences takes nullability from the INPUT schema —
    // left as-is, a non-nullable BoundReference skips the null check
    // and reads raw zeros. The merge already holds the FULL matched
    // right row, so attaching k value columns is projection width
    // only — the scan and its O(1) state are unchanged.
    val projExprs: Seq[Expression] = lOut ++ rightValues
    val projInput = lOut ++ rOut.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rKeyB = BindReferences.bindReference[Expression](rightKey, rOut)
      val rTsB = BindReferences.bindReference[Expression](rightTs, rOut)
      val joined = new JoinedRow
      val nullRow = new GenericInternalRow(rOut.size)
      val proj = UnsafeProjection.create(projExprs, projInput)
      var rNext: InternalRow = if (rIter.hasNext) rIter.next() else null
      // the single O(1) state of the merge: the latest consumed right
      // row (copied — the iterator reuses its UnsafeRow) and its key
      var lastRow: InternalRow = null
      var lastKey: Any = null
      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTsB.eval(l)
        if (lk == null || lt == null) proj(joined(l, nullRow))
        else if (!forward) {
          // BACKWARD: consume right rows while "behind or at" (key, ts)
          // — left ts ascends within a key, so consumed rows stay valid;
          // the match is the last consumed row if it shares the key
          var done = false
          while (!done && rNext != null) {
            val rk = rKeyB.eval(rNext)
            val rt = rTsB.eval(rNext)
            if (rk == null || rt == null) {
              rNext = if (rIter.hasNext) rIter.next() else null
            } else {
              val kc = keyCmp(rk, lk)
              if (kc < 0 || (kc == 0 && tsCmp(rt, lt) <= 0)) {
                lastRow = rNext.copy()
                lastKey = rKeyB.eval(lastRow)
                rNext = if (rIter.hasNext) rIter.next() else null
              } else done = true
            }
          }
          val hit = lastRow != null && keyCmp(lastKey, lk) == 0
          proj(joined(l, if (hit) lastRow else nullRow))
        } else {
          // FORWARD: discard right rows strictly before (key, ts); the
          // match is then rNext itself when it shares the key (its ts
          // is >= lt by the loop exit condition)
          var done = false
          var hit = false
          while (!done && rNext != null) {
            val rk = rKeyB.eval(rNext)
            val rt = rTsB.eval(rNext)
            if (rk == null || rt == null) {
              rNext = if (rIter.hasNext) rIter.next() else null
            } else {
              val kc = keyCmp(rk, lk)
              if (kc < 0 || (kc == 0 && tsCmp(rt, lt) < 0)) {
                rNext = if (rIter.hasNext) rIter.next() else null
              } else {
                done = true
                hit = kc == 0
              }
            }
          }
          proj(joined(l, if (hit) rNext else nullRow))
        }
      }
    }
  }
}

object AsOfJoinExec {
  /** Total-order comparator for the supported key/timestamp types —
    * plain public-API compares, no catalyst internals. */
  private[plans] def cmpFn(dt: DataType): (Any, Any) => Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      (a, b) => java.lang.Integer.compare(
        a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType =>
      (a, b) => java.lang.Short.compare(
        a.asInstanceOf[Short], b.asInstanceOf[Short])
    case DoubleType =>
      (a, b) => java.lang.Double.compare(
        a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType =>
      (a, b) => java.lang.Float.compare(
        a.asInstanceOf[Float], b.asInstanceOf[Float])
    case StringType =>
      (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case _: DecimalType =>
      (a, b) => a.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .compare(b.asInstanceOf[org.apache.spark.sql.types.Decimal])
    case other => throw new IllegalArgumentException(
      s"asOfNative: unsupported key/timestamp type $other " +
        "(supported: integral, timestamp, date, float, string, decimal)")
  }
}

/** Public API over the custom operator. */
object NativeAsOf {

  /** Inclusive as-of join via [[AsOfJoinExec]] — same output contract
    * as [[graft.operators.AsOfJoin.asOf]]: `leftCols ++ (key, ts,
    * asof_<valueCol>)`; direction "backward" (latest right ts <= left
    * ts) or "forward" (earliest right ts >= left ts), both one O(n+m)
    * merge. Both sides are re-aliased projections, so self-as-of (left
    * and right from the same table) gets fresh attribute ids. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      leftCols: Seq[String],
      direction: String = "backward"): DataFrame =
    asOfMulti(left, right, keyCol, tsCol, Seq(valueCol), leftCols, direction)

  /** [[asOf]] attaching MULTIPLE right-side payload columns in one
    * merge — each emitted as `asof_<col>`, all from the SAME matched
    * row (the whole-payload contract the union+window composition
    * gets by packing a struct). The merge holds the full right row
    * either way, so k columns cost only projection width. */
  def asOfMulti(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      leftCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward")(direction),
      s"direction must be backward|forward, got $direction")
    require(valueCols.nonEmpty, "asOfNative: at least one value column")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lSel = (leftCols :+ keyCol :+ tsCol).distinct
    val l = left.select(lSel.map(c => col(c).as(c)): _*)
    val r = right.select(
      (Seq(keyCol, tsCol) ++ valueCols).distinct.map(c => col(c).as(c)): _*)
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asOfNative: column $n missing"))
    val rvs = valueCols.map(attr(rPlan, _))
    AsOfJoinExec.cmpFn(attr(lPlan, keyCol).dataType) // fail fast on type
    AsOfJoinExec.cmpFn(attr(lPlan, tsCol).dataType)
    val outs = valueCols.zip(rvs).map { case (c, rv) =>
      AttributeReference(s"asof_$c", rv.dataType, nullable = true)()
    }
    GraftPlanApi.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, keyCol), attr(lPlan, tsCol),
      attr(rPlan, keyCol), attr(rPlan, tsCol), rvs, outs,
      forward = direction == "forward"))
  }

  /** Idempotently register [[AsOfJoinStrategy]] on the session. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val es = spark.experimental.extraStrategies
    if (!es.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies = es :+ new AsOfJoinStrategy
  }
}
