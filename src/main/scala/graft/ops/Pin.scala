package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Driver-pinned iteration state: ONE bounded collect per loop round
 * instead of a scratch parquet write + read-back.
 *
 * Iterative operators (greedy ANN walks, random-walk frontiers,
 * per-round rank/vocabulary tables) keep per-round state that is tiny
 * by construction — one row per query/walk/piece — while their plans
 * must stay constant-size across rounds. The scratch-table loop
 * discipline achieves that with a write+read per round; pinning
 * achieves it with a collect into a local relation, saving the file
 * round-trip and its commit/listing overhead. Values round-trip
 * exactly: collected external rows (boxed longs/doubles/decimals/
 * strings/arrays) re-enter the plan bit-identical via
 * `createDataFrame`, no re-rounding anywhere.
 *
 * The bound is ENFORCED, not assumed, and it is BYTE-aware (the
 * round-13 advisory: a row bound calibrated for 16-byte edges admits
 * multi-GB collects when rows carry embedding vectors):
 *
 *  - rows: `spark.graft.maxLocalEdges` (default 1M — the shared
 *    driver-local gate used by the graph fast paths);
 *  - bytes: `spark.graft.maxLocalStateBytes` (default 64 MB).
 *
 * The fetch cap is derived BEFORE collecting: fixed-width schemas get
 * an exact per-row width; variable-width schemas (strings, arrays)
 * probe one row once per schema (cached per JVM) and size from it.
 * After the collect the ACTUAL bytes are re-checked, so a skewed
 * probe row can only cost a wasted collect, never an unbounded one.
 * Past either bound the state falls back to
 * [[Scratch.materialize]] — the distributed shape (the fallback
 * recomputes the plan; it is the rare path by construction).
 */
object Pin {

  val DefaultMaxRows: Long = 1000000L
  val DefaultMaxBytes: Long = 64L * 1024 * 1024

  /** One probed per-row width per schema per JVM: loops re-pin the
    * same-shaped state every round; only the first round pays the
    * 1-row probe job. */
  private val widthCache =
    new java.util.concurrent.ConcurrentHashMap[StructType, Long]()

  def state(df: DataFrame, tag: String): DataFrame = stateAt(df, tag)._1

  /** [[state]] that also hands back the fallback scratch path (null
    * when the state was pinned — [[Scratch.drop]] treats null as a
    * no-op), for iterative loops that retire superseded fallback
    * tables eagerly: at the scale where the fallback fires, the
    * per-round state is exactly the table one must not leak
    * O(iterations) copies of. */
  def stateAt(df: DataFrame, tag: String): (DataFrame, String) =
    collectBounded(df) match {
      case Some(rows) =>
        import scala.jdk.CollectionConverters._
        (df.sparkSession.createDataFrame(rows.toSeq.asJava, df.schema), null)
      case None => Scratch.materializeAt(df, s"${tag}_state")
    }

  /** The bounded collect behind [[state]], exposed for driver-local
    * fast paths that want the raw rows (the driverUnionFind /
    * fastRpLocal switchover pattern): Some(rows) when the frame fits
    * BOTH gates, None when the caller must stay distributed. */
  def collectBounded(df: DataFrame): Option[Array[Row]] = {
    val spark = df.sparkSession
    val rowBound = spark.conf.getOption("spark.graft.maxLocalEdges")
      .map(_.toLong).getOrElse(DefaultMaxRows)
    val byteBound = spark.conf.getOption("spark.graft.maxLocalStateBytes")
      .map(_.toLong).getOrElse(DefaultMaxBytes)
    if (rowBound <= 0L || byteBound <= 0L) return None
    val width = rowWidth(df)
    // fetch cap: the row bound, shrunk so (cap × estimated width) stays
    // inside the byte bound — the collect itself is what must be bounded
    val cap = math.min(rowBound, math.max(1L, byteBound / math.max(1L, width)))
    val fetch = (cap + 1L).min(Int.MaxValue.toLong).toInt
    // limit+collect plans as CollectLimitExec.executeTake, which by
    // default probes partitions in growing waves (1, 4, 16, …) — up to
    // 4 scheduling rounds per pin on a 32-partition aggregate, which is
    // pure overhead when the state is known-small and every partition
    // must be visited anyway. Pin the take to one wave for this collect.
    val prevWave = spark.conf.getOption("spark.sql.limit.initialNumPartitions")
    spark.conf.set("spark.sql.limit.initialNumPartitions", Int.MaxValue.toString)
    val rows =
      try df.limit(fetch).collect()
      finally prevWave match {
        case Some(v) => spark.conf.set("spark.sql.limit.initialNumPartitions", v)
        case None => spark.conf.unset("spark.sql.limit.initialNumPartitions")
      }
    if (rows.length <= cap && bytesOf(rows) <= byteBound) Some(rows) else None
  }

  /** Estimated bytes per external row: exact for fixed-width schemas;
    * probed from one collected row otherwise (cached per schema). */
  private def rowWidth(df: DataFrame): Long =
    fixedWidth(df.schema).getOrElse {
      val cached = widthCache.get(df.schema)
      if (cached > 0L) cached
      else {
        val probe = df.limit(1).collect()
        val w = if (probe.isEmpty) 64L else math.max(64L, bytesOf(probe))
        widthCache.put(df.schema, w)
        w
      }
    }

  /** Some(width) when every field is fixed-width; None otherwise. */
  private def fixedWidth(schema: StructType): Option[Long] = {
    def fieldWidth(dt: DataType): Option[Long] = dt match {
      case LongType | DoubleType | TimestampType | DateType => Some(8L)
      case IntegerType | FloatType => Some(4L)
      case ShortType => Some(2L)
      case ByteType | BooleanType => Some(1L)
      case _: DecimalType => Some(32L)
      case s: StructType => fixedWidth(s)
      case _ => None // strings, arrays, maps, binary: probe instead
    }
    val ws = schema.fields.map(f => fieldWidth(f.dataType))
    if (ws.forall(_.isDefined)) Some(ws.map(_.get).sum + 16L) else None
  }

  /** Conservative external-row byte estimate (boxing overhead folded
    * into per-value constants). */
  private[ops] def bytesOf(rows: Array[Row]): Long = {
    var total = 0L
    var i = 0
    while (i < rows.length) { total += valueBytes(rows(i)); i += 1 }
    total
  }

  private def valueBytes(v: Any): Long = v match {
    case null => 8L
    case r: Row =>
      var s = 16L; var i = 0
      while (i < r.length) { s += valueBytes(r.get(i)); i += 1 }
      s
    case s: String => 40L + 2L * s.length
    case a: Array[Byte] => 16L + a.length
    case seq: scala.collection.Seq[_] => 16L + seq.map(valueBytes).sum
    case m: scala.collection.Map[_, _] =>
      16L + m.iterator.map { case (k, x) => valueBytes(k) + valueBytes(x) }.sum
    case _: java.lang.Integer | _: java.lang.Float => 16L
    case _: java.math.BigDecimal | _: BigDecimal => 48L
    case _ => 16L // boxed long/double/timestamp/date/short/byte/boolean
  }
}
