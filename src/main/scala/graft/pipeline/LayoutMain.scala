package graft.pipeline

import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * CLI entry point for physical-layout maintenance — the scheduled job a
 * warehouse runs beside ingest ([[CurateMain]]) and projection
 * ([[Main]]):
 *
 *   --table <dir>            table root (parquet)
 *   --mode plan              print the compaction census (default)
 *   --mode compact           rewrite every leaf whose file count
 *                            exceeds its target
 *   --mode zorder            rewrite the table Z-ordered
 *   --target_bytes 134217728 compaction target file size
 *   --output <dir>           zorder output root (required for zorder)
 *   --zorder_cols a,b        numeric columns to interleave (zorder)
 *   --zorder_files 64        output file count (zorder)
 *
 * All work is the library operators' ([[Layout]]); this main only
 * parses flags and sequences the per-leaf rewrites.
 */
object LayoutMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-layout")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, Cli.parseArgs(args)) finally spark.stop()
  }

  /** The testable body: everything main does after session creation. */
  def run(spark: SparkSession, a: Map[String, String]): Unit = {
    val table = a.getOrElse("table",
      throw new IllegalArgumentException("--table is required"))
    val mode = a.getOrElse("mode", "plan")
    val targetBytes = a.get("target_bytes").map(_.toLong).getOrElse(128L << 20)
    val plan = Layout.compactionPlan(spark, table, targetBytes)
      mode match {
        case "plan" =>
          plan.orderBy(col("partition")).collect().foreach { r =>
            println(s"${r.getString(0)}\tfiles=${r.getLong(1)}" +
              s"\tbytes=${r.getLong(2)}\ttarget=${r.getLong(3)}")
          }
        case "compact" =>
          val todo = plan.filter(col("n_files") > col("target_files"))
            .collect()
          todo.foreach { r =>
            val leaf = if (r.getString(0) == "/") table
              else s"$table/${r.getString(0)}"
            val n = Layout.compact(spark, leaf, r.getLong(3).toInt)
            println(s"compacted ${r.getString(0)}: ${r.getLong(1)} -> $n files")
          }
          if (todo.isEmpty) println("nothing to compact")
        case "zorder" =>
          val out = a.getOrElse("output",
            throw new IllegalArgumentException("--output is required for zorder"))
          val cols = a.getOrElse("zorder_cols",
            throw new IllegalArgumentException("--zorder_cols is required"))
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(cols.nonEmpty, "--zorder_cols must name at least one column")
          val nFiles = a.get("zorder_files").map(_.toInt).getOrElse(64)
          val df = spark.read.parquet(table)
          // bucket each column by its observed min/max (one tiny agg)
          import org.apache.spark.sql.functions.{min, max}
          val aggs = cols.flatMap(c =>
            Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
          val stats = df.agg(aggs.head, aggs.tail: _*).collect().head
          // an empty table or an all-null column yields null min/max —
          // getDouble would NPE; name the column instead
          val bounds: Seq[(Double, Double)] = cols.zipWithIndex.map {
            case (c, i) =>
              if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1))
                throw new IllegalArgumentException(
                  s"zorder: column '$c' has no non-null values "
                    + "(empty table or all-null column) - nothing to z-order")
              (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
          }
          val buckets = cols.zip(bounds).map { case (c, (lo, hi)) =>
            Layout.minMaxBucket(col(c), lo, math.nextUp(hi), bits = 8)
          }
          Layout.zorderBy(df, out, buckets, nFiles)
          println(s"zordered $table -> $out (${cols.mkString(",")}, $nFiles files)")
        case other =>
          throw new IllegalArgumentException(s"unknown --mode '$other'")
      }
  }
}
