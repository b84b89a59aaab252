package org.apache.spark.sql

import java.io.FileOutputStream

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.TaskContext
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils

/**
 * Distributed Arrow IPC stream writer — the data plane of an Arrow
 * Flight `do_put` without the network transport (the Flight jars are not
 * on this classpath; the stream framing is identical, so a transport
 * swap is the only delta for a live GDS target).
 *
 * Lives in org.apache.spark.sql to reach the private[sql] Arrow
 * conversion machinery (ArrowUtils / ArrowWriter) — the same classes
 * Spark's own Arrow collect path uses. One IPC stream file per non-empty
 * partition, rows batched `batchSize` at a time; row/byte counts come
 * back through accumulators, so the stats are EXACT wire bytes (unlike
 * schema-based estimates) and cost no second pass.
 */
object GraftArrow {

  def writeIpcStream(df: DataFrame, dir: String, batchSize: Int = 4096): (Long, Long) = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    new java.io.File(dir).mkdirs()
    val sc = df.sparkSession.sparkContext
    val rowsAcc = sc.longAccumulator("graft_arrow_rows")
    val bytesAcc = sc.longAccumulator("graft_arrow_bytes")

    df.queryExecution.toRdd.foreachPartition { iter =>
      if (iter.hasNext) {
        val pid = TaskContext.getPartitionId()
        val arrowSchema = ArrowUtils.toArrowSchema(
          schema, tz, errorOnDuplicatedFieldNames = true, largeVarTypes = false)
        val alloc = ArrowUtils.rootAllocator
          .newChildAllocator(s"graft-ipc-$pid", 0, Long.MaxValue)
        val root = VectorSchemaRoot.create(arrowSchema, alloc)
        val writer = ArrowWriter.create(root)
        val out = new FileOutputStream(new java.io.File(dir, f"part-$pid%05d.arrow"))
        val ipc = new ArrowStreamWriter(root, null, out.getChannel)
        try {
          ipc.start()
          var pending = 0
          var total = 0L
          while (iter.hasNext) {
            writer.write(iter.next())
            pending += 1
            total += 1
            if (pending == batchSize) {
              writer.finish(); ipc.writeBatch(); writer.reset(); pending = 0
            }
          }
          if (pending > 0) { writer.finish(); ipc.writeBatch(); writer.reset() }
          ipc.end()
          rowsAcc.add(total)
          bytesAcc.add(ipc.bytesWritten())
        } finally {
          ipc.close(); out.close(); root.close(); alloc.close()
        }
      }
    }
    (rowsAcc.value, bytesAcc.value)
  }
}
