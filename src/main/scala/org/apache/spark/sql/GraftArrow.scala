package org.apache.spark.sql

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils
import org.apache.spark.util.SerializableConfiguration

/**
 * Distributed Arrow IPC stream writer — the data plane of an Arrow
 * Flight `do_put` with a pluggable byte destination: a filesystem
 * (`writeIpcStream`, one stream file per partition through the Hadoop
 * FileSystem API, so any configured scheme works from executors) or a
 * transport callback (`sendIpcStream`, one self-contained IPC stream per
 * row batch — the exact per-batch `write_nodes`/`write_edges` unit the
 * reference ships over Flight, _dofn.py:96-141, with executor memory
 * bounded by the batch size).
 *
 * Lives in org.apache.spark.sql to reach the private[sql] Arrow
 * conversion machinery (ArrowUtils / ArrowWriter) — the same classes
 * Spark's own Arrow collect path uses. Row/byte counts come back through
 * accumulators, so the stats are EXACT wire bytes (unlike schema-based
 * estimates) and cost no second pass.
 */
object GraftArrow {

  /** One Arrow IPC stream file per non-empty partition under `dir`,
    * written through the partition-resolved Hadoop FileSystem (works on
    * any scheme the cluster has configured, not just local disk). */
  def writeIpcStream(df: DataFrame, dir: String, batchSize: Int = 4096): (Long, Long) = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val sc = df.sparkSession.sparkContext
    val conf = new SerializableConfiguration(sc.hadoopConfiguration)
    val rowsAcc = sc.longAccumulator("graft_arrow_rows")
    val bytesAcc = sc.longAccumulator("graft_arrow_bytes")

    df.queryExecution.toRdd.foreachPartition { iter =>
      if (iter.hasNext) {
        val pid = TaskContext.getPartitionId()
        val path = new Path(dir, f"part-$pid%05d.arrow")
        val fs = path.getFileSystem(conf.value)
        val out = fs.create(path, true)
        withRoot(schema, tz, s"graft-ipc-$pid") { (root, writer) =>
          val ipc = new ArrowStreamWriter(root, null, Channels.newChannel(out))
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
            ipc.close(); out.close()
          }
        }
      }
    }
    (rowsAcc.value, bytesAcc.value)
  }

  /** Serialize every `batchSize` rows of each partition as ONE
    * self-contained Arrow IPC stream and hand the bytes to
    * `send(partitionId, bytes)` executor-side — the per-batch do_put
    * payload unit. `send` must be serializable; it typically resolves a
    * per-executor cached client.
    *
    * Delivery contract: AT-LEAST-ONCE. `send` runs inside the task, so a
    * task retry or a speculative duplicate re-sends batches that already
    * reached the endpoint, while the accumulators count each SUCCESSFUL
    * task once — delivered rows/bytes can exceed the reported stats. The
    * reference's Beam DoFn has the same contract (_dofn.py:96-141; Beam
    * bundles retry whole). Run sink jobs with speculation off, or key
    * batches idempotently server-side if exactly-once matters. */
  def sendIpcStream(
      df: DataFrame,
      batchSize: Int = 4096)(send: (Int, Array[Byte]) => Unit): (Long, Long) = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val sc = df.sparkSession.sparkContext
    val rowsAcc = sc.longAccumulator("graft_arrow_rows")
    val bytesAcc = sc.longAccumulator("graft_arrow_bytes")

    df.queryExecution.toRdd.foreachPartition { iter =>
      if (iter.hasNext) {
        val pid = TaskContext.getPartitionId()
        withRoot(schema, tz, s"graft-put-$pid") { (root, writer) =>
          var pending = 0
          var total = 0L
          def flush(): Unit = if (pending > 0) {
            writer.finish()
            val bos = new ByteArrayOutputStream()
            val ipc = new ArrowStreamWriter(root, null, Channels.newChannel(bos))
            try { ipc.start(); ipc.writeBatch(); ipc.end() } finally ipc.close()
            send(pid, bos.toByteArray)
            bytesAcc.add(bos.size().toLong)
            writer.reset()
            pending = 0
          }
          while (iter.hasNext) {
            writer.write(iter.next())
            pending += 1
            total += 1
            if (pending == batchSize) flush()
          }
          flush()
          rowsAcc.add(total)
        }
      }
    }
    (rowsAcc.value, bytesAcc.value)
  }

  /** Allocate a VectorSchemaRoot + row writer for `schema`, run `f`,
    * always release the Arrow allocations. */
  private def withRoot(
      schema: types.StructType,
      tz: String,
      allocName: String)(f: (VectorSchemaRoot, ArrowWriter) => Unit): Unit = {
    val arrowSchema = ArrowUtils.toArrowSchema(
      schema, tz, errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val alloc = ArrowUtils.rootAllocator
      .newChildAllocator(allocName, 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    try f(root, ArrowWriter.create(root))
    finally { root.close(); alloc.close() }
  }
}
