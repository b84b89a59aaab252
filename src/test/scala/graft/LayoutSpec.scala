package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Physical-layout maintenance (ops.Layout): small-file compaction
  * census/rewrite and Z-order data-skipping layout. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("compactionPlan: census counts leaves, files, bytes and plans targets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    (1 to 40).map(i => (i.toLong, s"row$i", if (i % 2 == 0) "a" else "b"))
      .toDF("id", "payload", "part")
      .repartition(8) // 8 small files per leaf
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    val plan = Layout.compactionPlan(spark, dir, targetBytes = 1L << 30)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(plan.keySet == Set("part=a", "part=b"))
    // each writer task emits a file per partition value it holds — some
    // of the 8 tasks may miss a value, so expect "several", not exactly 8
    plan.values.foreach { case (nFiles, bytes, target) =>
      assert(nFiles >= 4L && nFiles <= 8L && bytes > 0L && target == 1L)
    }
  }

  test("compact: leaf rewritten to target file count, data identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(10).write.mode("overwrite").parquet(s"$dir/leaf")
    val before = spark.read.parquet(s"$dir/leaf").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    val n = Layout.compact(spark, s"$dir/leaf", targetFiles = 1)
    assert(n == 1L)
    val after = spark.read.parquet(s"$dir/leaf").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(after == before)
  }

  test("mortonKey: interleaves bits (5,3) @3 bits -> 27; monotone in each arg") {
    val df = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.mortonKey(Seq(col("a"), col("b")), bitsPerCol = 3).as("z"))
    assert(df.collect().head.getLong(0) == 27L)
    // key must be strictly monotone when one bucket grows and the other is 0
    val mono = (0L to 7L).map { v =>
      Seq((v, 0L)).toDF("a", "b")
        .select(Layout.mortonKey(Seq(col("a"), col("b")), 3)).collect().head.getLong(0)
    }
    assert(mono == mono.sorted && mono.distinct.size == mono.size)
  }

  test("LayoutMain: compact mode rewrites oversized leaves; zorder mode writes output") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    (1 to 60).map(i => (i.toLong, (i % 4).toLong)).toDF("id", "k")
      .repartition(6).write.mode("overwrite").parquet(s"$dir/t")
    // plan + compact: 6 tiny files -> 1
    graft.pipeline.LayoutMain.run(spark, Map(
      "table" -> s"$dir/t", "mode" -> "compact", "target_bytes" -> (1L << 30).toString))
    val files = new java.io.File(s"$dir/t").listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(files == 1)
    assert(spark.read.parquet(s"$dir/t").count() == 60)
    // zorder mode end to end
    graft.pipeline.LayoutMain.run(spark, Map(
      "table" -> s"$dir/t", "mode" -> "zorder", "output" -> s"$dir/z",
      "zorder_cols" -> "id,k", "zorder_files" -> "2"))
    assert(spark.read.parquet(s"$dir/z").count() == 60)
    intercept[IllegalArgumentException] {
      graft.pipeline.LayoutMain.run(spark, Map(
        "table" -> s"$dir/t", "mode" -> "bogus"))
    }
  }

  test("zorderBy: each file covers a compact rectangle of both dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    Layout.zorderBy(df, dir,
      Seq(Layout.minMaxBucket(col("x"), 0, 64, bits = 6),
        Layout.minMaxBucket(col("y"), 0, 64, bits = 6)),
      nFiles = 16, bitsPerCol = 6)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("xr"), (max("y") - min("y")).as("yr"),
        count(lit(1)).as("n"))
      .collect()
    assert(perFile.map(_.getLong(3)).sum == 64L * 64L)
    // 16 z-curve segments over a 64x64 grid are ~16x16 blocks; range
    // boundaries come from sampling, so allow straddlers — but the
    // AVERAGE extent must stay block-like in BOTH dimensions (a plain
    // x-sort would give avg y-range ~63)
    def avg(i: Int) = perFile.map(_.getLong(i).toDouble).sum / perFile.length
    assert(avg(1) <= 30.0, s"avg x range ${avg(1)} too wide")
    assert(avg(2) <= 30.0, s"avg y range ${avg(2)} too wide")
  }
}
