package graft

import org.apache.spark.sql.functions._

/** Runtime join-filter injection — the optimizer feature that matters
  * most at 100 TB fact-scan joins: a selective dimension side injects a
  * bloom filter (or semi-join keys) into the fact scan, so the shuffle
  * carries only possibly-matching rows. No library code to write — the
  * point of this spec is to PIN the configuration contract (the flags
  * the 100 TB deployment must set, documented in README's deployment
  * section) and prove the plan carries the filter on this Spark. */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim join injects a runtime bloom filter into the fact scan") {
    val conf = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
      val dim = spark.read.parquet(s"${sf("sf0.01")}/orders.parquet")
        .filter(col("o_totalprice") > 400000) // selective build side
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter") || optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$optimized")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
