package graft

import graft.ops.Bucketing

class BucketingSpec extends SparkTestBase {

  test("join of co-bucketed tables plans without a shuffle Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        spark.read.parquet(s"${sf()}/customer.parquet"), "b_customer", "c_custkey", 4)
      Bucketing.writeBucketed(
        spark.read.parquet(s"${sf()}/orders.parquet"), "b_orders", "o_custkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "b_customer", "b_orders",
        "c_custkey", "o_custkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle:\n$physical")
      assert(joined.count() == 1500) // every order matches its customer
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
