package graft
import org.apache.spark.sql.SparkSession
/** Prints formatted physical plans for selected queries — plan-hygiene
  * inspection (pushdown, broadcast, codegen spans).
  *
  * With NO args it dumps the ENTIRE query registry (minus the
  * documented [[PlanDump.excluded]] set), so PLANS.md regenerated via
  * `tools/plans.sh` always covers every gated query — the round-11
  * hand-curated 234-name list left 91 gated queries without a
  * human-readable plan record. Constructing a plan executes any
  * driver-side build stages a query has (scratch materializations,
  * Lloyd rounds, index writes), so the full dump is a short sf0.01
  * run, not a pure metadata pass. */
object PlanDump {
  /** Queries excluded from the no-args full dump, each with a reason.
    * Empty at HEAD: every registered query constructs (and explains)
    * against sf0.01 — the plan-hygiene walkers already build all of
    * them per test run. */
  val excluded: Map[String, String] = Map.empty

  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(excluded.contains)
    if (args.isEmpty)
      // machine-checkable header for tools/plans.sh: section count must
      // equal the registry minus the (reason-documented) exclusions
      println(s"registry_size=${SparkEntry.queries.size - excluded.size}" +
        s" excluded=${excluded.size}")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
