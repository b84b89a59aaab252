package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Runtime guard for the quadratic hazard of within-block self-joins.
 *
 * `cosinePairs` / `ngramJaccard` are documented as blocked-EXACT
 * operators: within one block the pair space is O(n²), and the contract
 * is that blocks are small (class labels, language+source cells). On a
 * skewed corpus that contract silently breaks — one dominant block at
 * 100× scale is an accidental near-cross-product that runs for hours
 * instead of failing loudly. This enforces the contract at runtime:
 * every block's row count is checked against an explicit bound DURING
 * the query (no separate driver job, no extra pass over the data — the
 * counts table is one cheap keyed agg of the block column, re-joined on
 * the key the self-join shuffles by anyway), and the first oversized
 * block raises with the block value, its size, and the escape route
 * (the LSH / IVF path, which exists precisely for that corpus shape).
 */
private[operators] object Blocks {

  /** Row-preserving: inner-join `withBlk` with its per-block counts
    * (1 row per block — AQE broadcasts it), where any count above
    * `maxRows` evaluates `raise_error` instead of `true`. The check
    * cannot be optimized away: the filter's value is data-dependent.
    * `hint` names the caller's escape route in the error message. */
  def guardBlockSize(
      withBlk: DataFrame,
      blkCol: String,
      maxRows: Long,
      op: String,
      hint: String = "within-block pairing is quadratic - split the block "
        + "or use the LSH/IVF path",
      boundName: String = "maxBlockRows"): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    val counts = withBlk.groupBy(col(blkCol)).agg(count(lit(1)).as("blk_n"))
    val guard = counts
      .select(col(blkCol),
        when(col("blk_n") <= maxRows, lit(true))
          .otherwise(raise_error(concat(
            lit(s"$op: block "), col(blkCol).cast("string"),
            lit(" has "), col("blk_n").cast("string"),
            lit(s" rows > $boundName=$maxRows; $hint"))))
          .as("blk_ok"))
      .filter(col("blk_ok"))
      .drop("blk_ok")
    withBlk.join(guard, Seq(blkCol))
  }
}
