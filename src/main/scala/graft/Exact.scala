package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * The correctness oracle re-runs every query in a different engine
  * (DuckDB) and hash-compares values, so floating-point sums must be
  * order-independent and type-identical on both sides. Strategy:
  * do money arithmetic in exact DECIMAL (cast each input once; add
  * and multiply stay exact), cast the final aggregate to DOUBLE; keep counts
  * and integer-valued sums in BIGINT.
  */
object Exact {
  /** Two-decimal money/ratio column as exact decimal. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-independent exact money sum, surfaced as DOUBLE. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Sum of an integer-valued numeric column, as BIGINT. */
  def intSum(c: Column): Column = sum(c.cast("long"))

  /** Exact average of an integer-valued column, rounded. */
  def intAvg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast("long")).cast("double") / count(lit(1)), scale)

  /** Exact average of a two-decimal column, rounded: sums integer
    * cents (exact, order-independent) then divides in double.
    */
  def moneyAvg(c: Column, scale: Int = 4): Column =
    round((sum(dec2(c)) * lit(100)).cast("long").cast("double") /
      lit(100.0) / count(lit(1)), scale)

  /** Timestamp → epoch millis BIGINT (avoids cross-engine timestamp
    * type/zone mismatches in compared outputs).
    */
  def epochMs(c: Column): Column = unix_millis(c)
}
