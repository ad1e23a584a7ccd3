package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as built-ins, composed scale-first (SURVEY.md
  * §2.4 notes the reference has no joins at all; these are the
  * LLM-pipeline/telemetry additions the north star names — as-of and range).
  */
object Joins {

  /** As-of join: for every left row, the latest right row with the same key
    * and `rightTs` ≤ left's `ts` (telemetry "current state at event time").
    *
    * Scale shape: NOT a range join — both sides union into one frame, ONE
    * shuffle on `key`, and a running `last(_, ignoreNulls)` window carries
    * the most recent right value forward. Cost is a sort per key partition,
    * independent of match distance; a naive `l.ts >= r.ts` join is quadratic
    * per key.
    *
    * Right rows must be unique per (key, rightTs) — pre-aggregate duplicates
    * or results are sort-order-dependent. At equal timestamps the right row
    * sorts first, so "at-or-before" includes ties (DuckDB ASOF semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVal: String): DataFrame = {
    val l = left.withColumn("_t", col(leftTs)).withColumn("_is_left", lit(1))
    val r = right.select(col(key), col(rightTs).as("_t"),
      col(rightTs).as("_r_ts"), col(rightVal).as("_r_val"))
      .withColumn("_is_left", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(rightVal, last(col("_r_val"), ignoreNulls = true).over(w))
      .withColumn(s"${rightVal}_ts", last(col("_r_ts"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .drop("_t", "_is_left", "_r_ts", "_r_val")
  }

  /** Point-in-interval join without a cross product: each interval explodes
    * into the fixed-width buckets it overlaps, points equi-join their
    * bucket, the exact `[lo, hi)` predicate filters. Shuffle is keyed on
    * bucket ids — pick `bucketWidth` near the median interval width so
    * interval replication stays O(1) and no bucket is a hotspot. */
  def rangeJoinBucketed(points: DataFrame, pCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    val ivb = intervals.withColumn("_b", explode(sequence(
      floor(col(loCol) / bucketWidth).cast("long"),
      floor(col(hiCol) / bucketWidth).cast("long"))))
    val ptb = points.withColumn("_b", floor(col(pCol) / bucketWidth).cast("long"))
    ptb.join(ivb, "_b")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("_b")
  }
}
