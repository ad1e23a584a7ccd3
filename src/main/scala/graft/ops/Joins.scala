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
    // collision-safe internal names (a caller column named `_t` would be
    // silently clobbered and dropped otherwise)
    val T = "_graft_asof_t"; val L = "_graft_asof_is_left"; val R = "_graft_asof_r"
    val l = left.withColumn(T, col(leftTs)).withColumn(L, lit(1))
    // A NULL right timestamp must match NOTHING (ASOF `rightTs <= ts` is
    // never true on NULL — the DuckDB oracle agrees): drop such rows before
    // the union, or the NULLS-FIRST sort would carry their value into every
    // left row. A NULL LEFT timestamp then also sorts first, sees no
    // preceding right row, and correctly gets NULL.
    val r = right.filter(col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as(T),
      // ONE struct, not two parallel last() calls: independently-ignoring
      // nulls would pair the latest timestamp with an OLDER non-null value
      // whenever the latest right row carries a null value
      struct(col(rightTs).as("ts"), col(rightVal).as("v")).as(R))
      .withColumn(L, lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(T), col(L))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(R, last(col(R), ignoreNulls = true).over(w))
      .withColumn(rightVal, col(R)("v"))
      .withColumn(s"${rightVal}_ts", col(R)("ts"))
      .filter(col(L) === 1)
      .drop(T, L, R)
  }

  /** Point-in-interval join without a cross product: each interval explodes
    * into the fixed-width buckets it overlaps, points equi-join their
    * bucket, the exact `[lo, hi)` predicate filters. Shuffle is keyed on
    * bucket ids — pick `bucketWidth` near the median interval width so
    * interval replication stays O(1) and no bucket is a hotspot. */
  def rangeJoinBucketed(points: DataFrame, pCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive (zero/negative " +
      "widths saturate the bucket sequence or flip bucket signs)")
    // Upper bucket: hi is EXCLUSIVE, so a width-aligned interval must not
    // explode into the bucket starting exactly at hi (no point there can
    // match — for aligned intervals that replica doubled the interval-side
    // shuffle for pure waste). greatest(..) keeps degenerate lo==hi
    // intervals at one bucket; inverted intervals (hi < lo) are filtered
    // out entirely rather than fed to sequence(), which would descend and
    // emit spurious rows.
    val hiDiv = floor(col(hiCol) / bucketWidth).cast("long")
    val hiBucket = greatest(
      when(col(hiCol) === hiDiv * bucketWidth, hiDiv - 1).otherwise(hiDiv),
      floor(col(loCol) / bucketWidth).cast("long"))
    val ivb = intervals.filter(col(hiCol) >= col(loCol))
      .withColumn("_b", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"), hiBucket)))
    val ptb = points.withColumn("_b", floor(col(pCol) / bucketWidth).cast("long"))
    ptb.join(ivb, "_b")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("_b")
  }

  /** Sorted-neighborhood similarity join (Hernández & Stolfo, SIGMOD 1995):
    * sort by a blocking key, compare each row only with its next `window`
    * neighbors in that order, verify candidates with Levenshtein ≤
    * `maxDist`. The entity-resolution workhorse for typo-class duplicates
    * (near-identical identifiers), where token-set methods (MinHash /
    * n-gram Jaccard — [[Dedup]]) are blind because a one-character edit
    * isn't a token-level signal.
    *
    * Scale shape: O(N·window) comparisons total — no candidate blowup, no
    * cross join. The global order comes from [[Layout.globalSequence]]
    * (range-bucketed, no single-reducer window), and neighbor pairing is
    * an EQUI-join on (seq + i = seq), i ∈ 1..window — shuffle-partitioned
    * by sequence number, so partition boundaries need no special casing
    * (the classic windowing implementation must overlap partition edges;
    * the join formulation gets that for free). `sortKeyCol` must be a
    * non-null numeric blocking key, order-preserving for the comparison
    * you care about (e.g. the numeric run of an identifier string);
    * `idCol` breaks ties. Output: one row per ordered candidate pair
    * within distance — (l_id, l_str, r_id, r_str, dist). */
  def sortedNeighborhoodEditDist(df: DataFrame, strCol: String, idCol: String,
                                 sortKeyCol: Column, window: Int = 3,
                                 maxDist: Int = 2,
                                 buckets: Int = 64): DataFrame = {
    val seq = Layout.globalSequence(
      df.select(col(idCol), col(strCol), sortKeyCol.as("_sk"))
        .filter(col("_sk").isNotNull),
      "_sk", idCol, buckets)
      .select(col(idCol), col(strCol), col("seq"))
    val left = seq.select(col(idCol).as("l_id"), col(strCol).as("l_str"),
      col("seq").as("_ls"))
      .withColumn("_i", explode(array((1 to window).map(lit): _*)))
      .withColumn("_rs", col("_ls") + col("_i"))
    val right = seq.select(col(idCol).as("r_id"), col(strCol).as("r_str"),
      col("seq").as("_rs"))
    left.join(right, "_rs")
      .withColumn("dist", levenshtein(col("l_str"), col("r_str")))
      .filter(col("dist") <= maxDist)
      .select("l_id", "l_str", "r_id", "r_str", "dist")
  }
}
