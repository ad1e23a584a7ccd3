package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE/DESCRIBE surface of an engine: per-column
  * cardinality, null, and mode statistics computed in a fixed number of
  * passes regardless of column count.
  */
object Profile {

  /** Per-column profile of `cols`: total rows, non-null count, exact
    * distinct-value count, and the most frequent value with its count
    * (ties broken toward the smallest value, so the row is deterministic).
    * Values are profiled in their canonical STRING form — callers pre-cast
    * floating columns to a fixed-precision decimal so the canonical form
    * is engine-independent.
    *
    * Scale shape: one melt (explode to (column, value) pairs — the same
    * row multiplication Catalyst's own multi-countDistinct Expand does,
    * made explicit) feeding two hash aggregations: (column, value) counts,
    * then per-column collapse where the mode is an argmax encoded as
    * min(struct(-count, value)) — no window, no per-column job, exactly
    * two shuffles for ANY number of columns. At 100 TB swap the exact ndv
    * for hll_sketch_agg per column (one pass, no melt) when approximation
    * is acceptable; this operator is the exact form. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val pairs: Seq[Column] =
      cols.flatMap(c => Seq(lit(c), col(c).cast("string")))
    val melted = df.select(explode(map(pairs: _*)))
      .toDF("col_name", "val")
    val vc = melted.groupBy("col_name", "val")
      .agg(count(lit(1)).as("cnt"))
    vc.groupBy("col_name").agg(
      sum(col("cnt")).as("n"),
      sum(when(col("val").isNotNull, col("cnt")).otherwise(lit(0L))).as("n_nonnull"),
      count(when(col("val").isNotNull, lit(1))).as("ndv"),
      // argmax over non-null values: min(struct(-cnt, val)) picks the
      // highest count, smallest value on ties (struct buffer → this one
      // agg plans as SortAggregate; wire volume is unchanged)
      min(when(col("val").isNotNull,
        struct((-col("cnt")).as("_neg"), col("val").as("_v")))).as("_m"))
      .select(col("col_name"), col("n"), col("n_nonnull"), col("ndv"),
        col("_m._v").as("top_val"),
        // an all-NULL column has no mode: top_val null, top_n 0 (never a
        // null count — the contract the oracle mirrors with a LEFT JOIN)
        coalesce(-col("_m._neg"), lit(0L)).as("top_n"))
  }
}
