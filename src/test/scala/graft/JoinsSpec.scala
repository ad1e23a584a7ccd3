package graft

import graft.ops.Joins
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** As-of and bucketed range joins: semantics against hand-computed truth and
  * a naive cross-join reference. */
class JoinsSpec extends SparkSpec {

  test("asofJoin: latest at-or-before match per key, null when none") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 10L), (1L, 101L, 25L), (2L, 102L, 5L))
      .toDF("user_id", "click_id", "click_us")
    val views = Seq((1L, 10L, 900L), (1L, 20L, 901L), (2L, 50L, 902L))
      .toDF("user_id", "view_us", "view_id")
    val r = Joins.asofJoin(clicks, views, "user_id", "click_us", "view_us", "view_id")
      .select("click_id", "view_id", "view_id_ts").orderBy("click_id").collect()
    assert(r === Array(
      Row(100L, 900L, 10L),  // ts 10 == view ts 10: at-or-before includes ties
      Row(101L, 901L, 20L),  // latest of {10, 20} <= 25
      Row(102L, null, null)))// user 2 has no view before ts 5
  }

  test("asofJoin plan: one shuffle on the key, no range join") {
    import spark.implicits._
    val l = (1L to 100L).map(i => (i % 5, i, i * 10)).toDF("k", "id", "ts")
    val r = (1L to 20L).map(i => (i % 5, i * 37, i)).toDF("k", "rts", "rv")
    val p = Joins.asofJoin(l, r, "k", "ts", "rts", "rv")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of compiled to a product join:\n$p")
  }

  test("rangeJoinBucketed == naive cross-join + filter") {
    import spark.implicits._
    val points = (0 until 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val intervals = Seq((1L, 5.0, 30.0), (2L, 29.5, 60.0), (3L, 100.0, 101.0))
      .toDF("iid", "lo", "hi")
    val bucketed = Joins.rangeJoinBucketed(points, "v", intervals, "lo", "hi", 10.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty)
  }

  test("asofJoin: a latest right row with NULL value wins as-is (no stale value substitution)") {
    import spark.implicits._
    val right = Seq((1L, 10L, Some("A")), (1L, 20L, None))
      .toDF("k", "rts", "rv")
    val left = Seq((1L, 30L)).toDF("k", "lts")
    val r = Joins.asofJoin(left, right, "k", "lts", "rts", "rv").head()
    // latest at-or-before is (ts=20, value=NULL); pairing ts=20 with "A"
    // would misreport when the value was observed
    assert(r.getAs[Long]("rv_ts") === 20L)
    assert(r.isNullAt(r.fieldIndex("rv")))
  }

  test("asofJoin: caller columns named like old internals survive") {
    import spark.implicits._
    val right = Seq((1L, 10L, "A")).toDF("k", "rts", "rv")
    val left = Seq((1L, 30L, "keep-me")).toDF("k", "lts", "_t")
    val r = Joins.asofJoin(left, right, "k", "lts", "rts", "rv").head()
    assert(r.getAs[String]("_t") === "keep-me")
  }

  test("saltedJoin rejects join types that would duplicate unmatched small rows") {
    import spark.implicits._
    import graft.ops.Partitioning
    val big = Seq((1L, "x")).toDF("k", "a")
    val small = Seq((1L, "y"), (2L, "unmatched")).toDF("k", "b")
    intercept[IllegalArgumentException] {
      Partitioning.saltedJoin(big, small, "k", joinType = "full")
    }
    // inner remains exact
    assert(Partitioning.saltedJoin(big, small, "k").count() === 1)
  }
}
