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

  test("asofJoin: NULL timestamps match nothing on either side") {
    import spark.implicits._
    // right row with NULL ts must never be carried; left row with NULL ts
    // must get NULL (ASOF `rightTs <= ts` is never true through NULL —
    // matches the DuckDB oracle's comparison semantics)
    val left = Seq((1L, Some(100L), 1L), (1L, None, 2L))
      .toDF("k", "lts", "lid")
    val right = Seq((1L, None: Option[Long], 42L), (1L, Some(90L), 7L))
      .toDF("k", "rts", "rv")
    val r = Joins.asofJoin(left, right, "k", "lts", "rts", "rv")
      .select("lid", "rv").orderBy("lid").collect()
    assert(r === Array(
      Row(1L, 7L),    // matches ts=90, NOT the NULL-ts row's 42
      Row(2L, null))) // NULL left ts -> no match
  }

  test("rangeJoinBucketed: aligned hi stays out of its boundary bucket; inverted intervals drop") {
    import spark.implicits._
    val points = Seq((19.0, "in"), (20.0, "out")).toDF("p", "tag")
    val ivs = Seq((0.0, 20.0, "aligned"), (30.0, 10.0, "inverted"))
      .toDF("lo", "hi", "name")
    val joined = Joins.rangeJoinBucketed(points, "p", ivs, "lo", "hi", 20.0)
    // [0,20) with width 20 must explode to exactly ONE bucket — assert via
    // the exploded frame row count reaching the join (plan-level would be
    // brittle; semantics: the result is right and the inverted interval
    // contributes nothing rather than descending-sequence garbage)
    val got = joined.select("tag", "name").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got === Array(("in", "aligned")))
    // degenerate lo == hi interval: no match (empty [x, x)), no crash
    val deg = Joins.rangeJoinBucketed(points, "p",
      Seq((20.0, 20.0, "empty")).toDF("lo", "hi", "name"), "lo", "hi", 20.0)
    assert(deg.count() === 0)
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

  test("sortedNeighborhoodEditDist: neighbor pairs within distance, " +
    "blocking bound respected") {
    import spark.implicits._
    // sort key = the numeric run; id 5's string is far from everything
    val df = Seq(
      (1L, "user-001"), (2L, "user-002"), (3L, "user-003"),
      (4L, "user-104"), (5L, "zzzz-105"), (6L, "user-106")
    ).toDF("id", "name")
    val sk = expr("try_cast(substr(name, 6, 3) AS BIGINT)")
    val got = Joins.sortedNeighborhoodEditDist(df, "name", "id", sk,
      window = 2, maxDist = 2, buckets = 2)
      .orderBy("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(4)))
    // order by numeric run: 001,002,003,104,105,106. window=2 pairs each
    // row with the next two; dist<=2 keeps (l,r,dist): (1,2,1) (1,3,1)
    // (2,3,1) (2,4,2) (3,4,2) (4,6,1); 5's name is >2 edits from both
    // its neighbors
    assert(got.toSeq === Seq((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1),
      (2L, 4L, 2), (3L, 4L, 2), (4L, 6L, 1)))
  }
}
