package graft

import graft.ops.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Dedup-family operators: exact, hash-keyed exact, MinHash LSH near-dup
  * (including the no-cartesian plan property), SimHash. */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id per group with copy counts") {
    val d = docs(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val r = Dedup.exact(d, Seq("text"), "doc_id")
      .orderBy("keep_id").collect()
    assert(r === Array(Row("aaa", 1L, 3L), Row("bbb", 2L, 1L)))
  }

  test("exactByHash shuffles md5 keys but yields identical groups") {
    val d = docs(1L -> "aaa", 2L -> "bbb", 3L -> "aaa")
    val viaText = Dedup.exact(d, Seq("text"), "doc_id")
      .select(col("keep_id"), col("copies")).orderBy("keep_id").collect()
    val viaHash = Dedup.exactByHash(d, "text", "doc_id")
      .select(col("keep_id"), col("copies")).orderBy("keep_id").collect()
    assert(viaText === viaHash)
  }

  test("minhash near-dup finds identical docs with jaccard 1.0, skips disjoint docs") {
    val same = "the quick brown fox jumps over the lazy dog tonight"
    val other = "completely different words in this sentence apply here now"
    val d = docs(1L -> same, 2L -> same, 3L -> other)
    val pairs = Dedup.minhashNeardup(d).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert(p.getLong(0) === 1L && p.getLong(1) === 2L)
    assert(p.getDouble(2) === 1.0) // est_jaccard: all 8 minhashes agree
    assert(p.getDouble(3) === 1.0) // exact shingle jaccard
  }

  test("minhash near-dup plan contains no cartesian or nested-loop join") {
    val d = docs(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "x y z w v")
    val plan = Dedup.minhashNeardup(d).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
  }

  test("near-identical docs collide in at least one band (est < 1, jaccard < 1)") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val pairs = Dedup.minhashNeardup(docs(1L -> a, 2L -> b)).collect()
    assert(pairs.length === 1)
    val j = pairs.head.getDouble(3)
    assert(j > 0.5 && j < 1.0)
  }

  test("maxBucket skew guard drops degenerate buckets whole") {
    val boiler = "identical boilerplate text repeated across many documents here"
    val d = docs((1L to 5L).map(i => i -> boiler): _*)
    assert(Dedup.minhashNeardup(d).count() === 10)          // 5 choose 2
    assert(Dedup.minhashNeardup(d, maxBucket = 3).count() === 0)
  }

  test("simhash: 16-bit fingerprint, equal for equal token multisets") {
    val d = docs(1L -> "one two three", 2L -> "one two three", 3L -> "four five six")
    val r = Dedup.simhash(d).collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L).length === 16 && r(1L).forall(c => c == '0' || c == '1'))
    assert(r(1L) === r(2L))
    assert(r(1L) !== r(3L))
  }
}
