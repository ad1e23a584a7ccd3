package graft

import graft.ops.{Retrieval, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hybrid BM25+dense RRF fusion (round 11). */
class RetrievalSpec extends SparkSpec {

  test("hybridRrf: fusion matches a plain-Scala recombination of the legs") {
    import spark.implicits._
    // doc 3 is the only eval query (3 % 17 == 3); doc 2 shares no term
    // with it (lexical leg abstains) but has an embedding (dense ranks it)
    val docs = Seq(
      (3L, "alpha beta gamma"),
      (0L, "alpha beta gamma delta"),
      (1L, "alpha epsilon"),
      (2L, "zeta eta theta"),
      (4L, "beta gamma delta"),
      (5L, "unrelated words here")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (3L, Array(1.0f, 0.0f)), (0L, Array(0.2f, 0.98f)),
      (1L, Array(0.95f, 0.1f)), (2L, Array(0.0f, 1.0f)),
      (4L, Array(0.7f, 0.7f)), (5L, Array(-1.0f, 0.05f))
    ).toDF("vec_id", "embedding")

    val got = Retrieval.hybridRrf(docs, emb, topK = 5, legK = 20)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5)))

    // independent recombination from the raw legs
    val lex = TextAnalysis.bm25Search(docs, topK = 20).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap
    val dq = emb.filter(col("vec_id") % 17 === 3 && col("vec_id") < 544)
    val dc = emb.filter(!(col("vec_id") % 17 === 3 && col("vec_id") < 544))
    val dense = Similarity.cosineTopK(dc, dq, 20).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val expected = (lex.keySet ++ dense.keySet).toSeq
      .map { case k @ (q, d) =>
        val rrf = lex.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          dense.get(k).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        (q, d, rrf, lex.getOrElse(k, 0), dense.getOrElse(k, 0))
      }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(5).zipWithIndex.map {
          case ((_, d, rrf, lr, dr), i) => (q, i + 1, d, rrf, lr, dr)
        }
      }.sortBy(t => (t._1, t._2))

    assert(got.toSeq === expected)
    // the lexical leg abstained on doc 2 but fusion still surfaces it
    assert(got.exists(t => t._3 == 2L && t._5 == 0 && t._6 > 0))
  }

  test("hybridRrfIndexed: row-identical to the live fusion; query-time " +
    "plan is table-backed with no corpus explode or centroid assignment") {
    import spark.implicits._
    // a larger deterministic corpus so both legs rank non-trivially:
    // 40 docs over a 6-word vocabulary, 8-dim embeddings; docs 3/20/37
    // are the eval queries (id % 17 == 3)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    def text(i: Long) = (0 until 5).map(j =>
      words(((i * 7 + j * 3) % words.size).toInt)).mkString(" ")
    def vec(i: Long): Array[Float] =
      (0 until 8).map(d => ((i * 31 + d * 17) % 13 - 6).toFloat).toArray
    val docs = (0L until 40L).map(i => (i, text(i))).toDF("doc_id", "text")
    val emb = (0L until 40L).map(i => (i, vec(i))).toDF("vec_id", "embedding")

    Retrieval.hybridRrfWriteIndexes(docs, emb, "hybt",
      numCentroids = 4, dim = 8)
    val indexed = Retrieval.hybridRrfIndexed(spark, docs, emb,
      prefix = "hybt", numCentroids = 4, dim = 8, nprobe = 4)
    val live = Retrieval.hybridRrf(docs, emb)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5))).toSet
    assert(rows(indexed) === rows(live) && rows(live).nonEmpty)

    // serving plan: both persisted tables appear; the only Generate is
    // the query frame's own term explode (the live plan explodes the
    // corpus too), and no centroid assignment runs at query time
    val p = indexed.queryExecution.executedPlan.toString
    assert(p.contains("hybt_bm25_postings"),
      s"lexical leg not served from the persisted postings:\n$p")
    assert(p.contains("hybt_ivf_lists"),
      s"dense leg not served from the persisted lists:\n$p")
    assert(!p.contains("array_position"),
      s"dense leg still assigns the corpus to centroids at query time:\n$p")
    val gens = "Generate".r.findAllIn(p).length
    val liveGens = "Generate".r
      .findAllIn(live.queryExecution.executedPlan.toString).length
    assert(gens < liveGens,
      s"indexed plan still explodes the corpus ($gens vs $liveGens)")
  }
}
