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
}
