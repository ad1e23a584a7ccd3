package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a lexical (BM25) ranking and a dense (embedding
  * cosine) ranking of the same corpus into one result list per query via
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the
  * standard serving shape for RAG retrieval, where neither leg alone is
  * robust (BM25 misses paraphrase, dense misses rare exact terms).
  *
  * Scale shape: each leg is ALREADY top-k bounded before fusion — BM25 by
  * its per-query ranking window over Σ df(query terms) candidates,
  * cosine by the broadcast-query + per-partition-heap pass
  * ([[Similarity.cosineTopK]]) — so the fusion join touches
  * #queries × legK rows per side regardless of corpus size. At 100 TB the
  * legs run against persisted indexes ([[graft.ops.Similarity]] IVF lists,
  * [[TextAnalysis.bm25WriteIndex]] bucketed postings) and the fusion stays
  * the same #queries-bounded join. Legs abstain independently: a document
  * ranked by only one leg simply gets that leg's contribution (the other
  * term of the sum is 0 via the outer join), which is RRF's own contract.
  */
object Retrieval {

  /** The shared evaluation query set — [[TextAnalysis.evalQueryPred]]
    * applied to each leg's own id column, so both legs answer the same
    * queries BY CONSTRUCTION (a single source for the constant). */
  private def evalPred(id: Column): Column = TextAnalysis.evalQueryPred(id)

  /** RRF contribution of one leg's rank: 1/(k0 + rank), 0 when the leg
    * did not rank the document. k0=60 per the original paper. */
  private def rrfTerm(rank: Column, k0: Int): Column =
    coalesce(lit(1.0) / (lit(k0.toDouble) + rank.cast("double")), lit(0.0))

  /** Fused top-k: (query_id, rank, doc_id, rrf_score, lex_rank,
    * dense_rank); absent leg ranks are reported as 0. The RRF sum is a
    * fixed two-term expression (lexical term + dense term, in that
    * order), so the double is bit-identical across engines given equal
    * leg ranks — ties (e.g. rank r in one leg only vs r in the other
    * only) break on doc_id. */
  def hybridRrf(docs: DataFrame, embeddings: DataFrame,
                topK: Int = 5, legK: Int = 20, k0: Int = 60): DataFrame = {
    val lex = TextAnalysis.bm25Search(docs, topK = legK,
      evalPred = evalPred(col("doc_id")))
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val dq = embeddings.filter(evalPred(col("vec_id")))
    val dc = embeddings.filter(!evalPred(col("vec_id")))
    val dense = Similarity.cosineTopK(dc, dq, legK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("dense_rank"))
    fuse(lex, dense, topK, k0)
  }

  // the RRF fusion core shared by the live and indexed forms: a full-outer
  // join of the two legs' (query_id, doc_id, rank) frames, then one
  // per-query ranking window over at most 2×legK rows per query
  private def fuse(lex: DataFrame, dense: DataFrame, topK: Int,
                   k0: Int): DataFrame = {
    val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        rrfTerm(col("lex_rank"), k0) + rrfTerm(col("dense_rank"), k0))
    fused
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf").cast("double").as("rrf_score"),
        coalesce(col("lex_rank"), lit(0)).cast("int").as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).cast("int").as("dense_rank"))
  }

  /** Build-once half of the hybrid serving pair: persist BOTH leg indexes
    * — the BM25 bucketed postings + stats ([[TextAnalysis.bm25WriteIndex]])
    * and the IVF inverted lists over the non-query embeddings
    * ([[Similarity.ivfWriteIndex]]) — under one prefix. At 100 TB each
    * serving call of the live form re-explodes the corpus for postings and
    * re-scans it for cosine; one build amortizes both across every query
    * batch. */
  def hybridRrfWriteIndexes(docs: DataFrame, embeddings: DataFrame,
                            prefix: String = "hybrid",
                            numCentroids: Int = 16, dim: Int = 64): Unit = {
    TextAnalysis.bm25WriteIndex(docs, s"${prefix}_bm25")
    Similarity.ivfWriteIndex(embeddings.filter(!evalPred(col("vec_id"))),
      s"${prefix}_ivf", numCentroids, dim)
  }

  /** Query-many half: identical fusion semantics to [[hybridRrf]], but
    * both legs serve from the persisted indexes — no postings build, no
    * corpus scan or centroid assignment at query time. With
    * `nprobe = numCentroids` (the default here) the IVF leg degenerates to
    * EXACT cosine ranking over the persisted lists — same scoring
    * expression and tie-break as the live brute leg — so the fused output
    * is row-identical to [[hybridRrf]] (RetrievalSpec pins it); smaller
    * nprobe trades that exactness for probed-list pruning exactly as
    * [[Similarity.ivfSearchIndexed]] documents. */
  def hybridRrfIndexed(spark: org.apache.spark.sql.SparkSession,
                       docs: DataFrame, embeddings: DataFrame,
                       topK: Int = 5, legK: Int = 20, k0: Int = 60,
                       prefix: String = "hybrid",
                       numCentroids: Int = 16, dim: Int = 64,
                       nprobe: Int = -1): DataFrame = {
    // nprobe < 0 (the default) resolves to numCentroids so the exact-leg
    // row-identity contract TRACKS the centroid count — a literal default
    // would silently under-probe any index built with more centroids
    val probes = if (nprobe < 0) numCentroids else nprobe
    val lex = TextAnalysis.bm25SearchIndexed(spark,
      TextAnalysis.bm25Queries(docs), s"${prefix}_bm25", topK = legK)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val dq = embeddings.filter(evalPred(col("vec_id")))
    val dense = Similarity.ivfSearchIndexed(spark, dq, s"${prefix}_ivf",
      k = legK, numCentroids = numCentroids, dim = dim, nprobe = probes)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("dense_rank"))
    fuse(lex, dense, topK, k0)
  }
}
