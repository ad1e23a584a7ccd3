package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility behind DESIGN.md's measured-scaling tables: times selected
  * operators at 1× and 10× corpus size (documents replicated with a
  * distinct tag word / embeddings with a vec_id offset, so replicas are
  * near- but not exact duplicates — the hostile case for pair-producing
  * operators). Not part of the driver contract; run with
  * `sbt "runMain graft.gen.ScaleProbe"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = RawGen.table(spark, sfDir, "documents")
    val docs10 = (0 until 10).map { r =>
      docs1.select((col("doc_id") * 10 + r).as("doc_id"),
        concat(col("text"), lit(s" replicatag$r")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32).persist()
    val emb1 = RawGen.table(spark, sfDir, "embeddings")
    val emb10 = (0 until 10).map { r =>
      emb1.select((col("vec_id") * 10 + r).as("vec_id"), col("embedding"), col("label"))
    }.reduce(_ unionByName _)
      .repartition(32).persist()
    println(s"[probe] docs n1=${docs1.count()} n10=${docs10.count()} " +
      s"emb n10=${emb10.count()}")

    def time(name: String, df: => DataFrame): Double = {
      df.queryExecution.toRdd.count()  // warm codegen + caches
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s $sec%6.2f s  rows=$n")
      sec
    }
    // measured growth exponent for the 10x input: t10/t1 = 10^e, so
    // e = log10(ratio); linear work ~ 1.0, n log n ~ 1.1, quadratic ~ 2.0.
    // Sub-linear readings mean the 1x run is overhead-dominated (fixed
    // per-query planning/launch costs hide the data term).
    // optional comma-separated pair-name allowlist for targeted reruns;
    // an empty/typo'd list must fail loudly, not silently probe nothing
    // (same rationale as Bench's SPARK_GRAFT_ONLY guard)
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(keep => require(keep.nonEmpty,
      "SPARK_GRAFT_PROBE_ONLY is set but names no pairs"))
    var probed = 0

    def pair(name: String, at1x: => DataFrame, at10x: => DataFrame): Unit =
      if (only.forall(_.contains(name))) { probed += 1; pairImpl(name, at1x, at10x) }

    def pairImpl(name: String, at1x: => DataFrame, at10x: => DataFrame): Unit = {
      // leak fence (same rationale as Bench's): each by-name evaluation of
      // a managed frame leaves its eagerly-checkpointed result blocks until
      // GC — 4 evaluations per pair at 10x scale would contaminate later
      // pairs' measurements. The corpus caches predate the probe loop and
      // survive the diff.
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t1 = time(s"$name 1x", at1x)
      val t10 = time(s"$name 10x", at10x)
      println(f"[probe] $name%-28s exponent=${math.log10(t10 / t1)}%5.2f")
      val now = spark.sparkContext.getPersistentRDDs
      (now.keySet -- before).foreach(id =>
        now.get(id).foreach(_.unpersist(blocking = false)))
    }

    import graft.ops.{Dedup, Packing, Sampling, Similarity, TextAnalysis}
    val d1 = docs1.select(col("doc_id"), col("text"))
    val d10 = docs10.select(col("doc_id"), col("text"))
    pair("chunk_docs", Packing.chunkDocs(docs1), Packing.chunkDocs(docs10))
    pair("shard_assign", Sampling.shardAssign(docs1, "doc_id", 8),
      Sampling.shardAssign(docs10, "doc_id", 8))
    pair("ngram_counts", TextAnalysis.ngramCounts(docs1),
      TextAnalysis.ngramCounts(docs10))
    pair("winnow", TextAnalysis.winnow(docs1), TextAnalysis.winnow(docs10))
    pair("minhash_neardup", Dedup.minhashNeardup(d1, managed = true),
      Dedup.minhashNeardup(d10, managed = true))
    pair("jaccard_neardup", Dedup.jaccardNeardup(d1, managed = true),
      Dedup.jaccardNeardup(d10, managed = true))
    pair("simhash_neardup", Dedup.simhashNeardup(d1, managed = true),
      Dedup.simhashNeardup(d10, managed = true))
    pair("substring_dedup", Dedup.substringDedup(d1), Dedup.substringDedup(d10))
    def clusters(d: DataFrame, star: Boolean): DataFrame = {
      val edges = Dedup.minhashCandidates(d, managed = true)
        .select(col("a_doc_id").as("src"), col("b_doc_id").as("dst"))
      if (star) Dedup.connectedComponentsStar(edges)
      else Dedup.connectedComponents(edges)
    }
    pair("cc_propagation", clusters(d1, star = false), clusters(d10, star = false))
    pair("cc_star", clusters(d1, star = true), clusters(d10, star = true))
    pair("kmeans_assign", Similarity.kmeansAssign(emb1), Similarity.kmeansAssign(emb10))
    pair("kmeans_iter", Similarity.kmeansIter(emb1), Similarity.kmeansIter(emb10))
    // fixed 8-query set on both sides (the registered-query shape), so the
    // exponent isolates corpus growth: index build + compressed scan
    pair("ivf_pq_topk",
      Similarity.ivfPqTopK(emb1, emb1.filter(col("vec_id") < 8),
        m = 4, k = 16, topK = 5),
      Similarity.ivfPqTopK(emb10, emb10.filter(col("vec_id") < 8),
        m = 4, k = 16, topK = 5))
    pair("lm_unigram", TextAnalysis.unigramLogProb(d1),
      TextAnalysis.unigramLogProb(d10))
    // round-11 rewrite: single checkpointed explode + composite-key join;
    // corpus 10x but bigram VOCAB grows slower (Heaps) — expect ~linear
    pair("lm_bigram", TextAnalysis.bigramLogProb(d1),
      TextAnalysis.bigramLogProb(d10))
    // feature pass is the fused native expression; models stay B=1024
    // rows at any corpus size, scoring join is broadcast — expect linear
    pair("dsir_weights",
      Sampling.dsirWeights(docs1, docs1.filter(col("lang") === "en")),
      Sampling.dsirWeights(docs10, docs10.filter(col("lang") === "en")))
    // same 32 query docs on both sides (their 10x ids are originalId*10,
    // replica r=0): the exponent isolates postings-build + candidate-scan
    // growth at a FIXED query budget — the operator's real serving shape
    pair("bm25_search", TextAnalysis.bm25Search(d1),
      TextAnalysis.bm25Search(d10,
        evalPred = col("doc_id") % 170 === 30 && col("doc_id") < 5440))
    // fixed k: cluster sizes grow 10x, within-cluster pairs 100x — the
    // regime the SemDeDup paper says NOT to run (expect exponent → 2)
    pair("semantic_dedup_fixedk", Similarity.semanticDedup(emb1),
      Similarity.semanticDedup(emb10))
    // k ∝ N (the paper's recipe): cluster sizes stay flat, pair count
    // grows linearly — the 100 TB operating point
    pair("semantic_dedup_scaledk", Similarity.semanticDedup(emb1, k = 8),
      Similarity.semanticDedup(emb10, k = 80))
    // rerank adds one broadcast-restricted exact pass over the raw vectors
    // on top of ivf_pq_topk; the shortlist is fixed-size per query, so the
    // exact pass's data term is the corpus scan of the semi-join, not a
    // pair blowup
    pair("ivf_pq_rerank",
      Similarity.ivfPqRerankTopK(emb1, emb1.filter(col("vec_id") < 8),
        m = 4, k = 16, topK = 5),
      Similarity.ivfPqRerankTopK(emb10, emb10.filter(col("vec_id") < 8),
        m = 4, k = 16, topK = 5))
    // round-11 layout/fusion family. globalSequence: two aggs + one
    // bucket-partitioned window — expect ~linear with per-job overhead
    import graft.ops.{Joins, Layout, Profile, Retrieval}
    pair("global_seq",
      Layout.globalSequence(docs1.select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id"),
      Layout.globalSequence(docs10.select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id"))
    pair("zorder_zonemap",
      Layout.zorderZoneMap(docs1.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars"),
      Layout.zorderZoneMap(docs10.select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars"))
    // fixed-width neighborhood: O(N·w) verify pairs by construction; the
    // 24-char prefix keeps the per-pair Levenshtein cost bounded
    def snmIn(d: DataFrame) = d.select(col("doc_id"),
      substring(col("text"), 1, 24).as("prefix"), col("n_chars"))
    pair("snm_editdist",
      Joins.sortedNeighborhoodEditDist(snmIn(docs1), "prefix", "doc_id",
        col("n_chars"), maxDist = 20),
      Joins.sortedNeighborhoodEditDist(snmIn(docs10), "prefix", "doc_id",
        col("n_chars"), maxDist = 20))
    // both legs' eval predicates are id-capped (< 544), so the query set
    // is FIXED at any corpus size — the exponent isolates index/scan growth
    pair("hybrid_rrf", Retrieval.hybridRrf(docs1, emb1),
      Retrieval.hybridRrf(docs10, emb10))
    pair("column_profile",
      Profile.columnProfile(docs1, Seq("lang", "source", "n_chars")),
      Profile.columnProfile(docs10, Seq("lang", "source", "n_chars")))
    // funnel over a synthetic event stream derived from the doc corpus:
    // one user per ~997 docs, three step types, doc_id as event time
    def funnelIn(d: DataFrame) = d.select(
      (col("doc_id") % 997).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("doc_id") % 3 + 1).cast("int")).as("event_type"),
      col("doc_id").as("epoch_us"))
    pair("funnel", graft.ops.Windows.funnel(funnelIn(docs1)),
      graft.ops.Windows.funnel(funnelIn(docs10)))
    only.foreach { keep =>
      if (probed == 0) System.err.println(
        s"[probe] SPARK_GRAFT_PROBE_ONLY matched no pair: ${keep.mkString(", ")}")
    }
    spark.stop()
  }
}
