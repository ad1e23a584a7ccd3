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

    def time(name: String, df: => DataFrame): Unit = {
      df.queryExecution.toRdd.count()  // warm codegen + caches
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    import graft.ops.{Packing, Sampling, Similarity, TextAnalysis}
    time("chunk_docs 1x", Packing.chunkDocs(docs1))
    time("chunk_docs 10x", Packing.chunkDocs(docs10))
    time("shard_assign 1x", Sampling.shardAssign(docs1, "doc_id", 8))
    time("shard_assign 10x", Sampling.shardAssign(docs10, "doc_id", 8))
    time("ngram_counts 1x", TextAnalysis.ngramCounts(docs1))
    time("ngram_counts 10x", TextAnalysis.ngramCounts(docs10))
    time("kmeans_assign 1x", Similarity.kmeansAssign(emb1))
    time("kmeans_assign 10x", Similarity.kmeansAssign(emb10))
    time("kmeans_iter 1x", Similarity.kmeansIter(emb1))
    time("kmeans_iter 10x", Similarity.kmeansIter(emb10))
    spark.stop()
  }
}
