package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of registered queries.
  *   sbt "Test/runMain graft.ExplainTool q_global_seq snm_editdist"
  * Optional env SPARK_GRAFT_SF_DIR (default sf0.001 — plans, not timings).
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
  }
}
