package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate dedupes across
  * suites in the forked test JVM). Same session config as Verify/Bench —
  * UTC + nanosAsLong is part of the library's documented contract. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // fresh warehouse per JVM: saveAsTable locations must not collide with
    // leftovers from previous runs
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def strings(vals: String*): DataFrame = {
    import spark.implicits._
    vals.toDF("value")
  }

  /** Count physical nodes whose name contains `token`, WITHOUT
    * rendering the plan to a string: `.executedPlan.toString` on the
    * crawl-chain plans materializes a multi-hundred-MB string (every
    * synthetic-fixture expression tree × every reference), and one
    * round-19 dual-plan test OOM'd the shared 8 GiB test heap that
    * way. Traversal touches only the node objects that already
    * exist. AQE wrappers are unwrapped to their initial plan (the
    * same tree toString would have printed). */
  def countPlanNodes(df: DataFrame, token: String): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.initialPlan)
      case n => n +: (n.children ++ n.subqueries).flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).count(_.nodeName.contains(token))
  }
}
