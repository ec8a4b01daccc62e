package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all Spark-backed specs (one JVM-wide
  * session; ScalaTest suites run in a forked JVM per build.sbt). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** All shuffle exchanges in an EXECUTED plan, descending through
    * AQE wrappers — `executedPlan.collect` alone is vacuous under
    * adaptive execution because AdaptiveSparkPlanExec is a leaf node
    * (it hides the real tree behind a field), so a naive zero-shuffle
    * assertion passes on any plan. Run an action on the frame first
    * so the adaptive plan is final. */
  def collectShuffles(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    collectPlanNodes(df) { case p: ShuffleExchangeLike => p }
  }

  /** All EXECUTED-plan nodes matching `pf`, descending through AQE
    * wrappers (see [[collectShuffles]] for why the descent matters).
    * Reused exchanges/stages are leaves here, so a node reached only
    * via reuse is counted ONCE — which is exactly what a
    * "one scan pass" plan assertion wants. */
  def collectPlanNodes[T](df: org.apache.spark.sql.DataFrame)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Seq[T] = {
      val self = pf.lift(p).toSeq
      val deeper = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _ => p.children.flatMap(walk)
      }
      self ++ deeper
    }
    walk(df.queryExecution.executedPlan)
  }
}
