package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE query and print per-stage task counts + times so
  * parallelism problems are visible (local[32] should show ~32 tasks
  * on the heavy stages, not 1).
  * Usage: runMain graft.BenchOne <sfDir> <queryName> [repeat] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        println(f"  stage ${si.stageId}%3d: ${si.numTasks}%4d tasks, " +
          f"${ms.getOrElse(-1L)}%6d ms  ${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    (1 to repeat).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"run $i: $name -> $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // SPARK_GRAFT_SHOW=1: print the result head (recall self-reports
      // are 1-row frames — this is how their gate values get eyeballed)
      if (i == repeat && sys.env.get("SPARK_GRAFT_SHOW").contains("1"))
        df.show(20, truncate = false)
    }
    spark.stop()
  }
}
