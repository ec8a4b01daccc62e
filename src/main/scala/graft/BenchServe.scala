package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: profile the serving-load path in isolation — build a
  * 10k x 100d snapshot (the reference's largest documented workload
  * shape), bulk-load it into the shard fleet with
  * [[graft.index.ShardedServing.fromIndex]], and print per-stage task
  * counts + wall times for the load, plus the resulting QPS.
  * Usage: runMain graft.BenchServe [numShards] [repeat]
  */
object BenchServe {
  def main(args: Array[String]): Unit = {
    val numShards = if (args.length > 0) args(0).toInt else 4
    val repeat = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    if (verbose) spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        println(f"  stage ${si.stageId}%3d: ${si.numTasks}%4d tasks, " +
          f"${ms.getOrElse(-1L)}%6d ms  ${si.name.takeWhile(_ != '\n').take(80)}")
      }
    })
    val rng = new scala.util.Random(1)
    val vecs = Array.fill(10000)(Array.fill(100)(rng.nextFloat()))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong, v.toSeq)
      }, 32),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val tmp = java.nio.file.Files.createTempDirectory("bench-serve").toString
    val t0 = System.nanoTime()
    val idx = graft.index.VectorIndex.build(spark, tmp, src, dim = 100, maxDegree = 32)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to repeat).foreach { i =>
      val t1 = System.nanoTime()
      val router = graft.index.ShardedServing.fromIndex(idx, numShards)
      println(f"fromIndex($numShards) run $i: ${(System.nanoTime() - t1) / 1e9}%.2f s " +
        s"(${router.numPoints} points)")
      if (i == repeat) {
        val queries = Array.fill(1000)(vecs(rng.nextInt(vecs.length)))
        queries.take(200).foreach(q => router.search(q, topk = 10))
        val t2 = System.nanoTime()
        queries.foreach(q => router.search(q, topk = 10))
        println(f"qps: ${queries.length.toDouble / ((System.nanoTime() - t2) / 1e9)}%.1f")
      }
    }
    spark.stop()
  }
}
