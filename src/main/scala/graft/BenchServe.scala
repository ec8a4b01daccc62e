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
    val repeat = math.max(1, if (args.length > 1) args(1).toInt else 1)
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
    val idx = graft.index.VectorIndex.build(spark, tmp, src, dim = 100, maxDegree = 64)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val queries = Array.fill(1000)(vecs(rng.nextInt(vecs.length)))
    def qps(router: graft.index.ShardedServing, ef: Int): Double = {
      queries.take(200).foreach(q => router.search(q, topk = 10, ef = ef))
      val t = System.nanoTime()
      queries.foreach(q => router.search(q, topk = 10, ef = ef))
      queries.length.toDouble / ((System.nanoTime() - t) / 1e9)
    }
    // exact truth for the first 100 queries (driver-side; 1M dist evals)
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    val evalQ = queries.take(100)
    val truth = evalQ.map { q =>
      vecs.zipWithIndex.map { case (v, i) => (sq(q, v), i.toLong + 1) }
        .sortBy(_._1).take(10).map(_._2).toSet
    }
    def recall(router: graft.index.ShardedServing, ef: Int): Double =
      evalQ.zip(truth).map { case (q, t) =>
        t.intersect(router.search(q, topk = 10, ef = ef).map(_._2).toSet).size / 10.0
      }.sum / evalQ.length
    var loaded: graft.index.ShardedServing = null
    (1 to repeat).foreach { i =>
      val t1 = System.nanoTime()
      loaded = graft.index.ShardedServing.fromIndex(idx, numShards)
      println(f"fromIndex($numShards) run $i: ${(System.nanoTime() - t1) / 1e9}%.2f s " +
        s"(${loaded.numPoints} points)")
    }
    // insert-built twin over the SAME vectors and degree — the
    // apples-to-apples baseline; the ef sweep maps each router's
    // quality/throughput frontier (loaded graphs are global-kNN
    // projections, insert-built are self-search truncations — equal ef
    // does NOT mean equal work or equal recall)
    val insertRouter = new graft.index.ShardedServing(100, numShards)
    vecs.foreach(v => insertRouter.insert(v))
    Seq(50, 100, 200, 300).foreach { ef =>
      println(f"ef=$ef%3d  fromIndex: ${qps(loaded, ef)}%6.1f q/s r@10=${recall(loaded, ef)}%.3f" +
        f"   insert-built: ${qps(insertRouter, ef)}%6.1f q/s r@10=${recall(insertRouter, ef)}%.3f")
    }
    spark.stop()
  }
}
