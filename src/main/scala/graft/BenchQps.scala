package graft

/** Dev tool: solo re-measure of the four serving QPS loops from
  * [[Bench]] (single-graph, PQ low-memory, 4-shard router, and the
  * fromIndex-loaded fleet) with no preceding query workload — the
  * round bench runs these after ~70 queries of GC/block pressure,
  * which rounds 4/5 showed can move the numbers 1.3-1.6x. The
  * workloads themselves live in [[QpsWorkloads]], shared with Bench,
  * so the two tools time the SAME loops by construction (seeds,
  * 10k x 100d shape, graph degree, warmup, median protocol). The
  * three in-memory loops run Spark-free; the fromIndex loop is the
  * one that inherently needs a session (its distributed build IS the
  * thing measured), created only after the Spark-free numbers print
  * so they stay uncontaminated.
  * Usage: runMain graft.BenchQps [repeat]
  */
object BenchQps {
  def main(args: Array[String]): Unit = {
    val repeat = math.max(1, if (args.nonEmpty) args(0).toInt else 5)
    println(f"qps         ${QpsWorkloads.qps(QpsWorkloads.singleGraph(), repeat)}%8.1f")
    println(f"pq_qps      ${QpsWorkloads.qps(QpsWorkloads.pqLowMemory(), repeat)}%8.1f")
    println(f"shard_qps   ${QpsWorkloads.qps(QpsWorkloads.shardedRouter(), repeat)}%8.1f")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // defensive like Bench: a fromIndex failure (temp-dir, build error)
    // must still print sentinel lines and release the session
    try {
      val (fiLoad, fiWorkload) = QpsWorkloads.fromIndexRouter(spark, repeat)
      println(f"fi_load_sec ${fiLoad.medianSec}%8.1f")
      println(f"fi_load_cold_sec ${fiLoad.coldSec}%8.1f")
      println(f"fi_load_warm_sec ${fiLoad.warmSec}%8.1f")
      println(f"fi_qps      ${QpsWorkloads.qps(fiWorkload, repeat)}%8.1f")
    } catch {
      case _: Throwable =>
        println(f"fi_load_sec ${-1.0}%8.1f")
        println(f"fi_qps      ${-1.0}%8.1f")
    } finally spark.stop()
  }
}
