package graft

import org.apache.spark.sql.SparkSession

/** Solo adjudication tool for [[graft.index.ShardedServing.fromIndex]]'s
  * two load paths (the BenchOne family): builds the bench-shape
  * snapshot (10k × 100d, QpsWorkloads constants) once, then times
  * `repeat` loads through LoadVia.Driver and LoadVia.Executors each,
  * interleaved (D E D E ...) so host drift hits both paths equally.
  * Prints per-run seconds and the per-path medians — the measured
  * crossover note behind [[graft.index.ShardedServing.DriverLoadMaxRows]].
  * Run on a QUIET host. Usage: runMain graft.BenchFromIndexPaths [repeat]. */
object BenchFromIndexPaths {
  def main(args: Array[String]): Unit = {
    val repeat = math.max(2, if (args.nonEmpty) args(0).toInt else 5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rng = new scala.util.Random(1)
    val vecs = Array.fill(QpsWorkloads.NumVectors)(
      Array.fill(QpsWorkloads.Dim)(rng.nextFloat()))
    val src = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.toIndexedSeq.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong, v.toSeq)
      }, 32),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))))
    val tmp = java.nio.file.Files.createTempDirectory("bench-fipaths").toString
    val idx = graft.index.VectorIndex.build(
      spark, tmp, src, dim = QpsWorkloads.Dim, maxDegree = QpsWorkloads.MaxDegree)
    import graft.index.ShardedServing
    def one(via: ShardedServing.LoadVia): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val r = ShardedServing.fromIndex(idx, QpsWorkloads.NumShards, via)
      val t = (System.nanoTime() - t0) / 1e9
      require(r.numPoints == QpsWorkloads.NumVectors)
      t
    }
    val runs = (1 to repeat).map { i =>
      val d = one(ShardedServing.LoadVia.Driver)
      val e = one(ShardedServing.LoadVia.Executors)
      println(f"fipaths run$i driver $d%6.2f s  executors $e%6.2f s")
      (d, e)
    }
    // first pair is cold (plan compilation etc.) — medians over the rest
    val dWarm = QpsWorkloads.median(runs.tail.map(_._1))
    val eWarm = QpsWorkloads.median(runs.tail.map(_._2))
    println(f"fipaths warm-median driver $dWarm%.2f s executors $eWarm%.2f s " +
      f"ratio ${eWarm / dWarm}%.2f")
    spark.stop()
  }
}
