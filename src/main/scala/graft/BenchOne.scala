package graft

import org.apache.spark.sql.SparkSession

/** Solo per-query re-measure tool (the query-sweep sibling of
  * BenchQps): times a comma-separated subset of `SparkEntry.queries`
  * three times each in one warmed JVM, printing per-run seconds and
  * catching failures loudly. For adjudicating a single query's bench
  * number without paying a full sweep — run it on a QUIET host (a
  * concurrent sbt/Spark job inflates numbers 3-10x; the round-13
  * "q62 4.6 s" artifact was exactly that).
  *
  * Usage: runMain graft.BenchOne qA[,qB,...]   (SPARK_GRAFT_SF_DIR
  * selects the fixture, default sf0.1). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne qA[,qB,...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args(0).split(",").map(_.trim).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (n <- names; i <- 1 to 3) {
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.count()
        graft.plans.Blocks.release(df)
        println(f"BENCHONE $n run$i ok ${(System.nanoTime() - t0) / 1e9}%.3f")
      } catch { case e: Throwable =>
        println(f"BENCHONE $n run$i FAIL ${(System.nanoTime() - t0) / 1e9}%.3f " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    spark.stop()
  }
}
