package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TsBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def time(label: String, f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"TSBENCH $label ${(System.nanoTime()-t0)/1e9}%.3f (n=$n)")
    }
    val outCols = Seq("n_tokens","n_distinct_tokens","distinct_ratio",
      "avg_token_len","stopword_ratio","quality_score").map(col)
    for (i <- 1 to 5) {
      time(s"kernel_stats r$i", graft.operators.TextAnalysis.withTextStats(docs)
        .select(outCols: _*).filter(col("quality_score") >= 0.5).count())
      time(s"hof_stats    r$i", graft.operators.TextAnalysis.withTextStatsHof(docs)
        .select(outCols: _*).filter(col("quality_score") >= 0.5).count())
      time(s"kernel_shingles r$i", docs.select(explode(array_distinct(
        graft.operators.TextAnalysis.shingles(
          graft.operators.TextAnalysis.tokens(col("text")), 3))).as("s")).count())
      time(s"hof_shingles    r$i", docs.select(explode(array_distinct(
        graft.operators.TextAnalysis.shinglesHof(
          graft.operators.TextAnalysis.tokens(col("text")), 3))).as("s")).count())
    }
    spark.stop()
  }
}
