package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * scan/pushdown/broadcast/codegen shape can be audited per round.
  * Usage: runMain graft.ExplainAudit [sfDir] [queryName...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else
      Seq("q04_lookup_by_id", "q02_knn_exact_l2", "q11_revenue_by_nation",
        "q41_ngram_jaccard", "q60_event_window_agg", "q62_asof_join",
        "q63_interval_join", "q20_price_quantiles", "q52_dedup_groups",
        "q22_filtered_knn", "q58_tfidf", "q59_decontaminate")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query $n")
      }
    }
    spark.stop()
  }
}
