package graft.index

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed serving layout is the beam path's 100 TB story: the
  * per-step `frontier ⋈ adjacency` / `⋈ vectors` joins must read the
  * index side straight off the bucket layout with NO Exchange — only
  * the O(queries·beam) frontier shuffles. This spec proves the plan
  * does that, that re-opening the layout is metadata-only, and that
  * the bucketed path returns the same results as the plain one. */
class BucketedBeamSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("bucketedServing: index side of a step-shaped join is Exchange-free") {
    val path = tmpDir("bkt-serve")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val (bv, ba) = idx.bucketedServing(numBuckets = 8)
    assert(bv.count() == 500 && ba.count() == 500)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // force a shuffle-requiring join: broadcast would trivially avoid
    // exchanges and prove nothing about the bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the two bucketed tables co-join with ZERO exchanges
      val cojoin = bv.join(ba, Seq("id"))
        .select(col("id"), size(col("nbrs")).as("deg"))
      assert(cojoin.count() == 500)
      val coShuffles = collectShuffles(cojoin)
      assert(coShuffles.isEmpty,
        s"bucketed co-join planned ${coShuffles.size} exchange(s)")

      // a frontier-shaped join (what every beam step runs) exchanges
      // ONLY the frontier — never the index-sized scan
      val frontier = spark.range(0, 50).select(col("id"))
      val step = frontier.join(ba, Seq("id"))
        .select(col("id"), explode(col("nbrs")).as("nbr"))
      assert(step.count() > 0)
      val shuffles = collectShuffles(step)
      assert(shuffles.size == 1,
        s"expected exactly the frontier exchange, found ${shuffles.size}")
      val shuffledScan = shuffles.exists(_.collect {
        case f: FileSourceScanExec => f
      }.nonEmpty)
      assert(!shuffledScan, "the parquet scan must sit OUTSIDE the exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketedServing results match the plain layout through beamSearch") {
    val path = tmpDir("bkt-parity")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val queries = embeddings.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val (bv, ba) = idx.bucketedServing(numBuckets = 8)
    val bucketed = (bv.cache(), ba.cache())
    bucketed._1.count(); bucketed._2.count()
    val viaBucketed = DistributedSearch.beamSearch(idx, queries, topk = 5,
        shared = Some(bucketed)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val viaPlain = DistributedSearch.beamSearch(idx, queries, topk = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(viaBucketed == viaPlain)
    bucketed._1.unpersist(); bucketed._2.unpersist()
  }

  test("bucketedServing re-open is metadata-only over existing files") {
    val path = tmpDir("bkt-reopen")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val (bv1, _) = idx.bucketedServing(numBuckets = 8)
    assert(bv1.count() == 500)
    // simulate a fresh session: drop the catalog entries, keep files
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_bkt_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val dirs = java.nio.file.Files.list(
      java.nio.file.Paths.get(s"$path/bucketed")).iterator()
    assert(dirs.hasNext, "bucketed files must survive the catalog drop")
    val (bv2, ba2) = idx.bucketedServing(numBuckets = 8)
    assert(bv2.count() == 500 && ba2.count() == 500)
  }
}
