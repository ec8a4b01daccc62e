package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity-search operators over embedding columns.
  *
  * Three tiers, in increasing scale:
  *  - brute-force exact top-k (the oracle; see VectorQueries.knnTopK)
  *  - LSH-bucketed (GraphBuilder.lshKnnEdges)
  *  - IVF (inverted-file) here: KMeans-partition the vectors, probe
  *    only the `nprobe` nearest partitions per query.
  *
  * IVF at 100 TB: the vectors table is physically clustered by
  * `cluster` (partitionBy on write), so a query scans nprobe/k of the
  * data via partition pruning; the probe itself is an equi-join on the
  * cluster id — shuffle-free when the table is bucketed by cluster.
  * Centroids (k × dim floats) broadcast everywhere.
  */
object Similarity {

  /** KMeans-assign vectors (id, vec ARRAY<FLOAT>) to k clusters.
    * Returns (centroids(cluster, cvec), assigned(id, vec, cluster)).
    * Seeded — deterministic for a fixed input. */
  def ivfFit(vectors: DataFrame, k: Int, seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val featured = vectors.withColumn("features", array_to_vector(col("vec")))
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cluster")
      .fit(featured)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cluster", "cvec")
    val assigned = model.transform(featured)
      .select(col("id"), col("vec"), col("cluster"))
    (centroids, assigned)
  }

  /** IVF probe: for each query, find the `nprobe` nearest centroids,
    * then exact top-k within those clusters only. Queries must be
    * (query_id, qvec). */
  def ivfTopK(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      topk: Int,
      nprobe: Int): DataFrame = {
    // step 1: nprobe nearest clusters per query (tiny crossJoin:
    // |queries| x k centroids, both broadcastable)
    val probe = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"), col("cluster"),
        VectorFunctions.squaredEuclidean(col("qvec"), col("cvec")).as("cdist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("cdist"), col("cluster").cast("long"), nprobe).as("tk"),
        first(col("qvec")).as("qvec"))
      .select(col("query_id"), col("qvec"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("qvec"), col("p.id").cast("int").as("cluster"))
    // step 2: equi-join on cluster (partition-pruned at scale), exact
    // distance within probed clusters, global top-k per query
    probe.join(assigned, Seq("cluster"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.euclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"), col("p.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }
}
