package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** α-RNG (relative neighborhood) pruning from the DiskANN/Vamana
  * papers — the diversification step the reference deliberately lacks
  * (its `_prune_neighbors` is plain truncation,
  * /root/reference/src/LMDiskANN.jl:491-505, noted in SURVEY §4.2 as
  * hurting recall on clustered data). Offered as an opt-in flag;
  * default behavior everywhere stays reference-faithful truncation.
  *
  * Rule (Vamana Algorithm 2): walk candidates ascending by distance to
  * the node; keep candidate v, then discard any remaining w with
  * α·d(v, w) <= d(p, w) — i.e. w is better reached through v.
  *
  * Distributed shape: candidates arrive as a bounded per-node array
  * (<= candidateCap from the top-k aggregate), so the pairwise part is
  * O(cap²·d) per node inside mapPartitions — embarrassingly parallel,
  * no shuffle beyond the grouping that built the arrays. */
object AlphaPrune {

  /** Vamana prune over one node's candidates (ascending by dist). */
  def pruneOne(
      candidates: IndexedSeq[(Double, Long, Array[Float])],
      maxDegree: Int,
      alpha: Double,
      metric: Metric): Array[Long] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val sorted = candidates.sortBy(c => (c._1, c._2))
    val discarded = new Array[Boolean](sorted.length)
    var i = 0
    while (i < sorted.length && kept.length < maxDegree) {
      if (!discarded(i)) {
        val (_, vid, vvec) = sorted(i)
        kept += ((vid, vvec))
        var j = i + 1
        while (j < sorted.length) {
          if (!discarded(j)) {
            val (dpw, _, wvec) = sorted(j)
            if (alpha * metric.dist(vvec, wvec) <= dpw) discarded(j) = true
          }
          j += 1
        }
      }
      i += 1
    }
    kept.map(_._1).toArray
  }

  private val outSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("nbrs", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Distributed α-prune: scored edges (src, dst, dist) + vectors
    * (id, vec) → (id, nbrs) with RNG-diverse neighbors, degree-bounded.
    * `candidateCap` bounds the per-node pairwise work AND the per-node
    * gathered state: candidates are cut to the cap via the bounded-heap
    * aggregate FIRST, and only the winners' vectors are joined and
    * collected — a hub node with 10⁵ incident edges still gathers at
    * most cap rows (no unbounded collect_list on skewed graphs). */
  def pruneGraph(
      edges: DataFrame,
      vectors: DataFrame,
      maxDegree: Int,
      alpha: Double,
      metric: Metric,
      candidateCap: Int = 128): DataFrame = {
    import graft.functions.VectorFunctions
    val winners = edges
      .groupBy(col("src"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("dst"), candidateCap).as("tk"))
      .select(col("src"), explode(col("tk")).as("p"))
      .select(col("src"), col("p.id").as("dst"), col("p.dist").as("dist"))
    val gathered = winners
      .join(vectors.select(col("id").as("dst"), col("vec").as("dst_vec")), Seq("dst"))
      .groupBy(col("src"))
      .agg(collect_list(struct(col("dist"), col("dst"), col("dst_vec"))).as("cands"))
    val enc = RowEncoder.encoderFor(outSchema)
    gathered.mapPartitions { rows =>
      rows.map { r =>
        val cands = r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getDouble(0), p.getLong(1), p.getSeq[Float](2).toArray))
          .toIndexedSeq
        org.apache.spark.sql.Row(r.getLong(0),
          pruneOne(cands, maxDegree, alpha, metric).toSeq)
      }
    }(enc)
  }
}
