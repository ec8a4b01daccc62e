package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Index metadata — the Spark replacement for the reference's
  * Julia-serialized `.meta` Dict (`/root/reference/src/LMDiskANN.jl:69-100`).
  * Unlike the reference, the metric IS persisted (SURVEY §4.3 Q6 fix)
  * and eltype is whitelist-validated (Q8 fix). `eltype` "Float16" is
  * accepted and stored widened to Float (documented divergence,
  * SURVEY §1.4). */
final case class IndexMeta(
    version: Long,
    numPoints: Long,
    dim: Int,
    maxDegree: Int,
    entrypoint: Int,
    eltype: String,
    metric: String,
    freelist: Seq[Int],
    ingestBatchId: Long = -1L) {
  require(Set("Float16", "Float32", "Float64").contains(eltype), s"bad eltype $eltype")
  Metric.fromName(metric) // validate
}

/** Disk-resident vector index: versioned directory of Parquet tables +
  * JSON metadata sidecar (SURVEY §1.4 mapping of `LMDiskANNIndex{T}`).
  *
  * Layout:
  * {{{
  *   <path>/meta.json                  — current IndexMeta (commit pointer)
  *   <path>/v=<N>/vectors/             — id BIGINT, key STRING, vec ARRAY<FLOAT>
  *   <path>/v=<N>/adjacency/           — id BIGINT, nbrs ARRAY<BIGINT>
  * }}}
  *
  * Mutability on immutable storage (SURVEY §7 hard part a): every
  * mutation writes a NEW version directory and then atomically swaps
  * the `meta.json` pointer — readers of version N are never disturbed,
  * a crashed writer leaves only an orphaned directory. This is the
  * copy-on-write snapshot pattern; at 100 TB the vectors table is
  * partitioned (hash by id) and an insert batch only appends new files,
  * re-listing old ones in the manifest, so commit cost is O(batch) not
  * O(index).
  */
final class VectorIndex private (
    val spark: SparkSession,
    val path: String,
    val meta: IndexMeta) {

  private def versionDir: String = s"$path/v=${meta.version}"

  /** id BIGINT, key STRING, vec ARRAY<FLOAT> — live vectors only. */
  def vectors: DataFrame = spark.read.schema(VectorIndex.vectorsSchema).parquet(s"$versionDir/vectors")

  /** id BIGINT, nbrs ARRAY<BIGINT>. */
  def adjacency: DataFrame = spark.read.schema(VectorIndex.adjacencySchema).parquet(s"$versionDir/adjacency")

  def metric: Metric = Metric.fromName(meta.metric)

  /** Materialize the serving engine (driver-side graph traversal) from
    * the snapshot — the Spark analog of the reference's mmap open. */
  def toServing: ServingIndex = {
    val s = new ServingIndex(meta.dim, meta.maxDegree, metric)
    val rows = vectors.join(adjacency, Seq("id"), "left")
      .select(col("id"), col("key"), col("vec"), coalesce(col("nbrs"), array()).as("nbrs"))
      .collect()
    rows.foreach { r =>
      s.loadRow(
        r.getLong(0).toInt,
        r.getString(1),
        r.getSeq[Float](2).toArray,
        r.getSeq[Long](3).map(_.toInt).toArray)
    }
    s.finishLoad(meta.entrypoint, meta.freelist)
    s
  }

  /** Distributed exact top-k over the snapshot (recall-1.0 path).
    * Broadcast queries, scan vectors once, bounded-heap partial top-k;
    * keys join back against only the O(queries·k) winners. */
  def searchExact(queries: DataFrame, topk: Int): DataFrame = {
    import graft.functions.VectorFunctions
    val v = vectors
    val q = queries.select(col("query_id"), col("qvec"))
    val dcol = metric match {
      case Metric.Euclidean => VectorFunctions.euclidean(col("qvec"), col("vec"))
      case Metric.Cosine => VectorFunctions.cosineDistance(col("qvec"), col("vec"))
    }
    val vSpread = v.repartition(spark.sparkContext.defaultParallelism)
    val winners = vSpread.crossJoin(broadcast(q))
      .select(col("query_id"), col("id"), dcol.as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("id"), col("p.dist").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
    winners.join(v.select(col("id"), col("key")), Seq("id"))
      .select(col("query_id"), (col("id") + 1).as("public_id"), col("key"), col("dist"), col("rnk"))
  }

  /** Batch insert: append vectors and rewire distributively, committing
    * a new snapshot. Wiring = each new node gets its maxdegree-closest
    * over (old ∪ new), existing nodes gain back-edges and are re-pruned
    * — the batch analog of reference ann_insert! steps 5-6.
    *
    * ID assignment matches the reference contract: freed slots are
    * recycled LIFO first (src/LMDiskANN.jl:534), then fresh ids beyond
    * every id ever used (live OR freed — a freed slot must never
    * collide with an append). Batch rows are ranked by key via
    * sort + zipWithIndex (no single-partition window). The ring
    * connectivity backbone is re-derived over the grown id set so the
    * build-time connectivity invariant survives mutation. */
  def insertBatch(newVectors: DataFrame): VectorIndex = insertBatch(newVectors, -1L)

  /** insertBatch carrying a streaming batch id: the id commits
    * atomically with the snapshot pointer, making micro-batch
    * ingestion exactly-once under at-least-once foreachBatch retries
    * (a replayed batch compares <= meta.ingestBatchId and is skipped
    * BEFORE any write — see StreamingOps.applyIngestBatch). */
  def insertBatch(newVectors: DataFrame, batchId: Long): VectorIndex = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val nBatch = newVectors.count()
    if (nBatch == 0) return this
    val liveMax = vectors.agg(max(col("id"))).head().get(0) match {
      case null => -1L
      case l: Long => l
    }
    val freeMax = if (meta.freelist.isEmpty) -1L else meta.freelist.max.toLong
    val base = math.max(liveMax, freeMax) + 1L
    // LIFO recycling: last freed first
    val recycled = meta.freelist.reverse.take(math.min(nBatch, meta.freelist.size).toInt)
    val rankedSchema = StructType(Seq(
      StructField("key", StringType, nullable = true),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("rnk", LongType, nullable = false)))
    val ranked = spark.createDataFrame(
      newVectors.select(col("key").cast("string"), col("vec").cast("array<float>"))
        .orderBy(col("key"))
        .rdd.zipWithIndex()
        .map { case (r, i) => Row(r.get(0), r.get(1), i) },
      rankedSchema)
    val slotDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        recycled.zipWithIndex.map { case (slot, i) => Row(i.toLong, slot.toLong) }),
      StructType(Seq(
        StructField("rnk", LongType, nullable = false),
        StructField("slot", LongType, nullable = false))))
    val incoming = ranked.join(broadcast(slotDf), Seq("rnk"), "left")
      .select(
        coalesce(col("slot"), col("rnk") - recycled.size + base).as("id"),
        col("key"), col("vec"))
      .select(col("id"),
        coalesce(col("key"), (col("id") + 1).cast("string")).as("key"),
        col("vec"))
    val allVecs = vectors.unionByName(incoming)
    // new edges: each incoming node scored against all points
    val a = incoming.select(col("id").as("src"), col("vec").as("a_vec"))
    val b = allVecs.select(col("id").as("dst"), col("vec").as("b_vec"))
    val dcol = metric match {
      case Metric.Euclidean => graft.functions.VectorFunctions.euclidean(col("a_vec"), col("b_vec"))
      case Metric.Cosine => graft.functions.VectorFunctions.cosineDistance(col("a_vec"), col("b_vec"))
    }
    val knnDegree = math.max(1, meta.maxDegree - 2)
    val newEdges = a.crossJoin(b).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), dcol.as("dist"))
      .groupBy(col("src"))
      .agg(graft.functions.VectorFunctions.topKPairs(col("dist"), col("dst"), knnDegree).as("tk"))
      .select(col("src"), explode(col("tk")).as("p"))
      .select(col("src"), col("p.id").as("dst"), col("p.dist").as("dist"))
    // existing adjacency as an edge list with distances for re-pruning
    val vecById = allVecs.select(col("id"), col("vec"))
    val oldEdges = adjacency
      .select(col("id").as("src"), explode(col("nbrs")).as("dst"))
      .join(vecById.select(col("id").as("src"), col("vec").as("a_vec")), "src")
      .join(vecById.select(col("id").as("dst"), col("vec").as("b_vec")), "dst")
      .select(col("src"), col("dst"), dcol.as("dist"))
    val pruned = GraphBuilder.symmetrizeAndPrune(oldEdges.unionByName(newEdges), knnDegree)
    val graph = GraphBuilder.withRing(pruned, GraphBuilder.ringEdges(vecById), meta.maxDegree)
    // entrypoint < 0 means the live set was empty, so every live id is an
    // incoming one: the smallest incoming id is min(recycled) when slots
    // were recycled (recycled ids always precede `base`), else `base`.
    // A hardcoded 0 here could be a dead (freed-but-not-recycled) slot,
    // which silently empties every DistributedSearch seed.
    val newEntry =
      if (meta.entrypoint >= 0) meta.entrypoint
      else if (recycled.nonEmpty) recycled.min
      else base.toInt
    commit(allVecs, graph, meta.copy(
      numPoints = meta.numPoints + nBatch,
      entrypoint = newEntry,
      freelist = meta.freelist.dropRight(recycled.size),
      ingestBatchId = if (batchId >= 0) batchId else meta.ingestBatchId))
  }

  /** Batch delete by public (1-based) IDs: drop rows, strip victims
    * from every adjacency list, re-elect the entrypoint if needed
    * (reference ann_delete! semantics, Q3/Q4). */
  def deleteBatch(publicIds: Seq[Long]): VectorIndex = {
    // only live rows become freelist entries: re-deleting an id (retry,
    // overlapping delete sets) must not create duplicate free slots
    val requested = publicIds.map(_ - 1L).toSet
    val victims = vectors.filter(col("id").isin(requested.toSeq: _*))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    if (victims.isEmpty) return this
    val victimCol = victims.toSeq
    val remaining = vectors.filter(!col("id").isin(victimCol: _*))
    val repaired = adjacency
      .filter(!col("id").isin(victimCol: _*))
      .select(col("id"),
        filter(col("nbrs"), n => !n.isin(victimCol: _*)).as("nbrs"))
    val nLeft = remaining.count()
    val newEntry =
      if (!victims.contains(meta.entrypoint.toLong)) meta.entrypoint
      else remaining.agg(min(col("id"))).head().get(0) match {
        case null => -1
        case l: Long => l.toInt
      }
    commit(remaining, repaired, meta.copy(
      numPoints = nLeft,
      entrypoint = newEntry,
      freelist = (meta.freelist ++ victims.map(_.toInt)).distinct))
  }

  private def commit(vecs: DataFrame, adj: DataFrame, newMeta: IndexMeta): VectorIndex = {
    val next = newMeta.copy(version = meta.version + 1)
    val dir = s"$path/v=${next.version}"
    vecs.select(col("id").cast("long"), col("key").cast("string"),
      col("vec").cast("array<float>")).write.mode("overwrite").parquet(s"$dir/vectors")
    adj.select(col("id").cast("long"), col("nbrs").cast("array<long>"))
      .write.mode("overwrite").parquet(s"$dir/adjacency")
    VectorIndex.writeMeta(path, next)
    new VectorIndex(spark, path, next)
  }

  /** Persist a mutated serving index back as a new snapshot. */
  def commitServing(s: ServingIndex): VectorIndex = {
    import spark.implicits._
    val rows = s.liveRows.map { case (id, key, vec, nbrs) =>
      (id, key, vec.toSeq, nbrs.map(_.toLong).toSeq)
    }.toSeq
    val df = rows.toDF("id", "key", "vec", "nbrs")
    commit(
      df.select(col("id"), col("key"), col("vec").cast("array<float>")),
      df.select(col("id"), col("nbrs")),
      meta.copy(
        numPoints = s.numPoints,
        entrypoint = s.entrypoint,
        freelist = s.freeSlots))
  }
}

object VectorIndex {

  val vectorsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))

  val adjacencySchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("nbrs", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Create an empty index (reference create_index, src/LMDiskANN.jl:239-264). */
  def create(
      spark: SparkSession,
      path: String,
      dim: Int,
      maxDegree: Int = ServingIndex.DefaultMaxDegree,
      metric: Metric = Metric.Euclidean,
      eltype: String = "Float32"): VectorIndex = {
    val meta = IndexMeta(0L, 0L, dim, maxDegree, -1, eltype, metric.name, Nil)
    val dir = s"$path/v=0"
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], vectorsSchema)
      .write.mode("overwrite").parquet(s"$dir/vectors")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], adjacencySchema)
      .write.mode("overwrite").parquet(s"$dir/adjacency")
    writeMeta(path, meta)
    new VectorIndex(spark, path, meta)
  }

  /** Open an existing index (reference load_index, src/LMDiskANN.jl:271-306). */
  def load(spark: SparkSession, path: String): VectorIndex = {
    val meta = readMeta(path)
    val v = new VectorIndex(spark, path, meta)
    require(Files.exists(Paths.get(s"$path/v=${meta.version}/vectors")), s"missing vectors table at $path")
    v
  }

  /** Bulk build from a DataFrame of (id BIGINT 0-based, key STRING?, vec ARRAY<FLOAT>)
    * — the north-star batch-construction path (BASELINE.json). Graph =
    * exact kNN for small n, LSH-bucketed beyond `exactThreshold`. */
  def build(
      spark: SparkSession,
      path: String,
      source: DataFrame,
      dim: Int,
      maxDegree: Int = ServingIndex.DefaultMaxDegree,
      metric: Metric = Metric.Euclidean,
      exactThreshold: Long = 20000L,
      eltype: String = "Float32",
      alpha: Double = 0.0): VectorIndex = {
    // materialize the normalized source ONCE by writing the final
    // vectors table FIRST and reading it back: the build pipeline
    // consumes it from ~6 sub-plans (count, kNN both sides, ring,
    // entry) and would otherwise re-scan + re-plan the source each
    // time. Writing (which must happen anyway) instead of
    // localCheckpoint also pins nothing: a checkpointed Dataset's
    // blocks survive Dataset.unpersist (CacheManager never sees them).
    val dir = s"$path/v=0"
    source.select(
        col("id").cast("long"),
        (if (source.columns.contains("key")) coalesce(col("key"), (col("id") + 1).cast("string"))
         else (col("id") + 1).cast("string")).as("key"),
        col("vec").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/vectors")
    val vecs = spark.read.schema(vectorsSchema).parquet(s"$dir/vectors")
    val stats = vecs.agg(count(lit(1)), min(col("id"))).head()
    val n = stats.getLong(0)
    val vv = vecs.select(col("id"), col("vec"))
    // two adjacency slots are reserved for the ring backbone, which
    // guarantees global connectivity on clustered data (see
    // GraphBuilder.ringEdges)
    val knnDegree = math.max(1, maxDegree - 2)
    val pruned =
      if (alpha > 1.0) {
        // α-RNG build: gather 2x candidates, diversify-prune per node
        val edges =
          if (n <= exactThreshold) GraphBuilder.exactKnnEdges(vv, 2 * maxDegree, metric)
          else GraphBuilder.lshKnnEdges(vv, 2 * maxDegree, metric)
        val bidir = edges.select(col("src"), col("dst"), col("dist"))
          .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
          .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
        AlphaPrune.pruneGraph(bidir, vv, knnDegree, alpha, metric)
      }
      else if (n <= exactThreshold) GraphBuilder.exactKnnGraph(vv, knnDegree, metric)
      else GraphBuilder.lshKnnGraph(vv, knnDegree, metric)
    val graph = GraphBuilder.withRing(pruned, GraphBuilder.ringEdges(vv), maxDegree)
    val entry = stats.get(1) match {
      case null => -1
      case l: Long => l.toInt
    }
    val meta = IndexMeta(0L, n, dim, maxDegree, entry, eltype, metric.name, Nil)
    graph.select(col("id").cast("long"), col("nbrs").cast("array<long>"))
      .write.mode("overwrite").parquet(s"$dir/adjacency")
    writeMeta(path, meta)
    new VectorIndex(spark, path, meta)
  }

  // ------------------------------------------------------------- meta I/O

  private[index] def writeMeta(path: String, m: IndexMeta): Unit = {
    Files.createDirectories(Paths.get(path))
    val json =
      s"""{"version":${m.version},"numPoints":${m.numPoints},"dim":${m.dim},""" +
        s""""maxDegree":${m.maxDegree},"entrypoint":${m.entrypoint},""" +
        s""""eltype":"${m.eltype}","metric":"${m.metric}",""" +
        s""""ingestBatchId":${m.ingestBatchId},""" +
        s""""freelist":[${m.freelist.mkString(",")}]}"""
    // atomic pointer swap: write sidecar to a temp file, then move over
    val tmp = Paths.get(s"$path/.meta.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$path/meta.json"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private[index] def readMeta(path: String): IndexMeta = {
    val json = new String(Files.readAllBytes(Paths.get(s"$path/meta.json")), StandardCharsets.UTF_8)
    def longOf(k: String): Long = {
      val m = s""""$k":(-?\\d+)""".r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"meta.json missing $k"))
      m.group(1).toLong
    }
    def strOf(k: String): String = {
      val m = (s""""$k":"([^"]*)"""").r.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"meta.json missing $k"))
      m.group(1)
    }
    val freelist = """"freelist":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Nil)
    val ingestId = """"ingestBatchId":(-?\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong).getOrElse(-1L)
    IndexMeta(longOf("version"), longOf("numPoints"), longOf("dim").toInt,
      longOf("maxDegree").toInt, longOf("entrypoint").toInt,
      strOf("eltype"), strOf("metric"), freelist, ingestId)
  }
}
