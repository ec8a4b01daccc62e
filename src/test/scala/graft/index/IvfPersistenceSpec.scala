package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** IVF/PQ as index-lifecycle artifacts: the coarse-quantizer model
  * persists as a sidecar, its per-segment assignment dirs and the
  * partitioned IVF-PQ composite are maintained incrementally (O(batch)
  * per delta commit), a fresh load serves without a re-fit, and
  * vacuum() reaps dead/stale-model artifact dirs. */
class IvfPersistenceSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def newRows(n: Int, seed: Int) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rng = new scala.util.Random(seed)
    spark.createDataFrame(
      java.util.Arrays.asList(Array.tabulate(n)(i =>
        Row(s"new-$seed-$i", Array.fill(64)(rng.nextFloat()).toSeq)): _*),
      StructType(Seq(
        StructField("key", StringType, nullable = false),
        StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false))))
  }

  private def segRows(path: String, sub: String): Long =
    spark.read.parquet(path).count()

  test("fitIVF persists a sidecar; a FRESH load serves identical centroids and assignments with no re-fit") {
    val path = tmpDir("ivf-lifecycle")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val model = idx.fitIVF(16)
    val assigned = idx.ivfAssignments(model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.size == 500)

    // assignment dir exists with a completeness marker
    val segDir = java.nio.file.Paths.get(s"$path/ivf_assign/seg=0-${model.suffix}")
    assert(java.nio.file.Files.exists(segDir.resolve("_SUCCESS")))

    // fresh handle: sidecar loads, centroids bit-identical, assignments
    // resolve from the existing dirs (same rows, no refit required)
    val re = VectorIndex.load(spark, path)
    val reModel = re.loadIVF(16)
    assert(reModel.isDefined)
    assert(java.util.Arrays.equals(reModel.get.centroids, model.centroids))
    assert(reModel.get.fingerprint == model.fingerprint)
    val reAssigned = re.ivfAssignments(reModel.get).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(reAssigned == assigned)

    // the persisted assignment matches a direct assignment pass — the
    // artifact is the map, not an approximation of it
    val direct = Similarity.assignClusters(idx.vectors, model)
      .select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned == direct)

    // and the fit is canonical: a session-level ivfFit over the same
    // vectors (sample covers the input at n=500) yields the same model
    val sessionModel = Similarity.ivfFitModel(embeddings, 16)
    assert(java.util.Arrays.equals(sessionModel.centroids, model.centroids))
  }

  test("insertBatch maintains assignments with O(batch) rows; deleteBatch tombstones them") {
    val path = tmpDir("ivf-incr")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val model = idx.fitIVF(16)
    idx.ivfAssignments(model).count() // materialize base segment

    val b = 7
    val idx2 = idx.insertBatch(newRows(b, seed = 11))
    assert(idx2.meta.segments.length == 2)
    val deltaSeg = idx2.meta.segments.last
    val resolved = idx2.ivfAssignments(model)
    assert(resolved.count() == 500L + b)
    // the delta assignment dir holds EXACTLY the batch's rows — the
    // incremental contract (one map pass over the delta, never a
    // corpus re-assign)
    val deltaDir = s"$path/ivf_assign/seg=$deltaSeg-${model.suffix}"
    assert(segRows(deltaDir, "") == b.toLong)

    // delete two: tombstone assignment rows resolve away the victims
    val victims = Seq(3L, 5L) // public ids -> internal 2, 4
    val idx3 = idx2.deleteBatch(victims)
    val delSeg = idx3.meta.segments.last
    val afterDel = idx3.ivfAssignments(model)
    assert(afterDel.count() == 500L + b - 2)
    assert(afterDel.filter(col("id").isin(2L, 4L)).count() == 0)
    val delDir = s"$path/ivf_assign/seg=$delSeg-${model.suffix}"
    val delRows = spark.read.schema(VectorIndex.ivfAssignSchema).parquet(delDir)
    assert(delRows.count() == 2)
    assert(delRows.filter(col("cluster").isNull).count() == 2)
  }

  test("ivfPqCodes persists the composite partitioned by cluster and matches assignment ⋈ codes") {
    val path = tmpDir("ivfpq-comp")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val ivfModel = idx.fitIVF(16)
    val pqModel = idx.fitPQ(8)
    val composite = idx.ivfPqCodes(ivfModel, pqModel)
    assert(composite.count() == 500)

    // physically partitioned by cluster: the segment dir fans out into
    // cluster=<c> subdirectories (the partition-pruning layout)
    val pqFp = Fingerprint.ofFloats(pqModel.codebook)
    val segDir = java.nio.file.Paths.get(
      s"$path/ivfpq/seg=0-${ivfModel.suffix}--m${pqModel.m}k${pqModel.k}-$pqFp")
    assert(java.nio.file.Files.exists(segDir.resolve("_SUCCESS")))
    val clusterDirs = java.nio.file.Files.list(segDir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(clusterDirs)
      .asScala.map(_.getFileName.toString).filter(_.startsWith("cluster=")).toSeq
    assert(names.nonEmpty)

    // a static cluster filter prunes partitions at planning time
    val pruned = spark.read.schema(VectorIndex.ivfPqSchema)
      .parquet(segDir.toString).filter(col("cluster").isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"))

    // content = assignments ⋈ code column, row for row
    val viaJoin = idx.ivfAssignments(ivfModel)
      .join(idx.pqCodes(pqModel), Seq("id"))
      .select(col("id"), col("cluster"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Byte](2))).toSet
    val direct = composite
      .select(col("id"), col("cluster"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Byte](2))).toSet
    assert(direct == viaJoin)

    // and the persisted composite serves the search: recall vs exact
    val queries = embeddings.filter(col("id") < 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val all = embeddings.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val got = Quantization.ivfPqTopK(composite, ivfModel.centroidPairs, pqModel,
        queries, topk = 10, nprobe = 8, refine = Some(embeddings))
      .select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = queries.map { case (qid, qv) =>
      val truth = all.map { case (i, v) => (Metric.Euclidean.dist(qv, v), i) }
        .sortBy { case (d, i) => (d, i) }.take(10).map(_._2).toSet
      truth.intersect(got.getOrElse(qid, Set.empty)).size / 10.0
    }
    assert(recalls.sum / recalls.length >= 0.70,
      s"IVF-PQ recall over persisted composite = ${recalls.sum / recalls.length}")
  }

  test("ivfClusteredVectors persists cluster-partitioned vectors; a static probe filter prunes partitions") {
    val path = tmpDir("ivf-vec")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val model = idx.fitIVF(16)
    val cv = idx.ivfClusteredVectors(model)
    assert(cv.count() == 500)
    // content = vectors ⋈ assignments, row for row
    val viaJoin = idx.ivfAssignments(model).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = cv.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(direct == viaJoin)
    // the static cluster IN filter prunes partitions at planning time
    val pruned = cv.filter(col("cluster").isin(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"))
    // and vacuum treats the family like the other per-model artifacts
    val segDir = java.nio.file.Paths.get(s"$path/ivf_vec/seg=0-${model.suffix}")
    assert(java.nio.file.Files.exists(segDir.resolve("_SUCCESS")))
  }

  test("model fingerprints are 64-bit: fixed 16-hex width, content-sensitive") {
    val a = Array.tabulate(256)(i => i * 0.5f)
    val b = a.clone(); b(255) = Math.nextUp(b(255)) // exactly one ULP
    assert(Fingerprint.ofFloats(a).matches("^[0-9a-f]{16}$"))
    assert(Fingerprint.ofFloats(b).matches("^[0-9a-f]{16}$"))
    assert(Fingerprint.ofFloats(a) != Fingerprint.ofFloats(b))
    assert(Fingerprint.ofFloats(a) == Fingerprint.ofFloats(a.clone()))
    // the artifact suffixes (dir-name keys) carry the widened form
    val m = IvfModel(2, 2, "euclidean", Array(0f, 0f, 1f, 1f))
    assert(m.suffix.matches("^k2-euclidean-[0-9a-f]{16}$"))
  }

  test("ivfPqCodes rejects an IVF model whose metric disagrees with the index") {
    val path = tmpDir("ivfpq-metric")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    // index metric defaults to euclidean; a cosine-fit coarse quantizer
    // clusters normalized geometry — composing it with this index's
    // euclidean-encoded PQ codes must fail fast, not sink recall
    val cosModel = idx.fitIVF(16, searchMetric = Metric.Cosine)
    val pqModel = idx.fitPQ(8)
    val e = intercept[IllegalArgumentException] {
      idx.ivfPqCodes(cosModel, pqModel)
    }
    assert(e.getMessage.contains("metric"))
    // the matched-metric composite still builds fine
    assert(idx.ivfPqCodes(idx.fitIVF(16), pqModel).count() == 500)
  }

  test("Ivf.load names the sidecar on any parse failure (mangled base64, truncation, shape mismatch)") {
    val dir = tmpDir("ivf-mangled")
    def write(content: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.json"),
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // mangled base64
    write("""{"k":2,"dim":2,"metric":"euclidean","centroids":"!!!notbase64!!!"}""")
    val e1 = intercept[IllegalArgumentException](Ivf.load(dir, "bad.json"))
    assert(e1.getMessage.contains("bad.json"))
    // payload length disagrees with k*dim
    val b64 = java.util.Base64.getEncoder.encodeToString(Array[Byte](0, 0, 0, 0))
    write(s"""{"k":2,"dim":2,"metric":"euclidean","centroids":"$b64"}""")
    val e2 = intercept[IllegalArgumentException](Ivf.load(dir, "bad.json"))
    assert(e2.getMessage.contains("bad.json"))
    // truncated json
    write("""{"k":2,"dim":""")
    val e3 = intercept[IllegalArgumentException](Ivf.load(dir, "bad.json"))
    assert(e3.getMessage.contains("bad.json"))
  }

  test("vacuum reaps stale-model and dead-segment IVF artifact dirs, keeps live ones") {
    val path = tmpDir("ivf-vacuum")
    val idx = VectorIndex.build(spark, path, embeddings, dim = 64, maxDegree = 16)
    val model = idx.fitIVF(16)
    idx.ivfAssignments(model).count()
    val oldDir = java.nio.file.Paths.get(s"$path/ivf_assign/seg=0-${model.suffix}")
    assert(java.nio.file.Files.exists(oldDir))

    // grow the corpus, re-fit: the sidecar now carries a different
    // fingerprint, so the old-suffix dir is stale
    val idx2 = idx.insertBatch(newRows(40, seed = 23))
    val model2 = idx2.fitIVF(16)
    assert(model2.fingerprint != model.fingerprint)
    idx2.ivfAssignments(model2).count()
    val reaped = idx2.vacuum()
    assert(reaped >= 1)
    assert(!java.nio.file.Files.exists(oldDir))
    // live-model dirs survive and still serve
    assert(idx2.ivfAssignments(model2).count() == 540)
  }
}
