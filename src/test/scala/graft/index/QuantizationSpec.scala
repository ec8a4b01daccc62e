package graft.index

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.functions.VectorFunctions

/** Product-quantization kernels + search path: encode determinism,
  * ADC-vs-driver agreement, reconstruction quality, and the recall
  * gate at the reference's 2000x(dim) scale point (threshold 0.70,
  * reference test/runtests.jl recall style). */
class QuantizationSpec extends SparkSpec {

  private val dim = 64
  private val n = 2000

  private lazy val data: Array[(Long, Array[Float])] = {
    val rng = new scala.util.Random(7)
    Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rng.nextFloat())))
  }

  private lazy val df = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(data.map { case (i, v) => Row(i, v.toSeq) }: _*), schema)
  }

  private lazy val model = Quantization.pqFit(df, m = 8)
  private lazy val codes = Quantization.pqEncode(df, model).cache()

  test("pqFit is canonical: when the sample covers the input, the hash-ordered " +
      "sample yields the codebook of the id-ordered fit") {
    // n=2000 < sampleN=4096, so the hash-ordered top-N IS the whole
    // input; after the sort-back-by-id inside pqFit, the fit must be
    // bit-identical to a direct id-ordered local fit — the contract
    // that pins every pre-round-6 codebook fingerprint on covered
    // inputs (fingerprints only move when sampling actually samples)
    val idOrdered = Quantization.pqFitLocal(
      data.sortBy(_._1).map(_._2), m = 8)
    assert(model.k == idOrdered.k && model.subDim == idOrdered.subDim)
    assert(java.util.Arrays.equals(model.codebook, idOrdered.codebook))
  }

  test("fit shapes: m*k*subDim codebook, 32x compression at d=64/m=8") {
    assert(model.m == 8 && model.subDim == 8 && model.k == 256)
    assert(model.codebook.length == model.m * model.k * model.subDim)
    assert(model.compressionRatio == 32.0)
  }

  test("encode is deterministic and emits m bytes per row") {
    val a = codes.orderBy("id").collect().map(r => r.getSeq[Byte](1).toArray)
    val b = Quantization.pqEncode(df, model).orderBy("id").collect()
      .map(r => r.getSeq[Byte](1).toArray)
    assert(a.length == n)
    assert(a.forall(_.length == model.m))
    assert(a.zip(b).forall { case (x, y) => java.util.Arrays.equals(x, y) })
  }

  test("ADC distance equals the driver-side LUT sum and approximates true distance") {
    val q = data(3)._2
    val lut = model.lutFor(q)
    // driver-side expectation for row 17
    val c17 = codes.filter(col("id") === 17L).head().getSeq[Byte](1).toArray
    val expected = c17.indices.map(j => lut(j * model.k + (c17(j) & 0xFF)).toDouble).sum
    val lutDf = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, lut.toSeq)),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("lut", ArrayType(FloatType, containsNull = false), nullable = false))))
    val adc = codes.filter(col("id") === 17L).crossJoin(lutDf)
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.expressions.PQAdc(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("codes")),
          org.apache.spark.sql.graft.ColumnBridge.expression(col("lut")),
          model.k)).as("d"))
      .head().getDouble(0)
    assert(math.abs(adc - expected) < 1e-4)
    // the ADC value is the distance to the RECONSTRUCTION — close to the
    // true squared distance relative to its own magnitude at this dim
    val trueSq = data(17)._2.zip(q).map { case (x, y) =>
      val d = x.toDouble - y.toDouble; d * d
    }.sum
    assert(math.abs(adc - trueSq) / trueSq < 0.5)
  }

  test("reconstruction error is far below data variance") {
    val sample = data.take(200)
    val codeById = codes.filter(col("id") < 200).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1).toArray).toMap
    val mse = sample.map { case (id, v) =>
      val rec = model.reconstruct(codeById(id))
      v.zip(rec).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum / dim
    }.sum / sample.length
    // uniform [0,1) per-dim variance is 1/12 ~ 0.083; 256-centroid PQ on
    // 8-dim subspaces must do materially better than no quantization info
    assert(mse < 0.05, s"per-dim reconstruction MSE $mse too high")
  }

  test("PQ+refine recall@10 >= 0.70 on 2000 vectors (reference gate)") {
    val queries = data.take(30).map { case (i, v) => (i, v) }
    val got = Quantization.pqTopK(codes, model, queries, topk = 10, refine = Some(df))
      .select(col("query_id"), col("neighbor_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    // exact truth, distributed
    val qDf = spark.createDataFrame(
      java.util.Arrays.asList(queries.map { case (i, v) => Row(i, v.toSeq) }: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false))))
    val truth = df.crossJoin(broadcast(qDf))
      .select(col("query_id"), col("id").as("neighbor_id"),
        VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 10).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("p"))
      .select(col("query_id"), col("p.id").as("neighbor_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = queries.map { case (qid, _) =>
      truth(qid).intersect(got.getOrElse(qid, Set.empty)).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"PQ+refine avg recall $avg below the 0.70 gate")
  }

  test("residual (IVFADC) codes beat raw-vector codes at identical compression") {
    import graft.operators.Similarity
    // clustered data — the regime IVF exists for: 16 well-separated
    // centers, small within-cluster noise. The coarse quantizer
    // absorbs the center; residual codes spend all m bytes on the
    // local offset, raw-vector codes must span the whole cube.
    val rng = new scala.util.Random(11)
    val centers = Array.fill(16)(Array.fill(dim)(rng.nextFloat() * 10f))
    val pts = Array.tabulate(n) { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + (rng.nextFloat() - 0.5f)))
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val cdf = spark.createDataFrame(
      java.util.Arrays.asList(pts.map { case (i, v) => Row(i, v.toSeq) }: _*), schema)
    val ivf = Similarity.ivfFitModel(cdf, k = 16)
    val assigned = Similarity.assignClusters(cdf, ivf).cache()
    val plainModel = Quantization.pqFit(cdf, m = 8)
    val plainCodes = assigned.select(col("id"), col("cluster"),
      plainModel.encode(col("vec")).as("codes"))
    val residuals = assigned
      .join(broadcast(Similarity.centroidsDf(spark, ivf)), Seq("cluster"))
      .select(col("id"), col("cluster"),
        zip_with(col("vec"), col("cvec"), (a, b) => a - b).as("rvec"))
    val resModel = Quantization.pqFit(
      residuals.select(col("id"), col("rvec").as("vec")), m = 8)
    val resCodes = residuals.select(col("id"), col("cluster"),
      resModel.encode(col("rvec")).as("codes"))
    val queries = pts.take(30)
    def recallOf(codes: org.apache.spark.sql.DataFrame,
        model: Quantization.PQModel, residual: Boolean): Double = {
      // NO exact refine: expose the raw ADC code quality
      val got = Quantization.ivfPqTopK(codes, ivf.centroidPairs, model, queries,
          topk = 10, nprobe = 4, residual = residual)
        .select(col("query_id"), col("neighbor_id"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      val qDf = spark.createDataFrame(
        java.util.Arrays.asList(queries.map { case (i, v) => Row(i, v.toSeq) }: _*),
        StructType(Seq(
          StructField("query_id", LongType, nullable = false),
          StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false))))
      val truth = cdf.crossJoin(broadcast(qDf))
        .select(col("query_id"), col("id").as("neighbor_id"),
          VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("dist"))
        .groupBy(col("query_id"))
        .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), 10).as("tk"))
        .select(col("query_id"), explode(col("tk")).as("p"))
        .select(col("query_id"), col("p.id").as("neighbor_id"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      queries.map { case (qid, _) =>
        truth(qid).intersect(got.getOrElse(qid, Set.empty)).size / 10.0
      }.sum / queries.length
    }
    val plainRecall = recallOf(plainCodes, plainModel, residual = false)
    val resRecall = recallOf(resCodes, resModel, residual = true)
    info(f"ADC recall@10 (no refine): raw $plainRecall%.3f residual $resRecall%.3f")
    // comparative gate: the residual gain is what this test pins
    // (measured 0.63 vs 0.46 at seed 11); the 0.70 END-TO-END gate
    // lives on q100, which adds the exact refine this no-refine
    // measurement deliberately omits
    assert(resRecall >= plainRecall + 0.05,
      s"residual recall $resRecall not clearly above raw-code recall $plainRecall")
    assert(resRecall >= 0.50, s"residual ADC recall $resRecall below 0.50")
    assigned.unpersist()
  }

  test("low-memory PQ traversal in the serving engine: recall@10 >= 0.70") {
    val serving = new ServingIndex(dim = dim, maxDegree = 32)
    data.foreach { case (_, v) => serving.insert(v) }
    serving.enableLowMemoryTraversal(
      Quantization.pqFitLocal(data.take(2000).map(_._2), m = 8))
    val recalls = (0 until 30).map { qi =>
      val qv = data(qi)._2
      val truth = data.map { case (i, v) =>
        (v.zip(qv).map { case (x, y) => val dd = x.toDouble - y.toDouble; dd * dd }.sum, i)
      }.sortBy { case (dd, i) => (dd, i) }.take(10).map(_._2).toSet
      val got = serving.search(qv, topk = 10).map(_._2 - 1).toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"PQ-traversal recall $avg below the 0.70 gate")
    // inserts after enabling keep the code column in sync
    val (_, pid) = serving.insert(data(5)._2)
    val hits = serving.search(data(5)._2, topk = 2).map(_._2)
    assert(hits.contains(pid) || hits.contains(data(5)._1 + 1))
  }

  test("save/load round-trips the model bit-exactly") {
    val dir = tmpDir("pq-roundtrip")
    Quantization.save(model, dir)
    val loaded = Quantization.load(dir)
    assert(loaded.m == model.m && loaded.k == model.k && loaded.subDim == model.subDim)
    assert(java.util.Arrays.equals(loaded.codebook, model.codebook))
    // encodes agree
    val v = data(42)._2
    assert(java.util.Arrays.equals(loaded.encodeOne(v), model.encodeOne(v)))
  }

  test("index lifecycle: fitPQ persists a per-m sidecar; toServingLowMemory searches") {
    val dir = tmpDir("pq-lifecycle")
    val idx = VectorIndex.build(spark, dir, df.filter(col("id") < 500),
      dim = dim, maxDegree = 16)
    val s = idx.toServingLowMemory(m = 8)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/pq-m8.json")))
    // reload path: the sidecar round-trips through loadPQ
    assert(idx.loadPQ(8).isDefined)
    val hits = s.search(data(7)._2, topk = 5)
    assert(hits.nonEmpty && hits.head._2 == 8L) // self is public id 8 (1-based)
    // a second m coexists instead of thrashing the first one's sidecar
    idx.toServingLowMemory(m = 4)
    assert(idx.loadPQ(8).isDefined && idx.loadPQ(4).isDefined)
    assert(idx.loadPQ(4).get.m == 4)
  }

  test("cosine low-memory serving: normalized-PQ traversal recall@10 >= 0.70") {
    val dir = tmpDir("pq-cosine")
    val idx = VectorIndex.build(spark, dir, df.filter(col("id") < 1000),
      dim = dim, maxDegree = 32, metric = Metric.Cosine)
    val s = idx.toServingLowMemory(m = 8)
    val sub = data.take(1000)
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / math.sqrt(na * nb)
    }
    val recalls = (0 until 30).map { qi =>
      val qv = sub(qi)._2
      val truth = sub.map { case (i, v) => (cosDist(qv, v), i) }
        .sortBy { case (dd, i) => (dd, i) }.take(10).map(_._2 + 1).toSet
      val got = s.search(qv, topk = 10).map(_._2).toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"cosine PQ-traversal recall $avg below the 0.70 gate")
  }

  test("sharded router low-memory traversal: recall@10 >= 0.70") {
    val router = new ShardedServing(dim = dim, numShards = 4)
    val gids = data.map { case (_, v) => router.insert(v)._2 }
    router.enableLowMemoryTraversal(
      Quantization.pqFitLocal(data.take(2000).map(_._2), m = 8))
    val recalls = (0 until 20).map { qi =>
      val qv = data(qi)._2
      val truth = data.map { case (i, v) =>
        (v.zip(qv).map { case (x, y) => val dd = x.toDouble - y.toDouble; dd * dd }.sum, i)
      }.sortBy { case (dd, i) => (dd, i) }.take(10).map { case (_, i) => gids(i.toInt) }.toSet
      val got = router.search(qv, topk = 10).map(_._2).toSet
      truth.intersect(got).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"sharded PQ-traversal recall $avg below the 0.70 gate")
  }

  test("pqCodes persists per segment and mutations encode O(batch), not O(index)") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("pq-codes")
    val idx = VectorIndex.build(spark, dir, df.filter(col("id") < 300),
      dim = dim, maxDegree = 16)
    val model = idx.fitPQ(m = 8)
    val codes0 = idx.pqCodes(model)
    assert(codes0.count() == 300)
    // dir is keyed by (segment, model shape, codebook hash) + _SUCCESS
    def codeDirs() = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/pq_codes"))
      .toArray.map(_.toString).sorted
    assert(codeDirs().exists(_.contains(s"seg=0-m${model.m}k${model.k}-")))
    // refitting a DIFFERENT shape must not reuse these codes
    val model4 = idx.fitPQ(m = 4)
    assert(idx.pqCodes(model4).head().getSeq[Byte](1).length == 4)
    // ADC over persisted codes finds the self-match first
    val q = Seq((7L, data(7)._2))
    val top = Quantization.pqTopK(codes0, model, q.toArray, topk = 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .collect()
    assert(top.head.getLong(1) == 7L)
    // a delete commits a delta segment; its code dir holds ONLY the
    // tombstone row (O(batch)), and the resolve drops the victim
    val before = codeDirs().length
    val idx2 = idx.deleteBatch(Seq(3L)) // public id 3 = internal 2
    val codes1 = idx2.pqCodes(model)
    assert(codes1.count() == 299)
    assert(codes1.filter(col("id") === 2L).count() == 0)
    val newDirs = codeDirs().filterNot(d => d.contains("seg=0-"))
      .filter(_.contains(s"m${model.m}k${model.k}-"))
    assert(newDirs.nonEmpty, "delta segment must get its own code dir")
    val deltaRows = spark.read.schema(VectorIndex.pqCodesSchema)
      .parquet(newDirs.head).count()
    assert(deltaRows == 1, s"delta code dir must hold O(batch)=1 rows, had $deltaRows")
    // an insert batch likewise encodes only its own rows
    val add = spark.createDataFrame(
      java.util.Arrays.asList((0 until 5).map(i =>
        Row(null, data(1000 + i)._2.toSeq)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("vec",
          ArrayType(FloatType, containsNull = false), nullable = false))))
    val idx3 = idx2.insertBatch(add)
    val codes2 = idx3.pqCodes(model)
    assert(codes2.count() == 304)
    val insDirs = codeDirs().filter(_.contains(s"seg=${idx3.meta.version}-m${model.m}"))
    assert(insDirs.nonEmpty)
    val insRows = spark.read.schema(VectorIndex.pqCodesSchema)
      .parquet(insDirs.head).count()
    assert(insRows == 5, s"insert delta code dir must hold O(batch)=5 rows, had $insRows")

    // vacuum reaps what the current snapshot can no longer reach:
    // compact() strands the delta segments, and refitting m=8 on the
    // mutated corpus strands the old codebook hash's code dirs
    val idx4 = idx3.compact()
    val model8b = idx4.fitPQ(m = 8) // new data -> new codebook hash
    assert(idx4.pqCodes(model8b).count() == 304)
    val segDirs = () => java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.matches(".*/v=\\d+$")).sorted
    assert(segDirs().length > 1, "pre-vacuum: old segment dirs still on disk")
    val reaped = idx4.vacuum()
    assert(reaped > 0)
    assert(segDirs().toSeq == Seq(s"$dir/v=${idx4.meta.version}"),
      "vacuum must leave exactly the live segment dir")
    // every surviving code dir belongs to the live segment and a model
    // still persisted as a sidecar (m=4 and the REFIT m=8)
    val liveSeg = s"seg=${idx4.meta.version}-"
    assert(codeDirs().forall(_.contains(liveSeg)), s"stale code dirs: ${codeDirs().toSeq}")
    // reads after vacuum stay intact
    assert(idx4.pqCodes(model8b).count() == 304)
    assert(idx4.vectors.count() == 304)
    assert(idx4.pqCodes(idx4.loadPQ(4).get).count() == 304)
    // a STALE handle must not delete the current snapshot: vacuum
    // re-reads meta from disk (and never touches versions above the
    // on-disk max), so idx3 — whose meta predates the compaction —
    // reaps nothing and the live dir survives
    assert(idx3.vacuum() == 0)
    assert(segDirs().toSeq == Seq(s"$dir/v=${idx4.meta.version}"))
    assert(VectorIndex.load(spark, dir).vectors.count() == 304)
  }

  test("vacuum never reaps the ingest segment the streaming replay path reads") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("vacuum-ingest")
    val idx = VectorIndex.build(spark, dir, df.filter(col("id") < 100),
      dim = dim, maxDegree = 16)
    // streaming-style commit: the batch id (and its segment) ride the
    // snapshot pointer — this is the segment applyRouterBatch re-reads
    // when the last committed batch is re-delivered after a crash
    val add = spark.createDataFrame(
      java.util.Arrays.asList((0 until 5).map(i =>
        Row(null, data(500 + i)._2.toSeq)): _*),
      StructType(Seq(
        StructField("key", org.apache.spark.sql.types.StringType, nullable = true),
        StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false))))
    val idx2 = idx.insertBatch(add, batchId = 7L)
    assert(idx2.meta.ingestBatchId == 7L && idx2.meta.ingestSegment >= 0)
    val ingestSeg = idx2.meta.ingestSegment
    // compaction strands the ingest segment from the live segment set…
    val idx3 = idx2.compact()
    assert(!idx3.meta.segments.contains(ingestSeg))
    assert(idx3.meta.ingestSegment == ingestSeg)
    idx3.vacuum()
    // …but vacuum must keep it: the replay-convergence path reads it
    // when the checkpoint commit raced the crash
    assert(idx3.segmentVectors(ingestSeg).count() == 5,
      "ingest segment must survive vacuum for streaming replay")
  }

  test("IVF-PQ over a cluster-partitioned store: scan is partition-pruned to the probe set") {
    import org.apache.spark.sql.functions.col
    val (centroidsDf, assigned) = graft.operators.Similarity.ivfFit(
      df.select(col("id"), col("vec")), k = 16)
    val centroids = centroidsDf.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val store = tmpDir("ivfpq-store")
    // the physical layout the 100 TB story stores: codes partitioned
    // by coarse cluster
    assigned.select(col("id"), col("cluster")).join(codes, "id")
      .write.mode("overwrite").partitionBy("cluster").parquet(store)
    val onDisk = spark.read.parquet(store)
    val queries = data.take(3)
    val nprobe = 4
    val out = Quantization.ivfPqTopK(onDisk, centroids, model, queries,
      topk = 10, nprobe = nprobe)
    // the probed-cluster IN filter must reach the scan as a
    // planning-time PartitionFilter (static pruning, not DPP)
    val plan = out.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("Scan parquet") && l.contains(store.split('/').last))
      .orElse(plan.linesIterator.find(_.contains("PartitionFilters")))
    assert(plan.contains("PartitionFilters: [cluster"),
      s"cluster IN filter must prune partitions statically:\n${scanLine.getOrElse(plan)}")
    // and only nprobe-per-query clusters' directories are read
    val expectedClusters = queries.flatMap { case (_, qv) =>
      centroids.map { case (c, cv) =>
        (cv.zip(qv).map { case (x, y) => val d = x.toDouble - y; d * d }.sum, c)
      }.sortBy { case (dd, c) => (dd, c) }.take(nprobe).map(_._2)
    }.distinct.sorted.toSeq
    val readClusters = out.join(
        onDisk.select(col("id").as("neighbor_id"), col("cluster")), "neighbor_id")
      .select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(readClusters.forall(expectedClusters.contains),
      s"hits outside the probe set: $readClusters vs $expectedClusters")
    // self-match sanity on the pruned path
    val top1 = out.filter(col("query_id") === 0L && col("rnk") === 1)
      .head().getLong(1)
    assert(top1 == 0L)
  }

  test("IVF-PQ composite: probe + ADC + refine recall@10 >= 0.70") {
    import org.apache.spark.sql.functions.col
    val (centroidsDf, assigned) = graft.operators.Similarity.ivfFit(
      df.select(col("id"), col("vec")), k = 16)
    val centroids = centroidsDf.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val assignedCodes = assigned.select(col("id"), col("cluster"))
      .join(codes, "id")
    val queries = data.take(30)
    val got = Quantization.ivfPqTopK(assignedCodes, centroids, model, queries,
        topk = 10, nprobe = 8, refine = Some(df.select(col("id"), col("vec"))))
      .select(col("query_id"), col("neighbor_id"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = queries.map { case (qid, qv) =>
      val truth = data.map { case (i, v) =>
        (v.zip(qv).map { case (x, y) => val dd = x.toDouble - y.toDouble; dd * dd }.sum, i)
      }.sortBy { case (dd, i) => (dd, i) }.take(10).map(_._2).toSet
      truth.intersect(got.getOrElse(qid, Set.empty)).size / 10.0
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.70, s"IVF-PQ recall $avg below the 0.70 gate")
  }

  test("pqFit rejects a dimension not divisible by m") {
    val bad = df.select(col("id"), slice(col("vec"), 1, 63).as("vec"))
    val e = intercept[IllegalArgumentException] {
      Quantization.pqFit(bad, m = 8)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("encode errors on dimension mismatch instead of truncating") {
    val bad = df.select(col("id"), slice(col("vec"), 1, 32).as("vec"))
    val e = intercept[Exception] {
      Quantization.pqEncode(bad, model).collect()
    }
    assert(e.getMessage != null)
  }
}
