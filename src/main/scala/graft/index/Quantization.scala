package graft.index

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.functions.VectorFunctions
import graft.functions.expressions.{PQAdc, PQEncode}

/** Product quantization — the Spark-native realization of
  * LM-DiskANN's low-memory principle (reference
  * `/root/reference/paper/paper.md:23,27`: keep the RAM/IO-hot side of
  * search small; the Julia package does it with mmap'd adjacency, a
  * single-node mechanism — at cluster scale the equivalent is making
  * the SCANNED bytes small, which PQ does by replacing the d*4-byte
  * vector column with an m-byte code column, 32x smaller at d=64/m=8).
  *
  * Shapes, and why they scale:
  *  - FIT is sample-bounded on the driver (same pattern as
  *    `Similarity.ivfFit`): per-subspace Lloyd k-means over <= sampleN
  *    rows. The model is m*k*subDim floats (~0.5 MB at d=64, k=256) —
  *    broadcast-trivial.
  *  - ENCODE is one map-only pass (`PQEncode`, codegen'd, codebook as
  *    a reference object). No shuffle; pipelines into the scan.
  *  - SEARCH (ADC) broadcasts per-query lookup tables (built on the
  *    driver, m*k*subDim work per query) against the CODE column only:
  *    the per-row cost is m byte-indexed lookups, and the scan reads
  *    the 32x-smaller codes. Candidates then optionally REFINE with
  *    exact distances over the top refineFactor*k ids — a semi-join
  *    against the full vectors by id, which at 100 TB is a broadcast
  *    of a few thousand candidate ids, never a second full scan
  *    without pushdown.
  */
object Quantization {

  /** Trained PQ model. `codebook` is flat row-major:
    * centroid (subspace j, code c) at `(j*k + c) * subDim`. */
  case class PQModel(m: Int, k: Int, subDim: Int, codebook: Array[Float]) {
    def dim: Int = m * subDim
    def compressionRatio: Double = (dim * 4.0) / m

    /** Codegen'd encode column: ARRAY<FLOAT> vec -> ARRAY<TINYINT>. */
    def encode(vec: Column): Column =
      org.apache.spark.sql.graft.ColumnBridge.column(
        PQEncode(org.apache.spark.sql.graft.ColumnBridge.expression(vec), codebook, m, k))

    /** Squared-L2 lookup table for one query, flat float[m*k]. */
    def lutFor(q: Array[Float]): Array[Float] = {
      require(q.length == dim, s"query dim ${q.length} != model dim $dim")
      val lut = new Array[Float](m * k)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          val base = (j * k + c) * subDim
          var d = 0.0; var s = 0
          while (s < subDim) {
            val diff = q(j * subDim + s).toDouble - codebook(base + s).toDouble
            d += diff * diff
            s += 1
          }
          lut(j * k + c) = d.toFloat
          c += 1
        }
        j += 1
      }
      lut
    }

    /** Driver-side encode of one vector (the serving engine's
      * per-insert path; the distributed path is [[encode]]). */
    def encodeOne(v: Array[Float]): Array[Byte] = {
      require(v.length == dim, s"vector dim ${v.length} != model dim $dim")
      val out = new Array[Byte](m)
      var j = 0
      while (j < m) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val base = (j * k + c) * subDim
          var d = 0.0; var s = 0
          while (s < subDim) {
            val diff = v(j * subDim + s).toDouble - codebook(base + s).toDouble
            d += diff * diff
            s += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(j) = best.toByte
        j += 1
      }
      out
    }

    /** Decode codes back to the centroid concatenation (test/debug). */
    def reconstruct(codes: Array[Byte]): Array[Float] = {
      require(codes.length == m, s"code length ${codes.length} != m $m")
      val out = new Array[Float](dim)
      var j = 0
      while (j < m) {
        val base = ((j * k) + (codes(j) & 0xFF)) * subDim
        System.arraycopy(codebook, base, out, j * subDim, subDim)
        j += 1
      }
      out
    }
  }

  /** Fit per-subspace codebooks with Lloyd k-means over a bounded
    * driver-side sample. Deterministic: seeded init from evenly spaced
    * sample rows, fixed iteration count, empty clusters keep their old
    * centroid. kEff = min(k, sample size) guards tiny inputs. */
  def pqFit(
      vectors: DataFrame,
      m: Int,
      k: Int = 256,
      sampleN: Int = 4096,
      iters: Int = 12,
      idCol: String = "id",
      vecCol: String = "vec"): PQModel =
    // deterministic UNIFORM sample: top-N by multiplicative id-hash
    // (Sampling.bucket at fine granularity). A bare limit() pulls
    // scheduling-dependent rows; an id-prefix is deterministic but
    // biased when ids correlate with content (crawl order, source
    // grouping). Hash order keeps run-to-run stability of the fitted
    // codebook/pq.json sidecar and is corpus-uniform; compiles to
    // TakeOrderedAndProject (bounded heap), never a full sort.
    // …then fit in id order: the evenly-spaced init is order-sensitive,
    // so the fit must be a canonical function of the sample SET (and
    // identical to the pre-hash-order fit when the sample covers the
    // input, e.g. every unit fixture). The id casts to LONG up front —
    // Sampling.bucket's modular arithmetic and the getLong sort would
    // otherwise throw on an Int/String id source.
    pqFitLocal(
      vectors.select(col(idCol).cast("long").as("id"), col(vecCol))
        .orderBy(
          graft.operators.Sampling.bucket(col("id"), gran = 1000000000),
          col("id"))
        .limit(sampleN)
        .collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).toArray),
      m, k, iters)

  /** Driver-side fit over an in-memory sample (the serving engine's
    * path; [[pqFit]] delegates here after bounding the sample). */
  def pqFitLocal(
      sample: Array[Array[Float]],
      m: Int,
      k: Int = 256,
      iters: Int = 12): PQModel = {
    require(sample.nonEmpty, "pqFit: empty input")
    val dim = sample.head.length
    require(dim % m == 0, s"pqFit: dim $dim not divisible by m=$m")
    val subDim = dim / m
    val n = sample.length
    val kEff = math.min(k, n)
    val codebook = new Array[Float](m * kEff * subDim)
    var j = 0
    while (j < m) {
      // subspace views
      val sub = Array.tabulate(n) { i =>
        val v = new Array[Double](subDim)
        var s = 0
        while (s < subDim) { v(s) = sample(i)(j * subDim + s).toDouble; s += 1 }
        v
      }
      // evenly spaced init — deterministic, spread across the sample
      val cent = Array.tabulate(kEff)(c => sub((c.toLong * n / kEff).toInt).clone())
      val assign = new Array[Int](n)
      var it = 0
      while (it < iters) {
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kEff) {
            var d = 0.0; var s = 0
            while (s < subDim) { val diff = sub(i)(s) - cent(c)(s); d += diff * diff; s += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          assign(i) = best
          i += 1
        }
        val sums = Array.fill(kEff)(new Array[Double](subDim))
        val counts = new Array[Int](kEff)
        i = 0
        while (i < n) {
          val c = assign(i); counts(c) += 1
          var s = 0
          while (s < subDim) { sums(c)(s) += sub(i)(s); s += 1 }
          i += 1
        }
        var c = 0
        while (c < kEff) {
          if (counts(c) > 0) {
            var s = 0
            while (s < subDim) { cent(c)(s) = sums(c)(s) / counts(c); s += 1 }
          }
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < kEff) {
        var s = 0
        while (s < subDim) {
          codebook((j * kEff + c) * subDim + s) = cent(c)(s).toFloat
          s += 1
        }
        c += 1
      }
      j += 1
    }
    PQModel(m, kEff, subDim, codebook)
  }

  /** Persist a fitted model as a `pq.json` sidecar next to the index
    * tables (same atomic-move idiom as VectorIndex.writeMeta): small
    * JSON header + base64 little-endian float payload (~64 KB at
    * d=64/k=256). Codebooks are create-once artifacts — the reference's
    * save/load contract (create_index/load_index) extended to the
    * compression model. */
  def save(model: PQModel, path: String, file: String = "pq.json"): Unit = {
    import java.nio.charset.StandardCharsets
    val store = ArtifactStore.current
    store.createDirs(path)
    val buf = java.nio.ByteBuffer.allocate(model.codebook.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    model.codebook.foreach(buf.putFloat)
    val b64 = java.util.Base64.getEncoder.encodeToString(buf.array())
    val json =
      s"""{"m":${model.m},"k":${model.k},"subDim":${model.subDim},"codebook":"$b64"}"""
    store.writeAtomic(s"$path/$file", json.getBytes(StandardCharsets.UTF_8))
  }

  /** Load a model saved by [[save]] (real JSON parse, [[SidecarJson]]). */
  def load(path: String, file: String = "pq.json"): PQModel = {
    val j = SidecarJson.read(s"$path/$file")
    val bytes = java.util.Base64.getDecoder.decode(j.str("codebook"))
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val cb = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < cb.length) { cb(i) = buf.getFloat(); i += 1 }
    val m = j.int("m"); val k = j.int("k"); val subDim = j.int("subDim")
    require(cb.length == m * k * subDim,
      s"$path/$file codebook length ${cb.length} != m*k*subDim (${m * k * subDim})")
    PQModel(m, k, subDim, cb)
  }

  /** Driver-side ADC: sum of LUT entries selected by the codes —
    * the scoring loop [[graft.functions.expressions.PQAdc]] runs
    * distributed, exposed here for the serving engine's traversal. */
  def adc(codes: Array[Byte], lut: Array[Float], k: Int): Double = {
    var sum = 0.0; var j = 0
    while (j < codes.length) {
      sum += lut(j * k + (codes(j) & 0xFF)).toDouble
      j += 1
    }
    sum
  }

  /** Map-only encode pass: (id, vec) -> (id, codes). */
  def pqEncode(vectors: DataFrame, model: PQModel,
      idCol: String = "id", vecCol: String = "vec"): DataFrame =
    vectors.select(col(idCol).as("id"), model.encode(col(vecCol)).as("codes"))

  /** Shared tail of the PQ search paths: per-query top-`fetchK` over
    * an ADC-scored (query_id, neighbor_id, dist) frame. */
  private def adcTopK(scored: DataFrame, fetchK: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), fetchK).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.dist").as("dist"), (col("pos") + 1).as("rnk"))

  /** Shared exact-refine tier: re-rank the O(queries·fetchK) ADC
    * candidates with true distances. The candidate side is BROADCAST —
    * without the hint Spark has no size estimate for the aggregated
    * frame and would sort-merge-shuffle the full vectors table, the
    * exact second-full-scan the refine contract rules out. */
  private def refineTopK(
      candidates: DataFrame,
      vectors: DataFrame,
      queries: Array[(Long, Array[Float])],
      topk: Int): DataFrame = {
    val spark = vectors.sparkSession
    val qvecs = spark.createDataFrame(
      java.util.Arrays.asList(queries.map { case (qid, qv) => Row(qid, qv.toSeq) }: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false))))
    broadcast(candidates.select(col("query_id"), col("neighbor_id")))
      .join(vectors.select(col("id").as("neighbor_id"), col("vec")), "neighbor_id")
      .join(broadcast(qvecs), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.squaredEuclidean(col("qvec"), col("vec")).as("dist"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topKPairs(col("dist"), col("neighbor_id"), topk).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.id").as("neighbor_id"),
        col("p.dist").as("dist"), (col("pos") + 1).as("rnk"))
  }

  /** IVF-PQ composite top-k — the canonical billion-scale layout
    * (coarse quantizer prunes the scan to nprobe clusters, PQ codes
    * make the scanned bytes 32x smaller, exact re-rank restores
    * precision): at 100 TB a query touches `nprobe/k` of the data AND
    * reads only m bytes per row of it. `assignedCodes` carries
    * (id, cluster, codes) — join [[pqEncode]] output with the IVF
    * assignment once, store partitioned by cluster. The cluster probe
    * runs on the driver (centroids are k×dim — tiny by construction),
    * then one equi-join on cluster + ADC + bounded-heap top-k. */
  def ivfPqTopK(
      assignedCodes: DataFrame,
      centroids: Array[(Int, Array[Float])],
      model: PQModel,
      queries: Array[(Long, Array[Float])],
      topk: Int,
      nprobe: Int,
      refine: Option[DataFrame] = None,
      refineFactor: Int = 4,
      residual: Boolean = false): DataFrame = {
    val spark = assignedCodes.sparkSession
    def sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    def sub(a: Array[Float], b: Array[Float]): Array[Float] =
      Array.tabulate(a.length)(i => a(i) - b(i))
    // driver-side probe: nprobe nearest centroids per query, LUT per
    // (query, cluster) row — duplicated nprobe times, still tiny.
    // residual=true is the classic IVFADC refinement (Jégou et al.
    // 2011 §III): codes encode (vec − centroid), so the LUT for a
    // probed cluster scores the QUERY residual (q − centroid) — same
    // ADC kernel, per-(query, cluster) tables instead of per-query.
    val probeRows = queries.flatMap { case (qid, qv) =>
      lazy val sharedLut = model.lutFor(qv).toSeq
      centroids.map { case (c, cv) => (sq(qv, cv), c, cv) }
        .sortBy { case (d, c, _) => (d, c) }.take(nprobe)
        .map { case (_, c, cv) =>
          Row(qid, c, if (residual) model.lutFor(sub(qv, cv)).toSeq else sharedLut)
        }
    }
    val probe = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*),
      StructType(Seq(
        StructField("query_id", LongType, nullable = false),
        StructField("cluster", org.apache.spark.sql.types.IntegerType, nullable = false),
        StructField("lut", ArrayType(FloatType, containsNull = false), nullable = false))))
    // the probed cluster set is known DRIVER-SIDE, so phrase it as a
    // STATIC IN filter ahead of the join: on a store partitioned by
    // cluster this is planning-time partition pruning — the scan lists
    // only the nprobe directories per batch, no dynamic pruning or
    // join execution needed to skip the rest of 100 TB
    val probedClusters = probeRows.map(_.getInt(1)).distinct.toSeq
    val prunedCodes = assignedCodes.filter(col("cluster").isInCollection(probedClusters))
    val fetchK = if (refine.isDefined) topk * refineFactor else topk
    val adc = adcTopK(
      prunedCodes.join(broadcast(probe), Seq("cluster"))
        .select(col("query_id"), col("id").as("neighbor_id"),
          org.apache.spark.sql.graft.ColumnBridge.column(
            PQAdc(
              org.apache.spark.sql.graft.ColumnBridge.expression(col("codes")),
              org.apache.spark.sql.graft.ColumnBridge.expression(col("lut")),
              model.k)).as("dist")),
      fetchK)
    refine match {
      case None => adc
      case Some(vectors) => refineTopK(adc, vectors, queries, topk)
    }
  }

  /** ADC top-k over the code column for a small collected query set,
    * with optional exact re-rank. Returns
    * (query_id, neighbor_id, dist, rnk); `dist` is the ADC
    * approximation, or the exact distance when `refine` is given. */
  def pqTopK(
      codes: DataFrame,
      model: PQModel,
      queries: Array[(Long, Array[Float])],
      topk: Int,
      refine: Option[DataFrame] = None,
      refineFactor: Int = 4): DataFrame = {
    val spark = codes.sparkSession
    val lutSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("lut", ArrayType(FloatType, containsNull = false), nullable = false)))
    val luts = spark.createDataFrame(
      java.util.Arrays.asList(queries.map { case (qid, qv) =>
        Row(qid, model.lutFor(qv).toSeq)
      }: _*),
      lutSchema)
    val fetchK = if (refine.isDefined) topk * refineFactor else topk
    val adc = adcTopK(
      codes.crossJoin(broadcast(luts))
        .select(col("query_id"), col("id").as("neighbor_id"),
          org.apache.spark.sql.graft.ColumnBridge.column(
            PQAdc(
              org.apache.spark.sql.graft.ColumnBridge.expression(col("codes")),
              org.apache.spark.sql.graft.ColumnBridge.expression(col("lut")),
              model.k)).as("dist")),
      fetchK)
    refine match {
      case None => adc
      case Some(vectors) => refineTopK(adc, vectors, queries, topk)
    }
  }
}
