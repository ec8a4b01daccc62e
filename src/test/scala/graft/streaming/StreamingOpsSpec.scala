package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.{GraphBuilder, Metric, ShardedServing, VectorIndex}
import graft.streaming.StreamingOps.Event

class StreamingOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("eventWindowAgg: tumbling window counts under watermark") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[Event]
    val q = StreamingOps.eventWindowAgg(mem.toDF())
      .writeStream.format("memory").queryName("win_agg").outputMode("update").start()
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(10), 10, "click", 2.0),
      Event(3, ts(70), 11, "view", 5.0))
    q.processAllAvailable()
    val out = spark.table("win_agg").collect()
    assert(out.length == 2)
    val click = out.find(_.getString(1) == "click").get
    assert(click.getLong(2) == 2L)
    assert(click.getDouble(3) == 3.0)
    q.stop()
  }

  test("streamingFunnel: stage transitions match the batch funnel; boundary-independent") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    def tms(ms: Long) = new Timestamp(1700000000000L + ms)
    // mirrors FunnelRetentionSpec: u1 full chain; u2 click-before-view;
    // u3 purchase-before-click; u5 same-ms click (strict >); u6 click at
    // exactly +1h (inclusive); u7 click 1ms past the window
    val H = 3600000L
    val rows = Seq(
      Event(1, tms(10), 1, "view", 0.0), Event(2, tms(20), 1, "click", 0.0),
      Event(3, tms(30), 1, "purchase", 0.0),
      Event(4, tms(1), 2, "click", 0.0), Event(5, tms(2), 2, "view", 0.0),
      Event(6, tms(1), 3, "view", 0.0), Event(7, tms(15), 3, "purchase", 0.0),
      Event(8, tms(20), 3, "click", 0.0),
      Event(11, tms(5), 5, "view", 0.0), Event(12, tms(5), 5, "click", 0.0),
      Event(13, tms(100), 6, "view", 0.0), Event(14, tms(100 + H), 6, "click", 0.0),
      Event(15, tms(100), 7, "view", 0.0), Event(16, tms(101 + H), 7, "click", 0.0))
    def run(batches: Seq[Seq[Event]], name: String): Map[(Long, Int), Long] = {
      val mem = MemoryStream[Event]
      val q = StreamingOps.streamingFunnel(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val out = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      q.stop(); out
    }
    val ordered = rows.sortBy(e => (e.ts.getTime, e.event_id))
    val one = run(Seq(ordered), "funnel_one")
    val split = run(Seq(ordered.take(7), ordered.drop(7)), "funnel_split")
    assert(one == split, s"one=$one split=$split")
    // stage counts equal the batch funnel: 1_view=6 (u1,2,3,5,6,7),
    // 2_click=3 (u1,3,6), 3_purchase=1 (u1)
    val counts = one.keySet.groupBy(_._2).view.mapValues(_.size).toMap
    assert(counts == Map(1 -> 6, 2 -> 3, 3 -> 1), s"got $counts")
    // the u1 chain carries the correct stage times
    assert(one((1L, 1)) == tms(10).getTime && one((1L, 2)) == tms(20).getTime &&
      one((1L, 3)) == tms(30).getTime)
    // u6's boundary click counted, u7's past-window click did not
    assert(one.contains((6L, 2)) && !one.contains((7L, 2)))
  }

  test("sessionize: 30-min gaps split sessions, state persists across batches") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[Event]
    val q = StreamingOps.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode("update").start()
    mem.addData(
      Event(1, ts(0), 1, "click", 0.0),
      Event(2, ts(5), 1, "click", 0.0),   // same session (5 min gap)
      Event(3, ts(60), 1, "click", 0.0))  // new session (55 min gap)
    q.processAllAvailable()
    mem.addData(
      Event(4, ts(65), 1, "click", 0.0),  // continues session 2
      Event(5, ts(200), 1, "click", 0.0)) // session 3
    q.processAllAvailable()
    val fin = spark.table("sessions").collect()
      .filter(_.getLong(0) == 1L).maxBy(_.getLong(2))
    assert(fin.getLong(1) == 3L) // n_sessions
    assert(fin.getLong(2) == 5L) // n_events
    q.stop()
  }

  test("streamingLshCandidates: stream output == the batch bucket join under one fitted model") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val rng = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(16)(rng.nextFloat())
    val corpus = (0L until 50L).map(i => (i, vec()))
    // ten fresh arrivals plus one exact copy of corpus vector 3 — a
    // planted near-dup that MUST co-bucket in every hash table
    val arrivals = (100L until 110L).map(i => (i, vec())) :+ ((200L, corpus(3)._2))
    val corpusDf = corpus.toDF("id", "vec")
    val model = GraphBuilder.fitLsh(corpusDf, Metric.Cosine)
    val corpusBuckets = GraphBuilder.lshBuckets(corpusDf, model)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = StreamingOps.streamingLshCandidates(
        mem.toDF().toDF("id", "vec"), model, corpusBuckets)
      .writeStream.format("memory").queryName("lsh_cand").outputMode("append").start()
    mem.addData(arrivals: _*)
    q.processAllAvailable()
    val got = spark.table("lsh_cand")
      .select("id", "corpus_id", "tbl", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    // the batch twin: the same operator over the same rows as a batch
    // frame (bucketing is a fitted-model pure expression, so the two
    // paths must agree row for row)
    val batch = StreamingOps.streamingLshCandidates(
        arrivals.toDF("id", "vec"), model, corpusBuckets)
      .select("id", "corpus_id", "tbl", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == batch)
    assert(got.nonEmpty)
    // the planted duplicate co-buckets with its source in ALL tables
    val dupTables = got.collect { case (200L, 3L, tbl, _) => tbl }
    assert(dupTables.size == model.projections.length,
      s"planted dup co-bucketed in ${dupTables.size}/${model.projections.length} tables")
    q.stop()
  }

  test("streamingDedup: duplicate texts within the watermark emit once") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingOps.streamingDedup(mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    mem.addData(
      (1L, ts(0), "alpha doc"),
      (2L, ts(1), "alpha doc"), // dup within watermark -> dropped
      (3L, ts(2), "beta doc"))
    q.processAllAvailable()
    mem.addData((4L, ts(3), "alpha doc")) // still within watermark -> dropped
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect()
    assert(out.length == 2)
    assert(out.map(_.getString(2)).sorted.toSeq == Seq("alpha doc", "beta doc"))
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L)) // first arrival wins
    q.stop()
  }

  test("streamingDecontaminate: docs sharing a benchmark trigram are dropped statelessly") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, String)]
    val bench = Set("the quick brown", "quick brown fox")
    val q = StreamingOps.streamingDecontaminate(
        mem.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("decontam_out").outputMode("append").start()
    mem.addData(
      (1L, "the quick brown fox jumps"), // shares "the quick brown" -> dropped
      (2L, "a clean training document"), // no overlap -> kept
      (3L, "short"), // < 3 tokens, no shingles -> kept
      (4L, "totally quick brown fox here")) // shares "quick brown fox" -> dropped
    q.processAllAvailable()
    val out = spark.table("decontam_out").collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    q.stop()
  }

  test("streamingSpanDecontam: stream output == batch removeContaminatedSpans") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val benchRun = (1 to 8).map(i => s"b$i").mkString(" ")
    val bench = Seq((100L, s"$benchRun tail")).toDF("doc_id", "text")
    val rows = Seq(
      (1L, s"x $benchRun y"),
      (2L, "totally clean"),
      (3L, benchRun),
      (4L, "short"))
    val cids = graft.operators.Dedup.benchmarkChunkIds(bench, k = 8)
    assert(cids.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingSpanDecontam(
        mem.toDF().toDF("doc_id", "text"), cids, k = 8)
      .writeStream.format("memory").queryName("spandec_out").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val stream = spark.table("spandec_out")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    val batch = graft.operators.Dedup.removeContaminatedSpans(
        rows.toDF("doc_id", "text"), bench, k = 8)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(stream == batch)
    assert(stream.map(r => r._1 -> r._4).toMap ==
      Map(1L -> "x y", 2L -> "totally clean", 3L -> "", 4L -> "short"))
    q.stop()
  }

  test("streamingDsirScore: stream scores == batch dsirScore under a frozen model") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    // fit the model on a batch "history" corpus, then score a stream
    val history = Seq(
      (1L, true, "aa bb aa"),
      (2L, true, "bb cc"),
      (3L, false, "dd ee dd"),
      (4L, false, "aa dd"))
      .toDF("doc_id", "is_t", "text")
    val buckets = 32
    val stats = graft.operators.Sampling
      .dsirBucketStats(history, org.apache.spark.sql.functions.col("is_t"), buckets)
      .collect()
    val cr = new Array[Long](buckets)
    val ct = new Array[Long](buckets)
    stats.foreach { r =>
      cr(r.getLong(0).toInt) = r.getLong(1); ct(r.getLong(0).toInt) = r.getLong(2)
    }
    val arrivals = Seq((10L, "aa bb"), (11L, "dd ee"), (12L, "cc dd"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingDsirScore(
        mem.toDF().toDF("doc_id", "text"), cr, ct)
      .writeStream.format("memory").queryName("dsir_out").outputMode("append").start()
    mem.addData(arrivals: _*)
    q.processAllAvailable()
    val stream = spark.table("dsir_out")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val batch = graft.operators.Sampling
      .dsirScore(arrivals.toDF("doc_id", "text"), cr, ct)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(stream == batch)
    // target-vocab arrival scores above the raw-vocab arrival
    val byId = stream.map(r => r._1 -> r._3).toMap
    assert(byId(10L) > byId(11L))
    q.stop()
  }

  test("streamingStoreProbe: stream hits == batch SignatureStore probe (per-pair)") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val corpusRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
    val dir = tmpDir("stream-sigstore")
    graft.operators.SignatureStore.build(corpusRows.toDF("doc_id", "text"), dir)
    val store = graft.operators.SignatureStore.load(spark, dir)
    val batchRows = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (102L, "a totally novel document with fresh content words"),
      (103L, "hi")) // no shingles -> silently clean
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingStoreProbe(
        mem.toDF().toDF("doc_id", "text"), store)
      .writeStream.format("memory").queryName("storeprobe_out").outputMode("append").start()
    mem.addData(batchRows: _*)
    q.processAllAvailable()
    // per-PAIR comparison (the stream emits once per matching band)
    val stream = spark.table("storeprobe_out")
      .select("doc_id", "store_id", "est_jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.operators.SignatureStore.probe(
        graft.operators.Dedup.rowMinhashSignatures(batchRows.toDF("doc_id", "text")),
        store, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(stream == batch)
    assert(stream.map(p => (p._1, p._2)) == Set((101L, 1L)))
    q.stop()
  }

  test("signatureStoreIngest: foreachBatch-merged store is bit-identical to a one-shot rebuild") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    import graft.operators.SignatureStore
    // three ingest days, disjoint ids, with a planted near-dup across
    // batches so the consolidated store has real probe work to serve
    val batches = Seq(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "one two three four five six seven eight nine")),
      Seq((10L, "alpha beta gamma delta epsilon zeta eta iota"),
        (11L, "fresh content words nothing shared with any other doc")),
      Seq((20L, "the third day brings entirely new material again today")))
    val root = tmpDir("sigstream-root")
    val ckpt = tmpDir("sigstream-ckpt")
    val mem = MemoryStream[(Long, String)]
    // AvailableNow restarts on ONE checkpoint: one micro-batch per
    // day, the daily-drop shape (the indexIngest spec's idiom)
    batches.foreach { b =>
      mem.addData(b: _*)
      StreamingOps.signatureStoreIngest(
        mem.toDF().toDF("doc_id", "text"), root, ckpt).awaitTermination()
    }
    val cur = StreamingOps.currentSignatureStore(root)
    assert(cur.isDefined, s"no published cumulative store under $root")
    val streamed = SignatureStore.load(spark, cur.get)
      .as[(Long, Seq[Long])].collect().map { case (id, s) => (id, s.toList) }.toSet
    // one-shot rebuild over the union — the bit-identity target
    val rebuiltDir = tmpDir("sigstream-rebuilt")
    SignatureStore.build(batches.flatten.toDF("doc_id", "text"), rebuiltDir)
    val rebuilt = SignatureStore.load(spark, rebuiltDir)
      .as[(Long, Seq[Long])].collect().map { case (id, s) => (id, s.toList) }.toSet
    assert(streamed == rebuilt)
    // and the stores SERVE identically: same probe hits for a near-dup
    val probeRows = Seq((101L, "alpha beta gamma delta epsilon zeta eta theta"))
    def hits(path: String) = SignatureStore.probe(
        graft.operators.Dedup.rowMinhashSignatures(probeRows.toDF("doc_id", "text")),
        SignatureStore.load(spark, path), 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(hits(cur.get) == hits(rebuiltDir))
    assert(hits(cur.get).map(_._2) == Set(1L, 10L)) // both planted near-dups
    // replay convergence: re-delivering an already-applied batch is a
    // no-op (the cumulative version's sidecar is the publish marker)
    assert(!StreamingOps.applySignatureBatch(
      batches.last.toDF("doc_id", "text"), 2L, root))
    // an empty replayed-id-free batch publishes nothing
    assert(!StreamingOps.applySignatureBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 99L, root))
    // RETENTION (r16 advisor): each publish reaps consumed batch=
    // inputs and keeps only the newest K cumulative versions — the
    // root's storage is bounded by K x store size, not by trigger
    // count. After 3 batches with keep=2: store-v=2 (current),
    // store-v=1 (prober grace), nothing else
    val children = graft.index.ArtifactStore.current.list(root).sorted
    assert(children == Seq("store-v=1", "store-v=2"),
      s"expected bounded retention, found $children")
    // both retained versions stay fully published (a prober that
    // resolved v=1 just before the v=2 publish still reads a store)
    assert(SignatureStore.exists(s"$root/store-v=1"))
    assert(SignatureStore.exists(s"$root/store-v=2"))
    // idempotent: a re-reap with nothing superseded reaps nothing
    assert(StreamingOps.reapSignatureStore(root) == 0)
    // an unpublished (crashed-merge) older version is reaped; the
    // newest-published resolve is untouched
    graft.index.ArtifactStore.current.createDirs(s"$root/store-v=0")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/store-v=0/junk.txt"), "partial")
    assert(StreamingOps.reapSignatureStore(root) == 1)
    assert(StreamingOps.currentSignatureStore(root).contains(s"$root/store-v=2"))
  }

test("streamingVerifiedProbe: stream == batch candidates + editDistanceVerify") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val corpusRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
    val corpus = corpusRows.toDF("doc_id", "text")
    val dir = tmpDir("stream-verified-store")
    graft.operators.SignatureStore.build(corpus, dir)
    val store = graft.operators.SignatureStore.load(spark, dir)
    val batchRows = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (102L, "a totally novel document with fresh content words"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.streamingVerifiedProbe(
        mem.toDF().toDF("doc_id", "text"), store, corpus)
      .writeStream.format("memory").queryName("verifiedprobe_out").outputMode("append").start()
    mem.addData(batchRows: _*)
    q.processAllAvailable()
    val stream = spark.table("verifiedprobe_out")
      .select("doc_id", "store_id", "lev", "sim", "verified").distinct()
      .as[(Long, Long, Int, Double, Int)].collect().toSet
    // batch twin: store probe candidates -> editDistanceVerify over the
    // disjoint-id union corpus
    val pairs = graft.operators.SignatureStore.probe(
        graft.operators.Dedup.rowMinhashSignatures(batchRows.toDF("doc_id", "text")),
        store, 0.5)
      .select(col("batch_id").as("doc_a"), col("store_id").as("doc_b"))
    val batch = graft.operators.Dedup.editDistanceVerify(
        corpus.unionByName(batchRows.toDF("doc_id", "text")), pairs, tau = 0.9)
      .select(col("doc_a"), col("doc_b"), col("lev"), col("sim"), col("verified"))
      .as[(Long, Long, Int, Double, Int)].collect().toSet
    assert(stream == batch)
    // exactly the one planted near-dup candidate surfaces
    assert(stream.map(p => (p._1, p._2)) == Set((101L, 1L)))
    q.stop()
  }

  test("bm25SearchStream: streamed answers == the batch persisted-index search") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val corpus = Seq(
      (1L, "spark streams answer keyword queries"),
      (2L, "totally unrelated text about fish"),
      (3L, "keyword queries over spark need an index")).toDF("doc_id", "text")
    val idxDir = tmpDir("bm25-stream-idx")
    graft.operators.Retrieval.buildIndex(corpus, idxDir)
    val queries = Seq((100L, "keyword queries"), (200L, "fish"))
    val outDir = tmpDir("bm25-stream-out")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.bm25SearchStream(spark,
      mem.toDF().toDF("query_id", "qtext"), idxDir, outDir,
      tmpDir("bm25-stream-ckpt"), k = 2)
    mem.addData(queries: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("query_id", "doc_id", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect().toSet
    val batch = graft.operators.Retrieval.searchIndex(
        spark, idxDir, queries.toDF("query_id", "qtext"), k = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(streamed == batch)
    assert(streamed.exists(r => r._1 == 200L && r._2 == 2L)) // fish -> doc 2
  }

  test("streamingClusterMix: windowed cluster counts == batch assignment counts") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val model = graft.operators.KmeansModel(
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(1, 10), Seq(0.5f, 0.2f)),   // hour 1, cluster 0
      (ts(1, 20), Seq(9.5f, 10.2f)),  // hour 1, cluster 1
      (ts(1, 40), Seq(0.1f, 0.1f)),   // hour 1, cluster 0
      (ts(2, 5), Seq(10.0f, 9.0f)),   // hour 2, cluster 1
      (ts(5, 0), Seq(0.0f, 0.0f)))    // late watermark flusher
    val mem = MemoryStream[(Timestamp, Seq[Float])]
    val q = StreamingOps.streamingClusterMix(
        mem.toDF().toDF("ts", "vec"), model)
      .writeStream.format("memory").queryName("clustermix_out").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val out = spark.table("clustermix_out")
      .as[(Timestamp, Int, Long)].collect().toSet
    // closed windows only (hour 5 is still open under the 2h watermark)
    assert(out == Set(
      (ts(1, 0), 0, 2L), (ts(1, 0), 1, 1L), (ts(2, 0), 1, 1L)))
    // batch twin: same assignment expression, same grouping
    val batch = rows.toDF("ts", "vec")
      .withColumn("cluster",
        graft.operators.Clustering.assignExpr(col("vec"), model.centroids))
      .groupBy(window(col("ts"), "1 hour"), col("cluster")).count()
      .select(col("window.start"), col("cluster"), col("count"))
      .as[(Timestamp, Int, Long)].collect().toSet
    assert(out.subsetOf(batch))
    q.stop()
  }

  test("streamingSemanticDecon: stream output == batch semanticDecontaminate") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val bench = Seq(Array(1.0f, 0.0f), Array(0.6f, 0.8f))
    val rows = Seq(
      (1L, Array(2.0f, 0.0f)),   // cos 1.0 vs bench0
      (2L, Array(1.0f, 1.0f)),   // ~0.9899 vs bench1
      (3L, Array(-1.0f, 0.0f)),  // best is 0.0? no: vs bench0 = -1, bench1 = -0.6 -> max -0.6
      (4L, Array(0.0f, 0.0f)))   // zero norm -> 0
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingOps.streamingSemanticDecon(
        mem.toDF().toDF("vec_id", "embedding"), bench, tau = 0.8)
      .select("vec_id", "max_cos", "contaminated")
      .writeStream.format("memory").queryName("semdecon_out").outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val stream = spark.table("semdecon_out")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    val batch = graft.operators.Similarity.semanticDecontaminate(
        rows.toDF("vec_id", "embedding"),
        bench.zipWithIndex.map { case (v, i) => (100L + i, v) }.toDF("vec_id", "embedding"),
        tau = 0.8)
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(stream == batch)
    assert(stream.map(r => r._1 -> r._3).toMap == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    q.stop()
  }

  test("chunkTokens runs unchanged on a stream: stateless posexplode projection") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.chunkTokens(
        mem.toDF().toDF("doc_id", "text"), size = 4, stride = 2)
      .writeStream.format("memory").queryName("chunk_out").outputMode("append").start()
    val rows = Seq((1L, "a b c d e f"), (2L, "x y"))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("chunk_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = graft.operators.TextAnalysis.chunkTokens(
        rows.toDF("doc_id", "text"), size = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed == batch && streamed.contains((1L, 1, "c d e f")))
    q.stop()
  }

  test("mixtureSample runs unchanged on a stream: stateless per-row filter") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, String)]
    val rates = Map("en" -> 0.5, "zh" -> 0.1)
    val q = graft.operators.Sampling.mixtureSample(
        mem.toDF().toDF("doc_id", "lang"), rates)
      .writeStream.format("memory").queryName("mix_out").outputMode("append").start()
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val kept = spark.table("mix_out").collect().map(_.getLong(0)).toSet
    val p = 1000000007L
    val expected = rows.collect {
      case (id, s) if ((id % p) * (2654435761L % p)) % p % 10000 <
        math.round(rates(s) * 10000) => id
    }.toSet
    assert(kept == expected && kept.nonEmpty)
    q.stop()
  }

  test("quality gate runs unchanged on a stream: hashed score + PII redaction are stateless") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    import graft.operators.TextAnalysis
    val mem = MemoryStream[(Long, String)]
    def gate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      TextAnalysis.withPiiRedaction(TextAnalysis.withHashedLinearScore(df))
        .select(col("doc_id"), col("score_fp"), col("keep"), col("n_emails"), col("redacted"))
    val q = gate(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("quality_out").outputMode("append").start()
    val rows = Seq(
      (1L, "the the the the the quick brown fox"),
      (2L, "mail me at a@b.com for details"),
      (3L, "zzz qqq vvv"))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("quality_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getString(4))).toMap
    val batch = gate(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getString(4))).toMap
    assert(streamed == batch && streamed.size == 3)
    assert(streamed(2L)._3 == 1L && streamed(2L)._4.contains("<EMAIL>"))
    q.stop()
  }

  test("indexIngest: streamed vectors land in new index snapshots") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val path = tmpDir("stream-idx")
    val ckpt = tmpDir("stream-ckpt")
    VectorIndex.create(spark, path, dim = 4, maxDegree = 8, metric = Metric.Euclidean)
    val mem = MemoryStream[(String, Seq[Float])]
    val stream = mem.toDF().toDF("key", "vec")
    mem.addData(("a", Seq(1f, 0f, 0f, 0f)), ("b", Seq(0f, 1f, 0f, 0f)))
    StreamingOps.indexIngest(spark, stream, path, ckpt).awaitTermination()
    val idx1 = VectorIndex.load(spark, path)
    assert(idx1.meta.version == 1)
    assert(idx1.meta.numPoints == 2)
    mem.addData(("c", Seq(0f, 0f, 1f, 0f)))
    StreamingOps.indexIngest(spark, stream, path, ckpt).awaitTermination()
    val idx2 = VectorIndex.load(spark, path)
    assert(idx2.meta.numPoints == 3)
    val s = idx2.toServing
    assert(s.search(Array(0f, 0f, 1f, 0f), topk = 1).head._1.contains("c"))
    assert(s.embeddingByKey("a").sameElements(Array(1f, 0f, 0f, 0f)))
  }

  test("sessionizeComplete: closed sessions emitted after watermark passes the gap") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[Event]
    val q = StreamingOps.sessionizeComplete(mem.toDS())
      .writeStream.format("memory").queryName("closed_sessions").outputMode("append").start()
    // session 1: two events 5 min apart
    mem.addData(Event(1, ts(0), 7, "click", 0.0), Event(2, ts(5), 7, "click", 0.0))
    q.processAllAvailable()
    // 2h later: new session for the same user; watermark (max ts - 1h)
    // passes session 1's gap -> session 1 closes
    mem.addData(Event(3, ts(120), 7, "click", 0.0))
    q.processAllAvailable()
    mem.addData(Event(4, ts(400), 8, "view", 0.0)) // push watermark further
    q.processAllAvailable()
    val out = spark.table("closed_sessions").collect()
    val s1 = out.find(r => r.getLong(0) == 7L && r.getLong(1) == ts(0).getTime)
    assert(s1.isDefined, s"expected closed session 1 in ${out.mkString(";")}")
    assert(s1.get.getLong(2) == ts(5).getTime) // session_end
    assert(s1.get.getLong(3) == 2L)            // n_events
    q.stop()
  }

  test("indexMutations: interleaved streamed inserts and deletes maintain the index") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val path = tmpDir("stream-mut")
    val ckpt = tmpDir("stream-mut-ckpt")
    VectorIndex.create(spark, path, dim = 4, maxDegree = 8, metric = Metric.Euclidean)
    // op, key, vec, public_id
    val mem = MemoryStream[(String, String, Seq[Float], Long)]
    val stream = mem.toDF().toDF("op", "key", "vec", "public_id")
    mem.addData(
      ("insert", "a", Seq(1f, 0f, 0f, 0f), -1L),
      ("insert", "b", Seq(0f, 1f, 0f, 0f), -1L),
      ("insert", "c", Seq(0f, 0f, 1f, 0f), -1L))
    StreamingOps.indexMutations(spark, stream, path, ckpt).awaitTermination()
    val idx1 = VectorIndex.load(spark, path)
    assert(idx1.meta.numPoints == 3)
    // batch 2: delete "b" (public id 2) and insert "d" — the freed slot
    // recycles within the SAME batch (deletes first, LIFO)
    mem.addData(
      ("delete", null, null, 2L),
      ("insert", "d", Seq(0f, 0f, 0f, 1f), -1L))
    StreamingOps.indexMutations(spark, stream, path, ckpt).awaitTermination()
    val idx2 = VectorIndex.load(spark, path)
    assert(idx2.meta.numPoints == 3)
    val s = idx2.toServing
    // "b" is gone and unreachable (Q5); "d" recycled its slot
    assert(s.idForKey("b").isEmpty)
    assert(s.idForKey("d").contains(2L))
    assert(s.search(Array(0f, 1f, 0f, 0f), topk = 3).forall(_._1 != Some("b")))
    assert(s.embeddingByKey("d").sameElements(Array(0f, 0f, 0f, 1f)))
    // delete-only batch
    mem.addData(("delete", null, null, 1L))
    StreamingOps.indexMutations(spark, stream, path, ckpt).awaitTermination()
    assert(VectorIndex.load(spark, path).meta.numPoints == 2)
  }

  test("routerMaintenance: live fleet matches a rebuilt-from-snapshot fleet") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val path = tmpDir("rmaint-idx")
    val ckpt = tmpDir("rmaint-ckpt")
    val rng = new scala.util.Random(7)
    def vec(): Seq[Float] = Seq.fill(8)(rng.nextFloat())
    val base = (0L until 200L).map(i => (i, s"base$i", vec()))
    VectorIndex.build(spark, path, base.toDF("id", "key", "vec"),
      dim = 8, maxDegree = 16)
    val router = ShardedServing.fromIndex(VectorIndex.load(spark, path), 4)
    assert(router.numPoints == 200)

    val mem = MemoryStream[(String, String, Seq[Float], Long)]
    val stream = mem.toDF().toDF("op", "key", "vec", "public_id")

    // batch 1: pure inserts land in both the snapshot and the fleet
    mem.addData((0 until 20).map(i => ("insert", s"new$i", vec(), -1L)): _*)
    StreamingOps.routerMaintenance(spark, stream, path, router, ckpt)
      .awaitTermination()
    assert(router.numPoints == 220)
    assert(router.idForKey("new0").isDefined)

    // batch 2: deletes (old AND just-inserted ids) + inserts that
    // recycle the freed slots within the same batch, LIFO
    mem.addData(
      Seq(("delete", null, null, 3L),
        ("delete", null, null, 7L),
        ("delete", null, null, 205L)) ++
        (0 until 10).map(i => ("insert", s"re$i", vec(), -1L)): _*)
    StreamingOps.routerMaintenance(spark, stream, path, router, ckpt)
      .awaitTermination()

    val idx2 = VectorIndex.load(spark, path)
    assert(router.numPoints == idx2.meta.numPoints)
    val rebuilt = ShardedServing.fromIndex(idx2, 4)
    assert(router.allKeys == rebuilt.allKeys)
    // searches agree EXACTLY: ef covers the whole graph, so both
    // fleets' exact re-ranks see every live vector — same ids, same
    // keys, same distances, despite independently-wired graphs
    (0 until 20).foreach { _ =>
      val q = Array.fill(8)(rng.nextFloat())
      val a = router.search(q, topk = 5, ef = 1000)
      val b = rebuilt.search(q, topk = 5, ef = 1000)
      assert(a == b, s"live fleet and rebuilt fleet disagree: $a vs $b")
    }
    // keys resolve to the same global ids in both fleets, and the
    // deleted rows' keys are gone from both (allKeys equality above
    // covers the full key sets)
    Seq("new0", "re3", "base42").foreach { k =>
      assert(router.idForKey(k).isDefined && router.idForKey(k) == rebuilt.idForKey(k))
    }
    Seq("base2", "base6").foreach { k => // gids 3 and 7 pre-delete
      assert(router.idForKey(k).isEmpty && rebuilt.idForKey(k).isEmpty)
    }
  }

  test("applyRouterBatch replay converges a router that missed the batch") {
    val ss = spark
    import ss.implicits._
    val path = tmpDir("rmaint-replay")
    val rng = new scala.util.Random(11)
    def vec(): Seq[Float] = Seq.fill(8)(rng.nextFloat())
    val base = (0L until 100L).map(i => (i, s"b$i", vec()))
    VectorIndex.build(spark, path, base.toDF("id", "key", "vec"),
      dim = 8, maxDegree = 16)
    val router = ShardedServing.fromIndex(VectorIndex.load(spark, path), 4)

    val batch = Seq(
      ("delete", null: String, null: Seq[Float], 5L),
      ("insert", "x1", vec(), -1L),
      ("insert", "x2", vec(), -1L)
    ).toDF("op", "key", "vec", "public_id")

    // crash simulation: the SNAPSHOT commits batch 1 (ingestBatchId +
    // ingestSegment recorded) but the router never saw it
    assert(StreamingOps.applyMutationBatch(spark, path, batch, 1L))
    assert(router.numPoints == 100) // router is behind

    // re-delivery of the same batch id: snapshot untouched, router
    // converged (deletes idempotent, inserts land at the committed ids)
    val applied = StreamingOps.applyRouterBatch(spark, path, router, batch, 1L)
    assert(!applied) // snapshot side correctly skipped
    val idx = VectorIndex.load(spark, path)
    assert(router.numPoints == idx.meta.numPoints)
    val rebuilt = ShardedServing.fromIndex(idx, 4)
    assert(router.allKeys == rebuilt.allKeys)
    assert(router.idForKey("x1").isDefined)
    assert(router.idForKey("x1") == rebuilt.idForKey("x1"))
    assert(router.idForKey("b4").isEmpty) // gid 5 pre-delete

    // a second replay is a no-op (every slot already live)
    assert(!StreamingOps.applyRouterBatch(spark, path, router, batch, 1L))
    assert(router.numPoints == idx.meta.numPoints)
  }

  test("streamingSearch answers query micro-batches against the live snapshot") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val path = tmpDir("stream-search-idx")
    val out = tmpDir("stream-search-out")
    val ckpt = tmpDir("stream-search-ckpt")
    val src = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f)), (3L, Seq(0f, 0f, 0f, 1f))
    ).toDF("id", "vec")
    VectorIndex.build(spark, path, src, dim = 4, maxDegree = 4)
    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("query_id", "qvec")
    mem.addData((100L, Seq(1f, 0.1f, 0f, 0f)))
    StreamingOps.streamingSearch(spark, stream, path, out, ckpt, topk = 2).awaitTermination()
    // the index mutates between micro-batches; the next batch sees it
    VectorIndex.load(spark, path)
      .insertBatch(Seq(("probe", Seq(0.9f, 0.1f, 0f, 0f))).toDF("key", "vec"))
    mem.addData((101L, Seq(0.9f, 0.1f, 0f, 0f)))
    StreamingOps.streamingSearch(spark, stream, path, out, ckpt, topk = 2).awaitTermination()
    val res = spark.read.parquet(out)
    assert(res.filter(col("query_id") === 100L).count() == 2)
    val top100 = res.filter(col("query_id") === 100L && col("rnk") === 1).head()
    assert(top100.getAs[Long]("public_id") == 1L) // nearest to (1,0,0,0)
    val top101 = res.filter(col("query_id") === 101L && col("rnk") === 1).head()
    assert(top101.getAs[String]("key") == "probe") // sees the new snapshot
    // batch ids record which generation served each query
    assert(res.select(col("batch_id")).distinct().count() == 2)
  }

  test("applyMutationBatch replays safely: deletes idempotent, insert guarded by batch id") {
    val ss = spark
    import ss.implicits._
    val path = tmpDir("mut-idem")
    VectorIndex.create(spark, path, dim = 4, maxDegree = 8, metric = Metric.Euclidean)
    assert(StreamingOps.applyMutationBatch(spark, path,
      Seq(("insert", "x", Seq(1f, 0f, 0f, 0f), -1L), ("insert", "y", Seq(0f, 1f, 0f, 0f), -1L))
        .toDF("op", "key", "vec", "public_id"), batchId = 0L))
    val mixed = Seq(
      ("delete", null.asInstanceOf[String], null.asInstanceOf[Seq[Float]], 1L),
      ("insert", "z", Seq(0f, 0f, 1f, 0f), -1L)
    ).toDF("op", "key", "vec", "public_id")
    assert(StreamingOps.applyMutationBatch(spark, path, mixed, batchId = 1L))
    val n1 = VectorIndex.load(spark, path).meta.numPoints
    // full replay of batch 1 (crash between delete commit and insert
    // commit replays BOTH ops): re-delete no-ops, insert is skipped
    assert(!StreamingOps.applyMutationBatch(spark, path, mixed, batchId = 1L))
    val idx = VectorIndex.load(spark, path)
    assert(idx.meta.numPoints == n1)
    assert(idx.toServing.idForKey("z").contains(1L)) // recycled x's slot
    assert(idx.toServing.idForKey("x").isEmpty)
  }

  test("applyIngestBatch is idempotent under at-least-once replay") {
    val ss = spark
    import ss.implicits._
    val path = tmpDir("ingest-idem")
    VectorIndex.create(spark, path, dim = 4, maxDegree = 8, metric = Metric.Euclidean)
    val batch = Seq(("x", Seq(1f, 0f, 0f, 0f)), ("y", Seq(0f, 1f, 0f, 0f)))
      .toDF("key", "vec")
    assert(StreamingOps.applyIngestBatch(spark, path, batch, batchId = 0L))
    // replay of the same micro-batch (crash between commit and
    // checkpoint write) must be skipped
    assert(!StreamingOps.applyIngestBatch(spark, path, batch, batchId = 0L))
    val idx = VectorIndex.load(spark, path)
    assert(idx.meta.numPoints == 2)
    assert(idx.meta.ingestBatchId == 0L)
    assert(StreamingOps.applyIngestBatch(spark, path, batch, batchId = 1L))
    assert(VectorIndex.load(spark, path).meta.numPoints == 4)
  }

  test("streamingAnomalies: running 3-sigma flags match a prefix replay and ignore batch boundaries") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    // user 1: a stable band then one extreme spike; user 2: constant
    val evs = (1 to 30).map(i => Event(i.toLong, ts(i), 1L, "m", 10.0 + (i % 3))) ++
      Seq(Event(31L, ts(31), 1L, "m", 900.0)) ++
      (101 to 110).map(i => Event(i.toLong, ts(i), 2L, "m", 5.0))
    // reference: prefix replay with the same exact-integer test
    def prefixFlags(events: Seq[Event]): Seq[Long] = {
      val flags = Seq.newBuilder[Long]
      val st = collection.mutable.Map.empty[Long, (Long, Long, Long)]
      events.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val fp = math.floor(e.value * 1000.0 + 0.5).toLong
        val (n0, s0, ss0) = st.getOrElse(e.user_id, (0L, 0L, 0L))
        val (n, s, sq) = (n0 + 1, s0 + fp, ss0 + fp * fp)
        st(e.user_id) = (n, s, sq)
        val lhs = BigInt(n) * fp - s
        if (lhs * lhs > 9 * (BigInt(n) * sq - BigInt(s) * s)) flags += e.event_id
      }
      flags.result()
    }
    val expected = prefixFlags(evs)
    assert(expected.contains(31L) && !expected.exists(_ > 100L), s"bad fixture: $expected")

    def run(batches: Seq[Seq[Event]], name: String): Seq[Long] = {
      val mem = MemoryStream[Event]
      val q = StreamingOps.streamingAnomalies(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect().map(_.getLong(1)).toSeq.sorted
    }
    val oneBatch = run(Seq(evs), "anom_one")
    val split = run(Seq(evs.take(12), evs.slice(12, 31), evs.drop(31)), "anom_split")
    assert(oneBatch == expected.sorted)
    assert(split == oneBatch)
  }

  test("streamingTokenDrift: per-window KL == batch twin; drifted window scores higher") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val baseline = Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L)
    val H = 3600000L
    def tms(ms: Long) = new Timestamp(1700000000000L / H * H + ms)
    // window 0 mirrors the baseline mix; window 1 is all-OOV drift
    val rows = Seq(
      (tms(10), "alpha beta"), (tms(20), "alpha gamma"),
      (tms(H + 10), "zeta zeta omega"),
      (tms(3 * H), "sentinel")) // advances the watermark past both windows

    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.streamingTokenDrift(
        mem.toDF().toDF("ts", "text"), baseline, mgK = 64)
      .writeStream.format("memory").queryName("tok_drift").outputMode("append").start()
    rows.grouped(2).foreach { b => mem.addData(b); q.processAllAvailable() }
    val stream = spark.table("tok_drift").collect()
      .map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    q.stop()

    val batch = StreamingOps.streamingTokenDrift(
        rows.toDF("ts", "text"), baseline, mgK = 64)
      .collect().map(r => r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(stream.keySet == Set(tms(0), tms(H))) // sentinel window still open
    assert(stream == batch.view.filterKeys(stream.keySet).toMap)
    val (n0, kl0) = stream(tms(0))
    val (n1, kl1) = stream(tms(H))
    assert(n0 == 4L && n1 == 3L)
    assert(kl0 >= 0.0 && kl1 > kl0, s"expected OOV window to drift harder: $kl0 vs $kl1")
  }

  test("streamingCanaryCounts: per-window phrase totals == batch twin on closed windows") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val pats = Seq("slow fast", "hash value")
    val H = 3600000L
    def tms(ms: Long) = new Timestamp(1700000000000L / H * H + ms)
    val rows = Seq(
      (tms(10), "x slow fast y slow fast"), (tms(20), "hash value only"),
      (tms(H + 5), "slow fast once"), (tms(H + 6), "nothing here"),
      (tms(3 * H), "sentinel")) // advances the watermark past both windows

    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.streamingCanaryCounts(
        mem.toDF().toDF("ts", "text"), pats)
      .writeStream.format("memory").queryName("canary").outputMode("append").start()
    rows.grouped(2).foreach { b => mem.addData(b); q.processAllAvailable() }
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))
    val stream = spark.table("canary").collect().map(key).toMap
    q.stop()
    val batch = StreamingOps.streamingCanaryCounts(rows.toDF("ts", "text"), pats)
      .collect().map(key).toMap
    assert(stream == batch.view.filterKeys(k => k._1.getTime < tms(2 * H).getTime).toMap)
    assert(stream((tms(0), 1)) == ((1L, 2L)))  // one doc, two occurrences
    assert(stream((tms(0), 2)) == ((1L, 1L)))
    assert(stream((tms(H), 1)) == ((1L, 1L)))
    // a zero-match phrase still reports (0, 0) — the alarm reads
    // "phrase seen nowhere this window" as data, not absence
    assert(stream((tms(H), 2)) == ((0L, 0L)))
  }

  test("streamingOovRate: per-window coverage == batch twin; OOV flood sags coverage") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val vocab = Set("alpha", "beta", "gamma")
    val H = 3600000L
    def tms(ms: Long) = new Timestamp(1700000000000L / H * H + ms)
    val rows = Seq(
      (tms(10), "alpha beta alpha"), (tms(20), "gamma zork"),
      (tms(H + 5), "zork blip blip quux zork"),
      (tms(3 * H), "sentinel"))

    val mem = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.streamingOovRate(mem.toDF().toDF("ts", "text"), vocab)
      .writeStream.format("memory").queryName("oov").outputMode("append").start()
    rows.grouped(2).foreach { b => mem.addData(b); q.processAllAvailable() }
    def key(r: org.apache.spark.sql.Row) =
      r.getTimestamp(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val stream = spark.table("oov").collect().map(key).toMap
    q.stop()
    val batch = StreamingOps.streamingOovRate(rows.toDF("ts", "text"), vocab)
      .collect().map(key).toMap
    assert(stream == batch.view.filterKeys(stream.keySet).toMap)
    val (n0, c0, o0) = stream(tms(0))
    val (n1, c1, o1) = stream(tms(H))
    assert(n0 == 5L && c0 == 0.8 && o0 == 1.0)   // zork is the one OOV type
    assert(n1 == 5L && c1 == 0.0 && o1 == 3.0)   // the drifted window
    assert(c1 < c0)
  }

  test("streamingProfile: running per-column profile == batch twin on every prefix") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    val rows: Seq[(java.lang.Long, String)] =
      (1L to 30L).map(i => (java.lang.Long.valueOf(i % 13), s"doc $i text")) :+
        ((null: java.lang.Long, "null id row"))
    val batches = Seq(rows.take(10), rows.slice(10, 25), rows.drop(25))

    def batchProfile(prefix: Seq[(java.lang.Long, String)]): Seq[String] =
      graft.operators.Profile.profileTableApprox(
          prefix.toDF("id", "text"), Seq("id", "text"), k = 8)
        .collect().map(_.toString).sorted.toSeq

    val mem = MemoryStream[(java.lang.Long, String)]
    val q = StreamingOps.streamingProfile(
        mem.toDF().toDF("id", "text"), Seq("id", "text"), k = 8)
      .writeStream.format("memory").queryName("run_prof")
      .outputMode("complete").start()
    var seen = Seq.empty[(java.lang.Long, String)]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      seen = seen ++ b
      val streamed = spark.table("run_prof").collect().map(_.toString).sorted.toSeq
      assert(streamed == batchProfile(seen), s"prefix of ${seen.size} rows diverged")
    }
    q.stop()
  }

  test("streamingDistinctCard: running KMV estimate == batch sketch on every prefix") {
    val ss = spark
    implicit val sql = ss.sqlContext
    import ss.implicits._
    // Two groups: "hot" crosses k=8 (estimator path), "cold" stays
    // below it (exact path). Duplicated user ids across batches must
    // not move the sketch (set semantics survive the state store).
    val rows = (1L to 60L).map(u => ("hot", u)) ++
      (1L to 5L).map(u => ("cold", u + 1000L)) ++
      (1L to 20L).map(u => ("hot", u)) // repeats
    val batches = Seq(rows.take(25), rows.slice(25, 45), rows.drop(45))

    def batchCard(prefix: Seq[(String, Long)]): Map[String, Double] =
      StreamingOps.streamingDistinctCard(
          prefix.toDF("event_type", "user_id"), k = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val mem = MemoryStream[(String, Long)]
    val q = StreamingOps.streamingDistinctCard(
        mem.toDF().toDF("event_type", "user_id"), k = 8)
      .writeStream.format("memory").queryName("kmv_card").outputMode("complete").start()
    var seen = Seq.empty[(String, Long)]
    batches.foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
      seen = seen ++ b
      val streamed = spark.table("kmv_card").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed == batchCard(seen), s"prefix of ${seen.size} rows diverged")
    }
    q.stop()
    val fin = batchCard(seen)
    assert(fin("cold") == 5.0) // below k: the sketch IS the value set
    assert(fin("hot") > 8.0) // estimator path engaged
  }
}
