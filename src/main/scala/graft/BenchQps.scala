package graft

/** Solo serving-QPS trend tool: re-measures the four serving loops
  * from [[Bench]] (single-graph, PQ low-memory, 4-shard router, and
  * the fromIndex-loaded fleet) with no preceding query workload — the
  * round bench runs these after ~190 queries of GC/block pressure,
  * which rounds 4/5 showed can move the numbers 1.3-1.6x. The
  * workloads themselves live in [[QpsWorkloads]], shared with Bench,
  * so the two tools time the SAME loops by construction (seeds,
  * 10k x 100d shape, graph degree, warmup, median protocol). The
  * three in-memory loops run Spark-free; the fromIndex loop is the
  * one that inherently needs a session (its distributed build IS the
  * thing measured), created only after the Spark-free numbers print
  * so they stay uncontaminated.
  *
  * Since r15 this is also the round's PINNED TREND ARTIFACT
  * (BENCH_QPS.json): serving QPS "wobbled" 364→301 in-bench across
  * rounds r12–r14 with a host caveat each time — three rounds of
  * wobble with no solo-JVM trend line is exactly how a real 20%
  * erosion would hide. Each run records the cold (first timed loop)
  * vs warm (median of the rest) split per workload and gates every
  * warm number against the previous artifact with a RECALL-style
  * drift rule: `qps >= prev * 0.85`. A failed gate doesn't abort —
  * it stamps `drift_ok: false` so the regression is impossible to
  * mistake for wobble. Run on a QUIET host (nothing else on the
  * machine — the point is a contention-free number).
  * Usage: runMain graft.BenchQps [repeat]
  */
object BenchQps {

  /** RECALL-style drift bar: a warm QPS at or above 85% of the
    * previous pinned run passes (host wobble band); below it the
    * artifact stamps a real erosion. Sentinels (-1 current: the loop
    * failed -> fail the gate; missing/invalid prev: nothing to gate
    * against -> pass) keep the rule total. Pure for the spec. */
  private[graft] def driftOk(curr: Double, prev: Option[Double]): Boolean =
    curr > 0.0 && prev.forall(p => p <= 0.0 || curr >= 0.85 * p)

  /** Previous pinned warm-QPS map from BENCH_QPS.json (read before
    * this run overwrites it); missing/corrupt -> empty. */
  private[graft] def prevQps(path: String): Map[String, Double] =
    try {
      import org.json4s._
      val root = jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8))
      (root \ "qps_warm") match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(d)) => k -> d
          case (k, JInt(i)) => k -> i.toDouble
          case (k, JDecimal(d)) => k -> d.toDouble
        }.toMap
        case _ => Map.empty
      }
    } catch { case _: Throwable => Map.empty }

  /** (cold, warm, median) split of one workload's per-loop QPS:
    * cold = first timed loop (post-warmup, but first at full length),
    * warm = median of the rest, med = median of all (the number Bench
    * reports). At repeat=1 warm falls back to the only loop. */
  private[graft] def split(loops: Seq[Double]): (Double, Double, Double) =
    if (loops.isEmpty) (-1.0, -1.0, -1.0)
    else (loops.head,
      QpsWorkloads.median(if (loops.size > 1) loops.tail else loops),
      QpsWorkloads.median(loops))

  def main(args: Array[String]): Unit = {
    val repeat = math.max(1, if (args.nonEmpty) args(0).toInt else 5)
    val out = sys.env.getOrElse("SPARK_GRAFT_QPS_OUT", "BENCH_QPS.json")
    val prev = prevQps(out)
    def measure(name: String, mk: => QpsWorkloads.Workload): (String, (Double, Double, Double)) = {
      val s = try split(QpsWorkloads.qpsLoops(mk, repeat))
      catch { case _: Throwable => (-1.0, -1.0, -1.0) }
      println(f"${name}_qps ${s._3}%8.1f (cold ${s._1}%8.1f warm ${s._2}%8.1f)")
      name -> s
    }
    val inMem = Seq(
      measure("single", QpsWorkloads.singleGraph()),
      measure("pq", QpsWorkloads.pqLowMemory()),
      measure("sharded", QpsWorkloads.shardedRouter()))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // defensive like Bench: a fromIndex failure (temp-dir, build error)
    // must still write the artifact and release the session
    val (fiLoad, fiSplit) = try {
      val (load, workload) = QpsWorkloads.fromIndexRouter(spark, repeat)
      println(f"fi_load_sec ${load.medianSec}%8.1f (cold ${load.coldSec}%8.1f warm ${load.warmSec}%8.1f)")
      val s = split(QpsWorkloads.qpsLoops(workload, repeat))
      println(f"fi_qps      ${s._3}%8.1f (cold ${s._1}%8.1f warm ${s._2}%8.1f)")
      (load, s)
    } catch { case _: Throwable =>
      (QpsWorkloads.FromIndexLoad(-1.0, -1.0, -1.0), (-1.0, -1.0, -1.0))
    } finally spark.stop()
    val all = inMem :+ ("fromindex" -> fiSplit)
    val gates = all.map { case (k, (_, warm, _)) => k -> driftOk(warm, prev.get(k)) }
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s""""$k":${Bench.r1(v)}""" }.mkString("{", ",", "}")
    val json =
      s"""{"repeat":$repeat,""" +
        s""""qps_cold":${jmap(all.map { case (k, (c, _, _)) => k -> c })},""" +
        s""""qps_warm":${jmap(all.map { case (k, (_, w, _)) => k -> w })},""" +
        s""""qps_median":${jmap(all.map { case (k, (_, _, m)) => k -> m })},""" +
        s""""fi_load_cold_sec":${Bench.r2(fiLoad.coldSec)},""" +
        s""""fi_load_warm_sec":${Bench.r2(fiLoad.warmSec)},""" +
        s""""prev_qps_warm":${jmap(prev.toSeq.sortBy(_._1))},""" +
        s""""drift_rule":"warm qps >= prev_warm * 0.85",""" +
        s""""drift_ok":${gates.map { case (k, ok) => s""""$k":$ok""" }
          .mkString("{", ",", "}")},""" +
        s""""drift_all_ok":${gates.forall(_._2)}}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    catch { case _: Throwable => () }
    println(json)
  }
}
