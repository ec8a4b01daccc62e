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
  * erosion would hide. Each run measures every workload over
  * SPARK_GRAFT_QPS_PASSES (default 2) independent passes and keeps
  * the QUIET-SIDE pass per workload (best warm — contention only
  * ever slows a loop; the QPS mirror of the bench's min-merge),
  * recording each pass's warm so the artifact shows the band. Per
  * workload: cold (first timed loop) vs warm (median of the rest),
  * gated against the previous artifact with a RECALL-style drift
  * rule: `qps >= prev * 0.85`. A failed gate doesn't abort —
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

  /** Previous pinned artifact from BENCH_QPS.json (read before this
    * run overwrites it): its round tag, the round tag of the baseline
    * IT gated against, its warm numbers, and that baseline.
    * Missing/corrupt -> all-empty. */
  private[graft] def prevArtifact(path: String)
      : (Option[String], Option[String], Map[String, Double], Map[String, Double]) =
    try {
      import org.json4s._
      val root = jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
          java.nio.charset.StandardCharsets.UTF_8))
      def m(field: String): Map[String, Double] = (root \ field) match {
        case JObject(fields) => fields.collect {
          case (k, JDouble(d)) => k -> d
          case (k, JInt(i)) => k -> i.toDouble
          case (k, JDecimal(d)) => k -> d.toDouble
        }.toMap
        case _ => Map.empty
      }
      def tag(field: String): Option[String] = (root \ field) match {
        case JString(s) if s.nonEmpty => Some(s)
        case _ => None
      }
      (tag("round_tag"), tag("baseline_round_tag"), m("qps_warm"), m("prev_qps_warm"))
    } catch { case _: Throwable => (None, None, Map.empty, Map.empty) }

  /** Round-over-round baseline selection (r15 verdict item 8: the
    * artifact's prev_qps_warm self-updated each RUN, so a second run
    * within a round silently rebased the drift gate onto its own
    * sibling). When the previous artifact carries the SAME round tag
    * as this run, inherit the baseline IT gated against (and that
    * baseline's tag) so every run of round N gates against round N-1;
    * an untagged run (no SPARK_GRAFT_ROUND) keeps the old
    * run-over-run behavior. A NONEMPTY baseline whose producing run
    * carried no tag reports `"untagged"` rather than null (r16 advice
    * trivia: the artifact's reader shouldn't have to re-derive where
    * the gate's numbers came from). Pure for the spec. */
  private[graft] def chooseBaseline(currTag: String,
      prevTag: Option[String], prevBaseTag: Option[String],
      prevWarm: Map[String, Double], prevBase: Map[String, Double])
      : (Option[String], Map[String, Double]) = {
    val (tag, base) =
      if (currTag.nonEmpty && prevTag.contains(currTag) && prevBase.nonEmpty)
        (prevBaseTag, prevBase)
      else (prevTag, prevWarm)
    (if (tag.isEmpty && base.nonEmpty) Some("untagged") else tag, base)
  }

  /** (cold, warm, median) split of one workload's per-loop QPS:
    * cold = first timed loop (post-warmup, but first at full length),
    * warm = median of the rest, med = median of all (the number Bench
    * reports). At repeat=1 warm falls back to the only loop. */
  private[graft] def split(loops: Seq[Double]): (Double, Double, Double) =
    if (loops.isEmpty) (-1.0, -1.0, -1.0)
    else (loops.head,
      QpsWorkloads.median(if (loops.size > 1) loops.tail else loops),
      QpsWorkloads.median(loops))

  /** Quiet-side merge over repeated passes of one workload: the pass
    * with the BEST warm QPS wins — contention only ever slows a loop,
    * so max is the quiet-side estimator (the QPS mirror of the
    * bench's min-merge for times). Solo r15 measurements motivated
    * it: back-to-back settled-host runs read sharded 595 vs 126 and
    * single 291 vs 395 — single-pass trend baselines would gate
    * future rounds on whichever noise the run drew. */
  private[graft] def quietSide(
      passes: Seq[(Double, Double, Double)]): (Double, Double, Double) =
    if (passes.isEmpty) (-1.0, -1.0, -1.0) else passes.maxBy(_._2)

  def main(args: Array[String]): Unit = {
    val repeat = math.max(1, if (args.nonEmpty) args(0).toInt else 5)
    val passes = math.max(1, Bench.envInt("SPARK_GRAFT_QPS_PASSES", 2))
    val out = sys.env.getOrElse("SPARK_GRAFT_QPS_OUT", "BENCH_QPS.json")
    val roundTag = sys.env.getOrElse("SPARK_GRAFT_ROUND", "")
    val (prevTag, prevBaseTag, prevWarm, prevBase) = prevArtifact(out)
    val (baseTag, prev) =
      chooseBaseline(roundTag, prevTag, prevBaseTag, prevWarm, prevBase)
    def one(name: String, p: Int, mk: => QpsWorkloads.Workload): (Double, Double, Double) = {
      val s = try split(QpsWorkloads.qpsLoops(mk, repeat))
      catch { case _: Throwable => (-1.0, -1.0, -1.0) }
      println(f"${name}_qps pass$p ${s._3}%8.1f (cold ${s._1}%8.1f warm ${s._2}%8.1f)")
      s
    }
    // all in-memory passes run BEFORE the Spark session exists, so
    // they stay uncontaminated; the headline per workload is the
    // quiet-side (best-warm) pass, with every pass's warm recorded
    val inMemNames = Seq("single", "pq", "sharded", "rpc")
    def mkWorkload(name: String): QpsWorkloads.Workload = name match {
      case "single" => QpsWorkloads.singleGraph()
      case "pq" => QpsWorkloads.pqLowMemory()
      case "rpc" => QpsWorkloads.rpcRouter() // sharded fleet behind loopback sockets
      case _ => QpsWorkloads.shardedRouter()
    }
    val inMemPasses: Map[String, Seq[(Double, Double, Double)]] =
      inMemNames.map { n =>
        n -> (1 to passes).map(p => one(n, p, mkWorkload(n)))
      }.toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // defensive like Bench: a fromIndex failure (temp-dir, build error)
    // must still write the artifact and release the session — and
    // caught PER PASS (like the in-memory `one` helper), so a pass-N
    // failure can't discard the quiet-side measurement an earlier
    // pass already produced (r15 advisor)
    val (fiLoads, fiPasses) = try {
      (1 to passes).map { p =>
        try {
          val (load, workload) = QpsWorkloads.fromIndexRouter(spark, repeat)
          println(f"fi_load_sec pass$p ${load.medianSec}%8.1f (cold ${load.coldSec}%8.1f warm ${load.warmSec}%8.1f)")
          val s = split(QpsWorkloads.qpsLoops(workload, repeat))
          println(f"fi_qps      pass$p ${s._3}%8.1f (cold ${s._1}%8.1f warm ${s._2}%8.1f)")
          (load, s)
        } catch { case _: Throwable =>
          (QpsWorkloads.FromIndexLoad(-1.0, -1.0, -1.0), (-1.0, -1.0, -1.0))
        }
      }.unzip
    } finally spark.stop()
    // loads are TIMES: min is the quiet-side estimator there
    val fiLoadCold = fiLoads.map(_.coldSec).filter(_ > 0) match {
      case Nil => -1.0; case xs => xs.min }
    val fiLoadWarm = fiLoads.map(_.warmSec).filter(_ > 0) match {
      case Nil => -1.0; case xs => xs.min }
    val allPasses: Seq[(String, Seq[(Double, Double, Double)])] =
      inMemNames.map(n => n -> inMemPasses(n)) :+ ("fromindex" -> fiPasses)
    val all = allPasses.map { case (k, ps) => k -> quietSide(ps) }
    val gates = all.map { case (k, (_, warm, _)) => k -> driftOk(warm, prev.get(k)) }
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s""""$k":${Bench.r1(v)}""" }.mkString("{", ",", "}")
    def jstr(s: String): String = if (s.isEmpty) "null" else s""""$s""""
    val json =
      s"""{"repeat":$repeat,"passes":$passes,""" +
        // round_tag: who produced this run; baseline_round_tag: whose
        // numbers the drift gate compared against (round-over-round
        // when tagged — a same-round re-run inherits, never rebases)
        s""""round_tag":${jstr(roundTag)},""" +
        s""""baseline_round_tag":${baseTag.map(t => s""""$t"""").getOrElse("null")},""" +
        s""""qps_cold":${jmap(all.map { case (k, (c, _, _)) => k -> c })},""" +
        s""""qps_warm":${jmap(all.map { case (k, (_, w, _)) => k -> w })},""" +
        s""""qps_median":${jmap(all.map { case (k, (_, _, m)) => k -> m })},""" +
        // every pass's warm, so the artifact shows the band the
        // quiet-side number was drawn from
        s""""qps_warm_passes":${allPasses.map { case (k, ps) =>
          s""""$k":${ps.map(x => Bench.r1(x._2)).mkString("[", ",", "]")}"""
        }.mkString("{", ",", "}")},""" +
        s""""fi_load_cold_sec":${Bench.r2(fiLoadCold)},""" +
        s""""fi_load_warm_sec":${Bench.r2(fiLoadWarm)},""" +
        s""""prev_qps_warm":${jmap(prev.toSeq.sortBy(_._1))},""" +
        s""""drift_rule":"quiet-side warm qps >= prev_warm * 0.85",""" +
        s""""drift_ok":${gates.map { case (k, ok) => s""""$k":$ok""" }
          .mkString("{", ",", "}")},""" +
        s""""drift_all_ok":${gates.forall(_._2)}}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    catch { case _: Throwable => () }
    println(json)
  }
}
