package graft.index

/** Distance metrics — the reference's user-extensible hook
  * (`Distances.PreMetric` parameter, `/root/reference/src/LMDiskANN.jl:58,62,242`),
  * re-expressed as a sealed ADT with a whitelist `fromName` (replacing the
  * reference's `eval(Meta.parse(...))` load hazard, SURVEY.md §4.3 Q8).
  *
  * All math is done in Double regardless of the stored element width,
  * matching the engine-wide determinism contract.
  */
sealed trait Metric extends Serializable {
  def name: String
  def dist(a: Array[Float], b: Array[Float]): Double
}

object Metric {

  case object Euclidean extends Metric {
    val name = "euclidean"
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble
        s += d * d
        i += 1
      }
      math.sqrt(s)
    }
  }

  case object Cosine extends Metric {
    val name = "cosine"
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 1.0
      else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** USER-DEFINED metric — the reference's extensibility hook (any
    * `Distances.PreMetric`, src/LMDiskANN.jl:58,62,242) re-expressed
    * for the serving tier: `fn` is plain JVM code called by
    * [[graft.index.ServingIndex]]'s driver-side traversal, so a custom
    * metric gets the FULL reference lifecycle (create → insert →
    * search/filtered/range → delete → key mapping) with zero plan
    * changes and zero UDFs.
    *
    * Scope contract: the DISTRIBUTED tiers (bulk graph build, exact
    * kNN scans, IVF/PQ fits) run distances as codegen'd Catalyst
    * expressions and deliberately REFUSE custom metrics
    * ([[distColumn]]) — an opaque Scala closure in those scans would
    * put a black-box UDF in the 100 TB hot path; a user who needs a
    * custom metric at that tier adds a native expression next to
    * SquaredL2 and extends [[distColumn]]'s match.
    *
    * Persistence keeps the Q8 whitelist property: only the NAME is
    * stored in sidecars; loading resolves it against the in-process
    * [[register]] registry (code is never deserialized), so a session
    * must `register` the metric before `fromName`/load — the same
    * contract as the reference needing the PreMetric value at
    * reconstruct time. */
  final case class Custom(name: String,
      fn: (Array[Float], Array[Float]) => Double) extends Metric {
    require(name.nonEmpty && name.toLowerCase != "euclidean" && name.toLowerCase != "l2"
      && name.toLowerCase != "cosine" && name.toLowerCase != "cosinedist",
      s"custom metric name '$name' collides with a built-in")
    // names land verbatim inside JSON sidecars (meta.json, ivf-*.json)
    // and directory suffixes — constrain to a filesystem/JSON-safe
    // charset rather than escaping at every write site
    require(name.matches("[A-Za-z0-9._-]{1,64}"),
      s"custom metric name '$name' must match [A-Za-z0-9._-]{1,64}")
    def dist(a: Array[Float], b: Array[Float]): Double = fn(a, b)
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Custom]()

  /** Make a custom metric resolvable by name (meta.json round-trips,
    * `fromName`). Re-registering a name replaces it. */
  def register(m: Custom): Custom = { registry.put(m.name.toLowerCase, m); m }

  /** Remove a registered custom metric (tests / hot-swap hygiene). */
  def unregister(name: String): Unit = { registry.remove(name.toLowerCase); () }

  /** Whitelist deserialization (no eval — SURVEY §4.3 Q8); custom
    * names resolve only through the explicit in-process registry. */
  def fromName(s: String): Metric = s.toLowerCase match {
    case "euclidean" | "l2" => Euclidean
    case "cosine" | "cosinedist" => Cosine
    case other =>
      val m = registry.get(other)
      if (m != null) m
      else throw new IllegalArgumentException(
        s"unknown metric: $other (custom metrics must be Metric.register'ed " +
          "in this process before an index using them is loaded)")
  }

  /** Throwing default for distributed-tier metric matches: a custom
    * metric in a bulk scan is a contract violation, never a silent
    * geometry fallback. */
  def nativeOnly(m: Metric, where: String): Nothing =
    throw new IllegalArgumentException(
      s"$where requires a native (codegen) metric; custom metric " +
        s"'${m.name}' serves through ServingIndex — see Metric.Custom")

  /** The native (codegen) distance COLUMN for the distributed tiers —
    * single dispatch point, so every bulk scan shares one contract:
    * built-ins run as Catalyst expressions; custom metrics refuse with
    * guidance (they serve through [[graft.index.ServingIndex]]). */
  def distColumn(metric: Metric,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = metric match {
    case Euclidean => graft.functions.VectorFunctions.euclidean(a, b)
    case Cosine => graft.functions.VectorFunctions.cosineDistance(a, b)
    case c: Custom => throw new IllegalArgumentException(
      s"metric '${c.name}' is a driver-side custom metric: it serves through " +
        "ServingIndex (full insert/search/delete lifecycle); the distributed " +
        "bulk tiers require a codegen expression — add one next to SquaredL2 " +
        "and extend Metric.distColumn")
  }
}
