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

  /** Whitelist deserialization (no eval — SURVEY §4.3 Q8). */
  def fromName(s: String): Metric = s.toLowerCase match {
    case "euclidean" | "l2" => Euclidean
    case "cosine" | "cosinedist" => Cosine
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }
}
