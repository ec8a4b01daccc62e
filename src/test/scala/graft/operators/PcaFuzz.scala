package graft.operators

/** Throwaway fuzz driver: hammer jacobiEigen with random symmetric
  * matrices and report the worst residuals per property, to size the
  * PcaProps tolerances from data (run: Test/runMain graft.operators.PcaFuzz [n]). */
object PcaFuzz {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val rng = new java.util.Random(12345L)
    // boundary-heavy like ScalaCheck's chooseNum: specials with
    // high probability, uniform otherwise — degenerate/repeated-
    // eigenvalue structures appear constantly
    val specials = Array(-10.0, -1.0, 0.0, 1.0, 10.0)
    def draw(): Double =
      if (rng.nextInt(3) == 0) specials(rng.nextInt(specials.length))
      else rng.nextDouble() * 20.0 - 10.0
    var worstTrace = 0.0; var worstOrtho = 0.0; var worstAv = 0.0
    var worstAvSeedI = -1
    var i = 0
    while (i < n) {
      val d = 2 + rng.nextInt(5)
      val raw = Array.fill(d, d)(draw())
      val m = Array.tabulate(d, d)((a, b) => (raw(a)(b) + raw(b)(a)) / 2.0)
      val (values, v) = Pca.jacobiEigen(m)
      val trace = (0 until d).map(k => m(k)(k)).sum
      val te = math.abs(values.sum - trace)
      if (te > worstTrace) worstTrace = te
      var c1 = 0
      while (c1 < d) {
        var c2 = 0
        while (c2 < d) {
          val dot = (0 until d).map(r => v(r)(c1) * v(r)(c2)).sum
          val oe = math.abs(dot - (if (c1 == c2) 1.0 else 0.0))
          if (oe > worstOrtho) worstOrtho = oe
          c2 += 1
        }
        var r = 0
        while (r < d) {
          val av = (0 until d).map(k => m(r)(k) * v(k)(c1)).sum
          val ae = math.abs(av - values(c1) * v(r)(c1))
          if (ae > worstAv) { worstAv = ae; worstAvSeedI = i }
          if (ae > 1e-6 && ae >= worstAv) {
            println(s"BAD iter=$i d=$d ae=$ae matrix=" +
              m.map(_.mkString("[", ",", "]")).mkString("[", ",", "]"))
          }
          r += 1
        }
        c1 += 1
      }
      i += 1
    }
    println(s"n=$n worstTrace=$worstTrace worstOrtho=$worstOrtho worstAv=$worstAv (iter $worstAvSeedI)")
  }
}
