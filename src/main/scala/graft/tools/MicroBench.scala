package graft.tools

/** Throwaway microbenchmark for the pair-prune kernel loop — measures
  * ns/pair of the shipped quantized CorrUtil.projDistExceedsQ against inline
  * float32 reference variants, on two synthetic workloads shaped like
  * the sighting corpora:
  *   - "random": near-isotropic unit-vector projections (q25's
  *     cross-block mass — pairs at cos ≈ 0 exit early);
  *   - "near": per-pair small perturbations (q35's mid/high-correlation
  *     mass — pairs that never exit and pay the FULL scan, which is
  *     what dominates the 30× sighting's 343M enumerations). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dim = 60
    val n = 2000
    val rnd = new java.util.Random(7)
    def mk(): Array[Float] = {
      val a = Array.fill(dim)(rnd.nextGaussian())
      val nr = math.sqrt(a.map(x => x * x).sum)
      // eigen-ordered variance decay approximation: mild concentration
      a.zipWithIndex.map { case (x, i) =>
        (x / nr * math.sqrt(2.0 * (1.0 - 0.3 * i / dim))).toFloat }
    }
    val scale = graft.functions.CorrUtil.QuantScale.toDouble
    def quant(x: Array[Float]): Array[Short] = x.map { v =>
      val c = math.max(-1.0, math.min(1.0, v.toDouble))
      math.round(c * scale).toShort
    }
    val as = Array.fill(n)(mk())
    val bs = Array.fill(n)(mk())
    // near-pair workload: b is a tiny perturbation of a (never exits)
    val bsNear = as.map(_.map(v => v + (rnd.nextFloat() - 0.5f) * 0.02f))
    val asQ = as.map(quant)
    val bsQ = bs.map(quant)
    val bsNearQ = bsNear.map(quant)
    val bound = 1.2001
    val t2 = graft.functions.CorrUtil.quantThreshold(bound, dim)

    def scalarExceeds(a: Array[Float], b: Array[Float]): Boolean = {
      val m = math.min(a.length, b.length)
      var acc = 0.0
      var k = 0
      while (k < m) {
        val d = a(k).toDouble - b(k).toDouble
        acc += d * d
        if (acc > bound) return true
        k += 1
      }
      acc > bound
    }

    def floatStrip(a: Array[Float], b: Array[Float]): Boolean = {
      val m = math.min(a.length, b.length)
      var acc = 0.0f
      var k = 0
      while (k + 16 <= m) {
        var a0 = 0.0f; var a1 = 0.0f; var a2 = 0.0f; var a3 = 0.0f
        var j = k
        while (j < k + 16) {
          val d0 = a(j) - b(j)
          val d1 = a(j + 1) - b(j + 1)
          val d2 = a(j + 2) - b(j + 2)
          val d3 = a(j + 3) - b(j + 3)
          a0 += d0 * d0; a1 += d1 * d1; a2 += d2 * d2; a3 += d3 * d3
          j += 4
        }
        acc += a0 + a1 + a2 + a3
        if (acc.toDouble > bound) return true
        k += 16
      }
      while (k < m) {
        val d = a(k) - b(k)
        acc += d * d
        if (acc.toDouble > bound) return true
        k += 1
      }
      acc.toDouble > bound
    }

    def benchF(name: String, xs: Array[Array[Float]], ys: Array[Array[Float]],
               f: (Array[Float], Array[Float]) => Boolean): Unit =
      for (rep <- 0 until 3) {
        val t0 = System.nanoTime()
        var kept = 0L
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { if (!f(xs(i), ys(j))) kept += 1; j += 1 }
          i += 1
        }
        val dt = System.nanoTime() - t0
        println(f"$name%14s rep=$rep kept=$kept ns/pair=${dt.toDouble / (n.toLong * n)}%.2f")
      }
    def benchQ(name: String, xs: Array[Array[Short]], ys: Array[Array[Short]]): Unit =
      for (rep <- 0 until 3) {
        val t0 = System.nanoTime()
        var kept = 0L
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) {
            if (!graft.functions.CorrUtil.projDistExceedsQ(xs(i), ys(j), t2))
              kept += 1
            j += 1
          }
          i += 1
        }
        val dt = System.nanoTime() - t0
        println(f"$name%14s rep=$rep kept=$kept ns/pair=${dt.toDouble / (n.toLong * n)}%.2f")
      }

    benchQ("quant/random", asQ, bsQ)
    benchF("float/random", as, bs, floatStrip)
    benchF("scalar/random", as, bs, scalarExceeds)
    benchQ("quant/near", asQ, bsNearQ)
    benchF("float/near", as, bsNear, floatStrip)
    benchF("scalar/near", as, bsNear, scalarExceeds)
  }
}
