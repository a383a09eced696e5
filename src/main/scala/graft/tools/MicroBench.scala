package graft.tools

/** Throwaway microbenchmark for the pair-prune kernel loop — measures
  * ns/pair of CorrUtil.projDistExceeds on synthetic near-isotropic
  * unit-vector projections shaped like the q25 sighting workload. */
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
    val as = Array.fill(n)(mk())
    val bs = Array.fill(n)(mk())
    val bound = 1.2001

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

    def fullDist(a: Array[Float], b: Array[Float]): Boolean = {
      val m = math.min(a.length, b.length)
      var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
      var k = 0
      while (k + 4 <= m) {
        val d0 = a(k).toDouble - b(k).toDouble
        val d1 = a(k + 1).toDouble - b(k + 1).toDouble
        val d2 = a(k + 2).toDouble - b(k + 2).toDouble
        val d3 = a(k + 3).toDouble - b(k + 3).toDouble
        a0 += d0 * d0; a1 += d1 * d1; a2 += d2 * d2; a3 += d3 * d3
        k += 4
      }
      var acc = a0 + a1 + a2 + a3
      while (k < m) { val d = a(k).toDouble - b(k).toDouble; acc += d * d; k += 1 }
      acc > bound
    }

    def floatFull(a: Array[Float], b: Array[Float]): Boolean = {
      val m = math.min(a.length, b.length)
      var a0 = 0f; var a1 = 0f; var a2 = 0f; var a3 = 0f
      var k = 0
      while (k + 4 <= m) {
        val d0 = a(k) - b(k)
        val d1 = a(k + 1) - b(k + 1)
        val d2 = a(k + 2) - b(k + 2)
        val d3 = a(k + 3) - b(k + 3)
        a0 += d0 * d0; a1 += d1 * d1; a2 += d2 * d2; a3 += d3 * d3
        k += 4
      }
      var acc = a0 + a1 + a2 + a3
      while (k < m) { val d = a(k) - b(k); acc += d * d; k += 1 }
      acc > bound
    }

    val variants: Seq[(String, (Array[Float], Array[Float]) => Boolean)] = Seq(
      "shared16x4" -> ((a, b) => graft.functions.CorrUtil.projDistExceeds(a, b, bound)),
      "scalarEE" -> (scalarExceeds _),
      "full4acc" -> (fullDist _),
      "floatFull" -> (floatFull _))
    for ((name, f) <- variants; rep <- 0 until 3) {
      val t0 = System.nanoTime()
      var kept = 0L
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (!f(as(i), bs(j))) kept += 1
          j += 1
        }
        i += 1
      }
      val dt = System.nanoTime() - t0
      println(f"$name%10s rep=$rep kept=$kept ns/pair=${dt.toDouble / (n.toLong * n)}%.2f")
    }
  }
}
