package graft.ml

/** Small dense-matrix helpers for driver-side model building (OPQ
  * rotation training). Matrices are row-major `Array[Double]` of size
  * d×d with d ≤ a few hundred — plain loops, no BLAS, fully
  * deterministic.
  */
object LinAlg {

  def identity(d: Int): Array[Double] = {
    val m = new Array[Double](d * d)
    var i = 0
    while (i < d) { m(i * d + i) = 1d; i += 1 }
    m
  }

  def matvec(m: Array[Double], d: Int, v: Array[Double]): Array[Double] = {
    val out = new Array[Double](d)
    var r = 0
    while (r < d) {
      var acc = 0d
      var c = 0
      while (c < d) { acc += m(r * d + c) * v(c); c += 1 }
      out(r) = acc
      r += 1
    }
    out
  }

  def transpose(m: Array[Double], d: Int): Array[Double] = {
    val out = new Array[Double](d * d)
    var r = 0
    while (r < d) {
      var c = 0
      while (c < d) { out(c * d + r) = m(r * d + c); c += 1 }
      r += 1
    }
    out
  }

  /** Gauss–Jordan with partial pivoting; None when (numerically) singular. */
  def inverse(m0: Array[Double], d: Int): Option[Array[Double]] = {
    val a = m0.clone()
    val inv = identity(d)
    var col = 0
    while (col < d) {
      var piv = col
      var r = col + 1
      while (r < d) { if (math.abs(a(r * d + col)) > math.abs(a(piv * d + col))) piv = r; r += 1 }
      if (math.abs(a(piv * d + col)) < 1e-12) return None
      if (piv != col) {
        var c = 0
        while (c < d) {
          var t = a(piv * d + c); a(piv * d + c) = a(col * d + c); a(col * d + c) = t
          t = inv(piv * d + c); inv(piv * d + c) = inv(col * d + c); inv(col * d + c) = t
          c += 1
        }
      }
      val p = a(col * d + col)
      var c = 0
      while (c < d) { a(col * d + c) /= p; inv(col * d + c) /= p; c += 1 }
      r = 0
      while (r < d) {
        if (r != col) {
          val f = a(r * d + col)
          if (f != 0d) {
            var c2 = 0
            while (c2 < d) {
              a(r * d + c2) -= f * a(col * d + c2)
              inv(r * d + c2) -= f * inv(col * d + c2)
              c2 += 1
            }
          }
        }
        r += 1
      }
      col += 1
    }
    Some(inv)
  }

  /** Orthogonal polar factor of a (nonsingular) matrix via the Newton
    * iteration X ← (X + X⁻ᵀ)/2 — equals U·Vᵀ of the SVD, i.e. the
    * orthogonal Procrustes solution argmin_R ||R·X − Y||_F for
    * M = Y·Xᵀ. Near-singular M gets a small ridge so the iteration is
    * always defined (the Procrustes objective is flat in null
    * directions, so the ridge choice is immaterial).
    */
  def polar(m0: Array[Double], d: Int): Array[Double] = {
    var x = m0.clone()
    var it = 0
    var done = false
    while (it < 100 && !done) {
      inverse(x, d) match {
        case None =>
          // singular iterate (including a singular m0): ridge the
          // diagonal and keep iterating — never return a half-converged
          // non-orthogonal matrix, the callers rely on |R·v| = |v|
          val scale = math.max(1e-8, x.map(math.abs).max * 1e-8)
          var i = 0
          while (i < d) { x(i * d + i) += scale; i += 1 }
        case Some(inv) =>
          val invT = transpose(inv, d)
          val next = new Array[Double](d * d)
          var delta = 0d
          var i = 0
          while (i < d * d) {
            next(i) = 0.5 * (x(i) + invT(i))
            delta = math.max(delta, math.abs(next(i) - x(i)))
            i += 1
          }
          x = next
          if (delta < 1e-13) done = true
      }
      it += 1
    }
    x
  }

  /** Deterministic random orthogonal matrix: Gram–Schmidt of a seeded
    * Gaussian matrix (used as the non-identity OPQ rotation init).
    */
  def randomOrthogonal(d: Int, rng: Rng): Array[Double] = {
    val rows = Array.fill(d)(Array.fill(d)(rng.gaussian()))
    var i = 0
    while (i < d) {
      var j = 0
      while (j < i) {
        var dot = 0d
        var c = 0
        while (c < d) { dot += rows(i)(c) * rows(j)(c); c += 1 }
        c = 0
        while (c < d) { rows(i)(c) -= dot * rows(j)(c); c += 1 }
        j += 1
      }
      var n2 = 0d
      var c = 0
      while (c < d) { n2 += rows(i)(c) * rows(i)(c); c += 1 }
      val n = math.sqrt(n2)
      c = 0
      while (c < d) { rows(i)(c) /= n; c += 1 }
      i += 1
    }
    val out = new Array[Double](d * d)
    i = 0
    while (i < d) { System.arraycopy(rows(i), 0, out, i * d, d); i += 1 }
    out
  }
}
