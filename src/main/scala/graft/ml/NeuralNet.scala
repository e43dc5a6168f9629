package graft.ml

/** Deterministic micro neural-net runtime for the per-channel forecaster
  * (reference: data_ingestion/utils/forecaster.py:35 `LSTMForecaster`,
  * :66 `SimpleForecaster`, torch training loops at :201-316).
  *
  * Everything here is pure, driver-free Scala so a model can be trained
  * INSIDE a Spark task (the per-channel series is bounded — months of
  * history — so training is per-group local work, exactly like the
  * reference's per-channel torch fit, but distributed across channels by
  * `flatMapGroups` instead of looped on one process). No BLAS, no native
  * deps: hidden sizes are ≤64 and sequences ≤6, so plain double loops are
  * microseconds per step.
  *
  * Determinism is load-bearing: seeded SplitMix64 for init, per-epoch
  * shuffles, dropout masks and MC-dropout simulation — two runs of the
  * same channel produce bit-identical forecasts, which is what makes a
  * spec (and an incremental re-run diff) possible at all.
  */
final class Rng(seed: Long) {
  private var s = seed
  def nextLong(): Long = {
    s += 0x9e3779b97f4a7c15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** uniform [0, 1) */
  def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53))
  def uniform(lo: Double, hi: Double): Double = lo + (hi - lo) * nextDouble()
  /** Box–Muller, no spare caching (stateless pairing keeps replay simple) */
  def gaussian(): Double = {
    val u1 = math.max(nextDouble(), 1e-12)
    val u2 = nextDouble()
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }
  /** in-place Fisher–Yates */
  def shuffle(a: Array[Int]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = ((nextLong() >>> 1) % (i + 1)).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }
}

/** A weight matrix/vector with its gradient and Adam state. */
final class Param(val rows: Int, val cols: Int) {
  val v = new Array[Double](rows * cols)
  val g = new Array[Double](rows * cols)
  val m = new Array[Double](rows * cols)
  val u = new Array[Double](rows * cols)
  def size: Int = v.length
  def copyValues(): Array[Double] = v.clone()
  def restore(saved: Array[Double]): Unit = System.arraycopy(saved, 0, v, 0, v.length)
}

/** Adam (β1 .9, β2 .999, ε 1e-8) with torch-style global-norm gradient
  * clipping before each step; zeroes gradients after stepping.
  */
final class Adam(params: Array[Param], lr: Double, clipNorm: Double = 1.0) {
  private var t = 0
  def step(): Unit = {
    var norm2 = 0d
    params.foreach { p =>
      var i = 0
      while (i < p.size) { norm2 += p.g(i) * p.g(i); i += 1 }
    }
    val scale = {
      val n = math.sqrt(norm2)
      if (clipNorm > 0 && n > clipNorm) clipNorm / (n + 1e-6) else 1d
    }
    t += 1
    val bc1 = 1 - math.pow(0.9, t)
    val bc2 = 1 - math.pow(0.999, t)
    params.foreach { p =>
      var i = 0
      while (i < p.size) {
        val g = p.g(i) * scale
        p.m(i) = 0.9 * p.m(i) + 0.1 * g
        p.u(i) = 0.999 * p.u(i) + 0.001 * g * g
        p.v(i) -= lr * (p.m(i) / bc1) / (math.sqrt(p.u(i) / bc2) + 1e-8)
        p.g(i) = 0d
        i += 1
      }
    }
  }
}

object NeuralNet {
  /** y = W x + b; returns output (W: out×in). */
  def linear(w: Param, b: Param, x: Array[Double]): Array[Double] = {
    val out = new Array[Double](w.rows)
    var r = 0
    while (r < w.rows) {
      var acc = b.v(r)
      var c = 0
      while (c < w.cols) { acc += w.v(r * w.cols + c) * x(c); c += 1 }
      out(r) = acc
      r += 1
    }
    out
  }

  /** Backward of [[linear]]: accumulates dW/db, returns dx. */
  def linearBack(w: Param, b: Param, x: Array[Double], dy: Array[Double]): Array[Double] = {
    val dx = new Array[Double](w.cols)
    var r = 0
    while (r < w.rows) {
      val d = dy(r)
      b.g(r) += d
      var c = 0
      while (c < w.cols) {
        w.g(r * w.cols + c) += d * x(c)
        dx(c) += w.v(r * w.cols + c) * d
        c += 1
      }
      r += 1
    }
    dx
  }

  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** torch nn.Linear/nn.LSTM default init: U(-1/√fanIn, 1/√fanIn). */
  def initUniform(p: Param, fanIn: Int, rng: Rng): Unit = {
    val k = 1.0 / math.sqrt(fanIn.toDouble)
    var i = 0
    while (i < p.size) { p.v(i) = rng.uniform(-k, k); i += 1 }
  }

  /** Inverted dropout mask (scale 1/(1-p) kept in the mask). */
  def dropoutMask(n: Int, p: Double, rng: Rng): Array[Double] = {
    val m = new Array[Double](n)
    val keep = 1.0 / (1.0 - p)
    var i = 0
    while (i < n) { m(i) = if (rng.nextDouble() < p) 0d else keep; i += 1 }
    m
  }
}

/** One LSTM layer (gate order i,f,g,o like torch), scalar-input capable.
  * Caches the forward pass for truncated-by-construction BPTT (sequences
  * are the reference's fixed window of 6).
  */
final class LstmLayer(val inSize: Int, val hidden: Int, rng: Rng) {
  import NeuralNet._
  val wih = new Param(4 * hidden, inSize)
  val whh = new Param(4 * hidden, hidden)
  val bih = new Param(4 * hidden, 1)
  val bhh = new Param(4 * hidden, 1)
  Seq(wih, whh, bih, bhh).foreach(initUniform(_, hidden, rng))
  def params: Array[Param] = Array(wih, whh, bih, bhh)

  // forward caches (one slot per timestep)
  private var xs: Array[Array[Double]] = _
  private var hs: Array[Array[Double]] = _ // h_0 .. h_T (index t+1 = output at t)
  private var cs: Array[Array[Double]] = _
  private var gi, gf, gg, go: Array[Array[Double]] = _

  /** Runs the whole sequence; returns outputs h_1..h_T. */
  def forward(seq: Array[Array[Double]]): Array[Array[Double]] = {
    val t0 = seq.length
    xs = seq
    hs = Array.fill(t0 + 1)(new Array[Double](hidden))
    cs = Array.fill(t0 + 1)(new Array[Double](hidden))
    gi = new Array[Array[Double]](t0); gf = new Array[Array[Double]](t0)
    gg = new Array[Array[Double]](t0); go = new Array[Array[Double]](t0)
    var t = 0
    while (t < t0) {
      val zx = linear(wih, bih, seq(t))
      val zh = linear(whh, bhh, hs(t))
      val i0 = new Array[Double](hidden); val f0 = new Array[Double](hidden)
      val g0 = new Array[Double](hidden); val o0 = new Array[Double](hidden)
      var j = 0
      while (j < hidden) {
        i0(j) = sigmoid(zx(j) + zh(j))
        f0(j) = sigmoid(zx(hidden + j) + zh(hidden + j))
        g0(j) = math.tanh(zx(2 * hidden + j) + zh(2 * hidden + j))
        o0(j) = sigmoid(zx(3 * hidden + j) + zh(3 * hidden + j))
        cs(t + 1)(j) = f0(j) * cs(t)(j) + i0(j) * g0(j)
        hs(t + 1)(j) = o0(j) * math.tanh(cs(t + 1)(j))
        j += 1
      }
      gi(t) = i0; gf(t) = f0; gg(t) = g0; go(t) = o0
      t += 1
    }
    Array.tabulate(t0)(t => hs(t + 1))
  }

  /** BPTT given per-timestep output grads; returns per-timestep dx. */
  def backward(dhSeq: Array[Array[Double]]): Array[Array[Double]] = {
    val t0 = xs.length
    val dxSeq = new Array[Array[Double]](t0)
    var dhNext = new Array[Double](hidden)
    var dcNext = new Array[Double](hidden)
    var t = t0 - 1
    while (t >= 0) {
      val dz = new Array[Double](4 * hidden)
      val dcPrev = new Array[Double](hidden)
      var j = 0
      while (j < hidden) {
        val dh = dhSeq(t)(j) + dhNext(j)
        val tc = math.tanh(cs(t + 1)(j))
        val dOut = dh * tc
        var dc = dcNext(j) + dh * go(t)(j) * (1 - tc * tc)
        val dIn = dc * gg(t)(j)
        val dG = dc * gi(t)(j)
        val dF = dc * cs(t)(j)
        dcPrev(j) = dc * gf(t)(j)
        dz(j) = dIn * gi(t)(j) * (1 - gi(t)(j))
        dz(hidden + j) = dF * gf(t)(j) * (1 - gf(t)(j))
        dz(2 * hidden + j) = dG * (1 - gg(t)(j) * gg(t)(j))
        dz(3 * hidden + j) = dOut * go(t)(j) * (1 - go(t)(j))
        j += 1
      }
      dxSeq(t) = linearBack(wih, bih, xs(t), dz)
      dhNext = linearBack(whh, bhh, hs(t), dz)
      dcNext = dcPrev
      t -= 1
    }
    dxSeq
  }
}
