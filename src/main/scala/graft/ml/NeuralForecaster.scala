package graft.ml

import NeuralNet._

/** Trainable forecaster models mirroring the reference's torch modules
  * (data_ingestion/utils/forecaster.py:35 LSTMForecaster — 2-layer LSTM
  * h=64 with inter-layer dropout, head Linear(64,32)→ReLU→Dropout→
  * Linear(32,1); :66 SimpleForecaster — Linear(in,16)→ReLU→Linear(16,16)
  * →ReLU→Linear(16,1)), re-expressed as deterministic pure-Scala
  * forward/backward so they can train inside a Spark task.
  */
sealed trait SeriesModel {
  def forward(seq: Array[Double], train: Boolean): Double
  def backward(dy: Double): Unit
  def params: Array[Param]
}

final class LstmForecaster(hidden: Int, dropout: Double, rng: Rng) extends SeriesModel {
  private val l1 = new LstmLayer(1, hidden, rng)
  private val l2 = new LstmLayer(hidden, hidden, rng)
  private val w1 = new Param(32, hidden); private val b1 = new Param(32, 1)
  private val w2 = new Param(1, 32); private val b2 = new Param(1, 1)
  initUniform(w1, hidden, rng); initUniform(b1, hidden, rng)
  initUniform(w2, 32, rng); initUniform(b2, 32, rng)
  val params: Array[Param] = l1.params ++ l2.params ++ Array(w1, b1, w2, b2)

  // forward caches for backward + reusable workspaces (grown on demand —
  // a training run allocates them once, not per sample; RNG draw order
  // and every FP operation order are unchanged from the allocating form)
  private var cap = -1
  private var xsIn: Array[Array[Double]] = _      // seq boxed per-timestep for l1
  private var interMasks: Array[Array[Double]] = _
  private var out1Buf: Array[Array[Double]] = _
  private var do1: Array[Array[Double]] = _
  private var dhSeq2: Array[Array[Double]] = _    // zeros except the last slot
  private val zerosH = new Array[Double](hidden)  // read-only shared zero grad
  private var out1: Array[Array[Double]] = _
  private var h2: Array[Double] = _
  private val a1 = new Array[Double](32)
  private val r1 = new Array[Double](32)
  private val d1Buf = new Array[Double](32)
  private var d1: Array[Double] = _
  private val headMask = new Array[Double](32)
  private val yOut = new Array[Double](1)
  private val dyIn = new Array[Double](1)
  private val dd1 = new Array[Double](32)
  private val dr1Buf = new Array[Double](32)
  private val da1 = new Array[Double](32)
  private val dh2 = new Array[Double](hidden)
  private var isTrain = false

  private def ensure(t0: Int): Unit = {
    if (t0 > cap) {
      xsIn = Array.fill(t0)(new Array[Double](1))
      interMasks = Array.fill(t0)(new Array[Double](hidden))
      out1Buf = Array.fill(t0)(new Array[Double](hidden))
      do1 = Array.fill(t0)(new Array[Double](hidden))
      dhSeq2 = new Array[Array[Double]](t0)
      cap = t0
    }
    var t = 0
    while (t < t0) { dhSeq2(t) = zerosH; t += 1 }
    dhSeq2(t0 - 1) = dh2
  }

  def forward(seq: Array[Double], train: Boolean): Double = {
    isTrain = train
    val t0 = seq.length
    ensure(t0)
    var t = 0
    while (t < t0) { xsIn(t)(0) = seq(t); t += 1 }
    val o1 = l1.forward(if (t0 == xsIn.length) xsIn else xsIn.take(t0))
    // torch applies dropout to every layer's output except the last,
    // with a fresh mask per timestep
    if (train) {
      t = 0
      while (t < t0) {
        dropoutMaskInto(interMasks(t), hidden, dropout, rng)
        val h = o1(t); val m = interMasks(t); val o = out1Buf(t)
        var j = 0
        while (j < hidden) { o(j) = h(j) * m(j); j += 1 }
        t += 1
      }
      out1 = if (t0 == out1Buf.length) out1Buf else out1Buf.take(t0)
    } else out1 = o1
    val o2 = l2.forward(out1)
    h2 = o2(t0 - 1)
    linearInto(w1, b1, h2, a1)
    var j = 0
    while (j < 32) { r1(j) = math.max(0d, a1(j)); j += 1 }
    if (train) {
      dropoutMaskInto(headMask, 32, dropout, rng)
      j = 0
      while (j < 32) { d1Buf(j) = r1(j) * headMask(j); j += 1 }
      d1 = d1Buf
    } else d1 = r1
    linearInto(w2, b2, d1, yOut)
    yOut(0)
  }

  def backward(dy: Double): Unit = {
    dyIn(0) = dy
    linearBackInto(w2, b2, d1, dyIn, dd1)
    val dr1 = if (isTrain) {
      var j = 0
      while (j < 32) { dr1Buf(j) = dd1(j) * headMask(j); j += 1 }
      dr1Buf
    } else dd1
    var j = 0
    while (j < 32) { da1(j) = if (a1(j) > 0) dr1(j) else 0d; j += 1 }
    linearBackInto(w1, b1, h2, da1, dh2)
    val t0 = out1.length
    // dhSeq2 slots: shared zeros + dh2 in the last — set up by ensure()
    val dx2 = l2.backward(if (t0 == dhSeq2.length) dhSeq2 else dhSeq2.take(t0))
    val dIn1 = if (isTrain) {
      var t = 0
      while (t < t0) {
        val d = do1(t); val x = dx2(t); val m = interMasks(t)
        var k = 0
        while (k < hidden) { d(k) = x(k) * m(k); k += 1 }
        t += 1
      }
      if (t0 == do1.length) do1 else do1.take(t0)
    } else dx2
    l1.backward(dIn1)
    ()
  }
}

final class SimpleForecasterNet(inSize: Int, hidden: Int, rng: Rng) extends SeriesModel {
  private val w1 = new Param(hidden, inSize); private val b1 = new Param(hidden, 1)
  private val w2 = new Param(16, hidden); private val b2 = new Param(16, 1)
  private val w3 = new Param(1, 16); private val b3 = new Param(1, 1)
  initUniform(w1, inSize, rng); initUniform(b1, inSize, rng)
  initUniform(w2, hidden, rng); initUniform(b2, hidden, rng)
  initUniform(w3, 16, rng); initUniform(b3, 16, rng)
  val params: Array[Param] = Array(w1, b1, w2, b2, w3, b3)

  // reusable workspaces — one allocation per model, not per sample; the
  // input is COPIED into x0 so a caller-reused window buffer stays safe
  // between forward and backward
  private val x0 = new Array[Double](inSize)
  private val a1 = new Array[Double](hidden)
  private val r1 = new Array[Double](hidden)
  private val a2 = new Array[Double](16)
  private val r2 = new Array[Double](16)
  private val yOut = new Array[Double](1)
  private val dyIn = new Array[Double](1)
  private val dr2 = new Array[Double](16)
  private val da2 = new Array[Double](16)
  private val dr1 = new Array[Double](hidden)
  private val da1 = new Array[Double](hidden)
  private val dx0 = new Array[Double](inSize)

  def forward(seq: Array[Double], train: Boolean): Double = {
    System.arraycopy(seq, 0, x0, 0, inSize)
    linearInto(w1, b1, x0, a1)
    var j = 0
    while (j < hidden) { r1(j) = math.max(0d, a1(j)); j += 1 }
    linearInto(w2, b2, r1, a2)
    j = 0
    while (j < 16) { r2(j) = math.max(0d, a2(j)); j += 1 }
    linearInto(w3, b3, r2, yOut)
    yOut(0)
  }

  def backward(dy: Double): Unit = {
    dyIn(0) = dy
    linearBackInto(w3, b3, r2, dyIn, dr2)
    var j = 0
    while (j < 16) { da2(j) = if (a2(j) > 0) dr2(j) else 0d; j += 1 }
    linearBackInto(w2, b2, r1, da2, dr1)
    j = 0
    while (j < hidden) { da1(j) = if (a1(j) > 0) dr1(j) else 0d; j += 1 }
    linearBackInto(w1, b1, x0, da1, dx0)
    ()
  }
}

/** The adaptive per-channel pipeline (forecaster.py:84
  * StreamingHoursForecaster): gap-fill + MinMax-scale the monthly series,
  * pick the model by months of history (≥12 LSTM, ≥4 simple MLP, ≥1
  * statistical), train, then forecast 3 months recursively with
  * MC-dropout percentile bands. All arithmetic is seeded/deterministic —
  * same channel, same series ⇒ bit-identical forecasts on every run.
  */
object NeuralForecaster {

  final case class Scaler(lo: Double, hi: Double) {
    private val range = if (hi > lo) hi - lo else 1d
    def fwd(x: Double): Double = 0.1 + (x - lo) / range * 0.8
    def inv(y: Double): Double = (y - 0.1) / 0.8 * range + lo
  }

  final case class ForecastRow(
    channel: String, forecast_month: java.sql.Date, horizon: Int,
    forecasted_hours: Double, lower: Double, p25: Double, p75: Double,
    upper: Double, model_type: String)

  private def fl4(x: Double): Double = math.floor(x * 1e4) / 1e4

  /** np.percentile (linear interpolation) over an unsorted sample. */
  private[graft] def percentile(xs: Array[Double], p: Double): Double = {
    val s = xs.sorted
    val pos = (s.length - 1) * p / 100.0
    val lo = pos.toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (s(hi) - s(lo)) * (pos - lo)
  }

  /** Reindex the sparse (monthIndex → hours) series over its own
    * [min, max] month range, linearly interpolating interior gaps
    * (forecaster.py:166-177; the endpoints always exist so there is
    * nothing to extrapolate).
    */
  private[graft] def gapFill(points: Seq[(Int, Double)]): (Array[Double], Int) = {
    val sorted = points.sortBy(_._1)
    val first = sorted.head._1; val last = sorted.last._1
    val known = sorted.toMap
    val out = new Array[Double](last - first + 1)
    var prevIdx = first
    var m = first
    while (m <= last) {
      known.get(m) match {
        case Some(v) =>
          out(m - first) = v
          if (m - prevIdx > 1) {
            val a = out(prevIdx - first); val span = (m - prevIdx).toDouble
            var g = prevIdx + 1
            while (g < m) { out(g - first) = a + (v - a) * (g - prevIdx) / span; g += 1 }
          }
          prevIdx = m
        case None => () // filled when the next known point arrives
      }
      m += 1
    }
    (out, last)
  }

  /** forecaster.py:201 train_lstm_model: Adam 1e-3, MSE, batch ≤16,
    * ≤100 epochs, grad-clip 1.0, sequential 80/20 split, early stop
    * patience 10 on val loss, best-state restore.
    */
  private[graft] def trainLstm(data: Array[Double], rng: Rng,
                            hidden: Int = 64, epochs: Int = 100): SeriesModel = {
    val seqLen = 6
    val model = new LstmForecaster(hidden, 0.2, rng)
    val n = data.length - seqLen
    val trainSize = math.max(1, (0.8 * n).toInt)
    fit(model, data, seqLen, trainSize, batch = math.min(16, trainSize),
      lr = 1e-3, epochs = epochs, patience = 10, rng = rng)
  }

  /** forecaster.py:275 train_simple_model: Adam 1e-2, batch ≤8, 50
    * epochs, best state by train loss (no validation split).
    */
  private[graft] def trainSimple(data: Array[Double], rng: Rng): SeriesModel = {
    val seqLen = 3
    val model = new SimpleForecasterNet(seqLen, 16, rng)
    val n = data.length - seqLen
    fit(model, data, seqLen, trainSize = n, batch = math.min(8, n),
      lr = 1e-2, epochs = 50, patience = Int.MaxValue, rng = rng)
  }

  private def fit(model: SeriesModel, data: Array[Double], seqLen: Int,
                  trainSize: Int, batch: Int, lr: Double, epochs: Int,
                  patience: Int, rng: Rng): SeriesModel = {
    val n = data.length - seqLen
    val valIdx = (trainSize until n).toArray
    val adam = new Adam(model.params, lr)
    val order = (0 until trainSize).toArray
    // one window buffer for the whole fit — the models copy their input,
    // so reuse across samples is safe; replaces a data.slice per sample
    val win = new Array[Double](seqLen)
    var best = Double.MaxValue
    var bestState: Array[Array[Double]] = null
    var bad = 0
    var epoch = 0
    var stop = false
    while (epoch < epochs && !stop) {
      rng.shuffle(order)
      var trainLoss = 0d; var nb = 0
      order.grouped(batch).foreach { b =>
        var loss = 0d
        b.foreach { i =>
          System.arraycopy(data, i, win, 0, seqLen)
          val p = model.forward(win, train = true)
          val e = p - data(i + seqLen)
          loss += e * e
          model.backward(2 * e / b.length)
        }
        adam.step()
        trainLoss += loss / b.length; nb += 1
      }
      val score =
        if (valIdx.isEmpty) trainLoss / nb
        else {
          val vb = math.min(16, valIdx.length)
          val batches = valIdx.grouped(vb).toArray
          batches.map { b =>
            b.map { i =>
              System.arraycopy(data, i, win, 0, seqLen)
              val e = model.forward(win, train = false) - data(i + seqLen)
              e * e
            }.sum / b.length
          }.sum / batches.length
        }
      if (score < best) {
        best = score; bad = 0
        bestState = model.params.map(_.copyValues())
      } else {
        bad += 1
        if (bad >= patience) stop = true
      }
      epoch += 1
    }
    if (bestState != null)
      model.params.zip(bestState).foreach { case (p, s) => p.restore(s) }
    model
  }

  /** forecaster.py:353 generate_forecasts: per horizon month, 100
    * MC-dropout forward passes (train mode), clipped to the scaled [0,1];
    * the sim mean is the forecast and feeds the next month's window;
    * bands are the 5/25/75/95 percentiles of the inverse-scaled sims.
    */
  private def mcForecast(model: SeriesModel, lastSeq: Array[Double], scaler: Scaler,
                         months: Int, sims: Int): Seq[(Double, Double, Double, Double, Double)] = {
    var seq = lastSeq
    (1 to months).map { _ =>
      val draws = Array.fill(sims)(math.max(0d, math.min(1d, model.forward(seq, train = true))))
      val mean = draws.sum / sims
      seq = seq.drop(1) :+ mean
      val inv = draws.map(scaler.inv)
      (math.max(0d, scaler.inv(mean)),
        math.max(0d, percentile(inv, 5)), math.max(0d, percentile(inv, 25)),
        math.max(0d, percentile(inv, 75)), math.max(0d, percentile(inv, 95)))
    }
  }

  /** forecaster.py:318 statistical_forecast on the SCALED series:
    * exp-weighted mean + linear trend, clipped to [0.05, 0.95] scaled;
    * σ in original units via the inverse transform of the scaled σ.
    */
  private def statisticalForecast(data: Array[Double], scaler: Scaler,
                                  months: Int): Seq[(Double, Double, Double, Double, Double)] = {
    val n = data.length
    val mean =
      if (n >= 3) {
        val w = Array.tabulate(n)(i => math.exp(-1d + i.toDouble / (n - 1)))
        val ws = w.sum
        data.zip(w).map { case (x, wi) => x * wi }.sum / ws
      } else data.sum / n
    val std =
      if (n > 1) {
        val mu = data.sum / n
        math.sqrt(data.map(x => (x - mu) * (x - mu)).sum / n)
      } else 0.1
    val trend = if (n >= 2) (data(n - 1) - data(0)) / n else 0d
    val stdOrig = scaler.inv(std) - scaler.inv(0d)
    (1 to months).map { h =>
      val fScaled = math.max(0.05, math.min(0.95, mean + trend * h))
      val f = scaler.inv(fScaled)
      val widen = stdOrig * (1 + 0.2 * (h - 1))
      (math.max(0d, f),
        math.max(0d, f - 1.645 * widen), math.max(0d, f - 0.674 * widen),
        f + 0.674 * widen, f + 1.645 * widen)
    }
  }

  /** Full per-channel pipeline. `points` are (monthIndex = year*12 + month0,
    * hours); bounded (months of history), so this runs inside one task.
    */
  def forecastChannel(channel: String, points: Seq[(Int, Double)],
                      horizons: Int = 3, sims: Int = 100,
                      hidden: Int = 64, epochs: Int = 100): Seq[ForecastRow] = {
    if (points.isEmpty) return Seq.empty
    val (filled0, lastMonth) = gapFill(points)
    val seed = (scala.util.hashing.MurmurHash3.stringHash(channel).toLong << 32) ^ 0x5d1a2b3c4d5e6f7L
    val rng = new Rng(seed)
    // all-equal series: deterministic jitter so the scaler has a range
    // (forecaster.py:184 adds N(0, 0.01) when std == 0)
    val filled =
      if (filled0.forall(_ == filled0(0))) filled0.map(_ + rng.gaussian() * 0.01)
      else filled0
    val scaler = Scaler(filled.min, filled.max)
    val scaled = filled.map(scaler.fwd)
    val n = scaled.length
    val (modelType, bands) =
      if (n >= 12) {
        val model = trainLstm(scaled, rng, hidden, epochs)
        ("lstm", mcForecast(model, scaled.takeRight(6), scaler, horizons, sims))
      } else if (n >= 4) {
        val model = trainSimple(scaled, rng)
        ("simple", mcForecast(model, scaled.takeRight(3), scaler, horizons, sims))
      } else {
        ("statistical", statisticalForecast(scaled, scaler, horizons))
      }
    bands.zipWithIndex.map { case ((f, lo, p25, p75, hi), i) =>
      val m = lastMonth + i + 1
      ForecastRow(channel,
        java.sql.Date.valueOf(java.time.LocalDate.of(m / 12, m % 12 + 1, 1)),
        i + 1, fl4(f), fl4(lo), fl4(p25), fl4(p75), fl4(hi), modelType)
    }
  }
}
