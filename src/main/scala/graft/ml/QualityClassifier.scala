package graft.ml

/** Deterministic hashed-bag-of-words logistic regression — the learned
  * quality-filter rung of a training-data pipeline (the fastText-style
  * classifier of DataComp/RefinedWeb recipes; reference context:
  * HoloChatStats scores chat quality with fixed heuristics, web/api.py's
  * humor/engagement scoring — this is the learned generalization the
  * 100 TB pipeline needs).
  *
  * The production shape: train on a BOUNDED labeled sample on the driver
  * (labeled quality sets are thousands of docs, the corpus is TBs), then
  * score the corpus in-row with the broadcast weight vector — scoring is a
  * pure projection that pipelines inside whole-stage codegen over the
  * scan. The feature hash reproduces the engine-wide md5 bucket formula
  * (`conv(substring(md5(term), 1, 15), 16, 10) % buckets`) EXACTLY, so
  * driver-side training and in-row scoring see identical features.
  */
object QualityClassifier {

  /** 60-bit md5-derived bucket — bit-identical to the Spark-side
    * `CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % buckets`.
    *
    * The first 15 hex chars are the first 7.5 digest bytes, assembled
    * directly from the byte array (the former per-term hex formatting +
    * parseLong dominated [[train]]'s feature pass — one MessageDigest
    * construction and ~32 boxed "%02x" formats per TERM over a
    * 2048-doc sample); the digest instance is reused per thread.
    */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def bucket(term: String, buckets: Int): Int = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(term.getBytes("UTF-8"))
    // 15 hex chars = bytes 0..6 in full plus the HIGH nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4)
    (v % buckets).toInt
  }

  /** Same canonicalization as the Spark side — the ONE canonical word
    * split of the learned components ([[BpeTokenizer.words]]).
    */
  def tokens(text: String): Array[String] = BpeTokenizer.words(text)

  /** Full-batch logistic regression over L1-normalized hashed counts,
    * zero-init + Adam — deterministic (no sampling, no shuffling).
    * Returns (weights[buckets], bias). An empty sample yields the neutral
    * model (all-zero weights → every doc scores sigmoid(0) = 0.5).
    */
  def train(samples: Seq[(String, Double)], buckets: Int,
            epochs: Int = 300, lr: Double = 0.5): (Array[Double], Double) = {
    if (samples.isEmpty) return (new Array[Double](buckets), 0d)
    // features as PARALLEL PRIMITIVE arrays, not Array[(Int, Double)]:
    // the epoch loop touches every feature epochs× (tens of millions of
    // accesses over a 2048-doc sample) and boxed tuple traversal
    // dominated the driver's training wall. Same feature order (sorted
    // bucket ids), same sequential fold — every double op happens in the
    // identical order as before, so the trained model is bit-identical
    // (QualityClassifierSpec + the inlined-oracle gate pin it).
    val feats: Array[(Array[Int], Array[Double], Double)] = samples.iterator.map {
      case (text, y) =>
        val tk = tokens(text)
        val m = scala.collection.mutable.HashMap.empty[Int, Double]
        tk.foreach { t => val bk = bucket(t, buckets); m(bk) = m.getOrElse(bk, 0d) + 1d }
        val n = math.max(tk.length, 1).toDouble
        val idx = m.keysIterator.toArray.sorted
        (idx, idx.map(m(_) / n), y)
    }.toArray
    val w = new Param(buckets, 1)
    val b = new Param(1, 1)
    val opt = new Adam(Array(w, b), lr)
    val nf = feats.length
    var e = 0
    while (e < epochs) {
      var s = 0
      while (s < nf) {
        val (idx, xv, y) = feats(s)
        var z = b.v(0)
        var j = 0
        while (j < idx.length) { z += w.v(idx(j)) * xv(j); j += 1 }
        val d = (NeuralNet.sigmoid(z) - y) / nf
        b.g(0) += d
        j = 0
        while (j < idx.length) { w.g(idx(j)) += d * xv(j); j += 1 }
        s += 1
      }
      opt.step() // steps then zeroes gradients
      e += 1
    }
    (w.copyValues(), b.v(0))
  }
}
