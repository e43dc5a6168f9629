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
    */
  def bucket(term: String, buckets: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % buckets).toInt
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
    val feats: Seq[(Array[(Int, Double)], Double)] = samples.map { case (text, y) =>
      val tk = tokens(text)
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      tk.foreach { t => val b = bucket(t, buckets); m(b) = m.getOrElse(b, 0d) + 1d }
      val n = math.max(tk.length, 1).toDouble
      (m.iterator.map { case (i, c) => (i, c / n) }.toArray.sortBy(_._1), y)
    }
    val w = new Param(buckets, 1)
    val b = new Param(1, 1)
    val opt = new Adam(Array(w, b), lr)
    var e = 0
    while (e < epochs) {
      feats.foreach { case (xs, y) =>
        var z = b.v(0)
        xs.foreach { case (i, x) => z += w.v(i) * x }
        val d = (NeuralNet.sigmoid(z) - y) / feats.length
        b.g(0) += d
        xs.foreach { case (i, x) => w.g(i) += d * x }
      }
      opt.step() // steps then zeroes gradients
      e += 1
    }
    (w.copyValues(), b.v(0))
  }
}
