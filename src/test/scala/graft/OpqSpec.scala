package graft

import org.apache.spark.sql.functions._

import graft.ml.{LinAlg, Rng}
import graft.operators.Vectors

/** OPQ is spec-gated (Lloyd + Procrustes have no SQL oracle): the spec
  * proves the linear-algebra core (polar orthogonality, Procrustes
  * recovery of a planted rotation), the training-objective dominance
  * over plain PQ, a strict win on data whose variance structure needs a
  * rotation, and that the full operator with exhaustive rerank IS
  * brute-force top-k.
  */
class OpqSpec extends SparkSpec {

  private def maxAbs(a: Array[Double]): Double = a.map(math.abs).max

  private def matmul(a: Array[Double], b: Array[Double], d: Int): Array[Double] = {
    val out = new Array[Double](d * d)
    for (i <- 0 until d; kk <- 0 until d; j <- 0 until d)
      out(i * d + j) += a(i * d + kk) * b(kk * d + j)
    out
  }

  test("polar factor is orthogonal for a random nonsymmetric matrix") {
    val rng = new Rng(5)
    val d = 8
    val m = Array.fill(d * d)(rng.gaussian())
    val r = LinAlg.polar(m, d)
    val rtr = matmul(LinAlg.transpose(r, d), r, d)
    val err = (0 until d * d).map(i => math.abs(rtr(i) - LinAlg.identity(d)(i))).max
    assert(err < 1e-9, s"R'R deviates from I by $err")
  }

  test("Procrustes (polar of Y·X') recovers a planted rotation exactly") {
    val rng = new Rng(9)
    val d = 8
    val r0 = LinAlg.randomOrthogonal(d, rng)
    val xs = Array.fill(40)(Array.fill(d)(rng.gaussian()))
    val ys = xs.map(LinAlg.matvec(r0, d, _))
    val mMat = new Array[Double](d * d)
    for ((x, y) <- xs.zip(ys); i <- 0 until d; j <- 0 until d)
      mMat(i * d + j) += y(i) * x(j)
    val r = LinAlg.polar(mMat, d)
    val diff = (0 until d * d).map(i => math.abs(r(i) - r0(i))).max
    assert(diff < 1e-8, s"recovered rotation off by $diff")
  }

  test("matrix inverse round-trips and rejects singular input") {
    val rng = new Rng(3)
    val d = 6
    val a = Array.fill(d * d)(rng.gaussian())
    val inv = LinAlg.inverse(a, d).get
    val prod = matmul(a, inv, d)
    val err = (0 until d * d).map(i => math.abs(prod(i) - LinAlg.identity(d)(i))).max
    assert(err < 1e-9)
    val singular = new Array[Double](d * d) // all zeros
    assert(LinAlg.inverse(singular, d).isEmpty)
  }

  test("OPQ training objective is never worse than plain PQ, and strictly better on rotated-structure data") {
    val rng = new Rng(17)
    val d = 8; val m = 4; val k = 4
    // variance concentrated in a 2-D subspace that straddles the
    // subspace boundaries after a random rotation — plain PQ pays for
    // the misalignment, a learned rotation undoes it
    val r0 = LinAlg.randomOrthogonal(d, rng)
    val sample = Array.fill(160) {
      val a = rng.nextDouble() * 4 - 2
      val b = rng.nextDouble() * 4 - 2
      val raw = Array.tabulate(d)(i => if (i == 0) a else if (i == 1) b else 0.02 * rng.gaussian())
      LinAlg.matvec(r0, d, raw)
    }
    val pqCb = Vectors.trainPqCodebook(sample, d, m, k, 5)
    val pqMse = Vectors.opqMse(sample, LinAlg.identity(d), pqCb, d, m, k)
    val (rot, cb) = Vectors.trainOpq(sample, d, m, k, 5, 8)
    val opqMse = Vectors.opqMse(sample, rot, cb, d, m, k)
    assert(opqMse <= pqMse * (1 + 1e-9), s"OPQ $opqMse worse than PQ $pqMse")
    assert(opqMse < pqMse * 0.9, s"no real win on rotated data: OPQ $opqMse vs PQ $pqMse")
    // learned rotation is orthogonal
    val rtr = matmul(LinAlg.transpose(rot, d), rot, d)
    val err = (0 until d * d).map(i => math.abs(rtr(i) - LinAlg.identity(d)(i))).max
    assert(err < 1e-8)
  }

  test("annPqOpq with rerank >= corpus reproduces brute-force top-k; deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count().toInt
    val opq = Vectors.annPqOpq(emb, qId = 0L, k = 10, rerank = n + 1)
      .select("vec_id", "cosine").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Vectors.annTopK(emb, qId = 0L, k = 10)
      .select("vec_id", "cosine").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(opq.toSeq === brute.toSeq)
    val again = Vectors.annPqOpq(emb, qId = 0L, k = 10, rerank = n + 1)
      .select("vec_id", "cosine").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === opq.toSeq)
  }

  test("rotate_vec expression: R'(R v) round-trips in-plan") {
    val rng = new Rng(21)
    val r = LinAlg.randomOrthogonal(64, rng)
    val emb = Tables.embeddings(spark, sfDir).limit(5)
    import graft.functions.VectorFunctions.rotateVec
    val rows = emb.select(col("embedding"),
        rotateVec(rotateVec(col("embedding"), 64, r), 64, LinAlg.transpose(r, 64)).as("rt"))
      .collect()
    rows.foreach { row =>
      val orig = row.getSeq[Float](0).map(_.toDouble)
      val rt = row.getSeq[Double](1)
      orig.zip(rt).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }
}
