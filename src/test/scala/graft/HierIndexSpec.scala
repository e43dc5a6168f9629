package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{CentroidIndex, ProbeKernel, VectorFunctions}

/** The exactness contract of the two-level pruning index
  * ([[graft.functions.CentroidIndex]]): for EVERY input, the pruned scan
  * must return a value bit-identical to the flat scan — the index is an
  * acceleration, never an approximation, which is what keeps the
  * geometry operators' zero-stash unrolled-Lloyd oracles valid at sized
  * cell counts. Random corpora exercise the generic path; discrete-grid
  * corpora force EXACT floating-point ties (duplicate centroids,
  * equidistant vectors) so the lowest-index/label tie-breaks are pinned
  * across the out-of-order pruned arrival; the end-to-end test pins the
  * whole knnJoinGeo composition at an index-active cell count against a
  * flat-forced twin.
  */
class HierIndexSpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] = {
    val seed0 = Seed(0x41E57EE1L)
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, seed0.reseed(i.toLong)))
  }

  /** Flat-kernel model via the expressions' own backward-compat entry
    * points (no index), driver-side.
    */
  private def flatNearest(v: Array[Double], dim: Int, k: Int, cent: Array[Double]): (Int, Double) = {
    val cn = ProbeKernel.selfDots(cent, dim, k)
    val r = graft.functions.NearestCentroid
      .compute(UnsafeArrayData.fromPrimitiveArray(v), false, dim, k, cent, cn)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    (r.getInt(0), r.getDouble(1))
  }

  private def flatProbes(v: Array[Double], dim: Int, labels: Array[Int],
                         cent: Array[Double], nProbe: Int): Seq[Int] = {
    val cn = ProbeKernel.selfDots(cent, dim, labels.length)
    ProbeKernel.topProbes(UnsafeArrayData.fromPrimitiveArray(v), false, dim,
      labels.length, labels, cent, cn, nProbe).toIntArray().toSeq
  }

  private def runNearest(vecs: Seq[Array[Double]], dim: Int, cent: Array[Double]): Unit = {
    val k = cent.length / dim
    val ix = CentroidIndex.buildOrNull(cent, dim, k)
    assert(ix != null, s"index must build at k=$k")
    assert(ix.memberIdx.sorted.toSeq == (0 until k), "every centroid in exactly one super")
    // interpreted kernel path, hier vs flat
    val cn = ProbeKernel.selfDots(cent, dim, k)
    vecs.foreach { v =>
      val r = graft.functions.NearestCentroid
        .compute(UnsafeArrayData.fromPrimitiveArray(v), false, dim, k, cent, cn, ix)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val (ej, ed) = flatNearest(v, dim, k, cent)
      assert(r.getInt(0) == ej && r.getDouble(1) == ed,
        s"hier (${r.getInt(0)}, ${r.getDouble(1)}) != flat ($ej, $ed) for v=${v.toSeq}")
    }
    // whole-stage codegen path through the DataFrame
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(v => Row(v.toSeq)), 4), schema)
    val got = df.select(VectorFunctions.nearestCentroid(col("v"), dim, cent).as("nc"))
      .select(col("nc.cluster"), col("nc.dist")).collect()
    got.zip(vecs).foreach { case (r, v) =>
      val (ej, ed) = flatNearest(v, dim, k, cent)
      assert(r.getInt(0) == ej && r.getDouble(1) == ed, s"codegen mismatch for v=${v.toSeq}")
    }
  }

  private def runProbes(vecs: Seq[Array[Double]], dim: Int, cent: Array[Double],
                        nProbe: Int): Unit = {
    val k = cent.length / dim
    val labels = Array.tabulate(k)(j => j * 3 + 1) // non-identity label map
    val ix = CentroidIndex.buildOrNull(cent, dim, k)
    assert(ix != null, s"index must build at k=$k")
    val cn = ProbeKernel.selfDots(cent, dim, k)
    vecs.foreach { v =>
      val hier = ProbeKernel.topProbes(UnsafeArrayData.fromPrimitiveArray(v), false,
        dim, k, labels, cent, cn, nProbe, ix).toIntArray().toSeq
      val flat = flatProbes(v, dim, labels, cent, nProbe)
      assert(hier == flat, s"hier $hier != flat $flat for v=${v.toSeq}")
    }
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType, containsNull = false))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(v => Row(v.toSeq)), 4), schema)
    val got = df.select(VectorFunctions.topProbeLabels(col("v"), dim, labels, cent, nProbe).as("p"))
      .collect().map(_.getSeq[Int](0).toSeq)
    got.zip(vecs).foreach { case (g, v) =>
      assert(g == flatProbes(v, dim, labels, cent, nProbe), s"codegen mismatch for v=${v.toSeq}")
    }
  }

  test("pruned nearest-centroid == flat scan on random corpora (k=200, dim=16)") {
    val dim = 16
    val k = 200
    val coord: Gen[Double] = Gen.chooseNum(-100.0, 100.0)
    val cent = sample(Gen.listOfN(dim, coord), k).flatten.toArray
    val vecs = sample(Gen.listOfN(dim, coord), 500).map(_.toArray)
    runNearest(vecs, dim, cent)
  }

  test("pruned nearest-centroid == flat scan under EXACT ties (grid corpus, duplicate centroids)") {
    val dim = 4
    val grid: Gen[Double] = Gen.oneOf(-1d, 0d, 1d, 2d)
    val base = sample(Gen.listOfN(dim, grid), 80).map(_.toArray)
    // duplicates at distant indices: identical distances everywhere, the
    // lowest index must win through the out-of-order pruned scan
    val cent = (base ++ base.take(40)).flatten.toArray // k = 120
    val vecs = sample(Gen.listOfN(dim, grid), 600).map(_.toArray) ++ base.take(50)
    runNearest(vecs, dim, cent)
  }

  test("pruned top-probe labels == flat scan on random corpora (k=200, nProbe=2 and 5)") {
    val dim = 16
    val k = 200
    val coord: Gen[Double] = Gen.chooseNum(-50.0, 50.0)
    val cent = sample(Gen.listOfN(dim, coord), k).flatten.toArray
    val vecs = sample(Gen.listOfN(dim, coord), 400).map(_.toArray)
    runProbes(vecs, dim, cent, nProbe = 2)
    runProbes(vecs, dim, cent, nProbe = 5)
  }

  test("pruned top-probe labels == flat scan under floored-cosine ties (grid corpus)") {
    val dim = 4
    // strictly positive-norm grid (the cosine kernels divide by |c|)
    val grid: Gen[Double] = Gen.oneOf(1d, 2d, 3d)
    val base = sample(Gen.listOfN(dim, grid), 70).map(_.toArray)
    val cent = (base ++ base.take(30)).flatten.toArray // k = 100, exact duplicate cells
    val vecs = sample(Gen.listOfN(dim, grid), 500).map(_.toArray)
    runProbes(vecs, dim, cent, nProbe = 3)
  }

  test("index declines degenerate corpora (small k, non-finite, zero-norm cosine flag)") {
    assert(CentroidIndex.buildOrNull(Array.fill(63 * 4)(1d), 4, 63) == null)
    assert(CentroidIndex.buildOrNull(
      Array.tabulate(64 * 4)(i => if (i == 17) Double.NaN else 1d), 4, 64) == null)
    // a zero-norm centroid keeps the (distance-exact) index but flags
    // the cosine kernels back to the flat scan
    val zeroRow = Array.tabulate(64 * 4)(i => if (i / 4 == 20) 0d else 1d)
    val ix = CentroidIndex.buildOrNull(zeroRow, 4, 64)
    assert(ix != null && !ix.cosineSafe)
    assert(CentroidIndex.buildOrNull(Array.fill(64 * 4)(1d), 4, 64).cosineSafe)
  }

  test("knnJoinGeo at an index-active cell count == flat-forced twin (end-to-end)") {
    val emb = Tables.embeddings(spark, sfDir)
    def run(): Seq[(Long, Long, Double, Long)] =
      graft.operators.Vectors.knnJoinGeo(emb, kCells = 96)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val saved = CentroidIndex.hierMin
    val (hier, flat) = try {
      CentroidIndex.hierMin = 64
      val h = run()
      CentroidIndex.hierMin = Int.MaxValue
      (h, run())
    } finally CentroidIndex.hierMin = saved
    assert(hier.nonEmpty && hier == flat)
  }
}
