package graft.functions

/** Exact-pruning two-level index over a flat row-major centroid matrix —
  * the acceleration structure behind [[NearestCentroid]] and
  * [[TopProbeLabels]] at FAISS cell counts (reference workload: the IVF
  * coarse quantizer behind HoloChatStats' pgvector highlight search,
  * `web/api.py:3009`, whose cell count grows with the corpus).
  *
  * The flat kernels scan all C centroids per row — O(C·dim), the
  * measured super-linearity of the geometry-blocked graph family once
  * `Vectors.autoGeoCells` sizes C to the corpus (SCALING.md round-9
  * sized-labels table). This index groups the C centroids under
  * S = ceil(√C) super-centroids (a driver-side Lloyd over the centroid
  * matrix itself — C points, so O(C^1.5·dim) once per expression
  * instantiation) and stores, per super: the member list, the covering
  * radius max‖c − s‖, and the min/max member norms.
  *
  * The kernels then scan the nearest super's members first and PRUNE any
  * super whose triangle-inequality bound proves every member scores
  * strictly worse than the current best (nearest-centroid: lower bound
  * (‖v−s‖ − r_s)² on the squared distance; top-probe: upper bound
  * (q·s + ‖q‖·r_s)/(‖q‖·minNorm_s) on the cosine). Per-row cost drops to
  * O((√C + C/√C)·dim) with NO result change:
  *
  * EXACTNESS CONTRACT — this is an acceleration, not an approximation.
  * Every centroid that is scanned goes through the IDENTICAL strict IEEE
  * sequence as the flat kernel, and a centroid is skipped only when its
  * bound (inflated by a margin that dominates the worst-case FP error of
  * the bound arithmetic by >10^4) proves it cannot win under the kernel's
  * comparison — including ties, which break to the lowest index/label in
  * both paths. Pruning quality therefore affects SPEED only; the returned
  * value is bit-identical to the flat scan for every input, which is why
  * the geometry operators' zero-stash unrolled-Lloyd oracles are
  * untouched (HierIndexSpec pins flat == hier elementwise, including
  * duplicate-centroid ties and near-tie adversarial rows; non-finite
  * inputs and degenerate norms fall back to the flat scan outright).
  */
final class CentroidIndex(
    val dim: Int,
    val nSup: Int,
    val supCent: Array[Double], // nSup×dim row-major super-centroids
    val supNorm2: Array[Double], // |s|² per super (plain fold)
    val memberStart: Array[Int], // CSR offsets, length nSup+1
    val memberIdx: Array[Int], // centroid indices grouped by super
    val radius: Array[Double], // per super: max ‖c − s‖ over members (inflated)
    val minNorm: Array[Double], // per super: min ‖c‖ over members
    val maxNorm: Array[Double], // per super: max ‖c‖ over members
    val maxNorm2: Double, // max |c|² over all centroids
    val cosineSafe: Boolean // all member norms > 0 (cosine kernels divide by them)
) extends Serializable

object CentroidIndex {

  /** Centroid count below which the flat scan is cheaper than the index
    * (S + C/S ≈ C at C = 64; the gate's fixed kCells=8 stays flat).
    * Test hook: HierIndexSpec raises it to MaxValue to build flat twins.
    */
  @volatile var hierMin: Int = 64

  /** Build the index, or null when the flat scan is the right kernel:
    * C below [[hierMin]] or any non-finite centroid coordinate. A
    * zero-norm centroid clears [[CentroidIndex.cosineSafe]] instead —
    * the distance kernel ([[NearestCentroid]]) is still exact there,
    * while the cosine kernels (which divide by member norms) fall back
    * to the flat scan's exact degenerate behavior.
    */
  def buildOrNull(cent: Array[Double], dim: Int, k: Int): CentroidIndex = {
    if (k < hierMin || dim <= 0) return null
    var i = 0
    while (i < cent.length) {
      if (!java.lang.Double.isFinite(cent(i))) return null
      i += 1
    }
    val nS = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    // Driver Lloyd over the k centroids: init = first nS, 4 fixed
    // refinement passes. Determinism is for reproducibility only — the
    // grouping affects pruning power, never results.
    val sup = java.util.Arrays.copyOfRange(cent, 0, nS * dim)
    val assign = new Array[Int](k)
    var pass = 0
    while (pass < 5) {
      var j = 0
      while (j < k) {
        var best = -1
        var bestD = 0d
        var s = 0
        while (s < nS) {
          var d = 0d
          var t = 0
          while (t < dim) {
            val x = cent(j * dim + t) - sup(s * dim + t)
            d += x * x
            t += 1
          }
          if (best < 0 || d < bestD) { best = s; bestD = d }
          s += 1
        }
        assign(j) = best
        j += 1
      }
      if (pass < 4) {
        val sums = new Array[Double](nS * dim)
        val cnt = new Array[Int](nS)
        j = 0
        while (j < k) {
          val s = assign(j)
          cnt(s) += 1
          var t = 0
          while (t < dim) { sums(s * dim + t) += cent(j * dim + t); t += 1 }
          j += 1
        }
        var s = 0
        while (s < nS) {
          if (cnt(s) > 0) {
            var t = 0
            while (t < dim) { sup(s * dim + t) = sums(s * dim + t) / cnt(s); t += 1 }
          }
          s += 1
        }
      }
      pass += 1
    }
    // CSR member lists (ascending centroid index within each super) +
    // covering radii and member-norm ranges.
    val start = new Array[Int](nS + 1)
    var j = 0
    while (j < k) { start(assign(j) + 1) += 1; j += 1 }
    var s = 0
    while (s < nS) { start(s + 1) += start(s); s += 1 }
    val fill = java.util.Arrays.copyOf(start, nS)
    val members = new Array[Int](k)
    j = 0
    while (j < k) { members(fill(assign(j))) = j; fill(assign(j)) += 1; j += 1 }
    val radius = new Array[Double](nS)
    val minNorm = new Array[Double](nS)
    val maxNorm = new Array[Double](nS)
    var maxN2 = 0d
    var cosSafe = true
    s = 0
    while (s < nS) {
      var maxD2 = 0d
      var mn = Double.MaxValue
      var mx = 0d
      var m = start(s)
      while (m < start(s + 1)) {
        val c = members(m)
        var d2 = 0d
        var n2 = 0d
        var t = 0
        while (t < dim) {
          val cv = cent(c * dim + t)
          val x = cv - sup(s * dim + t)
          d2 += x * x
          n2 += cv * cv
          t += 1
        }
        if (d2 > maxD2) maxD2 = d2
        val nn = math.sqrt(n2)
        if (nn < mn) mn = nn
        if (nn > mx) mx = nn
        if (n2 > maxN2) maxN2 = n2
        if (!(nn > 0d)) cosSafe = false // cosine kernels go flat
        m += 1
      }
      radius(s) = math.sqrt(maxD2) * (1d + 1e-12)
      minNorm(s) = if (mn == Double.MaxValue) 0d else mn
      maxNorm(s) = mx
      s += 1
    }
    val sn2 = new Array[Double](nS)
    s = 0
    while (s < nS) {
      var acc = 0d
      var t = 0
      while (t < dim) { val x = sup(s * dim + t); acc += x * x; t += 1 }
      sn2(s) = acc
      s += 1
    }
    new CentroidIndex(dim, nS, sup, sn2, start, members, radius, minNorm, maxNorm, maxN2, cosSafe)
  }
}
