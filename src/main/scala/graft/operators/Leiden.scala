package graft.operators

/** Deterministic Leiden-style community detection for BOUNDED node sets —
  * the modularity-optimizing partition the reference computes with
  * `leidenalg.find_partition` (/root/reference/web/api.py:479) over the
  * channel-similarity graph. Channels are a bounded set at any data scale
  * (the heavy part — the similarity matrix — stays distributed upstream),
  * so the graph solve itself is legitimate driver/in-row work, exactly
  * like the reference's own igraph call.
  *
  * Algorithm (γ = 1 modularity, undirected weighted):
  *   1. LOCAL MOVING — nodes in deterministic (sorted-label) order greedily
  *      move to the neighbor community with the best positive modularity
  *      gain, repeated until a full pass makes no move.
  *   2. REFINEMENT (Leiden's fix for Louvain's badly-connected
  *      communities) — each community is re-partitioned from singletons
  *      with moves RESTRICTED to members of that community; the aggregated
  *      graph is built from the refined partition, so a community that
  *      local moving glued together through a weak bridge can split.
  *   3. AGGREGATION — refined communities become nodes (edge weights
  *      summed, intra-community weight as self-loops) and the cycle
  *      repeats on the aggregated graph until a level's local moving
  *      merges nothing; the coarse moves a refinement undid are
  *      re-decided on modularity at the next level.
  *
  * Output labels: each community is named by its minimum member label —
  * the same convention as the connected-components analog, so the two
  * operators differ only where the PARTITIONS differ (e.g. two dense
  * cliques joined by one bridge edge: CC merges them, Leiden splits).
  *
  * Determinism: node order is sorted, ties in gain break toward the
  * lower community id, no randomness anywhere — identical input always
  * yields the identical partition.
  */
object Leiden {

  /** Community assignment for an undirected weighted graph given as
    * (a, b, weight) edges over `nodes`; isolated nodes form singleton
    * communities. Returns node -> community label (min member label).
    */
  def cluster(nodes: Seq[String], edges: Seq[(String, String, Double)],
              maxLevels: Int = 16): Map[String, String] = {
    val labels = nodes.distinct.sorted.toArray
    if (labels.isEmpty) return Map.empty
    val idx = labels.zipWithIndex.toMap
    val n = labels.length
    // symmetric weight map, parallel edges summed, self-loops kept
    val w = new scala.collection.mutable.HashMap[(Int, Int), Double]
    // edges referencing nodes outside `nodes` are dropped, not crashed on —
    // a caller's edge list may lag its node list (e.g. filtered rollups)
    edges.foreach { case (a, b, wt) =>
      (idx.get(a), idx.get(b)) match {
        case (Some(i), Some(j)) =>
          val k = if (i <= j) (i, j) else (j, i)
          w(k) = w.getOrElse(k, 0d) + wt
        case _ => ()
      }
    }
    var g = Graph.build(n, w.toSeq.map { case ((i, j), wt) => (i, j, wt) })
    // member(origNode) = node id in the CURRENT aggregated graph
    var member = Array.tabulate(n)(identity)

    var level = 0
    var done = false
    while (!done && level < maxLevels) {
      val ident = Array.tabulate(g.n)(identity)
      val part = localMove(g, ident, ident)
      if (part.distinct.length == g.n) done = true // no merge possible
      else {
        // refinement: re-partition from singletons with moves restricted
        // to each coarse community's own members, then aggregate by the
        // REFINED partition (Leiden's well-connectedness guarantee — a
        // community glued through a weak bridge stays split in the
        // aggregate and the next level's local moving re-decides it on
        // modularity, rather than inheriting the glue)
        val refined = refine(g, part)
        val agg =
          if (refined.distinct.length == g.n) compact(part) // refinement all-singleton: aggregate by the coarse partition to guarantee progress
          else refined
        g = g.aggregate(agg)
        member = member.map(agg)
        level += 1
      }
    }
    // label each community by its min member label
    val commLabel = labels.indices.groupBy(member(_))
      .map { case (c, vs) => c -> vs.map(labels(_)).min }
    labels.indices.map(v => labels(v) -> commLabel(member(v))).toMap
  }

  /** Renumber arbitrary partition ids to compact 0..k-1 (order-preserving). */
  private def compact(part: Array[Int]): Array[Int] = {
    val renum = part.distinct.sorted.zipWithIndex.toMap
    part.map(renum)
  }

  // ---- internals -----------------------------------------------------------

  private final class Graph(val n: Int,
                            val nbrs: Array[Array[(Int, Double)]],
                            val selfW: Array[Double],
                            val degree: Array[Double],
                            val m2: Double) {
    /** Aggregate by `part` (community ids must be 0..k-1 compact). */
    def aggregate(part: Array[Int]): Graph = {
      val k = if (part.isEmpty) 0 else part.max + 1
      val wmap = new scala.collection.mutable.HashMap[(Int, Int), Double]
      val self = new Array[Double](k)
      for (v <- 0 until n) {
        self(part(v)) += selfW(v)
        for ((u, wt) <- nbrs(v); if u >= v) {
          val (a, b) = (part(v), part(u))
          if (a == b) self(a) += wt
          else {
            val key = if (a <= b) (a, b) else (b, a)
            wmap(key) = wmap.getOrElse(key, 0d) + wt
          }
        }
      }
      Graph.build(k, wmap.toSeq.map { case ((a, b), wt) => (a, b, wt) }, self)
    }
  }

  private object Graph {
    def build(n: Int, edges: Seq[(Int, Int, Double)],
              self0: Array[Double] = null): Graph = {
      val self = if (self0 != null) self0.clone() else new Array[Double](n)
      val adj = Array.fill(n)(List.empty[(Int, Double)])
      edges.foreach { case (i, j, wt) =>
        if (i == j) self(i) += wt
        else { adj(i) ::= (j, wt); adj(j) ::= (i, wt) }
      }
      val nbrs = adj.map(_.sortBy(_._1).toArray)
      val degree = Array.tabulate(n)(v => nbrs(v).map(_._2).sum + 2d * self(v))
      val m2 = degree.sum
      new Graph(n, nbrs, self, degree, math.max(m2, 1e-12))
    }
  }

  /** Greedy modularity local moving from `init`, nodes visited in the
    * order given by `order`, repeated until a pass makes no move.
    * `restrict` (optional) confines each node's candidate communities.
    */
  private def localMove(g: Graph, init: Array[Int], order: Array[Int],
                        restrict: Array[Int] = null): Array[Int] = {
    val part = init.clone()
    val commTot = new Array[Double](g.n + 1)
    for (v <- 0 until g.n) commTot(part(v)) += g.degree(v)
    var moved = true
    while (moved) {
      moved = false
      for (v <- order) {
        val cur = part(v)
        // weight from v to each neighbor community
        val toComm = new scala.collection.mutable.HashMap[Int, Double]
        for ((u, wt) <- g.nbrs(v) if u != v;
             if restrict == null || restrict(u) == restrict(v))
          toComm(part(u)) = toComm.getOrElse(part(u), 0d) + wt
        commTot(cur) -= g.degree(v)
        val base = toComm.getOrElse(cur, 0d) - g.degree(v) * commTot(cur) / g.m2
        var bestC = cur
        var bestGain = 0d
        // ascending community order + strictly-greater test = ties resolve
        // to the lowest community id, deterministically
        for ((c, wvc) <- toComm.toSeq.sortBy(_._1) if c != cur) {
          val gain = wvc - g.degree(v) * commTot(c) / g.m2 - base
          if (gain > bestGain + 1e-12) { bestGain = gain; bestC = c }
        }
        commTot(cur) += g.degree(v)
        if (bestC != cur) {
          commTot(cur) -= g.degree(v)
          commTot(bestC) += g.degree(v)
          part(v) = bestC
          moved = true
        }
      }
    }
    part
  }

  /** Leiden refinement: re-partition from singletons, moves restricted to
    * the local-moving community each node sits in. Returns a compact
    * partition (ids 0..k-1).
    */
  private def refine(g: Graph, coarse: Array[Int]): Array[Int] = {
    val singleton = Array.tabulate(g.n)(identity)
    val refined = localMove(g, singleton, singleton, restrict = coarse)
    val ids = refined.distinct.sorted
    val renum = ids.zipWithIndex.toMap
    refined.map(renum)
  }
}
