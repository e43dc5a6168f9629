package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventSemantics, Similarity}

/** Invariant specs for the similarity suite. The communities test
  * re-derives the thresholded graph independently (collected sims + linear-
  * interpolated median, a Scala BFS for reachability) and checks the
  * operator's union-find output against true connected components.
  */
class SimilaritySpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)

  test("channel similarity is within [0, 1] and channel_a < channel_b") {
    val sims = Similarity.channelSimilarity(events).collect()
    assert(sims.nonEmpty)
    sims.foreach { r =>
      val s = r.getDouble(3)
      assert(s >= 0d && s <= 1.0000001, s"similarity out of range: $s")
      assert(r.getString(1) < r.getString(2))
    }
  }

  test("communities are exactly the connected components of the thresholded graph") {
    val simRows = Similarity.channelSimilarity(events).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getString(2), r.getDouble(3)))
    // linear-interpolated median per week — same formula as Spark's
    // percentile(x, 0.5) / DuckDB's quantile_cont
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val rank = 0.5 * (s.length - 1)
      val lo = s(rank.toInt)
      val hi = s(math.ceil(rank).toInt)
      lo + (hi - lo) * (rank - rank.toInt)
    }
    val thr = simRows.groupBy(_._1).map { case (w, rs) => w -> median(rs.map(_._4).toIndexedSeq) }
    val edges = simRows.filter { case (w, _, _, s) => s > thr(w) }
      .map { case (w, a, b, _) => (w, a, b) }
    val nodes = EventSemantics.userWeeklyActivity(events)
      .select(col("week").cast("string"), col("channel")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    // brute-force reachability per week
    val adj = edges.flatMap { case (w, a, b) => Seq((w, a) -> b, (w, b) -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    def component(w: String, start: String): Set[String] = {
      var seen = Set(start)
      var frontier = List(start)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse((w, n), Set.empty)).filterNot(seen)
        seen ++= next
        frontier = next
      }
      seen
    }
    val expected = nodes.map { case (w, ch) => ((w, ch), component(w, ch).min) }.toMap
    val got = Similarity.clusteringCommunities(events).collect()
      .map(r => ((r.getDate(0).toString, r.getString(1)), r.getString(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, comm) =>
      assert(got(k) == comm, s"node $k: got ${got(k)}, expected $comm")
    }
  }

  test("contentSimilarity maxDf prunes the vocabulary like computing on the filtered corpus") {
    val docs = Tables.documents(spark, sfDir)
    // a cap at the max observed df is a no-op: identical to the default
    val full = Similarity.contentSimilarity(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val maxObservedDf = docs
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .groupBy("source", "term").count()
      .groupBy("term").count().agg(max("count")).collect()(0).getLong(0)
    val capped = Similarity.contentSimilarity(docs, Some(maxObservedDf)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(full.nonEmpty && capped == full)
    // a tighter cap still yields valid cosines over the smaller vocabulary
    val pruned = Similarity.contentSimilarity(docs, Some(maxObservedDf - 1)).collect()
    assert(pruned.nonEmpty)
    pruned.foreach(r => assert(r.getDouble(2) >= 0d && r.getDouble(2) <= 1.0000001))
  }

  test("Leiden splits two dense cliques joined by a bridge edge where CC merges them") {
    // hand-computed graph: cliques {a0,a1,a2,a3} and {b0,b1,b2,b3} fully
    // connected at weight 1, ONE bridge a0-b0 at weight 0.1. Connected
    // components merge everything; modularity optimization must keep the
    // cliques apart (ΔQ of merging across the bridge is negative).
    val nodes = Seq("a0", "a1", "a2", "a3", "b0", "b1", "b2", "b3")
    def clique(pre: String) = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (s"$pre$i", s"$pre$j", 1d)
    val edges = clique("a") ++ clique("b") :+ (("a0", "b0", 0.1))
    val part = operators.Leiden.cluster(nodes, edges)
    assert(part("a0") == "a0" && part("a3") == "a0", s"clique A broken: $part")
    assert(part("b0") == "b0" && part("b3") == "b0", s"clique B broken: $part")
    assert(part.values.toSet == Set("a0", "b0"), s"expected exactly two communities: $part")
    // determinism: identical input (any node/edge order) -> identical output
    val shuffled = operators.Leiden.cluster(nodes.reverse, edges.reverse.map {
      case (a, b, w) => (b, a, w)
    })
    assert(shuffled == part)
    // isolated nodes are singleton communities
    val iso = operators.Leiden.cluster(Seq("x", "y"), Seq.empty)
    assert(iso == Map("x" -> "x", "y" -> "y"))
  }

  test("leidenCommunities: every (week, channel) labeled, labels are community minima, partitions refine CC") {
    val leiden = Similarity.leidenCommunities(events).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getString(2)).toMap
    val cc = Similarity.clusteringCommunities(events).collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> r.getString(2)).toMap
    assert(leiden.keySet == cc.keySet, "same (week, channel) coverage as the CC analog")
    // a community's label is one of its members (and its minimum)
    leiden.groupBy { case ((wk, _), comm) => (wk, comm) }.foreach {
      case ((_, comm), members) =>
        val chans = members.keys.map(_._2).toSeq
        assert(chans.contains(comm) && chans.min == comm)
    }
    // Leiden refines CC: channels in different CC components (no path at
    // all) can never share a Leiden community
    leiden.groupBy { case ((wk, _), comm) => (wk, comm) }.foreach {
      case (((wk, comm)), members) =>
        val ccLabels = members.keys.map { case (w, ch) => cc((w, ch)) }.toSet
        assert(ccLabels.size == 1,
          s"week $wk community $comm spans CC components $ccLabels")
    }
  }

  test("recommendations never include channels the user is already heavy in") {
    val userId = 3L
    val heavy = EventSemantics.userWeeklyActivity(events)
      .filter(col("user_id") === userId)
      .groupBy("channel").agg(sum("messages").as("m"))
      .filter(col("m") > 3).collect().map(_.getString(0)).toSet
    val recs = Similarity.recommend(events, userId).collect().map(_.getString(0))
    recs.foreach(ch => assert(!heavy.contains(ch), s"recommended already-heavy channel $ch"))
    assert(recs.length <= 10)
  }
}
