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

  // The round-1..7 gate registration (threshold 3) excluded every channel
  // for user 3, so the scoring path returned 0 rows in BOTH engines and
  // the hash match was vacuous. This test pins the registered (user 3,
  // threshold 12) configuration on non-empty output and re-derives the
  // cosine-sum / log-dampened scores with an independent Scala model.
  test("recommend (registered gate config) is non-empty and matches an independent scoring model") {
    val userId = 3L
    val thr = 12L
    val w = EventSemantics.userWeeklyActivity(events)
      .groupBy("user_id", "channel").agg(sum("messages").as("weight"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // cosine sims between channels over the user-weight vectors (self-pairs
    // included, matching the operator's unconstrained a x b dot join)
    val channels = w.keys.map(_._2).toSeq.distinct.sorted
    val byChannel = channels.map(c => c -> w.collect { case ((u, ch), wt) if ch == c => u -> wt }.toMap).toMap
    def sim(a: String, b: String): Double = {
      val va = byChannel(a); val vb = byChannel(b)
      val dot = va.collect { case (u, x) if vb.contains(u) => x * vb(u) }.sum
      val na = math.sqrt(va.values.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(vb.values.map(x => x * x).sum.toDouble)
      dot.toDouble / (na * nb)
    }
    val mine = channels.filter(c => w.getOrElse((userId, c), 0L) > 0L)
    val excl = mine.filter(c => w((userId, c)) > thr).toSet
    assert(excl.nonEmpty && excl.size < channels.size,
      "fixture must exercise both branches of the exclusion filter")
    // a candidate only appears in the operator's output if it shares >= 1
    // user with some of the user's channels (the dots relation is sparse)
    def sharesUser(a: String, b: String): Boolean =
      byChannel(a).keys.exists(byChannel(b).contains)
    val expected = channels
      .filter(a => !excl.contains(a) && mine.exists(b => sharesUser(a, b)))
      .map(a => a -> mine.map(b => sim(a, b)).sum)
      .sortBy { case (a, raw) => (-raw, a) }
      .take(10)
      .map { case (a, raw) =>
        val s = math.log(1d + raw / mine.size.toDouble * 100d) / math.log(101d) * 100d
        a -> math.floor(s * 1e4) / 1e4
      }
    val recs = Similarity.recommend(events, userId, exclThreshold = thr).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    assert(recs.nonEmpty, "registered gate config must produce rows")
    assert(recs.map(_._1).toSeq == expected.map(_._1),
      s"channel order mismatch: got ${recs.toSeq} expected $expected")
    recs.zip(expected).foreach { case ((c, got), (_, want)) =>
      assert(math.abs(got - want) < 1e-9, s"score mismatch for $c: $got vs $want")
    }
  }
}
