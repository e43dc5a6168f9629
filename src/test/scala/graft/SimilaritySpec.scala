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
