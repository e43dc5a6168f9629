package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Caches.SharedCacheOps

import EventSemantics.{fl, flSql, userWeeklyActivitySql}

/** Channel-similarity analytics — reference `web/api.py:418`
  * channel_clustering, `:914` recommend_channels, `:658` content_clustering.
  *
  * The reference pivots user×channel message counts into an in-memory
  * matrix and calls sklearn cosine_similarity; here the same math is a
  * self-join on the *rolled-up* (user, channel) relation with exact BIGINT
  * dot products — |users|×|channels| rows, never raw messages — and the
  * per-channel norms are a tiny aggregate joined back (broadcast at scale).
  *
  * Determinism: dot products and norms are exact integer sums; the only
  * doubles are the final sqrt/divide, identical IEEE ops in both engines.
  */
object Similarity {

  /** #31 channel×channel cosine of user-message-count vectors, per week.
    * Emits ordered pairs (a < b) that share >= 1 user (zero-sim pairs are
    * absent by construction in both engines).
    */
  def channelSimilarity(events: DataFrame): DataFrame =
    channelSimilarityFrom(
      // consumed three times (both dot-product sides + norms); materialize
      // the MV-shaped rollup once instead of scanning the fact per consumer
      // (see ChatStats.attrition for the full rationale)
      EventSemantics.userWeeklyActivity(events)
        .select(col("user_id"), col("channel"), col("week"), col("messages"))
        .sharedCache)

  /** Cosine similarity from an already-materialized weekly rollup `w`
    * (user_id, channel, week, messages) — the deploy seam for a warehouse
    * that maintains the rollup as a TABLE (EventSemantics.incrementRollup
    * keeps it fresh): bucketed by user_id (Layout.writeBucketed), the
    * pair self-join runs with no input exchange (LayoutSpec pins this).
    * Also shares one rollup across consumers in-session
    * (clusteringCommunities).
    */
  def channelSimilarityFrom(w: DataFrame): DataFrame = {
    val dots = w.as("a")
      .join(w.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.week") === col("b.week") &&
          col("a.channel") < col("b.channel"))
      .groupBy(col("a.week").as("week"), col("a.channel").as("channel_a"), col("b.channel").as("channel_b"))
      .agg(sum(col("a.messages") * col("b.messages")).as("dot"))
    // materialized ONCE (eager — both consumers are BroadcastExchange
    // builds off a cold cache, the documented concurrent-broadcast
    // block-lock race sharedCacheEager exists for; the count job is one
    // pass over a |channels×weeks|-sized relation): norms joins back
    // under two different renames
    // (channel_a / channel_b), and the rename sits below each
    // BroadcastExchange, so the canonical plans differ and exchange reuse
    // never fires — without the cache the rollup was re-aggregated per
    // side (2 Exchange + 2 HashAggregate in the plan where 1 suffices).
    // The relation is |channels x weeks|, tiny at any corpus size.
    val norms = w.groupBy("week", "channel")
      .agg(sum(col("messages") * col("messages")).as("n2"))
      .sharedCacheEager
    dots
      .join(norms.withColumnRenamed("channel", "channel_a").withColumnRenamed("n2", "n2_a"), Seq("week", "channel_a"))
      .join(norms.withColumnRenamed("channel", "channel_b").withColumnRenamed("n2", "n2_b"), Seq("week", "channel_b"))
      .select(col("week"), col("channel_a"), col("channel_b"),
        fl(col("dot").cast("double") / (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))), 6)
          .as("similarity"))
  }

  val channelSimilaritySql: String =
    s"""WITH act AS ($userWeeklyActivitySql),
       | dots AS (
       |  SELECT a.week, a.channel AS channel_a, b.channel AS channel_b,
       |    SUM(a.messages * b.messages) AS dot
       |  FROM act a JOIN act b ON a.user_id = b.user_id AND a.week = b.week
       |    AND a.channel < b.channel
       |  GROUP BY 1, 2, 3),
       | norms AS (SELECT week, channel, SUM(messages * messages) AS n2 FROM act GROUP BY 1, 2)
       | SELECT d.week, d.channel_a, d.channel_b,
       |  ${flSql("CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))", 6)} AS similarity
       | FROM dots d
       | JOIN norms na ON na.week = d.week AND na.channel = d.channel_a
       | JOIN norms nb ON nb.week = d.week AND nb.channel = d.channel_b""".stripMargin.replace("\n", "")

  /** #32 recommend_channels (api.py:914): for one user, score every
    * candidate channel by Σ cosine-sim to the user's channels (full-period
    * weights), excluding channels where the user already has > 3 messages,
    * top-10, log-dampened 0-100 score.
    */
  def recommend(events: DataFrame, userId: Long = 3L, exclThreshold: Long = 3L, k: Int = 10): DataFrame =
    recommendFrom(
      EventSemantics.userWeeklyActivity(events)
        .groupBy("user_id", "channel").agg(sum("messages").as("weight"))
        .sharedCache,
      userId, exclThreshold, k)

  /** Recommendations from an already-materialized full-period weight
    * rollup `w` (user_id, channel, weight) — the deploy seam for a
    * warehouse that maintains this table (derivable from the weekly MV by
    * one aggregation, so `incrementRollup` keeps it one step away).
    * Consumed five times (both dot sides, norms, the user's channels
    * twice), hence the persist in [[recommend]].
    */
  def recommendFrom(w: DataFrame, userId: Long = 3L, exclThreshold: Long = 3L, k: Int = 10): DataFrame = {
    val dots = w.as("a").join(w.as("b"), col("a.user_id") === col("b.user_id"))
      .groupBy(col("a.channel").as("channel_a"), col("b.channel").as("channel_b"))
      .agg(sum(col("a.weight") * col("b.weight")).as("dot"))
    // cached for the same two-rename reuse failure as channelSimilarityFrom
    val norms = w.groupBy("channel").agg(sum(col("weight") * col("weight")).as("n2"))
      .sharedCacheEager
    val sims = dots
      .join(norms.withColumnRenamed("channel", "channel_a").withColumnRenamed("n2", "n2_a"), "channel_a")
      .join(norms.withColumnRenamed("channel", "channel_b").withColumnRenamed("n2", "n2_b"), "channel_b")
      .select(col("channel_a"), col("channel_b"),
        (col("dot").cast("double") / (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double")))).as("sim"))
    // The requesting user's channel vector is bounded by |channels| (the
    // reference fetches it as one row set per request, api.py:930) — ONE
    // capped driver collect, then plain literal predicates. The broadcast
    // formulation spends three jobs (two broadcast builds + a crossJoin
    // materialization) shipping relations this small around the cluster.
    val mine = w.filter(col("user_id") === userId && col("weight") > 0)
      .select(col("channel"), col("weight"))
      .collect()
    val ucs = mine.map(_.getString(0)).toSeq
    val nUc = ucs.size.toLong
    val excl = mine.filter(_.getLong(1) > exclThreshold).map(_.getString(0)).toSeq
    if (ucs.isEmpty)
      sims.filter(lit(false))
        .select(col("channel_a").as("channel_name"), lit(0d).as("score"))
    else
      sims
        .filter(col("channel_b").isin(ucs: _*))
        .groupBy("channel_a").agg(sum("sim").as("raw_score"))
        .filter(if (excl.isEmpty) lit(true) else !col("channel_a").isin(excl: _*))
        .orderBy(col("raw_score").desc, col("channel_a").asc)
        .limit(k)
        .select(col("channel_a").as("channel_name"),
          fl(log(lit(1d) + col("raw_score") / lit(nUc).cast("double") * 100d) / log(lit(101d)) * 100d, 4)
            .as("score"))
  }

  def recommendSql(userId: Long = 3L, exclThreshold: Long = 3L, k: Int = 10): String =
    s"""WITH act AS ($userWeeklyActivitySql),
       | w AS (SELECT user_id, channel, SUM(messages) AS weight FROM act GROUP BY 1, 2),
       | dots AS (
       |  SELECT a.channel AS channel_a, b.channel AS channel_b, SUM(a.weight * b.weight) AS dot
       |  FROM w a JOIN w b ON a.user_id = b.user_id GROUP BY 1, 2),
       | norms AS (SELECT channel, SUM(weight * weight) AS n2 FROM w GROUP BY 1),
       | sims AS (
       |  SELECT d.channel_a, d.channel_b,
       |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS sim
       |  FROM dots d
       |  JOIN norms na ON na.channel = d.channel_a
       |  JOIN norms nb ON nb.channel = d.channel_b),
       | mine AS (SELECT channel AS uc, weight FROM w WHERE user_id = $userId AND weight > 0),
       | raw AS (
       |  SELECT s.channel_a, SUM(s.sim) AS raw_score
       |  FROM sims s JOIN mine m ON s.channel_b = m.uc
       |  WHERE s.channel_a NOT IN (SELECT uc FROM mine WHERE weight > $exclThreshold)
       |  GROUP BY 1)
       | SELECT channel_a AS channel_name,
       |  ${flSql("ln(1 + raw_score / CAST((SELECT COUNT(*) FROM mine) AS DOUBLE) * 100) / ln(101) * 100", 4)} AS score
       | FROM raw ORDER BY raw_score DESC, channel_a ASC LIMIT $k""".stripMargin.replace("\n", "")

  /** #33 content_clustering (api.py:658): TF-IDF over each source's
    * concatenated text, pairwise cosine. Unigram terms, smooth idf
    * (ln((1+N)/(1+df))+1, sklearn's formula), exact integer tf.
    *
    * `maxDf` is the hot-key lever for real corpora: the pairwise dot
    * product joins on `term`, so a term appearing in d sources makes a
    * d²-size join key — stopwords turn the join quadratic in the corpus.
    * With `Some(cap)`, terms with document frequency > cap are pruned from
    * the WHOLE vectorization (tf-idf, dots, and norms consistently) —
    * sklearn CountVectorizer's `max_df` semantic, a well-defined smaller
    * vocabulary rather than an approximation of the full one. The default
    * (None) keeps the full vocabulary and is what the DuckDB oracle checks.
    */
  def contentSimilarity(documents: DataFrame, maxDf: Option[Long] = None): DataFrame = {
    val terms = documents
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      // Spark split("") is [""], DuckDB regexp_extract_all("") is [] —
      // without this filter an empty/whitespace-only doc injects "" into
      // the vocabulary (two blank docs would score similarity 1.0) and
      // diverges from the oracle; same guard as every other tokenizer here
      .filter(length(col("term")) > 0)
    // ONE corpus scan: tf's partial agg absorbs the exploded token stream
    // map-side, then the pinned term-partitioned aggregate feeds every
    // term-keyed consumer — df_, the idf join, the pairwise self-join —
    // with zero further exchanges (HashPartitioning(term) satisfies each
    // of their distributions). Without the cache, Catalyst duplicates the
    // scan+aggregate subtree under each consumer.
    val tf = terms.groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .repartition(col("term"))
      .sharedCache
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // the corpus-size idf scalar: counted over raw documents, not the
    // tokenized aggregate — sklearn (the reference's vectorizer) counts
    // every fitted sample in n, including sources whose whole text is
    // null/empty, and the oracle's COUNT(DISTINCT source) must see the
    // same denominator. Kept LAZY as a broadcast single-row cross join
    // (not an eager collect) so the column-pruned source scan runs once
    // inside the query, not once per plan build.
    val n = documents.select(countDistinct("source").as("n_src"))
    // weighted IS cached: its three consumers (both dot-product sides
    // and the norms) would otherwise each re-run the idf join AND the
    // n_src scan hanging under it
    val weighted = tf.join(df_, "term")
      .filter(maxDf.map(c => col("df") <= c).getOrElse(lit(true)))
      .crossJoin(broadcast(n))
      .select(col("source"), col("term"),
        (col("tf").cast("double") *
          (log((lit(1d) + col("n_src").cast("double")) / (lit(1d) + col("df").cast("double"))) + lit(1d)))
          .as("wt"))
      // sharedCache, not bare cache(): Caches.release() must be able to
      // free these corpus-scale relations between queries in a long session
      .sharedCache
    val dots = weighted.as("a")
      .join(weighted.as("b"), col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(col("a.wt") * col("b.wt")).as("dot"))
    // cached for the same two-rename broadcast-reuse failure as
    // channelSimilarityFrom (one row per source — tiny at any scale)
    val norms = weighted.groupBy("source").agg(sum(col("wt") * col("wt")).as("n2"))
      .sharedCacheEager
    dots
      .join(norms.withColumnRenamed("source", "source_a").withColumnRenamed("n2", "n2_a"), "source_a")
      .join(norms.withColumnRenamed("source", "source_b").withColumnRenamed("n2", "n2_b"), "source_b")
      .select(col("source_a"), col("source_b"),
        fl(col("dot") / (sqrt(col("n2_a")) * sqrt(col("n2_b"))), 4).as("similarity"))
  }

  val contentSimilaritySql: String =
    s"""WITH terms AS (
       |  SELECT source, unnest(regexp_extract_all(lower(trim(text)), '[^ \\t\\n\\x0B\\f\\r]+')) AS term
       |  FROM documents),
       | tf AS (SELECT source, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       | dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       | n AS (SELECT COUNT(DISTINCT source) AS n_src FROM documents),
       | wtd AS (
       |  SELECT tf.source, tf.term,
       |    CAST(tf.tf AS DOUBLE) * (ln((1 + CAST(n.n_src AS DOUBLE)) / (1 + CAST(dfs.df AS DOUBLE))) + 1) AS wt
       |  FROM tf JOIN dfs ON tf.term = dfs.term CROSS JOIN n),
       | dots AS (
       |  SELECT a.source AS source_a, b.source AS source_b, SUM(a.wt * b.wt) AS dot
       |  FROM wtd a JOIN wtd b ON a.term = b.term AND a.source < b.source
       |  GROUP BY 1, 2),
       | norms AS (SELECT source, SUM(wt * wt) AS n2 FROM wtd GROUP BY 1)
       | SELECT d.source_a, d.source_b,
       |  ${flSql("d.dot / (sqrt(na.n2) * sqrt(nb.n2))", 4)} AS similarity
       | FROM dots d
       | JOIN norms na ON na.source = d.source_a
       | JOIN norms nb ON nb.source = d.source_b""".stripMargin.replace("\n", "")

  /** #34 community detection analog (api.py:478 Leiden): keep edges whose
    * similarity exceeds the per-week median, then EXACT connected components
    * (community = min channel label of the component, matching the oracle's
    * recursive reachability).
    *
    * The graph's nodes are channels, not users — bounded cardinality at any
    * data scale — so each week's edge list is collected in-row and solved
    * with a union-find in one pass: one shuffle keyed by week, no iterative
    * join loop (which pays ~3 shuffles per hop of graph diameter and only
    * approximates components up to a fixed depth). The heavy part — the
    * similarity matrix — stays fully distributed upstream.
    */
  private val componentsUdf = udf { (nodes: Seq[String], edges: Seq[Row]) =>
    val parent = scala.collection.mutable.HashMap.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    nodes.foreach(n => parent.getOrElseUpdate(n, n))
    // min-label union: the smaller root becomes the parent, so every final
    // root is the minimum label of its component
    Option(edges).getOrElse(Seq.empty).foreach { e =>
      val a = e.getString(0); val b = e.getString(1)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    nodes.map(n => (n, find(n)))
  }

  def clusteringCommunities(events: DataFrame): DataFrame = {
    // one materialized rollup feeds the similarity edges AND the node list
    val w = EventSemantics.userWeeklyActivity(events)
      .select(col("user_id"), col("channel"), col("week"), col("messages"))
      .sharedCache
    val edges = channelSimilarityFrom(w)
      .withColumn("thr", expr("percentile(similarity, 0.5)").over(Window.partitionBy("week")))
      .filter(col("similarity") > col("thr"))
      .select(col("week"), col("channel_a"), col("channel_b"))
    val nodesW = w
      .select("week", "channel").distinct()
      .groupBy("week").agg(sort_array(collect_list("channel")).as("ns"))
    val edgesW = edges.groupBy("week")
      .agg(collect_list(struct(col("channel_a"), col("channel_b"))).as("es"))
    nodesW.join(broadcast(edgesW), Seq("week"), "left")
      .select(col("week"), explode(componentsUdf(col("ns"), col("es"))).as("nc"))
      .select(col("week"), col("nc._1").as("channel"), col("nc._2").as("community"))
  }

  /** #34 community detection, Leiden partition semantics (api.py:478 runs
    * `leidenalg.find_partition`): same per-week thresholded similarity
    * graph as [[clusteringCommunities]], but partitioned by
    * modularity-optimizing Leiden ([[Leiden.cluster]]) instead of
    * connected components — two dense clusters joined by one bridge edge
    * SPLIT here where CC merges them, matching the live site's partitions.
    *
    * [[clusteringCommunities]] stays as the oracle-checkable variant (CC
    * is expressible as a recursive CTE; modularity optimization is not,
    * so this query is spec-gated + rows-checked). Edge weights are the
    * similarities; the per-week graph solve runs in-row over the bounded
    * channel set, like the reference's own igraph call.
    */
  private val leidenUdf = udf { (nodes: Seq[String], edges: Seq[Row]) =>
    val es = Option(edges).getOrElse(Seq.empty)
      .map(e => (e.getString(0), e.getString(1), e.getDouble(2)))
    Leiden.cluster(nodes, es).toSeq
  }

  def leidenCommunities(events: DataFrame): DataFrame = {
    val w = EventSemantics.userWeeklyActivity(events)
      .select(col("user_id"), col("channel"), col("week"), col("messages"))
      .sharedCache
    val edges = channelSimilarityFrom(w)
      .withColumn("thr", expr("percentile(similarity, 0.5)").over(Window.partitionBy("week")))
      .filter(col("similarity") > col("thr"))
      .select(col("week"), col("channel_a"), col("channel_b"), col("similarity"))
    val nodesW = w
      .select("week", "channel").distinct()
      .groupBy("week").agg(sort_array(collect_list("channel")).as("ns"))
    val edgesW = edges.groupBy("week")
      .agg(collect_list(struct(col("channel_a"), col("channel_b"), col("similarity"))).as("es"))
    nodesW.join(broadcast(edgesW), Seq("week"), "left")
      .select(col("week"), explode(leidenUdf(col("ns"), col("es"))).as("nc"))
      .select(col("week"), col("nc._1").as("channel"), col("nc._2").as("community"))
  }

  val clusteringCommunitiesSql: String =
    s"""WITH RECURSIVE sims AS ($channelSimilaritySql),
       | thr AS (SELECT week, quantile_cont(similarity, 0.5) AS thr FROM sims GROUP BY 1),
       | e AS (
       |  SELECT s.week, s.channel_a, s.channel_b FROM sims s JOIN thr t ON s.week = t.week
       |  WHERE s.similarity > t.thr),
       | e2 AS (SELECT week, channel_a, channel_b FROM e
       |  UNION SELECT week, channel_b, channel_a FROM e),
       | nodes AS (SELECT DISTINCT week, channel FROM ($userWeeklyActivitySql)),
       | reach AS (
       |  SELECT week, channel, channel AS r FROM nodes
       |  UNION
       |  SELECT reach.week, reach.channel, e2.channel_b AS r
       |  FROM reach JOIN e2 ON e2.week = reach.week AND e2.channel_a = reach.r)
       | SELECT week, channel, MIN(r) AS community FROM reach GROUP BY 1, 2""".stripMargin.replace("\n", "")
}
