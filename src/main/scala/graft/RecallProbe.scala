package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{EventSemantics, Vectors}

/** Recall@k-vs-cost for the blocked kNN-graph family (VERDICT r10
  * item 5): the sized-labels soak measures COST (geo ≈ 3.4× cheaper than
  * mp/mph at x30), but a deploy recommendation needs the recall side —
  * how many of the TRUE top-k neighbors (unblocked brute-force graph)
  * each blocking recovers. This main computes, on one corpus:
  *
  *   truth      — exact all-pairs top-k by floored cosine (the same
  *                cosine/tie contract as every graph variant: cosine
  *                DESC at scale 6, vec_b ASC);
  *   per variant — micro-averaged recall@k = |edges ∩ truth| / |truth|
  *                and the variant's measured build wall.
  *
  * Variants: label-blocked exact (v_knn_join — the recall the GIVEN
  * blocking admits), multi-probe (mp), hierarchical multi-probe (mph),
  * and the learned-geometry build (geo) at its deploy cell count
  * (`autoGeoCells`). Brute truth is O(N²·dim), so this runs at the x1
  * corpus (~36M pairs at sf0.1) — costs at x10/x30 are the sized soak's
  * job (knn_sized_soak.json); this artifact supplies the recall column
  * SCALING.md's deploy recommendation cites.
  *
  * Writes recall_probe.json.
  * Usage: runMain graft.RecallProbe [corpusDir=/root/testdata/sf0.1] [k=5]
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 50 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    Actions.materialize(emb.limit(64)) // absorb footer reads

    // exact truth: unblocked all-pairs top-k, same cosine/tie contract
    import graft.functions.VectorFunctions.{vecDot, vecNorm2}
    val e = emb.filter(Vectors.kmValid)
      .select(col("vec_id"), col("embedding").as("v"), vecNorm2(col("embedding")).as("n2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_a").orderBy(col("cosine").desc, col("vec_b").asc)
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        EventSemantics.fl(
          vecDot(col("a.v"), col("b.v")) / (sqrt(col("a.n2")) * sqrt(col("b.n2"))),
          6).as("cosine"))
      .withColumn("nn_rank", row_number().over(w)).filter(col("nn_rank") <= k)
      .select("vec_a", "vec_b")
      .localCheckpoint() // truth is the yardstick, not part of any timed cost
    val truthN = truth.count()

    val cells = Vectors.autoGeoCells(emb)
    // equal-budget comparison: learned cells at the SAME blocking
    // cardinality as the corpus' given labels — recall differences
    // between this row and mp are pure blocking QUALITY (learned
    // geometry vs arbitrary labels), not candidate-budget differences
    val labelCard = emb.filter(col("label").isNotNull)
      .select("label").distinct().count().toInt.max(1)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "v_knn_join" -> (() => Vectors.knnJoin(emb, k)),
      "v_knn_join_mp" -> (() => Vectors.knnJoinMultiProbe(emb, k)),
      "v_knn_join_mph" -> (() => Vectors.knnJoinMultiProbeHier(emb, k)),
      "v_knn_join_geo" -> (() => Vectors.knnJoinGeo(emb, k, kCells = cells)),
      "v_knn_join_geo_eqcard" -> (() => Vectors.knnJoinGeo(emb, k, kCells = labelCard)))

    val rows = variants.map { case (name, build) =>
      val t0 = System.nanoTime()
      val g = build()
      Actions.materialize(g)
      val wall = (System.nanoTime() - t0) / 1e9
      val hits = g.select("vec_a", "vec_b")
        .join(truth, Seq("vec_a", "vec_b"), "left_semi").count()
      val recall = hits.toDouble / truthN
      println(f"[recall] $name%-18s recall@$k ${recall}%.4f wall ${wall}%.2fs")
      s""""$name":{"recall_at_$k":${Actions.fmt(recall, 4)},"wall_s":${Actions.fmt(wall, 2)}}"""
    }
    val out = s"""{"corpus":"$dir","k":$k,"geo_cells":$cells,"label_cardinality":$labelCard,"truth_edges":$truthN,""" +
      rows.mkString("", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("recall_probe.json"),
      (out + "\n").getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
