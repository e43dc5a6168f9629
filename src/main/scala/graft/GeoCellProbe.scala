package graft

import org.apache.spark.sql.SparkSession

/** Task-binary probe at the OLD cell ceiling (VERDICT r10 item 1's
  * done-criterion): builds the geometry-blocked kNN graph at a FORCED
  * C = 2^14 cells — the count where the r10 plan-reference-object design
  * put an ~8 MiB centroid matrix (2^14 × 64 doubles) into every task
  * binary of the train/assign/probe stages — and materializes it with
  * WARN logging on. Spark warns "Broadcasting large task binary" for any
  * task binary over 1 MiB, so a clean run (zero warnings on stderr) is
  * the measurement that the r11 broadcast-bundle design
  * ([[graft.functions.CentroidBundle]]) keeps task binaries under the
  * noise floor at the old cap; the matrix now ships once per executor
  * as a broadcast VARIABLE instead.
  *
  * Run via: sbt "runMain graft.GeoCellProbe [corpusDir=target/soak/sf1]"
  * and grep the output for "large task binary" (the methodology of
  * SCALING.md's round-9 task-binary attribution). Prints wall + row
  * count; the corpus must hold ≥ 2^14 valid vectors (the x10 soak corpus
  * does).
  */
object GeoCellProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/soak/sf1")
    val cells = if (args.length > 1) args(1).toInt else 1 << 14
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 50 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN") // surfaces "large task binary"
    val emb = Tables.embeddings(spark, dir)
    val valid = emb.filter(graft.operators.Vectors.kmValid).count()
    require(valid >= cells, s"corpus has $valid valid vectors < $cells cells")
    val t0 = System.nanoTime()
    val g = graft.operators.Vectors.knnJoinGeo(emb, kCells = cells)
    Actions.materialize(g)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[geoprobe] corpus=$dir cells=$cells vectors=$valid " +
      f"wall=${wall}%.1fs rows=${g.count()} maxGeoCells=${graft.operators.Vectors.maxGeoCells()}")
    spark.stop()
  }
}
