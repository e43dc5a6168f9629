package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement + bit-equality probe for the adaptive forecaster's
  * per-channel training kernel ([[graft.ml.NeuralForecaster]]), the
  * suite's #1 executor-CPU item (18.5 s of the bench's 99 s at sf0.1;
  * VERDICT r11 "next round" item 3). Collects the tiny (channel, month,
  * hours) rollup once (64 channels × ≤ 84 months — the same relation the
  * operator shuffles), then times `forecastChannel` per channel OFF
  * Spark, single-threaded, at the bench entry's config (h=32, 40
  * epochs). Prints:
  *
  *  - total + per-model-type kernel time (the optimization target), and
  *  - a golden FNV-1a hash over every output field of every row —
  *    bit-identical kernels produce the same hash, so a rewrite is
  *    checked against the committed value before it goes anywhere near
  *    the operator.
  *
  * Run via: sbt "runMain graft.ForecastKernelProbe [dataDir] [reps]"
  */
object ForecastKernelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val monthly = Tables.orders(spark, dir).join(
        broadcast(Tables.customer(spark, dir).filter(col("c_custkey") <= 64)
          .select(col("c_custkey"), col("c_name").as("channel"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("channel"), to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("dur"))
      .select(col("channel"),
        (year(col("month")) * 12 + month(col("month")) - 1).as("m"),
        (col("dur").cast("double") / 3600d).as("x"))
      .filter(col("channel").isNotNull && col("m").isNotNull && col("x").isNotNull)
      .as[(String, Int, Double)].collect()
    val byChannel = monthly.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (ch, rows) => (ch, rows.toSeq.map(r => (r._2, r._3))) }
    println(s"channels=${byChannel.size} points=${monthly.length}")

    var hash = 0xcbf29ce484222325L
    def mix(x: Long): Unit = { hash ^= x; hash *= 0x100000001b3L }
    var rows = 0
    (1 to reps).foreach { rep =>
      hash = 0xcbf29ce484222325L; rows = 0
      val perType = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val t0 = System.nanoTime()
      byChannel.foreach { case (ch, pts) =>
        val c0 = System.nanoTime()
        val out = graft.ml.NeuralForecaster.forecastChannel(ch, pts, 3, 100, 32, 40)
        perType(out.head.model_type) += System.nanoTime() - c0
        out.foreach { r =>
          rows += 1
          r.channel.foreach(c => mix(c.toLong))
          mix(r.forecast_month.getTime); mix(r.horizon.toLong)
          mix(java.lang.Double.doubleToLongBits(r.forecasted_hours))
          mix(java.lang.Double.doubleToLongBits(r.lower))
          mix(java.lang.Double.doubleToLongBits(r.p25))
          mix(java.lang.Double.doubleToLongBits(r.p75))
          mix(java.lang.Double.doubleToLongBits(r.upper))
          r.model_type.foreach(c => mix(c.toLong))
        }
      }
      val ms = (System.nanoTime() - t0) / 1e6
      val types = perType.toSeq.sortBy(_._1)
        .map { case (t, ns) => f"$t=${ns / 1e6}%.0fms" }.mkString(" ")
      println(f"rep $rep: total=$ms%.1f ms  $types  rows=$rows  hash=${hash}%016x")
    }
    spark.stop()
  }
}
