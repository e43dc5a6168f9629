package graft

import org.apache.spark.sql.functions._
import graft.operators._

class StreamingHoursSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sfDir)
  private def customer = Tables.customer(spark, sfDir)

  test("total hours: sum over all channel-months equals global sum") {
    val t = StreamingHours.total(orders, customer)
    val total = t.agg(sum("hours")).first().getDouble(0)
    val global = orders.agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .first().getDecimal(0).doubleValue() / 3600d
    assert(math.abs(total - global) < 1.0) // floor-rounding slack
  }

  test("avg <= max per channel-month") {
    val a = StreamingHours.avg(orders, customer).withColumnRenamed("hours", "avg_h")
    val m = StreamingHours.max(orders, customer).withColumnRenamed("hours", "max_h")
    val joined = a.join(m, Seq("channel", "channel_group", "month"))
    assert(joined.filter(col("avg_h") > col("max_h") + 0.001).count() === 0)
  }

  test("hoursDiff: change equals hours when no previous month") {
    val d = StreamingHours.hoursDiff(orders, customer)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("channel")
    val first = d.withColumn("min_m", min("month").over(w))
      .filter(col("month") === col("min_m"))
    assert(first.filter(abs(col("change") - col("hours")) > 0.001).count() === 0)
  }

  test("broadcast join: customer dim does not shuffle") {
    val plan = StreamingHours.total(orders, customer)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
