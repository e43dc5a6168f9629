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

  test("funniestOffsets: offsets match the reference formula per video") {
    val li = Tables.lineitem(spark, sfDir)
    val out = Highlights.funniestOffsets(li, orders, customer).cache()
    assert(out.count() > 0)
    // recompute one video's offset by hand: relative = (end - dur + dur/2)
    //   - last_chat + dur, everything in whole epoch seconds
    val row = out.orderBy("video_id").first()
    val vid = row.getLong(0)
    val o = orders.filter(col("o_orderkey") === vid)
      .select(col("o_totalprice"),
        floor(col("o_orderdate").cast("timestamp").cast("double")).cast("long")).first()
    val dur = math.floor(o.getDouble(0)).toLong
    val endEpoch = o.getLong(1)
    val lastEpoch = li.filter(col("l_orderkey") === vid &&
        col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
      .agg(floor(max("l_shipdate").cast("timestamp").cast("double")).cast("long"))
      .first().getLong(0)
    val expected = endEpoch - dur + dur / 2 - lastEpoch + dur
    assert(row.getLong(3) == expected, s"video $vid offset mismatch")
    // every listed video belongs to the AUTOMOBILE group
    val autoKeys = customer.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val vidChans = out.join(orders, col("video_id") === col("o_orderkey"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(vidChans.subsetOf(autoKeys))
    out.unpersist()
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
