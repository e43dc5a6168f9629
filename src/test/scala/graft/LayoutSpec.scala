package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventSemantics, Layout}

/** Pins the bucketing co-location claim (SURVEY §4 / SCALING.md): a join
  * between two tables bucketed on the join key must be exchange-free,
  * while the same join on unbucketed relations shuffles both sides.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed-by-key join is exchange-free; unbucketed join shuffles") {
    val act = EventSemantics.userWeeklyActivity(Tables.events(spark, sfDir))
    Layout.writeBucketed(act, "act_bucketed_a", "user_id", 4)
    Layout.writeBucketed(act.select(col("user_id"), col("messages").as("m2")),
      "act_bucketed_b", "user_id", 4)

    // disable broadcast so the join strategy decision is about partitioning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("act_bucketed_a")
        .join(spark.table("act_bucketed_b"), "user_id")
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$bucketedPlan")
      assert(bucketed.count() > 0)

      val plain = act.as("a").join(act.as("b"), "user_id")
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        "control: the unbucketed join is expected to shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (50 * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS act_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS act_bucketed_b")
    }
  }
}
