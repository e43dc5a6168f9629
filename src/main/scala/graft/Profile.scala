package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry.queries (args = query names;
  * no args = all), 2 runs each after a table warmup, same session config
  * as Bench. Prints per-run seconds so cache effects are visible.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 50 * 1024 * 1024)
      // mirror Bench's session (see Bench.scala for the measurements)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_XCONF=k=v;k=v — A/B harness for confs (applied at session
    // build so STATIC confs work too; profiling aid only — Bench/Verify
    // never read it)
    sys.env.get("SPARK_GRAFT_XCONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) =>
          builder.config(k, v)
          System.err.println(s"[profile] conf $k=$v")
        case _ =>
          System.err.println(s"[profile] ignoring malformed XCONF token '$kv' (want key=value)")
      }
    })
    val spark = builder.getOrCreate()
    // SPARK_GRAFT_LOG=WARN surfaces scheduler warnings (e.g. "broadcasting
    // large task binary") interleaved with the stage detail for attribution
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "ERROR"))
    // SPARK_GRAFT_STACKDUMP=periodSec — periodic all-thread stack dump to
    // stderr (attribution aid for run>>cpu stalls; jstack attach is blocked
    // in this sandbox). Daemon thread; profiling aid only.
    sys.env.get("SPARK_GRAFT_STACKDUMP").map(_.toLong).foreach { period =>
      val t = new Thread(() => {
        while (true) {
          Thread.sleep(period * 1000)
          val sb = new StringBuilder(s"==== stackdump @${System.nanoTime() / 1000000000L} ====\n")
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (th, frames) =>
            if (th.getName.contains("Executor task launch") || th.getName.contains("broadcast")) {
              sb.append(s"-- ${th.getName} [${th.getState}]\n")
              frames.take(14).foreach(f => sb.append(s"   $f\n"))
            }
          }
          System.err.println(sb.toString)
        }
      })
      t.setDaemon(true)
      t.start()
    }
    Seq("orders", "customer", "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }
    try Tables.events(spark, sfDir).count() catch { case _: Throwable => }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val counter = new JobCounter(spark.sparkContext)
    // SPARK_GRAFT_STAGE_DETAIL=1: per-stage task counts, to see where a
    // query's task volume (contended-host idle exposure) concentrates
    if (sys.env.contains("SPARK_GRAFT_STAGE_DETAIL")) {
      val taskCpu = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            taskCpu.computeIfAbsent(te.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
              .add(te.taskMetrics.executorCpuTime / 1000000L)
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          val (run, cpu) = if (m == null) (0L, 0L)
            else (m.executorRunTime, m.executorCpuTime / 1000000L)
          // per-task cpu spread separates data volume (few heavy tasks or
          // even spread that scales with rows) from fixed per-task cost
          // (uniform floor regardless of rows)
          val q = taskCpu.remove(sc.stageInfo.stageId)
          val spread = if (q == null) "" else {
            import scala.jdk.CollectionConverters._
            val ds = q.asScala.toArray.sorted
            if (ds.isEmpty) "" else f" taskcpu[min=${ds.head} med=${ds(ds.length / 2)} max=${ds.last}]"
          }
          println(f"  stage ${sc.stageInfo.stageId}%4d tasks=${sc.stageInfo.numTasks}%4d " +
            f"run=${run}%6dms cpu=${cpu}%6dms" + spread + " " +
            sc.stageInfo.name.linesIterator.next().take(70))
        }
      })
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to 2).map { _ =>
        Caches.release() // drain operator-pinned relations, as Bench does
        spark.catalog.clearCache()
        val before = counter.snapshot()
        val t0 = System.nanoTime()
        // full materialization, not count() — see Actions.materialize
        Actions.materialize(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        val d = counter.snapshot() - before
        (sec, d)
      }
      val cells = runs.map { case (t, d) =>
        f"$t%.3f (${d.jobs}j/${d.stages}s/${d.tasks}t cpu=${d.cpuMs}ms run=${d.runMs}ms)" }
      println(f"PROFILE $name%-28s ${cells.mkString("  ")}")
    }
    spark.stop()
  }
}
