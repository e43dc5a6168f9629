package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Counts Spark jobs / stages / tasks for benchmark telemetry: every
  * cache/localCheckpoint materialization is its own job, so per-query job
  * counts make "this query regressed because it now runs 3 jobs instead
  * of 1" diagnosable straight from BENCH_rN.json.
  */
final class JobCounter(sc: SparkContext) extends SparkListener {
  private val jobs = new AtomicLong
  private val stages = new AtomicLong
  private val tasks = new AtomicLong

  sc.addSparkListener(this)

  override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()

  /** Drains the listener bus, then returns (jobs, stages, tasks) so far. */
  def snapshot(): (Long, Long, Long) = {
    ListenerBridge.waitUntilEmpty(sc)
    (jobs.get, stages.get, tasks.get)
  }
}
