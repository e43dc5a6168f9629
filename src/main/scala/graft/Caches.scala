package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Release seam for operator-internal persisted relations.
  *
  * Several operators persist an intermediate relation because two branches
  * of the same plan consume it (e.g. a unigram model build and the scoring
  * join both reading one pre-count). The persist is correct per-query, but
  * in a long-lived session repeated calls would accumulate corpus-scale
  * pinned relations. Operators therefore route those persists through
  * [[SharedCacheOps.sharedCache]], which registers them here; the harness
  * (Verify / Bench / a user's driver loop) calls [[release]] after the
  * consuming action completes. Caches that an operator releases itself
  * before returning (e.g. k-means training samples) do not register.
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val eagerDone = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, java.lang.Boolean]())

  /** Run a cached relation's materialize-before-fanout barrier (one count
    * job) at most ONCE per [[release]] cycle. Composed queries construct
    * the same cached relation several times (the incremental dedup gates
    * build `shingleArrays(old)` through two entry points); Spark's
    * CacheManager dedupes the STORAGE by canonical plan, but each
    * construction used to re-run its eager count — a redundant job over
    * an already-materialized cache. The memo is keyed by the same
    * canonicalized plan the CacheManager matches on and cleared in
    * [[release]] (the harness drains caches between reps, so the next
    * rep's first barrier runs again and nothing persists across runs).
    * Purely a job-count optimization: a skipped count never changes
    * results — at worst a racing consumer recomputes cache partitions,
    * exactly the pre-barrier behavior.
    */
  def eagerizeOnce(df: DataFrame): Unit =
    if (eagerDone.add(df.queryExecution.analyzed.canonicalized)) df.count(): Unit

  implicit final class SharedCacheOps(private val df: DataFrame) extends AnyVal {
    /** Persist MEMORY_AND_DISK and register for [[Caches.release]]. */
    def sharedCache: DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked.add(p)
      p
    }

    /** [[sharedCache]] + eager materialization (one count job) — the
      * materialize-before-fanout barrier for a cache whose consumers
      * include BROADCAST-EXCHANGE builds. Spark runs broadcast builds as
      * concurrent jobs; on a cold cache they race the main job for the
      * same partitions and every loser blocks on the BlockManager's
      * per-block compute lock ("Asked to cache already cached data"),
      * inflating executor run time 2-10x over cpu time (measured on the
      * unigram/bigram NLL and perplexity-bucket pipelines, whose model
      * thresholds/scalars broadcast off the cached pre-count). NOT the
      * default: a benchmarked suite-wide eager pass burned ~30% more CPU
      * overall (hyperthread contention during the forced all-core
      * materialization burst) and regressed the capped-Jaccard pipeline
      * 3x — eager is a per-site decision for measured broadcast-fanout
      * races, exactly like the explicit counts in Dedup.ngramJaccard and
      * Dedup.shingleArrays.
      */
    def sharedCacheEager: DataFrame = {
      val p = df.sharedCache
      p.count()
      p
    }
  }

  /** Number of currently tracked (not yet released) relations. */
  def trackedCount: Int = tracked.size()

  /** Unpersist every tracked relation (non-blocking) and forget it. Safe to
    * call while other queries build plans: a relation unpersisted here at
    * worst recomputes; results never change.
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
    eagerDone.clear()
  }
}
