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

  implicit final class SharedCacheOps(private val df: DataFrame) extends AnyVal {
    /** Persist MEMORY_AND_DISK and register for [[Caches.release]]. */
    def sharedCache: DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked.add(p)
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
  }
}
