package graft.operators

import java.lang.ref.WeakReference

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared materialized-stage memoization (the q53→q54 / q77→q78 / q79
  * staging idiom): compute an expensive intermediate once per
  * (SparkSession, key) and let composed queries reuse it, the way a
  * real pipeline stages its intermediates.
  *
  * Sessions are matched by IDENTITY through a WeakReference — a hit
  * from a different session that merely collided on hashCode recomputes
  * instead of returning a DataFrame bound to a stopped session. (A
  * WeakHashMap would not help here: the cached DataFrame strongly
  * references its session, which would pin the weak key forever.)
  * Every put also SWEEPS entries whose session reference has been
  * cleared — without that, an entry whose exact (hash, key) slot is
  * never touched again would strongly hold its cached DataFrame (and
  * through it the stopped session) for the life of the JVM: unbounded
  * retention in long-lived drivers that churn sessions. The map is
  * small (a handful of stages per live session), so the sweep is a
  * cheap linear scan. */
private[graft] object StageCache {

  private final case class Entry[T](session: WeakReference[SparkSession], value: T)
  private val cache = scala.collection.concurrent.TrieMap.empty[(Int, String), Entry[Any]]

  private def memo[T](s: SparkSession, key: String)(f: => T): T = synchronized {
    val k = (System.identityHashCode(s), key)
    cache.get(k) match {
      case Some(e) if e.session.get != null && (e.session.get eq s) =>
        e.value.asInstanceOf[T]
      case _ =>
        val v = f
        cache.filterInPlace((_, e) => e.session.get != null)
        cache.put(k, Entry(new WeakReference(s), v))
        v
    }
  }

  /** Live entry count — lets specs assert the sweep actually evicts. */
  private[operators] def size: Int = cache.size

  def getOrCompute(s: SparkSession, key: String)(f: => DataFrame): DataFrame =
    memo(s, key)(f)

  /** Memoize a materialized DIRECTORY (e.g. a written index layout) per
    * (session, key) — the ingest-once accounting for write-path ops. */
  def dirFor(s: SparkSession, key: String)(f: => String): String = memo(s, key)(f)

  /** Memoize a driver-side VALUE (e.g. a learned merge list) per
    * (session, key) — same ingest-once accounting for model-sized
    * results that queries compose on. */
  def valueFor[T](s: SparkSession, key: String)(f: => T): T = memo(s, key)(f)
}
