package graft.streaming

/** Unloads every loaded state-store provider in this JVM.
  *
  * Why this exists: a completed Structured Streaming run leaves its
  * loaded `StateStoreProvider`s cached in the executor JVM (keyed by
  * checkpoint + operator + partition) even after the query terminates
  * and its checkpoint directory is deleted. The background maintenance
  * task then re-snapshots every zombie provider on its ~60 s tick —
  * recreating the deleted /tmp checkpoint dirs and paying provider ×
  * partition I/O — for the rest of the session. On a 26-pipeline bench
  * board that is hundreds of zombies by mid-board, and the tick's cost
  * lands on whichever query happens to be running: the r10 boards
  * measured exactly this signature (15–25 s spikes that MIGRATE between
  * otherwise-identical runs — driver q117 17.2 s vs idle 8.0 s, idle
  * q71 25.5 s vs driver 9.9 s, same commit).
  *
  * On a real cluster the same hygiene applies per-executor when many
  * short-lived streams share long-lived executors; Spark itself unloads
  * providers only when a NEWER run re-claims them elsewhere.
  *
  * `StateStore.unloadAll()` is `private[sql]`, so this goes through
  * reflection (the Scala object's `MODULE$` singleton); the next stream
  * to start simply reloads the providers it needs. Failure is
  * swallowed — a hygiene pass must never break a run.
  */
object StateStoreReaper {
  /** Returns true iff the reflective call resolved and ran — specced,
    * so a Spark upgrade renaming the hook fails a test instead of
    * silently turning the reap into a no-op. */
  def unloadAll(): Boolean =
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val module = cls.getField("MODULE$").get(null)
      cls.getMethod("unloadAll").invoke(module)
      true
    } catch { case _: Throwable => false }
}
