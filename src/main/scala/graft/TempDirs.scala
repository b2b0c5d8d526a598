package graft

/** JVM-lifetime temp-dir registry: sink outputs and written index
  * layouts must outlive the query that produced them (results are read
  * back lazily, stages are memoized per session), so they cannot be
  * deleted inline like landing/checkpoint dirs — but without a
  * reaper, every bench/verify/spec run leaks corpus-sized parquet
  * under /tmp. Registered dirs are deleted on JVM exit. */
object TempDirs {

  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(new java.io.File(d))
      }
    }, "graft-tempdir-reaper"))
  }

  /** Register `dir` for deletion at JVM exit; returns it for chaining. */
  def register(dir: String): String = { dirs.add(dir); dir }
}
