package graft.tools

import java.nio.file.{Files, Path}

/** Scratch directories reclaimed by ONE shared JVM shutdown hook.
  *
  * The self-verifying gate queries each build a throwaway store under a
  * temp dir; registering a fresh shutdown hook per build (the pre-r15
  * idiom, ~20 sites) is harmless at gate counts but is a thread-leak
  * pattern if a gate ever runs per-request — one hook holding a concurrent
  * set is the fixed-cost version.
  */
object TempRoots {

  private val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private val installed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** `Files.createTempDirectory` + registration with the shared reaper. */
  def createTempDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    register(p)
    p
  }

  def register(p: Path): Unit = {
    roots.add(p)
    if (installed.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        roots.forEach(r => rm(r.toFile))
      }))
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
    f.delete()
  }
}
