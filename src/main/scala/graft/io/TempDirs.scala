package graft.io

import java.nio.file.{Files, Path}

/** Temp directories for query sinks/fixtures, deleted on JVM exit —
  * Bench runs every sink query twice per round and Verify once more;
  * without cleanup each invocation would strand a dataset copy in /tmp
  * until the disk fills across rounds.
  */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.forEach { d =>
      try
        Files.walk(d).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.delete(p) catch { case _: Exception => () })
      catch { case _: Exception => () }
    }
  }))

  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
