package graft.util

import java.nio.file.{Files, Path}

/** Scratch-directory hygiene for the self-contained query entries (streaming /
  * incremental demos) and the bench pipeline: every invocation lands parquet +
  * checkpoints in a fresh temp dir, and without cleanup repeated bench/verify
  * runs leak /tmp. Dirs registered here are removed in ONE shutdown hook
  * (not one hook per dir — a bench run creates hundreds). */
object Scratch {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = registered.iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }, "graft-scratch-cleanup"))
  }

  /** Fresh temp dir, removed on JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Best-effort recursive delete (cleanup must never mask a real failure).
    * Catches NonFatal, not just IOException: Files.walk traversal throws
    * UncheckedIOException (e.g. a dir removed concurrently), and an escape
    * inside the single shutdown hook would abort cleanup of every remaining
    * registered dir. */
  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
