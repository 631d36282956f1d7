package graft

/** Process-private registry of temp directories the sink round-trip
  * queries create per plan build (PDF gate, CSV/ORC/JSONL round trips,
  * compaction, zorder, store lifecycle). The sink bench lane must
  * delete them between passes — 5 runs per query would otherwise leave
  * 5 corpus-sized copies each — but a prefix+mtime scan over the
  * SHARED java.io.tmpdir deletes other graft JVMs' live dirs too (an
  * sbt test run's lake roots, a concurrent Verify's gate copies).
  * Registering each created path here scopes the sweep to exactly what
  * THIS process created.
  */
object TmpDirs {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** `Files.createTempDirectory(prefix)` + register for [[sweepCreated]]. */
  def create(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Delete every dir this JVM registered via [[create]] and forget it.
    * Outside the sink lane nothing drains the queue — that costs one
    * Path reference per plan build, not the disk (each query's sink
    * overwrites its own dir only in mode("overwrite") cases; the lane
    * is the only repeated-build context).
    */
  def sweepCreated(): Unit = {
    var p = created.poll()
    while (p != null) {
      deleteRecursively(p.toFile)
      p = created.poll()
    }
  }
}
