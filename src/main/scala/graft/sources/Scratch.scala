package graft.sources

/** Process-scoped scratch directories for graded queries that
  * materialize state (bucketed layouts, view stores, exports,
  * streaming checkpoints).
  *
  * Two rules, learned the hard way:
  *  - scope paths by PID: a content-keyed path shared across processes
  *    races when the harness runs bench and correctness concurrently —
  *    one JVM overwrites or deletes the layout another is reading
  *    (or, for streaming checkpoints, two queries contend on the same
  *    offset log);
  *  - clean up only SIBLING dirs that are provably stale (same prefix,
  *    different PID, untouched for an hour) — never anything a live
  *    process might own.
  */
object Scratch {

  private val pid = ProcessHandle.current().pid()

  /** A /tmp dir unique to (prefix, input dir, this process); creates it
    * and garbage-collects stale siblings from dead runs.
    */
  def processScoped(prefix: String, inputDir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(inputDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val root = new java.io.File(s"/tmp/graft_scratch")
    val mine = new java.io.File(root, s"${prefix}_${key}_$pid")
    val staleBefore = System.currentTimeMillis() - 60L * 60 * 1000
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"${prefix}_") &&
        !f.getName.endsWith(s"_$pid") && f.lastModified() < staleBefore)
      .foreach(deleteRecursively)
    mine.mkdirs()
    mine.getAbsolutePath
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
