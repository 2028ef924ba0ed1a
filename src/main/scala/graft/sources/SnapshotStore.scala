package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot-isolated parquet tables — the missing ACID half of
  * [[ViewStore]] (which is plain parquet + dynamic partition overwrite:
  * correct for a single writer, but a reader listing the directory
  * mid-rewrite sees a torn view). The design is the manifest pattern
  * every log-structured table format uses (Delta/Iceberg shape, reduced
  * to its Spark-expressible core — no external service, no locks):
  *
  *  - data files are IMMUTABLE: each commit writes a fresh
  *    `data/b<version>/` parquet directory and never touches prior ones;
  *  - a commit is ONE atomic exclusive hard-link publish of a manifest
  *    file `_manifests/v<version>.json` listing exactly the data dirs
  *    that make up the snapshot (overwrite ⇒ just the new dir, append ⇒
  *    predecessor's list + the new dir);
  *  - readers resolve the latest manifest ONCE and read only the dirs it
  *    names — a concurrent commit cannot tear the read (its files are
  *    invisible until its manifest lands, and old files are never
  *    deleted by commits);
  *  - writers are optimistic: the publish target embeds the expected
  *    next version, so two writers racing from the same base version
  *    produce one winner and one [[SnapshotConflict]] (link(2) fails on
  *    an existing target — rename would silently replace it) —
  *    retry-able, exactly the OCC contract table formats give;
  *  - [[vacuum]] deletes only data dirs no retained manifest references.
  *
  * At 100 TB the manifest lists file paths, not row data — commits and
  * time travel stay O(files), and reads plan partition pruning from the
  * manifest's dir list exactly like any multi-dir parquet scan.
  */
class SnapshotStore(spark: SparkSession, root: String) {

  final class SnapshotConflict(msg: String) extends RuntimeException(msg)

  private def viewRoot(view: String) = Paths.get(root, view)
  private def manifestDir(view: String) = viewRoot(view).resolve("_manifests")

  private def manifestPath(view: String, v: Long): Path =
    manifestDir(view).resolve(f"v$v%06d.json")

  /** Committed versions, ascending (empty for a new view). */
  def versions(view: String): Seq[Long] = {
    val dir = manifestDir(view)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  private def readManifest(view: String, v: Long): Seq[String] = {
    val txt = Files.readString(manifestPath(view, v))
    // manifest = one data-dir name per line inside a JSON array of
    // strings (names contain no quotes/escapes by construction)
    txt.split("[\\[\\],]").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }

  /** Commit `df` as the next version. `overwrite = true` replaces the
    * table contents; `false` appends to the predecessor snapshot.
    * Returns the committed version. Throws [[SnapshotConflict]] if
    * `expectedBase` is stale (another writer advanced the table since
    * this writer read it) or if the manifest rename loses the race for
    * the same next version — either way the caller re-reads and
    * retries, the standard optimistic-concurrency contract.
    */
  def commit(view: String, df: DataFrame, overwrite: Boolean,
             expectedBase: Option[Long] = None): Long = {
    val vs = versions(view)
    val base = if (vs.isEmpty) 0L else vs.max
    expectedBase.filter(_ != base).foreach { e =>
      throw new SnapshotConflict(s"$view: expected base v$e but table is at v$base")
    }
    val next = base + 1
    // data dir is unique PER ATTEMPT, not per version: two writers
    // racing to the same next version must never address the same dir
    // (the loser's write would clobber files the winner's manifest just
    // committed). A losing attempt leaves an orphan dir no manifest
    // references — exactly what vacuum() collects.
    val dataDir = s"b$next-" + java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("overwrite")
      .parquet(viewRoot(view).resolve("data").resolve(dataDir).toString)
    val dirs =
      if (overwrite || vs.isEmpty) Seq(dataDir)
      else readManifest(view, base) :+ dataDir
    Files.createDirectories(manifestDir(view))
    val tmp = Files.createTempFile(manifestDir(view), s".v$next", ".tmp")
    Files.writeString(tmp, dirs.map(d => "\"" + d + "\"").mkString("[", ",", "]"))
    try
      // hard-link creation is the exclusive-publish primitive: link(2)
      // fails with EEXIST if the target exists — unlike rename(2)
      // (ATOMIC_MOVE), which on POSIX silently REPLACES the target and
      // would let a racing commit overwrite the winner's manifest (found
      // by the hammered-appends spec). The manifest appears atomically
      // with its full content; first committer wins, the loser throws.
      Files.createLink(manifestPath(view, next), tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new SnapshotConflict(s"$view: version $next already committed")
    }
    finally Files.deleteIfExists(tmp)
    next
  }

  /** Read a snapshot: the latest by default, or AS OF `asOf`. The
    * manifest is resolved once here — commits that land afterwards
    * cannot change what this DataFrame reads.
    */
  def read(view: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(view)
    require(vs.nonEmpty, s"$view: no committed snapshot")
    val v = asOf.getOrElse(vs.max)
    require(vs.contains(v), s"$view: no snapshot v$v (have $vs)")
    val dirs = readManifest(view, v)
      .map(d => viewRoot(view).resolve("data").resolve(d).toString)
    spark.read.parquet(dirs: _*)
  }

  /** OPTIMIZE: rewrite the current snapshot into ~`targetFileBytes`
    * files and commit the result as a new version — the small-file
    * compaction every log-structured table needs once append commits
    * accumulate (each append = at least one new file; a thousand
    * micro-batch appends = a thousand tiny files and a planner that
    * spends longer listing than reading).
    *
    * The rewrite plans `ceil(current bytes / targetFileBytes)` output
    * files via `coalesce` (partition merge — no shuffle; compaction is
    * IO-bound, re-hashing rows would double the cost). It commits with
    * `expectedBase` pinned, so a concurrent writer landing mid-compact
    * surfaces as a [[SnapshotConflict]] instead of silently dropping
    * that writer's rows — rewriting data another commit superseded is
    * exactly the lost-update race OCC exists to catch. Readers are
    * never torn: old versions stay readable (time travel), and
    * [[vacuum]] collects the superseded small files later.
    *
    * @return the new compacted version
    */
  def compact(view: String, targetFileBytes: Long = 128L << 20): Long = {
    val vs = versions(view)
    require(vs.nonEmpty, s"$view: nothing to compact")
    val base = vs.max
    val dataRoot = viewRoot(view).resolve("data")
    val bytes = readManifest(view, base)
      .map(dataRoot.resolve)
      .flatMap(d => Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")))
      .map(Files.size).sum
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    commit(view, read(view, Some(base)).coalesce(nFiles),
      overwrite = true, expectedBase = Some(base))
  }

  /** Delete data dirs referenced by NO manifest among the newest
    * `retainVersions` (and drop the older manifests): the GC that makes
    * immutable-file commits sustainable. Never touches a dir a retained
    * snapshot can still read.
    */
  def vacuum(view: String, retainVersions: Int = 1): Unit = {
    val vs = versions(view)
    val keep = vs.takeRight(retainVersions)
    val live = keep.flatMap(readManifest(view, _)).toSet
    val dataRoot = viewRoot(view).resolve("data")
    if (Files.isDirectory(dataRoot))
      Files.list(dataRoot).iterator().asScala.toSeq
        .filterNot(p => live.contains(p.getFileName.toString))
        .foreach(p => Scratch.deleteRecursively(p.toFile))
    vs.dropRight(retainVersions).foreach(v => Files.deleteIfExists(manifestPath(view, v)))
  }
}
