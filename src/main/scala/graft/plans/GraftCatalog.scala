package graft.plans

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The DURABLE half of [[GraftTableRegistry]]: `CREATE TABLE … USING
  * graft` publishes a v1 on disk, but a name→(root, view, key) binding
  * that lives only in a process-global map dies with the JVM — a
  * restarted session could not SELECT/DML/SHOW yesterday's tables
  * without hand-replaying every `CREATE TABLE IF NOT EXISTS … LOCATION`.
  * This persists the bindings as an atomically-published catalog file
  * under the store root (the role a real catalog's metastore plays),
  * with the SAME link(2) discipline as the store's manifests:
  *
  *  - the catalog lives at `<root>/_catalog/c<version>.tsv`, one line
  *    per binding (`name TAB root TAB view TAB key TAB clusterCols` —
  *    names/paths contain no tabs or newlines by construction);
  *  - every mutation reads the latest catalog version, applies the
  *    upsert/remove, and publishes the FULL map as the next version via
  *    exclusive hard-link creation — two racing writers produce one
  *    winner and one retry (re-read + re-apply; both operations are
  *    idempotent), never a torn or half-written catalog;
  *  - readers resolve the latest version once per load — a concurrent
  *    publish cannot tear the read.
  *
  * The catalog is O(tables) metadata — it never references data, so it
  * needs no vacuum; superseded versions are tiny and pruned at publish
  * (keep the last [[Keep]]). [[GraftTableRegistry]] loads from it
  * lazily at first in-memory miss, keyed off the session's
  * `spark.graft.store.root` conf (the managed-location role the CREATE
  * path already gives that conf).
  */
object GraftCatalog {

  /** One durable binding: the table name, the ABSOLUTE store root the
    * view lives under (which may be a per-table LOCATION, not the
    * catalog root), the store view, the optional row-identity key, the
    * optional DDL-declared cluster columns, and the CHECK constraints
    * (name → expression SQL). Constraint expressions are arbitrary SQL
    * text, so they persist base64-encoded (`name:b64,…` — names are
    * `\w+` and the base64 alphabet holds no `:`/`,`, so the field
    * splits unambiguously); a 5-field line from a pre-constraint
    * catalog parses with no constraints, so old catalogs keep loading.
    */
  final case class Binding(name: String, root: String, view: String,
                           key: Option[String], cluster: Seq[String],
                           checks: Seq[(String, String)] = Nil,
                           props: Map[String, String] = Map.empty)

  private def renderChecks(cs: Seq[(String, String)]): String =
    cs.map { case (n, e) =>
      n + ":" + java.util.Base64.getEncoder.encodeToString(
        e.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.mkString(",")

  /** Binding PROPERTIES (field 7) use the same `key:b64(value),…`
    * encoding as the constraints field — keys are `[\w.]+` (no `:` or
    * `,`), values arbitrary text. A 6-field line from a pre-props
    * catalog parses with no props, so old catalogs keep loading. The
    * materialized-view tier stores its definition here (`mv.sql`,
    * `mv.source`, `mv.synced`, `mv.mode`); rendering sorts by key so
    * the catalog file is deterministic for a given binding.
    */
  private def renderProps(ps: Map[String, String]): String =
    ps.toSeq.sortBy(_._1).map { case (k, v) =>
      k + ":" + java.util.Base64.getEncoder.encodeToString(
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }.mkString(",")

  private def parseChecks(s: String): Seq[(String, String)] =
    s.split(",").toSeq.filter(_.nonEmpty).map { t =>
      val Array(n, b) = t.split(":", 2)
      n -> new String(java.util.Base64.getDecoder.decode(b),
        java.nio.charset.StandardCharsets.UTF_8)
    }

  private val Keep = 4 // retained catalog versions (tiny files)

  private def catDir(catRoot: String): Path =
    Paths.get(catRoot).resolve("_catalog")

  private def catPath(catRoot: String, v: Long): Path =
    catDir(catRoot).resolve(f"c$v%06d.tsv")

  private def versions(catRoot: String): Seq[Long] = {
    val dir = catDir(catRoot)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("c") && n.endsWith(".tsv") =>
          n.stripPrefix("c").stripSuffix(".tsv").toLong }
        .toSeq.sorted
      finally s.close()
    }
  }

  // latest-version-checked read cache: registry lookups consult the
  // catalog on EVERY in-memory miss (per statement-claim guard, per
  // analyzer iteration), so the common no-change case must cost one
  // directory listing, not a file read — the listing detects a
  // concurrent publish and refreshes
  private val loadCache = scala.collection.concurrent.TrieMap
    .empty[String, ((Long, Long), Map[String, Binding])]

  /** All bindings in the latest catalog version (empty when no catalog
    * exists yet). One directory listing + one stat; the file is re-read
    * only when the latest (version, mtime) pair changed — the mtime
    * half catches a catalog dir deleted and RECREATED at the same
    * version number, which a version-only key would serve stale.
    */
  def load(catRoot: String): Map[String, Binding] =
    versions(catRoot).lastOption.map { v =>
      val p = catPath(catRoot, v)
      val stamp = (v, Files.getLastModifiedTime(p).toMillis)
      loadCache.get(catRoot).filter(_._1 == stamp).map(_._2).getOrElse {
        val m = Files.readString(p).split("\n")
          .filter(_.nonEmpty).map { line =>
            val f = line.split("\t", -1)
            f(0) -> Binding(f(0), f(1), f(2),
              Some(f(3)).filter(_.nonEmpty),
              f(4).split(",").toSeq.filter(_.nonEmpty),
              if (f.length > 5) parseChecks(f(5)) else Nil,
              if (f.length > 6) parseChecks(f(6)).toMap else Map.empty)
          }.toMap
        loadCache.update(catRoot, (stamp, m))
        m
      }
    }.getOrElse(Map.empty)

  private def render(m: Map[String, Binding]): String =
    m.values.toSeq.sortBy(_.name).map { b =>
      Seq(b.name, b.root, b.view, b.key.getOrElse(""),
        b.cluster.mkString(","), renderChecks(b.checks),
        renderProps(b.props)).mkString("\t")
    }.mkString("\n")

  /** Read-modify-publish with the manifest OCC loop: link(2) fails on
    * an existing target, so a lost race re-reads and re-applies (both
    * mutations are idempotent). Bounded attempts — catalog contention
    * is human-scale, not a hot loop.
    */
  private def mutate(catRoot: String)(
      f: Map[String, Binding] => Map[String, Binding]): Unit = {
    var attempts = 0
    while (true) {
      val base = versions(catRoot).lastOption.getOrElse(0L)
      val cur = load(catRoot)
      val updated = f(cur)
      if (updated == cur) return // no-op mutations publish nothing
      Files.createDirectories(catDir(catRoot))
      val tmp = Files.createTempFile(catDir(catRoot), ".cat", ".tmp")
      Files.writeString(tmp, render(updated))
      try {
        Files.createLink(catPath(catRoot, base + 1), tmp)
        // prune superseded versions (best effort — a concurrent reader
        // of a just-pruned version re-lists and finds the newer one)
        versions(catRoot).dropRight(Keep).foreach(v =>
          Files.deleteIfExists(catPath(catRoot, v)))
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempts += 1
          if (attempts > 16) throw new IllegalStateException(
            s"catalog at $catRoot: lost ${attempts} publish races")
      } finally Files.deleteIfExists(tmp)
    }
  }

  def upsert(catRoot: String, b: Binding): Unit =
    mutate(catRoot)(_ + (b.name -> b))

  def remove(catRoot: String, name: String): Unit =
    mutate(catRoot)(_ - name)
}
