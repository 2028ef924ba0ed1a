ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "abigdatalambdaarchitectureforrealtimestockpriceforecastingusingfinancialnewsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Sources carry UTF-8 literals (non-ASCII grading fixtures); the
// container locale is POSIX, so JDK 17's scalac would otherwise decode
// them as ASCII and mangle every multi-byte literal.
ThisBuild / scalacOptions ++= Seq("-encoding", "UTF-8")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes straight through (no "[info] " logger
// prefix): graft.Bench's single JSON line must be machine-parseable
// from stdout; Spark's own logs go to stderr.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Local-FS I/O for the file:// scheme (set before any FileSystem is
  // cached, which a runtime conf.set can be too late for):
  //  - FastLocalFileSystem (graft.sources) is LocalFileSystem with the
  //    client-side checksum layer off — the default writes + re-reads a
  //    .crc sidecar for every file, doubling small-file IO on every
  //    store commit and verifying checksums on every read. It must be a
  //    LocalFileSystem subclass (not RawLocalFileSystem) because
  //    FileSystem.getLocal hard-casts (RocksDB state-store checkpoints
  //    call it). Integrity-only, results identical; on a cluster the
  //    data lives on HDFS/S3 whose own integrity machinery applies.
  //  - File-output committer v2 renames task output directly into the
  //    destination at task commit instead of a second sequential
  //    driver-side rename pass at job commit (one rename per file saved
  //    per write job; the engine's own atomicity comes from the
  //    SnapshotStore manifest link(2) publish, not from job-commit
  //    atomicity, so v2's weaker failure story costs nothing here).
  "-Dspark.hadoop.fs.file.impl=graft.sources.FastLocalFileSystem",
  "-Dspark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
)
// managed-table warehouse for bucketing tests (static conf — must be
// set before the shared test SparkContext starts)
Test / javaOptions += "-Dspark.sql.warehouse.dir=/tmp/graft_test_warehouse"
