package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.LocalFileSystem

/** `file://` filesystem with the client-side checksum layer OFF.
  *
  * Hadoop's default LocalFileSystem writes a `.crc` sidecar for every
  * file and re-reads it (verifying) on every open — pure overhead for a
  * local engine whose durability story is the SnapshotStore manifest
  * (and, on a cluster, the remote store's own integrity machinery).
  * Binding `fs.file.impl` straight to RawLocalFileSystem is NOT viable:
  * `FileSystem.getLocal` hard-casts the `file://` instance to
  * `LocalFileSystem` (RocksDB state-store checkpoints call it via
  * `copyFromLocalFile`), so the impl must BE a LocalFileSystem. This
  * subclass is one: same rename/delete/list semantics, checksum write
  * and verify disabled at initialize.
  *
  * Wired in build.sbt (`-Dspark.hadoop.fs.file.impl=...`) so every
  * forked entry point (Bench, Verify, tests) sees it before the
  * process-wide FileSystem cache first resolves `file://`.
  */
class FastLocalFileSystem extends LocalFileSystem {
  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
