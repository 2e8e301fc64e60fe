package graft.sources

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.util

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** The stock local filesystem with the subprocess chmod removed.
  *
  * Hadoop's `RawLocalFileSystem` sets permissions on EVERY created file
  * (data file, its .crc sidecar, every committer temp/manifest/
  * properties write). With the native hadoop library unavailable — this
  * environment, and any stock JVM-only deployment — that call falls
  * back to `Shell.execCommand("chmod", ...)`: one forked subprocess per
  * created file. jstack sampling of the commit path (r17 ledger) put
  * ~25-30% of a zero-data CREATE TABLE commit inside those forks.
  *
  * `Files.setPosixFilePermissions` is the same syscall-level operation
  * through the JDK — bit-identical resulting permissions, no fork. This
  * is exactly what Hadoop's own NativeIO fast path does when the native
  * library IS present; registering it costs one config line
  * (`fs.file.impl`) and changes no on-disk artifact. Falls back to the
  * shell path on any filesystem that refuses POSIX views. */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem) {
  /** Rename REFUSES an existing destination file — the semantics the
    * engine's atomic commit point (manifest publish, tag creation)
    * relies on, and what the previously-registered local FS on this
    * classpath (hive's ProxyLocalFileSystem) provided. Bare POSIX
    * renameTo would silently overwrite the winner's manifest. Same
    * check-then-rename window as the hive impl — no atomicity
    * regression vs what the engine ran on before. */
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (isFile(dst)) false else super.rename(src, dst)
}

class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits: Int = permission.toShort.toInt
    // sticky/setuid/setgid bits can't ride Files.setPosixFilePermissions
    // — defer those (never produced by the engine) to the shell path
    if ((bits & ~0x1ff) != 0) { super.setPermission(p, permission); return }
    try {
      val perms = util.EnumSet.noneOf(classOf[PosixFilePermission])
      // PosixFilePermission.values() is OWNER_READ..OTHERS_EXECUTE,
      // matching the rwxrwxrwx bit order from bit 8 down to bit 0
      val all = PosixFilePermission.values()
      var i = 0
      while (i < 9) {
        if ((bits & (1 << (8 - i))) != 0) perms.add(all(i))
        i += 1
      }
      Files.setPosixFilePermissions(pathToFile(p).toPath, perms)
      ()
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        super.setPermission(p, permission)
    }
  }
}
