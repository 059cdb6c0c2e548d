package graft.util

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardOpenOption}

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE single-object arbitration primitive the whole commit protocol
  * rides: atomically create `path` with `bytes` iff it does not
  * already exist. Exactly one of N racing writers succeeds; every
  * loser gets a [[org.apache.hadoop.fs.FileAlreadyExistsException]]
  * (an `IOException`, so existing conflict mapping at the call sites
  * is unchanged).
  *
  * Why this exists: Hadoop's `RawLocalFileSystem.create(path,
  * overwrite = false)` is CHECK-THEN-CREATE — an `exists()` probe
  * followed by a plain open — so on `file:` two threads can both pass
  * the probe, both "win" the same version number, and the second
  * truncates the first's content (observed as the catalog-race
  * property flake). Per scheme:
  *
  *  - `file:` — write the full content to a same-directory temp file
  *    (fsync'd), then `link(2)` it to the final name via
  *    `Files.createLink`, which the kernel makes atomic-exclusive
  *    (EEXIST if present). Readers therefore NEVER observe a partial
  *    object, and arbitration is a single atomic syscall. The parent
  *    directory is fsync'd best-effort so the name itself is durable.
  *    Filesystems without hard links fall back to `CREATE_NEW`
  *    (O_CREAT|O_EXCL) — still atomic arbitration; content atomicity
  *    then matches HDFS semantics below.
  *  - `hdfs:` (and other Hadoop FSes with real namenode-arbitrated
  *    creates) — `fs.create(path, overwrite = false)`, which IS atomic
  *    there; content becomes visible at close.
  *  - object stores — same call; the FileSystem adapter is expected to
  *    map it to a conditional PUT (`If-None-Match: *`), the documented
  *    S3/GCS/ABFS contract for exactly this arbitration.
  */
object AtomicPut {

  def putIfAbsent(fs: FileSystem, path: Path, body: String): Unit =
    putIfAbsent(fs, path, body.getBytes(StandardCharsets.UTF_8))

  def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit =
    if (fs.getScheme == "file") putIfAbsentLocal(fs, path, bytes)
    else {
      val out = fs.create(path, false) // atomic at the namenode / store
      try out.write(bytes) finally out.close()
    }

  private def putIfAbsentLocal(fs: FileSystem, path: Path,
      bytes: Array[Byte]): Unit = {
    val target = Paths.get(path.toUri.getPath)
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = dir.resolve(
      s".${target.getFileName}.put-${java.util.UUID.randomUUID()}")
    try {
      val ch = java.nio.channels.FileChannel.open(tmp,
        StandardOpenOption.WRITE, StandardOpenOption.CREATE_NEW)
      try {
        val buf = java.nio.ByteBuffer.wrap(bytes)
        while (buf.hasRemaining) ch.write(buf)
        ch.force(true) // content durable BEFORE the name appears
      } finally ch.close()
      try Files.createLink(target, tmp) // link(2): atomic, EEXIST if present
      catch {
        case _: UnsupportedOperationException =>
          // no-hardlink filesystem: O_CREAT|O_EXCL still arbitrates
          // atomically; content visibility reverts to write-then-close
          val c2 = java.nio.channels.FileChannel.open(target,
            StandardOpenOption.WRITE, StandardOpenOption.CREATE_NEW)
          try {
            val buf = java.nio.ByteBuffer.wrap(bytes)
            while (buf.hasRemaining) c2.write(buf)
            c2.force(true)
          } finally c2.close()
      }
      fsyncDir(dir)
    } catch {
      case e: FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"$path already exists: ${e.getMessage}")
    } finally Files.deleteIfExists(tmp)
  }

  /** fsync the directory so the new NAME survives a crash; best-effort
    * (not all JVMs/filesystems allow opening a directory). */
  private def fsyncDir(dir: java.nio.file.Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(dir,
        StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () }
}
