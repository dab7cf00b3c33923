package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Overwrite-atomic small-control-file publish, shared by the alias /
 * `_FINALIZED` records ([[BundleInstall]]) and the scoped-overwrite
 * manifest ([[BundleSink.writeMulti]]): rename `tmp` onto `target` with
 * REPLACE semantics, so a concurrent reader always sees either the old or
 * the new content — never a window where the file does not exist (which a
 * plain delete+rename leaves).
 */
private[graft] object FsAtomic {

  /**
   * Atomically replace `target` with `tmp` (both on `fs`). The file
   * scheme gets POSIX rename-replace via NIO `ATOMIC_MOVE`; other schemes
   * use `FileContext.rename(OVERWRITE)`; only a scheme supporting neither
   * (a FileSystem with no AbstractFileSystem binding) falls back to
   * delete+rename — the one non-atomic case.
   *
   * The NIO move bypasses Hadoop's ChecksumFileSystem, so the local
   * scheme also drops the checksum sidecars first: the tmp's `.crc`
   * would be orphaned next to a moved-away file, and a STALE target
   * `.crc` (left by an earlier fs.rename publish, which moved a matching
   * sidecar) would make the next `fs.open` of the replaced file throw
   * ChecksumException over the new bytes.
   */
  def renameReplace(fs: FileSystem, tmp: Path, target: Path): Unit = {
    if (fs.getScheme == "file") {
      fs match {
        case cfs: org.apache.hadoop.fs.ChecksumFileSystem =>
          val raw = cfs.getRawFileSystem
          raw.delete(cfs.getChecksumFile(tmp), false)
          raw.delete(cfs.getChecksumFile(target), false)
          ()
        case _ => ()
      }
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else {
      try {
        org.apache.hadoop.fs.FileContext
          .getFileContext(target.toUri, fs.getConf)
          .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        // UnsupportedFileSystemException: the scheme has a FileSystem but
        // no AbstractFileSystem binding — FileContext can't serve it at
        // all, so the non-atomic fallback is the only option
        case _: UnsupportedOperationException |
             _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          fs.delete(target, false)
          if (!fs.rename(tmp, target))
            throw new IllegalStateException(s"could not publish $target")
      }
    }
  }
}
