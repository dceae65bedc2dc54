package graft.sources

import java.io.FileNotFoundException
import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** A second Hadoop FileSystem scheme (`graftfs:///`) with object-store
  * semantics, for proving the lake's storage layer never assumes POSIX or
  * touches `java.io` paths directly (reference runs its suite against a
  * real S3 backend — test/configs/minio.json, test/sql/cloud/).
  *
  * Backed by the local filesystem (the path component maps 1:1 to a local
  * absolute path) but with the two local-FS conveniences an object store
  * does NOT give you removed:
  *
  *   - `rename` onto an existing destination FAILS (returns false) like
  *     HDFS/S3 "no silent overwrite", instead of POSIX's atomic replace;
  *   - `append` is unsupported.
  *
  * Any code that bypasses the FileSystem API (java.io.File, nio Paths) on
  * a lake data path breaks immediately under this scheme because
  * `graftfs:///x` is not a valid local path — which is exactly the test.
  *
  * Registered via META-INF/services/org.apache.hadoop.fs.FileSystem, so a
  * bare `new Configuration()` on any executor resolves the scheme with no
  * session-specific wiring (the same mechanism s3a uses).
  */
final class GraftFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "graftfs"

  override def getUri: URI = URI.create("graftfs:///")

  /** No silent overwrite: HDFS/object-store rename contract — renaming
    * onto an existing FILE fails. Renaming into an existing DIRECTORY
    * (src moves inside it) is part of the standard contract both HDFS
    * and S3A honor, so it delegates. */
  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst) && getFileStatus(dst).isFile) false
    else super.rename(src, dst)

  /** object stores cannot append */
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream =
    throw new UnsupportedOperationException(
      "graftfs:// does not support append (object-store semantics)")

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus lazily loads
  // permissions with `new java.io.File(path.toUri)`, which only accepts
  // the "file" scheme — under graftfs:// that blows up the moment anyone
  // reads permissions (e.g. FileSystem.listFiles wrapping statuses into
  // LocatedFileStatus). Build plain, fully-materialized FileStatus
  // objects instead; an object store has no POSIX permissions anyway.

  private def status(f: java.io.File, p: Path): FileStatus =
    new FileStatus(f.length, f.isDirectory, 1, getDefaultBlockSize(p),
      f.lastModified, makeQualified(p))

  override def getFileStatus(p: Path): FileStatus = {
    val f = pathToFile(p)
    if (!f.exists) throw new FileNotFoundException(s"$p not found")
    status(f, p)
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val f = pathToFile(p)
    if (!f.exists) throw new FileNotFoundException(s"$p not found")
    if (f.isFile) Array(status(f, p))
    else {
      val kids = f.listFiles()
      if (kids == null) throw new java.io.IOException(s"cannot list $p")
      kids.sortBy(_.getName).map(c => status(c, new Path(p, c.getName)))
    }
  }
}
