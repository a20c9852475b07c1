package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A filesystem that behaves like an S3-class object store for the
  * operations that matter to commit safety — registered under the
  * `nonatomic://` scheme by CommitProtocolSpec:
  *
  *  - `rename` is a COPY-THEN-DELETE: there is a window where source and
  *    destination both exist, and the destination appears before the
  *    source vanishes. Nothing about it is atomic. Every rename is also
  *    recorded so a spec can assert the commit path never relied on one.
  *  - `create(overwrite = false)` silently behaves like
  *    `create(overwrite = true)` — an object-store PUT never fails on
  *    existence, so exclusive-create through the FileSystem API is a
  *    silent last-writer-wins (recorded too).
  *
  * The ATOMIC conditional put the commit-log protocol needs is *not*
  * provided by this class — exactly as on S3, where it is a service-API
  * feature (`If-None-Match`) outside the FileSystem API — the spec
  * registers a [[graft.streaming.ConditionalPut]] for the scheme instead.
  * Data lands on the local disk (paths map 1:1 onto `file://`).
  */
class NonAtomicFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "nonatomic"
  override def getUri: URI = URI.create("nonatomic:///")

  override def rename(src: Path, dst: Path): Boolean = {
    NonAtomicFileSystem.renames.add(src.toString + " -> " + dst.toString)
    if (!exists(src)) false
    else {
      if (exists(dst) && getFileStatus(dst).isFile) delete(dst, false)
      // copy-then-delete, the object-store "rename": dst visible first,
      // src deleted after — and a crash in between leaves BOTH
      org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst, false, getConf)
      delete(src, true)
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) NonAtomicFileSystem.exclusiveCreates.add(f.toString)
    // drop the exclusivity: a PUT never fails on existence
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }
}

object NonAtomicFileSystem {
  val renames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val exclusiveCreates = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { renames.clear(); exclusiveCreates.clear() }
}
