package graft

import java.nio.file.{FileAlreadyExistsException, Files, Paths}

/** In-process emulation of the object-store service API the commit-log
  * protocol depends on ([[graft.streaming.ConditionalPut.ObjectStoreClient]]):
  * S3 `PutObject` + `If-None-Match: "*"` semantics, no network.
  *
  * Fidelity to the service contract, not to any SDK:
  *  - concurrent requests for the SAME key are serialized by the service
  *    (per-key monitor), and exactly one create among racers succeeds —
  *    the rest get 412 (`false`);
  *  - a successful create is all-or-nothing: the object is staged and
  *    hard-linked into place, so a FileSystem reader can never observe a
  *    created-but-empty commit object;
  *  - keys land on the local filesystem the [[NonAtomicFileSystem]]
  *    serves (key = absolute local path minus the leading slash), so
  *    objects PUT through the service API are immediately visible to
  *    FileSystem readers — the single-store view s3a and the SDK share
  *    on a real bucket;
  *  - every request is recorded (key, created?) so specs can assert the
  *    commit path's request pattern (e.g. exactly one conditional PUT
  *    per published commit).
  */
final class S3ApiEmulator extends graft.streaming.ConditionalPut.ObjectStoreClient {

  /** (bucket/key, created) per request, in service arrival order. */
  val requests = new java.util.concurrent.ConcurrentLinkedQueue[(String, Boolean)]()

  private val keyMonitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def putIfNoneMatch(bucket: String, key: String, content: Array[Byte]): Boolean = {
    val monitor = keyMonitors.computeIfAbsent(s"$bucket/$key", _ => new Object)
    val created = monitor.synchronized {
      val p = Paths.get(s"/$key")
      if (Files.exists(p)) false
      else {
        Option(p.getParent).foreach(Files.createDirectories(_))
        val tmp = Files.createTempFile(p.getParent, s".${p.getFileName}", ".s3put")
        try {
          Files.write(tmp, content)
          try { Files.createLink(p, tmp); true }
          catch { case _: FileAlreadyExistsException => false }
        } finally { Files.deleteIfExists(tmp); () }
      }
    }
    requests.add((s"$bucket/$key", created))
    created
  }

  def reset(): Unit = requests.clear()
}
