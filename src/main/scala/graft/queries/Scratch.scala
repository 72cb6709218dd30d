package graft.queries

/** Reusable per-purpose scratch directories for queries that exercise a
  * write→read round trip. A fresh `createTempDirectory` per invocation
  * leaked a full table copy every bench/verify pass; a fixed path +
  * `mode("overwrite")` keeps exactly one copy per purpose per machine.
  *
  * Prefers tmpfs (`/dev/shm`) over the disk-backed java.io.tmpdir: these
  * queries gate write-path SEMANTICS (commit protocols, partition layout,
  * round-trip fidelity), and paying rotational/virtio IO to prove them
  * just adds noise to the bench. In production the same writes target
  * object storage; locally, RAM is the honest stand-in.
  *
  * `-Dgraft.scratch.dir=...` overrides the choice outright, and tmpfs is
  * only auto-picked with ≥ 4 GiB free — tmpfs defaults to half of RAM, so
  * a large-SF run could otherwise fill /dev/shm and die mid-write with no
  * fallback.
  */
object Scratch {
  private val base: String = sys.props.get("graft.scratch.dir")
    .filter(_.nonEmpty)
    .getOrElse {
      val shm = java.nio.file.Path.of("/dev/shm")
      val shmUsable = java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm) &&
        (try shm.toFile.getUsableSpace >= 4L * 1024 * 1024 * 1024
         catch { case _: Exception => false })
      if (shmUsable) shm.toString
      else sys.props.getOrElse("java.io.tmpdir", "/tmp")
    }

  def dir(name: String): String = {
    val p = java.nio.file.Path.of(base, s"graft_scratch_$name")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Recursively delete a scratch subtree. Needed where a NEW JVM reuses a
    * scratch warehouse: the fresh in-memory catalog knows nothing of the
    * previous run's tables, so `DROP DATABASE` can't clear them and
    * `saveAsTable` fails on the lingering location.
    */
  def wipe(path: String): Unit = {
    val p = java.nio.file.Path.of(path)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
