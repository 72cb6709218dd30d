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
  */
object Scratch {
  private val base: String = {
    val shm = java.nio.file.Path.of("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      shm.toString
    else sys.props.getOrElse("java.io.tmpdir", "/tmp")
  }

  def dir(name: String): String = {
    val p = java.nio.file.Path.of(base, s"graft_scratch_$name")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
