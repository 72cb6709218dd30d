package graft.queries

/** Reusable per-purpose scratch directories for queries that exercise a
  * write→read round trip. A fresh `createTempDirectory` per invocation
  * leaked a full table copy every bench/verify pass; a fixed path +
  * `mode("overwrite")` keeps exactly one copy per purpose per machine.
  */
object Scratch {
  def dir(name: String): String = {
    val p = java.nio.file.Path.of(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_scratch_$name")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
