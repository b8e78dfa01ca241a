package graft.core

/** Per-invocation scratch directories for sink/DML queries.
  *
  * Every filesystem-effect operator (S5/S6, D1/D3/D4/D8/D9, M7, the D5
  * snapshot store) writes under `target/scratch`. A FIXED path per
  * query would let two concurrent invocations — the concurrent-query
  * harness, or two Verify runs sharing a workspace — overwrite each
  * other's files mid-read. `dir(name)` returns a unique directory per
  * CALL, so each invocation owns its output tree outright; the name
  * prefix keeps the layout debuggable. Dirs are small aggregates and
  * live under `target/`, so leaking them between `sbt clean`s is the
  * right trade against coordinating distributed deletes.
  */
object Scratch {
  def dir(name: String): String =
    new java.io.File(s"target/scratch/$name-" +
      java.util.UUID.randomUUID().toString.take(8)).getAbsolutePath
}
