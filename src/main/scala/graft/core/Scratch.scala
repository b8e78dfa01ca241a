package graft.core

/** Per-invocation scratch directories for sink/DML queries.
  *
  * Every filesystem-effect operator (S5/S6, D1/D3/D4/D8/D9, M7, the D5
  * snapshot store) writes under `target/scratch`. A FIXED path per
  * query would let two concurrent invocations — the concurrent-query
  * harness, or two Verify runs sharing a workspace — overwrite each
  * other's files mid-read. `dir(name)` returns a unique directory per
  * CALL, so each invocation owns its output tree outright; the name
  * prefix keeps the layout debuggable.
  *
  * Disk growth: these are NOT all small — D3/D4 rewrite the full orders
  * table and S5 writes months of parquet per invocation, so a long
  * benchmark loop grows the tree by one table copy per iteration.
  * Deleting a dir at query completion would be UNSOUND (the returned
  * DataFrame reads its scratch files lazily — the caller may not have
  * consumed it yet), so cleanup happens at JVM exit: by then every
  * in-flight read of THIS JVM is finished. The hook removes only the
  * dirs this JVM handed out — `target/scratch` is shared by
  * concurrently running JVMs (sbt test beside a Verify run), and a
  * whole-tree sweep from the first JVM to exit would yank files out
  * from under the others mid-read.
  */
object Scratch {
  private val root = new java.io.File("target/scratch")
  private val issued = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete() // best-effort; a false return just leaks until sbt clean
  }

  sys.addShutdownHook {
    issued.forEach(p => deleteRecursively(new java.io.File(p)))
  }

  def dir(name: String): String = {
    val d = new java.io.File(root, s"$name-" +
      java.util.UUID.randomUUID().toString.take(8)).getAbsolutePath
    issued.add(d)
    d
  }
}
