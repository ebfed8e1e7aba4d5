package graft.streaming

import java.nio.file.{Files, Path}

/** Scratch-dir discipline for the static streaming harnesses: every
  * `Files.createTempDirectory` a static entry makes (landing + ledger
  * + checkpoint parquet) used to outlive the call, so repeated
  * bench/verify runs accumulated data in the JVM temp dir
  * indefinitely. Two lifecycles, matching the two result shapes:
  *
  *  - [[scratch]] — registered for recursive deletion at JVM exit.
  *    For entries whose RETURNED frame still reads lazily from the
  *    scratch dir (the embedding-dedup corpus/index statics): the
  *    data must survive the call, but not the JVM.
  *  - [[dispose]] — eager recursive deletion, for entries that
  *    COLLECT their bounded ledger before returning (the mix-drift /
  *    corpus-stats monitors, whose ledgers are |batches|- or
  *    |sources|-sized metadata): the dir dies the moment the rows are
  *    on the driver.
  */
private[streaming] object Scratch {
  private val pending =
    java.util.Collections.synchronizedSet(new java.util.HashSet[Path]())

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val snap = pending.synchronized {
        val s = new java.util.ArrayList[Path](pending); s
      }
      snap.forEach(p => deleteRecursively(p))
    }))

  /** RAM-backed scratch root when the platform offers one (guide §6):
    * the static streaming entries' cost is dominated by Structured-
    * Streaming fixed machinery — offset/commit logs, state checkpoint
    * and micro-batch landing/output parquet, all of it tiny and
    * deleted within the entry's lifetime — so there is nothing durable
    * to lose by keeping it off disk. /dev/shm is tmpfs on every
    * mainstream Linux; anywhere it is absent (or not writable) the JVM
    * temp dir is used exactly as before. Results never depend on the
    * location — only the entry's I/O latency does. */
  private lazy val root: Option[Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
    else None
  }

  /** A fresh temp dir, deleted (recursively) at JVM exit. */
  def scratch(prefix: String): String = {
    hookInstalled
    val p = root match {
      case Some(r) => Files.createTempDirectory(r, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    pending.add(p)
    p.toString
  }

  /** Eagerly delete a scratch dir (idempotent; deregisters the hook
    * entry so exit-time cleanup skips it). */
  def dispose(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    pending.remove(p)
    deleteRecursively(p)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
}
