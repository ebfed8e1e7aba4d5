package graft

/** Per-stage wall-clock journal for COMPOSITE bench entries (x26's
  * 4-stage vector-store lifecycle, x44's copy+append) — the r13
  * verdict's finding: a multi-stage entry's single ledger number is
  * uninterpretable as a regression signal, because a swing in any one
  * stage is invisible without archaeology. Each invocation appends one
  * JSON line `{"entry":…,"stages":{name:sec,…}}` to
  * `target/stage_journal.jsonl`; the bench's interleaved passes thus
  * leave one line per pass, and a regression in the composite median
  * is attributed by diffing the per-stage medians across rounds.
  *
  * Best-effort by contract: journaling must never fail or slow the
  * caller (the file write is a few hundred bytes per entry pass), so
  * all I/O errors are swallowed. Timings are wall-clock nanoTime
  * spans around the stage's ACTION (streaming drain, index write,
  * compaction) — lazy stages (x26's returned search frame) are the
  * entry wall minus the journaled stages.
  */
object StageJournal {
  private val path = java.nio.file.Paths.get("target/stage_journal.jsonl")

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def record(entry: String, stages: Seq[(String, Double)]): Unit =
    try {
      val body = stages.map { case (n, s) => s""""$n":${fmt(s)}""" }
        .mkString(",")
      val line = s"""{"entry":"$entry","stages":{$body}}""" + "\n"
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Run `f`, append (name → elapsed seconds) to `buf`, return f's
    * result — the measurement seam composite entries thread through
    * their stages. */
  def time[A](buf: scala.collection.mutable.Buffer[(String, Double)],
      name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally buf += name -> ((System.nanoTime() - t0) / 1e9)
  }
}
