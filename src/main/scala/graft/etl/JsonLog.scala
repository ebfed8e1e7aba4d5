package graft.etl

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Structured log sink (reference: StructuredFormatter + dual
  * stdout/file handlers, etl/etl.py:31-58 — SURVEY §2.1 S10): one JSON
  * object per line with {timestamp, level, logger, message, module,
  * function, line}. Driver-side operational logging — executor-side
  * logs belong to log4j2 (a JSON PatternLayout achieves the same shape
  * there; this class covers the connector/orchestration code that the
  * reference logs from Python). */
object JsonLog {

  private val TsFormat = DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    .withZone(ZoneOffset.UTC)

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** One structured line (field order fixed for stable goldens). */
  def format(level: String, logger: String, message: String,
      module: String, function: String, line: Int,
      now: Instant = Instant.now()): String =
    s"""{"timestamp": "${TsFormat.format(now)}", "level": "${esc(level)}",""" +
      s""" "logger": "${esc(logger)}", "message": "${esc(message)}",""" +
      s""" "module": "${esc(module)}", "function": "${esc(function)}",""" +
      s""" "line": $line}"""

  /** Dual-destination sink: stdout always, file when configured
    * (append, created on demand — the reference's logs/etl.log). */
  class Sink(val file: Option[Path] = None,
      out: String => Unit = println(_)) {
    def log(level: String, logger: String, message: String,
        module: String = "graft", function: String = "", line: Int = 0): Unit = {
      val rendered = format(level, logger, message, module, function, line)
      out(rendered)
      file.foreach { p =>
        Option(p.getParent).foreach(Files.createDirectories(_))
        Files.writeString(p, rendered + "\n", StandardOpenOption.CREATE,
          StandardOpenOption.APPEND)
      }
    }
    def info(logger: String, message: String): Unit =
      log("INFO", logger, message)
    def error(logger: String, message: String): Unit =
      log("ERROR", logger, message)
  }

  def fileSink(path: String): Sink = new Sink(Some(Paths.get(path)))
}
