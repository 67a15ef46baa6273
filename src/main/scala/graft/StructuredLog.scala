package graft

/** Structured logging for the orchestration shell (SURVEY.md §2.11 D5,
  * full): one machine-parseable `key=value` line per lifecycle stage,
  * mirroring the reference's INFO/ERROR wrap points
  * (`calculate_daily_transactions.py:15-17,82,108-112` — job start, read,
  * validate, write, success/failure) but greppable/ingestable instead of
  * free-text.
  *
  * Lines render as `event=<stage> k1=v1 k2=v2 …` in call-site field order;
  * values with whitespace/`=`/quotes are double-quoted with `"`→`\"`. The
  * rendered line goes through slf4j (so deployments route it like any
  * other log) and to any registered test listener. */
object StructuredLog {
  private val log = org.slf4j.LoggerFactory.getLogger("graft.StructuredLog")

  @volatile private var listeners: List[(String, String) => Unit] = Nil

  /** Register a `(level, line)` listener (tests, metrics forwarders). */
  def addListener(f: (String, String) => Unit): Unit =
    synchronized { listeners = f :: listeners }
  def removeListener(f: (String, String) => Unit): Unit =
    synchronized { listeners = listeners.filterNot(_ eq f) }

  private def quote(v: Any): String = {
    val s = String.valueOf(v)
    if (s.isEmpty || s.exists(c => c.isWhitespace || c == '=' || c == '"'))
      "\"" + s.replace("\"", "\\\"") + "\""
    else s
  }

  def render(event: String, fields: Seq[(String, Any)]): String =
    (("event" -> event) +: fields)
      .map { case (k, v) => s"$k=${quote(v)}" }.mkString(" ")

  private def emit(level: String, event: String, fields: Seq[(String, Any)],
                   t: Throwable): Unit = {
    val line = render(event, fields)
    level match {
      case "ERROR" => if (t ne null) log.error(line, t) else log.error(line)
      case "WARN" => log.warn(line)
      case _ => log.info(line)
    }
    listeners.foreach(_(level, line))
  }

  def info(event: String, fields: (String, Any)*): Unit =
    emit("INFO", event, fields, null)
  def warn(event: String, fields: (String, Any)*): Unit =
    emit("WARN", event, fields, null)
  def error(event: String, fields: (String, Any)*): Unit =
    emit("ERROR", event, fields, null)
  def error(event: String, t: Throwable, fields: (String, Any)*): Unit =
    emit("ERROR", event, fields :+ ("error" -> t.getMessage), t)
}
