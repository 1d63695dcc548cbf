package graft.core

import java.util.concurrent.atomic.AtomicReference

/** Structured per-stage tracing (SURVEY §2 O7): the reference hangs an
  * OpenTelemetry span on every file and pipeline stage
  * (src/logging_conf.py:37-128, span at processor.py:71). This engine's
  * equivalent is a dependency-free span layer emitting one logfmt line per
  * completed span — `span=<name> ms=<millis> ok=<bool> key=value...` — to a
  * pluggable sink (stderr via the CLI `--trace` flag; a buffer in tests; an
  * OTel exporter adapter in a real deployment).
  *
  * The sink is process-global and defaults to a no-op, so tracing costs one
  * volatile read per span when disabled. Span attributes are rendered
  * eagerly but only when a sink is installed.
  */
object Trace {
  type Sink = String => Unit

  private val sinkRef = new AtomicReference[Option[Sink]](None)

  def install(sink: Sink): Unit = sinkRef.set(Some(sink))
  def uninstall(): Unit = sinkRef.set(None)

  private def fmt(v: Any): String = {
    val s = String.valueOf(v)
    // one span must stay ONE line: escape every control char (a filename
    // with \n would otherwise split the record for line-oriented consumers)
    if (s.exists(c => c <= ' ' || c == '"' || c == '=' || c == 0x7f)) {
      val escaped = s.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' || c == 0x7f => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      "\"" + escaped + "\""
    } else s
  }

  /** Run `f` inside a named span; emit one logfmt line on completion
    * (including failure — `ok=false` plus the error class) when a sink is
    * installed. The body's result/exception always propagates unchanged.
    */
  def span[T](name: String, attrs: (String, Any)*)(f: => T): T = {
    val enabled = sinkRef.get()
    if (enabled.isEmpty) return f
    val t0 = System.nanoTime()
    var error: Option[Throwable] = None
    try f
    catch { case e: Throwable => error = Some(e); throw e }
    finally {
      val ms = (System.nanoTime() - t0) / 1e6
      val base = s"span=${fmt(name)} ms=${ms.round} ok=${error.isEmpty}"
      val err = error.map(e => s" error=${fmt(e.getClass.getSimpleName)}")
        .getOrElse("")
      val rest = attrs.map { case (k, v) => s" ${fmt(k)}=${fmt(v)}" }.mkString
      // a throwing sink must never replace the body's result/exception —
      // tracing is observability, not control flow
      try enabled.foreach(_(base + err + rest))
      catch { case _: Throwable => () }
    }
  }
}
