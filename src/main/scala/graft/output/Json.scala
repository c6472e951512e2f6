package graft.output

/** Minimal insertion-ordered JSON renderer for the driver-side report
  * artifacts (K-7/K-8/K-9 of SURVEY.md §2h). The reference renders its
  * reports with `json.dump(report, indent=2, default=str)`
  * (`src/output_manager.py:129-130,279-280`); this mirrors that shape:
  * 2-space indent, insertion-ordered objects, numbers that print like
  * Python's (ints bare, floats with a decimal point).
  *
  * No external dependency on purpose — the build resolves nothing beyond
  * Spark + test libs, and report trees are tiny driver-side values.
  */
object Json {

  sealed trait JValue { def render: String = Json.render(this, 0) }
  final case class JObj(fields: Seq[(String, JValue)]) extends JValue
  final case class JArr(items: Seq[JValue]) extends JValue
  final case class JStr(value: String) extends JValue
  final case class JNum(value: Double) extends JValue
  final case class JInt(value: Long) extends JValue
  final case class JBool(value: Boolean) extends JValue
  case object JNull extends JValue

  object JObj { def apply(fields: (String, JValue)*)(implicit d: DummyImplicit): JObj = JObj(fields) }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Floats print Python-style: whole doubles as `N.0`, others via the
    * shortest round-trip repr (Java's Double.toString matches for the
    * magnitudes reports contain).
    */
  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else if (d == d.floor && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  def render(v: JValue, indent: Int): String = {
    val pad = "  " * indent
    val padIn = "  " * (indent + 1)
    v match {
      case JNull => "null"
      case JBool(b) => b.toString
      case JInt(n) => n.toString
      case JNum(d) => num(d)
      case JStr(s) => "\"" + escape(s) + "\""
      case JArr(Seq()) => "[]"
      case JArr(items) =>
        items.map(i => padIn + render(i, indent + 1))
          .mkString("[\n", ",\n", s"\n$pad]")
      case JObj(Seq()) => "{}"
      case JObj(fields) =>
        fields.map { case (k, x) => s"""$padIn"${escape(k)}": ${render(x, indent + 1)}""" }
          .mkString("{\n", ",\n", s"\n$pad}")
    }
  }
}
