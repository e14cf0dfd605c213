package graft.functions

/** Byte-exact replica of CPython's `json.dumps(..., ensure_ascii=False,
  * indent=2)` for the reference's output documents
  * (predictions_to_json.py:151-155) — the last documented parity cut of
  * SURVEY §7.4.5 (value parity via `to_json` stays the scale sink; this
  * is the golden-pipeline byte contract).
  *
  * The two non-obvious pieces, both replicated exactly:
  *
  *  - FLOAT REPR: Python prints the SHORTEST decimal string that
  *    round-trips to the same double (David Gay / Ryū semantics).
  *    `java.lang.Double.toString` is NOT that on JDK 17 (JDK-4511638 —
  *    extra digits in some ranges; fixed only in 19), so [[pyFloatRepr]]
  *    finds the minimal-precision `BigDecimal` whose `doubleValue`
  *    round-trips — exact by construction, JDK-version-independent.
  *    Envelope: positional notation for 1e-4 ≤ |v| < 1e16 (Python
  *    switches to scientific outside it) — the reference's 2-dp-rounded
  *    pixel coordinates live in [0.01, 1e4]; out-of-envelope values fail
  *    loudly rather than emit a silently different byte form.
  *
  *  - INDENT LAYOUT: with `indent=2` CPython puts every array element and
  *    object member on its own line (separators `(',', ': ')`), renders
  *    empty containers as `[]`/`{}` WITHOUT a newline, and never emits
  *    trailing whitespace. `ensure_ascii=False` escapes only `"`, `\`
  *    and control chars (`\b \t \n \f \r`, else `\u00XX`), leaving
  *    non-ASCII raw.
  */
object PyJson {

  /** JSON value model mirroring what the Python dict literal carries. */
  sealed trait J
  final case class JStr(s: String) extends J
  final case class JInt(v: Long) extends J
  final case class JFloat(v: Double) extends J
  final case class JArr(items: Seq[J]) extends J
  final case class JObj(fields: Seq[(String, J)]) extends J

  /** CPython `repr(float)` for the positional envelope (see object doc). */
  def pyFloatRepr(v: Double): String = {
    require(!v.isNaN && !v.isInfinite, "json floats must be finite")
    if (v == 0.0)
      return if (1.0 / v < 0) "-0.0" else "0.0"
    val a = math.abs(v)
    require(a >= 1e-4 && a < 1e16,
      s"pyFloatRepr envelope is positional [1e-4, 1e16), got $v")
    var p = 1
    var bd: java.math.BigDecimal = null
    while (bd == null && p <= 17) {
      val c = new java.math.BigDecimal(v)
        .round(new java.math.MathContext(p))
      if (c.doubleValue() == v) bd = c else p += 1
    }
    val s = bd.stripTrailingZeros().toPlainString
    if (s.contains('.')) s else s + ".0"
  }

  /** CPython `json` string escaping under `ensure_ascii=False`. */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b += '"'
    s.foreach {
      case '"' => b ++= "\\\""
      case '\\' => b ++= "\\\\"
      case '\b' => b ++= "\\b"
      case '\t' => b ++= "\\t"
      case '\n' => b ++= "\\n"
      case '\f' => b ++= "\\f"
      case '\r' => b ++= "\\r"
      case c if c < 0x20 => b ++= f"\\u${c.toInt}%04x"
      case c => b += c
    }
    b += '"'
    b.toString
  }

  /** `json.dumps(value, ensure_ascii=False, indent=2)`, byte-exact. */
  def dumps(j: J, indent: Int = 2): String = {
    val out = new StringBuilder
    def pad(level: Int): Unit = out.append(" " * (indent * level))
    def render(v: J, level: Int): Unit = v match {
      case JStr(s) => out.append(escape(s))
      case JInt(i) => out.append(i.toString)
      case JFloat(d) => out.append(pyFloatRepr(d))
      case JArr(items) =>
        if (items.isEmpty) out.append("[]")
        else {
          out.append("[\n")
          items.zipWithIndex.foreach { case (it, i) =>
            pad(level + 1); render(it, level + 1)
            out.append(if (i < items.size - 1) ",\n" else "\n")
          }
          pad(level); out.append("]")
        }
      case JObj(fields) =>
        if (fields.isEmpty) out.append("{}")
        else {
          out.append("{\n")
          fields.zipWithIndex.foreach { case ((k, fv), i) =>
            pad(level + 1); out.append(escape(k)); out.append(": ")
            render(fv, level + 1)
            out.append(if (i < fields.size - 1) ",\n" else "\n")
          }
          pad(level); out.append("}")
        }
    }
    render(j, 0)
    out.toString
  }
}
