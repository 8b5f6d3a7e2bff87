package graft.meta.model

/** Minimal ordered JSON AST + renderer for the change report.
  *
  * The report contract (reference README.md:98-365) needs stable field
  * order and a recursive empty-value prune (handler `clean_results`,
  * iceberg_schema_handler.py:682-700); a tiny AST is simpler than
  * configuring a full mapper for that.
  */
sealed trait JValue {
  /** Python-truthiness analog used by the reference's pruning. */
  def isEmptyish: Boolean = this match {
    case JNull => true
    case JStr(s) => s.isEmpty
    case JBool(b) => !b
    case JNum(n) => n == 0
    case JArr(xs) => xs.isEmpty
    case JObj(fs) => fs.isEmpty
  }
  def render: String = this match {
    case JNull => "null"
    case JStr(s) => JValue.quote(s)
    case JBool(b) => b.toString
    case JNum(n) => if (n == n.longValue.toDouble) n.longValue.toString else n.toString
    case JArr(xs) => xs.map(_.render).mkString("[", ", ", "]")
    case JObj(fs) => fs.map { case (k, v) => s"${JValue.quote(k)}: ${v.render}" }
      .mkString("{", ", ", "}")
  }
  /** clean_results — recursively drop falsy values from objects. */
  def pruned: JValue = this match {
    case JObj(fs) =>
      JObj(fs.flatMap { case (k, v) =>
        if (v.isEmptyish) None else Some(k -> v.pruned)
      })
    case JArr(xs) => JArr(xs.map(_.pruned))
    case other => other
  }
}
case object JNull extends JValue
final case class JStr(s: String) extends JValue
final case class JNum(n: Double) extends JValue
final case class JBool(b: Boolean) extends JValue
final case class JArr(xs: Seq[JValue]) extends JValue
final case class JObj(fields: Seq[(String, JValue)]) extends JValue

object JValue {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def obj(fields: (String, JValue)*): JObj = JObj(fields)
  def arr(xs: JValue*): JArr = JArr(xs)
  def str(s: String): JValue = JStr(s)
  def num(n: Double): JValue = JNum(n)
}
