package graft.meta.types

/** Data-type compatibility classification (J5).
  *
  * Matrices copied verbatim from the reference's semantic core
  * (src/rules/rule_book.py:307-328): key = OLD type (upper-cased),
  * value = set of NEW types the engine can change it to in place.
  */
object Compat {

  val matrices: Map[String, Map[String, Set[String]]] = Map(
    "athena" -> Map(
      "STRING" -> Set("BYTE", "TINYINT", "SMALLINT", "INT", "BIGINT", "VARCHAR"),
      "BYTE" -> Set("TINYINT", "SMALLINT", "INT", "BIGINT"),
      "TINYINT" -> Set("SMALLINT", "INT", "BIGINT"),
      "SMALLINT" -> Set("INT", "BIGINT"),
      "INT" -> Set("BIGINT"),
      "FLOAT" -> Set("DOUBLE"),
      "DECIMAL" -> Set("DECIMAL"),
      "VARCHAR" -> Set("VARCHAR")),
    "iceberg" -> Map(
      "STRING" -> Set.empty[String],
      "BYTE" -> Set.empty[String],
      "TINYINT" -> Set("SMALLINT", "INT", "BIGINT"),
      "SMALLINT" -> Set("INT", "BIGINT"),
      "INT" -> Set("BIGINT", "LONG"),
      "FLOAT" -> Set("DOUBLE"),
      "DECIMAL" -> Set("DECIMAL"),
      "VARCHAR" -> Set("VARCHAR")))

  private val DecimalAnchored = "^decimal\\((\\d+),\\s*(\\d+)\\)".r

  /** N5 — decimal(p,s)→decimal(p2,s) compatible iff same scale and p2>p;
    * either side unparsable as an anchored lowercase `decimal(p,s)` →
    * permissive True (rule_book.py:262-285 — fallback kept exactly).
    */
  def isDecimalCompatible(oldType: String, newType: String): Boolean =
    (DecimalAnchored.findPrefixMatchOf(oldType), DecimalAnchored.findPrefixMatchOf(newType)) match {
      case (Some(o), Some(n)) =>
        val (op, os) = (o.group(1).toInt, o.group(2).toInt)
        val (np, ns) = (n.group(1).toInt, n.group(2).toInt)
        os == ns && np > op
      case _ => true
    }

  /** One row's verdict (rule_book.py:178-191). */
  def isCompatible(engine: String)(oldType: String, newType: String): Boolean = {
    val dict = matrices(engine)
    dict.getOrElse(oldType.toUpperCase, Set.empty).contains(newType.toUpperCase) ||
      (newType.toLowerCase.contains("decimal") &&
        oldType.toLowerCase.contains("decimal") &&
        isDecimalCompatible(oldType, newType))
  }

  /** A classified type change. */
  final case class TypeChange(
      name: String,
      oldType: String,
      newType: String,
      after: Option[String] = None,
      first: Boolean = false,
      backfilledFrom: Option[String] = None)

  /** J5 — split into (allCompatible, compatible, incompatible), preserving
    * input order (rule_book.py:161-207).
    */
  def classify(changes: Seq[TypeChange], engine: String)
      : (Boolean, Seq[TypeChange], Seq[TypeChange]) = {
    val (ok, bad) = changes.partition(c => isCompatible(engine)(c.oldType, c.newType))
    (bad.isEmpty, ok, bad)
  }
}
