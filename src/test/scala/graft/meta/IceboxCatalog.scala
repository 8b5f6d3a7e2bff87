package graft.meta

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.meta.model.{IcebergField, IcebergPartField}

/** An in-memory Spark `TableCatalog` test double with Iceberg-shaped
  * metadata semantics: every column carries a stable field id that
  * survives renames / type updates / moves (assigned incrementally on
  * add, like Iceberg schema evolution), and the partition spec is a
  * list of (field-id, source-column) identity fields evolving by
  * add / drop / replace. It exists so the `IcebergDdl` plan can be
  * EXECUTED end-to-end through Spark's real SQL → analyzer → V2
  * `alterTable(TableChange*)` path in an environment that ships no
  * `iceberg-spark-runtime` jar — the mirror of the Derby-Hive
  * fixpoint in SessionCatalogSpec. Register with
  * `spark.sql.catalog.<name> = classOf[IceboxCatalog].getName`.
  *
  * Only metadata is modeled (no reads/writes — the alterator never
  * touches data either, reference alterator.py:570-574). Partition
  * evolution keeps the evolved field in its spec SLOT (same field id)
  * on replace, matching the positional-by-field-id model the DDL
  * parser synthesizes (DdlParsers.icebergPartitions: ids 1000+i).
  */
class IceboxCatalog extends TableCatalog with SupportsNamespaces {

  /** (id, field) per column; (fieldId, sourceName) per partition field. */
  final case class State(
      cols: Vector[(Int, StructField)],
      parts: Vector[(Int, String)],
      props: Map[String, String],
      nextColId: Int) {
    def icebergView: (Seq[IcebergField], Seq[IcebergPartField], Map[String, String]) = (
      // Iceberg metadata speaks Iceberg type names (long, timestamptz),
      // exactly like a real metadata.json (cf. IcebergMetadataJson)
      cols.map { case (id, f) =>
        IcebergField(id, f.name, IceboxCatalog.icebergTypeName(f.dataType))
      },
      parts.map { case (id, src) => IcebergPartField(id, src) },
      // reserved/engine keys are not user table properties (a real
      // catalog surfaces them out-of-band, cf. GlueCatalog filtering)
      props.view.filterKeys(k => !IceboxCatalog.ReservedProps(k)).toMap)
  }

  private var catalogName: String = _
  private val tables = TrieMap.empty[String, State]
  private val namespaces = TrieMap.empty[String, Map[String, String]]

  private def key(ident: Identifier) = (ident.namespace :+ ident.name).mkString(".")

  def state(ident: Identifier): State =
    tables.getOrElse(key(ident), throw new NoSuchTableException(ident))

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = namespace.mkString(".") + "."
    tables.keys.filter(_.startsWith(prefix))
      .map(k => Identifier.of(namespace, k.stripPrefix(prefix))).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val st = state(ident)
    new Table {
      override def name(): String = key(ident)
      override def schema(): StructType = StructType(st.cols.map(_._2))
      override def partitioning(): Array[Transform] =
        st.parts.map { case (_, src) => Expressions.identity(src) }.toArray
      override def properties(): util.Map[String, String] = st.props.asJava
      override def capabilities(): util.Set[TableCapability] =
        util.Collections.emptySet()
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tables.contains(key(ident))) throw new TableAlreadyExistsException(ident)
    val cols = schema.fields.zipWithIndex.map { case (f, i) => (i + 1, f) }.toVector
    val parts = partitions.toVector.zipWithIndex.map { case (t, i) =>
      val src = t.references()(0).fieldNames()(0)
      require(t.name() == "identity",
        s"icebox models identity transforms only, got $t")
      require(cols.exists(_._2.name == src), s"partition source $src not a column")
      (1000 + i, src)
    }
    tables.put(key(ident),
      State(cols, parts, properties.asScala.toMap, cols.size + 1))
    loadTable(ident)
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    createTable(ident, new StructType(columns.map(c =>
      StructField(c.name(), c.dataType(), c.nullable()))), partitions, properties)

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val next = changes.foldLeft(state(ident))(applyChange(ident))
    tables.put(key(ident), next)
    loadTable(ident)
  }

  private def applyChange(ident: Identifier)(st: State, change: TableChange): State = {
    def idx(name: String): Int = {
      val i = st.cols.indexWhere(_._2.name == name)
      require(i >= 0, s"no such column $name in ${key(ident)}")
      i
    }
    def placed(cols: Vector[(Int, StructField)], entry: (Int, StructField),
        pos: TableChange.ColumnPosition): Vector[(Int, StructField)] = pos match {
      case null => cols :+ entry
      case _: TableChange.First => entry +: cols
      case a: TableChange.After =>
        val i = cols.indexWhere(_._2.name == a.column())
        require(i >= 0, s"AFTER target ${a.column()} not a column")
        (cols.take(i + 1) :+ entry) ++ cols.drop(i + 1)
      case p => throw new UnsupportedOperationException(s"position $p")
    }
    def single(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"icebox models top-level columns only, got ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    change match {
      case a: TableChange.AddColumn =>
        val f = StructField(single(a.fieldNames()), a.dataType(), a.isNullable)
        st.copy(cols = placed(st.cols, (st.nextColId, f), a.position()),
          nextColId = st.nextColId + 1)
      case r: TableChange.RenameColumn =>
        val i = idx(single(r.fieldNames()))
        st.copy(cols = st.cols.updated(i,
          (st.cols(i)._1, st.cols(i)._2.copy(name = r.newName()))))
      case d: TableChange.DeleteColumn =>
        val name = single(d.fieldNames())
        require(!st.parts.exists(_._2 == name),
          s"cannot drop $name: it is an active partition source (Iceberg invariant)")
        st.copy(cols = st.cols.filterNot(_._2.name == name))
      case u: TableChange.UpdateColumnType =>
        val i = idx(single(u.fieldNames()))
        st.copy(cols = st.cols.updated(i,
          (st.cols(i)._1, st.cols(i)._2.copy(dataType = u.newDataType()))))
      case m: TableChange.UpdateColumnPosition =>
        val i = idx(single(m.fieldNames()))
        st.copy(cols = placed(st.cols.patch(i, Nil, 1), st.cols(i), m.position()))
      case s: TableChange.SetProperty =>
        st.copy(props = st.props + (s.property() -> s.value()))
      case r: TableChange.RemoveProperty =>
        st.copy(props = st.props - r.property())
      case c => throw new UnsupportedOperationException(s"icebox: $c")
    }
  }

  /** Partition evolution — Iceberg SQL-extension statements have no
    * vanilla-Spark parse, so the apply shim calls these directly (the
    * extensions parser would route here identically). */
  def addPartitionField(ident: Identifier, source: String): Unit = {
    val st = state(ident)
    require(st.cols.exists(_._2.name == source), s"partition source $source not a column")
    tables.put(key(ident), st.copy(parts =
      st.parts :+ ((1000 + st.parts.size, source))))
  }
  def dropPartitionField(ident: Identifier, source: String): Unit = {
    val st = state(ident)
    require(st.parts.exists(_._2 == source), s"no partition field on $source")
    tables.put(key(ident), st.copy(parts = st.parts.filterNot(_._2 == source)))
  }
  def replacePartitionField(ident: Identifier, oldSource: String, newSource: String): Unit = {
    val st = state(ident)
    val i = st.parts.indexWhere(_._2 == oldSource)
    require(i >= 0, s"no partition field on $oldSource")
    require(st.cols.exists(_._2.name == newSource), s"partition source $newSource not a column")
    tables.put(key(ident), st.copy(parts =
      st.parts.updated(i, (st.parts(i)._1, newSource))))
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(key(ident)).isDefined

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    tables.remove(key(oldIdent)) match {
      case Some(st) =>
        if (tables.contains(key(newIdent))) {
          tables.put(key(oldIdent), st)
          throw new TableAlreadyExistsException(newIdent)
        }
        tables.put(key(newIdent), st)
      case None => throw new NoSuchTableException(oldIdent)
    }

  // --- namespaces -------------------------------------------------------
  override def listNamespaces(): Array[Array[String]] =
    namespaces.keys.map(_.split('.')).toArray
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespaces.contains(namespace.mkString("."))
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    namespaces.getOrElse(namespace.mkString("."),
      throw new NoSuchNamespaceException(namespace)).asJava
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    namespaces.put(namespace.mkString("."), metadata.asScala.toMap)
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = ()
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    namespaces.remove(namespace.mkString(".")).isDefined
}

object IceboxCatalog {
  val ReservedProps: Set[String] =
    Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_COMMENT, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_TABLE_TYPE)

  /** Spark DataType → Iceberg metadata type name (the inverse of
    * IcebergMetadataJson's projection / TypeNorm.mapIcebergToSparkDtype). */
  def icebergTypeName(dt: DataType): String = dt match {
    case org.apache.spark.sql.types.LongType => "long"
    case d: org.apache.spark.sql.types.DecimalType =>
      s"decimal(${d.precision}, ${d.scale})"
    case org.apache.spark.sql.types.TimestampType => "timestamptz"
    case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
    case other => other.simpleString
  }
}
