package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.journal.JournalStore

/** SQL addressability for journal stores — a Spark `TableCatalog` that
  * maps table names onto journal store directories under a configured
  * root:
  *
  *   spark.conf.set("spark.sql.catalog.journal", classOf[JournalCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.journal.root", "/data/journals")
  *
  *   CREATE TABLE journal.clicks OPTIONS (epochSize '5000')
  *   INSERT INTO journal.clicks SELECT ... AS ns, ... AS ukey, ts,
  *                                     ... AS payload, ... AS val FROM src
  *   SELECT * FROM journal.clicks WHERE seq >= 9000
  *   DROP TABLE journal.clicks
  *
  * Reads resolve to the same [[JournalTable]] the path API uses — the
  * columnar V2 BatchScan with epoch/file pruning — and INSERT rides the
  * V2 commit framework into the store's whole-batch append (global seq
  * sort + manifest CAS). Because the table schema carries system
  * columns the engine assigns (seq, epoch), appends are by NAME
  * (ACCEPTS_ANY_SCHEMA): the inserted query must project the journal's
  * writer columns (ns, ukey, ts, payload, val [, evolved extras]) —
  * append() validates and fails loudly otherwise.
  *
  * The catalog is metadata-light by design: a table IS a directory with
  * a committed manifest (the store's own existence rule), so
  * createTable/dropTable/listTables are directory operations and two
  * sessions pointed at the same root see the same tables with no extra
  * metastore. Multi-part names map to subdirectories
  * (journal.a.b → root/a/b). */
class JournalCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _
  private var defaultEpochSize: Long = 1000L

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"journal catalog '$name' requires spark.sql.catalog.$name.root " +
        "(the directory journal stores live under)"))
    defaultEpochSize = Option(options.get("epochSize")).map(_.toLong).getOrElse(1000L)
  }

  override def name(): String = catalogName

  private def pathFor(ident: Identifier): String =
    ((root +: ident.namespace.toSeq) :+ ident.name).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = Paths.get((root +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val st = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(p => JournalStore.exists(p.toString))
          .map(p => Identifier.of(namespace, p.getFileName.toString))
          .toArray.sortBy(_.name)
      } finally st.close()
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    JournalStore.exists(pathFor(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathFor(ident)
    if (!JournalStore.exists(p)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    new JournalTable(spark, p, Some(JournalStore.open(spark, p)), pinned = false)
  }

  /** The declared schema is accepted but not authoritative: a journal's
    * row surface is the canonical columns plus whatever appends evolve
    * (schema-on-manifest), exactly like the path API. Partitioning is
    * refused — the store manages its own (epoch, ns) layout. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "journal tables manage their own (epoch, ns) partition layout; " +
        "PARTITIONED BY is not supported")
    val p = Option(properties.get(TableCatalog.PROP_LOCATION)).getOrElse(pathFor(ident))
    if (JournalStore.exists(p)) throw new TableAlreadyExistsException(ident)
    val epochSize =
      Option(properties.get("epochSize"))
        .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "epochSize")))
        .map(_.toLong).getOrElse(defaultEpochSize)
    JournalStore.create(SparkSession.active, p, epochSize)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "journal tables evolve their schema at append time (new columns " +
        "ride the manifest); ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathFor(ident)
    if (!JournalStore.exists(p)) false
    else {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      true
    }
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = pathFor(from)
    if (!JournalStore.exists(src)) throw new NoSuchTableException(from)
    val dst = pathFor(to)
    if (JournalStore.exists(dst)) throw new TableAlreadyExistsException(to)
    Files.createDirectories(Paths.get(dst).getParent)
    Files.move(Paths.get(src), Paths.get(dst))
  }
}
