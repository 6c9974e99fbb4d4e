package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}
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
class JournalCatalog extends TableCatalog with ProcedureCatalog {
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

  /** Opt in to column DEFAULT and GENERATED ALWAYS AS DDL: without
    * these capabilities Spark refuses the syntax at analysis, before
    * the catalog ever sees it. (Generated expressions additionally get
    * Spark's own CREATE-time verification: deterministic, referencing
    * only non-generated columns.) */
  override def capabilities(): util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

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
    new JournalTable(spark, p, Some(JournalStore.open(spark, p)),
      pinned = false, viaCatalog = true)
  }

  /** SQL time travel by manifest version: `SELECT … FROM t VERSION AS OF
    * 3` resolves here. The pinned table serves the EXACT file set +
    * checkpoints that version committed (snapshot isolation across later
    * appends, compactions and vacuums — vacuum keeps every file a
    * retained version references), and refuses writes/streaming. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathFor(ident)
    if (!JournalStore.exists(p)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"journal VERSION AS OF takes a numeric manifest version, got '$version'")
    }
    val spark = SparkSession.active
    new JournalTable(spark, p, Some(JournalStore.open(spark, p).openAt(v)),
      pinned = true)
  }

  /** SQL time travel by wall clock: `TIMESTAMP AS OF …` (Spark hands the
    * instant down in microseconds). Resolution rule: the newest retained
    * version committed at or before the instant — see
    * [[JournalStore.versionAsOf]]. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = pathFor(ident)
    if (!JournalStore.exists(p)) throw new NoSuchTableException(ident)
    val spark = SparkSession.active
    val s0 = JournalStore.open(spark, p)
    new JournalTable(spark, p, Some(s0.openAt(s0.versionAsOf(timestampMicros / 1000L))),
      pinned = true)
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
    // CREATE TABLE (... c T DEFAULT lit ...): Spark has already
    // analysis-checked the default against the declared type; persist
    // it as the store's default.<col> property (the declared schema
    // itself pins at first append, as always). Specs ride the INITIAL
    // manifest — CREATE TABLE is ONE atomic commit, so a crash can
    // never leave the columns without their specs and RESTORE to
    // version 0 keeps them.
    val defaults = schema.fields.collect {
      case f if f.metadata.contains(
          org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
            .CURRENT_DEFAULT_COLUMN_METADATA_KEY) =>
        (JournalStore.DefaultPrefix + f.name) ->
          f.metadata.getString(
            org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
              .CURRENT_DEFAULT_COLUMN_METADATA_KEY)
    }.toMap
    // ... and GENERATED ALWAYS AS expressions (Spark has CREATE-time
    // verified them: deterministic, non-generated references only)
    val generated = schema.fields.collect {
      case f if f.metadata.contains(
          org.apache.spark.sql.catalyst.util.GeneratedColumn
            .GENERATION_EXPRESSION_METADATA_KEY) =>
        (JournalStore.GeneratedPrefix + f.name) ->
          f.metadata.getString(
            org.apache.spark.sql.catalyst.util.GeneratedColumn
              .GENERATION_EXPRESSION_METADATA_KEY)
    }.toMap
    // the SAME DDL-time contract ALTER COLUMN SET DEFAULT enforces:
    // Spark itself accepts e.g. CURRENT_TIMESTAMP as a CREATE-time
    // default, but a per-append re-evaluating expression is not a
    // DEFAULT here — refuse at this DDL door too, not at first append
    defaults.foreach { case (k, sqlTxt) =>
      val cn = k.stripPrefix(JournalStore.DefaultPrefix)
      schema.fields.find(_.name == cn).foreach(f =>
        JournalStore.validateColumnDefault(
          SparkSession.active, cn, f.dataType, sqlTxt))
    }
    JournalStore.create(SparkSession.active, p, epochSize, Some(schema),
      defaults ++ generated ++ identitySideChannel.get())
    loadTable(ident)
  }

  /** The v2-Column overload is what Spark actually calls for CREATE
    * TABLE: GENERATED ALWAYS AS expressions ride `Column.
    * generationExpression` FIRST-CLASS and are STRIPPED by the
    * StructType bridge (defaults survive it as field metadata), and
    * IDENTITY specs ride `Column.identityColumnSpec` — both are
    * captured here and handed to the base path through field metadata /
    * the shared identity side-channel so the whole column-spec trio
    * lands in CREATE's single atomic manifest commit. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // hand-rolled Column[] → StructType (CatalogV2Util is private[sql]):
    // re-encode defaults as CURRENT_DEFAULT metadata and generation
    // expressions as GENERATION_EXPRESSION metadata for the base path
    val structFields = columns.map { c =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
      Option(c.defaultValue()).foreach(dv => md.putString(
        org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
          .CURRENT_DEFAULT_COLUMN_METADATA_KEY, dv.getSql))
      Option(c.generationExpression()).foreach(ge => md.putString(
        org.apache.spark.sql.catalyst.util.GeneratedColumn
          .GENERATION_EXPRESSION_METADATA_KEY, ge))
      org.apache.spark.sql.types.StructField(
        c.name, c.dataType, c.nullable, md.build())
    }
    // IDENTITY specs (GENERATED ALWAYS/BY DEFAULT AS IDENTITY):
    // start/step/allow-explicit plus a consumed-count of 0 — committed
    // with the create, not after it
    val identities = columns.flatMap(c => Option(c.identityColumnSpec())
      .map(is => (JournalStore.IdentityPrefix + c.name) ->
        JournalStore.packIdentity(JournalStore.IdentitySpec(
          is.getStart, is.getStep, is.isAllowExplicitInsert, 0L)))).toMap
    createTable(ident, StructType(structFields), partitions, properties,
      identities)
  }

  /** StructType create with extra initial properties (the v2-Column
    * overload's identity specs) — one atomic manifest commit. */
  private def createTable(ident: Identifier, schema: StructType,
                          partitions: Array[Transform],
                          properties: util.Map[String, String],
                          extraMeta: Map[String, String]): Table =
    if (extraMeta.isEmpty) createTable(ident, schema, partitions, properties)
    else {
      // stash the identity specs where the StructType path's create
      // call can fold them into the same initial manifest
      identitySideChannel.set(extraMeta)
      try createTable(ident, schema, partitions, properties)
      finally identitySideChannel.remove()
    }

  /** Thread-local hand-off from the v2-Column overload to the
    * StructType path (both are public TableCatalog API, so the extra
    * properties cannot ride a parameter without breaking the base
    * signature). */
  private val identitySideChannel =
    new ThreadLocal[Map[String, String]] {
      override def initialValue(): Map[String, String] = Map.empty
    }

  /** ALTER TABLE, the subset a manifest-pinned store can honor safely:
    * ADD COLUMNS (nullable, top-level — widens the pinned DDL, zero
    * rewrite), DROP COLUMN (leaves the DDL instantly; bytes forgotten at
    * the next full compact — the store's resurrection guard applies),
    * SET/UNSET TBLPROPERTIES. Renames and retypes are refused: parquet
    * resolves columns by NAME, so either would silently re-map existing
    * bytes (the hazard Delta gates behind column mapping). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathFor(ident)
    if (!JournalStore.exists(p)) throw new NoSuchTableException(ident)
    val store = JournalStore.open(SparkSession.active, p)
    // translate the WHOLE statement first, then land it as ONE manifest
    // commit (JournalStore.alterSchema) — per-change commits would leave
    // a failing statement half-applied, durably (DDL atomicity; Delta
    // applies table changes in one transaction)
    val translated = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "journal ALTER TABLE supports top-level columns only")
        require(a.isNullable,
          "journal ALTER TABLE ADD COLUMNS: new columns must be nullable " +
            "(existing rows have no value for them)")
        // the pinned DDL appends new columns at the end; silently
        // accepting FIRST/AFTER would put the column somewhere else
        require(a.position() == null,
          "journal ALTER TABLE ADD COLUMNS: FIRST/AFTER positions are " +
            "not supported — new columns always append at the end of " +
            "the schema")
        JournalStore.AddCol(a.fieldNames()(0), a.dataType())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "journal ALTER TABLE supports top-level columns only")
        JournalStore.DropCol(d.fieldNames()(0), d.ifExists())
      case sp: TableChange.SetProperty =>
        JournalStore.SetProp(sp.property, sp.value)
      case rp: TableChange.RemoveProperty =>
        JournalStore.UnsetProp(rp.property)
      // ALTER COLUMN ... SET DEFAULT <lit> / DROP DEFAULT (DROP arrives
      // as an empty newDefaultValue); validation — constant-only,
      // casts-to-column-type — lives in the store's alterSchema
      case ud: TableChange.UpdateColumnDefaultValue =>
        require(ud.fieldNames.length == 1,
          "journal ALTER TABLE supports top-level columns only")
        val sql = ud.newDefaultValue()
        if (sql == null || sql.isEmpty)
          JournalStore.DropDefault(ud.fieldNames()(0))
        else JournalStore.SetDefault(ud.fieldNames()(0), sql)
      case other => throw new UnsupportedOperationException(
        s"journal ALTER TABLE does not support ${other.getClass.getSimpleName}: " +
          "renames/retypes would re-map existing parquet bytes by name " +
          "(the column-mapping hazard); add/drop/properties are supported")
    }
    store.alterSchema(translated)
    loadTable(ident)
  }

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

  // ---- stored procedures (SQL CALL) ---------------------------------------
  // The store's two maintenance operations as DSv2 procedures, so an
  // operator never needs the Scala API for day-2 work:
  //   CALL <catalog>.system.compact(table => 'clicks')
  //   CALL <catalog>.system.vacuum(table => 'clicks', retain => 2, grace_ms => 0)
  // Both run driver-side against the named store and return no rows
  // (results — file counts, reclaimed bytes — belong to segmentStats
  // reads, not the maintenance call).

  private val SystemNs = Array("system")

  private val ProcedureNames = Seq("compact", "vacuum", "restore",
    "checkpoint", "purge_deletes", "zorder", "add_constraint",
    "drop_constraint", "set_property", "refresh_rollup", "history",
    "clone", "analyze", "expire", "sync_identity", "detail", "advise")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(SystemNs))
      ProcedureNames.map(Identifier.of(SystemNs, _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!ident.namespace.sameElements(SystemNs))
      throw new IllegalArgumentException(
        s"journal procedures live in the 'system' namespace, got $ident")
    ident.name match {
      case "compact" => new CompactProcedure
      case "vacuum"  => new VacuumProcedure
      case "restore" => new RestoreProcedure
      case "checkpoint" => new CheckpointProcedure
      case "purge_deletes" => new PurgeDeletesProcedure
      case "zorder" => new ZorderProcedure
      case "add_constraint" => new AddConstraintProcedure
      case "drop_constraint" => new DropConstraintProcedure
      case "set_property" => new SetPropertyProcedure
      case "refresh_rollup" => new RefreshRollupProcedure
      case "history" => new HistoryProcedure
      case "clone" => new CloneProcedure
      case "analyze" => new AnalyzeProcedure
      case "expire" => new ExpireProcedure
      case "maintain" => new MaintainProcedure
      case "sync_identity" => new SyncIdentityProcedure
      case "detail" => new DetailProcedure
      case "advise" => new AdviseProcedure
      case other => throw new IllegalArgumentException(
        s"unknown journal procedure '$other' (available: " +
          ProcedureNames.map("system." + _).mkString(", ") + ")")
    }
  }

  /** Resolve a procedure's `table` argument (dots = subdirectories,
    * mirroring pathFor) to an open store. */
  private def storeForName(table: String): JournalStore = {
    val p = (root +: table.split('.').toSeq).mkString("/")
    if (!JournalStore.exists(p))
      throw new NoSuchTableException(Identifier.of(
        table.split('.').dropRight(1), table.split('.').last))
    JournalStore.open(SparkSession.active, p)
  }

  private def noRows: util.Iterator[Scan] = util.Collections.emptyIterator()

  private class CompactProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite a journal table's fragmented (epoch, ns) directories into " +
        "one file per directory; cluster_by_key additionally sorts rows " +
        "by ukey for row-group pruning; ns scopes the rewrite to one " +
        "namespace (OPTIMIZE ... WHERE)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("up_to_epoch", LongType).defaultValue("-1")
        .comment("only compact epochs <= this; -1 = every epoch").build(),
      ProcedureParameter.in("cluster_by_key", BooleanType).defaultValue("false")
        .build(),
      ProcedureParameter.in("ns", StringType).defaultValue("NULL")
        .comment("compact only this namespace's directories " +
          "(partial OPTIMIZE); NULL = the whole store").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val upTo = if (input.isNullAt(1) || input.getLong(1) < 0L) Long.MaxValue
                 else input.getLong(1)
      val byKey = !input.isNullAt(2) && input.getBoolean(2)
      if (input.isNullAt(3)) store.compact(upTo, byKey)
      else store.compactNs(input.getUTF8String(3).toString, upTo, byKey)
      noRows
    }
  }

  private class VacuumProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "delete segment files no retained manifest version references; " +
        "grace_ms bounds how young a file may be and still be deleted; " +
        "dry_run => true RETURNS the would-delete set and deletes nothing"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("retain", IntegerType)
        .defaultValue(JournalStore.RetainedVersions.toString)
        .comment("how many newest manifest versions keep their files").build(),
      ProcedureParameter.in("grace_ms", LongType).defaultValue("-1")
        .comment("age-based deletion grace; -1 = store default (30 min)").build(),
      ProcedureParameter.in("dry_run", BooleanType).defaultValue("false")
        .comment("report the would-delete (kind, path) set; delete nothing")
        .build())
    private val dryRunSchema = StructType.fromDDL("kind STRING, path STRING")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val retain = if (input.isNullAt(1)) JournalStore.RetainedVersions
                   else input.getInt(1)
      val grace = if (input.isNullAt(2) || input.getLong(2) < 0L)
                    JournalStore.DefaultVacuumGraceMs
                  else input.getLong(2)
      if (!input.isNullAt(3) && input.getBoolean(3)) {
        val planRows = store.vacuumDryRun(retain, grace).map { case (k, p) =>
          InternalRow.fromSeq(Seq[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(k),
            org.apache.spark.unsafe.types.UTF8String.fromString(p)))
        }.toArray
        val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
          override def readSchema(): StructType = dryRunSchema
          override def rows(): Array[InternalRow] = planRows
        }
        util.Collections.singletonList(scan).iterator()
      } else {
        store.vacuum(retain, grace)
        noRows
      }
    }
  }

  private class RestoreProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "roll a journal table back to a retained manifest version, " +
        "committed as a NEW version (history is never rewritten)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("version", LongType).defaultValue("-1")
        .comment("retained manifest version to restore to " +
          "(exactly one of version/timestamp)").build(),
      ProcedureParameter.in("timestamp", StringType).defaultValue("NULL")
        .comment("UTC commit wall-clock bound: restore to the newest " +
          "retained version committed at or before it (RESTORE TO " +
          "TIMESTAMP)").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val byVersion = !input.isNullAt(1) && input.getLong(1) >= 0L
      val byTs = !input.isNullAt(2)
      require(byVersion ^ byTs,
        "restore takes exactly one of version => N / timestamp => 'ts'")
      if (byVersion) store.restore(input.getLong(1))
      else store.restoreToTs(java.sql.Timestamp.valueOf(
        input.getUTF8String(2).toString))
      noRows
    }
  }

  private class CheckpointProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "checkpoint"
    override def description(): String =
      "materialize the per-key state at a seq (default: the current " +
        "high water) so future state reads replay only the tail after it"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("seq", LongType).defaultValue("-1")
        .comment("state upper bound; -1 = the table's current maxSeq").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val seq = if (input.isNullAt(1) || input.getLong(1) < 0L)
                  store.manifest.maxSeq
                else input.getLong(1)
      store.checkpoint(seq)
      noRows
    }
  }

  private class PurgeDeletesProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "purge_deletes"
    override def description(): String =
      "physically rewrite segment files whose deletion-vector dead " +
        "fraction reaches the threshold, then drop their vector entries " +
        "(Delta's PURGE); files below the threshold keep serving " +
        "subtracted reads"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("min_dead_fraction", DoubleType).defaultValue("0.1")
        .comment("rewrite a file when dead rows / total rows >= this").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val frac = if (input.isNullAt(1)) 0.1 else input.getDouble(1)
      store.purgeDeletes(frac)
      noRows
    }
  }

  private class ZorderProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "zorder"
    override def description(): String =
      "compact with a Z-ORDER layout: rows re-clustered by the " +
        "interleaved bits of the named columns, so multi-column range " +
        "probes prune files AND row groups (Delta's OPTIMIZE ZORDER BY)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("columns", StringType)
        .comment("comma-separated column list (max 8, 64 z-bits)").build(),
      ProcedureParameter.in("up_to_epoch", LongType).defaultValue("-1")
        .comment("only rewrite epochs <= this; -1 = every epoch").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val cols = input.getUTF8String(1).toString.split(',')
        .map(_.trim).filter(_.nonEmpty).toSeq
      val upTo = if (input.isNullAt(2) || input.getLong(2) < 0L) Long.MaxValue
                 else input.getLong(2)
      store.compact(upTo, cols)
      noRows
    }
  }

  private class AddConstraintProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "add_constraint"
    override def description(): String =
      "add a CHECK constraint (validated against existing rows first; " +
        "every future append pays one pass over the batch, never the store)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("name", StringType)
        .comment("constraint name (drop_constraint takes it)").build(),
      ProcedureParameter.in("expr", StringType)
        .comment("boolean SQL over the table's columns, e.g. 'val >= 0'")
        .build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      storeForName(input.getUTF8String(0).toString)
        .addConstraint(input.getUTF8String(1).toString,
          input.getUTF8String(2).toString)
      noRows
    }
  }

  private class DropConstraintProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_constraint"
    override def description(): String = "drop a CHECK constraint by name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("name", StringType).build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      storeForName(input.getUTF8String(0).toString)
        .dropConstraint(input.getUTF8String(1).toString)
      noRows
    }
  }

  private class SetPropertyProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "set_property"
    override def description(): String =
      "set one table property (TBLPROPERTIES), committed under the " +
        "manifest CAS like any other metadata change; last write wins"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("key", StringType).build(),
      ProcedureParameter.in("value", StringType).build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      storeForName(input.getUTF8String(0).toString)
        .setMeta(Map(input.getUTF8String(1).toString ->
          input.getUTF8String(2).toString))
      noRows
    }
  }

  /** The incremental-materialized-view lifecycle by SQL: fold the
    * source table's NET change window since the rollup's last sync
    * into the rollup table (ops.MaterializedRollup) — one merge
    * commit, exactly-once, O(window). `keys`/`sums` are
    * comma-separated source column names; read the rollup back with
    * MaterializedRollup.read (or parse ns/payload JSON directly). */
  private class RefreshRollupProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "refresh_rollup"
    override def description(): String =
      "synchronize a rollup journal table to its source table's current " +
        "version: fold the net change window, land upserts + dead-group " +
        "deletes + the sync marker in one merge commit"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("source", StringType)
        .comment("source table name under this catalog").build(),
      ProcedureParameter.in("rollup", StringType)
        .comment("rollup table name under this catalog (create it first)")
        .build(),
      ProcedureParameter.in("keys", StringType)
        .comment("comma-separated group-key columns of the source").build(),
      ProcedureParameter.in("sums", StringType)
        .comment("comma-separated summed columns of the source").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val src = storeForName(input.getUTF8String(0).toString)
      val dst = storeForName(input.getUTF8String(1).toString)
      def cols(i: Int) = input.getUTF8String(i).toString
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      graft.ops.MaterializedRollup.refresh(src, dst, cols(2), cols(3))
      noRows
    }
  }

  /** `CALL <cat>.system.clone(table => 'clicks', dest => 'clicks_dev')`
    * — zero-copy clone by NAME: the dest becomes a full catalog table
    * (hard links share segment/sidecar/vector bytes; state diverges
    * independently from the first commit on either side). O(manifest)
    * link calls — a 100 TB table clones without moving a byte. */
  private class CloneProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "clone"
    override def description(): String =
      "zero-copy clone of a journal table to a new table name under " +
        "this catalog (hard-linked bytes, independent state from the " +
        "first commit on either side)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("source table name under this catalog").build(),
      ProcedureParameter.in("dest", StringType)
        .comment("new table name under this catalog (must not exist)").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val dest = input.getUTF8String(1).toString
      storeForName(input.getUTF8String(0).toString)
        .cloneTo((root +: dest.split('.').toSeq).mkString("/"))
      noRows
    }
  }

  /** `CALL <cat>.system.history(table => 'clicks')` — DESCRIBE HISTORY
    * for journal tables, serving [[JournalStore.commitHistory]]'s frame:
    * one row per retained manifest version (what produced it, the seq
    * high water, file/row/checkpoint/vector geometry, commit wall
    * clock). Unlike the maintenance procedures this one RETURNS rows —
    * a driver-sized `LocalScan` (the result is bounded by
    * [[JournalStore.RetainedVersions]] manifest parses; no segment file
    * is opened), so the operator-facing audit surface needs no Scala.
    * (The TVF spelling `journal_commits('/path')` serves path users;
    * this CALL serves catalog-table users.) */
  private class HistoryProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "one row per retained manifest version of a journal table: " +
        "version, operation, seq high water, live file / row / " +
        "checkpoint / deletion-vector counts, commit wall clock " +
        "(DESCRIBE HISTORY)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build())
    private val schema = StructType.fromDDL(
      "version BIGINT, op STRING, max_seq BIGINT, n_files BIGINT, " +
        "n_rows BIGINT, n_checkpoints BIGINT, n_dv_parts BIGINT, " +
        "commit_ts_ms BIGINT")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val histRows = store.commitHistory().collect() // RetainedVersions-bounded
        .map { r =>
          InternalRow.fromSeq(Seq[Any](r.getLong(0),
            org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
            r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), r.getLong(7)))
        }
      val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = histRows
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  /** DESCRIBE DETAIL as a SQL CALL: the one-row operational summary of
    * a journal table (Delta's DESCRIBE DETAIL) — manifest version /
    * seq high water / live file count / exact row count / on-disk
    * bytes / checkpoint + DV part counts / schema + governance feature
    * counts — answered from the MANIFEST alone: zero data files opened
    * at any store size (rows from the per-file stats the scan's
    * metadata-only aggregates already serve; bytes from a directory
    * stat walk of the listed files). */
  private class DetailProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "detail"
    override def description(): String =
      "one-row operational summary of a journal table (DESCRIBE " +
        "DETAIL): version, maxSeq, files, rows, bytes, checkpoints, " +
        "dv parts, constraint/default/generated/identity counts"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build())
    private val schema = StructType.fromDDL(
      "location STRING, version BIGINT, max_seq BIGINT, epoch_size BIGINT, " +
        "n_files BIGINT, n_rows BIGINT, size_bytes BIGINT, " +
        "n_checkpoints BIGINT, n_dv_parts BIGINT, n_constraints BIGINT, " +
        "n_defaults BIGINT, n_generated BIGINT, n_identity BIGINT, " +
        "analyzed_rows BIGINT")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val m = store.manifest
      val rows: Long = m.fstats.map(_.rows).sum
      // size stats distribute: one stat call per file, but spread over
      // the cluster (a 10⁶-file store must not serialize 10⁶ driver
      // stat calls behind a DESCRIBE)
      val segRoot = store.path
      val bytes: Long =
        if (m.files.isEmpty) 0L
        else SparkSession.active.sparkContext
          .parallelize(m.files, math.min(64, m.files.size))
          .map { f =>
            val p = java.nio.file.Paths.get(segRoot, "segments", f)
            try java.nio.file.Files.size(p) catch { case _: Exception => 0L }
          }.sum().toLong
      def nPre(pre: String): Long =
        m.meta.keys.count(_.startsWith(pre)).toLong
      val row = InternalRow.fromSeq(Seq[Any](
        org.apache.spark.unsafe.types.UTF8String.fromString(store.path),
        m.version, m.maxSeq, m.epochSize, m.files.size.toLong, rows, bytes,
        m.checkpoints.size.toLong, m.dvParts.size.toLong,
        nPre("constraint."), nPre("default."), nPre("generated."),
        m.meta.keys.count(k => k.startsWith("identity.")).toLong,
        store.analyzedRowCount.getOrElse(-1L)))
      val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = Array(row)
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  /** Skew/layout advisor as a SQL CALL (round 18): surface the
    * per-file sketch metrics — namespace fragmentation, per-column
    * range interleaving, per-key density from the per-file HLL ndv —
    * with heuristic `compact` / `zorder` / `salt` labels. Metadata
    * only: manifest fstats + the LRU-cached cstats sidecar; zero data
    * files open. See [[JournalStore.advise]] for the semantics. */
  private class AdviseProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "advise"
    override def description(): String =
      "skew/layout advisor from manifest + per-file column sketches: " +
        "per-namespace fragmentation (compact candidates), per-column " +
        "range interleaving (z-order candidates) and rows-per-key " +
        "density (salting candidates) — metadata only, no data reads"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build())
    private val schema = StructType.fromDDL(
      "scope STRING, name STRING, files BIGINT, rows BIGINT, " +
        "metric DOUBLE, detail STRING, advice STRING")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val out = storeForName(input.getUTF8String(0).toString)
        .advise().map { r =>
          InternalRow.fromSeq(Seq[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(r.scope),
            org.apache.spark.unsafe.types.UTF8String.fromString(r.name),
            r.files, r.rows, r.metric,
            org.apache.spark.unsafe.types.UTF8String.fromString(r.detail),
            org.apache.spark.unsafe.types.UTF8String.fromString(r.advice)))
        }.toArray
      val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = out
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  /** ALTER TABLE ... SYNC IDENTITY as a SQL CALL: re-arm a BY DEFAULT
    * identity counter past the column's current max (explicit inserts
    * do not advance it), so generation resumes collision-free. */
  private class SyncIdentityProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "sync_identity"
    override def description(): String =
      "advance an identity column's counter past the column's current " +
        "maximum (SYNC IDENTITY after explicit BY DEFAULT inserts)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("column", StringType)
        .comment("the identity column to sync").build())
    override def call(input: InternalRow): util.Iterator[Scan] = {
      storeForName(input.getUTF8String(0).toString)
        .syncIdentity(input.getUTF8String(1).toString)
      noRows
    }
  }

  /** Retention sweep as a SQL CALL: physically erase rows older than a
    * wall-clock bound (GDPR/TTL enforcement — the scheduled job every
    * production log runs). Thin spelling of deleteWhere(ts < bound),
    * which already prunes candidate files through the manifest's
    * per-file ts ranges (the round-15 seq/ts-range pruning), so an
    * expire over a 100 TB log rewrites only the files whose range can
    * overlap the bound. Returns the erased-row count. */
  private class ExpireProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "expire"
    override def description(): String =
      "physically delete rows with ts older than the given timestamp " +
        "(retention/TTL sweep; ts-range file pruning applies); returns " +
        "n_deleted"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("older_than", StringType)
        .comment("UTC timestamp literal; rows with ts strictly older " +
          "are erased").build())
    private val schema = StructType.fromDDL("n_deleted BIGINT")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val bound = input.getUTF8String(1).toString
      val n = store.deleteWhere(
        org.apache.spark.sql.functions.col("ts") <
          org.apache.spark.sql.functions.to_timestamp(
            org.apache.spark.sql.functions.lit(bound)))
      val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(Seq[Any](n)))
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  /** The DECLARED-retention sweep as a SQL CALL: TTL as a table
    * attribute (`retention.olderThan` property, an SQL interval body)
    * rather than a bound someone must remember to pass —
    * `CALL system.maintain(table => 't')` erases rows older than
    * now − interval through the same ts-range-pruned deleteWhere the
    * expire verb uses, and is a metadata-only no-op when nothing
    * qualifies (or when no policy is declared). */
  private class MaintainProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "maintain"
    override def description(): String =
      "run the table's declared retention policy (retention.olderThan " +
        "property): physically delete rows with ts older than " +
        "now - interval; no-op without a declared policy; then act on " +
        "the advisor's layout labels (compact fragmented namespaces, " +
        "z-order cluster advised columns); returns (n_deleted, " +
        "n_layout_actions)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build())
    private val schema =
      StructType.fromDDL("n_deleted BIGINT, n_layout_actions BIGINT")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val n = store.maintain()
      // round 19: the maintenance verb also CONSUMES the advisor —
      // the readout stops being a dashboard an operator must act on
      val acted = store.maintainLayout()
      val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(Seq[Any](n, acted)))
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  /** ANALYZE TABLE as a SQL CALL — the pure-SQL operator's spelling of
    * JournalStore.analyze (Delta/ANSI `ANALYZE TABLE ... COMPUTE
    * STATISTICS FOR COLUMNS`): computes + commits the stats, RETURNS
    * the recorded per-column summary so the operator sees what the
    * planner will be fed. Subsequent reads of the table serve these
    * stats to CBO through the scan's DSv2 columnStats until a write
    * stales them. */
  private class AnalyzeProcedure extends UnboundProcedure with BoundProcedure {
    override def name(): String = "analyze"
    override def description(): String =
      "compute per-column statistics (null count, typed min/max, HLL " +
        "ndv) over a journal table's current rows, persist them as " +
        "table properties for the optimizer, and return the recorded " +
        "summary (ANALYZE TABLE ... FOR COLUMNS)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name under this catalog").build(),
      ProcedureParameter.in("columns", StringType).defaultValue("NULL")
        .comment("comma-separated column subset; NULL = every visible " +
          "column (epoch excluded — derived layout)").build())
    private val schema = StructType.fromDDL(
      "col_name STRING, n_rows BIGINT, n_nulls BIGINT, ndv BIGINT, " +
        "vmin STRING, vmax STRING")
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val store = storeForName(input.getUTF8String(0).toString)
      val cols =
        if (input.isNullAt(1)) Nil
        else input.getUTF8String(1).toString.split(',').toSeq
          .map(_.trim).filter(_.nonEmpty)
      store.analyze(cols)
      val rows = store.analyzedRowCount.getOrElse(0L)
      def utf(s: Option[String]) =
        s.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull
      val statRows = store.analyzedColumnStats.toSeq.sortBy(_._1).map {
        case (c, r) => InternalRow.fromSeq(Seq[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(c),
          rows, r.nulls, r.ndv, utf(r.min), utf(r.max)))
      }.toArray
      val scan: Scan = new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] = statRows
      }
      util.Collections.singletonList(scan).iterator()
    }
  }
}
