package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.LakeTable

/** A Spark `TableCatalog` over a directory of graft-lake tables, so
  * lake tables are NAMEABLE in SQL — the front door the reference
  * user's `spark.sql("SELECT … FROM catalog.db.t")` expects next to
  * the format API:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.root", "/lake")
  * spark.sql("CREATE TABLE graft.db.t AS SELECT …")       // CTAS
  * spark.sql("INSERT INTO graft.db.t SELECT …")           // OCC commit
  * spark.sql("SELECT * FROM graft.db.t VERSION AS OF 1")  // time travel
  * spark.sql("SELECT * FROM graft.db.t TIMESTAMP AS OF …")
  * }}}
  *
  * Identifier → path mapping is `root/<namespace…>/<name>`; a table
  * IS its directory (manifest + data files), so the catalog itself is
  * stateless — on a cluster the same layout lives on the object
  * store, and the only catalog state that would need a real service
  * is the commit CAS ([[LakeTable]] scaladoc). `CREATE TABLE` records
  * the declared schema in a pending file that the first commit's
  * manifest supersedes; an empty created table reads as zero rows of
  * that schema.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.ViewCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  /** Column DEFAULT support: `CREATE TABLE (c T DEFAULT v)` and
    * `ALTER TABLE … ADD COLUMN c T DEFAULT v` arrive with the default
    * attached; the engine stores it as Spark's own
    * CURRENT_DEFAULT/EXISTS_DEFAULT field metadata, which makes the
    * feature metadata-only end to end — INSERT resolution fills the
    * write default, and the parquet readers fill the initial default
    * for files written before the column existed.
    */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE)

  // ---- SQL CALL: table-maintenance procedures ----
  //
  // The operational verbs every lake needs — compaction, MoR-debt
  // folding, retention, orphan sweep, rollback, tags, branch publish
  // — as genuine Spark `ProcedureCatalog` procedures:
  //   CALL graft.system.compact(table => 'db.t')
  //   CALL graft.system.rollback('db.t', 1)
  // Each returns a one-row result (new snapshot / reclaimed count)
  // served through a LocalScan.

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().isEmpty || ident.namespace().sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace().mkString(".")}")
    GraftProcedures(this, ident.name())
  }

  /** Table-name argument (`'db.t'`) → directory under this catalog.
    * The raw CALL string bypasses Spark's identifier parsing, so each
    * dotted segment is validated — a '/' or '..' segment would
    * otherwise escape the catalog root and point maintenance
    * procedures at directories the catalog does not own.
    */
  private[graft] def tableDir(name: String): String = {
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z0-9_-]+")),
      s"invalid table name '$name': expected dot-separated [A-Za-z0-9_-] segments")
    val dir = Paths.get(root, parts: _*)
    require(isTable(dir), s"no table '$name' in catalog $catalogName")
    dir.toString
  }

  /** Like [[tableDir]] but for a table being CREATED (clone targets):
    * validated name, must NOT already exist.
    */
  private[graft] def newTableDir(name: String): String = {
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(_.matches("[A-Za-z0-9_-]+")),
      s"invalid table name '$name': expected dot-separated [A-Za-z0-9_-] segments")
    val dir = Paths.get(root, parts: _*)
    require(!isTable(dir), s"table '$name' already exists in catalog $catalogName")
    dir.toString
  }

  // ---- namespaces (SupportsNamespaces) ----
  //
  // A namespace IS a directory that is not a table (the same
  // statelessness rule as tables and views): `CREATE NAMESPACE` is
  // mkdir, `SHOW NAMESPACES` lists non-table child dirs, `DROP
  // NAMESPACE` refuses non-empty unless CASCADE. Metadata-bearing
  // namespaces (properties) are not stored — alterNamespace rejects.

  private def nsDir(namespace: Array[String]): Path =
    Paths.get(root, namespace: _*)

  private def isNamespace(p: Path): Boolean =
    Files.isDirectory(p) && !isTable(p) && !p.getFileName.toString.contains(".")

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || isNamespace(nsDir(namespace))

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val base = nsDir(namespace)
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    if (!Files.isDirectory(base)) return Array.empty
    val s = Files.list(base)
    try s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala
      .filter(isNamespace)
      .map(p => namespace :+ p.getFileName.toString).toArray
    finally s.close()
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace.toSeq)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    require(namespace.forall(_.matches("[A-Za-z0-9_-]+")),
      s"invalid namespace ${namespace.mkString(".")}")
    val d = nsDir(namespace)
    if (Files.isDirectory(d))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(d): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-lake namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!isNamespace(d)) return false
    val nonEmpty = { val s = Files.list(d); try s.iterator().hasNext finally s.close() }
    if (nonEmpty && !cascade)
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace, "namespace is not empty (use CASCADE)", None)
    val walk = Files.walk(d)
    try walk.sorted(Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p): Unit })
    finally walk.close()
    true
  }

  // ---- SQL views (ViewCatalog) ----
  //
  // `CREATE VIEW graft.db.v AS SELECT …` persists the view TEXT plus
  // its resolution context (catalog/namespace, schema, column
  // aliases) as one JSON file next to the tables —
  // `root/<ns…>/<name>.view.json`. Views are pure metadata: the
  // stored SQL re-analyzes against the CURRENT table state on every
  // read, so a view over an evolving lake table follows schema
  // evolution and snapshot growth with zero maintenance, and the
  // catalog stays stateless (a file IS the view, same as a directory
  // IS a table).

  private val viewMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def viewFile(ident: Identifier): Path =
    Paths.get(root, ident.namespace() :+ (ident.name() + ".view.json"): _*)

  override def viewExists(ident: Identifier): Boolean =
    Files.isRegularFile(viewFile(ident))

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(ns)) Array.empty
    else {
      val s = Files.list(ns)
      try s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala
        .filter(p => p.getFileName.toString.endsWith(".view.json"))
        .map(p => Identifier.of(namespace.toArray,
          p.getFileName.toString.stripSuffix(".view.json"))).toArray
      finally s.close()
    }
  }

  override def loadView(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.View = {
    val f = viewFile(ident)
    if (!Files.isRegularFile(f))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    val node = viewMapper.readTree(Files.readString(f))
    def strs(field: String): Array[String] =
      if (!node.has(field)) Array.empty
      else scala.jdk.CollectionConverters.IteratorHasAsScala(
        node.get(field).elements()).asScala.map(_.asText()).toArray
    new org.apache.spark.sql.connector.catalog.View {
      override def name(): String = ident.toString
      override def query(): String = node.get("sql").asText()
      override def currentCatalog(): String = node.get("currentCatalog").asText()
      override def currentNamespace(): Array[String] = strs("currentNamespace")
      override def schema(): StructType =
        DataType.fromJson(node.get("schema").asText()).asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] = strs("queryColumnNames")
      override def columnAliases(): Array[String] = strs("columnAliases")
      override def columnComments(): Array[String] = strs("columnComments")
      override def properties(): java.util.Map[String, String] = {
        val m = new java.util.HashMap[String, String]()
        if (node.has("properties")) {
          val p = node.get("properties")
          scala.jdk.CollectionConverters.IteratorHasAsScala(p.fieldNames())
            .asScala.foreach(k => m.put(k, p.get(k).asText()))
        }
        m
      }
    }
  }

  override def createView(info: org.apache.spark.sql.connector.catalog.ViewInfo)
      : org.apache.spark.sql.connector.catalog.View = {
    val ident = info.ident()
    val f = viewFile(ident)
    if (Files.isRegularFile(f))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    if (isTable(Paths.get(root, ident.namespace() :+ ident.name(): _*)))
      throw new TableAlreadyExistsException(ident)
    Files.createDirectories(f.getParent)
    val o = viewMapper.createObjectNode()
    o.put("sql", info.sql())
    o.put("currentCatalog", info.currentCatalog())
    val cns = o.putArray("currentNamespace")
    info.currentNamespace().foreach(cns.add)
    o.put("schema", info.schema().json)
    val qcn = o.putArray("queryColumnNames")
    info.queryColumnNames().foreach(qcn.add)
    val ca = o.putArray("columnAliases")
    info.columnAliases().foreach(ca.add)
    val cc = o.putArray("columnComments")
    info.columnComments().foreach(cc.add)
    val props = o.putObject("properties")
    info.properties().forEach((k, v) => { props.put(k, v): Unit })
    Files.writeString(f, viewMapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(o))
    loadView(ident)
  }

  override def alterView(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.ViewChange*)
      : org.apache.spark.sql.connector.catalog.View =
    throw new UnsupportedOperationException(
      "graft-lake views are immutable metadata: DROP and re-CREATE " +
        "(CREATE OR REPLACE VIEW) instead of ALTER")

  override def dropView(ident: Identifier): Boolean =
    Files.deleteIfExists(viewFile(ident))

  override def renameView(from: Identifier, to: Identifier): Unit = {
    val src = viewFile(from)
    if (!Files.isRegularFile(src))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(from)
    val dst = viewFile(to)
    if (Files.isRegularFile(dst))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(to)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst): Unit
  }

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val raw = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root=<dir>"))
    // Normalize to an ABSOLUTE path at the single entry point: staged
    // commits (RTAS) re-point metadata by matching absolute normalized
    // staging paths against the paths LakeTable recorded from this
    // root — a relative root would make that match silently miss and
    // leave a committed table referencing its deleted staging dir.
    root = Paths.get(raw).toAbsolutePath.normalize.toString
  }

  override def name(): String = catalogName

  /** The root this INSTANCE was pinned to at initialize time. Spark
    * caches catalog plugins per session at first use — a later
    * `spark.sql.catalog.<name>.root` conf change is silently ignored
    * — so anything that derives filesystem paths for this catalog's
    * tables must ask the live instance, never re-read the conf.
    */
  private[graft] def rootDir: String = root

  private def dirOf(ident: Identifier): Path =
    Paths.get(root, ident.namespace() :+ ident.name(): _*)

  private def isTable(p: Path): Boolean = Files.isDirectory(p.resolve("meta")) ||
    Files.isRegularFile(p.resolve("meta/_schema.json"))

  private def spark: SparkSession = SparkSession.active

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = Paths.get(root, namespace: _*)
    if (!Files.isDirectory(ns)) Array.empty
    else {
      val s = Files.list(ns)
      // in-flight staged CTAS dirs (`<name>.staging-<n>`) are working
      // state, not tables — table names reject '.', so filtering on
      // it hides exactly the staged/trash dirs
      try s.iterator().asInstanceOf[java.util.Iterator[Path]]
        .asScala.filter(p => isTable(p) && !p.getFileName.toString.contains("."))
        .map(p => Identifier.of(namespace, p.getFileName.toString)).toArray
      finally s.close()
    }
  }

  private implicit class IterOps[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }

  private def load(ident: Identifier, asOf: Option[Int]): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) {
      // Iceberg-style METADATA TABLES: `SELECT * FROM cat.ns.t.history`
      // resolves here with namespace [ns, t] and name "history" —
      // when the namespace path IS a lake table, serve its metadata
      // (manifest-only; zero data-file IO at any table size).
      if (ident.namespace().nonEmpty) {
        val pDir = Paths.get(root, ident.namespace(): _*)
        if (isTable(pDir) && LakeTable.currentSnapshot(pDir.toString) > 0) {
          val t = pDir.toString
          ident.name() match {
            case "history" =>
              return new GraftMetadataTable(s"$t#history",
                LakeTable.history(spark, t))
            case "files" =>
              return new GraftMetadataTable(s"$t#files", filesDf(t))
            case "tags" =>
              return new GraftMetadataTable(s"$t#tags", tagsDf(t))
            case "branches" =>
              return new GraftMetadataTable(s"$t#branches", branchesDf(t))
            case "partitions" =>
              return new GraftMetadataTable(s"$t#partitions", partitionsDf(t))
            case "stats" =>
              return new GraftMetadataTable(s"$t#stats", statsDf(t))
            case "mv" if graft.lake.MaterializedView.isMv(t) =>
              // the MV's definition + (fact, dim) basis as a
              // history-style metadata row
              return new GraftMetadataTable(s"$t#mv",
                graft.lake.MaterializedView.statusDf(spark, t))
            case "mvs" =>
              // the FACT side: every registered MV over this table
              // with kind/grouping/measures/FRESHNESS — which rollups
              // cover it, and can a query trust them right now
              return new GraftMetadataTable(s"$t#mvs",
                graft.lake.MaterializedView.mvsDf(spark, t))
            case _ => ()
          }
        }
      }
      throw new NoSuchTableException(ident)
    }
    val pendingPath = dir.resolve("meta").resolve("_schema.json")
    val pending =
      if (LakeTable.currentSnapshot(dir.toString) == 0 && Files.exists(pendingPath))
        Some(DataType.fromJson(Files.readString(pendingPath)).asInstanceOf[StructType])
      else None
    new GraftLakeTable(spark, dir.toString, asOf, pending)
  }

  /** The head snapshot's file inventory (Iceberg's `files` metadata
    * table): one row per live data file straight from the manifest.
    */
  private def filesDf(table: String) = {
    val m = LakeTable.manifest(table, LakeTable.currentSnapshot(table))
    val s = spark
    import s.implicits._
    // per-file NDV estimates from the ANALYZE sketches (empty map
    // until the table is analyzed / for files appended since)
    val meta = LakeTable.colStats(table)
    val sketches = meta.map(_.files).getOrElse(Map.empty)
    val width = meta.map(_.buckets).getOrElse(LakeTable.NdvBuckets)
    m.files.map { f =>
      val ndv: Map[String, Long] = sketches.get(LakeTable.sketchKeyOf(f.path))
        .map(_.cols.map { case (c, sk) =>
          c -> LakeTable.ndvEstimate(sk.bits.cardinality(), width)
        })
        .getOrElse(Map.empty)
      (f.path, f.rows, f.bytes, f.seq.toLong, f.stats.size.toLong, f.bucket, ndv)
    }.toDF("path", "rows", "bytes", "seq", "n_stat_cols", "bucket", "ndv")
  }

  /** Named snapshot refs (`t.tags`): retention pins, from metadata. */
  private def tagsDf(table: String) = {
    val s = spark
    import s.implicits._
    LakeTable.tags(table).toSeq.sortBy(_._1)
      .map { case (n, v) => (n, v.toLong) }
      .toDF("name", "snap")
  }

  /** Per-bucket layout accounting (`t.partitions`, Iceberg's
    * `partitions` metadata table): file/row/byte totals per hash
    * bucket straight from the manifest — the skew/health view a table
    * operator checks before trusting a storage-partitioned plan.
    * Unbucketed (or mixed-layout) tables report one bucket = -1 row.
    */
  private def partitionsDf(table: String) = {
    val m = LakeTable.manifest(table, LakeTable.currentSnapshot(table))
    val s = spark
    import s.implicits._
    m.files.groupBy(_.bucket).toSeq.sortBy(_._1)
      .map { case (b, fs) =>
        (b, fs.size.toLong, fs.map(_.rows).sum, fs.map(_.bytes).sum)
      }
      .toDF("bucket", "n_files", "n_rows", "n_bytes")
  }

  /** Persisted ANALYZE output (`t.stats`): one row per analyzed
    * column, merged across the analysis' per-file sketches — exact
    * null/length accounting, exact linear-counting bucket occupancy
    * (`n_occupied`, integer — the cross-engine-replayable core), and
    * the derived NDV estimate the CBO consumes. Zero data-file IO:
    * everything folds from the `_colstats.json` sidecar.
    */
  private def statsDf(table: String) = {
    val s = spark
    import s.implicits._
    val meta = LakeTable.colStats(table).getOrElse(
      throw new IllegalStateException(
        s"table $table has no ANALYZE output; run CALL graft.system.analyze first"))
    val head = LakeTable.currentSnapshot(table)
    val schema = GraftLakeTable.schemaOf(spark, table, head)
    val logicalOf: Map[String, String] =
      if (graft.lake.ColumnMapping.hasMapping(schema))
        graft.lake.ColumnMapping.toPhysical(schema).map(_.swap)
      else Map.empty
    val merged = LakeTable.mergedColStats(meta, meta.files.keys.toSeq).getOrElse(Map.empty)
    merged.toSeq.sortBy(_._1).map { case (c, (occ, nulls, sumLen, rows)) =>
      val nonNull = rows - nulls
      // min/max fold driver-side from the per-file truncated extremes
      // (all-null files carry no extremes and drop out of the fold)
      val extremes = meta.files.values.map(_.cols(c)).filter(_.minS != null)
      // merged equi-height histogram (numeric columns with ANALYZE
      // boundaries): populated bin count + the heaviest bin's share
      // of rows — the operator-visible skew verdict
      val hist = LakeTable.mergedHist(meta, meta.files.keys.toSeq, c)
      (logicalOf.getOrElse(c, c), rows, nulls, occ.toLong,
        LakeTable.ndvEstimate(occ, meta.buckets),
        // saturation verdict: a full bitmap makes ndv_est a FLOOR
        // ("at least"), never a cardinality — surfaced so consumers
        // can see when the sketch ran out of headroom
        LakeTable.ndvSaturated(occ, meta.buckets),
        s"linear_counting_${meta.buckets}",
        if (extremes.isEmpty) null
        else extremes.map(_.minS).reduce(LakeTable.utf8Min),
        if (extremes.isEmpty) null
        else extremes.map(_.maxS).reduce(LakeTable.utf8Max),
        if (nonNull > 0) sumLen / nonNull else -1L,
        hist.map(_.size.toLong).getOrElse(0L),
        hist.filter(_ => nonNull > 0)
          .map(bs => bs.map(_._1).max * 1000L / math.max(1L, nonNull))
          .getOrElse(-1L),
        meta.analyzedSnapshot.toLong)
    }.toDF("col", "n_rows", "n_null", "n_occupied", "ndv_est",
      "ndv_saturated", "sketch",
      "min_v", "max_v", "avg_len", "hist_bins", "top_bin_permille",
      "analyzed_snap")
  }

  /** Open branches (`t.branches`): fork basis + branch head. */
  private def branchesDf(table: String) = {
    val s = spark
    import s.implicits._
    LakeTable.branches(table).toSeq.sortBy(_._1)
      .map { case (n, (basis, head)) => (n, basis.toLong, head.toLong) }
      .toDF("name", "fork_basis", "head")
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF <snapshot-or-ref>`: an integer names the
    * snapshot directly; `branch:<name>` serves the BRANCH chain's
    * head (audit queries run against the staged cut by name); any
    * other string resolves as a TAG name.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.trim
    if (v.startsWith("branch:")) {
      val bRoot = LakeTable.branchRoot(dirOf(ident).toString,
        v.stripPrefix("branch:"))
      if (LakeTable.currentSnapshot(bRoot) == 0)
        throw new NoSuchTableException(ident)
      return new GraftLakeTable(spark, bRoot, None, None)
    }
    // all-digit strings are snapshot ids ([[LakeTable.tag]] rejects
    // all-digit tag names, so no tag can be shadowed); toInt guarded —
    // an over-long digit string is a missing ref, not a crash
    val snap =
      if (v.forall(_.isDigit) && v.nonEmpty)
        scala.util.Try(v.toInt).getOrElse(throw new NoSuchTableException(ident))
      else LakeTable.tags(dirOf(ident).toString).getOrElse(v,
        throw new NoSuchTableException(ident))
    load(ident, Some(snap))
  }

  /** SQL `TIMESTAMP AS OF <ts>` — Spark passes epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, Some(LakeTable.snapshotAsOfTime(dirOf(ident).toString,
      timestampMicros / 1000L)))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val stored = materializeTableDir(dir, schema, partitions, properties)
    new GraftLakeTable(spark, dir.toString, None, Some(stored))
  }

  /** Writes a table directory's declared metadata (schema, layout,
    * CHECK constraints) — shared by CREATE TABLE and the staged
    * (atomic CTAS/RTAS) path, which materializes into a hidden
    * sibling dir and swap-renames on commit.
    */
  private def materializeTableDir(dir: Path, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StructType = {
    Files.createDirectories(dir.resolve("meta"))
    // a from-birth DEFAULT column is a WRITE default only: every data
    // file will physically carry the column, so the Iceberg-style
    // initial default (EXISTS_DEFAULT — what pre-evolution files
    // serve) can never apply. Dropping it here keeps footer-stat
    // shortcuts (aggregate pushdown) available for such tables;
    // ADD COLUMN … DEFAULT on a committed table is where the initial
    // default genuinely arises.
    val stored = StructType(schema.fields.map { f =>
      if (!f.metadata.contains(graft.lake.ColumnMapping.ExistsDefaultKey)) f
      else f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
        .remove(graft.lake.ColumnMapping.ExistsDefaultKey).build())
    })
    Files.writeString(dir.resolve("meta").resolve("_schema.json"), stored.json)
    // DECLARED LAYOUT: `PARTITIONED BY (bucket(n, col))` pins the
    // write clustering — every append shuffles on `col` into exactly
    // `n` buckets, so the storage-partitioned-join spec holds by DDL
    // instead of by column-order accident. `PARTITIONED BY (col)`
    // pins the clustering column alone. Recorded once at create time;
    // the write path reads it back (explicit write options override).
    layoutOf(partitions, schema).foreach { case (c, n, tf) =>
      Files.writeString(dir.resolve("meta").resolve("_layout.json"),
        s"""{"partition_col":"$c","n_buckets":$n,"transform":"$tf"}""")
    }
    // TBLPROPERTIES('graft.check.<name>' = '<boolean sql>') declare
    // CHECK constraints: validated against the declared schema here,
    // stored as pure metadata, enforced in-flight on every write
    // (LakeFormatWrite.applyChecks). Unknown properties (Spark's own
    // reserved keys etc.) pass through untouched.
    properties.forEach { (k, v) =>
      if (k.startsWith("graft.check.")) {
        validateCheck(schema, v)
        LakeTable.setCheck(dir.toString, k.stripPrefix("graft.check."), v)
      } else if (k == graft.lake.AutoMaintain.AutoCompactKey ||
          k == graft.lake.AutoMaintain.AutoManifestKey ||
          k == graft.lake.AutoMaintain.AutoParallelismKey)
        // auto-maintenance thresholds (fire post-commit, best-effort)
        graft.lake.AutoMaintain.setPolicy(dir.toString, k, v.trim.toLong)
    }
    stored
  }

  // ---- atomic CTAS / RTAS (StagingTableCatalog) ----
  //
  // `CREATE [OR REPLACE] TABLE … AS SELECT` must be ATOMIC: a failed
  // query may not leave a half-written table, and REPLACE may not
  // expose the gap between drop and re-create. The staged table
  // materializes into a HIDDEN SIBLING directory (never visible to
  // isTable — table names reject '.'), the CTAS write runs against
  // it, and commit first rewrites the staged metadata's ABSOLUTE
  // paths (manifests + parts record absolute file paths) to the
  // final location — while still invisible — then swap-renames the
  // directory into place. On a single FS the rename is atomic; on an
  // object-store deployment this final step is the catalog-pointer
  // CAS. Abort deletes the staging dir; the live table is untouched
  // either way.

  private def stageInternal(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String],
      replace: Boolean, orCreate: Boolean)
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    val finalDir = dirOf(ident)
    if (!replace && isTable(finalDir)) throw new TableAlreadyExistsException(ident)
    if (replace && !orCreate && !isTable(finalDir)) throw new NoSuchTableException(ident)
    val stageDir = finalDir.resolveSibling(
      finalDir.getFileName.toString + s".staging-${System.nanoTime()}")
    val stored = materializeTableDir(stageDir, schema, partitions, properties)
    new GraftStagedTable(
      new GraftLakeTable(spark, stageDir.toString, None, Some(stored)),
      stageDir, finalDir, replace, ident)
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stageInternal(ident, schema, partitions, properties, replace = false, orCreate = false)

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stageInternal(ident, schema, partitions, properties, replace = true, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stageInternal(ident, schema, partitions, properties, replace = true, orCreate = true)

  /** A CHECK expression must ANALYZE as a boolean over the table's
    * columns alone — rejected at DDL time, not at first write.
    */
  private def validateCheck(schema: StructType, sql: String): Unit = {
    val probe = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .where(org.apache.spark.sql.functions.expr(sql))
    probe.queryExecution.analyzed: Unit
  }

  /** Temporal transform names accepted in `PARTITIONED BY` — the
    * Iceberg layout family for event tables. The declared transform
    * makes every append RANGE-CLUSTER on the raw column, so each
    * file's min/max timestamp extent spans few periods and a
    * time-range predicate prunes by manifest stats — the same pruning
    * a hive `days=…/` directory layout buys, without coupling readers
    * to paths (finer, in fact: file extents are tighter than a day
    * when traffic is heavy).
    */
  private val TemporalTransforms = Set("days", "months", "hours", "years", "date")

  /** Partition-spec EVOLUTION (`CALL graft.system.set_layout(t,
    * 'days(ts)')`): replace the DECLARED write layout. Metadata-only
    * and O(1) by design — in this lake, pruning is driven by
    * per-file min/max stats on the RAW column, never by partition
    * VALUES baked into paths, so evolving the spec rewrites nothing:
    * files written under the old spec keep their old extents (and
    * keep pruning exactly as well as they ever did), files written
    * after the call range-cluster on the new transform and prune
    * tightly under the new predicate shape. This is Iceberg's
    * hidden-partitioning evolution contract, landed as one tiny
    * metadata file. `spec` = `none` clears the layout;
    * a bare column name means identity. Returns true iff the
    * declared layout actually changed.
    */
  private[sources] def setLayout(dirS: String, spec: String): Boolean = {
    val dir = Paths.get(dirS)
    val head = LakeTable.currentSnapshot(dirS)
    val schema =
      if (head > 0) GraftLakeTable.schemaOf(SparkSession.active, dirS, head)
      else DataType.fromJson(Files.readString(
        dir.resolve("meta").resolve("_schema.json"))).asInstanceOf[StructType]
    val parsed = parseLayoutSpec(spec, schema)
    val p = dir.resolve("meta").resolve("_layout.json")
    val old = if (Files.exists(p)) Some(Files.readString(p)) else None
    parsed match {
      case None =>
        if (Files.exists(p)) { Files.delete(p); true } else false
      case Some((c, n, tf)) =>
        val json = s"""{"partition_col":"$c","n_buckets":$n,"transform":"$tf"}"""
        if (old.contains(json)) false
        else { Files.writeString(p, json); true }
    }
  }

  /** String form of the `PARTITIONED BY` transform family — same
    * grammar and validation rules as [[layoutOf]], for the CALL
    * surface (which has no DDL `Transform` objects to hand).
    */
  private[sources] def parseLayoutSpec(spec0: String,
      schema: StructType): Option[(String, Int, String)] = {
    import org.apache.spark.sql.types._
    val spec = spec0.trim
    if (spec.isEmpty || spec.equalsIgnoreCase("none")) return None
    def col(c: String): String = {
      require(schema.fieldNames.contains(c),
        s"partition column $c not in table schema")
      c
    }
    val Fn = """([A-Za-z_]+)\s*\((.*)\)""".r
    spec match {
      case Fn(name, args0) =>
        val args = args0.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        name.toLowerCase match {
          case "identity" =>
            require(args.length == 1, s"identity takes one column, got $args")
            Some((col(args.head), 0, "identity"))
          case tn if TemporalTransforms(tn) =>
            require(args.length == 1, s"$tn takes one column, got $args")
            val c = col(args.head)
            val dt = schema(c).dataType
            require(dt == TimestampType || dt == DateType,
              s"$tn($c) requires a timestamp/date column, got $dt")
            Some((c, 0, tn))
          case "bucket" =>
            require(args.length == 2, s"bucket takes (n, col), got $args")
            val n = args.head.toInt
            require(n > 0, s"bucket count must be positive, got $n")
            Some((col(args(1)), n, "bucket"))
          case "truncate" =>
            require(args.length == 2, s"truncate takes (n, col), got $args")
            val n = args.head.toInt
            require(n > 0, s"truncate width must be positive, got $n")
            val c = col(args(1))
            val dt = schema(c).dataType
            require(dt == StringType || dt == LongType || dt == IntegerType ||
              dt == ShortType || dt == ByteType,
              s"truncate($n, $c) requires a string/integral column, got $dt")
            Some((c, n, "truncate"))
          case "zorder" =>
            val cols = args.map(col)
            require(cols.length >= 2 && cols.length <= 4,
              s"zorder takes 2 to 4 columns, got $cols")
            cols.foreach { c =>
              val dt = schema(c).dataType
              require(dt.isInstanceOf[NumericType] || dt == TimestampType ||
                dt == DateType,
                s"zorder($c) requires a numeric/timestamp/date column, got $dt")
            }
            Some((cols.mkString(","), 0, "zorder"))
          case other => throw new UnsupportedOperationException(
            s"unknown layout transform '$other' — supported: identity, " +
              "bucket(n, col), days/months/hours/years(col), " +
              "truncate(n, col), zorder(a, b[, ...]), none")
        }
      case ident if ident.matches("[A-Za-z0-9_]+") =>
        Some((col(ident), 0, "identity"))
      case other => throw new IllegalArgumentException(
        s"cannot parse layout spec '$other'")
    }
  }

  private def layoutOf(partitions: Array[Transform],
      schema: StructType): Option[(String, Int, String)] = {
    import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, NamedReference}
    def colOf(t: Transform): String = {
      val c = t.arguments.collectFirst {
        case r: NamedReference => r.fieldNames.mkString(".")
      }.getOrElse(throw new UnsupportedOperationException(
        s"partition transform $t names no column"))
      require(schema.fieldNames.contains(c),
        s"partition column $c not in table schema")
      c
    }
    partitions.toSeq match {
      case Nil => None
      case Seq(t) if t.name == "bucket" =>
        val n = t.arguments.collectFirst {
          case l: V2Literal[_] => l.value.asInstanceOf[Number].intValue
        }.getOrElse(throw new UnsupportedOperationException(
          s"bucket transform $t carries no bucket count"))
        require(n > 0, s"bucket count must be positive, got $n")
        Some((colOf(t), n, "bucket"))
      case Seq(t) if t.name == "identity" => Some((colOf(t), 0, "identity"))
      case Seq(t) if TemporalTransforms(t.name) =>
        val c = colOf(t)
        val dt = schema(c).dataType
        require(dt == org.apache.spark.sql.types.TimestampType ||
          dt == org.apache.spark.sql.types.DateType,
          s"${t.name}($c) requires a timestamp/date column, got $dt")
        Some((c, 0, t.name))
      case Seq(t) if t.name == "truncate" =>
        // DECLARED truncate(n, col) layout (the Iceberg transform for
        // high-cardinality string/integral keys): appends range-cluster
        // on the RAW column, so every file's min/max extent spans few
        // truncation buckets and a prefix / point / range predicate
        // prunes by manifest stats alone. Clustering on the raw value
        // is strictly tighter than clustering on its truncation, so
        // the declared contract (truncate-bucket locality) holds by
        // construction; `n` is recorded as the declared width.
        val n = t.arguments.collectFirst {
          case l: V2Literal[_] => l.value.asInstanceOf[Number].intValue
        }.getOrElse(throw new UnsupportedOperationException(
          s"truncate transform $t carries no width"))
        require(n > 0, s"truncate width must be positive, got $n")
        val c = colOf(t)
        val dt = schema(c).dataType
        require(dt == org.apache.spark.sql.types.StringType ||
          dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.IntegerType ||
          dt == org.apache.spark.sql.types.ShortType ||
          dt == org.apache.spark.sql.types.ByteType,
          s"truncate($n, $c) requires a string/integral column, got $dt")
        Some((c, n, "truncate"))
      case Seq(t) if t.name == "zorder" =>
        // DECLARED N-D z-order clustering (2..4 columns): every append
        // (and CALL compact) range-clusters on the quantile-bucket
        // morton interleave of all declared columns (operators/ZOrder)
        // — multi-dimension pruning as DDL metadata
        val cols = t.arguments.toSeq.collect {
          case r: org.apache.spark.sql.connector.expressions.NamedReference =>
            r.fieldNames.mkString(".")
        }
        require(cols.length >= 2 && cols.length <= 4,
          s"zorder takes 2 to 4 columns, got $cols")
        cols.foreach { c =>
          require(schema.fieldNames.contains(c),
            s"zorder column $c not in table schema")
          val dt = schema(c).dataType
          require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
            dt == org.apache.spark.sql.types.TimestampType ||
            dt == org.apache.spark.sql.types.DateType,
            s"zorder($c) requires a numeric/timestamp/date column, got $dt")
        }
        Some((cols.mkString(","), 0, "zorder"))
      case other => throw new UnsupportedOperationException(
        "graft-lake supports PARTITIONED BY (bucket(n, col)), " +
          "PARTITIONED BY (col), a temporal transform " +
          "(days/months/hours/years), truncate(n, col), or zorder(a, b), " +
          s"got ${other.mkString(", ")}")
    }
  }

  /** SQL `ALTER TABLE` schema evolution — ALL metadata-only:
    *  - `ADD COLUMNS`: the widened schema over the unchanged file list
    *    ([[LakeTable.evolveSchema]]); old files null-fill at read.
    *  - `RENAME COLUMN` / `DROP COLUMN`: field-id column mapping
    *    ([[graft.lake.ColumnMapping]]) — the data files' PHYSICAL
    *    column names never change; only the logical view moves. Zero
    *    data IO at any table size; a later ADD of a dropped name gets
    *    fresh storage, so stale bytes can never resurrect.
    *  - `ALTER COLUMN … TYPE`: lossless widening only (int→bigint,
    *    int→double, float→double) — the vectorized reader decodes old
    *    files' narrower pages straight into the widened type, so the
    *    change is one metadata commit ([[LakeTable.widenColumn]]).
    * Narrowing/reshaping still requires a rewrite and is rejected.
    */
  override def alterTable(ident: Identifier, changes0: TableChange*): Table = {
    val dir = dirOf(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val t = dir.toString
    val committed = LakeTable.currentSnapshot(t) > 0
    // `ALTER TABLE … SET/UNSET TBLPROPERTIES('graft.check.<name>' …)`
    // manages CHECK constraints — pure metadata, valid on declared
    // AND committed tables; handled before the schema-change paths
    val (propChanges, changes) = changes0.partition {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty => true
      case _ => false
    }
    val policyKeys = Set(graft.lake.AutoMaintain.AutoCompactKey,
      graft.lake.AutoMaintain.AutoManifestKey,
      graft.lake.AutoMaintain.AutoParallelismKey,
      graft.lake.AutoMaintain.MvMaxGroupsKey)
    propChanges.foreach {
      case sp: TableChange.SetProperty if policyKeys(sp.property) =>
        graft.lake.AutoMaintain.setPolicy(t, sp.property, sp.value.trim.toLong)
      case rp: TableChange.RemoveProperty if policyKeys(rp.property) =>
        graft.lake.AutoMaintain.dropPolicy(t, rp.property)
      case sp: TableChange.SetProperty =>
        require(sp.property.startsWith("graft.check."),
          s"graft-lake table property '${sp.property}' is not settable " +
            "(graft.check.<name> CHECK constraints and the " +
            "graft.autocompact.files / graft.automanifest.parts " +
            "maintenance policies are)")
        validateCheck(loadTable(ident).columns()
          .foldLeft(new StructType())((s, c) =>
            s.add(c.name(), c.dataType(), c.nullable())), sp.value)
        LakeTable.setCheck(t, sp.property.stripPrefix("graft.check."), sp.value)
      case rp: TableChange.RemoveProperty =>
        require(rp.property.startsWith("graft.check."),
          s"graft-lake table property '${rp.property}' is not removable " +
            "(graft.check.<name> CHECK constraints and the " +
            "graft.autocompact.files / graft.automanifest.parts " +
            "maintenance policies are)")
        LakeTable.dropCheck(t, rp.property.stripPrefix("graft.check."))
      case _ => ()
    }
    if (changes.isEmpty) return load(ident, None)
    def addedField(add: TableChange.AddColumn): StructField = {
      require(add.fieldNames().length == 1,
        "graft-lake ALTER TABLE supports only top-level columns")
      val dv = Option(add.defaultValue())
      require(add.isNullable || dv.isDefined,
        s"added column ${add.fieldNames().head} must be nullable or carry " +
          "a DEFAULT: existing files cannot back-fill a required column")
      val base = StructType(Seq.empty).add(add.fieldNames().head,
        add.dataType(), nullable = add.isNullable,
        Option(add.comment()).getOrElse("")).fields.head
      dv match {
        case None => base
        case Some(d) =>
          // CURRENT_DEFAULT keeps the user's SQL text (what future
          // INSERTs fill); EXISTS_DEFAULT is the FOLDED literal —
          // the frozen initial default pre-evolution files serve.
          // Rendering the folded literal through Catalyst pins the
          // value even if the original expression is context-dependent.
          val lit = Option(d.getValue).getOrElse(
            throw new UnsupportedOperationException(
              s"DEFAULT for ${base.name} does not fold to a literal"))
          val folded = org.apache.spark.sql.catalyst.expressions.Literal(
            lit.value, lit.dataType).sql
          base.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(base.metadata)
            .putString(graft.lake.ColumnMapping.CurrentDefaultKey,
              Option(d.getSql).getOrElse(folded))
            .putString(graft.lake.ColumnMapping.ExistsDefaultKey, folded)
            .build())
      }
    }
    def oneField(names: Array[String], what: String): String = {
      require(names.length == 1,
        s"graft-lake ALTER TABLE supports only top-level $what")
      names.head
    }
    // a rename/drop of a DECLARED layout column follows it / voids
    // the layout. The declared column field may hold SEVERAL
    // comma-joined columns (zorder) — each maps independently, and
    // losing any one voids the whole layout.
    def adjustLayout(change: String => Option[String]): Unit = {
      val p = dir.resolve("meta").resolve("_layout.json")
      if (Files.exists(p)) {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
          Files.readString(p))
        val cur = node.get("partition_col").asText()
        val mapped = cur.split(',').toSeq.map(change)
        if (mapped.exists(_.isEmpty)) Files.delete(p)
        else {
          val nw = mapped.flatten.mkString(",")
          if (nw != cur) {
            val tf = if (node.has("transform"))
              s""","transform":"${node.get("transform").asText()}"""" else ""
            Files.writeString(p,
              s"""{"partition_col":"$nw","n_buckets":${node.get("n_buckets").asInt()}$tf}"""): Unit
          }
        }
      }
    }
    if (!committed) {
      // declared-only table: no files exist yet, so rename/drop are
      // plain rewrites of the pending schema — no mapping needed
      val current = DataType.fromJson(Files.readString(
        dir.resolve("meta").resolve("_schema.json"))).asInstanceOf[StructType]
      val evolved = changes.foldLeft(current) {
        case (schema, add: TableChange.AddColumn) => schema.add(addedField(add))
        case (schema, rc: TableChange.RenameColumn) =>
          val from = oneField(rc.fieldNames(), "RENAME COLUMN")
          require(schema.fieldNames.contains(from), s"no column $from")
          require(!schema.fieldNames.contains(rc.newName()),
            s"column ${rc.newName()} already exists")
          adjustLayout(c => Some(if (c == from) rc.newName() else c))
          StructType(schema.fields.map(f =>
            if (f.name == from) f.copy(name = rc.newName()) else f))
        case (schema, dc: TableChange.DeleteColumn) =>
          val name = oneField(dc.fieldNames(), "DROP COLUMN")
          require(schema.fieldNames.contains(name), s"no column $name")
          adjustLayout(c => if (c == name) None else Some(c))
          StructType(schema.fields.filterNot(_.name == name))
        case (schema, ut: TableChange.UpdateColumnType) =>
          // no files yet, but the same lossless-widening rule as the
          // committed path — a declared table is still a contract.
          // stamp=false: no narrow files can exist pre-commit, so a
          // widened-marker would be inert, misleading state
          val name = oneField(ut.fieldNames(), "ALTER COLUMN")
          graft.lake.ColumnMapping.widen(schema, name, ut.newDataType(),
            stamp = false)
        case (schema, ud: TableChange.UpdateColumnDefaultValue) =>
          val name = oneField(ud.fieldNames(), "ALTER COLUMN")
          graft.lake.ColumnMapping.setCurrentDefault(schema, name,
            Option(ud.newDefaultValue()).filter(_.nonEmpty))
        case (_, other) =>
          throw new UnsupportedOperationException(
            s"graft-lake ALTER TABLE: unsupported change $other " +
              "(only lossless type widening is metadata-representable; " +
              "a narrowing/reshape requires a rewrite commit)")
      }
      Files.writeString(dir.resolve("meta").resolve("_schema.json"),
        evolved.json): Unit
      return load(ident, None)
    }
    // committed table: ADDs batch into one evolution commit (matching
    // the pre-mapping behavior); each rename/drop is its own
    // metadata-only commit through the mapping layer
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.nonEmpty) {
      val stored = LakeTable.storedSchemaOf(t).getOrElse(
        throw new IllegalStateException(s"table $t carries no schema"))
      LakeTable.evolveSchema(t, adds.foldLeft(stored)((s, a) =>
        graft.lake.ColumnMapping.add(s, addedField(a)))): Unit
    }
    changes.foreach {
      case _: TableChange.AddColumn => () // batched above
      case rc: TableChange.RenameColumn =>
        val from = oneField(rc.fieldNames(), "RENAME COLUMN")
        LakeTable.renameColumn(t, from, rc.newName()): Unit
        adjustLayout(c => Some(if (c == from) rc.newName() else c))
      case dc: TableChange.DeleteColumn =>
        val name = oneField(dc.fieldNames(), "DROP COLUMN")
        LakeTable.dropColumn(t, name): Unit
        adjustLayout(c => if (c == name) None else Some(c))
      case ut: TableChange.UpdateColumnType =>
        val name = oneField(ut.fieldNames(), "ALTER COLUMN")
        // validate-and-commit FIRST: a rejected widen (narrowing, or a
        // non-widenable type) must leave table metadata untouched
        LakeTable.widenColumn(t, name, ut.newDataType()): Unit
        // a DECLARED hash layout buckets every append by this column's
        // typed hash — retire it alongside the manifest bucket spec
        // (hash(int) != hash(bigint): keeping it would label future
        // appends inconsistently with existing files). Identity and
        // temporal layouts are VALUE-based and survive a widen.
        val p = dir.resolve("meta").resolve("_layout.json")
        if (Files.exists(p)) {
          val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
            Files.readString(p))
          if (node.get("partition_col").asText() == name &&
              node.get("n_buckets").asInt() > 0)
            Files.delete(p)
        }
      case ud: TableChange.UpdateColumnDefaultValue =>
        val name = oneField(ud.fieldNames(), "ALTER COLUMN")
        LakeTable.updateColumnDefault(t, name,
          Option(ud.newDefaultValue()).filter(_.nonEmpty)): Unit
      case other =>
        throw new UnsupportedOperationException(
          s"graft-lake ALTER TABLE: unsupported change $other " +
            "(only lossless type widening is metadata-representable; " +
            "a narrowing/reshape requires a rewrite commit)")
    }
    load(ident, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!isTable(dir)) false
    else {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p): Unit })
      finally walk.close()
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = dirOf(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to): Unit
  }

  // ---- FunctionCatalog: the `bucket` transform scans report ----
  //
  // Storage-partitioned planning resolves a scan's reported
  // `bucket(n, col)` through the table's catalog; serving the
  // function here is what lets two co-bucketed lake tables join with
  // ZERO shuffles (Spark verifies both sides bind the same canonical
  // function with the same bucket count).

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] = Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}

/** The lake's hash-bucket function: `pmod(murmur3(col), n)` — BY
  * CONSTRUCTION the assignment `BlockWriter.writeFlat`'s
  * `repartition(n, col)` shuffle produced, so the reported layout and
  * the function Spark binds for storage-partitioned planning can
  * never disagree.
  */
object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types._

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): graft-lake hash bucket, pmod(murmur3(col), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket expects (numBuckets, col); got ${inputType.catalogString}")
    val dt = inputType.fields(1).dataType
    dt match {
      case LongType | IntegerType | ShortType | ByteType | StringType |
           DateType | TimestampType => ()
      case other => throw new UnsupportedOperationException(
        s"graft bucket does not support $other keys")
    }
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      override def canonicalName(): String = s"graft.bucket(${dt.simpleString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, dt)
        val h = org.apache.spark.sql.graftshim.DsV2Shim.murmur3(v, dt)
        (((h % n) + n) % n).toInt
      }
    }
  }
}

/** A read-only table over a driver-computed metadata frame, served
  * through a DSv2 `LocalScan` (the rows are manifest-derived and
  * metadata-scale by construction — snapshot history, file
  * inventory).
  */
class GraftMetadataTable(name0: String, df: org.apache.spark.sql.DataFrame)
    extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.util.{CaseInsensitiveStringMap => CIMap}

  override def name(): String = name0
  override def schema(): StructType = df.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CIMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new LocalScan {
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        org.apache.spark.sql.graftshim.DsV2Shim.internalRows(df)
      override def readSchema(): StructType = df.schema
    }
  }
}

/** The lake's SQL `CALL` surface ([[GraftCatalog.loadProcedure]]):
  * every maintenance verb exposed as a Spark `ProcedureCatalog`
  * procedure with a one-row result. Maintenance rewrites derive their
  * layout the way the write path does (declared layout, else the
  * leading column; stats on every atomic column), so a `CALL
  * graft.system.compact('db.t')` lands a commit indistinguishable
  * from the API path's.
  */
private[sources] object GraftProcedures {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
  import org.apache.spark.sql.connector.read.{LocalScan, Scan}
  import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private final case class Def(name: String, doc: String,
      params: Seq[(String, org.apache.spark.sql.types.DataType)],
      outName: String, outType: org.apache.spark.sql.types.DataType,
      run: (GraftCatalog, InternalRow) => Any)

  /** Maintenance-rewrite config: same derivation as the write path
    * (a declared temporal layout keeps range-clustering through
    * compaction).
    */
  private def rewriteCfg(dir: String)
      : (graft.writer.BlockWriter.Config, Seq[String], Boolean,
         Option[Seq[String]]) = {
    val head = LakeTable.currentSnapshot(dir)
    val schema = GraftLakeTable.schemaOf(SparkSession.active, dir, head)
    val (cfg, stats, _, rc, zc) = LakeFormatWrite.config(
      CaseInsensitiveStringMap.empty(), schema, dir)
    (cfg, stats, rc, zc)
  }

  private def tbl(c: GraftCatalog, in: InternalRow): String =
    c.tableDir(in.getUTF8String(0).toString)

  private val defs: Seq[Def] = Seq(
    Def("compact", "rewrite the head into task-sized files (folds MoR debt)",
      Seq("table" -> StringType), "snapshot", IntegerType, (c, in) => {
        val dir = tbl(c, in); val s = SparkSession.active
        val head = LakeTable.currentSnapshot(dir)
        val (cfg, stats, rc, zc) = rewriteCfg(dir)
        val data = LakeTable.read(s, dir, Some(head))
        // a declared z layout survives compaction: the rewrite
        // re-z-clusters the whole table
        LakeTable.rewrite(s, dir, data, cfg, stats,
          rangeCluster = rc, basis = Some(head),
          clusterBy = LakeFormatWrite.zClusterOf(zc, data))
      }),
    Def("fold_deletes", "fold accumulated delete files back into data files",
      Seq("table" -> StringType), "snapshot", IntegerType, (c, in) => {
        val dir = tbl(c, in); val s = SparkSession.active
        val (cfg, stats, rc, zc) = rewriteCfg(dir)
        val data = LakeTable.read(s, dir)
        LakeTable.foldDeletes(s, dir, cfg, stats,
          rangeCluster = rc, clusterBy = LakeFormatWrite.zClusterOf(zc, data))
      }),
    Def("rewrite_manifests", "fold the head's O(commits) metadata part chain into one part",
      Seq("table" -> StringType), "snapshot", IntegerType,
      (c, in) => LakeTable.rewriteManifests(tbl(c, in))),
    Def("expire_snapshots", "expire snapshots below keep_from; reclaim their files",
      Seq("table" -> StringType, "keep_from" -> IntegerType),
      "n_reclaimed", IntegerType,
      (c, in) => LakeTable.expire(tbl(c, in), in.getInt(1))),
    Def("expire_older_than", "time-based retention by commit wall-clock",
      Seq("table" -> StringType, "cutoff_ms" -> LongType),
      "n_reclaimed", IntegerType,
      (c, in) => LakeTable.expireOlderThan(tbl(c, in), in.getLong(1))),
    Def("remove_orphans", "delete files no live manifest references",
      Seq("table" -> StringType), "n_removed", IntegerType,
      (c, in) => LakeTable.removeOrphans(tbl(c, in))),
    Def("rollback", "restore the current view to an earlier snapshot (metadata-only)",
      Seq("table" -> StringType, "snapshot" -> IntegerType),
      "snapshot", IntegerType,
      (c, in) => LakeTable.rollback(tbl(c, in), in.getInt(1))),
    Def("tag", "pin a snapshot under a stable name (retention pin)",
      Seq("table" -> StringType, "name" -> StringType, "snapshot" -> IntegerType),
      "snapshot", IntegerType, (c, in) => {
        LakeTable.tag(tbl(c, in), in.getUTF8String(1).toString, in.getInt(2))
        in.getInt(2)
      }),
    Def("drop_tag", "drop a tag; the pinned snapshot becomes reclaimable",
      Seq("table" -> StringType, "name" -> StringType), "existed", BooleanType,
      (c, in) => LakeTable.dropTag(tbl(c, in), in.getUTF8String(1).toString)),
    Def("branch", "fork the head into a named branch (write-audit-publish)",
      Seq("table" -> StringType, "name" -> StringType), "snapshot", IntegerType,
      (c, in) => LakeTable.branch(tbl(c, in), in.getUTF8String(1).toString)),
    Def("publish_branch", "fast-forward main to the audited branch head",
      Seq("table" -> StringType, "name" -> StringType), "snapshot", IntegerType,
      (c, in) => LakeTable.publishBranch(tbl(c, in), in.getUTF8String(1).toString)),
    Def("drop_branch", "drop an unpublished branch and its staged files",
      Seq("table" -> StringType, "name" -> StringType), "dropped", BooleanType,
      (c, in) => LakeTable.dropBranch(tbl(c, in), in.getUTF8String(1).toString)),
    Def("analyze", "compute per-file column NDV sketches + profile (serves t.stats and the CBO)",
      Seq("table" -> StringType), "snapshot", IntegerType,
      (c, in) => LakeTable.analyze(SparkSession.active, tbl(c, in))._1),
    Def("set_layout", "evolve the declared write layout (partition-spec evolution; metadata-only)",
      Seq("table" -> StringType, "spec" -> StringType), "changed", BooleanType,
      (c, in) => c.setLayout(tbl(c, in), in.getUTF8String(1).toString)),
    Def("branch_diff", "net row-level diff of an audit branch vs its fork basis (write-audit-publish review): insert/delete counts",
      Seq("table" -> StringType, "name" -> StringType), "summary", StringType,
      (c, in) => {
        val diff = LakeTable.branchDiff(SparkSession.active, tbl(c, in),
          in.getUTF8String(1).toString)
        val counts = diff.groupBy(org.apache.spark.sql.functions.col("_change_type"))
          .count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        s"insert=${counts.getOrElse("insert", 0L)},delete=${counts.getOrElse("delete", 0L)}"
      }),
    Def("refresh_mv", "fold base-table changes since the recorded basis into the named materialized view (delta-join / incremental-fold / targeted-recompute IVM, one commit)",
      Seq("table" -> StringType), "basis", StringType, (c, in) =>
        // renders "fact=f" (single-table kinds), "fact=f,dim=d", or
        // "fact=f,dims=d1,d2,…" for multi-dimension stars
        graft.lake.MaterializedView.refreshStatus(
          SparkSession.active, tbl(c, in))),
    Def("refresh_mvs", "refresh every REGISTERED materialized view over the named FACT table whose basis is behind (the same sweep the graft.autorefresh.mvs policy runs post-commit); returns how many refreshed",
      Seq("table" -> StringType), "refreshed", IntegerType, (c, in) =>
        graft.lake.MaterializedView.refreshStale(
          SparkSession.active, tbl(c, in)).size),
    Def("clone", "zero-copy shallow clone into a new independent table",
      Seq("source" -> StringType, "dest" -> StringType), "snapshot", IntegerType,
      (c, in) => LakeTable.cloneTable(tbl(c, in),
        c.newTableDir(in.getUTF8String(1).toString))))

  def names: Seq[String] = defs.map(_.name)

  def apply(cat: GraftCatalog, procName: String): UnboundProcedure = {
    val d = defs.find(_.name == procName).getOrElse(
      throw new NoSuchTableException(
        Identifier.of(Array("system"), procName)))
    new UnboundProcedure {
      override def name(): String = d.name
      override def description(): String = d.doc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = d.name
        override def description(): String = d.doc
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] =
          d.params.map { case (n, t) => ProcedureParameter.in(n, t).build() }.toArray
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val v = d.run(cat, input) match {
            case s: String => UTF8String.fromString(s)
            case x => x
          }
          val outSchema = StructType(Seq(
            org.apache.spark.sql.types.StructField(d.outName, d.outType, nullable = false)))
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] =
              Array(new GenericInternalRow(Array[Any](v)))
            override def readSchema(): StructType = outSchema
          }
          java.util.Collections.singletonList(scan).iterator()
        }
      }
    }
  }
}

/** A staged CTAS/RTAS table (see GraftCatalog.stageInternal): the
  * write lands in a hidden sibling directory; commit re-points the
  * staged metadata's absolute paths at the final location (manifests
  * and parts record absolute paths) while still invisible, then
  * swap-renames into place — atomic on one FS, the catalog-pointer
  * CAS on an object store. Abort deletes the staging dir.
  */
private[sources] final class GraftStagedTable(inner: GraftLakeTable,
    stageDir: Path, finalDir: Path, replace: Boolean,
    ident: Identifier)
  extends org.apache.spark.sql.connector.catalog.StagedTable
  with org.apache.spark.sql.connector.catalog.SupportsWrite {

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    inner.columns()
  override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    inner.capabilities()
  override def properties(): java.util.Map[String, String] = inner.properties()
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    val from = stageDir.toAbsolutePath.normalize.toString
    val to = finalDir.toAbsolutePath.normalize.toString
    // metadata re-point happens BEFORE the rename, while the staged
    // dir is invisible — after the swap every recorded path is valid
    val meta = stageDir.resolve("meta")
    if (Files.isDirectory(meta)) {
      val st = Files.list(meta)
      try st.iterator().asInstanceOf[java.util.Iterator[Path]]
        .forEachRemaining { p =>
          if (p.getFileName.toString.endsWith(".json")) {
            val body = Files.readString(p)
            if (body.contains(from))
              Files.writeString(p, body.replace(from, to)): Unit
          }
        }
      finally st.close()
    }
    if (replace && Files.exists(finalDir)) {
      val trash = finalDir.resolveSibling(
        finalDir.getFileName.toString + s".old-${System.nanoTime()}")
      Files.move(finalDir, trash)
      try Files.move(stageDir, finalDir)
      catch { case e: Throwable => Files.move(trash, finalDir): Unit; throw e }
      rmTree(trash)
    } else {
      if (Files.exists(finalDir))
        throw new TableAlreadyExistsException(ident)
      Files.move(stageDir, finalDir): Unit
    }
  }

  override def abortStagedChanges(): Unit = rmTree(stageDir)

  private def rmTree(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder())
      .forEach(q => { Files.deleteIfExists(q): Unit })
    finally walk.close()
  }
}
