package graft.lake

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Field-id column mapping — the mechanism behind metadata-only
  * `ALTER TABLE … RENAME COLUMN` / `DROP COLUMN` (Iceberg evolves by
  * field id; Delta's "column mapping by name" is the same idea, which
  * this follows because parquet resolves columns by name).
  *
  * Invariants:
  *  - every data file stores a column under its immutable PHYSICAL
  *    name — the name the column had when first committed;
  *  - the manifest schema carries LOGICAL names, each field's stable
  *    `graft.id` and, once it diverges, its `graft.physical` name;
  *  - a DROPPED column stays in the STORED schema as a tombstone
  *    (`graft.dropped`) so its physical name remains reserved: a later
  *    ADD COLUMN with the same logical name gets a FRESH physical name
  *    and old files' stale values can never resurrect;
  *  - part files (per-file stats keys, equality-delete key columns)
  *    always use PHYSICAL names — parts are immutable and shared
  *    across manifests, so a rename can never rewrite them.
  *
  * Readers translate physical→logical at the scan boundary; writers
  * translate logical→physical before staging files. Tables that never
  * rename/drop carry no metadata and every translation is identity.
  */
private[graft] object ColumnMapping {

  val IdKey = "graft.id"
  val PhysKey = "graft.physical"
  val DroppedKey = "graft.dropped"
  val WidenedKey = "graft.widened"
  val WidenedFromKey = "graft.widenedFrom"

  /** Spark's own column-default metadata keys (what
    * `ResolveDefaultColumns` reads): CURRENT_DEFAULT is the WRITE
    * default an INSERT that omits the column fills; EXISTS_DEFAULT is
    * the Iceberg-style INITIAL default — the value served for rows in
    * files written BEFORE the column existed (Spark's parquet reader
    * fills it for file-missing columns, so a defaulted ADD COLUMN
    * stays a metadata-only commit). These are Spark-standard keys, so
    * they deliberately survive [[logicalClean]] — the engine's scan
    * and INSERT resolution consume them from the presented schema.
    */
  val CurrentDefaultKey = "CURRENT_DEFAULT"
  val ExistsDefaultKey = "EXISTS_DEFAULT"

  /** True when any live column carries an initial default — files
    * written before that column existed serve a non-null constant, so
    * footer-stat shortcuts (aggregate pushdown) that would read
    * "column absent" as "no rows" must stay off.
    */
  def hasInitialDefaults(stored: StructType): Boolean =
    stored.fields.exists(f => !isDropped(f) && f.metadata.contains(ExistsDefaultKey))

  /** `ALTER COLUMN … SET/DROP DEFAULT`: updates the WRITE default
    * only. The initial (EXISTS) default is frozen at ADD COLUMN time
    * — changing it would rewrite history for already-committed files.
    */
  def setCurrentDefault(stored: StructType, name: String,
      sql: Option[String]): StructType = {
    val live = logical(stored)
    require(live.fieldNames.contains(name), s"no column $name " +
      s"(have ${live.fieldNames.mkString(", ")})")
    StructType(stored.fields.map { f =>
      if (!isDropped(f) && f.name == name) {
        val b = new MetadataBuilder().withMetadata(f.metadata)
        sql match {
          case Some(s) => b.putString(CurrentDefaultKey, s)
          case None => b.remove(CurrentDefaultKey)
        }
        f.copy(metadata = b.build())
      } else f
    })
  }

  def isDropped(f: StructField): Boolean =
    f.metadata.contains(DroppedKey) && f.metadata.getBoolean(DroppedKey)

  /** The name this field's data lives under in parquet files. */
  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** Stored schema → the user-visible schema (tombstones filtered,
    * mapping metadata kept for the scan layer).
    */
  def logical(stored: StructType): StructType =
    StructType(stored.fields.filterNot(isDropped))

  /** The user-visible schema with mapping metadata STRIPPED — what the
    * table presents to Spark, so downstream plan schemas never carry
    * graft keys.
    */
  def logicalClean(stored: StructType): StructType =
    StructType(logical(stored).fields.map(f => f.copy(metadata = strip(f.metadata))))

  private def strip(m: Metadata): Metadata = {
    if (!m.contains(IdKey) && !m.contains(PhysKey) && !m.contains(DroppedKey) &&
      !m.contains(WidenedKey) && !m.contains(WidenedFromKey)) m
    else {
      val b = new MetadataBuilder().withMetadata(m)
      b.remove(IdKey); b.remove(PhysKey); b.remove(DroppedKey)
      b.remove(WidenedKey); b.remove(WidenedFromKey)
      b.build()
    }
  }

  /** True once any rename/drop has touched the schema — the switch
    * for every translation in the read/write paths (identity when
    * false, which is every table that never renamed/dropped).
    */
  def hasMapping(stored: StructType): Boolean =
    stored.fields.exists(f => isDropped(f) || physicalName(f) != f.name)

  /** logical name → physical name (live fields only). */
  def toPhysical(stored: StructType): Map[String, String] =
    logical(stored).fields.map(f => f.name -> physicalName(f)).toMap

  /** physical name → logical name (live fields only). */
  def toLogical(stored: StructType): Map[String, String] =
    logical(stored).fields.map(f => physicalName(f) -> f.name).toMap

  /** The schema data files are read/written under: live fields at
    * their physical names (metadata stripped — it never belongs in
    * files), tombstones excluded.
    */
  def physicalSchema(stored: StructType): StructType =
    StructType(logical(stored).fields.map(f =>
      f.copy(name = physicalName(f), metadata = strip(f.metadata))))

  /** The live field whose PHYSICAL name is `phys` (eq-delete entries
    * key by physical name).
    */
  def fieldByPhysical(stored: StructType, phys: String): Option[StructField] =
    logical(stored).fields.find(f => physicalName(f) == phys)

  private def maxId(stored: StructType): Long =
    stored.fields.map(f =>
      if (f.metadata.contains(IdKey)) f.metadata.getLong(IdKey) else 0L)
      .foldLeft(stored.fields.length.toLong)(math.max)

  /** Stamp `graft.id` on every field missing one (ordinal-based —
    * deterministic, and ids only ever matter relative to this table's
    * own history).
    */
  private def stampIds(stored: StructType): StructType =
    StructType(stored.fields.zipWithIndex.map { case (f, i) =>
      if (f.metadata.contains(IdKey)) f
      else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
        .putLong(IdKey, (i + 1).toLong).build())
    })

  /** RENAME COLUMN `from` → `to`: metadata-only — the physical name is
    * pinned to what files already store and only the logical name
    * moves.
    */
  def rename(stored0: StructType, from: String, to: String): StructType = {
    val stored = stampIds(stored0)
    val live = logical(stored)
    require(live.fieldNames.contains(from), s"no column $from to rename " +
      s"(have ${live.fieldNames.mkString(", ")})")
    require(!live.fieldNames.contains(to),
      s"cannot rename $from to $to: column $to already exists")
    StructType(stored.fields.map { f =>
      if (!isDropped(f) && f.name == from)
        f.copy(name = to, metadata = new MetadataBuilder()
          .withMetadata(f.metadata).putString(PhysKey, physicalName(f)).build())
      else f
    })
  }

  /** DROP COLUMN: metadata-only — the field becomes a tombstone that
    * keeps its physical name reserved; files keep the bytes (a full
    * rewrite purges them) but no reader ever projects them again.
    */
  def drop(stored0: StructType, name: String): StructType = {
    val stored = stampIds(stored0)
    val live = logical(stored)
    require(live.fieldNames.contains(name), s"no column $name to drop " +
      s"(have ${live.fieldNames.mkString(", ")})")
    StructType(stored.fields.map { f =>
      if (!isDropped(f) && f.name == name) {
        val id = f.metadata.getLong(IdKey)
        f.copy(name = s"_graft_dropped_$id",
          metadata = new MetadataBuilder().withMetadata(f.metadata)
            .putString(PhysKey, physicalName(f))
            .putBoolean(DroppedKey, true).build())
      } else f
    })
  }

  /** Lossless type promotions the scan layer serves with ZERO data
    * IO: Spark 4's vectorized parquet reader widens at decode time
    * (INT32 pages → long/double vectors, FLOAT pages → double — the
    * `IntegerToLong`/`IntegerToDouble`/`FloatToDouble` updaters), so
    * a file written before the widen reads straight into the widened
    * schema. This is Iceberg's safe-promotion set (int→long,
    * float→double) plus int→double, which the reader also decodes
    * exactly (every int is exactly representable in a double).
    */
  private val promotions: Map[org.apache.spark.sql.types.DataType,
      Set[org.apache.spark.sql.types.DataType]] = {
    import org.apache.spark.sql.types._
    Map(
      IntegerType -> Set(LongType, DoubleType),
      FloatType -> Set(DoubleType))
  }

  def canWiden(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.DecimalType
    (from, to) match {
      // decimal precision growth at UNCHANGED scale: every stored
      // value is exactly representable in the wider precision, and
      // the vectorized reader rescales narrow decimal pages at decode
      // (the same safe promotion Iceberg allows). A scale change
      // reshapes stored values — rejected.
      case (f: DecimalType, t: DecimalType) =>
        t.precision > f.precision && t.scale == f.scale
      case _ => promotions.get(from).exists(_.contains(to))
    }
  }

  /** ALTER COLUMN … TYPE as a METADATA-ONLY widen: only lossless
    * promotions ([[canWiden]]) are accepted — anything else would
    * need a data rewrite to stay readable. The field keeps its name,
    * id and physical storage; old files decode into the widened type
    * at scan (no mapping is created — names never move). The
    * [[WidenedKey]] stamp records that files of a NARROWER physical
    * type may exist, which the scan layer uses to keep footer-level
    * shortcuts (aggregate pushdown) off typed footer stats.
    */
  def widen(stored: StructType, name: String,
      to: org.apache.spark.sql.types.DataType,
      stamp: Boolean = true): StructType = {
    val live = logical(stored)
    val f = live.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name to widen " +
        s"(have ${live.fieldNames.mkString(", ")})"))
    require(f.dataType != to, s"column $name already has type ${to.simpleString}")
    require(canWiden(f.dataType, to),
      s"cannot change type of $name: ${f.dataType.simpleString} -> " +
        s"${to.simpleString} is not a lossless widening (allowed: " +
        "int->bigint, int->double, float->double, decimal precision " +
        "growth at unchanged scale); a narrowing/reshape requires a rewrite")
    StructType(stored.fields.map { g =>
      if (!isDropped(g) && g.name == name)
        g.copy(dataType = to, metadata =
          if (stamp) {
            val b = new MetadataBuilder()
              .withMetadata(g.metadata).putBoolean(WidenedKey, true)
            // record the NARROW source type once (first widen wins):
            // the scan layer keys footer-shortcut safety off it
            if (!g.metadata.contains(WidenedFromKey))
              b.putString(WidenedFromKey, g.dataType.simpleString)
            b.build()
          } else g.metadata)
      else g
    })
  }

  /** True once any live column has been widened — files of a narrower
    * physical type may exist, so footer-typed shortcuts must re-check.
    */
  def hasWidening(stored: StructType): Boolean =
    stored.fields.exists(f => !isDropped(f) &&
      f.metadata.contains(WidenedKey) && f.metadata.getBoolean(WidenedKey))

  /** True when some widened column makes FOOTER AGGREGATE answers
    * unsafe. Spark 4's parquet footer aggregation already promotes
    * narrow INTEGRAL footer stats into the widened type exactly
    * (int32 min/max → bigint/double answers), and refuses to push on
    * a physical-decimal mismatch (clean fallback) — those widens keep
    * the shortcut. A FLOAT→double widen is the exception: parquet
    * writers record float bounds (min may be -0.0 for a file whose
    * true min is +0.0), so the footer answer can differ bitwise from
    * the data answer. Legacy widen stamps without a recorded source
    * type are treated as unsafe.
    */
  def hasUnsafeAggWidening(stored: StructType): Boolean =
    stored.fields.exists { f =>
      !isDropped(f) &&
        f.metadata.contains(WidenedKey) && f.metadata.getBoolean(WidenedKey) &&
        (!f.metadata.contains(WidenedFromKey) ||
          f.metadata.getString(WidenedFromKey) == "float")
    }

  /** ADD COLUMN aware of retired physical names: a new column whose
    * name collides with ANY reserved physical name (live or
    * tombstoned) gets a fresh physical name — old files' bytes under
    * the colliding name stay invisible; existing files null-fill the
    * new column.
    */
  def add(stored0: StructType, field: StructField): StructType = {
    val live = logical(stored0)
    require(!live.fieldNames.contains(field.name),
      s"column ${field.name} already exists")
    if (!hasMapping(stored0))
      // unmapped table: plain additive evolution, no metadata — keeps
      // every never-renamed table's schema byte-identical to before
      return StructType(stored0.fields :+ field)
    val stored = stampIds(stored0)
    val id = maxId(stored) + 1
    val reserved = stored.fields.map(physicalName).toSet
    val b = new MetadataBuilder().withMetadata(field.metadata).putLong(IdKey, id)
    if (reserved.contains(field.name)) b.putString(PhysKey, s"${field.name}_$id")
    StructType(stored.fields :+ field.copy(metadata = b.build()))
  }

  /** Append-time schema merge for a MAPPED table (the unmapped path
    * keeps [[LakeTable]]'s inline rule): validates the incoming
    * LOGICAL frame schema against the stored schema's live view,
    * then re-attaches mapping metadata and tombstones so an append
    * can never wash the mapping out of the manifest. Added columns go
    * through [[add]]'s collision rule. Returns the stored schema to
    * record.
    */
  def mergeAppend(stored: StructType, incoming: StructType, root: String): StructType = {
    val live = logical(stored)
    val broken = live.fields.filterNot(f =>
      incoming.exists(g => g.name == f.name && g.dataType == f.dataType))
    require(broken.isEmpty,
      s"append schema mismatch for $root: dropped/retyped columns " +
        broken.map(_.name).mkString(", "))
    val added = incoming.fields.filterNot(g => live.exists(_.name == g.name))
    require(added.forall(_.nullable),
      s"append to $root adds non-nullable columns " +
        added.filterNot(_.nullable).map(_.name).mkString(", ") +
        "; old files cannot satisfy them — make them nullable or rewrite")
    // nullability never narrows; live fields keep their metadata
    val kept = StructType(stored.fields.map { f =>
      if (isDropped(f)) f
      else incoming.find(_.name == f.name) match {
        case Some(g) => f.copy(nullable = f.nullable || g.nullable)
        case None => f
      }
    })
    added.foldLeft(kept)((s, f) => add(s, f))
  }
}
