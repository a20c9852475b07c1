package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin over a directory tree of snapshot targets (r11) — the
  * SQL-surface face of the V2 connector: register once,
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.SnapshotCatalog
  *   spark.sql.catalog.graft.root = /data/graft
  * }}}
  *
  * and every target directory under the root is a first-class SQL
  * table — `SELECT * FROM graft.prod.customers`,
  * `INSERT INTO graft.prod.customers VALUES (...)` (a CDC delta batch
  * through the store's own locked commit), and
  * `DELETE FROM graft.prod.customers WHERE keys IN (...)` (key-addressed
  * tombstones, see [[SnapshotTable.deleteWhere]]). Identifier mapping is
  * the obvious one: `graft.<ns...>.<name>` ↔ `<root>/<ns...>/<name>`;
  * a table EXISTS iff its directory does (the store bootstraps the
  * manifest on first merge, so CREATE is just mkdir).
  *
  * Reference anchor: the reference's consumers address DynamoDB tables
  * by NAME through a control plane (`app/lambdas/initiate-lambda-backfill/
  * main.py:34-44` retargets by table name); this catalog is that
  * name-not-path addressing for the Spark-native store.
  */
class SnapshotCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' requires spark.sql.catalog.$name.root=<dir>"))
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): Path =
    new Path((root +: ident.namespace().toSeq :+ ident.name()).mkString("/"))

  private def fs = new Path(root)
    .getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = new Path((root +: namespace.toSeq).mkString("/"))
    if (!fs.exists(ns)) Array.empty
    else fs.listStatus(ns).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean = fs.exists(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    // `<name>__changes` is the table's CHANGE FEED companion (r11):
    // `spark.readStream.table("graft.ns.t__changes")` streams the raw
    // committed delta rows — name-addressed streaming consumption with
    // no path in user code. Virtual: not listed, not creatable, reads
    // the same directory.
    val ChangesSuffix = "__changes"
    if (ident.name().endsWith(ChangesSuffix)) {
      val base = Identifier.of(ident.namespace(),
        ident.name().stripSuffix(ChangesSuffix))
      if (!tableExists(base))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(base)
      new SnapshotChangesTable(dirOf(base).toString)
    } else {
      if (!tableExists(ident))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      new SnapshotTable(dirOf(ident).toString)
    }
  }

  /** SQL time travel (r11): `SELECT ... FROM graft.ns.t VERSION AS OF
    * '<manifest>'` — the catalog pins the retained committed version
    * into the table, and the scan refuses orphans exactly like the
    * option-based path ([[SnapshotScan.planInputPartitions]]).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new SnapshotTable(dirOf(ident).toString, pinnedVersion = Some(version))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-snapshot tables bucket internally; partitioning is not supported")
    // the store's layout is fixed (keys/sequenceNumber/newImage resolved
    // from 4-column CDC deltas) — accept an empty or matching schema,
    // refuse anything else loudly rather than silently ignoring it
    require(schema.isEmpty ||
        schema.fieldNames.toSeq == SnapshotSource.Schema.fieldNames.toSeq,
      s"graft-snapshot tables have the fixed resolved schema " +
        s"${SnapshotSource.Schema.simpleString}; got ${schema.simpleString}")
    val dir = dirOf(ident)
    require(!fs.exists(dir), s"table $ident already exists")
    fs.mkdirs(dir)
    new SnapshotTable(dir.toString)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-snapshot tables have a fixed schema; ALTER is not supported")

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(dirOf(ident), true)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(tableExists(oldIdent),
      s"table $oldIdent does not exist")
    require(!tableExists(newIdent), s"table $newIdent already exists")
    fs.mkdirs(dirOf(newIdent).getParent)
    require(fs.rename(dirOf(oldIdent), dirOf(newIdent)),
      s"rename $oldIdent -> $newIdent failed")
  }
}
