package graft.sources.snap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PATH CATALOG for snapshot tables — what makes Spark's NATIVE
  * time-travel SQL syntax work against the kernel:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.snapshots",
  *     "graft.sources.snap.SnapCatalog")
  *   SELECT * FROM snapshots.`/wh/sales`                  -- head
  *   SELECT * FROM snapshots.`/wh/sales` VERSION AS OF 3  -- travel
  *   SELECT * FROM snapshots.`/wh/sales` TIMESTAMP AS OF '2026-01-01'
  *   INSERT INTO snapshots.`/wh/sales` VALUES ...         -- commit
  * }}}
  *
  * Pick a catalog name that is NOT a registered datasource short
  * name: `x.`/path`` where `x` names a datasource is grabbed by the
  * direct-query-on-files rule before catalog resolution runs (so
  * "snap" itself cannot be the catalog name — the connector's
  * `DataSourceRegister` owns it).
  *
  * The identifier IS the table path (the Delta `delta.`/path``
  * shape) — no metastore, no registration step: the manifest
  * directory is the table's own catalog entry, which is the whole
  * premise of the format. Loads delegate to [[SnapSource.resolve]]
  * (same cached instances, same pruning index); the two time-travel
  * overloads map onto the `versionAsOf` / `timestampAsOf` options
  * (Spark hands timestamps in MICROseconds). Mutating DDL is
  * refused: tables are created by committing to a path and dropped
  * by retention, never by catalog calls.
  */
class SnapCatalog extends TableCatalog {

  private var catName = "snap"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catName = name

  override def name(): String = catName

  private def spark = SparkSession.active

  /** `snap.`/tmp/x/tbl`` parses as namespace=[], name="/tmp/x/tbl";
    * a dotted spelling keeps its segments as path segments. */
  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def resolve(ident: Identifier,
      extra: Map[String, String]): Table =
    try SnapSource.resolve(spark, new CaseInsensitiveStringMap(
      (Map("path" -> pathOf(ident)) ++ extra).asJava))
    catch {
      case e: IllegalArgumentException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(
            Seq(catName) ++ ident.namespace() :+ ident.name())
    }

  override def loadTable(ident: Identifier): Table =
    resolve(ident, Map.empty)

  override def loadTable(ident: Identifier, version: String): Table =
    resolve(ident, Map("versionAsOf" -> version))

  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    resolve(ident, Map("timestampAsOf" -> (timestampMicros / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean =
    graft.ops.SnapTable.versions(spark, pathOf(ident)).nonEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed: there is no namespace to enumerate

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "snap tables are created by committing to a path " +
        "(SnapTable.commit / INSERT), not by DDL")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "snap table metadata lives in manifests; use the library API")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "snap tables drop by retention (vacuum), not by catalog DDL")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "snap tables are path-addressed; move the directory")
}
