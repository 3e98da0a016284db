package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent namespace registry: the engine's path-rooted answer to the
  * reference's REST-catalog listing surface (create/list namespaces and
  * tables, load by name — utils/catalog_manager.py:29-69). The registry
  * is ITSELF a tiny Icebox at `<warehouseDir>/_catalog/registry`, so it
  * inherits the table format's guarantees for free: registrations are
  * atomic snapshot commits (two processes registering tables race
  * safely through the same optimistic-commit path as data writes), the
  * registry time-travels like any table, and a fresh session resolves
  * every table from the warehouse URI alone — no external service, which
  * is the design point: at 100 TB the catalog is a few KB of metadata
  * and the object store is the source of truth.
  *
  * Entries are upserted by primary key (namespace, name); `drop`
  * retires the entry but never deletes data (Iceberg's `DROP TABLE`
  * without PURGE).
  */
final class Catalog(val warehouseDir: String) {

  private val registry: Icebox = Icebox.table(warehouseDir, "_catalog", "registry")

  private def entry(spark: SparkSession, namespace: String, name: String,
      uri: String): DataFrame = {
    import spark.implicits._
    Seq((namespace, name, uri, System.currentTimeMillis()))
      .toDF("namespace", "name", "uri", "registered_at_ms")
  }

  /** Register (or re-point) `namespace.name` → `uri`. Returns the table
    * handle. Creating the physical table is the first WRITE's job
    * (auto-create, W7/W8) — registration only records the mapping.
    */
  def register(spark: SparkSession, namespace: String, name: String,
      uri: String): Icebox = {
    require(namespace.nonEmpty && name.nonEmpty, "namespace and name must be non-empty")
    graft.operators.Upsert.intoTable(registry,
      entry(spark, namespace, name, uri), Seq("namespace", "name"),
      orderCol = Some("registered_at_ms"))
    Icebox(uri)
  }

  /** Register `namespace.name` at the warehouse's conventional location
    * `<warehouseDir>/<namespace>/<name>` and return the handle.
    */
  def create(spark: SparkSession, namespace: String, name: String): Icebox = {
    val t = Icebox.table(warehouseDir, namespace, name)
    register(spark, namespace, name, t.tableDir)
  }

  /** Load a registered table by name from the registry alone. */
  def load(spark: SparkSession, namespace: String, name: String): Icebox = {
    val rows = registry.read(spark)
      .filter(col("namespace") === namespace && col("name") === name)
      .select("uri").collect()
    require(rows.nonEmpty, s"no such table: $namespace.$name")
    Icebox(rows.head.getString(0))
  }

  def exists(spark: SparkSession, namespace: String, name: String): Boolean =
    registry.exists && registry.read(spark)
      .filter(col("namespace") === namespace && col("name") === name)
      .limit(1).count() > 0

  /** Retire the registry entry (data stays; Iceberg DROP without PURGE). */
  def drop(spark: SparkSession, namespace: String, name: String): Unit = {
    import spark.implicits._
    registry.deleteByKeys(Seq((namespace, name)).toDF("namespace", "name"))
  }

  /** `SHOW TABLES` listing: (namespace, name, uri), name-ordered. */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    if (!registry.exists) Seq.empty[(String, String, String)].toDF("namespace", "name", "uri")
    else registry.read(spark).select("namespace", "name", "uri")
      .orderBy("namespace", "name")
  }

  /** `SHOW NAMESPACES` listing. */
  def namespaces(spark: SparkSession): DataFrame =
    tables(spark).select("namespace").distinct().orderBy("namespace")

  /** Register every cataloged table as a session view named
    * `<namespace>_<name>` (dots aren't valid in temp-view names), wiring
    * each into the engine's SQL layer (MERGE/UPDATE/DELETE, time travel,
    * DESCRIBE HISTORY) — a fresh session becomes fully queryable from the
    * warehouse URI alone.
    */
  def registerAll(spark: SparkSession): Seq[String] =
    tables(spark).collect().toSeq.map { r =>
      val view = s"${r.getString(0)}_${r.getString(1)}"
      Icebox(r.getString(2)).registerView(spark, view)
      view
    }
}

object Catalog {
  def apply(warehouseDir: String): Catalog = new Catalog(warehouseDir)
}
