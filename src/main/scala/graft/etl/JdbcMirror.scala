package graft.etl

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** JDBC relational mirror (SURVEY A12-A17, A19, A23): lands the tall
  * element table as one wide all-TEXT table per tag in an RDBMS, with
  * the reference's exact contracts — fixed five columns +
  * `{table}_value`, attribute columns added on sight, per-PCR keyed
  * delete before insert, FK constraints over the tree edges with
  * 63-byte-safe names.
  *
  * Division of labor at scale: the driver holds ONLY schema metadata
  * (attribute keysets, FK edge set — both tiny, derived by one
  * distributed agg each) and issues DDL over a single JDBC connection;
  * all row traffic flows executor->DB through `df.write.jdbc` with
  * `batchsize` (vs the reference's one INSERT roundtrip per element,
  * `main_ingest.py:492`).
  */
object JdbcMirror {

  /** Engine-portability seam: the reference is PostgreSQL-only; tests
    * here run against embedded Derby (no Postgres server in this
    * environment), and everything dialect-specific funnels through this
    * trait.
    */
  trait SqlDialect {
    def textType: String
    def supportsIfNotExists: Boolean
    def supportsComments: Boolean
  }
  object PostgresDialect extends SqlDialect {
    val textType = "TEXT"
    val supportsIfNotExists = true
    val supportsComments = true
  }
  object DerbyDialect extends SqlDialect {
    val textType = "VARCHAR(4000)"
    val supportsIfNotExists = false
    val supportsComments = false
  }

  /** Spark's stock Derby dialect writes StringType as CLOB, which cannot
    * be inserted into the VARCHAR mirror columns — override the mapping
    * (registered once, lazily, when a Derby mirror is used).
    */
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType): Option[org.apache.spark.sql.jdbc.JdbcType] =
      dt match {
        case org.apache.spark.sql.types.StringType =>
          Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(4000)", java.sql.Types.VARCHAR))
        case _ => None
      }
  }
  private lazy val registerDerbyDialect: Unit =
    org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  final case class MirrorConfig(
      url: String,
      user: String = "",
      password: String = "",
      schema: String = "APP",
      dialect: SqlDialect = PostgresDialect,
      batchSize: Int = 1000)

  private def q(ident: String) = "\"" + ident + "\""

  private def connect(cfg: MirrorConfig): Connection = {
    val p = new Properties()
    if (cfg.user.nonEmpty) p.put("user", cfg.user)
    if (cfg.password.nonEmpty) p.put("password", cfg.password)
    DriverManager.getConnection(cfg.url, p)
  }

  /** Catalog-reflection cache (SURVEY A14): the reference memoizes
    * information_schema lookups per file (`main_ingest.py:144-166,690`);
    * here one batch's DDL pass reads each table's columns at most once.
    * Invalidated on DDL and cleared per batch.
    */
  private val columnCache = mutable.Map.empty[String, Set[String]]

  private def tableColumns(conn: Connection, cfg: MirrorConfig, table: String): Set[String] =
    columnCache.getOrElseUpdate(s"${cfg.url}/${cfg.schema}.$table", {
      val rs = conn.getMetaData.getColumns(null, cfg.schema, table, null)
      val out = mutable.Set.empty[String]
      while (rs.next()) out += rs.getString("COLUMN_NAME").toLowerCase
      rs.close()
      out.toSet
    })

  private def invalidate(cfg: MirrorConfig, table: String): Unit =
    columnCache.remove(s"${cfg.url}/${cfg.schema}.$table")

  private def constraintExists(conn: Connection, cfg: MirrorConfig,
      childTable: String, name: String): Boolean = {
    // information_schema is PG; JDBC metadata keys work everywhere.
    val rs = conn.getMetaData.getImportedKeys(null, cfg.schema, childTable)
    var found = false
    while (rs.next() && !found)
      if (Option(rs.getString("FK_NAME")).exists(_.equalsIgnoreCase(name))) found = true
    rs.close()
    found
  }

  /** Kahn topo-sort, parents (FK targets) first; tables on a cycle
    * (self-nesting tags) are appended last in name order — their
    * intra-batch FK rows may need deferred constraints on such schemas.
    */
  private[etl] def topoParentsFirst(tables: Set[String], edges: Seq[(String, String)]): Seq[String] = {
    val deps = edges.filter { case (c, p) => c != p && tables(c) && tables(p) }
    var remaining = tables
    var pending = deps
    val out = Seq.newBuilder[String]
    var progress = true
    while (remaining.nonEmpty && progress) {
      // a table is emittable when no remaining table still points at it as a child... i.e.
      // it has no un-emitted parents
      val ready = remaining.filter(t => !pending.exists(_._1 == t)) match {
        case s if s.nonEmpty => s
        case _ => Set.empty[String]
      }
      if (ready.isEmpty) progress = false
      else {
        out ++= ready.toSeq.sorted
        remaining --= ready
        pending = pending.filterNot { case (_, p) => ready(p) }
      }
    }
    out ++= remaining.toSeq.sorted // cycle remainder
    out.result()
  }

  private def exec(conn: Connection, sql: String): Unit = {
    val st = conn.createStatement()
    // some engines (Derby) reject trailing statement terminators
    try st.execute(sql.trim.stripSuffix(";")) finally st.close()
  }

  /** Create-or-evolve one tag table: fixed columns + observed attribute
    * columns (A12/A13), returning its full lowercase column set.
    */
  def ensureTable(conn: Connection, cfg: MirrorConfig, tableRaw: String,
      attrCols: Seq[String]): Set[String] = {
    val table = tableRaw.toLowerCase
    val valueCol = Sanitize.valueColumnName(tableRaw)
    val wanted: Seq[(String, String)] =
      (TagTables.CommonColumns :+ valueCol).map(_ -> cfg.dialect.textType) ++
        attrCols.map(a => Sanitize.sanitizeXmlName(a).toLowerCase -> cfg.dialect.textType)
    val existing = tableColumns(conn, cfg, table)
    if (existing.isEmpty) {
      val colsSql = wanted.distinctBy(_._1).map { case (c, t) =>
        // id columns get an indexable narrow type on engines that cannot
        // index wide VARCHARs (Derby); FK column type must match the PK's
        val typ =
          if ((c == "element_id" || c == "parent_element_id") && cfg.dialect == DerbyDialect)
            "VARCHAR(64)"
          else t
        val pk = if (c == "element_id") " NOT NULL PRIMARY KEY" else ""
        s"${q(c)} $typ$pk"
      }.mkString(", ")
      exec(conn, s"CREATE TABLE ${q(cfg.schema)}.${q(table)} ($colsSql)")
      invalidate(cfg, table)
    } else {
      wanted.map(_._1).distinct.filterNot(existing.contains).foreach { c =>
        exec(conn, s"ALTER TABLE ${q(cfg.schema)}.${q(table)} ADD COLUMN ${q(c)} ${cfg.dialect.textType}")
        invalidate(cfg, table)
      }
    }
    tableColumns(conn, cfg, table)
  }

  /** Mirror one ingest batch. Returns the set of mirrored table names. */
  def mirrorBatch(tall: DataFrame, cfg: MirrorConfig): Set[String] = {
    if (cfg.dialect == DerbyDialect) registerDerbyDialect
    columnCache.clear() // per-batch cache scope, like the reference's per-file clear
    // merge attribute keysets across tag-case variants: <eVitals.06> and
    // <EVitals.06> both land in table "evitals_06" and must contribute
    // their attributes to the SAME column set
    val attrsByTable: Map[String, Seq[String]] =
      TagTables.attributeColumns(tall)
        .groupBy(_._1.toLowerCase)
        .map { case (t, m) => t -> m.values.flatten.toSeq.distinct.sorted }
    val tables = tall.select(lower(col("table_name")).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    val pcrKeys = tall.select("pcr_uuid_context").where(col("pcr_uuid_context").isNotNull)
      .distinct().collect().map(_.getString(0)).toSeq
    // Container elements (document root/header) carry no PCR context, so
    // the keyed delete misses them; with deterministic ids a same-file
    // replay would then violate the element_id PK. Evict them by id —
    // a handful of rows per document, and their ON DELETE CASCADE also
    // clears any stale descendants. (The reference replays with fresh
    // uuid4 ids and silently accumulates these rows instead.)
    val containerIds: Map[String, Seq[String]] =
      tall.where(col("pcr_uuid_context").isNull)
        .select(lower(col("table_name")).as("t"), col("element_id"))
        .collect().groupBy(_.getString(0))
        .map { case (t, rows) => t -> rows.map(_.getString(1)).toSeq }
    val edges = TagTables.fkEdges(tall).collect()
      .map(r => (r.getString(0), r.getString(1)))

    val conn = connect(cfg)
    try {
      conn.setAutoCommit(false)
      try {
        tables.foreach { t =>
          ensureTable(conn, cfg, t,
            attrsByTable.getOrElse(t, Seq.empty))
          // A15 keyed pre-delete, one statement per table (vs per key+table)
          if (pcrKeys.nonEmpty)
            exec(conn, JdbcDdl.deleteByKeys(cfg.schema, t, pcrKeys))
          containerIds.get(t).filter(_.nonEmpty).foreach { ids =>
            val in = ids.map(i => s"'${i.replace("'", "''")}'").mkString(", ")
            exec(conn, s"DELETE FROM ${q(cfg.schema)}.${q(t)} WHERE ${q("element_id")} IN ($in)")
          }
        }
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    } finally conn.close()

    // Row traffic: executors -> DB, batched appends per tag table —
    // parents before children (topological order over the FK edges), so
    // constraints from earlier batches hold during insert; the reference
    // gets this implicitly from row-at-a-time preorder inserts.
    val props = new Properties()
    if (cfg.user.nonEmpty) props.put("user", cfg.user)
    if (cfg.password.nonEmpty) props.put("password", cfg.password)
    props.put("batchsize", cfg.batchSize.toString)
    val orderedTables = topoParentsFirst(tables, edges.map {
      case (c, p) => (c.toLowerCase, p.toLowerCase)
    }.toSeq)
    orderedTables.foreach { t =>
      val attrs = attrsByTable.getOrElse(t, Seq.empty)
      TagTables.wideView(tall, t, attrs)
        .write.mode(SaveMode.Append)
        .jdbc(cfg.url, s"${q(cfg.schema)}.${q(t)}", props)
    }

    // A18/A19: FK edges with truncation-safe names, created once.
    val conn2 = connect(cfg)
    try {
      conn2.setAutoCommit(false)
      try {
        edges.foreach { case (childRaw, parentRaw) =>
          val name = FkNames.fkConstraintName(childRaw, parentRaw)
          if (!constraintExists(conn2, cfg, childRaw.toLowerCase, name))
            exec(conn2, JdbcDdl.addForeignKey(cfg.schema, childRaw, parentRaw))
        }
        conn2.commit()
      } catch { case e: Throwable => conn2.rollback(); throw e }
    } finally conn2.close()
    tables
  }
}
