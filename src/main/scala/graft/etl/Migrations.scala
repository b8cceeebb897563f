package graft.etl

import java.sql.Connection

import org.apache.spark.sql.DataFrame

/** Schema migrations (SURVEY A30): the reference's one Alembic migration
  * renames every dynamic table's `text_content` column to the
  * `{table}_value` contract (`alembic/versions/1941212973eb:35-83`, with
  * a reversible downgrade). Lake form: rewrite with `withColumnRenamed`;
  * JDBC mirror form: emit `ALTER TABLE ... RENAME COLUMN` DDL.
  *
  * Alembic also keeps BOOKKEEPING: it stamps the applied revision in a
  * control table and consults it before running anything
  * (`alembic/env.py:71-107`), so "has this mirror been migrated?" is
  * answerable and re-runs are no-ops. [[applyOnce]] mirrors that using
  * the existing SchemaVersions control table (VersionNumber = revision
  * id, CreationDate = applied-at, Description free text).
  */
object Migrations {

  /** The reference migration's Alembic revision id
    * (`alembic/versions/1941212973eb_*.py`) — the stamp under which
    * [[renameValueColumnSql]] DDL is recorded.
    */
  val RenameValueColumnRevision = "1941212973eb"

  /** Upgrade one wide per-tag DataFrame: text_content -> {table}_value.
    * No-op if the column is absent (idempotent, like the reference's
    * information_schema guard).
    */
  def renameValueColumn(df: DataFrame, tableRaw: String): DataFrame =
    if (df.columns.contains("text_content"))
      df.withColumnRenamed("text_content", Sanitize.valueColumnName(tableRaw))
    else df

  /** Downgrade: {table}_value -> text_content. */
  def revertValueColumn(df: DataFrame, tableRaw: String): DataFrame = {
    val vc = Sanitize.valueColumnName(tableRaw)
    if (df.columns.contains(vc)) df.withColumnRenamed(vc, "text_content") else df
  }

  /** JDBC mirror DDL for the same migration (PostgreSQL syntax; Derby
    * spells column rename as a standalone RENAME COLUMN statement).
    */
  def renameValueColumnSql(schema: String, tableRaw: String): String =
    renameValueColumnSql(schema, tableRaw, JdbcMirror.PostgresDialect)

  def renameValueColumnSql(schema: String, tableRaw: String,
      dialect: JdbcMirror.SqlDialect): String = {
    val table = tableRaw.toLowerCase
    val vc = Sanitize.valueColumnName(tableRaw)
    dialect match {
      case JdbcMirror.DerbyDialect =>
        s"""RENAME COLUMN "$schema"."$table"."text_content" TO "$vc""""
      case _ =>
        s"""ALTER TABLE "$schema"."$table" RENAME COLUMN "text_content" TO "$vc";"""
    }
  }

  /** Is `revision` already stamped in SchemaVersions? Unquoted
    * identifiers to match `JdbcDdl.bootstrap`'s per-engine folding.
    */
  def isStamped(conn: Connection, schema: String, revision: String): Boolean = {
    val st = conn.prepareStatement(
      s"""SELECT SchemaVersionID FROM "$schema".SchemaVersions WHERE VersionNumber = ?""")
    try {
      st.setString(1, revision)
      val rs = st.executeQuery()
      try rs.next() finally rs.close()
    } finally st.close()
  }

  /** Record `revision` as applied (VersionNumber unique — a duplicate
    * stamp is a caller bug and surfaces as the constraint violation).
    */
  def stamp(conn: Connection, schema: String, revision: String,
      description: String): Unit = {
    val st = conn.prepareStatement(
      s"""INSERT INTO "$schema".SchemaVersions
         | (VersionNumber, CreationDate, Description)
         | VALUES (?, CURRENT_TIMESTAMP, ?)""".stripMargin)
    try {
      st.setString(1, revision)
      st.setString(2, description)
      st.executeUpdate()
      ()
    } finally st.close()
  }

  /** Run a migration's DDL exactly once per mirror: consult the stamp,
    * apply + stamp in ONE transaction when absent (a failed statement
    * rolls the stamp back with it — the mirror is never marked migrated
    * without being migrated), no-op when present. Returns whether the
    * DDL ran. Bootstraps the control tables first so a fresh mirror can
    * be migrated before its first ingest.
    */
  def applyOnce(conn: Connection, cfg: JdbcMirror.MirrorConfig,
      revision: String, description: String, ddl: Seq[String]): Boolean = {
    JdbcMirror.ensureControlTables(conn, cfg)
    if (isStamped(conn, cfg.schema, revision)) false
    else {
      val auto = conn.getAutoCommit
      conn.setAutoCommit(false)
      try {
        ddl.foreach(JdbcMirror.exec(conn, _))
        stamp(conn, cfg.schema, revision, description)
        conn.commit()
        true
      } catch {
        case e: Throwable =>
          conn.rollback()
          // two migrators can race past the pre-check (it runs in
          // autocommit, before this transaction); the loser's DDL or
          // stamp INSERT then fails against the winner's committed
          // state. Losing that race IS the exactly-once contract
          // holding — report no-op, don't rethrow.
          if (isStamped(conn, cfg.schema, revision)) false else throw e
      } finally conn.setAutoCommit(auto)
    }
  }

  /** The reference migration, stamped: rename `text_content` on every
    * given dynamic table, recorded under [[RenameValueColumnRevision]].
    */
  def migrateValueColumns(conn: Connection, cfg: JdbcMirror.MirrorConfig,
      tablesRaw: Seq[String]): Boolean =
    applyOnce(conn, cfg, RenameValueColumnRevision,
      "rename text_content to {table}_value",
      tablesRaw.map(renameValueColumnSql(cfg.schema, _, cfg.dialect)))
}
