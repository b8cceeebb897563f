package graft.etl

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** Alembic-style migration bookkeeping (`alembic/env.py:71-107`): the
  * rename migration applies to the Derby mirror exactly once — apply →
  * stamp in SchemaVersions → a second apply is a no-op (which is also
  * what keeps it SAFE: re-running the rename DDL after the column is
  * gone would fail).
  */
class MigrationStampSpec extends AnyFunSuite {

  private def cfgFor(db: String) = JdbcMirror.MirrorConfig(
    s"jdbc:derby:memory:$db;create=true", dialect = JdbcMirror.DerbyDialect)

  test("rename migration applies once, stamps, and no-ops on re-apply") {
    val cfg = cfgFor("migrate_stamp")
    val conn = DriverManager.getConnection(cfg.url)
    try {
      // a legacy dynamic table still on the text_content contract
      JdbcMirror.exec(conn,
        """CREATE TABLE "APP"."evitals_06" ("element_id" VARCHAR(64), "text_content" VARCHAR(256))""")

      assert(Migrations.migrateValueColumns(conn, cfg, Seq("eVitals_06")),
        "first apply must run the DDL")
      // column renamed per the {table}_value contract
      val cols = {
        val rs = conn.getMetaData.getColumns(null, "APP", "evitals_06", null)
        val out = Iterator.continually(rs).takeWhile(_.next())
          .map(_.getString("COLUMN_NAME")).toList
        rs.close(); out
      }
      assert(cols.contains(Sanitize.valueColumnName("eVitals_06")))
      assert(!cols.contains("text_content"))
      // stamped under the reference's revision id
      assert(Migrations.isStamped(conn, cfg.schema, Migrations.RenameValueColumnRevision))

      // second apply: answered from the stamp, runs nothing (running the
      // rename again would throw — the column no longer exists)
      assert(!Migrations.migrateValueColumns(conn, cfg, Seq("eVitals_06")))
    } finally conn.close()
  }

  test("a failing migration statement rolls the stamp back with it") {
    val cfg = cfgFor("migrate_rollback")
    val conn = DriverManager.getConnection(cfg.url)
    try {
      intercept[java.sql.SQLException] {
        Migrations.migrateValueColumns(conn, cfg, Seq("no_such_table"))
      }
      assert(!Migrations.isStamped(conn, cfg.schema, Migrations.RenameValueColumnRevision),
        "failed DDL must not leave the mirror marked as migrated")
      // and the migration is retryable once the precondition exists
      JdbcMirror.exec(conn,
        """CREATE TABLE "APP"."no_such_table" ("text_content" VARCHAR(16))""")
      assert(Migrations.migrateValueColumns(conn, cfg, Seq("no_such_table")))
    } finally conn.close()
  }

  test("dialect-specific rename DDL") {
    assert(Migrations.renameValueColumnSql("public", "eVitals_06") ==
      """ALTER TABLE "public"."evitals_06" RENAME COLUMN "text_content" TO "evitals_06_value";""")
    assert(Migrations.renameValueColumnSql("APP", "eVitals_06", JdbcMirror.DerbyDialect) ==
      """RENAME COLUMN "APP"."evitals_06"."text_content" TO "evitals_06_value"""")
  }
}
