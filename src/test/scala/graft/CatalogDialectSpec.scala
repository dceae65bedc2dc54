package graft

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** Catalog backend dialects (reference per-backend metadata managers:
  * postgres_metadata_manager.cpp / sqlite_metadata_manager.cpp). Derby is
  * exercised live by every lake spec; Postgres/SQLite cover their SQL
  * generation + retry classification here (no servers in the sandbox). */
class CatalogDialectSpec extends AnyFunSuite {

  test("dialect routes by JDBC URL scheme") {
    assert(CatalogDialect.forUrl("jdbc:derby:/tmp/x;create=true")
      == DerbyDialect)
    assert(CatalogDialect.forUrl("jdbc:postgresql://host:5432/lake")
      == PostgresDialect)
    assert(CatalogDialect.forUrl("jdbc:sqlite:/tmp/cat.db") == SqliteDialect)
  }

  test("postgres DDL spells DOUBLE as DOUBLE PRECISION, idempotently") {
    val in = "CREATE TABLE s (min_numeric DOUBLE, max_numeric DOUBLE PRECISION)"
    val out = PostgresDialect.ddl(in)
    assert(out ==
      "CREATE TABLE s (min_numeric DOUBLE PRECISION, max_numeric DOUBLE PRECISION)")
    assert(PostgresDialect.ddl(out) == out) // stable under re-application
    // every catalog create statement survives the rewrite as valid-shape SQL
    assert(DerbyDialect.ddl(in) == in)
  }

  test("retryable conflict states per backend") {
    // unique-violation and serialization failures retry everywhere
    Seq(DerbyDialect, PostgresDialect, SqliteDialect).foreach { d =>
      assert(d.isConflictState("23505"), d.name)
      assert(d.isConflictState("40001"), d.name)
      assert(!d.isConflictState("42000"), d.name) // syntax error: never retry
    }
    assert(DerbyDialect.isConflictState("XJ208"))
    assert(PostgresDialect.isConflictState("40P01")) // deadlock_detected
    assert(!PostgresDialect.isConflictState("XJ208"))
  }

  test("identifier limits enforced (PG NAMEDATALEN)") {
    val long64 = "t" * 64
    PostgresDialect.checkIdentifier("t" * 63)
    intercept[IllegalArgumentException](
      PostgresDialect.checkIdentifier(long64))
    DerbyDialect.checkIdentifier(long64) // fine on Derby (128)
  }

  test("a live MetadataManager resolves its dialect from the URL") {
    val dir = java.nio.file.Files.createTempDirectory("graftdia").toString
    val m = new MetadataManager(MetadataManager.derbyUrl(s"$dir/cat"))
    assert(m.dialect == DerbyDialect)
    m.initialize(s"$dir/data")
    assert(m.currentSnapshot().snapshotId == 0L)
  }
}
