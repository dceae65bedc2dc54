package graft.catalog

import java.sql.SQLException

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit coverage for the CLI catalog bridges' parsing/rendering edges
  * (the live-engine behavior is covered by SqliteCatalogSpec /
  * PostgresCatalogSpec): duplicate result columns, blank CSV records,
  * unbound placeholders, URL credential plumbing, and binary literals.
  * Reference: the sqlite/postgres metadata managers exercise these same
  * paths through real drivers (src/include/metadata_manager/
  * sqlite_metadata_manager.hpp:15-29, postgres_metadata_manager.hpp:15-41).
  */
class CliBridgeUnitSpec extends AnyFunSuite {

  // ------------------------------------------------ sqlite JSON parsing

  test("sqlite json: duplicate keys in one object keep every value") {
    // sqlite3 .mode json emits `{"a":1,"a":2}` for SELECT 1 AS a, 2 AS a;
    // naive Jackson binding keeps only the last — the streaming parser
    // must keep both, first occurrence owning the bare name.
    val rows = SqliteCliCatalog.parseRows("""[{"a":1,"a":2,"b":3}]""")
    assert(rows.size == 1)
    val r = rows.head
    assert(r.size() == 3, r)
    assert(r.get("a") == Long.box(1L)) // by-name = first occurrence
    val inOrder = new java.util.ArrayList[Object](r.values())
    assert(inOrder.get(0) == Long.box(1L))
    assert(inOrder.get(1) == Long.box(2L))
    assert(inOrder.get(2) == Long.box(3L))
  }

  test("sqlite json: typed values survive (null/string/int/real)") {
    val rows = SqliteCliCatalog.parseRows(
      """[{"s":"x","i":-7,"f":1.5,"n":null}]""")
    val r = rows.head
    assert(r.get("s") == "x")
    assert(r.get("i") == Long.box(-7L))
    assert(r.get("f") == Double.box(1.5))
    assert(r.get("n") == null && r.containsKey("n"))
  }

  // ------------------------------------------------ postgres CSV parsing

  test("pg csv: stray blank records drop in wide results; a blank line " +
    "in a ONE-column result is a legitimate empty-string row") {
    val wide = PostgresCliCatalog.parseCsv("a,b\n1,2\n\n3,4\n")
    assert(wide.map(r => (r.get("a"), r.get("b"))) ==
      Seq(("1", "2"), ("3", "4")))
    val narrow = PostgresCliCatalog.parseCsv("v\nx\n\ny\n")
    assert(narrow.map(_.get("v")) == Seq("x", "", "y"))
  }

  test("pg csv: duplicate header columns are uniquified in order") {
    val rows = PostgresCliCatalog.parseCsv("count,count\n5,6\n")
    val r = rows.head
    assert(r.get("count") == "5")
    val inOrder = new java.util.ArrayList[Object](r.values())
    assert(inOrder.get(0) == "5" && inOrder.get(1) == "6")
  }

  // ------------------------------------------------ placeholder rendering

  test("render: unbound ? placeholder throws 07001, never silent NULL") {
    val e = intercept[SQLException](
      CliJdbc.render("SELECT ?, ?", Seq(1L), PostgresCliCatalog.literal))
    assert(e.getSQLState == "07001")
    // fully bound still renders, including inside-literal '?' untouched
    assert(CliJdbc.render("SELECT ?, 'a?b'", Seq(2L),
      PostgresCliCatalog.literal) == "SELECT 2, 'a?b'")
  }

  // ------------------------------------------------ psql argv / env

  test("psqlArgs: password → PGPASSWORD env, never argv") {
    val (argv, env) = PostgresCliCatalog.psqlArgs(
      "jdbc:postgresql://h:5544/db?user=u&password=sekret")
    assert(argv.containsSlice(Seq("-U", "u")))
    assert(!argv.exists(_.contains("sekret")))
    assert(env == Map("PGPASSWORD" -> "sekret"))
  }

  test("psqlArgs: unsupported URL options are rejected, not dropped") {
    val e = intercept[IllegalArgumentException](
      PostgresCliCatalog.psqlArgs(
        "jdbc:postgresql://h/db?user=u&ssl=true"))
    assert(e.getMessage.contains("ssl"))
  }

  // ------------------------------------------------ binary literals

  test("pg literal: Array[Byte] renders as hex bytea, not toString") {
    assert(PostgresCliCatalog.literal(Array[Byte](0, 127, -1)) ==
      "'\\x007fff'::bytea")
  }
}
