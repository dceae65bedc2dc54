package graft

import java.nio.file.Files

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** Stored SQL macros: scalar/table kinds, `:=` parameter defaults, arity
  * overloads, DROP MACRO [TABLE] — the reference test/sql/macros corpus
  * (test_simple_macro, test_default_parameter, test_macro_tables,
  * test_multiple_implementations, test_scalar_table_macros). */
class MacroSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graftmacro").toString
    Lake.attach(spark, s"$dir/cat", s"$dir/data")
  }

  test("CREATE MACRO via SQL; expansion in queries") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1, 10.0), (2, 20.0)).toDF("id", "x"))
    lake.sql("CREATE MACRO with_tax(v) AS v * 1.1")
    val r = lake.sql("SELECT SUM(with_tax(x)) AS s FROM t").head()
    assert(math.abs(r.getDouble(0) - 33.0) < 1e-9)
    // duplicate create fails; OR REPLACE succeeds and wins
    intercept[IllegalArgumentException](
      lake.sql("CREATE MACRO with_tax(v) AS v * 2"))
    lake.sql("CREATE OR REPLACE MACRO with_tax(v) AS v * 2")
    assert(lake.sql("SELECT with_tax(21) AS s").head().getInt(0) == 42)
  }

  test("default parameters fill missing trailing arguments") {
    // reference test_default_parameter.test
    val lake = freshLake()
    lake.sql("CREATE MACRO add_default(a, b := 5) AS a + b")
    assert(lake.sql("SELECT add_default(1) AS r").head().getInt(0) == 6)
    assert(lake.sql("SELECT add_default(1, 3) AS r").head().getInt(0) == 4)
    lake.sql("CREATE MACRO add_default_sec(a := 5) AS a")
    assert(lake.sql("SELECT add_default_sec('a') AS r").head()
      .getString(0) == "a")
    assert(lake.sql("SELECT add_default_sec() AS r").head().getInt(0) == 5)
  }

  test("arity overloads pick the matching implementation") {
    // reference test_multiple_implementations.test
    val lake = freshLake()
    lake.sql("""CREATE MACRO multi_add
      () AS 0,
      (a) AS a,
      (a, b) AS a + b,
      (a, b, c) AS a + b + c""")
    assert(lake.sql("SELECT multi_add() AS r").head().getInt(0) == 0)
    assert(lake.sql("SELECT multi_add(1) AS r").head().getInt(0) == 1)
    assert(lake.sql("SELECT multi_add(1,1) AS r").head().getInt(0) == 2)
    assert(lake.sql("SELECT multi_add(1,1,1) AS r").head().getInt(0) == 3)
    val e = intercept[IllegalArgumentException](
      lake.sql("SELECT multi_add(1,1,1,1) AS r").collect())
    assert(e.getMessage.contains("no implementation"))
  }

  test("table macros are FROM-able; scalar/table share a name; DROP") {
    // reference test_macro_tables.test + test_scalar_table_macros.test
    val lake = freshLake()
    lake.createTableAs("test_tbl",
      Seq((1, "tom"), (2, "dick"), (3, "harry"), (4, "mary"), (5, "mungo"),
        (6, "midge")).toDF("id", "name"))
    lake.sql("CREATE MACRO xt(a, _name) AS TABLE " +
      "SELECT * FROM test_tbl WHERE (id >= a OR name = _name)")
    val rows = lake.sql("SELECT id, name FROM xt(5, 'tom') ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "tom"), (5, "mungo"), (6, "midge")))
    // a scalar macro of the same name coexists (separate catalog row)
    lake.sql("CREATE MACRO xt(a) AS 1")
    assert(lake.sql("SELECT xt(99) AS r").head().getInt(0) == 1)
    assert(lake.sql("SELECT COUNT(*) AS n FROM xt(5, 'tom')")
      .head().getLong(0) == 3)
    // DROP MACRO TABLE removes only the table kind
    lake.sql("DROP MACRO TABLE xt")
    assert(lake.sql("SELECT xt(99) AS r").head().getInt(0) == 1)
    lake.sql("DROP MACRO xt")
    intercept[IllegalArgumentException](lake.sql("DROP MACRO xt"))
    lake.sql("DROP MACRO IF EXISTS xt") // no-op, no error
  }

  test("macros calling macros expand to fixpoint") {
    val lake = freshLake()
    lake.sql("CREATE MACRO twice(v) AS v * 2")
    lake.sql("CREATE MACRO quad(v) AS twice(twice(v))")
    assert(lake.sql("SELECT quad(3) AS r").head().getInt(0) == 12)
  }

  test("typed parameters parse and expand (test_defined_types.test)") {
    val lake = freshLake()
    lake.sql("CREATE MACRO add_one(x INTEGER) AS (x + 1)")
    assert(lake.sql("SELECT add_one(1) AS r").head().getInt(0) == 2)
    lake.sql("CREATE MACRO add_two_def(x INTEGER, y := 5) AS (x + y)")
    assert(lake.sql("SELECT add_two_def(1) AS r").head().getInt(0) == 6)
    assert(lake.sql("SELECT add_two_def(1, 2) AS r").head().getInt(0) == 3)
  }

  test("transaction-local macro DDL (test_macro_transactions.test)") {
    val lake = freshLake()
    lake.createTableAs("t", Seq(Tuple1(1)).toDF("x"))
    lake.sql("CREATE MACRO simple(a) AS a")
    val snapsBefore = lake.snapshots().count()

    lake.begin()
    // duplicate create errors at statement time
    intercept[IllegalArgumentException](
      lake.sql("CREATE MACRO simple(a) AS a"))
    // in-txn drop hides the macro from the txn's own queries
    lake.sql("DROP MACRO simple")
    intercept[Exception](lake.sql("SELECT simple(1) AS r").collect())
    // re-create inside the same txn; visible to the txn immediately
    lake.sql("CREATE MACRO simple(a) AS a + 100")
    assert(lake.sql("SELECT simple(1) AS r").head().getInt(0) == 101)
    lake.commit()
    // committed as ONE snapshot; the net effect survives
    assert(lake.snapshots().count() == snapsBefore + 1)
    assert(lake.sql("SELECT simple(1) AS r").head().getInt(0) == 101)

    // rollback discards buffered macro DDL
    lake.begin()
    lake.sql("DROP MACRO simple")
    lake.rollback()
    assert(lake.sql("SELECT simple(1) AS r").head().getInt(0) == 101)
  }

  test("DROP SCHEMA blocked by schema-qualified macros") {
    val lake = freshLake()
    lake.sql("CREATE SCHEMA test")
    lake.sql("CREATE MACRO test.simple(a) AS a")
    val e = intercept[IllegalArgumentException](lake.dropSchema("test"))
    assert(e.getMessage.contains("macros"))
    lake.sql("DROP MACRO test.simple")
    lake.dropSchema("test")
  }

  test("macro body args with nested function calls") {
    val lake = freshLake()
    lake.sql("CREATE MACRO clamp0(v) AS greatest(v, 0)")
    assert(lake.sql("SELECT clamp0(least(-5, 3)) AS r")
      .head().getInt(0) == 0)
  }
}
