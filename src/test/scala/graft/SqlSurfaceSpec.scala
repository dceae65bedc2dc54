package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** lake.sql(...) surface: tables as views + stored macro expansion
  * (reference macros/ test dir + view dialect storage). */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sql() queries lake tables; macros expand at call sites") {
    val dir = Files.createTempDirectory("graftsql").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("sales",
      Seq((1, 100.0), (2, 200.0), (3, 300.0)).toDF("id", "amount"))
    val direct = lake.sql(
      "SELECT SUM(amount) AS s FROM sales WHERE id >= 2")
    assert(direct.head().getDouble(0) == 500.0)

    lake.createMacro("with_tax", Seq("x"), "x * 1.1")
    val viaMacro = lake.sql(
      "SELECT SUM(with_tax(amount)) AS s FROM sales")
    assert(math.abs(viaMacro.head().getDouble(0) - 660.0) < 1e-9)

    // macro inside a bigger expression; multiple call sites
    val multi = lake.sql(
      "SELECT with_tax(amount) AS a, CAST(with_tax(100) AS DOUBLE) AS b FROM sales WHERE id = 1")
    val row = multi.head()
    assert(math.abs(row.getDouble(0) - 110.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - 110.0) < 1e-9)

    // DML through the lake then re-query via sql()
    lake.delete("sales", col("id") === 1)
    assert(lake.sql("SELECT COUNT(*) AS n FROM sales").head().getLong(0) == 2)
  }
}
