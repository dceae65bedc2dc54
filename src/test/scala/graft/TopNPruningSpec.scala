package graft

import java.nio.file.Files

import graft.catalog.Lake
import graft.plans.{GraftExtensions, LakeRegistry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-N file pruning (reference stats/topn_file_pruning.test): ORDER BY
  * col DESC LIMIT k over range-clustered files reads only the files that
  * can contribute, and every soundness guard (deletes, nulls-first,
  * small k vs file sizes) falls back to the full scan with identical
  * results. */
class TopNPruningSpec extends AnyFunSuite {

  private def withLake(f: (SparkSession, Lake) => Unit): Unit = {
    SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dir = Files.createTempDirectory("grafttopn").toString
      val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
      LakeRegistry.register("graft", lake)
      f(spark, lake)
    } finally {
      LakeRegistry.unregister("graft")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum

  test("ORDER BY ts DESC LIMIT k scans only contributing files") {
    withLake { (spark, lake) =>
      import spark.implicits._
      // four range-disjoint files, like the reference's event days
      lake.createTableAs("ev",
        (0L until 1000L).map(i => (i, "a")).toDF("ts", "u").coalesce(1))
      lake.append("ev",
        (1000L until 1500L).map(i => (i, "b")).toDF("ts", "u").coalesce(1))
      lake.append("ev",
        (1500L until 1700L).map(i => (i, "c")).toDF("ts", "u").coalesce(1))
      lake.append("ev",
        (1700L until 1800L).map(i => (i, "d")).toDF("ts", "u").coalesce(1))
      assert(lake.listFiles("ev").count() == 4)

      val top1 = spark.sql(
        "SELECT ts, u FROM graft.ev ORDER BY ts DESC LIMIT 1")
      assert(top1.collect().map(r => (r.getLong(0), r.getString(1)))
        .toSeq == Seq((1799L, "d")))
      assert(scannedFiles(top1) == 1,
        "top-1 desc must read only the last file")

      // k spanning two files
      val top150 = spark.sql(
        "SELECT ts FROM graft.ev ORDER BY ts DESC LIMIT 150")
      assert(scannedFiles(top150) == 2)
      assert(top150.collect().map(_.getLong(0)).toSeq ==
        (1650L until 1800L).reverse.toSeq)

      // ascending: NULLS FIRST is Spark's asc default; the guard demands
      // provably-null-free files, which these are — so pruning fires
      val asc = spark.sql("SELECT ts FROM graft.ev ORDER BY ts LIMIT 5")
      assert(scannedFiles(asc) == 1)
      assert(asc.collect().map(_.getLong(0)).toSeq == (0L to 4L).toSeq)

      // a delete disables the optimization but results stay right
      lake.delete("ev", col("ts") === 1799L)
      val afterDel = spark.sql(
        "SELECT ts FROM graft.ev ORDER BY ts DESC LIMIT 1")
      // all 4 data files scanned (+1 delete file read by the anti-join)
      assert(scannedFiles(afterDel) >= 4)
      assert(afterDel.head().getLong(0) == 1798L)
    }
  }

  test("nulls-first ordering with nullable data falls back to full scan") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("n",
        Seq[(java.lang.Long, String)]((1L, "a"), (null, "x"), (2L, "b"))
          .toDF("v", "u").coalesce(1))
      lake.append("n",
        Seq[(java.lang.Long, String)]((10L, "c"), (20L, "d"))
          .toDF("v", "u").coalesce(1))
      // asc => NULLS FIRST by default; file 1 has a null → no pruning,
      // and the null row IS the top-1
      val q = spark.sql("SELECT v, u FROM graft.n ORDER BY v LIMIT 1")
      assert(scannedFiles(q) == 2)
      val r = q.head()
      assert(r.isNullAt(0) && r.getString(1) == "x")
      // desc => NULLS LAST: pruning may fire and must never return the null
      val d = spark.sql("SELECT v FROM graft.n ORDER BY v DESC LIMIT 1")
      assert(d.head().getLong(0) == 20L)
    }
  }

  test("string top-k prunes too") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("s",
        ('a' to 'm').map(c => s"${c}_val").toDF("w").coalesce(1))
      lake.append("s", ('n' to 'z').map(c => s"${c}_val").toDF("w")
        .coalesce(1))
      val q = spark.sql("SELECT w FROM graft.s ORDER BY w DESC LIMIT 3")
      assert(scannedFiles(q) == 1)
      assert(q.collect().map(_.getString(0)).toSeq ==
        Seq("z_val", "y_val", "x_val"))
    }
  }

  test("inlined rows holding the true extremum survive the threshold filter") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("i",
        (0L until 100L).toDF("v").coalesce(1))
      lake.append("i", (100L until 200L).toDF("v").coalesce(1))
      // inlined rows (no file stats) carry the true max
      lake.setOption("data_inlining_row_limit", "10")
      lake.append("i", Seq(999L).toDF("v").coalesce(1))
      val q = spark.sql("SELECT v FROM graft.i ORDER BY v DESC LIMIT 3")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(999L, 199L, 198L))
    }
  }
}
