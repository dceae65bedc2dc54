package graft

import java.nio.file.Files

import graft.catalog.Lake
import graft.plans.{GraftExtensions, LakeRegistry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unfiltered COUNT(*) over a lake table is answered from catalog
  * metadata (Lake.fastCount + LakeCountFromStats): the optimized plan is
  * a LocalRelation — no file scan — and the value stays exact across
  * delete files, deletion vectors, inlined deletes, inlined data rows,
  * and time travel. Reference analogue: metadata_cache.test /
  * table_cardinality.test answer COUNT(*) and estimated_size from
  * metadata alone. */
class CountFastPathSpec extends AnyFunSuite {

  private def withLake(f: (SparkSession, Lake) => Unit): Unit = {
    SparkTestSession.spark // shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.graft", "graft.sources.GraftTableCatalog")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val dir = Files.createTempDirectory("graftcnt").toString
      val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
      LakeRegistry.register("graft", lake)
      f(spark, lake)
    } finally {
      // no spark.stop(): the builder reuses the suite-shared SparkContext
      LakeRegistry.unregister("graft")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def countPlan(spark: SparkSession, sql: String) =
    spark.sql(sql).queryExecution.optimizedPlan

  private def isMetadataOnly(spark: SparkSession, sql: String): Boolean =
    countPlan(spark, sql).isInstanceOf[LocalRelation]

  test("COUNT(*) folds to the catalog count through every delete form") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("t",
        (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
      val v1 = lake.currentSnapshotId()

      def sqlCount(): Long =
        spark.sql("SELECT COUNT(*) AS n FROM graft.t").head().getLong(0)

      assert(isMetadataOnly(spark, "SELECT COUNT(*) FROM graft.t"),
        "plan must be a LocalRelation, not a scan")
      assert(sqlCount() == 100L)

      // positional delete FILE
      assert(lake.delete("t", col("id") >= 90L) == 10L)
      assert(sqlCount() == 90L)
      // inlined deletes on the same file (disjoint from the delete file)
      lake.setOption("data_inlining_row_limit", "5")
      assert(lake.delete("t", col("id") >= 87L) == 3L)
      assert(sqlCount() == 87L)
      // a second delete FILE absorbs the inlined deletes (union)
      lake.setOption("data_inlining_row_limit", "0")
      assert(lake.delete("t", col("id") >= 80L) == 7L)
      assert(sqlCount() == 80L)
      // deletion-vector format
      lake.setOption("write_deletion_vectors", "true")
      assert(lake.delete("t", col("id") < 5L) == 5L)
      assert(sqlCount() == 75L)
      assert(isMetadataOnly(spark, "SELECT COUNT(*) FROM graft.t"))
      // the fast count always agrees with the real scan
      assert(lake.table("t").count() == 75L)

      // time travel stays metadata-only and version-exact
      assert(isMetadataOnly(spark,
        s"SELECT COUNT(*) FROM graft.t VERSION AS OF $v1"))
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.t VERSION AS OF $v1")
        .head().getLong(0) == 100L)
      assert(lake.fastCount("t", version = Some(v1)).contains(100L))
    }
  }

  test("placeholder stats come from the catalog, not defaultSizeInBytes") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("dim",
        (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
      val rel = spark.sql("SELECT * FROM graft.dim")
        .queryExecution.analyzed.collectFirst {
          case p: graft.plans.LakeRelationPlaceholder => p
        }
      assert(rel.isDefined, "expected the lake placeholder in the plan")
      val st = rel.get.computeStats()
      assert(st.rowCount.contains(BigInt(20)),
        s"rowCount should be catalog-exact, got ${st.rowCount}")
      // bytes = actual parquet size, many orders below defaultSizeInBytes
      assert(st.sizeInBytes > 0 &&
        st.sizeInBytes < spark.sessionState.conf.defaultSizeInBytes,
        s"sizeInBytes should come from the catalog, got ${st.sizeInBytes}")
    }
  }

  test("inlined data rows and txn-local state are handled") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("t", (0L until 50L).toDF("id").coalesce(1))
      // inlined DATA rows (small append lands in the catalog DB)
      lake.setOption("data_inlining_row_limit", "10")
      lake.append("t", (50L until 53L).toDF("id"))
      assert(lake.fastCount("t").contains(53L))
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.t")
        .head().getLong(0) == 53L)
      assert(isMetadataOnly(spark, "SELECT COUNT(*) FROM graft.t"))

      // a WHERE clause must NOT take the fast path
      assert(!isMetadataOnly(spark,
        "SELECT COUNT(*) FROM graft.t WHERE id < 10"))
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.t WHERE id < 10")
        .head().getLong(0) == 10L)
      // count over grouped/other aggregates is untouched
      assert(spark.sql("SELECT COUNT(*) AS n, SUM(id) AS s FROM graft.t")
        .head().getLong(0) == 53L)

      // inside a transaction the catalog is stale: fall back to the scan
      // (read-your-writes must hold)
      lake.transaction {
        lake.append("t", (100L until 110L).toDF("id"))
        assert(lake.fastCount("t").isEmpty)
        assert(!isMetadataOnly(spark, "SELECT COUNT(*) FROM graft.t"))
        assert(spark.sql("SELECT COUNT(*) AS n FROM graft.t")
          .head().getLong(0) == 63L)
      }
      assert(spark.sql("SELECT COUNT(*) AS n FROM graft.t")
        .head().getLong(0) == 63L)
      assert(isMetadataOnly(spark, "SELECT COUNT(*) FROM graft.t"))
    }
  }

  test("MIN/MAX fold from catalog stats; deletes/inlined/NaN/defaults fall back") {
    withLake { (spark, lake) =>
      import spark.implicits._
      lake.createTableAs("m",
        (1L to 1000L).map(i => (i, s"s$i", i / 100.0)).toDF("i", "s", "d")
          .coalesce(1))
      def row(sql: String) = spark.sql(sql).head()
      // folds: numeric, string, double, mixed with COUNT(*)
      assert(isMetadataOnly(spark, "SELECT MIN(i), MAX(i), COUNT(*) FROM graft.m"))
      val r = row("SELECT MIN(i) AS a, MAX(i) AS b, COUNT(*) AS c FROM graft.m")
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 1000L, 1000L)))
      assert(isMetadataOnly(spark, "SELECT MIN(s), MAX(s) FROM graft.m"))
      assert(row("SELECT MAX(s) AS x FROM graft.m").getString(0) == "s999")
      assert(isMetadataOnly(spark, "SELECT MAX(d) FROM graft.m"))
      // stats widen across appends
      lake.append("m", Seq((-50L, "a", 0.0), (5000L, "zz", 9.9))
        .toDF("i", "s", "d").coalesce(1))
      assert(isMetadataOnly(spark, "SELECT MIN(i), MAX(i) FROM graft.m"))
      val r2 = row("SELECT MIN(i) AS a, MAX(i) AS b FROM graft.m")
      assert((r2.getLong(0), r2.getLong(1)) == ((-50L, 5000L)))
      // a delete disables the MIN/MAX fold (stats not tightened) but the
      // answer stays correct via the scan, and COUNT(*) still folds
      lake.delete("m", col("i") === -50L)
      assert(!isMetadataOnly(spark, "SELECT MIN(i) FROM graft.m"))
      assert(row("SELECT MIN(i) AS a FROM graft.m").getLong(0) == 1L)
      assert(isMetadataOnly(spark, "SELECT COUNT(*) FROM graft.m"))
      // grouped/filtered aggregates never fold
      assert(!isMetadataOnly(spark,
        "SELECT MAX(i) FROM graft.m WHERE i < 10"))
      // NaN contamination disables the double fold
      lake.createTableAs("nanny",
        Seq(1.0, Double.NaN, 3.0).toDF("x").coalesce(1))
      assert(!isMetadataOnly(spark, "SELECT MAX(x) FROM graft.nanny"))
      assert(row("SELECT MAX(x) AS x FROM graft.nanny").getDouble(0).isNaN)
      // ADD COLUMN DEFAULT: old files read the default the stats never saw
      lake.createTableAs("dflt", (1 to 5).toDF("a").coalesce(1))
      lake.addColumn("dflt",
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.IntegerType), Some("42"))
      assert(!isMetadataOnly(spark, "SELECT MAX(b) FROM graft.dflt"))
      assert(row("SELECT MAX(b) AS b FROM graft.dflt").getInt(0) == 42)
      // inlined rows disable the fold (their values bypass the stats)
      lake.setOption("data_inlining_row_limit", "10")
      lake.createTableAs("inl", (1L to 100L).toDF("k").coalesce(1))
      lake.append("inl", Seq(99999L).toDF("k").coalesce(1)) // inlined
      assert(!isMetadataOnly(spark, "SELECT MAX(k) FROM graft.inl"))
      assert(row("SELECT MAX(k) AS k FROM graft.inl").getLong(0) == 99999L)
    }
  }

  test("MIN/MAX fold stays exact after rewrite removes deleted extremes; Infinity blocks it") {
    withLake { (spark, lake) =>
      import spark.implicits._
      def row(sql: String) = spark.sql(sql).head()
      // delete the max, then rewrite the file away: per-file stats of the
      // REWRITTEN file are exact, so the fold returns the new true max
      lake.createTableAs("rw", (1L to 100L).toDF("i").coalesce(1))
      lake.delete("rw", col("i") === 100L)
      assert(!isMetadataOnly(spark, "SELECT MAX(i) FROM graft.rw"))
      lake.rewriteDataFiles("rw", deleteThreshold = 0.0001)
      assert(isMetadataOnly(spark, "SELECT MAX(i) FROM graft.rw"))
      assert(row("SELECT MAX(i) AS m, MIN(i) AS n FROM graft.rw")
        .getLong(0) == 99L)
      // a +Infinity double makes the max unstorable: fold must bail and
      // the scan must return Infinity
      lake.createTableAs("inf",
        Seq(1.0, 2.0).toDF("x").coalesce(1))
      lake.append("inf", Seq(Double.PositiveInfinity).toDF("x").coalesce(1))
      assert(!isMetadataOnly(spark, "SELECT MAX(x) FROM graft.inf"))
      assert(row("SELECT MAX(x) AS x FROM graft.inf").getDouble(0)
        .isPosInfinity)
      // >256-char string extremum is unstorable too
      lake.createTableAs("ls", Seq("aa", "bb").toDF("s").coalesce(1))
      lake.append("ls", Seq("z" * 300).toDF("s").coalesce(1))
      assert(!isMetadataOnly(spark, "SELECT MAX(s) FROM graft.ls"))
      assert(row("SELECT MAX(s) AS s FROM graft.ls").getString(0)
        .startsWith("zzz"))
    }
  }

  test("NULL value_count in foreign-writer stats means cannot-prove, not all-null") {
    withLake { (spark, lake) =>
      import spark.implicits._
      def row(sql: String) = spark.sql(sql).head()
      lake.createTableAs("fw", (1L to 10L).toDF("i").coalesce(1))
      lake.append("fw", Seq(5000L).toDF("i").coalesce(1))
      assert(isMetadataOnly(spark, "SELECT MAX(i) FROM graft.fw"))
      // value_count/null_count are nullable in the DuckLake DDL — a
      // catalog written by another DuckLake writer may omit them. Blank
      // them on every file (including the one holding the true max).
      val c = java.sql.DriverManager.getConnection(lake.meta.jdbcUrl)
      try {
        val st = c.createStatement()
        st.executeUpdate(
          "UPDATE ducklake_file_column_stats SET value_count = NULL")
        st.close()
      } finally c.close()
      // unknown counts must mean "cannot prove" (fold bails, the scan
      // answers) — NOT "all-null file" (which would drop the 5000 max)
      assert(!isMetadataOnly(spark, "SELECT MAX(i) FROM graft.fw"))
      assert(row("SELECT MAX(i) AS m FROM graft.fw").getLong(0) == 5000L)
      assert(row("SELECT MIN(i) AS m FROM graft.fw").getLong(0) == 1L)
    }
  }
}
