package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity behaviors of ducklake_add_data_files beyond the basic
  * name-mapping path (AddDataFilesSpec): the per-column type-check lattice
  * (test/sql/add_files/add_files_type_check_*.test), equivalent-path
  * dedup (add_files_equivalent_path_duplicate.test), glob expansion
  * (add_files_overlapping_globs.test), hive partition columns served as
  * data (add_files_hive*.test), partitioned-table validation
  * (add_file_partitioned.test) and nested missing fields
  * (add_files_missing_fields.test). */
class AddFilesParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): (Lake, String) = {
    val dir = Files.createTempDirectory("graftafp").toString
    (Lake.attach(spark, s"$dir/cat", s"$dir/data"), dir)
  }

  private def oneFile(dir: String): String =
    Files.walk(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".parquet")).findFirst().get().toString

  private def writeDf(df: org.apache.spark.sql.DataFrame,
      dir: String): String = {
    df.coalesce(1).write.parquet(dir)
    oneFile(dir)
  }

  // ------------------------------------------------ type-check lattice

  test("type check: the signed-integer widening lattice " +
      "(add_files_type_check_integer.test)") {
    val (lake, dir) = freshLake()
    val byteF = writeDf(Seq(1.toByte).toDF("col1"), s"$dir/i8")
    val intF = writeDf(Seq(42).toDF("col1"), s"$dir/i32")
    val longF = writeDf(Seq(42L).toDF("col1"), s"$dir/i64")
    val boolF = writeDf(Seq(true).toDF("col1"), s"$dir/b")

    // int file into BOOLEAN table: rejected, message names the table type
    lake.createTable("tb", StructType(Seq(StructField("col1", BooleanType))))
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("tb", Seq(intF)))
    assert(e.getMessage.contains("Failed to map column") &&
      e.getMessage.toUpperCase.contains("BOOLEAN"))
    lake.addDataFiles("tb", Seq(boolF))
    assert(lake.table("tb").head().getBoolean(0))

    // narrower signed widens, wider rejects
    lake.createTable("ti", StructType(Seq(StructField("col1", IntegerType))))
    lake.addDataFiles("ti", Seq(byteF)) // int8 → int32 OK
    assert(lake.table("ti").head().getInt(0) == 1)
    val e2 = intercept[IllegalArgumentException](
      lake.addDataFiles("ti", Seq(longF)))
    assert(e2.getMessage.contains("Failed to map column"))

    // bigint accepts everything signed below it
    lake.createTable("tl", StructType(Seq(StructField("col1", LongType))))
    lake.addDataFiles("tl", Seq(byteF))
    lake.addDataFiles("tl", Seq(intF))
    lake.addDataFiles("tl", Seq(longF))
    assert(lake.table("tl").as[Long].collect().sorted.toSeq ==
      Seq(1L, 42L, 42L))
  }

  test("type check: float/double and decimal widening " +
      "(add_files_type_check_float/decimal.test)") {
    val (lake, dir) = freshLake()
    val floatF = writeDf(Seq(1.5f).toDF("col1"), s"$dir/f32")
    val doubleF = writeDf(Seq(2.5d).toDF("col1"), s"$dir/f64")
    lake.createTable("td", StructType(Seq(StructField("col1", DoubleType))))
    lake.addDataFiles("td", Seq(floatF)) // float → double OK
    lake.addDataFiles("td", Seq(doubleF))
    assert(lake.table("td").count() == 2)
    lake.createTable("tf", StructType(Seq(StructField("col1", FloatType))))
    intercept[IllegalArgumentException](lake.addDataFiles("tf", Seq(doubleF)))

    val decNarrow = writeDf(
      Seq(BigDecimal("12.3")).toDF("col1")
        .select(col("col1").cast(DecimalType(4, 1)).as("col1")),
      s"$dir/d41")
    val decWide = writeDf(
      Seq(BigDecimal("12345.678")).toDF("col1")
        .select(col("col1").cast(DecimalType(18, 3)).as("col1")),
      s"$dir/d183")
    lake.createTable("tdec",
      StructType(Seq(StructField("col1", DecimalType(18, 3)))))
    lake.addDataFiles("tdec", Seq(decNarrow)) // (4,1) ⊆ (18,3)
    lake.addDataFiles("tdec", Seq(decWide))
    assert(lake.table("tdec").count() == 2)
    lake.createTable("tdec2",
      StructType(Seq(StructField("col1", DecimalType(4, 1)))))
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("tdec2", Seq(decWide)))
    assert(e.getMessage.contains("Failed to map column"))
    // varchar into int: rejected
    val strF = writeDf(Seq("x").toDF("col1"), s"$dir/s")
    lake.createTable("ts", StructType(Seq(StructField("col1", IntegerType))))
    intercept[IllegalArgumentException](lake.addDataFiles("ts", Seq(strF)))
  }

  test("widened foreign values read back under the table type and " +
      "min/max stats prune (type-check scan path)") {
    val (lake, dir) = freshLake()
    val byteF = writeDf(Seq(7.toByte, 9.toByte).toDF("v"), s"$dir/w8")
    lake.createTable("tw", StructType(Seq(StructField("v", LongType))))
    lake.addDataFiles("tw", Seq(byteF))
    lake.append("tw", Seq(100L).toDF("v"))
    assert(lake.table("tw").schema.head.dataType == LongType)
    assert(lake.table("tw").as[Long].collect().sorted.toSeq ==
      Seq(7L, 9L, 100L))
    // stats from the foreign file were collected under the TABLE type →
    // catalog pruning sees [7, 9] and skips the file for v = 100
    assert(lake.table("tw", Some(col("v") === 100L)).count() == 1)
    assert(lake.table("tw", Some(col("v") === 8L)).count() == 0)
    // the stats came from the parquet FOOTER (no row scan at add time)
    // and still prune: v = 100 reads only the natively-written file
    val q = lake.table("tw", Some(col("v") === 100L))
    val nFiles = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.relation.location.inputFiles.length).sum
    assert(nFiles == 1,
      s"footer-derived stats must prune the foreign file, scanned $nFiles")
  }

  // --------------------------------------------- path dedup and globs

  test("equivalent path spellings register once " +
      "(add_files_equivalent_path_duplicate.test)") {
    val (lake, dir) = freshLake()
    val f = writeDf(Seq(42).toDF("i"), s"$dir/one")
    lake.createTable("exact_repeat",
      StructType(Seq(StructField("i", IntegerType))))
    lake.addDataFiles("exact_repeat", Seq(f, f))
    assert(lake.table("exact_repeat").count() == 1)

    val parent = new java.io.File(f).getParent
    val name = new java.io.File(f).getName
    lake.createTable("equivalent_repeat",
      StructType(Seq(StructField("i", IntegerType))))
    lake.addDataFiles("equivalent_repeat", Seq(s"$parent/./$name", f))
    assert(lake.table("equivalent_repeat").count() == 1)
    assert(lake.listFiles("equivalent_repeat").count() == 1)
  }

  test("glob expansion incl. ** and overlapping-glob dedup " +
      "(add_files_overlapping_globs.test)") {
    val (lake, dir) = freshLake()
    writeDf(Seq(1).toDF("i"), s"$dir/g/a")
    writeDf(Seq(2).toDF("i"), s"$dir/g/b/deep")
    lake.createTable("tg", StructType(Seq(StructField("i", IntegerType))))
    // ** recursive glob + an overlapping narrower glob: dedupe to 2 files
    lake.addDataFiles("tg",
      Seq(s"$dir/g/**/*.parquet", s"$dir/g/a/*.parquet"))
    assert(lake.table("tg").as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(lake.listFiles("tg").count() == 2)
  }

  // ------------------------------------------- hive columns as data

  test("hive partition key serves a column missing from the file; " +
      "un-castable value errors (add_files_hive_mismatch.test)") {
    val (lake, dir) = freshLake()
    // files do NOT contain part_key — it lives only in the path
    val f1 = writeDf(Seq((10, "hello")).toDF("part_key2", "val"),
      s"$dir/hm/part_key=p1/part_key2=x")
    // 'p1' cannot cast to INTEGER
    lake.createTable("test", StructType(Seq(
      StructField("part_key", IntegerType),
      StructField("part_key2", IntegerType),
      StructField("val", StringType))))
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("test", Seq(f1)))
    assert(e.getMessage.contains("exists as a hive partition with value") &&
      e.getMessage.contains("p1"))
    // VARCHAR part_key accepts it; part_key2 comes from the path too and
    // takes precedence over the file's column (hive wins)
    lake.dropTable("test")
    lake.createTable("test", StructType(Seq(
      StructField("part_key", StringType),
      StructField("part_key2", StringType),
      StructField("val", StringType))))
    lake.addDataFiles("test", Seq(f1))
    val r = lake.table("test").head()
    assert(r.getString(0) == "p1" && r.getString(1) == "x" &&
      r.getString(2) == "hello")
    // a non-hive file still adds (columns all in the file)
    val f2 = writeDf(
      Seq(("p9", "y", "plain")).toDF("part_key", "part_key2", "val"),
      s"$dir/plain")
    lake.addDataFiles("test", Seq(f2))
    assert(lake.table("test").count() == 2)
    // hive_partitioning=false ignores the path: a column living only in
    // the path segments is then simply missing from the file
    val f3 = writeDf(Seq("solo").toDF("val"),
      s"$dir/hm3/part_key=p1/part_key2=x")
    lake.dropTable("test")
    lake.createTable("test", StructType(Seq(
      StructField("part_key", StringType),
      StructField("part_key2", StringType),
      StructField("val", StringType))))
    val e2 = intercept[IllegalArgumentException](
      lake.addDataFiles("test", Seq(f3), hivePartitions = false))
    assert(e2.getMessage.contains("allow_missing"))
  }

  test("partitioned table demands every partition key pinned by the " +
      "path (add_file_partitioned.test)") {
    val (lake, dir) = freshLake()
    lake.createTable("pt", StructType(Seq(
      StructField("id", IntegerType),
      StructField("pc", IntegerType))))
    lake.setPartitionedBy("pt", Seq(("pc", "identity")))
    // file under pc=2/: the hive value fills the partition value AND the
    // column (the file omits pc)
    val ok = writeDf(Seq(4).toDF("id"), s"$dir/pt/pc=2")
    lake.addDataFiles("pt", Seq(ok))
    assert(lake.table("pt").select("pc").head().getInt(0) == 2)
    assert(lake.table("pt", Some(col("pc") === 2)).count() == 1)
    // file NOT under a pc= dir (pc in the file data): invalid config
    val bad = writeDf(Seq((5, 2)).toDF("id", "pc"), s"$dir/pt2")
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("pt", Seq(bad)))
    assert(e.getMessage.contains(
      "invalid partition value for the table configuration"))
    // file under a DIFFERENT key's dir: invalid too
    val wrong = writeDf(Seq(6).toDF("id"), s"$dir/pt3/other=2")
    intercept[IllegalArgumentException](lake.addDataFiles("pt", Seq(wrong)))
  }

  test("year/month/day transform keys fill transform partition values " +
      "(add_file_partitioned.test multi-column)") {
    val (lake, dir) = freshLake()
    lake.createTable("mt", StructType(Seq(
      StructField("id", IntegerType),
      StructField("dt", DateType))))
    lake.setPartitionedBy("mt",
      Seq(("dt", "year"), ("dt", "month"), ("dt", "day")))
    val f = writeDf(
      Seq((10, java.sql.Date.valueOf("2024-02-10"))).toDF("id", "dt"),
      s"$dir/mt/year=2024/month=2/day=10")
    lake.addDataFiles("mt", Seq(f))
    assert(lake.table("mt").count() == 1)
    // partition values recorded → catalog partition pruning can use them
    // (the file also carries real dt stats from its own data)
    assert(lake.table("mt",
      Some(col("dt") === java.sql.Date.valueOf("2024-02-10"))).count() == 1)
    // missing one key → invalid
    val f2 = writeDf(
      Seq((11, java.sql.Date.valueOf("2024-03-01"))).toDF("id", "dt"),
      s"$dir/mt2/year=2024/month=3")
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("mt", Seq(f2)))
    assert(e.getMessage.contains("invalid partition value"))
  }

  test("bucket transform key validates the bucket range") {
    val (lake, dir) = freshLake()
    lake.createTable("bt", StructType(Seq(
      StructField("id", IntegerType))))
    lake.setPartitionedBy("bt", Seq(("id", "bucket(4)")))
    val inRange = writeDf(Seq(1).toDF("id"), s"$dir/bt/bucket=2")
    lake.addDataFiles("bt", Seq(inRange))
    assert(lake.table("bt").count() == 1)
    val outRange = writeDf(Seq(2).toDF("id"), s"$dir/bt2/bucket=9")
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("bt", Seq(outRange)))
    assert(e.getMessage.contains("invalid partition value"))
  }

  test("a lake's own partitioned layout round-trips through " +
      "add_data_files (write labels = reference GetPartitionKeyName)") {
    val (lakeA, _) = freshLake()
    lakeA.createTable("p", StructType(Seq(
      StructField("id", IntegerType), StructField("dt", DateType))))
    lakeA.setPartitionedBy("p", Seq(("dt", "year")))
    lakeA.append("p", Seq(
      (1, java.sql.Date.valueOf("2023-03-01")),
      (2, java.sql.Date.valueOf("2024-05-01"))).toDF("id", "dt"))
    val files = lakeA.listFiles("p").select("data_file").as[String]
      .collect().map(p => s"${lakeA.dataPath}/$p").toSeq
    assert(files.forall(_.contains("year=")),
      s"write labels must use the reference key names, got $files")

    val (lakeB, _) = freshLake()
    lakeB.createTable("p", StructType(Seq(
      StructField("id", IntegerType), StructField("dt", DateType))))
    lakeB.setPartitionedBy("p", Seq(("dt", "year")))
    lakeB.addDataFiles("p", files)
    assert(lakeB.table("p").count() == 2)
    // transform partition values flowed → year-eq pruning works
    val q = lakeB.table("p",
      Some(col("dt") === java.sql.Date.valueOf("2024-05-01")))
    assert(q.count() == 1)
  }

  // ------------------------------------------------ nested missing

  test("missing nested struct field: reference error, then NULL with " +
      "allow_missing (add_files_missing_fields.test)") {
    val (lake, dir) = freshLake()
    lake.createTable("test", StructType(Seq(
      StructField("s", StructType(Seq(
        StructField("i", IntegerType), StructField("j", IntegerType)))))))
    val f = writeDf(
      spark.sql("SELECT named_struct('j', 84) AS s"), s"$dir/mf")
    val e = intercept[IllegalArgumentException](
      lake.addDataFiles("test", Seq(f)))
    assert(e.getMessage.contains("\"s.i\" exists in table") &&
      e.getMessage.contains("allow_missing"))
    lake.addDataFiles("test", Seq(f), allowMissing = true)
    val row = lake.table("test").head().getStruct(0)
    assert(row.isNullAt(0) && row.getInt(1) == 84)
  }

  test("extra columns: reference error text, ignored with the flag " +
      "(add_files_extra_columns.test)") {
    val (lake, dir) = freshLake()
    lake.createTable("t", StructType(Seq(StructField("a", IntegerType))))
    val f = writeDf(Seq((1, "junk")).toDF("a", "b"), s"$dir/x")
    val e = intercept[IllegalArgumentException](lake.addDataFiles("t", Seq(f)))
    assert(e.getMessage.contains("\"b\" exists in file") &&
      e.getMessage.contains("ignore_extra_columns"))
    lake.addDataFiles("t", Seq(f), ignoreExtraColumns = true)
    assert(lake.table("t").head().getInt(0) == 1)
  }

  // ------------------------------------------------ SQL CALL surface

  test("CALL add_data_files with list literal and named flags") {
    val (lake, dir) = freshLake()
    val f1 = writeDf(Seq((1, "x")).toDF("a", "extra"), s"$dir/c1")
    val f2 = writeDf(Seq((2, "y")).toDF("a", "extra"), s"$dir/c2")
    lake.createTable("ct", StructType(Seq(StructField("a", IntegerType))))
    lake.sql("CALL add_data_files('ct', ['" + f1 + "', '" + f2 +
      "'], ignore_extra_columns => true)")
    assert(lake.table("ct").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }
}
