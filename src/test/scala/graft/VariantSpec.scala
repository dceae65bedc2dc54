package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VARIANT columns (reference ducklake_types.cpp:61,134): semi-structured
  * values stored as Spark 4 VariantType, queried with variant_get; type
  * string round-trips through the catalog. Geometry maps to WKB bytes. */
class VariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("variant column round-trip + variant_get extraction") {
    val dir = Files.createTempDirectory("graftvar").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val df = Seq(
      (1L, """{"kind":"click","n":3}"""),
      (2L, """{"kind":"view","n":7,"extra":[1,2]}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload"))
    lake.createTableAs("ev", df)
    // catalog stores the reference's canonical type string
    assert(lake.schemaOf("ev")("payload").dataType ==
      org.apache.spark.sql.types.VariantType)
    val got = lake.table("ev")
      .select(col("id"),
        variant_get(col("payload"), "$.kind", "string").as("kind"),
        variant_get(col("payload"), "$.n", "long").as("n"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "click", 3L), (2L, "view", 7L)))
    // DML over variant rows
    lake.delete("ev", variant_get(col("payload"), "$.kind", "string") === "view")
    assert(lake.table("ev").count() == 1)
  }

  test("shredded variant-path stats prune files on variant_get filters") {
    val dir = Files.createTempDirectory("graftvs").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("vp", Seq((0L, """{"n":0,"kind":"seed"}"""))
      .toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload")))
    // shred $.n as BIGINT → per-file min/max collected on append
    lake.setOption("variant_shredded_paths", "payload:$.n:bigint",
      table = Some("vp"))
    lake.append("vp", Seq((1L, """{"n":5,"kind":"a"}"""),
      (2L, """{"n":9,"kind":"b"}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload")).coalesce(1))
    lake.append("vp", Seq((3L, """{"n":105,"kind":"c"}"""),
      (4L, """{"n":150,"kind":"d"}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("payload")).coalesce(1))

    val t = lake.meta.tableByName("vp", lake.currentSnapshotId()).get
    val filt = variant_get(col("payload"), "$.n", "bigint") > 100L
    val pruned = lake.table("vp", Some(filt))
    // result correct AND only the matching stats-bearing file scanned:
    // file 1 (n in [5,9]) is pruned; the seed file (written BEFORE the
    // option, no variant stats) is conservatively kept
    assert(pruned.orderBy("id").select("id").as[Long].collect().toSeq
      == Seq(3L, 4L))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val nFiles = scans.map(_.relation.location.inputFiles.length).sum
    assert(nFiles == 2, // seed file + the n∈[105,150] file; [5,9] pruned
      s"variant-path pruning missing: scanned $nFiles files")
    // unfiltered scan still sees all three files
    assert(lake.table("vp").count() == 5)
  }

  test("geometry type string maps to WKB binary") {
    assert(DuckLakeTypes.fromTypeString("geometry") ==
      org.apache.spark.sql.types.BinaryType)
    assert(DuckLakeTypes.fromTypeString("variant") ==
      org.apache.spark.sql.types.VariantType)
  }
}
