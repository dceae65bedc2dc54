package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** spark.read/write.format("graft") surface: reads with filter/column
  * pruning, time travel options, and SaveMode semantics. */
class GraftSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("format round-trip with SaveModes and time travel") {
    val dir = Files.createTempDirectory("graftsrc").toString
    val (cat, data) = (s"$dir/cat", s"$dir/data")

    // create via writer
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.format("graft")
      .option("catalog", cat).option("data", data).option("table", "t")
      .save()
    def read = spark.read.format("graft")
      .option("catalog", cat).option("data", data).option("table", "t")
    assert(read.load().count() == 2)

    // append mode
    Seq((3L, "c")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Append)
      .option("catalog", cat).option("data", data).option("table", "t")
      .save()
    assert(read.load().count() == 3)
    val lake = Lake.attach(spark, cat, data)
    val v3 = lake.currentSnapshotId()

    // filters + projection run through the relation
    val got = read.load().filter(col("id") >= 2L).select("v")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("b", "c"))

    // overwrite = versioned truncate + append
    Seq((9L, "z")).toDF("id", "v").write.format("graft")
      .mode(SaveMode.Overwrite)
      .option("catalog", cat).option("data", data).option("table", "t")
      .save()
    assert(read.load().count() == 1)
    // …old version still reachable through the version option
    assert(read.option("version", v3.toString).load().count() == 3)

    // ErrorIfExists refuses
    intercept[Exception] {
      Seq((1L, "x")).toDF("id", "v").write.format("graft")
        .mode(SaveMode.ErrorIfExists)
        .option("catalog", cat).option("data", data).option("table", "t")
        .save()
    }
  }

  test("alias option reuses a registered lake") {
    val dir = Files.createTempDirectory("graftsrc2").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTableAs("x", Seq((1L, 2.0)).toDF("id", "s"))
    graft.plans.LakeRegistry.register("mylake", lake)
    try {
      val n = spark.read.format("graft").option("alias", "mylake")
        .option("table", "x").load().count()
      assert(n == 1)
    } finally graft.plans.LakeRegistry.unregister("mylake")
  }
}
