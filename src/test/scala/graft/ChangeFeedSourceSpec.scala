package graft

import java.nio.file.Files

import graft.catalog.Lake
import graft.plans.LakeRegistry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** `spark.readStream.format("graft")` — the streaming CDC source:
  * snapshot-id offsets, deterministic change batches, checkpointed
  * resume across stream restarts, bounded catch-up batches. */
class ChangeFeedSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(table: String, out: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft")
      .option("alias", "cfs").option("table", table)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .select("change_type", "id", "v", "snapshot_id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("full-history replay, then checkpointed resume picks up only deltas") {
    val dir = Files.createTempDirectory("graftcfs").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    LakeRegistry.register("cfs", lake)
    try {
      lake.createTableAs("t",
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      val out = s"$dir/out"; val ckpt = s"$dir/ckpt"

      run("t", out, ckpt)
      val first = spark.read.parquet(out)
      assert(first.filter(col("change_type") === "insert").count() == 3)
      assert(first.count() == 3)

      // DML between runs: one append, one delete → resume emits ONLY them
      lake.append("t", Seq((4L, "d")).toDF("id", "v"))
      lake.delete("t", col("id") === 2L)
      run("t", out, ckpt)
      val second = spark.read.parquet(out)
      assert(second.count() == 5, "resume must append exactly the delta")
      assert(second.filter(col("change_type") === "insert").count() == 4)
      val deleted = second.filter(col("change_type") === "delete")
        .select("id").as[Long].collect().toSeq
      assert(deleted == Seq(2L))

      // a third run with no changes appends nothing
      run("t", out, ckpt)
      assert(spark.read.parquet(out).count() == 5)
    } finally LakeRegistry.unregister("cfs")
  }

  test("maxSnapshotsPerTrigger bounds each micro-batch") {
    val dir = Files.createTempDirectory("graftcfs2").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    LakeRegistry.register("cfs", lake)
    try {
      lake.createTableAs("t", Seq((1L, "a")).toDF("id", "v"))
      (2L to 5L).foreach(i =>
        lake.append("t", Seq((i, s"v$i")).toDF("id", "v")))
      val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
      run("t", out, ckpt, Map("maxSnapshotsPerTrigger" -> "1"))
      val rows = spark.read.parquet(out)
      assert(rows.count() == 5)
      // one snapshot per batch → every change batch carries one snapshot;
      // 5 insert snapshots → at least 5 distinct snapshot ids in output
      assert(rows.select("snapshot_id").distinct().count() == 5)
    } finally LakeRegistry.unregister("cfs")
  }
}
