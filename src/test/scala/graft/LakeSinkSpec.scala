package graft

import java.nio.file.Files

import graft.catalog._
import graft.streaming.LakeSink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming ingestion into the lake: file stream → lake
  * table via foreachBatch, exactly-once through batch-id tracking. */
class LakeSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream files into a lake table with AvailableNow") {
    val dir = Files.createTempDirectory("graftsink").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("in", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    // two source files → micro-batches
    val srcDir = s"$dir/incoming"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$srcDir/f1")
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$srcDir/f2")
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$srcDir/*")
    LakeSink.ingestAvailable(lake, "in", stream, "q_sink", s"$dir/ckpt")
    assert(lake.table("in").count() == 3)
    // each committed batch is one snapshot; rowids assigned
    assert(lake.tableWithRowId("in").select("rowid").distinct().count() == 3)
  }

  test("replayed batch ids are skipped (exactly-once)") {
    val dir = Files.createTempDirectory("graftsink2").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("t", StructType(Seq(StructField("id", LongType))))
    val b = Seq(1L, 2L).toDF("id")
    assert(LakeSink.appendBatch(lake, "t", "q1", 0L, b))
    assert(!LakeSink.appendBatch(lake, "t", "q1", 0L, b)) // replay → no-op
    assert(LakeSink.appendBatch(lake, "t", "q1", 1L, b))
    assert(lake.table("t").count() == 4)
    // a different query name tracks its own offsets
    assert(LakeSink.appendBatch(lake, "t", "q2", 0L, b))
    assert(lake.table("t").count() == 6)
  }

  test("batch marker commits atomically with the append (guard in commit)") {
    val dir = Files.createTempDirectory("graftsink3").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("t", StructType(Seq(StructField("id", LongType))))
    val b = Seq(1L, 2L).toDF("id")
    assert(LakeSink.appendBatch(lake, "t", "q", 0L, b))
    // the marker landed in the SAME snapshot as the data: no extra
    // snapshot beyond createTable + one append
    assert(lake.currentSnapshotId() == 2L)
    // a replay that somehow passed the pre-check (crash race: two drivers
    // replaying the same batch) is still rejected INSIDE the
    // conflict-checked commit — and its staged files are removed
    val key = "stream_last_batch:q:t"
    intercept[DuplicateBatchException] {
      lake.append("t", b, commitOptions = Seq(key -> "0"),
        batchGuard = Some((key, 0L)))
    }
    assert(lake.table("t").count() == 2) // no duplicate rows
    assert(lake.deleteOrphanedFiles("t", dryRun = true).isEmpty) // no litter
  }

  test("writeStream.format(graft) ingests with exactly-once markers") {
    val dir = Files.createTempDirectory("graftsinkfmt").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    graft.plans.LakeRegistry.register("sinkfmt", lake)
    try {
      lake.createTable("out", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      val srcDir = s"$dir/incoming"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$srcDir/f1")
      Seq((3L, "c")).toDF("id", "v").write.parquet(s"$srcDir/f2")
      val stream = spark.readStream
        .schema(StructType(Seq(
          StructField("id", LongType), StructField("v", StringType))))
        .parquet(s"$srcDir/*")
      val q = stream.writeStream
        .format("graft")
        .option("alias", "sinkfmt")
        .option("table", "out")
        .option("queryName", "fmt_sink")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(lake.table("out").count() == 3)
      assert(lake.tableWithRowId("out").select("rowid").distinct()
        .count() == 3)
      // a second drain of the same source is a no-op (checkpoint + ledger)
      val q2 = stream.writeStream
        .format("graft")
        .option("alias", "sinkfmt")
        .option("table", "out")
        .option("queryName", "fmt_sink")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      assert(lake.table("out").count() == 3)
    } finally graft.plans.LakeRegistry.unregister("sinkfmt")
  }

  test("batch ids regressing past a replay fail loudly (no silent skip)") {
    val dir = Files.createTempDirectory("graftsinkreg").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("t", StructType(Seq(StructField("id", LongType))))
    val b = Seq(1L, 2L).toDF("id")
    assert(LakeSink.appendBatch(lake, "t", "qr", 0L, b))
    assert(LakeSink.appendBatch(lake, "t", "qr", 1L, b))
    assert(!LakeSink.appendBatch(lake, "t", "qr", 1L, b)) // replay: skip
    // batch 0 after batch 1 = a NEW query lifetime reusing the ledger key
    // (fresh checkpoint under an old queryName): must refuse, not drop
    val e = intercept[IllegalStateException] {
      LakeSink.appendBatch(lake, "t", "qr", 0L, b)
    }
    assert(e.getMessage.contains("regressed"))
  }

  test("sink without queryName keys the ledger on the checkpointed query id") {
    val dir = Files.createTempDirectory("graftsinkqid").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    graft.plans.LakeRegistry.register("sinkqid", lake)
    try {
      lake.createTable("out", StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))))
      val srcDir = s"$dir/incoming"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$srcDir/f1")
      Seq((3L, "c")).toDF("id", "v").write.parquet(s"$srcDir/f2")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", StringType)))
      def drain(ckpt: String): Unit = {
        val q = spark.readStream.schema(schema).parquet(s"$srcDir/*")
          .writeStream.format("graft")
          .option("alias", "sinkqid").option("table", "out")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain(s"$dir/ckptA")
      assert(lake.table("out").count() == 3)
      // restarting from the SAME checkpoint replays nothing
      drain(s"$dir/ckptA")
      assert(lake.table("out").count() == 3)
      // a FRESH checkpoint is a new query lifetime: its query id keys a
      // new ledger, so its batch 0 must NOT be skipped against the old
      // ledger (the old default 'graft-sink-out' key silently dropped it)
      drain(s"$dir/ckptB")
      assert(lake.table("out").count() == 6)
    } finally graft.plans.LakeRegistry.unregister("sinkqid")
  }

  test("pre-upgrade ledger: only the exact last legacy batch is honored") {
    val dir = Files.createTempDirectory("graftsinkleg").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    graft.plans.LakeRegistry.register("sinkleg", lake)
    try {
      lake.createTable("out", StructType(Seq(StructField("id", LongType))))
      // pretend an old (pre-query-id) pipeline committed batches 0..3
      lake.setOption("stream_last_batch:graft-sink-out:out", "3")
      val sink = new graft.DefaultSource().createSink(
        spark.sqlContext,
        Map("alias" -> "sinkleg", "table" -> "out"),
        Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
      val qid = java.util.UUID.randomUUID().toString
      spark.sparkContext.setLocalProperty(
        org.apache.spark.sql.execution.streaming.runtime
          .StreamExecution.QUERY_ID_KEY, qid)
      try {
        val b = Seq(1L, 2L).toDF("id")
        // the pre-upgrade crash replay re-presents batch 3 → skipped
        sink.addBatch(3L, b)
        assert(lake.table("out").count() == 0)
        // the next batch continues on the NEW query-id ledger
        sink.addBatch(4L, b)
        assert(lake.table("out").count() == 2)
        // once the new ledger has entries the legacy floor never fires
        sink.addBatch(5L, b)
        assert(lake.table("out").count() == 4)
      } finally spark.sparkContext.setLocalProperty(
        org.apache.spark.sql.execution.streaming.runtime
          .StreamExecution.QUERY_ID_KEY, null)
    } finally graft.plans.LakeRegistry.unregister("sinkleg")
  }

  test("crash between file write and ledger commit: replay dedupes, " +
      "orphans are collectable") {
    val dir = Files.createTempDirectory("graftsinkcrash").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("t", StructType(Seq(StructField("id", LongType))))
    val b0 = Seq(1L, 2L).toDF("id").coalesce(1)
    val b1 = Seq(3L, 4L).toDF("id").coalesce(1)
    assert(LakeSink.appendBatch(lake, "t", "qc", 0L, b0))
    val filesAfterB0 = lake.listFiles("t").count()
    // simulated kill: data files staged on disk, catalog commit (which
    // would carry the (query, batchId) ledger marker) never runs
    Lake.preCommitFault = Some(_ => throw new RuntimeException("KILLED"))
    try {
      intercept[RuntimeException] {
        LakeSink.appendBatch(lake, "t", "qc", 1L, b1)
      }
    } finally Lake.preCommitFault = None
    // nothing committed: ledger still at batch 0, table unchanged,
    // but the crashed attempt's parquet is orphaned on disk
    assert(lake.table("t").count() == 2)
    assert(lake.listFiles("t").count() == filesAfterB0)
    val orphans = lake.deleteOrphanedFiles("t", dryRun = true)
    assert(orphans.nonEmpty)
    // Spark restarts the query from the checkpoint and REPLAYS batch 1 —
    // it must apply exactly once
    assert(LakeSink.appendBatch(lake, "t", "qc", 1L, b1))
    assert(lake.table("t").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // a second replay of the committed batch is a no-op
    assert(!LakeSink.appendBatch(lake, "t", "qc", 1L, b1))
    assert(lake.table("t").count() == 4)
    // orphan cleanup removes the crashed attempt's files and ONLY them
    val removed = lake.deleteOrphanedFiles("t")
    assert(removed.toSet == orphans.toSet)
    assert(lake.deleteOrphanedFiles("t", dryRun = true).isEmpty)
    assert(lake.table("t").count() == 4)
    // time travel to the pre-crash snapshot still reads clean
    assert(lake.tableAtVersion("t",
      lake.currentSnapshotId() - 1).count() == 2)
  }
}
