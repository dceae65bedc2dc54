package graft

import java.nio.file.Files

import graft.catalog.Lake
import graft.streaming.ChangeFeed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("micro-batch change feed: offsets advance, batches are exact deltas") {
    val dir = Files.createTempDirectory("graftcf").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.createTable("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))))
    val feed = ChangeFeed(lake, "t", lake.currentSnapshotId())

    assert(feed.nextBatch().isEmpty) // nothing yet

    lake.append("t", (1L to 10L).toDF("id"))
    val Some((v1, b1)) = feed.nextBatch()
    assert(b1.filter(col("change_type") === "insert").count() == 10)
    assert(v1 == lake.currentSnapshotId())
    assert(feed.nextBatch().isEmpty) // already drained

    // two commits → one combined batch with inserts AND deletes
    lake.append("t", (11L to 15L).toDF("id"))
    lake.delete("t", col("id") <= 2L)
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val n = feed.drain { (v, df) =>
      batches += ((df.filter(col("change_type") === "insert").count(),
        df.filter(col("change_type") === "delete").count()))
    }
    assert(n == 1)
    assert(batches.head == ((5L, 2L)))
    // resume-from-checkpoint semantics: a new feed from v1 re-reads them
    val feed2 = ChangeFeed(lake, "t", v1)
    val Some((_, replay)) = feed2.nextBatch()
    assert(replay.filter(col("change_type") === "insert").count() == 5)
    assert(replay.filter(col("change_type") === "delete").count() == 2)

    // rate limiting: catch-up replays in bounded per-snapshot batches
    // (maxFilesPerTrigger analog), covering the same changes in total
    val capped = ChangeFeed(lake, "t", v1, maxSnapshotsPerBatch = Some(1L))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Long]
    val nCapped = capped.drain((_, df) => perBatch += df.count())
    assert(nCapped == 2, s"expected 2 capped batches, saw $nCapped")
    assert(perBatch.sum == replay.count())
    assert(capped.currentVersion == lake.currentSnapshotId())
  }
}
