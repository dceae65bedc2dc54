package graft

import java.nio.file.Files

import graft.catalog.Lake
import graft.operators.IncrementalView
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized-view maintenance: the refreshed view must
  * equal a from-scratch recompute after every mix of DML, including
  * multi-column groups (internal merge key) and groups whose membership
  * drops to zero. */
class IncrementalViewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("graft-ivspec").toString
    Lake.attach(spark, s"$dir/cat", s"$dir/data")
  }

  private def sorted(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.orderBy(cols.map(col): _*).collect().map(_.toString).toSeq

  private def recompute(lake: Lake, base: String, groups: Seq[String],
      sums: Seq[(String, org.apache.spark.sql.Column)]): DataFrame =
    lake.table(base).groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sums.map { case (n, e) => sum(e).cast("long").as(n) }: _*)

  test("single-group view tracks append, update, delete exactly") {
    val lake = freshLake()
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L),
      (4L, "c", 7L)).toDF("id", "g", "v")
    lake.createTableAs("t", base)
    val sums = Seq("v_sum" -> col("v"))
    val v0 = IncrementalView.materialize(lake, "t", "mv", Seq("g"), sums)

    lake.append("t", Seq((5L, "a", 100L), (6L, "d", 1L)).toDF("id", "g", "v"))
    lake.update("t", Map("v" -> (col("v") + 1000L)), col("id") === 3L)
    lake.delete("t", col("id") === 2L)
    IncrementalView.refresh(lake, "t", "mv", Seq("g"), sums, v0)

    val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
    val want = sorted(recompute(lake, "t", Seq("g"), sums), Seq("g"))
    assert(got == want)
    assert(got == Seq("[a,2,110]", "[b,1,1005]", "[c,1,7]", "[d,1,1]"))
  }

  test("multi-column groups use the internal key; zero groups vanish") {
    val lake = freshLake()
    val base = Seq((1L, "a", "x", 10L), (2L, "a", "y", 20L),
      (3L, "b", "x", 5L)).toDF("id", "g1", "g2", "v")
    lake.createTableAs("t", base)
    val groups = Seq("g1", "g2")
    val sums = Seq("v_sum" -> col("v"))
    val v0 = IncrementalView.materialize(lake, "t", "mv", groups, sums)

    // (b,x) loses its only row → must disappear from the view;
    // (a,x) gains one; (c,z) is brand new
    lake.delete("t", col("id") === 3L)
    lake.append("t",
      Seq((4L, "a", "x", 30L), (5L, "c", "z", 2L)).toDF("id", "g1", "g2", "v"))
    IncrementalView.refresh(lake, "t", "mv", groups, sums, v0)

    val got = sorted(IncrementalView.read(lake, "mv", groups), groups)
    val want = sorted(recompute(lake, "t", groups, sums), groups)
    assert(got == want)
    assert(got == Seq("[a,x,2,40]", "[a,y,1,20]", "[c,z,1,2]"))
    // the vanished group left no zombie row behind
    assert(lake.table("mv").filter(col("g1") === "b").count() == 0)
  }

  test("repeated refreshes from successive versions stay consistent") {
    val lake = freshLake()
    lake.createTableAs("t",
      (1L to 50L).map(i => (i, (i % 5).toString, i)).toDF("id", "g", "v"))
    val sums = Seq("v_sum" -> col("v"))
    var v = IncrementalView.materialize(lake, "t", "mv", Seq("g"), sums)
    (1 to 3).foreach { round =>
      lake.delete("t", col("id") % 7 === round.toLong)
      lake.append("t", Seq((1000L + round, "9", round.toLong))
        .toDF("id", "g", "v"))
      v = IncrementalView.refresh(lake, "t", "mv", Seq("g"), sums, v)
      val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
      val want = sorted(recompute(lake, "t", Seq("g"), sums), Seq("g"))
      assert(got == want, s"diverged at round $round")
    }
  }

  test("followFeed catches up over many snapshots in bounded batches") {
    val lake = freshLake()
    lake.createTableAs("t",
      (1L to 30L).map(i => (i, (i % 3).toString, i)).toDF("id", "g", "v"))
    val sums = Seq("v_sum" -> col("v"))
    val v0 = IncrementalView.materialize(lake, "t", "mv", Seq("g"), sums)
    // five un-refreshed DML snapshots pile up
    (1 to 3).foreach { r =>
      lake.append("t", Seq((100L + r, "7", r.toLong)).toDF("id", "g", "v"))
    }
    lake.delete("t", col("id") % 5 === 0)
    lake.update("t", Map("v" -> (col("v") * 10L)), col("g") === "1")
    // bounded catch-up: one snapshot per batch
    val vEnd = IncrementalView.followFeed(lake, "t", "mv", Seq("g"), sums,
      v0, maxSnapshotsPerBatch = Some(1L))
    assert(vEnd >= v0 + 5)
    val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
    val want = sorted(recompute(lake, "t", Seq("g"), sums), Seq("g"))
    assert(got == want)
  }

  test("managed view via SQL CALL: create_mv + refresh_mv from name alone") {
    val lake = freshLake()
    lake.createTableAs("t",
      Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "g", "v"))
    lake.sql("CALL create_mv('mv', 't', 'g', 'v_sum:v')")
    lake.append("t", Seq((3L, "a", 7L), (4L, "c", 1L)).toDF("id", "g", "v"))
    lake.delete("t", col("id") === 2L)
    lake.sql("CALL refresh_mv('mv')")
    val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
    assert(got == Seq("[a,2,17]", "[c,1,1]"))
    // second refresh with no base changes is a no-op (checkpoint moved)
    val before = lake.currentSnapshotId()
    lake.sql("CALL refresh_mv('mv')")
    assert(lake.currentSnapshotId() == before)
  }

  private def recomputeFull(lake: Lake, base: String, groups: Seq[String],
      sums: Seq[(String, org.apache.spark.sql.Column)],
      ext: IncrementalView.Extrema): DataFrame =
    lake.table(base).groupBy(groups.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (sums.map { case (n, e) => sum(e).cast("long").as(n) } ++
          ext.mins.map { case (n, e) => min(e).as(n) } ++
          ext.maxs.map { case (n, e) => max(e).as(n) }): _*)

  test("MIN/MAX extrema: insert-only folds, delete-touched recomputes") {
    val lake = freshLake()
    lake.createTableAs("t", Seq(
      (1L, "a", 10L), (2L, "a", 50L), (3L, "a", 30L),
      (4L, "b", 5L), (5L, "b", 9L), (6L, "c", 7L)).toDF("id", "g", "v"))
    val sums = Seq("v_sum" -> col("v"))
    val ext = IncrementalView.Extrema(
      mins = Seq("v_min" -> col("v")), maxs = Seq("v_max" -> col("v")))
    val v0 = IncrementalView.materialize(lake, "t", "mv", Seq("g"),
      sums, ext)

    // 'a': delete its MAX row (50) → partial recompute must find 30;
    // 'b': insert-only (least/greatest fold, no recompute);
    // 'c': fully deleted → vanishes; 'd': brand new
    lake.delete("t", col("id") === 2L)
    lake.append("t", Seq((7L, "b", 1L), (8L, "d", 99L)).toDF("id", "g", "v"))
    lake.delete("t", col("id") === 6L)
    IncrementalView.refresh(lake, "t", "mv", Seq("g"), sums, v0,
      extrema = ext)

    val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
    val want = sorted(recomputeFull(lake, "t", Seq("g"), sums, ext),
      Seq("g"))
    assert(got == want)
    assert(got == Seq("[a,2,40,10,30]", "[b,3,15,1,9]", "[d,1,99,99,99]"))
  }

  test("extrema: delete-then-reinsert inside one delta recomputes right") {
    val lake = freshLake()
    lake.createTableAs("t",
      Seq((1L, "a", 100L), (2L, "a", 20L)).toDF("id", "g", "v"))
    val sums = Seq("v_sum" -> col("v"))
    val ext = IncrementalView.Extrema(maxs = Seq("v_max" -> col("v")))
    val v0 = IncrementalView.materialize(lake, "t", "mv", Seq("g"),
      sums, ext)
    // retract the max AND add a smaller one in the same refresh window
    lake.delete("t", col("id") === 1L)
    lake.append("t", Seq((3L, "a", 60L)).toDF("id", "g", "v"))
    IncrementalView.refresh(lake, "t", "mv", Seq("g"), sums, v0,
      extrema = ext)
    val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
    assert(got == Seq("[a,2,80,60]"))
  }

  test("managed view with extrema entries via SQL CALL") {
    val lake = freshLake()
    lake.createTableAs("t",
      Seq((1L, "a", 10L), (2L, "a", 3L), (3L, "b", 8L)).toDF("id", "g", "v"))
    lake.sql("CALL create_mv('mv', 't', 'g', 'v_sum:v;lo:min:v;hi:max:v')")
    lake.delete("t", col("id") === 2L) // retracts a's MIN
    lake.append("t", Seq((4L, "b", 20L)).toDF("id", "g", "v"))
    lake.sql("CALL refresh_mv('mv')")
    val got = sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
    assert(got == Seq("[a,1,10,10,10]", "[b,2,28,8,20]"))
  }

  test("mv_auto_refresh: views follow base DML with no explicit refresh") {
    val lake = freshLake()
    lake.createTableAs("t",
      Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "g", "v"))
    lake.sql("CALL create_mv('mv', 't', 'g', 'v_sum:v')")
    lake.setOption("mv_auto_refresh", "true", table = Some("t"))

    lake.append("t", Seq((3L, "a", 7L)).toDF("id", "g", "v"))
    assert(sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
      == Seq("[a,2,17]", "[b,1,5]"))

    lake.delete("t", col("id") === 2L)
    assert(sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
      == Seq("[a,2,17]"))

    lake.update("t", Map("v" -> (col("v") + 100L)), col("id") === 1L)
    assert(sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
      == Seq("[a,2,117]"))

    import spark.implicits._
    lake.merge("t", Seq((4L, "c", 1L)).toDF("id", "g", "v"), "id")
    assert(sorted(IncrementalView.read(lake, "mv", Seq("g")), Seq("g"))
      == Seq("[a,2,117]", "[c,1,1]"))
  }

  test("no-op refresh (no changes) leaves the view untouched") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1L, "a", 10L)).toDF("id", "g", "v"))
    val sums = Seq("v_sum" -> col("v"))
    val v0 = IncrementalView.materialize(lake, "t", "mv", Seq("g"), sums)
    val before = lake.currentSnapshotId()
    IncrementalView.refresh(lake, "t", "mv", Seq("g"), sums, v0)
    assert(lake.currentSnapshotId() == before) // early-out, no commits
  }
}
