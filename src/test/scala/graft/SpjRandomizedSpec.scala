package graft

import java.nio.file.Files

import scala.util.Random

import graft.catalog._
import graft.plans.LakeRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized storage-partitioned-join LIFECYCLE soundness check — the
  * model-check companion to the round-12 written_sorted fix: a
  * deterministic random sequence of append (sorted and
  * sort_on_insert=false) / delete / update / rewrite_data_files /
  * merge_adjacent_files ops runs against a bucket(4)+sorted table.
  * After EVERY op:
  *
  *  - if the spj fast path ACCEPTS the layout, a co-bucketed join
  *    through it must return exactly the generic scan's rows;
  *  - if the executed join plan elided every sort, the scan must have
  *    REPORTED an ordering, and that report must be PHYSICALLY TRUE:
  *    every file of every bucket group is read back and checked
  *    monotonically ascending on the key — a false `written_sorted`
  *    anywhere would surface here as an out-of-order file behind a
  *    zero-sort merge join (the silent-corruption mode the flag kills);
  *  - if the fast path REFUSES (pending deletes, multi-epoch, …), the
  *    generic path must still serve the same values (fallback contract).
  */
@org.scalatest.tags.Slow
class SpjRandomizedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case _ => Nil
    })

  private def finalPlan(df: DataFrame)
      : org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  private def runSeed(seed: Long, ops: Int,
      inlining: Boolean = false,
      partiallyClustered: Boolean = false): Unit = {
    val dir = Files.createTempDirectory(s"graftspjrand$seed").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    val alias = s"spjr$seed"
    val cat = s"spjrc$seed"
    LakeRegistry.register(alias, lake)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.alias", alias)
    spark.conf.set(s"spark.sql.catalog.$cat.spj", "true")
    val prevBucketing =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBroadcast =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // partially-clustered mode: per-FILE splits survive to the join (hot
    // buckets split, the other side's groups replicate) — the same
    // lifecycle must stay exact under it, deletes pending and all
    val prevPush = spark.conf.getOption(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
    val prevPc = spark.conf.getOption(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
    if (partiallyClustered) {
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
        "true")
    }
    try {
      def mk(n: String, k: String): Unit = {
        lake.createTable(n, StructType(Seq(
          StructField(k, LongType), StructField(s"v_$n", LongType))))
        lake.setPartitionedBy(n, Seq((k, "bucket(4)")))
        lake.setSortedByFull(n, Seq((k, "asc", "nulls_first")))
      }
      mk("f", "k"); mk("d", "k2")
      // inlining mode: small appends land as catalog rows — a THIRD
      // refusal class (inlined rows pending) the delete-driven seeds
      // never hit; flush ops restore eligibility
      if (inlining) lake.setOption("data_inlining_row_limit", "24",
        Some("f"))
      lake.append("d", (0L until 40L).map(i => (i, i * 7)).toDF("k2", "v_d")
        .repartition(4, graft.functions.Murmur3Functions.bucket(4, col("k2"))))

      val rng = new Random(seed)
      var stamp = 0L
      def batch(n: Int): DataFrame = {
        val rows = (0 until n).map { _ =>
          stamp += 1
          (rng.nextInt(40).toLong, stamp)
        }
        rows.toDF("k", "v_f")
          .repartition(4, graft.functions.Murmur3Functions.bucket(4, col("k")))
      }

      var accepted = 0
      var refused = 0
      var zeroSortChecks = 0

      def checkInvariants(opLabel: String): Unit = {
        val expected = lake.table("f")
          .join(lake.table("d"), col("k") === col("k2"))
          .select(col("k"), col("v_f"), col("v_d"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sorted.toSeq
        val info =
          try Some(lake.spjScanInfo("f", None))
          catch { case _: IllegalStateException => None }
        info match {
          case None =>
            refused += 1 // fallback contract: generic path already served
          case Some(i) =>
            accepted += 1
            val j = spark.table(s"$cat.f").join(spark.table(s"$cat.d"),
              col("k") === col("k2"))
              .select(col("k"), col("v_f"), col("v_d"))
            val got = j.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
              .sorted.toSeq
            assert(got == expected,
              s"seed=$seed after $opLabel: spj join diverged " +
                s"(${got.size} vs ${expected.size} rows)")
            val plan = finalPlan(j)
            assert(allNodes(plan)
              .collect { case s: ShuffleExchangeExec => s }.isEmpty,
              s"seed=$seed after $opLabel: co-bucketed join shuffled:\n$plan")
            val noSorts =
              allNodes(plan).collect { case s: SortExec => s }.isEmpty
            if (noSorts) {
              // zero sorts ⇒ the scan reported an ordering ⇒ every file
              // behind the report must be PHYSICALLY ascending on k
              assert(i.ordering.nonEmpty,
                s"seed=$seed after $opLabel: sort elided with no " +
                  "reported ordering")
              zeroSortChecks += 1
              i.groups.foreach { case (b, files) =>
                files.foreach { case (uri, _) =>
                  val ks =
                    try spark.read.parquet(uri)
                      .select("k").collect().map(_.getLong(0))
                    catch {
                      case e: Throwable => throw new IllegalStateException(
                        s"seed=$seed after $opLabel: cannot read bucket " +
                          s"$b file $uri: ${e.getMessage.take(120)}", e)
                    }
                  assert(ks.sameElements(ks.sorted),
                    s"seed=$seed after $opLabel: bucket $b file $uri " +
                      "NOT physically sorted under a zero-sort plan — " +
                      "written_sorted lied")
                }
              }
            }
        }
      }

      (1 to ops).foreach { i =>
        val opLabel = try rng.nextInt(10) match {
          case 0 | 1 | 2 | 3 =>
            lake.append("f", batch(1 + rng.nextInt(60))); s"op$i:append"
          case 4 =>
            // unsorted append: the file postdates the sort spec but is
            // NOT in spec order — the exact layout the old proof passed
            lake.setOption("sort_on_insert", "false", Some("f"))
            try lake.append("f", batch(40 + rng.nextInt(40)))
            finally lake.setOption("sort_on_insert", "true", Some("f"))
            s"op$i:append-unsorted"
          case 5 =>
            val key = rng.nextInt(40).toLong
            lake.delete("f", col("k") === key); s"op$i:delete k=$key"
          case 6 =>
            val key = rng.nextInt(40).toLong
            lake.update("f", Map("v_f" -> lit(-1L)), col("k") === key)
            s"op$i:update k=$key"
          case 7 =>
            lake.rewriteDataFiles("f", deleteThreshold = 0.0)
            s"op$i:rewrite"
          case 8 if inlining =>
            lake.flushInlinedData("f"); s"op$i:flush"
          case _ =>
            lake.mergeAdjacentFiles("f"); s"op$i:compact"
        } catch {
          case e: Throwable => throw new IllegalStateException(
            s"seed=$seed op $i FAILED: ${e.getMessage.take(150)}", e)
        }
        checkInvariants(opLabel)
      }
      assert(accepted > 0, s"seed=$seed: spj never accepted a layout")
      assert(refused > 0, s"seed=$seed: spj never refused a layout")
      // partially-clustered plans keep per-file splits apart, so Spark
      // may legitimately keep SortExecs; only the grouped mode promises
      // the zero-sort path fires somewhere in the run
      if (!partiallyClustered) assert(zeroSortChecks > 0,
        s"seed=$seed: the zero-sort path was never exercised")
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        prevBucketing.getOrElse("false"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevBroadcast.getOrElse("10485760"))
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
        prevPush.getOrElse("false"))
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
        prevPc.getOrElse("false"))
      LakeRegistry.unregister(alias)
      lake.detach()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("random append/delete/update/rewrite/compact lifecycle: spj values" +
    " always match the generic scan and zero-sort plans only run over" +
    " physically-sorted files (seed 11)") {
    runSeed(11L, 28)
  }

  test("same lifecycle, second seed (42)") {
    runSeed(42L, 28)
  }

  test("lifecycle with data inlining: pending catalog rows refuse the " +
    "fast path until flushed, values exact throughout (seed 7)") {
    runSeed(7L, 28, inlining = true)
  }

  test("same lifecycle under partially-clustered SPJ (per-file splits, " +
    "pushPartValues): values exact through every append/delete/update/" +
    "rewrite/compact, deletes-pending refusals included (seed 23)") {
    runSeed(23L, 28, partiallyClustered = true)
  }
}
