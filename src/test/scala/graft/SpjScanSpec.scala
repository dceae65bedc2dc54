package graft

import java.nio.file.Files

import graft.catalog._
import graft.plans.LakeRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.{KeyGroupedPartitioning => PhysKeyGrouped}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins over the DSv2 read path
  * ([[graft.sources.GraftBucketedScan]]): scans of bucket-partitioned
  * lake tables report KeyGroupedPartitioning, so a join of two tables
  * bucketed on their join keys with the same width plans with ZERO
  * shuffle exchange — the cluster translation of the reference's bucket
  * locality (reference src/storage/ducklake_partition_data.cpp:54-140). */
class SpjScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withSpjLake(test: (Lake, String) => Unit): Unit = {
    val dir = Files.createTempDirectory("graftspj").toString
    val lake = Lake.attach(spark, s"$dir/catalog", s"$dir/data")
    val alias = s"spjl${System.nanoTime()}"
    val cat = s"spjc${System.nanoTime()}"
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
    // force SMJ so the zero-exchange claim is about SPJ, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try test(lake, cat)
    finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        prevBucketing.getOrElse("false"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prevBroadcast.getOrElse("10485760"))
      LakeRegistry.unregister(alias)
      lake.detach()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  /** executed (post-AQE-final) physical plan: run the query, then unwrap
    * the adaptive root so collect() sees the real operators */
  private def finalPlan(df: DataFrame)
      : org.apache.spark.sql.execution.SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  /** every node, recursing THROUGH query-stage leaf wrappers (AQE hides
    * stage subtrees from plain collect) */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    (p +: p.children.flatMap(allNodes)) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case _ => Nil
    })

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeExec] =
    allNodes(finalPlan(df)).collect { case s: ShuffleExchangeExec => s }

  private def mkTables(lake: Lake): Unit = {
    lake.createTable("fact", StructType(Seq(
      StructField("k", LongType), StructField("v", StringType))))
    lake.setPartitionedBy("fact", Seq(("k", "bucket(4)")))
    lake.append("fact",
      (0L until 400L).map(i => (i % 50, s"f$i")).toDF("k", "v"))
    lake.createTable("dim", StructType(Seq(
      StructField("k2", LongType), StructField("name", StringType))))
    lake.setPartitionedBy("dim", Seq(("k2", "bucket(4)")))
    lake.append("dim",
      (0L until 30L).map(i => (i, s"d$i")).toDF("k2", "name"))
  }

  test("co-bucketed join: zero exchange, KeyGroupedPartitioning, exact " +
    "rows") {
    withSpjLake { (lake, cat) =>
      mkTables(lake)
      val fact = spark.table(s"$cat.fact")
      val dim = spark.table(s"$cat.dim")
      val joined = fact.join(dim, col("k") === col("k2"))
      // plan shape: both scans grouped by the bucket key, no exchange
      val scans = allNodes(finalPlan(joined)).collect {
        case b: BatchScanExec => b
      }
      assert(scans.length == 2, s"expected 2 v2 scans: $scans")
      scans.foreach(s => assert(
        s.outputPartitioning.isInstanceOf[PhysKeyGrouped],
        s"scan not key-grouped: ${s.outputPartitioning}"))
      assert(shuffles(joined).isEmpty,
        s"expected zero exchanges:\n${finalPlan(joined)}")
      // rows exactly match the generic lake scan join
      val expected = lake.table("fact")
        .join(lake.table("dim"), col("k") === col("k2"))
      def key(df: DataFrame) = df.select("k", "v", "k2", "name").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getString(3))).sortBy(identity).toSeq
      assert(key(joined) == key(expected))
      assert(key(joined).nonEmpty)
    }
  }

  test("bucket-keyed aggregation needs no exchange either") {
    withSpjLake { (lake, cat) =>
      mkTables(lake)
      val agg = spark.table(s"$cat.fact").groupBy("k")
        .agg(count(lit(1)).as("n"))
      assert(shuffles(agg).isEmpty,
        s"expected zero exchanges:\n${agg.queryExecution.executedPlan}")
      val got = agg.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val exp = lake.table("fact").groupBy("k").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == exp.toSeq)
    }
  }

  test("filter pushdown reaches the catalog: equality on the bucket key " +
    "scans only that bucket's files") {
    withSpjLake { (lake, cat) =>
      mkTables(lake)
      val one = spark.table(s"$cat.fact").filter(col("k") === 7L)
      val scan = allNodes(finalPlan(one)).collect {
        case b: BatchScanExec => b
      }.head
      // 4 buckets written per append → equality keeps 1 of 4 groups
      assert(scan.inputRDD.getNumPartitions == 1,
        s"expected 1 bucket group, got ${scan.inputRDD.getNumPartitions}")
      assert(one.count() ==
        lake.table("fact").filter(col("k") === 7L).count())
    }
  }

  test("unclean layouts refuse loudly and the generic path still serves " +
    "them") {
    withSpjLake { (lake, cat) =>
      mkTables(lake)
      lake.delete("fact", col("k") === 3L)
      val e = intercept[Exception] {
        spark.table(s"$cat.fact").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      assert(msgs(e).exists(m => m != null && m.contains("deletes pending")))
      // generic path unaffected
      assert(lake.table("fact").filter(col("k") === 3L).count() == 0)
      // rewrite folds the deletes in → fast path eligible again
      lake.rewriteDataFiles("fact", deleteThreshold = 0.0)
      assert(spark.table(s"$cat.fact").count() ==
        lake.table("fact").count())
    }
  }

  test("sorted single-file buckets report ordering: co-bucketed SMJ " +
    "plans with zero exchanges AND zero sorts") {
    withSpjLake { (lake, cat) =>
      import org.apache.spark.sql.execution.SortExec
      def mk(n: String, k: String): Unit = {
        lake.createTable(n, StructType(Seq(
          StructField(k, LongType), StructField(s"v_$n", StringType))))
        lake.setPartitionedBy(n, Seq((k, "bucket(4)")))
        lake.setSortedByFull(n, Seq((k, "asc", "nulls_first")))
        // one task per bucket → one SORTED file per bucket
        lake.append(n, (0L until 400L).map(i => (i % 50, s"r$i"))
          .toDF(k, s"v_$n")
          .repartition(4, graft.functions.Murmur3Functions
            .bucket(4, col(k))))
      }
      mk("sa", "ka"); mk("sb", "kb")
      val j = spark.table(s"$cat.sa").join(spark.table(s"$cat.sb"),
        col("ka") === col("kb"))
      val plan = finalPlan(j)
      assert(allNodes(plan).collect { case s: ShuffleExchangeExec => s }
        .isEmpty, s"expected zero exchanges:\n$plan")
      assert(allNodes(plan).collect { case s: SortExec => s }.isEmpty,
        s"expected zero sorts:\n$plan")
      // values still exact vs the generic path
      val exp = lake.table("sa").join(lake.table("sb"),
        col("ka") === col("kb")).count()
      assert(j.count() == exp && exp > 0)
      // negative: a second append makes buckets multi-file → ordering no
      // longer provable → sorts come back (exchanges still elided)
      lake.append("sa", Seq((3L, "extra")).toDF("ka", "v_sa"))
      val j2 = spark.table(s"$cat.sa").join(spark.table(s"$cat.sb"),
        col("ka") === col("kb"))
      val plan2 = finalPlan(j2)
      assert(allNodes(plan2).collect { case s: SortExec => s }.nonEmpty,
        s"multi-file buckets must re-sort:\n$plan2")
      assert(allNodes(plan2).collect { case s: ShuffleExchangeExec => s }
        .isEmpty)
      assert(j2.count() == exp + lake.table("sb")
        .filter(col("kb") === 3L).count())
    }
  }

  test("files not physically written in spec order never report a false " +
    "ordering: sort_on_insert=false single-file buckets keep SortExec " +
    "and join values stay exact") {
    withSpjLake { (lake, cat) =>
      import org.apache.spark.sql.execution.SortExec
      def mk(n: String, k: String, sortOnInsert: Boolean): Unit = {
        lake.createTable(n, StructType(Seq(
          StructField(k, LongType), StructField(s"v_$n", StringType))))
        lake.setPartitionedBy(n, Seq((k, "bucket(4)")))
        lake.setSortedByFull(n, Seq((k, "asc", "nulls_first")))
        if (!sortOnInsert)
          lake.setOption("sort_on_insert", "false", Some(n))
        // DESCENDING input, one task per bucket → one file per bucket;
        // with sort_on_insert=false the file is physically DESC while
        // the live spec says ASC — the layout the unsound proof (begin
        // snapshot + single file) used to pass
        lake.append(n, (0L until 400L).reverse.map(i => (i % 50, s"r$i"))
          .toDF(k, s"v_$n")
          .repartition(4, graft.functions.Murmur3Functions
            .bucket(4, col(k))))
      }
      mk("ua", "ka", sortOnInsert = false)
      mk("ub", "kb", sortOnInsert = true)
      val j = spark.table(s"$cat.ua").join(spark.table(s"$cat.ub"),
        col("ka") === col("kb"))
      val plan = finalPlan(j)
      // exchanges still elided (bucketing is real) but the unsorted side
      // must NOT report an ordering — SMJ re-sorts instead of silently
      // merging out-of-order runs
      assert(allNodes(plan).collect { case s: ShuffleExchangeExec => s }
        .isEmpty, s"expected zero exchanges:\n$plan")
      assert(allNodes(plan).collect { case s: SortExec => s }.nonEmpty,
        s"unsorted files must keep SortExec:\n$plan")
      val exp = lake.table("ua").join(lake.table("ub"),
        col("ka") === col("kb")).count()
      assert(j.count() == exp && exp > 0)
    }
  }

  test("update-rewritten files drop the ordering proof until a " +
    "re-sorting compaction restores it") {
    withSpjLake { (lake, cat) =>
      import org.apache.spark.sql.execution.SortExec
      def mk(n: String, k: String): Unit = {
        lake.createTable(n, StructType(Seq(
          StructField(k, LongType), StructField(s"v_$n", StringType))))
        lake.setPartitionedBy(n, Seq((k, "bucket(4)")))
        lake.setSortedByFull(n, Seq((k, "asc", "nulls_first")))
        lake.append(n, (0L until 400L).map(i => (i % 50, s"r$i"))
          .toDF(k, s"v_$n")
          .repartition(4, graft.functions.Murmur3Functions
            .bucket(4, col(k))))
      }
      mk("ma", "ka"); mk("mb", "kb")
      // UPDATE rewrites files WITHOUT the sort spec; rewrite_data_files
      // then folds the pending deletes so the layout is spj-fit again —
      // but its outputs are not in spec order either
      lake.update("ma", Map("v_ma" -> lit("updated")), col("ka") === 3L)
      lake.rewriteDataFiles("ma", deleteThreshold = 0.0)
      val j = spark.table(s"$cat.ma").join(spark.table(s"$cat.mb"),
        col("ka") === col("kb"))
      val plan = finalPlan(j)
      assert(allNodes(plan).collect { case s: SortExec => s }.nonEmpty,
        s"post-update layout must keep SortExec:\n$plan")
      val exp = lake.table("ma").join(lake.table("mb"),
        col("ka") === col("kb")).count()
      assert(j.count() == exp && exp > 0)
      // merge_adjacent_files re-sorts under the live spec → once every
      // bucket is back to one sorted file the proof may return; at
      // minimum the values stay exact through the transition
      lake.mergeAdjacentFiles("ma")
      val j2 = spark.table(s"$cat.ma").join(spark.table(s"$cat.mb"),
        col("ka") === col("kb"))
      assert(j2.count() == exp)
    }
  }

  test("skewed bucket: grouped mode runs one partition per bucket; " +
    "partially-clustered mode keeps the hot side's per-file splits") {
    withSpjLake { (lake, cat) =>
      mkTables(lake)
      // three more appends land three MORE files in every fact bucket —
      // a stand-in for one hot bucket (per-file splits are what the
      // planner needs either way)
      (1 to 3).foreach(_ => lake.append("fact",
        (0L until 400L).map(i => (i % 50, "skew")).toDF("k", "v")))
      val nFactFiles = lake.listFiles("fact").count().toInt
      assert(nFactFiles >= 8)
      def factScan(df: DataFrame) = allNodes(finalPlan(df)).collect {
        case b: BatchScanExec
            if b.output.exists(_.name == "k") => b
      }.head
      // grouped (default) mode: splits merge back to one task per bucket
      val j1 = spark.table(s"$cat.fact").join(spark.table(s"$cat.dim"),
        col("k") === col("k2"))
      assert(shuffles(j1).isEmpty)
      assert(factScan(j1).inputRDD.getNumPartitions == 4,
        "grouped mode must run one partition per bucket")
      val expect = lake.table("fact").join(lake.table("dim"),
        col("k") === col("k2")).count()
      assert(j1.count() == expect && expect > 0)
      // partially-clustered mode: the fact side keeps its per-file
      // splits (> bucket count) and the join still needs no exchange
      val prevPush = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled")
      val prevPc = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
        "true")
      try {
        val j2 = spark.table(s"$cat.fact").join(spark.table(s"$cat.dim"),
          col("k") === col("k2"))
        assert(shuffles(j2).isEmpty,
          s"partially-clustered join must stay exchange-free:\n${finalPlan(j2)}")
        assert(j2.count() == expect)
        val parts = factScan(j2).inputRDD.getNumPartitions
        assert(parts > 4,
          s"hot side must keep per-file splits, got $parts partitions")
      } finally {
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
          prevPush.getOrElse("false"))
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
          prevPc.getOrElse("false"))
      }
    }
  }

  test("v2.bucketing.shuffle: an unbucketed side shuffles TOWARD the " +
    "stored layout via the catalog bucket function, null keys included") {
    withSpjLake { (lake, cat) =>
      // STRING bucket keys: pre-fix, GraftBucketBound NPE'd on a null
      // key routed through the planner-inserted shuffle (numerics were
      // silently unboxed to 0); the fix buckets null → null like the
      // write path's hive null partition
      lake.createTable("sf", StructType(Seq(
        StructField("k", StringType), StructField("v", StringType))))
      lake.setPartitionedBy("sf", Seq(("k", "bucket(4)")))
      lake.append("sf", (0L until 200L).map(i => (s"key${i % 20}", s"f$i"))
        .toDF("k", "v"))
      val prevShuffle = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.shuffle.enabled")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        import spark.implicits._
        val dim = Seq(("key3", 1L), ("key7", 2L), (null, 3L))
          .toDF("k2", "tag")
        // right_outer keeps the null-key dim row in the OUTPUT, so its
        // shuffle routing is exercised end-to-end
        val j = spark.table(s"$cat.sf")
          .join(dim, col("k") === col("k2"), "right_outer")
          .select(col("k2"), col("tag"), col("v"))
        val got = j.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        // 10 fact rows per key × 2 matched keys + the unmatched null row
        assert(got.count(_._1 == "key3") == 10)
        assert(got.count(_._1 == "key7") == 10)
        assert(got.count(r => r._1 == null && r._3 == null) == 1)
        assert(got.length == 21)
        // EXACTLY ONE exchange in the whole plan — the unbucketed dim
        // side shuffling toward the stored layout — and the fact side
        // exchange-free (the one-exchange contract the mixed-layout
        // bench A/B at sf3+ relies on; two exchanges = the planner fell
        // back to hash-partitioning both sides)
        val plan = finalPlan(j)
        val exchanges = allNodes(plan).collect {
          case s: ShuffleExchangeExec => s
        }
        assert(exchanges.length == 1,
          s"expected exactly 1 exchange (dim toward layout), got " +
            s"${exchanges.length}:\n$plan")
        val factShuffled = allNodes(plan).exists {
          case s: ShuffleExchangeExec =>
            allNodes(s).exists {
              case b: BatchScanExec => b.output.exists(_.name == "k")
              case _ => false
            }
          case _ => false
        }
        assert(!factShuffled, s"fact side must not shuffle:\n$plan")
      } finally {
        spark.conf.set(
          "spark.sql.sources.v2.bucketing.shuffle.enabled",
          prevShuffle.getOrElse("false"))
      }
    }
  }

  test("snapshot pinned at construction: DML committed between building " +
    "a DataFrame and executing it is snapshot-isolated away, not a " +
    "scan-build crash") {
    withSpjLake { (lake, cat) =>
      mkTables(lake)
      // analysis (and the snapshot pin) happens at construction
      val df = spark.table(s"$cat.fact")
      val joined = df.join(spark.table(s"$cat.dim"),
        col("k") === col("k2"))
      // a delete commits PENDING delete files — the CURRENT layout is
      // now unfit for the fast path (spjScanInfo refuses it)
      lake.delete("fact", col("k") === 7L)
      intercept[IllegalStateException] { lake.spjScanInfo("fact", None) }
      // …but the already-built DataFrames execute against their pinned
      // snapshot: no throw, and the deleted rows are still visible
      // (MVCC reader semantics — same as the generic path's snapshot
      // read)
      assert(df.count() == 400)
      assert(joined.filter(col("k") === 7L).count() == 8,
        "pinned join must still see the pre-delete rows")
      // a FRESH read resolves the post-delete snapshot: the generic
      // path serves it (Tables.spjTable probes and falls back); the raw
      // spj catalog read refuses at scan build, as before
      assert(lake.table("fact").count() == 392)
      val e = intercept[Exception] {
        spark.table(s"$cat.fact").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      assert(msgs(e).exists(m => m != null && m.contains("deletes pending")))
    }
  }

  test("unpartitioned table refuses the spj read") {
    withSpjLake { (lake, cat) =>
      lake.createTable("plain", StructType(Seq(
        StructField("a", LongType))))
      lake.append("plain", Seq(1L, 2L).toDF("a"))
      val e = intercept[Exception] { spark.table(s"$cat.plain").collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      assert(msgs(e).exists(m => m != null &&
        m.contains("not partitioned")))
    }
  }
}
