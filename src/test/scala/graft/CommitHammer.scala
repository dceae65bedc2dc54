package graft

import graft.catalog.MetadataManager

/** Child-process driver for [[MultiProcessSpec]]: a separate JVM that
  * hammers one shared catalog (over its HTTP service URL) with M
  * optimistic commits. Deliberately Spark-free — what is under test is
  * the cross-process commit protocol (snapshot-id PK race → conflict
  * SQLSTATE → retry/backoff), the same protocol the reference exercises
  * in test/sql/concurrent/ with multiple attached processes.
  *
  * Prints `HAMMER-DONE <writerId> <commits>` on success; any failed
  * commit (retries exhausted, lost update) exits non-zero.
  */
object CommitHammer {
  def main(args: Array[String]): Unit = {
    val (Array(url, table, writerId, mStr), mode) = (args.take(4),
      if (args.length > 4) args(4) else "append")
    val m = mStr.toInt
    val meta = new MetadataManager(url)
    val t = meta.tableByName(table, meta.currentSnapshot().snapshotId)
      .getOrElse(sys.error(s"no table $table"))
    mode match {
      case "append" =>
        (0 until m).foreach { i =>
          meta.appendInlined(t.tableId,
            Seq(s"""{"writer":$writerId,"seq":$i}"""))
        }
        println(s"HAMMER-DONE $writerId $m")
      case "delete" =>
        // delete THIS writer's rows, one commit each — disjoint row sets
        // across processes must all land (delete-granularity analogue of
        // the in-JVM disjoint-file test), interleaving freely
        val mine = meta
          .liveInlinedRows(t.tableId, meta.currentSnapshot().snapshotId)
          .filter(_._3.contains(s""""writer":$writerId"""))
        mine.foreach(r => meta.endInlinedRows(t.tableId, Seq(r._1)))
        println(s"HAMMER-DONE $writerId ${mine.size}")
      case dataPath if dataPath.startsWith("spark-append:") =>
        // full write path from a separate PROCESS: its own SparkSession
        // writes real parquet through the lake append (stats pass,
        // row_id_start allocation, optimistic commit) against the shared
        // HTTP catalog — the deployment shape of N independent Spark
        // jobs feeding one lake
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false")
          .appName(s"hammer-$writerId").getOrCreate()
        import spark.implicits._
        val lake = graft.catalog.Lake.attach(spark, url,
          dataPath.stripPrefix("spark-append:"))
        (0 until m).foreach { i =>
          lake.append(table,
            Seq((writerId.toLong, i.toLong)).toDF("writer", "seq"))
        }
        println(s"HAMMER-DONE $writerId $m")
        spark.stop()
      case spec if spec.startsWith("spark-compact:") =>
        // maintenance process racing a writer: merge_adjacent_files /
        // rewrite_data_files loop against a shared catalog while the
        // parent process deletes rows. A compaction that loses the race
        // (a delete landed on its inputs since planning) must surface
        // CommitConflictException — never install a merged file that
        // resurrects the deleted rows (reference CheckForConflicts,
        // ducklake_transaction_state.cpp:142-243). This process treats
        // conflicts as expected outcomes and retries with a fresh plan.
        val dataPath = spec.stripPrefix("spark-compact:")
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false")
          .appName(s"compactor-$writerId").getOrCreate()
        val lake = graft.catalog.Lake.attach(spark, url, dataPath)
        var ok = 0
        var conflicts = 0
        (0 until m).foreach { _ =>
          try {
            lake.mergeAdjacentFiles(table): Unit
            lake.rewriteDataFiles(table, 0.4): Unit
            ok += 1
          } catch {
            case _: graft.catalog.CommitConflictException => conflicts += 1
          }
          Thread.sleep(30)
        }
        println(s"HAMMER-DONE $writerId $ok $conflicts")
        spark.stop()
      case spec if spec.startsWith("pinned-read:") =>
        // cross-process READER pinned at an old snapshot while the owner
        // process checkpoints (flush → expire → compact → cleanup): the
        // physical-delete deferral (delete_older_than retention,
        // reference ducklake_cleanup_files.cpp:66-177 older_than guard)
        // must keep this snapshot's files readable. Protocol: hash once,
        // print it, wait for <dataPath>/../go, re-hash, compare.
        val Array(dataPath, snapStr) = spec.stripPrefix("pinned-read:")
          .split('|')
        val snap = snapStr.toLong
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false")
          .appName(s"pinned-$writerId").getOrCreate()
        val lake = graft.catalog.Lake.attach(spark, url, dataPath,
          readOnly = true, snapshotVersion = Some(snap))
        def contentHash(): String = {
          val rows = lake.table(table).collect()
            .map(_.toString).sorted.mkString("\n")
          java.security.MessageDigest.getInstance("MD5")
            .digest(rows.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        }
        val h0 = contentHash()
        println(s"PIN-HASH0 $h0")
        val go = java.nio.file.Paths.get(dataPath).getParent.resolve("go")
        val deadline = System.currentTimeMillis() + 120000
        while (!java.nio.file.Files.exists(go) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        require(java.nio.file.Files.exists(go), "parent never signalled go")
        val h1 = contentHash()
        println(s"PIN-HASH1 $h1")
        spark.stop()
        if (h0 != h1) sys.error(s"pinned read changed: $h0 -> $h1")
    }
  }
}
