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
    }
  }
}
