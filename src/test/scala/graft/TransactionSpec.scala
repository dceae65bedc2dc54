package graft

import java.nio.file.Files

import graft.catalog._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-statement transactions (reference BEGIN…COMMIT over the lake,
  * ducklake_transaction.cpp FlushChanges): buffered statements commit as
  * one snapshot, read their own writes, and roll back atomically. */
class TransactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** catalog URL for a fresh lake — overridden by the SQLite variant so
    * the whole transaction matrix re-runs on a second live backend */
  protected def catalogUrl(dir: String): String = s"$dir/cat"

  private def freshLake(): Lake = {
    val dir = Files.createTempDirectory("grafttx").toString
    Lake.attach(spark, catalogUrl(dir), s"$dir/data")
  }

  test("multiple statements commit as one snapshot") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v"))
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.append("t", Seq((4L, "d")).toDF("id", "v"))
      lake.delete("t", col("id") === 1L)
      lake.append("t", Seq((5L, "e")).toDF("id", "v"))
    }
    assert(lake.currentSnapshotId() == before + 1) // ONE snapshot
    assert(lake.table("t").orderBy("id").select("id").as[Long]
      .collect().toSeq == Seq(2L, 3L, 4L, 5L))
    // time travel to before the txn sees none of it
    assert(lake.tableAtVersion("t", before).count() == 3)
    // rowids finalized for the txn's rows
    assert(lake.tableWithRowId("t").select("rowid").distinct().count() == 4)
    assert(lake.tableWithRowId("t").agg(min(col("rowid"))).head()
      .getLong(0) >= 0L)
  }

  test("statements read their own writes; outside readers see nothing") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1L, 10.0)).toDF("id", "x"))
    lake.transaction {
      lake.append("t", Seq((2L, 20.0)).toDF("id", "x"))
      // read-your-writes inside the txn
      assert(lake.table("t").count() == 2)
      assert(lake.sql("SELECT SUM(x) AS s FROM t").head().getDouble(0)
        == 30.0)
      lake.delete("t", col("id") === 1L)
      assert(lake.table("t").count() == 1)
      // second delete on the same committed file unions with the first
      lake.append("t", Seq((3L, 30.0)).toDF("id", "x"))
      assert(lake.table("t").orderBy("id").select("id").as[Long]
        .collect().toSeq == Seq(2L, 3L))
    }
    assert(lake.table("t").orderBy("id").select("id").as[Long]
      .collect().toSeq == Seq(2L, 3L))
  }

  test("exception rolls back everything") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1L, "a")).toDF("id", "v"))
    val before = lake.currentSnapshotId()
    intercept[RuntimeException] {
      lake.transaction {
        lake.append("t", Seq((2L, "b")).toDF("id", "v"))
        lake.delete("t", col("id") === 1L)
        throw new RuntimeException("boom")
      }
    }
    assert(lake.currentSnapshotId() == before)
    assert(lake.table("t").count() == 1)
    assert(lake.table("t").head().getLong(0) == 1L)
    // a new transaction works after rollback
    lake.transaction { lake.append("t", Seq((9L, "z")).toDF("id", "v")) }
    assert(lake.table("t").count() == 2)
  }

  test("BEGIN/COMMIT/ROLLBACK through SQL") {
    val lake = freshLake()
    lake.sql("CREATE TABLE t (id BIGINT, v STRING)")
    lake.sql("INSERT INTO t VALUES (1, 'a')")
    val before = lake.currentSnapshotId()
    lake.sql("BEGIN TRANSACTION")
    lake.sql("INSERT INTO t VALUES (2, 'b')")
    lake.sql("DELETE FROM t WHERE id = 1")
    assert(lake.sql("SELECT COUNT(*) AS n FROM t").head().getLong(0) == 1)
    lake.sql("COMMIT")
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("t").head().getLong(0) == 2L)

    lake.sql("BEGIN")
    lake.sql("INSERT INTO t VALUES (3, 'c')")
    lake.sql("ROLLBACK")
    assert(lake.table("t").count() == 1)

    // DDL inside a SQL transaction (reference basic_transaction.test)
    val v2 = lake.currentSnapshotId()
    lake.sql("BEGIN")
    lake.sql("CREATE TABLE t2 (id BIGINT)")
    lake.sql("INSERT INTO t2 VALUES (7)")
    assert(lake.sql("SELECT COUNT(*) AS n FROM t2").head().getLong(0) == 1)
    lake.sql("DROP TABLE t")
    lake.sql("COMMIT")
    assert(lake.currentSnapshotId() == v2 + 1)
    assert(lake.table("t2").head().getLong(0) == 7L)
    intercept[IllegalArgumentException](lake.table("t"))
    lake.sql("BEGIN")
    lake.sql("CREATE TABLE t3 (id BIGINT)")
    lake.sql("ROLLBACK")
    intercept[IllegalArgumentException](lake.table("t3"))
  }

  test("consecutive deletes in one txn union; txn-local rows deletable") {
    val lake = freshLake()
    lake.createTableAs("t", (1L to 100L).toDF("id"))
    lake.transaction {
      lake.delete("t", col("id") <= 10L)
      lake.delete("t", col("id") > 90L)
      assert(lake.table("t").count() == 80)
      // rows appended AND deleted in the same txn never commit: the
      // staged file rewrites without them
      lake.append("t", Seq(500L, 501L, 502L).toDF("id"))
      assert(lake.delete("t", col("id") >= 501L) == 2L)
      assert(lake.table("t").count() == 81)
      // a delete spanning committed + txn-local rows works too
      lake.delete("t", col("id") === 500L || col("id") === 50L)
      assert(lake.table("t").count() == 79)
    }
    assert(lake.table("t").count() == 79)
    assert(lake.table("t", Some(col("id") >= 500L)).count() == 0)
    assert(lake.table("t", Some(col("id") === 50L)).count() == 0)
  }

  test("UPDATE and MERGE inside a transaction") {
    val lake = freshLake()
    lake.createTableAs("t", Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "x"))
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.update("t", Map("x" -> (col("x") * 2)), col("id") <= 2L)
      // read-your-writes of the rewrite
      assert(lake.sql("SELECT SUM(x) AS s FROM t").head().getDouble(0)
        == 90.0)
      lake.merge("t", Seq((3L, 99.0), (4L, 40.0)).toDF("id", "x"), "id",
        whenMatchedUpdate = Some(Map("x" -> col("s.x"))))
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("t").orderBy("id").select("x").as[Double]
      .collect().toSeq == Seq(20.0, 40.0, 99.0, 40.0))
  }

  test("transaction with deletion vectors") {
    val lake = freshLake()
    lake.setOption("write_deletion_vectors", "true")
    lake.createTableAs("t", (1L to 50L).toDF("id").coalesce(1))
    lake.transaction {
      lake.delete("t", col("id") <= 10L)
      lake.delete("t", col("id") > 45L) // unions into one DV per file
      assert(lake.table("t").count() == 35)
    }
    assert(lake.table("t").count() == 35)
    assert(lake.tableWithRowId("t").select("rowid").distinct().count()
      == 35)
  }

  test("concurrent transactions: delete-vs-delete conflicts at commit") {
    val dir = Files.createTempDirectory("grafttxc").toString
    val a = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val b = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    a.createTableAs("t", (1L to 100L).toDF("id").coalesce(1))
    a.begin()
    a.delete("t", col("id") <= 10L)
    b.begin()
    b.delete("t", col("id") >= 90L) // same (single) data file
    a.commit()
    intercept[CommitConflictException](b.commit())
    // loser rolled nothing in; winner's delete visible
    assert(a.table("t").count() == 90)
  }

  test("deleting committed inlined rows inside a transaction") {
    val lake = freshLake()
    lake.createTable("inl", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType))))
    lake.setOption("data_inlining_row_limit", "10")
    lake.append("inl", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    // rows live inlined in the catalog DB
    assert(lake.listFiles("inl").isEmpty)
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.delete("inl", col("id") === 2L)
      // read-your-writes: the txn no longer sees the row...
      assert(lake.table("inl").select("id").as[Long].collect().sorted
        .toSeq == Seq(1L, 3L))
    }
    // ...and after commit neither does anyone else, in ONE snapshot
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("inl").select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))
    // rollback leaves the rows alone
    lake.begin()
    lake.delete("inl", col("id") === 1L)
    assert(lake.table("inl").select("id").as[Long].collect().sorted
      .toSeq == Seq(3L))
    lake.rollback()
    assert(lake.table("inl").select("id").as[Long].collect().sorted
      .toSeq == Seq(1L, 3L))
    // mixed txn: inlined delete + file append commit atomically
    lake.transaction {
      lake.delete("inl", col("id") === 3L)
      lake.append("inl",
        (10L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))
    }
    assert(lake.table("inl").count() == 22)
  }

  test("CREATE TABLE inside a transaction is transaction-local " +
    "(reference basic_transaction.test)") {
    val lake = freshLake()
    lake.begin()
    lake.createTable("test", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType))))
    // queryable (empty) by our own statements, lake.sql included
    assert(lake.table("test").count() == 0)
    assert(lake.sql("SELECT COUNT(*) AS n FROM test").head().getLong(0) == 0)
    lake.append("test", Seq((42, 84)).toDF("i", "j"))
    assert(lake.table("test").collect().map(r =>
      (r.getInt(0), r.getInt(1))).toSeq == Seq((42, 84)))
    lake.rollback()
    // after rollback the table does not exist
    intercept[IllegalArgumentException](lake.table("test"))

    // commit path: CTAS inside a txn lands table + data as ONE snapshot
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.createTableAs("t2", (0L until 100L).toDF("id").coalesce(1))
      lake.append("t2", Seq(100L).toDF("id"))
      assert(lake.table("t2").count() == 101)
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("t2").count() == 101)
    // stats landed: catalog pruning works on the committed files
    assert(lake.fastCount("t2").contains(101L))
    assert(lake.listFiles("t2")
      .agg(sum(col("record_count"))).head().getLong(0) == 101L)
  }

  test("concurrent creates of DIFFERENT tables never conflict " +
    "(reference concurrent_catalog_id_false_conflict)") {
    val dir = Files.createTempDirectory("grafttxcc").toString
    val con1 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val con2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    con1.createTableAs("seed", Seq(1L).toDF("x"))
    con1.begin(); assert(con1.table("seed").count() == 1)
    con2.begin(); assert(con2.table("seed").count() == 1)
    con1.createTableAs("tmp_a", Seq(1L).toDF("x"))
    con2.createTableAs("tmp_b", Seq(2L).toDF("x"))
    con1.commit()
    con1.dropTable("tmp_a")
    con2.commit() // must NOT falsely conflict
    assert(con2.table("tmp_b").head().getLong(0) == 2L)
    intercept[IllegalArgumentException](con1.table("tmp_a"))

    // same-name concurrent create DOES conflict (create_conflict.test)
    con1.begin(); con2.begin()
    con1.createTableAs("dup", Seq(1L).toDF("x"))
    con2.createTableAs("dup", Seq(2L).toDF("x"))
    con1.commit()
    val e = intercept[CommitConflictException](con2.commit())
    assert(e.getMessage.contains("already exists"))
    con2.rollback()
    assert(con1.table("dup").head().getLong(0) == 1L)
  }

  test("DROP TABLE inside a transaction is transaction-local") {
    val lake = freshLake()
    lake.createTableAs("t", Seq(1L, 2L).toDF("id"))
    // rollback restores
    lake.begin()
    lake.dropTable("t")
    intercept[IllegalArgumentException](lake.table("t"))
    lake.rollback()
    assert(lake.table("t").count() == 2)
    // DROP + CREATE of the same name commits as one snapshot
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.dropTable("t")
      lake.createTableAs("t", Seq(10L, 20L, 30L).toDF("id"))
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("t").count() == 3)
    // the old generation is still visible via time travel
    assert(lake.tableAtVersion("t", before).orderBy("id")
      .as[Long].collect().toSeq == Seq(1L, 2L))
    // dropping a txn-created table cancels it
    lake.transaction {
      lake.createTableAs("tmp", Seq(1L).toDF("id"))
      lake.dropTable("tmp")
    }
    intercept[IllegalArgumentException](lake.table("tmp"))
    // CREATE + DELETE + DROP of one table in a txn leaves no files behind
    // (reference cleanup/drop_table_cleans_delete_files.test)
    lake.transaction {
      lake.createTableAs("gone", (1L to 1000L).toDF("id").coalesce(1))
      lake.delete("gone", col("id") % 2 === 0)
      lake.dropTable("gone")
    }
    val goneDir = new java.io.File(s"${lake.dataPath}/gone")
    val leftovers = Option(goneDir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
    assert(leftovers.isEmpty, s"leftover files: ${leftovers.toSeq}")
  }

  test("CREATE SCHEMA inside a transaction; same-name schema conflicts " +
    "(reference transaction_conflicts.test)") {
    val lake = freshLake()
    // rollback discards the schema
    lake.begin()
    lake.createSchema("s1")
    assert(lake.listSchemas().contains("s1"))
    lake.rollback()
    assert(!lake.listSchemas().contains("s1"))
    // schema + table in it commit as one snapshot
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.createSchema("s1")
      lake.createTableAs("s1.t", Seq(7L).toDF("id"))
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("s1.t").head().getLong(0) == 7L)

    // concurrent same-name schema creation conflicts
    val dir = Files.createTempDirectory("grafttxsc").toString
    val con1 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val con2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    con1.begin(); con2.begin()
    con1.createSchema("dup")
    con2.createSchema("dup")
    con1.commit()
    val e = intercept[CommitConflictException](con2.commit())
    assert(e.getMessage.contains("already exists"))
    con2.rollback()
    // different names: no conflict
    con1.begin(); con2.begin()
    con1.createSchema("sa"); con2.createSchema("sb")
    con1.commit(); con2.commit()
    assert(con1.listSchemas().toSet.intersect(Set("sa", "sb")) ==
      Set("sa", "sb"))
  }

  test("ALTER TABLE inside a transaction " +
    "(reference multiple_column_changes.test)") {
    import org.apache.spark.sql.types._
    val lake = freshLake()
    lake.createTable("message", StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("user_id", IntegerType, nullable = false))))
    lake.append("message", Seq((0, 7)).toDF("id", "user_id"))
    // TYPE + SET DEFAULT on one column in one transaction, ONE snapshot
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.changeColumnType("message", "user_id", LongType)
      lake.setColumnDefault("message", "user_id", "123")
      // read-your-DDL: the txn sees the widened type
      assert(lake.schemaOf("message")("user_id").dataType == LongType)
    }
    assert(lake.currentSnapshotId() == before + 1)
    // a defaulted insert after commit reads the new default + type
    lake.sql("INSERT INTO message (id) VALUES (1)")
    val rows = lake.table("message").orderBy("id").collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(7L, 123L))

    // ADD COLUMN DEFAULT inside a txn: own reads see the default on old
    // rows; rollback discards the column
    lake.begin()
    lake.addColumn("message", StructField("tag", StringType),
      Some("none"))
    assert(lake.table("message").select("tag").collect()
      .map(_.getString(0)).toSeq == Seq("none", "none"))
    lake.rollback()
    assert(!lake.table("message").columns.contains("tag"))
    // committed path: ADD + rename + append in one txn, then verify
    lake.transaction {
      lake.addColumn("message", StructField("tag", StringType),
        Some("none"))
      lake.renameColumn("message", "id", "msg_id")
      lake.append("message",
        Seq((2, 5L, "real")).toDF("msg_id", "user_id", "tag"))
    }
    val out = lake.table("message").orderBy("msg_id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("none", "none", "real"))
    assert(lake.table("message").columns.toSeq ==
      Seq("msg_id", "user_id", "tag"))
    // pruning stats of the txn-appended file remapped to real column ids
    assert(lake.table("message",
      Some(col("msg_id") === 2)).count() == 1)
    // guard: ALTER after staged writes for the table is rejected
    lake.begin()
    lake.append("message", Seq((3, 5L, "x")).toDF("msg_id", "user_id", "tag"))
    intercept[IllegalArgumentException](
      lake.dropColumn("message", "tag"))
    lake.rollback()
  }

  test("concurrent drop-vs-drop conflicts at commit " +
    "(reference transaction_conflicts.test)") {
    val dir = Files.createTempDirectory("grafttxdd").toString
    val con1 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    val con2 = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    con1.createTableAs("t", Seq(1L).toDF("id"))
    con1.begin(); con2.begin()
    con1.dropTable("t")
    con2.dropTable("t")
    con1.commit()
    val e = intercept[CommitConflictException](con2.commit())
    assert(e.getMessage.contains("dropped concurrently"))
    con2.rollback()
    intercept[IllegalArgumentException](con1.table("t"))
  }

  test("view DDL buffers in a transaction: read-own-writes, rollback, rename (reference transaction_conflicts_view)") {
    val lake = freshLake()
    lake.createTableAs("base", (1L to 10L).toDF("id"))
    // create inside txn: visible to own reads, absent for a second handle
    lake.begin()
    lake.createView("v", "SELECT id FROM base WHERE id > 5")
    assert(lake.view("v").count() == 5)
    assert(lake.sql("SELECT COUNT(*) AS n FROM v").head().getLong(0) == 5)
    val before = lake.currentSnapshotId()
    lake.commit()
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.view("v").count() == 5)
    // rename inside a txn: own statements see the new name, old gone
    lake.begin()
    lake.renameView("v", "v2")
    assert(lake.view("v2").count() == 5)
    intercept[IllegalArgumentException](lake.view("v"))
    lake.rollback()
    assert(lake.view("v").count() == 5) // rollback restored
    // drop inside txn + rollback
    lake.begin()
    lake.dropView("v")
    intercept[IllegalArgumentException](lake.view("v"))
    lake.rollback()
    assert(lake.view("v").count() == 5)
    // concurrent same-name create: second committer conflicts
    val lake2 = Lake.attach(spark, lake.meta.jdbcUrl, lake.dataPath)
    lake.begin()
    lake.createView("cv", "SELECT 1 AS x")
    lake2.createView("cv", "SELECT 2 AS x") // wins immediately
    intercept[Exception](lake.commit())
    lake.rollback()
    assert(lake2.view("cv").head().getInt(0) == 2)
  }

  test("create-then-rename view inside one transaction reads its own writes") {
    val lake = freshLake()
    lake.createTableAs("b2", (1L to 4L).toDF("id"))
    lake.begin()
    lake.createView("va", "SELECT id FROM b2 WHERE id > 2")
    lake.renameView("va", "vb")
    assert(lake.view("vb").count() == 2)
    intercept[IllegalArgumentException](lake.view("va"))
    lake.commit()
    assert(lake.view("vb").count() == 2)
  }

  test("table and view of one name in a single commit conflict; " +
      "drop-table-then-create-view of one name commits") {
    val lake = freshLake()
    // create table t + create view t buffered into ONE commit: the view
    // guard must see the same-commit table (begin_snapshot = commit
    // snapshot) and refuse — two live objects must never share a name
    lake.begin()
    lake.createTableAs("t", (1L to 3L).toDF("id"))
    lake.createView("t", "SELECT 1 AS x")
    val e = intercept[IllegalArgumentException](lake.commit())
    assert(e.getMessage.contains("a table with this name exists"))
    lake.rollback()
    assert(lake.meta.tableByName("t", lake.currentSnapshotId()).isEmpty)
    // the reverse shape is legal: DROP TABLE u + CREATE VIEW u in one
    // txn ends with only the view live (the dropped table's
    // end_snapshot = commit snapshot must NOT block the view)
    lake.createTableAs("u", (1L to 3L).toDF("id"))
    lake.transaction {
      lake.dropTable("u")
      lake.createView("u", "SELECT 42 AS x")
    }
    assert(lake.view("u").head().getInt(0) == 42)
    assert(lake.meta.tableByName("u", lake.currentSnapshotId()).isEmpty)
    // rename-view onto a same-commit table name conflicts the same way
    lake.createTableAs("w", (1L to 2L).toDF("id"))
    lake.createView("v0", "SELECT 7 AS x")
    lake.begin()
    lake.createTableAs("zz", (1L to 2L).toDF("id"))
    lake.renameView("v0", "zz")
    val e2 = intercept[IllegalArgumentException](lake.commit())
    assert(e2.getMessage.contains("a table named zz exists"))
    lake.rollback()
  }

  test("RENAME TABLE inside a transaction " +
      "(reference rename_table_within_transaction.test)") {
    val lake = freshLake()
    lake.createTableAs("tbl", Seq(999, 100).toDF("i"))
    val before = lake.currentSnapshotId()
    lake.begin()
    lake.renameTable("tbl", "tbl2")
    // read-your-writes: old name gone, new name reads the data
    intercept[IllegalArgumentException](lake.table("tbl"))
    assert(lake.table("tbl2").orderBy("i").select("i").as[Int]
      .collect().toSeq == Seq(100, 999))
    // buffered statements still work against the new name
    lake.append("tbl2", Seq(7).toDF("i"))
    assert(lake.table("tbl2").count() == 3)
    // SHOW TABLES reflects the rename inside the txn (rename_entity.test)
    assert(lake.sql("SHOW TABLES").as[String].collect().toSeq == Seq("tbl2"))
    // outside readers still see the old binding until commit
    val outside = Lake.attach(spark, lake.meta.jdbcUrl, lake.dataPath)
    assert(outside.table("tbl").count() == 2)
    lake.commit()
    assert(lake.currentSnapshotId() == before + 1) // ONE snapshot
    intercept[IllegalArgumentException](lake.table("tbl"))
    assert(lake.table("tbl2").count() == 3)
    // identity survives: time travel before the rename uses the old name
    assert(lake.tableAtVersion("tbl", before).count() == 2)
    // rollback path: a buffered rename vanishes
    lake.begin()
    lake.renameTable("tbl2", "tbl3")
    assert(lake.table("tbl3").count() == 3)
    lake.rollback()
    assert(lake.table("tbl2").count() == 3)
    intercept[IllegalArgumentException](lake.table("tbl3"))
  }

  test("dbt swap workload: create tmp, double rename in one txn " +
      "(reference rename_table_dbt_workload.test)") {
    val lake = freshLake()
    lake.createTableAs("my_table", (0L until 42L).toDF("i"))
    lake.transaction {
      lake.createTableAs("my_table_tmp", (0L until 84L).toDF("i"))
      lake.renameTable("my_table", "my_table_backup")
      lake.renameTable("my_table_tmp", "my_table") // txn-created rebind
      assert(lake.table("my_table").count() == 84)
      assert(lake.table("my_table_backup").count() == 42)
      intercept[IllegalArgumentException](lake.table("my_table_tmp"))
      assert(lake.sql("SHOW TABLES").as[String].collect().toSeq ==
        Seq("my_table", "my_table_backup"))
    }
    assert(lake.table("my_table").count() == 84)
    assert(lake.table("my_table_backup").count() == 42)
    intercept[IllegalArgumentException](lake.table("my_table_tmp"))
    assert(lake.sql("SHOW TABLES").as[String].collect().toSeq ==
      Seq("my_table", "my_table_backup"))
    // per-file stats of the tmp table's files pruned under the final name
    assert(lake.table("my_table").where(col("i") < 10).count() == 10)
  }

  test("txn rename conflicts: target taken, source renamed concurrently") {
    val lake = freshLake()
    lake.createTableAs("a", Seq(1).toDF("x"))
    lake.createTableAs("b", Seq(2).toDF("x"))
    // target exists (committed, not touched by this txn) → buffer-time error
    lake.begin()
    val e = intercept[IllegalArgumentException](lake.renameTable("a", "b"))
    assert(e.getMessage.contains("already exists"))
    lake.rollback()
    // swap within one txn IS legal: a→c then b→a
    lake.transaction {
      lake.renameTable("a", "c")
      lake.renameTable("b", "a")
    }
    assert(lake.table("c").head().getInt(0) == 1)
    assert(lake.table("a").head().getInt(0) == 2)
    // concurrent rename of the source conflicts at commit
    val lake2 = Lake.attach(spark, lake.meta.jdbcUrl, lake.dataPath)
    lake.begin()
    lake.renameTable("c", "d")
    lake2.renameTable("c", "e") // wins immediately
    val e2 = intercept[CommitConflictException](lake.commit())
    assert(e2.getMessage.contains("renamed concurrently"))
    lake.rollback()
    assert(lake.table("e").head().getInt(0) == 1)
  }

  test("txn-local truncate writes no files; insert-into-self doubles " +
      "(reference truncate_table.test / insert_into_self.test)") {
    val lake = freshLake()
    // CREATE + full DELETE in one txn: nothing survives, and ideally no
    // data files either (the staged-file rewrite drops empty outputs)
    lake.transaction {
      lake.createTableAs("tl", (0L until 10000L).toDF("id"))
      assert(lake.table("tl").count() == 10000)
      assert(lake.delete("tl", lit(true)) == 10000L)
      assert(lake.table("tl").count() == 0)
    }
    assert(lake.table("tl").count() == 0)
    val dir = new java.io.File(s"${lake.dataPath}/tl")
    val files = Option(dir.listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet"))
    assert(files.isEmpty, s"truncated txn table left files: ${files.toSeq}")
    // committed table truncated inside a txn
    lake.createTableAs("test", (0L until 1000L).toDF("id"))
    lake.transaction {
      assert(lake.delete("test", lit(true)) == 1000L)
      assert(lake.table("test").count() == 0)
    }
    assert(lake.table("test").count() == 0)
    // insert-into-self: each statement reads the txn's own prior writes
    lake.sql("CREATE TABLE si (i BIGINT, j STRING)")
    lake.transaction {
      lake.sql("INSERT INTO si VALUES (1, '2'), (NULL, '3')")
      lake.sql("INSERT INTO si SELECT * FROM si")      // 4
      lake.sql("INSERT INTO si SELECT * FROM si")      // 8
      lake.sql("INSERT INTO si SELECT * FROM si")      // 16
      lake.sql("INSERT INTO si SELECT a.i, a.j FROM si a, si b") // +256
      assert(lake.sql("SELECT COUNT(*) AS n FROM si").head().getLong(0)
        == 272)
    }
    assert(lake.table("si").count() == 272)
  }

  test("SET PARTITIONED BY on a txn-created table + partitioned insert " +
      "+ rename, one commit (reference partition_rename_in_transaction)") {
    val lake = freshLake()
    lake.createSchema("s")
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.createTable("s.t1", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dt",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.IntegerType))))
      lake.setPartitionedBy("s.t1", Seq(("dt", "identity")))
      lake.append("s.t1", Seq(
        (java.sql.Date.valueOf("2026-04-30"), 1),
        (java.sql.Date.valueOf("2026-04-29"), 2)).toDF("dt", "v"))
      assert(lake.table("s.t1").count() == 2)
      lake.renameTable("s.t1", "s.auto_probe_after")
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("s.auto_probe_after").count() == 2)
    // the spec is live under the renamed table with real ids
    val c = lake.meta.openConnection()
    try {
      val rs = c.createStatement().executeQuery(
        """SELECT t.table_name, pc.partition_key_index, pc.transform
          |FROM ducklake_table t
          |JOIN ducklake_partition_column pc ON t.table_id = pc.table_id
          |WHERE t.end_snapshot IS NULL""".stripMargin)
      assert(rs.next())
      assert(rs.getString(1) == "auto_probe_after")
      assert(rs.getLong(2) == 0L && rs.getString(3) == "identity")
      assert(!rs.next())
    } finally { c.rollback(); c.close() }
    // partition pruning works on the committed files
    assert(lake.table("s.auto_probe_after",
      Some(col("dt") === java.sql.Date.valueOf("2026-04-30"))).count() == 1)
    // the partitioned write produced hive-labeled per-partition files
    assert(lake.listFiles("s.auto_probe_after").count() == 2)
  }

  test("rename-away frees a name for CREATE; a rename's target blocks it") {
    val lake = freshLake()
    lake.createTableAs("a", Seq(1).toDF("x"))
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.renameTable("a", "b")
      // the renamed-away name is reusable in the SAME txn (dbt shape,
      // reverse order: rename first, then create)
      lake.createTableAs("a", Seq(9).toDF("x"))
      // the rename's TARGET name is bound — creating it must fail, or
      // commit would land two live tables named b
      val e = intercept[IllegalArgumentException](
        lake.createTableAs("b", Seq(7).toDF("x")))
      assert(e.getMessage.contains("already exists"))
    }
    assert(lake.currentSnapshotId() == before + 1)
    assert(lake.table("a").head().getInt(0) == 9)
    assert(lake.table("b").head().getInt(0) == 1)
    // exactly one live row per name
    val c = lake.meta.openConnection()
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT table_name, COUNT(*) FROM ducklake_table " +
          "WHERE end_snapshot IS NULL GROUP BY table_name")
      while (rs.next()) assert(rs.getLong(2) == 1L,
        s"duplicate live rows for ${rs.getString(1)}")
    } finally { c.rollback(); c.close() }
  }

  test("duplicate SET DEFAULT on one column in one transaction " +
      "(reference set_default_duplicate_in_transaction.test)") {
    val lake = freshLake()
    lake.sql("CREATE TABLE tbl (id INTEGER, a INTEGER)")
    lake.transaction {
      lake.setColumnDefault("tbl", "a", "99")
      lake.setColumnDefault("tbl", "a", "9")
    }
    // the next single-alter txn must succeed (reference bug: each alter
    // emitted a drop+add pair → duplicate live column rows → "Column
    // with name a already exists" on the next access)
    lake.transaction { lake.setColumnDefault("tbl", "a", "8") }
    lake.sql("INSERT INTO tbl (id) VALUES (1)")
    assert(lake.table("tbl").select("a").head().getInt(0) == 8)
    // three SET DEFAULTs in one transaction
    lake.transaction {
      lake.setColumnDefault("tbl", "a", "1")
      lake.setColumnDefault("tbl", "a", "2")
      lake.setColumnDefault("tbl", "a", "3")
    }
    lake.sql("INSERT INTO tbl (id) VALUES (2)")
    assert(lake.table("tbl").where(col("id") === 2)
      .select("a").head().getInt(0) == 3)
  }

  test("multiple alters of one column in one transaction " +
      "(reference multi_alter_same_column_transaction.test)") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    val lake = freshLake()
    // Part 1: SET NOT NULL → DROP NOT NULL → SET DEFAULT → RENAME
    lake.sql("CREATE TABLE t (id INTEGER, col1 INTEGER)")
    lake.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
    val before = lake.currentSnapshotId()
    lake.transaction {
      lake.setNotNull("t", "col1")
      lake.dropNotNull("t", "col1")
      lake.setColumnDefault("t", "col1", "42")
      lake.renameColumn("t", "col1", "col1_final")
    }
    assert(lake.currentSnapshotId() == before + 1) // ONE snapshot
    lake.sql("INSERT INTO t VALUES (3, NULL)") // DROP NOT NULL won
    lake.sql("INSERT INTO t (id) VALUES (4)")  // reads the new default
    assert(lake.table("t").orderBy("id")
      .select("id", "col1_final").collect().map(r =>
        (r.getInt(0), if (r.isNullAt(1)) null else r.getInt(1))).toSeq ==
      Seq((1, 10), (2, 20), (3, null), (4, 42)))
    // Part 3: ADD + RENAME + DROP of the same column nets out
    lake.sql("CREATE TABLE ard (id INTEGER, val VARCHAR)")
    lake.sql("INSERT INTO ard VALUES (1, 'a'), (2, 'b')")
    lake.transaction {
      lake.addColumn("ard", StructField("tmp_col", IntegerType))
      lake.renameColumn("ard", "tmp_col", "renamed_col")
      lake.dropColumn("ard", "renamed_col")
    }
    assert(lake.table("ard").columns.toSeq == Seq("id", "val"))
    assert(lake.table("ard").count() == 2)
    // Part 4: ADD two columns and RENAME both in one transaction
    lake.sql("CREATE TABLE two (id INTEGER)")
    lake.sql("INSERT INTO two VALUES (1), (2), (3)")
    lake.transaction {
      lake.addColumn("two", StructField("col_a",
        org.apache.spark.sql.types.StringType))
      lake.addColumn("two", StructField("col_b", IntegerType))
      lake.renameColumn("two", "col_a", "col_a_renamed")
      lake.renameColumn("two", "col_b", "col_b_renamed")
    }
    assert(lake.table("two").columns.toSeq ==
      Seq("id", "col_a_renamed", "col_b_renamed"))
    assert(lake.table("two").where(col("col_a_renamed").isNull).count() == 3)
  }

  test("mass same-txn delete of staged rows stays off the driver") {
    import org.apache.spark.sql.types._
    // insert 120k rows in a txn, then delete most of them in the SAME
    // txn: matched positions flow scratch-parquet → distributed anti-join
    // (rewritePendingFiles); the driver only ever holds per-file counts.
    val lake = freshLake()
    lake.createTable("big", StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    val n = 120000L
    lake.transaction {
      lake.append("big",
        spark.range(n).select(col("id"), (col("id") * 7).as("v"))
          .repartition(4))
      // full wipe of two staged files' worth, partial on the rest
      lake.delete("big", col("id") % 10 =!= 0L)
      assert(lake.table("big").count() == n / 10)
      lake.append("big", Seq((n + 1, 1L)).toDF("id", "v"))
    }
    assert(lake.table("big").count() == n / 10 + 1)
    assert(lake.table("big").agg(sum(col("id"))).head().getLong(0) ==
      (0L until n by 10).sum + n + 1)
    // delete EVERYTHING staged (files dropped outright, no rewrite)
    lake.transaction {
      lake.append("big", spark.range(1000).select(
        (col("id") + 1000000L).as("id"), lit(0L).as("v")).repartition(3))
      lake.delete("big", col("id") >= 1000000L)
    }
    assert(lake.table("big").count() == n / 10 + 1)
  }
}

/** The ENTIRE transaction matrix re-run against a live SQLite catalog
  * (reference test/configs/sqlite.json runs its transaction suites per
  * backend): same buffered-commit, conflict, rename/DDL and rollback
  * semantics must hold when the metadata engine is the host's real
  * SQLite behind [[graft.catalog.SqliteCliCatalog]]. */
class SqliteTransactionSpec extends TransactionSpec {
  override protected def catalogUrl(dir: String): String = {
    assume(graft.catalog.SqliteCliCatalog.available,
      "no sqlite3 binary on this host")
    s"jdbc:sqlite:$dir/cat.db"
  }
}

/** The transaction matrix against a live PostgreSQL server (reference
  * test/configs/postgres.json): every buffered-commit / conflict /
  * rename / rollback behavior re-validated on the backend the reference
  * recommends for shared multi-writer catalogs. */
class PgTransactionSpec extends TransactionSpec {
  override protected def catalogUrl(dir: String): String = {
    val url = PgTestServer.freshDbUrl(dir.takeRight(12))
    assume(url.isDefined, "no bootable PostgreSQL server on this host")
    url.get
  }
}
