package graft.catalog

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, DatabaseMetaData, SQLException, Statement}

import scala.collection.mutable.ArrayBuffer

/** SQLite catalog backend over the `sqlite3` CLI.
  *
  * The reference ships a first-class SQLite metadata manager
  * (src/include/metadata_manager/sqlite_metadata_manager.hpp:15-29 — file
  * catalog, no appender, BUSY-retry discipline); the matching JDBC route
  * here is `jdbc:sqlite:` through the xerial driver. This sandbox has no
  * driver jar, but it does have a real SQLite engine (the `sqlite3`
  * binary), so this bridge exposes one `sqlite3` process per connection
  * behind the small slice of `java.sql.Connection` that [[MetadataManager]]
  * uses — the SQLite-dialect SQL, transaction/locking semantics
  * (BEGIN/COMMIT/ROLLBACK, SQLITE_BUSY on write-write races) and error
  * codes are the actual engine's, not a simulation. When a real JDBC
  * driver IS on the classpath it wins ([[MetadataManager.connect]] tries
  * `DriverManager` first); this is the fallback, and also a live
  * conformance harness for [[SqliteDialect]]'s generated SQL.
  *
  * Protocol: one interactive `sqlite3 -batch -json` process; each
  * statement is written followed by a sentinel `SELECT`, stdout (with
  * stderr folded in) is read until the sentinel row appears; non-JSON
  * lines in between are engine errors, mapped to `SQLException`s whose
  * state [[SqliteDialect.isConflictState]] classifies (SQLITE_BUSY 5 /
  * SQLITE_LOCKED 6 retry; constraint violations → 23505; parse errors →
  * 42000, never retried).
  */
object SqliteCliCatalog {

  /** is the sqlite3 binary runnable? (checked once) */
  lazy val available: Boolean =
    try {
      val p = new ProcessBuilder("sqlite3", "--version").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  def connect(dbPath: String): Connection = new Conn(dbPath).connection

  // ------------------------------------------------------------- engine I/O

  private final class Cli(dbPath: String) {
    private val proc = {
      val pb = new ProcessBuilder("sqlite3", "-batch", dbPath)
      pb.redirectErrorStream(true) // errors appear inline, in order
      pb.start()
    }
    private val in = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, UTF_8))
    private val out = new BufferedReader(
      new InputStreamReader(proc.getInputStream, UTF_8))
    private var n = 0L
    // .mode json makes every result machine-parseable. busy_timeout gives
    // the engine a bounded in-lock wait: with 0, a COMMIT (needs the
    // EXCLUSIVE lock) starves whenever competing writers keep opening
    // SHARED read transactions — each instant-BUSY burns one of the
    // manager's retries and two hot writers can exhaust all of them.
    // With a wait, the lock usually clears inside the engine; a still-
    // stuck lock surfaces SQLITE_BUSY → SQLSTATE "5" and the manager's
    // optimistic-commit retry (the reference sqlite manager's BUSY-retry
    // discipline) takes over.
    in.write(".mode json\n"); in.flush()
    exec("PRAGMA busy_timeout=2000"): Unit

    /** run one statement; returns result rows as (lowercased column →
      * value) maps in column order. */
    def exec(sql: String): Seq[java.util.LinkedHashMap[String, Object]] =
      synchronized {
        n += 1
        // the sentinel is a shell dot-command, NOT SQL: a `SELECT`
        // sentinel can itself hit SQLITE_BUSY under cross-process lock
        // contention and then never emits its row — `.print` touches no
        // database state and always prints
        val tag = s"@@graft_eos_$n@@"
        val stmt = sql.trim match {
          case s if s.endsWith(";") => s
          case s => s + ";"
        }
        in.write(stmt); in.write("\n")
        in.write(s".print $tag\n")
        in.flush()
        val json = new java.lang.StringBuilder
        val errs = ArrayBuffer.empty[String]
        var done = false
        while (!done) {
          val line = out.readLine()
          if (line == null)
            throw new SQLException(
              s"sqlite3 process died (${errs.mkString("; ")})", "08006")
          if (line == tag) done = true
          else if (line.startsWith("[") || line.startsWith("{") ||
            json.length() > 0) { json.append(line); json.append('\n') }
          else if (line.nonEmpty) errs += line
        }
        if (errs.nonEmpty) {
          val msg = errs.mkString("; ")
          throw new SQLException(s"sqlite: $msg", stateOf(msg))
        }
        parseRows(json.toString)
      }

    def close(): Unit = synchronized {
      try { in.write(".quit\n"); in.flush() } catch { case _: Exception => () }
      proc.destroy()
      if (!proc.waitFor(2, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly(): Unit
    }
  }

  /** engine error text → SQLSTATE for [[SqliteDialect.isConflictState]].
    * The CLI appends the SQLite result code in parens, e.g.
    * "Runtime error: database is locked (5)" /
    * "UNIQUE constraint failed: t.x (19)". */
  private def stateOf(msg: String): String = {
    val code = "\\((\\d+)\\)".r.findAllMatchIn(msg).toSeq.lastOption
      .map(_.group(1).toInt)
    code.map(_ & 0xff) match {
      case Some(5) => "5" // SQLITE_BUSY — lost a write race, retry
      case Some(6) => "6" // SQLITE_LOCKED
      case Some(19) => "23505" // SQLITE_CONSTRAINT → unique-violation class
      case Some(_) => "S1000"
      case None if msg.startsWith("Parse error") => "42000"
      case None => "S1000"
    }
  }

  private[catalog] def parseRows(
      text: String): Seq[java.util.LinkedHashMap[String, Object]] = {
    val t = text.trim
    if (t.isEmpty) Seq.empty
    else {
      // sqlite3 .mode json emits duplicate keys inside ONE object for
      // duplicate result columns (`SELECT 1 AS a, 2 AS a` →
      // `[{"a":1,"a":2}]`), and Jackson's map binding keeps only the last
      // value — so duplicates must be uniquified at the TOKEN level,
      // before any map exists (see the psql bridge's header
      // uniquification; by-name access resolves the first occurrence,
      // by-index access walks all values in order).
      import com.fasterxml.jackson.core.JsonToken._
      val out = ArrayBuffer.empty[java.util.LinkedHashMap[String, Object]]
      val p = HttpCatalogCodec.mapper.getFactory.createParser(t)
      try {
        if (p.nextToken() != START_ARRAY)
          throw new SQLException(s"sqlite json: expected array in: $t",
            "S1000")
        var tok = p.nextToken()
        while (tok == START_OBJECT) {
          val row = new java.util.LinkedHashMap[String, Object]()
          var j = 0
          while (p.nextToken() == FIELD_NAME) {
            val k = p.currentName().toLowerCase
            val v: Object = p.nextToken() match {
              case VALUE_NULL => null
              case VALUE_STRING => p.getText
              case VALUE_NUMBER_INT => Long.box(p.getLongValue)
              case VALUE_NUMBER_FLOAT => Double.box(p.getDoubleValue)
              case VALUE_TRUE => java.lang.Boolean.TRUE
              case VALUE_FALSE => java.lang.Boolean.FALSE
              case other =>
                throw new SQLException(s"sqlite json: unexpected $other",
                  "S1000")
            }
            row.put(if (row.containsKey(k)) s"$k#$j" else k, v)
            j += 1
          }
          out += row
          tok = p.nextToken()
        }
      } finally p.close()
      out.toSeq
    }
  }

  // ---------------------------------------------------------- literals

  private def literal(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => literal(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: java.lang.Boolean => if (b) "1" else "0"
    case d: java.lang.Double =>
      if (d.isNaN) "NULL" // SQLite cannot store NaN; it reads back NULL
      else if (d.isInfinite) { if (d > 0) "9e999" else "-9e999" }
      else d.toString
    case f: java.lang.Float => literal(Double.box(f.toDouble))
    case n: java.lang.Number => n.toString
    case b: Array[Byte] =>
      b.map(x => f"$x%02x").mkString("X'", "", "'")
    case t: java.sql.Timestamp => "'" + t.toString + "'"
    case other => literal(String.valueOf(other))
  }

  private final class Conn(dbPath: String) {
    private val cli = new Cli(dbPath)
    private var inTxn = false
    private var closed = false

    /** lazy BEGIN: the first statement after a commit boundary opens the
      * transaction (autocommit-off JDBC semantics). */
    private def run(sql: String)
        : Seq[java.util.LinkedHashMap[String, Object]] = {
      if (!inTxn) { cli.exec("BEGIN"); inTxn = true }
      cli.exec(sql)
    }

    private def metaData: DatabaseMetaData =
      CliJdbc.proxy(classOf[DatabaseMetaData], "sqlite-cli") {
        case ("getTables", a) =>
          CliJdbc.resultSet(run(CliJdbc.render(
            "SELECT name FROM sqlite_master WHERE type IN ('table','view') " +
              "AND lower(name) = lower(?)", Seq(a(2)), literal)),
            "sqlite-cli")
        case ("getColumns", a) =>
          val table = String.valueOf(a(2))
          require(table.matches("[A-Za-z0-9_]+"), s"bad table name $table")
          val col = String.valueOf(a(3)).toLowerCase
          val cols = run(s"PRAGMA table_info($table)")
            .filter(m => String.valueOf(m.get("name")).toLowerCase == col)
          CliJdbc.resultSet(cols, "sqlite-cli")
      }

    val connection: Connection = CliJdbc.proxy(classOf[Connection],
      "sqlite-cli") {
      case ("setAutoCommit", _) => null // bridge is always manual-commit
      case ("getAutoCommit", _) => Boolean.box(false)
      case ("prepareStatement", a) =>
        CliJdbc.preparedStatement(a(0).asInstanceOf[String], "sqlite-cli",
          literal, run)
      case ("createStatement", _) =>
        CliJdbc.proxy(classOf[Statement], "sqlite-cli") {
          case ("executeUpdate", a) =>
            run(a(0).asInstanceOf[String])
            Int.box(Statement.SUCCESS_NO_INFO) // count unknown, not "0"
          case ("executeQuery", a) =>
            CliJdbc.resultSet(run(a(0).asInstanceOf[String]), "sqlite-cli")
          case ("close", _) => null
        }
      case ("getMetaData", _) => metaData
      case ("commit", _) =>
        if (inTxn) {
          cli.exec("COMMIT") // BUSY here = lost the race → SQLState 5,
          inTxn = false      // txn stays open for the caller's rollback
        }
        null
      case ("rollback", _) =>
        if (inTxn) {
          try cli.exec("ROLLBACK")
          catch { case _: SQLException => () } // already aborted: benign
          inTxn = false
        }
        null
      case ("close", _) =>
        if (!closed) {
          closed = true
          try { if (inTxn) cli.exec("ROLLBACK") }
          catch { case _: Exception => () }
          cli.close()
        }
        null
      case ("isClosed", _) => Boolean.box(closed)
      case ("isValid", _) => Boolean.box(!closed)
    }
  }
}
