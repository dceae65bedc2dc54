package graft.catalog

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, DatabaseMetaData, PreparedStatement, ResultSet, SQLException, Statement}

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
    // .mode json makes every result machine-parseable; busy_timeout=0
    // surfaces SQLITE_BUSY immediately so the manager's optimistic-commit
    // retry (not the engine) owns the backoff, like the reference's
    // sqlite manager
    in.write(".mode json\n"); in.flush()
    exec("PRAGMA busy_timeout=0"): Unit

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

  private def parseRows(
      text: String): Seq[java.util.LinkedHashMap[String, Object]] = {
    val t = text.trim
    if (t.isEmpty) Seq.empty
    else {
      val arr = HttpCatalogCodec.mapper.readValue(t,
        classOf[java.util.List[java.util.LinkedHashMap[String, Object]]])
      val out = ArrayBuffer.empty[java.util.LinkedHashMap[String, Object]]
      arr.forEach { m =>
        val lower = new java.util.LinkedHashMap[String, Object]()
        m.forEach((k, v) => lower.put(k.toLowerCase, v))
        out += lower
      }
      out.toSeq
    }
  }

  // -------------------------------------------------------- SQL rendering

  /** substitute `?` placeholders (outside string literals) with SQLite
    * literals — the CLI has no bind API. */
  private def render(sql: String, params: Seq[Any]): String = {
    val sb = new java.lang.StringBuilder(sql.length + 64)
    var inStr = false
    var p = 0
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'') { inStr = !inStr; sb.append(ch) }
      else if (ch == '?' && !inStr) {
        sb.append(literal(if (p < params.length) params(p) else null))
        p += 1
      } else sb.append(ch)
      i += 1
    }
    sb.toString
  }

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

  // ------------------------------------------------------------ JDBC facade

  private def proxy[A](iface: Class[A])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): A =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: Any, m: Method,
            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          m.getName match {
            case "toString" => s"sqlite-cli:${iface.getSimpleName}"
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p.asInstanceOf[AnyRef] eq a(0))
            case name if pf.isDefinedAt((name, a)) => pf((name, a))
            case name => throw new UnsupportedOperationException(
              s"${iface.getSimpleName}.$name not supported by the " +
                "sqlite3 CLI bridge")
          }
        }
      }).asInstanceOf[A]

  private def resultSet(
      rows: Seq[java.util.LinkedHashMap[String, Object]]): ResultSet = {
    var cursor = -1
    var lastNull = false
    def cell(a: AnyRef): Any = {
      val row = rows(cursor)
      val v = a match {
        case i: Integer =>
          val it = row.values().iterator()
          var k = 1; var r: Object = null
          while (it.hasNext && k <= i.intValue()) { r = it.next(); k += 1 }
          if (k <= i.intValue()) null else r
        case s: String => row.get(s.toLowerCase)
        case other => throw new SQLException(s"bad column ref $other")
      }
      lastNull = v == null
      v
    }
    proxy(classOf[ResultSet]) {
      case ("next", _) => cursor += 1; Boolean.box(cursor < rows.size)
      case ("getLong", a) => cell(a(0)) match {
        case null => Long.box(0L)
        case n: java.lang.Number => Long.box(n.longValue())
        case v => Long.box(String.valueOf(v).toLong)
      }
      case ("getInt", a) => cell(a(0)) match {
        case null => Int.box(0)
        case n: java.lang.Number => Int.box(n.intValue())
        case v => Int.box(String.valueOf(v).toInt)
      }
      case ("getDouble", a) => cell(a(0)) match {
        case null => Double.box(0.0)
        case n: java.lang.Number => Double.box(n.doubleValue())
        case v => Double.box(String.valueOf(v).toDouble)
      }
      case ("getString", a) => cell(a(0)) match {
        case null => null
        case v => String.valueOf(v)
      }
      case ("getBoolean", a) => cell(a(0)) match {
        case null => Boolean.box(false)
        case b: java.lang.Boolean => b
        case n: java.lang.Number => Boolean.box(n.longValue() != 0)
        case v => Boolean.box(String.valueOf(v) == "1" ||
          String.valueOf(v).equalsIgnoreCase("true"))
      }
      case ("getObject", a) => cell(a(0)).asInstanceOf[AnyRef]
      case ("wasNull", _) => Boolean.box(lastNull)
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
    }
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

    private def prepared(sql: String): PreparedStatement = {
      val params = ArrayBuffer.empty[Any]
      val batches = ArrayBuffer.empty[Seq[Any]]
      proxy(classOf[PreparedStatement]) {
        case ("setObject", a) =>
          val i = a(0).asInstanceOf[Integer].intValue()
          while (params.size < i) params += null
          params(i - 1) = a(1)
          null
        case ("setNull", a) =>
          val i = a(0).asInstanceOf[Integer].intValue()
          while (params.size < i) params += null
          params(i - 1) = null
          null
        case ("executeQuery", _) => resultSet(run(render(sql, params.toSeq)))
        case ("executeUpdate", _) =>
          run(render(sql, params.toSeq)); Int.box(0)
        case ("addBatch", _) => batches += params.toSeq; null
        case ("executeBatch", _) =>
          batches.foreach(b => run(render(sql, b)))
          val r = Array.fill(batches.size)(1)
          batches.clear()
          r
        case ("clearParameters", _) => params.clear(); null
        case ("close", _) => null
        case ("isClosed", _) => Boolean.box(false)
      }
    }

    private def metaData: DatabaseMetaData = proxy(classOf[DatabaseMetaData]) {
      case ("getTables", a) =>
        resultSet(run(render(
          "SELECT name FROM sqlite_master WHERE type IN ('table','view') " +
            "AND lower(name) = lower(?)", Seq(a(2)))))
      case ("getColumns", a) =>
        val table = String.valueOf(a(2))
        require(table.matches("[A-Za-z0-9_]+"), s"bad table name $table")
        val col = String.valueOf(a(3)).toLowerCase
        val cols = run(s"PRAGMA table_info($table)")
          .filter(m => String.valueOf(m.get("name")).toLowerCase == col)
        resultSet(cols)
    }

    val connection: Connection = proxy(classOf[Connection]) {
      case ("setAutoCommit", _) => null // bridge is always manual-commit
      case ("getAutoCommit", _) => Boolean.box(false)
      case ("prepareStatement", a) => prepared(a(0).asInstanceOf[String])
      case ("createStatement", _) => proxy(classOf[Statement]) {
        case ("executeUpdate", a) =>
          run(a(0).asInstanceOf[String]); Int.box(0)
        case ("executeQuery", a) =>
          resultSet(run(a(0).asInstanceOf[String]))
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
