package graft.catalog

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, DatabaseMetaData, SQLException, Statement}

import scala.collection.mutable.ArrayBuffer

/** PostgreSQL catalog backend over the `psql` CLI.
  *
  * The reference's headline multi-writer deployment puts the metadata
  * catalog in Postgres (src/include/metadata_manager/
  * postgres_metadata_manager.hpp:15-41 — server-side snapshot query,
  * NAMEDATALEN identifier limit); the JDBC route here is
  * `jdbc:postgresql://` through the pgjdbc driver. Without a driver jar
  * on the classpath, this bridge runs the same catalog SQL through a real
  * PostgreSQL server via `psql` — one interactive process per connection,
  * so transaction state, MVCC conflict behavior (unique-violation 23505 /
  * serialization 40001 at commit) and the Postgres dialect's DDL spelling
  * are all the actual server's. A real driver on the classpath wins
  * ([[MetadataManager.connect]] tries `DriverManager` first).
  *
  * Protocol: `psql -X -q` with stderr folded into stdout;
  * `\set VERBOSITY verbose` so every error line carries its SQLSTATE
  * (`ERROR:  23505: …`); results in CSV (`\pset format csv`) with an
  * explicit null marker to keep NULL distinct from ''; each statement is
  * followed by an `\echo` sentinel (a psql meta-command — it cannot fail
  * in the server the way a sentinel SELECT could mid-conflict).
  */
object PostgresCliCatalog {

  private val NullMark = "@@GRAFT_NULL@@"

  lazy val available: Boolean =
    try {
      val p = new ProcessBuilder("psql", "--version").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** jdbc:postgresql://host:port/db[?user=u&password=p] → psql argv +
    * process environment. `password` travels via PGPASSWORD (psql has no
    * password argv flag, and argv is world-readable in /proc anyway); any
    * OTHER URL option is rejected loudly — silently dropping e.g. `ssl=
    * true` or `options=` would connect with different semantics than the
    * URL promises. */
  private[catalog] def psqlArgs(
      jdbcUrl: String): (Seq[String], Map[String, String]) = {
    val rest = jdbcUrl.stripPrefix("jdbc:postgresql://")
    val (hostPortDb, query) = rest.indexOf('?') match {
      case -1 => (rest, "")
      case i => (rest.take(i), rest.drop(i + 1))
    }
    val (hostPort, db) = hostPortDb.indexOf('/') match {
      case -1 => (hostPortDb, "postgres")
      case i => (hostPortDb.take(i), hostPortDb.drop(i + 1))
    }
    val (host, port) = hostPort.indexOf(':') match {
      case -1 => (hostPort, "5432")
      case i => (hostPort.take(i), hostPort.drop(i + 1))
    }
    val opts = query.split('&').filter(_.nonEmpty).map(_.split("=", 2))
      .map { case Array(k, v) => k -> v; case Array(k) => k -> "" }.toMap
    val unsupported = opts.keySet -- Set("user", "password")
    require(unsupported.isEmpty,
      s"unsupported jdbc:postgresql option(s) ${unsupported.mkString(",")}" +
        " on the psql bridge (only user/password)")
    val argv = Seq("psql", "-X", "-q", "-h", host, "-p", port, "-d", db) ++
      opts.get("user").toSeq.flatMap(u => Seq("-U", u))
    (argv, opts.get("password").map("PGPASSWORD" -> _).toMap)
  }

  def connect(jdbcUrl: String): Connection = new Conn(jdbcUrl).connection

  // ------------------------------------------------------------- engine I/O

  private final class Cli(jdbcUrl: String) {
    private val proc = {
      val (argv, env) = psqlArgs(jdbcUrl)
      val pb = new ProcessBuilder(argv: _*)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      // stderr stays SEPARATE: folding it into stdout would interleave
      // server messages (NOTICE/WARNING/ERROR, all written to stderr)
      // with the CSV stream, where a data value that merely LOOKS like a
      // message prefix — or a message splitting a quoted multi-line
      // field — would corrupt parsing. With two streams, stdout is pure
      // CSV + sentinel and stderr is pure diagnostics.
      pb.redirectErrorStream(false)
      pb.start()
    }
    private val in = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, UTF_8))
    private val out = new BufferedReader(
      new InputStreamReader(proc.getInputStream, UTF_8))
    private val err = new BufferedReader(
      new InputStreamReader(proc.getErrorStream, UTF_8))
    private var n = 0L
    in.write("\\set VERBOSITY verbose\n")
    in.write("\\pset format csv\n")
    in.write(s"\\pset null $NullMark\n")
    in.flush()

    /** Each statement is bracketed by TWO sentinels: `\echo` on stdout
      * (end of CSV) and `\warn` on stderr (end of diagnostics) — psql
      * meta-commands that cannot fail server-side. Reading stderr up to
      * its own sentinel makes error collection race-free without
      * guessing which stdout lines are messages. */
    def exec(sql: String): Seq[java.util.LinkedHashMap[String, Object]] =
      synchronized {
        n += 1
        val tag = s"@@graft_eos_$n@@"
        val stmt = sql.trim match {
          case s if s.endsWith(";") => s
          case s => s + ";"
        }
        in.write(stmt); in.write("\n")
        in.write(s"\\echo $tag\n")
        in.write(s"\\warn $tag\n")
        in.flush()
        val csv = new java.lang.StringBuilder
        var done = false
        while (!done) {
          val line = out.readLine()
          if (line == null)
            throw new SQLException("psql process died", "08006")
          if (line == tag) done = true
          else { csv.append(line); csv.append('\n') }
        }
        val errs = ArrayBuffer.empty[String]
        done = false
        while (!done) {
          val line = err.readLine()
          if (line == null) done = true // stderr closed: process dying
          else if (line == tag) done = true
          else errs += line
        }
        // ERROR:/FATAL: (verbose verbosity → SQLSTATE-prefixed) fail the
        // statement; NOTICE/WARNING/DETAIL/… are server chatter, ignored
        if (errs.exists(l => l.startsWith("ERROR:") ||
            l.startsWith("FATAL:"))) {
          val msg = errs.mkString("; ")
          val state = "(?:ERROR|FATAL):\\s+([0-9A-Z]{5}):".r
            .findFirstMatchIn(msg).map(_.group(1)).getOrElse("S1000")
          throw new SQLException(s"postgres: $msg", state)
        }
        parseCsv(csv.toString)
      }

    def close(): Unit = synchronized {
      try { in.write("\\q\n"); in.flush() } catch { case _: Exception => () }
      proc.destroy()
      if (!proc.waitFor(2, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly(): Unit
    }
  }

  /** Minimal CSV reader (RFC-4180 quoting incl. embedded newlines): the
    * first record is the header; the configured null marker → null. */
  private[catalog] def parseCsv(
      text: String): Seq[java.util.LinkedHashMap[String, Object]] = {
    if (text.trim.isEmpty) return Seq.empty
    val records = ArrayBuffer.empty[ArrayBuffer[String]]
    var cur = ArrayBuffer.empty[String]
    val field = new java.lang.StringBuilder
    var inQ = false
    var i = 0
    def endField(): Unit = { cur += field.toString; field.setLength(0) }
    def endRecord(): Unit = { endField(); records += cur; cur = ArrayBuffer.empty }
    while (i < text.length) {
      val ch = text.charAt(i)
      if (inQ) {
        if (ch == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') {
            field.append('"'); i += 1
          } else inQ = false
        } else field.append(ch)
      } else ch match {
        case '"' => inQ = true
        case ',' => endField()
        case '\n' => endRecord()
        case '\r' => ()
        case c => field.append(c)
      }
      i += 1
    }
    if (field.length() > 0 || cur.nonEmpty) endRecord()
    if (records.isEmpty) return Seq.empty
    // duplicate column names (e.g. two unnamed COUNT(*) scalar subqueries
    // both headed "count") must not collapse: uniquify later duplicates —
    // by-name access resolves the FIRST occurrence (JDBC semantics),
    // by-index access walks all values in order
    val header = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      records.head.map(_.toLowerCase).zipWithIndex.map { case (h, j) =>
        if (seen.add(h)) h else s"$h#$j"
      }
    }
    // A blank line parses as [""] (one empty field). For a ONE-column
    // result that is a legitimate empty-string row (psql prints '' as a
    // blank line) and must be kept; for a wider result no valid CSV row
    // is ever blank (every row carries header.size-1 commas), so it can
    // only be stray noise — drop it rather than fabricate a phantom row.
    records.drop(1)
      .filter(rec => rec.nonEmpty &&
        !(header.size > 1 && rec.size == 1 && rec.head.isEmpty))
      .map { rec =>
      val m = new java.util.LinkedHashMap[String, Object]()
      header.zipWithIndex.foreach { case (h, j) =>
        val raw = if (j < rec.size) rec(j) else NullMark
        m.put(h, if (raw == NullMark) null else raw)
      }
      m
    }.toSeq
  }

  private[catalog] def literal(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => literal(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case d: java.lang.Double =>
      if (d.isNaN) "'NaN'::float8"
      else if (d.isInfinite) {
        if (d > 0) "'Infinity'::float8" else "'-Infinity'::float8"
      } else d.toString
    case f: java.lang.Float => literal(Double.box(f.toDouble))
    case n: java.lang.Number => n.toString
    case b: Array[Byte] => // mirror the sqlite bridge's X'…' branch
      b.map(x => f"$x%02x").mkString("'\\x", "", "'::bytea")
    case t: java.sql.Timestamp => "'" + t.toString + "'"
    case other => literal(String.valueOf(other))
  }

  // ------------------------------------------------------------ connection

  private final class Conn(jdbcUrl: String) {
    private val cli = new Cli(jdbcUrl)
    private var inTxn = false
    private var closed = false

    /** Per-statement savepoint (pgjdbc's `autosave=always`): a failed
      * statement aborts a whole Postgres transaction (unlike Derby /
      * SQLite, which roll back only the statement), which would break the
      * manager's catch-and-continue paths (e.g. the create-race catch in
      * ensureInlinedTable) with 25P02 on the next statement. Re-declaring
      * the same savepoint name replaces the previous one, so no RELEASE
      * bookkeeping is needed. */
    private def run(sql: String)
        : Seq[java.util.LinkedHashMap[String, Object]] = {
      if (!inTxn) { cli.exec("BEGIN"); inTxn = true }
      cli.exec("SAVEPOINT graft_autosave")
      try cli.exec(sql)
      catch {
        case e: SQLException =>
          try cli.exec("ROLLBACK TO SAVEPOINT graft_autosave")
          catch { case _: SQLException => () }
          throw e
      }
    }

    private def metaData: DatabaseMetaData =
      CliJdbc.proxy(classOf[DatabaseMetaData], "psql-cli") {
        case ("getSchemas", a) =>
          CliJdbc.resultSet(run(CliJdbc.render(
            "SELECT schema_name FROM information_schema.schemata " +
              "WHERE lower(schema_name) = lower(?)",
            Seq(a(1)), literal)), "psql-cli")
        case ("getTables", a) =>
          val schema = Option(a(1)).map(String.valueOf(_))
          CliJdbc.resultSet(run(CliJdbc.render(
            "SELECT table_name FROM information_schema.tables " +
              "WHERE lower(table_name) = lower(?) AND table_schema = " +
              schema.map(_ => "lower(?)")
                .getOrElse("current_schema()"),
            Seq(a(2)) ++ schema.toSeq, literal)), "psql-cli")
        case ("getColumns", a) =>
          val schema = Option(a(1)).map(String.valueOf(_))
          CliJdbc.resultSet(run(CliJdbc.render(
            "SELECT column_name FROM information_schema.columns " +
              "WHERE lower(table_name) = lower(?) AND " +
              "lower(column_name) = lower(?) AND table_schema = " +
              schema.map(_ => "lower(?)")
                .getOrElse("current_schema()"),
            Seq(a(2), a(3)) ++ schema.toSeq, literal)), "psql-cli")
      }

    val connection: Connection = CliJdbc.proxy(classOf[Connection],
      "psql-cli") {
      case ("setAutoCommit", _) => null
      case ("getAutoCommit", _) => Boolean.box(false)
      case ("prepareStatement", a) =>
        CliJdbc.preparedStatement(a(0).asInstanceOf[String], "psql-cli",
          literal, run)
      case ("createStatement", _) =>
        CliJdbc.proxy(classOf[Statement], "psql-cli") {
          case ("executeUpdate", a) =>
            run(a(0).asInstanceOf[String])
            Int.box(Statement.SUCCESS_NO_INFO) // count unknown, not "0"
          case ("executeQuery", a) =>
            CliJdbc.resultSet(run(a(0).asInstanceOf[String]), "psql-cli")
          case ("close", _) => null
        }
      case ("getMetaData", _) => metaData
      case ("commit", _) =>
        if (inTxn) { cli.exec("COMMIT"); inTxn = false }
        null
      case ("rollback", _) =>
        if (inTxn) {
          try cli.exec("ROLLBACK")
          catch { case _: SQLException => () }
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
