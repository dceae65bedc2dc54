package graft.catalog

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, PreparedStatement, ResultSet, SQLException, Statement}

import scala.collection.mutable.ArrayBuffer

/** Shared JDBC-facade machinery for the CLI catalog bridges
  * ([[SqliteCliCatalog]], [[PostgresCliCatalog]]): dynamic proxies for the
  * small slice of `java.sql` that [[MetadataManager]] uses, a
  * pre-materialized ResultSet over (column → value) row maps, and `?`
  * placeholder substitution (CLIs have no bind API). Engine-specific
  * parts — process protocol, literal spelling, error→SQLSTATE mapping —
  * stay in each bridge.
  */
private[catalog] object CliJdbc {

  def proxy[A](iface: Class[A], label: String)(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): A =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: Any, m: Method,
            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          m.getName match {
            case "toString" => s"$label:${iface.getSimpleName}"
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p.asInstanceOf[AnyRef] eq a(0))
            case name if pf.isDefinedAt((name, a)) => pf((name, a))
            case name => throw new UnsupportedOperationException(
              s"${iface.getSimpleName}.$name not supported by the " +
                s"$label bridge")
          }
        }
      }).asInstanceOf[A]

  /** Pre-fetched rows behind the cursor surface the manager reads.
    * Values may be typed (sqlite JSON) or strings (psql CSV) — getters
    * coerce. */
  def resultSet(rows: Seq[java.util.LinkedHashMap[String, Object]],
      label: String): ResultSet = {
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
    proxy(classOf[ResultSet], label) {
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
        case v =>
          val s = String.valueOf(v)
          // sqlite: 1/0; postgres CSV: t/f
          Boolean.box(s == "1" || s == "t" || s.equalsIgnoreCase("true"))
      }
      case ("getObject", a) => cell(a(0)).asInstanceOf[AnyRef]
      case ("wasNull", _) => Boolean.box(lastNull)
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
    }
  }

  /** substitute `?` placeholders (outside string literals) with engine
    * literals. */
  def render(sql: String, params: Seq[Any],
      literal: Any => String): String = {
    val sb = new java.lang.StringBuilder(sql.length + 64)
    var inStr = false
    var p = 0
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (ch == '\'') { inStr = !inStr; sb.append(ch) }
      else if (ch == '?' && !inStr) {
        if (p >= params.length) // NULL-for-missing would silently change
          throw new SQLException( // the statement's meaning
            s"parameter ${p + 1} not bound (only ${params.length} set): $sql",
            "07001")
        sb.append(literal(params(p)))
        p += 1
      } else sb.append(ch)
      i += 1
    }
    sb.toString
  }

  /** PreparedStatement facade over a `run(renderedSql)` executor. */
  def preparedStatement(sql: String, label: String,
      literal: Any => String,
      run: String => Seq[java.util.LinkedHashMap[String, Object]])
      : PreparedStatement = {
    val params = ArrayBuffer.empty[Any]
    val batches = ArrayBuffer.empty[Seq[Any]]
    proxy(classOf[PreparedStatement], label) {
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
      case ("executeQuery", _) =>
        resultSet(run(render(sql, params.toSeq, literal)), label)
      case ("executeUpdate", _) =>
        // the CLI protocol doesn't surface affected-row counts; returning
        // a fabricated 0 or 1 would let a future `updated == 0` optimistic
        // check silently pass/fail — SUCCESS_NO_INFO says "executed, count
        // unknown" so such a dependency misbehaves loudly instead
        run(render(sql, params.toSeq, literal))
        Int.box(Statement.SUCCESS_NO_INFO)
      case ("addBatch", _) => batches += params.toSeq; null
      case ("executeBatch", _) =>
        batches.foreach(b => run(render(sql, b, literal)))
        val r = Array.fill(batches.size)(Statement.SUCCESS_NO_INFO)
        batches.clear()
        r
      case ("clearParameters", _) => params.clear(); null
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
    }
  }
}
