package graft

import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, SQLException}
import java.util.Properties
import java.util.logging.Logger

import graft.catalog.MetadataManager
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DriverManager-first contract of [[MetadataManager.connect]]:
  * when a real `java.sql.Driver` for `jdbc:sqlite:` is on the classpath it
  * MUST win over the sqlite3 CLI bridge (the bridge is a fallback for
  * driverless hosts, mirroring how the reference links real sqlite —
  * src/include/metadata_manager/sqlite_metadata_manager.hpp:15-29).
  */
class DriverPrecedenceSpec extends AnyFunSuite {

  /** a stub driver claiming jdbc:sqlite: that hands back a marker
    * connection (a dynamic proxy recording nothing but its identity) */
  private object StubSqliteDriver extends Driver {
    val marker: Connection = java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[Connection]),
      (_, m, _) => m.getName match {
        case "toString" => "stub-sqlite-connection"
        case "setAutoCommit" | "close" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case other => throw new UnsupportedOperationException(other)
      }).asInstanceOf[Connection]
    override def connect(url: String, info: Properties): Connection =
      if (acceptsURL(url)) marker else null
    override def acceptsURL(url: String): Boolean =
      url != null && url.startsWith("jdbc:sqlite:")
    override def getPropertyInfo(url: String, info: Properties)
        : Array[DriverPropertyInfo] = Array.empty
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger: Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }

  /** expose the protected connect() */
  private final class Probe(url: String) extends MetadataManager(url) {
    def probeConnect(): Connection = connect()
  }

  test("a registered jdbc:sqlite: Driver wins over the CLI bridge") {
    DriverManager.registerDriver(StubSqliteDriver)
    try {
      val c = new Probe("jdbc:sqlite:/tmp/nonexistent-precedence.db")
        .probeConnect()
      assert(c eq StubSqliteDriver.marker,
        s"expected the registered driver's connection, got $c")
    } finally DriverManager.deregisterDriver(StubSqliteDriver)
  }

  test("without a driver the CLI bridge answers (fallback intact)") {
    assume(graft.catalog.SqliteCliCatalog.available,
      "no sqlite3 binary on this host")
    val dir = java.nio.file.Files.createTempDirectory("drvprec").toString
    val c = new Probe(s"jdbc:sqlite:$dir/f.db").probeConnect()
    assert(c.toString.startsWith("sqlite-cli"), c.toString)
    c.close()
  }

  test("a driver that throws a non-'No suitable driver' error is NOT " +
    "silently replaced by the bridge") {
    val failing = new Driver {
      override def connect(url: String, info: Properties): Connection =
        if (acceptsURL(url)) throw new SQLException("auth failed", "28000")
        else null
      override def acceptsURL(url: String): Boolean =
        url != null && url.startsWith("jdbc:sqlite:")
      override def getPropertyInfo(url: String, info: Properties)
          : Array[DriverPropertyInfo] = Array.empty
      override def getMajorVersion: Int = 1
      override def getMinorVersion: Int = 0
      override def jdbcCompliant(): Boolean = false
      override def getParentLogger: Logger =
        throw new java.sql.SQLFeatureNotSupportedException()
    }
    DriverManager.registerDriver(failing)
    try {
      val e = intercept[SQLException](
        new Probe("jdbc:sqlite:/tmp/x.db").probeConnect())
      assert(e.getSQLState == "28000")
    } finally DriverManager.deregisterDriver(failing)
  }
}
