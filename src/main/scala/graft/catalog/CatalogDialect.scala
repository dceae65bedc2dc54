package graft.catalog

/** Catalog-database SQL dialects (reference ships one metadata manager per
  * backend: src/metadata_manager/postgres_metadata_manager.cpp,
  * sqlite_metadata_manager.cpp, duckdb_metadata_manager.cpp — matrix
  * configs test/configs/postgres.json, sqlite.json). The repo's
  * [[MetadataManager]] speaks ANSI JDBC; everything backend-specific
  * funnels through this trait: DDL type spelling, retryable SQLSTATEs and
  * identifier limits.
  *
  * Derby is the embedded default (always available in the sandbox); the
  * Postgres dialect is complete but needs a server + driver on the
  * classpath — attach with `jdbc:postgresql://…` and the URL routes to it
  * automatically. A shared multi-writer catalog (DuckLake's headline
  * deployment) runs on Postgres; single-process embedded catalogs on
  * Derby.
  */
sealed trait CatalogDialect {
  def name: String

  /** rewrite a CREATE TABLE statement's types to the dialect's spelling */
  def ddl(stmt: String): String = stmt

  /** SQLSTATEs meaning "lost an optimistic race — retry the commit" */
  def isConflictState(sqlState: String): Boolean

  /** backend identifier-length limit (reference postgres manager truncates
    * at NAMEDATALEN-1; Derby allows 128) */
  def maxIdentifierLength: Int

  def checkIdentifier(id: String): Unit =
    require(id.length <= maxIdentifierLength,
      s"identifier '$id' exceeds $name's $maxIdentifierLength-char limit")

  /** `FROM` clause for a one-row SELECT of scalar subqueries (the
    * server-side consolidated conflict check). Postgres/SQLite allow a
    * FROM-less SELECT; Derby needs its dummy table. */
  def dualFrom: String = ""

  /** top-1 clause: ANSI `FETCH FIRST` on Derby/Postgres; SQLite only
    * speaks `LIMIT` (reference sqlite manager generates LIMIT SQL). */
  def limit1: String = "FETCH FIRST 1 ROWS ONLY"
}

case object DerbyDialect extends CatalogDialect {
  val name = "derby"
  // Derby: PK/unique violation 23…, serialization 40001, lock timeouts and
  // Derby-internal deadlock states XJ…/40XL…
  def isConflictState(st: String): Boolean =
    st.startsWith("23") || st == "40001" || st.startsWith("XJ") ||
      st.startsWith("40XL")
  val maxIdentifierLength = 128
  override def dualFrom: String = " FROM SYSIBM.SYSDUMMY1"
}

case object PostgresDialect extends CatalogDialect {
  val name = "postgres"
  /** Postgres spells DOUBLE as DOUBLE PRECISION; everything else in the
    * catalog schema (BIGINT/VARCHAR/BOOLEAN) is shared. */
  override def ddl(stmt: String): String =
    stmt.replaceAll("\\bDOUBLE\\b(?! PRECISION)", "DOUBLE PRECISION")
  // unique violation 23505 (and friends), serialization_failure 40001,
  // deadlock_detected 40P01
  def isConflictState(st: String): Boolean =
    st.startsWith("23") || st == "40001" || st == "40P01"
  val maxIdentifierLength = 63 // NAMEDATALEN - 1
}

case object SqliteDialect extends CatalogDialect {
  val name = "sqlite"
  // SQLite JDBC reports SQLITE_BUSY/SQLITE_CONSTRAINT through generic
  // states; retry on constraint (23…) and the xerial driver's busy code
  def isConflictState(st: String): Boolean =
    st.startsWith("23") || st == "40001" || st == "5" || st == "6"
  val maxIdentifierLength = 255
  override def limit1: String = "LIMIT 1"
}

object CatalogDialect {
  /** dialect by JDBC URL scheme (reference picks the manager from the
    * ATTACH metadata backend) */
  def forUrl(jdbcUrl: String): CatalogDialect =
    if (jdbcUrl.startsWith("jdbc:postgresql:")) PostgresDialect
    else if (jdbcUrl.startsWith("jdbc:sqlite:")) SqliteDialect
    else if (jdbcUrl.startsWith("http://") ||
      jdbcUrl.startsWith("https://"))
      // HTTP catalog transport: the service's URL advertises its backing
      // store so DDL spelling / conflict SQLSTATEs match the remote end
      "dialect=(\\w+)".r.findFirstMatchIn(jdbcUrl).map(_.group(1)) match {
        case Some("postgres") => PostgresDialect
        case Some("sqlite") => SqliteDialect
        case _ => DerbyDialect
      }
    else DerbyDialect
}
