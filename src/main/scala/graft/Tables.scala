package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file per table under the sf dir.
  */
final case class Tables(spark: SparkSession, sfDir: String) {
  /** `lake:<catalogUrl>|<dataPath>` dirs read through an attached lake's
    * scan path (multi-file list from the catalog, delete application,
    * schema-epoch mapping) instead of raw parquet — the SAME query
    * definitions then measure/verify the lake read path end to end. */
  private def lakeMode: Boolean = sfDir.startsWith("lake:")

  /** `spj:<catalogUrl>|<dataPath>`: like `lake:`, but tables bucketed on
    * a single key read through the DSv2 storage-partitioned scan
    * ([[graft.sources.GraftBucketedScan]] via a `spj = true` catalog) so
    * co-bucketed joins plan with zero exchange; unbucketed tables fall
    * back to the generic lake scan. */
  private def spjMode: Boolean = sfDir.startsWith("spj:")

  private def t(name: String): DataFrame = {
    if (spjMode) return Tables.spjTable(spark, sfDir, name)
    if (lakeMode) return Tables.lakeFor(spark, sfDir).table(name)
    val path = s"$sfDir/$name.parquet"
    // Parquet schema inference runs a listing+footer job per read; cache the
    // schema per path so repeated query invocations skip it entirely.
    val schema = Tables.schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Conservative on-disk byte size of a base table: raw mode sums the
    * parquet file sizes on the filesystem; lake/spj modes read the
    * catalog's per-file size metadata. Driver-side either way — no Spark
    * job. Queries use this (via QueryDsl.boundedBroadcast) to gate
    * broadcast hints on the real footprint of the table that BOUNDS a
    * derived relation, because the optimizer's propagated estimate for
    * an aggregate inherits its fact-table input size. Cached per
    * (dir, table) like schemaCache — static testdata metadata, not query
    * results. */
  def bytesOf(name: String): Long =
    Tables.bytesCache.computeIfAbsent(s"$sfDir#$name", { _ =>
      val n: Long =
        if (lakeMode) Tables.lakeFor(spark, sfDir).tableSizeBytes(name)
        else if (spjMode) Tables.spjFor(spark, sfDir)._1.tableSizeBytes(name)
        else {
          val p = java.nio.file.Paths.get(s"$sfDir/$name.parquet")
          if (java.nio.file.Files.isDirectory(p)) {
            val s = java.nio.file.Files.walk(p)
            try s.filter(java.nio.file.Files.isRegularFile(_))
              .mapToLong(java.nio.file.Files.size(_)).sum()
            finally s.close()
          } else java.nio.file.Files.size(p)
        }
      java.lang.Long.valueOf(n)
    }).longValue()

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts is parquet timestamp[us] (no tz annotation). Force a
    * TIMESTAMP (LTZ) read — the micros on disk are taken as UTC instants
    * verbatim, no adjustment — so every downstream `unix_micros` /
    * `date_format` / `window` keeps the exact semantics the oracles were
    * written against (DuckDB reads the same column as TIMESTAMP and
    * `epoch_us` agrees bit-for-bit). */
  def events: DataFrame = {
    // lake tables were ingested from the forced-schema read, so ts is
    // already a proper TIMESTAMP column there
    if (lakeMode || spjMode) return t("events")
    val path = s"$sfDir/events.parquet"
    val inferred = Tables.schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    val schema = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == "ts")
        f.copy(dataType = org.apache.spark.sql.types.TimestampType)
      else f))
    spark.read.schema(schema).parquet(path)
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Filesystem path of the events data for FILE-based streaming sources
    * (readStream.parquet needs a directory of files, not a scan). Raw
    * mode: the testdata file itself. `lake:` mode: the lake table is
    * materialized ONCE per pseudo-dir to a temp parquet dir — the
    * streaming queries' semantics (file landing zone → lake) are
    * unchanged, only the landing zone's origin is. */
  def eventsRawPath: String =
    if (!lakeMode && !spjMode) s"$sfDir/events.parquet"
    else Tables.rawEventsCache.computeIfAbsent(sfDir, { _ =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-events-raw")
        .resolve("events.parquet")
      events.coalesce(1).write.mode("overwrite").parquet(out.toString)
      // a single FILE path, exactly like the raw testdata layout — the
      // streaming queries symlink it into their landing dirs
      val ls = java.nio.file.Files.list(out)
      try ls.filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get().toString
      finally ls.close()
    })
}

object Tables {
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.types.StructType]()

  private val lakeCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.catalog.Lake]()

  private val bytesCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private val rawEventsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Attach (once per JVM) the lake behind a `lake:<catalogUrl>|<dataPath>`
    * pseudo-dir. `<catalogUrl>` is anything Lake.attach accepts (a Derby
    * dir, a jdbc: url, an http:// catalog service). */
  private[graft] def lakeFor(spark: SparkSession,
      lakeDir: String): graft.catalog.Lake =
    lakeCache.computeIfAbsent(lakeDir, { _ =>
      val spec = lakeDir.stripPrefix("lake:")
      val i = spec.lastIndexOf('|')
      require(i > 0, s"expected lake:<catalogUrl>|<dataPath>, got $lakeDir")
      graft.catalog.Lake.attach(spark,
        spec.substring(0, i), spec.substring(i + 1))
    })

  private val spjCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, (graft.catalog.Lake, String)]()

  /** Attach (once per JVM) the lake behind a `spj:` pseudo-dir and wire
    * its `spj = true` DSv2 catalog: LakeRegistry alias + catalog name
    * must DIFFER so reads resolve through V2 instead of the extension
    * placeholder rule. */
  private[graft] def spjFor(spark: SparkSession,
      dir: String): (graft.catalog.Lake, String) =
    spjCache.computeIfAbsent(dir, { _ =>
      val spec = dir.stripPrefix("spj:")
      val i = spec.lastIndexOf('|')
      require(i > 0, s"expected spj:<catalogUrl>|<dataPath>, got $dir")
      val lake = graft.catalog.Lake.attach(spark,
        spec.substring(0, i), spec.substring(i + 1))
      val alias = s"spjb${Integer.toHexString(dir.hashCode)}"
      val cat = s"${alias}c"
      graft.plans.LakeRegistry.register(alias, lake)
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.GraftTableCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.alias", alias)
      spark.conf.set(s"spark.sql.catalog.$cat.spj", "true")
      (lake, cat)
    })

  private[graft] def spjTable(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    val (lake, cat) = spjFor(spark, dir)
    // probe fitness EAGERLY: spjScanInfo throws lazily at scan-build time
    // otherwise, so an unfit layout (pending deletes, inlined rows, old
    // epochs — not just "unbucketed") would fail every query on the table
    // instead of riding the always-correct generic path. A layout change
    // committed AFTER this point no longer invalidates the DataFrame:
    // the DSv2 read pins the snapshot at table resolution
    // (GraftReadableTable), so execution reads the construction-time
    // layout — MVCC reader semantics, not a scan-build crash
    val fit = try { lake.spjScanInfo(name, None); true }
    catch { case _: IllegalStateException => false }
    if (fit) spark.table(s"$cat.$name") else lake.table(name)
  }
}
