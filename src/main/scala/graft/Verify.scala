package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (local iteration)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // SQL-transparent lake access (no-op for non-lake queries): lets
      // lake_sql_ctas run CREATE TABLE AS / DROP TABLE via plain spark.sql
      .config("spark.sql.catalog.graft", "graft.sources.GraftTableCatalog")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.currentTimeMillis()
    val perQueryMs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val q0 = System.currentTimeMillis()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        perQueryMs(name) = System.currentTimeMillis() - q0
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // provenance: timestamp + git SHA + per-query wall — distinguishes a
    // real re-run from a stale copy of an earlier round's artifact
    val sha = try scala.sys.process.Process(
      Seq("git", "rev-parse", "HEAD"), new java.io.File(".")).!!.trim
    catch { case _: Throwable => "unknown" }
    Files.writeString(Paths.get(s"$outDir/run_info.json"),
      s"""{"run_at_ms":$t0,"finished_at_ms":${System.currentTimeMillis()},""" +
        s""""git_sha":"$sha","sf_dir":"$sfDir","queries_run":${perQueryMs.size},""" +
        perQueryMs.map { case (k, v) => "\"" + k + "\":" + v }
          .mkString(""""query_wall_ms":{""", ",", "}}"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
