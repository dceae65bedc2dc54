package graft

import java.nio.file.Files

import graft.catalog._
import org.scalatest.funsuite.AnyFunSuite

/** Secrets (reference src/storage/ducklake_secret.cpp +
  * test/sql/secrets/): attach-by-secret, scoped storage credentials
  * mapped onto the Hadoop conf, persistence round-trip. */
class SecretsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("attach through a DUCKLAKE secret") {
    Secrets.reset()
    val dir = Files.createTempDirectory("graftsec").toString
    Secrets.create(Secrets.Secret("mylake", "ducklake", Map(
      "metadata_path" -> s"$dir/cat", "data_path" -> s"$dir/data")))
    val lake = Lake.attach(spark, "ducklake:mylake")
    lake.createTableAs("t", Seq(1L, 2L).toDF("id"))
    assert(lake.table("t").count() == 2)
    intercept[IllegalArgumentException](Lake.attach(spark, "ducklake:nope"))
    // secret values never list back; names do
    assert(Secrets.list() == Seq("mylake"))
  }

  test("s3 credentials resolve by scope, longest prefix wins") {
    Secrets.reset()
    Secrets.create(Secrets.Secret("global", "s3",
      Map("key_id" -> "AK_GLOBAL", "secret" -> "SK_GLOBAL")))
    Secrets.create(Secrets.Secret("bucket", "s3",
      Map("key_id" -> "AK_BUCKET", "secret" -> "SK_BUCKET",
        "endpoint" -> "minio:9000", "url_style" -> "path",
        "use_ssl" -> "false"),
      scope = Seq("s3a://lake-bucket/")))
    val conf = Secrets.hadoopConfFor("s3a://lake-bucket/warehouse")
    assert(conf("fs.s3a.access.key") == "AK_BUCKET") // scope beats global
    assert(conf("fs.s3a.endpoint") == "minio:9000")
    assert(conf("fs.s3a.path.style.access") == "true")
    assert(conf("fs.s3a.connection.ssl.enabled") == "false")
    val other = Secrets.hadoopConfFor("s3a://other-bucket/x")
    assert(other("fs.s3a.access.key") == "AK_GLOBAL") // fallback
    // create-or-replace + drop
    intercept[IllegalArgumentException](Secrets.create(
      Secrets.Secret("global", "s3", Map("key_id" -> "X"))))
    Secrets.create(Secrets.Secret("global", "s3",
      Map("key_id" -> "AK2", "secret" -> "SK2")), orReplace = true)
    Secrets.drop("bucket")
    assert(Secrets.hadoopConfFor("s3a://lake-bucket/warehouse")(
      "fs.s3a.access.key") == "AK2")
  }

  test("CREATE/DROP SECRET through the SQL surface") {
    Secrets.reset()
    val dir = Files.createTempDirectory("graftsecsql").toString
    val lake = Lake.attach(spark, s"$dir/cat", s"$dir/data")
    lake.sql("""CREATE SECRET minio (TYPE S3, KEY_ID 'ak', SECRET 'sk',
      |ENDPOINT 'minio:9000', SCOPE 's3a://b/')""".stripMargin)
    val s = Secrets.get("minio").get
    assert(s.secretType == "S3" || s.secretType == "s3")
    assert(s.params("key_id") == "ak" && s.scope == Seq("s3a://b/"))
    assert(Secrets.hadoopConfFor("s3a://b/x")("fs.s3a.endpoint")
      == "minio:9000")
    // no duplicate without OR REPLACE; replace updates
    intercept[IllegalArgumentException](
      lake.sql("CREATE SECRET minio (TYPE S3, KEY_ID 'x')"))
    lake.sql("CREATE OR REPLACE SECRET minio (TYPE S3, KEY_ID 'ak2', SECRET 'sk2')")
    assert(Secrets.get("minio").get.params("key_id") == "ak2")
    lake.sql("DROP SECRET minio")
    assert(Secrets.get("minio").isEmpty)
    Secrets.reset()
  }

  test("secrets persist and load from a directory") {
    Secrets.reset()
    val dir = Files.createTempDirectory("graftsecp").toString
    Secrets.persistTo(dir)
    Secrets.create(Secrets.Secret("p1", "s3",
      Map("key_id" -> "AK", "secret" -> "SK"),
      scope = Seq("s3a://b/")))
    // a fresh process (simulated by reset) reloads from the dir
    Secrets.reset()
    Secrets.persistTo(dir)
    val s = Secrets.get("p1").get
    assert(s.secretType == "s3")
    assert(s.params("key_id") == "AK")
    assert(s.scope == Seq("s3a://b/"))
    Secrets.reset()
  }
}
