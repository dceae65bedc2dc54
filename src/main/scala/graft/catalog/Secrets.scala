package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession

/** Named secrets (reference src/storage/ducklake_secret.cpp +
  * test/sql/secrets/): a DUCKLAKE secret bundles attach parameters
  * (metadata path, data path) so `Lake.attach(spark, "ducklake:name")`
  * works; storage secrets (TYPE S3) bundle object-store credentials that
  * are applied to the Hadoop configuration for their scope before the
  * [[LakeIO]] filesystem is resolved.
  *
  * Secrets live in-process by default; `persistTo(dir)` round-trips them
  * as one properties file per secret (reference persistent secrets dir).
  * Longest-scope-prefix wins when several secrets cover a path, matching
  * the reference's secret-scope resolution.
  */
object Secrets {

  final case class Secret(name: String, secretType: String,
      params: Map[String, String], scope: Seq[String] = Nil)

  private val store =
    new java.util.concurrent.ConcurrentHashMap[String, Secret]()
  @volatile private var persistDir: Option[String] = None

  def create(secret: Secret, orReplace: Boolean = false): Unit = {
    if (!orReplace && store.containsKey(secret.name))
      throw new IllegalArgumentException(
        s"secret ${secret.name} already exists")
    store.put(secret.name, secret)
    persistDir.foreach(write(_, secret))
  }

  def drop(name: String): Unit = {
    store.remove(name)
    persistDir.foreach { d =>
      new LakeIO(d).delete(s"$name.secret"): Unit
    }
  }

  def get(name: String): Option[Secret] = Option(store.get(name))

  /** names only — values are never listed back (reference redaction) */
  def list(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    store.keySet().asScala.toSeq.sorted
  }

  /** All secrets whose scope covers `path`, most specific first. An empty
    * scope matches everything (lowest precedence). */
  def forPath(path: String): Seq[Secret] = {
    import scala.jdk.CollectionConverters._
    store.values().asScala.toSeq
      .map(s => s -> s.scope.filter(path.startsWith).map(_.length).sorted
        .lastOption.getOrElse(if (s.scope.isEmpty) 0 else -1))
      .filter(_._2 >= 0)
      .sortBy(-_._2)
      .map(_._1)
  }

  /** Hadoop configuration entries for the credentials covering `path`
    * (s3 secrets → fs.s3a.* keys; generic secrets pass `hadoop.`-prefixed
    * params through verbatim). */
  def hadoopConfFor(path: String): Map[String, String] =
    forPath(path).reverse.foldLeft(Map.empty[String, String]) { (acc, s) =>
      val mapped = s.secretType.toLowerCase match {
        case "s3" =>
          s.params.flatMap {
            case ("key_id", v) => Some("fs.s3a.access.key" -> v)
            case ("secret", v) => Some("fs.s3a.secret.key" -> v)
            case ("session_token", v) => Some("fs.s3a.session.token" -> v)
            case ("endpoint", v) => Some("fs.s3a.endpoint" -> v)
            case ("region", v) => Some("fs.s3a.endpoint.region" -> v)
            case ("use_ssl", v) =>
              Some("fs.s3a.connection.ssl.enabled" -> v)
            case ("url_style", v) =>
              Some("fs.s3a.path.style.access" ->
                (v == "path").toString)
            case _ => None
          }
        case _ =>
          s.params.collect { case (k, v) if k.startsWith("hadoop.") =>
            k.stripPrefix("hadoop.") -> v
          }
      }
      acc ++ mapped
    }

  /** Apply the credentials covering `path` to the session's Hadoop conf
    * (done by [[Lake.attach]] before the FileSystem is resolved). */
  def applyTo(spark: SparkSession, path: String): Unit =
    hadoopConfFor(path).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }

  /** Persist current + future secrets under `dir` and load any stored
    * there (one properties file per secret). */
  def persistTo(dir: String): Unit = {
    val io = new LakeIO(dir)
    io.mkdirsRoot()
    persistDir = Some(dir)
    io.list("").filter(_.endsWith(".secret")).foreach { f =>
      val props = new java.util.Properties()
      props.load(new java.io.ByteArrayInputStream(io.readAllBytes(f)))
      import scala.jdk.CollectionConverters._
      val kv = props.asScala.toMap
      val name = f.stripSuffix(".secret")
      store.putIfAbsent(name, Secret(name,
        kv.getOrElse("__type", "generic"),
        kv.view.filterKeys(k => !k.startsWith("__")).toMap,
        kv.get("__scope").toSeq.flatMap(_.split(';')).filter(_.nonEmpty)))
    }
  }

  private def write(dir: String, s: Secret): Unit = {
    val props = new java.util.Properties()
    s.params.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("__type", s.secretType)
    props.setProperty("__scope", s.scope.mkString(";"))
    val bos = new java.io.ByteArrayOutputStream()
    props.store(bos, null)
    new LakeIO(dir).write(s"${s.name}.secret",
      bos.toString(StandardCharsets.UTF_8.name())
        .getBytes(StandardCharsets.UTF_8))
  }

  /** test hook */
  private[graft] def reset(): Unit = { store.clear(); persistDir = None }
}
