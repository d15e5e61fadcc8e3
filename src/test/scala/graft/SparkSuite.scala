package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (lazy). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.builder("graft-test", cores = "4").master("local[4]").getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  /** The checked-in TLS test identity (`mqtt-test-keystore.p12`, alias
    * `mqtt`, password `graft-test`) exported as the combined PEM form the
    * HTTPS config consumes (certificate + PKCS#8 private key in one file,
    * InfluxDB's https-certificate convention). Returns the temp file path.
    * The matching client trust anchor is the `/mqtt-test-ca.pem` resource.
    */
  def exportCombinedTlsPem(): java.nio.file.Path = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    ks.load(getClass.getResourceAsStream("/mqtt-test-keystore.p12"),
      "graft-test".toCharArray)
    def pem(header: String, der: Array[Byte]): String =
      s"-----BEGIN $header-----\n" +
        java.util.Base64.getMimeEncoder(64, "\n".getBytes).encodeToString(der) +
        s"\n-----END $header-----\n"
    val combined = java.nio.file.Files.createTempFile("graft-tls", ".pem")
    java.nio.file.Files.write(combined,
      (pem("CERTIFICATE", ks.getCertificate("mqtt").getEncoded) +
        pem("PRIVATE KEY", ks.getKey("mqtt", "graft-test".toCharArray).getEncoded))
        .getBytes("UTF-8"))
    combined
  }

  /** The client half of [[exportCombinedTlsPem]]: the CA pem resource
    * copied to a temp file for `GraftConfig.sslContextFromCaFile`.
    */
  def exportCaPem(): java.nio.file.Path = {
    val caPem = java.nio.file.Files.createTempFile("graft-ca", ".pem")
    java.nio.file.Files.copy(getClass.getResourceAsStream("/mqtt-test-ca.pem"),
      caPem, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    caPem
  }

  /** Run `body` with SQL confs set, restoring prior values afterwards. */
  def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
