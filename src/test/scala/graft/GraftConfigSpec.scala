package graft

class GraftConfigSpec extends SparkSuite {

  private val ini =
    """# graft service config
      |[DEFAULT]
      |log_verbosity=4
      |log_file=/tmp/graft.log
      |
      |client_id = graft_service
      |rest_url=http://rest:10010/api
      |; semicolon comment
      |mqtt_broker=mosquitto
      |mqtt_broker_port=1883
      |spark.sql.shuffle.partitions=16
      |spark.sql.adaptive.enabled=false
      |
      |[Sink]
      |Path=/data/points
      |""".stripMargin

  test("INI scan: DEFAULT flat, sections prefixed, comments skipped, keys normalized") {
    val c = GraftConfig.parseIni(ini)
    assert(c("log_verbosity") == "4")
    assert(c("client_id") == "graft_service") // trailing spaces trimmed
    assert(c("rest_url") == "http://rest:10010/api")
    assert(c("spark.sql.shuffle.partitions") == "16") // spark keys keep case
    assert(c("sink.path") == "/data/points") // section + key lower-cased
    assert(!c.contains("semicolon comment"))
  }

  test("verbosity scale matches the reference's (6 - v) * 10 mapping") {
    assert(Seq(1, 2, 3, 4, 5, 6).map(GraftConfig.verbosityToLevel) ==
      Seq("FATAL", "ERROR", "WARN", "INFO", "DEBUG", "TRACE"))
  }

  test("configureLogging applies the configured level to the live session") {
    GraftConfig.configureLogging(spark, Map("log_verbosity" -> "3"))
    val lvl = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger].getLevel.toString
    assert(lvl == "WARN")
  }

  test("config file roundtrip via a temp file") {
    val f = java.nio.file.Files.createTempFile("graft", ".conf")
    java.nio.file.Files.write(f, ini.getBytes("UTF-8"))
    val c = GraftConfig.load(f.toString)
    assert(c("mqtt_broker_port") == "1883")
  }
}
