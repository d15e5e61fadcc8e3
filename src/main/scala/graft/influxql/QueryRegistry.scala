package graft.influxql

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped running-statement registry backing the InfluxQL
  * operational statements (InfluxDB 1.x query management,
  * `SHOW QUERIES` / `KILL QUERY <qid>` — the admin surface an operator
  * reaches for when an expensive scan needs inspecting or stopping).
  *
  * Every tracked statement runs inside a Spark job group named
  * `influxql-<qid>` with `interruptOnCancel = true`, so KILL QUERY maps
  * directly onto [[org.apache.spark.SparkContext.cancelJobGroup]] — the
  * engine-native cancellation that reaches every running task of the
  * statement on a real cluster exactly as on local mode (job groups are
  * thread-local on the driver, so concurrent statements from different
  * threads never collide). The registry itself is driver-side state
  * bounded by the number of concurrently RUNNING statements — control
  * plane, never data.
  */
final class QueryRegistry {
  import QueryRegistry.Running

  private val nextId = new AtomicLong(0L)
  private val running = new ConcurrentHashMap[Long, Running]()

  /** The job group a tracked statement's Spark jobs run under. */
  def groupId(qid: Long): String = s"influxql-$qid"

  /** Monitoring gauges (the /debug/vars queryExecutor block): statements
    * currently inside their execution window, and ever started.
    */
  def runningCount: Int = running.size
  def startedCount: Long = nextId.get()

  /** Run `body` as a registered statement: visible to SHOW QUERIES while
    * it executes, cancellable by KILL QUERY, deregistered on every exit
    * path. The body must EXECUTE the statement (e.g. collect) in this
    * thread for the job-group mapping to hold.
    */
  def track[T](spark: SparkSession, text: String, db: String)(body: => T): T = {
    val qid = nextId.incrementAndGet()
    val sc = spark.sparkContext
    running.put(qid, Running(qid, text, db, System.nanoTime()))
    sc.setJobGroup(groupId(qid), text, interruptOnCancel = true)
    try body
    finally {
      sc.clearJobGroup()
      running.remove(qid)
    }
  }

  /** `SHOW QUERIES` — the currently running tracked statements in SHOW
    * shape: (qid, query, database, duration_us), ordered by qid.
    */
  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val now = System.nanoTime()
    running.values.asScala.toSeq.sortBy(_.qid)
      .map(r => (r.qid, r.query, r.db, (now - r.startNanos) / 1000L))
      .toDF("qid", "query", "database", "duration_us")
  }

  /** `KILL QUERY <qid>` — cancel the statement's job group. Fails loudly
    * on an unknown/finished qid, like InfluxDB's ERR_NO_SUCH_QUERY.
    */
  def kill(spark: SparkSession, qid: Long): Unit = {
    if (!running.containsKey(qid)) throw new IllegalArgumentException(
      s"InfluxQL KILL QUERY: no such query id: $qid")
    spark.sparkContext.cancelJobGroup(groupId(qid))
  }
}

private[influxql] object QueryRegistry {
  /** One running statement's registry row (driver-side only, never an
    * encoder schema — listings project to plain tuples).
    */
  final case class Running(qid: Long, query: String, db: String,
                           startNanos: Long)
}
