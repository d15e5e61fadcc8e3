package graft.influxql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.storage.TxLogTable
import InfluxQL.{tokenize, P}

/** The continuous-query REGISTRY — the management half of InfluxDB's CQ
  * surface ([[InfluxQL.startContinuousQuery]] is the execution half):
  *
  *   CREATE CONTINUOUS QUERY <name> ON <db>
  *     [RESAMPLE [EVERY <dur>] [FOR <dur>]] BEGIN <select INTO ...> END
  *   SHOW CONTINUOUS QUERIES                      (db, name, query)
  *   DROP CONTINUOUS QUERY <name> ON <db>
  *
  * Definitions persist in a control-plane [[TxLogTable]] at
  * `<root>/_continuous_queries` (rows = number of CQs), so they survive
  * restarts the way InfluxDB's meta store does; [[startAll]] turns every
  * registered definition for a db into its running watermarked stream —
  * the restart path a deployment calls after [[graft.ServiceMain]]-style
  * startup. Semantics follow InfluxDB 1.x: CREATE validates the inner
  * SELECT (must have INTO and GROUP BY time) and fails on a duplicate
  * name; DROP fails on a missing one.
  */
object ContinuousQueries {

  private def table(spark: SparkSession, root: String) =
    new TxLogTable(spark, s"$root/_continuous_queries")

  private def defs(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val t = table(spark, root)
    if (t.version.isEmpty) Seq.empty[(String, String, String)].toDF("db", "name", "query")
    else t.read()
  }

  /** SHOW shape: (db, name, query) ordered by (db, name). */
  def show(spark: SparkSession, root: String): DataFrame =
    defs(spark, root).select("db", "name", "query").orderBy("db", "name")

  /** INTO target of one registered CQ definition (its stored DDL text).
    * Registered defs always parse (CREATE validated them), but a row
    * hand-edited into the registry degrades to None rather than wedging
    * every write that consults the target set.
    */
  private[influxql] def targetOf(ddl: String): Option[String] =
    try {
      val p = new P(tokenize(ddl))
      while (!p.done && !p.kw("BEGIN")) p.next()
      if (p.done) None else InfluxQL.parseQuery(p).into.filter(_ != ":MEASUREMENT")
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Cheap no-CQs fast path: a pure commit-log file probe, no Spark job —
    * what keeps the write faces' per-request sole-writer consult free on
    * deployments that registered no continuous queries at all.
    */
  def anyDefined(spark: SparkSession, root: String): Boolean =
    table(spark, root).version.isDefined

  // version-keyed target cache: the write faces consult cqTargets on EVERY
  // append (including every UDP flush), and the registry only changes on
  // CREATE/DROP — so the parsed target set is cached per (root, db) keyed
  // on the registry table's commit version PLUS its log incarnation (the
  // earliest commit file's inode): a registry dir removed and recreated at
  // the same path restarts version numbering, and a bare version match
  // would then serve a stale target set past the sole-writer refusal.
  // Steady state pays one commit-log list + one stat + a map lookup, never
  // a Spark collect — even on a deployment whose LAST CQ was dropped (the
  // registry table stays committed forever, so anyDefined alone cannot
  // restore the free path). Invalidation is automatic: CREATE/DROP commit
  // a new version and the cached key mismatches. Bounded: one entry per
  // live (root, db) pair, pinned control-plane small.
  private val targetCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), ((Long, Option[String]), Set[String])]()

  /** The registered CQ target measurements of `db` — the tables the
    * sole-writer contract reserves for their CQs. The fill frontier's
    * dense-grid invariant (every (series, bucket) cell of the committed
    * range present — what seeds LOCF carries and linear's donor runs)
    * only holds while the CQ is its target's sole content writer, so the
    * write faces consult this set and REFUSE external appends into it.
    * Control-plane sized: one bounded registry read on a version change,
    * a commit-log file probe + map hit otherwise.
    */
  def cqTargets(spark: SparkSession, root: String, db: String): Set[String] = {
    val t = table(spark, root)
    t.version match {
      case None => Set.empty
      case Some(v) =>
        val key =
          (java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString, db)
        val stamp = (v, t.incarnation)
        val cached = targetCache.get(key)
        if (cached != null && cached._1 == stamp) cached._2
        else {
          import spark.implicits._
          val targets = t.read().filter(col("db") === db)
            .select("query").as[String].collect().flatMap(targetOf).toSet
          targetCache.put(key, (stamp, targets))
          targets
        }
    }
  }

  /** Parse + execute one CQ management statement; every form returns the
    * refreshed SHOW CONTINUOUS QUERIES surface.
    */
  def run(spark: SparkSession, root: String, text: String,
          requireDb: String => Unit = null): DataFrame = {
    import spark.implicits._
    val p = new P(tokenize(text))
    if (p.kw("SHOW")) {
      p.expectKw("CONTINUOUS"); p.expectKw("QUERIES")
      if (!p.done) p.fail(s"trailing input from '${p.next().raw}'")
      return show(spark, root)
    }
    val create = p.kw("CREATE")
    if (!create && !p.kw("DROP"))
      p.fail("expected CREATE, DROP or SHOW CONTINUOUS QUER...")
    p.expectKw("CONTINUOUS"); p.expectKw("QUERY")
    val name = p.ident()
    p.expectKw("ON")
    val db = p.ident()
    if (requireDb != null) requireDb(db)
    val exists = defs(spark, root)
      .filter(col("db") === db && col("name") === name).limit(1).count() > 0
    if (!create) {
      if (!p.done) p.fail(s"trailing input from '${p.next().raw}'")
      if (!exists) throw new IllegalArgumentException(
        s"InfluxQL: continuous query not found: $name on $db")
      table(spark, root).delete(col("db") === db && col("name") === name)
      return show(spark, root)
    }
    val rs = InfluxQL.parseResample(p)
    p.expectKw("BEGIN")
    val q = InfluxQL.parseQuery(p)
    p.expectKw("END")
    if (!p.done) p.fail(s"trailing input from '${p.next().raw}'")
    // validate what the execution half will need, at DDL time — a CQ that
    // can never start must fail at CREATE, not at restart
    if (q.into.isEmpty) p.fail("continuous query needs SELECT ... INTO")
    if (q.into.contains(":MEASUREMENT"))
      p.fail("continuous queries need a named INTO target, not :MEASUREMENT")
    if (q.groupTimeUs.isEmpty) p.fail("continuous query needs GROUP BY time(d)")
    // top()/bottom() return original POINTS, not bucket aggregates — the
    // streaming MERGE sink is keyed on (bucket time, tags), which a
    // point-shaped result cannot ride; loud at CREATE, never at restart
    if (q.fields.exists(_.calls.exists(f => InfluxQL.TopBottomFuncs.contains(f.func))))
      p.fail("continuous queries aggregate buckets — top()/bottom() return " +
        "original points; run them as batch SELECT ... INTO instead")
    // selector companions (max(value), tag — r17) are point-shaped too:
    // the fill frontier's dense-grid contract has no cell for them, loud
    // at CREATE exactly like top/bottom
    if (InfluxQL.selectorCompanion(q).nonEmpty)
      p.fail("continuous queries aggregate buckets — selector companion " +
        "columns return point values the keyed MERGE cannot maintain; run " +
        "them as batch SELECT ... INTO instead")
    // every fill mode densifies at emission (linear retroactively,
    // through the keyed MERGE) — nothing left to reject here
    InfluxQL.validateResample(p, rs, q)
    if (exists) throw new IllegalArgumentException(
      s"InfluxQL: continuous query already exists: $name on $db")
    // sole-writer contract, enforced at DDL time (a CQ that could never
    // hold its fill invariant must fail at CREATE): the raw points table
    // belongs to the write faces — a CQ merging into it would both break
    // its own dense-grid frontier under every external write AND flip the
    // table merge-maintained, refusing the ingest path's appends; and a
    // SECOND CQ on the same target is just another external writer from
    // the first one's point of view
    val target = q.into.get
    if (target == "points")
      p.fail("a continuous query cannot target the raw 'points' measurement" +
        " — the write faces own it and would break the CQ's fill invariant")
    if (cqTargets(spark, root, db).contains(target))
      throw new IllegalArgumentException(
        s"InfluxQL: continuous query target $target on $db already belongs " +
          "to another continuous query (CQ targets have exactly one writer)")
    table(spark, root).append(
      Seq((db, name, text.trim)).toDF("db", "name", "query"))
    show(spark, root)
  }

  /** Start every registered CQ for `db` as its watermarked streaming MERGE
    * (checkpoint per CQ under `<root>/_checkpoints/cq_<db>_<name>`, so a
    * restart resumes each stream exactly-once). Returns (name, query)
    * handles; callers own stopping them.
    */
  def startAll(spark: SparkSession, root: String, db: String,
               streamPoints: DataFrame, lateness: String = "1 minute",
               trigger: Trigger = Trigger.AvailableNow()): Seq[(String, StreamingQuery)] = {
    import spark.implicits._
    defs(spark, root).filter(col("db") === db)
      .select("name", "query").as[(String, String)].collect().toSeq
      .sortBy(_._1)
      .map { case (name, ddl) =>
        name -> InfluxQL.startContinuousQuery(streamPoints, ddl, root,
          checkpoint = s"$root/_checkpoints/cq_${db}_$name",
          lateness = lateness, trigger = trigger)
      }
  }
}
