package graft.influxql

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One parsed line-protocol point, fields exploded to the engine's
  * tri-column value variant (exactly one of num/bool/str non-null — the
  * same discipline as Ingest.inferTypes). Top-level public for the
  * product encoder.
  */
case class LpPoint(measurement: String, tags: Map[String, String],
                   field: String, num: Option[Double], bool: Option[Boolean],
                   str: Option[String], ts_ns: Option[Long])

/** A line that failed to parse, kept replayable (the dead-letter
  * discipline of the MQTT ingest path).
  */
case class LpError(line: String, error: String)

/** [[InfluxCatalog.writeLineProtocol]]'s full accounting: the committed
  * version, the malformed lines (parse failures → the caller's 400s), and
  * the well-formed points the narrow layout cannot hold (string field or
  * device-less → the caller's dead letters). Every input line lands in
  * exactly one of {appended, errors, dropped}.
  */
case class LpWriteResult(version: Long, errors: Dataset[LpError],
                         dropped: Dataset[LpPoint])

/** InfluxDB line protocol — the wire format every InfluxDB client
  * (including the reference service's influxdb-python, which renders it
  * under `write_points`, influx_service.py:230) actually sends:
  *
  *   measurement[,tag=v[,tag=v...]] field=value[,field=value...] [ts_ns]
  *
  * Full 1.x escaping rules: `\,` `\ ` in measurements; `\,` `\=` `\ ` in
  * tag keys/values and field keys; string field values in double quotes
  * with `\"` and `\\`; field value types float (default), integer
  * (`42i`), boolean (t/T/true/True/TRUE and the f counterparts), string.
  * Timestamps are nanoseconds. A `#` first character comments the line
  * out; blank lines skip.
  *
  * [[parse]] is map-only (one `flatMap` per partition — the codec-seam
  * pattern: byte-level grammar a Catalyst expression can't express), so
  * it scales with the write path; malformed lines surface through
  * [[errors]] instead of failing the batch.
  */
object LineProtocol {

  /** Largest long magnitude a double represents exactly (2^53). */
  val MaxExactLong: Long = 1L << 53

  /** Largest raw wire-timestamp magnitude that precision `tsUnitNs` can
    * scale to the engine's µs without overflowing Long. Beyond it the
    * `ts_ns * N` scaling would silently WRAP into a garbage (often
    * negative) epoch and commit it — InfluxDB 400s out-of-range
    * timestamps instead, and so does this engine: offenders route into
    * [[errors]] (the caller's partial-write 400), never into the table.
    */
  def maxRawTs(tsUnitNs: Long): Long =
    if (tsUnitNs >= 1000L) Long.MaxValue / (tsUnitNs / 1000L) else Long.MaxValue

  private def tsOutOfRange(p: LpPoint, tsUnitNs: Long): Boolean = {
    val lim = maxRawTs(tsUnitNs)
    p.ts_ns.exists(t => t < -lim || t > lim)
  }

  /** The line-protocol type class of one parsed point — the classes the
    * engine's tri-column value variant distinguishes. Integer literals
    * (`42i`) fold into `float` DELIBERATELY: the narrow layout stores one
    * double value column (±2^53 exactness guarded at parse), so int-vs-
    * float is a single storage type here, not the separate 1.x conflict
    * it is upstream (documented divergence; everything else follows
    * InfluxDB's first-write-fixes-the-type rule).
    */
  def fieldTypeOf(p: LpPoint): String =
    if (p.str.nonEmpty) "string" else if (p.bool.nonEmpty) "boolean" else "float"

  /** The first point of a line whose type disagrees with the registered
    * type of its (measurement, field), paired with the registered type —
    * InfluxDB 1.x's field type conflict. A conflicted LINE contributes
    * nothing to the table: errors / narrowPoints / narrowDropped all key
    * on the same per-line verdict so the exactly-once partition of input
    * lines holds.
    */
  private def lineConflict(pts: Seq[LpPoint],
                           types: Map[(String, String), String]): Option[(LpPoint, String)] =
    pts.iterator.flatMap { p =>
      types.get((p.measurement, p.field))
        .filter(_ != fieldTypeOf(p)).map(exp => (p, exp))
    }.nextOption()

  private def conflictError(l: String, p: LpPoint, expected: String): LpError =
    LpError(l, s"""field type conflict: input field "${p.field}" on """ +
      s"""measurement "${p.measurement}" is type ${fieldTypeOf(p)}, """ +
      s"already exists as type $expected")

  /** First-seen type per (measurement, field) across a batch, in INPUT
    * order, for fields `known` has not registered yet — the type each
    * unseen field's first write this batch fixes (InfluxDB 1.x: a field's
    * type is set by its first write and every later write must match).
    * Input order rides `monotonically_increasing_id` (partition-major =
    * the order the request body's lines were read in). Lines that are
    * malformed, out of timestamp range, or already conflicting with
    * `known` register nothing; a line rejected for an INTRA-batch conflict
    * still registers its other fields' types (InfluxDB resolves strictly
    * line-by-line; this engine resolves a request in two phases —
    * persisted registry first, then batch-internal first-seen — a
    * documented corner divergence). Output is schema-sized (distinct
    * (measurement, field) pairs), safe to collect.
    */
  def firstSeenTypes(lines: Dataset[String],
                     known: Map[(String, String), String],
                     tsUnitNs: Long = 1L): Map[(String, String), String] = {
    import lines.sparkSession.implicits._
    lines.toDF("line").withColumn("idx", monotonically_increasing_id())
      .as[(String, Long)]
      .flatMap { case (l, idx) =>
        parseLine(l) match {
          case Right(pts) if !pts.exists(tsOutOfRange(_, tsUnitNs)) &&
              lineConflict(pts, known).isEmpty =>
            pts.collect {
              case p if !known.contains((p.measurement, p.field)) =>
                (p.measurement, p.field, fieldTypeOf(p), idx)
            }
          case _ => Nil
        }
      }
      .toDF("measurement", "field", "ftype", "idx")
      .groupBy(col("measurement"), col("field"))
      .agg(min_by(col("ftype"), col("idx")).as("ftype"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
  }

  /** Parse one line into its exploded field points.
    * Left = parse error message.
    */
  def parseLine(line: String): Either[String, Seq[LpPoint]] = {
    val s = line
    var i = 0
    def err(m: String) = Left(s"$m at ${i} in line")
    if (s.isEmpty || s.charAt(0) == '#') return Right(Nil)
    // --- measurement (escapes: \, and \space) --------------------------
    val meas = new StringBuilder
    while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != ' ') {
      if (s.charAt(i) == '\\' && i + 1 < s.length &&
          (s.charAt(i + 1) == ',' || s.charAt(i + 1) == ' ')) {
        meas += s.charAt(i + 1); i += 2
      } else { meas += s.charAt(i); i += 1 }
    }
    if (meas.isEmpty) return err("empty measurement")
    // --- tags (escapes: \, \= \space in keys and values) ---------------
    def ident(stopEq: Boolean): String = {
      val b = new StringBuilder
      while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != ' ' &&
             (!stopEq || s.charAt(i) != '=')) {
        if (s.charAt(i) == '\\' && i + 1 < s.length &&
            ",= ".indexOf(s.charAt(i + 1)) >= 0) {
          b += s.charAt(i + 1); i += 2
        } else { b += s.charAt(i); i += 1 }
      }
      b.result()
    }
    var tags = Map.empty[String, String]
    while (i < s.length && s.charAt(i) == ',') {
      i += 1
      val k = ident(stopEq = true)
      if (k.isEmpty) return err("empty tag key")
      if (i >= s.length || s.charAt(i) != '=') return err(s"tag '$k' needs =value")
      i += 1
      val v = ident(stopEq = true)
      if (v.isEmpty) return err(s"empty value for tag '$k'")
      if (tags.contains(k)) return err(s"duplicate tag key '$k'")
      tags += (k -> v)
    }
    if (i >= s.length || s.charAt(i) != ' ') return err("expected space before fields")
    while (i < s.length && s.charAt(i) == ' ') i += 1
    // --- fields ---------------------------------------------------------
    var fields = Vector.empty[(String, Option[Double], Option[Boolean], Option[String])]
    var more = true
    while (more) {
      val k = ident(stopEq = true)
      if (k.isEmpty) return err("empty field key")
      if (i >= s.length || s.charAt(i) != '=') return err(s"field '$k' needs =value")
      i += 1
      if (i >= s.length) return err(s"field '$k' has no value")
      val fv: Either[String, (Option[Double], Option[Boolean], Option[String])] =
        if (s.charAt(i) == '"') {
          // string value: \" and \\ escapes, anything else literal
          i += 1
          val b = new StringBuilder
          var closed = false
          while (i < s.length && !closed) {
            val c = s.charAt(i)
            if (c == '\\' && i + 1 < s.length &&
                (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\')) {
              b += s.charAt(i + 1); i += 2
            } else if (c == '"') { closed = true; i += 1 }
            else { b += c; i += 1 }
          }
          if (!closed) Left("unterminated string value")
          else Right((None, None, Some(b.result())))
        } else {
          val start = i
          while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != ' ') i += 1
          val raw = s.substring(start, i)
          raw match {
            case "t" | "T" | "true" | "True" | "TRUE" => Right((None, Some(true), None))
            case "f" | "F" | "false" | "False" | "FALSE" => Right((None, Some(false), None))
            case r if r.endsWith("i") =>
              try {
                val l = r.dropRight(1).toLong
                // The engine's value column is a double; InfluxDB stores
                // int64 exactly. Inside ±2^53 the conversion is lossless;
                // beyond it, toDouble silently rounds — fail loudly into
                // errors() instead (the caller's 400).
                if (math.abs(l) > MaxExactLong)
                  Left(s"integer '$r' outside ±2^53 (exact double range)")
                else Right((Some(l.toDouble), None, None))
              } catch { case _: NumberFormatException => Left(s"bad integer '$r'") }
            case r =>
              try Right((Some(r.toDouble), None, None))
              catch { case _: NumberFormatException => Left(s"bad value '$r'") }
          }
        }
      fv match {
        case Left(m) => return Left(m)
        case Right((n, bo, st)) =>
          if (fields.exists(_._1 == k)) return err(s"duplicate field key '$k'")
          fields :+= ((k, n, bo, st))
      }
      if (i < s.length && s.charAt(i) == ',') { i += 1 }
      else more = false
    }
    // --- optional nanosecond timestamp ---------------------------------
    var ts: Option[Long] = None
    if (i < s.length) {
      if (s.charAt(i) != ' ') return err("expected space before timestamp")
      while (i < s.length && s.charAt(i) == ' ') i += 1
      if (i < s.length) {
        val raw = s.substring(i).trim
        try ts = Some(raw.toLong)
        catch { case _: NumberFormatException => return Left(s"bad timestamp '$raw'") }
      }
    }
    Right(fields.map { case (k, n, bo, st) =>
      LpPoint(meas.result(), tags, k, n, bo, st, ts)
    })
  }

  /** Render one point back to line protocol (the inverse of [[parseLine]]
    * for a single-field point; [[Subscriptions.lineProtocol]] is the
    * narrow-layout fast path). Used by the roundtrip property tests.
    */
  def render(p: LpPoint): String = {
    // 1.x rule: backslash is NOT itself escaped in identifiers (only in
    // string field values) — the protocol's own trailing-backslash
    // ambiguity, preserved as-is
    def escTag(x: String) = x.replace(",", "\\,")
      .replace("=", "\\=").replace(" ", "\\ ")
    def escMeas(x: String) = x.replace(",", "\\,").replace(" ", "\\ ")
    val tags = p.tags.toSeq.sortBy(_._1)
      .map { case (k, v) => s",${escTag(k)}=${escTag(v)}" }.mkString
    val v = (p.num, p.bool, p.str) match {
      case (Some(n), _, _) => n.toString
      case (_, Some(b), _) => b.toString
      case (_, _, Some(sv)) => "\"" + sv.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case _ => "0"
    }
    s"${escMeas(p.measurement)}$tags ${escTag(p.field)}=$v${p.ts_ns.map(" " + _).getOrElse("")}"
  }

  /** Distributed parse: one flatMap over the lines (map-only, no shuffle);
    * malformed lines are DROPPED here — pair with [[errors]] to quarantine
    * them (the two sides partition the input exactly).
    */
  def parse(lines: Dataset[String]): Dataset[LpPoint] = {
    import lines.sparkSession.implicits._
    lines.flatMap(l => parseLine(l).getOrElse(Nil))
  }

  /** [[parse]] restricted to lines with no field type conflict against the
    * registry — the whole LINE drops when any of its points conflicts
    * (those lines are [[errors]]' rows, and a point sharing a line with an
    * offender must not commit behind its line's 400).
    */
  private def parseConforming(lines: Dataset[String],
                              fieldTypes: Map[(String, String), String]): Dataset[LpPoint] = {
    import lines.sparkSession.implicits._
    if (fieldTypes.isEmpty) parse(lines)
    else lines.flatMap(l => parseLine(l) match {
      case Right(pts) if lineConflict(pts, fieldTypes).isEmpty => pts
      case _ => Nil
    })
  }

  /** The malformed complement of [[parse]]: (line, error) rows. With a
    * coarse `tsUnitNs` this also covers well-formed lines whose timestamp
    * is outside the precision's representable window (see [[maxRawTs]]) —
    * at the default ns precision no parseable long can be out of range.
    * With a non-empty `fieldTypes` registry it also covers field type
    * conflicts (InfluxDB's partial-write 400 for a float-then-bool flip on
    * one field) — the conflicted line routes here and commits nothing.
    */
  def errors(lines: Dataset[String], tsUnitNs: Long = 1L,
             fieldTypes: Map[(String, String), String] = Map.empty): Dataset[LpError] = {
    import lines.sparkSession.implicits._
    lines.flatMap { l =>
      parseLine(l) match {
        case Left(e) => Some(LpError(l, e))
        case Right(pts) => pts.find(tsOutOfRange(_, tsUnitNs)).map(p =>
          LpError(l, s"timestamp ${p.ts_ns.get} out of range at " +
            s"precision ${tsUnitNs}ns (|ts| <= ${maxRawTs(tsUnitNs)})"))
          .orElse(lineConflict(pts, fieldTypes).map {
            case (p, exp) => conflictError(l, p, exp)
          })
      }
    }
  }

  /** Parsed points in the engine's narrow InfluxQL layout — measurement →
    * transducer, the `device` tag → the device column (the reference's own
    * topic convention), numeric-or-boolean `value` fields → `value`
    * double, timestamps → µs. Timestamp-less points take `serverTsUs`
    * when given (InfluxDB assigns write-receipt time); with
    * `serverTsUs = None` they DROP — as do string-field, device-less, and
    * non-`value`-named fields. The field-name restriction is deliberate:
    * the narrow layout's one field column cannot tell `used=1` from
    * `free=2`, and collapsing differently-named fields into one stream
    * would silently MERGE distinct series (the reference's own client
    * only ever writes the field `value`, influx_service.py:200-230).
    * Pair with [[narrowDropped]] (and [[errors]] for the malformed
    * complement) so the /write face never loses data invisibly.
    */
  def narrowPoints(lines: Dataset[String],
                   serverTsUs: Option[Long] = None,
                   tsUnitNs: Long = 1L,
                   fieldTypes: Map[(String, String), String] = Map.empty): DataFrame = {
    // `tsUnitNs` is the wire precision of the raw timestamps (the HTTP
    // /write `precision` parameter): 1 = ns (the protocol default),
    // 1000 = µs, 1e6 = ms, 1e9 = s, ... — converted to the engine's µs.
    // INTEGER division: `/` on longs is IEEE double division, which
    // loses precision above 2^53 — i.e. for every real nanosecond
    // epoch (1.7e18 in 2024 has a 256 ns ulp)
    require(tsUnitNs >= 1 &&
      (tsUnitNs % 1000L == 0 || 1000L % tsUnitNs == 0),
      s"unsupported timestamp unit: ${tsUnitNs}ns")
    val raw =
      if (tsUnitNs >= 1000L) expr(s"ts_ns * ${tsUnitNs / 1000L}")
      else expr(s"ts_ns div ${1000L / tsUnitNs}")
    val tsUs = serverTsUs match {
      case Some(t) => coalesce(raw, lit(t))
      case None => raw
    }
    // out-of-range timestamps DROP before scaling (they route to errors()
    // instead — never silent garbage, and never the server-time coalesce,
    // which only timestamp-LESS points may take); filtering the whole row
    // here keeps a null-ts substitute from resurrecting the offender
    val lim = maxRawTs(tsUnitNs)
    parseConforming(lines, fieldTypes).toDF()
      .filter(col("ts_ns").isNull || col("ts_ns").between(-lim, lim))
      .filter(col("field") === "value")
      .select(
        element_at(col("tags"), "device").as("device"),
        col("measurement").as("transducer"),
        tsUs.as("ts_us"),
        coalesce(col("num"), col("bool").cast("double")).as("value"))
      .filter(col("device").isNotNull && col("value").isNotNull &&
        col("ts_us").isNotNull)
  }

  /** The well-formed points [[narrowPoints]] cannot represent — string
    * field value, a field key other than `value`, no `device` tag, or
    * (when no server timestamp is assigned) no timestamp. Same partition
    * discipline as [[errors]]: narrowPoints ∪ narrowDropped covers every
    * parsed point exactly once.
    */
  def narrowDropped(lines: Dataset[String],
                    serverTsAssigned: Boolean = false,
                    tsUnitNs: Long = 1L,
                    fieldTypes: Map[(String, String), String] = Map.empty): Dataset[LpPoint] =
    parseConforming(lines, fieldTypes).filter { p =>
      // out-of-range timestamps and type-conflicted lines belong to
      // errors(), not dropped — the exactly-once partition of input
      // lines holds with all three
      !tsOutOfRange(p, tsUnitNs) &&
        (p.str.nonEmpty || p.field != "value" || !p.tags.contains("device") ||
          (!serverTsAssigned && p.ts_ns.isEmpty))
    }
}
