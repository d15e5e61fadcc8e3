package graft

import org.apache.spark.sql.DataFrame

import graft.influxql.InfluxCatalog

/** Interactive shell over the InfluxQL surface — the engine's `influx`
  * CLI (the client a reference deployment's users actually type into).
  *
  * Usage: `runMain graft.InfluxShell <data_dir> [db] [--user u --password p]`
  *
  * Reads one statement per line from stdin (blank lines and `--`/`#`
  * comments skipped), executes it through an [[InfluxCatalog]] — with
  * [[InfluxCatalog.runAs]] enforcement when credentials are given, plain
  * [[InfluxCatalog.run]] otherwise — and prints an aligned table. Errors
  * print and the loop continues (a typo must not kill the session).
  * `exit` / `quit` leave.
  *
  * Statements run under the catalog's [[graft.influxql.QueryRegistry]], so
  * a second shell on the same session sees them in SHOW QUERIES and can
  * KILL QUERY them mid-flight.
  */
object InfluxShell {

  /** Render up to `max` rows as an aligned text table (header, rule, rows,
    * and a truncation note when the result is larger). Null prints as
    * empty, like the influx CLI. Consumption is BOUNDED: at most `max + 1`
    * rows are taken from `toLocalIterator` over a `limit(max + 1)` plan —
    * a `SELECT * FROM <big measurement>` never buffers its full result in
    * driver heap, only the page the terminal will show.
    */
  def render(df: DataFrame, max: Int = 100): String = {
    val cols = df.columns
    val it = df.limit(max + 1).toLocalIterator()
    val rows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
    while (it.hasNext && rows.length <= max) rows += it.next()
    val shown = rows.take(max).map(_.toSeq.map {
      case null => ""
      case v => v.toString
    })
    val widths = cols.indices.map { i =>
      (cols(i).length +: shown.map(_(i).length)).max
    }
    def line(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
    val sb = new StringBuilder
    sb ++= line(cols.toIndexedSeq) += '\n'
    sb ++= widths.map("-" * _).mkString("-+-") += '\n'
    shown.foreach(r => { sb ++= line(r) += '\n' })
    if (rows.length > max) sb ++= s"... (showing first $max rows)\n"
    sb ++= s"(${math.min(rows.length, max)} row${if (shown.length == 1) "" else "s"})"
    sb.result()
  }

  /** Execute one statement and return the printable outcome — the REPL
    * body, separated so specs drive it without a terminal.
    */
  def process(cat: InfluxCatalog, stmt: String,
              creds: Option[(String, String)] = None): String =
    try {
      // shell meta-commands first — the `influxd backup/restore` operator
      // surface (not InfluxQL statements). With credentials they demand
      // ADMIN, validated through the same auth store as every statement
      // (a whole-database export/import is strictly stronger than any
      // single grant).
      val parts = stmt.trim.split("\\s+")
      parts.headOption.map(_.toLowerCase) match {
        case Some("backup") if parts.length == 3 =>
          creds.foreach { case (u, p) => cat.authorize(u, p, s"CREATE DATABASE x") }
          cat.exportDatabase(parts(1), parts(2))
          s"backed up database ${parts(1)} to ${parts(2)}"
        case Some("backup") if parts.length == 2 =>
          // influxd's no-database form: the full instance (all dbs + users)
          creds.foreach { case (u, p) => cat.authorize(u, p, s"CREATE DATABASE x") }
          cat.exportInstance(parts(1))
          s"backed up instance to ${parts(1)}"
        case Some("restore") if parts.length == 2 =>
          creds.foreach { case (u, p) => cat.authorize(u, p, s"CREATE DATABASE x") }
          // the manifest names the set's kind — a directory holds exactly
          // one of the two, so sniffing is unambiguous
          if (java.nio.file.Files.isRegularFile(
              java.nio.file.Paths.get(parts(1), "instance_manifest.json"))) {
            val dbs = cat.importInstance(parts(1))
            s"restored instance (databases: ${dbs.mkString(", ")})"
          } else {
            val db = cat.importDatabase(parts(1))
            s"restored database $db"
          }
        case _ =>
          // both paths run under the query registry and accept `;`-separated
          // multi-statement input (last result prints, like influx's CLI);
          // the render happens INSIDE the last statement's registry window, so
          // SHOW QUERIES lists it and KILL QUERY can cancel it while its page
          // streams out — and the driver only ever holds the page
          creds match {
            case Some((u, pw)) => cat.executeAsStreamed(u, pw, stmt)(render(_))
            case None => cat.executeStreamed(stmt)(render(_))
          }
      }
    } catch {
      case e: Exception =>
        s"ERR: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"
    }

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val dataDir = positional.headOption.getOrElse("graft_data")
    val db = positional.lift(1).getOrElse("openchirp")
    val creds = for (u <- flag("--user"); p <- flag("--password")) yield (u, p)
    val spark = GraftSession.builder("graft-shell", "32")
      .master("local[32]").getOrCreate()
    GraftSession.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    val cat = new InfluxCatalog(spark, dataDir, db)
    println(s"graft InfluxQL shell — data: $dataDir, db: $db (exit to quit)")
    Iterator.continually(scala.io.StdIn.readLine("> "))
      .takeWhile(l => l != null && !Set("exit", "quit")(l.trim.toLowerCase))
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("--") && !l.startsWith("#"))
      .foreach(stmt => println(process(cat, stmt, creds)))
    spark.stop()
  }
}
