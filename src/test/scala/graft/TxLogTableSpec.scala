package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.storage.TxLogTable

class TxLogTableSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("txlog").toString + "/t"

  test("append accumulates; read sees the latest snapshot") {
    val t = new TxLogTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.append(Seq((2L, "b")).toDF("k", "v"))
    assert(t.version.contains(1L))
    assert(t.read().as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
  }

  test("merge upserts by key; stale updates lose by order column") {
    val t = new TxLogTable(spark, tmp())
    t.append(Seq((1L, "old", 100L), (2L, "keep", 100L)).toDF("k", "v", "ts"))
    t.merge(Seq((1L, "new", 200L), (3L, "ins", 200L)).toDF("k", "v", "ts"),
      keys = Seq("k"), orderCol = Some("ts"))
    assert(t.read().as[(Long, String, Long)].collect().toSet ==
      Set((1L, "new", 200L), (2L, "keep", 100L), (3L, "ins", 200L)))
    // a STALE replay (smaller ts) must not regress the row
    t.merge(Seq((1L, "stale", 150L)).toDF("k", "v", "ts"),
      keys = Seq("k"), orderCol = Some("ts"))
    assert(t.read().filter(col("k") === 1L).as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "new", 200L)))
    // replaying the SAME batch is a no-op on content (exactly-once effect)
    val before = t.read().as[(Long, String, Long)].collect().toSet
    t.merge(Seq((1L, "new", 200L), (3L, "ins", 200L)).toDF("k", "v", "ts"),
      keys = Seq("k"), orderCol = Some("ts"))
    assert(t.read().as[(Long, String, Long)].collect().toSet == before)
  }

  test("time travel: every committed version stays readable until vacuum") {
    val t = new TxLogTable(spark, tmp())
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))
    assert(t.readVersion(0L).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    assert(t.readVersion(1L).as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("compact folds small directories and preserves content") {
    val path = tmp()
    val t = new TxLogTable(spark, path)
    (0 until 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val before = t.read().as[(Long, String)].collect().toSet
    val dirsBefore = new java.io.File(path).listFiles.count(_.getName.startsWith("d-"))
    t.compact()
    assert(t.read().as[(Long, String)].collect().toSet == before)
    // the new snapshot is a single folded directory...
    val vacuumed = t.vacuum() // ...and vacuum drops the five orphaned ones
    assert(vacuumed.size == dirsBefore)
    assert(new java.io.File(path).listFiles.count(_.getName.startsWith("d-")) == 1)
    assert(t.read().as[(Long, String)].collect().toSet == before)
  }

  test("compact with a size bound leaves large directories untouched") {
    val path = tmp()
    val t = new TxLogTable(spark, path)
    t.append(spark.range(0, 50000).select(col("id").as("k"), col("id").cast("string").as("v")))
    val bigDirs = new java.io.File(path).listFiles.filter(_.getName.startsWith("d-")).map(_.getName).toSet
    (0 until 3).foreach(i => t.append(Seq((-i.toLong, "small")).toDF("k", "v")))
    t.compact(maxBytes = 100 * 1024) // folds only the three tiny commits
    t.vacuum()
    val after = new java.io.File(path).listFiles.filter(_.getName.startsWith("d-")).map(_.getName).toSet
    assert(bigDirs.subsetOf(after), "large directory must be carried over, not rewritten")
    assert(after.size == bigDirs.size + 1)
    assert(t.read().count() == 50003)
  }

  test("concurrent commit on the same version: exactly one winner") {
    val logDir = java.nio.file.Files.createTempDirectory("txlog_race")
    // two writers race version 1: the first rename wins...
    TxLogTable.writeCommitFile(logDir, 1L, """{"version":1,"op":"append","dirs":[]}""")
    // ...the second hits the no-replace rename and must surface the conflict
    intercept[TxLogTable.CommitConflict] {
      TxLogTable.writeCommitFile(logDir, 1L, """{"version":1,"op":"append","dirs":["d-x"]}""")
    }
    // the winner's entry is untouched and no temp litter remains
    val files = new java.io.File(logDir.toString).listFiles.map(_.getName).toSet
    assert(files == Set("1.json"))
    assert(TxLogTable.parseEntry(
      new String(java.nio.file.Files.readAllBytes(logDir.resolve("1.json")), "UTF-8")).dirs.isEmpty)
  }

  test("log entry roundtrip") {
    val e = TxLogTable.LogEntry(7L, "merge", Seq("d-aa", "d-bb"))
    assert(TxLogTable.parseEntry(TxLogTable.renderEntry(e)) == e)
  }
}
