package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Multi-file / hive-partitioned mirror of a driver fixture directory.
  *
  * The driver fixtures are one single-row-group parquet file per table —
  * fine for correctness, but they exercise neither split planning (one
  * mapper per table, however large) nor partition pruning. This writes,
  * ONCE per sf dir (marker-file idempotent):
  *  - every table as a `files`-file parquet directory (same
  *    `<table>.parquet` naming, so `Tables.load` reads both layouts);
  *  - `documents` additionally hive-partitioned by `lang`, the pruning
  *    surface for the lang-filtered text queries;
  *  - `events` with `ts` converted back to raw nano longs, so
  *    `Tables.events` applies the identical NANOS read path on both
  *    layouts.
  *
  * Used by Bench (the partitioned variant pass) and
  * PartitionedFixtureSpec (pruning + equality pins).
  */
object PartitionedFixture {

  val AllTables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Fingerprint of the source fixture: per-file (name, size, mtime) over
    * every parquet under sfDir. A regenerated fixture changes the
    * fingerprint, which changes the marker name, so a stale mirror is
    * rebuilt instead of silently reused. */
  private def fingerprint(sfDir: String): String = {
    val fs = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val sig = fs.map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    java.security.MessageDigest.getInstance("MD5").digest(sig.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  def prepare(spark: SparkSession, sfDir: String, files: Int = 16): String =
    synchronized {
      val out = s"/tmp/graft_partitioned_${new java.io.File(sfDir).getName}"
      val fp = fingerprint(sfDir)
      val marker = new java.io.File(s"$out/_PREPARED_$fp")
      if (marker.exists) return out
      // build into a private temp dir, then atomically rename into place —
      // a concurrent preparer (Bench + a spec JVM) either wins the rename
      // or observes the winner's complete mirror, never an interleaving
      val tmp = s"${out}.tmp.${java.lang.ProcessHandle.current.pid}"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      val plain = AllTables.filterNot(t => t == "events" || t == "documents")
      plain.foreach { t =>
        Tables.load(spark, sfDir, t).repartition(files)
          .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
      }
      Tables.events(spark, sfDir)
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
        .repartition(files)
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      Tables.documents(spark, sfDir).repartition(files)
        .write.mode("overwrite").partitionBy("lang").parquet(s"$tmp/documents.parquet")
      new java.io.File(s"$tmp/_PREPARED_$fp").createNewFile()
      val outF = new java.io.File(out)
      try {
        java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
          java.nio.file.Paths.get(out),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        // covers FileAlreadyExists / DirectoryNotEmpty and the raw
        // FileSystemException("Directory not empty") the JDK throws when
        // the target dir already exists
        case _: java.nio.file.FileSystemException =>
          if (new java.io.File(s"$out/_PREPARED_$fp").exists) {
            // concurrent winner with the same fingerprint — use theirs
            org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
          } else {
            // stale mirror (old fingerprint): replace it
            org.apache.commons.io.FileUtils.deleteQuietly(outF)
            java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
              java.nio.file.Paths.get(out),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
      }
      out
    }
}
