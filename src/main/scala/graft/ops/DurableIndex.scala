package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.dedup.Hashing

/** Durable-index machinery shared by the persisted dedup corpus index
  * ([[graft.dedup.DedupQueries.corpusIndex]]) and the persisted IVF
  * ANN index ([[graft.sim.SimilarityQueries.ivfIndex]]): a stable
  * on-disk root, content-derived snapshot tagging, build-once locking,
  * and a completion marker so partial builds are never reused.
  *
  * The index artifacts are bucketed parquet tables whose FILES are the
  * durable state; catalog entries are per-session and re-declared over
  * the files on reuse (bucket metadata lives in the catalog, not the
  * files, so re-registration must repeat the bucket spec or the
  * exchange-free probe property is silently lost).
  */
object DurableIndex {

  /** Stable on-disk root for persisted indexes. Overridable for
    * deployments (a production cluster points this at shared storage);
    * defaults under the JVM temp root so tests and the round driver
    * share indexes across SESSIONS on one machine. */
  def root: Path = Paths.get(
    sys.env.getOrElse("SPARK_GRAFT_INDEX_ROOT",
      sys.props("java.io.tmpdir") + "/graft-index"))

  /** Marker written after ALL of an index's tables land — its absence
    * means a partial/in-flight build, which is rebuilt, never reused. */
  private val DoneMarker = "_GRAFT_INDEX_COMPLETE"

  /** Snapshot tag: hash of the table's absolute path plus its
    * (name, size, mtime) file listing. Index locations and table names
    * derive from it, so a data refresh VERSIONS the index (stale reuse
    * is impossible) — the production "version by snapshot id" pattern,
    * with the file listing standing in for a catalog snapshot id. */
  def snapshotTag(dataDir: String, tableFile: String): String = {
    val table = Paths.get(dataDir, tableFile)
    val sig = new StringBuilder(table.toAbsolutePath.toString)
    if (Files.isDirectory(table)) {
      val st = Files.list(table)
      try st.sorted().forEach { p =>
        sig.append('|').append(p.getFileName).append(':')
          .append(Files.size(p)).append(':')
          .append(Files.getLastModifiedTime(p).toMillis)
        ()
      } finally st.close()
    }
    java.lang.Long.toHexString(Hashing.md5Lower64(sig.toString))
  }

  /** One lock object per key: `computeIfAbsent` + synchronized
    * serializes concurrent builders in this JVM (a streaming twin's
    * first micro-batch racing the batch query); an OS-level advisory
    * file lock under [[root]] then serializes builders ACROSS
    * processes (r18 advice: a parallel shard replay and a bench on the
    * same snapshot could both take the build branch and interleave
    * overwrite writes, then `markComplete` landed on a torn index that
    * was reused forever). `FileChannel.lock` blocks until the peer
    * releases — or dies: the kernel drops the lock with the process,
    * so a crashed builder never wedges the key — and the loser then
    * re-checks [[complete]] inside its critical section and reuses.
    * The JVM monitor stays: POSIX file locks are per-process, so two
    * THREADS of one JVM must not both reach `FileChannel.lock` (the
    * second raises OverlappingFileLockException instead of waiting).
    * `held` makes re-entrant same-key nesting a no-op for the same
    * reason. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  def locked[T](key: String)(body: => T): T =
    locks.computeIfAbsent(key, _ => new Object).synchronized {
      if (held.get()(key)) body
      else {
        Files.createDirectories(root)
        val ch = java.nio.channels.FileChannel.open(
          root.resolve(s".lock-$key"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val lk = ch.lock()
          held.get() += key
          try body
          finally { held.get() -= key; lk.release() }
        } finally ch.close()
      }
    }

  def complete(loc: Path): Boolean = Files.exists(loc.resolve(DoneMarker))

  def markComplete(loc: Path): Unit = {
    Files.createFile(loc.resolve(DoneMarker))
    ()
  }

  /** Compact a bucketed index table in place: rewrite its rows through
    * the SAME bucket spec into one file per bucket, then swap the new
    * files under the table's location.
    *
    * Why: [[graft.dedup.DedupQueries.appendToCorpusIndex]] /
    * [[graft.sim.SimilarityQueries.appendToIvfIndex]] land one file per
    * bucket per APPEND — correct (every file carries its bucket id, the
    * probe stays exchange-free) but at a nightly cadence the per-bucket
    * file count grows ∝ days, and at 100 TB each probe task pays an
    * open/seek/footer per file. Compaction restores O(1) files per
    * bucket without touching the probe plan — and without a SHUFFLE:
    * with the bucketed scan forced on (autoBucketedScan would disable
    * it here, because after the optimizer elides the redundant
    * repartition no operator appears to require the distribution — the
    * measured trap: the writer then sees arbitrary scan partitions and
    * emits per-task-per-bucket files, 54 instead of 8 in the repro),
    * each task reads exactly one bucket's files, re-sorts, and writes
    * exactly one file. The `repartition(n, bucketCol)` is belt and
    * braces: it is a no-op over the bucketed scan (same murmur3-pmod
    * placement), and if the bucketed layout is ever NOT picked up it
    * degrades to one aligned shuffle — more cost, never wrong files.
    * `sortBy` re-sorts within the merged files, restoring the
    * single-run sort the first build had.
    *
    * The swap is filesystem-level (write to `<dir>.compact`, move the
    * old dir aside, rename, re-register the external-table DDL with the
    * same bucket spec). On a real cluster the rename step is a metastore
    * location swap (or a transactional table format); the brief window
    * where the location is mid-move is the same window every
    * non-transactional parquet rewrite has — callers run compaction from
    * the maintenance job that owns the index, serialized by [[locked]].
    * Readers holding an already-planned DataFrame keep their file list
    * and must re-plan after compaction (same contract as any overwrite). */
  def compactBucketedTable(s: SparkSession, tbl: String, dir: Path,
                           bucketCol: String, nBuckets: Int): Unit = {
    val autoScanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val savedAutoScan = s.conf.get(autoScanKey)
    s.conf.set(autoScanKey, "false")
    try {
      val df = s.table(tbl)
      val schemaDdl = df.schema.toDDL
      val tmpTbl = s"${tbl}_compact"
      val tmpDir = dir.resolveSibling(dir.getFileName.toString + ".compact")
      val oldDir = dir.resolveSibling(dir.getFileName.toString + ".old")
      deleteRecursively(tmpDir); deleteRecursively(oldDir)
      s.sql(s"DROP TABLE IF EXISTS $tmpTbl")
      df.repartition(nBuckets, col(bucketCol))
        .write.mode("overwrite")
        .option("path", tmpDir.toString)
        .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
        .saveAsTable(tmpTbl)
      s.sql(s"DROP TABLE IF EXISTS $tmpTbl")
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      Files.move(dir, oldDir)
      Files.move(tmpDir, dir)
      s.sql(s"CREATE TABLE $tbl ($schemaDdl) USING PARQUET " +
        s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
        s"INTO $nBuckets BUCKETS LOCATION '$dir'")
      deleteRecursively(oldDir)
    } finally s.conf.set(autoScanKey, savedAutoScan)
  }

  /** Data files of a table directory — the parquet parts, not the
    * `_SUCCESS` marker or the local filesystem's hidden `.crc`
    * siblings — for the compaction specs' file-count assertions. */
  def dataFiles(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
        }
        .toSeq
    } finally st.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.sorted(Comparator.reverseOrder[Path]()).forEach { q =>
        Files.delete(q); ()
      } finally st.close()
    }
}
