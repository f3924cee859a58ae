package graft.ops

import java.nio.file.{Files, Path, Paths}

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
    * first micro-batch racing the batch query), so exactly one writes
    * and the loser reuses. Cross-JVM racers are idempotent: both write
    * the same content to the same location, last marker wins. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def locked[T](key: String)(body: => T): T =
    locks.computeIfAbsent(key, _ => new Object).synchronized(body)

  def complete(loc: Path): Boolean = Files.exists(loc.resolve(DoneMarker))

  def markComplete(loc: Path): Unit = {
    Files.createFile(loc.resolve(DoneMarker))
    ()
  }
}
