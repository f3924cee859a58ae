package graft.fraud

import java.nio.file.{Files, Paths}

/** The reference's failure contract (SURVEY §2.1 S5, §2.7-6): the whole
  * pipeline runs in one try/except; on success write "success" to the
  * status file, on failure print the traceback, write "failed", and
  * signal the caller (reference run_pipeline.py:91-101 — app.py:36 polls
  * this file to decide whether results exist). */
object StatusProtocol {

  /** Run `body`, writing the reference's success/failed protocol to
    * `statusPath`. Rethrows after recording failure so exit codes match
    * the reference's sys.exit(1). */
  def withStatus[T](statusPath: String)(body: => T): T =
    try {
      val out = body
      Files.writeString(Paths.get(statusPath), "success")
      out
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        Files.writeString(Paths.get(statusPath), "failed")
        throw e
    }
}
