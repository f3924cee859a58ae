package graft.text

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Tables

/** The COMPRESSION-RATIO quality screen (the zlib probe): how many
  * bytes does a document deflate to, relative to its raw size?
  * Highly compressible text is repetitive boilerplate (license walls,
  * keyword stuffing, templated spam); nearly incompressible text is
  * often binary junk or encrypted noise. Production corpus filters
  * (the Gopher/CCNet/RefinedWeb lineage) screen on exactly this
  * signal because it is the cheapest detector that catches whole
  * FAMILIES of degenerate text the per-pattern heuristics (q43
  * repetition, q86 boilerplate) each catch singly.
  *
  * DEFLATE is not SQL-expressible, so the oracle is a FIXTURE: for
  * every distinct text in the test corpora, `fixtures/q223_deflate
  * .parquet` holds the raw-deflate length precomputed by CPython's
  * zlib (`tools/gen_q223_fixture.py`) — an implementation path
  * independent of the JVM Deflater this op uses — keyed by
  * md5(text) so one fixture serves every SF. [[compressionProbeSql]]
  * joins documents on md5(text) and derives ratio/flag in SQL, so
  * q223 gets the full rows+schema+hash contract like every other
  * query. Determinism is additionally pinned by spec — fixed level,
  * fixed strategy, one stream per document (CompressibilitySpec pins
  * exact values for crafted inputs, run-to-run and repartition
  * determinism, and the monotone screen semantics).
  *
  * Scale shape: mapPartitions (not a per-row UDF) so ONE Deflater is
  * allocated and reset per task, not per document — the q26 decode
  * posture; embarrassingly parallel, no shuffle, output row-per-doc
  * with three integers. FLOAT RULE: the ratio ships as exact integer
  * ppm. */
object Compressibility {

  /** Deflate level: 6 is zlib's default speed/size tradeoff and the
    * level the CCNet probe uses. */
  val DeflateLevel = 6

  /** q223 screen bounds, in ppm of raw size: flag below (too
    * repetitive — compresses away) or above (incompressible noise).
    * The generator's synthetic prose deflates to ~30–60%; random
    * PRINTABLE text tops out near 6.55/8 ≈ 0.82 (Huffman floor for a
    * 94-symbol alphabet), so 0.8 already catches textual noise, not
    * just binary junk. */
  val MinRatioPpm = 200000L
  val MaxRatioPpm = 800000L

  /** Deflate length of `bytes` at [[DeflateLevel]] with the default
    * strategy, raw deflate (no zlib header — `nowrap`), one fresh
    * dictionary per call via `reset()`. */
  private def deflateLen(d: java.util.zip.Deflater, bytes: Array[Byte],
                         buf: Array[Byte]): Long = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Location of the precomputed deflate-length fixture (see the
    * object doc). Overridable for deployments whose fixture lives on
    * shared storage. */
  def fixturePath: String =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURES", "/root/repo/fixtures") +
      "/q223_deflate.parquet"

  /** Fixture-backed DuckDB oracle: md5(text)-join against the
    * independently precomputed deflate lengths; ratio and flag are
    * derived in SQL with the op's exact integer arithmetic. */
  def compressionProbeSql: String =
    s"""WITH j AS (SELECT d.doc_id, f.n_bytes, f.deflate_len,
       |  CAST(CASE WHEN f.n_bytes = 0 THEN 1000000
       |    ELSE f.deflate_len * 1000000 // f.n_bytes END AS BIGINT) AS ratio_ppm
       |  FROM documents d JOIN read_parquet('$fixturePath') f
       |    ON md5(d.text) = f.h)
       |SELECT doc_id, n_bytes, deflate_len, ratio_ppm,
       |  CAST(CASE WHEN ratio_ppm < $MinRatioPpm OR ratio_ppm > $MaxRatioPpm
       |    THEN 1 ELSE 0 END AS BIGINT) AS flagged
       |FROM j""".stripMargin.replace("\n", " ")

  /** q223 — per-document compressibility: raw UTF-8 bytes, deflated
    * bytes, ratio in ppm, and the 0/1 screen flag. */
  def compressionProbe(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("deflate_len", LongType, nullable = false),
      StructField("ratio_ppm", LongType, nullable = false),
      StructField("flagged", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        val defl = new java.util.zip.Deflater(DeflateLevel, true)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => defl.end())
        val buf = new Array[Byte](64 * 1024)
        rows.map { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          val dl = deflateLen(defl, bytes, buf)
          val ratio =
            if (bytes.length == 0) 1000000L
            else dl * 1000000L / bytes.length
          val flagged =
            if (ratio < MinRatioPpm || ratio > MaxRatioPpm) 1L else 0L
          Row(r.getLong(0), bytes.length.toLong, dl, ratio, flagged)
        }
      }(enc)
  }
}
