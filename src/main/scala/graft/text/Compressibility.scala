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
  * This is the engine's first registered op with NO DuckDB oracle:
  * DEFLATE is not SQL-expressible, so the driver records the weaker
  * rows-only check, and determinism is pinned by spec instead —
  * fixed level, fixed strategy, one stream per document, so the same
  * bytes always produce the same length on any JVM shipping zlib's
  * fixed deflate tables (CompressibilitySpec pins exact values for
  * crafted inputs, run-to-run and repartition determinism, and the
  * monotone screen semantics).
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
