package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Tables

/** q218 tokenizer stats: driver-side recount of every counter on a
  * slice, plus the ppm ratio contracts. */
class TokenizerStatsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("tokenizerStats counters equal a driver-side recount (sf0.01)") {
    val spark = SparkSpec.spark
    val tokRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val truth = Tables.documents(spark, dir)
      .select("lang", "source", "text", "n_chars").collect()
      .map { r =>
        val text = r.getAs[String]("text")
        ((r.getAs[String]("lang"), r.getAs[String]("source")),
          (1L,
            text.split("\\s+", -1).count(_.nonEmpty).toLong,
            tokRe.findAllIn(text).size.toLong,
            r.getAs[Long]("n_chars"),
            text.getBytes("UTF-8").length.toLong))
      }
      .groupBy(_._1)
      .map { case (k, rows) =>
        val vs = rows.map(_._2)
        k -> ((vs.map(_._1).sum, vs.map(_._2).sum, vs.map(_._3).sum,
          vs.map(_._4).sum, vs.map(_._5).sum))
      }

    val got = CorpusOps.tokenizerStats(spark, dir).collect().map { r =>
      (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_toks"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_bytes"), r.getAs[Long]("fert_ppm"),
          r.getAs[Long]("bpt_ppm")))
    }.toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (k, (d, w, t, c, b, fert, bpt)) =>
      assert((d, w, t, c, b) === truth(k), s"cell $k")
      assert(fert === t * 1000000L / math.max(w, 1L))
      assert(bpt === b * 1000000L / math.max(t, 1L))
      // BPE-ish tokens never undercount words (every word yields ≥1 token)
      assert(t >= w, s"fertility < 1 in $k")
      // ASCII-ish corpus: bytes per token bounded by chars per token
      assert(b >= c || c == 0, s"bytes < chars in $k")
    }
  }
}
