package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q238 postings compression, q239 encoding advisor, q240 seasonal
  * backtest: driver-side recounts and the cost-model identities. */
class StorageAdvisorSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  private def varint(g: Long): Long =
    if (g < 128) 1 else if (g < 16384) 2 else if (g < 2097152) 3
    else if (g < 268435456) 4 else 5

  test("postingsCompression equals a driver-side delta+varint recount (sf0.01)") {
    val spark = SparkSpec.spark
    val tokRe = "[a-z0-9]+".r
    val postings = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .flatMap(r => tokRe.findAllIn(r.getString(1)).toSeq.distinct
        .map(t => (t, r.getLong(0))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .filter(_._2.length >= 2) // MinDf

    val truth = postings.map { case (term, ids) =>
      val gaps = ids.head +: ids.sliding(2).filter(_.length == 2)
        .map(p => p(1) - p(0)).toSeq
      term -> ((ids.length.toLong, gaps.map(varint).sum))
    }

    val got = graft.text.CorpusOps.postingsCompression(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(2), r.getLong(4)))).toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (term, (df, vb, raw, sav)) =>
      assert((df, vb) === truth(term), term)
      assert(raw === df * 8)
      assert(sav === (df * 8 - vb) * 1000000L / (df * 8))
      // delta+varint never loses vs raw on sorted ids (gap ≤ id < 2^28 here)
      assert(vb <= df * 8)
    }
    // the estimate must show the real ~5x story somewhere
    assert(got.values.exists(_._4 > 500000L), "no term compresses > 2x?")
  }

  test("encodingAdvisor equals a driver-side cost recount (sf0.01)") {
    val spark = SparkSpec.spark
    val rows = Tables.documents(spark, dir)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3).toString))
      .sortBy(_._1)

    def cost(vs: Seq[String]) = {
      val n = vs.length.toLong
      val d = vs.distinct.length.toLong
      val plain = vs.map(_.getBytes("UTF-8").length.toLong).sum
      val runs = vs.zip("" +: vs.init).count { case (a, b) => a != b }.toLong
      val runBytes = vs.zip("" +: vs.init).collect {
        case (a, b) if a != b => a.getBytes("UTF-8").length.toLong }.sum
      val idx = if (d <= 256) 1L else if (d <= 65536) 2L else 4L
      (n, d, runs, plain, n * idx, runBytes + runs * 4)
    }
    val truth = Map(
      "lang" -> cost(rows.map(_._2)),
      "source" -> cost(rows.map(_._3)),
      "n_chars" -> cost(rows.map(_._4)))

    val got = Layout.encodingAdvisor(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("plain_bytes"),
        r.getAs[Long]("dict_index_bytes"), r.getAs[Long]("rle_bytes"),
        r.getAs[String]("best")))
    }.toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (c, (n, d, runs, p, di, rl, best)) =>
      assert((n, d, runs, p, di, rl) === truth(c), c)
      val expectBest = if (rl <= di && rl <= p) "rle"
        else if (di <= p) "dict" else "plain"
      assert(best === expectBest, c)
    }
    // low-cardinality string columns must prefer dictionary over plain
    assert(got("lang")._5 < got("lang")._4)
  }

  test("seasonalBacktest equals a driver-side positional-lag recount (sf0.01)") {
    val spark = SparkSpec.spark
    val daily = Tables.events(spark, dir)
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((t, d2), x) => (t, d2, x) }

    val truth = daily.groupBy(_._1).map { case (t, rs) =>
      val xs = rs.sortBy(_._2.toEpochDay).map(_._3)
      val evals = (7 until xs.length).map(i =>
        (math.abs(xs(i) - xs(i - 1)), math.abs(xs(i) - xs(i - 7))))
      val (sn, ss) = (evals.map(_._1).sum, evals.map(_._2).sum)
      t -> ((evals.length.toLong, sn, ss))
    }

    val got = Quality.seasonalBacktest(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getAs[Long]("n_eval"), r.getAs[Long]("sae_naive"),
        r.getAs[Long]("sae_seasonal"), r.getAs[String]("winner")))
    }.toMap

    assert(got.keySet === truth.keySet)
    got.foreach { case (t, (n, sn, ss, w)) =>
      assert((n, sn, ss) === truth(t), t)
      assert(w === (if (ss < sn) "seasonal" else if (ss > sn) "naive" else "tie"))
    }
    assert(got.nonEmpty)
  }
}
