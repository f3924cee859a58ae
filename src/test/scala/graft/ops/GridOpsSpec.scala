package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q261/q262/q263 invariants: centroid cosine vs a driver replay and
  * the mean-vs-sum cancellation; HLL DAU estimate within sketch
  * tolerance of q237's exact day-0 actives; mass median ≥ count
  * median exactly when the tail is heavy. */
class GridOpsSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("labelCentroidAffinity equals a driver-side quantized replay; bounds hold") {
    val spark = SparkSpec.spark
    val vecs = Tables.embeddings(spark, dir)
      .select("label", "embedding").collect()
      .map(r => (r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val sums = vecs.groupBy(_._1).map { case (l, vs) =>
      val s = Array.fill(64)(0L)
      vs.foreach { case (_, e) =>
        for (i <- 0 until 64)
          // HALF_UP = half away from zero — what both engines' round()
          // does on negatives (math.round would round -x.5 toward +∞)
          s(i) += BigDecimal(e(i).toDouble * SimQ)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      l -> ((s, vs.length.toLong))
    }
    val got = graft.sim.SimilarityQueries.labelCentroidAffinity(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("dot"),
          r.getAs[Double]("cos6")))).toMap
    val labels = sums.keys.toSeq.sorted
    assert(got.size === labels.size * (labels.size - 1) / 2)
    for { (a, ia) <- labels.zipWithIndex; b <- labels.drop(ia + 1) } {
      val (sa, na) = sums(a); val (sb, nb) = sums(b)
      val dot = (0 until 64).map(i => sa(i) * sb(i)).sum
      val nra = (0 until 64).map(i => sa(i) * sa(i)).sum
      val nrb = (0 until 64).map(i => sb(i) * sb(i)).sum
      val cos = BigDecimal(dot.toDouble / math.sqrt(nra.toDouble * nrb.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gn_a, gn_b, gdot, gcos) = got((a, b))
      assert((gn_a, gn_b, gdot) === ((na, nb, dot)), s"pair ($a,$b)")
      assert(math.abs(gcos - cos) < 1e-9 && math.abs(gcos) <= 1.0 + 1e-9)
    }
  }

  private val SimQ = graft.sim.SimilarityQueries.CentroidQ

  test("hllDau estimate tracks the exact per-day actives within HLL tolerance") {
    val spark = SparkSpec.spark
    val exact = Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("ts").cast("date").as("day"),
        org.apache.spark.sql.functions.col("user_id"))
      .distinct().groupBy("day").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rows = Sketches.hllDau(spark, dir).collect()
    assert(rows.map(_.getDate(0).toString).toSet === exact.keySet)
    rows.foreach { r =>
      val day = r.getDate(0).toString
      val mUsed = r.getAs[Long]("m_used")
      val denom = r.getAs[Long]("denom_x2p50")
      // the standard HLL estimate from the emitted fixed-point cells
      val m = 256.0
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val rawEst = alpha * m * m * math.pow(2.0, 50) / denom.toDouble
      val est =
        if (rawEst <= 2.5 * m && mUsed < 256)
          m * math.log(m / (m - mUsed)) // small-range correction
        else rawEst
      val truth = exact(day).toDouble
      assert(math.abs(est - truth) / truth < 0.25,
        s"$day: est $est vs exact $truth")
    }
  }

  test("seasonalOutliers: every flagged day violates the K·MAD gate; medians are exact") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.{col, count, lit}
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val wdMed = daily.groupBy(t => (t._1, t._2.getDayOfWeek.getValue))
      .map { case (k, rows) => k -> lowerMedian(rows.map(_._3).toSeq) }
    val resid = daily.map { case (et, day, x) =>
      (et, day, x - wdMed((et, day.getDayOfWeek.getValue)))
    }
    val mad = resid.groupBy(_._1).map { case (et, rs) =>
      et -> lowerMedian(rs.map(r => math.abs(r._3)).toSeq)
    }
    val expect = resid.filter { case (et, _, r) =>
      math.abs(r) > Quality.SeasonalK * math.max(mad(et), 1L)
    }.map(t => (t._1, t._2.toString)).toSet
    val got = Quality.seasonalOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(got === expect)
    assert(got.nonEmpty, "the gate has teeth on this corpus")
  }

  test("evalCoverage: bin mass sums to |Q|, fractions to ~1e6, bins ordered sanely") {
    val spark = SparkSpec.spark
    val rows = graft.sim.SimilarityQueries.evalCoverage(spark, dir).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"), r.getAs[Long]("frac_ppm")))
    val nq = Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.expr(
        s"vec_id % 100 = 0 AND vec_id <= ${graft.sim.SimilarityQueries.EvalCoverageQMax}"))
      .count()
    assert(rows.map(_._2).sum === nq)
    val fracSum = rows.map(_._3).sum
    assert(fracSum >= 1000000 - rows.length && fracSum <= 1000000)
    assert(rows.forall { case (b, _, _) => b >= -20 && b <= 20 })
  }

  test("aaCalibration: null holds — false-alarm rate near α; z replays brute-force") {
    val spark = SparkSpec.spark
    val rows = Inference.aaCalibration(spark, dir).collect()
    assert(rows.length === 20)
    val alarms = rows.map(_.getAs[Long]("false_alarm")).sum
    // 20 null tests at α=5%: P(>5 alarms) < 1e-4 — a failure here means
    // the variance model is broken, which is exactly what q267 detects
    assert(alarms <= 5, s"$alarms/20 pseudo-pairs alarmed — gate miscalibrated")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === 25L)
    }
  }

  test("scatterRatio: CH ≈ 1 on label-less synthetic space (no hallucinated structure)") {
    val spark = SparkSpec.spark
    val r = graft.sim.SimilarityQueries.scatterRatio(spark, dir).collect().head
    assert(r.getAs[Long]("k") === 10 && r.getAs[Long]("n") === 500)
    val ch = r.getAs[Double]("ch6")
    // synthetic embeddings carry no label structure: CH must sit near 1
    // (an index that reported strong clusters here would be lying)
    assert(ch > 0.5 && ch < 2.0, s"CH $ch")
    assert(r.getAs[Long]("b_num") > 0 && r.getAs[Long]("w_num") > 0)
  }

  test("burstiness: constructed regular/bursty streams land on the right verdicts") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // user 1: perfectly regular (every 100 s); user 2: bursty
    // (99 one-second gaps then one huge gap, repeated)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val regular = (0L until 50L).map(i => (1L, ts(i * 100), i))
    val bursty = (0L until 50L).map { i =>
      val base = (i / 10) * 100000L + (i % 10)
      (2L, ts(base), 100 + i)
    }
    val ev = (regular ++ bursty).toDF("user_id", "ts", "event_id")
    val out = Quality.burstinessFrom(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("verdict")).toMap
    assert(out(1L) === "regular", s"got $out")
    assert(out(2L) === "bursty")
    // and on the real corpus: B bounded, moments exact
    Quality.burstiness(spark, dir).collect().foreach { r =>
      val b = r.getAs[Double]("b6")
      assert(b >= -1.0 && b <= 1.0)
      assert(r.getAs[Long]("n_gaps") >= Quality.BurstMinGaps)
    }
  }

  test("growthAccounting: both accounting identities hold on every day") {
    val spark = SparkSpec.spark
    val rows = RelationalQueries.growthAccounting(spark, dir).collect()
      .map(r => r.getDate(0).toLocalDate ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
          r.getAs[Long]("n_churned"))))
      .sortBy(_._1.toEpochDay)
    assert(rows.nonEmpty)
    // identity 1: dau = new + retained + resurrected, every day
    rows.foreach { case (day, (dau, nw, rt, rs, _)) =>
      assert(dau === nw + rt + rs, s"$day")
    }
    // identity 2: dau(d-1) = retained(d) + churned(d) on consecutive days
    rows.sliding(2).foreach {
      case Array((d1, (dau1, _, _, _, _)), (d2, (_, _, rt2, _, ch2)))
        if d2.toEpochDay == d1.toEpochDay + 1 =>
        assert(dau1 === rt2 + ch2, s"$d1 -> $d2")
      case _ => ()
    }
    // total new across all days = distinct users ever active
    val users = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_._2._2).sum === users)
  }

  test("clusterSizeHistogram: sizes partition the corpus; removal mass = docs - clusters") {
    val spark = SparkSpec.spark
    val rows = graft.dedup.DedupQueries.clusterSizeHistogram(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("docs_removed_by_keep_one")))
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_._3).sum === total, "sizes partition the corpus")
    rows.foreach { case (sz, nc, nd, rem) =>
      assert(nd === sz * nc)
      assert(rem === nd - nc)
    }
    // the synthetic corpus plants near-dups: a size > 1 row must exist
    assert(rows.exists(_._1 > 1))
  }

  test("tokenMassMedian: mass median ≥ count median; both are order statistics") {
    val spark = SparkSpec.spark
    val rows = Quality.tokenMassMedian(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val mm = r.getAs[Long]("mass_median_ntok")
      val cm = r.getAs[Long]("count_median_ntok")
      // token mass concentrates in long docs, so the mass median can
      // never sit below the count median
      assert(mm >= cm, s"${r.getAs[String]("source")}: $mm < $cm")
      assert(r.getAs[Long]("mass_over_count_x10k") === mm * 10000 / math.max(cm, 1))
    }
    // driver replay on one source
    val src = rows.head.getAs[String]("source")
    val toks = Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("source") === src)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), "[a-z0-9]+".r.findAllIn(r.getString(1)).length.toLong))
      .sortBy(t => (t._2, t._1))
    val total = toks.map(_._2).sum
    var cum = 0L
    val mmRef = toks.find { t => cum += t._2; cum * 2 >= total }.get._2
    val cmRef = toks((toks.length + 1) / 2 - 1)._2
    val row = rows.find(_.getAs[String]("source") == src).get
    assert(row.getAs[Long]("mass_median_ntok") === mmRef)
    assert(row.getAs[Long]("count_median_ntok") === cmRef)
  }
}
