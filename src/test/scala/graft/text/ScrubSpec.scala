package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed checks of the corpus-cleaning operators (q42/q43). */
class ScrubSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("piiRedact scrubs every phone/email/id pattern it counted") {
    val spark = SparkSpec.spark
    val rows = Scrub.piiRedact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      // nothing PII-shaped survives redaction
      assert(!red.matches(".*\\d{3}-\\d{3}-\\d{4}.*"), s"phone left in: $red")
      assert(!red.contains("@"), s"email left in: $red")
      assert(!red.matches(".*\\d{6,}.*"), s"id run left in: $red")
      // every counted match produced a placeholder
      assert(red.sliding(7).count(_ == "[EMAIL]") == r.getAs[Int]("n_email"))
      assert(red.sliding(7).count(_ == "[PHONE]") == r.getAs[Int]("n_phone"))
      assert(red.sliding(4).count(_ == "[ID]") == r.getAs[Int]("n_id"))
    }
    // the derived profile makes the counts data-dependent: both 0 and 1 occur
    assert(rows.map(_.getAs[Int]("n_phone")).distinct.sorted.toSeq == Seq(0, 1))
    assert(rows.map(_.getAs[Int]("n_email")).distinct.sorted.toSeq == Seq(0, 1))
  }

  test("decontaminate equals brute-force bench×corpus n-gram intersection (sf0.01)") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.dedup.Hashing
        .wordShingles(r.getString(1), Scrub.DecontamN).distinct.toSet)
    val (bench, corpus) = docs.partition(_._1 % Scrub.BenchStride == Scrub.BenchOffset)
    val truth = (for {
      (cid, cg) <- corpus; (bid, bg) <- bench
      n = (cg intersect bg).size if n > 0
    } yield (cid, bid) -> n.toLong).toMap
    val got = Scrub.decontaminate(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id")) -> r.getAs[Long]("n_shared"))
      .toMap
    assert(got === truth)
    assert(got.nonEmpty, "benchmark slice must catch real contamination")
  }

  test("gramNovelty equals brute-force first-owner counting (sf0.01)") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> graft.dedup.Hashing
        .wordShingles(r.getString(1), Scrub.NoveltyGramN).distinct)
    val owner = docs.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val truth = docs.map { case (id, gs) =>
      id -> ((gs.size.toLong, gs.count(g => owner(g) == id).toLong))
    }.toMap
    val got = Scrub.gramNovelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))))
      .toMap
    assert(got === truth)
    // signal check: novelty must actually discriminate (not all-novel,
    // not all-stale) on the driver corpus
    val ratios = truth.values.map { case (n, nov) => nov.toDouble / n }
    assert(ratios.exists(_ < 0.5) && ratios.exists(_ > 0.5))
  }

  test("curatedCorpus equals the exact reconstruction from its component gates (sf0.01)") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    val kept = Scrub.curatedCorpus(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val docs = graft.ops.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val fpKeeper = docs
      .groupBy { case (_, t) => t.toLowerCase.replaceAll("[^a-z0-9]", "") }
      .map { case (_, grp) => grp.map(_._1).min }.toSet
    val good = TextQueries.quality(spark, dir)
      .filter(org.apache.spark.sql.functions.col("quality") === "good")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = Scrub.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = docs.map(_._1).filter { id =>
      fpKeeper(id) && good(id) && !contaminated(id) &&
        id % Scrub.BenchStride != Scrub.BenchOffset
    }.toSet
    assert(kept === expected)
    assert(kept.nonEmpty && kept.size < docs.length)
  }

  test("winnowing guarantee: a shared w+n-1 word run yields a shared fingerprint") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def words(k: Int, tag: String) = Seq.fill(k)(s"$tag${rnd.nextInt(100000)}")
    // the MINIMAL guaranteed-detectable span: one full window of grams
    // = WinnowWindow + WinnowGramN - 1 words, embedded at different
    // offsets in otherwise-unique text; docs 3/4 share nothing
    val run = words(Scrub.WinnowWindow + Scrub.WinnowGramN - 1, "shared")
    val docs = Seq(
      (1L, (words(30, "a") ++ run ++ words(30, "b")).mkString(" ")),
      (2L, (words(17, "c") ++ run ++ words(41, "d")).mkString(" ")),
      (3L, words(60, "e").mkString(" ")),
      (4L, words(60, "f").mkString(" "))
    ).toDF("doc_id", "text")
    // at threshold 1 the schema guarantee is unconditional: the one
    // fully-shared window must select the same (content-determined) min
    val pairs = Scrub.winnowPairsFrom(docs, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).exists(_ >= 1L),
      s"shared run must yield >= 1 shared fingerprint, got $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a >= 3L || b >= 3L },
      s"disjoint docs paired: ${pairs.keySet}")
  }

  test("repetition metrics equal a driver-side recount (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Scrub.repetition(spark, sfDir).collect().foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).trim.split("\\s+").filter(_.nonEmpty)
      val counts = toks.groupBy(identity).map(_._2.length)
      val n = math.max(toks.length, 1)
      val dupMass = counts.filter(_ > 1).sum
      val maxC = if (counts.isEmpty) 0 else counts.max
      assert(r.getAs[Int]("n_tok") == toks.length)
      assert(r.getAs[Double]("dup_frac") == r4(dupMass.toDouble / n))
      assert(r.getAs[Double]("top_frac") == r4(maxC.toDouble / n))
      assert(r.getAs[Double]("distinct_ratio") == r4(counts.size.toDouble / n))
      assert(r.getAs[String]("verdict") ==
        (if (dupMass.toDouble / n > 0.5) "repetitive" else "ok"))
    }
  }
}
