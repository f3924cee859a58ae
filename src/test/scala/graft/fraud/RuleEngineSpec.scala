package graft.fraud

import java.sql.Date
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property tests for the rule engine against a straightforward
  * driver-side reference implementation (SURVEY §5: tag-order
  * invariance, permutation invariance, rule semantics). */
object RuleEngineSpec {
  /** top-level so Spark can derive an Encoder */
  case class C(name: String, aadhaar: Long, amount: Double, date: String)
}

class RuleEngineSpec extends AnyFunSuite {
  import RuleEngineSpec.C

  /** Driver-side reference: the pandas semantics of run_pipeline.py:21-43. */
  private def referenceTags(rows: Seq[C]): Map[(String, Long, Double, String), String] = {
    val namesPerAad = rows.groupBy(_.aadhaar).map { case (k, v) => k -> v.map(_.name).distinct.size }
    val aadPerName = rows.groupBy(_.name).map { case (k, v) => k -> v.map(_.aadhaar).distinct.size }
    // pandas linear-interpolation p99
    val sorted = rows.map(_.amount).sorted
    val rank = 0.99 * (sorted.size - 1)
    val (lo, hi) = (sorted(rank.toInt), sorted(math.min(rank.toInt + 1, sorted.size - 1)))
    val p99 = lo + (rank - rank.toInt) * (hi - lo)
    // FrequentClaims: per aadhaar sorted by date (stable), diff ≤ 7 days
    val freq = rows.zipWithIndex
      .groupBy(_._1.aadhaar)
      .flatMap { case (_, g) =>
        val sortedG = g.sortBy { case (c, i) => (c.date, i.toLong) } // stable by input order
        sortedG.zip(None +: sortedG.map(Some(_))).collect {
          case ((c, i), Some((prev, _)))
            if Date.valueOf(c.date).toLocalDate.toEpochDay -
               Date.valueOf(prev.date).toLocalDate.toEpochDay <= 7 => i
        }
      }.toSet
    rows.zipWithIndex.map { case (c, i) =>
      val tags =
        (if (namesPerAad(c.aadhaar) > 1) "DuplicateAadhaar;" else "") +
        (if (aadPerName(c.name) > 1) "MultiAadhaar;" else "") +
        (if (c.amount > p99) "HighClaimAmount;" else "") +
        (if (freq(i)) "FrequentClaims;" else "")
      (c.name, c.aadhaar, c.amount, c.date) -> (if (tags.isEmpty) "Normal" else tags)
    }.toMap
  }

  private def run(rows: Seq[C]): Map[(String, Long, Double, String), String] = {
    val spark = SparkSpec.spark
    import spark.implicits._
    val df = rows.toDF("Name", "Aadhaar", "ClaimAmount", "DateStr")
      .withColumn("Date", to_date(col("DateStr"), "yyyy-MM-dd")).drop("DateStr")
    RuleEngine.withRuleTags(df)
      .select("Name", "Aadhaar", "ClaimAmount", "Date", "RuleFraud")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDate(3).toString) -> r.getString(4))
      .toMap
  }

  private def randomClaims(seed: Long, n: Int): Seq[C] = {
    val rng = new Random(seed)
    Seq.fill(n)(C(
      s"name${rng.nextInt(8)}",
      100L + rng.nextInt(10),
      rng.nextInt(100000).toDouble,
      f"2025-07-${1 + rng.nextInt(28)}%02d"))
  }

  test("tags match the reference semantics on random corpora") {
    for (seed <- 1 to 3) {
      val rows = randomClaims(seed, 60)
      // distinct (name,aadhaar,amount,date) keys so map compare is sound
      val uniq = rows.groupBy(c => (c.name, c.aadhaar, c.amount, c.date))
        .map(_._2.head).toSeq
      assert(run(uniq) === referenceTags(uniq), s"seed=$seed")
    }
  }

  test("tags are invariant under input permutation (given distinct dates per key)") {
    val rows = randomClaims(99, 50)
      .groupBy(c => (c.aadhaar, c.date)).map(_._2.head).toSeq // kill lag ties
    val a = run(rows)
    val b = run(new Random(7).shuffle(rows))
    assert(a === b)
  }

  test("p99 strict inequality: a single-amount corpus never fires HighClaimAmount") {
    val rows = Seq.tabulate(20)(i => C(s"n$i", 200L + i, 5000.0, "2025-07-01"))
    assert(run(rows).values.forall(!_.contains("HighClaimAmount")))
  }

  test("the approx-percentile scale switch tracks the exact p99") {
    val spark = SparkSpec.spark
    val li = graft.ops.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("o_totalprice", "ClaimAmount")
    val exact = RuleEngine.p99Amount(li, exact = true)
    val approx = RuleEngine.p99Amount(li, exact = false)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx=$approx exact=$exact") // 10k-bucket sketch stays within 1%
  }
}
