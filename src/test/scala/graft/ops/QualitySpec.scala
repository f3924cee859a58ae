package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The constraint suite must count every violation class exactly, and
  * the clean generator tables must pass every constraint. */
class QualitySpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  private def byCheck(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("violations"), r.getAs[Long]("total_rows"), r.getAs[Long]("pass"))).toMap

  test("q145 all constraints pass on the generator tables") {
    val spark = SparkSpec.spark
    val out = byCheck(Quality.qualityChecks(spark, sfDir).collect())
    assert(out.size == 13)
    out.foreach { case (k, (v, n, p)) =>
      assert(v == 0L, s"constraint $k has $v violations")
      assert(p == 1L, s"constraint $k not passing")
      assert(n > 0L)
    }
  }

  test("constructed violations are each counted exactly once") {
    val spark = SparkSpec.spark
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // rows: (orderkey, custkey, status, price, date, priority)
    val rows = Seq(
      (Some(1L), Some(10L), Some("F"), Some(5.0), Some(ts("1995-03-01")), Some("1-URGENT")),   // clean
      (Some(1L), Some(10L), Some("O"), Some(6.0), Some(ts("1995-03-02")), Some("2-HIGH")),     // dup key
      (None,     Some(10L), Some("X"), Some(-1.0), Some(ts("1980-01-01")), Some("URGENT")),    // null key, bad status, neg, early, bad pattern
      (Some(3L), None,      None,      None,       None,                  None),               // nulls everywhere; null custkey = orphan
      (Some(4L), Some(99L), Some("P"), Some(1.0), Some(ts("2005-01-01")), Some("5-LOW"))       // orphan custkey, late date
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val cust = Seq(10L).toDF("c_custkey")
    val out = byCheck(Quality.qualityChecksFrom(rows, cust).collect())
    assert(out(("completeness", "o_orderkey")) == ((1L, 5L, 0L)))
    assert(out(("completeness", "o_custkey")) == ((1L, 5L, 0L)))
    assert(out(("completeness", "o_orderstatus")) == ((1L, 5L, 0L)))
    assert(out(("completeness", "o_totalprice")) == ((1L, 5L, 0L)))
    assert(out(("completeness", "o_orderdate")) == ((1L, 5L, 0L)))
    assert(out(("completeness", "o_orderpriority")) == ((1L, 5L, 0L)))
    // dup key pair among non-null keys: rows 1+2 share key 1 → 1 dupe
    assert(out(("uniqueness", "o_orderkey")) == ((1L, 5L, 0L)))
    // status: 'X' and NULL
    assert(out(("accepted_values", "o_orderstatus")) == ((2L, 5L, 0L)))
    // price: only the strict negative (NULL is completeness's problem)
    assert(out(("non_negative", "o_totalprice")) == ((1L, 5L, 0L)))
    // priority: 'URGENT' and NULL
    assert(out(("pattern", "o_orderpriority")) == ((2L, 5L, 0L)))
    // dates: 1980, NULL, 2005
    assert(out(("date_bounds", "o_orderdate")) == ((3L, 5L, 0L)))
    // orphans: NULL custkey and 99
    assert(out(("referential", "o_custkey")) == ((2L, 5L, 0L)))
    assert(out(("min_size", "*")) == ((0L, 5L, 1L)))
  }

  test("q148 PSI matches an independent driver-side computation (sf0.001)") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    // independent recount: plain Scala, same Laplace smoothing
    def psiFor(dim: String, binOf: ((Long, String, Long)) => String) = {
      val cur = docs.filter(_._1 % 17 != 7).groupBy(binOf).view.mapValues(_.length.toLong).toMap
      val prev = docs.filter(_._1 % 17 != 3).groupBy(binOf).view.mapValues(_.length.toLong).toMap
      val binsK = (cur.keySet ++ prev.keySet).toSeq
      val b = binsK.size.toLong
      val (tc, tp) = (cur.values.sum, prev.values.sum)
      binsK.map { k =>
        val pc = (cur.getOrElse(k, 0L) + 1).toDouble / (tc + b)
        val pp = (prev.getOrElse(k, 0L) + 1).toDouble / (tp + b)
        (dim, k) -> BigDecimal((pc - pp) * math.log(pc / pp))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    val expect = psiFor("lang", _._2) ++ psiFor("n_chars_bin", t => (t._3 / 64).toString)
    val got = Quality.psiDrift(spark, sfDir).collect()
      .map(r => (r.getAs[String]("dim"), r.getAs[String]("bin")) -> r.getAs[Double]("psi6")).toMap
    assert(got === expect)
    // a uniformly-sampled snapshot pair is near-stationary: total PSI
    // per dim stays under the 0.1 "no significant drift" convention
    Seq("lang", "n_chars_bin").foreach { dim =>
      val tot = got.collect { case ((d, _), v) if d == dim => v }.sum
      assert(math.abs(tot) < 0.1, s"$dim PSI $tot")
    }
  }

  test("empty table: min_size fails, every count is zero not null") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val empty = Seq.empty[(Option[Long], Option[Long], Option[String], Option[Double], Option[Timestamp], Option[String])]
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val cust = Seq(10L).toDF("c_custkey")
    val out = byCheck(Quality.qualityChecksFrom(empty, cust).collect())
    assert(out(("min_size", "*")) == ((1L, 0L, 0L)))
    assert(out.collect { case (k, v) if k != (("min_size", "*")) => v }
      .forall { case (v, n, p) => v == 0L && n == 0L && p == 1L })
  }
}
