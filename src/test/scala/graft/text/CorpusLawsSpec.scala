package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q278: the fits must RECOVER planted exponents — a corpus built with
  * freq ∝ 1/rank must fit Zipf slope ≈ −1, and a corpus built with
  * V(T) = T^0.6 must fit Heaps β ≈ 0.6 — and behave honestly on the
  * fixture corpus (saturated vocab → slope ≈ 0). */
class CorpusLawsSpec extends AnyFunSuite {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap

  test("recovers a planted Zipf slope of -1") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // token r appears floor(2000/r) times, r = 1..200, shuffled into docs
    val toks = (1 to 200).flatMap(r => Seq.fill(2000 / r)(s"t$r"))
    val docs = toks.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val fit = rowsOf(CorpusLaws.lawsFrom(docs))("zipf")
    assert(fit._1 === 200L)
    val slope = fit._2.get
    assert(slope > -1.15 && slope < -0.85, s"zipf slope $slope not ~ -1")
    assert(fit._3.exists(_ > 0.95), s"zipf r2 ${fit._3} too low")
  }

  test("recovers a planted Heaps exponent of 0.6") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // global position t carries token floor(t^0.6): V(T) = floor(T^0.6)
    val toks = (1 to 20000).map(t => s"w${math.pow(t, 0.6).toLong}")
    val docs = toks.grouped(20).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val fit = rowsOf(CorpusLaws.lawsFrom(docs))("heaps")
    val beta = fit._2.get
    assert(beta > 0.5 && beta < 0.7, s"heaps beta $beta not ~ 0.6")
    assert(fit._3.exists(_ > 0.98), s"heaps r2 ${fit._3} too low")
  }

  test("fit is order-free: forced repartition leaves every cell identical") {
    // r17 flake regression pin: the OLS moments are fixed-point BIGINT
    // sums, so ANY partial-aggregation order — here forced by skewed
    // repartitions of the input — must yield bit-identical output.
    val spark = SparkSpec.spark
    import spark.implicits._
    val toks = (1 to 300).flatMap(r => Seq.fill(3000 / r)(s"t$r"))
    val docs = toks.grouped(37).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("law").collect().map(_.toSeq).toSeq
    val base = cells(CorpusLaws.lawsFrom(docs.coalesce(1)))
    for (p <- Seq(3, 7, 32)) {
      val perturbed = cells(CorpusLaws.lawsFrom(docs.repartition(p, docs("doc_id"))))
      assert(perturbed === base, s"fit drifted under repartition($p)")
    }
  }

  test("honest on the saturated-vocabulary fixture corpus") {
    val spark = SparkSpec.spark
    val fits = rowsOf(CorpusLaws.corpusLaws(spark, "/root/testdata/sf0.001"))
    assert(fits("zipf")._2.exists(_ < 0.0), "zipf slope must be negative")
    // the 31-word vocab saturates in the first checkpoint: growth ~ 0
    assert(fits("heaps")._2.exists(b => b >= 0.0 && b < 0.1))
  }
}
