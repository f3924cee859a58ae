package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityClassifierSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("BCE gradient matches the numeric gradient") {
    val ex = QualityClassifier.Example(
      Array(3, 17, 200), Array(0.5, 0.25, 0.25), 1.0)
    val w = Array.tabulate(QualityClassifier.Dim)(i => math.sin(i) * 0.1)
    val b = 0.05
    val grad = new Array[Double](QualityClassifier.Dim + 1)
    QualityClassifier.accumulate(QualityClassifier.Model(w, b), ex, grad)
    val h = 1e-6
    def lossAt(wi: Int, delta: Double): Double = {
      val w2 = w.clone(); var b2 = b
      if (wi < QualityClassifier.Dim) w2(wi) += delta else b2 += delta
      val g = new Array[Double](QualityClassifier.Dim + 1)
      QualityClassifier.accumulate(QualityClassifier.Model(w2, b2), ex, g)
    }
    for (i <- Seq(3, 17, 200, QualityClassifier.Dim)) {
      val numeric = (lossAt(i, h) - lossAt(i, -h)) / (2 * h)
      assert(math.abs(numeric - grad(i)) < 1e-5,
        s"param $i: numeric $numeric vs analytic ${grad(i)}")
    }
  }

  test("distributed training: loss decreases monotonically, beats the prior") {
    val spark = SparkSpec.spark
    val scored = QualityClassifier
      .weakLabelTrainScore(spark, sfDir, epochs = 80)
      .collect().map(r => (r.getDouble(1), r.getDouble(3)))
    val n = scored.length.toDouble
    val posRate = scored.count(_._1 == 1.0) / n
    val prior = math.max(posRate, 1 - posRate)
    val acc = scored.count { case (y, p) => y == p } / n
    info(f"train accuracy $acc%.3f vs majority prior $prior%.3f (n=${n.toInt})")
    assert(acc > prior,
      f"classifier must beat the majority prior: acc $acc%.3f <= $prior%.3f")
    // and training must actually optimize: a label the features encode
    // exactly (contains the token "data") must crater the BCE — Adam is
    // not per-epoch monotone, so total decrease is the contract
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select("doc_id", "text").rdd
      .map(r => (r.getLong(0), r.getString(1),
        if (r.getString(1).contains("data")) 1.0 else 0.0))
    val ex = QualityClassifier.featurize(docs).values
    val (_, losses) = QualityClassifier.fitDistributed(ex, epochs = 100, lr = 0.5)
    assert(losses.last < losses.head * 0.5,
      s"separable labels must halve the BCE: ${losses.head} -> ${losses.last}")
  }
}
