package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** A fasttext-style LOGISTIC quality classifier — the trainable filter
  * every corpus pipeline runs after the hand-written heuristics (q23)
  * stop scaling: hashed bag-of-words features, weak labels from the
  * heuristic itself (or any labeled sample), and full-batch gradient
  * descent where each epoch computes the EXACT gradient via
  * `treeAggregate` — the [[Trainer.fitDistributed]] posture: map-side
  * partial gradients combine in log depth, the driver syncs one
  * (dim+1)-double vector per epoch, the data never moves.
  *
  * Features are deterministic (md5 bucket hashing, tf-normalized), so
  * retraining on the same snapshot reproduces the same model
  * bit-for-bit given the same epoch count — the reproducibility bar the
  * rest of the repo holds (q60/q85's hash-key family, Trainer's fixed
  * seed).
  *
  * Scoring is a broadcast of ~[[Dim]] doubles applied per partition —
  * linear, shuffle-free, the same shape as the autoencoder scorer
  * (MLP over broadcast weights).
  */
object QualityClassifier {

  val Dim = 1024 // hashed feature buckets (power of two)

  final case class Model(weights: Array[Double], bias: Double) {
    def margin(idx: Array[Int], vals: Array[Double]): Double = {
      var s = bias
      var i = 0
      while (i < idx.length) { s += weights(idx(i)) * vals(i); i += 1 }
      s
    }
    def prob(idx: Array[Int], vals: Array[Double]): Double =
      1.0 / (1.0 + math.exp(-margin(idx, vals)))
  }

  /** One example: sparse tf-normalized hashed unigram counts + label. */
  final case class Example(idx: Array[Int], vals: Array[Double], label: Double)

  /** (doc_id, text, label 0/1) rows → sparse hashed-BOW examples. Pure
    * per-partition map; tokens hash to md5 buckets so two runs (and two
    * engines) bucket identically. */
  def featurize(rows: RDD[(Long, String, Double)]): RDD[(Long, Example)] =
    rows.mapPartitions(_.map { case (id, text, label) =>
      val counts = new java.util.TreeMap[Int, Double]()
      var n = 0
      for (m <- "[a-z0-9]+".r.findAllIn(text)) {
        val b = (Hashing.md5Lower64(m) & (Dim - 1)).toInt
        counts.merge(b, 1.0, (a, x) => a + x)
        n += 1
      }
      val idx = new Array[Int](counts.size)
      val vals = new Array[Double](counts.size)
      val it = counts.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        idx(i) = e.getKey
        vals(i) = if (n == 0) 0.0 else e.getValue / n
        i += 1
      }
      (id, Example(idx, vals, label))
    })

  /** Per-example BCE gradient accumulation into `grad` (layout: Dim
    * weights then bias). Returns the example's loss. */
  private[ml] def accumulate(model: Model, ex: Example,
                             grad: Array[Double]): Double = {
    val p = model.prob(ex.idx, ex.vals)
    val err = p - ex.label
    var i = 0
    while (i < ex.idx.length) {
      grad(ex.idx(i)) += err * ex.vals(i)
      i += 1
    }
    grad(Dim) += err
    val eps = 1e-12
    -(ex.label * math.log(p + eps) + (1 - ex.label) * math.log(1 - p + eps))
  }

  /** Full-batch training with exact treeAggregate gradients and
    * driver-side ADAM (the [[Trainer.fitDistributed]] posture — plain
    * GD on tf-normalized features measured hundreds of epochs to move
    * off the class prior; Adam's per-coordinate scaling reaches the
    * same loss in tens). Returns the fitted model and the per-epoch
    * mean loss. */
  def fitDistributed(data: RDD[Example], epochs: Int = 30,
                     lr: Double = 0.1): (Model, Seq[Double]) = {
    val sc = data.sparkContext
    val params = new Array[Double](Dim + 1) // weights ++ bias
    val m = new Array[Double](Dim + 1)
    val v = new Array[Double](Dim + 1)
    val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)
    val losses = Seq.newBuilder[Double]
    for (t <- 1 to epochs) {
      val bc = sc.broadcast(
        Model(java.util.Arrays.copyOf(params, Dim), params(Dim)))
      val (grad, loss, n) = data.treeAggregate(
        (new Array[Double](Dim + 1), 0.0, 0L))(
        seqOp = { case ((g, l, c), ex) =>
          (g, l + accumulate(bc.value, ex, g), c + 1)
        },
        combOp = { case ((g1, l1, c1), (g2, l2, c2)) =>
          var i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (g1, l1 + l2, c1 + c2)
        })
      bc.destroy()
      val (b1t, b2t) = (1 - math.pow(beta1, t), 1 - math.pow(beta2, t))
      var i = 0
      while (i <= Dim) {
        val gi = grad(i) / n
        m(i) = beta1 * m(i) + (1 - beta1) * gi
        v(i) = beta2 * v(i) + (1 - beta2) * gi * gi
        params(i) -= lr * (m(i) / b1t) / (math.sqrt(v(i) / b2t) + eps)
        i += 1
      }
      losses += loss / n
    }
    (Model(java.util.Arrays.copyOf(params, Dim), params(Dim)), losses.result())
  }

  /** Train on the q23 heuristic's own labels (weak supervision) and
    * score every document: (doc_id, label, prob, pred). The fitted
    * weights broadcast; scoring is one shuffle-free pass. */
  def weakLabelTrainScore(s: SparkSession, d: String, epochs: Int = 30,
                          lr: Double = 2.0): DataFrame = {
    val labeled = graft.text.TextQueries.quality(s, d)
      .select(col("doc_id"), col("quality"))
      .join(graft.ops.Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id")
      .select(col("doc_id"), col("text"),
        when(col("quality") === "good", 1.0).otherwise(0.0).as("y"))
    val rows = labeled.rdd.map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    val examples = featurize(rows)
    examples.persist()
    val (model, _) = fitDistributed(examples.values, epochs, lr)
    val bc = s.sparkContext.broadcast(model)
    val scored = examples.map { case (id, ex) =>
      val p = bc.value.prob(ex.idx, ex.vals)
      Row(id, ex.label, p, if (p >= 0.5) 1.0 else 0.0)
    }
    val df = s.createDataFrame(scored, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("prob",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("pred",
        org.apache.spark.sql.types.DoubleType))))
      // materialize before dropping the feature cache: catalog
      // clearCache (the Verify/Bench hygiene) does not see RDD persists,
      // so nothing here may outlive the call unpersisted
      .localCheckpoint(true)
    examples.unpersist()
    df
  }
}
