package graft.ml

import java.util.Random

import org.apache.spark.rdd.RDD

/** Adam/MSE training for the autoencoder.
  *
  * Two modes:
  *  - [[Trainer.fit]]: driver-local minibatch Adam — matches the
  *    reference's loop (train.py:41,64-81: batch 64, shuffle, Adam lr=1e-3,
  *    50 epochs, MSE). Right whenever the training sample fits on the
  *    driver (the reference trains on 30 rows; even 10M×6 doubles is
  *    ~500 MB — sample the 100 TB table down to that with `.sample`).
  *  - [[Trainer.fitDistributed]]: full-batch gradient descent where each
  *    epoch computes the exact gradient via `treeAggregate` (map-side
  *    partial gradients, log-depth combine — one tiny driver sync per
  *    epoch, never the data). Adam moments live on the driver; only the
  *    ~9K-param model is broadcast each epoch.
  */
object Trainer {

  final case class Config(
      epochs: Int = 50,
      batchSize: Int = 64,
      lr: Double = 1e-3,
      beta1: Double = 0.9,
      beta2: Double = 0.999,
      eps: Double = 1e-8,
      seed: Long = 42L)

  /** Flattened-gradient Adam state. */
  private final class Adam(n: Int, cfg: Config) {
    private val m = new Array[Double](n)
    private val v = new Array[Double](n)
    private var t = 0
    def step(params: Array[Double], grad: Array[Double]): Unit = {
      t += 1
      val b1t = 1 - math.pow(cfg.beta1, t)
      val b2t = 1 - math.pow(cfg.beta2, t)
      var i = 0
      while (i < n) {
        m(i) = cfg.beta1 * m(i) + (1 - cfg.beta1) * grad(i)
        v(i) = cfg.beta2 * v(i) + (1 - cfg.beta2) * grad(i) * grad(i)
        params(i) -= cfg.lr * (m(i) / b1t) / (math.sqrt(v(i) / b2t) + cfg.eps)
        i += 1
      }
    }
  }

  // flat layout = MLP.toFlat/fromFlat (per-layer row-major weight, bias)
  private def flatten(mlp: MLP): Array[Double] = MLP.toFlat(mlp)
  private def unflatten(flat: Array[Double], template: MLP): MLP =
    MLP.fromFlat(template.dims, flat, template.outputSigmoid)

  /** Backprop for MSE loss: accumulates d(MSE)/d(params) for one sample
    * into `grad` (flattened layout must match [[flatten]]). Returns the
    * sample's MSE. */
  private[ml] def backprop(mlp: MLP, x: Array[Double], grad: Array[Double]): Double = {
    val L = mlp.layers.length
    // forward, keeping pre/post activations
    val acts = new Array[Array[Double]](L + 1)
    acts(0) = x
    val pre = new Array[Array[Double]](L)
    var l = 0
    while (l < L) {
      val layer = mlp.layers(l)
      val z = new Array[Double](layer.outDim)
      var j = 0
      while (j < layer.outDim) {
        val wj = layer.w(j)
        var s = layer.b(j)
        var i = 0
        while (i < wj.length) { s += wj(i) * acts(l)(i); i += 1 }
        z(j) = s
        j += 1
      }
      pre(l) = z
      acts(l + 1) = if (layer.relu) z.map(v => if (v < 0) 0.0 else v) else z
      l += 1
    }
    val out = acts(L)
    val n = x.length
    var mse = 0.0
    // dL/dout for L = mean((x - out)^2)
    var delta = new Array[Double](n)
    var i = 0
    while (i < n) {
      val diff = out(i) - x(i)
      mse += diff * diff
      delta(i) = 2.0 * diff / n
      i += 1
    }
    mse /= n
    // backward
    var gk = grad.length
    l = L - 1
    while (l >= 0) {
      val layer = mlp.layers(l)
      val aIn = acts(l)
      // relu gate on this layer's output
      if (layer.relu) {
        var j = 0
        while (j < delta.length) { if (pre(l)(j) <= 0) delta(j) = 0.0; j += 1 }
      }
      gk -= layer.outDim // bias block
      var j = 0
      while (j < layer.outDim) { grad(gk + j) += delta(j); j += 1 }
      gk -= layer.outDim * layer.inDim // weight block
      j = 0
      while (j < layer.outDim) {
        val base = gk + j * layer.inDim
        val dj = delta(j)
        var ii = 0
        while (ii < layer.inDim) { grad(base + ii) += dj * aIn(ii); ii += 1 }
        j += 1
      }
      // propagate
      if (l > 0) {
        val nd = new Array[Double](layer.inDim)
        j = 0
        while (j < layer.outDim) {
          val wj = layer.w(j)
          val dj = delta(j)
          var ii = 0
          while (ii < layer.inDim) { nd(ii) += wj(ii) * dj; ii += 1 }
          j += 1
        }
        delta = nd
      }
      l -= 1
    }
    mse
  }

  /** Driver-local minibatch Adam (reference-parity training loop). */
  def fit(data: Array[Array[Double]], dims: Array[Int], cfg: Config = Config()): MLP = {
    require(data.nonEmpty, "empty training set")
    var mlp = MLP.init(dims, cfg.seed)
    val flat = flatten(mlp)
    val adam = new Adam(flat.length, cfg)
    val rng = new Random(cfg.seed)
    val idx = data.indices.toArray
    for (_ <- 1 to cfg.epochs) {
      // Fisher-Yates shuffle (DataLoader shuffle=True, train.py:41)
      var i = idx.length - 1
      while (i > 0) { val j = rng.nextInt(i + 1); val t = idx(i); idx(i) = idx(j); idx(j) = t; i -= 1 }
      var start = 0
      while (start < idx.length) {
        val end = math.min(start + cfg.batchSize, idx.length)
        val grad = new Array[Double](flat.length)
        var k = start
        while (k < end) { backprop(mlp, data(idx(k)), grad); k += 1 }
        val bs = end - start
        var g = 0
        while (g < grad.length) { grad(g) /= bs; g += 1 }
        adam.step(flat, grad)
        mlp = unflatten(flat, mlp)
        start = end
      }
    }
    mlp
  }

  /** Distributed full-batch Adam: exact gradient per epoch via
    * treeAggregate (partial gradients combine in log depth; the driver
    * only ever sees ~9K doubles). */
  def fitDistributed(data: RDD[Array[Double]], dims: Array[Int],
                     cfg: Config = Config(epochs = 200)): MLP =
    fitDistributedWithLoss(data, dims, cfg)._1

  /** [[fitDistributed]] also returning the per-epoch mean training
    * loss (pre-step MSE, the number the backprop pass computes anyway)
    * — the trajectory [[fitFullBatch]] parity-checks. The loss rides
    * in the same treeAggregate as the gradient: zero extra passes. */
  def fitDistributedWithLoss(data: RDD[Array[Double]], dims: Array[Int],
                             cfg: Config = Config(epochs = 200)): (MLP, Array[Double]) = {
    var mlp = MLP.init(dims, cfg.seed)
    val flat = flatten(mlp)
    val adam = new Adam(flat.length, cfg)
    val losses = new Array[Double](cfg.epochs)
    val sc = data.sparkContext
    for (e <- 0 until cfg.epochs) {
      val bc = sc.broadcast(mlp)
      val (grad, n, lsum) = data.treeAggregate(
        (new Array[Double](flat.length), 0L, 0.0))(
        seqOp = { case ((g, c, l), x) =>
          val mse = backprop(bc.value, x, g); (g, c + 1, l + mse) },
        combOp = { case ((g1, c1, l1), (g2, c2, l2)) =>
          var i = 0
          while (i < g1.length) { g1(i) += g2(i); i += 1 }
          (g1, c1 + c2, l1 + l2)
        })
      bc.destroy()
      var i = 0
      while (i < grad.length) { grad(i) /= math.max(n, 1L); i += 1 }
      losses(e) = lsum / math.max(n, 1L)
      adam.step(flat, grad)
      mlp = unflatten(flat, mlp)
    }
    (mlp, losses)
  }

  /** Driver-local FULL-batch Adam with per-epoch mean loss — the
    * sequential reference [[fitDistributedWithLoss]] must reproduce:
    * identical math (same init, same Adam, same average-gradient
    * step), with single-threaded left-to-right summation where the
    * distributed pass sums per-partition then tree-combines. Any
    * trajectory divergence beyond floating-point reassociation noise
    * is a distribution bug, which is exactly what the parity spec
    * asserts against. */
  def fitFullBatch(data: Array[Array[Double]], dims: Array[Int],
                   cfg: Config = Config(epochs = 200)): (MLP, Array[Double]) = {
    require(data.nonEmpty, "empty training set")
    var mlp = MLP.init(dims, cfg.seed)
    val flat = flatten(mlp)
    val adam = new Adam(flat.length, cfg)
    val losses = new Array[Double](cfg.epochs)
    for (e <- 0 until cfg.epochs) {
      val grad = new Array[Double](flat.length)
      var lsum = 0.0
      var k = 0
      while (k < data.length) { lsum += backprop(mlp, data(k), grad); k += 1 }
      var g = 0
      while (g < grad.length) { grad(g) /= data.length; g += 1 }
      losses(e) = lsum / data.length
      adam.step(flat, grad)
      mlp = unflatten(flat, mlp)
    }
    (mlp, losses)
  }
}
