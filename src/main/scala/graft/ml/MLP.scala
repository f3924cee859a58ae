package graft.ml

import java.util.Random

/** Dense MLP autoencoder — the Spark-native replacement for the
  * reference's PyTorch net (reference: scripts/model_def.py:15-33,
  * train.py:44-81). Architecture 6→64→32→64→6 with ReLU between layers
  * and NO output activation: the reference trains without Sigmoid
  * (train.py:53-57) but scores with it (model_def.py:27) — a documented
  * train/infer mismatch (SURVEY §2.7-1); we standardize on the trained
  * architecture.
  *
  * Plain primitive arrays + while loops: the net is ~9K params, so
  * scoring cost is dominated by memory traffic; this stays allocation-free
  * per layer and needs no native BLAS. The model is a tiny immutable value
  * — broadcast it and score inside whole-stage-friendly UDF/mapPartitions.
  */
final case class Layer(w: Array[Array[Double]], b: Array[Double], relu: Boolean) {
  def outDim: Int = b.length
  def inDim: Int = if (w.length == 0) 0 else w(0).length
}

final case class MLP(layers: Array[Layer]) extends Serializable {
  def forward(x: Array[Double]): Array[Double] = {
    var cur = x
    var l = 0
    while (l < layers.length) {
      val layer = layers(l)
      val out = new Array[Double](layer.outDim)
      var j = 0
      while (j < layer.outDim) {
        val wj = layer.w(j)
        var s = layer.b(j)
        var i = 0
        while (i < wj.length) { s += wj(i) * cur(i); i += 1 }
        out(j) = if (layer.relu && s < 0) 0.0 else s
        j += 1
      }
      cur = out
      l += 1
    }
    cur
  }

  /** Per-row mean squared reconstruction error (reference:
    * run_pipeline.py:64, train.py:91). */
  def reconstructionError(x: Array[Double]): Double = {
    val xhat = forward(x)
    var s = 0.0
    var i = 0
    while (i < x.length) { val dd = x(i) - xhat(i); s += dd * dd; i += 1 }
    s / x.length
  }

  def numParams: Int = layers.map(l => l.outDim * l.inDim + l.outDim).sum
}

object MLP {
  /** Autoencoder dims for input size n: n→64→32→64→n (model_def.py:15-28). */
  def autoencoderDims(inputDim: Int): Array[Int] =
    Array(inputDim, 64, 32, 64, inputDim)

  /** Kaiming-uniform init (PyTorch nn.Linear default), deterministic. */
  def init(dims: Array[Int], seed: Long): MLP = {
    val rng = new Random(seed)
    val layers = (0 until dims.length - 1).map { l =>
      val (nIn, nOut) = (dims(l), dims(l + 1))
      val bound = math.sqrt(1.0 / nIn)
      val w = Array.fill(nOut, nIn)((rng.nextDouble() * 2 - 1) * bound)
      val b = Array.fill(nOut)((rng.nextDouble() * 2 - 1) * bound)
      Layer(w, b, relu = l < dims.length - 2)  // no output activation
    }.toArray
    MLP(layers)
  }
}
