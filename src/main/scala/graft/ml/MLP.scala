package graft.ml

import java.util.Random

/** Dense MLP autoencoder — the Spark-native replacement for the
  * reference's PyTorch net (reference: scripts/model_def.py:15-33,
  * train.py:44-81). Architecture 6→64→32→64→6 with ReLU between layers.
  *
  * The reference trains WITHOUT an output activation (train.py:53-57)
  * but scores with a trailing Sigmoid (model_def.py:27) — a documented
  * train/infer mismatch (SURVEY §2.7-1). We default to the trained
  * architecture (no output activation) and expose `outputSigmoid` so the
  * reference's inference behavior can be reproduced exactly when parity
  * against its published scores is wanted.
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

final case class MLP(layers: Array[Layer], outputSigmoid: Boolean = false)
    extends Serializable {
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
    if (outputSigmoid) {
      var i = 0
      while (i < cur.length) { cur(i) = 1.0 / (1.0 + math.exp(-cur(i))); i += 1 }
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

  def dims: Array[Int] =
    if (layers.isEmpty) Array.empty else layers(0).inDim +: layers.map(_.outDim)
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

  /** Build an MLP from per-layer flattened (row-major weight, bias)
    * buffers — the persistence/import layout. relu on all but the last
    * layer. */
  def fromFlat(dims: Array[Int], flat: Array[Double], outputSigmoid: Boolean = false): MLP = {
    var k = 0
    val layers = (0 until dims.length - 1).map { l =>
      val (nIn, nOut) = (dims(l), dims(l + 1))
      val w = Array.tabulate(nOut) { j =>
        val row = java.util.Arrays.copyOfRange(flat, k, k + nIn); k += nIn; row
      }
      val b = java.util.Arrays.copyOfRange(flat, k, k + nOut); k += nOut
      Layer(w, b, relu = l < dims.length - 2)
    }.toArray
    require(k == flat.length, s"weight buffer length ${flat.length} != expected $k")
    MLP(layers, outputSigmoid)
  }

  /** Per-layer flattened (row-major weight, bias) buffer — inverse of
    * [[fromFlat]]. */
  def toFlat(mlp: MLP): Array[Double] = {
    val out = new Array[Double](mlp.numParams)
    var k = 0
    mlp.layers.foreach { l =>
      l.w.foreach { row => System.arraycopy(row, 0, out, k, row.length); k += row.length }
      System.arraycopy(l.b, 0, out, k, l.b.length); k += l.b.length
    }
    out
  }
}
