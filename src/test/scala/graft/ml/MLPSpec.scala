package graft.ml

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Exact-value and gradient tests for the from-scratch autoencoder —
  * the correctness backing for q11 and the fraud ML path. */
class MLPSpec extends AnyFunSuite {

  test("forward pass: hand-computed 2→2→1 net") {
    // h = relu(W1 x + b1), y = W2 h + b2
    val net = MLP(Array(
      Layer(Array(Array(1.0, 2.0), Array(-1.0, 0.5)), Array(0.5, -0.25), relu = true),
      Layer(Array(Array(3.0, -2.0)), Array(0.125), relu = false)))
    // x = [1, -1]: pre1 = [1-2+0.5, -1-0.5-0.25] = [-0.5, -1.75] → relu [0, 0]
    assert(net.forward(Array(1.0, -1.0)).toSeq == Seq(0.125))
    // x = [2, 1]: pre1 = [2+2+.5, -2+.5-.25] = [4.5, -1.75] → [4.5, 0]
    // y = 3*4.5 - 0 + 0.125 = 13.625
    assert(net.forward(Array(2.0, 1.0)).toSeq == Seq(13.625))
  }

  test("outputSigmoid squashes the last layer") {
    val id = MLP(Array(Layer(Array(Array(1.0)), Array(0.0), relu = false)),
      outputSigmoid = true)
    assert(math.abs(id.forward(Array(0.0))(0) - 0.5) < 1e-12)
    assert(math.abs(id.forward(Array(100.0))(0) - 1.0) < 1e-12)
  }

  test("reconstructionError is the mean squared diff") {
    val id = MLP(Array(Layer(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0.0, 0.5), relu = false)))
    // xhat = x + [0, 0.5] → mse = (0 + 0.25)/2
    assert(math.abs(id.reconstructionError(Array(3.0, 4.0)) - 0.125) < 1e-12)
  }

  test("backprop gradient matches central finite differences") {
    val dims = Array(4, 5, 3, 5, 4)
    val rng = new Random(11)
    val net = MLP.init(dims, seed = 11L)
    val x = Array.fill(4)(rng.nextDouble() * 2 - 1)
    val analytic = new Array[Double](net.numParams)
    Trainer.backprop(net, x, analytic)
    val flat = MLP.toFlat(net)
    val eps = 1e-6
    // spot-check every 7th parameter (full sweep is slow and redundant)
    var i = 0
    while (i < flat.length) {
      val orig = flat(i)
      flat(i) = orig + eps
      val up = MLP.fromFlat(dims, flat).reconstructionError(x)
      flat(i) = orig - eps
      val dn = MLP.fromFlat(dims, flat).reconstructionError(x)
      flat(i) = orig
      val numeric = (up - dn) / (2 * eps)
      val denom = math.max(1e-8, math.abs(numeric) + math.abs(analytic(i)))
      assert(math.abs(numeric - analytic(i)) / denom < 1e-4,
        s"param $i: analytic=${analytic(i)} numeric=$numeric")
      i += 7
    }
  }

  test("training reduces reconstruction loss") {
    val rng = new Random(5)
    // 1-D manifold in 4-D: points t*(1,2,3,4) — easily compressible
    val data = Array.fill(64) {
      val t = rng.nextDouble()
      Array(t, 2 * t, 3 * t, 4 * t)
    }
    val dims = Array(4, 8, 2, 8, 4)
    def meanLoss(m: MLP): Double = data.map(m.reconstructionError).sum / data.length
    val before = meanLoss(MLP.init(dims, seed = 42L))
    val after = meanLoss(Trainer.fit(data, dims,
      Trainer.Config(epochs = 500, batchSize = 16, seed = 42L)))
    assert(after < before / 4, s"before=$before after=$after")
  }

  test("distributed treeAggregate training reduces loss like the driver loop") {
    val spark = SparkSpec.spark
    val rng = new Random(6)
    val data = Array.fill(64) {
      val t = rng.nextDouble()
      Array(t, 2 * t, 3 * t, 4 * t)
    }
    val dims = Array(4, 8, 2, 8, 4)
    def meanLoss(m: MLP): Double = data.map(m.reconstructionError).sum / data.length
    val before = meanLoss(MLP.init(dims, seed = 42L))
    val rdd = spark.sparkContext.parallelize(data.toSeq, 4)
    val after = meanLoss(Trainer.fitDistributed(rdd, dims,
      Trainer.Config(epochs = 300, lr = 5e-3, seed = 42L)))
    assert(after < before / 2, s"before=$before after=$after")
  }

  test("toFlat/fromFlat round-trip") {
    val net = MLP.init(Array(6, 64, 32, 64, 6), seed = 3L)
    val back = MLP.fromFlat(net.dims, MLP.toFlat(net))
    assert(back.layers.length == net.layers.length)
    net.layers.zip(back.layers).foreach { case (a, b) =>
      assert(a.relu == b.relu)
      assert(a.b.toSeq == b.b.toSeq)
      assert(a.w.map(_.toSeq).toSeq == b.w.map(_.toSeq).toSeq)
    }
  }

  test("MLPStore parquet save/load round-trip (S4)") {
    val spark = SparkSpec.spark
    val net = MLP.init(Array(6, 64, 32, 64, 6), seed = 9L).copy(outputSigmoid = true)
    val dir = java.nio.file.Files.createTempDirectory("mlpstore").toString + "/net"
    MLPStore.save(spark, net, dir)
    val back = MLPStore.load(spark, dir)
    assert(back.outputSigmoid)
    assert(back.dims.toSeq == net.dims.toSeq)
    assert(MLP.toFlat(back).toSeq == MLP.toFlat(net).toSeq)
    val x = Array.fill(6)(0.3)
    assert(back.reconstructionError(x) === net.reconstructionError(x))
  }

  test("fixed oracle net matches its defining formulas") {
    val net = MLQueries.fixedNet
    assert(net.dims.toSeq == Seq(64, 8, 64))
    assert(net.layers(0).relu && !net.layers(1).relu && !net.outputSigmoid)
    assert(net.layers(0).w(0)(0) === MLQueries.fixedW1(1, 1))
    assert(net.layers(1).w(63)(7) === MLQueries.fixedW2(64, 8))
  }
}
