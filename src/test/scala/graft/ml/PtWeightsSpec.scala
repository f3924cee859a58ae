package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Import of the reference's trained checkpoint (S4 / SURVEY §2.6 M4). */
class PtWeightsSpec extends AnyFunSuite {
  private val pt = "/root/reference/models/fraud_autoencoder.pt"

  test("loads the 6→64→32→64→6 net with the expected 9,094 parameters") {
    val net = PtWeights.loadAutoencoder(pt)
    assert(net.dims.toSeq == Seq(6, 64, 32, 64, 6))
    assert(net.numParams === 6 * 64 + 64 + 64 * 32 + 32 + 32 * 64 + 64 + 64 * 6 + 6)
    assert(net.outputSigmoid) // inference architecture (model_def.py:27)
    assert(net.layers.map(_.relu).toSeq == Seq(true, true, true, false))
    // weights are real fp32 values, not zeros/garbage
    val flat = MLP.toFlat(net)
    assert(flat.exists(_ != 0.0))
    assert(flat.forall(v => !v.isNaN && math.abs(v) < 100))
  }

  test("scores are deterministic and in (0,1)-squashed error range") {
    val net = PtWeights.loadAutoencoder(pt)
    val x = Array(0.5, -1.2, 1.0, 0.0, 0.0, 0.0)
    val out = net.forward(x)
    assert(out.length === 6)
    out.foreach(v => assert(v > 0 && v < 1)) // sigmoid output
    assert(net.reconstructionError(x) === net.reconstructionError(x.clone()))
  }
}
