package graft.ml

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.ZipFile
import scala.collection.JavaConverters._

/** Import of the reference's trained autoencoder checkpoint
  * (`models/fraud_autoencoder.pt`, written by torch.save at reference
  * train.py:84 and loaded at run_pipeline.py:57-60).
  *
  * The .pt container is a plain zip: `<name>/data.pkl` (a pickle of the
  * state dict whose storages are numbered in insertion order) plus one
  * raw little-endian float32 buffer per tensor at `<name>/data/<N>`
  * (verified: `<name>/byteorder` = "little"; storage N ↔ the N-th
  * state-dict entry). For the fixed architecture the state-dict order is
  * encoder.0.{weight,bias}, encoder.2.{weight,bias},
  * decoder.0.{weight,bias}, decoder.2.{weight,bias}, so the buffers can
  * be bound by (order, byte-size) without a pickle parser. Sizes are
  * cross-checked against the expected shapes and the load fails loudly
  * on any mismatch.
  *
  * Binding caveat: storage-number order ≡ state-dict insertion order is
  * an observed property of this checkpoint, not a .pt format guarantee —
  * equal-size tensors (encoder.2.weight / decoder.0.weight, both 2048
  * floats) could not be distinguished by the size check alone if a
  * different torch version renumbered storages. The golden-parity suite
  * (`MLPSpec`) pins the loaded net's scores against
  * `data/results/fraud_results.csv`, so a mis-bind fails CI for the one
  * checkpoint this loader targets; loading OTHER checkpoints needs a
  * data.pkl key parser first.
  */
object PtWeights {

  /** Load an autoencoder checkpoint with the reference architecture
    * inputDim→64→32→64→inputDim. `outputSigmoid = true` reproduces the
    * reference's INFERENCE net (model_def.py:27); false gives the
    * architecture it actually trained (train.py:53-57). */
  def loadAutoencoder(path: String, inputDim: Int = 6,
                      outputSigmoid: Boolean = true): MLP = {
    val dims = MLP.autoencoderDims(inputDim)
    // per-layer (weight, bias) element counts, state-dict order
    val expected: Array[Int] = dims.sliding(2).flatMap { case Array(nIn, nOut) =>
      Seq(nOut * nIn, nOut)
    }.toArray
    val zip = new ZipFile(path)
    try {
      val dataEntry = "^.*/data/(\\d+)$".r
      val buffers = zip.entries().asScala.toSeq
        .flatMap { e =>
          e.getName match {
            case dataEntry(n) => Some(n.toInt -> e)
            case _            => None
          }
        }
        .sortBy(_._1)
        .map { case (_, e) =>
          val bytes = new Array[Byte](e.getSize.toInt)
          val in = zip.getInputStream(e)
          var off = 0
          while (off < bytes.length) {
            val r = in.read(bytes, off, bytes.length - off)
            require(r > 0, s"truncated buffer ${e.getName}")
            off += r
          }
          in.close()
          val fb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
          val out = new Array[Double](fb.remaining())
          var i = 0
          while (i < out.length) { out(i) = fb.get(i).toDouble; i += 1 }
          out
        }
      require(buffers.length == expected.length,
        s"expected ${expected.length} tensors, found ${buffers.length} in $path")
      buffers.zip(expected).zipWithIndex.foreach { case ((buf, exp), i) =>
        require(buf.length == exp,
          s"tensor $i: expected $exp floats, found ${buf.length} — architecture mismatch")
      }
      MLP.fromFlat(dims, buffers.flatten.toArray, outputSigmoid)
    } finally zip.close()
  }
}
