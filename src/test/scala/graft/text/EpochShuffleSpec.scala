package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q201 epoch-shuffle manifest: the two-phase distributed rank must
  * equal a driver-side per-epoch sort, batches must tile each epoch
  * exactly, and distinct epochs must be DIFFERENT permutations. */
class EpochShuffleSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"

  test("epochShuffleManifest equals the driver-side permutation (sf0.01)") {
    val spark = SparkSpec.spark
    val docIds = graft.ops.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0))

    val truth = (0L until CorpusOps.ShuffleEpochs).flatMap { ep =>
      val perm = docIds
        .map(id => (graft.dedup.Hashing.md5Lower64(s"ep:$ep:$id") >>> 11, id))
        .sortBy(identity).map(_._2)
      perm.zipWithIndex.groupBy { case (_, i) => i / CorpusOps.ShuffleBatch }
        .map { case (b, xs) =>
          (ep, b.toLong) -> ((xs.length.toLong, xs.map(_._1).sum))
        }
    }.toMap

    val got = CorpusOps.epochShuffleManifest(spark, dir).collect().map { r =>
      (r.getAs[Long]("epoch"), r.getAs[Long]("batch_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("doc_sum")))
    }.toMap

    assert(got === truth)
    // batches tile each epoch: all full except at most one tail batch,
    // per-epoch doc mass = |D|, and every epoch covers the same corpus
    val byEpoch = got.groupBy(_._1._1)
    assert(byEpoch.size === CorpusOps.ShuffleEpochs)
    byEpoch.foreach { case (_, bs) =>
      assert(bs.values.map(_._1).sum === docIds.length.toLong)
      assert(bs.count(_._2._1 != CorpusOps.ShuffleBatch) <= 1)
      assert(bs.values.map(_._2).sum === docIds.sum)
    }
    // different epochs really are different permutations: some batch
    // checksum must differ across epochs (same corpus, same cuts)
    val batch0 = byEpoch.toSeq.map { case (_, bs) => bs((bs.keys.head._1, 0L))._2 }
    assert(batch0.distinct.size > 1)
  }
}
