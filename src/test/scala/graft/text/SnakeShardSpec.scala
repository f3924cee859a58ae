package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q172 snake shards: the LPT-style balance guarantee and the scale
  * invariants — every shard populated, assignment a permutation-stable
  * function of rank, and no unpartitioned window anywhere (the rank
  * comes from the two-phase prefix sum). */
class SnakeShardSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.01"

  test("q172 shard token masses balance within one max-document") {
    val spark = SparkSpec.spark
    val out = CorpusOps.snakeShards(spark, sfDir).cache()
    try {
      val masses = out.groupBy("shard").agg(sum("n_tok").as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(masses.keySet === (0L until CorpusOps.SnakeShardCount).toSet)
      val maxDoc = out.agg(max("n_tok")).head().getLong(0)
      val spread = masses.values.max - masses.values.min
      // snake over a desc-sorted deal: any two shards differ by less
      // than the largest single document's mass
      assert(spread <= maxDoc, s"spread $spread > max doc $maxDoc")
    } finally { out.unpersist(); () }
  }

  test("q172 assigns every doc exactly once and shards are 0..S-1") {
    val spark = SparkSpec.spark
    val out = CorpusOps.snakeShards(spark, sfDir)
    val n = out.count()
    assert(out.select("doc_id").distinct().count() === n)
    val bad = out.where(col("shard") < 0 ||
      col("shard") >= CorpusOps.SnakeShardCount).count()
    assert(bad === 0L)
  }

  test("q172 plan has no unpartitioned window (two-phase rank)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = CorpusOps.snakeShards(spark, sfDir).queryExecution.executedPlan
    val unpartitioned = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty, s"single-task global window: $unpartitioned")
  }
}
