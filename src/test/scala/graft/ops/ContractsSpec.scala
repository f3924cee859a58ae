package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q273 data contracts: the green path must be green for exactly the
  * expectations the corpus satisfies, the one deliberately-failing
  * freshness check must report the independently-recounted violation
  * mass, and a corrupted corpus must trip every expectation family. */
class ContractsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("suite shape + green path + the freshness check fails with the exact violation count") {
    val spark = SparkSpec.spark
    val out = Contracts.dataContracts(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.size === 9)

    val stale = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp")).count()
    val nOrders = Tables.orders(spark, sf).count()
    assert(out("orders.o_orderdate >= 2000-01-01") === ((nOrders, stale, stale == 0L)))
    assert(stale > 0L, "fixture assumption: the corpus has pre-2000 orders")

    // every other expectation holds on the clean corpus
    (out - "orders.o_orderdate >= 2000-01-01").foreach { case (e, (_, v, pass)) =>
      assert(pass && v === 0L, s"clean corpus tripped $e with $v violations")
    }
  }

  test("corrupted corpus trips null/unique/consistency/enum/FK/range families") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("contracts").toString

    // documents: one null id, one duplicate id, one n_chars lie, one bad lang
    Seq(
      (Option(1L), "good text", "en", "src0", 9L),
      (Option(2L), "dup", "en", "src0", 3L),
      (Option(2L), "dup", "en", "src0", 3L),
      (None: Option[Long], "null id", "fr", "src1", 7L),
      (Option(3L), "short", "xx", "src1", 99L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // orders: one FK orphan, one non-positive price; dates all fresh
    Seq(
      (1L, 10L, "O", 5.0, "2024-01-02 00:00:00", "1-URGENT"),
      (2L, 999L, "O", -1.0, "2024-01-03 00:00:00", "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "od", "o_orderpriority")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, "c", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // events: one negative value, one outside the window
    Seq(
      (1L, "2024-01-05 00:00:00", 1L, "view", -2.0, "{}"),
      (2L, "2023-12-31 23:59:59", 1L, "click", 1.0, "{}"))
      .toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("tss").cast("timestamp")).drop("tss")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Contracts.dataContracts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("documents.doc_id NOT NULL") === 1L)
    assert(out("documents.doc_id UNIQUE") === 1L)
    assert(out("documents.n_chars = length(text)") === 1L)
    assert(out("documents.lang IN (en,zh,fr,es,de)") === 1L)
    assert(out("orders.o_custkey REFERENCES customer.c_custkey") === 1L)
    assert(out("orders.o_totalprice > 0") === 1L)
    assert(out("orders.o_orderdate >= 2000-01-01") === 0L)
    assert(out("events.value >= 0") === 1L)
    assert(out("events.ts IN [2024-01-01, 2024-02-01)") === 1L)
  }

  test("streaming-gate twin: full-table replay equals q273's row-local rows and counters add") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, sf)
    val gate = graft.streaming.StreamingFraud.contractsGateStream(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = Contracts.dataContracts(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    gate.foreach { case (e, nv) => assert(batch(e) === nv, s"twin drift on $e") }
    assert(gate.size === 3)

    // additivity across micro-batches: two disjoint halves sum to the whole
    val h1 = Contracts.docRowLocalCounts(docs.filter(col("doc_id") % 2 === 0))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val h2 = Contracts.docRowLocalCounts(docs.filter(col("doc_id") % 2 =!= 0))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    gate.foreach { case (e, (n, v)) =>
      assert(h1(e)._1 + h2(e)._1 === n)
      assert(h1(e)._2 + h2(e)._2 === v)
    }
  }
}
