package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Hashing

/** The codegen'd hex-parse hash columns must be BIT-IDENTICAL to the
  * JVM [[Hashing.md5Lower64]] derivations they replaced — the oracle
  * SQLs still say `md5_number_lower`, so a single differing bit moves
  * HLL registers, KMV order statistics, and sample keys. Random
  * strings include the degenerate and non-ASCII cases (md5 runs over
  * UTF-8 bytes on both sides).
  */
class Md5ColsSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val samples: Seq[String] = {
    val rnd = new scala.util.Random(11)
    val rand = Seq.fill(300)(rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString)
    rand ++ Seq("", "a", "0", "the", "émile", "日本語テキスト", "naïve café",
      "  spaces  ", "tab\tnl\n", Long.MaxValue.toString, "-1", "🙂🙃")
  }

  test("lower53 column == md5Lower64(s) >>> 11") {
    val got = samples.toDF("w")
      .select(col("w"), md5(col("w").cast("binary")).as("hx"))
      .select(col("w"), Md5Cols.lower53("hx").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == (Hashing.md5Lower64(s) >>> 11), s"w=$s")
    }
  }

  test("lower63 column == md5Lower64(s) & Long.MaxValue") {
    val got = samples.toDF("w")
      .select(col("w"), md5(col("w").cast("binary")).as("hx"))
      .select(col("w"), Md5Cols.lower63("hx").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) == (Hashing.md5Lower64(s) & Long.MaxValue), s"w=$s")
    }
  }

  test("lowBits column == md5Lower64(s) & (2^bits - 1), bits = 7 and 10") {
    for (bits <- Seq(7, 10)) {
      val got = samples.toDF("w")
        .select(col("w"), md5(col("w").cast("binary")).as("hx"))
        .select(col("w"), Md5Cols.lowBits("hx", bits).cast("long").as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      samples.foreach { s =>
        assert(got(s) == (Hashing.md5Lower64(s) & ((1L << bits) - 1)),
          s"bits=$bits w=$s")
      }
    }
  }

  test("native Md5LowerLong == md5Lower64, and the derived 53/63-bit forms") {
    val got = samples.toDF("w")
      .select(col("w"),
        GraftFunctions.md5Lower64(col("w")).as("h64"),
        GraftFunctions.md5Lower53(col("w")).as("h53"),
        GraftFunctions.md5Lower64(col("w")).bitwiseAND(Long.MaxValue).as("h63"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    samples.foreach { s =>
      val h = Hashing.md5Lower64(s)
      assert(got(s) == ((h, h >>> 11, h & Long.MaxValue)), s"w=$s")
    }
  }

  test("md5_lower64 is SQL-registered via GraftExtensions") {
    val r = spark.sql("SELECT md5_lower64('the') AS h").head().getLong(0)
    assert(r == Hashing.md5Lower64("the"))
  }

  test("lower53 accepts an inline digest expression (the sampler form)") {
    val got = samples.zipWithIndex.map { case (_, i) => i.toLong }
      .toDF("doc_id")
      .select(col("doc_id"), Md5Cols.lower53(
        "md5(cast(cast(doc_id as string) as binary))").as("skey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, k) =>
      assert(k == (Hashing.md5Lower64(id.toString) >>> 11))
    }
  }
}
