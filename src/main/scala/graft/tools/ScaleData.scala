package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the driver's TPC-H-ish corpus
  * (TESTDATA.md): reproduces every observed convention of the sf0.1
  * tables at `multiplier`× the row counts, so scale claims can be
  * MEASURED instead of argued from plan shape (VERDICT r12 next-round
  * #1). Conventions mirrored from the sf0.1 data itself:
  *
  *  - linear table scaling (customer 15k, supplier 1k, part 20k,
  *    orders 150k, lineitem 600k, events 100k/1 500 users, documents
  *    5k, embeddings 2k — all × multiplier); region/nation are fixed
  *    dims copied verbatim;
  *  - events: ts uniform over 2024-01 (30 days), event_id assigned in
  *    ts order, 5 uniform event types, value ~ Exp(mean 50) rounded to
  *    2dp, props = {"k": 0..99};
  *  - documents: 10–100 words uniform from the SAME 31-word vocab
  *    (vocab-grain ops like q40/q87 must see the same vocabulary, not
  *    a 10× one), lang ~ {en .41, zh/fr/es/de ≈ .15}, source src0–19,
  *    ~0.3% exact dups + ~4.7% near-dups of an earlier doc (5% word
  *    mutation) — the dup mass the dedup family feeds on;
  *  - embeddings: unit-normalized 64-dim gaussians, uniform labels
  *    0–9 (the sf0.1 labels carry NO cluster structure — measured avg
  *    cos-to-centroid 0.06 ≈ random), plus injected near-identical
  *    pairs (the q31 neardup targets).
  *
  * Every value is a pure splitmix64 function of (table-tag, id), so
  * regeneration is bit-identical — the dataset itself is never
  * committed (scaledata/ is gitignored), only measurements are.
  *
  * Usage: runMain graft.tools.ScaleData <srcSfDir> <outDir> <multiplier>
  */
object ScaleData {

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h(tag: Long, id: Long, k: Long): Long =
    mix64(mix64(mix64(tag) ^ id) ^ k)
  /** uniform [0,1) from the hash's top 53 bits */
  private def u(tag: Long, id: Long, k: Long): Double =
    (h(tag, id, k) >>> 11).toDouble / (1L << 53).toDouble
  private def nn(x: Long): Long = x & Long.MaxValue
  private def round2(x: Double): Double = math.rint(x * 100.0) / 100.0
  /** Box–Muller gaussian from two hash uniforms */
  private def gauss(tag: Long, id: Long, k: Long): Double = {
    val u1 = math.max(u(tag, id, 2 * k), 1e-15)
    val u2 = u(tag, id, 2 * k + 1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private val Segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Adjs  = Array("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val Nouns = Array("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val PTypes = Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val Prios = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val Statuses = Array("F", "O", "P")
  private val RFlags = Array("A", "N", "R")
  private val LStats = Array("F", "O")
  private val EventTypes = Array("click", "error", "purchase", "signup", "view")
  private val Langs = Array("zh", "fr", "es", "de")
  private val Vocab = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window")

  private val DayMs = 86400000L
  private def epochDay(y: Int, m: Int, d: Int): Long =
    java.time.LocalDate.of(y, m, d).toEpochDay

  // ---- documents: pure text function of doc_id so a dup can reference
  // ---- its base without a join
  private def freshWords(id: Long): Array[String] = {
    val n = (10 + nn(h(7L, id, 0)) % 91).toInt
    Array.tabulate(n)(i => Vocab((nn(h(7L, id, 100L + i)) % Vocab.length).toInt))
  }
  private[tools] def textFor(id: Long): String = {
    val r = nn(h(8L, id, 0)) % 1000
    if (id >= 20 && r < 3) { // exact duplicate of an earlier doc's FRESH text
      val base = id - 1 - nn(h(8L, id, 1)) % 19
      freshWords(base).mkString(" ")
    } else if (id >= 20 && r < 50) { // near-dup: ~5% of words mutated
      val base = id - 1 - nn(h(8L, id, 1)) % 19
      freshWords(base).zipWithIndex.map { case (w, i) =>
        if (u(8L, id, 200L + i) < 0.05)
          Vocab((nn(h(8L, id, 300L + i)) % Vocab.length).toInt)
        else w
      }.mkString(" ")
    } else freshWords(id).mkString(" ")
  }

  private[tools] def vecFor(id: Long): Array[Float] = {
    val base: Array[Double] =
      if (id >= 17 && nn(h(9L, id, 0)) % 500 == 7) {
        // near-identical pair: tiny perturbation of an earlier vector
        val b = vecFor(id - 17).map(_.toDouble)
        Array.tabulate(64)(i => b(i) + 0.001 * gauss(9L, id, 500L + i))
      } else Array.tabulate(64)(i => gauss(9L, id, i))
    val norm = math.sqrt(base.map(x => x * x).sum)
    base.map(x => (x / norm).toFloat)
  }

  def generate(spark: SparkSession, srcDir: String, outDir: String, mult: Int): Unit = {
    import spark.implicits._
    val P = 32 // generation parallelism
    // The driver's testdata layout is ONE FLAT parquet file per table
    // (DuckDB's oracle views read '<dir>/<t>.parquet' verbatim), so
    // write single-part and move the part file flat. Small row groups
    // (16 MB) keep a single big file splittable for Spark's reader —
    // partition parallelism at read time comes from row-group bounds.
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$outDir/_tmp_$name"
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(tmp)
      val tmpDir = new java.io.File(tmp)
      val part = tmpDir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $tmp"))
      val dest = new java.io.File(s"$outDir/$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      tmpDir.listFiles().foreach(_.delete()); tmpDir.delete()
    }

    // fixed dims: copy verbatim
    for (t <- Seq("region", "nation"))
      write(spark.read.parquet(s"$srcDir/$t.parquet"), t)

    val nCust = 15000L * mult
    val nSupp = 1000L * mult
    val nPart = 20000L * mult
    val nOrd  = 150000L * mult
    val nLine = 600000L * mult
    val nEv   = 100000L * mult
    val nUser = 1500L * mult
    val nDoc  = 5000L * mult
    val nEmb  = 2000L * mult

    write(spark.range(0, nCust, 1, P).map { k =>
      (k, f"Customer#$k%09d", (nn(h(1L, k, 0)) % 25).toInt,
        round2(-1000.0 + u(1L, k, 1) * 11000.0),
        Segments((nn(h(1L, k, 2)) % 5).toInt))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "customer")

    write(spark.range(0, nSupp, 1, P).map { k =>
      (k, f"Supplier#$k%09d", (nn(h(2L, k, 0)) % 25).toInt,
        round2(-1000.0 + u(2L, k, 1) * 11000.0))
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "supplier")

    write(spark.range(0, nPart, 1, P).map { k =>
      (k,
        Adjs((nn(h(3L, k, 0)) % 8).toInt) + " " + Nouns((nn(h(3L, k, 1)) % 8).toInt),
        "Brand#" + (1 + nn(h(3L, k, 2)) % 25),
        PTypes((nn(h(3L, k, 3)) % 6).toInt),
        (1 + nn(h(3L, k, 4)) % 50).toInt,
        (9000L + k % 1000L) / 10.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "part")

    val ordEpoch0 = epochDay(1995, 1, 1)
    val ordDays = epochDay(2001, 8, 1) - ordEpoch0 + 1
    write(spark.range(0, nOrd, 1, P).map { k =>
      (k, nn(h(4L, k, 0)) % nCust,
        Statuses((nn(h(4L, k, 1)) % 3).toInt),
        round2(1000.0 + u(4L, k, 2) * 499000.0),
        (ordEpoch0 + nn(h(4L, k, 3)) % ordDays) * 86400L,
        Prios((nn(h(4L, k, 4)) % 5).toInt))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "od_s", "o_orderpriority")
      .withColumn("o_orderdate", expr("timestamp_seconds(od_s)")).drop("od_s")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
      "orders")

    val shipEpoch0 = epochDay(1995, 1, 2)
    val shipDays = epochDay(2001, 11, 4) - shipEpoch0 + 1
    write(spark.range(0, nLine, 1, P).map { k =>
      (nn(h(5L, k, 0)) % nOrd, nn(h(5L, k, 1)) % nPart, nn(h(5L, k, 2)) % nSupp,
        (1 + nn(h(5L, k, 3)) % 7).toInt,
        (1 + nn(h(5L, k, 4)) % 50).toDouble,
        round2(900.0 + u(5L, k, 5) * 104100.0),
        (nn(h(5L, k, 6)) % 11).toDouble / 100.0,
        (nn(h(5L, k, 7)) % 9).toDouble / 100.0,
        RFlags((nn(h(5L, k, 8)) % 3).toInt),
        LStats((nn(h(5L, k, 9)) % 2).toInt),
        (shipEpoch0 + nn(h(5L, k, 10)) % shipDays) * 86400L)
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "sd_s")
      .withColumn("l_shipdate", expr("timestamp_seconds(sd_s)")).drop("sd_s"),
      "lineitem")

    // events: uniform ts over 30 days, event_id = ts rank (the driver's
    // files are ts-ascending with sequential ids)
    val evStartUs = epochDay(2024, 1, 1) * DayMs * 1000L
    val evSpanUs = 30L * DayMs * 1000L
    val evRaw = spark.range(0, nEv, 1, P).map { k =>
      (evStartUs + nn(h(6L, k, 0)) % evSpanUs,
        nn(h(6L, k, 1)) % nUser,
        EventTypes((nn(h(6L, k, 2)) % 5).toInt),
        round2(-50.0 * math.log1p(-u(6L, k, 3))),
        s"""{"k": ${nn(h(6L, k, 4)) % 100}}""")
    }.toDF("ts_us", "user_id", "event_type", "value", "props")
    import org.apache.spark.sql.expressions.Window
    write(evRaw
      .withColumn("event_id",
        row_number().over(Window.orderBy("ts_us", "user_id")).cast("long") - 1)
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props"),
      "events")

    write(spark.range(0, nDoc, 1, P).map { k =>
      val t = textFor(k)
      val lang =
        if (u(8L, k, 900) < 0.41) "en"
        else Langs((nn(h(8L, k, 901)) % 4).toInt)
      (k, t, lang, "src" + nn(h(8L, k, 902)) % 20, t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars"),
      "documents")

    write(spark.range(0, nEmb, 1, P).map { k =>
      (k, vecFor(k), (nn(h(9L, k, 1000)) % 10).toInt)
    }.toDF("vec_id", "embedding", "label"),
      "embeddings")
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, mult) = args.take(3)
    val spark = graft.Sessions.local("32")
    generate(spark, srcDir, outDir, mult.toInt)
    spark.stop()
  }
}
