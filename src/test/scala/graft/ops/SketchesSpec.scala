package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SketchesSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("MinKDistinct buffer: insert/merge equal sorted-distinct-bottom-k") {
    val k = 16
    val agg = new Sketches.MinKDistinct(k)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val xs = Array.fill(200)(rnd.nextInt(50).toLong) // heavy duplicates
      val ys = Array.fill(200)(rnd.nextInt(50).toLong)
      val bufX = xs.foldLeft(agg.zero)(agg.reduce)
      val bufY = ys.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(bufX, bufY)
      val expect = (xs ++ ys).distinct.sorted.take(k).toSeq
      assert(merged.toSeq === expect)
    }
  }

  test("KMV estimate is exact below k and within 4/sqrt(k-1) above it") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // below k: the sketch IS the key set (sf0.001 has < 1024 partkeys)
    val exactSmall = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(exactSmall < Sketches.KmvK)
    val r = Sketches.kmvDistinct(spark, sfDir).head()
    assert(r.getLong(0) === exactSmall)
    assert(r.getDouble(2) === exactSmall.toDouble)
    // above k: estimator error bound on a synthetic 50k-key stream
    val n = 50000
    val hashes = (0 until n).map(i =>
      graft.dedup.Hashing.md5Lower64(i.toString) & Long.MaxValue)
    val agg = new Sketches.MinKDistinct(Sketches.KmvK)
    val buf = hashes.foldLeft(agg.zero)(agg.reduce)
    val est = (Sketches.KmvK - 1).toDouble * math.pow(2, 63) / buf.last
    val relErr = math.abs(est - n) / n
    assert(relErr < 4.0 / math.sqrt(Sketches.KmvK - 1.0),
      s"KMV rel err $relErr out of bound (est $est vs $n)")
  }

  test("count-min estimates never undercount and match exact at low load") {
    val spark = SparkSpec.spark
    val rows = Sketches.countMinFreq(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"suppkey ${r.getLong(0)}: est $est < exact $exact")
    }
    // sf0.001 has ~6k lineitem rows over 4096 cells — collisions are
    // rare enough that most probes are exact; all of them overestimate
    assert(rows.count(r => r.getLong(1) === r.getLong(2)) >= 10)
  }

  test("Misra–Gries never misses a key above N/(k+1), under any split/merge") {
    val k = 8
    val agg = new Sketches.MisraGries(k)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      // zipf-ish planted stream: key i gets ~N/2^i occurrences + noise tail
      val stream = rnd.shuffle(
        (0 until 6).flatMap(i => Seq.fill(1 << (9 - i))(s"hh_$i")) ++
          (0 until 400).map(i => s"tail_${trial}_$i"))
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val must = exact.collect { case (w, c) if c > n / (k + 1) => w }.toSet
      // random split into 4 partitions, reduce each, merge pairwise
      val parts = stream.grouped(stream.size / 4 + 1).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val (mg, nGot) = agg.finish(parts.reduce(agg.merge))
      assert(nGot === n)
      assert(mg.size <= k, s"summary exceeded capacity: ${mg.size}")
      assert(must.subsetOf(mg.toSet),
        s"missed heavy keys: ${must -- mg.toSet} (n=$n, threshold=${n / (k + 1)})")
    }
  }

  test("Misra–Gries composes under groupBy: per-lang candidates cover per-lang heavies") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
    val k = 16 // small capacity so the guarantee actually binds per lang
    val got = toks.groupBy("lang")
      .agg(Sketches.misraGries(k)(col("w")).as("mg"))
      .select(col("lang"), col("mg._1").as("cands"), col("mg._2").as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1).toSet, r.getLong(2))).toMap
    val exact = toks.groupBy("lang", "w").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    exact.foreach { case (lang, rows) =>
      val (cands, n) = got(lang)
      assert(n === rows.map(_._3).sum)
      val must = rows.collect { case (_, w, c) if c > n / (k + 1) => w }.toSet
      assert(must.subsetOf(cands),
        s"lang=$lang missed heavy keys: ${must -- cands}")
    }
  }

  test("q91 heavy hitters equal the brute-force exact answer (sf0.001)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
    val n = toks.count()
    val expect = toks.groupBy("w").count()
      .filter(col("count") * Sketches.MgK > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = Sketches.heavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(got.forall(_._2 * Sketches.MgK > n))
  }

  // driver-side replica of the q117/q118 register algebra
  private def driverRegisters(tokens: Iterable[String]): Array[Long] = {
    val regs = Array.fill(Sketches.HllM)(0L)
    tokens.foreach { w =>
      val h = graft.dedup.Hashing.md5Lower64(w) >>> 11
      val reg = (h % Sketches.HllM).toInt
      val v = h >>> Sketches.HllP
      val rank =
        if (v == 0L) Sketches.HllW + 1
        else Sketches.HllW + 1 - v.toBinaryString.length
      if (rank > regs(reg)) regs(reg) = rank.toLong
    }
    regs
  }
  private def denom(regs: Array[Long]): Long =
    regs.map(r => Sketches.HllScale >> r.toInt).sum
  /** Standard HLL estimate with the small-range correction, from the
    * integer cells the queries emit — the display-side math the
    * docstring promises. */
  private def estimate(mUsed: Long, denomX2p50: Long): Double = {
    val m = Sketches.HllM.toDouble
    val alpha = 0.7213 / (1 + 1.079 / m)
    val e = alpha * m * m * Sketches.HllScale / denomX2p50
    val zeros = Sketches.HllM - mUsed
    if (e < 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
  }

  test("q117 register cells equal the driver-side replica exactly (sf0.001)") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    def toks(t: String): Seq[String] =
      "[a-z0-9]+".r.findAllIn(t).toSeq
    val expect = docs.groupBy(_._1).map { case (lang, ds) =>
      val regs = driverRegisters(ds.flatMap(d => toks(d._2)))
      lang -> (regs.count(_ > 0).toLong, regs.sum, denom(regs))
    }
    val got = Sketches.hllDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expect)
  }

  test("q117 estimate lands within 3 standard errors of exact distinct") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions._
    val exact = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
      .groupBy("lang").agg(countDistinct("w").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Sketches.hllDistinct(spark, sfDir).collect()
    assert(rows.length === exact.size)
    rows.foreach { r =>
      val (lang, mUsed, dn) = (r.getString(0), r.getLong(1), r.getLong(3))
      val est = estimate(mUsed, dn)
      val tol = 3 * 1.04 / math.sqrt(Sketches.HllM.toDouble)
      assert(math.abs(est - exact(lang)) <= tol * exact(lang),
        s"lang=$lang est=$est exact=${exact(lang)}")
    }
  }

  test("q118 union denominators equal a sketch built on the union corpus") {
    val spark = SparkSpec.spark
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    def toks(t: String): Seq[String] = "[a-z0-9]+".r.findAllIn(t).toSeq
    val bySrc = docs.groupBy(_._1)
      .map { case (s, ds) => s -> driverRegisters(ds.flatMap(d => toks(d._2))) }
    val rows = Sketches.hllSourceUnion(spark, sfDir).collect()
    val srcs = bySrc.keys.toSeq.sorted
    assert(rows.length === srcs.size * (srcs.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      // merge = elementwise max — identical to sketching A∪B's tokens
      // directly, which is the property the whole design rests on
      val merged = bySrc(a).zip(bySrc(b)).map { case (x, y) => math.max(x, y) }
      val direct = driverRegisters(
        docs.filter(d => d._1 == a || d._1 == b).flatMap(d => toks(d._2)))
      assert(merged.toSeq === direct.toSeq, s"merge != direct for ($a,$b)")
      assert(r.getLong(2) === bySrc(a).count(_ > 0).toLong)
      assert(r.getLong(3) === bySrc(b).count(_ > 0).toLong)
      assert(r.getLong(4) === merged.count(_ > 0).toLong)
      assert(r.getLong(5) === denom(bySrc(a)))
      assert(r.getLong(6) === denom(bySrc(b)))
      assert(r.getLong(7) === denom(merged))
    }
  }

  test("q132 checksum equals the driver fold, ignores order, and localizes a dropped row") {
    val spark = SparkSpec.spark
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = cells(Sketches.tableChecksum(spark, sfDir))
    // driver-side fold over the same stable rendering
    val rows = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus").collect()
      .map(r => graft.dedup.Hashing.md5Lower64(
        s"ck:|${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}") & Long.MaxValue)
    val truth = rows.groupBy(_ % Sketches.CkBuckets).map { case (b, hs) =>
      b -> ((hs.length.toLong, hs.reduce(_ ^ _)))
    }
    assert(got === truth)
    // order/partitioning invariance is the point of the XOR fold
    val shuffled = cells(Sketches.tableChecksum(spark, sfDir))
    assert(shuffled === got)
    // dropping one row flips EXACTLY its own bucket: count -1, xor ^ h
    val h0 = rows.head
    val without = rows.tail.groupBy(_ % Sketches.CkBuckets).map { case (b, hs) =>
      b -> ((hs.length.toLong, hs.reduce(_ ^ _)))
    }
    val diff = truth.keySet.filter(b => truth.get(b) != without.get(b))
    assert(diff === Set(h0 % Sketches.CkBuckets))
    assert(without(h0 % Sketches.CkBuckets) ===
      ((truth(h0 % Sketches.CkBuckets)._1 - 1, truth(h0 % Sketches.CkBuckets)._2 ^ h0)))
  }

  test("q133 CMS join estimate bounds the exact size from above, within 10% (2 SFs)") {
    val spark = SparkSpec.spark
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val r = Sketches.joinCardinality(spark, dir).head()
      val (exact, est) = (r.getLong(0), r.getLong(1))
      // exact replica: driver-side key-count dot product
      val li = Tables.lineitem(spark, dir)
        .selectExpr("l_partkey", "l_returnflag", "l_quantity").collect()
      val ca = li.filter(_.getString(1) == "R").groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
      val cb = li.filter(_.getDouble(2) > 30).groupBy(_.getLong(0)).view.mapValues(_.length.toLong)
      val trueSize = ca.keys.map(k => ca(k) * cb.getOrElse(k, 0L)).sum
      assert(exact === trueSize, s"dir=$dir")
      // CMS inner product NEVER underestimates (all contributions positive)
      assert(est >= exact, s"dir=$dir")
      assert(est - exact <= exact / 10, s"dir=$dir: est $est vs exact $exact")
    }
  }

  test("q137 snapshot diff statuses are exactly the constructed drift buckets") {
    val spark = SparkSpec.spark
    import org.apache.spark.sql.functions.col
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = Sketches.snapshotDiff(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // no key appears twice, and every emitted key exists in the corpus
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.forall(p => ids.contains(p._1)))
    // the drift is exactly the three constructed buckets — nothing else
    val byStatus = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byStatus.keySet == Set("added", "removed", "changed"))
    assert(byStatus("added")   == ids.filter(_ % Sketches.DiffMod == Sketches.DiffAddBucket))
    assert(byStatus("removed") == ids.filter(_ % Sketches.DiffMod == Sketches.DiffRemBucket))
    assert(byStatus("changed") == ids.filter(_ % Sketches.DiffMod == Sketches.DiffChgBucket))
    // the unit entry: identical fingerprint frames diff to EMPTY —
    // unchanged rows must never reach the output
    val fp = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.md5Lower64(col("text")).as("cur_fp"))
    assert(Sketches.snapshotDiffFrom(
      fp, fp.withColumnRenamed("cur_fp", "prev_fp")).count() == 0L)
  }

  test("q182 theta set-ops: estimates track exact union/intersection within error bounds") {
    val spark = graft.SparkSpec.spark
    val dir = "/root/testdata/sf0.01"
    // exact per-source distinct 3-gram sets, driver-side
    val srcGrams = graft.ops.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap(r => graft.dedup.Hashing
          .wordShingles(r.getString(1), Sketches.SetOpGramN)).toSet
      }
    val rows = Sketches.kmvSetOps(spark, dir).collect()
    assert(rows.length ==
      srcGrams.size * (srcGrams.size - 1) / 2, "one row per source pair")
    // KMV relative standard error ~ 1/sqrt(k-1); allow 5 sigma on the
    // union (the better-conditioned estimate), absolute slack on the
    // intersection (small-overlap estimates are noisy in absolute terms)
    val rse = 1.0 / math.sqrt(Sketches.SetOpK - 1.0)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val exactU = (srcGrams(a) union srcGrams(b)).size.toDouble
      val exactI = (srcGrams(a) intersect srcGrams(b)).size.toDouble
      assert(math.abs(r.getAs[Double]("est_union") - exactU) <= 5 * rse * exactU,
        s"union $a-$b: est ${r.getAs[Double]("est_union")} vs exact $exactU")
      assert(math.abs(r.getAs[Double]("est_inter") - exactI) <=
        5 * rse * exactU, // error scales with the SKETCHED universe, not the overlap
        s"inter $a-$b: est ${r.getAs[Double]("est_inter")} vs exact $exactI")
      // the sketch machinery itself is integral and bounded
      assert(r.getAs[Long]("n_a") <= Sketches.SetOpK &&
        r.getAs[Long]("n_b") <= Sketches.SetOpK &&
        r.getAs[Long]("n_inter") <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
    // the driver corpus must actually exercise the sub-θ sketch path
    assert(rows.forall(_.getAs[Long]("theta") < Long.MaxValue))
  }

  test("q247 join-order advisor: CMS estimates upper-bound exacts and pick the exact order here") {
    val spark = graft.SparkSpec.spark
    val r = Sketches.joinOrderAdvisor(spark, "/root/testdata/sf0.01").collect()
    assert(r.length === 1)
    val row = r.head
    val (estLo, estOc) = (row.getAs[Long]("est_lo"), row.getAs[Long]("est_oc"))
    val (exLo, exOc) = (row.getAs[Long]("exact_lo"), row.getAs[Long]("exact_oc"))
    // CMS inner product never under-estimates (Cormode & Muthukrishnan)
    assert(estLo >= exLo && estOc >= exOc)
    assert(row.getAs[String]("sketch_order") ===
      (if (estLo <= estOc) "lineitem_orders_first" else "orders_customer_first"))
    // on the driver corpus the orders differ by ~8x — the sketch must get it
    assert(row.getAs[Long]("agree") === 1L)
  }
}
