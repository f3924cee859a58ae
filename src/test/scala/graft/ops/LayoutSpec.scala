package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q126 z-order layout: the Morton expression must equal the
  * bit-interleave definition, and the layout must actually prune —
  * fewer files touched than the linear layout for the same rect. */
class LayoutSpec extends AnyFunSuite {

  private def mortonRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("engine-portable arithmetic equals the shift-based Morton curve on the full grid") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val side = 1 << Layout.ZBits
    val grid = (for (x <- 0L until side; y <- 0L until side) yield (x, y)).toDF("x", "y")
    val got = grid.withColumn("z", expr(Layout.mortonExpr("x", "y", "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (x <- 0L until side; y <- 0L until side)
      assert(got((x, y)) == mortonRef(x, y), s"($x, $y)")
  }

  test("every file's bounding box is at most a 4x4 cell block (sf0.01)") {
    val spark = SparkSpec.spark
    val files = Layout.zorderLayout(spark, "/root/testdata/sf0.01").collect()
    assert(files.nonEmpty)
    files.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 3, s"wide x box: $r")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 3, s"wide y box: $r")
    }
  }

  test("q136 compaction plan: every non-final group payload lands within one max-file of target (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val maxFile = docs.groupBy("lang")
      .agg(max("n_chars").as("mx"), sum("n_chars").as("tot"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("mx"), r.getAs[Long]("tot"), r.getAs[Long]("n")))).toMap
    val plan = Layout.compactionPlan(spark, d).collect()
      .groupBy(_.getAs[String]("lang"))
    assert(plan.keySet == maxFile.keySet)
    val t = Layout.CompactTarget
    plan.foreach { case (lang, rows) =>
      val (mx, tot, n) = maxFile(lang)
      val sorted = rows.sortBy(_.getAs[Long]("bin_id"))
      // bin ids are the dense prefix 0..k (first-fit never skips a bin)
      assert(sorted.map(_.getAs[Long]("bin_id")).toSeq ==
        (0L until sorted.length.toLong), s"$lang bin ids not dense")
      // conservation: the plan rebins every file and every byte
      assert(sorted.map(_.getAs[Long]("n_files")).sum == n, s"$lang file count")
      assert(sorted.map(_.getAs[Long]("bytes")).sum == tot, s"$lang byte total")
      // the OPTIMIZE guarantee: all but the partition's last group sit
      // within one max-file-size of the target payload
      sorted.dropRight(1).foreach { r =>
        val b = r.getAs[Long]("bytes")
        assert(b >= t - mx && b < t + mx,
          s"$lang bin ${r.getAs[Long]("bin_id")}: $b outside [${t - mx}, ${t + mx})")
      }
    }
  }

  test("applyCompactionPlan rewrites into exactly the planned bins: one file each, payloads match, reads identical (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val plan = Layout.compactionPlan(spark, d).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin_id")) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("bytes")))).toMap
    val out = java.nio.file.Files.createTempDirectory("compact_apply").toString
    Layout.applyCompactionPlan(docs, out)
    // one physical parquet file per planned (lang, bin) group, no strays
    val binDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(langDir => langDir.listFiles().filter(_.isDirectory)
        .map(binDir => (langDir.getName.stripPrefix("lang="),
          binDir.getName.stripPrefix("bin_id=").toLong) ->
          binDir.listFiles().count(f => f.getName.endsWith(".parquet")))).toMap
    assert(binDirs.keySet === plan.keySet)
    binDirs.foreach { case (k, nFiles) => assert(nFiles == 1, s"$k has $nFiles files") }
    // read-back: per-bin row count and payload equal the manifest
    val back = spark.read.parquet(out)
    val gotBins = back.groupBy(col("lang"), col("bin_id").cast("long").as("bin_id"))
      .agg(count(lit(1)).as("n"), sum("n_chars").as("b")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(gotBins === plan)
    // rows survive the rewrite bit-identically (doc grain)
    val origRows = docs.select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSet
    val backRows = back.select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSet
    assert(backRows === origRows)
    // the layout's read payoff: a per-lang scan partition-prunes to
    // exactly that lang's planned file set (the scan METRIC, not
    // `inputFiles`, which reports the unpruned relation)
    val enQ = back.filter(col("lang") === "en")
    enQ.collect()
    val enFiles = enQ.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(enFiles == plan.keys.count(_._1 == "en"), s"en scan touched $enFiles files")
    assert(enFiles < binDirs.size)
  }

  test("range-partition plan balances within 2x of ideal and covers disjoint ranges (sf0.01)") {
    val spark = SparkSpec.spark
    val rows = Layout.rangePartitionPlan(spark, "/root/testdata/sf0.01")
      .collect().sortBy(_.getAs[Long]("part_id"))
    assert(rows.map(_.getAs[Long]("part_id")).toSeq ==
      (0L until Layout.RpPartitions.toLong))
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val ideal = total.toDouble / Layout.RpPartitions
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(n >= ideal / 2 && n <= ideal * 2, s"unbalanced partition: $r (ideal $ideal)")
    }
    // ranges are disjoint and ordered: each partition's min exceeds
    // the previous partition's max
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("min_key") > a.getAs[Long]("max_key"), s"overlap: $a / $b")
    }
  }

  test("range-partition boundaries are lower-inclusive and repartition-invariant") {
    val spark = SparkSpec.spark
    import spark.implicits._
    // 80 distinct values: sample = population (K=256 > 80), so the
    // plan must equal the exact ceil-rank reference computed here
    val vals = (0L until 80L).map(i => 1000L + 7L * i) // distinct, unordered ties impossible
    val docs = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "n_chars")
    val sorted = vals.sorted
    val p = Layout.RpPartitions
    val bnds = (1 until p).map(i => sorted((sorted.size * i + p - 1) / p - 1))
    val expected = vals.groupBy(v => bnds.count(_ <= v).toLong).map { case (pid, vs) =>
      pid -> ((vs.size.toLong, vs.min, vs.max))
    }
    val plan = Layout.rangePartitionPlanFrom(docs).collect()
      .map(r => r.getAs[Long]("part_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))).toMap
    assert(plan === expected)
    assert(plan.keySet === (0L until p.toLong).toSet)
    val shuffled = Layout.rangePartitionPlanFrom(docs.repartition(7)).collect()
      .map(r => r.getAs[Long]("part_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))).toMap
    assert(shuffled === plan)
  }

  test("a rect query prunes to a fraction of the files the linear layout touches (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val (qxLo, qxHi, qyLo, qyHi) = (8L, 11L, 8L, 11L) // one aligned 4x4 block
    def touched(stats: Array[org.apache.spark.sql.Row]): Int =
      stats.count { r =>
        r.getAs[Long]("max_x") >= qxLo && r.getAs[Long]("min_x") <= qxHi &&
          r.getAs[Long]("max_y") >= qyLo && r.getAs[Long]("min_y") <= qyHi
      }
    val z = Layout.zorderLayout(spark, d).collect()
    // linear (arrival-order) layout with the SAME file count: row_number
    // over event_id, chunked — each file sees ~every user and ~every day
    val nFiles = z.length.toLong
    val ev = Tables.events(spark, d)
      .select(
        expr(s"CAST(user_id div ${Layout.XDiv} AS BIGINT)").as("x"),
        expr("CAST(day(ts) - 1 AS BIGINT)").as("y"),
        col("event_id"))
    val n = ev.count()
    val per = (n + nFiles - 1) / nFiles
    val linear = ev
      .withColumn("file_id",
        expr(s"CAST((row_number() OVER (ORDER BY event_id) - 1) div $per AS BIGINT)"))
      .groupBy("file_id")
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .collect()
    val (zt, lt) = (touched(z), touched(linear))
    assert(zt > 0, "the rect must hit data")
    assert(zt * 4 <= lt,
      s"z-order must prune at least 4x vs linear: z touches $zt of ${z.length}, linear $lt of ${linear.length}")
    // the query rect covers one 4x4 aligned block: ideally ONE z file
    assert(zt <= 4, s"z-order touched $zt files for an aligned 4x4 rect")
  }

  // classic textbook xy2d (bit operators) — the reference the
  // engine-portable arithmetic must reproduce
  private def hilbertRef(n: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x &= s - 1; y &= s - 1
      s /= 2
    }
    d
  }

  test("q205 arithmetic equals classic xy2d; consecutive cells are grid-adjacent") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val side = 1 << Layout.ZBits
    val grid = (for (x <- 0L until side; y <- 0L until side) yield (x, y))
      .toDF("x", "y")
    // driver replay of exactly the mod-s round arithmetic the op plans
    def hilbertOp(x: Long, y: Long): Long = {
      var (hx, hy, hd) = (x, y, 0L)
      for (k <- (Layout.ZBits - 1) to 0 by -1) {
        val s = 1L << k
        val rx = (hx / s) % 2
        val ry = (hy / s) % 2
        hd += s * s * (3 * rx + ry - 2 * rx * ry)
        val nx = if (ry == 0) { if (rx == 1) s - 1 - (hy % s) else hy % s }
                 else hx % s
        val ny = if (ry == 0) { if (rx == 1) s - 1 - (hx % s) else hx % s }
                 else hy % s
        hx = nx; hy = ny
      }
      hd
    }
    val cells = (for (x <- 0L until side; y <- 0L until side) yield (x, y))
    cells.foreach { case (x, y) =>
      assert(hilbertOp(x, y) === hilbertRef(side, x, y), s"($x, $y)")
    }
    // bijection + THE Hilbert property: step k → k+1 moves exactly one
    // grid cell (Morton fails this at every power-of-two boundary)
    val byD = cells.map { case (x, y) => hilbertOp(x, y) -> ((x, y)) }.toMap
    assert(byD.size === side * side)
    (0L until (side.toLong * side - 1)).foreach { k =>
      val (ax, ay) = byD(k); val (bx, by) = byD(k + 1)
      assert(math.abs(ax - bx) + math.abs(ay - by) === 1L, s"step $k")
    }
    // the op's OWN distributed round chain computes the same curve
    Layout.withHilbert(grid).select("x", "y", "hd").collect().foreach { r =>
      assert(r.getLong(2) === hilbertOp(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("q205 hilbert files: 4x4 aligned boxes, aligned rect touches ONE file (sf0.01)") {
    val spark = SparkSpec.spark
    val files = Layout.hilbertLayout(spark, "/root/testdata/sf0.01").collect()
    assert(files.nonEmpty)
    // 16 consecutive curve positions tile one aligned 4x4 subcell: the
    // recursive structure makes every file box exactly as tight as
    // z-order's, plus curve adjacency inside it
    files.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 3, s"wide x box: $r")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 3, s"wide y box: $r")
    }
    val (qxLo, qxHi, qyLo, qyHi) = (8L, 11L, 8L, 11L)
    val touched = files.count { r =>
      r.getAs[Long]("max_x") >= qxLo && r.getAs[Long]("min_x") <= qxHi &&
        r.getAs[Long]("max_y") >= qyLo && r.getAs[Long]("min_y") <= qyHi
    }
    assert(touched >= 1 && touched <= 4, s"hilbert touched $touched files")
  }

  test("q146 zone-map audit: matched rows agree across layouts, zorder scans a fraction, decision is stats-sound (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val out = Layout.zoneMapSkipping(spark, d).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (lin, zo) = (out("linear"), out("zorder"))
    // internal consistency: the layouts hold the same rows, so the true
    // match count cannot depend on the layout
    assert(lin.getAs[Long]("rows_matched") == zo.getAs[Long]("rows_matched"))
    assert(lin.getAs[Long]("rows_total") == zo.getAs[Long]("rows_total"))
    // the decision is stats-SOUND: scanned files cover every match
    Seq(lin, zo).foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
      assert(r.getAs[Long]("files_read") <= r.getAs[Long]("files_total"))
    }
    // arrival order is time-correlated: it prunes on the DAY dimension
    // only, so it must scan at least the full rect-day slice (8 of 30
    // days) while z-order also cuts the user dimension — strictly fewer
    // rows for the same 2-D predicate
    assert(zo.getAs[Long]("rows_scanned") * 2 <= lin.getAs[Long]("rows_scanned"),
      s"zorder scanned ${zo.getAs[Long]("rows_scanned")}, linear ${lin.getAs[Long]("rows_scanned")}")
    // the clustered layout reads a small fraction for a ~4% rect
    assert(zo.getAs[Long]("rows_scanned") * 4 <= zo.getAs[Long]("rows_total"),
      s"zorder scanned ${zo.getAs[Long]("rows_scanned")} of ${zo.getAs[Long]("rows_total")}")
    // independent recount of the true matches
    val expMatch = Tables.events(spark, d)
      .filter(expr(s"user_id div ${Layout.XDiv} BETWEEN ${Layout.RectXLo} AND ${Layout.RectXHi}") &&
        expr(s"day(ts) - 1 BETWEEN ${Layout.RectYLo} AND ${Layout.RectYHi}"))
      .count()
    assert(zo.getAs[Long]("rows_matched") == expMatch)
  }

  test("applyZorderLayout rewrites into the planned files; real footer boxes reproduce the audit's pruning win (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, d)
    val plan = Layout.zorderLayout(spark, d).collect()
      .map(r => r.getAs[Long]("file_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("min_x"), r.getAs[Long]("max_x"),
          r.getAs[Long]("min_y"), r.getAs[Long]("max_y")))).toMap
    val out = java.nio.file.Files.createTempDirectory("zorder_apply").toString
    Layout.applyZorderLayout(ev, out)
    // one physical parquet file per planned z-file, no strays
    val fileDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(fd => fd.getName.stripPrefix("file_id=").toLong ->
        fd.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    assert(fileDirs.keySet === plan.keySet)
    fileDirs.foreach { case (k, n) => assert(n == 1, s"file_id=$k has $n files") }
    // the ON-DISK boxes (recomputed per physical file) equal the manifest
    val back = spark.read.parquet(out)
    val diskBoxes = back
      .select(col("file_id").cast("long").as("file_id"),
        expr(s"CAST(user_id div ${Layout.XDiv} AS BIGINT)").as("x"),
        expr("CAST(day(ts) - 1 AS BIGINT)").as("y"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"), min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .collect()
      .map(r => (r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))).toMap
    assert(diskBoxes === plan)
    // rows survive the rewrite (event grain, all columns that identify one)
    assert(back.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ===
      ev.select("event_id").collect().map(_.getLong(0)).sorted.toSeq)
    // the write→read loop closes: replaying the q146 pruning decision
    // against the REAL files' boxes reads exactly what the
    // manifest-based audit predicted
    val audit = Layout.zoneMapSkipping(spark, d).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap.apply("zorder")
    val readSet = diskBoxes.filter { case (_, (_, minX, maxX, minY, maxY)) =>
      !(maxX < Layout.RectXLo || minX > Layout.RectXHi ||
        maxY < Layout.RectYLo || minY > Layout.RectYHi)
    }
    assert(readSet.size.toLong === audit.getAs[Long]("files_read"))
    assert(readSet.values.map(_._1).sum === audit.getAs[Long]("rows_scanned"))
  }

  test("applyRangePartitionPlan rewrites into the planned ranges: one file each, counts and extents match (sf0.01)") {
    val spark = SparkSpec.spark
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d)
    val plan = Layout.rangePartitionPlan(spark, d).collect()
      .map(r => r.getAs[Long]("part_id") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))).toMap
    val out = java.nio.file.Files.createTempDirectory("rp_apply").toString
    Layout.applyRangePartitionPlan(docs, out)
    val partDirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(pd => pd.getName.stripPrefix("part_id=").toLong ->
        pd.listFiles().count(f => f.getName.endsWith(".parquet"))).toMap
    assert(partDirs.keySet === plan.keySet)
    partDirs.foreach { case (k, n) => assert(n == 1, s"part_id=$k has $n files") }
    val back = spark.read.parquet(out)
    val gotParts = back.groupBy(col("part_id").cast("long").as("part_id"))
      .agg(count(lit(1)).as("n"), min("n_chars").as("lo"), max("n_chars").as("hi"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(gotParts === plan)
    // ranges are disjoint on disk too: each partition's max ≤ next's min
    val ordered = gotParts.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 <= b._2, s"overlap: $a vs $b")
      case _ => ()
    }
    // doc grain survives
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
  }

  test("q165 bloom skipping equals a driver-side bitset replay; no false negatives; bloom beats zones (sf0.001)") {
    val spark = SparkSpec.spark
    val sfDir = "/root/testdata/sf0.001"
    import graft.dedup.Hashing
    def h53(tag: String, k: Long): Long = Hashing.md5Lower64(tag + k) >>> 11
    val ords = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = ords.map(_._1).max + 1
    val asg = ords.map { case (ok, ck) => (ok * Layout.BloomFiles / mx, ck) }
    val res = asg.distinct
    val byFile = res.groupBy(_._1)
    val probes = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).filter(_ % Layout.BloomProbeMod == 1)
    val expect = byFile.map { case (f, fr) =>
      val resident = fr.map(_._2)
      val m = resident.length * Layout.BloomBitsPerKey + Layout.BloomMinBits
      val bitset = resident.flatMap { ck =>
        val (h1, h2) = (h53("bf1:", ck), h53("bf2:", ck))
        (0 until Layout.BloomK).map(i => (h1 + i * h2) % m)
      }.toSet
      val admits = probes.count { p =>
        val (h1, h2) = (h53("bf1:", p), h53("bf2:", p))
        (0 until Layout.BloomK).forall(i => bitset((h1 + i * h2) % m))
      }
      val zone = probes.count(p => p >= resident.min && p <= resident.max)
      val truth = probes.count(resident.toSet)
      f -> ((asg.count(_._1 == f).toLong, resident.length.toLong, truth.toLong,
        zone.toLong, admits.toLong, (admits - truth).toLong))
    }
    val got = Layout.bloomSkipping(spark, sfDir).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expect)
    // membership sketches never produce false negatives
    got.values.foreach { case (_, _, t, z, b, _) => assert(b >= t && z >= t) }
    // the point of the op: on a secondary point key, blooms admit far
    // fewer (file, probe) pairs than the zone maps the sort key left
    val (zoneTot, bloomTot) = (got.values.map(_._4).sum, got.values.map(_._5).sum)
    assert(bloomTot * 2 < zoneTot, s"bloom=$bloomTot zone=$zoneTot")
  }
}
