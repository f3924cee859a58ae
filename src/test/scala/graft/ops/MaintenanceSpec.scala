package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** MERGE must apply each verb exactly once and carry everything else
  * through untouched; SCD2 runs must tile each key's timeline; the
  * purge audit must partition the fact exactly. */
class MaintenanceSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  test("q152 merge applies U/D/I exactly and carries the rest (sf0.001)") {
    val spark = SparkSpec.spark
    val base = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    val off = base.keys.max + 1L
    val merged = Maintenance.mergeUpsert(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap

    // key uniqueness post-merge
    assert(merged.size == Maintenance.mergeUpsert(spark, sfDir).count())

    val dels = base.keys.filter(_ % 10 == 7)
    val upds = base.keys.filter(_ % 10 == 3)
    val inss = base.keys.filter(_ % 10 == 5)
    val carry = base.keys.filter(k => k % 10 != 3 && k % 10 != 7)

    dels.foreach(k => assert(!merged.contains(k), s"deleted $k survived"))
    upds.foreach { k =>
      val (lang, _, n) = base(k)
      assert(merged(k) == ((lang, "curated", n, 2L)), s"update $k wrong: ${merged(k)}")
    }
    inss.foreach { k =>
      val (_, _, n) = base(k)
      assert(merged(k + off) == (("xx", "synthetic", n + 1L, 2L)), s"insert for $k wrong")
    }
    carry.foreach { k =>
      val (lang, src, n) = base(k)
      assert(merged(k) == ((lang, src, n, 1L)), s"carried $k mutated: ${merged(k)}")
    }
    assert(merged.size == base.size - dels.size + inss.size)
  }

  test("q156 bucketed merge returns exactly the q152 rows (sf0.001)") {
    val spark = SparkSpec.spark
    val plain = Maintenance.mergeUpsert(spark, sfDir).collect()
      .map(_.toSeq).toSet
    val bucketed = Maintenance.mergeUpsertBucketed(spark, sfDir).collect()
      .map(_.toSeq).toSet
    assert(bucketed === plain)
    assert(bucketed.nonEmpty)
  }

  test("q161 merge-on-read scan returns exactly the q152 rows (sf0.001)") {
    val spark = SparkSpec.spark
    val plain = Maintenance.mergeUpsert(spark, sfDir).collect()
      .map(_.toSeq).toSet
    val mor = Maintenance.mergeOnReadScan(spark, sfDir).collect()
      .map(_.toSeq).toSet
    assert(mor === plain)
    assert(mor.nonEmpty)
  }

  test("q153 SCD2 runs tile each user's timeline (sf0.001)") {
    val spark = SparkSpec.spark
    val hist = Maintenance.scd2History(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"), r.getAs[String]("state"),
        r.getAs[Long]("valid_from_ms"), Option(r.getAs[java.lang.Long]("valid_to_ms")).map(_.longValue),
        r.getAs[Boolean]("is_current"), r.getAs[Long]("n_events")))
    val perUserEvents = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    hist.groupBy(_._1).foreach { case (uid, runs0) =>
      val runs = runs0.sortBy(_._2)
      // run ids are 1..n
      assert(runs.map(_._2).toSeq == (1L to runs.length.toLong))
      // exactly one current run, and it is the last
      assert(runs.count(_._6) == 1)
      assert(runs.last._6 && runs.last._5.isEmpty)
      // validity windows chain: valid_to(k) == valid_from(k+1)
      runs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $uid run ${a._2} does not abut run ${b._2}")
          assert(a._3 != b._3, s"user $uid consecutive runs share state ${a._3}")
          // <= not <: a within-user ts tie across a state change yields a
          // zero-width [t,t) window (documented tie semantics below)
          assert(a._4 <= b._4)
        case _ => ()
      }
      // run event counts account for every event of the user
      assert(runs.map(_._7).sum == perUserEvents(uid))
    }
  }

  test("q153 constructed stream yields the exact expected runs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    def ts(sec: Int) = new Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, 10L, ts(1), "A"), (2L, 10L, ts(2), "A"), (3L, 10L, ts(3), "B"),
      (4L, 10L, ts(4), "A"), (5L, 20L, ts(5), "C"),
      // same-ts tie within user 20: event_id breaks it → C then D
      (6L, 20L, ts(6), "D"), (7L, 20L, ts(6), "C")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Maintenance.scd2HistoryFrom(ev).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id")) ->
        ((r.getAs[String]("state"), r.getAs[Long]("valid_from_ms"),
          Option(r.getAs[java.lang.Long]("valid_to_ms")).map(_.longValue),
          r.getAs[Boolean]("is_current"), r.getAs[Long]("n_events"))))
      .toMap
    assert(out.size == 6)
    assert(out((10L, 1L)) == (("A", 1000L, Some(3000L), false, 2L)))
    assert(out((10L, 2L)) == (("B", 3000L, Some(4000L), false, 1L)))
    assert(out((10L, 3L)) == (("A", 4000L, None, true, 1L)))
    assert(out((20L, 1L)) == (("C", 5000L, Some(6000L), false, 1L)))
    // ts-tie at 6s: event_id 6 (D) precedes event_id 7 (C)
    assert(out((20L, 2L)) == (("D", 6000L, Some(6000L), false, 1L)))
    assert(out((20L, 3L)) == (("C", 6000L, None, true, 1L)))
  }

  test("q154 purge audit partitions the fact exactly (sf0.001 + constructed)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val audit = Maintenance.gdprDeleteAudit(spark, sfDir).collect()
    val totals = Tables.events(spark, sfDir).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    audit.foreach { r =>
      val et = r.getString(0)
      assert(r.getLong(1) + r.getLong(2) == totals(et), s"$et purge+retain != total")
    }

    val ev = Seq(
      (1L, 13L, new Timestamp(1000L), "view", 2.5),   // 13 % 29 == 13 → purged
      (2L, 42L, new Timestamp(2000L), "view", 1.0),   // 42 % 29 == 13 → purged
      (3L, 14L, new Timestamp(3000L), "view", 4.0),
      (4L, 13L, new Timestamp(4000L), "click", 8.25)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Maintenance.gdprDeleteAuditFrom(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("view") == ((2L, 1L, 3.5)))
    assert(out("click") == ((1L, 0L, 8.25)))
  }

  test("q186 time travel reconstructs each user's state at T (sf0.001)") {
    val spark = SparkSpec.spark
    val snap = Maintenance.timeTravelSnapshot(spark, sfDir).collect()
    val t = snap.head.getAs[Long]("as_of_ms")
    // ≤1 row per user: the SCD2 intervals partition time
    val byUser = snap.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.values.forall(_.length == 1))
    // replay: the snapshot state is the event type of each user's
    // latest event at or before T (ties by event_id, q153's sort)
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val truth = events.filter(_._2 <= t).groupBy(_._1)
      .map { case (u, es) => u -> es.maxBy(e => (e._2, e._3))._4 }
    assert(byUser.keySet === truth.keySet)
    truth.foreach { case (u, st) =>
      assert(byUser(u).head.getAs[String]("state") === st, s"user $u")
    }
    // every snapshot row's interval actually contains T
    assert(snap.forall(_.getAs[Long]("valid_from_ms") <= t))
  }

  test("q200 l-diversity flags exactly the k-passing homogeneous classes (sf0.01)") {
    val spark = SparkSpec.spark
    val dir01 = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, dir01)
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val classes = docs.groupBy { case (src, _, nc) =>
      (src, nc / Maintenance.LDivCharBin)
    }
    val failing = classes.filter { case (_, rows) =>
      rows.length >= Maintenance.KAnonK &&
        rows.map(_._2).distinct.length < Maintenance.LDivL
    }
    val truth = failing.groupBy(_._1._1).map { case (src, cls) =>
      src -> ((cls.size.toLong, cls.values.map(_.length.toLong).sum,
        cls.values.map(_.length.toLong).max,
        cls.values.map(_.map(_._2).distinct.length.toLong).min))
    }
    val got = Maintenance.lDiversityAudit(spark, dir01).collect().map { r =>
      r.getAs[String]("source") -> ((r.getAs[Long]("n_homog_classes"),
        r.getAs[Long]("n_docs_at_risk"), r.getAs[Long]("max_class_size"),
        r.getAs[Long]("min_diversity")))
    }.toMap
    assert(got === truth)
    // the audit has teeth on this corpus: at least one k-passing class
    // is language-homogeneous, and every flagged class passed the k floor
    assert(got.nonEmpty)
    assert(got.values.forall { case (n, docs2, mx, mindiv) =>
      n > 0 && docs2 >= n * Maintenance.KAnonK && mx >= Maintenance.KAnonK &&
        mindiv < Maintenance.LDivL
    })
  }

  test("q249 bitemporal as-of: stale iff known state differs; known side is the ingest-filtered q186 read") {
    val spark = SparkSpec.spark
    val dir01 = "/root/testdata/sf0.01"
    val rows = Maintenance.bitemporalAsOf(spark, dir01).collect()
    assert(rows.nonEmpty)
    val vt = rows.head.getAs[Long]("as_of_ms")
    val st = rows.head.getAs[Long]("sys_ms")
    assert(st === vt + 86400000L)
    rows.foreach { r =>
      val known = Option(r.getAs[String]("state_known"))
      val fin = r.getAs[String]("state_final")
      val expectStale = known.forall(_ != fin)
      assert(r.getAs[Long]("stale") === (if (expectStale) 1L else 0L))
    }
    // the final side must equal q186's snapshot at the same instant
    val tt = Maintenance.timeTravelSnapshot(spark, dir01).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("state")).toMap
    assert(rows.map(r => r.getAs[Long]("user_id") ->
      r.getAs[String]("state_final")).toMap === tt)
    // late data must actually bite on this corpus (revisions exist)
    assert(rows.exists(_.getAs[Long]("stale") === 1L))
    assert(rows.exists(_.getAs[Long]("stale") === 0L))
  }
}
