package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One package's registered queries WITH their oracles, paired at the
  * declaration site — the registry-hygiene unit the r16 verdict asked
  * for once the registry passed 300 paired map lines: a query and its
  * oracle SQL cannot drift apart when they are two fields of ONE
  * entry, and per-package files keep registration next to the code it
  * registers. [[SparkEntry]] is the union of packs; OracleSqlSpec
  * pins that the union is exact and collision-free. */
trait QueryPack {
  /** (name, query, oracle SQL) triples, in registration order. */
  def entries: Seq[(String, (SparkSession, String) => DataFrame, String)]

  final lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    entries.iterator.map(e => (e._1, e._2)).toMap

  final lazy val oracleSql: Map[String, String] =
    entries.iterator.map(e => (e._1, e._3)).toMap
}
