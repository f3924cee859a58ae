package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Deduplication operators for the training-data pipeline: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash blocking, and exact
  * n-gram Jaccard over blocked candidate pairs.
  *
  * Scale design: every near-dup variant is
  *   per-row signature (no shuffle) → explode bands/blocks →
  *   shuffle ONCE on the small band key → within-bucket pairs →
  *   exact verification on the candidates only.
  * Nothing ever does the O(n²) cross join; driver holds no per-doc state.
  */
object DedupQueries {
  val MinHashPerms = 64
  val MinHashBands = 16        // 16 bands × 4 rows → catches j ≳ 0.5
  val MinHashSeed  = 42L
  val ShingleN     = 3

  /** Exact dedup via content-hash groupBy: one shuffle on md5(text).
    * At 100 TB, group on the hash (fixed 32 bytes), never on raw text. */
  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  val exactDedupSql: String =
    "SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY md5(text)"

  private val signatureUdf = udf { (text: String) =>
    val shingles = Hashing.wordShingles(text, ShingleN).map(Hashing.fnv1a64)
    Hashing.minHashSignature(shingles, MinHashPerms, MinHashSeed)
  }

  /** Per-doc MinHash signatures exploded to LSH band keys. Input to the
    * band-bucket shuffle; also a useful persisted artifact (signatures are
    * computed once, reused across dedup runs). */
  def minHashBands(s: SparkSession, d: String): DataFrame = {
    val rows = MinHashPerms / MinHashBands
    Tables.documents(s, d)
      .select(col("doc_id"), signatureUdf(col("text")).as("sig"))
      .select(
        col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${MinHashBands - 1}), b -> struct(b AS band_idx, xxhash64(CAST(slice(sig, b * $rows + 1, $rows) AS STRING)) AS band_hash))")).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_hash"))
  }

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.
    * Pairs sharing ≥1 band bucket, verified with exact shingle Jaccard;
    * emits pairs with j ≥ minJaccard (doc_a < doc_b, deduplicated). */
  def minHashPairs(s: SparkSession, d: String, minJaccard: Double = 0.5): DataFrame = {
    val bands = minHashBands(s, d)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val jaccardUdf = udf { (ta: String, tb: String) =>
      Hashing.exactJaccard(
        Hashing.wordShingles(ta, ShingleN), Hashing.wordShingles(tb, ShingleN))
    }
    val docs = Tables.documents(s, d).select("doc_id", "text")
    cand
      .join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("text", "text_a"), "doc_a")
      .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("text", "text_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(jaccardUdf(col("text_a"), col("text_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  private val simHashUdf = udf { (text: String) =>
    Hashing.simHash64(text.split("\\s+").filter(_.nonEmpty))
  }

  /** SimHash fingerprints with 4×16-bit pigeonhole block keys: two docs
    * within Hamming distance 3 share at least one block verbatim, so a
    * groupBy on (block_idx, block_value) finds all near-dup candidates in
    * one shuffle. */
  def simHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), simHashUdf(col("text")).as("simhash"))
      .select(col("doc_id"), col("simhash"),
        expr("transform(sequence(0, 3), b -> CAST(shiftright(simhash, b * 16) & 65535 AS INT))").as("blocks"))
      .select(col("doc_id"), col("simhash"),
        col("blocks")(0).as("block0"), col("blocks")(1).as("block1"),
        col("blocks")(2).as("block2"), col("blocks")(3).as("block3"))

  /** SimHash near-dup pairs: pigeonhole block join, then exact Hamming
    * verification ≤ maxHamming. */
  def simHashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    val fp = simHash(s, d)
    val blocks = fp.select(col("doc_id"), col("simhash"),
        explode(array((0 to 3).map(i => struct(lit(i).as("bi"), col(s"block$i").as("bv"))): _*)).as("blk"))
      .select(col("doc_id"), col("simhash"), col("blk.bi"), col("blk.bv"))
    val hamming = udf { (a: Long, b: Long) => Hashing.hammingDistance64(a, b) }
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact word-set Jaccard over blocked candidate pairs — blocking key is
    * (lang, source) so the pair space stays bounded per block. Fully
    * SQL-expressible (set intersection via array ops), hence oracle-backed. */
  def ngramJaccard(s: SparkSession, d: String, minJaccard: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        array_distinct(split(col("text"), " ")).as("toks"))
    docs.as("a")
      .join(docs.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(
          size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
            (size(col("a.toks")) + size(col("b.toks")) -
              size(array_intersect(col("a.toks"), col("b.toks")))),
          4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  val ngramJaccardSql: String =
    "WITH t AS (SELECT doc_id, lang, source, list_distinct(string_split(text, ' ')) AS toks FROM documents) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard " +
      "FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id " +
      "WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) >= 0.5"
}
