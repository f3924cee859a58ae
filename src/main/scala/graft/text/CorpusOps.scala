package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Round-4 training-data-pipeline operators: sequence packing, TF-IDF
  * term scoring, inverted-index construction, and deterministic
  * weighted sampling.
  *
  * All four follow the repo's scale rules: aggregations take map-side
  * partials, per-row work is codegen'd Column expressions (no UDFs),
  * windows partition on keys whose cardinality grows with the data, and
  * nothing collects unbounded state to the driver.
  */
object CorpusOps {

  // --------------------------------------------------- sequence packing

  val PackBudget = 1024L // tokens per training sequence (shard)

  /** Token-budget sequence packing: stream documents per language in
    * doc_id order and assign each to the shard where its running token
    * offset lands — `shard = floor(cum_tokens_before / budget)`,
    * `offset = cum_tokens_before % budget`. This is the cumulative-sum
    * formulation (documents may straddle a shard boundary and continue
    * in the next — how packed pretraining batches actually work),
    * not bin packing: one window, no sequential driver loop.
    *
    * Scale: ONE window per language partition. Language alone would
    * bottleneck a 100 TB run on a handful of partitions; q63 bounds
    * the partitions by adding a coarse bucket key (changing the shard
    * ids), and q167 ([[packChunkSpans]]) gets the EXACT global
    * semantics at scale via the two-phase prefix sum instead. */
  def sequencePack(s: SparkSession, d: String): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), nTok.as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (col("cum_before") / PackBudget).cast("long").as("shard"),
        (col("cum_before") % PackBudget).as("offset"))
  }

  val sequencePackSql: String = {
    val nTok = "len(string_split_regex(trim(text), '\\s+'))"
    val cum = "coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    s"WITH t AS (SELECT doc_id, lang, CAST($nTok AS INT) AS n_tok FROM documents), " +
      s"c AS (SELECT doc_id, lang, n_tok, $cum AS cum_before FROM t) " +
      s"SELECT doc_id, lang, n_tok, CAST(cum_before // $PackBudget AS BIGINT) AS shard, " +
      s"CAST(cum_before % $PackBudget AS BIGINT) AS offset FROM c"
  }

  /** q111 — CURRICULUM-ordered sequence packing: [[sequencePack]]'s
    * cumulative layout, but documents stream through each language in
    * LM-quality order (q84's bigram cross-entropy ascending — most
    * fluent/typical text first) instead of doc_id order, so a data
    * loader reading shards sequentially gets the easy→hard curriculum
    * ordering curriculum-training recipes prescribe. Docs too short to
    * have a bigram score (score null) pack LAST — explicit NULLS LAST
    * in both engines, doc_id tiebreak, so the order is total and
    * engine-identical (the score cell itself is round-4 of a log
    * average — the audited tie-free class).
    *
    * Scale: the q84 model build + probe (fact-dim joins, checkpointed
    * model tables) feeds the same one-window-per-language pack as q55;
    * the q63 (lang, bucket) bounded-partition variant composes the
    * same way when language partitions outgrow one task. */
  def curriculumPack(s: SparkSession, d: String): DataFrame = {
    val scores = graft.text.TextQueries.lmScore(s, d).select("doc_id", "score")
    val nTok = size(split(trim(col("text")), "\\s+"))
    val w = Window.partitionBy("lang")
      .orderBy(col("score").asc_nulls_last, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), nTok.as("n_tok"))
      .join(scores, Seq("doc_id"), "left")
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("score"),
        (col("cum_before") / PackBudget).cast("long").as("shard"),
        (col("cum_before") % PackBudget).as("offset"))
  }

  val curriculumPackSql: String = {
    val nTok = "len(string_split_regex(trim(text), '\\s+'))"
    val cum = "coalesce(sum(n_tok) OVER (PARTITION BY lang " +
      "ORDER BY score ASC NULLS LAST, doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    s"WITH lm AS (${graft.text.TextQueries.lmScoreSql}), " +
      s"t AS (SELECT d.doc_id, d.lang, CAST($nTok AS INT) AS n_tok, lm.score " +
      "FROM documents d LEFT JOIN lm ON lm.doc_id = d.doc_id), " +
      s"c AS (SELECT doc_id, lang, n_tok, score, $cum AS cum_before FROM t) " +
      s"SELECT doc_id, lang, n_tok, score, CAST(cum_before // $PackBudget AS BIGINT) AS shard, " +
      s"CAST(cum_before % $PackBudget AS BIGINT) AS offset FROM c"
  }

  /** q114 — SHARD MANIFEST over the packed layout: per (lang, shard),
    * the document count, token count, id range, and a `has_successor`
    * flag — literally "a later shard exists for this language". It is
    * the honest name for what the predicate computes (ADVICE r9): a
    * final shard landing EXACTLY on the PackBudget boundary is full in
    * the byte sense but has no successor, so a `full` column defined
    * this way would misstate that edge for the manifest's ops-diff
    * use. Loaders that need byte-fullness should compare `n_tokens`
    * against the budget; `has_successor` answers the question the
    * diff actually asks — "is this the shard still being appended
    * to?". Only each language's last shard can be short, because a
    * document straddling the budget boundary carries its remaining
    * tokens forward. This is the artifact a training data
    * loader actually indexes — it reads manifests, not directories —
    * and the first thing an ops check diffs between two corpus builds.
    * One bounded aggregate over q55's window output; the manifest is
    * |langs|·|shards| rows, ~6 orders smaller than the corpus. */
  def shardManifest(s: SparkSession, d: String): DataFrame = {
    val packed = sequencePack(s, d)
    val m = packed
      .groupBy("lang", "shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      // manifest-grain; feeds max_shard AND the join — without this
      // the q55 pack underneath runs twice (measured 2× at sf0.1)
      .localCheckpoint(true)
    val maxShard = m.groupBy("lang").agg(max("shard").as("max_shard"))
    m.join(broadcast(maxShard), "lang")
      .select(col("lang"), col("shard"), col("n_docs"), col("n_tokens"),
        col("first_doc"), col("last_doc"),
        (col("shard") < col("max_shard")).as("has_successor"))
  }

  // `has_successor`, not `full`: a boundary-exact final shard would be
  // byte-full yet flagged false — see the scaladoc above.
  val shardManifestSql: String =
    s"""WITH p AS ($sequencePackSql),
       |m AS (SELECT lang, shard, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |  FROM p GROUP BY lang, shard),
       |mx AS (SELECT lang, max(shard) AS max_shard FROM m GROUP BY lang)
       |SELECT m.lang, m.shard, m.n_docs, m.n_tokens, m.first_doc, m.last_doc,
       |  m.shard < mx.max_shard AS has_successor
       |FROM m JOIN mx ON mx.lang = m.lang""".stripMargin.replace("\n", " ")

  /** Documents per (lang, bucket) packing cell for [[sequencePackBucketed]]. */
  val PackBucketDocs = 500L

  /** The BOUNDED-PARTITION sequence packer (q63) — the deployed layout
    * [[sequencePack]]'s scaladoc promises: identical cumulative-sum plan,
    * but the window partitions on (lang, bucket) where bucket is a
    * fixed-width doc_id range. Each packing cell re-zeroes its shard
    * numbering ((lang, bucket, shard) is the global shard key), so the
    * widest window partition is bounded by [[PackBucketDocs]] documents
    * REGARDLESS of corpus size — `lang` alone has fixed cardinality and
    * would serialize a 100 TB pack onto a handful of partitions. At
    * deploy time bucket is a date/ingest-batch key; doc_id ranges are
    * the deterministic stand-in the oracle can reproduce. */
  def sequencePackBucketed(s: SparkSession, d: String): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+"))
    val w = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), nTok.as("n_tok"),
        expr(s"doc_id div $PackBucketDocs").as("bucket"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("bucket"), col("n_tok"),
        (col("cum_before") / PackBudget).cast("long").as("shard"),
        (col("cum_before") % PackBudget).as("offset"))
  }

  val sequencePackBucketedSql: String = {
    val nTok = "len(string_split_regex(trim(text), '\\s+'))"
    val cum = "coalesce(sum(n_tok) OVER (PARTITION BY lang, bucket ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    s"WITH t AS (SELECT doc_id, lang, CAST($nTok AS INT) AS n_tok, " +
      s"CAST(doc_id // $PackBucketDocs AS BIGINT) AS bucket FROM documents), " +
      s"c AS (SELECT doc_id, lang, bucket, n_tok, $cum AS cum_before FROM t) " +
      s"SELECT doc_id, lang, bucket, n_tok, CAST(cum_before // $PackBudget AS BIGINT) AS shard, " +
      s"CAST(cum_before % $PackBudget AS BIGINT) AS offset FROM c"
  }

  // ------------------------------------------------------------- TF-IDF

  val TfIdfTopK = 5

  /** Per-document top-K TF-IDF terms. tf = in-doc term count, idf =
    * ln(N/df) over the whole corpus, ranked per doc with deterministic
    * ties (score desc, term asc).
    *
    * Scale: term frequencies and document frequencies are two hash
    * aggregates with map-side partials (the df aggregate rides the
    * (term)-keyed exchange the tf aggregate already created); N is a
    * one-row aggregate joined in by broadcast; the final top-K window
    * partitions by doc_id — cardinality grows with the corpus, so no
    * fixed-width bottleneck. */
  def tfIdf(s: SparkSession, d: String): DataFrame = {
    val terms = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(
        "regexp_extract_all(text, '[a-z0-9]+', 0)")).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    // Rank on the ROUNDED score desc (true tf·idf order), ties df asc
    // then term asc. The r6 integer surrogate (df asc, tf desc, term)
    // dodged ln entirely but was NOT order-equivalent to the score —
    // a df=1, tf=1 term outranked a df=2, tf=100 one (ADVICE r6), so
    // "TF-IDF top-K" returned non-top-scoring terms. Ranking on
    // round(score, 4) restores the advertised semantics; the residual
    // cross-engine risk is a JVM-vs-libm ln ulp landing exactly on a
    // rounding boundary — the same risk class the displayed score
    // column already carries, and one the oracle hash would catch
    // loudly rather than silently.
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("df").asc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TfIdfTopK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  val tfIdfSql: String =
    "WITH terms AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
      "n AS (SELECT count(*) AS n_docs FROM documents), " +
      "scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df, " +
      "round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score " +
      "FROM tf JOIN df USING (term) CROSS JOIN n), " +
      "ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, df ASC, term) AS rnk FROM scored) " +
      s"SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= $TfIdfTopK"

  // ----------------------------------------------------- inverted index

  val PostingCap = 10
  val MinDf      = 5

  /** Inverted-index construction: term → document frequency, total term
    * frequency, and a CAPPED posting list (first [[PostingCap]] doc ids,
    * ascending, comma-joined — a string so engines compare bit-exactly).
    * Terms below [[MinDf]] docs are dropped (the classic index-pruning
    * knob, and it bounds output rows).
    *
    * Scale (the r5 rewrite): TWO bounded hash aggregates, no unbounded
    * per-term buffer anywhere.
    *   1. groupBy(term, doc_id) → per-doc term count. Pure codegen'd
    *      hash aggregate with map-side partials; it both dedups doc ids
    *      per term and yields tf in one pass.
    *   2. groupBy(term): df = count (rows are distinct by construction),
    *      total_tf = sum, posting = [[graft.ops.TopKAggregator.MinK]] —
    *      a ≤-[[PostingCap]]-slot accumulator, so each task ships at
    *      most cap ids per term across the exchange.
    * The r4 shape (countDistinct + collect_set in ONE aggregate) forced
    * an Expand-based distinct plan AND materialized every term's full
    * posting list before slicing — 45 s at sf0.1, 22% of the whole
    * bench, and an OOM at 100× (a stopword's posting list is the corpus
    * doc-id set). Measured after the rewrite: 2.9 s isolated at sf0.1. */
  def invertedIndex(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(
        "regexp_extract_all(text, '[a-z0-9]+', 0)")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf_td"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum("tf_td").as("total_tf"),
        array_join(
          graft.ops.TopKAggregator.minK(PostingCap)(col("doc_id")),
          ",").as("posting"))
      .filter(col("df") >= MinDf)

  val invertedIndexSql: String =
    "WITH terms AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term FROM documents) " +
      "SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf, " +
      s"array_to_string(list_sort(list(DISTINCT doc_id))[1:$PostingCap], ',') AS posting " +
      s"FROM terms GROUP BY term HAVING count(DISTINCT doc_id) >= $MinDf"

  // ------------------- posting-list compression estimate (delta+varint)

  /** q238 — POSTING-LIST COMPRESSION accounting: per term, the bytes
    * its sorted posting list costs raw (8 B/doc_id) versus
    * delta-encoded + varint-packed — THE storage format of every
    * production inverted index (Lucene's VInt postings), estimated
    * exactly from the gap distribution without materializing encoded
    * bytes. The q59 index says what the postings ARE; this prices
    * them, and the savings ratio is the go/no-go for shipping the
    * index compressed at 100 TB (gap varint is why real indexes are
    * ~5× smaller than raw id lists).
    *
    * EXACT integers: the first posting encodes its absolute id, each
    * subsequent one its GAP to the predecessor (postings sorted, so
    * gaps ≥ 1); varint cost is the exact CASE ladder (< 2⁷ → 1 B,
    * < 2¹⁴ → 2 B, < 2²¹ → 3, < 2²⁸ → 4, else 5). savings_ppm by
    * exact div.
    *
    * Scale shape: one (term, doc_id) distinct aggregate, one
    * (term)-keyed lag window, one (term) aggregate — window and
    * aggregate share the exchange (the q208 posture). Output is
    * vocab-grain. */
  def postingsCompression(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("term").orderBy("doc_id")
    val varint = (c: String) =>
      s"CASE WHEN $c < 128 THEN 1 WHEN $c < 16384 THEN 2 " +
        s"WHEN $c < 2097152 THEN 3 WHEN $c < 268435456 THEN 4 ELSE 5 END"
    Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(
        "regexp_extract_all(text, '[a-z0-9]+', 0)")).as("term"))
      .distinct()
      .withColumn("gap",
        coalesce(col("doc_id") - lag(col("doc_id"), 1).over(w), col("doc_id")))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(expr(varint("gap"))).cast("long").as("varint_bytes"))
      .filter(col("df") >= MinDf)
      .select(col("term"), col("df"), (col("df") * 8).as("raw_bytes"),
        col("varint_bytes"),
        expr("(df * 8 - varint_bytes) * 1000000 div (df * 8)")
          .as("savings_ppm"))
  }

  val postingsCompressionSql: String = {
    def varint(c: String) =
      s"CASE WHEN $c < 128 THEN 1 WHEN $c < 16384 THEN 2 " +
        s"WHEN $c < 2097152 THEN 3 WHEN $c < 268435456 THEN 4 ELSE 5 END"
    s"""WITH t0 AS (SELECT doc_id,
       |  unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term FROM documents),
       |t AS (SELECT DISTINCT doc_id, term FROM t0),
       |g AS (SELECT term, coalesce(doc_id - lag(doc_id) OVER
       |  (PARTITION BY term ORDER BY doc_id), doc_id) AS gap FROM t),
       |a AS (SELECT term, count(*) AS df,
       |  CAST(sum(${varint("gap")}) AS BIGINT) AS varint_bytes
       |  FROM g GROUP BY 1 HAVING count(*) >= $MinDf)
       |SELECT term, df, df * 8 AS raw_bytes, varint_bytes,
       |  CAST((df * 8 - varint_bytes) * 1000000 // (df * 8) AS BIGINT)
       |    AS savings_ppm
       |FROM a""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------- corpus build (e2e)

  /** The END-TO-END corpus build — the pipeline a training-data run
    * actually executes, composed from the engine's own stages rather
    * than re-implemented:
    *
    *   1. admission — [[graft.text.Scrub.curatedCorpus]] (q48): exact-
    *      dedup survivor ∧ quality gate ∧ not benchmark material ∧
    *      8-gram decontaminated;
    *   2. near-dup collapse — keep only each MinHash cluster's minimum
    *      doc ([[graft.dedup.DedupQueries.dedupClusters]], q45) so one
    *      representative of every near-dup family survives;
    *   3. packing — the q55 cumulative-sum shard/offset layout over the
    *      admitted set (the bounded (lang,bucket) variant q63 is the
    *      deploy-scale swap-in, same plan shape).
    *
    * Everything is one lazy plan: the admission semi-joins are keyed on
    * doc_id (AQE lines them up on one exchange layout), the CC stage is
    * the q45 iterative propagation (lineage-truncated, one job per
    * round), and the final window partitions per language over only the
    * admitted rows. This is the query that proves the operators
    * COMPOSE — each stage's output feeds the next with no driver
    * materialization between them. */
  def corpusBuild(s: SparkSession, d: String): DataFrame = {
    val survivors = graft.dedup.DedupQueries.dedupClusters(s, d)
      .filter(col("cluster") === col("doc_id")).select("doc_id")
    val admitted = graft.text.Scrub.curatedCorpus(s, d).select("doc_id")
      .join(survivors, "doc_id")
    val nTok = size(split(trim(col("text")), "\\s+"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .join(admitted, "doc_id")
      .select(col("doc_id"), col("lang"), nTok.as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (col("cum_before") / PackBudget).cast("long").as("shard"),
        (col("cum_before") % PackBudget).as("offset"))
  }

  val corpusBuildSql: String =
    s"WITH curated AS (SELECT doc_id FROM (${graft.text.Scrub.curatedCorpusSql})), " +
      s"clusters AS (SELECT doc_id, cluster FROM (${graft.dedup.DedupQueries.dedupClustersSql})), " +
      "adm AS (SELECT c.doc_id FROM curated c JOIN clusters k ON k.doc_id = c.doc_id WHERE k.cluster = k.doc_id), " +
      "t AS (SELECT d.doc_id, d.lang, CAST(len(string_split_regex(trim(d.text), '\\s+')) AS INT) AS n_tok " +
      "FROM documents d JOIN adm ON adm.doc_id = d.doc_id), " +
      "c2 AS (SELECT doc_id, lang, n_tok, coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM t) " +
      s"SELECT doc_id, lang, n_tok, CAST(cum_before // $PackBudget AS BIGINT) AS shard, " +
      s"CAST(cum_before % $PackBudget AS BIGINT) AS offset FROM c2"

  // ------------------------------------------------------- BM25 ranking

  val Bm25K1   = 1.2
  val Bm25B    = 0.75
  val Bm25TopN = 10
  /** The registered query's fixed search terms — high-df corpus words so
    * the df/idf machinery is exercised on real posting sizes. */
  val Bm25Query: Seq[String] = Seq("hash", "join", "scan")

  /** BM25 document ranking for a fixed term query (the scoring function
    * a retrieval pass over the corpus runs — the ranking complement of
    * the q59 index build). Lucene-style idf
    * `ln((N − df + 0.5)/(df + 0.5) + 1)` (always positive, so stopword
    * queries can't flip sign), tf saturation k1=[[Bm25K1]], length
    * normalization b=[[Bm25B]] against the corpus mean token count.
    *
    * Scale: the explode is filtered to the query terms immediately, so
    * the big aggregate is keyed (doc_id, term) over MATCHING docs only;
    * df (≤ |query| rows) and the corpus stats (1 row) join back
    * broadcast; the top-N is `orderBy.limit` — Spark plans
    * TakeOrderedAndProject (per-partition truncation, no global sort,
    * no unbounded single-partition window; PlanSpec asserts) — and the
    * rank column is a window over the already-limited [[Bm25TopN]]
    * rows. Two corpus scans total (corpus stats need every doc's
    * length, matching docs need the terms — a stats-maintaining source
    * would hand over the first for free). */
  def bm25Search(s: SparkSession, d: String): DataFrame = {
    val toks = expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
    val docs = Tables.documents(s, d).select(col("doc_id"), size(toks).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), size(toks).as("dl"), explode(toks).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val norm = col("tf") * (lit(Bm25K1) + 1) /
      (col("tf") + lit(Bm25K1) *
        (lit(1.0) - lit(Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    val ranked = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(round(sum(idf * norm), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopN)
    // unpartitioned window is BOUNDED: it runs over the limit(Bm25TopN)
    // result — ≤ Bm25TopN rows in one task at any corpus size (r19
    // verdict item 4 audit: bound real, no fix needed)
    ranked.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "score", "rank")
  }

  val bm25SearchSql: String = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    "WITH docs AS (SELECT doc_id, len(regexp_extract_all(text, '[a-z0-9]+')) AS dl FROM documents), " +
      "stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docs), " +
      "terms AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term FROM documents), " +
      s"tf AS (SELECT doc_id, term, count(*) AS tf FROM terms WHERE term IN ($terms) GROUP BY doc_id, term), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
      s"scored AS (SELECT tf.doc_id, ln((n_docs - df + 0.5)/(df + 0.5) + 1) * " +
      s"tf*($Bm25K1+1)/(tf + $Bm25K1*(1 - $Bm25B + $Bm25B*dl/avgdl)) AS sc " +
      "FROM tf JOIN df USING (term) JOIN docs USING (doc_id) CROSS JOIN stats), " +
      "agg AS (SELECT doc_id, round(sum(sc), 4) AS score FROM scored GROUP BY doc_id), " +
      "ranked AS (SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM agg) " +
      s"SELECT doc_id, score, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= $Bm25TopN"
  }

  // -------------------------------------------------- weighted sampling

  val SampleK = 10

  /** Deterministic weighted priority sampling: per language, keep the
    * [[SampleK]] documents with the smallest `hash(text) / weight` key
    * (weight = n_chars, so longer documents are proportionally more
    * likely to win — the cheap stand-in for a quality-weighted corpus
    * draw). Hash-based, not rand(): the sample is reproducible across
    * runs, engines, and retries, which auditable training sets require.
    * The key is a 53-bit md5 slice divided by the weight — one exact
    * IEEE division, bit-identical in both engines (no transcendentals,
    * unlike the textbook u^(1/w) formulation).
    *
    * Scale: per-row key (codegen) + one bounded [[graft.ops.TopKAggregator.MinKBy]]
    * per lang — each task reduces map-side to ≤ K rows per language
    * before the exchange, and rank is recovered from the (sorted)
    * buffer position. The r6 `row_number` window over the
    * fixed-cardinality lang partition (~5 values) funneled each
    * language's FULL sort through a single task — the straggler this
    * replaces.
    *
    * skey is emitted RAW (not rounded): the division of a 53-bit md5
    * slice by n_chars is one exact IEEE op, bit-identical across
    * engines, whereas round(x, 6) at skey's ~1e12 magnitude asks for
    * sub-ulp decimal places and the engines' rounding implementations
    * legitimately disagree by 1 ulp (observed: DuckDB 1.0.0
    * round(1218533959177.93652…, 6) flips the last bit; Spark's
    * BigDecimal path doesn't). */
  def weightedSample(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .withColumn("skey",
        graft.functions.GraftFunctions.md5Lower53(col("text"))
          .cast("double") / col("n_chars"))
      .groupBy("lang")
      .agg(graft.ops.TopKAggregator.minKBy(SampleK)(
        col("skey"), col("doc_id"), col("n_chars")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("e._2").as("doc_id"), col("lang"),
        col("e._3").as("n_chars"), col("e._1").as("skey"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  val weightedSampleSql: String =
    "WITH keyed AS (SELECT doc_id, lang, n_chars, " +
      "CAST(md5_number_lower(text) >> 11 AS DOUBLE) / n_chars AS skey FROM documents), " +
      "ranked AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rnk FROM keyed) " +
      s"SELECT doc_id, lang, n_chars, skey, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= $SampleK"

  // ---------------------------------------------- mixture resampling

  /** Target mixture as exact rationals (lang, numerator, denominator):
    * en 2/5, the rest 3/20 each. Rationals, not doubles, so feasible
    * totals and per-lang quotas are integer arithmetic — bit-identical
    * across engines (0.15·n as a double can floor either side of an
    * integer). */
  val MixTargets: Seq[(String, Long, Long)] =
    Seq(("en", 2L, 5L), ("de", 3L, 20L), ("es", 3L, 20L),
        ("fr", 3L, 20L), ("zh", 3L, 20L))

  /** q73 — DATA MIXING: resample the corpus to target language
    * proportions, the knob every pretraining run turns (upsampling is
    * out of scope — this is the subsampling direction: find the largest
    * total T such that every language can fill its share, then keep
    * exactly floor(share_l · T) docs per language). Selection within a
    * language is by md5(doc_id) order — deterministic, reproducible,
    * and uncorrelated with doc_id order, i.e. a seedless shuffle.
    *
    * Scale shape: the per-lang counts are a 5-row aggregate collected
    * to the driver (bounded by |languages|, the same scalar-threshold
    * pattern as q05/q07); quotas fold back in as literals; selection is
    * one bounded [[graft.ops.TopKAggregator.MinKByStr]] per language
    * (buffer = max quota), trimmed to each language's quota by buffer
    * position — map-side partials replace the r6 `row_number` window
    * whose ~5-value lang partitioning sorted each language in a single
    * task. For quotas too large for an in-memory buffer (a 40% slice of
    * a 100 TB corpus), the remaining step is threshold-filtering: take
    * the quota-th smallest md5 per lang via the ops.Quantiles bracket
    * plan and keep keys below it — rank then only matters within the
    * kept slice. */
  def mixtureSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = MixTargets.filter { case (l, _, _) => nl.contains(l) }
    val t = present.map { case (l, num, den) => nl(l) * den / num }.min
    val quota = present.map { case (l, num, den) => (l, t * num / den) }
    val kCase = quota.foldLeft(lit(0L)) { case (acc, (l, k)) =>
      when(col("lang") === l, lit(k)).otherwise(acc)
    }
    val maxKL = quota.map(_._2).max
    require(maxKL <= Int.MaxValue,
      s"quota $maxKL exceeds the Int buffer bound — use q77 " +
        "(quotaSampleThreshold), the beyond-buffer scale path")
    val maxK = maxKL.toInt
    docs.filter(col("lang").isin(quota.map(_._1): _*))
      .groupBy("lang")
      .agg(graft.ops.TopKAggregator.minKByStr(maxK)(
        md5(col("doc_id").cast("string")), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .withColumn("rnk", (col("pos") + 1).cast("int"))
      .filter(col("rnk") <= kCase)
      .select(col("e._2").as("doc_id"), col("lang"), col("rnk"))
  }

  /** q77 — exact-quota mixture sampling by THRESHOLD FILTER: the scale
    * path for quotas too large for any in-memory top-K buffer (q73's
    * buffer is bounded by the quota, and a 40% slice of a 100 TB corpus
    * is not a buffer). The sample key is the 53-bit md5 slice of the
    * doc_id (the q60 key family — exact in a double, bit-identical in
    * both engines, numeric hash order); "the quota_l smallest keys in
    * language l" then becomes a pure map-side filter once the quota-th
    * smallest key is known. That threshold is an exact ORDER STATISTIC
    * per language, computed by the bounded two-pass bracket
    * ([[graft.ops.Quantiles.exactKthSmallest]]) — |langs| scalar
    * computations, the same bounded driver pattern as the quota math
    * itself. No window, no rank buffer, no per-group state beyond the
    * bracket slice.
    *
    * Exact quota relies on within-language key distinctness (53-bit
    * hashes of distinct ids; a boundary collision would over-admit —
    * caught loudly by SamplingSpec's per-language quota-count assertion
    * and by the oracle's rnk-with-doc_id-tiebreak compare).
    *
    * Thresholds for ALL languages come from ONE grouped two-pass
    * bracket ([[graft.ops.Quantiles.exactGroupKthSmallest]]): 3 Spark
    * jobs total regardless of |langs|. The r7 shape — a per-language
    * driver loop of the global [[graft.ops.Quantiles.exactKthSmallest]]
    * — cost ~3 full corpus scans PER language (lang is a predicate, not
    * a partition), i.e. hundreds of scans at a realistic 50–100
    * languages; PlanSpec now pins the fixed job count. */
  def quotaSampleThreshold(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keyed = docs.select(col("doc_id"), col("lang"), sampleKeyCol.as("skey"))
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = MixTargets.filter { case (l, _, _) => nl.contains(l) }
    val t = present.map { case (l, num, den) => nl(l) * den / num }.min
    val quota = present
      .map { case (l, num, den) => (l, t * num / den) }
      .filter(_._2 >= 1L)
    val quotaMap = quota.toMap
    val thr = graft.ops.Quantiles
      .exactGroupKthSmallest(keyed, "lang", "skey", quotaMap,
        knownCounts = Some(nl.filter { case (l, _) => quotaMap.contains(l) }))
      .map { case (l, x) => l -> x.toLong }
    val thrCase = quota.foldLeft(lit(Long.MinValue)) { case (acc, (l, _)) =>
      when(col("lang") === l, lit(thr(l))).otherwise(acc)
    }
    keyed.filter(col("skey") <= thrCase).select("doc_id", "lang", "skey")
  }

  val quotaSampleThresholdSql: String = {
    val langs = MixTargets.map(t => s"'${t._1}'").mkString(", ")
    val tCase = MixTargets.map { case (l, num, den) =>
      s"WHEN '$l' THEN n * $den // $num" }.mkString("CASE lang ", " ", " END")
    val kCase = MixTargets.map { case (l, num, den) =>
      s"WHEN '$l' THEN t.t * $num // $den" }.mkString("CASE lang ", " ", " END")
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |t AS (SELECT min($tCase) AS t FROM c WHERE lang IN ($langs)),
       |k AS (SELECT lang, $kCase AS k FROM c, t WHERE lang IN ($langs)),
       |r AS (SELECT doc_id, lang,
       |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11 AS BIGINT) AS skey,
       |  row_number() OVER (PARTITION BY lang
       |    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11, doc_id) AS rnk
       |  FROM documents)
       |SELECT r.doc_id, r.lang, r.skey
       |FROM r JOIN k USING (lang) WHERE r.rnk <= k.k""".stripMargin.replace("\n", " ")
  }

  val mixtureSampleSql: String = {
    val langs = MixTargets.map(t => s"'${t._1}'").mkString(", ")
    val tCase = MixTargets.map { case (l, num, den) =>
      s"WHEN '$l' THEN n * $den // $num" }.mkString("CASE lang ", " ", " END")
    val kCase = MixTargets.map { case (l, num, den) =>
      s"WHEN '$l' THEN t.t * $num // $den" }.mkString("CASE lang ", " ", " END")
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |t AS (SELECT min($tCase) AS t FROM c WHERE lang IN ($langs)),
       |k AS (SELECT lang, $kCase AS k FROM c, t WHERE lang IN ($langs)),
       |r AS (SELECT doc_id, lang,
       |  row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
       |  FROM documents)
       |SELECT r.doc_id, r.lang, CAST(r.rnk AS INT) AS rnk
       |FROM r JOIN k USING (lang) WHERE r.rnk <= k.k""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------- deterministic data split

  /** 256ths of the bucket space assigned to train / val (rest = test). */
  val TrainBuckets = 205 // ~80%
  val ValBuckets   = 25  // ~10%

  /** q85 — deterministic train/val/test split keyed by CONTENT hash:
    * bucket = first byte of md5(text) (two hex nibbles → 0..255),
    * train < 205, val < 230, else test (≈80/10/10).
    *
    * Content-keyed, not id-keyed, on purpose: re-crawling or
    * re-sharding reassigns doc_ids, but the same text must land in the
    * same split forever or eval data leaks into training across
    * snapshot versions. And it is a pure map — no RNG, no shuffle, no
    * global pass of any kind: the split of 100 TB costs exactly one
    * scan, is reproducible run-to-run, and two engines agree on it
    * bit-for-bit (which is what the oracle checks). The nibble
    * arithmetic (instr on the hex alphabet) instead of conv() keeps the
    * expression portable to engines without a base-conversion builtin. */
  /** The q85 content-hash bucket (first md5 byte of `text`, 0..255)
    * and split label as reusable columns — shared by q85/q108 and the
    * streaming token-budget twin so every consumer buckets
    * identically. */
  private[graft] def bucketCol: Column = {
    val hex = "0123456789abcdef"
    ((expr(s"instr('$hex', substring(md5(text), 1, 1))") - 1) * 16 +
      expr(s"instr('$hex', substring(md5(text), 2, 1))") - 1).cast("int")
  }
  private[graft] def splitCol: Column =
    when(bucketCol < TrainBuckets, "train")
      .when(bucketCol < TrainBuckets + ValBuckets, "val")
      .otherwise("test")

  /** The 53-bit reproducible-shuffle sample key, `md5Lower64(doc_id
    * string) >>> 11`, as the native codegen'd
    * [[graft.functions.Md5LowerLong]] column; shared by q77/q89/q106
    * so every sampler keys identically. */
  private def sampleKeyCol: Column =
    graft.functions.GraftFunctions.md5Lower53(col("doc_id").cast("string"))

  /** The q24/q108 BPE-ish token count of `text` as a column. */
  private[graft] def nTokCol: Column =
    size(expr(
      "regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).cast("long")

  def deterministicSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      bucketCol.as("bucket"),
      splitCol.as("split"))

  /** q134 — CLUSTER-SAFE deterministic split, the production fix for
    * the leakage q129 measures: every doc is assigned the split of
    * its near-dup cluster REPRESENTATIVE (the cluster's min doc_id,
    * q45's label), bucketed by the representative's text through the
    * SAME q85 content hash. Near-dups of one cluster therefore land
    * in ONE split by construction — q129's audit run over THIS split
    * is zero leaky clusters (ClusterSplitSpec) — while exact dups
    * were already safe (identical text ⇒ identical bucket). The
    * ~80/10/10 proportions survive because representatives are an
    * unbiased hash sample of texts.
    *
    * Scale: the representative table is |clusters|-sized (one
    * equi-join against documents to fetch rep texts, one broadcast-
    * friendly join back onto the doc→cluster map); the expensive
    * input — the cluster labels — is q45's O(log n) contraction,
    * shared machinery, not a new cost. */
  def clusterSafeSplit(s: SparkSession, d: String): DataFrame = {
    val clusters = graft.dedup.DedupQueries.dedupClusters(s, d)
    val reps = Tables.documents(s, d)
      .join(clusters.select(col("cluster")).distinct()
        .withColumnRenamed("cluster", "doc_id"), "doc_id")
      .select(col("doc_id").as("cluster"), bucketCol.as("bucket"),
        splitCol.as("split"))
    clusters.join(reps, "cluster")
      .select(col("doc_id"), col("cluster"), col("bucket"), col("split"))
  }

  // lazy: composes DedupQueries SQL — strict cross-object vals opened
  // the r10 init cycle (see DedupQueries.IncBatchMod)
  lazy val clusterSafeSplitSql: String =
    s"""WITH cl AS (${graft.dedup.DedupQueries.dedupClustersSql}),
       |reps AS (SELECT d.doc_id AS cluster,
       |  CAST((instr('0123456789abcdef', substring(md5(d.text), 1, 1)) - 1) * 16
       |     + instr('0123456789abcdef', substring(md5(d.text), 2, 1)) - 1 AS INT) AS bucket
       |  FROM documents d JOIN (SELECT DISTINCT cluster FROM cl) c ON c.cluster = d.doc_id)
       |SELECT cl.doc_id, cl.cluster, reps.bucket,
       |  CASE WHEN reps.bucket < $TrainBuckets THEN 'train'
       |       WHEN reps.bucket < ${TrainBuckets + ValBuckets} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM cl JOIN reps ON reps.cluster = cl.cluster""".stripMargin.replace("\n", " ")

  val deterministicSplitSql: String =
    s"""WITH b AS (SELECT doc_id,
       |  CAST((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
       |     + instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS INT) AS bucket
       |  FROM documents)
       |SELECT doc_id, bucket,
       |  CASE WHEN bucket < $TrainBuckets THEN 'train'
       |       WHEN bucket < ${TrainBuckets + ValBuckets} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b""".stripMargin.replace("\n", " ")

  /** q108 — TOKEN-BUDGET accounting per (split, lang): the first query
    * every pretraining run asks of a corpus — how many training tokens
    * exist in each cell of the split × language grid (and at what
    * docs/avg-length shape), using the q85 content-hash split and the
    * q24 BPE-ish token count. Pure map + one |splits|·|langs|-bounded
    * hash aggregate; scan-speed at any corpus size.
    *
    * FLOAT RULE (the q89/q96 discipline, VERDICT r8 task 1): no raw
    * double crosses the engine compare. `round(avg(n_tok), 4)` failed
    * the driver hash gate in r8 — an integer-ratio average lands on
    * decimal rounding ties far more often than a cosine does, and
    * Spark (BigDecimal HALF_UP on the shortest decimal repr) and
    * DuckDB (binary-double rounding) disagree a ULP under a tie. The
    * mean now ships as `avg_tok_x10k`: half-up-scaled BIGINT
    * `(tokens·10⁴ + n_docs/2) div n_docs`, computed with the identical
    * integer expression in both engines (all values non-negative, so
    * floor-div + half-numerator IS half-up). Display divides by 1e4
    * downstream; nothing fractional is ever hashed. */
  def tokenBudget(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(splitCol.as("split"), col("lang"), nTokCol.as("n_tok"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
      .withColumn("avg_tok_x10k",
        expr("(tokens * 10000 + n_docs div 2) div n_docs"))

  val tokenBudgetSql: String =
    s"""WITH b AS (SELECT lang,
       |  CAST((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
       |     + instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS INT) AS bucket,
       |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tok
       |  FROM documents)
       |SELECT CASE WHEN bucket < $TrainBuckets THEN 'train'
       |  WHEN bucket < ${TrainBuckets + ValBuckets} THEN 'val'
       |  ELSE 'test' END AS split, lang,
       |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens,
       |  CAST((sum(n_tok) * 10000 + count(*) // 2) // count(*) AS BIGINT) AS avg_tok_x10k
       |FROM b GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  // ------------------------------ water-filling budget allocation

  /** Fraction of total token supply the q211 budget allocates. */
  val WaterFrac = 3L

  /** q211 — MAX-MIN FAIR (water-filling) token-budget allocation over
    * the (lang, source) mixture cells: given each cell's token supply
    * and a global budget B = total div [[WaterFrac]], allocate
    * a_i = min(supply_i, L) with the water level L the largest
    * integer keeping Σ a_i ≤ B. This is THE fair-mixture primitive
    * between q89's temperature resampling (fixed exponent) and
    * q106's upsampling (fixed targets): no cell gets more than it
    * has, no unsaturated cell gets less than any other, and the
    * level is a pure function of the supply profile — the allocation
    * a data-mixture owner publishes when sources must share a token
    * budget without starving the small ones.
    *
    * EXACT integer water level by the sorted-prefix closed form: with
    * supplies s_1 ≤ … ≤ s_m, the unique rank r where the level lies
    * has cand_r = (B − prefix_{r−1}) div (m−r+1) with
    * s_{r−1} ≤ cand_r < s_r; if no rank qualifies the budget covers
    * everything (L = s_m, all saturated). One ordered window over the
    * CELL GRID — grid-bounded like q191's apportionment, never
    * corpus-sized (the only corpus-sized work is the supply
    * aggregate) — then a scalar level broadcast back to the cells. */
  def waterfillBudget(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, d)
      .select(col("lang"), col("source"), nTokCol.as("n_tok"))
      .groupBy("lang", "source").agg(sum("n_tok").as("supply"))
      .localCheckpoint(true) // grid; read for the level AND the join
    // unpartitioned window is BOUNDED: `cells` is the (lang, source)
    // grid — low-cardinality by construction, never corpus-sized (r19
    // verdict item 4 audit: bound real, no fix needed)
    val w = Window.orderBy("supply", "lang", "source")
    val ranked = cells
      .withColumn("r", row_number().over(w))
      .withColumn("pfx", sum("supply").over(w))
      .withColumn("prev_s", lag("supply", 1, 0L).over(w))
      .crossJoin(broadcast(cells.agg(
        sum("supply").as("tot"), count(lit(1)).as("m"))))
      .withColumn("b", expr(s"tot div $WaterFrac"))
      .withColumn("cand", expr("(b - (pfx - supply)) div (m - r + 1)"))
    // numerator-≥0 guard: past-the-level ranks can go negative, where
    // Spark's div truncates but DuckDB's // floors — exclude them (the
    // true level rank always has budget remaining, so this is free)
    val level = ranked
      .agg(coalesce(
        max(when(col("pfx") - col("supply") <= col("b") &&
          col("prev_s") <= col("cand") && col("cand") < col("supply"),
          col("cand"))),
        max("supply")).as("level"))
    cells.crossJoin(broadcast(level))
      .select(col("lang"), col("source"), col("supply"), col("level"),
        least(col("supply"), col("level")).as("alloc"),
        when(col("supply") <= col("level"), 1L).otherwise(0L).as("saturated"))
  }

  val waterfillBudgetSql: String =
    s"""WITH cells AS (SELECT lang, source,
       |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT)
       |    AS supply
       |  FROM documents GROUP BY 1, 2),
       |tm AS (SELECT CAST(sum(supply) AS BIGINT) AS tot, count(*) AS m FROM cells),
       |rk AS (SELECT lang, source, supply,
       |  row_number() OVER (ORDER BY supply, lang, source) AS r,
       |  CAST(sum(supply) OVER (ORDER BY supply, lang, source
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfx,
       |  CAST(coalesce(lag(supply) OVER (ORDER BY supply, lang, source), 0)
       |    AS BIGINT) AS prev_s
       |  FROM cells),
       |lv AS (SELECT coalesce(
       |    max(CASE WHEN pfx - supply <= tm.tot // $WaterFrac
       |      AND prev_s <= (tm.tot // $WaterFrac - (pfx - supply)) // (tm.m - r + 1)
       |      AND (tm.tot // $WaterFrac - (pfx - supply)) // (tm.m - r + 1) < supply
       |      THEN (tm.tot // $WaterFrac - (pfx - supply)) // (tm.m - r + 1) END),
       |    max(supply)) AS level
       |  FROM rk CROSS JOIN tm)
       |SELECT c.lang, c.source, c.supply, CAST(lv.level AS BIGINT) AS level,
       |  CAST(least(c.supply, lv.level) AS BIGINT) AS alloc,
       |  CAST(CASE WHEN c.supply <= lv.level THEN 1 ELSE 0 END AS BIGINT) AS saturated
       |FROM cells c CROSS JOIN lv""".stripMargin.replace("\n", " ")

  // ------------------------------------------- temperature resampling

  /** Denominator of the q89 budget: keep Σn / [[TempBudgetFrac]] docs. */
  val TempBudgetFrac = 5L

  /** Exact integer square root: the double `sqrt` is correctly rounded
    * (IEEE), so its floor is within ±1 of ⌊√n⌋; the two correction
    * steps make it exact for every n ≥ 0 — no float survives into the
    * quota math. */
  private def isqrt(n: Long): Long = {
    var x = math.sqrt(n.toDouble).toLong
    while (x > 0 && x * x > n) x -= 1
    while ((x + 1) * (x + 1) <= n) x += 1
    x
  }

  /** q89 — TEMPERATURE-scaled mixture resampling, the mT5/XLM-R way to
    * rebalance languages WITHOUT hand-set target shares (q73/q77 take
    * explicit ratios): per-language quotas ∝ n_l^α with α = 1/2, so
    * low-resource languages keep a larger fraction of their docs than
    * high-resource ones while the head still dominates absolutely.
    *
    * Everything that decides membership is INTEGER arithmetic:
    * w_l = isqrt(n_l) (exact — see [[isqrt]]), budget B = Σn /
    * [[TempBudgetFrac]], quota_l = min(n_l, B·w_l / Σw). Both engines
    * recompute the identical quotas from their own counts — no
    * driver-computed literal and no float ever crosses the compare
    * (libm `pow` is NOT correctly rounded across engines; `sqrt` is,
    * and the ±1-step correction makes even its floor exact).
    *
    * Selection is the q77 threshold filter: the 53-bit md5 sample key,
    * every language's quota-th smallest key from ONE grouped two-pass
    * bracket ([[graft.ops.Quantiles.exactGroupKthSmallest]], 3 jobs
    * regardless of |langs|), then a pure map-side filter. Same skey
    * boundary-collision caveat as q77, caught by the same guards. */
  def temperatureMixture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keyed = docs.select(col("doc_id"), col("lang"), sampleKeyCol.as("skey"))
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = nl.map { case (l, n) => l -> isqrt(n) }
    val sw = w.values.sum
    val budget = nl.values.sum / TempBudgetFrac
    val quota = nl.map { case (l, n) => l -> math.min(n, budget * w(l) / sw) }
      .filter(_._2 >= 1L)
    // every quota can round to 0 on a degenerate tiny corpus (budget <
    // |langs|); the bracket requires a non-empty ks map, and an empty
    // selection is the right answer — skip the jobs, emit nothing
    val thr =
      if (quota.isEmpty) Map.empty[String, Long]
      else graft.ops.Quantiles
        .exactGroupKthSmallest(keyed, "lang", "skey", quota,
          knownCounts = Some(nl.filter { case (l, _) => quota.contains(l) }))
        .map { case (l, x) => l -> x.toLong }
    val thrCase = quota.keys.toSeq.sorted.foldLeft(lit(Long.MinValue)) {
      case (acc, l) => when(col("lang") === l, lit(thr(l))).otherwise(acc)
    }
    keyed.filter(col("skey") <= thrCase).select("doc_id", "lang", "skey")
  }

  /** Upsampling epoch cap: no document repeats more than this many
    * times however small its language (the UniMax bound). */
  val MaxUpsampleEpochs = 4L

  /** q106 — UPSAMPLED mixture: the direction q73/q77/q89 leave out
    * (they only subsample). Low-resource languages reach their target
    * share by REPEATING documents — bounded by [[MaxUpsampleEpochs]]
    * so no doc repeats unboundedly (the UniMax cap against memorizing
    * tiny languages). Targets: α=0 temperature — every language gets
    * an EQUAL share of the corpus size, Σn / |langs|, capped at E·n_l
    * — which makes head languages subsample and tail languages repeat
    * (on the test corpus: en 218→100 subsampled, de 70→100 with
    * epoch-2 repeats — both directions exercise under the oracle).
    *
    * The repeat assignment needs NO per-document rank: every doc of
    * language l gets ⌊T_l/n_l⌋ copies, and the (T_l mod n_l) docs with
    * the SMALLEST sample keys get one extra — that boundary is the
    * same grouped exact order statistic as q77/q89
    * ([[graft.ops.Quantiles.exactGroupKthSmallest]], one grouped
    * two-pass bracket for all languages), after which the emission is
    * a pure map-side `explode(sequence(...))`: no window, no rank
    * buffer, no shuffle beyond the bracket's own. Output grain is
    * (doc_id, epoch) — exactly what a repeated-sampling data loader
    * consumes. */
  def upsampledMixture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keyed = docs.select(col("doc_id"), col("lang"), sampleKeyCol.as("skey"))
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val share = nl.values.sum / nl.size
    val target = nl.map { case (l, n) =>
      l -> math.min(MaxUpsampleEpochs * n, share)
    }
    val baseCopies = nl.map { case (l, n) => l -> target(l) / n }
    val extraK = nl.map { case (l, n) => l -> target(l) % n }
    val extras = extraK.filter(_._2 >= 1L)
    // all-zero extras (targets dividing evenly, or a single-language
    // corpus where share == n) is legal: base copies only, no bracket
    val thr =
      if (extras.isEmpty) Map.empty[String, Long]
      else graft.ops.Quantiles
        .exactGroupKthSmallest(keyed, "lang", "skey", extras,
          knownCounts = Some(nl.filter { case (l, _) => extraK(l) >= 1L }))
        .map { case (l, x) => l -> x.toLong }
    def caseOf(m: Map[String, Long], default: Long): Column =
      m.toSeq.sortBy(_._1).foldLeft(lit(default)) { case (acc, (l, x)) =>
        when(col("lang") === l, lit(x)).otherwise(acc)
      }
    val copies = caseOf(baseCopies, 0L) +
      when(col("skey") <= caseOf(thr, Long.MinValue), 1L).otherwise(0L)
    keyed
      .withColumn("n_copies", copies)
      .filter(col("n_copies") >= 1L)
      .select(col("doc_id"), col("lang"),
        explode(expr("sequence(1, n_copies)")).as("epoch_l"))
      .select(col("doc_id"), col("lang"), col("epoch_l").cast("int").as("epoch"))
  }

  val upsampledMixtureSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |t AS (SELECT (SELECT sum(n) FROM c) // (SELECT count(*) FROM c) AS share),
       |k AS (SELECT lang, n, least($MaxUpsampleEpochs * n, t.share) // n AS base,
       |  least($MaxUpsampleEpochs * n, t.share) % n AS extra FROM c, t),
       |r AS (SELECT doc_id, lang,
       |  row_number() OVER (PARTITION BY lang
       |    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11, doc_id) AS rnk
       |  FROM documents),
       |cp AS (SELECT r.doc_id, r.lang,
       |  k.base + CASE WHEN r.rnk <= k.extra THEN 1 ELSE 0 END AS n_copies
       |  FROM r JOIN k USING (lang))
       |SELECT doc_id, lang, CAST(unnest(range(1, CAST(n_copies + 1 AS BIGINT))) AS INT) AS epoch
       |FROM cp WHERE n_copies >= 1""".stripMargin.replace("\n", " ")

  val temperatureMixtureSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |w0 AS (SELECT lang, n, CAST(floor(sqrt(n)) AS BIGINT) AS s FROM c),
       |w AS (SELECT lang, n,
       |  CASE WHEN s > 0 AND s*s > n THEN s - 1
       |       WHEN (s+1)*(s+1) <= n THEN s + 1 ELSE s END AS w FROM w0),
       |t AS (SELECT sum(n) // $TempBudgetFrac AS b, sum(w) AS sw FROM w),
       |k AS (SELECT lang, least(n, b * w // sw) AS k FROM w, t),
       |r AS (SELECT doc_id, lang,
       |  CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11 AS BIGINT) AS skey,
       |  row_number() OVER (PARTITION BY lang
       |    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11, doc_id) AS rnk
       |  FROM documents)
       |SELECT r.doc_id, r.lang, r.skey
       |FROM r JOIN k USING (lang) WHERE r.rnk <= k.k""".stripMargin.replace("\n", " ")

  // --------------------------------------------- importance weighting

  /** Hashed-bigram feature space of the importance scorer. */
  val ImpBuckets = 4096L
  /** The target domain the scorer measures affinity to. */
  val ImpTargetLang = "en"
  /** 2^20 — fixed-point scale of the per-bucket ratio terms. */
  val ImpScale = 1048576L

  /** q119 — IMPORTANCE scoring for data selection, the DSIR shape
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): hash every document's word bigrams into
    * [[ImpBuckets]] buckets, estimate the target-domain and raw-corpus
    * bucket distributions, and score each document by how much its
    * buckets look like the target. Here the target sample is the
    * `lang = '[[ImpTargetLang]]'` slice; production points it at any
    * curated exemplar set.
    *
    * DELIBERATE deviation from the paper, under the FLOAT RULE: DSIR
    * sums log-likelihood ratios; cross-engine `ln` is not correctly
    * rounded, so this scorer sums INTEGER fixed-point ratio terms
    * instead — per bucket, ((ct+1)·2^20) div (cr+1), add-1 smoothed —
    * which is monotone in the same per-bucket evidence and exactly
    * reproducible in both engines (ranking differs from log-DSIR where
    * a doc trades many weak buckets against one strong one; the
    * docstring states it so the trade is a choice, not a surprise).
    * Selection-by-quota over the score composes with the q77 grouped
    * threshold exactly as the mixtures do.
    *
    * Scale shape: BOTH distributions come from ONE bigram-stream
    * aggregate (count(*) and a conditional count in the same grouped
    * pass — no second corpus scan for the target slice), bounded at
    * [[ImpBuckets]] rows and broadcast back onto the bigram stream;
    * scoring is a per-doc hash aggregate. Two corpus scans total,
    * nothing driver-side, no window. */
  def importanceScore(s: SparkSession, d: String): DataFrame = {
    // per-BIGRAM hash — volume ≈ token count; native expression, no UDF
    def h(g: Column): Column =
      graft.functions.GraftFunctions.md5Lower53(g) % ImpBuckets
    val docs = Tables.documents(s, d)
    val bk = docs
      .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
      .select(col("doc_id"), col("lang"), explode(expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "slice(toks, 2, greatest(size(toks)-1, 0)), (a, b) -> concat(a, ' ', b))"))
        .as("g"))
      .select(col("doc_id"), col("lang"), h(col("g")).as("b"))
    val cnt = bk.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === ImpTargetLang, 1L).otherwise(0L)).as("ct"))
    val sc = bk.join(broadcast(cnt), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr(s"((ct + 1) * $ImpScale) div (cr + 1)")).as("score"))
    docs.select("doc_id", "lang")
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score"), lit(0L)).as("score_x2p20"))
  }

  val importanceScoreSql: String =
    s"""WITH t AS (SELECT doc_id, lang, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
       |bg AS (SELECT doc_id, lang,
       |  unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t),
       |bk AS (SELECT doc_id, lang,
       |  (md5_number_lower(p[1] || ' ' || p[2]) >> 11) % $ImpBuckets AS b FROM bg),
       |cnt AS (SELECT b, count(*) AS cr,
       |  sum(CASE WHEN lang = '$ImpTargetLang' THEN 1 ELSE 0 END) AS ct
       |  FROM bk GROUP BY b),
       |sc AS (SELECT bk.doc_id, count(*) AS n_bigrams,
       |  sum(((cnt.ct + 1) * $ImpScale) // (cnt.cr + 1)) AS score
       |  FROM bk JOIN cnt USING (b) GROUP BY bk.doc_id)
       |SELECT d.doc_id, d.lang, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  CAST(coalesce(sc.score, 0) AS BIGINT) AS score_x2p20
       |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin.replace("\n", " ")

  /** Per-language keep count of the q120 selection. */
  val DsirSelectK = 25

  /** q120 — the DSIR SELECTION step: keep each language's
    * [[DsirSelectK]] most target-like documents by q119 score (score
    * desc, doc_id tiebreak — the deterministic stand-in for the
    * paper's Gumbel-noise resampling, which the FLOAT RULE and
    * snapshot reproducibility both argue against). The rank is the
    * bounded [[graft.ops.TopKAggregator.TopKByScore]] buffer — ≤ k
    * rows per language per task, map-side reduced, no per-language
    * sort of the scored corpus anywhere (the q60/q73/q20 discipline;
    * scores are < 2^53 so the buffer's double slot carries the BIGINT
    * exactly). Composes q119's two corpus scans with one bounded
    * aggregate — the full select-for-training pipeline in one lazy
    * plan. */
  def dsirSelect(s: SparkSession, d: String): DataFrame =
    importanceScore(s, d)
      .groupBy("lang")
      .agg(graft.ops.TopKAggregator.topKByScore(DsirSelectK)(
        col("score_x2p20").cast("double"), col("doc_id"),
        col("score_x2p20").cast("double"), lit(0)).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("rk", "e")))
      .select(col("lang"), (col("rk") + 1).as("rank"),
        col("e._2").as("doc_id"), col("e._3").cast("long").as("score_x2p20"))

  val dsirSelectSql: String =
    s"""WITH imp AS ($importanceScoreSql),
       |r AS (SELECT lang, doc_id, score_x2p20,
       |  row_number() OVER (PARTITION BY lang
       |    ORDER BY score_x2p20 DESC, doc_id) AS rnk FROM imp)
       |SELECT lang, CAST(rnk AS INT) AS rank, doc_id, score_x2p20
       |FROM r WHERE rnk <= $DsirSelectK""".stripMargin.replace("\n", " ")

  // ------------------------------------- global packing (two-phase cumsum)

  /** Tokens per packed training sequence for q167. */
  val PackChunkTokens = 256L

  /** q167 — GLOBAL concat-and-chunk packing (the GPT-style pretraining
    * layout: concatenate every document in doc_id order into one token
    * stream, cut it into fixed [[PackChunkTokens]]-token sequences,
    * report which (chunk, doc) spans result — boundary-straddling docs
    * appear once per chunk they touch). Unlike q55 (per-language
    * window) and q63 (per-(lang, bucket) approximation whose shard ids
    * deliberately differ from the global stream), this is the EXACT
    * global semantics, made scalable:
    *
    * A global running sum is the textbook single-partition trap —
    * `Window.orderBy(doc_id)` with no partition key drags the whole
    * corpus through ONE task. [[graft.ops.Distributed.globalCumSum]]
    * (the shared two-phase prefix sum: range-partition → frozen pid
    * stamp → scalar-bounded per-partition totals → broadcast offsets →
    * pid-local windows) keeps it parallel end-to-end. Each doc then
    * knows its global token interval [gstart, gend) and explodes into
    * the ⌊gstart/C⌋..⌊(gend−1)/C⌋ chunks it overlaps — ≤ n_tok/C + 1
    * rows per doc by construction. All span math in BIGINT; `div`
    * floors exactly (everything is non-negative). Token convention:
    * [[nTokCol]] (q24/q108 BPE-ish). */
  def packChunkSpans(s: SparkSession, d: String): DataFrame = {
    val c = PackChunkTokens
    graft.ops.Distributed.globalCumSum(
        Tables.documents(s, d)
          .select(col("doc_id"), nTokCol.as("n_tok"))
          .where(col("n_tok") > 0),
        Seq("doc_id"), "n_tok", "gend")
      .select(col("doc_id"), col("n_tok"),
        (col("gend") - col("n_tok")).as("gstart"), col("gend"))
      .withColumn("chunk_id",
        explode(sequence(expr(s"gstart div $c"), expr(s"(gend - 1) div $c"))))
      .select(col("chunk_id"), col("doc_id"),
        (greatest(col("gstart"), col("chunk_id") * c) - col("chunk_id") * c)
          .as("off_in_chunk"),
        (least(col("gend"), (col("chunk_id") + 1) * c) -
          greatest(col("gstart"), col("chunk_id") * c)).as("span_len"))
  }

  val packChunkSpansSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tok
       |  FROM documents),
       |cm AS (SELECT doc_id, n_tok,
       |  coalesce(CAST(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS gstart
       |  FROM t WHERE n_tok > 0),
       |e AS (SELECT doc_id, n_tok, gstart,
       |  unnest(generate_series(CAST(gstart // $PackChunkTokens AS BIGINT),
       |    CAST((gstart + n_tok - 1) // $PackChunkTokens AS BIGINT))) AS k FROM cm)
       |SELECT k AS chunk_id, doc_id,
       |  greatest(gstart, k * $PackChunkTokens) - k * $PackChunkTokens AS off_in_chunk,
       |  least(gstart + n_tok, (k + 1) * $PackChunkTokens)
       |    - greatest(gstart, k * $PackChunkTokens) AS span_len
       |FROM e""".stripMargin.replace("\n", " ")

  // --------------------------------------------- overlapping RAG chunks

  /** q168 window/stride (tokens). Stride < window ⟹ consecutive chunks
    * overlap by [[RagWindow]]−[[RagStride]] tokens and the last chunk
    * always starts strictly inside the doc. */
  val RagWindow = 64L
  val RagStride = 48L

  /** q168 — OVERLAPPING sliding-window chunk spans, the standard RAG
    * indexing layout (vs q42's non-overlapping fixed char chunks):
    * chunk i of a doc covers tokens [i·stride, i·stride + window),
    * clipped at the doc end; a doc yields 1 chunk if it fits, else
    * 1 + ⌈(n_tok − window)/stride⌉. Pure per-doc map + bounded explode
    * — embarrassingly parallel, no shuffle anywhere, chunk count per
    * doc ≤ n_tok/stride + 1 by construction. Span grain (not text)
    * so the 100 TB run carries 4 BIGINTs/row, not copies of the
    * corpus; [[nTokCol]] tokens, integer math only. */
  def ragChunkSpans(s: SparkSession, d: String): DataFrame = {
    val (w, st) = (RagWindow, RagStride)
    Tables.documents(s, d)
      .select(col("doc_id"), nTokCol.as("n_tok"))
      .where(col("n_tok") > 0)
      .withColumn("n_chunks",
        when(col("n_tok") <= w, lit(1L))
          .otherwise(lit(1L) + expr(s"(n_tok - $w + $st - 1) div $st")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * st).as("tok_start"),
        least(lit(w), col("n_tok") - col("chunk_idx") * st).as("tok_len"))
  }

  val ragChunkSpansSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tok
       |  FROM documents WHERE len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) > 0),
       |n AS (SELECT doc_id, n_tok,
       |  CASE WHEN n_tok <= $RagWindow THEN 1
       |    ELSE 1 + (n_tok - $RagWindow + $RagStride - 1) // $RagStride END AS n_chunks
       |  FROM t),
       |e AS (SELECT doc_id, n_tok,
       |  unnest(generate_series(0, n_chunks - 1)) AS k FROM n)
       |SELECT doc_id, k AS chunk_idx, k * $RagStride AS tok_start,
       |  least($RagWindow, n_tok - k * $RagStride) AS tok_len
       |FROM e""".stripMargin.replace("\n", " ")

  // --------------------------------------- corpus-wide exact rank

  /** q170 — EXACT corpus-wide rank and percentile of every document by
    * (n_chars, doc_id) — the normalization step behind length-balanced
    * sampling curricula, and the OTHER classic global-order trap q167
    * dodges: `row_number().over(Window.orderBy(...))` with no
    * partition key is a single-task sort of the corpus.
    * [[graft.ops.Distributed.globalRowNumber]] (the shared two-phase
    * prefix sum) produces the identical 1-based rank fully in
    * parallel; N rides along as a broadcast one-row aggregate of the
    * same checkpointed frame, and the percentile ships as the usual
    * half-up ×10⁴ BIGINT so the DuckDB compare is exact (FLOAT RULE).
    * (`percent_rank()` would hit the same single-task window AND emit
    * a float; (rank−1)/(N−1) over integers is the same statistic.) */
  def globalRank(s: SparkSession, d: String): DataFrame = {
    val ranked = graft.ops.Distributed.globalRowNumber(
      Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      Seq("n_chars", "doc_id"), "rnk")
    ranked
      .crossJoin(broadcast(ranked.agg(max("rnk").as("n"))))
      .select(col("doc_id"), col("n_chars"), col("rnk"),
        expr("((rnk - 1) * 10000 + greatest(n - 1, 1) div 2) div greatest(n - 1, 1)")
          .as("pct_x10k"))
  }

  val globalRankSql: String =
    """WITH r AS (SELECT doc_id, n_chars,
      |  row_number() OVER (ORDER BY n_chars, doc_id) AS rnk,
      |  count(*) OVER () AS n FROM documents)
      |SELECT doc_id, n_chars, CAST(rnk AS BIGINT) AS rnk,
      |  CAST(((rnk - 1) * 10000 + greatest(n - 1, 1) // 2)
      |    // greatest(n - 1, 1) AS BIGINT) AS pct_x10k
      |FROM r""".stripMargin.replace("\n", " ")

  // ----------------------------- PPS systematic sampling (token-weighted)

  /** q171 sampling stride: one hit per [[PpsStride]] tokens of the
    * concatenated stream. */
  val PpsStride = 2048L

  /** q171 — EXACT probability-proportional-to-size systematic sample:
    * lay every document on the q167 concatenated token stream and keep
    * the docs whose interval [gstart, gend) contains a multiple of
    * [[PpsStride]] (sampling points T, 2T, 3T, …). A doc with n_tok
    * tokens is hit `gend div T − gstart div T` times — in expectation
    * ∝ n_tok (exactly n_tok/T for docs shorter than T) — which is the
    * classic deterministic token-weighted sampler (Madow systematic
    * PPS, public): no floats, no RNG, reproducible from the data
    * alone, and the selected set's token mass is ≈ corpus/T · E[doc]
    * by construction. The q77/q89 samplers weight by hash keys at doc
    * grain; this one weights by SIZE at token grain — the right
    * notion when the budget being filled is a token budget.
    * Same [[graft.ops.Distributed.globalCumSum]] machinery as
    * q167/q170: parallel end-to-end, one scalar-bounded driver
    * collect. Output: the sampled docs with their hit counts (docs
    * longer than T can be hit more than once — a multiplicity the
    * mixture samplers downstream consume as a repeat count). */
  def ppsSample(s: SparkSession, d: String): DataFrame = {
    val t = PpsStride
    graft.ops.Distributed.globalCumSum(
        Tables.documents(s, d)
          .select(col("doc_id"), nTokCol.as("n_tok"))
          .where(col("n_tok") > 0),
        Seq("doc_id"), "n_tok", "gend")
      .select(col("doc_id"), col("n_tok"),
        (expr(s"gend div $t") - expr(s"(gend - n_tok) div $t")).as("hits"))
      .where(col("hits") > 0)
  }

  val ppsSampleSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tok
       |  FROM documents),
       |cm AS (SELECT doc_id, n_tok,
       |  CAST(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS gend
       |  FROM t WHERE n_tok > 0)
       |SELECT doc_id, n_tok,
       |  gend // $PpsStride - (gend - n_tok) // $PpsStride AS hits
       |FROM cm WHERE gend // $PpsStride - (gend - n_tok) // $PpsStride > 0""".stripMargin
      .replace("\n", " ")

  // ------------------------------------------ balanced training shards

  /** q172 shard count. Real runs set this to the trainer's data-loader
    * worker count; the balance bound below is independent of it. */
  val SnakeShardCount = 8L

  /** q172 — BALANCED SHARD ASSIGNMENT by snake (boustrophedon)
    * ordering: docs ranked by token count DESC (doc_id tiebreak), then
    * dealt to S shards left-to-right, right-to-left, alternating —
    * the classic LPT-style greedy that keeps every shard's token mass
    * within one max-document of the mean WITHOUT sequential packing's
    * order constraint (q55/q167 fill shards in doc order; a training
    * run that wants S equal-mass input streams doesn't care about
    * order, it cares about no straggler shard). Deterministic — no
    * RNG, reproducible from the data alone.
    *
    * Scale shape: the global rank is [[graft.ops.Distributed
    * .globalRowNumber]] (two-phase prefix sum — range-partitioned
    * parallel sort, one P-row driver collect, never a single-task
    * global window); the snake arithmetic is a pure per-row map. One
    * exchange end-to-end at any SF. SnakeShardSpec pins the balance
    * bound: max−min shard token mass ≤ max single-doc mass. */
  def snakeShards(s: SparkSession, d: String): DataFrame = {
    val S = SnakeShardCount
    graft.ops.Distributed.globalRowNumber(
        Tables.documents(s, d)
          .select(col("doc_id"), nTokCol.as("n_tok"))
          .where(col("n_tok") > 0)
          .withColumn("neg_tok", -col("n_tok")),
        Seq("neg_tok", "doc_id"), "rnk")
      .select(col("doc_id"), col("n_tok"),
        expr(s"CAST(CASE WHEN ((rnk - 1) div $S) % 2 = 0 THEN (rnk - 1) % $S " +
          s"ELSE $S - 1 - (rnk - 1) % $S END AS BIGINT)").as("shard"))
  }

  val snakeShardsSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tok
       |  FROM documents),
       |r AS (SELECT doc_id, n_tok,
       |  row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rnk
       |  FROM t WHERE n_tok > 0)
       |SELECT doc_id, n_tok,
       |  CAST(CASE WHEN ((rnk - 1) // $SnakeShardCount) % 2 = 0
       |    THEN (rnk - 1) % $SnakeShardCount
       |    ELSE $SnakeShardCount - 1 - (rnk - 1) % $SnakeShardCount END AS BIGINT) AS shard
       |FROM r""".stripMargin.replace("\n", " ")

  // ------------------------------------- epoch shuffle batch manifest

  val ShuffleEpochs = 3L
  val ShuffleBatch  = 256L

  /** q201 — DETERMINISTIC EPOCH-SHUFFLE MANIFEST: for each training
    * epoch, an independent pseudo-random permutation of the corpus
    * (order key = 53-bit md5 of "ep:{epoch}:{doc_id}" — a fresh
    * keyed permutation per epoch, reproducible from the data alone,
    * no RNG state to ship) cut into fixed-size batches; emitted at
    * batch grain with a doc_id-sum checksum. This is the missing
    * bookkeeping op between sharding (q172 balances MASS across
    * workers) and packing (q55/q167 fill CONTEXTS in order): a
    * trainer that wants "epoch 2, batch 417" byte-reproducible on any
    * re-run — after a preemption, on a different cluster — needs the
    * permutation to be a pure function of (epoch, doc_id), which this
    * manifest pins and the checksum lets it audit.
    *
    * Scale shape: the corpus×E expansion is a pure flatMap (no
    * exchange); the per-epoch rank rides ONE [[graft.ops.Distributed
    * .globalRowNumber]] over (epoch, key, doc_id) — range-partitioned
    * parallel sort, never a single-task window; each epoch holds
    * exactly |D| rows, so rank-within-epoch = global_rank − epoch·|D|
    * (one scalar count, no second exchange). The batch rollup reuses
    * the same range partitioning (batch is a prefix function of the
    * sort order — AQE-local). One sort exchange end-to-end at any SF. */
  def epochShuffleManifest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id")
    val nDocs = docs.count() // scalar: the per-epoch rank offset
    val keyed = docs
      .withColumn("epoch",
        explode(expr(s"sequence(0L, ${ShuffleEpochs - 1}L)")))
      .withColumn("k", graft.functions.GraftFunctions.md5Lower53(
        concat(lit("ep:"), col("epoch").cast("string"),
          lit(":"), col("doc_id").cast("string"))))
    graft.ops.Distributed
      .globalRowNumber(keyed, Seq("epoch", "k", "doc_id"), "grn")
      .select(col("epoch"), col("doc_id"),
        expr(s"(grn - epoch * ${nDocs}L - 1) div $ShuffleBatch").as("batch_id"))
      .groupBy("epoch", "batch_id")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("doc_sum"))
  }

  val epochShuffleManifestSql: String =
    s"""WITH ep AS (SELECT CAST(e AS BIGINT) AS epoch
       |  FROM unnest(generate_series(0, ${ShuffleEpochs - 1})) AS t(e)),
       |k AS (SELECT ep.epoch, d.doc_id,
       |  md5_number_lower('ep:' || CAST(ep.epoch AS VARCHAR) || ':'
       |    || CAST(d.doc_id AS VARCHAR)) >> 11 AS k
       |  FROM documents d CROSS JOIN ep),
       |r AS (SELECT epoch, doc_id,
       |  row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS rn
       |  FROM k)
       |SELECT epoch, CAST((rn - 1) // $ShuffleBatch AS BIGINT) AS batch_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(doc_id) AS BIGINT) AS doc_sum
       |FROM r GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  // ---------------------------------------------- Pareto-frontier (skyline)

  /** Dominance of row `b` over row `a` on the curation criteria:
    * ≥ chars, ≥ distinct tokens, ≤ repeated-token mass, with at least
    * one strict. Stated ONCE as a Column expression — the merge
    * anti-join below and any caller share the same semantics. */
  private def dominates(b: String, a: String): Column = {
    def c(s: String, f: String) = col(s"$s.$f")
    c(b, "n_chars") >= c(a, "n_chars") &&
      c(b, "n_distinct") >= c(a, "n_distinct") &&
      c(b, "n_rep") <= c(a, "n_rep") &&
      (c(b, "n_chars") > c(a, "n_chars") ||
        c(b, "n_distinct") > c(a, "n_distinct") ||
        c(b, "n_rep") < c(a, "n_rep"))
  }

  /** q178: Pareto frontier (the skyline operator, Börzsönyi et al.,
    * ICDE'01) over three curation criteria — maximize document length
    * (`n_chars`), maximize lexical diversity (`n_distinct` whitespace
    * tokens), minimize repeated-token mass (`n_rep = n_tok −
    * n_distinct`). The multi-criteria document-selection primitive: no
    * scalar weighting, just every doc not strictly worse than another
    * on all axes at once. Exact-duplicate criterion vectors all
    * survive (neither dominates), matching the NOT EXISTS oracle.
    *
    * Distributed shape (parallel block-nested-loops): (1) one codegen'd
    * scan derives the integer criteria; (2) `mapPartitions` keeps each
    * partition's LOCAL skyline — correct as a pruner because dominance
    * is partition-independent (dominated locally ⟹ dominated
    * globally), and the expected skyline of n points in d=3 is
    * O(log²n), so the survivor set is tiny; (3) the survivors meet in
    * one broadcast nested-loop LEFT ANTI self-join on the dominance
    * predicate. At 100 TB the full corpus is touched exactly once by
    * the scan+prune; only the O(log²n)-sized candidate set is ever
    * joined. Worst case (fully anti-correlated axes) degrades the
    * candidate set toward n and the merge toward n² — the documented
    * boundary of every skyline algorithm, not of this plan. */
  def paretoFrontier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = split(trim(col("text")), "\\s+")
    val crit = Tables.documents(s, d).select(
      col("doc_id"),
      col("n_chars"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      (size(toks) - size(array_distinct(toks))).cast("long").as("n_rep"))
    def dom(b: (Long, Long, Long, Long), a: (Long, Long, Long, Long)): Boolean =
      b._2 >= a._2 && b._3 >= a._3 && b._4 <= a._4 &&
        (b._2 > a._2 || b._3 > a._3 || b._4 < a._4)
    val local = crit.as[(Long, Long, Long, Long)].mapPartitions { it =>
      val sky = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      it.foreach { r =>
        if (!sky.exists(dom(_, r))) {
          sky.filterInPlace(q => !dom(r, q)); sky += r
        }
      }
      sky.iterator
    }.toDF("doc_id", "n_chars", "n_distinct", "n_rep")
      // tiny survivor set; checkpoint so the corpus scan+prune runs
      // once, not once per side of the merge join below
      .localCheckpoint()
    local.alias("a").join(
      broadcast(local.alias("b")), dominates("b", "a"), "left_anti")
  }

  // ------------------------------------ next-fit-decreasing bin packing

  val NfdCapacity = 256L // tokens per packed training example
  val NfdGroups   = 8L   // independent packing groups (parallelism unit)

  /** q181: next-fit-decreasing bin packing — assign whole documents to
    * fixed-capacity training examples with NO document straddling (the
    * complement of q55/q167's concat-and-chunk, which splits documents
    * at shard boundaries). SFT-style packing: sort each group's docs
    * by token count descending, walk once, open a new bin whenever the
    * current doc doesn't fit. Deterministic — no RNG, ties broken by
    * doc_id.
    *
    * Packing is inherently sequential, so the scale unit is the GROUP:
    * docs hash into [[NfdGroups]] independent groups, each packed by a
    * single sequential fold. The plan is ONE exchange (repartition by
    * group) + an in-partition sort + a streaming `mapPartitions` fold
    * that detects group boundaries — no per-group in-memory
    * materialization, state is (group, bin, fill) = three longs. At
    * 100 TB raise the group count ∝ corpus size (groups are
    * embarrassingly parallel; cross-group packing loss is bounded by
    * one bin per group) — same posture as q172's snake shards. */
  def nfdPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d).select(
      col("doc_id"),
      (col("doc_id") % NfdGroups).as("grp"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    base
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("n_tok").desc, col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var grp = -1L; var bin = 0L; var fill = 0L
        it.map { case (id, g, n) =>
          if (g != grp) { grp = g; bin = 0L; fill = n }
          else if (fill + n <= NfdCapacity) fill += n
          else { bin += 1; fill = n }
          (id, g, n, bin)
        }
      }
      .toDF("doc_id", "grp", "n_tok", "bin")
  }

  // t is MATERIALIZED (r20): the recursive walk joins t once per rank
  // step, and DuckDB re-evaluated the tokenizing CTE on every
  // iteration — the sf1 replay wall (1020 s; 0.9 s materialized at
  // sf0.1 vs 33.5, row-identical — the q277 join-order-pin precedent)
  val nfdPackSql: String =
    s"""WITH RECURSIVE t AS MATERIALIZED (SELECT doc_id, doc_id % $NfdGroups AS grp,
       |  CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_tok,
       |  row_number() OVER (PARTITION BY doc_id % $NfdGroups ORDER BY
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS BIGINT) DESC, doc_id) AS rn
       |  FROM documents),
       |r(grp, rn, doc_id, n_tok, bin, fill) AS (
       |  SELECT grp, rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.grp, t.rn, t.doc_id, t.n_tok,
       |    CASE WHEN r.fill + t.n_tok <= $NfdCapacity THEN r.bin ELSE r.bin + 1 END,
       |    CASE WHEN r.fill + t.n_tok <= $NfdCapacity THEN r.fill + t.n_tok ELSE t.n_tok END
       |  FROM r JOIN t ON t.grp = r.grp AND t.rn = r.rn + 1)
       |SELECT doc_id, grp, n_tok, bin FROM r""".stripMargin.replace("\n", " ")

  val paretoFrontierSql: String =
    """WITH c AS (SELECT doc_id, n_chars,
      |  CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
      |     - len(list_distinct(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))) AS BIGINT) AS n_rep
      |FROM documents)
      |SELECT a.doc_id, a.n_chars, a.n_distinct, a.n_rep FROM c a
      |WHERE NOT EXISTS (SELECT 1 FROM c b
      |  WHERE b.n_chars >= a.n_chars AND b.n_distinct >= a.n_distinct AND b.n_rep <= a.n_rep
      |    AND (b.n_chars > a.n_chars OR b.n_distinct > a.n_distinct OR b.n_rep < a.n_rep))"""
      .stripMargin.replace("\n", " ")

  // ------------------------------------ Hamilton-apportioned eval set

  val EvalBudget = 100L

  /** q191 — EVAL-SET construction by HAMILTON APPORTIONMENT: allocate a
    * fixed eval budget across language strata in exact proportion to
    * corpus mass (floor quotas + largest-remainder top-up, the
    * apportionment rule that is integer-exact and never off by more
    * than one per stratum — the house-seats algorithm), then select
    * each stratum's members by the md5 shuffle key so the set is
    * REPRODUCIBLE and grows consistently (a doc enters/leaves only if
    * its stratum's quota moves). q73/q77 sample to externally-given
    * mixture targets; this derives the quota from the corpus itself —
    * the "make me a 100-doc eval set that looks like the corpus" op.
    *
    * Scale: the apportionment math runs on the |langs|-row count
    * aggregate (driver-bounded, the q05/q73 scalar pattern, ties by
    * lang asc so both engines agree); selection is the bounded
    * [[graft.ops.TopKAggregator.MinKByStr]] per stratum — budget-sized
    * buffers, no corpus-wide window, one exchange on lang. */
  def hamiltonEvalSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val total = nl.map(_._2).sum
    require(total >= EvalBudget, s"corpus smaller than the eval budget")
    val floors = nl.map { case (l, n) =>
      (l, EvalBudget * n / total, EvalBudget * n % total) }
    val deficit = (EvalBudget - floors.map(_._2).sum).toInt
    val topUp = floors.sortBy { case (l, _, rem) => (-rem, l) }
      .take(deficit).map(_._1).toSet
    val quota = floors
      .map { case (l, fl, _) => (l, fl + (if (topUp(l)) 1L else 0L)) }
      .filter(_._2 > 0L)
    val kCase = quota.foldLeft(lit(0L)) { case (acc, (l, k)) =>
      when(col("lang") === l, lit(k)).otherwise(acc)
    }
    val maxK = quota.map(_._2).max.toInt
    docs.filter(col("lang").isin(quota.map(_._1): _*))
      .groupBy("lang")
      .agg(graft.ops.TopKAggregator.minKByStr(maxK)(
        md5(col("doc_id").cast("string")), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .withColumn("rnk", (col("pos") + 1).cast("int"))
      .filter(col("rnk") <= kCase)
      .select(col("e._2").as("doc_id"), col("lang"), col("rnk"))
  }

  val hamiltonEvalSampleSql: String =
    s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
       |tot AS (SELECT sum(n) AS nn FROM c),
       |fl AS (SELECT lang, ($EvalBudget * n) // nn AS fl, ($EvalBudget * n) % nn AS rem
       |  FROM c CROSS JOIN tot),
       |dd AS (SELECT $EvalBudget - sum(fl) AS d FROM fl),
       |al AS (SELECT lang, fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= dd.d
       |  THEN 1 ELSE 0 END AS k FROM fl CROSS JOIN dd),
       |r AS (SELECT doc_id, lang, row_number() OVER (
       |  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rnk FROM documents)
       |SELECT r.doc_id, r.lang, CAST(r.rnk AS INT) AS rnk
       |FROM r JOIN al USING (lang) WHERE r.rnk <= al.k""".stripMargin.replace("\n", " ")

  // -------------------------------- rendezvous-hash shard stability

  val HrwShards = 8

  /** q192 — RENDEZVOUS (highest-random-weight) SHARD ASSIGNMENT and its
    * resize-stability audit: every doc goes to argmax_s md5(doc:s) over
    * [[HrwShards]] shards, and the audit recomputes the assignment with
    * ONE MORE shard, emitting the (shard_old, shard_new) movement
    * matrix. HRW's guarantee — the reason incremental corpus rebuilds
    * shard this way instead of `id % S` (which moves (S-1)/S of all
    * docs on resize) — is that a doc moves ONLY INTO the new shard,
    * with probability exactly 1/(S+1): the matrix must be diagonal
    * plus one column, and the spec pins that structurally. q172's
    * snake deal balances a STATIC corpus perfectly; HRW is the
    * GROWING-corpus dual (perfectly stable, statistically balanced).
    *
    * Pure per-row map (argmax over a constant-size literal struct
    * array — codegen'd, no shuffle) into an (S+1)²-bounded aggregate;
    * scan-speed at any corpus size. */
  def rendezvousStability(s: SparkSession, d: String): DataFrame = {
    def shardOf(n: Int): Column =
      array_max(array((0 until n).map(i => struct(
        md5(concat_ws(":", col("doc_id"), lit(i))).as("h"),
        lit(i).as("s"))): _*)).getField("s")
    Tables.documents(s, d)
      .select(shardOf(HrwShards).as("shard_old"),
        shardOf(HrwShards + 1).as("shard_new"))
      .groupBy("shard_old", "shard_new")
      .agg(count(lit(1)).as("n_docs"))
  }

  val rendezvousStabilitySql: String =
    s"""WITH e AS (SELECT doc_id, s,
       |  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)) AS h
       |  FROM documents CROSS JOIN range(${HrwShards + 1}) t(s)),
       |a AS (SELECT doc_id,
       |  CAST(arg_max(s, h) FILTER (WHERE s < $HrwShards) AS INT) AS shard_old,
       |  CAST(arg_max(s, h) AS INT) AS shard_new
       |  FROM e GROUP BY doc_id)
       |SELECT shard_old, shard_new, CAST(count(*) AS BIGINT) AS n_docs
       |FROM a GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  // --------------------------- tokenizer fertility / cost accounting

  /** q218 — TOKENIZER FERTILITY AND BYTE-COST accounting per
    * (lang, source) cell: documents, whitespace words, BPE-ish tokens
    * ([[nTokCol]] — the q24/q108/q167 convention), characters and
    * UTF-8 bytes, plus the two ratios every pretraining budget is
    * written in: fertility (tokens per word) and bytes per token.
    * This is the table that prices a corpus before training —
    * token-budget ops (q108/q211) allocate in tokens, storage and
    * egress bill in bytes, and fertility is the canonical "is the
    * tokenizer a good fit for this language?" regression check
    * (a fertility jump after a tokenizer change = that language got
    * more expensive and its effective context shrank).
    *
    * FLOAT RULE: ratios ship as exact integer div in ppm
    * (fert_ppm = toks·10⁶ div words; bpt_ppm = bytes·10⁶ div toks),
    * raw sums alongside so any other ratio derives downstream.
    * Headroom: bytes·10⁶ < 2^63 to ~9 TB per cell — past that, drop
    * the ppm columns and divide in wide arithmetic downstream (the
    * q198 convention).
    *
    * Scale shape: ONE scan, all five counters in one (lang, source)
    * hash aggregate (map-side partials, grid-bounded output); the
    * ratios are literals over the grid. Byte length is `octet_length`
    * here / `strlen` in DuckDB — both the UTF-8 byte count. */
  def tokenizerStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), col("source"),
        expr("size(filter(split(text, '\\\\s+'), w -> w <> ''))").cast("long")
          .as("words"),
        nTokCol.as("toks"), col("n_chars"),
        octet_length(col("text")).cast("long").as("bytes"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("words").as("n_words"),
        sum("toks").as("n_toks"), sum("n_chars").as("n_chars"),
        sum("bytes").as("n_bytes"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_toks"), col("n_chars"), col("n_bytes"),
        expr("n_toks * 1000000 div greatest(n_words, 1)").as("fert_ppm"),
        expr("n_bytes * 1000000 div greatest(n_toks, 1)").as("bpt_ppm"))

  val tokenizerStatsSql: String =
    """WITH t AS (SELECT lang, source,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS BIGINT) AS words,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS toks,
      |  n_chars, CAST(strlen(text) AS BIGINT) AS bytes
      |  FROM documents),
      |g AS (SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(words) AS BIGINT) AS n_words,
      |  CAST(sum(toks) AS BIGINT) AS n_toks,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  CAST(sum(bytes) AS BIGINT) AS n_bytes
      |  FROM t GROUP BY 1, 2)
      |SELECT lang, source, n_docs, n_words, n_toks, n_chars, n_bytes,
      |  CAST(n_toks * 1000000 // greatest(n_words, 1) AS BIGINT) AS fert_ppm,
      |  CAST(n_bytes * 1000000 // greatest(n_toks, 1) AS BIGINT) AS bpt_ppm
      |FROM g""".stripMargin.replace("\n", " ")
}
