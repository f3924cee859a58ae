package graft.text

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Text-analysis operators for the large-scale training-data pipeline:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All are pure per-row `Column` expressions (whole-stage codegen, no UDFs,
  * no shuffle) — they scale linearly with input and keep the parquet scan
  * pruned to (doc_id, text).
  */
object TextQueries {

  // ---------------------------------------------------------------- lang id

  /** Marker words per language for the n-gram-ish heuristic. Checked as
    * ` word `-padded substring hits so partial words don't fire. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "de" -> Seq(" der ", " und ", " die ", " das "),
    "es" -> Seq(" el ", " la ", " que ", " los "),
    "fr" -> Seq(" le ", " les ", " des ", " est "))

  private def score(padded: Column, words: Seq[String]): Column =
    words.map(w => when(instr(padded, w) > 0, 1).otherwise(0)).reduce(_ + _)

  /** Heuristic language ID: count marker-word hits per language, argmax
    * with fixed precedence (en, de, es, fr, zh), CJK presence for zh,
    * 'und' when nothing fires. */
  def langId(s: SparkSession, d: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = markers.map { case (l, ws) => l -> score(padded, ws) }.toMap
    val zh = when(col("text").rlike("[\\u4e00-\\u9fff]"), 4).otherwise(0)
    val all = scores.values.toSeq :+ zh
    def isMax(c: Column) = all.map(o => c >= o).reduce(_ && _) && c > 0
    val pred = when(isMax(scores("en")), "en")
      .when(isMax(scores("de")), "de")
      .when(isMax(scores("es")), "es")
      .when(isMax(scores("fr")), "fr")
      .when(zh > 0, "zh")
      .otherwise("und")
    Tables.documents(s, d).select(col("doc_id"), pred.as("pred_lang"))
  }

  val langIdSql: String = {
    def sc(ws: Seq[String]) = ws
      .map(w => s"CASE WHEN instr(' ' || lower(text) || ' ', '$w') > 0 THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    val en = sc(markers(0)._2); val de = sc(markers(1)._2)
    val es = sc(markers(2)._2); val fr = sc(markers(3)._2)
    val zh = "(CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 4 ELSE 0 END)"
    s"WITH sc AS (SELECT doc_id, $en AS s_en, $de AS s_de, $es AS s_es, $fr AS s_fr, $zh AS s_zh FROM documents) " +
      "SELECT doc_id, CASE " +
      "WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh AND s_en > 0 THEN 'en' " +
      "WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh AND s_de > 0 THEN 'de' " +
      "WHEN s_es >= s_fr AND s_es >= s_zh AND s_es > 0 THEN 'es' " +
      "WHEN s_fr >= s_zh AND s_fr > 0 THEN 'fr' " +
      "WHEN s_zh > 0 THEN 'zh' ELSE 'und' END AS pred_lang FROM sc"
  }

  // ---------------------------------------------------------------- quality

  private val stopwords = Seq("the", "a", "of", "and", "is", "to")

  /** Quality scoring: token count, stopword ratio, mean word length,
    * good/low flag — the usual cheap pre-training filters. */
  def quality(s: SparkSession, d: String): DataFrame = {
    val nTok = size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    val stopPred = stopwords.map(w => s"t = '$w'").mkString(" OR ")
    val nStop = size(expr(s"filter(split(text, ' '), t -> $stopPred)"))
    val alnum = length(regexp_replace(col("text"), "[^a-z0-9]", ""))
    // ratios ship as k/10⁴ half-up integer arithmetic and the quality
    // cut compares in integer space (5·n_stop < 3·n_tok ⟺ ratio < 0.6)
    // — round(int-ratio, 4) and double-vs-0.6 compares are the
    // cross-engine tie traps (FLOAT RULE, see CorpusOps.tokenBudget)
    Tables.documents(s, d).select(
      col("doc_id"),
      nTok.as("n_tok"),
      nStop.as("n_stop"),
      alnum.as("alnum"))
    .select(
      col("doc_id"),
      col("n_tok"),
      col("n_stop"),
      (expr("(CAST(n_stop AS BIGINT) * 10000 + greatest(n_tok, 1) div 2) div greatest(n_tok, 1)")
        .cast("double") / 10000.0).as("stop_ratio"),
      (expr("(CAST(alnum AS BIGINT) * 10000 + greatest(n_tok, 1) div 2) div greatest(n_tok, 1)")
        .cast("double") / 10000.0).as("avg_wlen"),
      when(expr("n_tok >= 20 AND 5 * CAST(n_stop AS BIGINT) < 3 * n_tok"), "good")
        .otherwise("low").as("quality"))
  }

  val qualitySql: String = {
    val stopPred = stopwords.map(w => s"t = '$w'").mkString(" OR ")
    "WITH c AS (SELECT doc_id, " +
      "len(regexp_extract_all(text, '[a-z0-9]+')) AS n_tok, " +
      s"len(list_filter(string_split(text, ' '), t -> $stopPred)) AS n_stop, " +
      "length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS alnum FROM documents) " +
      "SELECT doc_id, n_tok, n_stop, " +
      "CAST((n_stop * 10000 + greatest(n_tok, 1) // 2) // greatest(n_tok, 1) AS DOUBLE) / 10000.0 AS stop_ratio, " +
      "CAST((alnum * 10000 + greatest(n_tok, 1) // 2) // greatest(n_tok, 1) AS DOUBLE) / 10000.0 AS avg_wlen, " +
      "CASE WHEN n_tok >= 20 AND 5 * n_stop < 3 * n_tok THEN 'good' ELSE 'low' END AS quality " +
      "FROM c"
  }

  /** q107 — per-SOURCE quality drilldown: each ingest feed's low-quality
    * rate and its LIFT over the corpus rate — the monitoring query that
    * decides which feed gets throttled or re-filtered before the next
    * crawl. One conditional aggregate over the scan (the q23 flag
    * inlined so source rides along); the per-source table is bounded by
    * |sources| and checkpointed for its two consumers (its own rows +
    * the corpus totals), so the corpus is scanned once. Rate and lift
    * expressions are structured identically to the oracle's. */
  def sourceQualityLift(s: SparkSession, d: String): DataFrame = {
    val nTok = size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    val stopPred = stopwords.map(w => s"t = '$w'").mkString(" OR ")
    val nStop = size(expr(s"filter(split(text, ' '), t -> $stopPred)"))
    // q23's quality cut in integer space (FLOAT RULE)
    val isLow = when(
      expr("n_tok_ >= 20 AND 5 * CAST(n_stop_ AS BIGINT) < 3 * n_tok_"), 0L)
      .otherwise(1L)
    val perSource = Tables.documents(s, d)
      .withColumn("n_tok_", nTok).withColumn("n_stop_", nStop)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(isLow).as("lo"))
      .localCheckpoint(true)
    val tot = perSource.agg(sum("n").as("tn"), sum("lo").as("tl"))
    // both rates quantize to half-up ten-thousandths in integer space,
    // and lift is the ratio OF THE QUANTIZED rates (lrx/trx, itself
    // half-up-quantized): two-stage quantization keeps every operand
    // ≤ 10⁸ — no 128-bit product like lo·tn·10⁴ at corpus scale — and
    // both engines run the identical integer expressions
    perSource.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        expr("(lo * 10000 + n div 2) div n").as("lrx"),
        expr("greatest((tl * 10000 + tn div 2) div tn, 1)").as("trx"))
      .select(col("source"), col("n"),
        (col("lrx").cast("double") / 10000.0).as("low_rate"),
        (expr("(lrx * 10000 + trx div 2) div trx")
          .cast("double") / 10000.0).as("lift"))
  }

  val sourceQualityLiftSql: String = {
    val stopPred = stopwords.map(w => s"t = '$w'").mkString(" OR ")
    val low = s"CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= 20 AND " +
      s"5 * len(list_filter(string_split(text, ' '), t -> $stopPred)) < " +
      s"3 * len(regexp_extract_all(text, '[a-z0-9]+')) THEN 0 ELSE 1 END"
    s"""WITH ps AS (SELECT source, count(*) AS n, sum($low) AS lo FROM documents GROUP BY source),
       |tot AS (SELECT sum(n) AS tn, sum(lo) AS tl FROM ps),
       |r AS (SELECT source, n, (lo * 10000 + n // 2) // n AS lrx,
       |  greatest((tl * 10000 + tn // 2) // tn, 1) AS trx FROM ps, tot)
       |SELECT source, n, CAST(lrx AS DOUBLE) / 10000.0 AS low_rate,
       |  CAST((lrx * 10000 + trx // 2) // trx AS DOUBLE) / 10000.0 AS lift
       |FROM r""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------------------ token count

  /** Whitespace tokens + a BPE-ish regex segmentation (letters / digits /
    * single punctuation), both codegen'd per-row. */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)")).as("bpe_tokens"),
      col("n_chars"))

  val tokenCountSql: String =
    "SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS ws_tokens, len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens, n_chars FROM documents"

  // ----------------------------------------------------------- fingerprint

  /** Canonical-form fingerprint: md5 over the lowercased, alnum-only
    * text — the exact-dedup key that survives whitespace/punct edits. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("fp"))

  val fingerprintSql: String =
    "SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp FROM documents"

  // ---------------------------------------------------------- corpus stats

  /** Per-language corpus statistics: doc count, mean whitespace-token
    * count, exact p50/p95 of n_chars — the profiling pass every corpus
    * build starts with. One hash aggregate; exact percentiles become
    * `approx_percentile` at 100 TB (same switch as q05). */
  def corpusStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("tok_sum"),
        expr("percentile(n_chars, 0.5D)").as("p50_chars"),
        expr("percentile(n_chars, 0.95D)").as("p95_chars"))
      // mean tokens as k/10⁴ half-up integer arithmetic — round(avg(int))
      // was the exact q108 failure shape (FLOAT RULE). p50/p95 stay raw:
      // both engines interpolate the same int order statistics with the
      // same (n−1)·p formula, so the doubles are bit-identical un-rounded.
      .select(col("lang"), col("n_docs"),
        (expr("(tok_sum * 10000 + n_docs div 2) div n_docs")
          .cast("double") / 10000.0).as("avg_tokens"),
        col("p50_chars"), col("p95_chars"))

  val corpusStatsSql: String =
    "WITH c AS (SELECT lang, count(*) AS n_docs, " +
      "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS tok_sum, " +
      "quantile_cont(n_chars, 0.5) AS p50_chars, " +
      "quantile_cont(n_chars, 0.95) AS p95_chars " +
      "FROM documents GROUP BY lang) " +
      "SELECT lang, n_docs, " +
      "CAST((tok_sum * 10000 + n_docs // 2) // n_docs AS DOUBLE) / 10000.0 AS avg_tokens, " +
      "p50_chars, p95_chars FROM c"

  // ------------------------------------------------------------- sampling

  /** Per-language sampling percentage: downsample the dominant language,
    * keep more of the rest — corpus rebalancing. */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 10, "de" -> 25, "es" -> 25, "fr" -> 25, "zh" -> 50)
  val DefaultRate = 50

  /** Deterministic stratified sampling: keep a doc iff a 61-bit md5
    * hash of its text mod 100 falls under the language's rate. Hash-
    * based (not rand()) so the sample is reproducible across runs,
    * engines and retries — a requirement for auditable training sets.
    * Pure filter: no shuffle, pushes nothing but compute per row. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val rate = SampleRates.foldRight(lit(DefaultRate): Column) {
      case ((l, r), acc) => when(col("lang") === l, r).otherwise(acc)
    }
    Tables.documents(s, d)
      .withColumn("bucket",
        (shiftrightunsigned(graft.functions.GraftFunctions.md5Lower64(col("text")), 3)
          % 100L).cast("int"))
      .filter(col("bucket") < rate)
      .select("doc_id", "lang", "bucket")
  }

  val stratifiedSampleSql: String = {
    val rate = SampleRates.foldRight(DefaultRate.toString) {
      case ((l, r), acc) => s"CASE WHEN lang = '$l' THEN $r ELSE $acc END"
    }
    "SELECT doc_id, lang, CAST((md5_number_lower(text) >> 3) % 100 AS INT) AS bucket " +
      s"FROM documents WHERE CAST((md5_number_lower(text) >> 3) % 100 AS INT) < $rate"
  }

  // ------------------------------------------------------------- chunking

  val ChunkChars = 256

  /** Context-window chunking: split each document into fixed-size
    * character chunks with positional index — the RAG/pretraining
    * segmentation step. Pure generate+substring expressions (codegen,
    * no UDF); emits the chunk md5 rather than the text so downstream
    * compares move 16 bytes, not documents. */
  def chunkDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(greatest(1, ceil(length(text) / $ChunkChars.0)) AS INT) - 1), i -> substring(text, i * $ChunkChars + 1, $ChunkChars))"))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        length(col("chunk")).as("chunk_len"), md5(col("chunk")).as("chunk_hash"))

  val chunkDocsSql: String =
    s"WITH c AS (SELECT doc_id, unnest(generate_series(0, CAST(greatest(1, ceil(length(text) / $ChunkChars.0)) AS INT) - 1)) AS chunk_idx, text FROM documents) " +
      s"SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, " +
      s"CAST(length(substr(text, CAST(chunk_idx * $ChunkChars + 1 AS INT), $ChunkChars)) AS INT) AS chunk_len, " +
      s"md5(substr(text, CAST(chunk_idx * $ChunkChars + 1 AS INT), $ChunkChars)) AS chunk_hash FROM c"

  // ----------------------------------------------------------- vocabulary

  val VocabTopN = 50

  /** Vocabulary building: corpus-wide token frequencies, top-N — the
    * precursor to tokenizer training. Explode → one hash aggregate on
    * the token (map-side partials collapse the per-doc repeats), then a
    * top-N that AQE executes as a bounded TakeOrdered, never a global
    * sort of the vocabulary. */
  def vocab(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(VocabTopN)

  val vocabSql: String =
    s"SELECT token, count(*) AS freq FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')) AS token FROM documents) " +
      s"GROUP BY token ORDER BY freq DESC, token LIMIT $VocabTopN"

  // ------------------------------------- vocabulary coverage (OOV rate)

  /** q236 coverage-vocabulary size — deliberately TIGHTER than q40's
    * [[VocabTopN]]: the generator's whole whitespace vocabulary fits
    * inside the top-50 (measured: zero OOV corpus-wide), which would
    * make the audit vacuous; a top-25 vocabulary leaves a real tail
    * to measure, which is the production situation (vocabularies
    * never cover the stream). */
  val OovVocabN = 25

  /** q236 — OUT-OF-VOCABULARY RATE per language against the
    * top-[[OovVocabN]] frequency vocabulary (q40's construction, its
    * own size): the tokenizer-coverage regression check. A vocabulary
    * trained on yesterday's mixture quietly shreds a newly-added
    * language into byte fallbacks — OOV rate per language is the
    * number that catches it before fertility (q218) degrades
    * downstream. Same whitespace-token convention as q40 so
    * vocabulary and coverage describe the same token stream.
    *
    * FLOAT RULE: oov_ppm by exact div; raw counts alongside.
    *
    * Scale shape: the vocab is an [[OovVocabN]]-row bounded
    * TakeOrdered broadcast onto ONE token-stream scan; per-(lang)
    * conditional counts in one grid aggregate. */
  def oovRate(s: SparkSession, d: String): DataFrame = {
    val v = Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(OovVocabN)
      .select(col("token"), lit(1L).as("in_vocab"))
    Tables.documents(s, d)
      .select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .join(broadcast(v), Seq("token"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_toks"), col("n_oov"),
        expr("n_oov * 1000000 div n_toks").as("oov_ppm"))
  }

  val oovRateSql: String =
    s"""WITH v AS (SELECT token, count(*) AS freq FROM
       |  (SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
       |    t -> t <> '')) AS token FROM documents)
       |  GROUP BY token ORDER BY freq DESC, token LIMIT $OovVocabN),
       |t AS (SELECT lang, unnest(list_filter(
       |  string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS token
       |  FROM documents)
       |SELECT lang, count(*) AS n_toks,
       |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS oov_ppm
       |FROM t LEFT JOIN v ON v.token = t.token
       |GROUP BY lang""".stripMargin.replace("\n", " ")

  // ------------------------------------------------- LM quality scoring

  /** Per-document cross-entropy under an add-one-smoothed BIGRAM model
    * fit on the corpus itself — the CCNet-style LM quality filter (low
    * score = fluent/typical text, high score = off-distribution), one
    * step past the q23 surface heuristics. score(D) = avg over D's
    * bigrams of −ln((c(w1,w2)+1)/(c(w1)+V)), V = context vocabulary.
    *
    * Scale: bigrams come from a codegen'd zip_with over the token
    * array (no UDF, no self-join); the model is two keyed hash
    * aggregates — c(w1,w2), then c(w1) riding the same exchange as a
    * second aggregate over it — and scoring joins the bigrams back on
    * their own keys (vocabulary-sized model tables, data-sized probe:
    * the classic fact-dim shape). V is a one-row broadcast. Since the
    * scored corpus IS the training corpus, every probe bigram hits the
    * model — no missing-join edge. */
  def lmScore(s: SparkSession, d: String): DataFrame = {
    val bigrams = Tables.documents(s, d)
      .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "slice(toks, 2, greatest(size(toks)-1, 0)), (a, b) -> struct(a, b))")).as("p"))
      .select(col("doc_id"), col("p.a").as("w1"), col("p.b").as("w2"))
    // the model table feeds THREE consumers (context totals, V, the
    // probe join) and each would re-execute the bigram build without
    // the checkpoint (the q90/q95 lesson — four corpus scans audited;
    // two with it: model build + probe)
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val v = c1.agg(count(lit(1)).as("v"))
    bigrams
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log((col("c12") + 1.0) / (col("c1") + col("v")))), 4).as("score"))
  }

  val lmScoreSql: String =
    "WITH t AS (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents), " +
      "bg AS (SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t), " +
      "b2 AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg), " +
      "c12 AS (SELECT w1, w2, count(*) AS c12 FROM b2 GROUP BY w1, w2), " +
      "c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1), " +
      "v AS (SELECT count(*) AS v FROM c1) " +
      "SELECT b2.doc_id, count(*) AS n_bigrams, " +
      "round(avg(-ln((c12 + 1.0)/(c1 + v))), 4) AS score " +
      "FROM b2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v " +
      "GROUP BY b2.doc_id"

  // ------------------------------------------- Naive Bayes classifier

  /** q94 — a multinomial NAIVE BAYES language classifier TRAINED AND
    * SCORED in one lazy plan: the trainable upgrade of q22's fixed
    * n-gram heuristic, and the closed-form cousin of the fasttext-style
    * quality/language filters every corpus pipeline runs. NB is the one
    * classifier whose "training" is exactly the aggregations a SQL
    * engine is good at — per-(token,class) counts plus class priors —
    * so unlike the MLP (q11, driver-trained weights), the entire
    * train→predict DAG is declarative, distributed, and
    * oracle-checkable with no fitted artifact crossing the boundary.
    *
    * score(doc, l) = ln p(l) + Σ_tokens ln((c(w,l)+1)/(n_l+V)) — add-one
    * smoothing, the q84 convention. Unseen (w,l) pairs fall out of the
    * left join and coalesce to the smoothed floor. Prediction = argmax
    * (row_number over score desc, lang asc tiebreak).
    *
    * Scale: the model IS one hash aggregate — the (token, class) count
    * table, vocab·|classes| rows, localCheckpoint'ed because THREE
    * consumers derive from it (class totals, vocabulary size, the
    * scoring join) and exchange reuse does not fire across consumer
    * branches (the q95 lesson; the audit measured one token-stream
    * scan per consumer without it). Class priors collapse to CASE
    * literals from one bounded |classes|-row collect. Scoring is the
    * token stream × |classes| (a 5-way multiply, not a shuffle
    * blowup) joined against the model tables; the argmax window
    * partitions on doc_id, whose cardinality grows with the data.
    * Total fact scans: one to build the model, one to score. Only the
    * RANK of class scores crosses the engine boundary, so
    * ln/sum-order ulps (which differ across engines) are harmless:
    * flipping an argmax needs two class scores within ~1e-13
    * relative, and real class scores differ by O(1) in log space.
    *
    * On THIS corpus accuracy is ~47% (sf0.01): the synthetic generator
    * draws all languages from one shared vocabulary, so there is
    * little signal beyond the class prior — the measured ceiling of
    * the data, not a defect of the classifier (the oracle checks the
    * exact same predictions). */
  def naiveBayesLang(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
    val cwl = toks.groupBy(col("w"), col("lang").as("l"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ntl = cwl.groupBy("l").agg(sum("c").as("n_l"))
    val v = cwl.agg(countDistinct("w").as("v")) // (w,l) rows are distinct in w per l
    val nl = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = nl.values.sum
    // priors as literals: only the argmax RANK crosses engines, so the
    // driver-side Math.log vs the oracle's ln differing in the last ulp
    // cannot flip anything two real class scores distinguish
    val priorCase = nl.toSeq.sortBy(_._1).foldLeft(lit(Double.NaN)) {
      case (acc, (l, n)) =>
        when(col("l") === l, lit(math.log(n.toDouble / nDocs))).otherwise(acc)
    }
    val langs = s.createDataset(nl.keys.toSeq.sorted)(Encoders.STRING).toDF("l")
    val scored = toks
      .crossJoin(broadcast(langs))
      .join(cwl, Seq("w", "l"), "left")
      .join(broadcast(ntl), "l")
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"), col("lang"), col("l"))
      .agg(sum(log((coalesce(col("c"), lit(0L)) + 1.0) / (col("n_l") + col("v"))))
        .as("ll"))
      .withColumn("score", col("ll") + priorCase)
    val rank = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("l").asc)
    scored.withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("l").as("pred"),
        (col("lang") === col("l")).as("correct"))
  }

  val naiveBayesLangSql: String =
    """WITH t AS (SELECT doc_id, lang, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents),
      |cwl AS (SELECT w, lang AS l, count(*) AS c FROM t GROUP BY w, lang),
      |ntl AS (SELECT l, sum(c) AS n_l FROM cwl GROUP BY l),
      |v AS (SELECT count(DISTINCT w) AS v FROM t),
      |pri AS (SELECT lang AS l, ln(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents)) AS prior FROM documents GROUP BY lang),
      |langs AS (SELECT DISTINCT lang AS l FROM documents),
      |sc AS (SELECT t.doc_id, t.lang, langs.l,
      |  sum(ln((coalesce(cwl.c, 0) + 1.0) / (ntl.n_l + v.v))) AS ll
      |  FROM t CROSS JOIN langs
      |  LEFT JOIN cwl ON t.w = cwl.w AND langs.l = cwl.l
      |  JOIN ntl ON ntl.l = langs.l CROSS JOIN v
      |  GROUP BY t.doc_id, t.lang, langs.l),
      |fin AS (SELECT sc.doc_id, sc.lang, sc.l, sc.ll + pri.prior AS score FROM sc JOIN pri USING (l)),
      |r AS (SELECT doc_id, lang, l, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, l) AS rn FROM fin)
      |SELECT doc_id, lang, l AS pred, lang = l AS correct FROM r WHERE rn = 1""".stripMargin.replace("\n", " ")

  // ------------------------------------------------- PMI collocations

  val CollocMinSupport = 5L
  val CollocTopN = 100

  /** q90 — COLLOCATION mining by pointwise mutual information over
    * adjacent token pairs (the word2phrase step that decides "new_york"
    * should be one token before a tokenizer is trained):
    * pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with the joint from bigram
    * counts and the marginals from unigram counts. High-PMI pairs are
    * merged into phrase tokens; this emits the top-[[CollocTopN]] by
    * PMI among pairs with support ≥ [[CollocMinSupport]].
    *
    * Scale: bigrams come from the same codegen'd zip_with as q84 (no
    * self-join); counts are two keyed hash aggregates (vocab- and
    * bigram-vocab-bounded, map-side partials), each localCheckpoint'ed
    * because each feeds multiple consumers (its scalar total + the
    * marginal joins — without the checkpoint the plan audit counted
    * five token-stream scans, one per consumer branch); the support
    * filter prunes the pair table BEFORE the marginal joins (the long
    * tail of hapax bigrams — most of the table — never reaches a
    * join); the two scalar totals broadcast; and the final top-N is
    * TakeOrderedAndProject, never a global sort. The PMI expression is
    * structured identically to the oracle's so IEEE multiplication
    * order matches term-for-term (then round(…,4) belt-and-braces). */
  def collocations(s: SparkSession, d: String): DataFrame = {
    val toksDf = Tables.documents(s, d)
      .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
    val uni = toksDf.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val n1 = uni.agg(sum("c").as("n1"))
    val bigrams = toksDf.select(explode(expr(
      "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)), " +
        "slice(toks, 2, greatest(size(toks)-1, 0)), (a, b) -> struct(a, b))")).as("p"))
      .select(col("p.a").as("w1"), col("p.b").as("w2"))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val n2 = c12.agg(sum("c12").as("n2"))
    c12.filter(col("c12") >= CollocMinSupport)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .select(col("w1"), col("w2"), col("c12"),
        round(log(
          (col("c12").cast("double") * col("n1") * col("n1")) /
            (col("n2").cast("double") * col("c1") * col("c2"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(CollocTopN)
  }

  val collocationsSql: String =
    s"""WITH t AS (SELECT regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
       |tok AS (SELECT unnest(toks) AS w FROM t),
       |uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
       |n1 AS (SELECT sum(c) AS n1 FROM uni),
       |bg AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t),
       |b2 AS (SELECT p[1] AS w1, p[2] AS w2 FROM bg),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM b2 GROUP BY w1, w2),
       |n2 AS (SELECT sum(c12) AS n2 FROM c12)
       |SELECT w1, w2, c12,
       |  round(ln((CAST(c12 AS DOUBLE) * n1 * n1) / (CAST(n2 AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
       |FROM c12 JOIN uni u1 ON c12.w1 = u1.w JOIN uni u2 ON c12.w2 = u2.w
       |CROSS JOIN n1 CROSS JOIN n2
       |WHERE c12 >= $CollocMinSupport
       |ORDER BY pmi DESC, w1, w2 LIMIT $CollocTopN""".stripMargin.replace("\n", " ")

  // --------------------------------------- Kneser–Ney bigram LM table

  val KnTopN = 100
  /** Absolute discount — 0.75 is the standard KN choice and FP-exact. */
  val KnD = "0.75"

  /** q206 — KNESER–NEY smoothed bigram LM table: the production
    * n-gram-LM estimator next to q84's add-k baseline. KN's insight is
    * the CONTINUATION count: the backoff weight of a word is how many
    * DISTINCT contexts it follows, not how often it occurs — the
    * "Francisco problem" (frequent, but only ever after "San", so it
    * deserves almost no backoff mass). Per bigram:
    * P_KN(w2|w1) = max(c−D,0)/c(w1·) + D·N1+(w1·)/c(w1·) · N1+(·w2)/T
    * with c(w1·) the bigram-token total for w1, N1+(w1·)/N1+(·w2) the
    * distinct-continuation counts, T the bigram-type total.
    *
    * Every input is an exact integer off the (w1, w2) count grid; the
    * probability is ONE fixed double expression tree over them
    * (IEEE-identical cross-engine, ±0 ULP — the q148 discipline),
    * shipped rounded to 6dp. Top-[[KnTopN]] by count (w1, w2
    * tiebreak) plans TakeOrderedAndProject, never a global sort.
    *
    * Scale shape: one corpus scan → bigram explode → ONE (w1, w2)
    * count aggregate; c(w1·), N1+(w1·), N1+(·w2) and T all derive
    * from that GRID (two grid-grain aggregates + one broadcast
    * scalar), so nothing after the first exchange is corpus-sized —
    * at 100 TB the grid is vocabulary², and on natural text the
    * observed-bigram-type count grows far slower than tokens. */
  def knBigramLm(s: SparkSession, d: String): DataFrame = {
    val c12 = Tables.documents(s, d)
      .withColumn("toks", expr("regexp_extract_all(text, '[a-z0-9]+', 0)"))
      .select(explode(expr(
        "zip_with(slice(toks, 1, greatest(size(toks)-1, 0)), " +
          "slice(toks, 2, greatest(size(toks)-1, 0)), (a, b) -> struct(a, b))")).as("p"))
      .select(col("p.a").as("w1"), col("p.b").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // grid-sized; feeds all three marginals
    val w1m = c12.groupBy("w1")
      .agg(sum("c12").as("c1tot"), count(lit(1)).as("n1fwd"))
    val w2m = c12.groupBy("w2").agg(count(lit(1)).as("n1bwd"))
    val types = c12.agg(count(lit(1)).as("t"))
    c12
      .join(w1m, "w1").join(w2m, "w2")
      .crossJoin(broadcast(types))
      .select(col("w1"), col("w2"), col("c12"),
        col("c1tot"), col("n1fwd"), col("n1bwd"),
        expr(s"round(greatest(CAST(c12 AS DOUBLE) - $KnD, 0.0) / c1tot + " +
          s"(($KnD * n1fwd) / c1tot) * (CAST(n1bwd AS DOUBLE) / t), 6)")
          .as("kn_prob6"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(KnTopN)
  }

  val knBigramLmSql: String =
    s"""WITH t AS (SELECT regexp_extract_all(text, '[a-z0-9]+') AS toks FROM documents),
       |bg AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p FROM t),
       |c12 AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |w1m AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1tot, count(*) AS n1fwd
       |  FROM c12 GROUP BY 1),
       |w2m AS (SELECT w2, count(*) AS n1bwd FROM c12 GROUP BY 1),
       |ty AS (SELECT count(*) AS t FROM c12)
       |SELECT c12.w1, c12.w2, c12.c12, w1m.c1tot, w1m.n1fwd, w2m.n1bwd,
       |  round(greatest(CAST(c12.c12 AS DOUBLE) - $KnD, 0.0) / w1m.c1tot +
       |    (($KnD * w1m.n1fwd) / w1m.c1tot) * (CAST(w2m.n1bwd AS DOUBLE) / ty.t), 6)
       |    AS kn_prob6
       |FROM c12 JOIN w1m USING (w1) JOIN w2m USING (w2) CROSS JOIN ty
       |ORDER BY c12.c12 DESC, c12.w1, c12.w2 LIMIT $KnTopN""".stripMargin
      .replace("\n", " ")

  // --------------------------------------------------- lexical diversity

  /** q97 — per-document LEXICAL DIVERSITY signals: unigram entropy and
    * type-token ratio, the information-theoretic quality features next
    * to q23's surface ratios (template spam has low entropy at normal
    * length; keyboard mash has high TTR and high entropy; both slip
    * past punctuation heuristics).
    *
    * Entropy uses the one-pass algebra H = ln n − (Σ c·ln c)/n — no
    * second aggregation to normalize by n, no window; the identical
    * expression tree in both engines keeps IEEE rounding aligned
    * (round(…,4) on top). Two keyed hash aggregates total, both with
    * map-side partials; zero-token docs drop out of the explode in
    * both engines alike. */
  def lexicalDiversity(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        round(log(sum(col("c")).cast("double")) -
          sum(col("c") * log(col("c").cast("double"))) / sum(col("c")), 4)
          .as("entropy"))
      // ttr = types/tokens is an int ratio → ships as k/10⁴ half-up
      // integer arithmetic (FLOAT RULE); entropy's log terms have full
      // mantissas, so its round(…,4) stays tie-free
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("entropy"))
      .withColumn("ttr",
        expr("(n_types * 10000 + n_tokens div 2) div n_tokens")
          .cast("double") / 10000.0)

  val lexicalDiversitySql: String =
    """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS w FROM documents),
      |c AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY doc_id, w)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_types,
      |  round(ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(CAST(c AS DOUBLE))) / sum(c), 4) AS entropy,
      |  CAST((count(*) * 10000 + sum(c) // 2) // sum(c) AS DOUBLE) / 10000.0 AS ttr
      |FROM c GROUP BY doc_id""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------------ multimodal

  /** Multimodal plumbing: treat payloads as opaque binary + typed
    * metadata. The testdata has no media files, so the binary column is
    * the utf-8 encoding of `text` and the decode step is a deterministic
    * stub (graft.multimodal.Multimodal has the mapPartitions path); the
    * schema / batching / chunk-count plumbing is real. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    val bytes = encode(col("text"), "UTF-8")
    val byteLen = length(bytes).cast("long")
    Tables.documents(s, d).select(
      col("doc_id"),
      byteLen.as("byte_len"),
      ceil(byteLen.cast("double") / 256.0).cast("long").as("n_chunks"),
      ((byteLen * 2654435761L) % 2147483647L).as("stub_sig"))
  }

  val multimodalMetaSql: String =
    "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 256.0) AS BIGINT) AS n_chunks, (CAST(octet_length(encode(text)) AS BIGINT) * 2654435761) % 2147483647 AS stub_sig FROM documents"

  /** q74 — frame-sampling metadata, the oracle-checked twin of
    * [[graft.multimodal.Multimodal.sampleFrames]]: the payload (here
    * the text standing in for media bytes) is framed at 64 chars,
    * every 4th frame is kept, and each sampled frame's md5 stands in
    * for its decoded features (the md5 is what both engines can compute
    * bit-identically; the binary path's decodeStub is test-verified in
    * MultimodalSpec). Output grain = (doc, sampled frame) — the
    * explode-then-process shape whose volume scales with payload bytes,
    * exactly like the real video pipeline. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val fb = graft.multimodal.Multimodal.FrameBytes
    val st = graft.multimodal.Multimodal.FrameStride
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        ceil(length(col("text")).cast("double") / fb).cast("int").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), greatest(col("n_frames"), lit(1)) - 1,
          lit(st))).as("frame_idx"),
        col("text"))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("frame_idx"),
        md5(expr(s"substring(text, frame_idx * $fb + 1, $fb)")).as("frame_md5"))
  }

  val frameSampleSql: String = {
    val fb = graft.multimodal.Multimodal.FrameBytes
    val st = graft.multimodal.Multimodal.FrameStride
    s"""WITH f AS (SELECT doc_id, text, CAST(ceil(len(text) / $fb.0) AS BIGINT) AS n_frames FROM documents),
       |e AS (SELECT doc_id, n_frames, text, unnest(range(0, greatest(n_frames, 1), $st)) AS i FROM f)
       |SELECT doc_id, n_frames, CAST(i AS INT) AS frame_idx,
       |  md5(substring(text, CAST(i * $fb + 1 AS INT), $fb)) AS frame_md5
       |FROM e""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------ Gopher rule filter

  /** The Gopher/MassiveText repetition-free rule stopword set (Rae et
    * al. 2021 §A.1.1 use 8 common English words; widened here with
    * 'a'/'of'-class members so the rule discriminates on the synthetic
    * corpus's small vocabulary). */
  private val gopherStop =
    Seq("the", "a", "and", "of", "to", "in", "is", "be", "that", "have")

  val GopherMinWords = 50
  val GopherMaxWords = 100000

  /** q124 — the Gopher quality RULE SUITE (Rae et al. 2021, §A.1.1),
    * the document-shape complement of q23's ratio scoring: per doc,
    * one boolean per rule (emitted as BIGINT 0/1 — the repo's
    * cross-engine type convention) plus the conjunction:
    *
    *   r_nwords  — word count in [[[GopherMinWords]], [[GopherMaxWords]]]
    *   r_wordlen — mean word length in [3, 10] characters, compared in
    *               integer space (3·n ≤ Σlen ≤ 10·n — FLOAT RULE)
    *   r_stop    — ≥ 2 DISTINCT stopwords present
    *   r_alpha   — ≥ 80% of words contain a letter (5·n_alpha ≥ 4·n)
    *
    * Plan shape: one positional explode (tokenize once per doc — the
    * 4-HOF alternative re-runs the split per collapsed lambda), ONE
    * doc_id-keyed hash aggregate computes every rule's integer inputs
    * map-side-partial, rules are plain integer comparisons on the
    * aggregate output. explode_outer keeps empty docs (they fail
    * r_nwords rather than vanish). */
  def gopherRules(s: SparkSession, d: String): DataFrame =
    gopherRulesFrom(Tables.documents(s, d))

  /** [[gopherRules]] over an explicit (doc_id, text) frame — the unit
    * GopherSpec drives with rule-boundary docs. */
  def gopherRulesFrom(documents: DataFrame): DataFrame = {
    documents
      .select(col("doc_id"),
        explode_outer(expr("filter(split(text, '\\\\s+'), x -> x <> '')")).as("tok"))
      .groupBy("doc_id")
      .agg(
        count(col("tok")).as("n_words"),
        coalesce(sum(length(col("tok"))), lit(0L)).as("sum_len"),
        countDistinct(when(col("tok").isInCollection(gopherStop), col("tok"))).as("n_stop"),
        count(when(col("tok").rlike("[a-z]"), 1)).as("n_alpha"))
      .select(
        col("doc_id"), col("n_words"),
        col("n_words").between(GopherMinWords, GopherMaxWords).cast("long").as("r_nwords"),
        (col("sum_len") >= col("n_words") * 3 &&
          col("sum_len") <= col("n_words") * 10).cast("long").as("r_wordlen"),
        (col("n_stop") >= 2).cast("long").as("r_stop"),
        (col("n_alpha") * 5 >= col("n_words") * 4).cast("long").as("r_alpha"))
      .withColumn("keep",
        (col("r_nwords") === 1 && col("r_wordlen") === 1 &&
          col("r_stop") === 1 && col("r_alpha") === 1).cast("long"))
  }

  val gopherRulesSql: String = {
    val stops = gopherStop.map(w => s"'$w'").mkString(", ")
    s"""WITH ws AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w FROM documents),
       |s AS (SELECT doc_id, len(w) AS n_words,
       |  coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS sum_len,
       |  len(list_distinct(list_filter(w, x -> x IN ($stops)))) AS n_stop,
       |  len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha FROM ws)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |  CAST(n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS BIGINT) AS r_nwords,
       |  CAST(sum_len >= n_words * 3 AND sum_len <= n_words * 10 AS BIGINT) AS r_wordlen,
       |  CAST(n_stop >= 2 AS BIGINT) AS r_stop,
       |  CAST(n_alpha * 5 >= n_words * 4 AS BIGINT) AS r_alpha,
       |  CAST(n_words BETWEEN $GopherMinWords AND $GopherMaxWords
       |    AND sum_len >= n_words * 3 AND sum_len <= n_words * 10
       |    AND n_stop >= 2 AND n_alpha * 5 >= n_words * 4 AS BIGINT) AS keep
       |FROM s""".stripMargin.replace("\n", " ")
  }

  // ----------------------------- term-proximity search (min gap)

  /** q227's fixed two-term query (both in the generator's shared
    * vocabulary so the search is non-vacuous at every SF). */
  val ProxTermA = "table"
  val ProxTermB = "query"
  val ProxTopN = 25

  /** q227 — TERM-PROXIMITY SEARCH: the top-[[ProxTopN]] documents
    * containing BOTH query terms, ranked by the minimum token
    * distance between any occurrence pair (then by fewer tokens,
    * then doc_id). Proximity is the retrieval signal BM25 (q82)
    * throws away — bag-of-words scores "new york" and "york … new"
    * identically; phrase/near operators in every production engine
    * rank by exactly this min-gap.
    *
    * The min over occurrence PAIRS is computed without enumerating
    * pairs (the merged-stream identity): walk the doc's term
    * positions in order, and for each occurrence of one term the
    * only candidate partner that can realize the minimum is the
    * LATEST preceding occurrence of the other term — two running
    * maxima over one (doc_id, pos) window replace the quadratic
    * cross product (the q104 adjacent-candidates discipline).
    *
    * Scale shape: the position stream is filtered to the two terms
    * right after the explode (candidate-grain, not token-grain, past
    * the first projection); one (doc_id) window + one (doc_id)
    * aggregate share the exchange; the top-N is TakeOrdered. All
    * integers. */
  def proximitySearch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hits = Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(expr("filter(split(text, ' '), x -> x <> '')"))
          .as(Seq("pos", "w")))
      .filter(col("w") === ProxTermA || col("w") === ProxTermB)
    hits
      .withColumn("last_a", max(when(col("w") === ProxTermA, col("pos"))).over(w))
      .withColumn("last_b", max(when(col("w") === ProxTermB, col("pos"))).over(w))
      .select(col("doc_id"),
        when(col("w") === ProxTermA && col("last_b").isNotNull,
          col("pos") - col("last_b"))
          .when(col("w") === ProxTermB && col("last_a").isNotNull,
            col("pos") - col("last_a")).as("gap"))
      .groupBy("doc_id")
      .agg(min("gap").as("min_gap"), count(lit(1)).as("n_occ"))
      .filter(col("min_gap").isNotNull)
      .select(col("doc_id"), col("min_gap").cast("long").as("min_gap"),
        col("n_occ"))
      .orderBy(col("min_gap"), col("n_occ").desc, col("doc_id"))
      .limit(ProxTopN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("min_gap"), col("n_occ").desc, col("doc_id"))))
  }

  // Spark's posexplode is 0-based, DuckDB's generate_subscripts
  // 1-based — gaps are position DIFFERENCES, so the offset cancels.
  val proximitySearchSql: String =
    s"""WITH ex AS (SELECT doc_id, unnest(ws) AS w,
       |  CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |        FROM documents)),
       |tok AS (SELECT doc_id, w, pos FROM ex
       |  WHERE w IN ('$ProxTermA', '$ProxTermB')),
       |r AS (SELECT doc_id, w, pos,
       |  max(CASE WHEN w = '$ProxTermA' THEN pos END)
       |    OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_a,
       |  max(CASE WHEN w = '$ProxTermB' THEN pos END)
       |    OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_b
       |  FROM tok),
       |g AS (SELECT doc_id,
       |  CASE WHEN w = '$ProxTermA' AND last_b IS NOT NULL THEN pos - last_b
       |       WHEN w = '$ProxTermB' AND last_a IS NOT NULL THEN pos - last_a
       |  END AS gap FROM r),
       |m AS (SELECT doc_id, CAST(min(gap) AS BIGINT) AS min_gap,
       |  count(*) AS n_occ FROM g GROUP BY 1 HAVING min(gap) IS NOT NULL)
       |SELECT doc_id, min_gap, n_occ, CAST(row_number() OVER
       |  (ORDER BY min_gap, n_occ DESC, doc_id) AS INT) AS rank
       |FROM m ORDER BY min_gap, n_occ DESC, doc_id LIMIT $ProxTopN"""
      .stripMargin.replace("\n", " ")

  // ---------------------------------------- source leave-one-out influence

  /** q281 — SOURCE LEAVE-ONE-OUT INFLUENCE: for every ingest feed, what
    * the corpus-level mean token count becomes if that feed is removed
    * — the cheapest member of the data-valuation family (the
    * Shapley-style "what does this source contribute" question at
    * coalition size N−1). The trick that makes it a one-pass op: the
    * LOO mean is ALGEBRA over the per-source sufficient statistics —
    * (T − T_s) / (D − D_s) — so removal is never materialized; q107
    * tells you which feed is low-quality by its own rate, this tells
    * you whether dropping it would actually move the corpus metric
    * (a tiny terrible feed moves nothing; a huge mediocre one does).
    *
    * FLOAT RULE: means are half-up ×100 integer fixed point; delta is
    * a difference of the quantized means. Scale shape: one conditional
    * aggregate over the scan into a |sources|-bounded table, then pure
    * broadcast algebra — the corpus is read once. */
  def sourceInfluence(s: SparkSession, d: String): DataFrame = {
    val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
    val per = Tables.documents(s, d)
      .select(col("source"), nTok.as("nt"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tok_sum"))
      .localCheckpoint(true)
    val tot = per.agg(sum("n_docs").as("td"), sum("tok_sum").as("tt"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("tok_sum"),
        expr("(tt * 100 + td div 2) div td").as("corpus_mean_x100"),
        expr("((tt - tok_sum) * 100 + greatest(td - n_docs, 1) div 2) " +
          "div greatest(td - n_docs, 1)").as("loo_mean_x100"))
      .withColumn("delta_x100", col("loo_mean_x100") - col("corpus_mean_x100"))
  }

  val sourceInfluenceSql: String =
    """WITH per AS (SELECT source, count(*) AS n_docs,
      |  sum(len(string_split_regex(trim(text), '\s+'))) AS tok_sum
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT sum(n_docs) AS td, sum(tok_sum) AS tt FROM per)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(tok_sum AS BIGINT) AS tok_sum,
      |  CAST((tt * 100 + td // 2) // td AS BIGINT) AS corpus_mean_x100,
      |  CAST(((tt - tok_sum) * 100 + greatest(td - n_docs, 1) // 2)
      |    // greatest(td - n_docs, 1) AS BIGINT) AS loo_mean_x100,
      |  CAST(((tt - tok_sum) * 100 + greatest(td - n_docs, 1) // 2)
      |    // greatest(td - n_docs, 1)
      |    - (tt * 100 + td // 2) // td AS BIGINT) AS delta_x100
      |FROM per, tot""".stripMargin.replace("\n", " ")
}
