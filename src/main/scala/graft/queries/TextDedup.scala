package graft.queries

import graft.{QuerySpec, Tables}
import graft.functions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` table: text
  * analysis (language-ID, quality scoring, token counting, fingerprinting)
  * and the deduplication family (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash). All are pure `org.apache.spark.sql.functions` plans — higher-
  * order array functions instead of UDFs, so everything stays inside
  * whole-stage codegen and scales by partitioning on doc_id / shingle.
  *
  * Cross-engine determinism notes:
  *  - counts are integers; ratios are double divisions of identical
  *    integers — bitwise equal in Spark and DuckDB;
  *  - hash-derived values use md5 hex (lowercase in both engines);
  *  - fold-based hashes use sequential `aggregate` (Spark) /
  *    `list_reduce` (DuckDB); with a zero init on the Spark side the fold
  *    orders coincide exactly.
  */
object TextDedup {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** NULL instead of a zero divisor: both engines then yield NULL ratios
    * for empty/whitespace-only docs (a raw /0 would throw under Spark's
    * ANSI mode and produce inf in DuckDB). */
  private def nonZero(c: Column): Column = when(c =!= 0, c)

  /** THE normalized content fingerprint (lowercase → strip non-alnum →
    * trim → md5), shared by every exact-dedup pass so they can never
    * diverge; [[normFingerprintSql]] is its DuckDB twin. */
  private[queries] def normFingerprint: Column =
    md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")))
  private[queries] val normFingerprintSql =
    "md5(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))"

  // -------------------------------------------------------------------
  // Text analysis
  // -------------------------------------------------------------------

  /** Token counting + quality scoring: whitespace tokens, word-ish tokens
    * (BPE-style regex), punctuation count, alpha ratio, stopword ratio,
    * mean token length. The quality signals a 100 TB curation pipeline
    * filters on. */
  val textStats = QuerySpec(
    "q_text_stats",
    """SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_chars,
              CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens_ws,
              CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens_bpe,
              CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
              CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) * 1.0
                / nullif(CAST(length(text) AS BIGINT), 0) AS alpha_ratio,
              CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS BIGINT) * 1.0
                / nullif(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 0) AS stopword_ratio
       FROM documents""") {
    (s, d) =>
      val nTokWs = size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
      docs(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        nTokWs.as("n_tokens_ws"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"))
          .cast("long").as("n_tokens_bpe"),
        size(expr("regexp_extract_all(text, '[.!?,;:]', 0)")).cast("long").as("n_punct"),
        (size(expr("regexp_extract_all(text, '[A-Za-z]', 0)")).cast("long") * lit(1.0)
          / nonZero(length(col("text")).cast("long"))).as("alpha_ratio"),
        (size(expr("regexp_extract_all(lower(text), '\\\\b(the|a|of|and|to|in|is)\\\\b', 0)"))
          .cast("long") * lit(1.0) / nonZero(nTokWs)).as("stopword_ratio"))
  }

  /** Stopword-marker tables of [[langId]], factored object-level so the
    * eval twin [[langIdEval]] reuses the identical predictor on both
    * engines (any drift between the two copies would masquerade as a
    * model-quality change in the eval numbers). */
  private[queries] val langIdMarkers = Seq(
    "en" -> "the|a|and|of|to",
    "de" -> "der|die|das|und|ist|nicht",
    "fr" -> "le|la|les|et|est|que",
    "es" -> "el|los|las|es|y|que",
    "zh" -> "de|shi|le|zai|he")
  private[queries] val langIdLangs = langIdMarkers.map(_._1)

  /** DuckDB SELECT producing (doc_id, lang, s_en..s_zh, predicted). */
  private[queries] val langIdPredSql = {
    def scoreSql(pat: String) = s"CAST(len(regexp_extract_all(lower(text), '\\b($pat)\\b')) AS BIGINT)"
    val scoreCols = langIdMarkers.map { case (l, p) => s"${scoreSql(p)} AS s_$l" }.mkString(",\n              ")
    // argmax with priority en > de > fr > es > zh on ties
    val caseSql = langIdLangs.init.zipWithIndex.map { case (l, i) =>
      val rest = langIdLangs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }.mkString(" ") + s" ELSE '${langIdLangs.last}'"
    s"""SELECT doc_id, lang, s_en, s_de, s_fr, s_es, s_zh,
               CASE $caseSql END AS predicted
        FROM (SELECT doc_id, lang,
                $scoreCols
              FROM documents) sc"""
  }

  /** Spark twin of [[langIdPredSql]] over any (doc_id, lang, text) frame
    * — factored from the sf-dir form so specs can feed a crafted corpus. */
  private[queries] def langIdScoredOf(in: DataFrame): DataFrame = {
    val scored = langIdMarkers.foldLeft(in) { case (df, (l, p)) =>
      df.withColumn(s"s_$l",
        size(expr(s"regexp_extract_all(lower(text), '\\\\b($p)\\\\b', 0)")).cast("long"))
    }
    val pred = langIdLangs.init.zipWithIndex.foldLeft(when(lit(false), "")) { case (c, (l, i)) =>
      val rest = langIdLangs.drop(i + 1).map(r => col(s"s_$l") >= col(s"s_$r")).reduce(_ && _)
      c.when(rest, l)
    }.otherwise(langIdLangs.last)
    scored.select(
      col("doc_id") +: col("lang") +: langIdLangs.map(l => col(s"s_$l")) :+ pred.as("predicted"): _*)
  }

  private[queries] def langIdScored(s: SparkSession, d: String): DataFrame =
    langIdScoredOf(docs(s, d))

  /** Confusion rollup + integer-ppm metrics over any frame carrying
    * (lang, predicted) — the Spark side of [[langIdEval]]. */
  private[queries] def langIdConfusion(scored: DataFrame): DataFrame = {
    val c = scored.groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
    val truth = c.groupBy("lang").agg(
      sum("n").cast("long").as("support"),
      sum(when(col("predicted") === col("lang"), col("n")).otherwise(0L))
        .cast("long").as("tp"))
    val pr = c.groupBy(col("predicted").as("plang"))
      .agg(sum("n").cast("long").as("predn"))
    val predn0 = coalesce(col("predn"), lit(0L))
    truth.join(broadcast(pr), col("lang") === col("plang"), "left")
      .select(col("lang"), col("support"), col("tp"),
        (predn0 - col("tp")).cast("long").as("fp"),
        (col("support") - col("tp")).cast("long").as("fn"),
        when(predn0 === 0L, 0L)
          .otherwise(expr("tp * 1000000 div predn"))
          .cast("long").as("precision_ppm"),
        expr("tp * 1000000 div support").cast("long").as("recall_ppm"),
        expr("2 * tp * 1000000 div (support + coalesce(predn, 0))")
          .cast("long").as("f1_ppm"))
  }

  /** Language-ID by stopword-marker scoring: count per-language marker
    * words, argmax with a fixed priority order on ties. A real pipeline
    * would use character n-gram profiles; the operator shape (parallel
    * per-language scores → deterministic argmax) is identical. */
  val langId = QuerySpec("q_text_langid", langIdPredSql)(langIdScored)

  /** Classifier evaluation over the language-ID predictor: per-label
    * confusion counts (tp/fp/fn vs the corpus' `lang` ground truth) and
    * integer-ppm precision / recall / F1 — the quality gate any learned
    * or rule-based curation classifier ships behind (2·tp/(2·tp+fp+fn)
    * ≡ 2·tp/(support+predicted_n), kept in that closed form so the ppm
    * division happens exactly once per label in both engines). Scale
    * shape: the corpus-sized work is the predictor scan plus ONE
    * map-side-combinable groupBy(lang, predicted) down to ≤|L|² rows;
    * every metric after runs on that metadata-sized confusion table. */
  val langIdEval = QuerySpec(
    "q_langid_eval",
    s"""WITH p AS ($langIdPredSql),
        c AS (SELECT lang, predicted, count(*) AS n FROM p GROUP BY 1, 2),
        truth AS (SELECT lang,
                         CAST(sum(n) AS BIGINT) AS support,
                         CAST(sum(CASE WHEN predicted = lang THEN n ELSE 0 END) AS BIGINT) AS tp
                  FROM c GROUP BY 1),
        pr AS (SELECT predicted AS lang, CAST(sum(n) AS BIGINT) AS predn FROM c GROUP BY 1)
        SELECT t.lang, t.support, t.tp,
               CAST(coalesce(pr.predn, 0) - t.tp AS BIGINT) AS fp,
               CAST(t.support - t.tp AS BIGINT) AS fn,
               CAST(CASE WHEN coalesce(pr.predn, 0) = 0 THEN 0
                         ELSE t.tp * 1000000 // pr.predn END AS BIGINT) AS precision_ppm,
               CAST(t.tp * 1000000 // t.support AS BIGINT) AS recall_ppm,
               CAST(2 * t.tp * 1000000 // (t.support + coalesce(pr.predn, 0)) AS BIGINT) AS f1_ppm
        FROM truth t LEFT JOIN pr ON pr.lang = t.lang""") {
    (s, d) => langIdConfusion(langIdScored(s, d))
  }

  /** Character-bigram profile per language label: the building block real
    * language-ID models rank on. Top-3 bigrams per lang by (count desc,
    * bigram) — explode via sequence (guarded), one shuffle to (lang,
    * bigram), WindowGroupLimit-bounded top-k. */
  val ngramProfile = QuerySpec(
    "q_text_ngram_profile",
    """WITH bg AS (
         SELECT lang, substr(text, i, 2) AS bigram
         FROM documents, UNNEST(generate_series(1, greatest(length(text) - 1, 0))) AS u(i)),
       cnt AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
       SELECT lang, bigram, n, CAST(rnk AS BIGINT) AS rnk
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                          ORDER BY n DESC, bigram) AS rnk
             FROM cnt) t
       WHERE rnk <= 3""") {
    (s, d) =>
      // split-to-chars + O(1) array indexing: the per-position
      // substr(text, i, 2) form rescans the string per bigram (O(doc²))
      val bg = graft.ops.Scale.fanOutScan(
          docs(s, d).select("doc_id", "lang", "text"), col("doc_id"))
        .withColumn("cs", split(col("text"), ""))
        .select(col("lang"), explode(expr(
          """CASE WHEN length(text) >= 2
             THEN transform(sequence(1, size(cs) - 1), i -> concat(cs[i - 1], cs[i]))
             ELSE array() END""")).as("bigram"))
      bg.groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lang")
            .orderBy(col("n").desc, col("bigram")))
          .cast("long"))
        .filter(col("rnk") <= 3)
        .select("lang", "bigram", "n", "rnk")
  }

  /** Document fingerprint: 31-polynomial rolling hash of the byte stream,
    * mod 1e9+7 — a content-defined fingerprint computed as a sequential
    * fold (Spark `aggregate` HOF; no UDF, stays in codegen). */
  val fingerprint = QuerySpec(
    "q_text_fingerprint",
    """SELECT doc_id,
              CASE WHEN length(text) = 0 THEN 0
                   ELSE list_reduce(
                          list_transform(generate_series(1, length(text)),
                                         i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)),
                          (acc, c) -> (acc * 31 + c) % 1000000007)
              END AS fingerprint
       FROM documents""") {
    (s, d) => {
      // custom codegen expression (graft.functions.RollingHash31) — the
      // aggregate() HOF form is semantically identical but interpreted
      VectorExpressions.register(s)
      docs(s, d).select(
        col("doc_id"),
        VectorExpressions.rolling_hash31(col("text")).as("fingerprint"))
    }
  }

  // -------------------------------------------------------------------
  // Deduplication family
  // -------------------------------------------------------------------

  /** Exact dedup: normalize (lowercase, strip non-alnum) → hash-groupBy →
    * keep min doc_id. One shuffle on the fingerprint; at 100 TB this is the
    * standard hash-partitioned exact-dedup pass. */
  val dedupExact = QuerySpec(
    "q_dedup_exact",
    s"""SELECT $normFingerprintSql AS fingerprint,
               count(*) AS n_dups, min(doc_id) AS keep_id
        FROM documents GROUP BY 1""") {
    (s, d) =>
      docs(s, d)
        .groupBy(normFingerprint.as("fingerprint"))
        .agg(count(lit(1)).as("n_dups"), min("doc_id").as("keep_id"))
  }

  /** Max document frequency a shingle may carry into pair generation.
    * A shingle shared by df documents contributes O(df²) pairs on ONE
    * shuffle key in the self-join below — natural-text boilerplate
    * ("all rights reserved…") reaches df in the millions at corpus scale,
    * so uncapped pair generation is an executor-killing skew bomb. Hot
    * shingles carry no dedup signal anyway (they match everything), so the
    * standard treatment is stopword-style removal before pairing/hashing.
    * 5 is tuned to the synthetic corpus (3-gram df tops out at 7, so the
    * cap is genuinely exercised by the oracle at test scale). */
  private[graft] val MaxShingleDf = 5

  /** A band bucket with n members contributes O(n²) candidate pairs on one
    * shuffle key — the LSH analogue of the hot-shingle skew bomb (used by
    * the simhash hamming bands, the minhash corpus bands, and their
    * oracles — defined HERE, before every interpolating val, because a
    * Scala object initializes vals top-down and a forward reference
    * silently reads 0). Measured on this corpus at sf0.1: uncapped
    * byte-banding produced 955k pairs from 5000 docs (the shared small
    * vocabulary makes fingerprints cluster). Buckets above the cap carry
    * no *near*-dup signal — a degenerate identical-fingerprint cluster is
    * the exact-dedup family's job (groupBy is linear) — so they are
    * dropped from PAIR generation, same treatment as [[MaxShingleDf]]. */
  private[graft] val MaxBandBucket = 25

  /** The identical document planted across half the corpus by the
    * adversarial-bucket gate (plain words, no quotes — it is embedded in
    * the DuckDB oracle as a SQL string literal). */
  private[graft] val AdversarialText =
    "the quick brown fox jumps over the lazy dog again and again"

  /** Word-shingle column: distinct k-word shingles per doc, document-
    * frequency-capped. Guarded so short docs yield an empty array (Spark
    * `sequence(1, n)` with n<1 would otherwise generate a DESCENDING
    * sequence).
    *
    * Scale shape of the cap: `groupBy(shingle).count` partial-aggregates
    * map-side (a hot key ships pre-aggregated counts, never rows), the
    * surviving hot set is tiny (boilerplate shingles), and the broadcast
    * ANTI-join drops hot rows map-side — the capped shingle stream is
    * produced without any shuffle of the exploded rows. Exposed
    * private[graft] so PlanSpec can prove the hot-shingle guard directly
    * (df bound + broadcast anti-join plan shape). */
  private[graft] def shingled(s: SparkSession, d: String, k: Int): DataFrame =
    memo.getOrElseUpdate(s, (d, s"shingled$k"))(shingledFresh(s, d, k).cache())

  /** Session-scoped shared materializations of the dedup intermediates
    * (df-capped shingle streams, MinHash signatures, LSH candidates) —
    * the production topology: a corpus snapshot's shingles/signatures are
    * computed ONCE and every consumer (Jaccard, LSH, the estimate and
    * recall diagnostics, verification, components, the overlap audit)
    * reads the same materialized table; `cache()` is the in-session
    * stand-in for that write. Plan-shape tests use [[shingledFresh]] (the
    * builder), since the memoized form plans as an InMemoryTableScan. */
  private val memo = new graft.ops.SessionMemo[(String, String), DataFrame]

  /** The UNcapped distinct (doc_id, shingle) stream — the common front of
    * [[shingledFresh]] (which df-caps it) and [[textNovelty]] (which must
    * see every gram: the capped-away hot shingles are exactly the
    * non-novel evidence). */
  private[graft] def shingledRaw(s: SparkSession, d: String, k: Int): DataFrame =
    // split-amplify the single-row-group scan BEFORE the shingle kernel:
    // split+array_distinct+transform+explode is the CPU floor of the whole
    // dedup family and otherwise runs one-task-per-file (see fanOutScan)
    graft.ops.Scale.fanOutScan(docs(s, d).select("doc_id", "text"), col("doc_id"))
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN size(ws) >= $k
            THEN array_distinct(transform(sequence(1, size(ws) - ${k - 1}),
                                          i -> concat_ws(' ', slice(ws, i, $k))))
            ELSE array() END""")).as("shingle"))

  private[graft] def shingledFresh(s: SparkSession, d: String, k: Int): DataFrame = {
    val raw = shingledRaw(s, d, k)
    val hot = raw.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxShingleDf)
      .select("shingle")
    raw.join(broadcast(hot), Seq("shingle"), "left_anti")
      .select("doc_id", "shingle")
  }

  private[queries] def shingleSql(k: Int): String =
    s"""w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
        sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+${k - 1}], ' ') AS shingle
                FROM w, UNNEST(generate_series(1, greatest(len(ws) - ${k - 1}, 0))) AS u(i)),
        hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > $MaxShingleDf),
        sh AS (SELECT doc_id, shingle FROM sh0 b
               WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.shingle = b.shingle))"""

  /** Near-dup by n-gram Jaccard: 5-word shingles, shingle-join to count
    * intersections, integer-only threshold test (11·|∩| ≥ |A|+|B| ⇔
    * J ≥ 0.1). The shingle join is the scale path: shuffle on shingle,
    * skew-safe because [[shingled]] df-caps the stream first — no shuffle
    * key can fan out more than MaxShingleDf² pairs.
    *
    * LIFETIME: the returned frame is backed by a LEASED localCheckpoint
    * (see below) — its blocks die at the next `Caches.drain()` and the
    * truncated lineage cannot be recomputed. Its four indirect consumers
    * (components, keep, leakage-safe split, and the pair query itself)
    * all read it within their own query action, which is the contract:
    * do NOT hold the result across a drain. */
  val dedupJaccard = QuerySpec(
    "q_dedup_jaccard",
    s"""WITH ${shingleSql(5)},
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT pr.a_id, pr.b_id, pr.inter, sa.n AS n_a, sb.n AS n_b
        FROM pr JOIN sz sa ON sa.doc_id = pr.a_id
                JOIN sz sb ON sb.doc_id = pr.b_id
        WHERE 11 * pr.inter >= sa.n + sb.n""") {
    (s, d) =>
      val sh = shingled(s, d, 5)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = sh.toDF("a_id", "shingle")
      val b = sh.toDF("b_id", "shingle")
      val pr = a.join(b, "shingle")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("inter"))
      // tiny result: materialize eagerly so downstream consumers
      // (components/keep/leakage-safe split) reuse rows, not lineage.
      // The checkpoint blocks are LEASED: Dataset.unpersist can't reach
      // them, so without the lease each of this fn's four call sites
      // stranded a block set for the session (r8 self-review find)
      val (result, rdds) = localCheckpointTracked(
        pr.join(sz.toDF("a_id", "n_a"), "a_id")
          .join(sz.toDF("b_id", "n_b"), "b_id")
          .filter(lit(11) * col("inter") >= col("n_a") + col("n_b"))
          .select("a_id", "b_id", "inter", "n_a", "n_b"))
      rdds.foreach(graft.ops.Caches.leaseRdd)
      result
  }

  /** Span length (tokens) for substring-level dedup. 8 is long enough that
    * chance collisions are negligible (vocab^8 keyspace) but short enough
    * to catch the copied spans the near-dup corpus actually contains
    * (~1000 cross-doc duplicated 8-grams at sf0.01 — measured, so the
    * operator is non-vacuous at test scale). */
  private val SpanK = 8

  /** Substring-level dedup, the distributed shape of ExactSubstr (Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §4.1): find token spans of length ≥ [[SpanK]] that
    * appear in more than one document and STRIP them, keeping the rest of
    * the doc — document-level dedup misses boilerplate embedded in
    * otherwise-unique pages, which is exactly what this catches.
    *
    * The suffix-array of the paper is replaced by positional k-gram
    * hashing, which Spark distributes linearly: (1) every token position
    * emits one md5'd k-gram — shuffle carries 32 B hashes, never text;
    * (2) grams in ≥2 distinct docs are found with one partial-aggregated
    * groupBy (hot boilerplate grams ship pre-aggregated counts, no row
    * fan-out); (3) marking is a semi-join of occurrences against the dup
    * grams — output is linear in occurrences, so unlike the pair joins in
    * the Jaccard family there is NO quadratic key and NO df-cap needed;
    * (4) the per-doc duplicated-position set masks tokens via an indexed
    * array filter (codegen'd, no UDF). Emits per doc: token count,
    * duplicated-token count, dup ratio, and the cleaned text. */
  val dedupSubstring = QuerySpec(
    "q_dedup_substring",
    s"""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
        tt AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_tokens FROM w),
        g AS (SELECT doc_id, pq AS p, substr(md5(array_to_string(ws[pq:pq+${SpanK - 1}], ' ')), 1, 16) AS gram_h
              FROM tt, UNNEST(generate_series(1, greatest(len(ws) - ${SpanK - 1}, 0))) AS u(pq)),
        dg AS (SELECT gram_h FROM g GROUP BY gram_h HAVING COUNT(DISTINCT doc_id) >= 2),
        dp AS (SELECT DISTINCT g.doc_id, qq AS pos
               FROM g JOIN dg USING (gram_h), UNNEST(generate_series(g.p, g.p + ${SpanK - 1})) AS v(qq)),
        ds AS (SELECT doc_id, list_sort(list(pos)) AS dup_pos FROM dp GROUP BY doc_id)
        SELECT tt.doc_id, tt.n_tokens,
               CAST(COALESCE(len(ds.dup_pos), 0) AS BIGINT) AS n_dup_tokens,
               CAST(COALESCE(len(ds.dup_pos), 0) AS BIGINT) * 1.0
                 / nullif(tt.n_tokens, 0) AS dup_ratio,
               COALESCE(array_to_string(list_filter(ws, (tok_zz, ix_zz) ->
                 NOT list_contains(COALESCE(ds.dup_pos, []), ix_zz)), ' '), '') AS clean_text
        FROM tt LEFT JOIN ds ON ds.doc_id = tt.doc_id""") {
    (s, d) =>
      val toks = graft.ops.Scale.fanOutScan(docs(s, d).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("n_tokens", size(col("ws")).cast("long"))
      val grams = toks
        .select(col("doc_id"), col("ws"),
          explode(expr(
            s"""CASE WHEN size(ws) >= $SpanK
                THEN sequence(1, size(ws) - ${SpanK - 1})
                ELSE CAST(array() AS array<int>) END""")).as("p"))
        // 64-bit truncation halves the dominant shuffle (one key per token
        // position) while keeping collisions negligible (#positions ≪ 2^32)
        .withColumn("gram_h", substring(md5(expr(s"concat_ws(' ', slice(ws, p, $SpanK))")), 1, 16))
        .select("doc_id", "p", "gram_h")
      val dupGrams = grams.groupBy("gram_h")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2)
        .select("gram_h")
      val dupPos = grams.join(dupGrams, Seq("gram_h"))
        .select(col("doc_id"),
          explode(expr(s"sequence(p, p + ${SpanK - 1})")).as("pos"))
        .distinct()
      val dupSet = dupPos.groupBy("doc_id")
        .agg(sort_array(collect_set(col("pos"))).as("dup_pos"))
      toks.join(dupSet, Seq("doc_id"), "left")
        .withColumn("dp", coalesce(col("dup_pos"), expr("CAST(array() AS array<int>)")))
        .select(
          col("doc_id"),
          col("n_tokens"),
          size(col("dp")).cast("long").as("n_dup_tokens"),
          (size(col("dp")).cast("long") * lit(1.0) / nonZero(col("n_tokens"))).as("dup_ratio"),
          // Spark's filter-lambda index is 0-based; positions are 1-based
          // (DuckDB's list_filter index is 1-based, so the oracle compares
          // ix directly)
          expr("concat_ws(' ', filter(ws, (tok_zz, ix_zz) -> NOT array_contains(dp, ix_zz + 1)))")
            .as("clean_text"))
  }

  private val MinhashK = 8   // signature length
  private val BandSize = 2   // rows per band → 4 bands

  /** Shared MinHash plumbing (used by both the LSH candidate query and the
    * estimation diagnostic so the two can never drift): signature
    * aggregation, band fan-out, and the distinct candidate-pair join — in
    * both SQL-fragment and DataFrame form. */
  private val minhashSigSql = (0 until MinhashK)
    .map(i => s"min(md5(shingle || '#$i')) AS h$i").mkString(", ")

  private def minhashBandsSqlFor(src: String): String =
    (0 until MinhashK / BandSize).map { b =>
      val cols = (0 until BandSize).map(r => s"h${b * BandSize + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band_id, $cols AS band_val FROM $src"
    }.mkString(" UNION ALL ")

  private val minhashBandsSql = minhashBandsSqlFor("sig")

  private[queries] val minhashCandSql =
    s"""sig AS (SELECT doc_id, $minhashSigSql FROM sh GROUP BY doc_id),
        bands AS ($minhashBandsSql),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                 FROM bands a JOIN bands b
                   ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id)"""

  private[queries] def minhashSig(sh: DataFrame): DataFrame = {
    // r13: the 8 × min(md5(concat(shingle, '#i'))) aggregate inputs each
    // paid a fresh commons-codec digest instance plus a concat allocation
    // per exploded shingle row; md5_seeded8 computes all eight digests in
    // one kernel call (same lowercase-hex bytes — TextDedupSpec's
    // bands-vs-aggregate pin and the unchanged oracles gate equality).
    graft.functions.VectorExpressions.register(sh.sparkSession)
    val withHs = sh.withColumn("hs8",
      graft.functions.VectorExpressions.md5_seeded8(col("shingle")))
    val hashCols = (0 until MinhashK).map(i =>
      min(col("hs8").getItem(i)).as(s"h$i"))
    withHs.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** Band keys of an aggregate signature table — shared by
    * [[minhashCandidates]] and the TextDedupSpec equality pin against the
    * per-row scalar derivation [[minhashBandsFor]]. */
  private[graft] def minhashBands(sig: DataFrame): DataFrame =
    sig.select(col("doc_id"), explode(array(
      (0 until MinhashK / BandSize).map { b =>
        struct(
          lit(b).as("band_id"),
          concat((0 until BandSize).map(r => col(s"h${b * BandSize + r}")): _*).as("band_val"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_val"))

  private[queries] def minhashCandidates(sig: DataFrame): DataFrame = {
    val bands = minhashBands(sig)
    bands.toDF("a_id", "band_id", "band_val")
      .join(bands.toDF("b_id", "band_id", "band_val"), Seq("band_id", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()
  }

  private[queries] def minhashSigShared(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, (d, "sig3"))(minhashSig(shingled(s, d, 3)).cache())

  /** Per-ROW MinHash band table over a (doc_id, text, …) frame — a pure
    * scalar projection (shingle array → k md5 mins → band concats →
    * explode), NO aggregation, so the same code runs unchanged on a
    * STREAMING DataFrame: the builder behind
    * [[graft.streaming.StreamOps.nearDupCandidates]]. Bitwise-equal to
    * the aggregate form (`minhashSig` over the exploded shingle stream)
    * because min distributes: `array_min` over a doc's shingle-hash array
    * IS the min-aggregate over its exploded rows — TextDedupSpec pins the
    * equality on real docs. Uses the UNCAPPED shingles (the df-cap is a
    * corpus-level PAIRING guard; a single row sees only its own doc);
    * at scale, band skew is bounded bucket-side instead — see
    * [[minhashCorpusBands]]. Docs with <k words carry no shingle and
    * drop, as in the batch path. Non-text columns (e.g. `ts`) pass
    * through for downstream watermarks. */
  def minhashBandsFor(docs: DataFrame, k: Int = 3): DataFrame = {
    // r13: the composed built-in chain (split → shingle transform →
    // array_distinct → 8 × array_min(transform(md5)) → band concats) ran
    // INTERPRETED (higher-order functions have no codegen) with a fresh
    // commons-codec digest per md5 call, and its `size(sh) > 0` filter
    // re-evaluated the whole shingle pipeline a second time below the
    // exchange (guide §4: expression duplicated across pushed filter and
    // projection). The fused [[graft.functions.VectorKernels.minhashBands8]]
    // kernel computes the identical four band values in one byte-level
    // pass; <k-word rows return an empty array, so posexplode subsumes
    // the filter. Bitwise equality vs the aggregate derivation stays
    // pinned by TextDedupSpec; the DuckDB oracles are unchanged.
    graft.functions.VectorExpressions.register(docs.sparkSession)
    val keep = docs.columns.toSeq
    docs.select((keep.map(col) :+
      posexplode(graft.functions.VectorExpressions.minhash_bands8(
        col("text"), lit(k))).as(Seq("band_id", "band_val"))): _*)
  }

  /** Incremental NEAR-dup: LSH band candidates of a NEW batch (doc_id ≡ 1
    * mod 4, the q_dedup_incremental split) against the EXISTING corpus
    * (the rest) — the batch twin of the streaming
    * [[graft.streaming.StreamOps.nearDupCandidates]] operator, and the
    * near-dup complement of q_dedup_incremental's exact-fingerprint
    * anti-join. New-side bands come from the per-row scalar projection
    * ([[minhashBandsFor]] — the stream-safe form), corpus-side from
    * [[minhashCorpusBands]] with dense buckets dropped; the join is
    * band-equi (at scale: corpus bands bucketed on (band_id, band_val),
    * arriving batches join co-located — no corpus-side exchange, same
    * topology q_dedup_incremental pins). Candidates feed the standard
    * exact verification; uncapped shingles on both sides so stream and
    * batch derivations agree bitwise. */
  val dedupIncrementalLsh = QuerySpec(
    "q_dedup_incremental_lsh",
    s"""WITH ${shingleSql(3)},
        nsig AS (SELECT doc_id, $minhashSigSql FROM sh0
                 WHERE doc_id % 4 = 1 GROUP BY doc_id),
        csig AS (SELECT doc_id, $minhashSigSql FROM sh0
                 WHERE doc_id % 4 <> 1 GROUP BY doc_id),
        nb AS (${minhashBandsSqlFor("nsig")}),
        cb0 AS (${minhashBandsSqlFor("csig")}),
        dense AS (SELECT band_id, band_val FROM cb0
                  GROUP BY 1, 2 HAVING count(*) > $MaxBandBucket),
        cb AS (SELECT b.* FROM cb0 b
               WHERE NOT EXISTS (SELECT 1 FROM dense d
                                 WHERE d.band_id = b.band_id
                                   AND d.band_val = b.band_val))
        SELECT DISTINCT n.doc_id AS new_doc_id, c.doc_id AS corpus_doc_id
        FROM nb n JOIN cb c
          ON n.band_id = c.band_id AND n.band_val = c.band_val""") {
    (s, d) =>
      // ONE scalar band pass over the whole table, leased: the new side,
      // the corpus side, and the dense-bucket audit all read it — deriving
      // each side separately would run the shingle+8×md5 projection twice.
      // Projected BEFORE the lease: minhashBandsFor passes `text` through
      // (the streaming caller needs its other columns), and caching it
      // here would store every doc's text 4× for nothing
      val bands = graft.ops.Caches.lease(
        minhashBandsFor(graft.ops.Scale.fanOutScan(
            docs(s, d).select("doc_id", "text"), col("doc_id")))
          .select("doc_id", "band_id", "band_val"))
      val nb = bands.filter(col("doc_id") % 4 === 1)
      val cb = bands.filter(col("doc_id") % 4 =!= 1)
        .withColumnRenamed("doc_id", "corpus_doc_id")
      val dense = cb.groupBy("band_id", "band_val")
        .agg(count(lit(1)).as("n")).filter(col("n") > MaxBandBucket)
        .select("band_id", "band_val")
      nb.join(cb.join(broadcast(dense), Seq("band_id", "band_val"), "left_anti"),
          Seq("band_id", "band_val"))
        .select(col("doc_id").as("new_doc_id"), col("corpus_doc_id"))
        .distinct()
  }

  /** Adversarial robustness gate for the LSH dedup family: a crafted
    * pathological shard where HALF the corpus is one identical document —
    * every even doc shares every band, so each of the 4 band buckets
    * holds 50% of all rows. Uncapped banding would emit O((n/2)²) pairs
    * from those buckets alone (at sf0.1: ~3.1M pairs from 2500 identical
    * docs — a single-key shuffle bomb); the [[MaxBandBucket]] dense-drop
    * removes them from PAIR generation map-side (broadcast anti-join),
    * leaving only the benign half's near-dup candidates. Degenerate
    * identical-text clusters are the EXACT dedup family's job (a linear
    * groupBy) — this query pins that the near-dup plan stays bounded when
    * fed the worst case, with the oracle agreeing on exactly which pairs
    * survive. Same per-row band builder + dense-drop topology as
    * [[dedupIncrementalLsh]] / [[minhashCorpusBands]]. */
  val dedupAdversarialBucket = QuerySpec(
    "q_dedup_adversarial_bucket",
    s"""WITH adv AS (SELECT doc_id,
                CASE WHEN doc_id % 2 = 0 THEN '$AdversarialText'
                     ELSE text END AS text FROM documents),
        w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM adv),
        sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
                FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS u(i)),
        sig AS (SELECT doc_id, $minhashSigSql FROM sh0 GROUP BY doc_id),
        bands AS ($minhashBandsSql),
        dense AS (SELECT band_id, band_val FROM bands
                  GROUP BY 1, 2 HAVING count(*) > $MaxBandBucket),
        bk AS (SELECT b.* FROM bands b
               WHERE NOT EXISTS (SELECT 1 FROM dense d
                                 WHERE d.band_id = b.band_id
                                   AND d.band_val = b.band_val))
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bk a JOIN bk b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id""") {
    (s, d) =>
      val adv = graft.ops.Scale.fanOutScan(
        docs(s, d).select("doc_id", "text"), col("doc_id"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, lit(AdversarialText))
            .otherwise(col("text")).as("text"))
      // one leased band pass; the dense audit and both join sides read it
      val bands = graft.ops.Caches.lease(
        minhashBandsFor(adv).select("doc_id", "band_id", "band_val"))
      val dense = bands.groupBy("band_id", "band_val")
        .agg(count(lit(1)).as("n")).filter(col("n") > MaxBandBucket)
        .select("band_id", "band_val")
      val bk = bands.join(broadcast(dense), Seq("band_id", "band_val"), "left_anti")
        .select("doc_id", "band_id", "band_val")
      bk.select(col("doc_id").as("a_id"), col("band_id"), col("band_val"))
        .join(bk.select(col("doc_id").as("b_id"), col("band_id"), col("band_val")),
          Seq("band_id", "band_val"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .distinct()
  }

  /** Static corpus band table for stream-static near-dup: the per-row
    * band builder over the corpus, DENSE BUCKETS DROPPED (a bucket with
    * n members contributes O(n) join hits per arriving probe and O(n²)
    * pairs corpus-side — same skew bomb and same treatment as
    * [[MaxBandBucket]]; degenerate identical-signature clusters belong to
    * the exact-dedup family). At 100 TB this table is written once by the
    * corpus snapshot job, bucketed on (band_id, band_val), and every
    * streaming ingest joins it co-located. */
  def minhashCorpusBands(corpus: DataFrame): DataFrame = {
    val bands = minhashBandsFor(corpus.select("doc_id", "text"))
      .select(col("doc_id").as("corpus_doc_id"), col("band_id"), col("band_val"))
    val dense = bands.groupBy("band_id", "band_val")
      .agg(count(lit(1)).as("n")).filter(col("n") > MaxBandBucket)
      .select("band_id", "band_val")
    bands.join(broadcast(dense), Seq("band_id", "band_val"), "left_anti")
  }

  /** The shared LSH candidate table is the most-referenced memo (ten dedup
    * consumers, the whole graph family, Curation's novelty pass) and the
    * deepest to build (~25 shuffle exchanges). `localCheckpoint` rather
    * than `cache()`: the lineage is TRUNCATED, so a consumer referencing
    * it twice (e.g. the symmetrized edge union) plans against a scan of
    * the materialized snapshot instead of inlining the 25-exchange build
    * per reference — q_link_predict's cold plan was 228 exchanges under
    * `cache()`, ~6 under the checkpoint. This is also the honest stand-in
    * for the production topology (a snapshot table WRITTEN by a separate
    * job has no lineage to inline). Eager: first access pays the build,
    * exactly like the cache-on-first-action form; never leased, so the
    * harness drain can't strand it (its blocks die with the session). */
  private[queries] def minhashCandShared(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, (d, "cand3"))(minhashCandidates(minhashSigShared(s, d)).localCheckpoint())

  /** The candidate-table build WITHOUT memo or checkpoint — the plan the
    * separate snapshot job would run. Exists so PlanFingerprintSpec can
    * pin the deepest build in the suite: consumers' fingerprints see only
    * the post-checkpoint snapshot scan (0 exchanges), so without this
    * entry a shuffle/cartesian regression in the shingle→signature→
    * candidate pipeline would never fail a test. */
  private[graft] def minhashCandFresh(s: SparkSession, d: String): DataFrame =
    minhashCandidates(minhashSig(shingledFresh(s, d, 3)))

  /** Materializes the session-shared dedup intermediates (capped shingles,
    * MinHash signatures, LSH candidate pairs) so whichever consumer runs
    * first is not billed for the corpus-snapshot build — Bench calls this
    * once, outside per-query timing, mirroring the production topology
    * where these tables are written by a separate snapshot job. */
  def prewarmShared(s: SparkSession, d: String): Unit = {
    minhashCandShared(s, d).count() // forces shingled3 → sig3 → cand3
    simhashShared(s, d).count()
    // the 5-gram stream is a second snapshot table (Jaccard dedup,
    // decontamination); without this its ~6s build was billed to its
    // alphabetically-first consumer (q_decontaminate, r8 find)
    shingled(s, d, 5).count()
    ()
  }

  /** MinHash + LSH banding: signature_i = min(md5(shingle ⊕ seed_i)) over
    * the doc's 3-word shingles; 4 bands of 2 hashes; docs sharing any band
    * bucket become candidate pairs. The band-bucket join replaces the
    * all-pairs O(n²) comparison — the standard 100 TB near-dup design. */
  val dedupMinhashLsh = QuerySpec(
    "q_dedup_minhash_lsh",
    s"""WITH ${shingleSql(3)},
        sig AS (SELECT doc_id, $minhashSigSql FROM sh GROUP BY doc_id),
        bands AS ($minhashBandsSql)
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id""") {
    (s, d) => minhashCandShared(s, d)
  }

  /** LSH recall gate — the dedup analogue of q_sim_recall: every TRUE
    * near-dup pair (exact 3-gram Jaccard ≥ 0.5, the regime 4×2 banding is
    * tuned to catch) is checked against the LSH candidate set. A pair the
    * bands miss is a duplicate that survives dedup silently, so this is
    * the number to watch when retuning bands/rows — and unlike the
    * estimate diagnostic it measures the CANDIDATE stage, where the real
    * recall loss happens. Truth side reuses the df-capped shingle stream;
    * candidate side reuses the exact banding plumbing of the production
    * pass, so the gate can never drift from what it gates. */
  val dedupLshRecall = QuerySpec(
    "q_dedup_lsh_recall",
    s"""WITH ${shingleSql(3)},
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        truth AS (SELECT pr.a_id, pr.b_id
                  FROM pr JOIN sz sa ON sa.doc_id = pr.a_id
                          JOIN sz sb ON sb.doc_id = pr.b_id
                  WHERE 3 * pr.inter >= sa.n + sb.n),
        $minhashCandSql
        SELECT t.a_id, t.b_id,
               CAST(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS lsh_hit
        FROM truth t LEFT JOIN cand c ON c.a_id = t.a_id AND c.b_id = t.b_id""") {
    (s, d) =>
      val sh = shingled(s, d, 3)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val truth = sh.toDF("a_id", "shingle")
        .join(sh.toDF("b_id", "shingle"), "shingle")
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
        .join(sz.toDF("a_id", "n_a"), "a_id")
        .join(sz.toDF("b_id", "n_b"), "b_id")
        .filter(lit(3) * col("inter") >= col("n_a") + col("n_b"))
        .select("a_id", "b_id")
      val cand = minhashCandShared(s, d).withColumn("_c", lit(1))
      val result = truth.join(cand, Seq("a_id", "b_id"), "left")
        .select(col("a_id"), col("b_id"),
          coalesce(col("_c"), lit(0)).cast("long").as("lsh_hit"))
        .localCheckpoint()
      result
  }

  /** MinHash accuracy check: for every LSH candidate pair, the signature
    * agreement count (estimates Jaccard as matches/K) beside the TRUE
    * 3-gram shingle-intersection counts — the estimator-vs-exact diagnostic
    * a pipeline runs before trusting banding thresholds at scale. Outputs
    * integers only (cross-engine-exact). */
  val dedupMinhashEstimate = {
    val matchesSql = (0 until MinhashK)
      .map(i => s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END").mkString(" + ")
    QuerySpec(
      "q_dedup_minhash_estimate",
      s"""WITH ${shingleSql(3)},
          $minhashCandSql,
          sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
          inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
                    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
          SELECT c.a_id, c.b_id,
                 CAST($matchesSql AS BIGINT) AS sig_matches,
                 COALESCE(i.inter, 0) AS inter, za.n AS n_a, zb.n AS n_b
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.a_id
          JOIN sig sb ON sb.doc_id = c.b_id
          JOIN sz za ON za.doc_id = c.a_id
          JOIN sz zb ON zb.doc_id = c.b_id
          LEFT JOIN inter i ON i.a_id = c.a_id AND i.b_id = c.b_id""") {
      (s, d) =>
        val sh = shingled(s, d, 3)
        val sig = minhashSigShared(s, d)
        val cand = minhashCandShared(s, d)
        val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = sh.toDF("a_id", "shingle")
          .join(sh.toDF("b_id", "shingle"), "shingle")
          .filter(col("a_id") < col("b_id"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
        val sigA = sig.toDF("a_id" +: (0 until MinhashK).map(i => s"a_h$i"): _*)
        val sigB = sig.toDF("b_id" +: (0 until MinhashK).map(i => s"b_h$i"): _*)
        val matches = (0 until MinhashK)
          .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
          .reduce(_ + _)
        val result = cand
          .join(sigA, "a_id").join(sigB, "b_id")
          .join(sz.toDF("a_id", "n_a"), "a_id")
          .join(sz.toDF("b_id", "n_b"), "b_id")
          .join(inter, Seq("a_id", "b_id"), "left")
          .select(
            col("a_id"), col("b_id"),
            matches.cast("long").as("sig_matches"),
            coalesce(col("inter"), lit(0L)).as("inter"),
            col("n_a"), col("n_b"))
          .localCheckpoint()
        result
    }
  }

  /** The production near-dup PAIR pipeline: LSH banding proposes candidate
    * pairs (never an all-pairs comparison), then exact Jaccard verifies
    * each candidate using the candidate docs' shingles ONLY — the
    * intersection fans each pair out over its left doc's shingles and keeps
    * those present in the right doc, so the work is candidate-linear
    * (pairs × shingles-per-doc) rather than a full shingle self-join.
    * Integer-only threshold: 5·|∩| ≥ |A|+|B| ⇔ J ≥ 0.25. This is the
    * scale-safe composition of [[dedupMinhashLsh]] + [[dedupJaccard]]:
    * banding bounds the candidate count, verification restores exactness. */
  val dedupLshVerified = QuerySpec(
    "q_dedup_lsh_verified",
    s"""WITH ${shingleSql(3)},
        $minhashCandSql,
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT c.a_id, c.b_id, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.doc_id = c.a_id
          JOIN sh b ON b.doc_id = c.b_id AND b.shingle = a.shingle
          GROUP BY 1, 2)
        SELECT i.a_id, i.b_id, i.inter, za.n AS n_a, zb.n AS n_b
        FROM inter i
        JOIN sz za ON za.doc_id = i.a_id
        JOIN sz zb ON zb.doc_id = i.b_id
        WHERE 5 * i.inter >= za.n + zb.n""") {
    (s, d) =>
      val sh = shingled(s, d, 3)
      val cand = minhashCandShared(s, d)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = cand
        .join(sh.toDF("a_id", "shingle"), "a_id")
        .join(sh.toDF("b_id", "shingle"), Seq("b_id", "shingle"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      val result = inter
        .join(sz.toDF("a_id", "n_a"), "a_id")
        .join(sz.toDF("b_id", "n_b"), "b_id")
        .filter(lit(5) * col("inter") >= col("n_a") + col("n_b"))
        .select("a_id", "b_id", "inter", "n_a", "n_b")
        .localCheckpoint()
      result
  }

  /** WEIGHTED (multiset) Jaccard verification over the LSH candidates —
    * the refinement [[dedupLshVerified]]'s set semantics can't see: two
    * docs drawing on the same vocabulary with different word FREQUENCIES
    * score identically under set Jaccard but diverge under
    * J_w = Σ min(c_a,c_b) / Σ max(c_a,c_b), the standard bag-of-words
    * similarity for "same words, different emphasis" near-dups
    * (templates filled differently, boilerplate with varied repetition).
    * Σ max needs no second pass: Σ max = N_a + N_b − Σ min over token
    * counts, so the integer verdict 3·Σmin ≥ N_a+N_b ⇔ J_w ≥ 1/2.
    *
    * Scale shape: candidate-linear exactly like [[dedupLshVerified]] —
    * the per-doc token-count table joins once per candidate side, keyed
    * on (doc_id, token); no df cap needed because the pair set is
    * LSH-bounded before any token join. All-integer, cross-engine
    * bitwise. On THIS corpus the surviving pair set coincides with the
    * set-Jaccard gate's (the synthetic near-dups are clones with
    * single-token deltas, so counts track sets); the oracle still
    * proves the multiset arithmetic end-to-end — inter_w is the
    * count-weighted intersection, not the shared-token count. */
  val dedupWeightedJaccard = QuerySpec(
    "q_dedup_weighted_jaccard",
    s"""WITH ${shingleSql(3)},
        $minhashCandSql,
        tc AS (SELECT doc_id, u.token AS token, CAST(count(*) AS BIGINT) AS c
               FROM w, UNNEST(w.ws) AS u(token)
               GROUP BY 1, 2),
        tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
        interw AS (
          SELECT cd.a_id, cd.b_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS inter_w
          FROM cand cd
          JOIN tc a ON a.doc_id = cd.a_id
          JOIN tc b ON b.doc_id = cd.b_id AND b.token = a.token
          GROUP BY 1, 2)
        SELECT i.a_id, i.b_id, i.inter_w, ta.n AS n_a, tb.n AS n_b
        FROM interw i
        JOIN tot ta ON ta.doc_id = i.a_id
        JOIN tot tb ON tb.doc_id = i.b_id
        WHERE 3 * i.inter_w >= ta.n + tb.n""") {
    (s, d) =>
      val tc = graft.ops.Caches.lease(
        graft.ops.Scale.fanOutScan(docs(s, d).select("doc_id", "text"), col("doc_id"))
          .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("c")))
      val tot = tc.groupBy("doc_id").agg(sum(col("c")).as("n"))
      val cand = minhashCandShared(s, d)
      val interw = cand
        .join(tc.toDF("a_id", "token", "ca"), "a_id")
        .join(tc.toDF("b_id", "token", "cb"), Seq("b_id", "token"))
        .groupBy("a_id", "b_id").agg(sum(least(col("ca"), col("cb"))).as("inter_w"))
      interw
        .join(tot.toDF("a_id", "n_a"), "a_id")
        .join(tot.toDF("b_id", "n_b"), "b_id")
        .filter(lit(3) * col("inter_w") >= col("n_a") + col("n_b"))
        .select("a_id", "b_id", "inter_w", "n_a", "n_b")
  }

  // 32 bits = one md5 nibble per bit position; 16 was measurably too
  // coarse (59% of all candidate pairs landed within hamming 3 at sf0.01)
  private val SimhashBits = 32

  /** `sim AS (doc_id, simhash)` CTE chain, shared by the fingerprint query
    * and the hamming-band near-dup join. */
  private val simhashSql = {
    val sumsSql = (0 until SimhashBits)
      .map(j => s"sum(CASE WHEN substr(md5(token), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val fpSql = (0 until SimhashBits)
      .map(j => s"CASE WHEN s$j >= 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""tok AS (SELECT DISTINCT doc_id, u.token
                FROM documents, UNNEST(str_split(text, ' ')) AS u(token)),
        sums AS (SELECT doc_id, $sumsSql FROM tok GROUP BY 1),
        sim AS (SELECT doc_id, CAST($fpSql AS BIGINT) AS simhash FROM sums)"""
  }

  /** DataFrame twin of the `sim` CTE. The md5 is materialized in a
    * projection BEFORE the aggregate so each row hashes once — as 32
    * separate `sum(… md5(token) …)` children it was re-evaluated per sum
    * column (the partial-aggregate update path does not share subtrees
    * across aggregate functions). */
  private[graft] def simhashDf(s: SparkSession, d: String): DataFrame = {
    val tok = graft.ops.Scale.fanOutScan(docs(s, d).select("doc_id", "text"), col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("token"))
      .select(col("doc_id"), md5(col("token")).as("h"))
    val sumCols = (0 until SimhashBits).map(j =>
      sum(when(substring(col("h"), j + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$j"))
    val sums = tok.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    val fp = (0 until SimhashBits)
      .map(j => when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), fp.cast("long").as("simhash"))
  }

  /** Session-shared simhash fingerprint table — two consumers (the
    * fingerprint query and the hamming-band pair join); without the memo
    * the hamming query re-ran the whole explode+hash+32-sum build
    * (in-suite it was the single most expensive query at 25.8s for that
    * reason). Same corpus-snapshot semantics as [[minhashSigShared]]. */
  private[queries] def simhashShared(s: SparkSession, d: String): DataFrame =
    memo.getOrElseUpdate(s, (d, "simhash32"))(simhashDf(s, d).cache())

  /** SimHash: 32-bit fingerprint from the md5 nibbles of the doc's distinct
    * tokens — bit_j = sign of Σ_token (±1 by whether md5 nibble j has its
    * high bit set). Near-dup docs differ in few bits; the hamming-band
    * join below turns the fingerprints into pairs. */
  val dedupSimhash = QuerySpec(
    "q_dedup_simhash",
    s"""WITH $simhashSql SELECT doc_id, simhash FROM sim""") {
    (s, d) => simhashShared(s, d)
  }

  /** SimHash near-dup pairs via HAMMING BANDING: the 32-bit fingerprint
    * splits into 4 bytes; by pigeonhole, any pair within hamming
    * distance 3 agrees on at least one whole byte, so the candidate join
    * is byte-equi (shuffle on (band, byte) — never all-pairs, and dense
    * buckets dropped per [[MaxBandBucket]]), then `bit_count(a XOR b) <= 1`
    * verifies exactly (the synthetic corpus draws from a small shared
    * vocabulary, so looser thresholds match most pairs; the banding
    * guarantees recall up to hamming 3 for docs outside degenerate
    * buckets). Integer-only math, cross-engine exact. The SimHash analogue
    * of [[dedupLshVerified]]. */
  val dedupSimhashHamming = QuerySpec(
    "q_dedup_simhash_hamming",
    s"""WITH $simhashSql,
        bands0 AS (SELECT doc_id, simhash, b.band_id,
                          (simhash >> (8 * b.band_id)) & 255 AS band_val
                   FROM sim, (SELECT UNNEST(generate_series(0, 3)) AS band_id) b),
        dense AS (SELECT band_id, band_val FROM bands0
                  GROUP BY 1, 2 HAVING count(*) > $MaxBandBucket),
        bands AS (SELECT b.* FROM bands0 b
                  WHERE NOT EXISTS (SELECT 1 FROM dense d
                                    WHERE d.band_id = b.band_id
                                      AND d.band_val = b.band_val)),
        cand AS (SELECT DISTINCT a.doc_id AS a_id, a.simhash AS a_sim,
                                 b.doc_id AS b_id, b.simhash AS b_sim
                 FROM bands a JOIN bands b
                   ON a.band_id = b.band_id AND a.band_val = b.band_val
                      AND a.doc_id < b.doc_id)
        SELECT a_id, b_id, CAST(bit_count(xor(a_sim, b_sim)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(a_sim, b_sim)) <= 1""") {
    (s, d) =>
      // cache: the token-explode + 32 md5 sums feed three consumers (dense
      // and both sides of the self-join) — same pattern as the shingle
      // queries' cached sh
      val bands0 = simhashShared(s, d)
        .select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("band_id"))
        .withColumn("band_val", expr("shiftright(simhash, 8 * band_id) & 255"))
        .cache()
      val dense = bands0.groupBy("band_id", "band_val")
        .agg(count(lit(1)).as("n")).filter(col("n") > MaxBandBucket)
        .select("band_id", "band_val")
      // broadcast anti-join: dense buckets drop map-side, no extra shuffle
      val bands = bands0.join(broadcast(dense), Seq("band_id", "band_val"), "left_anti")
      val cand = bands.toDF("band_id", "band_val", "a_id", "a_sim")
        .join(bands.toDF("band_id", "band_val", "b_id", "b_sim"), Seq("band_id", "band_val"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "a_sim", "b_id", "b_sim")
        .distinct()
      val result = cand
        .withColumn("hamming", expr("CAST(bit_count(a_sim ^ b_sim) AS BIGINT)"))
        .filter(col("hamming") <= 1)
        .select("a_id", "b_id", "hamming")
        .localCheckpoint()
      bands0.unpersist()
      result
  }

  /** Near-dup CLUSTERING: connected components over the Jaccard pair graph
    * (pairs alone don't dedup — A~B, B~C must collapse to one cluster).
    * Spark side: iterative min-label propagation — each round is one
    * distributed join+groupBy, rounds ≈ graph diameter, convergence
    * detected by the monotone label sum. The 100 TB-scale standard
    * (GraphX/pregel does the same loop). Oracle: recursive-CTE transitive
    * closure — fine at oracle scale, unusable at ours. */
  /** Recursive transitive-closure CTE chain over the J≥0.1 near-dup
    * pairs: defines `pairs`/`edges`/`reach`/`comp(doc_id, cluster_id)`.
    * ONE definition shared by the components, keep, and leakage-safe
    * split oracles — same convention as [[shingleSql]]/[[minhashCandSql]]
    * so the Spark side (which delegates to [[connectedComponents]]) and
    * every consuming oracle can never drift apart. Callers prepend
    * `WITH RECURSIVE ${shingleSql(5)},`. */
  private[queries] val componentsSql =
    s"""sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
               FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        pairs AS (
          SELECT pr.a_id, pr.b_id
          FROM pr JOIN sz sa ON sa.doc_id = pr.a_id
                  JOIN sz sb ON sb.doc_id = pr.b_id
          WHERE 11 * pr.inter >= sa.n + sb.n),
        edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
                  UNION ALL SELECT b_id, a_id FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                 FROM reach GROUP BY src)"""

  val dedupComponents = QuerySpec(
    "q_dedup_components",
    s"""WITH RECURSIVE ${shingleSql(5)},
        $componentsSql
        SELECT doc_id, cluster_id FROM comp""") {
    (s, d) =>
      val pairs = dedupJaccard.fn(s, d).select("a_id", "b_id")
      val edges = pairs
        .union(pairs.select(col("b_id"), col("a_id")))
        .toDF("src", "dst")
      connectedComponents(edges)
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Iterative min-label propagation over an undirected edge list
    * (`src`,`dst`; both directions present), ACCELERATED by pointer
    * jumping from round 0: each round takes the minimum over {own label,
    * neighbor labels} (reach +1 hop), then shortcuts
    * `label ← min(label, label(label))` (reach ×2) — so convergence needs
    * O(log diameter) rounds, not O(diameter) (the hash-to-min family; a
    * 39-diameter chain is detected converged within 8 rounds vs 39 —
    * TextDedupSpec pins the bound on a crafted path graph). Both steps only
    * replace a label with another member's id and labels only decrease,
    * so the monotone label-sum fixpoint check holds: at fixpoint every
    * neighbor pair has equal labels, hence label = component minimum.
    *
    * Driver-coordination cost is held constant-per-round and the round
    * count logarithmic — the r5 shape paid ~30 rounds × (growing plan +
    * blocking action) and was this suite's one scale-killer:
    *   - `edges` is `localCheckpoint`ed ONCE up front, pre-partitioned on
    *     `dst`: every round's neighbor join reuses the materialized,
    *     lineage-free, already-hashed input (the checkpoint preserves
    *     outputPartitioning, so no per-round exchange of the edge table).
    *   - labels are eagerly `localCheckpoint`ed EVERY round: plan depth —
    *     and driver-side analysis/codegen time, which dominated at r5 —
    *     stays constant regardless of round number.
    *   - the neighbor minimum is one union + one partial-aggregating
    *     groupBy (no separate left join back onto labels).
    *   - the convergence check (a label-sum action) runs every 2nd round:
    *     the sum is monotone non-increasing, so "unchanged across a
    *     2-round window" still implies no round in the window changed
    *     anything — a fixpoint — while halving the blocking actions.
    * Fails loudly rather than emit non-minimal labels if `maxRounds` is
    * too small (a silent miss would diverge from the oracle's transitive
    * closure). */
  private[graft] def connectedComponents(edges0: DataFrame, maxRounds: Int = 30): DataFrame =
    connectedComponentsWithRounds(edges0, maxRounds)._1

  /** `df.localCheckpoint()` plus a handle to the RDD whose blocks back it
    * (the `LogicalRDD` the checkpointed Dataset wraps — `Dataset
    * .unpersist` cannot reach it) — so iterative callers can RELEASE a
    * round's blocks when it is replaced instead of accreting rounds+1
    * block sets per invocation for the life of the session (the same
    * scratch accumulation mechanism as the r4 sketch-family regression).
    * The handle is extracted from the returned plan, NOT diffed from
    * `getPersistentRDDs`: a diff window also captures any UPSTREAM memo
    * cache that happens to materialize for the first time during the
    * checkpoint's action (e.g. the shared LSH candidate table feeding the
    * edge list), and releasing that would silently de-cache a
    * session-shared memo for every later consumer. */
  private[queries] def localCheckpointTracked(
      df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val ck = boundCheckpointStats(df.localCheckpoint())
    val rdds = ck.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    (ck, rdds)
  }

  /** Caps a checkpointed frame's inherited size estimate at
    * `spark.sql.defaultSizeInBytes` (r13). `Dataset.localCheckpoint`
    * copies the ORIGINAL plan's `Statistics` onto the wrapping
    * LogicalRDD, and the default join estimate is the PRODUCT of the
    * input sizes — so in an iterative loop every round's self-join
    * SQUARES the carried BigInt and every checkpoint re-roots the next
    * round's plan in it: the digit count doubles per checkpoint
    * (double-exponential value growth), until a single planner stats
    * visit spends MINUTES in Toom-Cook BigInteger multiplies. Measured
    * on q_entity_cluster's CC loop: >420 s wall planning-bound vs 6 s
    * end-to-end with the cap (the driver jstack shows the loop inside
    * `SizeInBytesOnlyStatsPlanVisitor.visitJoin` → `BigInteger
    * .multiplyToomCook3`). The cap keeps honest small estimates exact
    * (min) and clamps the garbage: a loop-state table estimated at
    * 10^600 bytes carries no more planner information than "huge" —
    * every join against it already takes the no-broadcast path either
    * way, and AQE re-plans from MEASURED sizes at runtime. Applied to
    * the tracked (loop-state) checkpoints only; one-shot memo snapshots
    * keep their estimates. */
  private[queries] def boundCheckpointStats(ck: DataFrame): DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    val spark = ck.sparkSession
    val cap = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    // NOTE: the root is replaced BY HAND, not via plan.transform —
    // LogicalRDD is a case class whose == ignores its second parameter
    // list (where originStats lives), so a stats-only replacement is
    // `fastEquals` to the original and transform silently keeps the
    // unbounded node.
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.computeStats().sizeInBytes > cap =>
        org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
          new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(cap)),
            None))
      case _ => ck
    }
  }

  /** LAZY local checkpoint (r12): the logical plan is swapped for the
    * LogicalRDD immediately (plan depth stays constant, exactly like the
    * eager form) but NO materialization job runs here — the blocks
    * persist and the lineage truncates during the FIRST action that
    * reads them. The fixpoint loops fuse this with their per-round
    * (count, sum) probe, halving the driver round-trips per round: the
    * probe job IS the materialization job. Two rules the callers own:
    * (1) an input's blocks may only be released AFTER something has
    * materialized the lazy output (a truncated-but-unpersisted parent
    * cannot be recomputed — Spark throws "checkpoint block not found");
    * (2) action-free round loops (stressOf) may chain lazy checkpoints
    * freely — the terminal query action materializes every round in ONE
    * job instead of one job per round. */
  private[queries] def localCheckpointLazyTracked(
      df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val ck = boundCheckpointStats(df.localCheckpoint(false))
    val rdds = ck.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    (ck, rdds)
  }

  private[queries] def release(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
    rdds.foreach { r => try r.unpersist(false) catch { case _: Throwable => () } }

  /** ONE synchronous CC round — propagate + pointer-jump — factored so
    * the per-round plan is a named, fingerprint-gatable unit (see
    * [[graft.PlanFingerprints.builders]] q_builder_cc_round): the loop's
    * final fingerprint is just a LogicalRDD scan, so without this a
    * shuffle regression in the ROUND body would never fail the plan
    * gate. Min over {own label} ∪ {labels of neighbors}: the self row
    * rides the union so no left join back onto labels is needed — one
    * partial-aggregated groupBy shuffle; then pointer jump
    * label ← min(label, label(label)) — every label is a member id and
    * ids are unique, so the self-join key is unique on the right; the
    * left join guards the id==label base case cheaply. */
  private[graft] def ccRound(edges: DataFrame, labels: DataFrame): DataFrame =
    ccJump(ccPropagate(edges, labels))

  /** The neighbor-propagate half of a CC round: min over {own label} ∪
    * {labels of neighbors} — the self row rides the union so no left
    * join back onto labels is needed; one partial-aggregated groupBy
    * shuffle. */
  private[graft] def ccPropagate(edges: DataFrame, labels: DataFrame): DataFrame =
    edges
      .join(labels.toDF("dst", "dst_label"), "dst")
      .select(col("src").as("id"), col("dst_label").as("label"))
      .unionByName(labels)
      .groupBy("id").agg(min("label").as("label"))

  /** ONE pointer jump: label ← min(label, label(label)). Every label is
    * a member id and ids are unique, so the self-join key is unique on
    * the right; the left join guards the id==label base case cheaply.
    * Applied to its OWN output it composes the pointer map with itself
    * (f ← f∘f), which is what lets a round multiply chase depth by
    * 2^[[CcJumpsPerRound]]. The label-keyed join concentrates a
    * component's members on its minimum's key — the right side is
    * unique-keyed so the hot key is a fan-out read, not a pair blowup,
    * and AQE's skew split applies as in any sort-merge join. */
  private[graft] def ccJump(p: DataFrame): DataFrame =
    p.join(p.toDF("label", "jump_label"), Seq("label"), "left")
      .select(col("id"),
        least(col("label"), coalesce(col("jump_label"), col("label"))).as("label"))

  /** Pointer jumps per CC round AFTER the propagate step (r13): the
    * round-trip floor of the fixpoint loop is driver stages per round ×
    * rounds, and a jump is ~2 stages against the propagate's ~4 — so
    * composing J checkpointed jumps per round divides rounds by J (depth
    * 2^J per round) for +2J stages, net ~2× fewer driver stages on a
    * long chain. Output unchanged: labels are elementwise monotone
    * non-increasing through every propagate/jump, the fixpoint (each
    * vertex at its component minimum) is unique, and the loop stops on
    * the same sum-unchanged detector — TextDedupSpec's path-graph pin
    * and every CC consumer's oracle hash gate the equality. */
  private[queries] val CcJumpsPerRound = 3

  /** [[connectedComponents]] plus the executed round count — the spec hook
    * for the O(log diameter) convergence pin (TextDedupSpec's crafted
    * path graph). */
  private[graft] def connectedComponentsWithRounds(
      edges0: DataFrame, maxRounds: Int = 30): (DataFrame, Int) = {
    // one-off materialization: lineage-free and hash-partitioned on dst,
    // reused (exchange-free on the edge side) by every round's join
    val (edges, edgesRdds) =
      localCheckpointTracked(edges0.toDF("src", "dst").repartition(col("dst")))
    // LAZY checkpoint + probe fusion (r13, the GraphOps.fixpointLoop
    // discipline): the label-sum probe is the action that materializes
    // the round's checkpoint blocks, so a round costs ONE driver job —
    // the r12 form paid an eager-checkpoint job AND a probe job on
    // probe-cadence rounds. With the probe free, it runs EVERY round
    // (labels only ever decrease, so sum-unchanged == fixpoint), which
    // also detects convergence at the earliest possible round instead
    // of up to one cadence step late. The previous round's blocks are
    // released only AFTER the probe has landed — the lazy-checkpoint
    // ordering rule (the next round's lineage roots in them until the
    // materialization completes).
    var (labels, labelsRdds) = localCheckpointLazyTracked(
      edges.select(col("src").as("id")).distinct().withColumn("label", col("id")))
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // r13: propagate once, then CcJumpsPerRound pointer-doubling jumps,
      // each behind its own lazy checkpoint (rule (2) above: the chain
      // materializes under the round's single probe action; without the
      // checkpoints the self-joins would inline the propagate subtree
      // 2^J times). Intermediate blocks are released AFTER the probe has
      // materialized the final table (rule (1)).
      rounds += 1
      var (cur, curRdds) = localCheckpointLazyTracked(ccPropagate(edges, labels))
      var spentRdds = Seq.empty[org.apache.spark.rdd.RDD[_]]
      for (_ <- 1 to CcJumpsPerRound) {
        val (next, nextRdds) = localCheckpointLazyTracked(ccJump(cur))
        spentRdds ++= curRdds
        cur = next
        curRdds = nextRdds
      }
      val nextSum = labelSum(cur) // ONE fused job: materialize chain + probe
      release(spentRdds)
      release(labelsRdds)
      labels = cur
      labelsRdds = curRdds
      converged = nextSum == prevSum
      prevSum = nextSum
    }
    release(edgesRdds) // loop done: only the final labels snapshot survives
    if (!converged) {
      // error path: the last round's checkpoint blocks have no consumer
      // and leaseRdd below never runs — free them before throwing, or
      // they linger for the session
      release(labelsRdds)
      throw new IllegalArgumentException(
        s"requirement failed: label propagation did not converge in $rounds rounds")
    }
    // the final labels blocks are query-scoped scratch: consumers read the
    // result within their query action, then the harness drains. (A
    // drained checkpoint cannot be recomputed — CC results are never
    // session-memoized, so nothing re-reads them post-drain.)
    labelsRdds.foreach(graft.ops.Caches.leaseRdd)
    (labels, rounds)
  }

  /** The near-dup KEEP decision: every doc in a near-dup component keeps
    * iff it is the cluster minimum — the final output of the dedup chain
    * (pairs → components → canonical selection). */
  val dedupKeep = QuerySpec(
    "q_dedup_keep",
    s"""WITH RECURSIVE ${shingleSql(5)},
        $componentsSql
        SELECT doc_id, cluster_id, (doc_id = cluster_id) AS keep
        FROM comp""") {
    (s, d) =>
      dedupComponents.fn(s, d)
        .withColumn("keep", col("doc_id") === col("cluster_id"))
  }

  /** The quality-priority KEEP decision — what production dedup actually
    * ships: within each near-dup cluster keep the LONGEST document
    * (near-dups are usually subset/superset variants of one page; the
    * longest is the most complete), tiebreak lowest doc_id. The integer
    * length makes the argmax cross-engine exact where a float quality
    * score would not be. Complements [[dedupKeep]]'s canonical-minimum
    * (stable ids for joining) — this one chooses WHICH text survives.
    * Scale shape: the per-cluster window is bounded by cluster size,
    * which the banding df-caps and [[MaxBandBucket]] dense-drop already
    * bound — never corpus-wide. */
  val dedupKeepBest = QuerySpec(
    "q_dedup_keep_best",
    s"""WITH RECURSIVE ${shingleSql(5)},
        $componentsSql,
        scored AS (SELECT c.doc_id, c.cluster_id, d.n_chars
                   FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
        SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars,
               (ROW_NUMBER() OVER (PARTITION BY cluster_id
                                   ORDER BY n_chars DESC, doc_id) = 1) AS keep
        FROM scored""") {
    (s, d) =>
      import org.apache.spark.sql.expressions.Window
      dedupComponents.fn(s, d)
        .join(docs(s, d).select(col("doc_id"), col("n_chars").cast("long").as("n_chars")),
          "doc_id")
        .withColumn("keep",
          row_number().over(Window.partitionBy("cluster_id")
            .orderBy(col("n_chars").desc, col("doc_id"))) === 1)
        .select("doc_id", "cluster_id", "n_chars", "keep")
  }

  /** Incremental dedup — the steady-state ingest shape: a NEW batch
    * (doc_id ≥ 250 stands in for today's crawl) anti-joined on normalized
    * fingerprint against the EXISTING corpus, keeping only first-seen
    * content. One shuffle on the fingerprint; at 100 TB the corpus side is
    * a bucketed fingerprint table so the anti-join is co-located. */
  val dedupIncremental = QuerySpec(
    "q_dedup_incremental",
    s"""WITH fp AS (
          SELECT doc_id, $normFingerprintSql AS fingerprint
          FROM documents)
       SELECT b.doc_id, b.fingerprint
       FROM fp b
       WHERE b.doc_id >= 250
         AND NOT EXISTS (SELECT 1 FROM fp c
                         WHERE c.doc_id < 250 AND c.fingerprint = b.fingerprint)""") {
    (s, d) =>
      val fp = docs(s, d).select(col("doc_id"), normFingerprint.as("fingerprint"))
      val batch = fp.filter(col("doc_id") >= 250)
      val corpus = fp.filter(col("doc_id") < 250).select("fingerprint")
      batch.join(corpus, Seq("fingerprint"), "left_anti")
        .select("doc_id", "fingerprint")
  }

  /** The corpus half of the steady-state incremental-dedup pair: persist
    * the existing corpus' fingerprints bucketed BY fingerprint
    * ([[graft.etl.Sink.overwriteBucketed]]). At 100 TB this is the at-rest
    * layout that makes every subsequent ingest anti-join co-located. */
  def writeCorpusFingerprints(s: SparkSession, d: String, table: String, buckets: Int): Unit =
    graft.etl.Sink.overwriteBucketed(
      docs(s, d).filter(col("doc_id") < 250)
        .select(col("doc_id"), normFingerprint.as("fingerprint")),
      table, "fingerprint", buckets)

  /** [[dedupIncremental]]'s scaladoc claim made real: anti-join the new
    * batch against a corpus fingerprint table persisted by
    * [[writeCorpusFingerprints]]. The bucketed scan already satisfies the
    * join's hash-partitioning requirement, so the (huge) corpus side has NO
    * exchange — only the small new batch shuffles to align with the
    * bucketing (pinned in PlanSpec). */
  def incrementalAgainstBucketedCorpus(
      s: SparkSession, d: String, corpusTable: String): DataFrame = {
    val batch = docs(s, d).filter(col("doc_id") >= 250)
      .select(col("doc_id"), normFingerprint.as("fingerprint"))
    batch.join(s.table(corpusTable).select("fingerprint"),
        Seq("fingerprint"), "left_anti")
      .select("doc_id", "fingerprint")
  }

  /** Deterministic content-hash sampling: keep docs whose md5 falls in a
    * hex-prefix range — reproducible across runs, engines, and reshards
    * (unlike rand()-based sampling), the standard way a training pipeline
    * carves stable subsets/splits. ~50% here (first nibble < '8'). */
  val sampleDeterministic = QuerySpec(
    "q_sample_deterministic",
    """SELECT doc_id, lang, substr(md5(text), 1, 1) AS bucket
       FROM documents WHERE substr(md5(text), 1, 1) < '8'""") {
    (s, d) =>
      docs(s, d)
        .withColumn("bucket", substring(md5(col("text")), 1, 1))
        .filter(col("bucket") < "8")
        .select("doc_id", "lang", "bucket")
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM'07): a weighted
    * sample WITHOUT replacement of k = 20 documents with inclusion
    * probability ∝ length, plus the estimation weights that make any
    * subset-sum estimate over the sample unbiased. Deterministic and
    * all-integer: u_i rides the 32-bit md5-prefix hash of doc_id (the
    * session's standard uniformizer), priority q_i = wᵢ·2³² div (hᵢ+1)
    * (the integer form of w/u), the sample is the top-k by priority and
    * τ = the (k+1)-th priority; each kept item's estimation weight is
    * max(wᵢ, τ) — Σ max(wᵢ, τ) over the sample estimates Σ wᵢ over the
    * corpus. The mixture-builder's "sample docs ∝ token budget" pass.
    *
    * Scale shape: one scan; BOTH top-k selections lower to
    * TakeOrderedAndProject (per-partition heaps + driver merge of k+1
    * rows — never a global sort), and τ broadcasts back onto the
    * 21-row sample. Weights up to ~10⁶ stay exact (w·2³² < 2⁶³). */
  val samplePriority = {
    val k = 20
    QuerySpec(
      "q_sample_priority",
      s"""WITH p AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                   CAST(n_chars AS BIGINT) * 4294967296 //
                     (list_reduce(list_transform(generate_series(1, 8),
                        zz -> CAST(strpos('0123456789abcdef',
                                substr(md5(CAST(doc_id AS VARCHAR)), zz, 1)) - 1 AS BIGINT)),
                        (za, zc) -> za * 16 + zc) + 1)
                     AS priority
            FROM documents),
          top AS (SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT ${k + 1}),
          tau AS (SELECT min(priority) AS t FROM top),
          r AS (SELECT doc_id, w, priority,
                       ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
                FROM top)
          SELECT doc_id, w, priority,
                 CAST(greatest(w, t) AS BIGINT) AS est_weight
          FROM r CROSS JOIN tau WHERE rn <= $k""") {
      (s, d) =>
        val p = docs(s, d).select(
          col("doc_id"), col("n_chars").cast("long").as("w"),
          expr("""cast(n_chars AS bigint) * 4294967296L div
                  (cast(conv(substr(md5(cast(doc_id AS string)), 1, 8), 16, 10)
                        AS bigint) + 1L)""")
            .as("priority"))
        val top = p.orderBy(col("priority").desc, col("doc_id")).limit(k + 1)
        val tau = broadcast(top.agg(min("priority").as("t")))
        top.orderBy(col("priority").desc, col("doc_id")).limit(k)
          .crossJoin(tau)
          .select(col("doc_id"), col("w"), col("priority"),
            greatest(col("w"), col("t")).cast("long").as("est_weight"))
    }
  }

  /** Stratified sampling: first 5 docs per language by md5 order — equal
    * per-stratum quotas with a deterministic, content-keyed order (one
    * shuffle on the stratum, WindowGroupLimit-bounded). */
  val sampleStratified = QuerySpec(
    "q_sample_stratified",
    """SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
       FROM (SELECT doc_id, lang,
                    ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY md5(text), doc_id) AS rnk
             FROM documents) t
       WHERE rnk <= 5""") {
    (s, d) =>
      docs(s, d)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lang")
            .orderBy(md5(col("text")), col("doc_id")))
          .cast("long"))
        .filter(col("rnk") <= 5)
        .select("doc_id", "lang", "rnk")
  }

  /** Vocabulary building (tokenizer-training prep): corpus-wide token
    * frequencies, top-20 with deterministic tie-break — explode + one
    * count shuffle + bounded top-k. */
  val vocabTop = QuerySpec(
    "q_vocab_top",
    """WITH tok AS (SELECT u.token FROM documents, UNNEST(str_split(text, ' ')) AS u(token)),
       cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY 1)
       SELECT token, n, CAST(rnk AS BIGINT) AS rnk
       FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk FROM cnt) t
       WHERE rnk <= 20""") {
    (s, d) =>
      docs(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("token")))
          .cast("long"))
        .filter(col("rnk") <= 20)
        .select("token", "n", "rnk")
  }

  /** Fixed-point PageRank over the near-dup candidate graph — the
    * centrality pass a curation pipeline runs to pick REPRESENTATIVE
    * documents out of duplicate neighborhoods (a high-rank doc is near-dup
    * to many others; its cluster is boilerplate-heavy). Nodes are the docs
    * appearing in [[minhashCandShared]] pairs, edges symmetrized, damping
    * 0.85, exactly 3 iterations.
    *
    * All arithmetic is INTEGER fixed-point (rank scaled by 10¹²,
    * contributions via integral division) — the reproducibility trick
    * production graph engines use, and what lets the oracle unroll the
    * identical iterations in SQL with bit-equal results (double-valued PR
    * sums would diverge across engines by addition order).
    *
    * Scale shape per iteration: one equi-join of edges to ranks on src
    * (co-partitioned across iterations — the exchange on src is reused),
    * one shuffle on dst for the partial-aggregated contribution sum. No
    * driver-side state: N rides along as a broadcast one-row table. The
    * candidate graph is the LSH output, so edge count is bounded by the
    * banding design, not N². */
  /** The shared synchronous PageRank loop — one implementation behind
    * [[pagerank]] (uniform teleport) and [[GraphOps.pprSeed]] (teleport
    * confined to a seed predicate), so the round discipline (degree
    * pre-joined onto the once-checkpointed edge table, one rank-onto-
    * edges equi-join + one partial-aggregated contribution shuffle per
    * round, rank table checkpointed per round) is maintained in exactly
    * one place. `seedFilter = None` gives every node teleport mass
    * scale/|V|; `Some(pred)` gives scale/|seeds| to matching nodes and
    * zero elsewhere. Integer arithmetic throughout — the SQL oracles
    * unroll the identical rounds bit-equally. */
  private[graft] def pagerankRounds(
      edgesIn: DataFrame, seedFilter: Option[org.apache.spark.sql.Column],
      rounds: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    val deg = edgesIn.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = edgesIn.join(deg, "src").localCheckpoint()
    val nodes = edgesDeg.select(col("src").as("doc_id")).distinct()
      .localCheckpoint()
    val seedNodes = seedFilter.fold(nodes)(f => nodes.filter(f))
    // loud, engine-SYMMETRIC failure on an empty seed set: `scale div n`
    // with n=0 is silently NULL on Spark but a division-by-zero ERROR in
    // the DuckDB oracle — the same degenerate input must fail identically
    // on both engines (the ssspWithRounds maxRounds-guard convention).
    // One bounded action against the already-checkpointed node table.
    seedFilter.foreach { _ =>
      require(seedNodes.limit(1).count() > 0,
        "pagerankRounds: seed filter matches no node — teleport mass undefined")
    }
    val cnt = broadcast(seedNodes.agg(count(lit(1)).as("n")))
    val base = nodes.crossJoin(cnt)
      .select(col("doc_id"),
        seedFilter.fold(expr(s"$scale div n"))(f =>
          when(f, expr(s"$scale div n")).otherwise(0L)).as("tele"))
    var pr = base.select(col("doc_id"), col("tele").as("pr"))
    for (i <- 1 to rounds) {
      val next = pagerankRound(edgesDeg, base, pr)
      pr = if (i < rounds) next.localCheckpoint() else next
    }
    pr
  }

  /** ONE synchronous PageRank round — contribution shuffle + damped
    * teleport update — factored as a named, fingerprint-gatable unit
    * (q_builder_pagerank_round; see [[ccRound]] for why loop rounds
    * need their own gate entries). */
  private[graft] def pagerankRound(
      edgesDeg: DataFrame, base: DataFrame, pr: DataFrame): DataFrame = {
    val contrib = edgesDeg
      .join(pr.toDF("src", "pr"), "src")
      .groupBy(col("dst").as("doc_id"))
      .agg(sum(expr("pr div deg")).as("contrib"))
    base
      .join(contrib, Seq("doc_id"), "left")
      .select(col("doc_id"),
        expr("(15 * tele) div 100 + (85 * coalesce(contrib, 0)) div 100")
          .as("pr"))
  }

  val pagerank = {
    val Scale = 1000000000000L  // 10^12 — integer rank units
    def iterSql(i: Int): String = {
      val prev = s"pr${i - 1}"
      s"""ct$i AS (SELECT e.dst AS doc_id, CAST(SUM(p.pr // d.deg) AS BIGINT) AS contrib
                   FROM edges e JOIN $prev p ON p.doc_id = e.src
                                JOIN deg d ON d.src = e.src
                   GROUP BY 1),
          pr$i AS (SELECT nodes.doc_id,
                          (15 * ($Scale // nn.n)) // 100
                            + (85 * COALESCE(ct$i.contrib, 0)) // 100 AS pr
                   FROM nodes CROSS JOIN nn
                   LEFT JOIN ct$i ON ct$i.doc_id = nodes.doc_id)"""
    }
    QuerySpec(
      "q_pagerank",
      s"""WITH ${shingleSql(3)},
          $minhashCandSql,
          edges AS (SELECT a_id AS src, b_id AS dst FROM cand
                    UNION ALL SELECT b_id, a_id FROM cand),
          nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
          nn AS (SELECT COUNT(*) AS n FROM nodes),
          deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
          pr0 AS (SELECT doc_id, $Scale // nn.n AS pr FROM nodes CROSS JOIN nn),
          ${(1 to 3).map(iterSql).mkString(",\n")}
          SELECT doc_id, pr FROM pr3""") {
      (s, d) =>
        val cand = minhashCandShared(s, d)
        // The graph invariants (edges with degree attached, node set) are
        // tiny relative to the corpus — the LSH banding bounds them — and
        // every iteration re-reads them; pagerankRounds materializes them
        // once with lineage truncated back to the cached candidate table,
        // and checkpoints the rank table per round (the GraphX/Pregel
        // pattern; dedupComponents does the same).
        val edges = cand.select(col("a_id").as("src"), col("b_id").as("dst"))
          .unionByName(cand.select(col("b_id").as("src"), col("a_id").as("dst")))
        pagerankRounds(edges, None)
    }
  }

  /** Triangle census of the near-dup candidate graph: triangle count,
    * wedge (open-triple) count, and the global clustering coefficient
    * 3·Δ/wedges — the structural health check a dedup pipeline reads
    * before trusting connected components (a clustering coefficient near 1
    * means candidate neighborhoods are genuine duplicate cliques; near 0
    * means the LSH bands are chaining unrelated docs and the component
    * pass will over-merge).
    *
    * The classic distributed formulation: edges kept in canonical a<b
    * orientation, triangles enumerated as two hash joins (wedge build on
    * the middle vertex, then a closing-edge equi-join on BOTH endpoints) —
    * never an all-pairs product, and every join key is an edge endpoint,
    * so it partitions on vertex id at any scale. Wedges are
    * Σ deg·(deg−1)/2 over the symmetrized degree table — pure integer
    * arithmetic, so the coefficient's single division is the only double
    * op and both engines round it identically. */
  val triangleCount = QuerySpec(
    "q_triangle_count",
    s"""WITH ${shingleSql(3)},
        $minhashCandSql,
        tri AS (SELECT count(*) AS n_triangles
                FROM cand e1
                JOIN cand e2 ON e2.a_id = e1.b_id
                JOIN cand e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
        deg AS (SELECT v, count(*) AS dg FROM (
                  SELECT a_id AS v FROM cand
                  UNION ALL SELECT b_id FROM cand) e GROUP BY 1),
        wdg AS (SELECT COALESCE(SUM(dg * (dg - 1) // 2), 0) AS n_wedges FROM deg)
        SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
               CAST(n_wedges AS BIGINT) AS n_wedges,
               CASE WHEN n_wedges > 0
                    THEN 3.0 * n_triangles / CAST(n_wedges AS DOUBLE)
                    ELSE 0.0 END AS clustering_coeff
        FROM tri CROSS JOIN wdg""") {
    (s, d) =>
      val cand = minhashCandShared(s, d)
      val e1 = cand.toDF("a", "b")
      val e2 = cand.toDF("b", "c")
      val e3 = cand.toDF("a", "c")
      val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = cand.select(col("a_id").as("v"))
        .unionByName(cand.select(col("b_id").as("v")))
        .groupBy("v").agg(count(lit(1)).as("dg"))
      val wdg = deg.agg(coalesce(sum(expr("dg * (dg - 1) div 2")), lit(0L)).as("n_wedges"))
      tri.crossJoin(wdg)
        .select(col("n_triangles").cast("long").as("n_triangles"),
          col("n_wedges").cast("long").as("n_wedges"),
          when(col("n_wedges") > 0,
            lit(3.0) * col("n_triangles") / col("n_wedges").cast("double"))
            .otherwise(0.0).as("clustering_coeff"))
  }

  /** Label-propagation communities (sync LPA, 3 rounds, deterministic
    * ties) over the near-dup candidate graph — the refinement pass between
    * connected components and canonical-doc selection. CC merges ANY
    * connected region, so LSH band chains (A~B~C with A≁C) over-merge
    * into one cluster; LPA labels need majority neighbor support to
    * spread, so chain artifacts split at their weak links while genuine
    * duplicate cliques converge to one label. Reading both
    * ([[dedupComponents]] vs this) tells the pipeline which clusters are
    * trustworthy as-is and which need the pairwise verify pass.
    *
    * Determinism: synchronous rounds, fixed at 3; a node adopts the
    * neighbor label with the highest count, ties broken by SMALLEST
    * label — a total order, so both engines converge identically (the
    * async/random-tie LPA of the original paper is deliberately NOT
    * reproducible; fixed sweeps with ordered ties are the standard
    * determinism fix, same trade GraphFrames' Pregel form makes).
    *
    * Scale shape per round (the Pregel pattern, like [[pagerank]]): one
    * equi-join of the label table onto edges keyed on the neighbor
    * endpoint, one (node, label) count shuffle with map-side partial
    * aggregation, then a per-node WindowGroupLimit whose width is bounded
    * by the node's DEGREE (LSH banding bounds that, independent of corpus
    * size). The label table is |nodes| rows and checkpoints each round,
    * so every round's physical plan stays two shuffles deep. */
  val communitiesLpa = {
    def iterSql(i: Int): String =
      s"""ct$i AS (SELECT e.src AS doc_id, p.lbl, count(*) AS c
                   FROM edges e JOIN lb${i - 1} p ON p.doc_id = e.dst
                   GROUP BY 1, 2),
          lb$i AS (SELECT doc_id, lbl FROM (
                     SELECT doc_id, lbl,
                            ROW_NUMBER() OVER (PARTITION BY doc_id
                                               ORDER BY c DESC, lbl) AS rn
                     FROM ct$i) t
                   WHERE rn = 1)"""
    QuerySpec(
      "q_communities_lpa",
      s"""WITH ${shingleSql(3)},
          $minhashCandSql,
          edges AS (SELECT a_id AS src, b_id AS dst FROM cand
                    UNION ALL SELECT b_id, a_id FROM cand),
          nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
          lb0 AS (SELECT doc_id, doc_id AS lbl FROM nodes),
          ${(1 to 3).map(iterSql).mkString(",\n")},
          sz AS (SELECT lbl, count(*) AS n_members FROM lb3 GROUP BY 1)
          SELECT lb3.doc_id, lb3.lbl AS community, sz.n_members
          FROM lb3 JOIN sz ON sz.lbl = lb3.lbl""") {
      (s, d) =>
        val cand = minhashCandShared(s, d)
        val edges = cand.select(col("a_id").as("src"), col("b_id").as("dst"))
          .unionByName(cand.select(col("b_id").as("src"), col("a_id").as("dst")))
        val lb = lpaLabels(edges)
        val sz = lb.groupBy("lbl").agg(count(lit(1)).as("n_members"))
        lb.join(sz, "lbl")
          .select(col("doc_id"), col("lbl").as("community"), col("n_members"))
    }
  }

  /** The LPA loop itself, on any SYMMETRIZED (src, dst) edge frame —
    * exposed private[graft] so TextDedupSpec can prove the semantic
    * invariants directly on synthetic topologies (a bridge between two
    * cliques splits; communities always refine connected components,
    * since a label can only travel along edges and therefore never leaves
    * the component it originated in). Returns (doc_id, lbl). */
  private[graft] def lpaLabels(edges0: DataFrame, rounds: Int = 3): DataFrame = {
    val edges = edges0.localCheckpoint()
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    var lb = nodes.select(col("doc_id"), col("doc_id").as("lbl"))
    for (i <- 1 to rounds) {
      val ct = edges
        .join(lb.toDF("dst", "lbl"), "dst")
        .groupBy("src", "lbl").agg(count(lit(1)).as("c"))
      val next = ct
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("src").orderBy(col("c").desc, col("lbl"))))
        .filter(col("rn") === 1)
        .select(col("src").as("doc_id"), col("lbl"))
      lb = if (i < rounds) next.localCheckpoint() else next
    }
    lb
  }

  /** Per-doc 3-gram novelty: the share of a document's distinct word
    * 3-grams that appear NOWHERE else in the corpus — the
    * memorization/diversity audit a pretraining pipeline runs on top of
    * dedup (a corpus whose novelty mass collapses is template spam even
    * when no pair crosses the near-dup threshold; an eval set whose
    * novelty is LOW against the training corpus is contaminated). Kept
    * integer: novelty_m = n_novel·10⁶ div n_grams.
    *
    * Scale shape: the UNcapped distinct gram stream ([[shingledRaw]] —
    * the df cap would drop exactly the non-novel evidence) feeds one
    * map-side-partial df count, then the df attaches back by an equi-join
    * keyed on the gram — the standard posting pass, 1:1 fan-out per row
    * (a hot gram has many rows but each gains one count), AQE skew-split
    * covers pathological keys. Docs with <3 words carry no gram evidence
    * and drop. */
  val textNovelty = QuerySpec(
    "q_text_novelty",
    """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
       sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
               FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS u(i)),
       dfs AS (SELECT shingle, count(*) AS df FROM sh0 GROUP BY 1)
       SELECT doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
              CAST(sum(CASE WHEN dfs.df = 1 THEN 1 ELSE 0 END) * 1000000 // count(*)
                   AS BIGINT) AS novelty_m
       FROM sh0 JOIN dfs ON dfs.shingle = sh0.shingle
       GROUP BY 1""") {
    (s, d) =>
      val raw = graft.ops.Caches.lease(shingledRaw(s, d, 3))
      val dfs = raw.groupBy("shingle").agg(count(lit(1)).as("df"))
      raw.join(dfs, Seq("shingle"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty_m", expr("n_novel * 1000000 div n_grams"))
  }

  /** Zipf/coverage profile of the full vocabulary: every token type ranked
    * by frequency with its CUMULATIVE corpus share — the curve a tokenizer
    * design reads off ("how many types cover 95% of tokens" sets the vocab
    * size; a too-flat head is a data-quality smell). Counting shuffles
    * once on token (map-side partial agg); ranking then runs on the
    * aggregated TYPE table, orders of magnitude smaller than the corpus.
    * The cumulative sum goes through [[graft.ops.Scale.prefixSum]]'s
    * two-phase scan and the rank through [[graft.ops.Scale.distributedRank]]'s
    * range-partitioned form (both bit-identical to their single-window
    * equivalents for this total order), so NO step serializes the type
    * table onto one task — a 10⁹-type web vocabulary ranks at full
    * parallelism; the only single-task windows see per-partition counts
    * and per-bucket totals (metadata-sized by construction). */
  val vocabZipf = QuerySpec(
    "q_vocab_zipf",
    """WITH tok AS (SELECT u.token FROM documents, UNNEST(str_split(text, ' ')) AS u(token)),
       cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
       rk AS (SELECT token, n,
                     CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rnk
              FROM cnt),
       tot AS (SELECT SUM(n) AS total FROM cnt)
       SELECT token, n, rnk,
              CAST(SUM(n) OVER (ORDER BY rnk) AS BIGINT) AS cum_n,
              CAST(SUM(n) OVER (ORDER BY rnk) AS BIGINT) * 1.0 / tot.total AS cum_share
       FROM rk, tot""") {
    (s, d) =>
      val cnt = docs(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      // (n desc, token) is a total order over the type table, so the
      // range-partitioned rank is bit-identical to the single-task window
      // — without ever serializing the vocabulary through one task
      val ranked = graft.ops.Scale.distributedRank(
        cnt, Seq(graft.ops.Scale.SortKey("n", desc = true), graft.ops.Scale.SortKey("token")),
        parts = 16, outCol = "rnk")
      val total = cnt.agg(sum(col("n")).as("total"))
      graft.ops.Scale.prefixSum(ranked, Seq.empty, "rnk", "n",
          bucket = expr("rnk div 8"), outCol = "cum_n")
        .crossJoin(broadcast(total))
        .select(col("token"), col("n"), col("rnk"), col("cum_n"),
          (col("cum_n") * lit(1.0) / col("total")).as("cum_share"))
  }

  /** The composed curation pass — what a training-data pipeline actually
    * runs per shard: quality gate (token count, alpha ratio, stopword
    * ratio) ∧ exact-dedup canonicality (min doc_id per normalized
    * fingerprint, via a window min — one shuffle) → keep decision.
    * Single scan of documents; every signal from the ops above. */
  val curationPipeline = QuerySpec(
    "q_curation_pipeline",
    s"""WITH m AS (
          SELECT doc_id, $normFingerprintSql AS fp,
                CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) * 1.0
                  / nullif(CAST(length(text) AS BIGINT), 0) AS alpha_ratio,
                CAST(len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to|in|is)\\b')) AS BIGINT) * 1.0
                  / nullif(CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT), 0) AS stop_ratio
         FROM documents),
       c AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id FROM m)
       SELECT doc_id, fp, n_tokens,
              (n_tokens >= 10 AND alpha_ratio >= 0.5 AND stop_ratio <= 0.5) AS quality_ok,
              (doc_id = canonical_id) AS is_canonical,
              (n_tokens >= 10 AND alpha_ratio >= 0.5 AND stop_ratio <= 0.5
                 AND doc_id = canonical_id) AS keep
       FROM c""") {
    (s, d) =>
      val nTok = size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long")
      val m = docs(s, d).select(
        col("doc_id"),
        normFingerprint.as("fp"),
        nTok.as("n_tokens"),
        (size(expr("regexp_extract_all(text, '[A-Za-z]', 0)")).cast("long") * lit(1.0)
          / nonZero(length(col("text")).cast("long"))).as("alpha_ratio"),
        (size(expr("regexp_extract_all(lower(text), '\\\\b(the|a|of|and|to|in|is)\\\\b', 0)"))
          .cast("long") * lit(1.0) / nonZero(nTok)).as("stop_ratio"))
      val c = m.withColumn("canonical_id",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      val quality = col("n_tokens") >= 10 && col("alpha_ratio") >= 0.5 && col("stop_ratio") <= 0.5
      c.select(
        col("doc_id"), col("fp"), col("n_tokens"),
        quality.as("quality_ok"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"),
        (quality && col("doc_id") === col("canonical_id")).as("keep"))
  }

  /** Inverted-index shard: word-BIGRAM → document frequency, total term
    * frequency, and the first-10 posting list — the retrieval-side index
    * built next to a training corpus (dedup forensics, contamination
    * lookups, BM25 prep). Bigrams rather than unigrams because the
    * synthetic corpus has only ~31 word types; the bigram key space (~900)
    * exercises a real df distribution. Postings are the SORTED distinct
    * doc_ids truncated to 10 and comma-joined — deterministic, and the
    * truncation is the posting-list paging a real index does anyway.
    *
    * Scale: one explode + one groupBy on the bigram key (near-uniform —
    * hot boilerplate bigrams would need the df-cap treatment of
    * [[shingled]], which this table's df profile doesn't require);
    * collect_set is bounded per key by the distinct-doc count, and the
    * emitted slice is constant-size. */
  val invertedIndex = QuerySpec(
    "q_inverted_index",
    """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
       bg AS (SELECT doc_id, array_to_string(ws[zzi:zzi+1], ' ') AS bigram
              FROM w, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(zzi))
       SELECT bigram,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
              CAST(count(*) AS BIGINT) AS tf,
              array_to_string(list_transform(list_sort(list(DISTINCT doc_id))[1:10],
                                             zzq -> CAST(zzq AS VARCHAR)), ',') AS postings
       FROM bg GROUP BY 1""") {
    (s, d) =>
      graft.ops.Scale.fanOutScan(docs(s, d).select("doc_id", "text"), col("doc_id"))
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(ws) >= 2
             THEN transform(sequence(1, size(ws) - 1), zzi -> concat_ws(' ', slice(ws, zzi, 2)))
             ELSE array() END""")).as("bigram"))
        .groupBy("bigram")
        .agg(
          countDistinct("doc_id").as("df"),
          count(lit(1)).as("tf"),
          expr("concat_ws(',', transform(slice(array_sort(collect_set(doc_id)), 1, 10), " +
            "zzq -> CAST(zzq AS STRING)))").as("postings"))
  }

  /** Degree distribution of the near-dup candidate graph — the first
    * structural read on LSH output (a heavy right tail means a band is
    * chaining unrelated docs; [[triangleCount]] then tells whether tails
    * are cliques or stars). Computed entirely on the candidate table the
    * session already materialized: one fan-out to directed edges, a
    * per-node count, and a count-of-counts — every stage keys on
    * near-unique ids, nothing touches document text. */
  val degreeDist = QuerySpec(
    "q_degree_dist",
    s"""WITH ${shingleSql(3)},
        $minhashCandSql,
        ends AS (SELECT a_id AS doc_id FROM cand UNION ALL SELECT b_id FROM cand),
        deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM ends GROUP BY 1)
        SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY 1""") {
    (s, d) =>
      val cand = minhashCandShared(s, d)
      cand.select(col("a_id").as("doc_id"))
        .unionByName(cand.select(col("b_id").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** Asymmetric CONTAINMENT over LSH candidates: |A∩B| against EACH side's
    * own size — the "is A a subset-duplicate of B" detector (quote
    * inclusion, boilerplate wrapping, doc-in-doc). Jaccard misses these:
    * a tweet embedded in an article has tiny J but containment ≈ 1 on the
    * tweet's side. Same candidate-linear intersection as
    * [[dedupLshVerified]]; the verdict is the integer test
    * 4·|∩| ≥ 3·min(|A|,|B|) (containment ≥ 0.75 on the smaller side),
    * with both directed ratios emitted. */
  val dedupContainment = QuerySpec(
    "q_dedup_containment",
    s"""WITH ${shingleSql(3)},
        $minhashCandSql,
        sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
          SELECT c.a_id, c.b_id, count(*) AS inter
          FROM cand c
          JOIN sh a ON a.doc_id = c.a_id
          JOIN sh b ON b.doc_id = c.b_id AND b.shingle = a.shingle
          GROUP BY 1, 2)
        SELECT i.a_id, i.b_id, i.inter, za.n AS n_a, zb.n AS n_b,
               CAST(i.inter AS DOUBLE) / za.n AS containment_in_b,
               CAST(i.inter AS DOUBLE) / zb.n AS containment_in_a
        FROM inter i
        JOIN sz za ON za.doc_id = i.a_id
        JOIN sz zb ON zb.doc_id = i.b_id
        WHERE 4 * i.inter >= 3 * least(za.n, zb.n)""") {
    (s, d) =>
      val sh = shingled(s, d, 3)
      val cand = minhashCandShared(s, d)
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      cand
        .join(sh.toDF("a_id", "shingle"), "a_id")
        .join(sh.toDF("b_id", "shingle"), Seq("b_id", "shingle"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
        .join(sz.toDF("a_id", "n_a"), "a_id")
        .join(sz.toDF("b_id", "n_b"), "b_id")
        .filter(lit(4) * col("inter") >= lit(3) * least(col("n_a"), col("n_b")))
        .select(col("a_id"), col("b_id"), col("inter"), col("n_a"), col("n_b"),
          (col("inter").cast("double") / col("n_a")).as("containment_in_b"),
          (col("inter").cast("double") / col("n_b")).as("containment_in_a"))
  }

  /** EXACT set-similarity self-join (J ≥ 0.5 on 3-gram sets) via PPJoin
    * prefix filtering (Xiao et al., WWW'08; Chaudhuri et al., ICDE'06
    * ssjoin) — the deterministic complement to MinHash-LSH: LSH trades
    * recall for speed probabilistically; prefix filtering gets the SAME
    * candidate-pruning effect with a PROOF of completeness. Tokens are
    * globally ordered rarest-first (df asc); a set of size n keeps only
    * its first p = n − ⌈n/2⌉ + 1 tokens as join keys; two sets with
    * J ≥ 0.5 provably share a prefix token, so the equi-join on prefix
    * tokens finds every qualifying pair and the exact integer test
    * 3·|∩| ≥ |A|+|B| (⇔ J ≥ 1/2) filters the rest.
    *
    * The oracle is the ALL-PAIRS exact join — same result by the
    * quadratic algorithm, so the hash-match IS the completeness proof
    * (the q_edit1_neighbors pattern at set granularity).
    *
    * Scale shape: the prefix join keys on the RAREST tokens per set —
    * skew-light by construction (a token of df f contributes ≤f² prefix
    * pairs, and high-df tokens never enter prefixes of large sets);
    * verification is candidate-linear AND candidate-1:1 — each side of a
    * candidate joins ONE per-doc sorted gram array (carrying a doc's
    * distinct grams in a row is O(doc length), the same as the text
    * column itself), the size filter 3·min(n_a,n_b) ≥ n_a+n_b (implied
    * by J ≥ 1/2 since |∩| ≤ min) prunes before any intersection, and
    * the surviving rows compute |∩| with a single codegen
    * `array_intersect` — never the posting-join explosion that would
    * materialize candidates × doc-length rows. The O(n²) product exists
    * only oracle-side. No df cap anywhere: unlike [[dedupJaccard]]'s
    * capped stream, exactness here is unconditional. */
  val dedupPpjoin = QuerySpec(
    "q_dedup_ppjoin",
    s"""WITH ${shingleSql(3)},
        sz AS (SELECT doc_id, count(*) AS n FROM sh0 GROUP BY 1),
        pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
               FROM sh0 a JOIN sh0 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
        SELECT pr.a_id, pr.b_id, CAST(pr.inter AS BIGINT) AS inter,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
        FROM pr JOIN sz sa ON sa.doc_id = pr.a_id
                JOIN sz sb ON sb.doc_id = pr.b_id
        WHERE 3 * pr.inter >= sa.n + sb.n""") {
    (s, d) =>
      val raw = graft.ops.Caches.lease(shingledRaw(s, d, 3))
      val dfreq = raw.groupBy("shingle").agg(count(lit(1)).as("df"))
      // EXACT integer dictionary: rank every distinct gram by the global
      // rarest-first order (df asc, gram asc) with the gated parallel
      // ranker — rid is a bijection, so ordering by rid IS ordering by
      // (df, gram) and |∩| over rid arrays IS |∩| over gram arrays. From
      // here every join key, window sort key, and verify array is an
      // int64 instead of a ~30-byte string: at the 100× diagnostic tier
      // the verify's sort-merge join was sorting ~15 GB of string arrays
      // through ~100 GB of spill — the dictionary cuts the sorted bytes
      // ~4× and the whole pipeline's shuffle with it. (The q_edit1
      // lesson — 8-byte keys — but via an exact rank, not a hash: a
      // hash collision would merge two grams and break exactness.)
      val dict = graft.ops.Scale.distributedRank(
        dfreq, Seq(graft.ops.Scale.SortKey("df"), graft.ops.Scale.SortKey("shingle")),
        32, "rid").select("shingle", "rid")
      // the rid stream feeds BOTH the prefix window and the verify
      // arrays: checkpoint it once (the minhashCandShared convention —
      // under cache() the dictionary build's lineage would inline into
      // every consumer branch and the plan gate would read ~5× the real
      // shuffle count), blocks query-local via leaseRdd
      val (rawR, rawRBlocks) = localCheckpointTracked(
        raw.join(dict, "shingle").select("doc_id", "rid"))
      rawRBlocks.foreach(graft.ops.Caches.leaseRdd)
      // per-doc position under the global rarest-first order; the prefix
      // keeps p = n - ceil(n/2) + 1 tokens (tau = 0.5), and each prefix
      // row CARRIES (pos, n) so the candidate join can apply the exact
      // length and positional prunes before anything wide moves
      val pref = rawR
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy(col("rid"))))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
        .filter(col("pos") <= expr("n - ((n + 1) div 2) + 1"))
        .select("doc_id", "rid", "pos", "n")
      // the OTHER two PPJoin prunes (both exactness-preserving), applied
      // per matching occurrence BEFORE the distinct so far-length /
      // far-position candidates never reach the array-carrying verify —
      // at the 100× tier the verify shuffle (two O(doc-len) gram arrays
      // per candidate) was the family's wall, and most of it was pairs
      // these filters reject from two integers:
      //   length: J ≥ 1/2 ⇒ |∩| ≥ (n_a+n_b)/3 and |∩| ≤ min ⇒
      //           3·min(n_a,n_b) ≥ n_a+n_b;
      //   positional (Xiao et al.): both docs order tokens by the SAME
      //           global rarest-first key, so for a shared token at
      //           (pa, pb): common-after ≤ min(n_a−pa, n_b−pb) and
      //           common-before ≤ min(pa−1, pb−1), hence
      //           |∩| ≤ 1 + min(pa−1, pb−1) + min(n_a−pa, n_b−pb).
      // Completeness: a qualifying pair shares ≥1 prefix token (prefix
      // theorem), and at that occurrence the positional bound ≥ the true
      // |∩|, so the occurrence survives and the distinct keeps the pair.
      val cand = pref.toDF("a_id", "rid", "pa", "na")
        .join(pref.toDF("b_id", "rid", "pb", "nb"), "rid")
        .filter(col("a_id") < col("b_id")
          && lit(3) * least(col("na"), col("nb")) >= col("na") + col("nb")
          && lit(3) * (lit(1) + least(col("pa") - 1, col("pb") - 1)
               + least(col("na") - col("pa"), col("nb") - col("pb")))
             >= col("na") + col("nb"))
        .select("a_id", "b_id")
        .distinct()
      // one sorted rid array per doc: verification joins are 1:1 per
      // candidate side, the implied size filter prunes pre-intersect
      val docArr = graft.ops.Caches.lease(
        rawR.groupBy("doc_id").agg(
          sort_array(collect_list(col("rid"))).as("gs"),
          count(lit(1)).as("n")))
      cand
        .join(docArr.select(col("doc_id").as("a_id"),
          col("gs").as("ga"), col("n").as("n_a")), "a_id")
        .join(docArr.select(col("doc_id").as("b_id"),
          col("gs").as("gb"), col("n").as("n_b")), "b_id")
        .filter(col("n_a") + col("n_b") <= lit(3) * least(col("n_a"), col("n_b")))
        .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
        .filter(lit(3) * col("inter") >= col("n_a") + col("n_b"))
        .select(col("a_id"), col("b_id"), col("inter"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"))
  }

  // -------------------------------------------------------------------
  // Truncation duplicates (strict document-prefix pairs)
  // -------------------------------------------------------------------

  /** Truncation-duplicate detection: pairs where one document is a strict
    * PREFIX of the other (or byte-equal) — the crawl pathology near-dup
    * thresholds can miss (a 10% teaser of a long article has Jaccard ≈
    * 0.1 against it, yet is pure redundancy for training). Candidates
    * block on the first-10-word fingerprint — a prefix pair MUST agree
    * there — then verify with one startswith on the shorter against the
    * longer.
    *
    * Completeness: exact for corpora whose min doc length ≥ the
    * fingerprint width (this corpus' floor is exactly 10 words; pinned
    * in TextDedupSpec). Shorter docs would need the standard multi-k
    * extension — each doc also emits its full-text key at k = n_words
    * < 10, a ≤2× key blowup — same plan shape.
    *
    * Scale shape: one equi-join on the fingerprint (bucketed, never
    * all-pairs; a hot template head is a skewed key — AQE skew-split
    * handles it, and the verify is per-candidate). Output is canonical
    * a_id < b_id with the SHORTER doc first within the pair columns. */
  val dedupPrefix = QuerySpec(
    "q_dedup_prefix",
    """WITH w AS (SELECT doc_id, text, length(text) AS n FROM documents),
       f AS (SELECT doc_id, text, n,
                    array_to_string(str_split(text, ' ')[1:10], ' ') AS fp
             FROM w)
       SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              CAST(least(a.n, b.n) AS BIGINT) AS short_chars,
              CAST(greatest(a.n, b.n) AS BIGINT) AS long_chars,
              CAST(CASE WHEN a.n = b.n THEN 1 ELSE 0 END AS BIGINT) AS is_equal
       FROM f a JOIN f b
         ON a.fp = b.fp AND a.doc_id < b.doc_id
        AND starts_with(CASE WHEN a.n >= b.n THEN a.text ELSE b.text END,
                        CASE WHEN a.n >= b.n THEN b.text ELSE a.text END)""") {
    (s, d) =>
      val f = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), length(col("text")).as("n"),
          array_join(expr("slice(split(text, ' '), 1, 10)"), " ").as("fp"))
      val a = f.select(col("doc_id").as("a_id"), col("text").as("a_text"),
        col("n").as("a_n"), col("fp"))
      val b = f.select(col("doc_id").as("b_id"), col("text").as("b_text"),
        col("n").as("b_n"), col("fp"))
      a.join(b, Seq("fp"))
        .filter(col("a_id") < col("b_id"))
        .filter(expr(
          """startswith(CASE WHEN a_n >= b_n THEN a_text ELSE b_text END,
            |           CASE WHEN a_n >= b_n THEN b_text ELSE a_text END)""".stripMargin))
        .select(col("a_id"), col("b_id"),
          least(col("a_n"), col("b_n")).cast("long").as("short_chars"),
          greatest(col("a_n"), col("b_n")).cast("long").as("long_chars"),
          when(col("a_n") === col("b_n"), 1L).otherwise(0L).as("is_equal"))
  }

  val specs: Seq[QuerySpec] = Seq(
    textStats, langId, langIdEval, ngramProfile, fingerprint, invertedIndex, degreeDist,
    dedupContainment,
    dedupExact, dedupJaccard, dedupSubstring, dedupMinhashLsh, dedupMinhashEstimate,
    dedupLshVerified, dedupWeightedJaccard, dedupLshRecall,
    dedupSimhash, dedupSimhashHamming, dedupComponents, dedupKeep, dedupKeepBest,
    dedupIncremental,
    dedupIncrementalLsh, dedupAdversarialBucket,
    curationPipeline, sampleDeterministic, samplePriority, sampleStratified,
    vocabTop, vocabZipf,
    pagerank, triangleCount, communitiesLpa, textNovelty, dedupPpjoin, dedupPrefix)
}
