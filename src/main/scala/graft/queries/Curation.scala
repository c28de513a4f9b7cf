package graft.queries

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 training-data curation operators: the passes a 100 TB pretraining
  * pipeline runs BETWEEN dedup and tokenization — benchmark decontamination,
  * in-document repetition filters (the Gopher-style quality gates), PII
  * redaction, mixture-weighted sampling, concat-and-chunk sequence packing,
  * KMV cardinality sketching and TF-IDF keyword extraction — plus a
  * random-projection dimensionality reduction over the embeddings table.
  *
  * All pure `org.apache.spark.sql.functions` plans (no UDFs, everything
  * inside whole-stage codegen). Cross-engine determinism follows the
  * TextDedup playbook: integer counts, single-division ratios of identical
  * integers, md5-derived hashes, and sequential `aggregate` folds whose
  * order coincides with DuckDB `list_reduce`.
  */
object Curation {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private def nonZero(c: Column): Column = when(c =!= 0, c)

  // -------------------------------------------------------------------
  // Benchmark decontamination
  // -------------------------------------------------------------------

  /** Decontamination: flag training docs sharing word-5-gram content with a
    * held-out eval set (doc_id ≡ 0 mod 20 stands in for the benchmark).
    * The scale shape is the one that matters at 100 TB: eval benchmarks are
    * tiny versus the corpus, so the distinct eval-gram set is BROADCAST and
    * the corpus-side join is map-side — the corpus never shuffles on the
    * n-gram. Reuses the df-capped shingle stream ([[TextDedup.shingled]]):
    * boilerplate grams carry no contamination signal, same as dedup. */
  val decontaminate = QuerySpec(
    "q_decontaminate",
    s"""WITH ${TextDedup.shingleSql(5)},
        ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
        tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0)
        SELECT tr.doc_id, count(*) AS n_overlap
        FROM tr JOIN ev ON tr.shingle = ev.shingle
        GROUP BY 1""") {
    (s, d) =>
      val sh = TextDedup.shingled(s, d, 5).cache()
      val evalGrams = sh.filter(col("doc_id") % 20 === 0).select("shingle").distinct()
      val train = sh.filter(col("doc_id") % 20 =!= 0)
      // sh is (doc_id, shingle)-distinct, so count(*) == distinct overlap
      train.join(broadcast(evalGrams), Seq("shingle"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
  }

  // -------------------------------------------------------------------
  // Repetition quality filters (Gopher-style)
  // -------------------------------------------------------------------

  /** In-document repetition signals: duplicate-word fraction and
    * top-bigram fraction — the "remove pathologically repetitive docs"
    * gate every pretraining corpus applies. Per-doc word stats come from
    * per-row array functions (no shuffle); the top-bigram count is one
    * explode + (doc_id, bigram) count + per-doc max — keyed on doc_id, so
    * it partitions perfectly at any scale. */
  val textRepetition = QuerySpec(
    "q_text_repetition",
    """WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
       base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
                       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
                FROM w),
       bg AS (SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS bigram
              FROM w, UNNEST(generate_series(1, greatest(len(ws) - 1, 0))) AS u(i)),
       bn AS (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2),
       tp AS (SELECT doc_id, max(n) AS top_bigram_n FROM bn GROUP BY 1)
       SELECT base.doc_id, n_words, n_distinct,
              1.0 - n_distinct * 1.0 / n_words AS dup_word_ratio,
              CAST(top_bigram_n AS BIGINT) AS top_bigram_n,
              top_bigram_n * 1.0 / nullif(n_words - 1, 0) AS top_bigram_frac
       FROM base JOIN tp ON base.doc_id = tp.doc_id""") {
    (s, d) =>
      val w = docs(s, d).select(col("doc_id"), split(col("text"), " ").as("ws"))
      val base = w.select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"))
      val top = w.select(col("doc_id"), explode(expr(
          """CASE WHEN size(ws) >= 2
             THEN transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', slice(ws, i, 2)))
             ELSE array() END""")).as("bigram"))
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(max("n").as("top_bigram_n"))
      base.join(top, Seq("doc_id"))
        .select(
          col("doc_id"), col("n_words"), col("n_distinct"),
          (lit(1.0) - col("n_distinct") * lit(1.0) / col("n_words")).as("dup_word_ratio"),
          col("top_bigram_n"),
          (col("top_bigram_n") * lit(1.0) / nonZero(col("n_words") - 1)).as("top_bigram_frac"))
  }

  // -------------------------------------------------------------------
  // PII redaction
  // -------------------------------------------------------------------

  /** PII scrub: count and redact email/phone patterns. The input is
    * synthesized deterministically from the customer table (the testdata
    * corpus contains no PII), so both engines scrub the identical text;
    * the operator itself — `regexp_extract_all` to count, nested
    * `regexp_replace` to redact — is exactly the production pass, a pure
    * per-row projection with no shuffle at any scale. Patterns stay in the
    * Java∩RE2 common subset (character classes + bounded repeats). */
  val piiRedact = {
    val email = "[a-z0-9.]+@[a-z0-9.]+"
    val phone = "[0-9]{2}-[0-9]{3}-[0-9]{4}"
    QuerySpec(
      "q_text_pii",
      s"""WITH t AS (
            SELECT c_custkey,
                   'segment ' || c_mktsegment || ' contact ' ||
                   replace(lower(c_name), '#', '.') || '@example.com or 20-' ||
                   lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
                   lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') AS text
            FROM customer)
          SELECT c_custkey,
                 CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phones,
                 regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
                                '$phone', '<PHONE>', 'g') AS redacted
          FROM t""") {
      (s, d) =>
        val t = Tables.customer(s, d).select(
          col("c_custkey"),
          concat(
            lit("segment "), col("c_mktsegment"), lit(" contact "),
            regexp_replace(lower(col("c_name")), "#", "."), lit("@example.com or 20-"),
            lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("c_custkey") % 10000).cast("string"), 4, "0")).as("text"))
        t.select(
          col("c_custkey"),
          size(expr(s"regexp_extract_all(text, '$email', 0)")).cast("long").as("n_emails"),
          size(expr(s"regexp_extract_all(text, '$phone', 0)")).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            phone, "<PHONE>").as("redacted"))
    }
  }

  // -------------------------------------------------------------------
  // Mixture-weighted sampling
  // -------------------------------------------------------------------

  /** Mixture sampling: per-source target rates (the "upsample wiki,
    * downsample crawl" knob of every pretraining mix), applied via the
    * content-hash threshold trick — keep a doc iff its md5 prefix falls
    * under the source's hex threshold. Reshard-stable, engine-independent,
    * and a pure filter: no shuffle, no rand(). Rates here derive from the
    * source id (source srcN keeps (N%4+1)/4 of its docs) so the oracle can
    * reproduce them. */
  val sampleWeighted = QuerySpec(
    "q_sample_weighted",
    """WITH t AS (
         SELECT doc_id, source,
                CAST(substr(source, 4) AS INTEGER) % 4 + 1 AS rate_q,
                substr(md5(text), 1, 2) AS bucket
         FROM documents)
       SELECT doc_id, source, CAST(rate_q AS BIGINT) AS rate_q, bucket
       FROM t
       WHERE bucket < CASE rate_q WHEN 1 THEN '40' WHEN 2 THEN '80'
                                  WHEN 3 THEN 'c0' ELSE 'zz' END""") {
    (s, d) =>
      val t = docs(s, d).select(
        col("doc_id"), col("source"),
        (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).as("rate_q"),
        substring(md5(col("text")), 1, 2).as("bucket"))
      // 'zz' > any hex digit: rate_q=4 keeps everything
      val thr = when(col("rate_q") === 1, "40").when(col("rate_q") === 2, "80")
        .when(col("rate_q") === 3, "c0").otherwise("zz")
      t.filter(col("bucket") < thr)
        .select(col("doc_id"), col("source"), col("rate_q").cast("long").as("rate_q"),
          col("bucket"))
  }

  // -------------------------------------------------------------------
  // Sequence packing (concat-and-chunk)
  // -------------------------------------------------------------------

  /** Concat-and-chunk packing index: documents are concatenated per source
    * shard in doc_id order and cut into 128-token context windows; each doc
    * emits one row per window it spans, with its begin/end offsets inside
    * the window. This is the standard packed-pretraining layout computed
    * WITHOUT materializing the concatenation: a per-shard running sum +
    * integer chunk arithmetic. Partitioned by source, so the window never
    * sees a global sort — at 100 TB each shard packs independently. */
  val packChunks = {
    val C = 128
    QuerySpec(
      "q_pack_chunks",
      s"""WITH t AS (SELECT doc_id, source,
                            CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok
                     FROM documents),
          w AS (SELECT *,
                       CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                FROM t)
          SELECT source, doc_id, CAST(chunk AS BIGINT) AS chunk_id,
                 greatest(cum - n_tok - chunk * $C, 0) AS off_begin,
                 least(cum - chunk * $C, $C) AS off_end
          FROM w, UNNEST(generate_series((cum - n_tok) // $C, (cum - 1) // $C)) AS u(chunk)""") {
      (s, d) =>
        val t = docs(s, d).select(
          col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        val w = t.withColumn("cum",
          sum("n_tok").over(org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("doc_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        w.select(col("source"), col("doc_id"), col("n_tok"), col("cum"),
            explode(expr(s"sequence((cum - n_tok) div $C, (cum - 1) div $C)")).as("chunk_id"))
          .select(
            col("source"), col("doc_id"), col("chunk_id"),
            greatest(col("cum") - col("n_tok") - col("chunk_id") * C, lit(0L)).as("off_begin"),
            least(col("cum") - col("chunk_id") * C, lit(C.toLong)).as("off_end"))
    }
  }

  // -------------------------------------------------------------------
  // KMV cardinality sketch
  // -------------------------------------------------------------------

  /** KMV (k-minimum-values) distinct-count sketch over the corpus' word
    * 3-grams: keep the 64 smallest md5 prefixes, estimate cardinality as
    * (k-1)·2³²/kth-min. The k-min runs as sort+limit — Spark plans
    * TakeOrderedAndProject, per-partition top-k then a tiny merge, which is
    * THE distributed sketch shape (no global sort, no global distinct).
    * The exact distinct count rides along as the diagnostic, mirroring the
    * MinHash estimate-vs-exact query. Fixed-width lowercase hex compares
    * lexicographically == numerically, so the hex strings ARE the hash
    * order; only the single kth value is converted to an integer. */
  val sketchKmv = {
    val k = 64
    QuerySpec(
      "q_sketch_kmv",
      s"""WITH w AS (SELECT str_split(text, ' ') AS ws FROM documents),
          sh AS (SELECT DISTINCT array_to_string(ws[i:i+2], ' ') AS shingle
                 FROM w, UNNEST(generate_series(1, greatest(len(ws) - 2, 0))) AS u(i)),
          h AS (SELECT DISTINCT substr(md5(shingle), 1, 8) AS h8 FROM sh),
          km AS (SELECT h8 FROM h ORDER BY h8 LIMIT $k),
          agg AS (SELECT CAST(count(*) AS BIGINT) AS k, max(h8) AS kth_hex FROM km)
          SELECT k, kth_hex,
                 CAST((k - 1) * 4294967296 // list_reduce(
                     list_transform(generate_series(1, 8),
                       i -> CAST(strpos('0123456789abcdef', substr(kth_hex, i, 1)) - 1 AS BIGINT)),
                     (a, c) -> a * 16 + c) AS BIGINT) AS est_distinct,
                 (SELECT CAST(count(*) AS BIGINT) FROM h) AS true_distinct
          FROM agg""") {
      (s, d) =>
        val h = docs(s, d)
          .withColumn("ws", split(col("text"), " "))
          .select(explode(expr(
            """CASE WHEN size(ws) >= 3
               THEN array_distinct(transform(sequence(1, size(ws) - 2),
                                             i -> concat_ws(' ', slice(ws, i, 3))))
               ELSE array() END""")).as("shingle"))
          .select(substring(md5(col("shingle")), 1, 8).as("h8"))
          .distinct()
          .cache()
        val km = h.orderBy("h8").limit(k)
          .agg(count(lit(1)).cast("long").as("k"), max("h8").as("kth_hex"))
        val tot = h.agg(count(lit(1)).cast("long").as("true_distinct"))
        km.crossJoin(tot)
          .withColumn("est_distinct",
            expr("(k - 1) * 4294967296L div conv(kth_hex, 16, 10)").cast("long"))
          .select("k", "kth_hex", "est_distinct", "true_distinct")
    }
  }

  // -------------------------------------------------------------------
  // TF-IDF keyword extraction
  // -------------------------------------------------------------------

  /** TF-IDF top-3 terms per document — the classic relevance score with an
    * integer-exact core: score = tf·N/df where tf·N is exact in int64 and
    * the single division is IEEE-deterministic in both engines (no log, no
    * accumulated float error). Two shuffles (doc-term counts, term df) and
    * a WindowGroupLimit-bounded per-doc top-k; df for the idf side is a
    * corpus-wide aggregate a real pipeline computes once per snapshot. */
  val tfidfTopk = QuerySpec(
    "q_tfidf_topk",
    """WITH tok AS (SELECT doc_id, u.token
                    FROM documents, UNNEST(str_split(text, ' ')) AS u(token)),
       tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
       df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n_docs FROM documents),
       sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     (tf.tf * n.n_docs) * 1.0 / df.df AS score
              FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
       SELECT doc_id, token, tf, df, score, CAST(rnk AS BIGINT) AS rnk
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, token) AS rnk
             FROM sc) t
       WHERE rnk <= 3""") {
    (s, d) =>
      val tf = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .cache()
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
      val sc = tf.join(df, Seq("token")).crossJoin(broadcast(n))
        .withColumn("score", (col("tf") * col("n_docs")) * lit(1.0) / col("df"))
      sc.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id")
            .orderBy(col("score").desc, col("token")))
          .cast("long"))
        .filter(col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
  }

  // -------------------------------------------------------------------
  // Random-projection dimensionality reduction
  // -------------------------------------------------------------------

  /** Johnson–Lindenstrauss-style random projection 64→4 dims with ±1
    * weights derived from (i·7+j) parity — deterministic shared
    * "randomness" both engines reproduce, same trick as the sign-LSH
    * hyperplanes. Pure per-row projection (one pass, no shuffle); each
    * output dim is a sequential fold, bitwise-matching DuckDB's
    * `list_reduce` (float→double element casts are exact). */
  val embedProject = {
    def foldSql(i: Int) =
      s"""list_reduce(list_transform(generate_series(1, 64),
            j -> (1 - 2 * (($i * 7 + j) % 2)) * CAST(embedding[j] AS DOUBLE)),
            (x, y) -> x + y)"""
    def foldSpark(i: Int) =
      expr(s"""aggregate(sequence(1, 64), cast(0.0 as double),
               (acc, j) -> acc + (1 - 2 * (($i * 7 + j) % 2)) * cast(embedding[j - 1] as double))""")
    QuerySpec(
      "q_embed_rp",
      s"""SELECT vec_id, label,
                 ${(0 until 4).map(i => s"${foldSql(i)} AS rp$i").mkString(",\n                 ")}
          FROM embeddings""") {
      (s, d) =>
        Tables.embeddings(s, d).select(
          col("vec_id") +: col("label") +:
            (0 until 4).map(i => foldSpark(i).as(s"rp$i")): _*)
    }
  }

  val specs: Seq[QuerySpec] = Seq(
    decontaminate, textRepetition, piiRedact, sampleWeighted,
    packChunks, sketchKmv, tfidfTopk, embedProject)
}
