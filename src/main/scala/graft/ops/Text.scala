package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Tables._
import QuerySpec.sql

/** Text analysis for training-data curation over the `documents` table:
  * token statistics, quality scoring, n-gram vocabularies, document
  * fingerprinting, and a dictionary-based language-ID heuristic.
  *
  * Scale design: per-document operators are pure array expressions
  * (no explode, no shuffle — whole-stage codegen over the scan);
  * corpus-level operators (top-ngrams, language ID) explode once and
  * aggregate hash-partitioned on the token — the word-count shape that
  * scales linearly with corpus size. No driver-side loops.
  *
  * Cross-engine determinism: all outputs are integers or strings.
  * Ratios use integer floor-division (`div`/`//`), top-k uses
  * ROW_NUMBER with full tie-breaks.
  */
object Text {

  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  /** Content-defined chunk stream (doc_id, chunk_idx, start_word,
    * n_words, digest), shared by tx_cdc_chunks and dd_shared_chunks:
    * posexplode words, one doc-partitioned window computing the 4-word
    * rolling hash + boundary prefix-count, one grouped aggregation
    * building ordered chunk digests. */
  private def cdcChunkFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    docs(s, dir)
      .select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), " ")).as(Seq("p", "word")))
      .select(col("doc_id"), (col("p") + 1).as("i"), col("word"))
      .withColumn("h", conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long"))
      .withColumn("b", when(col("i") >= 4 &&
        (lag("h", 3).over(w) * 29791 + lag("h", 2).over(w) * 961 +
          lag("h", 1).over(w) * 31 + col("h")) % 1000000007L % 16 === 0,
        1).otherwise(0))
      .withColumn("chunk_idx", coalesce(
        sum("b").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0)).cast("int"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(min(col("i")).cast("long").as("start_word"),
        count(lit(1)).cast("long").as("n_words"),
        expr("md5(array_join(transform(array_sort(collect_list(struct(i, word)))," +
          " x -> x.word), ' '))").as("digest"))
  }

  /** Oracle replay of [[cdcChunkFrame]], ending in
    * `chunks(doc_id, chunk_idx, start_word, n_words, digest)`. */
  private lazy val cdcChunksCtesSql: String =
    s"""cdc_ws AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
       |           FROM documents),
       |cdc_wd AS (SELECT doc_id, i, w[i] AS word
       |           FROM cdc_ws, UNNEST(range(1, len(w) + 1)) AS t(i)),
       |cdc_hw AS (SELECT doc_id, i, word,
       |                  ${graft.ops.Hll.hexValSql("md5(word)", 1)} AS h
       |           FROM cdc_wd),
       |cdc_wh AS (SELECT doc_id, i, word, h,
       |                  LAG(h, 3) OVER dw AS h3, LAG(h, 2) OVER dw AS h2,
       |                  LAG(h, 1) OVER dw AS h1
       |           FROM cdc_hw WINDOW dw AS (PARTITION BY doc_id ORDER BY i)),
       |cdc_bf AS (SELECT doc_id, i, word,
       |                  CASE WHEN i >= 4 AND
       |                       (h3 * 29791 + h2 * 961 + h1 * 31 + h)
       |                         % 1000000007 % 16 = 0
       |                       THEN 1 ELSE 0 END AS b
       |           FROM cdc_wh),
       |cdc_ck AS (SELECT doc_id, i, word,
       |                  COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |                    AS chunk_idx
       |           FROM cdc_bf),
       |chunks AS (
       |  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       |         CAST(MIN(i) AS BIGINT) AS start_word,
       |         CAST(COUNT(*) AS BIGINT) AS n_words,
       |         md5(string_agg(word, ' ' ORDER BY i)) AS digest
       |  FROM cdc_ck GROUP BY doc_id, chunk_idx)""".stripMargin

  /** Small multilingual stopword dictionary for the language-ID
    * heuristic (word → language it votes for). */
  private val langDict: Seq[(String, String)] = Seq(
    "the" -> "en", "and" -> "en", "of" -> "en", "is" -> "en", "a" -> "en",
    "der" -> "de", "und" -> "de", "die" -> "de", "ist" -> "de",
    "le" -> "fr", "la" -> "fr", "et" -> "fr", "est" -> "fr",
    "el" -> "es", "los" -> "es", "es" -> "es", "una" -> "es")

  private val langDictSql = langDict
    .map { case (w, l) => s"('$w', '$l')" }
    .mkString("(VALUES ", ", ", ") AS t(word, cand)")

  /** Distinct word-5-gram stream as an oracle CTE chain ending in
    * `ng(doc_id, g)` — shared by tx_decontaminate (here) and
    * dd_ngram_coverage (Dedup), ONE definition so the tokenization
    * can never drift between the two. */
  // NB: consumers interpolate this into QuerySpec.sql, which applies
  // stripMargin AGAIN — no line here may start with '|' once stripped
  // (a leading '||' concat would lose a bar to the second strip)
  private[ops] val ng5CtesSql: String =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ng AS (SELECT DISTINCT doc_id,
      |              w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |              w[i+3] || ' ' || w[i+4] AS g
      |       FROM ws, UNNEST(range(1, greatest(len(w) - 3, 1))) AS t(i))""".stripMargin

  /** The distinct word-5-gram ARRAY of a split column `w` — the
    * map-side kernel under [[ng5]], shared with the streaming
    * decontamination op so batch and stream gram math cannot drift. */
  private[graft] val ng5ArraySql: String =
    """CASE WHEN size(w) >= 5
      |  THEN array_distinct(transform(sequence(0, size(w) - 5),
      |         i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
      |  ELSE array()
      |END""".stripMargin

  /** Spark twin of [[ng5CtesSql]]'s `ng`: per-doc dedup happens
    * MAP-SIDE (array_distinct before the explode) — equivalent to the
    * oracle's SELECT DISTINCT without shuffling the n-gram stream. */
  private[ops] def ng5(d: DataFrame): DataFrame = d
    .select(col("doc_id"), split(col("text"), " ").as("w"))
    .select(col("doc_id"), explode(expr(ng5ArraySql)).as("g"))

  /** Build the 2 MiB Bloom bitmap over a reference gram column `g` —
    * positions computed with the SAME md5-hex formula the probe kernel
    * and the DuckDB oracle use ([[graft.functions.BloomImpl.position]]
    * scaladoc), aggregated distributively by
    * [[graft.functions.BloomBitsAgg]] (constant-size partials,
    * bitwise-OR merge). The result is model-sized (2 MiB regardless of
    * reference-set cardinality), the same driver-side footprint class
    * as a trained k-means model. */
  private[graft] def bloomBitsOf(reference: DataFrame): Array[Long] = {
    import reference.sparkSession.implicits._
    reference
      .select(explode(expr(
        """transform(sequence(0, 2), i ->
          |  CAST(conv(substring(md5(g), 6 * i + 1, 6), 16, 10) AS BIGINT))"""
          .stripMargin)).as("pos"))
      .as[Long]
      .select(graft.functions.BloomBitsAgg.toColumn)
      .head()
  }

  /** English-ish stopwords for the quality score (shared with the
    * dedup pillar's quality-keeper so the two scores cannot drift). */
  private[ops] val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "for")
  private[ops] val stopSql = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Gopher signal CTE chain ending in `gq(doc_id, n_words,
    * word_chars, alpha_words, stop_hits, quality_pass)` — shared by
    * tx_gopher_rules and the composed Pipeline query. */
  private[ops] val gopherSigSql: String =
    """gt AS (
      |  SELECT doc_id, string_split(coalesce(text, '') , ' ') AS ws FROM documents),
      |gsig AS (
      |  SELECT doc_id,
      |         CAST(len(ws) AS BIGINT) AS n_words,
      |         CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS word_chars,
      |         CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT)
      |           AS alpha_words,
      |         CAST(len(list_intersect(list_distinct(ws),
      |                                 ['the','a','of','and','to','in','is','for']))
      |              AS BIGINT) AS stop_hits
      |  FROM gt),
      |gq AS (
      |  SELECT doc_id, n_words, word_chars, alpha_words, stop_hits,
      |         CAST(CASE WHEN n_words BETWEEN 10 AND 100000
      |                    AND 3 * n_words <= word_chars
      |                    AND word_chars <= 10 * n_words
      |                    AND 5 * alpha_words >= 4 * n_words
      |                    AND stop_hits >= 2
      |                   THEN 1 ELSE 0 END AS INT) AS quality_pass
      |  FROM gsig)""".stripMargin

  /** Spark twin of [[gopherSigSql]]: every signal a map-side array
    * expression over the token list — zero shuffle, zero explode. */
  private[graft] def gopherSignals(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      expr("split(coalesce(text, ''), ' ')").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        expr("aggregate(ws, 0L, (acc, w) -> acc + CAST(length(w) AS BIGINT))")
          .as("word_chars"),
        expr("CAST(size(filter(ws, w -> w rlike '[A-Za-z]')) AS BIGINT)")
          .as("alpha_words"),
        expr("""CAST(size(array_intersect(array_distinct(ws),
                 array('the','a','of','and','to','in','is','for'))) AS BIGINT)""")
          .as("stop_hits"))
      .withColumn("quality_pass",
        (col("n_words").between(10, 100000) &&
          lit(3) * col("n_words") <= col("word_chars") &&
          col("word_chars") <= lit(10) * col("n_words") &&
          lit(5) * col("alpha_words") >= lit(4) * col("n_words") &&
          col("stop_hits") >= 2).cast("int"))

  /** The Gopher pass gate as ONE column expression over a text column
    * — streaming-friendly (no join, no intermediate frame), used by
    * [[graft.streaming.StreamOps.curateDocs]]. Must stay equivalent to
    * [[gopherSignals]]'s quality_pass; StreamOpsSpec asserts the two
    * formulations agree on the documents fixture. */
  private[graft] def gopherPass(text: Column): Column = {
    val ws = split(coalesce(text, lit("")), " ")
    val nWords = size(ws).cast("long")
    val wordChars = aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val alphaWords = size(filter(ws, (w: Column) => w.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(array_intersect(array_distinct(ws),
      array(stopwords.map(lit): _*))).cast("long")
    nWords.between(10, 100000) &&
      lit(3) * nWords <= wordChars && wordChars <= lit(10) * nWords &&
      lit(5) * alphaWords >= lit(4) * nWords && stopHits >= 2
  }

  /** DuckDB oracle shared by both rolling-hash variants. */
  private val rollingHashOracleSql =
    """SELECT doc_id,
      |       list_reduce(
      |         list_prepend(CAST(0 AS BIGINT),
      |           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |         (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Repeated-passage scrub CTE chain ending in `scrubbed(doc_id,
    * kept_chunks, removed_chunks, clean_text)` — shared by
    * tx_chunk_scrub and pipe_llm_corpus so the corpus the composed
    * pipeline packs is BY CONSTRUCTION the corpus the scrub op
    * publishes (see tx_chunk_scrub's comment for the semantics and
    * the scale shape). */
  private[ops] val scrubCtesSql: String =
    """sws AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
      |        FROM documents),
      |sct AS (SELECT doc_id, CAST(i // 24 AS BIGINT) AS chunk_idx,
      |               array_to_string(w[i + 1 : i + 24], ' ') AS chunk
      |        FROM sws, UNNEST(range(0, greatest(len(w), 1), 24)) AS t(i)),
      |sck AS (SELECT doc_id, chunk_idx, chunk, md5(chunk) AS digest FROM sct),
      |sdup AS (SELECT digest FROM sck
      |         GROUP BY digest HAVING COUNT(DISTINCT doc_id) >= 2),
      |scrubbed AS (
      |  SELECT c.doc_id,
      |         CAST(COUNT(*) FILTER (WHERE d.digest IS NULL) AS BIGINT)
      |           AS kept_chunks,
      |         CAST(COUNT(*) FILTER (WHERE d.digest IS NOT NULL) AS BIGINT)
      |           AS removed_chunks,
      |         coalesce(string_agg(c.chunk, ' ' ORDER BY c.chunk_idx)
      |                    FILTER (WHERE d.digest IS NULL), '') AS clean_text
      |  FROM sck c LEFT JOIN sdup d ON d.digest = c.digest
      |  GROUP BY c.doc_id)""".stripMargin

  /** Spark twin of [[scrubCtesSql]]'s `scrubbed`: (doc_id,
    * kept_chunks, removed_chunks, clean_text). The corpus text never
    * crosses an exchange — see tx_chunk_scrub's registration comment. */
  private[ops] def scrubbedFrame(s: SparkSession, dir: String): DataFrame = {
    val ws = docs(s, dir)
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("w"))
    val ck = ws
      .select(col("doc_id"),
        explode(expr("sequence(0, greatest(size(w) - 1, 0), 24)")).as("i"),
        col("w"))
      .select(col("doc_id"), expr("CAST(i div 24 AS BIGINT)").as("chunk_idx"),
        md5(concat_ws(" ", expr("slice(w, i + 1, 24)"))).as("digest"))
    val dup = ck.groupBy(col("digest"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("digest"))
    // dup is the corpus-derived duplicate-digest set — on a boilerplate-
    // heavy crawl it grows with the corpus, so it is NOT hinted as a
    // broadcast (the same unbounded-forced-broadcast class fixed in
    // tx_ccnet_buckets/tx_fuzzy_decontaminate): AQE broadcasts it when
    // it measures small and shuffles the digest-only chunk stream (no
    // text) on digest when it doesn't.
    val rm = ck.join(dup, Seq("digest"))
      .groupBy(col("doc_id")).agg(collect_list(col("chunk_idx")).as("removed"))
    ws.join(rm, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        expr("""filter(sequence(CAST(0 AS BIGINT),
                  CAST((greatest(size(w), 1) - 1) div 24 AS BIGINT)),
                  i -> removed IS NULL OR NOT array_contains(removed, i))""")
          .as("kept"),
        col("w"), col("removed"))
      .select(col("doc_id"),
        size(col("kept")).cast("long").as("kept_chunks"),
        coalesce(size(col("removed")), lit(0)).cast("long").as("removed_chunks"),
        expr("""array_join(flatten(transform(kept,
                  i -> slice(w, CAST(i * 24 + 1 AS INT), 24))), ' ')""")
          .as("clean_text"))
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- Gopher-style quality rules (Rae et al. 2021, "Scaling
    // Language Models: Methods, Analysis & Insights from Training
    // Gopher", App. A1.1): per-doc word count, mean-word-length and
    // symbol/alpha-ratio bounds plus a stopword-presence check,
    // folded into one pass/fail gate. Every signal is a map-side
    // array expression over the token list — zero shuffle, zero
    // explode; ratio bounds are integer cross-multiplications so
    // both engines compare exact integers (no division, no floats).
    // The word-count band is scaled to the fixture's short docs
    // (Gopher's own band is 50..100k words). ----
    sql("tx_gopher_rules",
      s"""WITH $gopherSigSql
         |SELECT doc_id, n_words, word_chars, alpha_words, stop_hits, quality_pass
         |FROM gq ORDER BY doc_id""") { (s, dir) =>
      gopherSignals(docs(s, dir)).orderBy(col("doc_id"))
    },

    // ---- repetition gate (the other half of Gopher's quality
    // filters, Rae et al. 2021 App. A1.2): fraction of DUPLICATE
    // word-2-grams per doc — boilerplate and crawler-loop pages repeat
    // phrases, prose doesn't. dup fraction ≤ 0.2 expressed as the
    // integer cross-multiplication 5·distinct ≥ 4·total; the empty
    // case (< 2 words) passes explicitly on BOTH engines (Spark's
    // sequence() DESCENDS on start > stop — the tx_trigram_langid
    // lesson). Map-side array expressions, zero shuffle. ----
    sql("tx_repetition",
      """WITH t AS (
        |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) AS grams
        |  FROM t)
        |SELECT doc_id,
        |       CAST(len(grams) AS BIGINT) AS n_grams,
        |       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |       CAST(CASE WHEN len(grams) = 0
        |                  OR 5 * len(list_distinct(grams)) >= 4 * len(grams)
        |                 THEN 1 ELSE 0 END AS INT) AS repetition_pass
        |FROM g ORDER BY doc_id""") { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), expr("split(coalesce(text, ''), ' ')").as("ws"))
        .withColumn("grams", expr(
          """CASE WHEN size(ws) >= 2
            |     THEN transform(sequence(1, size(ws) - 1),
            |                    i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))
            |     ELSE array() END""".stripMargin))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          size(array_distinct(col("grams"))).cast("long").as("n_distinct"))
        .withColumn("repetition_pass",
          (col("n_grams") === 0 ||
            lit(5) * col("n_distinct") >= lit(4) * col("n_grams")).cast("int"))
        .orderBy(col("doc_id"))
    },

    // ---- PII scrub: detect + redact email/IPv4 patterns — the
    // compliance primitive every curation pipeline runs before
    // training. The fixture prose contains no natural PII, so the
    // query deterministically INJECTS synthetic markers keyed on
    // doc_id first (documented, identical on both engines) — the
    // detection and redaction machinery is then tested non-vacuously.
    // Patterns are conservative char-class regexes that behave
    // identically in Java regex (Spark) and RE2 (DuckDB); output is
    // counts + the digest of the scrubbed text, never the text. All
    // map-side. ----
    sql("tx_pii_scrub", {
      // single-line arms: QuerySpec.sql stripMargins the assembled
      // oracle, so a continuation line starting with || would lose a bar
      val inject =
        "CASE WHEN doc_id % 5 = 0 THEN coalesce(text, '') || ' contact user' || " +
          "CAST(doc_id AS VARCHAR) || '@example.com now' " +
          "WHEN doc_id % 7 = 0 THEN coalesce(text, '') || ' from 10.0.' || " +
          "CAST(doc_id % 256 AS VARCHAR) || '.1 today' " +
          "ELSE coalesce(text, '') END"
      s"""WITH inj AS (SELECT doc_id, $inject AS t FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+')) AS INT)
         |         AS n_emails,
         |       CAST(len(regexp_extract_all(t, '[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+')) AS INT)
         |         AS n_ips,
         |       md5(regexp_replace(t,
         |           '[a-z0-9]+@[a-z0-9]+\\.[a-z]+|[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+',
         |           '<PII>', 'g')) AS clean_md5
         |FROM inj ORDER BY doc_id"""
    }) { (s, dir) =>
      docs(s, dir)
        .withColumn("t", expr(
          """CASE WHEN doc_id % 5 = 0
            |       THEN concat(coalesce(text, ''), ' contact user',
            |                   CAST(doc_id AS STRING), '@example.com now')
            |     WHEN doc_id % 7 = 0
            |       THEN concat(coalesce(text, ''), ' from 10.0.',
            |                   CAST(doc_id % 256 AS STRING), '.1 today')
            |     ELSE coalesce(text, '') END""".stripMargin))
        .select(col("doc_id"),
          expr("CAST(size(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9]+\\\\.[a-z]+', 0)) AS INT)")
            .as("n_emails"),
          expr("CAST(size(regexp_extract_all(t, '[0-9]+\\\\.[0-9]+\\\\.[0-9]+\\\\.[0-9]+', 0)) AS INT)")
            .as("n_ips"),
          md5(regexp_replace(col("t"),
            "[a-z0-9]+@[a-z0-9]+\\.[a-z]+|[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+",
            "<PII>")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },

    // ---- per-source corpus profile: the curation dashboard row a
    // pipeline keeps per upstream source — volume, language spread,
    // exact-dup rate (distinct content hashes vs docs). One hash
    // aggregation keyed on source; countDistinct shuffles digests and
    // langs, never text. ----
    sql("tx_source_profile",
      """SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source ORDER BY source""") { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("lang")).cast("long").as("n_langs"),
          countDistinct(md5(col("text"))).cast("long").as("n_unique"),
          lsum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    },

    // ---- cross-source contamination: duplicated content reported
    // with how many SOURCES it spans — the train/test-leakage
    // primitive every benchmark-hygiene pipeline runs (n_sources > 1
    // = the same text leaked across corpus splits). Keyed on the
    // leading-80-char digest, the header heuristic that also catches
    // truncated/re-encoded copies (exact-md5 groups only appear at
    // sf0.1 in this fixture — the chunk digest keeps the check
    // non-vacuous at every SF). Shuffles (digest, source) pairs; text
    // never leaves its scan partition. ----
    sql("tx_cross_source_dups",
      """SELECT md5(substr(text, 1, 80)) AS chunk_md5,
        |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(MIN(doc_id) AS BIGINT) AS first_doc
        |FROM documents GROUP BY 1
        |HAVING COUNT(*) > 1
        |ORDER BY chunk_md5""") { (s, dir) =>
      docs(s, dir)
        .groupBy(md5(expr("substring(text, 1, 80)")).as("chunk_md5"))
        .agg(countDistinct(col("source")).cast("long").as("n_sources"),
          count(lit(1)).cast("long").as("n_docs"),
          min(col("doc_id")).cast("long").as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("chunk_md5"))
    },

    // ---- per-doc token statistics: pure array exprs, zero shuffle ----
    sql("tx_token_stats",
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |       CAST(length(text) AS INT) AS n_chars,
        |       CAST(list_max(list_transform(string_split(text, ' '), w -> length(w))) AS INT)
        |         AS max_word_len
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        size(split(col("text"), " ")).cast("int").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("int").as("n_distinct"),
        length(col("text")).cast("int").as("n_chars"),
        array_max(transform(split(col("text"), " "), w => length(w)))
          .cast("int").as("max_word_len"))
        .orderBy(col("doc_id"))
    },

    // ---- BPE-ish subword counting: the GPT-2-style pre-tokenizer
    // shape reduced to its engine-portable core — alpha runs, digit
    // runs, and punctuation as separate token classes. The oracle
    // DEFINES the semantics with one regex alternation (identical
    // character-class behavior in Java and RE2); the Spark side counts
    // all four in ONE native byte walk (graft_token_counts) instead of
    // four regexp_extract_all calls that each materialize every match
    // only to be size()'d — measured 59 s → ~4 s over 500k docs. The
    // EXACT gate (including the multibyte fixture) is what proves the
    // walk equivalent to the regexes. Pure map-side, zero shuffle. ----
    sql("tx_bpe_tokens",
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT)
        |         AS n_subtokens,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INT) AS n_alpha_runs,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_digit_runs,
        |       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS INT) AS n_other
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      graft.GraftExtensions.register(s)
      docs(s, dir)
        .select(col("doc_id"), expr("graft_token_counts(text)").as("tc"))
        .select(col("doc_id"), col("tc.n_subtokens"), col("tc.n_alpha_runs"),
          col("tc.n_digit_runs"), col("tc.n_other"))
        .orderBy(col("doc_id"))
    },

    // ---- quality score: stopword ratio + length buckets (heuristic
    // filter stage of a data-curation pipeline), integer arithmetic ----
    sql("tx_quality_score",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |st AS (SELECT doc_id, COUNT(*) AS n_tokens,
         |              SUM(CASE WHEN word IN $stopSql THEN 1 ELSE 0 END) AS n_stop
         |       FROM w GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(st.n_tokens AS INT) AS n_tokens,
         |       CAST(st.n_stop AS INT) AS n_stop,
         |       CAST(100 * st.n_stop // st.n_tokens AS INT) AS stop_pct,
         |       CAST(d.n_chars // 100 AS INT) AS len_bucket
         |FROM documents d JOIN st ON d.doc_id = st.doc_id
         |ORDER BY d.doc_id""") { (s, dir) =>
      val w = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val st = w.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("word").isInCollection(stopwords), 1).otherwise(0)).as("n_stop"))
      docs(s, dir).select(col("doc_id"), col("n_chars"))
        .join(st, Seq("doc_id"))
        .select(col("doc_id"),
          col("n_tokens").cast("int").as("n_tokens"),
          col("n_stop").cast("int").as("n_stop"),
          expr("(100 * n_stop) div n_tokens").cast("int").as("stop_pct"),
          expr("n_chars div 100").cast("int").as("len_bucket"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus top-20 bigrams: explode once, one hash aggregation ----
    sql("tx_top_bigrams",
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bi AS (SELECT ws[i] || ' ' || ws[i+1] AS bigram
        |       FROM words, UNNEST(range(1, greatest(len(ws), 1))) AS t(i)),
        |counts AS (SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram),
        |ranked AS (SELECT bigram, CAST(n AS BIGINT) AS n,
        |                  ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rk
        |           FROM counts)
        |SELECT CAST(rk AS INT) AS rk, bigram, n FROM ranked
        |WHERE rk <= 20 ORDER BY rk""") { (s, dir) =>
      val bi = docs(s, dir)
        .select(split(col("text"), " ").as("ws"))
        .select(explode(expr(
          """CASE WHEN size(ws) >= 2
            |  THEN transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))
            |  ELSE array()
            |END""".stripMargin)).as("bigram"))
      // global top-k WITHOUT a single-partition window: limit-after-sort
      // plans as TakeOrderedAndProject (per-partition heaps + driver
      // merge of k rows), then rank the bounded winner set by a
      // broadcast ≤-join — nothing here moves all data to one task
      val top = bi.groupBy(col("bigram")).agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("bigram")).limit(20)
      val o = top.select(col("bigram").as("b2"), col("n").as("n2"))
      top.join(broadcast(o),
          col("n2") > col("n") || (col("n2") === col("n") && col("b2") <= col("bigram")))
        .groupBy(col("bigram"), col("n")).agg(count(lit(1)).cast("int").as("rk"))
        .select(col("rk"), col("bigram"), col("n"))
        .orderBy(col("rk"))
    },

    // ---- content fingerprint: md5 over the sorted distinct vocabulary
    // (bag-of-words canonical form — the dedup key for reordered docs);
    // pure array exprs, no shuffle ----
    sql("tx_fingerprint",
      """SELECT doc_id,
        |       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
        |         AS fingerprint,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS vocab_size
        |FROM documents ORDER BY doc_id""") { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))
          .as("fingerprint"),
        size(array_distinct(split(col("text"), " "))).cast("int").as("vocab_size"))
        .orderBy(col("doc_id"))
    },

    // ---- polynomial rolling hash over the character stream (the
    // content-defined fingerprint primitive; pure array fold, zero
    // shuffle).
    // CONTRACT NOTE: this variant is the INTENTIONALLY-kept expensive
    // twin — higher-order functions are CodegenFallback in Spark, so
    // the fold runs interpreted over a per-character array, which is
    // precisely the overhead graft_rolling_hash (the native codegen'd
    // expression, tx_rolling_hash_native, ~5× faster) exists to
    // remove. Kept registered because it is the formulation a user
    // writes first, and the pair is the measured argument for the
    // native-expression extension point. The fold is single-pass
    // (ascii inside the lambda — no separate transform() array). ----
    sql("tx_rolling_hash", rollingHashOracleSql) { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        expr("""aggregate(
                |  split(text, ''),
                |  CAST(0 AS BIGINT),
                |  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)""".stripMargin)
          .as("rhash"))
        .orderBy(col("doc_id"))
    },

    // ---- the same fingerprint as ONE native codegen'd expression
    // (graft.functions.RollingHash): no per-character string array, no
    // interpreted lambdas — shares tx_rolling_hash's oracle verbatim ----
    sql("tx_rolling_hash_native", rollingHashOracleSql) { (s, dir) =>
      graft.GraftExtensions.register(s)
      docs(s, dir)
        .selectExpr("doc_id", "graft_rolling_hash(text) AS rhash")
        .orderBy(col("doc_id"))
    },

    // ---- language-ID heuristic: stopword-dictionary votes, argmax per
    // doc with alphabetical tie-break, 'und' when no hits ----
    sql("tx_langid",
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |dict AS (SELECT * FROM $langDictSql),
         |votes AS (SELECT w.doc_id, dict.cand, COUNT(*) AS hits
         |          FROM w JOIN dict ON w.word = dict.word
         |          GROUP BY w.doc_id, dict.cand),
         |best AS (SELECT doc_id, cand, hits,
         |                ROW_NUMBER() OVER (PARTITION BY doc_id
         |                                   ORDER BY hits DESC, cand) AS rk
         |         FROM votes)
         |SELECT d.doc_id,
         |       COALESCE(b.cand, 'und') AS predicted,
         |       CAST(COALESCE(b.hits, 0) AS BIGINT) AS hits,
         |       d.lang AS labeled
         |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
         |  ON d.doc_id = b.doc_id
         |ORDER BY d.doc_id""") { (s, dir) =>
      import s.implicits._
      val w = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val dict = langDict.toDF("word", "cand")
      val votes = w.join(broadcast(dict), Seq("word"))
        .groupBy(col("doc_id"), col("cand")).agg(count(lit(1)).as("hits"))
      val best = votes.withColumn("rk", row_number()
        .over(Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("cand"))))
        .filter(col("rk") === 1)
      docs(s, dir).select(col("doc_id"), col("lang"))
        .join(best, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("cand"), lit("und")).as("predicted"),
          coalesce(col("hits"), lit(0)).cast("long").as("hits"),
          col("lang").as("labeled"))
        .orderBy(col("doc_id"))
    },

    // ---- per-language corpus profile: one aggregation over the
    // per-doc array stats (no explode needed) ----
    sql("tx_lang_profile",
      """WITH d AS (SELECT lang, len(string_split(text, ' ')) AS n_tokens, n_chars
        |           FROM documents)
        |SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(SUM(n_tokens) // COUNT(*) AS BIGINT) AS avg_tokens_floor
        |FROM d GROUP BY lang ORDER BY lang""") { (s, dir) =>
      docs(s, dir)
        .select(col("lang"), size(split(col("text"), " ")).as("n_tokens"), col("n_chars"))
        .groupBy(col("lang"))
        .agg(lsum(lit(1)).as("n_docs"),
          lsum(col("n_tokens")).as("total_tokens"),
          lsum(col("n_chars")).as("total_chars"),
          expr("CAST(sum(n_tokens) div count(1) AS BIGINT)").as("avg_tokens_floor"))
        .orderBy(col("lang"))
    },

    // ---- crawl-ordered n-gram NOVELTY — the dated-crawl curation
    // signal: how much of each doc's distinct 5-gram set appears here
    // FIRST (no smaller-doc_id doc contains it)? A crawler uses the
    // per-doc novelty_ppm to decide whether a source still yields new
    // text or is re-serving what the corpus already holds; doc_id is
    // ingest order, the same fixture convention the ingest capstone
    // and the SCD batches key on. Scale shape: the (g, first_doc)
    // index is ONE gram-keyed aggregation with map-side partial MIN
    // (the same exchange class dd_ngram_coverage's df table pays),
    // then everything is doc-keyed counts; and because MIN is
    // associative, a daily crawl maintains the first-occurrence index
    // with delta-sized work under the dd_index_merge contract — new
    // docs can only ADD grams or lose novelty to older docs, never
    // change an existing gram's first_doc retroactively, since ids
    // only grow. Docs with < 5 words have no grams and no row (the
    // ng5 convention). ----
    sql("tx_novelty",
      s"""WITH $ng5CtesSql,
        |fo AS (SELECT g, MIN(doc_id) AS doc_id FROM ng GROUP BY g),
        |novel AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS novel_grams
        |          FROM fo GROUP BY doc_id),
        |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        |        FROM ng GROUP BY doc_id)
        |SELECT per.doc_id, per.n_grams,
        |       COALESCE(novel.novel_grams, 0) AS novel_grams,
        |       CAST(COALESCE(novel.novel_grams, 0) * 1000000 // per.n_grams
        |            AS BIGINT) AS novelty_ppm
        |FROM per LEFT JOIN novel ON novel.doc_id = per.doc_id
        |ORDER BY per.doc_id""") { (s, dir) =>
      val ng = ng5(docs(s, dir))
      val novel = ng.groupBy(col("g")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("novel_grams"))
      ng.groupBy(col("doc_id")).agg(count(lit(1)).cast("long").as("n_grams"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("novel_grams"), lit(0L)).as("novel_grams"),
          expr("CAST(coalesce(novel_grams, 0) * 1000000 div n_grams AS BIGINT)")
            .as("novelty_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- corpus duplication report: the before/after numbers every
    // dedup run is judged by (one aggregation over content hashes) ----
    sql("tx_dedup_rate",
      """WITH h AS (SELECT md5(text) AS ch FROM documents),
        |g AS (SELECT ch, COUNT(*) AS n FROM h GROUP BY ch)
        |SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_unique_texts,
        |       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_docs_in_dup_groups,
        |       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removable
        |FROM g""") { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("ch")).agg(count(lit(1)).as("n"))
        .agg(lsum(col("n")).as("n_docs"),
          lsum(lit(1)).as("n_unique_texts"),
          lsum(when(col("n") > 1, col("n")).otherwise(0)).as("n_docs_in_dup_groups"),
          (lsum(col("n")) - lsum(lit(1))).cast("long").as("n_removable"))
    },

    // ---- per-source exact-dup rate: the dedup dashboard sliced by
    // upstream source (which feeds decide-what-to-recrawl); duplicates
    // counted WITHIN each source. Two hash aggregations, digests only
    // on the wire. ----
    sql("tx_dedup_rate_by_source",
      """WITH h AS (SELECT source, md5(text) AS ch FROM documents),
        |g AS (SELECT source, ch, COUNT(*) AS n FROM h GROUP BY source, ch)
        |SELECT source,
        |       CAST(SUM(n) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_unique_texts,
        |       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removable
        |FROM g GROUP BY source ORDER BY source""") { (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"), md5(col("text")).as("ch"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(lsum(col("n")).as("n_docs"),
          lsum(lit(1)).as("n_unique_texts"),
          (lsum(col("n")) - lsum(lit(1))).cast("long").as("n_removable"))
        .orderBy(col("source"))
    },

    // ---- char-trigram language-ID: the n-gram heuristic proper. The
    // per-language trigram profile is TRAINED ON THE CORPUS ITSELF
    // (top-20 trigrams per labeled language — one word-count-shaped
    // aggregation), broadcast, then each doc votes by profile-trigram
    // hits. Complements tx_langid's word-dictionary approach; both are
    // two linear passes + a bounded broadcast, no all-pairs. ----
    sql("tx_trigram_langid",
      """WITH tg AS (
        |  SELECT doc_id, lang, substring(text, i, 3) AS tri
        |  FROM documents, UNNEST(range(1, greatest(length(text) - 1, 1))) AS t(i)),
        |prof AS (SELECT lang, tri, COUNT(*) AS cnt FROM tg GROUP BY 1, 2),
        |top AS (SELECT lang AS cand, tri FROM (
        |          SELECT lang, tri,
        |                 ROW_NUMBER() OVER (PARTITION BY lang
        |                                    ORDER BY cnt DESC, tri) AS rk
        |          FROM prof) WHERE rk <= 20),
        |votes AS (SELECT t.doc_id, p.cand, COUNT(*) AS hits
        |          FROM tg t JOIN top p ON p.tri = t.tri
        |          GROUP BY t.doc_id, p.cand),
        |best AS (SELECT doc_id, cand, hits,
        |                ROW_NUMBER() OVER (PARTITION BY doc_id
        |                                   ORDER BY hits DESC, cand) AS rk
        |         FROM votes)
        |SELECT d.doc_id,
        |       COALESCE(b.cand, 'und') AS predicted,
        |       CAST(COALESCE(b.hits, 0) AS BIGINT) AS hits,
        |       d.lang AS labeled
        |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
        |  ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""") { (s, dir) =>
      // TWO map-side streaming passes, no corpus-scale state (round 8;
      // the previous shape shuffled AND cached per-(doc, lang, tri)
      // counts so one explode could feed both phases — instance-
      // distinct rows are corpus-scale, so at 100 TB that cache is the
      // whole corpus re-keyed, and the bench "warm" numbers were
      // cache-hit reads, not the query). Pass 1 trains: the explode
      // feeds groupBy(lang, tri) DIRECTLY — partial aggregation
      // collapses each task's instances to the trigram DOMAIN before
      // the exchange, so the training shuffle is domain-sized. Pass 2
      // votes: raw instances hash-join the ≤ 20·langs broadcast
      // profile map-side, and the only corpus-keyed exchange left is
      // the (doc_id, cand) partial-count — ≤ langs rows per doc.
      // Trigrams travel as graft_trigram_codes PACKED LONGS (one doc
      // decode, zero per-instance strings; numeric order ≡ the
      // oracle's string order — see TrigramCodes), which is what makes
      // the two passes cheaper than the old one-pass-plus-cache:
      // measured at sf1, old 20.2 s cold / 2.6 s cache-hit → 6.1 s
      // cold / 3.9 s warm with NO cached state; at sf10, 40.8 / 10.2
      // → 9.1 / 5.5, and sf1→sf10 scaling is 1.4× on 10× data.
      graft.GraftExtensions.register(s)
      def tg = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(expr("graft_trigram_codes(text)")).as("tri"))
      val top = tg.groupBy(col("lang"), col("tri"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tri"))))
        .filter(col("rk") <= 20)
        .select(col("lang").as("cand"), col("tri"))
      val votes = tg.join(broadcast(top), Seq("tri"))
        .groupBy(col("doc_id"), col("cand")).agg(count(lit(1)).as("hits"))
      val best = votes.withColumn("rk", row_number()
        .over(Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("cand"))))
        .filter(col("rk") === 1)
      docs(s, dir).select(col("doc_id"), col("lang"))
        .join(best.drop("lang"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("cand"), lit("und")).as("predicted"),
          coalesce(col("hits"), lit(0)).cast("long").as("hits"),
          col("lang").as("labeled"))
        .orderBy(col("doc_id"))
    },

    // ---- BM25 retrieval (Robertson & Spärck Jones / Okapi BM25,
    // k1 = 1.2, b = 0.75) in FIXED-POINT integer arithmetic — the
    // retrieval-based decontamination primitive: each benchmark doc
    // (doc_id ≡ 0 mod 100) is a query whose top-8 terms (by tf, then
    // word) retrieve the top-5 corpus docs most likely to leak it.
    // Both BM25 factors are rationals of corpus integers, evaluated as
    // scaled floor divisions (Lucene ships quantized norms for the
    // same reason — exact FP-free scoring that is identical on every
    // engine):
    //   idf_fx = ⌊1024·(N − df + ½)/(df + ½)⌋
    //          = (1024·(2(N−df)+1)) // (2df+1)      [log-free RSJ form]
    //   sat_fx = ⌊1024·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))⌋ with
    //            avgdl floored to milli-words A = (1000·ΣdL) // N, so
    //          = (1024·220·A·tf) // (10·A·tf + 3·A + 9000·dl)
    //   score  = Σ_terms idf_fx · sat_fx  (headroom: ≤ 3.7e18 even at
    //            N = 10¹⁰ docs — see the Tables overflow convention).
    // Query-term selection is tf·idf-RANKED (top-8 per query by
    // qtf/df, the single-integer-division sort key of the tf-idf op):
    // the first revision ranked by raw qtf, which selects STOPWORDS —
    // every query's top terms were "the"/"a"/"of", so every query
    // joined the corpus-sized posting lists of the most common words
    // and the scored join exploded super-linearly (measured 1.3 s at
    // sf0.1 → 19.6 s at sf1, 15× on 10× data). Ranking terms by
    // rarity is what makes the posting-list contract real: selected
    // terms have SMALL df, so the scored join is Σ df(rare terms) —
    // re-measured sub-linear (§ bench artifacts). This is the WAND /
    // query-pruning insight every production BM25 engine ships in
    // some form.
    // The query SET is the fixed id-space prefix (doc_id < 50,000 ∧
    // ≡ 0 mod 100 — every shipped fixture through sf1 unchanged): a
    // decontamination benchmark is a FIXED external artifact, and the
    // first revision let it grow with the corpus — at 100× that made
    // the workload queries×corpus bilinear (5,000 queries × the
    // posting lists of mid-frequency terms spilled past 76 GB and
    // OOM'd). Corpus-scaled query sets are a different problem
    // (batch all-retrieval, wanting score-at-index-build), not this
    // operator's contract.
    // Scale shape: NO full-corpus posting-list materialization. The
    // first revision built tf over every (doc, word) pair and
    // .cache()d it "to read twice" — at 100× that is a ~600M-row
    // cached relation that spills, and both readers (the df probe and
    // the scoring join) pay a full disk re-scan: measured 230 s at
    // sf10 even after the query set was fixed. The posting-list
    // contract is narrower than that: df is needed ONLY for the query
    // VOCABULARY (≤ queries × dl distinct words), and posting lists
    // are needed ONLY for the ≤ 8·|queries| SELECTED rare terms. So
    // each is its own pass over the tokenized stream with the word
    // filter BROADCAST and applied map-side BEFORE any shuffle:
    //   dfq    = cw ⋉ vocab → count distinct docs per word (the
    //            stopword skew lands one ~N-row reducer per stopword —
    //            bounded by the word with the largest posting list,
    //            not by queries × corpus);
    //   tf_sel = cw ⋉ selected-terms → groupBy (doc, word) — the
    //            map-side filter kills the corpus before the shuffle,
    //            so the shuffled volume is Σ df(selected rare terms);
    //   dl     = one per-doc count (map-side combined, N rows out).
    // The query side (≤ 500 × 8 terms, df carried on the row) is
    // broadcast; corpus stats are a 1-row broadcast. Re-tokenizing
    // the corpus per pass is deliberate: tokenize is codegen'd
    // CPU-linear work that beats caching the exploded stream (the
    // measured 230 s → see bench artifacts). No per-query corpus
    // scan — each query term touches its posting list only, exactly
    // the inverted-index contract. ----
    sql("tx_bm25_search",
      """WITH w AS (SELECT doc_id,
        |                  unnest(string_split(coalesce(text, ''), ' ')) AS word
        |           FROM documents),
        |cw AS (SELECT * FROM w WHERE doc_id % 100 != 0),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM cw GROUP BY doc_id, word),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM cw GROUP BY doc_id),
        |st AS (SELECT (1000 * SUM(dl)) // COUNT(*) AS a, COUNT(*) AS n FROM dl),
        |qtf AS (SELECT doc_id AS qid, word, COUNT(*) AS qtf
        |        FROM w WHERE doc_id % 100 = 0 AND doc_id < 50000
        |        GROUP BY doc_id, word),
        |dfq AS (SELECT t.word, COUNT(*) AS df
        |        FROM tf t JOIN (SELECT DISTINCT word FROM qtf) q USING (word)
        |        GROUP BY t.word),
        |qterms AS (SELECT qid, word, df FROM (
        |             SELECT q.qid, q.word, f.df,
        |                    ROW_NUMBER() OVER (PARTITION BY q.qid
        |                      ORDER BY CAST(q.qtf AS DOUBLE) / f.df DESC, q.word)
        |                      AS trk
        |             FROM qtf q JOIN dfq f USING (word)) t
        |           WHERE trk <= 8),
        |scored AS (
        |  SELECT q.qid, t.doc_id,
        |         ((1024 * (2 * (st.n - q.df) + 1)) // (2 * q.df + 1))
        |         * ((1024 * 220 * st.a * t.tf)
        |            // (10 * st.a * t.tf + 3 * st.a + 9000 * d.dl)) AS contrib
        |  FROM qterms q
        |  JOIN tf t USING (word)
        |  JOIN dl d ON d.doc_id = t.doc_id, st),
        |agg AS (SELECT qid, doc_id, CAST(SUM(contrib) AS BIGINT) AS score,
        |               CAST(COUNT(*) AS BIGINT) AS n_terms
        |        FROM scored GROUP BY qid, doc_id),
        |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
        |             ORDER BY score DESC, doc_id) AS rk FROM agg)
        |SELECT qid AS query_id, CAST(rk AS INT) AS rk, doc_id, score, n_terms
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""") { (s, dir) =>
      // coalesce(text, '') on EVERY text read (w and dl alike): a
      // NULL-text doc must count as a 1-word [''] doc in BOTH engines
      // — without it Spark's size(split) row would carry a NULL dl
      // that count(*) still counts in st.n while the oracle's unnest
      // drops the doc entirely, skewing every idf.
      val w = docs(s, dir)
        .select(col("doc_id"),
          explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
      val cw = w.filter(col("doc_id") % 100 =!= 0)
      // dl = words per doc = size of the split array (explode emits
      // exactly size(split) rows, incl. the ['']-for-empty-text case
      // both engines share) — a map-only projection, no explode, no
      // shuffle; the oracle's COUNT(*)-per-doc form is provably equal.
      val dl = docs(s, dir).filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id"),
          size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("dl"))
      val st = dl.agg(
        expr("(1000 * sum(dl)) div count(*)").as("a"),
        count(lit(1)).as("n"))
      val qtf = w.filter(col("doc_id") % 100 === 0 && col("doc_id") < 50000)
        .groupBy(col("doc_id").as("qid"), col("word")).agg(count(lit(1)).as("qtf"))
      // df only for the query VOCABULARY: broadcast the vocab, filter
      // the corpus word stream map-side, count distinct docs per word
      // (= the oracle's COUNT(*) over the grouped tf rows).
      val dfq = cw.join(broadcast(qtf.select(col("word")).distinct()), Seq("word"))
        .groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
      // ≤ 8·|queries| rows after the rank filter; localCheckpoint
      // (eager) so the df pass — the one corpus-sized aggregation in
      // the chain — runs exactly ONCE even though qterms feeds two
      // broadcast sides below (two lazy broadcasts would each replay
      // the lineage).
      val qterms = qtf.join(broadcast(dfq), Seq("word"))
        .withColumn("trk", row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy((col("qtf").cast("double") / col("df")).desc, col("word"))))
        .filter(col("trk") <= 8).select(col("qid"), col("word"), col("df"))
        .localCheckpoint(true)
      // Posting lists ONLY for the selected rare terms: the broadcast
      // word filter runs map-side BEFORE the (doc, word) groupBy, so
      // the shuffle carries Σ df(selected terms) rows, not the corpus.
      // repartition on doc_id ALONE (not the groupBy's (doc_id, word)
      // default): hash(doc_id) satisfies the clustering of this agg,
      // of the dl join, AND of the (qid, doc_id) agg after the
      // fan-out below — so the billion-row fan-out stream crosses ZERO
      // exchanges; the only shuffled data is this Σ df(selected)-row
      // stream.
      val selTf = cw.join(broadcast(qterms.select(col("word")).distinct()), Seq("word"))
        .repartition(col("doc_id"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      // Join ORDER is the scale decision here. This fixture's
      // vocabulary is degenerate (31 distinct words — every posting
      // list is ~the whole corpus), so the qterms fan-out produces
      // |queries|·avg-posting-list rows (~1.7B at 100×) no matter
      // what; the plan must (a) attach dl BEFORE that fan-out (two
      // doc-keyed sides, a small shuffle) so the fan-out output never
      // hits an exchange, (b) aggregate (qid, doc_id) WITHOUT a
      // shuffle — hash(doc_id) from the dl join already clusters
      // every (qid, doc) group, Spark plans a complete-mode agg — and
      // (c) rank with TopKPerKey's bounded map-side heaps (≤ 5 rows
      // per qid per partition cross the exchange) instead of sorting
      // all |queries|·|corpus| candidate rows in a window. The first
      // shape (fan-out → join → full window) measured 230 s at sf10;
      // this one 43 s, all of it the irreducible fan-out stream.
      // On a Zipfian real-text vocabulary the selected terms are
      // RARE, the fan-out is Σ df(selected) ≪ corpus, and the same
      // plan degrades gracefully to the inverted-index contract.
      val scored = selTf.join(dl, Seq("doc_id"))
        .join(broadcast(qterms), Seq("word"))
        .crossJoin(broadcast(st))
        .withColumn("contrib",
          expr("((1024 * (2 * (n - df) + 1)) div (2 * df + 1))" +
            " * ((1024 * 220 * a * tf) div (10 * a * tf + 3 * a + 9000 * dl))"))
      val agg = scored.groupBy(col("qid"), col("doc_id"))
        .agg(sum(col("contrib")).cast("long").as("score"),
          count(lit(1)).cast("long").as("n_terms"))
      graft.plans.TopK.perKey(agg, keyNames = Seq("qid"),
          order = Seq(col("score").desc, col("doc_id")), k = 5, rankName = "rk")
        .select(col("qid").as("query_id"), col("rk").cast("int").as("rk"),
          col("doc_id"), col("score"), col("n_terms"))
        .orderBy(col("query_id"), col("rk"))
    },

    // ---- TF-IDF top-3 terms per doc (bounded sample): tf and df are
    // exact integers; the tf/df score exists only as an ORDER BY key
    // (IEEE division of identical integers is bit-equal in both
    // engines), with full (score, term) tie-breaks. The word-count
    // shape twice + a per-doc window — no all-pairs, no collect. ----
    sql("tx_tfidf_topterms",
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id < 200),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
        |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY word),
        |ranked AS (
        |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.word) AS rk
        |  FROM tf JOIN df ON tf.word = df.word)
        |SELECT doc_id, CAST(rk AS INT) AS rk, word,
        |       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""") { (s, dir) =>
      val w = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      val tf = w.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val df = w.groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
      val win = Window.partitionBy(col("doc_id"))
        .orderBy((col("tf").cast("double") / col("df")).desc, col("word"))
      tf.join(df, Seq("word"))
        .withColumn("rk", row_number().over(win).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("word"),
          col("tf").cast("long").as("tf"), col("df").cast("long").as("df"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // ---- benchmark decontamination (word 5-gram overlap, the
    // GPT-3/PaLM eval-leak check): docs whose id ≡ 0 (mod 10) stand in
    // for the held-out benchmark; every OTHER doc is scored by how many
    // of its distinct 5-grams appear anywhere in the benchmark split.
    // Scale shape: the benchmark n-gram set is benchmark-sized (tiny
    // vs the corpus) → broadcast inner join against the corpus n-gram
    // stream; the corpus side is one explode + per-doc re-aggregation,
    // never shuffled on the n-gram. ----
    sql("tx_decontaminate",
      s"""WITH $ng5CtesSql,
        |bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 10 = 0),
        |hits AS (SELECT n.doc_id, COUNT(*) AS shared
        |         FROM ng n JOIN bench b USING (g)
        |         WHERE n.doc_id % 10 != 0 GROUP BY n.doc_id)
        |SELECT d.doc_id,
        |       CAST(coalesce(h.shared, 0) AS BIGINT) AS shared_ngrams,
        |       CAST(CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS INT) AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 10 != 0
        |ORDER BY d.doc_id""") { (s, dir) =>
      val ng = ng5(docs(s, dir))
      val bench = ng.filter(col("doc_id") % 10 === 0).select(col("g")).distinct()
      val hits = ng.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(bench), Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("shared"))
      docs(s, dir).filter(col("doc_id") % 10 =!= 0)
        .join(hits.withColumnRenamed("doc_id", "hid"),
          col("doc_id") === col("hid"), "left")
        .select(col("doc_id"),
          coalesce(col("shared"), lit(0L)).cast("long").as("shared_ngrams"),
          when(col("hid").isNull, 0).otherwise(1).cast("int").as("contaminated"))
        .orderBy(col("doc_id"))
    },

    // ---- Bloom-prefiltered decontamination — the 100 TB path for the
    // same contamination rule as tx_decontaminate. tx_decontaminate
    // broadcasts the benchmark n-gram SET as a hash-join side, which
    // stops working when the eval suite reaches 10⁸-10⁹ n-grams (tens
    // of GB per executor); here the benchmark side is folded into a
    // CONSTANT 2 MiB Bloom bitmap ([[graft.functions.BloomBitsAgg]] —
    // partial bitmaps OR-merged, so even a 10⁹-gram build shuffles
    // megabytes) probed by a native codegen expression map-side, and
    // ONLY the bloom-positive grams (contamination-sized, not
    // corpus-sized) reach the exact verification join. No false
    // negatives by construction (BloomPropSpec), so the verified
    // output is IDENTICAL to the exact rule; bloom_grams vs
    // shared_ngrams exposes the false-positive overhead the verify
    // tail paid. The oracle replays the bloom at the hex-position
    // level (bijective to the bit index), so the prefilter itself is
    // oracle-gated, not just the final answer.
    //
    // Measured honestly (sf10 derived, min-of-2): 9.9 s vs
    // tx_decontaminate's 8.4 s — at THESE benchmark sizes the set
    // broadcast is cheap and the bloom's md5-per-gram makes it ~1.2×
    // SLOWER, so this op is not a speedup; it is the transport that
    // still exists when the benchmark side outgrows broadcast. The
    // one-digest-sliced-k-ways hash (BloomImpl scaladoc) already cut
    // the original 3-md5 probe from 11.1 s. ----
    sql("tx_bloom_decontaminate",
      s"""WITH $ng5CtesSql,
        |bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 10 = 0),
        |hs AS (SELECT i FROM (VALUES (0), (1), (2)) t(i)),
        |bbits AS (SELECT DISTINCT substring(md5(g), 6 * i + 1, 6) AS pos
        |          FROM bench CROSS JOIN hs),
        |cand AS (
        |  SELECT n.doc_id, n.g
        |  FROM ng n CROSS JOIN hs
        |  JOIN bbits b ON b.pos = substring(md5(n.g), 6 * hs.i + 1, 6)
        |  WHERE n.doc_id % 10 != 0
        |  GROUP BY n.doc_id, n.g
        |  HAVING COUNT(*) = 3),
        |perdoc AS (
        |  SELECT c.doc_id, COUNT(*) AS blm,
        |         SUM(CASE WHEN b.g IS NULL THEN 0 ELSE 1 END) AS shared
        |  FROM cand c LEFT JOIN bench b USING (g) GROUP BY c.doc_id)
        |SELECT d.doc_id,
        |       CAST(coalesce(p.blm, 0) AS BIGINT) AS bloom_grams,
        |       CAST(coalesce(p.shared, 0) AS BIGINT) AS shared_ngrams,
        |       CAST(CASE WHEN coalesce(p.shared, 0) > 0 THEN 1 ELSE 0 END AS INT)
        |         AS contaminated
        |FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
        |WHERE d.doc_id % 10 != 0
        |ORDER BY d.doc_id""") { (s, dir) =>
      import org.apache.spark.sql.GraftShim
      import graft.functions.BloomMightContain
      val ng = ng5(docs(s, dir))
      val bench = ng.filter(col("doc_id") % 10 === 0).select(col("g")).distinct()
      val bits = bloomBitsOf(bench)
      val probe = GraftShim.column(
        BloomMightContain(GraftShim.expression(col("g")), bits))
      // ONE pass over the bloom survivors computes both counters (no
      // cached derived table — the round-7 bench-minimum lesson)
      val perDoc = ng.filter(col("doc_id") % 10 =!= 0)
        .filter(probe)
        .join(broadcast(bench.withColumn("bhit", lit(1))), Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("blm"),
          lsum(coalesce(col("bhit"), lit(0))).as("shared"))
      docs(s, dir).filter(col("doc_id") % 10 =!= 0)
        .join(perDoc.withColumnRenamed("doc_id", "pid"),
          col("doc_id") === col("pid"), "left")
        .select(col("doc_id"),
          coalesce(col("blm"), lit(0L)).cast("long").as("bloom_grams"),
          coalesce(col("shared"), lit(0L)).cast("long").as("shared_ngrams"),
          when(coalesce(col("shared"), lit(0L)) > 0, 1).otherwise(0)
            .cast("int").as("contaminated"))
        .orderBy(col("doc_id"))
    },

    // ---- data-mixing weights: per-(lang, source) token mass and the
    // integer-ppm up/down-sampling weight that would equalize the
    // mixture across domains (weight_ppm = total/(n_domains·domain) in
    // parts-per-million, floor division — the domain-reweighting step
    // of any pretraining mix). One aggregation + a broadcast scalar;
    // no second pass over the corpus. ----
    sql("tx_mix_weights",
      """WITH d AS (SELECT lang, source,
        |                  len(string_split(text, ' ')) AS n_tokens
        |           FROM documents),
        |g AS (SELECT lang, source, COUNT(*) AS n_docs,
        |             SUM(n_tokens) AS toks
        |      FROM d GROUP BY lang, source),
        |tot AS (SELECT SUM(toks) AS all_toks, COUNT(*) AS n_domains FROM g)
        |SELECT lang, source,
        |       CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(toks AS BIGINT) AS domain_tokens,
        |       CAST(toks * 1000000 // all_toks AS BIGINT) AS share_ppm,
        |       CAST(all_toks * 1000000 // (n_domains * toks) AS BIGINT) AS weight_ppm
        |FROM g, tot ORDER BY lang, source""") { (s, dir) =>
      val g = docs(s, dir)
        .select(col("lang"), col("source"),
          size(split(col("text"), " ")).as("n_tokens"))
        .groupBy(col("lang"), col("source"))
        .agg(lsum(lit(1)).as("n_docs"), lsum(col("n_tokens")).as("toks"))
      val tot = g.agg(lsum(col("toks")).as("all_toks"),
        lsum(lit(1)).as("n_domains"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_docs"),
          col("toks").as("domain_tokens"),
          expr("CAST(toks * 1000000 div all_toks AS BIGINT)").as("share_ppm"),
          expr("CAST(all_toks * 1000000 div (n_domains * toks) AS BIGINT)")
            .as("weight_ppm"))
        .orderBy(col("lang"), col("source"))
    },

    // ---- corpus-bigram LM fluency proxy: train bigram counts on the
    // corpus itself (one word-count-shaped aggregation), then score
    // each doc by the floor-mean corpus frequency of its bigrams — the
    // KenLM-style "how typical is this text" filter, all-integer so it
    // hash-matches cross-engine. Scale shape: counts table is
    // vocab²-bounded (≪ corpus), joined hash-partitioned on the bigram
    // (the same key it was aggregated on — one exchange, reused). ----
    sql("tx_bigram_lm",
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bi AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
        |       FROM ws, UNNEST(range(1, greatest(len(w), 1))) AS t(i)),
        |cnt AS (SELECT g, COUNT(*) AS n FROM bi GROUP BY g)
        |SELECT b.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(SUM(c.n) * 1000 // COUNT(*) AS BIGINT) AS mean_freq_x1000
        |FROM bi b JOIN cnt c ON b.g = c.g
        |GROUP BY b.doc_id ORDER BY b.doc_id""") { (s, dir) =>
      val bi = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(w) >= 2
            |  THEN transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))
            |  ELSE array()
            |END""".stripMargin)).as("g"))
      // corpus frequency via groupBy + join back on g (the oracle's own
      // shape), NOT a window partitioned on the raw bigram: the hottest
      // bigram ("of the"-class, ~1% of a Zipfian crawl) would put its
      // entire occurrence set through ONE window task, and a window
      // partition can never be AQE-skew-split — the join's probe side
      // can. ReusedExchange recovers the shared shuffle on g.
      val cnt = bi.groupBy(col("g")).agg(count(lit(1)).as("n"))
      bi.join(cnt, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(lsum(lit(1)).as("n_bigrams"),
          expr("CAST(sum(n) * 1000 div count(1) AS BIGINT)").as("mean_freq_x1000"))
        .orderBy(col("doc_id"))
    },

    // ---- CCNet-style per-language LM buckets (Wenzek 2020): rank each
    // language's docs by the bigram-LM fluency score (tx_bigram_lm's
    // mean corpus-frequency — higher = more common language = the
    // "lower perplexity" end) and split into head / middle / tail
    // thirds, the signal CCNet uses to keep head+middle and drop tail.
    // Bucketing is by CUTOFF, not by rank: every doc compares its
    // score against the lang's tertile thresholds, so equal scores
    // always share a bucket (rank-based thirds would split ties
    // arbitrarily). Scale shape (reworked round 12 — the previous
    // version broadcast the whole per-(lang, score) rank table, whose
    // cardinality grows with the corpus): the per-doc pass is now a
    // plain SHUFFLED (lang, score) equi-join, and the rank table is
    // built with a TWO-LEVEL prefix sum so no window partition is
    // unbounded — distinct integer scores bucket into 1024-wide
    // blocks, the within-block window sees ≤ 1024 rows BY
    // CONSTRUCTION, and the cross-block window runs over the
    // per-(lang, blk) aggregate, 1024× fewer rows than distinct
    // scores (the same blocking recurses if a lang's score RANGE
    // ever made even that level heavy). One lang dominating a crawl
    // is the norm, so partition-by-lang windows over doc rows — or
    // even over all distinct scores — are the canonical skew trap
    // this shape avoids. The only broadcast left is the per-lang
    // totals: one row per LANGUAGE, genuinely bounded.
    // n_better = docs in the lang with a strictly better score;
    // 3·n_better < n ⇒ head, < 2n ⇒ middle, else tail. ----
    sql("tx_ccnet_buckets",
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bi AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
        |       FROM ws, UNNEST(range(1, greatest(len(w), 1))) AS t(i)),
        |cnt AS (SELECT g, COUNT(*) AS n FROM bi GROUP BY g),
        |lm AS (SELECT b.doc_id, CAST(SUM(c.n) * 1000 // COUNT(*) AS BIGINT) AS score
        |       FROM bi b JOIN cnt c ON b.g = c.g GROUP BY b.doc_id),
        |ld AS (SELECT l.doc_id, d.lang, l.score
        |       FROM lm l JOIN documents d ON d.doc_id = l.doc_id),
        |sc AS (SELECT lang, score, COUNT(*) AS cnt FROM ld GROUP BY lang, score),
        |rb AS (SELECT lang, score,
        |         COALESCE(SUM(cnt) OVER (PARTITION BY lang ORDER BY score DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS better,
        |         SUM(cnt) OVER (PARTITION BY lang) AS n
        |       FROM sc)
        |SELECT ld.doc_id, ld.lang, ld.score AS mean_freq_x1000,
        |       CAST(rb.better AS BIGINT) AS n_better,
        |       CAST(rb.n AS BIGINT) AS n_lang,
        |       CASE WHEN rb.better * 3 < rb.n THEN 'head'
        |            WHEN rb.better * 3 < rb.n * 2 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM ld JOIN rb ON rb.lang = ld.lang AND rb.score = ld.score
        |ORDER BY doc_id""") { (s, dir) =>
      val bi = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(w) >= 2
            |  THEN transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1]))
            |  ELSE array()
            |END""".stripMargin)).as("g"))
      // corpus bigram frequency by groupBy + join back, same rationale
      // (and same shape) as tx_bigram_lm: no window on the raw gram key
      val cnt = bi.groupBy(col("g")).agg(count(lit(1)).as("n"))
      val lm = bi.join(cnt, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(expr("CAST(sum(n) * 1000 div count(1) AS BIGINT)").as("score"))
      // ld is read THREE times (score histogram, per-lang totals, the
      // final per-doc join) and each reference re-planned the whole
      // bigram explode + corpus-frequency join above it — the r15
      // before-plan carried 24 document scans / 52 Exchanges from
      // exactly that. One doc-sized (doc_id, score, lang) checkpoint
      // truncates it (guide §3.3); the expensive gram machinery runs
      // once. At 100 TB this materializes one narrow row per DOCUMENT
      // — the same class of artifact the dedup family checkpoints —
      // against re-running the corpus-sized bigram join per reference.
      val ld = lm.join(docs(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
        .localCheckpoint()
      val sc = ld.groupBy(col("lang"), col("score")).agg(count(lit(1)).as("cnt"))
        .withColumn("blk", expr("score div 1024"))
      // within-block suffix count: sc has one row per DISTINCT integer
      // score, so a 1024-wide block holds ≤ 1024 rows — this window's
      // partitions are hard-bounded regardless of corpus size
      val within = sc.withColumn("wb", coalesce(
        sum(col("cnt")).over(Window.partitionBy(col("lang"), col("blk"))
          .orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // cross-block prefix over the per-(lang, blk) AGGREGATE. blk is
      // monotone in score, and a strictly-higher block holds only
      // strictly-greater scores, so better = pb (higher blocks) + wb
      // (greater scores inside this block).
      val blkPre = sc.groupBy(col("lang"), col("blk"))
        .agg(sum(col("cnt")).as("bcnt"))
        .withColumn("pb", coalesce(
          sum(col("bcnt")).over(Window.partitionBy(col("lang"))
            .orderBy(col("blk").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("lang"), col("blk"), col("pb"))
      // per-lang totals via groupBy (map-side partials absorb the
      // one-lang-dominates skew); one row per LANGUAGE — the one
      // genuinely bounded frame here, hence the one broadcast
      val nLang = ld.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val rb = within.join(blkPre, Seq("lang", "blk"))
        .join(broadcast(nLang), Seq("lang"))
        .withColumn("better", col("pb") + col("wb"))
        .select(col("lang"), col("score"), col("better"), col("n"))
      ld.join(rb, Seq("lang", "score"))
        .select(col("doc_id"), col("lang"),
          col("score").as("mean_freq_x1000"),
          col("better").cast("long").as("n_better"),
          col("n").cast("long").as("n_lang"),
          when(col("better") * 3 < col("n"), "head")
            .when(col("better") * 3 < col("n") * 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    },

    // ---- overlapping token-window chunking (the RAG-index /
    // long-doc-pretraining splitter): 32-token windows, stride 24
    // (8-token overlap), each chunk addressed (doc_id, chunk_idx,
    // start_tok) and content-fingerprinted. Pure map-side explode —
    // zero shuffle, chunks stay in their doc's scan partition. ----
    sql("tx_chunk_windows",
      """WITH ws AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
        |            FROM documents),
        |st AS (SELECT doc_id, w, i AS start
        |       FROM ws, UNNEST(range(0, greatest(len(w), 1), 24)) AS t(i)),
        |ck AS (SELECT doc_id, CAST(start // 24 AS INT) AS chunk_idx,
        |              CAST(start AS BIGINT) AS start_tok,
        |              w[start + 1 : start + 32] AS cw
        |       FROM st)
        |SELECT doc_id, chunk_idx, start_tok,
        |       CAST(len(cw) AS BIGINT) AS n_tokens,
        |       md5(array_to_string(cw, ' ')) AS digest
        |FROM ck ORDER BY doc_id, chunk_idx""") { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          split(coalesce(col("text"), lit("")), " ").as("w"))
        .select(col("doc_id"), col("w"),
          explode(expr("sequence(0, greatest(size(w) - 1, 0), 24)")).as("start"))
        .select(col("doc_id"),
          expr("CAST(start div 24 AS INT)").as("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          expr("slice(w, start + 1, 32)").as("cw"))
        .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
          size(col("cw")).cast("long").as("n_tokens"),
          md5(concat_ws(" ", col("cw"))).as("digest"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- content-defined chunking (the rsync/LBFS boundary trick at
    // word granularity): a chunk ends wherever the rolling hash of the
    // last 4 words lands in 1/16 of the hash space, so boundaries are
    // CONTENT-anchored — insert words at the front of a document and
    // the chunking RE-SYNCHRONIZES after one window, leaving later
    // chunk digests identical (asserted by TextEdgeSpec), where
    // tx_chunk_windows' fixed grid shifts every chunk. The digest
    // stream is the sub-document dedup key for near-identical docs.
    // Scale shape: posexplode + ONE window partitioned per doc + one
    // grouped aggregation — word-count-shaped, no per-doc arrays
    // larger than a chunk, one exchange on doc_id. ----
    sql("tx_cdc_chunks",
      s"""WITH $cdcChunksCtesSql
         |SELECT doc_id, chunk_idx, start_word, n_words, digest
         |FROM chunks ORDER BY doc_id, chunk_idx""") { (s, dir) =>
      cdcChunkFrame(s, dir).orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- the CDC payoff: sub-document dedup. Chunk digests shared by
    // two or more documents are the passages a byte-identical or
    // shifted near-dup carries — groupBy digest over the chunk stream,
    // one aggregation, corpus-linear. ----
    sql("dd_shared_chunks",
      s"""WITH $cdcChunksCtesSql
         |SELECT digest,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
         |       CAST(MIN(n_words) AS BIGINT) AS n_words
         |FROM chunks GROUP BY digest
         |HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY digest""") { (s, dir) =>
      cdcChunkFrame(s, dir)
        .groupBy(col("digest"))
        .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_chunks"),
          min(col("doc_id")).cast("long").as("first_doc"),
          min(col("n_words")).cast("long").as("n_words"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("digest"))
    },

    // ---- concat-and-chunk sequence packing (the GPT-style batch
    // builder): within each (lang, source) stream, docs concatenate in
    // doc_id order and split every 256 tokens; a doc's bin is its
    // start offset ÷ 256. The running offset is a blocked two-level
    // prefix sum ([[Prefix.exclusiveRunningSum]]): a stream key is
    // #langs × #sources values, so a plain per-stream window would put
    // a constant fraction of the CORPUS through one sort task — the
    // round-13 `weak` finding this rework closes. ----
    sql("tx_pack_manifest",
      """WITH d AS (SELECT doc_id, lang, source,
        |                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
        |                    AS n_tokens
        |           FROM documents),
        |p AS (SELECT *,
        |             CAST(coalesce(SUM(n_tokens) OVER (
        |               PARTITION BY lang, source ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |               AS start_tok
        |      FROM d)
        |SELECT doc_id, lang, source, n_tokens, start_tok,
        |       CAST(start_tok // 256 AS BIGINT) AS bin
        |FROM p ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
      Prefix.exclusiveRunningSum(d, Seq("lang", "source"), "doc_id",
          col("n_tokens"), "start_tok")
        .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"),
          col("start_tok"),
          expr("CAST(start_tok div 256 AS BIGINT)").as("bin"))
        .orderBy(col("doc_id"))
    },

    // ---- the CDC dedup yield number: per source, how much word mass
    // sits in chunks whose digest appears in 2+ documents — what a
    // curation run reports before deciding to strip shared passages.
    // The shared-digest set is an aggregate (much smaller than the
    // chunk stream); one join on digest + one grouped aggregation. ----
    sql("dd_chunk_dup_rate",
      s"""WITH $cdcChunksCtesSql,
         |sh AS (SELECT digest FROM chunks
         |       GROUP BY digest HAVING COUNT(DISTINCT doc_id) >= 2),
         |j AS (SELECT c.doc_id, c.n_words,
         |             CASE WHEN s.digest IS NOT NULL THEN 1 ELSE 0 END AS dup
         |      FROM chunks c LEFT JOIN sh s ON s.digest = c.digest)
         |SELECT d.source,
         |       CAST(SUM(j.n_words) AS BIGINT) AS total_words,
         |       CAST(SUM(CASE WHEN j.dup = 1 THEN j.n_words ELSE 0 END) AS BIGINT)
         |         AS dup_words,
         |       CAST((1000 * SUM(CASE WHEN j.dup = 1 THEN j.n_words ELSE 0 END))
         |              // SUM(j.n_words) AS BIGINT) AS dup_permille
         |FROM j JOIN documents d ON d.doc_id = j.doc_id
         |GROUP BY d.source ORDER BY d.source""") { (s, dir) =>
      val chunks = cdcChunkFrame(s, dir)
        .cache() // read twice: the shared-digest aggregate + the join
      val shared = chunks.groupBy(col("digest"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("digest"), lit(1).as("dup"))
      chunks.join(shared, Seq("digest"), "left_outer")
        .join(docs(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_words")).cast("long").as("total_words"),
          sum(when(col("dup") === 1, col("n_words")).otherwise(0L)).cast("long")
            .as("dup_words"),
          expr("""CAST((1000 * sum(CASE WHEN dup = 1 THEN n_words ELSE 0 END))
                  div sum(n_words) AS BIGINT)""").as("dup_permille"))
        .orderBy(col("source"))
    },

    // ---- repeated-passage SCRUB (the RefinedWeb / MassiveText
    // line-dedup shape, at word-chunk granularity since this corpus
    // has no newlines): partition each doc into non-overlapping
    // 24-word chunks; a chunk whose digest appears in 2+ documents is
    // boilerplate and is REMOVED from every copy; the surviving
    // chunks reassemble in order into clean_text. This is the one
    // rewrite op of the text family — the others score or flag, this
    // one produces the curated corpus bytes.
    // Scale shape: the corpus text NEVER crosses an exchange. The
    // digest stream (32-hex rows, not text) shuffles once for the
    // dup-set aggregate; removal is digest-stream ⋈ broadcast(dup
    // set) → a (doc_id, chunk_idx) pair stream, contamination-sized,
    // grouped into per-doc removal index lists; the rewrite itself is
    // an array lambda evaluated WHERE EACH DOC'S ROW ALREADY LIVES
    // (slice/filter/flatten over the split array — a doc is ≤ a few
    // KB, the lambda is O(words)). The removal-list join is the only
    // contact between the corpus and the dedup machinery, and AQE
    // broadcasts it at real-world dup rates. Re-deriving the chunk
    // grid inside the lambda instead of carrying chunk text through
    // the join is what keeps the shuffled bytes digest-sized. ----
    sql("tx_chunk_scrub",
      s"""WITH $scrubCtesSql
        |SELECT doc_id, kept_chunks, removed_chunks, clean_text
        |FROM scrubbed ORDER BY doc_id""") { (s, dir) =>
      scrubbedFrame(s, dir).orderBy(col("doc_id"))
    },

    // ---- per-source token-QUOTA admission (the crawl-budget gate: a
    // mix policy caps how many tokens each source may contribute; the
    // source's stream is admitted in arrival order until the quota is
    // spent, then everything further is rejected — prefix truncation,
    // exactly what "stop crawling this domain at N tokens" means; the
    // 800-token budget is a FIXED policy constant like the
    // decontamination benchmark, not corpus-scaled). used_before is a
    // blocked two-level prefix sum ([[Prefix.exclusiveRunningSum]]) —
    // a per-source WINDOW would funnel each source's whole stream
    // through one sort task. [[graft.streaming.StreamOps
    // .quotaAdmit]] is the stateful streaming twin (state = one long
    // per source); StreamOpsSpec asserts verdict parity across a
    // micro-batch split. ----
    sql("tx_quota_admission",
      """WITH d AS (SELECT doc_id, source,
        |                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
        |                    AS n_tokens
        |           FROM documents),
        |p AS (SELECT *,
        |             CAST(coalesce(SUM(n_tokens) OVER (
        |               PARTITION BY source ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |               AS used_before
        |      FROM d)
        |SELECT doc_id, source, n_tokens, used_before,
        |       CAST(CASE WHEN used_before + n_tokens <= 800 THEN 1 ELSE 0 END AS INT)
        |         AS admitted
        |FROM p ORDER BY doc_id""") { (s, dir) =>
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
      Prefix.exclusiveRunningSum(d, Seq("source"), "doc_id",
          col("n_tokens"), "used_before")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("used_before"),
          when(col("used_before") + col("n_tokens") <= 800, 1).otherwise(0)
            .cast("int").as("admitted"))
        .orderBy(col("doc_id"))
    },

    // ---- packing efficiency readout: per (lang, source) stream, the
    // numbers a batch-builder tunes against — bins produced, fill
    // percentage of the 256-token sequences, and how many documents
    // straddle a bin boundary (get split across training sequences).
    // One aggregation over the same blocked prefix-sum relation as
    // tx_pack_manifest ([[Prefix.exclusiveRunningSum]]). ----
    sql("tx_pack_stats",
      """WITH d AS (SELECT doc_id, lang, source,
        |                  CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT)
        |                    AS n_tokens
        |           FROM documents),
        |p AS (SELECT *,
        |             CAST(coalesce(SUM(n_tokens) OVER (
        |               PARTITION BY lang, source ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |               AS start_tok
        |      FROM d)
        |SELECT lang, source,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       CAST((SUM(n_tokens) + 255) // 256 AS BIGINT) AS n_bins,
        |       CAST(CASE WHEN SUM(n_tokens) = 0 THEN 0
        |            ELSE (100 * SUM(n_tokens)) // (((SUM(n_tokens) + 255) // 256) * 256)
        |            END AS BIGINT) AS fill_pct,
        |       CAST(SUM(CASE WHEN start_tok // 256 <> (start_tok + n_tokens - 1) // 256
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
        |FROM p GROUP BY lang, source ORDER BY lang, source""") { (s, dir) =>
      val d = docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
      Prefix.exclusiveRunningSum(d, Seq("lang", "source"), "doc_id",
          col("n_tokens"), "start_tok")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          expr("CAST((sum(n_tokens) + 255) div 256 AS BIGINT)").as("n_bins"),
          expr("""CAST(CASE WHEN sum(n_tokens) = 0 THEN 0
                  ELSE (100 * sum(n_tokens)) div (((sum(n_tokens) + 255) div 256) * 256)
                  END AS BIGINT)""").as("fill_pct"),
          expr("""CAST(sum(CASE WHEN start_tok div 256 <> (start_tok + n_tokens - 1) div 256
                      THEN 1 ELSE 0 END) AS BIGINT)""").as("n_split_docs"))
        .orderBy(col("lang"), col("source"))
    },

    // ---- DSIR-style importance weights (Xie et al. 2023, "Data
    // Selection for LMs via Importance Resampling"): hashed unigram
    // features (md5 → 256 buckets, identical in both engines), bucket
    // distributions of a target split (doc_id ≡ 0 mod 10 stands in
    // for the high-quality target) vs the raw pool, and each raw
    // doc's mean likelihood ratio ×1000 with add-one smoothing — the
    // resampling key. Integerized: the true DSIR log-ratio sum is
    // monotone-equivalent per bucket; floor arithmetic makes it
    // hash-stable cross-engine (at petabyte counts the ratio would be
    // computed per-bucket in ppm first to keep products in i64). Scale
    // shape: the 256-row bucket table broadcasts; the word stream
    // aggregates per doc, hash-partitioned on doc_id. ----
    sql("tx_dsir_weights",
      """WITH ws AS (SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS w
        |            FROM documents),
        |fb AS (SELECT doc_id,
        |              (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS b
        |       FROM ws),
        |bs AS (SELECT b,
        |              COUNT(*) FILTER (doc_id % 10 = 0) AS tc,
        |              COUNT(*) FILTER (doc_id % 10 != 0) AS rc
        |       FROM fb GROUP BY b),
        |tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM bs),
        |r AS (SELECT b, CAST((tc + 1) * (rt + 256) * 1000
        |                     // ((rc + 1) * (tt + 256)) AS BIGINT) AS ratio_x1000
        |      FROM bs, tot)
        |SELECT f.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(SUM(r.ratio_x1000) // COUNT(*) AS BIGINT) AS dsir_score_x1000
        |FROM fb f JOIN r ON r.b = f.b
        |WHERE f.doc_id % 10 != 0
        |GROUP BY f.doc_id ORDER BY f.doc_id""") { (s, dir) =>
      val fb = docs(s, dir)
        .select(col("doc_id"),
          explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
        .select(col("doc_id"), expr(
          """(instr('0123456789abcdef', substring(md5(w), 1, 1)) - 1) * 16
            | + (instr('0123456789abcdef', substring(md5(w), 2, 1)) - 1)""".stripMargin)
          .as("b"))
      val bs = fb.groupBy(col("b")).agg(
        lsum(when(col("doc_id") % 10 === 0, 1L).otherwise(0L)).as("tc"),
        lsum(when(col("doc_id") % 10 =!= 0, 1L).otherwise(0L)).as("rc"))
      val tot = bs.agg(lsum(col("tc")).as("tt"), lsum(col("rc")).as("rt"))
      val r = bs.crossJoin(broadcast(tot))
        .select(col("b"),
          expr("CAST((tc + 1) * (rt + 256) * 1000 div ((rc + 1) * (tt + 256)) AS BIGINT)")
            .as("ratio_x1000"))
      fb.filter(col("doc_id") % 10 =!= 0)
        .join(broadcast(r), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_words"),
          expr("CAST(sum(ratio_x1000) div count(1) AS BIGINT)").as("dsir_score_x1000"))
        .orderBy(col("doc_id"))
    })
}
