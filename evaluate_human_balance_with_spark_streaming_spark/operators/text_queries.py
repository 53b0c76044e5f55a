"""Text-analysis operators for training-data curation: token counting,
quality scoring, language ID, fingerprinting.

All pure built-in expressions (split/regexp/aggregate/size) — per-row,
no shuffle, scan-bound; exactly what you want for a 100 TB text sweep.
A BPE-ish subword token estimate is included alongside whitespace
tokens (regex word/number/punct segmentation, the standard pre-tokenizer
shape) so downstream size budgeting has a tokenizer-independent signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import managed_persist
from ..functions.hashing import hash_bucket, sql_hash_bucket
from ..functions.text import (
    SQL_WS,
    SQL_WS_CHARS,
    SQL_WS_TRIM_TEXT,
    WS,
    WS_CHARS,
    fingerprint_md5,
    tokens,
    ws_trim,
)
from ..plans.registry import register
from ..sources.testdata import load_table

# English stopword sample used by the n-gram language heuristic. Kept
# deliberately tiny and hard-coded so the oracle can embed the same list.
_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
_SQL_STOPWORDS = "['" + "','".join(_EN_STOPWORDS) + "']"


def with_text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Append token/char/quality columns to a documents DataFrame.

    Single source for the stats the battery query certifies — the
    registered query SELECTS these columns rather than recomputing
    them, so an edit here lands in front of the oracle immediately
    instead of drifting silently."""
    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    punct_chars = F.length(
        F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"()\[\]-]", "")
    )
    # BPE-ish segmentation: words / numbers / single non-space symbols.
    bpe_tokens = F.size(
        F.filter(
            F.split(
                F.regexp_replace(
                    F.col(text_col),
                    f"([A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CHARS}])",
                    "$1\x01",
                ),
                "\x01",
            ),
            lambda t: F.btrim(t, F.lit(" \t\n\r\f\x0b")) != "",
        )
    )
    # Total token length == non-whitespace char count for a whitespace
    # tokenizer; the regexp form stays in codegen where the equivalent
    # aggregate(toks, ...) fold is interpreted per element.
    nonspace = F.length(F.regexp_replace(F.trim(F.col(text_col)), WS + "+", ""))
    # Plain division, no zero-guard: a whitespace split never returns an
    # empty array for non-null text (split('') = ['']), and NULL text
    # must propagate NULL exactly like the oracle's nonspace/n_tokens —
    # a when().otherwise(0.0) here would turn NULL into 0.0 and flip
    # the value hash on any fixture containing a NULL document.
    avg_word_len = nonspace.cast("double") / n_tokens
    alpha_ratio = alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1))
    # fastText-style length+alphabetic quality prior in [0, 1].
    quality = F.least(n_tokens, F.lit(100)) / 100.0 * 0.5 + alpha_ratio * 0.5
    # Ratios stay UNROUNDED here: threshold consumers (the curation
    # gate's alpha_ratio >= 0.6) must compare the raw double exactly
    # like their oracles; output queries round at their select.
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_computed", n_chars)
        .withColumn("bpe_tokens", bpe_tokens)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn(
            "punct_ratio",
            punct_chars.cast("double") / F.greatest(n_chars, F.lit(1)),
        )
        .withColumn("avg_word_len", avg_word_len)
        .withColumn("quality", quality)
    )


def with_stopword_ratio(df: DataFrame, text_col: str) -> DataFrame:
    toks = tokens(F.lower(F.col(text_col)))
    stop_arr = F.array(*[F.lit(w) for w in _EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    # UNROUNDED: the ratio is only ever compared against thresholds
    # (never output), and every oracle compares the raw double — a
    # 6-dp round here would flip docs whose true ratio sits inside
    # (0.08, 0.0800005] to the other side of the language gate.
    return df.withColumn(
        "stopword_ratio",
        hits.cast("double") / F.greatest(F.size(toks), F.lit(1)),
    ).withColumn("distinct_stopwords", n_stop)


@register(
    "text_stats_battery",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang, text,
                   len(regexp_split_to_array({SQL_WS_TRIM_TEXT}, '{SQL_WS}+')) AS n_tokens,
                   length(text) AS n_chars,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
                   length(regexp_replace(trim(text), '{SQL_WS}+', '', 'g')) AS nonspace,
                   regexp_split_to_array(lower({SQL_WS_TRIM_TEXT}), '{SQL_WS}+') AS w
            FROM documents
        )
        SELECT doc_id,
               CAST(n_tokens AS INTEGER) AS n_tokens,
               CAST(n_chars AS INTEGER) AS n_chars_computed,
               CAST(len(list_filter(
                   string_split(
                       regexp_replace(text,
                           '([A-Za-z]+|[0-9]+|[^A-Za-z0-9{SQL_WS_CHARS}])',
                           '\\1' || chr(1), 'g'),
                       chr(1)),
                   t -> trim(t, ' ' || chr(9) || chr(10) || chr(13)
                                 || chr(12) || chr(11)) <> '')) AS INTEGER) AS bpe_tokens,
               ROUND(alpha::DOUBLE / greatest(n_chars, 1), 6) AS alpha_ratio,
               ROUND(
                   length(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE
                   / greatest(n_chars, 1), 6
               ) AS punct_ratio,
               ROUND(nonspace::DOUBLE / n_tokens, 6) AS avg_word_len,
               ROUND(
                   least(n_tokens, 100) / 100.0 * 0.5
                   + (alpha::DOUBLE / greatest(n_chars, 1)) * 0.5, 6
               ) AS quality,
               CAST(len(list_intersect(list_distinct(w), {_SQL_STOPWORDS}))
                    AS INTEGER) AS distinct_stopwords,
               lang AS label_lang,
               CASE WHEN len(list_filter(w, t -> list_contains({_SQL_STOPWORDS}, t)))::DOUBLE
                         / greatest(len(w), 1) > 0.08
                    THEN 'en' ELSE 'other' END AS predicted_lang,
               md5(trim(regexp_replace(lower(text), '{SQL_WS}+', ' ', 'g'))) AS fingerprint
        FROM base
    """,
    tags=("text", "quality", "langid", "tokenizer", "fingerprint", "battery"),
)
def q_text_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text-analysis sweep in ONE scan pass: whitespace
    + BPE-ish token counts, char count, alphabetic/avg-word-length
    ratios, a fastText-style quality prior, the stopword language-ID
    heuristic, and the normalized md5 fingerprint (the exact-dedup key).

    One query instead of five single-stat queries because that is how a
    100 TB sweep actually runs: every column is a row-local expression,
    so Catalyst fuses them into a single WholeStageCodegen over one
    parquet scan — N stats for the I/O cost of one. Every stat column
    is SELECTED from with_text_stats/with_stopword_ratio (not
    recomputed here), so the oracle certifies the operators themselves.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = with_stopword_ratio(with_text_stats(d, "text"), "text")
    return scored.select(
        "doc_id",
        "n_tokens",
        "n_chars_computed",
        "bpe_tokens",
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("avg_word_len", 6).alias("avg_word_len"),
        F.round("quality", 6).alias("quality"),
        "distinct_stopwords",
        F.col("lang").alias("label_lang"),
        F.when(F.col("stopword_ratio") > 0.08, F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("predicted_lang"),
        fingerprint_md5(F.col("text")).alias("fingerprint"),
    )


@register(
    "text_tfidf_top_term",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower({SQL_WS_TRIM_TEXT}), '{SQL_WS}+')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tc
            FROM toks GROUP BY doc_id, term
        ),
        doclen AS (
            SELECT doc_id, SUM(tc) AS n_toks FROM tf GROUP BY doc_id
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   (tf.tc::DOUBLE / doclen.n_toks)
                   * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS tfidf
            FROM tf
            JOIN doclen ON doclen.doc_id = tf.doc_id
            JOIN df ON df.term = tf.term
            CROSS JOIN n
        )
        SELECT doc_id, term AS top_term, ROUND(tfidf, 6) AS tfidf
        FROM (
            SELECT doc_id, term, tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    tags=("text", "tfidf"),
)
def q_text_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-distinctive term per document by TF-IDF (smoothed idf =
    ln((N+1)/(df+1))). Plan shape at scale: ONE explode pass feeds the
    term-frequency aggregate; document frequency and per-doc length
    both derive from that persisted tf table (short rows); the (term,
    df) table joins back broadcast; N is a scalar broadcast. No
    all-pairs anything; the per-doc top-1 is a WindowGroupLimit."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # Persist barrier on tf only: it feeds doclen, document frequency
    # AND the scoring join — each unpersisted consumer would re-run
    # the corpus scan + explode (the recompute-per-consumer trap
    # with_shingles documents; at 100 TB the equivalent is a
    # materialized term-frequency table). Released by the query
    # wrapper after evaluation.
    toks = d.select(
        "doc_id",
        F.explode(F.split(ws_trim(F.lower(F.col("text"))), WS + "+")).alias("term"),
    )
    tf = managed_persist(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tc"))
    )
    doclen = tf.groupBy("doc_id").agg(F.sum("tc").alias("n_toks"))
    # Document frequency from the PERSISTED tf table, not a
    # countDistinct re-aggregation of the exploded tokens: tf rows are
    # already distinct (doc_id, term) pairs, so a plain count per term
    # is the same df without a second full pass over the exploded
    # corpus or a two-phase distinct (review finding). With tf as its
    # only consumer, toks needs no persist barrier of its own.
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # Corpus size as a broadcast scalar subplan — NOT d.count(): a
    # driver-side action during plan construction forces a job per
    # build (the anti-pattern VERDICT r01 flagged on ivf_topk).
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tc").cast("double") / F.col("n_toks"))
            * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("tfidf", 6).alias("tfidf"))
    )


@register(
    "text_levenshtein_near",
    oracle="""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS INTEGER) AS edit_dist
        FROM documents a
        JOIN documents b
          ON a.source = b.source AND a.doc_id < b.doc_id
        WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 10
    """,
    tags=("text", "dedup", "levenshtein"),
)
def q_text_levenshtein_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match on 40-char prefixes within source
    blocks — the fuzzy-match complement to shingle Jaccard (catches
    char-level noise: OCR errors, encoding damage). Blocked join keeps
    the pair count bounded; the prefix cap bounds per-pair cost, and
    the BOUNDED levenshtein (threshold arg → banded O(d·len) dynamic
    program, early exit past the bound; measured 2× at sf0.1) bounds
    it further — full-text unbounded levenshtein is O(len²), never run
    it unblocked at scale. No sound shingle/band candidate pruning
    exists for edit distance (insertions shift alignment, breaking the
    pigeonhole that SimHash/LSH banding relies on), so within-block
    all-pairs with a cheap bounded kernel IS the scale shape."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("source").alias("blk"),
        F.substring("text", 1, 40).alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("source").alias("blk"),
        F.substring("text", 1, 40).alias("tb"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        # threshold form returns -1 when the distance exceeds 10.
        .withColumn("edit_dist", F.levenshtein("ta", "tb", 10))
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist")
    )


@register(
    "text_sampling_battery",
    oracle=f"""
        SELECT 'hash10' AS method, doc_id, lang
        FROM documents
        WHERE {sql_hash_bucket('doc_id', 100)} < 10
        UNION ALL
        SELECT 'strat20' AS method, doc_id, lang FROM (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        ) WHERE rn <= 20
    """,
    tags=("sampling", "stratified", "battery"),
)
def q_text_sampling_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both reproducible sampling operators, tagged by method:

    - ``hash10``: deterministic ~10% sample keyed on a hash of the id —
      the reproducible alternative to rand(): stable across runs,
      engines, partitionings, and re-runs over grown datasets (a doc's
      membership never flips). Purely a filter — no shuffle, pushed to
      the scan boundary.
    - ``strat20``: stratified sample, up to 20 docs per language in
      hash order (deterministic shuffle) — per-class balancing for
      training mixes. One shuffle on the stratum key; WindowGroupLimit
      caps each partition before the exchange.
    """
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    hash10 = (
        d.filter(hash_bucket(F.col("doc_id"), 100) < 10)
        .select(F.lit("hash10").alias("method"), "doc_id", "lang")
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    strat20 = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select(F.lit("strat20").alias("method"), "doc_id", "lang")
    )
    return hash10.unionAll(strat20)


@register(
    "text_curation_pipeline",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, text,
                   len(regexp_split_to_array({SQL_WS_TRIM_TEXT}, '{SQL_WS}+')) AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                       / greatest(length(text), 1) AS alpha_ratio,
                   len(list_filter(regexp_split_to_array(lower({SQL_WS_TRIM_TEXT}), '{SQL_WS}+'),
                                   t -> list_contains({_SQL_STOPWORDS}, t)))::DOUBLE
                       / greatest(len(regexp_split_to_array({SQL_WS_TRIM_TEXT}, '{SQL_WS}+')), 1)
                       AS stop_ratio
            FROM documents
        ),
        kept AS (
            SELECT doc_id, text, n_tokens
            FROM scored
            WHERE n_tokens >= 20 AND alpha_ratio >= 0.6 AND stop_ratio > 0.08
        ),
        deduped AS (
            SELECT MIN(doc_id) AS doc_id, MAX(n_tokens) AS n_tokens
            FROM kept
            GROUP BY md5(trim(regexp_replace(lower(text), '{SQL_WS}+', ' ', 'g')))
        )
        SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens
        FROM deduped
        WHERE {sql_hash_bucket('doc_id', 2)} = 0
    """,
    tags=("text", "pipeline", "capstone"),
)
def q_text_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline — the composite a training-data job
    actually runs: quality gate (length + alphabetic ratio) → language
    gate (stopword heuristic) → exact dedup (keep min id per normalized
    fingerprint) → deterministic 50% sample. Single declarative plan:
    Catalyst fuses the three row-local gates into one scan pass, the
    dedup is the only shuffle, the sample is a post-aggregation filter."""
    d = load_table(spark, sf_dir, "documents")
    # Gate on the SAME columns the stats battery certifies (selected
    # from with_text_stats / with_stopword_ratio, not re-derived) — an
    # edit to the stat definitions lands in front of both oracles.
    scored = with_stopword_ratio(with_text_stats(d, "text"), "text")
    kept = scored.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("alpha_ratio") >= 0.6)
        & (F.col("stopword_ratio") > 0.08)
    )
    deduped = (
        kept.groupBy(fingerprint_md5(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.max("n_tokens").alias("n_tokens"))
    )
    return deduped.filter(hash_bucket(F.col("doc_id"), 2) == 0).select(
        "doc_id", "n_tokens"
    )
