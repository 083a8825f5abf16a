"""Text-analysis operators for training-data pipelines (SURVEY.md §2c).

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting —
all pure Column expressions (JVM codegen, no UDFs), shuffle-free per-row
transforms that scale linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import (
    portable_hash, portable_hash_sql, tokens, tokens_sql,
    word_gram_positions, word_shingles_sql,
)
from ..plans.registry import register
from ..tables import load

# Tiny per-language stopword lists (public common words). The fixture's
# synthetic text is English-ish vocab, so 'en' dominates — the point is the
# *operator* (argmax of per-language hit ratios), verified exactly.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans", "pour"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
}

BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

FP_PRIME = 1_000_000_007
FP_MULT = 1_000_003


def _lang_hits(toks, lang: str):
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def _lang_hits_sql(toks_expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> t IN ({words})))"


@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len({tokens_sql('text')}) AS n_word_tokens,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    tags=("text", "tokenize"), # retired from the bench headline r11: sub-second noise-band row,
    # plan pinned elsewhere; frees 2KB-tail budget for comparable_to_prev_sec
    bench=False)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, word tokens, and a
    BPE-ish regex (letter runs / digit runs / single punctuation) — the
    pre-tokenizer shape used by byte-pair encoders."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).alias("n_ws_tokens"),
        F.size(tokens("text")).alias("n_word_tokens"),
        F.regexp_count("text", F.lit(BPE_TOKEN_RE)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"))


@register(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_hits_sql(tokens_sql('text'), 'en')} AS hits_en,
             {_lang_hits_sql(tokens_sql('text'), 'de')} AS hits_de,
             {_lang_hits_sql(tokens_sql('text'), 'fr')} AS hits_fr,
             {_lang_hits_sql(tokens_sql('text'), 'es')} AS hits_es
      FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN hits_en >= hits_de AND hits_en >= hits_fr
                  AND hits_en >= hits_es THEN 'en'
             WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
             WHEN hits_fr >= hits_es THEN 'fr'
             ELSE 'es'
           END AS predicted_lang,
           hits_en, hits_de, hits_fr, hits_es
    FROM scored
    """,
    tags=("text", "language-id"))
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: per-language stopword hit
    counts, argmax with a fixed precedence (en > de > fr > es) for
    deterministic ties."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.select(
        "doc_id", F.col("lang").alias("labeled_lang"),
        _lang_hits(toks, "en").alias("hits_en"),
        _lang_hits(toks, "de").alias("hits_de"),
        _lang_hits(toks, "fr").alias("hits_fr"),
        _lang_hits(toks, "es").alias("hits_es"))
    en, de, fr, es = (F.col(f"hits_{lang}") for lang in ("en", "de", "fr", "es"))
    pred = (F.when((en >= de) & (en >= fr) & (en >= es), "en")
            .when((de >= fr) & (de >= es), "de")
            .when(fr >= es, "fr")
            .otherwise("es"))
    return scored.select("doc_id", "labeled_lang", pred.alias("predicted_lang"),
                         "hits_en", "hits_de", "hits_fr", "hits_es")


@register(
    "text_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({tokens_sql('text')}) AS n_tokens,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
             {_lang_hits_sql(tokens_sql('text'), 'en')} AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(
             CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END
             + CASE WHEN CAST(n_punct AS DOUBLE) / n_chars < 0.1
                    THEN 1 ELSE 0 END
             + CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.01
                    THEN 1 ELSE 0 END
           AS INT) AS quality
    FROM feats
    """,
    tags=("text", "quality"))
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length / punctuation-ratio / stopword-
    ratio features and a 0-3 rule-based score — the classic pre-filter
    for web-scraped training text."""
    docs = load(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(tokens("text")).alias("n_tokens"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("n_punct"),
        _lang_hits(tokens("text"), "en").alias("n_stop"))
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    quality = (
        F.when(F.col("n_tokens") >= 20, 1).otherwise(0)
        + F.when(punct_ratio < 0.1, 1).otherwise(0)
        + F.when(stop_ratio > 0.01, 1).otherwise(0)).cast("int")
    return feats.select(
        "doc_id", "n_chars", "n_tokens",
        (F.col("n_chars").cast("double") / F.col("n_tokens"))
        .alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"))


@register(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, unnest(list_transform(
               range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    ), lm AS (
      SELECT bigram, COUNT(*) AS c FROM bg GROUP BY bigram
    ), tot AS (
      SELECT COUNT(*) AS n FROM bg
    )
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           round(SUM(ln(CAST(lm.c AS DOUBLE) / tot.n)) / COUNT(*), 6)
             + 0.0 AS avg_logprob
    FROM bg JOIN lm USING (bigram) CROSS JOIN tot
    GROUP BY bg.doc_id
    """,
    tags=("text", "quality", "language-model"))
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM document scoring — the perplexity-style quality filter:
    train a unigram-of-bigrams LM on the corpus itself (bigram relative
    frequencies), then score each document by its mean bigram
    log-probability. Atypical documents (boilerplate, wrong-language,
    garbled) score low and get filtered before training.

    Scale shape: one explode + hash-agg builds the LM (bigram counts);
    scoring joins doc-bigrams to the LM on the bigram key (shuffle on
    bigram — the LM is corpus-sized, NOT broadcastable at 100 TB) and
    reduces per doc. round(6) absorbs engine libm ln() last-ulp
    differences (the sums are otherwise identical: counts are exact
    ints, division/accumulation order mirrored)."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = docs.select("doc_id",
                       F.split("text", " ", -1).alias("t")).persist()
    bgs_expr = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat(F.get("t", i), F.lit(" "),
                               F.get("t", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bg = (toks.select("doc_id", F.explode(bgs_expr).alias("bigram"))
          .persist())
    lm = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    tot = bg.agg(F.count(F.lit(1)).alias("n"))
    logp = F.log(F.col("c").cast("double") / F.col("n"))
    return (bg.join(lm, "bigram").crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 (F.round(F.sum(logp) / F.count(F.lit(1)), 6) + 0.0)
                 .alias("avg_logprob")))


REPETITION_THRESHOLD = 0.2


@register(
    "text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id,
             list_transform(range(1, len(t)),
                            i -> t[i] || ' ' || t[i + 1]) AS bgs
      FROM toks
    )
    SELECT doc_id,
           len(bgs) AS n_bigrams,
           list_max(list_transform(bgs,
             b -> len(list_filter(bgs, x -> x = b)))) AS top_bigram_count,
           CAST(list_max(list_transform(bgs,
             b -> len(list_filter(bgs, x -> x = b)))) AS DOUBLE)
             / len(bgs) AS top_bigram_ratio
    FROM bg
    """,
    tags=("text", "quality", "repetition"))
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (Gopher-style quality rule): the share
    of word bigrams claimed by the single most frequent bigram —
    boilerplate/template text scores high and gets filtered before
    training. Entirely within-row; the count-per-bigram kernel is
    O(bigrams²) on ≤ a-few-hundred-token rows.

    Two persist() barriers keep the token and bigram arrays materialized
    attributes: CollapseProject would otherwise re-inline the array
    expressions into every higher-order lambda (the K-fold re-evaluation
    trap measured in dedup._with_signature)."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = docs.select(
        "doc_id", F.split("text", " ", -1).alias("t")).persist()
    # guard: Spark sequence(0, n-2) DESCENDS for n < 2 (step defaults to
    # -1 when start > stop) where DuckDB range() returns empty
    bgs_expr = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat(F.get("t", i), F.lit(" "),
                               F.get("t", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bg = toks.select("doc_id", bgs_expr.alias("bgs")).persist()
    counts = F.transform(
        F.col("bgs"), lambda b: F.size(F.filter(F.col("bgs"),
                                                lambda x: x == b)))
    return bg.select(
        "doc_id",
        F.size("bgs").alias("n_bigrams"),
        F.array_max(counts).alias("top_bigram_count"),
        (F.array_max(counts).cast("double") / F.size("bgs"))
        .alias("top_bigram_ratio"))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {portable_hash_sql('text')} AS content_hash,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({tokens_sql('text')},
                 t -> {portable_hash_sql('t')} % {FP_PRIME})),
             (acc, h) -> (acc * {FP_MULT} + h) % {FP_PRIME}) AS rolling_fp
    FROM documents
    """,
    tags=("text", "fingerprint"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: a whole-content hash plus an order-
    sensitive rolling (polynomial) hash over the token stream — equal
    fingerprints <=> equal token sequences, the cheap first pass of any
    dedup pipeline."""
    docs = load(spark, sf_dir, "documents")
    tok_hashes = F.transform(tokens("text"),
                             lambda t: portable_hash(t) % FP_PRIME)
    rolling = F.aggregate(
        tok_hashes, F.lit(0).cast("bigint"),
        lambda acc, h: (acc * FP_MULT + h) % FP_PRIME)
    return docs.select(
        "doc_id",
        portable_hash(F.col("text")).alias("content_hash"),
        rolling.alias("rolling_fp"))


TFIDF_TOP_K = 3


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) + 0.0
               AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= {TFIDF_TOP_K}
    """,
    tags=("text", "tfidf", "ranking"))
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-{TFIDF_TOP_K} terms per document — the classic corpus
    keyword/relevance operator (tf = term count in doc, idf = ln(N/df)).
    The per-doc top terms are the cheap salience signal prep pipelines
    use for topic tagging and boilerplate spotting.

    Scale shape: tf is one shuffle on (doc_id, term) with map-side
    combine; df folds tf by term (vocabulary-sized, shrinks fast); the
    tf<->df join keys on term, and at 100 TB the df relation is
    vocabulary-sized — broadcastable after a df floor, else a hash join
    that AQE sizes; the top-k is a window group-limit per doc. Ranking
    keys on the ROUNDED score (6 dp) in BOTH engines so a last-ulp ln()
    divergence cannot reorder near-ties; remaining ties break on term."""
    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    toks = (docs.repartition(para)
            .select("doc_id", F.explode(tokens("text")).alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.round(
        F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        6) + 0.0
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (tf.join(dfreq, "term").crossJoin(F.broadcast(n))
            .select("doc_id", "term", score.alias("tfidf"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= TFIDF_TOP_K)
            .select("doc_id", "term", "tfidf", "rnk"))


MIN_TOKENS = 20
MAX_PUNCT_RATIO = 0.1
MIN_STOPWORD_RATIO = 0.01
MIN_TTR = 0.30


@register(
    "text_quality_verdict",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, {tokens_sql('text')} AS tk,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(tk) AS n_tokens,
             CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1) AS punct_ratio,
             CAST({_lang_hits_sql('tk', 'en')} AS DOUBLE)
               / GREATEST(len(tk), 1) AS sw_ratio,
             CAST(len(list_distinct(tk)) AS DOUBLE)
               / GREATEST(len(tk), 1) AS ttr
      FROM f
    )
    SELECT doc_id, n_tokens,
           n_tokens < {MIN_TOKENS} AS too_short,
           punct_ratio >= {MAX_PUNCT_RATIO} AS high_punct,
           sw_ratio < {MIN_STOPWORD_RATIO} AS low_stopword,
           ttr < {MIN_TTR} AS repetitive_vocab,
           (n_tokens >= {MIN_TOKENS} AND punct_ratio < {MAX_PUNCT_RATIO}
            AND sw_ratio >= {MIN_STOPWORD_RATIO} AND ttr >= {MIN_TTR})
             AS keep
    FROM s
    """,
    tags=("text", "quality", "composition"))
def text_quality_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed QUALITY VERDICT per document — the keep/drop decision a
    prep job applies, with per-rule reason flags for auditability
    (which rule killed a doc matters more than that it died): length
    floor, punctuation-density ceiling, stopword-ratio floor (natural
    prose contains function words; their absence flags tables/code/
    gibberish), and a type-token-ratio floor (low TTR = loops of the
    same tokens, the cheap repetition signal next to the full Gopher
    operator). All signals are row-local Column expressions — no
    shuffle, no UDF; every ratio is one IEEE division of exact ints, so
    the flags are bit-identical cross-engine with no epsilon."""
    docs = load(spark, sf_dir, "documents")
    tk = tokens("text")
    feats = docs.select(
        "doc_id", tk.alias("tk"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("n_punct"),
        F.length("text").alias("n_chars"))
    n_tokens = F.size("tk")
    punct_ratio = (F.col("n_punct").cast("double")
                   / F.greatest(F.col("n_chars"), F.lit(1)))
    sw_ratio = (_lang_hits(F.col("tk"), "en").cast("double")
                / F.greatest(n_tokens, F.lit(1)))
    ttr = (F.size(F.array_distinct("tk")).cast("double")
           / F.greatest(n_tokens, F.lit(1)))
    s = feats.select(
        "doc_id", n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        sw_ratio.alias("sw_ratio"), ttr.alias("ttr"))
    keep = ((F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("punct_ratio") < MAX_PUNCT_RATIO)
            & (F.col("sw_ratio") >= MIN_STOPWORD_RATIO)
            & (F.col("ttr") >= MIN_TTR))
    return s.select(
        "doc_id", "n_tokens",
        (F.col("n_tokens") < MIN_TOKENS).alias("too_short"),
        (F.col("punct_ratio") >= MAX_PUNCT_RATIO).alias("high_punct"),
        (F.col("sw_ratio") < MIN_STOPWORD_RATIO).alias("low_stopword"),
        (F.col("ttr") < MIN_TTR).alias("repetitive_vocab"),
        keep.alias("keep"))


NOVELTY_SHINGLE_N = 3


@register(
    "text_ngram_novelty",
    oracle=f"""
    WITH sets AS (
      SELECT doc_id, {word_shingles_sql('text', NOVELTY_SHINGLE_N)} AS sh
      FROM documents
    ),
    posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
    first_intro AS (
      SELECT s, MIN(doc_id) AS first_doc FROM posting GROUP BY s
    )
    SELECT p.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty
    FROM posting p JOIN first_intro f ON p.s = f.s
    GROUP BY p.doc_id
    """,
    tags=("text", "novelty", "dedup"))
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-GRAM NOVELTY per document: the fraction of a doc's word
    {NOVELTY_SHINGLE_N}-grams that no earlier document (by doc_id order —
    in production, crawl/ingest order) has introduced. Low-novelty docs
    are recombinations of text the corpus already has — the incremental-
    ingest dedup signal that catches "new" documents assembled from old
    parts, which pairwise near-dup misses when no single source is
    similar enough.

    Scale shape: one shuffle of (shingle -> min doc_id) with map-side
    combine (the first-introduction relation), one join back on the
    shingle key, one partial agg per doc. No self-join anywhere — cost
    is linear in corpus shingles, unlike the pairwise kernels; this is
    the shape that stays cheap at 100 TB. novelty is one IEEE division
    of exact ints — no epsilon."""
    from ..functions.portable import word_shingles

    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    sets = (docs.repartition(para)
            .select("doc_id", tokens("text").alias("tk"))
            .select("doc_id",
                    word_shingles("tk", NOVELTY_SHINGLE_N).alias("sh")))
    posting = sets.select("doc_id", F.explode("sh").alias("s"))
    first_intro = posting.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), F.lit(1)) \
        .otherwise(F.lit(0))
    return (posting.join(first_intro, "s")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.sum(novel).cast("bigint").alias("n_novel"),
                 (F.sum(novel).cast("double") / F.count(F.lit(1)))
                 .alias("novelty")))


# ----------------------------------------------- boilerplate removal

BP_SEG_WORDS = 8    # "line" = 8-word segment (fixture text is single-line)
BP_DF_MIN = 3       # segment is boilerplate when present in >= 3 docs


@register(
    "text_boilerplate_strip",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS tk FROM documents
    ),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(
               tk[(i*{BP_SEG_WORDS}+1):(i*{BP_SEG_WORDS}+{BP_SEG_WORDS})],
               ' ') AS seg
      FROM toks, LATERAL (
        SELECT unnest(range(CAST(ceil(len(tk)/{BP_SEG_WORDS}.0) AS BIGINT)))
          AS i)
    ),
    bp AS (
      SELECT seg FROM segs
      GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= {BP_DF_MIN}
    ),
    flagged AS (
      SELECT s.doc_id, s.seg_idx, s.seg, bp.seg IS NOT NULL AS is_bp
      FROM segs s LEFT JOIN bp ON s.seg = bp.seg
    ),
    agg AS (
      SELECT doc_id,
             COUNT(*) AS n_segments,
             CAST(COUNT(*) FILTER (WHERE is_bp) AS BIGINT) AS n_removed,
             CAST(COALESCE(SUM(length(seg)) FILTER (WHERE is_bp), 0)
                  AS BIGINT) AS chars_removed,
             COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                      FILTER (WHERE NOT is_bp), '') AS text_clean
      FROM flagged GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_segments, 0) AS n_segments,
           COALESCE(a.n_removed, 0) AS n_removed,
           COALESCE(a.chars_removed, 0) AS chars_removed,
           COALESCE(a.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("text", "dedup", "boilerplate"), # retired from the bench headline r11: sub-second noise-band row,
    # plan pinned elsewhere; frees 2KB-tail budget for comparable_to_prev_sec
    bench=False)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal: segment every document into
    consecutive 8-word "lines" (the fixture corpus is
    single-line, so fixed word windows stand in for newline splits —
    documented adaptation), count each distinct segment's document
    frequency across the corpus, strip segments appearing in >=
    3 documents from EVERY document, and reassemble the
    cleaned text in order with removal accounting (navbars, cookie
    banners, and license footers are exactly such corpus-frequent lines).

    Scale shape: segmentation is row-local (one transform over a
    sequence; cost is bounded by words-per-doc x segments-per-doc and at
    production scale moves into the same mapInPandas pass as decoding);
    the df count shuffles (segment, doc-distinct) pairs with map-side
    partial aggregation — linear in corpus segments, the same CCNet
    line-hash shuffle every production line-dedup runs; the boilerplate
    drop-set is by construction tiny (high-df segments only) and joins
    back BROADCAST, so the reassembly groupBy(doc_id) is the only
    corpus-sized shuffle carrying text. Docs whose every segment is
    boilerplate (or that have no tokens) stay in the output with
    text_clean='' via the final left join from documents.
    """
    docs = load(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n_seg = F.ceil(F.size("tk") / BP_SEG_WORDS).cast("int")
    seg_of = lambda i: F.array_join(  # noqa: E731
        F.slice(F.col("tk"), i * BP_SEG_WORDS + 1, BP_SEG_WORDS), " ")
    segs = (docs.select("doc_id", tk.alias("tk"))
            .withColumn(
                "segs",
                F.when(F.size("tk") > 0,
                       F.transform(F.sequence(F.lit(0), n_seg - 1), seg_of))
                .otherwise(F.array().cast("array<string>")))
            .select("doc_id", F.posexplode("segs").alias("seg_idx", "seg")))
    bp = (segs.groupBy("seg")
          .agg(F.countDistinct("doc_id").alias("df"))
          .where(F.col("df") >= BP_DF_MIN)
          .select(F.col("seg").alias("bp_seg")))
    flagged = (segs.join(F.broadcast(bp), F.col("seg") == F.col("bp_seg"),
                         "left")
               .withColumn("is_bp", F.col("bp_seg").isNotNull()))
    kept_struct = F.when(~F.col("is_bp"), F.struct("seg_idx", "seg"))
    agg = (flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(F.col("is_bp"), 1)).alias("n_removed"),
        F.coalesce(F.sum(F.when(F.col("is_bp"), F.length("seg"))),
                   F.lit(0)).cast("bigint").alias("chars_removed"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s.seg), " ").alias("text_clean")))
    return (docs.select("doc_id")
            .join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                    F.coalesce("chars_removed", F.lit(0))
                    .alias("chars_removed"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


# ------------------------------------------------------------ BM25 search

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5
# Fixed benchmark queries over the fixture vocabulary — at production the
# query relation arrives as a (query_id, term) table exactly like this.
BM25_QUERIES = (
    ("q_stream", ("spark", "stream")),
    ("q_join", ("hash", "join", "merge")),
    ("q_window", ("window", "sort")),
)


def _bm25_query_values_sql() -> str:
    rows = ", ".join(f"('{q}', '{t}')" for q, ts in BM25_QUERIES
                     for t in ts)
    return f"(VALUES {rows}) AS qr(query_id, term)"


@register(
    "text_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({tokens_sql('text')}) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, len({tokens_sql('text')}) AS dl FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    contrib AS (
      SELECT qr.query_id, tf.doc_id,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / s.avgdl)) AS c
      FROM {_bm25_query_values_sql()}
      JOIN tf USING (term)
      JOIN dfreq d USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT query_id, doc_id, round(SUM(c), 6) + 0.0 AS score
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, doc_id, score, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    ) WHERE rnk <= {BM25_TOP_K}
    """,
    tags=("text", "bm25", "ranking", "retrieval"), bench=True)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{BM25_TOP_K} retrieval for a query set — the standard
    lexical ranking function (Lucene-style idf = ln(1 + (N-df+0.5)/
    (df+0.5)); k1={BM25_K1}, b={BM25_B}), the workhorse for corpus search
    and retrieval-based decontamination in training-data pipelines.

    Scale shape: tf is the one corpus-sized shuffle on (doc_id, term)
    with map-side combine; the query relation (a handful of terms) is
    BROADCAST onto tf, so the corpus postings are filtered to query
    terms before the df join — nothing query-independent ever moves.
    Each posting row CARRIES its document length (the _jaccard_pairs
    carried-sizes idiom): dl rides the tf aggregate as min(dl) — every
    row of a (doc_id, term) group agrees — so the former corpus-wide
    dl join is gone and the corpus is tokenized ONCE (the persisted
    (doc_id, tk) relation feeds postings + stats). df over query-term
    postings only
    (identical value to corpus df); (n_docs, avgdl) is a two-scalar
    broadcast. Top-k per query is a window group-limit over the tiny
    scored relation. Ranking keys on the ROUNDED score (6 dp) in both
    engines so a last-ulp ln() divergence cannot reorder near-ties;
    remaining ties break on doc_id."""
    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    # ONE tokenize pass total: the (doc_id, tk) relation is persisted and
    # both consumers (postings + corpus stats) read the cache — the
    # former shape tokenized the corpus once per consumer. size/explode
    # over the cached attribute are cheap array ops. explode_OUTER
    # suppresses InferFiltersFromGenerate's size(tk)>0 pre-filter (its
    # null terms are dropped by the query-term join); avg over the
    # integer dl multiset is an exact double either way, so stats are
    # bit-identical to the former separate-scan derivation.
    tk_rel = (docs.repartition(para)
              .select("doc_id", tokens("text").alias("tk"))
              .persist())
    toks = tk_rel.select("doc_id", F.size("tk").alias("dl"),
                         F.explode_outer("tk").alias("term"))
    stats = (tk_rel.select(F.size("tk").alias("dl"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.avg(F.col("dl").cast("double")).alias("avgdl")))
    queries = spark.createDataFrame(
        [(q, t) for q, ts in BM25_QUERIES for t in ts],
        "query_id string, term string")
    # tf is tiny (docs matching query terms, aggregated) but feeds TWO
    # consumers (df derivation + the contrib join) — without the persist
    # the corpus-wide posting subtree is evaluated once per consumer
    tf = (toks.join(F.broadcast(queries.select("term").distinct()), "term")
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"),
                                         F.min("dl").alias("dl"))
          .persist())
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (tf.join(F.broadcast(queries), "term")
               .join(F.broadcast(dfreq), "term")
               .crossJoin(F.broadcast(stats))
               .select(
                   "query_id", "doc_id",
                   (F.log(F.lit(1.0)
                          + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                          / (F.col("df") + F.lit(0.5)))
                    * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                    / (F.col("tf") + F.lit(BM25_K1)
                       * (F.lit(1.0 - BM25_B)
                          + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")))
                    ).alias("c")))
    scored = (contrib.groupBy("query_id", "doc_id")
              .agg((F.round(F.sum("c"), 6) + F.lit(0.0)).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= BM25_TOP_K)
            .select("query_id", "doc_id", "score", "rnk"))


# ------------------------------------ intra-document repetition strip

@register(
    "text_intradoc_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS tk FROM documents
    ),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(
               tk[(i*{BP_SEG_WORDS}+1):(i*{BP_SEG_WORDS}+{BP_SEG_WORDS})],
               ' ') AS seg
      FROM toks, LATERAL (
        SELECT unnest(range(CAST(ceil(len(tk)/{BP_SEG_WORDS}.0) AS BIGINT)))
          AS i)
    ),
    occ AS (
      SELECT doc_id, seg_idx, seg,
             ROW_NUMBER() OVER (PARTITION BY doc_id, seg
                                ORDER BY seg_idx) AS occ
      FROM segs
    ),
    agg AS (
      SELECT doc_id,
             COUNT(*) AS n_segments,
             CAST(COUNT(*) FILTER (WHERE occ > 1) AS BIGINT) AS n_removed,
             COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
                      FILTER (WHERE occ = 1), '') AS text_clean
      FROM occ GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_segments, 0) AS n_segments,
           COALESCE(a.n_removed, 0) AS n_removed,
           COALESCE(a.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    tags=("text", "dedup", "intra-doc"))
def text_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition removal — the complement of
    text_boilerplate_strip's cross-document pass: keep only the FIRST
    occurrence of each {BP_SEG_WORDS}-word segment inside a document
    (generation loops, scraped pagination echoes, and template stutters
    produce exactly this shape; C4/CCNet-style pipelines run both passes).

    Scale shape: everything is keyed by doc_id — segmentation is
    row-local, the first-occurrence window partitions on (doc_id, seg),
    and reassembly groups by doc_id, so no corpus-global state exists at
    all; the operator is embarrassingly partition-parallel over
    documents (contrast the boilerplate pass, whose df-count is the one
    corpus-global aggregate). Docs with no tokens stay in the output
    with text_clean='' via the left join from documents."""
    docs = load(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n_seg = F.ceil(F.size("tk") / BP_SEG_WORDS).cast("int")
    seg_of = lambda i: F.array_join(  # noqa: E731
        F.slice(F.col("tk"), i * BP_SEG_WORDS + 1, BP_SEG_WORDS), " ")
    segs = (docs.select("doc_id", tk.alias("tk"))
            .withColumn(
                "segs",
                F.when(F.size("tk") > 0,
                       F.transform(F.sequence(F.lit(0), n_seg - 1), seg_of))
                .otherwise(F.array().cast("array<string>")))
            .select("doc_id", F.posexplode("segs").alias("seg_idx", "seg")))
    w = Window.partitionBy("doc_id", "seg").orderBy("seg_idx")
    occ = segs.withColumn("occ", F.row_number().over(w))
    kept_struct = F.when(F.col("occ") == 1, F.struct("seg_idx", "seg"))
    agg = (occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(F.col("occ") > 1, 1)).alias("n_removed"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s.seg), " ").alias("text_clean")))
    return (docs.select("doc_id")
            .join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_segments", F.lit(0)).alias("n_segments"),
                    F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


# ------------------------------------------------ phi-heavy-hitters

HH_PHI = 0.033  # support threshold as a fraction of total corpus tokens


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({tokens_sql('text')}) AS term FROM documents
    ),
    cnts AS (
      SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cnts
    )
    SELECT term, CAST(cnt AS BIGINT) AS cnt
    FROM cnts, tot
    WHERE cnt >= CAST(CEIL({HH_PHI} * n) AS BIGINT)
    """,
    tags=("text", "sketch", "heavy-hitters", "arrow"), bench=True)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """phi-heavy hitters over the corpus vocabulary: every term whose
    global frequency is >= ceil(phi * N) of the N total tokens, with its
    EXACT count — the two-pass candidate-prune algorithm that never
    shuffles the full term distribution.

    Pass 1 (candidates + global N, map-only, ONE scan): each partition
    counts its own tokens in a local hash map (mapInArrow, zero
    shuffle) and emits (a) the terms that are locally heavy — count_p
    >= phi * N_p for that partition's N_p tokens — and (b) ONE sentinel
    row carrying N_p itself, so the exact global total N = sum of
    sentinels comes out of the same scan instead of a third pass over
    the corpus (the r8 verdict's #3 ask: two corpus scans total is this
    algorithm's true minimum). If sum_p count_p >= phi * sum_p N_p then
    some partition must satisfy the local bound (else summing the
    strict converses contradicts it), so the candidate union has NO
    FALSE NEGATIVES under ANY partitioning; false positives are fine,
    pass 2 removes them. The tiny pass-1 output (candidates + one row
    per partition) is localCheckpoint-pinned so the candidate branch
    and the N branch read ONE materialization rather than re-scanning
    the token relation per branch. Pass 2 (exact): tokens semi-joined
    to the BROADCAST candidate set, then one groupBy over candidate
    terms only — at 100 TB the corpus-wide shuffle carries a few
    thousand frequent terms instead of billions of distinct ones, and
    the final filter against ceil(phi*N) makes the output an exact
    function of the data (the partition-dependent candidate set cannot
    leak through). The local map is bounded by per-partition
    vocabulary; swap the Counter for Misra-Gries space-saving (k =
    1/phi entries) if partition vocabularies themselves are unbounded —
    the no-false-negative guarantee carries over unchanged.

    Reference scope: frequency/top-k analytics over the record stream is
    SURVEY.md S2c territory (the reference delegates all aggregation to
    Spark once records are scanned)."""
    import pyarrow as pa

    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    toks = (docs.repartition(para)
            .select(F.explode(tokens("text")).alias("term")))

    def _local_stats(batches):
        from collections import Counter
        cnt: Counter = Counter()
        total = 0
        for b in batches:
            col = b.column(0).to_pylist()
            cnt.update(col)
            total += len(col)
        heavy = [t for t, c in cnt.items() if c >= HH_PHI * total]
        if total:
            # heavy candidates + one sentinel row (term NULL, N_p)
            yield pa.record_batch(
                [pa.array(heavy + [None], pa.string()),
                 pa.array([None] * len(heavy) + [total], pa.int64())],
                names=["term", "part_n"])

    stats = (toks.mapInArrow(_local_stats,
                             schema="term string, part_n bigint")
             .localCheckpoint())
    cands = stats.where(F.col("term").isNotNull()).select("term").distinct()
    tot = stats.agg(F.sum("part_n").cast("bigint").alias("n"))
    exact = (toks.join(F.broadcast(cands), "term")
             .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    return (exact.crossJoin(F.broadcast(tot))
            .where(F.col("cnt")
                   >= F.ceil(F.lit(HH_PHI) * F.col("n")).cast("bigint"))
            .select("term", F.col("cnt").cast("bigint").alias("cnt")))


# ------------------------------------------------ exact phrase search

PHRASE = ("slow", "hash", "batch")


@register(
    "text_phrase_search",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {tokens_sql('text')} AS toks FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_filter(range(1, greatest(len(toks) - {len(PHRASE) - 1},
                                           0) + 1),
               i -> {' AND '.join(
                   f"toks[i + {k}] = '{w}'"
                   for k, w in enumerate(PHRASE))}) AS hits
      FROM t
    )
    SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
           CAST(hits[1] - 1 AS BIGINT) AS first_pos
    FROM h WHERE len(hits) > 0
    """,
    tags=("text", "search", "phrase", "positional"))
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search: documents containing the query words as a
    CONSECUTIVE token run, with occurrence count and first 0-based token
    position — the positional-match primitive under quote-queries,
    contamination span lookup, and n-gram overlap auditing. Positional
    word-grams (order- and multiplicity-preserving zip_with chain) turn
    the phrase test into a per-row array scan: NO explode, NO join, NO
    shuffle — the corpus is read once and every operation is a columnar
    expression, so the 100 TB cost is exactly one pass over the text
    column. Over a pre-materialized positional inverted index the same
    query becomes a k-way posting intersection keyed on (doc, pos);
    corpus-resident as here, the single scan IS the optimal plan — there
    is nothing to intersect until postings have been paid for.

    Reference scope: content predicates over scanned records are
    delegated filters (SURVEY.md S2b); this extends the text family
    (BM25 ranked retrieval) with exact-match retrieval."""
    docs = load(spark, sf_dir, "documents")
    phrase = F.lit(" ".join(PHRASE))
    grams = word_gram_positions(tokens("text"), len(PHRASE))
    hit = (docs
           .select("doc_id",
                   F.size(F.filter(grams, lambda g: g == phrase))
                    .cast("bigint").alias("n_hits"),
                   (F.array_position(grams, phrase) - 1).cast("bigint")
                   .alias("first_pos")))
    return hit.where(F.col("n_hits") > 0)


# ------------------------------------------- PMI co-occurrence mining

PMI_MIN_PAIR_DOCS = 5
PMI_TOP_K = 100


@register(
    "text_pmi_cooccurrence",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest({tokens_sql('text')}) AS term
      FROM documents
    ),
    ca AS (SELECT term, COUNT(*) AS c FROM dt GROUP BY term),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM dt),
    pairs AS (
      SELECT a.term AS ta, b.term AS tb, COUNT(*) AS cab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
    )
    SELECT ta, tb, CAST(cab AS BIGINT) AS n_docs_both,
           round(ln((CAST(cab AS DOUBLE) * n)
                    / (CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))), 6)
             + 0.0 AS pmi
    FROM pairs
    JOIN ca x ON x.term = ta JOIN ca y ON y.term = tb CROSS JOIN nd
    WHERE cab >= {PMI_MIN_PAIR_DOCS}
    ORDER BY pmi DESC, ta, tb LIMIT {PMI_TOP_K}
    """,
    tags=("text", "cooccurrence", "statistics", "topk"))
def text_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOP_K} token pairs by pointwise mutual information at
    document granularity: pmi(a,b) = ln(P(a,b) / (P(a)P(b))) with
    document-frequency probabilities — the collocation/phrase-mining
    statistic corpus analyses run before vocabulary or tokenizer
    decisions. Deterministic top-k: rank on round(pmi, 6) (absorbing
    the engines' ln ulp, the text_bigram_lm_score discipline) with
    (ta, tb) tie-break.

    Scale shape: the doc-term posting relation is per-doc DISTINCT
    tokens, so the pair join keyed on doc_id is bounded by
    sum_d(u_d^2) with u_d = per-doc distinct vocabulary — the same
    quadratic-per-block bound every blocked self-join in dedup carries
    (operators/dedup.py df-cap discipline applies verbatim when u_d is
    unbounded: drop terms with extreme document frequency first; here
    the fixture vocabulary is small). Term counts (vocabulary-sized)
    broadcast onto the pair relation, and the final top-k is
    TakeOrderedAndProject — per-partition top-{PMI_TOP_K} then a
    bounded merge, never a global sort.

    Reference scope: delegated corpus analytics (SURVEY.md S2c), the
    co-occurrence member of the text family."""
    docs = load(spark, sf_dir, "documents")
    dt = (docs.select("doc_id",
                      F.explode(F.array_distinct(tokens("text")))
                      .alias("term")))
    ca = dt.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    nd = dt.agg(F.count_distinct("doc_id").cast("double").alias("n"))
    a = dt.alias("a")
    b = dt.alias("b")
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (F.col("a.term") < F.col("b.term")))
             .groupBy(F.col("a.term").alias("ta"),
                      F.col("b.term").alias("tb"))
             .agg(F.count(F.lit(1)).alias("cab"))
             .where(F.col("cab") >= PMI_MIN_PAIR_DOCS))
    pmi = F.round(
        F.log((F.col("cab").cast("double") * F.col("n"))
              / (F.col("x.c").cast("double") * F.col("y.c").cast("double"))),
        6) + 0.0
    return (pairs
            .join(F.broadcast(ca.alias("x")), F.col("x.term") == F.col("ta"))
            .join(F.broadcast(ca.alias("y")), F.col("y.term") == F.col("tb"))
            .crossJoin(F.broadcast(nd))
            .select("ta", "tb",
                    F.col("cab").cast("bigint").alias("n_docs_both"),
                    pmi.alias("pmi"))
            .orderBy(F.col("pmi").desc(), "ta", "tb")
            .limit(PMI_TOP_K))


# ------------------------------------------------ RAKE keyword extraction

RAKE_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "as", "by", "at", "it", "this", "that", "be", "are", "was",
    "from", "not", "but", "we", "you", "they", "has", "have", "had",
)
RAKE_TOP_K = 3     # keyword phrases per document


def _rake_oracle() -> str:
    stop = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    toks = tokens_sql("text")
    return f"""
    WITH t AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ), pos AS (
      SELECT doc_id, i AS pos, toks[i] AS tok,
             CASE WHEN toks[i] IN ({stop}) THEN 1 ELSE 0 END AS is_stop
      FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
    ), grp AS (
      SELECT doc_id, pos, tok, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS phrase_id
      FROM pos
    ), words AS (
      SELECT doc_id, phrase_id, pos, tok FROM grp WHERE is_stop = 0
    ), plen AS (
      SELECT doc_id, phrase_id, COUNT(*) AS plen
      FROM words GROUP BY doc_id, phrase_id
    ), wstat AS (
      SELECT w.doc_id, w.tok,
             COUNT(*) AS freq,
             CAST(SUM(p.plen) AS BIGINT) AS degree
      FROM words w JOIN plen p USING (doc_id, phrase_id)
      GROUP BY w.doc_id, w.tok
    ), scored_words AS (
      SELECT w.doc_id, w.phrase_id, w.pos,
             CAST(s.degree AS DOUBLE) / s.freq AS wscore
      FROM words w JOIN wstat s ON s.doc_id = w.doc_id AND s.tok = w.tok
    ), phrases AS (
      SELECT w.doc_id, w.phrase_id,
             string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(sw.wscore ORDER BY sw.pos)),
               (acc, x) -> acc + x) AS score
      FROM words w JOIN scored_words sw
        ON sw.doc_id = w.doc_id AND sw.phrase_id = w.phrase_id
           AND sw.pos = w.pos
      GROUP BY w.doc_id, w.phrase_id
    ), dedup AS (
      SELECT doc_id, phrase, MAX(score) AS score
      FROM phrases GROUP BY doc_id, phrase
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase,
           round(score, 6) + 0.0 AS score
    FROM (
      SELECT doc_id, phrase, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, phrase) AS rank
      FROM dedup
    ) WHERE rank <= {RAKE_TOP_K}
    """


@register(
    "text_keyword_rake",
    oracle=_rake_oracle(),
    tags=("text", "keywords", "rake"), bench=True)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYWORD EXTRACTION by RAKE (Rapid Automatic Keyword Extraction):
    candidate phrases are maximal stopword-free token runs; each word
    scores degree/frequency within the document (degree = total length
    of phrases it appears in — favors words that live in long
    multi-word phrases); a phrase scores the sum of its words' scores;
    the top {RAKE_TOP_K} phrases per document come back ranked. The
    classic model-free keyword tagger a corpus pipeline runs for search
    facets, dataset cards, and topic drill-downs.

    Construction is gaps-and-islands: position-exploded tokens, a
    per-document running sum of stopword flags as the phrase id (the
    sessionization trick applied to text), then pure integer
    frequency/degree aggregates. The one float reduction — a phrase's
    word-score sum — is an ORDERED fold over (pos)-sorted scores
    (F.aggregate / list_reduce), because double addition is not
    associative and a groupBy SUM would be partition-order dependent;
    identical fold order makes both engines bit-identical before the
    shared round(6). Duplicate phrase texts within a document collapse
    to their max score (MAX over identical doubles is order-safe).

    Scale shape: every window and aggregate is doc_id-partitioned (a
    document's tokens co-locate once and every stage reuses that
    partitioning); the only corpus-wide op is the final per-doc top-k
    group-limit. Nothing global, nothing entity-scaled windowed.

    Reference scope: text-analysis north star (SURVEY.md S2c), the
    keyword member next to tf-idf/bm25/PMI.
    """
    docs = load(spark, sf_dir, "documents")
    toks = (docs.select("doc_id",
                        F.posexplode(tokens("text"))
                        .alias("pos0", "tok"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok",
                    F.col("tok").isin(*RAKE_STOPWORDS).cast("int")
                    .alias("is_stop")))
    wp = (Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    grp = toks.withColumn("phrase_id", F.sum("is_stop").over(wp))
    # words embeds the phrase-id window (exchange + per-doc sort) and
    # feeds THREE consumers (plen, wstat, scored) — persist computes
    # that window once instead of once per consumer (A/B r13; the
    # recompute-beats-persist calls elsewhere are over cheap projection
    # subtrees, not window subtrees)
    words = (grp.where(F.col("is_stop") == 0)
             .select("doc_id", "phrase_id", "pos", "tok")
             .persist())
    plen = (words.groupBy("doc_id", "phrase_id")
            .agg(F.count(F.lit(1)).alias("plen")))
    wstat = (words.join(plen, ["doc_id", "phrase_id"])
             .groupBy("doc_id", "tok")
             .agg(F.count(F.lit(1)).alias("freq"),
                  F.sum("plen").cast("bigint").alias("degree")))
    scored = (words.join(wstat, ["doc_id", "tok"])
              .select("doc_id", "phrase_id", "pos", "tok",
                      (F.col("degree").cast("double") / F.col("freq"))
                      .alias("wscore")))
    ordered = F.array_sort(F.collect_list(F.struct("pos", "tok", "wscore")))
    phrases = (scored.groupBy("doc_id", "phrase_id")
               .agg(ordered.alias("ws"))
               .select("doc_id",
                       F.array_join(F.transform("ws", lambda s: s["tok"]),
                                    " ").alias("phrase"),
                       F.aggregate(F.transform("ws", lambda s: s["wscore"]),
                                   F.lit(0.0),
                                   lambda acc, x: acc + x).alias("score")))
    dedup = (phrases.groupBy("doc_id", "phrase")
             .agg(F.max("score").alias("score")))
    wr = Window.partitionBy("doc_id").orderBy(F.desc("score"), "phrase")
    return (dedup.withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= RAKE_TOP_K)
            .select("doc_id", F.col("rank").cast("bigint").alias("rank"),
                    "phrase", (F.round("score", 6) + 0.0).alias("score")))


# ------------------------------------------------ vocabulary coverage curve

VOCAB_KS = (100, 1000, 5000)   # candidate vocabulary sizes


def _vocab_coverage_oracle() -> str:
    toks = tokens_sql("text")
    legs = " UNION ALL ".join(f"""
      SELECT {k} AS vocab_size,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM (
                SELECT term FROM cnts ORDER BY cnt DESC, term LIMIT {k}))
               AS n_vocab_terms,
             (SELECT CAST(SUM(cnt) AS BIGINT) FROM (
                SELECT cnt FROM cnts ORDER BY cnt DESC, term LIMIT {k}))
               AS covered_tokens""" for k in VOCAB_KS)
    return f"""
    WITH toks AS (
      SELECT unnest({toks}) AS term FROM documents
    ), cnts AS (
      SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM cnts
    ), legs AS ({legs})
    SELECT l.vocab_size, l.n_vocab_terms, l.covered_tokens,
           t.n AS total_tokens, t.n_distinct AS distinct_terms,
           CAST(l.covered_tokens AS DOUBLE) / t.n AS coverage
    FROM legs l, tot t
    """


@register(
    "text_vocab_coverage",
    oracle=_vocab_coverage_oracle(),
    tags=("text", "vocabulary", "tokenizer"))
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VOCABULARY COVERAGE curve: for candidate vocabulary sizes
    {VOCAB_KS}, what fraction of all token OCCURRENCES the top-K most
    frequent terms cover — the first number a tokenizer/vocab design
    reads (where the Zipf curve's knee sits decides vocab size, OOV
    rate, and how much long-tail text a fixed vocab throws away).

    Scale shape: term counts are one hash aggregate; each K's covered
    mass comes from a TakeOrderedAndProject top-K over the AGGREGATED
    vocab relation (deterministic (cnt DESC, term) order) — never a
    global rank window over the vocabulary (the abc_pareto rule: at
    web scale the vocab relation is itself huge); K legs are
    independent tiny jobs unioned with the corpus totals broadcast on.

    Exactness: pure integer counts; the coverage ratio is one
    bigint/bigint double division in both engines.

    Reference scope: text-analysis north star (SURVEY.md S2c), the
    tokenizer-design member next to token_stats/heavy_hitters."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("term"))
    cnts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnts.agg(F.sum("cnt").cast("bigint").alias("total_tokens"),
                   F.count(F.lit(1)).cast("bigint").alias("distinct_terms"))
    legs = None
    for k in VOCAB_KS:
        top = (cnts.orderBy(F.desc("cnt"), "term").limit(k)
               .agg(F.count(F.lit(1)).cast("bigint")
                    .alias("n_vocab_terms"),
                    F.sum("cnt").cast("bigint").alias("covered_tokens"))
               .select(F.lit(k).alias("vocab_size"),
                       "n_vocab_terms", "covered_tokens"))
        legs = top if legs is None else legs.unionAll(top)
    return (legs.crossJoin(F.broadcast(tot))
            .select("vocab_size", "n_vocab_terms", "covered_tokens",
                    "total_tokens", "distinct_terms",
                    (F.col("covered_tokens").cast("double")
                     / F.col("total_tokens")).alias("coverage")))


# ------------------------------------------------ corpus mix entropy

@register(
    "corpus_mix_entropy",
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ), t AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM c GROUP BY lang
    ), shares AS (
      SELECT c.lang, t.tot, t.n_sources,
             list(CAST(c.n AS DOUBLE) / t.tot ORDER BY c.source) AS ps
      FROM c JOIN t USING (lang)
      GROUP BY c.lang, t.tot, t.n_sources
    )
    SELECT lang, tot AS n_docs, n_sources,
           round(-list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list_transform(ps, p -> p * ln(p))),
               (acc, x) -> acc + x), 6) + 0.0 AS entropy,
           CASE WHEN n_sources > 1 THEN
             round(-list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list_transform(ps, p -> p * ln(p))),
                 (acc, x) -> acc + x) / ln(CAST(n_sources AS DOUBLE)), 6)
               + 0.0
           ELSE 0.0 END AS norm_entropy
    FROM shares
    """,
    tags=("text", "entropy", "domain-mix"))
def corpus_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE-MIX ENTROPY per language: the Shannon entropy of each
    language's source distribution, plus the [0,1]-normalized form
    (entropy / ln(#sources)) — the one-number diversity check a
    domain-mix sampler reads before and after rebalancing (a
    low-entropy language is dominated by one crawl source; training on
    it overfits that source's artifacts).

    Exactness: shares are bigint-ratio doubles; -sum(p ln p) is an
    ORDERED fold over source-sorted shares (the EWMA discipline —
    groupBy SUM of float terms is partition-order-dependent), with
    round(6) absorbing the last-ulp libm ln() difference between
    engines (the bigram-LM/PMI precedent).

    Scale shape: two tiny hash aggregates; the fold runs over at most
    #sources elements per language — the relation in play after the
    first aggregate is (languages x sources), constant-bounded.

    Reference scope: text-analysis north star (SURVEY.md S2c), the
    diversity member next to sample_domain_mix."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.groupBy("lang").agg(F.sum("n").cast("bigint").alias("tot"),
                              F.count(F.lit(1)).cast("bigint")
                              .alias("n_sources"))
    shares = (c.join(t, "lang")
              .groupBy("lang", "tot", "n_sources")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("source", "n"))),
                  lambda s: s["n"].cast("double") / F.col("tot"))
                  .alias("ps")))
    ent = -F.aggregate(
        F.transform("ps", lambda p: p * F.log(p)),
        F.lit(0.0), lambda acc, x: acc + x)
    return shares.select(
        "lang", F.col("tot").alias("n_docs"), "n_sources",
        (F.round(ent, 6) + 0.0).alias("entropy"),
        F.when(F.col("n_sources") > 1,
               F.round(ent / F.log(F.col("n_sources").cast("double")), 6)
               + 0.0)
        .otherwise(F.lit(0.0)).alias("norm_entropy"))


ZIPF_TOP_N = 100


@register(
    "text_zipf_slope",
    oracle=f"""
    WITH terms AS (
      SELECT t.term, COUNT(*) AS cnt
      FROM documents d, UNNEST({tokens_sql('d."text"')}) AS t(term)
      GROUP BY t.term
    ), top AS (
      SELECT term, cnt FROM terms
      ORDER BY cnt DESC, term LIMIT {ZIPF_TOP_N}
    ), ranked AS (
      SELECT term, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rnk
      FROM top
    ), folded AS (
      SELECT COUNT(*) AS n,
             list_reduce(
               list_prepend([0.0, 0.0, 0.0, 0.0]::DOUBLE[],
                 list([ln(CAST(rnk AS DOUBLE)),
                       ln(CAST(cnt AS DOUBLE))]::DOUBLE[] ORDER BY rnk)),
               (acc, e) -> [acc[1] + e[1], acc[2] + e[2],
                            acc[3] + e[1] * e[1],
                            acc[4] + e[1] * e[2]]::DOUBLE[]) AS s
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round((CAST(n AS DOUBLE) * s[4] - s[1] * s[2])
                 / (CAST(n AS DOUBLE) * s[3] - s[1] * s[1]), 6) + 0.0
             AS zipf_slope,
           round((s[2] - (CAST(n AS DOUBLE) * s[4] - s[1] * s[2])
                         / (CAST(n AS DOUBLE) * s[3] - s[1] * s[1])
                         * s[1]) / CAST(n AS DOUBLE), 6) + 0.0
             AS log_intercept
    FROM folded
    """,
    tags=("text", "statistics", "corpus-health"))
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF RANK-FREQUENCY slope of the corpus: OLS fit of ln(freq) on
    ln(rank) over the top {ZIPF_TOP_N} terms — natural language sits
    near slope -1; a corpus whose slope drifts far from it (too flat =
    boilerplate/templating, too steep = tiny vocabulary) fails the
    health check before training data ships.

    Exactness: term counts are exact integers; ln() runs on identical
    doubles in both engines and the four OLS moments accumulate in ONE
    ordered fold by rank (fixed left-to-right summation), so slope and
    intercept agree to the rounded 6 dp (the libm-ln discipline of the
    text-scoring rows).

    Scale shape: one corpus scan into a (term) hash aggregate, a
    global top-{ZIPF_TOP_N} (TakeOrdered — no full sort), then all
    windows/folds run on the {ZIPF_TOP_N}-row relation. The corpus
    never sorts; the fit never sees more than {ZIPF_TOP_N} points."""
    docs = load(spark, sf_dir, "documents")
    terms = (docs.select(F.explode(tokens(F.col("text"))).alias("term"))
             .groupBy("term").agg(F.count(F.lit(1)).alias("cnt")))
    top = terms.orderBy(F.desc("cnt"), F.asc("term")).limit(ZIPF_TOP_N)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = top.select(
        F.row_number().over(w).alias("rnk"),
        F.log(F.col("cnt").cast("double")).alias("ly"))
    lx = F.log(F.col("rnk").cast("double"))
    pts = ranked.select("rnk", lx.alias("lx"), "ly")
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("rnk", "lx", "ly"))),
        lambda s: F.struct(s["lx"].alias("lx"), s["ly"].alias("ly")))
    init = F.struct(F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy"),
                    F.lit(0.0).alias("sxx"), F.lit(0.0).alias("sxy"))
    folded = pts.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.aggregate(arr, init,
                    lambda a, e: F.struct(
                        (a.sx + e.lx).alias("sx"),
                        (a.sy + e.ly).alias("sy"),
                        (a.sxx + e.lx * e.lx).alias("sxx"),
                        (a.sxy + e.lx * e.ly).alias("sxy"))).alias("s"))
    nd = F.col("n").cast("double")
    slope = ((nd * F.col("s.sxy") - F.col("s.sx") * F.col("s.sy"))
             / (nd * F.col("s.sxx") - F.col("s.sx") * F.col("s.sx")))
    return folded.select(
        F.col("n").cast("bigint").alias("n_terms"),
        (F.round(slope, 6) + 0.0).alias("zipf_slope"),
        (F.round((F.col("s.sy") - slope * F.col("s.sx")) / nd, 6)
         + 0.0).alias("log_intercept"))
