"""Training-data pipeline operators — the reproducibility-critical steps
between a raw corpus and a training mix, each expressed as a declarative
plan (SURVEY.md §2c posture: partition-parallel, no driver collects, no
RNG state).

Everything here keys on the portable content/ID hash instead of Spark's
seeded samplers: `sample(fraction, seed)` and `sampleBy` are
partitioning-dependent (resample when the input splits change), which is
exactly what a 100 TB training pipeline cannot tolerate. Hash-based
selection is stable across cluster sizes, re-runs, and engines — and
therefore oracle-checkable.

- sample_hash_stratified : per-language sampling rates, deterministic
- sample_domain_mix      : data-derived acceptance rates hitting target
                           mix proportions, hash-gated
- split_train_val_test   : stable 3-way split by ID hash
- pack_context_windows   : greedy sequential packing of documents into
                           fixed token budgets (context windows)
- embedding_quantize_int8: scalar int8 quantization + max reconstruction
                           error (the ANN storage-compression step)
- text_scrub             : PII-ish scrubbing (emails/URLs) via regex
                           (patterns restricted to syntax Java regex and
                           RE2 interpret identically)
- pipeline_end_to_end    : the composed prep job (quality -> dedup ->
                           split -> accounting) as one declarative plan
- decontaminate_eval_overlap : benchmark decontamination — flag training
                           docs sharing word n-grams with a held-out
                           eval set (broadcast eval postings)
- chunk_documents        : fixed-size overlapping token chunks per doc
                           (row-local explode, the RAG/context prep step)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import (portable_hash, portable_hash_sql, tokens,
                                  tokens_sql, word_shingles,
                                  word_shingles_sql)
from ..plans.registry import register
from ..tables import load

# per-language keep-rates (percent): downsample the dominant language,
# keep the tail — the standard training-mix rebalance
STRATA_PCT = {"en": 50, "es": 25, "de": 75, "fr": 100}
DEFAULT_PCT = 10


def _rate_case_sql() -> str:
    whens = " ".join(f"WHEN lang = '{k}' THEN {v}"
                     for k, v in STRATA_PCT.items())
    return f"CASE {whens} ELSE {DEFAULT_PCT} END"


@register(
    "sample_hash_stratified",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS first_doc
    FROM documents
    WHERE {portable_hash_sql('CAST(doc_id AS VARCHAR)')} % 100
          < {_rate_case_sql()}
    GROUP BY lang
    """,
    tags=("pipeline", "sampling", "deterministic"))
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling by language with DETERMINISTIC hash gates:
    doc kept iff hash(doc_id) % 100 < rate(lang). Unlike seeded
    `sampleBy`, membership is a pure function of the row — stable under
    repartitioning, retries, engine changes, and incremental reruns
    (a doc's fate never flips when the corpus grows). One scan, no
    shuffle before the count."""
    docs = load(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in STRATA_PCT.items()],
        F.lit(DEFAULT_PCT))
    gate = portable_hash(F.col("doc_id").cast("string")) % 100 < rate
    return (docs.where(gate)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.min("doc_id").alias("first_doc")))


SAMPLE_EXACT_K = 100


@register(
    "sample_exact_k",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (ORDER BY
               {portable_hash_sql("'k:' || CAST(doc_id AS VARCHAR)")},
               doc_id) AS r
      FROM documents) WHERE r <= {SAMPLE_EXACT_K}
    """,
    tags=("pipeline", "sampling", "deterministic", "exact-k"))
def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k uniform sample without RNG state: rank every row by a
    salted content hash and keep the k smallest — the distributed
    replacement for reservoir sampling. A reservoir needs sequential
    state (and merges per partition); hash-rank is embarrassingly
    parallel, exactly k, uniform over any corpus, and REPRODUCIBLE: the
    same k docs come back under repartitioning, retries, or engine
    changes, and growing the corpus displaces members only as new docs
    hash below the current k-th rank — the property incremental
    pipelines need for stable eval subsets. The salt ('k:')
    decorrelates membership from every other hash gate.

    Scale shape: orderBy(hash).limit(k) plans as TakeOrderedAndProject —
    per-partition top-k then a P*k-row merge; the corpus is never
    globally sorted. Ties on the 60-bit hash break on doc_id."""
    docs = load(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.lit("k:"),
                               F.col("doc_id").cast("string")))
    return (docs.select("doc_id", "lang", "n_chars", h.alias("h"))
            .orderBy("h", "doc_id").limit(SAMPLE_EXACT_K)
            .select("doc_id", "lang", "n_chars"))


SAMPLE_GROUP_K = 20


@register(
    "sample_stratified_exact_k",
    oracle=f"""
    SELECT lang, doc_id, n_chars FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
               {portable_hash_sql("'gk:' || CAST(doc_id AS VARCHAR)")},
               doc_id) AS r
      FROM documents) WHERE r <= {SAMPLE_GROUP_K}
    """,
    tags=("pipeline", "sampling", "deterministic", "stratified",
          "exact-k"))
def sample_stratified_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k PER GROUP, deterministically: hash-rank within each
    language and keep the {SAMPLE_GROUP_K} smallest — the stratified twin
    of sample_exact_k (rate-based stratified sampling keeps a
    *proportion* per stratum; eval-set construction usually needs an
    exact per-stratum count). Plans as a WindowGroupLimit: per-partition
    partial top-k per group before the single hash shuffle on lang, so
    the full corpus never sorts and the shuffle carries at most
    partitions x groups x k rows. Same hash-gate determinism contract as
    the other samplers; fresh salt ('gk:') decorrelates from them."""
    docs = load(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.lit("gk:"),
                               F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    return (docs.select("lang", "doc_id", "n_chars",
                        F.row_number().over(w).alias("r"))
            .where(F.col("r") <= SAMPLE_GROUP_K)
            .select("lang", "doc_id", "n_chars"))


@register(
    "sample_weighted_exact_k",
    oracle=f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (ORDER BY
               round(ln(({portable_hash_sql(
                   "'wk:' || CAST(doc_id AS VARCHAR)")} + 1.0)
                        / 1152921504606846977.0)
                     / GREATEST(n_chars, 1), 9) DESC,
               doc_id) AS r
      FROM documents) WHERE r <= {SAMPLE_EXACT_K}
    """,
    tags=("pipeline", "sampling", "weighted", "deterministic", "exact-k"))
def sample_weighted_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k sampling with PROBABILITY PROPORTIONAL TO WEIGHT
    (Efraimidis-Spirakis A-ES: rank by u^(1/w), here in log space as
    ln(u)/w with u a salted-hash uniform in (0,1]) — the standard way a
    training pipeline over-samples long/high-quality documents while
    keeping exactly k and full determinism. Same scale shape as
    sample_exact_k: orderBy().limit() = TakeOrderedAndProject, no global
    sort, no RNG state, membership reproducible under repartitioning.
    The rank keys on the score ROUNDED to 9 dp in both engines so a
    last-ulp ln() divergence cannot reorder near-ties; remaining ties
    break on doc_id. Weight floor of 1 guards zero-char docs."""
    docs = load(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.lit("wk:"),
                               F.col("doc_id").cast("string")))
    # u in (0,1]: (h+1) / (2^60 + 1); 60-bit hash -> exact double
    u = (h + F.lit(1.0)) / F.lit(float(2**60 + 1))
    key = F.round(F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)), 9)
    return (docs.select("doc_id", "lang", "n_chars", key.alias("k"))
            .orderBy(F.desc("k"), "doc_id").limit(SAMPLE_EXACT_K)
            .select("doc_id", "lang", "n_chars"))


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars,
                 {portable_hash_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                 AS h
          FROM documents)
    GROUP BY 1
    """,
    tags=("pipeline", "split", "deterministic"))
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by salted ID hash. The salt
    ('split:') decorrelates this gate from any other hash-based decision
    (sampling, sharding) — without it, 'kept by the 80% sampler' and 'in
    train' would be the same event. Assignment is row-local: no shuffle,
    no state, reproducible anywhere."""
    docs = load(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.lit("split:"),
                               F.col("doc_id").cast("string"))) % 100
    split = (F.when(h < 80, "train").when(h < 90, "val").otherwise("test"))
    return (docs.select(split.alias("split"), "n_chars")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


# target mix weights (relative proportions) for the training corpus;
# languages absent from the map are excluded from the mix
MIX_WEIGHTS = {"en": 4, "zh": 2, "de": 1, "fr": 1}


def _mix_weight_case_sql() -> str:
    whens = " ".join(f"WHEN lang = '{k}' THEN {v}"
                     for k, v in MIX_WEIGHTS.items())
    return f"CASE {whens} ELSE 0 END"


@register(
    "sample_domain_mix",
    oracle=f"""
    WITH stats AS (
      SELECT lang, COUNT(*) AS n_total, {_mix_weight_case_sql()} AS w
      FROM documents GROUP BY lang
    ), wstats AS (
      SELECT * FROM stats WHERE w > 0
    ), k AS (
      SELECT MIN(CAST(n_total AS DOUBLE) / w) AS k FROM wstats
    ), targets AS (
      SELECT lang, n_total,
             CAST(FLOOR(w * k.k) AS BIGINT) AS n_target,
             CAST(FLOOR(CAST(FLOOR(w * k.k) AS BIGINT) * 1000000.0
                        / n_total) AS BIGINT) AS thr
      FROM wstats CROSS JOIN k
    )
    SELECT d.lang, t.n_total, t.n_target, COUNT(*) AS n_sampled
    FROM documents d JOIN targets t ON d.lang = t.lang
    WHERE {portable_hash_sql("'mix:' || CAST(doc_id AS VARCHAR)")}
          % 1000000 < t.thr
    GROUP BY d.lang, t.n_total, t.n_target
    """,
    tags=("pipeline", "sampling", "mix", "deterministic"))
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix rebalancing to TARGET PROPORTIONS (en:zh:de:fr =
    4:2:1:1 here): from per-language counts, find the largest corpus
    satisfying the mix (K = min n_l/w_l), derive each language's target
    size and integer acceptance threshold, then keep rows by salted-hash
    gate. Unlike fixed per-stratum rates (sample_hash_stratified), the
    rates are DERIVED from the data to hit the mix exactly.

    Scale shape: the per-language stats are one tiny hash agg; targets
    broadcast back; the gate itself is row-local (no shuffle of the
    corpus). Every arithmetic step is either integer or a single IEEE
    double op mirrored verbatim in the oracle, and membership is a pure
    function of the row — stable under repartitioning and engines."""
    docs = load(spark, sf_dir, "documents")
    w = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v))
          for k, v in MIX_WEIGHTS.items()],
        F.lit(0))
    stats = (docs.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_total"))
             .withColumn("w", w).where(F.col("w") > 0))
    k = stats.agg(F.min(F.col("n_total").cast("double") / F.col("w"))
                  .alias("k"))
    targets = (stats.crossJoin(F.broadcast(k))
               .withColumn("n_target",
                           F.floor(F.col("w") * F.col("k")).cast("bigint"))
               .withColumn("thr",
                           F.floor(F.col("n_target") * 1000000.0
                                   / F.col("n_total")).cast("bigint"))
               .select("lang", "n_total", "n_target", "thr"))
    gate = portable_hash(F.concat(F.lit("mix:"),
                                  F.col("doc_id").cast("string"))) \
        % 1000000 < F.col("thr")
    return (docs.join(F.broadcast(targets), "lang")
            .where(gate)
            .groupBy("lang", "n_total", "n_target")
            .agg(F.count(F.lit(1)).alias("n_sampled")))


TEMP_ALPHA_SQRT = True   # temperature tau=2 <=> p^(1/tau) = sqrt(p)
TEMP_BUDGET_FRAC = 2     # kept budget = floor(total / this)


@register(
    "sample_temperature",
    oracle=f"""
    WITH stats AS (
      SELECT lang, COUNT(*) AS n_total, sqrt(COUNT(*)) AS srt
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(CAST(srt AS DECIMAL(27,12))) AS DOUBLE) AS s,
             CAST(SUM(n_total) AS BIGINT) AS n
      FROM stats
    ),
    targets AS (
      SELECT lang, n_total,
             CAST(FLOOR(LEAST(
               1.0,
               (CAST(n // {TEMP_BUDGET_FRAC} AS DOUBLE) * (srt / s))
                 / n_total) * 1000000.0) AS BIGINT) AS thr
      FROM stats CROSS JOIN tot
    )
    SELECT d.lang, t.n_total, t.thr, COUNT(*) AS n_sampled
    FROM documents d JOIN targets t ON d.lang = t.lang
    WHERE {portable_hash_sql("'temp:' || CAST(doc_id AS VARCHAR)")}
          % 1000000 < t.thr
    GROUP BY d.lang, t.n_total, t.thr
    """,
    tags=("pipeline", "sampling", "temperature", "deterministic"))
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-BASED language sampling (tau = 2): kept mass per
    language proportional to sqrt(n_l) — the standard multilingual
    rebalancing that upweights low-resource languages without flattening
    the mix entirely (tau -> inf = uniform, tau = 1 = natural). A fixed
    kept budget (half the corpus) is split by the tempered weights and
    converted to per-language integer acceptance thresholds; membership
    is then the usual salted row hash.

    Determinism across engines: sqrt is IEEE-correctly-rounded in both;
    the weight NORMALIZER (the only multi-language sum) goes through the
    decimal-cast so summation order cannot flip a threshold; every
    remaining step is a single mirrored double op. Scale shape is
    sample_domain_mix's: tiny agg -> broadcast targets -> row-local
    gate; the corpus never shuffles."""
    docs = load(spark, sf_dir, "documents")
    stats = (docs.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_total"))
             .withColumn("srt", F.sqrt(F.col("n_total"))))
    tot = stats.agg(
        F.sum(F.col("srt").cast("decimal(27,12)")).cast("double").alias("s"),
        F.sum("n_total").cast("bigint").alias("n"))
    budget = (F.col("n") / TEMP_BUDGET_FRAC).cast("bigint").cast("double")
    rate = F.least(F.lit(1.0),
                   (budget * (F.col("srt") / F.col("s"))) / F.col("n_total"))
    targets = (stats.crossJoin(F.broadcast(tot))
               .withColumn("thr",
                           F.floor(rate * 1000000.0).cast("bigint"))
               .select("lang", "n_total", "thr"))
    gate = portable_hash(F.concat(F.lit("temp:"),
                                  F.col("doc_id").cast("string"))) \
        % 1000000 < F.col("thr")
    return (docs.join(F.broadcast(targets), "lang")
            .where(gate)
            .groupBy("lang", "n_total", "thr")
            .agg(F.count(F.lit(1)).alias("n_sampled")))


TOKEN_BUDGET = 512   # context-window size in (whitespace) tokens


@register(
    "pack_context_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                             t -> t != '')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
                  / {TOKEN_BUDGET}) AS BIGINT) AS window_id
      FROM toks
    )
    SELECT lang, window_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS window_tokens
    FROM packed
    GROUP BY lang, window_id
    """,
    tags=("pipeline", "packing", "window"))
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents (in stable doc_id order, per
    language shard) to fixed token-budget context windows by running
    cumulative token count — window_id = floor((cumsum-1)/budget). This
    is the deterministic streaming-friendly packing (each shard is one
    sort + one pass); windows can overflow by at most one document, the
    standard greedy tradeoff vs bin-packing. One shuffle on the shard
    key; cumsum never materializes per-group state."""
    from ..functions.portable import tokens

    docs = load(spark, sf_dir, "documents")
    w = (Window.partitionBy("lang").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    toks = docs.select("doc_id", "lang",
                       F.size(tokens("text")).alias("n_tokens"))
    packed = toks.withColumn(
        "window_id",
        F.floor((F.sum("n_tokens").over(w) - 1) / TOKEN_BUDGET)
        .cast("bigint"))
    return (packed.groupBy("lang", "window_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("window_tokens")))


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH stats AS (
      SELECT vec_id, embedding,
             list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS lo,
             list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS hi
      FROM embeddings
    ), q AS (
      SELECT vec_id,
             CASE WHEN hi = lo THEN list_transform(embedding, x -> 0)
                  ELSE list_transform(embedding,
                    x -> CAST(round((CAST(x AS DOUBLE) - lo) * 255.0
                                    / (hi - lo), 0) AS INT)) END AS codes,
             lo, hi
      FROM stats
    )
    SELECT vec_id,
           codes[1] AS first_code, codes[64] AS last_code,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           round(lo, 6) + 0.0 AS scale_lo, round(hi, 6) + 0.0 AS scale_hi
    FROM q
    """,
    tags=("pipeline", "quantization", "embedding"))
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (min/max affine, 0..255) — the
    4x storage compression step before ANN indexing at scale. Entirely
    within-row (JVM array lambdas, no shuffle); the (lo, hi) scale pair
    rides along for dequantization. Output projects code checksums so the
    oracle pins every code without hashing a 64-wide array column.

    round() half-up vs half-even: quantized midpoints (x.5) would tie-
    break differently across engines, but (x-lo)*255/(hi-lo) on this
    data never lands on an exact .5 (asserted by the hash match at two
    SFs — binary64 division makes exact dyadic midpoints measure-zero)."""
    emb = load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    lo = F.array_min(as_double)
    hi = F.array_max(as_double)
    stats = emb.select("vec_id", "embedding",
                       lo.alias("lo"), hi.alias("hi"))
    codes = F.when(
        F.col("hi") == F.col("lo"),
        F.transform("embedding", lambda x: F.lit(0))
    ).otherwise(F.transform(
        "embedding",
        lambda x: F.round((x.cast("double") - F.col("lo")) * 255.0
                          / (F.col("hi") - F.col("lo")), 0).cast("int")))
    q = stats.withColumn("codes", codes)
    return q.select(
        "vec_id",
        F.element_at("codes", 1).alias("first_code"),
        F.element_at("codes", 64).alias("last_code"),
        F.aggregate("codes", F.lit(0).cast("bigint"),
                    lambda a, c: a + c).alias("code_sum"),
        (F.round("lo", 6) + 0.0).alias("scale_lo"),
        (F.round("hi", 6) + 0.0).alias("scale_hi"))


@register(
    "text_scrub",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
             'https?://[a-z0-9./_-]+', '<URL>', 'g') AS scrubbed,
           len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS n_emails,
           len(regexp_extract_all(text, 'https?://[a-z0-9./_-]+')) AS n_urls
    FROM documents
    """,
    tags=("pipeline", "scrub", "regex"))
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-ish scrubbing: replace emails/URLs with placeholder tokens and
    count the redactions (the audit trail). Patterns use only character
    classes + quantifiers — the regex subset Java regex (Spark) and RE2
    (DuckDB) interpret identically; fancier constructs (lookaround,
    backrefs) are where the engines fork. Pure row-local projection."""
    docs = load(spark, sf_dir, "documents")
    email = r"[a-z0-9._]+@[a-z0-9.]+"
    url = r"https?://[a-z0-9./_-]+"
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", email, "<EMAIL>"), url, "<URL>")
    return docs.select(
        "doc_id", scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit(email), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(url), F.lit(0)))
        .alias("n_urls"))


@register(
    "pipeline_end_to_end",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, text,
             len({tokens_sql('text')}) AS n_tokens,
             len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    ), passed AS (
      SELECT doc_id, text, n_tokens FROM feats
      WHERE n_tokens >= 20 AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
    ), deduped AS (
      SELECT doc_id, n_tokens FROM (
        SELECT doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM passed
      ) WHERE rn = 1
    )
    SELECT CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM (SELECT n_tokens,
                 {portable_hash_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                 AS h
          FROM deduped)
    GROUP BY 1
    """,
    tags=("pipeline", "e2e", "composition"))
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data prep pipeline in one declarative plan:
    quality gate (length + punctuation-ratio rules) -> exact dedup
    (first doc per content hash) -> deterministic train/val/test split ->
    per-split token accounting. Each stage is an operator verified
    individually elsewhere; this query pins that they compose — the
    \"switch your whole prep job to this engine\" integration check.

    Scale shape: the quality gate is row-local; dedup shuffles the
    16-byte content hash (never the text) via a window group-limit;
    the split is a row-local salted hash; one final tiny agg. Catalyst
    pipelines all four into three stages."""
    from ..functions.portable import tokens

    docs = load(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id", "text",
        F.size(tokens("text")).alias("n_tokens"),
        F.regexp_count("text", F.lit("[^a-zA-Z0-9 ]")).alias("n_punct"),
        F.length("text").alias("n_chars"))
    passed = feats.where(
        (F.col("n_tokens") >= 20)
        & (F.col("n_punct").cast("double") / F.col("n_chars") < 0.1))
    w = Window.partitionBy(F.md5(F.encode("text", "utf-8"))) \
        .orderBy("doc_id")
    deduped = (passed.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1))
    h = portable_hash(F.concat(F.lit("split:"),
                               F.col("doc_id").cast("string"))) % 100
    split = (F.when(h < 80, "train").when(h < 90, "val").otherwise("test"))
    return (deduped.select(split.alias("split"), "n_tokens")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


# ------------------------------------------------- eval decontamination

CONTAM_N = 4        # words per shingle (short fixture docs; 13 in prod)
EVAL_PCT = 10       # pseudo-eval-set gate, percent of the corpus


def _contam_sets_sql() -> str:
    return f"""
      SELECT doc_id, {word_shingles_sql('text', CONTAM_N)} AS sh,
             {portable_hash_sql("'eval:' || CAST(doc_id AS VARCHAR)")}
               % 100 < {EVAL_PCT} AS is_eval
      FROM documents
    """


@register(
    "decontaminate_eval_overlap",
    oracle=f"""
    WITH sets AS ({_contam_sets_sql()}),
    tp AS (SELECT doc_id, unnest(sh) AS s FROM sets WHERE NOT is_eval),
    ep AS (SELECT doc_id, unnest(sh) AS s FROM sets WHERE is_eval)
    SELECT tp.doc_id AS doc_id,
           COUNT(DISTINCT tp.s) AS n_hit_shingles,
           COUNT(DISTINCT ep.doc_id) AS n_eval_docs
    FROM tp JOIN ep ON tp.s = ep.s
    GROUP BY 1
    """,
    tags=("pipeline", "decontamination", "dedup"), bench=True)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that shares
    a word {CONTAM_N}-gram with the held-out eval set (here: a
    deterministic hash-gated {EVAL_PCT}% of the corpus standing in for the
    benchmark suite). Output is the contamination report — training doc,
    how many distinct shingles leaked, how many eval docs they touch —
    which a prep job anti-joins against before training.

    Scale shape: the eval side of a decontamination run is TINY relative
    to a 100 TB corpus (benchmarks are megabytes), so its exploded posting
    list is broadcast — the corpus-side postings never shuffle; the plan
    is scan -> shingle -> broadcast-hash-join -> partial agg. The shingle
    relation feeds both sides, and as with the jaccard posting join the
    regex shingling is cheap enough that recompute beats a persist
    barrier at this fan-out (see _jaccard_pairs)."""
    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    sets = (docs.repartition(para)
            .select("doc_id", tokens("text").alias("tk"),
                    (portable_hash(
                        F.concat(F.lit("eval:"),
                                 F.col("doc_id").cast("string"))) % 100
                     < EVAL_PCT).alias("is_eval"))
            .select("doc_id", word_shingles("tk", CONTAM_N).alias("sh"),
                    "is_eval"))
    # explode_OUTER: plain explode lets InferFiltersFromGenerate push a
    # size(sh) > 0 guard below the projections, re-evaluating the full
    # shingle pipeline per scan row (r13 plan audit: 8 inlined tokenize
    # calls in the pushed condition); the outer explode's null rows die
    # at the inner join on s instead
    train = (sets.where(~F.col("is_eval"))
             .select("doc_id", F.explode_outer("sh").alias("s")))
    ev = (sets.where(F.col("is_eval"))
          .select(F.col("doc_id").alias("eval_doc"),
                  F.explode_outer("sh").alias("s")))
    return (train.join(F.broadcast(ev), "s")
            .groupBy("doc_id")
            .agg(F.countDistinct("s").alias("n_hit_shingles"),
                 F.countDistinct("eval_doc").alias("n_eval_docs")))


# ------------------------------------------------------ document chunking

CHUNK_TOKENS = 32   # tokens per chunk
CHUNK_STRIDE = 24   # stride between chunk starts (8-token overlap)


@register(
    "chunk_documents",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, {tokens_sql('text')} AS tk FROM documents
    ), pos AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, len(tk), {CHUNK_STRIDE}))
               AS chunk_start
      FROM tk WHERE len(tk) > 0
    )
    SELECT doc_id,
           (chunk_start - 1) // {CHUNK_STRIDE} AS chunk_idx,
           chunk_start,
           len(list_slice(tk, chunk_start,
                          chunk_start + {CHUNK_TOKENS} - 1))
             AS n_chunk_tokens,
           md5(array_to_string(
               list_slice(tk, chunk_start,
                          chunk_start + {CHUNK_TOKENS} - 1), ' '))
             AS chunk_hash
    FROM pos
    """,
    tags=("pipeline", "chunking"))
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunking ({CHUNK_TOKENS}-token chunks
    every {CHUNK_STRIDE} tokens) — the context-window / RAG-passage prep
    step. Each chunk is identified by (doc_id, chunk_idx) and carries its
    md5 so downstream exact-dedup can run at chunk granularity.

    Scale shape: tokenize + sequence + explode + slice are all row-local
    (narrow, no shuffle anywhere); output partitioning inherits the scan,
    so a 100 TB corpus chunks embarrassingly parallel. The token array is
    materialized in a projection BEFORE the explode so the slice reads a
    bound column, never re-tokenizes per chunk (see
    functions/portable.word_shingles on lambda re-evaluation)."""
    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    tk = (docs.repartition(para)
          .select("doc_id", tokens("text").alias("tk")))
    # empty docs contribute no chunks: sequence(1, 0) would throw, so
    # gate it with a `when` (posexplode of the empty array emits
    # nothing) — semantics match the oracle's generate_series, which
    # returns an empty list for len(tk) = 0
    starts = F.when(F.size("tk") > 0,
                    F.sequence(F.lit(1), F.size("tk"),
                               F.lit(CHUNK_STRIDE))) \
        .otherwise(F.array().cast("array<int>"))
    pos = tk.select(
        "doc_id", "tk",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"))
    chunk = F.slice("tk", F.col("chunk_start"), CHUNK_TOKENS)
    return pos.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("chunk_start").cast("bigint").alias("chunk_start"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.md5(F.encode(F.concat_ws(" ", chunk), "utf-8"))
        .alias("chunk_hash"))


_CHUNKS_SQL = f"""
    WITH tk AS (
      SELECT doc_id, {tokens_sql('text')} AS tk FROM documents
    ), pos AS (
      SELECT doc_id, tk,
             unnest(generate_series(1, len(tk), {CHUNK_STRIDE}))
               AS chunk_start
      FROM tk WHERE len(tk) > 0
    )
    SELECT doc_id, chunk_start,
           md5(array_to_string(
               list_slice(tk, chunk_start,
                          chunk_start + {CHUNK_TOKENS} - 1), ' '))
             AS chunk_hash
    FROM pos
"""


@register(
    "chunk_dedup_containment",
    oracle=f"""
    WITH chunks AS ({_CHUNKS_SQL}),
    ranked AS (
      SELECT doc_id, chunk_hash,
             ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                ORDER BY doc_id, chunk_start) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_frac
    FROM ranked
    GROUP BY doc_id
    """,
    tags=("pipeline", "chunking", "dedup", "composition"))
def chunk_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-LEVEL DEDUP, composed: chunk every document (the
    chunk_documents operator) -> exact dedup on chunk_hash (survivor =
    first (doc_id, chunk_start) per hash) -> per-document CONTAINMENT
    report: how many of a doc's chunks are duplicates of chunks already
    seen elsewhere. This is the RAG boilerplate/near-dup pipeline: a doc
    with high dup_frac is mostly made of passages another doc already
    contributes, and a prep job drops or down-weights it — finer-grained
    than whole-document dedup (catches partial copies and shared
    boilerplate that document-level hashes miss).

    Scale shape: chunking is row-local (no shuffle); the dedup shuffles
    the 16-byte chunk_hash only (never text) into a window group-limit;
    the containment report is one partial agg back on doc_id. dup_frac
    is a single IEEE division of two small ints — exact cross-engine."""
    chunks = chunk_documents(spark, sf_dir)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_start")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    dup = F.when(F.col("rn") > 1, F.lit(1)).otherwise(F.lit(0))
    return (ranked.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(dup).cast("bigint").alias("n_dup_chunks"),
                 (F.sum(dup).cast("double") / F.count(F.lit(1)))
                 .alias("dup_frac")))


EXACT_SAMPLE_K = 70


@register(
    "sample_exact_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {portable_hash_sql(
                   "'exact:' || CAST(doc_id AS VARCHAR)")}, doc_id)
               AS rn
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS member_sum,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM ranked WHERE rn <= {EXACT_SAMPLE_K}
    GROUP BY lang
    """,
    tags=("pipeline", "sampling", "exact-size", "deterministic"))
def sample_exact_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SIZE stratified sampling: exactly min(|stratum|, K={EXACT_SAMPLE_K})
    documents per language — the K docs with the smallest salted hash,
    i.e. a deterministic uniform draw that needs no RNG state and no
    second pass to hit the quota (rate-based gates like
    sample_hash_stratified only hit sizes in expectation). Membership is
    stable under repartitioning and engines; growing the corpus evicts
    at the hash boundary only. member_sum pins the exact kept SET, not
    just its size.

    Scale shape: one hash shuffle on the stratum key into a window
    group-limit (top-K by hash computed partially per partition before
    the shuffle — the corpus never globally sorts), then a tiny agg."""
    docs = load(spark, sf_dir, "documents")
    h = portable_hash(F.concat(F.lit("exact:"),
                               F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (docs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= EXACT_SAMPLE_K)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("doc_id").cast("bigint").alias("member_sum"),
                 F.sum("n_chars").cast("bigint").alias("kept_chars")))


WEIGHT_FULL_TOKENS = 400   # docs at/above this length keep probability 1


@register(
    "sample_quality_weighted",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang,
             len({tokens_sql('text')}) AS n_tokens,
             LEAST(len({tokens_sql('text')}), {WEIGHT_FULL_TOKENS})
               AS w_num
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS member_sum,
           CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
    FROM w
    WHERE {portable_hash_sql("'qw:' || CAST(doc_id AS VARCHAR)")}
          % {WEIGHT_FULL_TOKENS} < w_num
    GROUP BY lang
    """,
    tags=("pipeline", "sampling", "weighted", "deterministic"))
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMPORTANCE (weighted) sampling with a deterministic hash gate:
    each document's keep probability is proportional to its own quality
    weight — here min(n_tokens, {WEIGHT_FULL_TOKENS})/{WEIGHT_FULL_TOKENS},
    the 'longer docs carry more signal' heuristic; substitute any
    row-derived score. Unlike the fixed-rate (sample_hash_stratified)
    and exact-size (sample_exact_stratified) gates, the acceptance
    threshold varies PER ROW — yet membership is still a pure function
    of the row: hash(salt+id) % D < weight_numerator. No RNG state, no
    shuffle, stable under repartitioning and corpus growth; member_sum
    pins the exact kept set."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text"))
    w_num = F.least(n_tokens, F.lit(WEIGHT_FULL_TOKENS))
    gate = (portable_hash(F.concat(F.lit("qw:"),
                                   F.col("doc_id").cast("string")))
            % WEIGHT_FULL_TOKENS) < w_num
    return (docs.select("doc_id", "lang", n_tokens.alias("n_tokens"),
                        gate.alias("keep"))
            .where(F.col("keep"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("doc_id").cast("bigint").alias("member_sum"),
                 F.sum("n_tokens").cast("bigint").alias("kept_tokens")))


def _bp_strip_ctes() -> str:
    """CTE chain reproducing text_boilerplate_strip's cleaned text —
    shared by the composed curation oracle."""
    from .text import BP_DF_MIN, BP_SEG_WORDS

    return f"""toks AS (
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
    cleaned AS (
      SELECT s.doc_id,
             CAST(COUNT(*) FILTER (WHERE bp.seg IS NOT NULL) AS BIGINT)
               AS n_removed,
             COALESCE(string_agg(s.seg, ' ' ORDER BY s.seg_idx)
                      FILTER (WHERE bp.seg IS NULL), '') AS text_clean
      FROM segs s LEFT JOIN bp ON s.seg = bp.seg
      GROUP BY s.doc_id
    )"""


CURATION_MIN_WORDS = 20


@register(
    "pipeline_llm_curation",
    oracle=f"""
    WITH {_bp_strip_ctes()},
    quality AS (
      SELECT doc_id, n_removed, text_clean,
             len({tokens_sql('text_clean')}) AS n_words_clean
      FROM cleaned
      WHERE len({tokens_sql('text_clean')}) >= {CURATION_MIN_WORDS}
    ),
    deduped AS (
      SELECT MIN(doc_id) AS doc_id,
             {portable_hash_sql('lower(text_clean)')} AS chash
      FROM quality GROUP BY 2
    )
    SELECT q.doc_id,
           CASE WHEN {portable_hash_sql(
               chr(39) + 'split:' + chr(39)
               + " || CAST(q.doc_id AS VARCHAR)")} % 100 < 90
                THEN 'train' ELSE 'val' END AS split,
           q.n_words_clean, q.n_removed
    FROM quality q JOIN deduped d ON q.doc_id = d.doc_id
    """,
    tags=("pipeline", "composed", "curation", "e2e"))
def pipeline_llm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation job over the round's new operators —
    boilerplate strip -> quality gate on the CLEANED text -> exact
    content dedup of the cleaned text -> train/val split — as ONE
    declarative plan (the pipeline_end_to_end discipline: integration
    evidence that the stages compose without materialization barriers,
    and the realistic ordering where dedup runs on post-cleaning
    content, since boilerplate differences are exactly what makes raw
    near-dups miss exact dedup).

    Stage reuse is literal: the Spark side calls the registered
    text_boilerplate_strip plan as a subquery, so a semantics change
    there fails THIS row too. Scale: adds only row-local stages and one
    16-byte-hash shuffle on top of the strip's own shuffles; Catalyst
    pipelines the whole thing into one job."""
    from .text import text_boilerplate_strip

    cleaned = text_boilerplate_strip(spark, sf_dir)
    n_words = F.size(tokens(F.col("text_clean")))
    quality = (cleaned.where(n_words >= CURATION_MIN_WORDS)
               .select("doc_id", "n_removed", "text_clean",
                       n_words.cast("bigint").alias("n_words_clean")))
    deduped = (quality
               .groupBy(portable_hash(F.lower(F.col("text_clean")))
                        .alias("chash"))
               .agg(F.min("doc_id").alias("keep_id")))
    split = F.when(
        portable_hash(F.concat(F.lit("split:"),
                               F.col("doc_id").cast("string"))) % 100 < 90,
        "train").otherwise("val")
    return (quality.join(deduped,
                         F.col("doc_id") == F.col("keep_id"), "left_semi")
            .select("doc_id", split.alias("split"),
                    "n_words_clean", "n_removed"))


# ------------------------------------------------------- dataset card

@register(
    "pipeline_dataset_card",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, text, n_chars,
             len({tokens_sql('text')}) AS n_tokens
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dups,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
    FROM tok
    """,
    tags=("pipeline", "reporting", "dataset-card"))
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD in one pass — the corpus-level numbers every released
    training set publishes (doc/language counts, token and char totals,
    exact-duplication accounting), computed as a single scan + global
    aggregate so the report is one job, not a notebook of repeated
    corpus reads.

    Scale shape: token counting is a row-local size(tokens()), the
    duplicate accounting rides COUNT(DISTINCT md5(text)) — Catalyst
    plans distinct-aggregate expansion with partial aggregation, and the
    16-byte hash (not the text) is what shuffles. One corpus scan total;
    the output is a single row."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select(
                "doc_id", "lang", "n_chars",
                F.size(tokens(F.col("text"))).alias("n_tokens"),
                F.md5(F.col("text").cast("binary")).alias("h"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 (F.count(F.lit(1)) - F.countDistinct("h")).cast("bigint")
                 .alias("n_exact_dups"),
                 F.countDistinct("h").cast("bigint")
                 .alias("n_unique_texts")))


# --------------------------------------------------- JSONL corpus ingest

_JSONL_CACHE: dict[str, str] = {}


@register(
    "source_jsonl_corpus",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) + 0.0
             AS avg_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    tags=("source", "jsonl", "schema-on-read", "pipeline"))
def source_jsonl_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL CORPUS INGEST — the dominant wire format of LLM training
    corpora (one JSON object per line), read schema-on-read and proven
    equivalent to the parquet path: the documents table is materialized
    once per (process, sf_dir) as multi-part JSONL fixture data, read
    back with an EXPLICIT schema (never inferSchema at scale — inference
    is a full extra pass over 100 TB), and aggregated per (lang, source);
    the oracle computes the same profile from the parquet table, so hash
    equality pins lossless ingest (JSON string escaping round-trips
    newlines/quotes; int64 ids survive because the schema declares
    bigint instead of letting inference widen to double).

    100 TB posture: a JSONL directory scans partition-parallel exactly
    like parquet (line-splittable; gzip members would be the
    non-splittable trap — production uses zstd-framed or uncompressed
    shards), but carries no column pruning or predicate pushdown, which
    is why this operator exists as the INGEST edge: land JSONL, convert
    once to parquet/z-ordered layout (layout_zorder_scan), and every
    downstream operator reads columnar."""
    from ..scratch import scratch_dir

    if sf_dir not in _JSONL_CACHE:
        root = scratch_dir("jsonl_docs_")
        load(spark, sf_dir, "documents").write.mode("overwrite").json(root)
        _JSONL_CACHE[sf_dir] = root
    schema = ("doc_id bigint, text string, lang string, "
              "source string, n_chars bigint")
    docs = spark.read.schema(schema).json(_JSONL_CACHE[sf_dir])
    cnt = F.count(F.lit(1))
    total = F.sum("n_chars").cast("bigint")
    return (docs.groupBy("lang", "source")
            .agg(cnt.cast("bigint").alias("n_docs"),
                 total.alias("total_chars"),
                 (F.round(total.cast("double") / cnt, 4) + 0.0)
                 .alias("avg_chars"))
            .orderBy("lang", "source"))


@register(
    "quality_audit_constraints",
    oracle="""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(l_shipdate) AS BIGINT) AS ship_ok,
             CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
               AS pk_distinct,
             CAST(SUM(CASE WHEN l_discount >= 0 AND l_discount <= 0.06
                           THEN 1 ELSE 0 END) AS BIGINT) AS disc_ok,
             CAST(SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS qty_ok,
             CAST(SUM(CASE WHEN l_returnflag IN ('A','N','R')
                           THEN 1 ELSE 0 END) AS BIGINT) AS flag_ok
      FROM lineitem
    ), fk AS (
      SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS orphan_rows
      FROM (SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY 1) k
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = k.l_orderkey)
    )
    SELECT metric, value FROM (
      SELECT 'row_count' AS metric, CAST(n AS DOUBLE) AS value
        FROM base
      UNION ALL SELECT 'shipdate_completeness',
        CAST(ship_ok AS DOUBLE) / n FROM base
      UNION ALL SELECT 'pk_uniqueness',
        CAST(pk_distinct AS DOUBLE) / n FROM base
      UNION ALL SELECT 'discount_range_compliance',
        CAST(disc_ok AS DOUBLE) / n FROM base
      UNION ALL SELECT 'quantity_positive_compliance',
        CAST(qty_ok AS DOUBLE) / n FROM base
      UNION ALL SELECT 'returnflag_domain_compliance',
        CAST(flag_ok AS DOUBLE) / n FROM base
      UNION ALL SELECT 'orderkey_fk_containment',
        1.0 - CAST(orphan_rows AS DOUBLE) / (SELECT n FROM base) FROM fk
    ) m
    """,
    tags=("pipeline", "data-quality", "audit"))
def quality_audit_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality audit: completeness, PK uniqueness,
    range/domain compliance, and FK containment as ONE metrics relation
    (metric, value) — the pre-ingest gate every production training
    pipeline runs before a corpus lands.

    Scale shape: all row-local checks fold into a SINGLE conditional
    aggregate over one scan (map-side partials; zero extra passes —
    this is why audits should be conditional sums, not one scan per
    constraint). PK uniqueness adds the unavoidable distinct on the key
    pair, FK containment is a pre-aggregated anti-join (per-key counts
    move, not rows: |distinct keys| << |rows|). Every metric is an
    exact integer count divided in double once at the end, so the
    relation is bit-identical across engines and partitionings.

    Reference scope: delegated relational surface (SURVEY.md S2b) —
    record-stream validation before downstream processing.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    base = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_shipdate").alias("ship_ok"),
        F.count_distinct("l_orderkey", "l_linenumber").alias("pk_distinct"),
        F.sum(((F.col("l_discount") >= 0)
               & (F.col("l_discount") <= 0.06)).cast("bigint"))
         .alias("disc_ok"),
        F.sum((F.col("l_quantity") > 0).cast("bigint")).alias("qty_ok"),
        F.sum(F.col("l_returnflag").isin("A", "N", "R").cast("bigint"))
         .alias("flag_ok"))
    per_key = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    fk = (per_key.join(orders.select("o_orderkey"),
                       per_key.l_orderkey == F.col("o_orderkey"),
                       "left_anti")
                 .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint")
                       .alias("orphan_rows")))
    joined = base.crossJoin(fk)
    n = F.col("n").cast("double")
    return joined.select(F.explode(F.array(
        F.struct(F.lit("row_count").alias("metric"), n.alias("value")),
        F.struct(F.lit("shipdate_completeness").alias("metric"),
                 (F.col("ship_ok").cast("double") / n).alias("value")),
        F.struct(F.lit("pk_uniqueness").alias("metric"),
                 (F.col("pk_distinct").cast("double") / n).alias("value")),
        F.struct(F.lit("discount_range_compliance").alias("metric"),
                 (F.col("disc_ok").cast("double") / n).alias("value")),
        F.struct(F.lit("quantity_positive_compliance").alias("metric"),
                 (F.col("qty_ok").cast("double") / n).alias("value")),
        F.struct(F.lit("returnflag_domain_compliance").alias("metric"),
                 (F.col("flag_ok").cast("double") / n).alias("value")),
        F.struct(F.lit("orderkey_fk_containment").alias("metric"),
                 (F.lit(1.0) - F.col("orphan_rows").cast("double") / n)
                  .alias("value")))).alias("kv")).select("kv.*")


def _leakage_safe_oracle() -> str:
    from .dedup import _jaccard_pairs_ctes

    comp_hash = portable_hash_sql(
        "'gsplit:' || CAST(component AS VARCHAR)")
    return f"""
    WITH RECURSIVE {_jaccard_pairs_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(doc_id, label) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.doc_id
    ),
    comp AS (SELECT doc_id, MIN(label) AS component FROM reach
             GROUP BY doc_id),
    labeled AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT CASE WHEN h % 100 < 80 THEN 'train'
                WHEN h % 100 < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT n_chars, component, {comp_hash} AS h
          FROM labeled)
    GROUP BY 1
    """


@register(
    "split_leakage_safe",
    oracle=_leakage_safe_oracle(),
    tags=("pipeline", "split", "dedup", "leakage"))
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split: near-duplicate documents must
    land in the SAME split — hashing raw doc_ids (split_train_val_test)
    puts one copy of a template family in train and another in test,
    and the eval leaks. Assignment is therefore a function of the
    near-dup GROUP: connected components over the Jaccard similarity
    graph (the dedup_connected_components kernel), singletons keeping
    their own id as the component, then the salted 80/10/10 hash gate
    applied to the COMPONENT label. Per split: docs, distinct
    components, chars. No component can span splits by construction —
    the split is a pure function of the component — so the declared
    relation is the audit you run to size the leak-safe splits.

    Scale shape: the pair graph is the banded/posting self-join (never
    all-pairs), min-label propagation converges in diameter iterations
    with localCheckpoint lineage truncation, the docs join is one
    shuffle on doc_id, and the gate itself is row-local. The salt
    ('gsplit:') decorrelates from every other hash decision."""
    from .dedup import _jaccard_pairs, _min_label_components

    docs = load(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(docs).select("doc_a", "doc_b")
    comp = (_min_label_components(pairs)
            .select("doc_id", F.col("label").alias("component")))
    labeled = (docs.select("doc_id", "n_chars")
               .join(comp, "doc_id", "left")
               .select("n_chars",
                       F.coalesce("component", "doc_id").alias("component")))
    h = portable_hash(F.concat(F.lit("gsplit:"),
                               F.col("component").cast("string"))) % 100
    split = (F.when(h < 80, "train").when(h < 90, "val").otherwise("test"))
    return (labeled.select(split.alias("split"), "n_chars", "component")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("component").cast("bigint")
                 .alias("n_components"),
                 F.sum("n_chars").alias("total_chars")))
