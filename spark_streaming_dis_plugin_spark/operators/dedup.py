"""Deduplication operators (SURVEY.md §2c): exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding near-dup.

All are shuffle-parallel pipelines with no driver-side loops:

- exact         : hash groupBy on normalized content — one shuffle.
- ngram_jaccard : inverted-index self-join on shingles (the verification
                  kernel; at 100 TB it runs only on LSH candidates).
- minhash_lsh   : shingle -> portable hash -> K universal hashes -> min per
                  hash -> band buckets -> bucket self-join -> verify. The
                  scale path: candidate generation is linear + one join on
                  band keys instead of an O(n^2) cross join.
- simhash       : 16-bit signature computed entirely within-row (array
                  lambdas, zero shuffles until the band join).
- embedding     : cosine near-dup blocked by a partition key (label here;
                  an LSH/IVF bucket id in production — see similarity.py).

Portable-hash note: signatures use functions/portable.portable_hash (md5)
so the DuckDB oracle reproduces them bit-for-bit; swap portable=False for
xxhash64 in production (same topology, ~3x faster hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import (
    cosine, cosine_sql, portable_hash, portable_hash_sql, tokens,
    tokens_sql, word_gram_positions, word_shingles, word_shingles_sql,
)
from ..plans.registry import register
from ..tables import load

MINHASH_PRIME = 2_147_483_647          # 2^31 - 1
MINHASH_A = (2, 3, 5, 7, 11, 13, 17, 19)
MINHASH_B = (1, 4, 9, 16, 25, 36, 49, 64)
NUM_HASHES = 8
BAND_SIZE = 2                           # 4 bands of 2
# Word *trigrams*: on this corpus bigrams have a tiny universe (~931
# distinct, avg document frequency 275/5000 docs), which inflates both the
# posting-list join (sum(df^2) ~ 70M pairs) and LSH candidate count (~95k).
# Trigrams give ~27k distinct shingles, max df 25, sum(df^2) ~ 2.8M — the
# standard lever when shingle selectivity is too low. (At extreme scale the
# complementary lever is a df cap: drop shingles present in > x% of docs —
# they carry no discriminative signal and dominate join skew.)
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8


# ---------------------------------------------------------------- exact

@register(
    "dedup_exact",
    oracle="""
    SELECT lower(text) AS norm_text_key, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY lower(text)
    HAVING COUNT(*) >= 1
    """,
    tags=("dedup", "exact"))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on normalized content, keep the smallest doc_id
    (deterministic survivor — dropDuplicates keeps an arbitrary row, which
    is fine operationally but not oracle-comparable). One hash shuffle; at
    100 TB group on a content *hash* instead of the text itself so the
    shuffle moves 8 bytes per row, not documents (see dedup_exact_by_hash).
    """
    docs = load(spark, sf_dir, "documents")
    return (docs.groupBy(F.lower(F.col("text")).alias("norm_text_key"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("n_copies")))


@register(
    "dedup_exact_by_hash",
    oracle=f"""
    SELECT {portable_hash_sql('lower(text)')} AS content_hash,
           MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "exact"), bench=True)
def dedup_exact_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup shuffling only a 60-bit content hash — the 100 TB
    variant (text never crosses the network; collisions at 60 bits are
    ~n^2/2^61, negligible below ~10^8 docs, and a residual equality check
    on collided groups removes even those)."""
    docs = load(spark, sf_dir, "documents")
    return (docs.groupBy(portable_hash(F.lower(F.col("text")))
                         .alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count(F.lit(1)).alias("n_copies")))


# ------------------------------------------------------- n-gram Jaccard

def _shingle_sets(docs: DataFrame, filtered: bool = True) -> DataFrame:
    """(doc_id, sh) with tokens materialized between projections (see
    functions/portable.word_shingles for why) and input spread across all
    cores (one small parquet file = one input split otherwise).

    ``filtered=False`` skips the ``size(sh) > 0`` guard: predicate
    pushdown substitutes that condition BELOW the projections, so every
    scan row pays two extra evaluations of the full tokenize+shingle
    pipeline just to drop empty documents (r13 plan audit: the pushed
    condition inlines the tokenize 6x). Consumers whose downstream
    operations already drop empty sets — an explode_outer posting whose
    null rows die at an equi-join, a candidate join keyed on docs that
    have postings, or a persist barrier above which the guard is a cheap
    cached-attribute filter — should pass filtered=False."""
    para = docs.sparkSession.sparkContext.defaultParallelism
    sets = (docs.repartition(para)
            .select("doc_id", tokens("text").alias("tk"))
            .select("doc_id", word_shingles("tk", SHINGLE_N).alias("sh")))
    return sets.where(F.size("sh") > 0) if filtered else sets


def _shingle_sets_sql() -> str:
    return f"""
      SELECT doc_id, {word_shingles_sql('text', SHINGLE_N)} AS sh
      FROM documents
    """


@register(
    "dedup_ngram_jaccard_fast",
    oracle=None,       # xxhash64 shingle keys are JVM-only; pairs are
                       # asserted equal to the portable string-key
                       # pipeline in tests (64-bit collisions would be
                       # the only divergence source)
    tags=("dedup", "jaccard", "production-hash"), bench=True,
    declared=False)    # bench + parity-pytest gated (COVERAGE.md)
def dedup_ngram_jaccard_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_ngram_jaccard with the production posting keys: each shingle
    hashed to xxhash64 BEFORE the posting-list self-join, so the shuffle
    moves 8-byte ints instead of shingle strings and the join compares
    longs — the same |intersection| / sizes arithmetic on the hashed
    sets. At 100 TB the posting shuffle is the dominant cost of this
    operator; hashing its key is the first lever."""
    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    sets = (docs.repartition(para)
            .select("doc_id", tokens("text").alias("tk"))
            .select("doc_id",
                    F.array_distinct(
                        F.transform(word_shingles("tk", SHINGLE_N),
                                    lambda s: F.xxhash64(s))).alias("sh")))
    # r13: posting rows carry their set size (same shape as
    # _jaccard_pairs) — no sizes-relation joins, one consumer of the
    # shingle scan, and the lossless 5*min >= 4*max length band prunes
    # candidates before the pair aggregation. explode_OUTER + no
    # empty-set guard: the guard would be pushed below the projections
    # as extra full-pipeline evaluations per scan row; null posting
    # rows die at the equi self-join instead (see _jaccard_pairs).
    posting = (sets.select("doc_id", F.size("sh").alias("n"),
                           F.explode_outer("sh").alias("s")))
    pa, pb = posting.alias("a"), posting.alias("b")
    inter = (pa.join(pb, (F.col("a.s") == F.col("b.s"))
                     & (F.col("a.doc_id") < F.col("b.doc_id"))
                     & (5 * F.least("a.n", "b.n")
                        >= 4 * F.greatest("a.n", "b.n")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("both_n"),
                  F.min("a.n").alias("na"), F.min("b.n").alias("nb")))
    jac = F.col("both_n").cast("double") / (F.col("na") + F.col("nb")
                                            - F.col("both_n"))
    return (inter.select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


def _jaccard_pairs_ctes() -> str:
    """CTE chain computing near-dup pairs (doc_a, doc_b, jaccard) — shared
    by the pair query and the connected-components clustering oracle."""
    return f"""sets AS ({_shingle_sets_sql()}),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sets),
    posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
      FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b,
             CAST(both_n AS DOUBLE) / (sa.n + sb.n - both_n) AS jaccard
      FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(both_n AS DOUBLE) / (sa.n + sb.n - both_n)
            >= {JACCARD_THRESHOLD}
    )"""


def _jaccard_pairs(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard) near-dup pairs — the Spark twin of
    :func:`_jaccard_pairs_ctes`.

    r13 shape: each posting row CARRIES its set size, so the pair
    aggregate reads na/nb off its own group (every row of a group
    agrees) instead of joining a separate sizes relation back twice —
    two joins gone, and the shingle-set scan now has ONE consumer
    (the old 3-consumer recompute-vs-persist question dissolves: the
    tokenize+shingle pass runs exactly once). The carried sizes also
    admit the LENGTH-BAND filter inside the candidate join:
    J(A,B) = |A∩B| / (|A|+|B|-|A∩B|) <= min/max, so J >= 4/5 forces
    5*min(|A|,|B|) >= 4*max(|A|,|B|) — exact integer
    cross-multiplication (a float 0.8*n comparison would mis-round the
    J == 0.8 boundary), provably lossless, and it drops off-band
    candidate rows BEFORE the pair aggregation's shuffle. Cost: +8
    bytes per posting row through the self-join exchange — repaid by
    two fewer exchanges, two fewer doc scans, and the pruned agg.

    filtered=False + explode_OUTER: the empty-set guard would be pushed
    below the projections as two full pipeline re-evaluations per scan
    row (and plain explode would re-infer it); the outer explode's null
    posting rows die at the equi self-join instead."""
    sets = _shingle_sets(docs, filtered=False)
    posting = (sets.select("doc_id", F.size("sh").alias("n"),
                           F.explode_outer("sh").alias("s")))
    pa, pb = posting.alias("a"), posting.alias("b")
    inter = (pa.join(pb, (F.col("a.s") == F.col("b.s"))
                     & (F.col("a.doc_id") < F.col("b.doc_id"))
                     & (5 * F.least("a.n", "b.n")
                        >= 4 * F.greatest("a.n", "b.n")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("both_n"),
                  F.min("a.n").alias("na"), F.min("b.n").alias("nb")))
    jac = F.col("both_n").cast("double") / (F.col("na") + F.col("nb")
                                            - F.col("both_n"))
    return (inter.select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_jaccard_pairs_ctes()}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    tags=("dedup", "near-dup", "jaccard"), bench=True)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-bigram-shingle Jaccard >= 0.8 via an
    inverted-index self-join (posting list per shingle). |A ∩ B| comes from
    the join, |A ∪ B| = |A| + |B| - |A ∩ B| by arithmetic — no union
    materialized. At 100 TB this exact kernel runs per LSH bucket (below),
    never globally; a document-frequency cap on shingles bounds posting
    skew."""
    return _jaccard_pairs(load(spark, sf_dir, "documents"))


DF_CAP = 5     # drop shingles present in more than DF_CAP documents


@register(
    "dedup_ngram_jaccard_capped",
    oracle=f"""
    WITH sets AS ({_shingle_sets_sql()}),
    posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
    heavy AS (
      SELECT s FROM (SELECT s, COUNT(*) AS df FROM posting GROUP BY s)
      WHERE df > {DF_CAP}
    ),
    capped AS (
      SELECT * FROM posting WHERE s NOT IN (SELECT s FROM heavy)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
      FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(both_n AS DOUBLE) / (sa.n + sb.n - both_n) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(both_n AS DOUBLE) / (sa.n + sb.n - both_n)
          >= {JACCARD_THRESHOLD}
    """,
    tags=("dedup", "near-dup", "jaccard", "df-cap"), bench=True)
def dedup_ngram_jaccard_capped(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Jaccard near-dup with the DOCUMENT-FREQUENCY CAP the uncapped
    variant's docstring promises: shingles present in more than {DF_CAP}
    documents are dropped BEFORE the posting self-join — they carry no
    discriminative signal (boilerplate, stock phrases) and each
    contributes df^2 join pairs, so they dominate both cost and skew.
    Jaccard is then computed over the capped shingle sets (the standard
    stop-shingle treatment: similarity over informative features only).

    Scale shape: the drop-set (df > cap) is SMALL by construction —
    frequent shingles are few — so it broadcasts to a left-anti join and
    the corpus-side postings never shuffle for the cap; after the cap,
    every posting key joins at most {DF_CAP} docs, so the self-join's
    per-key fan-out is bounded by cap^2 — the join-skew guarantee the
    uncapped kernel lacks. At sf0.1 the cap removes ~90% of posting rows
    (24.5k of 27.2k distinct shingles) while preserving the near-dup
    template families."""
    # filtered=False + explode_OUTER (see _jaccard_pairs): empty docs'
    # null posting rows survive the anti-join (null key never matches)
    # but die at the equi self-join; they cannot reach `inter`, so the
    # output is unchanged while every scan row skips the pushed
    # empty-set guard's extra pipeline evaluations
    sets = _shingle_sets(load(spark, sf_dir, "documents"), filtered=False)
    # posting feeds TWO consumers (the df aggregate and the cap
    # anti-join fill) — persist folds the tokenize+shingle+explode
    # recompute into one pass (A/B r13 session 3)
    posting = (sets.select("doc_id", F.explode_outer("sh").alias("s"))
               .persist())
    heavy = (posting.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
             .where(F.col("df") > DF_CAP).select("s"))
    # The capped posting relation feeds THREE consumers (sizes + both
    # self-join sides); persisting it folds the tokenize/shingle/anti-join
    # recompute into one pass (A/B at sf0.1: ~5% median, identical rows —
    # small because the cap already removed ~90% of postings, but it also
    # bounds the recompute at 100 TB where the scan is the expensive part)
    capped = (posting.join(F.broadcast(heavy), "s", "left_anti")
              .persist())
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ca, cb = capped.alias("a"), capped.alias("b")
    inter = (ca.join(cb, (F.col("a.s") == F.col("b.s"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("both_n")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("both_n").cast("double") / (F.col("na") + F.col("nb")
                                            - F.col("both_n"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


@register(
    "dedup_connected_components",
    oracle=f"""
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
    )
    SELECT doc_id, MIN(label) AS component,
           doc_id = MIN(label) AS survivor
    FROM reach GROUP BY doc_id
    """,
    tags=("dedup", "graph", "iterative"), bench=True)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: connected components over the
    Jaccard similarity graph by iterative min-label propagation. Each
    document gets component = min(doc_id) of its transitive duplicate
    group; dedup keeps the one survivor per component (pair-based dedup
    would wrongly keep B of A~B, B~C, C~A chains).

    Scale shape: one iteration = edges ⋈ labels (shuffle on doc_id) +
    min-agg; converges in graph-diameter iterations (near-dup clusters
    are shallow — template families, not long chains). localCheckpoint
    between iterations truncates the exponential plan lineage; the
    convergence test is a scalar count per iteration (driver control
    flow, not a data collect). The oracle pins the same fixpoint with a
    recursive CTE."""
    pairs = _jaccard_pairs(load(spark, sf_dir, "documents")) \
        .select("doc_a", "doc_b")
    labels = _min_label_components(pairs)
    return labels.select(
        "doc_id", F.col("label").alias("component"),
        (F.col("doc_id") == F.col("label")).alias("survivor"))


def _min_label_components(pairs: DataFrame) -> DataFrame:
    """Iterative min-label propagation over an undirected pair relation —
    the shared connected-components kernel (see
    dedup_connected_components for the scale rationale). Returns
    (doc_id, label) for every endpoint; label = min doc_id of the
    component."""
    # Symmetrize by exploding each pair into both directions IN ONE PASS
    # — the former unionAll duplicated the whole (possibly expensive)
    # pairs subtree into both branches of the union; explode emits the
    # same two rows from a single evaluation (A/B at sf0.1 on the
    # jaccard-pairs input: small but consistent win, identical labels).
    edges = (pairs.select(F.explode(F.array(
                F.struct(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst")),
                F.struct(F.col("doc_b").alias("src"),
                         F.col("doc_a").alias("dst")))).alias("e"))
             .select("e.src", "e.dst")
             .persist())
    labels = (edges.select(F.col("src").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")).localCheckpoint())
    changed = -1
    for i in range(20):
        if i == 0:
            # Round 0's label map is the identity (label = doc_id), so
            # the edges-to-labels join resolves dst to itself — min over
            # dst directly, skipping one join (A/B at sf0.1: ~9% off the
            # full CC row on a quiet box, identical labels).
            neighbor_min = (edges.groupBy("src")
                            .agg(F.min("dst").alias("nmin")))
        else:
            neighbor_min = (edges.join(labels,
                                       edges["dst"] == labels["doc_id"])
                            .groupBy("src")
                            .agg(F.min("label").alias("nmin")))
        # Carry the previous label INSIDE the checkpointed relation so the
        # convergence test is a filter-count over cached partitions — the
        # former new-vs-old join re-shuffled both label relations every
        # round just to count diffs (one whole exchange+join job per
        # iteration, measured ~25% of the row's wall at sf0.1).
        new_labels = (labels.join(neighbor_min,
                                  labels["doc_id"] == neighbor_min["src"],
                                  "left")
                      .select(labels["doc_id"],
                              F.least(labels["label"],
                                      F.coalesce(F.col("nmin"),
                                                 labels["label"]))
                              .alias("label"),
                              labels["label"].alias("prev_label"))
                      .localCheckpoint())
        changed = (new_labels
                   .where(F.col("label") != F.col("prev_label")).count())
        labels = new_labels.select("doc_id", "label")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        # Returning unconverged labels would silently mis-cluster any
        # duplicate chain whose diameter exceeds the iteration cap.
        raise RuntimeError(
            "min-label propagation did not "
            f"converge within 20 iterations ({changed} labels still "
            "changing); raise the cap for deeper duplicate chains")
    return labels


@register(
    "dedup_cc_two_phase",
    oracle=f"""
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
    )
    SELECT doc_id, MIN(label) AS component,
           doc_id = MIN(label) AS survivor
    FROM reach GROUP BY doc_id
    """,
    tags=("dedup", "graph", "iterative", "two-phase"), bench=True)
def dedup_cc_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by LARGE-STAR / SMALL-STAR alternation — the
    O(log n)-round algorithm from Kiveris et al., "Connected Components
    in MapReduce and Beyond" (SOCC'14), and the variant that replaces
    min-label propagation when duplicate chains are DEEP: propagation
    needs diameter-many rounds (a 10k-link plagiarism chain = 10k
    shuffles), star contraction needs O(log n) regardless of shape,
    because each round rewires whole neighborhoods at their minimum
    rather than moving labels one hop.

    Per round, both operations are one groupBy-min plus one keyed join
    over the edge relation — the same shuffle cost as one propagation
    step. Fixpoint = the edge set is a union of stars whose centers are
    the component minima. Same output contract and the SAME recursive-CTE
    oracle as dedup_connected_components; benched alongside it so the
    crossover between the two is a measured number, not folklore."""
    pairs = _jaccard_pairs(load(spark, sf_dir, "documents")) \
        .select("doc_a", "doc_b")
    labels = _two_phase_components(pairs)
    return labels.select(
        "doc_id", F.col("label").alias("component"),
        (F.col("doc_id") == F.col("label")).alias("survivor"))


def _two_phase_components(pairs: DataFrame) -> DataFrame:
    """Large-star/small-star contraction over an undirected pair relation.

    Round = large-star (every neighbor v > u rewires to m = min(N(u) ∪
    {u}), computed over the SYMMETRIC edge list) then small-star (edges
    directed large→small; every v in N(u) ∪ {u} except the minimum
    rewires to it). Convergence is detected on the small-star output via
    (count, xxhash64-sum) equality — one cheap aggregate per round, no
    edge-set materialization on the driver — and the final star map is
    (leaf → center); nodes appearing only as centers label themselves.
    localCheckpoint after each round truncates the iterative lineage
    exactly as in _min_label_components."""
    edges = (pairs.select(F.col("doc_a").alias("u"),
                          F.col("doc_b").alias("v"))
             .where(F.col("u") != F.col("v"))
             .localCheckpoint())
    nodes = (edges.select(F.col("u").alias("doc_id"))
             .unionAll(edges.select(F.col("v").alias("doc_id")))
             .distinct().localCheckpoint())

    def edge_fingerprint(e: DataFrame):
        # The small-star output this runs on is already DISTINCT with
        # u > v on every row (m = min of the closed neighborhood and
        # n != m is filtered), so (least, greatest) = (v, u) and the
        # former canonicalize+distinct was an identity — at the cost of
        # one full exchange per round. Aggregate the cached relation
        # directly: map-side partial agg, no shuffle of the edge set.
        row = (e.agg(F.count(F.lit(1)).alias("n"),
                     # decimal sum: int64 hash values overflow a LONG sum
                     # under ANSI mode on any non-trivial edge set
                     F.sum(F.xxhash64("v", "u").cast("decimal(38,0)"))
                     .alias("h")).collect()[0])
        return row["n"], row["h"]

    prev_fp = None
    for _ in range(30):
        # Large-star: symmetric neighborhoods, m = min(N(u) ∪ {u}),
        # rewire strictly-greater neighbors to m.
        sym = (edges.unionAll(edges.select(F.col("v").alias("u"),
                                           F.col("u").alias("v"))))
        mins = (sym.groupBy("u")
                .agg(F.least(F.min("v"), F.first("u")).alias("m")))
        ls = (sym.join(mins, "u")
              .where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .where(F.col("u") != F.col("v"))
              .distinct())
        # Small-star: direct edges large -> small, m = min(N(u) ∪ {u}),
        # rewire every member of the closed neighborhood except m.
        directed = ls.select(F.greatest("u", "v").alias("u"),
                             F.least("u", "v").alias("v"))
        smins = directed.groupBy("u").agg(F.min("v").alias("m"))
        ss = (directed.join(smins, "u")
              .select(F.col("v").alias("n"), F.col("m"))
              .unionAll(smins.select(F.col("u").alias("n"), F.col("m")))
              .where(F.col("n") != F.col("m"))
              .select(F.col("n").alias("u"), F.col("m").alias("v"))
              .distinct()
              .localCheckpoint())
        fp = edge_fingerprint(ss)
        edges = ss
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            "large-star/small-star did not converge within 30 rounds")
    star = edges.select(F.greatest("u", "v").alias("doc_id"),
                        F.least("u", "v").alias("label"))
    return (nodes.join(star, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("label", F.col("doc_id")).alias("label")))


# --------------------------------------------------------- MinHash + LSH

def _with_signature(docs: DataFrame, portable: bool = True) -> DataFrame:
    """doc_id + shingle set + K min-hash signature columns, PERSISTED.

    Two Catalyst traps shape this code (both measured, 48s -> ~3s total on
    the sf0.1 fixture):

    1. CollapseProject inlines "intermediate" projection columns back into
       every consumer expression — K signature columns each consuming an
       inline md5-hash array means K full md5 passes per row. The persist()
       is a hard materialization barrier: (doc_id, sh, hs) is computed
       exactly once, and the K signature transforms read attributes of the
       cached relation.
    2. The downstream LSH query scans the signature relation four more
       times (band join both sides, verify join both sides) — the same
       persist serves all of them. At 100 TB this is the same design:
       write/cache the signature table once, then band and join it.

    ``portable=False`` swaps md5 for JVM xxhash64 — the production hash
    (same topology, no cross-engine oracle; see dedup_minhash_lsh_fast).
    """
    hasher = (portable_hash if portable
              else (lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME))))
    # filtered=False + the guard re-applied ABOVE the persist: below it,
    # predicate pushdown would re-evaluate the full tokenize+shingle
    # pipeline twice per scan row at cache fill; above it, size(sh) > 0
    # reads the cached attribute (r13 scan-hygiene pass)
    hashed = (_shingle_sets(docs, filtered=False)
              .withColumn("hs", F.transform(
                  F.col("sh"), lambda s: hasher(s) % MINHASH_PRIME))
              .persist()
              .where(F.size("sh") > 0))
    sig_cols = [
        F.array_min(F.transform(
            F.col("hs"),
            lambda h: (h * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_PRIME))
        .alias(f"h{i}")
        for i in range(NUM_HASHES)]
    return hashed.select("doc_id", "sh", *sig_cols)


def _minhash_sig_sql() -> list[str]:
    sh = word_shingles_sql("text", SHINGLE_N)
    hashed = f"list_transform({sh}, s -> {portable_hash_sql('s')} % {MINHASH_PRIME})"
    return [
        (f"list_min(list_transform({hashed}, "
         f"h -> (h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_PRIME})) AS h{i}")
        for i in range(NUM_HASHES)
    ]


@register(
    "dedup_minhash_signature",
    oracle=f"""
    SELECT doc_id, {', '.join(_minhash_sig_sql())}
    FROM documents
    WHERE len({word_shingles_sql('text', SHINGLE_N)}) > 0
    """,
    tags=("dedup", "minhash"))
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (K=8 universal hashes over word-bigram shingles).
    Pure per-row computation — scales embarrassingly."""
    docs = load(spark, sf_dir, "documents")
    return _with_signature(docs).drop("sh")


_LSH_PAIRS_ORACLE = f"""
    WITH sig AS (
      SELECT doc_id, {', '.join(_minhash_sig_sql())}
      FROM documents
      WHERE len({word_shingles_sql('text', SHINGLE_N)}) > 0
    ),
    bands AS (
      SELECT doc_id, 0 AS band, h0 AS v0, h1 AS v1 FROM sig UNION ALL
      SELECT doc_id, 1, h2, h3 FROM sig UNION ALL
      SELECT doc_id, 2, h4, h5 FROM sig UNION ALL
      SELECT doc_id, 3, h6, h7 FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.v0 = b.v0 AND a.v1 = b.v1
           AND a.doc_id < b.doc_id
    ),
    sets AS ({_shingle_sets_sql()})
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
             AS jaccard
    FROM cand JOIN sets sa ON sa.doc_id = doc_a
              JOIN sets sb ON sb.doc_id = doc_b
    WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
          >= {JACCARD_THRESHOLD}
    """


@register(
    "dedup_minhash_lsh",
    oracle=_LSH_PAIRS_ORACLE,
    tags=("dedup", "minhash", "lsh"), bench=True)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash+LSH near-dup pipeline: signatures -> 4 bands of 2
    -> band-bucket self-join for candidates -> exact Jaccard verification
    of candidates only. This is the 100 TB dedup shape: candidate
    generation is one shuffle on band keys; the quadratic verify kernel
    touches only same-bucket pairs."""
    return _lsh_pairs(_with_signature(load(spark, sf_dir, "documents")))


@register(
    "dedup_end_to_end",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_LSH_PAIRS_ORACLE})
    ),
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
    comp AS (SELECT doc_id, MIN(label) AS component
             FROM reach GROUP BY doc_id),
    ranked AS (
      SELECT c.component, c.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.component
                                ORDER BY d.n_chars DESC, c.doc_id) AS rnk
      FROM comp c JOIN documents d ON c.doc_id = d.doc_id
    ),
    groups AS (
      SELECT component,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) - 1 AS BIGINT) AS n_removed,
             MAX(CASE WHEN rnk = 1 THEN doc_id END) AS survivor_id,
             CAST(SUM(CASE WHEN rnk > 1 THEN n_chars ELSE 0 END)
                  AS BIGINT) AS bytes_saved
      FROM ranked GROUP BY component
    )
    SELECT 'group' AS scope, component, n_docs, n_removed,
           survivor_id, bytes_saved
    FROM groups
    UNION ALL
    SELECT 'corpus', CAST(NULL AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
           CAST(COALESCE(SUM(n_removed), 0) AS BIGINT),
           CAST(NULL AS BIGINT),
           CAST(COALESCE(SUM(bytes_saved), 0) AS BIGINT)
    FROM groups
    """,
    tags=("dedup", "pipeline", "graph", "e2e"), bench=True)
def dedup_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE production dedup job as one composed oracle query:
    MinHash+LSH candidate pairs -> connected components (transitive
    duplicate groups) -> canonical-survivor selection (keep the LONGEST
    doc per group, tie-broken by doc_id — a quality choice, not just
    min-id) -> corpus accounting (per-group rows plus one corpus row:
    docs in corpus, docs removed, bytes saved).

    Composition is the point: it puts the iterative component kernel
    (driver-checked individually in r1-r2) back under a hard row via the
    job shape users actually run. Scale: LSH pairs shuffle band keys
    only, propagation shuffles doc ids, survivor selection is ONE
    hash aggregate over the (tiny) component relation, and the corpus
    row is a broadcast-sized aggregate union — the full corpus is
    scanned exactly once (the signature pass).

    Survivor selection is an argmax, not a ranking: "longest doc,
    ties to the smallest doc_id" is exactly max(struct(n_chars,
    -doc_id)) — struct ordering compares n_chars first, then -doc_id
    (max of the negation = min id) — and bytes_saved is
    sum(n_chars) - survivor's n_chars. The former row_number window
    sorted every group and blocked partial aggregation; the struct-max
    aggregates map-side (the argmin-assignment discipline from the IVF
    kernel applied to the survivor stage)."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    labels = _min_label_components(pairs)
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    comp = (labels.select("doc_id", F.col("label").alias("component"))
            .join(docs, "doc_id"))
    groups = (comp.groupBy("component")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   (F.count(F.lit(1)) - 1).alias("n_removed"),
                   F.max(F.struct(F.col("n_chars"),
                                  (-F.col("doc_id")).alias("neg_id")))
                    .alias("best"),
                   F.sum("n_chars").alias("total_chars"))
              .select("component", "n_docs", "n_removed",
                      (-F.col("best.neg_id")).alias("survivor_id"),
                      (F.col("total_chars") - F.col("best.n_chars"))
                      .cast("bigint").alias("bytes_saved")))
    total = docs.agg(F.count(F.lit(1)).alias("corpus_docs"))
    corpus = (groups.agg(
                F.coalesce(F.sum("n_removed"), F.lit(0))
                 .cast("bigint").alias("n_removed"),
                F.coalesce(F.sum("bytes_saved"), F.lit(0))
                 .cast("bigint").alias("bytes_saved"))
              .crossJoin(F.broadcast(total))
              .select(F.lit("corpus").alias("scope"),
                      F.lit(None).cast("bigint").alias("component"),
                      F.col("corpus_docs").alias("n_docs"),
                      "n_removed",
                      F.lit(None).cast("bigint").alias("survivor_id"),
                      "bytes_saved"))
    return (groups.select(F.lit("group").alias("scope"), "component",
                          "n_docs", "n_removed", "survivor_id",
                          "bytes_saved")
            .unionByName(corpus))


def _lsh_pairs(with_sig: DataFrame) -> DataFrame:
    """Signature table -> band buckets -> candidate pairs -> exact-Jaccard
    verification (shared by the portable and xxhash64 variants)."""
    sets = with_sig.select("doc_id", "sh")
    sig = with_sig.drop("sh")
    # one scan -> 4 band rows per doc via explode (not 4 union branches)
    band_structs = F.array(*[
        F.struct(F.lit(band).alias("band"),
                 F.col(f"h{band * BAND_SIZE}").alias("v0"),
                 F.col(f"h{band * BAND_SIZE + 1}").alias("v1"))
        for band in range(NUM_HASHES // BAND_SIZE)])
    bands = (sig.select("doc_id", F.explode(band_structs).alias("b"))
             .select("doc_id", "b.band", "b.v0", "b.v1"))
    ba, bb = bands.alias("a"), bands.alias("b")
    cand = (ba.join(bb, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.v0") == F.col("b.v0"))
                    & (F.col("a.v1") == F.col("b.v1"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    jac = inter.cast("double") / (F.size("sha") + F.size("shb") - inter)
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= JACCARD_THRESHOLD))


@register(
    "dedup_minhash_lsh_fast",
    oracle=None,   # xxhash64 is JVM-only — no cross-engine oracle; the
                   # verified pairs are asserted equal to the portable
                   # pipeline's in tests (hash choice affects only which
                   # CANDIDATES surface, verification is exact Jaccard)
    tags=("dedup", "minhash", "lsh", "production-hash"), bench=False,
    declared=False)   # parity-pytest gated (COVERAGE.md): keeps the
                      # driver's correctness file free of err rows.
                      # Un-benched r13: the slow/fast ratio is recorded
                      # in BENCH_NOTES history and the xxhash-fast
                      # family stays represented by
                      # dedup_ngram_jaccard_fast; freed headline bytes
                      # fund the two new r13 bench rows (the driver
                      # captures only a ~2 KB stdout tail)
def dedup_minhash_lsh_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_minhash_lsh with the production hash: JVM xxhash64 signatures
    instead of oracle-portable md5 (the md5 requirement exists only so
    DuckDB can reproduce signatures bit-for-bit). Same topology, same
    exact-Jaccard verification — bench-visible so the md5-vs-xxhash64
    cost of the oracle constraint is measured, not asserted."""
    return _lsh_pairs(
        _with_signature(load(spark, sf_dir, "documents"), portable=False))


# ---------------------------------------------------------------- SimHash

SIMHASH_BITS = 16


@register(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            t -> {portable_hash_sql('t')}) AS th
      FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(0, {SIMHASH_BITS}),
                 b -> CASE WHEN list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(th,
                            h -> CASE WHEN (h >> b) & 1 = 1
                                 THEN CAST(1 AS BIGINT)
                                 ELSE CAST(-1 AS BIGINT) END)),
                        (acc, x) -> acc + x) > 0
                      THEN CAST(2 ** b AS BIGINT) ELSE 0 END)),
             (acc, x) -> acc + x) AS simhash
    FROM toks
    """,
    tags=("dedup", "simhash"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per token-occurrence hash, each bit votes +1/-1,
    sign of the vote sum sets the signature bit. Entirely within-row
    (nested array lambdas) — no shuffle at all; near-dup candidates then
    band-join on signature prefixes like MinHash. Production: 64-bit via
    xxhash64; 16 bits here keeps the oracle arithmetic in safe BIGINT
    range."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    # Project the md5 token-hash array ONCE; the 16 per-bit votes then
    # fold over the materialized bigint array (integer ops only).
    hashed = docs.select(
        "doc_id",
        F.transform(F.split("text", " ", -1), portable_hash).alias("th"))
    bit_votes = lambda b: F.aggregate(  # noqa: E731
        F.col("th"), F.lit(0).cast("bigint"),
        lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(2 ** b)) != 0, 1).otherwise(-1))
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(bit_votes(b) > 0, F.lit(2 ** b).cast("bigint")) \
               .otherwise(F.lit(0).cast("bigint"))
        sim = bit if sim is None else sim + bit
    return hashed.select("doc_id", sim.alias("simhash"))


HAMMING_MAX = 1


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            t -> {portable_hash_sql('t')}) AS th
      FROM documents
    ), sig AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(0, {SIMHASH_BITS}),
                   b -> CASE WHEN list_reduce(
                          list_prepend(CAST(0 AS BIGINT),
                            list_transform(th,
                              h -> CASE WHEN (h >> b) & 1 = 1
                                   THEN CAST(1 AS BIGINT)
                                   ELSE CAST(-1 AS BIGINT) END)),
                          (acc, x) -> acc + x) > 0
                        THEN CAST(2 ** b AS BIGINT) ELSE 0 END)),
               (acc, x) -> acc + x) AS simhash
      FROM toks
    ), bands AS (
      SELECT doc_id, simhash, 0 AS band, simhash >> 8 AS half FROM sig
      UNION ALL
      SELECT doc_id, simhash, 1, simhash & 255 FROM sig
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.half = b.half AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= {HAMMING_MAX}
    """,
    tags=("dedup", "simhash", "near-dup"))
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS: signatures band into two 8-bit halves; by
    pigeonhole, any pair within hamming distance 1 agrees exactly on at
    least one half, so the candidate join on (band, half) is lossless
    for the threshold. Verification is bit_count(xor) —
    integer ops end to end, same bucketed topology as MinHash-LSH with a
    far cheaper signature."""
    sig = dedup_simhash(spark, sf_dir)
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     F.shiftright("simhash", 8).alias("half")),
            F.struct(F.lit(1).alias("band"),
                     F.col("simhash").bitwiseAND(F.lit(255)).alias("half"))
        )).alias("b")).select("doc_id", "simhash", "b.band", "b.half")
    ba, bb = bands.alias("a"), bands.alias("b")
    cand = (ba.join(bb, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.half") == F.col("b.half"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.simhash").alias("sa"),
                    F.col("b.simhash").alias("sb"))
            .distinct())
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.where(hamming <= HAMMING_MAX)
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming")))


SIMHASH64_BITS = 64
SIMHASH64_BAND_BITS = 16
HAMMING64_MAX = 3     # 4 x 16-bit bands: pigeonhole-lossless for <= 3


@register(
    "dedup_simhash64_pairs",
    oracle=None,       # xxhash64 token hashes are JVM-only — no
                       # cross-engine oracle; the banding-losslessness
                       # claim (banded pairs == brute-force hamming<=3
                       # over the signatures) is pinned by
                       # tests/test_queries_vs_oracle.py
    tags=("dedup", "simhash", "near-dup", "production-hash"), bench=True,
    declared=False)    # bench + parity-pytest gated, like
                       # dedup_minhash_lsh_fast (COVERAGE.md)
def dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION SimHash: 64-bit signatures from xxhash64 token
    hashes, 4 x 16-bit pigeonhole bands, candidate pairs verified at
    hamming <= 3 — what anyone would deploy, vs the 16-bit/md5
    dedup_simhash_pairs whose width exists only so the oracle arithmetic
    stays portable.

    One pass per document builds all 64 bit-votes at once: the token
    array folds into a 64-wide vote vector (zip_with accumulate), then
    the signature ORs together 1<<b for every positive vote — O(tokens)
    per row instead of the 16-bit variant's bit-at-a-time O(16 x tokens).
    Banding/join topology is identical to the portable variant (and to
    MinHash-LSH): signature scan -> explode 4 band keys -> band-bucket
    self-join -> cheap bit_count verify. At 100 TB the candidate join
    shuffles only (band, 16-bit value) keys."""
    signatures = simhash64_signatures(spark, sf_dir).persist()
    n_bands = SIMHASH64_BITS // SIMHASH64_BAND_BITS
    band_structs = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftright("simhash", i * SIMHASH64_BAND_BITS)
                  .bitwiseAND(F.lit((1 << SIMHASH64_BAND_BITS) - 1))
                  .alias("bv"))
        for i in range(n_bands)])
    bands = (signatures.select("doc_id", "simhash",
                               F.explode(band_structs).alias("b"))
             .select("doc_id", "simhash", "b.band", "b.bv"))
    ba, bb = bands.alias("a"), bands.alias("b")
    cand = (ba.join(bb, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bv") == F.col("b.bv"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.simhash").alias("sa"),
                    F.col("b.simhash").alias("sb"))
            .distinct())
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (cand.where(hamming <= HAMMING64_MAX)
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming")))


def simhash64_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + 64-bit xxhash64 SimHash signature (the production
    signature stage, shared with the banding-losslessness parity test)."""
    docs = load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    zero64 = F.array_repeat(F.lit(0).cast("bigint"), SIMHASH64_BITS)
    bitvec = lambda h: F.transform(       # noqa: E731
        F.sequence(F.lit(0), F.lit(SIMHASH64_BITS - 1)),
        lambda b: F.when(F.getbit(h, b) == 1,
                         F.lit(1)).otherwise(F.lit(-1)).cast("bigint"))
    votes = F.aggregate(
        F.transform(F.split("text", " ", -1), lambda t: F.xxhash64(t)),
        zero64,
        lambda acc, h: F.zip_with(acc, bitvec(h), lambda a, v: a + v))
    sig = F.aggregate(
        F.zip_with(votes,
                   F.sequence(F.lit(0), F.lit(SIMHASH64_BITS - 1)),
                   lambda v, b: F.when(v > 0, F.call_function(
                         "shiftleft", F.lit(1).cast("bigint"), b))
                                 .otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, bit: acc.bitwiseOR(bit))
    return docs.select("doc_id", sig.alias("simhash"))


# ------------------------------------------------- embedding near-dup

EMB_DIM = 64
RP_PLANES = 16        # 4 bands x 4 bits
RP_BAND_BITS = 4
RP_COS_THRESHOLD = 0.4


def _rp_plane(p: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane, embedded as literals in
    BOTH engines' plans (no cross-engine hash needed)."""
    import hashlib
    return [1.0 if int(hashlib.md5(f"rp:{p}:{i}".encode()).hexdigest(),
                       16) % 2 else -1.0
            for i in range(EMB_DIM)]


def _rp_bit_sql(p: int) -> str:
    plane = "[" + ", ".join(str(x) for x in _rp_plane(p)) + "]"
    dot = (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           f"list_transform(range(1, {EMB_DIM} + 1), "
           f"i -> CAST(embedding[i] AS DOUBLE) * ({plane})[i])), "
           f"(acc, x) -> acc + x)")
    return f"CASE WHEN {dot} > 0 THEN 1 ELSE 0 END"


@register(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             {' , '.join(f'{_rp_bit_sql(p)} AS b{p}' for p in range(RP_PLANES))}
      FROM embeddings
    ), bands AS (
      {' UNION ALL '.join(
          f"SELECT vec_id, {band} AS band, "
          + ' + '.join(f'b{band * RP_BAND_BITS + j} * {1 << j}'
                       for j in range(RP_BAND_BITS))
          + " AS bucket FROM sig"
          for band in range(RP_PLANES // RP_BAND_BITS))}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           round({cosine_sql('ea.embedding', 'eb.embedding')}, 4) AS cos
    FROM cand JOIN embeddings ea ON ea.vec_id = vec_a
              JOIN embeddings eb ON eb.vec_id = vec_b
    WHERE {cosine_sql('ea.embedding', 'eb.embedding')} >= {RP_COS_THRESHOLD}
    """,
    tags=("dedup", "embedding", "lsh", "near-dup"))
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup WITHOUT a blocking label: random-hyperplane
    (sign) LSH. 16 deterministic ±1 hyperplanes (literals, identical in
    both engines) give each vector a 16-bit sign signature, banded 4x4
    bits; same-bucket pairs in any band are candidates, verified by exact
    cosine >= {RP_COS_THRESHOLD}.

    The complement to dedup_embedding_cosine (label-blocked) and
    sim_ivf_* (centroid-trained): hyperplane buckets need NO training
    pass, at the cost of probabilistic recall — P(candidate) =
    1-(1-(1-θ/π)^4)^4 per pair, ≈0.99 at cos 0.9 but ≈0.5 at this
    fixture's 0.4 threshold (documented: for real near-dup corpora the
    threshold sits ≥0.9; band bits scale with corpus size at 100 TB so
    bucket occupancy stays bounded). Signature is one row-local pass;
    candidates shuffle only (band, bucket) keys."""
    emb = load(spark, sf_dir, "embeddings")
    bits = [
        (F.aggregate(
            F.zip_with(F.col("embedding"),
                       F.array(*[F.lit(x) for x in _rp_plane(p)]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int").alias(f"b{p}")
        for p in range(RP_PLANES)]
    sig = emb.select("vec_id", "embedding", *bits).persist()
    n_bands = RP_PLANES // RP_BAND_BITS
    band_structs = F.array(*[
        F.struct(F.lit(band).alias("band"),
                 sum([F.col(f"b{band * RP_BAND_BITS + j}") * (1 << j)
                      for j in range(RP_BAND_BITS)], F.lit(0))
                 .alias("bucket"))
        for band in range(n_bands)])
    bands = (sig.select("vec_id", F.explode(band_structs).alias("b"))
             .select("vec_id", "b.band", "b.bucket"))
    ba, bb = bands.alias("a"), bands.alias("b")
    cand = (ba.join(bb, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"))
            .distinct())
    ea = sig.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"))
    eb = sig.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (cand.join(ea, "vec_a").join(eb, "vec_b")
            .where(cos >= RP_COS_THRESHOLD)
            .select("vec_a", "vec_b", F.round(cos, 4).alias("cos")))


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({cosine_sql('a.embedding', 'b.embedding')}, 4) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.4
    """,
    tags=("dedup", "embedding", "near-dup"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, blocked on a partition key (label) so
    the pairwise kernel is per-block O(b^2), not global O(n^2) — the same
    role LSH/IVF buckets play for unlabeled corpora (similarity.py). Dot
    products are left-fold double accumulation, identical in the oracle."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"),
                   F.col("label").alias("la"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"),
                   F.col("label").alias("lb"), F.col("embedding").alias("eb"))
    cos = cosine(F.col("ea"), F.col("eb"))
    return (a.join(b, (F.col("la") == F.col("lb"))
                   & (F.col("vec_a") < F.col("vec_b")))
            .where(cos >= 0.4)
            .select("vec_a", "vec_b", F.round(cos, 4).alias("cos")))


# ------------------------------------------------------- bloom filter

BLOOM_M = 8192      # bits in the filter (fixture-sized; 2^33+ in production)
BLOOM_K = 3         # hash functions


def _bloom_pos_sql(text_expr: str, seed_expr: str) -> str:
    h = portable_hash_sql(f"{text_expr} || '#' || CAST({seed_expr} AS VARCHAR)")
    return f"(({h}) % {BLOOM_M})"


@register(
    "dedup_bloom_incremental",
    oracle=f"""
    WITH a AS (SELECT * FROM documents WHERE doc_id % 4 != 0),
    b AS (SELECT * FROM documents WHERE doc_id % 4 = 0),
    seeds AS (SELECT unnest([0, 1, 2]) AS seed),
    bits AS (
      SELECT DISTINCT {_bloom_pos_sql('a.text', 'seed')} AS pos
      FROM a, seeds
    ),
    probe AS (
      SELECT b.doc_id, b.text, seed,
             {_bloom_pos_sql('b.text', 'seed')} AS pos
      FROM b, seeds
    ),
    hits AS (
      SELECT probe.doc_id, probe.text, COUNT(bits.pos) AS n_hits
      FROM probe LEFT JOIN bits USING (pos)
      GROUP BY 1, 2
    )
    SELECT h.doc_id, h.n_hits, h.n_hits = {BLOOM_K} AS maybe_dup,
           at.kh IS NOT NULL AS is_true_dup
    FROM hits h
    LEFT JOIN (SELECT DISTINCT {portable_hash_sql('text')} AS kh FROM a) at
      ON {portable_hash_sql('h.text')} = at.kh
    """,
    tags=("dedup", "bloom", "incremental"), bench=True)
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership dedup for INCREMENTAL ingest: an existing
    corpus (doc_id % 4 != 0) is folded into a Bloom filter (m=8192 bits,
    k=3 md5-seeded hash functions); an incoming batch (doc_id % 4 == 0)
    is probed against it. ``maybe_dup`` = all k bits set (Bloom "probably
    present" — no false negatives, bounded false positives);
    ``is_true_dup`` = ground-truth exact membership, so the row set
    documents the filter's false-positive behavior deterministically.

    This is the dedup shape the pairwise kernels can't give you: testing
    a NEW batch against an already-ingested 100 TB corpus without
    re-shuffling the corpus. The filter is built once (distinct bit
    positions — at most m rows regardless of corpus size) and BROADCAST
    to the probe side: the incoming batch never shuffles at all. In
    production the bit set persists as a tiny artifact (m = 2^33 bits
    = 1 GiB covers ~10^9 docs at k=3 with ~2% FP) and is unioned
    monotonically across ingests; the md5 portable hash keeps the
    positions oracle-reproducible (xxhash64 in production, same
    topology).

    No reference counterpart (connector delegates processing,
    SURVEY.md §2c); the incremental shape mirrors its consumer position:
    "what is new since the last committed offset".
    """
    docs = load(spark, sf_dir, "documents")
    seeds = F.array(*[F.lit(i) for i in range(BLOOM_K)])

    def positions(df: DataFrame) -> DataFrame:
        return (df.select("doc_id", "text",
                          F.explode(seeds).alias("seed"))
                .withColumn(
                    "pos",
                    portable_hash(F.concat_ws("#", F.col("text"),
                                              F.col("seed").cast("string")))
                    % BLOOM_M))

    corpus = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    bits = positions(corpus).select("pos").distinct()
    probe = positions(batch)
    hits = (probe.join(F.broadcast(bits.withColumnRenamed("pos", "bit")),
                       F.col("pos") == F.col("bit"), "left")
            .groupBy("doc_id")
            .agg(F.count("bit").alias("n_hits")))
    # Ground truth resolved by portable CONTENT HASH, not raw text: the
    # corpus-side distinct and the broadcast membership join carry 8-byte
    # hashes, so document text never enters an exchange anywhere in the
    # plan (pinned by plan test) — the same discipline dedup_exact_by_hash
    # applies, and the md5 hash keeps the oracle bit-identical.
    known = corpus.select(portable_hash(F.col("text")).alias("kh")).distinct()
    truth = (batch.withColumn("bh", portable_hash(F.col("text")))
             .join(F.broadcast(known), F.col("bh") == F.col("kh"), "left")
             .select("doc_id",
                     F.col("kh").isNotNull().alias("is_true_dup")))
    return (hits.join(truth, "doc_id")
            .select("doc_id", "n_hits",
                    (F.col("n_hits") == BLOOM_K).alias("maybe_dup"),
                    "is_true_dup"))


# ------------------------------------------------------ semantic dedup

SEMDEDUP_COS = 0.35     # within-cluster near-duplicate threshold


@register(
    "dedup_semantic",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings WHERE vec_id < 8
    ),
    assign AS (
      SELECT vec_id, embedding, cid, d2 FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               list_sum(list_transform(range(1, len(v.embedding)+1),
                 i -> (v.embedding[i]-c.ce[i])*(v.embedding[i]-c.ce[i])))
                 AS d2,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY list_sum(list_transform(
                                    range(1, len(v.embedding)+1),
                                    i -> (v.embedding[i]-c.ce[i])
                                         *(v.embedding[i]-c.ce[i]))), c.cid)
                 AS rnk
        FROM embeddings v CROSS JOIN cent c)
      WHERE rnk = 1
    ),
    removed_ids AS (
      SELECT DISTINCT a.vec_id
      FROM assign a JOIN assign u
        ON u.cid = a.cid AND u.vec_id != a.vec_id
      WHERE {cosine_sql('u.embedding', 'a.embedding')} >= {SEMDEDUP_COS}
        AND (u.d2 < a.d2 OR (u.d2 = a.d2 AND u.vec_id < a.vec_id))
    )
    SELECT a.vec_id, a.cid AS centroid_id,
           r.vec_id IS NOT NULL AS removed
    FROM assign a LEFT JOIN removed_ids r ON a.vec_id = r.vec_id
    """,
    tags=("dedup", "semantic", "embedding", "clustered"), bench=True)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic deduplication: cluster the
    embedding space (nearest-centroid assignment, same deterministic
    seed centroids as sim_ivf_assign), compute pairwise cosine ONLY
    within each cluster, and remove every vector that has a
    sufficiently-similar cluster-mate closer to the centroid (keep-the-
    most-central policy; ties broken by vec_id). Near-duplicate
    *meanings* — paraphrases, re-crawls, template rewrites — fall in the
    same cluster and die; exact-text dedup can't see them.

    Scale shape: this is precisely the trick that makes semantic dedup
    feasible at 100 TB — the O(n^2) cosine matrix becomes a self-join
    keyed on cluster id (corpus/C rows per key, (corpus/C)^2 work per
    cluster instead of corpus^2), centroids broadcast in the assignment
    pass, and the removal predicate is row-deterministic (no iterative
    graph pass needed, unlike connected-components survivor selection).
    In production the centroids come from the trained IVF index
    (sim_ivf_build) and hot clusters are capped/salted the same way the
    df-capped Jaccard bounds shingle fan-out.
    """
    from ..functions.portable import dot, norm
    from .similarity import N_CENTROIDS, _l2sq

    emb = load(spark, sf_dir, "embeddings")
    cent = (emb.where(F.col("vec_id") < N_CENTROIDS)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("ce")))
    from pyspark.sql import Window
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")
    # Norms precomputed once per vector (not per pair): cosine on a pair
    # is then a single fold + one divide, and the cos expression keeps
    # the dot/(sqrt*sqrt) tree of cosine_sql (bit-identical doubles).
    assign = (emb.crossJoin(F.broadcast(cent))
              .select("vec_id", "embedding", "cid",
                      _l2sq(F.col("embedding"), F.col("ce")).alias("d2"))
              .withColumn("rnk", F.row_number().over(w))
              .where(F.col("rnk") == 1)
              .withColumn("nrm", norm(F.col("embedding")))
              .drop("rnk"))
    a = assign.select(F.col("vec_id").alias("va"),
                      F.col("embedding").alias("ea"),
                      F.col("cid").alias("ca"), F.col("d2").alias("da"),
                      F.col("nrm").alias("na"))
    u = assign.select(F.col("vec_id").alias("vu"),
                      F.col("embedding").alias("eu"),
                      F.col("cid").alias("cu"), F.col("d2").alias("du"),
                      F.col("nrm").alias("nu"))
    # Each UNDIRECTED pair is scored once (va < vu halves the join), and
    # exactly one side loses: the farther-from-centroid vector (tie:
    # larger vec_id) — the union of losers equals the EXISTS semantics.
    cos = dot(F.col("ea"), F.col("eu")) / (F.col("na") * F.col("nu"))
    loser = F.when((F.col("da") < F.col("du"))
                   | ((F.col("da") == F.col("du"))
                      & (F.col("va") < F.col("vu"))),
                   F.col("vu")).otherwise(F.col("va"))
    dominated = (a.join(u, (F.col("ca") == F.col("cu"))
                        & (F.col("va") < F.col("vu")))
                 .where(cos >= SEMDEDUP_COS)
                 .select(loser.alias("rm_id"))
                 .distinct())
    return (assign.join(dominated, F.col("vec_id") == F.col("rm_id"), "left")
            .select("vec_id", F.col("cid").alias("centroid_id"),
                    F.col("rm_id").isNotNull().alias("removed")))


# --------------------------------------------------- fuzzy entity match

FUZZY_LEV_MAX = 2


@register(
    "dedup_fuzzy_names",
    oracle=f"""
    WITH s AS (SELECT s_suppkey, s_name, s_nationkey FROM supplier)
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS lev
    FROM s a JOIN s b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= {FUZZY_LEV_MAX}
    """,
    tags=("dedup", "fuzzy", "entity-matching", "levenshtein"))
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY ENTITY MATCHING — the record-linkage shape (same vendor
    spelled two ways, near-identical author names): a BLOCKED self-join
    (same nation = the blocking key) with an edit-distance threshold.
    Levenshtein is built-in JVM-side in Spark and native in DuckDB, so
    the distances are exact integers — the one string-similarity
    function the two engines share bit-for-bit.

    Scale shape: the blocking key is the entire story at 100 TB —
    candidate pairs are (block size)^2, so the block must be chosen to
    bound it (nation here; sorted-neighborhood keys or phonetic codes in
    production), exactly the role the LSH band plays for MinHash and the
    cluster id for SemDeDup. Edit distance itself is O(len^2) per pair
    and runs inside codegen; Spark's bounded form
    levenshtein(a, b, threshold) caps that cost when only the
    within-threshold pairs matter (kept unbounded here because the
    projected distance is part of the contract)."""
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey")
    a = supp.select(F.col("s_suppkey").alias("supp_a"),
                    F.col("s_name").alias("name_a"),
                    F.col("s_nationkey").alias("nk_a"))
    b = supp.select(F.col("s_suppkey").alias("supp_b"),
                    F.col("s_name").alias("name_b"),
                    F.col("s_nationkey").alias("nk_b"))
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (a.join(b, (F.col("nk_a") == F.col("nk_b"))
                   & (F.col("supp_a") < F.col("supp_b")))
            .where(lev <= FUZZY_LEV_MAX)
            .select("supp_a", "supp_b", lev.cast("int").alias("lev")))


# -------------------------------------- prefix-filtered similarity join

PREFIX_JACCARD_T = 0.8


@register(
    "dedup_jaccard_prefix_filter",
    oracle=f"""
    WITH {_jaccard_pairs_ctes()}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
    tags=("dedup", "jaccard", "prefix-filter", "ppjoin"), bench=True)
def dedup_jaccard_prefix_filter(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """PREFIX-FILTERED set-similarity join (the AllPairs/PPJoin family,
    Bayardo et al. WWW'07) — the third candidate-generation strategy
    alongside the full inverted index (dedup_ngram_jaccard) and MinHash
    banding (dedup_minhash_lsh), and unlike LSH it is EXACT: with every
    document's token set sorted by one global (df, token) order, two
    sets with Jaccard >= t must collide on the first
    n - ceil(t*n) + 1 tokens of each, so only PREFIX tokens enter the
    posting self-join. Rare-token prefixes make the candidate count a
    small fraction of the full index's sum(df^2).

    The ORACLE is the unfiltered all-pairs join — so the driver's hash
    equality IS the losslessness proof on this corpus, not just a
    determinism check.

    Scale shape: the global order needs no global rank — (df, token)
    tuples ARE the order, so the df relation (vocab-sized) joins onto
    postings by token and each doc sorts its own tokens row-locally;
    the only quadratic work is the prefix-posting join, whose per-token
    fan-out is bounded by the df of RARE tokens by construction (the
    exact opposite of the full index's skew profile).

    The shingle-set relation feeds FOUR consumers here (posting for the
    df relation, posting for the ordered-prefix build, and both verify
    sides) — one more than _jaccard_pairs' three, and that tips the
    recompute-vs-persist tradeoff the other way: A/B at sf0.1 measured
    the persist barrier ~25% faster end-to-end (5.0 -> 3.9 s median,
    identical output), where _jaccard_pairs measured recompute cheaper
    at three consumers. Persist is a tool, not a default — in both
    directions."""
    docs = load(spark, sf_dir, "documents")
    # filtered=False: the persist barrier makes any downstream empty-set
    # handling a cheap cached-attribute operation, while the pushed
    # guard would re-evaluate the full pipeline twice per scan row at
    # cache FILL time; empty docs never enter `cand` (no postings), so
    # the verify joins are unchanged
    sets = (_shingle_sets(docs, filtered=False)
            .withColumnRenamed("sh", "tk").persist())
    posting = sets.select("doc_id", F.explode("tk").alias("s"))
    df_rel = posting.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # (df, token)-sorted tokens per doc, prefix sliced row-locally
    with_df = (posting.join(df_rel, "s")
               .groupBy("doc_id")
               .agg(F.array_sort(
                    F.collect_list(F.struct("df", "s"))).alias("ordered")))
    n = F.size("ordered")
    prefix_len = (n - F.floor((n * 4 + 4) / 5).cast("int") + 1)
    prefixes = (with_df
                .select("doc_id", n.alias("n"),
                        F.transform(F.slice("ordered", 1, prefix_len),
                                    lambda x: x["s"]).alias("prefix")))
    pp = prefixes.select("doc_id", "n", F.explode("prefix").alias("s"))
    # AllPairs LENGTH filter (Bayardo et al. §3): J(A,B) <= min/max, so
    # J >= 4/5 forces 5*min(|A|,|B|) >= 4*max(|A|,|B|) — an admissible
    # candidate drop, in EXACT integer cross-multiplication (a float
    # 0.8*|B| would mis-round the J == 0.8 boundary pair). The all-pairs
    # oracle keeps this provably lossless corpus-wide on every driver
    # run; A/B at sf0.1: ~6% median, more as size variance grows.
    cand = (pp.alias("a").join(
                pp.alias("b"),
                (F.col("a.s") == F.col("b.s"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (5 * F.col("a.n") >= 4 * F.col("b.n"))
                & (5 * F.col("b.n") >= 4 * F.col("a.n")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("tk").alias("tka"))
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("tk").alias("tkb"))
    i = F.size(F.array_intersect("tka", "tkb"))
    jac = i.cast("double") / (F.size("tka") + F.size("tkb") - i)
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .where(F.col("jaccard") >= PREFIX_JACCARD_T))


# ----------------------------------------------- containment near-dup

CONTAINMENT_T = 0.9


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH sets AS ({_shingle_sets_sql()}),
    sizes AS (SELECT doc_id, len(sh) AS n FROM sets),
    posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
      FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(both_n AS DOUBLE) / LEAST(sa.n, sb.n) AS containment,
           CAST(both_n AS DOUBLE) / (sa.n + sb.n - both_n) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(both_n AS DOUBLE) / LEAST(sa.n, sb.n) >= {CONTAINMENT_T}
    """,
    tags=("dedup", "containment", "subset"))
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHINGLE CONTAINMENT near-dup — |A∩B| / min(|A|,|B|) >= 0.9: the
    asymmetric duplicate class Jaccard structurally MISSES (a document
    embedded verbatim in a much longer one has containment 1.0 but
    Jaccard ~ |A|/|B| -> 0; quote-heavy pages, article+comments
    re-crawls, chunk-of-document leaks). Projects Jaccard alongside so
    the divergence is visible row-by-row. Document-level complement of
    chunk_dedup_containment (which scores chunk overlap WITHIN a doc
    pair's chunks).

    Scale shape: identical topology to dedup_ngram_jaccard (posting
    self-join -> size join-back); at 100 TB it runs per-LSH-bucket like
    the other verification kernels, and the df-cap lever applies
    unchanged. The MIN-side denominator needs no extra pass — both
    sizes are already in the join."""
    docs = load(spark, sf_dir, "documents")
    # filtered=False + explode_OUTER (see _jaccard_pairs): empty docs
    # cannot reach `inter`, so the join-back keyed on inter's docs is
    # unchanged and every scan row skips the pushed empty-set guard
    sets = _shingle_sets(docs, filtered=False)
    sizes = sets.select("doc_id", F.size("sh").alias("n"))
    posting = sets.select("doc_id", F.explode_outer("sh").alias("s"))
    pa_, pb_ = posting.alias("a"), posting.alias("b")
    inter = (pa_.join(pb_, (F.col("a.s") == F.col("b.s"))
                      & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count(F.lit(1)).alias("both_n")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n").alias("nb"))
    cont = (F.col("both_n").cast("double")
            / F.least(F.col("na"), F.col("nb")))
    jac = (F.col("both_n").cast("double")
           / (F.col("na") + F.col("nb") - F.col("both_n")))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b", cont.alias("containment"),
                    jac.alias("jaccard"))
            .where(F.col("containment") >= CONTAINMENT_T))


def streaming_band_rows(parsed: DataFrame) -> DataFrame:
    """(doc_id, band, v0, v1) LSH band rows from a STREAMING (doc_id,
    text) relation — the stateless front of the streaming near-dup gate
    (dis_stream_neardup_lsh_streamed). Same shingle/signature/banding
    math as _with_signature + _lsh_pairs, minus the persist() barrier
    (unavailable on streams): CollapseProject therefore re-inlines the
    hashed-shingle array into each of the 8 signature mins, an ~8x
    expression blowup that is irrelevant at micro-batch row counts and
    pays for keeping the whole front stateless and shuffle-free."""
    hashed = (parsed
              .select("doc_id", tokens("text").alias("tk"))
              .select("doc_id", word_shingles("tk", SHINGLE_N).alias("sh"))
              .where(F.size("sh") > 0)
              .withColumn("hs", F.transform(
                  F.col("sh"), lambda s: portable_hash(s) % MINHASH_PRIME)))
    sig_cols = [
        F.array_min(F.transform(
            F.col("hs"),
            lambda h: (h * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_PRIME))
        .alias(f"h{i}")
        for i in range(NUM_HASHES)]
    sig = hashed.select("doc_id", *sig_cols)
    band_structs = F.array(*[
        F.struct(F.lit(band).alias("band"),
                 F.col(f"h{band * BAND_SIZE}").alias("v0"),
                 F.col(f"h{band * BAND_SIZE + 1}").alias("v1"))
        for band in range(NUM_HASHES // BAND_SIZE)])
    return (sig.select("doc_id", F.explode(band_structs).alias("b"))
            .select("doc_id", "b.band", "b.v0", "b.v1"))


# ------------------------------------------- duplicated substring spans

SPAN_GRAM_N = 8


def _span_ctes() -> str:
    """Shared DuckDB CTE chain: tokenized docs -> positioned 8-grams ->
    cross-doc duplicated positions -> merged maximal spans (+ doc token
    totals). Ends defining ``toks2``, ``spans`` and ``tot``."""
    return f"""toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ), toks2 AS (SELECT doc_id, t FROM toks WHERE len(t) >= {SPAN_GRAM_N}),
    grams AS (
      SELECT doc_id, unnest(list_transform(
               range(1, len(t) - {SPAN_GRAM_N} + 2),
               i -> {{'p': i - 1,
                      'g': array_to_string(
                             list_slice(t, i, i + {SPAN_GRAM_N} - 1),
                             ' ')}})) AS r
      FROM toks2
    ), pg AS (SELECT doc_id, r.p AS p, r.g AS g FROM grams),
    dup AS (SELECT g FROM pg GROUP BY g HAVING count(DISTINCT doc_id) > 1),
    dpos AS (SELECT doc_id, p FROM pg WHERE g IN (SELECT g FROM dup)),
    lagged AS (
      SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
      FROM dpos
    ),
    isl AS (
      SELECT doc_id, p,
             SUM(CASE WHEN prev IS NULL OR p > prev + {SPAN_GRAM_N}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM lagged
    ),
    spans AS (
      SELECT doc_id, island, MIN(p) AS s, MAX(p) + {SPAN_GRAM_N} - 1 AS e
      FROM isl GROUP BY doc_id, island
    ),
    tot AS (SELECT doc_id, len(t) AS tot_tokens FROM toks2)"""


def _span_frames(spark: SparkSession, sf_dir: str,
                 hashed: bool = False) -> tuple[DataFrame, DataFrame]:
    """(toks, spans): tokenized docs ``(doc_id, t, tot_tokens)`` and
    merged duplicated spans ``(doc_id, tot_tokens, s, e)`` — the Spark
    twin of :func:`_span_ctes`, shared by the span-report and excision
    operators so both threshold the SAME duplication evidence.
    ``hashed=True`` is the production posting key: each positioned gram
    collapses to xxhash64 BEFORE the corpus-wide groupBy/join, so the
    only big shuffle moves 8-byte longs instead of ~50-byte gram
    strings — same discipline as dedup_ngram_jaccard_fast (a 64-bit
    collision marking a false duplicate position is the only divergence
    source; the parity pytest pins equality on the fixtures)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    # toks keeps the >= SPAN_GRAM_N guard — pipeline_span_excision's
    # tot relation is contractually filtered (LEFT JOIN keyed on it)
    toks = (docs.repartition(para)
            .select("doc_id", tokens("text").alias("t"))
            .where(F.size("t") >= SPAN_GRAM_N)
            .withColumn("tot_tokens", F.size("t")))
    # The positioned-gram relation is built from an UNFILTERED chain:
    # a doc with < SPAN_GRAM_N tokens yields only null gram slots, so
    # the g-isNotNull filter (cheap, on the generated attribute) drops
    # exactly the rows the toks guard would have — while the guard's
    # pushed form re-evaluated the tokenize per scan row, and plain
    # posexplode would re-infer it (r13 scan-hygiene pass). posexplode_
    # OUTER suppresses the inference.
    gram = F.posexplode_outer(word_gram_positions("t", SPAN_GRAM_N))
    pg = (docs.repartition(para)
          .select("doc_id", tokens("text").alias("t"))
          .select("doc_id", F.size("t").alias("tot_tokens"),
                  gram.alias("p", "g"))
          .where(F.col("g").isNotNull()))
    if hashed:
        pg = pg.select("doc_id", "tot_tokens", "p",
                       F.xxhash64("g").alias("g"))
    dup = (pg.groupBy("g")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .where(F.col("nd") > 1)
           .select("g"))
    dpos = pg.join(dup, "g").select("doc_id", "tot_tokens", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    marker = F.when(
        F.col("prev").isNull()
        | (F.col("p") > F.col("prev") + SPAN_GRAM_N), 1).otherwise(0)
    isl = (dpos.withColumn("prev", F.lag("p").over(w))
           .withColumn("island", F.sum(marker).over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    spans = (isl.groupBy("doc_id", "tot_tokens", "island")
             .agg(F.min("p").alias("s"),
                  (F.max("p") + F.lit(SPAN_GRAM_N - 1)).alias("e")))
    return toks, spans


@register(
    "dedup_duplicated_spans",
    oracle=f"""
    WITH {_span_ctes()}
    SELECT spans.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
           CAST(MAX(tot_tokens) AS BIGINT) AS tot_tokens,
           ROUND(CAST(SUM(e - s + 1) AS DOUBLE) / MAX(tot_tokens), 4) + 0.0
             AS dup_frac
    FROM spans JOIN tot ON tot.doc_id = spans.doc_id
    GROUP BY spans.doc_id
    ORDER BY spans.doc_id
    """,
    tags=("dedup", "substring", "spans", "pipeline"), bench=True)
def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-DOCUMENT DUPLICATED SUBSTRING SPANS — the training-data
    hygiene operator of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (exact-substring dedup), re-expressed as a
    shuffle-parallel DataFrame pipeline instead of a suffix array: every
    8-token gram that occurs in MORE THAN ONE document marks its start
    position as duplicated; per document, overlapping/adjacent marked
    windows merge (gaps-and-islands over a lag/rolling-sum window) into
    maximal spans. Output per affected doc: span count, duplicated-token
    total, doc length, duplicated fraction — the quantities a curation
    pipeline thresholds on before cutting spans out of the corpus.

    100 TB shape: one corpus-wide shuffle — the gram groupBy (HAVING
    count(DISTINCT doc) > 1) and the join back of surviving grams; at
    production scale both move a 128-bit gram fingerprint, not the gram
    text (xxhash64-pair discipline of dedup_ngram_jaccard_fast), and
    boilerplate grams past a document-frequency cap are dropped exactly
    like high-df shingles (they mark everything and discriminate
    nothing). The island merge is per-document window work, partitioned
    by doc_id — no cross-doc state. The suffix-array formulation needs a
    global sort of the concatenated corpus; this form needs only
    hash-shuffles, which is why it is the one that survives 1000
    executors. Reference scope check: the connector (DISUtils.scala)
    ships payloads opaquely; corpus hygiene is engine-side — parity
    target is capability, not a reference operator."""
    _, spans = _span_frames(spark, sf_dir)
    return _span_report(spans)


def _span_report(spans: DataFrame) -> DataFrame:
    return (spans.groupBy("doc_id", "tot_tokens")
            .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                 F.sum(F.col("e") - F.col("s") + 1).cast("long")
                  .alias("dup_tokens"))
            .select("doc_id", "n_spans", "dup_tokens",
                    F.col("tot_tokens").cast("long").alias("tot_tokens"),
                    (F.round(F.col("dup_tokens").cast("double")
                             / F.col("tot_tokens"), 4) + 0.0)
                    .alias("dup_frac"))
            .orderBy("doc_id"))


@register(
    "dedup_duplicated_spans_fast",
    oracle=None,       # xxhash64 gram keys are JVM-only; the report is
                       # asserted equal to the portable string-key
                       # pipeline in tests (64-bit collisions would be
                       # the only divergence source)
    tags=("dedup", "substring", "spans", "production-hash"), bench=False,
    declared=False)    # parity-pytest gated (COVERAGE.md); un-benched
                       # r13 under the headline byte budget (see
                       # dedup_minhash_lsh_fast note)
def dedup_duplicated_spans_fast(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """dedup_duplicated_spans with the production posting keys: every
    positioned 8-gram hashed to xxhash64 before the corpus-wide
    duplicate-marking shuffle — at 100 TB that shuffle is this
    operator's dominant cost and its key width is the first lever
    (identical topology, ~6x fewer shuffled bytes per gram)."""
    _, spans = _span_frames(spark, sf_dir, hashed=True)
    return _span_report(spans)


@register(
    "pipeline_span_excision",
    oracle=f"""
    WITH {_span_ctes()},
    tokpos AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) + 1),
                    i -> {{'p': i - 1, 'tok': t[i]}})) AS r
      FROM toks2
    ), tp AS (SELECT doc_id, r.p AS p, r.tok AS tok FROM tokpos),
    kept AS (
      SELECT tp.doc_id, tp.p, tp.tok FROM tp
      WHERE NOT EXISTS (SELECT 1 FROM spans sp
                        WHERE sp.doc_id = tp.doc_id
                          AND tp.p BETWEEN sp.s AND sp.e)
    )
    SELECT t.doc_id,
           COALESCE(string_agg(k.tok, ' ' ORDER BY k.p), '') AS kept_text,
           CAST(COUNT(k.p) AS BIGINT) AS n_kept,
           CAST(MAX(t.tot_tokens) - COUNT(k.p) AS BIGINT) AS n_removed
    FROM tot t LEFT JOIN kept k ON k.doc_id = t.doc_id
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("dedup", "substring", "excision", "pipeline"))
def pipeline_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING EXCISION — the actionable half of
    dedup_duplicated_spans: actually CUT the cross-document duplicated
    spans out and emit the cleaned token stream per document (every doc
    >= 8 tokens appears; unaffected docs pass through whole, a fully
    duplicated doc comes out empty). This is the corpus a training run
    would consume after Lee-et-al-style exact-substring dedup.

    Plan: token positions anti-join the merged span intervals ON doc_id
    (an interval probe against the handful of spans of the SAME doc —
    never a corpus-wide range join), then per-doc reassembly via
    array_sort(collect_list(struct(p, tok))) — grouped by doc_id, so
    reassembly is partition-local after one hash shuffle. At 100 TB both
    sides of the anti-join are already partitioned by doc_id from the
    span stage; the only corpus-wide move remains the gram shuffle
    inherited from _span_frames."""
    toks, spans = _span_frames(spark, sf_dir)
    tp = (toks.select("doc_id", "tot_tokens",
                      F.posexplode("t").alias("p", "tok")))
    sp = spans.select(F.col("doc_id").alias("s_doc"), "s", "e")
    kept = tp.join(
        sp, (F.col("doc_id") == F.col("s_doc"))
        & F.col("p").between(F.col("s"), F.col("e")), "left_anti")
    kept_agg = (kept.groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                     F.array_join(
                         F.transform(
                             F.array_sort(
                                 F.collect_list(F.struct("p", "tok"))),
                             lambda r: r["tok"]), " ").alias("kept_text")))
    n_kept = F.coalesce("n_kept", F.lit(0).cast("long"))
    return (toks.select("doc_id",
                        F.col("tot_tokens").cast("long").alias("tt"))
            .join(kept_agg, "doc_id", "left_outer")
            .select("doc_id",
                    F.coalesce("kept_text", F.lit("")).alias("kept_text"),
                    n_kept.alias("n_kept"),
                    (F.col("tt") - n_kept).cast("long").alias("n_removed"))
            .orderBy("doc_id"))


LEV_THRESHOLD = 2
LEV_LEN_BAND = 2


@register(
    "dedup_levenshtein_blocked",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[1] AS tok,
             length(p_name) AS ln
      FROM part
    ), pairs AS (
      SELECT a.tok AS tok,
             CASE WHEN levenshtein(a.p_name, b.p_name) <= {LEV_THRESHOLD}
                  THEN 1 ELSE 0 END AS near
      FROM p a JOIN p b
        ON a.tok = b.tok
       AND abs(a.ln - b.ln) <= {LEV_LEN_BAND}
       AND a.p_partkey < b.p_partkey
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(near) AS BIGINT) AS n_near_pairs
    FROM pairs GROUP BY tok
    """,
    tags=("connector", "dedup", "fuzzy", "blocking"), bench=True)
def dedup_levenshtein_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED EDIT-DISTANCE NEAR-DUP DETECTION — the fuzzy-matching
    tier the shingle/LSH family can't express: Jaccard on shingles is
    blind to single-character typos inside words, while edit distance
    <= {LEV_THRESHOLD} is precisely "same string up to a couple of
    typos" (the entity-resolution / short-text-dedup workhorse:
    product titles, author names, URLs). All-pairs Levenshtein is
    O(n^2 * len^2) and unshippable, so candidates are BLOCKED exactly
    like the LSH rows band: a pair is compared only when both sides
    share a first token AND their lengths differ by <= {LEV_LEN_BAND}
    (an admissible filter for the threshold — each edit changes length
    by at most 1, so a true pair within {LEV_THRESHOLD} edits always
    lands in the same length band; the first-token block is the
    declared recall tradeoff, as with LSH banding). Emits per-block
    audit aggregates (candidate pairs vs near-pairs), bounded by the
    token vocabulary, not by the pair count.

    Exactness: Spark's levenshtein and DuckDB's agree on unit-cost edit
    distance (pinned by the oracle hash); counts are pure integers. The
    Spark side uses the THRESHOLD-capped levenshtein(l, r, k) variant —
    the banded-DP early-exit runs O(k * len) per pair instead of
    O(len^2), the kind of kernel-level cap that matters at 1e7+
    candidate pairs; -1 (= "exceeds k") maps to near = 0.

    Scale shape: the self-join shuffles BOTH sides by tok (equi-key),
    so comparisons are block-local — no broadcast of the corpus, no
    all-pairs; block-size skew (hot first tokens) is the LSH rows' df-cap
    concern and is handled by AQE skew-join splitting at runtime; the
    per-block aggregate is map-side combinable down to |vocab| rows."""
    p = (load(spark, sf_dir, "part")
         .select("p_partkey", "p_name",
                 F.split("p_name", " ").getItem(0).alias("tok"),
                 F.length("p_name").alias("ln")))
    a, b = p.alias("a"), p.alias("b")
    pairs = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                    & (F.abs(F.col("a.ln") - F.col("b.ln"))
                       <= LEV_LEN_BAND)
                    & (F.col("a.p_partkey") < F.col("b.p_partkey")))
             .select(F.col("a.tok").alias("tok"),
                     F.when(F.levenshtein(F.col("a.p_name"),
                                          F.col("b.p_name"),
                                          LEV_THRESHOLD) >= 0, 1)
                     .otherwise(0).alias("near")))
    return (pairs.groupBy("tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                 F.sum("near").cast("bigint").alias("n_near_pairs")))


# Sorted-neighborhood window (r12 verdict #4): inside each first-token
# block, members are sorted lexicographically and each is compared only
# to its next LEV_WINDOW neighbors. Per-member work is <= LEV_WINDOW
# comparisons BY CONSTRUCTION — a hot block of m members costs
# m * LEV_WINDOW pairs (linear), never m^2/2, no matter how skewed the
# token distribution gets. The classic SNM bound (Hernandez & Stolfo,
# "The merge/purge problem", SIGMOD '95 — published method, public
# knowledge).
LEV_WINDOW = 8


@register(
    "dedup_levenshtein_capped",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[1] AS tok,
             length(p_name) AS ln
      FROM part
    ), ranked AS (
      SELECT p_partkey, p_name, tok, ln,
             ROW_NUMBER() OVER (PARTITION BY tok
                                ORDER BY p_name, p_partkey) AS rn
      FROM p
    ), pairs AS (
      SELECT a.tok AS tok,
             CASE WHEN levenshtein(a.p_name, b.p_name) <= {LEV_THRESHOLD}
                  THEN 1 ELSE 0 END AS near
      FROM ranked a JOIN ranked b
        ON a.tok = b.tok
       AND b.rn - a.rn BETWEEN 1 AND {LEV_WINDOW}
       AND abs(a.ln - b.ln) <= {LEV_LEN_BAND}
    )
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(near) AS BIGINT) AS n_near_pairs
    FROM pairs GROUP BY tok
    """,
    tags=("connector", "dedup", "fuzzy", "blocking", "capped"), bench=True)
def dedup_levenshtein_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE NEAR-DUP with hot-block work CAPPED BY CONSTRUCTION
    (r12 verdict #4): dedup_levenshtein_blocked's equi-join compares all
    pairs inside a block, so a hot first token ("the", a dominant brand)
    makes that block's pair count quadratic — AQE skew-splitting
    redistributes that work across tasks, it does not shrink it. This
    variant bounds the WORK itself with the sorted-neighborhood method:
    members of a block are sorted lexicographically (p_name, then key
    for determinism) and each member is compared ONLY to its next
    {LEV_WINDOW} neighbors in that order. Total comparisons are
    <= n * {LEV_WINDOW} — linear in the corpus no matter how skewed the
    token distribution gets; the bound holds at 100 TB by algebra, not
    by runtime mitigation. (Sub-blocking-with-drop — the n-gram df-cap
    idiom — was rejected for this row: the fixture's fixed two-token
    vocabulary makes EVERY composite key over-cap beyond sf0.01, i.e.
    drops degenerate to an empty relation; SNM keeps real kernel work
    at every scale with the same hard bound.)

    The recall tradeoff is declared, like LSH banding's: a true
    near-pair is found iff the two strings land within {LEV_WINDOW}
    positions in their block's sort order — small edits mostly preserve
    lexicographic locality (the method's published premise), with
    first-character edits the known blind spot (they are also the
    first-token BLOCK's blind spot, so nothing new is lost here). The
    length band stays as a pre-kernel admissibility filter, and the
    kernel is the threshold-capped levenshtein(l, r, k) banded DP
    (O(k*len)/pair).

    Plan shape: ONE shuffle (by tok, sorting within the window
    partition), then {LEV_WINDOW} lead() columns, posexplode, filter,
    kernel, map-side-combinable aggregate — NO join anywhere, so there
    is no join-key skew to mitigate and nothing for AQE to repair; the
    hottest block costs one task m*log(m) sort + m*{LEV_WINDOW} kernel
    calls (pytest-pinned join-free in test_plan_shapes)."""
    from pyspark.sql import Window

    p = (load(spark, sf_dir, "part")
         .select("p_partkey", "p_name",
                 F.split("p_name", " ").getItem(0).alias("tok"),
                 F.length("p_name").alias("ln")))
    w = Window.partitionBy("tok").orderBy("p_name", "p_partkey")
    with_leads = p.select(
        "tok", "p_name", "ln",
        F.array(*[
            F.struct(F.lead("p_name", i).over(w).alias("nb_name"),
                     F.lead("ln", i).over(w).alias("nb_ln"))
            for i in range(1, LEV_WINDOW + 1)]).alias("neighbors"))
    cand = (with_leads
            .select("tok", "p_name", "ln",
                    F.explode("neighbors").alias("nb"))
            .where(F.col("nb.nb_name").isNotNull()
                   & (F.abs(F.col("ln") - F.col("nb.nb_ln"))
                      <= LEV_LEN_BAND)))
    pairs = cand.select(
        "tok",
        F.when(F.levenshtein(F.col("p_name"), F.col("nb.nb_name"),
                             LEV_THRESHOLD) >= 0, 1)
        .otherwise(0).alias("near"))
    return (pairs.groupBy("tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                 F.sum("near").cast("bigint").alias("n_near_pairs")))


def _snm_pass(p: DataFrame, block_col: str, order_col: str) -> DataFrame:
    """One sorted-neighborhood pass: block by ``block_col``, sort by
    ``order_col`` (tie p_partkey), compare each member to its next
    LEV_WINDOW neighbors. Returns canonical (ka < kb) scored pairs.
    Work is n * LEV_WINDOW by construction — see dedup_levenshtein_capped."""
    from pyspark.sql import Window

    w = Window.partitionBy(block_col).orderBy(order_col, "p_partkey")
    with_leads = p.select(
        block_col, "p_partkey", "p_name", "ln", order_col,
        F.array(*[
            F.struct(F.lead("p_name", i).over(w).alias("nb_name"),
                     F.lead("ln", i).over(w).alias("nb_ln"),
                     F.lead("p_partkey", i).over(w).alias("nb_key"))
            for i in range(1, LEV_WINDOW + 1)]).alias("neighbors"))
    return (with_leads
            .select("p_partkey", "p_name", "ln",
                    F.explode("neighbors").alias("nb"))
            .where(F.col("nb.nb_name").isNotNull()
                   & (F.abs(F.col("ln") - F.col("nb.nb_ln"))
                      <= LEV_LEN_BAND))
            .select(F.least("p_partkey", F.col("nb.nb_key")).alias("ka"),
                    F.greatest("p_partkey", F.col("nb.nb_key")).alias("kb"),
                    F.when(F.levenshtein(F.col("p_name"),
                                         F.col("nb.nb_name"),
                                         LEV_THRESHOLD) >= 0, 1)
                    .otherwise(0).alias("near")))


@register(
    "dedup_levenshtein_multipass",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[1] AS tok,
             string_split(p_name, ' ')[-1] AS tok_last,
             length(p_name) AS ln
      FROM part
    ), r1 AS (
      SELECT p_partkey, p_name, tok, ln,
             ROW_NUMBER() OVER (PARTITION BY tok
                                ORDER BY p_name, p_partkey) AS rn
      FROM p
    ), pairs1 AS (
      SELECT least(a.p_partkey, b.p_partkey) AS ka,
             greatest(a.p_partkey, b.p_partkey) AS kb,
             CASE WHEN levenshtein(a.p_name, b.p_name) <= {LEV_THRESHOLD}
                  THEN 1 ELSE 0 END AS near
      FROM r1 a JOIN r1 b
        ON a.tok = b.tok
       AND b.rn - a.rn BETWEEN 1 AND {LEV_WINDOW}
       AND abs(a.ln - b.ln) <= {LEV_LEN_BAND}
    ), r2 AS (
      SELECT p_partkey, p_name, tok_last, ln,
             ROW_NUMBER() OVER (PARTITION BY tok_last
                                ORDER BY reverse(p_name), p_partkey) AS rn
      FROM p
    ), pairs2 AS (
      SELECT least(a.p_partkey, b.p_partkey) AS ka,
             greatest(a.p_partkey, b.p_partkey) AS kb,
             CASE WHEN levenshtein(a.p_name, b.p_name) <= {LEV_THRESHOLD}
                  THEN 1 ELSE 0 END AS near
      FROM r2 a JOIN r2 b
        ON a.tok_last = b.tok_last
       AND b.rn - a.rn BETWEEN 1 AND {LEV_WINDOW}
       AND abs(a.ln - b.ln) <= {LEV_LEN_BAND}
    )
    SELECT 'p1_first_token' AS pass,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(near) AS BIGINT) AS n_near_pairs
    FROM pairs1
    UNION ALL
    SELECT 'p2_last_token_rev',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(near) AS BIGINT)
    FROM pairs2
    UNION ALL
    SELECT 'union_distinct',
           CAST(COUNT(*) AS BIGINT), CAST(SUM(near) AS BIGINT)
    FROM (SELECT DISTINCT ka, kb, near
          FROM (SELECT * FROM pairs1 UNION ALL SELECT * FROM pairs2))
    """,
    tags=("connector", "dedup", "fuzzy", "blocking", "capped",
          "multipass"))
def dedup_levenshtein_multipass(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """MULTI-PASS sorted-neighborhood near-dup — the published answer to
    single-pass SNM's blind spots (Hernandez & Stolfo run SNM with
    SEVERAL independent keys and union the matches): pass 1 blocks on
    the FIRST token sorted lexicographically (dedup_levenshtein_capped's
    key — blind to edits in the first token and to pairs that sort far
    apart); pass 2 blocks on the LAST token sorted by the REVERSED name
    (clusters shared suffixes, so a typo in the first word — the exact
    pair pass 1 structurally cannot see — lands adjacent). Candidates
    are the UNION of both passes, deduplicated on the canonical
    (min_key, max_key) pair.

    Output is the per-pass audit: candidate/near counts for each pass
    plus the distinct union — the numbers an ER engineer reads to
    decide whether another pass is worth its linear cost. Work is
    2 * n * {LEV_WINDOW} comparisons by construction (two independent
    SNM passes, each one shuffle + window, still JOIN-FREE on the Spark
    side); the oracle mirrors both passes with window CTEs."""
    p = (load(spark, sf_dir, "part")
         .select("p_partkey", "p_name",
                 F.split("p_name", " ").getItem(0).alias("tok"),
                 F.element_at(F.split("p_name", " "), -1)
                 .alias("tok_last"),
                 F.length("p_name").alias("ln"),
                 F.reverse("p_name").alias("rev_name")))
    pairs1 = _snm_pass(p, "tok", "p_name")
    pairs2 = _snm_pass(p, "tok_last", "rev_name")
    one = pairs1.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("near").cast("bigint").alias("n_near_pairs")).select(
        F.lit("p1_first_token").alias("pass"), "n_candidates",
        "n_near_pairs")
    two = pairs2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("near").cast("bigint").alias("n_near_pairs")).select(
        F.lit("p2_last_token_rev").alias("pass"), "n_candidates",
        "n_near_pairs")
    uni = (pairs1.unionAll(pairs2).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("near").cast("bigint").alias("n_near_pairs")).select(
        F.lit("union_distinct").alias("pass"), "n_candidates",
        "n_near_pairs"))
    return one.unionAll(two).unionAll(uni)


# Entity-resolution scoring threshold: lev <= 3 is the band where the
# fixture's name vocabulary has real transitive structure (bolt ~ rod ~
# ring chains) — the composition's CC stage then does non-trivial work.
ER_LEV_THRESHOLD = 3
ER_LEN_BAND = 3


def _er_distinct_names(part: DataFrame) -> DataFrame:
    """ER stage 1, the exact collapse: one map-side-combinable aggregate
    turns the corpus into the distinct-name relation (p_name, n_records,
    name_key) that every quadratic stage downstream operates on."""
    d = (part.groupBy("p_name")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_records"),
              F.min("p_partkey").alias("name_key")))
    return d.select(
        "p_name", "n_records", "name_key",
        F.split("p_name", " ").getItem(0).alias("tok"),
        F.length("p_name").alias("ln"))


def _er_candidate_pairs(nd: DataFrame) -> DataFrame:
    """ER stages 2-3, block + score + threshold on the COLLAPSED
    relation: first-token equi-join with the admissible length band as
    residual, thresholded by the capped levenshtein kernel. Input is
    vocabulary-sized, so the self-join's quadratic worst case is
    |vocab|^2 / |blocks| — never a corpus-scale pairing (plan-pinned:
    the equi-join's inputs are aggregates, not scans)."""
    a, b = nd.alias("a"), nd.alias("b")
    return (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                   & (F.col("a.name_key") < F.col("b.name_key"))
                   & (F.abs(F.col("a.ln") - F.col("b.ln"))
                      <= ER_LEN_BAND)
                   & (F.levenshtein(F.col("a.p_name"), F.col("b.p_name"),
                                    ER_LEV_THRESHOLD) >= 0))
            .select(F.col("a.name_key").alias("doc_a"),
                    F.col("b.name_key").alias("doc_b")))


@register(
    "dedup_entity_resolution",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_records,
             MIN(p_partkey) AS name_key
      FROM part GROUP BY p_name
    ), nd AS (
      SELECT p_name, n_records, name_key,
             string_split(p_name, ' ')[1] AS tok,
             length(p_name) AS ln
      FROM d
    ), pairs AS (
      SELECT a.name_key AS ka, b.name_key AS kb
      FROM nd a JOIN nd b
        ON a.tok = b.tok
       AND a.name_key < b.name_key
       AND abs(a.ln - b.ln) <= {ER_LEN_BAND}
       AND levenshtein(a.p_name, b.p_name) <= {ER_LEV_THRESHOLD}
    ), edges AS (
      SELECT ka AS src, kb AS dst FROM pairs
      UNION ALL
      SELECT kb, ka FROM pairs
    ), reach(k, label) AS (
      SELECT name_key, name_key FROM nd
      UNION
      SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.k
    ), comp AS (
      SELECT k AS name_key, MIN(label) AS entity_id FROM reach GROUP BY k
    ), members AS (
      SELECT nd.p_name, nd.n_records, nd.name_key, comp.entity_id
      FROM nd JOIN comp USING (name_key)
    ), canon AS (
      SELECT entity_id, p_name AS canonical_name
      FROM (SELECT entity_id, p_name,
                   ROW_NUMBER() OVER (PARTITION BY entity_id
                                      ORDER BY n_records DESC,
                                               name_key) AS rn
            FROM members)
      WHERE rn = 1
    ), ent AS (
      SELECT m.entity_id, c.canonical_name,
             CAST(SUM(m.n_records) AS BIGINT) AS entity_records
      FROM members m JOIN canon c ON m.entity_id = c.entity_id
      GROUP BY m.entity_id, c.canonical_name
    )
    SELECT p.p_partkey, p.p_name, m.entity_id, e.canonical_name,
           e.entity_records
    FROM part p
    JOIN members m ON p.p_name = m.p_name
    JOIN ent e ON m.entity_id = e.entity_id
    """,
    tags=("dedup", "fuzzy", "blocking", "graph", "iterative", "e2e",
          "entity-resolution"), bench=True)
def dedup_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY RESOLUTION END-TO-END (r12 verdict #5) — the composition
    every catalog/dedup user actually runs: block -> score -> threshold
    -> connected components -> canonical survivor per entity, mapped
    back onto every source record. The delegated-surface pattern of
    DISSparkStreamingSubscribeExample.scala:46 taken to its real-world
    endpoint (SURVEY §2c).

    Stage order is the 100 TB design decision: EXACT COLLAPSE FIRST.
    The fuzzy stages run on the DISTINCT-name relation (one groupBy
    over the fact), so the quadratic machinery — candidate pairs, edit
    distance, CC iterations — sees |vocabulary| rows, not |corpus|
    rows. On this fixture the vocabulary is scale-invariant (64 names
    at every SF), which is the realistic shape: spellings grow far
    slower than records. The corpus itself is touched exactly twice,
    both linearly: the collapse aggregate and the final map-back, and
    the map-back join is BROADCAST (the entity table is
    vocabulary-sized), so no corpus shuffle happens anywhere in the
    pipeline (plan-pinned).

    Stages: (1) exact collapse: p_name -> (n_records, name_key =
    min(p_partkey)); (2) candidates: first-token block + length band
    {ER_LEN_BAND} on the distinct relation; (3) score/threshold:
    capped levenshtein(l, r, {ER_LEV_THRESHOLD}) — admissible band,
    same kernel as the blocked row; (4) entities: min-label connected
    components over the thresholded pair graph (the shared CC kernel,
    _min_label_components), singletons labeling themselves; (5)
    survivor: per entity the most-frequent spelling wins (canonical-
    form heuristic), ties to the smallest name_key — SemDeDup's
    keep-one-per-cluster discipline on record counts; (6) map-back:
    every record gets (entity_id, canonical_name, entity_records).
    Oracle: the same pipeline with the CC stage as a recursive CTE —
    the dedup_connected_components oracle idiom over the scored pair
    relation."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    nd = _er_distinct_names(part)
    pairs = _er_candidate_pairs(nd)
    labels = _min_label_components(pairs)
    members = (nd.join(labels, nd["name_key"] == labels["doc_id"],
                       "left_outer")
               .select("p_name", "n_records", "name_key",
                       F.coalesce(F.col("label"), F.col("name_key"))
                       .alias("entity_id")))
    from pyspark.sql import Window

    w = Window.partitionBy("entity_id").orderBy(
        F.desc("n_records"), "name_key")
    canon = (members.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1)
             .select("entity_id", F.col("p_name").alias("canonical_name")))
    ent = (members.groupBy("entity_id")
           .agg(F.sum("n_records").cast("bigint").alias("entity_records"))
           .join(canon, "entity_id"))
    entity_map = (members.select("p_name", "entity_id")
                  .join(ent, "entity_id")
                  .select("p_name", "entity_id", "canonical_name",
                          "entity_records"))
    return part.join(F.broadcast(entity_map), "p_name").select(
        "p_partkey", "p_name", "entity_id", "canonical_name",
        "entity_records")
