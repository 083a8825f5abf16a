"""Similarity search over embedding columns (SURVEY.md §2c).

- brute-force top-k cosine: the exactness baseline. Query set broadcast
  against the corpus; per-query top-k via window row_number (Spark plans a
  per-partition group-limit before the shuffle, so the corpus is never
  globally sorted).
- IVF (inverted-file) ANN: the scale path. Assign every vector to its
  nearest centroid (one broadcast join against C centroids), then search
  only the probed cluster(s). At 100 TB: centroids come from a sampled
  k-means (driver-sized), assignment is a single linear pass, and each
  query touches |corpus| / C * n_probe vectors.

Both are pure DataFrame plans — vector math is array lambdas
(functions/portable.dot), JVM-side, no Python in the hot path. A
pandas_udf variant of the dot product is provided for wide vectors (Arrow
batches beat per-element codegen beyond ~1k dims) in functions/vectorized.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import cosine, cosine_sql
from ..plans.registry import register
from ..scratch import scratch_dir
from ..tables import load

N_QUERIES = 10       # query set: vec_id < 10
TOP_K = 5
N_CENTROIDS = 8      # IVF: centroids = vec_id < 8 (deterministic stand-in
                     # for sampled k-means centroids)


def _l2sq_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
            f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), "
            f"(acc, x) -> acc + x)")


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)


_BF_ORACLE = f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {cosine_sql('q.embedding', 'c.embedding')} AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """


@register(
    "sim_bruteforce_topk",
    oracle=_BF_ORACLE,
    tags=("similarity", "ann", "topk"), bench=True)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 10).
    The query set is broadcast, so the corpus scan is a single map-side
    pass; per-query top-k folds through a window group-limit."""
    from ..functions.portable import dot, norm

    emb = load(spark, sf_dir, "embeddings")
    # Norms precomputed per SIDE, before the join: cosine(q, c) inline
    # re-folds norm(q) for every corpus row and norm(c) per query
    # (Catalyst cannot hoist a lambda fold across a join). Halves the
    # norm flops; measured ~15% end-to-end at sf0.1 (the top-k window
    # dominates). Same fold order, so the quotient is bit-identical to
    # the inline form the oracle computes.
    q = (emb.where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe"),
                 norm(F.col("embedding")).alias("qn")))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("ce"),
                   norm(F.col("embedding")).alias("cn"))
    cos = dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", cos.alias("cos"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id",
                    (F.round("cos", 4) + 0.0).alias("cos"), "rnk"))


@register(
    "sim_ivf_assign",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS ce
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ), dists AS (
      SELECT v.vec_id, c.centroid_id,
             {_l2sq_sql('v.embedding', 'c.ce')} AS d2
      FROM embeddings v CROSS JOIN cent c
    )
    SELECT vec_id, centroid_id
    FROM (
      SELECT vec_id, centroid_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2, centroid_id) AS rnk
      FROM dists
    )
    WHERE rnk = 1
    """,
    tags=("similarity", "ann", "ivf"))
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF build step: nearest-centroid assignment (L2). Centroids are
    broadcast; assignment is one linear pass over the corpus — the
    partitioning that makes ANN queries touch 1/C of the data."""
    emb = load(spark, sf_dir, "embeddings")
    cent = (emb.where(F.col("vec_id") < N_CENTROIDS)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("embedding").alias("ce")))
    # row-local argmin against the one-row broadcast centroid array —
    # same rewrite as _assign_nearest (the n x C window exchange is
    # pure overhead for a rnk == 1 slice); same _l2sq arithmetic,
    # array_min's struct order = the (d2, centroid_id) tie-break
    carr = F.broadcast(
        cent.agg(F.collect_list(F.struct("centroid_id", "ce"))
                 .alias("cents")))
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(_l2sq(F.col("embedding"), c["ce"]).alias("d2"),
                           c["centroid_id"].alias("centroid_id")))
    return (emb.crossJoin(carr)
            .select("vec_id",
                    F.array_min(scored)["centroid_id"]
                    .alias("centroid_id")))


# sim_ivf_topk (trained centroids, n_probe=1) is registered below, after
# the shared trained-IVF machinery it reuses with sim_ivf_nprobe_trained.


@register(
    "sim_bruteforce_topk_pandas",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {cosine_sql('q.embedding', 'c.embedding')} AS cos
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
    tags=("similarity", "ann", "topk", "pandas-udf"))
def sim_bruteforce_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-k as sim_bruteforce_topk but with the Arrow/numpy
    cosine kernel (functions/vectorized.py) — the wide-vector fast path.
    numpy's pairwise summation differs from the JVM fold only in last
    ulps; round(4) makes both match the oracle, pinning kernel parity."""
    from ..functions.vectorized import cosine_vectorized

    emb = load(spark, sf_dir, "embeddings")
    q = (emb.where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe")))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("ce"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id",
                    cosine_vectorized(F.col("qe"), F.col("ce")).alias("cos"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id",
                    (F.round("cos", 4) + 0.0).alias("cos"), "rnk"))


# ------------------------------------------------------- iterative k-means

DIM = 64
KMEANS_ITERS = 2
IVF_N_PROBE = 2


def _dim_avg_sql(i: int) -> str:
    """Per-dimension decimal-exact mean (order-independent, identical in
    both engines)."""
    return (f"CAST(SUM(CAST(CAST(embedding[{i}] AS DOUBLE) "
            f"AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*)")


def _ivf_nprobe_oracle(n_probe: int) -> str:
    """IVF with trained centroids + multi-probe, DuckDB side. Centroids =
    one decimal-exact Lloyd iteration from the deterministic seeds (the
    same recompute sim_kmeans_lloyd pins), so both engines search
    identical cluster geometry."""
    dims = ", ".join(f"{_dim_avg_sql(i + 1)} AS d{i}" for i in range(DIM))
    cent_array = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    d2 = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
          "list_transform(range(1, {dim} + 1), "
          "i -> (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]) "
          "* (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]))), "
          "(acc, x) -> acc + x)").format(dim=DIM)
    return f"""
    WITH cent0 AS (
      SELECT vec_id AS centroid_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assign0 AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2}, c.centroid_id) AS rnk
        FROM embeddings v CROSS JOIN cent0 c
      ) WHERE rnk = 1
    ),
    cent1 AS (
      SELECT cluster AS centroid_id, {cent_array} AS ce FROM (
        SELECT a.cluster, {dims}
        FROM assign0 a JOIN embeddings v ON a.vec_id = v.vec_id
        GROUP BY a.cluster
      )
    ),
    ranked AS (
      SELECT v.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {d2}, c.centroid_id) AS rnk
      FROM embeddings v CROSS JOIN cent1 c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cluster FROM ranked WHERE rnk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, centroid_id AS probe
      FROM ranked WHERE rnk <= {n_probe} AND vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {cosine_sql('q.embedding', 'v.embedding')} AS cos
      FROM probes p
        JOIN assign a ON a.cluster = p.probe AND a.vec_id != p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings v ON v.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """


def _rank_to_centroids(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, e, centroid_id, d2, rnk): every vector ranked against the
    (broadcast) centroid set by L2 distance, deterministic tie-break.
    Use only when ranks BEYOND the nearest are needed (multi-probe);
    nearest-only assignment goes through :func:`_assign_nearest`."""
    d2 = F.aggregate(
        F.zip_with(F.col("e"), F.col("ce"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    w = Window.partitionBy("vec_id").orderBy("d2", "centroid_id")
    return (emb.crossJoin(F.broadcast(cent))
            .select("vec_id", "e", "centroid_id", d2.alias("d2"))
            .withColumn("rnk", F.row_number().over(w)))


def _assign_nearest(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, e, centroid_id): nearest centroid per vector — the
    rnk == 1 slice of :func:`_rank_to_centroids`, computed ROW-LOCALLY.

    The window formulation materializes n x C rows (each dragging the
    full embedding array) through an Exchange and per-vector sort just
    to keep row 1; assignment is an argmin, so instead the C centroids
    collapse to ONE broadcast array row and each vector reduces it in
    place: transform -> (d2, centroid_id) structs -> array_min, whose
    struct ordering (d2 first, then centroid_id) IS the window's
    deterministic tie-break. Same d2 expression (zip_with/aggregate in
    array order), bit-identical result — A/B at sf0.1: the build row
    dropped ~40% and the n x C exchange vanished from the plan. At
    100 TB the saving is the whole point: the corpus-side shuffle of
    C-times-amplified vectors never happens. ``cent`` must be
    non-empty (seeded builds and live indexes always are)."""
    carr = F.broadcast(
        cent.agg(F.collect_list(F.struct("centroid_id", "ce"))
                 .alias("cents")))
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.aggregate(F.zip_with(F.col("e"), c["ce"],
                                   lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0), lambda acc, x: acc + x).alias("d2"),
            c["centroid_id"].alias("centroid_id")))
    return (emb.crossJoin(carr)
            .select("vec_id", "e",
                    F.array_min(scored)["centroid_id"]
                    .alias("centroid_id")))


def _ivf_ingest_batch(parsed: DataFrame, cent: DataFrame,
                      ingest_root: str, batch_id: int) -> None:
    """One streaming-ingest micro-batch folded into an IVF inverted file:
    assign each arriving vector to its nearest EXISTING centroid (no
    retrain) and land the batch in its own hive-style subdirectory
    ``inverted/src=b<batch_id>`` with ``mode('overwrite')``. The
    deterministic per-batch directory makes foreachBatch's at-least-once
    replay idempotent (r7 ADVICE, medium): a re-executed batch replaces
    its own directory byte-for-byte instead of appending duplicates that
    could occupy top-k ranks in the post-ingest search.

    The batch also folds its OWN per-cluster assignment counts into the
    C-row ``sizes`` sidecar (``sizes/src=b<batch_id>``, same overwrite
    discipline, so replay is idempotent here too) — this is what lets
    the drift gate (:func:`ivf_maybe_retrain`) price its probe at O(C)
    instead of rescanning the whole inverted index every micro-batch
    (r10 verdict #1). The counts are aggregated from the just-written
    batch directory (O(batch) read-back of a file this batch produced),
    never from ``inverted/`` as a whole — the maintenance analog of the
    connector's count-from-metadata discipline (DISRDD.scala:89-94)."""
    live = ivf_resolve_live(ingest_root)
    assigned = (_assign_nearest(parsed, cent)
                .select("vec_id", "e",
                        F.col("centroid_id").alias("cluster")))
    assigned.write.mode("overwrite").parquet(
        f"{live}/inverted/src=b{batch_id}")
    (parsed.sparkSession.read
     .parquet(f"{live}/inverted/src=b{batch_id}")
     .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
     .write.mode("overwrite")
     .parquet(f"{live}/sizes/src=b{batch_id}"))


# Drift gate for the streamed-ingest index: retrain when the biggest
# cluster outgrows the median by this factor (frozen centroids + drifting
# ingest = ever-fatter hot clusters and ever-worse probe selectivity).
IVF_RETRAIN_SKEW = 4.0

# Grace window before a superseded index generation is GC'd: a reader
# that resolved the manifest just before a flip may still be scanning
# the old generation's files; the window must exceed the longest single
# read (a search pass), not the longest query session — readers resolve
# ONCE PER OPERATION by contract.
IVF_GC_GRACE_SECONDS = 300.0


def _ivf_manifest_path(root: str) -> str:
    import os

    return os.path.join(root, "MANIFEST.json")


def ivf_manifest(root: str) -> dict | None:
    """The index root's manifest — ``{"live": <gen>, "flipped_ms": ...}``
    — or ``None`` for a legacy flat layout (centroids/inverted/sizes
    directly under ``root``, no generations). The manifest file is only
    ever produced by tmp + ``os.replace`` (:func:`_ivf_flip_manifest`),
    so a cross-process reader sees the old pointer or the new one, never
    a torn file."""
    import json

    try:
        with open(_ivf_manifest_path(root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def ivf_resolve_live(root: str) -> str:
    """THE reader entry point for a stored IVF index (r12 verdict #3):
    resolve the manifest ONCE, then read only that generation's
    ``centroids``/``inverted``/``sizes`` dirs. Resolving once per
    operation is what makes multi-writer deployments safe — a retrain
    job publishes a COMPLETE new generation under ``gen=<n>/`` and then
    atomically flips the pointer, so every reader observes either the
    old index or the new one in full, never a mix of the two (the
    pre-manifest swap was atomic per-dir but not across the three dirs,
    safe only because every reader shared one serialized foreachBatch
    chain). Legacy flat layouts resolve to ``root`` itself."""
    import os

    m = ivf_manifest(root)
    return root if m is None else os.path.join(root, f"gen={m['live']}")


def _ivf_flip_manifest(root: str, gen: int) -> None:
    """Atomic pointer flip — the COMMIT POINT of an index generation
    (same tmp + os.replace idiom as the dis log's metadata writes, and
    for the same reason: the manifest is read cross-process)."""
    import json
    import os
    import time
    import uuid

    path = _ivf_manifest_path(root)
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"live": gen, "flipped_ms": int(time.time() * 1000)}, f)
    os.replace(tmp, path)


def ivf_gc_generations(root: str,
                       grace_seconds: float = IVF_GC_GRACE_SECONDS) -> int:
    """Remove superseded index generations (and pre-manifest legacy flat
    dirs, and orphaned ``.gen-stage-*`` build dirs) once the LIVE
    generation has been live for at least ``grace_seconds`` — by then no
    reader that resolved before the flip can still be mid-read (readers
    resolve once per operation). Never touches the live generation; a
    stage dir is additionally removed only when its own mtime is older
    than the grace window, so a CONCURRENT retrainer's live staging is
    never yanked mid-build. Returns directories removed."""
    import os
    import shutil
    import time

    m = ivf_manifest(root)
    if m is None:
        return 0
    if time.time() - m["flipped_ms"] / 1000.0 < grace_seconds:
        return 0
    live = f"gen={m['live']}"
    removed = 0
    for name in os.listdir(root):
        path = os.path.join(root, name)
        if not os.path.isdir(path) or name == live:
            continue
        if name.startswith(".gen-stage-"):
            # an orphan stage is only dead if it has sat UNMODIFIED for
            # the grace window — a concurrent retrainer's live staging
            # dir is written continuously and must never be yanked
            try:
                if time.time() - os.path.getmtime(path) < grace_seconds:
                    continue
            except OSError:
                continue
            shutil.rmtree(path, ignore_errors=True)
            removed += 1
        elif name.startswith("gen=") or name in ("centroids", "inverted",
                                                 "sizes"):
            shutil.rmtree(path, ignore_errors=True)
            removed += 1
    return removed


def ivf_cluster_sizes(spark: SparkSession, root: str) -> DataFrame:
    """Current per-cluster sizes of the index at ``root``, read from the
    C-row ``sizes`` sidecar — O(C x batches) input, NEVER a scan of the
    inverted index. Each writer (base build, per-batch ingest, retrain
    swap) lands its own partial counts under ``sizes/src=...``; summing
    the partials is exact because every vec_id lives in exactly one
    ``src`` directory (overwrite discipline keeps replay idempotent).

    Restart / legacy recovery: if the sidecar is absent (an index built
    before the sidecar existed, or a crash between the inverted write
    and the sizes write), it is rebuilt ONCE from the inverted index —
    the only full-index scan this module's maintenance path can ever
    take, paid only on recovery, never per batch."""
    import os

    live = ivf_resolve_live(root)
    if not os.path.isdir(f"{live}/sizes"):
        (spark.read.parquet(f"{live}/inverted")
         .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(f"{live}/sizes/src=recovered"))
    return (spark.read.parquet(f"{live}/sizes")
            .groupBy("cluster").agg(F.sum("n").alias("n")))


def ivf_maybe_retrain(spark: SparkSession, root: str,
                      skew_threshold: float = IVF_RETRAIN_SKEW) -> bool:
    """IVF DRIFT REPAIR for the streaming-ingest index (r8 verdict #7):
    ingest assigns against FROZEN centroids forever, so drifting data
    piles into a few hot clusters and probe selectivity decays. This is
    the foreachBatch-side maintenance job: when max/median cluster size
    exceeds ``skew_threshold``, recompute every centroid as the
    decimal-exact mean of its CURRENT members and reassign the whole
    corpus — one Lloyd step from the current assignment, the standard
    online-IVF repair — then swap the consolidated index in (per-batch
    ingest subdirs collapse into one base dir, so later ingest batches
    assign against the RETRAINED geometry). Returns True iff retrained.

    Search-consistency contract (pytest-pinned, test_ivf_retrain):
    searching the retrained index equals searching an index REBUILT
    from the same corpus with the same means+reassign step — the
    retrain is a pure re-clustering, never a data change.

    Scale shape (r10 verdict #1): the skew probe reads the C-row
    ``sizes`` sidecar (:func:`ivf_cluster_sizes`) — each ingest batch
    already folded its own O(batch) per-cluster counts in, so the
    per-micro-batch maintenance cost is a C-row aggregate over C-row
    inputs, NOT a scan of the (at 100 TB, ~1e11-row) inverted index.
    Retrain itself is the build's cost — one grouped mean + one
    broadcast reassignment pass over the corpus — paid only when the
    gate trips, amortized across every batch since the last repair; the
    swap also rewrites the sidecar from the reassigned index so the
    next probe stays O(C).

    Commit protocol (r12 verdict #3 — multi-writer safe): the repair
    writes a COMPLETE new index generation under a hidden staging dir,
    renames it to ``gen=<n>/`` (complete-or-invisible), then atomically
    flips ``MANIFEST.json`` — the one commit point. Readers resolve the
    manifest once per operation (:func:`ivf_resolve_live`), so a retrain
    running as a SEPARATE job from serving (the 100 TB deployment shape)
    can never expose a torn or mixed-generation index; superseded
    generations are GC'd after a grace window
    (:func:`ivf_gc_generations`). Two racing retrainers both publish
    complete generations (the dir rename arbitrates numbering; the last
    manifest flip wins) — the table-format snapshot-commit idiom, not
    the single-chain rmtree+replace this replaced."""
    import os
    import statistics
    import uuid

    live = ivf_resolve_live(root)
    sizes = [r["n"] for r in ivf_cluster_sizes(spark, root).collect()]
    if not sizes or max(sizes) <= skew_threshold * statistics.median(sizes):
        return False
    inverted = spark.read.parquet(f"{live}/inverted")
    dim_avgs = [
        (F.sum(F.element_at("e", i + 1).cast("decimal(27,8)"))
         .cast("double") / F.count(F.lit(1))).alias(f"d{i}")
        for i in range(DIM)]
    cent = (inverted.groupBy(F.col("cluster").alias("centroid_id"))
            .agg(*dim_avgs)
            .select("centroid_id",
                    F.array(*[F.col(f"d{i}") for i in range(DIM)])
                    .alias("ce")))
    re_inverted = (_assign_nearest(inverted.select("vec_id", "e"), cent)
                   .select("vec_id", "e",
                           F.col("centroid_id").alias("cluster")))
    # Publish a complete new generation, then flip the pointer. The
    # staging dir's leading dot keeps a half-built generation invisible
    # to both readers (they only follow the manifest) and GC's gen=
    # listing until the rename makes it complete-or-not-at-all.
    m = ivf_manifest(root)
    stage = f"{root}/.gen-stage-{uuid.uuid4().hex[:8]}"
    cent.write.mode("overwrite").parquet(f"{stage}/centroids")
    re_inverted.write.mode("overwrite").parquet(
        f"{stage}/inverted/src=base")
    # the sidecar must describe the REASSIGNED index: fold the staged
    # inverted file's counts (read-back of data this call just wrote)
    (spark.read.parquet(f"{stage}/inverted/src=base")
     .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
     .write.mode("overwrite").parquet(f"{stage}/sizes/src=base"))
    # dir rename arbitrates the generation number: a crashed retrain's
    # already-renamed-but-never-flipped generation, or a concurrent
    # retrainer, just pushes this one to the next free slot
    gen = (m["live"] if m else 0) + 1
    while True:
        try:
            os.rename(stage, f"{root}/gen={gen}")
            break
        except OSError:
            if not os.path.exists(f"{root}/gen={gen}"):
                raise
            gen += 1
    _ivf_flip_manifest(root, gen)          # commit point
    ivf_gc_generations(root)
    return True


def _ivf_build_relations(spark: SparkSession, sf_dir: str,
                         corpus: DataFrame | None = None
                         ) -> tuple[DataFrame, DataFrame]:
    """IVF BUILD: one decimal-exact Lloyd iteration from deterministic
    seeds -> (trained centroids, inverted file). The inverted file is the
    full corpus tagged with its cluster (vec_id, e, cluster) — the
    index relation a production system materializes once and amortizes.
    ``corpus`` overrides the trained/indexed vector set (must contain the
    seed ids) — the streaming-ingest gate trains on its base split."""
    emb = corpus if corpus is not None else load(
        spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("e"))
    cent0 = (emb.where(F.col("vec_id") < N_CENTROIDS)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("e").alias("ce")))
    assign0 = _assign_nearest(emb, cent0)
    dim_avgs = [
        (F.sum(F.element_at("e", i + 1).cast("decimal(27,8)"))
         .cast("double") / F.count(F.lit(1))).alias(f"d{i}")
        for i in range(DIM)]
    cent1 = (assign0.groupBy(F.col("centroid_id"))
             .agg(*dim_avgs)
             .select("centroid_id",
                     F.array(*[F.col(f"d{i}") for i in range(DIM)])
                     .alias("ce")))
    inverted = (_assign_nearest(emb, cent1)
                .select("vec_id", "e",
                        F.col("centroid_id").alias("cluster")))
    return cent1, inverted


_IVF_INDEX_CACHE: dict[str, str] = {}


def _ivf_index_root(spark: SparkSession, sf_dir: str) -> str:
    """Materialized IVF index (built once per sf_dir per process): the
    trained centroids and the inverted file written as parquet — a real
    stored index, not a cached plan (bench.py clearCache() between
    iterations would silently rebuild a persist()-based cache, hiding the
    build cost inside the search row it exists to isolate). Deterministic
    content (decimal-exact Lloyd from fixed seeds + exact double
    round-trip through parquet), so search results are oracle-stable."""

    if sf_dir not in _IVF_INDEX_CACHE:
        root = scratch_dir("ivf_index_")
        cent, inverted = _ivf_build_relations(spark, sf_dir)
        cent.write.mode("overwrite").parquet(f"{root}/centroids")
        inverted.write.mode("overwrite").parquet(f"{root}/inverted")
        _IVF_INDEX_CACHE[sf_dir] = root
    return _IVF_INDEX_CACHE[sf_dir]


def _ivf_search_prebuilt(spark: SparkSession, sf_dir: str,
                         n_probe: int, root: str | None = None) -> DataFrame:
    """IVF SEARCH over the prebuilt index — the amortized production
    path: scan the stored inverted file, rank each query vector against
    the (tiny, broadcast) stored centroids at query time to pick its
    n_probe clusters, then score only those clusters' members. Each
    query touches ~|corpus| / C * n_probe vectors; the corpus-side scan
    carries no Lloyd work at all (pinned by test_plan_shapes).
    ``root`` overrides the index location (streaming-ingest gate).
    The live generation is resolved ONCE here — both relations below
    come from the same generation by construction."""
    live = ivf_resolve_live(root or _ivf_index_root(spark, sf_dir))
    inverted = spark.read.parquet(f"{live}/inverted")
    cent = spark.read.parquet(f"{live}/centroids")
    queries = (inverted.where(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("e").alias("qe")))
    return _ivf_search_for_queries(inverted, cent, queries, n_probe)


def _ivf_search_for_queries(inverted: DataFrame, cent: DataFrame,
                            queries: DataFrame, n_probe: int) -> DataFrame:
    """IVF search core for an explicit query relation (query_id, qe) —
    shared by the batch prebuilt-index search and the streaming
    query-serving gate, which feeds each micro-batch of arriving queries
    through this exact plan. Per-query results are independent, so a
    query set split across micro-batches composes to the batch answer."""
    # query -> probe clusters: rank against C stored centroids (query-time
    # work proportional to |queries| * C, independent of corpus size)
    qd2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    wq = Window.partitionBy("query_id").orderBy("d2", "centroid_id")
    probes = (queries.crossJoin(F.broadcast(cent))
              .select("query_id", "qe", "centroid_id", qd2.alias("d2"))
              .withColumn("prnk", F.row_number().over(wq))
              .where(F.col("prnk") <= n_probe)
              .select("query_id", "qe",
                      F.col("centroid_id").alias("probe")))
    cos = cosine(F.col("qe"), F.col("e"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (inverted.join(F.broadcast(probes),
                          (F.col("cluster") == F.col("probe"))
                          & (F.col("vec_id") != F.col("query_id")))
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    cos.alias("cos"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("query_id", "neighbor_id",
                    (F.round("cos", 4) + 0.0).alias("cos"), "rnk"))


def _ivf_build_oracle() -> str:
    """DuckDB twin of the build: same Lloyd step, final assignment."""
    dims = ", ".join(f"{_dim_avg_sql(i + 1)} AS d{i}" for i in range(DIM))
    cent_array = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    d2 = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
          "list_transform(range(1, {dim} + 1), "
          "i -> (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]) "
          "* (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]))), "
          "(acc, x) -> acc + x)").format(dim=DIM)
    return f"""
    WITH cent0 AS (
      SELECT vec_id AS centroid_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assign0 AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2}, c.centroid_id) AS rnk
        FROM embeddings v CROSS JOIN cent0 c
      ) WHERE rnk = 1
    ),
    cent1 AS (
      SELECT cluster AS centroid_id, {cent_array} AS ce FROM (
        SELECT a.cluster, {dims}
        FROM assign0 a JOIN embeddings v ON a.vec_id = v.vec_id
        GROUP BY a.cluster
      )
    )
    SELECT vec_id, centroid_id AS cluster FROM (
      SELECT v.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {d2}, c.centroid_id) AS rnk
      FROM embeddings v CROSS JOIN cent1 c
    ) WHERE rnk = 1
    """


@register(
    "sim_ivf_build",
    oracle=_ivf_build_oracle(),
    tags=("similarity", "ann", "ivf", "build"), bench=True)
def sim_ivf_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index BUILD as its own measured operator (split from search so
    the bench separates one-time build cost from per-query search cost —
    in production the index is built once and amortized over every
    query): one decimal-exact Lloyd iteration from deterministic seeds,
    then the final nearest-centroid assignment. Build is 2 broadcast-join
    corpus passes + 1 tiny hash agg; centroids stay k*dim-sized at any
    corpus scale. Runs the build FRESH on every call (no index cache) so
    its bench row times the build honestly."""
    _, inverted = _ivf_build_relations(spark, sf_dir)
    return inverted.select("vec_id", "cluster")


@register(
    "sim_ivf_topk",
    oracle=_ivf_nprobe_oracle(n_probe=1),
    tags=("similarity", "ann", "ivf", "topk"), bench=True)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN SEARCH over the PREBUILT index (build split into
    sim_ivf_build): each query ranks the stored centroids to pick its
    cluster (n_probe=1), then scores only that cluster's members from
    the stored inverted file. Recall vs sim_bruteforce_topk is the
    standard IVF tradeoff; the search join is co-partitioned on cluster
    id, each query touches ~|corpus|/C vectors, and the bench row now
    measures search alone — the amortized production shape."""
    return _ivf_search_prebuilt(spark, sf_dir, n_probe=1)


@register(
    "sim_ivf_nprobe_trained",
    oracle=_ivf_nprobe_oracle(n_probe=IVF_N_PROBE),
    tags=("similarity", "ann", "ivf", "multiprobe"))
def sim_ivf_nprobe_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prebuilt-index IVF with multi-probe (n_probe=2), the standard
    recall lever over sim_ivf_topk: each query scores its 2 nearest
    clusters, touching ~2/C of the corpus. Same stored index, same
    oracle geometry (the trained-centroid Lloyd step)."""
    return _ivf_search_prebuilt(spark, sf_dir, n_probe=IVF_N_PROBE)


@register(
    "sim_ivf_recall",
    oracle=f"""
    WITH bf3 AS (
      SELECT query_id, neighbor_id
      FROM ({_BF_ORACLE}) WHERE rnk <= 3
    ),
    i1 AS (SELECT query_id, neighbor_id
           FROM ({_ivf_nprobe_oracle(n_probe=1)})),
    i2 AS (SELECT query_id, neighbor_id
           FROM ({_ivf_nprobe_oracle(n_probe=IVF_N_PROBE)}))
    SELECT b.query_id,
           CAST(COUNT(*) FILTER (WHERE i1.neighbor_id IS NOT NULL)
                AS BIGINT) AS hits_p1,
           CAST(COUNT(*) FILTER (WHERE i2.neighbor_id IS NOT NULL)
                AS BIGINT) AS hits_p2,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM bf3 b
      LEFT JOIN i1 ON b.query_id = i1.query_id
                  AND b.neighbor_id = i1.neighbor_id
      LEFT JOIN i2 ON b.query_id = i2.query_id
                  AND b.neighbor_id = i2.neighbor_id
    GROUP BY 1
    """,
    tags=("similarity", "ann", "ivf", "recall"))
def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN ACCURACY CONTRACT: per-query recall@3 of the IVF search
    against exact brute force, as exact integers under the oracle gate —
    search *quality*, not just determinism, becomes part of the
    correctness surface (the approx_aggregates pattern: pin a
    deterministic quantity exactly rather than epsilon-compare).

    hits_p1 = |IVF(n_probe=1) top-3 ∩ exact top-3| per query;
    hits_p2 = the n_probe=2 multi-probe variant (the recall lever —
    hits_p2 >= hits_p1 by construction since probe sets nest). Both
    searches run over the prebuilt materialized index; the ground truth
    is the broadcast brute-force pass. At 100 TB the same relation is
    the monitoring query you run on a sampled query set to size
    n_probe."""
    bf3 = (sim_bruteforce_topk(spark, sf_dir)
           .where(F.col("rnk") <= 3).select("query_id", "neighbor_id"))
    i1 = (sim_ivf_topk(spark, sf_dir)
          .select("query_id", "neighbor_id", F.lit(1).alias("h1")))
    i2 = (sim_ivf_nprobe_trained(spark, sf_dir)
          .select("query_id", "neighbor_id", F.lit(1).alias("h2")))
    return (bf3.join(i1, ["query_id", "neighbor_id"], "left")
            .join(i2, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.sum(F.coalesce(F.col("h1"), F.lit(0)))
                  .cast("bigint").alias("hits_p1"),
                 F.sum(F.coalesce(F.col("h2"), F.lit(0)))
                  .cast("bigint").alias("hits_p2"),
                 F.count(F.lit(1)).alias("k")))


PQ_M = 4                    # subspaces
PQ_SUB = DIM // PQ_M        # dims per subspace (16)
PQ_K = 4                    # codes per subspace (2-bit codes here)


def _pq_sub_d2_sql(m: int) -> str:
    """Subspace-m squared L2 between corpus row v and codebook row c —
    sequential fold over the subspace's dims, mirroring the Spark
    zip_with fold order exactly (bit-identical doubles)."""
    lo, hi = PQ_SUB * m + 1, PQ_SUB * (m + 1)
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range({lo}, {hi} + 1), "
            f"i -> (CAST(v.embedding[i] AS DOUBLE) "
            f"- CAST(c.embedding[i] AS DOUBLE)) "
            f"* (CAST(v.embedding[i] AS DOUBLE) "
            f"- CAST(c.embedding[i] AS DOUBLE)))), "
            f"(acc, x) -> acc + x)")


def _pq_sub_d2(m: int, a, b):
    """Subspace-m squared L2 between two embedding columns — the Spark
    twin of :func:`_pq_sub_d2_sql` (same zip_with fold order over the
    same slice, so the doubles are bit-identical cross-engine)."""
    return F.aggregate(
        F.zip_with(F.slice(a, PQ_SUB * m + 1, PQ_SUB),
                   F.slice(b, PQ_SUB * m + 1, PQ_SUB),
                   lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, x: acc + x)


def _pq_code_cols() -> list:
    """PQ code expressions ``c0..c{M-1}``: row-local per-subspace argmin
    of a row's ``embedding`` against the broadcast codebook array column
    ``cbs`` (one row: array<struct<code, ce>>). array_min's struct
    ordering (d first, then code) is the deterministic tie-break."""
    def code_col(m: int):
        return F.array_min(F.transform(
            F.col("cbs"),
            lambda c: F.struct(
                _pq_sub_d2(m, F.col("embedding"), c["ce"]).alias("d"),
                c["code"].alias("code"))))["code"].alias(f"c{m}")

    return [code_col(m) for m in range(PQ_M)]


def _pq_query_lut(queries: DataFrame, cb: DataFrame) -> DataFrame:
    """Per-query ADC lookup table as ONE broadcastable row per query:
    (query_id, lut) with lut = map code -> struct(d0..d{M-1}) over the
    (query, codebook) cross product. A consumer joins this ONCE on
    query_id and reads each subspace's distance with a row-local map
    lookup — replacing M separate broadcast joins (one per subspace,
    each re-probing the candidate relation) with a single broadcast
    join. Distances are the same _pq_sub_d2 folds the per-subspace
    relations carried, just reshaped, so ADC sums are bit-identical."""
    lut = queries.crossJoin(F.broadcast(cb)).select(
        "query_id", "code",
        *[_pq_sub_d2(m, F.col("qe"), F.col("ce")).alias(f"d{m}")
          for m in range(PQ_M)])
    entry = F.struct(
        F.col("code"),
        F.struct(*[F.col(f"d{m}") for m in range(PQ_M)]).alias("d"))
    return (lut.groupBy("query_id")
            .agg(F.map_from_entries(F.collect_list(entry)).alias("lut")))


def _pq_adc_sum():
    """ADC distance as the left-to-right chain d0 + d1 + ... + d{M-1},
    each term a map lookup lut[c_m].d_m — the same add order as the
    former 4-join formulation and the oracle's ``l0.d + l1.d + ...``."""
    s = None
    for m in range(PQ_M):
        t = F.element_at(F.col("lut"), F.col(f"c{m}"))[f"d{m}"]
        s = t if s is None else s + t
    return s


def _pq_oracle() -> str:
    subs = []
    for m in range(PQ_M):
        subs.append(f"""
    code{m} AS (
      SELECT vec_id, code AS c{m} FROM (
        SELECT v.vec_id, c.vec_id AS code,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {_pq_sub_d2_sql(m)}, c.vec_id)
                 AS rnk
        FROM embeddings v CROSS JOIN cb c
      ) WHERE rnk = 1
    )""")
    joins = " ".join(f"JOIN code{m} USING (vec_id)" for m in range(1, PQ_M))
    cols = ", ".join(f"c{m}" for m in range(PQ_M))
    return f"""
    WITH cb AS (SELECT * FROM embeddings WHERE vec_id < {PQ_K}),
    {", ".join(s.strip() for s in subs)}
    SELECT vec_id, {cols}
    FROM code0 {joins}
    """


@register(
    "sim_pq_encode",
    oracle=_pq_oracle(),
    tags=("similarity", "ann", "pq", "compression"))
def sim_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION encode — the memory lever of vector search
    at scale: each {DIM}-dim vector becomes {PQ_M} small codes (argmin
    codebook entry per {PQ_SUB}-dim subspace), shrinking 64 floats to 4
    code bytes; search then scores candidates against per-subspace
    lookup tables instead of raw vectors. Codebooks here are the
    deterministic seed rows (vec_id < {PQ_K}) — codebook TRAINING is the
    same Lloyd machinery sim_ivf_build/sim_kmeans_lloyd already pin, so
    this operator's contract is the ENCODE kernel: per-subspace argmin
    with a deterministic tie-break, every distance a bit-identical
    sequential fold in both engines.

    Scale shape: the codebook is K x M x sub-dim tiny and broadcast;
    encoding is one linear pass over the corpus — ZERO shuffles: at
    100 TB the PQ-coded corpus is what fits in memory for the IVF-PQ
    search tier, and encode is a pure map over the scan."""
    emb = load(spark, sf_dir, "embeddings")
    cb = (emb.where(F.col("vec_id") < PQ_K)
          .select(F.col("vec_id").alias("code"),
                  F.col("embedding").alias("ce")))
    # All M argmins are ROW-LOCAL (the _assign_nearest discipline): the
    # K-row codebook collapses into ONE broadcast array row and each
    # vector reduces it in place — transform -> (d, code) structs ->
    # array_min, whose struct ordering (d first, then code) IS min_by's
    # deterministic tie-break over the same fold values. The former
    # crossJoin + groupBy(vec_id) evaluated the same subspace folds,
    # then paid a corpus-wide hash exchange just to reunite M argmins
    # that never needed to leave the row.
    cbarr = F.broadcast(
        cb.agg(F.collect_list(F.struct("code", "ce")).alias("cbs")))
    return emb.crossJoin(cbarr).select("vec_id", *_pq_code_cols())


def _pq_adc_oracle() -> str:
    luts = []
    for m in range(PQ_M):
        luts.append(f"""
    lut{m} AS (
      SELECT v.vec_id AS query_id, c.vec_id AS code,
             {_pq_sub_d2_sql(m)} AS d
      FROM embeddings v CROSS JOIN cb c
      WHERE v.vec_id < {N_QUERIES}
    )""")
    d_sum = " + ".join(f"l{m}.d" for m in range(PQ_M))
    lut_joins = " ".join(
        f"JOIN lut{m} l{m} ON l{m}.query_id = q.query_id "
        f"AND l{m}.code = pc.c{m}"
        for m in range(PQ_M))
    return f"""
    WITH cb AS (SELECT * FROM embeddings WHERE vec_id < {PQ_K}),
    {", ".join(s.strip() for s in luts)},
    codes AS ({_pq_oracle()}),
    q AS (SELECT DISTINCT query_id FROM lut0),
    scored AS (
      SELECT q.query_id, pc.vec_id AS neighbor_id,
             round({d_sum}, 6) + 0.0 AS adc_d2
      FROM q JOIN codes pc ON pc.vec_id != q.query_id
      {lut_joins}
    )
    SELECT query_id, neighbor_id, adc_d2, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """


@register(
    "sim_pq_adc_topk",
    oracle=_pq_adc_oracle(),
    tags=("similarity", "ann", "pq", "adc"))
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC DISTANCE COMPUTATION over PQ codes — the search half
    of IVF-PQ (the FAISS-standard ANN tier): each query precomputes an
    M x K lookup table of subspace distances to the codebook, and a
    candidate's approximate distance is just M table lookups summed —
    no raw-vector math against the corpus at query time. Top-3 by ADC
    distance per query, deterministic tie-break.

    Scale shape: the LUT relation is |queries| x M x K (tiny), folded to
    ONE map row per query and broadcast in a SINGLE join — M row-local
    map lookups per candidate instead of M broadcast-hash re-probes of
    the candidate relation; the corpus side is the 4-byte PQ codes, not
    the 64-float vectors. At 100 TB this is the layout where the whole
    corpus's search structure fits in executor memory. ADC distances
    are rounded(6) in both engines: the M-way sum is written as one
    left-to-right add chain, but the ulp margin on near-tied candidates
    is what the rounding absorbs."""
    emb = load(spark, sf_dir, "embeddings")
    cb = (emb.where(F.col("vec_id") < PQ_K)
          .select(F.col("vec_id").alias("code"),
                  F.col("embedding").alias("ce")))
    queries = (emb.where(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe")))
    codes = sim_pq_encode(spark, sf_dir)
    scored = (codes.crossJoin(F.broadcast(
                queries.select("query_id")))
              .where(F.col("vec_id") != F.col("query_id"))
              .join(F.broadcast(_pq_query_lut(queries, cb)), "query_id"))
    adc = (F.round(_pq_adc_sum(), 6) + 0.0).alias("adc_d2")
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (scored.select("query_id",
                          F.col("vec_id").alias("neighbor_id"), adc)
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("query_id", "neighbor_id", "adc_d2", "rnk"))


def _kmeans_oracle() -> str:
    dims = ", ".join(f"{_dim_avg_sql(i + 1)} AS d{i}" for i in range(DIM))
    cent_array = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    assign = """
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, {dim} + 1),
                     i -> (CAST(v.embedding[i] AS DOUBLE) - c.ce[i])
                        * (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]))),
                   (acc, x) -> acc + x),
                 c.centroid_id) AS rnk
        FROM embeddings v CROSS JOIN {cent} c
      ) WHERE rnk = 1
    """
    sql = f"""
    WITH cent0 AS (
      SELECT vec_id AS centroid_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assign1 AS ({assign.format(dim=DIM, cent='cent0')}),
    cent1 AS (
      SELECT cluster AS centroid_id, {cent_array} AS ce FROM (
        SELECT a.cluster, {dims}
        FROM assign1 a JOIN embeddings v ON a.vec_id = v.vec_id
        GROUP BY a.cluster
      )
    ),
    assign2 AS ({assign.format(dim=DIM, cent='cent1')})
    SELECT vec_id, cluster FROM assign2
    """
    return sql


@register("sim_kmeans_lloyd", oracle=_kmeans_oracle(),
          tags=("similarity", "kmeans", "iterative"))
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd k-means (k=8, 2 iterations), fully oracle-checked —
    the 'iterative algorithm on DataFrames' pattern. Each iteration is
    assign (argmin L2 to broadcast centroids) + recompute (per-dimension
    DECIMAL-exact means, so both engines derive bit-identical centroids
    and the next assignment cannot diverge). Centroid recompute is one
    hash agg with 64 decimal sums; centroids stay driver-sized, so every
    iteration is a broadcast join — the same loop shape scales to any
    corpus size with k*dim bounded.
    Seeds = vec_id < 8 (deterministic stand-in for k-means|| sampling)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("e"))

    def assign(cent: DataFrame) -> DataFrame:
        # row-local argmin against the broadcast centroid array (the
        # _assign_nearest kernel, same d2 fold and (d2, centroid_id)
        # tie-break as the former rank-1 window) — each Lloyd pass loses
        # its n x C Exchange + per-vector sort
        return (_assign_nearest(emb, cent)
                .withColumnRenamed("centroid_id", "cluster"))

    cent = (emb.where(F.col("vec_id") < N_CENTROIDS)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("e").alias("ce")))
    assigned = None
    for _ in range(KMEANS_ITERS):
        assigned = assign(cent)
        dim_avgs = [
            (F.sum(F.element_at("e", i + 1).cast("decimal(27,8)"))
             .cast("double") / F.count(F.lit(1))).alias(f"d{i}")
            for i in range(DIM)]
        cent = (assigned.groupBy(F.col("cluster").alias("centroid_id"))
                .agg(*dim_avgs)
                .select("centroid_id",
                        F.array(*[F.col(f"d{i}") for i in range(DIM)])
                        .alias("ce")))
    return assigned.select("vec_id", "cluster")


OUTLIER_BOTTOM_K = 3


def _lang_centroid_oracle() -> str:
    dims = ", ".join(
        f"CAST(SUM(CAST(CAST(e.embedding[{i + 1}] AS DOUBLE) "
        f"AS DECIMAL(27,8))) AS DOUBLE) / COUNT(*) AS d{i}"
        for i in range(DIM))
    cent_array = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    return f"""
    WITH joined AS (
      SELECT d.doc_id, d.lang, e.embedding
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    cent AS (
      SELECT lang, {cent_array} AS ce FROM (
        SELECT d.lang, {dims}
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        GROUP BY d.lang
      )
    )
    SELECT doc_id, lang, cos, rnk FROM (
      SELECT j.doc_id, j.lang,
             round({cosine_sql('j.embedding', 'c.ce')}, 4) + 0.0 AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY j.lang
               ORDER BY round({cosine_sql('j.embedding', 'c.ce')}, 4),
                        j.doc_id) AS rnk
      FROM joined j JOIN cent c ON j.lang = c.lang
    ) WHERE rnk <= {OUTLIER_BOTTOM_K}
    """


@register(
    "embedding_lang_outliers",
    oracle=_lang_centroid_oracle(),
    tags=("similarity", "embedding", "outlier", "composition"))
def embedding_lang_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING OUTLIER DETECTION, composed across tables: join each
    document's embedding (doc_id = vec_id), compute the per-language
    centroid decimal-exact (so both engines derive identical geometry),
    then surface the {OUTLIER_BOTTOM_K} docs per language LEAST similar
    to their own language's centroid — mislabeled-language and
    off-distribution candidates, the embedding-space quality audit that
    complements the token-level rules in text_quality_verdict.

    Scale shape: centroids are one hash agg producing a |langs| x dim
    relation that broadcasts back; the outlier rank is a per-language
    window group-limit. Ranking keys on the ROUNDED cosine so a last-ulp
    fold divergence cannot reorder near-ties; remaining ties break on
    doc_id."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("e"))
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id", "lang", "e")
    dim_avgs = [
        (F.sum(F.element_at("e", i + 1).cast("decimal(27,8)"))
         .cast("double") / F.count(F.lit(1))).alias(f"d{i}")
        for i in range(DIM)]
    cent = (joined.groupBy("lang").agg(*dim_avgs)
            .select("lang", F.array(*[F.col(f"d{i}") for i in range(DIM)])
                    .alias("ce")))
    cos = (F.round(cosine(F.col("e"), F.col("ce")), 4) + 0.0).alias("cos")
    scored = joined.join(F.broadcast(cent), "lang").select(
        "doc_id", "lang", cos)
    w = Window.partitionBy("lang").orderBy(F.col("cos").asc(),
                                           F.col("doc_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= OUTLIER_BOTTOM_K)
            .select("doc_id", "lang", "cos", "rnk"))


# ----------------------------------------------------------- IVF-PQ

IVFPQ_N_PROBE = 2


def _ivfpq_oracle() -> str:
    """IVF cell restriction (seed coarse quantizer) x PQ-ADC scoring."""
    luts = []
    for m in range(PQ_M):
        luts.append(f"""
    lut{m} AS (
      SELECT v.vec_id AS query_id, c.vec_id AS code,
             {_pq_sub_d2_sql(m)} AS d
      FROM embeddings v CROSS JOIN cb c
      WHERE v.vec_id < {N_QUERIES}
    )""")
    d_sum = " + ".join(f"l{m}.d" for m in range(PQ_M))
    lut_joins = " ".join(
        f"JOIN lut{m} l{m} ON l{m}.query_id = p.query_id "
        f"AND l{m}.code = pc.c{m}"
        for m in range(PQ_M))
    return f"""
    WITH cb AS (SELECT * FROM embeddings WHERE vec_id < {PQ_K}),
    {", ".join(s.strip() for s in luts)},
    codes AS ({_pq_oracle()}),
    cent AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings WHERE vec_id < {N_CENTROIDS}
    ),
    assign AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {_l2sq_sql('v.embedding', 'c.ce')}, c.cid) AS rnk
        FROM embeddings v CROSS JOIN cent c
      ) WHERE rnk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cid AS probe FROM (
        SELECT v.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                 ORDER BY {_l2sq_sql('v.embedding', 'c.ce')}, c.cid) AS rnk
        FROM embeddings v CROSS JOIN cent c
        WHERE v.vec_id < {N_QUERIES}
      ) WHERE rnk <= {IVFPQ_N_PROBE}
    ),
    scored AS (
      SELECT p.query_id, pc.vec_id AS neighbor_id,
             round({d_sum}, 6) + 0.0 AS adc_d2
      FROM probes p
        JOIN assign a ON a.cluster = p.probe
        JOIN codes pc ON pc.vec_id = a.vec_id
                     AND pc.vec_id != p.query_id
      {lut_joins}
    )
    SELECT query_id, neighbor_id, adc_d2, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """


@register(
    "sim_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    tags=("similarity", "ann", "ivf", "pq"), bench=True)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the FAISS-standard composed ANN tier: the IVF coarse
    quantizer restricts each query to its n_probe=2 nearest cells'
    members, and candidates are scored by PQ ASYMMETRIC DISTANCE
    (M table lookups + adds against the query's LUT), never touching a
    raw corpus vector at query time. Composition contract: cell
    restriction == sim_ivf_assign geometry, ADC scoring ==
    sim_pq_adc_topk kernel, PQ on raw vectors (non-residual IVFPQ —
    residual encoding changes the codebook training, which is pinned
    separately by sim_ivf_build/sim_kmeans_lloyd). Coarse centroids are
    the deterministic seed rows; the trained-centroid variant swaps in
    the materialized index exactly as sim_ivf_topk does.

    Scale shape: per query, candidates ~ corpus * n_probe / C (IVF cut)
    and each candidate costs M=4 row-local map lookups over 4-byte
    codes (PQ cut) — memory-resident search structure ~ corpus * M
    bytes, the only layout that holds 10^11 vectors. The corpus side is
    ONE row-local pass (cell argmin + M code argmins against broadcast
    arrays — the _assign_nearest discipline; the former n x C window
    Exchange and the codes<->assign vec_id join are gone); probes and
    the per-query LUT map are query-sized broadcasts; nothing shuffles
    the raw embedding column at query time."""
    emb = load(spark, sf_dir, "embeddings")
    cent = (emb.where(F.col("vec_id") < N_CENTROIDS)
            .select(F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("ce")))
    cb = (emb.where(F.col("vec_id") < PQ_K)
          .select(F.col("vec_id").alias("code"),
                  F.col("embedding").alias("ce")))
    # corpus -> (cell, PQ codes) in ONE row-local projection: nearest
    # cell is an argmin over the broadcast centroid array (same d2
    # fold + (d2, cid) tie-break as the former rank-1 window), and the
    # M code argmins ride the same select (sim_pq_encode's kernel).
    carr = F.broadcast(
        cent.agg(F.collect_list(F.struct("cid", "ce")).alias("cents")))
    cbarr = F.broadcast(
        cb.agg(F.collect_list(F.struct("code", "ce")).alias("cbs")))
    cluster = F.array_min(F.transform(
        F.col("cents"),
        lambda c: F.struct(
            _l2sq(F.col("embedding"), c["ce"]).alias("d2"),
            c["cid"].alias("cid"))))["cid"]
    coded = (emb.crossJoin(carr).crossJoin(cbarr)
             .select("vec_id", cluster.alias("cluster"),
                     *_pq_code_cols()))
    # query -> n_probe cells (needs rank 2, so the query-sized window
    # stays; its input is |queries| x C rows)
    queries = (emb.where(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe")))
    probes = (queries.crossJoin(F.broadcast(cent))
              .select("query_id",
                      _l2sq(F.col("qe"), F.col("ce")).alias("d2"), "cid")
              .withColumn("rnk", F.row_number().over(
                  Window.partitionBy("query_id").orderBy("d2", "cid")))
              .where(F.col("rnk") <= IVFPQ_N_PROBE)
              .select("query_id", F.col("cid").alias("probe")))
    scored = (coded.join(F.broadcast(probes),
                         (F.col("cluster") == F.col("probe"))
                         & (F.col("vec_id") != F.col("query_id")))
              .join(F.broadcast(_pq_query_lut(queries, cb)), "query_id"))
    w = Window.partitionBy("query_id").orderBy("adc_d2", "neighbor_id")
    return (scored.select("query_id",
                          F.col("vec_id").alias("neighbor_id"),
                          (F.round(_pq_adc_sum(), 6) + 0.0)
                          .alias("adc_d2"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("query_id", "neighbor_id", "adc_d2", "rnk"))


# ------------------------------------------- JL random projection

RP_OUT_DIM = 8


def _rp_signs() -> list[list[int]]:
    """Deterministic +-1 projection matrix (Achlioptas-style sign
    entries), derived from the portable md5 hash so both engines inline
    the SAME literal constants — no RNG state anywhere."""
    from ..functions.portable import portable_hash_py

    return [[1 if portable_hash_py(f"rp:{j}:{i}") % 2 == 0 else -1
             for i in range(DIM)]
            for j in range(RP_OUT_DIM)]


def _rp_oracle() -> str:
    cols = []
    for j, signs in enumerate(_rp_signs()):
        arr = "[" + ", ".join(str(s) for s in signs) + "]"
        cols.append(
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, {DIM} + 1), "
            f"i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i])), "
            f"(acc, x) -> acc + x) AS p{j}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


@register(
    "embedding_random_projection",
    oracle=_rp_oracle(),
    tags=("similarity", "embedding", "projection", "compression"))
def embedding_random_projection(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss RANDOM PROJECTION: every 64-dim embedding
    mapped to 8 dims through a fixed +-1 sign matrix (Achlioptas 2003 —
    database-friendly projections: sign entries, no Gaussian sampling),
    the standard cheap dimensionality reduction before LSH bucketing or
    coarse clustering. The sign matrix is derived from the portable md5
    hash at build time and inlined as literals, so the operator is fully
    deterministic with no RNG state and the oracle folds the identical
    constants in the identical sequential order (bit-identical doubles,
    no epsilon).

    Scale shape: perfectly row-local — one projection per row, zero
    shuffles, no UDF (the fold is a JVM-codegen zip_with/aggregate
    chain); the 64x8 matrix lives in the plan itself. At 100 TB this is
    a map-only pass whose output is 8x smaller; distance distortion is
    the JL bound (eps ~ sqrt(ln n / d'))."""
    emb = load(spark, sf_dir, "embeddings")
    cols = []
    for j, signs in enumerate(_rp_signs()):
        arr = F.array(*[F.lit(s) for s in signs])
        cols.append(F.aggregate(
            F.zip_with(F.col("embedding"), arr,
                       lambda x, s: x.cast("double") * s),
            F.lit(0.0), lambda acc, x: acc + x).alias(f"p{j}"))
    return emb.select("vec_id", *cols)


# -------------------------------------------- Matryoshka prefix recall

MRL_PREFIX_DIM = 16


def _mrl_rank_sql(vec_expr_a: str, vec_expr_b: str, dims: int) -> str:
    """Top-3 by cosine over the first `dims` dims (sequential fold)."""
    a = f"{vec_expr_a}[1:{dims}]"
    b = f"{vec_expr_b}[1:{dims}]"
    return f"""
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY {cosine_sql(a, b)} DESC, c.vec_id) AS rnk
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rnk <= 3
    """


@register(
    "sim_matryoshka_recall",
    oracle=f"""
    WITH full3 AS ({_mrl_rank_sql('q.embedding', 'c.embedding', DIM)}),
    pre3 AS ({_mrl_rank_sql('q.embedding', 'c.embedding',
                            MRL_PREFIX_DIM)})
    SELECT f.query_id,
           CAST(COUNT(*) FILTER (WHERE p.neighbor_id IS NOT NULL)
                AS BIGINT) AS hits_prefix,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM full3 f
      LEFT JOIN pre3 p ON f.query_id = p.query_id
                      AND f.neighbor_id = p.neighbor_id
    GROUP BY 1
    """,
    tags=("similarity", "ann", "matryoshka", "recall"))
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA-style truncated search accuracy contract: top-3 by
    cosine over only the FIRST 16 of 64 dims, scored as recall@3
    against the full-dimension top-3 (exact integers per query — the
    sim_ivf_recall discipline). Prefix truncation is the modern
    coarse-search tier for MRL-trained embeddings (score on a prefix,
    rescore survivors on full vectors): 4x less memory bandwidth per
    candidate, and this row documents exactly what that buys/costs on
    this corpus. (The fixture's embeddings are not MRL-trained, so the
    measured recall is the pessimistic bound — the operator contract is
    the measurement machinery.)

    Scale shape: both ranks are broadcast-query brute force with window
    group-limits (the sim_bruteforce_topk plan); the prefix slice
    happens before the fold, so the 100 TB win — a corpus scan touching
    1/4 of each vector's bytes — is structural, not simulated."""
    emb = load(spark, sf_dir, "embeddings")

    def top3(dims: int):
        q = (emb.where(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("query_id"),
                     F.slice("embedding", 1, dims).alias("qe")))
        c = emb.select(F.col("vec_id").alias("neighbor_id"),
                       F.slice("embedding", 1, dims).alias("ce"))
        cos = cosine(F.col("qe"), F.col("ce"))
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                                   "neighbor_id")
        return (c.join(F.broadcast(q),
                       F.col("neighbor_id") != F.col("query_id"))
                .select("query_id", "neighbor_id", cos.alias("cos"))
                .withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= 3)
                .select("query_id", "neighbor_id"))

    full3 = top3(DIM)
    pre3 = (top3(MRL_PREFIX_DIM)
            .withColumnRenamed("neighbor_id", "p_neighbor")
            .withColumnRenamed("query_id", "p_query"))
    return (full3.join(pre3,
                       (F.col("query_id") == F.col("p_query"))
                       & (F.col("neighbor_id") == F.col("p_neighbor")),
                       "left")
            .groupBy("query_id")
            .agg(F.count("p_neighbor").alias("hits_prefix"),
                 F.count(F.lit(1)).alias("k")))


# -------------------------------------- streaming ANN ingest support

ANN_INGEST_MOD = 4
ANN_INGEST_MIN_ID = 16    # > max(seed, query) id: seeds/queries stay base
ANN_INGEST_STREAM_PRED_SQL = (
    f"(vec_id % {ANN_INGEST_MOD} = 0 AND vec_id >= {ANN_INGEST_MIN_ID})")


def ann_ingest_split(spark: SparkSession,
                     sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(base, streamed) corpus split for the streaming-ingest gate: every
    4th vector from id 16 up 'arrives later' on the stream; seeds
    (vec_id < 8) and queries (vec_id < 10) are always base, so training
    on base alone is well-defined and the query set exists pre-ingest."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double"))
        .alias("e"))
    is_stream = ((F.col("vec_id") % ANN_INGEST_MOD == 0)
                 & (F.col("vec_id") >= ANN_INGEST_MIN_ID))
    return emb.where(~is_stream), emb.where(is_stream)


_ANN_BASE_CACHE: dict[str, str] = {}


def ann_base_index_root(spark: SparkSession, sf_dir: str) -> str:
    """IVF index trained and built over the BASE split only, materialized
    once per (process, sf_dir) — the index that exists before streaming
    ingest starts. Ingest appends assigned vectors to a per-call COPY of
    this inverted file (never mutates the cached base)."""
    if sf_dir not in _ANN_BASE_CACHE:
        root = scratch_dir("ivf_base_index_")
        base, _ = ann_ingest_split(spark, sf_dir)
        cent, inverted = _ivf_build_relations(spark, sf_dir, corpus=base)
        cent.write.mode("overwrite").parquet(f"{root}/centroids")
        inverted.write.mode("overwrite").parquet(f"{root}/inverted")
        # seed the C-row sizes sidecar (read-back of the file just
        # written), so streaming ingest's drift gate never has to
        # rebuild it from the index
        (spark.read.parquet(f"{root}/inverted")
         .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(f"{root}/sizes"))
        _ANN_BASE_CACHE[sf_dir] = root
    return _ANN_BASE_CACHE[sf_dir]


def ann_ingest_oracle(n_probe: int) -> str:
    """DuckDB twin of post-ingest search: centroids from one decimal-exact
    Lloyd step over the BASE split, the inverted file as the REBUILT
    assignment of the FULL corpus against those centroids (exactly what
    base-build + per-batch streamed assignment composes to, since both
    use the same trained centroids), then the standard n_probe search.
    Being the rebuilt-index search, oracle equality IS the
    search-consistency contract: post-ingest search == rebuilt-index
    search."""
    dims = ", ".join(f"{_dim_avg_sql(i + 1)} AS d{i}" for i in range(DIM))
    cent_array = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    d2 = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
          "list_transform(range(1, {dim} + 1), "
          "i -> (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]) "
          "* (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]))), "
          "(acc, x) -> acc + x)").format(dim=DIM)
    return f"""
    WITH base AS (
      SELECT * FROM embeddings WHERE NOT {ANN_INGEST_STREAM_PRED_SQL}
    ),
    cent0 AS (
      SELECT vec_id AS centroid_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      FROM base WHERE vec_id < {N_CENTROIDS}
    ),
    assign0 AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2}, c.centroid_id) AS rnk
        FROM base v CROSS JOIN cent0 c
      ) WHERE rnk = 1
    ),
    cent1 AS (
      SELECT cluster AS centroid_id, {cent_array} AS ce FROM (
        SELECT a.cluster, {dims}
        FROM assign0 a JOIN base v ON a.vec_id = v.vec_id
        GROUP BY a.cluster
      )
    ),
    ranked AS (
      SELECT v.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {d2}, c.centroid_id) AS rnk
      FROM embeddings v CROSS JOIN cent1 c
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cluster FROM ranked WHERE rnk = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, centroid_id AS probe
      FROM ranked WHERE rnk <= {n_probe} AND vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {cosine_sql('q.embedding', 'v.embedding')} AS cos
      FROM probes p
        JOIN assign a ON a.cluster = p.probe AND a.vec_id != p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings v ON v.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """


# ----------------------------------------------------- MMR reranking

MMR_QUERIES = 3     # queries: vec_id < 3
MMR_POOL = 12       # relevance candidates entering the rerank
MMR_K = 5           # diversified results returned per query
# Literals written as 0.7e0 / 0.3e0 in SQL so DuckDB parses DOUBLE (a
# plain 0.7 is DECIMAL there), matching Python's float bit-for-bit.
MMR_LAMBDA = 0.7
MMR_MU = 0.3


def _mmr_oracle() -> str:
    """Unrolled greedy MMR in SQL: selection step k is a CTE that scores
    every unselected candidate as lambda*rel - mu*max_sim(selected) via
    a correlated MAX subquery and keeps the (score DESC, cand_id)
    winner. Exact twin of the kernel's loop — same double literals,
    same left-fold cosine, same tie-break."""
    rel = cosine_sql("q.embedding", "c.embedding")
    sql = [f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             c.embedding AS emb, {rel} AS rel
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {MMR_QUERIES}
    ), cand AS (
      SELECT query_id, cand_id, emb, rel FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cand_id) AS rnk
        FROM scored) t WHERE rnk <= {MMR_POOL}
    ), sel1 AS (
      SELECT query_id, cand_id, emb, rel, rel AS score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cand_id) AS rn
        FROM cand) t WHERE rn = 1
    )"""]
    for k in range(2, MMR_K + 1):
        union = " UNION ALL ".join(
            f"SELECT query_id, cand_id, emb FROM sel{j}"
            for j in range(1, k))
        sim = cosine_sql("c.emb", "s.emb")
        sql.append(f""", selu{k - 1} AS ({union}),
    sc{k} AS (
      SELECT c.query_id, c.cand_id, c.emb, c.rel,
             0.7e0 * c.rel - 0.3e0 * (
               SELECT MAX({sim}) FROM selu{k - 1} s
               WHERE s.query_id = c.query_id) AS score
      FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM selu{k - 1} z
                        WHERE z.query_id = c.query_id
                          AND z.cand_id = c.cand_id)
    ), sel{k} AS (
      SELECT query_id, cand_id, emb, rel, score FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, cand_id) AS rn
        FROM sc{k}) t WHERE rn = 1
    )""")
    final = " UNION ALL ".join(
        f"SELECT query_id, CAST({j} AS BIGINT) AS rank, cand_id, "
        f"round(score, 6) + 0.0 AS score FROM sel{j}"
        for j in range(1, MMR_K + 1))
    return "".join(sql) + f"\n    SELECT * FROM ({final}) f"


def _mmr_rerank_group(pdf):
    """Greedy MMR over one query's candidate pool (pandas group). The
    cosine here is the SAME left fold as functions/portable.dot — a
    sequential double accumulation in element order (float32 -> double
    casts and products are exact, so fold order is the only freedom,
    and both engines use left-to-right) — which keeps every score and
    therefore every selection bit-identical to the SQL oracle. Emitted
    scores round via the shared HALF_UP helper (the engine rows'
    F.round policy), not Python's half-even round()."""
    import math

    import pandas as pd

    from ..functions.portable import round_half_up

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    qid = int(pdf["query_id"].iloc[0])
    cands = {}
    for _, row in pdf.iterrows():
        emb = row["emb"]
        cands[int(row["cand_id"])] = (
            float(row["rel"]), emb, math.sqrt(fold_dot(emb, emb)))
    maxsim = {cid: None for cid in cands}
    out = []
    for rank in range(1, MMR_K + 1):
        if not cands:
            break
        if rank == 1:
            score = {cid: rel for cid, (rel, _, _) in cands.items()}
        else:
            score = {cid: MMR_LAMBDA * rel - MMR_MU * maxsim[cid]
                     for cid, (rel, _, _) in cands.items()}
        pick = min(score, key=lambda cid: (-score[cid], cid))
        out.append((qid, rank, pick, round_half_up(score[pick], 6) + 0.0))
        _, pe, pn = cands.pop(pick)
        for cid, (_, ce, cn) in cands.items():
            s = fold_dot(ce, pe) / (cn * pn)
            maxsim[cid] = s if maxsim[cid] is None else max(maxsim[cid], s)
    return pd.DataFrame(out, columns=["query_id", "rank", "cand_id",
                                      "score"])


@register(
    "sim_mmr_rerank",
    oracle=_mmr_oracle(),
    tags=("similarity", "rerank", "mmr", "pandas-kernel"))
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking: per query, the top-
    {MMR_POOL} cosine candidates are greedily re-ranked so each pick
    maximizes lambda*relevance - mu*max-similarity-to-already-picked —
    the standard diversity pass between retrieval and a RAG context
    window (near-duplicate passages waste the budget relevance alone
    would spend twice).

    Split of labor is the production one: candidate GENERATION is pure
    JVM DataFrame (broadcast query set, one corpus pass, window
    group-limit — identical shape to sim_bruteforce_topk), and the
    inherently sequential greedy selection runs in applyInPandas over
    each query's pool — {MMR_POOL} rows per group, so the Python tier
    touches O(queries * pool), never the corpus. The oracle unrolls the
    same greedy loop as {MMR_K} SQL selection stages; scores stay
    bit-identical because both sides use the portable left-fold cosine
    and the same double literals, so even argmax TIES resolve the same
    way (cand_id ascending).

    Scale shape: corpus cost = one scan + group-limit (no global sort);
    rerank cost is per-query constant. At 100 TB the pool would come
    from the IVF path instead — the rerank stage is unchanged.

    Reference scope: similarity-search north star (SURVEY.md S2c).
    """
    emb = load(spark, sf_dir, "embeddings")
    q = (emb.where(F.col("vec_id") < MMR_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe")))
    c = emb.select(F.col("vec_id").alias("cand_id"),
                   F.col("embedding").alias("emb"))
    rel = cosine(F.col("qe"), F.col("emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), "cand_id")
    pool = (c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id"))
            .select("query_id", "cand_id", "emb", rel.alias("rel"))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= MMR_POOL)
            .select("query_id", "cand_id", "emb", "rel"))
    return pool.groupBy("query_id").applyInPandas(
        lambda pdf: _mmr_rerank_group(pdf),
        schema="query_id bigint, rank bigint, cand_id bigint, score double")


RADIUS_TAU = 0.3    # cosine radius for range search


@register(
    "sim_radius_search",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round({cosine_sql('q.embedding', 'c.embedding')}, 4) + 0.0
             AS cos
    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {N_QUERIES}
      AND {cosine_sql('q.embedding', 'c.embedding')} > {RADIUS_TAU}
    """,
    tags=("similarity", "ann", "radius"))
def sim_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RADIUS (range) similarity search: every corpus vector within
    cosine > {RADIUS_TAU} of each query — the other half of the ANN
    API surface next to top-k (dedup radii, "all sufficiently similar"
    retrieval, recall-oriented candidate generation where k is
    unknowable a priori).

    Scale shape: identical scan discipline to sim_bruteforce_topk —
    query set broadcast, ONE corpus pass, per-side norms hoisted before
    the join — but the radius predicate needs NO window at all (top-k's
    group-limit sort disappears; output is filter-selected, unbounded
    per query by design). The threshold compare runs on the portable
    left-fold cosine, bit-identical cross-engine, so membership at the
    boundary cannot straddle; the IVF route (probe clusters whose
    centroid distance admits the radius) swaps in unchanged at corpus
    scale.

    Reference scope: similarity-search north star (SURVEY.md S2c).
    """
    from ..functions.portable import dot, norm

    emb = load(spark, sf_dir, "embeddings")
    q = (emb.where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe"),
                 norm(F.col("embedding")).alias("qn")))
    c = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("ce"),
                   norm(F.col("embedding")).alias("cn"))
    cos = dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    return (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", cos.alias("cos"))
            .where(F.col("cos") > RADIUS_TAU)
            .select("query_id", "neighbor_id",
                    (F.round("cos", 4) + 0.0).alias("cos")))


# ------------------------------------------- k-center coreset selection

KCENTER_K = 5        # selected coreset size (incl. the seed)
KCENTER_SEED = 0     # deterministic seed point: vec_id 0


def _kcenter_oracle() -> str:
    """Unrolled greedy k-center (farthest-point traversal) in SQL:
    round k picks argmax over the corpus of min-L2^2-to-selected via a
    correlated MIN subquery — same fold, same (d2 DESC, vec_id)
    tie-break as the Spark loop."""
    sql = [f"""
    WITH sel0 AS (
      SELECT CAST(0 AS BIGINT) AS rank, vec_id, embedding,
             CAST(0.0 AS DOUBLE) AS d2
      FROM embeddings WHERE vec_id = {KCENTER_SEED}
    )"""]
    for k in range(1, KCENTER_K):
        union = " UNION ALL ".join(
            f"SELECT vec_id, embedding FROM sel{j}" for j in range(k))
        d2 = _l2sq_sql("e.embedding", "s.embedding")
        sql.append(f""", selu{k} AS ({union}),
    sc{k} AS (
      SELECT e.vec_id, e.embedding,
             (SELECT MIN({d2}) FROM selu{k} s) AS d2
      FROM embeddings e
      WHERE e.vec_id NOT IN (SELECT vec_id FROM selu{k})
    ), sel{k} AS (
      SELECT CAST({k} AS BIGINT) AS rank, vec_id, embedding, d2
      FROM sc{k} ORDER BY d2 DESC, vec_id LIMIT 1
    )""")
    final = " UNION ALL ".join(
        f"SELECT rank, vec_id, round(d2, 6) + 0.0 AS d2 FROM sel{j}"
        for j in range(KCENTER_K))
    return "".join(sql) + f"\n    SELECT * FROM ({final}) f"


def _kcenter_select(spark: SparkSession, emb: DataFrame,
                    k: int, seed_id: int) -> list[tuple[int, int, float]]:
    """Greedy k-center rounds over an (vec_id, embedding) relation.

    Each round joins the corpus against a BROADCAST relation built from
    the selected set (k small rows — plan size stays flat regardless of
    k, unlike inlining the vectors as O(k*dim) literal expressions, the
    r8 watch item): the selected ids anti-join away already-picked
    candidates, and the selected VECTORS collapse to a single 1-row
    array-of-arrays that broadcasts onto every candidate row, where
    ``array_min(transform(...))`` folds min-L2^2 JVM-side — NO shuffle
    of the corpus (no groupBy; the top-1 is TakeOrderedAndProject's
    per-partition partial + driver merge), preserving the literal
    form's k-linear-scans cost profile. One driver-side collect of ONE
    ROW per round, the blessed iterative-fixpoint pattern."""
    from ..functions.portable import round_half_up

    seed = emb.where(F.col("vec_id") == seed_id) \
              .select("vec_id", "embedding").collect()[0]
    selected = [(0, int(seed["vec_id"]), 0.0)]
    sel_rows = [(int(seed["vec_id"]),
                 [float(x) for x in seed["embedding"]])]
    for rnd in range(1, k):
        sel_df = spark.createDataFrame(
            sel_rows, "sel_id bigint, semb array<double>")
        cand = emb.join(F.broadcast(sel_df.select(
            F.col("sel_id").alias("vec_id"))), "vec_id", "left_anti")
        sels_one = sel_df.agg(F.collect_list("semb").alias("sels"))
        min_d2 = F.array_min(F.transform(
            F.col("sels"), lambda v: _l2sq(F.col("embedding"), v)))
        picked = (cand.join(F.broadcast(sels_one))
                  .select("vec_id", "embedding", min_d2.alias("d2"))
                  .orderBy(F.desc("d2"), "vec_id").limit(1).collect()[0])
        selected.append((rnd, int(picked["vec_id"]),
                         round_half_up(float(picked["d2"]), 6) + 0.0))
        sel_rows.append((int(picked["vec_id"]),
                         [float(x) for x in picked["embedding"]]))
    return selected


@register(
    "sample_coreset_kcenter",
    oracle=_kcenter_oracle(),
    tags=("similarity", "coreset", "kcenter", "sampling"))
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORESET SELECTION by greedy k-center (farthest-point traversal):
    starting from a deterministic seed, each round adds the corpus
    point FARTHEST (max-min L2^2) from everything selected so far —
    the 2-approximation coverage heuristic behind diverse-subset
    training-data selection and k-means++-style seeding.

    Unlike sim_mmr_rerank (greedy over a per-query POOL in one pandas
    group), each k-center round is a DISTRIBUTED full-corpus pass: the
    <= k selected vectors join in as a BROADCAST relation (k tiny rows
    — plan size stays FLAT as k grows, the r8 verdict's generalization
    ask; the prior form inlined O(k*dim) literals per round), the
    per-pair L2^2 folds JVM-side, min-per-candidate aggregates
    map-side, and the round's winner comes back through
    TakeOrderedAndProject(1) — one driver-side collect of ONE ROW per
    round, the same blessed iterative-fixpoint pattern as connected
    components' convergence probe. Cost: k linear scans, no shuffle
    beyond the partial-agg merge, no k x corpus materialization.
    Scores/ties are bit-identical to the unrolled SQL oracle via the
    portable left-fold distance (float32 -> double casts exact; min
    over pairs == the oracle's correlated MIN; argmax ties break on
    vec_id); emitted d2 rounds via the shared HALF_UP helper.

    Reference scope: LLM-pipeline sampling north star (SURVEY.md S2c),
    the coverage-driven member next to the hash/temperature samplers.
    """
    emb = load(spark, sf_dir, "embeddings")
    selected = _kcenter_select(spark, emb, KCENTER_K, KCENTER_SEED)
    return spark.createDataFrame(
        selected, "rank bigint, vec_id bigint, d2 double")


# ------------------------------------------- hybrid retrieval (RRF fusion)

RRF_QUERIES = 3     # query docs: doc_id < 3
RRF_C = 60          # the canonical RRF rank constant
RRF_TOPK = 5        # fused results returned per query


def _rrf_oracle() -> str:
    from ..functions.portable import tokens_sql

    toks = f"list_distinct({tokens_sql('d.text')})"
    return f"""
    WITH corpus AS (
      SELECT d.doc_id, {toks} AS toks, e.embedding
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), q AS (
      SELECT doc_id AS query_id, toks AS qt, embedding AS qe
      FROM corpus WHERE doc_id < {RRF_QUERIES}
    ), scored AS (
      SELECT q.query_id, c.doc_id AS cand_id,
             {cosine_sql('q.qe', 'c.embedding')} AS cos,
             CAST(len(list_intersect(q.qt, c.toks)) AS DOUBLE)
               / (len(q.qt) + len(c.toks)
                  - len(list_intersect(q.qt, c.toks))) AS jac
      FROM corpus c JOIN q ON c.doc_id != q.query_id
    ), ranked AS (
      SELECT query_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS ra,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY jac DESC, cand_id) AS rb
      FROM scored
    )
    SELECT query_id, cand_id, CAST(rank AS BIGINT) AS rank,
           round(score, 9) + 0.0 AS rrf_score,
           CAST(ra AS BIGINT) AS rank_cosine, CAST(rb AS BIGINT) AS rank_jaccard
    FROM (
      SELECT *,
             1.0 / ({RRF_C} + ra) + 1.0 / ({RRF_C} + rb) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY 1.0 / ({RRF_C} + ra) + 1.0 / ({RRF_C} + rb) DESC,
                        cand_id) AS rank
      FROM ranked
    ) WHERE rank <= {RRF_TOPK}
    """


@register(
    "sim_hybrid_rrf",
    oracle=_rrf_oracle(),
    tags=("similarity", "hybrid", "rrf", "retrieval"),
    bench=True)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID RETRIEVAL via Reciprocal Rank Fusion: each query document
    ranks the corpus twice — DENSE (embedding cosine) and LEXICAL
    (distinct-token Jaccard) — and the lists fuse by RRF(d) =
    sum_i 1/({RRF_C} + rank_i(d)), the standard score-free fusion a
    RAG stack runs between its vector index and its keyword index
    (ranks, not raw scores, so neither modality's scale dominates).

    Exactness: the cosine is the portable left fold; Jaccard is integer
    set arithmetic over the shared tokenizer's DISTINCT token sets
    (|A n B| / (|A| + |B| - |A n B|)) divided once in double; every
    rank is a deterministic row_number ((score DESC, cand_id)); the
    fused score is the same two double divisions added in the same
    order in both engines, rounded by the F.round/DuckDB-round pairing.

    Scale shape: the query set broadcasts (same discipline as
    sim_bruteforce_topk), ONE corpus pass feeds both rankings (the two
    row_numbers share one query_id exchange), and the fused top-k is a
    window group-limit. At 100 TB neither ranking scans the corpus:
    the dense list comes from the IVF path and the lexical list from
    the BM25 postings top-pool — RRF consumes (doc, rank) pairs and is
    INDIFFERENT to how each list was produced; this row pins the
    fusion arithmetic itself.

    Reference scope: similarity-search north star (SURVEY.md S2c) —
    the fusion member joining the dense (ivf/brute-force) and lexical
    (bm25) families the repo already implements separately.
    """
    from ..functions.portable import tokens

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    corpus = (docs.join(emb, docs.doc_id == emb.vec_id)
              .select("doc_id",
                      F.array_distinct(tokens("text")).alias("toks"),
                      "embedding"))
    q = (corpus.where(F.col("doc_id") < RRF_QUERIES)
         .select(F.col("doc_id").alias("query_id"),
                 F.col("toks").alias("qt"),
                 F.col("embedding").alias("qe")))
    inter = F.size(F.array_intersect("qt", "toks"))
    jac = (inter.cast("double")
           / (F.size("qt") + F.size("toks") - inter))
    scored = (corpus.join(F.broadcast(q),
                          F.col("doc_id") != F.col("query_id"))
              .select("query_id", F.col("doc_id").alias("cand_id"),
                      cosine(F.col("qe"), F.col("embedding")).alias("cos"),
                      jac.alias("jac")))
    wa = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    wb = Window.partitionBy("query_id").orderBy(F.desc("jac"), "cand_id")
    ranked = (scored
              .withColumn("ra", F.row_number().over(wa))
              .withColumn("rb", F.row_number().over(wb)))
    score = (F.lit(1.0) / (F.lit(RRF_C) + F.col("ra"))
             + F.lit(1.0) / (F.lit(RRF_C) + F.col("rb")))
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("score"), "cand_id")
    return (ranked.withColumn("score", score)
            .withColumn("rank", F.row_number().over(wf))
            .where(F.col("rank") <= RRF_TOPK)
            .select("query_id", "cand_id",
                    F.col("rank").cast("bigint").alias("rank"),
                    (F.round("score", 9) + 0.0).alias("rrf_score"),
                    F.col("ra").cast("bigint").alias("rank_cosine"),
                    F.col("rb").cast("bigint").alias("rank_jaccard")))


# --------------------------- hybrid retrieval, INDEXED paths (r9 verdict #2)

HYB_QTERM_MINLEN = 6   # query terms: distinct doc tokens at least this long
HYB_QTERMS_K = 3       # lexicographically-first K such tokens per query doc
HYB_DENSE_K = 3        # dense list length (the IVF/brute-force top-3 contract)


def _hybrid_lex_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k candidate list for DERIVED queries: each query doc
    (doc_id < N_QUERIES, the IVF query set) contributes its
    {HYB_QTERMS_K} lexicographically-first distinct tokens of length >=
    {HYB_QTERM_MINLEN} as search terms — a deterministic stand-in for
    the user query string, shared verbatim with the oracle (sorted
    selection, not first-occurrence, because DuckDB's list_distinct
    does not preserve order). Returns (query_id, cand_id, rb) with the
    query doc itself excluded — the dense side's self-exclusion mirror.

    Scale shape = text_bm25_search: one (doc_id, term) shuffle with
    map-side combine, query terms broadcast onto the postings before
    the df join, document length CARRIED on the posting rows (the
    _jaccard_pairs carried-sizes idiom — the former corpus-wide dl
    join is gone, and the corpus is tokenized ONCE behind a persisted
    (doc_id, tk) relation), top-k as a window group-limit over the
    scored relation."""
    from ..functions.portable import tokens
    from .text import BM25_B, BM25_K1, BM25_TOP_K

    docs = load(spark, sf_dir, "documents")
    para = spark.sparkContext.defaultParallelism
    # ONE tokenize pass total (the text_bm25_search discipline): the
    # (doc_id, tk) relation is persisted and all three consumers
    # (postings, corpus stats, query-term extraction) read the cache.
    # explode_OUTER suppresses InferFiltersFromGenerate's size(tk)>0
    # pre-filter — its null terms are dropped by the query-term join.
    tk_rel = (docs.repartition(para)
              .select("doc_id", tokens("text").alias("tk"))
              .persist())
    toks = tk_rel.select("doc_id", F.size("tk").alias("dl"),
                         F.explode_outer("tk").alias("term"))
    stats = (tk_rel.select(F.size("tk").alias("dl"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.avg(F.col("dl").cast("double")).alias("avgdl")))
    qt = F.slice(
        F.array_sort(F.filter(
            F.array_distinct(F.col("tk")),
            lambda t: F.length(t) >= HYB_QTERM_MINLEN)),
        1, HYB_QTERMS_K)
    queries = (tk_rel.where(F.col("doc_id") < N_QUERIES)
               .select(F.col("doc_id").alias("query_id"),
                       F.explode(qt).alias("term")))
    # tf is tiny (docs matching query terms, aggregated) but feeds TWO
    # consumers (df derivation + the contrib join) — persist so the
    # corpus-wide posting subtree is evaluated once, not per consumer
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
    scored = (contrib.where(F.col("doc_id") != F.col("query_id"))
              .groupBy("query_id", "doc_id")
              .agg((F.round(F.sum("c"), 6) + F.lit(0.0)).alias("score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (scored.withColumn("rb", F.row_number().over(w))
            .where(F.col("rb") <= BM25_TOP_K)
            .select("query_id", F.col("doc_id").alias("cand_id"), "rb"))


def _rrf_fuse_lists(dense: DataFrame, lex: DataFrame) -> DataFrame:
    """RRF over two (query_id, cand_id, rank) CANDIDATE LISTS — unlike
    sim_hybrid_rrf's full-corpus twin ranking, a candidate here may
    appear in only one list, so the fusion is a full-outer join and
    each missing modality contributes 0 (the standard list-based RRF).
    Returns fused rows with (ra, rb, score, rank), rank <= RRF_TOPK."""
    d = dense.select("query_id", "cand_id", "ra")
    l = lex.select("query_id", "cand_id", "rb")
    j = d.join(l, ["query_id", "cand_id"], "full_outer")
    score = (F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("ra")),
                        F.lit(0.0))
             + F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("rb")),
                          F.lit(0.0)))
    wf = Window.partitionBy("query_id").orderBy(F.desc("score"), "cand_id")
    return (j.withColumn("score", score)
            .withColumn("rank", F.row_number().over(wf))
            .where(F.col("rank") <= RRF_TOPK))


def _hybrid_lex_cte() -> str:
    """DuckDB CTE block (names prefixed h*) replicating
    _hybrid_lex_list — BM25 over the derived query terms."""
    from ..functions.portable import tokens_sql
    from .text import BM25_B, BM25_K1, BM25_TOP_K

    return f"""
    dtoks AS (SELECT doc_id, {tokens_sql('text')} AS tk FROM documents),
    htoks AS (SELECT doc_id, unnest(tk) AS term FROM dtoks),
    hdl AS (SELECT doc_id, len(tk) AS dl FROM dtoks),
    hstats AS (SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl
               FROM hdl),
    hqterms AS (
      SELECT doc_id AS query_id,
             unnest(list_sort(list_filter(list_distinct(tk),
                    t -> len(t) >= {HYB_QTERM_MINLEN}))[1:{HYB_QTERMS_K}])
               AS term
      FROM dtoks WHERE doc_id < {N_QUERIES}),
    htf AS (SELECT doc_id, term, COUNT(*) AS tf FROM htoks
            WHERE term IN (SELECT DISTINCT term FROM hqterms)
            GROUP BY 1, 2),
    hdf AS (SELECT term, COUNT(*) AS df FROM htf GROUP BY term),
    hcontrib AS (
      SELECT qr.query_id, htf.doc_id,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (htf.tf * ({BM25_K1} + 1.0))
               / (htf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * hdl.dl / s.avgdl)) AS c
      FROM hqterms qr
        JOIN htf USING (term) JOIN hdf d USING (term)
        JOIN hdl ON hdl.doc_id = htf.doc_id
        CROSS JOIN hstats s),
    hlexscored AS (
      SELECT query_id, doc_id AS cand_id, round(SUM(c), 6) + 0.0 AS score
      FROM hcontrib WHERE doc_id != query_id GROUP BY 1, 2),
    hlex AS (
      SELECT query_id, cand_id, rb FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, cand_id) AS rb
        FROM hlexscored) WHERE rb <= {BM25_TOP_K})"""


def _fusion_sql(dense_cte: str) -> str:
    """List-based RRF fusion of ``dense_cte`` (query_id, cand_id, ra)
    with hlex — the SQL twin of _rrf_fuse_lists (full-outer, missing
    modality contributes 0.0, same literal shapes)."""
    return f"""
      SELECT query_id, cand_id, ra, rb,
             COALESCE(1.0 / ({RRF_C} + ra), 0.0)
               + COALESCE(1.0 / ({RRF_C} + rb), 0.0) AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY COALESCE(1.0 / ({RRF_C} + ra), 0.0)
                      + COALESCE(1.0 / ({RRF_C} + rb), 0.0) DESC,
                        cand_id) AS rank
      FROM (
        SELECT COALESCE(d.query_id, l.query_id) AS query_id,
               COALESCE(d.cand_id, l.cand_id) AS cand_id, d.ra, l.rb
        FROM {dense_cte} d FULL OUTER JOIN hlex l
          ON d.query_id = l.query_id AND d.cand_id = l.cand_id)"""


def _rrf_indexed_oracle() -> str:
    return f"""
    WITH {_hybrid_lex_cte()},
    hdense AS (SELECT query_id, neighbor_id AS cand_id, rnk AS ra
               FROM ({_ivf_nprobe_oracle(n_probe=1)}))
    SELECT query_id, cand_id, CAST(rank AS BIGINT) AS rank,
           round(score, 9) + 0.0 AS rrf_score,
           CAST(ra AS BIGINT) AS rank_dense,
           CAST(rb AS BIGINT) AS rank_lexical
    FROM ({_fusion_sql('hdense')}) WHERE rank <= {RRF_TOPK}
    """


@register(
    "sim_hybrid_rrf_indexed",
    oracle=_rrf_indexed_oracle(),
    tags=("similarity", "hybrid", "rrf", "retrieval", "indexed"),
    bench=True)
def sim_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END INDEXED hybrid retrieval (r9 verdict #2): the RRF
    fusion fed by the repo's ACTUAL index paths instead of brute-force
    twin rankings — the dense list is the prebuilt-IVF search
    (sim_ivf_topk's exact plan: stored centroids picked at query time,
    only the probed cluster scored) and the lexical list is the BM25
    postings path (text_bm25_search's plan over terms derived from the
    query doc). This is the production RAG shape sim_hybrid_rrf's
    docstring promises: RRF consumes (doc, rank) pairs, so at 100 TB
    neither ranking scans the corpus.

    List-based fusion semantics: candidates may appear in only one
    list (IVF top-{HYB_DENSE_K}, BM25 top-5), so the fuse is a
    FULL-OUTER join and a missing modality contributes 0 — rank_dense/
    rank_lexical are NULL for one-sided candidates by design.

    Exactness: IVF ranks ride the proven _ivf_nprobe_oracle geometry;
    BM25 ranks ride the text_bm25_search formula ranking on the
    6dp-rounded score; the fused score adds the same two doubles in the
    same order (COALESCE(x, 0.0) per side) under the round(9) output
    pairing. Query terms are a SORTED selection (lexicographically
    first {HYB_QTERMS_K} distinct tokens >= {HYB_QTERM_MINLEN} chars)
    because DuckDB's list_distinct does not preserve order.

    Reference scope: similarity-search north star (SURVEY.md S2c) —
    the indexed composition of the ivf + bm25 families."""
    dense = (_ivf_search_prebuilt(spark, sf_dir, n_probe=1)
             .select("query_id", F.col("neighbor_id").alias("cand_id"),
                     F.col("rnk").alias("ra")))
    fused = _rrf_fuse_lists(dense, _hybrid_lex_list(spark, sf_dir))
    return fused.select(
        "query_id", "cand_id",
        F.col("rank").cast("bigint").alias("rank"),
        (F.round("score", 9) + 0.0).alias("rrf_score"),
        F.col("ra").cast("bigint").alias("rank_dense"),
        F.col("rb").cast("bigint").alias("rank_lexical"))


def _rrf_indexed_recall_oracle() -> str:
    return f"""
    WITH {_hybrid_lex_cte()},
    hdense AS (SELECT query_id, neighbor_id AS cand_id, rnk AS ra
               FROM ({_ivf_nprobe_oracle(n_probe=1)})),
    xdense AS (SELECT query_id, neighbor_id AS cand_id, rnk AS ra
               FROM ({_BF_ORACLE}) WHERE rnk <= {HYB_DENSE_K}),
    fi AS (SELECT query_id, cand_id FROM ({_fusion_sql('hdense')})
           WHERE rank <= {RRF_TOPK}),
    fx AS (SELECT query_id, cand_id FROM ({_fusion_sql('xdense')})
           WHERE rank <= {RRF_TOPK})
    SELECT x.query_id,
           CAST(COUNT(*) FILTER (WHERE i.cand_id IS NOT NULL) AS BIGINT)
             AS hits,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM fx x LEFT JOIN fi i
      ON x.query_id = i.query_id AND x.cand_id = i.cand_id
    GROUP BY 1
    """


@register(
    "sim_hybrid_rrf_indexed_recall",
    oracle=_rrf_indexed_recall_oracle(),
    tags=("similarity", "hybrid", "rrf", "recall"))
def sim_hybrid_rrf_indexed_recall(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """FUSION ACCURACY CONTRACT (the sim_ivf_recall pattern): per-query
    overlap@{RRF_TOPK} of the INDEXED fusion (IVF dense list) against
    the EXACT fusion (brute-force dense top-{HYB_DENSE_K}, identical
    lexical list — BM25 over query-term postings is already exact, so
    the dense ranker is the only approximation). hits/k as exact
    integers under the oracle gate — at 100 TB this is the monitoring
    query that tells you whether the IVF probe budget is costing
    retrieval quality after fusion."""
    lex = _hybrid_lex_list(spark, sf_dir)
    densei = (_ivf_search_prebuilt(spark, sf_dir, n_probe=1)
              .select("query_id", F.col("neighbor_id").alias("cand_id"),
                      F.col("rnk").alias("ra")))
    densex = (sim_bruteforce_topk(spark, sf_dir)
              .where(F.col("rnk") <= HYB_DENSE_K)
              .select("query_id", F.col("neighbor_id").alias("cand_id"),
                      F.col("rnk").alias("ra")))
    fi = (_rrf_fuse_lists(densei, lex)
          .select("query_id", "cand_id", F.lit(1).alias("h")))
    fx = _rrf_fuse_lists(densex, lex).select("query_id", "cand_id")
    return (fx.join(fi, ["query_id", "cand_id"], "left")
            .groupBy("query_id")
            .agg(F.sum(F.coalesce(F.col("h"), F.lit(0)))
                 .cast("bigint").alias("hits"),
                 F.count(F.lit(1)).alias("k")))


def ann_retrain_oracle(n_probe: int) -> str:
    """DuckDB twin of POST-RETRAIN search: the ann_ingest_oracle pipeline
    (one Lloyd step over the base split, full-corpus assignment — the
    post-ingest index) extended by exactly the repair ivf_maybe_retrain
    performs: cent2 = decimal-exact per-cluster means of the CURRENT
    (post-ingest) members, assign2 = full reassignment, then the
    standard n_probe search over the retrained geometry. Oracle equality
    IS the retrain contract — post-retrain serving == an index rebuilt
    by the same means+reassign step (test_ivf_retrain pins the same
    equality batch-side)."""
    dims = ", ".join(f"{_dim_avg_sql(i + 1)} AS d{i}" for i in range(DIM))
    cent_array = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    d2 = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
          "list_transform(range(1, {dim} + 1), "
          "i -> (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]) "
          "* (CAST(v.embedding[i] AS DOUBLE) - c.ce[i]))), "
          "(acc, x) -> acc + x)").format(dim=DIM)
    return f"""
    WITH base AS (
      SELECT * FROM embeddings WHERE NOT {ANN_INGEST_STREAM_PRED_SQL}
    ),
    cent0 AS (
      SELECT vec_id AS centroid_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      FROM base WHERE vec_id < {N_CENTROIDS}
    ),
    assign0 AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2}, c.centroid_id) AS rnk
        FROM base v CROSS JOIN cent0 c
      ) WHERE rnk = 1
    ),
    cent1 AS (
      SELECT cluster AS centroid_id, {cent_array} AS ce FROM (
        SELECT a.cluster, {dims}
        FROM assign0 a JOIN base v ON a.vec_id = v.vec_id
        GROUP BY a.cluster
      )
    ),
    assign AS (
      SELECT vec_id, centroid_id AS cluster FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                  ORDER BY {d2}, c.centroid_id) AS rnk
        FROM embeddings v CROSS JOIN cent1 c
      ) WHERE rnk = 1
    ),
    cent2 AS (
      SELECT cluster AS centroid_id, {cent_array} AS ce FROM (
        SELECT a.cluster, {dims}
        FROM assign a JOIN embeddings v ON a.vec_id = v.vec_id
        GROUP BY a.cluster
      )
    ),
    ranked2 AS (
      SELECT v.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {d2}, c.centroid_id) AS rnk
      FROM embeddings v CROSS JOIN cent2 c
    ),
    assign2 AS (
      SELECT vec_id, centroid_id AS cluster FROM ranked2 WHERE rnk = 1
    ),
    probes2 AS (
      SELECT vec_id AS query_id, centroid_id AS probe
      FROM ranked2 WHERE rnk <= {n_probe} AND vec_id < {N_QUERIES}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {cosine_sql('q.embedding', 'v.embedding')} AS cos
      FROM probes2 p
        JOIN assign2 a ON a.cluster = p.probe AND a.vec_id != p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings v ON v.vec_id = a.vec_id
    )
    SELECT query_id, neighbor_id, round(cos, 4) + 0.0 AS cos, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """


# ------------------------------- dominant component via power iteration

EIG_V0 = 0.125        # start vector: 1/sqrt(DIM) = 1/8, exact in binary
EIG_ITERS = 2         # fixed iteration count (deterministic, like Lloyd)


def _power_iteration_oracle() -> str:
    """DuckDB twin: {EIG_ITERS} chained CTE blocks, each one pass of
    v <- normalize(A^T (A v)) with the decimal-snap discipline (see the
    Spark docstring for the exactness argument)."""
    score = (f"CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
             f"list_transform(range(1, {DIM} + 1), "
             f"i -> CAST(v.embedding[i] AS DOUBLE) * u.varr[i])), "
             f"(acc, x) -> acc + x) AS DECIMAL(20,8))")
    sums = ", ".join(
        f"CAST(CAST(SUM(CAST(CAST(embedding[{i + 1}] AS DOUBLE) "
        f"AS DECIMAL(12,6)) * dd) AS VARCHAR) AS DOUBLE) AS d{i}"
        for i in range(DIM))
    arr = "[" + ", ".join(f"d{i}" for i in range(DIM)) + "]"
    norm = ("sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(arr, x -> x * x)), (acc, x) -> acc + x))")
    return f"""
    WITH v0 AS (
      SELECT list_transform(range(1, {DIM} + 1),
                            i -> CAST({EIG_V0} AS DOUBLE)) AS varr
    ),
    s1 AS (
      SELECT v.embedding, {score} AS dd
      FROM embeddings v CROSS JOIN v0 u
    ),
    a1 AS (SELECT {sums} FROM s1),
    n1 AS (SELECT arr, {norm} AS nrm FROM (SELECT {arr} AS arr FROM a1)),
    u1 AS (SELECT list_transform(arr, x -> x / nrm) AS varr FROM n1),
    s2 AS (
      SELECT v.embedding, {score} AS dd
      FROM embeddings v CROSS JOIN u1 u
    ),
    a2 AS (SELECT {sums} FROM s2),
    n2 AS (SELECT arr, {norm} AS nrm FROM (SELECT {arr} AS arr FROM a2))
    SELECT CAST(i AS BIGINT) AS dim,
           round(arr[i] / nrm, 9) + 0.0 AS loading,
           round(nrm, 6) + 0.0 AS eigval
    FROM n2 CROSS JOIN (SELECT unnest(range(1, {DIM} + 1)) AS i)
    """


def _power_iteration_once(emb: DataFrame, vdf: DataFrame) -> DataFrame:
    """One power-iteration pass: (1-row varr relation) ->
    normalize(A^T (A varr)) as a new 1-row (varr, nrm) relation. The
    vector rides a BROADCAST RELATION, not inlined literals (the
    k-center r8 lesson), so plan size is constant in DIM."""
    d = F.aggregate(
        F.zip_with(F.col("e"), F.col("varr"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (emb.crossJoin(F.broadcast(vdf))
              .select("e", d.cast("decimal(20,8)").alias("dd")))
    sums = [
        F.sum(F.element_at("e", i + 1).cast("decimal(12,6)")
              * F.col("dd")).cast("double").alias(f"d{i}")
        for i in range(DIM)]
    agg = scored.agg(*sums)
    arr = F.array(*[F.col(f"d{i}") for i in range(DIM)])
    nrm = F.sqrt(F.aggregate(F.transform(arr, lambda x: x * x),
                             F.lit(0.0), lambda acc, x: acc + x))
    return agg.select(
        F.transform(arr, lambda x: x / nrm).alias("varr"),
        nrm.alias("nrm"))


@register(
    "embedding_power_iteration",
    oracle=_power_iteration_oracle(),
    tags=("similarity", "embedding", "linear-algebra", "iterative"))
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMINANT PRINCIPAL DIRECTION of the (uncentered) embedding matrix
    by POWER ITERATION — v <- normalize(A^T (A v)) from the exact
    1/sqrt({DIM}) start, {EIG_ITERS} fixed iterations (the Lloyd
    discipline: deterministic step count, no data-dependent stopping) —
    the first step of embedding whitening / spectral diagnostics a
    training-data pipeline runs before trusting cosine geometry.
    Returns the 64 loadings plus the dominant-eigenvalue estimate
    (||A^T A v|| of the final unit v). For centered PCA subtract the
    per-dim decimal-exact means first (the Lloyd centroid machinery).

    Exactness across engines: each iteration computes the per-row
    score d = sum_i e_i*v_i as an index-ordered double fold
    (bit-deterministic), SNAPS it to DECIMAL(20,8) (double->decimal
    casts cannot tie: a binary double exactly halfway between two
    k-digit decimals would need a 5^k factor in its denominator —
    impossible — so both engines round to the same nearest decimal;
    parity additionally verified on 4k random doubles), and
    accumulates A^T-side sums as EXACT decimal products
    (DECIMAL(12,6)-snapped e_i times dd, summed order-independently),
    routed to double via the VARCHAR cast. Normalization is a 1-row
    index-ordered fold. So the only row-order-dependent operation in
    the whole pipeline is inside exact decimal arithmetic.

    Scale shape: per iteration ONE corpus pass — the {DIM}-vector is a
    broadcast 1-row relation, the A^T sums are one partial+final
    aggregate of {DIM} decimal columns; no driver collect, no shuffle
    beyond the aggregate. At 100 TB this is the textbook distributed
    matvec; more components = deflate and repeat.

    Reference scope: similarity-search north star (SURVEY.md S2c) —
    the spectral member of the embedding family (quantize, random
    projection, matryoshka, k-center, now PCA)."""
    emb = load(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("e"))
    v = spark.range(1).select(
        F.array_repeat(F.lit(EIG_V0), DIM).alias("varr"))
    for _ in range(EIG_ITERS - 1):
        v = _power_iteration_once(emb, v).select("varr")
    final = _power_iteration_once(emb, v)
    return (final.select("nrm", F.posexplode("varr")
                         .alias("pos", "loading"))
            .select((F.col("pos") + 1).cast("bigint").alias("dim"),
                    (F.round("loading", 9) + 0.0).alias("loading"),
                    (F.round("nrm", 6) + 0.0).alias("eigval")))
