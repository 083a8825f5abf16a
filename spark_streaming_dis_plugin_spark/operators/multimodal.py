"""Multimodal columns (SURVEY.md §2c): opaque binary payloads with typed
metadata, processed by Arrow-batched Pandas functions over mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked); everything Spark-side is real and
tested: binary column schema, metadata extraction, Arrow batch shapes,
partition-parallel mapInPandas plumbing (tests/test_multimodal.py).

At 100 TB: binary payloads stay columnar in parquet (never hit the JVM
heap as strings), decode fans out per input split, and frame-sampling /
resizing emit one row per artifact (flatMap-shaped mapInPandas).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import load

ARTIFACT_SCHEMA = ("doc_id bigint, payload binary, media_type string, "
                   "byte_len bigint")

DECODED_SCHEMA = ("doc_id bigint, media_type string, byte_len bigint, "
                  "fake_width int, fake_height int, checksum string")


def artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a multimodal artifact table from documents: payload is the
    UTF-8 bytes of the text (standing in for image/audio bytes), with a
    deterministic media_type. Real pipelines read this shape straight from
    parquet (payload as BINARY column)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
         .when(F.col("doc_id") % 3 == 1, "audio/wav")
         .otherwise("video/mp4").alias("media_type"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint")
         .alias("byte_len"))


def decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decode: the real implementation would call PIL/librosa/ffmpeg
    here — not present in this container. Emits deterministic fake
    dimensions derived from the payload so the plumbing (Arrow batches in,
    typed rows out, partition-parallel) is fully exercised.
    """
    import hashlib

    for pdf in batches:
        if len(pdf) == 0:
            continue
        payloads = pdf["payload"]
        checksums = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
        byte_lens = payloads.map(len).astype("int64")
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "byte_len": byte_lens,
            # deterministic fake decode — replace with real codec output
            "fake_width": (byte_lens % 1920 + 1).astype("int32"),
            "fake_height": (byte_lens % 1080 + 1).astype("int32"),
            "checksum": checksums,
        })


def decode(df: DataFrame) -> DataFrame:
    """Partition-parallel decode over Arrow batches (mapInPandas)."""
    return df.mapInPandas(decode_stub, schema=DECODED_SCHEMA)


FRAME_BYTES = 16     # stub "frame" size within the payload
FRAME_STRIDE = 4     # sample every 4th frame

FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def frame_sample_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler (flatMap shape: one input artifact -> many
    frames). A real implementation seeks keyframes with ffmpeg; the stub
    slices the payload into FRAME_BYTES chunks and keeps every
    FRAME_STRIDE-th — deterministic, so the oracle reproduces each
    sampled frame's checksum. The Spark-side contract being exercised is
    the real one: Arrow batches in, a *different, longer* typed relation
    out, partition-parallel."""
    import hashlib

    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            n_frames = len(data) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                chunk = data[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        if rows["doc_id"]:
            yield pd.DataFrame(rows)


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH video AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
    ), idx AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(octet_length(encode(text))
                    // {FRAME_BYTES} AS BIGINT), {FRAME_STRIDE})) AS frame_idx
      FROM video
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT),
               {FRAME_BYTES})) AS frame_md5
    FROM idx
    """,
    tags=("multimodal", "frame-sample"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video artifacts: mapInPandas in flatMap shape —
    each binary payload expands to one row per sampled frame. The oracle
    reconstructs every sampled frame checksum (payloads are UTF-8 text in
    the fixture, so byte slices == character slices), pinning offsets,
    stride, and per-frame hashing exactly."""
    art = artifacts(spark, sf_dir).where(F.col("media_type") == "video/mp4")
    return art.mapInPandas(frame_sample_stub, schema=FRAMES_SCHEMA)


N_HIST_BINS = 16

FEATURES_SCHEMA = ("doc_id bigint, " +
                   ", ".join(f"h{i} bigint" for i in range(N_HIST_BINS)))


def byte_histogram_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL (not stub) feature extraction: 16-bin byte-value histogram per
    payload, vectorized with numpy over Arrow batches — the shape of any
    binary feature extractor (spectrograms, pixel stats) minus the codec."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        out = {"doc_id": pdf["doc_id"]}
        hist = np.stack([
            np.bincount(np.frombuffer(bytes(b), dtype=np.uint8) // 16,
                        minlength=N_HIST_BINS)[:N_HIST_BINS]
            for b in pdf["payload"]])
        for i in range(N_HIST_BINS):
            out[f"h{i}"] = hist[:, i].astype("int64")
        yield pd.DataFrame(out)


def _hist_bins_sql() -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS BIGINT) AS h{i}"
        for i in range(N_HIST_BINS))


@register(
    "multimodal_byte_histogram",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0
    ), binned AS (
      SELECT doc_id, unicode(ch) // 16 AS bin FROM chars
    )
    SELECT doc_id, {_hist_bins_sql()}
    FROM binned GROUP BY doc_id
    """,
    tags=("multimodal", "features", "pandas-udf"))
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction over multimodal payloads: per-artifact
    16-bin byte-value histogram, computed with a numpy-vectorized
    mapInPandas kernel — unlike decode_stub this is REAL computation the
    oracle reproduces (payloads are ASCII text bytes in the fixture, so
    character code points == bytes). The contract exercised is the
    production one: binary column in, fixed-width numeric feature vector
    out, partition-parallel, no driver involvement."""
    art = artifacts(spark, sf_dir).where(F.col("byte_len") > 0)
    return art.select("doc_id", "payload") \
        .mapInPandas(byte_histogram_kernel, schema=FEATURES_SCHEMA)


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum,
           CAST(octet_length(encode(text)) % 1920 + 1 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 1080 + 1 AS INT) AS fake_height
    FROM documents
    """,
    tags=("multimodal",))
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads, including the decode
    stub's deterministic outputs — the oracle reproduces the stub exactly,
    proving the mapInPandas path computes what it claims. (The JVM-side
    twin of decode() — same math as Column expressions — would be the
    production fast path only when the 'decode' is trivial; real codecs
    need the Pandas path.)"""
    art = artifacts(spark, sf_dir)
    decoded = decode(art)
    return decoded.select(
        "doc_id", "media_type", "byte_len", "checksum",
        "fake_width", "fake_height")


# ------------------------------------------------ raw-PCM audio energy

PCM_FRAME = 256          # samples per analysis frame

PCM_SCHEMA = ("doc_id bigint, n_samples bigint, n_frames bigint, "
              "total_energy bigint, max_frame_energy bigint")


def pcm_energy_kernel(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
    """REAL DSP kernel (no codec needed — raw PCM is codec-free):
    interpret each payload as little-endian signed 16-bit PCM, square
    into int64, and reduce per 256-sample frame with numpy over the
    Arrow batch. This is the production shape for audio feature
    extraction at scale: vectorized numpy on binary columns, one pass,
    flat per-artifact outputs."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            buf = buf[: len(buf) // 2 * 2]
            s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
            sq = s * s
            n = len(s)
            if n == 0:
                # A payload under 2 bytes decodes to zero samples: emit no
                # row, matching the oracle (which derives rows only from
                # byte PAIRS) — an all-zero row here would diverge.
                continue
            n_frames = -(-n // PCM_FRAME) if n else 0
            frame_sums = [int(sq[i * PCM_FRAME:(i + 1) * PCM_FRAME].sum())
                          for i in range(n_frames)]
            rows.append((int(doc_id), n, n_frames, int(sq.sum()),
                         max(frame_sums) if frame_sums else 0))
        yield pd.DataFrame(rows, columns=["doc_id", "n_samples", "n_frames",
                                          "total_energy",
                                          "max_frame_energy"])


@register(
    "multimodal_pcm_energy",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, i,
             CAST((i - 1) // {PCM_FRAME} AS BIGINT) AS frame,
             (ascii(substr(text, 2*i - 1, 1))
              + 256 * ascii(substr(text, 2*i, 1))) AS u
      FROM documents, LATERAL (
        SELECT unnest(range(1, length(text) // 2 + 1)) AS i)
    ),
    samp AS (
      -- signed-int16 reconstruction: the kernel reads '<i2', so a high
      -- byte >= 128 means a negative sample (u - 65536). The corpus is
      -- ASCII today (high byte <= 127, branch never taken) but the
      -- oracle must match the kernel's signedness, not the corpus.
      SELECT doc_id, i, frame,
             CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
      FROM raw
    ),
    frames AS (
      SELECT doc_id, frame, CAST(SUM(s * s) AS BIGINT) AS fe
      FROM samp GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(COUNT(DISTINCT frame) AS BIGINT) AS n_frames,
           CAST(SUM(s * s) AS BIGINT) AS total_energy,
           (SELECT MAX(fe) FROM frames f WHERE f.doc_id = samp.doc_id)
             AS max_frame_energy
    FROM samp GROUP BY doc_id
    """,
    tags=("multimodal", "audio", "pcm", "pandas-kernel"))
def multimodal_pcm_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio FEATURE EXTRACTION on raw bytes — unlike the decode stub,
    this kernel is fully REAL: raw PCM16 needs no codec, so the numpy
    frame-energy reduction (square -> 256-sample frame sums -> total and
    peak energy) is the actual production computation, exercised
    end-to-end over Arrow-batched binary columns via mapInPandas.

    The oracle re-derives the same int16 samples arithmetically from the
    payload's source bytes, with an explicit signed-int16 CASE so values
    with a high byte >= 128 reconstruct as negative, matching the
    kernel's '<i2' view. Remaining documented assumption: substr() is
    character-positional, so the oracle is byte-exact only while the
    corpus text is single-byte (ASCII) — which the generated documents
    table is; a multi-byte corpus would need an oracle over
    encode(text). All outputs are exact int64 sums, no float anywhere.
    Payloads under 2 bytes yield zero samples and NO row on either side.

    Scale shape: map-only (zero shuffles), one numpy pass per Arrow
    batch, output rows are 5 scalars per artifact regardless of payload
    size — the binary column never leaves the scan+map stage."""
    art = artifacts(spark, sf_dir).select("doc_id", "payload")
    para = spark.sparkContext.defaultParallelism
    return art.repartition(para).mapInPandas(pcm_energy_kernel,
                                             schema=PCM_SCHEMA)


# --------------------------------------------- frame-fingerprint dedup

@register(
    "multimodal_video_dedup",
    oracle=f"""
    WITH video AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
    ), idx AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(octet_length(encode(text))
                    // {FRAME_BYTES} AS BIGINT), {FRAME_STRIDE})) AS frame_idx
      FROM video
    ), frames AS (
      SELECT doc_id, frame_idx,
             md5(substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS INT),
                 {FRAME_BYTES})) AS fmd5
      FROM idx
    ), fp AS (
      SELECT doc_id,
             md5(string_agg(fmd5, ':' ORDER BY frame_idx)) AS fingerprint
      FROM frames GROUP BY doc_id
    ), g AS (
      SELECT fingerprint, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc
      FROM fp GROUP BY 1
    )
    SELECT f.doc_id, f.fingerprint, g.canonical_doc, g.n_copies
    FROM fp f JOIN g USING (fingerprint)
    """,
    tags=("multimodal", "dedup", "fingerprint"))
def multimodal_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIMODAL DEDUP by content fingerprint — the video-pipeline
    equivalent of exact text dedup: two artifacts are duplicates iff
    their SAMPLED FRAME SEQUENCES hash identically (full-payload hashing
    would re-read every byte; frame sampling is the standard shortcut
    and this row pins that the sampled fingerprint is computed
    consistently end-to-end). Composition: the frame-sample kernel
    (mapInPandas over binary payloads) -> per-artifact ordered frame-hash
    digest -> hash-group accounting with a canonical (min doc_id)
    survivor per group.

    Scale shape: frames never leave their partition until reduced to one
    32-char digest per artifact (the only shuffled payload); the group
    accounting shuffles doc-level digests only. Artifacts too small to
    yield a frame are excluded on both sides (no fingerprint to
    compare). The oracle reconstructs every frame hash arithmetically
    (fixture payloads are ASCII text)."""
    art = artifacts(spark, sf_dir).where(F.col("media_type") == "video/mp4")
    frames = art.mapInPandas(frame_sample_stub, schema=FRAMES_SCHEMA)
    fp = (frames.groupBy("doc_id")
          .agg(F.md5(F.array_join(
              F.transform(
                  F.array_sort(F.collect_list(
                      F.struct("frame_idx", "frame_md5"))),
                  lambda s: s.frame_md5), ":").cast("binary"))
               .alias("fingerprint")))
    g = (fp.groupBy("fingerprint")
         .agg(F.count(F.lit(1)).alias("n_copies"),
              F.min("doc_id").alias("canonical_doc")))
    return (fp.join(g, "fingerprint")
            .select("doc_id", "fingerprint", "canonical_doc", "n_copies"))


# ------------------------------------- image perceptual near-dup (dHash)

DHASH_GRID = 8            # 8x8 downsample grid
DHASH_CELLS = DHASH_GRID * DHASH_GRID
DHASH_BITS = DHASH_GRID * (DHASH_GRID - 1)   # 56: row-adjacent gradients
DHASH_BAND_BITS = 14      # 4 x 14-bit pigeonhole bands
DHASH_N_BANDS = DHASH_BITS // DHASH_BAND_BITS
DHASH_HAMMING_MAX = 3     # 4 bands: lossless for hamming <= 3

DHASH_SCHEMA = "doc_id bigint, dhash bigint"


def dhash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL perceptual-hash kernel over raw bytes (r6 verdict ask #5) —
    dHash minus the codec: downsample the payload into an 8x8 grid of
    block sums (the stand-in for resize-to-grayscale; a real deployment
    decodes with PIL first — that step alone is the stub), then emit one
    bit per row-adjacent gradient (cell < right neighbor). 56 bits, not
    the classic 9x8=64, so every signature and the oracle's 2**bit
    arithmetic stay inside signed BIGINT — same portability choice as
    SIMHASH_BITS=16. numpy-vectorized per Arrow batch; payloads under one
    byte per cell yield no row (no grid to compare) on either side."""
    import numpy as np

    for pdf in batches:
        ids, hashes = [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            blk = len(data) // DHASH_CELLS
            if blk == 0:
                continue
            grid = (np.frombuffer(data[:DHASH_CELLS * blk], dtype=np.uint8)
                    .astype(np.int64).reshape(DHASH_CELLS, blk).sum(axis=1)
                    .reshape(DHASH_GRID, DHASH_GRID))
            bits = grid[:, :-1] < grid[:, 1:]
            weights = (1 << np.arange(DHASH_BITS, dtype=np.int64)).reshape(
                DHASH_GRID, DHASH_GRID - 1)
            ids.append(int(doc_id))
            hashes.append(int((bits * weights).sum()))
        if ids:
            yield pd.DataFrame({"doc_id": ids, "dhash": hashes})


def _dhash_sig_sql() -> str:
    """DuckDB CTE body reconstructing every dHash arithmetically from the
    fixture's ASCII payload bytes (substr is character-positional ==
    byte-positional for ASCII, the multimodal_pcm_energy caveat)."""
    return f"""
    img AS (
      SELECT doc_id, text, octet_length(encode(text)) // {DHASH_CELLS} AS blk
      FROM documents
      WHERE doc_id % 3 = 0
        AND octet_length(encode(text)) >= {DHASH_CELLS}
    ),
    cells AS (
      SELECT doc_id, cell,
             SUM(ascii(substr(text, CAST(cell * blk + i AS INT), 1))) AS v
      FROM img,
           LATERAL (SELECT unnest(range(0, {DHASH_CELLS})) AS cell),
           LATERAL (SELECT unnest(range(1, blk + 1)) AS i)
      GROUP BY 1, 2
    ),
    bits AS (
      SELECT a.doc_id,
             (a.cell // {DHASH_GRID}) * {DHASH_GRID - 1}
               + (a.cell % {DHASH_GRID}) AS bit
      FROM cells a JOIN cells b
        ON a.doc_id = b.doc_id AND b.cell = a.cell + 1
      WHERE a.cell % {DHASH_GRID} < {DHASH_GRID - 1} AND a.v < b.v
    ),
    sig AS (
      SELECT i.doc_id,
             CAST(COALESCE(SUM(CAST(2 ** bit AS BIGINT)), 0) AS BIGINT)
               AS dhash
      FROM img i LEFT JOIN bits USING (doc_id)
      GROUP BY i.doc_id
    )"""


@register(
    "multimodal_image_dhash",
    oracle=f"""
    WITH {_dhash_sig_sql()}
    SELECT doc_id, dhash FROM sig
    """,
    tags=("multimodal", "image", "dhash", "pandas-kernel"))
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image perceptual hash (dHash) over binary payloads: block-sum
    downsample to an 8x8 grid, one bit per horizontal gradient — robust
    to small byte-level perturbations (a changed byte moves one block sum
    slightly; most gradient signs survive), which is exactly the
    invariance class perceptual near-dup needs and exact hashing lacks.

    Scale shape: map-only mapInPandas over Arrow batches — the payload
    never leaves its scan partition; output is 16 bytes per image. The
    oracle reconstructs every block sum and gradient bit arithmetically
    from the fixture bytes (see _dhash_sig_sql)."""
    art = artifacts(spark, sf_dir).where(
        (F.col("media_type") == "image/png")
        & (F.col("byte_len") >= DHASH_CELLS))
    para = spark.sparkContext.defaultParallelism
    return (art.select("doc_id", "payload").repartition(para)
            .mapInPandas(dhash_kernel, schema=DHASH_SCHEMA))


@register(
    "multimodal_image_neardup",
    oracle=f"""
    WITH {_dhash_sig_sql()},
    bands AS (
      SELECT doc_id, dhash, band,
             (dhash >> CAST(band * {DHASH_BAND_BITS} AS INT))
               & {(1 << DHASH_BAND_BITS) - 1} AS bv
      FROM sig, LATERAL (SELECT unnest(range(0, {DHASH_N_BANDS})) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.dhash AS ha, b.dhash AS hb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {DHASH_HAMMING_MAX}
    """,
    tags=("multimodal", "image", "dhash", "near-dup"))
def multimodal_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE PERCEPTUAL NEAR-DUP (r6 verdict ask #5): dHash signatures
    banded into 4 x 14-bit keys — by
    pigeonhole, any pair within hamming <= 3 agrees
    exactly on >= 1 band, so the candidate equi-join is lossless for the
    threshold; verification is one bit_count(xor). Identical bucketed
    topology to dedup_simhash64_pairs (dedup.py): signature scan ->
    explode band keys -> band-bucket self-join -> cheap integer verify —
    never an all-pairs comparison, and the join shuffles only
    (band, 14-bit value, 8-byte hash) rows, not payloads. The fixture's
    near-dup texts produce hamming-0 collisions at sf0.01 (3 pairs), so
    the row is non-vacuous and the oracle reconstructs every pair."""
    sig = multimodal_image_dhash(spark, sf_dir)
    band_structs = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftright("dhash", i * DHASH_BAND_BITS)
                  .bitwiseAND(F.lit((1 << DHASH_BAND_BITS) - 1)).alias("bv"))
        for i in range(DHASH_N_BANDS)])
    bands = (sig.select("doc_id", "dhash",
                        F.explode(band_structs).alias("b"))
             .select("doc_id", "dhash", "b.band", "b.bv"))
    ba, bb = bands.alias("a"), bands.alias("b")
    cand = (ba.join(bb, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bv") == F.col("b.bv"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.dhash").alias("ha"),
                    F.col("b.dhash").alias("hb"))
            .distinct())
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.where(hamming <= DHASH_HAMMING_MAX)
            .select("doc_a", "doc_b", hamming.cast("int").alias("hamming")))


# ------------------------------------------- PCM activity segmentation

VAD_FRAME = 16                    # samples per VAD analysis frame
VAD_THRESHOLD = 10_300_000_000    # frame-energy gate (int64, exact)

VAD_FRAME_SCHEMA = "doc_id bigint, frame bigint, fe bigint"


def pcm_frame_energy_kernel(batches: Iterator[pd.DataFrame]
                            ) -> Iterator[pd.DataFrame]:
    """Per-frame PCM16 energy rows (doc_id, frame, fe): the same '<i2'
    numpy view as pcm_energy_kernel, but emitting one row per
    VAD_FRAME-sample frame instead of per-artifact scalars, so the
    segmentation above it can run in the DataFrame layer."""
    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(payload)
            buf = buf[: len(buf) // 2 * 2]
            s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
            sq = s * s
            n = len(s)
            n_frames = -(-n // VAD_FRAME) if n else 0
            rows.extend(
                (int(doc_id), i,
                 int(sq[i * VAD_FRAME:(i + 1) * VAD_FRAME].sum()))
                for i in range(n_frames))
        yield pd.DataFrame(rows, columns=["doc_id", "frame", "fe"])


@register(
    "audio_vad_segments",
    oracle=f"""
    WITH audio AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1
    ), raw AS (
      SELECT doc_id, i,
             CAST((i - 1) // {VAD_FRAME} AS BIGINT) AS frame,
             (ascii(substr(text, 2*i - 1, 1))
              + 256 * ascii(substr(text, 2*i, 1))) AS u
      FROM audio, LATERAL (
        SELECT unnest(range(1, length(text) // 2 + 1)) AS i)
    ), samp AS (
      SELECT doc_id, frame,
             CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
      FROM raw
    ), frames AS (
      SELECT doc_id, frame, CAST(SUM(s * s) AS BIGINT) AS fe
      FROM samp GROUP BY 1, 2
    ), isl AS (
      SELECT doc_id, frame, fe,
             frame - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY frame) AS grp
      FROM frames WHERE fe > {VAD_THRESHOLD}
    ), seg AS (
      SELECT doc_id,
             CAST(MIN(frame) AS BIGINT) AS start_frame,
             CAST(MAX(frame) AS BIGINT) AS end_frame,
             CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(fe) AS BIGINT) AS seg_energy
      FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY start_frame) AS BIGINT) AS seg_id,
           start_frame, end_frame, n_frames, seg_energy
    FROM seg
    """,
    tags=("multimodal", "audio", "vad", "islands", "pandas-kernel"),
    bench=True)
def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-style segmentation over raw PCM16: frames whose
    energy clears a gate, merged into maximal consecutive runs
    (islands-and-gaps) with per-segment start/end/length/energy — the
    audio twin of sentence segmentation in a text pipeline, and the
    step that turns raw recordings into trainable utterance spans.

    Split of labor is deliberate: the numpy kernel (mapInPandas, '<i2'
    view, exact int64 frame sums — fully REAL, no codec needed) emits
    per-frame energy ROWS, and the merge runs in the DataFrame layer:
    island key = frame - row_number() over (doc, frame-order), then one
    aggregate per (doc, island). Unlike the per-artifact scalars of
    multimodal_pcm_energy, segmentation must NOT be kernel-local at
    production scale: long recordings land as multiple chunk rows, and
    only a distributed ordered window stitches active runs across chunk
    boundaries. Cost is ONE doc_id exchange — the island aggregate
    reuses the window's hash clustering (doc_id is a prefix of the
    (doc_id, grp) grouping, no second shuffle; frame rows are 3 ints,
    the payload itself never shuffles). Gate compare and energies are
    exact int64 everywhere — no float in the whole row.

    Oracle re-derives frames arithmetically from the payload's source
    bytes (same signed-int16 CASE and ASCII caveat as
    multimodal_pcm_energy) and mirrors the islands in SQL.
    """
    art = (artifacts(spark, sf_dir)
           .where(F.col("media_type") == "audio/wav")
           .select("doc_id", "payload"))
    para = spark.sparkContext.defaultParallelism
    frames = art.repartition(para).mapInPandas(pcm_frame_energy_kernel,
                                               schema=VAD_FRAME_SCHEMA)
    active = frames.where(F.col("fe") > F.lit(VAD_THRESHOLD))
    wi = Window.partitionBy("doc_id").orderBy("frame")
    isl = active.withColumn(
        "grp", F.col("frame") - F.row_number().over(wi))
    seg = (isl.groupBy("doc_id", "grp")
           .agg(F.min("frame").alias("start_frame"),
                F.max("frame").alias("end_frame"),
                F.count(F.lit(1)).alias("n_frames"),
                F.sum("fe").alias("seg_energy")))
    ws = Window.partitionBy("doc_id").orderBy("start_frame")
    return seg.select(
        "doc_id",
        F.row_number().over(ws).cast("bigint").alias("seg_id"),
        "start_frame", "end_frame", "n_frames", "seg_energy")


# --------------------------------------------- ViT-style tile extraction

TILE_ROW_BYTES = 16      # interpret payload as a 16-byte-wide grid
TILE_SIZE = 8            # 8x8 tiles (full tiles only, standard ViT crop)

TILE_SCHEMA = ("doc_id bigint, ty bigint, tx bigint, byte_sum bigint, "
               "byte_min bigint, byte_max bigint")


def image_tile_kernel(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
    """Patch extraction over binary payloads: view each payload as a
    TILE_ROW_BYTES-wide uint8 grid, crop to full TILE_SIZE bands, and
    reduce every TILE_SIZE x TILE_SIZE tile to exact int64 stats with
    one numpy reshape — the access pattern (not the pixels; see the
    decode-stub caveat) of ViT patchification at scale."""
    import numpy as np

    w, t = TILE_ROW_BYTES, TILE_SIZE
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            nrows = len(arr) // w
            bands = nrows // t
            if bands == 0:
                continue
            grid = arr[: bands * t * w].reshape(bands * t, w)
            for ty in range(bands):
                for tx in range(w // t):
                    tile = grid[ty * t:(ty + 1) * t,
                                tx * t:(tx + 1) * t].astype(np.int64)
                    rows.append((int(doc_id), ty, tx, int(tile.sum()),
                                 int(tile.min()), int(tile.max())))
        yield pd.DataFrame(rows, columns=["doc_id", "ty", "tx", "byte_sum",
                                          "byte_min", "byte_max"])


@register(
    "multimodal_image_tiles",
    oracle=f"""
    WITH img AS (
      SELECT doc_id, text,
             ((length(text) // {TILE_ROW_BYTES}) // {TILE_SIZE})
               * {TILE_SIZE} AS userows
      FROM documents WHERE doc_id % 3 = 0
    ), cells AS (
      SELECT doc_id,
             CAST((r - 1) // {TILE_SIZE} AS BIGINT) AS ty,
             CAST((c - 1) // {TILE_SIZE} AS BIGINT) AS tx,
             ascii(substr(text, (r - 1) * {TILE_ROW_BYTES} + c, 1)) AS b
      FROM img,
        LATERAL (SELECT unnest(range(1, userows + 1)) AS r),
        LATERAL (SELECT unnest(range(1, {TILE_ROW_BYTES} + 1)) AS c)
    )
    SELECT doc_id, ty, tx,
           CAST(SUM(b) AS BIGINT) AS byte_sum,
           CAST(MIN(b) AS BIGINT) AS byte_min,
           CAST(MAX(b) AS BIGINT) AS byte_max
    FROM cells GROUP BY 1, 2, 3
    """,
    tags=("multimodal", "image", "tiles", "pandas-kernel"))
def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style TILE/PATCH extraction: each image payload becomes a
    grid of {TILE_SIZE}x{TILE_SIZE} tiles (full tiles only) with exact
    per-tile int64 stats — the patchification step in front of any
    vision-transformer training pipeline, exercised end-to-end on the
    Spark side (Arrow batches in, one numpy reshape per artifact,
    typed tile rows out via mapInPandas).

    Same honesty split as the rest of the multimodal family: real
    codecs aren't in this container, so the "image" is the payload's
    raw byte grid (decode_stub documents the swap point); everything
    downstream of decode — schema, batching, reshape, per-tile
    reduction, output cardinality (rows per artifact scale with
    payload AREA, not corpus rows) — is the production shape. The
    oracle re-derives tiles arithmetically from the payload's source
    bytes (ASCII caveat as multimodal_pcm_energy).

    Scale shape: map-only, zero shuffles; the binary column dies at the
    scan+map stage and only 6 small ints per tile leave it."""
    art = (artifacts(spark, sf_dir)
           .where(F.col("media_type") == "image/png")
           .select("doc_id", "payload"))
    para = spark.sparkContext.defaultParallelism
    return art.repartition(para).mapInPandas(image_tile_kernel,
                                             schema=TILE_SCHEMA)
