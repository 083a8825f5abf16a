"""Unit tests for the dHash perceptual-hash kernel — pure pandas/numpy,
no SparkSession (the Spark plumbing + oracle equality are covered by the
declared rows multimodal_image_dhash / multimodal_image_neardup)."""

from __future__ import annotations

import pandas as pd

from spark_streaming_dis_plugin_spark.operators.multimodal import (
    DHASH_BITS,
    DHASH_CELLS,
    DHASH_GRID,
    dhash_kernel,
)


def _run(payloads):
    pdf = pd.DataFrame({"doc_id": list(range(len(payloads))),
                        "payload": payloads})
    out = list(dhash_kernel(iter([pdf])))
    return pd.concat(out) if out else pd.DataFrame(
        columns=["doc_id", "dhash"])


def test_small_payload_yields_no_row():
    out = _run([b"x" * (DHASH_CELLS - 1)])
    assert len(out) == 0


def test_known_gradient_pattern():
    # 64 bytes ascending: with blk=1 every cell < its right neighbor, so
    # all 56 gradient bits set.
    out = _run([bytes(range(DHASH_CELLS))])
    assert out["dhash"].iloc[0] == (1 << DHASH_BITS) - 1
    # strictly descending: no bit set
    out = _run([bytes(range(DHASH_CELLS - 1, -1, -1))])
    assert out["dhash"].iloc[0] == 0


def test_single_bit_position():
    # flat payload except cell (row 2, col 5) < cell (row 2, col 6):
    # exactly bit r*(GRID-1)+c = 2*7+5 = 19 is set.
    data = bytearray([10] * DHASH_CELLS)
    data[2 * DHASH_GRID + 6] = 11     # right neighbor strictly larger
    out = _run([bytes(data)])
    assert out["dhash"].iloc[0] == 1 << (2 * (DHASH_GRID - 1) + 5)


def test_block_sums_drive_bits_not_raw_bytes():
    # blk=2: cell value is the SUM of its 2-byte block. Construct cells
    # where individual bytes would compare one way but block sums the
    # other: cell0 = (100, 0)=100, cell1 = (99, 99)=198 -> bit 0 SET
    # even though the first byte decreases.
    data = bytearray([50, 50] * DHASH_CELLS)
    data[0:2] = bytes([100, 0])
    data[2:4] = bytes([99, 99])
    out = _run([bytes(data)])
    assert int(out["dhash"].iloc[0]) & 1 == 1


def test_near_identical_payloads_small_hamming():
    # one perturbed byte moves one block sum slightly: hashes differ by
    # at most the 2 gradient bits adjacent to that cell.
    base = bytes(range(256)) * 2                      # 512 bytes, blk=8
    mutated = bytearray(base)
    mutated[100] = (mutated[100] + 3) % 256
    out = _run([base, bytes(mutated)])
    a, b = int(out["dhash"].iloc[0]), int(out["dhash"].iloc[1])
    assert bin(a ^ b).count("1") <= 2


def test_dhash_banding_is_lossless(spark, sf_dir):
    """The dHash near-dup row's algorithmic claim: 4 x 14-bit pigeonhole
    bands surface EVERY pair within hamming <= 3 over the 56-bit
    signatures, so the banded pipeline equals brute-force all-pairs
    hamming (the same losslessness contract as SimHash's banding)."""
    from pyspark.sql import functions as F

    from spark_streaming_dis_plugin_spark.operators.multimodal import (
        DHASH_HAMMING_MAX,
        multimodal_image_dhash,
        multimodal_image_neardup,
    )

    banded = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal_image_neardup(spark, sf_dir).collect())
    sig = multimodal_image_dhash(spark, sf_dir)
    a = sig.select(F.col("doc_id").alias("doc_a"),
                   F.col("dhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"),
                   F.col("dhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    brute = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in (a.join(b, F.col("doc_a") < F.col("doc_b"))
                  .where(ham <= DHASH_HAMMING_MAX)
                  .select("doc_a", "doc_b",
                          ham.cast("int").alias("hamming")).collect()))
    assert banded == brute
