"""Generate sf1 scale-probe fixtures (10x sf0.1) for the heavy rows.

/root/testdata is read-only and tops out at sf0.1, but the 100 TB claims
rest on how plans SCALE, not on one timing — so this derives a
deterministic sf1 from sf0.1 for the tables the heavy rows consume
(documents, embeddings) and copies the rest verbatim.

Construction (seedless, pure function of sf0.1 bytes):
- documents: 10 replicas. Replica 0 is sf0.1 verbatim; replica r>0 gets
  doc_id += r*10_000_000 and every 4th word tagged with the replica id.
  The tag perturbs ~25% of unigrams (and a larger share of shingles), so
  CROSS-replica near-duplicate pairs are rare while each replica keeps
  sf0.1's internal dup/near-dup cluster structure intact — i.e. the
  near-dup pair count scales ~linearly with corpus size, which is the
  honest scaling shape for these probes (naive 10x copying would give
  every doc 10 exact twins and inflate pair counts quadratically,
  measuring fixture degeneracy instead of plan scaling).
- embeddings: 10 replicas. Replica 0 verbatim (keeps the vec_id <
  N_CENTROIDS seed rows); replica r>0 gets vec_id += r*10_000_000 and a
  per-(replica, dim) deterministic +/-3e-3 nudge so no exact-duplicate
  vectors are introduced.
- all other tables: copied from sf0.1 unchanged (the probed rows do not
  read them; they exist so loaders that touch them don't 404).

Usage: python tools/make_sf1.py [OUT_DIR]   (default /root/repo/.sf1)
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
ID_STRIDE = 10_000_000


def _tag_words(text: str, r: int) -> str:
    words = text.split(" ")
    return " ".join(
        f"{w}r{r}" if i % 4 == 0 else w for i, w in enumerate(words))


def build_documents(out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(t)
            continue
        new_text = [_tag_words(s, r) for s in text]
        parts.append(pa.table({
            "doc_id": pa.array(doc_id + r * ID_STRIDE, type=pa.int64()),
            "text": pa.array(new_text, type=pa.string()),
            "lang": lang,
            "source": source,
            "n_chars": pa.array([len(s) for s in new_text],
                                type=pa.int64()),
        }))
    full = pa.concat_tables(parts)
    pq.write_table(full, f"{out_dir}/documents.parquet")
    return full.num_rows


def build_embeddings(out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label")
    dim = emb.shape[1]
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(t)
            continue
        nudge = (((r * 31 + np.arange(dim)) % 7) - 3).astype(np.float32) * 1e-3
        pert = emb + nudge[None, :]
        parts.append(pa.table({
            "vec_id": pa.array(vec_id + r * ID_STRIDE, type=pa.int64()),
            "embedding": pa.array(list(pert), type=pa.list_(pa.float32())),
            "label": label,
        }))
    full = pa.concat_tables(parts)
    pq.write_table(full, f"{out_dir}/embeddings.parquet")
    return full.num_rows


def build_events(out_dir: str) -> int:
    """10x events for the STREAMING scale probe (r12 verdict #1): each
    replica keeps sf0.1's timestamp distribution (the window/session/
    watermark gates depend on its shape) but gets a disjoint event_id
    range, shifted user_ids (so per-key state cardinality scales 10x —
    the dimension that stresses a state store), and a per-replica
    microsecond nudge so no two replicas are byte-identical."""
    t = pq.read_table(f"{SRC}/events.parquet")
    event_id = t.column("event_id").to_numpy()
    ts = t.column("ts").cast(pa.timestamp("us")).to_numpy()
    user_id = t.column("user_id").to_numpy()
    etype = t.column("event_type")
    value = t.column("value").to_numpy()
    props = t.column("props")
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(pa.table({
                "event_id": t.column("event_id"),
                "ts": t.column("ts").cast(pa.timestamp("us")),
                "user_id": t.column("user_id"),
                "event_type": etype, "value": t.column("value"),
                "props": props}))
            continue
        parts.append(pa.table({
            "event_id": pa.array(event_id + r * ID_STRIDE,
                                 type=pa.int64()),
            "ts": pa.array(ts + np.timedelta64(r, "us")),
            "user_id": pa.array(user_id + r * ID_STRIDE,
                                 type=pa.int64()),
            "event_type": etype,
            "value": pa.array(value + r * 1e-3, type=pa.float64()),
            "props": props,
        }))
    full = pa.concat_tables(parts)
    pq.write_table(full, f"{out_dir}/events.parquet")
    return full.num_rows


def build_part(out_dir: str) -> int:
    """10x part for the fuzzy-dedup scale probes: disjoint p_partkey
    ranges, names UNCHANGED — record count grows while the name
    vocabulary stays fixed, which is exactly the saturation shape that
    separates the blocked row (per-block pairs grow quadratically) from
    the capped/SNM row (work stays linear by construction)."""
    t = pq.read_table(f"{SRC}/part.parquet")
    key = t.column("p_partkey").to_numpy()
    parts = []
    for r in range(REPLICAS):
        if r == 0:
            parts.append(t)
            continue
        cols = {name: t.column(name) for name in t.column_names}
        cols["p_partkey"] = pa.array(key + r * ID_STRIDE, type=pa.int64())
        parts.append(pa.table(cols))
    full = pa.concat_tables(parts)
    pq.write_table(full, f"{out_dir}/part.parquet")
    return full.num_rows


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    os.makedirs(out_dir, exist_ok=True)
    nd = build_documents(out_dir)
    ne = build_embeddings(out_dir)
    nev = build_events(out_dir)
    np_ = build_part(out_dir)
    for name in ("region", "nation", "customer", "supplier",
                 "orders", "lineitem"):
        shutil.copyfile(f"{SRC}/{name}.parquet",
                        f"{out_dir}/{name}.parquet")
    print(f"wrote {out_dir}: documents={nd} embeddings={ne} events={nev} "
          f"part={np_} (+6 tables copied from sf0.1)")


if __name__ == "__main__":
    main()
