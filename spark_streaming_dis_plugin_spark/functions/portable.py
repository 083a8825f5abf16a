"""Cross-engine-deterministic expression helpers.

Operators that hash, tokenize, or fold floats must produce *bit-identical*
results in Spark and in the DuckDB oracle, or the driver's value-hash
comparison fails spuriously. These helpers define one semantics and emit it
for both engines:

- ``portable_hash`` — md5 -> top 15 hex chars -> BIGINT (60 bits, positive).
  Used wherever the engine needs a content hash whose value is asserted
  (MinHash signatures, fingerprints, bucket ids). The *scale* path for
  non-asserted hashing is Spark's built-in ``xxhash64`` (faster, 64-bit);
  operators take a ``portable=`` flag to pick.
- ``tokens`` / ``shingles`` — one tokenizer definition shared by text
  analysis and dedup.
- decimal-cast float aggregation — ``SUM(CAST(x AS DECIMAL))`` is exact and
  order-independent in both engines; cast the final sum back to DOUBLE and
  the result is bit-identical regardless of partitioning/merge order. This
  is also the right call at 100 TB: float sums that depend on partition
  order are not reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- hashing

def portable_hash(col: Column | str) -> Column:
    """Deterministic 60-bit positive BIGINT hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash_sql(expr: str) -> str:
    """DuckDB fragment computing the identical hash."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def portable_hash_py(s: str) -> int:
    """Pure-Python twin of :func:`portable_hash` — same md5/60-bit value.
    Used where hashing happens outside a Spark plan (e.g. producer-side
    key->partition routing in the dis writer)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash_value(h: Column, a: int, b: int, prime: int) -> Column:
    """One universal-hash family member g_i(x) = (a*h(x) + b) mod prime."""
    return (h % prime * a + b) % prime


def minhash_value_sql(hexpr: str, a: int, b: int, prime: int) -> str:
    return f"((({hexpr}) % {prime} * {a} + {b}) % {prime})"


# ------------------------------------------------------------ tokenization

TOKEN_SPLIT_RE = "[^a-zA-Z0-9_]+"


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens; empty strings filtered."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return (f"list_filter(string_split_regex(lower({expr}), "
            f"'{TOKEN_SPLIT_RE}'), t -> t != '')")


_SLICE_REST = 1 << 30  # "to the end" length for F.slice


def word_shingles(tokens_col: Column | str, n: int) -> Column:
    """Distinct n-word shingles (space-joined) from a token array column.

    Built as a chain of zip_with against shifted copies of the array, NOT
    as transform(idx, i -> slice(toks, i, n)): a lambda body may only
    reference its lambda variables. Any outer array expression referenced
    inside a higher-order-function lambda is re-evaluated once PER ELEMENT
    (and CollapseProject happily inlines "materialized" columns back into
    lambdas), which turns shingling into O(len^2) work per document —
    measured 47ms/doc vs ~1ms/doc on the fixture. zip_with sources are
    evaluated once, so this form is safe no matter how Catalyst rewrites
    the surrounding projections.

    Trailing positions (where the shifted copy runs out) null-propagate
    through concat and are filtered."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    cur = toks
    for k in range(2, n + 1):
        shifted = F.slice(toks, k, _SLICE_REST)
        cur = F.zip_with(cur, shifted,
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(cur, lambda s: s.isNotNull()))


def word_gram_positions(tokens_col: Column | str, n: int) -> Column:
    """Position-aligned n-word grams: element ``i`` (0-based) of the
    returned array is the space-joined gram starting at token ``i``; the
    trailing ``n-1`` slots null-propagate (callers posexplode + filter).
    Unlike :func:`word_shingles` this keeps ORDER and MULTIPLICITY — the
    shape duplicated-substring-span detection needs. Same zip_with-chain
    discipline (never reference an outer array inside a HOF lambda)."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    cur = toks
    for k in range(2, n + 1):
        shifted = F.slice(toks, k, _SLICE_REST)
        cur = F.zip_with(cur, shifted,
                         lambda a, b: F.concat(a, F.lit(" "), b))
    return cur


def word_shingles_sql(expr: str, n: int) -> str:
    toks = tokens_sql(expr)
    return (
        f"list_distinct(list_transform("
        f"  range(1, greatest(len({toks}) - {n - 1}, 0) + 1),"
        f"  i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


# ------------------------------------------------------------- vector math

def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float/double> columns, accumulated in double
    with a left fold (deterministic element order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def dot_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
            f"(acc, x) -> acc + x)")


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def round_half_up(x: float, ndigits: int) -> float:
    """Decimal HALF_UP rounding of a double — the exact semantics of
    Spark's ``F.round`` on DOUBLE (``BigDecimal.valueOf(double)`` takes the
    shortest decimal repr, then ``setScale(ndigits, HALF_UP)``). Python
    kernels that emit rounded scores (MMR rerank, k-center, the TWS z-score
    gate) use this instead of the built-in ``round()``: the built-in is
    correctly-rounded half-EVEN on the binary double and can differ by one
    ulp from the engines' rounding for values adjacent to a decimal
    midpoint, breaking the F.round-vs-DuckDB-round pairing the engine-side
    rows rely on (r8 ADVICE #3)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


# ------------------------------------------------- exact float aggregation

def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent, cross-engine-exact sum of a double column:
    per-row cast to DECIMAL(30-ish, scale), exact decimal sum, final cast
    back to DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(27,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 4) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"
