"""Arrow-batched (pandas_udf) vector math — the wide-vector fast path.

functions/portable.dot is JVM-side array-lambda code: ideal up to a few
hundred dimensions because it never leaves codegen. Beyond that, one Arrow
transfer + a numpy matmul per batch wins (SIMD, no per-element expression
interpretation). Same operator topology as operators/similarity.py — only
the kernel changes, so at 100 TB you pick per-column-width.

Numerics: numpy uses pairwise summation while the JVM fold is sequential;
results differ in the last ulps, so pandas-path queries share the oracle
only through round(4) (asserted in tests to agree with the JVM path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine similarity of two array<float> columns, one Arrow batch at a
    time. Stacks ragged lists into a matrix when widths agree (the common
    case) for a single BLAS call per batch."""
    import numpy as np

    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb, dtype=np.float64)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma, dtype=np.float64))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb, dtype=np.float64))
    return pd.Series(dots / (na * nb))


def cosine_vectorized(a: Column, b: Column) -> Column:
    return cosine_pandas(a, b)
