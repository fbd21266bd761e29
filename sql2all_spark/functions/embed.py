"""Cross-engine embedding arithmetic shared by the similarity operators.

Dot products fold left-to-right over double-cast elements — the same
accumulation order in Spark (`F.aggregate`) and DuckDB (`list_reduce`), so
cosines agree bit-for-bit before the 6dp presentation rounding.  The LSH
hyperplanes use INTEGER components from a fixed seed: integer×double
products keep the two engines' dot products identical, where float literals
would need exact decimal→binary agreement in two SQL parsers.

Pulled out of ``operators/similarity.py`` so modules registered ahead of it
in the driver window (e.g. ``operators/embed_screen.py``) can share the
recipes without triggering similarity's query registrations at import time
(registration order is the driver-window contract — see ``registry.py``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 sign bits → 64 buckets: sized so test-SF buckets are non-empty (~8
# vectors per bucket at sf0.01).  At 100 TB you raise bits until bucket size
# fits one task's memory — the plan shape is unchanged.
N_PLANES = 6
DIM = 64
HYPERPLANES: list[list[int]] = (
    np.random.RandomState(42).randint(-9, 10, size=(N_PLANES, DIM)).tolist()
)


def dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {DIM} + 1),"
        f" i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_sql(a: str, b: str) -> str:
    return f"{dot_sql(a, b)} / (SQRT({dot_sql(a, a)}) * SQRT({dot_sql(b, b)}))"


def sign_bucket(emb: Column) -> Column:
    """Hyperplane-sign signature as a string like '0110...'."""
    bits = [
        F.when(
            dot(emb, F.array(*[F.lit(float(w)) for w in plane])) >= 0, "1"
        ).otherwise("0")
        for plane in HYPERPLANES
    ]
    return F.concat(*bits)


def sign_bucket_sql(emb: str) -> str:
    bits = []
    for plane in HYPERPLANES:
        lit = "[" + ",".join(f"{w}.0" for w in plane) + "]"
        bits.append(
            f"CASE WHEN {dot_sql(emb, f'CAST({lit} AS DOUBLE[])')} >= 0"
            " THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)
