"""Scalar column-expression library — the engine's public function surface.

The reference has no SQL scalar-function library (its element-wise logic
lives in map/flatMap closures — SURVEY.md §2.2 P5/P8 and §2.6 U7); on
Spark the same logic is column expressions that stay inside whole-stage
codegen. Everything here is a pure ``Column`` builder over built-in
``pyspark.sql.functions`` — no UDFs, no Python in the hot path — and is
the exact expression family the operator modules are built from
(dedup/similarity/textops), exposed for direct use.

Engine-portability note: hashes are md5 hex strings, which DuckDB computes
bit-identically — the property the DuckDB oracles rely on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def one_hot(col: Column | str, value: str) -> Column:
    """1 when ``col == value`` else 0 — the AdCtr one-hot constructor
    (model.scala:75-85): click → (1,0), impression → (0,1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == value, 1).otherwise(0)


def token_array(text: Column | str, sep: str = " ") -> Column:
    """Whitespace token array."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(t, sep)


def shingle_array(text: Column | str, n: int = 3) -> Column:
    """Array of n-token shingle strings (empty when the doc is shorter) —
    the MinHash/Jaccard building block (operators/dedup.py)."""
    s = token_array(text)
    return F.when(
        F.size(s) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(s) - n),
            lambda i: F.concat_ws(" ", F.slice(s, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def salted_md5(col: Column | str, salt: str) -> Column:
    """md5 of ``salt || value`` — one member of the salted-md5 minwise
    hash family; MIN over it per document is a MinHash component."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(salt), c))


def minhash_component(shingle: Column | str, i: int) -> Column:
    """The i-th MinHash family member: md5('i:' || shingle). Aggregate
    with F.min per doc to get signature component i."""
    return salted_md5(shingle, f"{i}:")


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two float-array columns via zip_with +
    aggregate — single JVM expression, no explode, no UDF. Accumulates in
    DECIMAL(38,12) so the result is order-independent and engine-portable
    (the similarity operators' oracle-stability trick)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: (u * v).cast("decimal(38,12)")),
            F.lit(0).cast("decimal(38,12)"),
            # decimal + widens precision and would fail the accumulator's
            # type check — cast each step back to the accumulator type
            lambda acc, w: (acc + w).cast("decimal(38,12)"),
        )

    return (
        dot(ca, cb)
        / F.sqrt(dot(ca, ca).cast("double"))
        / F.sqrt(dot(cb, cb).cast("double"))
    ).cast("double")
