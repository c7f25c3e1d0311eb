"""Planted-neighborhood embedding corpus for ANN quality measurement.

The driver fixture's embeddings are isotropic Gaussian noise — there is
NO neighborhood structure to recover, so recall@k of any sublinear ANN
method is capped by chance (NOTES "ANN recall measurements": 0.44-0.58
at 14-19% scanned). Real embedding corpora are the opposite: points
concentrate around semantic clusters. This generator plants that
structure explicitly so recall measures the METHOD, not the fixture:

- ``n_clusters`` unit-norm centers drawn from an isotropic Gaussian;
- each vector = its cluster center + a Gaussian whose VECTOR norm is
  ≈ ``noise`` (per-coordinate σ = noise/√dim — without that scaling the
  noise norm grows with √dim and drowns the unit centers), so
  in-cluster cosine ≈ 1/(1+noise²) ≈ 0.89 at the default 0.35 while
  cross-cluster cosine ≈ 0 — a query's true top-k is its own cluster;
- vec_id i belongs to cluster i % n_clusters, so the query set
  (vec_id < N_QUERIES) spans N_QUERIES distinct clusters;
- label = cluster id (same schema as the driver's embeddings table:
  vec_id int64, embedding list<float32>, label int32).

Deterministic (fixed seed) so measured recall tables are reproducible.
"""

from __future__ import annotations

import os

PLANTED_SEED = 20260814


def planted_corpus(
    out_dir: str,
    n: int = 20000,
    dim: int = 64,
    n_clusters: int = 200,
    noise: float = 0.35,
    seed: int = PLANTED_SEED,
) -> str:
    """Write ``embeddings.parquet`` under out_dir; returns out_dir (a
    usable sf_dir for the ANN queries, which read only embeddings)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.arange(n) % n_clusters
    sigma = noise / np.sqrt(dim)  # noise VECTOR norm ≈ `noise`

    os.makedirs(out_dir, exist_ok=True)

    def chunk_table(lo: int, hi: int) -> "pa.Table":
        # zero-copy list<float32> construction (offsets + flat values) —
        # the tolist() path allocates n python lists, which matters at
        # the second-decade scale (2M+ vectors)
        cl = cluster[lo:hi]
        vecs = (
            centers[cl] + sigma * rng.standard_normal((hi - lo, dim))
        ).astype(np.float32)
        offsets = pa.array(np.arange(0, (hi - lo + 1) * dim, dim, dtype=np.int32))
        emb = pa.ListArray.from_arrays(offsets, pa.array(vecs.reshape(-1)))
        return pa.table(
            {
                "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "embedding": emb,
                "label": pa.array(cl.astype("int32"), type=pa.int32()),
            }
        )

    path = os.path.join(out_dir, "embeddings.parquet")
    if n <= 2_000_000:
        pq.write_table(chunk_table(0, n), path)
    else:
        # third-decade corpora (20M): stream 1M-row row groups through one
        # ParquetWriter — the noise stream is drawn sequentially, so the
        # values are IDENTICAL to the one-shot path (same rng stream, same
        # row-major order), only peak memory changes (~0.5 GB per chunk
        # instead of ~10 GB)
        chunk = 1_000_000
        first = chunk_table(0, min(chunk, n))
        with pq.ParquetWriter(path, first.schema) as w:
            w.write_table(first)
            lo = chunk
            while lo < n:
                w.write_table(chunk_table(lo, min(lo + chunk, n)))
                lo += chunk
    return out_dir
