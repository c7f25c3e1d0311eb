"""Stage-level decomposition of dedup_minhash_lsh at sf0.1 (r14).

Times, on one warm session:
  1. sig build+cache materialize (the shingle explode + 13-agg pass)
  2. candidate-pair join with the sig cache hot
  3. full registered query (fresh fn(), cache cold)  x2
  4. sig variant: collect_set(g) instead of array_distinct(collect_list(g))
  5. full query without the .cache() (recompute sig for bands+verify)

Row counts asserted equal across variants.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from example_beam_spark.registry import drain_cleanups, load_registry
from example_beam_spark.session import get_spark


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(json.dumps({"cell": label, "sec": round(time.perf_counter() - t0, 3), "out": out}), flush=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="minhash_probe")
    reg = load_registry()

    from example_beam_spark.operators.dedup import (
        band_keys,
        dedup_minhash_lsh,
        minhash_signatures,
        shingles_raw,
    )
    from example_beam_spark.sources import load_table, spread_small_input

    # warm
    ref = reg["dedup_minhash_lsh"].fn(spark, sf_dir).count()
    drain_cleanups()
    print(json.dumps({"cell": "warmup_rows", "rows": ref}), flush=True)

    docs = spread_small_input(load_table(spark, sf_dir, "documents"), spark)
    sh = shingles_raw(docs)

    sig = minhash_signatures(sh).cache()
    timed("sig_cache_build", lambda: sig.count())
    bands = band_keys(sig)
    b2 = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band2"), F.col("bk").alias("bk2")
    )
    cand = (
        bands.join(
            b2,
            (F.col("band") == F.col("band2"))
            & (F.col("bk") == F.col("bk2"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    timed("cand_join_hot_cache", lambda: cand.count())
    timed("cand_join_hot_cache2", lambda: cand.count())
    sig.unpersist()

    for i in range(2):
        t0 = time.perf_counter()
        n = reg["dedup_minhash_lsh"].fn(spark, sf_dir).count()
        print(json.dumps({"cell": f"full_query_{i}", "sec": round(time.perf_counter() - t0, 3), "rows": n}), flush=True)
        assert n == ref
        drain_cleanups()

    # collect_set variant of the sig aggregate
    from example_beam_spark.operators.dedup import N_HASHES, _MINHASH_P, _affine_const

    h = F.conv(F.substring(F.md5("g"), 1, 14), 16, 10).cast("long") % F.lit(_MINHASH_P)
    mins = []
    for i in range(N_HASHES):
        a, b = _affine_const(i)
        mins.append(
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"s{i}")
        )
    sig2 = (
        sh.withColumn("_h", h)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("g")).alias("gset"), *mins)
        .withColumn("n_shingles", F.size("gset").cast("long"))
    ).cache()
    timed("sig_cache_build_collect_set", lambda: sig2.count())
    # equality check vs original aggregate
    sig_ref = minhash_signatures(sh)
    diff = sig_ref.select("doc_id", "gset").exceptAll(sig2.select("doc_id", "gset")).count()
    print(json.dumps({"cell": "collect_set_equal", "diff_rows": diff}), flush=True)
    sig2.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
