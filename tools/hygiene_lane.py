"""2M-document stress lane for the round-12 hygiene family (round-13
verdict #3): the decontamination scrub, the (now frequency-capped)
exact-substring pair join, and the composed final train manifest were
measured only at sf0.1 (5k docs); this lane prices them at 200k and 2M
synthetic documents and records walls + the candidate-row volumes that
decide scalability:

- ``substr_raw_pair_volume``  = Σ over ALL 40-grams of C(df, 2) — the
  pair rows the UNCAPPED self-join would materialize (an aggregate
  over group sizes, never materialized);
- ``substr_capped_pair_volume`` = the same sum over grams with
  df <= SUBSTR_DF_CAP — what the shipped capped join actually joins.

The corpus plants the exact hazard the cap exists for: a fixed
120-char boilerplate header shared by 0.5% of docs (10k docs at 2M —
df far beyond the cap), whose raw pair volume alone is ~4e9 rows.
Recipe (seeded, chunked writer): per doc, 1% exact duplicate of a base
text, 2% near-duplicate (5% token dropout), 0.5% boilerplate-headed
remix, rest remix (shuffle + 30% vocab swaps, ~zero shared shingles).

The registered operators run UNMODIFIED: 2M docs > SUBSTR_CAP_AUTO_DOCS
so the cap auto-activates exactly as it would in production; the
200k point doubles as the just-above-threshold activation check.

Flag-rate caveat: this corpus exists to price the WALLS and candidate
volumes, not the flag rates — with SHINGLE_N=3 word-shingles over the
fixture's small vocabulary, shuffled remixes still chance-hit eval
grams, so `contaminated` saturates (~99.6% at 20k). That is the
operator faithfully reporting 3-gram overlap on an artificial vocab
(the reason GPT-3's scrub used 13-grams), not a lane defect; semantic
gates live at the fixture oracles and tests/test_substring_cap.py.

Usage: python tools/hygiene_lane.py [--out-dir DIR] [--scales 200000,2000000]
Prints one JSON line per scale plus a summary line (recorded in NOTES).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.corpora import LANE_SEED, SRC_SF_DIR

BOILER = (
    "This document is distributed under the Creative Example License "
    "version 4.2; redistribution requires attribution. "
)  # 114 chars -> 75 positional 40-grams per planted doc

EXACT_DUP_RATE = 0.01
NEAR_DUP_RATE = 0.02
BOILER_RATE = 0.005


def hygiene_corpus(out_dir: str, n_docs: int) -> str:
    """documents.parquet with the module-doc recipe, chunked writer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    base = pq.read_table(
        os.path.join(SRC_SF_DIR, "documents.parquet"),
        columns=["text", "lang", "source"],
    )
    texts = base["text"].to_pylist()
    langs = base["lang"].to_pylist()
    sources = base["source"].to_pylist()
    nb = len(texts)
    vocab = sorted({w for t in texts[:500] for w in t.split()})

    chunk = 200_000
    writer = None
    for lo in range(0, n_docs, chunk):
        hi = min(lo + chunk, n_docs)
        ids, out_t, out_l, out_s = [], [], [], []
        for i in range(lo, hi):
            b = i % nb
            rng = random.Random(LANE_SEED * 1_000_003 + i)
            r = rng.random()
            if i < nb:
                txt = texts[b]  # keep the base corpus as-is
            elif r < EXACT_DUP_RATE:
                txt = texts[b]  # byte-identical duplicate
            elif r < EXACT_DUP_RATE + NEAR_DUP_RATE:
                toks = [w for w in texts[b].split() if rng.random() >= 0.05]
                txt = " ".join(toks)
            else:
                toks = texts[b].split()
                rng.shuffle(toks)
                toks = [
                    rng.choice(vocab) if rng.random() < 0.30 else w
                    for w in toks
                ]
                txt = " ".join(toks)
                if r < EXACT_DUP_RATE + NEAR_DUP_RATE + BOILER_RATE:
                    txt = BOILER + txt  # the planted heavy-gram head
            ids.append(i)
            out_t.append(txt)
            out_l.append(langs[b])
            out_s.append(sources[b])
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(out_t, pa.string()),
                "lang": pa.array(out_l, pa.string()),
                "source": pa.array(out_s, pa.string()),
                "n_chars": pa.array([len(t) for t in out_t], pa.int64()),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    if writer is not None:
        writer.close()
    return out_dir


def run_scale(spark, d: str, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from example_beam_spark.operators.decontam import (
        SUBSTR_DF_CAP,
        SUBSTR_L,
        _substr_gram_arr,
    )
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.sources.parquet import load_table

    reg = load_registry()
    row: dict = {"n_docs": n_docs, "df_cap": SUBSTR_DF_CAP}

    # candidate volumes: aggregates over gram doc-frequencies, nothing
    # materialized (the raw volume at 2M is ~4e9 — the point of the cap)
    docs = load_table(spark, d, "documents")
    t0 = time.time()
    dfreq = (
        docs.select("doc_id", F.explode(_substr_gram_arr(False)).alias("g"))
        .groupBy(F.unhex(F.md5("g")).alias("gk"))
        .agg(F.count("*").alias("f"))
    )
    vols = dfreq.agg(
        F.sum(F.expr("f * (f - 1) / 2")).alias("raw"),
        F.sum(F.expr("CASE WHEN f <= " + str(SUBSTR_DF_CAP) + " THEN f * (f - 1) / 2 ELSE 0 END")).alias("capped"),
        F.max("f").alias("max_df"),
        F.sum(F.expr(f"CASE WHEN f > {SUBSTR_DF_CAP} THEN 1 ELSE 0 END")).alias("heavy_grams"),
    ).collect()[0]
    row["substr_raw_pair_volume"] = int(vols.raw)
    row["substr_capped_pair_volume"] = int(vols.capped)
    row["substr_max_df"] = int(vols.max_df)
    row["substr_heavy_grams"] = int(vols.heavy_grams)
    row["volume_probe_sec"] = round(time.time() - t0, 1)
    # the planted header contributes len(BOILER)-L+1 identical grams per
    # boiler doc — each with df ≈ BOILER_RATE·n_docs, all above the cap
    row["boiler_header_grams"] = len(BOILER) - SUBSTR_L + 1

    for name in (
        "docs_decontaminate",
        "dedup_exact_substring",
        "docs_final_train_manifest",
    ):
        t0 = time.time()
        out = reg[name].fn(spark, d)
        # consume VALUES, not count(): a bare count() lets Catalyst
        # eliminate left joins whose (unique-keyed) right side is
        # unreferenced — at 2M it collapsed docs_decontaminate's whole
        # gram join to a count of the split (measured "1.0s"). The
        # xxhash64-over-all-columns sum forces every column of every row.
        agg = out.agg(
            F.count("*").alias("n"),
            # decimal sum: a long sum of xxhash64 values overflows ANSI mode
            F.sum(F.xxhash64(*out.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sec = round(time.time() - t0, 1)
        drain_cleanups()
        row[name] = {"rows": agg.n, "sec": sec}
        if name == "docs_final_train_manifest":
            t0 = time.time()
            kept = reg[name].fn(spark, d).filter(F.col("keep")).count()
            drain_cleanups()
            row[name]["kept"] = kept
            row[name]["kept_count_sec"] = round(time.time() - t0, 1)
        print(f"#   {name}: {json.dumps(row[name])}", flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/spark_graft_hygiene")
    ap.add_argument("--scales", default="200000,2000000")
    args = ap.parse_args()

    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="hygiene_lane", shuffle_partitions=64)
    result: dict = {"lane": "hygiene", "scales": []}
    for n in (int(s) for s in args.scales.split(",")):
        d = os.path.join(args.out_dir, f"docs_{n}")
        t0 = time.time()
        hygiene_corpus(d, n)
        build = round(time.time() - t0, 1)
        print(f"# corpus {n}: build {build}s", flush=True)
        row = run_scale(spark, d, n)
        row["corpus_build_sec"] = build
        result["scales"].append(row)
        print(f"# {n}: {json.dumps(row)}", flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
