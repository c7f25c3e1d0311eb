"""Scale lane for operators/structures.py (round-11 continuation).

Two modes:

- ``pq``: the PQ-ANN family through its second decade on planted-
  neighborhood corpora (200k and 2M vectors, same geometry as the
  ann2m lane): per scale, exact brute-force wall (the linear baseline),
  ``ann_topk_pq_trained`` recall@10 + wall + exact-rerank fraction, and
  (200k only — its declarative n×M×K encode is the pedagogical form,
  not the scale path) the untrained ``ann_topk_pq_rerank`` rung.
  Acceptance: trained recall holds its planted-corpus gate (>=0.9)
  at BOTH scales while the rerank fraction FALLS 10× (R is constant,
  n grows 10×) — the compressed scan is the scale path precisely
  because its exact work per query is O(R), not O(n).

- ``bucketed``: the co-located-join layout priced at 10M lineitem /
  2.5M orders rows (auto-broadcast disabled — the regime the layout
  exists for): shuffle-join wall over raw parquet, one-time bucketed
  write wall, join wall over the bucketed layout, and a SECOND join
  reusing the layout (the amortization story: the write is paid once,
  every later join on the key skips both exchanges). Value equality is
  proven by an order-independent xxhash64 checksum over every output
  column (the manifest-lane discipline).

CLI: python tools/structures_lane.py --mode pq|bucketed
Emits one JSON line per measurement plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

ANN_DIR = "/tmp/spark_graft_stress_ann2m"  # shared with stress_lane ann2m
BUCKET_LANE_DIR = "/tmp/structures_lane_bucketed"
LANE_SEED = 20260816


# --------------------------------------------------------------------------
# pq mode
# --------------------------------------------------------------------------


def pq_lane() -> None:
    from example_beam_spark.operators.structures import PQ_TRAINED_RERANK
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark
    from tools.planted import planted_corpus

    spark = get_spark(app_name="structures_lane_pq")
    reg = load_registry()
    result: dict = {"lane": "pq", "scales": []}
    for n, tag in ((200_000, "10x"), (2_000_000, "100x")):
        d = os.path.join(ANN_DIR, f"planted_{tag}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            t0 = time.time()
            planted_corpus(d, n=n, n_clusters=n // 100)
            print(f"# planted {n} vectors in {time.time() - t0:.1f}s -> {d}")

        row: dict = {"n": n, "tag": tag}
        t0 = time.time()
        truth: dict[int, set[int]] = {}
        for r in reg["ann_topk_bruteforce"].fn(spark, d).collect():
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        row["bruteforce_sec"] = round(time.time() - t0, 2)
        drain_cleanups()

        def recall_of(name: str) -> tuple[float, float]:
            t0 = time.time()
            got: dict[int, set[int]] = {}
            for r in reg[name].fn(spark, d).collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            drain_cleanups()
            recalls = [
                len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
            ]
            return sum(recalls) / len(recalls), time.time() - t0

        rec, sec = recall_of("ann_topk_pq_trained")
        row["pq_trained"] = {
            "recall_at_10": round(rec, 3),
            "sec": round(sec, 2),
            "rerank_frac": round(PQ_TRAINED_RERANK / (n - 1), 5),
        }
        rec, sec = recall_of("ann_topk_ivfpq_trained")
        row["ivfpq_trained"] = {
            "recall_at_10": round(rec, 3),
            "sec": round(sec, 2),
        }
        rec, sec = recall_of("ann_topk_ivfpq_cellpart")
        from example_beam_spark.operators.structures import ivfpq_cellpart_scan

        _, _, n_probed, k_cells = ivfpq_cellpart_scan(spark, d)
        row["ivfpq_cellpart"] = {
            "recall_at_10": round(rec, 3),
            "sec": round(sec, 2),
            "probed_cells": n_probed,
            "k": k_cells,
        }
        drain_cleanups()
        if n <= 200_000:
            rec, sec = recall_of("ann_topk_pq_rerank")
            row["pq_rerank_untrained"] = {
                "recall_at_10": round(rec, 3),
                "sec": round(sec, 2),
            }
            rec, sec = recall_of("ann_topk_sq8")
            row["sq8"] = {"recall_at_10": round(rec, 3), "sec": round(sec, 2)}
        result["scales"].append(row)
        print(f"# {tag}: {json.dumps(row)}", flush=True)
    print(json.dumps(result))


# --------------------------------------------------------------------------
# bucketed mode
# --------------------------------------------------------------------------

N_ORDERS = 2_500_000
N_LINEITEM = 10_000_000


def _synth_tpch(out_dir: str, n_orders: int, n_lineitem: int) -> None:
    """Scaled lineitem + orders with the fixture's column names/types
    (only the join/agg columns are populated for real)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    g = np.random.default_rng(LANE_SEED)
    okey = np.arange(n_orders, dtype=np.int64)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okey),
                "o_orderpriority": pa.array(
                    np.char.add("P", (okey % 5).astype("U1"))
                ),
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
    )
    lkey = g.integers(0, n_orders, n_lineitem).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lkey),
                "l_extendedprice": pa.array(
                    g.uniform(1.0, 1000.0, n_lineitem).round(2)
                ),
                "l_discount": pa.array(
                    (g.integers(0, 11, n_lineitem) / 100.0)
                ),
            }
        ),
        os.path.join(out_dir, "lineitem.parquet"),
    )


def _checksum(df) -> int:
    """Order-independent value checksum (manifest-lane discipline:
    decimal sum so ANSI mode can't overflow the long hashes)."""
    return int(
        df.agg(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("x")
        ).collect()[0]["x"]
    )


def bucketed_lane(scale: int = 1) -> None:
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="structures_lane_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    n_orders, n_lineitem = N_ORDERS * scale, N_LINEITEM * scale
    lane_dir = BUCKET_LANE_DIR if scale == 1 else f"{BUCKET_LANE_DIR}_x{scale}"
    if not os.path.exists(os.path.join(lane_dir, "lineitem.parquet")):
        t0 = time.time()
        _synth_tpch(lane_dir, n_orders, n_lineitem)
        print(f"# synthesized {n_lineitem}-row corpus in {time.time() - t0:.1f}s")

    o = spark.read.parquet(os.path.join(lane_dir, "orders.parquet"))
    l = spark.read.parquet(os.path.join(lane_dir, "lineitem.parquet"))

    def join_agg(odf, ldf):
        j = odf.join(ldf, odf.o_orderkey == ldf.l_orderkey)
        rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        return j.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_items"),
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
        )

    def second_join(odf, ldf):
        # a DIFFERENT consumer of the same layout: per-order item count
        # histogram — reuses the co-located key, pays no exchange below
        # the join either
        j = odf.join(ldf, odf.o_orderkey == ldf.l_orderkey)
        per_order = j.groupBy("o_orderkey").agg(F.count("*").alias("items"))
        return per_order.groupBy("items").agg(F.count("*").alias("orders"))

    result: dict = {"lane": "bucketed", "n_orders": n_orders, "n_lineitem": n_lineitem}

    t0 = time.time()
    raw_sum = _checksum(join_agg(o, l))
    result["raw_join_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    raw_sum2 = _checksum(second_join(o, l))
    result["raw_join2_sec"] = round(time.time() - t0, 2)

    n_buckets = 32
    t0 = time.time()
    loc = os.path.join(lane_dir, "warehouse")
    db = f"lane_buckets_x{scale}"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    for df, tbl, k in ((o, "orders_b", "o_orderkey"), (l, "lineitem_b", "l_orderkey")):
        (
            df.repartition(n_buckets, k)
            .write.bucketBy(n_buckets, k)
            .sortBy(k)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"{db}.{tbl}")
        )
    result["bucket_write_sec"] = round(time.time() - t0, 2)

    ob = spark.table(f"{db}.orders_b")
    lb = spark.table(f"{db}.lineitem_b")
    plan = (
        join_agg(ob, lb)._jdf.queryExecution().executedPlan().toString()
    )
    # the join subtree must be exchange-free: the ONLY exchange in the
    # whole aggregate query is the groupBy's own
    result["bucketed_exchanges_total"] = plan.count("Exchange")
    t0 = time.time()
    b_sum = _checksum(join_agg(ob, lb))
    result["bucketed_join_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    b_sum2 = _checksum(second_join(ob, lb))
    result["bucketed_join2_sec"] = round(time.time() - t0, 2)

    result["values_identical"] = bool(raw_sum == b_sum and raw_sum2 == b_sum2)
    result["amortization"] = {
        "raw_two_joins_sec": round(result["raw_join_sec"] + result["raw_join2_sec"], 2),
        "bucketed_write_plus_two_joins_sec": round(
            result["bucket_write_sec"]
            + result["bucketed_join_sec"]
            + result["bucketed_join2_sec"],
            2,
        ),
    }
    print(json.dumps(result))


def ivfpq_sq8_lane() -> None:
    """Round-13 verdict #6 gate: the IVF,PQ+SQ8 composition at 200k and
    2M planted vectors — recall@10 vs exact truth, wall, and the
    rerank-side byte ratio (persisted SQ8 codes vs the float corpus the
    float-rerank sibling scans)."""
    from example_beam_spark.operators.scalepaths import sq8_codes_table
    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark
    from tools.planted import planted_corpus
    from tools.stress_lane import exact_topk_truth

    spark = get_spark(app_name="structures_lane_ivfpq_sq8")
    reg = load_registry()
    result: dict = {"lane": "ivfpq_sq8", "scales": []}
    for n, tag in ((200_000, "10x"), (2_000_000, "100x")):
        d = os.path.join(ANN_DIR, f"planted_{tag}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            planted_corpus(d, n=n, n_clusters=n // 100)
        truth = exact_topk_truth(spark, d)
        t0 = time.time()
        got: dict[int, set[int]] = {}
        for r in reg["ann_topk_ivfpq_sq8"].fn(spark, d).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        sec = round(time.time() - t0, 2)
        drain_cleanups()
        recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
        codes_dir, _, _ = sq8_codes_table(spark, d)
        sq8_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(codes_dir)
            for f in fs
            if f.endswith(".parquet")
        )
        float_bytes = os.path.getsize(os.path.join(d, "embeddings.parquet"))
        row = {
            "n": n,
            "tag": tag,
            "recall_at_10": round(sum(recalls) / len(recalls), 3),
            "sec": sec,
            "sq8_rerank_bytes": sq8_bytes,
            "float_corpus_bytes": float_bytes,
            "byte_ratio": round(sq8_bytes / float_bytes, 3),
        }
        result["scales"].append(row)
        print(f"# {tag}: {json.dumps(row)}", flush=True)
    print(json.dumps(result))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode", choices=("pq", "bucketed", "compact", "ivfpq-sq8"), required=True
    )
    ap.add_argument("--scale", type=int, default=1, help="bucketed mode: multiply the 10M/2.5M base")
    args = ap.parse_args()
    if args.mode == "pq":
        pq_lane()
    elif args.mode == "compact":
        compact_lane()
    elif args.mode == "ivfpq-sq8":
        ivfpq_sq8_lane()
    else:
        bucketed_lane(args.scale)



# --------------------------------------------------------------------------
# compact mode — size-targeted compaction at lane scale (round-12
# verdict #3 "Done": one date's rewrite uses >1 writer task)
# --------------------------------------------------------------------------

COMPACT_LANE_DIR = "/tmp/structures_lane_compact"


def _synth_events(out_dir: str, n_rows: int, n_days: int = 30) -> None:
    """Scaled events table with the fixture schema (event_id, ts,
    user_id, event_type, value, props), spread uniformly over n_days."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    g = np.random.default_rng(LANE_SEED)
    base_us = 1_704_067_200 * 1_000_000  # 2024-01-01
    day_us = 86_400 * 1_000_000
    eid = np.arange(n_rows, dtype=np.int64)
    ts = base_us + (eid % n_days) * day_us + g.integers(0, day_us, n_rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array(g.integers(0, n_rows // 10 + 1, n_rows)),
                "event_type": pa.array(
                    np.array(["view", "click", "signup"])[eid % 3]
                ),
                "value": pa.array(g.uniform(0, 100, n_rows).round(3)),
                "props": pa.array([None] * n_rows, type=pa.string()),
            }
        ),
        os.path.join(out_dir, "events.parquet"),
    )


def compact_lane(n_rows: int = 40_000_000, target_bytes: int = 8 * 1024 * 1024) -> None:
    """Build the fragmented layout at lane scale and run the
    size-targeted compaction. The 40M-row synthetic lake compresses to
    ~31 MB/date, so the lane pins the mechanism with a proportional
    8 MB target (the production default stays 128 MB — same code path,
    one knob): files per date must equal ceil(date_bytes / target),
    and >1 file per date == >1 writer task per date, since each file
    is written by exactly one task of that date's repartition(n) job.
    Also reports byte sizes, walls, and the losslessness count."""
    from example_beam_spark.operators.structures import (
        _compacted_events,
        _dir_parquet_bytes,
    )
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="structures_lane_compact")
    d = COMPACT_LANE_DIR
    if not os.path.exists(os.path.join(d, "events.parquet")):
        t0 = time.time()
        _synth_events(d, n_rows)
        print(f"# synthesized {n_rows} events in {time.time() - t0:.1f}s")

    t0 = time.time()
    frag, comp = _compacted_events(spark, d, target_bytes=target_bytes)
    wall = round(time.time() - t0, 2)

    def layout(root):
        out = {}
        for dd in sorted(os.listdir(root)):
            if dd.startswith("event_date="):
                p = os.path.join(root, dd)
                files = [f for f in os.listdir(p) if f.endswith(".parquet")]
                out[dd] = (len(files), _dir_parquet_bytes(p))
        return out

    f, c = layout(frag), layout(comp)
    n_frag = spark.read.parquet(frag).count()
    n_comp = spark.read.parquet(comp).count()
    row = {
        "lane": "compact",
        "n_rows": n_rows,
        "target_mb": round(target_bytes / 1e6, 1),
        "frag_files_per_date": max(v[0] for v in f.values()),
        "compact_files_per_date": sorted({v[0] for v in c.values()}),
        "max_date_bytes": max(v[1] for v in c.values()),
        "max_compact_file_approx_mb": round(
            max(v[1] / v[0] for v in c.values()) / 1e6, 1
        ),
        "build_and_compact_sec": wall,
        "lossless": n_frag == n_comp == n_rows,
    }
    print(json.dumps(row))
    assert row["lossless"]
    expected = {
        dd: max(1, -(-f[dd][1] // target_bytes)) for dd in f
    }
    assert {dd: v[0] for dd, v in c.items()} == expected, (c, expected)
    assert max(v[0] for v in c.values()) > 1, (
        "lane too small: no date exceeded the target"
    )

if __name__ == "__main__":
    main()
