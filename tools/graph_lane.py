"""Graph-operator scale lane: the term-graph entries in their intended
regime.

The driver fixture's ~31-term vocabulary makes the co-occurrence graph
a near-clique of 31 nodes — correct for oracles, meaningless for scale.
This lane reuses the zipfian Heaps-law corpus generator
(``tools/zipfian.py`` — 10k+-term vocabulary growing ~sqrt(corpus),
like real text) at a base size and at 10x, and measures the four
graph/retrieval entries where graph size actually grows:

- ``pagerank_term_graph`` / ``label_propagation_terms``: wall-time must
  track the EDGE count (each unrolled iteration is one edge-keyed
  shuffle), not the node-pair space;
- ``triangle_count_terms``: wedge volume under the degree orientation
  must stay output-bound (the Suri-Vassilvitskii claim) — the lane
  records wedges and closed triangles alongside wall-time;
- ``tf_cosine_topk``: postings-join work is (query docs) x (co-term
  postings); with Heaps vocabulary the per-term postings THIN as the
  corpus grows, so per-query cost must grow sub-linearly.

At the base size every entry is also VALUE-CHECKED against its
registered DuckDB oracle on the zipfian corpus — the cross-engine
exactness claims (integer-only LPA, bit-exact IEEE cosine, quantized
PR sums) re-proven on a 10k-term natural-shape corpus rather than the
31-term fixture. At 10x the oracle run is optional (--verify both)
because DuckDB's td self-join materializes the full pair volume.

CLI: ``python tools/graph_lane.py [--base 5000] [--out-dir
/tmp/spark_graft_graph] [--verify base|both|none]`` — one JSON line per
(size, entry) plus a growth summary (recorded in NOTES.md per round).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.zipfian import zipfian_corpus

ENTRIES = [
    "pagerank_term_graph",
    "label_propagation_terms",
    "triangle_count_terms",
    "tf_cosine_topk",
]
SYMLINK_SF = "/root/testdata/sf0.001"  # donor for the non-documents tables


def lane_dir(out_dir: str, n_docs: int) -> str:
    """Zipfian documents at ``n_docs`` plus symlinks for every other
    table (so the registered DuckDB oracles run unchanged)."""
    from example_beam_spark.schemas import TABLES

    d = os.path.join(out_dir, f"n{n_docs}")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        zipfian_corpus(d, n_docs)
    for name in TABLES:
        if name == "documents":
            continue
        src = os.path.join(SYMLINK_SF, f"{name}.parquet")
        dst = os.path.join(d, f"{name}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    return d


def graph_stats(spark, sf_dir: str) -> dict:
    """Node/edge/wedge/triangle volumes of the support>=5 term graph —
    group-size aggregates only (wedges via sum of C(out_deg, 2) over the
    degree-ordered orientation, no pair materialization)."""
    from pyspark.sql import functions as F

    from example_beam_spark.operators.graphtext import (
        _TRI_MIN_SUP,
        triangle_count_terms,
    )
    from example_beam_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    td = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    b = td.select(F.col("doc_id").alias("d2"), F.col("term").alias("t2"))
    und = (
        td.join(b, (F.col("doc_id") == F.col("d2")) & (F.col("term") < F.col("t2")))
        .groupBy(F.col("term").alias("u"), F.col("t2").alias("v"))
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= _TRI_MIN_SUP)
        .select("u", "v")
    )
    deg = (
        und.select(F.col("u").alias("term"))
        .unionAll(und.select(F.col("v").alias("term")))
        .groupBy("term")
        .agg(F.count("*").alias("deg"))
    )
    n_nodes, n_edges = deg.count(), und.count()
    du = deg.select(F.col("term").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("term").alias("v"), F.col("deg").alias("deg_v"))
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    out_deg = (
        und.join(du, "u")
        .join(dv, "v")
        .select(F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"))
        .groupBy("src")
        .agg(F.count("*").alias("od"))
    )
    n_wedges = out_deg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).cast("long")
    ).collect()[0][0]
    tri = triangle_count_terms(spark, sf_dir)
    n_triangles = int(
        tri.agg(F.sum("triangles")).collect()[0][0] or 0
    ) // 3  # each triangle counted at all 3 vertices
    return {
        "nodes": n_nodes,
        "edges": n_edges,
        "oriented_wedges": int(n_wedges or 0),
        "triangles": n_triangles,
    }


def run_size(spark, sf_dir: str, n_docs: int, verify: bool) -> list[dict]:
    from example_beam_spark.registry import drain_cleanups, load_registry
    from tests.oracle import assert_matches_oracle

    reg = load_registry()
    out = [{"section": "graph_stats", "n_docs": n_docs, **graph_stats(spark, sf_dir)}]
    drain_cleanups()
    for name in ENTRIES:
        t0 = time.time()
        df = reg[name].fn(spark, sf_dir)
        rows = df.count()
        sec = round(time.time() - t0, 2)
        r = {"section": "entry", "n_docs": n_docs, "entry": name, "rows": rows, "sec": sec}
        if verify:
            t0 = time.time()
            assert_matches_oracle(reg[name].fn(spark, sf_dir), reg[name].oracle, sf_dir, name)
            r["oracle"] = "match"
            r["oracle_sec"] = round(time.time() - t0, 2)
        drain_cleanups()
        out.append(r)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=5000)
    ap.add_argument("--out-dir", default="/tmp/spark_graft_graph")
    ap.add_argument("--verify", choices=["base", "both", "none"], default="base")
    args = ap.parse_args()

    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="graph_lane")
    all_rows: list[dict] = []
    for i, mult in enumerate((1, 10)):
        n = args.base * mult
        d = lane_dir(args.out_dir, n)
        verify = args.verify == "both" or (args.verify == "base" and i == 0)
        rows = run_size(spark, d, n, verify)
        for r in rows:
            print(json.dumps(r), flush=True)
        all_rows.extend(rows)
    ent = {
        (r["n_docs"], r.get("entry")): r for r in all_rows if r["section"] == "entry"
    }
    st = {r["n_docs"]: r for r in all_rows if r["section"] == "graph_stats"}
    base, big = args.base, args.base * 10
    summary = {
        "section": "growth_10x",
        "edges": round(st[big]["edges"] / max(st[base]["edges"], 1), 2),
        "wedges": round(
            st[big]["oriented_wedges"] / max(st[base]["oriented_wedges"], 1), 2
        ),
        **{
            name: round(ent[(big, name)]["sec"] / max(ent[(base, name)]["sec"], 0.01), 2)
            for name in ENTRIES
        },
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
