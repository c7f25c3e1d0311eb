"""Ordered-manifest scale lane (round 11, verdict #1/#2 done-criteria).

Measures the two-phase rewrites of ``docs_budget_select``,
``docs_shard_shuffle`` and ``docs_pack_sequences`` against faithful
reconstructions of their round-10 single-task-window forms, on zipfian
corpora (tools/zipfian.py — Heaps-law vocabulary, 4 languages) at 200k
and 2M documents.

Method: each form is driven through an order-independent checksum
aggregate (sum of xxhash64 over every output column) — this (a) forces
the windows to actually compute (a bare count() lets Catalyst prune an
unreferenced row_number window away) and (b) proves OLD and NEW are
value-identical at lane scale, not just at the oracle SFs.

CLI: python tools/manifest_lane.py [--scales 200000,2000000]
Emits one JSON line per (scale, operator, form) plus a summary.
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

from tools.zipfian import zipfian_corpus  # noqa: E402

LANE_ROOT = "/tmp/manifest_lane"


def _corpus(n_docs: int) -> str:
    d = os.path.join(LANE_ROOT, f"docs_{n_docs}")
    marker = os.path.join(d, "documents.parquet")
    if not os.path.exists(marker):
        t0 = time.time()
        zipfian_corpus(d, n_docs)
        print(
            f"# generated {n_docs}-doc corpus in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    return d


# -- round-10 forms, reconstructed verbatim as lane baselines ---------------
# (single-task windows: the exact plans the round-11 rewrite replaced;
# kept ONLY here so the lane can price and value-check the rewrite)


def _old_budget_select(spark, sf_dir):
    from pyspark.sql import Window

    from example_beam_spark.operators.corpus_ops import _BUDGET_TOKENS
    from example_beam_spark.operators.textops import _BPE_PATTERN
    from example_beam_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")
    ).cast("long")
    quality = F.size(F.array_distinct(F.split(F.col("text"), " "))).cast(
        "double"
    ) / F.size(F.split(F.col("text"), " "))
    scored = docs.select(
        "doc_id", n_tokens.alias("n_tokens"), quality.alias("quality")
    )
    w = Window.orderBy(F.desc("quality"), "doc_id")
    ranked = scored.select(
        "doc_id",
        "n_tokens",
        "quality",
        F.row_number().over(w).cast("long").alias("rank"),
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("cum_tokens"),
    )
    return ranked.filter(F.col("cum_tokens") <= _BUDGET_TOKENS)


def _old_shard_shuffle(spark, sf_dir):
    from pyspark.sql import Window

    from example_beam_spark.operators.corpus_ops import _HEX, _N_SHARDS
    from example_beam_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    k = F.md5(F.col("doc_id").cast("string"))
    shard = F.expr(
        f"CAST(((instr('{_HEX}', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1)"
        f" * 16 + instr('{_HEX}', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1)"
        f" % {_N_SHARDS} AS BIGINT)"
    )
    keyed = docs.select("doc_id", k.alias("k"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


def _old_pack_sequences(spark, sf_dir):
    from pyspark.sql import Window

    from example_beam_spark.operators.textops import _BPE_PATTERN, _PACK_BUDGET
    from example_beam_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    ).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = docs.select("doc_id", "lang", n_tok.alias("n_tokens")).withColumn(
        "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return runs.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"tokens_before div {_PACK_BUDGET}").cast("long").alias("pack_id"),
        (F.col("tokens_before") % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


def _checksum(fn, spark, d) -> tuple[float, int, int]:
    """(wall_s, n_rows, checksum): order-independent xxhash64 sum over
    every output column — forces full computation of all windows. The
    wall covers BOTH the query-function call and the consuming agg:
    two-phase forms run a bounded phase-1 job (probe/collect) inside the
    function, which must be priced, not hidden."""
    t0 = time.time()
    df = fn(spark, d)
    cols = df.columns
    row = df.agg(
        F.count("*").alias("n"),
        # decimal(38,0) sum: exact and overflow-free under ANSI mode
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return round(time.time() - t0, 2), int(row["n"]), int(row["h"] or 0)


# -- window-stage isolation ------------------------------------------------
# At 2M docs the regexp tokenize dominates both forms, hiding the window
# stage's parallelism difference. This bench runs the prefix-sum and
# rank window SHAPES alone over a synthetic pre-tokenized summary table
# (doc_id, lang, n_tokens, k — no text), where the single-task windows
# ARE the whole query, at a row count (default 50M) where a 12.5M-row
# single-task sort is material.


def _isolation_table(spark, n_rows: int) -> str:
    d = os.path.join(LANE_ROOT, f"summary_{n_rows}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        (
            spark.range(n_rows)
            .select(
                F.col("id").alias("doc_id"),
                F.element_at(
                    F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr")),
                    (F.col("id") % 4 + 1).cast("int"),
                ).alias("lang"),
                (F.pmod(F.xxhash64("id"), F.lit(270)) + 30).alias("n_tokens"),
                F.md5(F.col("id").cast("string")).alias("k"),
            )
            .write.mode("overwrite")
            .parquet(d)
        )
    return d


def _iso_forms(spark, d: str) -> dict:
    from pyspark.sql import Window

    summary = spark.read.parquet(d)
    out: dict = {}

    def prefix_old(s):
        w = (
            Window.partitionBy("lang")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return s.select(
            "doc_id",
            "lang",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("before"),
        )

    def prefix_new(s):
        n = s.agg(F.max("doc_id")).collect()[0][0] + 1
        width = max(1, (n + 255) // 256)
        toks = s.withColumn(
            "bucket", F.coalesce(F.expr(f"doc_id div {width}"), F.lit(-1))
        )
        wloc = (
            Window.partitionBy("lang", "bucket")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = toks.withColumn("local_cum", F.sum("n_tokens").over(wloc))
        summ = toks.groupBy("lang", "bucket").agg(F.sum("n_tokens").alias("bsum"))
        wsum = Window.partitionBy("lang").orderBy("bucket")
        base = summ.withColumn(
            "base",
            F.coalesce(
                F.sum("bsum").over(wsum.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        ).select("lang", "bucket", "base")
        return local.join(F.broadcast(base), ["lang", "bucket"]).select(
            "doc_id",
            "lang",
            (F.col("base") + F.col("local_cum") - F.col("n_tokens")).alias(
                "before"
            ),
        )

    def rank_old(s):
        shard = (
            F.conv(F.substring("k", 1, 2), 16, 10).cast("long") % 8
        ).alias("shard")
        keyed = s.select("doc_id", "k", shard)
        w = Window.partitionBy("shard").orderBy("k", "doc_id")
        return keyed.select(
            "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
        )

    def rank_new(s):
        keyed = (
            s.select("doc_id", "k")
            .withColumn("b", F.conv(F.substring("k", 1, 4), 16, 10).cast("long"))
            .withColumn("shard", (F.floor(F.col("b") / 256) % 8).cast("long"))
        )
        wloc = Window.partitionBy("b").orderBy("k", "doc_id")
        local = keyed.withColumn(
            "local_pos", F.row_number().over(wloc).cast("long")
        )
        counts = keyed.groupBy("shard", "b").agg(F.count("*").alias("n"))
        wsum = Window.partitionBy("shard").orderBy("b")
        base = counts.withColumn(
            "base",
            F.coalesce(
                F.sum("n").over(wsum.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        ).select("b", "base")
        return local.join(F.broadcast(base), "b").select(
            "doc_id",
            "shard",
            (F.col("base") + F.col("local_pos")).cast("long").alias("pos"),
        )

    for name, old_f, new_f in (
        ("prefix_sum", prefix_old, prefix_new),
        ("shard_rank", rank_old, rank_new),
    ):
        w_old, n_old, h_old = _checksum(lambda sp, _d, f=old_f: f(summary), spark, d)
        w_new, n_new, h_new = _checksum(lambda sp, _d, f=new_f: f(summary), spark, d)
        out[name] = {
            "wall_old": w_old,
            "wall_new": w_new,
            "rows": n_new,
            "value_identical": (n_old, h_old) == (n_new, h_new),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="200000,2000000")
    ap.add_argument("--isolate-rows", type=int, default=0)
    ap.add_argument(
        "--iso-scaling",
        action="store_true",
        help="run the isolation forms at shuffle.partitions 8 and 32: "
        "the OLD single-task-window forms stay flat (their 4/8 serial "
        "tasks can't use more partitions) while the two-phase forms "
        "speed up — the 'does the wall improve as partitions scale' "
        "evidence for the r10 verdict's done-criterion",
    )
    args = ap.parse_args()

    from example_beam_spark.registry import drain_cleanups, load_registry
    from example_beam_spark.session import get_spark

    spark = get_spark(app_name="manifest_lane")
    reg = load_registry()
    forms = {
        "docs_budget_select": _old_budget_select,
        "docs_shard_shuffle": _old_shard_shuffle,
        "docs_pack_sequences": _old_pack_sequences,
    }
    results = []
    ok = True
    if args.isolate_rows:
        d_iso = _isolation_table(spark, args.isolate_rows)
        parts = (8, 32) if args.iso_scaling else (None,)
        for p in parts:
            if p is not None:
                spark.conf.set("spark.sql.shuffle.partitions", str(p))
            iso = _iso_forms(spark, d_iso)
            for name, row in iso.items():
                rec = {"scale": args.isolate_rows, "op": f"iso_{name}", **row}
                if p is not None:
                    rec["shuffle_partitions"] = p
                ok = ok and row["value_identical"]
                results.append(rec)
                print(json.dumps(rec), flush=True)
    for n_docs in [int(s) for s in args.scales.split(",") if s]:
        d = _corpus(n_docs)
        for name, old_fn in forms.items():
            row: dict = {"scale": n_docs, "op": name}
            try:
                w_old, n_old, h_old = _checksum(old_fn, spark, d)
                drain_cleanups()
                w_new, n_new, h_new = _checksum(reg[name].fn, spark, d)
                drain_cleanups()
                row.update(
                    wall_old=w_old,
                    wall_new=w_new,
                    rows=n_new,
                    value_identical=(n_old, h_old) == (n_new, h_new),
                )
                ok = ok and row["value_identical"]
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
                ok = False
            results.append(row)
            print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "lane": "manifest",
                "all_value_identical": ok,
                "results": results,
            }
        )
    )
    spark.stop()
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
