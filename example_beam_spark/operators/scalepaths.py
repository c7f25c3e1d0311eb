"""Scale-path variants of earlier operators, registered with their own
gates (round 13).

The repo's discipline for scale treatments is that they must be CODE
with a correctness contract, not comments: every bound that activates
above fixture scale gets either a full DuckDB value oracle replicating
the bounded semantics, or (where a fitted model intervenes) the
rows-only + measured-recall contract of the trained ANN rungs. This
module holds the round-13 members:

- ``dedup_exact_substring_capped`` — the frequency-capped, md5-keyed
  exact-substring pair join (``decontam.exact_substring_pairs`` with
  ``df_cap`` pinned to a value that BITES at fixture scale), with a
  full value oracle expressing the cap relationally. The registered
  production entries (``dedup_exact_substring``,
  ``dedup_longest_shared_span``) auto-activate the same code path
  above ``SUBSTR_CAP_AUTO_DOCS`` documents; this entry is the
  oracle-gated witness that the capped path computes exactly the
  "pairs over grams with doc-frequency <= F" relation. The md5 join
  key is not modeled in the oracle: a 16-byte hash equality differs
  from string equality only under an md5 collision, which no fixture
  (or corpus smaller than ~2^64 grams) exhibits — the oracle matching
  bit-for-bit IS the evidence the keying is lossless.

- ``ann_topk_ivfpq_sq8`` — the IVF,PQ+SQ8 composition (FAISS shape):
  the cell-partitioned IVFPQ index supplies the ADC shortlist (same
  directory-pruned probe as ``ann_topk_ivfpq_cellpart``), but the
  exact re-rank reads a PERSISTED int8 SQ8 codes table instead of the
  float corpus — at 100 TB the rerank side is the remaining full-width
  float read, and SQ8 cuts those bytes ~4x with the audit-measured
  reconstruction error (``embedding_sq8_audit``). Rows-only driver
  check like its trained siblings (two fitted quantizers feed the
  shortlist); quality gate = recall≥threshold on the planted lane
  (tools/stress_lane.py --mode ivfpq-sq8) plus the opened-bytes
  comparison recorded in NOTES.

Reference analog: none directly (the reference is an ad-event engine);
the cap discipline mirrors its repeater TTL bound
(RepeatDoFn.scala:89-114) — every unbounded blowup gets a bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from example_beam_spark.operators.decontam import (
    SUBSTR_L,
    exact_substring_pairs,
)
from example_beam_spark.registry import register
from example_beam_spark.sources import load_table

# A cap that bites at fixture scale: the fixtures' gram doc-frequency
# tops out at 3-4 (sf0.001 has 359 grams at df=4, sf0.1 has 314), so
# F=3 drops a real head there while sf0.01 happens to have max df 3 —
# the oracle encodes the semantics either way. Production default is
# decontam.SUBSTR_DF_CAP (64).
SUBSTR_CAP_FIXTURE = 3

_CAPPED_SUBSTR_ORACLE = f"""
    WITH grams AS (
        SELECT DISTINCT doc_id, substr(text, i, {SUBSTR_L}) AS g
        FROM documents
        CROSS JOIN UNNEST(generate_series(1, GREATEST(len(text) - {SUBSTR_L - 1}, 0))) AS u(i)
    ),
    light AS (
        SELECT doc_id, g FROM (
            SELECT doc_id, g, COUNT(*) OVER (PARTITION BY g) AS df_g
            FROM grams
        ) WHERE df_g <= {SUBSTR_CAP_FIXTURE}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM light a JOIN light b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


@register("dedup_exact_substring_capped", oracle=_CAPPED_SUBSTR_ORACLE)
def dedup_exact_substring_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring pairs over the frequency-capped gram set (module
    doc): grams with doc-frequency > SUBSTR_CAP_FIXTURE are dropped
    before the self-join, join keys are 16-byte unhex(md5(g)). The
    value oracle proves the capped md5-keyed Spark path equals the
    capped raw-gram relation bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_pairs(docs, df_cap=SUBSTR_CAP_FIXTURE)
