"""Fixed, explicitly-declared schemas — the analog of the reference's
compile-time case-class model (``windowing/model.scala``,
``bigquery/BigQueryRecord.scala``): the schema system is static, there is
no inference anywhere (reference derives coders/schemas from case classes
via macros; we declare StructTypes once and enforce them on every read).

Two schema families:

1. The driver's TPC-H-ish corpus (``TESTDATA.md``) — batch relational
   surface + the ``events`` stream table + ``documents``/``embeddings``
   for the training-data pipeline operators.
2. The reference's streaming ad-tech domain (``model.scala:32-85``):
   publications / screens / ad_events / ad_ctrs — used by the streaming
   operators and their tests (fixtures mirror ``ModelFixtures.scala``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver corpus (TESTDATA.md)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference ad-tech streaming domain (model.scala; FIXTURES.md)
# --------------------------------------------------------------------------

#: ``Publication(id, version)`` + event time — model.scala:32
PUBLICATION = T.StructType(
    [
        T.StructField("publication_id", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)

#: ``Screen(id, publicationId)`` + event time — model.scala:41
SCREEN = T.StructType(
    [
        T.StructField("screen_id", T.StringType(), False),
        T.StructField("publication_id", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)

#: ``AdEvent(id, screenId, action)`` — model.scala:59-62; action domain
#: {click, impression, unknown} (model.scala:46-49).
AD_EVENT = T.StructType(
    [
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("screen_id", T.StringType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)

AD_ACTIONS = ("click", "impression", "unknown")

#: ``AdCtr(id, clicks, impressions)`` — model.scala:71
AD_CTR = T.StructType(
    [
        T.StructField("screen_id", T.StringType(), False),
        T.StructField("ad_id", T.StringType(), False),
        T.StructField("clicks", T.IntegerType(), False),
        T.StructField("impressions", T.IntegerType(), False),
        T.StructField("event_time", T.TimestampType(), False),
    ]
)

#: Nested I/O record — BigQueryRecord.scala:8-16 / schema.json / avro-example.avdl
RECORD = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField(
            "attributes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), False),
                        T.StructField("value", T.StringType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("attributes_map", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
