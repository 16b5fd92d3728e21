"""Schemas: the CloudEvent envelope (reference lib/trike/cloud_event.ex:8-26)
and the driver testdata tables (FIXTURES.md §B).

CloudEvent fields are declared ALPHABETICALLY so ``to_json(struct(...))``
serializes with alphabetical keys, matching the reference's golden JSON
byte-for-byte (reference test/proxy_test.exs:67; Jason encodes alphabetically).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- CloudEvent (reference lib/trike/cloud_event.ex:8-26) -------------------
# Alphabetical field order is load-bearing: the sink's to_json must emit
# {"data":...,"id":...,"partitionkey":...,"source":...,"sourceip":...,
#  "specversion":...,"time":...,"type":...}
OCS_RAW_MESSAGE = StructType([StructField("raw", StringType(), False)])

CLOUD_EVENT = StructType(
    [
        StructField("data", OCS_RAW_MESSAGE, False),
        StructField("id", StringType(), False),
        StructField("partitionkey", StringType(), False),
        StructField("source", StringType(), False),
        StructField("sourceip", StringType(), False),
        StructField("specversion", StringType(), False),
        StructField("time", TimestampType(), False),
        StructField("type", StringType(), False),
    ]
)

CLOUD_EVENT_TYPE = "com.mbta.ocs.raw_message"  # cloud_event.ex:25
CLOUD_EVENT_SPECVERSION = "1.0"  # cloud_event.ex:25
EOT = "\x04"  # message delimiter, proxy.ex:42

# --- Driver testdata tables (FIXTURES.md §B; parquet footers) ---------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
