"""Fixed StructTypes for every record shape in the engine (SURVEY.md §1).

The reference keeps streaming schemas fixed in Scala case classes
(``Purchase`` at reference InvoicePipeline.scala:25-32, ``Invoice`` at
:35-45) and infers the batch CSV schema (Clustering.scala:35-39). Here every
schema is explicit — at 100 TB, schema inference means an extra full scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-domain schemas
# ---------------------------------------------------------------------------

#: Raw 8-column purchase line CSV (reference scripts/check_csv.py:7-17,
#: README.md:100-109). InvoiceDate is a *string* in '%m/%d/%Y %H:%M';
#: parsing stays explicit because unparsable dates must route to the
#: "invalid invoice date" error, not to a null timestamp.
PURCHASE_LINE_RAW = T.StructType(
    [
        T.StructField("InvoiceNo", T.StringType(), True),
        T.StructField("StockCode", T.StringType(), True),
        T.StructField("Description", T.StringType(), True),
        T.StructField("Quantity", T.StringType(), True),  # cast downstream (try_cast)
        T.StructField("InvoiceDate", T.StringType(), True),
        T.StructField("UnitPrice", T.StringType(), True),  # cast downstream (try_cast)
        T.StructField("CustomerID", T.StringType(), True),
        T.StructField("Country", T.StringType(), True),
    ]
)

#: Typed purchase record after safe parse (reference Purchase case class,
#: InvoicePipeline.scala:25-32 — StockCode/Description dropped at parse,
#: :93-101) plus the error-routing column replacing the Event ADT (:48-52).
PURCHASE = T.StructType(
    [
        T.StructField("invoice_no", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("invoice_date", T.StringType(), True),
        T.StructField("unit_price", T.DoubleType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("error_reason", T.StringType(), True),  # null = GoodPurchase
    ]
)

#: Featurized invoice (reference Invoice case class InvoicePipeline.scala:35-45
#: and Clustering.featurizeData Clustering.scala:45-58).
INVOICE = T.StructType(
    [
        T.StructField("invoice_no", T.StringType(), True),
        T.StructField("avg_unit_price", T.DoubleType(), True),
        T.StructField("min_unit_price", T.DoubleType(), True),
        T.StructField("max_unit_price", T.DoubleType(), True),
        T.StructField("time", T.DoubleType(), True),
        T.StructField("number_items", T.LongType(), True),
        T.StructField("last_updated", T.StringType(), True),
        T.StructField("lines", T.LongType(), True),
        T.StructField("customer_id", T.StringType(), True),
    ]
)

#: Emitted by the streaming sessionization operator (SURVEY.md §2.4 T2):
#: an INVOICE row plus the expiry/error routing fields.
INVOICE_EMITTED = T.StructType(
    INVOICE.fields
    + [
        T.StructField("error_reason", T.StringType(), True),
    ]
)

#: Ordered feature columns — [avg, min, max, time, number_items], exactly the
#: reference's vector layout (InvoicePipeline.scala:342-348,
#: Clustering.scala:79-87).
FEATURE_COLS = [
    "avg_unit_price",
    "min_unit_price",
    "max_unit_price",
    "time",
    "number_items",
]

# ---------------------------------------------------------------------------
# Driver test-table schemas (FIXTURES.md §B) — explicit so streaming reads
# (which require a schema) and CSV round-trips don't infer.
# ---------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: Opaque multimodal asset column-set (Phase 4): payload stays binary,
#: metadata is typed so partition pruning / predicate pushdown still work.
MULTIMODAL_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

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
