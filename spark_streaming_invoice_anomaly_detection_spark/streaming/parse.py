"""P1-P4: safe CSV parse + event routing, as native column expressions.

Reference ``safeParseCsv`` (InvoicePipeline.scala:77-115) uses univocity with
quote detection and whitespace trimming, returning Either[(key, reason),
Purchase]. The routing step (:166-181) keeps GoodPurchases and ONLY the
Lefts whose reason starts with "parse error:" — empty/malformed lines are
*silently dropped* (SURVEY.md §7 hard-point 2).

Rebuild: ``from_csv`` (quote-aware, JVM, codegen'd) + a when-cascade for the
error taxonomy. No Python in the parse path — at 100 TB this is the hottest
operator in the pipeline.

Deviation (documented): cast-failure messages are
"parse error: invalid quantity '<raw>'" instead of the JVM's
"parse error: For input string: ..." — same "parse error:" prefix, which is
the only part routing depends on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import is_empty

#: 8 raw string fields, cast explicitly afterwards so failures route to
#: "parse error:" instead of silently nulling (from_csv would null them).
_RAW_CSV_SCHEMA = (
    "InvoiceNo string, StockCode string, Description string, Quantity string, "
    "InvoiceDate string, UnitPrice string, CustomerID string, Country string"
)

_CSV_OPTIONS = {
    "ignoreLeadingWhiteSpace": "true",
    "ignoreTrailingWhiteSpace": "true",
}


def _field_count(value: Column) -> Column:
    """Token count of the line, quote-aware: quoted fields (possibly
    containing commas / doubled quotes) are collapsed before counting."""
    collapsed = F.regexp_replace(value, '"([^"]|"")*"', "q")
    return F.size(F.split(collapsed, ","))


def parse_purchase_lines(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw text lines -> typed purchase events with an ``error_reason`` column.

    Output schema = schemas.PURCHASE. error_reason taxonomy (mirrors
    InvoicePipeline.scala:79-113):

    - null                      -> GoodPurchase
    - 'empty line'              -> blank input (key UNKNOWN)
    - 'malformed purchase line' -> fewer than 8 CSV fields
    - 'parse error: ...'        -> Quantity/UnitPrice cast failure
    """
    v = F.col(value_col)
    parsed = F.from_csv(v, _RAW_CSV_SCHEMA, _CSV_OPTIONS)

    quantity = F.trim(parsed["Quantity"]).try_cast("int")
    unit_price = F.trim(parsed["UnitPrice"]).try_cast("double")

    error = (
        F.when(F.trim(v) == "", "empty line")
        .when(v.isNull(), "empty line")
        .when(_field_count(v) < 8, "malformed purchase line")
        .when(
            quantity.isNull(),
            F.concat(
                F.lit("parse error: invalid quantity '"),
                F.coalesce(parsed["Quantity"], F.lit("")),
                F.lit("'"),
            ),
        )
        .when(
            unit_price.isNull(),
            F.concat(
                F.lit("parse error: invalid unit price '"),
                F.coalesce(parsed["UnitPrice"], F.lit("")),
                F.lit("'"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )

    invoice_no = F.when(
        F.trim(v) == "", F.lit("UNKNOWN")
    ).otherwise(F.coalesce(parsed["InvoiceNo"], F.lit("UNKNOWN")))

    return raw.select(
        invoice_no.alias("invoice_no"),
        quantity.alias("quantity"),
        parsed["InvoiceDate"].alias("invoice_date"),
        unit_price.alias("unit_price"),
        parsed["CustomerID"].alias("customer_id"),
        parsed["Country"].alias("country"),
        error.alias("error_reason"),
    )


def route_events(parsed: DataFrame) -> DataFrame:
    """P3: keep GoodPurchases + 'parse error:' events; drop the rest
    silently (empty/malformed — InvoicePipeline.scala:169-172)."""
    return parsed.filter(
        F.col("error_reason").isNull()
        | F.col("error_reason").startswith("parse error:")
    )
