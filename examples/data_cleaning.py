"""Normalization + heterogeneous-format loading demo.

The reference tutorial's data-cleaning flow: load messy spreadsheet /
HTML inputs, parse locale-formatted numerics, convert units into a
common frame, validate — all as lazy Column expressions over whatever
scale the cluster holds.

    python3 examples/data_cleaning.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pydi_spark import get_spark  # noqa: E402
from pydi_spark.io import (  # noqa: E402
    load_excel,
    load_html,
    load_parquet,
    write_excel,
    write_html_page,
)
from pydi_spark.normalization import convert_units  # noqa: E402
from pydi_spark.normalization.parsers import parse_numeric  # noqa: E402
from pydi_spark.normalization.units import normalize_units  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-cleaning")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spark-warehouse", "example_cleaning")
    os.makedirs(scratch, exist_ok=True)

    # 1. a partner sends data as a spreadsheet + an HTML report —
    # simulate that from the parquet tables, then load through the
    # format-agnostic loaders (stdlib codecs; no openpyxl/lxml needed)
    supp = load_parquet(spark, f"{sf_dir}/supplier.parquet", "supplier").df
    nation = load_parquet(spark, f"{sf_dir}/nation.parquet", "nation").df
    xlsx = os.path.join(scratch, "partner.xlsx")
    write_excel({"suppliers": supp, "nations": nation}, xlsx)
    page = os.path.join(scratch, "report.html")
    write_html_page({"nations": nation}, page)

    book = load_excel(spark, xlsx, "partner")
    print("excel sheets ->", {k: v.df.count() for k, v in book.items()})
    tables = load_html(spark, page, "report")
    print("html tables ->", {k: v.df.count() for k, v in tables.items()})

    # 2. locale-formatted numerics: the same column arrives in German
    # and Swiss conventions; parse both into doubles
    messy = spark.createDataFrame(
        [("1.234,56", "1'234.56"), ("27,5", "27.5")],
        "de_price string, ch_price string",
    )
    parsed = messy.select(
        parse_numeric("de_price", locale="de").alias("de"),
        parse_numeric("ch_price", locale="de_CH").alias("ch"),
    )
    parsed.show()

    # 3. unit chaos: quantities in mixed units -> one base frame, plus
    # direct from->to conversion for a report column
    q = spark.createDataFrame(
        [("12 km",), ("3 mi",), ("100 °F",)], "distance string"
    )
    normalize_units(q, "distance").show(truncate=False)
    conv = spark.createDataFrame(
        [(120.0, "km/h", "mph"), (5.0, "kg", "lb")],
        "v double, from_u string, to_u string",
    )
    convert_units(conv, "v", "from_u", "to_u").show()


if __name__ == "__main__":
    main()
