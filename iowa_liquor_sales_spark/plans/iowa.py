"""The Iowa Liquor Sales pipeline, Spark-first.

Reference shape (SURVEY §3): Airflow DAG ``extract >> transform >> load``
(dags/iowa_liquor_dag.py:59-74) + a Postgres session script deriving a star
schema (IowaLiquor-RDS.session.sql:1-182). Here the whole thing is one lazy
Spark application with three materialization points:

- bronze: typed CSV scan of staged pages (no inference)
- silver: coercions + null-fill (src/transform.py:11-23 semantics)
- gold:   five dims + fact_sales with PK/FK validation — the session
  script's six INSERT ... SELECT DISTINCT ... ON CONFLICT DO NOTHING
  statements become distinct + first-wins dedup DataFrames.

Scale: bronze→silver is a single narrow stage; each dim build shuffles only
its dim's distinct attribute tuples (tiny); the fact build is a projection.
Gold tables should be written partitioned (fact by year) and the dims are
broadcast at query time — see operators/joins.star_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iowa_liquor_sales_spark.functions.cleansing import to_silver
from iowa_liquor_sales_spark.functions.dates import date_parts
from iowa_liquor_sales_spark.operators.dedup import dedup_rank
from iowa_liquor_sales_spark.operators.joins import fk_violations, pk_duplicates
from iowa_liquor_sales_spark.schemas import IOWA_INT_COLS, IOWA_NUM_COLS

# Dim column layouts: IowaLiquor-RDS.session.sql:85-156.
DIM_STORE_COLS = [
    "store",
    "name",
    "address",
    "city",
    "zipcode",
    "store_location",
    "county_number",
    "county",
]
DIM_ITEM_COLS = [
    "itemno",
    "im_desc",
    "pack",
    "bottle_volume_ml",
    "state_bottle_cost",
    "state_bottle_retail",
]
DIM_VENDOR_COLS = ["vendor_no", "vendor_name"]
DIM_CATEGORY_COLS = ["category", "category_name"]
FACT_COLS = [
    "invoice_line_no",
    "date",
    "store",
    "itemno",
    "vendor_no",
    "category",
    "sale_bottles",
    "sale_dollars",
    "sale_liters",
    "sale_gallons",
]


def silver(bronze: DataFrame) -> DataFrame:
    """Reference transform stage (C1-C3, src/transform.py:11-23): datetime
    coercion, 8 numeric coercions, null→0 fill. One narrow stage."""
    return to_silver(
        bronze,
        ts_cols=("date",),
        int_cols=IOWA_INT_COLS,
        num_cols=IOWA_NUM_COLS,
    )


def _dim(df: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """Shared dim recipe (session.sql pattern): WHERE key IS NOT NULL →
    SELECT DISTINCT cols → first-wins one-row-per-key. The winner under
    ``ON CONFLICT DO NOTHING`` is unspecified; here it is deterministic
    (ordered by the remaining attributes) so rebuilds are idempotent."""
    distinct = df.filter(F.col(key).isNotNull()).select(*cols).distinct()
    tiebreak = [c for c in cols if c != key]
    return dedup_rank(distinct, [key], tiebreak or [key])


def dim_store(silver_df: DataFrame) -> DataFrame:
    return _dim(silver_df, "store", DIM_STORE_COLS)


def dim_item(silver_df: DataFrame) -> DataFrame:
    return _dim(silver_df, "itemno", DIM_ITEM_COLS)


def dim_vendor(silver_df: DataFrame) -> DataFrame:
    return _dim(silver_df, "vendor_no", DIM_VENDOR_COLS)


def dim_category(silver_df: DataFrame) -> DataFrame:
    return _dim(silver_df, "category", DIM_CATEGORY_COLS)


def dim_date(silver_df: DataFrame) -> DataFrame:
    """session.sql:104-127 — day-trunc date + year/quarter/month + Postgres
    DOW + weekend flag, distinct over non-null dates."""
    return (
        silver_df.filter(F.col("date").isNotNull())
        .select(*date_parts("date"))
        .distinct()
    )


def fact_sales(silver_df: DataFrame) -> DataFrame:
    """session.sql:160-182: fact projection keyed by invoice_line_no with
    first-wins PK dedup, date day-truncated."""
    fact = (
        silver_df.filter(F.col("invoice_line_no").isNotNull())
        .select(*FACT_COLS)
        .withColumn("date", F.to_date("date"))
    )
    return dedup_rank(fact, ["invoice_line_no"], ["date", "store", "itemno"])


def build_gold(silver_df: DataFrame) -> dict[str, DataFrame]:
    return {
        "dim_store": dim_store(silver_df),
        "dim_item": dim_item(silver_df),
        "dim_vendor": dim_vendor(silver_df),
        "dim_category": dim_category(silver_df),
        "dim_date": dim_date(silver_df),
        "fact_sales": fact_sales(silver_df),
    }


def validate_gold(gold: dict[str, DataFrame]) -> dict[str, int]:
    """PK/FK checks (reference J1/J2: Postgres constraints,
    session.sql:67-73). Returns violation counts — all zeros on a healthy
    build. Each FK check is a broadcast anti-join: one fact scan, no
    shuffle."""
    fact = gold["fact_sales"]
    out: dict[str, int] = {}
    for name, keys in {
        "pk_fact": ["invoice_line_no"],
        "pk_dim_store": ["store"],
        "pk_dim_item": ["itemno"],
        "pk_dim_vendor": ["vendor_no"],
        "pk_dim_category": ["category"],
        "pk_dim_date": ["date"],
    }.items():
        table = gold["fact_sales" if name == "pk_fact" else name.removeprefix("pk_")]
        out[name] = table.transform(lambda d, k=keys: pk_duplicates(d, k)).count()
    for fk, (dim_name, dim_key) in {
        "store": ("dim_store", "store"),
        "itemno": ("dim_item", "itemno"),
        "vendor_no": ("dim_vendor", "vendor_no"),
        "category": ("dim_category", "category"),
        "date": ("dim_date", "date"),
    }.items():
        violations = fk_violations(
            fact.filter(F.col(fk).isNotNull()), gold[dim_name], fk, dim_key
        )
        out[f"fk_{fk}"] = violations.count()
    return out
