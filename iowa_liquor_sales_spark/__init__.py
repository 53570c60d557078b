"""iowa_liquor_sales_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``sundar139/IOWA-Liquor-Sales`` (a chunked pandas/Airflow/Postgres ETL
pipeline, see SURVEY.md) as one idiomatic Spark application:

- bronze  : raw ingest (CSV/Parquet scans with explicit schemas)
- silver  : typed/cleansed rows (try-cast coercions, null fills)
- gold    : star schema (distinct dims, key dedup, date dim, fact, PK/FK
            validation) + the analytical queries the schema exists to serve
- extras  : large-scale training-data-pipeline operators (exact/MinHash/
            SimHash/n-gram/embedding dedup, ANN similarity search, text
            analysis, multimodal binary columns, streaming ingest)

Everything is declarative DataFrame/Spark SQL so Catalyst provides pushdown,
pruning, join planning and whole-stage codegen; Python UDFs are avoided in
hot paths (Arrow-batched ``mapInPandas`` only for the multimodal decode
plumbing, where per-row binary work is inherent).
"""

from iowa_liquor_sales_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
