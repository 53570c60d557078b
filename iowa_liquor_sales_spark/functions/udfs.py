"""Python UDF surface — the escape hatches, each paired with its JVM twin.

The engine's rule (README): built-in Catalyst expressions in hot paths;
when Python is genuinely needed, Arrow-vectorized forms only. This module
completes the API surface with the two forms not used elsewhere:

- a scalar ``@pandas_udf`` (Arrow columnar batches, numpy math) — here the
  L2 norm, whose expression twin is ``functions.vectors.l2_norm``; tests
  assert the two agree, which is the pattern for validating any future
  Python kernel against a slower-but-trusted JVM expression;
- a ``@udtf`` table function (one row in, N rows out with schema known to
  Catalyst) — here a whitespace sentence splitter, twin of
  explode+split.

Row-at-a-time ``F.udf`` is deliberately absent: 10-100x slower than
either form and never necessary in this engine.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, LongType


@pandas_udf(DoubleType())
def l2_norm_py(vectors: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: L2 norm of an array<float> column.
    Arrow ships the column as one batch; numpy reduces it C-side."""
    import numpy as np

    return vectors.map(
        lambda v: float(np.sqrt(np.dot(np.asarray(v, dtype="float64"),
                                       np.asarray(v, dtype="float64"))))
    )


@pandas_udf(LongType())
def ssq_q20_py(vectors: pd.Series) -> pd.Series:
    """Fixed-point sum-of-squares of an array<float> column: each
    component scaled by 2^20 (a power of two — the float64 multiply is
    EXACT) and rounded to int64, then squared and summed in integer
    space. Unlike an L2-norm float reduction (BLAS order-dependent in
    the last ulp), this is bit-identical on any engine or BLAS build —
    the driver-hashable form of the same kernel."""
    import numpy as np

    def ssq(v) -> int:
        # floor(x + 0.5), NOT np.round: numpy rounds half-to-even while
        # SQL round() is half-away — floor(+0.5) is one convention
        # expressible identically in every engine.
        q = np.floor(np.asarray(v, dtype="float64") * 1048576.0 + 0.5).astype(
            "int64"
        )
        return int((q * q).sum())

    return vectors.map(ssq)


@udtf(returnType="sent_id int, sentence string, n_words int")
class SplitSentences:
    """Python UDTF: explode a document into '.'-terminated sentences with
    per-sentence word counts. One input row → N typed output rows, usable
    in SQL as ``LATERAL split_sentences(text)`` after registration."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, raw in enumerate(text.split(".")):
            s = raw.strip()
            if s:
                yield i, s, len(s.split(" "))


def register_udfs(spark) -> None:
    """Register the Python functions for SQL use."""
    spark.udf.register("l2_norm_py", l2_norm_py)
    spark.udf.register("ssq_q20_py", ssq_q20_py)
    spark.udtf.register("split_sentences", SplitSentences)


__all__ = ["l2_norm_py", "ssq_q20_py", "SplitSentences", "register_udfs", "F"]


def grouped_stats_arrow(grouped, value_col: str, key_col: str):
    """``applyInArrow`` group kernel (Spark 4): per-group aggregation
    computed with ``pyarrow.compute`` on whole-group RecordBatches — the
    zero-copy, no-pandas escape hatch for columnar Python logic. The
    cents-exact integer sum keeps the Python kernel's output identical
    to the JVM twin (``SUM(CAST(round(v*100) AS BIGINT))``), which is
    how any Arrow kernel here gets validated.

    Takes a ``GroupedData`` (grouped by ``key_col``); returns a
    DataFrame (key, n_rows, sum_cents, max_cents).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(table: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(table.column(value_col), 100.0)),
            pa.int64(),
        )
        return pa.table(
            {
                key_col: [table.column(key_col)[0].as_py()],
                "n_rows": pa.array([table.num_rows], pa.int64()),
                "sum_cents": pa.array([pc.sum(cents).as_py()], pa.int64()),
                "max_cents": pa.array(
                    [pc.max(cents).as_py()], pa.int64()
                ),
            }
        )

    return grouped.applyInArrow(
        kernel,
        schema=(
            f"{key_col} long, n_rows long, sum_cents long, max_cents long"
        ),
    )
