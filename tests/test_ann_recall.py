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


def test_ivf_multiprobe_monotone_and_full_probe_exact(spark):
    # Probe sets nest, so recall vs the exact answer is monotone
    # non-decreasing in nprobe; probing ALL cells makes IVF exhaustive,
    # i.e. identical to brute force (same metric, same tiebreak).
    emb = read_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = _topk_ids(brute_force_topk(emb, qvec, k=10, exclude_ids=[0]))
    prev = -1
    for nprobe in (1, 2, 4):
        got = _topk_ids(ivf_topk(emb, query_id=0, k=10, n_cells=16, nprobe=nprobe))
        hits = len(exact & got)
        assert hits >= prev, f"recall dropped at nprobe={nprobe}"
        prev = hits
    full = _topk_ids(ivf_topk(emb, query_id=0, k=10, n_cells=16, nprobe=16))
    assert full == exact


def test_ann_recall_curve_monotone(spark):
    from iowa_liquor_sales_spark.operators.similarity import ann_recall_curve

    emb = read_table(spark, SF, "embeddings")
    rows = ann_recall_curve(emb, nprobes=(1, 2, 4)).collect()
    by_np: dict[int, int] = {}
    for r in rows:
        by_np[r["nprobe"]] = by_np.get(r["nprobe"], 0) + r["n_hits"]
    assert by_np[1] <= by_np[2] <= by_np[4]


def test_kcenter_greedy_picks_farthest_points(spark):
    from iowa_liquor_sales_spark.operators.similarity import kcenter_greedy

    # Three tight clusters at (0,0), (10,10), (-10,10) plus the min-id
    # seed inside cluster A: greedy must visit each OTHER cluster before
    # refining any covered one.
    pts = [
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]),
        (10, [10.0, 10.0]), (11, [10.1, 10.0]),
        (20, [-10.0, 10.0]), (21, [-10.0, 10.1]),
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    out = sorted(
        kcenter_greedy(df, k=3).collect(), key=lambda r: r["round"]
    )
    assert out[0]["vec_id"] == 1 and out[0]["sel_dist"] == 0
    picked = {out[1]["vec_id"], out[2]["vec_id"]}
    # one pick per uncovered cluster, never a second point of cluster A
    assert len(picked & {10, 11}) == 1 and len(picked & {20, 21}) == 1
    # round-2 pick is the true farthest cluster from (0,0): both are
    # ~sqrt(200) away; tie broken deterministically by distance then id
    assert out[1]["sel_dist"] >= out[2]["sel_dist"]


def test_pq_recall_floor_and_code_compression(spark):
    from iowa_liquor_sales_spark.operators.similarity import pq_topk

    emb = read_table(spark, SF, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").head()["embedding"]]
    exact = _topk_ids(brute_force_topk(emb, qvec, k=10, exclude_ids=[0]))

    pq = pq_topk(emb, query_id=0, k=10)
    rows = pq.collect()
    assert len(rows) == 10
    assert [r["rnk"] for r in rows] == list(range(1, 11))
    # ADC scores are non-decreasing by rank (integer, tie-stable)
    adcs = [r["adc"] for r in rows]
    assert adcs == sorted(adcs)
    # 8x4 codebooks over 64 dims at cosine ~0.5 is a coarse sketch; a
    # measured floor still catches an index-structure regression (the
    # untrained-codebook failure mode recalls ~0).
    assert len(exact & {r["vec_id"] for r in rows}) / 10 >= 0.2


def test_ivf_pq_restricts_to_cell_and_degenerates_to_flat_pq(spark):
    from iowa_liquor_sales_spark.operators.similarity import (
        ivf_assign,
        ivf_pq_topk,
        pq_topk,
    )

    emb = read_table(spark, SF, "embeddings")
    # results must come from the query's coarse cell (probe-1 contract)
    assigned = ivf_assign(emb, n_cells=16)
    qcell = assigned.filter("vec_id = 0").head()["cell"]
    members = {
        r["vec_id"]
        for r in assigned.filter(assigned["cell"] == qcell).collect()
    }
    out = ivf_pq_topk(emb, query_id=0, k=10, n_cells=16).collect()
    assert {r["vec_id"] for r in out} <= members
    # with ONE coarse cell every vector is a candidate: IVF-PQ must
    # reduce to the flat PQ ranking exactly (same codebooks, same ADC)
    flat = [(r["vec_id"], r["adc"]) for r in pq_topk(emb, 0, k=10).collect()]
    one = [
        (r["vec_id"], r["adc"])
        for r in ivf_pq_topk(emb, 0, k=10, n_cells=1).collect()
    ]
    assert one == flat


def test_hard_negatives_excludes_same_cell_and_ranks_by_distance(spark):
    from iowa_liquor_sales_spark.operators.similarity import (
        hard_negatives,
        ivf_assign,
    )

    emb = read_table(spark, SF, "embeddings")
    out = hard_negatives(emb, n_anchors=4, k=5).collect()
    cells = {
        r["vec_id"]: r["cell"] for r in ivf_assign(emb, n_cells=16).collect()
    }
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    assert set(by_anchor) == {0, 1, 2, 3}
    for aid, rows in by_anchor.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]
        # negatives are never from the anchor's own pseudo-label cell
        assert all(cells[r["vec_id"]] != cells[aid] for r in rows)
        # distances are non-decreasing by rank
        d = [r["dist2"] for r in rows]
        assert d == sorted(d)


def test_ann_recall_report_bounds_and_full_cell_recall(spark):
    from iowa_liquor_sales_spark.operators.similarity import (
        ann_recall_report,
    )

    emb = read_table(spark, SF, "embeddings")
    rows = ann_recall_report(emb, n_queries=4, k=10).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert 1 <= r["n_exact"] <= 10
        assert 0 <= r["n_hits"] <= r["n_exact"]
        assert 0 <= r["recall_ppm"] <= 1_000_000
    # with ONE cell the "index" is exhaustive: recall must be exactly 1
    full = ann_recall_report(emb, n_queries=4, k=10, n_cells=1).collect()
    assert all(r["recall_ppm"] == 1_000_000 for r in full)


def test_ivf_pq_full_probe_equals_plain_pq(spark):
    # Probing ALL coarse cells makes IVF-PQ's candidate set the whole
    # corpus, so its ADC ranking must be identical to plain PQ (same
    # codebooks, same LUT, same tiebreak) — the composition adds
    # exactly one restriction and nothing else.
    from iowa_liquor_sales_spark.operators.similarity import (
        ivf_pq_topk,
        pq_topk,
    )

    emb = read_table(spark, SF, "embeddings")
    plain = [
        (r["vec_id"], r["rnk"], r["adc"])
        for r in pq_topk(emb, query_id=0, k=10).collect()
    ]
    full = [
        (r["vec_id"], r["rnk"], r["adc"])
        for r in ivf_pq_topk(emb, query_id=0, k=10, n_cells=16, nprobe=16).collect()
    ]
    assert sorted(plain) == sorted(full)


def test_ann_recall_curve_full_probe_hits_one(spark):
    # nprobe = n_cells probes every cell, so the "index" arm is
    # exhaustive and recall must be exactly 1.0 for every anchor.
    from iowa_liquor_sales_spark.operators.similarity import ann_recall_curve

    emb = read_table(spark, SF, "embeddings")
    rows = ann_recall_curve(emb, nprobes=(1, 16), n_cells=16).collect()
    assert all(
        r["recall_ppm"] == 1_000_000 for r in rows if r["nprobe"] == 16
    )
