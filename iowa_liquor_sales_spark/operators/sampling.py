"""Deterministic sampling and dataset splitting.

A training-data pipeline needs reproducible sampling: the same document
must land in the same train/val/test split on every run, on any cluster
size, regardless of partitioning — which rules out ``rand()`` and
``df.sample`` (both seed per-partition, so a repartition reshuffles the
assignment). The engine's primitives are **content-keyed**:

- :func:`hash_split` — split assignment by ``hash60(salt || key)``
  bucketed into 10_000 slots, carved by cumulative weight. Adding a new
  split or re-running never moves an existing row between the splits it
  was already eligible for. One narrow projection — no shuffle, no
  state, scales to any row count.
- :func:`stratified_sample` — exact per-stratum sampling: rank rows
  within each stratum by the content hash and keep either a fixed
  ``n`` or an exact ``fraction`` of the stratum. One shuffle on the
  strata columns. For heavily skewed strata at 100 TB the same
  semantics compose from a two-phase top-n (per-partition prune, then
  final window) — the rank-by-hash definition is what makes that
  rewrite legal, since the hash order is total and data-independent.

Both are pure JVM expressions (md5 + conv), reproducible bit-for-bit in
the DuckDB oracle via :func:`..functions.hashing.hash60_sql`.

Reference parity note: the reference pipeline has no sampling at all
(SURVEY.md §2.7); these are north-star training-data operators.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash60

_BUCKETS = 10_000


def split_bucket(key: Column | str, salt: str = "split") -> Column:
    """Stable bucket in [0, 10000) for a key column: hash60(salt||key) mod 1e4."""
    c = F.col(key) if isinstance(key, str) else key
    return hash60(F.concat(F.lit(salt), c.cast("string"))) % _BUCKETS


def hash_split(
    df: DataFrame,
    key: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label.

    ``weights`` maps label -> fraction (need not sum to 1; the remainder
    is dropped — useful for "sample 1% as eval"). Labels are carved in
    the mapping's iteration order, so insertion order is part of the
    contract (Python dicts preserve it).
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = split_bucket(key, salt)
    expr = F.lit(None).cast("string")
    hi = 0.0
    cases = []
    for label, w in weights.items():
        lo, hi = hi, hi + w
        cases.append((int(round(lo * _BUCKETS)), int(round(hi * _BUCKETS)), label))
    # Build CASE from the last carve backwards so the first match wins.
    for lo_b, hi_b, label in reversed(cases):
        expr = F.when((bucket >= lo_b) & (bucket < hi_b), F.lit(label)).otherwise(
            expr
        )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    key: str,
    n: int | None = None,
    fraction: float | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Keep an exact per-stratum subset, chosen by content-hash rank.

    Exactly one of ``n`` (fixed rows per stratum) or ``fraction``
    (ceil(fraction * stratum size) rows) must be given. Rank order is
    ``(hash60(salt||key), key)`` — total and data-independent, so the
    selected set is stable across runs and cluster layouts.
    """
    if (n is None) == (fraction is None):
        raise ValueError("give exactly one of n= or fraction=")
    h = hash60(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(key).asc())
    ranked = df.withColumn("sample_rank", F.row_number().over(w))
    if n is not None:
        return ranked.filter(F.col("sample_rank") <= n)
    cnt = F.count(F.lit(1)).over(Window.partitionBy(*strata))
    return (
        ranked.withColumn("_cnt", cnt)
        .filter(F.col("sample_rank") <= F.ceil(F.lit(fraction) * F.col("_cnt")))
        .drop("_cnt")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    prob: Column,
    salt: str = "wsample",
) -> DataFrame:
    """Keep each row independently with probability ``prob`` (a per-row
    column in [0, 1]), deterministically.

    Importance sampling for corpus curation: downsample low-quality or
    over-represented documents by score while keeping the decision
    content-keyed — the same doc survives (or not) on every run and any
    partitioning. The coin flip is ``bucket(key) < floor(prob * 10_000)``
    on the same 10_000-slot hash grid as :func:`hash_split`, so a row
    kept at prob p stays kept at any prob' >= p (nested samples, the
    property rerun-able data mixes need).

    Narrow projection + filter — no shuffle, no state; the scan's filter
    pushdown and column pruning are untouched.
    """
    threshold = F.least(
        F.lit(_BUCKETS), F.floor(prob * _BUCKETS).cast("long")
    )
    return df.filter(split_bucket(key, salt) < threshold)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    key: str,
    budget: int,
    shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Pack documents into fixed-token-budget training sequences.

    Every doc gets (shard, seq, seq_pos): docs are spread over ``shards``
    by content hash, laid out in hash order within the shard, and a
    running token total opens a new sequence whenever the budget would
    overflow mid-doc — greedy streaming fill, the standard pretraining
    packing layout. ``seq = (cumsum - tokens) // budget``: a doc starts
    the sequence its *starting* offset falls in, so a sequence can
    overflow by at most one doc (callers truncate or pad; docs longer
    than the budget get a sequence of their own).

    Deterministic: hash order is content-keyed (reruns, repartitions,
    and cluster size cannot move a doc between sequences). One shuffle
    on the shard key; each shard's window sort is independent, so skew
    is bounded by shards, not corpus size.
    """
    h = hash60(F.concat(F.lit(salt), F.col(key).cast("string")))
    d = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_h", key)
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("_cum", cum)
        .select(
            key,
            "shard",
            F.expr(f"CAST((_cum - {token_col}) div {budget} AS INT)").alias("seq"),
            (F.col("_cum") - F.col(token_col)).alias("start_tok"),
        )
    )


# Cumulative per-mille thresholds of Poisson(1): P(X<=k) for k=0..4.
# The classic Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
# for Massive Data Streams") replaces multinomial resampling — which
# needs the global row count — with independent per-row Poisson(1)
# multiplicities, which need NOTHING global: the embarrassingly-parallel
# bootstrap.
POISSON1_CUM_PER_MILLE = (368, 736, 920, 981, 996)


def poisson1_weight(key: Column, replicate: Column) -> Column:
    """Deterministic Poisson(1) multiplicity for (row, replicate) from
    ``hash60`` — reproducible in any engine, no ``rand()``."""
    u = hash60(
        F.concat(F.lit("bs"), replicate.cast("string"), F.lit("_"),
                 key.cast("string"))
    ) % 1000
    w = F.lit(len(POISSON1_CUM_PER_MILLE))
    for k in range(len(POISSON1_CUM_PER_MILLE) - 1, -1, -1):
        w = F.when(u < POISSON1_CUM_PER_MILLE[k], F.lit(k)).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    cents_col: str,
    n_boot: int = 40,
) -> DataFrame:
    """Bootstrap confidence interval for a mean, computed distributed and
    deterministically: each row joins every replicate with a hash-drawn
    Poisson(1) multiplicity, each replicate reduces to ONE weighted-mean
    row via a map-side-combinable sum pair, and the CI is a percentile
    over the ``n_boot`` replicate means. The n_boot-times row fan-out
    never survives a partition — the combiner collapses it to
    O(n_boot) rows per task, which is why this scales where
    collect-and-resample cannot.

    Replicate means are rounded to integer tenths of a cent, and the
    2.5/97.5 bounds are ORDER STATISTICS of those integers (type-1
    quantiles) — no float interpolation anywhere, so every output is an
    exact integer in any engine.

    Returns one row: (n_boot, mean_mc_point, ci_lo_mc, ci_hi_mc), all in
    millicents (cents × 10).
    """
    b = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
    w = poisson1_weight(F.col(id_col), F.col("b"))
    per_rep = (
        df.select(F.col(id_col), F.col(cents_col).alias("cents"), b)
        .select("b", (w * F.col("cents")).alias("wc"), w.alias("w"))
        .groupBy("b")
        .agg(
            F.round(
                F.lit(10.0) * F.sum("wc") / F.sum("w"), 0
            ).cast("long").alias("mean_mc")
        )
    )
    # exact integer SUM then one double division — avg(long) would
    # accumulate doubles in partition order.
    point = df.agg(
        F.floor(
            F.sum(F.col(cents_col)).cast("double")
            / F.count(F.lit(1))
            * F.lit(10.0)
        )
        .cast("long")
        .alias("mean_mc_point"),
    )
    # Order-statistic CI (type-1 quantile): the 2.5%/97.5% bounds are
    # EXACT replicate means (integers), not interpolated — percentile
    # interpolation at 0.025 is a cross-engine float formula. n_boot is
    # bounded, so the sorted-array pick is O(n_boot) driver-free state.
    lo_pos = max(1, int(0.025 * n_boot) + 1)
    hi_pos = min(n_boot, int(0.975 * n_boot) + 1)
    ci = per_rep.agg(
        F.count(F.lit(1)).cast("long").alias("n_boot"),
        F.element_at(F.sort_array(F.collect_list("mean_mc")), lo_pos).alias(
            "ci_lo_mc"
        ),
        F.element_at(F.sort_array(F.collect_list("mean_mc")), hi_pos).alias(
            "ci_hi_mc"
        ),
    )
    return ci.crossJoin(point).select(
        "n_boot", "mean_mc_point", "ci_lo_mc", "ci_hi_mc"
    )


def kfold_loo_aggregates(
    df: DataFrame,
    key: str,
    cents_col: str,
    k: int = 5,
    salt: str = "fold",
) -> DataFrame:
    """Leave-one-fold-out aggregates from ONE scan: assign each row a
    deterministic fold (``hash60 % k``), reduce to per-fold partial sums
    (O(k) rows), then produce each fold's TRAINING-side mean as
    total-minus-fold — the cross-validation statistic without k passes
    over the data. The pattern generalizes to any distributive
    aggregate: partials once, complements by subtraction.

    Returns (fold, n_holdout, holdout_mean_mc, train_mean_mc) per fold,
    means in integer millicents (exact: int sums, one rounded division).
    """
    fold = (
        hash60(F.concat(F.lit(salt), F.col(key).cast("string"))) % k
    ).cast("int")
    per = (
        df.select(fold.alias("fold"), F.col(cents_col).alias("cents"))
        .groupBy("fold")
        .agg(
            F.sum("cents").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    tot = per.agg(
        F.sum("s").alias("ts"), F.sum("n").cast("long").alias("tn")
    )
    j = per.crossJoin(F.broadcast(tot))
    mc = lambda s, n: F.round(F.lit(10.0) * s / n, 0).cast("long")  # noqa: E731
    return j.select(
        "fold",
        F.col("n").alias("n_holdout"),
        mc(F.col("s"), F.col("n")).alias("holdout_mean_mc"),
        mc(F.col("ts") - F.col("s"), F.col("tn") - F.col("n")).alias(
            "train_mean_mc"
        ),
    )


def weighted_topk_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    k: int,
    salt: str = "aes",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact size k (Efraimidis-
    Spirakis A-ES, 2006): each row draws ``u = uniform(0,1)`` and keeps
    key ``u^(1/w)``; the k largest keys are a weight-proportional
    without-replacement sample. Ranking by ``u^(1/w)`` is equivalent to
    ranking by ``ln(u)/w``, which is what we materialize — no pow.

    Deterministic twist (same trade as the DP release and hash_split):
    ``u`` is the exact dyadic rational ``(2h+1)/2^21`` of a salted key
    hash, so the sample is content-keyed and rerun-stable. The ranking
    value floor-scales ``ln(u)/w`` to an integer e9 grid with the key as
    tie-break, so the selected set is total-ordered and engine-exact
    (libm ln on identical dyadic inputs; the accepted boundary class).

    Scale shape: a narrow projection computes the key, then global top-k
    — Catalyst executes orderBy+limit as TakeOrderedAndProject (per-
    partition heaps + driver merge of k rows), never a global sort.
    Weights must be positive integers (cast upstream).
    """
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(key).cast("string")))
    u_num = (h % F.lit(1048576)) * 2 + 1  # odd: u in (0,1), never 0 or 1
    lnu = F.log(u_num.cast("double") / F.lit(2097152.0))
    sel = F.floor(lnu / weight.cast("double") * F.lit(1e9)).cast("long")
    return (
        df.withColumn("sel_key_e9", sel)
        .orderBy(F.col("sel_key_e9").desc(), F.col(key))
        .limit(k)
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Dedup-aware train/val/test split: carve by near-dup CLUSTER, not
    by row, so no near-duplicate pair ever straddles the train/eval
    boundary. A plain row-hash split leaks by construction — two
    near-identical documents hash independently, one lands in train
    and one in test, and the eval set silently scores memorization.
    This is the split every deduplicated-corpus training run actually
    needs (the contamination literature's remedy: split UNITS are
    duplicate clusters).

    ``pairs`` is any near-dup pair relation ``(doc_a, doc_b)`` — exact
    hash groups, MinHash-LSH, SimHash bands, dHash image pairs — so
    the leakage definition is pluggable. The split key is the pair
    graph's connected-component representative (transitive closure:
    A~B~C travel together even when A and C never matched directly),
    via the log-round pointer-jumping CC; singleton documents skip the
    iterative stage entirely through the left join + coalesce (same
    shape as ``joins.resolve_entities``). The final assignment is one
    :func:`hash_split` over the cluster key — deterministic under
    rerun, repartition, and cluster resize, like every split here.

    Returns (doc_id, cluster_id, split).
    """
    from .graph import connected_components

    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    labeled = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias(
                "cluster_id"
            ),
        )
    )
    return hash_split(labeled, "cluster_id", weights=weights, salt=salt)



def stratified_kfold(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_folds: int = 5,
    salt: str = "kfold",
) -> DataFrame:
    """Stratified k-fold assignment: every stratum's rows are spread
    across the k folds as evenly as arithmetic allows (sizes within
    ±1 inside each stratum) — the cross-validation splitter a
    class-imbalanced eval needs, where :func:`hash_split`'s plain
    hash-bucket assignment only balances in expectation and can
    starve a rare stratum's fold.

    Deterministic and partition-invariant: rows are ranked WITHIN each
    stratum by the content hash (a total, data-independent order) and
    dealt round-robin — ``fold = (rank − 1) % k``. One shuffle on the
    strata columns; the window is per-stratum (hash-partitioned,
    parallel across strata). Re-running on any cluster layout deals
    identical folds.

    Returns the input plus a ``fold`` column in [0, n_folds).
    """
    h = hash60(
        F.concat(
            F.lit(salt), F.col(key_col).cast("string")
        )
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), F.col(key_col).cast("string").asc()
    )
    return df.withColumn(
        "fold",
        ((F.row_number().over(w) - 1) % F.lit(int(n_folds))).cast("int"),
    )


def weighted_choice(
    draws: DataFrame,
    weights: DataFrame,
    draw_key_cols: list[str],
    item_col: str,
    weight_col: str,
    salt: str = "choice",
) -> DataFrame:
    """Deterministic categorical sampling: for every draw row, pick one
    item from a weighted vocabulary with probability proportional to
    its weight — the primitive behind skip-gram negative sampling
    (unigram^0.75), mixture-weighted source picking, and any
    "sample from this distribution, reproducibly" need. ``rand()`` is
    partition-seeded and shuffles assignments on re-run; here the draw
    is the md5 hash of the draw key, so the same key always draws the
    same item on any cluster layout (and in the SQL oracle).

    Plan shape: the vocabulary collapses to an O(items) cumulative-
    weight relation (one window over items); each draw computes
    ``h = hash60(salt || key) mod W`` and picks the item whose
    [cum_lo, cum_hi) interval contains h. With a small vocabulary the
    interval probe is a broadcast range join (Catalyst BNLJ over O(items)
    rows); for a huge vocabulary compose with :func:`..temporal.range_join`'s
    covering-bucket trick instead — the semantics (and this hash
    contract) stay identical.

    Returns draws plus (item, w) of the chosen item.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("item")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = weights.select(
        F.col(item_col).alias("item"),
        F.col(weight_col).cast("long").alias("w"),
    ).select(
        "item",
        "w",
        (F.sum("w").over(w) - F.col("w")).alias("lo"),
        F.sum("w").over(w).alias("hi"),
    )
    tot = cum.agg(F.sum("w").cast("long").alias("wtot"))
    key = F.concat_ws(
        "_", F.lit(salt), *[F.col(c).cast("string") for c in draw_key_cols]
    )
    h = hash60(key)
    drawn = draws.crossJoin(F.broadcast(tot)).withColumn(
        "_h", h % F.col("wtot")
    )
    return (
        drawn.join(
            F.broadcast(cum),
            (F.col("_h") >= F.col("lo")) & (F.col("_h") < F.col("hi")),
        )
        .drop("_h", "wtot", "lo", "hi")
    )
