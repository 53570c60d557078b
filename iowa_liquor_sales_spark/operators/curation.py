"""Corpus-curation operators for training-data pipelines.

The reference pipeline (sundar139/IOWA-Liquor-Sales) cleans a flat sales
table (`src/transform.py:11-23` — coerce + fillna); a 100 TB pretraining
corpus needs the same *shape* of stage — per-row cleansing plus corpus-level
filtering — at document granularity. These operators cover the standard
curation passes (The Pile / Gopher / RefinedWeb lineage):

- test-set **decontamination** (n-gram overlap against an eval set),
- per-group **quantile filtering** (keep the top half by a quality metric),
- intra-document **repetition ratio** (duplicate n-gram share, a Gopher
  quality signal),
- regex **scrubbing** (PII-style masking),
- **mixture replication** (per-domain epoch weights for data mixing).

Scale posture: everything is expression-level or a single keyed shuffle.
The eval-side shingle set in decontamination is the only broadcast, and it
is DISTINCT-compressed first (eval sets are small by construction; if not,
the join degrades gracefully to a shuffle join — Catalyst/AQE decides by
size, we only *hint* broadcast when told the eval set is small).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iowa_liquor_sales_spark.caching import pin


def word_ngrams(
    text: Column | str, n: int, from_array: bool = False
) -> Column:
    """Distinct word n-grams of a whitespace-tokenized text column,
    computed entirely with JVM array expressions (no explode, no UDF).

    PERF: pass ``from_array=True`` with a pre-materialized split column
    in any hot path. Catalyst does not common-subexpression-eliminate
    inside higher-order-function lambdas, so an inline ``split`` here is
    re-evaluated by every ``element_at`` — O(words × n × words) per row,
    measured 10x on the corpus shingle pass."""
    src = text if isinstance(text, Column) else F.col(text)
    ws = src if from_array else F.split(src, " ")
    # transform over 1..len-n+1 (1-based i) keeps the lambda index math
    # identical to the DuckDB oracle's list_transform(range(...)). Texts
    # shorter than n words yield an empty array (sequence(1, 0) would
    # otherwise produce a DESCENDING [1, 0] and index 0 errors under ANSI).
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def _ngram_rows(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, shingle) rows: split materialized ONCE per row, then
    explode_outer + null filter (plain explode would let
    InferFiltersFromGenerate re-inline the whole gram expression into an
    inferred size()>0 filter — the engine-wide generator invariant)."""
    return (
        df.withColumn("ws_", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col),
            F.explode_outer(
                word_ngrams(F.col("ws_"), n, from_array=True)
            ).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Remove training documents sharing any word ``n``-gram with the eval
    set (test-set decontamination, GPT-3 appendix-C style).

    Plan shape: eval -> distinct shingles (small) ->> semi-join train
    shingles ->> distinct contaminated ids -> left_anti on train. At scale
    the train-side shingle explode is the dominant cost and stays fully
    partition-parallel; the contaminated-id set is tiny and broadcasts
    into the final anti-join.
    """
    # Join on a 64-bit hash of the shingle, not the string: identical
    # matches barring ~n²/2^64 collision odds (the same convention as
    # jaccard_pairs), and the distinct/join exchanges carry 8-byte keys
    # instead of n-word strings.
    tr_sh = _ngram_rows(train, text_col, id_col, n).select(
        id_col, F.xxhash64("shingle").alias("shingle")
    )
    ev_sh = (
        _ngram_rows(eval_df, text_col, id_col, n)
        .select(F.xxhash64("shingle").alias("shingle"))
        .distinct()
    )
    if broadcast_eval:
        ev_sh = F.broadcast(ev_sh)
    contaminated = (
        tr_sh.join(ev_sh, "shingle", "left_semi").select(id_col).distinct()
    )
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


def quantile_filter(
    df: DataFrame,
    metric_col: str,
    group_col: str,
    id_col: str = "doc_id",
    keep_fraction_num: int = 1,
    keep_fraction_den: int = 2,
) -> DataFrame:
    """Keep the top ``num/den`` fraction of rows per group, ranked by
    ``metric_col`` descending with ``id_col`` as the deterministic
    tiebreak. Integer arithmetic (rn * den <= cnt * num) — no FP quantile
    boundary, identical in any engine."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(metric_col).desc(), F.col(id_col)
    )
    wc = Window.partitionBy(group_col)
    return (
        df.withColumn("rn_", F.row_number().over(w))
        .withColumn("cnt_", F.count(F.lit(1)).over(wc))
        .filter(
            F.col("rn_") * keep_fraction_den <= F.col("cnt_") * keep_fraction_num
        )
        .drop("rn_", "cnt_")
    )


def repetition_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2
) -> DataFrame:
    """Duplicate-n-gram share per document in exact parts-per-million:
    (total - distinct) * 1_000_000 div total. Pure array expressions per
    row — no shuffle at all; the whole pass is one codegen stage."""
    # Split materialized once per row (see word_ngrams PERF note), then
    # total/distinct are pure array expressions over it.
    ws = F.col("ws_")
    total = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    distinct = F.size(F.array_distinct(grams))
    return (
        df.withColumn("ws_", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col),
            total.cast("long").alias("total_ngrams"),
            distinct.cast("long").alias("distinct_ngrams"),
        )
        .withColumn(
            "dup_ppm",
            F.when(
                F.col("total_ngrams") > 0,
                F.expr(
                    "((total_ngrams - distinct_ngrams) * 1000000)"
                    " div total_ngrams"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def scrub_patterns(
    df: DataFrame,
    text_col: str,
    patterns: list[tuple[str, str]],
    out_col: str = "scrubbed",
) -> DataFrame:
    """Sequentially apply regex replacements (PII masking). Patterns must
    stay in the RE2-compatible subset (no backrefs/lookaround) so Java and
    DuckDB agree; replacement is global in both engines."""
    col = F.col(text_col)
    for pat, repl in patterns:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col, col)


def mix_epochs(
    df: DataFrame,
    weight_col: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Replicate each row ``weight`` times (integer epochs) for domain
    mixing: weight 0 drops the row, w > 1 up-samples with an explicit
    ``epoch`` index (1..w) so downstream shuffles spread the copies.
    Explode of a per-row sequence — partition-parallel, no driver state."""
    seq = F.when(
        weight_col > 0, F.sequence(F.lit(1), weight_col.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(seq))


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    max_words: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking for pretraining context layout:
    every document becomes ceil((n_words - overlap) / stride) chunks of at
    most ``max_words`` whitespace words, consecutive chunks sharing
    ``overlap`` words (stride = max_words - overlap). Documents shorter
    than one window yield exactly one chunk.

    Output: (id, chunk_id, chunk_text, n_words), chunk_id = 0-based
    window index derived from the start offset — deterministic, no
    ordinality dependence.

    Scale shape: split once per row, explode the (tiny) start-offset
    sequence, slice per chunk — all expression-level, partition-parallel,
    zero shuffle; output rows ≈ input tokens / stride regardless of
    document skew (a 1 GB document becomes many rows, not one giant row,
    which is exactly what the downstream packing/tokenize stages want).
    explode_outer + null filter per the InferFiltersFromGenerate engine
    invariant (an inferred size()>0 filter would re-inline the sequence).
    """
    if overlap >= max_words:
        raise ValueError("overlap must be < max_words")
    stride = max_words - overlap
    ws = F.col("ws_")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(ws) - overlap, F.lit(1)),
        F.lit(stride),
    )
    return (
        df.withColumn("ws_", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col),
            "ws_",
            F.explode_outer(starts).alias("s"),
        )
        .filter(F.col("s").isNotNull())
        .withColumn("chunk_", F.slice("ws_", F.col("s"), max_words))
        .select(
            id_col,
            F.expr(f"(s - 1) div {stride}").alias("chunk_id"),
            F.array_join("chunk_", " ").alias("chunk_text"),
            F.size("chunk_").cast("long").alias("n_words"),
        )
    )


def dedup_lines(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    sep: str = "\n",
    max_copies: int = 1,
) -> DataFrame:
    """Corpus-wide line-level deduplication (the CCNet/Dolma pass): split
    every document into lines, count each distinct line across the WHOLE
    corpus, drop lines occurring in more than ``max_copies`` documents,
    and reassemble the surviving lines in their original order.

    Output: (id, text, n_lines_kept, n_lines_dropped). Documents whose
    lines are all dropped survive with empty text (filter downstream).

    Scale shape: one explode (line grain), one groupBy on the 60-bit line
    hash (shuffle is O(distinct lines), map-side combined), one shuffle
    join of lines against the over-represented hash set, and one groupBy
    back to doc grain where ``sort_array`` on (pos, line) structs restores
    order without a window. Line text itself never shuffles twice — the
    join key is the hash, the reassembly carries (pos, line) only.
    """
    from iowa_liquor_sales_spark.functions.hashing import hash60

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("lh", hash60(F.col("line")))
    hot = (
        lines.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > max_copies)
        .select("lh")
    )
    # left join preserves every line; is_hot is non-null exactly on match
    tagged = lines.join(hot.withColumn("is_hot", F.lit(True)), "lh", "left")
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("is_hot").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias(text_col),
            F.count_if(F.col("is_hot").isNull()).alias("n_lines_kept"),
            F.count_if(F.col("is_hot").isNotNull()).alias("n_lines_dropped"),
        )
    )


def semdedup(
    embeddings: DataFrame,
    n_cells: int = 16,
    min_cosine: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): coarse-cluster
    the embedding space, then drop documents too similar to their
    cluster's canonical keeper. Output: (id, cell, is_kept).

    This deterministic variant keeps the minimum id per cell and drops
    any member with cosine >= ``min_cosine`` to that keeper — a single
    representative comparison instead of the paper's all-pairs-within-
    cluster, which keeps the oracle exact and the cost O(n) after
    assignment. For the full within-cell pair semantics, compose
    :func:`~..similarity.embedding_near_dup_pairs` per cell.

    Scale shape: cell assignment is a broadcast-centroids argmax (one
    shuffle on id), keepers are an O(cells) aggregate broadcast back —
    the corpus never shuffles on anything but its own id.
    """
    from iowa_liquor_sales_spark.functions.vectors import cosine_similarity
    from iowa_liquor_sales_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        embeddings, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    keepers = assigned.groupBy("cell").agg(F.min(F.col(id_col)).alias("keeper_id"))
    kvecs = assigned.select(
        F.col(id_col).alias("keeper_id"), F.col(vec_col).alias("keeper_vec")
    )
    k = keepers.join(kvecs, "keeper_id")
    return assigned.join(F.broadcast(k), "cell").select(
        F.col(id_col),
        F.col("cell"),
        (
            (F.col(id_col) == F.col("keeper_id"))
            | (
                cosine_similarity(F.col(vec_col), F.col("keeper_vec"))
                < F.lit(min_cosine)
            )
        ).alias("is_kept"),
    )


# Transparent fixed weights for the linear quality model: ppm-scale
# integer features, so the score is exact int64 on any engine.
QUALITY_WEIGHTS = {
    "n_words": 3,            # longer docs score higher
    "mean_wlen_ppm": 2,      # per-ppm of mean word length
    "stopword_ppm": 1,       # natural-language prior
    "digit_word_ppm": -2,    # tables/serial numbers score lower
}
QUALITY_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is")


def quality_score_linear(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_threshold: int = 9_000_000,
) -> DataFrame:
    """Model-based quality filter: a fixed-weight linear classifier over
    integer ppm features (the transparent stand-in for a fasttext-style
    quality model — same pipeline seat, deterministic weights).

    Features are exact integers (counts and floor-divided ppm ratios), so
    ``score = w . x`` is bit-identical across engines. Output:
    (id, n_words, mean_wlen_ppm, stopword_ppm, digit_word_ppm, score,
    keep).
    """
    ws = F.col("ws_")
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    base = df.withColumn("ws_", F.split(F.col(text_col), " ")).select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_words"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w)))
        .cast("long")
        .alias("n_stop"),
        F.size(F.filter(ws, lambda w: w.rlike("[0-9]")))
        .cast("long")
        .alias("n_digit"),
    )
    # Integer `div` (all operands non-negative) mirrors DuckDB `//`
    # exactly — the engine-wide convention for cross-engine-stable ratios.
    feat = base.select(
        F.col(id_col),
        F.col("n_words"),
        F.expr(
            "CASE WHEN n_words > 0 THEN "
            "((n_chars - n_words + 1) * 1000000) div n_words "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("mean_wlen_ppm"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (n_stop * 1000000) div n_words "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("stopword_ppm"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (n_digit * 1000000) div n_words "
            "ELSE CAST(0 AS BIGINT) END"
        ).alias("digit_word_ppm"),
    )
    w8 = QUALITY_WEIGHTS
    score = (
        F.col("n_words") * F.lit(w8["n_words"])
        + F.col("mean_wlen_ppm") * F.lit(w8["mean_wlen_ppm"])
        + F.col("stopword_ppm") * F.lit(w8["stopword_ppm"])
        + F.col("digit_word_ppm") * F.lit(w8["digit_word_ppm"])
    ).cast("long")
    return feat.select(
        "*",
        score.alias("score"),
        (score >= F.lit(keep_threshold)).alias("keep"),
    )


def cap_per_source(
    df: DataFrame,
    max_per_source: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain volume caps (data-mixing downsampling): keep at most
    ``max_per_source`` docs per source, chosen by deterministic hash rank
    so re-runs and engines agree without a seed. Output keeps every row
    with its rank and the keep flag — callers filter ``kept``.

    Scale shape: one window shuffle keyed by source. Hot sources are
    exactly the ones being capped, so the skewed key's partition does a
    bounded top-K sort; for extreme skew compose with pre-aggregation
    or use rank-over-sample thresholds.
    """
    from iowa_liquor_sales_spark.functions.hashing import hash60
    from pyspark.sql import Window

    h = hash60(F.concat(F.lit("cap"), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h, F.col(id_col))
    return df.select(
        F.col(id_col),
        F.col(source_col),
        F.row_number().over(w).cast("int").alias("cap_rank"),
    ).withColumn("kept", F.col("cap_rank") <= max_per_source)


def temperature_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain-mixing weights (multilingual-LM style,
    p_i ∝ n_i^alpha): per-source token mass, the natural sampling
    probability, the temperature-flattened probability, and the implied
    per-source epoch multiplier (p_temp / p_raw) to feed
    :func:`mix_epochs`. alpha < 1 up-weights small sources.

    One map-side-combinable aggregate to O(sources) rows, then the two
    corpus totals join back via a broadcast of that tiny relation —
    nothing beyond the first aggregate scales with corpus size."""
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    # Fixed-point tempered mass: n^alpha quantized to an integer (x2^20)
    # per source BEFORE the total, so the normalizing sum is an exact
    # integer (a float sum of pow() terms is partition-order dependent).
    # alpha=0.5 routes through sqrt - IEEE-correctly-rounded everywhere,
    # unlike libm pow.
    powv = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    )
    q = F.floor(powv * F.lit(1048576.0)).cast("long")
    per = per.withColumn("pw_q20", q)
    tot = per.agg(
        F.sum("n_tokens").cast("double").alias("tot_tokens"),
        F.sum("pw_q20").cast("double").alias("tot_pow"),
    )
    p_raw = F.col("n_tokens").cast("double") / F.col("tot_tokens")
    p_temp = F.col("pw_q20").cast("double") / F.col("tot_pow")
    return per.crossJoin(F.broadcast(tot)).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.floor(p_raw * F.lit(1e9)).cast("long").alias("p_raw_ppb"),
        F.floor(p_temp * F.lit(1e9)).cast("long").alias("p_temp_ppb"),
        F.floor(p_temp / p_raw * F.lit(1e6)).cast("long").alias(
            "epochs_micro"
        ),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap quality /
    repetition signal (highly compressible text is boilerplate or spam;
    incompressible text is noise or binary junk; natural prose sits in
    the middle band). Used as a filter feature in large-scale corpus
    curation pipelines alongside :func:`repetition_ratio`.

    Compression is genuinely non-SQL-expressible, so this is the one
    declared query with NO DuckDB oracle (rows-only driver check); the
    exact byte counts are still deterministic — zlib with a fixed
    ``level`` is a stable, versioned format — and are pinned by unit
    test. Runs as Arrow-batched ``mapInPandas`` (one Python hop per
    batch, never per row); the emitted ``ratio_ppm`` is integer
    (``comp_len·1e6 div raw_len``), so downstream thresholds are
    engine-portable.
    """
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("raw_len", T.IntegerType()),
            T.StructField("comp_len", T.IntegerType()),
            T.StructField("ratio_ppm", T.LongType()),
        ]
    )

    def _cr(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            raw_len = raw.map(len)
            comp_len = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "raw_len": raw_len.astype("int32"),
                    "comp_len": comp_len.astype("int32"),
                    "ratio_ppm": (
                        comp_len * 1_000_000 // raw_len.clip(lower=1)
                    ).astype("int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(_cr, schema)


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quantile normalization across sources: remap every group's score
    distribution onto the GLOBAL score distribution, so a "0.9-quantile
    doc" means the same thing in every source — the cross-source score
    alignment step before mixing/filtering corpora whose raw quality
    scales differ (one crawler's length distribution is another's tail).

    Dataflow: a per-group rank window (hash-partitioned by group), the
    global total order via :func:`~.ranking.global_row_number` (range
    shuffle — NEVER a 1-partition window), and one equi-join on the
    integer target rank. The within-group quantile ``(rn-1)/(cnt-1)``
    maps to target rank ``round(q·(N-1)) + 1``; singleton groups pin to
    the median. All rank math is integer-exact.

    Returns (id, group, score, norm_score).
    """
    from pyspark.sql import Window

    from iowa_liquor_sales_spark.operators.ranking import global_row_number

    scored = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(score_col).alias("score"),
    )
    n_total = scored.count()
    wg = Window.partitionBy("grp").orderBy("score", "id")
    ranked = scored.withColumn(
        "rn", F.row_number().over(wg)
    ).withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    target = F.when(
        F.col("cnt") == 1, F.lit((n_total - 1) // 2 + 1)
    ).otherwise(
        F.round(
            (F.col("rn") - 1)
            / (F.col("cnt") - 1)
            * F.lit(n_total - 1),
            0,
        ).cast("long")
        + 1
    )
    glob = global_row_number(
        scored.select("score", F.col("id").alias("gid")),
        ["score", "gid"],
        out_col="grn",
    ).select(F.col("grn").alias("trank"), F.col("score").alias("norm_score"))
    return (
        ranked.withColumn("trank", target)
        .join(glob, "trank")
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "score",
            "norm_score",
        )
    )


def embedding_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tau_centi: int = 90,
) -> DataFrame:
    """Embedding-similarity test-set decontamination: flag every corpus
    vector whose cosine to ANY eval vector reaches ``tau_centi/100`` —
    the semantic companion to n-gram decontamination (paraphrased eval
    leakage that shingle overlap misses).

    Exactness: components quantize to an e6 integer grid, dots and norms
    are exact integer sums, and the cosine threshold is the all-integer
    cross-multiplication ``10000*dot^2 >= tau^2*na2*nb2`` (with dot > 0)
    evaluated in DECIMAL(38,0) — no float anywhere, so the verdict is
    bit-portable across engines.

    Scale shape: the eval side is tiny (thousands of rows) and joins
    BROADCAST on the component position; the corpus never shuffles on
    anything but its own id. Work is O(corpus * eval * dim) multiplies
    spread across executors — for large eval sets swap the inner join
    for the IVF-bucketed candidate path (same verdict expression).
    """
    qz = lambda c: F.floor(c.cast("double") * 1e6 + 0.5).cast("long")
    ccomp = corpus.select(
        F.col(id_col).alias("cid"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).select("cid", "pos", qz(F.col("x")).alias("qc"))
    ecomp = eval_df.select(
        F.col(id_col).alias("eid"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).select("eid", "pos", qz(F.col("x")).alias("qe"))
    cnorm = ccomp.groupBy("cid").agg(
        F.sum(F.col("qc") * F.col("qc")).alias("na2")
    )
    enorm = ecomp.groupBy("eid").agg(
        F.sum(F.col("qe") * F.col("qe")).alias("nb2")
    )
    dots = (
        ccomp.join(F.broadcast(ecomp), "pos")
        .groupBy("cid", "eid")
        .agg(F.sum(F.col("qc") * F.col("qe")).alias("dot"))
    )
    d = F.col("dot").cast("decimal(38,0)")
    hit = (
        dots.join(cnorm, "cid")
        .join(F.broadcast(enorm), "eid")
        .filter(
            (F.col("dot") > 0)
            & (
                d * d * 10000
                >= F.lit(tau_centi * tau_centi)
                * F.col("na2").cast("decimal(38,0)")
                * F.col("nb2")
            )
        )
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_eval_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("cid"))
        .join(hit, "cid", "left")
        .select(
            F.col("cid").alias(id_col),
            F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias(
                "n_eval_hits"
            ),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", reduced to unigram
    bag models): per-document log importance weight

        log w(x) = sum_w c_w(x) * [ ln p_target(w) - ln p_corpus(w) ]

    with add-1-smoothed unigram probabilities over the SHARED vocabulary.
    Documents that look more like the target domain get higher weight;
    resampling by w(x) shifts the corpus mixture toward the target.

    Exactness: each per-word log-ratio floor-scales to an integer
    (nano) BEFORE the per-document sum, so the reduction is an exact
    ``c_w * term_nano`` int64 sum — engine-portable like every other
    floor-scaled statistic here.

    Scale shape: one corpus explode (scan-bound) -> per-(doc, word)
    counts -> a word-keyed join against the O(vocabulary) stats relation
    (AQE handles stopword skew) -> one map-side-combinable per-doc sum.
    The target-side pass is the same shape over the (small) target set.
    """
    w_corpus = corpus.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    w_target = target.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    # One corpus explode total: per-(doc, word) counts roll up to the
    # corpus word counts (sum of cw) instead of a second explode+scan.
    doc_counts = w_corpus.groupBy(id_col, "w").agg(
        F.count(F.lit(1)).alias("cw")
    )
    cr = doc_counts.groupBy("w").agg(F.sum("cw").alias("cr"))
    ct = w_target.groupBy("w").agg(F.count(F.lit(1)).alias("ct"))
    stats = cr.join(ct, "w", "left").select(
        "w", "cr", F.coalesce("ct", F.lit(0)).alias("ct")
    )
    tot = stats.agg(
        F.sum("cr").cast("double").alias("nr"),
        F.sum("ct").cast("double").alias("nt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    term = F.log(
        (F.col("ct") + 1) / (F.col("nt") + F.col("v"))
    ) - F.log((F.col("cr") + 1) / (F.col("nr") + F.col("v")))
    scored = stats.crossJoin(F.broadcast(tot)).select(
        "w", F.floor(term * F.lit(1e9)).cast("long").alias("term_nano")
    )
    return (
        doc_counts.join(scored, "w")
        .groupBy(id_col)
        .agg(
            F.sum("cw").cast("long").alias("n_tokens"),
            F.sum(F.col("cw") * F.col("term_nano")).alias("logw_nano"),
        )
    )


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy best-first corpus selection under a token budget: keep
    documents in (quality desc, id asc) order while the running token
    sum stays within ``budget_tokens`` — "fill a 10B-token training mix
    with the best documents first", the final gate of every curation
    pipeline after scoring/filtering/dedup.

    Semantics are EXACTLY the naive prefix scan (a document is kept iff
    its running cumulative token count <= budget), but the plan never
    sorts the corpus globally. Two phases:

    1. one map-side-combinable aggregate onto the integer QUALITY LEVEL
       relation (O(distinct quality scores) rows — scores are integer
       grid values per the engine's standard quantize contract), plus a
       cumulative window over that tiny relation, finds the last level
       that fits ENTIRELY in budget and the residual budget for the
       next (boundary) level;
    2. full levels pass with a bare filter (embarrassingly parallel);
       only the single boundary level pays a within-level cumulative
       token sum — and that prefix sum runs through the DISTRIBUTED
       ranker machinery (:func:`.ranking.global_cumsum`: range shuffle
       + per-partition offsets), NOT a single-partition
       ``Window.partitionBy(level)``. Quality scores sit on a coarse
       integer grid (the engine's quantize contract), so a heavy modal
       level — a classifier pinning much of the corpus to one ppm
       bucket — is the COMMON case, not a corner; with the old window
       the boundary level was one task sorting that corpus fraction
       (the measured ``rank_window_1part`` x50 blowup, SCALE.md).

    The boundary relation attaches as a 1-row broadcast. All integer
    arithmetic. Returns (id, quality, tokens) of the selected set.
    """
    from pyspark.sql import Window

    from .ranking import global_cumsum

    d = df.select(
        F.col(id_col).alias("id"),
        F.col(quality_col).cast("long").alias("q"),
        F.col(token_col).cast("long").alias("tokens"),
    )
    levels = d.groupBy("q").agg(F.sum("tokens").alias("t"))
    wlev = Window.orderBy(F.col("q").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = levels.withColumn("cum_t", F.sum("t").over(wlev))
    # Last fully-funded level and the residual for the one after it.
    bound = cum.agg(
        # levels run q DESC, so cum_t grows as q falls: the boundary —
        # the FIRST level that no longer fits — is the HIGHEST q whose
        # cumulative exceeds the budget.
        F.max(
            F.when(F.col("cum_t") > budget_tokens, F.col("q"))
        ).alias("boundary_q"),
        F.coalesce(
            F.max(
                F.when(F.col("cum_t") <= budget_tokens, F.col("cum_t"))
            ),
            F.lit(0),
        ).alias("spent"),
    )
    staged = d.join(F.broadcast(bound))
    full = staged.filter(
        F.col("boundary_q").isNull() | (F.col("q") > F.col("boundary_q"))
    )
    # Exactly one level survives this filter, so a window PARTITIONed
    # by q would put the whole boundary level in ONE task; the
    # distributed prefix sum keeps it range-parallel at any skew.
    partial = (
        global_cumsum(
            staged.filter(F.col("q") == F.col("boundary_q")),
            ["id"],
            "tokens",
            out_col="cum_doc",
        )
        .filter(
            F.col("cum_doc") <= F.lit(int(budget_tokens)) - F.col("spent")
        )
        .drop("cum_doc")
    )
    return full.unionByName(partial).select(
        F.col("id").alias(id_col),
        F.col("q").alias("quality"),
        "tokens",
    )


def interleave_by_source(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic source-interleaved training order: documents are
    pseudo-shuffled WITHIN each source (a cheap multiplicative hash of
    the id — reproducible on any engine, unlike a seeded RNG) and then
    round-robined ACROSS sources, so a sequential reader sees the
    mixture ratio locally at every window instead of one source at a
    time — the data-order half of mixture design (the weights half is
    ``mixture_weights``/``per-source caps``).

    Scale contract: NO per-source window (``row_number() OVER
    (PARTITION BY source)`` puts each source's full corpus in one task
    — the modal source dominates a crawl, so that window inherits the
    whole skew). Instead ONE distributed global rank ordered by
    (source, h, id) (:func:`.ranking.global_row_number` — range shuffle
    + per-partition offsets); because sources are contiguous in that
    order, the within-source position is ``rn - first_rn(source) + 1``
    with first_rn from an O(sources) aggregate joined back broadcast.
    The emitted ``order_key = (pos - 1) * n_sources + src_idx`` is a
    strided ORDER KEY (sort by it to read in training order): with
    unequal source sizes it has gaps where exhausted sources drop out
    of the round-robin; re-densifying would cost a second global rank
    and changes nothing about the order.

    Returns (id, source, pos, order_key); deterministic for unique ids.
    """
    from .ranking import global_row_number

    # Multiplicative Fibonacci-ish hash on the integer id — expressible
    # identically in ANSI SQL (no xxhash64 in other engines), good
    # enough to decorrelate the within-source order from id order.
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src"),
    ).withColumn(
        "h",
        (F.col("id").cast("long") * F.lit(2654435761)) % F.lit(1 << 31),
    )
    ranked = global_row_number(d, ["src", "h", "id"], out_col="rn")
    firsts = ranked.groupBy("src").agg(F.min("rn").alias("first_rn"))
    # O(sources) driver state (bounded like the ranking offsets map and
    # the k-means seeds): dense alphabetical index as a broadcast map.
    srcs = sorted(r["src"] for r in firsts.select("src").collect())
    n_src = len(srcs)
    idx_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for s, i in zip(srcs, range(n_src)) for x in (s, i)]
        ),
        F.col("src"),
    )
    return (
        ranked.join(F.broadcast(firsts), "src")
        .select(
            F.col("id"),
            F.col("src").alias(source_col),
            (F.col("rn") - F.col("first_rn") + 1).alias("pos"),
            (
                (F.col("rn") - F.col("first_rn")) * F.lit(n_src) + idx_expr
            ).cast("long").alias("order_key"),
        )
    )


def dedup_cascade_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    max_df: int | float | None = 0.05,
) -> DataFrame:
    """The standard three-stage dedup cascade as ONE composed report:
    exact md5 → normalized md5 (case/punct/whitespace folded) →
    near-dup (exact n-gram Jaccard pairs → transitive CC clusters),
    each stage running only on the previous stage's survivors — the
    funnel a curation pipeline publishes per ingest batch ("how much
    did each rung remove"). Cheap rungs first is the whole economics:
    the expensive pair stage sees only content-distinct documents.

    Per stage one hash aggregate (exact/normalized) or the shared
    df-capped inverted-index pair join + pointer-jumping CC (near-dup);
    the report itself is three 1-row counts — nothing but survivors
    flows between stages.

    Returns 3 rows: (stage_no, stage, n_in, n_out, removed).
    """
    from .dedup import jaccard_pairs, normalize_text, shingles
    from .graph import connected_components

    ids = df.select(F.col(id_col), F.col(text_col))
    # Survivor selection is ONE aggregate per rung, not aggregate +
    # join-back: ids are unique, so min(struct(id, text)) IS the
    # winner row (the min id of the hash group, carrying its own
    # text) — same rows as the old "min id per hash, join ids back"
    # at half the passes and none of the full-text join shuffles.
    # Each rung is persisted: the pair stage (via the CC's eager
    # checkpoint) materializes them in one job, and the three report
    # counts then read the cache instead of replaying the funnel.
    s1 = (
        ids.groupBy(F.md5(F.col(text_col).cast("binary")).alias("h"))
        .agg(F.min(F.struct(F.col(id_col), F.col(text_col))).alias("m"))
        .select(F.col(f"m.{id_col}").alias(id_col), F.col(f"m.{text_col}").alias(text_col))
    )
    s1 = pin(s1)
    s2 = pin(
        s1.groupBy(
            F.md5(normalize_text(text_col).cast("binary")).alias("h")
        )
        .agg(F.min(F.struct(F.col(id_col), F.col(text_col))).alias("m"))
        .select(F.col(f"m.{id_col}").alias(id_col), F.col(f"m.{text_col}").alias(text_col))
    )
    pairs = jaccard_pairs(
        shingles(s2, text_col, id_col, n=3),
        min_jaccard=min_jaccard,
        max_df=max_df,
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    # Project to the id BEFORE the component join: the count only needs
    # ids, and joining the full rung would shuffle every surviving
    # document's text (guide §2.3 — project before the exchange).
    s2k = s2.select(id_col)
    k3 = (
        s2k.join(comp, s2k[id_col] == comp["node"], "left")
        .select(
            F.coalesce(F.col("component"), F.col(id_col)).alias("cmp")
        )
        .agg(F.count_distinct("cmp").cast("long").alias("n"))
    )
    n0 = ids.agg(F.count(F.lit(1)).cast("long").alias("n"))
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def row(no, name, a, b):
        return (
            a.crossJoin(F.broadcast(b.withColumnRenamed("n", "m")))
            .select(
                F.lit(no).cast("int").alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col("n").cast("long").alias("n_in"),
                F.col("m").cast("long").alias("n_out"),
                (F.col("n") - F.col("m")).cast("long").alias("removed"),
            )
        )

    return (
        row(1, "exact", n0, n1)
        .unionByName(row(2, "normalized", n1, n2))
        .unionByName(row(3, "neardup", n2, k3))
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    key_col: str,
    n_folds: int = 5,
    target_scale: int = 100,
) -> DataFrame:
    """Leakage-free (out-of-fold) target encoding: replace a categorical
    feature by the mean target of OTHER folds' rows in the same
    category — THE standard high-cardinality categorical encoder for
    training-data pipelines, and the classic leakage trap when done
    naively (a global category mean includes each row's own label; the
    model then memorizes labels through the feature).

    Folds are the engine-portable md5 hash of the row key
    (``hash60(key) % n_folds`` — deterministic, reproducible in the SQL
    oracle, and stable under repartitioning). One map-side-combinable
    ``groupBy(cat, fold)`` pass gives per-fold sums/counts; the
    out-of-fold mean for fold f is then (total − fold_f) on both the
    numerator and denominator — O(categories · folds) rows, never a
    second data scan, broadcast-joinable back onto the training rows.
    Encoding is exact: floor(target·scale) sums in DECIMAL(38,0), the
    mean on the truncating-div grid (Spark ``div`` == DuckDB ``//``).

    Returns (cat, fold, n_in, n_out, enc) — ``enc`` is the scaled OOF
    mean; NULL when a category exists in only one fold (no out-of-fold
    evidence, the honest "cannot encode" signal callers should
    backfill with the global prior).
    """
    from ..functions.hashing import hash60

    scaled = F.floor(
        F.col(target_col).cast("double") * F.lit(int(target_scale))
    ).cast("decimal(38,0)")
    per_fold = (
        df.select(
            F.col(cat_col).alias("cat"),
            (hash60(F.col(key_col).cast("string")) % F.lit(int(n_folds)))
            .cast("int")
            .alias("fold"),
            scaled.alias("t"),
        )
        .groupBy("cat", "fold")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("cnt"),
            F.sum("t").alias("s"),
        )
    )
    tot = per_fold.groupBy("cat").agg(
        F.sum("cnt").alias("tot_cnt"), F.sum("s").alias("tot_s")
    )
    return (
        per_fold.join(F.broadcast(tot), "cat")
        .select(
            "cat",
            "fold",
            F.col("cnt").cast("long").alias("n_in"),
            (F.col("tot_cnt") - F.col("cnt")).cast("long").alias("n_out"),
            F.expr(
                "CASE WHEN tot_cnt - cnt = 0 THEN NULL"
                " ELSE CAST((tot_s - s) div (tot_cnt - cnt) AS BIGINT)"
                " END"
            ).alias("enc"),
        )
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    top_m: int = 5,
    min_gap: int = 1,
) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training data:
    within each group (topic, source, prompt cluster), pair the top-m
    highest-scoring documents as "chosen" against the bottom-m as
    "rejected", keeping pairs whose score gap clears ``min_gap`` — the
    standard way to mint contrastive pairs from a scored corpus
    without human labels.

    Scale shape: two rank-limited per-group windows (top-m and
    bottom-m — one shuffle on the group key) reduce each group to
    O(m) rows; the pairing is an m×m self-join PER GROUP on the
    already-tiny ranked relations, never corpus×corpus. Ties break by
    id for engine determinism.

    Returns (group, chosen_id, rejected_id, chosen_score,
    rejected_score, gap).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(score_col).cast("long").alias("s"),
    )
    wtop = Window.partitionBy("g").orderBy(
        F.col("s").desc(), F.col("id").asc()
    )
    wbot = Window.partitionBy("g").orderBy(
        F.col("s").asc(), F.col("id").asc()
    )
    top = (
        base.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= int(top_m))
        .select(
            "g",
            F.col("id").alias("chosen_id"),
            F.col("s").alias("chosen_score"),
        )
    )
    bot = (
        base.withColumn("rn", F.row_number().over(wbot))
        .filter(F.col("rn") <= int(top_m))
        .select(
            "g",
            F.col("id").alias("rejected_id"),
            F.col("s").alias("rejected_score"),
        )
    )
    return (
        top.join(bot, "g")
        .filter(
            (F.col("chosen_score") - F.col("rejected_score"))
            >= F.lit(int(min_gap))
        )
        # a document must not be paired with itself (possible when a
        # small group's top-m and bottom-m overlap)
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .select(
            F.col("g").alias(group_col),
            "chosen_id",
            "rejected_id",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "gap"
            ),
        )
    )
