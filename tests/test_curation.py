"""Corpus-curation operators: decontamination, quantile filtering,
repetition ratio, regex scrubbing, mixture replication, Misra-Gries
heavy hitters (guarantee + mergeability under eviction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.operators.curation import (
    decontaminate,
    mix_epochs,
    quantile_filter,
    repetition_ratio,
    scrub_patterns,
    word_ngrams,
)
from iowa_liquor_sales_spark.operators.sketches import misra_gries
from iowa_liquor_sales_spark.schemas import read_table

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_short_text_is_empty(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b c"), (3, "a b c d")])
    out = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert out[1] == []
    assert out[2] == ["a b c"]
    assert out[3] == ["a b c", "b c d"]


def test_decontaminate_removes_overlapping_docs(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over"),  # shares 5-gram with eval
            (2, "totally unrelated clean training text here"),
            (3, "too short"),
        ],
    )
    eval_df = _docs(spark, [(100, "xx the quick brown fox jumps yy")])
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, eval_df, n=5).collect()
    )
    assert kept == [2, 3]


def test_quantile_filter_keeps_top_half_per_group(spark):
    df = spark.createDataFrame(
        [(i, "g1", i * 10) for i in range(1, 6)]
        + [(i, "g2", 7) for i in range(10, 14)],
        "doc_id long, lang string, n_chars long",
    )
    out = quantile_filter(df, "n_chars", "lang")
    by_group = {
        g: sorted(r["doc_id"] for r in rows)
        for g, rows in [
            (g, out.filter(F.col("lang") == g).collect()) for g in ("g1", "g2")
        ]
    }
    # g1: 5 rows -> keep floor(5/2)=2 largest (doc 5, 4)
    assert by_group["g1"] == [4, 5]
    # g2: all-tie on metric -> deterministic doc_id tiebreak keeps 10, 11
    assert by_group["g2"] == [10, 11]


def test_repetition_ratio_exact_ppm(spark):
    df = _docs(spark, [(1, "a b a b a"), (2, "a b c d"), (3, "x")])
    out = {r["doc_id"]: r.asDict() for r in repetition_ratio(df, n=2).collect()}
    # doc 1 bigrams: ab ba ab ba -> total 4, distinct 2 -> 500000 ppm
    assert out[1]["total_ngrams"] == 4 and out[1]["dup_ppm"] == 500_000
    assert out[2]["dup_ppm"] == 0
    assert out[3]["total_ngrams"] == 0 and out[3]["dup_ppm"] == 0


def test_scrub_patterns_masks_globally(spark):
    df = spark.createDataFrame(
        [(1, "call 555 or 1234 x5")], "id long, t string"
    )
    out = scrub_patterns(df, "t", [("[0-9]+", "<NUM>")]).head()["scrubbed"]
    assert out == "call <NUM> or <NUM> x<NUM>"


def test_mix_epochs_weights(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "zh"), (3, "fr")], "doc_id long, lang string"
    )
    w = (
        F.when(F.col("lang") == "en", 2)
        .when(F.col("lang") == "zh", 0)
        .otherwise(1)
    )
    rows = sorted(
        (r["doc_id"], r["epoch"]) for r in mix_epochs(df, w).collect()
    )
    assert rows == [(1, 1), (1, 2), (3, 1)]


def test_decontaminate_on_testdata_matches_duckdb_rate(spark):
    docs = read_table(spark, SF, "documents")
    ev = docs.filter(F.col("source").isin("src0", "src1"))
    tr = docs.filter(~F.col("source").isin("src0", "src1"))
    kept = decontaminate(tr, ev, n=5).count()
    assert 0 < kept <= tr.count()


# ---------------------------------------------------------------- Misra-Gries


def _skewed(spark):
    # 1000 rows: 'heavy' 400x, 'mid' 200x, tail of 40 keys 10x each
    rows = (
        [("heavy",)] * 400
        + [("mid",)] * 200
        + [(f"t{i}",) for i in range(40) for _ in range(10)]
    )
    return spark.createDataFrame(rows, "k string").repartition(7)


def test_misra_gries_exact_when_k_large(spark):
    df = _skewed(spark)
    out = {r["k"]: r["w"] for r in misra_gries(df, "k", k=100).collect()}
    assert out["heavy"] == 400 and out["mid"] == 200 and out["t0"] == 10


def test_misra_gries_guarantee_under_eviction(spark):
    df = _skewed(spark)
    n = df.count()
    k = 4
    out = {r["k"]: r["w"] for r in misra_gries(df, "k", k=k).collect()}
    assert len(out) <= k
    # every key with freq > n/(k+1) = 200 must survive
    assert "heavy" in out
    true = {"heavy": 400, "mid": 200}
    for key, w in out.items():
        t = true.get(key, 10)
        # never overcount; undercount bounded by n/(k+1)
        assert w <= t
        assert t - w <= n // (k + 1)


def test_chunk_documents_windows(spark):
    from iowa_liquor_sales_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [
            ("d1", "a b c d e f g h i j"),  # 10 words
            ("d2", "x y"),  # shorter than one window
            ("d3", "p q r s"),  # exactly one window
        ],
        "doc_id string, text string",
    )
    out = chunk_documents(
        docs, "text", "doc_id", max_words=4, overlap=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # d1: starts 1,3,5,7 (stride 2, up to n-overlap=8) -> 4 chunks
    d1 = sorted(by_doc["d1"], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in d1] == [0, 1, 2, 3]
    assert d1[0]["chunk_text"] == "a b c d"
    assert d1[1]["chunk_text"] == "c d e f"
    assert d1[3]["chunk_text"] == "g h i j"
    assert all(r["n_words"] == 4 for r in d1)
    # consecutive chunks share exactly `overlap` words
    assert d1[0]["chunk_text"].split()[-2:] == d1[1]["chunk_text"].split()[:2]
    # short doc: one chunk, whole text
    assert len(by_doc["d2"]) == 1 and by_doc["d2"][0]["chunk_text"] == "x y"
    assert by_doc["d2"][0]["n_words"] == 2
    # exact window: one chunk
    assert len(by_doc["d3"]) == 1 and by_doc["d3"][0]["n_words"] == 4


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from iowa_liquor_sales_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([("d", "a b")], "doc_id string, text string")
    with _pytest.raises(ValueError):
        chunk_documents(docs, "text", "doc_id", max_words=4, overlap=4)


def test_dedup_lines_drops_corpus_hot_lines_in_order(spark):
    from iowa_liquor_sales_spark.operators.curation import dedup_lines

    docs = spark.createDataFrame(
        [
            ("d1", "keep one\nBOILER\nkeep two"),
            ("d2", "BOILER\nunique line"),
            ("d3", "BOILER\nonly boiler doc\nBOILER"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            docs, "text", "doc_id", sep="\n", max_copies=2
        ).collect()
    }
    # BOILER appears 4 times (> 2) -> dropped everywhere, order kept
    assert out["d1"]["text"] == "keep one\nkeep two"
    assert out["d1"]["n_lines_kept"] == 2
    assert out["d1"]["n_lines_dropped"] == 1
    assert out["d2"]["text"] == "unique line"
    assert out["d3"]["text"] == "only boiler doc"
    assert out["d3"]["n_lines_dropped"] == 2


def test_dedup_lines_all_dropped_yields_empty_text(spark):
    from iowa_liquor_sales_spark.operators.curation import dedup_lines

    docs = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], "doc_id string, text string"
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            docs, "text", "doc_id", sep="\n", max_copies=1
        ).collect()
    }
    assert all(out[k]["text"] == "" for k in "abc")
    assert all(out[k]["n_lines_kept"] == 0 for k in "abc")


def test_semdedup_keeps_cell_keepers(spark):
    from iowa_liquor_sales_spark.operators.curation import semdedup

    # cells form around the first n_cells ids (training-free quantizer);
    # vec 3 duplicates vec 0 exactly -> dropped; vec 4 is orthogonalish.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [-1.0, 0.5]),
        (3, [1.0, 0.0]),
        (4, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r["vec_id"]: r for r in semdedup(df, n_cells=3, min_cosine=0.95).collect()}
    assert len(got) == 5
    assert got[0]["is_kept"] and got[1]["is_kept"] and got[2]["is_kept"]
    assert not got[3]["is_kept"]          # exact dup of keeper 0
    assert not got[4]["is_kept"]          # cos(v4, v0) = 0.9939 >= 0.95
    # sanity: keeper flag follows cell membership, every cell kept >= 1
    cells = {}
    for r in got.values():
        cells.setdefault(r["cell"], []).append(r["is_kept"])
    assert all(any(flags) for flags in cells.values())


def test_quality_score_linear_exact_features(spark):
    from iowa_liquor_sales_spark.operators.curation import quality_score_linear

    df = spark.createDataFrame(
        [(1, "the cat sat on 9 mats"), (2, "x")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in quality_score_linear(df).collect()}
    r1 = got[1]
    assert r1["n_words"] == 6
    # chars=21, words=6 -> (21-6+1)*1e6 div 6 = 2666666
    assert r1["mean_wlen_ppm"] == 2_666_666
    assert r1["stopword_ppm"] == 1_000_000 // 6 * 1  # 'the' 1/6 -> 166666
    assert r1["digit_word_ppm"] == 166_666
    assert r1["score"] == (
        6 * 3 + 2_666_666 * 2 + 166_666 - 2 * 166_666
    )
    assert not r1["keep"]  # score ~5.2M < 9M


def test_cap_per_source_deterministic(spark):
    from iowa_liquor_sales_spark.operators.curation import cap_per_source

    rows = [(i, f"src{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = cap_per_source(df, max_per_source=3).collect()
    assert len(got) == 10
    per_src = {}
    for r in got:
        per_src.setdefault(r["source"], []).append(r)
    for src, rs in per_src.items():
        assert sorted(r["cap_rank"] for r in rs) == list(range(1, 6))
        assert sum(r["kept"] for r in rs) == 3
    # determinism across invocations
    again = cap_per_source(df, max_per_source=3).collect()
    assert {(r["doc_id"], r["cap_rank"]) for r in again} == {
        (r["doc_id"], r["cap_rank"]) for r in got
    }


def test_temperature_weights_flattens_mix(spark):
    from iowa_liquor_sales_spark.operators.curation import temperature_weights

    # 16:1 token imbalance; alpha=0.5 flattens it to 4:1.
    docs = spark.createDataFrame(
        [("big", " ".join(["w"] * 16)), ("small", "w")],
        ["source", "text"],
    )
    out = {r["source"]: r for r in temperature_weights(docs, alpha=0.5).collect()}
    assert out["big"]["n_tokens"] == 16 and out["small"]["n_tokens"] == 1
    assert (
        abs(out["big"]["p_temp_ppb"] / out["small"]["p_temp_ppb"] - 4.0)
        < 1e-4
    )
    # epochs re-weight the raw mix toward small: small up, big down.
    assert out["small"]["epochs_micro"] > 1_000_000 > out["big"]["epochs_micro"]
    # probabilities each sum to 1 (up to the two output floors).
    assert abs(out["big"]["p_raw_ppb"] + out["small"]["p_raw_ppb"] - 1e9) <= 2
    assert abs(out["big"]["p_temp_ppb"] + out["small"]["p_temp_ppb"] - 1e9) <= 2


def test_quantile_normalize_aligns_source_scales(spark):
    from iowa_liquor_sales_spark.operators.curation import (
        quantile_normalize,
    )

    # Source A scores 0..9, source B scores 1000..1009 (same shape,
    # shifted scale): after normalization the k-th ranked doc of A and
    # of B land on the SAME global value.
    rows = [(i, "a", i) for i in range(10)] + [
        (100 + i, "b", 1000 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = quantile_normalize(df, "source", "n_chars", "doc_id")
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["source"], []).append(
            (r["score"], r["norm_score"])
        )
    a = [ns for _, ns in sorted(by_src["a"])]
    b = [ns for _, ns in sorted(by_src["b"])]
    assert a == b
    # endpoints hit the global extremes
    assert a[0] == 0 and a[-1] == 1009


def test_embedding_decontaminate_flags_near_duplicates(spark):
    from iowa_liquor_sales_spark.operators.curation import (
        embedding_decontaminate,
    )

    ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.99, 0.01, 0.0, 0.0]),   # ~cos 0.9999 -> contaminated
            (2, [0.0, 1.0, 0.0, 0.0]),     # orthogonal -> clean
            (3, [-1.0, 0.0, 0.0, 0.0]),    # anti-parallel -> clean
        ],
        ["vec_id", "embedding"],
    )
    out = {
        r["vec_id"]: r
        for r in embedding_decontaminate(corpus, ev, tau_centi=90).collect()
    }
    assert out[1]["is_contaminated"] and out[1]["n_eval_hits"] == 1
    assert not out[2]["is_contaminated"]
    assert not out[3]["is_contaminated"]


def test_dsir_logweights_favor_target_vocabulary(spark):
    from iowa_liquor_sales_spark.operators.curation import dsir_logweights

    corpus = spark.createDataFrame(
        [
            (1, "hello hello hello world"),
            (2, "foo bar baz qux"),
        ],
        ["doc_id", "text"],
    )
    target = spark.createDataFrame(
        [(10, "hello world hello")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in dsir_logweights(corpus, target).collect()}
    # doc 1 shares the target vocabulary -> higher importance weight than
    # doc 2, whose words never occur in the target.
    assert out[1]["logw_nano"] > out[2]["logw_nano"]
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4


def test_select_token_budget_equals_naive_prefix(spark):
    """The two-phase (level grid + boundary window) plan must reproduce
    the naive global prefix scan exactly — including the partial
    boundary level, budget-0, and budget-covers-everything."""
    import random

    from iowa_liquor_sales_spark.operators.curation import select_token_budget

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(5), 1 + rng.randrange(9)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "q", "tok"])

    def naive(budget):
        out, cum = set(), 0
        for i, q, tok in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += tok
            if cum <= budget:
                out.add(i)
        return out

    total = sum(t for _, _, t in rows)
    for budget in (0, 1, 37, 250, total - 1, total, total + 10):
        got = {
            r["doc_id"]
            for r in select_token_budget(
                df, budget, quality_col="q", token_col="tok"
            ).collect()
        }
        assert got == naive(budget), budget


def test_minhash_lsh_hot_bucket_cap_prunes_mega_buckets(spark):
    """max_bucket drops (band, bucket) groups above the cap BEFORE the
    self-join — on a corpus where every doc lands in the same buckets,
    a small cap removes all pairs; uncapped behavior is unchanged."""
    from iowa_liquor_sales_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(12)],
        ["doc_id", "text"],
    )
    uncapped = minhash_lsh_pairs(docs, "text", "doc_id", min_jaccard=0.9)
    assert uncapped.count() == 12 * 11 // 2  # identical docs: all pairs
    capped = minhash_lsh_pairs(
        docs, "text", "doc_id", min_jaccard=0.9, max_bucket=5
    )
    assert capped.count() == 0  # every bucket holds 12 > 5 docs


def test_target_encode_oof_is_leakage_free(spark):
    from iowa_liquor_sales_spark.operators.curation import target_encode_oof

    rows = [(i, "c" + str(i % 3), float(i % 3) * 10 + (i % 7))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "cat", "t"])
    out = target_encode_oof(
        df, "cat", "t", "k", n_folds=4, target_scale=100
    ).collect()
    # recompute folds/sums in python with the same md5 hash
    import hashlib
    import math

    def fold(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 4

    sums, cnts = {}, {}
    for k, cat, t in rows:
        f = fold(k)
        sums[(cat, f)] = sums.get((cat, f), 0) + math.floor(t * 100)
        cnts[(cat, f)] = cnts.get((cat, f), 0) + 1
    for r in out:
        cat, f = r["cat"], r["fold"]
        tot_s = sum(v for (c, _), v in sums.items() if c == cat)
        tot_n = sum(v for (c, _), v in cnts.items() if c == cat)
        own_s, own_n = sums[(cat, f)], cnts[(cat, f)]
        assert r["n_in"] == own_n and r["n_out"] == tot_n - own_n
        # leakage-free: own fold's rows are excluded from the encoding
        want = (tot_s - own_s) // (tot_n - own_n)
        assert r["enc"] == want
    # a category confined to one fold cannot be encoded (NULL, not 0)
    solo = spark.createDataFrame([(1, "x", 5.0)], ["k", "cat", "t"])
    assert target_encode_oof(solo, "cat", "t", "k").collect()[0]["enc"] is None


def test_preference_pairs_rank_gap_and_self_exclusion(spark):
    from iowa_liquor_sales_spark.operators.curation import preference_pairs

    rows = [
        ("g1", 1, 90), ("g1", 2, 80), ("g1", 3, 30), ("g1", 4, 20),
        ("g2", 5, 50), ("g2", 6, 50),   # tie, zero gap -> excluded
        ("g3", 7, 70),                  # singleton: top==bottom -> none
    ]
    out = {
        (r["g"], r["chosen_id"], r["rejected_id"]): r["gap"]
        for r in preference_pairs(
            spark.createDataFrame(rows, ["g", "id", "s"]),
            "g", "id", "s", top_m=2, min_gap=10,
        ).collect()
    }
    # g1: top-2 {1,2} x bottom-2 {4,3}, all gaps >= 10
    assert out == {
        ("g1", 1, 4): 70, ("g1", 1, 3): 60,
        ("g1", 2, 4): 60, ("g1", 2, 3): 50,
    }
    # min_gap=0 keeps the g2 tie out only via self-exclusion rules:
    # (5,6) and (6,5) have gap 0 >= 0 and differ by id -> included
    out0 = preference_pairs(
        spark.createDataFrame(rows, ["g", "id", "s"]),
        "g", "id", "s", top_m=2, min_gap=0,
    ).filter("g = 'g2'").collect()
    assert {(r["chosen_id"], r["rejected_id"]) for r in out0} == {
        (5, 6), (6, 5)
    }
    # singleton group emits nothing (self pair excluded)
    assert not [k for k in out if k[0] == "g3"]


def test_split_paragraphs_chunk_mode_and_sep_mode(spark):
    from iowa_liquor_sales_spark.operators.dedup import split_paragraphs

    df = spark.createDataFrame(
        [(1, "one two three four five six seven")], ["doc_id", "text"]
    )
    chunks = {
        (r["para_idx"], r["para"])
        for r in split_paragraphs(
            df, "text", "doc_id", sep=None, words_per_chunk=3, min_words=1
        ).collect()
    }
    assert chunks == {
        (0, "one two three"),
        (1, "four five six"),
        (2, "seven"),
    }
    # min_words drops the short tail but keeps ORIGINAL indexes
    kept = {
        r["para_idx"]
        for r in split_paragraphs(
            df, "text", "doc_id", sep=None, words_per_chunk=3, min_words=2
        ).collect()
    }
    assert kept == {0, 1}

    df2 = spark.createDataFrame(
        [(2, "para one here\n\nsecond para here")], ["doc_id", "text"]
    )
    seps = {
        (r["para_idx"], r["para"])
        for r in split_paragraphs(df2, "text", "doc_id").collect()
    }
    assert seps == {(0, "para one here"), (1, "second para here")}


def test_paragraph_neardup_finds_shared_boilerplate(spark):
    from iowa_liquor_sales_spark.operators.dedup import (
        paragraph_neardup_pairs,
    )

    boiler = "terms of service apply to all users of this site always"
    rows = [
        (10, f"alpha beta gamma delta epsilon zeta\n\n{boiler}"),
        (20, f"{boiler}\n\ncompletely different second body text here"),
        (30, "unrelated document with its own words entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = paragraph_neardup_pairs(
        df, "text", "doc_id", sep="\n\n", min_jaccard=0.9, min_words=3
    ).collect()
    assert [
        (r["doc_a"], r["para_a"], r["doc_b"], r["para_b"])
        for r in pairs
    ] == [(10, 1, 20, 0)]
    assert pairs[0]["jaccard"] == 1.0
    # cross_doc_only drops within-doc self-boilerplate
    rows2 = rows + [(40, f"{boiler}\n\n{boiler}")]
    df2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    all_pairs = paragraph_neardup_pairs(
        df2, "text", "doc_id", sep="\n\n", min_jaccard=0.9, min_words=3
    )
    cross = paragraph_neardup_pairs(
        df2,
        "text",
        "doc_id",
        sep="\n\n",
        min_jaccard=0.9,
        min_words=3,
        cross_doc_only=True,
    )
    assert all_pairs.filter("doc_a = doc_b").count() == 1
    assert cross.filter("doc_a = doc_b").count() == 0


def test_dup_span_length_histogram_matches_bruteforce(spark):
    from iowa_liquor_sales_spark.operators.dedup import (
        dup_span_length_histogram,
    )

    # doc 1 and 2 share an 8-word run (two overlapping islands merge to
    # one span of length 8); doc 3 shares nothing
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (1, f"a b c {shared} d e f"),
        (2, f"{shared} x y z q r s t"),
        (3, "p q r s t u v w unique tail words here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["span_len"]: (r["n_spans"], r["n_docs"])
        for r in dup_span_length_histogram(df, "text", "doc_id", k=5).collect()
    }
    # docs 1+2: the 8-word run -> one merged span of 8 in each; docs
    # 2+3 share 'q r s t' (4 words) < k, no gram
    assert got == {8: (2, 2)}


def test_split_paragraphs_literal_sep_and_empty_units(spark):
    # review findings, reproduced live: (a) sep containing regex
    # metacharacters must split on the LITERAL separator (it is
    # regex-quoted internally), (b) empty / multi-space units must not
    # miscount words for the min_words gate
    from iowa_liquor_sales_spark.operators.dedup import split_paragraphs

    df = spark.createDataFrame(
        [(1, "first part|+|second part here")], ["doc_id", "text"]
    )
    got = {
        (r["para_idx"], r["para"])
        for r in split_paragraphs(
            df, "text", "doc_id", sep="|+|", min_words=2
        ).collect()
    }
    assert got == {(0, "first part"), (1, "second part here")}

    # 'a\n\n\n\nb': the empty middle unit counts 0 words (dropped even
    # at min_words=1); 'a  b' counts 2 words, not 3
    df2 = spark.createDataFrame(
        [(2, "one one\n\n\n\ntwo two"), (3, "a  b\n\nc d e")],
        ["doc_id", "text"],
    )
    out = split_paragraphs(df2, "text", "doc_id", sep="\n\n", min_words=1)
    assert out.filter("doc_id = 2").count() == 2  # empty middle dropped
    out3 = split_paragraphs(df2, "text", "doc_id", sep="\n\n", min_words=3)
    kept3 = {r["para"] for r in out3.filter("doc_id = 3").collect()}
    assert kept3 == {"c d e"}  # 'a  b' is 2 words, not 3


def test_paragraph_neardup_long_doc_ids_no_overflow(spark):
    # composite unit id must be computed in int64 even when the id
    # column arrives as int32 (ANSI sessions error at doc_id >= 2148
    # under the default stride without the cast)
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.dedup import (
        paragraph_neardup_pairs,
    )

    boiler = "terms of service apply to all users of this site always"
    rows = [(5000, f"{boiler}"), (6000, f"{boiler}")]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "doc_id", F.col("doc_id").cast("int")
    )
    pairs = paragraph_neardup_pairs(
        df, "text", "doc_id", sep="\n\n", min_jaccard=0.9, min_words=3
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(5000, 6000)]
