

def test_tfidf_top_terms_semantics(spark):
    from iowa_liquor_sales_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["word"], r["score_e6"]))
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert [w for _, w, _ in sorted(by_doc[1])] == ["apple", "banana"]
    import math
    assert sorted(by_doc[1])[0][2] == round(2 * math.log(3) * 1e6)
    # doc 3: cherry tf=2 df=2 -> 2*ln(1.5); durian tf=1 df=1 -> ln(3)
    assert [w for _, w, _ in sorted(by_doc[3])] == ["durian", "cherry"]
    # every doc emits at most k rows
    assert all(len(v) <= 2 for v in by_doc.values())


def test_winnow_shared_run_guarantees_shared_fp(spark):
    from iowa_liquor_sales_spark.operators.text import winnow_fingerprints

    # docs 1 and 2 share a run of 8 words (= w + k - 1 with k=4, w=5):
    # winnowing guarantees at least one common fingerprint.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, "intro words " + shared + " tail one"),
            (2, shared + " completely different ending here"),
            (3, "nothing in common with the others at all"),
            (4, "shorty"),  # < k words: no fingerprints
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, w=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-word run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc
    # doc with >= k but < w+k-1 words keeps its single global min
    tiny = spark.createDataFrame([(9, "a b c d e")], ["doc_id", "text"])
    assert winnow_fingerprints(tiny, "text", "doc_id", k=4, w=5).count() == 1


def test_dup_ngram_stats_exact(spark):
    from iowa_liquor_sales_spark.operators.text import dup_ngram_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "q")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in dup_ngram_stats(df, n=2).collect()}
    # doc1 2-grams: [a b, b a, a b, b a] -> 4 grams, 2 distinct -> 500000
    assert got[1]["n_ngrams"] == 4 and got[1]["dup_ppm"] == 500_000
    assert got[2]["n_ngrams"] == 2 and got[2]["dup_ppm"] == 0
    assert got[3]["n_ngrams"] == 0 and got[3]["dup_ppm"] == 0


def test_word_entropy_exact_values(spark):
    import math

    from iowa_liquor_sales_spark.operators.text import word_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # single symbol: entropy 0
            (2, "a b a b"),          # uniform over 2: entropy 1 bit
            (3, "a b c d"),          # uniform over 4: entropy 2 bits
            (4, "a a a b"),          # 3/4,1/4
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in word_entropy(docs).collect()}
    assert out[1]["entropy_nanobits"] == 0
    assert out[2]["entropy_nanobits"] == 1_000_000_000
    assert out[3]["entropy_nanobits"] == 2_000_000_000
    expected = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    # sum of two per-term floors: within 2 nano-bits of the float value
    assert abs(out[4]["entropy_nanobits"] - expected * 1e9) <= 2
    assert out[4]["n_words"] == 4


def test_length_histogram_buckets(spark):
    from iowa_liquor_sales_spark.operators.text import length_histogram

    docs = spark.createDataFrame(
        [
            (1, "w"),                      # 1 word  -> exp 0
            (2, "w w w"),                  # 3 words -> exp 1
            (3, "w w"),                    # 2 words -> exp 1
            (4, " ".join(["w"] * 8)),      # 8 words -> exp 3
        ],
        ["doc_id", "text"],
    )
    out = {r["bucket_exp"]: r for r in length_histogram(docs).collect()}
    assert set(out) == {0, 1, 3}
    assert out[1]["n_docs"] == 2
    assert out[1]["bucket_lo"] == 2
    assert out[1]["total_words"] == 5
    assert (out[1]["min_words"], out[1]["max_words"]) == (2, 3)
    assert out[3]["bucket_lo"] == 8


def test_pmi_bigrams_collocation_beats_chance(spark):
    import math

    from iowa_liquor_sales_spark.operators.text import pmi_bigrams

    # "new york" always co-occurs; "the cat/dog/car" is dispersed.
    docs = spark.createDataFrame(
        [
            (1, "new york new york new york"),
            (2, "the cat saw the dog near the car"),
            (3, "new york again and the cat too"),
        ],
        ["doc_id", "text"],
    )
    out = {(r["w1"], r["w2"]): r for r in pmi_bigrams(docs, min_count=2).collect()}
    assert ("new", "york") in out
    ny = out[("new", "york")]
    assert ny["c12"] == 4 and ny["c1"] == 4 and ny["c2"] == 4
    # every "new" is followed by "york": PMI = ln(p(ab)/(p(a)p(b))) > 0
    assert ny["pmi_micro"] > 0
    n_uni, n_big = 21.0, 18.0
    expected = math.log((4 / n_big) / ((4 / n_uni) * (4 / n_uni)))
    assert ny["pmi_micro"] == math.floor(expected * 1e6)


def test_feature_hash_buckets_partition_words(spark):
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.text import feature_hash

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "x")], ["doc_id", "text"]
    )
    out = feature_hash(docs, n_buckets=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    # bucket counts partition the words exactly
    assert sum(rows[1][f"f{i}"] for i in range(8)) == 4
    assert sum(rows[2][f"f{i}"] for i in range(8)) == 1
    # deterministic: same input, same vector
    again = {r["doc_id"]: r for r in feature_hash(docs, n_buckets=8).collect()}
    assert rows[1] == again[1]


def test_ngram_lm_continuation_types(spark):
    from iowa_liquor_sales_spark.operators.text import ngram_lm_counts

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),
            (2, "c b c b"),
            (3, "a d"),
        ],
        ["doc_id", "text"],
    )
    out = {(r["w1"], r["w2"]): r for r in ngram_lm_counts(docs, min_count=2).collect()}
    ab = out[("a", "b")]
    # "a b" occurs 3x; b is preceded by {a, c} -> 2 prefix types;
    # a is followed by {b, d} -> 2 suffix types.
    assert ab["c12"] == 3
    assert ab["prefix_types"] == 2
    assert ab["suffix_types"] == 2
    # thresholded pairs only
    assert ("a", "d") not in out


def test_bm25_monotone_in_tf(spark):
    from iowa_liquor_sales_spark.operators.text import bm25_scores

    # Query terms are the highest-df words: 'common' (df=3). Doc 2 has it
    # twice -> higher BM25 than doc 1 (same length); doc 3 is longer, so
    # its single hit scores below doc 1's.
    docs = spark.createDataFrame(
        [
            (1, "common a1 a2"),
            (2, "common common b1"),
            (3, "common c1 c2 c3 c4 c5 c6"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, n_query_terms=1).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["bm25_e9"] > out[1]["bm25_e9"] > out[3]["bm25_e9"]
    assert all(r["n_matched"] == 1 for r in out.values())


def test_duplicated_spans_merges_overlaps(spark):
    from iowa_liquor_sales_spark.operators.dedup import duplicated_spans

    # Docs 1 and 2 share a 6-word run -> two overlapping 5-gram spans
    # that must merge into ONE island covering 6 tokens in each doc.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"{shared} tail one"),
        (2, f"head {shared}"),
        (3, "completely different words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicated_spans(df, k=5).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_dup_grams"] == 2
        assert out[d]["n_spans"] == 1
        assert out[d]["dup_tokens"] == 6


def test_duplicated_spans_ignores_intra_doc_repeats(spark):
    from iowa_liquor_sales_spark.operators.dedup import duplicated_spans

    # A 5-gram repeated WITHIN one doc only is not cross-document.
    rep = "one two three four five"
    df = spark.createDataFrame(
        [(1, f"{rep} x {rep}"), (2, "nothing in common with that doc")],
        ["doc_id", "text"],
    )
    assert duplicated_spans(df, k=5).count() == 0


def test_duplicated_spans_short_docs_yield_nothing(spark):
    from iowa_liquor_sales_spark.operators.dedup import duplicated_spans

    # Docs shorter than k words must produce no grams (sequence(1,0)
    # descending-guard regression test).
    df = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], ["doc_id", "text"]
    )
    assert duplicated_spans(df, k=5).count() == 0


def test_term_kl_divergence_zero_for_identical_sides(spark):
    from iowa_liquor_sales_spark.operators.text import term_kl_divergence

    # Identical term distributions on both sides -> KL exactly 0 in both
    # directions (smoothing keeps p == q per term).
    rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma")]
    df = spark.createDataFrame(rows, ["side", "text"])
    out = term_kl_divergence(df, "side").collect()[0]
    assert out["n_terms"] == 3
    assert out["kl_ab_e9"] == 0 and out["kl_ba_e9"] == 0


def test_term_kl_divergence_detects_drift(spark):
    from iowa_liquor_sales_spark.operators.text import term_kl_divergence

    # Side 1 replaces half its vocabulary: KL must be clearly positive
    # both ways, and grow with the drift.
    a = [(0, "common words shared across both sides here")] * 5
    mild = a + [(1, "common words shared across both sides here")] * 4 + [
        (1, "novel tokens appear now")
    ]
    wild = a + [(1, "entirely new vocabulary everywhere now present")] * 5
    df_m = spark.createDataFrame(mild, ["side", "text"])
    df_w = spark.createDataFrame(wild, ["side", "text"])
    m = term_kl_divergence(df_m, "side").collect()[0]
    w = term_kl_divergence(df_w, "side").collect()[0]
    assert m["kl_ab_e9"] > 0 and m["kl_ba_e9"] > 0
    assert w["kl_ab_e9"] > m["kl_ab_e9"]


def test_gopher_quality_rules(spark):
    from iowa_liquor_sales_spark.operators.text import gopher_quality

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over lazy dogs today"),  # passes
            (2, "a b"),                                   # too few words
            (3, "the 1 2 3 4 5 6 7 8 9"),                 # alpha frac low
            (4, "zz yy xx ww vv uu tt"),                  # no stopword
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[1]["passes"]
    assert not out[2]["ok_nwords"]
    assert not out[3]["ok_alpha"]
    assert not out[4]["ok_stop"] and not out[4]["passes"]


def test_repetition_stats_interval_union(spark):
    from iowa_liquor_sales_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # "a b c d e" repeated twice + tail: the repeated 5-gram
            # family covers the full 12 tokens (overlapping duplicated
            # grams union into one span); top bigram "a b" occurs 3x
            # (positions 1, 6, and the trailing "a b").
            (1, "a b c d e a b c d e a b"),
            # no repetition at all
            (2, "one two three four five six"),
            # degenerate run: bigram "x x" occurs 5x over 6 tokens ->
            # raw overlapping coverage exceeds 1e6 ppm by design
            (3, "x x x x x x"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["n_tokens"] == 12
    assert out[1]["top_bigram_cnt"] == 3
    assert out[1]["dup5_tokens"] == 12
    assert out[1]["dup5_ppm"] == 1_000_000
    assert out[2]["top_bigram_cnt"] == 1 and out[2]["dup5_tokens"] == 0
    assert out[3]["top_bigram_cnt"] == 5
    assert out[3]["top_bigram_ppm"] > 1_000_000
    assert out[3]["dup5_tokens"] == 6


def test_canonicalize_confusables_folds_known_obfuscations(spark):
    from iowa_liquor_sales_spark.operators.text import (
        canonicalize_confusables,
    )

    rows = [
        (1, "Free Money now"),
        # Cyrillic о/е, zero-width space, doubled blanks, case tweak
        (2, "Free Mоnеy ​NOW"),
        (3, "unrelated text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["canon_text"]
        for r in canonicalize_confusables(df).collect()
    }
    assert got[1] == got[2] == "free money now"
    assert got[3] == "unrelated text"


def test_zipf_slope_synthetic_power_law(spark):
    """A corpus built with token frequencies freq(r) = 1000/r must fit
    slope ~ -1 (ppm grid): the OLS machinery is exact-integer, so the
    check bounds only the ln-grid rounding."""
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.operators.text import zipf_slope

    # one doc per token occurrence keeps the token counter honest
    rows = []
    for r in range(1, 51):
        rows.extend((f"tok{r:03d}",) for _ in range(1000 // r))
    df = spark.createDataFrame(rows, ["text"])
    out = zipf_slope(df, top_n=50).collect()[0]
    assert out["n_terms"] == 50
    assert -1_080_000 <= out["slope_ppm"] <= -920_000


def test_ngram_novelty_near_dup_scores_zero(spark):
    """A verbatim copy later in id order contributes zero novel
    shingles; the original owns them all."""
    from iowa_liquor_sales_spark.operators.text import ngram_novelty

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "one two three four five")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["novelty_ppm"] == 0
    assert out[3]["novelty_ppm"] == 1_000_000
    assert out[1]["n_shingles"] == out[2]["n_shingles"] == 6


def test_script_profile_counts_and_dominant(spark):
    from iowa_liquor_sales_spark.operators.text import script_profile

    cjk = "中文文本"  # 4 ideographs
    rows = [
        (1, "Hello world 42"),
        (2, cjk + " ok"),
        (3, "12345"),
        (4, None),
    ]
    out = {
        r["doc_id"]: r
        for r in script_profile(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    r1 = out[1]
    assert (r1["n_latin"], r1["n_digit"], r1["n_space"]) == (10, 2, 2)
    assert r1["n_cjk"] == 0 and r1["dominant"] == "latin"
    r2 = out[2]
    assert r2["n_cjk"] == 4 and r2["n_latin"] == 2
    assert r2["dominant"] == "cjk"
    assert out[3]["dominant"] == "digit"
    assert out[4]["n_chars"] == 0


def test_ngram_coverage_fraction_is_exact(spark):
    from iowa_liquor_sales_spark.operators.text import ngram_coverage

    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w")], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [
            (10, "a b c d"),      # grams: abc, bcd -> both in train
            (11, "c d e f g"),    # cde in train; def, efg not -> 1/3
            (12, "q r s"),        # qrs not in train -> 0/1
            (13, "a b"),          # too short: no shingles, no row
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_covered"], r["coverage_ppm"])
        for r in ngram_coverage(train, ev, n=3).collect()
    }
    assert out[10] == (2, 2, 1_000_000)
    assert out[11] == (3, 1, 333_333)
    assert out[12] == (1, 0, 0)
    assert 13 not in out


def test_log_odds_ratio_flags_distinguishing_terms(spark):
    from iowa_liquor_sales_spark.operators.text import log_odds_ratio

    import math

    rows = (
        [("a", "apple apple banana common")] * 20
        + [("b", "cherry cherry banana common")] * 20
    )
    out = {
        r["term"]: r
        for r in log_odds_ratio(
            spark.createDataFrame(rows, ["g", "text"]),
            "text", "g", "a", "b", alpha_e3=1000, min_count=5,
        ).collect()
    }
    # apple is pure-A, cherry pure-B, common/banana neutral
    assert out["apple"]["z_ppm"] > 3_000_000
    assert out["cherry"]["z_ppm"] < -3_000_000
    assert abs(out["common"]["z_ppm"]) < 1_000_000
    # python replication of the exact formula for one term
    ca, cb = out["apple"]["cnt_a"], out["apple"]["cnt_b"]
    na = sum(4 for g, _ in rows if g == "a")
    nb = sum(4 for g, _ in rows if g == "b")
    v = len(out)
    num_a, den_a = ca * 1000 + 1000, na * 1000 + v * 1000 - (ca * 1000 + 1000)
    num_b, den_b = cb * 1000 + 1000, nb * 1000 + v * 1000 - (cb * 1000 + 1000)
    delta = (math.log(num_a) - math.log(den_a)
             - math.log(num_b) + math.log(den_b))
    var = 1000.0 / num_a + 1000.0 / num_b
    assert out["apple"]["z_ppm"] == math.floor(delta / math.sqrt(var) * 1e6)


def test_contamination_matrix_dense_zero_fill(spark):
    from iowa_liquor_sales_spark.operators.text import contamination_matrix

    rows = [
        (0, "a b c d e", "trainA"),
        (1, "x y z w v", "trainB"),
        (2, "a b c q r", "eval1"),
        (3, "m n o p q", "eval2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    train = df.filter("source like 'train%'")
    ev = df.filter("source like 'eval%'")
    got = {
        (r["train_source"], r["eval_source"]): (
            r["n_overlap"],
            r["n_eval_grams"],
            r["contamination_ppm"],
        )
        for r in contamination_matrix(train, ev, n=3).collect()
    }
    # dense: all 4 cells present, including zero-overlap ones
    assert set(got) == {
        ("trainA", "eval1"),
        ("trainA", "eval2"),
        ("trainB", "eval1"),
        ("trainB", "eval2"),
    }
    # eval1 has 3-grams {a b c, b c q, c q r}; trainA contains 'a b c'
    assert got[("trainA", "eval1")] == (1, 3, 333_333)
    assert got[("trainB", "eval1")] == (0, 3, 0)
    assert got[("trainA", "eval2")] == (0, 3, 0)
    assert got[("trainB", "eval2")] == (0, 3, 0)
