

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
