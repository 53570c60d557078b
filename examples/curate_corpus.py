#!/usr/bin/env python
"""Training-data curation pipeline over the documents + embeddings tables:

    documents --quality filter--> --lang id--> --exact dedup-->
      --cluster near-dup removal (MinHash pairs + embedding pairs
        --> connected components --> one keeper per cluster)
      --> curated parquet with fingerprints and token counts

Every stage is one of the engine's declared operators, composed; this is
the 100 TB corpus-curation shape (each arrow is a DataFrame, nothing
collects to the driver except the final counts).

Usage: python examples/curate_corpus.py [sf_dir] [outdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from iowa_liquor_sales_spark import get_spark  # noqa: E402
from iowa_liquor_sales_spark.operators.curation import (  # noqa: E402
    chunk_documents,
    dedup_lines,
    mix_epochs,
    temperature_weights,
)
from iowa_liquor_sales_spark.operators.dedup import (  # noqa: E402
    duplicated_spans,
    exact_dedup,
    minhash_lsh_pairs,
)
from iowa_liquor_sales_spark.operators.sampling import (  # noqa: E402
    pack_sequences,
    weighted_sample,
)
from iowa_liquor_sales_spark.operators.graph import dedup_clusters  # noqa: E402
from iowa_liquor_sales_spark.operators.similarity import (  # noqa: E402
    ann_recall_report,
    embedding_near_dup_pairs,
    hard_negatives,
)
from iowa_liquor_sales_spark.operators.text import (  # noqa: E402
    fingerprints,
    lang_id,
    quality_metrics,
    term_kl_divergence,
    token_counts,
)
from iowa_liquor_sales_spark.schemas import read_table  # noqa: E402
from iowa_liquor_sales_spark.sources.writers import write_parquet  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01", outdir: str | None = None) -> dict:
    out = outdir or tempfile.mkdtemp(prefix="curated_")
    spark = get_spark(
        app_name="corpus-curation",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop thin/degenerate docs.
    q = quality_metrics(docs)
    keep_q = q.filter(
        (F.col("n_words") >= 20) & (F.col("type_token_ratio") >= 0.05)
    ).select("doc_id")
    docs1 = docs.join(keep_q, "doc_id", "left_semi")

    # 2. exact dedup: keep the min-id copy of identical texts.
    keepers = exact_dedup(docs1, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    docs2 = docs1.join(keepers, "doc_id", "left_semi")

    # 2b. span-level dedup gate (Lee et al.): documents whose text is
    #     mostly cross-document duplicated k-gram spans are boilerplate
    #     templates — drop when >50% of word positions sit in shared
    #     spans. (On a real corpus the spans themselves get CUT; here
    #     the gate keeps the example's row lineage simple.)
    spans = duplicated_spans(docs2, "text", "doc_id", k=5)
    templated = (
        spans.join(q.select("doc_id", "n_words"), "doc_id")
        .filter(F.col("dup_tokens") * 2 > F.col("n_words"))
        .select("doc_id")
    )
    docs2 = docs2.join(templated, "doc_id", "left_anti")

    # 3. near-dup removal, cluster policy: union text (MinHash+LSH,
    #    verified Jaccard >= 0.8) and embedding (cosine >= 0.45) pair
    #    signals into ONE graph, take connected components, keep exactly
    #    one doc per duplicate cluster (the min id). Transitive closure is
    #    the standard fuzzy-dedup policy — A~B and B~C drop both B and C
    #    even when A~C was never directly detected.
    pairs_text = minhash_lsh_pairs(docs2, "text", "doc_id", min_jaccard=0.8).select(
        "doc_a", "doc_b"
    )
    emb = read_table(spark, sf_dir, "embeddings")
    emb_live = emb.join(
        docs2.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    pairs_emb = embedding_near_dup_pairs(emb_live, min_cosine=0.45).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    clusters = dedup_clusters(pairs_text.unionByName(pairs_emb))
    drop = clusters.filter(~F.col("is_keeper")).select("doc_id")
    docs3 = docs2.join(drop, "doc_id", "left_anti")

    # 4. boilerplate removal: units holding >5% of ALL unit instances
    #    drop from every document (corpus-wide line dedup; the synthetic
    #    docs are single-line so the unit is the word — on a real corpus
    #    the unit is the line and the threshold a handful of copies).
    total_units = docs3.select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    hot_threshold = max(total_units // 20, 1)
    docs4 = dedup_lines(
        docs3, "text", "doc_id", sep=" ", max_copies=hot_threshold
    ).filter(F.col("n_lines_kept") > 0)
    docs4 = docs3.select("doc_id", "lang", "source", "n_chars").join(
        docs4.select("doc_id", "text", "n_lines_kept"), "doc_id"
    )

    # 5. importance sampling: downweight the short-doc tail with a
    #    content-keyed hash coin (deterministic across reruns and
    #    repartitions — a rand() sample would reshuffle every run).
    #    Keep probability ramps 0->1 up to 800 chars.
    docs5 = weighted_sample(
        docs4, "doc_id", F.least(F.lit(1.0), F.col("n_chars") / F.lit(800.0))
    )

    # 6. enrich + write curated corpus.
    curated = (
        docs5.join(lang_id(docs5).select("doc_id", "pred_lang"), "doc_id")
        .join(token_counts(docs5), "doc_id")
        .join(fingerprints(docs5), "doc_id")
    )
    write_parquet(curated, out)

    # 7. context layout: overlapping chunks -> fixed-token-budget packed
    #    sequences (what the trainer's data loader reads).
    chunks = chunk_documents(
        curated, "text", "doc_id", max_words=64, overlap=16
    ).withColumn("chunk_key", F.concat_ws(":", "doc_id", "chunk_id"))
    packed = pack_sequences(chunks, "n_words", "chunk_key", budget=256)
    write_parquet(packed, out + "_packed")

    # 8. domain mixing: temperature-flatten per-source token mass
    #    (p_i ∝ n_i^0.5) and replicate documents via integer epochs so
    #    under-represented sources are seen more often — the
    #    multilingual-LM mixing recipe, deterministic end to end.
    tw = temperature_weights(curated, alpha=0.5)
    mixed = mix_epochs(
        curated.join(tw.select("source", "epochs_micro"), "source"),
        F.ceil(F.col("epochs_micro") / F.lit(1000000.0)).cast("int"),
    )

    # 9. drift QA: term-distribution KL between corpus halves — the
    #    "did curation skew the vocabulary" monitor (integer-scaled,
    #    deterministic); near-zero here because the halves are exchangeable.
    drift = term_kl_divergence(
        curated.withColumn("side", (F.col("doc_id") % 2).cast("int")), "side"
    ).first()

    # 10. contrastive-pair prep + retrieval-index QA over the embedding
    #     store: mine hard negatives per anchor (nearest WRONG-pseudo-
    #     label vectors — the triplet/contrastive negative sampler) and
    #     record the probe-1 IVF recall the serving index would deliver,
    #     both exact-integer reports (the index-drift monitor a vector
    #     store runs continuously).
    negs = hard_negatives(emb, n_anchors=4, k=3)
    recall = ann_recall_report(emb, n_queries=4, k=10)
    min_recall = recall.agg(F.min("recall_ppm")).first()[0]

    # 11. estimator QA: before trusting signature-only dedup decisions
    #     at scale, check how far the MinHash estimate strays from the
    #     exact Jaccard on the candidate pairs this very run verified —
    #     worst decile-mean abs error in ppm (Broder-estimator drift
    #     means: widen signatures or re-band).
    from iowa_liquor_sales_spark.operators.dedup import (
        minhash_calibration_report,
    )

    calib = minhash_calibration_report(docs2, "text", "doc_id")
    worst_calib = calib.agg(F.max("mean_abs_err_ppm")).first()[0]

    # 12. leakage-safe split: the SAME near-dup pair graph that drove
    #     cluster dedup (step 3) decides the split UNIT, so no
    #     near-duplicate pair can straddle the train/eval boundary —
    #     per-row hash splits leak memorized eval answers by
    #     construction.
    from iowa_liquor_sales_spark.operators.sampling import (
        leakage_safe_split,
    )

    split = leakage_safe_split(
        curated, pairs_text.unionByName(pairs_emb)
    )
    n_eval = split.filter(F.col("split") != "train").count()

    # 13. token-budget gate: fill a fixed training budget best-first by
    #     quality (regex-token count as the quality proxy here) — the
    #     final selection the trainer's loader actually reads; two-phase
    #     plan (quality-level grid + one boundary-level window), never a
    #     corpus sort.
    from iowa_liquor_sales_spark.operators.curation import (
        select_token_budget,
    )

    budgeted = select_token_budget(
        curated.select("doc_id", "re_tokens", "ws_tokens"),
        budget_tokens=5_000,
        quality_col="re_tokens",
        token_col="ws_tokens",
    )

    stats = {
        "input": n0,
        "after_quality": docs1.count(),
        "after_exact_dedup": docs2.count(),
        "after_cluster_dedup": docs3.count(),
        "after_line_dedup": docs4.count(),
        "after_weighted_sample": docs5.count(),
        "n_chunks": chunks.count(),
        "n_sequences": packed.select("shard", "seq").distinct().count(),
        "mixed_rows": mixed.count(),
        "kl_drift_e9": drift["kl_ab_e9"],
        "n_hard_negatives": negs.count(),
        "ivf_recall_ppm_min": min_recall,
        "minhash_worst_decile_err_ppm": worst_calib,
        "n_eval_split": n_eval,
        "n_budget_selected": budgeted.count(),
        "outdir": out,
    }
    print(stats)
    return stats


if __name__ == "__main__":
    main(*(sys.argv[1:3] or ["/root/testdata/sf0.01"]))
