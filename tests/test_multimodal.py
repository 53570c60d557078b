"""Multimodal binary-column plumbing: Arrow-batched feature extraction
over payload bytes, typed metadata struct, and the honest stub boundary."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from iowa_liquor_sales_spark.multimodal.binary_ops import (
    attach_payload,
    decode_image,
    extract_features,
)
from iowa_liquor_sales_spark.schemas import read_table

SF = "/root/testdata/sf0.001"


def test_payload_schema(spark):
    df = attach_payload(read_table(spark, SF, "documents"))
    dt = dict(df.dtypes)
    assert dt["payload"] == "binary"
    assert dt["media_meta"].startswith("struct<mime:string,n_bytes:int")


def test_feature_extraction_matches_expressions(spark):
    docs = read_table(spark, SF, "documents")
    feats = extract_features(attach_payload(docs))
    expected = docs.select(
        "doc_id",
        F.octet_length("text").alias("byte_len"),
        (
            F.length("text") - F.length(F.regexp_replace("text", "a", ""))
        ).cast("int").alias("n_a_bytes"),
    )
    assert feats.exceptAll(expected).count() == 0
    assert expected.exceptAll(feats).count() == 0


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", codec="real")
    fake = decode_image(b"banana", codec="fake")
    assert fake == {"byte_len": 6, "n_a_bytes": 3}
