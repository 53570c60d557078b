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


def test_resize_images_contract(spark):
    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        attach_payload,
        resize_images,
    )
    from iowa_liquor_sales_spark.schemas import read_table

    docs = attach_payload(read_table(spark, "/root/testdata/sf0.001", "documents"))
    out = resize_images(docs, target_w=8, target_h=4)
    rows = out.limit(5).collect()
    assert all(len(r["payload"]) == 32 for r in rows)
    assert all(r["media_meta"]["target_w"] == 8 for r in rows)
    assert out.count() == docs.count()
    # deterministic fake resample
    a = {r["doc_id"]: bytes(r["payload"]) for r in out.limit(5).collect()}
    b = {r["doc_id"]: bytes(r["payload"]) for r in out.limit(5).collect()}
    assert a == b


def test_sample_frames_fanout(spark):
    import pytest
    from pyspark.sql import functions as F

    from iowa_liquor_sales_spark.multimodal.binary_ops import sample_frames

    df = spark.createDataFrame(
        [(1, bytes(range(200))), (2, b"x" * 64), (3, b"")],
        ["doc_id", "payload"],
    )
    out = sample_frames(df, every_n=2, frame_bytes=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], len(r["frame"])))
    # doc 1: 200 bytes -> frames 0..3 (ceil(200/64)=4), sampled 0 and 2
    assert sorted(by_doc[1]) == [(0, 64), (2, 64)]
    # doc 2: exactly one frame
    assert by_doc[2] == [(0, 64)]
    # doc 3: empty payload -> no frames
    assert 3 not in by_doc
    with pytest.raises(NotImplementedError):
        sample_frames(df, codec="real").count()


def test_ppm_decode_is_real(spark):
    """A real uncompressed image format (binary PPM/P6) through the SAME
    mapInPandas pipeline as the stub codec — header parse + pixel stats
    computed from the actual buffer."""
    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        decode_image,
        extract_features,
    )

    def ppm(w, h, px):
        assert len(px) == w * h * 3
        return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + px

    img1 = ppm(2, 2, b"a" * 12)
    img2 = ppm(3, 1, bytes(range(9)))
    assert decode_image(img1, codec="ppm") == {"byte_len": 12, "n_a_bytes": 12}
    assert decode_image(img2, codec="ppm") == {"byte_len": 9, "n_a_bytes": 0}

    df = spark.createDataFrame(
        [(1, bytearray(img1)), (2, bytearray(img2))], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: (r["byte_len"], r["n_a_bytes"])
        for r in extract_features(
            df, decoder=lambda b: decode_image(bytes(b), codec="ppm")
        ).collect()
    }
    assert got == {1: (12, 12), 2: (9, 0)}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n" + b"a" * 5, codec="ppm")  # truncated
    with _pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...", codec="real")


def test_zppm_decode_roundtrip_matches_ppm(spark):
    """The stdlib compressed-container arm (codec='zppm'): deflating the
    whole P6 file and decoding through decompress -> header parse ->
    pixel math must be BIT-IDENTICAL to decoding the uncompressed PPM —
    both for the feature dict and for the dHash over a Spark column
    compressed by zlib_compress_payloads."""
    import zlib

    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        decode_image,
        image_dhash,
        zlib_compress_payloads,
    )

    def ppm(w, h, px):
        assert len(px) == w * h * 3
        return b"P6\n# zc\n%d %d\n255\n" % (w, h) + px

    img1 = ppm(2, 2, b"a" * 12)
    img2 = ppm(16, 8, bytes(range(256)) + bytes(range(128)))
    for img in (img1, img2):
        assert decode_image(zlib.compress(img, 6), codec="zppm") == decode_image(
            img, codec="ppm"
        )

    df = spark.createDataFrame(
        [(1, bytearray(img2))], "doc_id long, payload binary"
    )
    plain = image_dhash(df, grid_w=8, grid_h=8, codec="ppm").collect()
    comp = image_dhash(
        zlib_compress_payloads(df), grid_w=8, grid_h=8, codec="zppm"
    ).collect()
    assert [r.asDict() for r in plain] == [r.asDict() for r in comp]

    import pytest as _pytest

    # A non-zlib payload must fail loudly, not parse garbage.
    with _pytest.raises(Exception):
        decode_image(img1, codec="zppm")


def test_audio_frame_rms_known_values(spark):
    import math

    from iowa_liquor_sales_spark.multimodal.binary_ops import audio_frame_rms

    # 4 bytes -> two LE uint16 samples: 0x0201=513, 0x0403=1027; plus a
    # trailing odd byte that must be dropped.
    df = spark.createDataFrame(
        [(1, bytes([1, 2, 3, 4, 9]))], ["doc_id", "payload"]
    )
    rows = audio_frame_rms(df, frame_samples=2).collect()
    assert len(rows) == 1
    r = rows[0]
    expected = math.floor(math.sqrt((513**2 + 1027**2) / 2) * 1000 + 0.5)
    assert (r["frame_id"], r["n_samples"], r["rms_e3"]) == (0, 2, expected)


def test_scene_changes_flags_content_jump(spark):
    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        attach_payload,
        scene_changes,
    )

    # 3 full 64-byte frames: two identical quiet frames, then a jump of
    # ~('z'-'a')=25 per byte -> delta 1600 >= threshold 1500.
    text = "a" * 64 + "a" * 64 + "z" * 64 + "tail"
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = {
        r["frame_idx"]: r
        for r in scene_changes(attach_payload(docs)).collect()
    }
    # ragged tail frame excluded: deltas only at frame 1 and 2
    assert set(out) == {1, 2}
    assert out[1]["delta_l1"] == 0 and not out[1]["is_scene_change"]
    assert out[2]["delta_l1"] == 25 * 64 and out[2]["is_scene_change"]


def test_image_dhash_known_pixels_and_pooling(spark):
    from iowa_liquor_sales_spark.multimodal.binary_ops import image_dhash

    # 4x2 image, pooled 2x1 to a 2x2 grid: one bit per row comparing the
    # left pooled cell to the right. Row 0 bytes make left gray > right;
    # row 1 the opposite — expected hash = bit 0 set, bit 2 clear.
    # Pixels: row 0 = [9,9,9, 9,9,9, 0,0,0, 0,0,0] -> pooled 9 vs 0
    #         row 1 = [0,0,0, 0,0,0, 9,9,9, 9,9,9] -> pooled 0 vs 9
    row0 = bytes([9] * 6 + [0] * 6)
    row1 = bytes([0] * 6 + [9] * 6)
    payload = b"P6\n4 2\n255\n" + row0 + row1
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    out = image_dhash(df, grid_w=2, grid_h=2).collect()
    # bit layout: bit (r * (grid_w-1) + c); grid_w=2 -> bit r
    assert out[0]["dhash"] == 0b01

    # non-multiple dims must refuse, not silently mis-pool
    import pytest

    bad = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    with pytest.raises(Exception, match="integer multiple"):
        image_dhash(bad, grid_w=3, grid_h=2).collect()


def test_dhash_hamming_pairs_matches_brute_force(spark):
    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        dhash_hamming_pairs,
    )

    hashes = [
        (1, 0b0000000000000000),
        (2, 0b0000000000000111),  # hamming 3 from 1
        (3, 0b0000111100001111),  # hamming 8 from 1
        (4, 0b0000111100001110),  # hamming 1 from 3
        (5, 0b0000000000000000),  # hamming 0 from 1
    ]
    df = spark.createDataFrame(hashes, ["doc_id", "dhash"])
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_hamming_pairs(
            df, bits=16, bands=4, max_hamming=3
        ).collect()
    }
    want = {}
    for i, (ida, ha) in enumerate(hashes):
        for idb, hb in hashes[i + 1:]:
            d = bin(ha ^ hb).count("1")
            if d <= 3:
                want[(ida, idb)] = d
    assert got == want and (1, 2) in got and (3, 4) in got and (1, 5) in got


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed")
def test_pil_decode_matches_ppm_contract(spark):
    """codec='pil' must hand the SAME (w, h, rgb) tuple to the pixel
    consumers as the dependency-free PPM parse: dHash of a PNG-encoded
    image equals dHash of its PPM twin, and decode_image's feature dict
    matches. Skipped where PIL is absent (this sandbox); real on any
    cluster image with pillow."""
    import io

    from PIL import Image

    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        _pil_dims_pixels,
        decode_image,
        image_dhash,
    )

    w, h = 16, 8
    rgb = bytes((i * 7 + c * 31) % 256 for i in range(w * h) for c in range(3))
    ppm = b"P6\n%d %d\n255\n" % (w, h) + rgb
    buf = io.BytesIO()
    Image.frombytes("RGB", (w, h), rgb).save(buf, format="PNG")
    png = buf.getvalue()

    assert _pil_dims_pixels(png) == (w, h, rgb)
    assert decode_image(png, codec="pil") == decode_image(ppm, codec="ppm")

    df = spark.createDataFrame(
        [(0, png), (1, png)], "doc_id long, payload binary"
    )
    df_ppm = spark.createDataFrame(
        [(0, ppm), (1, ppm)], "doc_id long, payload binary"
    )
    got_pil = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(df, grid_w=8, grid_h=8, codec="pil").collect()
    }
    got_ppm = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(df_ppm, grid_w=8, grid_h=8).collect()
    }
    assert got_pil == got_ppm


def test_pil_gate_raises_cleanly_without_pil():
    """The compressed-decode arm must fail with the documented
    NotImplementedError (not an ImportError traceback) when PIL is
    absent, keeping the dependency-free codecs usable."""
    if _has_pil():
        pytest.skip("PIL installed; gate cannot fire")
    from iowa_liquor_sales_spark.multimodal.binary_ops import decode_image

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG....", codec="pil")


def test_audio_zero_crossings_counts_transitions(spark):
    from iowa_liquor_sales_spark.multimodal.binary_ops import (
        audio_zero_crossings,
    )

    import struct

    # frame of 6 samples alternating below/above the 32768 midpoint:
    # transitions at every adjacent pair -> 5 crossings
    alt = struct.pack("<6H", 0, 40000, 0, 40000, 0, 40000)
    # constant frame: 0 crossings; 300 samples -> frames of 256 + 44
    flat = struct.pack("<300H", *([100] * 300))
    df = spark.createDataFrame(
        [(1, bytearray(alt)), (2, bytearray(flat))], ["doc_id", "payload"]
    )
    out = {
        (r["doc_id"], r["frame_id"]): (r["n_samples"], r["n_crossings"])
        for r in audio_zero_crossings(df, frame_samples=256).collect()
    }
    assert out[(1, 0)] == (6, 5)
    assert out[(2, 0)] == (256, 0)
    assert out[(2, 1)] == (44, 0)
    # frame boundary pair belongs to neither frame: a transition right
    # at the boundary is not counted
    cross = struct.pack("<4H", 0, 0, 40000, 40000)
    d2 = spark.createDataFrame([(3, bytearray(cross))], ["doc_id", "payload"])
    got = {
        r["frame_id"]: r["n_crossings"]
        for r in audio_zero_crossings(d2, frame_samples=2).collect()
    }
    assert got == {0: 0, 1: 0}
