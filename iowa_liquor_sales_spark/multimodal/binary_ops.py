"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
Arrow-batched ``mapInPandas`` feature extraction.

Design (the part that matters at 100 TB):
- media lives in a ``binary`` column next to a typed metadata struct —
  one row per asset, partition-parallel, no driver involvement;
- decode / feature-extract runs in ``mapInPandas``: Arrow ships columnar
  batches to Python once per batch (not per row), and the UDF's output
  schema is declared so downstream stays fully typed;
- real codec work (image decode, resampling, frame sampling) needs
  libraries not present in this container, so those steps are STUBBED:
  ``decode_image`` raises ``NotImplementedError`` unless given the
  deterministic built-in fake codec. The Spark-side plumbing — schemas,
  batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iowa_liquor_sales_spark.caching import pin

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("n_a_bytes", T.IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media column: utf-8 bytes of the text stand in for an
    encoded asset. Real pipelines read payloads via ``binaryFile`` format
    (``spark.read.format("binaryFile")``) or parquet binary columns."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/utf8").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes, codec: str = "real"):
    """Image decode. Compressed formats (JPEG/PNG/...) decode via PIL
    when it is importable (``codec="pil"``); clusters without PIL get a
    ``NotImplementedError`` from that arm and the uncompressed paths
    below keep working.

    Two codecs are real with NO third-party dependency:
    - ``codec="ppm"`` decodes binary PPM (P6) — an actual uncompressed
      image format — with a pure-Python header parse, so the full
      decode→features path runs end-to-end without native libraries;
    - ``codec="fake"`` is the deterministic byte-stats pseudo-decode used
      by the oracle-checked queries.
    """
    if codec == "fake":
        return {"byte_len": len(payload), "n_a_bytes": payload.count(b"a")}
    if codec == "ppm":
        return _decode_ppm(payload)
    if codec == "zppm":
        pixels = _zppm_dims_pixels(payload)[2]
        return {"byte_len": len(pixels), "n_a_bytes": pixels.count(b"a")}
    if codec == "pil":
        pixels = _pil_dims_pixels(payload)[2]
        return {"byte_len": len(pixels), "n_a_bytes": pixels.count(b"a")}
    raise NotImplementedError(
        "unknown image codec; use codec='pil' (JPEG/PNG/... where PIL is "
        "installed), codec='ppm' (real, uncompressed, dependency-free), "
        "codec='zppm' (zlib-compressed PPM container, stdlib-only) or "
        "codec='fake'"
    )


def _pil_dims_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a COMPRESSED image (JPEG/PNG/WebP/...) to the engine's
    (width, height, raw w*h*3 RGB buffer) contract — the same tuple
    :func:`_ppm_dims_pixels` produces for netpbm, so every pixel
    consumer (:func:`image_dhash`, grayscale pooling, patching) works
    unchanged on compressed corpora wherever PIL is installed. Gated on
    import: this sandbox ships no image libraries, so the arm raises
    ``NotImplementedError`` here and the pytest coverage is
    ``skipif``-gated; the decode itself is ordinary public Pillow API
    (open → convert("RGB") → tobytes)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - exercised sans PIL
        raise NotImplementedError(
            "compressed image decoding needs PIL (pip install pillow on "
            "the cluster image); use codec='ppm' for dependency-free "
            "uncompressed decode"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return img.width, img.height, img.tobytes()


def _ppm_dims_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) payload — ``P6 <w> <h> <maxval>`` header
    with whitespace and ``#`` comments per the netpbm spec — and return
    (width, height, raw w*h*3 RGB pixel buffer)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pixels = payload[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError(f"truncated PPM: want {w * h * 3} bytes, got {len(pixels)}")
    return w, h, pixels


def _ppm_pixels(payload: bytes) -> bytes:
    """Raw RGB pixel buffer of a binary PPM (see :func:`_ppm_dims_pixels`)."""
    return _ppm_dims_pixels(payload)[2]


def _zppm_dims_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a COMPRESSED image container with nothing but the stdlib:
    a zlib-deflated binary PPM (the whole P6 file compressed with
    ``zlib.compress``). Returns the same (width, height, raw w*h*3 RGB
    buffer) contract as :func:`_ppm_dims_pixels` / :func:`_pil_dims_pixels`,
    so every pixel consumer (:func:`image_dhash`, pooling, patching)
    works unchanged on the compressed form. This arm exists so the
    compressed-container code path — decompress, then header parse, then
    pixel math — has an in-sandbox, oracle-checkable exercise even where
    PIL is absent; real JPEG/PNG corpora use ``codec="pil"`` with the
    identical downstream contract."""
    import zlib

    return _ppm_dims_pixels(zlib.decompress(bytes(payload)))


def zlib_compress_payloads(
    df: DataFrame, payload_col: str = "payload", level: int = 6
) -> DataFrame:
    """Compress a binary payload column with zlib (Arrow-batched
    ``pandas_udf``, one Python hop per batch). The writer half of the
    ``codec="zppm"`` container: a corpus staged through this sees its
    decode path exercise the full decompress→parse→pixel-math chain."""

    @F.pandas_udf(T.BinaryType())
    def _comp(s: pd.Series) -> pd.Series:
        import zlib

        return s.map(lambda b: zlib.compress(bytes(b), level))

    return df.withColumn(payload_col, _comp(F.col(payload_col)))


def _decode_ppm(payload: bytes) -> dict:
    """PPM decode to the same feature dict shape as the other codecs,
    computed from the actual pixel buffer (header parse in
    :func:`_ppm_pixels`)."""
    pixels = _ppm_pixels(payload)
    return {"byte_len": len(pixels), "n_a_bytes": pixels.count(b"a")}


def patch_features(
    df: DataFrame,
    patch_bytes: int = 12,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """ViT-style patch extraction over REAL decoded PPM images: decode
    the payload with :func:`_ppm_pixels`, split the pixel buffer into
    fixed ``patch_bytes`` patches, and emit one row per patch with the
    sum of its byte values — the 1→N batch-side fan-out shape every
    vision-preprocessing pipeline needs (patchify → per-patch embed),
    run as Arrow ``mapInPandas`` with a declared schema so downstream
    stays typed. Partition-parallel, no explode, no driver hop.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("patch_idx", T.IntegerType()),
            T.StructField("byte_sum", T.LongType()),
        ]
    )

    def _patches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                pixels = _ppm_pixels(bytes(payload))
                for p in range(0, len(pixels), patch_bytes):
                    chunk = pixels[p : p + patch_bytes]
                    ids.append(int(doc_id))
                    idxs.append(p // patch_bytes)
                    sums.append(sum(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "patch_idx": pd.Series(idxs, dtype="int32"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_patches, schema)


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the transfer columnar and amortized per batch;
    the declared output schema keeps Catalyst fully informed downstream.
    """
    dec = decoder or (lambda b: decode_image(b, codec="fake"))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": feats.map(lambda d: d["byte_len"]).astype("int32"),
                    "n_a_bytes": feats.map(lambda d: d["n_a_bytes"]).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, FEATURE_SCHEMA)


GROUP_NORM_SCHEMA = T.StructType(
    [
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_custkey", T.LongType()),
        T.StructField("z_micro", T.LongType()),
    ]
)


def group_normalize(df: DataFrame, group_col: str = "c_mktsegment") -> DataFrame:
    """Grouped-map Arrow UDF (``applyInPandas``): z-score a measure within
    each group. Exists to exercise the grouped-map API — each group's rows
    are shipped to Python as ONE Arrow batch (so groups must fit in
    memory; for unbounded groups use window functions, which compute the
    same thing JVM-side — that expression twin is this operator's oracle).

    Exactness: mean/variance come from EXACT arbitrary-precision integer
    sums (numpy object-dtype reduction — an int64 accumulator would wrap
    silently once per-group squared-cents sums pass 2^63, around sf1),
    converted to double through the same truncation hi/lo split as
    det_double / det_double_sql (a direct float(int) is correctly rounded
    — a DIFFERENT result from the two-term reconstruction past 2^53), the
    z formula is per-element + - / sqrt, and the output is floor(z * 1e6)
    BIGINT — the Python kernel is bit-identical to the SQL window twin.
    """
    import math

    import numpy as np

    from ..functions.sums import det_double_py

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(
            pdf["c_acctbal"].to_numpy(dtype="float64") * 100
        ).astype("int64")
        n = len(cents)
        s = det_double_py(int(cents.sum(dtype=object)))
        ss = det_double_py(int((cents * cents).sum(dtype=object)))
        sd = (
            math.sqrt((ss - s * s / n) / (n - 1))
            if n > 1
            else 0.0
        )
        if sd > 0:
            z_micro = np.floor(
                (cents - s / n) / sd * 1e6
            ).astype("int64")
        else:
            z_micro = np.zeros(n, dtype="int64")
        return pd.DataFrame(
            {
                "c_mktsegment": pdf[group_col],
                "c_custkey": pdf["c_custkey"],
                "z_micro": z_micro,
            }
        )

    return df.groupBy(group_col).applyInPandas(_norm, GROUP_NORM_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("target_w", T.IntegerType()),
                    T.StructField("target_h", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """Binary-in → binary-out resize. STUB codec: a real deployment swaps
    the fake resampler for PIL/libvips inside the same ``mapInPandas``
    body — the Spark-side contract (Arrow batches of binary columns in,
    declared binary+struct schema out, partition-parallel, no driver
    hop) is exactly what production needs and is what's tested. The
    fake resample is deterministic: truncate/cycle payload bytes to
    ``target_w * target_h``.
    """
    if codec != "fake":
        raise NotImplementedError(
            "real image resampling needs PIL/libvips — use codec='fake'"
        )
    n_out = target_w * target_h

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[payload_col].map(
                lambda b: bytes(b[i % len(b)] for i in range(n_out)) if b else b""
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": out,
                    "media_meta": [
                        {
                            "mime": "fake/resized",
                            "n_bytes": len(p),
                            "target_w": target_w,
                            "target_h": target_h,
                        }
                        for p in out
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    frame_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "fake",
) -> DataFrame:
    """Video frame sampling: the 1→N row fan-out shape. Each input asset
    yields every ``every_n``-th frame as its own row — downstream image
    ops then treat frames uniformly. STUB codec chunks the payload into
    fixed ``frame_bytes`` windows as "frames"; a real build decodes with
    pyav/ffmpeg inside the same batch loop. The fan-out happens entirely
    inside ``mapInPandas`` (an output batch larger than its input batch
    is fine) — no explode, no driver round-trip.
    """
    if codec != "fake":
        raise NotImplementedError(
            "real frame extraction needs pyav/ffmpeg — use codec='fake'"
        )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                b = b or b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(did)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_frames, FRAME_SCHEMA)


AUDIO_RMS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms_e3", T.LongType()),
    ]
)


def audio_frame_rms(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_samples: int = 256,
) -> DataFrame:
    """Audio-shaped binary processing: interpret each payload as
    little-endian unsigned 16-bit PCM, window into ``frame_samples``
    frames, and report per-frame RMS on an exact integer grid
    (floor(sqrt(sum(v²)/n)·1000 + 0.5) — sqrt is correctly rounded IEEE,
    so the value is engine-reproducible from the integer sum).

    Arrow ``mapInPandas``: the payload column lands as one columnar batch
    per task and numpy's ``frombuffer`` reinterprets bytes zero-copy —
    the per-frame loop touches O(frames), not O(bytes), rows. A trailing
    odd byte is dropped (no full sample). This is the real plumbing an
    audio corpus pipeline runs; only the codec (here: raw PCM) changes.
    """
    import math

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def _rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ns, rms = [], [], [], []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                b = b or b""
                samples = np.frombuffer(b[: len(b) - (len(b) % 2)], dtype="<u2")
                for fi in range(0, len(samples), frame_samples):
                    chunk = samples[fi : fi + frame_samples].astype(np.int64)
                    ids.append(did)
                    fids.append(fi // frame_samples)
                    ns.append(len(chunk))
                    mean_sq = int((chunk * chunk).sum()) / len(chunk)
                    rms.append(int(math.floor(math.sqrt(mean_sq) * 1000 + 0.5)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms_e3": pd.Series(rms, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_rms, AUDIO_RMS_SCHEMA)


SCENE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("delta_l1", T.LongType()),
        T.StructField("is_scene_change", T.BooleanType()),
    ]
)


def scene_changes(
    df: DataFrame,
    frame_bytes: int = 64,
    threshold: int = 1500,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Scene-change detection over video-shaped payloads: the L1 pixel
    delta between consecutive FULL frames (``sum |f_i - f_{i-1}|`` over
    the ``frame_bytes`` window), flagged when it crosses ``threshold`` —
    the shot-boundary primitive keyframe extractors build on. The ragged
    tail frame is excluded so every compared window has identical width.

    Arrow ``mapInPandas`` + numpy ``frombuffer``: bytes reinterpret
    zero-copy per batch, the delta is one vectorized subtract per frame
    pair, and only O(frames) small rows leave the executor — payload
    bytes never shuffle. A real build swaps the byte windows for decoded
    luma planes (pyav/ffmpeg) with the identical dataflow.
    """

    def _scenes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, deltas = [], [], []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                b = b or b""
                n_full = len(b) // frame_bytes
                prev = None
                for fi in range(n_full):
                    f = np.frombuffer(
                        b, dtype=np.uint8, count=frame_bytes,
                        offset=fi * frame_bytes,
                    ).astype(np.int64)
                    if prev is not None:
                        ids.append(did)
                        idxs.append(fi)
                        deltas.append(int(np.abs(f - prev).sum()))
                    prev = f
            d = pd.Series(deltas, dtype="int64")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "delta_l1": d,
                    "is_scene_change": (d >= threshold),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_scenes, SCENE_SCHEMA)


def speech_segments(
    frames: DataFrame,
    threshold_e3: int,
    id_col: str = "doc_id",
    frame_col: str = "frame_id",
    rms_col: str = "rms_e3",
) -> DataFrame:
    """Energy-gated segmentation over per-frame RMS — the VAD
    (voice-activity-detection) shape: frames at or above
    ``threshold_e3`` form maximal CONSECUTIVE runs per payload, each
    run a "speech" segment (the unit an ASR/captioning pipeline feeds
    to the model). Composes with :func:`audio_frame_rms`, which owns
    the byte-level decode; this stage is pure DataFrame work.

    Islands via the classic gaps-and-islands trick: within a payload,
    ``frame_id - row_number()`` is constant exactly on consecutive
    active frames, so one window + one groupBy yields the runs — no
    self-join, no per-row Python. Both windows partition by payload id,
    so at 100 TB the sort is per-document (bounded by frames-per-
    payload), never global.

    Returns (doc_id, seg_id, start_frame, end_frame, n_frames,
    max_rms_e3); seg_id numbers a payload's segments in time order.
    """
    from pyspark.sql import Window

    act = frames.filter(F.col(rms_col) >= threshold_e3)
    w = Window.partitionBy(id_col).orderBy(frame_col)
    g = act.withColumn("grp", F.col(frame_col) - F.row_number().over(w))
    seg = g.groupBy(id_col, "grp").agg(
        F.min(frame_col).cast("int").alias("start_frame"),
        F.max(frame_col).cast("int").alias("end_frame"),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.max(rms_col).cast("long").alias("max_rms_e3"),
    )
    w2 = Window.partitionBy(id_col).orderBy("start_frame")
    return seg.select(
        id_col,
        F.row_number().over(w2).cast("int").alias("seg_id"),
        "start_frame",
        "end_frame",
        "n_frames",
        "max_rms_e3",
    )


def image_dhash(
    df: DataFrame,
    grid_w: int = 8,
    grid_h: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec: str = "ppm",
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded PPM images —
    the image-dedup fingerprint: integer grayscale ``(r+g+b) div 3`` per
    pixel, exact area-mean downsample to a ``grid_w x grid_h`` grid
    (image dims must be integer multiples; the mean is a floor
    division, so the whole pipeline stays integer-exact and
    oracle-portable), then one bit per horizontal gradient
    ``gray[r][c] > gray[r][c+1]`` — ``(grid_w-1) * grid_h`` bits packed
    into an int64. Visually-near-identical images (re-encodes, small
    edits, watermarks) land within a few bits of each other in Hamming
    space; :func:`dhash_hamming_pairs` turns that into banded candidate
    pairs the way SimHash text dedup does.

    Arrow ``mapInPandas`` with numpy inside (whole pixel buffers
    vectorize; no per-pixel Python), declared output schema.
    ``codec="ppm"`` (default) parses uncompressed netpbm with zero
    dependencies; ``codec="zppm"`` first zlib-inflates the payload
    (stdlib-only compressed container, :func:`_zppm_dims_pixels`);
    ``codec="pil"`` decodes compressed formats (JPEG/PNG/...) to the
    SAME (w, h, rgb) contract via :func:`_pil_dims_pixels` wherever PIL
    is installed — everything downstream of the decode is byte-identical
    across the three.
    """
    if grid_w < 2 or (grid_w - 1) * grid_h > 63:
        raise ValueError("need 2 <= grid_w and (grid_w-1)*grid_h <= 63 bits")
    if codec not in ("ppm", "zppm", "pil"):
        raise ValueError("codec must be 'ppm', 'zppm' or 'pil'")
    dims_pixels = {
        "ppm": _ppm_dims_pixels,
        "zppm": _zppm_dims_pixels,
        "pil": _pil_dims_pixels,
    }[codec]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def _dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = (
            1 << np.arange(grid_h * (grid_w - 1), dtype=np.int64)
        ).reshape(grid_h, grid_w - 1)
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, pixels = dims_pixels(bytes(payload))
                if w % grid_w or h % grid_h:
                    raise ValueError(
                        f"{w}x{h} image is not an integer multiple of the "
                        f"{grid_w}x{grid_h} grid"
                    )
                a = np.frombuffer(pixels, dtype=np.uint8).astype(np.int64)
                gray = a.reshape(h, w, 3).sum(axis=2) // 3
                fy, fx = h // grid_h, w // grid_w
                pooled = (
                    gray.reshape(grid_h, fy, grid_w, fx)
                    .sum(axis=(1, 3)) // (fy * fx)
                )
                bits = pooled[:, :-1] > pooled[:, 1:]
                ids.append(int(doc_id))
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_dhash, schema)


def dhash_hamming_pairs(
    fingerprints: DataFrame,
    bits: int = 28,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate IMAGE pairs from dHash fingerprints — the banded
    Hamming join (Manku et al., WWW 2007, same pigeonhole as the
    SimHash text path ``dedup.simhash_hamming_pairs``): split the
    ``bits``-bit hash into ``bands`` contiguous blocks and equi-join on
    (band, block); any pair within Hamming distance ``bands - 1``
    agrees exactly on some block, so ``max_hamming <= bands - 1`` keeps
    100% recall with zero all-pairs work. The xor+popcount verify
    touches candidates only. Returns (doc_a, doc_b, hamming).
    """
    if max_hamming > bands - 1:
        raise ValueError("max_hamming must be <= bands - 1 for full recall")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # The fingerprint relation feeds BOTH sides of the banded self-join;
    # without materialization Catalyst duplicates the upstream subtree —
    # typically an Arrow mapInPandas image DECODE, the most expensive
    # stage — and runs it twice. Persist the O(docs) (id, int64) relation
    # once (same contract as dedup.minhash_lsh_pairs' signature persist);
    # eager count so the two join sides can't race on the uncached tree.
    fp = pin(fingerprints.select(
        F.col(id_col).alias("doc_id"), F.col(hash_col).alias("fp")
    ))
    fp.count()
    banded = fp.select(
        "doc_id",
        "fp",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "block", F.expr(f"shiftright(fp, band * {band_bits}) & {mask}")
    )
    a = banded.select(
        "band", "block",
        F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"),
    )
    b = banded.select(
        "band", "block",
        F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"),
    )
    return (
        a.join(b, ["band", "block"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("fp_a").bitwiseXOR(F.col("fp_b"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


AUDIO_ZCR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_crossings", T.LongType()),
    ]
)


def audio_zero_crossings(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_samples: int = 256,
) -> DataFrame:
    """Audio zero-crossing rate per frame — the classic cheap
    voiced/unvoiced and noisiness feature next to
    :func:`audio_frame_rms`'s energy: count sign transitions of the
    (midpoint-centered) LE-uint16 PCM within each ``frame_samples``
    frame. Pure integer (a comparison count), no grid needed.

    Same Arrow ``mapInPandas`` shape as the RMS op: one columnar batch
    per task, ``np.frombuffer`` zero-copy reinterpret, vectorized
    sign-change count — O(frames) output rows leave the executor, the
    byte scan stays inside numpy. Crossings are counted WITHIN a frame
    (the frame boundary pair belongs to neither frame), so frames are
    independently recomputable under any repartitioning.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def _zcr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ns, zc = [], [], [], []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                b = b or b""
                samples = np.frombuffer(
                    b[: len(b) - (len(b) % 2)], dtype="<u2"
                )
                hi = samples >= 32768
                for fi in range(0, len(samples), frame_samples):
                    chunk = hi[fi : fi + frame_samples]
                    ids.append(did)
                    fids.append(fi // frame_samples)
                    ns.append(len(chunk))
                    zc.append(int((chunk[1:] != chunk[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "n_crossings": pd.Series(zc, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_zcr, AUDIO_ZCR_SCHEMA)
