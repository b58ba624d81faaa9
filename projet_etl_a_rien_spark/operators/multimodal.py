"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw media as a
``binary`` column (or a pointer to object storage) next to a typed
metadata struct; run decode / feature-extract / resize / frame-sample as
Arrow-batched Python stages (``mapInPandas``) so bytes cross the
JVM↔Python boundary once per batch, never per row.

Codec availability is environment-dependent, so decode/resize are
registry-parameterized: without a registered codec for the modality they
raise ``NotImplementedError`` at plan-build time (fail fast, not
per-task). For IMAGES a real codec ships in-repo —
``operators/png.py`` is a pure-stdlib PNG encoder/decoder/resampler
(``register_builtin_png_codecs()`` wires it in; the
``multimodal_png_roundtrip`` registry query runs it under the oracle
gate) — so the decode path executes real pixel work in every
environment. Audio/video stay registry-gated until a codec (librosa,
ffmpeg, …) is registered. Everything Spark-side — schema, partition
sizing, UDF signatures, Arrow batch shapes — is additionally pinned by
``byte_features``'s byte-exact roundtrip oracle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BYTE_FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, head_byte int, tail_byte int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (doc_id, payload binary, meta struct) — the canonical
    multimodal row shape. ``encode`` is JVM-side; no Python involved."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct("lang", "source", "n_chars").alias("meta"),
    )


def byte_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched per-payload feature extraction via mapInPandas.

    The features themselves (length, first/last byte) are deliberately
    computable in SQL too — that is what lets the DuckDB oracle verify
    that the Arrow round-trip preserves every byte, which is the actual
    point of this operator: prove the multimodal batch plumbing.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "tail_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype(
                        "int32"
                    ),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        extract, schema=BYTE_FEATURE_SCHEMA
    )


def frame_sample(
    df: DataFrame,
    frame_bytes: int = 16,
    stride: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling: view the payload as fixed-size frames, emit every
    ``stride``-th frame as its own row — the video-keyframe access shape
    (decode only the frames you keep). Pure JVM column algebra: sequence
    over sampled frame indices → explode → binary substring; frames are
    emitted hex-encoded (cross-engine comparable) with their true frame
    index. No Python, no shuffle — a narrow projection however large the
    corpus.
    """
    c = F.col(payload_col)
    n_frames = F.ceil(F.length(c) / F.lit(frame_bytes)).cast("long")
    idx = df.select(
        id_col,
        c.alias("_payload"),
        F.explode(
            F.when(
                n_frames > 0,
                F.sequence(F.lit(0).cast("long"), n_frames - 1, F.lit(stride).cast("long")),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("frame_no"),
    )
    return idx.select(
        id_col,
        "frame_no",
        F.hex(
            F.substr(
                F.col("_payload"),
                (F.col("frame_no") * frame_bytes + 1).cast("int"),
                F.lit(frame_bytes),
            )
        ).alias("frame_hex"),
    )


# ------------------------------------------------------------------ stubs ----

_DECODERS: dict[str, Callable[[bytes], Any]] = {}


def register_decoder(modality: str, fn: Callable[[bytes], Any]) -> None:
    """Register a decoder (tests register deterministic fakes)."""
    _DECODERS[modality] = fn


def decode_payloads(
    df: DataFrame,
    modality: str,
    out_schema: str,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode binary payloads with the registered decoder for ``modality``.

    CODEC GATE: without a registered decoder this raises
    ``NotImplementedError`` at plan-build time (fail fast, not
    per-task). ``png.register_builtin_png_codecs()`` provides a real,
    dependency-free ``"image"`` decoder; audio/video need an external
    codec registered.
    """
    decoder = _DECODERS.get(modality)
    if decoder is None:
        raise NotImplementedError(
            f"no decoder registered for modality {modality!r}: media codecs "
            "are not available in this environment; register_decoder() a "
            "real or fake implementation"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[payload_col].map(decoder)
            out = pd.DataFrame(list(decoded))
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    modality: str = "image",
) -> DataFrame:
    """Resize image payloads to (width, height): the decode→transform→
    re-encode stage of a multimodal ingest, Arrow-batched via
    ``mapInPandas`` so one Python roundtrip handles a whole batch of
    payloads.

    CODEC GATE (same contract as ``decode_payloads``): the pixel work
    comes from a registered ``"{modality}:resize"`` codec with signature
    ``(payload_bytes, width, height) -> bytes``; without one this raises
    ``NotImplementedError`` at plan-build time.
    ``png.register_builtin_png_codecs()`` provides a real PNG
    decode→nearest-neighbor→re-encode codec with no dependencies.
    """
    codec = _DECODERS.get(f"{modality}:resize")
    if codec is None:
        raise NotImplementedError(
            f"no resize codec registered for modality {modality!r}: image "
            "codecs are not available in this environment; "
            "register_decoder(f'{modality}:resize', fn) a real or fake one"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": pdf[payload_col].map(
                        lambda b: codec(b, width, height)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} bigint, payload binary, width int, height int"
    )


def arrow_zero_copy_byte_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-payload byte statistics via ``mapInArrow`` — the zero-copy
    member of the Python-execution matrix (mapInPandas / applyInPandas /
    cogroup / applyInPandasWithState / UDTF all exist elsewhere; this is
    the RecordBatch-level API those wrap).

    Why it matters at 100 TB: binary columns through the pandas APIs
    materialize one Python ``bytes`` object per row; here the batch's
    entire payload region is read IN PLACE from the Arrow value buffer
    (``np.frombuffer`` — no copy, no per-row objects) and per-row sums
    come from one vectorized prefix-sum differenced at the offsets
    buffer. Python cost is O(batches), not O(rows) — the only per-row
    work is SIMD-width numpy arithmetic.

    Emits (id, n_bytes, byte_sum, n_space) — all replicated byte-for-
    byte by the DuckDB oracle from the hex dump, so the zero-copy path
    is under the same positional-checksum gate as the PNG codec.
    Empty payloads are well-defined (all-zero rows): the cumsum
    differencing gives exact per-segment sums with no reduceat
    empty-segment pitfall, so no caller-side pre-filter is required.
    """
    schema = (
        f"{id_col} long, n_bytes long, byte_sum long, n_space long"
    )

    def stats(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            arr = rb.column(rb.schema.get_field_index(payload_col))
            ids = rb.column(rb.schema.get_field_index(id_col))
            n = len(arr)
            if n == 0:
                continue
            # BinaryArray buffers: [validity, int32 offsets, data]
            off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + n + 1
            ].astype(np.int64)
            # clamp the buffer to this slice's last offset (a shared or
            # padded value buffer may extend past it)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
                : off[-1]
            ]
            lens = off[1:] - off[:-1]
            # prefix-sum segment reduction instead of np.add.reduceat:
            # reduceat silently returns the element AT the offset for an
            # empty segment (and raises only when the empty row is
            # batch-final), so empty payloads would corrupt neighbors'
            # sums; cumsum differencing gives exact per-segment sums —
            # zeros for empty rows — with the same one-vectorized-pass
            # cost (no 255*2^31 overflow risk in int64)
            # dtype=int64 accumulates without materializing an int64
            # copy of the payload first (half the transient footprint)
            cs = np.concatenate(
                ([0], np.cumsum(data, dtype=np.int64))
            )
            sums = cs[off[1:]] - cs[off[:-1]]
            css = np.concatenate(
                ([0], np.cumsum(data == 0x20, dtype=np.int64))
            )
            spaces = css[off[1:]] - css[off[:-1]]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(lens, type=pa.int64()),
                    pa.array(sums, type=pa.int64()),
                    pa.array(spaces, type=pa.int64()),
                ],
                names=[id_col, "n_bytes", "byte_sum", "n_space"],
            )

    return df.select(id_col, payload_col).mapInArrow(stats, schema=schema)
