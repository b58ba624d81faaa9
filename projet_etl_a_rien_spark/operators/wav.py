"""Pure-stdlib WAV/PCM codec: real audio decode, no librosa/ffmpeg.

The audio twin of ``operators/png.py`` (r4 verdict gap #2): the
multimodal decode stage is codec-parameterized and this sandbox ships
no audio libraries — but RIFF/WAVE with 16-bit PCM needs only the
stdlib ``wave`` + ``struct`` modules, so this codec runs everywhere and
makes ``decode_payloads("audio")`` execute real sample work:

- ``wav_encode``: int16 mono/stereo PCM frames → a well-formed WAV
  container (RIFF header, fmt chunk, data chunk);
- ``wav_decode``: container → (n_channels, sample_rate, int16 samples),
  validating the header via the stdlib parser;
- ``wav_meta``: the registered-decoder shape — frame count plus two
  exact-integer signal statistics (sum of squares = energy; signed
  zero-crossing count) that a SQL oracle can recompute from the
  pre-encode bytes, so the full encode→decode→analyze path sits under
  the driver's hash-exact gate (``multimodal_wav_roundtrip``).

All statistics are exact int64 — no float enters, so cross-engine
parity is trivial. Scale shape: called from ``mapInPandas``, one Arrow
batch per Python roundtrip, embarrassingly parallel per partition.
"""

from __future__ import annotations

import io
import struct
import wave


def wav_encode(
    samples: list[int] | bytes,
    sample_rate: int = 8000,
    n_channels: int = 1,
) -> bytes:
    """int16 PCM → WAV bytes. ``samples`` is either a list of ints in
    [-32768, 32767] or raw little-endian int16 frame bytes."""
    if isinstance(samples, (bytes, bytearray)):
        frames = bytes(samples)
        if len(frames) % (2 * n_channels):
            raise ValueError("frame bytes not a multiple of the frame size")
    else:
        frames = struct.pack(f"<{len(samples)}h", *samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """WAV bytes → (n_channels, sample_rate, int16 samples interleaved).

    The stdlib parser validates the RIFF/WAVE structure; 16-bit PCM
    only (the training-data transport format — compressed codecs stay
    behind external decoders)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()}")
        if w.getcomptype() != "NONE":
            raise ValueError(f"unsupported compression {w.getcomptype()}")
        frames = w.readframes(w.getnframes())
        n_ch, rate = w.getnchannels(), w.getframerate()
    return n_ch, rate, list(struct.unpack(f"<{len(frames) // 2}h", frames))


def wav_meta(payload: bytes) -> dict:
    """Registered-decoder shape for ``multimodal.decode_payloads``:
    container metadata plus exact-integer signal statistics.

    ``sum_sq`` (signal energy numerator) and ``zero_crossings``
    (sign-change count, zeros treated as non-negative) are pure int64
    arithmetic over the samples, so an oracle recomputes them from the
    raw PCM bytes and a single wrong sample, order swap, or byte-order
    slip breaks the hash."""
    n_ch, rate, samples = wav_decode(payload)
    zc = sum(
        1
        for i in range(1, len(samples))
        if (samples[i - 1] >= 0) != (samples[i] >= 0)
    )
    return {
        "n_channels": n_ch,
        "sample_rate": rate,
        "n_samples": len(samples),
        "sum_sq": sum(s * s for s in samples),
        "zero_crossings": zc,
    }


def register_builtin_wav_codec() -> None:
    """Wire the WAV decoder in as the multimodal ``"audio"`` codec —
    real audio decode in every environment, no optional deps. Idempotent."""
    from . import multimodal

    multimodal.register_decoder("audio", wav_meta)


# -------------------------------------------------------------- DFT ----

DFT_N = 16
DFT_GRID = 1000  # twiddle quantization: round(cos * GRID) — see below


def _dft_twiddles() -> tuple[list[list[int]], list[list[int]]]:
    """Integer-quantized DFT twiddle tables, k = 0..N/2: round(cos·GRID)
    and round(−sin·GRID). The tables are PYTHON-computed literals
    inlined into BOTH the Spark plan and the DuckDB oracle, so no
    engine ever evaluates a transcendental — the classic cos/sin
    last-ulp divergence is designed out, and every downstream product
    and sum is exact int64 (|re| ≤ N·32768·GRID ≈ 5.2e8, squares
    ≤ 2.8e17, the 8-bin total ≤ 4.4e18 — inside int64)."""
    import math

    c = [
        [round(math.cos(2 * math.pi * j * k / DFT_N) * DFT_GRID)
         for k in range(DFT_N // 2 + 1)]
        for j in range(DFT_N)
    ]
    s = [
        [round(-math.sin(2 * math.pi * j * k / DFT_N) * DFT_GRID)
         for k in range(DFT_N // 2 + 1)]
        for j in range(DFT_N)
    ]
    return c, s


def spectral_features(df, payload_col: str = "payload", id_col: str = "doc_id"):
    """Exact-integer DFT power spectrum over each payload's first
    ``DFT_N`` int16-LE samples — audio feature extraction with full
    cross-engine parity (quantized twiddle tables shared as literals
    with the oracle; see ``_dft_twiddles``).

    Returns (doc_id, dc, dominant_bin, dominant_power, total_ac_power):
    the DC term (exact sample sum × GRID), the argmax AC bin in 1..N/2
    (ties → smaller bin), its power, and the total AC power. Pure
    column arithmetic over a ``_bind_once``-bound sample array — one
    narrow projection, no shuffle, no Python.
    """
    from pyspark.sql import functions as F

    from .dedup import _bind_once

    c, s = _dft_twiddles()
    hx = F.hex(F.col(payload_col))

    def sample(j: int):
        b0 = F.conv(F.substring(hx, 4 * j + 1, 2), 16, 10).cast("long")
        b1 = F.conv(F.substring(hx, 4 * j + 3, 2), 16, 10).cast("long")
        raw = b0 + 256 * b1
        return F.when(raw >= 32768, raw - 65536).otherwise(raw)

    arr = F.array(*[sample(j) for j in range(DFT_N)])

    def powers(a):
        out = []
        for k in range(DFT_N // 2 + 1):
            re = None
            im = None
            for j in range(DFT_N):
                t_re = F.element_at(a, j + 1) * F.lit(c[j][k])
                t_im = F.element_at(a, j + 1) * F.lit(s[j][k])
                re = t_re if re is None else re + t_re
                im = t_im if im is None else im + t_im
            out.append((re * re + im * im).alias(f"p{k}"))
        return F.struct(*out)

    p = _bind_once(arr, powers)
    kept = df.where(F.length(payload_col) >= 2 * DFT_N).select(
        F.col(id_col), p.alias("p")
    )
    ac = [F.col("p")[f"p{k}"] for k in range(1, DFT_N // 2 + 1)]
    best = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-ac[k - 1]).alias("neg_p"), F.lit(k).alias("k")
                )
                for k in range(1, DFT_N // 2 + 1)
            ]
        )
    )[0]
    total = None
    for x in ac:
        total = x if total is None else total + x
    return kept.select(
        id_col,
        F.col("p")["p0"].alias("dc_power"),  # (Σv·GRID)², exact
        best["k"].alias("dominant_bin"),
        (-best["neg_p"]).alias("dominant_power"),
        total.alias("total_ac_power"),
    )
