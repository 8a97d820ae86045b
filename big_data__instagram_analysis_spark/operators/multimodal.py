"""Multimodal column plumbing (SURVEY.md §2.10 L7 + binary-column extension).

Design: image/audio/video payloads ride through the engine as opaque
``binary`` columns wrapped in a typed struct::

    media: struct<data: binary, mime: string, n_bytes: long>

All per-byte work (decode, feature-extract, resize, frame-sample) happens in
Arrow-batched ``mapInPandas`` stages — bytes never pass through row-at-a-time
Python, and Catalyst still prunes/filters on the *metadata* fields (mime,
n_bytes) JVM-side before any Python worker sees a payload. At 100 TB the
binary column dominates I/O, so every pipeline here projects metadata first
and touches ``data`` only inside the final UDF stage.

Codec policy (optional-dependency hooks): ``decode_image`` uses PIL *when
installed* (import-tried below — absent in this container, so it raises a
clear ``NotImplementedError``); ``decode_audio`` decodes WAV with the
stdlib ``wave`` module — genuinely functional here, unit-tested with a
synthesized in-memory WAV — and points non-WAV formats at soundfile/ffmpeg
(absent). The oracle-checked queries use ``fake_decode_features`` — a
deterministic function of the byte length — so the Spark-side schema,
partitioning, UDF signature, and batch shape are verified independently of
which codecs the deployment ships.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional codec dependency — absent in this container, hot-plugs outside
    from PIL import Image as _pil_image
except ImportError:  # pragma: no cover - exercised only where PIL exists
    _pil_image = None

#: Fake "video" framing: one frame per FRAME_BYTES of payload, sampled every
#: FRAME_STRIDE frames. Purely length-derived so a SQL oracle can mirror it.
FRAME_BYTES = 100
FRAME_STRIDE = 5


def decode_image(data: bytes) -> tuple[int, int, str]:
    """Decode an image payload → (width, height, mode) via PIL when
    installed; otherwise a clear error pointing at the tested
    deterministic fake (this container ships no image codecs)."""
    if _pil_image is None:
        raise NotImplementedError(
            "image codecs (PIL) are not installed; use fake_decode_features"
        )
    import io

    with _pil_image.open(io.BytesIO(data)) as im:  # pragma: no cover
        return im.width, im.height, im.mode


def decode_audio(data: bytes) -> tuple[int, int, int]:
    """Decode an audio payload → (n_channels, sample_rate, n_frames).

    WAV decodes with the stdlib ``wave`` module — no external dependency,
    works in this container (tests/test_hardening.py synthesizes a WAV
    in memory and round-trips it). Other formats need soundfile/ffmpeg,
    which are not installed here."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data)) as w:
            return w.getnchannels(), w.getframerate(), w.getnframes()
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            f"non-WAV audio needs soundfile/ffmpeg (not installed): {exc}"
        ) from exc


def fake_decode_features(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for image decode: (width, height) from length."""
    return 64 + n_bytes % 640, 64 + (n_bytes // 640) % 480


def with_media_struct(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Wrap each document's UTF-8 bytes as the opaque media struct.

    In production the binary comes off parquet/webdataset directly; here the
    fixture corpus has no binary column, so the document text doubles as the
    payload — the plumbing (types, struct shape, batching) is identical.
    """
    data = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn(
        "media",
        F.struct(
            data.alias("data"),
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(data).cast("long").alias("n_bytes"),
        ),
    )


def extract_features(packed: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary payload.

    Emits (doc_id, n_bytes, width, height): schema-stable, one output row per
    input row, Arrow-batched. The width/height come from the stubbed decode;
    swapping in a real codec changes only the loop body, not the plan.
    """
    out_schema = "doc_id long, n_bytes long, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            n = pdf["n_bytes"]
            w, h = zip(*(fake_decode_features(int(x)) for x in n))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bytes": n, "width": w, "height": h}
            )

    return packed.select(
        "doc_id", F.col("media.n_bytes").alias("n_bytes")
    ).mapInPandas(run, out_schema)


def frame_sample(packed: DataFrame) -> DataFrame:
    """mapInPandas frame sampler: one input row → n_frames/stride output rows.

    Models video frame-sampling (decode container → pick every k-th frame).
    The 1→N fan-out shape and byte-offset arithmetic are real; the "frame"
    boundary is the deterministic FRAME_BYTES stub.
    """
    out_schema = "doc_id long, frame_idx int, frame_off long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_id, rows_idx, rows_off = [], [], []
            for doc_id, n_bytes in zip(pdf["doc_id"], pdf["n_bytes"]):
                n_frames = int(n_bytes) // FRAME_BYTES
                for idx in range(0, n_frames, FRAME_STRIDE):
                    rows_id.append(doc_id)
                    rows_idx.append(idx)
                    rows_off.append(idx * FRAME_BYTES)
            if rows_id:
                yield pd.DataFrame(
                    {"doc_id": rows_id, "frame_idx": rows_idx, "frame_off": rows_off}
                )

    return packed.select(
        "doc_id", F.col("media.n_bytes").alias("n_bytes")
    ).mapInPandas(run, out_schema)
