"""Multimodal-column queries (SURVEY.md §2.10 L7 + binary extension).

One row carries text + embedding + typed media metadata as nested structs;
the binary payload path runs through the Arrow-batched stubs in
operators/multimodal.py. Outputs are flattened to scalar columns so the
driver's pandas hash-compare sees plain values (structs don't hash portably).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    extract_features,
    frame_sample,
    with_media_struct,
)
from ..registry import query

# --- L7: pack text + embedding + metadata into one row -----------------------


@query(
    "multimodal_pack_project",
    category="L7",
    oracle="""
SELECT d.doc_id, d.lang,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       CAST(len(e.embedding) AS INTEGER) AS emb_dim,
       round(sqrt(list_sum(list_transform(e.embedding,
                                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
             6) AS emb_norm
FROM documents d
JOIN embeddings e ON d.doc_id = e.vec_id
ORDER BY d.doc_id
""",
)
def multimodal_pack_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents⋈embeddings packed into a nested struct row, then projected.

    The pack is a broadcast-free 1:1 equi-join on the shared id (both sides
    hash-partition on it at scale); nested fields are projected back out via
    ``col.field`` paths, which Catalyst collapses — the struct never
    materializes columns the query doesn't read (ReadSchema pruning).
    """
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    packed = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.struct("text", "lang", "source", "n_chars").alias("content"),
            F.col("embedding").alias("embedding"),
        )
    )
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(emb_d, lambda x: x * x), F.lit(0.0), lambda a, v: a + v
        )
    )
    return packed.select(
        "doc_id",
        F.col("content.lang").alias("lang"),
        F.col("content.n_chars").cast("long").alias("n_chars"),
        F.size("embedding").alias("emb_dim"),
        F.round(norm, 6).alias("emb_norm"),
    ).orderBy("doc_id")


# --- binary payload: decode-stub feature extraction --------------------------


@query(
    "multimodal_decode_features",
    category="L7,E10",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(64 + strlen(text) % 640 AS INTEGER) AS width,
       CAST(64 + (strlen(text) // 640) % 480 AS INTEGER) AS height
FROM documents
ORDER BY doc_id
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → mapInPandas decode stub → typed feature row.

    DuckDB mirrors the deterministic fake decode from byte length (UTF-8
    strlen == octet_length of the encoded payload), proving the Arrow batch
    plumbing end-to-end while the codec itself stays stubbed.
    """
    docs = load(spark, sf_dir, "documents")
    return extract_features(with_media_struct(docs)).orderBy("doc_id")


# --- binary payload: 1→N frame sampling --------------------------------------


@query(
    "multimodal_frame_sample",
    category="L7,E10",
    oracle=f"""
WITH n AS (
  SELECT doc_id, strlen(text) // {FRAME_BYTES} AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * {FRAME_BYTES} AS BIGINT) AS frame_off
FROM n, unnest(range(0, n_frames, {FRAME_STRIDE})) AS t(f)
ORDER BY doc_id, frame_idx
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one media row fans out to n_frames/stride
    rows through a mapInPandas UDTF-shaped stage (schema-stable offsets)."""
    docs = load(spark, sf_dir, "documents")
    return frame_sample(with_media_struct(docs)).orderBy("doc_id", "frame_idx")


# --- E196 (extension): ViT-style patch aggregation over raw image bytes ------

_IMG_SIDE = 32
_PATCH = 4
_N_PIX = _IMG_SIDE * _IMG_SIDE


def _patch_sum_sql(pr: int, pc: int) -> str:
    """Closed-form SQL for the (pr, pc) 4x4 patch byte-sum of the synthetic
    image: pixel idx = (4*pr + dr) * 32 + (4*pc + dc), byte = (id*31 + idx*7) % 256."""
    return f"""CAST(list_sum(list_transform(range(0, 16), k ->
      (vec_id * 31 + (({pr} * {_PATCH} + k // {_PATCH}) * {_IMG_SIDE}
                      + {pc} * {_PATCH} + k % {_PATCH}) * 7) % 256))
    AS BIGINT)"""


@query(
    "image_patch_sums",
    category="L7,E196",
    oracle=f"""
SELECT vec_id,
       {_patch_sum_sql(0, 0)} AS p00,
       {_patch_sum_sql(0, 1)} AS p01,
       {_patch_sum_sql(1, 0)} AS p10,
       {_patch_sum_sql(7, 7)} AS p77,
       CAST(list_sum(list_transform(range(0, {_N_PIX}),
                                    i -> (vec_id * 31 + i * 7) % 256))
            AS BIGINT) AS total
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
""",
)
def image_patch_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patchify over RAW IMAGE BYTES, byte-exact end to end: a
    32×32 synthetic grayscale image per row (pixel i = (id·31+i·7) mod 256)
    is materialized as a binary column in one Arrow stage, crosses the
    JVM↔Python boundary into a SECOND Arrow stage that numpy-reshapes it
    into 4×4 patches and sums them — the patch-embedding front end of any
    vision transformer, minus the learned projection.

    The oracle never sees the bytes: it recomputes each patch sum from the
    closed-form pixel formula, so a hash match proves the binary column
    survived both Arrow crossings bit-exactly AND the numpy patch
    arithmetic is right. Real deployments swap the generator stage for a
    parquet/webdataset binary column; the patchify stage is unchanged.

    Scale: both stages are mapInPandas (zero shuffle); per-row output is
    5 ints however large the payload, so the binary never shuffles at all.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100).select(
        "vec_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_N_PIX, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            imgs = [
                ((int(v) * 31 + idx * 7) % 256).astype(np.uint8).tobytes()
                for v in pdf.vec_id
            ]
            yield pd.DataFrame({"vec_id": pdf.vec_id, "img": imgs})

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = _IMG_SIDE // _PATCH
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for v, b in zip(pdf.vec_id, pdf.img):
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                m = a.reshape(_IMG_SIDE, _IMG_SIDE)
                sums = m.reshape(n, _PATCH, n, _PATCH).sum(axis=(1, 3))
                rows.append(
                    (
                        int(v),
                        int(sums[0, 0]),
                        int(sums[0, 1]),
                        int(sums[1, 0]),
                        int(sums[7, 7]),
                        int(a.sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["vec_id", "p00", "p01", "p10", "p77", "total"]
            )

    with_img = emb.mapInPandas(gen, "vec_id long, img binary")
    return with_img.mapInPandas(
        patchify,
        "vec_id long, p00 long, p01 long, p10 long, p77 long, total long",
    ).orderBy("vec_id")


# --- E197 (extension): framed waveform features over int16 PCM binary --------

_N_SAMP = 256
_FRAME = 64


@query(
    "audio_frame_features",
    category="L7,E197",
    oracle=f"""
WITH frames AS (
  SELECT vec_id, f.frame
  FROM embeddings,
       LATERAL (SELECT unnest(range(0, {_N_SAMP // _FRAME})) AS frame) f
  WHERE vec_id < 100
)
SELECT vec_id, CAST(frame AS INTEGER) AS frame,
       CAST(list_sum(list_transform(range(0, {_FRAME}), i ->
         abs((vec_id * 7 + (frame * {_FRAME} + i) * 13) % 61 - 30)))
         AS BIGINT) AS abs_energy,
       CAST(list_sum(list_transform(range(1, {_FRAME}), i ->
         CASE WHEN ((vec_id * 7 + (frame * {_FRAME} + i) * 13) % 61 - 30)
                   * ((vec_id * 7 + (frame * {_FRAME} + i - 1) * 13) % 61 - 30)
                   < 0 THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings,
       CAST(list_max(list_transform(range(0, {_FRAME}), i ->
         abs((vec_id * 7 + (frame * {_FRAME} + i) * 13) % 61 - 30)))
         AS BIGINT) AS peak
FROM frames
ORDER BY vec_id, frame
""",
)
def audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed audio feature extraction over RAW int16 PCM bytes, byte-exact:
    a 256-sample synthetic waveform (s[i] = (id·7+i·13) mod 61 − 30) is
    packed as little-endian int16 binary in one Arrow stage, then a second
    stage numpy-frames it (64 samples/frame) and emits per-frame absolute
    energy, strict zero crossings (s[i]·s[i−1] < 0) and peak — the VAD /
    silence-trim front end of any speech pipeline.

    As with image_patch_sums, the oracle recomputes every feature from the
    closed-form sample formula without touching bytes: a hash match proves
    the int16 PCM survived both Arrow crossings (including byte order) and
    the framing arithmetic. All features are exact integers.

    Scale: two zero-shuffle mapInPandas stages; per-row output is
    4 frames × 3 ints regardless of payload size.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100).select(
        "vec_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_N_SAMP, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            waves = [
                (((int(v) * 7 + idx * 13) % 61 - 30))
                .astype("<i2")
                .tobytes()
                for v in pdf.vec_id
            ]
            yield pd.DataFrame({"vec_id": pdf.vec_id, "pcm": waves})

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for v, b in zip(pdf.vec_id, pdf.pcm):
                s = np.frombuffer(b, dtype="<i2").astype(np.int64)
                for fi in range(_N_SAMP // _FRAME):
                    fr = s[fi * _FRAME : (fi + 1) * _FRAME]
                    zc = int(((fr[1:] * fr[:-1]) < 0).sum())
                    rows.append(
                        (
                            int(v),
                            fi,
                            int(np.abs(fr).sum()),
                            zc,
                            int(np.abs(fr).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "frame", "abs_energy", "zero_crossings", "peak"],
            )

    pcm = emb.mapInPandas(gen, "vec_id long, pcm binary")
    return (
        pcm.mapInPandas(
            featurize,
            "vec_id long, frame int, abs_energy long, "
            "zero_crossings long, peak long",
        )
        .orderBy("vec_id", "frame")
    )


# --- E217 (extension): video motion energy over framed binary -----------------

_VID_FRAMES = 8
_VID_PIX = 64  # 8x8 per frame


@query(
    "video_motion_energy",
    category="L7,E217",
    oracle=f"""
WITH diffs AS (
  SELECT vec_id, f.fi
  FROM embeddings,
       LATERAL (SELECT unnest(range(1, {_VID_FRAMES})) AS fi) f
  WHERE vec_id < 100
)
SELECT vec_id, CAST(fi AS INTEGER) AS frame,
       CAST(list_sum(list_transform(range(0, {_VID_PIX}), p ->
         abs(((vec_id * 17 + (fi * {_VID_PIX} + p) * 11) % 251)
             - ((vec_id * 17 + ((fi - 1) * {_VID_PIX} + p) * 11) % 251))))
         AS BIGINT) AS motion_energy
FROM diffs
ORDER BY vec_id, frame
""",
)
def video_motion_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal motion energy over a framed 'video' binary — the
    scene-change / shot-boundary primitive: 8 frames of 8×8 synthetic
    pixels (pixel = (id·17 + global_idx·11) mod 251) packed as one byte
    payload, then numpy computes Σ|frame_i − frame_{i−1}| per transition
    in a second Arrow stage. Completes the byte-exact multimodal triple
    (image patchify E196, PCM framing E197): image, audio, video all
    cross the Python boundary as opaque bytes with closed-form oracles.

    Scale: two zero-shuffle mapInPandas stages; output is 7 ints per
    video regardless of payload size — frame differencing never shuffles
    pixels, exactly how a shot-boundary pass runs over a petabyte of
    video.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100).select(
        "vec_id"
    )
    total = _VID_FRAMES * _VID_PIX

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(total, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            vids = [
                ((int(v) * 17 + idx * 11) % 251).astype(np.uint8).tobytes()
                for v in pdf.vec_id
            ]
            yield pd.DataFrame({"vec_id": pdf.vec_id, "video": vids})

    def motion(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for v, b in zip(pdf.vec_id, pdf.video):
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                fr = a.reshape(_VID_FRAMES, _VID_PIX)
                d = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                for fi, e in enumerate(d, start=1):
                    rows.append((int(v), fi, int(e)))
            yield pd.DataFrame(
                rows, columns=["vec_id", "frame", "motion_energy"]
            )

    vid = emb.mapInPandas(gen, "vec_id long, video binary")
    return vid.mapInPandas(
        motion, "vec_id long, frame int, motion_energy long"
    ).orderBy("vec_id", "frame")


# --- E231: nearest-neighbor image resize over raw bytes ----------------------

_RESIZE_FACTOR = 4
_OUT_SIDE = _IMG_SIDE // _RESIZE_FACTOR


@query(
    "image_resize_nearest",
    category="L7,E231",
    oracle=f"""
SELECT vec_id,
       CAST({_OUT_SIDE} AS BIGINT) AS out_side,
       CAST((vec_id * 31 + 0 * 7) % 256 AS BIGINT) AS px00,
       CAST((vec_id * 31
             + (({_OUT_SIDE} - 1) * {_RESIZE_FACTOR} * {_IMG_SIDE}
                + ({_OUT_SIDE} - 1) * {_RESIZE_FACTOR}) * 7) % 256
            AS BIGINT) AS px_last,
       CAST(list_sum(list_transform(range(0, {_OUT_SIDE * _OUT_SIDE}), k ->
         (vec_id * 31 + ((k // {_OUT_SIDE}) * {_RESIZE_FACTOR} * {_IMG_SIDE}
                         + (k % {_OUT_SIDE}) * {_RESIZE_FACTOR}) * 7) % 256))
            AS BIGINT) AS byte_sum,
       CAST(list_sum(list_transform(range(0, {_OUT_SIDE * _OUT_SIDE}), k ->
         (k + 1) * ((vec_id * 31
                     + ((k // {_OUT_SIDE}) * {_RESIZE_FACTOR} * {_IMG_SIDE}
                        + (k % {_OUT_SIDE}) * {_RESIZE_FACTOR}) * 7) % 256)))
            AS BIGINT) AS poly_checksum
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
""",
)
def image_resize_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor image resize over RAW BYTES, byte-exact: the E196
    synthetic 32×32 grayscale image is materialized as a binary column in
    one Arrow stage and downsampled 4× (strided numpy view — output pixel
    (r,c) = input (4r,4c), the nearest-neighbor kernel every thumbnail /
    vision-preprocessing pipeline starts from) in a second; the resized
    8×8 payload is summarized as corner pixels, byte sum, and a
    position-weighted polynomial checksum so the hash pins every output
    byte AND its position.

    The oracle recomputes all four summaries from the closed-form pixel
    formula without ever building an image — a match proves the binary
    survived both Arrow crossings and the strided indexing is right.
    Scale: two mapInPandas stages, zero shuffle; per-row emit is 5 ints,
    so neither the full-res nor the resized payload ever shuffles. A real
    deployment swaps the generator for a parquet binary column and the
    summary projection for a binary write of `small`.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100).select(
        "vec_id"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_N_PIX, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            imgs = [
                ((int(v) * 31 + idx * 7) % 256).astype(np.uint8).tobytes()
                for v in pdf.vec_id
            ]
            yield pd.DataFrame({"vec_id": pdf.vec_id, "img": imgs})

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = np.arange(1, _OUT_SIDE * _OUT_SIDE + 1, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for v, b in zip(pdf.vec_id, pdf.img):
                m = np.frombuffer(b, dtype=np.uint8).reshape(
                    _IMG_SIDE, _IMG_SIDE
                )
                small = m[::_RESIZE_FACTOR, ::_RESIZE_FACTOR].astype(np.int64)
                flat = small.ravel()
                rows.append(
                    (
                        int(v),
                        _OUT_SIDE,
                        int(small[0, 0]),
                        int(small[-1, -1]),
                        int(flat.sum()),
                        int((flat * w).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "vec_id", "out_side", "px00", "px_last", "byte_sum",
                    "poly_checksum",
                ],
            )

    with_img = emb.mapInPandas(gen, "vec_id long, img binary")
    return with_img.mapInPandas(
        resize,
        "vec_id long, out_side long, px00 long, px_last long, "
        "byte_sum long, poly_checksum long",
    ).orderBy("vec_id")


# --- E241 (extension): perceptual average-hash image near-dup ----------------

#: aHash geometry: 8x8 blocks of 4x4 pixels over the 32x32 synthetic image,
#: packed as four 16-bit bands (b0..b3) so banding is pigeonhole-complete:
#: hamming <= HAMMING_T over 4 bands forces at least one band EQUAL.
_AHASH_BLOCKS = 8
_AHASH_BANDS = 4
HAMMING_T = 3


def _ahash_band_sql(j: int) -> str:
    """Closed-form SQL for band j (bits 16j..16j+15) of the aHash: block b's
    bit is 1 iff 64*blocksum > total (strict, integer — the mean compare
    without division), blocksum from the synthetic pixel formula."""
    return f"""CAST(list_sum(list_transform(range(0, 16), t ->
      CASE WHEN 64 * bs[{16 * j} + t + 1] > total THEN 1 << t ELSE 0 END))
    AS BIGINT)"""


@query(
    "image_ahash_neardup",
    category="L7,L2,E241",
    oracle=f"""
WITH px AS (
  SELECT vec_id,
         list_transform(range(0, 64), b -> list_sum(list_transform(range(0, 16), k ->
           (vec_id * 31 + (((b // 8) * 4 + k // 4) * 32 + (b % 8) * 4 + k % 4) * 7) % 256
         ))) AS bs
  FROM embeddings
), sig AS (
  SELECT vec_id, bs, list_sum(bs) AS total FROM px
), bands AS (
  SELECT vec_id,
         {_ahash_band_sql(0)} AS b0, {_ahash_band_sql(1)} AS b1,
         {_ahash_band_sql(2)} AS b2, {_ahash_band_sql(3)} AS b3
  FROM sig
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, hamming
FROM pairs WHERE hamming <= {HAMMING_T}
ORDER BY hamming, vec_a, vec_b
LIMIT 100
""",
)
def image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) image near-duplicate detection — the
    multimodal leg of the dedup pillar: per image, downsample to 8x8 block
    means, threshold each block against the global mean (64*blocksum >
    total, pure integers — no division, no float), pack the 64 bits as
    FOUR 16-bit bands, and find pairs at hamming distance <= 3. The 4-band
    split makes candidate generation pigeonhole-COMPLETE for that radius
    (<= 3 flipped bits across 4 bands leaves at least one band identical),
    so the band equi-join is exact candidate generation, not approximate
    LSH — the same guarantee structure as the winnowing gate.

    Spark plan: the image materializes and hashes inside ONE Arrow
    mapInPandas stage (numpy block-sum reshape, 12 ints out per row — the
    1 KiB payload never shuffles); candidates come from a 4-way band
    explode + equi-join (per-band buckets are phase collisions of the
    synthetic generator, bounded), exact hamming verify via bit_count(xor)
    in codegen expressions, top-100 via TakeOrderedAndProject. The oracle
    recomputes every hash bit from the closed-form pixel formula and runs
    a full pair scan — a hash match proves the bytes, the numpy blocking,
    the banding completeness and the bit packing all at once.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    emb = load(spark, sf_dir, "embeddings").select("vec_id")
    side = _AHASH_BLOCKS * 4

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(side * side, dtype=np.int64)
        shifts = np.arange(16, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for v in pdf.vec_id:
                a = ((int(v) * 31 + idx * 7) % 256).astype(np.uint8)
                m = a.astype(np.int64).reshape(side, side)
                bs = m.reshape(_AHASH_BLOCKS, 4, _AHASH_BLOCKS, 4).sum(axis=(1, 3))
                total = int(m.sum())
                bits = (64 * bs.reshape(-1) > total).astype(np.int64)
                bands = [
                    int((bits[16 * j : 16 * j + 16] << shifts).sum())
                    for j in range(_AHASH_BANDS)
                ]
                rows.append((int(v), *bands))
            yield pd.DataFrame(rows, columns=["vec_id", "b0", "b1", "b2", "b3"])

    sig = emb.mapInPandas(ahash, "vec_id long, b0 long, b1 long, b2 long, b3 long")
    long = sig.select(
        "vec_id", "b0", "b1", "b2", "b3",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("bi"), F.col(f"b{j}").alias("bv"))
                for j in range(_AHASH_BANDS)
            ])
        ).alias("band"),
    ).select("vec_id", "b0", "b1", "b2", "b3", "band.bi", "band.bv")
    a, b = long.alias("a"), long.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            *[F.col(f"a.b{j}").alias(f"a{j}") for j in range(_AHASH_BANDS)],
            *[F.col(f"b.b{j}").alias(f"c{j}") for j in range(_AHASH_BANDS)],
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{j} ^ c{j}")) for j in range(_AHASH_BANDS)
    ).cast("long")
    return (
        cand.select("vec_a", "vec_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= HAMMING_T)
        .orderBy("hamming", "vec_a", "vec_b")
        .limit(100)
    )


# --- E242 (extension): audio fingerprint near-dup (energy-delta signs) -------

#: Fingerprint geometry: 32 energy frames of 8 samples → 31 delta-sign bits
#: packed as four bands (8+8+8+7 bits); hamming <= AUDIO_HAMMING_T over 4
#: bands is pigeonhole-complete exactly as in image_ahash_neardup.
_AFP_FRAMES = 32
_AFP_FLEN = _N_SAMP // _AFP_FRAMES
AUDIO_HAMMING_T = 3


def _afp_energy_sql(f: str) -> str:
    return f"""list_sum(list_transform(range(0, {_AFP_FLEN}), j ->
      abs((vec_id * 7 + (({f}) * {_AFP_FLEN} + j) * 13) % 61 - 30)))"""


def _afp_band_sql(j: int) -> str:
    nbits = 7 if j == 3 else 8
    return f"""CAST(list_sum(list_transform(range(0, {nbits}), t ->
      CASE WHEN es[{8 * j} + t + 2] > es[{8 * j} + t + 1] THEN 1 << t ELSE 0 END))
    AS BIGINT)"""


@query(
    "audio_fingerprint_neardup",
    category="L7,L2,E242",
    oracle=f"""
WITH es AS (
  SELECT vec_id,
         list_transform(range(0, {_AFP_FRAMES}), f -> {_afp_energy_sql("f")}) AS es
  FROM embeddings
), bands AS (
  SELECT vec_id,
         {_afp_band_sql(0)} AS b0, {_afp_band_sql(1)} AS b1,
         {_afp_band_sql(2)} AS b2, {_afp_band_sql(3)} AS b3
  FROM es
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
            + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
  FROM bands a JOIN bands b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, hamming
FROM pairs WHERE hamming <= {AUDIO_HAMMING_T}
ORDER BY hamming, vec_a, vec_b
LIMIT 100
""",
)
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection via a Haitsma-Kalker-style
    fingerprint: frame the PCM into 32 energy windows, take the SIGN of
    each consecutive energy delta (E[t+1] > E[t], strict, pure integers —
    the temporal-structure bits robust to gain changes, where E241's aHash
    thresholds spatial means), pack the 31 bits as four bands (8+8+8+7)
    and join pairs at hamming <= 3 — pigeonhole-complete candidate
    generation, same guarantee structure as the image gate.

    Spark plan: the int16 PCM materializes AND fingerprints inside one
    Arrow mapInPandas stage (numpy frame-reshape |s| sums; the 512-byte
    payload never shuffles — 5 ints out per row); band explode +
    equi-join, bit_count(xor) exact verify in codegen, top-100 via
    TakeOrderedAndProject. The oracle recomputes every energy and bit
    from the closed-form sample formula over a full pair scan, proving
    the PCM bytes, the framing, the delta-sign logic and the packing in
    one hash.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    emb = load(spark, sf_dir, "embeddings").select("vec_id")

    def afp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(_N_SAMP, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for v in pdf.vec_id:
                s = ((int(v) * 7 + idx * 13) % 61 - 30).astype("<i2")
                e = np.abs(s.astype(np.int64)).reshape(_AFP_FRAMES, _AFP_FLEN).sum(axis=1)
                bits = (e[1:] > e[:-1]).astype(np.int64)
                bands = []
                for j in range(4):
                    seg = bits[8 * j : 8 * j + (7 if j == 3 else 8)]
                    bands.append(int((seg << np.arange(seg.size, dtype=np.int64)).sum()))
                rows.append((int(v), *bands))
            yield pd.DataFrame(rows, columns=["vec_id", "b0", "b1", "b2", "b3"])

    sig = emb.mapInPandas(afp, "vec_id long, b0 long, b1 long, b2 long, b3 long")
    long = sig.select(
        "vec_id", "b0", "b1", "b2", "b3",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("bi"), F.col(f"b{j}").alias("bv"))
                for j in range(4)
            ])
        ).alias("band"),
    ).select("vec_id", "b0", "b1", "b2", "b3", "band.bi", "band.bv")
    a, b = long.alias("a"), long.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            *[F.col(f"a.b{j}").alias(f"a{j}") for j in range(4)],
            *[F.col(f"b.b{j}").alias(f"c{j}") for j in range(4)],
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    hamming = sum(F.bit_count(F.expr(f"a{j} ^ c{j}")) for j in range(4)).cast("long")
    return (
        cand.select("vec_a", "vec_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= AUDIO_HAMMING_T)
        .orderBy("hamming", "vec_a", "vec_b")
        .limit(100)
    )
