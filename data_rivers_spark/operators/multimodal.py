"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` columns plus a typed metadata struct —
the Spark-side schema, partitioning, UDF signatures, and Arrow batch shapes
are real and tested. The codec step is a ``decoder=`` hook with two
implementations: ``real_decode`` (capability-gated — WAV via the stdlib
everywhere; images/other-audio/video when Pillow/soundfile/PyAV are
importable, ``MediaCapabilityError`` otherwise) and ``fake_decode`` (a
deterministic content-hash stand-in for hermetic pipeline tests).

Scale design: mapInPandas streams Arrow record batches — media bytes never
materialize as one driver-side blob; batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Partition by content-hash
ranges for even byte distribution (media sizes are heavy-tailed).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def fake_decode(content: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a codec: derives a pseudo 'decoded' payload
    from the byte content alone, so pipeline tests are hermetic and stable.

    The payload is a FULL 32x32 grid of shake_256 bytes (1024 pixels), not
    a short digest: the original 16-pixel form tiled cyclically through the
    pHash DCT, collapsing the 63 hash bits onto ~16 independent values —
    two UNRELATED contents then landed within hamming 3 at a measured rate
    of ~6.6e-9 per pair (six orders of magnitude above a uniform 64-bit
    hash's ~2.4e-15), which made near-dup pair counts quadratic in corpus
    size for ANY input (the r10 1024x scaling octave measured 86M pairs on
    5.12M distinct documents before this fix). A full-entropy grid restores
    the property real images have: distinct contents separate, exact byte
    duplicates still collide under any decoder."""
    import hashlib

    h = hashlib.sha256(content or b"").digest()
    return {
        "pixels": list(hashlib.shake_256(content or b"").digest(1024)),
        "width": 1 + h[0] % 64,
        "height": 1 + h[1] % 64,
    }


class MediaCapabilityError(RuntimeError):
    """A decode was requested for a format whose codec library is absent."""


def media_capabilities() -> dict[str, bool]:
    """Which real decode paths the runtime supports (same capability-probe
    pattern as sources.avro_io.avro_available): WAV audio always (stdlib
    ``wave``), images with Pillow, other audio with soundfile, video with
    PyAV."""
    caps = {"audio_wav": True}
    for mod, key in (("PIL.Image", "image"), ("soundfile", "audio"), ("av", "video")):
        try:
            __import__(mod)
            caps[key] = True
        except Exception:  # noqa: BLE001 - any import failure = capability off
            caps[key] = False
    return caps


def real_decode(content: bytes, media_type: str) -> dict:
    """Capability-gated production decoder: uses whatever codec libraries
    the runtime ships and raises ``MediaCapabilityError`` otherwise (callers
    inside ``extract_features`` quarantine that as decode_ok=False, and
    tests skip cleanly when a library is absent). WAV/RIFF audio decodes
    with the standard library alone, so one real end-to-end decode path
    exists on every runtime; ``fake_decode`` remains the hermetic stand-in
    for pipeline tests that must not depend on codec availability."""
    import io

    if media_type == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise MediaCapabilityError(
                "image decode needs Pillow; pass decoder=fake_decode for "
                "hermetic pipeline tests"
            ) from e
        img = Image.open(io.BytesIO(content or b""))
        img.load()
        thumb = img.convert("L").resize((4, 4))
        return {
            "pixels": list(thumb.getdata()),
            "width": img.width,
            "height": img.height,
            "format": img.format,
        }
    if media_type == "audio":
        if (content or b"")[:4] == b"RIFF":
            import wave

            with wave.open(io.BytesIO(content)) as w:
                n, rate = w.getnframes(), w.getframerate()
                head = w.readframes(min(n, 16))
                return {
                    "pixels": list(head[:16]),
                    "width": w.getnchannels(),
                    "height": w.getsampwidth(),
                    "duration_ms": int(n * 1000 / rate) if rate else 0,
                }
        try:
            import soundfile as sf
        except ImportError as e:
            raise MediaCapabilityError(
                "non-WAV audio decode needs soundfile"
            ) from e
        data, rate = sf.read(io.BytesIO(content or b""))
        flat = data.reshape(-1)[:16]
        return {
            "pixels": [min(127, int(abs(x) * 127)) for x in flat],
            "width": int(data.shape[-1]) if data.ndim > 1 else 1,
            "height": 0,
            "duration_ms": int(data.shape[0] * 1000 / rate) if rate else 0,
        }
    if media_type == "video":
        try:
            import av  # noqa: F401
        except ImportError as e:
            raise MediaCapabilityError("video decode needs PyAV") from e
        raise MediaCapabilityError(
            "PyAV is importable but the frame-decode wiring is not validated "
            "in this build; use sample_video_frames for timestamp fan-out"
        )
    raise MediaCapabilityError(f"unknown media_type {media_type!r}")


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] = fake_decode,
    feature_dim: int = 16,
) -> DataFrame:
    """Decode each media row and emit a fixed-dim float feature vector.

    mapInPandas: Arrow batches in, Arrow batches out; decode failures yield
    decode_ok=False with NULL feature (quarantine pattern, same posture as the
    reference's 'slag' bucket, gcs_utils.py:209-246)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"media_id": [], "feature": [], "decode_ok": []}
            # zip over raw column arrays — iterrows() materializes a Series
            # per row and is the slowest pandas iteration idiom
            for mid, content, mtype in zip(
                batch["media_id"], batch["content"], batch["media_type"]
            ):
                out["media_id"].append(mid)
                try:
                    decoded = decoder(content, mtype)
                    vec = [float(x) for x in decoded["pixels"][:feature_dim]]
                    vec += [0.0] * (feature_dim - len(vec))
                    out["feature"].append(vec)
                    out["decode_ok"].append(True)
                except Exception:  # noqa: BLE001 - quarantine any codec failure
                    out["feature"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    # fan out before the Python decode boundary (session.fan_out, no-op on
    # a well-split input): per-row decode dominates the scan and a single-
    # split input runs every Arrow batch in one task (r13)
    from data_rivers_spark.session import fan_out

    return fan_out(df).mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    decoder: Callable[[bytes, str], dict] = fake_decode,
) -> DataFrame:
    """Resize: decode → scale → re-encode. With the fake decoder the 'resize'
    re-hashes content to the target dims (plumbing-only); schema and batch
    flow are production-shaped."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for content, mtype in zip(batch["content"], batch["media_type"]):
                decoder(content, mtype)  # validate decodability
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "content": batch["content"],
                    "width": width,
                    "height": height,
                }
            )

    from data_rivers_spark.session import fan_out

    return fan_out(df).mapInPandas(run, out_schema)  # fan out: see extract_features (r13)


def sample_video_frames(
    df: DataFrame, every_ms: int, decoder: Callable[[bytes, str], dict] = fake_decode
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp
    (media_id, frame_ts_ms, frame bytes stub). Native explode drives the
    fan-out; only the codec is stubbed."""
    frames = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_ts_ms"),
        )
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Byte-size / type distribution — the cheap native profile that should
    always run before any decode fan-out."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length(F.col("content")).cast("long")).alias("total_bytes"),
        F.max(F.length(F.col("content")).cast("long")).alias("max_bytes"),
    )


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("phash", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def perceptual_hash(
    df: DataFrame,
    decoder: Callable[[bytes, str], dict] = fake_decode,
    grid: int = 8,
) -> DataFrame:
    """64-bit perceptual hash per media row: decode → pixel grid → 2D
    DCT-II (numpy, no extra deps) → keep the top-left ``grid``×``grid``
    low-frequency block (minus DC) → median threshold → bit-pack. Visually
    similar images land within a small hamming distance, the classic pHash
    property; EXACT byte duplicates always collide under any decoder,
    including ``fake_decode`` — which is what the hermetic tests pin, since
    the fake decoder's output has no visual structure.

    mapInPandas with the same quarantine posture as extract_features:
    decode failures yield phash=NULL, decode_ok=False."""
    import numpy as np

    # orthonormal DCT-II matrix — input-independent, built ONCE per task
    n = 32
    k = np.arange(n)
    basis = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis[0, :] = np.sqrt(1.0 / n)

    def _phash_batch(pix_list: list) -> "np.ndarray":
        """Vectorized pHash over a batch of decoded pixel arrays: one
        cyclic-tile gather into a (B, 32, 32) stack, TWO batched dgemms for
        the 2D DCT, and a vectorized median-threshold bit-pack. The earlier
        per-row form (row matmuls + a 63-iteration Python bit loop) was the
        hot cost of the phash stage — the math is identical: matmul
        accumulation order matches the per-row basis @ arr @ basis.T, the
        cyclic tiling matches np.resize, and the 63 packed bits never reach
        the sign bit."""
        lens = np.array([max(p.size, 1) for p in pix_list], dtype=np.int64)
        flat = np.concatenate(
            [p if p.size else np.zeros(1) for p in pix_list]
        ).astype(np.float64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = starts[:, None] + (np.arange(n * n)[None, :] % lens[:, None])
        M = flat[idx].reshape(len(pix_list), n, n)
        freq = np.matmul(np.matmul(basis[None, :, :], M), basis.T[None, :, :])
        block = freq[:, :grid, :grid].reshape(len(pix_list), grid * grid)[:, 1:]
        med = np.median(block, axis=1)
        bits = (
            (block >= med[:, None]).astype(np.uint64)
            << np.arange(block.shape[1], dtype=np.uint64)
        ).sum(axis=1)
        return bits.astype(np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            mids, oks, pix = [], [], []
            for mid, content, mtype in zip(
                batch["media_id"], batch["content"], batch["media_type"]
            ):
                mids.append(mid)
                try:
                    d = decoder(content, mtype)
                    # ravel: a decoder returning 2-D/nested pixels must not
                    # poison the batch concatenate — shape is irrelevant to
                    # the cyclic tile anyway
                    pix.append(np.asarray(d["pixels"], dtype=np.float64).ravel())
                    oks.append(True)
                except Exception:  # noqa: BLE001 - quarantine any codec failure
                    pix.append(None)
                    oks.append(False)
            hashes: list = [None] * len(mids)
            good = [i for i, p in enumerate(pix) if p is not None]
            if good:
                try:
                    packed = _phash_batch([pix[i] for i in good])
                    for j, i in enumerate(good):
                        hashes[i] = int(packed[j])
                except Exception:  # noqa: BLE001 - keep per-ROW quarantine:
                    # one pathological row must not fail the whole task, so
                    # retry each row alone and quarantine only the bad ones
                    for i in good:
                        try:
                            hashes[i] = int(_phash_batch([pix[i]])[0])
                        except Exception:  # noqa: BLE001
                            hashes[i] = None
                            oks[i] = False
            # nullable Int64: a plain list with a None would coerce the
            # whole column to float64 and silently corrupt low bits of the
            # OTHER rows' 63-bit hashes (measured: batches containing one
            # quarantined row shifted every survivor's hash)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "phash": pd.array(hashes, dtype="Int64"),
                    "decode_ok": oks,
                }
            )

    from data_rivers_spark.session import fan_out

    return fan_out(df).mapInPandas(run, PHASH_SCHEMA)  # fan out: see extract_features (r13)


def media_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    decoder: Callable[[bytes, str], dict] = fake_decode,
) -> DataFrame:
    """Near-duplicate media pairs: perceptual hash + the SAME Manku
    combination-blocked hamming join the text SimHash path uses
    (dedup.simhash_near_pairs) — one blocking implementation serves both
    modalities, because both reduce near-duplication to 64-bit signatures.
    Returns (id_a, id_b, hamming) with id_a < id_b; undecodable rows
    (phash NULL) can never pair and fall out in the blocking join."""
    from data_rivers_spark.operators.dedup import simhash_near_pairs

    sigs = perceptual_hash(df, decoder=decoder).filter(F.col("decode_ok"))
    return simhash_near_pairs(
        sigs, "media_id", sim_col="phash", max_hamming=max_hamming
    )


def media_dedup(
    df: DataFrame,
    max_hamming: int = 3,
    decoder: Callable[[bytes, str], dict] = fake_decode,
) -> DataFrame:
    """Drop near-duplicate media rows, keeping the lowest media_id per
    near-dup pair (greedy min-id, same semantics as the text dedups).
    Undecodable rows are KEPT — quarantine is a separate decision from
    dedup, and dropping rows the pipeline couldn't even read would hide
    data loss."""
    pairs = media_near_dup_pairs(df, max_hamming=max_hamming, decoder=decoder)
    dupes = pairs.select(F.col("id_b").alias("media_id")).distinct()
    return df.join(dupes, "media_id", "left_anti")
