"""Multimodal-column operators: images/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is real and tested — schema contract,
Arrow-batched ``mapInPandas`` pipelines, content hashing, metadata
handling, batch shapes. Decode has two paths:

- ``fake=True`` (default, the oracle path): a deterministic
  digest-derived decoder, stable across runs/machines, so every
  downstream stage is exercisable and DuckDB-checkable end-to-end.
- ``fake=False``: REAL decode. Pillow when importable; without it a
  pure-stdlib 8-bit PNG decoder (``_png_decode_rgb``) and a stdlib
  WAV/PCM-16 decoder (``decode_audio``) handle those formats for
  real, and anything else raises ``NotImplementedError`` at the exact
  boundary where a production codec (libvips/ffmpeg) slots in.

Schema contract for a multimodal asset table:

    asset_id  long
    modality  string            ('image' | 'audio' | 'video')
    content   binary            (opaque encoded bytes)
    meta      struct<mime string, width int, height int,
                     duration_ms long>

At 100 TB the binary column dominates: keep assets in their own table
partitioned by ingest date, carry only (asset_id, features) forward,
and never groupBy/shuffle the binary payload — all operators below
are per-partition maps (mapInPandas) with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def content_hash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """sha2 of the raw bytes — exact-dup detection across assets
    without decoding. Native function, no Python."""
    return df.withColumn("content_sha", F.sha2(F.col(content_col), 256))


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived
    from the content digest. Stable across runs/machines."""
    digest = hashlib.sha256(content).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def _png_decode_rgb(content: bytes) -> tuple[int, int, list[int]]:
    """Minimal REAL PNG decoder (pure stdlib): 8-bit non-interlaced
    greyscale/RGB/RGBA, the subset every PNG encoder emits by default.
    Parses IHDR/IDAT, zlib-inflates, undoes the per-scanline filters
    (None/Sub/Up/Average/Paeth per the PNG spec), returns
    (width, height, flat RGB bytes). Raises ValueError on anything it
    cannot faithfully decode — a wrong answer is worse than no answer.
    """
    import struct as _struct
    import zlib as _zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = b""
    while pos < len(content):
        (length,) = _struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                _struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise ValueError(
                    f"unsupported PNG: depth={bit_depth} color={color_type} "
                    f"interlace={interlace}"
                )
            nch = {0: 1, 2: 3, 6: 4}[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = _zlib.decompress(idat)
    stride = width * nch
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        filt = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        for x in range(stride):
            a = row[x - nch] if x >= nch else 0
            b = prev[x]
            c = prev[x - nch] if x >= nch else 0
            if filt == 1:
                row[x] = (row[x] + a) & 0xFF
            elif filt == 2:
                row[x] = (row[x] + b) & 0xFF
            elif filt == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif filt == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pr) & 0xFF
            elif filt != 0:
                raise ValueError(f"bad PNG filter {filt}")
        prev = row
        # normalize to RGB triples
        for i in range(0, stride, nch):
            if nch == 1:
                out += bytes((row[i], row[i], row[i]))
            else:
                out += bytes(row[i : i + 3])
    return width, height, list(out)


def decode_image(content: bytes) -> list[float]:
    """REAL image decode → FEATURE_DIM floats: mean/std per RGB
    channel, aspect, and a 3×3 luma grid (pooled means) — the shape a
    perceptual-hash / quality filter consumes. Pillow is used when
    importable; otherwise the pure-stdlib PNG path decodes 8-bit PNGs
    for real. Other formats without Pillow raise NotImplementedError
    at the decode boundary (keep ``fake=True`` for the oracle path).
    """
    try:  # preferred: full-codec decode
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        img = Image.open(io.BytesIO(content)).convert("RGB")
        width, height = img.size
        pix = list(img.tobytes())
    except ImportError:
        try:
            width, height, pix = _png_decode_rgb(content)
        except ValueError as exc:
            raise NotImplementedError(
                f"no codec for this image without Pillow ({exc}); "
                "use fake=True"
            ) from exc
    n = width * height
    feats: list[float] = []
    for ch in range(3):  # per-channel mean/std, [0, 1]
        vals = pix[ch::3]
        mean = sum(vals) / n
        var = sum((v - mean) ** 2 for v in vals) / n
        feats += [mean / 255.0, var**0.5 / 255.0]
    feats.append(min(width / height, 8.0))
    # 3x3 pooled luma grid
    luma = [
        0.299 * pix[3 * i] + 0.587 * pix[3 * i + 1] + 0.114 * pix[3 * i + 2]
        for i in range(n)
    ]
    for gy in range(3):
        for gx in range(3):
            cells = [
                luma[y * width + x]
                for y in range(gy * height // 3, max((gy + 1) * height // 3, gy * height // 3 + 1))
                for x in range(gx * width // 3, max((gx + 1) * width // 3, gx * width // 3 + 1))
            ]
            feats.append(sum(cells) / len(cells) / 255.0)
    return [float(f) for f in feats[:FEATURE_DIM]]


def decode_audio(content: bytes) -> list[float]:
    """REAL audio decode → FEATURE_DIM floats for WAV/PCM (stdlib
    ``wave``): duration, channels, sample rate band, overall RMS and
    a 12-segment RMS envelope — the features a silence/clipping
    filter consumes. Non-WAV without a codec raises at the boundary.
    """
    import io  # noqa: PLC0415
    import struct as _struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    try:
        with wave.open(io.BytesIO(content)) as w:
            nch, sw, rate, nframes = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            f"no codec for this audio without ffmpeg ({exc}); use fake=True"
        ) from exc
    if sw != 2:
        raise NotImplementedError("only 16-bit PCM supported without ffmpeg")
    samples = _struct.unpack(f"<{len(raw) // 2}h", raw)
    mono = [
        sum(samples[i : i + nch]) / nch for i in range(0, len(samples), nch)
    ]
    n = max(len(mono), 1)
    scale = 32768.0
    rms = (sum(s * s for s in mono) / n) ** 0.5 / scale
    feats = [nframes / rate, float(nch), rate / 48000.0, rms]
    seg = max(n // 12, 1)
    for i in range(12):
        chunk = mono[i * seg : (i + 1) * seg] or [0.0]
        feats.append(
            (sum(s * s for s in chunk) / len(chunk)) ** 0.5 / scale
        )
    return [float(f) for f in feats[:FEATURE_DIM]]


def _wav_mono(content: bytes) -> tuple[list[float], int]:
    """Shared REAL WAV/PCM-16 decode: ([-1, 1] mono samples, rate)."""
    import io  # noqa: PLC0415
    import struct as _struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    try:
        with wave.open(io.BytesIO(content)) as w:
            nch, sw, rate, nframes = (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            f"no codec for this audio without ffmpeg ({exc})"
        ) from exc
    if sw != 2:
        raise NotImplementedError("only 16-bit PCM supported without ffmpeg")
    samples = _struct.unpack(f"<{len(raw) // 2}h", raw)
    mono = [
        sum(samples[i : i + nch]) / nch / 32768.0
        for i in range(0, len(samples), nch)
    ]
    return mono, rate


def audio_spectral_features(
    assets: DataFrame,
    id_col: str = "asset_id",
    content_col: str = "content",
    rolloff_fraction: float = 0.85,
) -> DataFrame:
    """REAL spectral profile per audio asset — the signals an audio
    training-data gate filters on: duration, RMS (silence), clipping
    fraction, zero-crossing rate (noisiness), spectral centroid
    (brightness, Hz) and rolloff (bandwidth, Hz) from one rFFT over
    the mono signal. One Arrow-batched pass over the binary column
    (numpy per batch), no shuffle; non-WAV content fails loudly at the
    boundary like every real decode here.
    """
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    def _features(content: bytes) -> list[float]:
        mono, rate = _wav_mono(bytes(content))
        x = np.asarray(mono)
        n = len(x)
        if n == 0:
            return [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        rms = float(np.sqrt((x**2).mean()))
        clip = float((np.abs(x) >= 32766 / 32768).mean())
        zcr = float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        power = mag**2
        total = power.sum()
        if total > 0:
            centroid = float((freqs * power).sum() / total)
            cum = np.cumsum(power)
            rolloff = float(
                freqs[int(np.searchsorted(cum, rolloff_fraction * total))]
            )
        else:
            centroid = rolloff = 0.0
        return [n / rate, rms, clip, zcr, centroid, rolloff]

    schema = (
        "struct<duration_s double, rms double, clip_fraction double, "
        "zcr double, spectral_centroid_hz double, rolloff_hz double>"
    )

    def _batch(col):
        return pd.DataFrame(
            [
                dict(
                    zip(
                        (
                            "duration_s",
                            "rms",
                            "clip_fraction",
                            "zcr",
                            "spectral_centroid_hz",
                            "rolloff_hz",
                        ),
                        (round(v, 6) for v in _features(c)),
                    )
                )
                for c in col
            ]
        )

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's hint inference can't resolve
    feat_udf = pandas_udf(_batch, schema)
    return assets.select(
        F.col(id_col), feat_udf(F.col(content_col)).alias("f")
    ).select(id_col, "f.*")


def audio_phash(content: bytes) -> int:
    """64-bit audio perceptual hash (chromaprint's construction in
    miniature): 9 time segments × 8 geometric frequency bands of rFFT
    energy, one bit per TEMPORAL energy gradient within each band
    (band b rising from segment t to t+1). Gradient signs are
    invariant to global gain and robust to re-encoding — the audio
    analogue of :func:`image_dhash`, and it feeds the same Manku
    banding. Signed 64-bit for a Spark ``long``."""
    import numpy as np

    mono, rate = _wav_mono(bytes(content))
    x = np.asarray(mono)
    n = len(x)
    if n < 18:
        raise ValueError("audio too short for a spectral hash")
    segs = np.array_split(x, 9)
    nyquist = rate / 2.0
    edges = 100.0 * (nyquist / 100.0) ** (np.arange(9) / 8.0)  # geometric
    energies = np.zeros((9, 8))
    for t, seg in enumerate(segs):
        mag = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), d=1.0 / rate)
        for b in range(8):
            sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
            energies[t, b] = mag[sel].sum()
    bits = 0
    k = 0
    for b in range(8):
        for t in range(8):
            if energies[t, b] < energies[t + 1, b]:
                bits |= 1 << k
            k += 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_phashes(
    assets: DataFrame,
    id_col: str = "asset_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-asset audio hash: (id, simhash) — slots into the SimHash
    banding machinery, one Arrow pass over the binary column."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _hash_batch(col):
        return pd.Series([audio_phash(bytes(b)) for b in col])

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's hint inference can't resolve
    phash_udf = pandas_udf(_hash_batch, "long")
    return assets.select(
        F.col(id_col), phash_udf(F.col(content_col)).alias("simhash")
    )


def audio_near_dups(
    assets: DataFrame,
    max_hamming: int = 6,
    id_col: str = "asset_id",
    content_col: str = "content",
    blocks: int = 6,
) -> DataFrame:
    """Perceptually-near-duplicate audio pairs via the same banded
    path as :func:`image_near_dups`: hash once, equi-join on
    block-combination keys, popcount verify — audio bytes never
    shuffle."""
    from pyspark.storagelevel import StorageLevel

    from ..caching import unpersist_on_release
    from .dedup import simhash_candidate_pairs

    fps = audio_phashes(assets, id_col=id_col, content_col=content_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    result = (
        simhash_candidate_pairs(fps, max_hamming, id_col=id_col, blocks=blocks)
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return unpersist_on_release(result, fps)


def _dispatch_real(decoders: dict, modality: str, content: bytes) -> list[float]:
    fn = decoders.get(modality)
    if fn is None:
        raise NotImplementedError(
            f"no real decoder for modality {modality!r}; use fake=True"
        )
    feats = fn(content)
    return feats + [0.0] * (FEATURE_DIM - len(feats))


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the asset table.

    ``mapInPandas`` processes whole record batches per partition — the
    decode cost is the only per-row cost, there is no shuffle, and
    batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
    (so executor memory is safe even with large blobs).
    """

    real = {"image": decode_image, "audio": decode_audio}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            if fake:
                feats = contents.map(lambda b: _fake_decode(bytes(b)))
            else:
                feats = pd.Series(
                    [
                        _dispatch_real(real, mod, bytes(b))
                        for mod, b in zip(pdf["modality"], contents)
                    ],
                    index=pdf.index,
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content_sha": contents.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "n_bytes": contents.map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def _fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: a stable
    function of (content digest, target dims) with output length
    scaled to the target pixel count, so size-dependent downstream
    behavior (batching, memory accounting) is exercisable."""
    digest = hashlib.sha256(content + f"{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)
    return (digest * (n // len(digest) + 1))[:n]


def _luma_grid(content: bytes, gw: int, gh: int) -> list[float]:
    """REAL decode → box-averaged luma grid (gh rows × gw cols).
    Pillow when importable, else the stdlib PNG path — same loudness
    contract as :func:`decode_image`."""
    try:
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        img = Image.open(io.BytesIO(content)).convert("RGB")
        width, height = img.size
        pix = list(img.tobytes())
    except ImportError:
        try:
            width, height, pix = _png_decode_rgb(content)
        except ValueError as exc:
            raise NotImplementedError(
                f"no codec for this image without Pillow ({exc})"
            ) from exc
    luma = [
        0.299 * pix[3 * i] + 0.587 * pix[3 * i + 1] + 0.114 * pix[3 * i + 2]
        for i in range(width * height)
    ]
    grid: list[float] = []
    for gy in range(gh):
        y0, y1 = gy * height // gh, max((gy + 1) * height // gh, gy * height // gh + 1)
        for gx in range(gw):
            x0, x1 = gx * width // gw, max((gx + 1) * width // gw, gx * width // gw + 1)
            cells = [luma[y * width + x] for y in range(y0, y1) for x in range(x0, x1)]
            grid.append(sum(cells) / len(cells))
    return grid


def image_dhash(content: bytes) -> int:
    """64-bit difference hash (dHash, the standard perceptual hash for
    image near-dup detection): 9×8 box-averaged luma grid, one bit per
    horizontal gradient sign. Robust to re-encoding, resizing, and
    mild brightness shifts (gradients survive them); Hamming distance
    between hashes approximates visual difference. Returned as a
    SIGNED 64-bit int so it lands in a Spark ``long`` unchanged."""
    g = _luma_grid(content, 9, 8)
    bits = 0
    k = 0
    for y in range(8):
        row = g[y * 9 : (y + 1) * 9]
        for x in range(8):
            if row[x] < row[x + 1]:
                bits |= 1 << k
            k += 1
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_dhashes(
    assets: DataFrame,
    id_col: str = "asset_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-asset dHash: (id, simhash) — named to slot straight into
    the SimHash banding machinery. One Arrow-batched pass over the
    binary column, no shuffle."""
    from pyspark.sql.pandas.functions import pandas_udf

    def _hash_batch(col):
        return pd.Series([image_dhash(bytes(b)) for b in col])

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf's hint inference can't resolve
    dhash_udf = pandas_udf(_hash_batch, "long")
    return assets.select(
        F.col(id_col), dhash_udf(F.col(content_col)).alias("simhash")
    )


def image_near_dups(
    assets: DataFrame,
    max_hamming: int = 4,
    id_col: str = "asset_id",
    content_col: str = "content",
    blocks: int = 6,
) -> DataFrame:
    """Visually-near-duplicate image pairs: dHash fingerprints through
    the EXISTING Manku block-combination banding
    (``dedup.simhash_candidate_pairs``) — candidates from an equi-join
    on block-combination keys, never an all-pairs image comparison —
    then the exact popcount verify. (id_a, id_b, hamming ≤ budget).

    The binary column is read exactly once (the fingerprint pass);
    banding, joining, and verification shuffle only (id, 8-byte hash)
    rows — at 100 TB the images never move."""
    from pyspark.storagelevel import StorageLevel

    from .dedup import simhash_candidate_pairs
    from ..caching import unpersist_on_release

    fps = image_dhashes(assets, id_col=id_col, content_col=content_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    result = (
        simhash_candidate_pairs(fps, max_hamming, id_col=id_col, blocks=blocks)
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return unpersist_on_release(result, fps)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Resize the image assets to (width, height) — same asset-table
    schema out, with ``content`` re-encoded and ``meta`` dims updated.

    Same plumbing contract as :func:`extract_features`: Arrow-batched
    ``mapInPandas``, per-partition, no shuffle, binary payload never
    leaves its partition. The pixel work is stubbed (no codecs in
    this container): ``fake=True`` runs a deterministic stand-in,
    ``fake=False`` raises at the decode boundary exactly where a real
    Pillow/libvips call slots in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs not available in this environment; "
                    "use fake=True"
                )
            out = pdf.copy()
            out["content"] = out["content"].map(
                lambda b: _fake_resize(bytes(b), width, height)
            )
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            yield out

    return df.filter(F.col("modality") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: computes per-asset frame timestamps
    (native array expression) without decoding — the decode of each
    sampled frame would run through ``extract_features``-style
    mapInPandas in deployment."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.filter(F.col("modality") == "video").select(
        "asset_id",
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
            lambda i: i * every_ms,
        ).alias("frame_ts_ms"),
    )


def synth_png(group: int, variant: int) -> bytes:
    """REAL PNG bytes (stdlib encoder: 8-bit RGB, filter 0) with
    PLANNED perceptual structure: ``group`` picks a diagonal-ramp
    pattern (structurally distinct in dHash space), ``variant`` picks a
    rendition that should (0→1) hash identically — the same picture at
    doubled resolution, which box-averaging collapses back to the same
    9×8 grid — or (0→2) land a few gradient-sign flips away (+8
    brightness, clipped). Deterministic: pure function of (group,
    variant)."""
    import struct
    import zlib

    sx, sy = 7 + 2 * (group % 4), 3 + 5 * (group // 4)

    def base(x: int, y: int) -> int:
        return (x * sx + y * sy) * 11 % 256

    if variant == 1:
        width, height = 36, 32

        def pix(x: int, y: int) -> int:
            return base(x // 2, y // 2)

    else:
        width, height = 18, 16
        if variant == 2:

            def pix(x: int, y: int) -> int:
                return min(255, base(x, y) + 8)

        else:
            pix = base

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body))
        )

    raw = b"".join(
        b"\x00" + bytes(v for x in range(width) for v in (pix(x, y),) * 3)
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_wav(group: int, variant: int) -> bytes:
    """REAL 16-bit mono PCM WAV bytes (stdlib ``wave``) with planned
    perceptual structure: ``group`` picks a 6-note melody, ``variant``
    0→1 is a pure gain cut (temporal-spectral gradient signs are
    ratio-invariant → identical perceptual hash), 0→2 reverses the
    melody (far in Hamming space). Deterministic."""
    import io
    import math
    import struct
    import wave

    rate = 8000
    freqs = [200.0 + 120.0 * ((group * 7 + j * 3) % 11 + 1) for j in range(6)]
    if variant == 2:
        freqs = list(reversed(freqs))
    samples = [
        int(0.4 * 32767 * math.sin(2 * math.pi * f * i / rate))
        for f in freqs
        for i in range(900)
    ]
    if variant == 1:
        samples = [int(s * 0.4) for s in samples]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def make_media_asset_table(
    documents: DataFrame,
    id_col: str = "doc_id",
    n_per_modality: int = 24,
    n_groups: int = 8,
) -> DataFrame:
    """Asset table with REAL encoded media: for each of the first
    ``n_per_modality`` document ids, one synthesized PNG and one WAV
    (``synth_png``/``synth_wav``; group = id % n_groups, variant =
    id // n_groups mod 3 — so each group carries an identical-looking
    pair and a near-miss by construction). Image asset_id = doc id,
    audio asset_id = doc id + 1000.

    The synthesis runs as one Arrow-batched ``mapInPandas`` pass — the
    same task shape a real ingest's decode/transcode step has — and the
    result satisfies ``ASSET_SCHEMA`` exactly."""
    base = (
        documents.select(F.col(id_col).cast("long").alias("seq"))
        .filter(F.col("seq") < n_per_modality)
    )

    flat_schema = (
        "asset_id long, modality string, content binary, mime string, "
        "width int, height int, duration_ms long"
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for seq in pdf["seq"]:
                seq = int(seq)
                g, v = seq % n_groups, (seq // n_groups) % 3
                png = synth_png(g, v)
                w = 36 if v == 1 else 18
                h = 32 if v == 1 else 16
                rows.append((seq, "image", png, "image/png", w, h, 0))
                wav = synth_wav(g, v)
                rows.append(
                    (seq + 1000, "audio", wav, "audio/wav", 0, 0, 675)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "modality",
                    "content",
                    "mime",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return base.mapInPandas(_gen, flat_schema).select(
        "asset_id",
        "modality",
        "content",
        F.struct("mime", "width", "height", "duration_ms").alias("meta"),
    )


def make_asset_table(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Build a synthetic asset table from the documents testdata:
    text bytes play the role of encoded media (the harness ships no
    real media). Deterministic: same input → same assets."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
