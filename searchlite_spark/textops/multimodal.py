"""Multimodal columns for training-data pipelines.

Images/audio/video ride through Spark as opaque BINARY columns with
typed metadata structs.  The Spark-side plumbing — schemas, Arrow batch
shape, ``mapInPandas`` signatures, partitioning — is real and tested;
the actual media decode is stubbed behind ``decoder=`` hooks because
image/audio libraries are not available in this environment (swap in
PIL/torchaudio/ffmpeg in production — the operator contract does not
change).

Design for 100 TB: media bytes dominate row size, so these operators

* never shuffle the binary column (all transforms are map-side);
* emit fixed-size feature vectors / thumbnails so downstream joins and
  ANN indexing shuffle only small columns;
* process per Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch``
  caps batch memory — set it low for large blobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
    ]
)


def attach_media_meta(
    df: DataFrame, media_col: str = "media", decoder=None
) -> DataFrame:
    """Adds a ``meta`` struct per media blob.

    ``decoder(bytes) -> dict`` parses container headers; the default
    deterministic fake sniffs magic bytes only (real decode stubbed)."""

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("meta", MEDIA_META_SCHEMA, True)]
    )

    def run(batches):
        import hashlib

        import pandas as pd

        def default_decoder(b: bytes) -> dict:
            mime = "application/octet-stream"
            if b[:3] == b"\xff\xd8\xff":
                mime = "image/jpeg"
            elif b[:8] == b"\x89PNG\r\n\x1a\n":
                mime = "image/png"
            elif b[:4] == b"RIFF":
                mime = "audio/wav"
            elif b[:4] == b"\x1a\x45\xdf\xa3":
                mime = "video/webm"
            # width/height/duration need a real decoder
            return {"mime": mime, "width": None, "height": None,
                    "duration_ms": None}

        dec = decoder or default_decoder
        for pdf in batches:
            metas = []
            for b in pdf[media_col]:
                if b is None:
                    metas.append(None)
                    continue
                b = bytes(b)
                m = dec(b)
                metas.append(
                    {
                        "mime": m.get("mime"),
                        "width": m.get("width"),
                        "height": m.get("height"),
                        "duration_ms": m.get("duration_ms"),
                        "n_bytes": len(b),
                        "sha1": hashlib.sha1(b).hexdigest(),
                    }
                )
            yield pdf.assign(meta=metas)

    return df.mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    dim: int = 64,
    extractor=None,
) -> DataFrame:
    """Adds ``features ARRAY<FLOAT>`` per blob (fixed dim).

    ``extractor(bytes) -> list[float]``.  The default is a STUB: a
    deterministic hash-derived pseudo-embedding with the right shape and
    batch mechanics — replace with a real model in production.  It
    raises if the blob is empty, exercising the error path."""

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches):
        import hashlib
        import struct

        def stub_extractor(b: bytes) -> list[float]:
            if not b:
                raise NotImplementedError(
                    "real media decode requires an image/audio library; "
                    "the stub needs non-empty bytes"
                )
            # deterministic pseudo-features: sha512 stretched to dim floats
            out = []
            seed = b[:4096]
            i = 0
            while len(out) < dim:
                h = hashlib.sha512(seed + struct.pack("<I", i)).digest()
                for j in range(0, 64, 4):
                    (v,) = struct.unpack("<i", h[j : j + 4])
                    out.append((v / 2**31))
                    if len(out) >= dim:
                        break
                i += 1
            return out

        ext = extractor or stub_extractor
        for pdf in batches:
            feats = [
                None if b is None else ext(bytes(b)) for b in pdf[media_col]
            ]
            yield pdf.assign(features=feats)

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    every_ms: int = 1000,
    max_frames: int = 8,
    frame_decoder=None,
) -> DataFrame:
    """Explodes video blobs into (frame_idx, frame BINARY) rows.

    ``frame_decoder(bytes, every_ms, max_frames) -> list[bytes]``.  The
    default STUB slices the container bytes deterministically (real
    frame extraction needs ffmpeg); the schema/explosion mechanics are
    the real contract."""

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != media_col]
        + [
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != media_col]

    def run(batches):
        import pandas as pd

        def stub(b: bytes, every, cap) -> list[bytes]:
            n = min(max(len(b) // max(every, 1), 1), cap)
            step = max(len(b) // n, 1)
            return [b[i * step : i * step + 64] for i in range(n)]

        dec = frame_decoder or stub
        for pdf in batches:
            rows = {c: [] for c in other_cols}
            idxs, frames = [], []
            for _, r in pdf.iterrows():
                b = r[media_col]
                if b is None:
                    continue
                for i, fr in enumerate(dec(bytes(b), every_ms, max_frames)):
                    for c in other_cols:
                        rows[c].append(r[c])
                    idxs.append(i)
                    frames.append(fr)
            rows["frame_idx"] = pd.Series(idxs, dtype="int32")
            rows["frame"] = frames
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, out_schema)
