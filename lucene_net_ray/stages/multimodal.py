"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The Ray-side plumbing — schema, actor-pool stages, batch sizing, output
layout — is real and tested; the actual media decode is STUBBED because this
container ships no image/audio libraries. ``DecodeStage`` tries to import
PIL/soundfile and falls back to a clearly-marked deterministic fake decoder
(or raises NotImplementedError with ``strict=True``). Swapping in a real
decoder changes ONE method, not the pipeline.

Design rules encoded here (for 100 TB media):
  - payloads are `binary` columns; batch_size is SMALL (payload x batch x
    concurrency must fit worker heap) — default 32
  - decode/feature stages are actor pools (model/codec loaded once per actor
    in __init__), `num_cpus` sized per stage
  - outputs keep (content_id, modality, meta...) and drop payloads as early
    as possible so only features flow downstream
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("content_id", pa.int64()),
        ("modality", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("source_uri", pa.string()),
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (binary payloads derived from the seed)."""
    rng = np.random.default_rng(seed)
    modalities = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        m = modalities[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            {"content_id": i, "modality": m, "payload": payload, "source_uri": f"mem://{m}/{i}"}
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeStage:
    """Actor-pool stage: binary payload -> typed metadata + feature vector.

    Real decoders load once per actor in __init__ (the actor-pool contract);
    the deterministic fake derives metadata from a payload hash so tests and
    downstream plumbing are stable without media libs.
    """

    def __init__(self, feature_dim: int = 16, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict
        self._pil = None
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile; install them or "
                    "run with strict=False to use the deterministic fake decoder"
                )

    def _fake_decode(self, payload: bytes, modality: str) -> dict:
        h = hashlib.blake2b(payload, digest_size=16).digest()
        w = 64 + h[0] % 192
        hgt = 64 + h[1] % 192
        dur = round(0.5 + h[2] / 32.0, 3)
        feat = (
            np.frombuffer(hashlib.blake2b(payload, digest_size=self.feature_dim * 4).digest(), dtype=np.uint32)
            .astype(np.float32)
            / np.float32(2**32)
        )
        meta = {"width": w, "height": hgt} if modality == "image" else {"width": 0, "height": 0}
        meta["duration_sec"] = 0.0 if modality == "image" else dur
        meta["feature"] = feat.tolist()
        return meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "content_id": batch.column("content_id"),
            "modality": batch.column("modality"),
            "source_uri": batch.column("source_uri"),
        }
        widths, heights, durs, feats, nbytes = [], [], [], [], []
        for row in batch.to_pylist():
            meta = self._fake_decode(row["payload"], row["modality"])
            widths.append(meta["width"])
            heights.append(meta["height"])
            durs.append(meta["duration_sec"])
            feats.append(meta["feature"])
            nbytes.append(len(row["payload"]))
        out.update(
            {
                "payload_bytes": pa.array(nbytes, type=pa.int64()),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "duration_sec": pa.array(durs, type=pa.float64()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )
        return pa.table(out)  # payload dropped here — only features flow on


class ResizeStage:
    """Actor-pool stage stub: image resize plan (real resize = PIL thumbnail)."""

    def __init__(self, target: int = 224):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy()
        h = batch.column("height").to_numpy()
        # audio rows carry 0x0 dims; clamp the denominator so np.where's
        # eagerly-evaluated division branch never divides by zero
        longest = np.maximum(np.maximum(w, h), 1).astype(np.float64)
        scale = np.where((w > 0) & (h > 0), self.target / longest, 1.0)
        return batch.append_column("resize_scale", pa.array(np.round(scale, 6), type=pa.float64()))


class FrameSampleStage:
    """Actor-pool stage: expand each video/audio row into ``fps``-spaced
    sample rows (frame timestamp + per-frame feature). Real decoders would
    seek the container per timestamp; the deterministic fake derives each
    frame's feature from (content feature, frame index) so the expansion
    plumbing — one input row -> many output rows, payloads long gone — is
    real and testable. Images pass through as a single frame at t=0."""

    def __init__(self, fps: float = 1.0, max_frames: int = 16, feature_dim: int = 16):
        self.fps = fps
        self.max_frames = max_frames
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            dur = row.get("duration_sec") or 0.0
            n = 1 if dur <= 0 else min(self.max_frames, max(1, int(dur * self.fps)))
            base = np.asarray(row["feature"], dtype=np.float32)
            for fi in range(n):
                seed = hashlib.blake2b(
                    f"{row['content_id']}:{fi}".encode(), digest_size=4
                ).digest()
                jitter = np.float32(int.from_bytes(seed, "little") / 2**32)
                rows.append(
                    {
                        "content_id": row["content_id"],
                        "modality": row["modality"],
                        "frame_index": fi,
                        "timestamp_sec": round(fi / self.fps, 6) if dur > 0 else 0.0,
                        "frame_feature": ((base + jitter) % np.float32(1.0)).tolist(),
                    }
                )
        return pa.Table.from_pylist(rows)


def media_feature_pipeline(
    ds: ray.data.Dataset, *, concurrency=(1, 4), batch_size: int = 32, feature_dim: int = 16
) -> ray.data.Dataset:
    """payload -> decode (actor pool, small batches) -> resize plan."""
    decoded = ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # binary payloads: keep batches small
        concurrency=concurrency,
    )
    return decoded.map_batches(
        ResizeStage, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )


class MediaHashStage:
    """Actor-pool stage: feature vector -> 64-bit perceptual-hash-style code
    (sign bits of seeded random projections, built once per actor). The
    multimodal analog of SimHash: near-identical media produce codes within
    a small Hamming distance."""

    def __init__(self, feature_dim: int = 16, bits: int = 64, seed: int = 31):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((bits, feature_dim))
        self.bits = bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch.column("feature")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(arr), -1)
        m = m - m.mean(axis=1, keepdims=True)  # center like pHash's DCT mean
        signs = (m @ self.planes.T) > 0
        codes = (signs.astype(np.uint64) << np.arange(self.bits, dtype=np.uint64)).sum(axis=1)
        return batch.append_column("media_hash", pa.array(codes, type=pa.uint64()))


def media_neardup_pairs(
    ds: "ray.data.Dataset",
    *,
    max_hamming: int = 8,
    bands: int = 4,
    max_bucket: int = 10_000,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Near-duplicate MEDIA pairs: decode -> feature -> 64-bit code ->
    SimHash-style pigeonhole banding (a pair within ``max_hamming`` of 64
    bits must agree exactly on at least one of ``bands`` 16-bit bands for
    max_hamming < bands) -> exact Hamming check inside each band bucket via
    groupby(bucket).map_groups. Composes the multimodal actor-pool plumbing
    with the dedup banding design; subquadratic, no driver materialization.
    Output: (content_a, content_b, hamming), each pair once."""
    feats = media_feature_pipeline(ds, concurrency=concurrency)
    hashed = feats.map_batches(
        MediaHashStage, batch_format="pyarrow", concurrency=concurrency
    )

    band_bits = 64 // bands

    def to_bands(batch: pa.Table) -> pa.Table:
        codes = batch.column("media_hash").to_numpy()
        ids = batch.column("content_id").to_numpy()
        n = codes.size
        out_band, out_id, out_code = [], [], []
        for b in range(bands):
            band = (codes >> np.uint64(b * band_bits)) & np.uint64((1 << band_bits) - 1)
            # bucket key = (band index, band value): collisions only within a band
            out_band.append(band.astype(np.int64) * bands + b)
            out_id.append(ids)
            out_code.append(codes)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_band), type=pa.int64()),
                "content_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "code": pa.array(np.concatenate(out_code), type=pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "content_a": pa.array([], type=pa.int64()),
                "content_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        if n < 2 or n > max_bucket:
            return empty
        ids = group.column("content_id").to_numpy()
        codes = group.column("code").to_numpy()
        xor = codes[:, None] ^ codes[None, :]
        ham = np.zeros((n, n), dtype=np.int64)
        x = xor.copy()
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        ii, jj = np.nonzero((ham <= max_hamming) & (ids[:, None] < ids[None, :]))
        return pa.table(
            {
                "content_a": pa.array(ids[ii], type=pa.int64()),
                "content_b": pa.array(ids[jj], type=pa.int64()),
                "hamming": pa.array(ham[ii, jj], type=pa.int64()),
            }
        )

    pairs = (
        hashed.map_batches(to_bands, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair can collide in several bands: dedupe with one small groupby
    agg = pairs.groupby(["content_a", "content_b"]).min("hamming")
    return agg.rename_columns({"min(hamming)": "hamming"})
