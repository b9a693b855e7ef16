"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Mirrors the reference's image source surface (format sniffing + load modes,
``ml-data/ml-data-readers/src/image.rs:51-77,183-413`` — whose decode is
itself a stub returning placeholder dims) the Ray-native way: binary payloads
ride in an Arrow ``binary`` column; decode/resize/feature stages are
actor-pool ``map_batches`` classes. The actual pixel/sample decode is STUBBED
(no image/audio libs in this container): :class:`ImageDecoder` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake feature vector so the Ray-side plumbing (schema, batch
sizing, actor signature, output layout) is real and tested.

Scale notes: large binary payloads need small ``batch_size`` and bounded
``target_max_block_size``; keep these stages in ``batch_format="pyarrow"``
(binary columns do not round-trip pandas cleanly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: magic-byte signatures (reference ``image.rs:51-77``)
IMAGE_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"RIFF", "webp_or_wav"),
]


def sniff_format(batch: pa.Table, data_col: str = "data") -> pa.Table:
    """Append ``format`` from magic bytes — fully vectorized: one
    ``binary_slice`` + equality kernel per signature, first match wins
    (never materializes the blobs into Python)."""
    import pyarrow.compute as pc

    col = batch.column(data_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    fmt = pa.array(["unknown"] * n, pa.string())
    for magic, name in IMAGE_MAGIC:
        prefix = pc.binary_slice(col, 0, len(magic))
        hit = pc.fill_null(pc.equal(prefix, pa.scalar(magic, pa.binary())),
                           False)
        unset = pc.equal(fmt, "unknown")
        fmt = pc.if_else(pc.and_(hit, unset), pa.scalar(name, pa.string()), fmt)
    return batch.append_column("format", fmt)


class ImageDecoder:
    """Actor-pool decode/feature stage over a binary image column.

    ``__init__`` is the once-per-actor setup point (model / codec load);
    ``__call__`` consumes a batch and appends ``(width, height, channels,
    features: list<float>)``. Real decode requires an image library that is
    not in this container — construct with ``fake=True`` for the
    deterministic stand-in (hash-derived dims + feature vector), or get
    ``NotImplementedError`` at setup, not mid-stream.
    """

    def __init__(self, data_col: str = "data", feature_dim: int = 8,
                 fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "image decode requires an image library (PIL/cv2) not present "
                "in this environment; pass fake=True for the deterministic stub")
        self.data_col = data_col
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.data_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # deterministic fake: dims/features from payload length + first bytes
        lens = pa.compute.binary_length(col).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        h = (lens * 2654435761 % (1 << 31)).astype(np.int64)
        width = 16 + (h % 241)
        height = 16 + ((h >> 8) % 241)
        feats = ((h[:, None] * (np.arange(self.feature_dim) + 1)) % 1000) / 1000.0
        batch = batch.append_column("width", pa.array(width.astype(np.int32)))
        batch = batch.append_column("height", pa.array(height.astype(np.int32)))
        batch = batch.append_column("channels",
                                    pa.array(np.full(len(lens), 3, np.int32)))
        batch = batch.append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float64())))
        return batch


def make_binary_fixture(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic binary-column fixture: n blobs with real image magic
    bytes + pseudo-random payloads (for plumbing tests)."""
    rng = np.random.default_rng(seed)
    magics = [b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM"]
    blobs, ids = [], []
    for i in range(n):
        m = magics[i % len(magics)]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                               dtype=np.uint8).tobytes()
        blobs.append(m + payload)
        ids.append(i)
    return pa.table({"item_id": pa.array(ids, pa.int64()),
                     "data": pa.array(blobs, pa.binary())})
