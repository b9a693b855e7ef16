"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference has no row-level dedup (only value-level string interning,
``ml-data/ml-data-readers/src/string_cache.rs:39-50`` — SURVEY.md U2/U3);
these are the training-data-pipeline operators built Ray-Data-first:

- exact:    content-hash in ``map_batches`` (vectorized) → ``groupby(hash)``
            → keep first row per distinct key (one shuffle over hashes, not
            payloads-only-once; the hash column keeps shuffle rows narrow).
- MinHash:  shingle→minhash signatures per batch (vectorized reduceat) →
            explode to (band, band_hash, id) rows → ``groupby(band)`` buckets
            → candidate pairs → exact-Jaccard verification. Scale path: the
            banding shuffle moves only (id, 2×uint64) rows.
- SimHash:  64-bit sign-aggregated token hashes; candidates via 16-bit band
            buckets, verified by Hamming distance.
- n-gram:   exact word-shingle Jaccard between all pairs of a (small,
            broadcast) candidate set — the verification kernel MinHash feeds.

All per-batch math is numpy/pyarrow vectorized; token hashing uses pandas'
siphash (stable across processes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

TOKEN_SPLIT_RE = r"[^A-Za-z0-9]+"


# ---------------------------------------------------------------------------
# shared vectorized helpers
# ---------------------------------------------------------------------------

def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def tokenize_offsets(texts: pa.ChunkedArray | pa.Array,
                     lowercase: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Split a string column into flat token hashes + per-row token counts.

    Returns ``(token_hash: uint64[n_tokens], counts: int64[n_rows])``.
    Tokenization = lowercased runs split on non-alphanumerics (matches the
    DuckDB oracle's ``regexp_extract_all(lower(text), '[a-z0-9]+')``).
    """
    if lowercase:
        texts = pc.utf8_lower(texts)
    lists = pc.split_pattern_regex(texts, TOKEN_SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    counts = pc.list_value_length(lists).cast(pa.int64()).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts).astype(np.int64)
    flat_np = flat.to_numpy(zero_copy_only=False)
    # splitting leaves empty strings at boundaries; mask them out (vectorized)
    nonempty = (pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
                if flat_np.size else np.zeros(0, bool))
    hashes = pd.util.hash_array(flat_np, categorize=True) if flat_np.size else np.zeros(0, np.uint64)
    # drop empty tokens, adjusting per-row counts
    if flat_np.size and not nonempty.all():
        row_of = np.repeat(np.arange(counts.size), counts)
        keep = nonempty
        hashes = hashes[keep]
        counts = np.bincount(row_of[keep], minlength=counts.size).astype(np.int64)
    return hashes, counts


def shingle_hashes(token_hashes: np.ndarray, counts: np.ndarray,
                   k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """k-token shingle hashes per row (flat + per-row counts), vectorized.

    Rows with fewer than k tokens get one shingle covering their tokens
    (so short texts still fingerprint)."""
    n_rows = counts.size
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    win = np.maximum(counts - k + 1, np.minimum(counts, 1))  # >=1 if any token
    w_starts = np.concatenate(([0], np.cumsum(win)[:-1]))
    total_w = int(win.sum())
    if total_w == 0:
        return np.zeros(0, np.uint64), np.zeros(n_rows, np.int64)
    local = np.arange(total_w, dtype=np.int64) - np.repeat(w_starts, win)
    row = np.repeat(np.arange(n_rows), win)
    g = starts[row] + local
    with np.errstate(over="ignore"):
        acc = np.zeros(total_w, dtype=np.uint64)
        for j in range(k):
            idx = np.minimum(g + j, starts[row] + np.maximum(counts[row] - 1, 0))
            valid = (local + j) < np.maximum(counts[row], 1)
            term = np.where(valid, token_hashes[idx] if token_hashes.size else 0, 0)
            acc = acc * np.uint64(0x100000001B3) + term.astype(np.uint64)
    return _mix64(acc), win


def minhash_signatures(sh: np.ndarray, win: np.ndarray,
                       num_hashes: int = 128) -> np.ndarray:
    """(n_rows, num_hashes) MinHash signature matrix from flat shingle hashes."""
    n_rows = win.size
    sig = np.full((n_rows, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    has = win > 0
    if not has.any():
        return sig
    w_starts = np.concatenate(([0], np.cumsum(win)[:-1]))
    seg = w_starts[has]
    with np.errstate(over="ignore"):
        for j in range(num_hashes):
            h = _mix64(sh + np.uint64((j * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF))
            sig[has, j] = np.minimum.reduceat(h, seg)
    return sig


def jaccard_pairs(ids: np.ndarray, shingle_sets: list[set],
                  candidate_pairs: np.ndarray, threshold: float) -> pd.DataFrame:
    """Exact Jaccard verification of candidate (i, j) index pairs."""
    out = []
    for i, j in candidate_pairs:
        a, b = shingle_sets[i], shingle_sets[j]
        if not a and not b:
            sim = 1.0
        else:
            inter = len(a & b)
            sim = inter / (len(a) + len(b) - inter)
        if sim >= threshold:
            out.append((ids[i], ids[j], round(sim, 6)))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


# ---------------------------------------------------------------------------
# benchmark decontamination (training-data op: flag docs overlapping an
# eval/benchmark set by any k-token shingle)
# ---------------------------------------------------------------------------

def benchmark_shingle_hashes(bench: rd.Dataset, text_col: str = "text",
                             k: int = 3) -> np.ndarray:
    """Sorted distinct k-token shingle hashes of the (small) benchmark
    corpus. Deduped MAP-SIDE: each batch ships only its distinct hashes, so
    what reaches the driver is bounded by the benchmark's distinct-shingle
    count, not its row count — the benchmark/eval set is the small side by
    definition (it must be broadcastable for the scan-side membership
    test)."""
    import ray

    def distinct_hashes(batch: pa.Table) -> pa.Table:
        th, counts = tokenize_offsets(batch[text_col])
        sh, _ = shingle_hashes(th, counts, k=k)
        return pa.table({"h": pa.array(np.unique(sh), pa.uint64())})

    parts = bench.map_batches(distinct_hashes, batch_format="pyarrow",
                              zero_copy_batch=True)
    tables = [t for t in ray.get(parts.materialize().to_arrow_refs())
              if t.num_rows > 0]
    if not tables:
        return np.zeros(0, np.uint64)
    return np.unique(pa.concat_tables(tables)["h"].to_numpy())


class _ContaminationCounter:
    """Per-batch contamination count against the broadcast benchmark
    shingle-hash set (resolved lazily from the local object store — never
    re-shipped per batch). Emits only contaminated rows: (id, n_contaminated
    = count of the row's DISTINCT shingles present in the benchmark set)."""

    def __init__(self, bench_ref, id_col: str, text_col: str, k: int):
        self._ref = bench_ref
        self.bench = None
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self.bench is None:
            self.bench = (ray.get(self._ref)
                          if isinstance(self._ref, ray.ObjectRef)
                          else self._ref)
        th, counts = tokenize_offsets(batch[self.text_col])
        sh, win = shingle_hashes(th, counts, k=self.k)
        n_rows = batch.num_rows
        row = np.repeat(np.arange(n_rows, dtype=np.int64), win)
        # per-row distinct shingles: lexsort (row, hash), drop repeats
        order = np.lexsort((sh, row))
        r2, s2 = row[order], sh[order]
        keep = np.ones(r2.size, dtype=bool)
        keep[1:] = (r2[1:] != r2[:-1]) | (s2[1:] != s2[:-1])
        r3, s3 = r2[keep], s2[keep]
        # membership via searchsorted on the sorted benchmark array
        if self.bench.size:
            idx = np.minimum(np.searchsorted(self.bench, s3),
                             self.bench.size - 1)
            hit = self.bench[idx] == s3
        else:
            hit = np.zeros(s3.size, dtype=bool)
        n_hits = np.bincount(r3[hit], minlength=n_rows).astype(np.int64)
        flag = n_hits > 0
        return pa.table({
            self.id_col: batch[self.id_col].filter(pa.array(flag)),
            "n_contaminated": pa.array(n_hits[flag], pa.int64()),
        })


def decontaminate_flags(ds: rd.Dataset, bench: rd.Dataset,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3) -> rd.Dataset:
    """Benchmark decontamination: rows of ``ds`` sharing ANY k-token shingle
    with the benchmark corpus, with the count of overlapping distinct
    shingles. Shape: benchmark shingle set built distributed + broadcast
    once (``ray.put``), then one embarrassingly-parallel membership scan —
    no shuffle touches the big side."""
    import ray

    bench_hashes = benchmark_shingle_hashes(bench, text_col=text_col, k=k)
    ref = ray.put(bench_hashes)
    return ds.map_batches(_ContaminationCounter(ref, id_col, text_col, k),
                          batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# exact dedup (distributed)
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, cols: list[str], order_col: str) -> rd.Dataset:
    """Keep, per distinct value of ``cols``, the row with minimal
    ``order_col``. One shuffle, keyed on ``hash(cols) % ~3x-cores`` — the
    64-bit content hash keeps all copies of a value co-located while the
    modulus bounds the Ray group count (a group per DISTINCT value would
    mean corpus-sized group machinery on a mostly-unique corpus); the
    per-shard pandas kernel resolves the real grouping (and any hash
    collisions) exactly."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    num_shards = max(8, 3 * cpus)

    def add_hash(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in cols:
                vals = batch.column(c).to_numpy(zero_copy_only=False)
                h = h * np.uint64(0x100000001B3) + pd.util.hash_array(vals, categorize=True)
        return batch.append_column(
            "_gb", pa.array((h % np.uint64(num_shards)).astype(np.int32)))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(cols, dropna=False, sort=False)[order_col].idxmin()
        return g.loc[idx.to_numpy()].drop(columns=["_gb"])

    return (ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_gb")
            .map_groups(keep_first, batch_format="pandas"))


def duplicate_shingle_stats(ds: rd.Dataset, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 5) -> rd.Dataset:
    """Cross-document duplicated k-gram span stats — the exact-substring
    dedup signal ("Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022, arXiv:2107.06499), expressed over word
    k-grams: for every document, the number of DISTINCT k-token shingles
    it contains (``n_grams``) and how many of those also appear in at
    least one OTHER document (``n_dup_grams``). ``n_dup_grams / n_grams``
    is the duplicate-span fraction used to drop or trim boilerplate-heavy
    documents.

    Scale shape: one full-size exchange of distinct ``(doc, shingle-hash)``
    pairs partitioned by ``hash(shingle) % ~3x-cores`` (all holders of a
    shingle co-locate; group machinery stays O(cores), exactly like
    :func:`exact_dedup`), per-shard numpy counting, then a second SMALL
    exchange of per-(doc, shard) partial rows via :func:`grouped_agg`.
    The corpus text itself never shuffles; shingles travel as uint64
    hashes, not strings (collision odds ~n^2/2^64 — deterministic, and
    asserted against a string oracle in tests/the driver gate)."""
    import ray

    from .groupagg import grouped_agg

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    num_shards = max(8, 3 * cpus)

    def pairs(batch: pa.Table) -> pa.Table:
        th, counts = tokenize_offsets(batch[text_col])
        sh, win = shingle_hashes(th, counts, k=k)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(win.size), win)
        # distinct (doc, shingle): each doc lives in exactly one input row,
        # so batch-local dedup IS global dedup
        order = np.lexsort((sh, row))
        r, s = row[order], sh[order]
        keep = np.ones(r.size, dtype=bool)
        if r.size:
            keep[1:] = (r[1:] != r[:-1]) | (s[1:] != s[:-1])
        r, s = r[keep], s[keep]
        return pa.table({
            id_col: pa.array(ids[r]),
            "_sh": pa.array(s),
            "_gb": pa.array((s % np.uint64(num_shards)).astype(np.int32)),
        })

    def shard_stats(t: pa.Table) -> pa.Table:
        sh = t.column("_sh").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(sh, return_inverse=True, return_counts=True)
        dup = cnt[inv] >= 2  # pairs are doc-distinct, so count == n_docs
        uids, dinv = np.unique(ids, return_inverse=True)
        return pa.table({
            id_col: pa.array(uids),
            "n_grams": pa.array(np.bincount(dinv).astype(np.int64)),
            "n_dup_grams": pa.array(
                np.bincount(dinv, weights=dup).astype(np.int64)),
        })

    partials = (ds.map_batches(pairs, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("_gb")
                .map_groups(shard_stats, batch_format="pyarrow"))
    # materialize the shard exchange once: grouped_agg's schema probes on a
    # lazy shuffle plan re-execute it (round-3 lesson, transforms.sever doc)
    partials = partials.materialize()
    return grouped_agg(partials, keys=[id_col],
                       aggs=[("n_grams", "sum", "n_grams"),
                             ("n_dup_grams", "sum", "n_dup_grams")])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (distributed candidate generation)
# ---------------------------------------------------------------------------

class MinHashStage:
    """Actor-pool stage: text → (id, band, band_hash) LSH bucket rows.

    ``__init__`` fixes the signature/banding configuration once per actor;
    ``__call__`` emits ``num_bands`` rows per input row — only ids and two
    integer columns ever hit the subsequent groupby shuffle.
    """

    def __init__(self, id_col: str, text_col: str = "text", k: int = 3,
                 num_hashes: int = 128, num_bands: int = 32):
        assert num_hashes % num_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.k, self.num_hashes, self.num_bands = k, num_hashes, num_bands
        self.rows_per_band = num_hashes // num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, counts = tokenize_offsets(batch.column(self.text_col))
        sh, win = shingle_hashes(th, counts, self.k)
        sig = minhash_signatures(sh, win, self.num_hashes)
        n = batch.num_rows
        bands = sig.reshape(n, self.num_bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((n, self.num_bands), dtype=np.uint64)
            for r in range(self.rows_per_band):
                bh = bh * np.uint64(0x100000001B3) + bands[:, :, r]
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.num_bands)),
            "band": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), type=pa.uint64()),
        })


def _candidate_pairs_raw(ds: rd.Dataset, id_col: str,
                         text_col: str = "text",
                         k: int = 3, num_hashes: int = 128,
                         num_bands: int = 32,
                         concurrency: int | None = None) -> rd.Dataset:
    """Banding + bucket-shard pipeline producing candidate ``(id_a, id_b)``
    rows WITHOUT cross-shard dedup (a pair found in several bands appears
    once per band-shard). Shared by the Dataset and driver-collecting
    entry points, which dedup distributed / on the driver respectively."""
    import ray

    stage = MinHashStage(id_col, text_col, k, num_hashes, num_bands)
    kw = {"concurrency": concurrency} if concurrency else {}
    buckets = ds.map_batches(stage, batch_format="pyarrow", **kw)

    # Shard buckets into ~3x-cores groups (bucket-per-group costs ~0.3 ms of
    # Ray group machinery each; bands x docs buckets = tens of thousands of
    # groups, almost all singletons). hash(band, band_hash) % B keeps every
    # bucket's rows co-located; inside a shard, segment boundaries are found
    # vectorized and the per-bucket triu runs only on multi-row buckets.
    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    num_shards = max(8, 3 * cpus)

    def tag(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            g = (band * np.uint64(0x9E3779B97F4A7C15) + bh) % np.uint64(num_shards)
        return b.append_column("_gb", pa.array(g.astype(np.int32)))

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "band_hash"], kind="mergesort")
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(g)]))
        sizes = ends - starts
        out_a, out_b = [], []
        for s, e in zip(starts[sizes >= 2].tolist(), ends[sizes >= 2].tolist()):
            u = np.unique(ids[s:e])
            if u.size < 2:
                continue
            a, b = np.triu_indices(u.size, k=1)
            out_a.append(u[a])
            out_b.append(u[b])
        if not out_a:
            # typed empty: all-singleton shards must union cleanly with
            # pair-bearing shards in the downstream distinct exchange
            return pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                                 "id_b": pd.Series([], dtype=ids.dtype)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    return (buckets.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_gb")
            .map_groups(pairs_in_shard, batch_format="pandas"))


def minhash_candidate_pairs_ds(ds: rd.Dataset, id_col: str,
                               text_col: str = "text",
                               k: int = 3, num_hashes: int = 128,
                               num_bands: int = 32,
                               concurrency: int | None = None) -> rd.Dataset:
    """Distributed LSH candidate generation: distinct id pairs sharing at
    least one (band, band_hash) bucket. Returns a MATERIALIZED Dataset of
    ``(id_a, id_b)`` — the pair list never lands on the driver, so a
    dup-storm corpus (every row duplicated) cannot concentrate there.
    Shuffles: one bucket-shard exchange of (id, band, band_hash), then one
    distinct exchange of the (narrow) pair rows — the same pair surfaces
    from several bands (and therefore several shards), so dedup needs an
    exchange here."""
    cand = _candidate_pairs_raw(ds, id_col, text_col, k, num_hashes,
                                num_bands, concurrency)

    def drop_count(b: pa.Table) -> pa.Table:
        return b.select(["id_a", "id_b"])

    from .groupagg import grouped_agg

    distinct = grouped_agg(
        cand, keys=["id_a", "id_b"], aggs=[(None, "count_star", "_c")]
    ).map_batches(drop_count, batch_format="pyarrow", zero_copy_batch=True)
    return distinct.materialize()


def minhash_candidate_pairs(ds: rd.Dataset, id_col: str, text_col: str = "text",
                            k: int = 3, num_hashes: int = 128,
                            num_bands: int = 32,
                            concurrency: int | None = None) -> pd.DataFrame:
    """Driver-collecting candidate generation for callers that want the
    (near-dup-density-bounded) pair list as a DataFrame. Same banding +
    shard pipeline as :func:`minhash_candidate_pairs_ds` but the cross-band
    duplicate removal happens on the collected (bounded) list — one less
    exchange than the Dataset path, which matters because the duplicates
    are at most ``num_bands`` per true pair."""
    # reuse the shard pipeline up to (but not including) the distinct
    # exchange by running the _ds body inline without it
    cand = _candidate_pairs_raw(ds, id_col, text_col, k, num_hashes,
                                num_bands, concurrency).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64)})
    return (cand.drop_duplicates().sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# distributed exact-Jaccard verification of candidate pairs
# ---------------------------------------------------------------------------

def _shingle_blob(texts, k: int) -> pa.Array:
    """Word-k-gram shingle hash sets as ``large_binary`` (each row = the raw
    little-endian bytes of its uint64 shingle hashes). Binary, not
    ``list<uint64>``, because Acero's hash join rejects list payload columns
    — and the blob decodes zero-copy with ``np.frombuffer``."""
    th, counts = tokenize_offsets(texts)
    sh, win = shingle_hashes(th, counts, k)
    offs = (np.concatenate(([0], np.cumsum(win))).astype(np.int64)) * 8
    return pa.Array.from_buffers(
        pa.large_binary(), int(win.size),
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(sh, dtype=np.uint64).tobytes())])


def _shingle_views(arr) -> tuple[np.ndarray, np.ndarray]:
    """(element offsets, flat uint64 hashes) views of a shingle-blob array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    buf_offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    offs = buf_offs[arr.offset:arr.offset + n + 1] // 8
    data = arr.buffers()[2]
    flat = (np.frombuffer(data, dtype=np.uint64) if data is not None
            else np.array([], np.uint64))
    return offs, flat


def _expand_membership(b: pa.Table, id_col: str) -> pa.Table:
    """(id_a, id_b) pair rows → two (id, id_a, id_b, side) membership rows
    each, fully vectorized."""
    n = b.num_rows

    def one_side(id_src: str, side: int) -> pa.Table:
        return pa.table({id_col: b.column(id_src),
                         "id_a": b.column("id_a"),
                         "id_b": b.column("id_b"),
                         "side": pa.array(np.full(n, side, np.int8))})

    return pa.concat_tables([one_side("id_a", 0),
                             one_side("id_b", 1)]).combine_chunks()


class _MembershipJoiner:
    """Broadcast-membership shingle emitter: per batch, one vectorized Arrow
    hash join of the batch's (id, text) rows against the (id, id_a, id_b,
    side) membership table, then shingle-set computation for the matched
    rows only. Emits ``(id_a, id_b, side, sh: list<uint64>)`` — only
    candidate rows' shingle sets ever leave the batch; no per-pair Python
    anywhere."""

    def __init__(self, members_ref, id_col: str, text_col: str, k: int):
        self._ref = members_ref
        self.members: pa.Table | None = None
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self.members is None:
            m = (ray.get(self._ref)
                 if not isinstance(self._ref, pa.Table) else self._ref)
            self.members = m.combine_chunks()
        m = self.members
        col_t = batch.schema.field(self.id_col).type
        if m.schema.field(self.id_col).type != col_t:
            m = m.set_column(m.schema.get_field_index(self.id_col),
                             self.id_col, m.column(self.id_col).cast(col_t))
        sub = batch.select([self.id_col, self.text_col]).join(
            m, keys=self.id_col, join_type="inner")
        return pa.table({"id_a": sub.column("id_a"),
                         "id_b": sub.column("id_b"),
                         "side": sub.column("side"),
                         "sh": _shingle_blob(sub.column(self.text_col),
                                             self.k)})


def _verify_emitted_pairs(emitted: rd.Dataset, threshold: float) -> rd.Dataset:
    """Shared verification exchange: bucket the ``(id_a, id_b, side, sh)``
    rows by pair hash (many pairs per Ray group — one group per pair costs
    ~0.5 ms of group machinery each), then exact-Jaccard inside each bucket.

    Partitioning assumption: both sides of a pair land in one bucket
    (guaranteed — the bucket is a pure function of (id_a, id_b))."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    num_buckets = max(8, 3 * cpus)

    def tag(b: pa.Table) -> pa.Table:
        a = b.column("id_a").to_numpy(zero_copy_only=False)
        bb = b.column("id_b").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = (pd.util.hash_array(a, categorize=True)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + pd.util.hash_array(bb, categorize=True))
        return b.append_column(
            "_vb", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def check_bucket(g: pa.Table) -> pa.Table:
        a_t = g.schema.field("id_a").type
        empty = pa.table({"id_a": pa.array([], a_t),
                          "id_b": pa.array([], g.schema.field("id_b").type)})
        if g.num_rows == 0:
            return empty
        av = g.column("id_a").to_numpy(zero_copy_only=False)
        bv = g.column("id_b").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, bv, av))
        a_s, b_s, side_s = av[order], bv[order], side[order]
        offs, flat = _shingle_views(g.column("sh"))
        new = np.ones(a_s.size, dtype=bool)
        new[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [a_s.size]))
        out_a, out_b = [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if e - s < 2 or side_s[s] != 0 or side_s[e - 1] != 1:
                continue           # one side's row missing — not verifiable
            ra, rb = int(order[s]), int(order[e - 1])
            sa = np.unique(flat[offs[ra]:offs[ra + 1]])
            sb = np.unique(flat[offs[rb]:offs[rb + 1]])
            inter = np.intersect1d(sa, sb).size
            union = sa.size + sb.size - inter
            if union and inter / union >= threshold:
                out_a.append(a_s[s])
                out_b.append(b_s[s])
        if not out_a:
            return empty
        return pa.table({"id_a": pa.array(np.asarray(out_a)).cast(a_t),
                         "id_b": pa.array(np.asarray(out_b)).cast(a_t)})

    return (emitted.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_vb")
            .map_groups(check_bucket, batch_format="pyarrow"))


def verify_candidate_pairs(ds: rd.Dataset, candidates: pd.DataFrame,
                           id_col: str, text_col: str = "text",
                           threshold: float = 0.8, k: int = 3) -> pd.DataFrame:
    """Distributed exact-Jaccard verification, broadcast-membership path:
    the candidate pair list (bounded by true near-dup density) expands to a
    compact Arrow membership table broadcast once via ``ray.put``; each map
    batch joins against it vectorized (Arrow hash join — no per-pair Python
    anywhere), computes shingle sets for matched rows only, and ONE
    pair-bucket shuffle co-locates each pair's two sides. Returns the pairs
    with word-``k``-gram Jaccard >= threshold.

    Scale shape: shuffle volume = Σ per-candidate shingle sets (only
    suspects move), never the corpus; the driver holds only the compact
    Arrow pair/membership tables and the verified result. For corpora where
    even the pair LIST outgrows the driver (dup storms), use
    :func:`verify_pairs_distributed`."""
    if len(candidates) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object)})
    import ray

    pairs = pa.Table.from_pandas(candidates[["id_a", "id_b"]],
                                 preserve_index=False)
    ref = ray.put(_expand_membership(pairs, id_col))
    emitted = ds.map_batches(_MembershipJoiner(ref, id_col, text_col, k),
                             batch_format="pyarrow")
    out = _verify_emitted_pairs(emitted, threshold).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object)})
    return (out.sort_values(["id_a", "id_b"], kind="mergesort")
            .reset_index(drop=True))


def verify_pairs_distributed(ds: rd.Dataset, cand: rd.Dataset, id_col: str,
                             text_col: str = "text", threshold: float = 0.8,
                             k: int = 3) -> rd.Dataset:
    """Fully distributed exact-Jaccard verification — the dup-storm path:
    the candidate pair Dataset NEVER lands on the driver. The corpus is
    pre-filtered with a Bloom filter built from the membership ids (driver
    holds one bitmap, not the ids), shingle sets are computed for the
    surviving suspects only, a bucketed :func:`hash_join` on id attaches
    each suspect's shingles to its memberships, and the shared pair-bucket
    exchange verifies each pair. Returns a Dataset of verified (id_a, id_b).

    Cost vs the broadcast path: one extra exchange of the suspect shingle
    rows (the join) — the price of unbounded pair counts."""
    from .bloom import bloom_prefilter, build_bloom
    from .joins import hash_join

    cand = cand.materialize()   # consumed twice: bloom build + join
    members = cand.map_batches(
        lambda b: _expand_membership(b, id_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    bloom = build_bloom(members.select_columns([id_col]), on=[id_col])
    suspects = bloom_prefilter(ds.select_columns([id_col, text_col]),
                               bloom, on=[id_col])

    def shingles(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.column(id_col),
                         "sh": _shingle_blob(b.column(text_col), k)})

    emitted = hash_join(
        suspects.map_batches(shingles, batch_format="pyarrow",
                             zero_copy_batch=True),
        members, on=[id_col]).select_columns(["id_a", "id_b", "side", "sh"])
    return _verify_emitted_pairs(emitted, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_bits(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit SimHash per row: sign of per-bit sums of token hashes."""
    th, counts = tokenize_offsets(texts)
    n_rows = counts.size
    sig = np.zeros(n_rows, dtype=np.uint64)
    has = counts > 0
    if not has.any():
        return sig
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    seg = starts[has]
    acc = np.zeros((n_rows, 64), dtype=np.int64)
    for b in range(64):
        bit = ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64) * 2 - 1
        acc[has, b] = np.add.reduceat(bit, seg)
    bits = (acc > 0).astype(np.uint64)
    for b in range(64):
        sig |= bits[:, b] << np.uint64(b)
    return sig


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column("simhash",
                               pa.array(simhash_bits(batch.column(text_col)),
                                        type=pa.uint64()))


class SimHashBandStage:
    """Text → ``(id, band, band_hash, sig)`` LSH rows from bit-slices of the
    64-bit SimHash. With ``num_bands`` bands, any pair at Hamming distance
    < num_bands shares at least one intact band (pigeonhole), so banding +
    per-bucket verification is EXACT for ``max_hd <= num_bands - 1``.
    Bits-per-band trades that recall bound against bucket size — at corpus
    scale use a smaller ``max_hd`` with fewer, wider bands."""

    def __init__(self, id_col: str, text_col: str = "text", num_bands: int = 9):
        self.id_col, self.text_col = id_col, text_col
        self.bounds = np.linspace(0, 64, num_bands + 1).astype(np.uint64)
        self.num_bands = num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = simhash_bits(batch.column(self.text_col))
        n = sig.size
        bh = np.empty((n, self.num_bands), dtype=np.uint64)
        for i in range(self.num_bands):
            lo, hi = self.bounds[i], self.bounds[i + 1]
            width = np.uint64(hi - lo)
            mask = (np.uint64(1) << width) - np.uint64(1)
            bh[:, i] = (sig >> lo) & mask
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.num_bands)),
            "band": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1), type=pa.uint64()),
            "sig": pa.array(np.repeat(sig, self.num_bands), type=pa.uint64()),
        })


def simhash_candidate_pairs(ds: rd.Dataset, id_col: str,
                            text_col: str = "text", num_bands: int = 9,
                            max_hd: int = 8) -> pd.DataFrame:
    """Distributed SimHash near-dup: banding shuffle (only (id, band,
    band_hash, sig) rows move), Hamming verification inside each bucket.
    Exact for ``max_hd <= num_bands - 1`` — equivalent to the all-pairs scan
    without the O(n²) compare."""
    assert max_hd <= num_bands - 1, "recall bound requires max_hd < num_bands"
    import ray

    stage = SimHashBandStage(id_col, text_col, num_bands)
    buckets = ds.map_batches(stage, batch_format="pyarrow")
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)

    # bucket-shard like the MinHash path: bands x docs buckets are tens of
    # thousands of (mostly singleton) Ray groups otherwise — shard by
    # hash(band, band_hash) % ~3x-cores and segment vectorized per shard
    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    num_shards = max(8, 3 * cpus)

    def tag(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = b.column("band_hash").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            g = (band * np.uint64(0x9E3779B97F4A7C15) + bh) % np.uint64(num_shards)
        return b.append_column("_gb", pa.array(g.astype(np.int32)))

    def pairs_in_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["band", "band_hash"], kind="mergesort")
             .drop_duplicates(subset=["band", "band_hash", id_col]))
        band = g["band"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        sig = g["sig"].to_numpy().astype(np.uint64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(g)]))
        sizes = ends - starts
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts[sizes >= 2].tolist(), ends[sizes >= 2].tolist()):
            a, b = np.triu_indices(e - s, k=1)
            x = sig[s:e][a] ^ sig[s:e][b]
            hd = lut[x.view(np.uint8).reshape(-1, 8)].sum(1)
            keep = hd <= max_hd
            if keep.any():
                out_a.append(ids[s:e][a[keep]])
                out_b.append(ids[s:e][b[keep]])
                out_h.append(hd[keep].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                                 "id_b": pd.Series([], dtype=ids.dtype),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    cand = (buckets.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_gb")
            .map_groups(pairs_in_shard, batch_format="pandas")).to_pandas()
    if len(cand) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "hamming": pd.Series([], dtype=np.int64)})
    swap = cand["id_a"] > cand["id_b"]
    cand.loc[swap, ["id_a", "id_b"]] = cand.loc[swap, ["id_b", "id_a"]].to_numpy()
    cand = cand.drop_duplicates(subset=["id_a", "id_b"])
    cand["hamming"] = cand["hamming"].astype(np.int64)
    return (cand.sort_values(["id_a", "id_b"], kind="mergesort")
            .reset_index(drop=True))


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # vectorized popcount via uint8 view + lookup
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(1)
    return lut[x.view(np.uint8).reshape(-1, 8)].sum(1)
