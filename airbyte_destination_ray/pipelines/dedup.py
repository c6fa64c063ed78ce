"""Distributed deduplication operators over Datasets.

Five dedup families, all following the same two-phase Ray Data shape:

1. **candidate keys** — a vectorized ``map_batches`` stage computes compact
   per-doc keys (content hash / LSH band keys / simhash bands / projection
   buckets) so the shuffle moves fixed-width keys, never document payloads;
2. **bucket resolution** — ``groupby(key).map_groups`` marks every doc that
   shares a bucket with a smaller ``id`` as a duplicate; the surviving set is
   applied with a broadcast filter (``ray.put`` once, read per task — the
   small-side-broadcast pattern, no second payload shuffle) while the dup-id
   set is small, switching automatically to a distributed anti-join above
   ``DEDUP_BROADCAST_MAX_IDS`` (``filter_mode="auto"``).

The bucket rule ("min id in any shared bucket wins") is the standard
single-pass LSH dedup approximation (SlimPajama/RefinedWeb recipe): it
removes every document that collides with an earlier one, without computing
full transitive clusters.  ``verify``-enabled variants check candidate pairs
against the similarity estimate before marking, trading recall for precision.

Exact dedup (``dedup_exact`` in :mod:`.ops`) needs no candidate phase — its
key IS the content hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.minhash import band_keys, minhash_signatures
from ..functions.simhash import hamming_distance64, simhash64
from ..functions.text import content_fingerprint


DEDUP_NUM_PARTITIONS = 64

# auto filter mode: broadcast the dup-id set while it stays under this many
# ids (~40 MB of int64 on the driver + one plasma copy); above it, switch to
# the distributed anti-join so a high-duplicate 100 TB corpus never funnels
# O(duplicates) through the driver.
DEDUP_BROADCAST_MAX_IDS = 5_000_000


def _broadcast_filter_out(ds, id_col: str, dup_ids_ref):
    """Keep rows whose id is NOT in the broadcast dup-id set."""

    def fn(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ids_ref)  # zero-copy plasma read, once per task
        if len(dup) == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, dup)))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _collect_dup_ids(candidates) -> np.ndarray:
    """Driver-side collect of duplicate ids (small: ids only, no payloads)."""
    batches = list(candidates.iter_batches(batch_format="pyarrow"))
    if not batches:
        return np.array([], dtype=np.int64)
    t = pa.concat_tables(batches)
    return np.unique(t.column("dup_id").to_numpy(zero_copy_only=False))


def _distributed_filter_out(ds, id_col: str, candidates, num_partitions: int):
    """Shuffle anti-join: co-partition docs and dup-ids by ``hash(id)`` and
    drop matches per partition — the scale path when the duplicate-id set
    is too large to collect and broadcast (billions of dups at 100 TB).
    Costs one payload shuffle where the broadcast filter costs none, so
    the auto default broadcasts below DEDUP_BROADCAST_MAX_IDS."""
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))

    def env_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        t = batch.append_column(
            "_isdup", pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        )
        parts = (ids % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def env_dups(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for c in schema.names:
            if c == id_col:
                cols[c] = batch.column("dup_id").cast(types[c])
            else:
                cols[c] = pa.nulls(n, types[c])
        cols["_isdup"] = pa.array(np.ones(n, dtype=np.int8))
        t = pa.table(cols)
        ids = batch.column("dup_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = (ids % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    env = ds.map_batches(
        env_docs, batch_format="pyarrow", batch_size=None
    ).union(
        candidates.map_batches(env_dups, batch_format="pyarrow", batch_size=None)
    )

    def anti(group: pa.Table) -> pa.Table:
        isdup = group.column("_isdup").to_numpy(zero_copy_only=False) == 1
        docs = group.filter(pa.array(~isdup)).drop_columns(["_isdup", "_part"])
        dup_ids = np.unique(
            group.filter(pa.array(isdup))
            .column(id_col)
            .to_numpy(zero_copy_only=False)
        )
        if len(dup_ids) == 0:
            return docs
        ids = docs.column(id_col).to_numpy(zero_copy_only=False)
        return docs.filter(pa.array(~np.isin(ids, dup_ids)))

    return env.groupby("_part").map_groups(anti, batch_format="pyarrow")


def _apply_dup_filter(ds, id_col: str, candidates, filter_mode: str):
    """Apply the duplicate-id set to the original dataset.

    ``filter_mode="auto"`` (default) materializes the candidate ids (dup-id
    blocks stay in the object store — aggregate-sized, never payloads),
    reads the count off the materialized metadata, and picks: broadcast
    while the set is ≤ :data:`DEDUP_BROADCAST_MAX_IDS`, the distributed
    anti-join above it.  ``filter_mode="broadcast"`` forces the driver
    collect + ``ray.put`` path — zero extra shuffles, right when the dup set
    fits in memory.  ``filter_mode="shuffle"`` forces the distributed
    anti-join (:func:`_distributed_filter_out`) — the scale path when the
    dup set is billions of ids (100 TB corpora); costs one payload shuffle
    but never touches the driver.  All modes produce identical surviving
    sets (pinned per family in test_dedup.py)."""
    if filter_mode == "shuffle":
        return _distributed_filter_out(
            ds, id_col, candidates, DEDUP_NUM_PARTITIONS
        )
    if filter_mode == "auto":
        # One execution of the candidate pipeline either way (matters for
        # the incremental family, whose candidates commit state).
        mat = candidates.materialize()
        if mat.count() > DEDUP_BROADCAST_MAX_IDS:
            return _distributed_filter_out(
                ds, id_col, mat, DEDUP_NUM_PARTITIONS
            )
        filter_mode = "broadcast"
        candidates = mat
    if filter_mode != "broadcast":
        raise ValueError(
            f"filter_mode must be auto|broadcast|shuffle, got {filter_mode!r}"
        )
    dup_ids = _collect_dup_ids(candidates)
    return _broadcast_filter_out(ds, id_col, ray.put(dup_ids))


def _route_buckets(t: pa.Table, num_partitions: int) -> pa.Table:
    """Add ``_part = mix(band, key) % P``: ONE partition-level group per
    shuffle target instead of one ``map_groups`` call per bucket — bucket
    count is O(docs × bands) at web scale, and a Python call per bucket is
    the hidden O(n) driver of groupby-per-bucket designs (measured 4×+ on
    the embedding family even at sf0.1).  ``key`` is already a uniform
    64-bit hash in every family, so routing is pure numpy arithmetic (the
    generic object-array hasher measured 2× the whole stage here)."""
    key = t.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
    band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    mixed = key ^ (band * np.uint64(0x9E3779B97F4A7C15))
    parts = (mixed % np.uint64(num_partitions)).astype(np.int64)
    return t.append_column("_part", pa.array(parts, type=pa.int64()))


def _resolve_buckets_vectorized(
    group: pa.Table, verify=None, rank_col: str | None = None
) -> pa.Table:
    """Partition-level bucket resolution: every row that is not its bucket's
    winning row is a duplicate candidate; ``verify(t, cand_idx, rep_idx)``
    (row indices into the UNSORTED group, vectorized over all candidates at
    once) can veto.  The winner is the min-id row by default; with
    ``rank_col`` the HIGHEST-rank row wins (ties → min id) — the retention
    policy knob (keep the longest / best-quality duplicate instead of the
    first).

    Only the three 8-byte key columns are sorted — the wide payload
    (signatures / embeddings) is never ``take``n; verify gathers just the
    candidate and representative rows it needs (the full-table take
    measured >2× the whole stage on the signature family).
    """
    if group.num_rows < 2:
        return pa.table({"dup_id": pa.array([], type=pa.int64())})
    sort_cols = ["band", "key"]
    sort_keys = [("band", "ascending"), ("key", "ascending")]
    if rank_col is not None:
        sort_cols.append(rank_col)
        sort_keys.append((rank_col, "descending"))
    sort_cols.append("id")
    sort_keys.append(("id", "ascending"))
    keys_only = group.select(sort_cols)
    order = pc.sort_indices(keys_only, sort_keys=sort_keys).to_numpy()
    band = group.column("band").to_numpy(zero_copy_only=False)[order]
    key = group.column("key").to_numpy(zero_copy_only=False)[order]
    n = len(order)
    start = np.ones(n, dtype=bool)
    start[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    rep = np.maximum.accumulate(np.where(start, np.arange(n), 0))
    cand_pos = np.nonzero(~start)[0]
    if len(cand_pos) == 0:
        return pa.table({"dup_id": pa.array([], type=pa.int64())})
    cand_idx = order[cand_pos]
    rep_idx = order[rep[cand_pos]]
    if verify is not None:
        keep = verify(group, cand_idx, rep_idx)
        cand_idx = cand_idx[keep]
    ids = group.column("id").to_numpy(zero_copy_only=False)
    return pa.table({"dup_id": pa.array(ids[cand_idx], type=pa.int64())})


def dedup_minhash_lsh(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    verify_threshold: float | None = None,
    filter_mode: str = "auto",
):
    """MinHash + LSH near-duplicate removal.

    shingle → minhash → band → bucket-groupby, as specified in the build
    brief.  With ``verify_threshold`` the bucket step estimates Jaccard from
    the full signatures and only marks pairs whose estimate ≥ threshold.
    Signatures ride the shuffle as ONE fixed-size-binary column (zero-copy
    numpy view on both ends) — ``num_perm`` separate uint64 columns cost
    ~7× in Arrow column overhead at 128 perms (measured).
    """
    sig_type = pa.binary(num_perm * 8)

    def keys(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            batch.column(text_col), num_perm=num_perm, shingle_k=shingle_k
        )
        # empty/null docs carry the all-sentinel signature; emitting their
        # (identical) band keys would mass-dedup unrelated empty docs
        present = sig[:, 0] != np.uint64(0xFFFFFFFFFFFFFFFF)
        sig = sig[present]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[present]
        band_idx, key = band_keys(sig, bands=bands)
        out = {
            "id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            "band": pa.array(band_idx, type=pa.int64()),
            "key": pa.array(key, type=pa.uint64()),
        }
        if verify_threshold:
            packed = pa.FixedSizeBinaryArray.from_buffers(
                sig_type,
                len(sig),
                [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())],
            )
            out["sig"] = packed.take(
                pa.array(np.repeat(np.arange(len(sig)), bands), type=pa.int64())
            )
        return _route_buckets(pa.table(out), DEDUP_NUM_PARTITIONS)

    def _unpack_sigs(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        arr = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        data = np.frombuffer(arr.buffers()[1], dtype=np.uint64).reshape(
            -1, num_perm
        )
        return data[arr.offset : arr.offset + len(arr)]

    def verify_sig(t: pa.Table, cand_idx: np.ndarray, rep_idx: np.ndarray):
        sig = _unpack_sigs(t.column("sig"))
        est = (sig[cand_idx] == sig[rep_idx]).mean(axis=1)
        return est >= verify_threshold

    def resolve(group: pa.Table) -> pa.Table:
        return _resolve_buckets_vectorized(
            group.drop_columns(["_part"]),
            verify_sig if verify_threshold else None,
        )

    candidates = (
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def dedup_simhash(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_threshold: int = 3,
    bands: int = 4,
    filter_mode: str = "auto",
):
    """SimHash near-dup removal (Manku et al. WWW'07 banding scheme).

    The 64-bit fingerprint is split into ``bands`` chunks; two docs within
    Hamming distance ``bands - 1`` must agree on at least one chunk, so
    chunk-equality buckets are a complete candidate set for that radius.
    Candidates are verified by exact Hamming distance to the bucket
    representative.
    """
    chunk_bits = 64 // bands

    def keys(batch: pa.Table) -> pa.Table:
        # null-text rows emit no candidates — they are not duplicates of
        # each other (filling nulls with a shared key would mass-delete them)
        batch = batch.filter(batch.column(text_col).combine_chunks().is_valid())
        fp = (
            pc.fill_null(simhash64(batch.column(text_col)), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # fp == 0 means "no tokens" (empty/whitespace docs): emitting their
        # identical keys would mass-dedup unrelated empty docs
        token_full = fp != 0
        fp, ids = fp[token_full], ids[token_full]
        mask = np.uint64((1 << chunk_bits) - 1)
        parts = []
        for b in range(bands):
            chunk = (fp >> np.uint64(b * chunk_bits)) & mask
            parts.append(
                pa.table(
                    {
                        "id": pa.array(ids, type=pa.int64()),
                        "band": pa.array(
                            np.full(len(ids), b, dtype=np.int64)
                        ),
                        "key": pa.array(chunk, type=pa.uint64()),
                        "fp": pa.array(fp, type=pa.uint64()),
                    }
                )
            )
        return _route_buckets(pa.concat_tables(parts), DEDUP_NUM_PARTITIONS)

    def verify_fp(t: pa.Table, cand_idx: np.ndarray, rep_idx: np.ndarray):
        fp = t.column("fp").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (
            hamming_distance64(fp[cand_idx], fp[rep_idx]) <= hamming_threshold
        )

    def resolve(group: pa.Table) -> pa.Table:
        return _resolve_buckets_vectorized(
            group.drop_columns(["_part"]), verify_fp
        )

    candidates = (
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def dedup_ngram_jaccard(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    filter_mode: str = "auto",
):
    """N-gram Jaccard dedup: MinHash-LSH candidates + signature-estimated
    Jaccard verification at ``threshold`` (precision-oriented: wider
    signatures, more bands than the plain LSH recipe)."""
    return dedup_minhash_lsh(
        ds,
        text_col=text_col,
        id_col=id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        verify_threshold=threshold,
        filter_mode=filter_mode,
    )


def _jaccard_pair_candidates(
    ds,
    *,
    text_col: str,
    id_col: str,
    shingle_k: int,
    threshold: float,
    num_partitions: int,
    max_shingle_freq: int | None,
    emit: str = "dups",
):
    """Exact-Jaccard duplicate candidates via a distributed inverted index.

    Three stages, two fixed-width exchanges, payloads never shuffled:

    1. per batch: distinct ``(shingle_hash, id, set_size)`` rows
       (full-content 64-bit word hashes combined positionally — equality
       matches word-``k``-gram string equality up to hash collisions);
    2. per shingle partition: expand co-occurrence pairs ``(ia < ib)`` —
       work is Σ c² over shingle frequencies c, the exact-algorithm cost;
       ``max_shingle_freq`` drops hotter-than-cap shingles (stopword-shingle
       pruning — an *approximation*, off by default so the oracle is exact);
    3. per pair partition: intersection = pair multiplicity, then
       ``J = c / (|A| + |B| − c) ≥ threshold`` marks ``ib`` duplicate.
    """
    from ..functions.hashing import stable_hash_array

    # distinct odd positional multipliers (golden-ratio powers, wrapping u64)
    mults = np.cumprod(
        np.full(shingle_k, 0x9E3779B97F4A7C15, dtype=np.uint64)
    )

    def shingles(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(pc.fill_null(texts, ""))
        words = pc.split_pattern_regex(trimmed, r"\s+")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        wh = stable_hash_array(flat).astype(np.uint64)
        n_flat = len(wh)
        n_valid = n_flat - shingle_k + 1
        if n_valid <= 0:
            return pa.table(
                {
                    "sh": pa.array([], type=pa.uint64()),
                    "id": pa.array([], type=pa.int64()),
                    "sz": pa.array([], type=pa.int64()),
                    "_part": pa.array([], type=pa.int64()),
                }
            )
        # positional rolling combine over k consecutive word hashes
        sh = np.zeros(n_valid, dtype=np.uint64)
        for j in range(shingle_k):
            sh += wh[j : j + n_valid] * mults[j]
        # a window starting at flat position i belongs to row r iff the
        # whole window is inside r: i >= row_start and i+k <= row_end
        row_of = np.searchsorted(offsets[1:], np.arange(n_valid), side="right")
        valid = np.arange(n_valid) + shingle_k <= offsets[row_of + 1]
        sh = sh[valid]
        rows = row_of[valid]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[rows]
        t = pa.table(
            {"sh": pa.array(sh), "id": pa.array(ids, type=pa.int64())}
        )
        g = t.group_by(["id", "sh"], use_threads=False).aggregate([])
        sizes = (
            g.group_by("id", use_threads=False).aggregate([([], "count_all")])
        )
        sz_ids = sizes.column("id").to_numpy(zero_copy_only=False)
        sz_n = sizes.column("count_all").to_numpy(zero_copy_only=False)
        order = np.argsort(sz_ids)
        gi = g.column("id").to_numpy(zero_copy_only=False)
        sz = sz_n[order][np.searchsorted(sz_ids[order], gi)]
        shv = g.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (shv % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "sh": g.column("sh"),
                "id": g.column("id"),
                "sz": pa.array(sz, type=pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def expand_pairs(group: pa.Table) -> pa.Table:
        sh = group.column("sh").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group.column("id").to_numpy(zero_copy_only=False)
        sz = group.column("sz").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids, sz = sh[order], ids[order], sz[order]
        n = len(sh)
        if n < 2:
            return _EMPTY_PAIRS
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = sh[1:] != sh[:-1]
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        pos = np.arange(n) - seg_start[seg_id]
        if max_shingle_freq is not None:
            seg_len = np.diff(np.append(seg_start, n))
            keep = seg_len[seg_id] <= max_shingle_freq
            sh, ids, sz, pos = sh[keep], ids[keep], sz[keep], pos[keep]
            seg_rebase = np.ones(len(sh), dtype=bool)
            seg_rebase[1:] = sh[1:] != sh[:-1]
            seg_id = np.cumsum(seg_rebase) - 1
            seg_start = np.flatnonzero(seg_rebase)
            pos = np.arange(len(sh)) - seg_start[seg_id]
            n = len(sh)
            if n < 2:
                return _EMPTY_PAIRS
        total = int(pos.sum())
        if total == 0:
            return _EMPTY_PAIRS
        b_idx = np.repeat(np.arange(n), pos)
        pairs_before = np.concatenate(([0], np.cumsum(pos)[:-1]))
        a_idx = np.arange(total) + np.repeat(
            seg_start[seg_id] - pairs_before, pos
        )
        ia, ib = ids[a_idx], ids[b_idx]
        na, nb = sz[a_idx], sz[b_idx]
        pp = (
            (ia.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ ib.astype(np.uint64)
        ) % np.uint64(num_partitions)
        return pa.table(
            {
                "ia": pa.array(ia, type=pa.int64()),
                "ib": pa.array(ib, type=pa.int64()),
                "na": pa.array(na, type=pa.int64()),
                "nb": pa.array(nb, type=pa.int64()),
                "_p2": pa.array(pp.astype(np.int64), type=pa.int64()),
            }
        )

    def judge(group: pa.Table) -> pa.Table:
        g = group.group_by(["ia", "ib"], use_threads=False).aggregate(
            [([], "count_all"), ("na", "min"), ("nb", "min")]
        )
        c = g.column("count_all").to_numpy(zero_copy_only=False).astype(np.float64)
        na = g.column("na_min").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = g.column("nb_min").to_numpy(zero_copy_only=False).astype(np.float64)
        j = c / (na + nb - c)
        ok = j >= threshold
        if emit == "pairs":
            return pa.table(
                {
                    "ia": pa.array(
                        g.column("ia").to_numpy(zero_copy_only=False)[ok],
                        type=pa.int64(),
                    ),
                    "ib": pa.array(
                        g.column("ib").to_numpy(zero_copy_only=False)[ok],
                        type=pa.int64(),
                    ),
                }
            )
        dup = np.unique(g.column("ib").to_numpy(zero_copy_only=False)[ok])
        return pa.table({"dup_id": pa.array(dup, type=pa.int64())})

    return (
        ds.map_batches(shingles, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(expand_pairs, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(judge, batch_format="pyarrow")
    )


_EMPTY_PAIRS = pa.table(
    {
        "ia": pa.array([], type=pa.int64()),
        "ib": pa.array([], type=pa.int64()),
        "na": pa.array([], type=pa.int64()),
        "nb": pa.array([], type=pa.int64()),
        "_p2": pa.array([], type=pa.int64()),
    }
)


def dedup_jaccard_exact(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    num_partitions: int = DEDUP_NUM_PARTITIONS,
    max_shingle_freq: int | None = None,
    filter_mode: str = "auto",
):
    """EXACT n-gram Jaccard dedup (the hash-checked anchor of the near-dup
    family): drop every doc that has an earlier doc (smaller id) with true
    word-``k``-gram Jaccard ≥ ``threshold``.

    Unlike the LSH families this computes real intersections over a
    distributed inverted index (cost Σ c² over shingle frequencies), so its
    output is SQL-reproducible — the DuckDB oracle recomputes pairwise
    Jaccard from scratch.  At 100 TB use ``max_shingle_freq`` to prune
    stopword shingles (documented approximation) or prefer the LSH
    families; docs with fewer than ``shingle_k`` words have no shingles and
    are always kept (matches SQL, where they produce no pairs).
    """
    candidates = _jaccard_pair_candidates(
        ds,
        text_col=text_col,
        id_col=id_col,
        shingle_k=shingle_k,
        threshold=threshold,
        num_partitions=num_partitions,
        max_shingle_freq=max_shingle_freq,
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def dedup_exact_hash(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
    filter_mode: str = "auto",
    rank_col: str | None = None,
):
    """Exact dedup by 64-bit content fingerprint: hash-partition + keep the
    min-id doc per fingerprint.  Collision-unsafe variant of
    :func:`..pipelines.ops.dedup_exact` that never shuffles the text column
    — at web scale the exchange moves 16 bytes/doc instead of the payload.

    ``rank_col`` = the RETENTION POLICY: keep the bucket's highest-rank row
    (ties → min id) instead of the min-id row — e.g. the longest or
    best-quality duplicate, the webtext-pipeline default when duplicates
    differ in completeness.  The rank rides the key exchange as one extra
    int64 per doc.

    ``filter_mode="shuffle"`` applies the dup set with a distributed
    anti-join instead of the collect-and-broadcast filter — for dup sets
    too large to hold on the driver / broadcast per node (same output,
    pinned by test)."""

    def keys(batch: pa.Table) -> pa.Table:
        # null-text rows emit no candidates (a shared fill value would make
        # every null-text row a "duplicate" of the others)
        batch = batch.filter(batch.column(text_col).combine_chunks().is_valid())
        fp = content_fingerprint(batch.column(text_col), normalize=normalize)
        ids = batch.column(id_col)
        cols = {
            "id": ids.cast(pa.int64()),
            "band": pa.array(np.zeros(batch.num_rows, dtype=np.int64)),
            "key": pc.fill_null(fp, 0),
        }
        if rank_col is not None:
            cols["rank"] = batch.column(rank_col).cast(pa.int64())
        return _route_buckets(pa.table(cols), DEDUP_NUM_PARTITIONS)

    def resolve(group: pa.Table) -> pa.Table:
        return _resolve_buckets_vectorized(
            group.drop_columns(["_part"]),
            rank_col="rank" if rank_col is not None else None,
        )

    candidates = (
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def dedup_embedding_cosine(
    ds,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    filter_mode: str = "auto",
    transit: str = "int8",
):
    """Embedding near-dup removal: random-hyperplane LSH buckets + exact
    cosine verification against the bucket representative.

    ``num_planes`` sign bits form the bucket key (≤ 63); docs whose cosine
    to the bucket's min-id vector ≥ threshold are removed.  (One-bucket
    approximation: a pair split across all buckets is missed — the standard
    recall/cost trade; raise recall by lowering ``num_planes``.)

    ``transit`` controls what rides the candidate shuffle for the verify
    step: ``"int8"`` (default) normalizes then quantizes each component to
    int8 — 4–8× fewer exchange bytes than the raw float list, cosine error
    ≤ ~0.006 at 64 dims (re-normalized after dequantization, so the
    decision boundary shifts by less than the quantization noise);
    ``"float"`` ships the raw embedding column (exact verify).  At 100 TB
    the embedding column is the payload, so int8 transit keeps this family
    on par with the signature families whose exchanges are key-only.
    """
    if not 1 <= num_planes <= 63:
        raise ValueError("num_planes must be in [1, 63] (int64 bucket ids)")
    if transit not in ("int8", "float"):
        raise ValueError(f"transit must be int8|float, got {transit!r}")

    def keys(batch: pa.Table) -> pa.Table:
        # empty-safe throughout: _embedding_matrix returns (0, 1) for empty
        # batches and every downstream op handles zero rows
        from .similarity import _embedding_matrix, _normalize, _pack_bucket_bits

        emb = _embedding_matrix(batch, embedding_col)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((emb.shape[1], num_planes))
        key = _pack_bucket_bits(emb @ planes)
        ids = batch.column(id_col)
        cols = {
            "id": ids.cast(pa.int64()),
            "band": pa.array(np.zeros(len(ids), dtype=np.int64)),
            "key": pa.array(key, type=pa.int64()),
        }
        if transit == "int8":
            # normalize → int8 quantize → variable-width binary (one value
            # per row, all the same length; variable width keeps the schema
            # stable across blocks with different dims / empty blocks)
            q = np.clip(
                np.rint(_normalize(emb) * 127.0), -127, 127
            ).astype(np.int8)
            n, dim = q.shape
            offsets = (np.arange(n + 1, dtype=np.int32) * dim)
            cols["emb"] = pa.Array.from_buffers(
                pa.binary(),
                n,
                [
                    None,
                    pa.py_buffer(offsets.tobytes()),
                    pa.py_buffer(np.ascontiguousarray(q).tobytes()),
                ],
            )
        else:
            # carry the original list column (stable schema per block)
            cols["emb"] = batch.column(embedding_col)
        return _route_buckets(pa.table(cols), DEDUP_NUM_PARTITIONS)

    def verify_cos(t: pa.Table, cand_idx: np.ndarray, rep_idx: np.ndarray):
        from .similarity import _embedding_matrix, _normalize

        if transit == "int8":
            arr = t.column("emb")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            buf = np.frombuffer(arr.buffers()[2], dtype=np.int8)
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            dim = int(offs[1] - offs[0]) if len(arr) else 1
            emb = _normalize(
                buf[offs[0] : offs[-1]]
                .reshape(len(arr), dim)
                .astype(np.float64)
            )
        else:
            emb = _normalize(_embedding_matrix(t, "emb"))
        cos = np.einsum("ij,ij->i", emb[cand_idx], emb[rep_idx])
        return cos >= threshold

    def resolve(group: pa.Table) -> pa.Table:
        return _resolve_buckets_vectorized(
            group.drop_columns(["_part"]), verify_cos
        )

    candidates = (
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def dedup_exact_incremental(
    ds,
    state_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
    filter_mode: str = "auto",
    num_partitions: int = DEDUP_NUM_PARTITIONS,
):
    """Exact dedup of an ingest INCREMENT against every previous increment
    — the CDC × dedup crossover: a crawl refresh / binlog epoch arrives,
    and only never-before-seen documents survive, at a cost proportional
    to the INCREMENT (plus the touched state partitions), not the corpus.

    State is a persistent per-partition fingerprint table under
    ``state_dir`` (``part-{p}.parquet`` with ``(key, id)``, key-sorted,
    one partition per ``hash(fingerprint) % num_partitions`` — the same
    hash-partition layout as the lake tables).  Each call:

    1. fingerprints the increment (16 B/doc exchange, text never shuffled
       — same identity rule as :func:`dedup_exact_hash`);
    2. per partition: loads the seen set, marks as duplicate every row
       whose fingerprint is already owned by a DIFFERENT id (state entry,
       or a smaller id within this increment), then atomically folds the
       increment's new winners into the state file (write-tmp +
       ``os.replace``);
    3. filters the increment with the dup set (broadcast or distributed
       anti-join via ``filter_mode``).

    Semantics: **earlier increments always win** (stream-order first
    occurrence); within one increment the min id wins.  Replaying an
    increment is idempotent: its winners are already in the state under
    their own ids, so the replay emits byte-identical survivors and the
    state file is unchanged.  When increments arrive in id order the
    result equals the one-shot ``min-id-wins`` dedup (the SQL oracle).

    With ``filter_mode="shuffle"`` the candidate pipeline (and therefore
    the state commit) is deferred into the returned Dataset — call
    ``.materialize()`` on each increment's result before starting the next
    (broadcast mode resolves candidates eagerly, so sequential calls are
    already ordered).  At 10^10-doc scale the state rewrite is O(state
    partition) per increment; an LSM-style delta stack (the
    ``merge_strategy="delta"`` design in :mod:`.cdc`) is the documented
    refinement when increments are small relative to the seen set.
    """
    import json
    import os
    import uuid

    import pyarrow.parquet as pq

    os.makedirs(state_dir, exist_ok=True)
    meta_path = os.path.join(state_dir, "_meta.json")
    meta = {"num_partitions": num_partitions, "normalize": normalize}
    try:
        with open(meta_path, "x") as f:
            json.dump(meta, f)
    except FileExistsError:
        with open(meta_path) as f:
            existing = json.load(f)
        if existing != meta:
            raise ValueError(
                f"dedup state at {state_dir} was written with {existing}; "
                f"refusing to resume with {meta} (fingerprint partitioning "
                "would mis-route)"
            )

    def keys(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch.column(text_col).combine_chunks().is_valid())
        fp = content_fingerprint(batch.column(text_col), normalize=normalize)
        t = pa.table(
            {
                "key": pc.fill_null(fp, 0).cast(pa.uint64()),
                "id": batch.column(id_col).cast(pa.int64()),
            }
        )
        k = t.column("key").to_numpy(zero_copy_only=False)
        part = (k % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(part, type=pa.int64()))

    def resolve_and_commit(group: pa.Table) -> pa.Table:
        p = group.column("_part")[0].as_py()
        path = os.path.join(state_dir, f"part-{p:05d}.parquet")
        k = group.column("key").to_numpy(zero_copy_only=False)
        ids = group.column("id").to_numpy(zero_copy_only=False)
        # increment-local winner per key: min id
        order = np.lexsort((ids, k))
        ks, is_ = k[order], ids[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        new_keys, new_winners = ks[first], is_[first]
        if os.path.exists(path):
            st = pq.read_table(path)
            sk = st.column("key").to_numpy(zero_copy_only=False)
            sid = st.column("id").to_numpy(zero_copy_only=False)
        else:
            sk = np.array([], dtype=np.uint64)
            sid = np.array([], dtype=np.int64)
        # state overrides the increment-local winner (earlier increment wins)
        pos = np.searchsorted(sk, new_keys)
        pos_c = np.minimum(pos, max(len(sk) - 1, 0))
        in_state = (
            (sk[pos_c] == new_keys) if len(sk) else np.zeros(len(new_keys), dtype=bool)
        )
        winners = np.where(in_state, sid[pos_c] if len(sk) else 0, new_winners)
        # duplicate = any row whose id is not its key's winner
        row_pos = np.searchsorted(new_keys, k)
        dup = ids != winners[row_pos]
        out = pa.table(
            {"dup_id": pa.array(ids[dup], type=pa.int64())}
        )
        fresh = ~in_state
        if fresh.any():
            merged_k = np.concatenate([sk, new_keys[fresh]])
            merged_id = np.concatenate([sid, new_winners[fresh]])
            o = np.argsort(merged_k, kind="stable")
            tmp = path + f".tmp.{uuid.uuid4().hex}"
            pq.write_table(
                pa.table(
                    {
                        "key": pa.array(merged_k[o], type=pa.uint64()),
                        "id": pa.array(merged_id[o], type=pa.int64()),
                    }
                ),
                tmp,
            )
            os.replace(tmp, path)
        return out

    candidates = (
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve_and_commit, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def jaccard_pairs(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.8,
    num_partitions: int = DEDUP_NUM_PARTITIONS,
    max_shingle_freq: int | None = None,
):
    """Exact word-k-gram Jaccard similarity PAIRS ``(ia < ib)`` with
    ``J >= threshold`` — the edge list of the near-duplicate graph, for
    clustering (:func:`..graph.connected_components`) rather than
    keep-first filtering.  Same distributed inverted index as
    :func:`dedup_jaccard_exact`; SQL-reproducible."""
    return _jaccard_pair_candidates(
        ds,
        text_col=text_col,
        id_col=id_col,
        shingle_k=shingle_k,
        threshold=threshold,
        num_partitions=num_partitions,
        max_shingle_freq=max_shingle_freq,
        emit="pairs",
    )


def dup_rate_by_group(
    ds,
    *,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int = 64,
):
    """Duplication profile per group: total docs, distinct contents and
    the duplicate fraction — the "how much would dedup save per source"
    planning diagnostic.  Returns ``(group, n_docs, n_distinct,
    dup_fraction)`` with ONE IEEE division per group.

    Hash-only: per-batch distinct ``(group, fingerprint)`` partials plus
    per-group row counts ride one fixed-width exchange routed by
    ``hash(group, fingerprint)``; per-partition distinct → per-group
    partial distinct counts → aggregate-sized fold keyed on the group.
    Content identity is the dedup family's 64-bit stable hash (collision
    odds n²/2⁶⁵ — the documented envelope).  Null text counts as a doc
    but carries no fingerprint (SQL ``COUNT(DISTINCT text)`` skips
    nulls); null groups are kept as their own SQL group.
    """
    from ..functions.hashing import partition_ids, stable_hash_array

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).combine_chunks()
        txt = batch.column(text_col).combine_chunks()
        h = stable_hash_array(txt).astype(np.int64)
        valid = txt.is_valid().to_numpy(zero_copy_only=False)
        # distinct (group, fingerprint) within the batch
        fp = pa.table(
            {
                "_g": g.filter(pa.array(valid)),
                "_h": pa.array(h[valid], type=pa.int64()),
            }
        ).group_by(["_g", "_h"]).aggregate([])
        fp = fp.append_column(
            "_n", pa.nulls(fp.num_rows, pa.int64())
        )
        # per-group row-count partials (every doc, null text included)
        cnt = (
            pa.table({"_g": g})
            .group_by("_g")
            .aggregate([([], "count_all")])
            .rename_columns(["_g", "_n"])
        )
        cnt = pa.table(
            {
                "_g": cnt.column("_g"),
                "_h": pa.nulls(cnt.num_rows, pa.int64()),
                "_n": cnt.column("_n").cast(pa.int64()),
            }
        )
        fp = fp.select(["_g", "_h", "_n"])
        both = pa.concat_tables([fp, cnt])
        # route fingerprints by (group, hash) so per-partition distinct is
        # global; count partials ride on hash(group, null) — same key
        # space, no extra exchange
        mix = stable_hash_array(both.column("_g")).astype(
            np.uint64
        ) ^ np.uint64(0x9E3779B97F4A7C15) * pc.fill_null(
            both.column("_h"), 0
        ).to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = (mix % np.uint64(num_partitions)).astype(np.int64)
        return both.append_column("_part", pa.array(parts, type=pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        is_cnt = pc.is_null(t.column("_h"))
        cnts = t.filter(is_cnt)
        fps = t.filter(pc.invert(is_cnt))
        n_part = (
            cnts.group_by("_g")
            .aggregate([("_n", "sum")])
            .rename_columns(["_g", "_docs"])
        )
        d_part = (
            fps.group_by(["_g", "_h"])
            .aggregate([])
            .group_by("_g")
            .aggregate([([], "count_all")])
            .rename_columns(["_g", "_distinct"])
        )
        out_n = pa.table(
            {
                "_g": n_part.column("_g"),
                "_docs": n_part.column("_docs").cast(pa.int64()),
                "_distinct": pa.nulls(n_part.num_rows, pa.int64()),
            }
        )
        out_d = pa.table(
            {
                "_g": d_part.column("_g"),
                "_docs": pa.nulls(d_part.num_rows, pa.int64()),
                "_distinct": d_part.column("_distinct").cast(pa.int64()),
            }
        )
        return pa.concat_tables([out_n, out_d])

    def final_route(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import partition_ids as pids

        parts = pids(batch.column("_g"), 8)
        return batch.append_column("_rpart", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_rpart"])
            .group_by("_g")
            .aggregate([("_docs", "sum"), ("_distinct", "sum")])
        )
        docs = (
            pc.fill_null(g.column("_docs_sum"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dist = (
            pc.fill_null(g.column("_distinct_sum"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            frac = (docs - dist).astype(np.float64) / docs.astype(np.float64)
        ok = docs > 0
        return pa.table(
            {
                group_col: g.column("_g"),
                "n_docs": pa.array(docs, type=pa.int64()),
                "n_distinct": pa.array(dist, type=pa.int64()),
                "dup_fraction": pa.array(frac, type=pa.float64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
        .map_batches(final_route, batch_format="pyarrow", batch_size=None)
        .groupby("_rpart")
        .map_groups(final, batch_format="pyarrow")
    )


def dedup_minhash_incremental(
    ds,
    state_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    verify_threshold: float | None = None,
    filter_mode: str = "auto",
    num_partitions: int = DEDUP_NUM_PARTITIONS,
):
    """MinHash near-dup dedup of an ingest INCREMENT against every
    previous increment — the near-dup sibling of
    :func:`dedup_exact_incremental` and the production shape of
    crawl-refresh dedup: cost is proportional to the increment (plus the
    touched state partitions), never the corpus.

    State under ``state_dir`` is a per-partition Parquet of ALL
    previously-seen docs' band-bucket entries WITH their signatures
    (``part-{p}.parquet``: band, key, id, sig — the same
    ``mix(band, key) % P`` routing as the one-shot family), so a new
    doc's buckets probe exactly the partitions its bands hash to.

    Rule (monotone, stream-order): a doc is a duplicate iff a VERIFIED
    bucket match exists against (a) any doc of an earlier increment —
    kept or itself removed ("all seen docs", which is what makes the
    rule independent of partitioning — or (b) a smaller id within its
    own increment (the one-shot bucket-rep semantics).  When increments
    arrive in id order this equals the one-shot min-id-per-class dedup —
    the SQL oracle in signature-exact mode.  Replay is idempotent: a
    replayed doc finds its OWN band rows in the state (same id →
    excluded from matching; append skipped), so survivors and state are
    byte-identical.

    With ``filter_mode="shuffle"`` the candidate pipeline (and the state
    commit) defer into the returned Dataset — materialize each
    increment's result before the next call (broadcast resolves
    eagerly)."""
    import json
    import os
    import uuid

    import pyarrow.parquet as pq

    sig_type = pa.binary(num_perm * 8)
    os.makedirs(state_dir, exist_ok=True)
    meta_path = os.path.join(state_dir, "_meta.json")
    meta = {
        "num_partitions": num_partitions,
        "num_perm": num_perm,
        "bands": bands,
        "shingle_k": shingle_k,
        "verify_threshold": verify_threshold,
    }
    try:
        with open(meta_path, "x") as f:
            json.dump(meta, f)
    except FileExistsError:
        with open(meta_path) as f:
            existing = json.load(f)
        if existing != meta:
            raise ValueError(
                f"minhash state at {state_dir} was written with "
                f"{existing}; refusing to resume with {meta}"
            )

    def keys(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(
            batch.column(text_col), num_perm=num_perm, shingle_k=shingle_k
        )
        present = sig[:, 0] != np.uint64(0xFFFFFFFFFFFFFFFF)
        sig = sig[present]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[present]
        band_idx, key = band_keys(sig, bands=bands)
        packed = pa.FixedSizeBinaryArray.from_buffers(
            sig_type,
            len(sig),
            [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())],
        )
        out = {
            "id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            "band": pa.array(band_idx, type=pa.int64()),
            "key": pa.array(key, type=pa.uint64()),
            "sig": packed.take(
                pa.array(
                    np.repeat(np.arange(len(sig)), bands), type=pa.int64()
                )
            ),
        }
        return _route_buckets(pa.table(out), num_partitions)

    def _sigs(col) -> np.ndarray:
        arr = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        data = np.frombuffer(arr.buffers()[1], dtype=np.uint64).reshape(
            -1, num_perm
        )
        return data[arr.offset : arr.offset + len(arr)]

    def resolve_and_commit(group: pa.Table) -> pa.Table:
        p = int(group.column("_part")[0].as_py())
        path = os.path.join(state_dir, f"part-{p:05d}.parquet")
        inc = group.drop_columns(["_part"])
        inc_band = inc.column("band").to_numpy(zero_copy_only=False)
        inc_key = (
            inc.column("key").to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        inc_id = inc.column("id").to_numpy(zero_copy_only=False)
        inc_sig = _sigs(inc.column("sig"))
        dup_mask = np.zeros(len(inc_id), dtype=bool)
        # buckets decided by a state rep are EXCLUDED from local resolve
        state_rep_bucket = np.zeros(len(inc_id), dtype=bool)
        seen_pairs = None
        st = None
        if os.path.exists(path):
            st = pq.read_table(path)
            st_band = st.column("band").to_numpy(zero_copy_only=False)
            st_key = (
                st.column("key").to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            st_id = st.column("id").to_numpy(zero_copy_only=False)
            st_sig = _sigs(st.column("sig"))
            # state rows whose id belongs to the CURRENT increment are
            # invisible to the probe: a replayed increment must resolve
            # against earlier increments + its own local rule only, or
            # replaying an increment with internal duplicates would drop
            # the WHOLE duplicate class (each doc matching its committed
            # partner) instead of keeping the winner
            inc_set = np.unique(inc_id)
            pos_i = np.searchsorted(inc_set, st_id)
            pos_i = np.minimum(pos_i, len(inc_set) - 1)
            st_valid = inc_set[pos_i] != st_id
            # state is (band, key, id)-sorted on disk; lexicographic
            # probe over (band, key) via a structured view
            st_struct = np.empty(
                len(st_band),
                dtype=[("b", np.int64), ("k", np.uint64)],
            )
            st_struct["b"], st_struct["k"] = st_band, st_key
            q = np.empty(
                len(inc_band),
                dtype=[("b", np.int64), ("k", np.uint64)],
            )
            q["b"], q["k"] = inc_band, inc_key
            lo = np.searchsorted(st_struct, q, side="left")
            hi = np.searchsorted(st_struct, q, side="right")
            counts = hi - lo
            if counts.sum():
                rows = np.repeat(np.arange(len(inc_band)), counts)
                flat = np.concatenate(
                    [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
                )
                valid = st_valid[flat]
                vrows, vflat = rows[valid], flat[valid]
                if len(vrows):
                    # one-shot bucket-rep parity: verify ONLY against
                    # the bucket's min-id state row (ranges are id-
                    # sorted, so the first valid entry per inc row IS
                    # the rep); the bucket is then decided — dup if the
                    # verify passes, kept otherwise — exactly like
                    # _resolve_buckets_vectorized's rep rule
                    first = np.ones(len(vrows), dtype=bool)
                    first[1:] = vrows[1:] != vrows[:-1]
                    rep_rows = vrows[first]
                    rep_flat = vflat[first]
                    ok = np.ones(len(rep_rows), dtype=bool)
                    if verify_threshold:
                        est = (
                            inc_sig[rep_rows] == st_sig[rep_flat]
                        ).mean(axis=1)
                        ok = est >= verify_threshold
                    dup_mask[rep_rows[ok]] = True
                    state_rep_bucket[rep_rows] = True
            # replay detection: (band, key, id) triple already in state
            st3 = np.empty(
                len(st_band),
                dtype=[("b", np.int64), ("k", np.uint64),
                       ("i", np.int64)],
            )
            st3["b"], st3["k"], st3["i"] = st_band, st_key, st_id
            st3.sort()
            q3 = np.empty(
                len(inc_band),
                dtype=[("b", np.int64), ("k", np.uint64),
                       ("i", np.int64)],
            )
            q3["b"], q3["k"], q3["i"] = inc_band, inc_key, inc_id
            if len(st3):
                pos = np.searchsorted(st3, q3)
                pos_c = np.minimum(pos, len(st3) - 1)
                seen_pairs = st3[pos_c] == q3
            else:
                seen_pairs = np.zeros(len(q3), dtype=bool)
        # within-increment one-shot resolution for buckets WITHOUT a
        # state rep (state-rep buckets are already fully decided)
        local = _resolve_buckets_vectorized(
            inc.filter(pa.array(~state_rep_bucket)),
            (
                (lambda t, c, r: (
                    _sigs(t.column("sig"))[c]
                    == _sigs(t.column("sig"))[r]
                ).mean(axis=1) >= verify_threshold)
                if verify_threshold
                else None
            ),
        )
        # commit: append every NEW (non-replayed) band row, keep the
        # state (band, key, id)-sorted for the probes above
        new_rows = (
            inc if seen_pairs is None
            else inc.filter(pa.array(~seen_pairs))
        )
        if new_rows.num_rows:
            pieces = [new_rows.select(["band", "key", "id", "sig"])]
            if st is not None:
                pieces.append(st)
            combined = pa.concat_tables(pieces)
            order = pc.sort_indices(
                combined,
                sort_keys=[("band", "ascending"), ("key", "ascending"),
                           ("id", "ascending")],
            )
            combined = combined.take(order)
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            pq.write_table(combined, tmp)
            os.replace(tmp, path)
        state_dups = pa.table(
            {"dup_id": pa.array(np.unique(inc_id[dup_mask]),
                                type=pa.int64())}
        )
        return pa.concat_tables([state_dups, local])

    candidates = (
        ds.map_batches(keys, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve_and_commit, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)
