"""Fuzzy string matching (record linkage / spelling-variant mining) —
edit-distance self-join over a string column, built Ray-Data-first.

The reference has no fuzzy matching (its connector compares nothing); a
training-data pipeline needs it constantly: vocabulary cleanup (OCR /
typo variants), host-name typo-squat detection, entity resolution on
names.  An all-pairs Levenshtein join is O(V²·L²) — intractable — so this
uses COMPLETE deletion-neighborhood blocking (the SymSpell / FastSS
scheme): if ``lev(a, b) ≤ d`` then deleting at most ``d`` characters from
each side reaches a common string (delete the substituted/inserted
characters of an optimal alignment), so two strings within distance ``d``
always share a ≤``d``-deletion variant.  Candidates are exactly the pairs
sharing a variant hash; an exact, fully vectorized Levenshtein verifies.

Scale shape: distinct-project the input (shuffle cost O(vocab)), expand
each distinct string into O(L^d) variant hashes (vectorized slice+join
kernels per deletion ORDINAL, never per row), ONE hash exchange of
``(variant_hash, string)``, per-bucket pair expansion (Σ c² like the
inverted-index Jaccard join), ONE pair exchange for dedup + verify.
Payload strings are short by contract (``max_len`` envelope — longer
strings want the MinHash/LSH family instead, ``pipelines/dedup.py``).

Distance is BYTE-level Levenshtein (== character level for ASCII; for
non-ASCII a multi-byte codepoint edit counts its byte length — documented
envelope, the oracle corpus is ASCII).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash_array

DEFAULT_NUM_PARTITIONS = 64
_BIG = 1 << 30


def _binary_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(padded uint8 matrix, lengths) for a binary/string Arrow array —
    one scatter, no per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.binary())
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = offs[1:] - offs[:-1]
    total = int(lens.sum())
    width = int(lens.max()) if n else 0
    mat = np.zeros((n, max(width, 1)), dtype=np.uint8)
    if total:
        flat = data[offs[0] : offs[-1]]
        rows = np.repeat(np.arange(n), lens)
        starts_out = np.concatenate(([0], np.cumsum(lens)[:-1]))
        cols = np.arange(total) - np.repeat(starts_out, lens)
        mat[rows, cols] = flat
    return mat, lens.astype(np.int64)


def levenshtein_pairs(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Exact byte-level Levenshtein distance for N string pairs at once.

    Vectorized across pairs: the classic DP runs row by row over the
    longest left string, and the within-row insertion chain
    ``new[j] = min(cand[j], new[j-1]+1)`` — normally sequential — is
    rewritten as a prefix minimum: ``new[j] = j + min_{k≤j}(x[k]-k)``
    (``np.minimum.accumulate``), so every step is a full-width numpy op
    over the whole pair batch.  O(La · Lb) numpy work per pair, zero
    Python per pair.
    """
    am, alen = _binary_matrix(a)
    bm, blen = _binary_matrix(b)
    n, la = am.shape
    lb = bm.shape[1]
    rng = np.arange(lb + 1, dtype=np.int32)
    dp = np.tile(rng, (n, 1))
    la_max = int(alen.max()) if n else 0
    for i in range(1, la_max + 1):
        cost = (bm != am[:, i - 1 : i]).astype(np.int32)
        cand = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost)
        m = np.concatenate(
            [np.full((n, 1), i, dtype=np.int32), cand - rng[1:][None, :]],
            axis=1,
        )
        new = np.minimum.accumulate(m, axis=1) + rng[None, :]
        dp = np.where((alen >= i)[:, None], new, dp)
    return dp[np.arange(n), blen] if n else np.zeros(0, dtype=np.int32)


def _deletion_variants(
    words: pa.Array, lens: np.ndarray, max_dist: int
) -> list[tuple[pa.Array, np.ndarray]]:
    """All ≤``max_dist``-deletion variants of each word, as
    ``(variant_array, parent_row_indices)`` — looped over deletion
    ORDINALS (≤ L + L²/2 vectorized kernel calls), never over rows."""
    empty_sep = pa.scalar(b"", type=pa.binary())
    out = [(words, np.arange(len(words), dtype=np.int64))]
    lmax = int(lens.max()) if len(lens) else 0
    for i in range(lmax):
        sel = np.flatnonzero(lens > i)
        if not len(sel):
            break
        sub = words.take(pa.array(sel))
        v = pc.binary_join_element_wise(
            pc.binary_slice(sub, 0, i),
            pc.binary_slice(sub, i + 1, _BIG),
            empty_sep,
        )
        out.append((v, sel))
    if max_dist >= 2:
        for i in range(lmax):
            for j in range(i + 1, lmax):
                sel = np.flatnonzero(lens > j)
                if not len(sel):
                    break
                sub = words.take(pa.array(sel))
                v = pc.binary_join_element_wise(
                    pc.binary_slice(sub, 0, i),
                    pc.binary_slice(sub, i + 1, j),
                    pc.binary_slice(sub, j + 1, _BIG),
                    empty_sep,
                )
                out.append((v, sel))
    return out


_EMPTY_CAND = pa.table(
    {
        "wa": pa.array([], type=pa.binary()),
        "wb": pa.array([], type=pa.binary()),
        "_p2": pa.array([], type=pa.int64()),
    }
)


def fuzzy_pairs(
    ds,
    *,
    word_col: str,
    max_dist: int = 2,
    max_len: int = 32,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """All DISTINCT value pairs of ``word_col`` within byte-level
    Levenshtein distance ``max_dist`` (1 or 2), as
    ``(word_a, word_b, dist)`` with ``word_a < word_b`` bytewise.

    Envelope (both documented, both mirrored by the SQL oracle): values
    shorter than ``max_dist + 1`` bytes are excluded (their deletion
    neighborhoods collapse to near-empty strings and bucket half the
    vocabulary together — a 1-byte word being "within distance 2" of
    every ≤3-byte word is noise, not signal); values longer than
    ``max_len`` are excluded (deletion blocking is for short strings —
    long-string similarity belongs to the MinHash family).
    """
    if max_dist not in (1, 2):
        raise ValueError("fuzzy_pairs supports max_dist in {1, 2}")

    from .ops import distinct_values

    distinct = distinct_values(
        ds, columns=[word_col], num_partitions=num_partitions
    )

    def sigs(batch: pa.Table) -> pa.Table:
        w = batch.column(word_col)
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        w = w.drop_null().cast(pa.binary())
        lens = pc.binary_length(w).to_numpy(zero_copy_only=False)
        keep = (lens > max_dist) & (lens <= max_len)
        w = w.filter(pa.array(keep))
        lens = lens[keep]
        parts_sig = []
        parts_word = []
        for variant, parents in _deletion_variants(w, lens, max_dist):
            parts_sig.append(stable_hash_array(variant))
            parts_word.append(w.take(pa.array(parents)))
        sig = (
            np.concatenate(parts_sig)
            if parts_sig
            else np.zeros(0, dtype=np.uint64)
        )
        words_out = (
            pa.concat_arrays(parts_word)
            if parts_word
            else pa.array([], type=pa.binary())
        )
        t = pa.table(
            {"sig": pa.array(sig, type=pa.uint64()), "w": words_out}
        )
        # a word can reach the same variant through different deletion
        # ordinals (repeated characters) — dedup locally so bucket pair
        # expansion never sees the same (sig, word) twice
        t = t.group_by(["sig", "w"], use_threads=False).aggregate([])
        part = (
            t.column("sig").to_numpy(zero_copy_only=False)
            % np.uint64(num_partitions)
        ).astype(np.int64)
        return t.append_column("_part", pa.array(part, type=pa.int64()))

    def expand(group: pa.Table) -> pa.Table:
        sig = group.column("sig").to_numpy(zero_copy_only=False)
        w = group.column("w").combine_chunks()
        order = pc.sort_indices(
            group, sort_keys=[("sig", "ascending"), ("w", "ascending")]
        )
        onp = order.to_numpy(zero_copy_only=False)
        sig = sig[onp]
        w = w.take(order)
        n = len(sig)
        if n < 2:
            return _EMPTY_CAND
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = sig[1:] != sig[:-1]
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        pos = np.arange(n) - seg_start[seg_id]
        total = int(pos.sum())
        if total == 0:
            return _EMPTY_CAND
        b_idx = np.repeat(np.arange(n), pos)
        pairs_before = np.concatenate(([0], np.cumsum(pos)[:-1]))
        a_idx = np.arange(total) + np.repeat(
            seg_start[seg_id] - pairs_before, pos
        )
        wa = w.take(pa.array(a_idx))
        wb = w.take(pa.array(b_idx))
        # within a sig segment words are sorted, so wa < wb already holds
        pp = (
            (
                stable_hash_array(wa) * np.uint64(0x9E3779B97F4A7C15)
            )
            ^ stable_hash_array(wb)
        ) % np.uint64(num_partitions)
        return pa.table(
            {
                "wa": wa,
                "wb": wb,
                "_p2": pa.array(pp.astype(np.int64), type=pa.int64()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_p2"])
            .group_by(["wa", "wb"], use_threads=False)
            .aggregate([])
        )
        if g.num_rows == 0:
            return pa.table(
                {
                    "word_a": pa.array([], type=pa.string()),
                    "word_b": pa.array([], type=pa.string()),
                    "dist": pa.array([], type=pa.int64()),
                }
            )
        wa = g.column("wa").combine_chunks()
        wb = g.column("wb").combine_chunks()
        d = levenshtein_pairs(wa, wb)
        ok = d <= max_dist
        sel = pa.array(np.flatnonzero(ok))
        return pa.table(
            {
                "word_a": wa.take(sel).cast(pa.string()),
                "word_b": wb.take(sel).cast(pa.string()),
                "dist": pa.array(d[ok], type=pa.int64()),
            }
        )

    return (
        distinct.map_batches(sigs, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(expand, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(verify, batch_format="pyarrow")
    )
