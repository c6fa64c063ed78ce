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


# ---------------------------------------------------------------------------
# Set-similarity join with prefix filtering (AllPairs / PPJoin family)
# ---------------------------------------------------------------------------

_SIMJOIN_EMPTY_POSTINGS = pa.table(
    {
        "wh": pa.array([], type=pa.uint64()),
        "id": pa.array([], type=pa.int64()),
        "sz": pa.array([], type=pa.int64()),
        "_pw": pa.array([], type=pa.int64()),
    }
)
_SIMJOIN_EMPTY_DF = pa.table(
    {
        "wh": pa.array([], type=pa.uint64()),
        "id": pa.array([], type=pa.int64()),
        "sz": pa.array([], type=pa.int64()),
        "df": pa.array([], type=pa.int64()),
        "_pi": pa.array([], type=pa.int64()),
    }
)
_SIMJOIN_EMPTY_PREFIX = pa.table(
    {
        "wh": pa.array([], type=pa.uint64()),
        "id": pa.array([], type=pa.int64()),
        "_ps": pa.array([], type=pa.int64()),
    }
)
_SIMJOIN_EMPTY_CAND = pa.table(
    {
        "ia": pa.array([], type=pa.int64()),
        "ib": pa.array([], type=pa.int64()),
    }
)
_SIMJOIN_RESULT_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("inter_words", pa.int64()),
        ("union_words", pa.int64()),
    ]
)


def _simjoin_token_postings(batch, text_col, id_col, num_partitions,
                            shingle_k=1):
    """Distinct ``(token_hash, id, set_size)`` postings for one batch.

    ``shingle_k=1`` tokens are single words; ``shingle_k>1`` tokens are
    word-``k``-grams (positional rolling hash combine, same scheme as the
    dedup inverted index).  NULL text rows are dropped (SQL: a NULL
    document tokenizes to no rows and can never join);
    empty/whitespace-only text yields the single empty-string word,
    matching ``string_split_regex('', '\\s+')``; docs with fewer than
    ``shingle_k`` words have no tokens and appear in no pairs.
    """
    texts = batch.column(text_col)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    valid = pc.is_valid(texts)
    if not pc.all(valid).as_py():
        batch = batch.filter(valid)
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
    if batch.num_rows == 0:
        return _SIMJOIN_EMPTY_POSTINGS
    words = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(texts), r"\s+"
    )
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    word_h = stable_hash_array(flat).astype(np.uint64)
    if shingle_k == 1:
        lens = offsets[1:] - offsets[:-1]
        wh = word_h
        rows = np.repeat(np.arange(batch.num_rows), lens)
    else:
        n_flat = len(word_h)
        n_valid = n_flat - shingle_k + 1
        if n_valid <= 0:
            return _SIMJOIN_EMPTY_POSTINGS
        mults = np.cumprod(
            np.full(shingle_k, 0x9E3779B97F4A7C15, dtype=np.uint64)
        )
        wh = np.zeros(n_valid, dtype=np.uint64)
        for j in range(shingle_k):
            wh += word_h[j : j + n_valid] * mults[j]
        row_of = np.searchsorted(
            offsets[1:], np.arange(n_valid), side="right"
        )
        ok = np.arange(n_valid) + shingle_k <= offsets[row_of + 1]
        wh, rows = wh[ok], row_of[ok]
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)[rows]
    t = pa.table(
        {"wh": pa.array(wh), "id": pa.array(ids, type=pa.int64())}
    )
    g = t.group_by(["id", "wh"], use_threads=False).aggregate([])
    sizes = g.group_by("id", use_threads=False).aggregate([([], "count_all")])
    sz_ids = sizes.column("id").to_numpy(zero_copy_only=False)
    sz_n = sizes.column("count_all").to_numpy(zero_copy_only=False)
    order = np.argsort(sz_ids)
    gi = g.column("id").to_numpy(zero_copy_only=False)
    sz = sz_n[order][np.searchsorted(sz_ids[order], gi)]
    shv = g.column("wh").to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.table(
        {
            "wh": g.column("wh"),
            "id": g.column("id"),
            "sz": pa.array(sz, type=pa.int64()),
            "_pw": pa.array(
                (shv % np.uint64(num_partitions)).astype(np.int64)
            ),
        }
    )


def _simjoin_token_lists(batch, text_col, id_col, involved, num_partitions,
                         shingle_k=1):
    """Per-doc SORTED token-hash lists for the verify join, restricted to
    ids in the broadcast ``involved`` set (sorted int64 array)."""
    ids_all = batch.column(id_col).to_numpy(zero_copy_only=False)
    pos = np.searchsorted(involved, ids_all)
    pos[pos >= len(involved)] = 0
    keep = involved[pos] == ids_all if len(involved) else np.zeros(
        len(ids_all), dtype=bool
    )
    empty = pa.table(
        {
            "key": pa.array([], type=pa.int64()),
            "other": pa.array([], type=pa.int64()),
            "toks": pa.array([], type=pa.list_(pa.uint64())),
            "carry": pa.array([], type=pa.list_(pa.uint64())),
            "_side": pa.array([], type=pa.int8()),
            "_vp": pa.array([], type=pa.int64()),
        }
    )
    if not keep.any():
        return empty
    batch = batch.filter(pa.array(keep))
    posts = _simjoin_token_postings(batch, text_col, id_col, 1, shingle_k)
    if posts.num_rows == 0:
        return empty
    ids = posts.column("id").to_numpy(zero_copy_only=False)
    wh = posts.column("wh").to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((wh, ids))
    ids, wh = ids[order], wh[order]
    starts = np.flatnonzero(
        np.concatenate(([True], ids[1:] != ids[:-1]))
    )
    doc_ids = ids[starts]
    if len(ids) >= 2**31:
        # int32 ListArray offsets would silently wrap into a corrupt array
        raise RuntimeError(
            "similarity_join_words: verify partition holds "
            f"{len(ids)} flat tokens (>= 2^31); raise num_partitions"
        )
    offs = np.concatenate((starts, [len(ids)])).astype(np.int32)
    toks = pa.ListArray.from_arrays(
        pa.array(offs), pa.array(wh, type=pa.uint64())
    )
    n = len(doc_ids)
    return pa.table(
        {
            "key": pa.array(doc_ids, type=pa.int64()),
            "other": pa.nulls(n, type=pa.int64()),
            "toks": toks,
            "carry": pa.nulls(n, type=pa.list_(pa.uint64())),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
            "_vp": pa.array(doc_ids % np.int64(num_partitions)),
        }
    )


def similarity_join_words(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 1,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    max_candidate_pairs: int = 50_000_000,
):
    """All-pairs word-SET similarity join: every ``(doc_a < doc_b)`` pair
    with exact Jaccard(token sets) ≥ ``threshold``, plus the exact integer
    intersection / union sizes.

    The reference engine has no similarity join; a training-data pipeline
    wants one for near-dup AUDITING (which pairs, how similar — not just
    which docs to drop, cf. ``pipelines/dedup.py``) and entity resolution.
    A naive algorithm is the Σc² inverted-index expansion over ALL tokens
    (intractable under stopwords).  This is the AllPairs / PPJoin prefix
    filter (Bayardo et al. WWW'07; Xiao et al. WWW'08): under a global
    token order (ascending document frequency, hash tie-break), two sets
    with ``J ≥ t`` must share a token among the first
    ``|x| − ceil(t·|x|) + 1`` tokens of EACH side — because
    ``o = |x∩y| ≥ t·|x|`` (since ``|y| ≥ o``) and the smallest common
    token under any total order sits within the first ``|x| − o + 1``
    positions of both sides.  Only prefix tokens enter the candidate
    index, so rare tokens (df≈1) generate no pairs and stopwords are
    excluded from most prefixes; candidates are verified with an exact
    integer predicate ``c·(p+q) ≥ p·(na+nb)`` for ``t = p/q`` — no float
    in the decision, so the DuckDB oracle reproduces it bit-for-bit.

    Shape: distinct-posting scan → df annotate (hash exchange on token) →
    per-doc prefix selection (hash exchange on id) → candidate expansion
    over prefix postings only (hash exchange on token) → verify join
    (two co-partition exchanges shipping sorted token-hash lists for
    CANDIDATE docs only, broadcast id filter).  The candidate set is
    materialized once (aggregate-sized by the prefix-filter contract;
    ``max_candidate_pairs`` guards the broadcast id set).  Token-hash
    equality stands in for token equality (64-bit ``stable_hash``, same
    documented collision envelope as ``dedup_jaccard_exact``).
    """
    from fractions import Fraction

    import ray

    frac = Fraction(threshold).limit_denominator(1_000_000)
    tp, tq = frac.numerator, frac.denominator
    if not (0 < tp <= tq):
        raise ValueError(f"threshold must be in (0, 1]: {threshold}")
    P = num_partitions

    def annotate_df(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SIMJOIN_EMPTY_DF
        wh = group.column("wh").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        ids = group.column("id").to_numpy(zero_copy_only=False)
        sz = group.column("sz").to_numpy(zero_copy_only=False)
        order = np.argsort(wh, kind="stable")
        wh, ids, sz = wh[order], ids[order], sz[order]
        new_seg = np.concatenate(([True], wh[1:] != wh[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(seg_start, len(wh)))
        df = seg_len[seg_id]
        return pa.table(
            {
                "wh": pa.array(wh),
                "id": pa.array(ids, type=pa.int64()),
                "sz": pa.array(sz, type=pa.int64()),
                "df": pa.array(df, type=pa.int64()),
                "_pi": pa.array(ids % np.int64(P)),
            }
        )

    def prefix_postings(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SIMJOIN_EMPTY_PREFIX
        wh = group.column("wh").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        ids = group.column("id").to_numpy(zero_copy_only=False)
        sz = group.column("sz").to_numpy(zero_copy_only=False)
        df = group.column("df").to_numpy(zero_copy_only=False)
        order = np.lexsort((wh, df, ids))
        wh, ids, sz = wh[order], ids[order], sz[order]
        new_seg = np.concatenate(([True], ids[1:] != ids[:-1]))
        seg_start_idx = np.flatnonzero(new_seg)
        rank = np.arange(len(ids)) - seg_start_idx[np.cumsum(new_seg) - 1]
        # o >= ceil(t*sz) for any qualifying partner, so the minimal
        # common token sits within the first sz - ceil(t*sz) + 1 tokens
        alpha = -((-tp * sz) // tq)
        keep = rank < (sz - alpha + 1)
        wh, ids = wh[keep], ids[keep]
        return pa.table(
            {
                "wh": pa.array(wh),
                "id": pa.array(ids, type=pa.int64()),
                "_ps": pa.array(
                    (wh % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def cand_pairs(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _SIMJOIN_EMPTY_CAND
        wh = group.column("wh").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        ids = group.column("id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, wh))
        wh, ids = wh[order], ids[order]
        n = len(wh)
        new_seg = np.concatenate(([True], wh[1:] != wh[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        seg_start = np.flatnonzero(new_seg)
        pos = np.arange(n) - seg_start[seg_id]
        total = int(pos.sum())
        if total == 0:
            return _SIMJOIN_EMPTY_CAND
        b_idx = np.repeat(np.arange(n), pos)
        pairs_before = np.concatenate(([0], np.cumsum(pos)[:-1]))
        a_idx = np.arange(total) + np.repeat(
            seg_start[seg_id] - pairs_before, pos
        )
        t = pa.table(
            {
                "ia": pa.array(ids[a_idx], type=pa.int64()),
                "ib": pa.array(ids[b_idx], type=pa.int64()),
            }
        )
        return t.group_by(["ia", "ib"], use_threads=False).aggregate([])

    cand = (
        ds.map_batches(
            lambda b: _simjoin_token_postings(
                b, text_col, id_col, P, shingle_k
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("_pw")
        .map_groups(annotate_df, batch_format="pyarrow")
        .groupby("_pi")
        .map_groups(prefix_postings, batch_format="pyarrow")
        .groupby("_ps")
        .map_groups(cand_pairs, batch_format="pyarrow")
    ).materialize()

    # candidate doc ids — aggregate-sized by the prefix-filter contract.
    # Streamed with an INCREMENTAL budget check (union1d-compact per
    # block) so a pathological low-selectivity input raises before the
    # whole set ever materializes on the driver (ADVICE r4).
    budget = 2 * max_candidate_pairs
    involved = np.array([], dtype=np.int64)
    for b in cand.map_batches(
        lambda b: pa.table(
            {
                "id": np.unique(
                    np.concatenate(
                        [
                            b.column("ia").to_numpy(zero_copy_only=False),
                            b.column("ib").to_numpy(zero_copy_only=False),
                        ]
                    )
                )
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        involved = np.union1d(
            involved,
            b.column("id").to_numpy(zero_copy_only=False).astype(np.int64),
        )
        if len(involved) > budget:
            raise RuntimeError(
                f"similarity_join_words: candidate doc set {len(involved)} "
                f"exceeds the broadcast budget; raise max_candidate_pairs "
                f"or lower the threshold's prefix selectivity"
            )
    if len(involved) == 0:
        import ray.data as rd

        return rd.from_arrow(_SIMJOIN_RESULT_SCHEMA.empty_table())
    involved_ref = ray.put(involved)

    def pairs_env_a(batch: pa.Table) -> pa.Table:
        ia = batch.column("ia")
        n = batch.num_rows
        return pa.table(
            {
                "key": ia,
                "other": batch.column("ib"),
                "toks": pa.nulls(n, type=pa.list_(pa.uint64())),
                "carry": pa.nulls(n, type=pa.list_(pa.uint64())),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
                "_vp": pa.array(
                    ia.to_numpy(zero_copy_only=False) % np.int64(P)
                ),
            }
        )

    def lists_stage(batch: pa.Table) -> pa.Table:
        import ray as _ray

        inv = _ray.get(involved_ref)
        return _simjoin_token_lists(
            batch, text_col, id_col, inv, P, shingle_k
        )

    # one tokenize pass restricted to candidate docs, materialized once and
    # reused by both verify rounds (candidate-doc-sized by contract)
    lists_env = ds.map_batches(
        lists_stage, batch_format="pyarrow", batch_size=None
    ).materialize()
    env_a = cand.map_batches(
        pairs_env_a, batch_format="pyarrow", batch_size=None
    ).union(lists_env)

    def _attach(group: pa.Table, dedupe: bool):
        """Split the union envelope, optionally dedupe the pair side
        (round A only — every copy of pair ``(ia, ib)`` lands in the same
        ``ia`` partition, so the round-A dedupe is global), and attach the
        list-side token list of ``key`` to every pair row."""
        side = group.column("_side").to_numpy(zero_copy_only=False)
        pairs = group.filter(pa.array(side == 0))
        lists = group.filter(pa.array(side == 1))
        if pairs.num_rows == 0 or lists.num_rows == 0:
            return None
        if dedupe:
            pairs = pairs.group_by(
                ["key", "other"], use_threads=False
            ).aggregate([])
        lid = lists.column("key").to_numpy(zero_copy_only=False)
        lorder = np.argsort(lid)
        lid = lid[lorder]
        toks = lists.column("toks").combine_chunks().take(pa.array(lorder))
        pkey = pairs.column("key").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lid, pkey)
        idx[idx >= len(lid)] = 0
        ok = lid[idx] == pkey
        if not ok.all():
            pairs = pairs.filter(pa.array(ok))
            idx = idx[ok]
        if pairs.num_rows == 0:
            return None
        return pairs, toks.take(pa.array(idx))

    def attach_a(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], type=pa.int64()),
                "other": pa.array([], type=pa.int64()),
                "toks": pa.array([], type=pa.list_(pa.uint64())),
                "carry": pa.array([], type=pa.list_(pa.uint64())),
                "_side": pa.array([], type=pa.int8()),
                "_vp": pa.array([], type=pa.int64()),
            }
        )
        got = _attach(group, dedupe=True)
        if got is None:
            return empty
        pairs, toks_a = got
        other = pairs.column("other").to_numpy(zero_copy_only=False)
        n = pairs.num_rows
        # re-envelope keyed on ib for round B; toks_a rides as carry
        return pa.table(
            {
                "key": pa.array(other, type=pa.int64()),
                "other": pairs.column("key"),
                "toks": pa.nulls(n, type=pa.list_(pa.uint64())),
                "carry": toks_a,
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
                "_vp": pa.array(other % np.int64(P)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        got = _attach(group, dedupe=False)
        if got is None:
            return _SIMJOIN_RESULT_SCHEMA.empty_table()
        pairs, toks_b = got
        toks_a = pairs.column("carry").combine_chunks()
        npairs = pairs.num_rows
        fa = toks_a.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        fb = toks_b.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        na = pc.list_value_length(toks_a).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nb = pc.list_value_length(toks_b).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pair_idx = np.concatenate(
            [np.repeat(np.arange(npairs), na), np.repeat(np.arange(npairs), nb)]
        )
        tok = np.concatenate([fa, fb])
        order = np.lexsort((tok, pair_idx))
        pair_idx, tok = pair_idx[order], tok[order]
        dup = np.zeros(len(tok), dtype=bool)
        if len(tok) > 1:
            dup[1:] = (pair_idx[1:] == pair_idx[:-1]) & (tok[1:] == tok[:-1])
        c = np.bincount(pair_idx[dup], minlength=npairs).astype(np.int64)
        keep = c * (tp + tq) >= tp * (na + nb)
        ib = pairs.column("key").to_numpy(zero_copy_only=False)[keep]
        ia = pairs.column("other").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "doc_a": pa.array(ia, type=pa.int64()),
                "doc_b": pa.array(ib, type=pa.int64()),
                "inter_words": pa.array(c[keep], type=pa.int64()),
                "union_words": pa.array(
                    na[keep] + nb[keep] - c[keep], type=pa.int64()
                ),
            }
        )

    env_b = (
        env_a.groupby("_vp")
        .map_groups(attach_a, batch_format="pyarrow")
        .union(lists_env)
    )
    return env_b.groupby("_vp").map_groups(verify, batch_format="pyarrow")
