"""Corpus-level segment operators: CCNet-style boilerplate removal,
global first-occurrence segment dedup, and vocabulary extraction.

These are the line/paragraph-granularity web-text cleanup stages (CCNet,
RefinedWeb, Dolma all run some form of them) that doc-level dedup can't
express: the unit of work is a SEGMENT of a document (a line, paragraph,
or word — any separator), and the decision for one segment depends on the
whole corpus, so each operator is a two-phase Ray Data pipeline:

1. a vectorized ``map_batches`` pass splits every document into segments
   with ``pyarrow.compute.split_pattern`` (zero Python per row) and emits
   fixed-width ``(segment_hash, …)`` rows — the document text itself never
   rides the statistics exchange;
2. a single hash-partitioned ``groupby`` resolves the corpus-wide decision
   (document frequency / first occurrence), and a rebuild pass filters each
   document's segment list and re-joins it with ``binary_join``.

Segment identity is a 64-bit stable hash (same identity rule as the URL
rollup in :mod:`.web`); collision odds are ~n²/2⁶⁵.  Output text is
byte-identical to the SQL reconstruction (``string_agg`` over surviving
segments), pinned by DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.hashing import stable_hash_array

CORPUS_NUM_PARTITIONS = 64

__all__ = [
    "remove_frequent_segments",
    "dedup_segments_first",
    "dedup_segments_within",
    "top_terms",
    "chunk_documents",
    "decontaminate",
]


def _split(text_col, sep: str):
    """Split a text column into segments.

    Returns ``(flat_values, parent_row, within_row_idx, null_mask, n_rows)``
    where ``flat_values`` concatenates every row's segments in order,
    ``parent_row`` maps each segment to its row, ``within_row_idx`` is the
    0-based position inside the row, and ``null_mask`` marks null-text rows
    (which contribute no segments, matching SQL ``string_split(NULL)``).
    """
    arr = text_col.combine_chunks() if isinstance(text_col, pa.ChunkedArray) else text_col
    lst = pc.split_pattern(arr, sep)
    flat = pc.list_flatten(lst)
    parent = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    counts = (
        pc.fill_null(pc.list_value_length(lst), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    return flat, parent, idx, null_mask, len(arr)


def _rejoin(flat, parent, keep, n_rows, sep: str, null_mask):
    """Rebuild one text value per row from the kept segments (order
    preserved); null-text rows stay null."""
    kept_parent = parent[keep]
    counts = np.bincount(kept_parent, minlength=n_rows).astype(np.int64)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    values = flat.filter(pa.array(keep))
    lst = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), values)
    joined = pc.binary_join(lst, sep)
    if null_mask.any():
        joined = pc.if_else(
            pa.array(null_mask), pa.nulls(n_rows, pa.string()), joined
        )
    return joined


def remove_frequent_segments(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_df: int = 2,
    num_partitions: int = CORPUS_NUM_PARTITIONS,
):
    """Remove segments that occur in ≥ ``min_df`` distinct documents — the
    CCNet/RefinedWeb boilerplate filter ("Privacy Policy", nav bars, cookie
    banners) at line granularity (``sep="\\n"``), or document-frequency
    stopword pruning at word granularity (``sep=" "``).

    Phase 1 computes exact per-segment document frequency: each batch emits
    one ``(hash, partial_df)`` row per distinct (segment, doc) pair — a doc
    never spans batches, so summing the partials over one hash exchange is
    the exact global DF.  The qualifying set is collected and broadcast via
    ``ray.put`` (read once per task): its size is bounded by
    ``total_segments / min_df`` (every member occurs ≥ min_df times), i.e.
    raising the threshold shrinks the broadcast — the boilerplate set of a
    100 TB corpus at min_df in the thousands is MBs of hashes.  Phase 2
    re-splits each document, drops qualifying segments, and re-joins —
    document text never rides any exchange.

    Returns ``(id_col, text)`` with text byte-identical to the SQL
    ``string_agg`` reconstruction (empty string when every segment was
    removed; null for null input text).
    """

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, parent, _idx, _null, _n = _split(batch.column(text_col), sep)
        h = stable_hash_array(flat)
        t = pa.table(
            {
                "h": pa.array(h, type=pa.uint64()),
                "p": pa.array(parent, type=pa.int64()),
            }
        )
        # distinct (segment, doc) pairs, then per-segment partial DF
        g = t.group_by(["h", "p"], use_threads=False).aggregate([])
        g2 = g.group_by("h", use_threads=False).aggregate([([], "count_all")])
        part = (
            g2.column("h").to_numpy(zero_copy_only=False)
            % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "h": g2.column("h"),
                "df": g2.column("count_all").cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def df_final(group: pa.Table) -> pa.Table:
        g = group.group_by("h", use_threads=False).aggregate([("df", "sum")])
        return g.filter(
            pc.greater_equal(g.column("df_sum"), min_df)
        ).select(["h"])

    frequent = (
        ds.map_batches(df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(df_final, batch_format="pyarrow")
    )
    # driver collect of hashes only (8 B/segment, bounded as documented)
    chunks = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in frequent.iter_batches(batch_format="pyarrow")
    ]
    bad = np.sort(np.concatenate(chunks)) if chunks else np.array([], dtype=np.uint64)
    bad_ref = ray.put(bad)

    def clean(batch: pa.Table) -> pa.Table:
        bad_sorted = ray.get(bad_ref)
        flat, parent, _idx, null_mask, n = _split(batch.column(text_col), sep)
        if len(bad_sorted):
            h = stable_hash_array(flat)
            pos = np.searchsorted(bad_sorted, h)
            pos[pos == len(bad_sorted)] = 0
            keep = bad_sorted[pos] != h
        else:
            keep = np.ones(len(flat), dtype=bool)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": _rejoin(flat, parent, keep, n, sep, null_mask),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=None)


_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _mix_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """splitmix64-style 64-bit hash of an (int, int) pair, vectorized."""
    with np.errstate(over="ignore"):
        x = a.astype(np.uint64) * _MIX1 ^ (b.astype(np.uint64) + np.uint64(1)) * _MIX2
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
    return x


def dedup_segments_first(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_partitions: int = CORPUS_NUM_PARTITIONS,
):
    """Corpus-wide first-occurrence segment dedup (the CCNet paragraph
    dedup): every segment is kept ONLY at its first occurrence — minimal
    ``(id, position)`` over the whole corpus — and removed everywhere else;
    documents are rebuilt from their surviving segments.

    Two fixed-width exchanges, no text on either:

    1. winner election — each batch pre-reduces to its local first
      occurrence per segment hash (one lexsort, no Python per segment),
      then one hash exchange on the segment hash elects the global minimum
      ``(id, idx)``; the exchange carries 24 B/distinct-segment/batch;
    2. rebuild — winners are co-partitioned with the documents by
      ``hash(id)`` (tagged-union groupby, same envelope trick as
      ``shuffle_join``), and each partition filters its documents' segment
      lists against its winner positions locally.  Document text rides
      this exchange once (unavoidable: the output IS the text).

    ``id_col`` must be an integer column — "first" is defined by ``(id,
    idx)`` order, exactly SQL ``row_number() OVER (PARTITION BY seg ORDER
    BY id, idx) = 1``, which makes the result independent of batch/block
    composition (replay- and parallelism-invariant).
    """

    def winners_partial(batch: pa.Table) -> pa.Table:
        flat, parent, idx, _null, _n = _split(batch.column(text_col), sep)
        h = stable_hash_array(flat)
        ids = (
            batch.column(id_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[parent]
        )
        order = np.lexsort((idx, ids, h))
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        w = order[first]
        part = (h[w] % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "h": pa.array(h[w], type=pa.uint64()),
                "wid": pa.array(ids[w], type=pa.int64()),
                "widx": pa.array(idx[w], type=pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def winners_final(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        ids = group.column("wid").to_numpy(zero_copy_only=False)
        idx = group.column("widx").to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, ids, h))
        hs = h[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = hs[1:] != hs[:-1]
        w = order[first]
        return pa.table(
            {
                "wid": pa.array(ids[w], type=pa.int64()),
                "widx": pa.array(idx[w], type=pa.int64()),
            }
        )

    winners = (
        ds.map_batches(winners_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(winners_final, batch_format="pyarrow")
    )

    # co-partition winners and documents by hash(id); tagged union
    def env_winners(batch: pa.Table) -> pa.Table:
        ids = batch.column("wid").to_numpy(zero_copy_only=False)
        part = (
            stable_hash_array(ids) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "_id": batch.column("wid"),
                "_idx": batch.column("widx"),
                "_text": pa.nulls(batch.num_rows, pa.string()),
                "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def env_docs(batch: pa.Table) -> pa.Table:
        ids = (
            batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        part = (
            stable_hash_array(ids) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "_id": pa.array(ids, type=pa.int64()),
                "_idx": pa.nulls(batch.num_rows, pa.int64()),
                "_text": batch.column(text_col),
                "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    env = winners.map_batches(
        env_winners, batch_format="pyarrow", batch_size=None
    ).union(ds.map_batches(env_docs, batch_format="pyarrow", batch_size=None))

    def rebuild(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        wmask = side == 0
        wid = group.column("_id").to_numpy(zero_copy_only=False)[wmask]
        widx = (
            group.column("_idx")
            .to_numpy(zero_copy_only=False)[wmask]
            .astype(np.int64)
        )
        docs = group.filter(pa.array(~wmask))
        flat, parent, idx, null_mask, n = _split(docs.column("_text"), sep)
        ids = docs.column("_id").to_numpy(zero_copy_only=False)[parent]
        keep_set = np.sort(_mix_pairs(wid, widx))
        ph = _mix_pairs(ids, idx)
        if len(keep_set):
            pos = np.searchsorted(keep_set, ph)
            pos[pos == len(keep_set)] = 0
            keep = keep_set[pos] == ph
        else:
            keep = np.zeros(len(flat), dtype=bool)
        return pa.table(
            {
                id_col: docs.column("_id"),
                "text": _rejoin(flat, parent, keep, n, sep, null_mask),
            }
        )

    return env.groupby("_part").map_groups(rebuild, batch_format="pyarrow")


def dedup_segments_within(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
):
    """INTRA-document first-occurrence segment dedup (the C4/RefinedWeb
    "remove duplicate lines within a page" cleanup): inside each document,
    every segment survives only at its first position; later repeats of the
    same segment are dropped and the document is re-joined.

    Unlike the corpus-wide variants this needs NO exchange at all — the
    decision for a segment depends only on its own row, so the whole
    operator is one vectorized ``map_batches`` pass (split → one lexsort
    per batch → rejoin) that streams at read speed and scales embarrassingly.

    Segment identity is the same 64-bit stable hash as the corpus-wide
    ops (collision odds documented in the module docstring).  Matches SQL
    ``row_number() OVER (PARTITION BY id, seg ORDER BY idx) = 1`` with the
    ``string_agg`` reconstruction; null text stays null, empty text stays
    empty.
    """

    def clean(batch: pa.Table) -> pa.Table:
        flat, parent, idx, null_mask, n = _split(batch.column(text_col), sep)
        h = stable_hash_array(flat)
        order = np.lexsort((idx, h, parent))
        hs = h[order]
        ps = parent[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])
        keep = np.zeros(len(flat), dtype=bool)
        keep[order[first]] = True
        return pa.table(
            {
                id_col: batch.column(id_col),
                "text": _rejoin(flat, parent, keep, n, sep, null_mask),
            }
        )

    return ds.map_batches(clean, batch_format="pyarrow", batch_size=None)


def top_terms(
    ds,
    *,
    text_col: str = "text",
    k: int = 20,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Global top-k vocabulary: lowercase, split on ``pattern``, count every
    term corpus-wide, return the ``k`` most frequent as ``(term, n)`` —
    the tokenizer-training / corpus-profiling staple.

    Per-batch pre-aggregation (Arrow ``value_counts``) means the term
    exchange carries one row per distinct term per batch; the final top-k
    uses the local-top-k + tiny-reduce shape of :func:`.ops.top_k_by`
    (deterministic ``(n DESC, term ASC)`` tie-break = SQL
    ``ORDER BY n DESC, term LIMIT k``), so no stage ever holds more than
    the per-partition distinct-term set.
    """

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        terms, counts = vc.field(0), vc.field(1)
        part = (
            stable_hash_array(terms) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "n": counts.cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def local_topk(group: pa.Table) -> pa.Table:
        g = group.group_by("term", use_threads=False).aggregate([("n", "sum")])
        t = pa.table({"term": g.column("term"), "n": g.column("n_sum")})
        order = pc.sort_indices(
            t, sort_keys=[("n", "descending"), ("term", "ascending")]
        )
        return t.take(order[: min(k, t.num_rows)])

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        order = pc.sort_indices(
            batch, sort_keys=[("n", "descending"), ("term", "ascending")]
        )
        return batch.take(order[: min(k, batch.num_rows)])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def chunk_documents(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 512,
    overlap: int = 64,
):
    """Split documents into fixed-width overlapping character chunks — the
    context-window preparation stage of a training-data pipeline (1 → N
    row expansion).  Chunk ``i`` covers codepoints ``[i·step, i·step +
    chunk_size)`` with ``step = chunk_size − overlap``; the last chunk may
    be short; a document of ≤ ``chunk_size`` chars (including empty) is
    one chunk; null text emits no rows (SQL ``WHERE text IS NOT NULL``).

    Purely per-batch (no shuffle, no state): the expansion loops over
    chunk ORDINALS (max chunks per batch, a handful), not rows — each
    ordinal is one vectorized ``utf8_slice_codeunits`` over the rows still
    long enough.  Output ``(id, chunk_idx, chunk)`` matches SQL
    ``substr(text, i·step + 1, chunk_size)`` byte-for-byte.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        valid = arr.is_valid()
        t = pa.table({id_col: batch.column(id_col), "_t": arr}).filter(valid)
        txt = t.column("_t").combine_chunks()
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        extra = np.maximum(lens - chunk_size, 0)
        n_chunks = 1 + (extra + step - 1) // step
        out = []
        for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
            mask = pa.array(n_chunks > k)
            sub = t.filter(mask)
            chunk = pc.utf8_slice_codeunits(
                sub.column("_t").combine_chunks(),
                k * step,
                k * step + chunk_size,
            )
            out.append(
                pa.table(
                    {
                        id_col: sub.column(id_col),
                        "chunk_idx": pa.array(
                            np.full(sub.num_rows, k, dtype=np.int64)
                        ),
                        "chunk": chunk,
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    id_col: pa.array([], type=batch.schema.field(id_col).type),
                    "chunk_idx": pa.array([], type=pa.int64()),
                    "chunk": pa.array([], type=pa.string()),
                }
            )
        return pa.concat_tables(out)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


_GRAM_FNV = np.uint64(1099511628211)


def _gram_hashes(text_col, sep: str, k: int):
    """64-bit hashes of every FULL k-token gram per row.

    Returns ``(gram_hash, parent_row, within_row_pos)``.  Gram identity is
    the FNV-style combine of the k token hashes, mixed — equal to string
    equality of the space-joined gram (tokens cannot contain the separator,
    so the join is injective for fixed k) up to 64-bit collisions.  Rows
    with fewer than k tokens (or null text) emit no grams, matching the SQL
    formulation ``generate_series(1, len(parts) - k + 1)``.
    """
    flat, parent, idx, _null, n_rows = _split(text_col, sep)
    h = stable_hash_array(flat)
    cnt = np.bincount(parent, minlength=n_rows) if len(parent) else np.zeros(
        n_rows, dtype=np.int64
    )
    starts = np.nonzero(idx <= cnt[parent] - k)[0] if len(idx) else np.array(
        [], dtype=np.int64
    )
    sh = np.zeros(len(starts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            sh = sh * _GRAM_FNV + h[starts + j]
    mixed = _mix_pairs(sh, np.full(len(sh), k, dtype=np.uint64))
    return mixed, parent[starts], idx[starts]


def decontaminate(
    ds,
    bench_ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
    gram_k: int = 5,
):
    """Benchmark decontamination (the GPT-3 / Pile / Dolma n-gram filter):
    drop every document that shares at least one exact k-token gram with
    any document in ``bench_ds``.

    The benchmark side is SMALL by construction (eval sets, not the
    corpus), so its distinct gram-hash set is collected once, sorted, and
    broadcast via ``ray.put`` (8 B per distinct gram — millions of grams =
    MBs); the corpus pass is then a pure per-batch ``map_batches`` filter
    with NO shuffle and no per-doc state: hash each document's full grams,
    ``searchsorted`` against the broadcast set, keep rows with zero hits.
    (At extreme benchmark sizes the same set feeds a Bloom filter; exact
    hashes keep this oracle-checkable.)  A 100 TB corpus streams through
    in one scan.

    Documents shorter than ``gram_k`` tokens and null-text documents have
    no grams and always survive — identical to the SQL anti-join over
    ``parts[i:i+k-1]`` slices.
    """
    chunks = []
    for b in bench_ds.map_batches(
        lambda t: pa.table(
            {
                "g": pa.array(
                    np.unique(_gram_hashes(t.column(text_col), sep, gram_k)[0]),
                    type=pa.uint64(),
                )
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        chunks.append(b.column("g").to_numpy(zero_copy_only=False))
    bench = (
        np.unique(np.concatenate(chunks))
        if chunks
        else np.array([], dtype=np.uint64)
    )
    bench_ref = ray.put(bench)

    def keep_clean(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        gh, gparent, _gpos = _gram_hashes(batch.column(text_col), sep, gram_k)
        if len(bset) == 0 or len(gh) == 0:
            return batch
        pos = np.searchsorted(bset, gh)
        pos[pos == len(bset)] = 0
        hit = bset[pos] == gh
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        contaminated[gparent[hit]] = True
        return batch.filter(pa.array(~contaminated))

    return ds.map_batches(keep_clean, batch_format="pyarrow", batch_size=None)


def repeated_ngram_spans(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
    gram_k: int = 8,
    num_partitions: int = CORPUS_NUM_PARTITIONS,
):
    """EXACT-SUBSTRING duplicate-span detection (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" operator,
    token-granular): every maximal span of ≥ ``gram_k`` consecutive tokens
    whose every ``gram_k``-token window occurs at least twice in the WHOLE
    corpus.  Returns one row per merged span: ``(id_col, span_start,
    span_end, span_tokens)`` — 0-based token offsets, end exclusive.
    Feeding the spans to a cut/trim pass is the actual dedup; reporting all
    occurrences (not "all but one") keeps the policy with the caller.

    Shape: per-batch vectorized rolling window hashes (FNV combine over
    per-token stable hashes — identical identity rule to
    :func:`decontaminate`, collisions ~n²/2⁶⁵) emit fixed-width
    ``(hash, id, pos)`` rows; ONE hash-partitioned exchange finds windows
    whose corpus count ≥ 2 (document text never rides the exchange); a
    second id-partitioned exchange merges each document's duplicated
    window positions into maximal spans (gap ≤ gram_k ⇒ same span) with a
    sort + run-length pass.  At 100 TB the window stream is
    O(tokens) × 24 B and both exchanges are fixed-width — a frequency
    sketch could prefilter singleton windows before the first exchange,
    but exact hashes keep this oracle-checkable.
    """
    from ..functions.hashing import partition_ids

    k = gram_k

    def windows(batch: pa.Table) -> pa.Table:
        gh, gparent, gpos = _gram_hashes(batch.column(text_col), sep, k)
        ids = batch.column(id_col).take(pa.array(gparent, type=pa.int64()))
        part = (gh % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "g": pa.array(gh, type=pa.uint64()),
                id_col: ids,
                "pos": pa.array(gpos, type=pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def dup_occurrences(group: pa.Table) -> pa.Table:
        g = group.sort_by([("g", "ascending")])
        gv = g.column("g").to_numpy(zero_copy_only=False)
        n = len(gv)
        empty = pa.table(
            {
                id_col: g.column(id_col).slice(0, 0),
                "pos": pa.array([], type=pa.int64()),
                "_p2": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        start = np.ones(n, dtype=bool)
        start[1:] = gv[1:] != gv[:-1]
        run_id = np.cumsum(start) - 1
        run_len = np.bincount(run_id)
        keep = run_len[run_id] >= 2
        if not keep.any():
            return empty
        kept = g.filter(pa.array(keep))
        ids = kept.column(id_col)
        return pa.table(
            {
                id_col: ids,
                "pos": kept.column("pos"),
                "_p2": pa.array(
                    partition_ids(ids, num_partitions), type=pa.int64()
                ),
            }
        )

    def merge_spans(group: pa.Table) -> pa.Table:
        g = group.sort_by([(id_col, "ascending"), ("pos", "ascending")])
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: g.column(id_col),
                    "span_start": pa.array([], type=pa.int64()),
                    "span_end": pa.array([], type=pa.int64()),
                    "span_tokens": pa.array([], type=pa.int64()),
                }
            )
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (ids[1:] != ids[:-1]) | (pos[1:] - pos[:-1] > k)
        sidx = np.nonzero(brk)[0]
        eidx = np.append(sidx[1:], n) - 1
        return pa.table(
            {
                id_col: g.column(id_col).take(pa.array(sidx)),
                "span_start": pa.array(pos[sidx], type=pa.int64()),
                "span_end": pa.array(pos[eidx] + k, type=pa.int64()),
                "span_tokens": pa.array(
                    pos[eidx] + k - pos[sidx], type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(windows, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(dup_occurrences, batch_format="pyarrow")
        .groupby("_p2")
        .map_groups(merge_spans, batch_format="pyarrow")
    )


def trim_repeated_spans(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
    gram_k: int = 8,
    num_partitions: int = CORPUS_NUM_PARTITIONS,
    doc_schema: pa.Schema | None = None,
):
    """EXACT-SUBSTRING dedup — CUT the duplicated spans found by
    :func:`repeated_ngram_spans` out of every document and return the
    corpus with ``text`` rewritten (same row count; a fully-duplicated
    document becomes the empty string, null text stays null).

    Policy: EVERY occurrence of a duplicated span is removed — the behavior
    of the released Lee et al. 2022 ExactSubstr tool (the paper's
    keep-one-occurrence variant needs a global canonical-occurrence pick;
    compose one by anti-joining a keep-list against the spans instead).

    Shape: the span stream (small — only duplicated regions) and the docs
    ride ONE id-co-locating tagged-union exchange; the per-partition kernel
    splits each doc once, marks covered tokens with a difference-array
    cumsum over the flat token space (O(tokens + spans), no per-span loop),
    and re-joins the survivors.  Note ``ds`` is consumed twice (span
    detection + trim): fine for a source read, materialize first and pass
    ``doc_schema`` for a derived input.
    """
    from ..functions.hashing import partition_ids

    spans = repeated_ngram_spans(
        ds,
        id_col=id_col,
        text_col=text_col,
        sep=sep,
        gram_k=gram_k,
        num_partitions=num_partitions,
    )
    if doc_schema is None:
        doc_schema = ds.schema()
    types = dict(zip(doc_schema.names, doc_schema.types))
    text_type = types[text_col]

    def env_docs(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: batch.column(id_col),
                text_col: batch.column(text_col),
                "span_start": pa.nulls(batch.num_rows, pa.int64()),
                "span_end": pa.nulls(batch.num_rows, pa.int64()),
                "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            }
        )
        parts = partition_ids(t.column(id_col), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def env_spans(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                id_col: batch.column(id_col),
                text_col: pa.nulls(batch.num_rows, text_type),
                "span_start": batch.column("span_start"),
                "span_end": batch.column("span_end"),
                "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )
        parts = partition_ids(t.column(id_col), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    tagged = ds.map_batches(
        env_docs, batch_format="pyarrow", batch_size=None
    ).union(
        spans.map_batches(env_spans, batch_format="pyarrow", batch_size=None)
    )

    def trim(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        docs = group.filter(pa.array(side == 0))
        sp = group.filter(pa.array(side == 1))
        out_ids = docs.column(id_col)
        if sp.num_rows == 0 or docs.num_rows == 0:
            return pa.table({id_col: out_ids, text_col: docs.column(text_col)})
        flat, parent, _idx, null_mask, n_rows = _split(
            docs.column(text_col), sep
        )
        counts = np.bincount(parent, minlength=n_rows).astype(np.int64)
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        rows = (
            pc.fill_null(
                pc.index_in(
                    sp.column(id_col).combine_chunks(),
                    value_set=docs.column(id_col).combine_chunks(),
                ),
                -1,
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ok = rows >= 0  # spans derive from these docs; guard anyway
        lo = starts[rows[ok]] + sp.column("span_start").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)[ok]
        hi = starts[rows[ok]] + sp.column("span_end").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)[ok]
        diff = np.zeros(len(flat) + 1, dtype=np.int32)
        np.add.at(diff, lo, 1)
        np.add.at(diff, hi, -1)
        keep = np.cumsum(diff[:-1]) == 0
        joined = _rejoin(flat, parent, keep, n_rows, sep, null_mask)
        return pa.table({id_col: out_ids, text_col: joined})

    return tagged.groupby("_part").map_groups(trim, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# materialized inverted text index
# ---------------------------------------------------------------------------


def build_inverted_index(
    ds,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
    num_buckets: int = 64,
) -> None:
    """Materialize a term → posting-list index as bucket-partitioned
    Parquet: distinct ``(term, doc_id)`` pairs, hash-bucketed by term into
    ``bucket=<b>/`` directories (one streaming pass, one exchange of
    fixed-width pairs — document text never rides it).  A term lookup then
    reads ONLY ``hash(term) % num_buckets``'s directory —
    O(posting + bucket) I/O at any corpus size, the text-retrieval
    analog of :func:`~..similarity.build_ivf_index`'s IVF lists and the
    lake's hash-partition point lookup."""
    from ..functions.hashing import stable_hash_array

    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent, _idx, _nulls, _n = _split(batch.column(text_col), sep)
        ids_col = batch.column(id_col)
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        ids = ids_col.take(pa.array(parent))
        t = pa.table({"term": flat, id_col: ids})
        t = t.filter(
            pc.and_(
                t.column("term").combine_chunks().is_valid(),
                pc.greater(pc.utf8_length(t.column("term")), 0),
            )
        )
        t = t.group_by(["term", id_col], use_threads=False).aggregate([])
        b = (
            stable_hash_array(t.column("term").combine_chunks())
            % np.uint64(num_buckets)
        ).astype(np.int64)
        # bucket_p is the hive partition twin (directory name); no data
        # column needed — readers never consult it
        return t.append_column("bucket_p", pa.array(b, type=pa.int64()))

    ds.map_batches(pairs, batch_format="pyarrow", batch_size=None).write_parquet(
        index_dir, partition_cols=["bucket_p"]
    )


def lookup_postings(
    index_dir: str,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Posting lookup against a materialized inverted index: read only the
    buckets the terms hash to, filter to the terms, distinct (a term·doc
    pair may repeat across source batches).  Returns a Dataset of
    ``(term, doc_id)``."""
    from pathlib import Path

    from ..functions.hashing import stable_hash_array

    t_arr = pa.array(terms, type=pa.string())
    buckets = sorted(
        set(
            (stable_hash_array(t_arr) % np.uint64(num_buckets)).tolist()
        )
    )
    files = [
        str(f)
        for b in buckets
        for f in sorted((Path(index_dir) / f"bucket_p={b}").glob("*.parquet"))
        if (Path(index_dir) / f"bucket_p={b}").exists()
    ]
    import ray.data

    if not files:
        return ray.data.from_arrow(
            pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    id_col: pa.array([], type=pa.int64()),
                }
            )
        )
    ds = ray.data.read_parquet(files, columns=["term", id_col])

    def filt(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("term"), value_set=t_arr)
        return batch.filter(keep)

    from .ops import distinct_values

    return distinct_values(
        ds.map_batches(filt, batch_format="pyarrow", batch_size=None),
        columns=["term", id_col],
        num_partitions=8,
    )


def doc_top_terms(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Per-document top-k distinctive terms by tf·idf ranking — the
    keyword-extraction / relevance staple.  ``score = tf / df`` (df =
    number of documents containing the term): monotone-equivalent per
    document to tf·idf with any decreasing idf (N is constant within a
    doc), and — unlike ``tf·ln(N/df)`` — a SINGLE IEEE division that SQL
    reproduces bit-exactly (libm ``ln`` differs across engines, so a
    log-based score could flip equal-score orderings).

    Two narrow exchanges, text never shuffled:

    1. per batch: lowercase + regex split (vectorized), per-doc term
       counts via Arrow ``group_by`` (exact — a document is one row, so
       its tf never spans batches), routed by ``hash(term)``; the
       per-partition kernel counts df per term right there (every
       (doc, term) row of a term co-locates) and attaches it with one
       Acero join;
    2. route ``(doc, term, tf, df, score)`` by ``hash(doc)``; the
       per-partition kernel sorts ``(doc, score DESC, term)`` and keeps
       each doc's first ``k`` (rank = SQL ``row_number``).

    Documents whose text yields no terms (null/empty) emit no rows —
    matched by the oracle's construction.
    """

    def tf_route(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        ids = batch.column(id_col).combine_chunks().take(parents)
        keep = pc.not_equal(flat, "")
        t = pa.table({"doc": ids, "term": flat}).filter(keep)
        g = t.group_by(["doc", "term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        g = pa.table(
            {
                "doc": g.column("doc"),
                "term": g.column("term"),
                "tf": g.column("count_all").cast(pa.int64()),
            }
        )
        part = (
            stable_hash_array(g.column("term")) % np.uint64(num_partitions)
        ).astype(np.int64)
        return g.append_column("_part", pa.array(part, type=pa.int64()))

    def attach_df(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        df = t.group_by("term", use_threads=False).aggregate(
            [([], "count_all")]
        )
        df = pa.table(
            {
                "term": df.column("term"),
                "df": df.column("count_all").cast(pa.int64()),
            }
        )
        j = t.join(df, keys="term")
        score = pc.divide(
            pc.cast(j.column("tf"), pa.float64()),
            pc.cast(j.column("df"), pa.float64()),
        )
        j = j.append_column("score", score)
        part = (
            stable_hash_array(j.column("doc")) % np.uint64(num_partitions)
        ).astype(np.int64)
        return j.append_column("_part2", pa.array(part, type=pa.int64()))

    def topk(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part2"])
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("doc", "ascending"),
                ("score", "descending"),
                ("term", "ascending"),
            ],
        )
        t = t.take(idx)
        n = t.num_rows
        docs = t.column("doc").combine_chunks()
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = pc.not_equal(
                docs.slice(1), docs.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        seg_id = np.cumsum(start) - 1
        seg_base = np.nonzero(start)[0][seg_id]
        rank = np.arange(n, dtype=np.int64) - seg_base + 1
        t = t.append_column("rank", pa.array(rank, type=pa.int64()))
        out = t.filter(pa.array(rank <= k))
        return pa.table(
            {
                id_col: out.column("doc"),
                "term": out.column("term"),
                "tf": out.column("tf"),
                "df": out.column("df"),
                "score": out.column("score"),
                "rank": out.column("rank"),
            }
        )

    return (
        ds.map_batches(tf_route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(attach_df, batch_format="pyarrow")
        .groupby("_part2")
        .map_groups(topk, batch_format="pyarrow")
    )


def pack_documents(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    pattern: str = r"\s+",
    span: int = 1 << 20,
    num_partitions: int = 32,
):
    """Sequence packing: assign each document to a training-context pack by
    concatenating the corpus in ``id_col`` order and chopping at ``budget``
    tokens — ``pack_id = floor(tokens_before_doc / budget)`` (the
    concat-then-chunk packing recipe; a doc belongs to the pack its first
    token lands in).  Token count = non-empty ``pattern`` splits.

    The global running token total is the classic two-phase distributed
    prefix sum (same shape as the watermark operator): the corpus
    tokenizes ONCE into a materialized (id, n_tokens) projection (two
    int64 columns — payloads never held); pass 1 reduces each
    ``id // span`` range to its token sum (one tiny row per range —
    n/span scalars at any scale), the driver takes the exclusive prefix
    sum over the sorted range list, and pass 2 re-reads the projection
    seeded with each range's prefix, computing within-range exclusive
    cumsums vectorized.  Assumes ``id_col`` values
    are unique (primary key); null-text documents are excluded (0 tokens
    would still consume a pack slot otherwise — matched by the oracle's
    WHERE).
    """

    def tokens_of(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        t = pa.table({"id": batch.column(id_col), "_t": arr}).filter(
            arr.is_valid()
        )
        toks = pc.split_pattern_regex(t.column("_t").combine_chunks(), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        counts = np.zeros(t.num_rows, dtype=np.int64)
        if len(parents):
            np.add.at(counts, parents[nonempty], 1)
        return pa.table(
            {
                "id": t.column("id"),
                "n_tokens": pa.array(counts, type=pa.int64()),
            }
        )

    def range_sums(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        rng = ids // span
        order = np.argsort(rng, kind="stable")
        rng_s, n_s = rng[order], n[order]
        start = np.ones(len(rng_s), dtype=bool)
        start[1:] = rng_s[1:] != rng_s[:-1]
        si = np.flatnonzero(start)
        return pa.table(
            {
                "rng": pa.array(rng_s[si], type=pa.int64()),
                "s": pa.array(
                    np.add.reduceat(n_s, si)
                    if len(si)
                    else np.array([], dtype=np.int64),
                    type=pa.int64(),
                ),
            }
        )

    # Tokenize ONCE: both the prefix-sum pass and the routing pass feed
    # from the materialized (id, n_tokens) projection — two int64 columns
    # in the object store, never payloads; re-running the regex split over
    # the full corpus text per pass would double the operator's wall.
    counts = ds.map_batches(
        tokens_of, batch_format="pyarrow", batch_size=None
    ).materialize()
    partials = counts.map_batches(
        range_sums, batch_format="pyarrow", batch_size=None
    ).take_all()
    agg: dict[int, int] = {}
    for r in partials:
        g = int(r["rng"])
        agg[g] = agg.get(g, 0) + int(r["s"])
    seeds: dict[int, int] = {}
    run = 0
    for g in sorted(agg):
        seeds[g] = run
        run += agg[g]
    seeds_ref = ray.put(seeds)

    def route(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        part = (ids // span) % num_partitions
        return t.append_column("_part", pa.array(part, type=pa.int64()))

    def assign(group: pa.Table) -> pa.Table:
        sd = ray.get(seeds_ref)
        t = group.drop_columns(["_part"])
        ids = t.column("id").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        rng = ids // span
        start = np.ones(len(ids), dtype=bool)
        start[1:] = rng[1:] != rng[:-1]
        si = np.flatnonzero(start)
        # exclusive within-range cumsum, seeded by the range prefix
        cum = np.cumsum(n) - n
        bases = cum[si]
        seg_id = np.cumsum(start) - 1
        seed = np.array([sd[int(g)] for g in rng[si]], dtype=np.int64)
        before = cum - bases[seg_id] + seed[seg_id]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n, type=pa.int64()),
                "pack_id": pa.array(before // budget, type=pa.int64()),
            }
        )

    return (
        counts.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(assign, batch_format="pyarrow")
    )


def top_ngrams(
    ds,
    *,
    text_col: str = "text",
    n: int = 2,
    k: int = 20,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Global top-k word n-grams (the n-gram LM-counts / collocation
    staple): lowercase, split on ``pattern``, form every within-document
    run of ``n`` consecutive non-empty tokens (space-joined), count
    corpus-wide, return the ``k`` most frequent as ``(gram, cnt)``.

    Same exchange shape as :func:`top_terms` — per-batch Arrow
    ``value_counts`` pre-aggregation so the shuffle carries one row per
    distinct gram per batch, then per-partition sum + local top-k + tiny
    final reduce.  The gram construction is vectorized: flattened tokens
    with parent indices, adjacency = equal parents on shifted views.
    """
    if n < 2:
        raise ValueError("use top_terms for unigrams")

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        m = len(flat)
        if m >= n:
            starts = np.nonzero(parents[: m - n + 1] == parents[n - 1:])[0]
        else:
            starts = np.array([], dtype=np.int64)
        if len(starts):
            pieces = [flat.take(pa.array(starts + j)) for j in range(n)]
            grams = pc.binary_join_element_wise(*pieces, " ")
            vc = pc.value_counts(grams)
            terms, counts = vc.field(0), vc.field(1)
        else:
            terms = pa.array([], type=pa.string())
            counts = pa.array([], type=pa.int64())
        part = (
            stable_hash_array(terms) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "gram": terms,
                "cnt": counts.cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def local_topk(group: pa.Table) -> pa.Table:
        g = group.group_by("gram", use_threads=False).aggregate([("cnt", "sum")])
        t = pa.table({"gram": g.column("gram"), "cnt": g.column("cnt_sum")})
        order = pc.sort_indices(
            t, sort_keys=[("cnt", "descending"), ("gram", "ascending")]
        )
        return t.take(order[: min(k, t.num_rows)])

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        order = pc.sort_indices(
            batch, sort_keys=[("cnt", "descending"), ("gram", "ascending")]
        )
        return batch.take(order[: min(k, batch.num_rows)])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def doc_oov_fraction(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 1000,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """N-gram LM-style quality signal WITHOUT a float log: the fraction of
    a document's word bigrams that fall OUTSIDE the corpus's top-``k``
    bigram set (high fraction ≈ unusual/garbled text — the integer-exact
    stand-in for perplexity filtering, CCNet/Gopher style).

    Phase 1 = :func:`top_ngrams` (per-batch value_counts pre-agg, term-only
    exchange, deterministic (cnt DESC, gram) tie-break); the k-row gram set
    broadcasts via ``ray.put``.  Phase 2 is one shuffle-free vectorized
    pass: per-doc bigram totals and OOV counts by ``np.bincount`` over
    parent indices, ONE IEEE division per doc for the fraction (exact ints
    before it, so the SQL form hashes identically).  Docs with < 1 bigram
    report ``n_bigrams = 0`` and a NULL fraction.
    """
    import ray

    top = top_ngrams(
        ds, text_col=text_col, n=2, k=top_k,
        pattern=pattern, num_partitions=num_partitions,
    )
    parts = list(top.iter_batches(batch_format="pyarrow"))
    grams = (
        pa.concat_tables(parts).column("gram").combine_chunks()
        if parts
        else pa.array([], type=pa.string())
    )
    grams_ref = ray.put(grams)

    def per_doc(batch: pa.Table) -> pa.Table:
        gram_set = ray.get(grams_ref)
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        m = len(flat)
        n_rows = batch.num_rows
        if m >= 2:
            starts = np.nonzero(parents[: m - 1] == parents[1:])[0]
        else:
            starts = np.array([], dtype=np.int64)
        nb = np.zeros(n_rows, dtype=np.int64)
        noov = np.zeros(n_rows, dtype=np.int64)
        if len(starts):
            gp = parents[starts]
            bigrams = pc.binary_join_element_wise(
                flat.take(pa.array(starts)),
                flat.take(pa.array(starts + 1)),
                " ",
            )
            nb += np.bincount(gp, minlength=n_rows).astype(np.int64)
            oov = pc.invert(
                pc.is_in(bigrams, value_set=gram_set)
            ).to_numpy(zero_copy_only=False)
            if oov.any():
                noov += np.bincount(
                    gp[oov], minlength=n_rows
                ).astype(np.int64)
        frac = np.where(nb > 0, noov / np.maximum(nb, 1), np.nan)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bigrams": pa.array(nb, type=pa.int64()),
                "n_oov": pa.array(noov, type=pa.int64()),
                # NaN marks the no-bigram docs → null (from_pandas)
                "oov_frac": pa.array(
                    frac, type=pa.float64(), from_pandas=True
                ),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow", batch_size=None)


def explode_segments(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
    out_idx: str = "seg_idx",
    out_seg: str = "segment",
):
    """Explode each document into one row per separator-delimited segment
    with a 1-based ordinal — the ``unnest(...) WITH ORDINALITY`` long
    format (SQL parity: ``unnest(string_split(text, sep))`` zipped with
    ``range(1, len+1)``), preserving ``string_split``'s edge cases
    (``''`` → one empty segment; doubled separators → empty segments;
    null text → zero rows).

    Pure per-batch ``flat_map`` shape — ``pc.split_pattern`` +
    ``list_flatten`` + repeat/arange ordinals, ZERO exchange and zero
    Python per row; output order within a document is positional, so any
    downstream keyed op can rely on ``(id, seg_idx)`` uniqueness."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = arr.is_valid()
        if not pc.all(valid).as_py():
            batch = batch.filter(valid)
            arr = batch.column(text_col)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
        lst = pc.split_pattern(arr, sep)
        lengths = pc.list_value_length(lst).to_numpy(zero_copy_only=False)
        lengths = lengths.astype(np.int64)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
        total = int(lengths.sum())
        csum0 = np.concatenate(([0], np.cumsum(lengths)))[: len(lengths)]
        ordinal = (
            np.arange(total, dtype=np.int64) - np.repeat(csum0, lengths) + 1
        )
        return pa.table(
            {
                id_col: ids.take(pa.array(rep)),
                out_idx: pa.array(ordinal, type=pa.int64()),
                out_seg: pc.list_flatten(lst),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def source_vocab_overlap(
    ds,
    *,
    group_col: str = "source",
    text_col: str = "text",
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = CORPUS_NUM_PARTITIONS,
    groups: list[str] | None = None,
    groups_ds=None,
):
    """Pairwise EXACT Jaccard overlap of word vocabularies between document
    groups — the corpus-mixture diagnostic ("how much of source A's
    vocabulary does source B share?").  Returns
    ``(group_a, group_b, n_common, n_union, jaccard)`` for every group
    pair with a non-empty intersection.

    Never all-pairs over terms: (1) the distinct group values (a
    LOW-cardinality dimension, ≤ 62 for the int64 bitmask) are collected
    once and broadcast as a sorted group→bit mapping; (2) each batch
    pre-reduces to distinct ``(term, groupmask)`` partials — within a
    batch the per-term mask sum IS the bitwise OR — then ONE hash exchange
    on term, a segmented ``bitwise_or.reduceat`` fold per partition, and a
    ≤2^k-row mask histogram; every pair statistic is a sum over that
    histogram (|A∩B| = Σ n over masks with both bits), so the driver only
    ever touches aggregate-sized data.  ``jaccard`` is ONE IEEE division —
    hash-exact vs the spelled-out SQL.  Null text/group rows and empty
    terms are excluded, matching the oracle's filters.

    Pass ``groups`` explicitly when ``ds`` is a DERIVED Dataset — the
    discovery scan otherwise executes the upstream pipeline a second time
    (the documented re-execution trap).  ``groups_ds`` lets the caller
    hand a column-pruned reader for the discovery pass so it does not
    drag the text column through a second full scan.
    """
    if groups is None:
        src_ds = groups_ds if groups_ds is not None else ds
        # per-batch distinct partials + driver fold — no exchange, and the
        # aggregate is one short row per (batch, group)
        parts_tbl = src_ds.map_batches(
            lambda b: pa.table(
                {
                    group_col: pc.drop_null(
                        b.column(group_col).combine_chunks()
                    ).unique()
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ).take_all()
        groups = sorted({r[group_col] for r in parts_tbl})
    else:
        groups = sorted(groups)
    if len(groups) > 62:
        raise ValueError(
            f"{len(groups)} groups exceed the int64 bitmask (max 62)"
        )
    bit_of = {g: 1 << i for i, g in enumerate(groups)}

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        garr = batch.column(group_col).combine_chunks()
        keep = pc.and_(txt.is_valid(), garr.is_valid())
        txt, garr = txt.filter(keep), garr.filter(keep)
        lst = pc.split_pattern_regex(pc.utf8_lower(txt), pattern)
        flat = pc.list_flatten(lst)
        parent = pc.list_parent_indices(lst)
        ok = pc.not_equal(flat, "")
        flat, parent = flat.filter(ok), parent.filter(ok)
        gvals = garr.take(parent)
        gi = pc.index_in(gvals, value_set=pa.array(groups, type=pa.string()))
        idx = pc.fill_null(gi, -1).to_numpy(zero_copy_only=False)
        known = idx >= 0
        shift = np.clip(idx, 0, None).astype(np.int64)
        masks = np.where(known, np.int64(1) << shift, np.int64(0))
        if not known.all():
            # group value outside the provided list: drop (caller's list
            # defines the universe)
            keep2 = pa.array(known)
            flat = flat.filter(keep2)
            masks = masks[known]
        t = pa.table({"term": flat, "_m": pa.array(masks, type=pa.int64())})
        # distinct (term, mask) then per-term sum == OR (each bit once)
        t = (
            t.group_by(["term", "_m"])
            .aggregate([])
            .group_by("term")
            .aggregate([("_m", "sum")])
            .rename_columns(["term", "_m"])
        )
        parts = (
            stable_hash_array(t.column("term"))
            % np.uint64(num_partitions)
        ).astype(np.int64)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[("term", "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "_mask": pa.array([], type=pa.int64()),
                    "_n": pa.array([], type=pa.int64()),
                }
            )
        terms = g.column("term").combine_chunks()
        m = g.column("_m").to_numpy(zero_copy_only=False)
        start = np.ones(n, dtype=bool)
        if n > 1:
            eq = pc.equal(terms.slice(1, n - 1), terms.slice(0, n - 1))
            start[1:] = np.invert(
                pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
            )
        si = np.flatnonzero(start)
        seg_mask = np.bitwise_or.reduceat(m, si)
        vals, cnt = np.unique(seg_mask, return_counts=True)
        return pa.table(
            {
                "_mask": pa.array(vals, type=pa.int64()),
                "_n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        t = (
            batch.group_by("_mask")
            .aggregate([("_n", "sum")])
            .rename_columns(["_mask", "_n"])
        )
        mask = t.column("_mask").to_numpy(zero_copy_only=False)
        cnt = t.column("_n").to_numpy(zero_copy_only=False)
        ga, gb, ncom, nuni, jac = [], [], [], [], []
        for i, a in enumerate(groups):
            in_a = (mask & bit_of[a]) != 0
            na = int(cnt[in_a].sum())
            for b in groups[i + 1 :]:
                in_b = (mask & bit_of[b]) != 0
                nb = int(cnt[in_b].sum())
                inter = int(cnt[in_a & in_b].sum())
                if inter == 0:
                    continue
                union = na + nb - inter
                ga.append(a)
                gb.append(b)
                ncom.append(inter)
                nuni.append(union)
                jac.append(float(inter) / float(union))
        return pa.table(
            {
                "group_a": pa.array(ga, type=pa.string()),
                "group_b": pa.array(gb, type=pa.string()),
                "n_common": pa.array(ncom, type=pa.int64()),
                "n_union": pa.array(nuni, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def frequency_spectrum(
    ds,
    *,
    text_col: str = "text",
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = CORPUS_NUM_PARTITIONS,
):
    """Corpus frequency spectrum: for each occurrence count ``f``, the
    number of DISTINCT terms occurring exactly ``f`` times — the
    Zipf/hapax-legomena profile that sizes vocabulary pruning and
    type-token diagnostics.

    Same exchange shape as :func:`top_terms`: per-batch term
    ``value_counts`` partials (one row per distinct term per batch), ONE
    hash exchange on term, per-partition sums — then each partition
    collapses its term counts to a ≤#distinct-frequencies histogram and a
    tiny final fold adds them.  No stage holds more than the
    per-partition distinct-term set; the output is aggregate-sized
    (distinct frequencies ≤ a few hundred even at corpus scale).
    """

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        terms, counts = vc.field(0), vc.field(1)
        part = (
            stable_hash_array(terms) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "n": counts.cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def spectrum_partial(group: pa.Table) -> pa.Table:
        g = group.group_by("term", use_threads=False).aggregate([("n", "sum")])
        freqs = g.column("n_sum").to_numpy(zero_copy_only=False)
        vals, cnt = np.unique(freqs, return_counts=True)
        return pa.table(
            {
                "frequency": pa.array(vals.astype(np.int64), type=pa.int64()),
                "n_terms": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by("frequency")
            .aggregate([("n_terms", "sum")])
            .rename_columns(["frequency", "n_terms"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(spectrum_partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def top_terms_by_group(
    ds,
    *,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = CORPUS_NUM_PARTITIONS,
):
    """Per-group top-k vocabulary (the grouped sibling of
    :func:`top_terms`): the ``k`` most frequent terms of every group with
    a deterministic ``(n DESC, term ASC)`` tie-break.

    One hash exchange keyed on ``(group, term)`` so each partition holds
    COMPLETE counts for its terms; the per-partition per-group local
    top-k is therefore a valid prune (every global winner lives wholly in
    one partition and survives its local cut), and the final merge works
    on ≤ k rows per (group, partition) — aggregate-sized.  Null group or
    text rows and empty terms are excluded.
    """

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        grp = batch.column(group_col).combine_chunks()
        keep = pc.and_(txt.is_valid(), grp.is_valid())
        txt, grp = txt.filter(keep), grp.filter(keep)
        lst = pc.split_pattern_regex(pc.utf8_lower(txt), pattern)
        flat = pc.list_flatten(lst)
        parent = pc.list_parent_indices(lst)
        ok = pc.not_equal(flat, "")
        flat, parent = flat.filter(ok), parent.filter(ok)
        t = (
            pa.table({group_col: grp.take(parent), "term": flat})
            .group_by([group_col, "term"])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, "term", "n"])
        )
        t = t.set_column(2, "n", t.column("n").cast(pa.int64()))
        mix = stable_hash_array(t.column("term")) ^ stable_hash_array(
            t.column(group_col)
        )
        parts = (mix % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def local_topk(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by([group_col, "term"])
            .aggregate([("n", "sum")])
            .rename_columns([group_col, "term", "n"])
        )
        order = pc.sort_indices(
            g,
            sort_keys=[
                (group_col, "ascending"),
                ("n", "descending"),
                ("term", "ascending"),
            ],
        )
        g = g.take(order)
        keys = g.column(group_col).combine_chunks()
        ngrp = g.num_rows
        start = np.ones(ngrp, dtype=bool)
        if ngrp > 1:
            eq = pc.equal(keys.slice(1), keys.slice(0, ngrp - 1))
            start[1:] = np.invert(
                pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
            )
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        pos = np.arange(ngrp, dtype=np.int64) - si[seg_id]
        return g.filter(pa.array(pos < k))

    def final(batch: pa.Table) -> pa.Table:
        return local_topk(batch.append_column(
            "_part", pa.array(np.zeros(batch.num_rows, dtype=np.int64))
        ))

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def type_token_ratio_by_group(
    ds,
    *,
    group_col: str = "source",
    text_col: str = "text",
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Lexical diversity (type–token ratio) per group: distinct terms /
    total terms — the corpus-quality staple that separates templated or
    repetitive sources from diverse ones.

    Shape: per batch, tokens collapse to (group, term, n) via Arrow
    group-by (the exchange carries one row per distinct pair per batch,
    never per token); ONE hash exchange keyed on term co-locates every
    occurrence of a pair; the partition-level final re-distincts pairs
    and emits aggregate-sized (group, types, tokens) partials that fold
    driver-side into ``ttr = types / tokens`` — a single IEEE division of
    two exact integers, so the result hash-matches SQL bit-for-bit.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        g = g.combine_chunks() if isinstance(g, pa.ChunkedArray) else g
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        t = pa.table({"g": g.take(parents), "term": flat})
        t = t.filter(
            pc.and_(
                pc.not_equal(t.column("term"), ""),
                t.column("g").combine_chunks().is_valid(),
            )
        )
        agg = (
            t.group_by(["g", "term"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["g", "term", "n"])
        )
        part = (
            stable_hash_array(agg.column("term")) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "g": agg.column("g"),
                "term": agg.column("term"),
                "n": agg.column("n").cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def per_part(group: pa.Table) -> pa.Table:
        pairs = (
            group.drop_columns(["_part"])
            .group_by(["g", "term"], use_threads=False)
            .aggregate([("n", "sum")])
            .rename_columns(["g", "term", "n"])
        )
        out = (
            pairs.group_by("g", use_threads=False)
            .aggregate([([], "count_all"), ("n", "sum")])
            .rename_columns(["g", "types", "tokens"])
        )
        return pa.table(
            {
                "g": out.column("g"),
                "types": out.column("types").cast(pa.int64()),
                "tokens": out.column("tokens").cast(pa.int64()),
            }
        )

    partials = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
    )
    chunks = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    chunks = [c for c in chunks if c.num_rows]
    if not chunks:
        return pa.table(
            {
                group_col: pa.array([], type=pa.string()),
                "n_types": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "ttr": pa.array([], type=pa.float64()),
            }
        )
    t = pa.concat_tables(chunks, promote_options="permissive")
    agg = (
        t.group_by("g", use_threads=False)
        .aggregate([("types", "sum"), ("tokens", "sum")])
        .rename_columns(["g", "n_types", "n_tokens"])
    )
    types = agg.column("n_types").to_numpy(zero_copy_only=False)
    tokens = agg.column("n_tokens").to_numpy(zero_copy_only=False)
    ttr = types.astype(np.float64) / tokens.astype(np.float64)
    return pa.table(
        {
            group_col: agg.column("g"),
            "n_types": agg.column("n_types").cast(pa.int64()),
            "n_tokens": agg.column("n_tokens").cast(pa.int64()),
            "ttr": pa.array(ttr, type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate-window profiling (corpus-internal dedup signal)
# ---------------------------------------------------------------------------

_DUPWIN_EMPTY_FLAGGED = pa.table(
    {
        "id": pa.array([], type=pa.int64()),
        "dup": pa.array([], type=pa.int8()),
        "_pi": pa.array([], type=pa.int64()),
    }
)
_DUPWIN_EMPTY_RESULT = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "n_windows": pa.array([], type=pa.int64()),
        "n_dup_windows": pa.array([], type=pa.int64()),
        "dup_frac": pa.array([], type=pa.float64()),
    }
)


def dup_window_stats(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_k: int = 5,
    num_partitions: int = 64,
):
    """Per-document cross-corpus duplicate-window profile: for each doc,
    how many of its DISTINCT word-``window_k``-gram windows also occur in
    at least one OTHER document, and the duplicated fraction.

    The corpus-internal counterpart of ``decontaminate`` (which checks
    windows against an external benchmark set) and the document-level
    signal behind substring-dedup policies (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22): a doc whose
    windows are mostly shared verbatim with other docs is boilerplate or
    a near-copy even when no single pair crosses a Jaccard threshold.

    Shape: distinct ``(window_hash, doc)`` postings (vectorized rolling
    combine, reused from the similarity-join tokenizer) → ONE hash
    exchange on window hash (per-window distinct-doc count ``df``; a
    window is duplicated iff ``df ≥ 2``) → ONE hash exchange of
    ``(doc, flag)`` pairs → per-doc integer fold.  Text never rides an
    exchange; ``dup_frac`` is a single IEEE division of two exact ints
    (hash-safe vs SQL).  Docs with fewer than ``window_k`` words have no
    windows and are excluded, matching the SQL oracle.
    """
    from .linkage import _simjoin_token_postings

    P = num_partitions

    def flag_dups(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _DUPWIN_EMPTY_FLAGGED
        wh = group.column("wh").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        ids = group.column("id").to_numpy(zero_copy_only=False)
        order = np.argsort(wh, kind="stable")
        wh, ids = wh[order], ids[order]
        new_seg = np.concatenate(([True], wh[1:] != wh[:-1]))
        seg_start = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(seg_start, len(wh)))
        dup = (seg_len >= 2)[np.cumsum(new_seg) - 1]
        return pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "dup": pa.array(dup.astype(np.int8)),
                "_pi": pa.array(ids % np.int64(P)),
            }
        )

    def per_doc(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _DUPWIN_EMPTY_RESULT
        g = group.group_by("id", use_threads=False).aggregate(
            [([], "count_all"), ("dup", "sum")]
        ).rename_columns(["doc_id", "n_windows", "n_dup_windows"])
        n = g.column("n_windows").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        d = g.column("n_dup_windows").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "n_windows": pa.array(n),
                "n_dup_windows": pa.array(d),
                "dup_frac": pa.array(d / n, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(
            lambda b: _simjoin_token_postings(
                b, text_col, id_col, P, window_k
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("_pw")
        .map_groups(flag_dups, batch_format="pyarrow")
        .groupby("_pi")
        .map_groups(per_doc, batch_format="pyarrow")
    )


def doc_lm_score(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 50_000,
    scale: int = 1_000_000,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Bigram-LM cross-entropy proxy per document — the CCNet/KenLM-style
    corpus-LM quality-filter stage, made integer-EXACT so it is
    hash-checkable against SQL (libm ``ln`` differs across engines, so the
    usual Σ −log p is not oracle-safe; the monotone integer surrogate
    ``Σ floor(scale·c(w1 w2)/c(w1))`` over matched bigrams ranks documents
    identically for filtering purposes).

    Phase 1 (model build, bounded exchanges): corpus-wide bigram counts →
    exact global top-``top_k`` (count DESC, gram ASC — the deterministic
    cutoff); unigram counts filtered to the winners' LEFT tokens (≤ top_k
    rows collected, never the vocabulary).  Phase 2 (scoring): the
    (gram → score) table broadcasts via ``ray.put`` and every batch scores
    zero-exchange with one Arrow hash ``index_in`` + int64 segment sums.

    ``ds`` should be a source read (it is executed three times: bigram
    counts, unigram counts, scoring);
    output = one row per document with ≥1 bigram: ``(doc_id, n_bigrams,
    n_matched, lm_score)``, all int64.  ``scale·c2`` must stay < 2⁶³:
    at 1e12 corpus bigrams keep ``scale`` ≤ 1e6.
    """

    def _bigrams(batch: pa.Table):
        """(grams, parent_row) with adjacency in the FILTERED token
        sequence — identical construction to top_ngrams/top_bigrams."""
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        m = len(flat)
        if m >= 2:
            starts = np.nonzero(parents[: m - 1] == parents[1:])[0]
        else:
            starts = np.array([], dtype=np.int64)
        if len(starts):
            grams = pc.binary_join_element_wise(
                flat.take(pa.array(starts)),
                flat.take(pa.array(starts + 1)),
                " ",
            )
            rows = parents[starts]
        else:
            grams = pa.array([], type=pa.string())
            rows = np.array([], dtype=np.int64)
        return grams, rows, flat, parents

    # -- phase 1a: exact global top-k bigrams ------------------------------
    top = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in top_ngrams(
            ds, text_col=text_col, n=2, k=top_k, pattern=pattern,
            num_partitions=num_partitions,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    grams_k = top.column("gram").combine_chunks()
    c2 = top.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    left_tok = pc.list_element(pc.split_pattern(grams_k, " "), 0)

    # -- phase 1b: unigram counts of the winners' left tokens --------------
    left_set_ref = ray.put(pc.unique(left_tok))

    def uni_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        lset = _ray.get(left_set_ref)
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.is_in(flat, value_set=lset))
        vc = pc.value_counts(flat)
        terms, counts = vc.field(0), vc.field(1)
        part = (
            stable_hash_array(terms) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "tok": terms,
                "cnt": counts.cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def uni_sum(group: pa.Table) -> pa.Table:
        g = group.group_by("tok", use_threads=False).aggregate([("cnt", "sum")])
        return pa.table({"tok": g.column("tok"), "cnt": g.column("cnt_sum")})

    uni = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in ds.map_batches(
            uni_partial, batch_format="pyarrow", batch_size=None
        )
        .groupby("_part")
        .map_groups(uni_sum, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    # driver-side join (≤ top_k rows each side): score = (scale·c2)//c1
    idx = pc.index_in(left_tok, value_set=uni.column("tok").combine_chunks())
    c1 = (
        uni.column("cnt")
        .combine_chunks()
        .take(idx)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    score = (np.int64(scale) * c2) // c1
    grams_ref = ray.put(grams_k)
    score_ref = ray.put(score)

    # -- phase 2: zero-exchange scoring ------------------------------------
    def score_batch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        gk = _ray.get(grams_ref)
        sc = _ray.get(score_ref)
        grams, rows, _flat, _parents = _bigrams(batch)
        n = batch.num_rows
        hit = pc.index_in(grams, value_set=gk)
        hit_np = hit.to_numpy(zero_copy_only=False)  # float64 w/ NaN misses
        matched = ~np.isnan(hit_np)
        n_big = np.bincount(rows, minlength=n).astype(np.int64)
        n_match = np.bincount(
            rows[matched], minlength=n
        ).astype(np.int64)
        sums = np.zeros(n, dtype=np.int64)
        if matched.any():
            np.add.at(
                sums, rows[matched],
                sc[hit_np[matched].astype(np.int64)],
            )
        keep = n_big > 0
        return pa.table(
            {
                id_col: batch.column(id_col).filter(pa.array(keep)),
                "n_bigrams": pa.array(n_big[keep]),
                "n_matched": pa.array(n_match[keep]),
                "lm_score": pa.array(sums[keep]),
            }
        )

    return ds.map_batches(score_batch, batch_format="pyarrow", batch_size=None)


def cooccurrence_pmi(
    ds,
    *,
    text_col: str = "text",
    window: int = 3,
    vocab_k: int = 2000,
    min_count: int = 3,
    top_k: int = 500,
    scale: int = 1_000_000,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Windowed word co-occurrence with integer-exact PMI — the
    word2vec / GloVe / collocation-mining data-prep stage: ORDERED token
    pairs ``(w_i, w_j)`` with ``1 ≤ j−i ≤ window`` inside a document,
    restricted to the corpus top-``vocab_k`` vocabulary (the standard
    fixed-vocab co-occurrence matrix), counted corpus-wide; pairs with
    ``c_ab ≥ min_count`` score ``floor(scale·c_ab·N / (c_a·c_b))`` — the
    exp-free PMI surrogate (monotone in pointwise mutual information at
    fixed scale), kept in EXACT integer arithmetic so the top-``top_k``
    list (score DESC, pair ASC) is hash-identical to SQL (a float
    ``log`` ranking would drift across libm implementations).

    Shape: vocab top-k (one hash exchange, local top-k + tiny reduce) →
    broadcast (word → count) via ``ray.put`` → pair counting with
    per-batch ``value_counts`` pre-reduce (ONE pair exchange, vocab-
    filtered so the key space is ≤ vocab_k²) → per-partition exact PMI +
    local top-k → tiny final reduce.  ``scale·c_ab·N`` must stay < 2⁶³
    (guarded): beyond ~1e12 tokens lower ``scale``.
    """
    top = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in top_terms(
            ds, text_col=text_col, k=vocab_k, pattern=pattern,
            num_partitions=num_partitions,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vocab = top.column("term").combine_chunks()
    vocab_counts = (
        top.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    def _tok_count(b: pa.Table) -> pa.Table:
        # ONE split per batch: total list length minus empty tokens
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b.column(text_col).combine_chunks()), pattern
        )
        total = int(pc.sum(pc.list_value_length(toks)).as_py() or 0)
        empties = int(
            pc.sum(
                pc.cast(pc.equal(pc.list_flatten(toks), ""), pa.int64())
            ).as_py()
            or 0
        )
        return pa.table({"c": pa.array([total - empties], type=pa.int64())})

    n_total = sum(
        r["c"]
        for r in ds.map_batches(
            _tok_count, batch_format="pyarrow", batch_size=None
        ).take_all()
    )
    if scale * n_total >= (1 << 62):
        raise RuntimeError(
            f"cooccurrence_pmi: scale*N = {scale * n_total} risks int64 "
            "overflow in the PMI numerator; lower scale"
        )
    vocab_ref = ray.put((vocab, vocab_counts))

    def pair_partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        v, _vc = _ray.get(vocab_ref)
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        in_v = pc.is_in(flat, value_set=v).to_numpy(zero_copy_only=False)
        m = len(flat)
        pieces = []
        for d in range(1, window + 1):
            if m <= d:
                break
            ok = (
                (parents[: m - d] == parents[d:])
                & in_v[: m - d]
                & in_v[d:]
            )
            starts = np.nonzero(ok)[0]
            if len(starts):
                pieces.append(
                    pc.binary_join_element_wise(
                        flat.take(pa.array(starts)),
                        flat.take(pa.array(starts + d)),
                        " ",
                    )
                )
        if pieces:
            pairs = pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in pieces]
            )
            vc2 = pc.value_counts(pairs)
            keys, counts = vc2.field(0), vc2.field(1)
        else:
            keys = pa.array([], type=pa.string())
            counts = pa.array([], type=pa.int64())
        part = (
            stable_hash_array(keys) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table(
            {
                "pair": keys,
                "c_ab": counts.cast(pa.int64()),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    N = np.int64(n_total)

    def local_pmi_topk(group: pa.Table) -> pa.Table:
        import ray as _ray

        v, vc = _ray.get(vocab_ref)
        g = group.group_by("pair", use_threads=False).aggregate(
            [("c_ab", "sum")]
        )
        pairs = g.column("pair").combine_chunks()
        c_ab = (
            g.column("c_ab_sum").to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ok = c_ab >= min_count
        pairs = pairs.filter(pa.array(ok))
        c_ab = c_ab[ok]
        if len(c_ab) == 0:
            return pa.table({
                "w1": pa.array([], type=pa.string()),
                "w2": pa.array([], type=pa.string()),
                "c_ab": pa.array([], type=pa.int64()),
                "pmi_scaled": pa.array([], type=pa.int64()),
            })
        split = pc.split_pattern(pairs, " ")
        w1 = pc.list_element(split, 0)
        w2 = pc.list_element(split, 1)
        ca = vc[pc.index_in(w1, value_set=v).to_numpy(zero_copy_only=False)
                .astype(np.int64)]
        cb = vc[pc.index_in(w2, value_set=v).to_numpy(zero_copy_only=False)
                .astype(np.int64)]
        # the fast path must bound BOTH products: the numerator
        # scale*c_ab*N and the denominator ca*cb (two hot vocabulary
        # words can push ca*cb past 2^63 long before the numerator hits)
        if (
            float(scale) * float(c_ab.max()) * float(N) < float(1 << 62)
            and float(ca.max()) * float(cb.max()) < float(1 << 62)
        ):
            pmi = (np.int64(scale) * c_ab * N) // (ca * cb)
        else:
            # numerator exceeds int64: exact Python-int fallback (row count
            # here is bounded by the min_count filter + local top-k input)
            pmi = np.fromiter(
                (
                    (scale * int(a) * int(N)) // (int(x) * int(y))
                    for a, x, y in zip(c_ab, ca, cb)
                ),
                dtype=np.int64,
                count=len(c_ab),
            )
        t = pa.table({
            "w1": w1, "w2": w2,
            "c_ab": pa.array(c_ab),
            "pmi_scaled": pa.array(pmi),
        })
        order = pc.sort_indices(t, sort_keys=[
            ("pmi_scaled", "descending"), ("w1", "ascending"),
            ("w2", "ascending"),
        ])
        return t.take(order[: min(top_k, t.num_rows)])

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        order = pc.sort_indices(batch, sort_keys=[
            ("pmi_scaled", "descending"), ("w1", "ascending"),
            ("w2", "ascending"),
        ])
        return batch.take(order[: min(top_k, batch.num_rows)])

    return (
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(local_pmi_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


SPLIT_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32·φ⁻¹)


def split_assign_stats(
    ds,
    *,
    id_col: str = "doc_id",
    group_col: str = "source",
    weight_col: str = "n_chars",
    fractions: tuple = (0.8, 0.1, 0.1),
    names: tuple = ("train", "val", "test"),
):
    """Deterministic train/val/test split assignment + audit — the
    dataset-versioning staple: every row maps to a split by
    ``(id·2654435761) mod 2³²`` against cumulative fraction thresholds
    (Knuth multiplicative hashing — stable under reshuffles, resumable,
    and reproducible in ANY engine with 64-bit ints, which is what makes
    the oracle exact; uint64 wraparound equals mod 2⁶⁴ and
    2³² | 2⁶⁴, so the engine's wrapped product is mathematically the
    same residue SQL computes).  Output: one row per
    (group, split) with row count and summed weight — zero-exchange
    per-batch partials, one aggregate-sized final fold.
    """
    cuts = []
    acc = 0.0
    for f in fractions[:-1]:
        acc += f
        cuts.append(int(acc * (1 << 32)))
    cuts_np = np.array(cuts, dtype=np.uint64)

    def partial(batch: pa.Table) -> pa.Table:
        ids_arr = batch.column(id_col).combine_chunks()
        valid = pc.is_valid(ids_arr).to_numpy(zero_copy_only=False)
        ids = (
            pc.fill_null(ids_arr, 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if (ids < 0).any():
            # uint64 wraparound of a NEGATIVE product does NOT equal
            # SQL's signed % — refuse instead of silently diverging
            raise ValueError(
                "split_assign_stats requires non-negative ids"
            )
        h = (
            ids.astype(np.uint64) * np.uint64(SPLIT_KNUTH)
        ) % np.uint64(1 << 32)
        idx = np.searchsorted(cuts_np, h, side="right")
        # SQL CASE over a NULL product matches no WHEN -> ELSE branch
        idx[~valid] = len(names) - 1
        split = pa.array(np.array(names, dtype=object)[idx], type=pa.string())
        w = pc.fill_null(
            pc.cast(batch.column(weight_col), pa.int64()), 0
        )
        t = pa.table(
            {
                "grp": batch.column(group_col),
                "split": split,
                "n_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "weight": w,
            }
        )
        g = t.group_by(["grp", "split"], use_threads=False).aggregate(
            [("n_docs", "sum"), ("weight", "sum")]
        )
        return g.rename_columns(["grp", "split", "n_docs", "weight"])

    def final(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["grp", "split"], use_threads=False).aggregate(
            [("n_docs", "sum"), ("weight", "sum")]
        )
        return g.rename_columns(["grp", "split", "n_docs", "weight"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def excise_duplicate_spans(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_k: int = 20,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
    pos_limit: int = 1 << 20,
):
    """Cross-document EXACT substring dedup, keep-first (the Lee et al.
    2022 "Deduplicating Training Data" ExactSubstr technique at token-
    window granularity): any ``window_k``-token window occurring more
    than once in the corpus is excised from every occurrence EXCEPT the
    lexicographically first ``(doc_id, position)`` one; uncovered tokens
    are kept and docs are rebuilt.  Distinct from
    :func:`remove_frequent_segments` (line/segment granularity) and
    :func:`trim_repeated_spans` (WITHIN-doc repeats): this is the
    arbitrary-span cross-doc variant.

    Two exchanges: (1) gram occurrences ``(gram, doc·P+pos)`` hash-route
    by gram; per partition each gram's full occurrence set is local, so
    count + canonical-min select non-canonical duplicate occurrences —
    only DUPLICATED spans ride further; (2) excision spans tag-union
    with the docs on a doc-hash exchange, per-doc coverage via a
    vectorized diff array, token rebuild with list offsets.  Grams ride
    as strings for oracle-exact identity (hash keys would admit
    collisions); positions are 1-based and must stay < ``pos_limit``
    (asserted) so ``doc_id·pos_limit + pos`` is the lexicographic
    (doc, pos) order in one int64.

    Output: ``(doc_id, text_clean, n_tokens, n_removed)`` for every doc
    with non-null text (``text_clean`` may be '').  ``ds`` is consumed
    TWICE (gram pass + doc pass) — materialize a DERIVED input first,
    exactly as :func:`trim_repeated_spans` documents, or the upstream
    pipeline executes twice (and a nondeterministic upstream would
    desynchronize spans from docs).  ``id_col`` must be non-null
    (checked): a null id has no (doc, pos) identity.
    """
    P = np.int64(pos_limit)

    def _tok(batch: pa.Table):
        arr = batch.column(text_col)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n_rows = batch.num_rows
        seg_starts = np.searchsorted(parents, np.arange(n_rows), "left")
        pos = np.arange(len(parents), dtype=np.int64) - seg_starts[parents] + 1
        return flat, parents, pos, seg_starts

    def _ids(batch: pa.Table) -> np.ndarray:
        col = batch.column(id_col).combine_chunks()
        if col.null_count:
            # a null id has no (doc, pos) identity — and the nullable-
            # int -> float64 numpy path would silently misroute (the
            # CLAUDE.md stable-hash trap)
            raise ValueError(
                "excise_duplicate_spans: null values in id column"
            )
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    def gram_occurrences(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            batch.column(text_col).combine_chunks().is_valid()
        )
        flat, parents, pos, _ = _tok(batch)
        ids = _ids(batch)
        m = len(flat)
        if m >= window_k:
            ok = parents[: m - window_k + 1] == parents[window_k - 1:]
            starts = np.nonzero(ok)[0]
        else:
            starts = np.array([], dtype=np.int64)
        if len(starts) == 0:
            return pa.table({
                "gram": pa.array([], type=pa.string()),
                "mkey": pa.array([], type=pa.int64()),
                "_part": pa.array([], type=pa.int64()),
            })
        if pos.max() >= pos_limit:
            raise RuntimeError(
                "excise_duplicate_spans: document exceeds pos_limit "
                f"({pos_limit}) tokens; raise pos_limit"
            )
        pieces = [flat.take(pa.array(starts + j)) for j in range(window_k)]
        grams = pc.binary_join_element_wise(*pieces, " ")
        mkey = ids[parents[starts]] * P + pos[starts]
        part = (
            stable_hash_array(grams) % np.uint64(num_partitions)
        ).astype(np.int64)
        return pa.table({
            "gram": grams,
            "mkey": pa.array(mkey, type=pa.int64()),
            "_part": pa.array(part, type=pa.int64()),
        })

    def dup_spans(group: pa.Table) -> pa.Table:
        g = group.group_by("gram", use_threads=False).aggregate(
            [("mkey", "count"), ("mkey", "min")]
        )
        g = g.rename_columns(["gram", "cnt", "mn"])
        grams = group.column("gram").combine_chunks()
        idx = pc.index_in(grams, value_set=g.column("gram").combine_chunks())
        idx_np = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)[idx_np]
        mn = g.column("mn").to_numpy(zero_copy_only=False)[idx_np]
        mkey = group.column("mkey").to_numpy(zero_copy_only=False)
        mask = (cnt >= 2) & (mkey != mn)
        mk = mkey[mask]
        doc = mk // P
        start = mk % P
        return pa.table({
            "doc_id": pa.array(doc, type=pa.int64()),
            "start": pa.array(start, type=pa.int64()),
            "_dp": pa.array(
                (doc.astype(np.uint64) % np.uint64(num_partitions))
                .astype(np.int64)
            ),
        })

    spans = (
        ds.map_batches(
            gram_occurrences, batch_format="pyarrow", batch_size=None
        )
        .groupby("_part")
        .map_groups(dup_spans, batch_format="pyarrow")
    )

    def tag_spans(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "start": b.column("start"),
            "text": pa.nulls(b.num_rows, type=pa.string()),
            "_side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "_dp": b.column("_dp"),
        })

    def tag_docs(b: pa.Table) -> pa.Table:
        b = b.filter(b.column(text_col).combine_chunks().is_valid())
        ids = _ids(b)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "start": pa.nulls(b.num_rows, type=pa.int64()),
            "text": b.column(text_col),
            "_side": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "_dp": pa.array(
                (ids.astype(np.uint64) % np.uint64(num_partitions))
                .astype(np.int64)
            ),
        })

    def excise(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        docs = group.filter(pa.array(side == 1))
        sp = group.filter(pa.array(side == 0))
        flat, parents, pos, seg_starts = _tok(
            pa.table({text_col: docs.column("text")})
        )
        n_docs = docs.num_rows
        ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        tok_counts = np.bincount(parents, minlength=n_docs)
        # coverage diff array over the flat token sequence
        diff = np.zeros(len(flat) + 1, dtype=np.int64)
        if sp.num_rows:
            sdoc = sp.column("doc_id").to_numpy(zero_copy_only=False)
            sstart = sp.column("start").to_numpy(zero_copy_only=False)
            # vectorized id -> row index (a Python dict loop here would
            # dominate on boilerplate-heavy corpora where span count
            # approaches token count)
            order = np.argsort(ids, kind="stable")
            srow = order[np.searchsorted(ids, sdoc, sorter=order)]
            a = seg_starts[srow] + sstart - 1
            b_ = np.minimum(
                a + window_k, seg_starts[srow] + tok_counts[srow]
            )
            np.add.at(diff, a, 1)
            np.add.at(diff, b_, -1)
        covered = np.cumsum(diff[:-1]) > 0
        keep = ~covered
        kept_counts = np.bincount(
            parents[keep], minlength=n_docs
        ).astype(np.int64)
        kept_flat = flat.filter(pa.array(keep))
        offs = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()),
            kept_flat.combine_chunks()
            if isinstance(kept_flat, pa.ChunkedArray)
            else kept_flat,
        )
        text_clean = pc.binary_join(lists, " ")
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text_clean": pc.cast(text_clean, pa.string()),
            "n_tokens": pa.array(tok_counts.astype(np.int64)),
            "n_removed": pa.array(
                tok_counts.astype(np.int64) - kept_counts
            ),
        })

    docs_env = ds.map_batches(
        tag_docs, batch_format="pyarrow", batch_size=None
    )
    spans_env = spans.map_batches(
        tag_spans, batch_format="pyarrow", batch_size=None
    )
    return (
        docs_env.union(spans_env)
        .groupby("_dp")
        .map_groups(excise, batch_format="pyarrow")
    )


def tokenize_ids(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_k: int = 1000,
    pattern: str = "[^a-z0-9]+",
    num_partitions: int = 32,
):
    """Tokenizer APPLY stage (the step between vocabulary induction and
    model training): map every token to its id in the corpus
    top-``vocab_k`` vocabulary — id = frequency rank, 1-based,
    (count DESC, term ASC) tie order, the deterministic cutoff — with
    OOV → id 0.  Output per doc: ``(doc_id, n_tokens, n_oov,
    ids_checksum)`` where ``ids_checksum = Σ position·id`` (1-based
    positions, exact int64) — the id sequence itself stays distributed
    (a list column would be the payload; the checksum is the
    hash-checkable witness that every position got the right id).

    One vocab build (top_terms' bounded exchange) + a broadcast of
    ``vocab_k`` (term → id) rows; scoring is zero-exchange Arrow
    ``index_in`` + int64 segment sums.  ``Σ pos·id`` stays < 2⁶³ for any
    document under ~3e9 tokens at vocab_k ≤ 1e6."""
    top = pa.concat_tables(
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in top_terms(
            ds, text_col=text_col, k=vocab_k, pattern=pattern,
            num_partitions=num_partitions,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vocab = top.column("term").combine_chunks()  # rank order already
    vocab_ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray

        v = _ray.get(vocab_ref)
        batch = batch.filter(
            batch.column(text_col).combine_chunks().is_valid()
        )
        arr = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(arr), pattern)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n = batch.num_rows
        idx = pc.index_in(flat, value_set=v).to_numpy(zero_copy_only=False)
        oov = np.isnan(idx)
        ids = np.where(oov, -1, idx).astype(np.int64) + 1  # OOV -> 0
        seg_starts = np.searchsorted(parents, np.arange(n), "left")
        pos = (
            np.arange(len(parents), dtype=np.int64)
            - seg_starts[parents] + 1
        )
        # parents is sorted -> segment-reduce, not unbuffered scatter-add
        # (np.add.reduceat is the repo's measured fast path); out-of-range
        # starts (trailing empty docs) are EXCLUDED, never clamped
        checksum = np.zeros(n, dtype=np.int64)
        valid_seg = seg_starts < len(parents)
        if valid_seg.any():
            checksum[valid_seg] = np.add.reduceat(
                pos * ids, seg_starts[valid_seg]
            )
        tok_counts = np.bincount(parents, minlength=n).astype(np.int64)
        checksum[tok_counts == 0] = 0
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(tok_counts),
            "n_oov": pa.array(
                np.bincount(
                    parents[oov], minlength=n
                ).astype(np.int64)
            ),
            "ids_checksum": pa.array(checksum),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def corpus_report(
    ds,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    pattern: str = "[^a-z0-9]+",
):
    """One-pass corpus datasheet (the dataset-card summary block): doc
    and non-null-text counts, total characters and tokens, distinct
    language/source counts — per-batch partials carry six numbers plus
    two distinct sets folded on the driver.  The distinct sets are
    O(domain cardinality): right for enum-like lang/source columns;
    point a HIGH-cardinality column (hosts, urls) at
    :func:`.ops.profile_columns` instead, whose hash-routed distinct
    counting stays distributed.  Returns a one-row Arrow table."""

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        n_text = int(pc.sum(pc.cast(txt.is_valid(), pa.int64())).as_py() or 0)
        chars = int(
            pc.sum(pc.utf8_length(pc.fill_null(txt, ""))).as_py() or 0
        )
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(txt, "")), pattern
        )
        flat = pc.list_flatten(toks)
        n_tok = int(
            pc.sum(
                pc.cast(pc.not_equal(flat, ""), pa.int64())
            ).as_py()
            or 0
        )
        langs = pc.unique(
            pc.drop_null(batch.column(lang_col).combine_chunks())
        ).to_pylist()
        sources = pc.unique(
            pc.drop_null(batch.column(source_col).combine_chunks())
        ).to_pylist()
        return pa.table({
            "n_docs": pa.array([batch.num_rows], type=pa.int64()),
            "n_with_text": pa.array([n_text], type=pa.int64()),
            "total_chars": pa.array([chars], type=pa.int64()),
            "total_tokens": pa.array([n_tok], type=pa.int64()),
            "langs": pa.array([langs], type=pa.list_(pa.string())),
            "sources": pa.array(
                [sources], type=pa.list_(pa.string())
            ),
        })

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    langs: set = set()
    sources: set = set()
    for r in parts:
        langs.update(r["langs"])
        sources.update(r["sources"])
    return pa.table({
        "n_docs": pa.array(
            [sum(r["n_docs"] for r in parts)], type=pa.int64()),
        "n_with_text": pa.array(
            [sum(r["n_with_text"] for r in parts)], type=pa.int64()),
        "total_chars": pa.array(
            [sum(r["total_chars"] for r in parts)], type=pa.int64()),
        "total_tokens": pa.array(
            [sum(r["total_tokens"] for r in parts)], type=pa.int64()),
        "distinct_langs": pa.array([len(langs)], type=pa.int64()),
        "distinct_sources": pa.array([len(sources)], type=pa.int64()),
    })
