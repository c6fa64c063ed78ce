"""Query-form relational operators over Datasets (no lake write).

These are the same semantics as the sync pipeline's merge stage (A1/A2), in
pure-Dataset form so they can run over any table — used by the driver's
correctness gate against DuckDB oracles, and reusable as library operators.

All of them follow the pre-aggregate-then-shuffle pattern: a vectorized
per-batch combiner inside ``map_batches`` first (LWW compact / hash-first
dedup are associative), then the hash-partition ``groupby`` over the much
smaller partials, so the all-to-all exchange moves one row per (key, batch)
instead of every input row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import partition_ids, stable_hash_array
from ..stages.lww import lww_compact

DEFAULT_NUM_PARTITIONS = 64


def _first_per_key(table: pa.Table, key: str, order: str) -> pa.Table:
    """Keep the min-``order`` row per key (vectorized sort + boundary mask)."""
    if table.num_rows == 0:
        return table
    idx = pc.sort_indices(
        table, sort_keys=[(key, "ascending"), (order, "ascending")]
    )
    t = table.take(idx)
    keys = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    first = np.empty(len(keys), dtype=bool)
    first[0] = True
    if len(keys) > 1:
        first[1:] = keys[1:] != keys[:-1]
    return t.filter(pa.array(first))


def lww_latest(
    ds,
    *,
    pk: str,
    ver: str,
    seq: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Latest row per key: max ``(ver, seq)`` — A1 as a query.

    DuckDB oracle shape::

        SELECT * FROM t QUALIFY
        row_number() OVER (PARTITION BY pk ORDER BY ver DESC, seq DESC) = 1
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = lww_compact(batch, pk, ver, seq)
        parts = partition_ids(batch.column(pk), num_partitions)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return lww_compact(group.drop_columns(["_part"]), pk, ver, seq)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def lww_latest_salted(
    ds,
    *,
    pk: str,
    ver: str,
    seq: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_factor: int = 8,
):
    """Hot-key-safe LWW latest: salted sub-partition pre-reduce, then the
    final per-key reduce (SURVEY.md §4 skew row; §7.7).

    Stage 1 routes by ``hash(pk) ^ salt`` where salt = ``seq % salt_factor``,
    so one hot key spreads over ``salt_factor`` sub-partitions, each of which
    LWW-compacts its share (safe: max-by-(ver, seq) is associative and
    commutative).  Stage 2 is the ordinary per-key reduce over the tiny
    survivor set.  Same oracle as :func:`lww_latest`.
    """

    def stage1(batch: pa.Table) -> pa.Table:
        batch = lww_compact(batch, pk, ver, seq)
        salt = (
            batch.column(seq).to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(salt_factor)
        )
        parts = partition_ids(
            batch.column(pk), num_partitions * salt_factor, salt=salt
        )
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def sub_reduce(group: pa.Table) -> pa.Table:
        return lww_compact(group.drop_columns(["_part"]), pk, ver, seq)

    def stage2(batch: pa.Table) -> pa.Table:
        parts = partition_ids(batch.column(pk), num_partitions)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return lww_compact(group.drop_columns(["_part"]), pk, ver, seq)

    return (
        ds.map_batches(stage1, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(sub_reduce, batch_format="pyarrow")
        .map_batches(stage2, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def lww_latest_with_tombstones(
    ds,
    *,
    pk: str,
    ver: str,
    seq: str,
    tombstone_col: str,
    tombstone_value,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """A1 + §2.7 delete handling as a query: latest row per key by
    ``(ver, seq)``, with rows whose winning version is a tombstone
    (``tombstone_col == tombstone_value``) suppressed from the output.

    DuckDB oracle shape::

        SELECT * FROM t QUALIFY
        row_number() OVER (PARTITION BY pk ORDER BY ver DESC, seq DESC) = 1
        AND tombstone_col <> tombstone_value
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = lww_compact(batch, pk, ver, seq)
        parts = partition_ids(batch.column(pk), num_partitions)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = lww_compact(group.drop_columns(["_part"]), pk, ver, seq)
        keep = pc.invert(
            pc.fill_null(pc.equal(g.column(tombstone_col), tombstone_value), False)
        )
        return g.filter(keep)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def text_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Integer text statistics per document: ``n_chars`` (UTF-8 codepoints),
    ``n_words`` (RE2 ``\\S+`` matches), ``n_tokens`` (BPE-ish pre-tokenizer
    matches).  RE2-based so a DuckDB ``regexp_extract_all`` oracle matches
    exactly."""
    from ..functions.text import BPE_ISH_PATTERN

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
                "n_words": pc.cast(
                    pc.count_substring_regex(texts, r"\S+"), pa.int64()
                ),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(texts, BPE_ISH_PATTERN), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def annotate_documents(ds, *, text_col: str = "text"):
    """Full text annotation over a document table: appends
    ``lang_id, quality, n_tokens, fingerprint`` (the CDC enrichment stage as
    a standalone operator).  Heuristic outputs — verified by rows-only checks
    and unit tests, not a SQL oracle."""
    from ..functions.text import enrich_text_columns

    return ds.map_batches(
        lambda b: enrich_text_columns(b, text_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def grouped_stats(
    ds,
    *,
    key: str,
    value_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Pre-aggregated groupby: per-batch partial aggregates (count +
    integer-cents sum + min/max) combined in a tiny final shuffle — the
    combiner pattern that keeps the exchange at O(groups × batches) rows.

    The value sum is computed in integer cents so results are exactly
    order-independent (float summation order would differ from a SQL engine).
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)), pa.int64()
        )
        batch = batch.select([key]).append_column("_cents", cents)
        g = batch.group_by(key).aggregate(
            [("_cents", "sum"), ("_cents", "count"), ("_cents", "min"), ("_cents", "max")]
        )
        return g

    def final(group: pa.Table) -> pa.Table:
        k = group.column(key)[0]
        return pa.table(
            {
                key: [k.as_py()],
                "n_events": pa.array(
                    [int(pc.sum(group.column("_cents_count")).as_py())],
                    type=pa.int64(),
                ),
                "value_cents": pa.array(
                    [int(pc.sum(group.column("_cents_sum")).as_py())],
                    type=pa.int64(),
                ),
                "min_cents": pa.array(
                    [int(pc.min(group.column("_cents_min")).as_py())],
                    type=pa.int64(),
                ),
                "max_cents": pa.array(
                    [int(pc.max(group.column("_cents_max")).as_py())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def daily_counts(ds, *, ts_col: str = "ts"):
    """Events per day: truncate-to-day + pre-aggregated count."""

    def partial(batch: pa.Table) -> pa.Table:
        # date32, matching SQL date_trunc('day', ts)'s DATE result type
        day = pc.cast(
            pc.floor_temporal(batch.column(ts_col), unit="day"), pa.date32()
        )
        t = pa.table({"event_day": day})
        return t.group_by("event_day").aggregate([("event_day", "count")])

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_day": [group.column("event_day")[0].as_py()],
                "n_events": pa.array(
                    [int(pc.sum(group.column("event_day_count")).as_py())],
                    type=pa.int64(),
                ),
            },
            schema=pa.schema(
                [
                    pa.field("event_day", group.schema.field("event_day").type),
                    pa.field("n_events", pa.int64()),
                ]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_day")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_count(
    ds,
    *,
    key: str,
    out_col: str = "n",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Plain COUNT(*) per key with the per-batch combiner (the exchange
    carries one row per (key, batch), never per input row).

    PARTITION-LEVEL final reduce (hash route + one vectorized Arrow
    group_by per partition) — a per-key ``map_groups`` costs one Python
    call per distinct key, the measured O(keys) trap on user/customer
    cardinality keys (see :func:`grouped_sum`).  Null keys survive as
    their own group (hash routing canonicalizes them)."""
    from ..functions.hashing import partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([key])
            .group_by(key)
            .aggregate([([], "count_all")])
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([("count_all", "sum")])
        )
        return pa.table(
            {
                key: g.column(key),
                out_col: g.column("count_all_sum").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def extract_json_int(
    ds,
    *,
    col: str,
    key: str,
    out_col: str,
):
    """Append a top-level integer JSON field as an int64 column — the
    telemetry-props extraction stage (``json_extract(col, '$.key')``),
    fully vectorized via Arrow's RE2 ``extract_regex`` (no per-row Python,
    no JSON DOM allocation).

    Envelope: FLAT objects with unquoted integer values (the common
    event-props shape).  Rows where the key is absent, non-integer, or the
    JSON is null extract as null.  A nested object that repeats the key
    name at depth would false-positive — route such payloads through a
    real JSON decoder stage instead.
    """
    import re as _re

    # capture the full numeric token, then accept only pure integers —
    # RE2 has no lookahead, and matching just -?\d+ would extract the
    # integer PREFIX of a fractional value (5.7 → 5) instead of null
    # (review regression)
    pattern = (
        '"' + _re.escape(key) + '"\\s*:\\s*(?P<v>-?\\d+(?:\\.\\d+)?(?:[eE][-+]?\\d+)?)'
    )

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            batch.column(col).combine_chunks(), pattern=pattern
        )
        tok = pc.struct_field(m, "v")
        is_int = pc.match_substring_regex(tok, r"^-?\d+$")
        v = pc.cast(
            pc.if_else(pc.fill_null(is_int, False), tok, None), pa.int64()
        )
        return batch.append_column(out_col, v)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def grouped_int_stats(
    ds,
    *,
    key: str,
    value_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key (count, sum, min, max) of an int64 column with SQL null
    semantics (nulls skipped; an all-null key yields count 0 and null
    sum/min/max) — per-batch partials, aggregate-sized exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select([key, value_col])
            .group_by(key)
            .aggregate(
                [
                    (value_col, "sum"),
                    (value_col, "count"),
                    (value_col, "min"),
                    (value_col, "max"),
                ]
            )
        )

    def final(group: pa.Table) -> pa.Table:
        n = int(pc.sum(group.column(f"{value_col}_count")).as_py() or 0)
        if n == 0:
            s = mn = mx = None
        else:
            s = int(pc.sum(group.column(f"{value_col}_sum")).as_py())
            mn = int(pc.min(group.column(f"{value_col}_min")).as_py())
            mx = int(pc.max(group.column(f"{value_col}_max")).as_py())
        return pa.table(
            {
                key: [group.column(key)[0].as_py()],
                "n_values": pa.array([n], type=pa.int64()),
                "sum_value": pa.array([s], type=pa.int64()),
                "min_value": pa.array([mn], type=pa.int64()),
                "max_value": pa.array([mx], type=pa.int64()),
            },
            schema=pa.schema(
                [
                    pa.field(key, group.schema.field(key).type),
                    pa.field("n_values", pa.int64()),
                    pa.field("sum_value", pa.int64()),
                    pa.field("min_value", pa.int64()),
                    pa.field("max_value", pa.int64()),
                ]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_sum(
    ds,
    *,
    key: str,
    value_col: str,
    out_col: str = "sum",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact int64 SUM(value_col) per key with the per-batch combiner —
    pair with an integer-cents prep map for order-independent money sums.

    PARTITION-LEVEL final reduce: partials route by ``hash(key) % P`` and
    each partition group_bys ALL its keys in one vectorized Arrow call —
    one Python task per partition, not per key (per-key ``map_groups`` is
    the hidden O(keys) driver cost at high cardinality: measured 5.1 s →
    sub-second on the 150k-key Q18 order aggregate at sf0.1)."""
    from ..functions.hashing import partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([key, value_col])
            .group_by(key)
            .aggregate([(value_col, "sum")])
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([(f"{value_col}_sum", "sum")])
        )
        return pa.table(
            {
                key: g.column(key),
                out_col: g.column(f"{value_col}_sum_sum").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def target_encode_by_key(
    ds,
    *,
    key: str,
    target_col: str,
    smoothing: int = 10,
    out_col: str = "te_value",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Smoothed target encoding (the standard categorical-feature trick
    for tabular ML): per key,
    ``te = (Σ_key + m·global_mean) / (n_key + m)``, evaluated as the
    EXACT rational ``(Σ_key·N + m·Σ_global) / (N·(n_key + m))`` over
    integer cents — one float division per key over exactly-represented
    int64 products, so a SQL oracle spelling the same expression is
    bit-identical (no composed float ops, no libm).

    ONE scan of the input: the per-(key, batch) combiner partials are
    materialized once (aggregate-sized — O(keys × batches) rows), the
    global prior ``(Σ, n)`` is folded driver-side FROM those partials
    (it is exactly their sum), and the same materialized partials feed
    the partition-keyed exchange with a vectorized finalize —
    O(partitions) Python calls.  A derived input pipeline therefore
    executes once, not twice (the measured double-execution trap).
    Null keys form their own group (SQL GROUP BY semantics); null
    targets are excluded pairwise.

    Envelope: ``Σ_key·N`` must fit int64 — at cents ≤ 10⁹ per row this
    bounds rows·N at ~9·10¹⁸; beyond that pre-scale to coarser units.
    """
    from ..functions.hashing import partition_ids

    def cents_col(batch: pa.Table):
        return pc.cast(
            pc.floor(pc.multiply(batch.column(target_col), 100.0)),
            pa.int64(),
        )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key), "_c": cents_col(batch)})
        t = t.filter(t.column("_c").combine_chunks().is_valid())
        g = t.group_by(key).aggregate([("_c", "sum"), ("_c", "count")])
        parts = partition_ids(g.column(key), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    # one scan: materialize the aggregate-sized combiner partials, fold
    # the global prior from them (it is exactly their sum), then exchange
    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).materialize()
    gsum = 0
    gn = 0
    for b in partials.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            s = pc.sum(b.column("_c_sum")).as_py()
            c = pc.sum(b.column("_c_count")).as_py()
            gsum += 0 if s is None else int(s)
            gn += 0 if c is None else int(c)
    if gn == 0:
        raise ValueError("target_encode_by_key: no non-null target values")
    m = int(smoothing)

    def final(group: pa.Table) -> pa.Table:
        import numpy as np

        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([("_c_sum", "sum"), ("_c_count", "sum")])
        )
        ksum = g.column("_c_sum_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        kn = g.column("_c_count_sum").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        num = (ksum * gn + m * gsum).astype(np.float64)
        den = (gn * (kn + m)).astype(np.float64)
        return pa.table(
            {
                key: g.column(key),
                "n": pa.array(kn),
                out_col: pa.array(num / den),
            }
        )

    return partials.groupby("_part").map_groups(
        final, batch_format="pyarrow"
    )


def grouped_corr(
    ds,
    *,
    key: str,
    x_col: str,
    y_col: str,
    out_col: str = "corr_xy",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Pearson correlation of two INTEGER columns per key, computed from
    exact integer partials (n, Σx, Σy, Σx², Σy², Σxy) so the shuffle is
    one row per (key, batch) and the combine is order-independent.

    The final float formula is evaluated in a fixed IEEE-754 operation
    order — ``(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx·Σx) · √(n·Σy² − Σy·Σy))``
    with every int64 converted to double first — so a SQL oracle spelling
    the identical expression over the identical integer sums produces the
    bit-identical double.  Zero variance on either side yields null (SQL
    ``corr`` semantics).  Rows with a null x or y are excluded pairwise.

    Envelope: int64 partial sums — Σx² bounds the usable scale at roughly
    ``rows · max(x)² < 2⁶³`` per key; beyond that, split keys by salt and
    combine (the partials are associative).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, x_col, y_col])
        valid = pc.and_(
            t.column(x_col).combine_chunks().is_valid(),
            t.column(y_col).combine_chunks().is_valid(),
        )
        t = t.filter(valid)
        x = pc.cast(t.column(x_col), pa.int64())
        y = pc.cast(t.column(y_col), pa.int64())
        t = pa.table(
            {
                key: t.column(key),
                "_x": x,
                "_y": y,
                "_xx": pc.multiply(x, x),
                "_yy": pc.multiply(y, y),
                "_xy": pc.multiply(x, y),
            }
        )
        return t.group_by(key).aggregate(
            [
                ("_x", "sum"),
                ("_y", "sum"),
                ("_xx", "sum"),
                ("_yy", "sum"),
                ("_xy", "sum"),
                ([], "count_all"),
            ]
        )

    def final(group: pa.Table) -> pa.Table:
        import math

        def tot(col: str) -> int:
            return int(pc.sum(group.column(col)).as_py())

        n = tot("count_all")
        sx, sy = tot("_x_sum"), tot("_y_sum")
        sxx, syy, sxy = tot("_xx_sum"), tot("_yy_sum"), tot("_xy_sum")
        fn = float(n)
        num = fn * float(sxy) - float(sx) * float(sy)
        dx = fn * float(sxx) - float(sx) * float(sx)
        dy = fn * float(syy) - float(sy) * float(sy)
        corr = (
            num / (math.sqrt(dx) * math.sqrt(dy))
            if dx > 0.0 and dy > 0.0
            else None
        )
        return pa.table(
            {
                key: [group.column(key)[0].as_py()],
                "n_pairs": pa.array([n], type=pa.int64()),
                out_col: pa.array([corr], type=pa.float64()),
            },
            schema=pa.schema(
                [
                    pa.field(key, group.schema.field(key).type),
                    pa.field("n_pairs", pa.int64()),
                    pa.field(out_col, pa.float64()),
                ]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def grouping_sets_counts(
    ds,
    *,
    keys: list[str],
    sets: list[tuple[bool, ...]],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """``GROUP BY GROUPING SETS`` row counts: one output row group per
    keep-mask in ``sets``, nulls marking the rolled-up positions (the SQL
    output shape; distinguishing a data null from a rollup null needs
    GROUPING(), which this operator does not model — use it over non-null
    key columns).

    Two exchanges, both over AGGREGATE-sized data after the per-batch
    combiner: (1) composite hash partition → exact finest-level counts,
    (2) each finest row re-emitted once per grouping set (masked columns
    nulled) → composite hash partition on (set, keys) → summed.  The
    second exchange moves ``|sets| × |finest groups|`` rows — independent
    of input row count, so rollup/cube cost the same as the plain groupby
    at any scale.
    """
    from ..functions.hashing import composite_partition_ids

    nk = len(keys)
    if nk == 0:
        raise ValueError("grouping_sets_counts needs at least one key")
    if not sets or any(len(m) != nk for m in sets):
        raise ValueError("each grouping set must be a mask over all keys")
    if len({tuple(m) for m in sets}) != len(sets):
        raise ValueError("duplicate grouping sets")

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        parts = composite_partition_ids(t, keys, num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def finest(group: pa.Table) -> pa.Table:
        t = (
            group.drop_columns(["_part"])
            .group_by(keys)
            .aggregate([("count_all", "sum")])
        )
        return t.select(keys + ["count_all_sum"]).rename_columns(keys + ["n"])

    def explode_sets(batch: pa.Table) -> pa.Table:
        pieces = []
        for si, mask in enumerate(sets):
            cols = {}
            for i, k in enumerate(keys):
                cols[k] = (
                    batch.column(k)
                    if mask[i]
                    else pa.nulls(batch.num_rows, batch.schema.field(k).type)
                )
            cols["_set"] = pa.array(
                np.full(batch.num_rows, si, dtype=np.int64)
            )
            cols["n"] = batch.column("n")
            pieces.append(pa.table(cols))
        t = pa.concat_tables(pieces)
        g = t.group_by(["_set"] + keys).aggregate([("n", "sum")])
        parts = composite_partition_ids(g, ["_set"] + keys, num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def set_totals(group: pa.Table) -> pa.Table:
        t = (
            group.drop_columns(["_part"])
            .group_by(["_set"] + keys)
            .aggregate([("n_sum", "sum")])
        )
        return t.select(keys + ["n_sum_sum"]).rename_columns(keys + ["n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(finest, batch_format="pyarrow")
        .map_batches(explode_sets, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(set_totals, batch_format="pyarrow")
    )


def rollup_counts(
    ds,
    *,
    keys: list[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """``GROUP BY ROLLUP(keys…)`` — the prefix grouping sets."""
    nk = len(keys)
    sets = [
        tuple(i < lvl for i in range(nk)) for lvl in range(nk, -1, -1)
    ]
    return grouping_sets_counts(
        ds, keys=keys, sets=sets, num_partitions=num_partitions
    )


def cube_counts(
    ds,
    *,
    keys: list[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """``GROUP BY CUBE(keys…)`` — every subset of the key list (2^k
    grouping sets; the second exchange stays aggregate-sized)."""
    import itertools

    sets = list(itertools.product((True, False), repeat=len(keys)))
    return grouping_sets_counts(
        ds, keys=keys, sets=sets, num_partitions=num_partitions
    )


def pivot_counts(
    ds,
    *,
    row_key: str,
    col_key: str,
    col_values: list[str],
    prefix: str = "n_",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Pivot row counts into one column per ``col_key`` value (the
    ``count(*) FILTER (WHERE col_key = v)`` wide form).  ``col_values`` is
    the explicit, closed column list — values outside it are dropped, so
    the output schema is static (a pivot with open-ended columns is a
    schema inference problem, not a data-parallel one).

    One exchange: per-batch (row_key, col_key) partial counts, hash
    partition on row_key, per-group scatter into the fixed columns.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([row_key, col_key])
        t = t.group_by([row_key, col_key]).aggregate([([], "count_all")])
        return t

    def final(group: pa.Table) -> pa.Table:
        rk = group.column(row_key)[0]
        cv = group.column(col_key).to_numpy(zero_copy_only=False)
        cnt = group.column("count_all").to_numpy(zero_copy_only=False)
        cols = {row_key: [rk.as_py()]}
        for v in col_values:
            m = cv == v
            cols[f"{prefix}{v}"] = pa.array(
                [int(cnt[m].sum())], type=pa.int64()
            )
        return pa.table(
            cols,
            schema=pa.schema(
                [pa.field(row_key, group.schema.field(row_key).type)]
                + [pa.field(f"{prefix}{v}", pa.int64()) for v in col_values]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(row_key)
        .map_groups(final, batch_format="pyarrow")
    )


def top_k_by(
    ds,
    *,
    by: str,
    k: int,
    tie_break: str,
    descending: bool = True,
):
    """Global top-k WITHOUT a global sort: each batch keeps its local top-k
    (vectorized partition-sort), a single tiny final reduce merges the
    per-batch survivors — the exchange moves k rows per batch, never the
    dataset.  Deterministic tie-break on ``tie_break``.

    DuckDB oracle shape::

        SELECT * FROM t ORDER BY by DESC, tie_break LIMIT k
    """
    order = "descending" if descending else "ascending"

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(
            batch, sort_keys=[(by, order), (tie_break, "ascending")]
        )
        return batch.take(idx[: min(k, batch.num_rows)])

    def final(batch: pa.Table) -> pa.Table:
        return local_topk(batch)

    # repartition(1) materializes only the tiny survivor set (≤ k per block)
    return (
        ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def quality_filter(ds, *, text_col: str = "text", min_quality: float = 0.5):
    """Keep documents whose heuristic quality score ≥ threshold — the
    canonical training-data filter stage (C4/Gopher-style)."""
    from ..functions.text import quality_score

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_score(batch.column(text_col))
        return batch.filter(
            pc.fill_null(pc.greater_equal(q, min_quality), False)
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def repetition_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style per-document repetition signals: line count, distinct
    line count, duplicate-line fraction (the boilerplate/spam signature in
    web-text filtering).  Vectorized line hashing; SQL-expressible counts
    so the DuckDB oracle hash-matches."""
    from ..functions.text import repetition_features

    def fn(batch: pa.Table) -> pa.Table:
        cols = {id_col: batch.column(id_col)}
        cols.update(repetition_features(batch.column(text_col)))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def redact_pii_documents(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """PII scrub stage (emails / IPv4 / phone numbers → tokens) + per-class
    match counts — the standard pre-training privacy pass, fully
    vectorized RE2 and SQL-oracle-checkable."""
    from ..functions.text import redact_pii

    def fn(batch: pa.Table) -> pa.Table:
        cols = {id_col: batch.column(id_col)}
        cols.update(redact_pii(batch.column(text_col)))
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def extract_html_text(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """HTML → text extraction round-trip over a document table (the
    north-star per-row invariant: byte-identical extracted text).

    Each batch synthesizes a full escaped page (head noise — title, style,
    script blocks with raw ``>`` inside — around the escaped body) from
    ``text_col``, casts it to binary (the lake's ``html`` payload type),
    and recovers the text with the byte-level extractor.  A correct
    extractor returns the ORIGINAL text byte-for-byte, so the oracle is the
    identity query — any tag-stripping, block-removal, or entity-decode
    defect breaks the value hash."""
    from ..functions.html import extract_text_html, wrap_html

    def fn(batch: pa.Table) -> pa.Table:
        html = wrap_html(batch.column(text_col)).cast(pa.binary())
        return pa.table(
            {id_col: batch.column(id_col), text_col: extract_text_html(html)}
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def quality_filter_exact(
    ds,
    *,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
):
    """Quality filter on INTEGER subscore ratios (C4/Gopher-style rules):
    word count in range, ≥60% alphabetic chars, ≤20% digits, ≥2% English
    stopword density.  Same spirit as :func:`quality_filter` but every
    predicate is integer arithmetic over SQL-expressible counts, so the
    whole filter is hash-verifiable against a DuckDB oracle (the scalar
    float score of :func:`quality_filter` is not — see ``quality_subscores``).
    Emits the surviving rows plus the subscore columns."""
    import numpy as np

    from ..functions.text import quality_subscores

    def fn(batch: pa.Table) -> pa.Table:
        sub = quality_subscores(batch.column(text_col))
        for name, arr in sub.items():
            batch = batch.append_column(name, arr)

        def np_of(name):
            return pc.fill_null(sub[name], -1).to_numpy(zero_copy_only=False)

        chars, words = np_of("qf_chars"), np_of("qf_words")
        alpha, digit, stop = np_of("qf_alpha"), np_of("qf_digit"), np_of("qf_stop")
        valid = chars >= 0  # null text → dropped
        keep = (
            valid
            & (words >= min_words)
            & (words <= max_words)
            & (5 * alpha >= 3 * chars)
            & (5 * digit <= chars)
            & (100 * stop >= 2 * words)
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def annotate_documents_exact(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
):
    """Annotation stage on INTEGER subscores: appends the SQL-expressible
    count features (chars / whitespace words / alpha / digit / stopword
    hits) plus two derived integer labels — ``quality_pass`` (the C4-style
    rule of :func:`quality_filter_exact`) and ``quality_class``
    (0 = fail, 1 = pass, 2 = pass and ≥50 words) — for EVERY row, no
    filtering.  Every output is integer/boolean arithmetic over counts a
    DuckDB oracle recomputes independently, so the whole annotator is
    hash-verified (the float-score annotator stays as
    :func:`annotate_documents`, pinned by unit tests)."""
    import numpy as np

    from ..functions.text import quality_subscores

    def fn(batch: pa.Table) -> pa.Table:
        sub = quality_subscores(batch.column(text_col))
        out = batch.select([id_col])
        for name, arr in sub.items():
            out = out.append_column(name, arr)

        def np_of(name):
            return pc.fill_null(sub[name], -1).to_numpy(zero_copy_only=False)

        chars, words = np_of("qf_chars"), np_of("qf_words")
        alpha, digit, stop = (
            np_of("qf_alpha"), np_of("qf_digit"), np_of("qf_stop"),
        )
        ok = (
            (chars >= 0)  # null text → fail
            & (words >= min_words)
            & (words <= max_words)
            & (5 * alpha >= 3 * chars)
            & (5 * digit <= chars)
            & (100 * stop >= 2 * words)
        )
        cls = ok.astype(np.int64) + (ok & (words >= 50)).astype(np.int64)
        out = out.append_column("quality_pass", pa.array(ok))
        out = out.append_column("quality_class", pa.array(cls))
        return out

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def grouped_quantiles(
    ds,
    *,
    key: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact per-group quantiles (linear interpolation, matching SQL
    ``quantile_cont``): one hash shuffle of ``(key, value)`` only — the
    payload never moves — then a vectorized per-group sort + interpolate.
    Exactness requires co-locating each group (same partitioning assumption
    as any keyed merge); the 100 TB approximate path is a mergeable t-digest
    in the same partial/combine shape as the HLL sketch."""

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch.column(key), value_col: batch.column(value_col)}
        )
        # SQL quantile_cont ignores null values; keeping them here would let
        # the rank interpolation land on the NaNs Arrow sorts to the end of
        # each key segment
        t = t.filter(t.column(value_col).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    qcols = [f"p{int(q * 100)}" for q in quantiles]

    def compute(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        t = g.take(idx)
        keys = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        starts = np.nonzero(start)[0]
        ends = np.append(starts[1:], n)
        out = {key: pa.array(keys[starts], type=t.schema.field(key).type)}
        for q, name in zip(quantiles, qcols):
            # linear interpolation at rank q*(len-1), vectorized over groups.
            # The fractional part must come from the group-RELATIVE rank —
            # adding the absolute start offset first loses float precision
            # for groups deep into a partition and diverges from SQL
            # quantile_cont (found by review repro at 64k-row offsets).
            rel = q * (ends - starts - 1)
            rel_lo = np.floor(rel)
            frac = rel - rel_lo
            lo = starts + rel_lo.astype(np.int64)
            hi = starts + np.ceil(rel).astype(np.int64)
            out[name] = pa.array(vals[lo] * (1 - frac) + vals[hi] * frac)
        return pa.table(out)

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(compute, batch_format="pyarrow")
    )


def distinct_values(
    ds,
    *,
    columns: list[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """DISTINCT projection at shuffle cost O(distinct tuples): per-batch
    dedup first (Arrow group_by), hash-partition by the tuple, final
    per-partition dedup."""
    from ..functions.hashing import composite_partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(columns).group_by(columns).aggregate([])
        parts = composite_partition_ids(t, columns, num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_part"]).group_by(columns).aggregate([])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def hash_sample(
    ds,
    *,
    key: str,
    percent: int,
    multiplier: int = 2654435761,
    modulus: int = 4_294_967_296,
):
    """Deterministic Bernoulli sample by key: keep rows where
    ``(key * multiplier) % modulus < modulus * percent / 100`` (Knuth
    multiplicative hash).  Purely per-batch — no shuffle, no RNG state —
    so the sample is identical on every replay, at any parallelism, and the
    oracle is plain SQL arithmetic.  The standard down-sampling stage for
    training-data pipelines where reproducibility matters more than
    statistical independence from the key distribution."""
    threshold = modulus * percent // 100

    def fn(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = (k * multiplier) % modulus
        return batch.filter(pa.array(bucket < threshold))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _per_key_rank_filter(
    batch: pa.Table, key: str, by: str, tie_break: str, k: int, order: str
) -> pa.Table:
    """Keep the top-k rows per key: one vectorized sort + run-position mask."""
    if batch.num_rows == 0:
        return batch
    idx = pc.sort_indices(
        batch,
        sort_keys=[(key, "ascending"), (by, order), (tie_break, "ascending")],
    )
    t = batch.take(idx)
    keys = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    n = len(keys)
    pos = np.arange(n, dtype=np.int64)
    start = np.zeros(n, dtype=bool)
    start[0] = True
    if n > 1:
        start[1:] = keys[1:] != keys[:-1]
    run_start = np.maximum.accumulate(np.where(start, pos, 0))
    return t.filter(pa.array(pos - run_start < k))


def weighted_sample_by_key(
    ds,
    *,
    key: str,
    id_col: str,
    percents: dict,
    default_percent: int = 0,
    multiplier: int = 2654435761,
    modulus: int = 4_294_967_296,
):
    """Deterministic data-mixture sampling: per-``key`` keep percentages
    (e.g. ``{"en": 80, "de": 50}``, everything else ``default_percent``),
    decided by the same Knuth multiplicative hash as :func:`hash_sample` —
    no RNG state, replay- and parallelism-invariant, plain-SQL oracle
    (CASE + integer arithmetic).  The standard mixture-reweighting stage of
    a training-data pipeline, as one shuffle-free ``map_batches``."""
    keys = list(percents)
    thresholds = np.array(
        [modulus * int(percents[k]) // 100 for k in keys], dtype=np.int64
    )
    default_thr = modulus * default_percent // 100
    key_set = pa.array(keys)

    def fn(batch: pa.Table) -> pa.Table:
        id_arr = batch.column(id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        # null ids are DROPPED (SQL: NULL < threshold is NULL → filtered);
        # fill_null before to_numpy so a nullable int column never takes
        # the float64/NaN path (the CLAUDE.md hashing trap)
        id_valid = id_arr.is_valid().to_numpy(zero_copy_only=False)
        ids = (
            pc.fill_null(id_arr.cast(pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
        )
        bucket = (ids * multiplier) % modulus
        idx = (
            pc.fill_null(pc.index_in(batch.column(key), value_set=key_set), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        thr = np.where(idx >= 0, thresholds[np.maximum(idx, 0)], default_thr)
        return batch.filter(pa.array((bucket < thr) & id_valid))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def grouped_top_k(
    ds,
    *,
    key: str,
    by: str,
    k: int,
    tie_break: str,
    descending: bool = True,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Top-k rows per key WITHOUT a global sort: each batch keeps its local
    per-key top-k (combiner — top-k under a total order is associative), the
    shuffle moves ≤ k rows per (key, batch), and the per-key reduce re-ranks
    the survivors.

    DuckDB oracle shape::

        SELECT * FROM t QUALIFY row_number() OVER (
            PARTITION BY key ORDER BY by DESC, tie_break) <= k
    """
    order = "descending" if descending else "ascending"

    def partial(batch: pa.Table) -> pa.Table:
        batch = _per_key_rank_filter(batch, key, by, tie_break, k, order)
        parts = partition_ids(batch.column(key), num_partitions)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return _per_key_rank_filter(
            group.drop_columns(["_part"]), key, by, tie_break, k, order
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def value_histogram(ds, *, col: str, bin_width: float):
    """Fixed-width histogram: per-batch bin-count partials, tiny final
    reduce — the building block for distribution profiling at scale (the
    exchange moves one row per (bin, batch))."""

    def partial(batch: pa.Table) -> pa.Table:
        bins = pc.cast(
            pc.floor(pc.divide(batch.column(col), bin_width)), pa.int64()
        )
        t = pa.table({"bin": bins})
        # count_all, not ("bin", "count"): a null input value bins to null,
        # and count skips nulls — the null bin would report 0 instead of
        # its row count (SQL count(*) semantics)
        return t.group_by("bin").aggregate([([], "count_all")])

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bin": [group.column("bin")[0].as_py()],
                "n_rows": pa.array(
                    [int(pc.sum(group.column("count_all")).as_py())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("bin")
        .map_groups(final, batch_format="pyarrow")
    )


def dedup_exact(
    ds,
    *,
    on: str,
    keep_by: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    hash_based: bool = True,
):
    """Exact dedup: keep the min-``keep_by`` row per distinct ``on`` value.

    The shuffle key is ``stable_hash(on)`` (64-bit), so wide payload strings
    are compared once per batch and the exchange routes by a fixed-width
    column — the hash-partition + per-group-first pattern.  Hash collisions
    are resolved inside the group by comparing the actual column.
    """
    hash_col = "_h"

    def partial(batch: pa.Table) -> pa.Table:
        h = stable_hash_array(batch.column(on))
        batch = batch.append_column(hash_col, pa.array(h, type=pa.uint64()))
        batch = _first_per_key(batch, hash_col if hash_based else on, keep_by)
        keys = batch.column(hash_col).to_numpy(zero_copy_only=False)
        parts = (keys % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        # dedup by actual value (collision-safe), then drop the hash column
        g = _first_per_key(g, on, keep_by)
        return g.drop_columns([hash_col])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def filter_above_quantile(
    ds,
    *,
    value_col: str,
    q: float = 0.5,
    delta: int = 8192,
):
    """Corpus-RELATIVE threshold filter: keep rows whose ``value_col`` is ≥
    the global ``q``-quantile of the column — "keep the top half by
    length/quality", the percentile-based cut training-data recipes use
    where absolute thresholds don't transfer across corpora.

    Two streaming passes, no shuffle: pass 1 reduces each batch to a
    mergeable q-digest (≤ 2·delta floats/batch — the values never leave
    their tasks) and merges the digests on the driver; pass 2 broadcast-
    filters on the scalar threshold.  The digest is exact-until-compression
    (``functions/sketches.qdigest_quantile``): corpora up to ``delta``
    values reproduce SQL ``quantile_cont`` bit-for-bit (how the oracle
    checks this), larger ones get the t-digest ~1/delta rank accuracy.
    Nulls are ignored for the quantile and dropped by the filter (SQL
    comparison-with-null semantics).
    """
    from ..functions.sketches import (
        qdigest_from_values,
        qdigest_merge,
        qdigest_pack,
        qdigest_quantile,
        qdigest_unpack,
    )

    def digest(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).combine_chunks().drop_null()
        vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
        d = qdigest_from_values(vals, delta)
        return pa.table({"d": pa.array([qdigest_pack(d)], type=pa.binary())})

    merged = None
    for b in ds.map_batches(
        digest, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("d").to_pylist():
            d = qdigest_unpack(buf)
            merged = d if merged is None else qdigest_merge(merged, d, delta)
    if merged is None or len(merged[0]) == 0:
        # no non-null values: nothing can compare ≥ the (undefined) quantile
        return ds.map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow", batch_size=None
        )
    threshold = float(qdigest_quantile(merged, q))

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        return batch.filter(
            pc.fill_null(pc.greater_equal(v, threshold), False)
        )

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def standardize_column(
    ds,
    *,
    value_col: str,
    keep_cols: tuple[str, ...] = (),
    out_col: str = "z",
):
    """Corpus-global z-score standardization of ``value_col`` — the
    two-pass normalize step of feature pipelines ("scale to zero mean /
    unit variance over the WHOLE corpus", not per batch).

    Pass 1 streams one row of exact integer partials per batch (n, Σcents,
    Σcents² — cents = ``floor(value·100)`` so the moments are
    order-independent); the driver merges them in arbitrary-precision
    Python ints and fixes mean/std in ONE IEEE evaluation order::

        mean = double(s1) / n
        var  = (double(s2) - double(s1)·double(s1)/n) / (n - 1)
        z    = (double(cents) - mean) / sqrt(var)

    Pass 2 broadcasts the two scalars inside the task closure and emits
    ``z`` vectorized — nulls propagate (SQL semantics: null value → null z,
    and nulls don't contribute to the moments).  The spelled-out SQL with
    the same association is bit-identical, which is what makes a
    whole-corpus float statistic hash-checkable.  Σcents² bounds the
    envelope: |cents| ≤ ~3·10⁴ over 10¹⁰ rows stays under 2⁶³ per batch;
    the driver-side merge is unbounded (Python ints).
    """
    import math

    def cents_of(batch: pa.Table):
        return pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)), pa.int64()
        ).combine_chunks()

    def moments(batch: pa.Table) -> pa.Table:
        c = cents_of(batch).drop_null().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(c)], type=pa.int64()),
                "s1": pa.array([int(c.sum())], type=pa.int64()),
                "s2": pa.array([int((c * c).sum())], type=pa.int64()),
            }
        )

    n, s1, s2 = 0, 0, 0
    for b in ds.map_batches(
        moments, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        n += sum(b.column("n").to_pylist())
        s1 += sum(b.column("s1").to_pylist())
        s2 += sum(b.column("s2").to_pylist())
    if n < 2:
        raise ValueError("standardize_column needs >= 2 non-null values")
    mean = float(s1) / n
    var = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
    std = math.sqrt(var)
    if std == 0.0:
        raise ValueError("zero variance: z-score undefined")

    def emit(batch: pa.Table) -> pa.Table:
        z = pc.divide(
            pc.subtract(pc.cast(cents_of(batch), pa.float64()), mean), std
        )
        cols = {c: batch.column(c) for c in keep_cols}
        cols[out_col] = z
        return pa.table(cols)

    return ds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def _mg_compress(values: pa.Array, counts: np.ndarray, k: int):
    """Misra–Gries summary compression: keep at most ``k`` counters by
    subtracting the (k+1)-th largest count from all (the batched form of
    the classic decrement-all step).  Each surviving estimate undercounts
    its true frequency by at most ``mass / (k + 1)``."""
    if len(counts) <= k:
        return values, counts
    kth = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    est = counts - kth
    keep = est > 0
    return values.filter(pa.array(keep)), est[keep]


def heavy_hitters(
    ds,
    *,
    col: str,
    phi_num: int,
    phi_den: int,
    k: int | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """EXACT heavy hitters: every value occurring in more than
    ``phi_num/phi_den`` of the rows, with its exact count — the classic
    two-pass distributed design (Misra–Gries candidates, then exact
    verification), so memory stays bounded at ANY cardinality while the
    answer stays oracle-exact:

    pass 1 — per-batch Misra–Gries(k) summaries (``k = 2·den/num`` by
      default) ride ONE hash exchange; each value's per-batch estimates
      all land in the same partition, whose merge is a true sum of the
      batch estimates followed by one more MG compression.  Per-batch
      deficit ≤ batch/(k+1) and per-partition deficit ≤ partition/(k+1),
      so any value with true frequency > 2n/(k+1) = phi·n survives —
      candidates are a SUPERSET of the heavy hitters, and there are at
      most ``num_partitions · k`` of them (bounded, collected + broadcast
      via ``ray.put``).
    pass 2 — a second streaming scan counts ONLY the candidate values
      exactly (broadcast membership filter + per-batch count partials on
      one aggregate-sized exchange) and keeps counts > phi·n.

    The input is scanned twice (both passes stream; neither materializes)
    plus one metadata-cheap ``count()`` for n.  Null values are not
    counted (SQL GROUP BY would keep a null group; a frequency filter on
    an ill-defined key is noise — documented policy, matched by the
    oracle's ``WHERE col IS NOT NULL``).
    """
    from .relational import semi_join

    # candidate-superset guarantee needs total MG deficit 2n/(k+1) < phi·n,
    # i.e. k+1 > 2·den/num — CLAMP an under-sized explicit k rather than
    # silently dropping true hitters (review finding: k=64 at phi=1/120
    # could zero out up to 115 qualifying keys)
    k_min = (2 * phi_den + phi_num - 1) // phi_num + 1
    if k is None:
        k = max(8, k_min)
    else:
        k = max(k, k_min)

    def valid_count(b: pa.Table) -> pa.Table:
        v = b.column(col)
        return pa.table(
            {"n": pa.array([len(v) - v.null_count], type=pa.int64())}
        )

    n_total = int(
        ds.map_batches(
            valid_count, batch_format="pyarrow", batch_size=None
        ).sum("n")
    )

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        c = c.drop_null()
        vc = c.value_counts()
        vals = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        vals, est = _mg_compress(vals, cnts, k)
        t = pa.table({col: vals, "_est": pa.array(est, type=pa.int64())})
        parts = partition_ids(t.column(col), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def merge(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        agg = g.group_by(col).aggregate([("_est", "sum")])
        vals = agg.column(col).combine_chunks()
        est = agg.column("_est_sum").to_numpy(zero_copy_only=False)
        vals, est = _mg_compress(vals, est, k)
        return pa.table({col: vals})

    candidates = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(merge, batch_format="pyarrow")
    )
    import ray

    cand_refs = candidates.to_arrow_refs()
    cand_tables = ray.get(cand_refs) if cand_refs else []
    cand_tables = [t for t in cand_tables if t.num_rows]
    if not cand_tables:
        sch = ds.schema()
        typ = dict(zip(sch.names, sch.types))[col]
        empty = pa.table(
            {
                col: pa.array([], type=typ),
                "n": pa.array([], type=pa.int64()),
            }
        )
        import ray.data

        return ray.data.from_arrow(empty)
    cand_vals = pa.concat_tables(
        [t.select([col]) for t in cand_tables]
    ).column(col).to_numpy(zero_copy_only=False)

    exact = grouped_count(
        semi_join(ds, cand_vals, on=col), key=col, out_col="n"
    )

    def threshold(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(batch.column("n").cast(pa.int64()), phi_den),
            phi_num * n_total,
        )
        return batch.filter(keep)

    return exact.map_batches(
        threshold, batch_format="pyarrow", batch_size=None
    )


def bucket_by_quantiles(
    ds,
    *,
    value_col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    out_col: str = "bucket",
    delta: int = 8192,
):
    """Equal-frequency binning: label every row with its corpus-relative
    bucket — ``1 + Σ_i [value > q_i]`` over the global quantile thresholds
    (quartiles by default).  The curriculum/stratification primitive
    ("short/medium/long docs by corpus percentile") where absolute cut
    points don't transfer between corpora.

    Same two-streaming-pass shape as :func:`filter_above_quantile`:
    mergeable q-digests to the driver (≤2·delta floats per batch), scalar
    thresholds broadcast, pass 2 is a pure per-batch comparison — no
    shuffle at any scale.  Exact-until-compression, so the SQL oracle
    (``1 + (v > quantile_cont(q1)) + …``) hash-matches on corpora up to
    ``delta`` values.  Null values get a null bucket.
    """
    from ..functions.sketches import (
        qdigest_from_values,
        qdigest_merge,
        qdigest_pack,
        qdigest_quantile,
        qdigest_unpack,
    )

    def digest(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).combine_chunks().drop_null()
        vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
        d = qdigest_from_values(vals, delta)
        return pa.table({"d": pa.array([qdigest_pack(d)], type=pa.binary())})

    merged = None
    for b in ds.map_batches(
        digest, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for buf in b.column("d").to_pylist():
            d = qdigest_unpack(buf)
            merged = d if merged is None else qdigest_merge(merged, d, delta)
    thresholds = (
        [float(qdigest_quantile(merged, q)) for q in quantiles]
        if merged is not None and len(merged[0])
        else None
    )

    def label(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if thresholds is None:
            bucket = pa.nulls(len(v), pa.int64())
        else:
            vals = v.to_numpy(zero_copy_only=False).astype(np.float64)
            b = np.ones(len(vals), dtype=np.int64)
            for t in thresholds:
                b += (vals > t).astype(np.int64)
            bucket = pa.array(b, type=pa.int64(), mask=~v.is_valid().to_numpy(
                zero_copy_only=False
            ))
        return batch.append_column(out_col, bucket)

    return ds.map_batches(label, batch_format="pyarrow", batch_size=None)


def standardize_by_key(
    ds,
    *,
    key: str,
    seq: str,
    value_col: str,
    out_col: str = "z",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """PER-KEY z-score standardization (the grouped sibling of
    :func:`standardize_column`) — "normalize each user's metric against
    that user's own history", the per-entity anomaly/feature-scaling
    primitive.

    ONE hash exchange of ``(key, seq, cents)``: partitioning by key
    co-locates each key's rows, so the per-partition segmented moments
    (exact int64 ``n, Σcents, Σcents²`` via ``np.add.reduceat``) ARE the
    global per-key moments — no second pass, no driver scalars.  The
    mean/std finalization uses the same fixed IEEE evaluation order as the
    global operator, so the spelled-out SQL is bit-identical.  Null values
    keep their row with a null z and contribute nothing to the moments;
    single-value keys get a null z (sample variance undefined).
    Envelope: per-key Σcents² must fit int64 — |cents| ≤ 3·10⁴ allows
    ~10¹⁰ rows per key.
    """

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)),
            pa.int64(),
        )
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                "_c": cents,
            }
        )
        # null keys dropped (SQL three-valued logic: a JOIN/GROUP on a
        # null key never matches; same policy as the other keyed kernels)
        t = t.filter(t.column(key).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def zscore(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    seq: g.column(seq),
                    key: g.column(key),
                    out_col: pa.array([], type=pa.float64()),
                }
            )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        c_arr = g.column("_c").combine_chunks()
        valid = c_arr.is_valid().to_numpy(zero_copy_only=False)
        c = pc.fill_null(c_arr, 0).to_numpy(zero_copy_only=False)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        cnt = np.add.reduceat(valid.astype(np.int64), si)
        s1 = np.add.reduceat(np.where(valid, c, 0), si)
        s2 = np.add.reduceat(np.where(valid, c * c, 0), si)
        # fixed IEEE order, identical to the global operator / SQL oracle
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1.astype(np.float64) / cnt
            var = (
                s2.astype(np.float64)
                - s1.astype(np.float64) * s1.astype(np.float64) / cnt
            ) / (cnt - 1)
            std = np.sqrt(var)
            z = (c.astype(np.float64) - mean[seg_id]) / std[seg_id]
        ok = valid & (cnt[seg_id] > 1)
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                out_col: pa.array(z, type=pa.float64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(zscore, batch_format="pyarrow")
    )


def exact_quantile_disc(
    ds,
    *,
    value_col: str,
    q: float,
    num_buckets: int = 4096,
    collect_cap: int = 65536,
):
    """EXACT discrete quantile (``quantile_disc`` — an actual element of
    the column, not an interpolation) at ANY corpus size with O(1) driver
    memory: iterative histogram selection.  Each round streams one
    column-pruned pass that bincounts the candidate set into
    ``num_buckets`` buckets (per-batch partials; the driver sees
    ``num_buckets`` ints), narrows to the bucket holding the target rank,
    and recurses — the candidate count shrinks ×``num_buckets`` per round,
    so a few passes suffice at any size.

    Candidate membership is a CHAIN of bucket constraints re-evaluated
    with bit-identical arithmetic each pass (never derived float interval
    bounds — boundary values must land in the same bucket they were
    counted in).  The terminal pass aggregates DISTINCT (value, count)
    partials, so a column where the answer value repeats billions of
    times terminates without collecting rows (the distinct set at
    terminal width spans ≤ 1 ulp).  Rank = ``ceil(q·n)−1`` (DuckDB
    ``quantile_disc`` semantics, pinned by test); nulls ignored.
    Comparison happens in float64 (int64 beyond 2⁵³ should use the
    integer-cents transform first).  The q-digest path
    (:func:`filter_above_quantile`) is the one-pass approximation; this
    is the exact sibling for when the answer must be an element.
    """

    def to_vals(batch: pa.Table) -> np.ndarray:
        v = batch.column(value_col).combine_chunks().drop_null()
        return v.to_numpy(zero_copy_only=False).astype(np.float64)

    # chain of (lo, width, j) constraints; membership = every round's
    # clipped floor((x - lo)/width) == j
    chain: list[tuple[float, float, int]] = []

    def member_mask(arr: np.ndarray) -> np.ndarray:
        mask = np.ones(len(arr), dtype=bool)
        for lo_c, w_c, j_c in chain:
            idx = np.clip(
                np.floor((arr - lo_c) / w_c).astype(np.int64),
                0,
                num_buckets - 1,
            )
            mask &= idx == j_c
        return mask

    def stats(batch: pa.Table) -> pa.Table:
        arr = to_vals(batch)
        if len(arr) == 0:
            return pa.table(
                {
                    "n": pa.array([0], type=pa.int64()),
                    "lo": pa.array([None], type=pa.float64()),
                    "hi": pa.array([None], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "n": pa.array([len(arr)], type=pa.int64()),
                "lo": pa.array([float(arr.min())]),
                "hi": pa.array([float(arr.max())]),
            }
        )

    st = pa.concat_tables(
        list(
            ds.map_batches(
                stats, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow")
        )
    )
    n = int(pc.sum(st.column("n")).as_py() or 0)
    if n == 0:
        return None
    lo = float(pc.min(st.column("lo")).as_py())
    hi = float(pc.max(st.column("hi")).as_py())
    # DuckDB quantile_disc picks the 0-based rank ceil(q·n)−1 (probed over
    # n∈{4..10⁴}, q∈{.05..0.9}; floor(q·(n−1)) coincides only when q·n is
    # integral — it diverged at e.g. n=1282, q=0.9)
    k = min(n - 1, max(0, int(np.ceil(q * n)) - 1))
    cnt = n

    def terminal() -> float:
        def distinct_counts(batch: pa.Table) -> pa.Table:
            arr = to_vals(batch)
            arr = arr[member_mask(arr)] if len(arr) else arr
            vals, counts = np.unique(arr, return_counts=True)
            return pa.table(
                {
                    "v": pa.array(vals, type=pa.float64()),
                    "c": pa.array(counts, type=pa.int64()),
                }
            )

        parts = pa.concat_tables(
            list(
                ds.map_batches(
                    distinct_counts, batch_format="pyarrow", batch_size=None
                ).iter_batches(batch_format="pyarrow")
            )
        )
        agg = parts.group_by("v").aggregate([("c", "sum")])
        order = pc.sort_indices(agg, sort_keys=[("v", "ascending")])
        agg = agg.take(order)
        cums = np.cumsum(agg.column("c_sum").to_numpy(zero_copy_only=False))
        pos = int(np.searchsorted(cums, k + 1))
        return float(agg.column("v")[pos].as_py())

    while True:
        if lo == hi or cnt <= collect_cap:
            return terminal()
        width = (hi - lo) / num_buckets
        if width <= 0 or not np.isfinite(width) or lo + width == lo:
            return terminal()  # interval at fp resolution: ≤2 distinct

        def hist(batch: pa.Table, lo=lo, width=width) -> pa.Table:
            arr = to_vals(batch)
            if len(arr):
                arr = arr[member_mask(arr)]
            idx = np.clip(
                np.floor((arr - lo) / width).astype(np.int64),
                0,
                num_buckets - 1,
            )
            counts = np.bincount(idx, minlength=num_buckets)
            nz = np.flatnonzero(counts)
            # sparse (bucket, count) rows: batch boundaries can re-slice
            # output rows, so counts must be self-describing
            return pa.table(
                {
                    "b": pa.array(nz, type=pa.int64()),
                    "c": pa.array(counts[nz], type=pa.int64()),
                }
            )

        total = np.zeros(num_buckets, dtype=np.int64)
        for b in ds.map_batches(
            hist, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            np.add.at(
                total,
                b.column("b").to_numpy(zero_copy_only=False),
                b.column("c").to_numpy(zero_copy_only=False),
            )
        cum = np.cumsum(total)
        j = int(np.searchsorted(cum, k + 1))
        k -= int(cum[j - 1]) if j > 0 else 0
        new_cnt = int(total[j])
        if new_cnt == cnt:
            # no progress (all candidates share one bucket): the constraint
            # still tightens the VALUE interval below, so loop converges
            pass
        chain.append((lo, width, j))
        cnt = new_cnt
        lo = lo + j * width
        hi = lo + width


def mode_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    out_col: str = "mode_value",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Most frequent value per key with a DETERMINISTIC tie-break
    (highest count, then smallest value) — SQL ``mode()`` leaves ties
    implementation-defined, so the oracle spells the same rule out with
    ``row_number() OVER (ORDER BY count DESC, value ASC)``.

    Exchange discipline: per-batch ``(key, value)`` pair counts (one row
    per distinct pair per batch), ONE hash exchange by key co-locating
    each key's pairs, vectorized per-partition sum + arg-max.  Null values
    don't count (SQL mode ignores nulls); null keys are dropped; keys with
    only null values emit nothing.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch.column(key), "_v": batch.column(value_col)}
        )
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_v").combine_chunks().is_valid(),
            )
        )
        g = t.group_by([key, "_v"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        parts = partition_ids(g.column(key), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"]).group_by(
            [key, "_v"], use_threads=False
        ).aggregate([("count_all", "sum")])
        idx = pc.sort_indices(
            g,
            sort_keys=[
                (key, "ascending"),
                ("count_all_sum", "descending"),
                ("_v", "ascending"),
            ],
        )
        g = g.take(idx)
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        n = len(keys)
        first = np.ones(n, dtype=bool)
        if n > 1:
            first[1:] = keys[1:] != keys[:-1]
        g = g.filter(pa.array(first))
        return pa.table(
            {
                key: g.column(key),
                out_col: g.column("_v"),
                "n": g.column("count_all_sum").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_mad(
    ds,
    *,
    key: str,
    value_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact per-key median absolute deviation (robust spread — the
    outlier-resistant sibling of the per-key stddev): ``median(|v −
    median(v)|)`` with SQL ``quantile_cont(0.5)`` interpolation semantics
    at both levels.

    ONE hash exchange of ``(key, value)`` (payload never moves); the
    per-partition kernel runs the segmented median twice — each a
    vectorized sort + group-relative rank interpolation, the same
    rank-from-segment-start arithmetic as :func:`grouped_quantiles` (the
    fractional part MUST come from the group-relative rank; absolute
    offsets lose float precision deep into a partition).  Null values are
    ignored (SQL aggregate semantics); keys with no non-null values emit
    nothing.
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch.column(key), "_v": batch.column(value_col)}
        )
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_v").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def _segment_median(
        keys: np.ndarray, vals: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(seg_starts, per-segment median, seg_id per row) over rows
        sorted by (key, value)."""
        n = len(keys)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        seg_len = np.diff(np.append(si, n))
        rel = 0.5 * (seg_len - 1)
        lo = si + np.floor(rel).astype(np.int64)
        hi = si + np.ceil(rel).astype(np.int64)
        frac = rel - np.floor(rel)
        med = vals[lo] * (1 - frac) + vals[hi] * frac
        return si, med, seg_id

    def mad(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_v", "ascending")]
        )
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    key: g.column(key),
                    "mad": pa.array([], type=pa.float64()),
                }
            )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        vals = (
            g.column("_v").combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        si, med, seg_id = _segment_median(keys, vals)
        dev = np.abs(vals - med[seg_id])
        # second median needs deviations sorted WITHIN each segment:
        # lexsort by (dev, segment) keeps segments contiguous in seg order
        order = np.lexsort((dev, seg_id))
        _, mad_vals, _ = _segment_median(seg_id[order], dev[order])
        key_arr = g.column(key).combine_chunks().take(pa.array(si))
        return pa.table(
            {
                key: key_arr,
                "mad": pa.array(mad_vals, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(mad, batch_format="pyarrow")
    )


def lww_partial_merge(
    ds,
    *,
    pk: str,
    ver: str,
    seq: str,
    patch_cols: list[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Column-level LWW merge of PARTIAL-update (patch) events — the CDC
    shape Debezium/ClickHouse call partial updates: an event sets only the
    columns it carries (non-null); null means "unchanged".  The merged row
    per key takes, for EACH patch column independently, the value of the
    latest event (by ``(ver, seq)``) where that column is non-null, plus
    the key's overall latest ``(ver, seq)``.  Row-level LWW would resurrect
    stale columns (the losing event's non-null columns vanish); this is the
    per-column generalization the reference's ReplacingMergeTree semantics
    cannot express.

    DuckDB oracle shape (IGNORE NULLS window)::

        SELECT DISTINCT pk,
          last_value(c IGNORE NULLS) OVER w AS c, ...,
          last_value(ver) OVER w AS ver, last_value(seq) OVER w AS seq
        FROM t WINDOW w AS (PARTITION BY pk ORDER BY ver, seq
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING)

    Two-stage, pre-reduced: per-column latest-non-null is associative, so
    each batch first compacts to the union of its per-column winner rows
    (≤ ``len(patch_cols) + 1`` rows per key per batch — rows stay rows, the
    schema never widens), then ONE hash exchange on ``pk`` and the same
    kernel per partition emits the merged row.  Null ``pk`` rows are
    dropped (SQL would emit a merged null-key row; a patch without identity
    has nothing to patch — documented divergence, matched by the oracle's
    ``WHERE pk IS NOT NULL``).
    """
    out_cols = [pk, *patch_cols, ver, seq]

    def _seg_last_valid(t: pa.Table):
        """Sort by (pk, ver, seq); per key segment return (sorted table,
        segment starts, per-patch-column index of the last non-null row,
        -1 when the key never set that column)."""
        idx = pc.sort_indices(
            t,
            sort_keys=[(pk, "ascending"), (ver, "ascending"), (seq, "ascending")],
        )
        s = t.take(idx)
        n = s.num_rows
        keys = s.column(pk).combine_chunks()
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = pc.not_equal(
                keys.slice(1), keys.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        seg_starts = np.nonzero(start)[0]
        pos = np.arange(n, dtype=np.int64)
        last = {}
        for c in patch_cols:
            valid = s.column(c).combine_chunks().is_valid().to_numpy(
                zero_copy_only=False
            )
            last[c] = np.maximum.reduceat(
                np.where(valid, pos, -1), seg_starts
            )
        return s, seg_starts, last

    def candidates(batch: pa.Table) -> pa.Table:
        t = batch.select(out_cols)
        t = t.filter(t.column(pk).combine_chunks().is_valid())
        if t.num_rows < 2:
            return t
        # unique-key batches (the common CDC shape: one patch per key per
        # epoch) have nothing to compact — skip the 4-key sort (hash
        # count_distinct is ~3× cheaper; measured on the 100M-row stress
        # where every row survived the pre-reduce anyway)
        if (
            pc.count_distinct(t.column(pk)).as_py() == t.num_rows
        ):
            return t
        s, seg_starts, last = _seg_last_valid(t)
        seg_ends = np.r_[seg_starts[1:], s.num_rows] - 1
        keep = np.unique(
            np.concatenate(
                [seg_ends] + [v[v >= 0] for v in last.values()]
            )
        )
        if len(keep) == s.num_rows:
            return s  # nothing compacts (keys ~unique): skip the copy
        return s.take(pa.array(keep, type=pa.int64()))

    def route(batch: pa.Table) -> pa.Table:
        t = candidates(batch)
        parts = partition_ids(t.column(pk), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def merge(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        s, seg_starts, last = _seg_last_valid(t)
        seg_ends = np.r_[seg_starts[1:], s.num_rows] - 1
        cols = {pk: s.column(pk).take(pa.array(seg_starts, type=pa.int64()))}
        for c in patch_cols:
            li = last[c]
            taken = s.column(c).combine_chunks().take(
                pa.array(np.maximum(li, 0), type=pa.int64())
            )
            cols[c] = pc.if_else(
                pa.array(li >= 0),
                taken,
                pa.nulls(len(li), s.schema.field(c).type),
            )
        ends = pa.array(seg_ends, type=pa.int64())
        cols[ver] = s.column(ver).take(ends)
        cols[seq] = s.column(seq).take(ends)
        return pa.table(cols)

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_moments(
    ds,
    *,
    key: str,
    value_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key exact higher moments → population variance / skewness /
    kurtosis, hash-checkable against SQL.

    Same design as :func:`standardize_column` / the grouped-corr operator:
    values quantize to integer units (``floor(value)``) so the four power
    sums are EXACT integers (order-independent — safe to pre-reduce per
    batch and merge in any order), and the float finish happens ONCE per
    key in a fixed IEEE evaluation order that the spelled-out SQL
    reproduces bit-for-bit (``sqrt`` instead of ``pow`` — libm ``pow``
    implementations differ across engines; sqrt is IEEE-exact)::

        mean = s1/n;  e_k = s_k/n;  var = e2 - mean²
        skew = (e3 - 3·mean·e2 + 2·mean³) / (var·sqrt(var))
        kurt = (e4 - 4·mean·e3 + 6·mean²·e2 - 3·mean⁴) / (var·var)

    Envelope: |v| ≤ 10³ (event values) ⇒ v⁴ ≤ 10¹² — int64 power sums are
    exact past 10⁶ rows per (key, batch) partial and the per-partition
    merge holds to ~9·10⁶ such rows per key; beyond that, split the merge
    (salted pre-reduce) before widening — documented bound, checked
    nowhere near at test scale.  Null keys and null values are excluded
    (SQL ``WHERE`` parity).
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"k": batch.column(key), "x": batch.column(value_col)}
        )
        t = t.filter(
            pc.and_(
                t.column("k").combine_chunks().is_valid(),
                t.column("x").combine_chunks().is_valid(),
            )
        )
        v = pc.cast(pc.floor(t.column("x")), pa.int64()).combine_chunks()
        vn = v.to_numpy(zero_copy_only=False)
        g = pa.table(
            {
                "k": t.column("k"),
                "n": pa.array(np.ones(len(vn), dtype=np.int64)),
                "s1": v,
                "s2": pa.array(vn * vn),
                "s3": pa.array(vn * vn * vn),
                "s4": pa.array(vn * vn * vn * vn),
            }
        ).group_by("k", use_threads=False).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum"), ("s3", "sum"), ("s4", "sum")]
        )
        parts = partition_ids(g.column("k"), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"]).group_by(
            "k", use_threads=False
        ).aggregate(
            [
                ("n_sum", "sum"),
                ("s1_sum", "sum"),
                ("s2_sum", "sum"),
                ("s3_sum", "sum"),
                ("s4_sum", "sum"),
            ]
        )
        n = g.column("n_sum_sum").to_numpy(zero_copy_only=False).astype(np.float64)
        s = [
            g.column(f"s{i}_sum_sum").to_numpy(zero_copy_only=False).astype(np.float64)
            for i in (1, 2, 3, 4)
        ]
        mean = s[0] / n
        e2, e3, e4 = s[1] / n, s[2] / n, s[3] / n
        var = e2 - mean * mean
        # zero-variance keys (singletons, constant groups): SQL x/0.0 is
        # NULL in DuckDB — emit null, not numpy's nan/inf
        ok = var != 0.0
        safe = np.where(ok, var, 1.0)
        skew = (e3 - 3.0 * mean * e2 + 2.0 * mean * mean * mean) / (
            safe * np.sqrt(safe)
        )
        kurt = (
            e4
            - 4.0 * mean * e3
            + 6.0 * mean * mean * e2
            - 3.0 * mean * mean * mean * mean
        ) / (safe * safe)
        mask = pa.array(~ok)
        return pa.table(
            {
                key: g.column("k"),
                "n": g.column("n_sum_sum"),
                "mean": pa.array(mean),
                "var_pop": pa.array(var),
                "skew_pop": pc.if_else(mask, pa.scalar(None, pa.float64()), pa.array(skew)),
                "kurt_pop": pc.if_else(mask, pa.scalar(None, pa.float64()), pa.array(kurt)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def agg_strings_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    order_cols: list[str],
    sep: str = ",",
    out_col: str = "agg",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """SQL ``string_agg(value, sep ORDER BY order_cols)`` per key — the
    list/string collection aggregate (session path reconstruction, label
    concatenation).  ONE hash exchange of ``(key, value, order_cols)``;
    the per-partition kernel is fully vectorized: one sort, segment
    offsets from key boundaries, ``ListArray.from_arrays`` +
    ``pc.binary_join`` (no per-key Python string building).  Null values
    are skipped (SQL string_agg semantics); a key whose values are all
    null aggregates to null; null keys are dropped (matched by the
    oracle's WHERE).

    Partitioning assumption: all rows of one key co-locate; the aggregate
    is order-defined, not associative, so salting does not apply — hot
    keys rely on Ray spilling large groups (same policy as scd2_history).
    """

    def route(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key), "_v": batch.column(value_col)}
        for c in order_cols:
            cols[c] = batch.column(c)
        t = pa.table(cols)
        t = t.filter(t.column(key).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def agg(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        # sort by (key, order_cols); null values keep their slot in the
        # sort but are dropped by the `keep` mask below, so each segment's
        # surviving values stay in order_cols order
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (key, "ascending"),
                *[(c, "ascending") for c in order_cols],
            ],
        )
        t = t.take(idx)
        n = t.num_rows
        keys = t.column(key).combine_chunks()
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = pc.not_equal(
                keys.slice(1), keys.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        seg_starts = np.nonzero(start)[0]
        vals = t.column("_v").combine_chunks()
        valid = vals.is_valid().to_numpy(zero_copy_only=False)
        # stable partition: valid rows of each segment, in order
        keep = np.nonzero(valid)[0]
        seg_of_row = np.cumsum(start) - 1
        kept_seg = seg_of_row[keep]
        vals_kept = vals.take(pa.array(keep, type=pa.int64()))
        counts = np.bincount(kept_seg, minlength=len(seg_starts))
        offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets), vals_kept)
        joined = pc.binary_join(lists, sep)
        empty = counts == 0
        if empty.any():
            joined = pc.if_else(
                pa.array(~empty), joined, pa.nulls(len(empty), pa.string())
            )
        return pa.table(
            {
                key: keys.take(pa.array(seg_starts, type=pa.int64())),
                out_col: joined,
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(agg, batch_format="pyarrow")
    )


def profile_columns(
    ds,
    *,
    cols: list[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Data-quality profile: per column, ``(n_rows, n_nulls, n_distinct)``
    — the ingest-audit staple (null-rate drift, cardinality explosions).

    ONE narrow exchange at any scale: each batch emits its per-column
    distinct values pre-counted (``value_counts``) as ``(col, val, n)``
    rows with values cast to string (Arrow casts are shortest-roundtrip,
    hence injective — distinct string counts equal distinct native
    counts); rows route by ``hash(col, val)``, so every global distinct
    value lands in exactly ONE partition and per-partition distinct
    partials are additive.  A final tiny per-column groupby sums the
    partials.  Null values ride as null ``val`` (counted, never
    distinct-counted).
    """

    def partial(batch: pa.Table) -> pa.Table:
        outs = []
        for i, c in enumerate(cols):
            arr = batch.column(c).combine_chunks()
            vc = pc.value_counts(pc.cast(arr, pa.string()))
            vals, counts = vc.field(0), vc.field(1)
            outs.append(
                pa.table(
                    {
                        "col_name": pa.array([c] * len(vals), type=pa.string()),
                        "val": vals,
                        "n": counts.cast(pa.int64()),
                    }
                )
            )
        t = pa.concat_tables(outs)
        mixed = stable_hash_array(t.column("col_name")) ^ stable_hash_array(
            t.column("val")
        )
        parts = (mixed % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def per_partition(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        g = t.group_by(["col_name", "val"], use_threads=False).aggregate(
            [("n", "sum")]
        )
        isnull = pc.is_null(g.column("val")).to_numpy(zero_copy_only=False)
        n = g.column("n_sum").to_numpy(zero_copy_only=False)
        stats = pa.table(
            {
                "col_name": g.column("col_name"),
                "rows": pa.array(n, type=pa.int64()),
                "nulls": pa.array(np.where(isnull, n, 0), type=pa.int64()),
                "distinct": pa.array(
                    (~isnull).astype(np.int64), type=pa.int64()
                ),
            }
        )
        return stats.group_by("col_name", use_threads=False).aggregate(
            [("rows", "sum"), ("nulls", "sum"), ("distinct", "sum")]
        )

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by("col_name", use_threads=False).aggregate(
            [("rows_sum", "sum"), ("nulls_sum", "sum"), ("distinct_sum", "sum")]
        )
        return pa.table(
            {
                "col_name": g.column("col_name"),
                "n_rows": g.column("rows_sum_sum"),
                "n_nulls": g.column("nulls_sum_sum"),
                "n_distinct": g.column("distinct_sum_sum"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
        .groupby("col_name")
        .map_groups(final, batch_format="pyarrow")
    )


def unpivot(
    ds,
    *,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
):
    """UNPIVOT / melt: widen-to-long reshape — each input row emits one row
    per value column as ``(id_cols..., variable, value)``.  Purely
    per-batch (no shuffle, 1 → len(value_cols) row expansion via column
    concatenation, no Python row loop); values cast to a common type
    (float64 default — SQL UNPIVOT requires a unifiable type too)."""
    vt = value_type or pa.float64()

    def fn(batch: pa.Table) -> pa.Table:
        pieces = []
        for c in value_cols:
            cols = {k: batch.column(k) for k in id_cols}
            cols[var_name] = pa.array([c] * batch.num_rows, type=pa.string())
            cols[value_name] = pc.cast(batch.column(c), vt)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def budget_sample_by_key(
    ds,
    *,
    key: str,
    id_col: str,
    units_col: str,
    budgets: dict,
    default_budget: int = 0,
    multiplier: int = 2654435761,
    modulus: int = 4_294_967_296,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Token-budget mixture sampling: per-``key`` (source / language) keep
    documents in deterministic hash order until the key's ``units_col``
    budget (token / char count) is exhausted — the mixture-construction
    stage of a training-data pipeline where each source contributes a fixed
    token budget rather than a fixed row fraction (Pile / Dolma style
    source mixing).

    Two phases, Ray-Data-first:

    1. a column-pruned keyed exchange of ``(key, id, units)`` only (payloads
       never shuffle); per key the rows are ordered by the same Knuth hash
       as :func:`hash_sample` (tie-break ``id``) and kept while the running
       unit sum stays within the key's budget — greedy prefix packing, so
       the kept set is exactly ``SUM(units) OVER (PARTITION BY key ORDER BY
       hash, id) <= budget`` in SQL;
    2. the winning ids are broadcast (``ray.put`` once) and the full rows
       pass a zero-shuffle membership filter.

    The broadcast is scale-safe BY CONSTRUCTION: the winner count is
    bounded by ``sum(budgets) / min_units_per_row`` — a caller-chosen
    constant independent of corpus size (unlike dedup's dup-id set).
    Replay- and parallelism-invariant; null ids are dropped, null units
    count as 0 (SQL SUM-over-window semantics).
    """
    import ray

    from ..functions.hashing import partition_ids

    keys = list(budgets)
    budget_arr = np.array([int(budgets[k]) for k in keys], dtype=np.int64)
    key_set = pa.array(keys)

    def prune(batch: pa.Table) -> pa.Table:
        id_arr = batch.column(id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        valid = id_arr.is_valid()
        t = pa.table(
            {
                key: batch.column(key),
                id_col: id_arr.cast(pa.int64()),
                units_col: pc.fill_null(
                    pc.cast(batch.column(units_col), pa.int64()), 0
                ),
            }
        ).filter(valid)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = (ids * multiplier) % modulus
        t = t.append_column("_h", pa.array(h, type=pa.int64()))
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def winners(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_h", "ascending"),
                (id_col, "ascending"),
            ],
        )
        t = group.take(idx)
        keys_np = t.column(key).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        units = t.column(units_col).to_numpy(zero_copy_only=False)
        n = len(keys_np)
        pos = np.arange(n, dtype=np.int64)
        start = np.zeros(n, dtype=bool)
        start[0] = True
        if n > 1:
            start[1:] = keys_np[1:] != keys_np[:-1]
        run_start = np.maximum.accumulate(np.where(start, pos, 0))
        cum = np.cumsum(units)
        cum_ex = cum - units  # exclusive prefix
        seg_cum = cum - cum_ex[run_start]  # inclusive within-key prefix
        kidx = (
            pc.fill_null(pc.index_in(t.column(key), value_set=key_set), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        budget = np.where(
            kidx >= 0, budget_arr[np.maximum(kidx, 0)], default_budget
        )
        kept = t.filter(pa.array(seg_cum <= budget))
        return pa.table({id_col: kept.column(id_col)})

    winner_ds = (
        ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(winners, batch_format="pyarrow")
    )
    batches = list(winner_ds.iter_batches(batch_format="pyarrow"))
    if batches:
        keep = np.unique(
            pa.concat_tables(batches).column(id_col).to_numpy(
                zero_copy_only=False
            )
        )
    else:
        keep = np.array([], dtype=np.int64)
    keep_ref = ray.put(keep)

    def keep_filter(batch: pa.Table) -> pa.Table:
        ids_keep = ray.get(keep_ref)  # np.unique output → already sorted
        id_arr = batch.column(id_col)
        valid = id_arr.is_valid().to_numpy(zero_copy_only=False)
        ids = pc.fill_null(id_arr.cast(pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
        if len(ids_keep) == 0:
            return batch.filter(pa.array(np.zeros(len(ids), dtype=bool)))
        # searchsorted membership: np.isin re-sorts the winner set on
        # EVERY batch (measured 3× the whole stage at a 1M+ winner set)
        pos = np.minimum(np.searchsorted(ids_keep, ids), len(ids_keep) - 1)
        return batch.filter(pa.array((ids_keep[pos] == ids) & valid))

    return ds.map_batches(keep_filter, batch_format="pyarrow", batch_size=None)


def _expectation_fail_mask(batch: pa.Table, rule: tuple) -> np.ndarray:
    """True where the row FAILS the rule (NULL comparisons fail closed —
    SQL CASE WHEN semantics)."""
    _, kind, col, *args = rule
    arr = batch.column(col)
    if kind == "not_null":
        ok = arr.is_valid()
    elif kind == "in_set":
        ok = pc.is_in(arr, value_set=pa.array(args[0]))
    elif kind == "in_range":
        lo, hi = args
        ok = pc.and_(pc.greater_equal(arr, lo), pc.less_equal(arr, hi))
    elif kind == "regex":
        ok = pc.match_substring_regex(arr, args[0])
    else:
        raise ValueError(f"unknown rule kind {kind!r}")
    ok = pc.fill_null(ok, False)
    if isinstance(ok, pa.ChunkedArray):
        ok = ok.combine_chunks()
    return ~ok.to_numpy(zero_copy_only=False)


def first_failed_rule(batch: pa.Table, rules: list[tuple]) -> np.ndarray:
    """Index of the FIRST rule each row fails, -1 for valid rows — the
    shared kernel of :func:`validate_rows` and the CDC sync's quarantine
    lane."""
    rule_idx = np.full(batch.num_rows, -1, dtype=np.int64)
    for i, rule in enumerate(rules):
        fails = _expectation_fail_mask(batch, rule)
        rule_idx = np.where((rule_idx == -1) & fails, i, rule_idx)
    return rule_idx


def tag_first_failed(rule_idx: np.ndarray, rules: list[tuple]) -> pa.Array:
    """Rule indices → string tag array (null = valid), shared between
    :func:`validate_rows` and the CDC quarantine lane so the two can't
    drift.  Vectorized lookup: slot ``len(rules)`` is the null slot."""
    names = [r[0] for r in rules]
    lookup = pa.array(names + [None], type=pa.string())
    return lookup.take(
        pa.array(np.where(rule_idx >= 0, rule_idx, len(names)))
    )


def validate_rows(
    ds,
    rules: list[tuple],
    *,
    emit: str = "quarantine",
    rule_col: str = "_rule",
):
    """Data-quality expectations with a quarantine lane (Delta Live Tables
    / Great Expectations shape): each rule is a vectorized predicate a row
    must satisfy; rows are tagged with the FIRST rule they fail.  A rule
    passes only when its predicate is TRUE — NULL comparisons fail closed
    (SQL ``CASE WHEN`` semantics, so the oracle is a plain CASE chain).

    Rule specs (``(name, kind, col, *args)``):

    - ``(name, "not_null", col)``
    - ``(name, "in_set", col, values)``
    - ``(name, "in_range", col, lo, hi)``  (inclusive)
    - ``(name, "regex", col, pattern)``    (RE2 ``match_substring_regex``)

    ``emit``: ``"quarantine"`` → failing rows + ``rule_col`` (the bad-row
    side table a CDC sync would route to ``<table>__quarantine``);
    ``"valid"`` → passing rows only; ``"tagged"`` → every row with
    ``rule_col`` (null = valid) for downstream routing.  Purely per-batch —
    no shuffle, one pass, the three emit modes share one kernel.
    """
    if emit not in ("quarantine", "valid", "tagged"):
        raise ValueError(f"emit must be quarantine|valid|tagged, got {emit!r}")

    def fn(batch: pa.Table) -> pa.Table:
        rule_idx = first_failed_rule(batch, rules)
        t = batch.append_column(rule_col, tag_first_failed(rule_idx, rules))
        if emit == "tagged":
            return t
        if emit == "valid":
            return t.filter(pa.array(rule_idx == -1)).drop_columns([rule_col])
        return t.filter(pa.array(rule_idx >= 0))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def winsorize(
    ds,
    *,
    value_col: str,
    q_lo: float = 0.01,
    q_hi: float = 0.99,
    out_col: str | None = None,
    num_buckets: int = 4096,
):
    """Outlier clamping at exact global quantiles (winsorization — the
    standard numeric-feature cleaning step): the clamp bounds are EXACT
    ``quantile_disc`` elements found by :func:`exact_quantile_disc`'s
    iterative histogram selection (O(1) driver memory at any corpus size),
    then one shuffle-free vectorized pass clips the column.  Because the
    bounds are actual column elements, the result is bit-identical to the
    SQL ``LEAST(GREATEST(v, lo), hi)`` form.  ``ds`` must be re-readable
    (a source Dataset): the quantile passes and the clamp pass each
    re-stream it."""
    lo = exact_quantile_disc(
        ds, value_col=value_col, q=q_lo, num_buckets=num_buckets
    )
    hi = exact_quantile_disc(
        ds, value_col=value_col, q=q_hi, num_buckets=num_buckets
    )
    out = out_col or f"{value_col}_w"

    def clamp(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if lo is None:
            return batch.append_column(out, pc.cast(v, pa.float64()))
        w = pc.min_element_wise(
            pc.max_element_wise(pc.cast(v, pa.float64()), lo), hi
        )
        return batch.append_column(out, w)

    return ds.map_batches(clamp, batch_format="pyarrow", batch_size=None)


def mixture_stats(
    ds,
    *,
    keys: list[str],
    units_col: str,
):
    """Corpus-mixture report: per key tuple (source, lang, …) the document
    count, unit total (chars / tokens) and its share of the corpus —
    per-batch Arrow group-by partials, one aggregate-sized final reduce,
    and ONE IEEE float64 division per row for the share (exact ints up to
    that point, so the result is hash-identical to the SQL form)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                **{k: batch.column(k) for k in keys},
                "_n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "_u": pc.fill_null(
                    pc.cast(batch.column(units_col), pa.int64()), 0
                ),
            }
        )
        return (
            t.group_by(keys)
            .aggregate([("_n", "sum"), ("_u", "sum")])
            .rename_columns([*keys, "_n", "_u"])
        )

    parts = list(
        ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return pa.table(
            {
                **{k: pa.array([], type=pa.string()) for k in keys},
                "n_docs": pa.array([], type=pa.int64()),
                "n_units": pa.array([], type=pa.int64()),
                "unit_share": pa.array([], type=pa.float64()),
            }
        )
    t = (
        pa.concat_tables(parts)
        .group_by(keys)
        .aggregate([("_n", "sum"), ("_u", "sum")])
        .rename_columns([*keys, "n_docs", "n_units"])
    )
    units = t.column("n_units").to_numpy(zero_copy_only=False)
    total = int(units.sum())
    share = units.astype(np.float64) / np.float64(total)
    return t.append_column("unit_share", pa.array(share, type=pa.float64()))


def grouped_trend(
    ds,
    *,
    key: str,
    x_col: str,
    y_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key OLS linear trend (slope + intercept) from EXACT integer
    power sums — the time-series trend staple, hash-checkable against SQL.

    The caller supplies pre-quantized integer ``x`` (e.g. hour index) and
    ``y`` (e.g. value cents); each batch contributes per-key integer sums
    ``(n, Σx, Σy, Σxy, Σx²)`` (order-independent), one hash exchange moves
    the aggregate-sized partials, and the float finish runs ONCE per key
    in a fixed IEEE sequence the spelled-out SQL reproduces::

        den       = n·Σx² − Σx·Σx            (float64)
        slope     = (n·Σxy − Σx·Σy) / den     (NULL when den = 0)
        intercept = (Σy − slope·Σx) / n

    Null keys/values are excluded (SQL WHERE parity).  Partition-level
    final reduce (one vectorized group_by per partition)."""
    from ..functions.hashing import partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                "x": pc.cast(batch.column(x_col), pa.int64()),
                "y": pc.cast(batch.column(y_col), pa.int64()),
            }
        )
        valid = pc.and_(
            pc.and_(t.column(key).is_valid(), t.column("x").is_valid()),
            t.column("y").is_valid(),
        )
        t = t.filter(valid)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                key: t.column(key),
                "_n": pa.array(np.ones(len(x), dtype=np.int64)),
                "_sx": t.column("x"),
                "_sy": t.column("y"),
                "_sxy": pa.array(x * y),
                "_sxx": pa.array(x * x),
            }
        )
        g = t.group_by(key).aggregate(
            [(c, "sum") for c in ("_n", "_sx", "_sy", "_sxy", "_sxx")]
        ).rename_columns([key, "_n", "_sx", "_sy", "_sxy", "_sxx"])
        parts = partition_ids(g.column(key), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate(
                [(c, "sum") for c in ("_n", "_sx", "_sy", "_sxy", "_sxx")]
            )
            .rename_columns([key, "_n", "_sx", "_sy", "_sxy", "_sxx"])
        )
        n = g.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = g.column("_sx").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = g.column("_sy").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = g.column("_sxy").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        sxx = g.column("_sxx").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        den = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / den
            intercept = (sy - slope * sx) / n
        bad = den == 0.0
        slope[bad] = np.nan
        intercept[bad] = np.nan
        return pa.table(
            {
                key: g.column(key),
                "n": g.column("_n"),
                "slope": pa.array(slope, type=pa.float64(), from_pandas=True),
                "intercept": pa.array(
                    intercept, type=pa.float64(), from_pandas=True
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_quantiles_disc(
    ds,
    *,
    key: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.1, 0.9),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact per-group DISCRETE quantiles (SQL ``quantile_disc``: the
    element at rank ``ceil(q*n)-1``) — one ``(key, value)`` hash
    exchange, vectorized per-group sort + gather.  Unlike the
    interpolating ``grouped_quantiles``, every output is an ACTUAL column
    element, so downstream comparisons against it are bit-exact."""

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch.column(key), value_col: batch.column(value_col)}
        )
        t = t.filter(t.column(value_col).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    qcols = [f"p{int(q * 100)}" for q in quantiles]

    def compute(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), (value_col, "ascending")]
        )
        t = g.take(idx)
        keys = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        starts = np.nonzero(start)[0]
        ends = np.append(starts[1:], n)
        out = {key: pa.array(keys[starts], type=t.schema.field(key).type)}
        for q, name in zip(quantiles, qcols):
            seg_n = ends - starts
            rank = np.minimum(
                seg_n - 1,
                np.maximum(0, np.ceil(q * seg_n).astype(np.int64) - 1),
            )
            out[name] = pa.array(vals[starts + rank])
        return pa.table(out)

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(compute, batch_format="pyarrow")
    )


def trimmed_mean_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    lo: float = 0.1,
    hi: float = 0.9,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Robust per-key mean of the values inside the key's own exact
    [lo, hi] discrete-quantile band — the outlier-insensitive grouped
    average a quality dashboard wants.

    Two pruned passes: (1) per-key ``quantile_disc`` bounds over a
    ``(key, value)``-only exchange; the bounds table is O(keys) and is
    broadcast via ``ray.put`` (group-cardinality keys; for user-cardinality
    keys route pass 2 through the same hash exchange instead); (2) one
    streaming pass folding integer-cents partial sums per (key, batch), a
    tiny keyed final, then ONE IEEE division per key — hash-exact against
    the SQL ``quantile_disc`` + ``FILTER`` oracle because the bounds are
    actual column elements and the sums are exact ints."""
    import ray

    bounds = grouped_quantiles_disc(
        ds,
        key=key,
        value_col=value_col,
        quantiles=(lo, hi),
        num_partitions=num_partitions,
    ).take_all()
    lo_col, hi_col = f"p{int(lo * 100)}", f"p{int(hi * 100)}"
    keys_sorted = sorted(r[key] for r in bounds)
    lo_map = {r[key]: r[lo_col] for r in bounds}
    hi_map = {r[key]: r[hi_col] for r in bounds}
    bounds_ref = ray.put(
        (
            np.array(keys_sorted),
            np.array([lo_map[k] for k in keys_sorted], dtype=np.float64),
            np.array([hi_map[k] for k in keys_sorted], dtype=np.float64),
        )
    )

    def partial(batch: pa.Table) -> pa.Table:
        karr, lo_arr, hi_arr = ray.get(bounds_ref)
        t = pa.table(
            {key: batch.column(key), value_col: batch.column(value_col)}
        )
        t = t.filter(t.column(value_col).combine_chunks().is_valid())
        if t.num_rows == 0 or len(karr) == 0:
            return pa.table(
                {
                    key: pa.array([], type=batch.schema.field(key).type),
                    "_s": pa.array([], type=pa.int64()),
                    "_n": pa.array([], type=pa.int64()),
                    "_part": pa.array([], type=pa.int64()),
                }
            )
        keys_np = (
            t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        )
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(karr, keys_np)
        pos_c = np.clip(pos, 0, len(karr) - 1)
        known = karr[pos_c] == keys_np
        inband = known & (vals >= lo_arr[pos_c]) & (vals <= hi_arr[pos_c])
        t2 = t.filter(pa.array(inband))
        cents = pc.cast(
            pc.floor(pc.multiply(t2.column(value_col), 100.0)), pa.int64()
        )
        g = (
            pa.table({key: t2.column(key), "_c": cents, "_one": pa.array(
                np.ones(t2.num_rows, dtype=np.int64))})
            .group_by(key)
            .aggregate([("_c", "sum"), ("_one", "sum")])
        )
        parts = partition_ids(g.column(key), num_partitions)
        return pa.table(
            {
                key: g.column(key),
                "_s": g.column("_c_sum").cast(pa.int64()),
                "_n": g.column("_one_sum").cast(pa.int64()),
                "_part": pa.array(parts, type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([("_s", "sum"), ("_n", "sum")])
        )
        s = g.column("_s_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        n = g.column("_n_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table(
            {
                key: g.column(key),
                "n_kept": g.column("_n_sum").cast(pa.int64()),
                "kept_cents": g.column("_s_sum").cast(pa.int64()),
                "trimmed_mean_cents": pa.array(s / n, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def _skyline_mask(v: "np.ndarray", t: "np.ndarray") -> "np.ndarray":
    """Non-dominated mask for maximize-(v, t) Pareto dominance: point i is
    dominated iff some j has v_j ≥ v_i AND t_j ≥ t_i with at least one
    strict.  Duplicated identical points never dominate each other (SQL
    NOT-EXISTS-strict semantics).  Vectorized: sort v desc / t desc, the
    per-v-group max t must strictly exceed the running max t over all
    strictly-greater v groups."""
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-t, -v))
    vs, ts_ = v[order], t[order]
    newv = np.ones(n, dtype=bool)
    newv[1:] = vs[1:] != vs[:-1]
    gstart = np.nonzero(newv)[0]
    gmax = ts_[gstart]  # t desc inside each v group → first is the max
    prev = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1])
    )
    group_survives = gmax > prev
    gidx = np.cumsum(newv) - 1
    keep_sorted = group_survives[gidx] & (ts_ == gmax[gidx])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def skyline(
    ds,
    *,
    x: str,
    y: str,
    columns: list[str] | None = None,
    max_candidates: int = 5_000_000,
):
    """Pareto frontier (skyline) maximizing ``(x, y)``: the rows no other
    row dominates in both dimensions.

    Distributed decomposition: the global skyline is a subset of the union
    of per-block skylines, so a vectorized per-batch local skyline runs
    inside ``map_batches`` (rows never shuffle), the surviving candidates —
    O(frontier) per block, typically logarithmic in block size on
    non-adversarial data — are collected, and one exact refine over the
    merged candidate set finishes.  ``max_candidates`` guards the collect:
    adversarially-correlated data (everything on the frontier) raises
    instead of silently materializing the dataset on the driver.

    Rows with a null ``x`` or ``y`` are excluded (SQL comparison
    semantics).  ``y`` must be an integer-valued or temporal column (int64
    compare domain); ``x`` may be float."""
    import ray

    cols = columns or [x, y]

    def local(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        valid = pc.and_(
            t.column(x).combine_chunks().is_valid(),
            t.column(y).combine_chunks().is_valid(),
        )
        t = t.filter(valid)
        if t.num_rows == 0:
            return t
        v = t.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        ty = t.column(y).combine_chunks()
        tnum = ty.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_skyline_mask(v, tnum)))

    cand_refs = ds.map_batches(
        local, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()
    tables = [t for t in ray.get(cand_refs) if t.num_rows > 0]
    if not tables:
        empty = ds.schema()
        names = list(empty.names)
        types = dict(zip(empty.names, empty.types))
        return pa.table(
            {c: pa.array([], type=types[c]) for c in cols if c in names}
        )
    merged = pa.concat_tables(tables).combine_chunks()
    if merged.num_rows > max_candidates:
        raise RuntimeError(
            f"skyline candidate set {merged.num_rows} exceeds "
            f"max_candidates={max_candidates}: the frontier itself is "
            "dataset-sized (correlated dimensions) — bucket by one "
            "dimension and refine per range instead"
        )
    v = merged.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
    tnum = (
        merged.column(y)
        .combine_chunks()
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    return merged.filter(pa.array(_skyline_mask(v, tnum)))


def hhi_by_key(
    ds,
    *,
    key: str,
    member_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Herfindahl–Hirschman concentration index per key: with c_m the row
    count of member m inside a key group, ``hhi = Σ c_m² / (Σ c_m)²`` —
    1.0 when one member owns the group, → 1/M under a uniform split.
    The classic "is this event type dominated by a few users / this host
    by one URL pattern" skew probe.

    Two exchanges, both fixed-width and pre-reduced: (1) per-batch
    ``(key, member)`` counts route by ``hash(key, member)`` so the exact
    per-member counts finalize partition-locally, then collapse to
    per-partition ``(key, Σc², Σc)`` partials; (2) the aggregate-sized
    partials re-route by key and sum.  All integer arithmetic until the
    single IEEE division ``float(ss) / (float(s) * float(s))`` — hash-exact
    against the SQL rewrite (int64 bounds: Σc² overflows past ~3·10⁹ rows
    in ONE key group; salt the member hash first at that scale).

    Output ``(key, sum_sq, n_rows, hhi)``; null keys/members dropped.
    """
    from ..functions.hashing import composite_partition_ids, partition_ids

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, member_col])
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column(member_col).combine_chunks().is_valid(),
            )
        )
        g = t.group_by([key, member_col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        g = g.rename_columns([key, member_col, "_n"])
        parts = composite_partition_ids(g, [key, member_col], num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def pair_final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by([key, member_col], use_threads=False)
            .aggregate([("_n", "sum")])
        )
        g = g.rename_columns([key, member_col, "_n"])
        n = g.column("_n").cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                key: g.column(key),
                "_ss": pa.array(n * n, type=pa.int64()),
                "_s": pa.array(n, type=pa.int64()),
            }
        )
        out = t.group_by(key, use_threads=False).aggregate(
            [("_ss", "sum"), ("_s", "sum")]
        )
        out = out.rename_columns([key, "_ss", "_s"])
        parts = partition_ids(out.column(key), num_partitions)
        return out.append_column("_part", pa.array(parts, type=pa.int64()))

    def key_final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key, use_threads=False)
            .aggregate([("_ss", "sum"), ("_s", "sum")])
        )
        g = g.rename_columns([key, "_ss", "_s"])
        ss = g.column("_ss").cast(pa.int64()).to_numpy(zero_copy_only=False)
        s = g.column("_s").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hhi = ss.astype(np.float64) / (s.astype(np.float64) * s.astype(np.float64))
        return pa.table(
            {
                key: g.column(key),
                "sum_sq": pa.array(ss, type=pa.int64()),
                "n_rows": pa.array(s, type=pa.int64()),
                "hhi": pa.array(hhi, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(pair_final, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(key_final, batch_format="pyarrow")
    )


def source_quality_gate(
    ds,
    *,
    source_col: str = "source",
    text_col: str = "text",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Domain/source-level quality gate (the "derive a host blocklist from
    corpus statistics, then filter" pattern of crawl curation): keep only
    documents whose SOURCE's aggregate alphabetic-character ratio is at or
    above the global corpus ratio.  Group-level quality, unlike the per-doc
    rules of :func:`quality_filter_exact`, catches boilerplate farms whose
    individual pages look fine.

    Pass 1: per-batch integer partial sums ``(source, Σchars, Σalpha,
    n_valid)`` → one aggregate-sized exchange keyed on source.  The
    per-source table is bounded by source cardinality (hosts, not
    documents) so it collects to the driver; the accept decision is the
    integer cross-multiply ``Σalpha_s · Σchars_global ≥ Σalpha_global ·
    Σchars_s`` evaluated in arbitrary-precision Python ints (no float
    ratio, no overflow at any scale).  Sources with zero non-null texts
    are rejected, matching SQL ``SUM`` → NULL comparison semantics.
    Pass 2: broadcast the accepted-source set, filter — document text
    never rides an exchange.
    """
    import ray as _ray

    from ..functions.hashing import partition_ids
    from ..functions.text import quality_subscores

    def partial(batch: pa.Table) -> pa.Table:
        sub = quality_subscores(batch.column(text_col))
        t = pa.table(
            {
                source_col: batch.column(source_col),
                "_c": pc.fill_null(sub["qf_chars"], 0),
                "_a": pc.fill_null(sub["qf_alpha"], 0),
                "_v": pc.cast(sub["qf_chars"].is_valid(), pa.int64()),
            }
        )
        g = t.group_by(source_col, use_threads=False).aggregate(
            [("_c", "sum"), ("_a", "sum"), ("_v", "sum")]
        )
        g = g.rename_columns([source_col, "_c", "_a", "_v"])
        parts = partition_ids(g.column(source_col), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(source_col, use_threads=False)
            .aggregate([("_c", "sum"), ("_a", "sum"), ("_v", "sum")])
        )
        return g.rename_columns([source_col, "_c", "_a", "_v"])

    per_source = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )
    rows = [
        b
        for b in per_source.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    allowed: list = []
    if rows:
        t = pa.concat_tables(
            [r if isinstance(r, pa.Table) else pa.Table.from_batches([r]) for r in rows]
        )
        srcs = t.column(source_col).to_pylist()
        cs = t.column("_c").to_pylist()
        als = t.column("_a").to_pylist()
        vs = t.column("_v").to_pylist()
        tot_c = sum(cs)
        tot_a = sum(als)
        allowed = [
            s
            for s, c, a, v in zip(srcs, cs, als, vs)
            if s is not None and v > 0 and a * tot_c >= tot_a * c
        ]
    allowed_ref = _ray.put(
        pa.array(sorted(set(allowed)), type=pa.string())
    )

    def keep(batch: pa.Table) -> pa.Table:
        ok = _ray.get(allowed_ref)
        mask = pc.is_in(batch.column(source_col), value_set=ok)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)


def weighted_median_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    weight_col: str,
    out_col: str = "wmedian",
    num_partitions: int = 64,
):
    """Exact per-group WEIGHTED median: the smallest value ``v`` whose
    running weight reaches half the group's total (``2·cumw ≥ total`` on
    the value-sorted group — the SQL cumulative-window formulation, so the
    result is always an actual column element and the comparison against
    the oracle is bit-exact).

    Weights must be integers (cast upstream): the threshold test is then
    pure int64 arithmetic with no float accumulation-order hazard.  ONE
    ``(key, value, weight)`` hash exchange; the per-partition kernel is a
    vectorized sort + segment-reset cumsum + ``minimum.reduceat`` first-hit
    — no Python per key.  Null values/weights are dropped."""

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                value_col: batch.column(value_col),
                "_w": pc.cast(batch.column(weight_col), pa.int64()),
            }
        )
        t = t.filter(
            pc.and_(
                t.column(value_col).combine_chunks().is_valid(),
                t.column("_w").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def compute(group: pa.Table) -> pa.Table:
        ktype = group.schema.field(key).type
        vtype = group.schema.field(value_col).type
        empty = pa.table(
            {
                key: pa.array([], type=ktype),
                out_col: pa.array([], type=vtype),
            }
        )
        idx = pc.sort_indices(
            group,
            sort_keys=[(key, "ascending"), (value_col, "ascending")],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        codes = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        w = g.column("_w").to_numpy(zero_copy_only=False)
        n = len(codes)
        if n == 0:
            return empty
        start = np.ones(n, dtype=bool)
        start[1:] = codes[1:] != codes[:-1]
        starts = np.nonzero(start)[0]
        ends = np.append(starts[1:], n)
        seg_id = np.cumsum(start) - 1
        cw = np.cumsum(w)
        base = np.where(starts > 0, cw[starts - 1], 0)
        cw = cw - base[seg_id]
        total = cw[ends - 1]
        cond = 2 * cw >= total[seg_id]
        cand = np.where(cond, np.arange(n, dtype=np.int64), n)
        first = np.minimum.reduceat(cand, starts)
        varr = g.column(value_col)
        if isinstance(varr, pa.ChunkedArray):
            varr = varr.combine_chunks()
        return pa.table(
            {
                key: karr.take(pa.array(starts)),
                out_col: varr.take(pa.array(first)),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(compute, batch_format="pyarrow")
    )


def first_digit_counts(
    ds,
    *,
    value_col: str,
    scale: float = 100.0,
    out_digit: str = "digit",
):
    """Benford-style first-significant-digit profile of a numeric column —
    the data-quality / fraud-screening primitive.

    Per-batch combiner: values fixed-point to integer units
    (``floor(|v|·scale)``, matching the oracle's
    ``CAST(floor(abs(v)*scale) AS BIGINT)``), the leading digit peeled with
    a vectorized divide-by-10 loop (≤19 passes, O(n) each), and the batch
    collapses to ≤9 partial rows — the exchange is aggregate-sized, and
    the final is one ≤9-row group.  ``frac`` is a single IEEE division
    n/total, hash-exact vs the spelled-out SQL.  Zero/null values carry no
    leading digit and are excluded.
    """

    def partial(batch: pa.Table) -> pa.Table:
        units = pc.cast(
            pc.floor(pc.multiply(pc.abs(batch.column(value_col)), scale)),
            pa.int64(),
        )
        x = pc.fill_null(units, 0).to_numpy(zero_copy_only=False)
        x = x[x > 0].copy()
        while x.size and int(x.max()) >= 10:
            m = x >= 10
            x[m] //= 10
        counts = np.bincount(x, minlength=10)[1:10]
        keep = counts > 0
        nk = int(keep.sum())
        return pa.table(
            {
                out_digit: pa.array(
                    np.arange(1, 10, dtype=np.int64)[keep], type=pa.int64()
                ),
                "_n": pa.array(counts[keep], type=pa.int64()),
                "_k": pa.array(np.zeros(nk, dtype=np.int64)),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        t = (
            group.select([out_digit, "_n"])
            .group_by(out_digit)
            .aggregate([("_n", "sum")])
            .rename_columns([out_digit, "n"])
        )
        t = t.take(pc.sort_indices(t, sort_keys=[(out_digit, "ascending")]))
        total = float(pc.sum(t.column("n")).as_py() or 0)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                out_digit: t.column(out_digit),
                "n": t.column("n"),
                "frac": pa.array(n / total, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_k")
        .map_groups(final, batch_format="pyarrow")
    )


def minmax_scale_by_key(
    ds,
    *,
    key: str,
    seq: str,
    value_col: str,
    out_col: str = "scaled",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """PER-KEY min-max feature scaling ``(v − min) / (max − min)`` — the
    bounded-range sibling of :func:`standardize_by_key`.

    Same single hash exchange of ``(key, seq, cents)``: co-locating each
    key makes the per-partition segmented min/max the global per-key
    extrema.  Fixed-point cents keep the extrema exact; the finalization
    is an integer subtraction and ONE IEEE division — bit-identical to
    ``CAST(c - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)``.  Null values
    keep their row with a null output and contribute nothing to the
    extrema; degenerate keys (max == min) yield null.  Null keys are
    dropped (SQL keyed-kernel policy).
    """

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)),
            pa.int64(),
        )
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                "_c": cents,
            }
        )
        t = t.filter(t.column(key).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def rescale(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[(key, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    seq: g.column(seq),
                    key: g.column(key),
                    out_col: pa.array([], type=pa.float64()),
                }
            )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        c_arr = g.column("_c").combine_chunks()
        valid = c_arr.is_valid().to_numpy(zero_copy_only=False)
        c = pc.fill_null(c_arr, 0).to_numpy(zero_copy_only=False)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        big = np.int64(2**62)
        mn = np.minimum.reduceat(np.where(valid, c, big), si)
        mx = np.maximum.reduceat(np.where(valid, c, -big), si)
        span = (mx - mn).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = (c - mn[seg_id]).astype(np.float64) / span[seg_id]
        ok = valid & (mx[seg_id] > mn[seg_id])
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                out_col: pa.array(scaled, type=pa.float64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(rescale, batch_format="pyarrow")
    )


def grouped_max(
    ds,
    *,
    key: str,
    value_col: str,
    out_col: str = "max",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact per-key MAX for any orderable Arrow type (ints, timestamps,
    strings) — per-batch combiner, PARTITION-LEVEL final (one Arrow
    group_by per partition, never a Python call per key; see
    :func:`grouped_sum` for the measured O(keys) trap).  SQL null
    semantics: nulls skipped, all-null keys yield null."""
    from ..functions.hashing import partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([key, value_col])
            .group_by(key)
            .aggregate([(value_col, "max")])
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([(f"{value_col}_max", "max")])
        )
        return pa.table(
            {
                key: g.column(key),
                out_col: g.column(f"{value_col}_max_max"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_min(
    ds,
    *,
    key: str,
    value_col: str,
    out_col: str = "min",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact per-key MIN — the twin of :func:`grouped_max` (per-batch
    combiner, PARTITION-LEVEL final; SQL null semantics)."""
    from ..functions.hashing import partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([key, value_col])
            .group_by(key)
            .aggregate([(value_col, "min")])
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([(f"{value_col}_min", "min")])
        )
        return pa.table(
            {
                key: g.column(key),
                out_col: g.column(f"{value_col}_min_min"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def spearman_by_key(
    ds,
    *,
    key: str,
    x_col: str,
    y_col: str,
    seq: str,
    out_col: str = "spearman",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """PER-KEY Spearman rank correlation between two columns — the
    monotonic-association sibling of :func:`grouped_corr` (Pearson), for
    "does this user's metric trend with time/order?" style diagnostics.

    Ranks are ``row_number`` ranks with a deterministic ``seq`` tie-break
    (matching ``row_number() OVER (PARTITION BY key ORDER BY col, seq)``),
    so they are exact int64 and the per-key moment sums are exact — the
    finalization is the same fixed-IEEE Pearson expression as
    :func:`grouped_corr`, applied to the ranks, hence hash-exact vs the
    spelled-out SQL.  ONE hash exchange of ``(key, x, y, seq)``
    co-locates each key; both rankings and the segmented moment sums are
    vectorized (two sorts + reduceat, no Python per key or per row).
    Rows with a null key, x or y are excluded (three-valued ORDER BY
    would otherwise make ranks engine-specific).  Envelope: per-key
    Σrank² must fit int64 → keys up to ~2M rows.
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                "_x": batch.column(x_col),
                "_y": batch.column(y_col),
                seq: batch.column(seq),
            }
        )
        keep = pc.and_(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_x").combine_chunks().is_valid(),
            ),
            t.column("_y").combine_chunks().is_valid(),
        )
        t = t.filter(keep)
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def rho(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        n = g.num_rows
        key_type = g.schema.field(key).type
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], type=key_type),
                    "n_pairs": pa.array([], type=pa.int64()),
                    out_col: pa.array([], type=pa.float64()),
                }
            )
        # canonical order: by key, then seq (stable row identity)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[(key, "ascending"), (seq, "ascending")]
            )
        )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        seg_start = si[seg_id]

        def ranks(col: str) -> np.ndarray:
            order = pc.sort_indices(
                g,
                sort_keys=[
                    (key, "ascending"),
                    (col, "ascending"),
                    (seq, "ascending"),
                ],
            ).to_numpy(zero_copy_only=False)
            r = np.empty(n, dtype=np.int64)
            # position within the key segment (+1) = row_number
            r[order] = np.arange(n, dtype=np.int64)
            return r - seg_start + 1

        rx = ranks("_x")
        ry = ranks("_y")
        cnt = np.add.reduceat(np.ones(n, dtype=np.int64), si)
        sx = np.add.reduceat(rx, si)
        sy = np.add.reduceat(ry, si)
        sxx = np.add.reduceat(rx * rx, si)
        syy = np.add.reduceat(ry * ry, si)
        sxy = np.add.reduceat(rx * ry, si)
        fn = cnt.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            num = fn * sxy.astype(np.float64) - sx.astype(
                np.float64
            ) * sy.astype(np.float64)
            dx = fn * sxx.astype(np.float64) - sx.astype(
                np.float64
            ) * sx.astype(np.float64)
            dy = fn * syy.astype(np.float64) - sy.astype(
                np.float64
            ) * sy.astype(np.float64)
            rho_v = num / (np.sqrt(dx) * np.sqrt(dy))
        ok = (dx > 0.0) & (dy > 0.0)
        karr = g.column(key).combine_chunks()
        return pa.table(
            {
                key: karr.take(pa.array(si)),
                "n_pairs": pa.array(cnt, type=pa.int64()),
                out_col: pa.array(rho_v, type=pa.float64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(rho, batch_format="pyarrow")
    )


def gini_by_key(
    ds,
    *,
    key: str,
    seq: str,
    value_col: str,
    out_col: str = "gini",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """PER-KEY Gini coefficient of a positive metric — the
    inequality/concentration diagnostic (sibling of :func:`hhi_by_key`
    at the individual-value rather than member-share level)::

        G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)   over x sorted ascending,
                                               i = 1-based rank

    ONE hash exchange of ``(key, seq, cents)`` (same shape as
    :func:`standardize_by_key`); the within-key sort gives ranks, and the
    rank-weighted sums are segmented ``reduceat`` — all int64-exact, with
    the deterministic ``(value, seq)`` tie-break making ranks equal to the
    oracle's ``row_number``.  The finalization is the integer expression
    above with ONE cast-then-divide — hash-exact vs SQL.  Non-positive
    and null values are excluded (Gini is defined on positive mass);
    keys left with fewer than 2 values yield null.  Null keys dropped
    (keyed-kernel policy).  Envelope: Σ rank·cents must fit int64 — keys
    up to ~10⁶ rows at |cents| ≤ 3·10⁴.
    """

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)),
            pa.int64(),
        )
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                "_c": cents,
            }
        )
        keep = pc.and_(
            t.column(key).combine_chunks().is_valid(),
            pc.fill_null(pc.greater(t.column("_c"), 0), False),
        )
        t = t.filter(keep)
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def compute(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g,
            sort_keys=[
                (key, "ascending"),
                ("_c", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = g.take(idx)
        n = g.num_rows
        key_type = g.schema.field(key).type
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], type=key_type),
                    "n_values": pa.array([], type=pa.int64()),
                    out_col: pa.array([], type=pa.float64()),
                }
            )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        x = g.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        rank = np.arange(n, dtype=np.int64) - si[seg_id] + 1
        cnt = np.add.reduceat(np.ones(n, dtype=np.int64), si)
        sx = np.add.reduceat(x, si)
        srx = np.add.reduceat(rank * x, si)
        with np.errstate(divide="ignore", invalid="ignore"):
            gini = (2 * srx - (cnt + 1) * sx).astype(np.float64) / (
                cnt.astype(np.float64) * sx.astype(np.float64)
            )
        ok = (cnt > 1) & (sx > 0)
        karr = g.column(key).combine_chunks()
        return pa.table(
            {
                key: karr.take(pa.array(si)),
                "n_values": pa.array(cnt, type=pa.int64()),
                out_col: pa.array(gini, type=pa.float64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(compute, batch_format="pyarrow")
    )


def contingency_cells(
    ds,
    *,
    key_col: str,
    ts_col: str,
    out_dow: str = "dow",
):
    """Contingency table of ``key_col`` × day-of-week with expected counts
    and the per-cell χ² contribution — the independence screen ("does
    event mix depend on weekday?") WITHOUT the order-dependent global χ²
    sum (each cell's statistic is a fixed expression, so the whole table
    is hash-exact; the caller can sum client-side if a single number is
    wanted).

    Per-batch ``(key, dow, n)`` combiner partials (≤ keys×7 rows per
    batch), one aggregate-sized fold in a single final task: margins via
    numpy, ``expected = (row·col)/total`` as cast-then-divide, and
    ``cell_chi2 = ((o−e)·(o−e))/e`` in exactly the oracle's expression
    order.  Day-of-week is Sunday=0 (DuckDB ``dayofweek``).  Null key or
    timestamp rows are excluded.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: batch.column(key_col),
                out_dow: pc.cast(
                    pc.day_of_week(
                        batch.column(ts_col),
                        week_start=7,
                        count_from_zero=True,
                    ),
                    pa.int64(),
                ),
            }
        )
        keep = pc.and_(
            t.column(key_col).combine_chunks().is_valid(),
            t.column(out_dow).combine_chunks().is_valid(),
        )
        g = (
            t.filter(keep)
            .group_by([key_col, out_dow])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, out_dow, "_n"])
        )
        return g.set_column(2, "_n", g.column("_n").cast(pa.int64()))

    def final(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by([key_col, out_dow])
            .aggregate([("_n", "sum")])
            .rename_columns([key_col, out_dow, "_n"])
        )
        keys = g.column(key_col).combine_chunks()
        dows = g.column(out_dow).to_numpy(zero_copy_only=False)
        o = g.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        kcodes = keys.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_keys = int(kcodes.max()) + 1 if len(kcodes) else 0
        row_tot = np.zeros(n_keys, dtype=np.int64)
        np.add.at(row_tot, kcodes, o)
        col_tot = np.zeros(7, dtype=np.int64)
        np.add.at(col_tot, dows, o)
        total = float(o.sum())
        rc = row_tot[kcodes] * col_tot[dows]
        e = rc.astype(np.float64) / total
        od = o.astype(np.float64)
        chi = ((od - e) * (od - e)) / e
        return pa.table(
            {
                key_col: keys,
                out_dow: g.column(out_dow),
                "observed": pa.array(o, type=pa.int64()),
                "expected": pa.array(e, type=pa.float64()),
                "cell_chi2": pa.array(chi, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def ks_two_sample(
    ds,
    *,
    value_col: str,
    group_mask_col: str,
    num_partitions: int = 32,
):
    """Two-sample Kolmogorov–Smirnov statistic between the rows where
    ``group_mask_col`` is true (sample A) and false (sample B) — the
    distribution-drift detector (new crawl vs old crawl, treatment vs
    control) as one exact number.

    Everything stays integer until ONE final division:
    ``D = max |n_b·cum_a(x) − n_a·cum_b(x)| / (n_a·n_b)`` over the sorted
    distinct fixed-point values.  Per-batch ``(cents, a, b)`` count
    partials, one hash exchange on cents, per-partition folds, then a
    single aggregate-sized final task (distinct cents values are bounded
    by the metric's range, not the row count) sorts and takes the
    cumulative max.  Null values and null masks are excluded.  Envelope:
    ``n_a·n_b`` must fit int64 (≈3·10⁹ rows per side).
    """

    def final(batch: pa.Table) -> pa.Table:
        t = batch.take(
            pc.sort_indices(batch, sort_keys=[("_c", "ascending")])
        )
        a = t.column("_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("_b").to_numpy(zero_copy_only=False).astype(np.int64)
        na, nb = int(a.sum()), int(b.sum())
        if na == 0 or nb == 0:
            # matches the oracle on one-sided inputs: the cross-products
            # are all zero (d_num 0) while ks = 0/0 stays null
            return pa.table(
                {
                    "n_a": pa.array([na], type=pa.int64()),
                    "n_b": pa.array([nb], type=pa.int64()),
                    "d_num": pa.array(
                        [0 if len(a) else None], type=pa.int64()
                    ),
                    "ks": pa.array([None], type=pa.float64()),
                }
            )
        ca = np.cumsum(a)
        cb = np.cumsum(b)
        d_num = int(np.abs(nb * ca - na * cb).max())
        return pa.table(
            {
                "n_a": pa.array([na], type=pa.int64()),
                "n_b": pa.array([nb], type=pa.int64()),
                "d_num": pa.array([d_num], type=pa.int64()),
                "ks": pa.array(
                    [float(d_num) / float(na * nb)], type=pa.float64()
                ),
            }
        )

    return _mask_value_counts(
        ds,
        value_col=value_col,
        group_mask_col=group_mask_col,
        num_partitions=num_partitions,
    ).map_batches(final, batch_format="pyarrow", batch_size=None)


def _mask_value_counts(
    ds, *, value_col: str, group_mask_col: str, num_partitions: int
):
    """Shared two-sample build: distinct fixed-point values with per-side
    counts ``(_c, _a, _b)`` — per-batch combiner, one hash exchange,
    partition-level folds, repartitioned to one aggregate-sized block
    (consumed by :func:`ks_two_sample` and
    :func:`mannwhitney_two_sample`)."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)),
            pa.int64(),
        ).combine_chunks()
        m = batch.column(group_mask_col).combine_chunks()
        keep = pc.and_(cents.is_valid(), m.is_valid())
        cents, m = cents.filter(keep), m.filter(keep)
        t = pa.table(
            {
                "_c": cents,
                "_a": pc.cast(m, pa.int64()),
                "_b": pc.cast(pc.invert(m), pa.int64()),
            }
        )
        g = (
            t.group_by("_c")
            .aggregate([("_a", "sum"), ("_b", "sum")])
            .rename_columns(["_c", "_a", "_b"])
        )
        g = pa.table(
            {
                "_c": g.column("_c"),
                "_a": g.column("_a").cast(pa.int64()),
                "_b": g.column("_b").cast(pa.int64()),
            }
        )
        parts = partition_ids(g.column("_c"), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by("_c")
            .aggregate([("_a", "sum"), ("_b", "sum")])
            .rename_columns(["_c", "_a", "_b"])
        )
        return pa.table(
            {
                "_c": g.column("_c"),
                "_a": g.column("_a").cast(pa.int64()),
                "_b": g.column("_b").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
        .repartition(1)
    )


def mannwhitney_two_sample(
    ds,
    *,
    value_col: str,
    group_mask_col: str,
    num_partitions: int = 32,
):
    """Mann-Whitney U (rank-sum) between the mask-true (A) and mask-false
    (B) samples — the median-shift drift test beside
    :func:`ks_two_sample`'s max-deviation.  Ties take the standard
    midrank correction, kept integer by doubling::

        U2 = 2·U_A = Σ_x ( 2·a(x)·cumB(<x) + a(x)·b(x) )

    over the shared distinct fixed-point count table; ``auc`` (the
    probability-of-superiority estimate U_A/(n_a·n_b)) is ONE division of
    exact integers — hash-exact vs the spelled-out SQL.  Null values and
    masks are excluded.  Envelope: U2 ≤ 2·n_a·n_b must fit int64.
    """

    def final(batch: pa.Table) -> pa.Table:
        t = batch.take(
            pc.sort_indices(batch, sort_keys=[("_c", "ascending")])
        )
        a = t.column("_a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("_b").to_numpy(zero_copy_only=False).astype(np.int64)
        na, nb = int(a.sum()), int(b.sum())
        if na == 0 or nb == 0:
            return pa.table(
                {
                    "n_a": pa.array([na], type=pa.int64()),
                    "n_b": pa.array([nb], type=pa.int64()),
                    "u2": pa.array(
                        [0 if len(a) else None], type=pa.int64()
                    ),
                    "auc": pa.array([None], type=pa.float64()),
                }
            )
        cb_excl = np.cumsum(b) - b
        u2 = int((2 * a * cb_excl + a * b).sum())
        return pa.table(
            {
                "n_a": pa.array([na], type=pa.int64()),
                "n_b": pa.array([nb], type=pa.int64()),
                "u2": pa.array([u2], type=pa.int64()),
                "auc": pa.array(
                    [float(u2) / float(2 * na * nb)], type=pa.float64()
                ),
            }
        )

    return _mask_value_counts(
        ds,
        value_col=value_col,
        group_mask_col=group_mask_col,
        num_partitions=num_partitions,
    ).map_batches(final, batch_format="pyarrow", batch_size=None)
