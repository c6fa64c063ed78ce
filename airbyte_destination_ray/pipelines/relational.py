"""Relational & streaming-window operators the reference lacks, built
Ray-Data-first (build-brief "custom operators" tier).

The reference performs no joins (SURVEY.md §2.4) — its one lookup is a
broadcast-small-side dict.  These operators generalize that pattern to the
shapes a 100 TB training-data pipeline actually needs, each designed around
its shuffle cost:

- broadcast hash join: small side shipped ONCE via ``ray.put`` and read
  zero-copy from the object store in every task — the big side never
  shuffles (vs. a hash-join exchange that would move every row).
- as-of join: hash-partition both sides by key once, then per-group sorted
  ``searchsorted`` — no global sort.
- sessionize / windowed counts / distinct count: per-batch partial reduce
  first, so the all-to-all exchange moves survivors, not input rows.

All emit deterministic, order-insensitive results so DuckDB oracles match
exactly (integer-cents sums; explicit tie-breaks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashing import composite_partition_ids, partition_ids

DEFAULT_NUM_PARTITIONS = 64


def _prep_join_side(ds, explicit_schema, side: str, *, will_rescan: bool = False):
    """Resolve a join input's schema WITHOUT ever executing its upstream
    pipeline twice.

    ``ds.schema()`` on a derived Dataset (behind a map_batches / all-to-all)
    executes the whole upstream to its first block, and the real execution
    then runs it AGAIN (measured 2× the revenue exchange on the TPC-H Q3
    composite).  Resolution order:

    1. caller-passed schema — free, the streaming path; composite wrappers
       should always do this;
    2. ``ds.schema(fetch_if_missing=False)`` — metadata-known for source
       reads / projections, still free;
    3. otherwise ``ds.materialize()`` once (with a loud warning) and read
       the schema off the materialized blocks — one execution instead of
       two, at the cost of holding the side in the object store (which
       spills) instead of streaming it into the exchange.

    ``will_rescan=True`` marks callers that will consume ``ds`` a second
    time even with a known schema (hot-key sampling, bloom prefilter): a
    derived input is then materialized regardless, because ``limit()``
    cannot early-stop past an upstream all-to-all.
    """
    known = ds.schema(fetch_if_missing=False)
    if explicit_schema is None and known is not None:
        explicit_schema = known
    if explicit_schema is None or (will_rescan and known is None):
        import warnings

        why = (
            "its schema is unknown"
            if explicit_schema is None
            else "it would be consumed twice (hot-key sampling / prefilter)"
        )
        warnings.warn(
            f"{side} input to a join is a derived Dataset and {why}; "
            f"materializing it once to avoid re-executing its pipeline. "
            f"Pass {side}_schema= (and hot_keys=None or an explicit list, "
            f"prefilter=None) to keep the side streaming.",
            RuntimeWarning,
            stacklevel=3,
        )
        ds = ds.materialize()
        if explicit_schema is None:
            explicit_schema = ds.schema()
    return ds, explicit_schema


# ---------------------------------------------------------------------------
# broadcast hash join
# ---------------------------------------------------------------------------


class _BroadcastJoiner:
    """Actor-pool stage: fetch the broadcast small side once per actor
    (zero-copy from the object store), hash-join every batch against it
    with Arrow's vectorized join kernel."""

    def __init__(self, small_ref, *, left_on, right_on, join_type, select):
        small = ray.get(small_ref)
        # Pre-combine once: Acero joins are fastest on a single chunk.
        self.small = small.combine_chunks()
        self.left_on = left_on
        self.right_on = right_on
        self.join_type = join_type
        self.select = select

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.join(
            self.small,
            keys=self.left_on,
            right_keys=self.right_on,
            join_type=self.join_type,
        )
        if self.select is not None:
            out = out.select(self.select)
        return out


def broadcast_join(
    ds,
    small: pa.Table,
    *,
    left_on: str,
    right_on: str,
    join_type: str = "inner",
    select: list[str] | None = None,
    concurrency=(1, 8),
    batch_size: int | None = None,
):
    """Join a big Dataset against a small in-memory Arrow table without any
    shuffle of the big side (SURVEY.md §2.4 broadcast-lookup generalized).

    ``small`` is ``ray.put`` once; every join actor reads it zero-copy from
    the shared object store in ``__init__`` — never re-shipped per batch.
    At 100 TB the big side streams through stateless-looking actors while
    the dimension table (customers, nation map, vocab) stays resident.
    """
    small_ref = ray.put(small)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs=dict(
            small_ref=small_ref,
            left_on=left_on,
            right_on=right_on,
            join_type=join_type,
            select=select,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _broadcast_membership(ds, keys, *, on: str, keep_members: bool):
    """Semi/anti join against a broadcast key set: the keys ship once via
    ``ray.put`` (sorted numpy array), membership is a vectorized
    ``searchsorted`` per batch — no shuffle at all."""
    keys = np.unique(np.asarray(keys))
    ref = ray.put(keys)

    def fn(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        col = batch.column(on)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null-key policy (SQL three-valued logic): `x IN (...)` and
        # `x NOT IN (...)` are both NULL for null x, so null-key rows are
        # dropped by BOTH semi and anti join.  Nulls are masked out before
        # searchsorted — a nullable int column otherwise converts to float64
        # (precision loss past 2^53) and a string column with None raises a
        # TypeError comparing None to str.
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        member = np.zeros(len(col), dtype=bool)
        if len(k) and valid.any():
            vv = col.drop_null().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(k, vv)
            m = pos < len(k)
            m &= k[np.clip(pos, 0, len(k) - 1)] == vv
            member[valid] = m
        keep = member if keep_members else (~member & valid)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def semi_join(ds, keys, *, on: str):
    """Keep rows whose ``on`` value is in the broadcast key set (EXISTS /
    IN-subquery shape) — zero-shuffle."""
    return _broadcast_membership(ds, keys, on=on, keep_members=True)


def anti_join(ds, keys, *, on: str):
    """Drop rows whose ``on`` value is in the broadcast key set (NOT IN /
    blocklist-filter shape — the canonical "remove flagged documents" stage
    of a training-data pipeline) — zero-shuffle."""
    return _broadcast_membership(ds, keys, on=on, keep_members=False)


def sales_by_nation(orders_ds, customer: pa.Table, nation: pa.Table):
    """Two-level broadcast rollup: orders ⋈ customer ⋈ nation → total sales
    (integer cents) per nation name.

    The two dimension tables are pre-joined driver-side (25 × 1 500 rows)
    into one (custkey → nation-name) map, broadcast once; the fact table
    then needs a single broadcast join and a tiny pre-aggregated groupby —
    the exchange carries one row per (nation, batch).
    """
    dim = customer.select(["c_custkey", "c_nationkey"]).join(
        nation.select(["n_nationkey", "n_name"]),
        keys="c_nationkey",
        right_keys="n_nationkey",
        join_type="inner",
    ).select(["c_custkey", "n_name"])
    dim_ref = ray.put(dim.combine_chunks())

    class _RollupStage:
        def __init__(self):
            self.dim = ray.get(dim_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cents = pc.cast(
                pc.floor(pc.multiply(batch.column("o_totalprice"), 100.0)),
                pa.int64(),
            )
            t = pa.table(
                {"o_custkey": batch.column("o_custkey"), "_cents": cents}
            )
            j = t.join(
                self.dim,
                keys="o_custkey",
                right_keys="c_custkey",
                join_type="inner",
            )
            # count_all, not ("_cents", "count"): a null o_totalprice
            # makes _cents null and count skips nulls — n_orders must be
            # SQL count(*) over the joined rows
            return j.group_by("n_name").aggregate(
                [("_cents", "sum"), ([], "count_all")]
            )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": [group.column("n_name")[0].as_py()],
                "n_orders": pa.array(
                    [int(pc.sum(group.column("count_all")).as_py())],
                    type=pa.int64(),
                ),
                "sales_cents": pa.array(
                    [int(pc.sum(group.column("_cents_sum")).as_py())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        orders_ds.map_batches(
            _RollupStage,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=(1, 8),
        )
        .groupby("n_name")
        .map_groups(final, batch_format="pyarrow")
    )


_SKEW_GOLDEN = 0x9E3779B97F4A7C15


def _detect_hot_keys(
    ds,
    on: str,
    *,
    share: float,
    per_batch_top: int = 32,
    max_hot: int = 64,
    max_sample_rows: int = 250_000,
) -> list:
    """Sample-detect join keys holding more than ``share`` of the rows.

    Bounded pass over the key column: at most ``max_sample_rows`` rows are
    read (``limit`` early-stops the scan, so at 100 TB this costs a few
    blocks, not a full pass); each batch contributes its top-N key counts
    plus its row count; the driver sums the candidates and keeps keys above
    the sampled share.  A key above the share is above it in essentially
    any contiguous sample (hot keys are present throughout the stream), so
    truncation cannot hide it; a missed key only costs skew protection,
    never correctness.
    """
    if max_sample_rows:
        ds = ds.limit(max_sample_rows)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"k": batch.column(on)})
        g = t.group_by("k").aggregate([([], "count_all")])
        if g.num_rows > per_batch_top:
            idx = pc.sort_indices(
                g, sort_keys=[("count_all", "descending")]
            )[:per_batch_top]
            g = g.take(idx)
        return g.append_column(
            "batch_rows",
            pa.array(
                np.r_[batch.num_rows, np.zeros(g.num_rows - 1, dtype=np.int64)]
                if g.num_rows
                else np.array([], dtype=np.int64)
            ),
        )

    parts = list(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow")
    )
    if not parts:
        return []
    t = pa.concat_tables(parts)
    total = int(pc.sum(t.column("batch_rows")).as_py() or 0)
    if total == 0:
        return []
    agg = (
        t.select(["k", "count_all"])
        .filter(t.column("k").combine_chunks().is_valid())
        .group_by("k")
        .aggregate([("count_all", "sum")])
    )
    cnt = agg.column("count_all_sum").to_numpy(zero_copy_only=False)
    hot_idx = np.nonzero(cnt >= share * total)[0]
    if len(hot_idx) > max_hot:
        hot_idx = hot_idx[np.argsort(-cnt[hot_idx])[:max_hot]]
    return agg.column("k").take(pa.array(hot_idx, type=pa.int64())).to_pylist()


def shuffle_join(
    left_ds,
    right_ds,
    *,
    left_on: str,
    right_on: str,
    select: list[str] | None = None,
    join_type: str = "inner",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    hot_keys="auto",
    salt_factor: int = 8,
    prefilter: str | None = None,
    bloom_bits_pow2: int = 23,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Big×big equijoin (``inner``, ``left outer``, ``right outer`` or
    ``full outer``): ONE hash-partition shuffle per side on the join key,
    then a per-partition Arrow (Acero) hash join.  Null keys follow SQL
    semantics (never match; surviving outer rows keep them).  Use when both
    sides are too large to broadcast — otherwise :func:`broadcast_join` (no
    shuffle at all) wins.

    For the outer types that emit unmatched RIGHT rows (``full outer``,
    ``right outer``) Acero coalesces the key columns, so the ``left_on``
    output column carries the right key on right-only rows — same as
    ``COALESCE(l.key, r.key)`` in the SQL formulation.

    Both sides ride one union'd envelope (each side's non-key columns
    null-filled on the other side) so a single ``groupby`` co-locates
    matching keys; the per-group kernel splits the sides back out and joins
    them vectorized.

    **Skew split**: a key holding a large share of the LEFT side would
    concentrate one group (the classic straggler).  ``hot_keys="auto"``
    sample-detects such keys (share ≥ 2/num_partitions, one cheap pass over
    the left key column); hot LEFT rows are salted across ``salt_factor``
    sub-partitions and the matching RIGHT rows are replicated to each — the
    standard replicate-broadcast skew join, folded into the same single
    exchange (each (l, r) pair still meets exactly once; left-outer rows
    still appear exactly once).  COST CAVEAT: the sampling pass consumes
    the left Dataset once more, and ``limit()`` cannot early-stop past an
    upstream all-to-all — when the left side is itself a shuffle output
    (grouped aggregate, prior join), pass ``hot_keys=None`` (keys unique
    by construction ⇒ no skew) or an explicit list, as every composite
    wrapper in ``__ray_entry__`` does.  Assumes the per-hot-key RIGHT side is
    modest (× ``salt_factor`` replication); a key hot on BOTH sides is
    inherently quadratic and needs an application-level split.  Pass an
    explicit key list, or ``None`` to disable.
    """
    # Schema + rescan guard (see _prep_join_side): derived inputs are
    # materialized ONCE instead of being silently re-executed by
    # ds.schema() / the hot-key sampling pass / the bloom prefilter.
    # Callers joining shuffle outputs should still pass the schemas they
    # already know (and hot_keys=None when keys are unique) to stay
    # streaming — every composite wrapper in __ray_entry__ does.
    left_rescans = (
        isinstance(hot_keys, str)
        and hot_keys == "auto"
        and join_type in ("inner", "left outer")
    ) or prefilter == "bloom"
    left_ds, lschema = _prep_join_side(
        left_ds, left_schema, "left", will_rescan=left_rescans
    )
    right_ds, rschema = _prep_join_side(right_ds, right_schema, "right")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    rpayload = [c for c in rschema.names if c != right_on]
    clash = set(lschema.names) & set(rpayload)
    if clash:
        raise ValueError(f"column name clash: {sorted(clash)}")

    if prefilter == "bloom":
        # prune the RIGHT side before its exchange with a bloom of the left
        # keys (one extra column-pruned pass over the left).  Correctness-
        # neutral: false positives are discarded by the exact per-partition
        # join.  Only for join types that DROP unmatched right rows —
        # full/right outer must keep them, so pruning is refused there.
        if join_type not in ("inner", "left outer"):
            raise ValueError(
                "prefilter='bloom' only applies to join types that drop "
                "unmatched right rows (inner, left outer)"
            )
        right_ds = bloom_semi_filter(
            right_ds,
            left_ds.select_columns([left_on]),
            on=right_on,
            keys_on=left_on,
            bits_pow2=bloom_bits_pow2,
        )
    elif prefilter is not None:
        raise ValueError(f"unknown prefilter {prefilter!r}")

    if join_type not in ("inner", "left outer"):
        # the skew split replicates RIGHT rows across sub-partitions; a
        # join type that emits unmatched right rows (full/right outer)
        # would emit one unmatched copy per replica — disable it
        hot_list = []
        hot_keys = None
    if isinstance(hot_keys, str) and hot_keys == "auto":
        hot_list = _detect_hot_keys(
            left_ds, left_on, share=2.0 / num_partitions
        )
    elif hot_keys is None:
        hot_list = []
    else:
        hot_list = list(hot_keys)

    def _sub_parts(h: np.ndarray, salt: np.ndarray) -> np.ndarray:
        mixed = h ^ ((salt.astype(np.uint64) + np.uint64(1)) * np.uint64(_SKEW_GOLDEN))
        return (mixed % np.uint64(num_partitions)).astype(np.int64)

    def env_side(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            from ..functions.hashing import stable_hash_array

            n = batch.num_rows
            cols = {}
            key = batch.column(left_on if is_left else right_on)
            for c in lschema.names:
                if is_left:
                    cols[c] = batch.column(c)
                else:
                    cols[c] = key if c == left_on else pa.nulls(n, ltypes[c])
            for c in rpayload:
                cols[c] = batch.column(c) if not is_left else pa.nulls(
                    n, rtypes[c]
                )
            cols["_side"] = pa.array(
                np.full(n, 1 if is_left else 0, dtype=np.int8)
            )
            t = pa.table(cols)
            h = stable_hash_array(key)
            parts = (h % np.uint64(num_partitions)).astype(np.int64)
            if not hot_list:
                return t.append_column("_part", pa.array(parts, type=pa.int64()))
            key_c = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
            is_hot = pc.is_in(
                key_c, value_set=pa.array(hot_list).cast(key_c.type)
            ).to_numpy(zero_copy_only=False)
            if is_left:
                hot_pos = np.nonzero(is_hot)[0]
                if len(hot_pos):
                    salt = np.arange(len(hot_pos)) % salt_factor
                    parts[hot_pos] = _sub_parts(h[hot_pos], salt)
                return t.append_column("_part", pa.array(parts, type=pa.int64()))
            # right side: cold rows route normally; hot rows are replicated
            # to every DISTINCT sub-partition their salted left rows can
            # land in.  Distinct matters: two salt values can collide on
            # the same sub-partition (guaranteed when salt_factor >
            # num_partitions), and emitting a copy per SALT instead of per
            # TARGET would put two identical right rows in one partition —
            # every hot join pair would then appear twice.
            cold = t.filter(pa.array(~is_hot)).append_column(
                "_part", pa.array(parts[~is_hot], type=pa.int64())
            )
            pieces = [cold]
            hot_t = t.filter(pa.array(is_hot))
            h_hot = h[is_hot]
            subs = np.stack(
                [
                    _sub_parts(h_hot, np.full(len(h_hot), i, dtype=np.int64))
                    for i in range(salt_factor)
                ]
            ) if len(h_hot) else np.zeros((salt_factor, 0), dtype=np.int64)
            for i in range(salt_factor):
                fresh = np.ones(subs.shape[1], dtype=bool)
                for j in range(i):
                    fresh &= subs[i] != subs[j]
                if not fresh.any():
                    continue
                pieces.append(
                    hot_t.filter(pa.array(fresh)).append_column(
                        "_part", pa.array(subs[i][fresh], type=pa.int64())
                    )
                )
            return pa.concat_tables(pieces)

        return fn

    env = left_ds.map_batches(
        env_side(True), batch_format="pyarrow", batch_size=None
    ).union(
        right_ds.map_batches(
            env_side(False), batch_format="pyarrow", batch_size=None
        )
    )

    out_cols = select or (list(lschema.names) + rpayload)

    def join_group(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 1)
        left = group.filter(lmask).select(list(lschema.names))
        right = group.filter(pc.invert(lmask)).select(
            [left_on] + rpayload
        ).rename_columns([right_on] + rpayload)
        joined = left.combine_chunks().join(
            right.combine_chunks(),
            keys=left_on,
            right_keys=right_on,
            join_type=join_type,
        )
        return joined.select(out_cols)

    return env.groupby("_part").map_groups(join_group, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join(
    left_ds,
    right_ds,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_seq: str,
    right_keep: list[str],
    suffix: str = "_right",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
):
    """As-of (point-in-time) left join: for each left row, attach the most
    recent right row with ``right_ts <= left_ts`` for the same ``on`` key
    (ties on ``right_ts`` broken by max ``right_seq`` — deterministic).

    ``tolerance_us`` (pandas ``merge_asof(tolerance=…)``): a match farther
    than this many µs from ``left_ts`` is treated as NO match (right
    columns null) — one post-pass masks the winners, the join itself is
    unchanged.

    ``direction="forward"`` flips the match to the EARLIEST right row with
    ``right_ts >= left_ts`` (ties broken by MIN ``right_seq``) — pandas
    ``merge_asof(direction="forward")``.  Implemented by negating the
    envelope's order columns, so the backward kernel serves both
    directions unchanged.

    Ray Data has no as-of join; this is the documented composition
    (build brief "custom operators" (a)): tag the two sides into a common
    envelope, ONE hash-partition shuffle by key, then a per-group sorted
    merge (segmented cumulative max over the interleaved order) — no global
    sort, no per-row loop.  Partitioning assumption: all rows of one key fit
    in one group (same as any keyed merge; salt + two-stage does NOT apply
    because as-of is not associative — hot keys instead rely on Ray spilling
    large groups).  ``right_keep`` columns ride the shared envelope in their
    NATIVE Arrow types (null-filled on the left side); the winner gather is
    a null-masked ``take``, so any type — strings, lists, structs — joins
    through.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}"
        )
    sign = 1 if direction == "backward" else -1
    added_ts = tolerance_us is not None and right_ts not in right_keep
    if added_ts:
        right_keep = [*right_keep, right_ts]
    right_out = [f"{c}{suffix}" for c in right_keep]
    # Schema guard (see _prep_join_side): derived inputs materialize once
    # instead of ds.schema() silently re-executing their pipeline; callers
    # joining shuffle outputs should pass the schemas they know.
    right_ds, right_schema = _prep_join_side(right_ds, right_schema, "right")
    rkeep_types = dict(zip(right_schema.names, right_schema.types))

    def env_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {c: batch.column(c) for c in batch.column_names}
        cols["_ats"] = pc.multiply(
            pc.cast(batch.column(left_ts), pa.int64()), sign
        )
        cols["_aseq"] = pa.nulls(n, pa.int64())
        cols["_side"] = pa.array(np.ones(n, dtype=np.int8))
        for c, oc in zip(right_keep, right_out):
            cols[oc] = pa.nulls(n, rkeep_types[c])
        t = pa.table(cols)
        parts = partition_ids(t.column(on), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def make_env_right(left_cols: list[str], left_types: dict):
        def env_right(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {}
            for c in left_cols:
                if c == on:
                    cols[c] = batch.column(on)
                else:
                    cols[c] = pa.nulls(n, left_types[c])
            cols["_ats"] = pc.multiply(
                pc.cast(batch.column(right_ts), pa.int64()), sign
            )
            cols["_aseq"] = pc.multiply(
                pc.cast(batch.column(right_seq), pa.int64()), sign
            )
            cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
            for c, oc in zip(right_keep, right_out):
                cols[oc] = batch.column(c)
            t = pa.table(cols)
            parts = partition_ids(t.column(on), num_partitions)
            return t.append_column("_part", pa.array(parts, type=pa.int64()))

        return env_right

    left_ds, left_schema = _prep_join_side(left_ds, left_schema, "left")
    left_schema_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))

    env = left_ds.map_batches(
        env_left, batch_format="pyarrow", batch_size=None
    ).union(
        right_ds.map_batches(
            make_env_right(left_schema_cols, left_types),
            batch_format="pyarrow",
            batch_size=None,
        )
    )

    payload_cols = [c for c in left_schema_cols]

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask = side == 1
        left = group.filter(pa.array(lmask))
        right = group.filter(pa.array(~lmask))
        if left.num_rows == 0:
            return pa.table(
                {
                    **{c: pa.array([], left_types[c]) for c in payload_cols},
                    **{
                        oc: pa.array([], rkeep_types[c])
                        for c, oc in zip(right_keep, right_out)
                    },
                }
            )
        out_cols = {c: left.column(c) for c in payload_cols}
        lts = left.column("_ats").to_numpy(zero_copy_only=False)
        if right.num_rows == 0:
            for c, oc in zip(right_keep, right_out):
                out_cols[oc] = pa.nulls(left.num_rows, rkeep_types[c])
            return pa.table(out_cols)
        # sort right by (key, ts, seq): within a key the LAST row at or
        # before lts is the as-of winner with max (ts, seq).
        ridx = pc.sort_indices(
            right,
            sort_keys=[
                (on, "ascending"),
                ("_ats", "ascending"),
                ("_aseq", "ascending"),
            ],
        )
        right = right.take(ridx)
        rkey = right.column(on).to_numpy(zero_copy_only=False)
        rts = right.column("_ats").to_numpy(zero_copy_only=False)
        lkey = left.column(on).to_numpy(zero_copy_only=False)
        # Vectorized sort-merge: interleave both sides sorted by
        # (key, ts, side) with rights before lefts at equal ts, then a
        # segmented cumulative max of right indices (reset per key via an
        # offset trick) gives each left row its latest right-at-or-before
        # position — no per-row Python loop.
        m, n = len(rkey), left.num_rows
        k_all = np.concatenate([rkey, lkey])
        t_all = np.concatenate([rts, lts])
        side_all = np.concatenate(
            [np.zeros(m, dtype=np.int8), np.ones(n, dtype=np.int8)]
        )
        order2 = np.lexsort((side_all, t_all, k_all))
        kk = k_all[order2]
        newkey = np.ones(m + n, dtype=bool)
        newkey[1:] = kk[1:] != kk[:-1]
        seg = np.cumsum(newkey).astype(np.int64)
        val = np.where(order2 < m, order2, -1).astype(np.int64)
        off = np.int64(m + 2)
        last = np.maximum.accumulate(val + seg * off) - seg * off
        is_left = order2 >= m
        pos = np.empty(n, dtype=np.int64)
        pos[order2[is_left] - m] = last[is_left]
        found = pos >= 0
        # null-masked gather: a null index takes to null, so every right
        # payload type (string/list/struct) joins through natively
        idx = pa.array(np.clip(pos, 0, None), type=pa.int64(), mask=~found)
        for oc in right_out:
            col = right.column(oc)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out_cols[oc] = col.take(idx)
        return pa.table(out_cols)

    out = env.groupby("_part").map_groups(merge, batch_format="pyarrow")
    if tolerance_us is None:
        return out
    tcol = f"{right_ts}{suffix}"
    masked_cols = list(right_out)

    def apply_tolerance(batch: pa.Table) -> pa.Table:
        lt = pc.cast(batch.column(left_ts), pa.int64())
        rt = pc.cast(batch.column(tcol), pa.int64())
        bad = pc.fill_null(
            pc.greater(pc.abs(pc.subtract(lt, rt)), tolerance_us), False
        )
        cols = {}
        for name in batch.column_names:
            col = batch.column(name)
            if name in masked_cols:
                col = pc.if_else(bad, pa.scalar(None, type=col.type), col)
            cols[name] = col
        t = pa.table(cols)
        return t.drop_columns([tcol]) if added_ts else t

    return out.map_batches(
        apply_tolerance, batch_format="pyarrow", batch_size=None
    )


def asof_conversion(
    events_ds,
    *,
    left_type="purchase",
    right_type="click",
    tolerance_us: int | None = None,
):
    """For each *purchase* event, the user's latest *click* at or before the
    purchase timestamp (classic attribution as-of join), built from one
    events Dataset split into two sides.  ``tolerance_us`` bounds the
    attribution window (clicks older than that are not credited)."""
    def side_filter(value):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("event_type"), value))

        return fn

    left = events_ds.map_batches(
        side_filter(left_type), batch_format="pyarrow", batch_size=None
    )
    right = events_ds.map_batches(
        side_filter(right_type), batch_format="pyarrow", batch_size=None
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_seq="event_id",
        right_keep=["event_id"],
        suffix="_click",
        tolerance_us=tolerance_us,
    )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(
            ["event_id", "ts", "user_id", "value", "event_id_click"]
        ).rename_columns(
            ["event_id", "ts", "user_id", "value", "click_event_id"]
        )

    return out.map_batches(project, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# streaming windows
# ---------------------------------------------------------------------------


def windowed_counts(
    ds,
    *,
    ts_col: str = "ts",
    key: str = "event_type",
    unit: str = "hour",
):
    """Tumbling-window count per (window, key): truncate-to-window + partial
    per-batch count, tiny final reduce — the streaming windowed aggregate
    over event time.  Exchange carries one row per (window, key, batch)."""

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch.column(ts_col), unit=unit)
        t = pa.table({"window_start": win, key: batch.column(key)})
        # count_all, not ("window_start", "count"): a null ts truncates
        # to a null window and count skips nulls — the (null, key) group
        # must report its row count (SQL count(*) semantics)
        return t.group_by(["window_start", key]).aggregate(
            [([], "count_all")]
        )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": [group.column("window_start")[0].as_py()],
                key: [group.column(key)[0].as_py()],
                "n_events": pa.array(
                    [int(pc.sum(group.column("count_all")).as_py())],
                    type=pa.int64(),
                ),
            },
            schema=pa.schema(
                [
                    pa.field(
                        "window_start", group.schema.field("window_start").type
                    ),
                    pa.field(key, group.schema.field(key).type),
                    pa.field("n_events", pa.int64()),
                ]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", key])
        .map_groups(final, batch_format="pyarrow")
    )


def sliding_window_counts(
    ds,
    *,
    ts_col: str = "ts",
    key: str = "event_type",
    window_minutes: float = 60.0,
    slide_minutes: float = 15.0,
):
    """Sliding-window count per ``(window_start, key)``: window
    ``[ws, ws + window)`` for every ``ws`` that is a multiple of ``slide``
    — completes the window family (tumbling `windowed_counts`, session
    `sessionize`).  Requires ``window % slide == 0``; rows with a null
    timestamp are dropped (SQL ``WHERE ts IS NOT NULL``).

    The naive plan expands every EVENT into ``window/slide`` rows before
    aggregating; this one pre-aggregates per SLIDE BUCKET per batch first,
    so the replication factor applies to aggregated ``(bucket, key)`` rows
    only — the exchange carries ``window/slide`` rows per (bucket, key,
    batch) regardless of event count.  Each event's bucket start is a
    member of exactly ``window/slide`` windows (``bucket − i·slide``,
    ``i < window/slide``), so bucket-level expansion is lossless.
    """
    win_us = int(window_minutes * 60 * 1_000_000)
    slide_us = int(slide_minutes * 60 * 1_000_000)
    if win_us % slide_us != 0:
        raise ValueError("window_minutes must be a multiple of slide_minutes")
    r = win_us // slide_us

    def partial(batch: pa.Table) -> pa.Table:
        valid = batch.column(ts_col).combine_chunks().is_valid()
        t = pa.table(
            {
                "_tus": pc.cast(batch.column(ts_col), pa.int64()),
                key: batch.column(key),
            }
        ).filter(valid)
        tus = t.column("_tus").to_numpy(zero_copy_only=False)
        bucket = (tus // slide_us) * slide_us
        g = (
            pa.table({"b": pa.array(bucket, type=pa.int64()), key: t.column(key)})
            .group_by(["b", key], use_threads=False)
            .aggregate([([], "count_all")])
        )
        b = g.column("b").to_numpy(zero_copy_only=False)
        pieces = [
            pa.table(
                {
                    "window_start": pa.array(b - i * slide_us, type=pa.int64()),
                    key: g.column(key),
                    "n": g.column("count_all").cast(pa.int64()),
                }
            )
            for i in range(r)
        ]
        return pa.concat_tables(pieces)

    def final(group: pa.Table) -> pa.Table:
        ws = group.column("window_start")[0].as_py()
        return pa.table(
            {
                "window_start": pa.array([ws], type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                key: [group.column(key)[0].as_py()],
                "n_events": pa.array(
                    [int(pc.sum(group.column("n")).as_py())], type=pa.int64()
                ),
            },
            schema=pa.schema(
                [
                    pa.field("window_start", pa.timestamp("us")),
                    pa.field(key, group.schema.field(key).type),
                    pa.field("n_events", pa.int64()),
                ]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", key])
        .map_groups(final, batch_format="pyarrow")
    )


def sessionize(
    ds,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    seq: str = "event_id",
    gap_minutes: float = 30.0,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Session windows: per key, order events by ``(ts, seq)`` and start a
    new session whenever the gap to the previous event exceeds
    ``gap_minutes``.  Returns ``(seq, key, session_id)`` with 1-based
    session ids.

    One hash-partition shuffle by key; the per-group kernel is a vectorized
    diff + cumsum (no row loop).  Session assignment is not associative, so
    (like any sessionizer) a key's events must co-locate — the partition
    count spreads keys, not one key.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def assign(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        # null-safe key equality (dictionary codes — see throttle_by_key)
        keys = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        n = len(keys)
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            same_key = keys[1:] == keys[:-1]
            small_gap = (ts[1:] - ts[:-1]) <= gap_us
            new_sess[1:] = ~(same_key & small_gap)
        # per-key 1-based session index: cumsum of new-session flags minus
        # the cumsum value at each key's first row + 1
        cs = np.cumsum(new_sess)
        key_start = np.ones(n, dtype=bool)
        if n > 1:
            key_start[1:] = keys[1:] != keys[:-1]
        start_cs = np.maximum.accumulate(np.where(key_start, cs - 1, 0))
        sess = cs - start_cs
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                "session_id": pa.array(sess, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(assign, batch_format="pyarrow")
    )


def session_size_histogram(
    ds,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    seq: str = "event_id",
    gap_minutes: float = 30.0,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Distribution of session sizes (events per session) under the same
    gap rule as :func:`sessionize` — the bounce-rate / engagement-depth
    report (``n_sessions`` at ``session_events = 1`` IS the bounce
    count).

    Same single keyed exchange as sessionize; the per-partition kernel
    computes session boundaries vectorized and emits ``(size, n)`` value
    counts — session sizes are tiny-cardinality, so the partials fold
    driver-side into the final histogram.  Null keys form one SQL-style
    session partition (dictionary-code equality, like sessionize).
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def sizes(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        keys = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table(
                {
                    "session_events": pa.array([], type=pa.int64()),
                    "n_sessions": pa.array([], type=pa.int64()),
                }
            )
        new_sess = np.ones(n, dtype=bool)
        if n > 1:
            same_key = keys[1:] == keys[:-1]
            # SQL `ts - prev_ts > gap` on a NULL ts is NULL -> false ->
            # SAME session; a null ts reaches numpy as NaN (int64-with-
            # nulls decays to float64), so express "small gap" as NOT
            # (gap > threshold) — NaN > x is False, keeping SQL parity
            with np.errstate(invalid="ignore"):
                big_gap = (ts[1:] - ts[:-1]) > gap_us
            new_sess[1:] = ~(same_key & ~big_gap)
        starts = np.flatnonzero(new_sess)
        seg_len = np.diff(np.append(starts, n))
        vals, counts = np.unique(seg_len, return_counts=True)
        return pa.table(
            {
                "session_events": pa.array(vals, type=pa.int64()),
                "n_sessions": pa.array(
                    counts.astype(np.int64), type=pa.int64()
                ),
            }
        )

    partials = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(sizes, batch_format="pyarrow")
    )
    chunks = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in partials.iter_batches(batch_format="pyarrow")
    ]
    chunks = [c for c in chunks if c.num_rows]
    if not chunks:
        return pa.table(
            {
                "session_events": pa.array([], type=pa.int64()),
                "n_sessions": pa.array([], type=pa.int64()),
            }
        )
    t = pa.concat_tables(chunks, promote_options="permissive")
    return (
        t.group_by("session_events", use_threads=False)
        .aggregate([("n_sessions", "sum")])
        .rename_columns(["session_events", "n_sessions"])
    )


# ---------------------------------------------------------------------------
# distinct count
# ---------------------------------------------------------------------------


def running_sum(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    value_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key running sum ordered by ``(ts, seq)`` — the cumulative window
    aggregate (``SUM(...) OVER (PARTITION BY key ORDER BY ts, seq ROWS
    UNBOUNDED PRECEDING)``).  One keyed shuffle of ``(key, ts, seq,
    value)``; the per-group kernel is a segmented cumsum (integer cents so
    the result is exactly order-independent and oracle-comparable)."""

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)), pa.int64()
        )
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                "_cents": cents,
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def accumulate(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        cents = g.column("_cents").to_numpy(zero_copy_only=False)
        n = len(keys)
        cs = np.cumsum(cents)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        # subtract the cumsum just before each key's first row (exact
        # segment-repeat — a running max would break on negative values)
        start_idx = np.nonzero(start)[0]
        counts = np.diff(np.append(start_idx, n))
        base = np.repeat(cs[start_idx] - cents[start_idx], counts)
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                "running_cents": pa.array(cs - base, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(accumulate, batch_format="pyarrow")
    )


def distinct_set_op(
    left_ds,
    right_ds,
    *,
    on: str,
    op: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Distributed ``EXCEPT`` / ``INTERSECT`` over the DISTINCT ``on``
    values of two datasets — the set-operation family for sides too large
    to broadcast (the broadcast shapes are :func:`semi_join` /
    :func:`anti_join`).

    Per-batch key dedup first (the exchange carries distinct keys per
    batch, never rows), then ONE hash partition co-locates each key from
    both sides; the per-group kernel ORs the side flags and filters.
    Null keys follow SQL bag-set semantics: ``EXCEPT`` / ``INTERSECT``
    treat NULL as equal to NULL (DISTINCT grouping), so a null key on the
    left survives EXCEPT only when the right has no null key.
    """
    if op not in ("except", "intersect"):
        raise ValueError("op must be 'except' or 'intersect'")

    def env(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select([on]).group_by(on).aggregate([])
            flag = np.ones(t.num_rows, dtype=np.int8)
            t = pa.table(
                {
                    on: t.column(on),
                    "_l": pa.array(flag if is_left else flag * 0),
                    "_r": pa.array(flag * 0 if is_left else flag),
                }
            )
            parts = partition_ids(t.column(on), num_partitions)
            return t.append_column("_part", pa.array(parts, type=pa.int64()))

        return fn

    both = left_ds.map_batches(
        env(True), batch_format="pyarrow", batch_size=None
    ).union(
        right_ds.map_batches(env(False), batch_format="pyarrow", batch_size=None)
    )

    def resolve(group: pa.Table) -> pa.Table:
        g = group.group_by(on).aggregate([("_l", "max"), ("_r", "max")])
        has_l = pc.equal(g.column("_l_max"), 1)
        has_r = pc.equal(g.column("_r_max"), 1)
        keep = (
            pc.and_(has_l, pc.invert(has_r))
            if op == "except"
            else pc.and_(has_l, has_r)
        )
        return g.filter(keep).select([on])

    return (
        both.groupby("_part").map_groups(resolve, batch_format="pyarrow")
    )


def dense_rank_filter(
    ds,
    *,
    key: str,
    order_col: str,
    k: int,
    descending: bool = True,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Keep rows whose ``order_col`` value is among the top-``k`` DISTINCT
    values within their key — the ``QUALIFY dense_rank() OVER (PARTITION
    BY key ORDER BY order_col DESC) <= k`` window filter (ties all
    survive, unlike row_number/top-k).  Appends the rank as ``rnk``.

    ONE keyed shuffle; the per-group kernel is a segmented cumsum over
    value-change boundaries of the ``(key, order_col)`` sort — no per-row
    Python.  Rows with a null ``order_col`` are dropped (SQL ORDER BY
    ranks them, but a QUALIFY threshold on nulls is engine-defined; the
    oracle formulation filters them explicitly).
    """

    def route(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            batch.column(order_col).combine_chunks().is_valid()
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    order = "descending" if descending else "ascending"

    def rank(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(key, "ascending"), (order_col, order)]
        )
        g = group.take(idx).drop_columns(["_part"])
        keys = g.column(key).to_numpy(zero_copy_only=False)
        vals = g.column(order_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return g.append_column("rnk", pa.array([], type=pa.int64()))
        seg = np.ones(n, dtype=bool)
        chg = np.ones(n, dtype=bool)
        if n > 1:
            seg[1:] = keys[1:] != keys[:-1]
            chg[1:] = seg[1:] | (vals[1:] != vals[:-1])
        r = np.cumsum(chg)
        seg_idx = np.nonzero(seg)[0]
        counts = np.diff(np.append(seg_idx, n))
        rnk = r - np.repeat(r[seg_idx], counts) + 1
        out = g.append_column("rnk", pa.array(rnk, type=pa.int64()))
        return out.filter(pa.array(rnk <= k))

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(rank, batch_format="pyarrow")
    )


def inter_event_gaps(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key inter-arrival statistics — the LAG window pattern
    (``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, seq)``) reduced to
    per-key gap aggregates (count / sum / max / min, microseconds).

    ONE keyed shuffle of ``(key, ts_us)``; the per-partition kernel is a
    segmented diff over the ``(key, ts, seq)`` sort — consecutive
    differences of a sorted timestamp sequence depend only on the sorted
    multiset, so tie order never changes the result.  Keys with a single
    row have no gap and are dropped, matching SQL's ``WHERE gap IS NOT
    NULL`` on the lagged form.  Aggregates are exact int64 microseconds,
    so the output is order-independent and oracle-comparable.
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                seq: batch.column(seq),
            }
        )
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_ats").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def gaps(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        keys = g.column(key).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        n = len(keys)
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], type=g.schema.field(key).type),
                    "n_gaps": pa.array([], type=pa.int64()),
                    "sum_gap_us": pa.array([], type=pa.int64()),
                    "max_gap_us": pa.array([], type=pa.int64()),
                    "min_gap_us": pa.array([], type=pa.int64()),
                }
            )
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        if n > 1:
            gap[1:] = ts[1:] - ts[:-1]
        start_idx = np.nonzero(start)[0]
        counts = np.diff(np.append(start_idx, n))
        # zero the segment-start positions so reduceat sums only true
        # intra-key gaps; min needs a +inf-style sentinel at starts instead
        gap[start_idx] = 0
        sums = np.add.reduceat(gap, start_idx)
        maxs = np.maximum.reduceat(gap, start_idx)  # gaps >= 0, start's 0 safe
        gap_min = gap.copy()
        gap_min[start_idx] = np.iinfo(np.int64).max
        mins = np.minimum.reduceat(gap_min, start_idx)
        keep = counts > 1
        return pa.table(
            {
                key: pa.array(keys[start_idx][keep]).cast(
                    g.schema.field(key).type
                ),
                "n_gaps": pa.array(counts[keep] - 1, type=pa.int64()),
                "sum_gap_us": pa.array(sums[keep], type=pa.int64()),
                "max_gap_us": pa.array(maxs[keep], type=pa.int64()),
                "min_gap_us": pa.array(mins[keep], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(gaps, batch_format="pyarrow")
    )


def locf_resample_by_key(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    value_col: str,
    unit_us: int = 86_400_000_000,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key time-grid resample with last-observation-carried-forward
    (the daily-snapshot / gap-filling op): for every key and every grid
    unit between its first and last event, emit the value of the LAST
    event at or before the unit's end (ties broken by ``seq``), in exact
    integer cents.

    ONE keyed hash exchange; the per-partition kernel sorts once by
    (key, ts, seq), expands each key's grid via repeat/range arithmetic,
    and resolves every grid point with the interleaved-probe trick
    (events s=0 before probes s=1 at equal timestamp, probe ts =
    unit end − 1 µs, one ``np.lexsort`` over dictionary key codes —
    ts is only sorted WITHIN key segments, so a global ``searchsorted``
    would be invalid).  Output is O(keys × grid-span) rows; bound the
    span upstream for sparse keys with multi-year gaps.
    """
    import numpy as np

    from ..functions.hashing import partition_ids

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                "_ts": pc.cast(batch.column(ts_col), pa.int64()),
                "_seq": pc.cast(batch.column(seq), pa.int64()),
                "_c": pc.cast(
                    pc.floor(pc.multiply(batch.column(value_col), 100.0)),
                    pa.int64(),
                ),
            }
        )
        valid = pc.and_(
            t.column(key).combine_chunks().is_valid(),
            pc.and_(
                t.column("_ts").combine_chunks().is_valid(),
                t.column("_c").combine_chunks().is_valid(),
            ),
        )
        t = t.filter(valid)
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def resolve(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], type=group.schema.field(key).type),
                "day_us": pa.array([], type=pa.int64()),
                "value_cents": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        codes_arr = (
            group.column(key).combine_chunks().dictionary_encode()
        )
        codes = codes_arr.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ts = group.column("_ts").to_numpy(zero_copy_only=False)
        sq = group.column("_seq").to_numpy(zero_copy_only=False)
        cents = group.column("_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((sq, ts, codes))
        codes, ts, cents = codes[order], ts[order], cents[order]
        n = len(codes)
        starts = np.flatnonzero(
            np.concatenate([[True], codes[1:] != codes[:-1]])
        )
        ends = np.append(starts[1:], n)
        d0 = ts[starts] // unit_us
        d1 = ts[ends - 1] // unit_us
        span = (d1 - d0 + 1).astype(np.int64)
        total = int(span.sum())
        seg_of = np.repeat(np.arange(len(starts)), span)
        within = np.arange(total) - np.repeat(
            np.cumsum(span) - span, span
        )
        day = d0[seg_of] + within
        probe_ts = (day + 1) * unit_us - 1  # inclusive end of the unit
        probe_codes = codes[starts][seg_of]
        # interleave: events (s=0) before probes (s=1) at equal ts →
        # events with ts ≤ probe count; probes sorted within key anyway
        kcat = np.concatenate([codes, probe_codes])
        vcat = np.concatenate([ts, probe_ts])
        scat = np.concatenate(
            [np.zeros(n, np.int8), np.ones(total, np.int8)]
        )
        oo = np.lexsort((scat, vcat, kcat))
        ise = scat[oo] == 0
        excl = np.cumsum(ise) - ise
        cnt = np.empty(total, dtype=np.int64)
        cnt[oo[~ise] - n] = excl[~ise]
        # count is GLOBAL events ≤ probe; subtract the segment's offset
        idx = cnt - 1  # grid starts at the first event's unit → cnt ≥ 1
        vals = cents[idx]
        keys_out = codes_arr.dictionary.take(
            pa.array(probe_codes, type=pa.int32())
        )
        return pa.table(
            {
                key: keys_out,
                "day_us": pa.array(day * unit_us),
                "value_cents": pa.array(vals),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def distinct_count_by(
    ds,
    *,
    key: str,
    distinct_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Exact COUNT(DISTINCT distinct_col) per key at shuffle cost
    O(distinct pairs), not O(rows): per-batch pair dedup first, then a
    hash-partition by (key, value) pair so each pair lands exactly once per
    partition, per-partition dedup + per-key partial counts, and a final
    tiny per-key sum.  (The approximate path for 100 TB is an HLL sketch in
    the same shape; exact is what a SQL oracle can verify.)"""

    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.select([key, distinct_col])
        t = t.group_by([key, distinct_col]).aggregate([])
        parts = composite_partition_ids(t, [key, distinct_col], num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def partial_count(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        t = t.group_by([key, distinct_col]).aggregate([])
        return t.group_by(key).aggregate([(distinct_col, "count")])

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: [group.column(key)[0].as_py()],
                "n_distinct": pa.array(
                    [
                        int(
                            pc.sum(
                                group.column(f"{distinct_col}_count")
                            ).as_py()
                        )
                    ],
                    type=pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(partial_count, batch_format="pyarrow")
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def distinct_count_approx(
    ds,
    *,
    key: str,
    distinct_col: str,
    p: int = 12,
    sparse_threshold: int = 4096,
):
    """Approximate COUNT(DISTINCT) per key via mergeable distinct sketches
    (functions/sketches.py) with sparse-exact mode: a key whose distinct
    count stays ≤ ``sparse_threshold`` carries its sorted hash set and gets
    the EXACT count (SQL-oracle-checkable — the Theta/CPC sparse-mode
    contract); beyond the threshold the sketch degrades to HyperLogLog
    registers — the exchange is then a bounded ``2**p`` bytes per
    (key, batch) no matter how many rows, which is the 100 TB path where
    the exact pair-shuffle of :func:`distinct_count_by` would still move
    one row per distinct pair.  HLL accuracy ~1.04/sqrt(2**p) (≈1.6% at
    p=12); unit-tested against the exact operator in both modes."""
    from ..functions.sketches import (
        distinct_sketch_estimate,
        distinct_sketch_merge,
        distinct_sketch_partial,
    )

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key)
        # group rows by key within the batch, one sketch per key
        idx = pc.sort_indices(pa.table({key: keys}), sort_keys=[(key, "ascending")])
        t = batch.take(idx)
        karr = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        vals = t.column(distinct_col)
        bounds = np.nonzero(
            np.concatenate(([True], karr[1:] != karr[:-1]))
        )[0]
        ends = np.append(bounds[1:], len(karr))
        out_keys, out_regs = [], []
        for s, e in zip(bounds, ends):
            out_keys.append(karr[s])
            out_regs.append(
                distinct_sketch_partial(
                    vals.slice(s, e - s), p=p, sparse_threshold=sparse_threshold
                )
            )
        return pa.table(
            {
                key: pa.array(out_keys, type=t.schema.field(key).type),
                "_regs": pa.array(out_regs, type=pa.binary()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        bufs = group.column("_regs").to_pylist()
        acc = bufs[0]
        for buf in bufs[1:]:
            acc = distinct_sketch_merge(
                acc, buf, p=p, sparse_threshold=sparse_threshold
            )
        return pa.table(
            {
                key: [group.column(key)[0].as_py()],
                "n_distinct_approx": pa.array(
                    [distinct_sketch_estimate(acc)], type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_quantiles_approx(
    ds,
    *,
    key: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9),
    delta: int = 256,
):
    """Approximate per-group quantiles via mergeable t-digest-style sketches
    (functions/sketches.py): per-batch per-key digests are the partials,
    concat+compress the combiner — the exchange carries ≤ ``2·delta``
    float64 per (key, batch) regardless of row count, which is the 100 TB
    path where exact :func:`..ops.grouped_quantiles` would still shuffle
    every (key, value) row.  Accuracy ~1/delta in q-space; pinned vs the
    exact operator in tests."""
    from ..functions.sketches import (
        qdigest_from_values,
        qdigest_merge,
        qdigest_pack,
        qdigest_quantile,
        qdigest_unpack,
    )

    qcols = [f"p{int(q * 100)}" for q in quantiles]

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch.column(key), value_col: batch.column(value_col)}
        )
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending")])
        t = t.take(idx)
        karr = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        vals = t.column(value_col).to_numpy(zero_copy_only=False)
        starts = np.nonzero(
            np.concatenate(([True], karr[1:] != karr[:-1]))
        )[0]
        ends = np.append(starts[1:], len(karr))
        out_keys, bufs = [], []
        for s, e in zip(starts, ends):
            out_keys.append(karr[s])
            bufs.append(qdigest_pack(qdigest_from_values(vals[s:e], delta)))
        return pa.table(
            {
                key: pa.array(out_keys, type=t.schema.field(key).type),
                "_digest": pa.array(bufs, type=pa.binary()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        digest = (np.empty(0), np.empty(0))
        for buf in group.column("_digest").to_pylist():
            digest = qdigest_merge(digest, qdigest_unpack(buf), delta)
        out = {key: [group.column(key)[0].as_py()]}
        for q, name in zip(quantiles, qcols):
            out[name] = pa.array([float(qdigest_quantile(digest, q))])
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary (multi-aggregate with derived expressions)
# ---------------------------------------------------------------------------


def pricing_summary(lineitem_ds):
    """Pricing-summary rollup (TPC-H Q1 shape) with exact integer-cents
    sums so the result is order-independent and oracle-comparable:
    per (returnflag, linestatus): row count, sum(qty), sum(extendedprice),
    sum(discounted price), sum(charge).  Derived products are computed in
    IEEE double with a fixed association ``(p*(1-d))*(1+t)`` then floored
    to cents — bit-identical to the SQL oracle's expression."""

    def partial(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice")
        disc = batch.column("l_discount")
        tax = batch.column("l_tax")
        disc_price = pc.multiply(price, pc.subtract(1.0, disc))
        charge = pc.multiply(disc_price, pc.add(1.0, tax))

        def cents(x):
            return pc.cast(pc.floor(pc.multiply(x, 100.0)), pa.int64())

        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "_qty": cents(batch.column("l_quantity")),
                "_price": cents(price),
                "_disc_price": cents(disc_price),
                "_charge": cents(charge),
            }
        )
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("_qty", "sum"),
                ("_price", "sum"),
                ("_disc_price", "sum"),
                ("_charge", "sum"),
                # count(*) — a null l_quantity must still count the row
                ([], "count_all"),
            ]
        )

    def final(group: pa.Table) -> pa.Table:
        def tot(col):
            return pa.array(
                [int(pc.sum(group.column(col)).as_py())], type=pa.int64()
            )

        return pa.table(
            {
                "l_returnflag": [group.column("l_returnflag")[0].as_py()],
                "l_linestatus": [group.column("l_linestatus")[0].as_py()],
                "n_rows": tot("count_all"),
                "sum_qty_cents": tot("_qty_sum"),
                "sum_price_cents": tot("_price_sum"),
                "sum_disc_price_cents": tot("_disc_price_sum"),
                "sum_charge_cents": tot("_charge_sum"),
            }
        )

    return (
        lineitem_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(final, batch_format="pyarrow")
    )


def interval_join(
    ds,
    intervals: pa.Table,
    *,
    ts_col: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    id_col: str = "interval_id",
    select: list[str] | None = None,
):
    """Broadcast interval (range) join: one output row per (input row,
    interval) pair with ``start <= ts < end`` — the 1→N inequality join
    Ray Data lacks (campaign attribution, maintenance windows, benchmark
    time slices).

    Composition tier (a): the interval table ships once via ``ray.put``;
    each batch loops over INTERVALS (one vectorized mask + ``filter`` per
    interval), never over rows — O(n_intervals) kernel passes per batch,
    the right trade for a broadcast-dim interval table.  A fact×fact range
    join at 100 TB would instead range-partition both sides by time and
    sort-merge per partition; this operator is the dimension-side half.
    Null ``ts`` matches nothing (SQL inequality three-valued logic);
    intervals with no rows simply don't appear (inner-join semantics).
    Output rows for one input batch are grouped by interval, which is fine
    for the unordered relational results this feeds.
    """
    iv_ids = intervals.column(id_col)
    starts = pc.cast(intervals.column(start_col), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    ends = pc.cast(intervals.column(end_col), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    ref = ray.put((iv_ids.to_pylist(), starts, ends))
    id_type = iv_ids.type
    keep_cols = select

    class _IntervalTag:
        def __init__(self):
            self.ids, self.starts, self.ends = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cols = keep_cols or [
                c for c in batch.column_names if c != id_col
            ]
            body = batch.select(cols)
            ts = pc.cast(batch.column(ts_col), pa.int64()).combine_chunks()
            valid = ts.is_valid().to_numpy(zero_copy_only=False)
            tsv = ts.fill_null(0).to_numpy(zero_copy_only=False)
            pieces = []
            for iid, s, e in zip(self.ids, self.starts, self.ends):
                mask = valid & (tsv >= s) & (tsv < e)
                if not mask.any():
                    continue
                sub = body.filter(pa.array(mask))
                pieces.append(
                    sub.append_column(
                        id_col,
                        pa.array([iid] * sub.num_rows, type=id_type),
                    )
                )
            if pieces:
                return pa.concat_tables(pieces)
            return pa.table(
                {
                    **{c: pa.array([], type=body.schema.field(c).type) for c in cols},
                    id_col: pa.array([], type=id_type),
                }
            )

    return ds.map_batches(
        _IntervalTag, batch_format="pyarrow", batch_size=None, concurrency=(1, 8)
    )


def moving_window_sum(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    value_col: str,
    window_rows: int,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key moving-window sum/count over the last ``window_rows`` rows —
    ``SUM(cents) OVER (PARTITION BY key ORDER BY ts, seq ROWS BETWEEN
    window_rows-1 PRECEDING AND CURRENT ROW)`` plus the window row count.

    Same shape as :func:`running_sum`: ONE keyed shuffle of ``(key, ts,
    seq, cents)``, then a segmented prefix-sum kernel — the window sum is
    ``cs0[i+1] - cs0[max(i-w+1, seg_start)]``, fully vectorized, no per-row
    loop.  Values go to integer cents (exact, order-independent); null
    values contribute 0 to the sum but still occupy a window slot
    (``COALESCE(cents, 0)`` in the oracle), and the deterministic
    ``(ts, seq)`` order makes the result hash-comparable."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)), pa.int64()
        ).combine_chunks()
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                "_cents": cents.fill_null(0),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def window(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        # null-safe key equality (see moving_max_by_key): NaN != NaN would
        # split the SQL NULL partition
        keys = pc.fill_null(
            g.column(key).combine_chunks().dictionary_encode().indices.cast(
                pa.int64()
            ),
            -1,
        ).to_numpy(zero_copy_only=False)
        cents = g.column("_cents").to_numpy(zero_copy_only=False)
        n = len(keys)
        cs0 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cents, out=cs0[1:])
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        start_idx = np.nonzero(start)[0]
        counts = np.diff(np.append(start_idx, n))
        seg_start = np.repeat(start_idx, counts)
        i = np.arange(n, dtype=np.int64)
        lo = np.maximum(i - window_rows + 1, seg_start)
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                "win_sum_cents": pa.array(cs0[i + 1] - cs0[lo], type=pa.int64()),
                "win_n": pa.array(i - lo + 1, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(window, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# SCD Type-2 history (CDC change stream -> versioned dimension table)
# ---------------------------------------------------------------------------


def scd2_history(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    attr_cols: list[str],
    delete_when: tuple[str, str] | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Slowly-Changing-Dimension Type 2: turn a CDC change stream into a
    versioned history table — one row per version of each key with
    ``valid_from`` / ``valid_to`` interval bounds and an ``is_current``
    flag.  The canonical warehouse materialization of the binlog the CDC
    tier upserts (the reference's LWW lake keeps only the CURRENT row;
    SCD2 keeps every version with its validity interval).

    Semantics (matched by the SQL oracle)::

        SELECT key, attrs, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY key ORDER BY ts, seq) AS valid_to,
               LEAD(ts) OVER (...) IS NULL AS is_current
        FROM events
        QUALIFY <row is not a delete marker>

    Tombstones (``delete_when=(col, value)``) participate in the LEAD —
    a delete CLOSES the previous version's interval — but emit no version
    row themselves, so a key whose last event is a delete has no current
    row (no resurrection, same policy as the lake tombstone rule).

    Cost: ONE hash exchange of ``(key, ts, seq, attrs)``; the per-partition
    kernel is a vectorized segmented shift over the ``(key, ts, seq)`` sort
    (no per-row Python).  Partitioning assumption: all versions of one key
    co-locate (any keyed window needs this); hot keys rely on Ray spilling
    large groups — the interval computation is not associative, so salting
    does not apply.  Rows with a null key or null timestamp are dropped
    (SQL window partitions would group them; a versioned entity without
    identity or time has no interval semantics — documented policy).
    """

    def route(batch: pa.Table) -> pa.Table:
        cols = {
            key: batch.column(key),
            "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            seq: batch.column(seq),
        }
        for c in attr_cols:
            cols[c] = batch.column(c)
        if delete_when is not None:
            dcol, dval = delete_when
            cols["_del"] = pc.equal(batch.column(dcol), dval)
        else:
            cols["_del"] = pa.array(
                np.zeros(batch.num_rows, dtype=bool)
            )
        t = pa.table(cols)
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_ats").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    out_type = pa.timestamp("us")

    def versions(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            cols = {key: g.column(key)}
            for c in attr_cols:
                cols[c] = g.column(c)
            cols["valid_from"] = pa.array([], type=out_type)
            cols["valid_to"] = pa.array([], type=out_type)
            cols["is_current"] = pa.array([], type=pa.bool_())
            return pa.table(cols)
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        # segment end = last row of each key: no LEAD -> open interval
        end = np.ones(n, dtype=bool)
        if n > 1:
            end[:-1] = keys[1:] != keys[:-1]
        next_ts = np.empty(n, dtype=np.int64)
        if n > 1:
            next_ts[:-1] = ts[1:]
        next_ts[-1] = 0  # masked below
        keep = pc.invert(g.column("_del").combine_chunks())
        keep_np = keep.to_numpy(zero_copy_only=False)
        sel = np.nonzero(keep_np)[0]
        kept = g.take(pa.array(sel))
        cols = {key: kept.column(key)}
        for c in attr_cols:
            cols[c] = kept.column(c)
        cols["valid_from"] = kept.column("_ats").cast(out_type)
        vt = pa.array(
            next_ts[sel], type=pa.int64(), mask=end[sel]
        )
        cols["valid_to"] = vt.cast(out_type)
        cols["is_current"] = pa.array(end[sel])
        return pa.table(cols)

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(versions, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# snapshot diff (two table states -> insert/update/delete changelog)
# ---------------------------------------------------------------------------


def table_diff(
    old_ds,
    new_ds,
    *,
    key: str,
    compare_cols: list[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Derive a CDC changelog by diffing two snapshots of a keyed table:
    emits one row per changed key with ``op`` ∈ {'I','U','D'} plus the
    old/new value of every compared column — the inverse of the lake
    upsert (upsert applies a changelog; diff recovers one), and the
    standard backfill tool when a source can't emit a binlog.

    PRECONDITION: each side is a snapshot — at most one row per key
    (violations raise, they would make the diff ambiguous).  Null-safe
    comparison: a change is ``old IS DISTINCT FROM new`` per column, so
    null→value, value→null and value→value' all count; unchanged keys are
    dropped.

    Cost: per-batch envelope tagging, ONE hash exchange co-locating both
    sides' rows for each key (the same single-exchange shape as
    ``shuffle_join``), vectorized per-partition compare.  At 100 TB both
    snapshots stream; nothing materializes.
    """
    envelope = [key, *compare_cols]

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.select(envelope)
            # a snapshot row without a key has no identity to diff on —
            # and SQL FULL JOIN would never match two nulls anyway
            t = t.filter(t.column(key).combine_chunks().is_valid())
            t = t.append_column(
                "_side",
                pa.array(np.full(t.num_rows, side, dtype=np.int8)),
            )
            parts = partition_ids(t.column(key), num_partitions)
            return t.append_column(
                "_part", pa.array(parts, type=pa.int64())
            )

        return fn

    def diff(group: pa.Table) -> pa.Table:
        return diff_snapshot_sides(
            group.drop_columns(["_part"]), key=key, compare_cols=compare_cols
        )

    old_env = old_ds.map_batches(
        tag(0), batch_format="pyarrow", batch_size=None
    )
    new_env = new_ds.map_batches(
        tag(1), batch_format="pyarrow", batch_size=None
    )
    return (
        old_env.union(new_env)
        .groupby("_part")
        .map_groups(diff, batch_format="pyarrow")
    )


def diff_snapshot_sides(
    g: pa.Table, *, key: str, compare_cols: list[str]
) -> pa.Table:
    """The :func:`table_diff` compare kernel over one co-located slice: a
    concat of the two snapshots tagged ``_side`` (0 = old, 1 = new), any row
    order.  Shared by :func:`table_diff` (post-exchange partition groups) and
    the change-feed co-partitioned fast path (per-partition local diffs with
    NO exchange — see ``pipelines.cdc.change_feed``)."""
    idx = pc.sort_indices(
        g, sort_keys=[(key, "ascending"), ("_side", "ascending")]
    )
    g = g.take(idx)
    n = g.num_rows
    if n == 0:
        cols = {key: g.column(key), "op": pa.array([], type=pa.string())}
        for c in compare_cols:
            typ = g.schema.field(c).type
            cols[f"{c}_old"] = pa.array([], type=typ)
            cols[f"{c}_new"] = pa.array([], type=typ)
        return pa.table(cols)
    keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    side = g.column("_side").to_numpy(zero_copy_only=False)
    start = np.ones(n, dtype=bool)
    if n > 1:
        start[1:] = keys[1:] != keys[:-1]
    start_idx = np.nonzero(start)[0]
    counts = np.diff(np.append(start_idx, n))
    if (counts > 2).any() or (
        (counts == 2)
        & (side[start_idx] != 0)
    ).any() or (
        (counts == 2) & (side[np.minimum(start_idx + 1, n - 1)] != 1)
    ).any():
        raise ValueError(
            "table_diff: a side has more than one row for a key — "
            "inputs must be snapshots (one row per key per side)"
        )
    only = counts == 1
    ins = start_idx[only & (side[start_idx] == 1)]
    del_ = start_idx[only & (side[start_idx] == 0)]
    both_old = start_idx[~only]
    both_new = both_old + 1
    # null-safe per-column change mask over the paired rows
    changed = np.zeros(len(both_old), dtype=bool)
    for c in compare_cols:
        col = g.column(c).combine_chunks()
        ov = col.take(pa.array(both_old))
        nv = col.take(pa.array(both_new))
        eq = pc.equal(ov, nv)  # null where either side null
        same = pc.and_kleene(
            eq, pc.and_(ov.is_valid(), nv.is_valid())
        )
        both_null = pc.and_(
            pc.invert(ov.is_valid()), pc.invert(nv.is_valid())
        )
        same = pc.or_(
            pc.fill_null(same, False), both_null
        )
        changed |= pc.invert(same).to_numpy(zero_copy_only=False)
    upd_old = both_old[changed]
    upd_new = both_new[changed]

    key_arr = g.column(key).combine_chunks()
    out_key = pa.concat_arrays(
        [
            key_arr.take(pa.array(ins)),
            key_arr.take(pa.array(upd_old)),
            key_arr.take(pa.array(del_)),
        ]
    )
    op = pa.array(
        ["I"] * len(ins) + ["U"] * len(upd_old) + ["D"] * len(del_),
        type=pa.string(),
    )
    cols = {key: out_key, "op": op}
    for c in compare_cols:
        col = g.column(c).combine_chunks()
        null_i = pa.nulls(len(ins), col.type)
        null_d = pa.nulls(len(del_), col.type)
        cols[f"{c}_old"] = pa.concat_arrays(
            [null_i, col.take(pa.array(upd_old)), col.take(pa.array(del_))]
        )
        cols[f"{c}_new"] = pa.concat_arrays(
            [col.take(pa.array(ins)), col.take(pa.array(upd_new)), null_d]
        )
    return pa.table(cols)


# ---------------------------------------------------------------------------
# bloom-filter join pruning
# ---------------------------------------------------------------------------


def _build_bloom(
    ds, on: str, *, bits_pow2: int, num_hashes: int, num_groups: int = 16
) -> np.ndarray:
    """Distributed bloom build over a key column: per-batch bitmaps
    (vectorized bool scatter + ``packbits``), OR-combined through a
    ``num_groups``-way tree so the driver receives at most ``num_groups``
    bitmaps regardless of input size.  One column-pruned pass."""
    from ..functions.hashing import stable_hash_array

    m_bits = 1 << bits_pow2
    mask = np.uint64(m_bits - 1)
    bin_type = pa.binary(m_bits // 8)

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(on)
        if len(key) == 0:
            return pa.table(
                {
                    "_g": pa.array([], type=pa.int64()),
                    "bits": pa.array([], type=bin_type),
                }
            )
        h = stable_hash_array(key)
        h1 = h & mask
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        bools = np.zeros(m_bits, dtype=bool)
        for i in range(num_hashes):
            bools[(h1 + np.uint64(i) * h2) & mask] = True
        packed = np.packbits(bools, bitorder="little")
        g = int(h[0] % np.uint64(num_groups))
        return pa.table(
            {
                "_g": pa.array([g], type=pa.int64()),
                "bits": pa.array([packed.tobytes()], type=bin_type),
            }
        )

    def or_group(group: pa.Table) -> pa.Table:
        arrs = [
            np.frombuffer(v.as_py(), dtype=np.uint8)
            for v in group.column("bits")
        ]
        merged = np.bitwise_or.reduce(np.stack(arrs), axis=0)
        return pa.table({"bits": pa.array([merged.tobytes()], type=bin_type)})

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_g")
        .map_groups(or_group, batch_format="pyarrow")
        .take_all()
    )
    if not rows:
        return np.zeros(m_bits // 64, dtype=np.uint64)
    stacked = np.stack(
        [np.frombuffer(r["bits"], dtype=np.uint8) for r in rows]
    )
    return np.bitwise_or.reduce(stacked, axis=0).view(np.uint64).copy()


def bloom_semi_filter(
    ds,
    keys_ds,
    *,
    on: str,
    keys_on: str | None = None,
    bits_pow2: int = 23,
    num_hashes: int = 2,
):
    """Probabilistic semi-join pre-filter: drop rows whose ``on`` value is
    DEFINITELY not in ``keys_ds``'s key column.  False positives pass
    through (the downstream exact join discards them), so this is
    correctness-neutral by construction — its only job is to shrink a
    shuffle.  The exact broadcast :func:`semi_join` needs the full key set
    in memory; the bloom costs a FIXED 2^bits_pow2 bits (1 MiB at the
    default) at any key cardinality, which is what a 100 TB build side
    needs.  Null probe keys are dropped (a null never equi-matches).
    """
    from ..functions.hashing import stable_hash_array

    keys_on = keys_on or on
    bloom = _build_bloom(
        keys_ds, keys_on, bits_pow2=bits_pow2, num_hashes=num_hashes
    )
    ref = ray.put(bloom)
    mask = np.uint64((1 << bits_pow2) - 1)

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        key = batch.column(on)
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        h = stable_hash_array(key)
        h1 = h & mask
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        keep = key.is_valid().to_numpy(zero_copy_only=False).copy()
        for i in range(num_hashes):
            pos = (h1 + np.uint64(i) * h2) & mask
            bit = (
                bm[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))
            ) & np.uint64(1)
            keep &= bit.astype(bool)
        return batch.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# watermark / late-data windowed aggregate
# ---------------------------------------------------------------------------


def windowed_counts_late(
    ds,
    *,
    ts_col: str,
    seq: str,
    window: str = "hour",
    lateness_us: int = 0,
    span: int = 1 << 20,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Tumbling-window counts with STREAMING late-data accounting: replay
    the stream in arrival order (``seq``), maintain the watermark =
    (running max event time seen so far) − ``lateness_us``, and classify
    each row on-time/late against the watermark AS OF its arrival — the
    Beam/Flink allowed-lateness semantics, deterministic because arrival
    order is the total order ``seq``.

    A global running max normally forces an ordered scan; here it's the
    classic two-phase distributed prefix: rows range-partition by
    ``seq // span`` (dense CDC sequence numbers make ranges balanced),
    pass 1 reduces each range to its max event time (one tiny row per
    range), the driver takes the EXCLUSIVE prefix max over the range list
    (``n/span`` scalars — bounded at any scale), and pass 2 re-scans each
    range seeded with its prefix, computing the within-range running max
    by a vectorized sort + ``np.maximum.accumulate``.  Output rides the
    usual aggregate-sized window exchange.

    Oracle shape::

        hw = max(ts) OVER (ORDER BY seq ROWS UNBOUNDED PRECEDING
                           AND 1 PRECEDING)
        late = hw IS NOT NULL AND ts < hw - lateness
    """
    unit_us = {"hour": 3_600_000_000, "day": 86_400_000_000}[window]

    def valid_rows(batch: pa.Table) -> pa.Table:
        # null arrival seq or event time: no position in the stream and no
        # window — dropped (same policy as the other keyed window kernels)
        t = pa.table(
            {seq: batch.column(seq), ts_col: batch.column(ts_col)}
        )
        return t.filter(
            pc.and_(
                t.column(seq).combine_chunks().is_valid(),
                t.column(ts_col).combine_chunks().is_valid(),
            )
        )

    def range_max(batch: pa.Table) -> pa.Table:
        batch = valid_rows(batch)
        s = batch.column(seq).to_numpy(zero_copy_only=False)
        ts = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rng = s // span
        order = np.argsort(rng, kind="stable")
        rng_s, ts_s = rng[order], ts[order]
        start = np.ones(len(rng_s), dtype=bool)
        start[1:] = rng_s[1:] != rng_s[:-1]
        si = np.flatnonzero(start)
        return pa.table(
            {
                "rng": pa.array(rng_s[si], type=pa.int64()),
                "mx": pa.array(
                    np.maximum.reduceat(ts_s, si) if len(si) else
                    np.array([], dtype=np.int64),
                    type=pa.int64(),
                ),
            }
        )

    partials = ds.map_batches(
        range_max, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not partials:
        return ray.data.from_arrow(
            pa.table(
                {
                    "window_start": pa.array([], type=pa.timestamp("us")),
                    "n_ontime": pa.array([], type=pa.int64()),
                    "n_late": pa.array([], type=pa.int64()),
                }
            )
        )
    agg: dict[int, int] = {}
    for r in partials:
        g = int(r["rng"])
        agg[g] = max(agg.get(g, -(1 << 62)), int(r["mx"]))
    ranges = sorted(agg)
    # exclusive prefix max across ranges (the seed watermark per range)
    seeds: dict[int, int] = {}
    run = -(1 << 62)
    for g in ranges:
        seeds[g] = run
        run = max(run, agg[g])
    seeds_ref = ray.put(seeds)

    def classify(batch: pa.Table) -> pa.Table:
        sd = ray.get(seeds_ref)
        s = batch.column(seq).to_numpy(zero_copy_only=False)
        ts = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(s, kind="stable")
        s, ts = s[order], ts[order]
        rng = s // span
        start = np.ones(len(s), dtype=bool)
        start[1:] = rng[1:] != rng[:-1]
        # within-range EXCLUSIVE running max, seeded by the prefix:
        # shift ts right one slot, reset at range starts to the seed
        prev = np.empty(len(ts), dtype=np.int64)
        prev[1:] = ts[:-1]
        si = np.flatnonzero(start)
        prev[si] = np.array([sd[int(g)] for g in rng[si]], dtype=np.int64)
        # segmented running max via reset-at-boundary accumulate: subtract
        # a large step at boundaries is fragile — instead accumulate per
        # contiguous segment using reduceat-free trick: maximum.accumulate
        # then overwrite crossings segment by segment is O(segments);
        # ranges per batch are few (span >> batch), so loop over segments
        hw = np.empty(len(ts), dtype=np.int64)
        ends = np.append(si[1:], len(ts))
        for a, b in zip(si, ends):
            hw[a:b] = np.maximum.accumulate(prev[a:b])
        late = ts < hw - np.int64(lateness_us)
        win = (ts // unit_us) * unit_us
        t = pa.table(
            {
                "w": pa.array(win, type=pa.int64()),
                "ontime": pa.array((~late).astype(np.int64)),
                "late": pa.array(late.astype(np.int64)),
            }
        )
        return t.group_by("w").aggregate([("ontime", "sum"), ("late", "sum")])

    # pass 2 must see each range's rows together and in seq order within a
    # batch: re-partition by range id (contiguous seq blocks co-locate)
    def route(batch: pa.Table) -> pa.Table:
        batch = valid_rows(batch)
        s = batch.column(seq).to_numpy(zero_copy_only=False)
        part = (s // span) % num_partitions
        return pa.table(
            {
                seq: batch.column(seq),
                ts_col: batch.column(ts_col),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        g = classify(group.drop_columns(["_part"]))
        return g

    counts = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(finalize, batch_format="pyarrow")
    )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": pa.array(
                    [group.column("w")[0].as_py()], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "n_ontime": pa.array(
                    [int(pc.sum(group.column("ontime_sum")).as_py())],
                    type=pa.int64(),
                ),
                "n_late": pa.array(
                    [int(pc.sum(group.column("late_sum")).as_py())],
                    type=pa.int64(),
                ),
            }
        )

    return counts.groupby("w").map_groups(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ordered funnel analysis
# ---------------------------------------------------------------------------


def funnel_counts(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    step_col: str,
    steps: list,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Ordered funnel: how many keys completed step 1, step 1→2, step
    1→2→3, … where each step must occur STRICTLY AFTER the earliest
    completion time of the previous step (the standard product-analytics
    funnel, greedy-earliest semantics — greedy is optimal here: taking the
    earliest valid occurrence of step i never excludes a completion of
    step i+1 that another choice would allow).

    ONE hash exchange of ``(key, ts, seq, step_index)`` — rows not in
    ``steps`` are dropped at the routing stage, so the exchange carries
    only funnel-relevant events.  The per-partition kernel walks the
    ``len(steps)`` levels (a loop over STEPS, not rows): level i's
    completion time per key is the min ``(ts, seq)`` of step-i events
    strictly later than the key's level-(i−1) completion — a segmented
    min over the key-sorted layout per level.  Ties are broken by ``seq``
    so the result is deterministic under equal timestamps.

    Output: one row per funnel level — ``(step, n_keys)`` with ``n_keys``
    = keys whose prefix through that level completed.
    """
    step_index = {s: i for i, s in enumerate(steps)}

    def route(batch: pa.Table) -> pa.Table:
        sc = batch.column(step_col)
        if isinstance(sc, pa.ChunkedArray):
            sc = sc.combine_chunks()
        idx = pc.index_in(sc, value_set=pa.array(steps))
        keep = idx.is_valid()
        t = pa.table(
            {
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                seq: batch.column(seq),
                "_step": idx.cast(pa.int64()),
            }
        ).filter(keep)
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_ats").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    n_steps = len(steps)
    big = np.iinfo(np.int64).max

    def per_partition(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_ats", "ascending"),
                          (seq, "ascending")]
        )
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "_lvl": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        sq = g.column(seq).to_numpy(zero_copy_only=False)
        st = g.column("_step").to_numpy(zero_copy_only=False)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(start) - 1
        n_keys = int(seg_id[-1]) + 1
        # per-key completion (ts, seq) of the current level; start = -inf
        # (int64 min, NOT -1: a pre-1970 step-0 event has ts < -1 µs and
        # must still qualify against "no previous completion")
        done_ts = np.full(n_keys, np.iinfo(np.int64).min, dtype=np.int64)
        done_sq = np.full(n_keys, np.iinfo(np.int64).min, dtype=np.int64)
        alive = np.ones(n_keys, dtype=bool)
        counts = np.zeros(n_steps, dtype=np.int64)
        for lvl in range(n_steps):
            # events of this step strictly after the key's completion
            # ("after" = (ts, seq) lexicographically greater)
            dts = done_ts[seg_id]
            dsq = done_sq[seg_id]
            ok = (
                alive[seg_id]
                & (st == lvl)
                & ((ts > dts) | ((ts == dts) & (sq > dsq)))
            )
            # earliest qualifying event per key: rows are (ts, seq)-sorted
            # within key, so the FIRST ok row per segment wins
            ok_idx = np.flatnonzero(ok)
            if len(ok_idx) == 0:
                break
            segs = seg_id[ok_idx]
            first_mask = np.ones(len(ok_idx), dtype=bool)
            first_mask[1:] = segs[1:] != segs[:-1]
            win_rows = ok_idx[first_mask]
            win_segs = seg_id[win_rows]
            new_alive = np.zeros(n_keys, dtype=bool)
            new_alive[win_segs] = True
            alive &= new_alive
            done_ts[win_segs] = ts[win_rows]
            done_sq[win_segs] = sq[win_rows]
            counts[lvl] = int(alive.sum())
        return pa.table(
            {
                "_lvl": pa.array(np.arange(n_steps), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    partials = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )

    def final(group: pa.Table) -> pa.Table:
        lvl = int(group.column("_lvl")[0].as_py())
        return pa.table(
            {
                "step": pa.array([steps[lvl]], type=pa.string()),
                "level": pa.array([lvl + 1], type=pa.int64()),
                "n_keys": pa.array(
                    [int(pc.sum(group.column("n")).as_py())], type=pa.int64()
                ),
            }
        )

    return partials.groupby("_lvl").map_groups(
        final, batch_format="pyarrow"
    )


def cohort_retention(
    ds,
    *,
    key: str,
    ts_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Cohort retention matrix: assign each key to the cohort of its FIRST
    active day, then count how many of each cohort are active again k days
    later — ``(cohort, offset_days, n_keys)``.

    Exchange discipline: per-batch DISTINCT ``(key, day)`` pre-reduce (the
    exchange carries at most one row per key·day·batch, never per event),
    ONE key exchange co-locating each key's days (segmented min = the
    cohort — global because of co-location), then per-partition
    ``(cohort, offset)`` count partials into a second AGGREGATE-sized
    exchange.  Null keys/timestamps are dropped (an activity matrix needs
    both).
    """

    def distinct_days(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch.column(ts_col), unit="day"), pa.date32()
        )
        t = pa.table({key: batch.column(key), "_day": day})
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_day").combine_chunks().is_valid(),
            )
        )
        t = t.group_by([key, "_day"], use_threads=False).aggregate([])
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def per_partition(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        # batch-level distinct rows may still repeat across batches
        g = g.group_by([key, "_day"], use_threads=False).aggregate([])
        idx = pc.sort_indices(
            g, sort_keys=[(key, "ascending"), ("_day", "ascending")]
        )
        g = g.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], type=pa.int32()),
                    "offset_days": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        keys = g.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        days = (
            g.column("_day").combine_chunks().cast(pa.int32())
            .to_numpy(zero_copy_only=False)
        )
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(start) - 1
        cohort = days[np.flatnonzero(start)][seg_id]
        offset = (days - cohort).astype(np.int64)
        t = pa.table(
            {
                "cohort_day": pa.array(cohort, type=pa.int32()),
                "offset_days": pa.array(offset, type=pa.int64()),
            }
        )
        return t.group_by(["cohort_day", "offset_days"], use_threads=False)\
            .aggregate([([], "count_all")])

    partials = (
        ds.map_batches(distinct_days, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )

    def final(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": pa.array(
                    [group.column("cohort_day")[0].as_py()], type=pa.int32()
                ).cast(pa.date32()),
                "offset_days": pa.array(
                    [group.column("offset_days")[0].as_py()], type=pa.int64()
                ),
                "n_keys": pa.array(
                    [int(pc.sum(group.column("count_all")).as_py())],
                    type=pa.int64(),
                ),
            }
        )

    return partials.groupby(["cohort_day", "offset_days"]).map_groups(
        final, batch_format="pyarrow"
    )


def percent_rank_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    seq: str,
    out_col: str = "pr",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """SQL ``percent_rank() OVER (PARTITION BY key ORDER BY value)`` —
    ``(rank − 1) / (n − 1)`` with ties sharing their rank (RANK, not
    row_number), single-row keys at 0.0.

    ONE keyed exchange of ``(key, seq, value)``; the per-partition kernel
    is a segmented sort + tie-boundary gather (ranks come from the index
    of each tie-group's FIRST row).  The division is one IEEE op on small
    integers, so the oracle hash-matches bit-for-bit.  Null values rank
    nowhere and keep a null pr (SQL window functions put nulls last — we
    drop them to null instead; documented, mirrored by the oracle's CASE);
    null keys are dropped.
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                "_v": batch.column(value_col),
            }
        )
        t = t.filter(t.column(key).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def rank(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        valid = g.column("_v").combine_chunks().is_valid()
        nulls = g.filter(pc.invert(valid))
        g = g.filter(valid)
        n = g.num_rows
        out_parts = []
        if n:
            idx = pc.sort_indices(
                g, sort_keys=[(key, "ascending"), ("_v", "ascending")]
            )
            g = g.take(idx)
            keys = g.column(key).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            vals = g.column("_v").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            start = np.ones(n, dtype=bool)
            if n > 1:
                start[1:] = keys[1:] != keys[:-1]
            si = np.flatnonzero(start)
            seg_id = np.cumsum(start) - 1
            seg_len = np.diff(np.append(si, n))
            # tie group start: value change within the key segment.
            # NaN != NaN is True in numpy but SQL ORDER BY ties NaNs
            # together — mask consecutive-NaN pairs (review regression)
            tie_start = start.copy()
            if n > 1:
                changed = vals[1:] != vals[:-1]
                if vals.dtype.kind == "f":
                    both_nan = np.isnan(vals[1:]) & np.isnan(vals[:-1])
                    changed &= ~both_nan
                tie_start[1:] |= changed
            rank0 = (
                np.arange(n) - si[seg_id]
            )  # 0-based row number within key
            # rank of each row = row number of its tie group's FIRST row.
            # Accumulate tie-start POSITIONS (globally monotone, so the max
            # never carries over a segment boundary — a new key's first row
            # is always a tie start), then gather its within-key rank.
            tie_pos = np.maximum.accumulate(
                np.where(tie_start, np.arange(n), 0)
            )
            first_of_tie = rank0[tie_pos]
            denom = np.maximum(seg_len[seg_id] - 1, 1)
            pr = first_of_tie.astype(np.float64) / denom.astype(np.float64)
            out_parts.append(
                pa.table(
                    {
                        seq: g.column(seq),
                        key: g.column(key),
                        out_col: pa.array(pr, type=pa.float64()),
                    }
                )
            )
        if nulls.num_rows:
            out_parts.append(
                pa.table(
                    {
                        seq: nulls.column(seq),
                        key: nulls.column(key),
                        out_col: pa.nulls(nulls.num_rows, pa.float64()),
                    }
                )
            )
        if not out_parts:
            return pa.table(
                {
                    seq: g.column(seq),
                    key: g.column(key),
                    out_col: pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(out_parts)

    routed = ds.map_batches(route, batch_format="pyarrow", batch_size=None)
    return routed.groupby("_part").map_groups(rank, batch_format="pyarrow")


def cume_dist_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    seq: str,
    out_col: str = "cd",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """SQL ``cume_dist() OVER (PARTITION BY key ORDER BY value)`` —
    (rows with value ≤ current, ties counted HIGH) / n; the companion of
    :func:`percent_rank_by_key` with the tie group's LAST position in the
    numerator instead of its first.

    Same shape: ONE keyed exchange, segmented sort + tie-boundary gather
    per partition, one IEEE division of two small exact integers.  Null
    values get a null ``cd`` (mirrored by the oracle's CASE); null keys
    are dropped.
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                "_v": batch.column(value_col),
            }
        )
        t = t.filter(t.column(key).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def dist(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        valid = g.column("_v").combine_chunks().is_valid()
        nulls = g.filter(pc.invert(valid))
        g = g.filter(valid)
        n = g.num_rows
        out_parts = []
        if n:
            idx = pc.sort_indices(
                g, sort_keys=[(key, "ascending"), ("_v", "ascending")]
            )
            g = g.take(idx)
            keys = g.column(key).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            vals = g.column("_v").combine_chunks().to_numpy(
                zero_copy_only=False
            )
            start = np.ones(n, dtype=bool)
            if n > 1:
                start[1:] = keys[1:] != keys[:-1]
            si = np.flatnonzero(start)
            seg_id = np.cumsum(start) - 1
            seg_len = np.diff(np.append(si, n))
            tie_start = start.copy()
            if n > 1:
                changed = vals[1:] != vals[:-1]
                if vals.dtype.kind == "f":
                    both_nan = np.isnan(vals[1:]) & np.isnan(vals[:-1])
                    changed &= ~both_nan
                tie_start[1:] |= changed
            # last global position of each row's tie group = (next tie
            # start) − 1, taken from a reversed cummin over tie starts
            ti = np.flatnonzero(tie_start)
            tie_id = np.cumsum(tie_start) - 1
            tie_end = np.append(ti[1:], n) - 1  # per tie group
            last_pos = tie_end[tie_id]
            # SQL cume_dist divides by the FULL partition size: with
            # NULLS LAST, null-value rows still count in the denominator
            # (verified against DuckDB) even though their own cd is null
            denom = seg_len.astype(np.float64)
            if nulls.num_rows:
                nk = np.sort(
                    nulls.column(key)
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                )
                seg_keys = keys[si]
                denom = denom + (
                    np.searchsorted(nk, seg_keys, side="right")
                    - np.searchsorted(nk, seg_keys, side="left")
                )
            cd = (last_pos - si[seg_id] + 1).astype(np.float64) / denom[
                seg_id
            ]
            out_parts.append(
                pa.table(
                    {
                        seq: g.column(seq),
                        key: g.column(key),
                        out_col: pa.array(cd, type=pa.float64()),
                    }
                )
            )
        if nulls.num_rows:
            out_parts.append(
                pa.table(
                    {
                        seq: nulls.column(seq),
                        key: nulls.column(key),
                        out_col: pa.nulls(nulls.num_rows, pa.float64()),
                    }
                )
            )
        if not out_parts:
            return pa.table(
                {
                    seq: g.column(seq),
                    key: g.column(key),
                    out_col: pa.array([], type=pa.float64()),
                }
            )
        return pa.concat_tables(out_parts)

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(dist, batch_format="pyarrow")
    )


def temporal_join(
    left_ds,
    right_ds,
    *,
    on: str,
    left_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    right_keep: list[str],
    suffix: str = "_dim",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Temporal (SCD2 validity-window) dimension lookup: attach to each
    left row the dimension version whose ``[valid_from, valid_to)``
    interval contains ``left_ts`` — the canonical enrichment of a fact /
    event stream against the versioned history :func:`scd2_history`
    produces.  Left rows with no valid version (before the first version,
    or after a tombstone closed the last interval) keep nulls — LEFT JOIN
    semantics.

    SQL shape::

        SELECT l.*, d.keep ...
        FROM left l LEFT JOIN dim d
          ON l.on = d.on AND l.ts >= d.valid_from
         AND (d.valid_to IS NULL OR l.ts < d.valid_to)

    Built as :func:`asof_join` on ``valid_from`` (one hash exchange, no
    interval explosion — correct because SCD2 intervals per key are
    disjoint and ordered, so the as-of match is the ONLY candidate
    interval) followed by a per-batch validity mask that nulls the joined
    columns where ``valid_to <= ts``.  Inherits asof_join's partitioning
    assumption (all versions of one key co-locate).
    """
    vt_out = f"{valid_to}{suffix}"
    keep_out = [f"{c}{suffix}" for c in right_keep]

    # Two versions of one key can share valid_from (same-timestamp events):
    # the earlier one's interval is zero-width [ts, ts).  Tie-break the
    # as-of pick toward the LONGER interval (open interval = int64 max) so
    # the surviving version wins — matching the SQL interval predicate.
    def add_vseq(batch: pa.Table) -> pa.Table:
        vt = batch.column(valid_to).combine_chunks()
        vseq = pc.if_else(
            pc.is_null(vt),
            pa.array(
                np.full(len(vt), np.iinfo(np.int64).max, dtype=np.int64)
            ),
            pc.cast(vt, pa.int64()),
        )
        return batch.append_column("_vseq", vseq)

    right_aug = right_ds.map_batches(
        add_vseq, batch_format="pyarrow", batch_size=None
    )
    if right_schema is not None:
        right_schema = pa.schema(
            [*right_schema, pa.field("_vseq", pa.int64())]
        )
    joined = asof_join(
        left_ds,
        right_aug,
        on=on,
        left_ts=left_ts,
        right_ts=valid_from,
        right_seq="_vseq",
        right_keep=[*right_keep, valid_to],
        suffix=suffix,
        num_partitions=num_partitions,
        left_schema=left_schema,
        right_schema=right_schema,
    )

    def mask_expired(batch: pa.Table) -> pa.Table:
        vt = batch.column(vt_out).combine_chunks()
        ts = batch.column(left_ts).combine_chunks()
        live = pc.or_kleene(pc.is_null(vt), pc.less(ts, vt))
        cols = {}
        for c in batch.column_names:
            if c == vt_out:
                continue
            if c in keep_out:
                col = batch.column(c).combine_chunks()
                cols[c] = pc.if_else(live, col, pa.nulls(len(col), col.type))
            else:
                cols[c] = batch.column(c)
        return pa.table(cols)

    return joined.map_batches(
        mask_expired, batch_format="pyarrow", batch_size=None
    )


def running_distinct_by_key(
    ds,
    *,
    key: str,
    value_col: str,
    ts_col: str,
    seq: str,
    out_col: str = "n_distinct_so_far",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key RUNNING distinct count: for each event, how many distinct
    ``value_col`` values its key has produced up to and including it (in
    ``(ts, seq)`` order) — the engagement-breadth / coverage-over-time
    window SQL cannot express directly (``COUNT(DISTINCT) OVER`` is not a
    valid window); the standard SQL rewrite is the oracle::

        first = row_number() OVER (PARTITION BY key, value
                                   ORDER BY ts, seq) = 1
        out   = SUM(first::int) OVER (PARTITION BY key ORDER BY ts, seq
                                      ROWS UNBOUNDED PRECEDING)

    ONE hash exchange on ``key``; the kernel is two vectorized sorts: the
    ``(key, value, ts, seq)`` order marks first occurrences (null values
    form their own group, matching the window PARTITION), the
    ``(key, ts, seq)`` order takes the segmented cumsum.  Null keys are
    dropped (oracle WHERE parity).
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                value_col: batch.column(value_col),
                ts_col: batch.column(ts_col),
                seq: batch.column(seq),
            }
        )
        t = t.filter(t.column(key).combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def kernel(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_part"])
        n = t.num_rows
        # pass 1: first occurrence of each (key, value) pair
        # default NULLS-LAST placement matches the oracle's row_number
        # ordering (a null ts must not steal the first-occurrence flag);
        # null VALUES still group contiguously and the explicit both_null
        # mask below keys their group
        idx1 = pc.sort_indices(
            t,
            sort_keys=[
                (key, "ascending"),
                (value_col, "ascending"),
                (ts_col, "ascending"),
                (seq, "ascending"),
            ],
        ).to_numpy()
        k1 = t.column(key).combine_chunks().take(pa.array(idx1))
        v1 = t.column(value_col).combine_chunks().take(pa.array(idx1))
        pair_start = np.ones(n, dtype=bool)
        if n > 1:
            same_k = pc.equal(
                k1.slice(1), k1.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
            # null-safe value equality: nulls form one group per key
            v_eq = pc.fill_null(
                pc.equal(v1.slice(1), v1.slice(0, n - 1)), False
            ).to_numpy(zero_copy_only=False)
            both_null = (
                pc.and_(
                    pc.is_null(v1.slice(1)), pc.is_null(v1.slice(0, n - 1))
                )
            ).to_numpy(zero_copy_only=False)
            pair_start[1:] = ~(same_k & (v_eq | both_null))
        first = np.zeros(n, dtype=np.int64)
        first[idx1] = pair_start.astype(np.int64)
        # pass 2: segmented running sum of the first-occurrence flags
        idx2 = pc.sort_indices(
            t,
            sort_keys=[
                (key, "ascending"),
                (ts_col, "ascending"),
                (seq, "ascending"),
            ],
        ).to_numpy()
        k2 = t.column(key).combine_chunks().take(pa.array(idx2))
        seg_start = np.ones(n, dtype=bool)
        if n > 1:
            seg_start[1:] = pc.not_equal(
                k2.slice(1), k2.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        f2 = first[idx2]
        cum = np.cumsum(f2)
        # segment base = total BEFORE the segment, carried forward (cum-f2
        # at starts is nondecreasing, so a running max holds the latest)
        bases = np.maximum.accumulate(np.where(seg_start, cum - f2, -1))
        run = cum - bases
        t2 = t.take(pa.array(idx2))
        return t2.append_column(out_col, pa.array(run, type=pa.int64()))

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def window_join(
    left_ds,
    right_ds,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    before_us: int = 0,
    after_us: int = 0,
    right_keep: list[str],
    suffix: str = "_right",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Big×big time-window (band) equijoin — the stream-stream join: emit
    every (left, right) pair sharing ``on`` with
    ``left_ts − before_us ≤ right_ts ≤ left_ts + after_us`` (inner
    semantics; unmatched rows drop).  The Flink/Beam interval join, and the
    shuffle-path sibling of the broadcast :func:`interval_join`.

    ONE co-locating hash exchange (both sides ride the tagged-union
    envelope, same shape as :func:`shuffle_join`); the per-partition kernel
    sorts the right side once and turns each left row into a
    ``searchsorted`` index range, expanding pairs via vectorized
    repeat/range arithmetic — output size is the true pair count, never a
    cross product.  Skew note: a key hot on BOTH sides is inherently
    quadratic (every pair must be emitted); bound ``before/after`` to bound
    the blowup.  Null keys and null timestamps drop (SQL inner-join
    parity).
    """
    right_out = [f"{c}{suffix}" for c in right_keep]
    left_ds, lschema = _prep_join_side(left_ds, left_schema, "left")
    right_ds, rschema = _prep_join_side(right_ds, right_schema, "right")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    clash = set(lschema.names) & set(right_out)
    if clash:
        raise ValueError(f"column name clash: {sorted(clash)}")
    left_cols = list(lschema.names)

    def env_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in left_cols}
        cols["_wts"] = pc.cast(batch.column(left_ts), pa.int64())
        for c, oc in zip(right_keep, right_out):
            cols[oc] = pa.nulls(batch.num_rows, rtypes[c])
        cols["_side"] = pa.array(np.ones(batch.num_rows, dtype=np.int8))
        t = pa.table(cols)
        t = t.filter(
            pc.and_(
                t.column(on).combine_chunks().is_valid(),
                t.column("_wts").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(on), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def env_right(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            if c == on:
                cols[c] = batch.column(on)
            else:
                cols[c] = pa.nulls(batch.num_rows, ltypes[c])
        cols["_wts"] = pc.cast(batch.column(right_ts), pa.int64())
        for c, oc in zip(right_keep, right_out):
            cols[oc] = batch.column(c)
        cols["_side"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        t = pa.table(cols)
        t = t.filter(
            pc.and_(
                t.column(on).combine_chunks().is_valid(),
                t.column("_wts").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(on), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(side == 1))
        right = group.filter(pa.array(side == 0))
        empty = pa.table(
            {
                **{c: pa.array([], ltypes[c]) for c in left_cols},
                **{
                    oc: pa.array([], rtypes[c])
                    for c, oc in zip(right_keep, right_out)
                },
            }
        )
        if left.num_rows == 0 or right.num_rows == 0:
            return empty
        # sort rights by (key, ts) once; per left row the window is a
        # searchsorted range over its key segment
        ridx = pc.sort_indices(
            right, sort_keys=[(on, "ascending"), ("_wts", "ascending")]
        )
        right = right.take(ridx)
        rkey = right.column(on).combine_chunks()
        rts = right.column("_wts").to_numpy(zero_copy_only=False)
        m = right.num_rows
        rstart = np.ones(m, dtype=bool)
        if m > 1:
            rstart[1:] = pc.not_equal(
                rkey.slice(1), rkey.slice(0, m - 1)
            ).to_numpy(zero_copy_only=False)
        seg_lo = np.nonzero(rstart)[0]
        # map each left key to its right segment via index_in against the
        # segment-start keys (unique by construction)
        seg_keys = rkey.take(pa.array(seg_lo, type=pa.int64()))
        li = pc.index_in(
            left.column(on).combine_chunks(), value_set=seg_keys
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        has_seg = ~np.isnan(li)
        lsel = np.nonzero(has_seg)[0]
        if len(lsel) == 0:
            return empty
        seg = li[lsel].astype(np.int64)
        lts = left.column("_wts").to_numpy(zero_copy_only=False)[lsel]
        probe_keys = left.column(on).combine_chunks().take(
            pa.array(lsel, type=pa.int64())
        )

        # rts is sorted only WITHIN key segments, so a global searchsorted
        # is invalid; instead interleave BOTH window-bound probes with the
        # rights in ONE numpy lexsort and read each probe's within-segment
        # right count off an exclusive cumsum (the asof kernel's trick).
        # Keys of any type become grouping codes via dictionary_encode
        # (code order ≠ key order, but only segment GROUPING matters).
        # Side ordering at equal (key, v): lo-probe (0) < right (1) <
        # hi-probe (2) — rights strictly below the lower bound vs rights
        # at-or-below the upper bound, matching BETWEEN semantics.
        # (Replaced two 3-key Arrow sorts + Arrow takes per partition:
        # the fused numpy kernel measured ~4× faster at 1.7M-row groups.)
        n_p = len(lsel)
        kcat = pa.concat_arrays(
            [
                rkey.combine_chunks()
                if isinstance(rkey, pa.ChunkedArray)
                else rkey,
                probe_keys.combine_chunks()
                if isinstance(probe_keys, pa.ChunkedArray)
                else probe_keys,
            ]
        )
        codes1 = (
            kcat.dictionary_encode()
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        codes = np.concatenate([codes1, codes1[m:]])
        vcat = np.concatenate([rts, lts - before_us, lts + after_us])
        scat = np.concatenate(
            [
                np.ones(m, dtype=np.int8),
                np.zeros(n_p, dtype=np.int8),
                np.full(n_p, 2, dtype=np.int8),
            ]
        )
        order = np.lexsort((scat, vcat, codes))
        isr = scat[order] == 1
        excl = np.cumsum(isr) - isr
        kk = codes[order]
        tot = m + 2 * n_p
        start = np.ones(tot, dtype=bool)
        if tot > 1:
            start[1:] = kk[1:] != kk[:-1]
        base = np.maximum.accumulate(np.where(start, excl, -1))
        cnt = excl - base
        lo_cnt = np.empty(n_p, dtype=np.int64)
        hi_cnt = np.empty(n_p, dtype=np.int64)
        is_lo = scat[order] == 0
        is_hi = scat[order] == 2
        lo_cnt[order[is_lo] - m] = cnt[is_lo]
        hi_cnt[order[is_hi] - (m + n_p)] = cnt[is_hi]
        lo = seg_lo[seg] + lo_cnt
        hi = seg_lo[seg] + hi_cnt
        counts = np.maximum(hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        # expand pairs: left row index repeated, right indices as ranges
        l_rep = np.repeat(lsel, counts)
        starts = np.repeat(lo, counts)
        within = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        r_idx = starts + within
        out_cols = {}
        l_take = pa.array(l_rep, type=pa.int64())
        r_take = pa.array(r_idx, type=pa.int64())
        for c in left_cols:
            out_cols[c] = left.column(c).combine_chunks().take(l_take)
        for oc in right_out:
            out_cols[oc] = right.column(oc).combine_chunks().take(r_take)
        return pa.table(out_cols)

    env = left_ds.map_batches(
        env_left, batch_format="pyarrow", batch_size=None
    ).union(
        right_ds.map_batches(env_right, batch_format="pyarrow", batch_size=None)
    )
    return env.groupby("_part").map_groups(merge, batch_format="pyarrow")


def windowed_ohlc(
    ds,
    *,
    ts_col: str,
    key: str,
    seq: str,
    value_col: str,
    unit: str = "hour",
):
    """Per-(window, key) OPEN/HIGH/LOW/CLOSE aggregate — the candlestick /
    telemetry-rollup shape: open = first value by ``(ts, seq)`` within the
    window, close = last, plus min/max/count.  First/last-by-order are
    associative once each partial carries its defining order key, so the
    per-batch combiner emits ONE partial row per (window, key, batch)
    (open + its (ts, seq), close + its (ts, seq), lo, hi, n) and the final
    exchange merges partials by comparing those order keys — the same
    pre-reduce shape as the other windowed aggregates; no row-level data
    ever reaches the final exchange.  Rows with a null window, key, or
    value are excluded (matched by the oracle's WHERE)."""

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.floor_temporal(batch.column(ts_col), unit=unit), pa.int64()
        )
        t = pa.table(
            {
                "w": win,
                "k": batch.column(key),
                "_ts": pc.cast(batch.column(ts_col), pa.int64()),
                "_seq": pc.cast(batch.column(seq), pa.int64()),
                "v": batch.column(value_col),
            }
        )
        t = t.filter(
            pc.and_(
                pc.and_(
                    t.column("w").combine_chunks().is_valid(),
                    t.column("k").combine_chunks().is_valid(),
                ),
                t.column("v").combine_chunks().is_valid(),
            )
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    "w": pa.array([], pa.int64()),
                    "k": pa.array([], t.schema.field("k").type),
                    "open_ts": pa.array([], pa.int64()),
                    "open_seq": pa.array([], pa.int64()),
                    "open": pa.array([], pa.float64()),
                    "close_ts": pa.array([], pa.int64()),
                    "close_seq": pa.array([], pa.int64()),
                    "close": pa.array([], pa.float64()),
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("w", "ascending"),
                ("k", "ascending"),
                ("_ts", "ascending"),
                ("_seq", "ascending"),
            ],
        )
        t = t.take(idx)
        n = t.num_rows
        w = t.column("w").to_numpy(zero_copy_only=False)
        kk = t.column("k").combine_chunks()
        start = np.ones(n, dtype=bool)
        if n > 1:
            same_k = pc.equal(kk.slice(1), kk.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            start[1:] = (w[1:] != w[:-1]) | ~same_k
        si = np.flatnonzero(start)
        ei = np.r_[si[1:], n] - 1
        v = pc.cast(t.column("v"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        ts = t.column("_ts").to_numpy(zero_copy_only=False)
        sq = t.column("_seq").to_numpy(zero_copy_only=False)
        lo = np.minimum.reduceat(v, si)
        hi = np.maximum.reduceat(v, si)
        cnt = np.diff(np.r_[si, n])
        sel_s = pa.array(si, type=pa.int64())
        return pa.table(
            {
                "w": pa.array(w[si]),
                "k": kk.take(sel_s),
                "open_ts": pa.array(ts[si]),
                "open_seq": pa.array(sq[si]),
                "open": pa.array(v[si]),
                "close_ts": pa.array(ts[ei]),
                "close_seq": pa.array(sq[ei]),
                "close": pa.array(v[ei]),
                "lo": pa.array(lo),
                "hi": pa.array(hi),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        # merge partials: open = row with min (open_ts, open_seq), close =
        # row with max (close_ts, close_seq)
        oidx = pc.sort_indices(
            group,
            sort_keys=[("open_ts", "ascending"), ("open_seq", "ascending")],
        )[0].as_py()
        cidx = pc.sort_indices(
            group,
            sort_keys=[
                ("close_ts", "descending"),
                ("close_seq", "descending"),
            ],
        )[0].as_py()
        return pa.table(
            {
                "window_start": pa.array(
                    [group.column("w")[0].as_py()], pa.int64()
                ).cast(pa.timestamp("us")),
                key: pa.array(
                    [group.column("k")[0].as_py()],
                    group.schema.field("k").type,
                ),
                "open": pa.array(
                    [group.column("open")[oidx].as_py()], pa.float64()
                ),
                "high": pa.array(
                    [pc.max(group.column("hi")).as_py()], pa.float64()
                ),
                "low": pa.array(
                    [pc.min(group.column("lo")).as_py()], pa.float64()
                ),
                "close": pa.array(
                    [group.column("close")[cidx].as_py()], pa.float64()
                ),
                "n": pa.array(
                    [int(pc.sum(group.column("n")).as_py())], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["w", "k"])
        .map_groups(final, batch_format="pyarrow")
    )


def global_rank(
    ds,
    *,
    by: str,
    tie_break: str,
    descending: bool = True,
    bin_width: float = 1.0,
    rank_col: str = "rank",
):
    """Exact global ``ROW_NUMBER() OVER (ORDER BY by [DESC], tie_break)``
    WITHOUT a single-node sort: the classic distributed-sort-rank
    decomposition.

    1. **Range histogram** (pruned pass): per-batch counts of fixed-width
       ``by`` bins — the exchange carries O(bins) integers, never rows.
    2. **Offsets** (driver, aggregate-sized): bins ordered by rank
       direction, exclusive prefix sum → each bin's global starting rank;
       broadcast via ``ray.put``.
    3. **Bucketed rank** (one keyed exchange): rows shuffle by bin;
       each bin sorts locally (bounded by its bin population, never the
       dataset) and emits ``offset + local position``.

    NULL ``by`` values rank LAST (SQL default NULLS LAST for both
    directions in DuckDB ORDER BY ... DESC / ASC), tie-broken by
    ``tie_break``.  Skewed value distributions degrade bin balance, not
    correctness — pick ``bin_width`` so the hottest bin fits one worker
    (same contract as a range-partitioned sort).
    """
    import ray

    null_bin = np.iinfo(np.int64).min  # ranks last in either direction
    nan_bin = np.iinfo(np.int64).max  # NaN > every value (DuckDB order)

    def bins_of(batch: pa.Table) -> np.ndarray:
        arr = batch.column(by)
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(arr, pa.float64()), 0.0).to_numpy(
            zero_copy_only=False
        )
        is_nan = np.isnan(v)
        # clip before the float→int cast: NaN/overflow casts are undefined
        # behavior and could collide with the sentinel bins
        scaled = np.clip(
            np.floor(np.where(is_nan, 0.0, v) / bin_width),
            -(2.0**62),
            2.0**62,
        )
        b = scaled.astype(np.int64)
        b = np.where(is_nan, nan_bin, b)
        return np.where(valid, b, null_bin)

    def hist(batch: pa.Table) -> pa.Table:
        b = bins_of(batch)
        uniq, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "_bin": pa.array(uniq, type=pa.int64()),
                "_n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = ds.map_batches(hist, batch_format="pyarrow", batch_size=None)
    agg = {}
    for t in partials.iter_batches(batch_format="pyarrow"):
        for bb, nn in zip(
            t.column("_bin").to_numpy(zero_copy_only=False),
            t.column("_n").to_numpy(zero_copy_only=False),
        ):
            agg[int(bb)] = agg.get(int(bb), 0) + int(nn)
    # rank order: value bins (desc or asc), null bin always last
    value_bins = sorted((b for b in agg if b != null_bin), reverse=descending)
    ordered = value_bins + ([null_bin] if null_bin in agg else [])
    offsets = {}
    run = 0
    for b in ordered:
        offsets[b] = run
        run += agg[b]
    offsets_ref = ray.put(offsets)
    order = "descending" if descending else "ascending"

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bin", pa.array(bins_of(batch), type=pa.int64())
        )

    def rank_bin(group: pa.Table) -> pa.Table:
        offs = ray.get(offsets_ref)
        b = int(group.column("_bin")[0].as_py())
        idx = pc.sort_indices(
            group,
            sort_keys=[(by, order), (tie_break, "ascending")],
            null_placement="at_end",
        )
        t = group.take(idx).drop_columns(["_bin"])
        ranks = offs[b] + 1 + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column(rank_col, pa.array(ranks, type=pa.int64()))

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("_bin")
        .map_groups(rank_bin, batch_format="pyarrow")
    )


def throttle_by_key(
    ds,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    seq: str = "event_id",
    min_gap_minutes: float = 5.0,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Debounce / rate-limit stream filter: per key, drop an event when it
    arrives less than ``min_gap_minutes`` after the key's PREVIOUS event in
    ``(ts, seq)`` order (the LAG form — each event is judged against its
    immediate predecessor, so the SQL window oracle is exact).  Returns
    ``(seq, key)`` of the kept events.

    Same shape as :func:`sessionize`: one hash-partition shuffle of
    ``(seq, key, ts)`` only (payloads never move), vectorized diff kernel,
    no row loop.  Join the survivors back by ``seq`` (broadcast/bloom
    semi-join) when the full payload is needed downstream.
    """
    gap_us = int(min_gap_minutes * 60 * 1_000_000)

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def keep(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        # null-safe key equality via dictionary codes: a nullable int key
        # converts to float64 NaN in numpy and NaN != NaN would split the
        # SQL NULL partition into singletons (CLAUDE.md nullable-int trap)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        keys = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        n = len(keys)
        kept = np.ones(n, dtype=bool)
        if n > 1:
            same_key = keys[1:] == keys[:-1]
            kept[1:] = ~(same_key & ((ts[1:] - ts[:-1]) < gap_us))
        out = g.filter(pa.array(kept))
        return pa.table({seq: out.column(seq), key: out.column(key)})

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(keep, batch_format="pyarrow")
    )


def gap_rows(
    ds,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    seq: str = "event_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key inter-arrival gaps as ROWS ``(key, gap_us)`` — the LAG diff
    itself, for feeding distribution operators (exact per-key quantiles,
    histograms) rather than the fixed aggregate set of
    :func:`inter_event_gaps`.  One keyed exchange of ``(key, ts, seq)``;
    null-safe key grouping via dictionary codes; a key's first event emits
    no row (SQL ``WHERE gap IS NOT NULL`` parity)."""

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def gaps(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        codes = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        n = len(codes)
        if n < 2:
            return pa.table(
                {
                    key: karr.slice(0, 0),
                    "gap_us": pa.array([], type=pa.int64()),
                }
            )
        same = codes[1:] == codes[:-1]
        gap = (ts[1:] - ts[:-1])[same]
        keep_idx = np.nonzero(same)[0] + 1
        return pa.table(
            {
                key: karr.take(pa.array(keep_idx)),
                "gap_us": pa.array(gap, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(gaps, batch_format="pyarrow")
    )


def ntile(
    ds,
    *,
    by: str,
    tie_break: str,
    n_tiles: int,
    total_rows: int | None = None,
    descending: bool = False,
    bin_width: float = 1.0,
    out_col: str = "tile",
):
    """Exact global ``NTILE(n) OVER (ORDER BY by [DESC], tie_break)`` —
    equal-count tiles with SQL's remainder rule (the first ``n mod k``
    tiles get one extra row).

    Rides the distributed sort-rank (``global_rank``: O(bins) histogram
    exchange + per-bin local sort) and converts ranks to tiles with the
    closed-form boundary formula, so no second exchange is needed.
    ``total_rows`` lets a source-backed caller pass the Parquet metadata
    count; ``None`` falls back to ``ds.count()`` (fine on a source read,
    an extra pass on a derived Dataset — same caveat as ``ds.schema()``)."""
    if total_rows is None:
        total_rows = ds.count()
    n = int(total_rows)
    q, r = divmod(n, n_tiles)
    boundary = r * (q + 1)

    ranked = global_rank(
        ds,
        by=by,
        tie_break=tie_break,
        descending=descending,
        bin_width=bin_width,
        rank_col="_rank",
    )

    def tag(batch: pa.Table) -> pa.Table:
        rank0 = (
            batch.column("_rank").to_numpy(zero_copy_only=False) - 1
        )
        if q == 0:
            tile = rank0 + 1
        else:
            tile = np.where(
                rank0 < boundary,
                rank0 // (q + 1),
                r + (rank0 - boundary) // q,
            ) + 1
        return batch.drop_columns(["_rank"]).append_column(
            out_col, pa.array(tile.astype(np.int64))
        )

    return ranked.map_batches(tag, batch_format="pyarrow", batch_size=None)


def item_cooccurrence(
    ds,
    *,
    basket: str,
    item: str,
    items: list | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    max_items: int = 63,
):
    """Market-basket pair co-occurrence with lift: for every unordered item
    pair, the number of baskets containing both, each alone, and
    ``lift = n_baskets·n_co / (n_a·n_b)``.

    Scale shape: the exchange carries DISTINCT ``(basket, item)`` pairs
    only (per-batch dedup first), hash-partitioned by basket so each
    basket's items co-locate; every partition folds its baskets into
    ≤``max_items``-bit masks (``bitwise_or.reduceat`` over sorted
    segments) and emits one O(K²) count matrix — the driver folds
    partition matrices, never rows.  Item vocabulary is collected in a
    pruned first pass unless passed explicitly (≤``max_items`` items by
    design: event types, sources, langs — NOT user-cardinality columns).

    The single IEEE division per pair makes the lift hash-exact against
    the SQL self-join oracle."""
    if items is None:
        from .ops import distinct_values

        rows = distinct_values(ds, columns=[item]).take_all()
        items = sorted(r[item] for r in rows if r[item] is not None)
    if len(items) > max_items:
        raise ValueError(
            f"item_cooccurrence needs a small item vocabulary "
            f"(got {len(items)} > {max_items})"
        )
    vocab = list(items)
    k_items = len(vocab)
    vocab_arr = pa.array(vocab)
    vocab_ref = ray.put(vocab_arr)

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {basket: batch.column(basket), item: batch.column(item)}
        )
        t = t.filter(
            pc.and_(
                t.column(basket).combine_chunks().is_valid(),
                t.column(item).combine_chunks().is_valid(),
            )
        )
        t = t.group_by([basket, item]).aggregate([])
        parts = partition_ids(t.column(basket), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        vb = ray.get(vocab_ref)
        g = group.drop_columns(["_part"])
        g = g.group_by([basket, item]).aggregate([])  # cross-batch dedup
        idx = pc.sort_indices(g, sort_keys=[(basket, "ascending")])
        g = g.take(idx)
        # index_in yields NULL (not -1) on a miss; the int32+nulls → float64
        # numpy trap means fill_null BEFORE to_numpy
        codes = (
            pc.fill_null(
                pc.index_in(g.column(item).combine_chunks(), value_set=vb),
                -1,
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keep = codes >= 0  # items outside an explicit vocabulary drop out
        codes = codes[keep].astype(np.int64)
        bkeys = (
            g.column(basket)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)[keep]
        )
        n = len(bkeys)
        out_i, out_j, out_c = [], [], []
        n_baskets = 0
        if n:
            start = np.ones(n, dtype=bool)
            start[1:] = bkeys[1:] != bkeys[:-1]
            starts = np.nonzero(start)[0]
            masks = np.bitwise_or.reduceat(
                (np.int64(1) << codes), starts
            )
            n_baskets = len(starts)
            for i in range(k_items):
                has_i = (masks >> np.int64(i)) & np.int64(1)
                ci = int(has_i.sum())
                if ci:
                    out_i.append(i)
                    out_j.append(i)
                    out_c.append(ci)
                for j in range(i + 1, k_items):
                    co = int(
                        (has_i & ((masks >> np.int64(j)) & np.int64(1))).sum()
                    )
                    if co:
                        out_i.append(i)
                        out_j.append(j)
                        out_c.append(co)
        out_i.append(-1)
        out_j.append(-1)
        out_c.append(n_baskets)
        return pa.table(
            {
                "_i": pa.array(out_i, type=pa.int64()),
                "_j": pa.array(out_j, type=pa.int64()),
                "_c": pa.array(out_c, type=pa.int64()),
            }
        )

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()
    )
    total = {}
    for row in partials:
        key = (row["_i"], row["_j"])
        total[key] = total.get(key, 0) + row["_c"]
    n_baskets = total.get((-1, -1), 0)
    singles = {i: total.get((i, i), 0) for i in range(k_items)}
    out = {
        "item_a": [],
        "item_b": [],
        "n_a": [],
        "n_b": [],
        "n_co": [],
        "lift": [],
    }
    for i in range(k_items):
        for j in range(i + 1, k_items):
            co = total.get((i, j), 0)
            if not co:
                continue
            na, nb = singles[i], singles[j]
            out["item_a"].append(vocab[i])
            out["item_b"].append(vocab[j])
            out["n_a"].append(na)
            out["n_b"].append(nb)
            out["n_co"].append(co)
            out["lift"].append(float(n_baskets * co) / float(na * nb))
    return pa.table(
        {
            "item_a": pa.array(out["item_a"], type=vocab_arr.type),
            "item_b": pa.array(out["item_b"], type=vocab_arr.type),
            "n_a": pa.array(out["n_a"], type=pa.int64()),
            "n_b": pa.array(out["n_b"], type=pa.int64()),
            "n_co": pa.array(out["n_co"], type=pa.int64()),
            "lift": pa.array(out["lift"], type=pa.float64()),
        }
    )


def max_concurrency_by_key(
    ds,
    *,
    key: str,
    start_col: str,
    duration_us: int,
    bin_us: int = 86_400_000_000,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    out_col: str = "max_concurrent",
):
    """Peak number of simultaneously-open fixed-length intervals per key —
    the sweep-line max over ``SUM(±1) OVER (ORDER BY t)`` without ever
    sorting a key's whole timeline on one worker.

    Two-phase distributed prefix sum (the watermark-op pattern): every
    interval contributes ``(+1 @ start, −1 @ start+duration)`` delta rows,
    binned by coarse time range.  Pass 1 exchanges only per-(key, bin)
    delta TOTALS (O(keys·bins) ints); the driver prefix-sums them into
    per-bin starting offsets, broadcast via ``ray.put``.  Pass 2 routes
    delta rows by (key, bin), locally sorts each bin segment by
    ``(t, delta)`` (ends before starts at the same instant — half-open
    intervals), cumsums + offset, and emits per-bin maxima; a tiny final
    max per key finishes.  Ties inside a bin match SQL RANGE-frame window
    semantics because equal-(t,d) runs are single-signed, so their running
    max equals the peer-group total.

    NOTE: consumes ``ds`` twice — pass a source-backed Dataset (or
    materialize a derived one first)."""

    def deltas(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {key: batch.column(key), start_col: batch.column(start_col)}
        )
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column(start_col).combine_chunks().is_valid(),
            )
        )
        starts = (
            t.column(start_col)
            .combine_chunks()
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keys2 = pa.concat_arrays(
            [t.column(key).combine_chunks()] * 2
        )
        tt = np.concatenate([starts, starts + np.int64(duration_us)])
        dd = np.concatenate(
            [
                np.ones(len(starts), dtype=np.int64),
                -np.ones(len(starts), dtype=np.int64),
            ]
        )
        return pa.table(
            {
                key: keys2,
                "_t": pa.array(tt),
                "_d": pa.array(dd),
                "_bin": pa.array(tt // np.int64(bin_us)),
            }
        )

    def bin_partial(batch: pa.Table) -> pa.Table:
        g = (
            deltas(batch)
            .group_by([key, "_bin"])
            .aggregate([("_d", "sum")])
            .rename_columns([key, "_bin", "_dsum"])
        )
        return g

    bin_rows = (
        ds.map_batches(bin_partial, batch_format="pyarrow", batch_size=None)
        .groupby([key, "_bin"])
        .sum("_dsum")
        .take_all()
    )
    per_key: dict = {}
    for row in bin_rows:
        per_key.setdefault(row[key], []).append(
            (row["_bin"], row["sum(_dsum)"])
        )
    offsets: dict = {}
    for k, lst in per_key.items():
        lst.sort()
        run = 0
        for b, s in lst:
            offsets[(k, b)] = run
            run += s
    offsets_ref = ray.put(offsets)

    def route(batch: pa.Table) -> pa.Table:
        t = deltas(batch)
        parts = composite_partition_ids(t, [key, "_bin"], num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def sweep(group: pa.Table) -> pa.Table:
        off = ray.get(offsets_ref)
        g = group.drop_columns(["_part"])
        idx = pc.sort_indices(
            g,
            sort_keys=[
                (key, "ascending"),
                ("_bin", "ascending"),
                ("_t", "ascending"),
                ("_d", "ascending"),
            ],
        )
        g = g.take(idx)
        keys_np = (
            g.column(key).combine_chunks().dictionary_encode().indices
        ).to_numpy(zero_copy_only=False)
        bins = g.column("_bin").to_numpy(zero_copy_only=False)
        dd = g.column("_d").to_numpy(zero_copy_only=False)
        n = len(dd)
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], type=g.schema.field(key).type),
                    "_mx": pa.array([], type=pa.int64()),
                }
            )
        start = np.ones(n, dtype=bool)
        start[1:] = (keys_np[1:] != keys_np[:-1]) | (bins[1:] != bins[:-1])
        starts = np.nonzero(start)[0]
        cs = np.cumsum(dd)
        seg_base = np.where(starts > 0, cs[starts - 1], 0)
        seg_id = np.cumsum(start) - 1
        within = cs - seg_base[seg_id]
        key_col = g.column(key).combine_chunks()
        seg_offsets = np.array(
            [
                off.get((key_col[int(s)].as_py(), int(bins[s])), 0)
                for s in starts
            ],
            dtype=np.int64,
        )
        vals = within + seg_offsets[seg_id]
        seg_max = np.maximum.reduceat(vals, starts)
        return pa.table(
            {
                key: key_col.take(pa.array(starts)),
                "_mx": pa.array(seg_max.astype(np.int64)),
            }
        )

    per_bin = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(sweep, batch_format="pyarrow")
    )

    def final(batch: pa.Table) -> pa.Table:
        g = (
            batch.group_by(key)
            .aggregate([("_mx", "max")])
            .rename_columns([key, out_col])
        )
        parts = partition_ids(g.column(key), num_partitions)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final_reduce(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_part"])
            .group_by(key)
            .aggregate([(out_col, "max")])
            .rename_columns([key, out_col])
        )

    return (
        per_bin.map_batches(final, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final_reduce, batch_format="pyarrow")
    )


def longest_streak_by_key(
    ds,
    *,
    key: str,
    ts_col: str,
    min_events: int = 1,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Longest run of CONSECUTIVE calendar days with >= ``min_events``
    events per key — the gaps-and-islands pattern (SQL: per-(key, day)
    counts with ``HAVING count(*) >= t`` -> ``day_int - row_number() OVER
    (PARTITION BY key ORDER BY day)`` island id -> ``max(count(*))`` per
    key).

    ONE keyed exchange of fixed-width ``(key, day, partial_count)`` rows,
    pre-reduced inside each batch so the shuffle carries at most
    ``keys x active-days`` rows regardless of event volume.  The
    per-partition kernel is a lexsort + segmented run detection: duplicate
    ``(key, day)`` pairs from different batches merge with one
    ``add.reduceat``, the activity threshold filters, a run breaks where
    the key changes or the day gap is not exactly 1; run lengths come from
    one ``diff`` over run starts and the per-key max from one
    ``maximum.reduceat`` — no Python per key.  Null keys/timestamps are
    dropped (SQL ``WHERE key IS NOT NULL AND ts IS NOT NULL`` parity);
    keys with no qualifying day emit no row (SQL ``HAVING`` parity).

    Output ``(key, longest_streak)``; order-independent, oracle-exact
    (integer day arithmetic only).
    """

    def route(batch: pa.Table) -> pa.Table:
        days = pc.cast(
            pc.cast(pc.floor_temporal(batch.column(ts_col), unit="day"),
                    pa.date32()),
            pa.int32(),
        )
        t = pa.table({key: batch.column(key), "_day": days})
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_day").combine_chunks().is_valid(),
            )
        )
        t = t.group_by([key, "_day"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        t = t.rename_columns([key, "_day", "_n"])
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def streaks(group: pa.Table) -> pa.Table:
        ktype = group.schema.field(key).type
        karr = group.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        keys = karr.to_numpy(zero_copy_only=False)
        days = group.column("_day").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cnts = group.column("_n").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(keys) == 0:
            return pa.table(
                {
                    key: pa.array([], type=ktype),
                    "longest_streak": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((days, keys))
        k = keys[order]
        d = days[order]
        c = cnts[order]
        # merge cross-batch partial counts of the same (key, day) pair
        pair_start = np.ones(len(k), dtype=bool)
        pair_start[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        ps = np.nonzero(pair_start)[0]
        merged = np.add.reduceat(c, ps)
        k = k[ps]
        d = d[ps]
        active = merged >= min_events
        k = k[active]
        d = d[active]
        if len(k) == 0:
            return pa.table(
                {
                    key: pa.array([], type=ktype),
                    "longest_streak": pa.array([], type=pa.int64()),
                }
            )
        run_start = np.ones(len(k), dtype=bool)
        run_start[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1] + 1)
        rs = np.nonzero(run_start)[0]
        run_len = np.diff(np.append(rs, len(k)))
        rk = k[rs]
        key_start = np.ones(len(rs), dtype=bool)
        key_start[1:] = rk[1:] != rk[:-1]
        ks = np.nonzero(key_start)[0]
        maxs = np.maximum.reduceat(run_len, ks)
        return pa.table(
            {
                key: pa.array(rk[ks]).cast(ktype),
                "longest_streak": pa.array(maxs, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(streaks, batch_format="pyarrow")
    )

def transition_counts(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    state_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    out_from: str = "from_state",
    out_to: str = "to_state",
    out_n: str = "n",
):
    """Markov transition matrix of a per-key ordered state stream — the
    count of each ``(prev_state, state)`` adjacent pair under
    ``LAG(state) OVER (PARTITION BY key ORDER BY ts, seq)``.

    One keyed exchange of fixed-width ``(key, ts, seq, state)`` rows
    co-locates each key's timeline; the per-partition kernel is a sort +
    dictionary-code adjacency mask (a key's first row emits nothing —
    SQL ``WHERE prev IS NOT NULL`` parity), pre-reduced to per-partition
    ``(from, to, n)`` partials with one Arrow ``group_by``, so the final
    fold exchanges at most ``partitions × |states|²`` rows regardless of
    event volume.  Null keys/timestamps are dropped; null STATES are kept
    as real states only when non-null (a null prev or next pair is
    dropped, matching the SQL lag+filter).  Integer counts only —
    oracle-exact."""

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                state_col: batch.column(state_col),
                seq: batch.column(seq),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        t = t.filter(
            pc.and_(
                t.column(key).combine_chunks().is_valid(),
                t.column("_ats").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def pairs(group: pa.Table) -> pa.Table:
        stype = group.schema.field(state_col).type
        empty = pa.table(
            {
                out_from: pa.array([], type=stype),
                out_to: pa.array([], type=stype),
                out_n: pa.array([], type=pa.int64()),
            }
        )
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        codes = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        n = len(codes)
        if n < 2:
            return empty
        sarr = g.column(state_col)
        if isinstance(sarr, pa.ChunkedArray):
            sarr = sarr.combine_chunks()
        same = codes[1:] == codes[:-1]
        valid = (
            sarr.slice(0, n - 1).is_valid().to_numpy(zero_copy_only=False)
            & sarr.slice(1, n - 1).is_valid().to_numpy(zero_copy_only=False)
            & same
        )
        keep = np.nonzero(valid)[0]
        if len(keep) == 0:
            return empty
        t = pa.table(
            {
                out_from: sarr.take(pa.array(keep)),
                out_to: sarr.take(pa.array(keep + 1)),
            }
        )
        t = (
            t.group_by([out_from, out_to], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns([out_from, out_to, out_n])
        )
        return t.set_column(
            2, out_n, t.column(out_n).cast(pa.int64())
        )

    partials = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(pairs, batch_format="pyarrow")
    )

    def route_fold(batch: pa.Table) -> pa.Table:
        parts = composite_partition_ids(batch, [out_from, out_to], 16)
        return batch.append_column("_pp", pa.array(parts, type=pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_pp"])
            .group_by([out_from, out_to], use_threads=False)
            .aggregate([(out_n, "sum")])
            .rename_columns([out_from, out_to, out_n])
        )

    return (
        partials.map_batches(
            route_fold, batch_format="pyarrow", batch_size=None
        )
        .groupby("_pp")
        .map_groups(fold, batch_format="pyarrow")
    )


def interval_coverage_by_key(
    ds,
    *,
    key: str,
    start_col: str,
    end_col: str,
    out_col: str = "covered_us",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Length of the UNION of half-open intervals ``[start, end)`` per key
    (total covered time, overlaps merged) — the gaps-and-islands coverage
    aggregate, computed as a sweep line instead of a running-max window.

    Every interval contributes two fixed-width delta points ``(+1 @ start,
    −1 @ end)``; ONE keyed exchange co-locates a key's points, then the
    per-partition kernel sorts ``(key, t, d)``, per-key-resets the cumsum
    (subtract the segment base — O(1) extra work, unlike a running max),
    and sums ``t[i+1] − t[i]`` wherever the active count is ≥ 1.  The
    result is order-invariant and integer-exact, so it hash-matches the
    SQL islands formulation (running ``max(e) OVER (... ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``) — both compute the same union
    measure.  Zero/negative-length intervals contribute 0.  Null keys or
    bounds are dropped."""

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                "_s": pc.cast(batch.column(start_col), pa.int64()),
                "_e": pc.cast(batch.column(end_col), pa.int64()),
            }
        )
        t = t.filter(
            pc.and_(
                pc.and_(
                    t.column(key).combine_chunks().is_valid(),
                    t.column("_s").combine_chunks().is_valid(),
                ),
                t.column("_e").combine_chunks().is_valid(),
            )
        )
        s = t.column("_s").to_numpy(zero_copy_only=False)
        e = np.maximum(t.column("_e").to_numpy(zero_copy_only=False), s)
        karr = t.column(key).combine_chunks()
        points = pa.table(
            {
                key: pa.concat_arrays([karr, karr]),
                "_t": pa.array(np.concatenate([s, e])),
                "_d": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(s), dtype=np.int64),
                            -np.ones(len(s), dtype=np.int64),
                        ]
                    )
                ),
            }
        )
        parts = partition_ids(points.column(key), num_partitions)
        return points.append_column(
            "_part", pa.array(parts, type=pa.int64())
        )

    def sweep(group: pa.Table) -> pa.Table:
        ktype = group.schema.field(key).type
        empty = pa.table(
            {
                key: pa.array([], type=ktype),
                out_col: pa.array([], type=pa.int64()),
            }
        )
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_t", "ascending"),
                ("_d", "ascending"),
            ],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        codes = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        t = g.column("_t").to_numpy(zero_copy_only=False)
        d = g.column("_d").to_numpy(zero_copy_only=False)
        n = len(codes)
        if n == 0:
            return empty
        start = np.ones(n, dtype=bool)
        start[1:] = codes[1:] != codes[:-1]
        starts = np.nonzero(start)[0]
        cs = np.cumsum(d)
        seg_base = np.where(starts > 0, cs[starts - 1], 0)
        seg_id = np.cumsum(start) - 1
        active = cs - seg_base[seg_id]
        contrib = np.zeros(n, dtype=np.int64)
        same_next = codes[1:] == codes[:-1]
        contrib[:-1] = np.where(
            same_next & (active[:-1] >= 1), t[1:] - t[:-1], 0
        )
        covered = np.add.reduceat(contrib, starts)
        return pa.table(
            {
                key: karr.take(pa.array(starts)),
                out_col: pa.array(covered, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(sweep, batch_format="pyarrow")
    )


def resample_ffill(
    ds,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    seq: str,
    step_us: int = 3_600_000_000,
    out_ts: str = "gts",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Resample each key's irregular timeline onto a regular grid with
    forward fill: one row per ``step_us`` tick from ``floor(min ts)`` to
    ``floor(max ts)`` per key, carrying the value of the LATEST event at
    or before the tick (ties on timestamp broken by max ``seq`` — the
    ``max_by(value, seq)`` rule), null when the tick precedes the key's
    first event (the truncated first tick).

    ONE keyed exchange of ``(key, ts, seq, value)``; the per-partition
    kernel sorts ``(key, ts, seq)`` and builds every key's grid with
    repeat/arange (no Python per key), then fills all grid points in one
    structured-dtype ``searchsorted`` over the sorted ``(key_code, ts)``
    pairs (``side="right"`` lands after equal timestamps, so the max-seq
    row wins).  Null values are dropped before the fill (IGNORE NULLS
    semantics).  Grid size is ``keys × span/step`` — choose ``step_us``
    so that product stays bounded (it is the OUTPUT size, not a shuffle).
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                value_col: batch.column(value_col),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        t = t.filter(
            pc.and_(
                pc.and_(
                    t.column(key).combine_chunks().is_valid(),
                    t.column("_ats").combine_chunks().is_valid(),
                ),
                t.column(value_col).combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    step = np.int64(step_us)

    def fill(group: pa.Table) -> pa.Table:
        ktype = group.schema.field(key).type
        vtype = group.schema.field(value_col).type
        empty = pa.table(
            {
                key: pa.array([], type=ktype),
                out_ts: pa.array([], type=pa.timestamp("us")),
                value_col: pa.array([], type=vtype),
            }
        )
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        karr = g.column(key)
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        codes = pc.fill_null(
            karr.dictionary_encode().indices.cast(pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        n = len(codes)
        if n == 0:
            return empty
        start = np.ones(n, dtype=bool)
        start[1:] = codes[1:] != codes[:-1]
        starts = np.nonzero(start)[0]
        ends = np.append(starts[1:], n)
        h0 = ts[starts] // step
        h1 = ts[ends - 1] // step
        cnt = h1 - h0 + 1
        total = int(cnt.sum())
        seg_of = np.repeat(np.arange(len(starts)), cnt)
        base = np.repeat(h0, cnt)
        csum0 = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(csum0, cnt)
        gts = (base + within) * step
        ev = np.empty(n, dtype=[("k", np.int64), ("t", np.int64)])
        ev["k"] = codes
        ev["t"] = ts
        probe = np.empty(total, dtype=ev.dtype)
        probe["k"] = codes[starts][seg_of]
        probe["t"] = gts
        pos = np.searchsorted(ev, probe, side="right") - 1
        valid = (pos >= 0) & (codes[np.maximum(pos, 0)] == probe["k"])
        vals = g.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        filled = vals.take(
            pa.array(np.where(valid, pos, 0), type=pa.int64())
        )
        out_vals = (
            filled
            if valid.all()
            else pc.if_else(
                pa.array(valid), filled, pa.scalar(None, type=vtype)
            )
        )
        return pa.table(
            {
                key: karr.take(pa.array(starts[seg_of])),
                out_ts: pa.array(gts).cast(pa.timestamp("us")),
                value_col: out_vals,
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(fill, batch_format="pyarrow")
    )


def fk_violations(
    child_ds,
    parent_ds,
    *,
    fk: str,
    pk: str,
    report_col: str,
    out_col: str = "n_violations",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    child_schema: pa.Schema | None = None,
    parent_schema: pa.Schema | None = None,
):
    """Referential-integrity audit: count child rows whose ``fk`` has no
    matching parent ``pk``, grouped by ``report_col`` — the distributed
    NOT EXISTS anti-join as a data-quality primitive.

    Both sides pre-reduce per batch before the exchange: child →
    ``(fk, report_col, n)`` partial counts, parent → distinct ``pk`` —
    the single hash shuffle moves one row per (key, batch), never child
    payloads.  The per-partition anti check is one vectorized ``is_in``;
    surviving counts collapse to an aggregate-sized second exchange keyed
    on ``report_col`` (envelope: report_col is a LOW-cardinality dimension
    — the final is one Python call per report value).  A null FK never
    matches (SQL three-valued NOT EXISTS) and is counted as a violation;
    null parent PKs match nothing.
    """
    child_ds, cschema = _prep_join_side(child_ds, child_schema, "child")
    parent_ds, pschema = _prep_join_side(parent_ds, parent_schema, "parent")
    ctypes = dict(zip(cschema.names, cschema.types))
    ptypes = dict(zip(pschema.names, pschema.types))
    key_type = ctypes[fk]
    if ptypes[pk] != key_type:
        raise ValueError(
            f"fk/pk type mismatch: {fk}={key_type} vs {pk}={ptypes[pk]}"
        )
    report_type = ctypes[report_col]

    def child_partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([fk, report_col])
            .group_by([fk, report_col])
            .aggregate([([], "count_all")])
            .rename_columns([fk, report_col, "_n"])
        )
        n = t.num_rows
        t = pa.table(
            {
                "_k": t.column(fk),
                report_col: t.column(report_col),
                "_n": pc.cast(t.column("_n"), pa.int64()),
                "_side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )
        parts = partition_ids(t.column("_k"), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def parent_partial(batch: pa.Table) -> pa.Table:
        keys = pc.unique(
            pc.drop_null(batch.column(pk).combine_chunks())
        )
        n = len(keys)
        t = pa.table(
            {
                "_k": keys,
                report_col: pa.nulls(n, report_type),
                "_n": pa.nulls(n, pa.int64()),
                "_side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
        parts = partition_ids(t.column("_k"), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    env = child_ds.map_batches(
        child_partial, batch_format="pyarrow", batch_size=None
    ).union(
        parent_ds.map_batches(
            parent_partial, batch_format="pyarrow", batch_size=None
        )
    )

    def check(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask = pa.array(side == 1)
        child = group.filter(lmask)
        pkeys = group.filter(pc.invert(lmask)).column("_k").combine_chunks()
        ck = child.column("_k").combine_chunks()
        if len(pkeys):
            matched = pc.fill_null(
                pc.is_in(ck, value_set=pc.unique(pkeys)), False
            )
            viol = child.filter(pc.invert(matched))
        else:
            viol = child
        if viol.num_rows == 0:
            return pa.table(
                {
                    report_col: pa.array([], type=report_type),
                    "_n": pa.array([], type=pa.int64()),
                }
            )
        return (
            viol.select([report_col, "_n"])
            .group_by(report_col)
            .aggregate([("_n", "sum")])
            .rename_columns([report_col, "_n"])
        )

    def route_report(batch: pa.Table) -> pa.Table:
        # Ray's groupby cannot sort a null group key; route by hash (nulls
        # canonicalized) and fold with Arrow group_by, which keeps the SQL
        # NULL group
        parts = partition_ids(batch.column(report_col), 16)
        return batch.append_column("_rpart", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_rpart"])
            .group_by(report_col)
            .aggregate([("_n", "sum")])
        )
        return pa.table(
            {
                report_col: g.column(report_col),
                out_col: g.column("_n_sum").cast(pa.int64()),
            }
        )

    return (
        env.groupby("_part")
        .map_groups(check, batch_format="pyarrow")
        .map_batches(route_report, batch_format="pyarrow", batch_size=None)
        .groupby("_rpart")
        .map_groups(final, batch_format="pyarrow")
    )


def _bucket_counts(ds, *, ts_col: str, unit_us: int, num_partitions: int):
    """Shared phase-1 for the time-series report ops: pre-reduce every
    batch to ``(bucket, n)`` partials, ONE hash exchange on bucket,
    partition-level sums — aggregate-sized throughout (≤ #buckets rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks().drop_null()
        b = (
            pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
            // unit_us
        )
        vals, cnt = np.unique(b, return_counts=True)
        t = pa.table(
            {
                "_b": pa.array(vals, type=pa.int64()),
                "_n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )
        parts = partition_ids(t.column("_b"), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def fold(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_part"])
            .group_by("_b")
            .aggregate([("_n", "sum")])
            .rename_columns(["_b", "_n"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
        .repartition(1)
    )


def series_autocorr(
    ds,
    *,
    ts_col: str,
    unit_us: int = 3_600_000_000,
    out_col: str = "autocorr",
    num_partitions: int = 16,
):
    """Lag-1 autocorrelation of the event-count time series at a fixed
    bucket width — the seasonality / burstiness diagnostic, returned as a
    single (n_pairs, autocorr) row.

    Phase 1 pre-reduces every batch to ``(bucket, n)`` partials and routes
    by hash(bucket): the exchange and every intermediate are
    aggregate-sized (≤ #buckets rows — hours over years ≪ memory).
    Phase 2 is ONE final task over the folded series: sort buckets, pair
    ``count[i]`` with ``count[i−1]`` (SQL ``lag`` over PRESENT buckets,
    not calendar-filled), exact int64 moment sums, then the same
    fixed-IEEE corr finalization as :func:`.ops.grouped_corr` — hash-exact
    vs the spelled-out SQL.  Envelope: per-pair products must fit int64
    (bucket counts ≤ ~3·10⁹).  Null timestamps are skipped.
    """
    import math

    def final(batch: pa.Table) -> pa.Table:
        t = batch.take(
            pc.sort_indices(batch, sort_keys=[("_b", "ascending")])
        )
        cnt = t.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = cnt[:-1], cnt[1:]
        n = len(x)
        if n == 0:
            return pa.table(
                {
                    "n_pairs": pa.array([0], type=pa.int64()),
                    out_col: pa.array([None], type=pa.float64()),
                }
            )
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
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
                "n_pairs": pa.array([n], type=pa.int64()),
                out_col: pa.array([corr], type=pa.float64()),
            }
        )

    return _bucket_counts(
        ds, ts_col=ts_col, unit_us=unit_us, num_partitions=num_partitions
    ).map_batches(final, batch_format="pyarrow", batch_size=None)


def period_delta(
    ds,
    *,
    ts_col: str,
    unit_us: int = 86_400_000_000,
    out_ts: str = "bucket_ts",
    num_partitions: int = 16,
):
    """Period-over-period report: event counts per fixed time bucket with
    the previous PRESENT bucket's count, absolute delta and ratio — the
    day-over-day / week-over-week dashboard staple.

    Phase 1 is the shared aggregate-sized bucket-count fold
    (:func:`_bucket_counts`); phase 2 is one final task: sort buckets,
    shift by one (SQL ``lag`` over present buckets, not calendar-filled),
    exact int64 delta, and ONE IEEE division for the ratio — hash-exact
    vs the spelled-out SQL.  The first bucket's delta/ratio are null.
    """

    def final(batch: pa.Table) -> pa.Table:
        t = batch.take(
            pc.sort_indices(batch, sort_keys=[("_b", "ascending")])
        )
        b = t.column("_b").to_numpy(zero_copy_only=False)
        n = t.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(b)
        prev = np.zeros(m, dtype=np.int64)
        has_prev = np.zeros(m, dtype=bool)
        if m > 1:
            prev[1:] = n[:-1]
            has_prev[1:] = True
        delta = np.where(has_prev, n - prev, 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = n.astype(np.float64) / prev.astype(np.float64)
        ok = has_prev & (prev != 0)
        return pa.table(
            {
                out_ts: pa.array(b * unit_us, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n": pa.array(n, type=pa.int64()),
                "delta": pa.array(delta, type=pa.int64(), mask=~has_prev),
                "ratio": pa.array(ratio, type=pa.float64(), mask=~ok),
            }
        )

    return _bucket_counts(
        ds, ts_col=ts_col, unit_us=unit_us, num_partitions=num_partitions
    ).map_batches(final, batch_format="pyarrow", batch_size=None)


def moving_max_by_key(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    value_col: str,
    window_rows: int,
    out_col: str = "win_max_cents",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key moving-window MAX over the last ``window_rows`` rows —
    ``MAX(cents) OVER (PARTITION BY key ORDER BY ts, seq ROWS BETWEEN
    window_rows-1 PRECEDING AND CURRENT ROW)`` (the alerting / peak-load
    window sibling of :func:`moving_window_sum`).

    Same ONE-exchange shape; the window max is computed with
    ``window_rows − 1`` vectorized shift-and-maximum passes guarded by the
    segment id (O(w·n), no per-row loop — sized for the small windows this
    frame is used with; document w ≲ 64).  Values go to exact integer
    cents; SQL null semantics: null values occupy a window slot but
    contribute nothing, and a window of only nulls yields null.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    SENTINEL = np.int64(-(2**62))

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)), pa.int64()
        ).combine_chunks()
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                "_cents": cents.fill_null(int(SENTINEL)),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def window(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        # null-safe key equality: dictionary codes with a -1 null sentinel
        # (a nullable int64 column reaches numpy as float64 NaN, and
        # NaN != NaN would split the SQL NULL partition into 1-row runs)
        kcodes = pc.fill_null(
            g.column(key).combine_chunks().dictionary_encode().indices.cast(
                pa.int64()
            ),
            -1,
        ).to_numpy(zero_copy_only=False)
        x = g.column("_cents").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(kcodes)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = kcodes[1:] != kcodes[:-1]
        seg_id = np.cumsum(start) - 1
        acc = x.copy()
        for j in range(1, window_rows):
            if j >= n:
                break
            shifted = np.full(n, SENTINEL, dtype=np.int64)
            shifted[j:] = x[:-j]
            same = np.zeros(n, dtype=bool)
            same[j:] = seg_id[j:] == seg_id[:-j]
            np.maximum(acc, np.where(same, shifted, SENTINEL), out=acc)
        ok = acc != SENTINEL
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                out_col: pa.array(acc, type=pa.int64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(window, batch_format="pyarrow")
    )


def moving_median_by_key(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    value_col: str,
    window_rows: int,
    out_col: str = "win_median",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key moving-window MEDIAN over the last ``window_rows`` rows —
    ``quantile_cont(value, 0.5) OVER (PARTITION BY key ORDER BY ts, seq
    ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)`` (the robust
    smoothing sibling of :func:`moving_max_by_key` — spike-resistant
    rolling baselines for alerting/quality streams).

    Same ONE-exchange shape; per partition the window values form an
    (n × w) matrix of segment-guarded shifts (NaN outside the segment /
    for SQL nulls), one ``np.sort`` along the window axis pushes NaNs to
    the end, and the interpolated median uses the group-relative rank
    formula ``v[lo]·(1−frac) + v[hi]·frac`` already pinned bit-exact
    against DuckDB ``quantile_cont`` by :func:`..ops.grouped_quantiles`.
    O(w·n) memory and O(n·w log w) compute — sized for the small windows
    this frame is used with (document w ≲ 64).  SQL null semantics:
    null values occupy a window slot but are ignored by the aggregate;
    an all-null window yields null.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                "_v": pc.cast(batch.column(value_col), pa.float64()),
            }
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def window(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        kcodes = pc.fill_null(
            g.column(key).combine_chunks().dictionary_encode().indices.cast(
                pa.int64()
            ),
            -1,
        ).to_numpy(zero_copy_only=False)
        x = g.column("_v").to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(kcodes)
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = kcodes[1:] != kcodes[:-1]
        seg_id = np.cumsum(start) - 1
        w = window_rows
        m = np.full((n, w), np.nan, dtype=np.float64)
        m[:, 0] = x
        for j in range(1, w):
            if j >= n:
                break
            same = seg_id[j:] == seg_id[:-j]
            col = m[j:, j]
            np.copyto(col, x[:-j], where=same)
        s = np.sort(m, axis=1)  # NaNs sort to the end of each row
        valid = w - np.isnan(m).sum(axis=1)
        ok = valid > 0
        med = np.full(n, np.nan, dtype=np.float64)
        if ok.any():
            rel = 0.5 * (valid[ok] - 1)
            lo = np.floor(rel).astype(np.int64)
            hi = np.ceil(rel).astype(np.int64)
            frac = rel - lo
            rows = np.nonzero(ok)[0]
            med[ok] = s[rows, lo] * (1 - frac) + s[rows, hi] * frac
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                out_col: pa.array(med, type=pa.float64(), mask=~ok),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(window, batch_format="pyarrow")
    )


def range_window_sum_by_key(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    value_col: str,
    window_us: int,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-key TIME-RANGE moving sum/count — ``SUM(cents) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)``: the frame holds every row whose timestamp lies in
    ``[ts − window, ts]``, INCLUDING peers of the current row (SQL RANGE
    semantics — unlike the ROWS frame of :func:`moving_window_sum`, ties
    share one frame, so no seq tie-break enters the result).

    ONE keyed exchange; per partition: sort by (key, ts, seq), prefix
    sums, the frame's upper bound from (key, ts) run ends, and the lower
    bound via the interleaved probe trick (rows + ``ts − window`` probes
    lexsorted together, within-segment counts off an exclusive cumsum) —
    ``rts`` is only sorted within key segments, so a global searchsorted
    would be invalid (the :func:`window_join` lesson).  Null-safe keys
    (dictionary codes); null timestamps are excluded (a RANGE frame needs
    an order value); null values occupy their frame slot with 0
    (``COALESCE`` in the oracle).
    """

    def route(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch.column(value_col), 100.0)), pa.int64()
        ).combine_chunks()
        t = pa.table(
            {
                seq: batch.column(seq),
                key: batch.column(key),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                "_cents": cents.fill_null(0),
            }
        )
        t = t.filter(t.column("_ats").combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def window(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    seq: g.column(seq),
                    key: g.column(key),
                    "win_sum_cents": pa.array([], type=pa.int64()),
                    "win_n": pa.array([], type=pa.int64()),
                }
            )
        kc = pc.fill_null(
            g.column(key).combine_chunks().dictionary_encode().indices.cast(
                pa.int64()
            ),
            -1,
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        cents = g.column("_cents").to_numpy(zero_copy_only=False)
        cs0 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cents, out=cs0[1:])
        start = np.ones(n, dtype=bool)
        if n > 1:
            start[1:] = kc[1:] != kc[:-1]
        si = np.flatnonzero(start)
        seg_id = np.cumsum(start) - 1
        # upper bound: end of the (key, ts) run (peers share the frame)
        new_run = start.copy()
        if n > 1:
            new_run[1:] |= ts[1:] != ts[:-1]
        rb = np.flatnonzero(new_run)
        run_end = np.append(rb[1:], n)
        run_id = np.cumsum(new_run) - 1
        hi = run_end[run_id]
        # lower bound: per-segment count of rows with ts < ts_i − window,
        # via the interleaved-probe exclusive cumsum
        kcat = np.concatenate([kc, kc])
        vcat = np.concatenate([ts, ts - window_us])
        tag = np.concatenate(
            [np.ones(n, dtype=np.int8), np.zeros(n, dtype=np.int8)]
        )  # probes sort BEFORE equal row values → strict < count
        order = np.lexsort((tag, vcat, kcat))
        isr = order < n
        excl = np.cumsum(isr) - isr
        kk = kcat[order]
        startm = np.ones(2 * n, dtype=bool)
        startm[1:] = kk[1:] != kk[:-1]
        base = np.maximum.accumulate(np.where(startm, excl, -1))
        cnt = excl - base
        lo_cnt = np.empty(n, dtype=np.int64)
        lo_cnt[order[~isr] - n] = cnt[~isr]
        lo = si[seg_id] + lo_cnt
        return pa.table(
            {
                seq: g.column(seq),
                key: g.column(key),
                "win_sum_cents": pa.array(cs0[hi] - cs0[lo], type=pa.int64()),
                "win_n": pa.array(hi - lo, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(window, batch_format="pyarrow")
    )


def dwell_time_by_attr(
    ds,
    *,
    key: str,
    ts_col: str,
    seq: str,
    attr_col: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Dwell-time attribution: each event's duration is the gap to the
    SAME key's next event (SQL ``lead(ts) − ts``), credited to the
    current event's attribute — "how long do users stay on each page
    type" without a sessionizer.  Returns per-attribute
    ``(n_spans, total_us, max_us)``; each key's last event has no
    successor and contributes nothing (LEAD semantics).

    ONE hash exchange of ``(key, ts, seq, attr)``; per partition: sort by
    (key, ts, seq), vectorized shift for the successor timestamp with a
    null-safe segment guard, then an aggregate-sized per-attribute fold.
    Null keys form one SQL partition (dictionary-code equality); null
    timestamps are excluded (no order position).
    """

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key: batch.column(key),
                seq: batch.column(seq),
                "_ats": pc.cast(batch.column(ts_col), pa.int64()),
                "_attr": batch.column(attr_col),
            }
        )
        t = t.filter(t.column("_ats").combine_chunks().is_valid())
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def spans(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key, "ascending"),
                ("_ats", "ascending"),
                (seq, "ascending"),
            ],
        )
        g = group.take(idx)
        n = g.num_rows
        attr_type = g.schema.field("_attr").type
        if n == 0:
            return pa.table(
                {
                    "_attr": pa.array([], type=attr_type),
                    "_n": pa.array([], type=pa.int64()),
                    "_sum": pa.array([], type=pa.int64()),
                    "_max": pa.array([], type=pa.int64()),
                }
            )
        kc = pc.fill_null(
            g.column(key).combine_chunks().dictionary_encode().indices.cast(
                pa.int64()
            ),
            -1,
        ).to_numpy(zero_copy_only=False)
        ts = g.column("_ats").to_numpy(zero_copy_only=False)
        gap = np.zeros(n, dtype=np.int64)
        has = np.zeros(n, dtype=bool)
        if n > 1:
            same = kc[1:] == kc[:-1]
            gap[:-1] = np.where(same, ts[1:] - ts[:-1], 0)
            has[:-1] = same
        t = pa.table(
            {
                "_attr": g.column("_attr"),
                "_gap": pa.array(gap, type=pa.int64()),
            }
        ).filter(pa.array(has))
        out = (
            t.group_by("_attr")
            .aggregate([([], "count_all"), ("_gap", "sum"), ("_gap", "max")])
            .rename_columns(["_attr", "_n", "_sum", "_max"])
        )
        return pa.table(
            {
                "_attr": out.column("_attr"),
                "_n": out.column("_n").cast(pa.int64()),
                "_sum": out.column("_sum").cast(pa.int64()),
                "_max": out.column("_max").cast(pa.int64()),
            }
        )

    def fold_route(batch: pa.Table) -> pa.Table:
        parts = partition_ids(batch.column("_attr"), 8)
        return batch.append_column("_rpart", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_rpart"])
            .group_by("_attr")
            .aggregate([("_n", "sum"), ("_sum", "sum"), ("_max", "max")])
        )
        return pa.table(
            {
                "attr": g.column("_attr"),
                "n_spans": g.column("_n_sum").cast(pa.int64()),
                "total_us": g.column("_sum_sum").cast(pa.int64()),
                "max_us": g.column("_max_max").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(spans, batch_format="pyarrow")
        .map_batches(fold_route, batch_format="pyarrow", batch_size=None)
        .groupby("_rpart")
        .map_groups(final, batch_format="pyarrow")
    )
