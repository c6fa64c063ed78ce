"""TPC-H-shaped composite pipelines (Q9/Q12/Q19/Q22 analogs over the
synthetic star schema).

Each composite follows the repo's exactness + scale conventions:

- money in integer cents (``floor(x·100)`` per row, int64 sums) so the
  aggregates are order-independent and hash-comparable to the DuckDB
  oracle;
- dimensions broadcast (``ray.put`` once via ``broadcast_join`` /
  ``semi_join``), facts stream; big×big goes through ONE hash exchange
  with explicit schemas (``ds.schema()`` on a derived Dataset executes
  the upstream pipeline — the measured 2× trap);
- group-by finals with tiny group counts (nation × year, returnflag,
  …) fold per-batch Arrow partials driver-side — the exchange carries
  one row per (group, batch), never per input row.

The adaptations to the synthetic schema (no partsupp/shipmode/phone
columns) are noted per function.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "q2_min_cost_supplier",
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "q12_late_shipments_by_flag",
    "q15_top_supplier",
    "q19_special_revenue",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customer_balance",
]


def _cents(col, factor=None) -> pa.Array:
    x = col if factor is None else pc.multiply(col, factor)
    return pc.cast(pc.floor(pc.multiply(x, 100.0)), pa.int64())


def _fold_partials(ds, keys: list[str], sums: list[str]) -> pa.Table:
    """Driver-side fold of per-batch partials — valid ONLY for tiny group
    counts (the partial stream is one row per (group, batch))."""
    parts = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    t = pa.concat_tables(parts, promote_options="permissive")
    if not keys:  # global scalar fold
        return pa.table(
            {
                c: pa.array(
                    [int(pc.sum(t.column(c)).as_py() or 0)], type=pa.int64()
                )
                for c in sums
            }
        )
    agg = t.group_by(keys).aggregate([(c, "sum") for c in sums])
    # this pyarrow returns key columns first; rename positionally
    return agg.rename_columns(keys + sums)


def q9_profit_by_nation_year(sf_dir: str, *, name_token: str = "red"):
    """Q9 analog (no partsupp in the synthetic schema, so profit =
    revenue): Σ cents of ``l_extendedprice·(1−l_discount)`` per
    (supplier nation, order year) over parts whose name contains
    ``name_token``.

    Shape: part filter → broadcast partkey set (semi join, zero
    shuffle); supplier⋈nation pre-joined driver-side and broadcast into
    the fact scan (suppkey → nation name); ONE big×big hash exchange
    (lineitem revenue rows ⋈ orders years, unique right keys); final =
    (25 nations × ~7 years) partials folded driver-side."""
    import pyarrow.parquet as pq

    from ..sources.parquet import read_parquet_sized
    from .relational import broadcast_join, semi_join, shuffle_join

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    wanted = part.filter(
        pc.match_substring(part.column("p_name"), name_token)
    ).column("p_partkey")

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    sn = supp.join(
        nation, keys="s_nationkey", right_keys="n_nationkey"
    ).select(["s_suppkey", "n_name"])

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        ],
    )
    li = semi_join(li, wanted, on="l_partkey")
    li = broadcast_join(
        li,
        sn,
        left_on="l_suppkey",
        right_on="s_suppkey",
        select=["l_orderkey", "l_extendedprice", "l_discount", "n_name"],
    )

    def rev(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "n_name": b.column("n_name"),
                "_rev": _cents(
                    b.column("l_extendedprice"),
                    pc.subtract(1.0, b.column("l_discount")),
                ),
            }
        )

    li = li.map_batches(rev, batch_format="pyarrow", batch_size=None)

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    i64 = pa.int64()
    joined = shuffle_join(
        li,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        select=["n_name", "o_year", "_rev"],
        hot_keys=None,  # right keys unique; left ≤ ~7 rows per order
        left_schema=pa.schema(
            [("l_orderkey", i64), ("n_name", pa.string()), ("_rev", i64)]
        ),
        right_schema=pa.schema([("o_orderkey", i64), ("o_year", i64)]),
    )
    partials = joined.map_batches(
        lambda b: b.group_by(["n_name", "o_year"])
        .aggregate([("_rev", "sum")])
        .rename_columns(["n_name", "o_year", "profit_cents"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    return _fold_partials(partials, ["n_name", "o_year"], ["profit_cents"])


def q12_late_shipments_by_flag(sf_dir: str, *, late_days: int = 30):
    """Q12 analog (the synthetic lineitem has no shipmode/commitdate, so
    the group key is ``l_returnflag`` and "late" = shipped more than
    ``late_days`` after the order date): per returnflag, CASE-count line
    items on high-priority (1-URGENT / 2-HIGH) vs lower-priority orders
    among the late ones.

    ONE big×big hash exchange (lineitem ⋈ orders on the order key) with
    explicit schemas; final = 3-row driver fold of per-batch partials."""
    from ..sources.parquet import read_parquet_sized
    from .relational import shuffle_join

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    i64 = pa.int64()
    joined = shuffle_join(
        li,
        orders,
        left_on="l_orderkey",
        right_on="o_orderkey",
        select=["l_returnflag", "l_shipdate", "o_orderdate", "o_orderpriority"],
        hot_keys=None,
        left_schema=pa.schema(
            [
                ("l_orderkey", i64),
                ("l_returnflag", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", i64),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    late_us = late_days * 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        late = pc.greater(
            pc.cast(b.column("l_shipdate"), i64),
            pc.add(pc.cast(b.column("o_orderdate"), i64), late_us),
        )
        b = b.filter(pc.fill_null(late, False))
        hi = pc.is_in(
            b.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "high_line_count": pc.cast(hi, i64),
                "low_line_count": pc.cast(pc.invert(hi), i64),
            }
        )
        return (
            t.group_by("l_returnflag")
            .aggregate([("high_line_count", "sum"), ("low_line_count", "sum")])
            .rename_columns(
                ["l_returnflag", "high_line_count", "low_line_count"]
            )
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    return _fold_partials(
        partials, ["l_returnflag"], ["high_line_count", "low_line_count"]
    )


def q19_special_revenue(sf_dir: str):
    """Q19 analog: revenue cents from lineitem ⋈ part where ONE of three
    (brand, size-range, quantity-range) conjunctions holds — the
    OR-of-ANDs predicate benchmark.  The part dimension broadcasts
    (zero shuffle of the fact side); the predicate is one vectorized
    Arrow expression; the final is a single global cents sum folded from
    per-batch scalars."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..sources.parquet import read_parquet_sized
    from .relational import broadcast_join

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(
        li,
        part,
        left_on="l_partkey",
        right_on="p_partkey",
        select=["l_quantity", "l_extendedprice", "l_discount",
                "p_brand", "p_size"],
    )

    def partial(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand")
        size = b.column("p_size")
        qty = b.column("l_quantity")

        def clause(bname, smax, qlo, qhi):
            return pc.and_(
                pc.and_(
                    pc.equal(brand, bname),
                    pc.and_(
                        pc.greater_equal(size, 1), pc.less_equal(size, smax)
                    ),
                ),
                pc.and_(
                    pc.greater_equal(qty, float(qlo)),
                    pc.less_equal(qty, float(qhi)),
                ),
            )

        keep = pc.or_(
            pc.or_(
                clause("Brand#12", 5, 1, 11), clause("Brand#23", 10, 10, 20)
            ),
            clause("Brand#34", 15, 20, 30),
        )
        b = b.filter(pc.fill_null(keep, False))
        rev = _cents(
            b.column("l_extendedprice"),
            pc.subtract(1.0, b.column("l_discount")),
        )
        s = pc.sum(rev).as_py()
        return pa.table(
            {"revenue_cents": pa.array([0 if s is None else int(s)])}
        )

    partials = joined.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    out = _fold_partials(partials, [], ["revenue_cents"])
    if out is None:
        return pa.table({"revenue_cents": pa.array([0], type=pa.int64())})
    return out


def q22_idle_customer_balance(sf_dir: str, *, max_orders: int = 2):
    """Q22 analog (no phone column, so the group key is the customer's
    nation; the synthetic corpus gives nearly every customer an order, so
    "idle" = at most ``max_orders`` orders instead of NOT EXISTS):
    customers with account balance above the positive-balance average and
    low purchase activity, counted + balance-summed per nation.

    The average is computed in one streaming partial pass (exact int
    cents sum + count, ONE float division on the driver — IEEE-safe on
    both sides); the activity filter is a distributed per-custkey count
    followed by a broadcast anti join against the active-customer key
    set (bounded by customer cardinality — the shuffle anti-join variant
    exists in the dedup family for keys that outgrow a broadcast); the
    final folds ≤25 nation partials."""
    import pyarrow.parquet as pq

    from ..sources.parquet import read_parquet_sized
    from .ops import grouped_count
    from .relational import anti_join, broadcast_join

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(b: pa.Table) -> pa.Table:
        pos = b.filter(pc.greater(b.column("c_acctbal"), 0.0))
        cents = _cents(pos.column("c_acctbal"))
        s = pc.sum(cents).as_py()
        return pa.table(
            {
                "s": pa.array([0 if s is None else int(s)]),
                "n": pa.array([pos.num_rows], type=pa.int64()),
            }
        )

    tot = _fold_partials(
        cust.map_batches(bal_partial, batch_format="pyarrow", batch_size=None),
        [],
        ["s", "n"],
    )
    thresh_cents = tot.column("s")[0].as_py() / max(
        tot.column("n")[0].as_py(), 1
    )

    counts = grouped_count(
        read_parquet_sized(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        ),
        key="o_custkey",
        out_col="_n",
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("_n"), max_orders)),
        batch_format="pyarrow",
        batch_size=None,
    )
    key_parts = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in counts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    # all-empty blocks (no customer over max_orders) yield ZERO batches
    # from Ray — every customer is "idle", the anti-join set is empty
    keys = (
        pa.concat_tables(key_parts).column("o_custkey")
        if key_parts
        else pa.array([], type=pa.int64())
    )

    rich = cust.map_batches(
        lambda b: b.filter(
            pc.greater(_cents(b.column("c_acctbal")), thresh_cents)
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    idle = anti_join(rich, keys, on="c_custkey")
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    idle = broadcast_join(
        idle,
        nation,
        left_on="c_nationkey",
        right_on="n_nationkey",
        select=["n_name", "c_acctbal"],
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "n_name": b.column("n_name"),
                "numcust": pa.array([1] * b.num_rows, type=pa.int64()),
                "totacctbal_cents": _cents(b.column("c_acctbal")),
            }
        )
        return (
            t.group_by("n_name")
            .aggregate([("numcust", "sum"), ("totacctbal_cents", "sum")])
            .rename_columns(["n_name", "numcust", "totacctbal_cents"])
        )

    out = _fold_partials(
        idle.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["n_name"],
        ["numcust", "totacctbal_cents"],
    )
    if out is None:  # zero qualifying customers → typed empty result
        return pa.table(
            {
                "n_name": pa.array([], type=pa.string()),
                "numcust": pa.array([], type=pa.int64()),
                "totacctbal_cents": pa.array([], type=pa.int64()),
            }
        )
    return out


def q15_top_supplier(
    sf_dir: str,
    *,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
):
    """Q15 (top supplier — faithful: lineitem + supplier only): revenue
    per supplier over a one-quarter shipdate window, return the
    supplier(s) achieving the MAX revenue (ties all kept, like the
    reference query's ``= (SELECT max(...))``).

    Shape: one column-pruned lineitem scan → vectorized date filter →
    per-batch (suppkey → cents) partials; the fold is dim-sized
    (one row per supplier per batch), so the max + winner select +
    name join all happen on aggregate-sized data driver-side — zero
    payload exchanges, exact integer cents end-to-end."""
    import datetime as _dt

    import pyarrow.parquet as pq

    from ..sources.parquet import read_parquet_sized

    lo = _dt.datetime.fromisoformat(start)
    hi = _dt.datetime.fromisoformat(end)
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(b.column("l_shipdate"), lo),
            pc.less(b.column("l_shipdate"), hi),
        )
        t = b.filter(m)
        rev = _cents(
            t.column("l_extendedprice"),
            pc.subtract(1.0, t.column("l_discount")),
        )
        return (
            pa.table({"s_suppkey": t.column("l_suppkey"), "_rev": rev})
            .group_by("s_suppkey")
            .aggregate([("_rev", "sum")])
            .rename_columns(["s_suppkey", "_rev"])
        )

    rev = _fold_partials(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["s_suppkey"],
        ["_rev"],
    )
    if rev is None:
        return pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "total_revenue_cents": pa.array([], type=pa.int64()),
            }
        )
    best = pc.max(rev.column("_rev"))
    winners = rev.filter(pc.equal(rev.column("_rev"), best))
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    out = winners.join(supp, keys="s_suppkey").sort_by("s_suppkey")
    return pa.table(
        {
            "s_suppkey": out.column("s_suppkey"),
            "s_name": out.column("s_name"),
            "total_revenue_cents": out.column("_rev"),
        }
    )


def q2_min_cost_supplier(
    sf_dir: str,
    *,
    size: int = 15,
    num_partitions: int = 32,
):
    """Q2 analog (no partsupp in the synthetic schema, so a supplier's
    "cost" for a part is its cheapest single lineitem extendedprice):
    for every part of the probed size, the supplier offering the minimum
    cost — tie-broken like Q2's ORDER BY (higher ``s_acctbal`` first,
    then lower ``s_suppkey``) — with the supplier's nation attached.

    Shape: broadcast part-subset semi join (zero shuffle) → per-batch
    (part, supp) min-cents partials → broadcast supplier⋈nation dim onto
    the partial stream → ONE hash exchange keyed on partkey → a
    partition-LEVEL vectorized argmin (lexsort + first-per-part mask, no
    per-key Python).  The exchange carries one row per (part, supplier,
    batch) — never per lineitem."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import partition_ids
    from ..sources.parquet import read_parquet_sized
    from .relational import broadcast_join, semi_join

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_size"]
    )
    wanted = part.filter(
        pc.equal(part.column("p_size"), size)
    ).column("p_partkey")

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    sn = supp.join(
        nation, keys="s_nationkey", right_keys="n_nationkey"
    ).select(["s_suppkey", "s_name", "s_acctbal", "n_name"])

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    li = semi_join(li, wanted, on="l_partkey")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_partkey": b.column("l_partkey"),
                "s_suppkey": b.column("l_suppkey"),
                "cost_cents": _cents(b.column("l_extendedprice")),
            }
        )
        agg = (
            t.group_by(["p_partkey", "s_suppkey"])
            .aggregate([("cost_cents", "min")])
            .rename_columns(["p_partkey", "s_suppkey", "cost_cents"])
        )
        parts = partition_ids(agg.column("p_partkey"), num_partitions)
        return agg.append_column(
            "_part", pa.array(parts, type=pa.int64())
        )

    partials = broadcast_join(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        sn,
        left_on="s_suppkey",
        right_on="s_suppkey",
        select=[
            "p_partkey", "s_suppkey", "cost_cents",
            "s_name", "s_acctbal", "n_name", "_part",
        ],
    )

    def argmin(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        # re-min across batch partials, then argmin per part with the Q2
        # tie order (cost asc, acctbal desc, suppkey asc)
        g = (
            g.group_by(["p_partkey", "s_suppkey", "s_name", "n_name"])
            .aggregate([("cost_cents", "min"), ("s_acctbal", "min")])
            .rename_columns(
                [
                    "p_partkey", "s_suppkey", "s_name", "n_name",
                    "cost_cents", "s_acctbal",
                ]
            )
        )
        idx = pc.sort_indices(
            g,
            sort_keys=[
                ("p_partkey", "ascending"),
                ("cost_cents", "ascending"),
                ("s_acctbal", "descending"),
                ("s_suppkey", "ascending"),
            ],
        )
        t = g.take(idx)
        pk = t.column("p_partkey").to_numpy(zero_copy_only=False)
        first = np.ones(len(pk), dtype=bool)
        if len(pk) > 1:
            first[1:] = pk[1:] != pk[:-1]
        t = t.filter(pa.array(first))
        return t.select(
            [
                "p_partkey", "s_suppkey", "s_name",
                "s_acctbal", "n_name", "cost_cents",
            ]
        )

    return (
        partials.groupby("_part")
        .map_groups(argmin, batch_format="pyarrow")
    )


def q11_important_parts(sf_dir: str, *, fraction: float = 0.0006):
    """Q11 analog (no partsupp: a part's "value" is its total lineitem
    revenue): parts whose value exceeds ``fraction`` of the corpus-wide
    total value.

    Shape: per-batch (partkey → cents) partials → ONE hash exchange →
    partition-level per-part sums, materialized ONCE; the global total
    folds the per-part stream's aggregate-sized partition sums
    driver-side, and the threshold filter re-streams the same
    materialized per-part Dataset — the fact table is scanned exactly
    once and the comparison is int-vs-one-IEEE-product on both sides."""
    import numpy as np

    from ..functions.hashing import partition_ids
    from ..sources.parquet import read_parquet_sized

    num_partitions = 32
    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_partkey": b.column("l_partkey"),
                "value_cents": _cents(
                    b.column("l_extendedprice"),
                    pc.subtract(1.0, b.column("l_discount")),
                ),
            }
        )
        agg = (
            t.group_by("p_partkey")
            .aggregate([("value_cents", "sum")])
            .rename_columns(["p_partkey", "value_cents"])
        )
        parts = partition_ids(agg.column("p_partkey"), num_partitions)
        return agg.append_column("_part", pa.array(parts, type=pa.int64()))

    def per_part(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_part"])
            .group_by("p_partkey")
            .aggregate([("value_cents", "sum")])
            .rename_columns(["p_partkey", "value_cents"])
        )

    values = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(per_part, batch_format="pyarrow")
        .materialize()
    )
    total = 0
    for b in values.iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        s = pc.sum(t.column("value_cents")).as_py()
        total += 0 if s is None else int(s)
    thresh = fraction * float(total)  # ONE IEEE product, same on both sides

    return values.map_batches(
        lambda b: b.filter(pc.greater(b.column("value_cents"), thresh)),
        batch_format="pyarrow",
        batch_size=None,
    )


def q21_waiting_suppliers(
    sf_dir: str,
    *,
    top_n: int = 20,
    num_partitions: int = 32,
):
    """Q21 analog (no commit/receipt dates: the "waiting" supplier of a
    finished multi-supplier order is the UNIQUE latest shipper): for
    every finished ('F') order with ≥2 distinct suppliers where exactly
    one supplier ships on the order's max shipdate, credit that
    supplier; output the top-N suppliers by count (Q21's numwait),
    ordered count desc then suppkey asc.

    Shape: lineitem rows and order-status rows ride ONE tagged-union
    hash exchange keyed on orderkey (no broadcast of the fact-sized
    order set); the per-partition kernel is fully vectorized
    (sort + run masks + reduceat, no per-order Python); the winner
    stream is dim-sized, so the count + name join + top-N run on
    aggregate-sized data driver-side."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import partition_ids
    from ..sources.parquet import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )

    def tag_lines(b: pa.Table) -> pa.Table:
        parts = partition_ids(b.column("l_orderkey"), num_partitions)
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "_ship": pc.cast(b.column("l_shipdate"), pa.int64()),
                "_tag": pa.array([0] * b.num_rows, type=pa.int8()),
                "_part": pa.array(parts, type=pa.int64()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("o_orderstatus"), "F"))
        parts = partition_ids(t.column("o_orderkey"), num_partitions)
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "l_suppkey": pa.array([0] * t.num_rows, type=pa.int64()),
                "_ship": pa.array([0] * t.num_rows, type=pa.int64()),
                "_tag": pa.array([1] * t.num_rows, type=pa.int8()),
                "_part": pa.array(parts, type=pa.int64()),
            }
        )

    union = li.map_batches(
        tag_lines, batch_format="pyarrow", batch_size=None
    ).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", batch_size=None)
    )

    def winners(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "numwait": pa.array([], type=pa.int64()),
            }
        )
        tags = group.column("_tag").to_numpy(zero_copy_only=False)
        fkeys = group.filter(pa.array(tags == 1)).column("l_orderkey")
        lines = group.filter(pa.array(tags == 0))
        if fkeys.length() == 0 or lines.num_rows == 0:
            return empty
        fset = np.unique(fkeys.to_numpy(zero_copy_only=False))
        ok = lines.column("l_orderkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(fset, ok)
        m = pos < len(fset)
        m &= fset[np.clip(pos, 0, len(fset) - 1)] == ok
        lines = lines.filter(pa.array(m))
        if lines.num_rows == 0:
            return empty
        t = lines.sort_by(
            [("l_orderkey", "ascending"), ("l_suppkey", "ascending")]
        )
        okey = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        skey = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        ship = t.column("_ship").to_numpy(zero_copy_only=False)
        n = len(okey)
        ostart = np.ones(n, dtype=bool)
        ostart[1:] = okey[1:] != okey[:-1]
        oid = np.cumsum(ostart) - 1
        n_orders = oid[-1] + 1
        # distinct suppliers per order
        sstart = ostart.copy()
        sstart[1:] |= skey[1:] != skey[:-1]
        nsupp = np.bincount(oid[sstart], minlength=n_orders)
        # per-order max shipdate (orders are contiguous after the sort, so
        # reduceat beats ufunc.at by orders of magnitude)
        maxship = np.maximum.reduceat(ship, np.nonzero(ostart)[0])
        at_max = ship == maxship[oid]
        # sstart marks the first row of each (order, supp) run, but the max
        # may occur on a later row of the run — mark (order, supp) runs
        # that contain ANY at_max row.
        run_id = np.cumsum(sstart) - 1
        run_hit = np.zeros(run_id[-1] + 1, dtype=bool)
        np.logical_or.at(run_hit, run_id[at_max], True)
        runs_first = np.nonzero(sstart)[0]
        hit_rows = runs_first[run_hit]  # one row per (order, supp) at max
        hit_oid = oid[hit_rows]
        n_at_max = np.bincount(hit_oid, minlength=n_orders)
        solo = (n_at_max == 1) & (nsupp >= 2)
        if not solo.any():
            return empty
        win_rows = hit_rows[solo[hit_oid]]
        win_supp = skey[win_rows]
        sup, cnt = np.unique(win_supp, return_counts=True)
        return pa.table(
            {
                "s_suppkey": pa.array(sup, type=pa.int64()),
                "numwait": pa.array(cnt, type=pa.int64()),
            }
        )

    counts = _fold_partials(
        union.groupby("_part").map_groups(winners, batch_format="pyarrow"),
        ["s_suppkey"],
        ["numwait"],
    )
    if counts is None:
        return pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "numwait": pa.array([], type=pa.int64()),
            }
        )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    out = counts.join(supp, keys="s_suppkey").sort_by(
        [("numwait", "descending"), ("s_suppkey", "ascending")]
    )
    out = out.slice(0, top_n)
    return out.select(["s_suppkey", "s_name", "numwait"])


def q20_excess_suppliers(
    sf_dir: str,
    *,
    name_token: str = "widget",
    year: int = 1996,
    num_partitions: int = 32,
):
    """Q20 analog (no partsupp in the synthetic schema, so a supplier's
    "stock position" for a part is its shipped quantity that year):
    suppliers who, for at least one part whose name contains
    ``name_token``, shipped MORE THAN HALF of that part's total shipped
    quantity in ``year`` — the Q20 correlated threshold
    ``ps_availqty > 0.5 * sum(l_quantity)`` made exact in integers as
    ``2·qty > total`` (quantities are integral-valued doubles; cast).

    Shape (reference: Q20's nested EXISTS chain, TPC-H spec §B.20):
    part-name filter → broadcast partkey set (semi join, zero shuffle);
    fact scan prunes to 4 columns and the year window; per-batch
    (partkey, suppkey) integer-qty partials → ONE hash exchange keyed on
    partkey → partition-level vectorized correlated compare (sorted
    reduceat totals per part, no per-key Python); qualifying suppkeys are
    dim-bounded, so the final distinct + supplier⋈nation name join folds
    driver-side."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import partition_ids
    from ..sources.parquet import read_parquet_sized
    from .relational import semi_join

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    wanted = part.filter(
        pc.match_substring(part.column("p_name"), name_token)
    ).column("p_partkey")

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    li = semi_join(li, wanted, on="l_partkey")

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.equal(pc.year(b.column("l_shipdate")), year)
        b = b.filter(mask)
        t = pa.table(
            {
                "p_partkey": b.column("l_partkey"),
                "s_suppkey": b.column("l_suppkey"),
                "qty": pc.cast(b.column("l_quantity"), pa.int64()),
            }
        )
        agg = (
            t.group_by(["p_partkey", "s_suppkey"])
            .aggregate([("qty", "sum")])
            .rename_columns(["p_partkey", "s_suppkey", "qty"])
        )
        parts = partition_ids(agg.column("p_partkey"), num_partitions)
        return agg.append_column("_part", pa.array(parts, type=pa.int64()))

    def qualify(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(["p_partkey", "s_suppkey"])
            .aggregate([("qty", "sum")])
            .rename_columns(["p_partkey", "s_suppkey", "qty"])
        )
        idx = pc.sort_indices(g, sort_keys=[("p_partkey", "ascending")])
        g = g.take(idx)
        pk = g.column("p_partkey").to_numpy(zero_copy_only=False)
        qty = g.column("qty").to_numpy(zero_copy_only=False)
        if len(pk) == 0:
            return pa.table({"s_suppkey": pa.array([], type=pa.int64())})
        starts = np.flatnonzero(
            np.concatenate(([True], pk[1:] != pk[:-1]))
        )
        totals = np.add.reduceat(qty, starts)
        per_row_total = np.repeat(totals, np.diff(np.append(starts, len(pk))))
        keep = 2 * qty > per_row_total
        sk = g.column("s_suppkey").filter(pa.array(keep))
        return pa.table({"s_suppkey": pc.unique(sk)})

    partials = li.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    winners = _fold_partials(
        partials.groupby("_part").map_groups(
            qualify, batch_format="pyarrow"
        ).map_batches(
            # dummy count column so _fold_partials' group-by dedups suppkeys
            lambda b: b.append_column(
                "_one", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["s_suppkey"],
        ["_one"],
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    sn = supp.join(
        nation, keys="s_nationkey", right_keys="n_nationkey"
    ).select(["s_suppkey", "s_name", "n_name"])
    if winners is None:
        return pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "n_name": pa.array([], type=pa.string()),
            }
        )
    out = winners.select(["s_suppkey"]).join(sn, keys="s_suppkey")
    return out.sort_by(
        [("s_name", "ascending"), ("s_suppkey", "ascending")]
    ).select(["s_suppkey", "s_name", "n_name"])
