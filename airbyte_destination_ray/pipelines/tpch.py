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
    "q9_profit_by_nation_year",
    "q12_late_shipments_by_flag",
    "q19_special_revenue",
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
    keys = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in counts.iter_batches(batch_format="pyarrow")
        ]
    ).column("o_custkey")

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
