"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

No ``ray.init``/``ray.shutdown`` here or in the library — the driver owns
the session.

Queries without an ``oracle_sql`` entry (near-dup/LSH/heuristic operators)
get the driver's rows-only check; their semantics are pinned by unit tests
in ``tests/`` instead.
"""

from __future__ import annotations

import shutil
import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def entry() -> Any:
    """Flagship CDC pipeline at sf0.001 scale: synthesize a deterministic
    web-page change binlog, run the epoch-by-epoch LWW sync into a Parquet
    lake, return the compacted table as a Dataset."""
    from airbyte_destination_ray.sources.synth import ensure_binlog
    from airbyte_destination_ray.pipelines.cdc import read_table, run_cdc_sync

    base = Path("/tmp/adr_entry")
    binlog = base / "binlog"
    lake = base / "lake"
    ensure_binlog(binlog, n_events=6000, n_keys=1000, n_epochs=3, seed=42)
    if lake.exists():
        shutil.rmtree(lake)
    run_cdc_sync(str(lake), str(binlog), num_partitions=16)
    return read_table(str(lake), "pages")


# -- table loaders ----------------------------------------------------------


def _events(sf_dir: str, columns=None):
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/events.parquet", columns=columns)


def _documents(sf_dir: str, columns=None):
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=columns)


def _embeddings(sf_dir: str):
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/embeddings.parquet")


def _query_vectors(sf_dir: str, n: int = 4):
    import numpy as np
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    t = t.filter(pc.less(t.column("vec_id"), n))
    q = np.stack(t.column("embedding").to_pylist())
    ids = np.asarray(t.column("vec_id").to_pylist())
    return q, ids


# -- CDC / LWW --------------------------------------------------------------


def _q_cdc_lww_latest(sf_dir: str):
    """A1 (LWW upsert) as a query: latest event per user_id by (ts, event_id)."""
    from airbyte_destination_ray.pipelines.ops import lww_latest

    return lww_latest(_events(sf_dir), pk="user_id", ver="ts", seq="event_id")


def _q_cdc_lww_salted(sf_dir: str):
    """Hot-key-safe LWW: salted sub-partition pre-reduce + final per-key
    reduce.  Same oracle as the plain LWW — proves the skew path correct."""
    from airbyte_destination_ray.pipelines.ops import lww_latest_salted

    return lww_latest_salted(
        _events(sf_dir), pk="user_id", ver="ts", seq="event_id", salt_factor=8
    )


def _q_cdc_lww_tombstones(sf_dir: str):
    """A1 + tombstones: 'error' events are deletes; a user whose winning
    version is a delete is suppressed (§2.7 delete handling)."""
    from airbyte_destination_ray.pipelines.ops import lww_latest_with_tombstones

    return lww_latest_with_tombstones(
        _events(sf_dir),
        pk="user_id",
        ver="ts",
        seq="event_id",
        tombstone_col="event_type",
        tombstone_value="error",
    )


def _q_cdc_sync_events_full(sf_dir: str):
    """The ENTIRE engine end-to-end: events → binlog → epochs → shuffle →
    LWW merge → manifests → checkpoints → compacted lake read."""
    from airbyte_destination_ray.pipelines.events_cdc import sync_events_table

    return sync_events_table(sf_dir)


# -- dedup ------------------------------------------------------------------


def _q_dedup_exact_documents(sf_dir: str):
    """Exact dedup on document text (hash-partition + per-group first)."""
    from airbyte_destination_ray.pipelines.ops import dedup_exact

    return dedup_exact(_documents(sf_dir), on="text", keep_by="doc_id")


def _q_dedup_exact_hash(sf_dir: str):
    """Exact dedup by 64-bit content fingerprint (payload never shuffled)."""
    from airbyte_destination_ray.pipelines.dedup import dedup_exact_hash

    return dedup_exact_hash(_documents(sf_dir))


def _q_dedup_exact_incremental(sf_dir: str):
    """Stream-ordered incremental dedup (CDC × dedup): the documents table
    arrives as two id-ordered increments; each is deduped against the
    persistent seen-fingerprint state and the union of survivors must
    equal the one-shot min-id dedup (the SQL oracle)."""
    import shutil

    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.dedup import dedup_exact_incremental

    import os as _os

    # pid-scoped: a fixed shared path races concurrent gate/driver runs.
    # Also sweep dirs left by DEAD pids (a live pid's dir is never touched,
    # so there is no race; without this every run would leak one dir).
    for stale in Path("/tmp").glob("adr_incr_state-*"):
        try:
            pid = int(stale.name.rsplit("-", 1)[1])
            _os.kill(pid, 0)
        except (ValueError, ProcessLookupError):
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another user: leave it
    state = Path(f"/tmp/adr_incr_state-{_os.getpid()}")
    if state.exists():
        shutil.rmtree(state)

    def _epoch(lo, hi):
        def fn(batch):
            ids = batch.column("doc_id")
            return batch.filter(
                pc.and_(pc.greater_equal(ids, lo), pc.less(ids, hi))
            )

        return _documents(sf_dir).map_batches(
            fn, batch_format="pyarrow", batch_size=None
        )

    s1 = dedup_exact_incremental(_epoch(0, 250), str(state))
    s2 = dedup_exact_incremental(_epoch(250, 1 << 60), str(state))
    return s1.union(s2)


def _plant_copies(ds, id_col: str, modulus: int):
    """Append an exact copy of every ``modulus``-th row (by ``id_col``)
    with id +1,000,000 — the planted ground truth the signature-exact
    dedup oracles check in both directions (copies MUST drop, natural
    near-dups MUST survive).  Shared by the minhash / ngram-jaccard /
    embedding-cosine oracle modes."""
    import pyarrow as pa

    def plant(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        copies = batch.filter(pa.array(ids % modulus == 0))
        copies = copies.set_column(
            copies.schema.get_field_index(id_col),
            id_col,
            pc.add(copies.column(id_col), pa.scalar(1_000_000, pa.int64())),
        )
        return pa.concat_tables([batch, copies])

    return ds.map_batches(plant, batch_format="pyarrow", batch_size=None)


def _q_dedup_minhash(sf_dir: str):
    """MinHash+LSH dedup in signature-EXACT mode (verify_threshold=1.0):
    identical signatures share every band, so the full shingle→minhash→
    band→bucket→verify machinery runs, and the surviving set reduces to
    "keep the min doc_id per distinct word-5-gram SET" — SQL-expressible.
    Exact copies of every 20th doc are planted (new ids +1,000,000) so
    the oracle checks both directions: planted copies MUST drop, natural
    near-dups (Jaccard ≥ 0.8 but < 1.0) MUST survive.  The production
    near-dup threshold (0.8) stays pinned by unit tests at known corpus
    counts."""
    from airbyte_destination_ray.pipelines.dedup import dedup_minhash_lsh

    ds = _plant_copies(_documents(sf_dir), "doc_id", 20)
    # bands=1 → the bucket key is the hash of the FULL signature, so
    # buckets are signature-equality classes and the min-id rep IS the
    # class winner.  (Multi-band buckets would admit near-dup reps that
    # block a copy from ever meeting its signature-equal original —
    # observed with docs whose neighbors collide on all 16 bands.)
    return dedup_minhash_lsh(ds, bands=1, verify_threshold=1.0)


def _q_dedup_simhash(sf_dir: str):
    """SimHash dedup in fingerprint-EXACT mode (hamming_threshold=0,
    bands=1 → buckets are full-fingerprint equality classes, same trick
    as dedup_minhash_documents).  The natural corpus is unusable for an
    exact oracle: SimHash maps near-dups to IDENTICAL fingerprints by
    design (measured: 3 cross-multiset Hamming-0 collisions at sf0.01,
    26 at sf0.1), so the query runs the full tokenize→hash→bit-majority→
    fingerprint→bucket→verify machinery over a deterministic synthetic
    corpus keyed on doc_id: 40 shared-vocab tokens ``w{j}_{(id+j)%P_j}``
    with per-position coprime moduli (CRT ⇒ token tuples injective in id;
    fingerprints verified pairwise-distinct up to 300k docs), plus exact
    copies of every 25th doc planted at id+1,000,000.  Closed-form
    answer: exactly the original doc_ids survive (copies MUST drop,
    distinct docs MUST all be kept — both directions checked)."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.dedup import dedup_simhash
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    primes = [1009, 1013, 1019, 1021, 1031, 1033, 1039, 1049]

    def synth(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cols = []
        for j in range(40):
            res = (ids + j) % primes[j % 8]
            cols.append(
                pc.binary_join_element_wise(
                    pa.scalar(f"w{j}_"),
                    pa.array(res.astype("U"), type=pa.string()),
                    pa.scalar(""),
                )
            )
        text = pc.binary_join_element_wise(*cols, pa.scalar(" "))
        return batch.append_column("text", text)

    ds = ds.map_batches(synth, batch_format="pyarrow", batch_size=None)
    ds = _plant_copies(ds, "doc_id", 25)
    out = dedup_simhash(ds, hamming_threshold=0, bands=1)
    return out.select_columns(["doc_id"])


def _q_dedup_minhash_incremental(sf_dir: str):
    """Incremental MinHash near-dup dedup vs persistent signature state
    (the crawl-refresh production shape): three id-ordered increments of
    the copy-augmented corpus stream through dedup_minhash_incremental
    in signature-EXACT mode (bands=1, threshold=1.0 — the
    dedup_minhash_documents reduction); copies (+1,000,000 ids) land in
    the LAST increment so cross-increment state probing is what drops
    them.  id-ordered stream ⇒ survivors == one-shot min-id-per-class ⇒
    the SAME SQL oracle as the one-shot query."""
    import os
    import shutil as _sh

    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.dedup import (
        dedup_minhash_incremental,
    )

    state = f"/tmp/adr_query/{os.path.basename(sf_dir)}-{os.getpid()}-mhinc"
    _sh.rmtree(state, ignore_errors=True)  # fresh stream per query run
    aug = _plant_copies(_documents(sf_dir), "doc_id", 20)

    def id_range(lo, hi):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id")
            return b.filter(pc.and_(
                pc.greater_equal(ids, pa.scalar(lo, pa.int64())),
                pc.less(ids, pa.scalar(hi, pa.int64())),
            ))

        return f

    out = []
    # id-ordered increments: originals split in two, copies (+1e6) last
    for lo, hi in ((0, 300), (300, 1_000_000), (1_000_000, 1 << 62)):
        inc = aug.map_batches(
            id_range(lo, hi), batch_format="pyarrow", batch_size=None
        )
        res = dedup_minhash_incremental(
            inc, state, bands=1, verify_threshold=1.0,
            num_partitions=16,
        )
        out.append(res.materialize())
    merged = out[0]
    for o in out[1:]:
        merged = merged.union(o)
    return merged


def _q_dedup_ngram_jaccard(sf_dir: str):
    """Word-3-gram Jaccard dedup in signature-EXACT mode (threshold=1.0,
    same reduction as dedup_minhash_documents but with the wider
    128-perm/32-band precision recipe and k=3 shingles): keep the min
    doc_id per distinct 3-gram SET over a copy-augmented corpus (every
    15th doc planted at +1,000,000).  The production 0.8 threshold stays
    pinned by unit tests at known corpus counts."""
    from airbyte_destination_ray.pipelines.dedup import dedup_ngram_jaccard

    ds = _plant_copies(_documents(sf_dir), "doc_id", 15)
    # bands=1: bucket = full-signature hash (see dedup_minhash_documents)
    return dedup_ngram_jaccard(ds, bands=1, threshold=1.0)


def _q_dedup_embedding(sf_dir: str):
    """Embedding-cosine dedup in EXACT-copy mode: exact duplicates of
    every 10th vector are planted (ids +1,000,000), 63 hyperplane sign
    bits make buckets near-singletons, and the float-transit verify at
    threshold 0.999999 admits only the planted byte-identical copies
    (max natural pairwise cosine in the corpus is ~0.60, measured at all
    three scales) — so the surviving set is exactly the original table and
    the whole bucket→shuffle→verify→anti-join machinery is hash-checked.
    The production threshold (0.95, int8 transit) stays pinned by unit
    tests."""
    from airbyte_destination_ray.pipelines.dedup import dedup_embedding_cosine

    ds = _plant_copies(_embeddings(sf_dir), "vec_id", 10)
    out = dedup_embedding_cosine(
        ds, threshold=0.999999, num_planes=63, transit="float"
    )
    return out.map_batches(
        lambda b: b.select(["vec_id", "label"]),
        batch_format="pyarrow",
        batch_size=None,
    )


# -- similarity search ------------------------------------------------------


def _strip_score(ds):
    import pyarrow as pa

    def fn(b: pa.Table) -> pa.Table:
        return b.select(["query_id", "vec_id", "rank"]).rename_columns(
            ["query_id", "vec_id", "knn_rank"]
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _q_knn_brute_force(sf_dir: str):
    """Exact cosine top-10 of 4 query vectors against the corpus; ranks only
    (scores are fp-rounding-sensitive across engines, ranks are not)."""
    from airbyte_destination_ray.pipelines.similarity import knn_brute_force

    q, ids = _query_vectors(sf_dir)
    return _strip_score(knn_brute_force(_embeddings(sf_dir), q, ids, k=10))


def _q_knn_lsh(sf_dir: str):
    """Hyperplane-LSH ANN in exhaustive-probe configuration: every bucket is
    probed, so the full machinery (bucket assignment, per-bucket scoring,
    per-query reduce) is exercised AND the result is exact — hash-verified
    against the SQL oracle.  Partial-probe recall (the scale config) is
    pinned by unit tests (test_dedup.py::test_knn_lsh_finds_self etc.)."""
    from airbyte_destination_ray.pipelines.similarity import knn_lsh

    q, ids = _query_vectors(sf_dir)
    return _strip_score(
        knn_lsh(_embeddings(sf_dir), q, ids, k=10, num_planes=6, probes="all")
    )


def _q_knn_ivf(sf_dir: str):
    """IVF-Flat ANN with nprobe = n_centroids: the quantizer training, list
    routing and per-list scoring all run for real, and probing every list
    makes the result exact — hash-verified against the SQL oracle.  Partial
    nprobe recall@5 ≥ 0.8 is pinned by unit tests."""
    from airbyte_destination_ray.pipelines.similarity import knn_ivf

    q, ids = _query_vectors(sf_dir)
    return _strip_score(
        knn_ivf(_embeddings(sf_dir), q, ids, k=10, n_centroids=16, nprobe=16)
    )


# -- text analysis ----------------------------------------------------------


def _q_text_stats(sf_dir: str):
    from airbyte_destination_ray.pipelines.ops import text_stats

    return text_stats(_documents(sf_dir, columns=["doc_id", "text"]))


def _q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals (line count, distinct lines,
    duplicate-line fraction) — the boilerplate filter's inputs; counts are
    SQL-expressible so the whole operator is hash-checked."""
    from airbyte_destination_ray.pipelines.ops import repetition_stats

    return repetition_stats(_documents(sf_dir, columns=["doc_id", "text"]))


def _q_redact_pii(sf_dir: str):
    """PII scrub: emails/IPv4/phones → tokens + per-class counts; RE2
    patterns shared verbatim with the DuckDB regexp_replace oracle."""
    from airbyte_destination_ray.pipelines.ops import redact_pii_documents

    return redact_pii_documents(_documents(sf_dir, columns=["doc_id", "text"]))


def _q_annotate_documents(sf_dir: str):
    """Integer-subscore annotation over every document (no filtering):
    SQL-expressible count features + derived quality_pass/quality_class
    labels, hash-verified against the DuckDB oracle — the same
    integer-decomposition trick as quality_filter_documents.  The float
    scorer stays as ops.annotate_documents, pinned by unit tests."""
    from airbyte_destination_ray.pipelines.ops import annotate_documents_exact

    return annotate_documents_exact(
        _documents(sf_dir, columns=["doc_id", "text"])
    )


# -- relational / streaming-window (build-brief custom operators) -----------


def _orders(sf_dir: str):
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/orders.parquet")


def _q_orders_customer_join(sf_dir: str):
    """Broadcast hash join: orders ⋈ customer with the small side shipped
    once via ray.put and joined zero-copy in an actor pool — the big side
    never shuffles (SURVEY §2.4 lookup pattern generalized)."""
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.relational import broadcast_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    )
    return broadcast_join(
        _orders(sf_dir),
        cust,
        left_on="o_custkey",
        right_on="c_custkey",
        select=[
            "o_orderkey",
            "o_totalprice",
            "o_orderstatus",
            "c_name",
            "c_mktsegment",
        ],
    )


def _q_sales_by_nation(sf_dir: str):
    """Two-level broadcast rollup (orders ⋈ customer ⋈ nation → cents per
    nation): dimensions pre-joined driver-side, fact table pre-aggregated
    per batch so the exchange carries one row per (nation, batch)."""
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.relational import sales_by_nation

    return sales_by_nation(
        _orders(sf_dir),
        pq.read_table(f"{sf_dir}/customer.parquet"),
        pq.read_table(f"{sf_dir}/nation.parquet"),
    )


def _q_orders_lineitem_shuffle_join(sf_dir: str):
    """Big×big shuffle hash join (orders ⋈ lineitem): one hash exchange per
    side, per-partition Acero join — the shape for sides too large to
    broadcast."""
    from airbyte_destination_ray.pipelines.relational import shuffle_join
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return shuffle_join(
        _orders(sf_dir),
        read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        ),
        left_on="o_orderkey",
        right_on="l_orderkey",
        select=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        ],
    )


def _q_urgent_orders_bloom_join(sf_dir: str):
    """Shuffle join with bloom pre-filter: only ~1/5 of orders are URGENT,
    so the bloom of the (filtered) left keys prunes ~80% of lineitem rows
    BEFORE the right-side exchange — correctness-neutral (false positives
    are dropped by the exact per-partition join), hash-checked here."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import shuffle_join
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    def urgent(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(b.column("o_orderpriority"), "1-URGENT")
        ).select(["o_orderkey", "o_custkey"])

    left = _orders(sf_dir).map_batches(
        urgent, batch_format="pyarrow", batch_size=None
    )
    right = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    )
    return shuffle_join(
        left,
        right,
        left_on="o_orderkey",
        right_on="l_orderkey",
        prefilter="bloom",
        select=["o_orderkey", "o_custkey", "l_linenumber", "l_quantity"],
    )


def _q_orders_lineitem_left_join(sf_dir: str):
    """Left-outer big×big shuffle join: orders kept even when no lineitem
    survives the quantity filter (NULL-extended) — exercises the outer path
    of the same single-exchange join kernel."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import shuffle_join
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("l_quantity"), 45.0)),
        batch_format="pyarrow",
        batch_size=None,
    )
    return shuffle_join(
        _orders(sf_dir),
        li,
        left_on="o_orderkey",
        right_on="l_orderkey",
        select=["o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity"],
        join_type="left outer",
    )


def _q_asof_click_before_purchase(sf_dir: str):
    """As-of (point-in-time) join: each purchase attributed to the user's
    latest click at or before it — hash-partition once, per-group vectorized
    sort-merge (no global sort; custom operator tier (a))."""
    from airbyte_destination_ray.pipelines.relational import asof_conversion

    return asof_conversion(_events(sf_dir))


def _q_asof_click_within_1h(sf_dir: str):
    """As-of join with a TOLERANCE window (pandas merge_asof tolerance):
    clicks older than one hour are not credited — matches beyond the
    window null out in a post-pass, the join itself is unchanged."""
    from airbyte_destination_ray.pipelines.relational import asof_conversion

    return asof_conversion(_events(sf_dir), tolerance_us=3_600_000_000)


def _q_events_hourly_by_type(sf_dir: str):
    """Tumbling-window (hour) count per event type — streaming windowed
    aggregate with per-batch partials."""
    from airbyte_destination_ray.pipelines.relational import windowed_counts

    return windowed_counts(_events(sf_dir), unit="hour")


def _q_events_sliding_hourly(sf_dir: str):
    """Sliding-window counts (60-min window, 15-min slide): bucket-level
    pre-agg, expansion factor applies to aggregated rows only."""
    from airbyte_destination_ray.pipelines.relational import (
        sliding_window_counts,
    )

    return sliding_window_counts(
        _events(sf_dir), window_minutes=60.0, slide_minutes=15.0
    )


def _q_sessionize_events(sf_dir: str):
    """Session windows (30-min gap) per user: one keyed shuffle + vectorized
    diff/cumsum session assignment."""
    from airbyte_destination_ray.pipelines.relational import sessionize

    return sessionize(_events(sf_dir), gap_minutes=30.0)


def _q_events_running_sum(sf_dir: str):
    """Per-user running sum (cumulative window aggregate, integer cents)."""
    from airbyte_destination_ray.pipelines.relational import running_sum

    return running_sum(
        _events(sf_dir), key="user_id", ts_col="ts", seq="event_id",
        value_col="value",
    )


def _q_events_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT) per key at O(distinct pairs) shuffle cost
    (pair-dedup pre-reduce)."""
    from airbyte_destination_ray.pipelines.relational import distinct_count_by

    return distinct_count_by(
        _events(sf_dir), key="event_type", distinct_col="user_id"
    )


def _building_custkeys(sf_dir: str):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    return t.filter(pc.equal(t.column("c_mktsegment"), "BUILDING")).column(
        "c_custkey"
    ).to_numpy(zero_copy_only=False)


def _q_orders_semi_join(sf_dir: str):
    """Broadcast semi-join (EXISTS shape): orders whose customer is in the
    BUILDING segment — zero-shuffle membership filter."""
    from airbyte_destination_ray.pipelines.relational import semi_join

    return semi_join(
        _orders(sf_dir), _building_custkeys(sf_dir), on="o_custkey"
    )


def _q_orders_anti_join(sf_dir: str):
    """Broadcast anti-join (NOT IN / blocklist shape): orders whose customer
    is NOT in the BUILDING segment."""
    from airbyte_destination_ray.pipelines.relational import anti_join

    return anti_join(
        _orders(sf_dir), _building_custkeys(sf_dir), on="o_custkey"
    )


def _q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shape multi-aggregate with derived expressions over
    lineitem, exact integer-cents sums (order-independent)."""
    from airbyte_destination_ray.pipelines.relational import pricing_summary
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return pricing_summary(read_parquet_sized(f"{sf_dir}/lineitem.parquet"))


# -- aggregation ------------------------------------------------------------


def _q_multimodal_image_decode(sf_dir: str):
    """Actor-pool image decode over a deterministic synthetic media corpus
    of REAL P6/PPM images — width/height/mean-luma are actual pixel math
    (pure-numpy codec-free decoder; compressed formats stay stubbed behind
    NotImplementedError; see stages/multimodal.py)."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        decode_images,
        synthesize_media_table,
    )

    ds = ray.data.from_arrow(synthesize_media_table(256, real_format="ppm"))
    return decode_images(ds, concurrency=2, batch_size=32)


def _q_multimodal_image_stats_exact(sf_dir: str):
    """REAL P6/PPM pixel decode, hash-checked: the corpus dims and pixels
    are closed-form integer functions of media_id, so a DuckDB oracle
    recomputes the exact per-channel sums the decoder must produce —
    converting the image path from rows-only to value-hash-verified."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        image_channel_sums,
        synthesize_media_table_exact,
    )

    ds = ray.data.from_arrow(synthesize_media_table_exact(256))
    return image_channel_sums(ds, concurrency=2, batch_size=32)


def _q_multimodal_audio_features(sf_dir: str):
    """Actor-pool audio feature extraction over REAL PCM WAV payloads
    (RIFF parse + per-segment RMS in numpy)."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        extract_audio_features,
        synthesize_media_table,
    )

    ds = ray.data.from_arrow(
        synthesize_media_table(128, kind="audio", real_format="wav")
    )
    return extract_audio_features(ds, concurrency=2)


def _q_multimodal_audio_stats_exact(sf_dir: str):
    """REAL RIFF/PCM parse, hash-checked: closed-form sawtooth samples so a
    DuckDB oracle reproduces the exact integer sample sums the decoder must
    recover — value-hash coverage for the audio path."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        audio_sample_sums,
        synthesize_audio_table_exact,
    )

    ds = ray.data.from_arrow(synthesize_audio_table_exact(64))
    return audio_sample_sums(ds, concurrency=2, batch_size=16)


def _q_multimodal_video_stats_exact(sf_dir: str):
    """REAL y4m demux, hash-checked: closed-form frame bytes so a DuckDB
    oracle reproduces every frame's exact byte sum — pins frame count,
    offsets, and stride math of the demuxer."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        synthesize_video_table_exact,
        video_frame_byte_sums,
    )

    ds = ray.data.from_arrow(synthesize_video_table_exact(64))
    return video_frame_byte_sums(ds, concurrency=2, batch_size=16)


def _q_multimodal_video_frames(sf_dir: str):
    """Actor-pool video frame sampling (fan-out) over REAL YUV4MPEG2
    payloads — evenly-spaced true frames."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        sample_video_frames,
        synthesize_media_table,
    )

    ds = ray.data.from_arrow(
        synthesize_media_table(64, kind="video", real_format="y4m")
    )
    return sample_video_frames(ds, frames_per_video=4, concurrency=2)


def _q_lineage_events_cdc(sf_dir: str):
    """Per-epoch change-key accounting from commit manifests ONLY (A5 —
    record counting without a data scan): the merger records
    ``keys_changed`` (distinct keys in the epoch's change group,
    post-LWW-compact — deterministic: independent of batch composition
    and shuffle strategy) in every partition manifest; summed per epoch
    it must equal ``COUNT(DISTINCT user_id)`` of that epoch's binlog
    slice, which is exactly what the DuckDB oracle computes from the raw
    events table.  Hash-checks the manifest bookkeeping end to end."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.cdc import lineage_dataset
    from airbyte_destination_ray.pipelines.events_cdc import sync_events_table
    from airbyte_destination_ray.state.manifest import COMPACTION_EPOCH_BASE

    # pid-scoped scratch + dead-pid sweep (the incremental-dedup
    # convention): a lake synced by an OLDER build (manifests without
    # keys_changed) or a recycled pid must never be resumed into this
    # query, so THIS pid's dir is rebuilt unconditionally
    for stale in Path("/tmp/adr_query").glob("lineage-keys-*"):
        try:
            os.kill(int(stale.name.rsplit("-", 1)[1]), 0)
        except (ValueError, ProcessLookupError):
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            pass
    base = (
        Path("/tmp/adr_query")
        / f"lineage-keys-{Path(sf_dir).name}-{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    sync_events_table(sf_dir, workdir=base).count()  # ensure synced
    lin = pa.Table.from_pylist(
        lineage_dataset(str(base / "lake"), "events_cdc").take_all()
    )  # manifest metadata — aggregate-sized by definition
    lin = lin.filter(
        pc.and_(
            pc.less(lin.column("epoch"), COMPACTION_EPOCH_BASE),
            pc.greater_equal(lin.column("keys_changed"), 0),
        )
    )
    agg = (
        lin.group_by("epoch")
        .aggregate([("keys_changed", "sum")])
        .rename_columns(["epoch", "keys_changed"])
    )
    return agg.set_column(
        agg.schema.get_field_index("keys_changed"),
        "keys_changed",
        agg.column("keys_changed").cast(pa.int64()),
    )


def _q_lineage_epoch_totals(sf_dir: str):
    """Manifest-only per-epoch totals (A5): the manifest bookkeeping
    (row_count / max_seq / recency per partition) hash-checked against raw
    SQL over the events table — no data scan on the Ray side."""
    from airbyte_destination_ray.pipelines.events_cdc import lineage_epoch_totals

    return lineage_epoch_totals(sf_dir)


def _q_top_events_by_value(sf_dir: str):
    """Global top-50 events by value — per-batch local top-k + tiny final
    reduce, no global sort."""
    from airbyte_destination_ray.pipelines.ops import top_k_by

    return top_k_by(_events(sf_dir), by="value", k=50, tie_break="event_id")


def _q_extract_html_text(sf_dir: str):
    """HTML → text extraction round-trip (north-star invariant): synthesize
    an escaped full page per document (head noise, style/script blocks),
    then recover the body with the byte-level extractor.  Oracle = identity
    on (doc_id, text) — any extraction defect breaks the value hash."""
    from airbyte_destination_ray.pipelines.ops import extract_html_text

    return extract_html_text(_documents(sf_dir, columns=["doc_id", "text"]))


def _q_dedup_jaccard_exact(sf_dir: str):
    """EXACT word-5-gram Jaccard dedup via a distributed inverted index —
    the hash-checked anchor of the near-dup family (the LSH families
    approximate this same predicate).  The oracle recomputes pairwise
    Jaccard from scratch in SQL (unnest shingles → self-join → NOT IN)."""
    from airbyte_destination_ray.pipelines.dedup import dedup_jaccard_exact

    return dedup_jaccard_exact(
        _documents(sf_dir), shingle_k=5, threshold=0.8
    )


def _q_similar_doc_pairs(sf_dir: str):
    """All-pairs word-5-gram Jaccard similarity JOIN (AllPairs/PPJoin
    prefix filtering, exact integer verify — the auditing counterpart of
    dedup_jaccard_exact: which pairs, with exact inter/union sizes).
    Exact copies of every 25th doc are planted (+1,000,000 ids) so both
    planted J=1 pairs and natural near-dups must surface; the oracle
    recomputes pairwise shingle intersections from scratch in SQL with the
    same integer predicate 9·c ≥ 4·(na+nb)."""
    from airbyte_destination_ray.pipelines.linkage import (
        similarity_join_words,
    )

    ds = _plant_copies(
        _documents(sf_dir, columns=["doc_id", "text"]), "doc_id", 25
    )
    # 16 partitions at sf scale: the 5-exchange chain's per-group sort
    # overhead dominates at 64 (3.0 s -> 0.84 s at sf0.1, same result)
    return similarity_join_words(
        ds, threshold=0.8, shingle_k=5, num_partitions=16
    )


def _q_doc_dup_window_stats(sf_dir: str):
    """Cross-document duplicate-window profile (Lee et al. substring-dedup
    signal): per doc, distinct word-5-gram windows + how many occur in ≥2
    distinct docs + the duplicated fraction (single IEEE division).  Two
    hash exchanges, text never shuffled."""
    from airbyte_destination_ray.pipelines.corpus import dup_window_stats

    return dup_window_stats(
        _documents(sf_dir, columns=["doc_id", "text"]), window_k=5
    )


def _q_domain_stats(sf_dir: str):
    """Per-host web rollup: deterministic page URLs derived from events
    (the synth url scheme), parsed with the vectorized URL parser, grouped
    by host — pages = distinct URLs, events = rows.  The oracle rebuilds
    the same URLs in SQL and parses them independently with split_part /
    regexp_extract, cross-checking the RE2 parser."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.web import domain_stats
    from airbyte_destination_ray.sources.synth import urls_for_keys

    def add_url(batch: pa.Table) -> pa.Table:
        keys = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({"url": urls_for_keys(keys)})

    ds = _events(sf_dir).map_batches(
        add_url, batch_format="pyarrow", batch_size=None
    )
    return domain_stats(ds, num_partitions=8)


def _q_canonicalize_urls(sf_dir: str):
    """URL canonicalization (crawl-frontier / URL-dedup key): messy
    deterministic URLs (mixed case, default + explicit ports, empty paths,
    fragments, queries) canonicalized vectorized; the oracle rebuilds the
    same messy URL AND the expected canonical form independently in SQL,
    byte-for-byte."""
    import pyarrow as pa

    from airbyte_destination_ray.functions.urls import canonicalize_urls
    from airbyte_destination_ray.sources.synth import messy_urls_for_keys

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch.column("user_id").to_numpy(zero_copy_only=False)
        url = messy_urls_for_keys(keys)
        return pa.table({"url": url, "canonical_url": canonicalize_urls(url)})

    return _events(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def _q_cap_pages_per_host(sf_dir: str):
    """Per-host event cap (crawl-politeness / domain-balance stage): parse
    the host out of every page URL, keep at most 5 events per host by
    smallest event_id — URL parser composed with the per-key cap, no
    global sort."""
    import pyarrow as pa

    from airbyte_destination_ray.functions.urls import parse_urls
    from airbyte_destination_ray.pipelines.ops import grouped_top_k
    from airbyte_destination_ray.sources.synth import urls_for_keys

    def add_host(batch: pa.Table) -> pa.Table:
        keys = batch.column("user_id").to_numpy(zero_copy_only=False)
        url = urls_for_keys(keys)
        return pa.table(
            {
                "host": parse_urls(url)["host"],
                "url": url,
                "event_id": batch.column("event_id"),
            }
        )

    ds = _events(sf_dir).map_batches(
        add_host, batch_format="pyarrow", batch_size=None
    )
    return grouped_top_k(
        ds, key="host", by="event_id", k=5, tie_break="event_id",
        descending=False,
    )


def _q_quality_filter_documents(sf_dir: str):
    """C4/Gopher-style quality filter on INTEGER subscore ratios (word count
    in range, ≥60% alphabetic, ≤20% digits, ≥2% stopword density) — every
    predicate is integer arithmetic over SQL-expressible counts, so the
    filter is hash-verified against the DuckDB oracle (the scalar float
    score variant stays available as ops.quality_filter, pinned by unit
    tests)."""
    from airbyte_destination_ray.pipelines.ops import quality_filter_exact

    return quality_filter_exact(_documents(sf_dir))


def _q_events_value_quantiles(sf_dir: str):
    """Exact per-group quantiles (median/p90, SQL quantile_cont semantics);
    only (key, value) shuffles."""
    from airbyte_destination_ray.pipelines.ops import grouped_quantiles

    return grouped_quantiles(
        _events(sf_dir), key="event_type", value_col="value"
    )


def _q_events_quantiles_approx(sf_dir: str):
    """t-digest-style mergeable quantile sketch — the 100 TB approx path.
    The digest is exact-until-compression (DataSketches-style contract):
    with ``delta=4096`` the sf0.01 groups stay uncompressed, so the sketch
    pipeline (per-batch digests, pack/unpack, mergeable combine) runs for
    real AND the result hash-matches the exact SQL oracle; beyond ``delta``
    values per group the estimate degrades to ~1/delta accuracy, pinned vs
    the exact operator by unit tests."""
    from airbyte_destination_ray.pipelines.relational import (
        grouped_quantiles_approx,
    )

    return grouped_quantiles_approx(
        _events(sf_dir), key="event_type", value_col="value", delta=4096
    )


def _q_distinct_lang_source(sf_dir: str):
    """DISTINCT projection at O(distinct tuples) shuffle cost."""
    from airbyte_destination_ray.pipelines.ops import distinct_values

    return distinct_values(
        _documents(sf_dir, columns=["lang", "source"]),
        columns=["lang", "source"],
    )


def _q_sample_events_hash(sf_dir: str):
    """Deterministic hash-based Bernoulli sample (replay-stable, no RNG
    state, oracle = plain SQL arithmetic)."""
    from airbyte_destination_ray.pipelines.ops import hash_sample

    return hash_sample(_events(sf_dir), key="event_id", percent=10)


def _q_top3_events_per_user(sf_dir: str):
    """Per-key top-k without a global sort (per-batch per-key combiner)."""
    from airbyte_destination_ray.pipelines.ops import grouped_top_k

    return grouped_top_k(
        _events(sf_dir), key="user_id", by="value", k=3, tie_break="event_id"
    )


def _q_cap_docs_per_lang(sf_dir: str):
    """Per-key cap (data-balancing stage): at most 20 docs per language,
    kept by smallest doc_id — grouped_top_k in ascending mode, no global
    sort, ≤ k rows per (key, batch) on the exchange."""
    from airbyte_destination_ray.pipelines.ops import grouped_top_k

    return grouped_top_k(
        _documents(sf_dir),
        key="lang",
        by="doc_id",
        k=20,
        tie_break="doc_id",
        descending=False,
    )


def _q_weighted_mixture_sample(sf_dir: str):
    """Deterministic mixture reweighting: per-language keep percentages via
    the Knuth hash — replay-invariant, shuffle-free, plain-SQL oracle."""
    from airbyte_destination_ray.pipelines.ops import weighted_sample_by_key

    return weighted_sample_by_key(
        _documents(sf_dir),
        key="lang",
        id_col="doc_id",
        percents={"en": 80, "de": 50, "fr": 25},
        default_percent=10,
    )


def _q_events_value_histogram(sf_dir: str):
    """Fixed-width histogram via per-batch bin-count partials."""
    from airbyte_destination_ray.pipelines.ops import value_histogram

    return value_histogram(_events(sf_dir), col="value", bin_width=10.0)


def _q_events_distinct_users_approx(sf_dir: str):
    """Mergeable distinct sketch per key with sparse-exact mode (Theta/CPC
    contract): keys below the sparse threshold carry their sorted hash set
    and report the EXACT count — so the whole sketch pipeline (per-batch
    partials, pack, mergeable combine, estimate) is hash-checked against
    the exact SQL oracle at sf0.01; past the threshold it degrades to
    HyperLogLog registers (accuracy pinned vs the exact operator by unit
    tests)."""
    from airbyte_destination_ray.pipelines.relational import (
        distinct_count_approx,
    )

    return distinct_count_approx(
        _events(sf_dir), key="event_type", distinct_col="user_id"
    )


def _q_remove_boilerplate(sf_dir: str):
    """CCNet-style frequent-segment removal at word granularity (the synth
    documents are single-line, so ``sep=" "`` makes the segment = word):
    exact corpus-wide document frequency per segment, segments occurring in
    ≥390 of the docs are stripped, documents rebuilt byte-identically to
    the SQL ``string_agg`` reconstruction.  On a real crawl the same
    operator with ``sep="\\n"`` is the boilerplate-line filter."""
    from airbyte_destination_ray.pipelines.corpus import (
        remove_frequent_segments,
    )

    return remove_frequent_segments(
        _documents(sf_dir, columns=["doc_id", "text"]),
        sep=" ",
        min_df=390,
        num_partitions=8,
    )


def _q_dedup_segments_documents(sf_dir: str):
    """Corpus-wide first-occurrence segment dedup (CCNet paragraph dedup):
    each distinct segment survives only at its globally minimal
    ``(doc_id, position)``; documents rebuilt from survivors.  SQL
    ``row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) = 1``."""
    from airbyte_destination_ray.pipelines.corpus import dedup_segments_first

    return dedup_segments_first(
        _documents(sf_dir, columns=["doc_id", "text"]),
        sep=" ",
        num_partitions=8,
    )


def _q_chunk_documents(sf_dir: str):
    """Context-window chunking (1 → N row expansion): 120-char chunks with
    24-char overlap; oracle = SQL generate_series + substr."""
    from airbyte_destination_ray.pipelines.corpus import chunk_documents

    return chunk_documents(
        _documents(sf_dir, columns=["doc_id", "text"]),
        chunk_size=120,
        overlap=24,
    )


def _q_filter_docs_above_median(sf_dir: str):
    """Corpus-relative percentile cut: keep documents at or above the
    global median n_chars.  The q-digest threshold pass is exact-until-
    compression, so the result hash-matches SQL quantile_cont."""
    from airbyte_destination_ray.pipelines.ops import filter_above_quantile

    return filter_above_quantile(_documents(sf_dir), value_col="n_chars", q=0.5)


def _q_webtext_pipeline(sf_dir: str):
    """The composite training-data pipeline, three stages CHAINED as one
    lazy Dataset (stages pipeline through the streaming executor, nothing
    materializes between them): corpus-wide boilerplate removal →
    content dedup of the CLEANED text (all-boilerplate docs collapse to
    one empty doc, as in real crawl cleaning) → context-window chunking.
    Oracle = the same three stages as nested SQL CTEs."""
    from airbyte_destination_ray.pipelines.corpus import (
        chunk_documents,
        remove_frequent_segments,
    )
    from airbyte_destination_ray.pipelines.ops import dedup_exact

    cleaned = remove_frequent_segments(
        _documents(sf_dir, columns=["doc_id", "text"]),
        sep=" ",
        min_df=390,
        num_partitions=8,
    )
    deduped = dedup_exact(cleaned, on="text", keep_by="doc_id")
    return chunk_documents(deduped, chunk_size=120, overlap=24)


def _q_top_terms_documents(sf_dir: str):
    """Global top-k vocabulary (tokenizer-training profile): lowercase,
    regex-split, per-batch pre-aggregated counts, deterministic
    ``(n DESC, term ASC)`` boundary."""
    from airbyte_destination_ray.pipelines.corpus import top_terms

    return top_terms(
        _documents(sf_dir, columns=["text"]), k=10, num_partitions=8
    )


def _q_events_stats_by_type(sf_dir: str):
    from airbyte_destination_ray.pipelines.ops import grouped_stats

    return grouped_stats(_events(sf_dir), key="event_type", value_col="value")


def _q_events_daily_counts(sf_dir: str):
    from airbyte_destination_ray.pipelines.ops import daily_counts

    return daily_counts(_events(sf_dir))


def _q_users_click_purchase_full_join(sf_dir: str):
    """FULL OUTER join of two per-user aggregates (users who clicked vs
    users who purchased) — exercises the outer-both-sides path of
    ``shuffle_join`` (Acero coalesces the key, so right-only users surface
    their key in ``user_id`` like SQL COALESCE)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_count
    from airbyte_destination_ray.pipelines.relational import shuffle_join

    ev = _events(sf_dir)

    def of_type(t):
        return ev.map_batches(
            lambda b, t=t: b.filter(pc.equal(b.column("event_type"), t)),
            batch_format="pyarrow",
            batch_size=None,
        )

    clicks = grouped_count(of_type("click"), key="user_id", out_col="n_clicks")
    purchases = grouped_count(
        of_type("purchase"), key="user_id", out_col="n_purchases"
    )
    _uid = pa.int64()
    return shuffle_join(
        clicks,
        purchases,
        left_on="user_id",
        right_on="user_id",
        join_type="full outer",
        hot_keys=None,
        # both sides are grouped_count outputs: ds.schema() would execute
        # each count exchange a second time
        left_schema=pa.schema([("user_id", _uid), ("n_clicks", pa.int64())]),
        right_schema=pa.schema(
            [("user_id", _uid), ("n_purchases", pa.int64())]
        ),
    )


def _q_events_corr_value_hour(sf_dir: str):
    """Pearson corr(value, hour-of-day) per event type from exact integer
    partials — the grouped two-variable moment aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_corr

    def prep(b: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "_x": pc.cast(
                    pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
                ),
                "_y": pc.cast(pc.hour(b.column("ts")), pa.int64()),
            }
        )

    ds = _events(sf_dir).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    return grouped_corr(
        ds, key="event_type", x_col="_x", y_col="_y", out_col="corr_value_hour"
    )


def _q_events_user_gaps(sf_dir: str):
    """Per-user inter-arrival statistics — the LAG window pattern as one
    keyed shuffle + segmented diff."""
    from airbyte_destination_ray.pipelines.relational import inter_event_gaps

    return inter_event_gaps(
        _events(sf_dir), key="user_id", ts_col="ts", seq="event_id"
    )


def _q_events_rollup_type_day(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) counts — every prefix level in one
    aggregate-sized second exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import rollup_counts

    def prep(b: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_day": pc.cast(
                    pc.floor_temporal(b.column("ts"), unit="day"), pa.date32()
                ),
            }
        )

    ds = _events(sf_dir).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    return rollup_counts(ds, keys=["event_type", "event_day"])


def _q_events_pivot_daily(sf_dir: str):
    """Daily counts pivoted to one column per event type (the
    ``count(*) FILTER`` wide form) over a closed column list."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import pivot_counts

    def prep(b: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "event_day": pc.cast(
                    pc.floor_temporal(b.column("ts"), unit="day"), pa.date32()
                ),
                "event_type": b.column("event_type"),
            }
        )

    ds = _events(sf_dir).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    return pivot_counts(
        ds,
        row_key="event_day",
        col_key="event_type",
        col_values=["click", "error", "purchase", "signup", "view"],
    )


def _q_decontaminate_documents(sf_dir: str):
    """Benchmark decontamination: drop documents sharing any exact 5-token
    gram with the benchmark subset (doc_id % 97 == 0) — the GPT-3/Pile
    n-gram overlap filter as a broadcast-set per-batch scan."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.corpus import decontaminate

    def is_bench(b: "pa.Table") -> "pa.Table":
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 97 == 0))

    docs = _documents(sf_dir)
    bench = _documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        is_bench, batch_format="pyarrow", batch_size=None
    )
    return decontaminate(docs, bench, sep=" ", gram_k=5)


def _q_repeated_spans_documents(sf_dir: str):
    """Exact-substring duplicate spans (Lee et al. 2022): maximal token
    spans whose every 8-token window occurs ≥ 2× in the corpus — rolling
    window hashes, one hash exchange for corpus counts, one id exchange
    merging positions into spans."""
    from airbyte_destination_ray.pipelines.corpus import repeated_ngram_spans

    docs = _documents(sf_dir, columns=["doc_id", "text"])
    return repeated_ngram_spans(docs, sep=" ", gram_k=8)


def _q_trim_repeated_spans_documents(sf_dir: str):
    """Exact-substring DEDUP (Lee et al. 2022 released-tool policy): cut
    every occurrence of every duplicated ≥8-token span out of the corpus —
    spans + docs ride one id-co-locating exchange, difference-array token
    coverage, vectorized re-join."""
    from airbyte_destination_ray.pipelines.corpus import trim_repeated_spans

    docs = _documents(sf_dir, columns=["doc_id", "text"])
    return trim_repeated_spans(docs, sep=" ", gram_k=8)


def _q_budget_mixture_sample(sf_dir: str):
    """Token-budget mixture construction (Pile/Dolma-style source mixing):
    each source contributes documents in deterministic hash order until its
    char budget is exhausted — greedy prefix packing as a column-pruned
    keyed exchange + broadcast winner filter; the winner set is bounded by
    the budgets, never by corpus size."""
    from airbyte_destination_ray.pipelines.ops import budget_sample_by_key

    return budget_sample_by_key(
        _documents(sf_dir),
        key="source",
        id_col="doc_id",
        units_col="n_chars",
        budgets={"src0": 4000, "src1": 2500, "src2": 1500},
        default_budget=2000,
    )


def _q_events_quarantine(sf_dir: str):
    """Data-quality expectations with a quarantine lane: rows failing any
    rule land in the side table tagged with the FIRST failed rule (NULL
    comparisons fail closed — plain SQL CASE chain oracle); one
    shuffle-free vectorized pass."""
    from airbyte_destination_ray.pipelines.ops import validate_rows

    return validate_rows(
        _events(sf_dir),
        [
            ("user_not_null", "not_null", "user_id"),
            (
                "type_allowed",
                "in_set",
                "event_type",
                ["signup", "click", "view", "purchase"],
            ),
            ("value_range", "in_range", "value", 0.0, 300.0),
        ],
        emit="quarantine",
    )


def _q_events_global_rank(sf_dir: str):
    """Exact distributed ROW_NUMBER() over the whole table (ORDER BY value
    DESC, event_id) — range-histogram offsets + per-bin local sort; no
    single-node sort, the histogram exchange carries O(bins) ints."""
    from airbyte_destination_ray.pipelines.relational import global_rank

    return global_rank(
        _events(sf_dir, columns=["event_id", "value"]),
        by="value",
        tie_break="event_id",
        descending=True,
        bin_width=1.0,
    )


def _q_wap_rebuild_cdc(sf_dir: str):
    """Write-audit-publish: rebuild the CDC table in a staged generation
    (readers pinned to the published one), audit, then one atomic metadata
    flip — final read view equals the plain full-sync LWW state."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        wap_rebuild_events_table,
    )

    return wap_rebuild_events_table(sf_dir)


def _q_copartitioned_join_cdc(sf_dir: str):
    """Zero-exchange bucket join (SMB / Iceberg-bucket-join shape): two
    lake tables under the same key-hash layout join per-partition — the
    lake layout IS the exchange; O(P) tasks at any table size."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        copartitioned_join_events,
    )

    return copartitioned_join_events(sf_dir)


def _q_cdc_expectations_quarantine(sf_dir: str):
    """Expectations-gated CDC sync: rule-failing upserts are excluded from
    the merge and committed to the co-partitioned quarantine append table
    (payload + first failed rule), exactly-once on both lanes."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        quarantine_events_table,
    )

    return quarantine_events_table(sf_dir)


def _q_large_volume_orders(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q18_large_volume_orders

    return q18_large_volume_orders(sf_dir)


def _q_winsorize_event_values(sf_dir: str):
    """Outlier clamping at EXACT global p01/p99 (winsorization): bounds
    found by iterative histogram selection (O(1) driver memory, a few
    column-pruned passes), then one shuffle-free clip pass."""
    from airbyte_destination_ray.pipelines.ops import winsorize

    return winsorize(
        _events(sf_dir, columns=["event_id", "value"]),
        value_col="value",
        q_lo=0.01,
        q_hi=0.99,
        out_col="value_w",
    )


def _q_corpus_mixture_stats(sf_dir: str):
    """Per-(source, lang) corpus mixture report with char share — exact
    int partials, one IEEE division per row (hash-identical to SQL)."""
    from airbyte_destination_ray.pipelines.ops import mixture_stats

    return mixture_stats(
        _documents(sf_dir, columns=["source", "lang", "n_chars"]),
        keys=["source", "lang"],
        units_col="n_chars",
    )


def _q_throttle_events(sf_dir: str):
    """Debounce filter: drop events arriving < 5 min after the same user's
    previous event (LAG form) — one key-hash exchange of (seq, key, ts)
    only, vectorized diff kernel."""
    from airbyte_destination_ray.pipelines.relational import throttle_by_key

    return throttle_by_key(
        _events(sf_dir, columns=["event_id", "user_id", "ts"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        min_gap_minutes=5.0,
    )


def _q_doc_oov_fraction(sf_dir: str):
    """Integer-exact perplexity stand-in: fraction of each doc's bigrams
    outside the corpus top-1000 bigram set — broadcast gram set, one
    shuffle-free bincount pass, single IEEE division per doc."""
    from airbyte_destination_ray.pipelines.corpus import doc_oov_fraction

    return doc_oov_fraction(
        _documents(sf_dir, columns=["doc_id", "text"]), top_k=1000
    )


def _q_embedding_covariance(sf_dir: str):
    """Distributed fixed-point covariance of the embedding matrix: exact
    integer power sums (one d×d int matmul per batch, aggregate-sized
    partials, zero shuffle) + one fixed IEEE sequence for the cov value."""
    from airbyte_destination_ray.pipelines.similarity import (
        embedding_covariance,
    )

    return embedding_covariance(
        _embeddings(sf_dir), col="embedding", scale=10_000
    )


def _q_consistent_snapshot_cdc(sf_dir: str):
    """Cross-table snapshot isolation: the fully-synced table read AS OF
    the highest epoch its lagging sibling also committed (time-travel
    pinning, no data copies)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        consistent_snapshot_events,
    )

    return consistent_snapshot_events(sf_dir)


def _q_events_trend_by_type(sf_dir: str):
    """Per-type OLS value trend over hour indices — exact integer power
    sums on the exchange, one fixed IEEE finish per key (bit-equal to the
    spelled-out SQL)."""
    import numpy as np
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.ops import grouped_trend

    anchor_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC

    def prep(b: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        # drop null ts/value BEFORE the numpy conversion: a nullable float
        # reaches numpy as NaN and floor(NaN).astype(int64) is undefined-
        # behavior garbage that would contaminate the power sums
        b = b.filter(
            pc.and_(b.column("ts").is_valid(), b.column("value").is_valid())
        )
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "x": pa.array((ts - anchor_us) // 3_600_000_000),
                "y": pa.array(np.floor(v * 100).astype(np.int64)),
            }
        )

    return grouped_trend(
        _events(sf_dir, columns=["event_type", "ts", "value"]).map_batches(
            prep, batch_format="pyarrow", batch_size=None
        ),
        key="event_type",
        x_col="x",
        y_col="y",
    )


def _q_returned_item_top_customers(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q10_returned_item_customers

    return q10_returned_item_customers(sf_dir)


def _q_median_gap_by_user(sf_dir: str):
    """Distribution over a WINDOW-DERIVED column: per-user inter-arrival
    gaps as rows (LAG diff), then exact per-key median (quantile_cont) —
    two keyed exchanges, payloads never move."""
    from airbyte_destination_ray.pipelines.ops import grouped_quantiles
    from airbyte_destination_ray.pipelines.relational import gap_rows

    gaps = gap_rows(
        _events(sf_dir, columns=["event_id", "user_id", "ts"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
    )
    return grouped_quantiles(
        gaps, key="user_id", value_col="gap_us", quantiles=(0.5,)
    )


def _q_stratified_sample_docs(sf_dir: str):
    """Stratified fixed-N sample: exactly ≤10 docs per language, chosen in
    deterministic Knuth-hash order (a seeded random sample that is replay-
    and parallelism-invariant) — grouped_top_k over the hash, ≤ N rows per
    (stratum, batch) on the exchange, no global sort."""
    import numpy as np
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.ops import grouped_top_k

    def add_hash(b: "pa.Table") -> "pa.Table":
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        h = (ids * 2654435761) % 4_294_967_296
        return b.append_column("_h", pa.array(h, type=pa.int64()))

    sampled = grouped_top_k(
        _documents(sf_dir).map_batches(
            add_hash, batch_format="pyarrow", batch_size=None
        ),
        key="lang",
        by="_h",
        k=10,
        tie_break="doc_id",
        descending=False,
    )

    def drop_h(b: "pa.Table") -> "pa.Table":
        return b.drop_columns(["_h"])

    return sampled.map_batches(drop_h, batch_format="pyarrow", batch_size=None)


def _interaction_edges_150(b):
    """Deterministic DENSE interaction graph (150 nodes) shared by the
    triangle and clustering-coefficient queries — the formula is
    load-bearing for both oracles, so it lives in exactly one place."""
    import numpy as np
    import pyarrow as pa

    t = pa.table(
        {"user_id": b.column("user_id"), "event_id": b.column("event_id")}
    )
    t = t.filter(t.column("user_id").combine_chunks().is_valid())
    un = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    en = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "src": pa.array(un % 150, type=pa.int64()),
            "dst": pa.array((un + en % 17) % 150, type=pa.int64()),
        }
    )


def _q_events_triangles(sf_dir: str):
    """Per-node triangle counts over a deterministic interaction graph —
    degree-oriented wedge enumeration (O(m^1.5) wedges regardless of
    skew), canonical edge set materialized once, exact vs the 3-way
    self-join oracle."""
    from airbyte_destination_ray.pipelines.graph import triangle_counts

    return triangle_counts(
        _events(sf_dir).map_batches(
            _interaction_edges_150, batch_format="pyarrow", batch_size=None
        )
    )


def _q_events_clustering_coef(sf_dir: str):
    """Local clustering coefficient per node (2T / d(d−1)) — composes the
    triangle counter with the shared degree kernel through one unique-key
    left join; single fixed-IEEE division per node."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.graph import (
        _canonical_edges,
        _degree_counts,
        triangle_counts,
    )
    from airbyte_destination_ray.pipelines.relational import shuffle_join

    edges_ds = _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
        _interaction_edges_150, batch_format="pyarrow", batch_size=None
    )
    deg = _degree_counts(
        _canonical_edges(
            edges_ds, src="src", dst="dst", num_partitions=32, blocks=8
        ),
        num_partitions=32,
    )
    tri = triangle_counts(
        _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
            _interaction_edges_150, batch_format="pyarrow", batch_size=None
        )
    )
    joined = shuffle_join(
        deg,
        tri,
        left_on="node",
        right_on="node",
        join_type="left outer",
        select=["node", "n", "n_triangles"],
        hot_keys=None,
        left_schema=pa.schema([("node", pa.int64()), ("n", pa.int64())]),
        right_schema=pa.schema(
            [("node", pa.int64()), ("n_triangles", pa.int64())]
        ),
    )

    def coef(b: "pa.Table") -> "pa.Table":
        d = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        t = (
            pc.fill_null(b.column("n_triangles"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            c = (2 * t).astype(np.float64) / (d * (d - 1)).astype(np.float64)
        ok = d >= 2
        return pa.table(
            {
                "node": b.column("node"),
                "degree": pa.array(d, type=pa.int64()),
                "n_triangles": pa.array(t, type=pa.int64()),
                "clustering": pa.array(c, type=pa.float64(), mask=~ok),
            }
        )

    return joined.map_batches(coef, batch_format="pyarrow", batch_size=None)


def _q_shipping_priority(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q3_shipping_priority

    return q3_shipping_priority(sf_dir)


def _q_events_cube_type_day(sf_dir: str):
    """GROUP BY CUBE(event_type, day) counts — all four grouping sets via
    the shared aggregate-sized second exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import cube_counts

    def prep(b: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "event_day": pc.cast(
                    pc.floor_temporal(b.column("ts"), unit="day"), pa.date32()
                ),
            }
        )

    ds = _events(sf_dir).map_batches(
        prep, batch_format="pyarrow", batch_size=None
    )
    return cube_counts(ds, keys=["event_type", "event_day"])


def _q_events_props_stats(sf_dir: str):
    """Vectorized JSON field extraction (props.k via RE2, no per-row
    Python) + per-type integer stats with SQL null semantics."""
    from airbyte_destination_ray.pipelines.ops import (
        extract_json_int,
        grouped_int_stats,
    )

    ds = extract_json_int(
        _events(sf_dir), col="props", key="k", out_col="_k"
    )
    return grouped_int_stats(ds, key="event_type", value_col="_k")


def _q_late_ship_orders_except_finished(sf_dir: str):
    """Distributed EXCEPT over distinct key sets from two different
    tables (orders with a line shipped after 2000-01-01, minus orders
    already in status F) — both sides too large to broadcast."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import distinct_set_op
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    cutoff = dt.datetime(2000, 1, 1)
    shipped = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "orderkey": b.filter(
                    pc.greater(b.column("l_shipdate"), cutoff)
                ).column("l_orderkey")
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    finished = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda b: pa.table(
            {
                "orderkey": b.filter(
                    pc.equal(b.column("o_orderstatus"), "F")
                ).column("o_orderkey")
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return distinct_set_op(shipped, finished, on="orderkey", op="except")


def _q_users_clicked_and_purchased(sf_dir: str):
    """Distributed INTERSECT over distinct user sets."""
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import distinct_set_op

    ev = _events(sf_dir)

    def of_type(t):
        return ev.map_batches(
            lambda b, t=t: b.filter(pc.equal(b.column("event_type"), t)),
            batch_format="pyarrow",
            batch_size=None,
        )

    return distinct_set_op(
        of_type("click"), of_type("purchase"), on="user_id", op="intersect"
    )


def _q_top2_days_dense_rank(sf_dir: str):
    """dense_rank window filter: per event type, keep the days whose count
    is among the top-2 DISTINCT counts (ties all survive — the semantics
    row_number/top-k cannot express)."""
    from airbyte_destination_ray.pipelines.relational import (
        dense_rank_filter,
        windowed_counts,
    )

    daily = windowed_counts(_events(sf_dir), unit="day")
    return dense_rank_filter(
        daily, key="event_type", order_col="n_events", k=2
    )


def _cluster_centroids_int():
    """Seeded integer centroid matrix shared verbatim by the Ray query and
    the generated SQL literal (8 clusters × 64 dims, int in [-128, 127])."""
    import numpy as np

    rng = np.random.default_rng(7)
    return rng.integers(-128, 128, size=(8, 64)).astype(np.int64)


def _q_embeddings_cluster_assign(sf_dir: str):
    """Cluster assignment against fixed integer centroids with quantized
    embeddings — exact int64 dot products, so the argmax (and the dot
    itself) is SQL-oracle comparable."""
    from airbyte_destination_ray.pipelines.similarity import cluster_assign
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return cluster_assign(
        ds, _cluster_centroids_int(), quantize_scale=64.0
    )


def _q_embeddings_kmeans_sizes(sf_dir: str):
    """Corpus clustering profile via FIXED-POINT integer Lloyd k-means
    (quantized embeddings, smallest-id seeds, argmin-int-distance assign,
    floor-division centroid update) — every step is exact int64 under
    deterministic tie rules, so the unrolled-CTE SQL oracle reproduces
    the per-cluster sizes bit-for-bit (the PageRank fixed-point trick
    applied to clustering).  The float sample-trained variant stays as
    similarity.kmeans_cluster_sizes, pinned by unit tests."""
    from airbyte_destination_ray.pipelines.similarity import (
        kmeans_sizes_exact,
    )
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_sizes_exact(ds, n_clusters=8, iters=2)


def _q_events_moving_sum(sf_dir: str):
    """Per-user 5-row moving window sum/count (ROWS BETWEEN 4 PRECEDING AND
    CURRENT ROW over (ts, event_id)) — one keyed shuffle + segmented
    prefix-sum kernel, exact integer cents."""
    from airbyte_destination_ray.pipelines.relational import moving_window_sum
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return moving_window_sum(
        ds,
        key="user_id",
        ts_col="ts",
        seq="event_id",
        value_col="value",
        window_rows=5,
    )


def _q_doc_near_dup_components(sf_dir: str):
    """Near-duplicate clustering: exact-Jaccard pair graph (J ≥ 0.8 on word
    5-grams) → distributed connected components (min-label propagation) —
    every doc labeled with the min doc_id of its duplicate cluster.  The
    SQL oracle recomputes the pair graph from scratch and closes it with a
    recursive CTE."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.dedup import jaccard_pairs
    from airbyte_destination_ray.pipelines.graph import connected_components
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = jaccard_pairs(docs, threshold=0.8, shingle_k=5)
    comp = connected_components(
        pairs, src="ia", dst="ib", nodes_ds=docs, node_col="doc_id"
    )
    return comp.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("node"), "component": b.column("comp")}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def _q_semdedup_embeddings(sf_dir: str):
    """SemDeDup: quantized cluster assignment against the fixed integer
    centroids, then exact-integer within-cluster cosine dedup at
    cos ≥ 0.45 (cos² = 2025/10000 — demo threshold for this corpus;
    production uses ~0.95).  Fully SQL-reproducible."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.similarity import semdedup
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    out = semdedup(
        ds,
        _cluster_centroids_int(),
        quantize_scale=64.0,
        cos2_num=2025,
        cos2_den=10000,
    )
    return out.map_batches(
        lambda b: b.select(["vec_id", "label"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def _q_events_value_zscore(sf_dir: str):
    """Whole-corpus z-score of event value: exact integer moment partials,
    one fixed IEEE expression for mean/std, streaming second pass."""
    from airbyte_destination_ray.pipelines.ops import standardize_column
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    return standardize_column(ds, value_col="value", keep_cols=("event_id",))


_CAMPAIGNS = [
    # (campaign_id, start day, end day) — overlapping, nested, and one
    # empty window; shared verbatim by the Ray query and the SQL literal
    (0, "2024-01-02", "2024-01-09"),
    (1, "2024-01-05", "2024-01-12"),
    (2, "2024-01-10", "2024-01-20"),
    (3, "2024-01-15", "2024-01-16"),
    (4, "2024-01-25", "2024-02-05"),
    (5, "2024-03-01", "2024-03-05"),
]


def _q_campaign_event_stats(sf_dir: str):
    """Broadcast interval (range) join + per-campaign value rollup: events
    are tagged with every overlapping campaign window (1→N), value goes to
    integer cents per batch, and grouped_int_stats reduces with SQL null
    semantics — the windows ride ray.put once, the fact table streams."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_int_stats
    from airbyte_destination_ray.pipelines.relational import interval_join
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    iv = pa.table(
        {
            "campaign_id": pa.array([c[0] for c in _CAMPAIGNS], type=pa.int64()),
            "start_ts": pa.array(
                [dt.datetime.fromisoformat(c[1]) for c in _CAMPAIGNS],
                type=pa.timestamp("us"),
            ),
            "end_ts": pa.array(
                [dt.datetime.fromisoformat(c[2]) for c in _CAMPAIGNS],
                type=pa.timestamp("us"),
            ),
        }
    )
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )
    tagged = interval_join(
        ds, iv, ts_col="ts", id_col="campaign_id", select=["value"]
    ).map_batches(
        lambda b: pa.table(
            {
                "campaign_id": b.column("campaign_id"),
                "_cents": pc.cast(
                    pc.floor(pc.multiply(b.column("value"), 100.0)),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return grouped_int_stats(tagged, key="campaign_id", value_col="_cents")


def _q_local_supplier_volume(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q5_local_supplier_volume

    return q5_local_supplier_volume(sf_dir)


def _q_scd2_user_history(sf_dir: str):
    """SCD Type-2 history of the user dimension from the event change
    stream: one row per version with (valid_from, valid_to, is_current);
    'error' events are tombstones — they close the previous version's
    interval but emit no row."""
    from airbyte_destination_ray.pipelines.relational import scd2_history

    return scd2_history(
        _events(sf_dir),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        attr_cols=["value"],
        delete_when=("event_type", "error"),
    )


def _q_users_snapshot_diff(sf_dir: str):
    """CDC changelog derivation: diff yesterday's snapshot (LWW state over
    even event_ids) against today's (LWW over all events) — emits I/U/D
    rows with old/new values, the backfill path when a source can't emit a
    binlog.  Both snapshots and the diff are one streaming composition."""
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import lww_latest
    from airbyte_destination_ray.pipelines.relational import table_diff

    def even_only(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b.column("event_id"), 1), 0)
        )

    old_snap = lww_latest(
        _events(sf_dir).map_batches(
            even_only, batch_format="pyarrow", batch_size=None
        ),
        pk="user_id",
        ver="ts",
        seq="event_id",
    )
    new_snap = lww_latest(
        _events(sf_dir), pk="user_id", ver="ts", seq="event_id"
    )
    return table_diff(
        old_snap, new_snap, key="user_id", compare_cols=["value"]
    )


def _q_normalize_text(sf_dir: str):
    """Case/whitespace canonicalization (the fingerprint pre-pass) as a
    per-batch Arrow-kernel stage: lowercase, collapse whitespace runs,
    trim.  Purely streaming, no shuffle."""
    import pyarrow as pa

    from airbyte_destination_ray.functions.text import normalize_text

    def norm(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "norm_text": normalize_text(
                    b.column("text").combine_chunks()
                ),
            }
        )

    return _documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", batch_size=None
    )


def _q_fuzzy_vocab_pairs(sf_dir: str):
    """Spelling-variant mining: all distinct word pairs of the corpus
    vocabulary within Levenshtein distance 2, via COMPLETE
    deletion-neighborhood blocking + a vectorized exact-DP verify (an
    all-pairs join never happens)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.linkage import fuzzy_pairs

    def words(b: pa.Table) -> pa.Table:
        t = b.column("text")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        split = pc.split_pattern(t.drop_null(), " ")
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        return pa.table({"w": flat})

    ds = _documents(sf_dir, columns=["text"]).map_batches(
        words, batch_format="pyarrow", batch_size=None
    )
    return fuzzy_pairs(ds, word_col="w", max_dist=2, num_partitions=16)


def _q_events_late_arrivals(sf_dir: str):
    """Streaming watermark accounting: replay events in a deterministic
    scrambled arrival order (Knuth multiplicative bijection of event_id —
    reproducible in SQL), watermark = running max event time − 1 h; count
    on-time vs late rows per hourly window.  The global running max is the
    two-phase distributed prefix (range partials → driver prefix of
    ~n/span scalars → seeded per-range accumulate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import (
        windowed_counts_late,
    )

    def arrival(b: pa.Table) -> pa.Table:
        a = pc.bit_wise_and(
            pc.multiply(b.column("event_id"), 2654435761),
            4294967295,
        )
        return pa.table(
            {"arrival": a, "ts": b.column("ts")}
        )

    ds = _events(sf_dir).map_batches(
        arrival, batch_format="pyarrow", batch_size=None
    )
    return windowed_counts_late(
        ds,
        ts_col="ts",
        seq="arrival",
        window="hour",
        lateness_us=3_600_000_000,
        span=1 << 22,
    )


def _q_multimodal_phash_dedup(sf_dir: str):
    """Perceptual-hash near-dup image removal: actor-pool pHash (real PPM
    decode → luma → area resize → DCT) → banded Hamming buckets →
    exact popcount verify → keep-first.  Oracle = the planted ground
    truth: the seeded noise corpus plants a +1-red perturbed copy at a
    closed-form id pattern, and the exact surviving set (copies dropped,
    every distinct noise image kept) is hash-checked — any pHash false
    positive or negative breaks the value hash."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        dedup_phash_images,
        synthesize_noise_media_table,
    )

    ds = ray.data.from_arrow(synthesize_noise_media_table(180))
    out = dedup_phash_images(ds, max_hamming=3, concurrency=2)
    return out.map_batches(
        lambda b: b.select(["media_id", "mime"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def _q_bucket_docs_quartiles(sf_dir: str):
    """Equal-frequency binning: label every document with its corpus-
    relative length quartile (two streaming passes, zero shuffle; exact-
    until-compression thresholds so SQL quantile_cont reproduces them)."""
    from airbyte_destination_ray.pipelines.ops import bucket_by_quantiles

    return bucket_by_quantiles(
        _documents(sf_dir, columns=["doc_id", "n_chars"]),
        value_col="n_chars",
    )


def _q_events_user_zscore(sf_dir: str):
    """Per-user z-score of event value: one keyed exchange; the hash
    partition co-locates each user, so segmented exact-integer moments ARE
    the global per-user moments — no second pass."""
    from airbyte_destination_ray.pipelines.ops import standardize_by_key

    return standardize_by_key(
        _events(sf_dir), key="user_id", seq="event_id", value_col="value"
    )


def _q_events_funnel(sf_dir: str):
    """Ordered funnel (view → click → purchase, strictly-after,
    greedy-earliest): one key exchange carrying only funnel events; the
    kernel loops over funnel LEVELS, not rows."""
    from airbyte_destination_ray.pipelines.relational import funnel_counts

    return funnel_counts(
        _events(sf_dir),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        step_col="event_type",
        steps=["view", "click", "purchase"],
    )


def _q_events_cohort_retention(sf_dir: str):
    """Cohort retention matrix (first-active-day cohorts × day offsets):
    per-batch distinct (user, day) pre-reduce, one key exchange, then an
    aggregate-sized (cohort, offset) exchange."""
    from airbyte_destination_ray.pipelines.relational import (
        cohort_retention,
    )

    return cohort_retention(_events(sf_dir), key="user_id", ts_col="ts")


def _q_inverted_index_lookup(sf_dir: str):
    """Materialized inverted text index: build term → posting buckets as
    partitioned Parquet (one pass, pairs-only exchange), then point-read
    ONLY the buckets two probe terms hash to — the retrieval analog of the
    lake's hash-partition lookup."""
    import os
    import shutil

    import ray.data

    from airbyte_destination_ray.pipelines.corpus import (
        build_inverted_index,
        lookup_postings,
    )
    from pathlib import Path

    idx = f"/tmp/adr_query/invidx-{Path(sf_dir).name}-{os.getpid()}"
    shutil.rmtree(idx, ignore_errors=True)
    build_inverted_index(
        _documents(sf_dir, columns=["doc_id", "text"]), idx, num_buckets=16
    )
    return lookup_postings(idx, ["hash", "spark"], num_buckets=16)


def _q_cdc_schema_evolution(sf_dir: str):
    """North-rule schema evolution END-TO-END through the gate: sync epoch
    0 under schema v0, then rename value→amount (by column id) and add a
    nullable score, then sync epoch 1 whose segments still carry v0 —
    envelopes are aligned in-flight by the registry and v0 snapshots are
    upgraded at read.  The oracle is plain SQL over the raw events with
    the rename spelled out and the new column null."""
    import os
    import shutil
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.cdc import read_table, run_cdc_sync
    from airbyte_destination_ray.pipelines.events_cdc import (
        EVENT_PAYLOAD,
        build_binlog_from_events,
    )
    from airbyte_destination_ray.state.registry import SchemaStore

    base = Path(f"/tmp/adr_query/evo-{Path(sf_dir).name}-{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    binlog, lake = base / "binlog", str(base / "lake")
    build_binlog_from_events(f"{sf_dir}/events.parquet", binlog, n_epochs=2)
    run_cdc_sync(
        lake,
        str(binlog),
        table="events_cdc",
        pk="user_id",
        ver="ts",
        payload_columns=EVENT_PAYLOAD,
        num_partitions=8,
        epochs=[0],
        compute_digest=False,
    )
    ev_schema = pq.read_schema(f"{sf_dir}/events.parquet")
    v0 = pa.schema([ev_schema.field(n) for n in EVENT_PAYLOAD])
    store = SchemaStore(lake, "events_cdc")
    store.init(v0)
    store.rename_column("value", "amount")
    store.add_column("score", pa.float64())
    run_cdc_sync(
        lake,
        str(binlog),
        table="events_cdc",
        pk="user_id",
        ver="ts",
        payload_columns=[
            "event_id", "ts", "user_id", "event_type", "amount", "props",
        ],
        num_partitions=8,
        epochs=[1],
        epoch_schema_versions={1: 0},
        compute_digest=False,
    )
    return read_table(lake, "events_cdc")


def _q_backfill_roundtrip_cdc(sf_dir: str):
    """upsert ∘ diff = identity: seed the lake from half the stream,
    derive the changelog by diffing the lake against the full-stream LWW
    snapshot, apply it through the ordinary CDC sync — the resulting lake
    is byte-equal to the plain full-stream LWW (the oracle)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        backfill_events_roundtrip,
    )

    return backfill_events_roundtrip(sf_dir)


def _q_exact_median_event_value(sf_dir: str):
    """EXACT discrete median of event value by iterative histogram
    selection — an actual element, O(1) driver memory at any corpus size
    (the exact sibling of the one-pass q-digest percentile path)."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.ops import exact_quantile_disc

    v = exact_quantile_disc(_events(sf_dir), value_col="value", q=0.5)
    return pa.table({"median_value": pa.array([v], type=pa.float64())})


def _q_events_mode_by_user(sf_dir: str):
    """Most frequent event_type per user (deterministic tie-break):
    pair-count pre-reduce, one key exchange, vectorized arg-max."""
    from airbyte_destination_ray.pipelines.ops import mode_by_key

    return mode_by_key(
        _events(sf_dir), key="user_id", value_col="event_type"
    )


def _q_events_percent_rank(sf_dir: str):
    """percent_rank() per user over event value — the rank-normalized
    feature column; one keyed exchange, segmented tie-aware ranks."""
    from airbyte_destination_ray.pipelines.relational import (
        percent_rank_by_key,
    )

    return percent_rank_by_key(
        _events(sf_dir), key="user_id", value_col="value", seq="event_id"
    )


def _q_multimodal_audio_dedup(sf_dir: str):
    """Spectral-fingerprint audio near-dup (the audio sibling of the pHash
    family): real PCM decode → framed FFT band-energy delta bits →
    banded Hamming dedup.  Oracle = the planted ground truth: the seeded
    corpus plants a gain-perturbed copy after every 4th clip, and the
    exact surviving set (copies dropped, every distinct clip kept) is
    hash-checked — any fingerprint false positive/negative breaks it."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        dedup_audio_fingerprint,
        encode_wav,
    )

    rate = 8000
    t_ax = np.arange(rate)
    payloads, ids = [], []
    i = 0
    rng = np.random.default_rng(99)
    for base in range(60):
        f1, f2 = 100 + 37 * base, 300 + 53 * base
        # seeded broadband dither: noise-free pure tones have ~zero band
        # deltas whose SIGNS flip under any perturbation — real audio
        # (what the fingerprint is for) always has spectral floor
        sig = (
            np.sin(2 * np.pi * f1 * t_ax / rate)
            + 0.5 * np.sin(2 * np.pi * f2 * t_ax / rate)
            + 0.02 * rng.standard_normal(len(t_ax))
        )
        clip = (sig * 12000).astype(np.int16)
        payloads.append(encode_wav(clip, rate))
        ids.append(i)
        i += 1
        if base % 4 == 0:  # plant a gain-perturbed copy
            pert = (clip.astype(np.float64) * 1.004).astype(np.int16)
            payloads.append(encode_wav(pert, rate))
            ids.append(i)
            i += 1
    tbl = pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["audio"] * len(ids)),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(["audio/wav"] * len(ids)),
        }
    )
    out = dedup_audio_fingerprint(
        ray.data.from_arrow(tbl), max_hamming=3, concurrency=2
    )
    return out.map_batches(
        lambda b: b.select(["media_id", "mime"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def _q_events_mad_by_type(sf_dir: str):
    """Exact per-key median absolute deviation (robust spread): one keyed
    exchange, segmented double-median kernel."""
    from airbyte_destination_ray.pipelines.ops import grouped_mad

    return grouped_mad(_events(sf_dir), key="event_type", value_col="value")


def _q_lookup_users_cdc(sf_dir: str):
    """CDC point lookup: after the binlog sync, fetch 12 user_ids by
    reading ONLY the partition directories they hash to (O(keys) I/O at
    any lake size — the hash layout as an index); tombstoned ('error')
    and unknown users return nothing."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        lookup_events_table,
    )

    return lookup_events_table(
        sf_dir, [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 99999999]
    )


def _q_frequent_users_exact(sf_dir: str):
    """EXACT heavy hitters (> 1/120 of all events) via the bounded-memory
    two-pass design: Misra–Gries candidate superset (k=64, far below the
    user cardinality at scale) + exact verification count of candidates
    only."""
    from airbyte_destination_ray.pipelines.ops import heavy_hitters

    return heavy_hitters(
        _events(sf_dir), col="user_id", phi_num=1, phi_den=120
    )


def _q_cdc_partial_updates(sf_dir: str):
    """Column-level LWW merge of PARTIAL-update (patch) events: each event
    sets only the columns it carries (null = unchanged) — value patches on
    event_id % 4 != 0, event_type patches on even event_id — and the
    merged row per user takes each column's latest non-null value
    independently, plus the overall latest (ts, event_id)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import lww_partial_merge

    def to_patches(b: pa.Table) -> pa.Table:
        eid = b.column("event_id")
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "event_id": eid,
                "value": pc.if_else(
                    pc.not_equal(
                        pc.bit_wise_and(eid, pa.scalar(3, pa.int64())),
                        pa.scalar(0, pa.int64()),
                    ),
                    b.column("value"),
                    pa.nulls(b.num_rows, pa.float64()),
                ),
                "event_type": pc.if_else(
                    pc.equal(
                        pc.bit_wise_and(eid, pa.scalar(1, pa.int64())),
                        pa.scalar(0, pa.int64()),
                    ),
                    b.column("event_type"),
                    pa.nulls(b.num_rows, pa.string()),
                ),
            }
        )

    patches = _events(sf_dir).map_batches(
        to_patches, batch_format="pyarrow", batch_size=None
    )
    return lww_partial_merge(
        patches,
        pk="user_id",
        ver="ts",
        seq="event_id",
        patch_cols=["value", "event_type"],
    )


def _q_events_scd2_enrich(sf_dir: str):
    """Temporal (SCD2 validity-window) enrichment: attach to each purchase
    event the dimension version valid AT the event's timestamp — the
    versioned-lookup join of a fact stream against the history
    scd2_history derives from the same change stream."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import (
        scd2_history,
        temporal_join,
    )

    hist = scd2_history(
        _events(sf_dir),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        attr_cols=["value"],
        delete_when=("event_type", "error"),
    )
    hist_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("value", pa.float64()),
            ("valid_from", pa.timestamp("us")),
            ("valid_to", pa.timestamp("us")),
            ("is_current", pa.bool_()),
        ]
    )

    def purchases(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_id": b.column("event_id"),
                "ts": b.column("ts"),
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
            }
        )
        return t.filter(pc.equal(t.column("event_type"), "purchase")).drop_columns(
            ["event_type"]
        )

    left = _events(sf_dir).map_batches(
        purchases, batch_format="pyarrow", batch_size=None
    )
    left_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    out = temporal_join(
        left,
        hist,
        on="user_id",
        left_ts="ts",
        right_keep=["value"],
        suffix="_dim",
        left_schema=left_schema,
        right_schema=hist_schema,
    )

    def select(b: pa.Table) -> pa.Table:
        return b.select(["event_id", "ts", "user_id", "value_dim"])

    return out.map_batches(select, batch_format="pyarrow", batch_size=None)


def _q_events_moments_by_type(sf_dir: str):
    """Per-type exact higher moments (population variance / skewness /
    kurtosis) from integer power sums + one fixed-IEEE-order finish —
    bit-identical to the spelled-out SQL."""
    from airbyte_destination_ray.pipelines.ops import grouped_moments

    return grouped_moments(_events(sf_dir), key="event_type", value_col="value")


def _q_events_type_paths(sf_dir: str):
    """SQL string_agg per key: each user's full event-type path in
    (ts, event_id) order — vectorized segment join, one keyed exchange."""
    from airbyte_destination_ray.pipelines.ops import agg_strings_by_key

    return agg_strings_by_key(
        _events(sf_dir),
        key="user_id",
        value_col="event_type",
        order_cols=["ts", "event_id"],
        sep=",",
        out_col="type_path",
    )


def _q_cdc_time_travel(sf_dir: str):
    """Lake time travel: read the CDC table AS OF source epoch 1 (of 3) —
    the manifest log is the snapshot index; the oracle recomputes the LWW
    fold over only the events whose deterministic epoch is ≤ 1."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        time_travel_events_table,
    )

    return time_travel_events_table(sf_dir, as_of_epoch=1)


def _q_doc_lm_score(sf_dir: str):
    """Bigram-LM cross-entropy proxy per doc (CCNet/KenLM quality-filter
    stage): corpus top-500 bigram model (count DESC, gram ASC cutoff) →
    integer score Σ floor(1e6·c(w1w2)/c(w1)) over matched bigrams —
    integer-exact, so hash-checkable (Σ −log p would hit libm drift)."""
    from airbyte_destination_ray.pipelines.corpus import doc_lm_score

    return doc_lm_score(
        _documents(sf_dir, columns=["doc_id", "text"]), top_k=500
    )


def _q_customer_rfm(sf_dir: str):
    """RFM segmentation (the CRM analytics staple): per-customer
    recency (max order day) / frequency (order count) / monetary (cents
    sum) quartile-bucketed by exact discrete quantile bounds (bucket =
    number of bounds strictly below the value — deterministic ties),
    rolled up to segment counts.  One custkey exchange for the
    aggregates; each quantile streams histogram-selection passes; the
    bucket fold is aggregate-sized (≤64 segments)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import exact_quantile_disc
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        from airbyte_destination_ray.functions.hashing import partition_ids

        days = pc.cast(
            pc.divide(
                pc.cast(b.column("o_orderdate"), pa.int64()),
                86400000000,
            ),
            pa.int64(),
        )
        cents = pc.cast(
            pc.floor(pc.multiply(b.column("o_totalprice"), 100.0)),
            pa.int64(),
        )
        t = pa.table({
            "k": b.column("o_custkey"),
            "r": days, "f": pa.array(
                np.ones(b.num_rows, dtype=np.int64)),
            "m": cents,
        })
        g = t.group_by("k", use_threads=False).aggregate(
            [("r", "max"), ("f", "sum"), ("m", "sum")]
        ).rename_columns(["k", "r", "f", "m"])
        parts = partition_ids(g.column("k"), 16)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"]).group_by(
            "k", use_threads=False
        ).aggregate([("r", "max"), ("f", "sum"), ("m", "sum")])
        return g.rename_columns(["k", "r", "f", "m"])

    agg = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    ).materialize()

    import ray.data as _rd

    q1 = exact_quantile_disc(agg, value_col="r", q=0.25)
    if q1 is None:  # empty orders table: no customers, no segments
        return _rd.from_arrow(pa.table({
            "r_bucket": pa.array([], type=pa.int64()),
            "f_bucket": pa.array([], type=pa.int64()),
            "m_bucket": pa.array([], type=pa.int64()),
            "n_customers": pa.array([], type=pa.int64()),
        }))
    bounds = {
        c: [
            float(exact_quantile_disc(agg, value_col=c, q=q))
            for q in (0.25, 0.5, 0.75)
        ]
        for c in ("r", "f", "m")
    }

    def bucketize(b: pa.Table) -> pa.Table:
        import numpy as np

        cols = {}
        for c in ("r", "f", "m"):
            v = b.column(c).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            bd = np.array(bounds[c], dtype=np.float64)
            cols[f"{c}_bucket"] = pa.array(
                np.searchsorted(bd, v, side="left").astype(np.int64)
            )
        cols["n_customers"] = pa.array(
            np.ones(b.num_rows, dtype=np.int64)
        )
        t = pa.table(cols)
        g = t.group_by(
            ["r_bucket", "f_bucket", "m_bucket"], use_threads=False
        ).aggregate([("n_customers", "sum")])
        return g.rename_columns(
            ["r_bucket", "f_bucket", "m_bucket", "n_customers"]
        )

    def reduce_all(b: pa.Table) -> pa.Table:
        g = b.group_by(
            ["r_bucket", "f_bucket", "m_bucket"], use_threads=False
        ).aggregate([("n_customers", "sum")])
        return g.rename_columns(
            ["r_bucket", "f_bucket", "m_bucket", "n_customers"]
        )

    return (
        agg.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(reduce_all, batch_format="pyarrow", batch_size=None)
    )


def _q_corpus_report(sf_dir: str):
    """Dataset-card summary block: doc/text counts, char/token totals,
    distinct langs/sources — one pass, aggregate-sized partials."""
    from airbyte_destination_ray.pipelines.corpus import corpus_report

    return corpus_report(
        _documents(sf_dir, columns=["doc_id", "text", "lang", "source"])
    )


def _q_tokenize_ids(sf_dir: str):
    """Tokenizer-apply stage: corpus top-20 vocab (cutoff bites the
    31-token vocabulary), token -> frequency-rank id (OOV -> 0); per-doc
    position-weighted integer checksum witnesses every id assignment."""
    from airbyte_destination_ray.pipelines.corpus import tokenize_ids

    return tokenize_ids(
        _documents(sf_dir, columns=["doc_id", "text"]), vocab_k=20
    )


def _q_excise_duplicate_spans(sf_dir: str):
    """Cross-doc EXACT substring dedup (Lee et al. 2022 ExactSubstr):
    every duplicated 20-token window excised from all but its first
    (doc_id, pos) occurrence; docs rebuilt from uncovered tokens.  Two
    exchanges (gram-routed occurrence sets, doc-routed excision)."""
    from airbyte_destination_ray.pipelines.corpus import (
        excise_duplicate_spans,
    )

    return excise_duplicate_spans(
        _documents(sf_dir, columns=["doc_id", "text"]), window_k=20
    )


def _q_split_assign(sf_dir: str):
    """Deterministic train/val/test split audit: Knuth multiplicative
    hash of doc_id against 80/10/10 cumulative thresholds; per
    (source, split) doc counts + char sums.  Zero-exchange partials,
    aggregate-sized final."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.corpus import split_assign_stats

    ds = split_assign_stats(
        _documents(sf_dir, columns=["doc_id", "source", "n_chars"])
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["source", "split", "n_docs", "sum_chars"])

    return ds.map_batches(rename, batch_format="pyarrow", batch_size=None)


def _q_cdc_gap_audit(sf_dir: str):
    """Binlog integrity audit: per-epoch count, seq min/max, implied
    missing-seq count — zero-exchange partials, O(epochs) driver rows."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        binlog_gap_audit,
    )

    return binlog_gap_audit(sf_dir)


def _q_cdc_quantile_view(sf_dir: str):
    """Incrementally-maintained approximate quantile view: persistent
    per-group mergeable digest folded across 3 binlog epochs (refresh =
    O(groups), never O(history)); exact-until-compression at delta=4096
    so the final read == quantile_cont (the oracle)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        quantile_view_events_table,
    )

    return quantile_view_events_table(sf_dir)


def _q_cdc_quantile_view_merge(sf_dir: str):
    """Federated sketch merge: two independently-maintained quantile
    views (epochs 0-1 in lake A, epoch 2 in lake B) merged digest-wise
    answer for the whole stream — mergeability is what makes sketch
    state shippable across clusters without event data."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        merged_quantile_views_events,
    )

    return merged_quantile_views_events(sf_dir)


def _q_cdc_column_audit(sf_dir: str):
    """Column-level CDC audit: per epoch the change feed's I/U/D counts
    plus per-column changed-cell counts over 'U' rows (null-safe IS
    DISTINCT FROM).  Oracle = per-epoch FULL JOIN of deterministic
    as-of LWW snapshots."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        column_audit_events_table,
    )

    return column_audit_events_table(sf_dir)


def _q_cdc_state_agg(sf_dir: str):
    """Retractable incrementally-maintained aggregate (Materialize/Flink
    retract-stream analog): event_type -> (n, sum_cents) of the row
    table's VISIBLE snapshot, maintained across 3 binlog epochs via
    change-feed retractions; final state == one-shot GROUP BY over the
    final LWW snapshot (the oracle)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        state_agg_events_table,
    )

    return state_agg_events_table(sf_dir)


def _q_cooccurrence_pmi(sf_dir: str):
    """Windowed co-occurrence + integer-exact PMI (word2vec/GloVe prep):
    top-20 vocab (cutoff bites: corpus has 31 distinct tokens), ordered
    pairs within distance 3, c_ab >= 2, top-100 by
    floor(1e6*c_ab*N/(c_a*c_b)) with (pmi DESC, w1, w2) tie order."""
    from airbyte_destination_ray.pipelines.corpus import cooccurrence_pmi

    return cooccurrence_pmi(
        _documents(sf_dir, columns=["doc_id", "text"]),
        window=3, vocab_k=20, min_count=2, top_k=100,
    )


def _q_cdc_rollback(sf_dir: str):
    """ROLLBACK / RESTORE: sync the 3-epoch events binlog, rewind the lake
    to epoch 1 via metadata-only manifest surgery (rollback_table), read
    the CURRENT state — must equal the time-travel read, so the oracle is
    the LWW fold over the deterministic epoch-≤1 slice."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        rollback_events_table,
    )

    return rollback_events_table(sf_dir, to_epoch=1)


def _q_cdc_clone_branch(sf_dir: str):
    """SHALLOW CLONE branch divergence: zero-copy metadata clone of the
    synced events table, GDPR-delete a key set in the BRANCH only, read
    the branch (untouched partitions still read the source's files via
    the cloned manifests).  Oracle = full LWW snapshot minus the branch
    keys; the source's own queries pin that it is unaffected."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        clone_branch_events_table,
    )

    return clone_branch_events_table(sf_dir)


def _q_cdc_range_scan(sf_dir: str):
    """Zone-map range scan: manifest per-file min/max stats prune the lake
    scan to files that can intersect event_id ∈ [3·max//4, max]; bounds come
    from manifest max_seq metadata (no data pass)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        range_scan_events_table,
    )

    return range_scan_events_table(sf_dir)


def _q_target_encode_user(sf_dir: str):
    """Smoothed target encoding of event value per user (the categorical-
    feature trick): exact rational (Σ_key·N + m·Σ_global)/(N·(n_key+m))
    over integer cents — one float division per key, bit-identical to the
    SQL oracle.  High-cardinality key → partition-level final."""
    from airbyte_destination_ray.pipelines.ops import target_encode_by_key

    return target_encode_by_key(
        _events(sf_dir, columns=["user_id", "value"]),
        key="user_id",
        target_col="value",
        smoothing=10,
    )


def _q_profit_by_nation_year_q9(sf_dir: str):
    """TPC-H Q9-shaped composite (see pipelines.tpch): part-name filter →
    broadcast semi join, supplier⋈nation broadcast, one big×big order-
    year exchange, (nation × year) cents fold."""
    from airbyte_destination_ray.pipelines.tpch import q9_profit_by_nation_year

    return q9_profit_by_nation_year(sf_dir)


def _q_late_shipments_by_flag_q12(sf_dir: str):
    """TPC-H Q12-shaped composite: one lineitem⋈orders exchange +
    high/low-priority CASE counts per returnflag."""
    from airbyte_destination_ray.pipelines.tpch import (
        q12_late_shipments_by_flag,
    )

    return q12_late_shipments_by_flag(sf_dir)


def _q_special_revenue_q19(sf_dir: str):
    """TPC-H Q19-shaped composite: broadcast part dim + OR-of-ANDs
    vectorized predicate → single global cents sum."""
    from airbyte_destination_ray.pipelines.tpch import q19_special_revenue

    return q19_special_revenue(sf_dir)


def _q_idle_customer_balance_q22(sf_dir: str):
    """TPC-H Q22-shaped composite: positive-balance average (exact cents,
    one IEEE division) + low-activity filter (distributed per-custkey
    count, ≤2 orders — the synthetic corpus gives nearly every customer
    an order so a strict NOT EXISTS is degenerate) + per-nation fold."""
    from airbyte_destination_ray.pipelines.tpch import (
        q22_idle_customer_balance,
    )

    return q22_idle_customer_balance(sf_dir)


def _q_top_supplier_q15(sf_dir: str):
    """TPC-H Q15 composite (faithful): quarter-window revenue per
    supplier (dim-sized fold), max-revenue winner(s) + name join."""
    from airbyte_destination_ray.pipelines.tpch import q15_top_supplier

    return q15_top_supplier(sf_dir)


def _q_min_cost_supplier_q2(sf_dir: str):
    """TPC-H Q2-shaped composite: per-part argmin supplier (cheapest
    single lineitem) with Q2's tie order, via one partkey-keyed
    exchange of (part, supp, min-cents) partials."""
    from airbyte_destination_ray.pipelines.tpch import q2_min_cost_supplier

    return q2_min_cost_supplier(sf_dir)


def _q_important_parts_q11(sf_dir: str):
    """TPC-H Q11-shaped composite: parts whose revenue exceeds a
    fraction of the global total (HAVING vs a global scalar)."""
    from airbyte_destination_ray.pipelines.tpch import q11_important_parts

    return q11_important_parts(sf_dir)


def _q_waiting_suppliers_q21(sf_dir: str):
    """TPC-H Q21-shaped composite: unique latest shipper of finished
    multi-supplier orders (EXISTS + NOT EXISTS), tagged-union orderkey
    exchange + vectorized per-order kernel, top-20 by numwait."""
    from airbyte_destination_ray.pipelines.tpch import q21_waiting_suppliers

    return q21_waiting_suppliers(sf_dir)


def _q_excess_suppliers_q20(sf_dir: str):
    """TPC-H Q20-shaped composite: suppliers shipping more than half of a
    name-filtered part's 1996 quantity (correlated threshold, exact
    integer 2*qty > total), one partkey exchange + dim-sized final."""
    from airbyte_destination_ray.pipelines.tpch import q20_excess_suppliers

    return q20_excess_suppliers(sf_dir)

def _q_embedding_radius_pairs(sf_dir: str):
    """Cosine range query (radius search): all corpus vectors within
    similarity >= 0.3 of the 4 query vectors — broadcast matrix + per-batch
    matmul mask, ZERO shuffle; pairs only (scores are fp-rounding-sensitive
    across engines, the >=-threshold set is not at this corpus's margin)."""
    from airbyte_destination_ray.pipelines.similarity import radius_search

    q, ids = _query_vectors(sf_dir)
    return radius_search(_embeddings(sf_dir), q, ids, threshold=0.3)


def _q_events_reciprocal_edges(sf_dir: str):
    """Mutual (reciprocated) edges of the shared sparse interaction graph:
    unordered pairs with BOTH directions present — per-batch distinct
    (lo, hi, dir) triples, one lo-keyed exchange, vectorized both-dirs
    group filter."""
    from airbyte_destination_ray.pipelines.graph import reciprocal_edges

    import pyarrow as pa

    edges = _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
        _interaction_edges_3000, batch_format="pyarrow", batch_size=None
    )
    out = reciprocal_edges(edges)
    # collect to a TYPED table: an all-empty Ray result loses its schema
    # through map_groups (zero mutual pairs at sf0.001) and the driver
    # compares column sets — same guard as _q_events_link_prediction
    parts = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in out.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def _q_ttr_by_source(sf_dir: str):
    """Type-token ratio (lexical diversity) per source: distinct terms /
    total terms — term-keyed distinct exchange + additive token counts,
    final ttr is ONE IEEE division of two exact ints (hash-safe)."""
    from airbyte_destination_ray.pipelines.corpus import (
        type_token_ratio_by_group,
    )

    return type_token_ratio_by_group(
        _documents(sf_dir, columns=["source", "text"])
    )


def _q_events_cume_dist(sf_dir: str):
    """SQL cume_dist() OVER (PARTITION BY user ORDER BY value): tie-group
    LAST position / n, one keyed exchange + segmented sort; null values
    keep a null cd (oracle CASE), null users dropped."""
    from airbyte_destination_ray.pipelines.relational import cume_dist_by_key

    return cume_dist_by_key(
        _events(sf_dir, columns=["event_id", "user_id", "value"]),
        key="user_id",
        value_col="value",
        seq="event_id",
    )

def _q_page_change_rate_by_host(sf_dir: str):
    """Crawl-recency report (CDC x webtext): diff yesterday's page
    snapshot (LWW over even event_ids) against today's, bucket the I/U/D
    changelog by page host (urls_for_keys: host = user_id % 997), and
    report per-host insert/update/delete counts — which hosts are
    churning vs static, the recrawl-scheduling signal.  Host cardinality
    is bounded (<=997), so per-batch indicator partials fold driver-side;
    the diff itself is the one-exchange streaming table_diff."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import lww_latest
    from airbyte_destination_ray.pipelines.relational import table_diff

    def even_only(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b.column("event_id"), 1), 0)
        )

    old_snap = lww_latest(
        _events(sf_dir).map_batches(
            even_only, batch_format="pyarrow", batch_size=None
        ),
        pk="user_id",
        ver="ts",
        seq="event_id",
    )
    new_snap = lww_latest(
        _events(sf_dir), pk="user_id", ver="ts", seq="event_id"
    )
    diff = table_diff(
        old_snap, new_snap, key="user_id", compare_cols=["value"]
    )

    def host_partial(b: pa.Table) -> pa.Table:
        host_id = pc.cast(
            pc.bit_wise_and(b.column("user_id"), -1), pa.int64()
        )  # copy as int64
        host_id = pc.subtract(
            host_id, pc.multiply(pc.divide(host_id, 997), 997)
        )
        host = pc.binary_join_element_wise(
            "site-", pc.cast(host_id, pa.string()), ".example.com", ""
        )
        op = b.column("op")
        t = pa.table(
            {
                "host": host,
                "n_insert": pc.cast(pc.equal(op, "I"), pa.int64()),
                "n_update": pc.cast(pc.equal(op, "U"), pa.int64()),
                "n_delete": pc.cast(pc.equal(op, "D"), pa.int64()),
            }
        )
        return (
            t.group_by("host", use_threads=False)
            .aggregate(
                [("n_insert", "sum"), ("n_update", "sum"), ("n_delete", "sum")]
            )
            .rename_columns(["host", "n_insert", "n_update", "n_delete"])
        )

    parts = [
        pa.Table.from_batches([x]) if isinstance(x, pa.RecordBatch) else x
        for x in diff.map_batches(
            host_partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table(
            {
                "host": pa.array([], type=pa.string()),
                "n_insert": pa.array([], type=pa.int64()),
                "n_update": pa.array([], type=pa.int64()),
                "n_delete": pa.array([], type=pa.int64()),
            }
        )
    t = pa.concat_tables(parts, promote_options="permissive")
    return (
        t.group_by("host", use_threads=False)
        .aggregate(
            [("n_insert", "sum"), ("n_update", "sum"), ("n_delete", "sum")]
        )
        .rename_columns(["host", "n_insert", "n_update", "n_delete"])
    )

def _q_session_size_histogram(sf_dir: str):
    """Engagement-depth report: events-per-session distribution under the
    30-minute gap rule (n_sessions at size 1 = the bounce count) — one
    keyed exchange, vectorized boundary kernel, dim-sized driver fold."""
    from airbyte_destination_ray.pipelines.relational import (
        session_size_histogram,
    )

    return session_size_histogram(
        _events(sf_dir, columns=["event_id", "user_id", "ts"])
    )

def _q_events_wow_growth(sf_dir: str):
    """Week-over-week growth: events per ISO week (iso_year*100 + iso_week,
    Arrow iso_week == DuckDB weekofyear, verified) + the WoW ratio — LAG
    over an aggregate-sized series; the ratio is ONE IEEE division of two
    exact int counts, so it hash-matches SQL bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        yw = pc.add(
            pc.multiply(pc.cast(pc.iso_year(ts), pa.int64()), 100),
            pc.cast(pc.iso_week(ts), pa.int64()),
        )
        return (
            pa.table({"yw": yw})
            .group_by("yw")
            .aggregate([([], "count_all")])
            .rename_columns(["yw", "n"])
        )

    parts = [
        pa.Table.from_batches([x]) if isinstance(x, pa.RecordBatch) else x
        for x in _events(sf_dir, columns=["ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow")
    ]
    parts = [p for p in parts if p.num_rows]
    t = pa.concat_tables(parts, promote_options="permissive")
    agg = (
        t.group_by("yw")
        .aggregate([("n", "sum")])
        .rename_columns(["yw", "n_events"])
        .sort_by([("yw", "ascending")])
    )
    n = agg.column("n_events").to_numpy(zero_copy_only=False).astype(np.int64)
    ratio = np.full(len(n), np.nan)
    if len(n) > 1:
        ratio[1:] = n[1:].astype(np.float64) / n[:-1].astype(np.float64)
    return pa.table(
        {
            "yw": agg.column("yw").cast(pa.int64()),
            "n_events": agg.column("n_events").cast(pa.int64()),
            "wow_ratio": pa.array(
                [None if np.isnan(r) else float(r) for r in ratio],
                type=pa.float64(),
            ),
        }
    )


def _q_trending_types_hourly(sf_dir: str):
    """Trending report: top-3 event types per hour by count (row_number
    tie-break on type) — the distributed part is the tumbling-window
    count; the rank runs on the aggregate-sized (hour x type) result."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import windowed_counts

    wc = windowed_counts(_events(sf_dir, columns=["ts", "event_type"]), unit="hour")
    parts = [
        pa.Table.from_batches([x]) if isinstance(x, pa.RecordBatch) else x
        for x in wc.iter_batches(batch_format="pyarrow")
    ]
    parts = [p for p in parts if p.num_rows]
    t = pa.concat_tables(parts, promote_options="permissive")
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("window_start", "ascending"),
            ("n_events", "descending"),
            ("event_type", "ascending"),
        ],
    )
    t = t.take(idx)
    # null window (null ts) must stay ONE SQL partition — sentinel-fill
    # before numpy or NaN != NaN splits it per row
    ws = pc.fill_null(
        t.column("window_start").cast(pa.int64()), np.iinfo(np.int64).min
    ).to_numpy(zero_copy_only=False)
    nrows = len(ws)
    start = np.ones(nrows, dtype=bool)
    if nrows > 1:
        start[1:] = ws[1:] != ws[:-1]
    si = np.flatnonzero(start)
    seg_id = np.cumsum(start) - 1
    rnk = np.arange(nrows) - si[seg_id] + 1
    t = t.append_column("rnk", pa.array(rnk, type=pa.int64()))
    return t.filter(pa.array(rnk <= 3)).select(
        ["window_start", "event_type", "n_events", "rnk"]
    )

def _q_multimodal_image_tiles_exact(sf_dir: str):
    """REAL PPM decode → 8×8 area-partition tile sums (the exact integer
    form of thumbnail/resize feature extraction): tile boundaries are
    ``(t·dim)//8`` so every pixel lands in exactly one tile, and the
    closed-form corpus lets the DuckDB oracle recompute every tile sum —
    any defect in decode, stride math, or tiling breaks the hash."""
    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        image_tile_sums,
        synthesize_media_table_exact,
    )

    ds = ray.data.from_arrow(synthesize_media_table_exact(256))
    return image_tile_sums(ds, grid=8, concurrency=2, batch_size=32)


def _q_multimodal_video_sample_exact(sf_dir: str):
    """REAL Y4M demux + evenly-spaced frame SAMPLING, hash-checked: the
    sampler picks frame ``(i·(nf−1))//(k−1)`` of each clip and the oracle
    recomputes each sampled frame's closed-form byte sum — pinning the
    demux offsets, the sampling formula, and the frame payload bytes."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    from airbyte_destination_ray.stages.multimodal import (
        sample_video_frames,
        synthesize_video_table_exact,
    )

    ds = ray.data.from_arrow(synthesize_video_table_exact(64))
    frames = sample_video_frames(
        ds, frames_per_video=3, concurrency=2, strict=True
    )

    def byte_sums(batch: pa.Table) -> pa.Table:
        col = batch.column("frame").combine_chunks()
        if len(col) == 0:
            return pa.table(
                {
                    "media_id": batch.column("media_id"),
                    "sample_idx": batch.column("frame_idx"),
                    "byte_sum": pa.array([], type=pa.int64()),
                }
            )
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset : col.offset + len(col) + 1
        ].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
            offs[0] : offs[-1]
        ].astype(np.int64)
        starts = offs[:-1] - offs[0]
        sums = np.add.reduceat(data, starts)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "sample_idx": batch.column("frame_idx"),
                "byte_sum": pa.array(sums),
            }
        )

    return frames.map_batches(
        byte_sums, batch_format="pyarrow", batch_size=None
    )


def _q_indexed_value_lookup(sf_dir: str):
    """Equality SECONDARY index on a non-pk column (event_type),
    incrementally maintained from the change feed (whole-value terms,
    tombstoned old values): lookup 'purchase' reads only the probed
    bucket's delta files + the partitions the matching pks hash to.
    Oracle = the LWW snapshot filtered on the same predicate, so stale
    postings or missed tombstones break the hash."""
    import os

    from airbyte_destination_ray.pipelines.events_cdc import (
        EVENT_PAYLOAD,
        _ensure_events_lake,
    )
    from airbyte_destination_ray.pipelines.index import (
        lookup_value_rows,
        sync_value_index,
    )

    for stale in Path("/tmp/adr_query").glob("valueidx-*"):
        try:
            os.kill(int(stale.name.rsplit("-", 1)[1]), 0)
        except (ValueError, ProcessLookupError):
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            pass
    lake = _ensure_events_lake(sf_dir)
    idx = (
        Path("/tmp/adr_query")
        / f"valueidx-{Path(sf_dir).name}-{os.getpid()}"
    )
    shutil.rmtree(idx, ignore_errors=True)
    sync_value_index(
        str(lake), "events_cdc", idx, upto_epoch=2, column="event_type"
    )
    return lookup_value_rows(
        str(lake), "events_cdc", idx, ["purchase"], columns=EVENT_PAYLOAD
    )


def _q_cdc_repartition(sf_dir: str):
    """Lake partition-count resize (16 → 32) through a WAP window: the
    full internal state (tombstones, seq watermarks) re-hashes in one
    exchange; publish flips generation + partition count in ONE metadata
    write.  Oracle = the plain LWW snapshot (resize must be invisible)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        repartition_events_table,
    )

    return repartition_events_table(sf_dir)


def _q_cdc_merge_apply(sf_dir: str):
    """MERGE INTO analog (cdc.apply_changes): one set-oriented merge of
    upserts + deletes computed from the lake's own visible state, applied
    binlog-free as a new epoch through the ordinary pre-reduce → exchange
    → per-partition LWW merge → manifest-CAS path; equal-version changes
    win on the deterministic synthetic seq (MERGE overwrite rule)."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        merge_apply_events_table,
    )

    return merge_apply_events_table(sf_dir)


def _q_cdc_gdpr_delete(sf_dir: str):
    """GDPR right-to-be-forgotten: physically delete 7 user_ids from the
    synced lake (O(keys) partition rewrites through the compaction manifest
    lane), then read the final state."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        gdpr_delete_events_table,
    )

    return gdpr_delete_events_table(sf_dir)


def _q_cdc_change_feed(sf_dir: str):
    """Change data feed (Delta-CDF analog): the NET visible-row changes the
    lake took between its as-of-epoch-0 and as-of-epoch-1 states — two
    time-travel reads diffed on one co-locating exchange."""
    from airbyte_destination_ray.pipelines.cdc import change_feed
    from airbyte_destination_ray.pipelines.events_cdc import (
        _ensure_events_lake,
    )

    lake = _ensure_events_lake(sf_dir)
    return change_feed(
        str(lake), "events_cdc", epoch=1, compare_cols=["event_type", "value"]
    )


def _q_events_running_distinct(sf_dir: str):
    """Per-user RUNNING distinct event-type count (the window SQL can't
    write directly — COUNT(DISTINCT) OVER is invalid; the first-occurrence
    cumsum rewrite is the oracle)."""
    from airbyte_destination_ray.pipelines.relational import (
        running_distinct_by_key,
    )

    return running_distinct_by_key(
        _events(sf_dir),
        key="user_id",
        value_col="event_type",
        ts_col="ts",
        seq="event_id",
    )


def _q_top_bigrams(sf_dir: str):
    """Global top-15 word bigrams (n-gram LM counts / collocations):
    vectorized adjacency over flattened tokens, value_counts pre-agg, term
    exchange only."""
    from airbyte_destination_ray.pipelines.corpus import top_ngrams

    return top_ngrams(_documents(sf_dir, columns=["text"]), n=2, k=15)


def _q_incremental_agg(sf_dir: str):
    """Incrementally-maintained aggregate view: per-user (count, integer-
    cents sum) folded epoch by epoch under the same manifest CAS as the row
    lake — the maintained state is bit-identical to the one-shot SQL
    GROUP BY at any epoch split."""
    import os as _os
    import shutil as _shutil
    from pathlib import Path as _Path

    from airbyte_destination_ray.pipelines.aggview import (
        read_agg,
        run_incremental_agg,
    )
    from airbyte_destination_ray.pipelines.events_cdc import (
        build_binlog_from_events,
    )

    tag = f"agg-{_Path(sf_dir).name}-{_os.getpid()}"
    base = _Path("/tmp/adr_query") / tag
    _shutil.rmtree(base, ignore_errors=True)
    binlog = base / "binlog"
    build_binlog_from_events(f"{sf_dir}/events.parquet", binlog)
    lake = str(base / "lake")
    run_incremental_agg(
        lake,
        str(binlog),
        table="user_totals",
        key="user_id",
        value_col="value",
        num_partitions=8,
    )
    return read_agg(lake, "user_totals", key_name="user_id")


def _q_incremental_join_view(sf_dir: str):
    """Incrementally-maintained JOIN view (fact LEFT JOIN dim on user_id,
    both partitioned by the join key so dim deltas apply partition-locally
    with zero join exchange): events reshaped into interleaved fact/dim
    binlogs, folded epoch by epoch under manifest CAS; the final view is
    bit-identical to the one-shot SQL join of the LWW states."""
    import os as _os
    import shutil as _shutil
    from pathlib import Path as _Path

    from airbyte_destination_ray.pipelines.joinview import (
        build_fact_dim_binlogs,
        read_join_view,
        run_incremental_join_view,
    )

    tag = f"jv-{_Path(sf_dir).name}-{_os.getpid()}"
    base = _Path("/tmp/adr_query") / tag
    _shutil.rmtree(base, ignore_errors=True)
    build_fact_dim_binlogs(f"{sf_dir}/events.parquet", base / "binlog")
    lake = str(base / "lake")
    run_incremental_join_view(
        lake,
        str(base / "binlog/fact"),
        str(base / "binlog/dim"),
        num_partitions=8,
    )
    return read_join_view(lake)


def _q_asof_next_click(sf_dir: str):
    """FORWARD as-of join: for each purchase, the user's EARLIEST click at
    or after the purchase timestamp (ties by min event_id) — pandas
    merge_asof(direction='forward'), one hash exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import asof_join

    def side(value, cols):
        def fn(b: pa.Table) -> pa.Table:
            t = b.select(cols + ["event_type"])
            return t.filter(
                pc.equal(t.column("event_type"), value)
            ).drop_columns(["event_type"])

        return fn

    ev = _events(sf_dir)
    left = ev.map_batches(
        side("purchase", ["event_id", "ts", "user_id", "value"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    right = ev.map_batches(
        side("click", ["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    left_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    right_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_seq="event_id",
        right_keep=["event_id"],
        suffix="_next",
        direction="forward",
        left_schema=left_schema,
        right_schema=right_schema,
    )

    def project(b: pa.Table) -> pa.Table:
        return b.select(
            ["event_id", "ts", "user_id", "value", "event_id_next"]
        ).rename_columns(
            ["event_id", "ts", "user_id", "value", "next_click_id"]
        )

    return out.map_batches(project, batch_format="pyarrow", batch_size=None)


def _q_click_purchase_window_join(sf_dir: str):
    """Stream-stream time-window join (Flink interval join): every
    (click, purchase) pair of the same user with the purchase within 30
    minutes AFTER the click — one co-locating exchange, vectorized
    segmented window-bound counts, output = true pair count."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import window_join

    def side(value, cols):
        def fn(b: pa.Table) -> pa.Table:
            t = b.select(cols + ["event_type"])
            return t.filter(
                pc.equal(t.column("event_type"), value)
            ).drop_columns(["event_type"])

        return fn

    ev = _events(sf_dir)
    clicks = ev.map_batches(
        side("click", ["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    purchases = ev.map_batches(
        side("purchase", ["event_id", "ts", "user_id", "value"]),
        batch_format="pyarrow",
        batch_size=None,
    )
    lschema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    rschema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("value", pa.float64()),
        ]
    )
    return window_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        before_us=0,
        after_us=30 * 60 * 1_000_000,
        right_keep=["event_id", "value"],
        suffix="_purchase",
        left_schema=lschema,
        right_schema=rschema,
    )


def _q_incremental_sessions(sf_dir: str):
    """Streaming sessionization with CROSS-EPOCH state: each binlog epoch
    extends/closes the previous snapshot's open sessions under the row
    lake's manifest CAS; the maintained session table equals one-shot
    batch sessionize (the oracle) at any epoch split."""
    import os as _os
    import shutil as _shutil
    from pathlib import Path as _Path

    import pyarrow as pa

    from airbyte_destination_ray.pipelines.aggview import (
        run_incremental_sessions,
    )
    from airbyte_destination_ray.pipelines.cdc import read_table
    from airbyte_destination_ray.pipelines.events_cdc import (
        build_binlog_from_events,
    )

    tag = f"sess-{_Path(sf_dir).name}-{_os.getpid()}"
    base = _Path("/tmp/adr_query") / tag
    _shutil.rmtree(base, ignore_errors=True)
    binlog = base / "binlog"
    build_binlog_from_events(f"{sf_dir}/events.parquet", binlog)
    lake = str(base / "lake")
    run_incremental_sessions(
        lake,
        str(binlog),
        table="user_sessions",
        key="user_id",
        ts_col="ts",
        seq="seq",
        gap_minutes=30,
        num_partitions=8,
    )
    ds = read_table(lake, "user_sessions")

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["user_id", "session_id", "session_start", "session_end",
             "n_events"]
        )

    return ds.map_batches(rename, batch_format="pyarrow", batch_size=None)


def _q_dedup_keep_longest(sf_dir: str):
    """Exact dedup on NORMALIZED text with the retention policy flipped:
    keep the LONGEST duplicate (ties -> min doc_id) instead of the first —
    the webtext completeness rule.  Hash-only exchange + one extra int64
    rank per doc."""
    from airbyte_destination_ray.pipelines.dedup import dedup_exact_hash

    return dedup_exact_hash(
        _documents(sf_dir), normalize=True, rank_col="n_chars"
    )


def _q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT / melt: the four lineitem measures to long form — purely
    per-batch reshape, no shuffle."""
    from airbyte_destination_ray.pipelines.ops import unpivot
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax",
        ],
    )
    return unpivot(
        ds,
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def _q_events_ohlc(sf_dir: str):
    """Per-(hour, type) OPEN/HIGH/LOW/CLOSE candlestick rollup — first/
    last-by-(ts,seq) made associative by carrying the defining order keys
    in the per-batch partials."""
    from airbyte_destination_ray.pipelines.relational import windowed_ohlc

    return windowed_ohlc(
        _events(sf_dir),
        ts_col="ts",
        key="event_type",
        seq="event_id",
        value_col="value",
        unit="hour",
    )


def _q_events_pagerank(sf_dir: str):
    """Fixed-point PageRank (3 iterations, d=0.85, scale=1e9) over a
    deterministic interaction graph derived from events — integer floor
    division + integer sums make the iterative algorithm bit-reproducible
    in an unrolled SQL CTE chain."""
    import numpy as np
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.graph import pagerank_fixed_point

    def edges(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"user_id": b.column("user_id"), "event_id": b.column("event_id")}
        )
        t = t.filter(t.column("user_id").combine_chunks().is_valid())
        u = t.column("user_id").combine_chunks()
        un = u.to_numpy(zero_copy_only=False)
        en = t.column("event_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        dst = (un + (en % 17)) % 150
        return pa.table({"src": u, "dst": pa.array(dst, type=pa.int64())})

    return pagerank_fixed_point(
        _events(sf_dir).map_batches(
            edges, batch_format="pyarrow", batch_size=None
        ),
        iters=3,
        num_partitions=16,
    )


def _q_doc_top_terms(sf_dir: str):
    """Per-document top-5 distinctive terms by tf/df ranking (monotone-
    equivalent to tf·idf within a doc; single IEEE division keeps the
    score hash-exact vs SQL) — two narrow exchanges, text never shuffled."""
    from airbyte_destination_ray.pipelines.corpus import doc_top_terms

    return doc_top_terms(
        _documents(sf_dir, columns=["doc_id", "text"]), k=5
    )


def _q_pack_documents(sf_dir: str):
    """Sequence packing: concat-then-chunk pack assignment at a 2048-token
    budget via the two-phase distributed prefix sum (range partials →
    driver exclusive prefix → seeded in-range cumsum)."""
    from airbyte_destination_ray.pipelines.corpus import pack_documents

    return pack_documents(
        _documents(sf_dir, columns=["doc_id", "text"]), budget=2048
    )


def _q_events_profile(sf_dir: str):
    """Data-quality profile of the events table: per column (n_rows,
    n_nulls, n_distinct) off one hash-partitioned distinct exchange."""
    from airbyte_destination_ray.pipelines.ops import profile_columns

    return profile_columns(
        _events(sf_dir),
        cols=["event_id", "user_id", "event_type", "value", "props"],
    )


def _q_events_ntile(sf_dir: str):
    """Exact global NTILE(4) over (value, event_id) + per-tile aggregate:
    rides the distributed sort-rank (O(bins) histogram exchange, per-bin
    local sort) and folds the 4-row tile summary from per-batch partials —
    the dataset is never globally sorted on one node."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.relational import ntile

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    tiled = ntile(
        _events(sf_dir, columns=["event_id", "value"]),
        by="value",
        tie_break="event_id",
        n_tiles=4,
        total_rows=n,
        descending=False,
        bin_width=1.0,
    )

    def partial(b: "pa.Table") -> "pa.Table":
        cents = pc.cast(
            pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
        )
        t = pa.table(
            {
                "tile": b.column("tile"),
                "_c": cents,
                "_v": b.column("value"),
            }
        )
        return (
            t.group_by("tile")
            .aggregate(
                [("_c", "sum"), ("_v", "min"), ("_v", "max"), ("_c", "count")]
            )
            .rename_columns(["tile", "_s", "_mn", "_mx", "_n"])
        )

    parts = pa.concat_tables(
        list(
            tiled.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ).iter_batches(batch_format="pyarrow")
        )
    )
    g = parts.group_by("tile").aggregate(
        [("_n", "sum"), ("_s", "sum"), ("_mn", "min"), ("_mx", "max")]
    )
    return pa.table(
        {
            "tile": g.column("tile"),
            "n_rows": g.column("_n_sum").cast(pa.int64()),
            "value_cents": g.column("_s_sum").cast(pa.int64()),
            "min_value": g.column("_mn_min"),
            "max_value": g.column("_mx_max"),
        }
    )


def _q_event_type_lift(sf_dir: str):
    """Market-basket pair analysis: which event types co-occur in the same
    user's history, with lift — distinct-pair exchange + per-partition
    bitmask fold; the driver folds K² ints, never rows."""
    from airbyte_destination_ray.pipelines.relational import item_cooccurrence

    return item_cooccurrence(
        _events(sf_dir, columns=["user_id", "event_type"]),
        basket="user_id",
        item="event_type",
    )


def _q_events_max_concurrency(sf_dir: str):
    """Peak simultaneously-open 30-minute event windows per type — the
    sweep-line max via the two-phase distributed prefix sum (per-(type,
    day-bin) delta totals → driver offsets → per-bin local sweep)."""
    from airbyte_destination_ray.pipelines.relational import (
        max_concurrency_by_key,
    )

    return max_concurrency_by_key(
        _events(sf_dir, columns=["event_type", "ts"]),
        key="event_type",
        start_col="ts",
        duration_us=1_800_000_000,
    )


def _q_events_trimmed_mean(sf_dir: str):
    """Outlier-robust per-type mean: exact per-key quantile_disc [p10, p90]
    band (bounds are actual column elements) + integer-cents conditional
    sums, one IEEE division per key."""
    from airbyte_destination_ray.pipelines.ops import trimmed_mean_by_key

    return trimmed_mean_by_key(
        _events(sf_dir, columns=["event_type", "value"]),
        key="event_type",
        value_col="value",
        lo=0.1,
        hi=0.9,
    )


def _q_events_skyline(sf_dir: str):
    """Pareto frontier maximizing (value, ts): per-batch local skyline
    inside map_batches (rows never shuffle), exact refine over the merged
    O(frontier) candidate set."""
    from airbyte_destination_ray.pipelines.ops import skyline

    return skyline(
        _events(sf_dir, columns=["event_id", "ts", "value"]),
        x="value",
        y="ts",
        columns=["event_id", "ts", "value"],
    )


def _q_events_degree_histogram(sf_dir: str):
    """Degree distribution of the deterministic interaction graph (same
    edge derivation as the triangle/pagerank queries): canonical distinct
    edges → exact per-node degrees → aggregate-sized histogram."""
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.graph import degree_histogram

    def edges(b: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        t = pa.table(
            {"user_id": b.column("user_id"), "event_id": b.column("event_id")}
        )
        t = t.filter(t.column("user_id").combine_chunks().is_valid())
        un = t.column("user_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        en = t.column("event_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        src = un % 150
        dst = (un + en % 17) % 150
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
            }
        )

    return degree_histogram(
        _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
            edges, batch_format="pyarrow", batch_size=None
        )
    )


def _q_promo_revenue_ratio(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q14_promo_revenue_ratio

    return q14_promo_revenue_ratio(sf_dir)


def _q_suppliers_per_brand(sf_dir: str):
    """TPC-H Q16-shaped supplier diversity: COUNT(DISTINCT supplier) per
    part brand — brand broadcast onto the lineitem scan (searchsorted, no
    dimension exchange), then the exact pair-dedup distinct count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.relational import distinct_count_by

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    order = np.argsort(part.column("p_partkey").to_numpy(zero_copy_only=False))
    pk_sorted = part.column("p_partkey").to_numpy(zero_copy_only=False)[order]
    brands_sorted = np.asarray(
        part.column("p_brand").to_pylist(), dtype=object
    )[order]

    def tag(b: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_sorted, pk)
        pos_c = np.clip(pos, 0, len(pk_sorted) - 1)
        known = pk_sorted[pos_c] == pk
        t = pa.table(
            {
                "p_brand": pa.array(
                    brands_sorted[pos_c], type=pa.string()
                ),
                "l_suppkey": b.column("l_suppkey"),
            }
        )
        return t.filter(pa.array(known))

    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    tagged = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(tag, batch_format="pyarrow", batch_size=None)
    counted = distinct_count_by(
        tagged, key="p_brand", distinct_col="l_suppkey"
    )

    def rename(b: "pa.Table") -> "pa.Table":
        return b.rename_columns(["p_brand", "n_suppliers"])

    return counted.map_batches(rename, batch_format="pyarrow", batch_size=None)


def _q_dedup_lines_within_docs(sf_dir: str):
    """INTRA-document segment dedup (C4's "dedup lines within a page"):
    zero-exchange — one vectorized map_batches pass (split → lexsort →
    rejoin); SQL row_number() OVER (PARTITION BY doc_id, seg ORDER BY
    idx) = 1 with string_agg reconstruction."""
    from airbyte_destination_ray.pipelines.corpus import (
        dedup_segments_within,
    )

    return dedup_segments_within(
        _documents(sf_dir, columns=["doc_id", "text"]), sep=" "
    )


def _q_events_hhi_by_type(sf_dir: str):
    """Herfindahl concentration of user activity per event type: two
    fixed-width pre-reduced exchanges (pair counts by hash(key, member),
    then per-key partials), all-integer until one IEEE division."""
    from airbyte_destination_ray.pipelines.ops import hhi_by_key

    return hhi_by_key(
        _events(sf_dir, columns=["event_type", "user_id"]),
        key="event_type",
        member_col="user_id",
    )


def _q_source_quality_gate(sf_dir: str):
    """Host/source-level quality blocklist derived from corpus statistics:
    per-source integer partials → cross-multiply accept test in Python
    ints (no float ratio), broadcast allowed-source set, filter — document
    text never rides an exchange."""
    from airbyte_destination_ray.pipelines.ops import source_quality_gate

    return source_quality_gate(
        _documents(sf_dir), source_col="source", text_col="text"
    )


def _q_user_longest_streak(sf_dir: str):
    """Longest run of consecutive active days (>= 2 events/day) per user —
    gaps-and-islands via ONE keyed exchange of pre-reduced (key, day,
    count) rows + segmented run detection (reduceat, no Python per key)."""
    from airbyte_destination_ray.pipelines.relational import (
        longest_streak_by_key,
    )

    return longest_streak_by_key(
        _events(sf_dir, columns=["user_id", "ts"]),
        key="user_id",
        ts_col="ts",
        min_events=2,
    )


def _q_events_transition_matrix(sf_dir: str):
    """Per-user event-type Markov transitions (LAG adjacency counts) —
    one keyed exchange + per-partition Arrow group_by partials, tiny
    composite-key fold."""
    from airbyte_destination_ray.pipelines.relational import (
        transition_counts,
    )

    return transition_counts(
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        state_col="event_type",
        out_from="from_type",
        out_to="to_type",
        out_n="n",
    )


def _q_events_interval_coverage(sf_dir: str):
    """Union-of-intervals covered time per user (each event opens a
    [ts, ts + floor(value·1e6) µs) window; overlaps merge) — sweep-line
    over ±1 deltas, one keyed exchange, integer-exact vs the SQL islands
    running-max formulation."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import (
        interval_coverage_by_key,
    )

    def bounds(b: "pa.Table") -> "pa.Table":
        s = pc.cast(b.column("ts"), pa.int64())
        dur = pc.cast(
            pc.floor(
                pc.multiply(
                    b.column("value"), pa.scalar(1_000_000.0, pa.float64())
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {"user_id": b.column("user_id"), "_s": s, "_e": pc.add(s, dur)}
        )

    iv = _events(sf_dir, columns=["user_id", "ts", "value"]).map_batches(
        bounds, batch_format="pyarrow", batch_size=None
    )
    return interval_coverage_by_key(
        iv, key="user_id", start_col="_s", end_col="_e"
    )


def _q_events_resample_hourly(sf_dir: str):
    """Regular hourly grid per user with forward-filled value (max-seq
    tie-break, null before a user's first event) — structured-dtype
    searchsorted fill, one keyed exchange, grids built with repeat/arange
    (no Python per user)."""
    from airbyte_destination_ray.pipelines.relational import resample_ffill

    return resample_ffill(
        _events(sf_dir, columns=["event_id", "ts", "user_id", "value"]),
        key="user_id",
        ts_col="ts",
        value_col="value",
        seq="event_id",
        step_us=3_600_000_000,
    )


def _q_wmedian_price_by_flag(sf_dir: str):
    """Quantity-weighted median extended price per return flag — exact
    cumulative-weight threshold on the value-sorted group (int64 weights,
    bit-exact vs the SQL window formulation)."""
    from airbyte_destination_ray.pipelines.ops import weighted_median_by_key
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    return weighted_median_by_key(
        li,
        key="l_returnflag",
        value_col="l_extendedprice",
        weight_col="l_quantity",
        out_col="wmedian",
    )


def _q_explode_doc_words(sf_dir: str):
    """Documents exploded to (doc_id, 1-based ordinal, word) long format —
    zero-exchange flat_map with string_split edge-case parity."""
    from airbyte_destination_ray.pipelines.corpus import explode_segments

    return explode_segments(
        _documents(sf_dir, columns=["doc_id", "text"]),
        id_col="doc_id",
        text_col="text",
        sep=" ",
    )


def _q_events_iqr_outliers(sf_dir: str):
    """Tukey-fence outlier counts per event type: exact per-type discrete
    quartiles (one small exchange), bounds broadcast into a second
    column-pruned scan, per-batch partial counts + tiny fold.  Bound
    arithmetic is the same IEEE expression on both sides
    (q1 − 1.5·(q3−q1)), so the comparison set is bit-identical."""
    import numpy as np
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.ops import grouped_quantiles_disc

    qd = grouped_quantiles_disc(
        _events(sf_dir, columns=["event_type", "value"]),
        key="event_type",
        value_col="value",
        quantiles=(0.25, 0.75),
    ).take_all()
    fences = {}
    for row in qd:
        k = row["event_type"]
        if k is None:
            continue
        q1, q3 = row["p25"], row["p75"]
        iqr = q3 - q1
        fences[k] = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)

    def partial(b: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        types = b.column("event_type").combine_chunks()
        vals = b.column("value").to_numpy(zero_copy_only=False)
        out_k, out_n = [], []
        for k, (lo, hi) in fences.items():
            m = pc.fill_null(pc.equal(types, k), False).to_numpy(
                zero_copy_only=False
            )
            sel = vals[m]
            n = int(np.count_nonzero((sel < lo) | (sel > hi)))
            if n:
                out_k.append(k)
                out_n.append(n)
        return pa.table(
            {
                "event_type": pa.array(out_k, type=pa.string()),
                "n_outliers": pa.array(out_n, type=pa.int64()),
            }
        )

    def fold(group: "pa.Table") -> "pa.Table":
        return (
            group.group_by("event_type", use_threads=False)
            .aggregate([("n_outliers", "sum")])
            .rename_columns(["event_type", "n_outliers"])
        )

    return (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .map_groups(fold, batch_format="pyarrow")
    )


def _q_lineitem_fk_orphans(sf_dir: str):
    """Referential-integrity audit: lineitem rows whose order is not an
    URGENT-priority order, counted per return flag — the distributed
    NOT EXISTS anti-join over pre-reduced (key, batch) partials."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import fk_violations
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    def urgent(b: "pa.Table") -> "pa.Table":
        return b.filter(
            pc.equal(b.column("o_orderpriority"), "1-URGENT")
        ).select(["o_orderkey"])

    parents = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(urgent, batch_format="pyarrow", batch_size=None)
    return fk_violations(
        read_parquet_sized(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag"],
        ),
        parents,
        fk="l_orderkey",
        pk="o_orderkey",
        report_col="l_returnflag",
        child_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_returnflag", pa.string())]
        ),
        parent_schema=pa.schema([("o_orderkey", pa.int64())]),
    )


def _q_benford_extendedprice(sf_dir: str):
    """Benford first-significant-digit profile of lineitem extended price —
    per-batch digit-peel combiner, aggregate-sized exchange, single-division
    fractions."""
    from airbyte_destination_ray.pipelines.ops import first_digit_counts
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return first_digit_counts(
        read_parquet_sized(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        ),
        value_col="l_extendedprice",
    )


def _q_events_minmax_by_type(sf_dir: str):
    """Per-type min-max feature scaling of event values — one keyed
    exchange, exact integer extrema, one IEEE division per row."""
    from airbyte_destination_ray.pipelines.ops import minmax_scale_by_key

    return minmax_scale_by_key(
        _events(sf_dir, columns=["event_id", "event_type", "value"]),
        key="event_type",
        seq="event_id",
        value_col="value",
        out_col="scaled",
    )


def _q_first_touch_attribution(sf_dir: str):
    """First-touch attribution: each user's FIRST event type (min ts, min
    event_id — LWW over negated order columns) credited with the user's
    total purchase cents.  Two pre-reduced keyed exchanges + one unique-key
    shuffle join with explicit schemas; final rollup is per-type."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_sum, lww_latest
    from airbyte_destination_ray.pipelines.relational import shuffle_join

    def neg_order(b: "pa.Table") -> "pa.Table":
        t = b.filter(
            pc.and_(
                b.column("ts").combine_chunks().is_valid(),
                b.column("user_id").combine_chunks().is_valid(),
            )
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "_nts": pc.negate(pc.cast(t.column("ts"), pa.int64())),
                "_nseq": pc.negate(t.column("event_id")),
            }
        )

    first = lww_latest(
        _events(
            sf_dir, columns=["user_id", "event_type", "ts", "event_id"]
        ).map_batches(neg_order, batch_format="pyarrow", batch_size=None),
        pk="user_id",
        ver="_nts",
        seq="_nseq",
    ).map_batches(
        lambda b: b.select(["user_id", "event_type"]).rename_columns(
            ["user_id", "first_type"]
        ),
        batch_format="pyarrow",
        batch_size=None,
    )

    def purchase_cents(b: "pa.Table") -> "pa.Table":
        t = b.filter(
            pc.and_(
                pc.fill_null(pc.equal(b.column("event_type"), "purchase"), False),
                b.column("user_id").combine_chunks().is_valid(),
            )
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "_c": pc.cast(
                    pc.floor(pc.multiply(t.column("value"), 100.0)),
                    pa.int64(),
                ),
            }
        )

    purchases = grouped_sum(
        _events(sf_dir, columns=["user_id", "event_type", "value"]).map_batches(
            purchase_cents, batch_format="pyarrow", batch_size=None
        ),
        key="user_id",
        value_col="_c",
        out_col="cents",
    )

    joined = shuffle_join(
        first,
        purchases,
        left_on="user_id",
        right_on="user_id",
        join_type="left outer",
        select=["first_type", "cents"],
        hot_keys=None,  # user keys unique on both sides
        left_schema=pa.schema(
            [("user_id", pa.int64()), ("first_type", pa.string())]
        ),
        right_schema=pa.schema(
            [("user_id", pa.int64()), ("cents", pa.int64())]
        ),
    )

    def partial(b: "pa.Table") -> "pa.Table":
        return (
            pa.table(
                {
                    "first_type": b.column("first_type"),
                    "_c": pc.fill_null(b.column("cents"), 0),
                }
            )
            .group_by("first_type")
            .aggregate([("_c", "sum"), ([], "count_all")])
            .rename_columns(["first_type", "_c", "_n"])
        )

    def route(b: "pa.Table") -> "pa.Table":
        # hash-route the fold: Ray's groupby cannot sort a null group key,
        # and SQL keeps the NULL first_type group
        from airbyte_destination_ray.functions.hashing import partition_ids

        parts = partition_ids(b.column("first_type"), 8)
        return b.append_column("_rpart", pa.array(parts, type=pa.int64()))

    def final(group: "pa.Table") -> "pa.Table":
        g = (
            group.drop_columns(["_rpart"])
            .group_by("first_type")
            .aggregate([("_c", "sum"), ("_n", "sum")])
        )
        return pa.table(
            {
                "first_type": g.column("first_type"),
                "n_users": g.column("_n_sum").cast(pa.int64()),
                "purchase_cents": g.column("_c_sum").cast(pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("_rpart")
        .map_groups(final, batch_format="pyarrow")
    )


def _q_clicks_unconverted_1h(sf_dir: str):
    """Absence detection (the anti-as-of): clicks NOT followed by a
    purchase by the same user within one hour, counted per user — forward
    as-of join with tolerance, null-match filter, keyed count."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_count
    from airbyte_destination_ray.pipelines.relational import asof_join

    def pick(kind: str):
        def fn(b: "pa.Table") -> "pa.Table":
            keep = pc.and_(
                pc.and_(
                    pc.fill_null(pc.equal(b.column("event_type"), kind), False),
                    b.column("ts").combine_chunks().is_valid(),
                ),
                b.column("user_id").combine_chunks().is_valid(),
            )
            return b.filter(keep).select(["event_id", "ts", "user_id"])

        return fn

    cols = ["event_id", "ts", "user_id", "event_type"]
    side_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    clicks = _events(sf_dir, columns=cols).map_batches(
        pick("click"), batch_format="pyarrow", batch_size=None
    )
    purchases = _events(sf_dir, columns=cols).map_batches(
        pick("purchase"), batch_format="pyarrow", batch_size=None
    )
    j = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_seq="event_id",
        right_keep=["event_id"],
        direction="forward",
        tolerance_us=3_600_000_000,
        left_schema=side_schema,
        right_schema=side_schema,
    )

    def unmatched(b: "pa.Table") -> "pa.Table":
        return b.filter(
            pc.invert(b.column("event_id_right").combine_chunks().is_valid())
        ).select(["user_id"])

    return grouped_count(
        j.map_batches(unmatched, batch_format="pyarrow", batch_size=None),
        key="user_id",
        out_col="n_unconverted",
    )


def _q_source_vocab_overlap(sf_dir: str):
    """Pairwise exact Jaccard vocabulary overlap between document sources —
    bitmask-per-term fold, aggregate-sized mask histogram, single-division
    Jaccard."""
    from airbyte_destination_ray.pipelines.corpus import source_vocab_overlap

    return source_vocab_overlap(
        _documents(sf_dir, columns=["source", "text"]),
        group_col="source",
        text_col="text",
        groups_ds=_documents(sf_dir, columns=["source"]),
    )


def _q_events_hourly_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the hourly event-count series — bucketed
    pre-reduce, one tiny fold, fixed-IEEE corr finalization."""
    from airbyte_destination_ray.pipelines.relational import series_autocorr

    return series_autocorr(_events(sf_dir, columns=["ts"]), ts_col="ts")


def _q_priority_late_orders(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q4_priority_late_orders

    return q4_priority_late_orders(sf_dir)


def _q_events_spearman_by_user(sf_dir: str):
    """Per-user Spearman rank correlation of value vs time — distributed
    row_number ranks (two segmented sorts) + exact int rank moments +
    fixed-IEEE Pearson finalization."""
    from airbyte_destination_ray.pipelines.ops import spearman_by_key

    return spearman_by_key(
        _events(sf_dir, columns=["user_id", "value", "ts", "event_id"]),
        key="user_id",
        x_col="value",
        y_col="ts",
        seq="event_id",
        out_col="spearman",
    )


def _q_events_daily_delta(sf_dir: str):
    """Day-over-day event volume report (count, delta, ratio vs previous
    present day) — aggregate-sized bucket fold + one final lag pass."""
    from airbyte_destination_ray.pipelines.relational import period_delta

    return period_delta(_events(sf_dir, columns=["ts"]), ts_col="ts")


def _q_cdc_txn_two_tables(sf_dir: str):
    """Multi-table atomic transaction (cross-table WAP): two tables staged
    and published at ONE commit point; returns the post-publish per-table
    summary."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        txn_sync_events_tables,
    )

    return txn_sync_events_tables(sf_dir)


def _q_token_quantiles_by_source(sf_dir: str):
    """Per-source word-count quartiles (exact discrete quantiles over the
    RE2 token counter) — the corpus length-profile diagnostic."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_quantiles_disc

    def words(b: "pa.Table") -> "pa.Table":
        from airbyte_destination_ray.functions.text import fast_word_count

        keep = pc.and_(
            b.column("source").combine_chunks().is_valid(),
            b.column("text").combine_chunks().is_valid(),
        )
        t = b.filter(keep)
        return pa.table(
            {
                "source": t.column("source"),
                # byte-level \S+ run counter — RE2-exact (pinned in
                # tests), ~5× the char-class regex throughput
                "n_words": fast_word_count(
                    t.column("text").combine_chunks()
                ),
            }
        )

    return grouped_quantiles_disc(
        _documents(sf_dir, columns=["source", "text"]).map_batches(
            words, batch_format="pyarrow", batch_size=None
        ),
        key="source",
        value_col="n_words",
        quantiles=(0.25, 0.5, 0.75),
    )


def _interaction_edges_3000(b):
    """Deterministic sparse interaction graph shared by the k-core and
    assortativity queries (10k edges / 3000 nodes at sf0.01) — the formula
    is load-bearing: it must match BOTH oracles' SQL exactly, so it lives
    in exactly one place."""
    import pyarrow as pa

    t = pa.table(
        {"user_id": b.column("user_id"), "event_id": b.column("event_id")}
    )
    t = t.filter(t.column("user_id").combine_chunks().is_valid())
    un = t.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    en = t.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "src": pa.array(en % 3000, type=pa.int64()),
            "dst": pa.array((en // 7 + un * 13) % 3000, type=pa.int64()),
        }
    )


def _q_events_reachable_3hop(sf_dir: str):
    """Bounded-depth reachability (blast radius): min-hop BFS closure
    within 3 hops of seeds {0,1,2} over the shared sparse interaction
    graph — frontier-broadcast scans, one per hop, no exchange.  Oracle
    = unrolled 3-level join chain + min(hop)."""
    from airbyte_destination_ray.pipelines.graph import k_hop_reachable

    edges = _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
        _interaction_edges_3000, batch_format="pyarrow", batch_size=None
    )
    return k_hop_reachable(edges, [0, 1, 2], hops=3)


def _q_events_k_core(sf_dir: str):
    """4-core of the shared sparse interaction graph — iterative
    distributed peeling, converges in ~3 rounds; oracle is the
    unrolled-round SQL (extra rounds are no-ops)."""
    from airbyte_destination_ray.pipelines.graph import k_core

    return k_core(
        _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
            _interaction_edges_3000, batch_format="pyarrow", batch_size=None
        ),
        k=4,
    )


def _q_events_assortativity(sf_dir: str):
    """Degree assortativity (Newman mixing) of the shared sparse
    interaction graph — canonical-edge/degree kernels, two unique-key
    joins, exact int moment partials, fixed-IEEE corr finalization."""
    from airbyte_destination_ray.pipelines.graph import degree_assortativity

    return degree_assortativity(
        _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
            _interaction_edges_3000, batch_format="pyarrow", batch_size=None
        )
    )


def _q_events_locf_daily(sf_dir: str):
    """Per-user daily snapshot with last-observation-carried-forward:
    every day between a user's first and last event gets the value of
    the last event at or before that day's end (exact cents) — one keyed
    exchange + the interleaved-probe LOCF kernel."""
    from airbyte_destination_ray.pipelines.relational import (
        locf_resample_by_key,
    )

    return locf_resample_by_key(
        _events(sf_dir, columns=["user_id", "ts", "event_id", "value"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        value_col="value",
    )


def _q_events_hopping_distinct(sf_dir: str):
    """Hopping-window distinct users (60-min window, 15-min slide): each
    event expands to exactly 4 window starts (vectorized repeat), then
    the exact pair-dedup COUNT(DISTINCT) exchange per window — O(distinct
    pairs) shuffle, never O(rows × windows)."""
    import numpy as np
    import pyarrow as pa

    from airbyte_destination_ray.pipelines.relational import distinct_count_by

    STEP = 900_000_000  # 15 min in µs

    def expand(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"ts": batch.column("ts"), "user_id": batch.column("user_id")}
        )
        t = t.filter(t.column("user_id").combine_chunks().is_valid())
        ts = (
            t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        base = (ts // STEP) * STEP
        k = np.tile(np.arange(4, dtype=np.int64), len(ts))
        ws = np.repeat(base, 4) - k * STEP
        return pa.table(
            {
                "window_us": pa.array(ws),
                "user_id": pa.array(np.repeat(uid, 4), type=pa.int64()),
            }
        )

    ds = _events(sf_dir, columns=["ts", "user_id"]).map_batches(
        expand, batch_format="pyarrow", batch_size=None
    )
    return distinct_count_by(ds, key="window_us", distinct_col="user_id")


def _q_events_link_prediction(sf_dir: str):
    """Common-neighbor link prediction over the shared sparse interaction
    graph: non-edge pairs with ≥3 shared neighbors + exact integer score
    (canonical edges → center-keyed wedge expansion → pair-keyed fold
    with edge exclusion; see graph.common_neighbors_link_prediction)."""
    from airbyte_destination_ray.pipelines.graph import (
        common_neighbors_link_prediction,
    )

    import pyarrow as pa

    out = common_neighbors_link_prediction(
        _events(sf_dir, columns=["user_id", "event_id"]).map_batches(
            _interaction_edges_3000, batch_format="pyarrow", batch_size=None
        ),
        min_common=3,
    )
    # collect to a TYPED table: an all-empty Ray result loses its schema
    # through union/map_groups, and the driver compares column sets
    parts = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in out.iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "u": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
                "common_neighbors": pa.array([], type=pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def _q_events_moving_max(sf_dir: str):
    """Per-user 5-row moving maximum of event cents — the alerting window
    as segment-guarded shift-and-maximum passes."""
    from airbyte_destination_ray.pipelines.relational import moving_max_by_key

    return moving_max_by_key(
        _events(sf_dir, columns=["event_id", "user_id", "ts", "value"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        value_col="value",
        window_rows=5,
    )


def _q_events_moving_median(sf_dir: str):
    """Per-user 5-row moving MEDIAN of event values — robust rolling
    baseline; interpolation formula pinned bit-exact to quantile_cont."""
    from airbyte_destination_ray.pipelines.relational import (
        moving_median_by_key,
    )

    return moving_median_by_key(
        _events(sf_dir, columns=["event_id", "user_id", "ts", "value"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        value_col="value",
        window_rows=5,
    )


def _q_events_gini_by_type(sf_dir: str):
    """Per-type Gini coefficient of positive event cents — rank-weighted
    integer sums after one keyed exchange, single cast-then-divide."""
    from airbyte_destination_ray.pipelines.ops import gini_by_key

    return gini_by_key(
        _events(sf_dir, columns=["event_type", "event_id", "value"]),
        key="event_type",
        seq="event_id",
        value_col="value",
        out_col="gini",
    )


def _q_doc_frequency_spectrum(sf_dir: str):
    """Corpus frequency spectrum (hapax/Zipf profile): distinct-term count
    per occurrence frequency — top_terms-shaped exchange, aggregate-sized
    output."""
    from airbyte_destination_ray.pipelines.corpus import frequency_spectrum

    return frequency_spectrum(_documents(sf_dir, columns=["text"]))


def _q_events_type_dow_chi2(sf_dir: str):
    """Event-type × day-of-week contingency cells with expected counts and
    per-cell χ² contributions — combiner partials, one aggregate-sized
    final, fixed-expression float math."""
    from airbyte_destination_ray.pipelines.ops import contingency_cells

    return contingency_cells(
        _events(sf_dir, columns=["event_type", "ts"]),
        key_col="event_type",
        ts_col="ts",
    )


def _q_events_ks_drift(sf_dir: str):
    """Two-sample KS statistic between even- and odd-user event values —
    exact integer ECDF cross-products, single final division."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import ks_two_sample

    def prep(b: "pa.Table") -> "pa.Table":
        t = b.filter(b.column("user_id").combine_chunks().is_valid())
        return pa.table(
            {
                "value": t.column("value"),
                "grp": pc.equal(
                    pc.bit_wise_and(t.column("user_id"), 1), 0
                ),
            }
        )

    return ks_two_sample(
        _events(sf_dir, columns=["user_id", "value"]).map_batches(
            prep, batch_format="pyarrow", batch_size=None
        ),
        value_col="value",
        group_mask_col="grp",
    )


def _q_nation_trade_by_year(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q7_nation_trade_by_year

    return q7_nation_trade_by_year(sf_dir)


def _q_market_share_by_year(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q8_market_share_by_year

    return q8_market_share_by_year(sf_dir)


def _q_discount_revenue_q6(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q6_discount_revenue

    return q6_discount_revenue(sf_dir)


def _q_customer_order_histogram(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q13_customer_order_histogram

    return q13_customer_order_histogram(sf_dir)


def _q_small_qty_revenue_q17(sf_dir: str):
    from airbyte_destination_ray.pipelines.tpch import q17_small_qty_revenue

    return q17_small_qty_revenue(sf_dir)


def _q_substring_search(sf_dir: str):
    """pg_trgm-style substring search: documents sync into a lake, a
    byte-trigram index builds from the change feed, and
    LIKE '%fast merge%' resolves by posting-list intersection (bucket-
    pruned probes, AND fold, exact verify on the candidates' lake rows)
    — never a corpus scan.  Oracle = the plain LIKE scan."""
    import json as _json
    import os
    import shutil
    from pathlib import Path

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        substring_search,
        sync_trigram_index,
    )

    # dead-pid sweep + THIS pid rebuilt unconditionally (the docsidx
    # convention — a recycled pid must never serve a stale lake/index)
    for stale in Path("/tmp/adr_query").glob("trgm-*"):
        try:
            pid = int(stale.name.rsplit("-", 1)[1])
            os.kill(pid, 0)
        except (ValueError, ProcessLookupError):
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            pass
    tag = f"trgm-{Path(sf_dir).name}-{os.getpid()}"
    base = Path("/tmp/adr_query") / tag
    binlog, lake, idx = base / "binlog", base / "lake", base / "index"
    if not (binlog / "_binlog.json").exists():
        shutil.rmtree(base, ignore_errors=True)
        binlog.mkdir(parents=True)
        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        env = pa.table({
            "seq": t.column("doc_id").cast(pa.int64()),
            "epoch": pa.array(
                np.zeros(t.num_rows, dtype=np.int32)
            ),
            "op": pa.array(["U"] * t.num_rows),
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "ver": t.column("doc_id").cast(pa.int64()),
            "text": t.column("text"),
        })
        pq.write_table(env, binlog / "segment-e00000-0000.parquet")
        (binlog / "_binlog.json").write_text(_json.dumps(
            {"n_epochs": 1, "segments": ["segment-e00000-0000.parquet"]}
        ))
    run_cdc_sync(
        str(lake), str(binlog), table="docs", pk="doc_id", ver="ver",
        payload_columns=["doc_id", "ver", "text"], num_partitions=16,
        compute_digest=False,
    )
    sync_trigram_index(
        str(lake), "docs", idx, upto_epoch=0, num_buckets=64
    )
    return substring_search(str(lake), "docs", idx, "fast merge")


def _q_indexed_term_lookup(sf_dir: str):
    """Incrementally-maintained inverted index as a query: documents sync
    through 3 CDC epochs (base inserts, '... updated' rewrites for
    doc_id%5==0, deletes for doc_id%7==3), the index advances epoch by
    epoch from the change feed (old+new text → posting deltas), and the
    probe lookup reads ONLY the probed buckets, resolving
    last-writer-wins per (term, doc).  The deterministic epoch/update/
    delete assignment makes the final posting set SQL-expressible — the
    whole maintenance machinery is hash-checked."""
    import json as _json
    import os
    import shutil
    from pathlib import Path

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        lookup_term_docs,
        sync_text_index,
    )

    # pid-scoped scratch + dead-pid sweep (the incremental-dedup
    # convention): a recycled pid must never serve a stale lake/index,
    # so THIS pid's dir is rebuilt unconditionally
    for stale in Path("/tmp/adr_query").glob("docsidx-*"):
        try:
            pid = int(stale.name.rsplit("-", 1)[1])
            os.kill(pid, 0)
        except (ValueError, ProcessLookupError):
            shutil.rmtree(stale, ignore_errors=True)
        except PermissionError:
            pass
    tag = f"docsidx-{Path(sf_dir).name}-{os.getpid()}"
    base = Path("/tmp/adr_query") / tag
    binlog, lake, idx = base / "binlog", base / "lake", base / "index"

    shutil.rmtree(base, ignore_errors=True)
    binlog.mkdir(parents=True)
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = t.column("text")
    m = int(ids.max()) + 1
    e0 = ((ids * 3) // m).astype(np.int64)
    rows = {
        "seq": [], "epoch": [], "op": [],
        "doc_id": [], "ver": [], "text": [],
    }
    upd_text = pa.array(
        [
            (s + " updated") if s is not None else None
            for s in texts.to_pylist()
        ],
        type=pa.string(),
    )
    for i in range(len(ids)):
        d = int(ids[i])
        rows["seq"].append(d * 4)
        rows["epoch"].append(int(e0[i]))
        rows["op"].append("U")
        rows["doc_id"].append(d)
        rows["ver"].append(0)
        rows["text"].append(texts[i].as_py())
        if d % 5 == 0:
            rows["seq"].append(d * 4 + 1)
            rows["epoch"].append(min(int(e0[i]) + 1, 2))
            rows["op"].append("U")
            rows["doc_id"].append(d)
            rows["ver"].append(1)
            rows["text"].append(upd_text[i].as_py())
        if d % 7 == 3:
            rows["seq"].append(d * 4 + 2)
            rows["epoch"].append(2)
            rows["op"].append("D")
            rows["doc_id"].append(d)
            rows["ver"].append(2)
            rows["text"].append(None)
    env = pa.table(
        {
            "seq": pa.array(rows["seq"], type=pa.int64()),
            "epoch": pa.array(rows["epoch"], type=pa.int32()),
            "op": pa.array(rows["op"], type=pa.string()),
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "ver": pa.array(rows["ver"], type=pa.int64()),
            "text": pa.array(rows["text"], type=pa.string()),
        }
    )
    segments = []
    for e in range(3):
        chunk = env.filter(
            pa.compute.equal(env.column("epoch"), e)
        )
        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(chunk, binlog / name, compression="zstd")
        segments.append(name)
    with open(binlog / "_binlog.json", "w") as f:
        _json.dump(
            {
                "n_events": env.num_rows,
                "n_epochs": 3,
                "segments": segments,
            },
            f,
            sort_keys=True,
        )

    run_cdc_sync(
        str(lake),
        str(binlog),
        table="docs",
        pk="doc_id",
        ver="ver",
        payload_columns=["doc_id", "ver", "text"],
        num_partitions=8,
        compute_digest=False,
    )
    sync_text_index(
        str(lake), "docs", idx, upto_epoch=2, text_col="text", num_buckets=16
    )
    return lookup_term_docs(idx, ["updated", "join", "spark"])


def _q_events_range_window_sum(sf_dir: str):
    """Per-user 1-hour RANGE moving sum (SQL RANGE frame incl. peers) —
    interleaved-probe lower bounds, run-end upper bounds, prefix sums."""
    from airbyte_destination_ray.pipelines.relational import (
        range_window_sum_by_key,
    )

    return range_window_sum_by_key(
        _events(sf_dir, columns=["event_id", "user_id", "ts", "value"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        value_col="value",
        window_us=3_600_000_000,
    )


def _q_events_mannwhitney(sf_dir: str):
    """Mann-Whitney U / AUC between even- and odd-user event values —
    integer midrank cross-products over the shared two-sample count
    table, single division."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import mannwhitney_two_sample

    def prep(b: "pa.Table") -> "pa.Table":
        t = b.filter(b.column("user_id").combine_chunks().is_valid())
        return pa.table(
            {
                "value": t.column("value"),
                "grp": pc.equal(
                    pc.bit_wise_and(t.column("user_id"), 1), 0
                ),
            }
        )

    return mannwhitney_two_sample(
        _events(sf_dir, columns=["user_id", "value"]).map_batches(
            prep, batch_format="pyarrow", batch_size=None
        ),
        value_col="value",
        group_mask_col="grp",
    )


def _q_events_dwell_by_type(sf_dir: str):
    """Dwell-time attribution (LEAD gap credited to the current event's
    type) — one keyed exchange, segment-guarded shift, tiny per-type
    fold."""
    from airbyte_destination_ray.pipelines.relational import dwell_time_by_attr

    return dwell_time_by_attr(
        _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
        attr_col="event_type",
    )


def _q_dup_rate_by_source(sf_dir: str):
    """Duplication profile per source (docs, distinct contents, dup
    fraction) — hash-only fingerprint exchange, single-division rate."""
    from airbyte_destination_ray.pipelines.dedup import dup_rate_by_group

    return dup_rate_by_group(
        _documents(sf_dir, columns=["source", "text"]),
        group_col="source",
        text_col="text",
    )


def _q_gap_cv_by_user(sf_dir: str):
    """Inter-arrival regularity per user: coefficient of variation of the
    LAG gaps (sqrt(population variance)/mean from exact integer power
    sums) — bursty users score high, metronomic users near 0.  Gaps
    quantize to SECONDS first: µs gaps squared overflow int64
    (grouped_moments' 4-power envelope is far too tight for µs), while
    second-granularity s2 sums stay exact at any realistic span."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.relational import gap_rows

    gaps = gap_rows(
        _events(sf_dir, columns=["user_id", "ts", "event_id"]),
        key="user_id",
        ts_col="ts",
        seq="event_id",
    )

    def partial(b: "pa.Table") -> "pa.Table":
        from airbyte_destination_ray.functions.hashing import partition_ids

        v = pc.divide(b.column("gap_us"), 1_000_000)  # int64 // for ints
        g = (
            pa.table(
                {
                    "user_id": b.column("user_id"),
                    "_v": v,
                    "_v2": pc.multiply(v, v),
                }
            )
            .group_by("user_id")
            .aggregate([([], "count_all"), ("_v", "sum"), ("_v2", "sum")])
            .rename_columns(["user_id", "_n", "_s1", "_s2"])
        )
        g = pa.table(
            {
                "user_id": g.column("user_id"),
                "_n": g.column("_n").cast(pa.int64()),
                "_s1": g.column("_s1").cast(pa.int64()),
                "_s2": g.column("_s2").cast(pa.int64()),
            }
        )
        parts = partition_ids(g.column("user_id"), 32)
        return g.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: "pa.Table") -> "pa.Table":
        g = (
            group.drop_columns(["_part"])
            .group_by("user_id")
            .aggregate([("_n", "sum"), ("_s1", "sum"), ("_s2", "sum")])
        )
        n = g.column("_n_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s1 = g.column("_s1_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        s2 = g.column("_s2_sum").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1 / n
            e2 = s2 / n
            c = np.sqrt(e2 - mean * mean) / mean
        ok = mean > 0
        return pa.table(
            {
                "user_id": g.column("user_id"),
                "n_gaps": g.column("_n_sum").cast(pa.int64()),
                "cv": pa.array(c, type=pa.float64(), mask=~ok),
            }
        )

    return (
        gaps.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def _q_user_growth_curve(sf_dir: str):
    """Cumulative user acquisition curve: each user's FIRST event day
    (partition-level grouped min), new-user counts per day
    (aggregate-sized), and the running total in one final task."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.ops import grouped_min

    def prep(b: "pa.Table") -> "pa.Table":
        t = b.filter(
            pc.and_(
                b.column("user_id").combine_chunks().is_valid(),
                b.column("ts").combine_chunks().is_valid(),
            )
        )
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()), 86_400_000_000)
        return pa.table({"user_id": t.column("user_id"), "_day": day})

    first = grouped_min(
        _events(sf_dir, columns=["user_id", "ts"]).map_batches(
            prep, batch_format="pyarrow", batch_size=None
        ),
        key="user_id",
        value_col="_day",
        out_col="first_day",
    )

    def day_counts(b: "pa.Table") -> "pa.Table":
        g = (
            b.select(["first_day"])
            .group_by("first_day")
            .aggregate([([], "count_all")])
            .rename_columns(["first_day", "_n"])
        )
        return g.set_column(1, "_n", g.column("_n").cast(pa.int64()))

    def final(batch: "pa.Table") -> "pa.Table":
        g = (
            batch.group_by("first_day")
            .aggregate([("_n", "sum")])
            .rename_columns(["first_day", "_n"])
        )
        g = g.take(
            pc.sort_indices(g, sort_keys=[("first_day", "ascending")])
        )
        n = g.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "day": pa.array(
                    g.column("first_day")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    * 86_400_000_000,
                    type=pa.int64(),
                ).cast(pa.timestamp("us")),
                "new_users": pa.array(n, type=pa.int64()),
                "cum_users": pa.array(np.cumsum(n), type=pa.int64()),
            }
        )

    return (
        first.map_batches(day_counts, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _q_top_terms_by_source(sf_dir: str):
    """Per-source top-5 vocabulary — (group, term) exchange with a valid
    partition-local top-k prune, deterministic (n DESC, term ASC) ties."""
    from airbyte_destination_ray.pipelines.corpus import top_terms_by_group

    return top_terms_by_group(
        _documents(sf_dir, columns=["source", "text"]),
        group_col="source",
        text_col="text",
        k=5,
    )


def _q_lang_mix_by_source(sf_dir: str):
    """Language mix per source as a wide pivot (one count column per
    language) — the corpus-composition dashboard view."""
    from airbyte_destination_ray.pipelines.ops import pivot_counts

    return pivot_counts(
        _documents(sf_dir, columns=["source", "lang"]),
        row_key="source",
        col_key="lang",
        col_values=["de", "en", "es", "fr", "zh"],
    )


def _q_events_value_share(sf_dir: str):
    """Each event type's share of total positive cents — per-batch
    combiner to ≤types rows, one tiny fold, single IEEE division per
    type."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b: "pa.Table") -> "pa.Table":
        cents = pc.cast(
            pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
        )
        t = pa.table({"event_type": b.column("event_type"), "_c": cents})
        keep = pc.and_(
            t.column("event_type").combine_chunks().is_valid(),
            pc.fill_null(pc.greater(t.column("_c"), 0), False),
        )
        return (
            t.filter(keep)
            .group_by("event_type")
            .aggregate([("_c", "sum")])
            .rename_columns(["event_type", "_c"])
        )

    def final(batch: "pa.Table") -> "pa.Table":
        g = (
            batch.group_by("event_type")
            .aggregate([("_c", "sum")])
            .rename_columns(["event_type", "_c"])
        )
        c = g.column("_c").to_numpy(zero_copy_only=False).astype(np.int64)
        total = float(c.sum())
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "cents": pa.array(c, type=pa.int64()),
                "share": pa.array(
                    c.astype(np.float64) / total, type=pa.float64()
                ),
            }
        )

    return (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def _q_order_value_quartiles_by_status(sf_dir: str):
    """Order-value quartiles per order status — exact discrete quantiles
    with the rank-rule-exact spelled-out oracle."""
    from airbyte_destination_ray.pipelines.ops import grouped_quantiles_disc
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    return grouped_quantiles_disc(
        read_parquet_sized(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderstatus", "o_totalprice"],
        ),
        key="o_orderstatus",
        value_col="o_totalprice",
        quantiles=(0.25, 0.5, 0.75),
    )


def queries() -> dict[str, Callable[[str], Any]]:
    # Dict ORDER matters: the driver's correctness gate checks only the
    # FIRST 50 entries per round.  Round-5 window = the CDC sentinel +
    # pack_documents_2048 (r4 FAIL was an oracle-side HUGEINT typing bug,
    # fixed; needs a fresh green row) + dedup_simhash_documents (gained an
    # oracle this round) + the first 47 queries with no driver row across
    # CORRECTNESS_r01-r04.  The remaining 35 never-checked queries sit
    # directly below for the round-6 rotation; entries after those already
    # have a green driver row from earlier rounds.
    return {
        # --- round-5 driver window (first 50) ---
        "cdc_sync_events_full": _q_cdc_sync_events_full,
        "pack_documents_2048": _q_pack_documents,
        "dedup_simhash_documents": _q_dedup_simhash,
        "cdc_merge_apply": _q_cdc_merge_apply,
        "cdc_repartition": _q_cdc_repartition,
        "indexed_value_lookup": _q_indexed_value_lookup,
        "multimodal_image_tiles_exact": _q_multimodal_image_tiles_exact,
        "multimodal_video_sample_exact": _q_multimodal_video_sample_exact,
        "target_encode_user_value": _q_target_encode_user,
        "events_link_prediction": _q_events_link_prediction,
        "events_hopping_distinct_users": _q_events_hopping_distinct,
        "events_locf_daily": _q_events_locf_daily,
        "profit_by_nation_year_q9": _q_profit_by_nation_year_q9,
        "late_shipments_by_flag_q12": _q_late_shipments_by_flag_q12,
        "special_revenue_q19": _q_special_revenue_q19,
        "idle_customer_balance_q22": _q_idle_customer_balance_q22,
        "top_supplier_q15": _q_top_supplier_q15,
        "min_cost_supplier_q2": _q_min_cost_supplier_q2,
        "important_parts_q11": _q_important_parts_q11,
        "waiting_suppliers_q21": _q_waiting_suppliers_q21,
        "excess_suppliers_q20": _q_excess_suppliers_q20,
        "embedding_radius_pairs": _q_embedding_radius_pairs,
        "events_reciprocal_edges": _q_events_reciprocal_edges,
        "ttr_by_source": _q_ttr_by_source,
        "events_cume_dist": _q_events_cume_dist,
        "page_change_rate_by_host": _q_page_change_rate_by_host,
        "session_size_histogram": _q_session_size_histogram,
        "events_wow_growth": _q_events_wow_growth,
        "trending_types_hourly": _q_trending_types_hourly,
        "events_moving_median": _q_events_moving_median,
        "indexed_term_lookup": _q_indexed_term_lookup,
        "events_range_window_sum": _q_events_range_window_sum,
        "events_mannwhitney_drift": _q_events_mannwhitney,
        "events_clustering_coef": _q_events_clustering_coef,
        "cdc_range_scan": _q_cdc_range_scan,
        "repeated_spans_documents": _q_repeated_spans_documents,
        "trim_repeated_spans_documents": _q_trim_repeated_spans_documents,
        "budget_mixture_sample": _q_budget_mixture_sample,
        "events_quarantine": _q_events_quarantine,
        "events_global_rank": _q_events_global_rank,
        "events_triangle_counts": _q_events_triangles,
        "wap_rebuild_cdc": _q_wap_rebuild_cdc,
        "copartitioned_join_cdc": _q_copartitioned_join_cdc,
        "cdc_expectations_quarantine": _q_cdc_expectations_quarantine,
        "large_volume_orders_top100": _q_large_volume_orders,
        "winsorize_event_values": _q_winsorize_event_values,
        "corpus_mixture_stats": _q_corpus_mixture_stats,
        "throttle_events": _q_throttle_events,
        "doc_oov_bigram_fraction": _q_doc_oov_fraction,
        "embedding_covariance": _q_embedding_covariance,
        # --- round-6 rotation: never-checked queries (35 from r5 + the
        #     6 new r5-session queries appended after them = 41) ---
        "stratified_sample_docs": _q_stratified_sample_docs,
        "consistent_snapshot_cdc": _q_consistent_snapshot_cdc,
        "events_trend_by_type": _q_events_trend_by_type,
        "asof_click_within_1h": _q_asof_click_within_1h,
        "returned_item_top_customers": _q_returned_item_top_customers,
        "median_gap_by_user": _q_median_gap_by_user,
        "events_ntile_quartiles": _q_events_ntile,
        "event_type_lift": _q_event_type_lift,
        "events_max_concurrency": _q_events_max_concurrency,
        "events_trimmed_mean": _q_events_trimmed_mean,
        "events_skyline": _q_events_skyline,
        "events_degree_histogram": _q_events_degree_histogram,
        "promo_revenue_ratio": _q_promo_revenue_ratio,
        "suppliers_per_brand": _q_suppliers_per_brand,
        "dedup_lines_within_docs": _q_dedup_lines_within_docs,
        "events_hhi_by_type": _q_events_hhi_by_type,
        "source_quality_gate_docs": _q_source_quality_gate,
        "user_longest_streak": _q_user_longest_streak,
        "events_transition_matrix": _q_events_transition_matrix,
        "events_interval_coverage": _q_events_interval_coverage,
        "events_resample_hourly": _q_events_resample_hourly,
        "wmedian_price_by_flag": _q_wmedian_price_by_flag,
        "explode_doc_words": _q_explode_doc_words,
        "events_iqr_outliers": _q_events_iqr_outliers,
        "events_dwell_by_type": _q_events_dwell_by_type,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "gap_cv_by_user": _q_gap_cv_by_user,
        "user_growth_curve": _q_user_growth_curve,
        "top_terms_by_source": _q_top_terms_by_source,
        "lang_mix_by_source": _q_lang_mix_by_source,
        "events_value_share_by_type": _q_events_value_share,
        "order_value_quartiles_by_status": _q_order_value_quartiles_by_status,
        "similar_doc_pairs": _q_similar_doc_pairs,
        "doc_dup_window_stats": _q_doc_dup_window_stats,
        "incremental_join_view_events": _q_incremental_join_view,
        "cdc_rollback": _q_cdc_rollback,
        "cdc_clone_branch": _q_cdc_clone_branch,
        "doc_lm_score": _q_doc_lm_score,
        "cooccurrence_pmi": _q_cooccurrence_pmi,
        "cdc_state_agg": _q_cdc_state_agg,
        "split_assign_documents": _q_split_assign,
        "excise_duplicate_spans": _q_excise_duplicate_spans,
        "cdc_column_audit": _q_cdc_column_audit,
        "cdc_quantile_view": _q_cdc_quantile_view,
        "dedup_minhash_incremental_documents": _q_dedup_minhash_incremental,
        "events_reachable_3hop": _q_events_reachable_3hop,
        "cdc_gap_audit": _q_cdc_gap_audit,
        "cdc_quantile_view_merge": _q_cdc_quantile_view_merge,
        "tokenize_ids_documents": _q_tokenize_ids,
        "substring_search_documents": _q_substring_search,
        "corpus_report_documents": _q_corpus_report,
        "customer_rfm_segments": _q_customer_rfm,
        # --- driver-green in r01/r02/r03/r04 ---
        "events_cube_type_day": _q_events_cube_type_day,
        "embeddings_kmeans_sizes": _q_embeddings_kmeans_sizes,
        "users_snapshot_diff": _q_users_snapshot_diff,
        "events_user_zscore": _q_events_user_zscore,
        "multimodal_audio_dedup": _q_multimodal_audio_dedup,
        "cdc_partial_updates_users": _q_cdc_partial_updates,
        "events_scd2_enrich": _q_events_scd2_enrich,
        "events_moments_by_type": _q_events_moments_by_type,
        "events_type_paths": _q_events_type_paths,
        "doc_top_terms_tfidf": _q_doc_top_terms,
        "events_profile": _q_events_profile,
        "cdc_time_travel": _q_cdc_time_travel,
        "cdc_gdpr_delete": _q_cdc_gdpr_delete,
        "cdc_change_feed": _q_cdc_change_feed,
        "events_running_distinct": _q_events_running_distinct,
        "asof_next_click_after_purchase": _q_asof_next_click,
        "events_pagerank": _q_events_pagerank,
        "click_purchase_window_join": _q_click_purchase_window_join,
        "lineitem_unpivot_measures": _q_lineitem_unpivot,
        "events_ohlc_hourly": _q_events_ohlc,
        "dedup_normalized_keep_longest": _q_dedup_keep_longest,
        "incremental_sessions_users": _q_incremental_sessions,
        "top_bigrams_documents": _q_top_bigrams,
        "incremental_agg_user_totals": _q_incremental_agg,
        "lineitem_fk_orphans": _q_lineitem_fk_orphans,
        "benford_extendedprice": _q_benford_extendedprice,
        "events_minmax_by_type": _q_events_minmax_by_type,
        "first_touch_attribution": _q_first_touch_attribution,
        "clicks_unconverted_1h": _q_clicks_unconverted_1h,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "events_hourly_autocorr": _q_events_hourly_autocorr,
        "priority_late_orders": _q_priority_late_orders,
        "events_spearman_by_user": _q_events_spearman_by_user,
        "events_daily_delta": _q_events_daily_delta,
        "cdc_txn_two_tables": _q_cdc_txn_two_tables,
        "token_quantiles_by_source": _q_token_quantiles_by_source,
        "events_k_core": _q_events_k_core,
        "events_assortativity": _q_events_assortativity,
        "events_moving_max_by_user": _q_events_moving_max,
        "events_gini_by_type": _q_events_gini_by_type,
        "doc_frequency_spectrum": _q_doc_frequency_spectrum,
        "events_type_dow_chi2": _q_events_type_dow_chi2,
        "events_ks_drift": _q_events_ks_drift,
        "nation_trade_by_year": _q_nation_trade_by_year,
        "market_share_by_year": _q_market_share_by_year,
        "discount_revenue_q6": _q_discount_revenue_q6,
        "customer_order_histogram": _q_customer_order_histogram,
        "small_qty_revenue_q17": _q_small_qty_revenue_q17,
        "multimodal_image_stats_exact": _q_multimodal_image_stats_exact,
        "multimodal_audio_stats_exact": _q_multimodal_audio_stats_exact,
        "multimodal_video_stats_exact": _q_multimodal_video_stats_exact,
        "cap_docs_per_lang": _q_cap_docs_per_lang,
        "weighted_mixture_sample": _q_weighted_mixture_sample,
        "canonicalize_urls_events": _q_canonicalize_urls,
        "cap_pages_per_host": _q_cap_pages_per_host,
        "remove_boilerplate_documents": _q_remove_boilerplate,
        "dedup_segments_documents": _q_dedup_segments_documents,
        "top_terms_documents": _q_top_terms_documents,
        "chunk_documents": _q_chunk_documents,
        "webtext_pipeline_documents": _q_webtext_pipeline,
        "filter_docs_above_median": _q_filter_docs_above_median,
        "users_click_purchase_full_join": _q_users_click_purchase_full_join,
        "events_corr_value_hour": _q_events_corr_value_hour,
        "events_user_gaps": _q_events_user_gaps,
        "events_rollup_type_day": _q_events_rollup_type_day,
        "events_pivot_daily": _q_events_pivot_daily,
        "decontaminate_documents": _q_decontaminate_documents,
        "shipping_priority_top10": _q_shipping_priority,
        "events_props_stats": _q_events_props_stats,
        "late_ship_orders_except_finished": _q_late_ship_orders_except_finished,
        "users_clicked_and_purchased": _q_users_clicked_and_purchased,
        "top2_days_dense_rank": _q_top2_days_dense_rank,
        "embeddings_cluster_assign": _q_embeddings_cluster_assign,
        "local_supplier_volume": _q_local_supplier_volume,
        "campaign_event_stats": _q_campaign_event_stats,
        "events_moving_sum_by_user": _q_events_moving_sum,
        "events_value_zscore": _q_events_value_zscore,
        "doc_near_dup_components": _q_doc_near_dup_components,
        "semdedup_embeddings": _q_semdedup_embeddings,
        "scd2_user_history": _q_scd2_user_history,
        "frequent_users_exact": _q_frequent_users_exact,
        "normalize_text_documents": _q_normalize_text,
        "fuzzy_vocab_pairs": _q_fuzzy_vocab_pairs,
        "urgent_orders_bloom_join": _q_urgent_orders_bloom_join,
        "lookup_users_cdc": _q_lookup_users_cdc,
        "events_late_arrivals": _q_events_late_arrivals,
        "multimodal_phash_dedup": _q_multimodal_phash_dedup,
        "bucket_docs_quartiles": _q_bucket_docs_quartiles,
        "events_funnel": _q_events_funnel,
        "events_cohort_retention": _q_events_cohort_retention,
        "inverted_index_lookup": _q_inverted_index_lookup,
        "cdc_schema_evolution": _q_cdc_schema_evolution,
        "backfill_roundtrip_cdc": _q_backfill_roundtrip_cdc,
        "exact_median_event_value": _q_exact_median_event_value,
        "events_mode_by_user": _q_events_mode_by_user,
        "events_percent_rank": _q_events_percent_rank,
        "events_mad_by_type": _q_events_mad_by_type,
        "cdc_lww_latest_by_user": _q_cdc_lww_latest,
        "cdc_lww_latest_salted": _q_cdc_lww_salted,
        "cdc_lww_tombstones": _q_cdc_lww_tombstones,
        "dedup_exact_documents": _q_dedup_exact_documents,
        "dedup_exact_hash_documents": _q_dedup_exact_hash,
        "dedup_exact_incremental_documents": _q_dedup_exact_incremental,
        "dedup_minhash_documents": _q_dedup_minhash,
        "dedup_ngram_jaccard_documents": _q_dedup_ngram_jaccard,
        "dedup_jaccard_exact_documents": _q_dedup_jaccard_exact,
        "dedup_embedding_cosine": _q_dedup_embedding,
        "knn_cosine_topk": _q_knn_brute_force,
        "knn_lsh_topk": _q_knn_lsh,
        "knn_ivf_topk": _q_knn_ivf,
        "text_stats_documents": _q_text_stats,
        "repetition_stats_documents": _q_repetition_stats,
        "redact_pii_documents": _q_redact_pii,
        "annotate_documents": _q_annotate_documents,
        "events_stats_by_type": _q_events_stats_by_type,
        "events_daily_counts": _q_events_daily_counts,
        "top_events_by_value": _q_top_events_by_value,
        "quality_filter_documents": _q_quality_filter_documents,
        "extract_html_text_documents": _q_extract_html_text,
        "domain_stats_events": _q_domain_stats,
        "multimodal_image_decode": _q_multimodal_image_decode,
        "multimodal_audio_features": _q_multimodal_audio_features,
        "multimodal_video_frames": _q_multimodal_video_frames,
        "lineage_events_cdc": _q_lineage_events_cdc,
        "lineage_epoch_totals": _q_lineage_epoch_totals,
        "orders_customer_broadcast_join": _q_orders_customer_join,
        "sales_by_nation": _q_sales_by_nation,
        "orders_lineitem_shuffle_join": _q_orders_lineitem_shuffle_join,
        "orders_lineitem_left_join": _q_orders_lineitem_left_join,
        "asof_click_before_purchase": _q_asof_click_before_purchase,
        "events_hourly_by_type": _q_events_hourly_by_type,
        "events_sliding_hourly": _q_events_sliding_hourly,
        "sessionize_events": _q_sessionize_events,
        "events_running_sum_by_user": _q_events_running_sum,
        "events_distinct_users_by_type": _q_events_distinct_users,
        "pricing_summary_lineitem": _q_pricing_summary,
        "events_value_quantiles_by_type": _q_events_value_quantiles,
        "events_value_quantiles_approx": _q_events_quantiles_approx,
        "distinct_lang_source_documents": _q_distinct_lang_source,
        "orders_semi_join_building": _q_orders_semi_join,
        "orders_anti_join_building": _q_orders_anti_join,
        "sample_events_hash": _q_sample_events_hash,
        "top3_events_per_user": _q_top3_events_per_user,
        "events_value_histogram": _q_events_value_histogram,
        "events_distinct_users_approx": _q_events_distinct_users_approx,
    }


_LWW_TOMBSTONE_SQL = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        AND event_type <> 'error'
"""


def oracle_sql() -> dict[str, str]:
    sql = {
        "cdc_partial_updates_users": """
            WITH p AS (
                SELECT user_id, ts, event_id,
                    CASE WHEN event_id % 4 <> 0 THEN value END AS value,
                    CASE WHEN event_id % 2 = 0 THEN event_type END
                        AS event_type
                FROM events WHERE user_id IS NOT NULL
            )
            SELECT DISTINCT user_id,
                last_value(value IGNORE NULLS) OVER w AS value,
                last_value(event_type IGNORE NULLS) OVER w AS event_type,
                last_value(ts) OVER w AS ts,
                last_value(event_id) OVER w AS event_id
            FROM p WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """,
        "events_scd2_enrich": """
            WITH h AS (
                SELECT user_id, value, ts AS valid_from,
                       lead(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS valid_to
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                QUALIFY event_type <> 'error'
            )
            SELECT f.event_id, f.ts, f.user_id, h.value AS value_dim
            FROM events f LEFT JOIN h
              ON f.user_id = h.user_id AND f.ts >= h.valid_from
             AND (h.valid_to IS NULL OR f.ts < h.valid_to)
            WHERE f.event_type = 'purchase'
        """,
        "events_moments_by_type": """
            WITH c AS (
                SELECT event_type AS k, CAST(floor(value) AS BIGINT) AS v
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ), a AS (
                SELECT k, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(v) AS BIGINT) AS s1,
                       CAST(sum(v*v) AS BIGINT) AS s2,
                       CAST(sum(v*v*v) AS BIGINT) AS s3,
                       CAST(sum(v*v*v*v) AS BIGINT) AS s4
                FROM c GROUP BY k
            ), m AS (
                SELECT k, n, CAST(s1 AS DOUBLE)/n AS mean,
                       CAST(s2 AS DOUBLE)/n AS e2,
                       CAST(s3 AS DOUBLE)/n AS e3,
                       CAST(s4 AS DOUBLE)/n AS e4
                FROM a
            )
            SELECT k AS event_type, n, mean,
                e2 - mean*mean AS var_pop,
                (e3 - 3.0*mean*e2 + 2.0*mean*mean*mean)
                    / ((e2 - mean*mean) * sqrt(e2 - mean*mean)) AS skew_pop,
                (e4 - 4.0*mean*e3 + 6.0*mean*mean*e2
                    - 3.0*mean*mean*mean*mean)
                    / ((e2 - mean*mean) * (e2 - mean*mean)) AS kurt_pop
            FROM m
        """,
        "events_type_paths": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id)
                       AS type_path
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id
        """,
        "doc_top_terms_tfidf": """
            WITH tok AS (
                SELECT doc_id, unnest(string_split_regex(
                    lower(text), '[^a-z0-9]+')) AS term
                FROM documents WHERE text IS NOT NULL
            ), tf AS (
                SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                FROM tok WHERE term <> '' GROUP BY doc_id, term
            ), df AS (
                SELECT term, CAST(count(*) AS BIGINT) AS df
                FROM tf GROUP BY term
            )
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(tf.tf AS DOUBLE) / df.df AS score,
                   CAST(row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
                   ) AS BIGINT) AS rank
            FROM tf JOIN df USING (term)
            QUALIFY rank <= 5
        """,
        "pack_documents_2048": """
            WITH t AS (
                SELECT doc_id,
                    CAST(length(list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '')) AS BIGINT) AS n_tokens
                FROM documents WHERE text IS NOT NULL
            )
            SELECT doc_id, n_tokens,
                -- CAST: DuckDB's windowed SUM(BIGINT) yields HUGEINT and
                -- `//` keeps it; the driver hashes HUGEINT through pandas
                -- as float64 -> hash mismatch (r4 FAIL).  Same trap as the
                -- r3 list_sum fix; tests/test_oracle_types.py now guards
                -- every oracle's output types mechanically.
                CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) // 2048 AS BIGINT) AS pack_id
            FROM t
        """,
        "cdc_time_travel": """
            WITH sub AS (
                SELECT * FROM events
                WHERE (event_id * 3) //
                    (SELECT max(event_id) + 1 FROM events) <= 1
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM sub
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error'
        """,
        "cdc_gdpr_delete": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error'
                AND user_id NOT IN (1, 2, 3, 5, 8, 13, 21)
        """,
        # RFM segmentation: quartile bounds via quantile_disc (actual
        # elements — exact_quantile_disc parity is test-pinned), bucket
        # = number of bounds strictly below the value.
        "customer_rfm_segments": """
            WITH a AS (
                SELECT o_custkey,
                       max(epoch_us(o_orderdate) // 86400000000) AS r,
                       CAST(count(*) AS BIGINT) AS f,
                       CAST(sum(CAST(floor(o_totalprice * 100)
                           AS BIGINT)) AS BIGINT) AS m
                FROM orders GROUP BY o_custkey
            ), b AS (
                SELECT quantile_disc(r, 0.25) AS r1,
                       quantile_disc(r, 0.50) AS r2,
                       quantile_disc(r, 0.75) AS r3,
                       quantile_disc(f, 0.25) AS f1,
                       quantile_disc(f, 0.50) AS f2,
                       quantile_disc(f, 0.75) AS f3,
                       quantile_disc(m, 0.25) AS m1,
                       quantile_disc(m, 0.50) AS m2,
                       quantile_disc(m, 0.75) AS m3
                FROM a
            )
            SELECT CAST(CASE WHEN r > r1 THEN 1 ELSE 0 END
                      + CASE WHEN r > r2 THEN 1 ELSE 0 END
                      + CASE WHEN r > r3 THEN 1 ELSE 0 END AS BIGINT)
                       AS r_bucket,
                   CAST(CASE WHEN f > f1 THEN 1 ELSE 0 END
                      + CASE WHEN f > f2 THEN 1 ELSE 0 END
                      + CASE WHEN f > f3 THEN 1 ELSE 0 END AS BIGINT)
                       AS f_bucket,
                   CAST(CASE WHEN m > m1 THEN 1 ELSE 0 END
                      + CASE WHEN m > m2 THEN 1 ELSE 0 END
                      + CASE WHEN m > m3 THEN 1 ELSE 0 END AS BIGINT)
                       AS m_bucket,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM a, b
            GROUP BY r_bucket, f_bucket, m_bucket
        """,
        # Dataset-card summary: token rule == the corpus tokenizer.
        "corpus_report_documents": """
            WITH l AS (
                SELECT doc_id, text, lang, source,
                       CASE WHEN text IS NULL THEN 0 ELSE length(text)
                       END AS chars,
                       CASE WHEN text IS NULL THEN 0 ELSE
                           len(list_filter(string_split_regex(
                               lower(text), '[^a-z0-9]+'),
                               x -> x <> ''))
                       END AS toks
                FROM documents
            )
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(text) AS BIGINT) AS n_with_text,
                   CAST(sum(chars) AS BIGINT) AS total_chars,
                   CAST(sum(toks) AS BIGINT) AS total_tokens,
                   CAST(count(DISTINCT lang) AS BIGINT)
                       AS distinct_langs,
                   CAST(count(DISTINCT source) AS BIGINT)
                       AS distinct_sources
            FROM l
        """,
        # Trigram-index substring search == the plain LIKE scan (trigram
        # prefiltering is complete; verify is exact).
        "substring_search_documents": """
            SELECT doc_id FROM documents
            WHERE lower(text) LIKE '%fast merge%'
        """,
        # Tokenizer apply: id = frequency rank (count DESC, term ASC),
        # OOV -> 0; checksum = sum of 1-based position * id.
        "tokenize_ids_documents": """
            WITH l AS (
                SELECT doc_id, list_filter(string_split_regex(
                    lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ), tokocc AS (
                SELECT unnest(toks) AS tok FROM l
            ), c1 AS (
                SELECT tok, count(*) AS c FROM tokocc GROUP BY tok
            ), vocab AS (
                SELECT tok, CAST(row_number() OVER (
                    ORDER BY c DESC, tok) AS BIGINT) AS tid
                FROM c1
                QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 20
            ), tok AS (
                SELECT doc_id,
                    unnest(generate_series(1, len(toks))) AS pos, toks
                FROM l
            ), j AS (
                SELECT t.doc_id, t.pos, COALESCE(v.tid, 0) AS tid,
                       CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END AS oov
                FROM tok t LEFT JOIN vocab v ON v.tok = t.toks[t.pos]
            ), agg AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(sum(oov) AS BIGINT) AS n_oov,
                       CAST(sum(pos * tid) AS BIGINT) AS ids_checksum
                FROM j GROUP BY doc_id
            )
            SELECT l.doc_id,
                   COALESCE(agg.n_tokens, 0) AS n_tokens,
                   COALESCE(agg.n_oov, 0) AS n_oov,
                   COALESCE(agg.ids_checksum, 0) AS ids_checksum
            FROM l LEFT JOIN agg ON agg.doc_id = l.doc_id
        """,
        # Cross-doc exact substring dedup, keep-first: duplicated
        # 20-token windows excised from every non-canonical occurrence;
        # canonical = min(doc_id*2^20 + pos) = lexicographic (doc, pos).
        "excise_duplicate_spans": """
            WITH l AS (
                SELECT doc_id, list_filter(string_split_regex(
                    lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ), occ AS (
                SELECT doc_id, unnest(generate_series(
                    1, greatest(len(toks) - 19, 0))) AS start, toks
                FROM l
            ), gg AS (
                SELECT doc_id, start,
                       array_to_string(
                           list_slice(toks, start, start + 19), ' ')
                           AS gram
                FROM occ
            ), cstat AS (
                SELECT gram, count(*) AS c,
                       min(doc_id * 1048576 + start) AS mkey
                FROM gg GROUP BY gram
            ), dup AS (
                SELECT gg.doc_id, gg.start
                FROM gg JOIN cstat USING (gram)
                WHERE cstat.c >= 2
                  AND gg.doc_id * 1048576 + gg.start <> cstat.mkey
            ), cov AS (
                SELECT DISTINCT doc_id,
                    unnest(generate_series(start, start + 19)) AS pos
                FROM dup
            ), tok AS (
                SELECT doc_id,
                    unnest(generate_series(1, len(toks))) AS pos, toks
                FROM l
            ), kept AS (
                SELECT t.doc_id, t.pos, t.toks[t.pos] AS tok
                FROM tok t LEFT JOIN cov c
                  ON c.doc_id = t.doc_id AND c.pos = t.pos
                WHERE c.pos IS NULL
            ), agg AS (
                SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY pos) AS text_clean,
                       CAST(count(*) AS BIGINT) AS n_kept
                FROM kept GROUP BY doc_id
            )
            SELECT l.doc_id,
                   COALESCE(agg.text_clean, '') AS text_clean,
                   CAST(len(l.toks) AS BIGINT) AS n_tokens,
                   CAST(len(l.toks) - COALESCE(agg.n_kept, 0) AS BIGINT)
                       AS n_removed
            FROM l LEFT JOIN agg ON agg.doc_id = l.doc_id
        """,
        # Knuth multiplicative-hash split assignment: uint64 wraparound in
        # the engine equals the SQL BIGINT product mod 2^32 exactly
        # (2^32 | 2^64); thresholds floor(0.8*2^32), floor(0.9*2^32).
        "split_assign_documents": """
            SELECT source,
                   CASE WHEN (doc_id * 2654435761) % 4294967296
                             < 3435973836 THEN 'train'
                        WHEN (doc_id * 2654435761) % 4294967296
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(COALESCE(sum(n_chars), 0) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY source, split
        """,
        # Federated merge of two maintained views == the same one-shot
        # quantile_cont (mergeable-digest contract).
        "cdc_quantile_view_merge": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        """,
        # Maintained quantile view: exact-until-compression digest state
        # folded across epochs == one-shot quantile_cont at driver SF.
        "cdc_quantile_view": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        """,
        # Column-level CDC audit: FULL JOIN of consecutive as-of LWW
        # snapshots (null-pk rows excluded — they have no diff identity);
        # U rows are net-change keys, changed_<col> counts IS DISTINCT
        # FROM over them.
        "cdc_column_audit": """
            WITH base AS (
                SELECT *, (event_id * 3) //
                    (SELECT max(event_id) + 1 FROM events) AS ep
                FROM events WHERE user_id IS NOT NULL
            ), states AS (
                SELECT bound.e AS asof, user_id, ts, event_type, value
                FROM (VALUES (-1), (0), (1), (2)) bound(e)
                CROSS JOIN base b
                WHERE b.ep <= bound.e
                QUALIFY row_number() OVER (
                    PARTITION BY bound.e, user_id
                    ORDER BY ts DESC, event_id DESC) = 1
                    AND event_type <> 'error'
            ), d AS (
                SELECT COALESCE(n.asof, o.asof + 1) AS epoch,
                       o.user_id AS ou, n.user_id AS nu,
                       o.ts AS ots, n.ts AS nts,
                       o.event_type AS oet, n.event_type AS net,
                       o.value AS ov, n.value AS nv
                FROM states o FULL JOIN states n
                  ON o.user_id = n.user_id AND o.asof = n.asof - 1
                WHERE COALESCE(n.asof, o.asof + 1) BETWEEN 0 AND 2
            )
            SELECT CAST(epoch AS BIGINT) AS epoch,
                CAST(count(*) FILTER (WHERE ou IS NULL) AS BIGINT)
                    AS n_insert,
                CAST(count(*) FILTER (WHERE ou IS NOT NULL
                    AND nu IS NOT NULL AND (ots IS DISTINCT FROM nts
                    OR oet IS DISTINCT FROM net
                    OR ov IS DISTINCT FROM nv)) AS BIGINT) AS n_update,
                CAST(count(*) FILTER (WHERE nu IS NULL) AS BIGINT)
                    AS n_delete,
                CAST(count(*) FILTER (WHERE ou IS NOT NULL
                    AND nu IS NOT NULL AND (ots IS DISTINCT FROM nts
                    OR oet IS DISTINCT FROM net OR ov IS DISTINCT FROM nv)
                    AND ots IS DISTINCT FROM nts) AS BIGINT)
                    AS changed_ts,
                CAST(count(*) FILTER (WHERE ou IS NOT NULL
                    AND nu IS NOT NULL AND (ots IS DISTINCT FROM nts
                    OR oet IS DISTINCT FROM net OR ov IS DISTINCT FROM nv)
                    AND oet IS DISTINCT FROM net) AS BIGINT)
                    AS changed_event_type,
                CAST(count(*) FILTER (WHERE ou IS NOT NULL
                    AND nu IS NOT NULL AND (ots IS DISTINCT FROM nts
                    OR oet IS DISTINCT FROM net OR ov IS DISTINCT FROM nv)
                    AND ov IS DISTINCT FROM nv) AS BIGINT)
                    AS changed_value
            FROM d GROUP BY epoch
        """,
        # Retractable state aggregate: the maintained view must equal the
        # one-shot GROUP BY over the final LWW snapshot (tombstone
        # winners excluded; null groups excluded; null values count in n
        # but not sum_cents).
        "cdc_state_agg": """
            WITH w AS (
                SELECT event_type, value FROM events
                QUALIFY row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) = 1
                    AND event_type <> 'error'
            )
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(COALESCE(sum(
                       CAST(floor(value * 100) AS BIGINT)), 0) AS BIGINT)
                       AS sum_cents
            FROM w WHERE event_type IS NOT NULL
            GROUP BY event_type
        """,
        # rollback-to-epoch-1 must equal the time-travel read: same LWW
        # fold over the deterministic epoch-<=1 slice as cdc_time_travel.
        "cdc_rollback": """
            WITH sub AS (
                SELECT * FROM events
                WHERE (event_id * 3) //
                    (SELECT max(event_id) + 1 FROM events) <= 1
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM sub
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error'
        """,
        # branch = full snapshot minus the branch-deleted keys (the
        # source stays whole — its own queries pin that).
        "cdc_clone_branch": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error'
                AND user_id NOT IN (4, 6, 9, 25, 49)
        """,
        "cdc_change_feed": """
            WITH old_s AS (
                SELECT user_id, event_type, value FROM events
                WHERE (event_id * 3) //
                    (SELECT max(event_id) + 1 FROM events) <= 0
                QUALIFY row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                    AND event_type <> 'error'
            ), new_s AS (
                SELECT user_id, event_type, value FROM events
                WHERE (event_id * 3) //
                    (SELECT max(event_id) + 1 FROM events) <= 1
                QUALIFY row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                    AND event_type <> 'error'
            )
            SELECT COALESCE(o.user_id, n.user_id) AS user_id,
                CASE WHEN o.user_id IS NULL THEN 'I'
                     WHEN n.user_id IS NULL THEN 'D' ELSE 'U' END AS op,
                o.event_type AS event_type_old,
                n.event_type AS event_type_new,
                o.value AS value_old, n.value AS value_new
            FROM old_s o FULL OUTER JOIN new_s n ON o.user_id = n.user_id
            WHERE o.user_id IS NULL OR n.user_id IS NULL
               OR o.event_type IS DISTINCT FROM n.event_type
               OR o.value IS DISTINCT FROM n.value
        """,
        "incremental_sessions_users": """
            WITH x AS (
                SELECT user_id, ts, event_id,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            ), y AS (
                SELECT user_id, ts,
                       CAST(sum(CASE WHEN prev IS NULL
                                      OR ts - prev > INTERVAL 30 MINUTE
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_id
                FROM x
            )
            SELECT user_id, session_id,
                   epoch_us(min(ts)) AS session_start,
                   epoch_us(max(ts)) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM y GROUP BY user_id, session_id
        """,
        "dedup_normalized_keep_longest": r"""
            SELECT doc_id, text, lang, source, n_chars FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                ORDER BY n_chars DESC, doc_id) = 1
        """,
        "lineitem_unpivot_measures": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
                   l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        """,
        "events_ohlc_hourly": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                first(value ORDER BY ts, event_id) AS open,
                max(value) AS high, min(value) AS low,
                last(value ORDER BY ts, event_id) AS close,
                CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
              AND value IS NOT NULL
            GROUP BY 1, 2
        """,
        "click_purchase_window_join": """
            WITH c AS (
                SELECT event_id, ts, user_id FROM events
                WHERE event_type = 'click'
            ), p AS (
                SELECT event_id, ts, user_id, value FROM events
                WHERE event_type = 'purchase'
            )
            SELECT c.event_id, c.ts, c.user_id,
                   p.event_id AS event_id_purchase,
                   p.value AS value_purchase
            FROM c JOIN p
              ON c.user_id = p.user_id
             AND p.ts >= c.ts
             AND p.ts <= c.ts + INTERVAL 30 MINUTE
        """,
        "events_pagerank": """
            WITH e AS (
                SELECT user_id AS src,
                       (user_id + (event_id % 17)) % 150 AS dst
                FROM events WHERE user_id IS NOT NULL
            ),
            deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e
                    GROUP BY src),
            nodes AS (SELECT DISTINCT src AS node FROM e
                      UNION SELECT DISTINCT dst FROM e),
            r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
            r1 AS (
                SELECT n.node, CAST(150000000 + COALESCE(c.s, 0) AS BIGINT)
                    AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS node,
                           SUM((r0.r * 85) // (100 * deg.d)) AS s
                    FROM e JOIN r0 ON r0.node = e.src
                    JOIN deg ON deg.src = e.src GROUP BY e.dst) c
                ON c.node = n.node
            ),
            r2 AS (
                SELECT n.node, CAST(150000000 + COALESCE(c.s, 0) AS BIGINT)
                    AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS node,
                           SUM((r1.r * 85) // (100 * deg.d)) AS s
                    FROM e JOIN r1 ON r1.node = e.src
                    JOIN deg ON deg.src = e.src GROUP BY e.dst) c
                ON c.node = n.node
            ),
            r3 AS (
                SELECT n.node, CAST(150000000 + COALESCE(c.s, 0) AS BIGINT)
                    AS r
                FROM nodes n LEFT JOIN (
                    SELECT e.dst AS node,
                           SUM((r2.r * 85) // (100 * deg.d)) AS s
                    FROM e JOIN r2 ON r2.node = e.src
                    JOIN deg ON deg.src = e.src GROUP BY e.dst) c
                ON c.node = n.node
            )
            SELECT node, r FROM r3
        """,
        "asof_next_click_after_purchase": """
            WITH l AS (
                SELECT event_id, ts, user_id, value FROM events
                WHERE event_type = 'purchase'
            ), r AS (
                SELECT event_id, ts, user_id FROM events
                WHERE event_type = 'click'
            )
            SELECT event_id, ts, user_id, value, next_click_id FROM (
                SELECT l.*, r.event_id AS next_click_id,
                    row_number() OVER (
                        PARTITION BY l.event_id ORDER BY r.ts, r.event_id
                    ) AS rn
                FROM l LEFT JOIN r
                  ON l.user_id = r.user_id AND r.ts >= l.ts
            ) WHERE rn = 1
        """,
        "events_running_distinct": """
            SELECT user_id, event_type, ts, event_id,
                CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING
                ) AS BIGINT) AS n_distinct_so_far
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type ORDER BY ts, event_id
                ) AS rn
                FROM events WHERE user_id IS NOT NULL
            )
        """,
        # Windowed co-occurrence PMI: ordered pairs (i, j) with
        # 1 <= j-i <= 3 over the filtered token list, both words in the
        # top-20 vocab (count DESC, tok ASC cutoff), integer PMI
        # floor(1e6*c_ab*N/(c_a*c_b)), top-100 by (pmi DESC, w1, w2).
        "cooccurrence_pmi": """
            WITH l AS (
                SELECT doc_id, list_filter(string_split_regex(
                    lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ), tokocc AS (
                SELECT unnest(toks) AS tok FROM l
            ), tot AS (
                SELECT CAST(count(*) AS BIGINT) AS n FROM tokocc
            ), c1 AS (
                SELECT tok, CAST(count(*) AS BIGINT) AS c
                FROM tokocc GROUP BY tok
            ), vocab AS (
                SELECT tok, c FROM c1
                QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 20
            ), pr AS (
                SELECT unnest(flatten(list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> list_transform(
                        generate_series(i + 1, least(i + 3, len(toks))),
                        j -> [toks[i], toks[j]])))) AS p
                FROM l
            ), pw AS (
                SELECT p[1] AS w1, p[2] AS w2 FROM pr
                WHERE p[1] IN (SELECT tok FROM vocab)
                  AND p[2] IN (SELECT tok FROM vocab)
            ), c2 AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab
                FROM pw GROUP BY w1, w2
                HAVING count(*) >= 2
            )
            SELECT w1, w2, c_ab,
                   CAST((1000000 * c_ab * (SELECT n FROM tot))
                        // (va.c * vb.c) AS BIGINT) AS pmi_scaled
            FROM c2 JOIN vocab va ON va.tok = w1
                    JOIN vocab vb ON vb.tok = w2
            QUALIFY row_number() OVER (
                ORDER BY pmi_scaled DESC, w1, w2) <= 100
        """,
        # Bigram-LM scoring: same filtered-adjacency gram construction as
        # top_bigrams; top-500 model cutoff by (count DESC, gram ASC);
        # integer score floor(1e6*c2/c1) summed per doc occurrence.
        "doc_lm_score": """
            WITH l AS (
                SELECT doc_id, list_filter(string_split_regex(
                    lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ), tokocc AS (
                SELECT unnest(toks) AS tok FROM l
            ), c1 AS (
                SELECT tok, CAST(count(*) AS BIGINT) AS c1
                FROM tokocc GROUP BY tok
            ), g AS (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS gram
                FROM l
            ), c2 AS (
                SELECT gram, CAST(count(*) AS BIGINT) AS c2
                FROM g GROUP BY gram
            ), topk AS (
                SELECT gram, c2, split_part(gram, ' ', 1) AS left_tok
                FROM c2
                QUALIFY row_number() OVER (ORDER BY c2 DESC, gram) <= 500
            ), sc AS (
                SELECT t.gram, (1000000 * t.c2) // u.c1 AS s
                FROM topk t JOIN c1 u ON u.tok = t.left_tok
            )
            SELECT g.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(count(sc.s) AS BIGINT) AS n_matched,
                   CAST(COALESCE(sum(sc.s), 0) AS BIGINT) AS lm_score
            FROM g LEFT JOIN sc ON sc.gram = g.gram
            GROUP BY g.doc_id
        """,
        "top_bigrams_documents": """
            WITH l AS (
                SELECT list_filter(string_split_regex(
                    lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
                FROM documents WHERE text IS NOT NULL
            ), g AS (
                SELECT unnest(list_transform(
                    generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1])) AS gram
                FROM l
            )
            SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM g
            GROUP BY gram ORDER BY cnt DESC, gram LIMIT 15
        """,
        "incremental_agg_user_totals": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                    AS sum_cents
            FROM events WHERE user_id IS NOT NULL
            GROUP BY user_id
        """,
        "events_profile": """
            SELECT 'event_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
                CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct
            FROM events
            UNION ALL
            SELECT 'user_id', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(user_id) AS BIGINT),
                CAST(count(DISTINCT user_id) AS BIGINT) FROM events
            UNION ALL
            SELECT 'event_type', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(event_type) AS BIGINT),
                CAST(count(DISTINCT event_type) AS BIGINT) FROM events
            UNION ALL
            SELECT 'value', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(value) AS BIGINT),
                CAST(count(DISTINCT value) AS BIGINT) FROM events
            UNION ALL
            SELECT 'props', CAST(count(*) AS BIGINT),
                CAST(count(*) - count(props) AS BIGINT),
                CAST(count(DISTINCT props) AS BIGINT) FROM events
        """,
        "cdc_lww_latest_by_user": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_lww_latest_salted": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        """,
        "cdc_lww_tombstones": _LWW_TOMBSTONE_SQL,
        "cdc_sync_events_full": _LWW_TOMBSTONE_SQL,
        "dedup_exact_documents": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY text ORDER BY doc_id) = 1
        """,
        "dedup_exact_hash_documents": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
        """,
        "dedup_exact_incremental_documents": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)
        """,
        "extract_html_text_documents": """
            SELECT doc_id, text FROM documents
        """,
        "dedup_jaccard_exact_documents": """
            WITH w AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM documents WHERE text IS NOT NULL
            ), s AS (
                SELECT DISTINCT doc_id,
                    unnest(list_transform(
                        generate_series(1, greatest(len(ws) - 4, 0)),
                        i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                    )) AS sh
                FROM w
            ), sz AS (
                SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
                FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), dup AS (
                SELECT DISTINCT ib FROM inter
                JOIN sz za ON za.doc_id = ia
                JOIN sz zb ON zb.doc_id = ib
                WHERE c * 1.0 / (za.n + zb.n - c) >= 0.8
            )
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE doc_id NOT IN (SELECT ib FROM dup)
        """,
        "multimodal_image_stats_exact": """
            WITH ids AS (SELECT unnest(generate_series(0, 255)) AS media_id),
            dims AS (
                SELECT media_id, 16 + media_id % 48 AS w,
                       16 + (7 * media_id) % 48 AS h
                FROM ids
            )
            SELECT media_id, w AS width, h AS height,
                CAST(h * list_sum(list_transform(
                    generate_series(0, w - 1), x -> (x * 255) // (w - 1)
                )) AS BIGINT) AS r_sum,
                CAST(w * list_sum(list_transform(
                    generate_series(0, h - 1), y -> (y * 255) // (h - 1)
                )) AS BIGINT) AS g_sum,
                CAST(list_sum(list_transform(generate_series(0, h - 1), y ->
                    list_sum(list_transform(
                        generate_series(0, w - 1), x -> (x + y) % 256
                    ))
                )) AS BIGINT) AS b_sum
            FROM dims
        """,
        "multimodal_audio_stats_exact": """
            WITH ids AS (SELECT unnest(generate_series(0, 63)) AS media_id),
            p AS (
                SELECT media_id, 1000 + (media_id % 7) * 500 AS n,
                       3 + media_id % 11 AS k
                FROM ids
            )
            SELECT media_id, n AS n_samples,
                CAST(list_sum(list_transform(
                    generate_series(0, n - 1), t -> (t * k) % 65536 - 32768
                )) AS BIGINT) AS sample_sum,
                CAST(list_sum(list_transform(
                    generate_series(0, n - 1),
                    t -> abs((t * k) % 65536 - 32768)
                )) AS BIGINT) AS abs_sum
            FROM p
        """,
        # Planted-ground-truth oracles for the perceptual dedup pair: the
        # synthetic corpora plant perturbed copies at a closed-form id
        # pattern, and the unit-tested invariant is "copies dropped,
        # distinct media kept" — so the exact surviving set IS the planted
        # scheme.  The Ray side does the real decode + DCT/FFT work; any
        # false positive/negative breaks the driver value hash.
        "multimodal_phash_dedup": """
            SELECT CAST(i AS BIGINT) AS media_id,
                   'image/x-portable-pixmap' AS mime
            FROM generate_series(0, 179) AS t(i)
            WHERE i = 0 OR i % 5 <> 0
        """,
        "multimodal_audio_dedup": """
            SELECT CAST(b + (b + 3) // 4 AS BIGINT) AS media_id,
                   'audio/wav' AS mime
            FROM generate_series(0, 59) AS t(b)
        """,
        # Signature-exact word-3-gram Jaccard dedup (same reduction as
        # dedup_minhash_documents, k=3 shingles, %15 planted copies).
        "dedup_ngram_jaccard_documents": """
            WITH aug AS (
                SELECT doc_id, text, lang, source, n_chars FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text, lang, source, n_chars
                FROM documents WHERE doc_id % 15 = 0
            ), w AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM aug WHERE text IS NOT NULL
            ), s AS (
                SELECT DISTINCT doc_id,
                    unnest(list_transform(
                        generate_series(1, greatest(len(ws) - 2, 0)),
                        i -> array_to_string(list_slice(ws, i, i + 2), ' ')
                    )) AS sh
                FROM w
            ), g AS (
                SELECT doc_id,
                    array_to_string(list_sort(list(sh)), chr(30)) AS sig
                FROM s GROUP BY doc_id
            ), dup AS (
                SELECT doc_id FROM (
                    SELECT doc_id, row_number() OVER (
                        PARTITION BY sig ORDER BY doc_id) AS rn
                    FROM g
                ) WHERE rn > 1
            )
            SELECT doc_id, text, lang, source, n_chars FROM aug
            WHERE doc_id NOT IN (SELECT doc_id FROM dup)
        """,
        # Fingerprint-exact SimHash dedup over the deterministic synthetic
        # corpus (see _q_dedup_simhash): fingerprints are pairwise-distinct
        # across doc_ids (verified to 300k), so the planted +1,000,000
        # copies are the only duplicates and exactly the original ids
        # survive.
        "dedup_simhash_documents": """
            SELECT doc_id FROM documents
        """,
        # Exact-copy embedding dedup: planted byte-identical copies are
        # the only pairs above the 0.999999 verify threshold (max natural
        # cosine ~0.60), so the surviving set is the original table.
        "dedup_embedding_cosine": """
            SELECT vec_id, label FROM embeddings
        """,
        # Binlog gap audit: seq = event_id, epoch = the deterministic
        # tertile; missing = span length minus count.
        "cdc_gap_audit": """
            WITH b AS (
                SELECT event_id AS seq, (event_id * 3) //
                    (SELECT max(event_id) + 1 FROM events) AS epoch
                FROM events
            )
            SELECT CAST(epoch AS BIGINT) AS epoch,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(min(seq) AS BIGINT) AS seq_min,
                   CAST(max(seq) AS BIGINT) AS seq_max,
                   CAST(max(seq) - min(seq) + 1 - count(*) AS BIGINT)
                       AS n_missing
            FROM b GROUP BY epoch
        """,
        # Bounded-depth reachability: unrolled BFS join chain; min(hop)
        # per node over the union of all levels.
        "events_reachable_3hop": """
            WITH e AS (
                SELECT event_id % 3000 AS src,
                       (event_id // 7 + user_id * 13) % 3000 AS dst
                FROM events WHERE user_id IS NOT NULL
            ), n0 AS (
                SELECT unnest([0, 1, 2]) AS node, 0 AS hop
            ), n1 AS (
                SELECT DISTINCT e.dst AS node, 1 AS hop
                FROM e JOIN n0 ON e.src = n0.node
            ), n2 AS (
                SELECT DISTINCT e.dst AS node, 2 AS hop
                FROM e JOIN n1 ON e.src = n1.node
            ), n3 AS (
                SELECT DISTINCT e.dst AS node, 3 AS hop
                FROM e JOIN n2 ON e.src = n2.node
            ), a AS (
                SELECT * FROM n0 UNION ALL SELECT * FROM n1
                UNION ALL SELECT * FROM n2 UNION ALL SELECT * FROM n3
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(min(hop) AS BIGINT) AS hop
            FROM a GROUP BY node
        """,
        # Incremental MinHash dedup: id-ordered increments against
        # persistent signature state reduce to the SAME min-id-per-class
        # answer as the one-shot signature-exact query.
        "dedup_minhash_incremental_documents": """
            WITH aug AS (
                SELECT doc_id, text, lang, source, n_chars FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text, lang, source, n_chars
                FROM documents WHERE doc_id % 20 = 0
            ), w AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM aug WHERE text IS NOT NULL
            ), s AS (
                SELECT DISTINCT doc_id,
                    unnest(list_transform(
                        generate_series(1, greatest(len(ws) - 4, 0)),
                        i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                    )) AS sh
                FROM w
            ), g AS (
                SELECT doc_id,
                    array_to_string(list_sort(list(sh)), chr(30)) AS sig
                FROM s GROUP BY doc_id
            ), dup AS (
                SELECT doc_id FROM (
                    SELECT doc_id, row_number() OVER (
                        PARTITION BY sig ORDER BY doc_id) AS rn
                    FROM g
                ) WHERE rn > 1
            )
            SELECT doc_id, text, lang, source, n_chars FROM aug
            WHERE doc_id NOT IN (SELECT doc_id FROM dup)
        """,
        # Signature-exact MinHash dedup: keep min doc_id per distinct
        # word-5-gram SET over the copy-augmented corpus (identical
        # signatures ⟺ identical shingle sets); docs with <5 tokens emit
        # no shingles (sentinel signature) and are always kept.
        "dedup_minhash_documents": """
            WITH aug AS (
                SELECT doc_id, text, lang, source, n_chars FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text, lang, source, n_chars
                FROM documents WHERE doc_id % 20 = 0
            ), w AS (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM aug WHERE text IS NOT NULL
            ), s AS (
                SELECT DISTINCT doc_id,
                    unnest(list_transform(
                        generate_series(1, greatest(len(ws) - 4, 0)),
                        i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                    )) AS sh
                FROM w
            ), g AS (
                SELECT doc_id,
                    array_to_string(list_sort(list(sh)), chr(30)) AS sig
                FROM s GROUP BY doc_id
            ), dup AS (
                SELECT doc_id FROM (
                    SELECT doc_id, row_number() OVER (
                        PARTITION BY sig ORDER BY doc_id) AS rn
                    FROM g
                ) WHERE rn > 1
            )
            SELECT doc_id, text, lang, source, n_chars FROM aug
            WHERE doc_id NOT IN (SELECT doc_id FROM dup)
        """,
        # Daily LOCF snapshot per user: the last event at or before each
        # day's end (ties by event_id), days spanning first→last event.
        "events_locf_daily": """
            WITH e AS (
                SELECT user_id, epoch_us(ts) AS tus, event_id,
                       CAST(floor(value * 100) AS BIGINT) AS c
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND value IS NOT NULL
            ), b AS (
                SELECT user_id, min(tus) // 86400000000 AS d0,
                       max(tus) // 86400000000 AS d1
                FROM e GROUP BY user_id
            ), g AS (
                SELECT user_id, unnest(generate_series(d0, d1)) AS day
                FROM b
            )
            SELECT g.user_id, g.day * 86400000000 AS day_us,
                (SELECT c FROM e
                 WHERE e.user_id = g.user_id
                   AND e.tus < (g.day + 1) * 86400000000
                 ORDER BY e.tus DESC, e.event_id DESC LIMIT 1)
                    AS value_cents
            FROM g
        """,
        # Hopping windows: every event lands in exactly 4 window starts
        # (60-min window / 15-min slide), distinct users per window.
        "events_hopping_distinct_users": """
            WITH e AS (
                SELECT user_id,
                       (epoch_us(ts) // 900000000) * 900000000 AS base
                FROM events WHERE user_id IS NOT NULL
            ), w AS (
                SELECT user_id, base - k.k * 900000000 AS window_us
                FROM e, generate_series(0, 3) k(k)
            )
            SELECT window_us,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM w GROUP BY window_us
        """,
        # Common-neighbor link prediction over the shared interaction
        # graph: count per canonical non-edge pair via adjacency self-join.
        "events_link_prediction": """
            WITH raw AS (
                SELECT event_id % 3000 AS x,
                       (event_id // 7 + user_id * 13) % 3000 AS y
                FROM events WHERE user_id IS NOT NULL),
            e AS (SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                  FROM raw WHERE x <> y),
            adj AS (SELECT a AS w, b AS n FROM e
                    UNION ALL SELECT b, a FROM e),
            cand AS (
                SELECT x.n AS u, y.n AS v,
                       CAST(count(*) AS BIGINT) AS common_neighbors
                FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
                GROUP BY 1, 2
            )
            SELECT u, v, common_neighbors FROM cand
            WHERE common_neighbors >= 3
              AND NOT EXISTS (SELECT 1 FROM e
                              WHERE e.a = cand.u AND e.b = cand.v)
        """,
        # Exact-rational smoothed target encoding: one float division per
        # key over exactly-represented int64 products.
        "target_encode_user_value": """
            WITH c AS (
                SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS c
                FROM events WHERE value IS NOT NULL
            ), g AS (SELECT sum(c) AS gs, count(*) AS gn FROM c),
            k AS (
                SELECT user_id, sum(c) AS ks, count(*) AS kn
                FROM c GROUP BY user_id
            )
            SELECT k.user_id, CAST(kn AS BIGINT) AS n,
                   CAST(ks * gn + 10 * gs AS DOUBLE)
                       / CAST(gn * (kn + 10) AS DOUBLE) AS te_value
            FROM k, g
        """,
        "profit_by_nation_year_q9": """
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(CAST(floor((l.l_extendedprice
                       * (1 - l.l_discount)) * 100) AS BIGINT)) AS BIGINT)
                       AS profit_cents
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
               AND p.p_name LIKE '%red%'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2
        """,
        "late_shipments_by_flag_q12": """
            SELECT l_returnflag,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
            GROUP BY 1
        """,
        "special_revenue_q19": """
            SELECT CAST(COALESCE(sum(CAST(floor((l_extendedprice
                       * (1 - l_discount)) * 100) AS BIGINT)), 0) AS BIGINT)
                   AS revenue_cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "idle_customer_balance_q22": """
            WITH avgbal AS (
                SELECT sum(CAST(floor(c_acctbal * 100) AS BIGINT)) * 1.0
                       / count(*) AS t
                FROM customer WHERE c_acctbal > 0.0
            )
            SELECT n.n_name, CAST(count(*) AS BIGINT) AS numcust,
                CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                    AS totacctbal_cents
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE CAST(floor(c_acctbal * 100) AS BIGINT)
                      > (SELECT t FROM avgbal)
              AND c_custkey NOT IN (
                  SELECT o_custkey FROM orders
                  GROUP BY o_custkey HAVING count(*) > 2)
            GROUP BY 1
        """,
        "top_supplier_q15": """
            WITH revenue AS (
                SELECT l_suppkey,
                       CAST(sum(CAST(floor((l_extendedprice
                           * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT)
                           AS total_revenue_cents
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue_cents
            FROM supplier JOIN revenue ON s_suppkey = l_suppkey
            WHERE total_revenue_cents =
                  (SELECT max(total_revenue_cents) FROM revenue)
        """,
        "min_cost_supplier_q2": """
            WITH cost AS (
                SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                       CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT))
                            AS BIGINT) AS cost_cents
                FROM lineitem
                JOIN part ON p_partkey = l_partkey AND p_size = 15
                GROUP BY 1, 2)
            SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
                   cost_cents
            FROM cost JOIN supplier USING (s_suppkey)
            JOIN nation ON s_nationkey = n_nationkey
            QUALIFY row_number() OVER (
                PARTITION BY p_partkey
                ORDER BY cost_cents, s_acctbal DESC, s_suppkey) = 1
        """,
        "important_parts_q11": """
            WITH v AS (
                SELECT l_partkey AS p_partkey,
                       CAST(sum(CAST(floor((l_extendedprice
                           * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT)
                           AS value_cents
                FROM lineitem GROUP BY 1)
            SELECT p_partkey, value_cents FROM v
            WHERE value_cents > 0.0006
                  * (SELECT CAST(sum(value_cents) AS DOUBLE) FROM v)
        """,
        "waiting_suppliers_q21": """
            WITH f AS (
                SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
                JOIN orders ON o_orderkey = l_orderkey
                   AND o_orderstatus = 'F'),
            agg AS (
                SELECT l_orderkey, max(l_shipdate) AS ms,
                       count(DISTINCT l_suppkey) AS ns
                FROM f GROUP BY 1),
            winners AS (
                SELECT f.l_orderkey, f.l_suppkey FROM f
                JOIN agg ON f.l_orderkey = agg.l_orderkey
                   AND f.l_shipdate = agg.ms
                WHERE agg.ns >= 2 GROUP BY 1, 2),
            solo AS (
                SELECT l_orderkey, min(l_suppkey) AS w FROM winners
                GROUP BY 1 HAVING count(*) = 1)
            SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM solo JOIN supplier ON s_suppkey = w GROUP BY 1, 2
            ORDER BY numwait DESC, s_suppkey LIMIT 20
        """,
        "excess_suppliers_q20": """
            WITH pq AS (
                SELECT l_partkey, l_suppkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem
                WHERE year(l_shipdate) = 1996
                  AND l_partkey IN (
                      SELECT p_partkey FROM part
                      WHERE p_name LIKE '%widget%')
                GROUP BY 1, 2),
            tot AS (
                SELECT l_partkey, sum(qty) AS total FROM pq GROUP BY 1)
            SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
            FROM pq JOIN tot USING (l_partkey)
            JOIN supplier s ON s.s_suppkey = pq.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE 2 * pq.qty > tot.total
        """,
        "embedding_radius_pairs": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 4)
            SELECT q.query_id, e.vec_id
            FROM embeddings e, q
            WHERE list_cosine_similarity(q.qe, e.embedding) >= 0.3
        """,
        "events_reciprocal_edges": """
            WITH e AS (
                SELECT DISTINCT (event_id % 3000) AS src,
                       ((event_id // 7 + user_id * 13) % 3000) AS dst
                FROM events
                WHERE user_id IS NOT NULL
                  AND (event_id % 3000)
                      != ((event_id // 7 + user_id * 13) % 3000))
            SELECT e1.src AS a, e1.dst AS b
            FROM e e1 JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src
            WHERE e1.src < e1.dst
        """,
        "ttr_by_source": """
            WITH w AS (
                SELECT source,
                       unnest(string_split_regex(
                           lower(text), '[^a-z0-9]+')) AS term
                FROM documents)
            SELECT source,
                   CAST(count(DISTINCT term) AS BIGINT) AS n_types,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT term) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS ttr
            FROM w WHERE term != '' GROUP BY 1
        """,
        "events_cume_dist": """
            SELECT event_id, user_id,
                   CASE WHEN value IS NULL THEN NULL ELSE
                       cume_dist() OVER (
                           PARTITION BY user_id ORDER BY value) END AS cd
            FROM events WHERE user_id IS NOT NULL
        """,
        "page_change_rate_by_host": """
            WITH old_s AS (
                SELECT user_id, value FROM events WHERE event_id % 2 = 0
                QUALIFY row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
            new_s AS (
                SELECT user_id, value FROM events
                QUALIFY row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
            d AS (
                SELECT COALESCE(o.user_id, n.user_id) AS user_id,
                       CASE WHEN o.user_id IS NULL THEN 'I'
                            WHEN n.user_id IS NULL THEN 'D'
                            ELSE 'U' END AS op
                FROM old_s o FULL OUTER JOIN new_s n ON o.user_id = n.user_id
                WHERE o.user_id IS NULL OR n.user_id IS NULL
                   OR o.value IS DISTINCT FROM n.value)
            SELECT 'site-' || (user_id % 997) || '.example.com' AS host,
                   CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_insert,
                   CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_update,
                   CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_delete
            FROM d GROUP BY 1
        """,
        "session_size_histogram": """
            WITH s AS (
                SELECT event_id, user_id,
                       CAST(sum(CASE WHEN prev_ts IS NULL
                                       OR ts - prev_ts > INTERVAL 30 MINUTE
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_id
                FROM (SELECT event_id, user_id, ts,
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_ts
                      FROM events)),
            sz AS (
                SELECT user_id, session_id, count(*) AS session_events
                FROM s GROUP BY 1, 2)
            SELECT CAST(session_events AS BIGINT) AS session_events,
                   CAST(count(*) AS BIGINT) AS n_sessions
            FROM sz GROUP BY 1
        """,
        "events_wow_growth": """
            WITH w AS (
                SELECT CAST(isoyear(ts) * 100 + weekofyear(ts) AS BIGINT)
                           AS yw,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1)
            SELECT yw, n_events,
                   CAST(n_events AS DOUBLE)
                       / CAST(lag(n_events) OVER (ORDER BY yw) AS DOUBLE)
                       AS wow_ratio
            FROM w
        """,
        "trending_types_hourly": """
            WITH h AS (
                SELECT date_trunc('hour', ts) AS window_start, event_type,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1, 2)
            SELECT window_start, event_type, n_events,
                   CAST(row_number() OVER (
                       PARTITION BY window_start
                       ORDER BY n_events DESC, event_type) AS BIGINT) AS rnk
            FROM h QUALIFY rnk <= 3
        """,
        # Repartition must be invisible: the oracle is the plain LWW
        # tombstone snapshot.
        "cdc_repartition": _LWW_TOMBSTONE_SQL,
        # Secondary-index equality lookup = the LWW snapshot filtered on
        # the indexed column's CURRENT value.
        "indexed_value_lookup": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type = 'purchase'
        """,
        # MERGE INTO: LWW snapshot, then the same set-oriented merge in SQL
        # (upsert value+1000 for user_id%7=0 outside the delete set,
        # delete user_id%31=0).
        "cdc_merge_apply": """
            WITH snap AS (
                SELECT event_id, ts, user_id, event_type, value, props
                FROM events
                QUALIFY row_number() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                    AND event_type <> 'error'
            )
            SELECT event_id, ts, user_id, event_type,
                CASE WHEN user_id % 7 = 0 THEN value + 1000.0
                     ELSE value END AS value,
                props
            FROM snap WHERE user_id % 31 <> 0
        """,
        # keys_changed per epoch from manifests must equal the distinct
        # changed keys of each binlog slice (epoch = (event_id·3)//(max+1),
        # the deterministic synth assignment) recomputed from raw events.
        "lineage_events_cdc": """
            WITH u AS (SELECT max(event_id) + 1 AS upper FROM events),
                 tagged AS (
                     SELECT user_id,
                            (event_id * 3) // (SELECT upper FROM u) AS epoch
                     FROM events
                 )
            SELECT epoch,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS keys_changed
            FROM tagged GROUP BY epoch
        """,
        "annotate_documents": """
            WITH s AS (
                SELECT doc_id,
                    CAST(length(text) AS BIGINT) AS qf_chars,
                    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                        AS qf_words,
                    CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                        AS BIGINT) AS qf_alpha,
                    CAST(len(regexp_extract_all(text, '[0-9]'))
                        AS BIGINT) AS qf_digit,
                    CAST(len(regexp_extract_all(lower(text),
                        '\\b(the|and|of|to|in|is|that|for|with|was|as|on|are|this)\\b'))
                        AS BIGINT) AS qf_stop
                FROM documents
            ), p AS (
                SELECT *,
                    COALESCE(qf_words BETWEEN 5 AND 100000
                        AND 5 * qf_alpha >= 3 * qf_chars
                        AND 5 * qf_digit <= qf_chars
                        AND 100 * qf_stop >= 2 * qf_words, FALSE)
                        AS quality_pass
                FROM s
            )
            SELECT *,
                CAST(quality_pass AS BIGINT)
                    + CAST(quality_pass AND qf_words >= 50 AS BIGINT)
                    AS quality_class
            FROM p
        """,
        # Fixed-point integer Lloyd k-means, unrolled to 2 iterations —
        # mirrors similarity.kmeans_sizes_exact step for step: quantize,
        # smallest-id seeds, argmin int distance (ties → lowest cluster),
        # floor-division centroid update (empty cluster keeps previous).
        "embeddings_kmeans_sizes": """
            WITH q AS (
                SELECT vec_id, list_transform(embedding,
                    x -> CAST(floor(CAST(x AS DOUBLE) * 64.0 + 0.5)
                        AS BIGINT)) AS v
                FROM embeddings
            ),
            c0 AS (
                SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                    AS BIGINT) AS cluster, v
                FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT 8)
            ),
            a0 AS (
                SELECT vec_id, cluster FROM (
                    SELECT q.vec_id, c.cluster,
                        row_number() OVER (PARTITION BY q.vec_id ORDER BY
                            list_sum(list_transform(generate_series(1, 64),
                                i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))),
                            c.cluster) AS rn
                    FROM q, c0 c
                ) WHERE rn = 1
            ),
            u0 AS (
                SELECT cluster, list(val ORDER BY dim) AS v FROM (
                    SELECT a0.cluster, d.i AS dim,
                        CAST(floor(sum(q.v[d.i]) * 1.0 / count(*))
                            AS BIGINT) AS val
                    FROM a0 JOIN q USING (vec_id)
                    CROSS JOIN generate_series(1, 64) AS d(i)
                    GROUP BY a0.cluster, d.i
                ) GROUP BY cluster
            ),
            c1 AS (
                SELECT c0.cluster, COALESCE(u0.v, c0.v) AS v
                FROM c0 LEFT JOIN u0 USING (cluster)
            ),
            a1 AS (
                SELECT vec_id, cluster FROM (
                    SELECT q.vec_id, c.cluster,
                        row_number() OVER (PARTITION BY q.vec_id ORDER BY
                            list_sum(list_transform(generate_series(1, 64),
                                i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))),
                            c.cluster) AS rn
                    FROM q, c1 c
                ) WHERE rn = 1
            ),
            u1 AS (
                SELECT cluster, list(val ORDER BY dim) AS v FROM (
                    SELECT a1.cluster, d.i AS dim,
                        CAST(floor(sum(q.v[d.i]) * 1.0 / count(*))
                            AS BIGINT) AS val
                    FROM a1 JOIN q USING (vec_id)
                    CROSS JOIN generate_series(1, 64) AS d(i)
                    GROUP BY a1.cluster, d.i
                ) GROUP BY cluster
            ),
            c2 AS (
                SELECT c1.cluster, COALESCE(u1.v, c1.v) AS v
                FROM c1 LEFT JOIN u1 USING (cluster)
            ),
            af AS (
                SELECT vec_id, cluster FROM (
                    SELECT q.vec_id, c.cluster,
                        row_number() OVER (PARTITION BY q.vec_id ORDER BY
                            list_sum(list_transform(generate_series(1, 64),
                                i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))),
                            c.cluster) AS rn
                    FROM q, c2 c
                ) WHERE rn = 1
            )
            SELECT cluster, CAST(count(*) AS BIGINT) AS n
            FROM af GROUP BY cluster
        """,
        # 8×8 area-partition tile sums over the closed-form gradient
        # corpus: R separable over x, G over y, B needs the nested sum.
        "multimodal_image_tiles_exact": """
            WITH ids AS (SELECT unnest(generate_series(0, 255)) AS media_id),
            dims AS (
                SELECT media_id, 16 + media_id % 48 AS w,
                       16 + (7 * media_id) % 48 AS h
                FROM ids
            ),
            tiles AS (
                SELECT media_id, w, h,
                       ty.i AS tile_y, tx.i AS tile_x,
                       (ty.i * h) // 8 AS y0, ((ty.i + 1) * h) // 8 AS y1,
                       (tx.i * w) // 8 AS x0, ((tx.i + 1) * w) // 8 AS x1
                FROM dims, generate_series(0, 7) ty(i),
                     generate_series(0, 7) tx(i)
            )
            SELECT media_id, tile_y, tile_x,
                CAST(
                    (y1 - y0) * list_sum(list_transform(
                        generate_series(x0, x1 - 1), x -> (x * 255) // (w - 1)
                    ))
                    + (x1 - x0) * list_sum(list_transform(
                        generate_series(y0, y1 - 1), y -> (y * 255) // (h - 1)
                    ))
                    + list_sum(list_transform(generate_series(y0, y1 - 1),
                        y -> list_sum(list_transform(
                            generate_series(x0, x1 - 1), x -> (x + y) % 256
                        ))
                    ))
                AS BIGINT) AS px_sum
            FROM tiles
        """,
        # Sampled-frame byte sums: sampler picks frame (i·(nf−1))//(k−1),
        # k=3 samples per clip over the closed-form Y4M corpus.
        "multimodal_video_sample_exact": """
            WITH ids AS (SELECT unnest(generate_series(0, 63)) AS media_id),
            p AS (SELECT media_id, 4 + media_id % 9 AS nf FROM ids),
            s AS (
                SELECT media_id, i.i AS sample_idx,
                       (i.i * (nf - 1)) // 2 AS f
                FROM p, generate_series(0, 2) i(i)
            )
            SELECT media_id, sample_idx,
                CAST(list_sum(list_transform(generate_series(0, 287),
                    j -> (31 * f + 7 * j + media_id) % 256)) AS BIGINT)
                    AS byte_sum
            FROM s
        """,
        "multimodal_video_stats_exact": """
            WITH ids AS (SELECT unnest(generate_series(0, 63)) AS media_id),
            f AS (
                SELECT media_id,
                       unnest(generate_series(0, 4 + media_id % 9 - 1))
                           AS frame_idx
                FROM ids
            )
            SELECT media_id, frame_idx,
                CAST(list_sum(list_transform(
                    generate_series(0, 287),
                    j -> (31 * frame_idx + 7 * j + media_id) % 256
                )) AS BIGINT) AS byte_sum
            FROM f
        """,
        "domain_stats_events": """
            WITH u AS (
                SELECT 'https://site-' || (user_id % 997)
                       || '.example.com/page/' || user_id AS url
                FROM events
            ), p AS (
                SELECT split_part(url, '/', 3) AS host, url FROM u
            )
            SELECT host,
                   regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain,
                   count(DISTINCT url) AS n_pages,
                   count(*) AS n_events
            FROM p GROUP BY host
        """,
        "knn_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 4
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS score
                FROM embeddings e, q
            )
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, vec_id) AS BIGINT) AS knn_rank
            FROM s
            QUALIFY knn_rank <= 10
        """,
        "knn_lsh_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 4
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS score
                FROM embeddings e, q
            )
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, vec_id) AS BIGINT) AS knn_rank
            FROM s
            QUALIFY knn_rank <= 10
        """,
        "knn_ivf_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 4
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS score
                FROM embeddings e, q
            )
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, vec_id) AS BIGINT) AS knn_rank
            FROM s
            QUALIFY knn_rank <= 10
        """,
        "quality_filter_documents": r"""
            WITH s AS (
                SELECT doc_id, text, lang, source, n_chars,
                       CAST(length(text) AS BIGINT) AS qf_chars,
                       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS qf_words,
                       CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                           AS BIGINT) AS qf_alpha,
                       CAST(len(regexp_extract_all(text, '[0-9]'))
                           AS BIGINT) AS qf_digit,
                       CAST(len(regexp_extract_all(lower(text),
                           '\b(the|and|of|to|in|is|that|for|with|was|as|on|are|this)\b'))
                           AS BIGINT) AS qf_stop
                FROM documents
            )
            SELECT * FROM s
            WHERE qf_words BETWEEN 5 AND 100000
              AND 5 * qf_alpha >= 3 * qf_chars
              AND 5 * qf_digit <= qf_chars
              AND 100 * qf_stop >= 2 * qf_words
        """,
        "text_stats_documents": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_words,
                   CAST(len(regexp_extract_all(text,
                       '''[a-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
                       AS BIGINT) AS n_tokens
            FROM documents
        """,
        "redact_pii_documents": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
                       AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                       AS BIGINT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text,
                       '\+\d[\d\-\s]{7,}\d')) AS BIGINT) AS n_phone,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                               '[EMAIL]', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '[IP]', 'g'),
                       '\+\d[\d\-\s]{7,}\d', '[PHONE]', 'g')
                       AS text_redacted
            FROM documents
        """,
        "repetition_stats_documents": """
            SELECT doc_id,
                   CAST(len(string_split(text, chr(10))) AS BIGINT)
                       AS n_lines,
                   CAST(len(list_distinct(string_split(text, chr(10))))
                       AS BIGINT) AS n_distinct_lines,
                   (len(string_split(text, chr(10)))
                    - len(list_distinct(string_split(text, chr(10)))))
                   / CAST(len(string_split(text, chr(10))) AS DOUBLE)
                       AS dup_line_frac
            FROM documents
        """,
        "events_stats_by_type": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents,
                   CAST(min(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS min_cents,
                   CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS max_cents
            FROM events GROUP BY event_type
        """,
        "events_daily_counts": """
            SELECT date_trunc('day', ts) AS event_day,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        """,
        "top_events_by_value": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events ORDER BY value DESC, event_id LIMIT 50
        """,
        "lineage_epoch_totals": """
            WITH u AS (SELECT max(event_id) + 1 AS upper FROM events),
                 tagged AS (
                     SELECT user_id, event_id,
                            (event_id * 3) // (SELECT upper FROM u) AS epoch
                     FROM events
                 ),
                 epochs AS (SELECT DISTINCT epoch FROM tagged)
            SELECT e.epoch AS epoch,
                   CAST((SELECT count(DISTINCT t.user_id) FROM tagged t
                         WHERE t.epoch <= e.epoch) AS BIGINT) AS total_rows,
                   CAST((SELECT max(t.event_id) FROM tagged t
                         WHERE t.epoch <= e.epoch) AS BIGINT) AS max_seq
            FROM epochs e
        """,
        "orders_customer_broadcast_join": """
            SELECT o_orderkey, o_totalprice, o_orderstatus, c_name,
                   c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "sales_by_nation": """
            SELECT n_name,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS sales_cents
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "orders_lineitem_shuffle_join": """
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   l_linenumber, l_quantity, l_extendedprice
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        """,
        "orders_lineitem_left_join": """
            SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
            FROM orders LEFT JOIN (
                SELECT * FROM lineitem WHERE l_quantity > 45
            ) ON o_orderkey = l_orderkey
        """,
        "asof_click_before_purchase": """
            WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT * FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.ts, p.user_id, p.value,
                   (SELECT c.event_id FROM c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts
                    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
                       AS click_event_id
            FROM p
        """,
        "asof_click_within_1h": """
            WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT * FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.ts, p.user_id, p.value,
                   (SELECT c.event_id FROM c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts
                      AND c.ts >= p.ts - INTERVAL 1 HOUR
                    ORDER BY c.ts DESC, c.event_id DESC LIMIT 1)
                       AS click_event_id
            FROM p
        """,
        "events_hourly_by_type": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_sliding_hourly": """
            WITH x AS (
                SELECT event_type,
                       (epoch_us(ts) // 900000000) * 900000000
                           - unnest(generate_series(0, 3)) * 900000000
                           AS wsus
                FROM events WHERE ts IS NOT NULL
            )
            SELECT make_timestamp(wsus) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM x GROUP BY 1, 2
        """,
        "sessionize_events": """
            SELECT event_id, user_id,
                   CAST(sum(CASE WHEN prev_ts IS NULL
                                   OR ts - prev_ts > INTERVAL 30 MINUTE
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM (SELECT event_id, user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_ts
                  FROM events)
        """,
        "events_running_sum_by_user": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS running_cents
            FROM events
        """,
        "events_distinct_users_by_type": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY 1
        """,
        "events_distinct_users_approx": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT)
                       AS n_distinct_approx
            FROM events GROUP BY 1
        """,
        "events_value_quantiles_by_type": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        """,
        "events_value_quantiles_approx": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90
            FROM events GROUP BY event_type
        """,
        "distinct_lang_source_documents": """
            SELECT DISTINCT lang, source FROM documents
        """,
        "orders_semi_join_building": """
            SELECT * FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
        """,
        "orders_anti_join_building": """
            SELECT * FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_mktsegment = 'BUILDING')
        """,
        "sample_events_hash": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            WHERE (event_id * 2654435761) % 4294967296 < 429496729
        """,
        "top3_events_per_user": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY value DESC, event_id) <= 3
        """,
        "cap_docs_per_lang": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY lang ORDER BY doc_id) <= 20
        """,
        "weighted_mixture_sample": """
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 <
                  CASE lang
                      WHEN 'en' THEN (4294967296 * 80) // 100
                      WHEN 'de' THEN (4294967296 * 50) // 100
                      WHEN 'fr' THEN (4294967296 * 25) // 100
                      ELSE (4294967296 * 10) // 100
                  END
        """,
        "events_value_histogram": """
            SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events GROUP BY 1
        """,
        "pricing_summary_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT))
                       AS BIGINT) AS sum_qty_cents,
                   CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                       AS BIGINT) AS sum_price_cents,
                   CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
                       * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
                   CAST(sum(CAST(floor(((l_extendedprice * (1 - l_discount))
                       * (1 + l_tax)) * 100) AS BIGINT)) AS BIGINT)
                       AS sum_charge_cents
            FROM lineitem GROUP BY 1, 2
        """,
        "canonicalize_urls_events": """
            WITH p AS (
                SELECT user_id AS k,
                    CASE user_id % 3 WHEN 0 THEN 'HTTPS'
                        WHEN 1 THEN 'http' ELSE 'https' END AS scheme,
                    'Site-' || (user_id % 997) || '.Example.COM' AS hm,
                    CASE user_id % 5 WHEN 0 THEN ':443'
                        WHEN 1 THEN ':8080' WHEN 2 THEN ':80'
                        ELSE '' END AS port,
                    CASE WHEN user_id % 4 = 0 THEN ''
                        ELSE '/Page/' || user_id END AS path,
                    CASE WHEN user_id % 7 = 0 THEN '?b=2&a=1'
                        ELSE '' END AS query,
                    CASE WHEN user_id % 2 = 1 THEN '#Frag' || user_id
                        ELSE '' END AS frag
                FROM events
            ), b AS (
                SELECT k, scheme, port, path, query, frag,
                    CASE WHEN k % 2 = 0 THEN hm ELSE lower(hm) END AS host
                FROM p
            )
            SELECT
                scheme || '://' || host || port || path || query || frag
                    AS url,
                lower(scheme) || '://' || lower(host) ||
                CASE WHEN port = ':8080' THEN ':8080'
                     WHEN port = ':443' AND lower(scheme) <> 'https'
                         THEN ':443'
                     WHEN port = ':80' AND lower(scheme) <> 'http'
                         THEN ':80'
                     ELSE '' END ||
                CASE WHEN path || query = '' THEN '/'
                     ELSE path || query END AS canonical_url
            FROM b
        """,
        "cap_pages_per_host": """
            SELECT 'site-' || (user_id % 997) || '.example.com' AS host,
                   'https://site-' || (user_id % 997) ||
                       '.example.com/page/' || user_id AS url,
                   event_id
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id % 997 ORDER BY event_id) <= 5
        """,
        "remove_boilerplate_documents": """
            WITH segs AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                       generate_subscripts(string_split(text, ' '), 1) AS idx
                FROM documents
            ), freq AS (
                SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
            ), kept AS (
                SELECT s.doc_id, s.seg, s.idx
                FROM segs s JOIN freq f USING (seg) WHERE f.df < 390
            )
            SELECT d.doc_id,
                   COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL
                                       ELSE '' END) AS text
            FROM documents d
            LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS t2
                       FROM kept GROUP BY doc_id) k USING (doc_id)
        """,
        "dedup_segments_documents": """
            WITH segs AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                       generate_subscripts(string_split(text, ' '), 1) AS idx
                FROM documents
            ), w AS (
                SELECT doc_id, idx, seg, row_number() OVER (
                    PARTITION BY seg ORDER BY doc_id, idx) AS rn
                FROM segs
            )
            SELECT d.doc_id,
                   COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL
                                       ELSE '' END) AS text
            FROM documents d
            LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS t2
                       FROM w WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
        """,
        "top_terms_documents": """
            SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT unnest(string_split_regex(
                    lower(text), '[^a-z0-9]+')) AS term
                FROM documents)
            WHERE term <> ''
            GROUP BY term ORDER BY n DESC, term LIMIT 10
        """,
        "chunk_documents": """
            WITH p AS (
                SELECT doc_id, text, length(text) AS l FROM documents
                WHERE text IS NOT NULL
            ), c AS (
                SELECT doc_id, text, unnest(generate_series(0,
                    CASE WHEN l <= 120 THEN 0
                         ELSE CAST(ceil((l - 120) * 1.0 / 96) AS BIGINT)
                    END)) AS chunk_idx
                FROM p
            )
            SELECT doc_id, chunk_idx,
                   substr(text, chunk_idx * 96 + 1, 120) AS chunk
            FROM c
        """,
        "webtext_pipeline_documents": """
            WITH segs AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                       generate_subscripts(string_split(text, ' '), 1) AS idx
                FROM documents
            ), freq AS (
                SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
            ), kept AS (
                SELECT s.doc_id, s.seg, s.idx
                FROM segs s JOIN freq f USING (seg) WHERE f.df < 390
            ), cleaned AS (
                SELECT d.doc_id,
                       COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL
                                           ELSE '' END) AS text
                FROM documents d
                LEFT JOIN (SELECT doc_id,
                               string_agg(seg, ' ' ORDER BY idx) AS t2
                           FROM kept GROUP BY doc_id) k USING (doc_id)
            ), dd AS (
                SELECT doc_id, text FROM cleaned
                QUALIFY row_number() OVER (
                    PARTITION BY text ORDER BY doc_id) = 1
            ), p AS (
                SELECT doc_id, text, length(text) AS l FROM dd
                WHERE text IS NOT NULL
            ), c AS (
                SELECT doc_id, text, unnest(generate_series(0,
                    CASE WHEN l <= 120 THEN 0
                         ELSE CAST(ceil((l - 120) * 1.0 / 96) AS BIGINT)
                    END)) AS chunk_idx
                FROM p
            )
            SELECT doc_id, chunk_idx,
                   substr(text, chunk_idx * 96 + 1, 120) AS chunk
            FROM c
        """,
        "filter_docs_above_median": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.5)
                              FROM documents)
        """,
        "users_click_purchase_full_join": """
            WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_clicks
                       FROM events WHERE event_type = 'click'
                       GROUP BY user_id),
                 p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id)
            SELECT COALESCE(c.user_id, p.user_id) AS user_id,
                   c.n_clicks, p.n_purchases
            FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        """,
        "events_corr_value_hour": """
            WITH base AS (
                SELECT event_type,
                       CAST(floor(value * 100.0) AS BIGINT) AS x,
                       CAST(extract(hour FROM ts) AS BIGINT) AS y
                FROM events
                WHERE value IS NOT NULL AND ts IS NOT NULL),
            s AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy,
                       sum(x * x) AS sxx, sum(y * y) AS syy,
                       sum(x * y) AS sxy
                FROM base GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
                   CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                         AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                   THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   ELSE NULL END AS corr_value_hour
            FROM s
        """,
        "events_user_gaps": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS gap_us
                FROM events)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
                   CAST(max(gap_us) AS BIGINT) AS max_gap_us,
                   CAST(min(gap_us) AS BIGINT) AS min_gap_us
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY user_id
        """,
        "events_rollup_type_day": """
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS event_day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY ROLLUP(event_type, event_day)
        """,
        "events_pivot_daily": """
            SELECT CAST(date_trunc('day', ts) AS DATE) AS event_day,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                       AS n_click,
                   CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                       AS n_error,
                   CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                       AS n_purchase,
                   CAST(count(*) FILTER (event_type = 'signup') AS BIGINT)
                       AS n_signup,
                   CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                       AS n_view
            FROM events GROUP BY 1
        """,
        "decontaminate_documents": """
            WITH docs AS (
                SELECT doc_id, string_split(text, ' ') AS parts
                FROM documents),
            grams AS (
                SELECT doc_id, array_to_string(parts[i:i+4], ' ') AS g
                FROM docs, unnest(generate_series(1, len(parts) - 4)) AS t(i)),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
            cont AS (SELECT DISTINCT doc_id FROM grams
                     JOIN bench USING (g))
            SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
            FROM documents d ANTI JOIN cont USING (doc_id)
        """,
        "shipping_priority_top10": """
            WITH rev AS (
                SELECT l_orderkey,
                       CAST(sum(CAST(floor((l_extendedprice
                           * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT)
                           AS revenue_cents
                FROM lineitem
                WHERE l_shipdate > TIMESTAMP '1998-07-01'
                GROUP BY l_orderkey)
            SELECT o.o_orderkey, r.revenue_cents,
                   o.o_orderdate, o.o_orderpriority
            FROM rev r
            JOIN orders o ON r.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-07-01'
            ORDER BY r.revenue_cents DESC, o.o_orderkey
            LIMIT 10
        """,
        "events_cube_type_day": """
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS event_day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY CUBE(event_type, event_day)
        """,
        "events_props_stats": """
            WITH e AS (
                SELECT event_type,
                       CASE WHEN regexp_matches(
                                json_extract_string(props, '$.k'),
                                '^-?[0-9]+$')
                            THEN CAST(json_extract_string(props, '$.k')
                                      AS BIGINT)
                       END AS k
                FROM events)
            SELECT event_type,
                   CAST(count(k) AS BIGINT) AS n_values,
                   CAST(sum(k) AS BIGINT) AS sum_value,
                   CAST(min(k) AS BIGINT) AS min_value,
                   CAST(max(k) AS BIGINT) AS max_value
            FROM e GROUP BY event_type
        """,
        "late_ship_orders_except_finished": """
            SELECT l_orderkey AS orderkey FROM lineitem
            WHERE l_shipdate > TIMESTAMP '2000-01-01'
            EXCEPT
            SELECT o_orderkey AS orderkey FROM orders
            WHERE o_orderstatus = 'F'
        """,
        "users_clicked_and_purchased": """
            SELECT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "top2_days_dense_rank": """
            WITH d AS (
                SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
                           AS window_start, event_type,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1, 2)
            SELECT window_start, event_type, n_events,
                   CAST(dense_rank() OVER (
                       PARTITION BY event_type ORDER BY n_events DESC
                   ) AS BIGINT) AS rnk
            FROM d
            QUALIFY rnk <= 2
        """,
    }
    sql["repeated_spans_documents"] = """
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS parts
            FROM documents WHERE text IS NOT NULL),
        wins AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   array_to_string(parts[i:i+7], ' ') AS g
            FROM docs, unnest(generate_series(1, len(parts) - 7)) AS t(i)),
        dup AS (
            SELECT doc_id, pos FROM wins
            WHERE g IN (SELECT g FROM wins GROUP BY g HAVING count(*) >= 2)),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (
                       PARTITION BY doc_id ORDER BY pos) <= 8
                   THEN 0 ELSE 1 END AS b
            FROM dup),
        isl AS (
            SELECT doc_id, pos,
                   sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM brk)
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 8 AS BIGINT) AS span_end,
               CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_tokens
        FROM isl GROUP BY doc_id, island
    """
    sql["trim_repeated_spans_documents"] = """
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS parts
            FROM documents WHERE text IS NOT NULL),
        toks AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, parts[i] AS tok
            FROM docs, unnest(generate_series(1, len(parts))) AS t(i)),
        wins AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   array_to_string(parts[i:i+7], ' ') AS g
            FROM docs, unnest(generate_series(1, len(parts) - 7)) AS t(i)),
        dup AS (
            SELECT doc_id, pos FROM wins
            WHERE g IN (SELECT g FROM wins GROUP BY g HAVING count(*) >= 2)),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (
                       PARTITION BY doc_id ORDER BY pos) <= 8
                   THEN 0 ELSE 1 END AS b
            FROM dup),
        isl AS (
            SELECT doc_id, pos,
                   sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM brk),
        spans AS (
            SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
            FROM isl GROUP BY doc_id, island),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok FROM toks t
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.doc_id = t.doc_id AND t.pos >= s.s AND t.pos < s.e)),
        rebuilt AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
            FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce(r.txt, '') END AS text
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """
    sql["cdc_range_scan"] = """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            AND event_type <> 'error'
            AND event_id BETWEEN (3 * (SELECT max(event_id) FROM events)) // 4
                             AND (SELECT max(event_id) FROM events)
    """
    sql["local_supplier_volume"] = """
        SELECT n_name,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
                   * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """
    sql["events_moving_sum_by_user"] = """
        WITH e AS (
            SELECT event_id, user_id, ts,
                   COALESCE(CAST(floor(value * 100) AS BIGINT), 0) AS cents
            FROM events)
        SELECT event_id, user_id,
               CAST(sum(cents) OVER w AS BIGINT) AS win_sum_cents,
               CAST(count(*) OVER w AS BIGINT) AS win_n
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """
    sql["doc_near_dup_components"] = """
        WITH RECURSIVE
        w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents WHERE text IS NOT NULL
        ), s AS (
            SELECT DISTINCT doc_id,
                unnest(list_transform(
                    generate_series(1, greatest(len(ws) - 4, 0)),
                    i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                )) AS sh
            FROM w
        ), sz AS (
            SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
            FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), p0 AS (
            SELECT ia, ib FROM inter
            JOIN sz za ON za.doc_id = ia
            JOIN sz zb ON zb.doc_id = ib
            WHERE c * 1.0 / (za.n + zb.n - c) >= 0.8
        ), pairs AS (
            SELECT ia AS a, ib AS b FROM p0
            UNION ALL
            SELECT ib AS a, ia AS b FROM p0
        ), walk(node, comp) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT p.b, wk.comp FROM walk wk JOIN pairs p ON p.a = wk.node
        )
        SELECT node AS doc_id, CAST(min(comp) AS BIGINT) AS component
        FROM walk GROUP BY node
    """
    sql["events_value_zscore"] = """
        WITH e AS (
            SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events),
        s AS (
            SELECT CAST(count(cents) AS BIGINT) AS n,
                   CAST(sum(cents) AS DOUBLE) AS s1,
                   CAST(sum(cents * cents) AS DOUBLE) AS s2
            FROM e)
        SELECT e.event_id,
               (CAST(e.cents AS DOUBLE) - s.s1 / s.n)
                   / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)) AS z
        FROM e, s
    """
    campaign_rows = ", ".join(
        f"({cid}, TIMESTAMP '{s}', TIMESTAMP '{e}')"
        for cid, s, e in _CAMPAIGNS
    )
    sql["campaign_event_stats"] = f"""
        WITH c(campaign_id, start_ts, end_ts) AS (VALUES {campaign_rows}),
        j AS (
            SELECT c.campaign_id,
                   CAST(floor(e.value * 100) AS BIGINT) AS cents
            FROM events e
            JOIN c ON e.ts >= c.start_ts AND e.ts < c.end_ts)
        SELECT CAST(campaign_id AS BIGINT) AS campaign_id,
               CAST(count(cents) AS BIGINT) AS n_values,
               CAST(sum(cents) AS BIGINT) AS sum_value,
               min(cents) AS min_value,
               max(cents) AS max_value
        FROM j GROUP BY campaign_id
    """
    # generated entry: the centroid literal must be the exact matrix the
    # Ray query uses (same seed), pasted as BIGINT[] values
    cents = _cluster_centroids_int()
    rows = ", ".join(
        "({}, [{}]::BIGINT[])".format(
            i, ",".join(str(int(v)) for v in cents[i])
        )
        for i in range(len(cents))
    )
    sql["semdedup_embeddings"] = f"""
        WITH cents(cluster, c) AS (VALUES {rows}),
        e AS (SELECT vec_id, label,
                     list_transform(embedding,
                         x -> CAST(floor(x * 64.0 + 0.5) AS BIGINT)) AS q
              FROM embeddings),
        a AS (SELECT vec_id, label, q, cluster
              FROM e CROSS JOIN cents
              QUALIFY row_number() OVER (
                  PARTITION BY vec_id
                  ORDER BY CAST(list_dot_product(q, c) AS BIGINT) DESC,
                           cluster) = 1),
        n AS (SELECT vec_id, label, q, cluster,
                     CAST(list_dot_product(q, q) AS BIGINT) AS n2
              FROM a),
        dup AS (
            SELECT DISTINCT y.vec_id FROM n x JOIN n y
            ON x.cluster = y.cluster AND x.vec_id < y.vec_id
            WHERE CAST(list_dot_product(x.q, y.q) AS BIGINT) > 0
              AND 10000 * CAST(list_dot_product(x.q, y.q) AS BIGINT)
                        * CAST(list_dot_product(x.q, y.q) AS BIGINT)
                  >= 2025 * x.n2 * y.n2)
        SELECT vec_id, label FROM n
        WHERE vec_id NOT IN (SELECT vec_id FROM dup)
    """
    sql["embeddings_cluster_assign"] = f"""
        WITH cents(cluster, c) AS (VALUES {rows}),
        e AS (SELECT vec_id,
                     list_transform(embedding,
                         x -> CAST(floor(x * 64.0 + 0.5) AS BIGINT)) AS q
              FROM embeddings)
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
               CAST(list_dot_product(q, c) AS BIGINT) AS dot
        FROM e CROSS JOIN cents
        QUALIFY row_number() OVER (
            PARTITION BY vec_id
            ORDER BY CAST(list_dot_product(q, c) AS BIGINT) DESC, cluster
        ) = 1
    """
    sql["urgent_orders_bloom_join"] = """
        SELECT o.o_orderkey, o.o_custkey, l.l_linenumber, l.l_quantity
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    """
    sql["events_late_arrivals"] = """
        WITH a AS (
            SELECT ts, epoch_us(ts) AS tus,
                   (event_id * 2654435761) & 4294967295 AS arrival
            FROM events),
        w AS (
            SELECT ts, tus,
                   max(tus) OVER (
                       ORDER BY arrival
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS hw
            FROM a)
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               CAST(count(*) FILTER (
                    hw IS NULL OR tus >= hw - 3600000000) AS BIGINT)
                   AS n_ontime,
               CAST(count(*) FILTER (
                    hw IS NOT NULL AND tus < hw - 3600000000) AS BIGINT)
                   AS n_late
        FROM w GROUP BY 1
    """
    sql["events_percent_rank"] = """
        SELECT event_id, user_id,
               CASE WHEN value IS NULL THEN NULL
                    ELSE percent_rank() OVER (
                        PARTITION BY user_id, (value IS NULL)
                        ORDER BY value) END AS pr
        FROM events WHERE user_id IS NOT NULL
    """
    sql["events_mad_by_type"] = """
        WITH e AS (SELECT event_type AS k, value AS v FROM events
                   WHERE event_type IS NOT NULL AND value IS NOT NULL),
        m AS (SELECT k, quantile_cont(v, 0.5) AS med FROM e GROUP BY k),
        d AS (SELECT e.k, abs(e.v - m.med) AS dev
              FROM e JOIN m USING (k))
        SELECT k AS event_type, quantile_cont(dev, 0.5) AS mad
        FROM d GROUP BY k
    """
    sql["events_mode_by_user"] = """
        WITH c AS (
            SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
            FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
            GROUP BY user_id, event_type)
        SELECT user_id, event_type AS mode_value, n FROM c
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY n DESC, event_type ASC) = 1
    """
    sql["exact_median_event_value"] = """
        SELECT quantile_disc(value, 0.5) AS median_value FROM events
    """
    sql["backfill_roundtrip_cdc"] = """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """
    sql["cdc_schema_evolution"] = """
        SELECT event_id, ts, user_id, event_type, value AS amount, props,
               CAST(NULL AS DOUBLE) AS score
        FROM events
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            AND event_type <> 'error'
    """
    sql["inverted_index_lookup"] = """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents WHERE text IS NOT NULL)
        SELECT DISTINCT term, doc_id FROM w
        WHERE term IN ('hash', 'spark')
    """
    sql["events_cohort_retention"] = """
        WITH p AS (SELECT DISTINCT user_id,
                          CAST(date_trunc('day', ts) AS DATE) AS period
                   FROM events
                   WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        c AS (SELECT user_id, period,
                     min(period) OVER (PARTITION BY user_id) AS cohort_day
              FROM p)
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, period) AS BIGINT)
                   AS offset_days,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM c GROUP BY 1, 2
    """
    sql["events_funnel"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS s,
                          event_type FROM events
                   WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        l1 AS (SELECT user_id, t, s FROM e WHERE event_type = 'view'
               QUALIFY row_number() OVER (
                   PARTITION BY user_id ORDER BY t, s) = 1),
        l2 AS (SELECT e.user_id, e.t, e.s FROM e JOIN l1 USING (user_id)
               WHERE e.event_type = 'click'
                 AND (e.t > l1.t OR (e.t = l1.t AND e.s > l1.s))
               QUALIFY row_number() OVER (
                   PARTITION BY e.user_id ORDER BY e.t, e.s) = 1),
        l3 AS (SELECT e.user_id, e.t, e.s FROM e JOIN l2 USING (user_id)
               WHERE e.event_type = 'purchase'
                 AND (e.t > l2.t OR (e.t = l2.t AND e.s > l2.s))
               QUALIFY row_number() OVER (
                   PARTITION BY e.user_id ORDER BY e.t, e.s) = 1)
        SELECT 'view' AS step, CAST(1 AS BIGINT) AS level,
               (SELECT count(*) FROM l1) AS n_keys
        UNION ALL SELECT 'click', 2, (SELECT count(*) FROM l2)
        UNION ALL SELECT 'purchase', 3, (SELECT count(*) FROM l3)
    """
    sql["events_user_zscore"] = """
        WITH e AS (SELECT event_id, user_id,
                          CAST(floor(value * 100) AS BIGINT) AS cents
                   FROM events WHERE user_id IS NOT NULL),
        s AS (SELECT user_id,
                     CAST(count(cents) AS BIGINT) AS n,
                     CAST(sum(cents) AS DOUBLE) AS s1,
                     CAST(sum(cents * cents) AS DOUBLE) AS s2
              FROM e GROUP BY user_id)
        SELECT e.event_id, e.user_id,
               CASE WHEN e.cents IS NULL OR s.n <= 1 THEN NULL
                    ELSE (CAST(e.cents AS DOUBLE) - s.s1 / s.n)
                         / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))
               END AS z
        FROM e JOIN s USING (user_id)
    """
    sql["bucket_docs_quartiles"] = """
        WITH q AS (SELECT quantile_cont(n_chars, 0.25) q1,
                          quantile_cont(n_chars, 0.50) q2,
                          quantile_cont(n_chars, 0.75) q3 FROM documents)
        SELECT doc_id, n_chars,
               1 + CAST(n_chars > q1 AS BIGINT)
                 + CAST(n_chars > q2 AS BIGINT)
                 + CAST(n_chars > q3 AS BIGINT) AS bucket
        FROM documents, q
    """
    sql["lookup_users_cdc"] = """
        SELECT event_id, ts, user_id, event_type, value, props
        FROM events
        WHERE user_id IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 99999999)
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            AND event_type <> 'error'
    """
    sql["scd2_user_history"] = """
        WITH v AS (
            SELECT user_id, value, ts,
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to,
                   event_type
            FROM events)
        SELECT user_id, value, ts AS valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM v WHERE event_type <> 'error'
    """
    sql["normalize_text_documents"] = r"""
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                   AS norm_text
        FROM documents
    """
    sql["fuzzy_vocab_pairs"] = """
        WITH w AS (
            SELECT DISTINCT unnest(string_split(text, ' ')) AS w
            FROM documents WHERE text IS NOT NULL),
        wf AS (SELECT w FROM w WHERE length(w) >= 3 AND length(w) <= 32)
        SELECT a.w AS word_a, b.w AS word_b,
               CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        FROM wf a JOIN wf b ON a.w < b.w
        WHERE levenshtein(a.w, b.w) <= 2
    """
    sql["frequent_users_exact"] = """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events
        WHERE user_id IS NOT NULL
        GROUP BY user_id
        HAVING count(*) * 120 > 1 * (
            SELECT count(*) FROM events WHERE user_id IS NOT NULL)
    """
    sql["users_snapshot_diff"] = """
        WITH old_s AS (
            SELECT user_id, value FROM events WHERE event_id % 2 = 0
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
        new_s AS (
            SELECT user_id, value FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1)
        SELECT COALESCE(o.user_id, n.user_id) AS user_id,
               CASE WHEN o.user_id IS NULL THEN 'I'
                    WHEN n.user_id IS NULL THEN 'D' ELSE 'U' END AS op,
               o.value AS value_old, n.value AS value_new
        FROM old_s o FULL OUTER JOIN new_s n ON o.user_id = n.user_id
        WHERE o.user_id IS NULL OR n.user_id IS NULL
           OR o.value IS DISTINCT FROM n.value
    """
    sql["wap_rebuild_cdc"] = _LWW_TOMBSTONE_SQL
    sql["median_gap_by_user"] = """
        WITH g AS (
            SELECT user_id,
                   CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS BIGINT) AS gap_us
            FROM events)
        SELECT user_id, quantile_cont(gap_us, 0.5) AS p50
        FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    """
    sql["returned_item_top_customers"] = """
        WITH rev AS (
            SELECT o_custkey,
                   CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount))
                       * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_custkey)
        SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
               r.revenue_cents
        FROM rev r
        JOIN customer c ON c.c_custkey = r.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        ORDER BY r.revenue_cents DESC, c.c_custkey
        LIMIT 20
    """
    sql["events_trend_by_type"] = """
        WITH q AS (
            SELECT event_type,
                   date_diff('hour', TIMESTAMP '2024-01-01', ts) AS x,
                   CAST(floor(value * 100) AS BIGINT) AS y
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
              AND value IS NOT NULL),
        s AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM q GROUP BY event_type),
        t AS (
            SELECT *,
                   CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
                   CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
            FROM s),
        sl AS (
            SELECT event_type, n, sx, sy,
                   CASE WHEN den = 0 THEN NULL ELSE num / den END AS slope
            FROM t)
        SELECT event_type, n, slope,
               (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept
        FROM sl
    """
    sql["consistent_snapshot_cdc"] = """
        WITH mx AS (SELECT max(event_id) + 1 AS m FROM events),
        v1e AS (
            SELECT e.* FROM events e, mx
            WHERE (e.event_id * 3) // mx.m <= 1)
        SELECT event_id, ts, user_id, event_type, value, props
        FROM v1e
        QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            AND event_type <> 'error'
    """
    sql["stratified_sample_docs"] = """
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) <= 10
    """
    sql["embedding_covariance"] = """
        WITH q AS (
            SELECT vec_id, u['i'] AS i,
                   CAST(floor(CAST(u['v'] AS DOUBLE) * 10000) AS BIGINT) AS v
            FROM (
                SELECT vec_id, unnest(list_transform(
                    generate_series(1, len(embedding)),
                    k -> {'i': k, 'v': embedding[k]})) AS u
                FROM embeddings)
        ), pairs AS (
            SELECT a.i - 1 AS i, b.i - 1 AS j,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(a.v) AS BIGINT) AS sum_i,
                   CAST(sum(b.v) AS BIGINT) AS sum_j,
                   CAST(sum(a.v * b.v) AS BIGINT) AS sum_ij
            FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2)
        SELECT i, j, n, sum_i, sum_j, sum_ij,
               (CAST(sum_ij AS DOUBLE)
                - (CAST(sum_i AS DOUBLE) * CAST(sum_j AS DOUBLE))
                  / CAST(n AS DOUBLE))
               / CAST(n AS DOUBLE) AS cov
        FROM pairs
    """
    sql["doc_oov_bigram_fraction"] = """
        WITH l AS (
            SELECT doc_id, list_filter(string_split_regex(
                lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
            FROM documents WHERE text IS NOT NULL
        ), g AS (
            SELECT doc_id, unnest(list_transform(
                generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1])) AS gram
            FROM l
        ), topk AS (
            SELECT gram FROM (
                SELECT gram, count(*) AS cnt FROM g GROUP BY gram
                QUALIFY row_number() OVER (ORDER BY cnt DESC, gram) <= 1000)
        ), per_doc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS nb,
                   CAST(count(*) FILTER (
                       WHERE gram NOT IN (SELECT gram FROM topk))
                       AS BIGINT) AS noov
            FROM g GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.nb, 0) AS n_bigrams,
               COALESCE(p.noov, 0) AS n_oov,
               CAST(p.noov AS DOUBLE) / CAST(p.nb AS DOUBLE) AS oov_frac
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """
    sql["winsorize_event_values"] = """
        WITH b AS (SELECT quantile_disc(value, 0.01) AS lo,
                          quantile_disc(value, 0.99) AS hi FROM events)
        SELECT e.event_id, e.value,
               LEAST(GREATEST(e.value, b.lo), b.hi) AS value_w
        FROM events e, b
    """
    sql["corpus_mixture_stats"] = """
        WITH agg AS (
            SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_units
            FROM documents GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(n_units) AS BIGINT) AS t FROM agg)
        SELECT source, lang, n_docs, n_units,
               CAST(n_units AS DOUBLE) / CAST(t AS DOUBLE) AS unit_share
        FROM agg, tot
    """
    sql["throttle_events"] = """
        SELECT event_id, user_id FROM (
            SELECT event_id, user_id, ts,
                   lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS pts
            FROM events)
        WHERE pts IS NULL OR ts - pts >= INTERVAL 5 MINUTE
    """
    sql["large_volume_orders_top100"] = """
        WITH qual AS (
            SELECT l_orderkey,
                   CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT))
                       AS BIGINT) AS sum_qty_cents
            FROM lineitem GROUP BY 1
            HAVING sum(CAST(floor(l_quantity * 100) AS BIGINT)) > 15000)
        SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
               o.o_totalprice, q.sum_qty_cents
        FROM qual q
        JOIN orders o ON o.o_orderkey = q.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 100
    """
    sql["cdc_expectations_quarantine"] = """
        SELECT event_id, ts, user_id, event_type, value, props,
               'value_range' AS _rule
        FROM events
        WHERE event_type <> 'error'
          AND NOT COALESCE(value BETWEEN 0.0 AND 300.0, FALSE)
    """
    sql["copartitioned_join_cdc"] = """
        WITH mx AS (SELECT max(event_id) + 1 AS m FROM events),
        cur AS (
            SELECT user_id, event_type, value FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error'),
        v1e AS (
            SELECT e.* FROM events e, mx
            WHERE (e.event_id * 3) // mx.m <= 1),
        v1 AS (
            SELECT user_id, event_type AS event_type_v1,
                   value AS value_v1
            FROM v1e
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error')
        SELECT cur.user_id, cur.event_type, cur.value,
               v1.event_type_v1, v1.value_v1
        FROM cur JOIN v1 USING (user_id)
    """
    sql["events_triangle_counts"] = """
        WITH raw AS (
            SELECT user_id % 150 AS s, (user_id + event_id % 17) % 150 AS d
            FROM events WHERE user_id IS NOT NULL),
        e0 AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM raw WHERE s <> d),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e0 e1
            JOIN e0 e2 ON e2.a = e1.b
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
        corners AS (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
        SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM corners GROUP BY node
    """
    sql["events_global_rank"] = """
        SELECT event_id, value,
               CAST(ROW_NUMBER() OVER (ORDER BY value DESC, event_id)
                   AS BIGINT) AS rank
        FROM events
    """
    sql["events_quarantine"] = """
        WITH tagged AS (
            SELECT event_id, ts, user_id, event_type, value, props,
                   CASE
                       WHEN user_id IS NULL THEN 'user_not_null'
                       WHEN NOT COALESCE(event_type IN
                           ('signup', 'click', 'view', 'purchase'), FALSE)
                           THEN 'type_allowed'
                       WHEN NOT COALESCE(value BETWEEN 0.0 AND 300.0, FALSE)
                           THEN 'value_range'
                   END AS _rule
            FROM events)
        SELECT * FROM tagged WHERE _rule IS NOT NULL
    """
    sql["budget_mixture_sample"] = """
        WITH ranked AS (
            SELECT doc_id, text, lang, source, n_chars,
                   SUM(n_chars) OVER (PARTITION BY source
                       ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM documents)
        SELECT doc_id, text, lang, source, n_chars FROM ranked
        WHERE cum <= CASE source WHEN 'src0' THEN 4000
                                 WHEN 'src1' THEN 2500
                                 WHEN 'src2' THEN 1500 ELSE 2000 END
    """
    sql["events_ntile_quartiles"] = """
        WITH t AS (
            SELECT value,
                   NTILE(4) OVER (ORDER BY value, event_id) AS tile
            FROM events)
        SELECT tile,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents,
               min(value) AS min_value,
               max(value) AS max_value
        FROM t GROUP BY tile
    """
    sql["event_type_lift"] = """
        WITH p AS (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        u AS (SELECT count(DISTINCT user_id) AS nu FROM p),
        c AS (SELECT event_type, count(*) AS n FROM p GROUP BY 1),
        co AS (
            SELECT a.event_type AS item_a, b.event_type AS item_b,
                   count(*) AS nco
            FROM p a
            JOIN p b ON a.user_id = b.user_id
                    AND a.event_type < b.event_type
            GROUP BY 1, 2)
        SELECT co.item_a, co.item_b,
               CAST(ca.n AS BIGINT) AS n_a,
               CAST(cb.n AS BIGINT) AS n_b,
               CAST(co.nco AS BIGINT) AS n_co,
               CAST(u.nu * co.nco AS DOUBLE) / (ca.n * cb.n) AS lift
        FROM co, u
        JOIN c ca ON ca.event_type = co.item_a
        JOIN c cb ON cb.event_type = co.item_b
    """
    sql["events_max_concurrency"] = """
        WITH d AS (
            SELECT event_type, ts AS t, 1 AS d FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            UNION ALL
            SELECT event_type, ts + INTERVAL 1800 SECOND, -1 FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        r AS (
            SELECT event_type,
                   SUM(d) OVER (PARTITION BY event_type ORDER BY t, d)
                       AS run
            FROM d)
        SELECT event_type, CAST(max(run) AS BIGINT) AS max_concurrent
        FROM r GROUP BY event_type
    """
    sql["events_trimmed_mean"] = """
        WITH b AS (
            SELECT event_type,
                   quantile_disc(value, 0.1) AS lo,
                   quantile_disc(value, 0.9) AS hi
            FROM events WHERE value IS NOT NULL GROUP BY event_type)
        SELECT e.event_type,
               CAST(count(*) FILTER (WHERE value BETWEEN lo AND hi)
                   AS BIGINT) AS n_kept,
               CAST(sum(CAST(floor(value * 100) AS BIGINT))
                   FILTER (WHERE value BETWEEN lo AND hi) AS BIGINT)
                   AS kept_cents,
               CAST(sum(CAST(floor(value * 100) AS BIGINT))
                   FILTER (WHERE value BETWEEN lo AND hi) AS DOUBLE)
                   / count(*) FILTER (WHERE value BETWEEN lo AND hi)
                   AS trimmed_mean_cents
        FROM events e JOIN b USING (event_type)
        WHERE value IS NOT NULL
        GROUP BY e.event_type
    """
    sql["events_skyline"] = """
        WITH pts AS (
            SELECT event_id, ts, value FROM events
            WHERE value IS NOT NULL AND ts IS NOT NULL),
        g AS (SELECT value, max(ts) AS gmax FROM pts GROUP BY value),
        r AS (
            SELECT value, gmax,
                   max(gmax) OVER (ORDER BY value DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prevmax
            FROM g)
        SELECT p.event_id, p.ts, p.value
        FROM pts p JOIN r USING (value)
        WHERE p.ts = r.gmax AND (r.prevmax IS NULL OR r.gmax > r.prevmax)
    """
    sql["events_degree_histogram"] = """
        WITH raw AS (
            SELECT user_id % 150 AS s, (user_id + event_id % 17) % 150 AS d
            FROM events WHERE user_id IS NOT NULL),
        e0 AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM raw WHERE s <> d),
        deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS degree
            FROM (SELECT a AS node FROM e0
                  UNION ALL SELECT b FROM e0)
            GROUP BY node)
        SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree
    """
    sql["promo_revenue_ratio"] = """
        WITH w AS (
            SELECT l_partkey,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT) AS cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'),
        j AS (
            SELECT cents, p_type FROM w JOIN part ON p_partkey = l_partkey)
        SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                   AS BIGINT) AS promo_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               100.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
                   / sum(cents) AS promo_pct
        FROM j
    """
    sql["suppliers_per_brand"] = """
        SELECT p_brand,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand
    """
    sql["dedup_lines_within_docs"] = """
        WITH segs AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
                   generate_subscripts(string_split(text, ' '), 1) AS idx
            FROM documents
        ), w AS (
            SELECT doc_id, idx, seg, row_number() OVER (
                PARTITION BY doc_id, seg ORDER BY idx) AS rn
            FROM segs
        )
        SELECT d.doc_id,
               COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL
                                   ELSE '' END) AS text
        FROM documents d
        LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS t2
                   FROM w WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
    """
    sql["events_hhi_by_type"] = """
        WITH c AS (
            SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
            FROM events
            WHERE event_type IS NOT NULL AND user_id IS NOT NULL
            GROUP BY event_type, user_id
        )
        SELECT event_type,
               CAST(sum(n * n) AS BIGINT) AS sum_sq,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE)
                   / (CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)
                      * CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)) AS hhi
        FROM c GROUP BY event_type
    """
    sql["source_quality_gate_docs"] = r"""
        WITH s AS (
            SELECT source,
                   CAST(length(text) AS BIGINT) AS c,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]'))
                       AS BIGINT) AS a
            FROM documents
        ), per AS (
            SELECT source, sum(c) AS sc, sum(a) AS sa, count(c) AS v
            FROM s GROUP BY source
        ), tot AS (
            SELECT sum(c) AS tc, sum(a) AS ta FROM s
        ), ok AS (
            SELECT source FROM per, tot
            WHERE source IS NOT NULL AND v > 0 AND sa * tc >= ta * sc
        )
        SELECT d.* FROM documents d JOIN ok USING (source)
    """
    sql["user_longest_streak"] = """
        WITH d AS (
            SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY user_id, day HAVING count(*) >= 2
        ), i AS (
            SELECT user_id, day,
                datediff('day', DATE '1970-01-01', day)
                  - row_number() OVER (
                        PARTITION BY user_id ORDER BY day) AS grp
            FROM d
        ), r AS (
            SELECT user_id, grp, count(*) AS run_len
            FROM i GROUP BY user_id, grp
        )
        SELECT user_id, CAST(max(run_len) AS BIGINT) AS longest_streak
        FROM r GROUP BY user_id
    """
    sql["events_transition_matrix"] = """
        WITH s AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        SELECT prev AS from_type, event_type AS to_type,
               count(*) AS n
        FROM s WHERE prev IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
    """
    sql["events_interval_coverage"] = """
        WITH iv AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + GREATEST(
                       CAST(floor(value * 1000000.0) AS BIGINT), 0) AS e
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND value IS NOT NULL),
        m AS (
            SELECT user_id, s, e,
                   max(e) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pmax
            FROM iv)
        SELECT user_id,
               CAST(SUM(CASE WHEN pmax IS NULL OR pmax < s THEN e - s
                        WHEN e > pmax THEN e - pmax ELSE 0 END)
                   AS BIGINT) AS covered_us
        FROM m GROUP BY user_id
    """
    sql["events_resample_hourly"] = """
        WITH ev AS (
            SELECT user_id, ts, max_by(value, event_id) AS value
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND value IS NOT NULL
            GROUP BY user_id, ts),
        b AS (
            SELECT user_id, date_trunc('hour', min(ts)) AS lo,
                   date_trunc('hour', max(ts)) AS hi
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND value IS NOT NULL
            GROUP BY user_id),
        grid AS (
            SELECT user_id,
                   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS gts
            FROM b)
        SELECT g.user_id, g.gts, e.value
        FROM grid g ASOF LEFT JOIN ev e
          ON g.user_id = e.user_id AND g.gts >= e.ts
    """
    sql["wmedian_price_by_flag"] = """
        WITH w AS (
            SELECT l_returnflag, l_extendedprice AS v,
                   CAST(l_quantity AS BIGINT) AS wt
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        c AS (
            SELECT l_returnflag, v,
                   SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(wt) OVER (PARTITION BY l_returnflag) AS total
            FROM w)
        SELECT l_returnflag, MIN(v) AS wmedian
        FROM c WHERE 2 * cw >= total GROUP BY l_returnflag
    """
    sql["explode_doc_words"] = """
        WITH p AS (
            SELECT doc_id, string_split(text, ' ') AS parts
            FROM documents WHERE text IS NOT NULL)
        SELECT doc_id,
               unnest(range(1, len(parts) + 1)) AS seg_idx,
               unnest(parts) AS segment
        FROM p
    """
    sql["events_iqr_outliers"] = """
        WITH b AS (
            SELECT event_type,
                   quantile_disc(value, 0.25) AS q1,
                   quantile_disc(value, 0.75) AS q3
            FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type)
        SELECT e.event_type, count(*) AS n_outliers
        FROM events e JOIN b USING (event_type)
        WHERE e.value IS NOT NULL
          AND (e.value < b.q1 - 1.5 * (b.q3 - b.q1)
               OR e.value > b.q3 + 1.5 * (b.q3 - b.q1))
        GROUP BY e.event_type
    """
    sql["lineitem_fk_orphans"] = """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_violations
        FROM lineitem l
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey
              AND o.o_orderpriority = '1-URGENT')
        GROUP BY 1
    """
    sql["benford_extendedprice"] = """
        WITH u AS (
            SELECT CAST(floor(abs(l_extendedprice) * 100.0) AS BIGINT) AS v
            FROM lineitem),
        f AS (
            SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM u WHERE v > 0),
        c AS (SELECT digit, count(*) AS n FROM f GROUP BY 1),
        t AS (SELECT sum(n) AS total FROM c)
        SELECT digit, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS frac
        FROM c, t
    """
    sql["events_minmax_by_type"] = """
        WITH b AS (
            SELECT event_id, event_type,
                   CAST(floor(value * 100.0) AS BIGINT) AS c
            FROM events WHERE event_type IS NOT NULL),
        m AS (
            SELECT event_type, min(c) AS mn, max(c) AS mx
            FROM b WHERE c IS NOT NULL GROUP BY 1)
        SELECT b.event_id, b.event_type,
               CASE WHEN b.c IS NOT NULL AND m.mx > m.mn
                    THEN CAST(b.c - m.mn AS DOUBLE)
                         / CAST(m.mx - m.mn AS DOUBLE)
               END AS scaled
        FROM b LEFT JOIN m USING (event_type)
    """
    sql["first_touch_attribution"] = """
        WITH f AS (
            SELECT user_id, event_type AS first_type
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC) = 1),
        p AS (
            SELECT user_id,
                   sum(CAST(floor(value * 100.0) AS BIGINT)) AS cents
            FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL
            GROUP BY 1)
        SELECT first_type, CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(coalesce(p.cents, 0)) AS BIGINT) AS purchase_cents
        FROM f LEFT JOIN p USING (user_id)
        GROUP BY 1
    """
    sql["clicks_unconverted_1h"] = """
        WITH c AS (
            SELECT event_id, ts, user_id FROM events
            WHERE event_type = 'click' AND ts IS NOT NULL
              AND user_id IS NOT NULL),
        p AS (
            SELECT ts, user_id FROM events
            WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND user_id IS NOT NULL)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_unconverted
        FROM c
        WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = c.user_id
              AND p.ts >= c.ts
              AND p.ts <= c.ts + INTERVAL 1 HOUR)
        GROUP BY 1
    """
    sql["source_vocab_overlap"] = """
        WITH raw AS (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL),
        w AS (SELECT DISTINCT source, term FROM raw WHERE term <> ''),
        sizes AS (SELECT source, count(*) AS n FROM w GROUP BY 1),
        inter AS (
            SELECT a.source AS group_a, b.source AS group_b,
                   count(*) AS n_common
            FROM w a JOIN w b
              ON a.term = b.term AND a.source < b.source
            GROUP BY 1, 2)
        SELECT group_a, group_b,
               CAST(n_common AS BIGINT) AS n_common,
               CAST(sa.n + sb.n - n_common AS BIGINT) AS n_union,
               CAST(n_common AS DOUBLE)
                   / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = inter.group_a
        JOIN sizes sb ON sb.source = inter.group_b
    """
    sql["events_hourly_autocorr"] = """
        WITH c AS (
            SELECT epoch_us(ts) // 3600000000 AS b, count(*) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1),
        p AS (SELECT n AS y, lag(n) OVER (ORDER BY b) AS x FROM c),
        s AS (
            SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy,
                   sum(x * y) AS sxy
            FROM p WHERE x IS NOT NULL)
        SELECT CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                     AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               ELSE NULL END AS autocorr
        FROM s
    """
    sql["priority_late_orders"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """
    sql["events_spearman_by_user"] = """
        WITH r AS (
            SELECT user_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY value, event_id) AS x,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS y
            FROM events
            WHERE user_id IS NOT NULL AND value IS NOT NULL
              AND ts IS NOT NULL),
        s AS (
            SELECT user_id, count(*) AS n,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(y * y) AS syy,
                   sum(x * y) AS sxy
            FROM r GROUP BY 1)
        SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                     AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               ELSE NULL END AS spearman
        FROM s
    """
    sql["events_daily_delta"] = """
        WITH c AS (
            SELECT epoch_us(ts) // 86400000000 AS b, count(*) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY 1)
        SELECT make_timestamp(b * 86400000000) AS bucket_ts,
               CAST(n AS BIGINT) AS n,
               CAST(n - lag(n) OVER (ORDER BY b) AS BIGINT) AS delta,
               CASE WHEN lag(n) OVER (ORDER BY b) <> 0
                    THEN CAST(n AS DOUBLE)
                         / CAST(lag(n) OVER (ORDER BY b) AS DOUBLE)
               END AS ratio
        FROM c
    """
    sql["cdc_txn_two_tables"] = """
        WITH mx AS (SELECT max(event_id) + 1 AS m FROM events),
        full_t AS (
            SELECT event_id FROM events
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error'),
        v1e AS (
            SELECT e.* FROM events e, mx
            WHERE (e.event_id * 3) // mx.m <= 1),
        v1_t AS (
            SELECT event_id FROM v1e
            QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
                AND event_type <> 'error')
        SELECT 'events_txn_full' AS table_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(event_id) AS BIGINT) AS sum_event_id
        FROM full_t
        UNION ALL
        SELECT 'events_txn_v1',
               CAST(count(*) AS BIGINT),
               CAST(sum(event_id) AS BIGINT)
        FROM v1_t
    """
    sql["token_quantiles_by_source"] = r"""
        WITH s AS (
            SELECT source,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_words
            FROM documents
            WHERE source IS NOT NULL AND text IS NOT NULL),
        r AS (
            SELECT source, n_words,
                   row_number() OVER (
                       PARTITION BY source ORDER BY n_words) AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM s)
        SELECT source,
               max(CASE WHEN rn = least(n, greatest(1,
                   CAST(ceil(0.25 * n) AS BIGINT))) THEN n_words END) AS p25,
               max(CASE WHEN rn = least(n, greatest(1,
                   CAST(ceil(0.5 * n) AS BIGINT))) THEN n_words END) AS p50,
               max(CASE WHEN rn = least(n, greatest(1,
                   CAST(ceil(0.75 * n) AS BIGINT))) THEN n_words END) AS p75
        FROM r GROUP BY source
    """
    sql["events_k_core"] = """
        WITH raw AS (
            SELECT event_id % 3000 AS x,
                   (event_id // 7 + user_id * 13) % 3000 AS y
            FROM events WHERE user_id IS NOT NULL),
        und AS (SELECT x AS a, y AS b FROM raw
                UNION SELECT y, x FROM raw),
        e0 AS (SELECT a, b FROM und WHERE a <> b),
        a0 AS (SELECT a AS node FROM e0 GROUP BY a HAVING count(*) >= 4),
        e1 AS (SELECT e.a, e.b FROM e0 e
               JOIN a0 p ON e.a = p.node JOIN a0 q ON e.b = q.node),
        a1 AS (SELECT a AS node FROM e1 GROUP BY a HAVING count(*) >= 4),
        e2 AS (SELECT e.a, e.b FROM e1 e
               JOIN a1 p ON e.a = p.node JOIN a1 q ON e.b = q.node),
        a2 AS (SELECT a AS node FROM e2 GROUP BY a HAVING count(*) >= 4),
        e3 AS (SELECT e.a, e.b FROM e2 e
               JOIN a2 p ON e.a = p.node JOIN a2 q ON e.b = q.node),
        a3 AS (SELECT a AS node FROM e3 GROUP BY a HAVING count(*) >= 4),
        e4 AS (SELECT e.a, e.b FROM e3 e
               JOIN a3 p ON e.a = p.node JOIN a3 q ON e.b = q.node),
        a4 AS (SELECT a AS node FROM e4 GROUP BY a HAVING count(*) >= 4),
        e5 AS (SELECT e.a, e.b FROM e4 e
               JOIN a4 p ON e.a = p.node JOIN a4 q ON e.b = q.node),
        a5 AS (SELECT a AS node FROM e5 GROUP BY a HAVING count(*) >= 4),
        e6 AS (SELECT e.a, e.b FROM e5 e
               JOIN a5 p ON e.a = p.node JOIN a5 q ON e.b = q.node)
        SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
        FROM e6 GROUP BY a
    """
    sql["events_assortativity"] = """
        WITH raw AS (
            SELECT event_id % 3000 AS x,
                   (event_id // 7 + user_id * 13) % 3000 AS y
            FROM events WHERE user_id IS NOT NULL),
        und AS (SELECT x AS a, y AS b FROM raw
                UNION SELECT y, x FROM raw),
        e0 AS (SELECT a, b FROM und WHERE a <> b),
        deg AS (SELECT a AS node, count(*) AS d FROM e0 GROUP BY 1),
        j AS (SELECT da.d AS x, db.d AS y
              FROM e0 e
              JOIN deg da ON e.a = da.node
              JOIN deg db ON e.b = db.node),
        s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(y * y) AS syy,
                     sum(x * y) AS sxy
              FROM j)
        SELECT CAST(n AS BIGINT) AS n_half_edges,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                     AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               ELSE NULL END AS assortativity
        FROM s
    """
    sql["events_moving_max_by_user"] = """
        SELECT event_id, user_id,
               max(CAST(floor(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   AS win_max_cents
        FROM events
    """
    sql["events_moving_median"] = """
        SELECT event_id, user_id,
               quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                   AS win_median
        FROM events
    """
    sql["events_gini_by_type"] = """
        WITH b AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100.0) AS BIGINT) AS c
            FROM events
            WHERE event_type IS NOT NULL),
        p AS (SELECT * FROM b WHERE c > 0),
        r AS (
            SELECT event_type, c,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY c, event_id) AS rn
            FROM p),
        s AS (
            SELECT event_type, count(*) AS n, sum(c) AS sx,
                   sum(rn * c) AS srx
            FROM r GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n_values,
               CASE WHEN n > 1 AND sx > 0
                    THEN CAST(2 * srx - (n + 1) * sx AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
               END AS gini
        FROM s
    """
    sql["doc_frequency_spectrum"] = """
        WITH w AS (
            SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents WHERE text IS NOT NULL),
        t AS (SELECT term, count(*) AS n FROM w
              WHERE term <> '' GROUP BY 1)
        SELECT n AS frequency, CAST(count(*) AS BIGINT) AS n_terms
        FROM t GROUP BY 1
    """
    sql["events_type_dow_chi2"] = """
        WITH c AS (
            SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
                   count(*) AS o
            FROM events
            WHERE event_type IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1, 2),
        m AS (
            SELECT *, sum(o) OVER (PARTITION BY event_type) AS rt,
                   sum(o) OVER (PARTITION BY dow) AS ct,
                   sum(o) OVER () AS tot
            FROM c)
        SELECT event_type, dow, CAST(o AS BIGINT) AS observed,
               CAST(rt * ct AS DOUBLE) / CAST(tot AS DOUBLE) AS expected,
               ((CAST(o AS DOUBLE)
                 - CAST(rt * ct AS DOUBLE) / CAST(tot AS DOUBLE))
                * (CAST(o AS DOUBLE)
                   - CAST(rt * ct AS DOUBLE) / CAST(tot AS DOUBLE)))
               / (CAST(rt * ct AS DOUBLE) / CAST(tot AS DOUBLE))
                   AS cell_chi2
        FROM m
    """
    sql["events_ks_drift"] = """
        WITH v AS (
            SELECT CAST(floor(value * 100.0) AS BIGINT) AS c,
                   (user_id % 2 = 0) AS grp
            FROM events
            WHERE value IS NOT NULL AND user_id IS NOT NULL),
        d AS (
            SELECT c,
                   sum(CASE WHEN grp THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) AS b
            FROM v GROUP BY 1),
        cum AS (
            SELECT c, sum(a) OVER (ORDER BY c) AS ca,
                   sum(b) OVER (ORDER BY c) AS cb
            FROM d),
        tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM d),
        m AS (
            SELECT max(abs(nb * ca - na * cb)) AS dnum
            FROM cum, tot)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(dnum AS BIGINT) AS d_num,
               CAST(dnum AS DOUBLE) / CAST(na * nb AS DOUBLE) AS ks
        FROM m, tot
    """
    sql["nation_trade_by_year"] = """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(floor(
                   l_extendedprice * (1 - l_discount) * 100.0
               ) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
           OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """
    sql["market_share_by_year"] = """
        WITH rev AS (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(floor(
                       l.l_extendedprice * (1 - l.l_discount) * 100.0
                   ) AS BIGINT) AS cents,
                   s.s_nationkey
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
                       AND p.p_type = 'PROMO'
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
                         AND r.r_name = 'ASIA'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        nk AS (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3')
        SELECT o_year,
               CAST(sum(CASE WHEN s_nationkey = (SELECT n_nationkey FROM nk)
                             THEN cents ELSE 0 END) AS BIGINT)
                   AS nation_cents,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN s_nationkey = (SELECT n_nationkey FROM nk)
                             THEN cents ELSE 0 END) AS DOUBLE)
                   / CAST(sum(cents) AS DOUBLE) AS mkt_share
        FROM rev GROUP BY 1
    """
    sql["discount_revenue_q6"] = """
        SELECT CAST(sum(CAST(floor(
                   l_extendedprice * l_discount * 100.0
               ) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24.0
    """
    sql["customer_order_histogram"] = """
        WITH c AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY 1)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM c GROUP BY 1
    """
    sql["small_qty_revenue_q17"] = """
        WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        li AS (
            SELECT l.l_partkey,
                   CAST(floor(l_quantity * 100.0) AS BIGINT) AS qi,
                   CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS pc
            FROM lineitem l JOIN bp ON l.l_partkey = bp.p_partkey),
        s AS (SELECT l_partkey, count(*) AS cnt, sum(qi) AS sq
              FROM li GROUP BY 1),
        f AS (
            SELECT li.pc FROM li JOIN s USING (l_partkey)
            WHERE CAST(qi AS DOUBLE)
                  < 0.2 * (CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE)))
        SELECT CAST(sum(pc) AS BIGINT) AS revenue_cents,
               CAST(sum(pc) AS DOUBLE) / 7.0 AS avg_yearly_cents
        FROM f
    """
    sql["indexed_term_lookup"] = """
        WITH final AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 7 <> 3),
        raw AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM final),
        w AS (SELECT DISTINCT doc_id, term FROM raw WHERE term <> '')
        SELECT term, CAST(doc_id AS BIGINT) AS doc_id
        FROM w WHERE term IN ('updated', 'join', 'spark')
    """
    sql["events_range_window_sum"] = """
        WITH e AS (
            SELECT event_id, user_id, ts,
                   COALESCE(CAST(floor(value * 100) AS BIGINT), 0) AS cents
            FROM events WHERE ts IS NOT NULL)
        SELECT event_id, user_id,
               CAST(sum(cents) OVER w AS BIGINT) AS win_sum_cents,
               CAST(count(*) OVER w AS BIGINT) AS win_n
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    """
    sql["events_mannwhitney_drift"] = """
        WITH v AS (
            SELECT CAST(floor(value * 100.0) AS BIGINT) AS c,
                   (user_id % 2 = 0) AS grp
            FROM events
            WHERE value IS NOT NULL AND user_id IS NOT NULL),
        d AS (
            SELECT c,
                   sum(CASE WHEN grp THEN 1 ELSE 0 END) AS a,
                   sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) AS b
            FROM v GROUP BY 1),
        cum AS (
            SELECT c, a, b,
                   sum(b) OVER (ORDER BY c) - b AS cb_excl
            FROM d),
        tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM d),
        u AS (SELECT sum(2 * a * cb_excl + a * b) AS u2 FROM cum)
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(u2 AS BIGINT) AS u2,
               CAST(u2 AS DOUBLE) / CAST(2 * na * nb AS DOUBLE) AS auc
        FROM u, tot
    """
    sql["events_clustering_coef"] = """
        WITH raw AS (
            SELECT user_id % 150 AS s, (user_id + event_id % 17) % 150 AS d
            FROM events WHERE user_id IS NOT NULL),
        e0 AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM raw WHERE s <> d),
        und AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        deg AS (SELECT a AS node, count(*) AS degree FROM und GROUP BY 1),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e0 e1
            JOIN e0 e2 ON e2.a = e1.b
            JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
        corners AS (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri),
        tcnt AS (SELECT node, count(*) AS nt FROM corners GROUP BY 1)
        SELECT deg.node, CAST(degree AS BIGINT) AS degree,
               CAST(coalesce(nt, 0) AS BIGINT) AS n_triangles,
               CASE WHEN degree >= 2
                    THEN CAST(2 * coalesce(nt, 0) AS DOUBLE)
                         / CAST(degree * (degree - 1) AS DOUBLE)
               END AS clustering
        FROM deg LEFT JOIN tcnt USING (node)
    """
    sql["events_dwell_by_type"] = """
        WITH s AS (
            SELECT event_type, ts,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS nxt
            FROM events WHERE ts IS NOT NULL),
        g AS (
            SELECT event_type,
                   epoch_us(nxt) - epoch_us(ts) AS gap
            FROM s WHERE nxt IS NOT NULL)
        SELECT event_type AS attr,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(gap) AS BIGINT) AS total_us,
               CAST(max(gap) AS BIGINT) AS max_us
        FROM g GROUP BY 1
    """
    sql["dup_rate_by_source"] = """
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
               CASE WHEN count(*) > 0
                    THEN CAST(count(*) - count(DISTINCT text) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE)
               END AS dup_fraction
        FROM documents GROUP BY source
    """
    sql["gap_cv_by_user"] = """
        WITH g AS (
            SELECT user_id,
                   CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS BIGINT) AS gap_us
            FROM events),
        c AS (SELECT user_id AS k, gap_us // 1000000 AS v
              FROM g WHERE gap_us IS NOT NULL),
        a AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(v) AS BIGINT) AS s1,
                     CAST(sum(v * v) AS BIGINT) AS s2
              FROM c GROUP BY k),
        m AS (SELECT k, n, CAST(s1 AS DOUBLE) / n AS mean,
                     CAST(s2 AS DOUBLE) / n AS e2
              FROM a)
        SELECT k AS user_id, n AS n_gaps,
               CASE WHEN mean > 0
                    THEN sqrt(e2 - mean * mean) / mean END AS cv
        FROM m
    """
    sql["user_growth_curve"] = """
        WITH f AS (
            SELECT user_id,
                   min(epoch_us(ts) // 86400000000) AS first_day
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
            GROUP BY 1),
        d AS (SELECT first_day, count(*) AS new_users
              FROM f GROUP BY 1)
        SELECT make_timestamp(first_day * 86400000000) AS day,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(sum(new_users) OVER (ORDER BY first_day) AS BIGINT)
                   AS cum_users
        FROM d
    """
    sql["top_terms_by_source"] = """
        WITH w AS (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL),
        t AS (SELECT source, term, count(*) AS n FROM w
              WHERE term <> '' GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY source ORDER BY n DESC, term ASC) AS rn
              FROM t)
        SELECT source, term, CAST(n AS BIGINT) AS n
        FROM r WHERE rn <= 5
    """
    sql["lang_mix_by_source"] = """
        SELECT source,
               CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
               CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
               CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS n_es,
               CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS n_fr,
               CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS n_zh
        FROM documents
        GROUP BY source
    """
    sql["events_value_share_by_type"] = """
        WITH c AS (
            SELECT event_type,
                   CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events
            WHERE event_type IS NOT NULL
              AND CAST(floor(value * 100.0) AS BIGINT) > 0
            GROUP BY 1),
        t AS (SELECT sum(cents) AS total FROM c)
        SELECT event_type, cents,
               CAST(cents AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM c, t
    """
    sql["order_value_quartiles_by_status"] = """
        WITH s AS (
            SELECT o_orderstatus, o_totalprice AS v
            FROM orders WHERE o_totalprice IS NOT NULL),
        r AS (
            SELECT o_orderstatus, v,
                   row_number() OVER (
                       PARTITION BY o_orderstatus ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM s)
        SELECT o_orderstatus,
               max(CASE WHEN rn = least(n, greatest(1,
                   CAST(ceil(0.25 * n) AS BIGINT))) THEN v END) AS p25,
               max(CASE WHEN rn = least(n, greatest(1,
                   CAST(ceil(0.5 * n) AS BIGINT))) THEN v END) AS p50,
               max(CASE WHEN rn = least(n, greatest(1,
                   CAST(ceil(0.75 * n) AS BIGINT))) THEN v END) AS p75
        FROM r GROUP BY o_orderstatus
    """
    sql["similar_doc_pairs"] = """
        WITH aug AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents
            WHERE doc_id % 25 = 0
        ), w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM aug WHERE text IS NOT NULL
        ), s AS (
            SELECT DISTINCT doc_id,
                unnest(list_transform(
                    generate_series(1, greatest(len(ws) - 4, 0)),
                    i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                )) AS sh
            FROM w
        ), sz AS (
            SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
            FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.doc_a, i.doc_b, CAST(i.c AS BIGINT) AS inter_words,
               CAST(za.n + zb.n - i.c AS BIGINT) AS union_words
        FROM inter i
        JOIN sz za ON za.doc_id = i.doc_a
        JOIN sz zb ON zb.doc_id = i.doc_b
        WHERE 9 * i.c >= 4 * (za.n + zb.n)
    """
    sql["doc_dup_window_stats"] = """
        WITH w AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents WHERE text IS NOT NULL
        ), s AS (
            SELECT DISTINCT doc_id,
                unnest(list_transform(
                    generate_series(1, greatest(len(ws) - 4, 0)),
                    i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                )) AS sh
            FROM w
        ), df AS (
            SELECT sh, count(*) AS cnt FROM s GROUP BY sh
        )
        SELECT s.doc_id, count(*) AS n_windows,
               CAST(sum(CASE WHEN df.cnt >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_windows,
               CAST(sum(CASE WHEN df.cnt >= 2 THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS dup_frac
        FROM s JOIN df USING (sh) GROUP BY s.doc_id
    """
    sql["incremental_join_view_events"] = """
        WITH f AS (
            SELECT event_id, ts, user_id, value FROM events
            WHERE event_type <> 'error' OR event_type IS NULL
        ), d AS (
            SELECT user_id, event_type AS last_event_type,
                   CAST(floor(value * 100) AS BIGINT) AS last_value_cents
            FROM events QUALIFY row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT f.event_id, f.ts, f.user_id, f.value,
               d.last_event_type, d.last_value_cents
        FROM f LEFT JOIN d USING (user_id)
    """
    return sql
