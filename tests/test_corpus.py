"""Segment-granularity corpus operators (pipelines/corpus.py) vs DuckDB.

Edge cases the SQL semantics force: empty-string segments (doubled
separators), empty text (splits to ['']), null text (null out), documents
that lose every segment (empty string, not a dropped row), and
parallelism/batching invariance of the corpus-wide decisions.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray


EDGE_DOCS = [
    (1, "privacy policy"),
    (2, "real content one privacy policy"),
    (3, "privacy policy"),
    (4, "real  content"),  # doubled separator -> empty segment
    (5, ""),
    (6, None),
    (7, "unique words only here"),
    (8, "privacy policy privacy policy"),
]


def _edge_ds(num_blocks: int = 3):
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in EDGE_DOCS], type=pa.int64()),
            "text": pa.array([s for _, s in EDGE_DOCS], type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(num_blocks)


def _edge_con():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", EDGE_DOCS)
    return con


def _sorted_df(obj) -> pd.DataFrame:
    df = obj.to_pandas() if hasattr(obj, "to_pandas") else obj
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


REMOVE_SQL = """
    WITH segs AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
               generate_subscripts(string_split(text, ' '), 1) AS idx
        FROM documents
    ), freq AS (
        SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
    ), kept AS (
        SELECT s.doc_id, s.seg, s.idx
        FROM segs s JOIN freq f USING (seg) WHERE f.df < {min_df}
    )
    SELECT d.doc_id,
           COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL ELSE '' END)
               AS text
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS t2
               FROM kept GROUP BY doc_id) k USING (doc_id)
"""

FIRST_SQL = """
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
           COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL ELSE '' END)
               AS text
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS t2
               FROM w WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
"""


@pytest.mark.parametrize("min_df", [2, 3])
def test_remove_frequent_segments_matches_sql(ray_session, min_df):
    from airbyte_destination_ray.pipelines.corpus import (
        remove_frequent_segments,
    )

    out = remove_frequent_segments(
        _edge_ds(), sep=" ", min_df=min_df, num_partitions=4
    )
    con = _edge_con()
    oracle = con.execute(REMOVE_SQL.format(min_df=min_df)).df()
    pd.testing.assert_frame_equal(
        _sorted_df(out), _sorted_df(oracle), check_dtype=False
    )


def test_dedup_segments_first_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.corpus import dedup_segments_first

    out = dedup_segments_first(_edge_ds(), sep=" ", num_partitions=4)
    con = _edge_con()
    oracle = con.execute(FIRST_SQL).df()
    pd.testing.assert_frame_equal(
        _sorted_df(out), _sorted_df(oracle), check_dtype=False
    )


def test_dedup_segments_first_batching_invariant(ray_session):
    """The corpus-wide first-occurrence decision is (doc_id, idx)-ordered,
    never arrival-ordered — any block layout and partition count must give
    the same bytes."""
    from airbyte_destination_ray.pipelines.corpus import dedup_segments_first

    ref = _sorted_df(
        dedup_segments_first(_edge_ds(1), sep=" ", num_partitions=2)
    )
    for blocks, parts in [(2, 7), (8, 3)]:
        got = _sorted_df(
            dedup_segments_first(
                _edge_ds(blocks), sep=" ", num_partitions=parts
            )
        )
        pd.testing.assert_frame_equal(got, ref)


def test_remove_frequent_segments_all_removed_is_empty_string(ray_session):
    """A doc whose every segment is boilerplate becomes '' (kept row),
    matching COALESCE(string_agg(...), '') — it must NOT disappear."""
    from airbyte_destination_ray.pipelines.corpus import (
        remove_frequent_segments,
    )

    out = _sorted_df(
        remove_frequent_segments(
            _edge_ds(), sep=" ", min_df=2, num_partitions=4
        )
    )
    row = out[out.doc_id == 1]
    assert len(row) == 1 and row.iloc[0]["text"] == ""
    assert out[out.doc_id == 6].iloc[0]["text"] is None or pd.isna(
        out[out.doc_id == 6].iloc[0]["text"]
    )


def test_top_terms_matches_sql_with_boundary_tie(ray_session):
    """Terms tied in count at the k boundary resolve by term ASC in both
    engines."""
    from airbyte_destination_ray.pipelines.corpus import top_terms

    docs = [
        (1, "Apple banana CHERRY apple"),
        (2, "banana date, cherry; egg"),
        (3, "fig egg fig"),
        (4, None),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([s for _, s in docs], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    out = _sorted_df(top_terms(ds, k=4, num_partitions=3))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    oracle = con.execute(
        """
        SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                AS term FROM documents)
        WHERE term <> '' GROUP BY term ORDER BY n DESC, term LIMIT 4
        """
    ).df()
    pd.testing.assert_frame_equal(out, _sorted_df(oracle), check_dtype=False)


def test_chunk_documents_matches_sql(ray_session):
    """Boundary lengths (exact multiple, one-over, shorter-than-chunk,
    empty), multi-byte codepoints, and null text vs DuckDB substr."""
    from airbyte_destination_ray.pipelines.corpus import chunk_documents

    docs = [
        (1, "a" * 10),      # exactly cs + step: 2 chunks
        (2, "b" * 11),      # one over: 3 chunks
        (3, "short"),
        (4, ""),
        (5, None),
        (6, "ü" * 9),       # multi-byte codepoints count as 1 char
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([s for _, s in docs], type=pa.string()),
        }
    )
    out = _sorted_df(
        chunk_documents(
            ray.data.from_arrow(t).repartition(2), chunk_size=6, overlap=2
        )
    )
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.execute(
        """
        WITH p AS (SELECT doc_id, text, length(text) l FROM documents
                   WHERE text IS NOT NULL),
        c AS (SELECT doc_id, text, unnest(generate_series(0,
                 CASE WHEN l <= 6 THEN 0
                      ELSE CAST(ceil((l - 6) * 1.0 / 4) AS BIGINT) END))
                 AS chunk_idx FROM p)
        SELECT doc_id, chunk_idx, substr(text, chunk_idx * 4 + 1, 6) AS chunk
        FROM c
        """
    ).df()
    pd.testing.assert_frame_equal(out, _sorted_df(oracle), check_dtype=False)
    # overlap invariant: consecutive chunks share exactly `overlap` chars
    d2 = out[out.doc_id == 2].sort_values("chunk_idx").chunk.tolist()
    assert d2 == ["bbbbbb", "bbbbbb", "bbb"]


def test_filter_above_quantile_matches_quantile_cont(ray_session):
    """Interpolated (even-count) median: threshold falls between two
    values; both engines keep the same rows.  Nulls ignored + dropped."""
    from airbyte_destination_ray.pipelines.ops import filter_above_quantile

    vals = [1, 2, 3, 4, 5, 6, 7, 100, None, None]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(vals)), type=pa.int64()),
            "n_chars": pa.array(vals, type=pa.int64()),
        }
    )
    out = _sorted_df(
        filter_above_quantile(
            ray.data.from_arrow(t).repartition(3),
            value_col="n_chars",
            q=0.5,
        )
    )
    con = duckdb.connect()
    con.register("t", t)
    oracle = con.execute(
        """
        SELECT doc_id, n_chars FROM t
        WHERE n_chars >= (SELECT quantile_cont(n_chars, 0.5) FROM t)
        """
    ).df()
    pd.testing.assert_frame_equal(out, _sorted_df(oracle), check_dtype=False)


def test_filter_above_quantile_compressed_mode_close(ray_session):
    """Past `delta` values the digest compresses; the percentile cut must
    stay within ~1/delta rank error of the exact cut."""
    import numpy as np

    from airbyte_destination_ray.pipelines.ops import filter_above_quantile

    n = 20000
    vals = np.random.default_rng(7).permutation(n).astype(np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "n_chars": pa.array(vals, type=pa.int64()),
        }
    )
    out = filter_above_quantile(
        ray.data.from_arrow(t).repartition(8),
        value_col="n_chars",
        q=0.9,
        delta=512,
    )
    kept = out.count()
    assert abs(kept - n * 0.1) < n * (3 / 512)


DECON_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta"),     # benchmark
    (2, "alpha beta gamma delta epsilon eta"),      # shares 5-gram with 1
    (3, "zeta epsilon delta gamma beta alpha"),     # reversed: no shared gram
    (4, "alpha beta gamma delta"),                  # < k tokens: survives
    (5, ""),                                        # empty: survives
    (6, None),                                      # null: survives
    (7, "totally different words in this document here"),
]


def _decon_sql(k: int) -> str:
    return f"""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        grams AS (
            SELECT doc_id, array_to_string(parts[i:i+{k - 1}], ' ') AS g
            FROM docs,
                 unnest(generate_series(1, len(parts) - {k - 1})) AS t(i)),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id = 1),
        cont AS (SELECT DISTINCT doc_id FROM grams JOIN bench USING (g))
        SELECT d.doc_id, d.text FROM documents d ANTI JOIN cont USING (doc_id)
    """


def test_decontaminate_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.corpus import decontaminate

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DECON_DOCS], type=pa.int64()),
            "text": pa.array([s for _, s in DECON_DOCS], type=pa.string()),
        }
    )
    docs = ray.data.from_arrow(t).repartition(3)
    bench = docs.map_batches(
        lambda b: b.filter(pa.compute.equal(b.column("doc_id"), 1)),
        batch_format="pyarrow",
        batch_size=None,
    )
    out = _sorted_df(decontaminate(docs, bench, sep=" ", gram_k=5))

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DECON_DOCS)
    exp = _sorted_df(con.execute(_decon_sql(5)).fetchdf())
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # doc 1 (benchmark itself) and doc 2 (shares the 5-gram) removed;
    # reversal, short, empty and null docs survive
    assert sorted(out["doc_id"]) == [3, 4, 5, 6, 7]


def test_decontaminate_empty_benchmark_keeps_all(ray_session):
    from airbyte_destination_ray.pipelines.corpus import decontaminate

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["a b c d e f", "g h i j k l"]),
        }
    )
    docs = ray.data.from_arrow(t)
    bench = docs.map_batches(
        lambda b: b.slice(0, 0), batch_format="pyarrow", batch_size=None
    )
    assert decontaminate(docs, bench, gram_k=5).count() == 2


def test_decontaminate_batching_invariant(ray_session):
    from airbyte_destination_ray.pipelines.corpus import decontaminate

    rng_words = ["w%d" % (i % 23) for i in range(11)]
    rows = [
        (i, " ".join(rng_words[(i * 7 + j) % 11] for j in range(9)))
        for i in range(60)
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
            "text": pa.array([s for _, s in rows]),
        }
    )
    bench_t = t.filter(pa.compute.equal(t.column("doc_id"), 0))
    outs = []
    for blocks in (1, 6):
        docs = ray.data.from_arrow(t).repartition(blocks)
        bench = ray.data.from_arrow(bench_t)
        outs.append(
            _sorted_df(decontaminate(docs, bench, sep=" ", gram_k=5))
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bucket_by_quantiles_matches_sql(ray_session):
    """Quartile labels == SQL 1 + Σ (v > quantile_cont(q)); boundary values
    (exactly at a threshold) stay in the LOWER bucket on both sides; nulls
    get a null bucket."""
    import duckdb
    import pandas as pd
    import ray.data

    from airbyte_destination_ray.pipelines.ops import bucket_by_quantiles

    vals = [1, 2, 3, 4, 5, 6, 7, 8, None, 4, 4, 4]  # ties at the median
    t = pa.table(
        {
            "id": pa.array(range(len(vals)), type=pa.int64()),
            "v": pa.array(vals, type=pa.int64()),
        }
    )
    out = (
        bucket_by_quantiles(
            ray.data.from_arrow(t).repartition(3), value_col="v"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        """
        WITH q AS (SELECT quantile_cont(v, 0.25) q1,
                          quantile_cont(v, 0.50) q2,
                          quantile_cont(v, 0.75) q3 FROM t)
        SELECT id, v,
               CASE WHEN v IS NULL THEN NULL
                    ELSE 1 + CAST(v > q1 AS BIGINT)
                           + CAST(v > q2 AS BIGINT)
                           + CAST(v > q3 AS BIGINT) END AS bucket
        FROM t, q ORDER BY id
        """
    ).df()
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # equal-frequency sanity on a bigger uniform corpus
    big = pa.table(
        {
            "id": pa.array(range(4000), type=pa.int64()),
            "v": pa.array(
                np.random.default_rng(2).permutation(4000), type=pa.int64()
            ),
        }
    )
    got = bucket_by_quantiles(
        ray.data.from_arrow(big).repartition(5), value_col="v"
    ).to_pandas()
    counts = got["bucket"].value_counts()
    assert set(counts.index) == {1, 2, 3, 4}
    assert counts.max() - counts.min() <= 2


def test_inverted_index_build_and_lookup(ray_session, tmp_path):
    """Index build + point lookup == SQL distinct (term, doc) pairs; a
    term absent from the corpus returns nothing; only the needed bucket
    directories are read (proven by deleting the others)."""
    import pathlib
    import shutil

    import ray.data

    from airbyte_destination_ray.functions.hashing import stable_hash_array
    from airbyte_destination_ray.pipelines.corpus import (
        build_inverted_index,
        lookup_postings,
    )

    docs = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array(
                [
                    "the quick fox",
                    "quick quick brown",
                    "fox jumps",
                    None,
                    "",
                    "the the the",
                ]
            ),
        }
    )
    idx = str(tmp_path / "inv")
    build_inverted_index(
        ray.data.from_arrow(docs).repartition(3), idx, num_buckets=8
    )
    out = (
        lookup_postings(idx, ["quick", "fox", "zebra"], num_buckets=8)
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(
        """
        WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents WHERE text IS NOT NULL)
        SELECT DISTINCT term, doc_id FROM w
        WHERE term IN ('quick', 'fox', 'zebra')
        ORDER BY term, doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        out[["term", "doc_id"]], exp, check_dtype=False
    )

    # prune proof: remove every bucket dir the probe terms don't hash to
    # int(h) FIRST: np.uint64 % python-int silently converts to float64
    keep = {
        int(h) % 8
        for h in stable_hash_array(pa.array(["quick", "fox"]))
    }
    removed = 0
    for d in pathlib.Path(idx).glob("bucket_p=*"):
        if int(d.name.split("=")[1]) not in keep:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0
    out2 = (
        lookup_postings(idx, ["quick", "fox"], num_buckets=8)
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    exp2 = exp[exp["term"] != "zebra"].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out2[["term", "doc_id"]], exp2, check_dtype=False
    )


# ---------------------------------------------------------------------------
# doc_top_terms (per-doc tf/df relevance)
# ---------------------------------------------------------------------------


def _docs_ds(rows, blocks=3):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    ).repartition(blocks)


def test_doc_top_terms_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.corpus import doc_top_terms

    rows = [
        (1, "alpha beta beta gamma"),
        (2, "alpha alpha delta"),
        (3, "beta beta beta"),
        (4, ""),            # no terms -> no rows
        (5, None),          # null text -> no rows
        (6, "unique-term! only; here"),
    ]
    out = (
        doc_top_terms(_docs_ds(rows), k=2, num_partitions=4)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        ),
    )
    oracle = con.sql(
        """
        WITH tok AS (
            SELECT doc_id, unnest(string_split_regex(lower(text),
                '[^a-z0-9]+')) AS term
            FROM documents WHERE text IS NOT NULL
        ), tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) tf FROM tok
            WHERE term <> '' GROUP BY doc_id, term
        ), df AS (SELECT term, CAST(count(*) AS BIGINT) df FROM tf GROUP BY term)
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE)/df.df AS score,
               CAST(row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf AS DOUBLE)/df.df DESC, tf.term)
                   AS BIGINT) AS rank
        FROM tf JOIN df USING (term) QUALIFY rank <= 2
        """
    ).df().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], oracle[sorted(oracle.columns)],
        check_dtype=False,
    )
    assert set(out["doc_id"]) == {1, 2, 3, 6}  # 4 and 5 emit nothing


# ---------------------------------------------------------------------------
# pack_documents (two-phase prefix-sum packing)
# ---------------------------------------------------------------------------


def test_pack_documents_prefix_and_edges(ray_session):
    from airbyte_destination_ray.pipelines.corpus import pack_documents

    # token counts: 3, 4, 2, (null skipped), 5, 1 -> budget 5
    rows = [
        (10, "a b c"),
        (11, "a b c d"),
        (12, "x  y"),        # doubled space still 2 tokens
        (13, None),
        (14, "1 2 3 4 5"),
        (15, "z"),
    ]
    out = (
        pack_documents(_docs_ds(rows, blocks=4), budget=5, span=2,
                       num_partitions=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # prefix-before: 0, 3, 7, 9, 14 -> packs 0, 0, 1, 1, 2
    assert out["doc_id"].tolist() == [10, 11, 12, 14, 15]
    assert out["n_tokens"].tolist() == [3, 4, 2, 5, 1]
    assert out["pack_id"].tolist() == [0, 0, 1, 1, 2]


def test_pack_documents_batch_invariant(ray_session):
    from airbyte_destination_ray.pipelines.corpus import pack_documents

    rng = np.random.default_rng(9)
    rows = [(i, " ".join(["w"] * int(rng.integers(1, 40)))) for i in range(500)]
    outs = []
    for blocks, span in ((2, 1 << 20), (9, 16)):
        outs.append(
            pack_documents(
                _docs_ds(rows, blocks=blocks), budget=64, span=span,
                num_partitions=5,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_top_ngrams_no_cross_document_grams(ray_session):
    from airbyte_destination_ray.pipelines.corpus import top_ngrams

    rows = [
        (1, "x y"),
        (2, "y x"),       # 'y x' must NOT merge with doc 1's tail
        (3, "x y z"),
        (4, "solo"),      # too short for a bigram
        (5, None),
    ]
    out = (
        top_ngrams(_docs_ds(rows, blocks=4), n=2, k=10, num_partitions=3)
        .to_pandas()
        .sort_values(["cnt", "gram"], ascending=[False, True])
        .reset_index(drop=True)
    )
    got = dict(zip(out["gram"], out["cnt"]))
    assert got == {"x y": 2, "y x": 1, "y z": 1}


def test_top_ngrams_trigrams(ray_session):
    from airbyte_destination_ray.pipelines.corpus import top_ngrams

    rows = [(1, "a b c d"), (2, "a b c")]
    out = top_ngrams(_docs_ds(rows, blocks=2), n=3, k=5).to_pandas()
    got = dict(zip(out["gram"], out["cnt"]))
    assert got == {"a b c": 2, "b c d": 1}


# ---------------------------------------------------------------------------
# exact-substring repeated spans (Lee et al. 2022)
# ---------------------------------------------------------------------------

SPAN_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps far away"),
    (3, "a b c x y z w a b c"),  # internal repeat, gap > k -> two spans
    (4, "unique tokens entirely here now"),
    (5, ""),
    (6, None),
    (7, "a b"),  # shorter than k
]


def _spans_sql(k: int) -> str:
    return f"""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS parts
            FROM documents WHERE text IS NOT NULL),
        wins AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   array_to_string(parts[i:i+{k - 1}], ' ') AS g
            FROM docs, unnest(generate_series(1, len(parts) - {k - 1})) AS t(i)),
        dup AS (
            SELECT doc_id, pos FROM wins
            WHERE g IN (SELECT g FROM wins GROUP BY g HAVING count(*) >= 2)),
        brk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (
                       PARTITION BY doc_id ORDER BY pos) <= {k}
                   THEN 0 ELSE 1 END AS b
            FROM dup),
        isl AS (
            SELECT doc_id, pos,
                   sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM brk)
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {k} AS BIGINT) AS span_end,
               CAST(max(pos) + {k} - min(pos) AS BIGINT) AS span_tokens
        FROM isl GROUP BY doc_id, island
    """


def test_repeated_ngram_spans_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.corpus import repeated_ngram_spans

    out = _sorted_df(
        repeated_ngram_spans(
            _docs_ds(SPAN_DOCS, blocks=3), sep=" ", gram_k=3, num_partitions=4
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", SPAN_DOCS)
    exp = _sorted_df(con.execute(_spans_sql(3)).fetchdf())
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # cross-doc shared prefix merges into one span per doc; the internal
    # repeat in doc 3 yields two spans (gap 7 > k=3)
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in out.itertuples(index=False)
    }
    assert spans == {(1, 0, 5), (2, 0, 5), (3, 0, 3), (3, 7, 10)}


def test_repeated_ngram_spans_batching_invariant(ray_session):
    from airbyte_destination_ray.pipelines.corpus import repeated_ngram_spans

    ref = _sorted_df(
        repeated_ngram_spans(_docs_ds(SPAN_DOCS, blocks=1), gram_k=3)
    )
    for blocks in (2, 5):
        got = _sorted_df(
            repeated_ngram_spans(
                _docs_ds(SPAN_DOCS, blocks=blocks), gram_k=3, num_partitions=2
            )
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_repeated_ngram_spans_no_duplicates_empty(ray_session):
    from airbyte_destination_ray.pipelines.corpus import repeated_ngram_spans

    rows = [(1, "all words differ here"), (2, "and these too friend")]
    out = repeated_ngram_spans(_docs_ds(rows, blocks=2), gram_k=3)
    assert out.count() == 0


TRIM_DOCS = SPAN_DOCS + [(8, "p q r"), (9, "p q r")]  # fully-covered docs


def _trim_sql(k: int) -> str:
    return f"""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS parts
            FROM documents WHERE text IS NOT NULL),
        toks AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, parts[i] AS tok
            FROM docs, unnest(generate_series(1, len(parts))) AS t(i)),
        wins AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   array_to_string(parts[i:i+{k - 1}], ' ') AS g
            FROM docs, unnest(generate_series(1, len(parts) - {k - 1})) AS t(i)),
        dup AS (
            SELECT doc_id, pos FROM wins
            WHERE g IN (SELECT g FROM wins GROUP BY g HAVING count(*) >= 2)),
        spans AS (
            SELECT doc_id, min(pos) AS s, max(pos) + {k} AS e
            FROM (
                SELECT doc_id, pos, sum(b) OVER (
                    PARTITION BY doc_id ORDER BY pos) AS island
                FROM (
                    SELECT doc_id, pos,
                           CASE WHEN pos - lag(pos) OVER (
                               PARTITION BY doc_id ORDER BY pos) <= {k}
                           THEN 0 ELSE 1 END AS b
                    FROM dup))
            GROUP BY doc_id, island),
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


def test_trim_repeated_spans_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.corpus import trim_repeated_spans

    out = _sorted_df(
        trim_repeated_spans(
            _docs_ds(TRIM_DOCS, blocks=3), sep=" ", gram_k=3, num_partitions=4
        )
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", TRIM_DOCS)
    exp = _sorted_df(con.execute(_trim_sql(3)).fetchdf())
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    got = dict(zip(out["doc_id"], out["text"]))
    # shared prefix cut from both docs; doc 3 keeps only its middle;
    # fully-duplicated docs 8/9 become EMPTY STRING (not dropped rows);
    # untouched / empty / null / short docs pass through unchanged
    assert got[1] == "over the lazy dog"
    assert got[2] == "far away"
    assert got[3] == "x y z w"
    assert got[8] == "" and got[9] == ""
    assert got[4] == "unique tokens entirely here now"
    assert got[5] == "" and got[6] is None and got[7] == "a b"


def test_trim_repeated_spans_batching_invariant(ray_session):
    from airbyte_destination_ray.pipelines.corpus import trim_repeated_spans

    ref = _sorted_df(
        trim_repeated_spans(_docs_ds(TRIM_DOCS, blocks=1), gram_k=3)
    )
    for blocks in (2, 5):
        got = _sorted_df(
            trim_repeated_spans(
                _docs_ds(TRIM_DOCS, blocks=blocks), gram_k=3, num_partitions=2
            )
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_doc_oov_fraction_counts(ray_session):
    """OOV-bigram fraction: corpus top-k membership, zero-bigram docs get
    NULL fraction, fraction = single division of exact counts."""
    import numpy as np
    import ray.data

    from airbyte_destination_ray.pipelines.corpus import doc_oov_fraction

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    "the cat sat",          # bigrams: "the cat", "cat sat"
                    "the cat ran far",      # "the cat", "cat ran", "ran far"
                    "one",                  # no bigrams → NULL frac
                    None,                   # null text → NULL frac
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(docs).repartition(2)
    # top_k=1 → only the most frequent bigram ("the cat", cnt 2) is in-vocab
    out = (
        doc_oov_fraction(ds, top_k=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.n_bigrams.to_dict() == {1: 2, 2: 3, 3: 0, 4: 0}
    assert out.n_oov.to_dict() == {1: 1, 2: 2, 3: 0, 4: 0}
    assert out.loc[1, "oov_frac"] == 1 / 2
    assert out.loc[2, "oov_frac"] == 2 / 3
    assert np.isnan(out.loc[3, "oov_frac"]) and np.isnan(out.loc[4, "oov_frac"])


WITHIN_SQL = """
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
           COALESCE(k.t2, CASE WHEN d.text IS NULL THEN NULL ELSE '' END)
               AS text
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(seg, ' ' ORDER BY idx) AS t2
               FROM w WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
"""


def test_dedup_segments_within_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.corpus import (
        dedup_segments_within,
    )

    out = dedup_segments_within(_edge_ds(), sep=" ")
    oracle = _edge_con().execute(WITHIN_SQL).df()
    pd.testing.assert_frame_equal(
        _sorted_df(out), _sorted_df(oracle), check_dtype=False
    )


def test_dedup_segments_within_semantics(ray_session):
    from airbyte_destination_ray.pipelines.corpus import (
        dedup_segments_within,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                [
                    "a b a c b a",   # repeats collapse in place
                    "x  x  y",       # doubled sep: '' repeats too
                    "",              # splits to [''] -> stays ''
                    None,            # stays null
                ],
                type=pa.string(),
            ),
        }
    )
    out = (
        dedup_segments_within(
            ray.data.from_arrow(t).repartition(2), sep=" "
        )
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    assert out[1] == "a b c"
    assert out[2] == "x  y"  # first '' kept, later '' dropped
    assert out[3] == ""
    assert pd.isna(out[4])
    # zero-exchange invariant: results identical regardless of blocking
    out1 = dedup_segments_within(
        ray.data.from_arrow(t).repartition(1), sep=" "
    ).to_pandas()
    out4 = dedup_segments_within(
        ray.data.from_arrow(t).repartition(4), sep=" "
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted_df(out1), _sorted_df(out4), check_dtype=False
    )


def test_top_terms_by_group_matches_sql(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from airbyte_destination_ray.pipelines.corpus import top_terms_by_group

    rng = np.random.default_rng(71)
    vocab = [f"w{i}" for i in range(60)]
    texts, srcs = [], []
    for src in ["a", "b", "c"]:
        for _ in range(50):
            texts.append(" ".join(rng.choice(vocab, size=10)))
            srcs.append(src)
    texts += [None, "tie tie one"]
    srcs += ["a", None]
    tbl = pa.table({"source": pa.array(srcs), "text": pa.array(texts)})
    got = (
        top_terms_by_group(
            ray.data.from_arrow(tbl).repartition(5),
            group_col="source",
            text_col="text",
            k=4,
        )
        .to_pandas()
        .sort_values(["source", "n", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            """
        WITH w AS (SELECT source, unnest(
                string_split_regex(lower(text), '[^a-z0-9]+')) AS term
            FROM tbl WHERE text IS NOT NULL AND source IS NOT NULL),
        t AS (SELECT source, term, count(*) AS n FROM w
              WHERE term <> '' GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY source ORDER BY n DESC, term ASC) rn FROM t)
        SELECT source, term, CAST(n AS BIGINT) AS n FROM r WHERE rn <= 4
        ORDER BY source, n DESC, term
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_dup_window_stats_vs_brute_force(ray_session):
    """Cross-doc duplicate-window profile vs an all-pairs python oracle:
    dup iff the window string occurs in >= 2 distinct docs."""
    import random
    import re

    import ray

    from airbyte_destination_ray.pipelines.corpus import dup_window_stats

    random.seed(31)
    vocab = [f"t{i}" for i in range(12)]
    rows = []
    for i in range(80):
        n = random.randint(2, 20)  # some docs below window_k=4
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(random.choice(vocab) for _ in range(n)),
            }
        )
    rows.append({"doc_id": 900, "text": rows[3]["text"]})  # exact copy
    rows.append({"doc_id": 901, "text": None})

    k = 4
    wins = {}
    for r in rows:
        if r["text"] is None:
            continue
        ws = re.split(r"\s+", r["text"].strip())
        s = {tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)}
        if s:
            wins[r["doc_id"]] = s
    from collections import Counter

    df = Counter(w for s in wins.values() for w in s)
    expected = {
        d: (
            len(s),
            sum(1 for w in s if df[w] >= 2),
        )
        for d, s in wins.items()
    }

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = dup_window_stats(ds, window_k=k, num_partitions=8).take_all()
    got = {r["doc_id"]: (r["n_windows"], r["n_dup_windows"]) for r in out}
    assert got == expected
    for r in out:
        assert r["dup_frac"] == r["n_dup_windows"] / r["n_windows"]


def test_doc_lm_score_matches_brute_force_and_batch_invariant(ray_session):
    """Bigram-LM integer scoring: exact vs a Python brute force (incl. the
    top-k cutoff tie order) and invariant to input block layout."""
    import re
    from collections import Counter

    import ray

    rows = []
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    for d in range(30):
        toks = [words[(d * 7 + j * j) % 5] for j in range(12)]
        rows.append({"doc_id": d, "text": " ".join(toks) + "  !! "})
    rows.append({"doc_id": 100, "text": None})
    rows.append({"doc_id": 101, "text": "solo"})  # 1 token -> no bigrams

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    c1 = Counter(w for r in rows if r["text"] for w in toks(r["text"]))
    c2 = Counter()
    per_doc = {}
    for r in rows:
        if r["text"] is None:
            continue
        ws = toks(r["text"])
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if bgs:
            per_doc[r["doc_id"]] = bgs
        c2.update(bgs)
    K = 7  # < distinct bigrams -> the cutoff bites
    top = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    score = {g: (1_000_000 * c) // c1[g.split(" ")[0]] for g, c in top}
    expected = {
        d: (
            len(bgs),
            sum(1 for g in bgs if g in score),
            sum(score.get(g, 0) for g in bgs),
        )
        for d, bgs in per_doc.items()
    }

    from airbyte_destination_ray.pipelines.corpus import doc_lm_score

    t = pa.Table.from_pylist(rows)
    for blocks in (1, 5):
        out = doc_lm_score(
            ray.data.from_arrow(t).repartition(blocks), top_k=K,
            num_partitions=4,
        ).take_all()
        got = {
            r["doc_id"]: (r["n_bigrams"], r["n_matched"], r["lm_score"])
            for r in out
        }
        assert got == expected


def test_cooccurrence_pmi_matches_brute_force_and_batch_invariant(
    ray_session,
):
    """Windowed PMI: exact vs Python brute force (vocab cutoff + ordered
    window pairs + integer score) and invariant to block layout."""
    import re
    from collections import Counter

    import ray

    rows = []
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for d in range(40):
        toks = [words[(d * 5 + j * 3 + j * j) % 6] for j in range(10)]
        rows.append({"doc_id": d, "text": " ".join(toks).upper()})
    rows.append({"doc_id": 100, "text": None})

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    W, V, MC, K, S = 2, 4, 2, 15, 1_000_000
    c1 = Counter(w for r in rows if r["text"] for w in toks(r["text"]))
    n_total = sum(c1.values())
    vocab = {
        w for w, _ in sorted(c1.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    }
    c2 = Counter()
    for r in rows:
        if r["text"] is None:
            continue
        ws = toks(r["text"])
        for i in range(len(ws)):
            for d in range(1, W + 1):
                if i + d < len(ws) and ws[i] in vocab and ws[i + d] in vocab:
                    c2[(ws[i], ws[i + d])] += 1
    scored = [
        (w1, w2, c, (S * c * n_total) // (c1[w1] * c1[w2]))
        for (w1, w2), c in c2.items()
        if c >= MC
    ]
    expected = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:K]

    from airbyte_destination_ray.pipelines.corpus import cooccurrence_pmi

    t = pa.Table.from_pylist(rows)
    for blocks in (1, 6):
        out = cooccurrence_pmi(
            ray.data.from_arrow(t).repartition(blocks),
            window=W, vocab_k=V, min_count=MC, top_k=K, num_partitions=4,
        ).take_all()
        got = [
            (r["w1"], r["w2"], r["c_ab"], r["pmi_scaled"]) for r in out
        ]
        assert got == expected


def test_split_assign_null_and_negative_ids(ray_session):
    """Null ids fall to the ELSE split (SQL CASE parity); negative ids
    refuse instead of silently diverging from signed SQL %."""
    import ray

    from airbyte_destination_ray.pipelines.corpus import split_assign_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, None], type=pa.int64()),
        "source": pa.array(["s", "s", "s"]),
        "n_chars": pa.array([10, 20, 40], type=pa.int64()),
    })
    out = {
        (r["grp"], r["split"]): (r["n_docs"], r["weight"])
        for r in split_assign_stats(
            ray.data.from_arrow(t)
        ).take_all()
    }
    assert out[("s", "test")] == (1, 40)  # the null-id row

    bad = pa.table({
        "doc_id": pa.array([-5], type=pa.int64()),
        "source": pa.array(["s"]),
        "n_chars": pa.array([1], type=pa.int64()),
    })
    import pytest as _pytest

    with _pytest.raises(Exception, match="non-negative"):
        split_assign_stats(ray.data.from_arrow(bad)).take_all()


def test_excise_duplicate_spans_keep_first_and_overlaps(ray_session):
    """ExactSubstr semantics: a window duplicated across docs survives
    only at its lexicographically-first (doc, pos) occurrence; within-doc
    repeats excise the later copy; overlapping covered windows union;
    short and empty docs pass through."""
    import ray

    from airbyte_destination_ray.pipelines.corpus import (
        excise_duplicate_spans,
    )

    K = 3
    span = "aa bb cc"          # the duplicated 3-token window
    rows = [
        # canonical first occurrence at doc 1 pos 2
        {"doc_id": 1, "text": f"x1 {span} y1"},
        # doc 2: same span at pos 1 -> excised
        {"doc_id": 2, "text": f"{span} z2 w2"},
        # doc 3: span twice (pos 1 and pos 4, non-overlapping) -> both
        # excised (neither is the canonical doc-1 occurrence)
        {"doc_id": 3, "text": f"{span} {span}"},
        # doc 4: too short for any window
        {"doc_id": 4, "text": "a b"},
        {"doc_id": 5, "text": None},
        {"doc_id": 6, "text": "   "},
    ]
    out = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in excise_duplicate_spans(
            ray.data.from_arrow(pa.Table.from_pylist(rows)),
            window_k=K, num_partitions=4,
        ).take_all()
    }
    assert out[1] == (f"x1 {span} y1", 5, 0)       # canonical kept whole
    assert out[2] == ("z2 w2", 5, 3)
    assert out[3] == ("", 6, 6)
    assert out[4] == ("a b", 2, 0)
    assert 5 not in out                             # null text dropped
    assert out[6] == ("", 0, 0)


def test_tokenize_ids_brute_force(ray_session):
    """Tokenizer apply: rank ids, OOV bucketing, position-weighted
    checksum vs Python brute force; null/empty docs pass through."""
    import re
    from collections import Counter

    import ray

    from airbyte_destination_ray.pipelines.corpus import tokenize_ids

    rows = [
        {"doc_id": 1, "text": "Bb aa bb CC dd"},
        {"doc_id": 2, "text": "aa aa zz!aa"},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": " .. "},
    ]
    V = 2

    def toks(t):
        return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]

    c = Counter(w for r in rows if r["text"] for w in toks(r["text"]))
    vocab = {
        w: i + 1
        for i, (w, _) in enumerate(
            sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
        )
    }
    expected = {}
    for r in rows:
        if r["text"] is None:
            continue
        ws = toks(r["text"])
        ids = [vocab.get(w, 0) for w in ws]
        expected[r["doc_id"]] = (
            len(ws),
            sum(1 for w in ws if w not in vocab),
            sum((p + 1) * i for p, i in enumerate(ids)),
        )

    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["ids_checksum"])
        for r in tokenize_ids(
            ray.data.from_arrow(pa.Table.from_pylist(rows)),
            vocab_k=V, num_partitions=4,
        ).take_all()
    }
    assert out == expected
