"""URL parsing + per-domain rollup (pipelines/web.py, functions/urls.py)."""

import duckdb
import pyarrow as pa
import ray

from airbyte_destination_ray.functions.urls import parse_urls, registrable_domain
from airbyte_destination_ray.pipelines.web import domain_stats


def test_parse_urls_components():
    urls = pa.array(
        [
            "https://site-1.example.com/page/42",
            "http://a.b.deep.example.org:8080/x/y?q=1#frag",
            "ftp://files.example.net",
            "not a url",
            None,
            "https://localhost/admin",
        ]
    )
    p = parse_urls(urls)
    assert p["scheme"].to_pylist() == ["https", "http", "ftp", None, None, "https"]
    assert p["host"].to_pylist() == [
        "site-1.example.com",
        "a.b.deep.example.org",
        "files.example.net",
        None,
        None,
        "localhost",
    ]
    assert p["port"].to_pylist() == [None, "8080", None, None, None, None]
    assert p["path"].to_pylist() == ["/page/42", "/x/y", "", None, None, "/admin"]
    assert p["domain"].to_pylist() == [
        "example.com",
        "example.org",
        "example.net",
        None,
        None,
        "localhost",
    ]


def test_registrable_domain_edge_cases():
    hosts = pa.array(["example.com", "a.b.c.example.co", "single", "", None])
    assert registrable_domain(hosts).to_pylist() == [
        "example.com",
        "example.co",
        "single",
        "",
        None,
    ]


def test_domain_stats_matches_duckdb(ray_session):
    urls = [
        f"https://site-{i % 3}.example.com/page/{i % 7}" for i in range(100)
    ] + ["bad url", "bad url"]
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    got = (
        pa.concat_tables(
            domain_stats(
                ray.data.from_arrow(t), num_partitions=4
            ).iter_batches(batch_format="pyarrow")
        )
        .sort_by("host")
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        SELECT CASE WHEN url LIKE '%://%' THEN split_part(url, '/', 3) END
                   AS host,
               count(DISTINCT url) AS n_pages, count(*) AS n_events
        FROM t GROUP BY 1 ORDER BY host
        """
    ).df()
    assert got["host"].fillna("∅").tolist() == want["host"].fillna("∅").tolist()
    assert got["n_pages"].tolist() == want["n_pages"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()


def test_canonicalize_urls_cases():
    from airbyte_destination_ray.functions.urls import canonicalize_urls

    cases = [
        # (input, expected)
        ("HTTP://Example.COM/Path", "http://example.com/Path"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("https://example.com:8080/x", "https://example.com:8080/x"),
        ("https://Example.com", "https://example.com/"),
        ("https://example.com/a?b=2&a=1#frag", "https://example.com/a?b=2&a=1"),
        ("https://example.com?q=1", "https://example.com?q=1"),
        ("https://example.com#only-frag", "https://example.com/"),
        ("HTTPS://H.example.com:443", "https://h.example.com/"),
        # path/query case is significant and preserved
        ("http://h/CaseSensitive?Q=Mixed", "http://h/CaseSensitive?Q=Mixed"),
        # malformed: pass through untouched
        ("not a url", "not a url"),
        ("", ""),
        (None, None),
    ]
    got = canonicalize_urls(
        pa.array([c[0] for c in cases], type=pa.string())
    ).to_pylist()
    assert got == [c[1] for c in cases]


def test_canonicalize_is_idempotent():
    from airbyte_destination_ray.functions.urls import canonicalize_urls
    from airbyte_destination_ray.sources.synth import messy_urls_for_keys

    import numpy as np

    urls = messy_urls_for_keys(np.arange(5000))
    once = canonicalize_urls(urls)
    twice = canonicalize_urls(once)
    assert once.equals(twice)
