"""HTML → text extraction: kernel semantics, round-trip byte-identity, and
the in-flight CDC integration (north-star invariant: byte-identical
extracted text per url, BASELINE.json input_hint)."""

import numpy as np
import pyarrow as pa
import pytest

from airbyte_destination_ray.functions.html import (
    escape_html_text,
    extract_text_html,
    wrap_html,
)


def _x(vals):
    return extract_text_html(pa.array(vals, type=pa.string())).to_pylist()


def test_tag_strip_and_entities():
    assert _x(["<html><body>hello world</body></html>"]) == ["hello world"]
    assert _x(["<p class='x'>a &amp; b &lt;tag&gt; c</p>"]) == ["a & b <tag> c"]
    assert _x(["&amp;lt; stays double-escaped"]) == ["&lt; stays double-escaped"]
    assert _x(["&quot;q&quot; &#39;a&#39;"]) == ['"q" \'a\'']


def test_script_style_blocks_removed_before_tag_parse():
    # raw '>' inside script must not confuse the tag stripper
    assert _x(
        ["<head><style>p{color:red}</style><script src='x'>if(a>b){}</script></head><body>T</body>"]
    ) == ["T"]
    # case-insensitive
    assert _x(["<SCRIPT>alert('x')</SCRIPT>ok<STYLE>s</STYLE>"]) == ["ok"]
    # "<styleguide>" is a normal tag, not a style block
    assert _x(["<styleguide>not a block</styleguide>X"]) == ["not a blockX"]
    # unclosed block dies at the row end, and only in its own row
    assert _x(["<script>unclosed", "next row <b>ok</b>"]) == ["", "next row ok"]


def test_plain_text_nulls_empties_and_unicode():
    assert _x(["no tags at all", "", None]) == ["no tags at all", "", None]
    assert _x(["émojis 🎉 <i>ünïcode</i> ẞ"]) == ["émojis 🎉 ünïcode ẞ"]
    assert _x(["<!-- comment --><!DOCTYPE html>Y"]) == ["Y"]


def test_unclosed_tag_does_not_leak_across_rows():
    out = _x(["broken <a href='", "second row intact"])
    assert out == ["broken ", "second row intact"]


def test_binary_input_and_chunked():
    arr = pa.chunked_array(
        [pa.array([b"<b>x</b>"], pa.binary()), pa.array([b"<i>y</i>", None], pa.binary())]
    )
    assert extract_text_html(arr).to_pylist() == ["x", "y", None]


def test_roundtrip_byte_identity():
    texts = pa.array(
        [
            "plain",
            "a & b < c > d",
            "&amp; literal &lt;x&gt;",
            "tab\tand\nnewline",
            "🎉 ünïcode ẞ",
            "",
            "script style <script> fake </script>",
            None,
        ]
    )
    rt = extract_text_html(wrap_html(texts).cast(pa.binary()))
    assert rt.to_pylist() == texts.to_pylist()


def test_synth_corpus_invariant_with_pad(tmp_path, ray_session):
    """extract_text_html(html) == text on the padded synthetic binlog —
    the <style>-wrapped pad is extraction-dead by construction."""
    from airbyte_destination_ray.sources.synth import synthesize_binlog

    import pyarrow.parquet as pq

    d = tmp_path / "binlog"
    synthesize_binlog(
        d, n_events=2000, n_keys=300, n_epochs=2, seed=7, html_pad=3
    )
    t = pa.concat_tables(
        pq.read_table(p) for p in sorted(d.glob("segment-*.parquet"))
    )
    got = extract_text_html(t.column("html"))
    want = t.column("text").combine_chunks()
    assert got.equals(want)


def test_cdc_sync_with_inflight_extraction_matches_trusted_text(
    tmp_path, ray_session
):
    """run_cdc_sync(extract_text=True) derives text from html in-flight and
    must produce a byte-identical lake (digests equal) to the sync that
    trusts the binlog's text column."""
    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync, read_table_arrow
    from airbyte_destination_ray.sources.synth import synthesize_binlog
    from airbyte_destination_ray.state.manifest import ManifestStore

    d = tmp_path / "binlog"
    synthesize_binlog(d, n_events=2000, n_keys=300, n_epochs=2, seed=11, html_pad=2)

    def digests(lake: str) -> dict[int, str]:
        store = ManifestStore(lake, "pages")
        meta = store.table_meta()
        return {
            p: m.digest
            for p in range(meta["num_partitions"])
            if (m := store.latest_snapshot(meta["generation"], p)) is not None
        }

    lakes = {}
    for name, extract in (("trusted", False), ("extracted", True)):
        lake = tmp_path / f"lake_{name}"
        run_cdc_sync(str(lake), str(d), num_partitions=4, extract_text=extract)
        t = read_table_arrow(str(lake), "pages")
        lakes[name] = t.sort_by([("url", "ascending")])
        lakes[name + "_digests"] = digests(str(lake))

    assert lakes["trusted"].equals(lakes["extracted"])
    assert lakes["trusted_digests"] == lakes["extracted_digests"]


def test_cdc_extraction_composes_with_key_only_shuffle(tmp_path, ray_session):
    """extract_text=True under shuffle="key_only" (extraction happens in
    pass 2, after losers are filtered) must equal the payload-shuffle lake."""
    from airbyte_destination_ray.pipelines.cdc import read_table_arrow, run_cdc_sync
    from airbyte_destination_ray.sources.synth import synthesize_binlog

    d = tmp_path / "binlog"
    synthesize_binlog(d, n_events=1500, n_keys=200, n_epochs=2, seed=23, html_pad=1)
    lakes = {}
    for name, shuffle in (("payload", "payload"), ("key_only", "key_only")):
        lake = tmp_path / f"lake_{name}"
        run_cdc_sync(
            str(lake), str(d), num_partitions=4,
            extract_text=True, shuffle=shuffle,
        )
        lakes[name] = read_table_arrow(str(lake), "pages").sort_by("url")
    assert lakes["payload"].equals(lakes["key_only"])


def test_roundtrip_property_random_text():
    """Hypothesis-style sweep without Ray: random printable text (including
    &, <, >, entity-looking substrings, unicode) survives
    escape → wrap → binary → extract byte-identically."""
    import random

    rng = random.Random(7)
    alphabet = (
        "abc &<>\"'#; \t\n&amp;&lt;&#39;<script></script><style>🎉ßü"
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 120)))
        for _ in range(300)
    ]
    arr = pa.array(texts, type=pa.string())
    rt = extract_text_html(wrap_html(arr).cast(pa.binary()))
    assert rt.to_pylist() == texts
