"""Raw-id golden determinism (reference destination_test.go:226-269)."""

import numpy as np

from airbyte_destination_ray.functions.ids import (
    airbyte_raw_id,
    raw_ids_for_batch,
    table_unique_name,
)


def test_raw_id_goldens():
    assert (
        airbyte_raw_id("namespace", "stream", 1, 123456789)
        == "64835b23-1e43-d091-c9b0-de411c0d4364"
    )
    assert (
        airbyte_raw_id("namespace", "stream", 2, 123456789)
        == "8b7e81a5-412e-3f3e-f045-bc0c440bdc02"
    )
    assert (
        airbyte_raw_id("namespace", "stream", 1, 1323456789)
        == "245b33d5-9c69-cdfb-ae06-d1b753d62f1c"
    )


def test_batch_matches_scalar():
    idx = np.array([0, 1, 2, 7])
    ts = np.array([123456789, 123456789, 1323456789, 5])
    got = raw_ids_for_batch("ns", "st", idx, ts)
    for i in range(len(idx)):
        assert got[i] == airbyte_raw_id("ns", "st", int(idx[i]), int(ts[i]))


def test_table_unique_name():
    assert table_unique_name("", "tacos") == "tacos"
    assert table_unique_name("public", "tacos") == "public_tacos"
