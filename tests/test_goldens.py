"""Golden-file regression for rows-only keys (SURVEY.md §5.2.5) — these
have no DuckDB oracle, so their sf0.001 output is pinned; regenerate
deliberately with tools/gen_goldens.py when semantics change."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from jsmr_spark.registry import all_specs, canonical_specs

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
# Canonical keys only: a driver-window alias is the same fn object as
# its canonical key (asserted by test_differential.py::
# test_alias_identity), so pinning it twice would re-check the same
# computation — and rows-only keys rotated into the window would
# otherwise demand duplicate golden files under their alias names.
ROWS_ONLY = sorted(k for k, s in canonical_specs().items() if s.oracle is None)
# Emitted windows / outer-join null extension depend on micro-batch
# boundaries; the dedicated streaming tests assert their semantics
# (late-drop contract, matched==batch + null-boundary coverage)
# instead of a byte-pin.
UNPINNED = {"stream_watermark_late", "stream_stream_join_outer"}


def _canon(v):
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in sorted(v.items())}
    if isinstance(v, (list, tuple)):
        return [_canon(x) for x in v]
    return v


@pytest.mark.parametrize("name", [k for k in ROWS_ONLY if k not in UNPINNED])
def test_rows_only_matches_golden(spark, name):
    golden = json.load(open(os.path.join(GOLDEN_DIR, f"{name}.json")))
    df = all_specs()[name].fn(spark, "/root/testdata/sf0.001")
    assert df.columns == golden["columns"]
    rows = sorted([_canon(list(r)) for r in df.collect()], key=json.dumps)
    assert rows == golden["rows"], f"{name}: drifted from golden ({len(rows)} rows)"
