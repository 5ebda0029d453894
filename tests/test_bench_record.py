"""The durable bench line must fit the driver's tail capture.

The round driver keeps only the LAST 2000 chars of bench.py's stdout
and json-parses the last line found in that window. BENCH_r10 went
lossy (parsed: null, TPC-H rows truncated) because the verbose record
is ~2.6k chars; the fix (VERDICT r10 ask #6) is a final compact line
guaranteed to fit. This test rebuilds that line with worst-case-width
timings so growth of HEADLINE fails HERE, not in the driver record.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

RECALLS = {"neardup": 0.9557, "ivf": 0.96, "pq": 0.88,
           "ivfpq": 0.84, "ivfpq_res": 0.68}


LOAD = {"start_1m_5m_15m": [99.99, 99.99, 99.99],
        "end_1m_5m_15m": [99.99, 99.99, 99.99]}
SPREAD = {"median_ratio": 9.999, "max_ratio": 99.999,
          "max_query": "embedding_matryoshka_recall"}


def test_final_line_fits_driver_tail():
    # worst realistic width: two-digit seconds at 3dp for every entry,
    # plus worst-case host-noise stamps (VERDICT r11 ask #5)
    timings = {n: 99.999 for n in bench.HEADLINE}
    ann = {k: 99.999 for k in bench.ANN_ORDER}
    digest = bench.build_digest(999.999, 0.1, timings, ann, RECALLS,
                                load=LOAD, spread=SPREAD)
    line = json.dumps(digest, separators=(",", ":"))
    assert len(line) <= 1900, len(line)
    # and it round-trips with the full timing vector intact
    back = json.loads(line)
    assert len(back["t"]) == len(bench.HEADLINE)
    assert back["queries"]["q1_pricing_summary"] == 99.999
    assert len(back["ann"]) == len(bench.ANN_ORDER)
    # the host-noise stamps survive the round-trip
    assert back["load"]["start_1m_5m_15m"] == LOAD["start_1m_5m_15m"]
    assert back["spread"]["max_ratio"] == SPREAD["max_ratio"]


def test_spread_summary():
    runs = {"a": [1.0, 1.1], "b": [2.0, 6.0], "c": [0.5, 0.55]}
    s = bench.spread_summary(runs)
    assert s["max_query"] == "b" and s["max_ratio"] == 3.0
    assert s["median_ratio"] == 1.1
    assert bench.spread_summary({}) == {}
    # zero-min guard: never divides by zero
    assert bench.spread_summary({"z": [0.0, 0.5]})["max_ratio"] == 1.0


def test_digest_subset_is_headline_subset():
    assert set(bench.DIGEST_SUBSET) <= set(bench.HEADLINE)


def test_headline_names_are_registered():
    import __spark_entry__ as entry

    qs = entry.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
