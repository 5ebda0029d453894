"""Unit tests for the rotation-roller scheduling policy (tools/
roll_rotation.py) plus consistency checks on the live rotation table.

The roller rewrites rotation.py at the start of each round; a bug in
its policy silently corrupts the driver-evidence schedule the judge
audits, so the pure scheduling function is pinned here against the
documented invariants (net-new first, failed-stays-front, backlog by
assigned window, oldest-evidence refill, fixed window size).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "roll_rotation.py")
_spec = importlib.util.spec_from_file_location("roll_rotation", _TOOL)
roll = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(roll)


def _rot(entries):
    """rotation-table shorthand: {name: (last, risk, window)}"""
    return {n: (last, risk, win) for n, last, risk, win in entries}


def test_backlog_fills_window_by_assigned_window_then_name():
    names = [f"q{i:02d}" for i in range(8)]
    rotation = _rot(
        [("q00", 5, "verified", None)]
        + [(f"q{i:02d}", None, "float-stat", "r07") for i in range(1, 4)]
        + [(f"q{i:02d}", None, "integer-exact", "r08") for i in range(4, 8)]
    )
    ev = {"q00": 5}
    window, rest, failed, net_new = roll.compute_schedule(
        names, rotation, ev, "r07", window_size=4
    )
    assert window == ["q01", "q02", "q03", "q04"]  # r07 cohort, then r08 by name
    assert rest == ["q05", "q06", "q07"]
    assert failed == [] and net_new == []


def test_net_new_front_scheduled_and_not_duplicated():
    names = ["new_b", "new_a", "q1", "q2"]
    rotation = _rot(
        [("q1", None, "float-stat", "r07"), ("q2", 6, "verified", None)]
    )
    window, rest, failed, net_new = roll.compute_schedule(
        names, rotation, ev={"q2": 6}, new_window="r07", window_size=3
    )
    # queries() order preserved for net-new; each name appears ONCE
    assert net_new == ["new_b", "new_a"]
    assert window == ["new_b", "new_a", "q1"]
    assert len(window) == len(set(window))
    assert rest == []


def test_failed_entry_stays_at_front_of_next_window():
    names = ["ok", "failed_one", "pending"]
    rotation = _rot(
        [
            ("ok", 6, "verified", None),
            # scheduled r06, the r06 driver run did NOT return it green
            ("failed_one", None, "float-stat", "r06"),
            ("pending", None, "integer-exact", "r08"),
        ]
    )
    window, rest, failed, net_new = roll.compute_schedule(
        names, rotation, ev={"ok": 6}, new_window="r07", window_size=2
    )
    assert failed == ["failed_one"]
    assert window[0] == "failed_one"
    assert window == ["failed_one", "pending"]


def test_refill_uses_oldest_driver_evidence_first():
    names = ["old3", "old5", "old4", "backlog1"]
    rotation = _rot(
        [
            ("old3", 3, "verified", None),
            ("old5", 5, "verified", None),
            ("old4", 4, "verified", None),
            ("backlog1", None, "float-stat", "r07"),
        ]
    )
    window, rest, failed, net_new = roll.compute_schedule(
        names,
        rotation,
        ev={"old3": 3, "old5": 5, "old4": 4},
        new_window="r07",
        window_size=3,
    )
    # backlog first, then re-rotation by oldest evidence
    assert window == ["backlog1", "old3", "old4"]
    assert rest == []


def test_deleted_entry_never_rescheduled():
    """An entry dropped from queries() must not reappear in the window
    just because its old schedule slot elapsed without evidence."""
    names = ["live"]
    rotation = _rot(
        [
            ("live", 6, "verified", None),
            ("deleted", None, "float-stat", "r06"),
        ]
    )
    window, rest, failed, net_new = roll.compute_schedule(
        names, rotation, ev={"live": 6}, new_window="r07", window_size=2
    )
    assert "deleted" not in window and "deleted" not in failed
    assert window == ["live"]


def test_evidence_reader_takes_newest_green_and_ignores_errors(tmp_path):
    r5 = tmp_path / "CORRECTNESS_r05.json"
    r6 = tmp_path / "CORRECTNESS_r06.json"
    r5.write_text(
        json.dumps(
            {
                "a": {"hash_match": True},
                "b": {"rows_match": True, "err": None},
                "c": {"rows_match": True, "err": "boom"},
            }
        )
    )
    r6.write_text(json.dumps({"a": {"hash_match": True}, "c": {"hash_match": False}}))
    ev = roll._evidence([str(r5), str(r6)])
    assert ev == {"a": 6, "b": 5}


def test_render_tables_roundtrips_through_exec():
    names = ["q1", "q2", "q3"]
    rotation = _rot(
        [
            ("q1", None, "float-stat", "r07"),
            ("q2", 6, "verified", None),
            ("q3", None, "regex-string", "r07"),
        ]
    )
    ev = {"q2": 6}
    window, rest, failed, net_new = roll.compute_schedule(
        names, rotation, ev, "r07", window_size=2
    )
    block = roll.render_tables(
        names, rotation, ev, "r07", window, rest, net_new, window_size=2
    )
    ns: dict = {}
    exec(block, ns)  # the emitted source must be valid, consistent python
    assert set(ns["CURRENT_WINDOW"]) == {
        n for n, (_, _, w) in ns["ROTATION"].items() if w == "r07"
    }
    assert ns["ROTATION"]["q2"] == (6, "verified", None)
    # risk classes survive the rewrite
    assert ns["ROTATION"]["q1"][1] == "float-stat"
    assert ns["ROTATION"]["q3"][1] == "regex-string"


def test_live_table_consistency():
    """The committed rotation.py satisfies its own invariants."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from golang_db_query_engine_elasticsearch_indexer_spark import rotation as r

    assert len(r.CURRENT_WINDOW) == 50
    assert len(set(r.CURRENT_WINDOW)) == 50
    current = {n for n, (_, _, w) in r.ROTATION.items() if w == "r08"}
    assert set(r.CURRENT_WINDOW) == current
    # every scheduled window is a known label; windows are bounded
    for name, (_last, risk, win) in r.ROTATION.items():
        assert win in (None, "r08", "r09", "r10"), (name, win)
        assert risk, name
    # the close-out accounting holds: EVERY never-driver-checked entry
    # is in the r08 window (backlog fully clears — 6 carried + 4
    # freeze-exit net-new), nothing stays unscheduled
    never = {n for n, (last, _, _) in r.ROTATION.items() if last is None}
    assert never <= set(r.CURRENT_WINDOW)
    assert len(never) == 26


def test_docstring_window_recount_matches_correctness_files():
    """VERDICT r06 nit #4: the policy docstring's account of the r06
    window ("49 first-time + 1 re-check") must be a recomputation from
    the CORRECTNESS files, not prose drift."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    from golang_db_query_engine_elasticsearch_indexer_spark import rotation as r

    r06 = json.load(open(os.path.join(repo, "CORRECTNESS_r06.json")))
    assert len(r06) == 50
    assert all(rec.get("hash_match") or (
        rec.get("rows_match") and rec.get("err") is None
    ) for rec in r06.values())
    # prior driver-green evidence (r01..r05) for the r06-window names
    prior = roll._evidence(
        [os.path.join(repo, f"CORRECTNESS_r{i:02d}.json") for i in range(1, 6)]
    )
    rechecks = sorted(n for n in r06 if n in prior)
    first_time = [n for n in r06 if n not in prior]
    assert rechecks == ["ann_ivfpq_topk"]
    assert len(first_time) == 49
    doc = r.__doc__
    assert "49 first-time" in doc and "1 re-check" in doc
    assert "ann_ivfpq_topk" in doc


def test_changed_entries_front_scheduled_after_failed():
    """The changed-this-round rule is mechanical (VERDICT r07 asks
    #3/#4): entries named in ``changed`` displace re-rotation slots,
    sitting right after failed ones, and never duplicate."""
    names = ["ok_old", "ok_new", "changed_a", "failed_one", "pending"]
    rotation = _rot(
        [
            ("ok_old", 3, "verified", None),
            ("ok_new", 6, "verified", None),
            ("changed_a", 5, "verified", None),
            ("failed_one", None, "float-stat", "r07"),
            ("pending", None, "integer-exact", "r08"),
        ]
    )
    ev = {"ok_old": 3, "ok_new": 6, "changed_a": 5}
    window, rest, failed, net_new = roll.compute_schedule(
        names, rotation, ev, "r08", window_size=4, changed={"changed_a"}
    )
    assert failed == ["failed_one"]
    # failed first, then the changed re-check, then backlog, then the
    # oldest-evidence refill
    assert window == ["failed_one", "changed_a", "pending", "ok_old"]
    # a changed entry that is ALSO net-new is only scheduled once
    window2, _, _, net_new2 = roll.compute_schedule(
        names + ["brand_new"],
        rotation,
        ev,
        "r08",
        window_size=4,
        changed={"brand_new", "changed_a"},
    )
    assert net_new2 == ["brand_new"]
    assert window2 == ["brand_new", "failed_one", "changed_a", "pending"]


_FINAL6 = [
    "agg_approx_sketches",
    "agg_group_by_all",
    "audit_referential_integrity",
    "profile_orders",
    "skew_salted_join_agg",
    "text_compression_ratio",
]
_CHANGED_R08 = ["ann_ivf_recall_eval", "ann_ivf_topk"]


def test_r08_window_matches_executed_roll():
    """The committed r08 window honors every scheduling obligation —
    asserted on the live tables against evidence RECOMPUTED from the
    CORRECTNESS files, not trusted from the table. (The window was
    built by several mid-round roller runs as entries registered, so
    the binding contract is set-level: the driver hash-checks the
    FIRST 50 of queries() as a set.)"""
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    import __spark_entry__ as entry
    from golang_db_query_engine_elasticsearch_indexer_spark import rotation as r

    ev = roll._evidence(
        sorted(
            os.path.join(repo, f)
            for f in os.listdir(repo)
            if f.startswith("CORRECTNESS_r") and f.endswith(".json")
        )
    )
    w = list(r.CURRENT_WINDOW)
    assert len(w) == 50 and len(set(w)) == 50
    # (1) the window IS the driver's first-50 slice of queries()
    assert list(entry.queries())[:50] == w
    # (2) every never-driver-checked entry is in the window: the
    # backlog fully clears this round (incl. all r08-built net-new)
    never = {n for n, (last, _, _) in r.ROTATION.items() if last is None}
    assert never <= set(w)
    for n in never:
        assert not ev.get(n), n
    # (3) the changed-kernel re-checks hold window slots
    assert set(_CHANGED_R08) <= set(w)
    # (4) the final-6 r07 backlog promise is honored
    assert set(_FINAL6) <= never
    # (5) re-rotation slots are EXACTLY the oldest evidence first:
    # whatever the window spends beyond never+changed goes to the
    # front of the (round, name)-sorted pool, in pool order
    taken = never | set(_CHANGED_R08)
    refill = [n for n in w if n not in taken]
    pool = sorted(
        (n for n in ev if n in r.ROTATION and n not in taken),
        key=lambda n: (ev[n], n),
    )
    assert refill == pool[: len(refill)]
    assert all(ev[n] == 3 for n in refill)
    # (6) the r03 tail that did not fit is exactly the next slice and
    # re-rotates in r09 (see test_r09_roll_preview)
    tail = pool[len(refill) : len(refill) + 50]
    assert all(ev[n] == 3 for n in tail if ev[n] == 3) and tail


def test_r09_roll_preview():
    """Simulate the next roll under the expected outcome (the full r08
    window goes green): no backlog remains, so r09 is pure re-rotation
    — the leftover r03 tail first (oldest evidence), then the r04
    cohort by name."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    sys.path.insert(0, repo)
    from golang_db_query_engine_elasticsearch_indexer_spark import rotation as r

    ev = {n: last for n, (last, _, _) in r.ROTATION.items() if last}
    ev.update({n: 8 for n in r.CURRENT_WINDOW})
    names = list(r.ROTATION)
    window, rest, failed, net_new = roll.compute_schedule(
        names, r.ROTATION, ev, "r09"
    )
    assert failed == [] and net_new == [] and rest == []
    assert len(window) == 50
    r03_tail = sorted(
        n for n, (last, _, win) in r.ROTATION.items()
        if last == 3 and win is None
    )
    assert window[: len(r03_tail)] == r03_tail
    r04 = sorted(n for n, (last, _, _) in r.ROTATION.items() if last == 4)
    assert window[len(r03_tail):] == r04[: 50 - len(r03_tail)]
    # and a failed r08 entry would displace a re-rotation slot, not hide
    ev_fail = dict(ev)
    del ev_fail[r.CURRENT_WINDOW[0]]
    window_f, _, failed_f, _ = roll.compute_schedule(
        names, r.ROTATION, ev_fail, "r09"
    )
    assert failed_f == [r.CURRENT_WINDOW[0]]
    assert window_f[0] == r.CURRENT_WINDOW[0]
