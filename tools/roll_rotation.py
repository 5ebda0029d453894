#!/usr/bin/env python3
"""Roll the driver-evidence rotation schedule forward one round.

Usage (from the repo root, at the START of round N+1, after the driver
has written CORRECTNESS_r{N}.json):

    python tools/roll_rotation.py r07

It recomputes every entry's newest driver-green round from all
CORRECTNESS_r*.json files, promotes the named window's scheduled
entries (verifying they actually went green), shifts the remaining
windows up, and rewrites
golang_db_query_engine_elasticsearch_indexer_spark/rotation.py in
place. Policy invariants enforced:

- an entry that was scheduled but did NOT come back green stays at the
  front of the next window (a failed check is the highest-priority
  evidence gap there is);
- entries named via ``--changed`` (kernel or oracle changed since their
  newest driver row) are front-scheduled right after failed ones —
  rotation.py's priority rule (1), mechanical since r08;
- once no never-checked entries remain, the window fills by oldest
  driver evidence first (re-rotation), so no entry's evidence ages
  beyond ~(inventory / 50) rounds;
- net-new entries (present in queries() but absent from the table) are
  flagged loudly and front-scheduled — the "no entry stays unchecked
  beyond 2 rounds" rule from rotation.py's policy docstring.

The tool only writes rotation.py; review + commit the diff.
"""

from __future__ import annotations

import glob
import json
import re
import sys

WINDOW = 50


def _evidence(paths: list[str] | None = None) -> dict[str, int]:
    """name -> newest driver-green round, from CORRECTNESS_r*.json files."""
    ev: dict[str, int] = {}
    for f in sorted(paths if paths is not None else glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, rec in json.load(open(f)).items():
            # Success shapes (rotation.py policy docstring): a hash-green
            # row; a rows-green row with no error; or the ROWS-ONLY shape
            # err == "no_oracle" with spark_rows > 0 — the harness's
            # notation for "no oracle supplied", not a failure.
            good = (
                rec.get("hash_match")
                or (rec.get("rows_match") and rec.get("err") is None)
                or (
                    rec.get("err") == "no_oracle"
                    and (rec.get("spark_rows") or 0) > 0
                )
            )
            if good:
                ev[name] = max(ev.get(name, 0), rnd)
    return ev


def _rnum(w: str) -> int:
    return int(w[1:])


def compute_schedule(
    names: list[str],
    rotation: dict[str, tuple],
    ev: dict[str, int],
    new_window: str,
    window_size: int = WINDOW,
    changed: set[str] | None = None,
) -> tuple[list[str], list[str], list[str], list[str]]:
    """Pure scheduling policy: returns (window, rest, failed, net_new).

    - net_new: in queries() but not in the table — front-scheduled (the
      "no entry unchecked beyond 2 rounds" rule).
    - failed: scheduled in an already-elapsed window but still without
      driver-green evidence — a failed check is the highest-priority
      evidence gap, so they stay at the window's front.
    - changed: entries whose KERNEL OR ORACLE changed since their
      newest driver evidence (rotation.py policy priority (1)) —
      front-scheduled right after failed, displacing re-rotation
      slots, so post-change driver evidence is mechanical, not a
      manual displacement (VERDICT r07 "What's wrong" #1).
    - backlog: never driver-green, ordered by previously assigned
      window (earlier first) then name.
    - refill: once the backlog fits, the window tops up with the OLDEST
      driver evidence first (re-rotation).
    """
    changed = changed or set()
    net_new = [n for n in names if n not in rotation]
    failed = [
        n
        for n, (_, _, w) in rotation.items()
        if w is not None and _rnum(w) < _rnum(new_window) and not ev.get(n)
        and n in names
    ]
    recheck = sorted(n for n in changed if n in names and n not in net_new)
    backlog = sorted(
        (n for n in names if not ev.get(n) and n not in net_new),
        key=lambda n: (
            _rnum(rotation.get(n, (None, "", None))[2] or "r99"),
            n,
        ),
    )
    pool = sorted(
        (n for n in names if ev.get(n)),
        key=lambda n: (ev[n], n),
    )
    window = list(
        dict.fromkeys(net_new + failed + recheck + backlog)
    )[:window_size]
    if len(window) < window_size:
        window += [n for n in pool if n not in window][: window_size - len(window)]
    rest = [n for n in backlog if n not in window]
    return window, rest, failed, net_new


def render_tables(
    names: list[str],
    rotation: dict[str, tuple],
    ev: dict[str, int],
    new_window: str,
    window: list[str],
    rest: list[str],
    net_new: list[str],
    window_size: int = WINDOW,
) -> str:
    """The ROTATION + CURRENT_WINDOW source block for rotation.py."""

    def risk(name: str) -> str:
        old = rotation.get(name)
        if old and old[1] not in ("changed-this-round", "verified"):
            return old[1]
        return "unclassified" if name in net_new else "verified"

    nxt = f"r{_rnum(new_window) + 1:02d}"
    nxt2 = f"r{_rnum(new_window) + 2:02d}"
    lines = ["ROTATION: dict[str, tuple[int | None, str, str | None]] = {"]
    for name in sorted(set(names)):
        last = ev.get(name) or None
        if name in window:
            win = new_window
        elif name in rest:
            win = nxt if rest.index(name) < window_size else nxt2
        else:
            win = None
        lines.append(f"    {name!r}: ({last!r}, {risk(name)!r}, {win!r}),")
    lines.append("}")
    lines.append("")
    lines.append("CURRENT_WINDOW: tuple[str, ...] = (")
    lines.extend(f"    {n!r}," for n in window)
    lines.append(")")
    return "\n".join(lines)


def main() -> None:
    args = sys.argv[1:]
    changed: set[str] = set()
    if "--changed" in args:
        i = args.index("--changed")
        changed = {n for n in args[i + 1].split(",") if n}
        del args[i : i + 2]
    if len(args) != 1 or not re.fullmatch(r"r\d+", args[0]):
        sys.exit(
            "usage: python tools/roll_rotation.py [--changed a,b] r08\n"
            "  --changed: comma-separated entries whose kernel/oracle "
            "changed since their newest driver row (derive from the "
            "round-boundary `git diff` of operator/oracle files); "
            "front-scheduled after failed entries."
        )
    new_window = args[0]

    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from golang_db_query_engine_elasticsearch_indexer_spark.rotation import (
        ROTATION,
    )

    ev = _evidence()
    names = list(entry.queries())
    window, rest, failed, net_new = compute_schedule(
        names, ROTATION, ev, new_window, changed=changed
    )
    if net_new:
        print(f"NET-NEW entries (front-scheduled): {net_new}")
    if failed:
        print(f"WARNING: scheduled but NOT green last round: {failed}")
    if changed:
        print(f"CHANGED-kernel re-checks (front-scheduled): {sorted(changed)}")

    block = render_tables(
        names, ROTATION, ev, new_window, window, rest, net_new
    )
    path = "golang_db_query_engine_elasticsearch_indexer_spark/rotation.py"
    src = open(path).read()
    head = src[: src.index("ROTATION: dict")]
    tail_m = re.search(r"\n\ndef scheduled\(", src)
    tail = src[tail_m.start():]
    open(path, "w").write(head + block + tail)
    print(
        f"rotation.py rewritten: window={new_window} ({len(window)} slots), "
        f"backlog remaining={len(rest)}, failed-rescheduled={len(failed)}"
    )


if __name__ == "__main__":
    main()
