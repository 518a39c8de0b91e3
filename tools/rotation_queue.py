"""Rotation hygiene: which registered queries have never received a
driver CORRECTNESS row, and which window slots are safe to rotate out.

Usage: python tools/rotation_queue.py

Reads every CORRECTNESS_r*.json in the repo root, unions the query
names that ever appeared (any status), and diffs against the live
registry. Prints:
  - the current 50-query driver window, split into has-row / no-row;
  - the full never-checked backlog outside the window (the rotation
    queue queries.py's header comment tracks by hand);
  - window entries that are already hash-green in some past round
    (rotation-out candidates once their shape is covered).
"""

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from global_superstore_data_warehouse_spark import registry

    names = list(registry.queries())
    window = names[:50]
    seen: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            doc = json.load(f)
        rows = doc.get("queries", doc) if isinstance(doc, dict) else {}
        for q in rows:
            seen[q] = rnd  # later rounds overwrite: latest row wins
    in_window_no_row = [q for q in window if q not in seen]
    in_window_with_row = [q for q in window if q in seen]
    backlog = [q for q in names[50:] if q not in seen]
    print(f"registered: {len(names)}  window: {len(window)}")
    print(f"\nwindow entries with a driver row ({len(in_window_with_row)}):")
    for q in in_window_with_row:
        print(f"  {q}  [{seen[q]}]")
    print(f"\nwindow entries awaiting their first row ({len(in_window_no_row)}):")
    for q in in_window_no_row:
        print(f"  {q}")
    print(f"\nnever-checked backlog outside the window ({len(backlog)}):")
    for q in backlog:
        print(f"  {q}")
    # STALENESS report (round 11+): once the never-checked backlog is
    # empty the rotation criterion becomes last-GREEN age — list every
    # registered query by the round of its most recent green row
    # (hash_match, or rows_match for no-oracle entries), oldest first.
    # The next round's window should be the head of this list plus the
    # round's net-zero first-timers.
    green: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        with open(path) as f:
            doc = json.load(f)
        rows = doc.get("queries", doc) if isinstance(doc, dict) else {}
        for q, r in rows.items():
            if isinstance(r, dict) and (
                r.get("hash_match")
                or (
                    r.get("err") == "no_oracle"
                    and (r.get("spark_rows") or 0) > 0
                )
            ):
                green[q] = rnd
    by_age = sorted(names, key=lambda q: (green.get(q, ""), q))
    print("\nstaleness (last-green round, oldest first; '-' = never green):")
    for q in by_age:
        print(f"  {green.get(q, '-'):>4}  {q}")
    # Suggested next window: the head-50 of the staleness order. The
    # actual ROUND{N}_WINDOW should replace tail entries with (a) any
    # query whose plan/oracle CHANGED this round and (b) the round's
    # net-zero first-timer registrations — both must be re-proven
    # before their stale peers.
    print("\nsuggested next window (staleness head-50; adjust for")
    print("changed entries and first-timers per queries.py's notes):")
    for q in by_age[:50]:
        print(f'    "{q}",')


if __name__ == "__main__":
    main()
