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


def _age_key(label: str) -> tuple[int, int]:
    """Sort key for last-green round labels: '' (never green) is the
    most urgent, then NUMERICALLY by round — plain string comparison
    would mis-sort once labels outgrow the zero padding ('r100' <
    'r99' lexicographically)."""
    return (0, 0) if not label else (1, int(label.lstrip("r")))


def load_green(repo: str = REPO) -> dict[str, str]:
    """query -> round label of its most recent GREEN driver row
    (hash_match, or a rows-only `no_oracle` row with >0 spark rows
    for the by-design estimates). The single green criterion — the
    staleness report, the window suggestion, and the unit tests all
    read THIS map so the predicate can't drift between them."""
    green: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
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
                prev = green.get(q, "")
                # later rounds win NUMERICALLY (r100 beats r99)
                if _age_key(rnd) >= _age_key(prev):
                    green[q] = rnd
    return green


def suggest_window(
    names: list[str],
    green: dict[str, str],
    with_oracle: set[str],
    k: int = 50,
) -> tuple[list[str], dict[str, str]]:
    """The staleness head-``k`` suggestion, with rows-only estimates
    and their ``_audit`` twins kept ATOMIC (round-12 directive): a
    rows-only estimate (no DuckDB oracle) produces only a `no_oracle`
    driver row — its checkable evidence is its twin. A window slot
    spent on the estimate alone proves nothing, so a pair is ONE
    unit: the unit's staleness is the OLDER member's last-green round
    ('' = never green, most urgent), and both members enter the
    window together (costing two slots) or neither does.

    Returns (suggestion, pair_of) where pair_of maps each rows-only
    estimate to its audit twin.
    """
    name_set = set(names)
    no_oracle = name_set - with_oracle
    pair_of = {q: f"{q}_audit" for q in no_oracle if f"{q}_audit" in name_set}
    member_of = {}  # any member -> canonical unit key (the estimate)
    for est, aud in pair_of.items():
        member_of[est] = est
        member_of[aud] = est
    unit_age: dict[str, str] = {}  # unit -> oldest member age
    for q in names:
        unit = member_of.get(q, q)
        age = green.get(q, "")
        unit_age[unit] = min(unit_age.get(unit, age), age, key=_age_key)
    units = sorted(unit_age, key=lambda u: (_age_key(unit_age[u]), u))
    suggestion: list[str] = []
    for u in units:
        members = [u, pair_of[u]] if u in pair_of else [u]
        if len(suggestion) + len(members) > k:
            continue  # pair doesn't fit — let smaller units fill
        suggestion.extend(members)
        if len(suggestion) == k:
            break
    # A short suggestion is possible when only 2-slot pairs remain
    # for the last slot(s); the caller must see that rather than
    # paste a <k window (the 50-slot contract would break).
    if len(suggestion) < k:
        print(
            f"WARNING: suggestion has {len(suggestion)} of {k} slots —"
            " the remaining units are estimate+audit pairs that do not"
            " fit; fill the tail by hand (and keep pairs atomic).",
            file=sys.stderr,
        )
    return suggestion, pair_of


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
    green = load_green()
    by_age = sorted(names, key=lambda q: (_age_key(green.get(q, "")), q))
    print("\nstaleness (last-green round, oldest first; '-' = never green):")
    for q in by_age:
        print(f"  {green.get(q, '-'):>4}  {q}")
    # Suggested next window: the head-50 of the staleness order. The
    # actual ROUND{N}_WINDOW should replace tail entries with (a) any
    # query whose plan/oracle CHANGED this round and (b) the round's
    # net-zero first-timer registrations — both must be re-proven
    # before their stale peers.
    # Estimate+audit pairs are kept atomic — see suggest_window.
    suggestion, pair_of = suggest_window(
        names, green, set(registry.oracle_sql())
    )
    print("\nsuggested next window (staleness head-50, estimate+audit")
    print("pairs kept atomic; adjust for changed entries and")
    print("first-timers per queries.py's notes):")
    for q in suggestion:
        tag = ""
        if q in pair_of:
            tag = f"  # rows-only estimate — paired with {pair_of[q]}"
        elif q in pair_of.values():
            tag = "  # audit twin (atomic with its estimate)"
        print(f'    "{q}",{tag}')


if __name__ == "__main__":
    main()
