"""Automated closing-gate manifest (round-12 verdict, 'What's wrong'
#2): the per-round gate block in SCALE.md was hand-transcribed, which
drifted ("875 passed" recorded vs 876 actual after a late test). This
tool RUNS the four closing gates and emits the markdown block from
machine output, so the recorded numbers are the observed ones by
construction.

Usage:
    python tools/closing_gates.py --round 13                # run all four
    python tools/closing_gates.py --round 13 --skip sweep   # long gates opt-out
    python tools/closing_gates.py --round 13 --append       # append block to SCALE.md

Gates (in order; each is a fresh subprocess, ~25 min apiece for the
long ones):
  suite  python -m pytest tests/ -q                (full suite)
  drive  python tools/drive_entry.py               (239-query sf0.01 sim)
  bench  python bench.py                           (sf0.1 headline JSON)
  sweep  SPARK_GRAFT_SLOW=1 python -m pytest tests/test_parity_bench_scale.py -q
                                                   (sf0.1 oracle parity)

The emitted block records, per gate, the machine-parsed result AND
the exact command line, so a future reader can re-derive every
number. Raw logs land in /tmp/closing_gates_r{N}_{gate}.log. A JSON
twin of the block is written next to the logs for tooling.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATES = ["suite", "drive", "bench", "sweep"]


def _run(cmd: list[str], log_path: str, env: dict | None = None) -> tuple[int, str, float]:
    """Run a gate subprocess, tee output to ``log_path`` LINE BY LINE
    (a hung or interrupted ~25-min gate must still leave its partial
    raw log behind — the block points readers at these logs), return
    (returncode, combined output, wall seconds)."""
    t0 = time.perf_counter()
    chunks: list[str] = []
    with open(log_path, "w") as fh:
        proc = subprocess.Popen(
            cmd, cwd=REPO, env=env or dict(os.environ),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        assert proc.stdout is not None
        for line in proc.stdout:
            fh.write(line)
            fh.flush()
            chunks.append(line)
        rc = proc.wait()
    return rc, "".join(chunks), time.perf_counter() - t0


_PYTEST_RE = re.compile(
    r"(?P<passed>\d+) passed(?:, (?P<skipped>\d+) skipped)?"
    r"(?:, \d+ deselected)?(?:, \d+ warnings?)? in (?P<secs>[\d.]+)s"
)


def _parse_pytest(out: str) -> dict:
    # Anchor BOTH counts to the final summary LINE: a failing test
    # whose traceback echoes a literal "N failed ... in Ns" string
    # (test_closing_gates.py's own fixtures do) must not be read as
    # the suite result.
    m, summary_line = None, ""
    for ln in out.splitlines():
        mm = _PYTEST_RE.search(ln)
        if mm:
            m, summary_line = mm, ln  # keep the LAST summary line
    if m is None:
        return {"ok": False, "error": "no pytest summary line found"}
    failed = re.search(r"(\d+) failed", summary_line)
    secs = float(m.group("secs"))
    return {
        "ok": failed is None,
        "passed": int(m.group("passed")),
        "skipped": int(m.group("skipped") or 0),
        "failed": int(failed.group(1)) if failed else 0,
        "wall_s": round(secs, 1),
        "wall_min": f"{int(secs // 60)}:{int(secs % 60):02d}",
    }


def _parse_drive(out: str) -> dict:
    fails = re.search(r"^FAILS: (\d+)$", out, re.M)
    window = re.search(r"^window_spark_s: ([\d.]+)$", out, re.M)
    n_hash = len(re.findall(r"hash_match=True", out))
    n_rows_only = len(re.findall(r"rows-only \(\d+\)", out))
    n_checked = len(re.findall(r"^\S+: (?:OK|MISMATCH|rows-only)", out, re.M))
    if fails is None:
        return {"ok": False, "error": "no FAILS line found"}
    return {
        "ok": int(fails.group(1)) == 0,
        "fails": int(fails.group(1)),
        "queries_checked": n_checked,
        "hash_green": n_hash,
        "rows_only": n_rows_only,
        "window_spark_s": float(window.group(1)) if window else None,
    }


def _parse_bench(out: str) -> dict:
    # Accept only the bench CONTRACT line (metric + value present):
    # a stray trailing JSON diagnostic must neither crash the tool
    # after four ~25-min gates nor silently replace the headline.
    doc = None
    for line in out.splitlines():
        if line.strip().startswith("{"):
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if (
                isinstance(cand, dict)
                and cand.get("metric") == "headline_queries_total_time"
                and "value" in cand
            ):
                doc = cand
    if doc is None:
        return {"ok": False, "error": "no bench contract JSON line found"}
    return {
        "ok": True,
        "value": doc["value"],
        "value_normalized": doc.get("value_normalized"),
        "canary_cpu_s": doc.get("canary", {}).get("cpu_s"),
        "loadavg_1m": doc.get("canary", {}).get("loadavg_1m"),
        "extras_n": doc.get("extras", {}).get("n"),
        "extras_total": doc.get("extras", {}).get("total"),
        "extras_skipped": doc.get("extras", {}).get("skipped", 0),
        "sf": doc.get("sf"),
    }


def _git_state() -> dict:
    """HEAD + dirty flag, so the manifest records exactly which tree
    each gate ran against (a gate started before a late commit is a
    drift the block must make visible)."""
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    porcelain = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout
    dirty = [
        ln for ln in porcelain.splitlines()
        # the bench gate legitimately rewrites BENCH_DETAIL.json
        if ln.strip() and not ln.endswith("BENCH_DETAIL.json")
    ]
    return {"head": head, "dirty": bool(dirty)}


def run_gates(rnd: int, skip: set[str]) -> dict:
    results: dict[str, dict] = {}
    cmds = {
        "suite": [sys.executable, "-m", "pytest", "tests/", "-q"],
        "drive": [sys.executable, "tools/drive_entry.py"],
        "bench": [sys.executable, "bench.py"],
        "sweep": [
            sys.executable, "-m", "pytest",
            "tests/test_parity_bench_scale.py", "-q",
        ],
    }
    parsers = {
        "suite": _parse_pytest,
        "drive": _parse_drive,
        "bench": _parse_bench,
        "sweep": _parse_pytest,
    }
    for gate in GATES:
        if gate in skip:
            results[gate] = {"gate_skipped": True}
            continue
        env = dict(os.environ)
        if gate == "sweep":
            env["SPARK_GRAFT_SLOW"] = "1"
        log = f"/tmp/closing_gates_r{rnd}_{gate}.log"
        print(f"[closing_gates] running {gate}: {' '.join(cmds[gate])}",
              flush=True)
        git_before = _git_state()
        rc, out, wall = _run(cmds[gate], log, env)
        git_after = _git_state()
        parsed = parsers[gate](out)
        parsed["git_head"] = git_before["head"]
        parsed["git_dirty"] = git_before["dirty"]
        if git_after != git_before:
            # a commit (or edit) landed while this gate ran — the
            # gate's numbers describe the BEFORE tree, so flag it
            parsed["git_drift"] = git_after
        parsed["cmd"] = (
            ("SPARK_GRAFT_SLOW=1 " if gate == "sweep" else "")
            + " ".join(cmds[gate])
        )
        parsed["rc"] = rc
        # a gate that printed parseable output but exited nonzero
        # (e.g. a crash after the contract line) is NOT green
        parsed["ok"] = bool(parsed.get("ok")) and rc == 0
        parsed["tool_wall_s"] = round(wall, 1)
        parsed["log"] = log
        results[gate] = parsed
        print(f"[closing_gates] {gate}: {json.dumps(parsed)}", flush=True)
    return results


def _rc_tag(r: dict) -> str:
    """Visible warning when the gate subprocess exited nonzero —
    parseable output from a crashed process must not render green."""
    rc = r.get("rc", 0)
    return f" **[rc={rc} — gate process exited nonzero]**" if rc else ""


def render_block(rnd: int, results: dict) -> str:
    """The SCALE.md gate block, from machine output only."""
    argv = "python tools/closing_gates.py " + " ".join(sys.argv[1:])
    lines = [
        f"### Round-{rnd} closing gates (tool-emitted)",
        "",
        f"Emitted by `{argv.strip()}` — every number below is parsed",
        "from the gate subprocess's own output (no hand transcription;",
        "raw logs in /tmp/closing_gates_r*.log).",
        "",
    ]
    ran = [g for g in GATES if not (results.get(g) or {}).get("gate_skipped")]
    heads = {results[g].get("git_head") for g in ran if results[g].get("git_head")}
    if heads:
        drifted = [
            g for g in ran
            if results[g].get("git_dirty") or results[g].get("git_drift")
        ]
        if len(heads) == 1 and not drifted:
            lines += [f"Tree: all gates ran at HEAD `{heads.pop()}`, clean.", ""]
        else:
            parts = []
            for g in ran:
                r = results[g]
                tag = f"{g}@{r.get('git_head', '?')}"
                if r.get("git_dirty"):
                    tag += "+dirty"
                if r.get("git_drift"):
                    tag += f"→{r['git_drift']['head']}"
                parts.append(tag)
            lines += [
                "Tree: **DRIFT** — gates did not all run against one "
                "clean HEAD (" + ", ".join(parts) + "); re-run the "
                "affected gates at the final HEAD before grading.",
                "",
            ]
    s = results.get("suite") or {"gate_skipped": True}
    if s.get("gate_skipped"):
        lines.append("- Full suite: SKIPPED this emission.")
    elif "error" in s:
        lines.append(f"- Full suite: PARSE ERROR ({s['error']}).")
    else:
        lines.append(
            f"- Full suite: **{s['passed']} passed / {s['skipped']} "
            f"skipped** in {s['wall_min']}"
            + (f" ({s['failed']} FAILED)" if s["failed"] else "")
            + f". `{s['cmd']}`" + _rc_tag(s)
        )
    d = results.get("drive") or {"gate_skipped": True}
    if d.get("gate_skipped"):
        lines.append("- Driver simulation: SKIPPED this emission.")
    elif "error" in d:
        lines.append(f"- Driver simulation: PARSE ERROR ({d['error']}).")
    else:
        lines.append(
            f"- `tools/drive_entry.py`: **FAILS: {d['fails']}** over "
            f"{d['queries_checked']} queries at sf0.01 "
            f"({d['hash_green']} hash-green, {d['rows_only']} rows-only)"
            + (
                f"; window_spark_s {d['window_spark_s']}"
                if d.get("window_spark_s") is not None else ""
            )
            + f". `{d['cmd']}`" + _rc_tag(d)
        )
    b = results.get("bench") or {"gate_skipped": True}
    if b.get("gate_skipped"):
        lines.append("- Closing bench: SKIPPED this emission.")
    elif "error" in b:
        lines.append(f"- Closing bench: PARSE ERROR ({b['error']}).")
    else:
        lines.append(
            f"- Closing bench (sf{b['sf']}, loadavg {b['loadavg_1m']}, "
            f"canary cpu_s {b['canary_cpu_s']}): headline "
            f"**{b['value']} s raw / {b['value_normalized']} s "
            f"normalized**; extras n={b['extras_n']} "
            f"total={b['extras_total']} s"
            + (
                f" (**{b['extras_skipped']} extras budget-skipped under"
                " load — re-run on a quiet host**)"
                if b.get("extras_skipped") else ""
            )
            + f". `{b['cmd']}`" + _rc_tag(b)
        )
    w = results.get("sweep") or {"gate_skipped": True}
    if w.get("gate_skipped"):
        lines.append("- sf0.1 parity sweep: SKIPPED this emission.")
    elif "error" in w:
        lines.append(f"- sf0.1 parity sweep: PARSE ERROR ({w['error']}).")
    else:
        lines.append(
            f"- sf0.1 parity sweep: **{w['passed']}/{w['passed'] + w['failed']} "
            f"passed** in {w['wall_min']}. `{w['cmd']}`" + _rc_tag(w)
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--skip", action="append", default=[], choices=GATES,
        help="gate(s) to skip this emission (recorded as SKIPPED)",
    )
    ap.add_argument(
        "--append", action="store_true",
        help="append the emitted block to SCALE.md",
    )
    args = ap.parse_args()
    results = run_gates(args.round, set(args.skip))
    block = render_block(args.round, results)
    json_path = f"/tmp/closing_gates_r{args.round}.json"
    with open(json_path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print()
    print(block)
    print(f"[closing_gates] JSON twin: {json_path}")
    if args.append:
        with open(os.path.join(REPO, "SCALE.md"), "a") as fh:
            fh.write("\n" + block)
        print("[closing_gates] appended to SCALE.md")


if __name__ == "__main__":
    main()
