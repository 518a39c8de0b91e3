"""Parser tests for tools/closing_gates.py — the automated
closing-gate manifest (round-12 verdict, 'What's wrong' #2). The
gates themselves are exercised per-round by running the tool; these
pin the machine-output parsing so a pytest/bench output format drift
surfaces as a test failure, not a silently wrong SCALE.md block."""

import importlib.util
import os

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "closing_gates.py",
)
spec = importlib.util.spec_from_file_location("closing_gates", TOOL)
cg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cg)


def test_parse_pytest_green_and_failed():
    green = cg._parse_pytest("....\n876 passed, 6 skipped in 1410.55s (0:23:30)\n")
    assert green == {
        "ok": True, "passed": 876, "skipped": 6, "failed": 0,
        "wall_s": 1410.5, "wall_min": "23:30",
    }
    red = cg._parse_pytest("2 failed, 874 passed, 6 skipped in 60.0s\n")
    assert red["ok"] is False and red["failed"] == 2 and red["passed"] == 874
    sweep = cg._parse_pytest("237 passed in 1381.2s (0:23:01)\n")
    assert sweep["ok"] and sweep["passed"] == 237 and sweep["skipped"] == 0
    assert cg._parse_pytest("garbage")["ok"] is False


def test_parse_pytest_failed_count_anchored_to_summary_line():
    # a failing test whose TRACEBACK echoes a literal "N failed ..."
    # fixture string must not be read as the suite result — both
    # counts come from the final summary line only
    out = (
        "E   assert red['ok'] is False\n"
        "E   where red = {'2 failed, 874 passed, 6 skipped in 60.0s'}\n"
        "876 passed, 6 skipped in 1410.55s (0:23:30)\n"
    )
    parsed = cg._parse_pytest(out)
    assert parsed["ok"] is True and parsed["failed"] == 0
    assert parsed["passed"] == 876


def test_parse_drive_counts_and_fails():
    out = (
        "entry rows: 5 schema: x\n"
        "q1: OK rows=10/10 cols_match=True hash_match=True [0.50s]\n"
        "q2: rows-only (5) [0.20s]\n"
        "q3: MISMATCH rows=10/9 cols_match=True hash_match=False [0.30s]\n"
        "slowest: q1=0.5s\n"
        "window_spark_s: 12.3\n"
        "FAILS: 1\n"
    )
    parsed = cg._parse_drive(out)
    assert parsed == {
        "ok": False, "fails": 1, "queries_checked": 3, "hash_green": 1,
        "rows_only": 1, "window_spark_s": 12.3,
    }
    assert cg._parse_drive("no fails line")["ok"] is False


def test_parse_bench_takes_last_json_line():
    out = (
        "WARN noise\n"
        '{"metric":"headline_queries_total_time","value":99.0,"sf":0.001}\n'
        '{"metric":"headline_queries_total_time","value":11.5,"value_normalized":10.9,'
        '"canary":{"cpu_s":0.9,"loadavg_1m":2.0},'
        '"extras":{"n":147,"total":350.0},"sf":0.1}\n'
    )
    parsed = cg._parse_bench(out)
    assert parsed["ok"] and parsed["value"] == 11.5 and parsed["sf"] == 0.1
    assert parsed["extras_n"] == 147
    assert cg._parse_bench("nothing")["ok"] is False


def test_parse_bench_ignores_trailing_non_contract_json():
    # a stray JSON diagnostic AFTER the contract line must neither
    # crash the parser (KeyError on "value") nor replace the result
    out = (
        '{"metric":"headline_queries_total_time","value":11.5,"sf":0.1}\n'
        '{"event":"spark_stop","value":999}\n'
        '{"not_a_bench_line":true}\n'
    )
    parsed = cg._parse_bench(out)
    assert parsed["ok"] and parsed["value"] == 11.5
    # JSON present but never the contract line -> clean failure
    assert cg._parse_bench('{"event":"x"}\n')["ok"] is False


def test_render_block_flags_nonzero_gate_exit():
    # a gate that printed parseable output but exited nonzero (crash
    # after the contract line) must carry a visible warning
    results = {
        "suite": {"gate_skipped": True},
        "drive": {"gate_skipped": True},
        "bench": {
            "ok": False, "rc": 1, "value": 11.5, "value_normalized": 10.9,
            "canary_cpu_s": 0.9, "loadavg_1m": 2.0, "extras_n": 147,
            "extras_total": 350.0, "sf": 0.1, "cmd": "python bench.py",
        },
        "sweep": {"gate_skipped": True},
    }
    block = cg.render_block(13, results)
    assert "[rc=1 — gate process exited nonzero]" in block


def test_render_block_carries_commands_and_numbers():
    results = {
        "suite": {
            "ok": True, "passed": 876, "skipped": 6, "failed": 0,
            "wall_min": "23:30", "cmd": "python -m pytest tests/ -q",
        },
        "drive": {
            "ok": True, "fails": 0, "queries_checked": 239,
            "hash_green": 237, "rows_only": 2, "window_spark_s": 40.0,
            "cmd": "python tools/drive_entry.py",
        },
        "bench": {
            "ok": True, "value": 11.5, "value_normalized": 10.9,
            "canary_cpu_s": 0.9, "loadavg_1m": 2.0, "extras_n": 147,
            "extras_total": 350.0, "sf": 0.1, "cmd": "python bench.py",
        },
        "sweep": {"gate_skipped": True},
    }
    block = cg.render_block(13, results)
    assert block.startswith("### Round-13 closing gates (tool-emitted)")
    # every recorded number and every command line appears verbatim
    for needle in (
        "876 passed / 6 skipped", "23:30", "FAILS: 0", "237 hash-green",
        "11.5 s raw / 10.9 s normalized", "python -m pytest tests/ -q",
        "python tools/drive_entry.py", "python bench.py",
        "sf0.1 parity sweep: SKIPPED",
    ):
        assert needle in block, needle


def test_render_block_git_state_clean_vs_drift():
    """The manifest must make per-gate tree state visible: one clean
    line when every gate ran at the same clean HEAD, an explicit
    DRIFT warning when a commit landed mid-run or the tree was dirty
    (the exact failure mode that motivated _git_state)."""
    base = {
        "suite": {
            "ok": True, "passed": 1, "skipped": 0, "failed": 0,
            "wall_min": "0:01", "cmd": "c", "git_head": "abc1234",
            "git_dirty": False,
        },
        "drive": {"gate_skipped": True},
        "bench": {"gate_skipped": True},
        "sweep": {"gate_skipped": True},
    }
    clean = cg.render_block(13, base)
    assert "all gates ran at HEAD `abc1234`, clean." in clean
    assert "DRIFT" not in clean

    drifted = {**base, "suite": {
        **base["suite"], "git_drift": {"head": "def5678", "dirty": False},
    }}
    block = cg.render_block(13, drifted)
    assert "DRIFT" in block and "suite@abc1234→def5678" in block

    dirty = {**base, "suite": {**base["suite"], "git_dirty": True}}
    block = cg.render_block(13, dirty)
    assert "DRIFT" in block and "suite@abc1234+dirty" in block
