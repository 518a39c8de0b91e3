"""operators/par.py — driver-thread overlap for composite plans."""

import threading
import time

import pytest

from global_superstore_data_warehouse_spark.operators.par import (
    build_concurrently,
)


def test_results_in_argument_order():
    def slow():
        time.sleep(0.2)
        return "slow"

    assert build_concurrently(slow, lambda: "fast") == ["slow", "fast"]


def test_thunks_actually_overlap():
    gate = threading.Barrier(2, timeout=5)

    def side(tag):
        def run():
            gate.wait()  # deadlocks unless both sides run concurrently
            return tag

        return run

    assert build_concurrently(side("a"), side("b")) == ["a", "b"]


def test_exceptions_propagate():
    def boom():
        raise RuntimeError("side failed")

    with pytest.raises(RuntimeError, match="side failed"):
        build_concurrently(lambda: 1, boom)


def test_single_thunk_runs_inline():
    tid = build_concurrently(lambda: threading.get_ident())
    assert tid == [threading.get_ident()]
