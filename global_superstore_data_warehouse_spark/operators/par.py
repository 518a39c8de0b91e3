"""Driver-thread overlap for composite plans (guide §2.6 "Overlap
independent jobs").

Several registered composites build TWO independent sub-pipelines
that each materialize eagerly (localCheckpoint jobs, gate counts,
iterative rounds) before one final join compares them — e.g.
``dedup_bcubed_agreement`` (simhash clustering vs minhash
clustering) and the recall evals (exact ground-truth pairs vs LSH
candidates). Built sequentially, each side is a serial chain of many
small jobs that leaves most executors idle — the measured per-query
cost is dominated by composition latency, not compute (r13 verdict,
"checkpoint-heavy dedup composites"). Spark's scheduler happily runs
jobs from several driver threads at once, so building the sides
concurrently overlaps their latencies: wall ≈ max(side) instead of
sum(side).

This is NOT caching: every call computes everything from the parquet
inputs exactly as before — the same jobs run, only overlapped. Jobs
submitted from a thread back-fill executors freed by the other
side's stragglers (FIFO scheduling is exactly the back-fill behavior
wanted). Results are deterministic: the sides share no mutable state
and the final join consumes both frames only after both threads have
returned.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, TypeVar

T = TypeVar("T")


def build_concurrently(*thunks: Callable[[], T]) -> list[T]:
    """Run each zero-arg builder in its own driver thread and return
    their results in argument order. Exceptions propagate (the first
    raising thunk fails the call, as sequential construction would).
    """
    if len(thunks) <= 1:
        return [t() for t in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
