"""Local replica of the driver's correctness gate: every workload query
runs on Spark and on DuckDB, and results must match exactly (row count,
columns, order-insensitive values — floats bit-equal thanks to the
DECIMAL-aggregation rule in workload.py)."""

from __future__ import annotations

import pytest

from monolith_spark.workload import all_queries
from monolith_spark.testing import run_parity

NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, sf_dir, name):
    problems = run_parity(spark, sf_dir, name)
    assert not problems, f"{name}: {problems}"


@pytest.mark.slow
def test_every_query_nonempty(spark, sf_dir):
    # EVERY registry query must return rows even at the smallest sf —
    # a 0-row result passes any hash comparison trivially while
    # proving nothing, so emptiness itself is a failure.
    empty = [
        name for name, q in sorted(all_queries().items())
        if q.spark_fn(spark, sf_dir).limit(1).count() == 0
    ]
    assert not empty, f"queries with no rows at {sf_dir}: {empty}"


def test_staleness_rotation_fronts_changed_green_queries(monkeypatch):
    """VERDICT r6 missing #2: a query greened in a past round whose
    implementation changed since must re-enter the driver's 50-row
    window. _impl_hash is deterministic, sensitive to the oracle SQL,
    and _ordered_registry fronts hash-mismatched green names ahead of
    settled ones (unknown hashes count as stale)."""
    from dataclasses import replace

    from monolith_spark import workload as w

    settled = [q for q in w._REGISTRY if q.name in w._DRIVER_GREEN]
    assert settled, "needs at least one green query"
    q = settled[0]
    h1, h2 = w._impl_hash(q), w._impl_hash(q)
    assert h1 == h2
    # same function, different oracle → different fingerprint
    twin = replace(q, name="__twin__", oracle=(q.oracle or "") + " -- v2")
    assert w._impl_hash(twin) != h1

    # all-settled ledger: green tail is in registry order
    full = {x.name: w._impl_hash(x) for x in settled}
    monkeypatch.setattr(w, "_load_green_hashes", lambda: full)
    base = [x.name for x in w._ordered_registry()]

    # drift ONE settled query's recorded hash → it must move ahead of
    # every still-settled green name
    drifted = dict(full)
    victim = settled[-1].name
    drifted[victim] = "0" * 16
    monkeypatch.setattr(w, "_load_green_hashes", lambda: drifted)
    rotated = [x.name for x in w._ordered_registry()]
    assert set(rotated) == set(base)
    settled_positions = [
        rotated.index(n) for n in full if n != victim
        and n not in set(w._DRIVER_PRIORITY)
    ]
    assert rotated.index(victim) < min(settled_positions)
