"""Refresh GREEN_HASHES.json — the staleness ledger for the driver's
50-query rotation.

Run ONCE PER ROUND, at round START, right after reading the new
CORRECTNESS_r*.json and BEFORE touching any monolith_spark source —
at that moment the working tree IS the tree the driver verified (the
previous round's final commit), so the recorded hashes attest the
code that actually produced the green rows:

    python tools/record_green_hashes.py

Only rows re-verified in the NEWEST CORRECTNESS_r*.json take this
tree's hash; every other green row keeps its previously recorded
hash, so queries that drifted since their last driver check stay
stale (fronted by the rotation) until a driver window actually
re-greens them.

For every query the driver currently attests green, record the hash of
its present implementation (function source + oracle SQL + operator-
module dependency files — workload._impl_hash). _ordered_registry then
fronts any green query whose implementation has drifted from its
recorded hash, so the driver re-verifies changed code instead of
letting a stale green sit at the back of the window forever
(VERDICT r6 missing #2).

Names no longer green are dropped from the ledger (they re-enter the
fresh tier anyway).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _fallback_impl_hash(q) -> str:
    """Mirror of workload._impl_hash, for bootstrapping the ledger
    from a historical tree that predates the function (the hash inputs
    are the tree's own sources, so the digests are identical)."""
    import hashlib
    import inspect

    h = hashlib.sha256()
    fn = q.spark_fn
    try:
        h.update(inspect.getsource(fn).encode())
    except (OSError, TypeError):
        h.update(q.name.encode())
    h.update((q.oracle or "").encode())
    deps: set[str] = set()
    code = getattr(fn, "__code__", None)
    for name in code.co_names if code else ():
        g = fn.__globals__.get(name)
        mod = g if inspect.ismodule(g) else inspect.getmodule(g)
        mn = getattr(mod, "__name__", "")
        if mn.startswith("monolith_spark") and mn != "monolith_spark.workload":
            deps.add(mn)
    for mn in sorted(deps):
        mod = sys.modules.get(mn)
        path = getattr(mod, "__file__", None)
        if path:
            try:
                with open(path, "rb") as f:
                    h.update(hashlib.sha256(f.read()).digest())
            except OSError:
                pass
    return h.hexdigest()[:16]


def _latest_window_greens() -> set[str] | None:
    """Names with a passing row in the NEWEST CORRECTNESS_r*.json —
    the only rows the driver actually re-verified against this tree.
    None if no correctness files exist (bootstrap: record everything)."""
    import glob

    paths = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not paths:
        return None
    try:
        with open(paths[-1]) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        return None
    return {
        name
        for name, r in rows.items()
        if isinstance(r, dict)
        and r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match") is not False
        and not r.get("err")
    }


def main() -> None:
    from monolith_spark import workload as w

    impl_hash = getattr(w, "_impl_hash", _fallback_impl_hash)
    out = {
        q.name: impl_hash(q)
        for q in w._REGISTRY
        if q.name in w._DRIVER_GREEN
    }
    path = os.path.join(ROOT, "GREEN_HASHES.json")
    prev = {}
    try:
        with open(path) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        pass
    # Only rows the LATEST driver window re-verified may take this
    # tree's hash; everything else keeps its previously recorded hash
    # (or stays absent → treated stale). A blanket refresh would mark
    # rows that drifted since their last driver check as "settled"
    # without any re-verification — exactly the backlog VERDICT r7
    # flagged (48 drifted driver-green rows).
    window = _latest_window_greens()
    if window is not None:
        out = {
            n: (h if n in window else prev.get(n))
            for n, h in out.items()
        }
        out = {n: h for n, h in out.items() if h is not None}
    changed = sorted(
        n for n in out if n in prev and prev[n] != out[n]
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(out)} green hashes "
          f"({len(out) - len(set(out) & set(prev))} new, "
          f"{len(changed)} refreshed: {changed[:10]})")


if __name__ == "__main__":
    main()
