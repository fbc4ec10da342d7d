#!/usr/bin/env python
"""Round-over-round bench diff (r10 verdict #7) — the certify.py --diff
counterpart for BENCH artifacts.

Reads two bench JSONs (BENCH_r{N}.json or a bench.py stdout line) and
prints per-query deltas classified against the MEDIAN shift: when the
whole suite moves together (the r10 pattern — every query +4-23% while
the same-window DuckDB co-run slowed ~8% too), that is ambient load, not
a plan regression, and each query's verdict should be judged relative to
the suite's median ratio, not to zero. Queries whose ratio deviates from
the median by more than ``--band`` (default 0.25, relative) are flagged
as genuine movers; everything else is ``~ambient``.

Usage: python scripts/bench_diff.py OLD.json NEW.json [--band 0.25]
Writes nothing; pipe to a file to commit a round record, e.g.
``python scripts/bench_diff.py BENCH_r10.json BENCH_r11.json
> BENCH_diff_r10_r11.txt``.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    # whole-file JSON first (BENCH_r{N}.json / bench_detail*.json) ...
    try:
        d = json.loads(txt)
    except ValueError:
        d = None
    if isinstance(d, dict):
        if "queries" in d:
            return d
        p = d.get("parsed")
        if isinstance(p, dict) and "queries" in p:
            return p
    # ... else a log whose record is the last JSON line (bench stdout)
    for ln in reversed(txt.splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                d = json.loads(ln)
            except ValueError:
                continue
            if "queries" in d:
                return d
            # driver artifact: the bench record sits under "parsed"
            p = d.get("parsed")
            if isinstance(p, dict) and "queries" in p:
                return p
    raise SystemExit(f"{path}: no bench record with a 'queries' field")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    band = 0.25
    for a in sys.argv[1:]:
        if a.startswith("--band"):
            band = float(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])
    if len(args) < 2:
        raise SystemExit(__doc__)
    old, new = _load(args[0]), _load(args[1])
    qo, qn = old["queries"], new["queries"]
    shared = [n for n in qn if n in qo and qo[n] and qn[n]]
    ratios = {n: qn[n] / qo[n] for n in shared}
    med = statistics.median(ratios.values()) if ratios else 1.0

    print(f"old: {args[0]}  suite {old.get('value')} s "
          f"(build+exec {old.get('value_build_exec')})")
    print(f"new: {args[1]}  suite {new.get('value')} s "
          f"(build+exec {new.get('value_build_exec')})")
    for side, d in (("old", old), ("new", new)):
        if d.get("duckdb_value") is not None:
            print(f"{side} duckdb_value {d['duckdb_value']} s  "
                  f"ratio_exec {d.get('ratio_exec')}  "
                  f"ratio_build_exec {d.get('ratio_build_exec')}")
    print(f"median per-query ratio (ambient shift): {med:.3f}x  "
          f"band ±{band:.0%} around it")
    print()
    width = max((len(n) for n in shared), default=10)
    movers = 0
    for n in sorted(shared, key=lambda n: -abs(ratios[n] - med)):
        r = ratios[n]
        rel = r / med - 1.0
        tag = "~ambient"
        if abs(rel) > band:
            tag = "FASTER" if rel < 0 else "SLOWER"
            movers += 1
        print(f"{n:<{width}}  {qo[n]:>7.3f} -> {qn[n]:>7.3f} s  "
              f"{r:>5.2f}x  vs-median {rel:+6.1%}  {tag}")
    gone = sorted(set(qo) - set(qn))
    added = sorted(set(qn) - set(qo))
    if gone:
        print(f"\nremoved queries: {', '.join(gone)}")
    if added:
        print(f"added queries: {', '.join(added)}")
    print(f"\n{movers} genuine mover(s) outside the ambient band; "
          f"{len(shared) - movers} within it.")


if __name__ == "__main__":
    main()
