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
    # ValueError, not SystemExit: bench.py imports this as a library
    # (the --commit-detail auto-diff), and a SystemExit escaping its
    # `except Exception` guard killed the bench before the final JSON
    # line when a round artifact was unparseable (found r12)
    raise ValueError(f"{path}: no bench record with a 'queries' field")


def render(
    old: dict,
    new: dict,
    band: float = 0.25,
    old_label: str = "old",
    new_label: str = "new",
) -> str:
    """The diff report as one string — importable (bench.py --commit-detail
    auto-emits the round diff, r11 verdict #7) and printable by main()."""
    lines: list[str] = []
    qo, qn = old["queries"], new["queries"]
    shared = [n for n in qn if n in qo and qo[n] and qn[n]]
    ratios = {n: qn[n] / qo[n] for n in shared}
    med = statistics.median(ratios.values()) if ratios else 1.0

    lines.append(f"old: {old_label}  suite {old.get('value')} s "
                 f"(build+exec {old.get('value_build_exec')})")
    lines.append(f"new: {new_label}  suite {new.get('value')} s "
                 f"(build+exec {new.get('value_build_exec')})")
    for side, d in (("old", old), ("new", new)):
        if d.get("duckdb_value") is not None:
            lines.append(f"{side} duckdb_value {d['duckdb_value']} s  "
                         f"ratio_exec {d.get('ratio_exec')}  "
                         f"ratio_build_exec {d.get('ratio_build_exec')}")
    lines.append(f"median per-query ratio (ambient shift): {med:.3f}x  "
                 f"band ±{band:.0%} around it")
    lines.append("")
    width = max((len(n) for n in shared), default=10)
    movers = 0
    for n in sorted(shared, key=lambda n: -abs(ratios[n] - med)):
        r = ratios[n]
        rel = r / med - 1.0
        tag = "~ambient"
        if abs(rel) > band:
            tag = "FASTER" if rel < 0 else "SLOWER"
            movers += 1
        lines.append(f"{n:<{width}}  {qo[n]:>7.3f} -> {qn[n]:>7.3f} s  "
                     f"{r:>5.2f}x  vs-median {rel:+6.1%}  {tag}")
    gone = sorted(set(qo) - set(qn))
    added = sorted(set(qn) - set(qo))
    if gone:
        lines.append(f"\nremoved queries: {', '.join(gone)}")
    if added:
        lines.append(f"added queries: {', '.join(added)}")
    lines.append(f"\n{movers} genuine mover(s) outside the ambient band; "
                 f"{len(shared) - movers} within it.")
    return "\n".join(lines)


def main() -> None:
    # argparse, not hand-rolled flag scanning (ADVICE r11: a space-
    # separated '--band 0.25' leaked its value into the positional list)
    import argparse

    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("old", help="BENCH_r{N}.json or bench stdout log")
    ap.add_argument("new", help="BENCH_r{M}.json or bench stdout log")
    ap.add_argument("--band", type=float, default=0.25,
                    help="relative deviation from the median ratio that "
                         "flags a genuine mover (default 0.25)")
    a = ap.parse_args()
    try:
        old, new = _load(a.old), _load(a.new)
    except (ValueError, OSError) as e:
        raise SystemExit(str(e))
    print(render(old, new, a.band, old_label=a.old, new_label=a.new))


if __name__ == "__main__":
    main()
