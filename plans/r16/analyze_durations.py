"""Analyze a pytest --durations log: per-test and per-file totals, and
a greedy pick of files/tests to mark `slow` to reach a target wall cut.

Usage: python plans/r16/analyze_durations.py /tmp/pytest_durations.log [cut_minutes]
"""
from __future__ import annotations

import re
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    cut_min = float(sys.argv[2]) if len(sys.argv) > 2 else 22.0
    pat = re.compile(
        r"^\s*([0-9.]+)s\s+(call|setup|teardown)\s+(tests/[^:]+)::(\S+)"
    )
    per_test: dict[tuple[str, str], float] = defaultdict(float)
    for line in open(path):
        m = pat.match(line)
        if m:
            per_test[(m.group(3), m.group(4))] += float(m.group(1))
    per_file: dict[str, float] = defaultdict(float)
    for (f, _t), s in per_test.items():
        per_file[f] += s
    total = sum(per_test.values())
    print(f"listed duration total: {total/60:.1f} min over {len(per_test)} tests")
    print("\n== slowest files ==")
    for f, s in sorted(per_file.items(), key=lambda kv: -kv[1])[:30]:
        n = sum(1 for (ff, _t) in per_test if ff == f)
        print(f"{s:8.1f}s  {n:4d} tests  {f}")
    print("\n== slowest tests ==")
    for (f, t), s in sorted(per_test.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{s:8.1f}s  {f}::{t}")
    # greedy: biggest tests first until cut reached
    picked, acc = [], 0.0
    for (f, t), s in sorted(per_test.items(), key=lambda kv: -kv[1]):
        if acc >= cut_min * 60:
            break
        picked.append((f, t, s))
        acc += s
    print(f"\n== greedy pick to cut {cut_min} min: {len(picked)} tests, "
          f"{acc/60:.1f} min ==")
    byf: dict[str, list] = defaultdict(list)
    for f, t, s in picked:
        byf[f].append((t, s))
    for f in sorted(byf, key=lambda f: -sum(s for _t, s in byf[f])):
        print(f"{sum(s for _t, s in byf[f]):8.1f}s  {f}  "
              f"({len(byf[f])}/{sum(1 for (ff, _t) in per_test if ff == f)})")


if __name__ == "__main__":
    main()
