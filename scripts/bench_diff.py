#!/usr/bin/env python3
"""Per-query diff of two Bench JSON outputs.

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [ratio]

Accepts either a raw Bench line ({"metric":"total",...,"queries":{...}})
or a driver BENCH_r{N}.json wrapper (whose "tail" holds a truncated
Bench line — only the queries present in the tail are compared).
Flags queries slower than `ratio` (default 1.5) times their old time,
ignoring sub-50ms noise.
"""
import json, re, sys


def load(path):
    d = json.load(open(path))
    if "queries" in d:
        return float(d.get("value", -1)), d["queries"]
    tail = d.get("tail", "")
    qs = {m.group(1): float(m.group(2))
          for m in re.finditer(r'"(q[0-9][0-9a-z_]*)":([0-9.eE+-]+)', tail)}
    return -1.0, qs


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old_total, old = load(old_path)
    new_total, new = load(new_path)
    common = sorted(set(old) & set(new))
    print(f"old: {len(old)} queries (total {old_total:.1f}s), "
          f"new: {len(new)} queries (total {new_total:.1f}s), "
          f"{len(common)} common")
    for k in sorted(set(new) - set(old)):
        print(f"  NEW   {k}: {new[k]:.2f}s")
    for k in sorted(set(old) - set(new)):
        print(f"  GONE  {k} (was {old[k]:.2f}s)")
    slower = [(k, old[k], new[k]) for k in common
              if old[k] > 0.05 and new[k] > ratio * old[k]]
    faster = [(k, old[k], new[k]) for k in common
              if new[k] > 0.05 and old[k] > ratio * new[k]]
    for tag, rows in (("SLOWER", slower), ("FASTER", faster)):
        for k, a, b in sorted(rows, key=lambda r: r[1] / max(r[2], 1e-9)):
            print(f"  {tag} {k}: {a:.2f}s -> {b:.2f}s ({b/a:.1f}x)")
    csum = sum(old[k] for k in common)
    nsum = sum(new[k] for k in common)
    if csum > 0:
        print(f"common-query total: {csum:.1f}s -> {nsum:.1f}s "
              f"({nsum/csum:.2f}x)")
    sys.exit(1 if slower else 0)


if __name__ == "__main__":
    main()
