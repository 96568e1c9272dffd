#!/usr/bin/env python3
"""Calibration-aware comparison of two graft bench artifacts.

Usage:  bench_compare.py OLD.json NEW.json [--band 1.5] [--floor 0.5]

The box these benches run on degrades: identical code has measured up to
3x slower under host memory pressure that guest loadavg/steal cannot see
(see graft.Calib). Each artifact therefore carries a memory-probe
slowdown ratio (mem_ratio_* = mem_1t / 0.7 nominal; older artifacts
carry the raw calib_sec fields this script derives it from). Dividing a
total by the ratio would be WRONG — memory pressure is per-stage, not
uniform — so this tool instead widens the per-query regression band by
the two runs' relative slowdown and flags only what exceeds it:

    flag q  iff  new_q > old_q * band * max(1, r_new / r_old)
             and new_q - old_q > floor          (absolute noise floor)

Artifacts are the one-line JSON objects Bench prints (or the full-
precision copy in target/bench.json); per-query values may be {"err":..}
rows, which are reported separately and never compared.
"""
import argparse
import json
import sys

NOMINAL_MEM_1T = 0.7


def load(path):
    """Return the artifact dict: the first JSON object line carrying a
    "queries" map (driver captures sometimes wrap or truncate lines)."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or '"queries"' not in line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj.get("queries"), dict):
                return obj
    raise SystemExit(f"{path}: no parseable bench line with a queries map")


def mem_ratio(art):
    """mem_1t slowdown vs nominal; averaged over pre/post brackets.
    Prefers the explicit mem_ratio_* fields, falls back to calib_sec."""
    pre, post = art.get("mem_ratio_pre"), art.get("mem_ratio_post")
    if pre is None or post is None:
        calib = art.get("calib_sec") or {}
        m1 = [v for k, v in calib.items()
              if k.startswith("mem_") and k.endswith("_1t")]
        if not m1:
            return 1.0  # pre-calibration artifact: assume healthy
        return sum(m1) / len(m1) / NOMINAL_MEM_1T
    return (pre + post) / 2.0


def split_queries(art):
    ok, err = {}, {}
    for name, v in art["queries"].items():
        if isinstance(v, dict):
            err[name] = v.get("err", "?")
        else:
            ok[name] = float(v)
    return ok, err


def main():
    ap = argparse.ArgumentParser(description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--band", type=float, default=1.5,
        help="base per-query regression ratio before calibration "
             "adjustment (default 1.5 — this box's same-code swing)")
    ap.add_argument("--floor", type=float, default=0.5,
        help="absolute seconds a query must regress by to be flagged "
             "(default 0.5)")
    args = ap.parse_args()

    old_art, new_art = load(args.old), load(args.new)
    old_q, old_err = split_queries(old_art)
    new_q, new_err = split_queries(new_art)
    r_old, r_new = mem_ratio(old_art), mem_ratio(new_art)
    adj = args.band * max(1.0, r_new / r_old)

    shared = sorted(set(old_q) & set(new_q))
    tot_old = sum(old_q[q] for q in shared)
    tot_new = sum(new_q[q] for q in shared)
    print(f"overlap: {len(shared)} queries  "
          f"old={tot_old:.1f}s new={tot_new:.1f}s "
          f"ratio={tot_new / tot_old if tot_old else float('nan'):.2f}x")
    print(f"mem ratio: old={r_old:.2f} new={r_new:.2f} "
          f"(nominal {NOMINAL_MEM_1T}s 1t chase)  "
          f"adjusted band={adj:.2f}x + {args.floor}s floor")
    if new_err:
        print(f"ERRORS in new artifact: {sorted(new_err)}")

    flagged = [(q, old_q[q], new_q[q]) for q in shared
               if new_q[q] > old_q[q] * adj
               and new_q[q] - old_q[q] > args.floor]
    flagged.sort(key=lambda t: t[1] - t[2])
    if flagged:
        print(f"\n{len(flagged)} regressions beyond the adjusted band:")
        for q, o, n in flagged:
            print(f"  {q}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x)")
    else:
        print("\nno regressions beyond the adjusted band")
    only_new = sorted(set(new_q) - set(old_q))
    if only_new:
        added = sum(new_q[q] for q in only_new)
        print(f"{len(only_new)} new queries add {added:.1f}s "
              f"(not compared): {', '.join(only_new[:8])}"
              + (" …" if len(only_new) > 8 else ""))
    sys.exit(1 if flagged or new_err else 0)


if __name__ == "__main__":
    main()
