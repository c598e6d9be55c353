#!/usr/bin/env python3
"""Mechanical per-key bench comparison between two bench JSON files.

Usage: bench_diff.py <old.json> <new.json> [--band PCT]

Reads the full per-key map from each file's "queries" field (the
detail artifact target/bench_sf*.json and the driver's BENCH_r*.json
both carry it; BENCH stdout lines only carry "top_queries" — pass the
detail file when you have it). Reports:
  - keys added / removed,
  - keys slower than the noise band (default ±25%, floored at 0.3 s
    absolute so sub-second jitter never flags),
  - keys faster than the band (usually a fixed plan win — or a
    silently-swallowed failure: cross-check n_errors),
  - the total and per-key-mean movement.

The point (round-11 directive #5's sibling): steal-band attribution
should be mechanical, not a per-round manual read of two JSON blobs.
A key flagged here still needs the min-of-3 quiet-machine re-measure
before being called a regression — this tool only decides WHICH keys
earn that re-measure.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver BENCH_r*.json wraps the stdout line
        d = d["parsed"]
    qs = d.get("queries") or d.get("top_queries") or {}
    return d, {k: float(v) for k, v in qs.items()}


def main():
    band = 0.25
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--band":
            band = float(argv[i + 1]) / 100.0
            i += 2  # consume the flag's VALUE too (round-12 advice:
            # `--band 25 old new` treated '25' as the old-file path)
        elif argv[i].startswith("--"):
            i += 1
        else:
            args.append(argv[i])
            i += 1
    old_doc, old = load(args[0])
    new_doc, new = load(args[1])
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))
    slower, faster = [], []
    for k in shared:
        a, b = old[k], new[k]
        if abs(b - a) < 0.3:  # absolute jitter floor
            continue
        if b > a * (1 + band):
            slower.append((b - a, k, a, b))
        elif b < a * (1 - band):
            faster.append((a - b, k, a, b))
    print(f"old: {args[0]}  total={old_doc.get('value')}  "
          f"n={len(old)}  errors={old_doc.get('n_errors', '?')}")
    print(f"new: {args[1]}  total={new_doc.get('value')}  "
          f"n={len(new)}  errors={new_doc.get('n_errors', '?')}")
    if added:
        print(f"\nadded ({len(added)}): " + ", ".join(
            f"{k}={new[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    tot_shared_old = sum(old[k] for k in shared)
    tot_shared_new = sum(new[k] for k in shared)
    if tot_shared_old > 0:
        print(f"\nshared-key total: {tot_shared_old:.1f}s -> "
              f"{tot_shared_new:.1f}s "
              f"({(tot_shared_new / tot_shared_old - 1) * 100:+.1f}%)")
    print(f"\nslower than +{band * 100:.0f}% (re-measure min-of-3 "
          f"before calling these regressions):")
    for d, k, a, b in sorted(slower, reverse=True):
        print(f"  {k}: {a:.2f}s -> {b:.2f}s (+{d:.2f}s)")
    if not slower:
        print("  (none)")
    print(f"\nfaster than -{band * 100:.0f}% (verify not a swallowed "
          f"error; see n_errors):")
    for d, k, a, b in sorted(faster, reverse=True):
        print(f"  {k}: {a:.2f}s -> {b:.2f}s (-{d:.2f}s)")
    if not faster:
        print("  (none)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
