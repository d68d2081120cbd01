#!/usr/bin/env python3
"""Per-key bench regression diff (VERDICT r10 item 5).

Compares two BENCH_full_r<N>.json artifacts (the complete per-key
second maps Bench.scala writes on full-surface runs) and flags every
key whose time moved by more than THRESH× in either direction, plus
keys that appear in only one round (surface adds/removals). For each
flagged key it reports whether the key carries a plan-audit rule in
Explain.scala (AuditRules) — a flagged move on an audited key means
the plan shape is still pinned and the move is load/noise; a move on
an unaudited key is where to look first.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [--thresh 1.5]
Exit status is always 0 — the tool reports, the human adjudicates
(shared-machine noise at sub-second scale is expected; the committed
noise band is ±30%, so the default 1.5× threshold only fires on real
shape changes or >0.5s absolute moves).
"""
import argparse
import json
import os
import re
import sys

# keys below this many seconds in BOTH rounds are scheduling-floor
# noise at local[32]; ratio-flagging them is pure churn
MIN_ABS_SEC = 0.5


def audit_keys(explain_path):
    if not os.path.exists(explain_path):
        return set()
    src = open(explain_path, encoding="utf-8").read()
    return set(re.findall(r'"([a-z0-9_]+)"\s*->\s*Rule', src))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--thresh", type=float, default=1.5)
    ap.add_argument("--explain", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "src/main/scala/graft/Explain.scala"))
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]
    audited = audit_keys(args.explain)

    flagged, added, removed = [], sorted(set(nq) - set(oq)), sorted(set(oq) - set(nq))
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a < 0 or b < 0:  # errored in either round — always surface
            flagged.append((k, a, b, float("inf")))
            continue
        if max(a, b) < MIN_ABS_SEC:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio > args.thresh or ratio < 1.0 / args.thresh:
            flagged.append((k, a, b, ratio))

    flagged.sort(key=lambda t: -max(t[3], 1.0 / t[3] if t[3] > 0 else 0))
    print(f"== bench diff: {os.path.basename(args.old)} -> "
          f"{os.path.basename(args.new)} "
          f"(total {old['value']:.1f}s -> {new['value']:.1f}s, "
          f"{len(oq)} -> {len(nq)} keys, thresh {args.thresh}x, "
          f"min-abs {MIN_ABS_SEC}s) ==")
    if not flagged and not added and not removed:
        print("no per-key moves beyond threshold; no surface changes")
    for k, a, b, r in flagged:
        tag = "plan-audited" if k.split("#")[0] in audited else "NO plan audit"
        rs = "ERR" if r == float("inf") else f"{r:.2f}x"
        print(f"  {rs:>8}  {k:<32} {a:7.2f}s -> {b:7.2f}s  [{tag}]")
    for k in added:
        print(f"  {'NEW':>8}  {k:<32}          -> {nq[k]:7.2f}s")
    for k in removed:
        print(f"  {'GONE':>8}  {k:<32} {oq[k]:7.2f}s ->")
    return 0


if __name__ == "__main__":
    sys.exit(main())
