#!/usr/bin/env python3
"""Records-first bench comparison (SCALE.md rejection rule, round 15).

Wall clock on this box swings 5-10x with neighbour load; per-entry
shuffle records are a property of the plan. This tool diffs two bench
artifacts by RECORDS first, so a round-over-round drift claim starts
from plan properties instead of the wall-clock re-attribution ritual:

  python3 tools/bench_diff.py BENCH_r14.json BENCH_r15.json

Accepts either the driver artifact shape (a dict whose "tail" string
holds the emitted JSON lines) or a raw log of '{"metric":...}' lines.
Since r16 Bench also persists the complete line (per-entry records map
included, immune to the driver's 2000-char log-tail truncation) to
docs/bench_records/<sf>.json (latest) and <sf>_history.jsonl
(timestamped, one line per run) — prefer those as inputs.
Older artifacts without a "records" map still diff on seconds, loudly
marked as wall-only. Output: entries whose records moved > max(10%,
1000), new/missing entries, and the seconds beside them for context.
"""
import json
import re
import sys


def load_bench(path):
    text = open(path, encoding="utf-8").read()
    # driver artifact: {"n":..,"tail":"...{\"metric\":\"total\"...}..."}
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "tail" in d and "metric" not in d:
            text = d["tail"]
    except json.JSONDecodeError:
        pass
    best = None
    # history lines carry a leading "ts" field — allow exactly that
    # prefix (an unanchored '{' would start the match at any earlier
    # brace on the line and json.loads would then skip the real object)
    for m in re.finditer(r'\{("ts":"[^"]*",)?"metric":"total".*\}', text):
        try:
            line = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if line.get("metric") == "total" and line.get("queries"):
            best = line
    if best is None:
        sys.exit(f"{path}: no parsable full 'total' bench line found")
    return best


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    a, b = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    ra, rb = a.get("records") or {}, b.get("records") or {}
    print(f"A: total={a['value']:.1f}s lines={len(qa)} "
          f"recs={a.get('shuf_recs_total', 'n/a')}")
    print(f"B: total={b['value']:.1f}s lines={len(qb)} "
          f"recs={b.get('shuf_recs_total', 'n/a')}")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print(f"removed ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"added   ({len(only_b)}): {', '.join(only_b)}")
    if not ra or not rb:
        print("NOTE: records map missing on one side - WALL-ONLY diff "
              "(pre-r15 artifact); treat deltas as box-noise-suspect")
        moved = [(k, qa[k], qb[k]) for k in sorted(set(qa) & set(qb))
                 if min(qa[k], qb[k]) >= 0
                 and abs(qb[k] - qa[k]) > max(0.5, 0.5 * qa[k])]
        for k, va, vb in sorted(moved, key=lambda t: -abs(t[2] - t[1])):
            print(f"  wall {k:32s} {va:7.2f}s -> {vb:7.2f}s")
        return
    moved = []
    for k in sorted(set(ra) & set(rb)):
        pa, pb = ra[k][0], rb[k][0]
        if abs(pb - pa) > max(1000, 0.10 * max(pa, 1)):
            moved.append((k, pa, pb, qa.get(k, -1), qb.get(k, -1)))
    if not moved:
        print("records: no entry moved > max(10%, 1000) - plan-level parity")
    else:
        print(f"records moved ({len(moved)}):")
        for k, pa, pb, wa, wb in sorted(
                moved, key=lambda t: -abs(t[2] - t[1]) / max(t[1], 1)):
            ratio = pb / pa if pa else float("inf")
            print(f"  {k:32s} recs {pa:>10,} -> {pb:>10,} ({ratio:5.2f}x)"
                  f"  wall {wa:6.2f}s -> {wb:6.2f}s")
    # wall movers with FLAT records: box noise by the rejection rule
    noise = [(k, qa[k], qb[k]) for k in sorted(set(qa) & set(qb))
             if k in ra and k in rb
             and abs(rb[k][0] - ra[k][0]) <= max(1000, 0.10 * max(ra[k][0], 1))
             and min(qa[k], qb[k]) >= 0
             and abs(qb[k] - qa[k]) > max(1.0, 1.0 * qa[k])]
    if noise:
        print(f"wall moved with FLAT records ({len(noise)}) - box noise "
              "per the rejection rule, not engine drift:")
        for k, va, vb in sorted(noise, key=lambda t: -abs(t[2] - t[1]))[:10]:
            print(f"  {k:32s} {va:7.2f}s -> {vb:7.2f}s")


if __name__ == "__main__":
    main()
