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

Non-comparable pairs (cpus/heap differ, re-execution, spill or rebuild
asymmetry, mid-run cache eviction) are REFUSED with exit code 1;
`--force` overrides the refusal for forensics, with every mover marked
environment-suspect.
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


def stability_flags(run):
    """Non-comparability reasons for a run (r16 verdict ask #2): records
    embed RE-EXECUTION (failed tasks re-write their shuffle rows, stage
    retries re-write whole stages), mid-run cache eviction makes
    consumers recompute upstream stages, and a cold lake charges
    artifact rebuilds to the setup lines. Runs predating these fields
    report no flags (their comparability is unknown, noted separately).
    """
    flags = []
    if run.get("task_failures_total", 0) > 0:
        flags.append(f"{run['task_failures_total']} failed tasks re-executed")
    if run.get("stage_retries_total", 0) > 0:
        flags.append(f"{run['stage_retries_total']} stage retries")
    if run.get("cache_stable") is False:
        flags.append("shared-frame cache shrank mid-run (consumers recomputed)")
    return flags


def rebuild_asymmetry(a, b):
    """Rebuild lists that differ BETWEEN the runs (as multisets). The
    incremental entries rebuild+restore their artifacts every run by
    design — identical lists on both sides are comparable; a rebuild
    only one run paid (stamp bump, fixture regen, cold lake) is not.
    """
    from collections import Counter
    out = []
    for key in ("rebuilt_setup", "rebuilt_midrun"):
        if key not in a or key not in b:
            continue  # pre-journal artifact: unknown, noted elsewhere
        # journal rows may carry a '#<bench-entry>' attribution suffix
        # (who triggered the rebuild) — compare on the artifact alone so
        # tagged and pre-tag records stay comparable
        untag = lambda xs: [x.split("#", 1)[0] for x in xs]
        ca, cb = Counter(untag(a[key])), Counter(untag(b[key]))
        if ca != cb:
            delta = (ca - cb) + (cb - ca)
            out.append(f"{key} differs: {dict(delta)}")
    return out


def entry_reexec(rec):
    """Per-entry re-execution marker from the 5-element records form
    [recs, bytes, failed_tasks, stage_retries, spill_bytes]; legacy
    2-element rows report 0 (unknown)."""
    return (rec[2] if len(rec) > 2 else 0) + (rec[3] if len(rec) > 3 else 0)


def entry_spill(rec):
    return rec[4] if len(rec) > 4 else 0


def entry_gc_ms(rec):
    """GC-time delta (ms) from the 7-element r18 records form."""
    return rec[5] if len(rec) > 5 else None


def entry_task_ms(rec):
    """Summed executorRunTime (ms) from the 7-element r18 records form —
    the environment-window witness: an entry whose WALL inflates while
    its task work stays flat was stalled by the box (contended window,
    GC storm), not by its plan. The r17 driver artifact carried an
    11-entry window (exec 226-236) reading 3-11x quiet wall at
    bit-identical records; these fields make the next one self-describing."""
    return rec[6] if len(rec) > 6 else None


def main():
    args = [x for x in sys.argv[1:] if x != "--force"]
    if len(args) != 2:
        sys.exit(__doc__)
    a, b = load_bench(args[0]), load_bench(args[1])
    qa, qb = a["queries"], b["queries"]
    ra, rb = a.get("records") or {}, b.get("records") or {}
    # comparability gate BEFORE any mover is printed: a run whose
    # records embed re-execution or cold rebuilds is not evidence of
    # plan drift, and the r16 false-mover class (shared-frame consumers
    # 3-4x up in a contended fleet run) must be refused, not reported
    fa, fb = stability_flags(a), stability_flags(b)
    for tag, fl in (("A", fa), ("B", fb)):
        for f in fl:
            print(f"NON-COMPARABLE {tag}: {f}")
    asym = rebuild_asymmetry(a, b)
    # THE confirmed r16 false-mover mechanism: partial aggregation
    # combines PER MAP TASK, so a hot key in N map partitions emits ~N
    # partial rows — the same plan at local[4]/local[8]/local[32] wrote
    # 19,874/37,434/82,142 records on text_gopher_rules (heap 6g vs 24g
    # changed nothing at fixed threads). Records are a property of
    # (plan, parallelism); cross-config pairs are refused outright.
    ca, cb = a.get("cpus"), b.get("cpus")
    if ca and cb and ca != cb:
        asym.append(f"cpus differ: {ca} vs {cb} (partial-agg rows scale "
                    "with map tasks — same plan, different records)")
    ha, hb = a.get("heap_mb"), b.get("heap_mb")
    if ha and hb and abs(hb - ha) > 0.2 * max(ha, hb):
        asym.append(f"heap differs: {ha} MB vs {hb} MB (a memory-starved "
                    "run saturates partial-agg maps the same way)")
    sp_a, sp_b = a.get("spill_mb_total", 0), b.get("spill_mb_total", 0)
    if abs(sp_b - sp_a) > 16:
        asym.append(f"spill asymmetry: {sp_a:.0f} MB vs {sp_b:.0f} MB "
                    "(memory pressure inflates partial-agg records)")
    # fully-dropped cached RDDs (start-census ids absent at run end):
    # routine churn (the served-index cache unpersists superseded
    # frames every build-entry rebuild) is deterministic per entry set,
    # so an ASYMMETRY hints one run lost a shared frame entirely — but
    # ContextCleaner timing can jitter the count, so annotate rather
    # than refuse
    da, db = a.get("cache_dropped_n"), b.get("cache_dropped_n")
    if da is not None and db is not None and da != db:
        print(f"NOTE: cache_dropped_n differs ({da} vs {db}) - one run "
              "may have lost a shared cached frame entirely (consumers "
              "recomputed upstream); treat its movers with suspicion")
    for f in asym:
        print(f"NON-COMPARABLE A<->B: {f}")
    fa = fa + asym
    if fa or fb:
        # the REFUSAL the module contract promises: a cross-config or
        # unstable pair's record deltas are environment, not plan —
        # reporting them as movers is exactly the r16 false-mover
        # failure. --force overrides for forensics, loudly annotated.
        if "--force" not in sys.argv:
            sys.exit("refusing to diff non-comparable runs "
                     "(--force overrides; movers would then be "
                     "environment-suspect, not plan drift)")
        print("FORCED: runs are NOT plan-comparable; movers below are "
              "environment-suspect, setup-line records show where the "
              "extra work landed")
    unknown = [t for t, r in (("A", a), ("B", b))
               if "task_failures_total" not in r]
    if unknown:
        print(f"NOTE: {'/'.join(unknown)} predate the stability fields - "
              "re-execution state unknown")
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
            # annotate movers whose own window saw re-execution or an
            # asymmetric spill — their record delta is environment, not
            # plan (a spilled map-side hash agg emits partially-
            # unaggregated rows: same plan, more records)
            rx = entry_reexec(ra[k]) + entry_reexec(rb[k])
            sa, sb = entry_spill(ra[k]), entry_spill(rb[k])
            mark = ""
            if rx:
                mark = "  [RE-EXEC - not a plan mover]"
            elif abs(sb - sa) > (1 << 20):
                mark = (f"  [SPILL {sa/1e6:.0f}->{sb/1e6:.0f} MB - "
                        "memory pressure, not a plan mover]")
            print(f"  {k:32s} recs {pa:>10,} -> {pb:>10,} ({ratio:5.2f}x)"
                  f"  wall {wa:6.2f}s -> {wb:6.2f}s{mark}")
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
            # r18 witnesses: taskRun flat while wall moved = environment
            # window (the entry's tasks did the same work, the box
            # stalled them); taskRun moving with wall = real compute
            # drift hiding at record parity (worth a look)
            ta, tb = entry_task_ms(ra[k]), entry_task_ms(rb[k])
            ga, gb = entry_gc_ms(ra[k]), entry_gc_ms(rb[k])
            mark = ""
            if ta is not None and tb is not None:
                if abs(tb - ta) <= max(200, 0.25 * max(ta, tb, 1)):
                    mark = f"  [taskRun flat {ta}->{tb} ms: ENV WINDOW]"
                else:
                    mark = f"  [taskRun {ta}->{tb} ms moved with wall]"
            if ga is not None and gb is not None and max(ga, gb) > 200:
                mark += f" [gc {ga}->{gb} ms]"
            print(f"  {k:32s} {va:7.2f}s -> {vb:7.2f}s{mark}")


if __name__ == "__main__":
    main()
