#!/usr/bin/env python3
"""Bench regression gate: diff a bench run against tools/anchors.json.

BASELINE.md's rule — "treat any later regression >1.5x per query as a
blocker" — enforced as a tool instead of a human reading logs (r11
VERDICT item 4). A row FAILS when BOTH hold:

  sec > 1.5 * anchor          (the documented ratio rule)
  sec - anchor > 0.75         (absolute guard: sub-second rows jitter
                               +-0.3 s run to run on a shared host;
                               a 0.2 -> 0.35 s reading is noise, not
                               a regression)

Anchor coverage is itself a gate invariant (r13 VERDICT item 2):
a bench row with NO anchor is a FAILURE unless --allow-new is passed
(mid-round development escape) — f_catalog_ddl shipped un-anchored in
r13 and was invisible to this gate until the r14 close.

A cross-round sanity line compares the anchors' per-row cost to the
latest driver bench (BENCH_r*.json): a >10% move must be justified by
a note_r{N} entry in anchors.json meta KEYED TO THE CURRENT ROUND
(r14 ADVICE: any pre-existing note_* used to satisfy the check
permanently, making the WARNING unreachable).

Host-noise handling (r14 VERDICT item 1) — this gate consumes the
evidence the bench itself records:

  * host drift: the bench times a fixed SF-independent canary workload
    several times per run; every per-row anchor is scaled by
    median(canary)/canary_anchor (clamped to [1, 3]) before the ratio
    rule applies. A uniformly-contended host slows the canary exactly
    like it slows the rows.
  * exoneration: a remaining blocker whose evidence record shows a
    SUCCESSFUL instrumented re-run with no GC storm and aggregate task
    CPU < 50% of wall x cores did not spend its wall on our work — it
    is listed as exonerated_host and excluded from the exit decision.
    Failed rows (sec < 0) are never exonerated.

Usage:
  python3 tools/bench_check.py [bench_full.json] [--update] [--allow-new]

  default input: target/bench_full.json (written by graft.Bench)
  --update: rewrite tools/anchors.json from this run (round close),
            keeping per-row max(old, new) is NOT done — anchors track
            the latest accepted quiet run verbatim.

Exit code 0 = no blockers, 1 = at least one row regressed, failed
outright (sec < 0), or is un-anchored (without --allow-new).
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ANCHORS = os.path.join(HERE, "anchors.json")

RATIO = 1.5
ABS_GUARD = 0.75


def cross_round_sanity(anchors) -> None:
    """Print anchors-vs-latest-driver-round per-row delta; flag a >10%
    move that has no note_* justification in anchors.json meta."""
    import glob
    import re
    # only numbered rounds: a stray BENCH_rtest.json must not crash the
    # advisory sanity line (r14 ADVICE)
    benches = sorted(
        (p for p in glob.glob(os.path.join(HERE, "..", "BENCH_r*.json"))
         if re.fullmatch(r"BENCH_r\d+\.json", os.path.basename(p))),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    if not benches:
        return
    latest = benches[-1]
    rnd = re.search(r"r(\d+)", os.path.basename(latest)).group(1)
    with open(latest) as f:
        drv = json.load(f)
    # the driver wraps Bench's stdout in a "tail" string; the headline
    # {"metric":"total",...} line is the last JSON object inside it
    if "value" not in drv and "tail" in drv:
        lines = [ln.strip() for ln in drv["tail"].splitlines()
                 if ln.strip().startswith('{"metric":"total"')]
        if not lines:
            return
        try:
            drv = json.loads(lines[-1])
        except json.JSONDecodeError:
            return
    if "value" not in drv:
        return
    corr = os.path.join(HERE, "..", f"CORRECTNESS_r{rnd}.json")
    try:
        with open(corr) as f:
            drv_rows = len(json.load(f))
    except OSError:
        drv_rows = anchors["meta"].get("n_queries", 1)
    a_per = anchors["meta"]["total_sec"] / anchors["meta"]["n_queries"]
    d_per = drv["value"] / max(1, drv_rows)
    delta = (a_per - d_per) / d_per if d_per else 0.0
    print(f"-- anchor sanity: anchors {a_per:.3f} s/row vs "
          f"{os.path.basename(latest)} driver {d_per:.3f} s/row "
          f"({delta:+.0%})")
    if abs(delta) > 0.10:
        # only a note keyed to the CURRENT driver round justifies the
        # move — any pre-existing note_* made this branch unreachable
        # (r14 ADVICE)
        cur = [k for k in anchors["meta"]
               if re.fullmatch(rf"note_r{int(rnd)}[a-z]?", k)]
        if cur:
            print(f"   >10% move — justification on file: meta.{cur[-1]}")
        else:
            print(f"   WARNING: >10% move with NO note_r{int(rnd)}* "
                  "justification in anchors.json meta — document the "
                  "host/code cause before accepting these anchors")


def main() -> int:
    args = [a for a in sys.argv[1:]
            if a not in ("--update", "--allow-new")]
    update = "--update" in sys.argv[1:]
    allow_new = "--allow-new" in sys.argv[1:]
    bench_path = args[0] if args else os.path.join(
        HERE, "..", "target", "bench_full.json")
    with open(bench_path) as f:
        bench = json.load(f)
    qs = bench["queries"]
    with open(ANCHORS) as f:
        anchors = json.load(f)
    aq = anchors["queries"]

    # host drift from the bench's canary readings vs the canary anchor
    # (same clamp as Bench.scala); falls back to the bench's own
    # host_drift field, then 1.0
    canary_anchor = anchors["meta"].get("canary_sec", 0.0)
    readings = sorted(bench.get("canary_sec", []))
    if canary_anchor > 0 and readings:
        mid = len(readings) // 2
        med = (readings[mid] if len(readings) % 2
               else (readings[mid - 1] + readings[mid]) / 2)
        drift = min(3.0, max(1.0, med / canary_anchor))
    else:
        drift = max(1.0, float(bench.get("host_drift", 1.0)))
    cores = int(bench.get("cores", 32))
    ev = bench.get("evidence", {})

    def host_noise(name):
        e = ev.get(name)
        if not isinstance(e, dict) or not e.get("ok"):
            return False
        wall, run, gc = (e.get("wall_sec", 0.0), e.get("task_run_ms", 0),
                         e.get("task_gc_ms", 0))
        return (wall > 0 and gc < max(500, 0.2 * run)
                and run < 0.5 * wall * 1000 * cores)

    regressed, exonerated, improved, new, gone = [], [], [], [], []
    for name, sec in sorted(qs.items()):
        a = aq.get(name)
        if a is None:
            new.append((name, sec))
            continue
        if sec < 0:
            regressed.append((name, a, sec, float("inf")))
            continue
        ratio = sec / a if a > 0 else float("inf")
        if sec > RATIO * a * drift and sec - a * drift > ABS_GUARD:
            (exonerated if host_noise(name) else regressed).append(
                (name, a, sec, ratio))
        elif a > RATIO * sec and a - sec > ABS_GUARD:
            improved.append((name, a, sec, ratio))
    for name in sorted(aq):
        if name not in qs:
            gone.append(name)

    total = sum(v for v in qs.values() if v >= 0)
    atotal = anchors["meta"].get("total_sec", sum(aq.values()))
    print(f"== bench_check: {len(qs)} rows, total {total:.1f} s "
          f"(anchor total {atotal:.1f} s, ratio {total / atotal:.2f}, "
          f"host drift {drift:.2f}) ==")
    cross_round_sanity(anchors)
    if new:
        tag = "new rows (no anchor yet)" if allow_new \
            else "UN-ANCHORED rows (BLOCKER — anchor them or pass " \
                 "--allow-new mid-round)"
        print(f"-- {len(new)} {tag}:")
        for name, sec in new:
            print(f"   NEW  {name:32s} {sec:7.2f} s")
    if gone:
        tag = "(informational under --allow-new/--update)" \
            if (allow_new or update) else \
            "(BLOCKER — a registry row was dropped, or anchor it out)"
        print(f"-- {len(gone)} anchored rows missing from this run "
              f"{tag}: " + ", ".join(gone))
    if exonerated:
        print(f"-- {len(exonerated)} over-anchor rows EXONERATED as host "
              "noise (evidence: ok run, no GC storm, task CPU < 50% of "
              "wall x cores):")
        for name, a, sec, ratio in exonerated:
            e = ev.get(name, {})
            print(f"   HOST {name:32s} {sec:7.2f} s (anchor {a:.2f}, "
                  f"{ratio:.1f}x; task {e.get('task_run_ms', 0) / 1000.0:.1f}"
                  f" s / wall {e.get('wall_sec', 0.0):.1f} s, "
                  f"gc {e.get('task_gc_ms', 0)} ms)")
    if improved:
        print(f"-- {len(improved)} rows >1.5x FASTER than anchor "
              "(refresh anchors at close):")
        for name, a, sec, _ in improved:
            print(f"   FAST {name:32s} {sec:7.2f} s (anchor {a:.2f})")
    if regressed:
        print(f"-- BLOCKER: {len(regressed)} rows regressed "
              f">{RATIO}x and >+{ABS_GUARD}s (drift-scaled, "
              "unexonerated):")
        for name, a, sec, ratio in regressed:
            print(f"   FAIL {name:32s} {sec:7.2f} s (anchor {a:.2f}, "
                  f"{ratio:.1f}x)")
    else:
        print("-- regression gate: PASS (no unexonerated row >1.5x "
              "drift-scaled anchor and >+0.75s)")

    if update:
        anchors["queries"] = {k: round(v, 3)
                              for k, v in sorted(qs.items()) if v >= 0}
        anchors["meta"]["total_sec"] = round(total, 2)
        anchors["meta"]["n_queries"] = len(anchors["queries"])
        anchors["meta"]["source"] = bench_path
        with open(ANCHORS, "w") as f:
            json.dump(anchors, f, indent=1)
        print(f"-- anchors.json refreshed from {bench_path}")

    return 1 if (regressed or (new and not allow_new)
                 or (gone and not (allow_new or update))) else 0


if __name__ == "__main__":
    sys.exit(main())
