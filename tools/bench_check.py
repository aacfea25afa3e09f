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
a note_* entry in anchors.json meta, keeping re-baselining honest
(r13 VERDICT item 6).

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
    benches = sorted(
        glob.glob(os.path.join(HERE, "..", "BENCH_r*.json")),
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
        notes = [k for k in anchors["meta"] if k.startswith("note")]
        if notes:
            print(f"   >10% move — justification on file: meta.{notes[-1]}")
        else:
            print("   WARNING: >10% move with NO note_* justification "
                  "in anchors.json meta — document the host/code cause "
                  "before accepting these anchors")


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

    regressed, improved, new, gone = [], [], [], []
    for name, sec in sorted(qs.items()):
        a = aq.get(name)
        if a is None:
            new.append((name, sec))
            continue
        if sec < 0:
            regressed.append((name, a, sec, float("inf")))
            continue
        ratio = sec / a if a > 0 else float("inf")
        if sec > RATIO * a and sec - a > ABS_GUARD:
            regressed.append((name, a, sec, ratio))
        elif a > RATIO * sec and a - sec > ABS_GUARD:
            improved.append((name, a, sec, ratio))
    for name in sorted(aq):
        if name not in qs:
            gone.append(name)

    total = sum(v for v in qs.values() if v >= 0)
    atotal = anchors["meta"].get("total_sec", sum(aq.values()))
    print(f"== bench_check: {len(qs)} rows, total {total:.1f} s "
          f"(anchor total {atotal:.1f} s, ratio {total / atotal:.2f}) ==")
    cross_round_sanity(anchors)
    if new:
        tag = "new rows (no anchor yet)" if allow_new \
            else "UN-ANCHORED rows (BLOCKER — anchor them or pass " \
                 "--allow-new mid-round)"
        print(f"-- {len(new)} {tag}:")
        for name, sec in new:
            print(f"   NEW  {name:32s} {sec:7.2f} s")
    if gone:
        print(f"-- {len(gone)} anchored rows missing from this run: "
              + ", ".join(gone))
    if improved:
        print(f"-- {len(improved)} rows >1.5x FASTER than anchor "
              "(refresh anchors at close):")
        for name, a, sec, _ in improved:
            print(f"   FAST {name:32s} {sec:7.2f} s (anchor {a:.2f})")
    if regressed:
        print(f"-- BLOCKER: {len(regressed)} rows regressed "
              f">{RATIO}x and >+{ABS_GUARD}s:")
        for name, a, sec, ratio in regressed:
            print(f"   FAIL {name:32s} {sec:7.2f} s (anchor {a:.2f}, "
                  f"{ratio:.1f}x)")
    else:
        print("-- regression gate: PASS (no row >1.5x and >+0.75s "
              "over anchor)")

    if update:
        anchors["queries"] = {k: round(v, 3)
                              for k, v in sorted(qs.items()) if v >= 0}
        anchors["meta"]["total_sec"] = round(total, 2)
        anchors["meta"]["n_queries"] = len(anchors["queries"])
        anchors["meta"]["source"] = bench_path
        with open(ANCHORS, "w") as f:
            json.dump(anchors, f, indent=1)
        print(f"-- anchors.json refreshed from {bench_path}")

    return 1 if regressed or (new and not allow_new) else 0


if __name__ == "__main__":
    sys.exit(main())
