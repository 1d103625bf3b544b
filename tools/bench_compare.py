#!/usr/bin/env python3
"""Round-over-round per-query bench comparison.

Usage: python3 tools/bench_compare.py <old_bench.json> <new_bench.json> [ratio]

Each file is a Bench full-output line (the committed bench_local_rN.json:
{"queries": {name: sec, ...}, "value": total, ...}). Prints queries whose
time moved by more than `ratio` (default 1.5x) in either direction, plus
added/removed queries and the total delta — the check VERDICT.md r9
called impossible from driver artifacts alone (the driver log tail keeps
only ~68 of 290+ per-query times; the committed local file keeps all).

Round-8 calibration: same-code best-of-3 runs still move up to ~1.5x on
sub-second queries and 30-47% on the >=1s band, so treat single-round
movers as candidates to re-measure (best-of-5 probe), not verdicts.
"""
import json
import os
import re
import sys


def shuffle_classes(audit_path, threshold_mb=1.0):
    """Classify each query as shuffle-bound or cpu-bound from its LAST
    SHUFFLE_AUDIT.md row (rows are appended per round; the newest
    measurement wins). A query shuffling >= threshold_mb at sf0.1 rides
    the machine's shuffle path; everything else (the map-only decode
    tier, small aggregates) tracks per-core compute. The class picks
    WHICH calibration probe normalizes that query's wall."""
    classes = {}
    if not os.path.exists(audit_path):
        return classes
    row = re.compile(r"^\| (q\d+_\w+) \| ([\d.]+) \| ([\d.]+) \|")
    for line in open(audit_path):
        m = row.match(line)
        if m:
            classes[m.group(1)] = (
                "shuffle" if float(m.group(3)) >= threshold_mb else "cpu")
    return classes


def main(old_path, new_path, ratio=1.5):
    old_full = json.load(open(old_path))
    new_full = json.load(open(new_path))
    if "queries_median" in old_full and "queries_median" in new_full:
        old, new = old_full["queries_median"], new_full["queries_median"]
        print("(comparing per-query MEDIANS; movers beyond ~1.1x are "
              "likely real)")
    else:
        old, new = old_full["queries"], new_full["queries"]
    both = sorted(set(old) & set(new))
    # Per-query CALIBRATION-NORMALIZED movers (round 15 — the applied
    # protocol the r13/r14 drift adjudications did by hand): classify
    # each query shuffle-bound vs cpu-bound from its SHUFFLE_AUDIT row,
    # divide its raw ratio by the MATCHING calibration probe's ratio,
    # and flag only what survives. A shuffle-bound query moving in
    # lockstep with the shuffle probe (the q23/q97/q126/q243 quartet)
    # normalizes back to ~1x — machine weather, not code; a cpu-bound
    # query moving while the cpu probe stays flat stays flagged — code.
    classes = shuffle_classes(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SHUFFLE_AUDIT.md"))
    cal_r = None
    if old_full.get("calibration_sec") and new_full.get("calibration_sec"):
        cal_r = new_full["calibration_sec"] / old_full["calibration_sec"]
    cpu_r = None
    if (old_full.get("calibration_cpu_sec")
            and new_full.get("calibration_cpu_sec")):
        cpu_r = (new_full["calibration_cpu_sec"]
                 / old_full["calibration_cpu_sec"])
    movers = []
    exonerated = []
    for q in both:
        a, b = old[q], new[q]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        cls = classes.get(q, "cpu")
        denom = cal_r if cls == "shuffle" else cpu_r
        rn = r / denom if denom else r
        # a query is a REAL mover only when the raw ratio and the
        # calibration-normalized ratio agree in direction past the
        # threshold — a raw mover whose normalized ratio collapses (or
        # flips) moved WITH the machine, not with the code (a wall time
        # is never 100% probe-shaped, so the normalized value alone
        # over-corrects when the probe swings hard, e.g. r13->r14's
        # 4.4x shuffle swing)
        if r > ratio and rn > ratio:
            movers.append((rn, r, q, a, b, cls))
        elif r < 1 / ratio and rn < 1 / ratio:
            movers.append((rn, r, q, a, b, cls))
        elif r > ratio or r < 1 / ratio:
            exonerated.append((r, q, cls))
    movers.sort(reverse=True)
    for rn, r, q, a, b, cls in movers:
        arrow = "SLOWER" if rn > 1 else "faster"
        print(f"{q}: {a:.3f}s -> {b:.3f}s (raw {r:.2f}x, {cls}-normalized "
              f"{rn:.2f}x {arrow})")
    if exonerated:
        names = ", ".join(
            f"{q} (raw {r:.2f}x, {cls})" for r, q, cls in
            sorted(exonerated, reverse=True))
        print(f"moved WITH the machine, exonerated by the {'{'}shuffle,"
              f"cpu{'}'} calibration pair ({len(exonerated)}): {names}")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    tot_old = sum(old[q] for q in both)
    tot_new = sum(new[q] for q in both)
    print(f"== {len(both)} shared queries: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x); {len(movers)} movers beyond "
          f"{ratio}x ==")
    # Calibration-normalized delta (round 12): each bench line carries
    # calibration_sec, the forced range(8M).repartition(8) probe timed
    # inside the same run. Dividing the shared-query totals by their
    # run's calibration time cancels ambient machine drift (CPU
    # contention, I/O weather), so the normalized ratio attributes to
    # CODE, not to the day the run happened on.
    cal_old = old_full.get("calibration_sec")
    cal_new = new_full.get("calibration_sec")
    if cal_old and cal_new:
        norm = (tot_new / cal_new) / (tot_old / cal_old)
        print(f"== calibration {cal_old:.3f}s -> {cal_new:.3f}s; "
              f"normalized shared-total ratio {norm:.2f}x "
              f"(raw {tot_new / tot_old:.2f}x) ==")
    # CPU-bound calibration (round 13): the shuffle probe above proved
    # blind to host per-core THROUGHPUT drift (the r13 adjudication:
    # every family 1.5-2.9x slower locally on untouched code while the
    # shuffle probe stayed flat). Expression-heavy totals normalize
    # better against this probe; when both probes move together it's
    # the whole machine, when only cpu moves it's compute class.
    ccpu_old = old_full.get("calibration_cpu_sec")
    ccpu_new = new_full.get("calibration_cpu_sec")
    if ccpu_old and ccpu_new:
        norm = (tot_new / ccpu_new) / (tot_old / ccpu_old)
        print(f"== cpu-calibration {ccpu_old:.3f}s -> {ccpu_new:.3f}s; "
              f"cpu-normalized shared-total ratio {norm:.2f}x ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.5))
