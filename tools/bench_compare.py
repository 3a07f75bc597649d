#!/usr/bin/env python3
"""Drift-normalized comparison of two graft.Bench JSON artifacts.

Mechanizes the README's normalization rule: every Bench run stamps
`calib_sec` (a fixed CPU+shuffle micro-workload timed in the same JVM),
so machine/VM speed drift between two runs shows up in the calib ratio
and can be divided out of the per-query ratios. Only residuals above the
normalized baseline are real regressions.

Usage:
  python3 tools/bench_compare.py OLD.json NEW.json [--fail-over R]

Prints per-query normalized ratios for the common surface, a summary
(sum/geomean raw + normalized, added/removed queries), and the worst
offenders. With --fail-over R, exits 1 if any common query's NORMALIZED
ratio exceeds R (the mechanical stand-in for the hand-adjudicated
"~2x noise band" of rounds 9-11).
"""
import argparse
import json
import math
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    # Reassemble a STDOUT capture: Bench prints per-query minima as N
    # {"bench_part":i,"of":n,"queries":{...}} lines (<1,900 bytes each)
    # followed by a fixed-size summary line, so the driver's bounded
    # tail always ends on parseable JSON. A truncated leading line
    # (decapitated by the tail bound) is skipped, not fatal.
    queries, summary = {}, None
    part_seen, part_of = set(), None
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if "bench_part" in obj:
            part_seen.add(obj["bench_part"])
            part_of = obj.get("of", part_of)
            queries.update(obj.get("queries", {}))
        elif obj.get("metric") == "total":
            summary = obj
    if summary is not None:
        summary.setdefault("queries", {})
        summary["queries"].update(queries)
        # Every part line stamps "of":n — a bounded tail capture usually
        # decapitates the leading parts, so an incomplete 1..n cover
        # means the per-query map is PARTIAL. Mark it loudly instead of
        # returning a dict indistinguishable from a full artifact (a
        # regression in a dropped part would read as "no change").
        if part_of is not None and part_seen != set(range(1, part_of + 1)):
            missing = sorted(set(range(1, part_of + 1)) - part_seen)
            summary["partial"] = True
            print(f"WARNING: {path}: stdout tail holds only part lines "
                  f"{sorted(part_seen)} of 1..{part_of} (missing "
                  f"{missing}) — per-query map is PARTIAL; only the "
                  "summary totals are complete", file=sys.stderr)
        if summary["queries"]:
            return summary
    sys.exit(f"{path}: not a graft.Bench artifact (no 'queries' key)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--fail-over", type=float, default=None, metavar="R",
                    help="exit 1 if any normalized per-query ratio > R")
    ap.add_argument("--top", type=int, default=10,
                    help="how many worst offenders to list (default 10)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    # A PARTIAL reassembly (marked by load()) covers only whichever part
    # lines survived the tail bound: per-query ratios over it are
    # systematically blind to the dropped parts, and the --fail-over
    # gate would pass vacuously. Compare the (complete) summary totals
    # and refuse the per-query path.
    if old.get("partial") or new.get("partial"):
        which = [p for p, d in ((args.old, old), (args.new, new))
                 if d.get("partial")]
        to, tn = old.get("value"), new.get("value")
        if to and tn:
            print(f"summary totals: {to:.1f}s -> {tn:.1f}s  "
                  f"raw {tn / to:.3f}x  (PARTIAL per-query map in "
                  + ", ".join(which) + " — totals only)")
        if args.fail_over is not None:
            sys.exit(f"PARTIAL artifact(s) {', '.join(which)}: the "
                     "--fail-over per-query gate cannot run on an "
                     "incomplete map; rerun against the full JSON "
                     "artifact (BENCH_LOCAL*.json), not the stdout tail")
        sys.exit(0)
    co, cn = old.get("calib_sec"), new.get("calib_sec")
    co = co if co and co > 0 else None   # -1 = stamp failed in that run
    cn = cn if cn and cn > 0 else None
    if co and cn:
        calib_ratio = cn / co
        calib_note = f"calib {co:.3f}s -> {cn:.3f}s (machine ratio {calib_ratio:.3f})"
    else:
        calib_ratio = 1.0
        missing = [p for p, c in ((args.old, co), (args.new, cn)) if not c]
        calib_note = ("no calib stamp in " + ", ".join(missing)
                      + " — ratios reported UNNORMALIZED")

    # Second, WORKLOAD-SHAPED machine ratio: the median new/old ratio
    # over the untouched control basket (the same five queries Bench
    # emits as ctrl_ratios). The synthetic calib stamp measures burst
    # CPU+shuffle; on this VM that can move OPPOSITE to sustained
    # many-small-job throughput (r17: calib 2x faster while lifecycle
    # queries ran 1.7x slower), so when both artifacts carry the
    # controls, their ratio is the better normalizer and drives the
    # --fail-over gate.
    CONTROLS = ["p1_vec_l2sq", "p2_vec_dot", "p6_vec_cosine", "q1_agg",
                "mm_video_decode"]

    qo, qn = old["queries"], new["queries"]
    ctrl = sorted(qn[q] / qo[q] for q in CONTROLS
                  if qo.get(q, 0) > 0 and qn.get(q, 0) > 0)
    if len(ctrl) >= 3:
        m = len(ctrl) // 2
        ctrl_ratio = (ctrl[m] if len(ctrl) % 2 else
                      (ctrl[m - 1] + ctrl[m]) / 2)
        print(f"control basket ({len(ctrl)} queries): "
              f"machine ratio {ctrl_ratio:.3f} — drives the gate")
    else:
        ctrl_ratio = None
        print("control basket: absent/incomplete — gate falls back to calib")
    gate_ratio = ctrl_ratio if ctrl_ratio else None

    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if not common:
        sys.exit("no common queries between the two artifacts")

    rows = []
    degenerate = []
    for q in common:
        if qo[q] <= 0 or qn[q] <= 0:
            degenerate.append(q)
            continue
        raw = qn[q] / qo[q]
        rows.append((q, qo[q], qn[q], raw,
                     raw / (gate_ratio if gate_ratio else calib_ratio)))
    if degenerate:
        print(f"WARNING: {len(degenerate)} queries with non-positive timings "
              "excluded from ratios: " + ", ".join(degenerate))
    if not rows:
        sys.exit("no comparable queries (all timings non-positive)")

    sum_o = sum(r[1] for r in rows)
    sum_n = sum(r[2] for r in rows)
    geomean_norm = math.exp(sum(math.log(r[4]) for r in rows) / len(rows))
    geomean_raw = math.exp(sum(math.log(r[3]) for r in rows) / len(rows))

    print(calib_note)
    print(f"common queries: {len(common)}  added: {len(added)}  removed: {len(removed)}")
    if added:
        print("  added:   " + ", ".join(added))
    if removed:
        print("  removed: " + ", ".join(removed))
    norm_by = ("control basket" if gate_ratio else "calib")
    eff = gate_ratio if gate_ratio else calib_ratio
    print(f"sum (common): {sum_o:.1f}s -> {sum_n:.1f}s  "
          f"raw {sum_n / sum_o:.3f}x  normalized {sum_n / sum_o / eff:.3f}x"
          f"  (by {norm_by})")
    print(f"geomean per-query: raw {geomean_raw:.3f}x  "
          f"normalized {geomean_norm:.3f}x  (by {norm_by})")

    worst = sorted(rows, key=lambda r: -r[4])[:args.top]
    print(f"\nworst {len(worst)} by normalized ratio:")
    print(f"  {'query':<36} {'old_s':>8} {'new_s':>8} {'raw':>6} {'norm':>6}")
    for q, o, n, raw, norm in worst:
        print(f"  {q:<36} {o:8.3f} {n:8.3f} {raw:6.2f} {norm:6.2f}")

    if args.fail_over is not None:
        over = [(q, norm) for q, _, _, _, norm in rows if norm > args.fail_over]
        if over:
            print(f"\nFAIL: {len(over)} queries above {args.fail_over}x normalized: "
                  + ", ".join(f"{q} ({r:.2f}x)" for q, r in over))
            sys.exit(1)
        print(f"\nOK: no query above {args.fail_over}x normalized")


if __name__ == "__main__":
    main()
