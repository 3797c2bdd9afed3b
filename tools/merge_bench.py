#!/usr/bin/env python3
"""The ONLY writer of bench_result.json (the merged per-query-min artifact).

`graft.Bench` raw runs write bench_raw.json; this tool folds a raw run into
the committed artifact under the standing discipline: per-query min across
runs of an identical tree, except queries whose code changed this session
(--only-new) which take ONLY the new run's value. A raw Bench run therefore
never clobbers the committed artifact (VERDICT r14 "what's wrong" #1).

Usage:
  python3 tools/merge_bench.py --base bench_result.json --new bench_raw.json \
      [--only-new q1,q2,...] [--drop q3,...] [--out bench_result.json]

The merged calibration block keeps the probe series of the LEAST-LOADED
contributing run (lowest median) — that is the run context the per-query
mins predominantly come from — plus a run count, so a future raw run's
calibration band can be compared against the artifact in-band.
"""
import argparse, json, sys


def summarize(times):
    s = sorted(times)
    pct = lambda p: s[min(len(s) - 1, int(p * len(s)))]
    return {"times": [round(t, 3) for t in times],
            "min": round(s[0], 3), "median": round(pct(0.5), 3),
            "p90": round(pct(0.9), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--new", required=True)
    ap.add_argument("--only-new", default="",
                    help="comma-separated queries whose code changed: take "
                         "ONLY the new run's value, never the old min")
    ap.add_argument("--drop", default="",
                    help="comma-separated queries to remove (deleted gates)")
    ap.add_argument("--out", default="bench_result.json")
    args = ap.parse_args()

    base = json.load(open(args.base))
    new = json.load(open(args.new))
    if new.get("errors"):
        sys.exit(f"refusing to merge a raw run with errors: {new['errors']}")
    only_new = set(q for q in args.only_new.split(",") if q)
    drop = set(q for q in args.drop.split(",") if q)

    bq, nq = base["queries"], new["queries"]
    merged = {}
    for q in sorted(set(bq) | set(nq)):
        if q in drop:
            continue
        if q in only_new or q not in bq:
            if q not in nq:
                sys.exit(f"--only-new query {q} missing from the new run")
            merged[q] = nq[q]
        elif q not in nq:
            merged[q] = bq[q]
        else:
            merged[q] = min(bq[q], nq[q])

    cals = []
    for src in (base, new):
        c = src.get("calibration")
        if c and c.get("times"):
            cals.append(c)
    cal = None
    if cals:
        best = min(cals, key=lambda c: c["median"])
        cal = summarize(best["times"])
        cal["runs"] = sum(c.get("runs", 1) for c in cals)

    out = {"metric": "total", "value": round(sum(merged.values()), 3),
           "unit": "sec", "queries": {k: round(v, 3) for k, v in merged.items()}}
    if cal:
        out["calibration"] = cal
    out["sf"] = new.get("sf", base.get("sf"))
    with open(args.out, "w") as f:
        json.dump(out, f, separators=(",", ":"))
        f.write("\n")
    print(f"merged {len(merged)} queries -> {args.out}: "
          f"total {out['value']} (base {base['value']}, new {new['value']})")


if __name__ == "__main__":
    main()
