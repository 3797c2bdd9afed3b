#!/usr/bin/env python3
"""Fold the ×1000 subset probe into bench_scaling_r17.json.

The sf100 point is a SUBSET run (SPARK_GRAFT_BENCH_ONLY: 31 scalable-path
representatives — the declared linear-scan s gates and the file-count-linear
m09 are excluded by design, see SURVEY §9) measured with the hash-all-columns
bench action. NOTE (r18): the r17 variant of that action ended in `.count()`
on the 1-row aggregate, which never references max(h) — Catalyst pruned the
hash and everything upstream, so the r17 subset_x1000 numbers under-measure
pruning-susceptible gates (at minimum d13, whose gram pipeline re-optimized
to a bare doc scan). The r18 action collects the aggregate row (`.head()`),
making the hash genuinely value-dependent end-to-end; r18 regenerated both
subset points under it. Both points of any one block are measured at the
same HEAD with the same action, so each block's x1000 ratios are internally
consistent; r17-action blocks are NOT comparable per-gate to r18-action ones
nor to the count()-based 3-point columns. q23 runs in its own JVM at each scale: its double 15 GB
bucketed write needs the whole box's execution memory and aborts when 29
gates' broadcasts/caches share the pool — per-gate JSONs passed separately.

Usage: merge_scaling_sf100.py <sf01.json> <sf100.json> [sf01_q23.json sf100_q23.json]
"""
import json, sys

def main(p01, p100, q01=None, q100=None):
    a = json.load(open(p01))
    b = json.load(open(p100))
    if q01 and q100:
        for tgt, src in ((a, q01), (b, q100)):
            extra = json.load(open(src))
            tgt['queries'].update(extra['queries'])
            tgt['value'] += extra['value']
    d = json.load(open('bench_scaling_r17.json'))
    qs = {}
    for k, v01 in a['queries'].items():
        v100 = b['queries'].get(k)
        if isinstance(v01, float) and isinstance(v100, float):
            qs[k] = {'sf0.1': v01, 'sf100': v100,
                     'x1000': round(v100 / v01, 2)}
        else:
            qs[k] = {'sf0.1': v01, 'sf100': v100}
    ratios = sorted(q['x1000'] for q in qs.values() if 'x1000' in q)
    d['metric'] = 'whole_engine_scaling_4pt'
    d['factors']['sf100'] = 1000
    d['subset_x1000'] = {
        'note': ('31 scalable-path representatives (declared linear-scan '
                 's01/s02/s04/s06/s08/s09 and file-count-linear m09 '
                 'excluded by design); both points at the same HEAD with '
                 'the hash-all-columns action (not per-gate comparable to '
                 'the count()-based 3-point columns); reps sf0.1=2 '
                 'interleaved, sf100=1; q23 in its own JVM at each scale'),
        'totals_sec': {'sf0.1': round(a['value'], 1),
                       'sf100': round(b['value'], 1)},
        'wall_x1000': round(b['value'] / a['value'], 2),
        'median_gate_x1000': ratios[len(ratios) // 2] if ratios else None,
        'calibration': {'sf0.1': a['calibration'],
                        'sf100': b['calibration']},
        'queries': qs,
    }
    with open('bench_scaling_r17.json', 'w') as f:
        json.dump(d, f, indent=1)
    print(f"wall x1000 = {d['subset_x1000']['wall_x1000']}, "
          f"median gate = {d['subset_x1000']['median_gate_x1000']}, "
          f"n = {len(qs)}")

if __name__ == '__main__':
    main(*sys.argv[1:])
