#!/usr/bin/env python3
"""Assemble bench_scaling_r20.json — the round-20 (final) scale ledger.

Blocks:
  capstone_sf100      VERDICT r19 #1: the FULL contract (159 gates = 166
                      minus the six declared linear-scan s-gates, whose
                      class is measured end-to-end via the completed s04
                      endpoint in bench_scaling_r19.json, and m09-loose,
                      replaced by the m13 packed-ingest row) run in ONE
                      long-lived 24 GiB JVM: reps=1, family-boundary
                      fixture eviction, honest hash-consume action,
                      heap staircase on. This subsumes the split sf100
                      cohorts (r18 tm/st families, r19 subset + gap): one
                      session runs EVERYTHING — the 100 TB co-tenancy
                      posture, proven as one artifact.
  x25_dist_probe      VERDICT r19 #4: x25's distributed PageRank rounds
                      (localEdgeCap=0) at sf100 — rank-identical to the
                      driver fast path (REQUIREd in-probe), both walls.
  stream_recovery     VERDICT r19 #6: st04 pipeline killed after a table
                      commit but before its checkpoint marker, resumed
                      from the checkpoint at sf100 — the replayed batch
                      is fenced; final hash/commits equal the
                      uninterrupted run's.
  (r19 blocks s_ladder_x1000 / stream probes / ingest probe / gap
   families are NOT copied forward — they remain in
   bench_scaling_r19.json, measured at r19 HEAD under the same action.)

Usage: merge_scaling_r20.py <capstone_sf100.json> <x25_probe.json> \
         <recovery_probe.json> [baseline_sf01.json]
"""
import json
import sys


def main(pcap, px25, precovery, pbase=None):
    cap = json.load(open(pcap))
    x25 = json.load(open(px25))
    rec = json.load(open(precovery))

    out = {
        'metric': 'scaling_r20',
        'action_basis': ('hash-all-columns CONSUMED via .head() (since '
                         'r18); q23 prewarmed (one-time bucketed write '
                         'outside every timed rep, own prewarm series)'),
        'capstone_sf100': {
            'note': ('FULL-CONTRACT single-JVM sf100 run (VERDICT r19 '
                     '#1): 159 gates — every gate except the declared '
                     'linear-scan s-gates (s01/s02/s04/s06/s08/s09, '
                     'class measured via the completed s04 endpoint, '
                     'bench_scaling_r19.json) and m09-loose (replaced '
                     'by the m13 packed row) — in ONE 24 GiB JVM, '
                     'reps=1, SPARK_GRAFT_EVICT_FAMILY=1, no manual '
                     'disk cleaning. Subsumes the split sf100 cohorts: '
                     'r18 tm_family (849 s/72 gates) + st_family '
                     '(614 s/10) and r19 subset (2371 s/31) + gap '
                     '(678 s/47) all re-ran together.'),
            'n_gates': len(cap['queries']),
            'n_errors': len(cap.get('errors', {})),
            'errors': cap.get('errors', {}),
            'total_sec': round(cap['value'], 1),
            'calibration': cap['calibration'],
            'prewarm': cap.get('prewarm'),
            'queries': cap['queries'],
        },
        'x25_dist_probe_sf100': x25,
        'stream_recovery_probe_sf100': rec,
    }
    if pbase:
        base = json.load(open(pbase))
        out['rebaseline_sf01'] = {
            'note': ('BENCH_BASELINE_r20: one min-of-2 interleaved full '
                     'run at final r20 HEAD, sf0.1 — the engine\'s '
                     'shipping perf statement (VERDICT r19 #8).'),
            'total_sec': round(base['value'], 1),
            'n_gates': len(base['queries']),
            'calibration': base['calibration'],
        }
    with open('bench_scaling_r20.json', 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote bench_scaling_r20.json')


if __name__ == '__main__':
    main(*sys.argv[1:5])
