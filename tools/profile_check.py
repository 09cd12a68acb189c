#!/usr/bin/env python3
"""Shuffle-profile regression guard: compare a fresh bench_out_profile.json
against the committed baseline (tools/profile_baseline.json) and flag any
query whose shuffle-write/input ratio DOUBLED — a scale regression the
wall-clock line can't see (a plan that started shuffling the corpus can
still look fast at sf0.1 and melt at 100 TB).

Usage: python3 tools/profile_check.py [fresh_profile] [baseline]
Exit 1 if any query regressed.

Noise floor: queries moving < 1 MB of shuffle in BOTH runs are skipped
(scheduling jitter dominates); a baseline ratio of 0 (no shuffle) flags
any fresh shuffle >= 1 MB.
"""
import json
import sys

fresh_path = sys.argv[1] if len(sys.argv) > 1 else "bench_out_profile.json"
base_path = sys.argv[2] if len(sys.argv) > 2 else "tools/profile_baseline.json"
fresh = json.load(open(fresh_path))
base = json.load(open(base_path))

NOISE_MB = 1.0


def ratio(entry):
    return entry.get("shuffle_write_mb", 0.0) / max(entry.get("input_mb", 0.0), 0.1)


fail = 0
for q in sorted(set(fresh) & set(base)):
    f, b = fresh[q], base[q]
    fw, bw = f.get("shuffle_write_mb", 0.0), b.get("shuffle_write_mb", 0.0)
    if fw < NOISE_MB and bw < NOISE_MB:
        continue
    if bw < NOISE_MB:  # baseline had no shuffle; any real shuffle is new
        if fw >= NOISE_MB:
            fail += 1
            print(f"{q}: REGRESSION shuffle appeared ({bw:.1f} -> {fw:.1f} MB)")
        continue
    fr, br = ratio(f), ratio(b)
    if fr > 2.0 * br:
        fail += 1
        print(f"{q}: REGRESSION shuffle/input ratio {br:.3f} -> {fr:.3f} "
              f"(write {bw:.1f} -> {fw:.1f} MB, "
              f"input {b.get('input_mb', 0):.1f} -> {f.get('input_mb', 0):.1f} MB)")
    else:
        print(f"{q}: ok ratio {br:.3f} -> {fr:.3f}")

only_fresh = set(fresh) - set(base)
if only_fresh:
    print(f"note: {len(only_fresh)} queries have no baseline yet: "
          f"{sorted(only_fresh)[:5]}{'...' if len(only_fresh) > 5 else ''}")
print(f"profile_check: {'FAIL' if fail else 'PASS'} ({fail} regressions)")
sys.exit(1 if fail else 0)
