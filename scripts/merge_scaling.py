"""Merge several full-protocol scaling runs into cumulative best evidence.

The noisy-host protocol (BENCH/BASELINE.md) estimates each level's
uncontended capacity as the MINIMUM wall across interleaved fresh-JVM
repeats. Quiet windows on this shared box are scarce, so multiple
full-protocol attempts are run across the round; this script folds them
into one record: per-level min across ALL attempts, with every raw wall
and its attempt label preserved (nothing is discarded — the merged min is
exactly what a single longer interleaved run would have produced).

Usage: python scripts/merge_scaling.py out.json attempt1.json attempt2.json ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *paths = sys.argv[1:]
    attempts = []
    for p in paths:
        with open(p) as f:
            attempts.append((p, json.load(f)))
    base = attempts[0][1]
    n_walls = [(p, w) for p, a in attempts for w in a["N_all_walls"]]
    h_walls = [(p, w) for p, a in attempts for w in a["4N_all_walls"]]
    n_min_path, n_min = min(n_walls, key=lambda t: t[1])
    h_min_path, h_min = min(h_walls, key=lambda t: t[1])
    popped, fetched = base["N"]["popped"], base["N"]["fetched"]
    speedup = n_min / h_min
    eff = speedup / 4
    merged = {
        "protocol": base["protocol"] + (
            f" ; cumulative min across {len(attempts)} full-protocol "
            "attempts (per-attempt walls listed)"),
        "N": {**base["N"], "wall_sec": n_min,
              "ops_per_sec": round((popped + fetched) / n_min, 1),
              "min_from": n_min_path},
        "4N": {**base["4N"], "wall_sec": h_min,
               "ops_per_sec": round((popped + fetched) / h_min, 1),
               "min_from": h_min_path},
        "N_all_walls": [w for _, w in n_walls],
        "4N_all_walls": [w for _, w in h_walls],
        "attempts": {p: {"N_walls": a["N_all_walls"],
                         "4N_walls": a["4N_all_walls"],
                         "efficiency": a["scaling_efficiency"]}
                     for p, a in attempts},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps({"efficiency": merged["scaling_efficiency"],
                      "pass": merged["pass"],
                      "N_min": n_min, "4N_min": h_min}))


if __name__ == "__main__":
    main()
