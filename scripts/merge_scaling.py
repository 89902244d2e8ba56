"""Pool several full-protocol scaling runs into one larger sample.

Pooling repeats from multiple runs of the SAME protocol on the SAME input
is statistically identical to one longer interleaved run; nothing is
discarded — every raw wall and its attempt label is preserved. Since
round 4 the per-level pooled MEDIAN decides pass/fail (one quiet window
must not carry the result); the per-level pooled min is reported alongside
as the least-contended capacity estimate (the rounds-1-3 estimator).

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

    def med(walls):
        s = sorted(w for _, w in walls)
        return s[(len(s) - 1) // 2]

    n_med, h_med = med(n_walls), med(h_walls)
    popped, fetched = base["N"]["popped"], base["N"]["fetched"]
    speedup = n_med / h_med
    eff = speedup / 4
    eff_min = (n_min / h_min) / 4
    merged = {
        "protocol": base["protocol"] + (
            f" ; pooled across {len(attempts)} full-protocol runs "
            f"({len(n_walls)} walls/level): pooled MEDIAN decides, pooled "
            "min reported as least-contended capacity"),
        "N": {**base["N"], "wall_sec": n_med,
              "ops_per_sec": round((popped + fetched) / n_med, 1),
              "min_wall_sec": n_min, "min_from": n_min_path},
        "4N": {**base["4N"], "wall_sec": h_med,
               "ops_per_sec": round((popped + fetched) / h_med, 1),
               "min_wall_sec": h_min, "min_from": h_min_path},
        "N_all_walls": [w for _, w in n_walls],
        "4N_all_walls": [w for _, w in h_walls],
        "attempts": {p: {"N_walls": a["N_all_walls"],
                         "4N_walls": a["4N_all_walls"],
                         "efficiency": a["scaling_efficiency"]}
                     for p, a in attempts},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_min": round(eff_min, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps({"efficiency": merged["scaling_efficiency"],
                      "efficiency_min": merged["scaling_efficiency_min"],
                      "pass": merged["pass"], "N_med": n_med,
                      "4N_med": h_med, "N_min": n_min, "4N_min": h_min}))


if __name__ == "__main__":
    main()
