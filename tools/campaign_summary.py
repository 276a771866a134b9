"""Summarize scaling-campaign trial files into the BENCH.md §2 table.

    python tools/campaign_summary.py /tmp/scale_r5_trial.jsonl [more.jsonl ...]

Reads the jsonl cells written by tools/campaign_r5.sh (one line per
(cpus, corpus) measurement, trials separated by {"trial_start": ...}
markers), groups them by corpus (identified by the cell's triple count,
which is byte-stable because the generator seeds per page), and prints:

  * every raw trial cell (nothing hidden), and
  * the min-per-side estimator across trials — host contention is
    strictly additive (BENCH.md §1), so min(T2)/min(T8)/4 estimates the
    uncontended-pair efficiency; trial-wise raw efficiencies are shown
    alongside so the dispersion is visible.

Per-phase efficiency uses the same min-per-side rule per phase.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load_cells(paths: list[str]) -> list[dict]:
    cells = []
    trial = 0
    for p in paths:
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if "trial_start" in row:
                    trial += 1
                    continue
                if "campaign" in row:
                    continue
                row["trial"] = trial
                cells.append(row)
    return cells


def main(paths: list[str]) -> None:
    cells = load_cells(paths)
    by_corpus: dict[int, dict[int, list[dict]]] = defaultdict(
        lambda: defaultdict(list))
    for c in cells:
        by_corpus[c["triples"]][c["cpus"]].append(c)

    print(f"{'corpus (triples)':>18} {'side':>5} {'trial times (s)':>28} "
          f"{'min':>8}")
    summary = []
    for triples in sorted(by_corpus):
        sides = by_corpus[triples]
        if set(sides) != {2, 8}:
            print(f"{triples:>18}  incomplete pair, sides={sorted(sides)}")
            continue
        mins = {}
        for cpus in (8, 2):
            ts = [c["seconds"] for c in sides[cpus]]
            mins[cpus] = min(ts)
            print(f"{triples:>18} {cpus:>4}c "
                  f"{' / '.join(f'{t:.1f}' for t in ts):>28} "
                  f"{mins[cpus]:>8.1f}")
        eff = mins[2] / mins[8] / 4
        raw_effs = [
            a["seconds"] / b["seconds"] / 4
            for a in sides[2] for b in sides[8] if a["trial"] == b["trial"]
        ]
        # per-phase min-per-side efficiency
        phase_eff = {}
        for ph in sides[8][0].get("phases", {}):
            p8 = min(c["phases"][ph] for c in sides[8] if ph in c["phases"])
            p2 = min(c["phases"][ph] for c in sides[2] if ph in c["phases"])
            phase_eff[ph] = round(p2 / p8 / 4, 3)
        summary.append({
            "triples": triples,
            "t8_min": mins[8],
            "t2_min": mins[2],
            "throughput_8c": round(triples / mins[8], 1),
            "eff_min_per_side": round(eff, 3),
            "eff_trialwise": [round(e, 3) for e in raw_effs],
            "phase_eff": phase_eff,
        })
    print()
    for s in summary:
        print(json.dumps(s))


if __name__ == "__main__":
    main(sys.argv[1:] or ["/tmp/scale_r5_trial.jsonl"])
