"""Mechanical scaling-pair summary for BENCH/BASELINE.md.

Reads bench/<tag>_pair*_{n,4n}.json and bench/<tag>_n1_pair*_{n,4n}.json,
re-judges each leg's clean-window flag from the CURRENT predicate in
run_scaling.py (legs recorded under an older predicate are re-judged
uniformly), and prints a markdown table plus the clean-subset and
recent-window aggregates. Paste the output into BENCH/BASELINE.md —
do not hand-compute it.

Usage: python bench/summarize_pairs.py [round_tag (default r4)]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import CLEAN_1P_SLOWDOWN, CLEAN_PROBE_RATIO, NOMINAL_1P_S


def leg_clean(leg: dict) -> bool | None:
    p = leg.get("ambient_probe")
    if not p:
        return None
    return (
        p["probe_ratio"] <= CLEAN_PROBE_RATIO
        and p["probe_1p_s"] <= CLEAN_1P_SLOWDOWN * NOMINAL_1P_S
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r4"
    here = os.path.dirname(os.path.abspath(__file__))
    pairs: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(here, f"{tag}_*pair*_*.json"))):
        m = re.match(
            rf"{tag}_(n1_)?pair(\d+)_(n|4n)\.json", os.path.basename(path)
        )
        if not m:
            continue
        label = f"{'1v4 ' if m.group(1) else ''}p{m.group(2)}"
        with open(path) as f:
            pairs.setdefault(label, {})[m.group(3)] = json.load(f)

    def sort_key(label: str):
        return (label.startswith("1v4"), int(label.rsplit("p", 1)[1]))

    rows, clean_effs, clean_steadies = [], [], []
    for label in sorted(pairs, key=sort_key):
        legs = pairs[label]
        if "n" not in legs or "4n" not in legs:
            continue
        n, x4 = legs["n"], legs["4n"]
        eff = x4["clips_per_sec"] / (4 * n["clips_per_sec"])
        steady = (
            x4["steady_clips_per_sec"] / (4 * n["steady_clips_per_sec"])
            if n.get("steady_clips_per_sec") and x4.get("steady_clips_per_sec")
            else None
        )
        cn, c4 = leg_clean(n), leg_clean(x4)
        clean = bool(cn and c4) if cn is not None and c4 is not None else None
        if clean:
            clean_effs.append(eff)
            if steady is not None:
                clean_steadies.append(steady)
        p_n = n.get("ambient_probe", {})
        p_4 = x4.get("ambient_probe", {})
        steady_txt = f"{steady:.3f}" if steady is not None else "-"
        rows.append(
            f"| {label} | {n['cores']}->{x4['cores']} "
            f"| {n['clips_per_sec']:.0f} | {x4['clips_per_sec']:.0f} "
            f"| {eff:.3f} | {steady_txt} "
            f"| {p_n.get('probe_1p_s', '-')}/{p_n.get('probe_ratio', '-')} "
            f"| {p_4.get('probe_1p_s', '-')}/{p_4.get('probe_ratio', '-')} "
            f"| {'CLEAN' if clean else ('dirty' if clean is not None else 'n/a')} |"
        )

    print(f"predicate: ratio <= {CLEAN_PROBE_RATIO} and "
          f"1p <= {CLEAN_1P_SLOWDOWN} x {NOMINAL_1P_S}s (both legs)")
    print("| pair | cores | n clips/s | 4n clips/s | e2e eff | steady eff "
          "| probe n (1p s/ratio) | probe 4n | window |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    if clean_effs:
        print(f"\nclean subset: {len(clean_effs)} pair(s); "
              f"e2e eff {', '.join(f'{e:.3f}' for e in clean_effs)}; "
              f"steady {', '.join(f'{e:.3f}' for e in clean_steadies)}")
    else:
        print("\nclean subset: none")


if __name__ == "__main__":
    main()
