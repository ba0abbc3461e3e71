"""Mechanical scaling-pair summary for BENCH/BASELINE.md.

Reads bench/<tag>_pair*_{n,4n}.json and bench/<tag>_n1_pair*_{n,4n}.json,
re-judges each leg's clean-window flag from the CURRENT predicate in
run_scaling.py (legs recorded under an older predicate are re-judged
uniformly), and prints a markdown table plus the clean-subset and
recent-window aggregates. Paste the output into BENCH/BASELINE.md —
do not hand-compute it.

Usage: python bench/summarize_pairs.py [round_tag (default r4)] [--write]
  --write: also splice the generated table between the
  TABLE:BEGIN/TABLE:END markers in BENCH/BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import (
    CLEAN_1P_SLOWDOWN,
    CLEAN_PROBE_RATIO,
    DRIFT_CLEAN_MAX,
    NOMINAL_1P_S,
)


def leg_clean(leg: dict) -> bool | None:
    p = leg.get("ambient_probe")
    if not p:
        return None
    return (
        p["probe_ratio"] <= CLEAN_PROBE_RATIO
        and p["probe_1p_s"] <= CLEAN_1P_SLOWDOWN * NOMINAL_1P_S
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    tag = args[0] if args else "r4"
    here = os.path.dirname(os.path.abspath(__file__))
    pairs: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(here, f"{tag}_*.json"))):
        m = re.match(
            rf"{tag}_(n1_)?(pair|hunt[A-Z]?)(\d+)_(n|4n|n2)\.json",
            os.path.basename(path),
        )
        if not m:
            continue
        kind = "p" if m.group(2) == "pair" else m.group(2)
        label = f"{'1v4 ' if m.group(1) else ''}{kind}{m.group(3)}"
        with open(path) as f:
            pairs.setdefault(label, {})[m.group(4)] = json.load(f)

    def sort_key(label: str):
        import re as _re

        num = _re.search(r"(\d+)$", label)
        return (
            label.startswith("1v4"),
            label.rstrip("0123456789"),
            int(num.group(1)) if num else 0,
        )

    rows, clean_effs, clean_steadies = [], [], []
    for label in sorted(pairs, key=sort_key):
        legs = pairs[label]
        if "n" not in legs or "4n" not in legs:
            continue
        n, x4 = legs["n"], legs["4n"]
        # sandwich pairs: efficiency vs the MEAN of the two narrow legs
        n_tp = n["clips_per_sec"]
        n_steady = n.get("steady_clips_per_sec")
        drift_txt = ""
        drift = None
        if "n2" in legs:
            n2 = legs["n2"]
            drift = abs(n_tp - n2["clips_per_sec"]) / (
                (n_tp + n2["clips_per_sec"]) / 2
            )
            n_tp = (n_tp + n2["clips_per_sec"]) / 2
            if n_steady and n2.get("steady_clips_per_sec"):
                n_steady = (n_steady + n2["steady_clips_per_sec"]) / 2
            drift_txt = f" (sandwich, drift {drift:.0%})"
        eff = x4["clips_per_sec"] / (4 * n_tp)
        steady = (
            x4["steady_clips_per_sec"] / (4 * n_steady)
            if n_steady and x4.get("steady_clips_per_sec")
            else None
        )
        cn, c4 = leg_clean(n), leg_clean(x4)
        # sandwich drift gates cleanliness too: disagreeing narrow legs
        # mean the window moved (or a collision hit one leg) between
        # probe samples — see run_scaling.DRIFT_CLEAN_MAX
        clean = (
            bool(cn and c4 and (drift is None or drift <= DRIFT_CLEAN_MAX))
            if cn is not None and c4 is not None
            else None
        )
        if clean:
            clean_effs.append(eff)
            if steady is not None:
                clean_steadies.append(steady)
        p_n = n.get("ambient_probe", {})
        p_4 = x4.get("ambient_probe", {})
        steady_txt = f"{steady:.3f}" if steady is not None else "-"
        cpu_n, cpu_4 = n.get("cpu_s_per_clip"), x4.get("cpu_s_per_clip")
        cpu_txt = (
            f"{cpu_n:.3f}/{cpu_4:.3f}" if cpu_n and cpu_4 else "-"
        )
        st_n, st_4 = n.get("steal_pct"), x4.get("steal_pct")
        steal_txt = (
            f"{st_n:.0f}%/{st_4:.0f}%"
            if st_n is not None and st_4 is not None
            else "-"
        )
        rows.append(
            f"| {label}{drift_txt} | {n['cores']}->{x4['cores']} "
            f"| {n_tp:.0f} | {x4['clips_per_sec']:.0f} "
            f"| {eff:.3f} | {steady_txt} "
            f"| {p_n.get('probe_1p_s', '-')}/{p_n.get('probe_ratio', '-')} "
            f"| {p_4.get('probe_1p_s', '-')}/{p_4.get('probe_ratio', '-')} "
            f"| {cpu_txt} | {steal_txt} "
            f"| {'CLEAN' if clean else ('dirty' if clean is not None else 'n/a')} |"
        )

    lines = [
        f"predicate: ratio <= {CLEAN_PROBE_RATIO} and "
        f"1p <= {CLEAN_1P_SLOWDOWN} x {NOMINAL_1P_S}s (both legs)",
        "",
        "| pair | cores | n clips/s | 4n clips/s | e2e eff | steady eff "
        "| probe n (1p s/ratio) | probe 4n | cpu s/clip n/4n | steal n/4n "
        "| window |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
        *rows,
        "",
    ]
    if clean_effs:
        lines.append(
            f"clean subset: {len(clean_effs)} pair(s); "
            f"e2e eff {', '.join(f'{e:.3f}' for e in clean_effs)}; "
            f"steady {', '.join(f'{e:.3f}' for e in clean_steadies)}"
        )
    else:
        lines.append("clean subset: none")

    # Session capability estimate: the hypervisor throttle is strictly
    # SUBTRACTIVE (it can only remove cycles), so the maximum observed
    # throughput per allocation across the session's legs is the
    # least-biased estimate of the engine's true capability at that
    # allocation — immune to the probe-timing problem (probes sample
    # instants; this samples every leg). Using the max in BOTH
    # numerator and denominator is conservative for efficiency.
    by_cores: dict[int, list[tuple[float, float | None, str]]] = {}
    for label, legs in pairs.items():
        for part, leg in legs.items():
            by_cores.setdefault(leg["cores"], []).append(
                (leg["clips_per_sec"], leg.get("steady_clips_per_sec"), label)
            )
    # Error models differ by allocation: narrow legs sit BELOW the
    # wide-parallelism throttle's bite (their spread is ordinary
    # symmetric noise -> median estimates the true rate), while wide
    # legs face one-sided subtractive throttling (-> max estimates the
    # true rate). max-wide / 4*max-narrow is additionally reported as
    # the strict lower bound (it pairs the wide max against narrow's
    # luckiest window).
    import statistics

    for small, big in ((2, 8), (1, 4)):
        if small in by_cores and big in by_cores:
            bn = max(by_cores[small], key=lambda t: t[0])
            b4 = max(by_cores[big], key=lambda t: t[0])
            med_n = statistics.median(t[0] for t in by_cores[small])
            med_n_steady_vals = [t[1] for t in by_cores[small] if t[1]]
            med_n_steady = (
                statistics.median(med_n_steady_vals) if med_n_steady_vals else None
            )
            lb = b4[0] / (4 * bn[0])
            est = b4[0] / (4 * med_n)
            s_lb = f", steady {b4[1] / (4 * bn[1]):.3f}" if bn[1] and b4[1] else ""
            s_est = (
                f", steady {b4[1] / (4 * med_n_steady):.3f}"
                if med_n_steady and b4[1]
                else ""
            )
            lines.append(
                f"capability {small}->{big} cores: lower bound "
                f"{lb:.3f} e2e{s_lb} (max {big}c {b4[0]:.0f} [{b4[2]}] vs max "
                f"{small}c {bn[0]:.0f} [{bn[2]}]); best estimate {est:.3f} "
                f"e2e{s_est} (vs median {small}c {med_n:.0f}, n={len(by_cores[small])})"
            )

    # Work conservation (throttle-independent): cpu_s/clip of the whole
    # spark-submit tree should be FLAT across allocations if the plan
    # adds no parallel overhead. rusage CPU time inflates under
    # hypervisor frequency capping (a slow-clocked CPU-second does less
    # work), so cpu_ratio >> 1 on a slow wide leg is the environment's
    # signature, not the engine's: the same code doing the same work
    # cannot legitimately need 2x the instructions at 4x parallelism.
    # Mechanical check: cpu_ratio vs the wide leg's throughput.
    conserv = []
    for label, legs in pairs.items():
        n, x4 = legs.get("n"), legs.get("4n")
        if not (n and x4 and n.get("cpu_s_per_clip") and x4.get("cpu_s_per_clip")):
            continue
        conserv.append(
            (x4["clips_per_sec"], x4["cpu_s_per_clip"] / n["cpu_s_per_clip"],
             label)
        )
    if conserv:
        conserv.sort(reverse=True)
        lines.append(
            "work conservation (pairs with cpu data, fastest wide leg "
            "first): "
            + "; ".join(
                f"{lbl}: {tp:.0f} clips/s @ cpu_ratio {r:.2f}"
                for tp, r, lbl in conserv
            )
        )
    out = "\n".join(lines)
    print(out)
    if write:
        md = os.path.join(os.path.dirname(here), "BENCH", "BASELINE.md")
        with open(md) as f:
            content = f.read()
        begin = "<!-- TABLE:BEGIN generated by bench/summarize_pairs.py -->"
        end = "<!-- TABLE:END -->"
        pre, _, rest = content.partition(begin)
        _, _, post = rest.partition(end)
        with open(md, "w") as f:
            f.write(pre + begin + "\n" + out + "\n" + end + post)
        print(f"\nwrote table into {md}")


if __name__ == "__main__":
    main()
