"""Regenerate README.md's bench table from BENCH_DETAILS.json.

Keeps the README's numbers mechanically in sync with the latest
measured bench (VERDICT r3 #4: no README number may contradict the
bench record). Run after `python bench.py`.
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
START = "<!-- BENCH_TABLE_START -->"
END = "<!-- BENCH_TABLE_END -->"


def main():
    with open(os.path.join(REPO, "BENCH_DETAILS.json")) as f:
        details = json.load(f)

    lines = [
        "| Config | TPU Mtexels/s (device) | SSE2 Mtexels/s | speedup "
        "| rep spread | Gop/s (cost model) | % elementwise ceiling |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, e in details.items():
        reps = e["reps_device_ms"]
        spread = (max(reps) - min(reps)) / min(reps) * 100 if reps else 0
        gflops = e.get("cost_model_gop_per_s",
                       e.get("cost_model_gflop_per_s", 0))
        pct = e.get("pct_elementwise_ceiling")
        lines.append(
            f"| {name} | {e['mtexels_per_s']:g} | "
            f"{e['ref_sse2_mtexels_per_s']:g} | "
            f"{e['speedup_vs_sse2']:g}x | {spread:.0f}% | "
            f"{gflops:g} | {pct if pct is not None else '-'} |")
    table = "\n".join(lines)

    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        src = f.read()
    pre, rest = src.split(START, 1)
    _, post = rest.split(END, 1)
    with open(path, "w") as f:
        f.write(pre + START + "\n" + table + "\n" + END + post)
    print(f"updated README.md with {len(details)} bench rows")


if __name__ == "__main__":
    main()
