"""Per-mask relaxed-input parity: the paired 7-subset gap table.

The namesake claim of the reference paper is that the model degrades
gracefully when modalities are masked out at eval
(/root/reference/train/weargait_train.py:384-433 builds the 7 subset masks;
:641-645 reports them). The 32-seed parity artifacts already carry the full
per-mask accuracy dicts per seed for BOTH frameworks — this script owns the
per-mask paired analysis (VERDICT r3 item 3): for each committed weargait
report and each of the 7 masks, the paired per-seed gap, win/loss counts and
a 95% t-CI, written to parity_weargait_permask.json and printed as the
markdown table PARITY.md embeds.

Run:  python scripts/permask_stats.py        # reads the committed s32 JSONs
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np  # noqa: E402

from parity_check import paired_stats  # noqa: E402

MASKS = ("W", "I", "M", "W+I", "W+M", "I+M", "W+I+M")

REPORTS = {
    "sync_gcl": "artifacts/parity/parity_weargait_s32_report.json",
    "async_gcl": "artifacts/parity/parity_weargait_async_s32_report.json",
    "tiefree_gcl": "artifacts/parity/parity_weargait_gcl_tiefree_s32_report.json",
}


def permask_rows(report_path: Path):
    rep = json.loads(report_path.read_text())
    seeds = sorted(rep["seeds"], key=int)
    rows = {}
    for mask in MASKS:
        ours = [rep["seeds"][s]["gaitpd_masks"][mask] for s in seeds]
        ref = [rep["seeds"][s]["reference_masks"][mask] for s in seeds]
        st = paired_stats(ours, ref)
        rows[mask] = {
            "gaitpd_mean": float(np.mean(ours)),
            "reference_mean": float(np.mean(ref)),
            "stats": st,
        }
    return rows


def main():
    out = {}
    print("| config | mask | gaitpd | reference | gap | 95% CI | W/L |")
    print("|---|---|---|---|---|---|---|")
    for name, fname in REPORTS.items():
        path = REPO / fname
        if not path.exists():
            print(f"(skipping {name}: {fname} missing)", file=sys.stderr)
            continue
        rows = permask_rows(path)
        out[name] = {"report": fname, "masks": rows}
        for mask in MASKS:
            r = rows[mask]
            st = r["stats"]
            lo, hi = st["gap_ci95"]
            flag = "" if lo <= 0.0 <= hi else " **"
            print(
                f"| {name} | {mask} | {r['gaitpd_mean']:.2f} | "
                f"{r['reference_mean']:.2f} | {st['mean_gap']:+.2f} | "
                f"[{lo:+.2f}, {hi:+.2f}]{flag} | "
                f"{st['wins']}/{st['losses']} |"
            )
    (REPO / "artifacts/parity/parity_weargait_permask.json").write_text(
        json.dumps(out, indent=2)
    )
    n_rows = sum(len(v["masks"]) for v in out.values())
    n_straddle = sum(
        1
        for v in out.values()
        for r in v["masks"].values()
        if r["stats"]["gap_ci95"][0] <= 0.0 <= r["stats"]["gap_ci95"][1]
    )
    print(f"\n{n_straddle}/{n_rows} mask rows straddle zero "
          "(** marks any that do not)")


if __name__ == "__main__":
    main()
