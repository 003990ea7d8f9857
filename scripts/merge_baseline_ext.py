"""Merge a per-config seed extension into the committed baselines report.

`scripts/parity_baselines.py` merges at CONFIG level (re-running a config
REPLACES its per_seed lists — see CLAUDE.md), so seed extensions of a single
config are run to a separate --out file and merged here by hand, the same
way round 4's f304ba8 and round 5's cheap_xattn extension did. The merged
config gains its own `seeds` field; the report's top-level `seeds` list
stays at the depth of the not-yet-extended configs.

Usage: python scripts/merge_baseline_ext.py <config> <ext_report.json>
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
from parity_check import paired_stats  # noqa: E402

MAIN = Path("artifacts/parity/parity_baselines_report.json")


def main():
    cfg, ext_path = sys.argv[1], Path(sys.argv[2])
    main_r = json.loads(MAIN.read_text())
    ext = json.loads(ext_path.read_text())
    assert main_r["epochs"] == ext["epochs"], (main_r["epochs"], ext["epochs"])
    assert main_r["strength"] == ext["strength"], (
        main_r["strength"], ext["strength"])

    prev = main_r[cfg]["per_seed"]
    new = ext[cfg]["per_seed"]
    prev_seeds = main_r[cfg].get("seeds", main_r["seeds"])
    assert len(prev["gaitpd"]) == len(prev["reference"]) == len(prev_seeds)
    assert len(new["gaitpd"]) == len(new["reference"]) == len(ext["seeds"])
    overlap = set(prev_seeds) & set(ext["seeds"])
    assert not overlap, f"extension re-ran committed seeds: {sorted(overlap)}"

    ours = prev["gaitpd"] + new["gaitpd"]
    ref = prev["reference"] + new["reference"]
    main_r[cfg] = {
        "seeds": list(prev_seeds) + list(ext["seeds"]),
        "gaitpd_mean": sum(ours) / len(ours),
        "reference_mean": sum(ref) / len(ref),
        "gap": sum(ours) / len(ours) - sum(ref) / len(ref),
        "stats": paired_stats(ours, ref),
        "per_seed": {"gaitpd": ours, "reference": ref},
    }
    MAIN.write_text(json.dumps(main_r, indent=2))
    s = main_r[cfg]["stats"]
    print(f"[merged {cfg}] n={s['n_seeds']} gap={s['mean_gap']:+.2f} "
          f"ci=[{s['gap_ci95'][0]:+.2f},{s['gap_ci95'][1]:+.2f}] "
          f"W/L={s['wins']}/{s['losses']} ties={s['ties']}")


if __name__ == "__main__":
    main()
