"""Reader cache: pickle built readers once, reload instantly per run.

reference train/data_processing/dataset_cache.py:27-142 — same cache layout
(data/cache/{dataset}_reader.pkl), atomic tmp-rename writes, legacy-name
fallback ({walk,turn}_reader.pkl), and the same CLI
(python -m gaitpd.data.cache --datasets all [--rebuild]).
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path
from typing import Any, Optional

from gaitpd.config import normalize_dataset_name, raw_reader_dataset_name
from gaitpd.data.paths import cache_dir, get_pd_paths, weargait_paths


def reader_cache_path(dataset: str, root: Optional[Path] = None) -> Path:
    dataset = normalize_dataset_name(dataset)
    return (Path(root) if root else cache_dir()) / f"{dataset}_reader.pkl"


def legacy_reader_cache_path(dataset: str, root: Optional[Path] = None) -> Path:
    return (Path(root) if root else cache_dir()) / (
        f"{raw_reader_dataset_name(dataset)}_reader.pkl"
    )


def build_reader(dataset: str) -> Any:
    """reference dataset_cache.py:38-61."""
    dataset = normalize_dataset_name(dataset)
    paths = get_pd_paths()
    if dataset == "fbg":
        from gaitpd.data.readers import FBGReader

        p = paths["walk"]
        return FBGReader(p["pose_path"], p["sensor_path"], p["label_path"])
    if dataset == "fog":
        from gaitpd.data.readers import FoGReader

        p = paths["turn"]
        return FoGReader(
            p["pose_path"], p["sensor_path"], p["label_path"], p["lifted_path"]
        )
    raise ValueError(f"Unknown cached reader dataset: {dataset}")


def load_reader(dataset: str, *, rebuild: bool = False, root: Optional[Path] = None) -> Any:
    """reference dataset_cache.py:64-85 (atomic write + legacy fallback)."""
    dataset = normalize_dataset_name(dataset)
    path = reader_cache_path(dataset, root)
    if path.exists() and not rebuild:
        print(f"[CACHE] Loading {dataset} reader from {path}")
        with path.open("rb") as f:
            return pickle.load(f)
    legacy = legacy_reader_cache_path(dataset, root)
    if legacy.exists() and not rebuild:
        print(f"[CACHE] Loading {dataset} reader from legacy cache {legacy}")
        with legacy.open("rb") as f:
            return pickle.load(f)
    print(f"[CACHE] Building {dataset} reader and saving to {path}")
    reader = build_reader(dataset)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with tmp.open("wb") as f:
        pickle.dump(reader, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)
    return reader


def summarize_reader(dataset: str, reader: Any) -> dict:
    """reference dataset_cache.py:88-104."""
    dataset = normalize_dataset_name(dataset)
    if dataset == "fbg":
        return {
            "pose_entries": len(reader.pose_dict),
            "sensor_entries": len(reader.sensor_dict),
            "pose_labels": len(reader.pose_label_dict),
            "sensor_labels": len(reader.sensor_label_dict),
        }
    if dataset == "fog":
        return {
            "pose_entries": len(reader.pose_dict),
            "sensor_entries": len(reader.sensor_dict),
            "subject_labels": len(reader.labels_dict),
            "sensor_length": int(reader.sensor_length),
        }
    raise ValueError(dataset)


def count_weargait_pickles(root: Optional[Path] = None) -> int:
    d = Path(root) if root else weargait_paths()["output_dir"]
    return len(list(d.glob("*.pkl"))) if d.exists() else 0


def main():
    parser = argparse.ArgumentParser("Generate reusable dataset pickle caches")
    parser.add_argument(
        "--datasets", nargs="+", choices=["fbg", "fog", "weargait", "all"],
        default=["all"],
    )
    parser.add_argument("--rebuild", action="store_true")
    args = parser.parse_args()
    requested = ["fbg", "fog", "weargait"] if "all" in args.datasets else args.datasets
    for dataset in requested:
        if dataset == "weargait":
            count = count_weargait_pickles()
            if count == 0:
                raise FileNotFoundError(
                    "No WearGait .pkl files found. Run "
                    "python -m gaitpd.data.preprocess_weargait first."
                )
            print(f"[CACHE] WearGait already has {count} per-subject .pkl files.")
            continue
        reader = load_reader(dataset, rebuild=args.rebuild)
        print(f"[CACHE] {dataset}: {summarize_reader(dataset, reader)}")


if __name__ == "__main__":
    main()
