"""Batch inference engine: raw sensor streams -> PD predictions.

Production serving path (framework-new; the reference has no inference
entrypoint at all — its best models live and die inside the CV loop,
weargait_train.py:596-614). The engine:

* restores per-fold parameters from an orbax checkpoint (or takes them
  in-memory),
* runs the fused z-score -> window -> forward -> masked-ensemble pipeline
  as ONE jitted function (the bench.py hot path),
* accepts any subset of sensors via the relaxed-input mask — missing
  modalities at serving time need no recompile and no zero-filled fakes
  from the caller.

    engine = WearGaitEngine(params, stats, win=64, hop=64)
    probs = engine.predict_streams({"imu": imu_array})   # walkway/insole absent
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaitpd.data.pipeline import window_stream, zscore
from gaitpd.models.multitask import WearGaitThreeModal

MODALITIES = ("walkway", "insole", "imu")
CHANNELS = {"walkway": 2, "insole": 13, "imu": 24}


class WearGaitEngine:
    """Relaxed-input WearGait classifier over raw 30 Hz streams."""

    def __init__(
        self,
        params,
        stats: Optional[Dict[str, Tuple[np.ndarray, np.ndarray]]] = None,
        *,
        win: int = 64,
        hop: int = 64,
        model: Optional[WearGaitThreeModal] = None,
        num_classes: int = 2,
    ):
        self.model = model or WearGaitThreeModal(synchronized=True,
                                                 num_classes=num_classes)
        self.params = params
        self.win = win
        self.hop = hop
        self.stats = {}
        for m in MODALITIES:
            if stats and m in stats:
                mean, std = stats[m]
            else:
                mean = np.zeros(CHANNELS[m], np.float32)
                std = np.ones(CHANNELS[m], np.float32)
            self.stats[m] = (jnp.asarray(mean), jnp.asarray(std))

        @functools.partial(jax.jit, static_argnums=())
        def _predict(params, xw, xi, xm, mask):
            # zero-fill disabled streams; ensemble only enabled heads
            xs = [xw, xi, xm]
            xs = [jnp.where(mask[k], x, jnp.zeros_like(x)) for k, x in enumerate(xs)]
            logits = self.model.apply(params, *xs)
            probs = jnp.stack([jax.nn.softmax(lg, -1) for lg in logits])
            mk = mask.astype(probs.dtype)[:, None, None]
            return jnp.sum(probs * mk, 0) / jnp.maximum(jnp.sum(mk), 1.0)

        self._predict = _predict

        @jax.jit
        def _preproc(stream, mean, std):
            return window_stream(zscore(stream, mean, std), self.win, self.hop)

        self._preproc = _preproc

    @classmethod
    def from_checkpoint(cls, ckpt_root, fold: int = 1, which: str = "best", **kw):
        """Load the fold's best parameters saved by the training driver
        (--ckpt_dir)."""
        import orbax.checkpoint as ocp

        path = Path(ckpt_root) / f"fold{fold}" / which
        payload = ocp.PyTreeCheckpointer().restore(path.resolve())
        return cls(payload["params"], cls._load_stats(ckpt_root), **kw)

    @classmethod
    def from_vmap_checkpoint(cls, ckpt_root, fold: int = 0, **kw):
        """Load one fold's best parameters out of the STACKED snapshot the
        vmapped CV driver writes (gaitpd/train/vmap_cv.py::save_vmap_checkpoint
        — all folds live in <ckpt_root>/vmap/latest; the weargait path keeps
        the per-fold best params in extras["best_params"] with the fold as
        the leading axis). fold is 0-based."""
        import jax as _jax
        import orbax.checkpoint as ocp

        path = Path(ckpt_root) / "vmap" / "latest"
        payload = ocp.PyTreeCheckpointer().restore(path.resolve())
        extras = payload.get("extras") or {}
        if "best_params" not in extras:
            raise ValueError(
                f"{path} is not a weargait vmap snapshot: its extras carry no "
                "'best_params' (the fbg_fog/single-mod vmap drivers save "
                "extras={}); serve from a weargait --vmap_cv checkpoint"
            )
        best = extras["best_params"]
        n_folds = _jax.tree_util.tree_leaves(best)[0].shape[0]
        if not 0 <= fold < n_folds:
            raise ValueError(f"fold {fold} out of range (snapshot has "
                             f"{n_folds} folds, 0-based)")
        params = _jax.tree_util.tree_map(lambda x: x[fold], best)
        return cls(params, cls._load_stats(ckpt_root), **kw)

    @staticmethod
    def _load_stats(ckpt_root):
        import json

        stats_path = Path(ckpt_root) / "stats.json"
        if not stats_path.exists():
            return None
        raw = json.loads(stats_path.read_text())
        return {
            m: (np.asarray(v[0], np.float32), np.asarray(v[1], np.float32))
            for m, v in raw.items()
        }

    # ------------------------------------------------------------------
    def predict_windows(
        self, windows: Dict[str, np.ndarray]
    ) -> np.ndarray:
        """windows: modality -> (N, win, C) pre-windowed batches; absent
        modalities are masked out. Returns (N, num_classes) probabilities."""
        present = [m for m in MODALITIES if m in windows]
        if not present:
            raise ValueError("at least one modality required")
        n = windows[present[0]].shape[0]
        xs, mask = [], []
        for m in MODALITIES:
            if m in windows:
                xs.append(jnp.asarray(windows[m], jnp.float32))
                mask.append(True)
            else:
                xs.append(jnp.zeros((n, self.win, CHANNELS[m]), jnp.float32))
                mask.append(False)
        probs = self._predict(self.params, *xs, jnp.asarray(mask))
        return np.asarray(probs)

    def predict_streams(
        self, streams: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """streams: modality -> (T, C) raw 30 Hz stream (any subset).
        Windows each stream, classifies per window, and aggregates to a
        subject-level probability (mean over windows).
        Returns {"window_probs": (N, C), "subject_probs": (C,), "pred": int}.
        """
        windows = {}
        for m, x in streams.items():
            if m not in CHANNELS:
                raise ValueError(f"unknown modality {m}")
            mean, std = self.stats[m]
            w = self._preproc(jnp.asarray(x, jnp.float32), mean, std)
            windows[m] = w
        n = min(w.shape[0] for w in windows.values())
        if n == 0:
            raise ValueError(f"streams shorter than one window ({self.win})")
        windows = {m: np.asarray(w[:n]) for m, w in windows.items()}
        probs = self.predict_windows(windows)
        subject = probs.mean(axis=0)
        return {
            "window_probs": probs,
            "subject_probs": subject,
            "pred": int(subject.argmax()),
        }


class StreamingSession:
    """Real-time serving session: push sensor frames as they arrive; windows
    are cut by the native C++ ring buffers (gaitpd.native) and classified in
    batches by the engine. One buffer per modality; modalities may stream at
    their own pace and any subset may be absent (relaxed-input)."""

    def __init__(self, engine: WearGaitEngine, modalities: Sequence[str] = MODALITIES):
        from gaitpd.native import StreamWindowBuffer

        self.engine = engine
        self.buffers = {
            m: StreamWindowBuffer(CHANNELS[m], engine.win, engine.hop)
            for m in modalities
        }

    def push(self, modality: str, frames: np.ndarray) -> None:
        mean, std = self.engine.stats[modality]
        z = np.asarray(
            (np.nan_to_num(frames, nan=float("nan")) - np.asarray(mean))
            / np.asarray(std),
            np.float32,
        )
        z = np.nan_to_num(z, nan=0.0, posinf=0.0, neginf=0.0)
        self.buffers[modality].push(z)

    def poll(self) -> Optional[Dict[str, np.ndarray]]:
        """Classify all complete windows available across the streaming
        modalities (aligned to the slowest one). None if nothing ready."""
        n = self.n_ready()
        if n == 0:
            return None
        windows = self.pop_windows(n)
        probs = self.engine.predict_windows(windows)
        return {"window_probs": probs, "pred": probs.argmax(1)}

    def n_ready(self) -> int:
        """Complete windows available across all modalities (min over the
        per-modality ring buffers — aligned to the slowest stream)."""
        ready = [b.ready for b in self.buffers.values()]
        return min(ready) if ready else 0

    def pop_windows(self, n: int) -> Dict[str, np.ndarray]:
        """Pop n aligned windows per modality out of the ring buffers."""
        return {m: self.buffers[m].pop(n) for m in self.buffers}


def poll_sessions(
    sessions: Sequence[StreamingSession],
) -> list:
    """Throughput-mode serving: drain the ready windows of MANY concurrent
    sessions and classify them in ONE batched predict per modality-subset
    group, instead of one dispatch per session.

    At batch-1 the TPU dispatch (and, in this container, the ~30 ms relay
    round-trip) dominates; batching across sessions amortizes it so the chip
    sees one large matmul-friendly batch. Sessions with different modality
    subsets (relaxed input) are grouped so each compiled mask pattern gets
    one call, and sessions backed by different engines (e.g. per-fold engines
    from from_vmap_checkpoint) are grouped separately so each batch is scored
    by its own parameters; results are scattered back per session.

    Returns a list aligned with `sessions`: {"window_probs", "pred"} for
    sessions that had complete windows, None for the rest."""
    results: list = [None] * len(sessions)
    groups: Dict[tuple, list] = {}
    for idx, s in enumerate(sessions):
        n = s.n_ready()
        if n == 0:
            continue
        key = (id(s.engine), tuple(sorted(s.buffers)))
        groups.setdefault(key, []).append((idx, n, s.pop_windows(n)))
    for (_, mods), members in groups.items():
        batch = {
            m: np.concatenate([w[m] for _, _, w in members], axis=0)
            for m in mods
        }
        engine = sessions[members[0][0]].engine
        probs = engine.predict_windows(batch)
        off = 0
        for idx, n, _ in members:
            p = probs[off:off + n]
            off += n
            results[idx] = {"window_probs": p, "pred": p.argmax(1)}
    return results
