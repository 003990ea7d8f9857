#!/usr/bin/env bash
# Round-5b uniformity pass: extend every remaining 32-seed FoG row to 48
# (seeds 32-47) — the ten parity_baselines configs (per-config run + hand
# merge via merge_baseline_ext.py, since that harness replaces per_seed on
# rerun) and the seven parity_check rows (native seed-level merge; safe to
# re-run, done seeds are skipped). Widest-CI configs first; TACA (several×
# slower on CPU) last. Safe to interrupt: each config/row lands as it
# completes.
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
S="32 33 34 35 36 37 38 39 40 41 42 43 44 45 46 47"
P="artifacts/parity"

ext_baseline() {
  local cfg="$1"
  if python -c "
import json, sys
r = json.load(open('$P/parity_baselines_report.json'))
sys.exit(0 if r['$cfg']['stats']['n_seeds'] >= 48 else 1)"; then
    echo "=== [$(date +%H:%M:%S)] $cfg already at 48, skipping ==="
    return
  fi
  echo "=== [$(date +%H:%M:%S)] baselines: $cfg ==="
  rm -f "/tmp/ext_$cfg.json"
  timeout 14400 python scripts/parity_baselines.py --configs "$cfg" \
      --epochs 25 --strength 1.0 --seeds $S --out "/tmp/ext_$cfg.json" \
    && python scripts/merge_baseline_ext.py "$cfg" "/tmp/ext_$cfg.json" \
    || echo "!!! FAILED rc=$?: $cfg"
}

ext_check() {
  echo "=== [$(date +%H:%M:%S)] parity_check: $* ==="
  timeout 21600 python scripts/parity_check.py --epochs 25 --seeds $S "$@" \
    || echo "!!! FAILED rc=$?: $*"
}

ext_baseline deepav_sync
ext_baseline focal_sync
ext_baseline fusion_early_sync
ext_baseline focal_async
ext_baseline deepav_async
ext_baseline fusion_share_latent_sync
ext_baseline fusion_late_async
ext_baseline fusion_early_fbg_async

ext_check --strength 0.6 --configs sensor_ce multimodal_ce_cagrad \
    fbg_multimodal_gcl_cagrad --out $P/parity_report.json
ext_check --strength 0.6 --configs fbg_sensor_ce \
    --out $P/parity_fbg_sensor_report.json
ext_check --strength 0.6 --configs multimodal_ldam_cagrad \
    --out $P/parity_ldam_report.json
ext_check --strength 0.8 --configs multimodal_gcl_sync \
    --out $P/parity_sync_gcl_report.json
ext_check --strength 5.0 --configs skeleton_ce_joint \
    --out $P/parity_skel_joint_report.json

ext_baseline taca_sync
ext_baseline taca_async
echo "=== [$(date +%H:%M:%S)] all r5b extensions done ==="
