#!/usr/bin/env bash
# Round-5 uniformity pass: extend every WearGait row still at 32 seeds to 48
# (seeds 32-47), cheapest configs first. Each harness invocation merges into
# its existing report (seed-level merge; config fields must match). Safe to
# re-run: already-done seeds are skipped.
set -u
cd "$(dirname "$0")/.."
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
S="32 33 34 35 36 37 38 39 40 41 42 43 44 45 46 47"
P="artifacts/parity"

run() {
  echo "=== [$(date +%H:%M:%S)] $* ==="
  timeout 14400 python scripts/parity_weargait.py --seeds $S "$@" \
    || echo "!!! FAILED rc=$?: $*"
}

run --baseline deepav_lite --out $P/parity_weargait_deepav_report.json
run --baseline early_fusion --out $P/parity_weargait_early_fusion_report.json
run --baseline shared_latent --out $P/parity_weargait_sharedlatent_report.json
run --baseline cheap_xattn --out $P/parity_weargait_cheap_xattn_report.json
run --baseline focal --async_loading --out $P/parity_weargait_focal_async_report.json
run --baseline deepav_lite --baseline_torch_init \
    --out $P/parity_weargait_deepav_torchinit_report.json
run --single_mod insole --wm ce \
    --out $P/parity_weargait_singlemod_insole_report.json
run --async_loading --out $P/parity_weargait_async_s32_report.json
run --baseline taca --out $P/parity_weargait_taca_report.json
echo "=== [$(date +%H:%M:%S)] all extensions done ==="
