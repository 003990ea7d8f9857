#!/usr/bin/env bash
# CPU test runner (~18-35 min, 257 tests): skip the axon TPU registration handshake (the
# sitecustomize hook registers a tunneled TPU backend that costs ~2min of
# startup wall-clock) and run on an 8-virtual-device CPU mesh.
set -e
cd "$(dirname "$0")/.."
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python -m pytest tests/ -q "$@"
