#!/bin/bash
# CI entry point: full test suite on the virtual 8-device CPU mesh,
# sanitizer job for the native layer, and the driver entry points.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== pytest (8-device virtual CPU mesh) ==="
python -m pytest tests/ -q

echo "=== ASan/UBSan (native C++ layer) ==="
bash scripts/asan.sh

echo "=== TSan (native C++ threading) ==="
bash scripts/tsan.sh

echo "=== driver entry points ==="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as ge
fn, args = ge.entry(); jax.jit(fn)(*args)
ge.dryrun_multichip(8)"

echo "CI: all green"
