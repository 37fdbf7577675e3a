#!/usr/bin/env bash
# One-command test gate: the full suite on a virtual 8-device CPU mesh.
#
# tests/conftest.py forces jax_platforms=cpu and
# --xla_force_host_platform_device_count=8, so this runs anywhere (no TPU
# required) and exercises the multi-chip sharding paths on the virtual
# mesh. Mirrored by .github/workflows/ci.yml.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
