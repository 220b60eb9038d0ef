#!/usr/bin/env bash
# Thin wrapper mirroring the reference's explore_brdf_space_run.sh: resolves the
# repo root onto PYTHONPATH and forwards all flags.
set -e
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="$REPO_DIR:$PYTHONPATH"
exec python -m nerfactor_tpu.explore_brdf_space "$@"
