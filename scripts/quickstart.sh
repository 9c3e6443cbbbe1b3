#!/usr/bin/env bash
# Quickstart (reference: /root/reference/scripts/quickstart.sh).
#
# The reference downloads the Hypersim ai_001_001 scene; this
# environment is offline, so the quickstart renders the deterministic
# synthetic protocol scene and runs the full triangulation pipeline +
# quality eval on it.  With Hypersim data available under data/, use
# runners/hypersim/triangulation.py instead.
set -e
cd "$(dirname "$0")/.."
python scripts/synthetic_quickstart.py "$@"
