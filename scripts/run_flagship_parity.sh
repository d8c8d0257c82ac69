#!/bin/bash
# Flagship-shape composed parity (480x640 / Q=100 / E=256 / 6 layers / T=20,
# fp32, CPU): heavy, so it is gated out of the default suite. Run here; the
# result is recorded in PARITY.md.
cd "$(dirname "$0")/.."
UOMS_FLAGSHIP_PARITY=1 python -m pytest tests/test_flagship_parity.py -x -q -s "$@"
