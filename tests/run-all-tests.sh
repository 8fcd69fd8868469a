#!/usr/bin/env bash
# Parity with the reference's tests/run-all-tests.sh (unittest discover);
# here: pytest over the suite on an 8-virtual-device CPU mesh (conftest.py).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
