#!/usr/bin/env bash
# Full test gate, split into three serial pytest runs so the persistent
# XLA compile cache (tests/.jax_cache) can serve every leg that is safe
# for it. One monolithic `pytest tests/` run must disable the cache
# outright — on this image's XLA:CPU, AOT cache loads and cross-device
# collective programs deadlock when they share a process (see
# tests/conftest.py) — which costs the single-device majority its warm
# cache. The split keeps coverage identical (the three marker
# expressions partition the suite; conftest auto-applies `multidevice`)
# while only the collective leg pays full compiles.
#
# Usage: scripts/gate.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."

fail=0
for expr in "not slow" "slow and not multidevice" "slow and multidevice"; do
    echo "=== gate leg: -m \"$expr\" ==="
    start=$(date +%s)
    python -m pytest tests/ -m "$expr" -q "$@"
    rc=$?
    echo "=== leg '-m $expr' rc=$rc in $(( $(date +%s) - start ))s ==="
    # rc 5 = "no tests collected": expected when extra args (-k, a file
    # path) empty one leg's partition — not a failure
    [ $rc -ne 0 ] && [ $rc -ne 5 ] && fail=1
done
exit $fail
