#!/bin/bash
# Per-module test runner with one retry per module.
#
# The XLA CPU compiler in this image intermittently crashes (SIGABRT in
# backend_compile_and_load, SIGSEGV in executable (de)serialization) while
# handling the largest programs — the h-evaluator class and the 8-device
# shard_map programs.  conftest.py already gates persistent-cache writes to
# fast-compiling programs; this script adds process isolation so a flaky
# native crash aborts ONE module once and is retried, instead of killing
# the whole session.  `python -m pytest tests/ -q` remains supported and
# usually passes — this is the belt-and-braces CI entry point.
set -u
cd "$(dirname "$0")/.."
fail=0
failed_modules=""
for f in tests/test_*.py; do
    ok=0
    for attempt in 1 2; do
        if python -m pytest "$f" -q; then
            ok=1
            break
        fi
        echo "RETRY $f (attempt $attempt failed)" >&2
    done
    if [ $ok -eq 0 ]; then
        fail=1
        failed_modules="$failed_modules $f"
    fi
done
if [ $fail -ne 0 ]; then
    echo "FAILED modules:$failed_modules" >&2
fi
exit $fail
