#!/usr/bin/env bash
# Repo check: lint, byte-compile, build the native engine (-Werror), run
# the test suite (incl. doctests), then the sanitizer harness.  (Analog of
# the reference's ci/check.sh: fmt + clippy -D warnings + test; TSAN/ASAN
# replace the data-race-freedom assurance Rust's type system gave the
# reference — see scripts/sanitize.sh.)
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/lint.py
JAX_PLATFORMS=cpu python scripts/update_docs.py --check
python scripts/test_parity_audit.py
python -m compileall -q fqtk_tpu tests bench.py __graft_entry__.py
make -C native
python -m pytest tests/ -q
JAX_PLATFORMS=cpu python -m pytest --doctest-modules fqtk_tpu -q
bash scripts/sanitize.sh
