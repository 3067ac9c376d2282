#!/usr/bin/env bash
# Sanitizer harness for the native engine (native/fqtk_io.cpp).
#
# The reference gets data-race freedom from Rust's type system (SURVEY.md §5;
# /root/reference/ci/check.sh is fmt + clippy -D warnings + test).  This repo
# replaces that assurance for its concurrent C++ engine (parse threads ->
# window ring -> route thread -> compressor pool, plus the threaded host
# matchers) with instrumented runs: the differential-fuzz suites and a
# dedicated high-volume concurrency stress execute against ThreadSanitizer
# and AddressSanitizer+UBSan builds of the .so (loaded via FQTK_NATIVE_LIB).
#
# Usage: scripts/sanitize.sh [tsan|asan]   (default: both)
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-both}"

# Reduced seed set: sanitizer runs are 5-20x slower than native; the full
# suites run uninstrumented in scripts/check.sh.
PYTESTS=(
  "tests/test_fuzz_differential.py"
  "tests/test_smallk.py"
  "tests/test_bigk.py"
  "tests/test_io.py"
  "tests/test_subsample.py"
)

TSAN_RT="$(g++ -print-file-name=libtsan.so)"
ASAN_RT="$(g++ -print-file-name=libasan.so)"
UBSAN_RT="$(g++ -print-file-name=libubsan.so)"

# TSan can fail to map its shadow under high-entropy ASLR; retry address-
# space-randomization-disabled if the plain run dies on startup.
_maybe_setarch() {
  local rc=0
  "$@" || rc=$?
  if [ "$rc" -eq 0 ]; then return 0; fi
  if [ "$rc" -ge 126 ] || [ "$rc" -eq 1 ]; then
    echo "sanitize: retrying under setarch -R (TSan shadow mapping vs ASLR)"
    setarch "$(uname -m)" -R "$@"
  else
    return "$rc"
  fi
}

run_tsan() {
  echo "== ThreadSanitizer: $*"
  _maybe_setarch env \
    FQTK_NATIVE_LIB="$PWD/native/libfqtk_io_tsan.so" \
    LD_PRELOAD="$TSAN_RT" \
    TSAN_OPTIONS="halt_on_error=1 exitcode=66 report_thread_leaks=0 ignore_noninstrumented_modules=1" \
    "$@"
}

run_asan() {
  echo "== AddressSanitizer+UBSan: $*"
  env \
    FQTK_NATIVE_LIB="$PWD/native/libfqtk_io_asan.so" \
    LD_PRELOAD="$ASAN_RT $UBSAN_RT" \
    ASAN_OPTIONS="detect_leaks=0 abort_on_error=1" \
    UBSAN_OPTIONS="halt_on_error=1 print_stacktrace=1" \
    "$@"
}

# Canaries: prove each sanitizer actually detects bugs under THIS harness
# (LD_PRELOAD runtime + dlopen'd instrumented .so) before trusting a clean
# engine run.  A disarmed sanitizer must fail the script, not pass it.
CANARY_DIR="$(mktemp -d)"
trap 'rm -rf "$CANARY_DIR"' EXIT

tsan_canary() {
  cat > "$CANARY_DIR/race.cpp" <<'EOF'
#include <thread>
extern "C" int canary() {
  int x = 0;
  std::thread t1([&]{ for (int i = 0; i < 100000; i++) x++; });
  std::thread t2([&]{ for (int i = 0; i < 100000; i++) x++; });
  t1.join(); t2.join();
  return x;
}
EOF
  g++ -O1 -g -fPIC -fsanitize=thread -shared -pthread \
    "$CANARY_DIR/race.cpp" -o "$CANARY_DIR/librace.so"
  if env LD_PRELOAD="$TSAN_RT" TSAN_OPTIONS="exitcode=66" \
      python -c "import ctypes; ctypes.CDLL('$CANARY_DIR/librace.so').canary()" \
      2>/dev/null; then
    echo "sanitize: TSAN CANARY NOT DETECTED — harness is disarmed" >&2
    exit 1
  fi
  echo "== TSAN canary: race detected (harness armed)"
}

asan_canary() {
  cat > "$CANARY_DIR/oob.cpp" <<'EOF'
extern "C" int canary() {
  int* p = new int[4];
  int v = p[5];
  delete[] p;
  return v;
}
EOF
  g++ -O1 -g -fPIC -fsanitize=address -shared \
    "$CANARY_DIR/oob.cpp" -o "$CANARY_DIR/liboob.so"
  if env LD_PRELOAD="$ASAN_RT" ASAN_OPTIONS="detect_leaks=0" \
      python -c "import ctypes; ctypes.CDLL('$CANARY_DIR/liboob.so').canary()" \
      2>/dev/null; then
    echo "sanitize: ASAN CANARY NOT DETECTED — harness is disarmed" >&2
    exit 1
  fi
  echo "== ASAN canary: heap overflow detected (harness armed)"
}

if [ "$MODE" = "tsan" ] || [ "$MODE" = "both" ]; then
  make -C native tsan
  tsan_canary
  run_tsan python scripts/sanitize_stress.py
  run_tsan python -m pytest "${PYTESTS[@]}" -q -p no:cacheprovider
  echo "== TSAN: clean"
fi

if [ "$MODE" = "asan" ] || [ "$MODE" = "both" ]; then
  make -C native asan
  asan_canary
  run_asan python scripts/sanitize_stress.py
  run_asan python -m pytest "${PYTESTS[@]}" -q -p no:cacheprovider
  echo "== ASAN+UBSAN: clean"
fi

echo "sanitize: all requested runs clean"
