#!/bin/bash
# ThreadSanitizer run for the threaded native host plane (SURVEY §5).
# Builds the TSan library, then runs tools/tsan_stress.py with libtsan
# preloaded.  Exits non-zero on any data race (TSAN halt_on_error) or
# stress failure.
set -e
DIR="$(cd "$(dirname "$0")/.." && pwd)"
make -C "$DIR/strainer2_tpu/native" tsan
LIBTSAN="$(g++ -print-file-name=libtsan.so)"
export LD_PRELOAD="$LIBTSAN"
export STRAINER2_NATIVE_LIB="$DIR/strainer2_tpu/native/libstrainer2host_tsan.so"
export TSAN_OPTIONS="halt_on_error=1 exitcode=66 report_signal_unsafe=0"
export PYTHONPATH="$DIR"
export JAX_PLATFORMS=
exec python "$DIR/tools/tsan_stress.py"
