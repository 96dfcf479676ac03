#!/bin/sh
# Build the native host parser -> go_mp3_tpu/native/libmp3parse.so
#
# Profile-guided: when the reference fixtures are present, an instrumented
# build is trained on them (tools/pgo_profile.py drives every hot entry
# point) and the final build uses the branch profile (~5-7% on the Huffman
# hot loop, measured). Falls back to a plain build if any PGO step fails.
# PGO does not change FP semantics: -ffp-contract=off stays in force and
# C++ FP evaluation order is value-safe under optimization, so the exact
# backend's bit-for-bit contract (and the golden PCM pins) hold either way.
set -e
cd "$(dirname "$0")/.."

SRC="go_mp3_tpu/native/mp3parse.cpp go_mp3_tpu/native/mp3dsp.cpp \
     go_mp3_tpu/native/synth_window_data.cpp"
OUT="go_mp3_tpu/native/libmp3parse.so"
# -ffp-contract=off: the exact DSP replicates the Go reference's float32
# arithmetic, and Go's amd64 backend never contracts mul+add into FMA —
# letting g++ fuse changes ~200 samples/file by 1 LSB.
FLAGS="-O3 -march=native -ffp-contract=off -std=c++17 -fPIC -shared -Wall -Wextra"

pgo_build() {
    PDIR=$(mktemp -d)
    trap 'rm -rf "$PDIR"' EXIT
    g++ $FLAGS -fprofile-generate -fprofile-dir="$PDIR" \
        $SRC -o "$PDIR/instrumented.so" || return 1
    python tools/pgo_profile.py "$PDIR/instrumented.so" || return 1
    g++ $FLAGS -fprofile-use -fprofile-dir="$PDIR" -fprofile-correction \
        -Wno-missing-profile $SRC -o "$OUT" || return 1
    echo "built $OUT (PGO)"
}

if [ -f /root/reference/example/classic_lame.mp3 ] && pgo_build; then
    :
else
    g++ $FLAGS $SRC -o "$OUT"
    echo "built $OUT"
fi
