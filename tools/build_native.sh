#!/bin/sh
# Build the native host parser -> go_mp3_tpu/native/libmp3parse.so
set -e
cd "$(dirname "$0")/.."
# -ffp-contract=off: the exact DSP replicates the Go reference's float32
# arithmetic, and Go's amd64 backend never contracts mul+add into FMA —
# letting g++ fuse changes ~200 samples/file by 1 LSB.
g++ -O3 -march=native -ffp-contract=off -std=c++17 -fPIC -shared -Wall -Wextra \
    go_mp3_tpu/native/mp3parse.cpp \
    go_mp3_tpu/native/mp3dsp.cpp \
    go_mp3_tpu/native/synth_window_data.cpp \
    -o go_mp3_tpu/native/libmp3parse.so
echo "built go_mp3_tpu/native/libmp3parse.so"
