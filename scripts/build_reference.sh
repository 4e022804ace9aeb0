#!/usr/bin/env bash
# Build the ACTUAL reference binary (/root/reference/fpmMain.cpp, verbatim)
# against the reconstructed cvComplex shim (native/refshim/), plus the
# cv_probe semantics probe. Produces build/refbin/{fpmMain,cv_probe}.
# The reference source is compiled unmodified from its own tree; only the
# missing cvComplex library and the OpenCV-2.4 constant aliases are supplied
# by the shim (see native/refshim/cvComplex.h for provenance).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF="${FPM_REFERENCE_DIR:-/root/reference}"
OUT="$REPO/build/refbin"
mkdir -p "$OUT"
CVFLAGS="$(pkg-config --cflags opencv4)"
CVLIBS="$(pkg-config --libs opencv4)"
# -I order: shim first (cvComplex.h), then the reference tree (include/json.h,
# include/domeHoleCoordinates.h resolve relative to fpmMain.cpp's directory).
g++ -std=c++14 -O2 -w \
    -I "$REPO/native/refshim" -I "$REF" \
    "$REF/fpmMain.cpp" "$REF/include/jsoncpp.cpp" \
    "$REPO/native/refshim/cvComplex.cpp" \
    $CVFLAGS $CVLIBS -o "$OUT/fpmMain"
g++ -std=c++14 -O2 "$REPO/native/refshim/cv_probe.cpp" $CVFLAGS $CVLIBS -o "$OUT/cv_probe"
echo "built: $OUT/fpmMain $OUT/cv_probe"
