#!/bin/bash
# Build the reference renderer headless with a REAL (minimal) FreeImage
# backend and render makeTestSphereTextureScene — the bilinear
# image-texture path (LoadedTexture, Texture.cpp:23-28,161-185) against
# gfx/earth.jpg. Deterministic (eye rays + point lights): the output is
# a bit-level golden like teapot/cornell.
#
# gfx/earth.jpg is pre-decoded to a raw RGB array with Python/imageio
# (no JPEG codec in C++ here); freeimage_impl.cpp reads the .raw and
# serves it through the 14 FreeImage entry points the reference calls.
#
# Usage: bash tools/golden_harness/build_earth.sh [scratch-dir]
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
B=${1:-/tmp/refbuild_earth}
mkdir -p "$B/GL" "$B/lib/include" "$B/lib/src" "$B/gfx"
cp "$REF"/*.cpp "$REF"/*.h "$B"/
cp -r "$REF"/lib/include/* "$B"/lib/include/
cp "$REF"/lib/src/*.cpp "$B"/lib/src/
cp "$HERE/fake_glut.h" "$B/GL/glut.h"
cp "$HERE/freeimage_impl.cpp" "$B/"
sed -i 's/std::min((pow(f1f0,2)-1.f), 0.75f)/std::min((float)(pow(f1f0,2)-1.f), 0.75f)/' "$B/Texture.cpp"
python3 "$HERE/patch_main.py" "$B/main.cpp" || true
python3 - "$REF/gfx/earth.jpg" "$B/gfx/earth.jpg.raw" <<'PY'
import sys, struct
import imageio.v2 as iio
import numpy as np
im = np.asarray(iio.imread(sys.argv[1]))[..., :3].astype(np.uint8)
h, w = im.shape[:2]
with open(sys.argv[2], "wb") as f:
    f.write(struct.pack("<ii", w, h))
    f.write(im.tobytes())          # top-down rows; impl flips to bottom-up
print("decoded", sys.argv[1], w, "x", h)
PY
cd "$B"
g++ -O3 -std=gnu++14 -DNO_GFX -DOPENMP -fopenmp -msse4.1 -w \
    -I. -Ilib/include -Ilib/include/noise \
    *.cpp lib/src/*.cpp -o miro_earth -lm
ln -sfn "$REF/models" models
./miro_earth spheretexture > spheretexture.log 2>&1
echo "spheretexture: $(grep -o 'Time spent raytracing image: [0-9.]*' spheretexture.log)"
echo "golden PPM in $B/spheretexture.ppm — copy to tests/golden/spheretexture.ppm"
