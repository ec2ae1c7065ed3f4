#!/bin/bash
# Build the reference renderer headless and regenerate the golden PPMs.
# See README.md. Usage: bash tools/golden_harness/build.sh [scratch-dir]
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
B=${1:-/tmp/refbuild}
mkdir -p "$B/GL" "$B/lib/include" "$B/lib/src"
cp "$REF"/*.cpp "$REF"/*.h "$B"/
cp -r "$REF"/lib/include/* "$B"/lib/include/
cp "$REF"/lib/src/*.cpp "$B"/lib/src/
cp "$HERE/fake_glut.h" "$B/GL/glut.h"
cp "$HERE/freeimage_stubs.cpp" "$B/"
# the one compile error in the reference under modern g++ (std::min
# with mismatched float/double from pow)
sed -i 's/std::min((pow(f1f0,2)-1.f), 0.75f)/std::min((float)(pow(f1f0,2)-1.f), 0.75f)/' "$B/Texture.cpp"
python3 "$HERE/patch_main.py" "$B/main.cpp" || true
cd "$B"
g++ -O3 -std=gnu++14 -DNO_GFX -DOPENMP -fopenmp -msse4.1 -w \
    -I. -Ilib/include -Ilib/include/noise \
    *.cpp lib/src/*.cpp -o miro_headless -lm
ln -sfn "$REF/models" models
for s in teapot bunny1 cornell testsphere; do
    ./miro_headless "$s" > "$s.log" 2>&1
    echo "$s: $(grep -o 'Time spent raytracing image: [0-9.]*' "$s.log")"
done
echo "golden PPMs in $B/*.ppm — copy into tests/golden/ if intended"
