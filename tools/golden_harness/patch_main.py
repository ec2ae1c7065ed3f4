#!/usr/bin/env python3
"""Patch the scratch copy of the reference's main.cpp so the scene is
selected by argv[1] and the PPM is named after it. Run from the scratch
build dir (see README.md). Idempotence: refuses to re-patch."""
import sys

MAIN = sys.argv[1] if len(sys.argv) > 1 else "main.cpp"
src = open(MAIN).read()
if "golden-image harness" in src:
    sys.exit("already patched")

DISPATCH = '''//    makeTestScene();
    // [headless golden-image harness] scene selected by argv[1]
    const char* scene = (argc > 1) ? argv[1] : "petal";
    std::string s(scene);
    if (s == "teapot") makeTeapotScene();
    else if (s == "bunny1") makeBunny1Scene();
    else if (s == "bunny20") makeBunny20Scene();
    else if (s == "cornell") makeCornellScene();
    else if (s == "sponza") makeSponzaScene();
    else if (s == "a1sphere") A1makeSphereScene();
    else if (s == "a1teapot") A1makeTeapotScene();
    else if (s == "a1bunny") A1makeBunnyScene();
    else if (s == "testsphere") makeTestSphereScene();
    else if (s == "petal") makeTestPetalScene();
    else { fprintf(stderr, "unknown scene %s\\n", scene); return 1; }
    goto scene_done;
    if (0) {
'''
src = src.replace("//    makeTestScene();\n", DISPATCH, 1)
# close the dead block after the original hard-coded scene call
src = src.replace("    MiroWindow miro(&argc, argv);",
                  "    }\nscene_done:;\n    MiroWindow miro(&argc, argv);", 1)
src = src.replace("""    g_image->writePPM();""",
                  """    {
        char out[1024];
        snprintf(out, sizeof out, "%s.ppm", scene);
        g_image->writePPM(out);
    }""", 1)
if "#include <string>" not in src:
    src = src.replace("#include <math.h>", "#include <math.h>\n#include <string>", 1)
open(MAIN, "w").write(src)
print("patched", MAIN)
