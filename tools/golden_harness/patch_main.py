#!/usr/bin/env python3
"""Patch the scratch copy of the reference's main.cpp so the scene is
selected by argv[1] and the PPM is named after it. Run from the scratch
build dir (see README.md). Idempotence: refuses to re-patch."""
import sys

MAIN = sys.argv[1] if len(sys.argv) > 1 else "main.cpp"
src = open(MAIN).read()
if "golden-image harness" in src:
    sys.exit("already patched")

SCENE_FN = '''
// [golden-image harness] cornell geometry + a DirectionalAreaLight:
// the only light type the reference's tracePhotons emits from
// (Scene.cpp:368,430), so this scene exercises the photon-mapped
// radiance path (irradiance_estimate adds at every diffuse hit,
// Scene.cpp:286-299). Geometry/materials identical to
// makeCornellScene (assignment2.cpp:374-442).
// assignment2.cpp's addMeshTrianglesToScene sits in an anonymous
// namespace (internal linkage) and translate() is inline there;
// reproduce both (assignment2.cpp:446-470)
static void
harnessAddMesh(TriangleMesh * mesh, Material * material)
{
    for (int i = 0; i < mesh->numTris(); ++i)
    {
        Triangle* t = new Triangle;
        t->setIndex(i);
        t->setMesh(mesh);
        t->setMaterial(material);
        g_scene->addObject(t);
    }
}
static Matrix4x4
harnessTranslate(float x, float y, float z)
{
    Matrix4x4 m;
    m.setColumn4(Vector4(x, y, z, 1));
    return m;
}
void
makePhotonCornellScene()
{
    g_camera = new Camera;
    g_scene = new Scene;
    g_image = new Image;
    g_image->resize(512, 512);
    g_camera->setBGColor(Vector3(0.0f, 0.0f, 0.2f));
    g_camera->setEye(Vector3(2.5, 3, 3));
    g_camera->setLookAt(Vector3(2.5, 2.5, 0));
    g_camera->setUp(Vector3(0, 1, 0));
    g_camera->setFOV(90);

    DirectionalAreaLight * light = new DirectionalAreaLight(1.5);
    light->setPosition(Vector3(2.5, 4.5, -1));
    light->setNormal(Vector3(0, -1, 0));
    light->setColor(Vector3(1, 1, 1));
    light->setWattage(50);
    g_scene->addLight(light);

    Material *mat;
    TriangleMesh * mesh;
    mesh = new TriangleMesh;
    mesh->load("models/cornell_box_1.obj");
    harnessAddMesh(mesh, mat = new Phong(Vector3(1,1,1)));
    mesh = new TriangleMesh;
    mesh->load("models/cornell_box_2.obj");
    harnessAddMesh(mesh, mat = new Phong(Vector3(1,0,0), Vector3(0)));
    mesh = new TriangleMesh;
    mesh->load("models/cornell_box_3.obj");
    harnessAddMesh(mesh, new Phong(Vector3(0,1,0)));
    mesh = new TriangleMesh;
    mesh->load("models/cornell_box_4.obj");
    harnessAddMesh(mesh, new Phong(Vector3(1)));

    Matrix4x4 xform;
    xform *= harnessTranslate(-2, -0.5, 0);
    Material* water = new Phong(Vector3(1.f), Vector3(0), Vector3(1.0f), 5, 1.5);
    mesh = new TriangleMesh;
    mesh->load("models/WaterDrops.obj", xform);
    harnessAddMesh(mesh, water);

    g_scene->preCalc();
}
'''

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
    else if (s == "photoncornell") makePhotonCornellScene();
    else if (s == "spheretexture") makeTestSphereTextureScene();
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
if "#include \"DirectionalAreaLight.h\"" not in src:
    src = src.replace("#include <math.h>",
                      "#include <math.h>\n#include \"DirectionalAreaLight.h\"", 1)
# the photon-parity scene rides along in main.cpp itself (all the
# helpers it needs — addMeshTrianglesToScene, Phong, TriangleMesh —
# are visible there)
src = src.replace("int\nmain(int argc, char*argv[])",
                  SCENE_FN + "\nint\nmain(int argc, char*argv[])", 1)
open(MAIN, "w").write(src)
print("patched", MAIN)
