"""Render orchestration: cameras, wavefront integrators, tonemapping,
image output (reference L4/L5: Scene.cpp raytraceImage/traceScene,
Camera.cpp, Image.cpp)."""
