"""Native C++ OBJ loader parity vs the pure-python reference path."""

import numpy as np
import pytest

import cse168_raytracer_tpu.models.obj as O


@pytest.fixture()
def restore_native():
    saved = O._NATIVE
    yield
    O._NATIVE = saved


def _compare(path, ctm=None):
    O._NATIVE = None
    lib = O._load_native()
    if lib is None:
        pytest.skip("native loader unavailable (no g++?)")
    nat = O.load_obj(path, ctm)
    O._NATIVE = False
    py = O.load_obj(path, ctm)
    for k in nat:
        assert nat[k].shape == py[k].shape, k
        if nat[k].dtype.kind == "f":
            np.testing.assert_allclose(nat[k], py[k], atol=1e-5, err_msg=k)
        else:
            np.testing.assert_array_equal(nat[k], py[k], err_msg=k)
    return nat


def test_native_teapot_parity(restore_native):
    out = _compare("/root/reference/models/teapot.obj")
    assert out["tri_vidx"].shape[0] == 576          # teapot face count


def test_native_ctm_parity(restore_native):
    from cse168_raytracer_tpu.scenes.registry import (rotate, scale,
                                                      translate)
    ctm = translate(1, 2, 3) @ rotate(25, 0.3, 0.1, 0.6) @ scale(0.5, 2, 1)
    _compare("/root/reference/models/teapot.obj", ctm)


def test_native_generated_normals_parity(restore_native):
    """cornell boxes have no vn entries -> exercises the generated-
    normal averaging path (TriangleMeshLoad.cpp:252-308)."""
    out = _compare("/root/reference/models/cornell_box_1.obj")
    n = out["normals"]
    lens = np.linalg.norm(n, axis=1)
    assert np.allclose(lens[lens > 0], 1.0, atol=1e-5)
