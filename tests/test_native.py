"""Native C++ graph walker: build + parity with the python implementation."""

import shutil

import numpy as np
import pytest

from move2hear_tpu.env.scene import GraphScene

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("make") is None,
    reason="no C++ toolchain",
)


@pytest.fixture(scope="module")
def pair():
    from move2hear_tpu.native.binding import NativeGraph

    scene = GraphScene.grid("g", 5, 5)
    return scene, NativeGraph(scene.positions, scene.neighbors)


def test_native_bfs_matches_python(pair):
    scene, ng = pair
    rng = np.random.default_rng(0)
    for _ in range(100):
        a, b = rng.integers(0, 25, 2)
        assert ng.shortest_path_steps(int(a), int(b)) == scene.shortest_path_steps(
            int(a), int(b)
        )


def test_native_forward_matches_python(pair):
    scene, ng = pair
    for node in range(25):
        for orient in (0, 45, 90, 135, 180, 225, 270, 315):
            assert ng.forward_neighbor(node, orient) == scene.forward_neighbor(
                node, orient
            ), (node, orient)


def test_native_step_batch(pair):
    scene, ng = pair
    nodes = np.array([12, 12, 12, 12], np.int32)
    rots = np.array([0, 0, 0, 0], np.int32)
    # PAUSE, FWD, LEFT, RIGHT
    ng.step_batch(np.array([0, 1, 2, 3], np.int32), nodes, rots)
    assert nodes[0] == 12 and rots[0] == 0
    assert nodes[1] == scene.forward_neighbor(12, 270)
    assert rots[2] == 90 and rots[3] == 270


def test_scene_attach_native():
    scene = GraphScene.grid("g2", 4, 4)
    assert scene.attach_native()
    assert scene.shortest_path_steps(0, 15) == 6
    assert scene.geodesic_distance(0, 15) == 6.0
