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


def test_native_geodesic_batch_all_pairs(pair):
    """geodesic_batch serves build_device_scene's all-pairs dist matrix."""
    scene, ng = pair
    v = scene.num_nodes
    idx = np.arange(v, dtype=np.int32)
    out = ng.geodesic_batch(np.repeat(idx, v), np.tile(idx, v)).reshape(v, v)
    for a in range(0, v, 7):
        for b in range(0, v, 5):
            assert out[a, b] == scene._bfs(a)[b]


def test_from_files_scenes_route_through_native(tmp_path):
    """GraphScene.from_files attaches the C++ walker (the habitat-sim
    replacement's production call site) and movement/geodesics match the
    numpy path."""
    import pickle

    import networkx as nx

    from _ref_layout import GRID, _grid_graph

    meta = tmp_path / "sceneX"
    meta.mkdir()
    g = _grid_graph()
    rows = []
    for n in range(GRID * GRID):
        p_ = g.nodes[n]["point"]
        rows.append(f"{n}\t{p_[0]}\t{-p_[2]}\t{p_[1] + 1.5}")
    (meta / "points.txt").write_text("\n".join(rows) + "\n")
    with open(meta / "graph.pkl", "wb") as f:
        pickle.dump(g, f)

    scene = GraphScene.from_files(str(tmp_path), "sceneX")
    assert scene._native is not None
    py = GraphScene(scene.name, scene.positions, scene.neighbors)
    assert py._native is None
    for node in range(scene.num_nodes):
        for ori in (0, 45, 90, 180, 270):
            assert scene.forward_neighbor(node, ori) == py.forward_neighbor(
                node, ori
            )
        assert scene.shortest_path_steps(0, node) == py.shortest_path_steps(
            0, node
        )


def test_scene_attach_native():
    scene = GraphScene.grid("g2", 4, 4)
    assert scene.attach_native()
    assert scene.shortest_path_steps(0, 15) == 6
    assert scene.geodesic_distance(0, 15) == 6.0
