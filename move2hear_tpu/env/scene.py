"""Grid-graph scene: navigation nodes, adjacency, movement geometry and
geodesic distances (``habitat_audio/simulator_train.py:59-95,267-353,488-532``
and ``habitat_audio/utils.py``).

Coordinate convention is habitat's: +Y up, -Z forward, +X right; angle 0 is
+X. The agent's orientation is ``(270 - rotation_angle) % 360`` where
``rotation_angle`` increases counterclockwise. Neighbor-direction angles are
``round(deg(atan2(dz, dx))) % 360``; diagonal (45-degree-family) edges are
taken when ``abs(direction - orientation) == 45`` exactly — the reference's
quirk, preserved (simulator_train.py:267-281).

When the optional native extension is built (move2hear_tpu/native), BFS
geodesics are served by the C++ graph walker; otherwise a numpy BFS runs.
"""

import os
import pickle
from collections import deque
from typing import Dict, List, Optional, Sequence

import numpy as np

CARDINALS = (0, 90, 180, 270)


class GraphScene:
    def __init__(
        self,
        name: str,
        positions: np.ndarray,            # (N, 3)
        neighbors: Sequence[Sequence[int]],
        grid_size: float = 1.0,
    ):
        self.name = name
        self.positions = np.asarray(positions, np.float64)
        self.neighbors = [list(ns) for ns in neighbors]
        self.grid_size = grid_size
        self._dist_cache: Dict[int, np.ndarray] = {}
        self._native = None  # lazily attached native walker

    @property
    def num_nodes(self) -> int:
        return len(self.positions)

    # --- movement --------------------------------------------------------
    def edge_direction(self, a: int, b: int) -> int:
        p1, p2 = self.positions[a], self.positions[b]
        return int(
            np.around(np.rad2deg(np.arctan2(p2[2] - p1[2], p2[0] - p1[0])))
        ) % 360

    def forward_neighbor(self, node: int, orientation: int) -> int:
        """First neighbor (adjacency order) matching the facing direction;
        the node itself if none (the agent bumps into a wall)."""
        if self._native is not None:
            return self._native.forward_neighbor(node, orientation)
        for nb in self.neighbors[node]:
            direction = self.edge_direction(node, nb)
            if direction not in CARDINALS:
                if int(abs(direction - orientation)) == 45:
                    return nb
            elif direction == orientation:
                return nb
        return node

    # --- distances -------------------------------------------------------
    def _bfs(self, src: int) -> np.ndarray:
        dist = np.full(self.num_nodes, -1, np.int32)
        dist[src] = 0
        q = deque([src])
        while q:
            u = q.popleft()
            for v in self.neighbors[u]:
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    def shortest_path_steps(self, a: int, b: int) -> int:
        if self._native is not None:
            return self._native.shortest_path_steps(a, b)
        if a not in self._dist_cache:
            self._dist_cache[a] = self._bfs(a)
        return int(self._dist_cache[a][b])

    def geodesic_distance(self, a: int, b: int) -> float:
        """steps * GRID_SIZE (simulator_train.py:488-499)."""
        return self.shortest_path_steps(a, b) * self.grid_size

    def euclidean_distance(self, a: int, b: int) -> float:
        pa, pb = self.positions[a], self.positions[b]
        return float(np.hypot(pa[0] - pb[0], pa[2] - pb[2]))

    def position_to_index(self, position) -> Optional[int]:
        d = np.linalg.norm(self.positions - np.asarray(position), axis=1)
        i = int(np.argmin(d))
        return i if d[i] < 1e-4 else None

    def attach_native(self):
        """Route BFS through the C++ graph walker when available."""
        try:
            from move2hear_tpu.native.binding import NativeGraph

            self._native = NativeGraph(self.positions, self.neighbors)
        except Exception:
            self._native = None
        return self._native is not None

    # --- loading ---------------------------------------------------------
    @classmethod
    def from_files(
        cls,
        meta_dir: str,
        scene: str,
        scene_dataset: str = "mp3d",
        graph_file: str = "graph.pkl",
        grid_size: float = 1.0,
        transform: bool = True,
    ) -> "GraphScene":
        """Load points.txt + graph.pkl in the reference's SoundSpaces layout
        (habitat_audio/utils.py:7-63). graph.pkl is a pickled networkx graph;
        adjacency order is preserved for movement-rule parity."""
        parent = os.path.join(meta_dir, scene)
        points_data = np.loadtxt(
            os.path.join(parent, "points.txt"), delimiter="\t"
        )
        if transform:
            if scene_dataset == "mp3d":
                pts = np.stack(
                    [points_data[:, 1], points_data[:, 3] - 1.5, -points_data[:, 2]],
                    axis=1,
                )
            elif scene_dataset == "replica":
                pts = np.stack(
                    [
                        points_data[:, 1],
                        points_data[:, 3] - 1.5528907,
                        -points_data[:, 2],
                    ],
                    axis=1,
                )
            else:
                raise NotImplementedError(scene_dataset)
        else:
            pts = points_data[:, 1:4]

        with open(os.path.join(parent, graph_file), "rb") as f:
            graph = pickle.load(f)
        # networkx Graph: graph[node] preserves insertion order
        neighbors = [list(graph[i]) for i in range(len(pts))]
        # node positions from the graph override raw points where present
        for i in range(len(pts)):
            if "point" in graph.nodes[i]:
                pts[i] = graph.nodes[i]["point"]
        out = cls(scene, pts, neighbors, grid_size=grid_size)
        # file-backed (real Matterport) scenes route BFS/movement through the
        # C++ walker — the habitat-sim replacement's production call site;
        # degrades to the numpy path when the toolchain is absent
        out.attach_native()
        return out

    @classmethod
    def grid(
        cls,
        name: str,
        rows: int,
        cols: int,
        grid_size: float = 1.0,
        height: float = 0.0,
    ) -> "GraphScene":
        """Synthetic rows x cols 4-connected grid (test fixture). Node id =
        r * cols + c, x = c * grid_size, z = r * grid_size."""
        positions = np.zeros((rows * cols, 3))
        neighbors: List[List[int]] = []
        for r in range(rows):
            for c in range(cols):
                positions[r * cols + c] = (c * grid_size, height, r * grid_size)
        for r in range(rows):
            for c in range(cols):
                ns = []
                for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < rows and 0 <= cc < cols:
                        ns.append(rr * cols + cc)
                neighbors.append(ns)
        return cls(name, positions, neighbors, grid_size=grid_size)
