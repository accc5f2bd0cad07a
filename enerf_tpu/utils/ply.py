"""Minimal PLY vertex reader (the image ships neither trimesh nor plyfile;
the reference loads ``background.ply`` point clouds via trimesh,
enerf_outdoor/enerf.py:68). Supports ascii and binary_little_endian with
float32/float64 x,y,z properties."""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

_SIZES = {"float": 4, "float32": 4, "double": 8, "float64": 8,
          "uchar": 1, "uint8": 1, "char": 1, "int8": 1,
          "short": 2, "ushort": 2, "int": 4, "uint": 4, "int32": 4,
          "uint32": 4}
_NP = {"float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
       "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
       "short": "i2", "ushort": "u2", "int": "i4", "uint": "u4",
       "int32": "i4", "uint32": "u4"}


def save_ply_mesh(path: str, vertices: np.ndarray,
                  faces: np.ndarray) -> None:
    """Write a binary_little_endian triangle mesh (the reference exports
    via trimesh, mesh_utils.py:43-45)."""
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(vertices)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(vertices.astype("<f4").tobytes())
        tri = np.empty((len(faces), 13), np.uint8)
        tri[:, 0] = 3
        tri[:, 1:] = faces.astype("<i4").view(np.uint8).reshape(len(faces), 12)
        f.write(tri.tobytes())


def load_ply_vertices(path: str) -> np.ndarray:
    """Returns the (N, 3) float64 x,y,z vertex array."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_verts = 0
        props: List[Tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n_verts = int(cnt)
            elif line.startswith("property") and in_vertex:
                parts = line.split()
                props.append((parts[1], parts[2]))  # (type, name)
            elif line == "end_header":
                break

        names = [n for _, n in props]
        if fmt == "ascii":
            data = np.loadtxt(
                [f.readline() for _ in range(n_verts)], dtype=np.float64)
            data = np.atleast_2d(data)
            cols = [names.index(c) for c in ("x", "y", "z")]
            return data[:, cols]
        if fmt != "binary_little_endian":
            raise NotImplementedError(f"PLY format {fmt}")
        dtype = np.dtype([(n, "<" + _NP[t]) for t, n in props])
        raw = np.frombuffer(f.read(n_verts * dtype.itemsize), dtype=dtype,
                            count=n_verts)
        return np.stack([raw["x"], raw["y"], raw["z"]],
                        axis=-1).astype(np.float64)
