"""Wavefront OBJ loading (and writing, for test round-trips).

TPU-native replacement for the reference's model pipeline
(tiny_obj_loader parse -> vertex dedup -> interleaved vertex buffer + 32-bit
index buffer, in ``loadModel()`` of Source/RayTracedShadows.cpp [RECALL;
reference mount was empty at survey time]).

Supported subset: ``v``, ``vn``, ``vt`` (parsed, ignored), ``f`` with any of
the ``v``, ``v/vt``, ``v//vn``, ``v/vt/vn`` forms, negative (relative)
indices, and polygon fan-triangulation. ``usemtl``/``mtllib`` assign flat
per-triangle albedo colors from a small deterministic palette (the reference
samples material diffuse colors / textures; we keep the pipeline texture-free).

Vertices referenced with differing normal indices are deduplicated on the
(position, normal) pair, mirroring the reference's dedup of OBJ multi-index
corners into a single GPU vertex stream.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..scenes import compute_smooth_normals, make_mesh
from ..types import Mesh


def _material_color(name: str) -> np.ndarray:
    """Deterministic pseudo-color per material name (fallback when no
    .mtl file provides a real diffuse color)."""
    h = hashlib.sha256(name.encode()).digest()
    rgb = np.frombuffer(h[:3], dtype=np.uint8).astype(np.float32) / 255.0
    return 0.25 + 0.65 * rgb


def parse_mtl(path: str) -> Dict[str, np.ndarray]:
    """Parse a Wavefront .mtl file -> {material name: Kd diffuse f32[3]}.
    The reference reads the same diffuse colors through tiny_obj_loader
    [RECALL]; unsupported statements are skipped."""
    out: Dict[str, np.ndarray] = {}
    current: Optional[str] = None
    try:
        f = open(path, "r", errors="replace")
    except OSError:
        return out
    with f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if parts[0] == "newmtl" and len(parts) > 1:
                current = parts[1]
                out.setdefault(current, np.full(3, 0.8, np.float32))
            elif parts[0] == "Kd" and current is not None and len(parts) >= 4:
                out[current] = np.asarray(
                    [float(parts[1]), float(parts[2]), float(parts[3])],
                    np.float32)
    return out


def _material_table(obj_dir: str, mtllibs: List[str]) -> Dict[str, np.ndarray]:
    table: Dict[str, np.ndarray] = {}
    import os
    for lib in mtllibs:
        table.update(parse_mtl(os.path.join(obj_dir, lib)))
    return table


def _resolve_albedo(names: List[Optional[str]], obj_dir: str,
                    mtllibs: List[str]) -> np.ndarray:
    """Per-triangle albedo: real Kd from the mtllib when available, the
    deterministic pseudo-color for unresolved names, flat 0.8 for faces
    with no material at all. Shared by both loaders so the same OBJ renders
    identically regardless of which parser ran."""
    table = _material_table(obj_dir, mtllibs)
    cache: Dict[Optional[str], np.ndarray] = {None: np.full(3, 0.8, np.float32)}
    out = np.empty((len(names), 3), np.float32)
    for i, n in enumerate(names):
        c = cache.get(n)
        if c is None:
            c = table.get(n)
            if c is None:
                c = _material_color(n)
            cache[n] = c
        out[i] = c
    return out


def _mesh_from_raw(pos: np.ndarray, nrm: np.ndarray, tri_pos: np.ndarray,
                   tri_nrm: np.ndarray, tri_mtl: np.ndarray,
                   mtl_names: List[str], mtllibs: List[str],
                   obj_dir: str) -> Mesh:
    """Vectorized corner dedup + normal resolution + material resolution for
    the native parser's raw output."""
    corners = np.stack([tri_pos.reshape(-1),
                        tri_nrm.reshape(-1)], axis=1)
    uniq, inverse = np.unique(corners, axis=0, return_inverse=True)
    indices = inverse.reshape(-1, 3).astype(np.int32)
    vertices = pos[uniq[:, 0]].astype(np.float32)
    have_all_normals = len(nrm) > 0 and (uniq[:, 1] >= 0).all()
    if have_all_normals:
        vn = nrm[np.clip(uniq[:, 1], 0, len(nrm) - 1)].astype(np.float32)
        lens = np.linalg.norm(vn, axis=1, keepdims=True)
        vnormals = np.where(lens > 1e-12, vn / np.maximum(lens, 1e-12),
                            np.array([0, 1, 0], np.float32))
    else:
        vnormals = compute_smooth_normals(vertices, indices)
    names = [mtl_names[k] if 0 <= k < len(mtl_names) else None
             for k in tri_mtl.tolist()]
    albedo = _resolve_albedo(names, obj_dir, mtllibs)
    return Mesh(vertices=vertices, normals=vnormals.astype(np.float32),
                indices=indices, albedo=albedo)


def load_obj(path: str, use_native: bool | None = None) -> Mesh:
    """Load an OBJ mesh. use_native=None tries the C++ parser
    (tpurt/native.py, ~50x faster on large files; flat albedo) and falls
    back to the pure-Python parser (which also assigns per-material
    pseudo-colors)."""
    if use_native is not False:
        import os
        from .. import native
        if native.available():
            try:
                raw = native.load_obj_raw(path)
            except FileNotFoundError:
                raise
            if raw is not None:
                return _mesh_from_raw(*raw,
                                      obj_dir=os.path.dirname(
                                          os.path.abspath(path)))
        if use_native:
            raise RuntimeError("native OBJ parser requested but unavailable")
    return _load_obj_python(path)


def _load_obj_python(path: str) -> Mesh:
    positions: List[Tuple[float, float, float]] = []
    normals: List[Tuple[float, float, float]] = []
    faces: List[Tuple[int, int, int, int, int, int]] = []  # (p0,n0,p1,n1,p2,n2)
    face_mtl: List[Optional[str]] = []
    mtllibs: List[str] = []
    current_mtl: Optional[str] = None

    with open(path, "r", errors="replace") as f:
        for line in f:
            if not line or line[0] in "#\n":
                continue
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "vn":
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "usemtl":
                current_mtl = parts[1] if len(parts) > 1 else None
            elif tag == "mtllib" and len(parts) > 1:
                mtllibs.append(" ".join(parts[1:]))
            elif tag == "f":
                corners = []
                for tok in parts[1:]:
                    fields = tok.split("/")
                    pi = int(fields[0])
                    pi = pi - 1 if pi > 0 else len(positions) + pi
                    ni = -1
                    if len(fields) >= 3 and fields[2]:
                        ni = int(fields[2])
                        ni = ni - 1 if ni > 0 else len(normals) + ni
                    corners.append((pi, ni))
                # Fan triangulation (tiny_obj_loader's default triangulation).
                for k in range(1, len(corners) - 1):
                    (p0, n0), (p1, n1), (p2, n2) = corners[0], corners[k], corners[k + 1]
                    faces.append((p0, n0, p1, n1, p2, n2))
                    face_mtl.append(current_mtl)

    if not faces:
        raise ValueError(f"no faces found in OBJ file: {path}")

    pos = np.asarray(positions, np.float32)
    nrm = np.asarray(normals, np.float32) if normals else np.zeros((0, 3), np.float32)

    # Deduplicate (position index, normal index) corners into final vertices.
    corner_map: Dict[Tuple[int, int], int] = {}
    out_pos: List[np.ndarray] = []
    out_nrm: List[Optional[np.ndarray]] = []
    tri_indices = np.empty((len(faces), 3), np.int32)
    has_any_normal = len(normals) > 0

    for t, (p0, n0, p1, n1, p2, n2) in enumerate(faces):
        for c, (pi, ni) in enumerate(((p0, n0), (p1, n1), (p2, n2))):
            key = (pi, ni if has_any_normal else -1)
            vid = corner_map.get(key)
            if vid is None:
                vid = len(out_pos)
                corner_map[key] = vid
                out_pos.append(pos[pi])
                out_nrm.append(nrm[ni] if (has_any_normal and 0 <= ni < len(nrm)) else None)
            tri_indices[t, c] = vid

    vertices = np.stack(out_pos).astype(np.float32)
    if has_any_normal and all(n is not None for n in out_nrm):
        vnormals = np.stack([n for n in out_nrm]).astype(np.float32)
        lens = np.linalg.norm(vnormals, axis=1, keepdims=True)
        vnormals = np.where(lens > 1e-12, vnormals / np.maximum(lens, 1e-12),
                            np.array([0, 1, 0], np.float32))
    else:
        vnormals = compute_smooth_normals(vertices, tri_indices)

    import os
    albedo = _resolve_albedo(face_mtl,
                             os.path.dirname(os.path.abspath(path)), mtllibs)
    return Mesh(vertices=vertices, normals=vnormals, indices=tri_indices,
                albedo=albedo)


def save_obj(path: str, mesh: Mesh) -> None:
    """Write a mesh as OBJ (v + vn + f v//vn). Used for loader round-trips."""
    v = np.asarray(mesh.vertices)
    n = np.asarray(mesh.normals)
    idx = np.asarray(mesh.indices)
    with open(path, "w") as f:
        f.write("# tpurt OBJ export\n")
        for p in v:
            f.write(f"v {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        for p in n:
            f.write(f"vn {p[0]:.9g} {p[1]:.9g} {p[2]:.9g}\n")
        for a, b, c in idx + 1:
            f.write(f"f {a}//{a} {b}//{b} {c}//{c}\n")
