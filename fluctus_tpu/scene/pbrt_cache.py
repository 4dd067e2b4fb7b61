"""Binary cache for parsed PBRT scenes — the role of the reference's .pbf
cache (src/scene.cpp:486-519: pbrt-parser re-exports the parse to a binary
it can mmap next time). The text grammar parse is the slow part (seconds to
minutes at measure-one scale); the cache stores the parse RESULT (triangle
soup + materials + texture references + camera) as one .npz next to the
source, keyed by the source file's content hash, so a second load is pure
array I/O.

Texture image files are re-read on cache load (PIL decode is fast and the
images may change independently of the .pbrt)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

CACHE_VERSION = 1
SUFFIX = ".flc.npz"          # "fluctus cache"


def cache_path(pbrt_path: str) -> str:
    return pbrt_path + SUFFIX


def save_cache(pbrt_path: str, source_hash: str, scene) -> None:
    """Serialize scene state produced by load_pbrt on a fresh Scene."""
    p, n, t, mid = scene.triangle_arrays()
    mats = scene.materials
    num = np.zeros((len(mats), 16), np.float32)
    names = []
    for i, m in enumerate(mats):
        num[i, 0:3] = m.Kd
        num[i, 3:6] = m.Ks
        num[i, 6:9] = m.Ke
        num[i, 9:12] = m.Kt
        num[i, 12] = m.Ns
        num[i, 13] = m.Ni
        num[i, 14] = m.d
        num[i, 15] = 0.0
        names.append(m.name)
    maps = np.array([[m.map_Kd, m.map_Ks, m.map_N, m.type] for m in mats],
                    np.int32)
    tex_names = np.array([tx.name for tx in scene.textures])
    # remember where each texture was actually found, for the reload
    tex_paths = np.array([getattr(tx, "path", tx.name)
                          for tx in scene.textures])
    cam = np.zeros(0, np.float32)
    if scene.camera_override is not None:
        c = scene.camera_override
        cam = np.asarray(list(c.pos) + list(c.dir) + list(c.up)
                         + list(c.right) + [c.fov], np.float32)
    try:
        np.savez_compressed(
            cache_path(pbrt_path), version=np.int32(CACHE_VERSION),
            source_hash=np.asarray(source_hash),
            positions=p, normals=n, uvs=t, mat_ids=mid,
            mat_num=num, mat_maps=maps,
            mat_names=np.array(names), tex_names=tex_names,
            tex_paths=tex_paths, camera=cam,
            material_types=np.int32(scene.material_types))
    except OSError as e:  # read-only source dir -> no cache, not an error
        print(f"pbrt cache write skipped: {e}")


def load_cache(pbrt_path: str, source_hash: str, scene) -> bool:
    """Populate a fresh Scene from the cache. False on miss/stale."""
    path = cache_path(pbrt_path)
    if not os.path.exists(path):
        return False
    try:
        z = np.load(path, allow_pickle=False)
        if int(z["version"]) != CACHE_VERSION or \
                str(z["source_hash"]) != source_hash:
            return False
        from .material import HostMaterial
        from .texture import HostTexture

        mats = []
        num = z["mat_num"]
        maps = z["mat_maps"]
        names = z["mat_names"]
        for i in range(num.shape[0]):
            mats.append(HostMaterial(
                Kd=tuple(num[i, 0:3]), Ks=tuple(num[i, 3:6]),
                Ke=tuple(num[i, 6:9]), Kt=tuple(num[i, 9:12]),
                Ns=float(num[i, 12]), Ni=float(num[i, 13]),
                d=float(num[i, 14]),
                map_Kd=int(maps[i, 0]), map_Ks=int(maps[i, 1]),
                map_N=int(maps[i, 2]), type=int(maps[i, 3]),
                name=str(names[i])))

        textures = []
        for name, tpath in zip(z["tex_names"], z["tex_paths"]):
            textures.append(HostTexture(str(tpath), str(name)))

        scene.materials = mats
        scene.material_types = int(z["material_types"])
        scene.textures = textures
        scene._tri_chunks = [(z["positions"], z["normals"], z["uvs"],
                              z["mat_ids"])]
        cam = z["camera"]
        if cam.size == 13:
            c = type("Cam", (), {})()
            c.pos = tuple(cam[0:3])
            c.dir = tuple(cam[3:6])
            c.up = tuple(cam[6:9])
            c.right = tuple(cam[9:12])
            c.fov = float(cam[12])
            scene.camera_override = c
        return True
    except Exception as e:
        print(f"pbrt cache read failed ({e}); re-parsing")
        return False