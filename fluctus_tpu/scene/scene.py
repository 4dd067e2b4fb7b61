"""Scene container: triangles, materials, textures, env map.

Equivalent of src/scene.hpp / scene.cpp: dispatches loaders by extension
(loadModel, scene.cpp:59-120), owns the material list (slot 0 = default
material), deduplicates textures by name (tryImportTexture, scene.cpp:333-349)
and carries the multi-model ``.sc.json`` scene-file format
(loadSceneFile, scene.cpp:864-897).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import List, Optional

import numpy as np

from .material import HostMaterial, default_material, materials_to_soa
from .texture import HostTexture, pack_atlas


@dataclasses.dataclass
class ModelTransform:
    """Per-model scale + translation for .sc.json entries."""
    scale: float = 1.0
    translation: tuple = (0.0, 0.0, 0.0)

    def apply(self, p: np.ndarray) -> np.ndarray:
        return p * self.scale + np.asarray(self.translation, np.float32)


class Scene:
    def __init__(self):
        self.materials: List[HostMaterial] = [default_material()]
        self.material_types: int = self.materials[0].type
        self.textures: List[HostTexture] = []
        self._tri_chunks = []  # (p [M,3,3], n [M,3,3], t [M,3,2], matId [M])
        self.envmap = None
        self.hash: str = ""
        self.camera_override = None  # set by formats that carry a camera

    # -- geometry -----------------------------------------------------------
    def append_triangles(self, p, n, t, mat_id):
        self._tri_chunks.append((np.asarray(p, np.float32),
                                 np.asarray(n, np.float32),
                                 np.asarray(t, np.float32),
                                 np.asarray(mat_id, np.int32)))

    @property
    def num_triangles(self) -> int:
        return sum(c[0].shape[0] for c in self._tri_chunks)

    def triangle_arrays(self):
        """Returns (positions [M,3,3], normals [M,3,3], uvs [M,3,2], matId [M])."""
        if not self._tri_chunks:
            z = np.zeros((0, 3, 3), np.float32)
            return z, z, np.zeros((0, 3, 2), np.float32), np.zeros(0, np.int32)
        ps = np.concatenate([c[0] for c in self._tri_chunks])
        ns = np.concatenate([c[1] for c in self._tri_chunks])
        ts = np.concatenate([c[2] for c in self._tri_chunks])
        ms = np.concatenate([c[3] for c in self._tri_chunks])
        return ps, ns, ts, ms

    # -- materials / textures -----------------------------------------------
    def add_material(self, m: HostMaterial):
        self.materials.append(m)
        self.material_types |= m.type

    def try_import_texture(self, folder: str, name: str) -> int:
        """Dedup-by-name texture import (scene.cpp:333-349). Returns index
        into self.textures, or -1."""
        if not name:
            return -1
        name = name.replace("\\", "/")
        for i, t in enumerate(self.textures):
            if t.name == name:
                return i
        path = os.path.join(folder, name)
        if not os.path.exists(path):
            # also try name as-is (absolute or relative to cwd)
            if os.path.exists(name):
                path = name
            else:
                return -1
        try:
            tex = HostTexture(path, name)
        except Exception as e:  # unreadable texture -> no texture
            print(f"texture load failed for {path}: {e}")
            return -1
        self.textures.append(tex)
        return len(self.textures) - 1

    # -- env map --------------------------------------------------------------
    def load_env_map(self, filename: str):
        from ..envmap import EnvironmentMap
        self.envmap = EnvironmentMap(filename)

    def set_env_map(self, envmap):
        self.envmap = envmap

    # -- loading ------------------------------------------------------------
    def load_model(self, filename: str, transform: Optional[ModelTransform] = None):
        """Extension dispatch, as scene.cpp:59-120."""
        if filename.endswith(".obj"):
            from .obj_loader import load_obj
            load_obj(filename, self, transform)
        elif filename.endswith(".ply"):
            from .ply_loader import load_ply
            load_ply(filename, self, transform)
        elif filename.endswith(".pbrt"):
            from .pbrt_loader import load_pbrt
            # binary parse cache (.pbf analogue, scene.cpp:486-519) — only
            # for a whole-scene load into a fresh container
            fresh = (transform is None and self.num_triangles == 0
                     and len(self.materials) == 1)
            h = file_hash(filename) if fresh else ""
            from . import pbrt_cache
            if not (fresh and pbrt_cache.load_cache(filename, h, self)):
                load_pbrt(filename, self, transform)
                if fresh:
                    pbrt_cache.save_cache(filename, h, self)
        elif filename.endswith(".sc.json"):
            self.load_scene_file(filename)
            if transform is None:
                # the BVH/MXU caches key on this hash, and the baked
                # tables depend on the REFERENCED models' geometry — a
                # json-only hash would serve stale caches after an .obj
                # edit. Chain the referenced files' content hashes in.
                folder = os.path.dirname(filename)
                h = hashlib.blake2b(file_hash(filename).encode(),
                                    digest_size=8)
                with open(filename) as f:
                    for info in json.load(f):
                        sub = info["file"]
                        path = sub if os.path.isabs(sub) \
                            else os.path.join(folder, sub)
                        h.update(file_hash(path).encode())
                self.hash = str(int.from_bytes(h.digest(), "little"))
            return
        else:
            raise ValueError(f"unknown scene format: {filename}")
        if transform is None:
            self.hash = file_hash(filename)

    def load_scene_file(self, filename: str):
        """Multi-model scene file (scene.cpp:864-897). Repeated entries of
        the same model file are INSTANCED: parsed once, then re-appended
        with the entry's transform re-applied (ModelTransform is uniform
        scale + translation, so the first instance's chunks are exactly
        retransformable) and the materials/textures shared — a 20-instance
        composition costs one parse instead of twenty.

        Entries may carry ``"skipMaterials": [name, ...]`` — triangles
        whose material name is listed are dropped for that instance (an
        extension over the reference format: lets compositions strip e.g.
        per-model room shells; tools/make_bigscene.py --open). Instancing
        reuse requires an identical skip set; a differing set re-parses
        the model.

        Entries may also carry ``"materials": {name: {...}}`` — a
        per-instance material override block (second extension; the
        reference format has no per-instance materials). Overridden
        materials are CLONED so other instances keep the original rows;
        the geometry is still instanced. Override keys mirror MTL:
        Kd/Ks/Ke/Kt (3-lists), Ns (phong exponent, remapped to GGX alpha
        like the loader, scene.cpp:13-16), Ni, d, shader (explicit BXDF
        name), map_Kd/map_Ks/map_N (texture path relative to the
        .sc.json). Without an explicit shader the type is re-inferred
        from the new parameters (scene.cpp:271-323 heuristics)."""
        folder = os.path.dirname(filename)
        with open(filename) as f:
            scene_list = json.load(f)
        seen = {}   # (path, skip set) -> (chunk range, first transform)
        for info in scene_list:
            tr = ModelTransform()
            if "scale" in info:
                tr.scale = float(info["scale"])
            if "translation" in info and len(info["translation"]) == 3:
                tr.translation = tuple(info["translation"])
            sub = info["file"]
            path = sub if os.path.isabs(sub) else os.path.join(folder, sub)
            skip = frozenset(info.get("skipMaterials", []))
            overrides = info.get("materials") or {}
            if (path, skip) in seen:
                # pristine (pre-override) material ids key the override
                # lookup — instance #1 may have remapped its own chunks
                (c0, c1), tr0, pristine = seen[(path, skip)]
                lut = self._override_materials(pristine, overrides, folder)
                off0 = np.asarray(tr0.translation, np.float32)
                off = np.asarray(tr.translation, np.float32)
                s = np.float32(tr.scale / tr0.scale)
                for (p0, n0, t0, _), m0 in zip(self._tri_chunks[c0:c1],
                                               pristine):
                    self.append_triangles((p0 - off0) * s + off, n0, t0,
                                          lut[m0] if lut is not None else m0)
            else:
                c0 = len(self._tri_chunks)
                self.load_model(path, tr)
                c1 = len(self._tri_chunks)
                if skip:
                    names = np.array([m.name or "" for m in self.materials])
                    for k in range(c0, c1):
                        p0, n0, t0, m0 = self._tri_chunks[k]
                        keep = ~np.isin(names[m0], list(skip))
                        self._tri_chunks[k] = (p0[keep], n0[keep],
                                               t0[keep], m0[keep])
                pristine = [c[3] for c in self._tri_chunks[c0:c1]]
                seen[(path, skip)] = ((c0, c1), tr, pristine)
                lut = self._override_materials(pristine, overrides, folder)
                if lut is not None:
                    for k, m0 in zip(range(c0, c1), pristine):
                        p0, n0, t0, _ = self._tri_chunks[k]
                        self._tri_chunks[k] = (p0, n0, t0, lut[m0])

    def _override_materials(self, pristine_ids, overrides, folder):
        """Clone + override the material rows referenced by the given
        chunks' pristine id arrays per a .sc.json ``materials`` block.
        Returns an int32 lut (old id -> id to use) or None when no
        override applies."""
        if not overrides:
            return None
        from .. import bxdf_types as bx
        from .material import infer_type, to_roughness
        used = sorted({int(u) for m0 in pristine_ids
                       for u in np.unique(m0)})
        if not used:
            return None
        lut = np.arange(max(used) + 1, dtype=np.int32)
        hit = False
        for mid in used:
            src = self.materials[mid]
            o = overrides.get(src.name)
            if not o:
                continue
            hit = True
            m = dataclasses.replace(src)
            for k3 in ("Kd", "Ks", "Ke", "Kt"):
                if k3 in o:
                    setattr(m, k3, tuple(float(v) for v in o[k3]))
            if "Ns" in o:
                m.Ns = float(o["Ns"])      # phong exponent; remapped below
            if "Ni" in o:
                m.Ni = float(o["Ni"])
            if "d" in o:
                m.d = float(o["d"])
            for mk in ("map_Kd", "map_Ks", "map_N"):
                if mk in o:
                    setattr(m, mk,
                            self.try_import_texture(folder, o[mk]))
            if "shader" in o:
                t, ok = bx.parse_shader_type(o["shader"])
                if not ok:
                    raise ValueError(f"unknown shader {o['shader']!r}")
                m.type = t
            else:
                # re-infer from the new params; like the MTL loader,
                # inference sees the PRE-remap phong exponent
                # (obj_loader.finish: infer_type then to_roughness)
                m.type = bx.BXDF_DIFFUSE
                m.type = infer_type(m, False)
            if "Ns" in o:
                m.Ns = to_roughness(m.Ns)
            m.name = f"{src.name}@{len(self.materials)}"
            lut[mid] = len(self.materials)
            self.add_material(m)
        return lut if hit else None

    # -- device upload ------------------------------------------------------
    def device_materials(self):
        return materials_to_soa(self.materials)

    def device_textures(self):
        return pack_atlas(self.textures).with_material_usage(self.materials)

    def scene_bounds(self):
        p, _, _, _ = self.triangle_arrays()
        if p.size == 0:
            return np.zeros(3, np.float32), np.zeros(3, np.float32)
        flat = p.reshape(-1, 3)
        return flat.min(axis=0), flat.max(axis=0)

    def world_radius(self) -> float:
        """Half the scene AABB diagonal (tracer.cpp:77-79)."""
        lo, hi = self.scene_bounds()
        return float(np.linalg.norm(hi - lo) * 0.5)


def file_hash(filename: str) -> str:
    """Content hash used to key BVH/state caches. The reference uses
    xxhash64 (utils.cpp:146-163); we use blake2b-64 — same role, our caches
    are namespaced separately so there is no format collision."""
    h = hashlib.blake2b(digest_size=8)
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return str(int.from_bytes(h.digest(), "little"))
