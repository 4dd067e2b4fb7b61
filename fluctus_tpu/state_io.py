"""Render state save/load — byte-compatible with the reference's
``data/states/state_<hash>.dat`` format (Tracer::iterateStateItems,
tracer.cpp:995-1054): camera rotation/speed/fov/DoF/basis, area light,
env strength, sampling flags, post-processing. A state file written by the
reference renders identically here (fovSCALE recomputed on read, like the
reference does).
"""

from __future__ import annotations

import math
import os
import struct

from .settings import Settings


_F = "<f"
_U = "<I"


class _Stream:
    def __init__(self, data: bytes = b""):
        self.data = bytearray(data)
        self.off = 0

    def rf(self):
        v = struct.unpack_from(_F, self.data, self.off)[0]
        self.off += 4
        return v

    def ru(self):
        v = struct.unpack_from(_U, self.data, self.off)[0]
        self.off += 4
        return v

    def wf(self, v):
        self.data += struct.pack(_F, float(v))

    def wu(self, v):
        self.data += struct.pack(_U, int(v))

    def wvec(self, v):
        for c in v:
            self.wf(c)

    def rvec(self):
        return (self.rf(), self.rf(), self.rf())


def state_path(data_dir: str, scene_hash: str) -> str:
    return os.path.join(data_dir, "states", f"state_{scene_hash}.dat")


def save_state(path: str, s: Settings, env_map_strength: float = 1.0,
               exposure: float = 1.0):
    """Field order exactly as tracer.cpp:1007-1046."""
    st = _Stream()
    c, a = s.camera, s.area_light
    st.wf(c.camera_rotation[0])
    st.wf(c.camera_rotation[1])
    st.wf(c.camera_speed)
    st.wf(c.fov)
    st.wf(c.focal_dist)
    st.wf(c.aperture_size)
    st.wvec(c.dir)
    st.wvec(c.pos)
    st.wvec(c.right)
    st.wvec(c.up)
    st.wvec(a.N)
    st.wvec(a.pos)
    st.wvec(a.right)
    st.wvec(a.up)
    st.wvec(a.E)
    st.wf(a.size[0])
    st.wf(a.size[1])
    st.wf(env_map_strength)
    st.wu(s.max_path_depth)
    st.wu(int(s.use_area_light))
    st.wu(int(s.use_env_map))
    st.wu(int(s.sample_explicit))
    st.wu(int(s.sample_implicit))
    st.wu(int(s.use_russian_roulette))
    st.wf(exposure)
    st.wu(s.tonemap)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(st.data))


def load_state(path: str, s: Settings):
    """Returns (env_map_strength, exposure); mutates s in place."""
    with open(path, "rb") as f:
        st = _Stream(f.read())
    c, a = s.camera, s.area_light
    c.camera_rotation = (st.rf(), st.rf())
    c.camera_speed = st.rf()
    c.fov = st.rf()
    c.focal_dist = st.rf()
    c.aperture_size = st.rf()
    c.dir = st.rvec()
    c.pos = st.rvec()
    c.right = st.rvec()
    c.up = st.rvec()
    a.N = st.rvec()
    a.pos = st.rvec()
    a.right = st.rvec()
    a.up = st.rvec()
    a.E = st.rvec()
    a.size = (st.rf(), st.rf())
    env_map_strength = st.rf()
    s.max_path_depth = st.ru()
    s.use_area_light = bool(st.ru())
    s.use_env_map = bool(st.ru())
    s.sample_explicit = bool(st.ru())
    s.sample_implicit = bool(st.ru())
    s.use_russian_roulette = bool(st.ru())
    exposure = st.rf()
    s.tonemap = st.ru()
    return env_map_strength, exposure
