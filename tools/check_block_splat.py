#!/usr/bin/env python
"""TPU check for the dense per-group splat kernels (core/block_splat.py):

1. Pallas splat/fetch vs the interpret (segment_sum) reference on random
   data — near-equality expected (the 2-pass bf16 hi/lo matmul carries
   ~17 mantissa bits => ~4e-6 relative, far below render noise; the
   weight channel is exact since splat weights are 1.0).
2. End-to-end: egyptcat at low res, block ring ON vs OFF, exact-spp —
   both must reach the identical spp array and statistically matching
   films (different pixel->lane assignment means different sample sets,
   so the gate is RMSE at the noise floor, not bit equality).

Run on real TPU: python tools/check_block_splat.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from fluctus_tpu.core import block_splat as bs

rng = np.random.default_rng(0)

# --- 1. kernel vs interpret ------------------------------------------------
g, s, pk, c = 256, 512, 512, 4
n = g * s
local = rng.integers(-1, pk, n).astype(np.int32)
data = rng.normal(size=(c, n)).astype(np.float32)
data[:, local < 0] = 0.0
film = rng.normal(size=(c, g * pk)).astype(np.float32)
remaining = rng.integers(0, 3, (1, g * pk)).astype(np.float32)

jl, jd, jf, jr = map(jnp.asarray, (local, data, film, remaining))

t0 = time.time()
out_k = np.asarray(bs.splat(jl, jd, jf, groups=g))
print("uncapped pallas (incl compile)", time.time() - t0)
out_i = np.asarray(bs.splat(jl, jd, jf, groups=g, interpret=True))
err = np.abs(out_k - out_i).max()
print("uncapped splat max abs diff", err)
assert err < 3e-4, err   # 2-pass bf16 hi/lo (see module docstring)

t0 = time.time()
cap_k = np.asarray(bs.splat(jl, jd, jf, groups=g, remaining=jr))
print("capped pallas (incl compile)", time.time() - t0)
cap_i = np.asarray(bs.splat(jl, jd, jf, groups=g, remaining=jr,
                            interpret=True))
err = np.abs(cap_k - cap_i).max()
print("capped splat max abs diff", err)
assert err < 3e-4, err

tbl = rng.normal(size=(1, g * pk)).astype(np.float32)
loc2 = rng.integers(0, pk, n).astype(np.int32)
f_k = np.asarray(bs.fetch(jnp.asarray(loc2), jnp.asarray(tbl), groups=g))
f_i = np.asarray(bs.fetch(jnp.asarray(loc2), jnp.asarray(tbl), groups=g,
                          interpret=True))
err = np.abs(f_k - f_i).max()
print("fetch max abs diff", err)
assert err == 0.0, err
print("KERNEL PARITY OK")

# --- timing at bench shape (1080p film, 1M-lane pool, groups=4096) ---------
gp = 4096
sp_, p_, pkp = bs.plan(1920 * 1080, 1 << 20, gp)
nl = gp * sp_
jl2 = jnp.asarray(rng.integers(-1, pkp, nl).astype(np.int32))
jd2 = jnp.asarray(rng.normal(size=(c, nl)).astype(np.float32))
jf2 = jnp.asarray(np.zeros((c, gp * pkp), np.float32))
out = bs.splat(jl2, jd2, jf2, groups=gp)
float(out[0, 0])
t0 = time.time()
for _ in range(10):
    out = bs.splat(jl2, jd2, out, groups=gp)
float(out[0, 0])
print(f"uncapped splat steady-state: {(time.time()-t0)/10*1e3:.2f} ms "
      f"@{nl} lanes, {gp * pkp} px slots")

# --- 2. end-to-end ---------------------------------------------------------
from fluctus_tpu.renderer import Renderer
from fluctus_tpu.settings import Settings

SCENE = "/root/reference/assets/egyptcat/egyptcat.obj"
ENV = "/root/reference/assets/env_maps/night.hdr"
W, H, SPP = 320, 180, 32


def run(block):
    os.environ["FLT_BLOCK_RING"] = "1" if block else "0"
    s = Settings()
    s.use_env_map = True
    s.wf_buffer_size = 1 << 17
    r = Renderer(W, H, settings=s, data_dir="data")
    r.load_scene(SCENE, env_map=ENV)
    r.render_single_wavefront(spp=SPP)
    film = r.film
    spp = np.asarray(r._wf_state.spp)
    from fluctus_tpu.core.integrator_wf import unpad_pixels
    spp = np.asarray(unpad_pixels(jnp.asarray(spp), r._wf_cfg))
    img = r.hdr_image()
    return img, spp


img_b, spp_b = run(True)
img_f, spp_f = run(False)
print("spp block:", spp_b.min(), spp_b.max(), " flat:", spp_f.min(),
      spp_f.max())
assert (spp_b == SPP).all(), "block exact-spp cap violated"
assert (spp_f == SPP).all(), "flat exact-spp cap violated"
tm = lambda x: x / (1.0 + x)
rmse = float(np.sqrt(np.mean((tm(img_b) - tm(img_f)) ** 2)))
print("block-vs-flat RMSE (tonemapped)", rmse)
assert rmse < 0.045, rmse   # MC noise floor at 32 spp, disjoint sample sets
print("END-TO-END BLOCK OK")
