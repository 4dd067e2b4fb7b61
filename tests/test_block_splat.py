"""Dense per-group splat kernel (core/block_splat.py) — math checks of the
interpret/CPU reference path, which tools/check_block_splat.py then holds
the TPU Pallas kernels to. The API is channel-major (data [C,n],
film [C,G*Pk]) — see the module docstring for the tiling rationale."""

import numpy as np
import jax.numpy as jnp

from fluctus_tpu.core import block_splat as bs


def _np_ref(local, data_t, film_t, g, s, pk, remaining=None):
    """Capped semantics (block_splat docstring): each pixel admits its
    first min(count, budget) candidates by lane order."""
    out = film_t.copy()
    cand = {}
    for i in range(local.shape[0]):
        l = int(local[i])
        if l < 0:
            continue
        cand.setdefault((i // s) * pk + l, []).append(i)
    for p, lanes in cand.items():
        admit = sorted(lanes)
        if remaining is not None:
            admit = admit[:int(remaining[0, p])]
        for i in admit:
            out[:, p] += data_t[:, i]
    return out


def test_plan():
    s, p, pk = bs.plan(1920 * 1080, 1 << 20, 4096)
    assert s == 256 and p == 507 and pk == 512
    # short/empty tail groups are allowed (integrator clamps ring len >= 1)
    s, p, pk = bs.plan(1920 * 1080, 1 << 20, 1024)
    assert s == 1024 and p == 2025 and pk == 2048


def test_splat_uncapped():
    rng = np.random.default_rng(0)
    g, s, pk, c = 8, 32, 128, 4
    local = rng.integers(-1, 100, g * s).astype(np.int32)
    data = rng.normal(size=(c, g * s)).astype(np.float32)
    data[:, local < 0] = 0.0
    film = rng.normal(size=(c, g * pk)).astype(np.float32)
    out = np.asarray(bs.splat(jnp.asarray(local), jnp.asarray(data),
                              jnp.asarray(film), groups=g, interpret=True))
    ref = _np_ref(local, data, film, g, s, pk)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)


def test_splat_capped_exact():
    rng = np.random.default_rng(1)
    g, s, pk, c = 4, 64, 128, 4
    # many collisions: few pixels per group
    local = rng.integers(0, 5, g * s).astype(np.int32)
    local[rng.random(g * s) < 0.2] = -1
    data = np.ones((c, g * s), np.float32)
    data[:, local < 0] = 0.0
    film = np.zeros((c, g * pk), np.float32)
    remaining = rng.integers(0, 4, (1, g * pk)).astype(np.float32)
    out = np.asarray(bs.splat(jnp.asarray(local), jnp.asarray(data),
                              jnp.asarray(film), groups=g,
                              remaining=jnp.asarray(remaining),
                              interpret=True))
    ref = _np_ref(local, data, film, g, s, pk, remaining)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)
    # no pixel exceeds its budget, and over-subscribed pixels hit it
    # EXACTLY (multi-admit: min(count, budget) admitted per segment)
    got = out[3]
    cap = remaining[0]
    cnt = np.zeros(g * pk)
    for i in range(g * s):
        if local[i] >= 0:
            cnt[(i // s) * pk + local[i]] += 1
    assert (got <= cap + 1e-6).all()
    over = cnt >= cap
    np.testing.assert_allclose(got[over], cap[over], atol=1e-6)


def test_fetch():
    rng = np.random.default_rng(2)
    g, s, pk = 4, 32, 128
    local = rng.integers(0, pk, g * s).astype(np.int32)
    table = rng.normal(size=(1, g * pk)).astype(np.float32)
    out = np.asarray(bs.fetch(jnp.asarray(local), jnp.asarray(table),
                              groups=g, interpret=True))
    ref = np.array([table[0, (i // s) * pk + local[i]]
                    for i in range(g * s)])
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_splat_kernel_body_matches_reference():
    """The REAL Pallas kernel bodies (uncapped + capped multi-admit rank
    matmul) under the Pallas interpreter vs the independent segment-sum
    reference — CPU coverage of the kernel code itself, not just the
    reference path."""
    rng = np.random.default_rng(3)
    g, s, pk, c = 4, 64, 128, 4
    local = rng.integers(0, 6, g * s).astype(np.int32)
    local[rng.random(g * s) < 0.3] = -1
    data = rng.normal(size=(c, g * s)).astype(np.float32)
    data[3] = 1.0                        # weight channel: real splats are 1.0
    data[:, local < 0] = 0.0
    film = rng.normal(size=(c, g * pk)).astype(np.float32)
    remaining = rng.integers(0, 5, (1, g * pk)).astype(np.float32)

    jl, jd, jf, jr = map(jnp.asarray, (local, data, film, remaining))
    for rem in (None, jr):
        got = np.asarray(bs.splat(jl, jd, jf, groups=g, remaining=rem,
                                  pallas_interpret=True))
        ref = np.asarray(bs.splat(jl, jd, jf, groups=g, remaining=rem,
                                  interpret=True))
        # 2-pass bf16 hi/lo products: ~4e-6 relative; the weight channel
        # (1.0 splats) is exact — the spp accounting depends on it
        np.testing.assert_allclose(got, ref, rtol=0, atol=3e-4)
        np.testing.assert_array_equal(got[3] - film[3], ref[3] - film[3])
