"""The sort-trace-unsort wrapper must be order-invariant."""

import numpy as np
import jax.numpy as jnp

from fluctus_tpu.accel import mxu_trace as mt


def test_sorted_trace_restores_order(monkeypatch):
    b = 4096
    rng = np.random.default_rng(0)
    o = rng.standard_normal((b, 3)).astype(np.float32)
    d = rng.standard_normal((b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o4 = jnp.asarray(np.concatenate([o, np.ones((b, 1), np.float32)], 1))
    d4 = jnp.asarray(np.concatenate([d, np.zeros((b, 1), np.float32)], 1))
    tm = jnp.full((b, 1), 1e30, jnp.float32)

    # fake _trace: t encodes the ray's own ox, i encodes quantized dx —
    # uniquely identifies each ray so ordering bugs show up
    def fake_trace(o4s, d4s, tmax, arrays, static, any_hit, rt, interp):
        t = o4s[:, 0:1] * 2.0 + 1000.0
        i = jnp.abs(d4s[:, 0:1] * 1e6).astype(jnp.int32)
        return t, i

    monkeypatch.setattr(mt, "_trace", fake_trace)

    class FakeScene:
        tx = ty = tz = 0    # non-None: _trace is monkeypatched anyway
        t12 = None          # forces the rays-on-sublanes dispatch
        txy_t = None
        fine_box = None
        sub_box = None
        sc_box = None
        cluster_box = jnp.asarray([[-1.0, -1, -1, 1, 1, 1, 0, 0]])
        n_clusters = 1
        cluster_size = 128

    t, i = mt._sorted_trace(o4, d4, tm, FakeScene(), False, 512, False)
    np.testing.assert_allclose(np.asarray(t[:, 0]), o[:, 0] * 2.0 + 1000.0,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i[:, 0]),
                                  np.abs(d[:, 0] * 1e6).astype(np.int32))


def test_sort_key_locality():
    d = np.array([[1, 0, 0], [0.99, 0.1, 0], [-1, 0, 0]], np.float32)
    d4 = jnp.asarray(np.concatenate([d, np.zeros((3, 1), np.float32)], 1))
    o4 = jnp.zeros((3, 4), jnp.float32)
    lo = jnp.asarray([-1.0, -1, -1])
    hi = jnp.asarray([1.0, 1, 1])
    kmaj, kmin = mt._sort_key(o4, d4, lo, hi)
    kmaj, kmin = np.asarray(kmaj), np.asarray(kmin)
    # same octant/origin -> same major key; nearby directions -> closer minor
    assert kmaj[0] == kmaj[1] and kmaj[0] != kmaj[2]
    assert abs(int(kmin[0]) - int(kmin[1])) < abs(int(kmin[0]) - int(kmin[2]))


def test_shadow_key_override(monkeypatch):
    """FLT_KEY_SHADOW lets shadow (any-hit) traces keep a coherence sort
    while extension rays run in lane order (FLT_KEY=none)."""
    import jax.numpy as jnp
    import numpy as np
    from fluctus_tpu.accel import mxu_trace as mt

    calls = []

    def fake_dispatch(o4s, d4s, tmax, scene, any_hit, rt, interp):
        # record whether rays arrived in original lane order (no sort):
        # lane 0's ox survives in slot 0 only when unsorted
        calls.append((bool(any_hit), float(np.asarray(o4s)[0, 0])))
        n = o4s.shape[0]
        return (jnp.full((n, 1), mt.F32_MAX, jnp.float32),
                jnp.full((n, 1), -1, jnp.int32))

    monkeypatch.setattr(mt, "_dispatch_trace", fake_dispatch)
    monkeypatch.setenv("FLT_KEY", "none")
    monkeypatch.setenv("FLT_KEY_SHADOW", "oct")

    b = 1024
    rng = np.random.default_rng(3)
    o = rng.standard_normal((b, 3)).astype(np.float32)
    # force a nontrivial sort: descending x, mixed signs in d
    o[:, 0] = np.linspace(5.0, -5.0, b, dtype=np.float32)
    d = rng.standard_normal((b, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o4 = jnp.asarray(np.concatenate([o, np.ones((b, 1), np.float32)], 1))
    d4 = jnp.asarray(np.concatenate([d, np.zeros((b, 1), np.float32)], 1))
    tm = jnp.full((b, 1), 1e30, jnp.float32)

    class FakeScene:
        cluster_box = jnp.asarray([[-9e4, -9e4, -9e4, 9e4, 9e4, 9e4, 0, 0]])

    mt._sorted_trace(o4, d4, tm, FakeScene(), False, 512, False)  # ext
    mt._sorted_trace(o4, d4, tm, FakeScene(), True, 512, False)   # shadow
    (ext_anyhit, ext_first), (sh_anyhit, sh_first) = calls
    assert not ext_anyhit and sh_anyhit
    # ext kept lane order (first ox = 5.0); shadow got reordered
    assert abs(ext_first - 5.0) < 1e-5
    assert abs(sh_first - 5.0) > 1e-3
