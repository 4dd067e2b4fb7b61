import jax
import jax.numpy as jnp
import numpy as np

from fluctus_tpu import rng, sampling, vec
from fluctus_tpu.vec import Vec3


def reference_burtle(seed):
    """Scalar reference implementation of src/random.cl:7-15."""
    M = 0xFFFFFFFF
    seed = ((seed ^ 61) ^ (seed >> 16)) & M
    seed = (seed * 9) & M
    seed = (seed ^ (seed >> 4)) & M
    seed = (seed * 0x27D4EB2D) & M
    seed = (seed ^ (seed >> 15)) & M
    return seed


def test_burtle_matches_reference():
    seeds = np.array([0, 1, 2, 1337, 0xDEADBEEF, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(rng.burtle_hash(jnp.asarray(seeds)))
    want = np.array([reference_burtle(int(s)) for s in seeds], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_rand_uniformity():
    seed = jnp.arange(200_000, dtype=jnp.uint32)
    u, seed2 = rng.rand(seed)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    # chi-square over 64 bins
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = ((hist - expected) ** 2 / expected).sum()
    assert chi2 < 64 + 5 * np.sqrt(2 * 64)  # ~5 sigma


def test_ortho_basis():
    n = vec.normalize(Vec3.of(np.random.randn(100), np.random.randn(100),
                              np.random.randn(100)))
    t, b = sampling.make_ortho_basis(n)
    for v in (t, b):
        np.testing.assert_allclose(np.asarray(vec.length(v)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.dot(b, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vec.dot(t, b)), 0.0, atol=1e-5)


def test_cosine_hemisphere():
    n = Vec3.of(jnp.zeros(100_000), jnp.zeros(100_000), jnp.ones(100_000))
    seed = jnp.arange(100_000, dtype=jnp.uint32)
    d, pdf, _ = sampling.cos_sample_hemisphere(n, seed)
    cz = np.asarray(d.z)
    assert (cz >= 0).all()
    np.testing.assert_allclose(np.asarray(pdf), cz / np.pi, atol=1e-5)
    # E[cos theta] for cosine-weighted = 2/3
    assert abs(cz.mean() - 2.0 / 3.0) < 3e-3
    np.testing.assert_allclose(np.asarray(vec.length(d)), 1.0, atol=1e-4)


def test_vec3_ops():
    a = Vec3.of(1.0, 2.0, 3.0)
    b = Vec3.of(4.0, 5.0, 6.0)
    assert float(vec.dot(a, b)) == 32.0
    c = vec.cross(a, b)
    assert (float(c.x), float(c.y), float(c.z)) == (-3.0, 6.0, -3.0)
    r = vec.reflect0(Vec3.of(0.0, -1.0, 0.0), Vec3.of(0.0, 1.0, 0.0))
    np.testing.assert_allclose(np.asarray(r.to_array()), [0.0, 1.0, 0.0], atol=1e-6)


def test_vec3_is_pytree():
    a = Vec3.of(jnp.ones(4), jnp.ones(4), jnp.ones(4))
    leaves = jax.tree_util.tree_leaves(a)
    assert len(leaves) == 3
    doubled = jax.jit(lambda v: v * 2.0)(a)
    np.testing.assert_allclose(np.asarray(doubled.x), 2.0)
