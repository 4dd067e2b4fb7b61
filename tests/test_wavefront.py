import numpy as np
import jax
import jax.numpy as jnp

from fluctus_tpu.core.integrator_wf import wf_reset, wf_segment
from fluctus_tpu.testing import quad_scene, quad_setup


def run_wavefront(scene, params, config, num_tasks, segments):
    state = wf_reset(config, num_tasks,
                     world_radius=float(params.world_radius))
    step = jax.jit(wf_segment, static_argnames=("config", "first_iteration"))
    counters = []
    for _ in range(segments):
        state, cnt = step(scene, params, state, config)
        counters.append(cnt)
    return state, counters


def test_wavefront_furnace_matches_mk():
    """The wavefront integrator must converge to the same image as the
    exact-spp integrator (the two reference integrators share semantics)."""
    scene = quad_scene(kd=0.5)
    params, config = quad_setup(width=16, height=16, max_bounces=3)
    state, counters = run_wavefront(scene, params, config,
                                    num_tasks=2048, segments=120)
    w = np.asarray(state.film.weight)
    assert w.min() > 0, "every pixel must receive samples via the ring"
    img = np.asarray(state.film.color.x) / w
    center = img.reshape(16, 16)[4:12, 4:12]
    expect = 0.5 ** 2.2
    assert abs(center.mean() - expect) / expect < 0.05, center.mean()


def test_wavefront_counters():
    scene = quad_scene(kd=0.5)
    params, config = quad_setup(width=16, height=16, max_bounces=3)
    state, counters = run_wavefront(scene, params, config,
                                    num_tasks=512, segments=10)
    # first segment: every path is fresh (len==0 -> regenerated)
    assert int(counters[0].raygen) == 512
    assert int(counters[0].extension) == 512
    # later segments: paths terminate and regenerate (quad scene paths live
    # 2 segments, so terminations come in waves)
    assert sum(int(c.raygen) for c in counters[1:]) > 0
    total_splat = sum(int(c.splatted) for c in counters)
    assert total_splat == int(np.asarray(state.film.weight).sum())


def test_wavefront_spp_cap():
    scene = quad_scene(kd=0.5)
    params, config = quad_setup(width=8, height=8, max_bounces=2)
    config = config.replace(max_spp=4)
    state, _ = run_wavefront(scene, params, config,
                             num_tasks=256, segments=60)
    spp = np.asarray(state.spp)
    assert spp.max() <= 4
    assert spp.min() >= 1


def test_pixel_ring_coverage():
    """num_tasks smaller than pixel count: the ring must still cover all
    pixels across segments (wf_raygen.cl:25 decoupling)."""
    scene = quad_scene(kd=0.5)
    params, config = quad_setup(width=32, height=32, max_bounces=2)
    state, _ = run_wavefront(scene, params, config,
                             num_tasks=128, segments=80)
    w = np.asarray(state.film.weight)
    assert (w > 0).mean() > 0.99


def test_exclusive_rank_matches_cumsum():
    """The triangular-matmul rank (MXU replacement for the sparsecore
    cumsum scan) is exact for 0/1 masks and row counts."""
    import numpy as np
    import jax.numpy as jnp
    from fluctus_tpu.core.integrator_wf import _rank_rows, exclusive_rank
    rng = np.random.default_rng(7)
    for n in (128, 1024, 4096, 1 << 17):
        m = rng.random(n) < rng.random()
        r, tot = exclusive_rank(jnp.asarray(m))
        assert np.array_equal(np.asarray(r), np.cumsum(m) - m), n
        assert int(tot) == m.sum(), n
    m2 = rng.integers(0, 3000, (8, 1024)).astype(np.int32)
    r2, t2 = _rank_rows(jnp.asarray(m2), False)
    assert np.array_equal(np.asarray(r2), np.cumsum(m2, 1) - m2)
    assert np.array_equal(np.asarray(t2), m2.sum(1))


def test_seed_salt_reset(monkeypatch):
    """FLT_SEED_SALT=0 (default) must keep the reference seed-equals-gid
    init bit-exactly (wf_reset.cl); salt!=0 produces a decorrelated but
    deterministic replica stream (the noise-floor measurement knob used
    by tools/make_goldens.py --floor / --rebaseline)."""
    from fluctus_tpu.geom import RenderConfig
    cfg = RenderConfig(width=16, height=16)
    monkeypatch.delenv("FLT_SEED_SALT", raising=False)
    base = np.asarray(wf_reset(cfg, 256).pool.seed)
    assert np.array_equal(base, np.arange(256, dtype=np.uint32))
    monkeypatch.setenv("FLT_SEED_SALT", "0")
    assert np.array_equal(np.asarray(wf_reset(cfg, 256).pool.seed), base)
    monkeypatch.setenv("FLT_SEED_SALT", "1")
    s1 = np.asarray(wf_reset(cfg, 256).pool.seed)
    monkeypatch.setenv("FLT_SEED_SALT", "2")
    s2 = np.asarray(wf_reset(cfg, 256).pool.seed)  # >uint32 product: masked
    assert not np.array_equal(s1, base)
    assert not np.array_equal(s1, s2)
    # replicas are reproducible
    assert np.array_equal(s2, np.asarray(wf_reset(cfg, 256).pool.seed))
