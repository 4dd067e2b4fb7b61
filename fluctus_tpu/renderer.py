"""High-level renderer — the Tracer equivalent (src/tracer.cpp).

Owns scene lifecycle (load -> BVH build/cache -> device upload,
Tracer::init, tracer.cpp:68-93), render parameter assembly
(resetParams, tracer.cpp:43-65), the exact-spp batch render
(renderSingle, tracer.cpp:108-182) and image export.
"""

from __future__ import annotations

import math
import os
import sys
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from . import flags
from .accel import build_bvh, export_bvh, import_bvh, SplitMode
from .accel.traverse import BVHDevice, TrianglesDevice
from .core.integrator_mk import Film, RenderStats, render_sample
from .core.tonemap import postprocess
from .core.trace import DeviceScene
from .geom import AreaLight, Camera, PostProcessParams, RenderConfig, RenderParams
from .image_io import save_hdr, save_png
from .scene import Scene
from .settings import Settings
from .vec import Vec3


class Renderer:
    def __init__(self, width: int, height: int,
                 settings: Optional[Settings] = None,
                 data_dir: str = "data"):
        if jax.default_backend() == "tpu":
            from . import compile_cache
            compile_cache.enable(os.path.join(data_dir, "kernel_binaries"))
        self.settings = settings or Settings()
        s = self.settings
        self.data_dir = data_dir
        self.width = int(width * s.render_scale)
        self.height = int(height * s.render_scale)
        self.scene: Optional[Scene] = None
        self.device_scene: Optional[DeviceScene] = None
        self.config: Optional[RenderConfig] = None
        self.params: Optional[RenderParams] = None
        self.film: Optional[Film] = None
        self.seed = None
        self.stats = RenderStats.zeros()
        self.env_map_strength = 1.0
        self.exposure = 1.0
        self._jit_sample = jax.jit(render_sample, static_argnames="config")

    # -- scene lifecycle (Tracer::init) -------------------------------------
    def load_scene(self, scene_file: str, env_map: Optional[str] = None,
                   use_saved_state: bool = True):
        s = self.settings
        scene = Scene()
        scene.load_model(scene_file)
        env_name = env_map or s.env_map_name
        use_env = s.use_env_map
        if env_name and os.path.exists(env_name):
            scene.load_env_map(env_name)
            use_env = True
        elif env_name:
            print(f"WARNING: env map not found: {env_name}")
        self.scene = scene

        # camera carried by the scene file (PBRT import, tracer.cpp:887-896)
        if scene.camera_override is not None:
            co = scene.camera_override
            c = self.settings.camera
            c.pos, c.dir, c.up, c.right = co.pos, co.dir, co.up, co.right
            c.fov = co.fov
            # keep incremental rotation (interactive `look`) anchored to the
            # imported view instead of a stale cameraRotation
            s._calc_camera_rotation()

        # per-scene render state (Tracer::init -> loadState, tracer.cpp:74,
        # 1092-1095): camera, area light, flags, exposure restored from
        # data/states/state_<hash>.dat when present
        from . import state_io
        spath = state_io.state_path(self.data_dir, scene.hash)
        if use_saved_state and scene.hash and os.path.exists(spath):
            self.env_map_strength, self.exposure = state_io.load_state(spath, s)
            use_env = s.use_env_map
            print(f"Loaded render state: {spath}")

        bvh = self._init_hierarchy(scene)
        self._bvh_host = bvh
        self.world_radius = scene.world_radius()
        self._upload_device_scene(use_env)
        self.params = self._make_params()
        self.reset()

    def _upload_device_scene(self, use_env: bool):
        """Build device-side scene state (kernel-arg binding layer). Also
        the material re-upload path: call reload_materials() after editing
        scene.materials (the reference re-binds kernel args on edit,
        clcontext.cpp setup paths)."""
        s = self.settings
        scene = self.scene
        bvh = self._bvh_host

        # Backend: the MXU (Pallas matmul) tracer is the production path on
        # TPU; the pure-JAX bitstack traversal serves CPU tests.
        on_tpu = jax.default_backend() == "tpu"
        mxu = None
        if on_tpu:
            from .accel import mxu_trace as mt
            p, nrm, uv, mid = scene.triangle_arrays()
            slim = len(p) > 65536   # past ~64k tris the f32 attrs fallback
            # table is dead weight (B16 serves the resolve; streamed from
            # HBM at scale)
            cache = None
            if scene.hash:
                tag = getattr(self.settings, "split_mode", "sah")
                cs = mt.SC_CLUSTERS
                # material params are baked into the tables — include them
                # in the key so interactive edits miss the stale cache
                import hashlib
                mh = hashlib.blake2b(
                    repr([m.__dict__ for m in scene.materials]).encode(),
                    digest_size=6).hexdigest()
                cache = os.path.join(
                    self.data_dir, "mxu_tables",
                    f"mxu_{scene.hash}_{mh}_{tag}_c256s{cs}"
                    f"{'_slim' if slim else ''}_v{mt.TABLE_VERSION}.npz")
            t0 = time.time()
            mxu = mt.MXUScene.build_cached(
                cache, p, bvh, normals=nrm, uvs=uv, mat_ids=mid,
                materials=scene.materials, atlas=scene.device_textures(),
                slim=slim)
            if len(p) > 65536:
                print(f"MXU tables: {mxu.n_clusters} clusters, "
                      f"{mxu.n_superclusters} supers ({time.time()-t0:.2f}s)")

        self.device_scene = DeviceScene(
            tris=TrianglesDevice.from_arrays(*scene.triangle_arrays()),
            bvh=BVHDevice.from_host(bvh),
            mats=scene.device_materials(),
            atlas=scene.device_textures(),
            env=scene.envmap.device_tables() if scene.envmap else None,
            material_types=scene.material_types,
            mxu=mxu)
        self._derive_config(use_env)

    def _derive_config(self, use_env: bool):
        """Static RenderConfig from current settings + film dimensions.
        Split out of the scene upload so resize() can re-derive the
        pixel-count-dependent fields (pool grouping, width/height) — the
        render-scale slider path (tracer_ui.cpp:256-303)."""
        s = self.settings
        scene = self.scene
        on_tpu = jax.default_backend() == "tpu"

        # block-bound wavefront pool: pick a group count compatible with
        # the image and the default pool size (power of two, each group
        # holding >= 4 pixels; target ~512 pixels/group, which keeps the
        # dense-splat one-hot matmuls at Pk=512 — the per-segment MXU
        # cost scales with pool_lanes * Pk)
        npx = self.width * self.height
        ntasks = s.wf_buffer_size
        def _lane_waste(g):
            # ceil-division can leave a tail of EMPTY groups whose lanes
            # render discarded phantom pixels forever (e.g. 16512 px at
            # g=4096: 19% of the pool) — bound that waste when picking g
            p = -(-npx // g)
            return (g - -(-npx // p)) / g
        groups = 4096
        while groups > 1 and (npx < 4 * groups or ntasks % groups
                              or _lane_waste(groups) > 1 / 16):
            groups //= 2
        block = (on_tpu and groups > 1
                 and flags.env_bool("BLOCK_RING", s.wf_block_ring))

        self.config = RenderConfig(
            width=self.width, height=self.height,
            max_bounces=s.max_path_depth,
            use_env_map=use_env and scene.envmap is not None,
            use_area_light=s.use_area_light,
            sample_impl=s.sample_implicit,
            sample_expl=s.sample_explicit,
            use_roulette=s.use_russian_roulette,
            max_spp=s.max_spp,
            material_types=scene.material_types,
            backend="mxu" if on_tpu else "jax",
            unroll_bounces=on_tpu,
            fast_env=on_tpu,
            denoiser=s.use_denoiser,
            block_ring=block, groups=groups)

    def rebuild_config(self):
        """Re-derive the static RenderConfig flags from current settings —
        the paramsUpdatePending -> recompileKernels path
        (tracer.cpp:216-240): light/sampling toggles must retrace the
        integrator (the flags are compile-time), not just update params."""
        s = self.settings
        self.config = self.config.replace(
            use_env_map=s.use_env_map and self.scene.envmap is not None,
            use_area_light=s.use_area_light,
            sample_impl=s.sample_implicit,
            sample_expl=s.sample_explicit,
            use_roulette=s.use_russian_roulette,
            max_bounces=s.max_path_depth,
            max_spp=s.max_spp,
            denoiser=s.use_denoiser)
        self.params = self._make_params()

    def resize(self, width: int, height: int):
        """Re-create the film at a new resolution (the render-scale
        slider, tracer_ui.cpp:256-303): re-derives the pixel-dependent
        static config (retrace), rebuilds params, restarts accumulation."""
        self.width, self.height = max(1, int(width)), max(1, int(height))
        self._derive_config(self.config.use_env_map)
        self.params = self._make_params()
        self.reset()
        self._wf_state = None

    def reload_materials(self):
        """Re-upload materials/textures after host-side edits (material
        type changes retrace via RenderConfig.material_types, the
        getBxdfDefines analogue)."""
        self.scene.material_types = 0
        for m in self.scene.materials:
            self.scene.material_types |= m.type
        self._upload_device_scene(self.config.use_env_map)
        self.params = self._make_params()
        self.reset()

    def _init_hierarchy(self, scene: Scene):
        """BVH build with binary cache (Tracer::initHierarchy,
        tracer.cpp:934-952)."""
        cache_dir = os.path.join(self.data_dir, "hierarchies")
        sbvh = getattr(self.settings, "split_mode", "sah") == "sbvh"
        tag = "_sbvh" if sbvh else ""
        cache = os.path.join(cache_dir, f"hierarchy_{scene.hash}{tag}.bin")
        if scene.hash and os.path.exists(cache):
            t0 = time.time()
            bvh = import_bvh(cache)
            print(f"BVH cache hit: {cache} ({time.time()-t0:.2f}s)")
            return bvh
        t0 = time.time()
        p, _, _, _ = scene.triangle_arrays()
        from .progress import ProgressView
        pv = ProgressView(enabled=sys.stderr.isatty())
        m = max(p.shape[0], 1)
        bvh = None
        if sbvh:
            from .native import build_sbvh_native
            pv.show("Building SBVH")
            bvh = build_sbvh_native(p)
            if bvh is None:                       # no toolchain
                from .accel.sbvh import build_sbvh
                bvh = build_sbvh(
                    p, progress=lambda k: pv.show("Building SBVH", k / m))
        elif p.shape[0] > 20000:
            # large scenes: the native C++ SAH builder (same algorithm)
            from .native import build_bvh_native
            pv.show("Building BVH")
            bvh = build_bvh_native(p)
        if bvh is None:
            bvh = build_bvh(p, mode=SplitMode.SAH,
                            progress=lambda k: pv.show("Building BVH", k / m))
        pv.hide()
        print(f"BVH built: {bvh.num_nodes} nodes, depth {bvh.depth()} "
              f"({time.time()-t0:.2f}s)")
        if scene.hash:
            os.makedirs(cache_dir, exist_ok=True)
            export_bvh(bvh, cache)
        return bvh

    def _make_params(self) -> RenderParams:
        s = self.settings
        c = s.camera
        a = s.area_light
        cam = Camera.make(c.pos, c.dir, c.up, c.right, fov=c.fov,
                          aperture_size=c.aperture_size,
                          focal_dist=c.focal_dist)
        light = AreaLight.make(a.pos, a.N, a.right, a.up, a.E, a.size)
        return RenderParams(
            camera=cam, area_light=light,
            env_map_strength=jnp.float32(self.env_map_strength),
            world_radius=jnp.float32(self.world_radius),
            pp=PostProcessParams(exposure=jnp.float32(self.exposure),
                                 tm_operator=jnp.int32(s.tonemap)),
            max_spp=jnp.int32(s.max_spp))

    def save_state(self):
        """Persist camera/light/flags per scene hash (Tracer::saveState,
        tracer.cpp:1087-1090; bound to F2 in the reference)."""
        from . import state_io
        path = state_io.state_path(self.data_dir, self.scene.hash)
        state_io.save_state(path, self.settings, self.env_map_strength,
                            self.exposure)
        return path

    # -- render checkpoint/resume --------------------------------------------
    def save_checkpoint(self, path: str):
        """Checkpoint the ACCUMULATION (film color/weight [+ per-pixel
        spp, denoiser features]) so a long render can resume after
        preemption — the production-serving side of checkpoint/resume
        (the reference only persists camera state; the film is lost on
        exit). Keyed by scene hash + resolution for safety."""
        film = self.wavefront_film() if getattr(self, "_wf_state", None) \
            else self.film
        arrs = dict(
            scene_hash=np.asarray(self.scene.hash),
            width=np.int32(self.width), height=np.int32(self.height),
            color_x=np.asarray(film.color.x), color_y=np.asarray(film.color.y),
            color_z=np.asarray(film.color.z), weight=np.asarray(film.weight))
        if getattr(self, "_wf_state", None) is not None:
            from .core.integrator_wf import unpad_pixels
            arrs["spp"] = np.asarray(
                unpad_pixels(self._wf_state.spp, self._wf_cfg))
        if getattr(self, "features", None) is not None:
            f = self.features
            arrs.update(feat_alb_x=np.asarray(f.albedo.x),
                        feat_alb_y=np.asarray(f.albedo.y),
                        feat_alb_z=np.asarray(f.albedo.z),
                        feat_alb_w=np.asarray(f.albedo_w),
                        feat_nrm_x=np.asarray(f.normal.x),
                        feat_nrm_y=np.asarray(f.normal.y),
                        feat_nrm_z=np.asarray(f.normal.z),
                        feat_nrm_w=np.asarray(f.normal_w))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, **arrs)
        return path

    def load_checkpoint(self, path: str) -> bool:
        """Restore a film checkpoint into the current accumulation (and
        the wavefront state when one is initialized). False on
        scene/resolution mismatch."""
        z = np.load(path, allow_pickle=False)
        if str(z["scene_hash"]) != self.scene.hash or \
                int(z["width"]) != self.width or int(z["height"]) != self.height:
            print("checkpoint mismatch (scene/resolution); ignoring")
            return False
        film = Film(color=Vec3(jnp.asarray(z["color_x"]),
                               jnp.asarray(z["color_y"]),
                               jnp.asarray(z["color_z"])),
                    weight=jnp.asarray(z["weight"]))
        self.film = film
        if getattr(self, "_wf_state", None) is not None:
            from .core.integrator_wf import pad_pixels
            cfg = self._wf_cfg
            pad = lambda tree: jax.tree_util.tree_map(
                lambda a: pad_pixels(a, cfg), tree)
            st = self._wf_state._replace(film=pad(film))
            if "spp" in z.files:
                st = st._replace(spp=pad_pixels(jnp.asarray(z["spp"]), cfg,
                                                fill=1 << 29))
            self._wf_state = st
        if "feat_alb_x" in z.files and self.features is not None:
            from .core.integrator_mk import FeatureFilm
            self.features = FeatureFilm(
                albedo=Vec3(jnp.asarray(z["feat_alb_x"]),
                            jnp.asarray(z["feat_alb_y"]),
                            jnp.asarray(z["feat_alb_z"])),
                albedo_w=jnp.asarray(z["feat_alb_w"]),
                normal=Vec3(jnp.asarray(z["feat_nrm_x"]),
                            jnp.asarray(z["feat_nrm_y"]),
                            jnp.asarray(z["feat_nrm_z"])),
                normal_w=jnp.asarray(z["feat_nrm_w"]))
            if getattr(self, "_wf_state", None) is not None and \
                    self._wf_state.features is not None:
                # carry restored guide buffers into the wavefront state too,
                # else wavefront_film() overwrites them with wf_reset zeros.
                # Checkpoints store TRUE pixel layout — the block-mode
                # state is PADDED, so pad like the film/spp above.
                from .core.integrator_wf import pad_pixels as _pp
                padf = lambda tree: jax.tree_util.tree_map(
                    lambda a: _pp(a, self._wf_cfg), tree)
                self._wf_state = self._wf_state._replace(
                    features=padf(self.features))
        return True

    # -- rendering -----------------------------------------------------------
    def reset(self):
        """Accumulation reset (wf_reset analogue)."""
        from .core.integrator_mk import FeatureFilm
        n = self.config.num_pixels
        self.film = Film.zeros(n)
        self.seed = jnp.arange(n, dtype=jnp.uint32)
        self.stats = RenderStats.zeros()
        self.features = (FeatureFilm.zeros(n) if self.config.denoiser
                         else None)
        self._wf_exact_state = None   # restart renderSingle accumulation
        self._wf_exact_target = 0

    def render_single(self, spp: int, progress: bool = False):
        """Exact-spp batch render (Tracer::renderSingle). RR is forced off,
        like the reference (tracer.cpp:112-121).

        On TPU this routes to the exact-spp wavefront
        (render_single_wavefront): the mk megastep unrolls the bounce loop
        (gathers under lax control flow serialize on this toolchain,
        PERF.md), so its compile time scales with max_path_depth — minutes
        at depth 8+ — while the wavefront path compiles once and matches
        the semantics via the CHECK_SPP cap. Set FLT_FORCE_MK=1 to force
        the mk megastep anyway (tests / small depths)."""
        if self.config.backend == "mxu" and \
                not flags.env_bool("FORCE_MK", False):
            return self.render_single_wavefront(spp, accumulate=True,
                                                progress=progress)
        cfg = self.config.replace(use_roulette=False)
        for sample in range(spp):
            if cfg.denoiser:
                self.film, self.seed, st, self.features = self._jit_sample(
                    self.device_scene, self.params, self.film, self.seed,
                    cfg, self.features)
            else:
                self.film, self.seed, st = self._jit_sample(
                    self.device_scene, self.params, self.film, self.seed, cfg)
            self.stats = self.stats + st
            if progress and sample % 10 == 0:
                print(f"\rRendered: {sample}/{spp}", end="", flush=True)
        jax.block_until_ready(self.film.color.x)
        self._film_src = "mk"
        if progress:
            print(f"\rRendered: {spp}/{spp}")
        return self.film

    # -- wavefront (throughput) mode ------------------------------------------
    def init_wavefront(self, num_tasks: Optional[int] = None):
        """Reset the persistent path pool (wf_reset analogue)."""
        from .core.integrator_wf import (apply_splats, wf_logic_phase,
                                         wf_reset, wf_resolve_phase,
                                         wf_segment, wf_shade_phase,
                                         wf_trace_phase)
        self.num_tasks = num_tasks or self.settings.wf_buffer_size
        cfg = self.config
        if cfg.block_ring and self.num_tasks % cfg.groups:
            cfg = cfg.replace(block_ring=False)   # incompatible pool size
        self._wf_cfg = cfg
        self._wf_state = wf_reset(cfg, self.num_tasks,
                                  world_radius=self.world_radius)
        # two-dispatch segments: trace and logic as separate programs keep
        # each program's sort/gather/scatter offload-op count low — fused
        # into one program they contend and serialize on this TPU
        self._wf_phased = flags.env_bool("WF_PHASES", self.settings.wf_phases)
        if not hasattr(self, "_wf_step"):
            # one jit wrapper for the lifetime of the renderer — a fresh
            # wrapper would re-trace and recompile (minutes on this toolchain)
            self._wf_step = jax.jit(
                wf_segment, static_argnames=("config", "first_iteration"))
            self._wf_trace = jax.jit(wf_trace_phase, static_argnames="config")
            self._wf_resolve = jax.jit(wf_resolve_phase,
                                       static_argnames="config")
            self._wf_logic = jax.jit(
                wf_logic_phase,
                static_argnames=("config", "first_iteration", "defer_splat"))
            self._wf_shade = jax.jit(
                wf_shade_phase,
                static_argnames=("config", "first_iteration", "defer_splat"))
            self._wf_apply_splats = jax.jit(apply_splats)
        self._wf_counters = []
        self._wf_stats_cache = (0, (0, 0, 0, 0))
        self._splat_segs = []
        self._splat_datas = []
        # batched film scatter: K segments of splat records -> one
        # segment_sum (throughput mode only; exact-spp needs K=1).
        # Default 1 (off): measured 8.9 vs 9.9 Mrays/s at K=4 — the
        # in-program scatter overlaps other work better than the
        # amortization saves.
        self._splat_every = flags.env_int("SPLAT_EVERY",
                                          self.settings.wf_splat_every)

    def render_wavefront(self, segments: int, sync: bool = True):
        """Advance the wavefront `segments` steps (Tracer::update loop body,
        tracer.cpp:269-283). Dispatch is asynchronous: the host runs ahead
        and only synchronizes at the end (the reference's finishQueue)."""
        self._film_src = "wf"
        if getattr(self, "_wf_exact_mode", False):
            # a prior render_single_wavefront left the exact-spp state
            # (max_spp cap compiled in) active — continuing free-running
            # would silently block every splat. Re-init, like the
            # reference's integrator toggle resets accumulation.
            self.init_wavefront(self.num_tasks)
        cfg = self._wf_cfg
        defer = (self._wf_phased and cfg.max_spp == 0
                 and not cfg.block_ring and self._splat_every > 1)
        fused_shade = flags.env_bool("WF_FUSED_SHADE",
                                     self.settings.wf_fused_shade)
        for _ in range(segments):
            if self._wf_phased:
                raw, occ = self._wf_trace(
                    self.device_scene, self._wf_state.pool, self.params,
                    cfg)
                if fused_shade and not defer:
                    self._wf_state, cnt = self._wf_shade(
                        self.device_scene, self.params, self._wf_state,
                        cfg, raw, occ)
                    self._wf_counters.append(cnt)
                    continue
                hit, sp = self._wf_resolve(
                    self.device_scene, self._wf_state.pool, self.params,
                    cfg, raw)
                if defer:
                    self._wf_state, cnt, rec = self._wf_logic(
                        self.device_scene, self.params, self._wf_state,
                        cfg, hit, sp, occ, defer_splat=True)
                    self._splat_segs.append(rec[0])
                    self._splat_datas.append(rec[1])
                    if len(self._splat_segs) >= self._splat_every:
                        self._flush_splats()
                else:
                    self._wf_state, cnt = self._wf_logic(
                        self.device_scene, self.params, self._wf_state,
                        cfg, hit, sp, occ)
            else:
                self._wf_state, cnt = self._wf_step(
                    self.device_scene, self.params, self._wf_state,
                    cfg)
            self._wf_counters.append(cnt)
        if sync:
            self._flush_splats()
            # block_until_ready is unreliable on the remote-attached PJRT
            # (returns before execution finishes — bench r5 measured
            # impossible 288/3320 Mrays/s on first runs of new scenes);
            # a scalar VALUE transfer is the only reliable fence
            _ = float(self._wf_state.film.color.x[0])
        return self._wf_state

    def _flush_splats(self):
        """Apply pending deferred splat records in one batched scatter.
        Pads to the full batch size so only one program shape compiles."""
        if not getattr(self, "_splat_segs", None):
            return
        npix = self.config.num_pixels
        while len(self._splat_segs) < self._splat_every:
            self._splat_segs.append(
                jnp.full_like(self._splat_segs[0], npix))
            self._splat_datas.append(jnp.zeros_like(self._splat_datas[0]))
        segs = jnp.stack(self._splat_segs)
        datas = jnp.stack(self._splat_datas)
        self._splat_segs = []
        self._splat_datas = []
        film = self._wf_apply_splats(self._wf_state.film, segs, datas)
        self._wf_state = self._wf_state._replace(film=film)

    def wavefront_stats(self) -> RenderStats:
        """Queue-counter-derived stats (tracer.cpp:361-368). Counters are
        stacked on-device and fetched in ONE transfer — per-scalar syncs
        cost a tunnel round trip each on remote-attached TPUs."""
        # incremental: reduce only rows added since the last call — the
        # harness polls this every 0.5 s inside the measured loop, and
        # restacking the whole history is quadratic (and retraces on
        # every new stack shape). Row 0 after a wf_reset splats nothing
        # (all paths pre-birth), so summing every row is correct for
        # fresh runs AND accumulate continuations.
        done, acc = getattr(self, "_wf_stats_cache", (0, (0, 0, 0, 0)))
        new = self._wf_counters[done:]
        if new:
            flat = []
            for c in new:
                flat.extend([c.raygen, c.extension, c.shadow, c.splatted])
            mat = np.asarray(jnp.stack(flat)).reshape(-1, 4)
            acc = tuple(int(a) + int(mat[:, k].sum())
                        for k, a in enumerate(acc))
            self._wf_stats_cache = (len(self._wf_counters), acc)
        return RenderStats(jnp.int32(acc[0]), jnp.int32(acc[1]),
                           jnp.int32(acc[2]), jnp.int32(acc[3]))

    def wavefront_film(self):
        from .core.integrator_wf import unpad_pixels
        self._flush_splats()
        cfg = self._wf_cfg
        unpad = lambda tree: jax.tree_util.tree_map(
            lambda a: unpad_pixels(a, cfg), tree)
        if self._wf_state.features is not None:
            self.features = unpad(self._wf_state.features)
        return unpad(self._wf_state.film)

    def wavefront_preview_film(self):
        """Incomplete-path preview splat (mk_splat_preview.cl:13-25 role):
        every in-flight path contributes its radiance accumulated SO FAR
        (implicit hits + resolved NEE of earlier bounces) to its pixel as
        a provisional sample, on top of the real accumulation — instant
        (biased: remaining bounces missing) feedback during camera
        motion. The reference force-overwrites because its microkernel
        film is empty mid-sample; our wavefront film already holds the
        splats of paths that finished inside the same segment, so the
        partial paths are BLENDED in rather than overwriting. Pure view:
        the accumulation state is untouched."""
        from .core.integrator_wf import padded_to_true_pid
        film = self.wavefront_film()
        pool = self._wf_state.pool
        cfg = self._wf_cfg
        npx = cfg.num_pixels
        pid = padded_to_true_pid(cfg, pool.pixel_index)
        pid = jnp.clip(jnp.mod(pid, npx), 0, npx - 1)
        live = (pool.path_len >= 1).astype(jnp.float32)
        cnt = jax.ops.segment_sum(live, pid, num_segments=npx)
        splat = Vec3(*(jax.ops.segment_sum(c * live, pid, num_segments=npx)
                       for c in (pool.Ei.x, pool.Ei.y, pool.Ei.z)))
        color = Vec3(*(a + s for s, a in zip(splat, film.color)))
        return Film(color=color, weight=film.weight + cnt)

    def render_single_wavefront(self, spp: int,
                                num_tasks: Optional[int] = None,
                                max_segments: int = 100000,
                                accumulate: bool = False,
                                progress: bool = False):
        """Exact-spp batch render via the wavefront path with the CHECK_SPP
        cap (wf_logic.cl:76-84): segments run until every pixel has spp
        samples. Preferred on TPU, where the unrolled per-bounce megastep
        costs minutes of compile; the reference's microkernel renderSingle
        (tracer.cpp:108-182) semantics are matched by the cap.

        The cap's PRESENCE is static (one retrace) but its VALUE is a
        dynamic param, so different spp targets share one compiled
        program. With ``accumulate`` the call continues the persistent
        exact state for ``spp`` MORE samples per pixel (renderSingle's
        progressive accumulation contract)."""
        from .core.integrator_wf import unpad_pixels, wf_reset, wf_segment
        cfg = self.config.replace(max_spp=1, use_roulette=False)
        n_tasks = num_tasks or self.settings.wf_buffer_size
        if cfg.block_ring and n_tasks % cfg.groups:
            cfg = cfg.replace(block_ring=False)
        state = getattr(self, "_wf_exact_state", None)
        if not accumulate or state is None or \
                state.pool.seed.shape[0] != n_tasks:
            state = wf_reset(cfg, n_tasks, world_radius=self.world_radius)
            self._wf_exact_target = 0
            if accumulate and self.film is not None:
                w = np.asarray(self.film.weight)
                if w.max() > 0:
                    # continue a restored accumulation (load_checkpoint)
                    # instead of silently discarding it: seed the exact
                    # state's film/spp from self.film and resume the cap
                    # from the restored floor
                    from .core.integrator_wf import pad_pixels
                    pad = lambda tree: jax.tree_util.tree_map(
                        lambda a: pad_pixels(a, cfg), tree)
                    spp0 = jnp.asarray(w, jnp.int32)
                    state = state._replace(
                        film=pad(self.film),
                        spp=pad_pixels(spp0, cfg, fill=1 << 29))
                    self._wf_exact_target = int(w.min())
        target = self._wf_exact_target + spp
        params = self.params._replace(max_spp=jnp.int32(target))
        if not hasattr(self, "_wf_exact_step"):
            self._wf_exact_step = jax.jit(
                wf_segment, static_argnames=("config", "first_iteration"))
        step = self._wf_exact_step
        done = 0
        counters = []
        while done < max_segments:
            for _ in range(16):
                state, c = step(self.device_scene, params, state, cfg)
                counters.append(c)
                done += 1
            cur = int(jnp.min(state.spp))
            if progress:
                print(f"\rRendered: {min(cur, target)}/{target}",
                      end="", flush=True)
            if cur >= target:
                if progress:
                    print()
                break
        unpad = lambda tree: jax.tree_util.tree_map(
            lambda a: unpad_pixels(a, cfg), tree)
        self.film = unpad(state.film)
        self._film_src = "mk"       # self.film is current (see current_film)
        self._wf_exact_state = state
        self._wf_exact_target = target
        self._wf_state = state
        self._wf_cfg = cfg
        self._wf_exact_mode = True   # render_wavefront must re-init
        self._wf_counters = counters
        self._wf_stats_cache = (0, (0, 0, 0, 0))
        if state.features is not None:
            self.features = unpad(state.features)
        st = self.wavefront_stats()
        self.stats = self.stats + st
        return self.film

    # -- output --------------------------------------------------------------
    def current_film(self) -> Film:
        """The live accumulation: the wavefront state's film while the
        LAST render call was a free-running render_wavefront, else the
        self.film both render_single paths maintain — so image accessors
        never silently read a stale/zero film after either mode."""
        if getattr(self, "_film_src", "mk") == "wf" \
                and getattr(self, "_wf_state", None) is not None:
            return self.wavefront_film()
        return self.film

    def ldr_image(self) -> np.ndarray:
        """Postprocessed [H, W, 3] float in [0,1] (process kernel)."""
        film = self.current_film()
        rgb = postprocess(film.color, film.weight,
                          self.params.pp.exposure, self.params.pp.tm_operator)
        arr = np.stack([np.asarray(rgb.x), np.asarray(rgb.y),
                        np.asarray(rgb.z)], axis=-1)
        # pixel row 0 is the bottom scanline (GL convention, as the
        # reference's PBO blit); images store top-first
        return np.clip(arr.reshape(self.height, self.width, 3)[::-1], 0.0, 1.0)

    def hdr_image(self) -> np.ndarray:
        film = self.current_film()
        w = np.maximum(np.asarray(film.weight), 1e-30)
        arr = np.stack([np.asarray(film.color.x) / w,
                        np.asarray(film.color.y) / w,
                        np.asarray(film.color.z) / w], axis=-1)
        return arr.reshape(self.height, self.width, 3)[::-1]

    def save_image(self, path: str):
        if path.endswith(".hdr"):
            save_hdr(path, self.hdr_image())
        else:
            save_png(path, self.ldr_image())

    # -- denoiser (OptixDenoiser stand-in; tracer.cpp:339-356 gating) ---------
    def _vec_image(self, v3, w) -> np.ndarray:
        """Accumulated Vec3 buffer -> [H, W, 3] average image (top-first)."""
        wc = np.maximum(np.asarray(w), 1e-30)
        arr = np.stack([np.asarray(v3.x) / wc, np.asarray(v3.y) / wc,
                        np.asarray(v3.z) / wc], axis=-1)
        return arr.reshape(self.height, self.width, 3)[::-1]

    def feature_images(self):
        """Denoiser guide buffers as images: (albedo, normal), each
        [H, W, 3] (the denoiserAlbedo/denoiserNormal PBO contents)."""
        f = self.features
        if f is None:
            raise RuntimeError("denoiser features not accumulated; set "
                               "settings.use_denoiser before load_scene")
        # wavefront path may leave features on sharded devices; pull local
        return (self._vec_image(f.albedo, f.albedo_w),
                self._vec_image(f.normal, f.normal_w))

    def denoised_image(self, blend: Optional[float] = None) -> np.ndarray:
        """Edge-aware denoise of the current HDR film guided by the
        accumulated albedo/normal features (DenoiserOptix::denoise +
        setBlend). Returns [H, W, 3] HDR."""
        from .core.denoise import atrous_denoise
        blend = self.settings.denoiser_blend if blend is None else blend
        hdr = jnp.asarray(self.hdr_image())
        albedo = normal = None
        if self.features is not None:
            a, nrm = self.feature_images()
            albedo = jnp.asarray(a)
            normal = jnp.asarray(nrm)
        return np.asarray(atrous_denoise(hdr, albedo, normal, blend=blend))

    def save_denoised(self, path: str, blend: Optional[float] = None):
        """renderSingle's denoised output (tracer.cpp:173-178)."""
        img = self.denoised_image(blend)
        if path.endswith(".hdr"):
            save_hdr(path, img)
        else:
            from .core.tonemap import postprocess
            n = img.shape[0] * img.shape[1]
            flat = img[::-1].reshape(n, 3)
            rgb = postprocess(
                Vec3(jnp.asarray(flat[:, 0]), jnp.asarray(flat[:, 1]),
                     jnp.asarray(flat[:, 2])),
                jnp.ones(n, jnp.float32),
                self.params.pp.exposure, self.params.pp.tm_operator)
            arr = np.stack([np.asarray(rgb.x), np.asarray(rgb.y),
                            np.asarray(rgb.z)], axis=-1)
            arr = np.clip(arr.reshape(self.height, self.width, 3)[::-1],
                          0.0, 1.0)
            save_png(path, arr)

    # -- picking (kernel_pick.cl / Tracer::pickDofDepth) ----------------------
    def pick_single(self, ndc_x: float, ndc_y: float):
        """Cast one camera ray through NDC coords; returns (hit, t, tri).
        Mirrors CLContext::pickSingle (clcontext.cpp:934-949)."""
        from .core.camera import generate_camera_rays
        from .core.trace import trace_extension
        import jax.numpy as jnp
        px = int(min(max(ndc_x, 0.0), 1.0) * (self.width - 1))
        py = int(min(max(ndc_y, 0.0), 1.0) * (self.height - 1))
        pixel = jnp.asarray([py * self.width + px], jnp.int32)
        # center-of-pixel ray: zero jitter via fixed seed draw is fine here
        orig, d, _ = generate_camera_rays(
            pixel, self.params.camera, self.width, self.height,
            self.params.world_radius, jnp.zeros(1, jnp.uint32))
        hit = trace_extension(orig, d, self.device_scene, None,
                              jnp.asarray(False))
        t = float(hit.t[0])
        tri = int(hit.i[0])
        return tri >= 0, t, tri

    def pick_dof_depth(self, ndc_x: float, ndc_y: float) -> bool:
        """Set focal distance from a scene pick (tracer.cpp:1073-1085)."""
        ok, t, _ = self.pick_single(ndc_x, ndc_y)
        if ok:
            self.settings.camera.focal_dist = t
            self.params = self._make_params()
        return ok

    # -- perf (clcontext.cpp:666-674 definitions) ----------------------------
    def perf_mrays(self, elapsed_s: float) -> dict:
        st = self.stats
        scale = 1e6 * max(elapsed_s, 1e-9)
        prim = int(st.primary_rays) / scale
        ext = int(st.extension_rays) / scale
        shdw = int(st.shadow_rays) / scale
        samp = int(st.samples) / scale
        return dict(primary=prim, extension=ext, shadow=shdw, samples=samp,
                    total=prim + ext + shdw)
