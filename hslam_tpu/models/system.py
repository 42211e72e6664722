"""System orchestration: the per-frame SLAM pipeline.

Re-design of the reference's System/Mapping orchestration
(Src/System.cpp ProcessNewFrame :104-247, Src/Mapping.cpp AddKeyframe
:12-142) on the fixed-capacity Window pytree. The host (Python) keeps only
the tiny state machine — keyframe decision, window slot bookkeeping,
marginalization flags, initializer retry logic — while all numeric work
runs in a handful of jit-compiled device functions with static shapes
(compiled once each).

Bootstrap: two-view initialization via batched KLT + H/F RANSAC +
cheirality-checked triangulation + median-depth normalization
(Src/Initializer.cpp Initialize :28-225; the DirectRefinement photometric
polish of the reference, :1330-2314, is planned as a follow-up stage).
"""
from __future__ import annotations

import dataclasses
import threading
import time as _time
from collections import deque
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PATTERN, Config
from ..models import window as W
from ..models.calib import Calib, level_intrinsics, make_calib
from ..models.optimizer import BAResult, ba_optimize, marginalize_frame, marginalize_points
from ..ops import activation as act_ops
from ..ops import ba as ba_ops
from ..ops import distmap as dist_ops
from ..ops import epipolar as epi_ops
from ..ops import klt as klt_ops
from ..ops import selector as sel_ops
from ..ops import tracker as trk_ops
from ..ops import twoview as tv_ops
from ..ops.pyramid import build_direct_pyramid
from ..utils import lie
from ..utils.compaction import assign_free_slots, scatter_update
from ..utils.interp import bilinear


@dataclasses.dataclass
class Shell:
    """Host-side per-frame record (FrameShell, Include/Frame.h:75-114)."""

    id: int
    timestamp: float
    exposure: float
    cam_to_world: np.ndarray      # (4, 4)
    tracking_ref: Optional[int]   # shell id of reference KF
    cam_to_ref: np.ndarray        # (4, 4)
    aff: np.ndarray               # (2,)
    is_kf: bool = False
    kf_id: int = -1
    pose_valid: bool = True


def _se3_np(R, t):
    T = np.eye(4, dtype=np.float64)
    T[:3, :3] = np.asarray(R)
    T[:3, 3] = np.asarray(t)
    return T


class Immatures:
    """Device SoA for candidate points (capacity cfg.max_immature)."""

    def __init__(self, cfg: Config):
        n = cfg.max_immature
        self.valid = jnp.zeros(n, bool)
        self.host = jnp.zeros(n, jnp.int32)
        self.u = jnp.zeros(n, jnp.float32)
        self.v = jnp.zeros(n, jnp.float32)
        self.color = jnp.zeros((n, 8), jnp.float32)
        self.weight = jnp.ones((n, 8), jnp.float32)
        self.gradH = jnp.zeros((n, 2, 2), jnp.float32)
        self.my_type = jnp.ones(n, jnp.float32)
        self.energy_th = jnp.zeros(n, jnp.float32)
        self.trace = epi_ops.init_trace_state(n)


class SLAMSystem:
    """Monocular hybrid SLAM engine. Host-driven orchestration over
    jit-compiled device kernels."""

    def __init__(self, fx, fy, cx, cy, width, height, cfg: Config = Config(),
                 enable_loop_closure: bool = False, sequential: bool = True,
                 online_photo_calib: bool = False, photo_calib_every: int = 8):
        self.cfg = cfg
        self.calib = make_calib(fx, fy, cx, cy, width, height)
        self.width, self.height = width, height
        self.enable_loop_closure = enable_loop_closure

        # --- online photometric calibration (the declared OnlineCalibrator
        # capability: Include/OnlineCalibrator.h:13-67 [stub in reference],
        # applied through the UpdateGamma hook semantics,
        # photometricUndistorter.cpp:175-200 + Frame.cpp:158-164).
        # When enabled, process_frame expects RAW (uncorrected) intensities;
        # the estimated inverse response + inverse vignette are applied
        # on-device before the pyramid build, and the response derivative
        # re-weights the gradient maps. The whole calibration chain runs on
        # device with zero host syncs.
        self.online_photo_calib = online_photo_calib
        self.photo_calib_every = photo_calib_every
        self._pc_ring: deque = deque(maxlen=photo_calib_every)
        self._pc_params = None           # device PhotoParams after first fit
        self._pc_rms = None              # device scalar, pulled lazily
        self._inv_response = None        # (256,) device LUT
        self._inv_vignette = None        # (H, W) device map
        self._grad_weight = None         # (256,) device B' weights
        self.loop_closer = None          # built lazily once a vocab exists
        self._vocab_descs: list = []     # descriptor pool for training
        self._pending_entries: list = []  # KF entries awaiting the vocab
        self.n_loops_closed = 0
        self.window = W.empty_window(cfg, height, width)
        self.imm = Immatures(cfg)
        self.shells: List[Shell] = []
        self.kf_shell_ids: List[int] = []
        self.slot_shell: List[Optional[int]] = [None] * cfg.max_frames
        self.initialized = False
        self.is_lost = False
        self.init_failed = False
        self.current_min_act_dist = 2.0
        self.last_coarse_rmse = np.full(5, 100.0)
        self.first_coarse_rmse = -1.0
        self.frame_count = 0
        self.next_kf_id = 0
        self.selector_pot = 5
        self._marg_counts: dict = {}
        self._last_flow = np.zeros(3)
        # keyframe connectivity map (EnergyFunctional.h:83):
        # (host_kf_id, target_kf_id) -> [n_active_res, n_marginalized_res]
        self.connectivity: dict = {}

        # tracker reference state (host mirrors)
        self._newest_template: Optional[trk_ops.Template] = None
        self.template: Optional[trk_ops.Template] = None
        self.ref_slot = -1
        self.ref_shell_id = -1
        self.ref_aff = np.zeros(2)
        self.ref_exposure = 1.0

        # initializer state
        self._init_first = None   # dict with pyramid, points, colors...

        # --- async tracking/mapping pipeline (Mapping.cpp:144-214,
        # System.cpp:191-212). sequential=True mirrors the reference's
        # SequentialOperation default (Settings.cpp:42); sequential=False
        # runs AddKeyframe/ProcessNonKeyframe on a mapping thread with the
        # double-buffered tracker-reference swap of System.cpp:127-133.
        self.sequential = sequential
        self._pending_ref = None        # (template, slot, shell_id, aff, exp)
        self._ref_lock = threading.Lock()
        self._shell_lock = threading.Lock()
        self._map_exc: Optional[BaseException] = None
        self.n_frames_skipped = 0       # non-KF frames dropped in catch-up
        # lag-1 pipelined-tracking frontier (process_frame_pipelined)
        self._pipe: deque = deque()
        self._frontier_frames = 0
        self._dev_prev = jnp.eye(4, dtype=jnp.float32)
        self._dev_prevprev = jnp.eye(4, dtype=jnp.float32)
        self._dev_aff = jnp.zeros(2, jnp.float32)
        self.kf_latencies: deque = deque(maxlen=200)
        if not sequential:
            self._queue: deque = deque()
            self._qcond = threading.Condition()
            self._map_stop = False
            self._map_busy = False
            self._map_thread = threading.Thread(
                target=self._mapping_loop, daemon=True)
            self._map_thread.start()

        self._build_jit()

    # ------------------------------------------------------------------ jit
    def _build_jit(self):
        cfg = self.cfg
        n_lvl = cfg.pyr_levels

        @jax.jit
        def prep(img):
            pyr, grads = build_direct_pyramid(img, n_lvl)
            return pyr, grads

        self._prep = prep

        @jax.jit
        def prep_calibrated(raw, inv_resp, inv_vig, grad_w):
            """Photometric correction fused into the pyramid build
            (photometricUndistorter.cpp:121-146 + Frame.cpp:158-164)."""
            from ..ops.undistort import photometric_correct
            img = photometric_correct(raw, inv_resp, inv_vig)
            return build_direct_pyramid(img, n_lvl, gamma_grad_weight=grad_w)

        self._prep_calibrated = prep_calibrated

        @jax.jit
        def pc_sample(u, v, idepth, valid, K4, R_rel, t_rel, raws):
            """Sample RAW intensities of the template points warped into
            each ring frame: returns obs (P, F), r2 (P, F), mask (P, F)."""
            fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
            Hh, Ww = raws.shape[1], raws.shape[2]
            px = (u - cx) / fx
            py = (v - cy) / fy
            dirs = jnp.stack([px, py, jnp.ones_like(px)], -1)     # (P, 3)
            p3 = (jnp.einsum("fij,pj->fpi", R_rel, dirs)
                  + t_rel[:, None, :] * idepth[None, :, None])    # (F, P, 3)
            z = jnp.where(jnp.abs(p3[..., 2]) < 1e-9, 1e-9, p3[..., 2])
            uu = fx * p3[..., 0] / z + cx
            vv = fy * p3[..., 1] / z + cy
            inb = ((z > 0) & (uu > 1) & (vv > 1)
                   & (uu < Ww - 2) & (vv < Hh - 2))
            obs = jax.vmap(bilinear)(raws, uu, vv)                # (F, P)
            ccx, ccy = (Ww - 1) / 2.0, (Hh - 1) / 2.0
            r2 = (((uu - ccx) ** 2 + (vv - ccy) ** 2)
                  / (ccx * ccx + ccy * ccy))
            mask = inb & valid[None, :] & jnp.isfinite(obs)
            return obs.T, r2.T, mask.T

        self._pc_sample = pc_sample

        @jax.jit
        def pc_fit(obs, r2, mask):
            """Joint response/vignette/exposure GN + LUT derivation, all
            on device (models/photo_calib.py)."""
            from ..models import photo_calib as PC
            from ..ops.undistort import invert_response, response_grad_weight
            params = PC.init_params(obs.shape[1])
            params, rms = PC.calibrate(params, obs,
                                       jnp.arange(obs.shape[1]), r2, mask)
            lut = PC.gamma_lut(params)
            inv_resp = invert_response(lut)
            grad_w = response_grad_weight(lut)
            inv_vig = 1.0 / PC.vignette_map(params, self.height, self.width)
            return params, rms, inv_resp, grad_w, inv_vig

        self._pc_fit = pc_fit

        from ..ops.undistort import photometric_correct
        self._correct_img = jax.jit(photometric_correct)
        self._track = jax.jit(
            partial(trk_ops.track_coarse, cfg=cfg, coarsest_lvl=n_lvl - 1)
        )
        self._track_multi = jax.jit(
            partial(trk_ops.track_coarse_multi, cfg=cfg, coarsest_lvl=n_lvl - 1)
        )
        self._track_step = jax.jit(
            partial(trk_ops.track_step, cfg=cfg, n_levels=n_lvl)
        )
        self._ba = jax.jit(
            lambda wnd, calib, n: ba_optimize(wnd, calib, cfg, n),
            static_argnums=(2,),
        )
        self._trace = jax.jit(partial(epi_ops.trace_on, cfg=cfg))
        self._activate = jax.jit(partial(act_ops.activate_points, cfg=cfg))
        self._marg_points = jax.jit(partial(marginalize_points, cfg=cfg))
        self._marg_frame = jax.jit(partial(marginalize_frame, cfg=cfg))
        self._build_template = jax.jit(trk_ops.build_template)
        self._select = {}   # per-pot compiled selector

        @jax.jit
        def sample_pattern(img, u, v):
            pat = jnp.asarray(PATTERN, jnp.float32)
            up = u[:, None] + pat[None, :, 0]
            vp = v[:, None] + pat[None, :, 1]
            col = bilinear(img[..., 0], up, vp)
            gx = bilinear(img[..., 1], up, vp)
            gy = bilinear(img[..., 2], up, vp)
            c = cfg.outlier_th_sum_component
            wgt = jnp.sqrt(c / (c + gx**2 + gy**2))
            gH = jnp.stack(
                [
                    jnp.stack([jnp.sum(gx * gx, -1), jnp.sum(gx * gy, -1)], -1),
                    jnp.stack([jnp.sum(gx * gy, -1), jnp.sum(gy * gy, -1)], -1),
                ],
                -2,
            )
            finite = jnp.all(jnp.isfinite(col), axis=-1)
            return col, wgt, gH, finite

        self._sample_pattern = sample_pattern

    def _select_px(self, pot, dir_img, grads, want, seed):
        """Candidate pixel source. Default: the PixelSelector gradient
        sampler (reference UseFAST=false default, Detector.cpp:56-67);
        cfg.use_fast switches to FAST corners + grid NMS
        (Detector.cpp:47-55 + Ssc)."""
        cfg = self.cfg
        if cfg.use_fast:
            if "fast" not in self._select:
                from ..ops import orb as orb_ops

                def fast_sel(d, w, s):
                    score = orb_ops.fast_score(d[..., 0], float(cfg.min_th_fast))
                    u, v, valid = orb_ops.grid_nms(
                        score, max(cfg.enforced_min_dist, 4), cfg.max_features
                    )
                    ptype = jnp.ones_like(u, jnp.int32)
                    return u, v, ptype, valid

                self._select["fast"] = jax.jit(fast_sel)
            return self._select["fast"](dir_img, jnp.int32(want), jnp.int32(seed))
        if pot not in self._select:
            self._select[pot] = jax.jit(
                lambda d, g0, g1, g2, w, s: sel_ops.compact_selection(
                    sel_ops.select_pixels(d, (g0, g1, g2), pot, 1.0, s, cfg),
                    g0, cfg.max_features, w, s,
                )
            )
        return self._select[pot](dir_img, grads[0], grads[1], grads[2],
                                 jnp.int32(want), jnp.int32(seed))

    # ------------------------------------------------------------ main entry
    def process_frame(self, image: np.ndarray, timestamp: float,
                      exposure: float = 1.0):
        """ProcessNewFrame (System.cpp:104-247). `image` is the
        geometrically-corrected grayscale frame; photometrically corrected
        too unless online_photo_calib is on (then RAW intensities)."""
        cfg = self.cfg
        raw = jnp.asarray(image, jnp.float32)
        if self.online_photo_calib and self._inv_response is not None:
            pyr, grads = self._prep_calibrated(
                raw, self._inv_response, self._inv_vignette, self._grad_weight)
        else:
            pyr, grads = self._prep(raw)

        shell = Shell(
            id=self.frame_count, timestamp=timestamp, exposure=exposure,
            cam_to_world=np.eye(4), tracking_ref=None, cam_to_ref=np.eye(4),
            aff=np.zeros(2),
        )
        self.frame_count += 1
        self.shells.append(shell)

        if self._map_exc is not None:
            exc, self._map_exc = self._map_exc, None
            raise exc

        if not self.initialized:
            self._try_initialize(shell, pyr, grads)
            return shell

        # --- adopt a freshly published tracker reference (the
        # coarseTracker <-> coarseTracker_forNewKF swap, System.cpp:127-133)
        with self._ref_lock:
            if self._pending_ref is not None:
                (self.template, self.ref_slot, self.ref_shell_id,
                 self.ref_aff, self.ref_exposure) = self._pending_ref
                self._pending_ref = None
                self.first_coarse_rmse = -1.0

        # --- track against the reference keyframe template
        ok = self._track_new_coarse(shell, pyr)
        if not ok:
            self.is_lost = True
            return shell

        # --- online photometric calibration observation + periodic refit
        if self.online_photo_calib:
            self._pc_ring.append((shell.id, raw))
            if (len(self._pc_ring) == self._pc_ring.maxlen
                    and shell.id % self.photo_calib_every == 0):
                self._photo_calib_step()

        # --- keyframe decision (System.cpp:159-177)
        need_kf = self._need_keyframe(shell)

        if self.sequential:
            if need_kf:
                self._add_keyframe(shell, pyr, grads)
            else:
                self._process_non_kf(shell, pyr)
        else:
            with self._qcond:
                self._queue.append((shell, pyr, grads, need_kf))
                self._qcond.notify_all()
        return shell

    # ---------------------------------------------------- pipelined entry
    def process_frame_pipelined(self, image: np.ndarray, timestamp: float,
                                exposure: float = 1.0) -> Optional[Shell]:
        """Lag-1 pipelined ProcessNewFrame: dispatch this frame's fused
        tracking step (pyramid + device-side motion hypotheses + batched
        scoring + coarse-to-fine LM, ops/tracker.track_step) WITHOUT
        blocking, then pull and finalize the PREVIOUS frame's result — so
        the host round-trip for frame k-1 overlaps frame k's device
        compute. Returns the newly COMPLETED shell (frame k-1), or None.

        Call flush_pipeline() + finish() at end of sequence. Requires
        sequential=False (the mapping thread consumes KF work)."""
        if self._map_exc is not None:
            exc, self._map_exc = self._map_exc, None
            raise exc
        cfg = self.cfg
        shell = Shell(
            id=self.frame_count, timestamp=timestamp, exposure=exposure,
            cam_to_world=np.eye(4), tracking_ref=None, cam_to_ref=np.eye(4),
            aff=np.zeros(2),
        )
        self.frame_count += 1
        self.shells.append(shell)

        if not self.initialized:
            self.flush_pipeline()
            img = jnp.asarray(image, jnp.float32)
            if self.online_photo_calib and self._inv_response is not None:
                pyr, grads = self._prep_calibrated(
                    img, self._inv_response, self._inv_vignette,
                    self._grad_weight)
            else:
                pyr, grads = self._prep(img)
            self._try_initialize(shell, pyr, grads)
            if self.initialized:
                # seed the device frontier at the second init keyframe
                self._frontier_frames = 0
                self._dev_prev = jnp.asarray(shell.cam_to_world, jnp.float32)
                self._dev_prevprev = self._dev_prev
                self._dev_aff = jnp.asarray(shell.aff, jnp.float32)
            return None

        # adopt a freshly published tracker reference (System.cpp:127-133)
        with self._ref_lock:
            if self._pending_ref is not None:
                (self.template, self.ref_slot, self.ref_shell_id,
                 self.ref_aff, self.ref_exposure) = self._pending_ref
                self._pending_ref = None
                self.first_coarse_rmse = -1.0

        with self._shell_lock:
            ref_c2w = self.shells[self.ref_shell_id].cam_to_world.copy()
        K_pyr = jnp.stack([level_intrinsics(self.calib, l)
                           for l in range(cfg.pyr_levels)])
        shell.tracking_ref = self.ref_shell_id
        raw = jnp.asarray(image, jnp.float32)
        img_dev = raw
        if self.online_photo_calib and self._inv_response is not None:
            # correction-only dispatch; the track_step pyramid then sees
            # corrected intensities (gradient gamma-reweighting is applied
            # on the sequential path only)
            img_dev = self._correct_img(raw, self._inv_response,
                                        self._inv_vignette)
        out = self._track_step(
            self.template, img_dev, K_pyr,
            jnp.asarray(ref_c2w, jnp.float32),
            self._dev_prev, self._dev_prevprev,
            jnp.bool_(self._frontier_frames >= 2),
            self._dev_aff,
            jnp.float32(self.ref_exposure), jnp.float32(shell.exposure),
            jnp.asarray(self.ref_aff, jnp.float32),
        )
        self._pipe.append((shell, out, raw))
        self._dev_prevprev = self._dev_prev
        self._dev_prev = out.c2w
        self._dev_aff = out.aff
        self._frontier_frames += 1

        if len(self._pipe) >= 2:
            return self._complete_tracked(*self._pipe.popleft())
        return None

    def flush_pipeline(self):
        """Complete all in-flight pipelined frames."""
        out = None
        while getattr(self, "_pipe", None):
            out = self._complete_tracked(*self._pipe.popleft())
        return out

    def _photo_calib_step(self):
        """One online-calibration refit: warp the tracker template into the
        ring frames, sample their RAW intensities, jointly fit response /
        vignette / exposure, and refresh the correction LUTs — entirely on
        device (UpdateGamma semantics, photometricUndistorter.cpp:175-200;
        capability per Include/OnlineCalibrator.h:13-67)."""
        if self.template is None:
            return
        tpl = self.template
        with self._shell_lock:
            ref_c2w = self.shells[self.ref_shell_id].cam_to_world.copy()
            rels = []
            for sid, _ in self._pc_ring:
                T = np.linalg.inv(self.shells[sid].cam_to_world) @ ref_c2w
                rels.append(T)
        rels = np.stack(rels)
        raws = jnp.stack([r for _, r in self._pc_ring])
        K4 = jnp.asarray([self.calib.value[i] for i in range(4)])
        obs, r2, mask = self._pc_sample(
            tpl.u[0], tpl.v[0], tpl.idepth[0], tpl.valid[0], K4,
            jnp.asarray(rels[:, :3, :3], jnp.float32),
            jnp.asarray(rels[:, :3, 3], jnp.float32), raws,
        )
        (self._pc_params, self._pc_rms, self._inv_response,
         self._grad_weight, self._inv_vignette) = self._pc_fit(obs, r2, mask)

    def _complete_tracked(self, shell: Shell, out, raw=None) -> Shell:
        """Finalize one pipelined frame: pull the track result (one host
        round-trip), publish the shell pose, decide keyframe, and hand the
        frame to the mapping thread."""
        cfg = self.cfg
        R_h, t_h, aff_h, ok_h, res_h, flow_h = jax.device_get(
            (out.R, out.t, out.aff, out.ok, out.residuals, out.flow))
        ok = bool(ok_h) and np.isfinite(res_h[0]) and np.all(np.isfinite(t_h))
        if ok:
            self.last_coarse_rmse = np.where(
                np.isnan(res_h), 100.0, np.minimum(res_h, 1e9))
            if self.first_coarse_rmse < 0:
                self.first_coarse_rmse = float(res_h[0])
            T_best = _se3_np(R_h, t_h)
            shell.cam_to_ref = np.linalg.inv(T_best)
            with self._shell_lock:
                shell.cam_to_world = (
                    self.shells[shell.tracking_ref].cam_to_world
                    @ shell.cam_to_ref
                )
            shell.aff = np.asarray(aff_h, np.float64)
            self._last_flow = np.asarray(flow_h)
        else:
            # rare: batched winner rejected — serial fallback on this
            # frame's pyramid; the frontier re-seeds from its outcome
            K_pyr = jnp.stack([level_intrinsics(self.calib, l)
                               for l in range(cfg.pyr_levels)])
            tries, aff_init = self._motion_hypotheses(anchor=shell.id)
            ok = self._track_serial(shell, out.pyr, tries, aff_init, K_pyr)
            self._frontier_frames = 0
            self._dev_prev = jnp.asarray(shell.cam_to_world, jnp.float32)
            self._dev_prevprev = self._dev_prev
            self._dev_aff = jnp.asarray(shell.aff, jnp.float32)
            if not ok:
                self.is_lost = True
                return shell

        if self.online_photo_calib and raw is not None:
            self._pc_ring.append((shell.id, raw))
            if (len(self._pc_ring) == self._pc_ring.maxlen
                    and shell.id % self.photo_calib_every == 0):
                self._photo_calib_step()

        need_kf = self._need_keyframe(shell)
        with self._qcond:
            self._queue.append((shell, out.pyr, out.grads, need_kf))
            self._qcond.notify_all()
        return shell

    # ------------------------------------------------------ mapping thread
    def _mapping_loop(self):
        """Consumer loop over the tracked-frame queue (Mapping.cpp:144-214):
        keyframes always get the full AddKeyframe treatment; non-KF frames
        are traced unless the queue is >3 behind (catch-up mode,
        Mapping.cpp:169-190, which drops their trace work)."""
        while True:
            with self._qcond:
                while not self._queue and not self._map_stop:
                    self._qcond.wait()
                if self._map_stop and not self._queue:
                    return
                shell, pyr, grads, need_kf = self._queue.popleft()
                behind = len(self._queue)
                self._map_busy = True
            try:
                if need_kf:
                    t_kf = _time.perf_counter()
                    self._add_keyframe(shell, pyr, grads)
                    self.kf_latencies.append(_time.perf_counter() - t_kf)
                elif behind <= 3:
                    self._process_non_kf(shell, pyr)
                else:
                    self.n_frames_skipped += 1
            except BaseException as e:   # surfaced on the tracking thread
                self._map_exc = e
            finally:
                with self._qcond:
                    self._map_busy = False
                    self._qcond.notify_all()

    def finish(self):
        """BlockUntilMappingIsFinished (Mapping.cpp:216-224): drain the
        mapping queue. No-op in sequential mode."""
        if self.sequential:
            return
        with self._qcond:
            while self._queue or self._map_busy:
                self._qcond.wait()
        if self._map_exc is not None:
            exc, self._map_exc = self._map_exc, None
            raise exc

    def close(self):
        """Stop the mapping thread (after finish())."""
        if self.sequential:
            return
        with self._qcond:
            self._map_stop = True
            self._qcond.notify_all()
        self._map_thread.join(timeout=30)

    # ------------------------------------------------------------ bootstrap
    def _try_initialize(self, shell: Shell, pyr, grads):
        cfg = self.cfg
        if self._init_first is None or self.init_failed:
            self.init_failed = False
            u, v, ptype, valid = self._select_px(
                self.selector_pot, pyr[0], grads, cfg.num_features, shell.id
            )
            self._init_first = dict(
                shell_id=shell.id,
                pyr=[p[..., 0] for p in pyr],
                dir0=pyr[0],
                grads=grads,
                u=u, v=v, valid=valid,
                fails=0,
            )
            return

        first = self._init_first
        ref_pyr = first["pyr"]
        tgt_pyr = [p[..., 0] for p in pyr]
        pts = jnp.stack([first["u"], first["v"]], -1)
        tracked, ok, err = klt_ops.track(ref_pyr, tgt_pyr, pts)
        ok = ok & first["valid"]
        n_ok = int(jnp.sum(ok))
        if n_ok < self.cfg.init_min_matches:
            first["fails"] += 1
            if first["fails"] > 40:
                self._init_first = None
            return

        # stationarity check: mean flow (Initializer.cpp:117-118)
        flow = jnp.sqrt(jnp.sum((tracked - pts) ** 2, -1))
        mean_flow = float(jnp.sum(jnp.where(ok, flow, 0.0)) / max(n_ok, 1))
        if mean_flow < 0.05 * (self.width + self.height) * 0.5 * 0.1:
            return  # not enough parallax yet

        K = np.array(
            [[float(self.calib.value[0]), 0, float(self.calib.value[2])],
             [0, float(self.calib.value[1]), float(self.calib.value[3])],
             [0, 0, 1.0]], dtype=np.float32,
        )
        res = tv_ops.two_view_reconstruct(
            pts, tracked, ok, jnp.asarray(K), jax.random.PRNGKey(shell.id),
            n_iters=self.cfg.init_ransac_iters,
        )
        if not bool(res.ok):
            first["fails"] += 1
            if first["fails"] > 40:
                self._init_first = None
            return

        # median-depth normalization to 1 (Initializer.cpp:142-148,1283-1297)
        z = np.asarray(res.points3d[:, 2])
        tri = np.asarray(res.tri_ok)
        med = np.median(z[tri]) if tri.sum() > 0 else 1.0
        scale = 1.0 / max(med, 1e-6)
        t_scaled = np.asarray(res.t) * scale   # firstToNew translation

        self._setup_from_init(
            first, shell, pyr, grads,
            np.asarray(res.R), t_scaled,
            np.asarray(res.points3d) * scale, tri,
        )

    def _setup_from_init(self, first, shell, pyr, grads, R12, t12, X, tri_ok):
        """InitFromInitializer (System.cpp:249-319) + forced first KFs."""
        cfg = self.cfg

        # first frame shell (may not be shells[-2] if init took several tries)
        first_shell = self.shells[first["shell_id"]]
        first_shell.cam_to_world = np.eye(4)
        first_shell.is_kf = True
        first_shell.kf_id = 0
        self.next_kf_id = 1
        T12 = _se3_np(R12, t12)            # first -> new
        shell.cam_to_world = np.linalg.inv(T12)
        shell.tracking_ref = first_shell.id
        shell.cam_to_ref = shell.cam_to_world.copy()

        # --- KF0 into slot 0 with depth-prior'd active points
        wnd = self.window
        F = cfg.max_frames
        frames = wnd.frames
        img0 = first["dir0"]
        frames = frames._replace(
            valid=frames.valid.at[0].set(True),
            evalpt_R=frames.evalpt_R.at[0].set(jnp.eye(3)),
            evalpt_t=frames.evalpt_t.at[0].set(jnp.zeros(3)),
            state=frames.state.at[0].set(0.0),
            state_zero=frames.state_zero.at[0].set(0.0),
            exposure=frames.exposure.at[0].set(first_shell.exposure),
            prior=frames.prior.at[0].set(jnp.asarray(W.first_frame_prior(cfg))),
            kf_id=frames.kf_id.at[0].set(0),
            images=frames.images.at[0].set(img0),
        )
        self.slot_shell[0] = first_shell.id
        self.kf_shell_ids.append(first_shell.id)

        # points: triangulated inliers, idepth = 1/z
        idepth = 1.0 / np.maximum(X[:, 2], 1e-4)
        cand_ok = jnp.asarray(tri_ok) & (jnp.asarray(idepth) > 0)
        u = first["u"]
        v = first["v"]
        col, wgt, gH, finite = self._sample_pattern(img0, u, v)
        cand_ok = cand_ok & finite

        points = wnd.points
        slots, write = assign_free_slots(points.status == W.PT_EMPTY, cand_ok)
        points = points._replace(
            status=scatter_update(points.status, slots, write,
                                  jnp.full_like(slots, W.PT_ACTIVE)),
            host=scatter_update(points.host, slots, write, jnp.zeros_like(slots)),
            u=scatter_update(points.u, slots, write, u),
            v=scatter_update(points.v, slots, write, v),
            idepth=scatter_update(points.idepth, slots, write, jnp.asarray(idepth)),
            idepth_zero=scatter_update(points.idepth_zero, slots, write,
                                       jnp.asarray(idepth)),
            color=scatter_update(points.color, slots, write, col),
            weight=scatter_update(points.weight, slots, write, wgt),
            prior=scatter_update(points.prior, slots, write,
                                 jnp.full_like(u, cfg.idepth_fix_prior)),
        )
        self.window = W.Window(frames=frames, points=points, HM=wnd.HM, bM=wnd.bM)
        self.initialized = True
        self._init_first = None

        # the second frame becomes KF 1 through the normal path
        self._add_keyframe(shell, pyr, grads)

    # ------------------------------------------------------------- tracking
    MAX_HYP = 32   # fixed hypothesis batch (31 reference tries + identity pad)

    def _motion_hypotheses(self, anchor: Optional[int] = None):
        """Hypothesis list (System.cpp:347-405) + the initial affine guess.
        Shell poses are read under the shell lock (System.cpp:355-362).
        `anchor` is the id of the frame being tracked (defaults to the
        newest shell) — in pipelined mode later shells are still in flight
        and must not feed the motion model."""
        self._shell_lock.acquire()
        ref_shell = self.shells[self.ref_shell_id]
        if anchor is None:
            anchor = len(self.shells) - 1
        tries = []
        if anchor >= 2 and self.shells[anchor - 1].pose_valid:
            slast = self.shells[anchor - 1]
            sprelast = self.shells[anchor - 2]
            T_sp = np.linalg.inv(sprelast.cam_to_world) @ slast.cam_to_world
            T_ls = np.linalg.inv(slast.cam_to_world) @ ref_shell.cam_to_world
            fh2slast = T_sp  # constant motion assumption
            inv = np.linalg.inv
            tries.append(inv(fh2slast) @ T_ls)
            tries.append(inv(fh2slast) @ inv(fh2slast) @ T_ls)
            half = _se3_np(*[np.asarray(x) for x in lie.se3_exp(
                jnp.asarray(0.5 * np.asarray(lie.se3_log(
                    jnp.asarray(fh2slast[:3, :3]), jnp.asarray(fh2slast[:3, 3])
                ))))])
            tries.append(inv(half) @ T_ls)
            tries.append(T_ls)
            tries.append(np.eye(4))
            rot = 0.02
            base = inv(fh2slast) @ T_ls
            for ax in [(rot, 0, 0), (0, rot, 0), (0, 0, rot),
                       (-rot, 0, 0), (0, -rot, 0), (0, 0, -rot),
                       (rot, rot, 0), (0, rot, rot), (rot, 0, rot),
                       (-rot, rot, 0), (0, -rot, rot), (-rot, 0, rot),
                       (rot, -rot, 0), (0, rot, -rot), (rot, 0, -rot),
                       (-rot, -rot, 0), (0, -rot, -rot), (-rot, 0, -rot),
                       (-rot, -rot, -rot), (-rot, -rot, rot), (-rot, rot, -rot),
                       (-rot, rot, rot), (rot, -rot, -rot), (rot, -rot, rot),
                       (rot, rot, -rot), (rot, rot, rot)]:
                pert = np.eye(4)
                q = np.array([1.0, *ax])
                q /= np.linalg.norm(q)
                pert[:3, :3] = np.asarray(
                    lie.quat_to_rot(jnp.asarray([q[1], q[2], q[3], q[0]]))
                )
                tries.append(base @ pert)
            aff_init = self.shells[anchor - 1].aff.copy()
        else:
            tries.append(np.eye(4))
            aff_init = np.zeros(2)
        self._shell_lock.release()
        return tries, aff_init

    def _track_new_coarse(self, shell: Shell, pyr) -> bool:
        """trackNewCoarse (System.cpp:333-500). Default path: all motion
        hypotheses scored at the coarsest level in ONE batched dispatch,
        argmin refined coarse-to-fine in the same call
        (ops/tracker.track_coarse_multi); the reference's serial try-loop
        with achievedRes early-exit remains as the fallback when the
        batched winner is rejected."""
        cfg = self.cfg
        tries, aff_init = self._motion_hypotheses()

        K_pyr = jnp.stack([level_intrinsics(self.calib, l)
                           for l in range(cfg.pyr_levels)])

        # --- batched path: one dispatch, one host pull
        n = min(len(tries), self.MAX_HYP)
        T_all = np.stack(tries[:n] + [tries[0]] * (self.MAX_HYP - n))
        res, _best_idx = self._track_multi(
            self.template, pyr, K_pyr,
            jnp.asarray(T_all[:, :3, :3], jnp.float32),
            jnp.asarray(T_all[:, :3, 3], jnp.float32),
            jnp.asarray(aff_init, jnp.float32),
            jnp.float32(self.ref_exposure), jnp.float32(shell.exposure),
            jnp.asarray(self.ref_aff, jnp.float32),
        )
        R_h, t_h, aff_h, ok_h, res_h, flow_h = jax.device_get(
            (res.R, res.t, res.aff, res.ok, res.residuals, res.flow))
        if bool(ok_h) and np.isfinite(res_h[0]):
            self.last_coarse_rmse = np.where(
                np.isnan(res_h), 100.0, np.minimum(res_h, 1e9))
            if self.first_coarse_rmse < 0:
                self.first_coarse_rmse = float(res_h[0])
            T_best = _se3_np(R_h, t_h)
            shell.cam_to_ref = np.linalg.inv(T_best)
            shell.tracking_ref = self.ref_shell_id
            shell.cam_to_world = (
                self.shells[self.ref_shell_id].cam_to_world @ shell.cam_to_ref
            )
            shell.aff = np.asarray(aff_h, np.float64)
            self._last_flow = np.asarray(flow_h)
            return bool(np.all(np.isfinite(t_h)))
        return self._track_serial(shell, pyr, tries, aff_init, K_pyr)

    def _track_serial(self, shell: Shell, pyr, tries, aff_init, K_pyr) -> bool:
        """Fallback: the reference's serial try-loop with achievedRes
        early-exit (System.cpp:428-481), then relocalization."""
        cfg = self.cfg
        achieved = np.full(cfg.pyr_levels, np.nan)
        best = None
        have_good = False

        for i, T in enumerate(tries):
            min_abort = jnp.asarray(
                np.where(np.isnan(achieved), np.inf, achieved), jnp.float32
            )
            res = self._track(
                self.template, pyr, K_pyr,
                jnp.asarray(T[:3, :3], jnp.float32),
                jnp.asarray(T[:3, 3], jnp.float32),
                jnp.asarray(aff_init, jnp.float32),
                jnp.float32(self.ref_exposure), jnp.float32(shell.exposure),
                jnp.asarray(self.ref_aff, jnp.float32),
                min_res_for_abort=min_abort,
            )
            r = np.asarray(res.residuals)
            ok = bool(res.ok) and np.isfinite(r[0])
            if ok and (best is None or r[0] < achieved[0] or np.isnan(achieved[0])):
                best = res
                have_good = True
            if have_good:
                cur = np.asarray(best.residuals) if best is res else r
                upd = np.isnan(achieved) | (achieved > r)
                achieved = np.where(upd & np.isfinite(r), r, achieved)
            if have_good and achieved[0] < self.last_coarse_rmse[0] * self.cfg.re_track_threshold:
                break

        if not have_good:
            # first try BoW+PnP relocalization against the reference KF's
            # template (capability beyond the reference, whose only recovery
            # is "take predicted pose and hope", System.cpp:483-489)
            reloc = self._attempt_relocalization(shell, pyr)
            if reloc is not None:
                shell.cam_to_world = reloc
                shell.tracking_ref = self.ref_shell_id
                shell.cam_to_ref = (
                    np.linalg.inv(self.shells[self.ref_shell_id].cam_to_world)
                    @ shell.cam_to_world
                )
                shell.aff = aff_init
                self._last_flow = np.zeros(3)
                return True
            shell.pose_valid = False
            T = tries[0]
            shell.cam_to_ref = np.linalg.inv(T)
            shell.tracking_ref = self.ref_shell_id
            shell.cam_to_world = self.shells[self.ref_shell_id].cam_to_world @ shell.cam_to_ref
            shell.aff = aff_init
            self._last_flow = np.zeros(3)
            return True   # reference hopes to recover; not lost unless NaN

        self.last_coarse_rmse = np.where(
            np.isnan(achieved), 100.0, np.minimum(achieved, 1e9)
        )
        if self.first_coarse_rmse < 0:
            self.first_coarse_rmse = float(achieved[0])

        T_best = _se3_np(np.asarray(best.R), np.asarray(best.t))
        shell.cam_to_ref = np.linalg.inv(T_best)
        shell.tracking_ref = self.ref_shell_id
        shell.cam_to_world = (
            self.shells[self.ref_shell_id].cam_to_world @ shell.cam_to_ref
        )
        shell.aff = np.asarray(best.aff)
        self._last_flow = np.asarray(best.flow)
        return np.all(np.isfinite(np.asarray(best.t)))

    def _lift_keypoint_depths(self, u, v, radius_px: float = 3.0):
        """Nearest-template-point inverse depth for keypoints (host side).
        Uses the mapping thread's newest template (the one just built for
        the current KF), falling back to the tracking reference."""
        tpl = getattr(self, "_newest_template", None) or self.template
        if tpl is None:
            n = np.asarray(u).shape[0]
            return np.zeros(n, np.float32), np.zeros(n, bool)
        tu = np.asarray(tpl.u[0])
        tv = np.asarray(tpl.v[0])
        tid = np.asarray(tpl.idepth[0])
        tval = np.asarray(tpl.valid[0])
        un, vn = np.asarray(u), np.asarray(v)
        d2 = (un[:, None] - tu[None, :]) ** 2 + (vn[:, None] - tv[None, :]) ** 2
        d2[:, ~tval] = 1e12
        nn = np.argmin(d2, axis=1)
        ok = d2[np.arange(len(un)), nn] <= radius_px * radius_px
        return tid[nn].astype(np.float32), ok

    def _attempt_relocalization(self, shell: Shell, pyr):
        """KLT-free pose recovery: match FAST+rBRIEF descriptors of the
        current frame against the reference keyframe, lift the KF keypoints
        to 3D via the tracker template's inverse depths, and solve PnP
        RANSAC. Returns cam_to_world (4, 4) or None."""
        if self.template is None or self.ref_slot < 0:
            return None
        from ..ops import orb as orb_ops
        from ..ops import pnp as pnp_ops
        from ..ops.pyramid import gaussian_blur7

        ref_img = np.asarray(self.window.frames.images[self.ref_slot][..., 0])
        cur_img = pyr[0][..., 0]

        def feats(img):
            score = orb_ops.fast_score(img, float(self.cfg.min_th_fast))
            u, v, valid = orb_ops.grid_nms(score, 8, 512)
            ang = orb_ops.ic_angle(img, u, v)
            return u, v, valid, orb_ops.rbrief(gaussian_blur7(img), u, v, ang)

        ku, kv, kval, kdesc = feats(jnp.asarray(ref_img))
        cu, cv, cval, cdesc = feats(cur_img)
        idx, ok = orb_ops.match_descriptors(kdesc, cdesc,
                                            valid_a=kval, valid_b=cval)
        if int(np.asarray(ok).sum()) < 20:
            return None

        # lift ref keypoints to 3D via nearest template point (<= 3 px)
        tu = np.asarray(self.template.u[0])
        tv = np.asarray(self.template.v[0])
        tid = np.asarray(self.template.idepth[0])
        tval = np.asarray(self.template.valid[0])
        ku_np, kv_np = np.asarray(ku), np.asarray(kv)
        d2 = (ku_np[:, None] - tu[None, :]) ** 2 + (kv_np[:, None] - tv[None, :]) ** 2
        d2[:, ~tval] = 1e12
        nn = np.argmin(d2, axis=1)
        has_depth = d2[np.arange(len(ku_np)), nn] <= 9.0
        idepth = tid[nn]

        fx, fy = float(self.calib.value[0]), float(self.calib.value[1])
        cx, cy = float(self.calib.value[2]), float(self.calib.value[3])
        z = 1.0 / np.maximum(idepth, 1e-6)
        X_cam = np.stack(
            [(ku_np - cx) / fx * z, (kv_np - cy) / fy * z, z], -1
        )
        # to world via the ref KF pose
        T_ref = self.shells[self.ref_shell_id].cam_to_world
        X_w = X_cam @ T_ref[:3, :3].T + T_ref[:3, 3]

        cu_np, cv_np = np.asarray(cu), np.asarray(cv)
        obs = np.stack([cu_np[np.asarray(idx)], cv_np[np.asarray(idx)]], -1)
        valid = np.asarray(ok) & has_depth
        if valid.sum() < 15:
            return None

        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)
        # seed with the last tracked pose prediction (zero motion from the
        # reference) — the DLT samples alone degenerate on planar scenes
        T_pred = np.linalg.inv(T_ref)
        res = pnp_ops.solve_pnp(
            jnp.asarray(X_w, jnp.float32), jnp.asarray(obs, jnp.float32),
            jnp.asarray(valid), jnp.asarray(K),
            jax.random.PRNGKey(shell.id),
            init_R=jnp.asarray(T_pred[:3, :3], jnp.float32),
            init_t=jnp.asarray(T_pred[:3, 3], jnp.float32),
        )
        if not bool(res.ok):
            return None
        Twc = np.eye(4)
        Twc[:3, :3] = np.asarray(res.R)
        Twc[:3, 3] = np.asarray(res.t)
        return np.linalg.inv(Twc)

    def _need_keyframe(self, shell: Shell) -> bool:
        cfg = self.cfg
        flow = self._last_flow
        a_rel = np.exp(shell.aff[0] - self.ref_aff[0]) * (
            shell.exposure / max(self.ref_exposure, 1e-6)
        )
        wh = self.width + self.height
        metric = (
            cfg.kf_global_weight * cfg.kf_weight_shift_t * np.sqrt(max(flow[0], 0)) / wh
            + cfg.kf_global_weight * cfg.kf_weight_shift_r * np.sqrt(max(flow[1], 0)) / wh
            + cfg.kf_global_weight * cfg.kf_weight_shift_rt * np.sqrt(max(flow[2], 0)) / wh
            + cfg.kf_global_weight * cfg.max_affine_weight * abs(np.log(max(a_rel, 1e-6)))
        )
        return bool(
            metric > 1
            or 2 * self.first_coarse_rmse < self.last_coarse_rmse[0]
        )

    # ------------------------------------------------------------- non-KF
    def _process_non_kf(self, shell: Shell, pyr):
        """ProcessNonKeyframe (System.cpp:231-247): epipolar-trace all
        candidates against this frame, then drop the heavy data."""
        self._trace_candidates(shell, pyr)

    def _trace_candidates(self, shell: Shell, pyr):
        imm = self.imm
        Tw = jnp.asarray(np.linalg.inv(shell.cam_to_world), jnp.float32)
        frames = self.window.frames
        R_f, t_f = W.frame_poses(frames)
        # host->new relative transforms per window slot
        R_new = Tw[:3, :3]
        t_new = Tw[:3, 3]
        Ri, ti = lie.se3_inverse(R_f, t_f)
        R_rel = R_new[None] @ Ri            # (F, 3, 3)
        t_rel = jnp.einsum("ij,fj->fi", R_new, ti) + t_new[None]

        K = jnp.asarray(
            [[self.calib.value[0], 0, self.calib.value[2]],
             [0, self.calib.value[1], self.calib.value[3]],
             [0, 0, 1.0]], dtype=jnp.float32)
        Kinv = jnp.linalg.inv(K)
        KRKi = jnp.einsum("ij,fjk,kl->fil", K, R_rel, Kinv)
        Kt = jnp.einsum("ij,fj->fi", K, t_rel)

        aff_f = W.frame_affine(frames)
        exp_f = jnp.where(frames.exposure == 0, 1.0, frames.exposure)
        exp_n = jnp.float32(shell.exposure if shell.exposure else 1.0)
        a_new = jnp.float32(shell.aff[0])
        b_new = jnp.float32(shell.aff[1])
        a_rel = jnp.exp(a_new - aff_f[:, 0]) * exp_n / exp_f
        b_rel = b_new - a_rel * aff_f[:, 1]

        h = imm.host
        self.imm.trace = self._trace(
            imm.trace, imm.u, imm.v, imm.color, imm.weight, imm.gradH,
            imm.energy_th, imm.valid,
            KRKi[h], Kt[h], jnp.stack([a_rel[h], b_rel[h]], -1),
            pyr[0],
        )

    # ------------------------------------------------------------- keyframe
    def _add_keyframe(self, shell: Shell, pyr, grads):
        """AddKeyframe (Mapping.cpp:12-142)."""
        cfg = self.cfg
        F = cfg.max_frames
        shell.is_kf = True
        shell.kf_id = self.next_kf_id
        self.next_kf_id += 1
        if shell.tracking_ref is not None:
            # final pose from the (possibly BA-updated) tracking ref,
            # under the shell lock (Mapping.cpp:14-21)
            with self._shell_lock:
                shell.cam_to_world = (
                    self.shells[shell.tracking_ref].cam_to_world
                    @ shell.cam_to_ref
                )

        # 1. trace candidates into this frame
        if self.next_kf_id > 1:
            self._trace_candidates(shell, pyr)

        # 2. flag frames for marginalization (policy needs stats)
        flagged = self._flag_frames_for_marg(shell)

        # 3. insert the new frame into a free slot
        slot = int(np.argmin(np.asarray(self.window.frames.valid)))
        assert not bool(self.window.frames.valid[slot]), "window full"
        Twc = np.linalg.inv(shell.cam_to_world)
        frames = self.window.frames
        st = np.zeros(8, np.float32)
        from ..config import FRAME_STATE_SCALE
        st[6] = shell.aff[0] / FRAME_STATE_SCALE[6]
        st[7] = shell.aff[1] / FRAME_STATE_SCALE[7]
        frames = frames._replace(
            valid=frames.valid.at[slot].set(True),
            evalpt_R=frames.evalpt_R.at[slot].set(jnp.asarray(Twc[:3, :3], jnp.float32)),
            evalpt_t=frames.evalpt_t.at[slot].set(jnp.asarray(Twc[:3, 3], jnp.float32)),
            state=frames.state.at[slot].set(jnp.asarray(st)),
            state_zero=frames.state_zero.at[slot].set(jnp.asarray(st)),
            exposure=frames.exposure.at[slot].set(shell.exposure),
            prior=frames.prior.at[slot].set(jnp.asarray(W.later_frame_prior(cfg))),
            kf_id=frames.kf_id.at[slot].set(shell.kf_id),
            images=frames.images.at[slot].set(pyr[0]),
            energy_th=frames.energy_th.at[slot].set(
                frames.energy_th[self.ref_slot] if self.ref_slot >= 0
                else 12.0 * 12.0 * 8
            ),
        )
        self.window = self.window._replace(frames=frames)
        self.slot_shell[slot] = shell.id
        self.kf_shell_ids.append(shell.id)

        # 4. activate candidate points
        self._activate_points(slot)

        # 5. optimize
        n_valid = int(np.sum(np.asarray(self.window.frames.valid)))
        iters = cfg.max_opt_iterations
        if n_valid < 3:
            iters = 20
        elif n_valid < 4:
            iters = 15
        result: BAResult = self._ba(self.window, self.calib, iters)
        self.window = result.window
        self.calib = result.calib
        rmse = float(result.rmse)

        # init-failure gates (Mapping.cpp:68-85)
        nkf = self.next_kf_id
        if nkf == 2 and rmse > 20 * cfg.init_slack_factor:
            self.init_failed = True
        if nkf == 3 and rmse > 13 * cfg.init_slack_factor:
            self.init_failed = True
        if nkf == 4 and rmse > 9 * cfg.init_slack_factor:
            self.init_failed = True
        if self.init_failed:
            self._reset()
            return
        if not np.isfinite(rmse):
            self.is_lost = True
            return

        # publish optimized poses back to shells
        self._publish_window_poses()

        # 6. remove outliers (no active residuals)
        pts = self.window.points
        has_res = jnp.sum(pts.res_state == W.RES_IN, axis=1) > 0
        new_status = jnp.where(
            (pts.status == W.PT_ACTIVE) & ~has_res, W.PT_EMPTY, pts.status
        )
        self.window = self.window._replace(
            points=pts._replace(status=new_status.astype(jnp.int32)))

        # 6b. refresh the keyframe connectivity map from the fresh residual
        # grid (insertResidual tallies, EnergyFunctional.cpp:377,406-408)
        self._update_connectivity()

        # 7. rebuild the tracker template on the new reference
        self._set_tracking_ref(slot, shell, result)

        # 8. flag + marginalize points, then frames
        self._flag_and_marg_points(flagged)

        # 9. new candidate traces from this keyframe
        self._make_new_traces(slot, shell, pyr, grads)

        # 10. marginalize flagged frames
        for s in flagged:
            self.window = self._marg_frame(self.window, jnp.int32(s))
            self.slot_shell[s] = None
            self._marg_counts[s] = 0     # slot will be reused by a new KF
            # drop immature points hosted there
            self.imm.valid = self.imm.valid & (self.imm.host != s)

        # 11. hybrid indirect layer: descriptors + loop closure (optional;
        # the reference links DBoW3/g2o but never exercises them — this is
        # the declared-capability integration, "full hybrid mode")
        if self.enable_loop_closure:
            self._loop_closure_step(slot, shell, pyr)

    # ---------------------------------------------------- loop closure
    def _loop_closure_step(self, slot: int, shell: Shell, pyr):
        from ..ops import orb as orb_ops
        from ..ops import bow as bow_ops
        from ..ops.pyramid import gaussian_blur7
        from .loop_closure import LoopCloser

        img = pyr[0][..., 0]
        score = orb_ops.fast_score(img, float(self.cfg.min_th_fast))
        u, v, valid = orb_ops.grid_nms(score, 8, 512)
        ang = orb_ops.ic_angle(img, u, v)
        desc = orb_ops.rbrief(gaussian_blur7(img), u, v, ang)

        # lift keypoints to inverse depths via the (just rebuilt) tracker
        # template of this keyframe — feeds the PnP loop-edge estimation
        kp_idepth, kp_depth_ok = self._lift_keypoint_depths(u, v)
        entry = (shell.kf_id, shell.id, desc, u, v, valid,
                 shell.cam_to_world.copy(), kp_idepth, kp_depth_ok)

        if self.loop_closer is None:
            self._vocab_descs.append(np.asarray(desc)[np.asarray(valid)])
            self._pending_entries.append(entry)
            if len(self._vocab_descs) >= 8:
                pool = np.concatenate(self._vocab_descs)
                voc = bow_ops.train_vocabulary(pool, k=8, levels=3, iters=4)
                self.loop_closer = LoopCloser(voc, min_gap=10)
                # backfill the keyframes that fed the vocabulary — without
                # them the revisit has nothing to match against
                for e in self._pending_entries:
                    self.loop_closer.add_keyframe(
                        e[0], e[1], e[2], e[3], e[4], e[5], e[6],
                        kp_idepth=e[7], kp_depth_ok=e[8],
                    )
                self._pending_entries = []
            return

        self.loop_closer.add_keyframe(
            shell.kf_id, shell.id, desc, u, v, valid, shell.cam_to_world,
            kp_idepth=kp_idepth, kp_depth_ok=kp_depth_ok,
        )
        K = np.array(
            [[float(self.calib.value[0]), 0, float(self.calib.value[2])],
             [0, float(self.calib.value[1]), float(self.calib.value[3])],
             [0, 0, 1.0]])
        loop = self.loop_closer.detect(
            len(self.loop_closer.entries) - 1, K,
            exclude_kfs=self._connected_kf_ids(shell.kf_id),
        )
        if loop is None:
            return
        corrections = self.loop_closer.correct(loop, fix_scale=False)
        self.n_loops_closed += 1
        # re-anchor shells; window evalPTs follow their shells (HM/bM stay —
        # the correction is near-rigid for the active window's recent part)
        by_shell = dict(corrections)
        for sh in self.shells:
            if sh.id in by_shell:
                sh.cam_to_world = by_shell[sh.id]
        frames = self.window.frames
        for s in range(self.cfg.max_frames):
            sid = self.slot_shell[s]
            if sid is not None and sid in by_shell and bool(frames.valid[s]):
                Twc = np.linalg.inv(by_shell[sid])
                frames = frames._replace(
                    evalpt_R=frames.evalpt_R.at[s].set(
                        jnp.asarray(Twc[:3, :3], jnp.float32)),
                    evalpt_t=frames.evalpt_t.at[s].set(
                        jnp.asarray(Twc[:3, 3], jnp.float32)),
                )
        self.window = self.window._replace(frames=frames)

    # ------------------------------------------------------- KF sub-steps
    def _flag_frames_for_marg(self, new_shell: Shell) -> List[int]:
        """flagFramesForMarginalization (FullSystemMarginalize.cpp:18-103)."""
        cfg = self.cfg
        frames = self.window.frames
        valid = np.asarray(frames.valid)
        slots = [s for s in range(cfg.max_frames) if valid[s]]
        n = len(slots) + 1          # including incoming frame
        if n <= cfg.max_kf_frames:
            pass  # may still flag low-point frames

        pts = self.window.points
        status = np.asarray(pts.status)
        host = np.asarray(pts.host)
        imm_host = np.asarray(self.imm.host)
        imm_valid = np.asarray(self.imm.valid)

        aff = np.asarray(W.frame_affine(frames))
        exposure = np.asarray(frames.exposure)
        kf_ids = np.asarray(frames.kf_id)

        if not hasattr(self, "_marg_counts"):
            self._marg_counts = {}

        flagged: List[int] = []
        newest_aff = new_shell.aff
        newest_exp = new_shell.exposure or 1.0
        for s in slots:
            n_in = int(((status == W.PT_ACTIVE) & (host == s)).sum()) + int(
                (imm_valid & (imm_host == s)).sum()
            )
            n_out = int(self._marg_counts.get(s, 0))
            e = exposure[s] if exposure[s] else 1.0
            a_rel = np.exp(aff[s, 0] - newest_aff[0]) * (e / newest_exp)
            if (
                (n_in < cfg.min_points_remaining * max(n_in + n_out, 1)
                 or abs(np.log(max(a_rel, 1e-12))) > cfg.max_log_aff_fac_in_window)
                and (len(slots) - len(flagged) > cfg.min_frames)
            ):
                flagged.append(s)

        # distance-score: keep window <= max frames, flagging repeatedly
        # until the post-insertion window fits the slot capacity
        # (reference checks the pre-insertion count, FullSystemMarginalize.cpp:70;
        # the loop guard also covers async KF bursts where several keyframes
        # are inserted before the tracker reference catches up)
        cap = min(cfg.max_kf_frames, cfg.max_frames - 1)
        R_f, t_f = W.frame_poses(frames)
        T = np.asarray(t_f)
        while len(slots) - len(flagged) >= cap:
            newest_kf = kf_ids[slots].max()
            best_score, best_slot = 1.0, None
            latest_slot = slots[int(np.argmax(kf_ids[slots]))]
            for s in slots:
                if s in flagged or kf_ids[s] > newest_kf - 1 or kf_ids[s] == 0:
                    continue
                dist_score = 0.0
                for s2 in slots:
                    if s2 == s or kf_ids[s2] > newest_kf:
                        continue
                    d = np.linalg.norm(T[s] - T[s2])
                    dist_score += 1.0 / (1e-5 + d)
                dist_score *= -np.sqrt(np.linalg.norm(T[s] - T[latest_slot]))
                if dist_score < best_score:
                    best_score, best_slot = dist_score, s
            if best_slot is None:
                break
            flagged.append(best_slot)
        return flagged

    def _activate_points(self, new_slot: int):
        """activatePointsMT (Mapping.cpp:330-492)."""
        cfg = self.cfg
        pts = self.window.points
        n_active = int(np.sum(np.asarray(pts.status) == W.PT_ACTIVE))
        target = cfg.desired_point_density
        d = self.current_min_act_dist
        if n_active < target * 0.66:
            d -= 0.8
        if n_active < target * 0.8:
            d -= 0.5
        elif n_active < target * 0.9:
            d -= 0.2
        elif n_active < target:
            d -= 0.1
        if n_active > target * 1.5:
            d += 0.8
        if n_active > target * 1.3:
            d += 0.5
        if n_active > target * 1.15:
            d += 0.2
        if n_active > target:
            d += 0.1
        self.current_min_act_dist = float(np.clip(d, 0.0, 4.0))

        imm = self.imm
        tr = imm.trace
        # candidate deletion (Mapping.cpp:374-381)
        delete = (~jnp.isfinite(tr.idepth_max)) | (tr.status == epi_ops.IPS_OUTLIER)
        imm.valid = imm.valid & ~delete

        can_activate = (
            imm.valid
            & ((tr.status == epi_ops.IPS_GOOD)
               | (tr.status == epi_ops.IPS_SKIPPED)
               | (tr.status == epi_ops.IPS_BADCONDITION)
               | (tr.status == epi_ops.IPS_OOB))
            & (tr.last_interval < 8.0)
            & (tr.quality > cfg.min_trace_quality)
            & (tr.idepth_max + tr.idepth_min > 0)
        )
        # drop candidates that can't activate and are OOB
        imm.valid = imm.valid & ~(
            ~can_activate & (tr.status == epi_ops.IPS_OOB)
        )

        # distance-map gating at half resolution (Mapping.cpp:405-420)
        frames = self.window.frames
        R_f, t_f = W.frame_poses(frames)
        newest = new_slot
        # project active points into newest at half res for seeds
        half_K = level_intrinsics(self.calib, 1)
        # seeds: active points' last known projection — use BA projections if
        # available; fall back to projecting via current state
        act_mask = pts.status == W.PT_ACTIVE
        Ph = pts.host
        Ri, ti = lie.se3_inverse(R_f, t_f)
        R_rel = R_f[newest][None] @ Ri      # (F, 3, 3)
        t_rel = jnp.einsum("ij,fj->fi", R_f[newest], ti) + t_f[newest][None]
        fx, fy, cx, cy = [self.calib.value[i] for i in range(4)]
        xh = (pts.u - cx) / fx
        yh = (pts.v - cy) / fy
        dirs = jnp.stack([xh, yh, jnp.ones_like(xh)], -1)
        Rp = R_rel[Ph]
        tp = t_rel[Ph]
        p3 = jnp.einsum("pij,pj->pi", Rp, dirs) + tp * pts.idepth[:, None]
        z = jnp.where(jnp.abs(p3[:, 2]) < 1e-9, 1e-9, p3[:, 2])
        su = half_K[0] * p3[:, 0] / z + half_K[2]
        sv = half_K[1] * p3[:, 1] / z + half_K[3]
        h2, w2 = self.height // 2, self.width // 2
        seed_ok = act_mask & (z > 0) & (su >= 0) & (sv >= 0) & (su < w2) & (sv < h2)
        dmap = dist_ops.distance_map(su, sv, seed_ok, h2, w2)

        # candidate projection into newest
        ih = imm.host
        idm = 0.5 * (tr.idepth_max + tr.idepth_min)
        xh_i = (imm.u - cx) / fx
        yh_i = (imm.v - cy) / fy
        dirs_i = jnp.stack([xh_i, yh_i, jnp.ones_like(xh_i)], -1)
        p3i = jnp.einsum("pij,pj->pi", R_rel[ih], dirs_i) + t_rel[ih] * idm[:, None]
        zi = jnp.where(jnp.abs(p3i[:, 2]) < 1e-9, 1e-9, p3i[:, 2])
        cu = half_K[0] * p3i[:, 0] / zi + half_K[2]
        cv = half_K[1] * p3i[:, 1] / zi + half_K[3]
        inb = (cu > 0) & (cv > 0) & (cu < w2) & (cv < h2) & (zi > 0)
        cui = jnp.clip(jnp.round(cu).astype(jnp.int32), 0, w2 - 1)
        cvi = jnp.clip(jnp.round(cv).astype(jnp.int32), 0, h2 - 1)
        dist_at = dmap[cvi, cui] + (cu - jnp.floor(cu))
        gate = dist_at >= self.current_min_act_dist * imm.my_type
        to_opt = can_activate & inb & gate
        # candidates projecting out of the newest frame are deleted
        imm.valid = imm.valid & (inb | ~can_activate)

        # batched idepth optimization
        act = self._activate(
            frames, self.calib, imm.u, imm.v, idm, imm.color, imm.weight,
            imm.host, to_opt,
        )

        # insert activated points
        pts = self.window.points
        ok = act.ok
        slots, write = assign_free_slots(pts.status == W.PT_EMPTY, ok)
        newpts = pts._replace(
            status=scatter_update(pts.status, slots, write,
                                  jnp.full_like(slots, W.PT_ACTIVE)),
            host=scatter_update(pts.host, slots, write, imm.host),
            u=scatter_update(pts.u, slots, write, imm.u),
            v=scatter_update(pts.v, slots, write, imm.v),
            idepth=scatter_update(pts.idepth, slots, write, act.idepth),
            idepth_zero=scatter_update(pts.idepth_zero, slots, write, act.idepth),
            color=scatter_update(pts.color, slots, write, imm.color),
            weight=scatter_update(pts.weight, slots, write, imm.weight),
            prior=scatter_update(pts.prior, slots, write,
                                 jnp.zeros_like(imm.u)),
            num_good_res=scatter_update(pts.num_good_res, slots, write,
                                        jnp.zeros_like(slots)),
            max_rel_baseline=scatter_update(pts.max_rel_baseline, slots, write,
                                            jnp.zeros_like(imm.u)),
        )
        self.window = self.window._replace(points=newpts)
        # activated (or attempted) candidates are consumed
        imm.valid = imm.valid & ~to_opt

    def _update_connectivity(self):
        """Active-residual counts per (host_kf, target_kf) pair
        (EnergyFunctional.h:83 connectivityMap, [0] = active count)."""
        F = self.cfg.max_frames
        pts = self.window.points
        frames = self.window.frames
        res_in = np.asarray(pts.res_state == W.RES_IN) & (
            np.asarray(pts.status) == W.PT_ACTIVE)[:, None]
        onehot = np.eye(F, dtype=np.float64)[np.asarray(pts.host)]
        counts = onehot.T @ res_in           # (F_host, F_target)
        kf_of = np.asarray(frames.kf_id)
        valid = np.asarray(frames.valid)
        for h in range(F):
            if not valid[h]:
                continue
            for t in range(F):
                if not valid[t] or t == h or counts[h, t] == 0:
                    continue
                key = (int(kf_of[h]), int(kf_of[t]))
                ent = self.connectivity.setdefault(key, [0, 0])
                ent[0] = int(counts[h, t])

    def _connected_kf_ids(self, kf_id: int) -> set:
        """Keyframes sharing residuals (active or marginalized) with kf_id."""
        out = set()
        for (h, t), (na, nm) in self.connectivity.items():
            if na + nm <= 0:
                continue
            if h == kf_id:
                out.add(t)
            elif t == kf_id:
                out.add(h)
        return out

    def _publish_window_poses(self):
        frames = self.window.frames
        R_f, t_f = W.frame_poses(frames)
        aff = np.asarray(W.frame_affine(frames))
        R_np, t_np = np.asarray(R_f), np.asarray(t_f)
        valid = np.asarray(frames.valid)
        with self._shell_lock:   # shellPoseMutex (FullSystemOptimize.cpp:530)
            for s in range(self.cfg.max_frames):
                if not valid[s] or self.slot_shell[s] is None:
                    continue
                sh = self.shells[self.slot_shell[s]]
                Twc = _se3_np(R_np[s], t_np[s])
                sh.cam_to_world = np.linalg.inv(Twc)
                sh.aff = aff[s].copy()

    def _set_tracking_ref(self, slot: int, shell: Shell, result: BAResult):
        """setCoarseTrackingRef + makeCoarseDepthL0 (CoarseTracker.cpp:
        492-504, 105-263), fed by the BA's projections into the newest KF.
        In async mode the new template is published to the double buffer
        (coarseTracker_forNewKF, Mapping.cpp:93-100) and adopted by the
        tracking thread at its next frame."""
        pts = self.window.points
        weight = jnp.sqrt(1e-3 / (result.HdiF + 1e-12))
        valid = result.newest_res_in & (pts.status == W.PT_ACTIVE)
        frames = self.window.frames
        img = frames.images[slot]
        # rebuild pyramid of the ref image for the template
        pyr, _ = self._prep(img[..., 0])
        tpl = self._build_template(
            result.newest_proj_u, result.newest_proj_v,
            result.newest_proj_idepth, weight, valid, pyr,
        )
        self._newest_template = tpl   # mapping-side view (loop closure)
        ref = (tpl, slot, shell.id,
               np.asarray(shell.aff, np.float64).copy(),
               shell.exposure or 1.0)
        if self.sequential:
            (self.template, self.ref_slot, self.ref_shell_id,
             self.ref_aff, self.ref_exposure) = ref
            self.first_coarse_rmse = -1.0
        else:
            with self._ref_lock:
                self._pending_ref = ref

    def _flag_and_marg_points(self, flagged_frames: List[int]):
        """flagPointsForRemoval + marginalizePointsF (Mapping.cpp:249-328)."""
        cfg = self.cfg
        pts = self.window.points
        F = cfg.max_frames
        flag_mask = np.zeros(F, bool)
        for s in flagged_frames:
            flag_mask[s] = True
        fm = jnp.asarray(flag_mask)

        active = pts.status == W.PT_ACTIVE
        res_in = pts.res_state == W.RES_IN
        n_res = jnp.sum(res_in, axis=1)
        vis_in_marg = jnp.sum(res_in & fm[None, :], axis=1)

        drop_nores = active & ((pts.idepth < 0) | (n_res == 0))

        host_flagged = fm[pts.host]
        # lastResiduals[0/1]: states toward the two newest keyframes in the
        # window (MapPoint.h:89-90,148-154) — in the dense grid these are the
        # res_state columns of the two largest kf_ids
        kf_ids = np.asarray(self.window.frames.kf_id)
        valid_f = np.asarray(self.window.frames.valid)
        order = np.argsort(np.where(valid_f, kf_ids, -1))
        newest_slot = int(order[-1])
        second_slot = int(order[-2]) if valid_f.sum() >= 2 else newest_slot
        last0 = pts.res_state[:, newest_slot]
        last1 = pts.res_state[:, second_slot]
        is_oob = (
            ((n_res >= cfg.min_good_active_res_for_marg)
             & (pts.num_good_res > cfg.min_good_res_for_marg + 10)
             & (n_res - vis_in_marg < cfg.min_good_active_res_for_marg))
            # newest residual went OOB (MapPoint.h:148-149)
            | (last0 == W.RES_OOB)
            # both newest residuals are outliers (MapPoint.h:150-154)
            | ((n_res >= 2) & (last0 == W.RES_OUT) & (last1 == W.RES_OUT))
        )
        affected = active & ~drop_nores & (is_oob | host_flagged)
        inlier = (n_res >= cfg.min_good_active_res_for_marg) & (
            pts.num_good_res >= cfg.min_good_res_for_marg
        )
        well_constrained = pts.idepth_hessian > cfg.min_idepth_h_marg
        to_marg = affected & inlier & well_constrained
        to_drop = (affected & (~inlier | ~well_constrained)) | drop_nores

        # per-host counts of removed points feed the marginalization policy
        removed_host = np.asarray(pts.host)[np.asarray(to_marg | to_drop)]
        for h in removed_host:
            self._marg_counts[int(h)] = self._marg_counts.get(int(h), 0) + 1

        # marginalized-residual tallies into the connectivity map
        # (EnergyFunctional::marginalizePointsF, EnergyFunctional.cpp:566)
        F_ = self.cfg.max_frames
        marg_np = np.asarray(to_marg)
        if marg_np.any():
            res_in_np = np.asarray(res_in) & marg_np[:, None]
            onehot = np.eye(F_, dtype=np.float64)[np.asarray(pts.host)]
            counts = onehot.T @ res_in_np
            kf_of = np.asarray(self.window.frames.kf_id)
            valid_f = np.asarray(self.window.frames.valid)
            for h in range(F_):
                if not valid_f[h]:
                    continue
                for t in range(F_):
                    if not valid_f[t] or t == h or counts[h, t] == 0:
                        continue
                    key = (int(kf_of[h]), int(kf_of[t]))
                    ent = self.connectivity.setdefault(key, [0, 0])
                    ent[1] += int(counts[h, t])

        self.window = self._marg_points(self.window, self.calib, to_marg, to_drop)

    def _make_new_traces(self, slot: int, shell: Shell, pyr, grads):
        """makeNewTraces (Mapping.cpp:226-247): select candidate pixels in
        the new KF and create immature points."""
        cfg = self.cfg
        u, v, ptype, sel_valid = self._select_px(
            self.selector_pot, pyr[0], grads,
            int(cfg.desired_immature_density), shell.id,
        )
        col, wgt, gH, finite = self._sample_pattern(pyr[0], u, v)
        cand = sel_valid & finite

        # density adaptation of the selection block size across keyframes
        # (the reference re-runs selection recursively within one frame,
        # PixelSelector.cpp:118-267; the same sqrt rule applied across
        # frames converges to the target density without re-runs)
        if not cfg.use_fast:
            have = max(int(np.asarray(sel_valid).sum()), 1)
            want = cfg.desired_immature_density
            ideal = self.selector_pot * np.sqrt(have / want)
            self.selector_pot = int(np.clip(round(ideal), 2, 12))

        imm = self.imm
        slots, write = assign_free_slots(~imm.valid, cand)
        imm.valid = scatter_update(imm.valid, slots, write,
                                   jnp.ones_like(slots, dtype=bool))
        imm.host = scatter_update(imm.host, slots, write,
                                  jnp.full_like(slots, slot))
        imm.u = scatter_update(imm.u, slots, write, u)
        imm.v = scatter_update(imm.v, slots, write, v)
        imm.color = scatter_update(imm.color, slots, write, col)
        imm.weight = scatter_update(imm.weight, slots, write, wgt)
        imm.gradH = scatter_update(imm.gradH, slots, write, gH)
        imm.my_type = scatter_update(imm.my_type, slots, write,
                                     ptype.astype(jnp.float32))
        imm.energy_th = scatter_update(
            imm.energy_th, slots, write,
            jnp.full_like(u, 8 * cfg.outlier_th * cfg.overall_energy_th_weight**2),
        )
        tr = imm.trace
        fresh = epi_ops.init_trace_state(cfg.max_immature)
        imm.trace = epi_ops.TraceState(
            idepth_min=scatter_update(tr.idepth_min, slots, write, fresh.idepth_min[:len(slots)] if False else jnp.zeros_like(u)),
            idepth_max=scatter_update(tr.idepth_max, slots, write, jnp.full_like(u, jnp.inf)),
            status=scatter_update(tr.status, slots, write,
                                  jnp.full_like(slots, epi_ops.IPS_UNINITIALIZED)),
            quality=scatter_update(tr.quality, slots, write, jnp.full_like(u, 10000.0)),
            last_u=scatter_update(tr.last_u, slots, write, jnp.full_like(u, -1.0)),
            last_v=scatter_update(tr.last_v, slots, write, jnp.full_like(u, -1.0)),
            last_interval=scatter_update(tr.last_interval, slots, write,
                                         jnp.zeros_like(u)),
        )

    def _reset(self):
        """Re-initialize after an init failure (Main/System reset path)."""
        cfg = self.cfg
        self.window = W.empty_window(cfg, self.height, self.width)
        self.imm = Immatures(cfg)
        self.initialized = False
        self.init_failed = False
        self._init_first = None
        self.slot_shell = [None] * cfg.max_frames
        self.next_kf_id = 0
        self.template = None
        self._newest_template = None
        with self._ref_lock:
            self._pending_ref = None
        self.ref_slot = -1
        self.first_coarse_rmse = -1.0
        self.last_coarse_rmse = np.full(5, 100.0)

    # --------------------------------------------------------------- output
    def trajectory(self):
        """All frame poses (camToWorld) for export."""
        return [
            (s.timestamp, s.cam_to_world[:3, :3], s.cam_to_world[:3, 3])
            for s in self.shells
        ]
