"""Dynamic bilevel online adaptation as ONE jitted XLA program per frame.

Control-flow parity with the reference's per-frame adaptation
(dynaboa_benchmark.py:126-201, base_adaptor.py:222-317):

  1. no-grad forward -> init feature taps
  2. inner (lower-level) step(s) on a *virtual clone*: first-order MAML —
     the clone is just ``params - fastlr * grad(L_lower)(params)``
     (replaces learn2learn MAML(first_order=True), base_adaptor.py:119)
  3. outer (upper-level) loss at the adapted params; Adam applies its
     gradient to the REAL params (first-order semantics: the gradient at the
     adapted point is the update direction for the base point)
  4. mean-teacher EMA
  5. dynamic extra steps: while 1 - cos(tap12_pre, tap12_post) > threshold
     and fewer than ``optim_steps`` extra updates, keep taking upper-level
     steps — a ``lax.while_loop`` carrying (params, opt state, teacher, rng)

The reference crosses the host boundary many times per frame (``.item()``
similarity test, python ``random.sample`` retrieval, numpy Procrustes); here
the entire adapt-then-predict step — including retrieval and metrics — is one
XLA program: no host sync until the metrics are fetched.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.engine.retrieval import RetrievalStore, retrieve
from dynaboa_tpu.losses import (
    GMMPrior,
    frame_loss,
    keypoint_2d_loss_openpose,
    labeled_loss,
    motion_loss,
    teacher_loss,
    feature_cosine_similarities,
)
from dynaboa_tpu.metrics.eval import GenderedSMPL, evaluate_frame
from dynaboa_tpu.models.smpl import smpl_forward
from dynaboa_tpu.ops.camera import project_to_crop


class Frame(NamedTuple):
    """One preprocessed frame (batch dim kept for stream batching)."""

    image: jnp.ndarray    # (B, 224, 224, 3) normalized NHWC
    j2d: jnp.ndarray      # (B, 49, 3) normalized keypoints + conf
    pose: jnp.ndarray     # (B, 72) GT SMPL pose (zeros when unlabeled)
    betas: jnp.ndarray    # (B, 10) GT shape (zeros when unlabeled)
    gender: jnp.ndarray   # (B,) int32: 0 male / 1 female
    # (B,) float32 row validity; None (the default) means all-valid.  Used
    # by batched-window mode to pad the final partial window: pad rows
    # (mask 0) are excluded from every loss term via row_weighted_mean and
    # never recorded, so every stream frame is evaluated for any
    # window_size (the r3 runner dropped tail frames).
    mask: Any = None


def stack_frame_list(frames: list) -> "Frame":
    """Stack Frames along a new leading axis (chunked dispatch); fields
    that are None in the inputs (e.g. an absent mask) stay None."""
    return Frame(*[
        None if getattr(frames[0], k) is None
        else jnp.stack([getattr(f, k) for f in frames])
        for k in Frame._fields])


class AdaptState(NamedTuple):
    """Everything that evolves across the stream — a pure pytree, so
    checkpoint/resume is bit-exact and the whole carry shards over a mesh."""

    params: Any
    teacher_params: Any
    opt_state: Any
    hist_images: jnp.ndarray   # (interval, B, 224, 224, 3) ring buffer
    hist_j2d: jnp.ndarray      # (interval, B, 49, 3)
    step: jnp.ndarray          # () int32
    rng: jax.Array


class BilevelEngine:
    """Builds and jits the per-frame adaptation step.

    Heavy static data (SMPL bodies, GMM prior, retrieval store) enters the
    jitted programs as ARGUMENTS, not closure constants: baked-in constants
    made the HLO ~170 MB (98% dense literals — exemplar images, 3x SMPL
    posedirs, regressors) and the serialized executable ~450 MB, which cost
    minutes per compile-cache load on this host.  `_assets` holds the
    device-resident pytree; `_inject_assets` swaps the arrays into
    `self.store/self.smpls/self.prior` for the duration of a trace, so the
    program body reads tracers while the code keeps its natural
    attribute-based form.  Static fields (`SMPLModel.parents`, `faces`)
    stay python-side.
    """

    def __init__(
        self,
        cfg: AdaptConfig,
        model,                     # flax HMR module
        prior: GMMPrior,
        smpls: GenderedSMPL,
        store: RetrievalStore | None = None,
        compute_metrics: bool = True,
    ):
        self.cfg = cfg
        self.model = model
        self.prior = prior
        self.smpls = smpls
        self.store = store
        self.compute_metrics = compute_metrics
        if cfg.mixtrain and store is None:
            # both retrieval and sequential draw dereference the store
            raise ValueError("mixtrain requires a RetrievalStore")
        self.tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2,
                             eps=1e-8, eps_root=0.0)
        self._pallas_smpl = None
        if cfg.use_pallas_lbs:
            from dynaboa_tpu.kernels.lbs import PallasSMPL

            # NOTE: PallasSMPL closes over its own concrete SMPL-sized
            # buffers, which bake into the jitted step as HLO constants —
            # it is NOT routed through the _inject_assets seam, so this
            # opt-in path trades back some of the asset-args design's
            # compile-artifact savings (numerics are unaffected; the
            # buffers equal the injected neutral-SMPL assets)
            self._pallas_smpl = PallasSMPL(
                smpls.neutral, interpret=jax.default_backend() != "tpu")
        # the similarity threshold enters as a traced scalar so threshold
        # sweeps (and the worst-case benchmark) reuse one compiled program
        self._thr = jnp.float32(cfg.cos_sim_threshold)
        # The AdaptState carry is donated: params/opt/teacher/history update
        # in place in HBM instead of being copied every frame (~400 MB of
        # ResNet-50 params + Adam moments + teacher per step).  Callers get
        # the new state back and must not reuse the old one (the runner,
        # bench and apps are all linear in state; donation is a no-op on the
        # CPU test backend).
        self._injecting = False
        self._assets = self._extract_assets()
        self._jit_step = jax.jit(self._step_with_assets, donate_argnums=(0,))
        self._jit_predict = jax.jit(self._predict_with_assets)
        self.predict = lambda params, image: self._jit_predict(
            params, image, self._assets)
        self._jit_chunk = jax.jit(self._chunk_with_assets, donate_argnums=(0,))
        self._record_dynamic = cfg.record_dynamic and compute_metrics

    # -- asset plumbing (big arrays as jit args, not baked constants) -------

    _SMPL_ARRAY_FIELDS = ("v_template", "shapedirs", "posedirs",
                          "J_regressor", "lbs_weights", "J_regressor_extra",
                          "vertex_joint_ids")

    def _extract_assets(self):
        """Device-resident pytree of every large data asset the step
        programs read.  Uploaded once here; passed to every jit call."""
        def arrs(m):
            return {k: jnp.asarray(getattr(m, k))
                    for k in self._SMPL_ARRAY_FIELDS}

        return {
            "smpls": {
                "neutral": arrs(self.smpls.neutral),
                "male": arrs(self.smpls.male),
                "female": arrs(self.smpls.female),
                "J_regressor_h36m": jnp.asarray(self.smpls.J_regressor_h36m),
            },
            "store": self.store,
            "prior": self.prior,
        }

    def _inject_assets(self, assets):
        """Context that swaps the (traced) asset arrays into the attributes
        the program body reads; static fields (parents, faces) survive.

        NOT re-entrant / thread-safe: the swap mutates live engine
        attributes for the duration of a trace, so a concurrent trace of the
        same engine (e.g. a second thread jitting predict while step
        compiles) would silently read the other trace's tracers.  The guard
        turns that silent corruption into a loud error; traces within one
        engine must be serialized (all in-repo callers are)."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            if self._injecting:
                raise RuntimeError(
                    "BilevelEngine._inject_assets entered re-entrantly: two "
                    "traces of the same engine are running concurrently "
                    "(or nested).  Serialize trace-triggering calls "
                    "(step/predict/run_chunk first-compiles) per engine, or "
                    "build one engine per thread.")
            self._injecting = True
            old = (self.store, self.smpls, self.prior)
            g = assets["smpls"]
            try:
                self.store = assets["store"]
                self.smpls = GenderedSMPL(
                    neutral=old[1].neutral._replace(**g["neutral"]),
                    male=old[1].male._replace(**g["male"]),
                    female=old[1].female._replace(**g["female"]),
                    J_regressor_h36m=g["J_regressor_h36m"])
                self.prior = assets["prior"]
                yield
            finally:
                self.store, self.smpls, self.prior = old
                self._injecting = False

        return ctx()

    def _step_with_assets(self, state, frame, thr, cap, assets):
        with self._inject_assets(assets):
            return self._step(state, frame, thr, cap)

    def _chunk_with_assets(self, state, frames, thr, cap, assets):
        with self._inject_assets(assets):
            return self._run_chunk(state, frames, thr, cap)

    def _predict_with_assets(self, params, image, assets):
        with self._inject_assets(assets):
            return self._predict(params, image)

    def step(self, state: AdaptState, frame: Frame,
             cos_sim_threshold=None, extra_cap=None, assets=None):
        """``cos_sim_threshold`` and ``extra_cap`` (max extra updates beyond
        the mandatory first) are TRACED scalars: threshold sweeps, the
        worst-case benchmark (thr=-1) and the fps-vs-extra-steps curve all
        reuse ONE compiled program.

        ``assets`` overrides the engine's default (default-device) asset
        pytree — multi-device dispatch passes a device-local copy so the
        runtime doesn't silently re-upload ~tens of MB of assets to every
        non-default device on every call (see ParallelStreams)."""
        thr = self._thr if cos_sim_threshold is None else jnp.float32(
            cos_sim_threshold)
        cap = self._cap(extra_cap)
        return self._jit_step(state, frame, thr, cap,
                              self._assets if assets is None else assets)

    def _cap(self, extra_cap):
        """extra_cap is TRACED, but the while-loop's static bound is
        1 + cfg.optim_steps — a larger cap would be silently clamped and a
        sweep's curve would flatline with no warning.  Catch the concrete
        case loudly; genuinely-traced caps remain the caller's contract."""
        if extra_cap is None:
            return jnp.int32(self.cfg.optim_steps)
        if isinstance(extra_cap, (int, float)) and \
                extra_cap > self.cfg.optim_steps:
            raise ValueError(
                f"extra_cap={extra_cap} exceeds cfg.optim_steps="
                f"{self.cfg.optim_steps}, the compiled loop's static "
                "bound — raise optim_steps to sweep beyond it")
        return jnp.int32(extra_cap)

    def run_chunk(self, state: AdaptState, frames: Frame,
                  cos_sim_threshold=None, extra_cap=None, assets=None):
        thr = self._thr if cos_sim_threshold is None else jnp.float32(
            cos_sim_threshold)
        cap = self._cap(extra_cap)
        return self._jit_chunk(state, frames, thr, cap,
                               self._assets if assets is None else assets)

    def _run_chunk(self, state: AdaptState, frames: Frame, thr, cap):
        """Adapt over a chunk of frames with ``lax.scan`` — one dispatch for
        N frames (offline benchmark mode; SURVEY §5 'keep the adapt-then-
        predict step fully resident').

        Args:
          frames: Frame whose leaves have a leading chunk axis (N, B, ...).
        Returns:
          (final state, per-frame stacked outputs).
        """
        return jax.lax.scan(
            lambda st, fr: self._step(st, fr, thr, cap), state, frames)

    # -- model wrappers ----------------------------------------------------

    def _forward(self, params, image):
        return self.model.apply({"params": params}, image)

    def _decode(self, rotmat, shape, no_grad: bool = False):
        """SMPL decode; ``no_grad=True`` marks call sites outside gradient
        computations, where the Pallas skinning kernel (no VJP) may serve."""
        lbs_fn = self._pallas_smpl if no_grad else None
        out = smpl_forward(self.smpls.neutral, shape, rotmat, lbs_fn=lbs_fn)
        return out.joints, out.vertices

    def _predict(self, params, image):
        """Plain inference: image -> (rotmat, shape, cam, s3d, verts, s2d)."""
        rotmat, shape, cam, feats = self._forward(params, image)
        s3d, verts = self._decode(rotmat, shape, no_grad=True)
        s2d = project_to_crop(cam, s3d)["normed"]
        return dict(rotmat=rotmat, shape=shape, cam=cam, s3d=s3d,
                    verts=verts, s2d=s2d, feats=feats)

    # -- loss builders -------------------------------------------------------

    def _teacher_active(self, level: str) -> bool:
        use_temporal = (self.cfg.use_temporal_losses_lower if level == "lower"
                        else self.cfg.use_temporal_losses_upper)
        return use_temporal and self.cfg.use_meanteacher

    def _teacher_outs(self, teacher_params, frame: Frame):
        """Mean-teacher forward on the current frame — the distillation
        targets.  Constants w.r.t. the student (the reference detaches the
        teacher, base_adaptor.py:320-343)."""
        t_rotmat, t_shape, t_cam, _ = self._forward(
            teacher_params, frame.image)
        t_s3d, _ = self._decode(t_rotmat, t_shape)
        t_s2d = project_to_crop(t_cam, t_s3d)["normed"]
        return (t_rotmat, t_shape, t_s2d, t_s3d)

    def _partial_level(self, params, frame: Frame, state: AdaptState,
                       bank, level: str, mixtrain_override=None):
        """Shared lower/upper loss builder, EXCLUDING the teacher term
        (reference base_adaptor.py:222-268 / 271-317).

        TPU-first batching: the current frame, the motion-history frame and
        the retrieved exemplar run through ONE batched backbone forward (the
        reference issues three separate batch-1 forwards per loss).  The
        exemplar ``bank`` is retrieved by the caller from the most recent
        feature snapshot, so the batched forward has no data dependence on
        its own output.

        The teacher term lives in ``_level_loss`` (via ``_teacher_outs``):
        it needs the carried teacher params, which vary per dynamic
        iteration, while everything here depends only on the frame, the
        history and the exemplar bank.

        Returns ``((loss, touts), (frame_out, aux))`` where ``touts`` are the
        frame-row outputs the distillation consumes and ``frame_out`` carries
        the frame-row predictions + the 15 feature taps.
        """
        cfg = self.cfg
        use_frame = (cfg.use_frame_losses_lower if level == "lower"
                     else cfg.use_frame_losses_upper)
        use_temporal = (cfg.use_temporal_losses_lower if level == "lower"
                        else cfg.use_temporal_losses_upper)
        use_mixtrain = (cfg.lower_level_mixtrain if level == "lower"
                        else cfg.upper_level_mixtrain)
        if mixtrain_override is not None:   # fast_extra_updates experiment
            use_mixtrain = mixtrain_override
        use_motion = use_temporal and cfg.use_motion

        B = frame.image.shape[0]
        imgs = [frame.image]
        slot = state.step % cfg.interval
        if use_motion:
            imgs.append(state.hist_images[slot])
        n_ex = 0
        if use_mixtrain:
            imgs.append(bank.images)
            n_ex = bank.images.shape[0]
        x = jnp.concatenate(imgs, axis=0) if len(imgs) > 1 else imgs[0]

        rotmat, shape, cam, feats_all = self._forward(params, x)
        s3d, verts = self._decode(rotmat, shape)
        s2d = project_to_crop(cam, s3d)["normed"]

        fr = slice(0, B)
        hi = slice(B, 2 * B) if use_motion else None
        ex = slice(x.shape[0] - n_ex, x.shape[0]) if use_mixtrain else None

        # frame-row feature taps (the contract of reference hmr.py:128-174)
        feats = tuple(f[fr] for f in feats_all)

        aux: dict[str, jnp.ndarray] = {}
        loss = jnp.zeros((), jnp.float32)

        if use_frame:
            loss, parts = frame_loss(
                self.prior, s2d[fr], rotmat[fr], shape[fr], frame.j2d,
                cfg.s2dloss_weight, cfg.shape_prior_weight,
                cfg.pose_prior_weight, frame.mask,
                kp_loss_fn=(keypoint_2d_loss_openpose
                            if cfg.keypoint_source == "openpose" else None),
            )
            aux.update(parts)
            aux["unlabelloss"] = loss

        if use_motion:
            # webcam path computes motion over the OpenPose joint half
            # (reference dynaboa_webcam.py:277 uses [:, :25]); benchmark /
            # internet paths over the GT half (base_adaptor.py:258,307).
            # Active strictly after `interval` frames
            # (base_adaptor.py:257,306); always computed (it rides the
            # batched forward), masked when inactive.
            ksl = (slice(None, 25) if cfg.keypoint_source == "openpose"
                   else slice(25, None))
            hist_j2d = state.hist_j2d[slot]
            ml = motion_loss(s2d[fr][:, ksl], frame.j2d[:, ksl],
                             s2d[hi][:, ksl], hist_j2d[:, ksl], frame.mask)
            active = (state.step > cfg.interval).astype(loss.dtype)
            loss = loss + ml * active * cfg.motionloss_weight
            aux["motion_loss"] = ml * active

        if use_mixtrain:
            ll, lparts = labeled_loss(
                rotmat[ex], shape[ex], s2d[ex], s3d[ex],
                bank.pose, bank.betas, bank.keypoints, bank.pose_3d,
            )
            loss = loss + ll * cfg.labelloss_weight
            aux["labledloss"] = ll
            aux.update(lparts)   # ll/ul labled_* sub-terms (base_adaptor:371-375)

        touts = (rotmat[fr], shape[fr], s2d[fr], s3d[fr])
        frame_out = dict(rotmat=rotmat[fr], shape=shape[fr], cam=cam[fr],
                         s3d=s3d[fr], verts=verts[fr], s2d=s2d[fr],
                         feats=feats)
        return (loss, touts), (frame_out, aux)

    def _level_loss(self, params, frame: Frame, state: AdaptState,
                    bank, level: str, teacher_params=None,
                    mixtrain_override=None):
        """Full loss at one level: partial terms + teacher distillation
        (reference base_adaptor.py:222-317).  The split into
        ``_partial_level`` + teacher term exists because the teacher term
        needs the CARRIED teacher params (EMA'd after every dynamic update)
        while everything in the partial form depends only on the frame, the
        history and the exemplar bank.

        ``teacher_params`` defaults to the frame-initial teacher, which is
        correct for the lower level and for update 0.
        """
        (loss, touts), (frame_out, aux) = self._partial_level(
            params, frame, state, bank, level, mixtrain_override)
        if self._teacher_active(level):
            t_out = self._teacher_outs(
                state.teacher_params if teacher_params is None
                else teacher_params, frame)
            tl, tparts = teacher_loss(*touts, *t_out, row_w=frame.mask)
            loss = loss + tl * self.cfg.teacherloss_weight
            aux["teacherloss"] = tl
            aux.update({f"teacher_{k}": v for k, v in tparts.items()})
        return loss, (frame_out["feats"], aux)

    def _retrieve(self, feat5, rng):
        """Exemplar draw keyed on the given 2048-d feature snapshot
        (reference base_adaptor.py:82-96); static no-op when mixtrain is
        off."""
        cfg = self.cfg
        if not (cfg.lower_level_mixtrain or cfg.upper_level_mixtrain):
            return None
        if cfg.retrieval:
            return retrieve(self.store, feat5, rng, cfg.sample_num)
        return jax.tree.map(lambda a: a[: cfg.sample_num], self.store.bank)

    # -- optimizer plumbing ------------------------------------------------

    def _outer_update(self, grads, params, opt_state):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _ema_teacher(self, teacher, params):
        """teacher = alpha * teacher + (1 - alpha) * student
        (reference base_adaptor.py:193-201)."""
        a = self.cfg.alpha
        return jax.tree.map(lambda t, p: a * t + (1.0 - a) * p, teacher, params)

    def _metrics(self, verts, frame: Frame, targets=None):
        """``targets``: precomputed GT-side evaluation tensors (gt_targets),
        shared by every per-update evaluation of one frame."""
        if not self.compute_metrics:
            z = jnp.zeros((frame.image.shape[0],))
            return {"mpjpe": z, "pampjpe": z, "pve": z}
        if targets is None:
            return evaluate_frame(self.smpls, verts, frame.pose, frame.betas,
                                  frame.gender)
        from dynaboa_tpu.metrics.eval import evaluate_pred

        return evaluate_pred(self.smpls, verts, targets)

    # -- the per-frame program ----------------------------------------------

    def _step(self, state: AdaptState, frame: Frame, cos_sim_threshold=None,
              extra_cap=None):
        cfg = self.cfg
        thr = (jnp.float32(cfg.cos_sim_threshold)
               if cos_sim_threshold is None else cos_sim_threshold)
        cap = (jnp.int32(cfg.optim_steps) if extra_cap is None
               else extra_cap)
        rng = state.rng
        outputs: dict[str, Any] = {}

        # GT-side evaluation targets are prediction-independent: three SMPL
        # forwards computed ONCE per frame and shared by the final metrics
        # and every per-update record (see gt_targets)
        eval_targets = None
        if self.compute_metrics:
            from dynaboa_tpu.metrics.eval import gt_targets

            eval_targets = gt_targets(self.smpls, frame.pose, frame.betas,
                                      frame.gender)

        if cfg.use_boa:
            # 1. pre-adaptation features (no grad; reference
            # dynaboa_benchmark.py:132-133)
            rotmat0, shape0, cam0, init_feats = self._forward(
                state.params, frame.image)

            # 2. inner step(s) on the virtual clone.  Retrieval for inner
            # step 0 keys off init_feats[5] — identical to the reference,
            # where the clone's pre-adapt forward IS the base model's.
            learner = state.params
            lower_aux = {}
            prev5 = init_feats[5][0]
            for i in range(cfg.inner_step):
                rng, r = jax.random.split(rng)
                bank = self._retrieve(prev5, r)
                (ll, (lfeats, lower_aux)), g = jax.value_and_grad(
                    self._level_loss, has_aux=True
                )(learner, frame, state, bank, "lower")
                learner = jax.tree.map(
                    lambda p, gg: p - cfg.fastlr * gg, learner, g
                )
                lower_aux["loss"] = ll
                prev5 = lfeats[5][0]
                if cfg.record_lowerlevel:
                    pred = self._predict(learner, frame.image)
                    m = self._metrics(pred["verts"], frame, eval_targets)
                    outputs[f"lower_{i}_mpjpe"] = m["mpjpe"]
                    outputs[f"lower_{i}_pampjpe"] = m["pampjpe"]
            outputs["lower"] = lower_aux

            # 3 + 4. outer updates, all inside ONE while_loop.  Iteration 0
            # is the mandatory update whose gradient is evaluated at the
            # inner-adapted params (the clone); iterations 1..optim_steps are
            # the dynamic extra steps (gradient at the real params), gated by
            # the tap-12 cosine similarity between *consecutive parameter
            # snapshots* — exactly the reference pairing, since the loss
            # forward of iteration n runs at the post-update params of
            # iteration n-1 (dynaboa_benchmark.py:147-192).  Folding the
            # first update into the loop body halves the number of
            # backbone-gradient instances XLA has to compile.  Retrieval in
            # iteration n keys off the features of params_n (the carried
            # post-update snapshot of iteration n-1), matching the
            # reference's own-forward features for n >= 1 and one inner-step
            # stale for n == 0 (documented divergence: feature deltas per
            # update are ~cos_sim_threshold, far below cluster separation).
            #
            # The per-update records (tap-12 sim, upper loss, metrics after
            # every update — reference dynaboa_benchmark.py:158-191) ride the
            # loop carry as fixed-size arrays; the metric evaluation reuses
            # the hoisted GT targets, so recording costs one B=1 SMPL decode
            # + a 14-joint Procrustes per update (measured ~free).
            #
            # A gradient-pipelined variant (carry grads, gate the backward
            # under lax.cond, reuse the loss forward as the convergence
            # signal) was built and MEASURED SLOWER on the v5e: the trailing
            # forward then drags the whole batched loss pipeline (3-row SMPL
            # decode, GMM prior, labeled loss) into every frame, and the
            # lax.cond boundary forces residual materialization — streaming
            # 55 vs 67 fps, worst-case 76.6 vs 72.7 ms/frame.  The B=1
            # post-update forward below is the cheaper convergence probe.
            max_updates = 1 + (cfg.optim_steps if cfg.dynamic_boa else 0)
            rec_on = self._record_dynamic
            B = frame.image.shape[0]

            def cond(carry):
                (_, _, _, _, _, sim, n, _, _, _, _) = carry
                return jnp.logical_and(
                    n < max_updates,
                    jnp.logical_or(
                        n == 0,
                        jnp.logical_and((1.0 - sim) > thr, n <= cap)),
                )

            def grad_at(eval_params, teacher, bank, mixtrain_override=None):
                (ul, (_, aux)), g = jax.value_and_grad(
                    self._level_loss, has_aux=True
                )(eval_params, frame, state, bank, "upper", teacher,
                  mixtrain_override)
                return ul, aux, g

            # the convergence probe image: full-res by default (the probe
            # forward then doubles as the final prediction); the
            # probe_res_factor experiment average-pools it, trading gate /
            # per-step-record fidelity for an ~f^2-cheaper probe
            pf = cfg.probe_res_factor
            if pf == 1:
                probe_image = frame.image
            else:
                Bp, Hp, Wp, Cp = frame.image.shape
                if Hp % pf or Wp % pf:
                    raise ValueError(
                        f"probe_res_factor={pf} must divide the image "
                        f"resolution {Hp}x{Wp} (the probe average-pools "
                        f"by integer factor)")
                probe_image = frame.image.reshape(
                    Bp, Hp // pf, pf, Wp // pf, pf, Cp).mean(axis=(2, 4))

            def body(carry):
                (params, opt_state, teacher, rng, pred_c, sim, n,
                 first, sims, losses, recs) = carry
                rng, r = jax.random.split(rng)
                eval_params = jax.lax.cond(
                    n == 0, lambda: learner, lambda: params)
                bank = self._retrieve(pred_c[3][5][0], r)
                # the carried `teacher` (EMA'd after the previous update) is
                # the distillation target — reference base_adaptor.py:320-343
                # reads self.teacher, which dynaboa_benchmark.py:176-187
                # updates after every optimizer step
                if cfg.fast_extra_updates and cfg.upper_level_mixtrain:
                    # fast_extra_updates experiment: extra updates (n >= 1)
                    # drop the exemplar row from the batched gradient —
                    # missing labeled-aux keys zero-fill so both cond
                    # branches return one structure
                    def full_b(a):
                        return grad_at(*a)

                    def fast_b(a):
                        ul, aux, g = grad_at(*a, mixtrain_override=False)
                        aux = {**{k: jnp.zeros(()) for k in aux_t
                                  if k != "loss"}, **aux}
                        return ul, aux, g

                    ul, aux, g = jax.lax.cond(
                        n == 0, full_b, fast_b,
                        (eval_params, teacher, bank))
                else:
                    ul, aux, g = grad_at(eval_params, teacher, bank)
                aux["loss"] = ul
                losses = losses.at[n].set(ul)
                params, opt_state = self._outer_update(g, params, opt_state)
                if cfg.use_meanteacher:
                    teacher = self._ema_teacher(teacher, params)
                # post-update forward: yields the convergence signal (tap 12)
                # AND the model outputs at the updated params, so the final
                # prediction after the loop reuses this forward instead of
                # running the backbone again (reference fwd at
                # dynaboa_benchmark.py:163-166 + inference fwd at :189 — here
                # they are one).
                rotmat_p, shape_p, cam_p, feats_post = self._forward(
                    params, probe_image)
                sim = feature_cosine_similarities(
                    (pred_c[3][12],), (feats_post[12],))[0]
                sims = sims.at[n].set(sim)
                if rec_on:
                    # metric record after update n (reference inference per
                    # dynamic step, dynaboa_benchmark.py:158-191)
                    _, verts_p = self._decode(rotmat_p, shape_p,
                                              no_grad=True)
                    m = self._metrics(verts_p, frame, eval_targets)
                    recs = (recs[0].at[n].set(m["mpjpe"]),
                            recs[1].at[n].set(m["pampjpe"]),
                            recs[2].at[n].set(m["pve"]))
                first = jax.tree.map(
                    lambda a, b: jnp.where(n == 0, a, b), aux, first)
                return (params, opt_state, teacher, rng,
                        (rotmat_p, shape_p, cam_p, feats_post),
                        sim, n + 1, first, sims, losses, recs)

            # aux-log structure template (zeros; filled by iteration 0).
            # eval_shape traces without compiling, so this adds no HLO.
            bank_t = self._retrieve(prev5, rng)
            aux_shapes = jax.eval_shape(
                lambda p: self._level_loss(
                    p, frame, state, bank_t, "upper")[1][1],
                learner)
            aux_t = jax.tree.map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), aux_shapes)
            aux_t["loss"] = jnp.zeros(())

            sims_init = jnp.zeros((max_updates,), jnp.float32)
            losses_init = jnp.zeros((max_updates,), jnp.float32)
            recs_init = (
                tuple(jnp.zeros((max_updates, B), jnp.float32)
                      for _ in range(3))
                if rec_on else tuple(jnp.zeros((0,), jnp.float32)
                                     for _ in range(3)))

            # carry shapes must match the probe outputs: with a reduced-res
            # probe the spatial feature taps shrink, so the initial carried
            # prediction is a probe-res forward at the pre-update params
            # (also makes the n=0 gate compare same-resolution taps)
            pred_c0 = ((rotmat0, shape0, cam0, init_feats) if pf == 1
                       else self._forward(state.params, probe_image))
            (params, opt_state, teacher, rng, pred_f, sim12, nupd,
             upper_aux, sims, losses, recs) = jax.lax.while_loop(
                cond, body,
                (state.params, state.opt_state, state.teacher_params,
                 rng, pred_c0,
                 jnp.zeros(()), jnp.zeros((), jnp.int32), aux_t,
                 sims_init, losses_init, recs_init),
            )
            outputs["upper"] = upper_aux
            outputs["optim_steps"] = nupd - 1      # extra steps beyond the 1st
            outputs["feat_sim_final"] = sim12
            # per-update trajectories (reference dynaboa_benchmark.py:158-191
            # feat_sims / step statistics); entries beyond optim_steps are 0
            outputs["per_step_sims"] = sims
            outputs["per_step_loss"] = losses
            if rec_on:
                outputs["per_step_mpjpe"] = recs[0]
                outputs["per_step_pampjpe"] = recs[1]
                outputs["per_step_pve"] = recs[2]
        else:
            # plain single-level online adaptation (reference
            # dynaboa_benchmark.py:194-201)
            rng, r = jax.random.split(rng)
            _, _, _, init_feats0 = self._forward(state.params, frame.image)
            bank = self._retrieve(init_feats0[5][0], r)
            (ll, (_, lower_aux)), g = jax.value_and_grad(
                self._level_loss, has_aux=True
            )(state.params, frame, state, bank, "lower")
            lower_aux["loss"] = ll
            outputs["lower"] = lower_aux
            params, opt_state = self._outer_update(
                g, state.params, state.opt_state)
            teacher = (self._ema_teacher(state.teacher_params, params)
                       if cfg.use_meanteacher else state.teacher_params)

        # 5. final inference + metrics at the adapted weights.  Under BOA the
        # while-loop's last post-update forward already ran the backbone at
        # the final params, so only the SMPL decode + projection remain here
        # (with a reduced-resolution probe the probe outputs are not
        # prediction-fidelity, so one full-res forward runs here instead).
        if cfg.use_boa:
            if cfg.probe_res_factor != 1:
                pred_f = self._forward(params, frame.image)
            rotmat_f, shape_f, cam_f, feats_f = pred_f
            s3d_f, verts_f = self._decode(rotmat_f, shape_f, no_grad=True)
            pred = dict(rotmat=rotmat_f, shape=shape_f, cam=cam_f,
                        s3d=s3d_f, verts=verts_f,
                        s2d=project_to_crop(cam_f, s3d_f)["normed"],
                        feats=feats_f)
            # observability: per-tap similarity between the pre-adaptation
            # and final features (the reference logs per-update-step sims,
            # base_adaptor.py:211-219; the per-step tap-12 trajectory is in
            # outputs["per_step_sims"])
            outputs["feat_sim"] = feature_cosine_similarities(
                init_feats, pred["feats"])
        else:
            pred = self._predict(params, frame.image)
        metrics = self._metrics(pred["verts"], frame, eval_targets)
        outputs.update(metrics)
        outputs["verts"] = pred["verts"]
        outputs["rotmat"] = pred["rotmat"]
        outputs["beta"] = pred["shape"]
        outputs["cam"] = pred["cam"]

        # 6. ring-buffer write (slot currently holds frame step-interval,
        # which was consumed by the motion loss above)
        slot = state.step % cfg.interval
        new_state = AdaptState(
            params=params,
            teacher_params=teacher,
            opt_state=opt_state,
            hist_images=state.hist_images.at[slot].set(frame.image),
            hist_j2d=state.hist_j2d.at[slot].set(frame.j2d),
            step=state.step + 1,
            rng=rng,
        )
        return new_state, outputs

    # -- state construction / reset ------------------------------------------

    def init_state(self, params, batch_size: int = 1,
                   img_res: int = 224) -> AdaptState:
        """Fresh adaptation state; also the documented remedy for adaptation
        divergence (the webcam path's ``reload()``,
        reference dynaboa_webcam.py:184-195)."""
        # student and teacher start identical but must be DISTINCT buffers:
        # the jitted step donates the whole state, and aliased leaves would
        # be donated twice (jnp.asarray on a jnp array is a no-op)
        teacher = jax.tree.map(lambda p: jnp.array(p, copy=True), params)
        return AdaptState(
            params=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            teacher_params=teacher,
            opt_state=self.tx.init(params),
            hist_images=jnp.zeros(
                (self.cfg.interval, batch_size, img_res, img_res, 3),
                jnp.float32),
            hist_j2d=jnp.zeros((self.cfg.interval, batch_size, 49, 3),
                               jnp.float32),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(self.cfg.seed),
        )
