"""Multi-stream data parallelism over a TPU mesh.

The reference is strictly single-GPU / single-stream (SURVEY §2d): frames are
sequential because each frame's adaptation mutates the weights the next frame
uses.  The faithful scale-out axis is therefore *across independent
(seq, person) streams* — 3DPW #PS has 37 of them — each with private weights
and optimizer state.

Two execution modes, chosen by what the parallelism actually needs:

- **Independent streams (default): per-device dispatch.**  There is NO
  cross-stream communication, so SPMD buys nothing — each stream's
  ``AdaptState`` is committed to its own device and the ordinary
  single-stream jitted program (donated carry, data-dependent
  ``lax.while_loop`` and all) is dispatched to it asynchronously.  JAX
  dispatches are non-blocking, so all devices run concurrently; aggregate
  throughput is devices x single-chip fps by construction, and the real
  chip reuses the exact executable the single-stream bench runs (measured
  on the v5e: 64.8 fps through this wrapper vs 63.4 bare — see
  docs/PERF.md).  Executables are device-bound, so each device pays one
  first-use compile (persistent-cached on TPU).  This matters because the
  alternative was measured slow:
  ``shard_map``-lowering the full bilevel program costs 4.3x on this
  backend (13.5 vs 57.8 fps on a ONE-device mesh, donation irrelevant,
  vmap bypassed) — the SPMD partitioner's handling of the dynamic
  while_loop program, not any real collective or batching cost.

- **Replicated streams (``share_weights=True``): shard_map + psum.**  Joint
  adaptation averages the adapted weights across all streams after every
  step — a genuine collective riding ICI — so this mode runs as one
  SPMD program: ``shard_map`` over a 1-D ``jax.sharding.Mesh`` with
  ``vmap`` batching multiple streams per device and ``pmean`` for the
  consensus.

Perf guidance (measured, docs/PERF.md): keep ``num_streams == mesh.size``
in share_weights mode on TPU — vmap over a per-stream-params axis turns
every convolution into a per-sample-weight convolution the MXU cannot
batch (measured 15x slower per step).  Independent mode time-slices
streams on a device instead of vmapping them, so any S works.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # older jax
    from jax.experimental.shard_map import shard_map

from dynaboa_tpu.engine.bilevel import BilevelEngine, Frame
from dynaboa_tpu.engine.checkpoint import malloc_trim


def make_mesh(n_devices: int | None = None, axis: str = "stream") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if not 1 <= n_devices <= len(devs):
        # silent clamping would mis-attribute a benchmark's device count
        raise ValueError(f"n_devices={n_devices} but {len(devs)} device(s) "
                         "are available")
    return Mesh(np.array(devs[:n_devices]), (axis,))


class ParallelStreams:
    """Runs S independent adaptation streams over a device mesh.

    Independent mode: states are a LIST of per-stream ``AdaptState``s, each
    committed to ``mesh.devices[s % D]``; ``step`` returns (list of new
    states, list of per-stream output dicts) with nothing fetched — use
    :func:`stack_outs` to materialize.  share_weights mode: states are one
    stacked ``AdaptState`` with a leading stream axis sharded over the
    mesh (S must be a multiple of the mesh size), outputs likewise.
    """

    def __init__(self, engine: BilevelEngine, mesh: Mesh,
                 share_weights: bool = False):
        self.engine = engine
        self.mesh = mesh
        self.devices = list(mesh.devices.ravel())
        self.axis = mesh.axis_names[0]
        self.share_weights = share_weights
        # independent mode: one device-local copy of the asset pytree per
        # mesh device, uploaded ONCE.  Passing the engine's default-device
        # assets into a jit whose other inputs live on device s would make
        # the runtime re-copy the whole asset tree (SMPL tensors, exemplar
        # bank, GMM — tens of MB) to device s on EVERY dispatch.
        self._dev_assets = {}
        if share_weights:
            self._build_spmd()

    def _assets_for(self, dev):
        a = self._dev_assets.get(dev)
        if a is None:
            a = jax.device_put(self.engine._assets, dev)
            self._dev_assets[dev] = a
        return a

    # -- SPMD (share_weights) program ---------------------------------------

    def _build_spmd(self):
        engine = self.engine
        thr = jnp.float32(engine.cfg.cos_sim_threshold)
        cap = jnp.int32(engine.cfg.optim_steps)

        def local_step(state, frame, assets):
            # assets ride as a REPLICATED shard_map argument, through the
            # same `_inject_assets` seam the single-stream programs use —
            # closing over them here would bake the exemplar bank / SMPL
            # tensors / GMM as HLO constants (the ~170 MB-HLO problem;
            # guarded by tests/test_parallel.py TestNoBakedConstantsSPMD)
            with engine._inject_assets(assets):
                new_state, out = jax.vmap(
                    lambda st, fr: engine._step(st, fr, thr, cap)
                )(state, frame)
            # average the adapted weights across all streams so every
            # stream continues from consensus params
            mean_params = jax.lax.pmean(
                jax.tree.map(lambda x: x.mean(0), new_state.params),
                self.axis,
            )
            bcast = jax.tree.map(
                lambda m, x: jnp.broadcast_to(m, x.shape),
                mean_params, new_state.params,
            )
            new_state = new_state._replace(params=bcast)
            return new_state, out

        spec = P(self.axis)
        try:        # jax >= 0.8: replication checking flag renamed
            smapped = shard_map(local_step, mesh=self.mesh,
                                in_specs=(spec, spec, P()),
                                out_specs=(spec, spec), check_vma=False)
        except TypeError:
            smapped = shard_map(local_step, mesh=self.mesh,
                                in_specs=(spec, spec, P()),
                                out_specs=(spec, spec), check_rep=False)
        # donate the stacked carry like the single-stream program does —
        # without it every SPMD step double-buffers the whole S-stream
        # state (~S x 400 MB at full scale) instead of updating in place
        self._spmd_jit = jax.jit(smapped, donate_argnums=(0,))
        # Replicate the asset tree over the mesh ONCE.  Passing the
        # default-device `engine._assets` directly would make the runtime
        # re-shard (re-upload) the whole tree to every device on EVERY
        # step — the same per-dispatch copy tax `_assets_for` prevents in
        # independent mode.
        self._spmd_assets = jax.device_put(
            engine._assets, jax.sharding.NamedSharding(self.mesh, P()))
        self._step = lambda states, frames: self._spmd_jit(
            states, frames, self._spmd_assets)

    # -- state management ----------------------------------------------------

    def init_states(self, params, num_streams: int, img_res: int = 224,
                    batch_size: int = 1):
        """Fresh per-stream states, each with a distinct RNG key.

        Independent mode: a list of states committed round-robin to the
        mesh devices.  share_weights mode: one stacked state with the
        leading stream axis sharded over the mesh."""
        base = self.engine.init_state(params, batch_size=batch_size,
                                      img_res=img_res)
        S = num_streams
        keys = jax.random.split(jax.random.PRNGKey(self.engine.cfg.seed), S)

        if not self.share_weights:
            # Each stream must own PRIVATE buffers: the engine's jitted step
            # donates its carry, and device_put to the array's CURRENT
            # device is a no-op alias — without a copy, two streams on the
            # default device would share (and double-donate) base's leaves.
            # Cross-device device_put already materializes a private copy,
            # so the explicit jnp.copy (a full ~state-sized transient on
            # the default device) is paid only for same-device streams.
            D = len(self.devices)
            base_dev = getattr(jax.tree.leaves(base)[0], "device", None)
            out = []
            for s in range(S):
                st = base._replace(rng=keys[s])
                dev = self.devices[s % D]
                if dev == base_dev:
                    st = jax.tree.map(jnp.copy, st)
                out.append(jax.device_put(st, dev))
            return out

        if S % self.mesh.size != 0:
            raise ValueError(f"num_streams={S} must be divisible by mesh "
                             f"size {self.mesh.size}")

        def tile(x):
            return jnp.broadcast_to(x[None], (S,) + x.shape)

        state = jax.tree.map(tile, base)
        state = state._replace(rng=keys,
                               step=jnp.zeros((S,), jnp.int32))
        return jax.device_put(
            state,
            jax.tree.map(
                lambda _: jax.sharding.NamedSharding(self.mesh, P(self.axis)),
                state),
        )

    def step(self, states, frames):
        """Advance every stream by one frame.

        Independent mode: ``states`` is the list from :meth:`init_states`;
        ``frames`` is a list of S single-stream ``Frame``s (or one stacked
        Frame with a leading S axis, which is sliced).  Returns (new state
        list, list of output dicts) — all device-resident, dispatched
        asynchronously across the mesh.

        share_weights mode: stacked state/Frame with leading (S, B, ...)
        axes, as one SPMD program."""
        if self.share_weights:
            return self._step(states, frames)

        if isinstance(frames, Frame):    # stacked (S, B, ...) Frame
            S = len(states)
            frames = [jax.tree.map(lambda x: x[s], frames)
                      for s in range(S)]
        new_states, outs = [], []
        D = len(self.devices)
        for s, (state, frame) in enumerate(zip(states, frames, strict=True)):
            dev = self.devices[s % D]
            frame = jax.device_put(frame, dev)
            st, out = self.engine.step(state, frame,
                                       assets=self._assets_for(dev))
            new_states.append(st)
            outs.append(out)
        return new_states, outs


def stack_frames(items: list[dict], keypoint_source: str = "gt") -> Frame:
    """Stack one frame from each of S streams into a (S, 1, ...) Frame.

    Per-item assembly delegates to ``runner.frame_from_item`` so fused
    (``raw_image``) items and the ``mask`` field behave exactly like the
    sequential path — structurally identical Frame pytrees share one
    compiled program."""
    from dynaboa_tpu.engine.runner import frame_from_item

    fs = [frame_from_item(it, keypoint_source) for it in items]
    return jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *fs)


def stack_outs(outs: list[dict]) -> dict:
    """Materialize a list of per-stream output dicts (independent mode)
    into one dict of host arrays with a leading S axis."""
    return {k: np.stack([np.asarray(o[k]) for o in outs])
            for k in outs[0]}


_stack_metrics_cache: dict = {}


def _stack_metrics_jit(window: list[dict]):
    """Pack a window of per-frame metric dicts into one (3, W, B) device
    array — one compiled program per window length (the steady length is
    fixed; only each stream's tail differs)."""
    n = len(window)
    fn = _stack_metrics_cache.get(n)
    if fn is None:
        fn = jax.jit(lambda w: jnp.stack(
            [jnp.stack([o[k] for o in w])
             for k in ("mpjpe", "pampjpe", "pve")]))
        _stack_metrics_cache[n] = fn
    return fn(window)


class StreamView:
    """Lazy view of selected indices of an underlying stream.

    Items load ON DEMAND through the stream's ``__getitem__`` — a view over
    a 35k-frame 3DPW stream holds only its index list, never the ~600 KB
    preprocessed crops (the eager ``list(stream)`` the r3 partitioner did
    would have needed ~21 GB of host RAM for the real dataset)."""

    def __init__(self, stream, indices: list[int]):
        self.stream = stream
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int) -> dict:
        return self.stream[self.indices[i]]

    def __iter__(self):
        return (self.stream[i] for i in self.indices)


def partition_items(stream, n_groups: int) -> list[StreamView]:
    """Split a dataset stream into n independent adaptation streams —
    LAZILY: returns :class:`StreamView`\\ s over index subsets; nothing is
    materialized.

    3DPW-style streams expose ``seq_lengths``: whole (seq, person) tracks
    are assigned round-robin (frames within a track stay ordered — the
    track IS the temporal stream; splitting one would break the motion
    history).  Other streams are chunked contiguously."""
    if not hasattr(stream, "__getitem__"):
        stream = list(stream)   # pure iterator: materialize once (fallback)
    n = len(stream)
    lengths = getattr(stream, "seq_lengths", None)
    if lengths:
        groups: list[list[int]] = [[] for _ in range(n_groups)]
        start = 0
        for t, ln in enumerate(lengths):
            groups[t % n_groups].extend(range(start, start + ln))
            start += ln
        idx_groups = [g for g in groups if g]
    else:
        per = (n + n_groups - 1) // n_groups
        idx_groups = [list(range(i, min(i + per, n)))
                      for i in range(0, n, per)]
    return [StreamView(stream, g) for g in idx_groups]


def _rss_mb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return float("nan")


def run_parallel(engine, params, groups: list,
                 mesh: Mesh | None = None, keypoint_source: str = "gt",
                 log=print, progress_every: int = 0) -> dict:
    """Adapt S independent streams concurrently across the mesh devices —
    the product entry for the scale-out path (``--parallel_streams``).

    ``groups`` is one item sequence per stream — ``partition_items``' LAZY
    StreamViews (items load on access) or plain lists; callers must NOT
    materialize the views (that is the ~21 GB eager pattern the lazy
    partition exists to prevent).

    Each stream carries PRIVATE weights/optimizer/history (adaptation
    starts from the base model per stream; nothing leaks across streams —
    unlike the reference's single pass, which carries one model across the
    whole sequence-sorted set).  Streams of different lengths simply stop
    dispatching when exhausted.  Per-frame metric scalars stay on device
    until the end (one packed fetch per stream).

    ``progress_every`` > 0 logs a line every N dispatched frames with the
    aggregate dispatch rate and host RSS — 3DPW-scale runs take tens of
    minutes and would otherwise be silent until the final summary.

    Returns {"mpjpe", "pampjpe", "pve", "frames", "fps",
    "per_stream": [...]}."""
    import time

    from dynaboa_tpu.engine.runner import frame_from_item

    mesh = mesh or make_mesh()
    par = ParallelStreams(engine, mesh)
    S = len(groups)
    # probe the first NON-EMPTY stream for the crop resolution (an empty
    # group is legal — unequal tracks — but all-empty has no work)
    probe_s = next((s for s, g in enumerate(groups) if len(g)), None)
    if probe_s is None:
        raise ValueError("run_parallel: every stream is empty")
    first = groups[probe_s][0]
    img_res = (first["image"].shape[0] if "image" in first
               else int(first.get("out_res", 224)))
    states = par.init_states(params, S, img_res=img_res)
    D = len(par.devices)
    pos = [0] * S
    outs: list[list[dict]] = [[] for _ in range(S)]
    # Per-frame metric scalars are flushed to host in packed windows so a
    # 35k-frame run never holds tens of thousands of live device buffers
    # (or a 4k-operand stack program at the end).  Each flush packs the
    # window into one (3, W) stack whose device->host copy starts
    # immediately and is CONSUMED one flush later, overlapping the round
    # trip with further dispatches.  Draining flush k-1 before starting
    # flush k also BOUNDS in-flight work: a stream can run at most
    # 2*FLUSH frames ahead of its own execution, so host memory pinned by
    # dispatched-but-unexecuted frames stays O(S * FLUSH) however slow the
    # device is (a gate firing 7 extras/frame must not let the dispatch
    # loop pin gigabytes of frames).
    FLUSH = 64
    host_outs: list[list[np.ndarray]] = [[] for _ in range(S)]
    inflight: list[Any] = [None] * S

    def _start_flush(s):
        stacked = _stack_metrics_jit(outs[s])
        try:
            stacked.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        outs[s].clear()
        return stacked

    def _drain(s):
        if inflight[s] is not None:
            host_outs[s].append(np.asarray(inflight[s]))
            inflight[s] = None

    import collections
    from concurrent.futures import ThreadPoolExecutor

    # Per-stream prefetch of device-resident frames: the (now lazy) item
    # load, frame assembly and the host->device upload are issued a few
    # frames ahead on a thread pool — loads are cv2/IO-bound and overlap
    # the tunnel round trips of dispatch; in-flight memory is bounded by
    # PREFETCH frames per stream regardless of dataset size.
    PREFETCH = 3
    ready: list[collections.deque] = [collections.deque() for _ in range(S)]
    pool = ThreadPoolExecutor(max_workers=min(8, max(2, S)))

    def load_one(s, idx):
        return jax.device_put(
            frame_from_item(groups[s][idx], keypoint_source),
            par.devices[s % D])

    def fill(s):
        while (len(ready[s]) < PREFETCH and
               pos[s] + len(ready[s]) < len(groups[s])):
            idx = pos[s] + len(ready[s])
            ready[s].append(pool.submit(load_one, s, idx))

    # the img_res probe above already paid that stream's first item load
    # (disk read + crop on lazy views) — reuse it rather than loading twice
    ready[probe_s].append(pool.submit(
        lambda: jax.device_put(frame_from_item(first, keypoint_source),
                               par.devices[probe_s % D])))

    t0 = time.perf_counter()
    timed0 = 0          # `dispatched` snapshot at the last timer reset
    first_round = True
    alive = True
    dispatched = 0
    while alive:
        alive = False
        for s in range(S):
            fill(s)
            if not ready[s]:
                continue
            alive = True
            frame = ready[s].popleft().result()
            pos[s] += 1
            states[s], out = engine.step(
                states[s], frame, assets=par._assets_for(par.devices[s % D]))
            outs[s].append({k: out[k] for k in ("mpjpe", "pampjpe", "pve")})
            if len(outs[s]) >= FLUSH:
                _drain(s)
                inflight[s] = _start_flush(s)
                # frame buffers are malloc'd on pool threads and freed
                # here on the main thread; without periodic trims glibc's
                # per-thread arenas keep the freed pages and RSS ratchets
                # ~0.5 MB/frame forever (measured: 20 GB at 35k frames)
                malloc_trim()
            dispatched += 1
            if progress_every and dispatched % progress_every == 0:
                # rate over the TIMED region only: t0 resets after the
                # warmup round, so warmup dispatches must not inflate it
                log(f"[parallel x{S}] dispatched {dispatched} frames "
                    f"({(dispatched - timed0) / (time.perf_counter() - t0):.1f}/s, "
                    f"RSS {_rss_mb():.0f} MB)")
        if first_round:
            # warmup barrier: compile / cache-load / the service's slow
            # first execution complete here, outside the timed region
            for s in range(S):
                if outs[s]:
                    np.asarray(outs[s][0]["mpjpe"])
            first_round = False
            t0 = time.perf_counter()
            timed0 = dispatched

    pool.shutdown(wait=True)
    malloc_trim()
    per_stream = []
    for s in range(S):
        _drain(s)
        if outs[s]:
            inflight[s] = _start_flush(s)
            _drain(s)
        win = (np.concatenate(host_outs[s], axis=1) if host_outs[s]
               else np.zeros((3, 0, 1)))
        per_stream.append(
            {k: (float(win[j].mean()) if win.shape[1] else float("nan"))
             for j, k in enumerate(("mpjpe", "pampjpe", "pve"))}
            | {"frames": win.shape[1]})
    total = sum(p["frames"] for p in per_stream)
    # the timer starts after the warmup round; exclude those S frames
    fps = max(total - S, 1) / (time.perf_counter() - t0)
    # zero-frame streams report per-stream NaN but must not poison the
    # frame-weighted aggregate (NaN * 0 is NaN, not 0)
    agg = {k: sum(p[k] * p["frames"] for p in per_stream if p["frames"])
           / total for k in ("mpjpe", "pampjpe", "pve")}
    log(f"[parallel x{S}] {total} frames over {D} device(s): "
        f"MPJPE:{agg['mpjpe']:.2f} PA:{agg['pampjpe']:.2f} "
        f"PVE:{agg['pve']:.2f} ({fps:.2f} aggregate fps)")
    return agg | {"frames": total, "fps": fps, "per_stream": per_stream}
