"""Multi-stream data parallelism over a TPU mesh.

The reference is strictly single-GPU / single-stream (SURVEY §2d): frames are
sequential because each frame's adaptation mutates the weights the next frame
uses.  The faithful scale-out axis is therefore *across independent
(seq, person) streams* — 3DPW #PS has 37 of them — each with private weights
and optimizer state.

Design: the whole ``AdaptState`` carry gets a leading stream axis sharded over
a 1-D ``jax.sharding.Mesh``; ``shard_map`` runs the single-stream bilevel step
(including its data-dependent ``lax.while_loop``) independently per device,
with ``vmap`` batching multiple streams per device.  There is no cross-stream
communication — no collectives are needed in the faithful configuration; an
optional ``psum`` gradient-averaging mode turns the same program into
replicated-stream joint adaptation (shared weights), riding ICI.

Perf guidance (measured, docs/PERF.md): keep ``num_streams == mesh.size`` on
TPU.  More than one stream per device makes ``vmap`` map over per-stream
params, turning every convolution into a per-sample-weight convolution the
MXU cannot batch (measured 15x slower per step).  The vmap path is for
CPU-mesh tests and for ``share_weights`` replicated adaptation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # older jax
    from jax.experimental.shard_map import shard_map

from dynaboa_tpu.engine.bilevel import AdaptState, BilevelEngine, Frame


def make_mesh(n_devices: int | None = None, axis: str = "stream") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


class ParallelStreams:
    """Runs S independent adaptation streams over a device mesh.

    S must be a multiple of the mesh size; each device owns S / D streams
    (vmapped locally, sharded globally).
    """

    def __init__(self, engine: BilevelEngine, mesh: Mesh,
                 share_weights: bool = False):
        self.engine = engine
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.share_weights = share_weights

        def one_stream_step(state: AdaptState, frame: Frame):
            return engine._step(state, frame)

        def local_step(state, frame):
            # vmap over this device's local streams
            new_state, out = jax.vmap(one_stream_step)(state, frame)
            if self.share_weights:
                # replicated-stream mode: average the adapted weights across
                # all streams so every stream continues from consensus params
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
                                in_specs=(spec, spec),
                                out_specs=(spec, spec), check_vma=False)
        except TypeError:
            smapped = shard_map(local_step, mesh=self.mesh,
                                in_specs=(spec, spec),
                                out_specs=(spec, spec), check_rep=False)
        self._step = jax.jit(smapped)

    # -- state management ----------------------------------------------------

    def init_states(self, params, num_streams: int, img_res: int = 224,
                    batch_size: int = 1) -> AdaptState:
        """Broadcast a fresh per-stream state to the leading stream axis;
        each stream gets a distinct RNG key."""
        base = self.engine.init_state(params, batch_size=batch_size,
                                      img_res=img_res)
        S = num_streams
        if S % self.mesh.size != 0:
            raise ValueError(f"num_streams={S} must be divisible by mesh "
                             f"size {self.mesh.size}")

        def tile(x):
            return jnp.broadcast_to(x[None], (S,) + x.shape)

        state = jax.tree.map(tile, base)
        keys = jax.random.split(jax.random.PRNGKey(self.engine.cfg.seed), S)
        state = state._replace(rng=keys,
                               step=jnp.zeros((S,), jnp.int32))
        return jax.device_put(
            state,
            jax.tree.map(
                lambda _: jax.sharding.NamedSharding(self.mesh, P(self.axis)),
                state),
        )

    def step(self, states: AdaptState, frames: Frame):
        """frames: every leaf with leading (S, B, ...) axes."""
        return self._step(states, frames)


def stack_frames(items: list[dict], keypoint_source: str = "gt") -> Frame:
    """Stack one frame from each of S streams into a (S, 1, ...) Frame."""
    j2d_key = "op_j2d" if keypoint_source == "openpose" else "smpl_j2d"
    return Frame(
        image=jnp.asarray(np.stack([it["image"][None] for it in items])),
        j2d=jnp.asarray(np.stack([it[j2d_key][None] for it in items])),
        pose=jnp.asarray(np.stack([it["pose"][None] for it in items])),
        betas=jnp.asarray(np.stack([it["betas"][None] for it in items])),
        gender=jnp.asarray(
            np.stack([[np.int32(it["gender"])] for it in items])),
    )
