"""HMR: ResNet-50 (GroupNorm) backbone + iterative SMPL-parameter regressor.

Capability parity with reference ``model/hmr.py`` (HMR:63-181, hmr():314-323):
same topology (bias-free convs, GroupNorm(4) everywhere — hmr.py:14-18, bottleneck
[3,4,6,3]), same iterative regressor (3 iterations of
fc1(2048+157 -> 1024) -> drop -> fc2 -> drop -> residual pose/shape/cam heads
seeded from the SMPL mean parameters), and the same **15-entry feature-tap
contract** (hmr.py:128-174):

  0: conv1 output (pre-GN)      1-4: layer1..layer4 outputs
  5: pooled 2048-d feature xf   6+3i, 7+3i, 8+3i (i in 0..2):
                                fc1-out, post-dropout1, fc2-out per iteration

Index 5 feeds retrieval, index 12 is the dynamic-BOA convergence signal
(reference base_adaptor.py:262, dynaboa_benchmark.py:166).

TPU-first design: NHWC layout throughout, pure-functional flax module (params
are an explicit pytree so the MAML inner step is just tree arithmetic), mean
parameters kept as module constants — not trainable parameters — matching the
reference where they are torch buffers excluded from Adam/MAML.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

NPOSE = 24 * 6

# torch-style conv init: normal(0, sqrt(2 / (kh * kw * out_ch)))
# (reference hmr.py:92-95)
def _torch_conv_init(key, shape, dtype=jnp.float32):
    fan = shape[0] * shape[1] * shape[3]
    import jax

    return jax.random.normal(key, shape, dtype) * np.sqrt(2.0 / fan)


def _xavier_small(key, shape, dtype=jnp.float32):
    # xavier_uniform with gain=0.01 (reference hmr.py:88-90)
    import jax

    bound = 0.01 * np.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _gn(name: str):
    # GroupNorm(32 // 8 = 4 groups), torch eps default 1e-5 (hmr.py:14-18)
    return nn.GroupNorm(num_groups=4, epsilon=1e-5, name=name)


class Bottleneck(nn.Module):
    """ResNet bottleneck block with GroupNorm (reference hmr.py:21-60).

    ``dtype`` sets the conv compute precision (bfloat16 feeds the MXU at
    2x rate); GroupNorm statistics always reduce in float32.
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda planes, name, **kw: nn.Conv(
            planes, use_bias=False, kernel_init=_torch_conv_init,
            dtype=self.dtype, name=name, **kw)
        residual = x
        out = conv(self.planes, "conv1", kernel_size=(1, 1))(x)
        out = _gn("gn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, "conv2", kernel_size=(3, 3),
                   strides=(self.stride, self.stride),
                   padding=((1, 1), (1, 1)))(out)
        out = _gn("gn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, "conv3", kernel_size=(1, 1))(out)
        out = _gn("gn3")(out)
        if self.has_downsample:
            residual = conv(self.planes * 4, "down_conv", kernel_size=(1, 1),
                            strides=(self.stride, self.stride))(x)
            residual = _gn("down_gn")(residual)
        return nn.relu(out + residual.astype(out.dtype))


class _TailBlocks(nn.Module):
    """Equal-shape tail bottlenecks of a stage as one ``nn.scan`` — the
    adaptation program instantiates the backbone ~14x (forwards + gradients
    in the while_loop body); scanning collapses each stage's repeated blocks
    into one compiled body, cutting XLA compile time several-fold."""

    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        return Bottleneck(self.planes, dtype=self.dtype,
                          name="block")(carry), None


class HMR(nn.Module):
    """SMPL iterative regressor with a ResNet-50-GN backbone.

    Call returns ``(rotmat (B,24,3,3), shape (B,10), cam (B,3), features)``
    where ``features`` is the 15-tuple tap contract described above.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    n_iter: int = 3
    width: int = 64          # base channel count (64 = real ResNet-50)
    regressor_dim: int = 1024
    # lax.scan over each stage's tail blocks.  Default OFF: unrolled blocks
    # fuse across block boundaries and measured 78.1 vs 60.9 streaming fps
    # (worst-case 16.0 vs 13.6) on the v5e, AND compile faster now that
    # data assets ride as jit arguments (scanning existed to bound compile
    # time when 450 MB of baked constants made every variant minutes-long —
    # docs/PERF.md).  scan_blocks=True remains supported (and tested) for
    # compile-constrained setups.
    scan_blocks: bool = False
    compute_dtype: str = "float32"  # "bfloat16" runs backbone convs in bf16
    # SMPL mean parameters as plain tuples (hashable module constants; the
    # reference keeps them as buffers — hmr.py:100-106).
    mean_pose: tuple = tuple([0.0] * NPOSE)
    mean_shape: tuple = tuple([0.0] * 10)
    mean_cam: tuple = (0.9, 0.0, 0.0)

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def _stage(self, x, planes: int, blocks: int, stride: int, name: str):
        x = Bottleneck(planes, stride=stride, has_downsample=True,
                       dtype=self._dtype, name=f"{name}_0")(x)
        if blocks <= 1:
            return x
        if self.scan_blocks:
            Scan = nn.scan(
                _TailBlocks,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=blocks - 1,
            )
            x, _ = Scan(planes, dtype=self._dtype, name=f"{name}_tail")(x, None)
        else:
            for b in range(1, blocks):
                x = Bottleneck(planes, dtype=self._dtype,
                               name=f"{name}_{b}")(x)
        return x

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        init_pose: jnp.ndarray | None = None,
        init_shape: jnp.ndarray | None = None,
        init_cam: jnp.ndarray | None = None,
        n_iter: int | None = None,
    ):
        """Args:
          x: (B, 224, 224, 3) NHWC, ImageNet-normalized.
          deterministic: True disables dropout (the adaptor runs the model in
            eval mode during adaptation — reference dynaboa_benchmark.py:89).
        """
        from dynaboa_tpu.ops.rotations import rot6d_to_rotmat

        n_iter = self.n_iter if n_iter is None else n_iter
        B = x.shape[0]
        features = []

        w = self.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=_torch_conv_init,
                    dtype=self._dtype, name="conv1")(x)
        features.append(x)                       # tap 0: pre-GN conv1 out
        x = _gn("gn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = self._stage(x, w, self.layers[0], 1, "layer1")
        features.append(x)                       # tap 1
        x = self._stage(x, 2 * w, self.layers[1], 2, "layer2")
        features.append(x)                       # tap 2
        x = self._stage(x, 4 * w, self.layers[2], 2, "layer3")
        features.append(x)                       # tap 3
        x = self._stage(x, 8 * w, self.layers[3], 2, "layer4")
        features.append(x)                       # tap 4

        xf = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # avgpool -> (B, 2048)
        features.append(xf)                      # tap 5: retrieval feature

        if init_pose is None:
            init_pose = jnp.broadcast_to(
                jnp.asarray(self.mean_pose, x.dtype), (B, NPOSE))
        if init_shape is None:
            init_shape = jnp.broadcast_to(
                jnp.asarray(self.mean_shape, x.dtype), (B, 10))
        if init_cam is None:
            init_cam = jnp.broadcast_to(
                jnp.asarray(self.mean_cam, x.dtype), (B, 3))

        fc1 = nn.Dense(self.regressor_dim, name="fc1")
        fc2 = nn.Dense(self.regressor_dim, name="fc2")
        decpose = nn.Dense(NPOSE, kernel_init=_xavier_small, name="decpose")
        decshape = nn.Dense(10, kernel_init=_xavier_small, name="decshape")
        deccam = nn.Dense(3, kernel_init=_xavier_small, name="deccam")
        drop1 = nn.Dropout(0.5, name="drop1")
        drop2 = nn.Dropout(0.5, name="drop2")

        pred_pose, pred_shape, pred_cam = init_pose, init_shape, init_cam
        for _ in range(n_iter):
            xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam], axis=1)
            xc = fc1(xc)
            features.append(xc)                  # tap 6 + 3i: fc1 out
            xc = drop1(xc, deterministic=deterministic)
            features.append(xc)                  # tap 7 + 3i: post-drop1
            xc = fc2(xc)
            features.append(xc)                  # tap 8 + 3i: fc2 out
            xc = drop2(xc, deterministic=deterministic)
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        pred_rotmat = rot6d_to_rotmat(pred_pose).reshape(B, 24, 3, 3)
        return pred_rotmat, pred_shape, pred_cam, tuple(features)


def hmr(mean_params_path: str | None = None, **kwargs) -> HMR:
    """Factory mirroring reference hmr() (model/hmr.py:314-323): builds the
    ResNet-50 HMR, seeding the regressor from smpl_mean_params.npz when
    available."""
    if mean_params_path:
        mp = np.load(mean_params_path)
        kwargs.setdefault("mean_pose", tuple(np.asarray(mp["pose"], np.float64)))
        kwargs.setdefault("mean_shape", tuple(np.asarray(mp["shape"], np.float64)))
        kwargs.setdefault("mean_cam", tuple(np.asarray(mp["cam"], np.float64)))
    return HMR(**kwargs)


def init_hmr_params(model: HMR, rng, input_shape=(1, 224, 224, 3)):
    """Initialize the parameter pytree.

    Init runs as ONE jitted program: eager flax init is hundreds of small
    ops, each costing a dispatch round trip on a tunneled TPU (~2 min
    measured for ResNet-50).  A single compiled program is one dispatch,
    and the persistent compile cache makes repeat processes pay only the
    trace (host CPU init was tried and is worse on 1-core hosts: XLA:CPU
    recompiles every process because its AOT cache is machine-pinned)."""
    import jax

    init = jax.jit(
        lambda r: model.init(r, jnp.zeros(input_shape, jnp.float32)))
    return init(rng)["params"]


# ---------------------------------------------------------------------------
# torch checkpoint conversion (reference base_adaptor.py:112-127 load path)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(state: dict[str, Any],
                             scan_blocks: bool = False):
    """Map a DynaBOA/SPIN torch HMR state_dict onto the flax param pytree.

    Handles the reference's checkpoint conventions: optional ``module.``
    prefixes from DataParallel pretraining (base_adaptor.py:124) and the
    l2l MAML wrapper (keys under the bare names when saved wrapped).

    Returns:
      (params_pytree, mean_params dict with pose/shape/cam)
    """
    import torch

    def np_(t):
        return t.detach().cpu().numpy() if isinstance(t, torch.Tensor) else np.asarray(t)

    state = {k.replace("module.", ""): v for k, v in state.items()}

    params: dict[str, Any] = {}

    def put(path: list[str], leaf_name: str, value: np.ndarray):
        d = params
        for p in path:
            d = d.setdefault(p, {})
        d[leaf_name] = jnp.asarray(value)

    def conv(src: str, dst_path: list[str]):
        w = np_(state[src + ".weight"])           # (O, I, kh, kw)
        put(dst_path, "kernel", w.transpose(2, 3, 1, 0))

    def gn(src: str, dst_path: list[str]):
        put(dst_path, "scale", np_(state[src + ".weight"]))
        put(dst_path, "bias", np_(state[src + ".bias"]))

    def dense(src: str, dst_path: list[str]):
        put(dst_path, "kernel", np_(state[src + ".weight"]).T)
        put(dst_path, "bias", np_(state[src + ".bias"]))

    conv("conv1", ["conv1"])
    gn("bn1", ["gn1"])
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        n = 1 + max(
            int(k.split(".")[1]) for k in state if k.startswith(layer + ".")
        )
        # block 0 (the strided/downsampling block) is standalone
        base = f"{layer}.0"
        dst = f"{layer}_0"
        for i in (1, 2, 3):
            conv(f"{base}.conv{i}", [dst, f"conv{i}"])
            gn(f"{base}.bn{i}", [dst, f"gn{i}"])
        if f"{base}.downsample.0.weight" in state:
            conv(f"{base}.downsample.0", [dst, "down_conv"])
            gn(f"{base}.downsample.1", [dst, "down_gn"])
        if n <= 1:
            continue
        if scan_blocks:
            # tail blocks stack along a leading scan axis
            for i in (1, 2, 3):
                ws = np.stack([
                    np_(state[f"{layer}.{b}.conv{i}.weight"]).transpose(
                        2, 3, 1, 0)
                    for b in range(1, n)
                ])
                put([f"{layer}_tail", "block", f"conv{i}"], "kernel", ws)
                put([f"{layer}_tail", "block", f"gn{i}"], "scale", np.stack([
                    np_(state[f"{layer}.{b}.bn{i}.weight"])
                    for b in range(1, n)]))
                put([f"{layer}_tail", "block", f"gn{i}"], "bias", np.stack([
                    np_(state[f"{layer}.{b}.bn{i}.bias"])
                    for b in range(1, n)]))
        else:
            for b in range(1, n):
                base = f"{layer}.{b}"
                dst = f"{layer}_{b}"
                for i in (1, 2, 3):
                    conv(f"{base}.conv{i}", [dst, f"conv{i}"])
                    gn(f"{base}.bn{i}", [dst, f"gn{i}"])
    for name in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        dense(name, [name])

    mean = {}
    for k, out in (("init_pose", "pose"), ("init_shape", "shape"),
                   ("init_cam", "cam")):
        if k in state:
            mean[out] = np_(state[k]).reshape(-1)
    return params, mean


def load_basemodel(path: str):
    """Load the reference's ``basemodel.pt`` checkpoint into (HMR, params).

    The checkpoint is a torch file with a ``model`` key holding a possibly
    ``module.``-prefixed state dict (reference base_adaptor.py:116-125).
    The network topology (width / blocks-per-stage / regressor dim) is
    inferred from the state dict itself, so derivative checkpoints at
    non-standard scale load through the same path as the real ResNet-50.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    state = {k.replace("module.", ""): v for k, v in state.items()}
    params, mean = convert_torch_state_dict(state, scan_blocks=False)
    layers = tuple(
        1 + max(int(k.split(".")[1]) for k in state
                if k.startswith(f"layer{i}."))
        for i in (1, 2, 3, 4))
    model = HMR(
        layers=layers,
        width=int(state["conv1.weight"].shape[0]),
        regressor_dim=int(state["fc1.weight"].shape[0]),
        mean_pose=tuple(mean.get("pose", np.zeros(NPOSE, np.float64))),
        mean_shape=tuple(mean.get("shape", np.zeros(10, np.float64))),
        mean_cam=tuple(mean.get("cam", np.array([0.9, 0.0, 0.0]))),
    )
    return model, params


class HMRISO(nn.Module):
    """Dual-head HMR variant with a BatchNorm backbone and separate
    self-supervised (ssl) / fully-supervised (fsl) regressor heads.

    Capability parity with the reference's unused ``HMR_ISO``
    (model/hmr.py:184-312).  BatchNorm runs in inference mode (running
    statistics in the ``batch_stats`` collection), matching the adaptor's
    eval-mode usage.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    n_iter: int = 3
    width: int = 64
    regressor_dim: int = 1024
    mean_pose: tuple = tuple([0.0] * NPOSE)
    mean_shape: tuple = tuple([0.0] * 10)
    mean_cam: tuple = (0.9, 0.0, 0.0)

    def _bn(self, name):
        return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                            momentum=0.9, name=name)

    def _block(self, x, planes, stride, name, downsample):
        residual = x
        out = nn.Conv(planes, (1, 1), use_bias=False,
                      kernel_init=_torch_conv_init, name=f"{name}_conv1")(x)
        out = nn.relu(self._bn(f"{name}_bn1")(out))
        out = nn.Conv(planes, (3, 3), strides=(stride, stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=_torch_conv_init, name=f"{name}_conv2")(out)
        out = nn.relu(self._bn(f"{name}_bn2")(out))
        out = nn.Conv(planes * 4, (1, 1), use_bias=False,
                      kernel_init=_torch_conv_init, name=f"{name}_conv3")(out)
        out = self._bn(f"{name}_bn3")(out)
        if downsample:
            residual = nn.Conv(planes * 4, (1, 1), strides=(stride, stride),
                               use_bias=False, kernel_init=_torch_conv_init,
                               name=f"{name}_down_conv")(x)
            residual = self._bn(f"{name}_down_bn")(residual)
        return nn.relu(out + residual)

    def _head(self, xf, init_pose, init_shape, init_cam, prefix, n_iter):
        from dynaboa_tpu.ops.rotations import rot6d_to_rotmat

        head1 = nn.Dense(self.regressor_dim, name=f"{prefix}_fc1")
        head2 = nn.Dense(self.regressor_dim, name=f"{prefix}_fc2")
        decpose = nn.Dense(NPOSE, kernel_init=_xavier_small,
                           name=f"{prefix}_decpose")
        decshape = nn.Dense(10, kernel_init=_xavier_small,
                            name=f"{prefix}_decshape")
        deccam = nn.Dense(3, kernel_init=_xavier_small,
                          name=f"{prefix}_deccam")
        pose, shape, cam = init_pose, init_shape, init_cam
        for _ in range(n_iter):
            xc = jnp.concatenate([xf, pose, shape, cam], axis=1)
            xc = head2(head1(xc))
            pose = decpose(xc) + pose
            shape = decshape(xc) + shape
            cam = deccam(xc) + cam
        B = xf.shape[0]
        return rot6d_to_rotmat(pose).reshape(B, 24, 3, 3), shape, cam

    @nn.compact
    def __call__(self, x, n_iter: int | None = None):
        n_iter = self.n_iter if n_iter is None else n_iter
        B = x.shape[0]
        w = self.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=_torch_conv_init,
                    name="conv1")(x)
        x = nn.relu(self._bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = [w, 2 * w, 4 * w, 8 * w]
        for li, (p, blocks) in enumerate(zip(planes, self.layers), start=1):
            for b in range(blocks):
                stride = 2 if (li > 1 and b == 0) else 1
                down = (b == 0)
                x = self._block(x, p, stride, f"layer{li}_{b}", down)
        xf = jnp.mean(x, axis=(1, 2))

        init_pose = jnp.broadcast_to(
            jnp.asarray(self.mean_pose, xf.dtype), (B, NPOSE))
        init_shape = jnp.broadcast_to(
            jnp.asarray(self.mean_shape, xf.dtype), (B, 10))
        init_cam = jnp.broadcast_to(
            jnp.asarray(self.mean_cam, xf.dtype), (B, 3))

        fsl = self._head(xf, init_pose, init_shape, init_cam, "fsl", n_iter)
        ssl = self._head(xf, init_pose, init_shape, init_cam, "ssl", n_iter)
        return (*fsl, *ssl)
