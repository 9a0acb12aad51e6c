"""End-to-end numerical parity of the composed bilevel step against a
reference-exact torch implementation.

This is the harness VERDICT r1 called for: the torch side below hand-rolls the
reference's ENTIRE per-frame adaptation — learn2learn MAML(first_order=True)
clone + inner SGD (base_adaptor.py:119, dynaboa_benchmark.py:136-140), the
upper-level backward through the clone into the base params with
Adam(3e-6, betas=(.5,.9)), teacher EMA after every optimizer step
(base_adaptor.py:193-201), motion loss over the history buffer
(base_adaptor.py:379-398), mixtrain on a labeled exemplar
(base_adaptor.py:346-376), and the dynamic extra-step loop gated on the tap-12
cosine similarity (dynaboa_benchmark.py:161-192) — on a tiny HMR + synthetic
SMPL with weights mapped onto the JAX engine via ``convert_torch_state_dict``
and identical frame inputs.

Assertions: identical dynamic step counts per frame, matching losses, and
post-frame weights within the Adam drift bound (Adam's eps=1e-8 normalization
turns sign flips of near-zero gradient coordinates — where torch-vs-XLA fp
noise lands — into full +-lr updates, so per-coordinate drift is bounded by
n_updates * lr; see tests/test_engine.py TestChunkedScan for the same
phenomenon between two XLA programs).

Retrieval is OFF here so both sides consume the same fixed exemplar; the
retrieval-feature-staleness divergence (engine/bilevel.py body(): upper
iteration 0 keys retrieval off the pre-inner-step features where the reference
uses the clone's post-inner forward) is quantified separately in
TestRetrievalStaleness.
"""

import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn as tn
import torch.nn.functional as F

from dynaboa_tpu import constants
from dynaboa_tpu.config import AdaptConfig
from dynaboa_tpu.engine import BilevelEngine, Frame, synthetic_store
from dynaboa_tpu.losses import synthetic_gmm_prior
from dynaboa_tpu.metrics import GenderedSMPL
from dynaboa_tpu.models import synthetic_smpl_model
from dynaboa_tpu.models.hmr import HMR, NPOSE, convert_torch_state_dict

IMG = 32
WIDTH = 16
RDIM = 128
NV = 256
XF = WIDTH * 8 * 4          # pooled feature dim (512 at width 16)

torch.set_grad_enabled(True)


# ---------------------------------------------------------------------------
# torch geometry mirrors (of the reference utils/geometry.py formulas)
# ---------------------------------------------------------------------------

def t_rot6d_to_rotmat(x):
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    b1 = F.normalize(a1, dim=-1, eps=1e-12)
    b2 = F.normalize(a2 - (b1 * a2).sum(-1, keepdim=True) * b1,
                     dim=-1, eps=1e-12)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack([b1, b2, b3], dim=-1)


def t_quat_to_rotmat(q):
    q = q / q.norm(dim=-1, keepdim=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = torch.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], dim=-1)
    return m.reshape(*q.shape[:-1], 3, 3)


def t_batch_rodrigues(theta):
    angle = (theta + 1e-8).norm(dim=-1, keepdim=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = torch.cat([torch.cos(half), torch.sin(half) * normalized], dim=-1)
    return t_quat_to_rotmat(quat)


def t_rotmat_to_aa(R, eps=1e-6):
    Rt = R.transpose(-1, -2)
    r = lambda i, j: Rt[..., i, j]
    t0 = 1 + r(0, 0) - r(1, 1) - r(2, 2)
    q0 = torch.stack([r(1, 2) - r(2, 1), t0, r(0, 1) + r(1, 0),
                      r(2, 0) + r(0, 2)], dim=-1)
    t1 = 1 - r(0, 0) + r(1, 1) - r(2, 2)
    q1 = torch.stack([r(2, 0) - r(0, 2), r(0, 1) + r(1, 0), t1,
                      r(1, 2) + r(2, 1)], dim=-1)
    t2 = 1 - r(0, 0) - r(1, 1) + r(2, 2)
    q2 = torch.stack([r(0, 1) - r(1, 0), r(2, 0) + r(0, 2),
                      r(1, 2) + r(2, 1), t2], dim=-1)
    t3 = 1 + r(0, 0) + r(1, 1) + r(2, 2)
    q3 = torch.stack([t3, r(1, 2) - r(2, 1), r(2, 0) - r(0, 2),
                      r(0, 1) - r(1, 0)], dim=-1)
    c0 = (r(2, 2) < eps) & (r(0, 0) > r(1, 1))
    c1 = (r(2, 2) < eps) & ~(r(0, 0) > r(1, 1))
    c2 = ~(r(2, 2) < eps) & (r(0, 0) < -r(1, 1))

    def pick(a, b, c, d):
        out = torch.where(c0[..., None], a, d)
        out = torch.where(c1[..., None], b, out)
        return torch.where(c2[..., None], c, out)

    q = pick(q0, q1, q2, q3)
    t = pick(t0[..., None], t1[..., None], t2[..., None], t3[..., None])
    q = q * 0.5 / torch.sqrt(torch.clamp(t, min=eps))
    # quat -> axis-angle
    q1_, q2_, q3_ = q[..., 1], q[..., 2], q[..., 3]
    sin_sq = q1_ * q1_ + q2_ * q2_ + q3_ * q3_
    sin_theta = torch.sqrt(torch.where(sin_sq > 0, sin_sq,
                                       torch.ones_like(sin_sq)))
    cos_theta = q[..., 0]
    two_theta = 2.0 * torch.where(
        cos_theta < 0.0, torch.atan2(-sin_theta, -cos_theta),
        torch.atan2(sin_theta, cos_theta))
    k = torch.where(sin_sq > 0, two_theta / sin_theta,
                    2.0 * torch.ones_like(sin_theta))
    aa = torch.stack([q1_ * k, q2_ * k, q3_ * k], dim=-1)
    return torch.where(torch.isnan(aa), torch.zeros_like(aa), aa)


def t_project(cam, s3d, eps=1e-9):
    """Weak-perspective projection to [-1,1] (base_adaptor.py:160-170)."""
    tz = 2.0 * constants.FOCAL_LENGTH / (constants.IMG_RES * cam[:, 0] + eps)
    cam_t = torch.stack([cam[:, 1], cam[:, 2], tz], dim=-1)
    pts = s3d + cam_t[:, None]
    xy = pts[..., :2] / pts[..., 2:3] * constants.FOCAL_LENGTH
    return xy / (constants.IMG_RES / 2.0)


# ---------------------------------------------------------------------------
# torch SMPL mirror (same arrays as the JAX SMPLModel)
# ---------------------------------------------------------------------------

class TorchSMPL:
    def __init__(self, m):
        t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float32)
        self.v_template = t(m.v_template)
        self.shapedirs = t(m.shapedirs)
        self.posedirs = t(m.posedirs)
        self.J_regressor = t(m.J_regressor)
        self.lbs_weights = t(m.lbs_weights)
        self.parents = m.parents
        self.J_regressor_extra = t(m.J_regressor_extra)
        self.vertex_joint_ids = torch.tensor(
            np.asarray(m.vertex_joint_ids), dtype=torch.long)
        self.gather = torch.tensor(
            np.asarray(constants.SPIN_JOINT_GATHER), dtype=torch.long)

    def __call__(self, betas, rotmats):
        N = betas.shape[0]
        v_shaped = self.v_template + torch.einsum(
            "vcb,nb->nvc", self.shapedirs, betas)
        J = torch.einsum("kv,nvc->nkc", self.J_regressor, v_shaped)
        eye = torch.eye(3)
        pose_feature = (rotmats[:, 1:] - eye).reshape(N, -1)
        v_posed = v_shaped + (pose_feature @ self.posedirs).reshape(N, -1, 3)

        rel_joints = J.clone()
        rel_joints[:, 1:] = J[:, 1:] - J[:, list(self.parents[1:])]
        top = torch.cat([rotmats, rel_joints[..., None]], dim=-1)
        bottom = torch.tensor([0.0, 0.0, 0.0, 1.0]).expand(
            N, rotmats.shape[1], 1, 4)
        local = torch.cat([top, bottom], dim=-2)
        world = [local[:, 0]]
        for k in range(1, rotmats.shape[1]):
            world.append(world[self.parents[k]] @ local[:, k])
        world = torch.stack(world, dim=1)
        posed_joints = world[..., :3, 3]
        J_h = torch.cat([J, torch.zeros_like(J[..., :1])], dim=-1)
        corr = torch.einsum("nkij,nkj->nki", world, J_h)
        rel = world.clone()
        rel[..., :3, 3] = world[..., :3, 3] - corr[..., :3]
        T = torch.einsum("vk,nkij->nvij", self.lbs_weights, rel)
        v_h = torch.cat([v_posed, torch.ones_like(v_posed[..., :1])], dim=-1)
        verts = torch.einsum("nvij,nvj->nvi", T, v_h)[..., :3]

        sel = verts[:, self.vertex_joint_ids]
        extra = torch.einsum("jv,nvc->njc", self.J_regressor_extra, verts)
        joints54 = torch.cat([posed_joints, sel, extra], dim=1)
        return verts, joints54[:, self.gather]


# ---------------------------------------------------------------------------
# torch tiny HMR with the 15-tap feature contract
# ---------------------------------------------------------------------------

class TorchTapHMR(tn.Module):
    """Reference model/hmr.py topology at test scale, with need_feature taps."""

    def __init__(self, width=WIDTH, rdim=RDIM, layers=(1, 1, 1, 1),
                 mean_pose=None):
        super().__init__()
        gn = lambda c: tn.GroupNorm(4, c)
        w = width
        self.conv1 = tn.Conv2d(3, w, 7, stride=2, padding=3, bias=False)
        self.bn1 = gn(w)
        self.maxpool = tn.MaxPool2d(3, stride=2, padding=1)

        def block(inp, planes, stride, down):
            d = dict(
                conv1=tn.Conv2d(inp, planes, 1, bias=False), bn1=gn(planes),
                conv2=tn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False), bn2=gn(planes),
                conv3=tn.Conv2d(planes, planes * 4, 1, bias=False),
                bn3=gn(planes * 4),
            )
            if down:
                # reference hmr.py:85-90: downsample on the stage's first
                # block only (stride != 1 or inplanes != planes*4)
                d["downsample"] = tn.Sequential(
                    tn.Conv2d(inp, planes * 4, 1, stride=stride, bias=False),
                    gn(planes * 4))
            return tn.ModuleDict(d)

        def stage(inp, planes, stride, blocks):
            mods = [block(inp, planes, stride, True)]
            mods += [block(4 * planes, planes, 1, False)
                     for _ in range(blocks - 1)]
            return tn.ModuleList(mods)

        self.layer1 = stage(w, w, 1, layers[0])
        self.layer2 = stage(4 * w, 2 * w, 2, layers[1])
        self.layer3 = stage(8 * w, 4 * w, 2, layers[2])
        self.layer4 = stage(16 * w, 8 * w, 2, layers[3])
        xf_dim = 32 * w
        self.fc1 = tn.Linear(xf_dim + NPOSE + 13, rdim)
        self.fc2 = tn.Linear(rdim, rdim)
        self.decpose = tn.Linear(rdim, NPOSE)
        self.decshape = tn.Linear(rdim, 10)
        self.deccam = tn.Linear(rdim, 3)
        self.mean_pose = torch.zeros(1, NPOSE)
        self.mean_shape = torch.zeros(1, 10)
        self.mean_cam = torch.tensor([[0.9, 0.0, 0.0]])

    def state_dict_reference_names(self):
        """state_dict with the reference's layerN.M.* key naming, digestible
        by convert_torch_state_dict."""
        sd = {}
        sd["conv1.weight"] = self.conv1.weight
        sd["bn1.weight"] = self.bn1.weight
        sd["bn1.bias"] = self.bn1.bias
        for li, layer in enumerate([self.layer1, self.layer2, self.layer3,
                                    self.layer4], start=1):
            for b, blk in enumerate(layer):
                p = f"layer{li}.{b}"
                for i in (1, 2, 3):
                    sd[f"{p}.conv{i}.weight"] = blk[f"conv{i}"].weight
                    sd[f"{p}.bn{i}.weight"] = blk[f"bn{i}"].weight
                    sd[f"{p}.bn{i}.bias"] = blk[f"bn{i}"].bias
                if "downsample" in blk:
                    sd[f"{p}.downsample.0.weight"] = blk.downsample[0].weight
                    sd[f"{p}.downsample.1.weight"] = blk.downsample[1].weight
                    sd[f"{p}.downsample.1.bias"] = blk.downsample[1].bias
        for n in ("fc1", "fc2", "decpose", "decshape", "deccam"):
            m = getattr(self, n)
            sd[f"{n}.weight"] = m.weight
            sd[f"{n}.bias"] = m.bias
        return sd

    def _run_block(self, blk, x):
        r = blk.downsample(x) if "downsample" in blk else x
        out = F.relu(blk.bn1(blk.conv1(x)))
        out = F.relu(blk.bn2(blk.conv2(out)))
        out = blk.bn3(blk.conv3(out))
        return F.relu(out + r)

    def forward(self, x, need_feature=False):
        feats = []
        x = self.conv1(x)
        feats.append(x)                                   # tap 0 (pre-GN)
        x = self.maxpool(F.relu(self.bn1(x)))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            for blk in layer:
                x = self._run_block(blk, x)
            feats.append(x)                               # taps 1-4
        xf = x.mean(dim=(2, 3))
        feats.append(xf)                                  # tap 5
        B = x.shape[0]
        pose = self.mean_pose.expand(B, -1)
        shape = self.mean_shape.expand(B, -1)
        cam = self.mean_cam.expand(B, -1)
        for _ in range(3):
            xc = torch.cat([xf, pose, shape, cam], dim=1)
            xc = self.fc1(xc)
            feats.append(xc)                              # tap 6+3i
            feats.append(xc)                              # tap 7+3i (drop=eval)
            xc = self.fc2(xc)
            feats.append(xc)                              # tap 8+3i
            pose = self.decpose(xc) + pose
            shape = self.decshape(xc) + shape
            cam = self.deccam(xc) + cam
        rotmat = t_rot6d_to_rotmat(pose).reshape(B, 24, 3, 3)
        if need_feature:
            return rotmat, shape, cam, feats
        return rotmat, shape, cam


# ---------------------------------------------------------------------------
# torch reference adaptor (base_adaptor.py + dynaboa_benchmark.py control flow)
# ---------------------------------------------------------------------------

class TorchRefAdaptor:
    def __init__(self, net, smpl, prior, cfg, exemplar, store=None):
        self.model = net
        self.teacher = copy.deepcopy(net)
        self.smpl = smpl
        self.cfg = cfg
        self.optimizer = torch.optim.Adam(
            self.model.parameters(), lr=cfg.lr, betas=(cfg.beta1, cfg.beta2))
        self.exemplar = exemplar     # fixed labeled batch (retrieval off)
        # (centers, bank-dict) for reference-exact retrieval
        # (base_adaptor.py:82-96): cosine to centers, nearest cluster; the
        # parity store has one member per cluster so random.sample of one
        # element is deterministic
        self.store = store
        # When set, the next _labeled_loss retrieval keys off this feature
        # instead of the loss forward's own — used to pin the engine's ONE
        # documented retrieval divergence (upper update 0 keys off the
        # pre-inner-step features; see docs/PARITY.md item 1)
        self.retrieval_feat_override = None
        self.history = {}
        self.global_step = 0
        self.gmm_means = torch.tensor(np.asarray(prior.means))
        self.gmm_prec = torch.tensor(np.asarray(prior.precisions))
        self.gmm_w = torch.tensor(np.asarray(prior.nll_weights))
        self.log = {}

    # --- loss pieces (reference base_adaptor.py:320-422) ---

    def _gmm_nll(self, pose69):
        diff = pose69[:, None] - self.gmm_means[None]
        pd = torch.einsum("mij,bmj->bmi", self.gmm_prec, diff)
        quad = (pd * diff).sum(-1)
        return (0.5 * quad - torch.log(self.gmm_w)[None]).min(dim=1).values

    def _decode(self, rotmat, shape):
        verts, joints = self.smpl(shape, rotmat)
        return joints, verts

    def _frame_loss(self, rotmat, shape, s2d, j2d):
        conf = j2d[:, 25:, 2:3]
        s2dloss = ((s2d[:, 25:] - j2d[:, 25:, :2]) ** 2 * conf).mean()
        shape_prior = (shape ** 2).sum(-1).mean()
        body_aa = t_rotmat_to_aa(
            rotmat[:, 1:].reshape(-1, 3, 3)).reshape(-1, 69)
        pose_prior = self._gmm_nll(body_aa).mean()
        return (s2dloss * self.cfg.s2dloss_weight
                + shape_prior * self.cfg.shape_prior_weight
                + pose_prior * self.cfg.pose_prior_weight)

    def _teacher_loss(self, image, rotmat, shape, s2d, s3d):
        e_rotmat, e_shape, e_cam = self.teacher(image)
        e_s3d, _ = self._decode(e_rotmat, e_shape)
        e_s2d = t_project(e_cam, e_s3d)
        return (F.mse_loss(s2d, e_s2d) * 5 + F.mse_loss(e_s3d, s3d) * 5
                + F.mse_loss(shape, e_shape) * 0.001
                + F.mse_loss(rotmat, e_rotmat) * 1)

    def _motion_loss(self, net, s2d_gt_half, j2d):
        hist = self.history[self.global_step - self.cfg.interval]
        h_img, h_j2d = hist
        h_rotmat, h_shape, h_cam = net(h_img)
        h_s3d, _ = self._decode(h_rotmat, h_shape)
        h_s2d = t_project(h_cam, h_s3d)
        pred_motion = s2d_gt_half - h_s2d[:, 25:]
        gt_motion = j2d[:, 25:, :2] - h_j2d[:, 25:, :2]
        conf = torch.where(
            (h_j2d[:, 25:, 2:3] + j2d[:, 25:, 2:3]) == 2.0,
            torch.ones(1), torch.zeros(1))
        return ((pred_motion - gt_motion) ** 2 * conf).mean()

    def _labeled_loss(self, net, feat5=None):
        if self.store is not None:
            # reference retrieval keyed on the loss forward's own pooled
            # feature (base_adaptor.py:261-262,310-311)
            centers, bank = self.store
            if self.retrieval_feat_override is not None:
                feat5 = self.retrieval_feat_override
            f = feat5[0].detach()
            f = f / f.norm()
            c = centers / centers.norm(dim=1, keepdim=True)
            k = int(torch.argmax(c @ f))
            ex = {key: v[k:k + 1] for key, v in bank.items()}
        else:
            ex = self.exemplar
        rotmat, shape, cam, _ = net(ex["img"], need_feature=True)
        s3d, _ = self._decode(rotmat, shape)
        gt_rotmat = t_batch_rodrigues(
            ex["pose"].reshape(-1, 3)).reshape(-1, 24, 3, 3)
        pose_loss = F.mse_loss(rotmat, gt_rotmat)
        shape_loss = F.mse_loss(shape, ex["betas"])
        s2d = t_project(cam, s3d)
        conf = ex["keypoints"][:, 25:, 2:3]
        s2dloss = ((s2d[:, 25:] - ex["keypoints"][:, 25:, :2]) ** 2
                   * conf).mean()
        gt_s3d = ex["pose_3d"][..., :3]
        gt_hip = (gt_s3d[:, 2] + gt_s3d[:, 3]) / 2
        pred25 = s3d[:, 25:]
        pred_hip = (pred25[:, 2] + pred25[:, 3]) / 2
        s3dloss = (conf * ((pred25 - pred_hip[:, None])
                           - (gt_s3d - gt_hip[:, None])) ** 2).mean()
        return s2dloss * 5 + s3dloss * 5 + shape_loss * 0.001 + pose_loss * 1

    def _level_loss(self, net, image, j2d, level):
        rotmat, shape, cam, feats = net(image, need_feature=True)
        s3d, _ = self._decode(rotmat, shape)
        s2d = t_project(cam, s3d)
        use_frame = (self.cfg.use_frame_losses_lower if level == "lower"
                     else self.cfg.use_frame_losses_upper)
        use_temporal = (self.cfg.use_temporal_losses_lower if level == "lower"
                        else self.cfg.use_temporal_losses_upper)
        use_mix = (self.cfg.lower_level_mixtrain if level == "lower"
                   else self.cfg.upper_level_mixtrain)
        loss = torch.zeros(())
        if use_frame:
            loss = self._frame_loss(rotmat, shape, s2d, j2d)
        if use_temporal and self.cfg.use_meanteacher:
            loss = loss + self._teacher_loss(
                image, rotmat, shape, s2d, s3d) * self.cfg.teacherloss_weight
        if (use_temporal and self.cfg.use_motion
                and (self.global_step - self.cfg.interval) > 0):
            loss = loss + self._motion_loss(
                net, s2d[:, 25:], j2d) * self.cfg.motionloss_weight
        if use_mix:
            loss = loss + self._labeled_loss(
                net, feats[5]) * self.cfg.labelloss_weight
        return loss, feats

    # --- control flow (dynaboa_benchmark.py:126-201) ---

    def _ema(self):
        a = self.cfg.alpha
        for pt, p in zip(self.teacher.parameters(), self.model.parameters()):
            pt.data.mul_(a).add_(p.data, alpha=1 - a)

    def _feat12(self, image):
        with torch.no_grad():
            _, _, _, f = self.model(image, need_feature=True)
        return f

    def adaptation(self, image, j2d, thr):
        cfg = self.cfg
        self.history[self.global_step] = (image, j2d)
        with torch.no_grad():
            _, _, _, init_features = self.model(image, need_feature=True)

        # MAML clone + first-order inner step(s)
        learner = copy.deepcopy(self.model)
        for _ in range(cfg.inner_step):
            lower_loss, _ = self._level_loss(learner, image, j2d, "lower")
            g = torch.autograd.grad(lower_loss, list(learner.parameters()))
            with torch.no_grad():
                for p, gi in zip(learner.parameters(), g):
                    p.sub_(cfg.fastlr * gi)

        # upper update 0: gradient at the adapted params applied to the base
        # model (learn2learn first_order semantics: d adapted / d base = I).
        # With a retrieval store, this one call keys retrieval off the
        # pre-inner features — the engine's implemented semantics, whose
        # deviation from the reference's own-forward features is the
        # documented divergence quantified in TestRetrievalStaleness.
        if self.store is not None:
            self.retrieval_feat_override = init_features[5]
        upper_loss, _ = self._level_loss(learner, image, j2d, "upper")
        self.retrieval_feat_override = None
        g = torch.autograd.grad(upper_loss, list(learner.parameters()))
        self.optimizer.zero_grad()
        for p, gi in zip(self.model.parameters(), g):
            p.grad = gi.clone()
        self.optimizer.step()
        if cfg.use_meanteacher:
            self._ema()

        sims = []
        extra = 0
        first_upper_loss = float(upper_loss.detach())
        if cfg.dynamic_boa:
            adapted = self._feat12(image)
            feat_12 = F.cosine_similarity(
                init_features[12].flatten(), adapted[12].flatten(),
                dim=0, eps=1e-12).item()
            sims.append(feat_12)
            while 1 - feat_12 > thr:
                extra += 1
                if extra > cfg.optim_steps:
                    extra -= 1
                    break
                upper_loss, pre_feats = self._level_loss(
                    self.model, image, j2d, "upper")
                g = torch.autograd.grad(
                    upper_loss, list(self.model.parameters()))
                self.optimizer.zero_grad()
                for p, gi in zip(self.model.parameters(), g):
                    p.grad = gi.clone()
                self.optimizer.step()
                if cfg.use_meanteacher:
                    self._ema()
                post = self._feat12(image)
                feat_12 = F.cosine_similarity(
                    pre_feats[12].detach().flatten(), post[12].flatten(),
                    dim=0, eps=1e-12).item()
                sims.append(feat_12)
        self.global_step += 1
        return dict(extra=extra, sims=sims, upper_loss0=first_upper_loss)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def make_cfg(**kw):
    base = dict(
        inner_step=1, interval=2, optim_steps=3, record_lowerlevel=False,
        retrieval=False, sample_num=1, dynamic_boa=True,
        use_meanteacher=True, use_motion=True,
        lower_level_mixtrain=True, upper_level_mixtrain=True,
    )
    base.update(kw)
    return AdaptConfig(**base)


@pytest.fixture(scope="module")
def parity_setup():
    torch.manual_seed(0)
    tnet = TorchTapHMR().eval()
    # identical weights on the JAX side through the product converter
    sd = {k: v.detach().clone() for k, v in
          tnet.state_dict_reference_names().items()}
    params, _ = convert_torch_state_dict(sd, scan_blocks=False)
    model = HMR(layers=(1, 1, 1, 1), width=WIDTH, regressor_dim=RDIM,
                scan_blocks=False)

    smpl_np = synthetic_smpl_model(seed=10, num_vertices=NV)
    tsmpl = TorchSMPL(smpl_np)
    smpls = GenderedSMPL(
        neutral=smpl_np,
        male=synthetic_smpl_model(seed=11, num_vertices=NV),
        female=synthetic_smpl_model(seed=12, num_vertices=NV),
        J_regressor_h36m=jnp.asarray(np.random.default_rng(5).dirichlet(
            np.ones(NV), size=17).astype(np.float32)),
    )
    prior = synthetic_gmm_prior(seed=4)
    store = synthetic_store(seed=6, img_res=IMG, feat_dim=XF)
    exemplar = {
        "img": torch.tensor(np.asarray(store.bank.images[:1])).permute(
            0, 3, 1, 2),
        "keypoints": torch.tensor(np.asarray(store.bank.keypoints[:1])),
        "pose": torch.tensor(np.asarray(store.bank.pose[:1])),
        "betas": torch.tensor(np.asarray(store.bank.betas[:1])),
        "pose_3d": torch.tensor(np.asarray(store.bank.pose_3d[:1])),
    }
    return tnet, params, model, tsmpl, smpls, prior, store, exemplar


def make_frames(n, seed=3):
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n):
        frames.append(dict(
            image=rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32),
            j2d=np.concatenate([
                rng.uniform(-1, 1, size=(1, 49, 2)),
                np.ones((1, 49, 1))], -1).astype(np.float32),
        ))
    return frames


def run_torch(parity_setup, cfg, frames, thr):
    tnet, *_ = parity_setup
    _, _, _, tsmpl, _, prior, _, exemplar = parity_setup
    adaptor = TorchRefAdaptor(copy.deepcopy(tnet), tsmpl, prior, cfg, exemplar)
    recs = []
    for fr in frames:
        img_t = torch.tensor(fr["image"]).permute(0, 3, 1, 2)
        j2d_t = torch.tensor(fr["j2d"])
        recs.append(adaptor.adaptation(img_t, j2d_t, thr))
    return adaptor, recs


def run_jax(parity_setup, cfg, frames, thr):
    _, params, model, _, smpls, prior, store, _ = parity_setup
    eng = BilevelEngine(cfg, model, prior, smpls, store,
                        compute_metrics=False)
    state = eng.init_state(params, img_res=IMG)
    outs = []
    for fr in frames:
        frame = Frame(
            image=jnp.asarray(fr["image"]), j2d=jnp.asarray(fr["j2d"]),
            pose=jnp.zeros((1, 72)), betas=jnp.zeros((1, 10)),
            gender=jnp.zeros((1,), jnp.int32))
        state, out = eng.step(state, frame, cos_sim_threshold=thr)
        outs.append(out)
    return eng, state, outs


def torch_params_as_jax_tree(net, like_tree, scan_blocks=False):
    sd = {k: v.detach().clone() for k, v in
          net.state_dict_reference_names().items()}
    params, _ = convert_torch_state_dict(sd, scan_blocks=scan_blocks)
    flat_t, _ = jax.tree.flatten(params)
    flat_j, _ = jax.tree.flatten(like_tree)
    return flat_t, flat_j


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestComposedStepParity:
    N_FRAMES = 4

    def _compare(self, parity_setup, thr, recs, eng_state, outs):
        # dynamic step counts: must match EXACTLY
        t_extra = [r["extra"] for r in recs]
        j_extra = [int(np.asarray(o["optim_steps"])) for o in outs]
        assert t_extra == j_extra, (t_extra, j_extra)

        # iteration-0 upper loss per frame
        for r, o in zip(recs, outs):
            np.testing.assert_allclose(
                float(np.asarray(o["upper"]["loss"])), r["upper_loss0"],
                rtol=2e-3, atol=2e-5)

    def test_full_program_capped(self, parity_setup):
        """thr=-1: the dynamic loop always runs optim_steps extra updates —
        deterministic control flow, so this isolates the numerics of the
        composed program (inner step + outer Adam chain + teacher EMA +
        motion + mixtrain)."""
        cfg = make_cfg()
        frames = make_frames(self.N_FRAMES)
        adaptor, recs = run_torch(parity_setup, cfg, frames, thr=-1.0)
        eng, state, outs = run_jax(parity_setup, cfg, frames, thr=-1.0)
        self._compare(parity_setup, -1.0, recs, state, outs)

        # post-run weights: bounded by the Adam drift (sign flips of
        # near-zero-grad coordinates move a weight by +-lr per update)
        n_updates = self.N_FRAMES * (1 + cfg.optim_steps)
        tol = 4 * n_updates * cfg.lr
        flat_t, flat_j = torch_params_as_jax_tree(
            adaptor.model, state.params)
        for a, b in zip(flat_t, jax.tree.leaves(state.params)):
            d = np.abs(np.asarray(a) - np.asarray(b)).max()
            assert d < tol, d
        # teacher tracks the same EMA chain
        flat_tt, _ = torch_params_as_jax_tree(
            adaptor.teacher, state.teacher_params)
        for a, b in zip(flat_tt, jax.tree.leaves(state.teacher_params)):
            d = np.abs(np.asarray(a) - np.asarray(b)).max()
            assert d < tol, d

    def test_dynamic_gate_parity(self, parity_setup):
        """A threshold chosen in the widest gap of the observed similarity
        distribution: both sides must take the same (nontrivial) number of
        extra steps per frame."""
        cfg = make_cfg()
        frames = make_frames(self.N_FRAMES)
        _, probe = run_torch(parity_setup, cfg, frames, thr=-1.0)
        gaps = sorted(1 - s for r in probe for s in r["sims"])
        assert len(gaps) >= 2
        # place thr inside the widest interior gap -> maximally robust gate
        widest = int(np.argmax(np.diff(gaps)))
        thr = float(np.sqrt(max(gaps[widest], 1e-12)
                            * max(gaps[widest + 1], 1e-12)))
        adaptor, recs = run_torch(parity_setup, cfg, frames, thr=thr)
        counts = [r["extra"] for r in recs]
        assert 0 < sum(counts) < self.N_FRAMES * cfg.optim_steps, counts
        eng, state, outs = run_jax(parity_setup, cfg, frames, thr=thr)
        self._compare(parity_setup, thr, recs, state, outs)


@pytest.mark.slow
class TestComposedStepParityWithRetrieval:
    """The FULL program including on-device retrieval, pinned against the
    torch reference implementation.  The store has exactly one member per
    cluster, so the reference's ``random.sample`` of one element and the
    engine's Gumbel top-k over one valid slot are both deterministic — the
    only remaining freedom is WHICH cluster each side picks, which is
    exactly the retrieval semantics under test (incl. the documented
    upper-update-0 feature-staleness divergence, whose cluster choice must
    not flip)."""

    N_FRAMES = 3

    def _deterministic_store(self, parity_setup, n_clusters=6):
        from dynaboa_tpu.engine.retrieval import build_store, ExemplarBank

        _, _, _, _, _, _, base_store, _ = parity_setup
        bank = ExemplarBank(*[a[:n_clusters] for a in base_store.bank])
        rng = np.random.default_rng(21)
        centers = rng.normal(size=(n_clusters, XF)).astype(np.float32)
        store = build_store(centers, [[i] for i in range(n_clusters)], bank)
        bank_t = {
            "img": torch.tensor(np.asarray(bank.images)).permute(0, 3, 1, 2),
            "keypoints": torch.tensor(np.asarray(bank.keypoints)),
            "pose": torch.tensor(np.asarray(bank.pose)),
            "betas": torch.tensor(np.asarray(bank.betas)),
            "pose_3d": torch.tensor(np.asarray(bank.pose_3d)),
        }
        return store, (torch.tensor(centers), bank_t)

    def test_full_program_with_retrieval(self, parity_setup):
        tnet, params, model, tsmpl, smpls, prior, _, exemplar = parity_setup
        store, torch_store = self._deterministic_store(parity_setup)
        cfg = make_cfg(retrieval=True)
        frames = make_frames(self.N_FRAMES, seed=13)

        adaptor = TorchRefAdaptor(copy.deepcopy(tnet), tsmpl, prior, cfg,
                                  exemplar, store=torch_store)
        recs = []
        for fr in frames:
            recs.append(adaptor.adaptation(
                torch.tensor(fr["image"]).permute(0, 3, 1, 2),
                torch.tensor(fr["j2d"]), thr=-1.0))

        eng = BilevelEngine(cfg, model, prior, smpls, store,
                            compute_metrics=False)
        state = eng.init_state(params, img_res=IMG)
        outs = []
        for fr in frames:
            frame = Frame(
                image=jnp.asarray(fr["image"]), j2d=jnp.asarray(fr["j2d"]),
                pose=jnp.zeros((1, 72)), betas=jnp.zeros((1, 10)),
                gender=jnp.zeros((1,), jnp.int32))
            state, out = eng.step(state, frame, cos_sim_threshold=-1.0)
            outs.append(out)

        for r, o in zip(recs, outs):
            # matching upper losses imply both sides retrieved the SAME
            # exemplar (the labeled loss depends on which one was drawn)
            np.testing.assert_allclose(
                float(np.asarray(o["upper"]["loss"])), r["upper_loss0"],
                rtol=2e-3, atol=2e-5)
        n_updates = self.N_FRAMES * (1 + cfg.optim_steps)
        tol = 4 * n_updates * cfg.lr
        flat_t, _ = torch_params_as_jax_tree(adaptor.model, state.params)
        for a, b in zip(flat_t, jax.tree.leaves(state.params)):
            d = np.abs(np.asarray(a) - np.asarray(b)).max()
            assert d < tol, d


class TestRetrievalStaleness:
    def test_iteration0_staleness_bound(self, parity_setup):
        """Quantifies the one documented divergence left when retrieval is ON:
        upper-iteration-0 retrieval keys off the pre-inner-step feature where
        the reference uses the clone's own forward (post-inner).  The inner
        step moves feat5 by ~fastlr * ||grad||, orders of magnitude below the
        synthetic store's cluster separation — so the chosen cluster, and
        hence the drawn exemplar, is identical."""
        tnet, params, model, tsmpl, smpls, prior, store, exemplar = (
            parity_setup)
        cfg = make_cfg()
        adaptor = TorchRefAdaptor(copy.deepcopy(tnet), tsmpl, prior, cfg,
                                  exemplar)
        frames = make_frames(3, seed=9)
        for fr in frames:
            img = torch.tensor(fr["image"]).permute(0, 3, 1, 2)
            j2d = torch.tensor(fr["j2d"])
            with torch.no_grad():
                _, _, _, f_pre = adaptor.model(img, need_feature=True)
            learner = copy.deepcopy(adaptor.model)
            lower, _ = adaptor._level_loss(learner, img, j2d, "lower")
            g = torch.autograd.grad(lower, list(learner.parameters()))
            with torch.no_grad():
                for p, gi in zip(learner.parameters(), g):
                    p.sub_(cfg.fastlr * gi)
                _, _, _, f_post = learner(img, need_feature=True)
            pre5 = f_pre[5].flatten()
            post5 = f_post[5].flatten()
            rel = (pre5 - post5).norm() / post5.norm()
            # Feature movement from one inner step stays below ~10% even in
            # this worst case (random-init tiny model, measured 2.5-8% across
            # frames; pretrained weights move far less)...
            assert float(rel) < 0.2, float(rel)
            # ...so the nearest retrieval cluster cannot flip
            c = torch.tensor(np.asarray(store.centers))
            cn = c / c.norm(dim=1, keepdim=True)
            pick = lambda f: int(torch.argmax(cn @ (f / f.norm())))
            assert pick(pre5) == pick(post5)
            adaptor.adaptation(img, j2d, thr=-1.0)
