"""System assembly: wire model, SMPL bodies, prior, retrieval and data into a
ready BilevelEngine.

Mirrors the reference BaseAdaptor constructor sequence (base_adaptor.py:37-68:
seed -> retrieval store -> model+optimizer -> teacher -> dataloader ->
criterion -> SMPL setup), with every license-gated asset gated on existence
and replaced by a deterministic synthetic stand-in when absent, so the full
pipeline runs end-to-end in any environment.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from dynaboa_tpu.config import AdaptConfig, Paths
from dynaboa_tpu import constants
from dynaboa_tpu.engine import BilevelEngine, synthetic_store
from dynaboa_tpu.engine.retrieval import RetrievalStore
from dynaboa_tpu.losses import (
    default_gmm_path,
    load_gmm_prior,
    synthetic_gmm_prior,
)
from dynaboa_tpu.metrics import GenderedSMPL
from dynaboa_tpu.models import load_smpl_npz, synthetic_smpl_model
from dynaboa_tpu.models.hmr import HMR, init_hmr_params, load_basemodel


@dataclass
class System:
    cfg: AdaptConfig
    paths: Paths
    model: HMR
    params: Any
    engine: BilevelEngine
    smpls: GenderedSMPL
    store: RetrievalStore
    synthetic: dict


def build_smpls(paths: Paths, synthetic_fallback: bool = True,
                num_vertices: int | None = None) -> tuple[GenderedSMPL, bool]:
    d = paths.smpl_model_dir
    names = {g: os.path.join(d, f"smpl_{g}.npz")
             for g in ("neutral", "male", "female")}
    have_models = all(os.path.exists(p) for p in names.values())
    have_jreg = os.path.exists(paths.joint_regressor_h36m)
    if have_models:
        neutral = load_smpl_npz(names["neutral"])
        male = load_smpl_npz(names["male"])
        female = load_smpl_npz(names["female"])
        V = neutral.v_template.shape[0]
    elif synthetic_fallback:
        V = num_vertices or constants.NUM_VERTICES
        neutral = synthetic_smpl_model(seed=10, num_vertices=V)
        male = synthetic_smpl_model(seed=11, num_vertices=V)
        female = synthetic_smpl_model(seed=12, num_vertices=V)
    else:
        raise FileNotFoundError(f"SMPL npz models not found in {d}; "
                                "run tools/convert_smpl.py")
    if have_jreg:
        Jh36m = jnp.asarray(np.load(paths.joint_regressor_h36m), jnp.float32)
    else:
        Jh36m = jnp.asarray(
            np.random.default_rng(5).dirichlet(
                np.ones(V), size=17).astype(np.float32))
    return (
        GenderedSMPL(neutral=neutral, male=male, female=female,
                     J_regressor_h36m=Jh36m),
        have_models and have_jreg,
    )


def build_system(
    cfg: AdaptConfig,
    paths: Paths | None = None,
    synthetic_fallback: bool = True,
    compute_metrics: bool = True,
    img_res: int = constants.IMG_RES,
    model_kwargs: dict | None = None,
    num_vertices: int | None = None,
) -> System:
    """``model_kwargs``/``num_vertices`` shrink the network and body model
    (CI smoke mode; real checkpoints require the full defaults)."""
    import dynaboa_tpu

    # every entry point shares the persistent XLA cache — the full bilevel
    # program takes minutes to compile fresh (docs/PERF.md)
    dynaboa_tpu.enable_compilation_cache()
    # dataset-scale streaming must not ratchet host RSS per transfer
    dynaboa_tpu.bound_transfer_journal()

    paths = paths or Paths()
    synthetic: dict[str, bool] = {}

    # model + pretrained weights (reference set_model_optim, base_adaptor.py:112-127)
    if os.path.exists(paths.basemodel) and not model_kwargs:
        model, params = load_basemodel(paths.basemodel)
        if cfg.compute_dtype != model.compute_dtype:
            model = model.clone(compute_dtype=cfg.compute_dtype)
        synthetic["weights"] = False
    else:
        mean = paths.smpl_mean_params if os.path.exists(
            paths.smpl_mean_params) else None
        from dynaboa_tpu.models.hmr import hmr as hmr_factory

        mk = dict(model_kwargs or {})
        mk.setdefault("compute_dtype", cfg.compute_dtype)
        model = hmr_factory(mean, **mk)
        params = init_hmr_params(model, jax.random.PRNGKey(cfg.seed),
                                 input_shape=(1, img_res, img_res, 3))
        synthetic["weights"] = True

    # SMPL bodies + evaluation regressor (reference setup_smpl)
    smpls, real = build_smpls(paths, synthetic_fallback,
                              num_vertices=num_vertices)
    synthetic["smpl"] = not real

    # GMM pose prior (reference set_criterion)
    gmm_path = paths.gmm_prior or default_gmm_path()
    if gmm_path:
        prior = load_gmm_prior(gmm_path)
        synthetic["prior"] = False
    else:
        prior = synthetic_gmm_prior(seed=cfg.seed)
        synthetic["prior"] = True

    # retrieval store (reference load_h36_cluster_res + SourceDataset)
    store = None
    if cfg.mixtrain or cfg.retrieval:
        cluster_file = os.path.join(
            paths.retrieval_res,
            "cluster_res_random_sample_center_10_10_potocol2.pt")
        source_file = os.path.join(
            paths.retrieval_res, "h36m_random_sample_center_10_10.pt")
        if (os.path.exists(cluster_file) and os.path.exists(source_file)
                and not model_kwargs):
            from dynaboa_tpu.engine.retrieval import load_reference_store

            store = load_reference_store(paths.retrieval_res, source_file,
                                         paths.h36m_root)
            synthetic["retrieval"] = False
        else:
            width = (model_kwargs or {}).get("width", 64)
            store = synthetic_store(seed=cfg.seed, img_res=img_res,
                                    feat_dim=width * 8 * 4)
            synthetic["retrieval"] = True

    engine = BilevelEngine(cfg, model, prior, smpls, store,
                           compute_metrics=compute_metrics)
    return System(cfg=cfg, paths=paths, model=model, params=params,
                  engine=engine, smpls=smpls, store=store,
                  synthetic=synthetic)


def write_settings(exppath: str, args) -> None:
    """setting.txt parity (reference dynaboa_benchmark.py:269-274)."""
    os.makedirs(exppath, exist_ok=True)
    with open(os.path.join(exppath, "setting.txt"), "w") as f:
        f.write("------------------ start ------------------\n")
        for k, v in sorted(vars(args).items()):
            f.write(f"{k} : {v}\n")
        f.write("------------------- end -------------------")
