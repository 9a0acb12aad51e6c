#!/usr/bin/env bash
# 3DPW #PS streaming benchmark with the reference's default hyperparameters
# (parity with reference run_on_3dpw.sh).
python -m dynaboa_tpu.apps.benchmark \
    --expdir exps \
    --expname 3dpw \
    --dataset 3dpw \
    "$@"
