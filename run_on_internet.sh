#!/usr/bin/env bash
# Internet-video adaptation with the reference's preset
# (parity with reference run_on_internet.sh: shape_prior_weight=2e-4).
python -m dynaboa_tpu.apps.internet \
    --expdir exps \
    --expname internet \
    --dataset internet \
    --shape_prior_weight 2e-4 \
    "$@"
