#!/usr/bin/env python
"""Offline data-preparation dispatcher (reference process_data.py).

Usage:
  python -m dynaboa_tpu.apps.process_data --dataset internet
  python -m dynaboa_tpu.apps.process_data --dataset h36m
  python -m dynaboa_tpu.apps.process_data --dataset 3dpw
  python -m dynaboa_tpu.apps.process_data --dataset video
"""

from __future__ import annotations

import argparse

from dynaboa_tpu.config import Paths


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        choices=["3dpw", "3dhp", "h36m", "internet", "video"])
    args = parser.parse_args(argv)
    paths = Paths()

    if args.dataset == "h36m":
        from dynaboa_tpu.data.preprocess import h36m_train_extract

        h36m_train_extract(paths.h36m_root, training_split=False,
                           extract_img=False)
    elif args.dataset == "internet":
        from dynaboa_tpu.data.preprocess import internet_data_extract

        internet_data_extract(paths.internet_root)
    elif args.dataset == "video":
        from dynaboa_tpu.data.preprocess import extract_all

        extract_all(paths.internet_root)
    elif args.dataset == "3dpw":
        import os

        from dynaboa_tpu.data.preprocess.pw3d import pw3d_extract
        from dynaboa_tpu.models import load_smpl_npz

        male = load_smpl_npz(os.path.join(paths.smpl_model_dir,
                                          "smpl_male.npz"))
        female = load_smpl_npz(os.path.join(paths.smpl_model_dir,
                                            "smpl_female.npz"))
        pw3d_extract(paths.pw3d_root, paths.dataset_npz_path, male, female)
    else:
        print("Not implemented.")


if __name__ == "__main__":
    main()
