"""Convert a reference PyTorch checkpoint to a tinynerf npz checkpoint.

The reference saves whole-module pickles (``torch.save(self.model, ...)``,
reference ``nerf.py:491``). For checkpoints of the CURRENT reference
architecture (the 593,924-param ``Network`` at ``nerf.py:76-99``), this tool
maps the weights onto tinynerf's param pytree so training can resume (or
renders can run) from reference-trained weights.

Note: the checkpoints *shipped* in the reference repo (``checkpoint/0..6``)
are from an older architecture revision (543,052 params, no skip connection —
SURVEY.md §2.12) and cannot be mapped onto the current model; the tool
detects and reports this.

Usage:
    python tools/import_torch_ckpt.py ref.pkl out_dir/ --iter 19999
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="reference .pkl (torch.save'd module)")
    parser.add_argument("out_dir", help="tinynerf checkpoint directory")
    parser.add_argument("--iter", type=int, default=0,
                        help="iteration to stamp the checkpoint with")
    parser.add_argument("--ref-path", type=str, default=None,
                        help="path to the reference source tree (whole-module "
                             "pickles need the defining `nerf` module "
                             "importable to unpickle)")
    args = parser.parse_args()

    if args.ref_path:
        sys.path.insert(0, args.ref_path)

    import torch

    if args.ref_path:
        # pickles saved from a reference training run reference the classes
        # under __main__; alias them so unpickling resolves
        try:
            import __main__
            import nerf as _refnerf
            for cls in ("NeRFModel", "Network", "Encoder", "Activation"):
                if hasattr(_refnerf, cls):
                    setattr(__main__, cls, getattr(_refnerf, cls))
        except ImportError:
            pass

    from tinynerf import ckpt
    from tinynerf.core import mlp

    try:
        # state-dict-style pickles load under the restricted unpickler;
        # only fall back to full unpickling (arbitrary-code execution for a
        # malicious file) for whole-module reference pickles, loudly
        obj = torch.load(args.src, map_location="cpu", weights_only=True)
    except Exception:
        print(f"WARNING: {args.src} is not a plain tensor pickle; falling "
              "back to weights_only=False (full pickle VM — only do this "
              "for checkpoints you trust)", file=sys.stderr)
        try:
            obj = torch.load(args.src, map_location="cpu",
                             weights_only=False)
        except (ModuleNotFoundError, AttributeError) as e:
            sys.exit(f"cannot unpickle {args.src}: {e}. Whole-module "
                     "reference pickles need the reference source on the "
                     "path — pass --ref-path /path/to/NeRF-tiny")
    network = getattr(obj, "network", obj)  # NeRFModel or bare Network
    sd = {k: v.detach().numpy() for k, v in network.state_dict().items()}

    expected = {name for name, _, _ in
                [("point_layer.%d.0" % i, 0, 0) for i in range(8)]}
    missing = [f"point_layer.{i}.0.weight" for i in range(8)
               if f"point_layer.{i}.0.weight" not in sd]
    if missing:
        sys.exit(
            "checkpoint does not match the current reference architecture "
            f"(missing {missing[:2]}...). The reference repo's shipped "
            "checkpoint/0..6 files are an older, incompatible revision "
            "(SURVEY.md §2.12) and cannot be imported.")

    params = ckpt.import_torch_state_dict(sd)
    n = mlp.num_params(params)
    path = ckpt.save_checkpoint(args.out_dir, "imported", args.iter, params)
    print(f"imported {n:,} params -> {path}")


if __name__ == "__main__":
    main()
