"""Convert a tinynerf npz checkpoint to a reference-resumable PyTorch pickle.

The inverse of tools/import_torch_ckpt.py, completing weight interop both
ways: the reference resumes from whole-module pickles
(``self.model = torch.load(last_ckpt)``, reference ``nerf.py:415``), so this
tool instantiates the reference's own ``NeRFModel`` (imported from the
reference source tree), loads our weights into its shared ``Network``
(``strict=True`` — any layout drift fails loudly), and ``torch.save``s the
module under the reference's ``<tag>_<iter>.pkl`` naming so its resume scan
(``nerf.py:402-415``) picks it up.

Only the reference-architecture MLP family maps (the CP grid fields have no
torch counterpart); PROPOSAL checkpoints export their full-size fine net.

Usage:
    python tools/export_torch_ckpt.py ckpt_dir_or_npz out_dir/ \
        --ref-path /root/reference
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("src", help="tinynerf .npz checkpoint (or a "
                                    "checkpoint dir: latest is used)")
    parser.add_argument("out_dir", help="directory for the reference .pkl")
    parser.add_argument("--ref-path", type=str, default="/root/reference",
                        help="reference source tree (defines NeRFModel)")
    parser.add_argument("--batch-ray", type=int, default=400,
                        help="reference BATCH_RAY baked into the module "
                             "(its Encoder/Network carry the batch size)")
    parser.add_argument("--n-coarse", type=int, default=64)
    parser.add_argument("--n-fine", type=int, default=128)
    args = parser.parse_args()

    # Host-side tool: force the CPU backend so loading the npz never probes
    # the (possibly absent) TPU tunnel — the site hook pins jax_platforms to
    # axon regardless of env vars, so the config call is required.
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tinynerf import ckpt

    src = args.src
    if os.path.isdir(src):
        src = ckpt.find_latest(src)
        if src is None:
            sys.exit(f"no .npz checkpoints under {args.src}")
    iteration, params, _opt, _key, _occ = ckpt.load_checkpoint_full(src)
    sd_np = ckpt.export_torch_state_dict(params)

    import torch

    sys.path.insert(0, args.ref_path)
    import nerf as refnerf  # noqa: E402
    sys.path.pop(0)

    model = refnerf.NeRFModel(num_coarse=args.n_coarse,
                              num_fine=args.n_fine,
                              batch_ray=args.batch_ray)
    model.network.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=True)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"exported_{iteration}.pkl")
    torch.save(model, out)
    n = sum(int(v.size) for v in sd_np.values())
    print(f"exported {n:,} params (iter {iteration}) -> {out}")


if __name__ == "__main__":
    main()
