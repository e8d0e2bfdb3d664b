"""Conf-driven configuration, INI-compatible with the reference CLI.

Reference surface: ``main.py --conf=<scene>`` reads ``conf/<scene>.ini`` whose
section name equals the scene name and whose keys are GPU, IMG_DIR,
RESULTS_PATH, CKPT_PATH, LOW_RES, TOTAL_ITER, BATCH_RAY, LEARNING, LR_GAMMA,
LR_MILESTONE, N_COARSE, N_FINE, DATA_TYPE, STEP, DECAY_END, SCHED, CONTINUE
(reference ``main.py:18-34``).

Deviations from the reference (SURVEY.md quirks Q1/Q2, decision D1):
- every key has a default, so the shipped-style INIs that omit TOTAL_ITER /
  RESULTS_PATH / CONTINUE load instead of raising ``NoOptionError``;
- ``EPOCH`` (present in the shipped INIs, reference ``conf/lego.ini:6``) is
  accepted as an alias for TOTAL_ITER;
- LR_MILESTONE is parsed as a list of ints (reference ``main.py:27`` parses it
  into a list of *characters*);
- CONTINUE is parsed as a boolean (reference ``main.py:34`` uses ``eval``).
"""

from __future__ import annotations

import configparser
import dataclasses
import os
from typing import List, Optional

CONF_DIR = "./conf/"


@dataclasses.dataclass
class Config:
    """Typed run configuration. Field names follow the reference INI keys."""

    # --- reference keys (main.py:18-34) ---
    gpu: int = 0                      # kept for INI compat; unused on TPU
    img_dir: str = "./data/lego/"     # scene directory (Blender or LLFF layout)
    results_path: str = "./results/"  # previews, per-view renders, videos
    ckpt_path: str = "./checkpoint/"  # *.npz checkpoints (resume-latest)
    low_res: int = 1                  # image downsample factor (Q9: implemented)
    total_iter: int = 100_000         # training iterations (EPOCH is an alias)
    batch_ray: int = 400              # rays per step (4096 saturates a v5e chip)
    learning: float = 3e-4            # Adam learning rate
    lr_gamma: float = 0.1             # decay factor (per-step EXP exponent base
                                      # or MULTISTEP multiplier, Q6 semantics)
    lr_milestone: List[int] = dataclasses.field(default_factory=lambda: [10, 200])
                                      # MULTISTEP decay boundaries (iterations)
    n_coarse: int = 64                # coarse/proposal samples per ray
    n_fine: int = 128                 # fine (resampled) samples per ray
    data_type: str = "sync"           # "sync" (Blender) | "llff"
    step: int = 100                   # checkpoint / preview cadence
    decay_end: int = 10_000           # EXP schedule: iteration where LR
                                      # reaches LEARNING * LR_GAMMA
    sched: str = "EXP"                # "EXP" | "MULTISTEP"
    continue_: bool = False           # resume from the latest checkpoint

    # --- new TPU-framework keys (all optional in the INI) ---
    seed: int = 624                   # reference seeds everything with 624 (nerf.py:50)
    precision: str = "fp32"           # "fp32" | "bf16" compute precision
    use_pallas: bool = True           # fused Pallas kernels on TPU (auto-off on CPU)
    fused_render: bool = False        # EXPERIMENTAL one-kernel renderer; measured
                                      # slower than the per-pass kernels (see
                                      # kernels/render_kernel.py) — opt-in only
    compat_sort: bool = False         # reproduce reference's per-channel sort (Q4)
    stratified: bool = False          # jittered coarse samples (off = reference Q7)
    ndc: bool = False                 # NDC warp for llff (opt-in, north-star config)
    contract: bool = False            # mip-360 scene contraction for
                                      # unbounded 360 captures: world points
                                      # warp into the radius-2 ball before
                                      # the field evaluates (core/contract
                                      # .py; set GRID_EXTENT=2 with the grid
                                      # family). Forces the XLA point-
                                      # interface field path.
    lindisp: bool = False             # disparity-linear coarse samples for
                                      # unbounded depth ranges (per-bin
                                      # densities/CDF slopes; needs near>0;
                                      # incompatible with NDC)
    near: float = 0.0                 # >0: override every pose row's near
                                      # bound (sync scenes hardcode 2.0 —
                                      # 360/unbounded captures need their own)
    far: float = 0.0                  # >0: override every pose row's far
                                      # bound (arbitrarily large with
                                      # CONTRACT+LINDISP — that is the point)
    mesh_shape: Optional[int] = None  # data-parallel devices; None = all local
    sample_shard: int = 0             # >1: shard the FINE sample axis over a
                                      # 2-D (data x sample) mesh for deep
                                      # marches (eval/render path; SP analog,
                                      # parallel/sample_shard.py)
    log_dir: str = "./runs/"
    render_chunk: int = 4096          # rays per eval-render microbatch
    pixel_dtype: str = "f32"          # "f32" | "u8" HBM pixel table storage
    host_feed: bool = False           # C++ host prefetcher instead of HBM table
    profile_steps: int = 0            # capture a jax trace of N initial steps
    white_bkgd: bool = False          # standard NeRF white-background term (opt-in)
    val_metrics: bool = False         # held-out val-batch PSNR at the STEP
                                      # logging cadence (single-process runs)
    proposal: bool = False            # narrow proposal net for the coarse pass
                                      # (mip-NeRF-360-style FLOP reduction;
                                      # off = reference-shared single net)
    proposal_width: int = 128         # proposal trunk width (128 = 1 MXU tile)
    proposal_depth: int = 4           # proposal trunk depth
    proposal_enc_l: int = 10          # point-PE bands for the proposal field
                                      # (10 = the full Q3 bank; fewer bands
                                      # cut its dominant fixed transcendental
                                      # cost — placement needs less detail)
    prop_pallas: bool = False         # dedicated proposal Pallas kernel —
                                      # measured SLOWER than XLA on the
                                      # narrow net (see train.py); opt-in
    occ_grid: bool = False            # occupancy-grid empty-space skipping
    occ_res: int = 64                 # occupancy grid resolution per axis
    occ_extent: float = 1.5           # grid half-extent (world units)
    occ_thresh: float = 0.01          # sigma cutoff for "occupied"
    occ_update_every: int = 256       # grid EMA refresh cadence (steps)
    occ_subset: float = 0.125         # fraction of cells probed per refresh
                                      # (1.0 = full sweep; NerfAcc-style)
    occ_march_steps: Optional[int] = None  # tighten_bounds probe count;
                                      # None = derived at Runner setup from
                                      # the scene's ray span so probes cannot
                                      # out-stride the 3-cell dilation margin
    occ_march_res: Optional[int] = None  # march-lookup resolution: max-pool
                                      # the dilated grid to M^3 and probe it
                                      # via a one-hot equality MATMUL
                                      # instead of the (B, S) gather —
                                      # strictly conservative (pooled
                                      # occupancy is a superset), trades a
                                      # little tightening for MXU-shaped
                                      # lookup cost. Must divide OCC_RES.
                                      # None = full-res gather path.
    fine_field: str = "mlp"           # "mlp" (reference net) | "grid"
                                      # (factorized CP feature grid,
                                      # core/gridfield.py — second model
                                      # family, ~7.7x fewer MACs/sample)
    grid_res: int = 256               # line-table resolution per axis
    grid_levels: int = 1              # multi-resolution CP pyramid depth
                                      # (fine grid only): level l adds a
                                      # zero-init per-axis line table at
                                      # res >> l whose features SUM with
                                      # level 0 before the CP product —
                                      # coarse levels carry smooth gradient
                                      # support the res ladder lacks (512
                                      # regressed, VALIDATION.md queue 10).
                                      # 1 = exactly the single-level field.
                                      # Incompatible with GRID_UPSAMPLE.
    grid_comp_density: int = 32       # CP components for density
    grid_comp_app: int = 48           # CP components for appearance
    grid_decoder_width: int = 64      # color-decoder hidden width
    grid_extent: float = 1.5          # grid half-extent (world units)
    grid_lr_mult: float = 20.0        # LR multiplier on the line tables
                                      # (factorized grids want 10-40x the
                                      # MLP rate; decoder stays at 1x.
                                      # 20 measured best on the 20k-iter
                                      # validation sweep: 27.1 dB vs 24.6
                                      # at 40 and 26.1 at 10, VALIDATION.md)
    grid_level_fold: bool = False     # evaluate pyramid levels by
                                      # upsampling them onto the level-0
                                      # lattice and summing into the table
                                      # BEFORE the (single) hat-matmul
                                      # interpolation — a ~6 MFLOP fold
                                      # replacing +50%/level of the ~32
                                      # GFLOP per-batch interpolation work.
                                      # Exactly the same function when
                                      # lattices nest ((R0-1)%(Rl-1)==0,
                                      # e.g. 385+193); a slight double-
                                      # interp smoothing otherwise.
    grid_level_lr: float = 1.0        # per-level LR factor on pyramid
                                      # tables (GRID_LEVELS>1): level l
                                      # trains at grid_lr_mult *
                                      # grid_level_lr**l. >1 boosts the
                                      # zero-init coarse levels (they must
                                      # relearn through 2x-support hats —
                                      # the measured 20k regression), <1
                                      # damps their late-schedule
                                      # gradients (the levels=3
                                      # convergence blur). 1 = uniform.
    grid_sigma_width: int = 0         # GRID_HYBRID sigma-net hidden width
                                      # (0 = grid_decoder_width)
    grid_hybrid: bool = False         # NGP-style tiny density MLP on the
                                      # CP density product (cross-component
                                      # mixing; hidden features also feed
                                      # the color decoder). Fine grid only;
                                      # incompatible with GRID_PALLAS.
    grid_tv: float = 0.0              # total-variation weight on the lines
    dist_loss: float = 0.0            # mip-360 distortion regularizer weight
                                      # on the fine weights (needs PROPOSAL)
    prop_interlevel: float = 0.0      # mip-360 interlevel loss weight
                                      # (prop histogram consistency;
                                      # needs PROPOSAL)
    grid_upsample: str = ""           # coarse-to-fine line-resolution
                                      # schedule, "iter:res,iter:res" (e.g.
                                      # "2000:384,4000:512"): before step
                                      # iter, the fine grid's line tables +
                                      # Adam moments are linearly resampled
                                      # to res (TensoRF-style upsampling;
                                      # train.upsample_grid_state)
    grid_pallas: bool = False         # fused CP-grid Pallas kernel
                                      # (kernels/grid_kernel.py): keeps the
                                      # (rows, R) hat-basis matrices in VMEM
                                      # instead of round-tripping them
                                      # through HBM every matmul. MEASURED
                                      # SLOWER than the jnp path (336k vs
                                      # 743k all-grid, VALIDATION.md round-3
                                      # late sweep) — opt-in only.
    grid_lookup: str = "onehot"       # "onehot" (hat-basis matmul, MXU)
                                      # | "gather" (measurement-only)
    prop_field: str = "grid"          # "grid" (tiny CP grid) | "mlp"
                                      # (narrow PE net). The grid proposal
                                      # drops the prop net's fixed per-row
                                      # PE-transcendental cost (the measured
                                      # bound on the narrow net,
                                      # kernels/proposal_kernel.py) and is
                                      # strictly dominant on the flagship
                                      # MLP-fine stack: 30.76 dB @165k vs
                                      # 30.47 dB @150k (VALIDATION.md r3).
                                      # Only read when PROPOSAL=True, so
                                      # reference-faithful defaults are
                                      # unaffected.
    prop_grid_res: int = 64           # proposal-grid line resolution
    prop_grid_comp_density: int = 16  # proposal-grid density components
    prop_grid_comp_app: int = 16      # proposal-grid appearance components
    prop_grid_decoder_width: int = 16 # proposal-grid decoder width
    prop_grid_hybrid: bool = False    # GRID_HYBRID for the proposal grid
                                      # (tiny density MLP on its CP product)

    @property
    def total_samples(self) -> int:
        return self.n_coarse + self.n_fine


_INT_KEYS = {"GPU", "LOW_RES", "TOTAL_ITER", "EPOCH", "BATCH_RAY", "N_COARSE",
             "N_FINE", "STEP", "DECAY_END", "SEED", "RENDER_CHUNK",
             "PROFILE_STEPS", "OCC_RES", "OCC_UPDATE_EVERY",
             "OCC_MARCH_STEPS", "OCC_MARCH_RES",
             "PROPOSAL_WIDTH", "PROPOSAL_DEPTH",
             "PROPOSAL_ENC_L", "SAMPLE_SHARD", "GRID_RES", "GRID_LEVELS",
             "GRID_COMP_DENSITY", "GRID_COMP_APP", "GRID_DECODER_WIDTH",
             "PROP_GRID_RES", "PROP_GRID_COMP_DENSITY",
             "PROP_GRID_COMP_APP", "PROP_GRID_DECODER_WIDTH",
             "GRID_SIGMA_WIDTH"}
_FLOAT_KEYS = {"LEARNING", "LR_GAMMA", "OCC_EXTENT", "OCC_THRESH",
               "OCC_SUBSET", "GRID_EXTENT", "GRID_LR_MULT", "GRID_LEVEL_LR",
               "GRID_TV", "DIST_LOSS", "PROP_INTERLEVEL", "NEAR", "FAR"}
_BOOL_KEYS = {"CONTINUE", "USE_PALLAS", "COMPAT_SORT", "STRATIFIED", "NDC",
              "HOST_FEED", "WHITE_BKGD", "OCC_GRID", "FUSED_RENDER",
              "PROPOSAL", "PROP_PALLAS", "VAL_METRICS", "CONTRACT",
              "LINDISP", "GRID_HYBRID", "PROP_GRID_HYBRID",
              "GRID_LEVEL_FOLD"}
_KEY_TO_FIELD = {
    "GPU": "gpu", "IMG_DIR": "img_dir", "RESULTS_PATH": "results_path",
    "CKPT_PATH": "ckpt_path", "LOW_RES": "low_res", "TOTAL_ITER": "total_iter",
    "EPOCH": "total_iter",  # alias: shipped INIs use EPOCH (conf/lego.ini:6)
    "BATCH_RAY": "batch_ray", "LEARNING": "learning", "LR_GAMMA": "lr_gamma",
    "LR_MILESTONE": "lr_milestone", "N_COARSE": "n_coarse", "N_FINE": "n_fine",
    "DATA_TYPE": "data_type", "STEP": "step", "DECAY_END": "decay_end",
    "SCHED": "sched", "CONTINUE": "continue_",
    "SEED": "seed", "PRECISION": "precision", "USE_PALLAS": "use_pallas",
    "FUSED_RENDER": "fused_render",
    "COMPAT_SORT": "compat_sort", "STRATIFIED": "stratified", "NDC": "ndc",
    "CONTRACT": "contract", "LINDISP": "lindisp",
    "NEAR": "near", "FAR": "far",
    "MESH_SHAPE": "mesh_shape", "LOG_DIR": "log_dir",
    "RENDER_CHUNK": "render_chunk",
    "PIXEL_DTYPE": "pixel_dtype", "HOST_FEED": "host_feed",
    "PROFILE_STEPS": "profile_steps", "WHITE_BKGD": "white_bkgd",
    "VAL_METRICS": "val_metrics",
    "OCC_GRID": "occ_grid", "OCC_RES": "occ_res", "OCC_EXTENT": "occ_extent",
    "OCC_THRESH": "occ_thresh", "OCC_UPDATE_EVERY": "occ_update_every",
    "OCC_SUBSET": "occ_subset", "OCC_MARCH_STEPS": "occ_march_steps",
    "OCC_MARCH_RES": "occ_march_res",
    "PROPOSAL": "proposal", "PROPOSAL_WIDTH": "proposal_width",
    "PROPOSAL_DEPTH": "proposal_depth", "PROPOSAL_ENC_L": "proposal_enc_l",
    "PROP_PALLAS": "prop_pallas",
    "SAMPLE_SHARD": "sample_shard",
    "FINE_FIELD": "fine_field", "GRID_RES": "grid_res",
    "GRID_LEVELS": "grid_levels",
    "GRID_COMP_DENSITY": "grid_comp_density", "GRID_COMP_APP": "grid_comp_app",
    "GRID_DECODER_WIDTH": "grid_decoder_width", "GRID_EXTENT": "grid_extent",
    "GRID_LR_MULT": "grid_lr_mult", "GRID_LEVEL_LR": "grid_level_lr",
    "GRID_LEVEL_FOLD": "grid_level_fold",
    "GRID_TV": "grid_tv",
    "GRID_LOOKUP": "grid_lookup", "GRID_PALLAS": "grid_pallas",
    "GRID_HYBRID": "grid_hybrid", "GRID_SIGMA_WIDTH": "grid_sigma_width",
    "GRID_UPSAMPLE": "grid_upsample", "DIST_LOSS": "dist_loss",
    "PROP_INTERLEVEL": "prop_interlevel",
    "PROP_FIELD": "prop_field", "PROP_GRID_RES": "prop_grid_res",
    "PROP_GRID_COMP_DENSITY": "prop_grid_comp_density",
    "PROP_GRID_COMP_APP": "prop_grid_comp_app",
    "PROP_GRID_DECODER_WIDTH": "prop_grid_decoder_width",
    "PROP_GRID_HYBRID": "prop_grid_hybrid",
}


def parse_grid_upsample(spec: str) -> List[tuple]:
    """``GRID_UPSAMPLE`` schedule string -> sorted ``[(iter, res), ...]``.

    Format: comma-separated ``iter:res`` pairs, e.g. ``"2000:384,4000:512"``.
    Iterations and resolutions must both be strictly increasing (this is an
    UPsampling schedule; downsampling would discard information)."""
    spec = spec.strip()
    if not spec:
        return []
    pairs = []
    for tok in spec.replace(";", ",").split(","):
        tok = tok.strip()
        if not tok:
            continue
        it_s, _, res_s = tok.partition(":")
        try:
            pairs.append((int(it_s), int(res_s)))
        except ValueError:
            raise ValueError(
                f"GRID_UPSAMPLE entry {tok!r} is not 'iter:res'") from None
    pairs.sort()
    for (i0, r0), (i1, r1) in zip(pairs, pairs[1:]):
        if i0 == i1 or r1 <= r0:
            raise ValueError(
                "GRID_UPSAMPLE iterations must be distinct and resolutions "
                f"strictly increasing, got {pairs}")
    return pairs


def _parse_milestones(raw: str) -> List[int]:
    raw = raw.strip().strip("[]")
    if not raw:
        return []
    return [int(tok) for tok in raw.replace(",", " ").split()]


def apply_key(cfg: Config, key: str, raw: str) -> None:
    """Apply one INI-style ``KEY=raw`` override to ``cfg`` in place.

    Shared by :func:`load_config` and programmatic override surfaces
    (``bench.py --set``, ``tools/validate.py --extra``). Unknown keys are
    rejected here (unlike INI loading, where unknown keys are ignored for
    reference-INI compatibility) because a typo in a measurement override
    would silently measure the wrong config.
    """
    key = key.upper()
    field = _KEY_TO_FIELD.get(key)
    if field is None:
        raise KeyError(f"unknown config key {key!r}")
    if key == "LR_MILESTONE":
        value = _parse_milestones(raw)
    elif key == "MESH_SHAPE":
        value = None if raw.strip().lower() in ("", "none", "auto") else int(raw)
    elif key in _INT_KEYS:
        value = int(raw)
    elif key in _FLOAT_KEYS:
        value = float(raw)
    elif key in _BOOL_KEYS:
        value = raw.strip().lower() in ("1", "true", "yes", "on")
    else:
        value = raw
    setattr(cfg, field, value)


def load_config(name_or_path: str, conf_dir: str = CONF_DIR) -> Config:
    """Load ``conf/<name>.ini`` (or an explicit path) into a :class:`Config`.

    The section consulted is the scene name (matching reference
    ``main.py:16-18``); if absent, the file's single section is used.
    Unknown keys are ignored; missing keys keep dataclass defaults.
    """
    if os.path.isfile(name_or_path):
        path = name_or_path
        name = os.path.splitext(os.path.basename(path))[0]
    else:
        name = name_or_path
        path = os.path.join(conf_dir, name + ".ini")
        if not os.path.isfile(path):
            raise FileNotFoundError(f"no config file at {path}")

    parser = configparser.ConfigParser()
    parser.read(path)
    if parser.has_section(name):
        section = parser[name]
    elif parser.sections():
        section = parser[parser.sections()[0]]
    else:
        raise ValueError(f"{path} contains no sections")

    cfg = Config()
    # EPOCH is only a fallback for TOTAL_ITER, never an override.
    items = {k.upper(): v for k, v in section.items()}
    if "TOTAL_ITER" in items:
        items.pop("EPOCH", None)
    for key, raw in items.items():
        if key not in _KEY_TO_FIELD:
            continue
        apply_key(cfg, key, raw)
    return cfg
