"""Config system: frozen dataclasses + reference-compatible YAML loading.

Replaces the reference's global yacs ``cfg`` singleton
(/root/reference/lib/config/config.py:8-201, lib/config/yacs.py). Key
differences, by design:

- Configs are **immutable, hashable dataclasses** so the cascade hyperparams
  can be passed as static arguments to ``jax.jit`` (the reference reads the
  mutable singleton deep inside math code, e.g. lib/networks/enerf/utils.py:101).
- Same YAML schema as the reference (``configs/enerf/*.yaml``), including
  recursive ``parent_cfg`` merging (reference config.py:170-188) and CLI
  dotted-key overrides ``key.subkey value`` (reference config.py:182-186).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, fields, replace
from typing import Any, Dict, List, Optional, Tuple

import yaml


def _tup(x):
    """Recursively convert lists to tuples so dataclasses stay hashable;
    coerce numeric strings (pyyaml parses ``5e-4`` as a string — YAML 1.1
    wants ``5.0e-4``; yacs coerced these, reference yacs.py:400-430)."""
    if isinstance(x, list):
        return tuple(_tup(v) for v in x)
    if isinstance(x, str):
        try:
            return int(x)
        except ValueError:
            pass
        try:
            return float(x)
        except ValueError:
            pass
    return x


@dataclass(frozen=True)
class CascadeConfig:
    """Per-level cascade hyperparameters.

    Mirrors ``cfg.enerf.cas_config`` — the single most important config
    contract of the reference (configs/enerf/dtu_pretrain.yaml:27-43).
    All per-level vectors are tuples indexed by cascade level.
    """

    num: int = 2
    depth_inv: Tuple[bool, ...] = (True, False)
    volume_scale: Tuple[float, ...] = (0.125, 0.5)
    volume_planes: Tuple[int, ...] = (64, 8)
    im_feat_scale: Tuple[float, ...] = (0.25, 0.5)
    im_ibr_scale: Tuple[float, ...] = (0.25, 1.0)
    render_scale: Tuple[float, ...] = (0.25, 1.0)
    render_im_feat_level: Tuple[int, ...] = (0, 2)
    nerf_model_feat_ch: Tuple[int, ...] = (32, 8)
    render_if: Tuple[bool, ...] = (True, True)
    num_samples: Tuple[int, ...] = (8, 2)
    num_rays: Tuple[int, ...] = (4096, 32768)
    num_patchs: Tuple[int, ...] = (0, 0)
    train_img: Tuple[bool, ...] = (True, True)
    patch_size: Tuple[int, ...] = (-1, -1)
    loss_weight: Tuple[float, ...] = (0.1, 1.0)


@dataclass(frozen=True)
class ENeRFConfig:
    """Mirrors the ``cfg.enerf`` block (dtu_pretrain.yaml:18-43)."""

    train_input_views: Tuple[int, ...] = (2, 3, 4)
    train_input_views_prob: Tuple[float, ...] = (0.1, 0.8, 0.1)
    test_input_views: int = 3
    viewdir_agg: bool = True
    chunk_size: int = 1_000_000
    white_bkgd: bool = False
    eval_depth: bool = False
    eval_center: bool = False
    sample_on_mask: bool = False
    num_fg_layers: int = 1
    # Train-time ray tiling: render in fixed tiles under jax.checkpoint so
    # backward activations are bounded per tile (the reference's 24GB-GPU
    # full-image training OOMs a 16GB v5e otherwise; replaces the
    # reference's serial chunk loop, network.py:45-55, with a remat'd
    # lax.map). 0 = render all rays in one pass. Applies in train mode
    # when the ray count is divisible by the tile.
    train_render_chunk: int = 65536
    # route reductions through the Pallas TPU kernels (identical
    # numerics; no-op choice for correctness, ~5% forward speedup on TPU;
    # requires a TPU backend or interpret mode)
    use_pallas: bool = False
    # Fuse the whole eval render stage (corner blend + IBR head + alpha
    # compositing) into one Pallas kernel (ops/pallas/render.py): reads
    # the gather output once instead of dozens of HBM round trips.
    # Eval-only (the train path keeps the differentiable jnp ops);
    # requires a TPU backend or interpret mode. Numerics match the jnp
    # path to fp-reassociation tolerance.
    fused_render: bool = False
    # v3 fused render: move the render-stage gathers' segment merge +
    # parity select + corner blend INTO the fused render kernel (the
    # kernel reads the raw per-(view, segment) gather rows; blended
    # features never round-trip HBM). Only effective with fused_render;
    # identical numerics to fp-reassociation tolerance.
    fused_gather_blend: bool = False
    # Fuse the eval cost-volume stage (bilinear corner blend + masked
    # cross-view variance) into one Pallas kernel over the warp gather's
    # output (ops/pallas/cost_volume.py). Eval-only; requires a TPU
    # backend or interpret mode. Numerics match the jnp path to
    # fp-reassociation tolerance.
    fused_volume: bool = False
    # Quantize the gather TABLES (packed source-feature blocks) to bf16:
    # halves the HBM bytes of the per-frame feature gathers (the
    # dominant eval cost); lerp weights and all downstream math stay
    # f32. Small feature-precision loss — off for strict torch parity.
    gather_bf16: bool = False
    # Run the fused kernels' CONSTANT (0/1 selection/reduction) matmuls
    # as one bf16 MXU pass each instead of the exact 3-pass split-dot
    # (ops/pallas/render.py _mm1 vs _mm3), and switch the cost-volume
    # kernel's corner blend from lane-starved VPU ops to single-pass
    # MXU matmuls. Rounds blended features / selection inputs to bf16 —
    # a speed/precision trade in the same class as gather_bf16 (the
    # tables and weights are already bf16 at the bf16_all rungs).
    # Eval-only by construction (the fused kernels are eval-only).
    fused_fast_const: bool = False
    # Promise that eval-time rays are the FULL raster grid in raster
    # order (the test-split ray builder emits exactly that). Lets the
    # renderer replace the per-sample trilinear volume gather — the TPU
    # gather emitter is per-row bound — with a static spatial resize
    # (MXU matmuls) + tent-weighted plane contraction: exact trilinear,
    # no gather. Ignored in train mode (train rays are random pixels).
    grid_rays: bool = False
    # TRAIN render stage on the lane-packed layout: assemble the fused
    # kernels' packed operand (ops/ibr.py get_img_feat_packed) and run
    # the kernel's math as differentiable XLA (ops/pallas/render.py
    # render_rays_packed_xla) instead of the per-view (P, S, C<=15) jnp
    # head — the narrow-lane tensors 128-pad on TPU and cost ~100 ms of
    # relayout/broadcast traffic per step at 512×640 (round-5
    # profile_train attribution). Same reference math, fp-reassociation
    # numerics class. Unchunked train renders only (remat tiles keep
    # the jnp path).
    train_packed_render: bool = True
    # composite (ENeRF-Outdoor) knobs. bg_volume_planes mirrors the
    # hardcoded [16, 4] of network_composite.py:122. fg_bbox_hw is the TPU
    # static-shape contract for the per-layer fg crop: the reference crops
    # to a per-frame bbox rounded to ×32 (enerf_outdoor/enerf.py:159-168,
    # dynamic shapes); here the dataset centers a fixed (H, W) window
    # (multiples of 32, full-res units) on the fg bbox so XLA sees one
    # program.
    bg_volume_planes: Tuple[int, ...] = (16, 4)
    fg_bbox_hw: Tuple[int, int] = (256, 256)
    # TPU static-shape contract for mask_at_box sparse rendering
    # (reference network_human.py:90-107 gathers a dynamic ray subset):
    # fraction of H·W rays rendered at the final level. 1.0 = render all
    # rays and zero outside the mask (exact); <1.0 = sorted-gather the
    # masked rays into a fixed-capacity tile (faster; rays beyond the
    # capacity fall back to zero).
    mask_ray_capacity: float = 1.0
    # Static bbox-window sparse rendering for mask_at_box (the fast path;
    # overrides mask_ray_capacity when set): render a fixed (h, w) window
    # positioned on the mask's bounding box each frame (position traced,
    # size static — one XLA program), as a raster-order grid so the
    # gather-free tent-vox sampling and the fused render kernel's
    # cheapest layout apply, then dynamic_update_slice back into the
    # frame. Multiples of 16, at final-level render scale. Must cover
    # the largest per-frame mask bbox (plus 16px snap slack) — content
    # outside the window renders as background, like rays beyond
    # mask_ray_capacity.
    mask_window_hw: Optional[Tuple[int, int]] = None
    cas_config: CascadeConfig = field(default_factory=CascadeConfig)

    @property
    def max_views(self) -> int:
        """Static padded source-view count (TPU fixed-shape contract)."""
        return max(max(self.train_input_views), self.test_input_views)


@dataclass(frozen=True)
class SchedulerConfig:
    type: str = "exponential"
    gamma: float = 0.5
    decay_epochs: int = 50
    milestones: Tuple[int, ...] = (80, 120, 200, 240)
    warmup_factor: float = 1.0 / 3
    warmup_iters: int = 5


@dataclass(frozen=True)
class DatasetConfig:
    data_root: str = "dtu"
    ann_file: str = "data/mvsnerf/dtu_train_all.txt"
    split: str = "train"
    batch_size: int = 1
    input_ratio: float = 1.0
    scene: Optional[str] = None
    input_h_w: Optional[Tuple[int, int]] = None
    frames: Tuple[int, ...] = (0, 1, 1)  # [begin, end, step]
    extra: Tuple[Tuple[str, Any], ...] = ()  # passthrough for dataset-specific keys


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 1
    lr: float = 5e-4
    weight_decay: float = 0.0
    eps: float = 1e-8
    epoch: int = 300
    optim: str = "adam"
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    num_workers: int = 4
    grad_clip_value: float = 40.0  # reference trainer.py:62 clip_grad_value_(40)
    # BN running-stat refresh cadence. The hot train step normalizes by
    # batch statistics but does NOT thread running-stat updates through
    # the grad program: XLA lowers the cost-volume gather as a serial
    # while-loop whenever the BN stats are live outputs (measured 6.4 s
    # vs 3 ms per step on a v5e). A separate jitted refresh program
    # EMAs the running stats every K steps with horizon-matched momentum
    # 0.9^K (torch updates every step with momentum 0.9; same stationary
    # stats, coarser transient — eval-only effect).
    bn_update_every: int = 8
    input_views_num: Tuple[int, ...] = (2, 3, 4)
    input_views_prob: Tuple[float, ...] = (0.1, 0.8, 0.1)


@dataclass(frozen=True)
class Config:
    """Root config. Mirrors the reference's top-level cfg keys."""

    task: str = "enerf"
    exp_name: str = "dtu_pretrain"
    # appended to exp_name as "_{tag}" (reference config.py:157-158);
    # "gitbranch"/"gitcommit" placeholders in exp_name are expanded by
    # make_cfg (config.py:159-160)
    exp_name_tag: str = ""
    save_tag: str = "default"  # extra result_dir component (config.py:164)
    gpus: Tuple[int, ...] = (0,)
    workspace: str = ""

    # module registry keys (replace imp.load_source dotted paths)
    train_dataset_module: str = "enerf_tpu.datasets.dtu"
    test_dataset_module: str = "enerf_tpu.datasets.dtu"
    network_module: str = "enerf_tpu.models.enerf"
    loss_module: str = "enerf_tpu.train.loss"
    evaluator_module: str = "enerf_tpu.eval.evaluator"
    visualizer_module: str = "enerf_tpu.eval.visualizer"

    enerf: ENeRFConfig = field(default_factory=ENeRFConfig)
    train_dataset: DatasetConfig = field(default_factory=DatasetConfig)
    test_dataset: DatasetConfig = field(
        default_factory=lambda: DatasetConfig(
            ann_file="data/mvsnerf/dtu_val_all.txt", split="test"
        )
    )
    train: TrainConfig = field(default_factory=TrainConfig)

    save_result: bool = False
    eval_lpips: bool = True
    fix_random: bool = False
    resume: bool = True
    pretrain: str = ""
    ep_iter: int = 1000
    save_ep: int = 5
    eval_ep: int = 5
    save_latest_ep: int = 1
    log_interval: int = 1
    record_interval: int = 20
    fps: int = 24

    # TPU-specific knobs (no reference counterpart)
    # NaN tripwire: jax_debug_nans re-runs the offending op un-jitted and
    # raises at the source — the reference's NaN -> ipdb drop-ins
    # (network.py:110-111, utils.py:93-94) as a config switch.
    debug_nans: bool = False
    compute_dtype: str = "float32"  # or "bfloat16" for the conv/matmul path
    mesh_shape: Tuple[int, ...] = (-1,)  # data-parallel axis; -1 = all devices
    mesh_axes: Tuple[str, ...] = ("data",)

    # derived dirs (reference config.py:129,162)
    @property
    def trained_model_dir(self) -> str:
        return os.path.join(self.workspace, "trained_model", self.task, self.exp_name)

    @property
    def record_dir(self) -> str:
        return os.path.join(self.workspace, "record", self.task, self.exp_name)

    @property
    def result_dir(self) -> str:
        return os.path.join(self.workspace, "result", self.task,
                            self.exp_name, self.save_tag)


# ---------------------------------------------------------------------------
# YAML loading (reference-compatible)
# ---------------------------------------------------------------------------

def _deep_merge(base: Dict, new: Dict) -> Dict:
    out = dict(base)
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_yaml_tree(path: str) -> Dict:
    """Load a YAML file, recursively merging ``parent_cfg`` chains
    (reference lib/config/config.py:143-160)."""
    with open(path) as f:
        cur = yaml.safe_load(f) or {}
    if "parent_cfg" in cur:
        parent_path = cur["parent_cfg"]
        if not os.path.isabs(parent_path) and not os.path.exists(parent_path):
            cand = os.path.join(os.path.dirname(path), parent_path)
            if os.path.exists(cand):
                parent_path = cand
        parent = load_yaml_tree(parent_path)
        cur = {k: v for k, v in cur.items() if k != "parent_cfg"}
        return _deep_merge(parent, cur)
    return cur


def _coerce(value: str) -> Any:
    """Parse a CLI override string into a python value. yacs semantics
    (yacs.py _decode_cfg_value): ast.literal_eval so ``False,True`` and
    ``48,8`` become tuples (the README eval commands rely on this,
    reference README.md:113)."""
    import ast

    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        pass
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def apply_opts(tree: Dict, opts: List[str]) -> Dict:
    """Apply ``key.subkey value`` CLI override pairs
    (reference config.py:182-186; yacs merge_from_list)."""
    out = dict(tree)
    if "other_opts" in opts:
        opts = opts[: opts.index("other_opts")]
    assert len(opts) % 2 == 0, f"opts must be key/value pairs, got {opts}"
    for key, raw in zip(opts[0::2], opts[1::2]):
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
            node[p] = dict(nxt)
            node = node[p]
        node[parts[-1]] = _coerce(raw)
    return out


_DC_FIELDS = {
    cls: {f.name: f for f in fields(cls)}
    for cls in (Config, ENeRFConfig, CascadeConfig, TrainConfig, SchedulerConfig, DatasetConfig)
}

_NESTED = {
    "enerf": ENeRFConfig,
    "cas_config": CascadeConfig,
    "train": TrainConfig,
    "scheduler": SchedulerConfig,
    "train_dataset": DatasetConfig,
    "test_dataset": DatasetConfig,
}

# reference train block keys that live elsewhere / are sampler metadata
_TRAIN_ALIASES = {"sampler_meta", "batch_sampler", "collator", "batch_size"}


def _build_dataclass(cls, tree: Dict):
    known = _DC_FIELDS[cls]
    kwargs = {}
    extra = []
    for k, v in tree.items():
        if k in _NESTED and k in known:
            kwargs[k] = _build_dataclass(_NESTED[k], v if isinstance(v, dict) else {})
        elif k in known:
            kwargs[k] = _tup(v)
        elif cls is DatasetConfig:
            extra.append((k, _tup(v)))
        elif cls is TrainConfig and k == "sampler_meta" and isinstance(v, dict):
            if "input_views_num" in v:
                kwargs["input_views_num"] = _tup(v["input_views_num"])
            if "input_views_prob" in v:
                kwargs["input_views_prob"] = _tup(v["input_views_prob"])
        # silently ignore unknown keys elsewhere (yacs tolerated extra keys too)
    if cls is DatasetConfig and extra:
        kwargs["extra"] = tuple(extra)
    return cls(**kwargs)


def make_cfg(cfg_file: Optional[str] = None, opts: Optional[List[str]] = None,
             workspace: Optional[str] = None) -> Config:
    """Build a Config from a YAML file + CLI overrides.

    Mirrors reference ``make_cfg`` (config.py:170-188): YAML parent merge,
    then dotted CLI overrides, then derived fields.
    """
    tree: Dict = {}
    if cfg_file:
        tree = load_yaml_tree(cfg_file)
    if opts:
        tree = apply_opts(tree, list(opts))
    if workspace is not None:
        tree["workspace"] = workspace
    elif "workspace" not in tree:
        tree["workspace"] = os.environ.get("workspace", ".")
    # exp_name post-processing (reference config.py:157-160): "_{tag}"
    # suffix, then gitbranch/gitcommit placeholder expansion
    exp_name = tree.get("exp_name", Config.exp_name)
    if tree.get("exp_name_tag"):
        exp_name += "_" + str(tree["exp_name_tag"])
    if "gitbranch" in exp_name or "gitcommit" in exp_name:
        import subprocess

        def _git(*args):
            try:
                return subprocess.run(
                    ["git", *args], capture_output=True, text=True,
                    timeout=10).stdout.strip()
            except Exception:
                return ""
        exp_name = exp_name.replace("gitbranch",
                                    _git("describe", "--all")[6:])
        exp_name = exp_name.replace("gitcommit",
                                    _git("describe", "--tags", "--always"))
    tree["exp_name"] = exp_name
    # reference actor1.yaml puts num_fg_layers at top level; it belongs to
    # the enerf block (read by network_composite)
    if "num_fg_layers" in tree:
        enerf_tree = dict(tree.get("enerf", {}))
        enerf_tree["num_fg_layers"] = tree.pop("num_fg_layers")
        tree["enerf"] = enerf_tree
    # map reference module paths to our registry keys
    for key in ("train_dataset_module", "test_dataset_module", "network_module",
                "loss_module", "evaluator_module", "visualizer_module"):
        if key in tree and isinstance(tree[key], str) and tree[key].startswith("lib."):
            tree[key] = _REFERENCE_MODULE_MAP.get(tree[key], tree[key])
    return _build_dataclass(Config, tree)


# dotted module paths used by the reference YAMLs → our registry keys
_REFERENCE_MODULE_MAP = {
    "lib.datasets.dtu.enerf": "enerf_tpu.datasets.dtu",
    "lib.datasets.nerf.enerf": "enerf_tpu.datasets.nerf_synthetic",
    "lib.datasets.llff.enerf": "enerf_tpu.datasets.llff",
    "lib.datasets.zjumocap.enerf": "enerf_tpu.datasets.zjumocap",
    "lib.datasets.zjumocap.enerf_interactive": "enerf_tpu.datasets.zjumocap_interactive",
    "lib.datasets.enerf_outdoor.enerf": "enerf_tpu.datasets.enerf_outdoor",
    "lib.datasets.enerf_outdoor.enerf_path": "enerf_tpu.datasets.enerf_outdoor_path",
    "lib.networks.enerf.network": "enerf_tpu.models.enerf",
    "lib.networks.enerf.network_human": "enerf_tpu.models.enerf_human",
    "lib.networks.enerf.network_composite": "enerf_tpu.models.enerf_composite",
    "lib.train.losses.enerf": "enerf_tpu.train.loss",
    "lib.evaluators.enerf": "enerf_tpu.eval.evaluator",
    "lib.evaluators.enerf_human": "enerf_tpu.eval.evaluator_human",
    "lib.evaluators.enerf_composite": "enerf_tpu.eval.evaluator_composite",
    "lib.visualizers.enerf": "enerf_tpu.eval.visualizer",
    "lib.visualizers.enerf_interactive": "enerf_tpu.eval.visualizer_interactive",
}


def asdict(cfg) -> Dict:
    return dataclasses.asdict(cfg)


__all__ = [
    "CascadeConfig", "ENeRFConfig", "TrainConfig", "SchedulerConfig",
    "DatasetConfig", "Config", "make_cfg", "load_yaml_tree", "apply_opts",
    "replace", "asdict",
]
