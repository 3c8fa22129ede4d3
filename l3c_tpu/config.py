"""Experiment configuration: frozen dataclasses + `.cf` file parser.

Replaces the reference's fjcommon.config_parser + helpers/global_config.py
combo (SURVEY.md section 1, config system row): `.cf` files are `key = value`
python literals with single inheritance via a leading `use <parent.cf>` line
(e.g. /root/reference/src/configs/ms/cr_rgb_shared.cf:1), and `-p key=value`
CLI overrides are merged on top with unused-key detection
(global_config.py:73-118, trainer.py:238-244).

Here the parsed dict is frozen into typed dataclasses so the model code gets
static, hashable configs (jit-friendly: configs are Python-level constants).
"""
from __future__ import annotations

import ast
import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

# --------------------------------------------------------------------- specs


@dataclasses.dataclass(frozen=True)
class EncConfig:
    cls: str = "EDSRLikeEnc"          # or 'BicubicSubsampling'
    num_blocks: int = 8
    feed_F: bool = True
    importance_map: bool = False


@dataclasses.dataclass(frozen=True)
class DecConfig:
    cls: str = "EDSRDec"
    num_blocks: int = 8
    skip: bool = True


@dataclasses.dataclass(frozen=True)
class QConfig:
    cls: str = "Quantizer"
    C: int = 5
    L: int = 25
    levels_range: Tuple[float, float] = (-1.0, 1.0)
    sigma: float = 2.0


@dataclasses.dataclass(frozen=True)
class ProbConfig:
    K: int = 10


@dataclasses.dataclass(frozen=True)
class MsConfig:
    """Network config; field names mirror configs/ms/cr.cf."""
    num_scales: int = 3
    Cf: int = 64
    kernel_size: int = 3
    rgb_bicubic_baseline: bool = False
    shared_across_scales: bool = False
    enc: EncConfig = EncConfig()
    dec: DecConfig = DecConfig()
    q: QConfig = QConfig()
    prob: ProbConfig = ProbConfig()
    optim: str = "RMSprop"
    lr_initial: float = 1e-4
    lr_schedule: str = "exp_0.75_e5"
    weight_decay: float = 0.0
    dmll_enable_grad: int = 0
    learned_L: bool = False
    after_q1x1: bool = True
    x4_down_in_scale0: bool = False
    # 'float32' (reference parity) or 'bfloat16' (MXU-rate convs; the
    # mixture parameters land in bf16, costing a little bitrate)
    compute_dtype: str = "float32"

    def __post_init__(self):
        if self.q.C == 3 and not self.rgb_bicubic_baseline:
            # The channel-count heuristic that distinguishes the RGB
            # scale from bottleneck scales is the reference's own
            # (logistic_mixture.py:68-73 keys the classifier's output
            # width on C == 3): a 3-channel bottleneck gets RGB-style
            # 4-parameter mixtures while the loss/coder expect 3, and
            # training/coding fail with shape errors downstream. Fail
            # fast with the reason instead.
            raise ValueError(
                "q.C == 3 collides with the RGB channel-count heuristic "
                "(reference logistic_mixture.py:68-73); use C != 3 for "
                "bottlenecks (or rgb_bicubic_baseline, where every "
                "scale is RGB)")

    @property
    def padding_fac(self) -> int:
        return 2 ** self.num_scales


@dataclasses.dataclass(frozen=True)
class DlConfig:
    """Data config; field names mirror configs/dl/oi.cf."""
    batchsize_train: int = 30
    batchsize_val: int = 30
    crop_size: int = 128
    max_epochs: Optional[int] = None
    image_cache_pkl: Optional[str] = None
    train_imgs_glob: str = ""
    val_glob: str = ""
    val_glob_min_size: Optional[int] = None
    num_val_batches: int = 5
    # If set (or if <val dir>/fixedimg.{jpg,png} exists), this image is
    # pinned as the FIRST validation example so TensorBoard heavy
    # summaries show a consistent image across runs — the reference
    # bundles src/train/fixedimg.jpg for this
    # (multiscale_trainer.py:156-166).
    val_fixed_first: Optional[str] = None
    # Strong photo-preserving augmentation (channel permutation, gamma
    # jitter, vertical flips) for small offline corpora — see
    # data.images._strong_aug. Off for Open-Images-scale data.
    aug_strong: bool = False
    # Offline-corpus rebalancing: sample real-photo tiles (basename
    # without data.synth's 'x_synth' prefix) this many times more often
    # than synthetic ones. The held-out val measures real-photo
    # statistics while the offline train mix is ~82% synthetic; >1
    # shifts the sampled mix back toward what val measures. 1 = off.
    real_oversample: int = 1


# --------------------------------------------------------------------- parser


def _parse_value(s: str) -> Any:
    s = s.strip()
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s  # bare string


def parse_cf(path: str) -> Dict[str, Any]:
    """Parse a `.cf` file into a flat dict, resolving `use` inheritance.

    Grammar (matches the reference configs): comment lines start with '#',
    an optional `use <relpath>` line pulls in a parent (child wins), other
    lines are `key = python_literal` with dotted keys like `enc.num_blocks`.
    """
    d: Dict[str, Any] = {}
    base = os.path.dirname(path)
    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            if line.startswith("use "):
                parent = line[len("use "):].strip()
                parent_path = os.path.join(base, parent)
                parent_d = parse_cf(parent_path)
                parent_d.update(d)   # keys seen so far win? no: child file
                d = parent_d          # keys AFTER `use` override parent
                continue
            if "=" not in line:
                raise ValueError(f"{path}: cannot parse line {raw!r}")
            key, val = line.split("=", 1)
            d[key.strip()] = _parse_value(val)
    return d


def _nested(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split(".")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


_SUB_CONFIGS = {"EncConfig": EncConfig, "DecConfig": DecConfig,
                "QConfig": QConfig, "ProbConfig": ProbConfig}


def _build(cls, d: Dict[str, Any], used: set, prefix: str = ""):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        type_name = f.type if isinstance(f.type, str) else f.type.__name__
        if type_name in _SUB_CONFIGS:
            kwargs[f.name] = _build(_SUB_CONFIGS[type_name], v, used,
                                    prefix + f.name + ".")
        else:
            used.add(prefix + f.name)
            if isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
    return cls(**kwargs)


_FLAT_RENAMES = {"lr.initial": "lr_initial", "lr.schedule": "lr_schedule"}


def ms_config_from_dict(flat: Dict[str, Any],
                        strict: bool = True) -> MsConfig:
    flat = {_FLAT_RENAMES.get(k, k): v for k, v in flat.items()}
    nested = _nested(flat)
    used: set = set()
    cfg = _build(MsConfig, nested, used)
    if strict:
        _check_unused(flat, used, "ms")
    return cfg


def dl_config_from_dict(flat: Dict[str, Any],
                        strict: bool = True) -> DlConfig:
    nested = _nested(flat)
    used: set = set()
    cfg = _build(DlConfig, nested, used)
    if strict:
        _check_unused(flat, used, "dl")
    return cfg


def _check_unused(flat: Dict[str, Any], used: set, kind: str):
    """Reject silently-ignored keys (parity with trainer.py:238-244)."""
    unused = [k for k in flat if k not in used]
    if unused:
        raise ValueError(f"Unknown {kind} config keys: {sorted(unused)}")


def load_ms_config(path: str, overrides: Optional[Dict[str, Any]] = None
                   ) -> MsConfig:
    flat = parse_cf(path)
    flat.update(overrides or {})
    return ms_config_from_dict(flat)


def load_dl_config(path: str, overrides: Optional[Dict[str, Any]] = None
                   ) -> DlConfig:
    flat = parse_cf(path)
    flat.update(overrides or {})
    return dl_config_from_dict(flat)


def parse_overrides(specs) -> Dict[str, Any]:
    """Parse `-p key=value` CLI overrides (global_config.py:99-118)."""
    out: Dict[str, Any] = {}
    for spec in specs or []:
        if "=" not in spec:
            out[spec] = True  # bare flag
            continue
        k, v = spec.split("=", 1)
        out[k.strip()] = _parse_value(v)
    return out
