"""Import released reference PyTorch checkpoints into JAX params.

Maps the reference MultiscaleNetwork state_dict (ckpt_*.pt files saved by
helpers/saver.py as {'net': state_dict, ...}) onto this package's flax
parameter tree, handling:

- conv kernels OIHW -> HWIO transposes
- the reference's Sequential index naming (enc body 0..7 ResBlocks + final
  conv at index 8, net.py:104-110; ResBlock's inner Sequential has convs
  at .body.0 and .body.2 with ReLU at .body.1, edsr.py:66-83; to_q conv
  at .to_q.0, net.py:113-119; Upsampler conv at .tail.0, edsr.py:92-107)
- fixed MeanShift convs (sub_rgb_mean, RGBHead's /128) are VERIFIED
  against our hard-coded constants and dropped (edsr.py:52-60)
- quantizer level tables verified against models.grids

Checkpoint layout notes: torch files need torch.load; params-only import
works on CPU torch (baked into the image).
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from ..config import MsConfig
from ..models import grids


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _resblock(dst: Dict, sd: Dict, src_prefix: str):
    return {
        "conv1": {"kernel": _conv_to_flax(sd[f"{src_prefix}.body.0.weight"]),
                  "bias": sd[f"{src_prefix}.body.0.bias"]},
        "conv2": {"kernel": _conv_to_flax(sd[f"{src_prefix}.body.2.weight"]),
                  "bias": sd[f"{src_prefix}.body.2.bias"]},
    }


def _conv(sd: Dict, key: str) -> Dict:
    return {"kernel": _conv_to_flax(sd[f"{key}.weight"]),
            "bias": sd[f"{key}.bias"]}


def import_state_dict(sd: Dict[str, np.ndarray], cfg: MsConfig
                      ) -> Dict:
    """reference state_dict (numpy values) -> flax {'params': ...} tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    S = cfg.num_scales
    nb_e, nb_d = cfg.enc.num_blocks, cfg.dec.num_blocks
    params: Dict = {}

    _verify_fixed_convs(sd)

    for s in range(S):
        # heads: heads.0 = RGBHead (MeanShift + Head), heads.s>=1 = Head
        if not cfg.rgb_bicubic_baseline:
            if s == 0:
                params["head0"] = {"conv": _conv(sd, "heads.0.head.1.head")}
            else:
                params[f"head{s}"] = {"conv": _conv(sd, f"heads.{s}.head")}

            enc = {"down": _conv(sd, f"nets.{s}.enc.down"),
                   "to_q": _conv(sd, f"nets.{s}.enc.to_q.0"),
                   "body_out": _conv(sd, f"nets.{s}.enc.body.{nb_e}")}
            for i in range(nb_e):
                enc[f"block{i}"] = _resblock(enc, sd, f"nets.{s}.enc.body.{i}")
            params[f"enc{s}"] = enc
            _verify_levels(sd, f"nets.{s}.enc.levels", cfg)

        dec = {"head": _conv(sd, f"nets.{s}.dec.head"),
               "body_out": _conv(sd, f"nets.{s}.dec.body.{nb_d}"),
               "tail": {"up0": _conv(sd, f"nets.{s}.dec.tail.0")}}
        for i in range(nb_d):
            dec[f"block{i}"] = _resblock(dec, sd, f"nets.{s}.dec.body.{i}")
        params[f"dec{s}"] = dec

        clf = {"atrous": {
            "lin": _conv(sd, f"prob_clfs.{s}.atrous.lin")}}
        n_rates = len([k for k in sd
                       if re.match(rf"prob_clfs\.{s}\.atrous\.atrous\."
                                   rf"\d+\.weight$", k)])
        for i in range(n_rates):
            clf["atrous"][f"atrous{i}"] = _conv(
                sd, f"prob_clfs.{s}.atrous.atrous.{i}")
        params[f"clf{s}"] = clf

    return {"params": params}


def _verify_fixed_convs(sd: Dict):
    """The reference stores its fixed normalization convs as parameters;
    we implement them as constants — check they hold the expected values
    so a drifted checkpoint is caught loudly."""
    if "sub_rgb_mean.weight" in sd:
        w = sd["sub_rgb_mean.weight"].reshape(3, 3)
        np.testing.assert_allclose(w, np.eye(3), atol=1e-6)
        b = sd["sub_rgb_mean.bias"]
        expect = -255.0 * np.asarray([0.4488, 0.4371, 0.4040])
        np.testing.assert_allclose(b, expect, atol=1e-4)
    if "heads.0.head.0.weight" in sd:
        w = sd["heads.0.head.0.weight"].reshape(3, 3)
        np.testing.assert_allclose(w, np.eye(3) / 128.0, atol=1e-7)
        np.testing.assert_allclose(sd["heads.0.head.0.bias"], 0.0,
                                   atol=1e-7)


def _verify_levels(sd: Dict, key: str, cfg: MsConfig):
    if key not in sd:
        return
    lo, hi = cfg.q.levels_range
    expect = grids.levels(lo, hi, cfg.q.L)
    np.testing.assert_allclose(sd[key], expect, atol=1e-6)


def load_torch_checkpoint(path: str, cfg: MsConfig) -> Tuple[int, Dict]:
    """Load a reference ckpt_*.pt file -> (itr, flax variables)."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    # reference Saver stores {'modules': {'net': sd, ...}, 'itr'} or a
    # raw state_dict depending on version; accept both.
    if isinstance(blob, dict) and "net" in blob:
        sd = blob["net"]
        itr = int(blob.get("itr", -1))
    elif isinstance(blob, dict) and "modules" in blob:
        sd = blob["modules"]["net"]
        itr = int(blob.get("itr", -1))
    else:
        sd, itr = blob, -1
    sd = {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    m = re.search(r"ckpt_(\d+)", path)
    if itr < 0 and m:
        itr = int(m.group(1))
    return itr, import_state_dict(sd, cfg)
