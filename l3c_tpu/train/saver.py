"""Checkpoint save/restore with the reference's keep policy.

Mirrors /root/reference/src/helpers/saver.py semantics: a checkpoint every
`keep_tmp_itr` (250) iterations written as `ckpt_{itr:010d}.ckpt.tmp`;
every `keep_every`-th (10) becomes persistent (renamed, intermediates
deleted, last `keep_tmp_last` (3) temporaries kept). Restore resolves
itr == -1 to the latest, otherwise the closest checkpoint <= itr
(saver.py:70-84, 114-181).

Serialization is flax msgpack over the {'params', 'opt_state', 'step'}
pytree — no pickle of live objects, so checkpoints are stable across
refactors (and loadable for the codec, which only needs 'params').
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import flax.serialization as fser
import jax

CKPT_RE = re.compile(r"ckpt_(\d{10})\.ckpt(\.tmp)?$")


def ckpt_name(itr: int, tmp: bool) -> str:
    return f"ckpt_{itr:010d}.ckpt" + (".tmp" if tmp else "")


class Saver:
    def __init__(self, out_dir: str, keep_tmp_itr: int = 250,
                 keep_every: int = 10, keep_tmp_last: int = 3):
        self.ckpt_dir = os.path.join(out_dir, "ckpts")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.keep_tmp_itr = keep_tmp_itr
        self.keep_every = keep_every
        self.keep_tmp_last = keep_tmp_last
        self._saved_tmp: List[Tuple[int, str]] = []
        self._num_saves = 0

    def save_due(self, itr: int) -> bool:
        return itr % self.keep_tmp_itr == 0

    def save(self, state: Dict[str, Any], itr: int):
        """state: pytree with at least {'params', 'opt_state', 'step'}."""
        state = jax.device_get(state)
        blob = fser.to_bytes(state)
        self._num_saves += 1
        make_persistent = (self._num_saves % self.keep_every) == 0
        p = os.path.join(self.ckpt_dir, ckpt_name(itr, tmp=True))
        tmp_write = p + ".write"
        with open(tmp_write, "wb") as f:
            f.write(blob)
        os.replace(tmp_write, p)  # atomic-ish (saver.py .tmp rename)
        self._saved_tmp.append((itr, p))
        if make_persistent:
            persistent = os.path.join(self.ckpt_dir,
                                      ckpt_name(itr, tmp=False))
            os.replace(p, persistent)
            self._saved_tmp.pop()
            # drop all older temporaries — superseded by the persistent one
            for _, q in self._saved_tmp:
                if os.path.exists(q):
                    os.remove(q)
            self._saved_tmp.clear()
        elif len(self._saved_tmp) > self.keep_tmp_last:
            _, oldest = self._saved_tmp.pop(0)
            if os.path.exists(oldest):
                os.remove(oldest)
        return p


def _overlay_state(template_sd, loaded_sd):
    """Recursively overlay a loaded state dict onto a template state
    dict: dict keys present in both recurse, leaves are adopted only
    when the shapes match; everything else keeps the template value."""
    if isinstance(template_sd, dict):
        if not isinstance(loaded_sd, dict):
            return template_sd
        return {k: (_overlay_state(v, loaded_sd[k]) if k in loaded_sd
                    else v)
                for k, v in template_sd.items()}
    t_shape = getattr(template_sd, "shape", None)
    l_shape = getattr(loaded_sd, "shape", None)
    if t_shape is not None and l_shape is not None and t_shape != l_shape:
        return template_sd
    return loaded_sd


class Restorer:
    def __init__(self, out_dir: str):
        self.ckpt_dir = os.path.join(out_dir, "ckpts")

    def list_ckpts(self) -> List[Tuple[int, str]]:
        if not os.path.isdir(self.ckpt_dir):
            return []
        out = []
        for name in os.listdir(self.ckpt_dir):
            m = CKPT_RE.match(name)
            if m:
                out.append((int(m.group(1)),
                            os.path.join(self.ckpt_dir, name)))
        return sorted(out)

    def get_ckpt_for_itr(self, itr: int = -1) -> Optional[Tuple[int, str]]:
        """-1 => latest; else the closest checkpoint <= itr (or earliest)."""
        ckpts = self.list_ckpts()
        if not ckpts:
            return None
        if itr == -1:
            return ckpts[-1]
        at_most = [c for c in ckpts if c[0] <= itr]
        return at_most[-1] if at_most else ckpts[0]

    def restore(self, template: Dict[str, Any], itr: int = -1,
                strict: bool = True) -> Tuple[int, Dict[str, Any]]:
        """Load into the structure of `template`; returns (itr, state).

        strict=False loads PARTIALLY-matching checkpoints (the
        reference's TrainRestorer strict flag,
        train_restorer.py:26-60 / saver.py:188-210): subtrees present
        in both with matching leaf shapes are adopted, everything else
        keeps the template's (fresh-init) value, and extra checkpoint
        keys are ignored — for warm-starting a changed architecture."""
        found = self.get_ckpt_for_itr(itr)
        if found is None:
            raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
        got_itr, path = found
        with open(path, "rb") as f:
            blob = f.read()
        if strict:
            return got_itr, fser.from_bytes(template, blob)
        loaded_sd = fser.msgpack_restore(blob)
        merged = _overlay_state(fser.to_state_dict(template), loaded_sd)
        return got_itr, fser.from_state_dict(template, merged)

    def restore_params_only(self, params_template, itr: int = -1):
        """For eval/codec: load just the params subtree."""
        found = self.get_ckpt_for_itr(itr)
        if found is None:
            raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
        got_itr, path = found
        with open(path, "rb") as f:
            blob = f.read()
        state = fser.msgpack_restore(blob)
        params = fser.from_state_dict(params_template, state["params"])
        return got_itr, params
