"""Convert reference (torch) checkpoints to our Flax/NHWC parameter trees.

Reference checkpoints are ``.pth`` files holding ``{'params': state_dict}``
(or ``params_ema``) with NCHW/OIHW tensors (reference base_model.py:212-256).
Conversion rules:

* conv weight  (O, I, kH, kW) -> (kH, kW, I, O)   [flax HWIO]
* linear weight (out, in)     -> (in, out)
* everything else unchanged
* names: ``module.`` prefixes stripped; ``a.0.b`` module-list indices fused
  to ``a_0.b`` (our naming convention); ``weight`` -> ``kernel``.

Archs whose structure diverges (e.g. torch ``nn.Sequential`` upsamplers)
declare ``TORCH_KEY_RULES`` — a list of ``(regex, replacement)`` applied to
torch keys first.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def convert_tensor(key: str, arr: np.ndarray) -> np.ndarray:
    if key in ('kernel', 'weight', 'k0', 'k1') or key.endswith('kernel') or key.endswith('weight'):
        if arr.ndim == 5:   # conv3d OIDHW -> DHWIO
            return np.transpose(arr, (2, 3, 4, 1, 0))
        if arr.ndim == 4:   # OIHW -> HWIO
            return np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 3:   # conv1d OIW -> WIO
            return np.transpose(arr, (2, 1, 0))
        if arr.ndim == 2:   # (out, in) -> (in, out)
            return np.transpose(arr, (1, 0))
    return arr


def torch_key_to_path(key: str, rules: Optional[Sequence[Tuple[str, Any]]] = None) -> List[str]:
    """Map a torch state_dict key to a flax param path."""
    if key.startswith('module.'):
        key = key[len('module.'):]
    for pattern, repl in (rules or []):
        key = re.sub(pattern, repl, key)
    # fuse ModuleList indices: a.0.b -> a_0.b (iterate for nested lists:
    # a.2.0.b -> a_2_0.b)
    while re.search(r'\.(\d+)(\.|$)', key):
        key = re.sub(r'\.(\d+)(\.|$)', lambda m: f'_{m.group(1)}{m.group(2)}', key, count=1)
    parts = key.split('.')
    if parts[-1] in ('weight', 'weight_orig'):  # weight_orig: spectral-norm wrapper
        parts[-1] = 'kernel'
    return parts


def convert_torch_state_dict(state_dict: Dict[str, Any],
                             rules: Optional[Sequence[Tuple[str, Any]]] = None) -> Dict[str, Any]:
    """torch state_dict -> nested flax params dict."""
    out: Dict[str, Any] = {}
    for key, value in state_dict.items():
        if key.endswith(('.mask', 'relative_position_index', 'attn_mask')):
            continue  # fixed buffers (ECBSR masks, Swin indices) are code constants here
        if key.endswith(('.weight_u', '.weight_v')):
            continue  # spectral-norm power-iteration state (recomputed on TPU)
        if key.endswith('num_batches_tracked'):
            continue  # BN step counter — meaningless for frozen inference BN
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, 'detach') else value)
        path = torch_key_to_path(key, rules)
        arr = convert_tensor(path[-1], arr)
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    return out


def load_torch_checkpoint(path: str,
                          param_key: str = 'params',
                          template: Any = None,
                          rules: Optional[Sequence[Tuple[str, Any]]] = None) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint and convert it."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    if param_key in ckpt:
        state_dict = ckpt[param_key]
    elif param_key == 'params_ema' and 'params' in ckpt:
        state_dict = ckpt['params']
    elif all(hasattr(v, 'shape') for v in ckpt.values()):
        state_dict = ckpt  # bare state dict
    else:
        raise KeyError(f'param key {param_key} not found in {path}; keys: {list(ckpt)[:8]}')
    return convert_torch_state_dict(state_dict, rules)
