"""Small host-side helpers (reference: basicsr/utils/misc.py)."""

from __future__ import annotations

import os
import re
import time
from os import path as osp
from typing import Iterator, Optional

from .dist_util import master_only


def get_time_str() -> str:
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def mkdir_and_rename(path: str) -> None:
    """mkdir; if it exists, rename the old one with a timestamp suffix
    (reference misc.py:24-35)."""
    if osp.exists(path):
        new_name = path + '_archived_' + get_time_str()
        print(f'Path already exists. Rename it to {new_name}', flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


@master_only
def make_exp_dirs(opt) -> None:
    """Create the experiment directory tree (reference misc.py:38-49)."""
    path_opt = dict(opt['path'])
    if opt['is_train']:
        mkdir_and_rename(path_opt.pop('experiments_root'))
    else:
        mkdir_and_rename(path_opt.pop('results_root'))
    for key, path in path_opt.items():
        if ('strict_load' in key) or ('pretrain_network' in key) or (
                'resume' in key) or ('param_key' in key) or path is None:
            continue
        os.makedirs(path, exist_ok=True)


def scandir(dir_path: str,
            suffix: Optional[str] = None,
            recursive: bool = False,
            full_path: bool = False) -> Iterator[str]:
    """Recursively scan files (reference misc.py:52-91)."""
    if isinstance(suffix, (str, tuple)) or suffix is None:
        pass
    else:
        raise TypeError('"suffix" must be a string or tuple of strings')

    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith('.') and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = osp.relpath(entry.path, root)
                if suffix is None or return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix=suffix, recursive=recursive)

    return _scandir(dir_path, suffix, recursive)


def check_resume(opt, resume_iter: int) -> None:
    """On resume, rewrite ``pretrain_network_*`` to the matching checkpoint
    paths (reference misc.py:94-124). Our checkpoints are Orbax directories
    ``models/net_{label}_{iter}`` rather than ``.pth`` files."""
    if not opt['path'].get('resume_state'):
        return
    networks = [key for key in opt.keys() if key.startswith('network_')]
    flag_pretrain = any(
        opt['path'].get(f'pretrain_{network}') is not None for network in networks)
    if flag_pretrain:
        print('pretrain_network paths will be ignored during resuming.', flush=True)
    for network in networks:
        name = f'pretrain_{network}'
        basename = network.replace('network_', '')
        if opt['path'].get('ignore_resume_networks') is None or (
                network not in opt['path']['ignore_resume_networks']):
            opt['path'][name] = osp.join(opt['path']['models'], f'net_{basename}_{resume_iter}')
            print(f"Set {name} to {opt['path'][name]}", flush=True)
    # EMA param key downgrade handled by the loader (params_ema -> params).


def sizeof_fmt(size: float, suffix: str = 'B') -> str:
    """Human-readable size (reference misc.py:127-135)."""
    for unit in ['', 'K', 'M', 'G', 'T', 'P', 'E', 'Z']:
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'


def find_latest_checkpoint_iter(state_dir: str) -> Optional[int]:
    """Auto-resume: pick the max-iteration state dir under
    ``training_states/`` (reference: basicsr/train.py:69-89)."""
    if not osp.isdir(state_dir):
        return None
    iters = []
    for name in os.listdir(state_dir):
        m = re.fullmatch(r'(\d+)(\.state)?', name)
        if m:
            iters.append(int(m.group(1)))
    return max(iters) if iters else None
