"""YAML experiment-config parsing.

Keeps the reference's config contract (reference: basicsr/utils/options.py:99-218):
one YAML file per experiment naming model/network/dataset/loss/metric types that
the registries resolve; CLI overrides via ``--force_yml a:b=c``; auto-expansion
of experiment directories; ``scale``/``phase`` propagation into dataset opts;
debug-mode frequency shrinking. The implementation is new and JAX-flavoured:
seeds feed ``jax.random`` keys (threaded explicitly by the training loop) and
``num_gpu: auto`` resolves to ``jax.device_count()``.
"""

from __future__ import annotations

import argparse
import os
import random
import time
from collections import OrderedDict
from os import path as osp
from typing import Any, Dict, Optional, Tuple

import yaml

from .dist_util import get_dist_info, init_dist, master_only


def ordered_yaml():
    """Return (Loader, Dumper) preserving dict order (reference
    basicsr/utils/options.py:13-35)."""
    try:
        from yaml import CDumper as Dumper
        from yaml import CLoader as Loader
    except ImportError:
        from yaml import Dumper, Loader

    _mapping_tag = yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG

    def dict_representer(dumper, data):
        return dumper.represent_dict(data.items())

    def dict_constructor(loader, node):
        return OrderedDict(loader.construct_pairs(node))

    Dumper.add_representer(OrderedDict, dict_representer)
    Loader.add_constructor(_mapping_tag, dict_constructor)
    return Loader, Dumper


def yaml_load(f: str) -> Dict[str, Any]:
    """Load YAML from a file path or a YAML string (reference
    basicsr/utils/options.py:38-51)."""
    if os.path.isfile(f):
        with open(f, 'r') as fh:
            return yaml.load(fh, Loader=ordered_yaml()[0])
    if f.endswith(('.yml', '.yaml')) and '\n' not in f:
        # looks like a path, not inline YAML — fail loudly instead of
        # "parsing" the filename into a bare string
        raise FileNotFoundError(f'option file not found: {f}')
    return yaml.load(f, Loader=ordered_yaml()[0])


def dict2str(opt: Dict[str, Any], indent_level: int = 1) -> str:
    """Pretty-print a nested option dict (reference options.py:54-72)."""
    msg = '\n'
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + f'{k}:['
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + f'{k}: {v}\n'
    return msg


def _postprocess_value(v: str) -> Any:
    """Parse a CLI override string into None/bool/number/list/str
    (reference options.py:75-96)."""
    if v in ('~', 'none', 'None'):
        return None
    if v.lower() == 'true':
        return True
    if v.lower() == 'false':
        return False
    if v.startswith('!!float'):
        return float(v.replace('!!float', ''))
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    if v.startswith('[') and v.endswith(']'):
        return eval(v, {'__builtins__': {}})  # noqa: S307 - literal lists only
    return v


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs. Device-side randomness uses explicit
    ``jax.random`` keys derived from ``opt['manual_seed']``."""
    import numpy as np
    random.seed(seed)
    np.random.seed(seed)


def apply_force_yml(opt: Dict[str, Any], force_yml) -> None:
    """Apply ``a:b:c=value`` deep overrides (reference options.py:132-144)."""
    if not force_yml:
        return
    for entry in force_yml:
        entry = entry.replace(' ', '')
        keys, value = entry.split('=', 1)
        value = _postprocess_value(value)
        node = opt
        key_list = keys.split(':')
        for key in key_list[:-1]:
            node = node[key]
        node[key_list[-1]] = value


def parse_options(root_path: str,
                  is_train: bool = True,
                  args: Optional[argparse.Namespace] = None) -> Tuple[Dict[str, Any], argparse.Namespace]:
    """Parse CLI args + YAML into the experiment option dict.

    Mirrors the reference CLI surface (basicsr/utils/options.py:99-130):
    ``-opt`` / ``--launcher`` / ``--auto_resume`` / ``--debug`` /
    ``--force_yml``.
    """
    if args is None:
        parser = argparse.ArgumentParser()
        parser.add_argument('-opt', type=str, required=True, help='Path to option YAML file.')
        parser.add_argument('--launcher', choices=['none', 'jax', 'pytorch', 'slurm'],
                            default='none', help='job launcher')
        parser.add_argument('--auto_resume', action='store_true')
        parser.add_argument('--debug', action='store_true')
        parser.add_argument('--local_rank', type=int, default=0)
        parser.add_argument('--force_yml', nargs='+', default=None,
                            help='Force to update yml files. Example: train:ema_decay=0.999')
        args = parser.parse_args()

    opt = yaml_load(args.opt)

    init_dist(args.launcher)
    rank, world_size = get_dist_info()
    opt['rank'], opt['world_size'] = rank, world_size
    opt['dist'] = args.launcher not in (None, 'none')

    if args.force_yml is not None:
        apply_force_yml(opt, args.force_yml)

    if args.debug and not opt['name'].startswith('debug'):
        opt['name'] = 'debug_' + opt['name']

    # Random seed: reference offsets by rank (options.py:130); we keep that
    # for host-side RNG while device RNG is derived from the same seed via
    # fold_in(process_index) in the model.
    seed = opt.get('manual_seed')
    if seed is None:
        seed = random.randint(1, 10000)
        opt['manual_seed'] = seed
    set_random_seed(seed + rank)

    opt['auto_resume'] = args.auto_resume
    opt['is_train'] = is_train

    if opt.get('num_gpu') == 'auto':
        import jax
        opt['num_gpu'] = jax.device_count()

    # Propagate scale/phase into each dataset opt (reference options.py:157-166).
    for phase, dataset in (opt.get('datasets') or {}).items():
        phase = phase.split('_')[0]
        dataset['phase'] = phase
        if 'scale' in opt:
            dataset['scale'] = opt['scale']
        if dataset.get('dataroot_gt') is not None:
            dataset['dataroot_gt'] = osp.expanduser(dataset['dataroot_gt'])
        if dataset.get('dataroot_lq') is not None:
            dataset['dataroot_lq'] = osp.expanduser(dataset['dataroot_lq'])

    # Expand network pretrain paths.
    for key, val in opt.get('path', {}).items():
        if (val is not None) and ('resume_state' in key or 'pretrain_network' in key):
            opt['path'][key] = osp.expanduser(val)

    # Experiment directory layout (reference options.py:173-199).
    if is_train:
        experiments_root = opt['path'].get('experiments_root') or osp.join(root_path, 'experiments')
        experiments_root = osp.join(experiments_root, opt['name'])
        opt['path']['experiments_root'] = experiments_root
        opt['path']['models'] = osp.join(experiments_root, 'models')
        opt['path']['training_states'] = osp.join(experiments_root, 'training_states')
        opt['path']['log'] = experiments_root
        opt['path']['visualization'] = osp.join(experiments_root, 'visualization')
        if 'debug' in opt['name']:
            if opt.get('val'):
                opt['val']['val_freq'] = 8
            if opt.get('logger'):
                opt['logger']['print_freq'] = 1
                opt['logger']['save_checkpoint_freq'] = 8
    else:
        results_root = opt['path'].get('results_root') or osp.join(root_path, 'results')
        results_root = osp.join(results_root, opt['name'])
        opt['path']['results_root'] = results_root
        opt['path']['log'] = results_root
        opt['path']['visualization'] = osp.join(results_root, 'visualization')

    return opt, args


@master_only
def copy_opt_file(opt_file: str, experiments_root: str) -> None:
    """Copy the config into the experiment dir with a provenance header
    (reference options.py:204-218)."""
    import sys
    os.makedirs(experiments_root, exist_ok=True)
    cmd = ' '.join(sys.argv)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    with open(opt_file, 'r') as f:
        lines = f.readlines()
    lines.insert(0, f'# GENERATE TIME: {time.asctime()}\n# CMD:\n# {cmd}\n\n')
    with open(filename, 'w') as f:
        f.writelines(lines)
