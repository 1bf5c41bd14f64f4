"""Network builder with auto-discovery (reference: basicsr/archs/__init__.py:18)."""

from __future__ import annotations

import importlib
from copy import deepcopy
from os import path as osp

from ..utils.logger import get_root_logger
from ..utils.misc import scandir
from ..utils.registry import ARCH_REGISTRY

__all__ = ['build_network']

arch_folder = osp.dirname(osp.abspath(__file__))
arch_filenames = [osp.splitext(osp.basename(v))[0] for v in scandir(arch_folder)
                  if v.endswith('_arch.py')]
_arch_modules = [importlib.import_module(f'basicsr4rs_tpu.archs.{file_name}')
                 for file_name in arch_filenames]


def build_network(opt):
    """Instantiate a network (a Flax module definition — parameters are
    created by the owning model via ``init``)."""
    opt = deepcopy(opt)
    network_type = opt.pop('type')
    net = ARCH_REGISTRY.get(network_type)(**opt)
    logger = get_root_logger()
    logger.info(f'Network [{net.__class__.__name__}] is created.')
    return net
