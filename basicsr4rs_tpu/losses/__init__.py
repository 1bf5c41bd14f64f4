"""Loss builder with auto-discovery (reference: basicsr/losses/__init__.py:19)."""

from __future__ import annotations

import importlib
from copy import deepcopy
from os import path as osp

from ..utils.logger import get_root_logger
from ..utils.misc import scandir
from ..utils.registry import LOSS_REGISTRY

__all__ = ['build_loss']

loss_folder = osp.dirname(osp.abspath(__file__))
loss_filenames = [osp.splitext(osp.basename(v))[0] for v in scandir(loss_folder)
                  if v.endswith('_loss.py')]
_loss_modules = [importlib.import_module(f'basicsr4rs_tpu.losses.{file_name}')
                 for file_name in loss_filenames]


def build_loss(opt):
    """Instantiate a loss by its ``type`` key."""
    opt = deepcopy(opt)
    loss_type = opt.pop('type')
    loss = LOSS_REGISTRY.get(loss_type)(**opt)
    logger = get_root_logger()
    logger.info(f'Loss [{loss.__class__.__name__}] is created.')
    return loss
