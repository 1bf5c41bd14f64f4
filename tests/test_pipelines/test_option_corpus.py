"""Every shipped option file must parse and reference only registered
components (archs/models/datasets/losses/schedulers)."""

import glob
from os import path as osp

import pytest

import basicsr4rs_tpu.archs  # noqa: F401
import basicsr4rs_tpu.data  # noqa: F401
import basicsr4rs_tpu.losses  # noqa: F401
import basicsr4rs_tpu.models  # noqa: F401
from basicsr4rs_tpu.utils.options import yaml_load
from basicsr4rs_tpu.utils.registry import (ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY,
                                           MODEL_REGISTRY)

ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), '..')
OPTION_FILES = sorted(glob.glob(osp.join(osp.dirname(__file__), '..', '..',
                                         'options', '**', '*.yml'), recursive=True))

KNOWN_SCHEDULERS = {'MultiStepLR', 'CosineAnnealingRestartLR', 'ConstantLR',
                    'MultiStepRestartLR', 'CosineAnnealingRestartCyclicLR'}


@pytest.mark.parametrize('path', OPTION_FILES, ids=lambda p: osp.relpath(p, ROOT))
def test_option_file(path):
    opt = yaml_load(path)
    assert 'name' in opt and 'model_type' in opt
    assert MODEL_REGISTRY.get(opt['model_type']) is not None

    for key, val in opt.items():
        if key.startswith('network') and isinstance(val, dict) and 'type' in val:
            assert ARCH_REGISTRY.get(val['type']) is not None, f'{key}: {val["type"]}'

    for name, ds in (opt.get('datasets') or {}).items():
        if isinstance(ds, dict) and 'type' in ds:
            assert DATASET_REGISTRY.get(ds['type']) is not None, f'dataset {ds["type"]}'

    train = opt.get('train') or {}
    sched = (train.get('scheduler') or {}).get('type')
    if sched:
        assert sched in KNOWN_SCHEDULERS, f'scheduler {sched}'
    for key, val in train.items():
        if key.endswith('_opt') and isinstance(val, dict) and 'type' in val \
                and key not in ('optim_g', 'optim_d', 'optim_e'):
            assert LOSS_REGISTRY.get(val['type']) is not None, f'{key}: {val["type"]}'
