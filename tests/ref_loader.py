"""Load reference (torch) modules standalone for parity testing.

The reference package at /root/reference has unmet deps (torchvision, lmdb,
...); we stub just enough to import individual arch/metric files and compare
numerics. This helper is test-only — the framework itself never imports the
reference.
"""

import importlib.util
import sys
import types

REF_ROOT = '/root/reference'


def _ensure_stubs():
    if 'torchvision' in sys.modules and not isinstance(sys.modules['torchvision'], types.ModuleType):
        return
    if 'basicsr' not in sys.modules:
        basicsr = types.ModuleType('basicsr')
        basicsr.__path__ = [f'{REF_ROOT}/basicsr']
        sys.modules['basicsr'] = basicsr

    # torchvision stub (only version-compared, never called in CPU paths we test)
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.__version__ = '0.0.0'
        tv.ops = types.SimpleNamespace(deform_conv2d=None)
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.ops'] = types.ModuleType('torchvision.ops')
        sys.modules['torchvision.ops'].deform_conv2d = None
        # torchvision.transforms.functional.rgb_to_grayscale used by the
        # reference degradations module — provide a faithful torch stub.
        import torch

        def rgb_to_grayscale(img, num_output_channels=1):
            w = torch.tensor([0.2989, 0.587, 0.114], dtype=img.dtype).view(1, 3, 1, 1)
            gray = (img * w).sum(dim=1, keepdim=True)
            return gray.expand(img.shape[0], num_output_channels, *img.shape[2:])

        tf = types.ModuleType('torchvision.transforms')
        tff = types.ModuleType('torchvision.transforms.functional')
        tff.rgb_to_grayscale = rgb_to_grayscale
        sys.modules['torchvision.transforms'] = tf
        sys.modules['torchvision.transforms.functional'] = tff
        tv.transforms = tf
        tf.functional = tff

        # torchvision.models.vgg stub: real architecture (cfg-built Sequential
        # of Conv/ReLU/MaxPool), random weights — enough for structural parity
        # tests that convert the state_dict anyway.
        import torch.nn as _nn

        _VGG_CFGS = {
            'vgg11': [64, 'M', 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
            'vgg13': [64, 64, 'M', 128, 128, 'M', 256, 256, 'M', 512, 512, 'M', 512, 512, 'M'],
            'vgg16': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M', 512, 512, 512, 'M',
                      512, 512, 512, 'M'],
            'vgg19': [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M', 512, 512, 512, 512,
                      'M', 512, 512, 512, 512, 'M'],
        }

        def _make_vgg(cfg_name, batch_norm=False):
            def build(pretrained=False, **kwargs):
                layers, in_ch = [], 3
                for v in _VGG_CFGS[cfg_name]:
                    if v == 'M':
                        layers.append(_nn.MaxPool2d(2, 2))
                    else:
                        layers.append(_nn.Conv2d(in_ch, v, 3, padding=1))
                        if batch_norm:
                            layers.append(_nn.BatchNorm2d(v))
                        layers.append(_nn.ReLU(inplace=True))
                        in_ch = v
                return types.SimpleNamespace(features=_nn.Sequential(*layers))
            return build

        vgg_mod = types.ModuleType('torchvision.models.vgg')
        for _name in list(_VGG_CFGS):
            setattr(vgg_mod, _name, _make_vgg(_name))
            setattr(vgg_mod, f'{_name}_bn', _make_vgg(_name, batch_norm=True))
        models_mod = types.ModuleType('torchvision.models')
        models_mod.vgg = vgg_mod
        sys.modules['torchvision.models'] = models_mod
        sys.modules['torchvision.models.vgg'] = vgg_mod
        tv.models = models_mod

    # loralib stub: the reference autoencoder only references lora.Conv2d on
    # an optional LoRA path we never exercise in parity tests.
    if 'loralib' not in sys.modules:
        import torch.nn as _lnn
        lora_mod = types.ModuleType('loralib')
        lora_mod.Conv2d = _lnn.Conv2d
        lora_mod.Linear = _lnn.Linear
        sys.modules['loralib'] = lora_mod

    # timm stub: the reference resshift swin transformer needs three tiny
    # helpers from timm.layers (DropPath / to_2tuple / trunc_normal_).
    if 'timm' not in sys.modules:
        import torch as _torch
        import torch.nn as _tnn

        class _DropPath(_tnn.Module):
            def __init__(self, drop_prob=0., scale_by_keep=True):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                if self.drop_prob == 0. or not self.training:
                    return x
                keep = 1 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = x.new_empty(shape).bernoulli_(keep)
                return x * mask / keep

        def _to_2tuple(v):
            return v if isinstance(v, tuple) else (v, v)

        def _trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
            with _torch.no_grad():
                tensor.normal_(mean, std).clamp_(a * std + mean, b * std + mean)
            return tensor

        timm_mod = types.ModuleType('timm')
        layers_mod = types.ModuleType('timm.layers')
        layers_mod.DropPath = _DropPath
        layers_mod.to_2tuple = _to_2tuple
        layers_mod.trunc_normal_ = _trunc_normal_
        timm_mod.layers = layers_mod
        sys.modules['timm'] = timm_mod
        sys.modules['timm.layers'] = layers_mod

    class _NoopRegistry:
        def register(self, *a, **k):
            def deco(x):
                return x
            return deco

        def get(self, name):
            raise KeyError(name)

    # Namespace stubs with real __path__ so normal submodule imports work
    # (arch files use relative imports); package __init__.py files are
    # bypassed (they pull missing deps).
    for name in ['basicsr.utils', 'basicsr.utils.registry', 'basicsr.ops', 'basicsr.ops.dcn',
                 'basicsr.archs', 'basicsr.metrics', 'basicsr.data', 'basicsr.losses']:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [f'{REF_ROOT}/{name.replace(".", "/")}']
            sys.modules[name] = mod

    reg = sys.modules['basicsr.utils.registry']
    for rname in ['ARCH_REGISTRY', 'METRIC_REGISTRY', 'DATASET_REGISTRY', 'MODEL_REGISTRY', 'LOSS_REGISTRY']:
        if not hasattr(reg, rname):
            setattr(reg, rname, _NoopRegistry())

    utils = sys.modules['basicsr.utils']
    if not hasattr(utils, 'get_root_logger'):
        import logging
        utils.get_root_logger = lambda *a, **k: logging.getLogger('ref')

    # pure-torch fused_act stub (the reference file has no CPU fallback)
    if not hasattr(sys.modules['basicsr.ops'], '_fused_stubbed'):
        import torch
        import torch.nn as tnn
        import torch.nn.functional as tF

        fa = types.ModuleType('basicsr.ops.fused_act')

        def fused_leaky_relu(input, bias, negative_slope=0.2, scale=2**0.5):
            return tF.leaky_relu(input + bias.view(1, -1, *([1] * (input.ndim - 2))),
                                 negative_slope) * scale

        class FusedLeakyReLU(tnn.Module):
            def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
                super().__init__()
                self.bias = tnn.Parameter(torch.zeros(channel))
                self.negative_slope = negative_slope
                self.scale = scale

            def forward(self, input):
                return fused_leaky_relu(input, self.bias, self.negative_slope, self.scale)

        fa.fused_leaky_relu = fused_leaky_relu
        fa.FusedLeakyReLU = FusedLeakyReLU
        sys.modules['basicsr.ops.fused_act'] = fa
        sys.modules['basicsr.ops']._fused_stubbed = True

    dcn = sys.modules['basicsr.ops.dcn']
    if not hasattr(dcn, 'ModulatedDeformConvPack'):
        import torch.nn as nn

        class ModulatedDeformConvPack(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        dcn.ModulatedDeformConvPack = ModulatedDeformConvPack
        dcn.modulated_deform_conv = None
        dcn.DeformConvPack = ModulatedDeformConvPack


def load_ref_module(relpath: str, name: str = None):
    """Import a reference file under its canonical package name,
    e.g. load_ref_module('basicsr/archs/srresnet_arch.py')."""
    _ensure_stubs()
    canonical = relpath.replace('/', '.').replace('.py', '')
    if canonical in sys.modules:
        return sys.modules[canonical]
    _preload_canonical('basicsr/utils/color_util.py', 'basicsr.utils.color_util')
    _preload_canonical('basicsr/utils/matlab_functions.py', 'basicsr.utils.matlab_functions')
    return importlib.import_module(canonical)


def _preload_canonical(relpath: str, canonical: str):
    if canonical in sys.modules:
        return
    utils = sys.modules.get('basicsr.utils')
    spec = importlib.util.spec_from_file_location(canonical, f'{REF_ROOT}/{relpath}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[canonical] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        del sys.modules[canonical]
        raise
    # some files do `from basicsr.utils import bgr2ycbcr`
    if utils is not None:
        for attr in ['bgr2ycbcr', 'rgb2ycbcr', 'imwrite', 'img2tensor', 'tensor2img', 'scandir']:
            if hasattr(mod, attr) and not hasattr(utils, attr):
                setattr(utils, attr, getattr(mod, attr))
