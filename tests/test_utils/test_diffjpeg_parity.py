"""DiffJPEG numeric parity vs the reference torch implementation
(basicsr/utils/diffjpeg.py:32-515): DCT 8x8, quality->factor mapping,
quant tables, chroma subsample/upsample round trip."""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np


def _load_ref_diffjpeg():
    sys.modules.setdefault('basicsr', types.ModuleType('basicsr'))
    spec = importlib.util.spec_from_file_location(
        'ref_diffjpeg', '/root/reference/basicsr/utils/diffjpeg.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_diffjpeg_matches_torch_reference():
    import torch
    ref = _load_ref_diffjpeg()
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref.DiffJPEG(differentiable=True)(
            torch.from_numpy(x), quality=torch.tensor([50., 90.])).numpy()

    from basicsr4rs_tpu.utils.diffjpeg import DiffJPEG
    got = np.asarray(DiffJPEG()(jnp.asarray(x.transpose(0, 2, 3, 1)),
                                quality=jnp.asarray([50., 90.])))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               atol=5e-6, rtol=1e-5)
