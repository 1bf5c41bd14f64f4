"""TamingModel — VQGAN reconstruction evaluation
(reference: basicsr/models/taming_model.py:17-90): feeds the GT through the
(frozen) autoencoder and evaluates reconstruction metrics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import shard_batch
from ..utils.registry import MODEL_REGISTRY
from .srrs_model import SRRSModel


@MODEL_REGISTRY.register()
class TamingModel(SRRSModel):

    def feed_data(self, data):
        arrays = {}
        if 'gt' in data:
            arrays['gt'] = np.asarray(data['gt'])
            arrays['lq'] = arrays['gt']  # reconstruction: input == target
        elif 'lq' in data:
            arrays['lq'] = np.asarray(data['lq'])
        self.batch = shard_batch(arrays, self.mesh)
        self.batch_meta = {k: v for k, v in data.items() if k not in arrays}

    def test(self):
        self.output = self._eval_apply(self._test_params(), self.batch['lq'])
