"""Smoke-check discriminator gradient semantics under JAX
(reference: test_scripts/test_discriminator_backward.py).

The reference demonstrates that backprop-ing the real and fake BCE losses
separately (two ``backward()`` calls accumulating into ``.grad``) equals one
backward of the combined loss. The JAX analog: gradients are pure values, so
``grad(l_real) + grad(l_fake) == grad(l_real + l_fake)`` by linearity — this
script asserts it numerically on the framework's UNetDiscriminatorSN, which
is how ``SRGANModel`` computes its single-step D update.
"""

import sys
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..'))
from basicsr4rs_tpu.archs import build_network  # noqa: E402


def main():
    net_d = build_network({'type': 'UNetDiscriminatorSN', 'num_in_ch': 3,
                           'num_feat': 16, 'skip_connection': True})
    rng = jax.random.PRNGKey(999)
    k_init, k_real, k_fake = jax.random.split(rng, 3)
    img_real = jax.random.uniform(k_real, (1, 3, 32, 32)).transpose(0, 2, 3, 1)
    img_fake = jax.random.uniform(k_fake, (1, 3, 32, 32)).transpose(0, 2, 3, 1)
    params = net_d.init(k_init, img_real)['params']

    def bce(params, img, label):
        logits = net_d.apply({'params': params}, img)
        return optax.sigmoid_binary_cross_entropy(
            logits, jnp.full_like(logits, label)).mean()

    # (1) separate backwards, accumulated (the DCGAN-tutorial pattern)
    g_real = jax.grad(bce)(params, img_real, 1.0)
    g_fake = jax.grad(bce)(params, img_fake, 0.0)
    g_sep = jax.tree_util.tree_map(jnp.add, g_real, g_fake)

    # (2) one backward of the combined loss
    def combined(params):
        return bce(params, img_real, 1.0) + bce(params, img_fake, 0.0)
    g_comb = jax.grad(combined)(params)

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).sum()), g_sep, g_comb)
    flat, _ = jax.tree_util.tree_flatten(diffs)
    for path, d in zip(jax.tree_util.tree_leaves_with_path(diffs), flat):
        print(jax.tree_util.keystr(path[0]), d)
    assert np.allclose(flat, 0.0, atol=1e-5), f'max diff {max(flat)}'
    print('OK: accumulated grads == combined-loss grads')


if __name__ == '__main__':
    main()
